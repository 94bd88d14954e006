"""Round-4 session-4 aggregates: GROUPING SETS / CUBE, skewness/kurtosis
moment stats, and deterministic arg_max/arg_min — DuckDB parity on both the
Table path and the Dataset path (driver fast path AND fully distributed)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from kamae_ray.stages.aggregate import (
    groupby_agg,
    groupby_arg_extreme,
    groupby_cube,
    groupby_grouping_sets,
)


def _canon(t: pa.Table):
    df = t.to_pandas()
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


def _assert_frames_equal(a, b):
    assert len(a) == len(b)
    for c in a.columns:
        x, y = a[c], b[c]
        if x.dtype.kind == "f" or y.dtype.kind == "f":
            assert np.allclose(
                x.to_numpy(dtype=float), y.to_numpy(dtype=float), equal_nan=True
            ), c
        else:
            assert list(x.where(x.notna(), None)) == list(y.where(y.notna(), None)), c


def _collect(out):
    if isinstance(out, pa.Table):
        return out
    return pa.concat_tables([pa.table(b) for b in out.iter_batches(batch_format="pyarrow")])


def _table(with_nulls=True):
    rng = np.random.default_rng(7)
    n = 3000
    a = rng.choice(["x", "y", "z"], n).astype(object)
    b = rng.choice(["p", "q"], n).astype(object)
    v = rng.integers(0, 100, n).astype(float)
    if with_nulls:
        a[::17] = None
        v[::13] = np.nan
    return pa.table({
        "a": pa.array(list(a), pa.string()),
        "b": pa.array(list(b), pa.string()),
        "v": pa.array([None if isinstance(x, float) and np.isnan(x) else x for x in v],
                      pa.float64()),
        "id": pa.array(range(n), pa.int64()),
    })


EXPRS = "sum(v) AS v_sum, count(v) AS v_count, avg(v) AS v_mean, max(v) AS v_max"


def _oracle_sets(t, sets_sql):
    con = duckdb.connect()
    con.register("t", t)
    sql = (
        f"SELECT a, b, {EXPRS}, CAST(GROUPING(a, b) AS BIGINT) AS grouping_id "
        f"FROM t GROUP BY GROUPING SETS {sets_sql}"
    )
    return con.sql(sql).arrow()


AGGS = {"v": ["sum", "count", "mean", "max"]}


def test_cube_table_matches_duckdb():
    t = _table()
    got = groupby_cube(t, ["a", "b"], AGGS)
    want = _oracle_sets(t, "((a, b), (a), (b), ())")
    _assert_frames_equal(_canon(got), _canon(want))


def test_grouping_sets_subset_and_validation():
    t = _table()
    got = groupby_grouping_sets(t, ["a", "b"], [["b"], []], AGGS)
    # DuckDB only allows GROUPING() over grouped columns, so a set list that
    # never groups `a` can't use the GROUPING SETS form directly — the
    # UNION-ALL-of-plain-GROUP-BYs expansion is the equivalent oracle
    con = duckdb.connect()
    con.register("t", t)
    want = con.sql(
        f"SELECT NULL::VARCHAR AS a, b, {EXPRS}, 2::BIGINT AS grouping_id "
        "FROM t GROUP BY b "
        f"UNION ALL SELECT NULL::VARCHAR, NULL::VARCHAR, {EXPRS}, 3::BIGINT FROM t"
    ).arrow()
    _assert_frames_equal(_canon(got), _canon(want))
    with pytest.raises(ValueError):
        groupby_grouping_sets(t, ["a"], [["nope"]], AGGS)
    with pytest.raises(ValueError):
        groupby_grouping_sets(t, ["a"], [], AGGS)
    with pytest.raises(ValueError):
        groupby_cube(t, ["a"] * 7, AGGS)


def test_grouping_sets_empty_relation_grand_total():
    empty = pa.table({"a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
                      "v": pa.array([], pa.float64())})
    out = groupby_grouping_sets(empty, ["a", "b"], [["a"], []], {"v": ["count", "sum"]})
    # SQL: only the () set yields a row on an empty relation
    assert out.num_rows == 1
    r = out.to_pylist()[0]
    assert r["v_count"] == 0 and r["grouping_id"] == 3 and np.isnan(r["v_sum"])


@pytest.mark.parametrize("budget", [1_000_000, 0])
def test_cube_dataset_paths(ray_session, budget):
    import ray

    t = _table()
    want = groupby_cube(t, ["a", "b"], AGGS)
    ds = ray.data.from_arrow(t).repartition(6)
    got = _collect(groupby_cube(ds, ["a", "b"], AGGS, driver_level_budget=budget))
    _assert_frames_equal(_canon(got), _canon(want))


def test_skew_kurt_bitexact_vs_duckdb_formula():
    """Integer-valued column: power sums are exact, so the mirrored
    expression must match DuckDB BIT-FOR-BIT (no rounding)."""
    t = _table(with_nulls=True)
    got = groupby_agg(t, "a", {"v": ["skew", "kurt"]}).to_pandas()
    got = got.sort_values("a", na_position="first").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t)
    ora = con.sql(
        "WITH s AS (SELECT a, sum(v)::DOUBLE s1, count(v)::DOUBLE n, "
        "sum(v*v)::DOUBLE s2, sum(v*v*v)::DOUBLE s3, sum(v*v*v*v)::DOUBLE s4 "
        "FROM t GROUP BY a) SELECT a, "
        "(s3/n - 3*(s1/n)*(s2/n) + 2*((s1/n)*(s1/n)*(s1/n))) / "
        "(((s2/n)-(s1/n)*(s1/n)) * sqrt((s2/n)-(s1/n)*(s1/n))) AS sk, "
        "(s4/n - 4*(s1/n)*(s3/n) + 6*((s1/n)*(s1/n))*(s2/n) - "
        "3*((s1/n)*(s1/n)*(s1/n)*(s1/n))) / "
        "(((s2/n)-(s1/n)*(s1/n))*((s2/n)-(s1/n)*(s1/n))) - 3 AS ku "
        "FROM s ORDER BY a NULLS FIRST"
    ).df()
    assert np.array_equal(got["v_skew"].to_numpy(), ora["sk"].to_numpy())
    assert np.array_equal(got["v_kurt"].to_numpy(), ora["ku"].to_numpy())
    # sanity vs the statistical definition on a known-shape sample
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, 50_000)
    tt = pa.table({"k": pa.array(["c"] * len(x)), "v": pa.array(x)})
    o = groupby_agg(tt, "k", {"v": ["skew", "kurt"]}).to_pylist()[0]
    m = x.mean()
    ref_sk = ((x - m) ** 3).mean() / ((x - m) ** 2).mean() ** 1.5
    ref_ku = ((x - m) ** 4).mean() / ((x - m) ** 2).mean() ** 2 - 3
    assert abs(o["v_skew"] - ref_sk) < 1e-6 and abs(o["v_kurt"] - ref_ku) < 1e-6
    # zero-variance group -> NULL (NaN)
    z = groupby_agg(pa.table({"k": ["z", "z"], "v": [3.0, 3.0]}), "k",
                    {"v": ["skew", "kurt"]}).to_pylist()[0]
    assert np.isnan(z["v_skew"]) and np.isnan(z["v_kurt"])


def test_skew_kurt_dataset_merges_exactly(ray_session):
    import ray

    t = _table()
    want = groupby_agg(t, "a", {"v": ["skew", "kurt"]}).to_pandas()
    want = want.sort_values("a", na_position="first").reset_index(drop=True)
    ds = ray.data.from_arrow(t).repartition(7)
    got = _collect(groupby_agg(ds, "a", {"v": ["skew", "kurt"]})).to_pandas()
    got = got.sort_values("a", na_position="first").reset_index(drop=True)
    # integer-valued inputs: partials sum exactly -> bit-identical any split
    assert np.array_equal(got["v_skew"].to_numpy(), want["v_skew"].to_numpy())
    assert np.array_equal(got["v_kurt"].to_numpy(), want["v_kurt"].to_numpy())


@pytest.mark.parametrize("mode", ["max", "min"])
def test_arg_extreme_matches_row_number_plan(ray_session, mode):
    import ray

    t = _table()
    con = duckdb.connect()
    con.register("t", t)
    d = "DESC" if mode == "max" else "ASC"
    ora = con.sql(
        f"SELECT a, id, v AS v_{mode} FROM (SELECT a, id, v, row_number() OVER ("
        f"PARTITION BY a ORDER BY v {d}, id ASC) rn FROM t WHERE v IS NOT NULL) "
        "WHERE rn = 1 ORDER BY a NULLS FIRST"
    ).df()
    for src in (t, ray.data.from_arrow(t).repartition(6)):
        out = _collect(groupby_arg_extreme(src, "a", "id", "v", mode)).to_pandas()
        out = out.sort_values("a", na_position="first").reset_index(drop=True)
        assert out["id"].tolist() == ora["id"].astype(int).tolist()
        assert out[f"v_{mode}"].tolist() == ora[f"v_{mode}"].tolist()
    # a key whose rows are ALL null-by disappears (SQL semantics)
    t2 = pa.table({"a": ["only"], "id": pa.array([1], pa.int64()),
                   "v": pa.array([None], pa.float64())})
    assert groupby_arg_extreme(t2, "a", "id", "v", mode).num_rows == 0
    with pytest.raises(ValueError):
        groupby_arg_extreme(t, "a", "id", "v", "median")


def test_groupby_cat_stats_vs_duckdb(ray_session):
    import ray

    from kamae_ray.stages.aggregate import groupby_cat_stats

    rng = np.random.default_rng(5)
    n = 9000
    t = pa.table({
        "k": pa.array(list(rng.choice(["a", "b", "c", "d"], n))),
        "v": pa.array(list(rng.choice(["p", "q", "r", "s", "t", None], n,
                                      p=[.3, .25, .2, .15, .07, .03])), pa.string()),
    })
    con = duckdb.connect()
    con.register("t", t)
    want = con.sql(
        "WITH c AS (SELECT k, v, count(*)::DOUBLE cnt FROM t WHERE v IS NOT NULL "
        "GROUP BY k, v) SELECT k, CAST(SUM(cnt) AS BIGINT) n, COUNT(*) n_distinct, "
        "ln(SUM(cnt)) - SUM(cnt*ln(cnt))/SUM(cnt) AS entropy, "
        "1 - SUM(cnt*cnt)/(SUM(cnt)*SUM(cnt)) AS gini FROM c GROUP BY k ORDER BY k"
    ).df()
    builtin = con.sql("SELECT k, entropy(v) e FROM t GROUP BY k ORDER BY k").df()
    for src in (t, ray.data.from_arrow(t).repartition(6)):
        out = groupby_cat_stats(src, "k", "v")
        if not isinstance(out, pa.Table):
            out = pa.concat_tables([pa.table(b) for b in out.iter_batches(batch_format="pyarrow")])
        got = out.to_pandas().sort_values("k").reset_index(drop=True)
        assert (got["n"].to_numpy() == want["n"].to_numpy()).all()
        assert (got["n_distinct"].to_numpy() == want["n_distinct"].to_numpy(int)).all()
        # integer count sums -> gini is bit-exact; entropy to ~1 ULP, and it
        # equals DuckDB's builtin (base-2) entropy after the base change
        assert np.array_equal(got["gini"].to_numpy(), want["gini"].to_numpy())
        assert np.abs(got["entropy"].to_numpy() - want["entropy"].to_numpy()).max() < 1e-12
        assert np.allclose(got["entropy"].to_numpy() / np.log(2), builtin["e"].to_numpy())
    # single-value group: entropy 0, gini 0; all-null group absent
    t2 = pa.table({"k": ["a", "a", "b"], "v": ["x", "x", None]})
    o2 = groupby_cat_stats(t2, "k", "v").to_pylist()
    assert o2 == [{"k": "a", "n": 2, "n_distinct": 1, "entropy": 0.0, "gini": 0.0}]
