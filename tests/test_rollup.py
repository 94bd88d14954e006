"""groupby_rollup (SQL GROUP BY ROLLUP): DuckDB parity on both the Table
path and the Dataset path, including the fully distributed (over-budget)
plan and null keys / all-null value groups."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from kamae_ray.stages.aggregate import groupby_rollup


def _canon(t: pa.Table):
    import pandas as pd

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


def _oracle(t: pa.Table, keys, exprs):
    con = duckdb.connect()
    con.register("t", t)
    gid = f"CAST(GROUPING({', '.join(keys)}) AS BIGINT) AS grouping_id"
    sql = f"SELECT {', '.join(keys)}, {exprs}, {gid} FROM t GROUP BY ROLLUP ({', '.join(keys)})"
    return con.sql(sql).arrow()


EXPRS = (
    "sum(v) AS v_sum, count(v) AS v_count, avg(v) AS v_mean, "
    "min(v) AS v_min, max(v) AS v_max"
)


def _table(with_nulls=False):
    rng = np.random.default_rng(5)
    n = 2000
    a = rng.choice(["x", "y", "z"], n).astype(object)
    b = rng.choice(["p", "q"], n).astype(object)
    v = rng.integers(0, 100, n).astype(float)
    if with_nulls:
        a[::17] = None
        v[::13] = np.nan
    return pa.table({
        "a": pa.array(list(a), pa.string()),
        "b": pa.array(list(b), pa.string()),
        "v": pa.array(v, pa.float64()).fill_null(np.nan) if not with_nulls else pa.array(
            [None if np.isnan(x) else x for x in v], pa.float64()
        ),
    })


@pytest.mark.parametrize("with_nulls", [False, True])
def test_rollup_table_matches_duckdb(with_nulls):
    t = _table(with_nulls)
    got = groupby_rollup(t, ["a", "b"], {"v": ["sum", "count", "mean", "min", "max"]})
    want = _oracle(t, ["a", "b"], EXPRS)
    _assert_frames_equal(_canon(got), _canon(want))


def test_rollup_single_key_and_validation():
    t = _table()
    got = groupby_rollup(t, "a", {"v": ["sum", "count"]})
    want = _oracle(t, ["a"], "sum(v) AS v_sum, count(v) AS v_count")
    _assert_frames_equal(_canon(got), _canon(want))
    with pytest.raises(ValueError):
        groupby_rollup(t, [], {"v": ["sum"]})
    with pytest.raises(ValueError):
        groupby_rollup(t, "a", {"v": ["median"]})


@pytest.mark.parametrize("budget", [1_000_000, 0])
def test_rollup_dataset_paths(ray_session, budget):
    import ray

    t = _table(with_nulls=True)
    want = groupby_rollup(t, ["a", "b"], {"v": ["sum", "count", "mean", "min", "max"]})
    ds = ray.data.from_arrow(t).repartition(6)
    out = groupby_rollup(
        ds, ["a", "b"], {"v": ["sum", "count", "mean", "min", "max"]},
        driver_level_budget=budget,
    )
    got = pa.concat_tables(
        [pa.table(x) for x in out.iter_batches(batch_format="pyarrow")]
    )
    _assert_frames_equal(_canon(got), _canon(want))


def test_variance_stats_vs_duckdb():
    rng = np.random.default_rng(2)
    t = pa.table({
        "k": pa.array(list(rng.choice(["a", "b"], 300))),
        "v": pa.array(np.round(rng.normal(5, 2, 300), 3)),
    })
    from kamae_ray.stages.aggregate import groupby_agg

    out = groupby_agg(t, "k", {"v": ["var", "var_samp", "std_samp"]}).to_pandas().sort_values("k")
    ora = duckdb.sql(
        "SELECT k, var_pop(v) vp, var_samp(v) vs, stddev_samp(v) ss FROM t GROUP BY k ORDER BY k"
    ).df()
    assert np.allclose(out["v_var"], ora["vp"])
    assert np.allclose(out["v_var_samp"], ora["vs"])
    assert np.allclose(out["v_std_samp"], ora["ss"])
    # SQL: sample variance of a single row is NULL
    one = groupby_agg(pa.table({"k": ["x"], "v": [1.5]}), "k", {"v": ["var_samp", "var"]}).to_pandas()
    assert np.isnan(one["v_var_samp"].iloc[0]) and one["v_var"].iloc[0] == 0.0


def test_groupby_corr_vs_duckdb(ray_session):
    import ray

    from kamae_ray.stages.aggregate import groupby_corr

    rng = np.random.default_rng(4)
    n = 3000
    k = list(rng.choice(["a", "b", "c", "d"], n))
    x = np.round(rng.normal(0, 1, n), 3)
    y = np.round(0.5 * x + rng.normal(0, 1, n), 3)
    x[::11] = np.nan
    y[::13] = np.nan
    t = pa.table({
        "k": pa.array(k),
        "x": pa.array([None if np.isnan(v) else v for v in x], pa.float64()),
        "y": pa.array([None if np.isnan(v) else v for v in y], pa.float64()),
    })
    ora = duckdb.sql(
        "SELECT k, count(*) FILTER (x IS NOT NULL AND y IS NOT NULL) n, corr(x,y) c, "
        "covar_pop(x,y) cp, covar_samp(x,y) cs FROM t GROUP BY k ORDER BY k"
    ).df()
    for src in (t, ray.data.from_arrow(t).repartition(5)):
        out = groupby_corr(src, "k", "x", "y")
        if not isinstance(out, pa.Table):
            out = pa.concat_tables([pa.table(b) for b in out.iter_batches(batch_format="pyarrow")])
        df = out.to_pandas().sort_values("k").reset_index(drop=True)
        assert df["n"].tolist() == ora["n"].astype(int).tolist()
        assert np.allclose(df["corr"], ora["c"])
        assert np.allclose(df["covar_pop"], ora["cp"])
        assert np.allclose(df["covar_samp"], ora["cs"])
    # SQL edge semantics: zero variance -> NULL corr; n=1 -> NULL covar_samp
    t2 = pa.table({"k": ["a", "a", "b"], "x": [1.0, 1.0, 2.0], "y": [3.0, 4.0, 5.0]})
    o2 = groupby_corr(t2, "k", "x", "y").to_pandas().set_index("k")
    assert np.isnan(o2.loc["a", "corr"]) and np.isnan(o2.loc["b", "covar_samp"])


def test_groupby_mode_vs_duckdb(ray_session):
    import ray

    from kamae_ray.stages.aggregate import groupby_mode

    rng = np.random.default_rng(4)
    n = 3000
    t = pa.table({
        "k": pa.array(list(rng.choice(["a", "b", "c", "d"], n))),
        "v": pa.array(list(rng.choice(["p", "q", "r", None], n, p=[.4, .3, .2, .1])), pa.string()),
    })
    ora = duckdb.sql(
        "SELECT k, v AS m, cnt FROM (SELECT k, v, count(*) cnt, row_number() OVER ("
        "PARTITION BY k ORDER BY count(*) DESC, v ASC) rn FROM t WHERE v IS NOT NULL "
        "GROUP BY k, v) WHERE rn = 1 ORDER BY k"
    ).df()
    for src in (t, ray.data.from_arrow(t).repartition(6)):
        out = groupby_mode(src, "k", "v")
        if not isinstance(out, pa.Table):
            out = pa.concat_tables([pa.table(b) for b in out.iter_batches(batch_format="pyarrow")])
        df = out.to_pandas().sort_values("k").reset_index(drop=True)
        assert df["v_mode"].tolist() == ora["m"].tolist()
        assert df["v_mode_count"].tolist() == ora["cnt"].astype(int).tolist()


def test_quantile_disc_vs_duckdb():
    from kamae_ray.stages.aggregate import quantile_per_group

    rng = np.random.default_rng(6)
    n = 5000
    t = pa.table({
        "k": pa.array(list(rng.choice(["a", "b", "c"], n))),
        "v": pa.array([None if rng.random() < 0.05 else round(float(x), 3)
                       for x in rng.normal(0, 10, n)], pa.float64()),
    })
    out = quantile_per_group(t, "k", "v", [0.25, 0.5, 0.9], method="disc").to_pandas().sort_values("k")
    ora = duckdb.sql(
        "SELECT k, quantile_disc(v, 0.25) p25, quantile_disc(v, 0.5) p50, "
        "quantile_disc(v, 0.9) p90 FROM t GROUP BY k ORDER BY k"
    ).df()
    assert np.allclose(out["v_p25"], ora["p25"])
    assert np.allclose(out["v_p50"], ora["p50"])
    assert np.allclose(out["v_p90"], ora["p90"])
    with pytest.raises(ValueError):
        quantile_per_group(t, "k", "v", [0.5], method="nearest")


def test_regression_aggregates_vs_duckdb():
    from kamae_ray.stages.aggregate import groupby_corr

    rng = np.random.default_rng(9)
    n = 4000
    k = list(rng.choice(["a", "b", "c", "z0", "z1"], n))
    x = np.round(rng.normal(3, 2, n), 3)
    y = np.round(1.5 * x + rng.normal(0, 1, n), 3)
    for i in range(n):  # edge groups: constant x (NULL slope), constant y (r2=1)
        if k[i] == "z0":
            x[i] = 7.0
        if k[i] == "z1":
            y[i] = -2.0
    t = pa.table({"k": pa.array(k), "x": pa.array(x), "y": pa.array(y)})
    out = groupby_corr(t, "k", "x", "y", regression=True).to_pandas().sort_values("k").reset_index(drop=True)
    ora = duckdb.sql(
        "SELECT k, regr_slope(y,x) s, regr_intercept(y,x) i, regr_r2(y,x) r "
        "FROM t GROUP BY k ORDER BY k"
    ).df()
    for c, oc in [("slope", "s"), ("intercept", "i"), ("r2", "r")]:
        assert np.allclose(np.nan_to_num(out[c], nan=-9e9),
                           np.nan_to_num(ora[oc], nan=-9e9), atol=1e-9), c


def test_histogram_and_cross_join(ray_session):
    import ray

    from kamae_ray.stages.aggregate import histogram
    from kamae_ray.stages.join import cross_join

    rng = np.random.default_rng(1)
    vals = list(rng.normal(10, 5, 5000)) + [None, -100.0, 100.0]
    t = pa.table({"v": pa.array(vals, pa.float64())})
    want = histogram(t, "v", 10, 0.0, 20.0).sort_by("bin")
    ora = duckdb.sql(
        "SELECT CAST(least(floor((v - 0.0)/2.0), 9) AS BIGINT) bin, count(*) n FROM t "
        "WHERE v IS NOT NULL AND v >= 0.0 AND v <= 20.0 GROUP BY 1 ORDER BY 1"
    ).df()
    assert want.column("bin").to_pylist() == ora["bin"].astype(int).tolist()
    assert want.column("n_rows").to_pylist() == ora["n"].astype(int).tolist()
    ds_out = histogram(ray.data.from_arrow(t).repartition(4), "v", 10, 0.0, 20.0)
    got = pa.concat_tables([pa.table(b) for b in ds_out.iter_batches(batch_format="pyarrow")]).sort_by("bin")
    assert got.equals(want)
    with pytest.raises(ValueError):
        histogram(t, "v", 0, 0.0, 1.0)

    left = pa.table({"a": pa.array([1, 2, 3], pa.int64()), "b": pa.array(["p", "q", "r"])})
    right = pa.table({"b": pa.array(["x", "y"]), "c": pa.array([10, 20], pa.int64())})
    out = cross_join(left, right)
    assert out.num_rows == 6 and "b_r" in out.column_names
    ds_cross = cross_join(ray.data.from_arrow(left).repartition(2), right)
    got = pa.concat_tables([pa.table(b) for b in ds_cross.iter_batches(batch_format="pyarrow")])
    assert got.sort_by([("a", "ascending"), ("b_r", "ascending")]).equals(
        out.sort_by([("a", "ascending"), ("b_r", "ascending")])
    )
    with pytest.raises(ValueError):
        cross_join(left, right, max_right_rows=1)


def test_cooccurrence_and_transitions(ray_session):
    import ray

    from kamae_ray.stages.aggregate import cooccurrence_counts
    from kamae_ray.stages.window import transition_counts

    rng = np.random.default_rng(21)
    n = 2000
    t = pa.table({
        "g": pa.array(list(rng.integers(0, 300, n)), pa.int64()),
        "item": pa.array(list(rng.integers(0, 25, n)), pa.int64()),
    })
    want = cooccurrence_counts(t, "g", "item").sort_by(
        [("item_a", "ascending"), ("item_b", "ascending")]
    )
    ora = duckdb.sql(
        "SELECT a.item ia, b.item ib, count(*) n FROM t a JOIN t b "
        "ON a.g = b.g AND a.item < b.item GROUP BY 1,2 ORDER BY 1,2"
    ).df()
    assert want.column("item_a").to_pylist() == ora["ia"].astype(int).tolist()
    assert want.column("n").to_pylist() == ora["n"].astype(int).tolist()
    ds_out = cooccurrence_counts(ray.data.from_arrow(t).repartition(5), "g", "item")
    got = pa.concat_tables(
        [pa.table(b) for b in ds_out.iter_batches(batch_format="pyarrow")]
    ).sort_by([("item_a", "ascending"), ("item_b", "ascending")])
    assert got.equals(want)
    with pytest.raises(ValueError):
        cooccurrence_counts(t, "g", "item", max_group_size=2)

    ev = pa.table({
        "u": pa.array(list(rng.integers(0, 30, n)), pa.int64()),
        "ts": pa.array(list(rng.integers(0, 10_000, n)), pa.int64()),
        "eid": pa.array(range(n), pa.int64()),
        "ev": pa.array(list(rng.choice(["a", "b", "c"], n))),
    })
    want_t = transition_counts(ev, "u", "ts", "ev", tiebreak_col="eid").sort_by(
        [("from_event", "ascending"), ("to_event", "ascending")]
    )
    ora_t = duckdb.sql(
        "SELECT prev f, ev t2, count(*) n FROM (SELECT lag(ev) OVER "
        "(PARTITION BY u ORDER BY ts, eid) prev, ev FROM ev) "
        "WHERE prev IS NOT NULL GROUP BY 1,2 ORDER BY 1,2"
    ).df()
    assert want_t.column("from_event").to_pylist() == ora_t["f"].tolist()
    assert want_t.column("n").to_pylist() == ora_t["n"].astype(int).tolist()
    ds_t = transition_counts(ray.data.from_arrow(ev).repartition(4), "u", "ts", "ev",
                             tiebreak_col="eid")
    got_t = pa.concat_tables(
        [pa.table(b) for b in ds_t.iter_batches(batch_format="pyarrow")]
    ).sort_by([("from_event", "ascending"), ("to_event", "ascending")])
    assert got_t.equals(want_t)


def test_review_fixes_rollup_cooccur_shuffle(ray_session):
    """Round-3 session-4 review fixes: empty-input rollup grand total, null
    items in cooccurrence, bounded shuffle bucket domain, mixed mix inputs."""
    import ray

    from kamae_ray.stages.aggregate import cooccurrence_counts, groupby_rollup
    from kamae_ray.stages.hashing import deterministic_shuffle, mix_corpora

    # SQL: ROLLUP on an empty relation still returns the grand-total row
    empty = pa.table({"k": pa.array([], pa.string()), "v": pa.array([], pa.float64())})
    out = groupby_rollup(empty, "k", {"v": ["count", "sum", "min"]})
    assert out.num_rows == 1
    r = out.to_pylist()[0]
    assert r["v_count"] == 0 and r["k"] is None and r["grouping_id"] == 1
    assert np.isnan(r["v_sum"]) and np.isnan(r["v_min"])
    ora = duckdb.sql(
        "SELECT count(v) c, sum(v) s FROM empty GROUP BY ROLLUP(k)"
    ).df()
    assert len(ora) == 1 and int(ora["c"][0]) == 0

    # null items are excluded from pairs (SQL: NULL never satisfies a < b)
    t = pa.table({"g": pa.array([1, 1, 1, 2, 2], pa.int64()),
                  "item": pa.array([5, None, 7, None, None], pa.int64())})
    pairs = cooccurrence_counts(t, "g", "item")
    assert pairs.to_pylist() == [{"item_a": 5, "item_b": 7, "n": 1}]

    # shuffle positions remain an exact permutation with the wide bucket domain
    keys = pa.table({"k": pa.array(range(3000), pa.int64())})
    ds = ray.data.from_arrow(keys).repartition(5)
    pos = sorted(
        r["shuffle_pos"]
        for b in deterministic_shuffle(ds, "k", salt=3).iter_batches(batch_format="pyarrow")
        for r in pa.table(b).to_pylist()
    )
    assert pos == list(range(3000))

    # mixed Table + Dataset sources normalize instead of crashing
    tt = pa.table({"k": pa.array(range(100), pa.int64())})
    mixed = mix_corpora([(tt, 1.0, "t"), (ray.data.from_arrow(tt), 0.5, "d")], "k", salt=2)
    got = pa.concat_tables([pa.table(b) for b in mixed.iter_batches(batch_format="pyarrow")])
    import collections

    c = collections.Counter(got.column("mix_source").to_pylist())
    assert c["t"] == 100 and 20 <= c["d"] <= 80
