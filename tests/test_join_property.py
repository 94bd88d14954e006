"""Property test: shuffle_join vs DuckDB over randomized inputs — all four
join modes, NULL keys, duplicate keys on both sides, composite keys, tiny
chunk sizes (forcing the generator merge), and selective salting."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kamae_ray.stages import shuffle_join

SQLNAME = {"left": "LEFT", "inner": "INNER", "right": "RIGHT", "outer": "FULL OUTER"}


@st.composite
def join_case(draw):
    nl = draw(st.integers(0, 40))
    nr = draw(st.integers(0, 40))
    n_keys = draw(st.integers(1, 5))
    null_rate = draw(st.sampled_from([0.0, 0.3]))
    seed = draw(st.integers(0, 10_000))
    how = draw(st.sampled_from(["left", "inner", "right", "outer"]))
    chunk = draw(st.sampled_from([3, 1000]))
    return nl, nr, n_keys, null_rate, seed, how, chunk


def _keys(rng, n, n_keys, null_rate):
    ks = [f"k{i}" for i in range(n_keys)]
    out = [None if rng.rand() < null_rate else ks[rng.randint(n_keys)] for _ in range(n)]
    return pa.array(out, pa.string())


def _norm(df):
    cols = ["rid", "k", "x", "y"]
    return df[cols].sort_values(cols, na_position="first").reset_index(drop=True)


@given(join_case())
@settings(max_examples=60, deadline=None)
def test_shuffle_join_table_path_matches_duckdb(case):
    nl, nr, n_keys, null_rate, seed, how, chunk = case
    rng = np.random.RandomState(seed)
    lt = pa.table({"k": _keys(rng, nl, n_keys, null_rate),
                   "x": rng.standard_normal(nl), "rid": np.arange(nl)})
    rt = pa.table({"k": _keys(rng, nr, n_keys, null_rate),
                   "y": rng.standard_normal(nr)})
    got = shuffle_join(lt, rt, on="k", how=how, max_group_product=chunk).to_pandas()
    oracle = duckdb.sql(
        f"SELECT coalesce(l.k, r.k) k, l.x, l.rid, r.y "
        f"FROM lt l {SQLNAME[how]} JOIN rt r ON l.k = r.k"
    ).df()
    pd.testing.assert_frame_equal(_norm(got), _norm(oracle), check_dtype=False)


def test_shuffle_join_dataset_path_randomized(ray_session):
    """Dataset path with multi-block inputs, tiny chunks, and auto-salting —
    a handful of seeds (each run costs a Ray sort)."""
    import ray

    for seed in (1, 2, 3):
        rng = np.random.RandomState(seed)
        nl, nr = 600, 200
        lt = pa.table({"k": _keys(rng, nl, 4, 0.2), "x": rng.standard_normal(nl),
                       "rid": np.arange(nl)})
        rt = pa.table({"k": _keys(rng, nr, 6, 0.2), "y": rng.standard_normal(nr)})
        for how in ("left", "inner", "right", "outer"):
            oracle = duckdb.sql(
                f"SELECT coalesce(l.k, r.k) k, l.x, l.rid, r.y "
                f"FROM lt l {SQLNAME[how]} JOIN rt r ON l.k = r.k"
            ).df()
            got = shuffle_join(
                ray.data.from_arrow(lt).repartition(5),
                ray.data.from_arrow(rt).repartition(3),
                on="k", how=how, max_group_product=50,
                salt_partitions=3, hot_key_rows=60,
            ).to_pandas()
            pd.testing.assert_frame_equal(_norm(got), _norm(oracle), check_dtype=False), (seed, how)


def test_shuffle_join_composite_key_with_nulls():
    rng = np.random.RandomState(7)
    n = 120
    lt = pa.table({
        "a": _keys(rng, n, 3, 0.2),
        "b": pa.array([None if rng.rand() < 0.2 else int(rng.randint(3)) for _ in range(n)], pa.int64()),
        "x": rng.standard_normal(n), "rid": np.arange(n),
    })
    m = 50
    rt = pa.table({
        "a": _keys(rng, m, 3, 0.2),
        "b": pa.array([None if rng.rand() < 0.2 else int(rng.randint(3)) for _ in range(m)], pa.int64()),
        "y": rng.standard_normal(m),
    })
    for how in ("left", "inner", "right", "outer"):
        got = shuffle_join(lt, rt, on=["a", "b"], how=how).to_pandas()
        oracle = duckdb.sql(
            f"SELECT coalesce(l.a, r.a) a, coalesce(l.b, r.b) b, l.x, l.rid, r.y "
            f"FROM lt l {SQLNAME[how]} JOIN rt r ON l.a = r.a AND l.b = r.b"
        ).df()
        cols = ["rid", "a", "b", "x", "y"]
        g = got[cols].sort_values(cols, na_position="first").reset_index(drop=True)
        o = oracle[cols].sort_values(cols, na_position="first").reset_index(drop=True)
        pd.testing.assert_frame_equal(g, o, check_dtype=False)


@given(join_case())
@settings(max_examples=60, deadline=None)
def test_semi_anti_join_table_path_matches_duckdb(case):
    """SEMI/ANTI through BOTH physical plans vs SQL EXISTS/NOT EXISTS —
    duplicate right keys (legal here), NULL keys (semi drops, anti keeps)."""
    from kamae_ray.stages import broadcast_join

    nl, nr, n_keys, null_rate, seed, _, chunk = case
    rng = np.random.RandomState(seed)
    lt = pa.table({"k": _keys(rng, nl, n_keys, null_rate),
                   "x": rng.standard_normal(nl), "rid": np.arange(nl)})
    rt = pa.table({"k": _keys(rng, nr, n_keys, null_rate),
                   "y": rng.standard_normal(nr)})
    cols = ["rid", "k", "x"]
    for how, pred in (("semi", "EXISTS"), ("anti", "NOT EXISTS")):
        oracle = duckdb.sql(
            f"SELECT l.k, l.x, l.rid FROM lt l "
            f"WHERE {pred} (SELECT 1 FROM rt r WHERE r.k = l.k)"
        ).df()
        o = oracle[cols].sort_values(cols, na_position="first").reset_index(drop=True)
        for got in (
            shuffle_join(lt, rt, on="k", how=how, max_group_product=chunk).to_pandas(),
            broadcast_join(lt, rt, on="k", how=how).to_pandas(),
        ):
            g = got[cols].sort_values(cols, na_position="first").reset_index(drop=True)
            pd.testing.assert_frame_equal(g, o, check_dtype=False)


def test_semi_anti_join_dataset_path_with_salting(ray_session):
    import ray

    rng = np.random.RandomState(11)
    nl, nr = 600, 300
    lt = pa.table({"k": _keys(rng, nl, 3, 0.2), "x": rng.standard_normal(nl),
                   "rid": np.arange(nl)})
    rt = pa.table({"k": _keys(rng, nr, 5, 0.2), "y": rng.standard_normal(nr)})
    cols = ["rid", "k", "x"]
    for how, pred in (("semi", "EXISTS"), ("anti", "NOT EXISTS")):
        oracle = duckdb.sql(
            f"SELECT l.k, l.x, l.rid FROM lt l "
            f"WHERE {pred} (SELECT 1 FROM rt r WHERE r.k = l.k)"
        ).df()
        got = shuffle_join(
            ray.data.from_arrow(lt).repartition(5),
            ray.data.from_arrow(rt).repartition(3),
            on="k", how=how, salt_partitions=3, hot_key_rows=60,
        ).to_pandas()
        g = got[cols].sort_values(cols, na_position="first").reset_index(drop=True)
        o = oracle[cols].sort_values(cols, na_position="first").reset_index(drop=True)
        pd.testing.assert_frame_equal(g, o, check_dtype=False)


@st.composite
def agg_case(draw):
    n = draw(st.integers(0, 300))
    n_keys = draw(st.integers(1, 6))
    null_key_rate = draw(st.sampled_from([0.0, 0.25]))
    null_val_rate = draw(st.sampled_from([0.0, 0.3]))
    seed = draw(st.integers(0, 10_000))
    return n, n_keys, null_key_rate, null_val_rate, seed


@given(agg_case())
@settings(max_examples=50, deadline=None)
def test_groupby_agg_table_path_matches_duckdb(case):
    """groupby_agg vs SQL over randomized keys/values incl. NULL keys (a
    group) and NULL values (skipped; SUM/AVG of all-null group = NULL)."""
    from kamae_ray.stages import groupby_agg

    n, n_keys, nkr, nvr, seed = case
    rng = np.random.RandomState(seed)
    g = [None if rng.rand() < nkr else f"g{rng.randint(n_keys)}" for _ in range(n)]
    v = np.where(rng.rand(n) < nvr, np.nan, rng.standard_normal(n))
    t = pa.table({"g": pa.array(g, pa.string()),
                  "v": pa.array([None if np.isnan(x) else float(x) for x in v], pa.float64())})
    got = (
        groupby_agg(t, "g", {"v": ["sum", "count", "mean", "min", "max", "std"]})
        .to_pandas().sort_values("g", na_position="first").reset_index(drop=True)
    )
    o = duckdb.sql(
        "SELECT g, sum(v) v_sum, count(v) v_count, avg(v) v_mean, min(v) v_min, "
        "max(v) v_max, stddev_pop(v) v_std FROM t GROUP BY g ORDER BY g NULLS FIRST"
    ).df()
    assert got["v_count"].tolist() == o["v_count"].tolist()
    for col in ("v_sum", "v_mean", "v_min", "v_max", "v_std"):
        a = got[col].astype(float).to_numpy()
        b = o[col].astype(float).to_numpy()
        # stddev_pop of a single value: DuckDB returns NULL only for stddev_samp;
        # pop returns 0 — both engines agree; compare NaN-aware
        assert len(a) == len(b)
        same = np.isclose(a, b, atol=1e-9) | (np.isnan(a) & np.isnan(b))
        assert same.all(), (col, a, b)


@st.composite
def range_case(draw):
    npts = draw(st.integers(0, 60))
    nivs = draw(st.integers(0, 30))
    n_keys = draw(st.integers(1, 4))
    null_rate = draw(st.sampled_from([0.0, 0.2]))
    seed = draw(st.integers(0, 10_000))
    how = draw(st.sampled_from(["inner", "left"]))
    chunk = draw(st.sampled_from([5, 1_000_000]))
    return npts, nivs, n_keys, null_rate, seed, how, chunk


@given(range_case())
@settings(max_examples=60, deadline=None)
def test_range_join_table_path_matches_duckdb(case):
    """Interval containment vs SQL BETWEEN join — overlapping/duplicate
    intervals, null keys/times/endpoints, tiny emission chunks."""
    from kamae_ray.stages import range_join

    npts, nivs, n_keys, null_rate, seed, how, chunk = case
    rng = np.random.RandomState(seed)

    def key(n):
        return pa.array([None if rng.rand() < null_rate else int(rng.randint(n_keys)) for _ in range(n)], pa.int64())

    def num(n, span=50):
        return pa.array([None if rng.rand() < null_rate else float(rng.randint(span)) for _ in range(n)], pa.float64())

    pts = pa.table({"u": key(npts), "t": num(npts), "pid": np.arange(npts)})
    s = num(nivs)
    widths = rng.randint(0, 20, nivs).astype(float)
    e = pa.array([None if s[i].as_py() is None or rng.rand() < null_rate / 2
                  else s[i].as_py() + widths[i] for i in range(nivs)], pa.float64())
    ivs = pa.table({"u": key(nivs), "s": s, "e": e, "iid": np.arange(100, 100 + nivs)})
    got = range_join(pts, ivs, by=["u"], left_on="t", right_start="s", right_end="e",
                     how=how, max_chunk_rows=chunk).to_pandas()
    jt = "JOIN" if how == "inner" else "LEFT JOIN"
    oracle = duckdb.sql(
        f"SELECT p.pid, i.iid FROM pts p {jt} ivs i "
        f"ON p.u = i.u AND p.t BETWEEN i.s AND i.e"
    ).df()
    cols = ["pid", "iid"]
    g = got[cols].sort_values(cols, na_position="last").reset_index(drop=True)
    o = oracle[cols].sort_values(cols, na_position="last").reset_index(drop=True)
    pd.testing.assert_frame_equal(g, o, check_dtype=False)


def test_range_join_dataset_path(ray_session):
    import ray
    from kamae_ray.stages import range_join

    rng = np.random.RandomState(21)
    npts, nivs = 500, 120
    pts = pa.table({
        "u": pa.array([int(rng.randint(8)) for _ in range(npts)], pa.int64()),
        "t": pa.array(rng.uniform(0, 1000, npts)),
        "pid": np.arange(npts),
    })
    s = rng.uniform(0, 1000, nivs)
    ivs = pa.table({
        "u": pa.array([int(rng.randint(8)) for _ in range(nivs)], pa.int64()),
        "s": s, "e": s + rng.uniform(0, 80, nivs),
        "iid": np.arange(nivs),
    })
    got = range_join(
        ray.data.from_arrow(pts).repartition(5),
        ray.data.from_arrow(ivs).repartition(3),
        by=["u"], left_on="t", right_start="s", right_end="e", how="left",
        max_chunk_rows=200,
    ).to_pandas()
    oracle = duckdb.sql(
        "SELECT p.pid, i.iid FROM pts p LEFT JOIN ivs i "
        "ON p.u = i.u AND p.t BETWEEN i.s AND i.e"
    ).df()
    cols = ["pid", "iid"]
    g = got[cols].sort_values(cols, na_position="last").reset_index(drop=True)
    o = oracle[cols].sort_values(cols, na_position="last").reset_index(drop=True)
    pd.testing.assert_frame_equal(g, o, check_dtype=False)


def test_broadcast_range_join_matches_shuffle_path(ray_session):
    """broadcast_range_join == range_join == DuckDB on the same randomized
    input (Dataset path, nulls, heavy overlap)."""
    import ray
    from kamae_ray.stages import broadcast_range_join, range_join

    rng = np.random.RandomState(33)
    npts, nivs = 600, 100
    pts = pa.table({
        "u": pa.array([None if rng.rand() < 0.1 else int(rng.randint(6)) for _ in range(npts)], pa.int64()),
        "t": pa.array([None if rng.rand() < 0.1 else float(rng.uniform(0, 500)) for _ in range(npts)], pa.float64()),
        "pid": np.arange(npts),
    })
    s = rng.uniform(0, 500, nivs)
    ivs = pa.table({
        "u": pa.array([None if rng.rand() < 0.1 else int(rng.randint(6)) for _ in range(nivs)], pa.int64()),
        "s": s, "e": s + rng.uniform(0, 120, nivs), "iid": np.arange(nivs),
    })
    cols = ["pid", "iid"]
    for how in ("inner", "left"):
        jt = "JOIN" if how == "inner" else "LEFT JOIN"
        oracle = duckdb.sql(
            f"SELECT p.pid, i.iid FROM pts p {jt} ivs i ON p.u = i.u AND p.t BETWEEN i.s AND i.e"
        ).df()[cols].sort_values(cols, na_position="last").reset_index(drop=True)
        b = broadcast_range_join(
            ray.data.from_arrow(pts).repartition(4), ivs,
            by=["u"], left_on="t", right_start="s", right_end="e", how=how,
        ).to_pandas()[cols].sort_values(cols, na_position="last").reset_index(drop=True)
        r = range_join(
            ray.data.from_arrow(pts).repartition(4), ray.data.from_arrow(ivs),
            by=["u"], left_on="t", right_start="s", right_end="e", how=how,
        ).to_pandas()[cols].sort_values(cols, na_position="last").reset_index(drop=True)
        pd.testing.assert_frame_equal(b, oracle, check_dtype=False)
        pd.testing.assert_frame_equal(r, oracle, check_dtype=False)
