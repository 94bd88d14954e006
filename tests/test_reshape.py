"""explode / pivot vs DuckDB over randomized inputs, both Table and Dataset
paths, incl. null/empty lists, explode_outer semantics, and null pivot keys."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kamae_ray.stages import explode, pivot


def _rand_lists(rng, n):
    out = []
    for _ in range(n):
        r = rng.rand()
        if r < 0.1:
            out.append(None)
        elif r < 0.25:
            out.append([])
        else:
            out.append([int(x) for x in rng.randint(0, 50, rng.randint(1, 6))])
    return pa.array(out, pa.list_(pa.int64()))


@given(st.integers(0, 200), st.integers(0, 9999))
@settings(max_examples=40, deadline=None)
def test_explode_matches_duckdb(n, seed):
    rng = np.random.RandomState(seed)
    t = pa.table({"id": np.arange(n), "xs": _rand_lists(rng, n)})
    got = explode(t, "xs", pos_col="pos").to_pandas()
    oracle = duckdb.sql(
        "SELECT id, unnest(xs) AS xs, unnest(range(len(xs))) AS pos FROM t"
    ).df()
    cols = ["id", "pos", "xs"]
    g = got[cols].sort_values(cols).reset_index(drop=True)
    o = oracle[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, o, check_dtype=False)


def test_explode_outer_keeps_null_and_empty():
    t = pa.table({"id": [1, 2, 3], "xs": pa.array([[7], [], None], pa.list_(pa.int64()))})
    got = explode(t, "xs", pos_col="pos", keep_empty=True).to_pylist()
    assert sorted(got, key=lambda r: r["id"]) == [
        {"id": 1, "xs": 7, "pos": 0},
        {"id": 2, "xs": None, "pos": None},
        {"id": 3, "xs": None, "pos": None},
    ]


def test_explode_dataset_path(ray_session):
    import ray

    rng = np.random.RandomState(3)
    n = 500
    t = pa.table({"id": np.arange(n), "xs": _rand_lists(rng, n)})
    got = (
        explode(ray.data.from_arrow(t).repartition(4), "xs", pos_col="pos")
        .to_pandas()
    )
    oracle = duckdb.sql(
        "SELECT id, unnest(xs) AS xs, unnest(range(len(xs))) AS pos FROM t"
    ).df()
    cols = ["id", "pos", "xs"]
    g = got[cols].sort_values(cols).reset_index(drop=True)
    o = oracle[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, o, check_dtype=False)


@given(st.integers(0, 300), st.integers(0, 9999), st.sampled_from(["sum", "count", "min", "max", "mean"]))
@settings(max_examples=40, deadline=None)
def test_pivot_matches_duckdb(n, seed, agg):
    rng = np.random.RandomState(seed)
    g = [f"g{rng.randint(4)}" for _ in range(n)]
    p = [None if rng.rand() < 0.15 else f"p{rng.randint(3)}" for _ in range(n)]
    v = rng.standard_normal(n)
    t = pa.table({"g": pa.array(g, pa.string()), "p": pa.array(p, pa.string()), "v": v})
    values = ["p0", "p1", "p2"]
    got = pivot(t, "g", "p", "v", values=values, agg=agg).to_pandas()
    sqlagg = {"sum": "sum", "count": "count", "min": "min", "max": "max", "mean": "avg"}[agg]
    sel = ", ".join(
        f"{sqlagg}(CASE WHEN p = '{val}' THEN v END) AS v_{val}_{agg}" for val in values
    )
    oracle = duckdb.sql(f"SELECT g, {sel} FROM t GROUP BY g").df()
    cols = ["g"] + [f"v_{val}_{agg}" for val in values]
    gdf = got[cols].sort_values("g").reset_index(drop=True)
    odf = oracle[cols].sort_values("g").reset_index(drop=True)
    for c in cols[1:]:
        a, b = gdf[c].astype(float).to_numpy(), odf[c].astype(float).to_numpy()
        assert ((np.isnan(a) & np.isnan(b)) | np.isclose(a, b, atol=1e-9)).all(), (c, a, b)
    assert gdf["g"].tolist() == odf["g"].tolist()


def test_pivot_dataset_path_discovers_values(ray_session):
    import ray

    rng = np.random.RandomState(5)
    n = 400
    t = pa.table(
        {
            "g": pa.array([f"g{rng.randint(3)}" for _ in range(n)]),
            "p": pa.array([f"p{rng.randint(4)}" for _ in range(n)]),
            "v": rng.standard_normal(n),
        }
    )
    got = pivot(ray.data.from_arrow(t).repartition(4), "g", "p", "v").to_pandas()
    sel = ", ".join(
        f"sum(CASE WHEN p = 'p{i}' THEN v END) AS v_p{i}_sum" for i in range(4)
    )
    oracle = duckdb.sql(f"SELECT g, {sel} FROM t GROUP BY g").df()
    cols = ["g"] + [f"v_p{i}_sum" for i in range(4)]
    gdf = got[cols].sort_values("g").reset_index(drop=True)
    odf = oracle[cols].sort_values("g").reset_index(drop=True)
    pd.testing.assert_frame_equal(gdf, odf, check_dtype=False, atol=1e-9)


def test_pivot_width_guard():
    t = pa.table({"g": ["a"] * 1100, "p": [f"p{i}" for i in range(1100)], "v": [1.0] * 1100})
    with pytest.raises(ValueError, match="distinct values"):
        pivot(t, "g", "p", "v")


@given(st.integers(0, 200), st.integers(0, 9999))
@settings(max_examples=30, deadline=None)
def test_melt_matches_duckdb(n, seed):
    rng = np.random.RandomState(seed)
    t = pa.table({
        "id": np.arange(n),
        "x": rng.standard_normal(n),
        "y": pa.array([None if rng.rand() < 0.2 else float(v) for v in rng.standard_normal(n)], pa.float64()),
    })
    from kamae_ray.stages import melt as kmelt

    got = kmelt(t, "id", ["x", "y"]).to_pandas()
    oracle = duckdb.sql(
        "SELECT id, 'x' AS variable, x AS value FROM t "
        "UNION ALL SELECT id, 'y', y FROM t"
    ).df()
    cols = ["id", "variable", "value"]
    g = got[cols].sort_values(cols, na_position="first").reset_index(drop=True)
    o = oracle[cols].sort_values(cols, na_position="first").reset_index(drop=True)
    pd.testing.assert_frame_equal(g, o, check_dtype=False)


def test_melt_mixed_numeric_promotes_and_string_mix_raises():
    from kamae_ray.stages import melt as kmelt

    t = pa.table({"id": [1], "a": pa.array([2], pa.int64()), "b": pa.array([1.5], pa.float64())})
    out = kmelt(t, "id", ["a", "b"])
    assert out.schema.field("value").type == pa.float64()
    t2 = pa.table({"id": [1], "a": ["s"], "b": [1.0]})
    with pytest.raises(ValueError, match="cast_to"):
        kmelt(t2, "id", ["a", "b"])


@given(st.integers(0, 80), st.integers(0, 80), st.integers(0, 9999))
@settings(max_examples=40, deadline=None)
def test_set_ops_match_duckdb_null_equal(nl, nr, seed):
    """EXCEPT/INTERSECT: NULLs compare EQUAL (IS NOT DISTINCT FROM), unlike
    join equality — randomized tuples with nulls on both sides."""
    from kamae_ray.stages import except_distinct, intersect_distinct

    rng = np.random.RandomState(seed)

    def mk(n):
        return pa.table({
            "a": pa.array([None if rng.rand() < 0.25 else int(rng.randint(4)) for _ in range(n)], pa.int64()),
            "b": pa.array([None if rng.rand() < 0.25 else f"s{rng.randint(3)}" for _ in range(n)], pa.string()),
        })

    lt, rt = mk(nl), mk(nr)
    for fn, op in ((except_distinct, "EXCEPT"), (intersect_distinct, "INTERSECT")):
        got = fn(lt, rt).to_pandas()
        oracle = duckdb.sql(f"SELECT a, b FROM lt {op} SELECT a, b FROM rt").df()
        cols = ["a", "b"]
        g = got[cols].sort_values(cols, na_position="first").reset_index(drop=True)
        o = oracle[cols].sort_values(cols, na_position="first").reset_index(drop=True)
        pd.testing.assert_frame_equal(g, o, check_dtype=False)


def test_set_ops_dataset_path(ray_session):
    import ray
    from kamae_ray.stages import except_distinct, intersect_distinct

    rng = np.random.RandomState(2)
    lt = pa.table({"a": [None if rng.rand() < 0.2 else int(rng.randint(6)) for _ in range(400)]})
    rt = pa.table({"a": [None if rng.rand() < 0.2 else int(rng.randint(4)) for _ in range(300)]})
    for fn, op in ((except_distinct, "EXCEPT"), (intersect_distinct, "INTERSECT")):
        got = sorted(
            fn(ray.data.from_arrow(lt).repartition(4), ray.data.from_arrow(rt).repartition(3))
            .to_pandas()["a"].fillna(-99).tolist()
        )
        oracle = sorted(duckdb.sql(f"SELECT a FROM lt {op} SELECT a FROM rt").df()["a"].fillna(-99).tolist())
        assert got == oracle, (op, got, oracle)


def test_chunk_text_matches_duckdb(ray_session):
    """RAG chunking: exact integer chunk-count rule, overlap, short docs,
    null text, unicode — Dataset == Table == SQL."""
    import duckdb
    import ray

    from kamae_ray.stages.reshape import chunk_text

    rng = np.random.RandomState(3)
    texts = ["".join(rng.choice(list("abcd e"), rng.randint(0, 60))) for _ in range(300)]
    texts += [None, "", "exact", "café naïve über " * 5]
    t = pa.table({"id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    want = chunk_text(t, "id", "text", 12, overlap=4)
    con = duckdb.connect()
    con.register("t", t)
    ora = con.sql(
        "WITH n AS (SELECT id, text, 1 + (greatest(length(text) - 12, 0) + 7) // 8 AS nc "
        "FROM t WHERE text IS NOT NULL), "
        "x AS (SELECT id, text, unnest(range(0, nc)) AS k FROM n) "
        "SELECT id, CAST(k AS BIGINT) AS chunk_idx, "
        "substr(text, CAST(k * 8 + 1 AS BIGINT), 12) AS chunk_text FROM x "
        "ORDER BY id, chunk_idx"
    ).fetchall()
    got = sorted(want.to_pylist(), key=lambda r: (r["id"], r["chunk_idx"]))
    assert [(r["id"], r["chunk_idx"], r["chunk_text"]) for r in got] == ora
    ds_out = chunk_text(ray.data.from_arrow(t).repartition(4), "id", "text", 12, overlap=4)
    got_ds = sorted(ds_out.take_all(), key=lambda r: (r["id"], r["chunk_idx"]))
    assert got_ds == got


def test_sliding_windows_matches_duckdb(ray_session):
    """LLM context windows: full windows only, stride, nulls, short lists."""
    import duckdb
    import ray

    from kamae_ray.stages.reshape import sliding_windows

    rng = np.random.RandomState(5)
    lists = [None if rng.rand() < 0.05 else [int(x) for x in rng.randint(0, 99, rng.randint(0, 20))]
             for _ in range(400)]
    t = pa.table({"id": pa.array(range(len(lists)), pa.int64()),
                  "v": pa.array(lists, pa.list_(pa.int32()))})
    want = sliding_windows(t, "id", "v", 5, 2)
    con = duckdb.connect()
    con.register("t", t)
    ora = con.sql(
        "WITH m AS (SELECT id, v, CASE WHEN len(v) >= 5 THEN (len(v) - 5) // 2 + 1 ELSE 0 END AS nw "
        "FROM t WHERE v IS NOT NULL), "
        "x AS (SELECT id, v, unnest(range(0, nw)) AS k FROM m) "
        "SELECT id, CAST(k AS BIGINT), v[CAST(k*2+1 AS BIGINT):CAST(k*2+5 AS BIGINT)] FROM x "
        "ORDER BY 1, 2"
    ).fetchall()
    got = sorted(want.to_pylist(), key=lambda r: (r["id"], r["win_idx"]))
    assert [(r["id"], r["win_idx"], r["window"]) for r in got] == [(a, b, list(c)) for a, b, c in ora]
    assert all(len(r["window"]) == 5 for r in got)
    ds_out = sliding_windows(ray.data.from_arrow(t).repartition(4), "id", "v", 5, 2)
    got_ds = sorted(ds_out.take_all(), key=lambda r: (r["id"], r["win_idx"]))
    assert got_ds == got
