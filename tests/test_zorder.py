"""zorder_key: SQL-exact Morton interleave, locality property (a z-sorted
layout bounds EVERY participating dimension per chunk, unlike a single-column
sort), Dataset path, validation."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from kamae_ray.stages.hashing import zorder_key, zorder_oracle_sql


def _tbl(n=5000, seed=2):
    rng = np.random.default_rng(seed)
    return pa.table({"x": pa.array(rng.integers(0, 1024, n), pa.int64()),
                     "y": pa.array(rng.integers(0, 1024, n), pa.int64()),
                     "id": pa.array(np.arange(n), pa.int64())})


def test_zorder_matches_generated_sql():
    t = _tbl()
    got = zorder_key(t, ["x", "y"], bits=10).to_pandas().sort_values("id")
    con = duckdb.connect()
    con.register("t", t)
    want = con.sql(
        f"SELECT id, {zorder_oracle_sql(['x', 'y'], 10)} FROM t ORDER BY id"
    ).df()
    assert np.array_equal(got["zorder_key"].to_numpy(), want["zorder_key"].to_numpy())
    # 3 columns, different bit width
    got3 = zorder_key(t.append_column("z", t.column("x")), ["x", "y", "z"], bits=7)
    want3 = con.sql(
        "SELECT id, " + zorder_oracle_sql(["x", "y", "x"], 7) + " FROM t ORDER BY id"
    ).df()
    assert np.array_equal(
        got3.to_pandas().sort_values("id")["zorder_key"].to_numpy(),
        want3["zorder_key"].to_numpy(),
    )


def test_zorder_bounds_every_dimension():
    """The property the key exists for: chunks of a z-sorted table have a
    BOUNDED extent in both dims (so row-group min-max stats prune 2-D range
    predicates); an x-sorted layout leaves y unbounded."""
    df = zorder_key(_tbl(20_000), ["x", "y"], bits=10).to_pandas()
    zs = df.sort_values("zorder_key").reset_index(drop=True)
    n_chunks = 64
    bounds = {"x": [], "y": []}
    for c in np.array_split(zs.index.to_numpy(), n_chunks):
        ch = zs.iloc[c]
        for d in ("x", "y"):
            bounds[d].append(ch[d].max() - ch[d].min())
    # 64 chunks of a 1024x1024 z-space: every chunk spans <= ~1/4 of each dim
    assert np.mean(bounds["x"]) < 384 and np.mean(bounds["y"]) < 384
    xs = df.sort_values("x").reset_index(drop=True)
    y_span_xsort = np.mean([
        xs.iloc[c]["y"].max() - xs.iloc[c]["y"].min()
        for c in np.array_split(xs.index.to_numpy(), n_chunks)
    ])
    assert y_span_xsort > 900  # single-column sort: other dim unbounded


def test_zorder_dataset_and_validation(ray_session):
    import ray

    t = _tbl(3000)
    want = zorder_key(t, ["x", "y"], bits=8)
    ds = zorder_key(ray.data.from_arrow(t).repartition(4), ["x", "y"], bits=8)
    got = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    assert sorted(got.column("zorder_key").to_pylist()) == sorted(
        want.column("zorder_key").to_pylist())
    # sort=True returns a key-sorted dataset
    srt = zorder_key(ray.data.from_arrow(t).repartition(4), ["x", "y"], bits=8, sort=True)
    keys = [r["zorder_key"] for b in srt.iter_batches(batch_format="pyarrow")
            for r in pa.table(b).to_pylist()]
    assert keys == sorted(keys)
    with pytest.raises(ValueError):
        zorder_key(t, ["x"], bits=8)
    with pytest.raises(ValueError):
        zorder_key(t, ["x", "y"], bits=32)
    neg = pa.table({"x": pa.array([-1], pa.int64()), "y": pa.array([0], pa.int64())})
    with pytest.raises(ValueError):
        zorder_key(neg, ["x", "y"], bits=8)
    nul = pa.table({"x": pa.array([None], pa.int64()), "y": pa.array([0], pa.int64())})
    with pytest.raises(ValueError):
        zorder_key(nul, ["x", "y"], bits=8)
