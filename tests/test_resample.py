"""resample_locf: dense per-entity bucket grid with last-observation-carried-
forward — DuckDB parity (generate_series + last_value IGNORE NULLS plan),
Table and Dataset paths, int time columns, the bucket-explosion guard."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from kamae_ray.stages.window import resample_locf


def _events(n=6000, seed=4):
    rng = np.random.default_rng(seed)
    return pa.table({
        "u": pa.array(rng.integers(0, 30, n), pa.int64()),
        "ts": pa.array(rng.integers(0, 200_000, n) * 1_000_000, pa.timestamp("us")),
        "v": pa.array(np.round(rng.normal(10, 3, n), 3)),
    })


_ORACLE = """
WITH cells AS (
  SELECT u, b, v FROM (
    SELECT u, epoch_us(ts) // 3600000000 AS b, v, ts,
           row_number() OVER (PARTITION BY u, epoch_us(ts) // 3600000000
                              ORDER BY ts DESC, v ASC) rn
    FROM t WHERE ts IS NOT NULL) WHERE rn = 1),
rng AS (SELECT u, unnest(generate_series(mn, mx)) AS b
        FROM (SELECT u, min(b) mn, max(b) mx FROM cells GROUP BY u)),
j AS (SELECT rng.u, rng.b, cells.v, cells.b IS NOT NULL AS observed
      FROM rng LEFT JOIN cells ON cells.u = rng.u AND cells.b = rng.b)
SELECT u, to_timestamp((b * 3600000000) // 1000000)::TIMESTAMP AS bucket_start,
       last_value(v IGNORE NULLS) OVER (PARTITION BY u ORDER BY b
                                        ROWS UNBOUNDED PRECEDING) AS v,
       observed
FROM j ORDER BY u, bucket_start
"""


def test_resample_locf_matches_duckdb(ray_session):
    import ray

    t = _events()
    con = duckdb.connect()
    con.register("t", t)
    want = con.sql(_ORACLE).df()
    for src in (t, ray.data.from_arrow(t).repartition(5)):
        out = resample_locf(src, "u", "ts", "v", 3600)
        if not isinstance(out, pa.Table):
            out = pa.concat_tables([pa.table(b) for b in out.iter_batches(batch_format="pyarrow")])
        got = out.to_pandas().sort_values(["u", "bucket_start"]).reset_index(drop=True)
        assert len(got) == len(want)
        assert (got["bucket_start"].to_numpy() == want["bucket_start"].to_numpy()).all()
        assert np.allclose(got["v"], want["v"])
        assert (got["observed"].to_numpy() == want["observed"].to_numpy()).all()


def test_resample_int_times_nulls_and_guard():
    # integer time column: raw-unit buckets; gaps filled; nulls dropped
    t = pa.table({
        "u": pa.array([1, 1, 1, 2], pa.int64()),
        "pos": pa.array([3, 17, None, 100], pa.int64()),
        "v": pa.array([1.0, 2.0, 9.0, 5.0]),
    })
    out = resample_locf(t, "u", "pos", "v", 5).to_pylist()
    u1 = [r for r in out if r["u"] == 1]
    assert [r["bucket_start"] for r in u1] == [0, 5, 10, 15]
    assert [r["v"] for r in u1] == [1.0, 1.0, 1.0, 2.0]
    assert [r["observed"] for r in u1] == [True, False, False, True]
    u2 = [r for r in out if r["u"] == 2]
    assert u2 == [{"u": 2, "bucket_start": 100, "v": 5.0, "observed": True}]
    # tie on (bucket, time): smallest value wins (deterministic contract)
    tt = pa.table({"u": pa.array([1, 1], pa.int64()),
                   "pos": pa.array([7, 7], pa.int64()),
                   "v": pa.array([4.0, 2.0])})
    assert resample_locf(tt, "u", "pos", "v", 10).to_pylist()[0]["v"] == 2.0
    # explosion guard
    wide = pa.table({"u": pa.array([1, 1], pa.int64()),
                     "pos": pa.array([0, 10_000_000], pa.int64()),
                     "v": pa.array([1.0, 2.0])})
    with pytest.raises(ValueError):
        resample_locf(wide, "u", "pos", "v", 1, max_buckets_per_entity=1000)
    with pytest.raises(ValueError):
        resample_locf(t, "u", "pos", "v", 0)
