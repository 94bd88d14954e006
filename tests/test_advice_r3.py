"""Regression tests for the round-3 ADVICE findings:

1. sketches._hash_any must hash FLOAT bit patterns (a value cast to int64
   truncates fractions — all of [0,1) collapsed to one hash).
2. funnel / merge_intervals must keep int64 timestamps exact at ns-epoch
   magnitudes (float64 loses ~256 ns there).
3. top_frequent must RAISE instead of silently returning a wrong top-k when
   the Misra-Gries error bound cannot certify candidate sufficiency.
4. pivot's automatic value discovery must bound the driver materialization
   (limit before take_all), not just raise after collecting everything.
"""

import numpy as np
import pyarrow as pa
import pytest


def test_float_hash_distinct_fractions():
    """1000 distinct floats in [0,1): the truncating-cast bug returned 2."""
    from kamae_ray.stages.sketches import approx_count_distinct

    rng = np.random.RandomState(5)
    vals = rng.rand(1000)
    vals = np.unique(vals)
    t = pa.table({"v": pa.array(vals, pa.float64())})
    est = approx_count_distinct(t, "v")
    assert abs(est - len(vals)) / len(vals) < 0.081, est


def test_float_hash_zero_and_nan_canonical():
    """-0.0 hashes like +0.0; every NaN payload hashes like one NaN."""
    from kamae_ray.stages.sketches import _hash_any

    t = pa.array([0.0, -0.0, np.nan, np.float64(np.nan)], pa.float64())
    h, valid = _hash_any(t)
    assert valid.all()
    assert h[0] == h[1]
    assert h[2] == h[3]
    # and fractions do NOT collide with their floor
    h2, _ = _hash_any(pa.array([0.25, 0.75, 0.0], pa.float64()))
    assert len(set(h2.tolist())) == 3


def test_funnel_ns_timestamps_exact(ray_session):
    """Two ns-unit events 1 ns apart straddle a float64 ulp (~256 ns at
    2024 epochs): the strict-after chain must still see b AFTER a."""
    from kamae_ray.stages.window import funnel

    base = 1_700_000_000_000_000_000  # ns epoch, ulp(float64) = 256 here
    assert float(base) == float(base + 1)  # the trap this test pins
    t = pa.table({
        "u": pa.array([1, 1], pa.int64()),
        "ts": pa.array([base, base + 1], pa.int64()).cast(pa.timestamp("ns")),
        "ev": pa.array(["a", "b"], pa.string()),
    })
    out = funnel(t, "u", "ts", "ev", ["a", "b"])
    assert out.column("funnel_depth").to_pylist() == [2]
    assert out.column("step2_ts").cast(pa.int64()).to_pylist() == [base + 1]


def test_funnel_int64_time_exact():
    """Plain int64 time columns also take the exact integer path."""
    from kamae_ray.stages.window import funnel

    base = 1_700_000_000_000_000_000
    t = pa.table({
        "u": pa.array([1, 1, 2], pa.int64()),
        "ts": pa.array([base, base + 1, base], pa.int64()),
        "ev": pa.array(["a", "b", "b"], pa.string()),
    })
    out = funnel(t, "u", "ts", "ev", ["a", "b"]).sort_by("u")
    assert out.column("funnel_depth").to_pylist() == [2, 0]
    assert out.column("step2_ts").type == pa.int64()
    assert out.column("step2_ts").to_pylist() == [base + 1, None]


def test_merge_intervals_ns_timestamps_exact():
    """A 1-ns gap at ns-epoch magnitude must still split islands."""
    from kamae_ray.stages.window import merge_intervals

    base = 1_700_000_000_000_000_000
    t = pa.table({
        "u": pa.array([1, 1], pa.int64()),
        "s": pa.array([base, base + 11], pa.int64()).cast(pa.timestamp("ns")),
        "e": pa.array([base + 10, base + 20], pa.int64()).cast(pa.timestamp("ns")),
    })
    out = merge_intervals(t, "u", "s", "e")
    assert out.num_rows == 2  # float64 would collapse the gap and merge
    ends = out.column("island_end").cast(pa.int64()).to_pylist()
    assert sorted(ends) == [base + 10, base + 20]
    # integer (non-timestamp) columns keep int64 output exactly too
    t2 = pa.table({
        "u": pa.array([1, 1], pa.int64()),
        "s": pa.array([base, base + 11], pa.int64()),
        "e": pa.array([base + 10, base + 20], pa.int64()),
    })
    out2 = merge_intervals(t2, "u", "s", "e")
    assert out2.column("island_start").type == pa.int64()
    assert out2.num_rows == 2


def test_top_frequent_raises_when_uncertifiable(ray_session):
    """Thousands of equal-count values under a tiny capacity: the candidate
    cutoff sits inside the compression error, so exactness is impossible to
    certify — must raise, not silently return a plausible-but-wrong top-k."""
    import ray

    from kamae_ray.stages.sketches import top_frequent

    rng = np.random.RandomState(9)
    vals = [f"v{i}" for i in range(4000) for _ in range(2)]
    rng.shuffle(vals)
    t = pa.table({"v": pa.array(vals, pa.string())})
    with pytest.raises(ValueError, match="cannot certify"):
        top_frequent(ray.data.from_arrow(t).repartition(4), "v", k=5, capacity=16)


def test_top_frequent_still_exact_with_real_heavy_hitters(ray_session):
    """The certificate must NOT fire when a clear frequency gap exists."""
    import duckdb
    import ray

    from kamae_ray.stages.sketches import top_frequent

    rng = np.random.RandomState(4)
    vals = [f"hot{i}" for i in range(4) for _ in range(3000 - 500 * i)]
    vals += [f"tail{rng.randint(50000)}" for _ in range(20000)]
    rng.shuffle(vals)
    t = pa.table({"v": pa.array(vals, pa.string())})
    got = top_frequent(ray.data.from_arrow(t).repartition(6), "v", k=4, capacity=256).to_pylist()
    oracle = duckdb.sql(
        "SELECT v, count(*)::DOUBLE c FROM t GROUP BY v ORDER BY c DESC, v LIMIT 4"
    ).fetchall()
    assert [(r["v"], r["count"]) for r in got] == [(a, b) for a, b in oracle]


def test_pivot_discovery_bounded_on_driver(ray_session):
    """High-cardinality pivot_col: the guard fires off a limit(1001) pull,
    never a full distinct materialization."""
    import ray

    from kamae_ray.stages.reshape import pivot

    n = 20000
    t = pa.table({
        "k": pa.array(np.zeros(n, np.int64)),
        "p": pa.array([f"p{i}" for i in range(n)], pa.string()),
        "v": pa.array(np.ones(n, np.float64)),
    })
    with pytest.raises(ValueError, match="1000 distinct"):
        pivot(ray.data.from_arrow(t).repartition(4), "k", "p", "v", agg="sum")
