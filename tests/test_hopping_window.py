"""hopping_window_agg: Flink/Beam hopping + tumbling event-time windows —
DuckDB parity (timestamp and plain-int time columns, negative epochs),
Dataset path, validation."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from kamae_ray.stages.window import hopping_window_agg


def _events(n=8000, seed=3):
    rng = np.random.default_rng(seed)
    return pa.table({
        "u": pa.array(rng.integers(0, 40, n), pa.int64()),
        "ts": pa.array(rng.integers(0, 1_000_000, n) * 1_000_000, pa.timestamp("us")),
        "v": pa.array(rng.integers(0, 100, n).astype(np.float64)),
    })


def _want(t, hop_us, k):
    con = duckdb.connect()
    con.register("t", t)
    return con.sql(
        f"WITH x AS (SELECT u, v, (epoch_us(ts) // {hop_us}) * {hop_us} - i * {hop_us} AS ws "
        f"FROM t CROSS JOIN range(0, {k}) r(i)) "
        "SELECT u, ws, sum(v) AS v_sum, count(v) AS v_count FROM x GROUP BY u, ws "
        "ORDER BY u, ws"
    ).df()


def _collect(out):
    if isinstance(out, pa.Table):
        return out
    return pa.concat_tables([pa.table(b) for b in out.iter_batches(batch_format="pyarrow")])


def test_hopping_matches_duckdb(ray_session):
    import ray

    t = _events()
    want = _want(t, 900_000_000, 4)
    for src in (t, ray.data.from_arrow(t).repartition(5)):
        out = _collect(hopping_window_agg(src, "u", "ts", 3600, 900,
                                          {"v": ["sum", "count"]})).to_pandas()
        out["ws"] = out["window_start"].astype("int64")  # us epoch
        out = out.sort_values(["u", "ws"]).reset_index(drop=True)
        assert len(out) == len(want)
        assert np.array_equal(out["ws"].to_numpy(), want["ws"].to_numpy())
        assert np.allclose(out["v_sum"], want["v_sum"])
        assert np.array_equal(out["v_count"].to_numpy(), want["v_count"].to_numpy(int))


def test_tumbling_and_int_times_and_negative_epochs():
    t = _events(3000)
    # tumbling = hop == size: every event in exactly one window
    out = hopping_window_agg(t, "u", "ts", 900, 900, {"v": ["count"]})
    assert out.to_pandas()["v_count"].sum() == 3000
    # plain integer time column: params are raw units; negative values floor
    ti = pa.table({
        "u": pa.array([1, 1, 1], pa.int64()),
        "pos": pa.array([-25, -5, 7], pa.int64()),
        "v": pa.array([1.0, 1.0, 1.0]),
    })
    got = hopping_window_agg(ti, "u", "pos", 20, 10, {"v": ["count"]}).to_pandas()
    got = got.sort_values("window_start").reset_index(drop=True)
    # -25 -> windows [-30, -40... wait floor(-25/10)*10 = -30; starts -30,-40
    # -5 -> -10,-20 ; 7 -> 0,-10
    import collections

    want = collections.Counter()
    for v in (-25, -5, 7):
        base = (v // 10) * 10
        for i in range(2):
            want[base - 10 * i] += 1
    assert dict(zip(got["window_start"], got["v_count"])) == dict(want)
    # null timestamps dropped
    tn = pa.table({"u": pa.array([1, 1], pa.int64()),
                   "pos": pa.array([None, 5], pa.int64()),
                   "v": pa.array([1.0, 2.0])})
    assert hopping_window_agg(tn, "u", "pos", 10, 10, {"v": ["count"]}).num_rows == 1
    with pytest.raises(ValueError):
        hopping_window_agg(t, "u", "ts", 100, 30, {"v": ["sum"]})
    with pytest.raises(ValueError):
        hopping_window_agg(t, "u", "ts", 0, 0, {"v": ["sum"]})
