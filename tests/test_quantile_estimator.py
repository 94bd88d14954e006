"""exact_quantiles (streaming histogram-refinement quantile_cont) and
QuantileBucketizeEstimator — parity vs DuckDB / numpy."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from kamae_ray.stages.scalers import QuantileBucketizeEstimator
from kamae_ray.state.aggregators import exact_quantiles


def _tbl(n=30000, seed=5):
    rng = np.random.default_rng(seed)
    vals = np.round(rng.lognormal(3.0, 1.0, n), 4)
    return pa.table({"v": pa.array(vals)})


def test_exact_quantiles_matches_duckdb_table():
    t = _tbl()
    qs = [0.1, 0.25, 0.5, 0.75, 0.99]
    got = exact_quantiles(t, "v", qs)
    for q, g in zip(qs, got):
        want = duckdb.query(f"SELECT quantile_cont(v, {q}) FROM t").fetchone()[0]
        assert g == pytest.approx(want, rel=1e-12), q


def test_exact_quantiles_matches_numpy_edges():
    t = pa.table({"v": pa.array([5.0, 1.0, 3.0, 2.0, 4.0])})
    got = exact_quantiles(t, "v", [0.0, 1.0, 0.5, 0.125])
    assert got == pytest.approx([1.0, 5.0, 3.0, np.quantile([1, 2, 3, 4, 5.0], 0.125)])


def test_exact_quantiles_nulls_mask_and_empty():
    t = pa.table({"v": pa.array([None, 2.0, -1.0, 4.0], pa.float64())})
    # mask_value -1 excluded like null
    got = exact_quantiles(t, "v", [0.5], mask_value=-1.0)
    assert got == [pytest.approx(3.0)]
    empty = pa.table({"v": pa.array([], pa.float64())})
    assert exact_quantiles(empty, "v", [0.5]) == [None]
    const = pa.table({"v": pa.array([7.0, 7.0])})
    assert exact_quantiles(const, "v", [0.25, 0.75]) == [7.0, 7.0]


def test_exact_quantiles_dataset_matches_table(ray_session):
    import ray

    t = _tbl(n=50000, seed=11)
    expected = exact_quantiles(t, "v", [0.25, 0.5, 0.9])
    ds = ray.data.from_arrow(t).repartition(8)
    got = exact_quantiles(ds, "v", [0.25, 0.5, 0.9])
    assert got == pytest.approx(expected, rel=1e-12)


def test_quantile_bucketize_estimator_balanced_buckets():
    t = _tbl(n=20000, seed=17)
    est = QuantileBucketizeEstimator(input_col="v", output_col="b", num_buckets=4)
    model = est.fit(t)
    out = model.transform(t)
    counts = np.bincount(out.column("b").to_numpy(zero_copy_only=False))
    # Bucketize reserves bucket 0 for mask; learned quartiles -> buckets 1..4
    assert counts[0] == 0 and len(counts) == 5
    assert counts[1:].min() > 0.24 * t.num_rows and counts[1:].max() < 0.26 * t.num_rows


def test_quantile_bucketize_duplicate_boundaries_collapse():
    t = pa.table({"v": pa.array([1.0] * 98 + [2.0, 3.0])})
    model = QuantileBucketizeEstimator(input_col="v", output_col="b", num_buckets=4).fit(t)
    assert model.splits == [1.0]  # all three quartiles equal -> one split


def test_quantile_bucketize_boundary_decimals_and_probs():
    t = _tbl(n=5000, seed=23)
    model = QuantileBucketizeEstimator(
        input_col="v", output_col="b", probs=[0.5], boundary_decimals=6
    ).fit(t)
    assert model.splits == [round(model.splits[0], 6)]
    with pytest.raises(ValueError):
        QuantileBucketizeEstimator(input_col="v", output_col="b", probs=[0.0, 0.5])
    with pytest.raises(ValueError):
        QuantileBucketizeEstimator(input_col="v", output_col="b", num_buckets=1)


def test_quantile_bucketize_dataset_fit(ray_session):
    import ray

    t = _tbl(n=30000, seed=29)
    expected = QuantileBucketizeEstimator(input_col="v", output_col="b", num_buckets=5).fit(t).splits
    ds = ray.data.from_arrow(t).repartition(6)
    got = QuantileBucketizeEstimator(input_col="v", output_col="b", num_buckets=5).fit(ds).splits
    assert got == pytest.approx(expected, rel=1e-12)
