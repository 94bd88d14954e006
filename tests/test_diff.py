import numpy as np
import pyarrow as pa
import pytest

from kamae_ray.stages.diff import row_fingerprint, snapshot_diff


def _tbl(keys, vals, extra=None):
    cols = {"k": pa.array(keys, pa.int64()), "v": pa.array(vals)}
    if extra is not None:
        cols["w"] = pa.array(extra)
    return pa.table(cols)


def _as_dict(out):
    if not isinstance(out, pa.Table):
        rows = out.take_all()
        return {r["k"]: r["status"] for r in rows}
    return dict(zip(out.column("k").to_pylist(), out.column("status").to_pylist()))


def test_snapshot_diff_basic_classification():
    old = _tbl([1, 2, 3, 4], ["a", "b", "c", "d"])
    new = _tbl([2, 3, 4, 5], ["b", "CHANGED", "d", "e"])
    got = _as_dict(snapshot_diff(old, new, "k", "v"))
    assert got == {1: "removed", 3: "changed", 5: "added"}


def test_snapshot_diff_null_values_and_keys():
    # null -> value and value -> null are both 'changed'; null == null is equal
    old = _tbl([1, 2, 3], [None, "x", None])
    new = _tbl([1, 2, 3], ["y", None, None])
    got = _as_dict(snapshot_diff(old, new, "k", "v"))
    assert got == {1: "changed", 2: "changed"}


def test_snapshot_diff_multiset_duplicate_keys():
    # same multiset of rows under a duplicate key -> unchanged, regardless of order
    old = _tbl([7, 7, 8, 8], ["a", "b", "a", "a"])
    new = _tbl([7, 7, 8, 8], ["b", "a", "a", "b"])
    got = _as_dict(snapshot_diff(old, new, "k", "v"))
    assert got == {8: "changed"}
    # count mismatch under one key -> changed
    old2 = _tbl([9, 9], ["a", "a"])
    new2 = _tbl([9], ["a"])
    assert _as_dict(snapshot_diff(old2, new2, "k", "v")) == {9: "changed"}


def test_snapshot_diff_float_columns_bitpattern():
    # -0.0 == 0.0 and NaN == NaN (canonicalized), fractions distinguish
    old = _tbl([1, 2, 3], pa.array([0.0, float("nan"), 0.25], pa.float64()))
    new = _tbl([1, 2, 3], pa.array([-0.0, float("nan"), 0.75], pa.float64()))
    assert _as_dict(snapshot_diff(old, new, "k", "v")) == {3: "changed"}


def test_snapshot_diff_identical_snapshots_empty():
    t = _tbl([1, 2], ["a", "b"], [1.5, 2.5])
    out = snapshot_diff(t, t, "k", ["v", "w"])
    assert out.num_rows == 0
    assert out.column_names == ["k", "status"]


def test_snapshot_diff_dataset_matches_table(ray_session):
    import ray

    rng = np.random.RandomState(3)
    n = 5000
    keys = np.arange(n, dtype=np.int64)
    vals = rng.randint(0, 50, size=n).astype(np.int64)
    old = pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    keep = keys % 11 != 0
    new = pa.table({
        "k": pa.array(keys[keep]),
        "v": pa.array(np.where(keys[keep] % 3 == 0, vals[keep] + 1, vals[keep])),
    })
    want = _as_dict(snapshot_diff(old, new, "k", "v"))
    got = _as_dict(snapshot_diff(
        ray.data.from_arrow(old).repartition(7),
        ray.data.from_arrow(new).repartition(5), "k", "v"))
    assert got == want
    assert sum(1 for s in want.values() if s == "removed") == int((keys % 11 == 0).sum())


def test_row_fingerprint_column_order_sensitive():
    t = pa.table({"a": pa.array([1, 2], pa.int64()), "b": pa.array([2, 1], pa.int64())})
    f_ab = row_fingerprint(t, ["a", "b"], 1)
    f_ba = row_fingerprint(t, ["b", "a"], 1)
    assert not np.array_equal(f_ab, f_ba)
    with pytest.raises(KeyError):
        row_fingerprint(t, ["missing"], 1)
