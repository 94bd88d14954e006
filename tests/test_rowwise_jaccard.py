"""rowwise_jaccard + the list-split helpers (similarity.py / arrays.py):
set semantics, null/empty contracts, python-set equivalence, Dataset parity."""

import numpy as np
import pyarrow as pa
import pytest

from kamae_ray.functions.arrays import drop_empty_tokens, split_list_halves
from kamae_ray.stages.similarity import rowwise_jaccard


def test_split_list_halves():
    a = pa.array([["a", "b", "c"], None, [], ["x", "y", "z", "w"], ["q"]])
    l, r = split_list_halves(a)
    assert l.to_pylist() == [["a"], None, [], ["x", "y"], []]
    assert r.to_pylist() == [["b", "c"], None, [], ["z", "w"], ["q"]]


def test_drop_empty_tokens():
    a = pa.array([["", "a", "", "b"], None, [""], ["x"]])
    assert drop_empty_tokens(a).to_pylist() == [["a", "b"], None, [], ["x"]]


def test_rowwise_jaccard_hand_cases():
    t = pa.table({
        "a": [["x", "y", "y"], ["a"], None, [], ["p"]],
        "b": [["y", "z"], ["a"], ["q"], [], None],
    })
    out = rowwise_jaccard(t, "a", "b").to_pylist()
    assert (out[0]["jaccard_inter"], out[0]["jaccard_union"],
            out[0]["jaccard_ppm"]) == (1, 3, 333333)
    assert out[1]["jaccard_ppm"] == 1_000_000
    assert out[2]["jaccard_ppm"] is None      # null a
    assert out[3]["jaccard_union"] == 0 and out[3]["jaccard_ppm"] is None
    assert out[4]["jaccard_ppm"] is None      # null b


def test_rowwise_jaccard_matches_python_sets():
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(40)]
    rows_a = [list(rng.choice(vocab, rng.integers(0, 15))) for _ in range(300)]
    rows_b = [list(rng.choice(vocab, rng.integers(0, 15))) for _ in range(300)]
    t = pa.table({"a": pa.array(rows_a, pa.list_(pa.string())),
                  "b": pa.array(rows_b, pa.list_(pa.string()))})
    out = rowwise_jaccard(t, "a", "b")
    for i in range(300):
        sa, sb = set(rows_a[i]), set(rows_b[i])
        assert out.column("jaccard_inter")[i].as_py() == len(sa & sb)
        assert out.column("jaccard_union")[i].as_py() == len(sa | sb)
        exp = (len(sa & sb) * 1_000_000 // len(sa | sb)) if sa | sb else None
        assert out.column("jaccard_ppm")[i].as_py() == exp


def test_rowwise_jaccard_dataset(ray_session):
    import ray

    t = pa.table({"id": [1, 2], "a": [["x"], ["y", "z"]],
                  "b": [["x", "y"], ["z"]]})
    ds = rowwise_jaccard(ray.data.from_arrow(t), "a", "b")
    got = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]).sort_by("id")
    assert got.column("jaccard_ppm").to_pylist() == [500000, 500000]


def test_array_distinct_sort(ray_session):
    import ray

    from kamae_ray.stages.array_ops import ArrayDistinctSortTransformer

    t = ArrayDistinctSortTransformer(input_col="x", output_col="y")
    tb = pa.table({"x": [["b", "a", "b", None, "a"], None, [], ["z"],
                         ["m", "m"]]})
    out = t.transform(tb)
    assert out.column("y").to_pylist() == [["a", "b"], None, [], ["z"], ["m"]]
    # int lists take the same path
    ti = pa.table({"x": pa.array([[3, 1, 3], [2], None], pa.list_(pa.int64()))})
    oi = ArrayDistinctSortTransformer(input_col="x", output_col="y").transform(ti)
    assert oi.column("y").to_pylist() == [[1, 3], [2], None]
    # Dataset parity + random reference vs python sets
    rng = np.random.default_rng(5)
    rows = [[str(v) for v in rng.integers(0, 20, rng.integers(0, 12))]
            for _ in range(400)]
    big = pa.table({"x": pa.array(rows, pa.list_(pa.string()))})
    d = t.transform(ray.data.from_arrow(big))
    got = pa.concat_tables([pa.table(b) for b in
                            d.iter_batches(batch_format="pyarrow")])
    assert got.column("y").to_pylist() == [sorted(set(r)) for r in rows]
    with pytest.raises(TypeError, match="list column"):
        t.transform(pa.table({"x": ["not-a-list"]}))


def test_array_setops(ray_session):
    import ray

    from kamae_ray.stages.array_ops import ArraySetOpTransformer

    tb = pa.table({"a": [["x", "y", "z", "y"], ["p"], None, [], ["m"]],
                   "b": [["y", "w", "z"], [], ["q"], ["r"], None]})
    ops = {"intersect": [["y", "z"], [], None, [], None],
           "union": [["w", "x", "y", "z"], ["p"], None, ["r"], None],
           "except": [["x"], ["p"], None, [], None]}
    for op, want in ops.items():
        t = ArraySetOpTransformer(input_cols=["a", "b"], output_col="o", op=op)
        assert t.transform(tb).column("o").to_pylist() == want, op
        d = t.transform(ray.data.from_arrow(tb))
        got = pa.concat_tables([pa.table(x) for x in
                                d.iter_batches(batch_format="pyarrow")])
        assert got.column("o").to_pylist() == want, op
    # python-set reference sweep incl. null elements (dropped)
    rng = np.random.default_rng(8)
    rows_a, rows_b = [], []
    for _ in range(300):
        rows_a.append([str(v) for v in rng.integers(0, 15, rng.integers(0, 9))])
        rows_b.append([str(v) for v in rng.integers(0, 15, rng.integers(0, 9))])
    big = pa.table({"a": pa.array(rows_a, pa.list_(pa.string())),
                    "b": pa.array(rows_b, pa.list_(pa.string()))})
    for op, fn in (("intersect", lambda x, y: x & y),
                   ("union", lambda x, y: x | y),
                   ("except", lambda x, y: x - y)):
        out = ArraySetOpTransformer(input_cols=["a", "b"], output_col="o",
                                    op=op).transform(big)
        assert out.column("o").to_pylist() == [
            sorted(fn(set(x), set(y))) for x, y in zip(rows_a, rows_b)], op
    with pytest.raises(ValueError, match="intersect"):
        ArraySetOpTransformer(input_cols=["a", "b"], output_col="o", op="xor")
    with pytest.raises(ValueError, match="exactly 2"):
        ArraySetOpTransformer(input_cols=["a"], output_col="o", op="union")
