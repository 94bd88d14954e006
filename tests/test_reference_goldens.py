"""Parity against the reference's OWN test fixtures (hand-copied expected
values from /root/reference/tests/kamae/spark/transformers/*, studied as
behaviour specs — no code reused).

- Bucketize goldens: tests/kamae/spark/transformers/test_bucketize.py:20-150
- StringIndex goldens: tests/kamae/spark/transformers/test_string_index.py:24-199
"""

import pyarrow as pa

from kamae_ray.stages import BucketizeTransformer, StringIndexTransformer


def test_bucketize_reference_goldens():
    t = pa.table(
        {
            "col1": [1.0, 4.0, 7.0],
            "col2": [2.0, 2.0, 8.0],
            "col1_col2_col3": [[1.0, 2.0, 3.0], [4.0, 2.0, 6.0], [7.0, 8.0, 3.0]],
        }
    )
    # test_bucketize.py: col1 splits [2,3,5] -> [1,3,4]
    g = BucketizeTransformer(input_col="col1", splits=[2.0, 3.0, 5.0], output_col="o").transform_batch(t)
    assert g.column("o").to_pylist() == [1, 3, 4]
    # col2 splits [1,5,7,7.5] -> [2,2,5]
    g = BucketizeTransformer(input_col="col2", splits=[1.0, 5.0, 7.0, 7.5], output_col="o").transform_batch(t)
    assert g.column("o").to_pylist() == [2, 2, 5]
    # array col splits [1,5,6,7,7.5] -> [[2,2,2],[2,2,4],[5,6,2]]
    g = BucketizeTransformer(input_col="col1_col2_col3", splits=[1.0, 5.0, 6.0, 7.0, 7.5], output_col="o").transform_batch(t)
    assert g.column("o").to_pylist() == [[2, 2, 2], [2, 2, 4], [5, 6, 2]]


def test_string_index_reference_goldens():
    t = pa.table({"col4": ["a", "b", "a"], "col5": ["c", "c", "a"]})

    def run(col, labels, mask, oov):
        m = StringIndexTransformer(
            input_col=col, labels_array=labels, mask_token=mask, num_oov_indices=oov, output_col="o"
        )
        return m.transform_batch(t).column("o").to_pylist()

    # test_string_index.py parametrizations (expected_0..3)
    assert run("col4", ["a", "b"], None, 1) == [1, 2, 1]
    assert run("col4", ["b", "a"], None, 1) == [2, 1, 2]
    assert run("col5", ["a", "c"], None, 1) == [2, 2, 1]
    assert run("col5", ["c"], None, 1) == [1, 1, 0]  # 'a' unknown -> oov bucket 0


def test_string_index_nulls_mask_reference_golden():
    # string_indexer_w_nulls_expected_4: labels ['a'], mask 'b', oov 5
    t = pa.table({"col4": ["a", "b", None, "a"]})
    m = StringIndexTransformer(
        input_col="col4", labels_array=["a"], mask_token="b", num_oov_indices=5, output_col="o"
    )
    assert m.transform_batch(t).column("o").to_pylist() == [6, 0, 0, 6]


def test_string_index_nested_array_reference_golden():
    # string_index_col4_array_expected: labels ['a','c'], oov 1 over 2-level arrays
    t = pa.table(
        {
            "col4": [
                [["a", "c", "c"], ["a", "c", "c"], ["a", "a", "a"]],
                [["a", "d", "c"], ["a", "t", "s"], ["x", "o", "p"]],
                [["l", "c", "c"], ["a", "h", "c"], ["a", "w", "a"]],
            ]
        }
    )
    m = StringIndexTransformer(input_col="col4", labels_array=["a", "c"], num_oov_indices=1, output_col="o")
    got = m.transform_batch(t).column("o").to_pylist()
    assert got == [
        [[1, 2, 2], [1, 2, 2], [1, 1, 1]],
        [[1, 0, 2], [1, 0, 0], [0, 0, 0]],
        [[0, 2, 2], [1, 0, 2], [1, 0, 1]],
    ]
