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


def test_bin_reference_goldens():
    from kamae_ray.stages import BinTransformer

    t = pa.table({"col1": [1.0, 4.0, 7.0], "col2": [2.0, 2.0, 8.0], "col3": [3.0, 6.0, 3.0]})
    # test_bin.py expected_1: leq 2 / gt 6 over col1
    g = BinTransformer(
        input_col="col1", condition_operators=["leq", "gt"], bin_values=[2, 6],
        bin_labels=["less_than_equal_to_2", "greater_than_6"], default_label="default", output_col="o",
    ).transform_batch(t)
    assert g.column("o").to_pylist() == ["less_than_equal_to_2", "default", "greater_than_6"]
    # expected_2: eq 2 / neq 10 over col2
    g = BinTransformer(
        input_col="col2", condition_operators=["eq", "neq"], bin_values=[2, 10],
        bin_labels=["equal_to_2", "not_equal_to_10"], default_label="default", output_col="o",
    ).transform_batch(t)
    assert g.column("o").to_pylist() == ["equal_to_2", "equal_to_2", "not_equal_to_10"]
    # expected_3: numeric labels lt/eq/gt over col3 -> [1.0, -1.0, 1.0]
    g = BinTransformer(
        input_col="col3", condition_operators=["lt", "eq", "gt"], bin_values=[3, 3, 6],
        bin_labels=[0.0, 1.0, 2.0], default_label=-1.0, output_col="o",
    ).transform_batch(t)
    assert g.column("o").to_pylist() == [1.0, -1.0, 1.0]


def test_array_crop_reference_goldens():
    from kamae_ray.stages import ArrayCropTransformer

    # test_array_crop.py expected_1 (strings, pad "-1") and expected_2 (ints, pad -1)
    t = pa.table(
        {
            "s": [["a", "a", "a", "b", "c"], ["x", "z", "y"], ["a", "b"]],
            "i": [[1, 2, 3, 4, 5], [6, 7, 8], [1, 2]],
        }
    )
    g = ArrayCropTransformer(input_col="s", array_length=3, pad_value="-1", output_col="o").transform_batch(t)
    assert g.column("o").to_pylist() == [["a", "a", "a"], ["x", "z", "y"], ["a", "b", "-1"]]
    g = ArrayCropTransformer(input_col="i", array_length=3, pad_value=-1, output_col="o").transform_batch(t)
    assert g.column("o").to_pylist() == [[1, 2, 3], [6, 7, 8], [1, 2, -1]]
