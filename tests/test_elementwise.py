import math

import numpy as np
import pyarrow as pa
import pytest

from kamae_ray.stages import (
    AbsoluteValueTransformer,
    BinTransformer,
    BucketizeTransformer,
    DivideTransformer,
    ExpTransformer,
    ExponentTransformer,
    IfStatementTransformer,
    LogTransformer,
    LogicalAndTransformer,
    LogicalNotTransformer,
    LogicalOrTransformer,
    MaxTransformer,
    MeanTransformer,
    MinTransformer,
    MultiplyTransformer,
    RoundToDecimalTransformer,
    RoundTransformer,
    StringMapTransformer,
    SubtractTransformer,
    SumTransformer,
)


def col(t, name):
    return t.column(name).to_pylist()


def test_log_scalar(scalar_mixed):
    out = LogTransformer(input_col="col1", alpha=1.0, output_col="o").transform_batch(scalar_mixed)
    assert col(out, "o") == pytest.approx([math.log(2), math.log(5), math.log(8)])


def test_log_array(scalar_mixed):
    out = LogTransformer(input_col="col1_col2_col3", output_col="o").transform_batch(scalar_mixed)
    assert out.column("o").to_pylist()[0] == pytest.approx([0.0, math.log(2), math.log(3)])


def test_log_nested(nested_arrays):
    out = ExpTransformer(input_col="col1", output_col="o").transform_batch(nested_arrays)
    v = out.column("o").to_pylist()
    assert v[0][1][0] == pytest.approx(math.exp(-4.0))
    assert len(v[0]) == 4 and len(v[0][0]) == 3


def test_abs_and_round():
    t = pa.table({"x": [-1.5, 2.5, -0.4]})
    assert col(AbsoluteValueTransformer(input_col="x", output_col="o").transform_batch(t), "o") == [1.5, 2.5, 0.4]
    assert col(RoundTransformer(input_col="x", round_type="round", output_col="o").transform_batch(t), "o") == [-2.0, 3.0, -0.0]
    assert col(RoundTransformer(input_col="x", round_type="floor", output_col="o").transform_batch(t), "o") == [-2.0, 2.0, -1.0]
    assert col(RoundToDecimalTransformer(input_col="x", decimals=1, output_col="o").transform_batch(t), "o") == [-1.5, 2.5, -0.4]


def test_multi_input_arith(scalar_mixed):
    assert col(SumTransformer(input_cols=["col1", "col2", "col3"], output_col="o").transform_batch(scalar_mixed), "o") == [6.0, 12.0, 18.0]
    assert col(SubtractTransformer(input_cols=["col1", "col2"], output_col="o").transform_batch(scalar_mixed), "o") == [-1.0, 2.0, -1.0]
    assert col(MultiplyTransformer(input_col="col1", constant=2.0, output_col="o").transform_batch(scalar_mixed), "o") == [2.0, 8.0, 14.0]
    assert col(DivideTransformer(input_cols=["col1", "col2"], output_col="o").transform_batch(scalar_mixed), "o") == [0.5, 2.0, 0.875]
    assert col(MaxTransformer(input_cols=["col1", "col2"], output_col="o").transform_batch(scalar_mixed), "o") == [2.0, 4.0, 8.0]
    assert col(MinTransformer(input_cols=["col1", "col2"], output_col="o").transform_batch(scalar_mixed), "o") == [1.0, 2.0, 7.0]
    assert col(MeanTransformer(input_cols=["col1", "col2"], output_col="o").transform_batch(scalar_mixed), "o") == [1.5, 3.0, 7.5]
    assert col(ExponentTransformer(input_col="col2", exponent=2.0, output_col="o").transform_batch(scalar_mixed), "o") == [4.0, 4.0, 64.0]


def test_scalar_broadcast_against_array(scalar_mixed):
    out = MultiplyTransformer(input_cols=["col1_col2_col3", "col1"], output_col="o").transform_batch(scalar_mixed)
    assert out.column("o").to_pylist()[1] == [16.0, 8.0, 24.0]


def test_logical():
    t = pa.table({"a": [True, True, False], "b": [True, False, False]})
    assert col(LogicalAndTransformer(input_cols=["a", "b"], output_col="o").transform_batch(t), "o") == [True, False, False]
    assert col(LogicalOrTransformer(input_cols=["a", "b"], output_col="o").transform_batch(t), "o") == [True, True, False]
    assert col(LogicalNotTransformer(input_col="a", output_col="o").transform_batch(t), "o") == [False, False, True]


def test_if_statement(scalar_mixed):
    out = IfStatementTransformer(
        input_col="col1", condition_operator="geq", value_to_compare=4.0,
        result_if_true=1.0, result_if_false=0.0, output_col="o",
    ).transform_batch(scalar_mixed)
    assert col(out, "o") == [0.0, 1.0, 1.0]


def test_bin_first_match_wins():
    t = pa.table({"x": [1.0, 3.0, 10.0, None]})
    out = BinTransformer(
        input_col="x",
        condition_operators=["lt", "lt"],
        bin_values=[2.0, 5.0],
        bin_labels=["small", "mid"],
        default_label="big",
        output_col="o",
    ).transform_batch(t)
    assert col(out, "o") == ["small", "mid", "big", None]


def test_bucketize_null_and_mask():
    t = pa.table({"x": [0.5, 2.0, 9.9, None, -1.0]})
    out = BucketizeTransformer(input_col="x", splits=[1.0, 5.0], mask_value=-1.0, output_col="o").transform_batch(t)
    # bisect_right + 1; 0 reserved for mask; null -> null
    assert col(out, "o") == [1, 2, 3, None, 0]


def test_string_map():
    t = pa.table({"s": ["a", "b", None]})
    out = StringMapTransformer(
        input_col="s", string_match_values=["a"], string_replace_values=["A"],
        default_value="other", output_col="o",
    ).transform_batch(t)
    assert col(out, "o") == ["A", "other", None]


def test_output_dtype_cast(scalar_mixed):
    out = SumTransformer(input_col="col1", constant=1.0, output_col="o", output_dtype="int").transform_batch(scalar_mixed)
    assert out.column("o").type == pa.int32()
    assert col(out, "o") == [2, 5, 8]


def test_input_never_mutated(scalar_mixed):
    before = scalar_mixed.column("col1").to_pylist()
    LogTransformer(input_col="col1", output_col="o").transform_batch(scalar_mixed)
    assert scalar_mixed.column("col1").to_pylist() == before


def test_coalesce_multi_and_constant():
    from kamae_ray.stages import CoalesceTransformer

    t = pa.table({"a": [None, 2.0, None], "b": [1.0, None, None], "c": [9.0, 9.0, None]})
    out = CoalesceTransformer(input_cols=["a", "b", "c"], output_col="o").transform_batch(t)
    assert col(out, "o") == [1.0, 2.0, None]
    out2 = CoalesceTransformer(input_col="a", constant=7.0, output_col="o").transform_batch(t)
    assert col(out2, "o") == [7.0, 2.0, 7.0]


def test_polynomial_expand():
    from kamae_ray.stages.elementwise import PolynomialExpandTransformer

    t = PolynomialExpandTransformer(input_cols=["a", "b"], output_col="p")
    tb = pa.table({"a": [2, None, -4], "b": [3, 5, 7]})
    out = t.transform(tb)
    assert out.column("p_a_x_a").to_pylist() == [4, None, 16]
    assert out.column("p_a_x_b").to_pylist() == [6, None, -28]
    assert out.column("p_b_x_b").to_pylist() == [9, 25, 49]
    assert t.outputs == ["p_a_x_a", "p_a_x_b", "p_b_x_b"]
    # mixed int/float pair promotes to float; float products correctly rounded
    tf = pa.table({"a": [2], "b": [0.1]})
    of = PolynomialExpandTransformer(input_cols=["a", "b"],
                                     output_col="p").transform(tf)
    assert of.column("p_a_x_b")[0].as_py() == 2 * 0.1
    assert of.column("p_a_x_a").to_pylist() == [4]
    with pytest.raises(ValueError, match="31 bits"):
        PolynomialExpandTransformer(input_cols=["a", "b"], output_col="p") \
            .transform(pa.table({"a": [1 << 32], "b": [1]}))
    with pytest.raises(ValueError, match=">= 2"):
        PolynomialExpandTransformer(input_cols=["a"], output_col="p")
