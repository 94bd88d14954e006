"""Dtype casting policy tests (reference parametrized-dtype test pattern,
tests/kamae/spark/transformers/test_log.py:113-138 style)."""

import numpy as np
import pyarrow as pa
import pytest

from kamae_ray import dtypes as D
from kamae_ray.stages import IdentityTransformer, LogTransformer, SumTransformer


@pytest.mark.parametrize(
    "name,pa_type",
    [
        ("string", pa.string()),
        ("bigint", pa.int64()),
        ("int", pa.int32()),
        ("smallint", pa.int16()),
        ("tinyint", pa.int8()),
        ("float", pa.float32()),
        ("double", pa.float64()),
        ("boolean", pa.bool_()),
    ],
)
def test_dtype_name_roundtrip(name, pa_type):
    assert D.arrow_type(name).equals(pa_type)
    assert D.dtype_name(pa_type) == name


@pytest.mark.parametrize("in_dtype", ["int", "bigint", "float", "double"])
def test_log_input_dtype_combinations(in_dtype):
    t = pa.table({"x": pa.array([1.0, 4.0], pa.float64())})
    out = LogTransformer(input_col="x", input_dtype=in_dtype, alpha=1.0, output_col="o").transform_batch(t)
    assert out.column("o").to_pylist() == pytest.approx(np.log([2.0, 5.0]).tolist())


@pytest.mark.parametrize(
    "out_dtype,expected_type",
    [("int", pa.int32()), ("bigint", pa.int64()), ("float", pa.float32()), ("string", pa.string())],
)
def test_output_dtype_combinations(out_dtype, expected_type):
    t = pa.table({"x": [1.5, 2.5]})
    out = SumTransformer(input_col="x", constant=1.0, output_col="o", output_dtype=out_dtype).transform_batch(t)
    assert out.column("o").type.equals(expected_type)


def test_negative_zero_normalised_on_cast():
    t = pa.table({"x": [-0.0, 0.0, -1.0]})
    out = IdentityTransformer(input_col="x", output_col="o", output_dtype="string").transform_batch(t)
    vals = out.column("o").to_pylist()
    assert vals[0] == vals[1]  # -0.0 -> +0.0 before cast (reference rule)


def test_float_to_int_truncates_toward_zero():
    t = pa.table({"x": [1.9, -1.9]})
    out = IdentityTransformer(input_col="x", output_col="o", output_dtype="int").transform_batch(t)
    assert out.column("o").to_pylist() == [1, -1]  # Spark CAST semantics


def test_nested_cast_preserves_shape():
    t = pa.table({"x": [[[1.4, 2.6]], [[3.5, -4.5]]]})
    out = IdentityTransformer(input_col="x", output_col="o", output_dtype="int").transform_batch(t)
    assert out.column("o").to_pylist() == [[[1, 2]], [[3, -4]]]
