"""Per-op dtype whitelists (reference: spark_operation.py:59-67,338-373):
a wrong-dtype pipeline must raise TypeError naming the stage DRIVER-SIDE,
before any Ray task launches.
"""

import pyarrow as pa
import pytest

ray = pytest.importorskip("ray")


@pytest.fixture()
def typed_tbl():
    return pa.table(
        {
            "s": pa.array(["a", "b", "c"]),
            "x": pa.array([1.0, 2.0, 3.0]),
            "b": pa.array([True, False, True]),
        }
    )


def test_log_on_string_fails_fast_driver_side(ray_session, typed_tbl):
    from kamae_ray.stages import LogTransformer

    ds = ray.data.from_arrow(typed_tbl)
    t = LogTransformer(input_col="s", output_col="o", layer_name="log_stage")
    with pytest.raises(TypeError, match="log_stage"):
        t.transform(ds)  # raises at plan time, not inside a task


def test_logical_and_on_numeric_fails(typed_tbl):
    from kamae_ray.stages import LogicalAndTransformer

    t = LogicalAndTransformer(input_cols=["x", "x"], output_col="o")
    with pytest.raises(TypeError):
        t.transform_batch(typed_tbl)


def test_listwise_on_string_fails_fast(ray_session, typed_tbl):
    from kamae_ray.stages import ListMeanTransformer

    ds = ray.data.from_arrow(typed_tbl)
    t = ListMeanTransformer(input_col="s", query_id_col="b", output_col="o", layer_name="lm")
    with pytest.raises(TypeError, match="lm"):
        t.transform(ds)


def test_input_dtype_cast_bypasses_whitelist(typed_tbl):
    """An explicit input_dtype cast makes an otherwise-invalid input valid."""
    from kamae_ray.stages import StringCaseTransformer

    t = StringCaseTransformer(
        input_col="x", input_dtype="string", string_case_type="upper", output_col="o"
    )
    out = t.transform_batch(typed_tbl)
    assert out.column("o").to_pylist() == ["1", "2", "3"]


def test_valid_dtypes_pass(ray_session, typed_tbl):
    from kamae_ray.stages import LogTransformer, LogicalNotTransformer

    ds = ray.data.from_arrow(typed_tbl)
    assert LogTransformer(input_col="x", output_col="o").transform(ds).count() == 3
    assert LogicalNotTransformer(input_col="b", output_col="o").transform(ds).count() == 3
