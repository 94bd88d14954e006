"""Nested-array lifting: apply flat vectorized kernels over arbitrarily nested
list columns, zero-copy where possible.

This is the Ray/Arrow equivalent of the reference's recursive
``nested_transform`` / ``nested_arrays_zip`` / scalar-broadcast machinery
(reference: src/kamae/spark/utils/array_utils.py:72-180 and
src/kamae/spark/utils/transform_utils.py:251-330). Instead of per-element
lambdas, we unwrap the list offsets once, run the kernel a single time over the
flat values buffer, and re-wrap with the original offsets — O(levels) overhead
per batch, not per element.

Pure pyarrow/numpy — no Ray imports; unit-testable without a cluster.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _is_list(t: pa.DataType) -> bool:
    return pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t)


def as_array(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        if col.num_chunks == 1:
            return col.chunk(0)  # zero-copy; combine_chunks would copy
        return col.combine_chunks()
    return col


def _normalize_list(arr: pa.Array) -> pa.ListArray:
    """Return an equivalent plain ListArray with offset 0 (fixed-size lists are
    converted; sliced arrays are compacted so ``values`` aligns with offsets)."""
    if pa.types.is_fixed_size_list(arr.type):
        arr = arr.cast(pa.list_(arr.type.value_type))
    elif pa.types.is_large_list(arr.type):
        arr = arr.cast(pa.list_(arr.type.value_type))
    if arr.offset != 0:
        arr = pa.concat_arrays([arr])  # compact
    return arr


def unwrap(arr: pa.Array) -> tuple[list[tuple[np.ndarray, pa.Array | None]], pa.Array]:
    """Strip list levels. Returns ([(offsets, validity_or_None) per level], flat_values).

    offsets are int64 numpy of length n+1 starting at 0; validity is a pyarrow
    boolean array (True = valid) or None when no nulls at that level.
    """
    levels: list[tuple[np.ndarray, pa.Array | None]] = []
    while _is_list(arr.type):
        arr = _normalize_list(arr)
        offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        validity = None
        if arr.null_count > 0:
            validity = arr.is_valid()
        levels.append((offsets, validity))
        arr = arr.values
        # values of a compacted array may still over-extend; trim to last offset
        arr = arr.slice(0, int(offsets[-1]))
        if arr.offset != 0:
            arr = pa.concat_arrays([arr])
    return levels, arr


def rewrap(levels: list[tuple[np.ndarray, pa.Array | None]], flat: pa.Array) -> pa.Array:
    """Re-nest a flat values array using offsets captured by ``unwrap``."""
    for offsets, validity in reversed(levels):
        off = pa.array(offsets, type=pa.int32())
        if validity is not None:
            flat = pa.ListArray.from_arrays(off, flat, mask=pc.invert(validity))
        else:
            flat = pa.ListArray.from_arrays(off, flat)
    return flat


def lift(fn: Callable[[pa.Array], pa.Array], col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Apply ``fn`` (flat Array -> flat Array) elementwise through any nesting."""
    arr = as_array(col)
    levels, flat = unwrap(arr)
    out = fn(flat)
    if not isinstance(out, pa.Array):
        out = pa.array(out)
    return rewrap(levels, out)


def flat_counts(levels: list[tuple[np.ndarray, pa.Array | None]]) -> np.ndarray:
    """Number of innermost (flat) values contributed by each row."""
    if not levels:
        raise ValueError("scalar column has no flat counts")
    # compose all offset levels into a single top->flat offsets vector
    composed = levels[0][0]
    for off, _ in levels[1:]:
        composed = off[composed]
    return np.diff(composed)


def composed_offsets(levels: list[tuple[np.ndarray, pa.Array | None]]) -> np.ndarray:
    """Single offsets vector mapping top-level rows directly to flat values."""
    composed = levels[0][0]
    for off, _ in levels[1:]:
        composed = off[composed]
    return composed


def lift_multi(
    fn: Callable[..., pa.Array],
    cols: Sequence[pa.ChunkedArray | pa.Array],
) -> pa.Array:
    """Apply an N-ary flat kernel over N columns, broadcasting scalar columns
    against list columns (reference: transform_utils.py:251-330).

    All list inputs must share nesting level and per-row shape (the reference's
    documented constraint, docs/achieving_shape_parity.md:19-20). Scalar
    columns are repeated per flat slot of the first list input.
    """
    arrs = [as_array(c) for c in cols]
    unwrapped = [unwrap(a) for a in arrs]
    list_idx = [i for i, (lv, _) in enumerate(unwrapped) if lv]
    if not list_idx:
        out = fn(*[u[1] for u in unwrapped])
        return out if isinstance(out, pa.Array) else pa.array(out)
    ref_levels = unwrapped[list_idx[0]][0]
    counts = flat_counts(ref_levels)
    flats: list[pa.Array] = []
    for i, (levels, flat) in enumerate(unwrapped):
        if levels:
            flats.append(flat)
        else:
            # broadcast scalar value of each row across its flat slots
            rep = np.repeat(np.arange(len(flat), dtype=np.int64), counts)
            flats.append(flat.take(pa.array(rep)))
    out = fn(*flats)
    if not isinstance(out, pa.Array):
        out = pa.array(out)
    return rewrap(ref_levels, out)


def to_numpy(flat: pa.Array, dtype=None) -> tuple[np.ndarray, np.ndarray | None]:
    """Flat Array -> (numpy values, null-mask or None). Nulls become arbitrary
    fill in values; callers must re-mask via ``from_numpy``."""
    if flat.null_count == 0:
        np_arr = flat.to_numpy(zero_copy_only=False)
        if dtype is not None:
            np_arr = np_arr.astype(dtype, copy=False)
        return np_arr, None
    mask = pc.is_null(flat).to_numpy(zero_copy_only=False)
    filled = flat.fill_null(0) if not pa.types.is_string(flat.type) else flat.fill_null("")
    np_arr = filled.to_numpy(zero_copy_only=False)
    if dtype is not None:
        np_arr = np_arr.astype(dtype, copy=False)
    return np_arr, mask


def from_numpy(values: np.ndarray, mask: np.ndarray | None, type: pa.DataType | None = None) -> pa.Array:
    return pa.array(values, type=type, mask=mask)


def matrix_view(col: pa.ChunkedArray | pa.Array, width: int | None = None) -> tuple[np.ndarray, int]:
    """View a fixed-width list<numeric> column as a 2-D numpy matrix (zero-copy
    when possible). Returns (matrix, width). Raises if widths vary."""
    arr = as_array(col)
    levels, flat = unwrap(arr)
    counts = flat_counts(levels)
    if len(counts) == 0:
        return np.empty((0, width or 0)), width or 0
    w = int(counts[0])
    if width is not None and w != width:
        raise ValueError(f"expected inner width {width}, found {w}")
    if not np.all(counts == w):
        raise ValueError("ragged inner arrays; fixed width required")
    vals = flat.to_numpy(zero_copy_only=False)
    return vals.reshape(-1, w), w


def libm_log(x) -> np.ndarray:
    """glibc-identical vectorized natural log. numpy's SIMD ``np.log``
    differs from libm by 1 ULP on ~22% of inputs, while pyarrow's ``ln``
    kernel is bit-identical to DuckDB's (200k/200k sampled) — every
    oracle-mirrored log expression must route through this (lesson-24
    family: a 1-ULP input to ROUND can flip a 6dp boundary)."""
    return pc.ln(pa.array(np.ascontiguousarray(x, np.float64))).to_numpy(zero_copy_only=False)


def split_list_halves(arr: pa.Array) -> tuple[pa.Array, pa.Array]:
    """Split each list row into its first ``len//2`` elements and the rest
    (two list arrays): ONE flat gather per half via the repeat + intra-arange
    trick (lesson 33 — never a per-row loop). Null rows stay null; empty
    rows yield two empty lists."""
    levels, flat = unwrap(arr)
    if len(levels) != 1:
        raise ValueError("split_list_halves expects a single-level list column")
    offsets, validity = levels[0]
    lens = np.diff(offsets)
    ha = lens // 2

    def gather(starts: np.ndarray, ls: np.ndarray) -> pa.Array:
        total = int(ls.sum())
        if total:
            rep = np.repeat(starts, ls)
            intra = np.arange(total, dtype=np.int64) - np.repeat(
                np.concatenate(([0], np.cumsum(ls)[:-1])), ls)
            vals = flat.take(pa.array(rep + intra))
        else:
            vals = flat.slice(0, 0)
        offs = pa.array(np.concatenate(([0], np.cumsum(ls))), pa.int32())
        if validity is not None:
            return pa.ListArray.from_arrays(offs, vals, mask=pc.invert(validity))
        return pa.ListArray.from_arrays(offs, vals)

    return gather(offsets[:-1], ha), gather(offsets[:-1] + ha, lens - ha)


def drop_empty_tokens(arr: pa.Array) -> pa.Array:
    """Remove empty-string elements from a list<string> column (the engine
    twin of SQL ``list_filter(words, x -> length(x) > 0)`` — Arrow's
    whitespace split emits '' for leading/trailing whitespace where the
    regex-split oracle filters them). Null rows stay null; one vectorized
    filter + offset rebuild, no per-row loop."""
    levels, flat = unwrap(arr)
    if len(levels) != 1:
        raise ValueError("drop_empty_tokens expects a single-level list column")
    offsets, validity = levels[0]
    lens = np.diff(offsets).astype(np.int64)
    keep = pc.fill_null(pc.not_equal(flat, ""), False).to_numpy(zero_copy_only=False)
    kept = flat.filter(pa.array(keep))
    csum = np.concatenate(([0], np.cumsum(keep.astype(np.int64))))
    new_lens = csum[offsets[1:]] - csum[offsets[:-1]]
    offs = pa.array(np.concatenate(([0], np.cumsum(new_lens))), pa.int32())
    if validity is not None:
        return pa.ListArray.from_arrays(offs, kept, mask=pc.invert(validity))
    return pa.ListArray.from_arrays(offs, kept)


_B64_ALPHABET = np.frombuffer(
    b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/",
    dtype=np.uint8)


def base64_encode(arr: pa.Array) -> pa.Array:
    """Vectorized standard base64 (RFC 4648 with padding) of a string or
    binary column — one gather into 3-byte groups, one bit-op pass, one
    alphabet lookup, '=' padding scattered at row tails; no per-row Python.
    Matches DuckDB ``to_base64`` exactly. Nulls stay null."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        view_t = pa.binary() if pa.types.is_string(arr.type) else pa.large_binary()
        arr = arr.view(view_t)
    null_mask = None
    if arr.null_count:
        null_mask = pc.is_null(arr)
        arr = pc.fill_null(arr, b"")
    n = len(arr)
    bufs = arr.buffers()
    width = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    offs = np.frombuffer(bufs[1], dtype=width)[arr.offset: arr.offset + n + 1] \
        .astype(np.int64)
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.zeros(0, np.uint8))
    lens = offs[1:] - offs[:-1]
    ng = (lens + 2) // 3
    padded = ng * 3
    total = int(padded.sum())
    out_lens = ng * 4
    out_offs = np.concatenate([[0], np.cumsum(out_lens)]).astype(np.int64)
    if total == 0:
        out = pa.array([""] * n, pa.string())
        return pc.if_else(null_mask, pa.nulls(n, pa.string()), out) \
            if null_mask is not None else out
    pstart = np.concatenate([[0], np.cumsum(padded)[:-1]])
    row = np.repeat(np.arange(n, dtype=np.int64), padded)
    pos = np.arange(total, dtype=np.int64) - np.repeat(pstart, padded)
    valid = pos < lens[row]
    src = offs[:-1][row] + np.minimum(pos, np.maximum(lens[row] - 1, 0))
    buf = np.where(valid, data[src], np.uint8(0)).astype(np.uint8)
    g = buf.reshape(-1, 3).astype(np.uint32)
    v = (g[:, 0] << 16) | (g[:, 1] << 8) | g[:, 2]
    idx = np.empty((len(v), 4), dtype=np.int64)
    idx[:, 0] = (v >> 18) & 63
    idx[:, 1] = (v >> 12) & 63
    idx[:, 2] = (v >> 6) & 63
    idx[:, 3] = v & 63
    chars = _B64_ALPHABET[idx.reshape(-1)]
    rem = lens % 3
    ends = out_offs[1:]
    one = rem == 2   # one '=' at the last char
    two = rem == 1   # '==' at the last two chars
    chars[ends[one] - 1] = ord("=")
    chars[ends[two] - 1] = ord("=")
    chars[ends[two] - 2] = ord("=")
    out = pa.Array.from_buffers(
        pa.utf8(), n,
        [None, pa.py_buffer(out_offs.astype(np.int32).tobytes()),
         pa.py_buffer(chars.tobytes())])
    if null_mask is not None:
        out = pc.if_else(null_mask, pa.nulls(n, pa.string()), out)
    return out


_B64_DECODE = np.full(256, 255, dtype=np.uint8)
_B64_DECODE[_B64_ALPHABET] = np.arange(64, dtype=np.uint8)
_B64_DECODE[ord("=")] = 0


def base64_decode(arr: pa.Array) -> pa.Array:
    """Vectorized strict base64 decode (RFC 4648, padded) of a string
    column to binary — inverse of :func:`base64_encode`, same parity
    contract as DuckDB ``from_base64``. Raises on malformed input (length
    not a multiple of 4, or characters outside the alphabet). Nulls stay
    null."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    null_mask = None
    if arr.null_count:
        null_mask = pc.is_null(arr)
        arr = pc.fill_null(arr, "")
    n = len(arr)
    bufs = arr.buffers()
    width = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(bufs[1], dtype=width)[arr.offset: arr.offset + n + 1] \
        .astype(np.int64)
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.zeros(0, np.uint8))
    lens = offs[1:] - offs[:-1]
    if len(lens) and (lens % 4 != 0).any():
        raise ValueError("base64_decode: input length not a multiple of 4")
    # flat groups align with row boundaries (every row is a multiple of 4);
    # gather each row's span into one contiguous char buffer first
    total = int(lens.sum())
    if total == 0:
        out = pa.array([b""] * n, pa.binary())
        return pc.if_else(null_mask, pa.nulls(n, pa.binary()), out) \
            if null_mask is not None else out
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    row = np.repeat(np.arange(n, dtype=np.int64), lens)
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    chars = data[offs[:-1][row] + pos]
    vals = _B64_DECODE[chars]
    is_pad = chars == ord("=")
    if (vals == 255).any():
        raise ValueError("base64_decode: character outside the base64 alphabet")
    # '=' allowed only in the last two positions of a row
    tail = pos >= (lens[row] - 2)
    if (is_pad & ~tail).any():
        raise ValueError("base64_decode: padding only allowed at the end")
    # '=' at the second-to-last slot requires '=' at the last slot too
    ends = np.cumsum(lens) - 1
    nz = lens > 0
    if (is_pad[ends[nz] - 1] & ~is_pad[ends[nz]]).any():
        raise ValueError("base64_decode: padding only allowed at the end")
    pads = np.zeros(n, dtype=np.int64)
    np.add.at(pads, row[is_pad], 1)
    g = vals.reshape(-1, 4).astype(np.uint32)
    v = (g[:, 0] << 18) | (g[:, 1] << 12) | (g[:, 2] << 6) | g[:, 3]
    trio = np.empty((len(v), 3), dtype=np.uint8)
    trio[:, 0] = (v >> 16) & 255
    trio[:, 1] = (v >> 8) & 255
    trio[:, 2] = v & 255
    flat = trio.reshape(-1)
    full = (lens // 4) * 3
    out_lens = full - pads
    out_offs = np.concatenate([[0], np.cumsum(out_lens)]).astype(np.int64)
    fstarts = np.concatenate([[0], np.cumsum(full)[:-1]])
    orow = np.repeat(np.arange(n, dtype=np.int64), out_lens)
    opos = np.arange(int(out_lens.sum()), dtype=np.int64) - \
        np.repeat(out_offs[:-1], out_lens)
    out_bytes = flat[fstarts[orow] + opos]
    out = pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(out_offs.astype(np.int32).tobytes()),
         pa.py_buffer(out_bytes.tobytes())])
    if null_mask is not None:
        out = pc.if_else(null_mask, pa.nulls(n, pa.binary()), out)
    return out


_HEX_CHARS = np.frombuffer(b"0123456789ABCDEF", dtype=np.uint8)


def hex_encode(arr: pa.Array) -> pa.Array:
    """Vectorized uppercase hex of a string/binary column — DuckDB
    ``hex(blob)`` parity (two chars per byte, one lookup). Nulls stay
    null."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        view_t = pa.binary() if pa.types.is_string(arr.type) else pa.large_binary()
        arr = arr.view(view_t)
    null_mask = None
    if arr.null_count:
        null_mask = pc.is_null(arr)
        arr = pc.fill_null(arr, b"")
    n = len(arr)
    bufs = arr.buffers()
    width = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    offs = np.frombuffer(bufs[1], dtype=width)[arr.offset: arr.offset + n + 1] \
        .astype(np.int64)
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.zeros(0, np.uint8))
    lens = offs[1:] - offs[:-1]
    total = int(lens.sum())
    out_offs = (np.concatenate([[0], np.cumsum(lens)]) * 2).astype(np.int32)
    if total == 0:
        chars = np.zeros(0, np.uint8)
    else:
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        row = np.repeat(np.arange(n, dtype=np.int64), lens)
        pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
        b = data[offs[:-1][row] + pos]
        chars = np.empty(total * 2, dtype=np.uint8)
        chars[0::2] = _HEX_CHARS[b >> 4]
        chars[1::2] = _HEX_CHARS[b & 15]
    out = pa.Array.from_buffers(
        pa.utf8(), n, [None, pa.py_buffer(out_offs.tobytes()),
                       pa.py_buffer(chars.tobytes())])
    if null_mask is not None:
        out = pc.if_else(null_mask, pa.nulls(n, pa.string()), out)
    return out


def popcount_int64(x: np.ndarray) -> np.ndarray:
    """Vectorized population count of int64 values (two's complement, so
    -1 -> 64 — DuckDB ``bit_count(BIGINT)`` parity)."""
    v = x.astype(np.uint64, copy=True)
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h = np.uint64(0x0101010101010101)
    v = v - ((v >> np.uint64(1)) & m1)
    v = (v & m2) + ((v >> np.uint64(2)) & m2)
    v = (v + (v >> np.uint64(4))) & m4
    with np.errstate(over="ignore"):
        v = (v * h) >> np.uint64(56)
    return v.astype(np.int64)
