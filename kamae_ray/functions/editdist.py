"""Vectorized Levenshtein distance: the classic Wagner-Fischer DP with the
loops over CHARACTER POSITIONS only (bounded by string length) and every
cell update vectorized across string PAIRS — D x R distance matrices with
no per-pair Python.

Cost: O(La * Lb) numpy passes over (Dc, R) slices (L = max string length,
Dc = left chunk sized to a ~64 MB scratch). Intended for dimension-table
right sides (fuzzy lookup joins) where D*R stays in the millions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _encode(arr, max_len: int) -> tuple[np.ndarray, np.ndarray]:
    """(codes[n, L] int16 byte matrix padded with -1, lengths[n]); raises if
    any value exceeds ``max_len`` bytes (silent truncation would silently
    change distances)."""
    arr = pc.cast(arr, pa.string(), safe=False)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.fill_null(arr, "")
    n = len(arr)
    bufs = arr.buffers()
    width = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(bufs[1], dtype=width)[arr.offset: arr.offset + n + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.zeros(0, np.uint8)
    lens = offs[1:] - offs[:-1]
    if n and lens.max() > max_len:
        raise ValueError(f"string longer than max_len={max_len} bytes; raise max_len")
    L = int(lens.max()) if n else 0
    out = np.full((n, max(L, 1)), -1, dtype=np.int16)
    total = int(lens.sum())
    if total:
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        pos = np.repeat(offs[:-1], lens) + (np.arange(total, dtype=np.int64) - np.repeat(starts, lens))
        rows = np.repeat(np.arange(n, dtype=np.int64), lens)
        cols = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
        out[rows, cols] = data[pos]
    return out, lens.astype(np.int64)


def levenshtein_matrix(a, b, max_len: int = 128) -> np.ndarray:
    """(len(a), len(b)) int32 byte-level Levenshtein distances (UTF-8
    bytes — identical to DuckDB ``levenshtein`` for ASCII). Nulls count as
    empty strings."""
    ac, alen = _encode(a, max_len)
    bc, blen = _encode(b, max_len)
    D, R = len(alen), len(blen)
    ans = np.zeros((D, R), dtype=np.int32)
    if D == 0 or R == 0:
        return ans
    Lb = int(blen.max())
    # chunk the left side so the (Dc, R, Lb+1) DP scratch stays ~64 MB
    cells = max(R * (Lb + 1), 1)
    Dc = max(1, min(D, (16 << 20) // cells))
    for lo in range(0, D, Dc):
        hi = min(lo + Dc, D)
        d = hi - lo
        acs, alens = ac[lo:hi], alen[lo:hi]
        La = int(alens.max()) if d else 0
        prev = np.broadcast_to(
            np.arange(Lb + 1, dtype=np.int32), (d, R, Lb + 1)
        ).copy()
        # i = 0 answers (empty left prefix): dist = blen
        done0 = alens == 0
        if done0.any():
            ans[lo:hi][done0] = blen[None, :].astype(np.int32)
        for i in range(1, La + 1):
            cur = np.empty_like(prev)
            cur[:, :, 0] = i
            ai = acs[:, i - 1][:, None]
            for j in range(1, Lb + 1):
                bj = bc[:, j - 1][None, :]
                sub = prev[:, :, j - 1] + (ai != bj)
                np.minimum(sub, cur[:, :, j - 1] + 1, out=sub)
                np.minimum(sub, prev[:, :, j] + 1, out=sub)
                cur[:, :, j] = sub
            prev = cur
            fin = alens == i
            if fin.any():
                # answer for a row of length i is cur at column blen[r]
                ans[lo:hi][fin] = np.take_along_axis(
                    cur[fin], blen[None, :, None].astype(np.int64), axis=2
                )[:, :, 0]
    return ans


def levenshtein_pairwise(a, b, max_len: int = 128) -> np.ndarray:
    """Element-wise int32 Levenshtein distance of two equal-length string
    arrays (row i of ``a`` vs row i of ``b``) — same byte-level DP as
    :func:`levenshtein_matrix` with the pair axis replacing the (D, R)
    grid: O(La * Lb) numpy passes over length-n slices, no per-pair
    Python. Nulls count as empty strings (DuckDB-levenshtein ASCII
    parity)."""
    ac, alen = _encode(a, max_len)
    bc, blen = _encode(b, max_len)
    n = len(alen)
    if len(blen) != n:
        raise ValueError("levenshtein_pairwise needs equal-length arrays")
    ans = np.zeros(n, dtype=np.int32)
    if n == 0:
        return ans
    Lb = int(blen.max())
    prev = np.broadcast_to(np.arange(Lb + 1, dtype=np.int32), (n, Lb + 1)).copy()
    done0 = alen == 0
    if done0.any():
        ans[done0] = blen[done0].astype(np.int32)
    La = int(alen.max())
    for i in range(1, La + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = ac[:, i - 1][:, None]
        for j in range(1, Lb + 1):
            bj = bc[:, j - 1][:, None]
            sub = prev[:, j - 1 : j] + (ai != bj)
            np.minimum(sub, cur[:, j - 1 : j] + 1, out=sub)
            np.minimum(sub, prev[:, j : j + 1] + 1, out=sub)
            cur[:, j] = sub[:, 0]
        prev = cur
        fin = alen == i
        if fin.any():
            ans[fin] = cur[fin, blen[fin]]
    return ans
