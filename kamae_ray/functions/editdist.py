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


def damerau_pairwise(a, b, max_len: int = 64) -> np.ndarray:
    """Element-wise int32 FULL Damerau-Levenshtein distance (unrestricted
    transpositions, Lowrance-Wagner — DuckDB ``damerau_levenshtein`` parity:
    ``ca -> abc`` is 2, not OSA's 3; byte-level, ASCII == DuckDB). The
    classic alphabet-indexed DP with the (i, j) cell loop scalar and every
    cell update vectorized across pairs: the last-occurrence table ``da`` is
    an (n, 257) matrix (byte+1; padding byte -1 maps to slot 0, which real
    bytes never read), the full (n, La+2, Lb+2) distance cube is kept
    because transposition lookups reach arbitrary earlier rows. Left side
    chunked so the cube stays ~64 MB. Nulls count as empty strings."""
    ac, alen = _encode(a, max_len)
    bc, blen = _encode(b, max_len)
    n = len(alen)
    if len(blen) != n:
        raise ValueError("damerau_pairwise needs equal-length arrays")
    ans = np.zeros(n, dtype=np.int32)
    if n == 0:
        return ans
    Lb_all = int(blen.max())
    cube = max((int(alen.max()) + 2) * (Lb_all + 2), 1)
    Nc = max(1, min(n, (16 << 20) // cube))
    for lo in range(0, n, Nc):
        hi = min(lo + Nc, n)
        d = hi - lo
        acs, alens = ac[lo:hi], alen[lo:hi]
        bcs, blens = bc[lo:hi], blen[lo:hi]
        La = int(alens.max())
        Lb = int(blens.max())
        maxd = np.int32(La + Lb + 1)
        # D[:, x+1, y+1] = d[x][y]; row/col 0 is the "-1" border = maxdist
        D = np.empty((d, La + 2, Lb + 2), dtype=np.int32)
        D[:, 0, :] = maxd
        D[:, :, 0] = maxd
        D[:, 1, 1:] = np.arange(Lb + 1, dtype=np.int32)[None, :]
        D[:, 1:, 1] = np.arange(La + 1, dtype=np.int32)[None, :]
        da = np.zeros((d, 257), dtype=np.int32)
        rows = np.arange(d, dtype=np.int64)
        for i in range(1, La + 1):
            ai = acs[:, i - 1]
            db = np.zeros(d, dtype=np.int32)
            for j in range(1, Lb + 1):
                bj = bcs[:, j - 1]
                k = da[rows, bj.astype(np.int64) + 1]
                l = db
                match = (ai == bj) & (ai >= 0)
                cost = (~match).astype(np.int32)
                cell = D[:, i, j] + cost
                np.minimum(cell, D[:, i + 1, j] + 1, out=cell)
                np.minimum(cell, D[:, i, j + 1] + 1, out=cell)
                trans = D[rows, k, l] + (i - k - 1) + 1 + (j - l - 1)
                np.minimum(cell, trans, out=cell)
                D[:, i + 1, j + 1] = cell
                db = np.where(match, np.int32(j), db)
            da[rows, ai.astype(np.int64) + 1] = i
        ans[lo:hi] = D[rows, alens + 1, blens + 1]
    return ans


def hamming_pairwise(a, b, max_len: int = 128) -> np.ndarray:
    """Element-wise int32 byte mismatch count over the COMMON PREFIX plus
    the length difference — equals DuckDB ``hamming`` (byte-level, ASCII ==
    chars) when lengths match, and extends it totally to unequal lengths
    (DuckDB raises there); oracle mirror:
    ``CASE WHEN least(la, lb) = 0 THEN abs(la - lb) ELSE
    hamming(substr(a, 1, least(la, lb)), substr(b, 1, least(la, lb)))
    + abs(la - lb) END``. Nulls count as empty strings."""
    ac, alen = _encode(a, max_len)
    bc, blen = _encode(b, max_len)
    n = len(alen)
    if len(blen) != n:
        raise ValueError("hamming_pairwise needs equal-length arrays")
    if n == 0:
        return np.zeros(0, dtype=np.int32)
    L = min(ac.shape[1], bc.shape[1])
    common = np.minimum(alen, blen)
    valid = np.arange(L, dtype=np.int64)[None, :] < common[:, None]
    mism = ((ac[:, :L] != bc[:, :L]) & valid).sum(axis=1)
    return (mism + np.abs(alen - blen)).astype(np.int32)


def charset_jaccard_ppm_pairwise(a, b, max_len: int = 128) -> np.ndarray:
    """Element-wise Jaccard similarity of the DISTINCT BYTE SETS of two
    strings, in exact integer parts-per-million: ``(1e6 * |A ∩ B|) //
    |A ∪ B|`` (floor). Both empty -> 1_000_000; one empty -> 0. Byte-level
    (ASCII == DuckDB codepoints); the SQL mirror is
    ``1000000 * len(list_intersect(list_distinct(regexp_split_to_array(a,
    '')), ...)) // (len(dA) + len(dB) - inter)`` with the empty cases CASEd
    out (DuckDB splits '' to a phantom ['']). Presence matrices are (n, 256)
    bools filled by one fancy-index scatter — no per-row Python. Nulls count
    as empty strings."""
    ac, alen = _encode(a, max_len)
    bc, blen = _encode(b, max_len)
    n = len(alen)
    if len(blen) != n:
        raise ValueError("charset_jaccard_ppm_pairwise needs equal-length arrays")
    out = np.zeros(n, dtype=np.int32)
    Nc = 1 << 16  # (Nc, 256) bool x2 = 32 MB scratch
    for lo in range(0, n, Nc):
        hi = min(lo + Nc, n)
        d = hi - lo
        pa_ = np.zeros((d, 256), dtype=bool)
        pb_ = np.zeros((d, 256), dtype=bool)
        ma = ac[lo:hi] >= 0
        mb = bc[lo:hi] >= 0
        pa_[np.nonzero(ma)[0], ac[lo:hi][ma]] = True
        pb_[np.nonzero(mb)[0], bc[lo:hi][mb]] = True
        inter = (pa_ & pb_).sum(axis=1).astype(np.int64)
        union = (pa_ | pb_).sum(axis=1).astype(np.int64)
        ppm = np.zeros(d, dtype=np.int64)
        nz = union > 0
        ppm[nz] = (1_000_000 * inter[nz]) // union[nz]
        ppm[~nz] = 1_000_000  # both empty: identical
        out[lo:hi] = ppm.astype(np.int32)
    return out


def charset_jaccard_float_pairwise(a, b, max_len: int = 128) -> np.ndarray:
    """Element-wise float64 Jaccard similarity of the distinct byte sets —
    ONE IEEE division of the exact integer intersection/union counts,
    BIT-identical to DuckDB's NATIVE ``jaccard(a, b)`` (verified 20000/20000
    random pairs incl. non-ASCII bytes; DuckDB raises on empty inputs, so
    the totalization is: both empty -> 1.0, one empty -> 0.0, mirrored with
    a CASE guard). Nulls count as empty strings."""
    ac, alen = _encode(a, max_len)
    bc, blen = _encode(b, max_len)
    n = len(alen)
    if len(blen) != n:
        raise ValueError("charset_jaccard_float_pairwise needs equal-length arrays")
    out = np.zeros(n, dtype=np.float64)
    Nc = 1 << 16
    for lo in range(0, n, Nc):
        hi = min(lo + Nc, n)
        d = hi - lo
        pa_ = np.zeros((d, 256), dtype=bool)
        pb_ = np.zeros((d, 256), dtype=bool)
        ma = ac[lo:hi] >= 0
        mb = bc[lo:hi] >= 0
        pa_[np.nonzero(ma)[0], ac[lo:hi][ma]] = True
        pb_[np.nonzero(mb)[0], bc[lo:hi][mb]] = True
        inter = (pa_ & pb_).sum(axis=1).astype(np.float64)
        union = (pa_ | pb_).sum(axis=1).astype(np.float64)
        nz = union > 0
        v = np.ones(d, dtype=np.float64)  # both empty -> 1.0
        v[nz] = inter[nz] / union[nz]
        out[lo:hi] = v
    return out


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


def jaro_winkler_pairwise(a, b, max_len: int = 64, winkler: bool = True) -> np.ndarray:
    """Element-wise Jaro (or Jaro-Winkler) similarity, float64 — BIT-
    identical to DuckDB's native ``jaro_similarity`` /
    ``jaro_winkler_similarity`` (verified 30000/30000 random pairs incl.
    non-ASCII bytes): byte-level greedy window matching, transpositions
    floored (``m - t//2`` — DuckDB floors the half-count), the final chain
    ``(m/la + m/lb + (m - t//2)/m) / 3`` in exactly that order, Winkler
    boost ``v + p*0.1*(1-v)`` only when ``v > 0.7`` with the common prefix
    capped at 4. Vectorized across PAIRS (the Wagner-Fischer trick): the
    (i, j) window scan is scalar in positions, every state update an (n,)
    numpy op; matched-sequence extraction via cumsum-rank scatters. Nulls
    count as empty strings (similarity 0 against anything)."""
    ac, alen = _encode(a, max_len)
    bc, blen = _encode(b, max_len)
    n = len(alen)
    if len(blen) != n:
        raise ValueError("jaro_winkler_pairwise needs equal-length arrays")
    out = np.zeros(n, dtype=np.float64)
    if n == 0:
        return out
    La, Lb = ac.shape[1], bc.shape[1]
    w = np.maximum(alen, blen) // 2 - 1
    np.maximum(w, 0, out=w)
    am = np.zeros((n, La), dtype=bool)
    bm = np.zeros((n, Lb), dtype=bool)
    for i in range(La):
        ai = ac[:, i]
        active = (i < alen) & (ai >= 0)
        matched = np.zeros(n, dtype=bool)
        lo = i - w
        hi = i + w
        for j in range(Lb):
            if not active.any():
                break
            cand = (active & ~matched & ~bm[:, j] & (j >= lo) & (j <= hi)
                    & (j < blen) & (bc[:, j] == ai))
            if cand.any():
                am[cand, i] = True
                bm[cand, j] = True
                matched |= cand
    m = am.sum(axis=1).astype(np.int64)
    # matched sequences, rank-scattered into dense (n, L) grids
    Lm = max(int(m.max()), 1)
    seq_a = np.full((n, Lm), -1, dtype=np.int16)
    seq_b = np.full((n, Lm), -2, dtype=np.int16)
    ra = np.cumsum(am, axis=1) - 1
    rb = np.cumsum(bm, axis=1) - 1
    rows_a, cols_a = np.nonzero(am)
    seq_a[rows_a, ra[rows_a, cols_a]] = ac[rows_a, cols_a]
    rows_b, cols_b = np.nonzero(bm)
    seq_b[rows_b, rb[rows_b, cols_b]] = bc[rows_b, cols_b]
    rank_valid = np.arange(Lm)[None, :] < m[:, None]
    trans = ((seq_a != seq_b) & rank_valid).sum(axis=1).astype(np.int64)
    nz = m > 0
    mf = m.astype(np.float64)
    v = np.zeros(n, dtype=np.float64)
    v[nz] = (mf[nz] / alen[nz] + mf[nz] / blen[nz]
             + (mf[nz] - (trans[nz] // 2)) / mf[nz]) / 3.0
    if not winkler:
        return v
    pfx_n = min(4, La, Lb)
    if pfx_n > 0:
        eq = (ac[:, :pfx_n] == bc[:, :pfx_n]) & (ac[:, :pfx_n] >= 0) \
            & (bc[:, :pfx_n] >= 0)
        p = np.cumprod(eq, axis=1).sum(axis=1).astype(np.float64)
    else:
        p = np.zeros(n, dtype=np.float64)
    boost = v > 0.7
    v = np.where(boost, v + p * 0.1 * (1.0 - v), v)
    return v


_SDX_CODE = np.zeros(256, dtype=np.uint8)  # non-letters never reach the LUT
for _c, _d in zip(b"AEIOUYHWBFPVCGJKQSXZDTLMNR",
                  b"00000000111122222222334556"):
    _SDX_CODE[_c] = _d


def soundex_column(arr, max_len: int = 128) -> pa.Array:
    """Vectorized simplified American Soundex (the classic SQL
    translate-collapse variant: letters only, uppercase, consonant-class
    digits, adjacent duplicate CODES collapsed before vowels drop — no H/W
    separator rule): 4-char codes like ``Robert -> R163``; empty/letterless
    input -> ``''``; null -> null. The ER blocking key staple. SQL mirror:
    ``substr(c,1,1) || substr(replace(substr(regexp_replace(translate(c,
    ...), '(.)\\1+', '\\1', 'g'), 2), '0', '') || '000', 1, 3)`` over the
    letters-only uppercase form."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.cast(arr, pa.string(), safe=False)
    null_mask = pc.is_null(arr) if arr.null_count else None
    arr = pc.fill_null(arr, "")
    n = len(arr)
    bufs = arr.buffers()
    width = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(bufs[1], dtype=width)[arr.offset: arr.offset + n + 1] \
        .astype(np.int64)
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.zeros(0, np.uint8))
    lens = offs[1:] - offs[:-1]
    total = int(lens.sum())
    if total == 0:
        out = pa.array([""] * n, pa.string())
        return pc.if_else(null_mask, pa.nulls(n, pa.string()), out) \
            if null_mask is not None else out
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    row = np.repeat(np.arange(n, dtype=np.int64), lens)
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    b = data[offs[:-1][row] + pos]
    up = np.where((b >= ord("a")) & (b <= ord("z")), b - 32, b)
    is_letter = (up >= ord("A")) & (up <= ord("Z"))
    row_l, up_l = row[is_letter], up[is_letter]
    if len(up_l) == 0:
        out = pa.array([""] * n, pa.string())
        return pc.if_else(null_mask, pa.nulls(n, pa.string()), out) \
            if null_mask is not None else out
    code = _SDX_CODE[up_l]
    first_of_row = np.ones(len(row_l), bool)
    first_of_row[1:] = row_l[1:] != row_l[:-1]
    # collapse adjacent equal codes within each row
    keep = first_of_row.copy()
    keep[1:] |= code[1:] != code[:-1]
    row_k, up_k, code_k = row_l[keep], up_l[keep], code[keep]
    fk = first_of_row[keep]
    # output digits: non-first positions whose code is not '0', first 3
    is_digit = ~fk & (code_k != ord("0"))
    # rank among digits within row
    di = np.cumsum(is_digit)
    base = np.zeros(len(row_k), np.int64)
    rstarts = np.flatnonzero(fk)
    base[rstarts] = di[rstarts] - is_digit[rstarts]
    np.maximum.accumulate(base, out=base)  # wrong for multi-row... recompute:
    base = np.repeat(di[rstarts] - is_digit[rstarts],
                     np.diff(np.append(rstarts, len(row_k))))
    rank = di - base - 1  # 0-based digit rank (valid where is_digit)
    sel = is_digit & (rank < 3)
    # assemble: per row that has letters -> 4 bytes (letter + 3 digits,
    # padded with '0'); rows without letters -> empty
    has = np.zeros(n, bool)
    has[row_k[rstarts]] = True
    out_lens = np.where(has, 4, 0).astype(np.int64)
    out_offs = np.concatenate([[0], np.cumsum(out_lens)]).astype(np.int32)
    buf = np.full(int(out_lens.sum()), ord("0"), dtype=np.uint8)
    # row -> output start (only for rows with letters)
    ostart = np.zeros(n, np.int64)
    ostart[:] = out_offs[:-1]
    buf[ostart[row_k[rstarts]]] = up_k[rstarts]
    buf[ostart[row_k[sel]] + 1 + rank[sel]] = code_k[sel]
    out = pa.Array.from_buffers(
        pa.utf8(), n, [None, pa.py_buffer(out_offs.tobytes()),
                       pa.py_buffer(buf.tobytes())])
    if null_mask is not None:
        out = pc.if_else(null_mask, pa.nulls(n, pa.string()), out)
    return out
