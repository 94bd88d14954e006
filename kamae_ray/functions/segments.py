"""Segmented (per-group) vectorized kernels over key-clustered blocks.

The scale-critical core of the listwise and windowed layers. Ray's
``groupby(key).map_groups(fn)`` costs one Python call + table slice per group
(~1-2 ms) — catastrophic for millions of small groups. But its shuffle
guarantee (``sort(key)`` then whole-block batches, groups never straddling
blocks — ray/data/grouped_data.py map_groups) means each block holds complete
groups. So we run ONE numpy kernel per block:

1. ``group_ids``: factorize the key columns (dictionary-encode + void view +
   np.unique) — no Python per row;
2. lexsort rows by (group, time) inside the block;
3. segmented kernels: reduceat for group stats, cumsum/accumulate with
   segment-start resets for scans (the reset trick: accumulate a globally
   increasing index and compare against each row's segment start);
4. scatter results back to original block row order.

Pure numpy/pyarrow — no Ray imports; property-testable without a cluster.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kamae_ray.functions import arrays as A


def group_ids(batch: pa.Table, keys: list[str]) -> np.ndarray:
    """Factorize key columns into dense int group ids (vectorized)."""
    n = batch.num_rows
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    cols = []
    for k in keys:
        arr = A.as_array(batch.column(k))
        if pa.types.is_dictionary(arr.type):
            idx = arr.indices
        else:
            idx = arr.dictionary_encode().indices
        cols.append(pc.fill_null(idx, -1).to_numpy(zero_copy_only=False).astype(np.int64, copy=False))
    if len(cols) == 1:
        codes = cols[0]
    else:
        mat = np.ascontiguousarray(np.stack(cols, axis=1))
        codes = mat.view([("", mat.dtype)] * mat.shape[1]).reshape(-1)
    _, gids = np.unique(codes, return_inverse=True)
    return gids.astype(np.int64, copy=False)


def segments(gids_sorted: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(starts, lens) of contiguous equal-gid runs in an already-sorted array."""
    n = len(gids_sorted)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    new = np.concatenate([[True], gids_sorted[1:] != gids_sorted[:-1]])
    starts = np.nonzero(new)[0]
    lens = np.diff(np.concatenate([starts, [n]]))
    return starts, lens


def sort_within_groups(gids: np.ndarray, *order_cols: np.ndarray) -> np.ndarray:
    """Permutation that clusters by gid and sorts by order_cols inside each
    group (stable — ties keep original order)."""
    keys = tuple(reversed(order_cols)) + (gids,)
    return np.lexsort(keys)


# ---------------------------------------------------------------------------
# segmented scans (inputs already permuted to (group, time) order)
# ---------------------------------------------------------------------------


def starts_rep(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    return np.repeat(starts, lens)


def seg_lag(vals: np.ndarray, k: int, srep: np.ndarray) -> np.ndarray:
    n = len(vals)
    out = np.full(n, np.nan)
    idx = np.arange(n) - k
    ok = idx >= srep
    out[ok] = vals[idx[ok]]
    return out


def seg_lead(vals: np.ndarray, k: int, srep: np.ndarray, lens_rep: np.ndarray) -> np.ndarray:
    n = len(vals)
    out = np.full(n, np.nan)
    idx = np.arange(n) + k
    ok = idx < srep + lens_rep
    out[ok] = vals[idx[ok]]
    return out


def seg_ffill(vals: np.ndarray, srep: np.ndarray) -> np.ndarray:
    n = len(vals)
    isnan = np.isnan(vals)
    idx = np.where(~isnan, np.arange(n), -1)
    np.maximum.accumulate(idx, out=idx)
    ok = idx >= srep  # reset trick: stale index from a previous segment fails this
    out = np.where(ok, vals[np.clip(idx, 0, None)], np.nan)
    return out


def seg_bfill(vals: np.ndarray, srep: np.ndarray, lens_rep: np.ndarray) -> np.ndarray:
    rev = vals[::-1]
    n = len(vals)
    isnan = np.isnan(rev)
    idx = np.where(~isnan, np.arange(n), -1)
    np.maximum.accumulate(idx, out=idx)
    # reversed segment start of reversed row i = n - (srep + lens_rep) of orig row n-1-i
    srep_rev = (n - (srep + lens_rep))[::-1]
    ok = idx >= srep_rev
    out = np.where(ok, rev[np.clip(idx, 0, None)], np.nan)[::-1]
    return out


def seg_cumsum(vals: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    c = np.cumsum(vals)
    base = np.repeat(c[starts] - vals[starts], lens)
    return c - base


def seg_sessionize(t: np.ndarray, gap: float, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    n = len(t)
    if n == 0:
        return np.zeros(0, np.int64)
    delta = np.empty(n)
    delta[0] = 0
    delta[1:] = t[1:] - t[:-1]
    new = (delta > gap).astype(np.int64)
    new[starts] = 0
    c = np.cumsum(new)
    base = np.repeat(c[starts], lens)
    return c - base


def seg_cummin(vals: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    out = np.empty_like(vals)
    for s, l in zip(starts, lens):
        np.minimum.accumulate(vals[s : s + l], out=out[s : s + l])
    return out


def seg_cummax(vals: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    out = np.empty_like(vals)
    for s, l in zip(starts, lens):
        np.maximum.accumulate(vals[s : s + l], out=out[s : s + l])
    return out


def seg_rolling_sum_count(
    vals: np.ndarray, window: int, srep: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Rolling sum & valid-count over the last ``window`` rows clamped at the
    segment start (NaNs skipped)."""
    n = len(vals)
    isnum = ~np.isnan(vals)
    filled = np.where(isnum, vals, 0.0)
    c = np.concatenate([[0.0], np.cumsum(filled)])
    cc = np.concatenate([[0], np.cumsum(isnum.astype(np.int64))])
    i = np.arange(n)
    lo = np.maximum(i - window + 1, srep)
    s = c[i + 1] - c[lo]
    cnt = cc[i + 1] - cc[lo]
    return s, cnt


# ---------------------------------------------------------------------------
# segmented group statistics (for listwise)
# ---------------------------------------------------------------------------


def seg_reduce(vals: np.ndarray, cond: np.ndarray, starts: np.ndarray, lens: np.ndarray, stat: str, nan_fill: float) -> np.ndarray:
    """Per-segment statistic over cond-selected values, broadcast to rows.

    stat in {sum, count, mean, min, max, median, stddev}. Median interpolates
    (matches Spark/DuckDB); stddev is the two-pass sample std (ddof=1).
    Returns per-SEGMENT values (length = len(starts)).
    """
    n = len(vals)
    sel = np.where(cond, vals, 0.0)
    cnt = _reduceat(cond.astype(np.float64), starts, n)
    s = _reduceat(sel, starts, n)
    if stat in ("sum", "count", "mean", "stddev"):
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = np.where(cnt > 0, s / np.where(cnt == 0, 1, cnt), np.nan)
        if stat == "sum":
            out = np.where(cnt > 0, s, np.nan)
        elif stat == "count":
            out = cnt
        elif stat == "mean":
            out = mean
        else:
            mean_rep = np.repeat(mean, lens)
            dev2 = np.where(cond, (vals - mean_rep) ** 2, 0.0)
            ss = _reduceat(dev2, starts, n)
            with np.errstate(invalid="ignore", divide="ignore"):
                out = np.where(cnt > 1, np.sqrt(ss / np.clip(cnt - 1, 1, None)), np.nan)
    elif stat in ("min", "max"):
        if stat == "min":
            masked = np.where(cond, vals, np.inf)
            red = _reduceat_min(masked, starts, n)
        else:
            masked = np.where(cond, vals, -np.inf)
            red = _reduceat_max(masked, starts, n)
        out = np.where(cnt > 0, red, np.nan)
    elif stat == "median":
        # order selected values within segment: unselected pushed to +inf end
        masked = np.where(cond, vals, np.inf)
        order = np.lexsort((masked, np.repeat(np.arange(len(starts)), lens)))
        sorted_vals = masked[order]
        k = cnt.astype(np.int64)
        lo_idx = starts + np.maximum((k - 1) // 2, 0)
        hi_idx = starts + np.maximum(k // 2, 0)
        with np.errstate(invalid="ignore"):
            med = (sorted_vals[np.clip(lo_idx, 0, n - 1)] + sorted_vals[np.clip(hi_idx, 0, n - 1)]) / 2.0
        out = np.where(k > 0, med, np.nan)
    else:
        raise ValueError(stat)
    return np.where(np.isnan(out), nan_fill, out) if nan_fill is not None else out


def _reduceat(x: np.ndarray, starts: np.ndarray, n: int) -> np.ndarray:
    if n == 0 or len(starts) == 0:
        return np.zeros(len(starts))
    return np.add.reduceat(x, starts)


def _reduceat_min(x, starts, n):
    if n == 0 or len(starts) == 0:
        return np.zeros(len(starts))
    return np.minimum.reduceat(x, starts)


def _reduceat_max(x, starts, n):
    if n == 0 or len(starts) == 0:
        return np.zeros(len(starts))
    return np.maximum.reduceat(x, starts)


def seg_rank(order_vals: np.ndarray, gids_sorted: np.ndarray, starts: np.ndarray, lens: np.ndarray, descending: bool) -> np.ndarray:
    """row_number within each segment ordered by order_vals (stable ties)."""
    key = -order_vals if descending else order_vals
    order = np.lexsort((key, gids_sorted))
    rank = np.empty(len(order_vals), dtype=np.int64)
    pos = np.arange(len(order_vals)) - np.repeat(starts, lens)
    rank[order] = pos + 1
    return rank


def seg_ewm_mean(vals_sorted: np.ndarray, starts: np.ndarray, lens: np.ndarray,
                 alpha: float) -> np.ndarray:
    """Per-segment exponentially weighted moving mean (pandas
    ``ewm(alpha, adjust=False, ignore_na=True).mean()`` semantics):
    ``y_0 = x_0``, ``y_t = (1-a) y_{t-1} + a x_t`` over the segment's VALID
    values in order; NaN rows emit the previous mean (leading NaNs emit NaN).

    Vectorized via chunked rescaling: within a chunk of valid-ordinal width
    ``L`` the recurrence is a segmented cumsum of ``a x (1-a)^-rel`` scaled
    back by ``(1-a)^rel`` — L is sized so ``(1-a)^-L`` never overflows; the
    per-chunk loop runs ``ceil(max_run/L)`` numpy passes, not per row."""
    n = len(vals_sorted)
    out = np.full(n, np.nan)
    if n == 0:
        return out
    a = float(alpha)
    if not 0.0 < a <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    q = 1.0 - a
    valid = ~np.isnan(vals_sorted)
    seg_of = np.repeat(np.arange(len(starts)), lens)
    # ordinal among VALID rows within each segment
    cs = np.cumsum(valid.astype(np.int64))
    base = cs[starts] - valid[starts].astype(np.int64)
    ord_all = cs - 1 - base[seg_of]
    vidx = np.flatnonzero(valid)
    if len(vidx) == 0:
        return out
    g = seg_of[vidx]
    m = ord_all[vidx]
    x = vals_sorted[vidx]
    y = np.empty(len(x))
    if q == 0.0:  # alpha == 1: y = x
        y[:] = x
    else:
        # q^-L must stay finite in float64 (< ~1e308): cap the chunk's
        # exponent range at 280 decimal orders
        L = int(np.clip(np.floor(280.0 / max(-np.log10(q), 1e-12)), 4, 4096))
        carry = np.full(len(starts), np.nan)
        top = int(m.max())
        for c in range(0, top + 1, L):
            sel = np.flatnonzero((m >= c) & (m < c + L))
            if len(sel) == 0:
                continue
            xs, gs, rel = x[sel], g[sel], m[sel] - c
            # segments present in this chunk (gs is sorted)
            s_starts, s_lens = segments(gs)
            seg_row = np.repeat(np.arange(len(s_starts)), s_lens)
            # cap the 2D scratch at ~64M cells: narrower passes, same math
            Lc = L
            while len(s_starts) * Lc > (1 << 26) and Lc > 4:
                Lc //= 2
            for c2 in range(0, L, Lc):
                sub = np.flatnonzero((rel >= c2) & (rel < c2 + Lc))
                if len(sub) == 0:
                    continue
                rel2 = rel[sub] - c2
                inv = np.power(q, -rel2.astype(np.float64))
                first = m[sel][sub] == 0  # the segment's very first valid value: full weight
                u = np.where(first, xs[sub] * inv, a * xs[sub] * inv)
                # EXACT per-segment cumsum: one scratch row per segment (a
                # single global cumsum cancels catastrophically when a huge
                # q^-rel accumulation from one segment precedes another)
                rows = seg_row[sub]
                row_ids, rows_d = np.unique(rows, return_inverse=True)
                mat = np.zeros((len(row_ids), Lc))
                mat[rows_d, rel2] = u
                U = np.cumsum(mat, axis=1)[rows_d, rel2]
                prev = carry[gs[sub]]
                prev_contrib = np.where(np.isnan(prev), 0.0, prev * q)
                yy = np.power(q, rel2.astype(np.float64)) * (U + prev_contrib)
                y[sel[sub]] = yy
                # carry = y at the last row of each segment in this pass
                ss2, sl2 = segments(rows_d)
                lasts = sub[ss2 + sl2 - 1]
                carry[gs[lasts]] = y[sel[lasts]]
    out[vidx] = y
    # NaN rows carry the previous valid mean (leading NaNs stay NaN)
    if not valid.all():
        filled = np.where(valid, np.arange(n), -1)
        last = np.maximum.accumulate(filled)
        seg_first = np.repeat(starts, lens)
        ok = (last >= seg_first) & ~valid
        out[ok] = out[last[ok]]
    return out
