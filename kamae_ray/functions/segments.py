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
