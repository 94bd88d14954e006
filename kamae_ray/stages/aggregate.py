"""Partial-aggregation groupby: the scale-correct GROUP BY plan.

A naive ``ds.groupby(keys).sum(col)`` shuffles EVERY row. Here each block
pre-aggregates to one partial row per (block, key) inside ``map_batches``
(vectorized segment kernels), so only |blocks| x |distinct keys in block|
partial rows enter the final exchange — for low-cardinality keys that is a
~block_size x reduction in shuffle volume. The final combine is itself
distributed (one small sort-shuffle of partial rows + a block kernel), so
high-cardinality keys cannot OOM the driver. mean/std derive from
(sum, count, sumsq) partials, so they combine exactly across blocks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kamae_ray.functions import arrays as A
from kamae_ray.functions import segments as S

_STATS = ("sum", "count", "mean", "min", "max", "std")
#: partials needed per requested stat
_NEEDS = {
    "sum": ("sum", "count"),  # count distinguishes empty groups: SQL SUM of all-null = NULL
    "count": ("count",),
    "mean": ("sum", "count"),
    "std": ("sum", "count", "sumsq"),
    "min": ("min",),
    "max": ("max",),
}


def groupby_agg(ds, keys: str | list[str], aggs: dict[str, list[str]]):
    """Aggregate ``{col: [stats...]}`` per distinct ``keys`` tuple.

    Output columns: key columns + ``{col}_{stat}`` (float64; count int64),
    one row per distinct key, NaN-skipping (SQL aggregate semantics: nulls
    ignored; count counts non-null)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    for col, stats in aggs.items():
        for st in stats:
            if st not in _STATS:
                raise ValueError(f"unsupported stat {st!r} for {col!r}")
    # partial columns to compute per value column
    partial_specs: dict[str, tuple] = {}
    for col, stats in aggs.items():
        need = []
        for st in stats:
            need.extend(_NEEDS[st])
        partial_specs[col] = tuple(dict.fromkeys(need))

    def partial(block: pa.Table) -> pa.Table:
        n = block.num_rows
        if n == 0:
            cols = {k: block.column(k) for k in keys}
            for col, need in partial_specs.items():
                for p in need:
                    cols[f"__p_{col}_{p}"] = pa.array([], pa.float64())
            return pa.table(cols)
        gids = S.group_ids(block, keys)
        order = np.argsort(gids, kind="stable")
        gs = gids[order]
        starts, lens = S.segments(gs)
        firsts = order[starts]
        out = {k: A.as_array(block.column(k)).take(pa.array(firsts)) for k in keys}
        for col, need in partial_specs.items():
            vals, mask = A.to_numpy(pc.cast(A.as_array(block.column(col)), pa.float64(), safe=False))
            vals = vals.astype(np.float64, copy=True)
            if mask is not None:
                vals[mask] = np.nan
            v = vals[order]
            ok = ~np.isnan(v)
            vz = np.where(ok, v, 0.0)
            if "count" in need:
                out[f"__p_{col}_count"] = pa.array(np.add.reduceat(ok.astype(np.float64), starts))
            if "sum" in need:
                out[f"__p_{col}_sum"] = pa.array(np.add.reduceat(vz, starts))
            if "sumsq" in need:
                out[f"__p_{col}_sumsq"] = pa.array(np.add.reduceat(vz * vz, starts))
            if "min" in need:
                out[f"__p_{col}_min"] = pa.array(np.minimum.reduceat(np.where(ok, v, np.inf), starts))
            if "max" in need:
                out[f"__p_{col}_max"] = pa.array(np.maximum.reduceat(np.where(ok, v, -np.inf), starts))
        return pa.table(out)

    partial.__name__ = "groupby_partial"

    def finalize(partials: pa.Table) -> pa.Table:
        gids = S.group_ids(partials, keys)
        order = np.argsort(gids, kind="stable")
        gs = gids[order]
        starts, lens = S.segments(gs)
        firsts = order[starts]
        out = {k: A.as_array(partials.column(k)).take(pa.array(firsts)) for k in keys}
        merged: dict[str, np.ndarray] = {}
        for col, need in partial_specs.items():
            for p in need:
                v = partials.column(f"__p_{col}_{p}").to_numpy(zero_copy_only=False)[order]
                if p in ("sum", "count", "sumsq"):
                    merged[f"{col}_{p}"] = np.add.reduceat(v, starts)
                elif p == "min":
                    merged[f"{col}_{p}"] = np.minimum.reduceat(v, starts)
                else:
                    merged[f"{col}_{p}"] = np.maximum.reduceat(v, starts)
        for col, stats in aggs.items():
            for st in stats:
                if st == "sum":
                    c = merged[f"{col}_count"]
                    out[f"{col}_sum"] = pa.array(np.where(c > 0, merged[f"{col}_sum"], np.nan))
                elif st == "count":
                    out[f"{col}_count"] = pa.array(merged[f"{col}_count"].astype(np.int64))
                elif st == "mean":
                    c = merged[f"{col}_count"]
                    out[f"{col}_mean"] = pa.array(
                        np.where(c > 0, merged[f"{col}_sum"] / np.where(c == 0, 1, c), np.nan)
                    )
                elif st == "std":
                    c = merged[f"{col}_count"]
                    m = merged[f"{col}_sum"] / np.where(c == 0, 1, c)
                    var = np.clip(merged[f"{col}_sumsq"] / np.where(c == 0, 1, c) - m * m, 0, None)
                    out[f"{col}_std"] = pa.array(np.where(c > 0, np.sqrt(var), np.nan))
                elif st == "min":
                    v = merged[f"{col}_min"]
                    out[f"{col}_min"] = pa.array(np.where(np.isfinite(v), v, np.nan))
                elif st == "max":
                    v = merged[f"{col}_max"]
                    out[f"{col}_max"] = pa.array(np.where(np.isfinite(v), v, np.nan))
        return pa.table(out)

    if isinstance(ds, pa.Table):
        return finalize(partial(ds))
    value_cols = list(aggs)
    proj = ds
    try:
        proj = ds.select_columns(list(dict.fromkeys(keys + value_cols)))
    except Exception:
        pass
    parts = proj.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    # combine partials distributed: one (small) sort-shuffle co-locates each
    # key's partial rows, finalize runs as a block kernel — no driver merge,
    # so high-cardinality keys cannot OOM the driver
    from kamae_ray.stages.window import sorted_block_apply

    return sorted_block_apply(parts, keys, finalize, "groupby_finalize")


def topk_per_group(ds, keys, order_col: str, k: int, descending: bool = True,
                   tiebreak=None):
    """Top ``k`` whole rows per distinct ``keys`` tuple, ordered by
    ``order_col`` (then ``tiebreak`` columns ascending) — SQL
    ``ROW_NUMBER() OVER (PARTITION BY keys ORDER BY ...) <= k``.

    Scale plan (partial top-k, the heavy-hitters shape): every input block
    first reduces to at most k rows per key PRESENT IN THAT BLOCK inside
    ``map_batches`` — a block-local pc.sort_indices + segment head, no
    Python loops — so the sort-shuffle that co-locates keys carries at most
    ``k x keys_per_block`` rows instead of every row. The finalize kernel is
    the same head-k over the co-located survivors (correct because the
    global top-k of a union is contained in the union of per-block top-ks).
    Pass unique ``tiebreak`` columns for deterministic output under ties.
    Nulls in ``order_col`` sort last (DuckDB default NULLS LAST). Float NaN
    also sorts last (missing-value semantics) — DuckDB instead orders NaN
    above every number, so keep NaN out of ``order_col`` when comparing
    against a SQL oracle."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    tiebreak = [] if tiebreak is None else ([tiebreak] if isinstance(tiebreak, str) else list(tiebreak))
    direction = "descending" if descending else "ascending"
    sort_spec = ([(c, "ascending") for c in keys] + [(order_col, direction)]
                 + [(c, "ascending") for c in tiebreak])

    def head_k(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return block
        idx = np.asarray(pc.sort_indices(block, sort_keys=sort_spec))
        gids = S.group_ids(block, keys)
        gs = gids[idx]
        starts, lens = S.segments(gs)
        pos = np.arange(len(gs), dtype=np.int64) - np.repeat(starts, lens)
        return block.take(pa.array(idx[pos < k]))

    head_k.__name__ = "topk_partial"
    if isinstance(ds, pa.Table):
        return head_k(ds)
    parts = ds.map_batches(head_k, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    from kamae_ray.stages.window import sorted_block_apply

    return sorted_block_apply(parts, keys, head_k, "topk_finalize")


def quantile_per_group(ds, keys, col: str, qs, out_prefix: str | None = None):
    """Exact linear-interpolated quantiles of ``col`` per ``keys`` tuple —
    SQL ``quantile_cont(col, q)`` semantics (nulls ignored; empty group ->
    null). Output: key columns + ``{prefix}_p{round(q*100)}`` float64.

    Exact quantiles are not mergeable from per-block partials, so the plan
    is ONE sort-shuffle of the PROJECTED (keys, col) columns — never the
    full row — then a fully vectorized segmented kernel: one in-block
    lexsort, per-group non-null counts via reduceat, and a gather-interpolate
    with no per-group Python loop."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    qs = list(qs)
    prefix = out_prefix or col
    names = [f"{prefix}_p{int(round(q * 100))}" for q in qs]

    def kern(block: pa.Table) -> pa.Table:
        gids = S.group_ids(block, keys)
        vals, mask = A.to_numpy(pc.cast(A.as_array(block.column(col)), pa.float64(), safe=False))
        vals = vals.astype(np.float64, copy=True)
        if mask is not None:
            vals[mask] = np.nan
        order = np.lexsort((vals, gids))  # NaN sorts last within each gid
        gs = gids[order]
        v = vals[order]
        starts, lens = S.segments(gs)
        firsts = order[starts]
        out = {kc: A.as_array(block.column(kc)).take(pa.array(firsts)) for kc in keys}
        m = np.add.reduceat((~np.isnan(v)).astype(np.int64), starts) if len(v) else np.zeros(0, np.int64)
        for q, name in zip(qs, names):
            p = q * np.maximum(m - 1, 0)
            lo = np.floor(p).astype(np.int64)
            hi = np.minimum(lo + 1, np.maximum(m - 1, 0))
            frac = p - lo
            vlo = v[starts + np.minimum(lo, np.maximum(m - 1, 0))]
            vhi = v[starts + hi]
            res = vlo * (1.0 - frac) + vhi * frac
            out[name] = pa.array(np.where(m > 0, res, np.nan))
        return pa.table(out)

    if isinstance(ds, pa.Table):
        return kern(ds)
    proj = ds
    try:
        proj = ds.select_columns(list(dict.fromkeys(keys + [col])))
    except Exception:
        pass
    from kamae_ray.stages.window import sorted_block_apply

    return sorted_block_apply(proj, keys, kern, "group_quantiles")
