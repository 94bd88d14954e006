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

_STATS = ("sum", "count", "mean", "min", "max", "std", "var", "var_samp", "std_samp",
          "skew", "kurt")
#: partials needed per requested stat
_NEEDS = {
    "sum": ("sum", "count"),  # count distinguishes empty groups: SQL SUM of all-null = NULL
    "count": ("count",),
    "mean": ("sum", "count"),
    "std": ("sum", "count", "sumsq"),
    "var": ("sum", "count", "sumsq"),
    "var_samp": ("sum", "count", "sumsq"),
    "std_samp": ("sum", "count", "sumsq"),
    "min": ("min",),
    "max": ("max",),
    # population skewness m3/m2^1.5 and EXCESS kurtosis m4/m2^2 - 3, from raw
    # power sums (additive partials -> exact cross-block merge for
    # integer-valued columns, where the sums are exactly representable)
    "skew": ("sum", "count", "sumsq", "sum3"),
    "kurt": ("sum", "count", "sumsq", "sum3", "sum4"),
}
#: additively-merged partials (the rest are min/max-merged)
_ADD_PARTIALS = ("sum", "count", "sumsq", "sum3", "sum4")


def _moment_stat(st: str, merged: dict, col: str, prefix: str) -> np.ndarray:
    """std/var from (sum, count, sumsq) partials. ``std``/``var`` are
    population (VAR_POP); ``*_samp`` are sample (SQL STDDEV/VARIANCE default,
    n-1 denominator, NULL when n < 2)."""
    c = merged[f"{prefix}{col}_count"]
    safe = np.where(c == 0, 1, c)
    m = merged[f"{prefix}{col}_sum"] / safe
    ss = np.clip(merged[f"{prefix}{col}_sumsq"] / safe - m * m, 0, None)
    if st in ("skew", "kurt"):
        # mirror the oracle's expression STRUCTURE exactly (same multiply
        # chains, sqrt not **1.5, no POWER) so both engines evaluate the
        # identical IEEE sequence; with integer-valued inputs the power sums
        # are exact, so results match bit-for-bit
        r2 = merged[f"{prefix}{col}_sumsq"] / safe
        r3 = merged[f"{prefix}{col}_sum3"] / safe
        m2 = r2 - m * m
        ok = (c > 0) & (m2 > 0)
        m2s = np.where(ok, m2, 1.0)
        if st == "skew":
            m3 = r3 - 3.0 * m * r2 + 2.0 * (m * m * m)
            return np.where(ok, m3 / (m2s * np.sqrt(m2s)), np.nan)
        r4 = merged[f"{prefix}{col}_sum4"] / safe
        m4 = r4 - 4.0 * m * r3 + 6.0 * (m * m) * r2 - 3.0 * (m * m * m * m)
        return np.where(ok, m4 / (m2s * m2s) - 3.0, np.nan)
    if st in ("var_samp", "std_samp"):
        denom = np.where(c > 1, c - 1, 1)
        v = np.where(c > 1, ss * c / denom, np.nan)
    else:
        v = np.where(c > 0, ss, np.nan)
    return np.sqrt(v) if st.startswith("std") else v


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
            if "sum3" in need:
                out[f"__p_{col}_sum3"] = pa.array(np.add.reduceat(vz * vz * vz, starts))
            if "sum4" in need:
                v2 = vz * vz
                out[f"__p_{col}_sum4"] = pa.array(np.add.reduceat(v2 * v2, starts))
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
                if p in _ADD_PARTIALS:
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
                elif st in ("std", "var", "var_samp", "std_samp", "skew", "kurt"):
                    out[f"{col}_{st}"] = pa.array(_moment_stat(st, merged, col, ""))
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


def _rollup_partial(block: pa.Table, keys: list[str], partial_specs: dict) -> pa.Table:
    """Per-block finest-level partials: key columns + ``__p_{col}_{p}``
    columns, one row per distinct key tuple in the block (same math as
    groupby_agg's partial kernel)."""
    n = block.num_rows
    if n == 0:
        cols = {k: block.column(k) for k in keys}
        for col, need in partial_specs.items():
            for p in need:
                cols[f"__p_{col}_{p}"] = pa.array([], pa.float64())
        return pa.table(cols)
    gids = S.group_ids(block, keys)
    order = np.argsort(gids, kind="stable")
    starts, _ = S.segments(gids[order])
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
        if "sum3" in need:
            out[f"__p_{col}_sum3"] = pa.array(np.add.reduceat(vz * vz * vz, starts))
        if "sum4" in need:
            v2 = vz * vz
            out[f"__p_{col}_sum4"] = pa.array(np.add.reduceat(v2 * v2, starts))
        if "min" in need:
            out[f"__p_{col}_min"] = pa.array(np.minimum.reduceat(np.where(ok, v, np.inf), starts))
        if "max" in need:
            out[f"__p_{col}_max"] = pa.array(np.maximum.reduceat(np.where(ok, v, -np.inf), starts))
    return pa.table(out)


def _merge_partials_np(partials: pa.Table, keys: list[str], partial_specs: dict):
    """Merge ``__p_`` rows per ``keys`` tuple (keys may be []: one global
    group). Returns ``(first_key_arrays: dict, merged: dict[str, np.ndarray])``."""
    n = partials.num_rows
    if n == 0:
        key_out = {k: A.as_array(partials.column(k)) for k in keys}
        merged = {f"__p_{col}_{p}": np.zeros(0, np.float64)
                  for col, need in partial_specs.items() for p in need}
        return key_out, merged
    if keys:
        gids = S.group_ids(partials, keys)
        order = np.argsort(gids, kind="stable")
        starts, _ = S.segments(gids[order])
        firsts = order[starts]
        key_out = {k: A.as_array(partials.column(k)).take(pa.array(firsts)) for k in keys}
    else:
        order = np.arange(n)
        starts = np.array([0], dtype=np.int64) if n else np.array([], dtype=np.int64)
        key_out = {}
    merged: dict[str, np.ndarray] = {}
    for col, need in partial_specs.items():
        for p in need:
            v = partials.column(f"__p_{col}_{p}").to_numpy(zero_copy_only=False)[order]
            if not len(starts):
                merged[f"__p_{col}_{p}"] = np.zeros(0, np.float64)
            elif p in _ADD_PARTIALS:
                merged[f"__p_{col}_{p}"] = np.add.reduceat(v, starts)
            elif p == "min":
                merged[f"__p_{col}_{p}"] = np.minimum.reduceat(v, starts)
            else:
                merged[f"__p_{col}_{p}"] = np.maximum.reduceat(v, starts)
    return key_out, merged


def _final_stats(merged: dict, aggs: dict[str, list[str]]) -> dict:
    """Final stat columns from merged ``__p_`` arrays (same SQL NULL
    semantics as groupby_agg's finalize)."""
    out: dict[str, pa.Array] = {}
    for col, stats in aggs.items():
        for st in stats:
            if st == "sum":
                c = merged[f"__p_{col}_count"]
                out[f"{col}_sum"] = pa.array(np.where(c > 0, merged[f"__p_{col}_sum"], np.nan))
            elif st == "count":
                out[f"{col}_count"] = pa.array(merged[f"__p_{col}_count"].astype(np.int64))
            elif st == "mean":
                c = merged[f"__p_{col}_count"]
                out[f"{col}_mean"] = pa.array(
                    np.where(c > 0, merged[f"__p_{col}_sum"] / np.where(c == 0, 1, c), np.nan)
                )
            elif st in ("std", "var", "var_samp", "std_samp", "skew", "kurt"):
                out[f"{col}_{st}"] = pa.array(_moment_stat(st, merged, col, "__p_"))
            elif st == "min":
                v = merged[f"__p_{col}_min"]
                out[f"{col}_min"] = pa.array(np.where(np.isfinite(v), v, np.nan))
            elif st == "max":
                v = merged[f"__p_{col}_max"]
                out[f"{col}_max"] = pa.array(np.where(np.isfinite(v), v, np.nan))
    return out


def groupby_rollup(ds, keys: str | list[str], aggs: dict[str, list[str]],
                   grouping_id_col: str = "grouping_id",
                   driver_level_budget: int = 1_000_000):
    """SQL ``GROUP BY ROLLUP (keys...)`` — every prefix level plus the grand
    total, with rolled-up key columns NULL and a SQL ``GROUPING()`` bitmask
    column (bit set = column rolled up; key order = significance order).

    Scale plan: the INPUT is aggregated exactly once — per-block partials,
    one small sort-shuffle to merge them per finest key, materialized
    (bounded by the distinct finest-key count, the same contract as any
    GROUP BY output). Every coarser level then re-merges those finest
    partials — never the input — with one cheap exchange per level; the
    grand total reduces per block and merges O(blocks) rows on the driver.
    sum/count/sumsq/min/max partials merge exactly, so mean/std at every
    level equal a direct single-level aggregation."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    if not keys:
        raise ValueError("groupby_rollup needs at least one key")
    for col, stats in aggs.items():
        for st in stats:
            if st not in _STATS:
                raise ValueError(f"unsupported stat {st!r} for {col!r}")
    partial_specs: dict[str, tuple] = {}
    for col, stats in aggs.items():
        need = []
        for st in stats:
            need.extend(_NEEDS[st])
        partial_specs[col] = tuple(dict.fromkeys(need))
    nk = len(keys)

    def level_table(partials: pa.Table, level: int, key_types: dict) -> pa.Table:
        key_out, merged = _merge_partials_np(partials, keys[:level], partial_specs)
        nrows = len(next(iter(merged.values()))) if merged else 0
        if level == 0 and nrows == 0:
            # SQL: GROUP BY ROLLUP on an EMPTY relation still returns the
            # grand-total grouping-set row (count=0, aggregates NULL)
            ident = {"sum": 0.0, "count": 0.0, "sumsq": 0.0, "sum3": 0.0,
                     "sum4": 0.0, "min": np.inf, "max": -np.inf}
            merged = {f"__p_{c}_{p}": np.array([ident[p]])
                      for c, need in partial_specs.items() for p in need}
            nrows = 1
        cols: dict[str, pa.Array] = {}
        for i, k in enumerate(keys):
            cols[k] = key_out[k] if i < level else pa.nulls(nrows, key_types[k])
        cols.update(_final_stats(merged, aggs))
        gid = (1 << (nk - level)) - 1
        cols[grouping_id_col] = pa.array(np.full(nrows, gid, np.int64))
        return pa.table(cols)

    if isinstance(ds, pa.Table):
        finest = _rollup_partial(ds, keys, partial_specs)
        key_types = {k: finest.schema.field(k).type for k in keys}
        lvls = [level_table(finest, L, key_types) for L in range(nk, -1, -1)]
        return pa.concat_tables(lvls)

    from kamae_ray.base import dataset_schema
    from kamae_ray.stages.window import sorted_block_apply

    proj = ds
    try:
        proj = ds.select_columns(list(dict.fromkeys(keys + list(aggs))))
    except Exception:
        pass
    parts = proj.map_batches(
        lambda b: _rollup_partial(b, keys, partial_specs),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )

    def merge_finest(partials: pa.Table) -> pa.Table:
        key_out, merged = _merge_partials_np(partials, keys, partial_specs)
        key_out.update({p: pa.array(v) for p, v in merged.items()})
        return pa.table(key_out)

    # ONE pass over the input; the finest partial table is consumed by every
    # level, so materialize it (build-notes rule: checkpoint any bounded
    # intermediate consumed more than once).
    finest = sorted_block_apply(parts, keys, merge_finest, "rollup_finest").materialize()
    sch = dataset_schema(finest)
    key_types = {k: sch.field(k).type for k in keys}
    import ray

    from kamae_ray.base import collect_tables

    if finest.count() <= driver_level_budget:
        # small finest table (the common case): compute every level on the
        # driver from the already-merged partials — no per-level shuffles,
        # no union chain of executions. Driver memory = finest size, under
        # the explicit budget; above it the fully distributed path runs.
        pcols = keys + [f"__p_{c}_{p}" for c, need in partial_specs.items() for p in need]
        blocks = [t.select(pcols) for t in collect_tables(finest) if t.num_rows]
        if blocks:
            ft = pa.concat_tables(blocks)
        else:
            ft = pa.table({c: pa.nulls(0, key_types.get(c, pa.float64())) for c in pcols})
        lvls = [level_table(ft, L, key_types) for L in range(nk, -1, -1)]
        return ray.data.from_arrow(pa.concat_tables(lvls))

    levels = []
    for L in range(nk, 0, -1):
        if L == nk:
            lvl = finest.map_batches(
                lambda b, L=L: level_table(b, L, key_types),
                batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
            )
        else:
            # force the surrogate sort: finest is materialized (size known,
            # usually small -> auto would pick Ray's plain sort), but a null
            # string key crashes Ray's native sort partitioner
            lvl = sorted_block_apply(
                finest, keys[:L],
                lambda b, L=L: level_table(b, L, key_types),
                f"rollup_level{L}", force_surrogate=True,
            )
        levels.append(lvl)
    # grand total: per-block single-row merge, then an O(blocks) driver merge
    def block_total(b: pa.Table) -> pa.Table:
        _, merged = _merge_partials_np(b, [], partial_specs)
        return pa.table({p: pa.array(v) for p, v in merged.items()})

    from kamae_ray.base import collect_tables

    tiny = collect_tables(
        finest.map_batches(block_total, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=None)
    )
    tiny_ne = [t for t in tiny if t.num_rows]
    if tiny_ne or tiny:
        tiny = pa.concat_tables(tiny_ne or tiny[:1])
    else:  # zero blocks materialized: synthesize an empty partials table
        tiny = pa.table({f"__p_{c}_{p}": pa.array([], pa.float64())
                         for c, need in partial_specs.items() for p in need})
    total = level_table(tiny, 0, key_types)
    import ray

    levels.append(ray.data.from_arrow(total))
    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def groupby_grouping_sets(ds, keys: str | list[str], sets, aggs: dict[str, list[str]],
                          grouping_id_col: str = "grouping_id",
                          driver_level_budget: int = 1_000_000):
    """SQL ``GROUP BY GROUPING SETS (sets...)`` — arbitrary grouping sets over
    ``keys`` (each set a subset of ``keys``; ``()`` = grand total), with
    rolled-up key columns NULL and the SQL ``GROUPING(keys...)`` bitmask
    (bit set = column not in the set; first key = most significant bit).

    Same one-input-pass plan as :func:`groupby_rollup`: per-block partials,
    ONE small sort-shuffle to the finest (all-keys) level, materialized
    (bounded by the distinct finest-key count); every grouping set then
    re-merges those finest partials — never the input. Under
    ``driver_level_budget`` finest rows all sets compute on the driver with
    zero extra exchanges; above it each set gets one cheap exchange over the
    finest partials. sum/count/sumsq/min/max partials merge exactly, so every
    set's mean/std equal a direct single-set aggregation."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    if not keys:
        raise ValueError("groupby_grouping_sets needs at least one key")
    norm_sets: list[list[str]] = []
    for s in sets:
        s = [s] if isinstance(s, str) else list(s)
        bad = [c for c in s if c not in keys]
        if bad:
            raise ValueError(f"grouping set column(s) {bad} not in keys {keys}")
        # canonical key order inside the set (SQL set semantics)
        norm_sets.append([k for k in keys if k in s])
    if not norm_sets:
        raise ValueError("groupby_grouping_sets needs at least one set")
    for col, stats in aggs.items():
        for st in stats:
            if st not in _STATS:
                raise ValueError(f"unsupported stat {st!r} for {col!r}")
    partial_specs: dict[str, tuple] = {}
    for col, stats in aggs.items():
        need = []
        for st in stats:
            need.extend(_NEEDS[st])
        partial_specs[col] = tuple(dict.fromkeys(need))
    nk = len(keys)

    def set_table(partials: pa.Table, incl: list[str], key_types: dict) -> pa.Table:
        key_out, merged = _merge_partials_np(partials, incl, partial_specs)
        nrows = len(next(iter(merged.values()))) if merged else 0
        if not incl and nrows == 0:
            # SQL: the () grouping set of an EMPTY relation still returns its
            # one row (count=0, aggregates NULL)
            ident = {"sum": 0.0, "count": 0.0, "sumsq": 0.0, "sum3": 0.0,
                     "sum4": 0.0, "min": np.inf, "max": -np.inf}
            merged = {f"__p_{c}_{p}": np.array([ident[p]])
                      for c, need in partial_specs.items() for p in need}
            nrows = 1
        cols: dict[str, pa.Array] = {}
        for k in keys:
            cols[k] = key_out[k] if k in incl else pa.nulls(nrows, key_types[k])
        cols.update(_final_stats(merged, aggs))
        gid = sum(1 << (nk - 1 - i) for i, k in enumerate(keys) if k not in incl)
        cols[grouping_id_col] = pa.array(np.full(nrows, gid, np.int64))
        return pa.table(cols)

    if isinstance(ds, pa.Table):
        finest = _rollup_partial(ds, keys, partial_specs)
        key_types = {k: finest.schema.field(k).type for k in keys}
        return pa.concat_tables([set_table(finest, s, key_types) for s in norm_sets])

    from kamae_ray.base import collect_tables, dataset_schema
    from kamae_ray.stages.window import sorted_block_apply

    proj = ds
    try:
        proj = ds.select_columns(list(dict.fromkeys(keys + list(aggs))))
    except Exception:
        pass
    parts = proj.map_batches(
        lambda b: _rollup_partial(b, keys, partial_specs),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )

    def merge_finest(partials: pa.Table) -> pa.Table:
        key_out, merged = _merge_partials_np(partials, keys, partial_specs)
        key_out.update({p: pa.array(v) for p, v in merged.items()})
        return pa.table(key_out)

    finest = sorted_block_apply(parts, keys, merge_finest, "gsets_finest").materialize()
    sch = dataset_schema(finest)
    key_types = {k: sch.field(k).type for k in keys}
    import ray

    if finest.count() <= driver_level_budget:
        pcols = keys + [f"__p_{c}_{p}" for c, need in partial_specs.items() for p in need]
        blocks = [t.select(pcols) for t in collect_tables(finest) if t.num_rows]
        if blocks:
            ft = pa.concat_tables(blocks)
        else:
            ft = pa.table({c: pa.nulls(0, key_types.get(c, pa.float64())) for c in pcols})
        return ray.data.from_arrow(
            pa.concat_tables([set_table(ft, s, key_types) for s in norm_sets])
        )

    outs = []
    for s in norm_sets:
        if s == keys:
            outs.append(finest.map_batches(
                lambda b, s=s: set_table(b, s, key_types),
                batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
            ))
        elif s:
            # force the surrogate sort: finest is materialized (size known ->
            # auto would pick Ray's plain sort), but null string keys crash
            # Ray's native sort partitioner (build-notes lesson 22)
            outs.append(sorted_block_apply(
                finest, s, lambda b, s=s: set_table(b, s, key_types),
                f"gsets_{'_'.join(s)}", force_surrogate=True,
            ))
        else:
            def block_total(b: pa.Table) -> pa.Table:
                _, merged = _merge_partials_np(b, [], partial_specs)
                return pa.table({p: pa.array(v) for p, v in merged.items()})

            tiny = collect_tables(finest.map_batches(
                block_total, batch_format="pyarrow", zero_copy_batch=True, batch_size=None))
            tiny_ne = [t for t in tiny if t.num_rows]
            if tiny_ne or tiny:
                tt = pa.concat_tables(tiny_ne or tiny[:1])
            else:
                tt = pa.table({f"__p_{c}_{p}": pa.array([], pa.float64())
                               for c, need in partial_specs.items() for p in need})
            outs.append(ray.data.from_arrow(set_table(tt, [], key_types)))
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


def groupby_cube(ds, keys: str | list[str], aggs: dict[str, list[str]],
                 grouping_id_col: str = "grouping_id",
                 driver_level_budget: int = 1_000_000):
    """SQL ``GROUP BY CUBE (keys...)`` — all 2^n grouping sets, via
    :func:`groupby_grouping_sets` (one input pass; every set re-merges the
    materialized finest partials)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    n = len(keys)
    if n > 6:
        raise ValueError("groupby_cube supports at most 6 keys (64 grouping sets)")
    sets = [[keys[i] for i in range(n) if (m >> (n - 1 - i)) & 1] for m in range(2 ** n)]
    return groupby_grouping_sets(ds, keys, sets, aggs,
                                 grouping_id_col=grouping_id_col,
                                 driver_level_budget=driver_level_budget)


def groupby_arg_extreme(ds, keys: str | list[str], arg_col: str, by_col: str,
                        mode: str = "max"):
    """SQL ``arg_max(arg_col, by_col)`` / ``arg_min`` per ``keys`` group, made
    DETERMINISTIC: among rows tied on the extreme ``by_col`` value the
    smallest ``arg_col`` wins (nulls last) — the
    ``ROW_NUMBER() OVER (PARTITION BY keys ORDER BY by DESC, arg ASC) = 1``
    plan, without the window sort over every row. Rows with null ``by_col``
    are ignored (SQL aggregate semantics); a key whose rows are ALL null-by
    is absent from the output.

    Scale plan: per-block best-row partials (one vectorized multi-key
    sort + segment firsts — the combiner, so the exchange carries at most one
    row per (block, key)), then the SAME kernel over the co-located partials
    (taking a best-of-bests is idempotent). Both columns keep their native
    Arrow types end-to-end — no float casts, so int64/timestamp ``by``
    columns are compared exactly."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    if mode not in ("max", "min"):
        raise ValueError("mode must be max|min")
    by_order = "descending" if mode == "max" else "ascending"
    out_by = f"{by_col}_{mode}"

    def best(block: pa.Table) -> pa.Table:
        cols = keys + [arg_col, by_col]
        proj = block.select(cols)
        proj = proj.filter(pc.is_valid(A.as_array(proj.column(by_col))))
        if proj.num_rows == 0:
            out = {k: proj.column(k) for k in keys}
            out[arg_col] = proj.column(arg_col)
            out[out_by] = proj.column(by_col)
            return pa.table(out)
        # global (by, arg) order first, then a STABLE segment sort by key:
        # each segment's first row is its extreme-by / min-arg winner
        o1 = pc.sort_indices(
            proj, sort_keys=[(by_col, by_order), (arg_col, "ascending")],
            null_placement="at_end",
        ).to_numpy(zero_copy_only=False)
        gids = S.group_ids(proj, keys)[o1]
        o2 = np.argsort(gids, kind="stable")
        starts, _l = S.segments(gids[o2])
        winners = pa.array(o1[o2[starts]])
        out = {k: A.as_array(proj.column(k)).take(winners) for k in keys}
        out[arg_col] = A.as_array(proj.column(arg_col)).take(winners)
        out[out_by] = A.as_array(proj.column(by_col)).take(winners)
        return pa.table(out)

    best.__name__ = f"arg_{mode}_partial"
    if isinstance(ds, pa.Table):
        return best(ds)
    proj = ds
    try:
        proj = ds.select_columns(list(dict.fromkeys(keys + [arg_col, by_col])))
    except Exception:
        pass
    parts = proj.map_batches(best, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    def merge(partials: pa.Table) -> pa.Table:
        if out_by in partials.column_names and by_col not in partials.column_names:
            partials = partials.rename_columns(
                [by_col if c == out_by else c for c in partials.column_names])
        return best(partials)

    merge.__name__ = f"arg_{mode}_finalize"
    from kamae_ray.stages.window import sorted_block_apply

    return sorted_block_apply(parts, keys, merge, f"arg_{mode}_finalize")


def groupby_cat_stats(ds, keys: str | list[str], col: str):
    """Categorical distribution stats per ``keys`` group over ``col`` (nulls
    ignored, SQL aggregate semantics): ``n`` (non-null rows), ``n_distinct``,
    Shannon ``entropy`` (nats) and Gini impurity ``gini`` = 1 - sum(p^2).

    Scale plan: ONE pair-count pass (:func:`groupby_agg` over
    keys + [col] — per-block combiner, the exchange carries distinct pairs),
    then one key exchange over the tiny (key, value, count) cells and a
    segmented kernel. Counts are integers, so ``n``/``n_distinct``/``gini``
    are exact across engines; ``entropy`` sums ln terms (value-sorted order)
    and is exact to ~1 ULP."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def drop_null_vals(block: pa.Table) -> pa.Table:
        arr = A.as_array(block.column(col))
        if arr.null_count:
            block = block.filter(arr.is_valid())
        # groupby_agg counts a NUMERIC value column; the category column is a
        # key here, so count a constant instead
        return block.append_column("__kr_one", pa.array(np.ones(block.num_rows, np.int64)))

    drop_null_vals.__name__ = "cat_stats_dropnull"
    src = ds
    if isinstance(ds, pa.Table):
        src = drop_null_vals(ds)
    else:
        try:
            src = ds.select_columns(list(dict.fromkeys(keys + [col])))
        except Exception:
            pass
        src = src.map_batches(drop_null_vals, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)
    cells = groupby_agg(src, keys + [col], {"__kr_one": ["count"]})
    cnt_col = "__kr_one_count"

    def finish(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            out = {k: block.column(k) for k in keys}
            out["n"] = pa.array([], pa.int64())
            out["n_distinct"] = pa.array([], pa.int64())
            out["entropy"] = pa.array([], pa.float64())
            out["gini"] = pa.array([], pa.float64())
            return pa.table(out)
        gids = S.group_ids(block, keys)
        c = block.column(cnt_col).to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(gids, kind="stable")
        gs, cs = gids[order], c[order]
        starts, lens = S.segments(gs)
        firsts = order[starts]
        n = np.add.reduceat(cs, starts)
        # libm_log: oracle-mirrored ln must match DuckDB bit-for-bit
        slog = np.add.reduceat(cs * A.libm_log(cs), starts)
        s2 = np.add.reduceat(cs * cs, starts)
        out = {k: A.as_array(block.column(k)).take(pa.array(firsts)) for k in keys}
        out["n"] = pa.array(n.astype(np.int64))
        out["n_distinct"] = pa.array(lens.astype(np.int64))
        out["entropy"] = pa.array(A.libm_log(n) - slog / n)
        out["gini"] = pa.array(1.0 - s2 / (n * n))
        return pa.table(out)

    if isinstance(cells, pa.Table):
        return finish(cells)
    from kamae_ray.stages.window import sorted_block_apply

    return sorted_block_apply(cells, keys, finish, "cat_stats_finish")


def distinct(ds, cols: str | list[str]):
    """SQL ``SELECT DISTINCT cols``: one row per distinct tuple (all-null
    tuples collapse to one row, SQL DISTINCT semantics).

    Scale plan: every block pre-dedups inside ``map_batches`` (vectorized
    factorize + segment firsts — the combiner), so the sort-shuffle that
    co-locates equal tuples carries at most one row per (block, tuple); the
    finalize is the same kernel over the co-located survivors. Never a
    driver-side set."""
    cols = [cols] if isinstance(cols, str) else list(cols)

    def dedup_block(block: pa.Table) -> pa.Table:
        proj = block.select(cols)
        if proj.num_rows == 0:
            return proj
        gids = S.group_ids(proj, cols)
        order = np.argsort(gids, kind="stable")
        starts, _lens = S.segments(gids[order])
        return proj.take(pa.array(order[starts]))

    dedup_block.__name__ = "distinct_partial"
    if isinstance(ds, pa.Table):
        return dedup_block(ds)
    proj = ds
    try:
        proj = ds.select_columns(cols)
    except Exception:
        pass
    parts = proj.map_batches(dedup_block, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    from kamae_ray.stages.window import sorted_block_apply

    return sorted_block_apply(parts, cols, dedup_block, "distinct_finalize")


def groupby_count_distinct(ds, keys: str | list[str], col: str, out_col: str | None = None):
    """SQL ``COUNT(DISTINCT col) GROUP BY keys`` (nulls not counted) in ONE
    shuffle: each block pre-dedups (keys, col) pairs (combiner — the shuffle
    carries at most one row per (block, key, value)), the sort co-locates by
    ``keys`` only, and the finalize counts distinct values per key segment
    with the same factorize kernel. Never a driver-side set."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    out_col = out_col or f"{col}_count_distinct"

    def dedup_pairs(block: pa.Table) -> pa.Table:
        proj = block.select(keys + [col])
        if proj.num_rows == 0:
            return proj
        gids = S.group_ids(proj, keys + [col])
        order = np.argsort(gids, kind="stable")
        starts, _lens = S.segments(gids[order])
        return proj.take(pa.array(order[starts]))

    dedup_pairs.__name__ = "count_distinct_partial"

    def finalize(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            out = {k: block.column(k) for k in keys}
            out[out_col] = pa.array([], pa.int64())
            return pa.table(out)
        pair_gids = S.group_ids(block, keys + [col])
        key_gids = S.group_ids(block, keys)
        # one distinct (key, value) representative per pair group
        order = np.argsort(pair_gids, kind="stable")
        starts, _l = S.segments(pair_gids[order])
        reps = order[starts]
        kg = key_gids[reps]
        korder = np.argsort(kg, kind="stable")
        kstarts, klens = S.segments(kg[korder])
        firsts = reps[korder][kstarts]
        nn = pc.is_valid(A.as_array(block.column(col))).to_numpy(zero_copy_only=False)
        cnt = np.add.reduceat(nn[reps][korder].astype(np.int64), kstarts)
        out = {k: A.as_array(block.column(k)).take(pa.array(firsts)) for k in keys}
        out[out_col] = pa.array(cnt)
        return pa.table(out)

    if isinstance(ds, pa.Table):
        return finalize(dedup_pairs(ds))
    proj = ds
    try:
        proj = ds.select_columns(list(dict.fromkeys(keys + [col])))
    except Exception:
        pass
    parts = proj.map_batches(dedup_pairs, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    from kamae_ray.stages.window import sorted_block_apply

    return sorted_block_apply(parts, keys, finalize, "count_distinct_finalize")


def global_cumsum(ds, order_col: str, val_col: str, out_col: str | None = None,
                  bucket_width: int = 65536, exclusive: bool = True,
                  levels: int = 1, super_width: int = 65536):
    """Dataset-wide ordered prefix sum — SQL
    ``SUM(val) OVER (ORDER BY order_col ROWS UNBOUNDED PRECEDING)``
    (``exclusive=True`` stops at ``1 PRECEDING``; first row gets 0).

    ``order_col`` must hold UNIQUE non-null integers (a row id); integer
    values accumulate exactly in int64, floats in float64; null values add 0.

    Scale plan (two streaming passes, never a global serial scan):

    1. bucket pass — per-block partial sums per ``order_col // bucket_width``
       bucket (a tiny (bucket, sum) table; the only driver state is the
       O(id_range / bucket_width) bucket prefix, ``ray.put`` ONCE). Size
       ``bucket_width`` so that table stays small; a 100-TB id space wants a
       second bucket level before the driver merge (same combine, reapplied).
    2. cumsum pass — ONE sort-shuffle on the bucket id co-locates each
       bucket's rows (partition contract: sort key == group key), then a
       segmented in-block cumsum plus the broadcast bucket base. Rows come
       back bucket-sorted, not in input order (Dataset ops do not preserve
       order anyway).

    The two passes each re-execute the upstream plan — ``materialize()`` a
    projected (order, val) intermediate first if upstream is expensive.

    ``levels=2`` inserts the second bucket level for id spaces whose bucket
    count itself breaks the driver (>~1e8 buckets at 100 TB): the bucket
    partials stay a (materialized, spillable) Dataset; bucket sums merge and
    prefix inside whole-superbucket blocks (one small sort on
    ``bucket // super_width``); the driver holds ONLY the superbucket prefix
    (O(id_range / (bucket_width * super_width)) — 1e13 ids / 2^32 ≈ 2.3k
    entries). The per-bucket bases ride the SAME data sort as tagged side
    rows (partition contract co-locates a bucket's base row with its data
    rows), so no extra join."""
    out_col = out_col or f"{val_col}_cumsum"
    bw = np.int64(bucket_width)
    if levels not in (1, 2):
        raise ValueError("levels must be 1 or 2")

    def _vals(block: pa.Table):
        arr = A.as_array(block.column(val_col))
        is_int = pa.types.is_integer(arr.type)
        t = pa.int64() if is_int else pa.float64()
        v = pc.fill_null(pc.cast(arr, t, safe=False), 0).to_numpy(zero_copy_only=False)
        return v, is_int

    def _order(block: pa.Table) -> np.ndarray:
        return pc.cast(A.as_array(block.column(order_col)), pa.int64(), safe=False) \
            .to_numpy(zero_copy_only=False)

    if isinstance(ds, pa.Table):
        if ds.num_rows == 0:
            return ds.append_column(out_col, pa.array([], pa.int64()))
        v, is_int = _vals(ds)
        o = _order(ds)
        idx = np.argsort(o, kind="stable")
        cs = np.cumsum(v[idx])
        pre = (cs - v[idx]) if exclusive else cs
        out = np.empty_like(pre)
        out[idx] = pre
        return ds.append_column(out_col, pa.array(out))

    import ray

    proj = ds
    try:
        proj = ds.select_columns([order_col, val_col])
    except Exception:
        pass

    def bucket_partial(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table({"b": pa.array([], pa.int64()), "s": pa.array([], pa.int64())})
        v, _ = _vals(block)
        b = np.floor_divide(_order(block), bw)
        order = np.argsort(b, kind="stable")
        starts, _lens = S.segments(b[order])
        return pa.table({
            "b": pa.array(b[order][starts]),
            "s": pa.array(np.add.reduceat(v[order], starts)),
        })

    bucket_partial.__name__ = "cumsum_bucket_partial"
    if levels == 2:
        from kamae_ray.base import dataset_schema
        from kamae_ray.stages.window import _NamedFn, sorted_block_apply

        sw = np.int64(super_width)
        schema = dataset_schema(ds)
        names = list(schema.names)
        types = {f.name: f.type for f in schema}
        is_int_val = pa.types.is_integer(types[val_col])
        base_t = pa.int64() if is_int_val else pa.float64()
        _BKT, _BASE, _SD = "__kr_bucket", "__kr_base", "__kr_cside"

        # (b, s) partials as a MATERIALIZED Dataset — spillable, never a
        # driver list; one upstream execution, reused by both sub-passes
        parts_ds = proj.map_batches(
            bucket_partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ).materialize()

        def sb_partial(block: pa.Table) -> pa.Table:
            if block.num_rows == 0 or "b" not in block.column_names:
                return pa.table({"sb": pa.array([], pa.int64()), "s": pa.array([], pa.int64())})
            b = block.column("b").to_numpy(zero_copy_only=False)
            s = block.column("s").to_numpy(zero_copy_only=False)
            sb = np.floor_divide(b, sw)
            order = np.argsort(sb, kind="stable")
            starts, _l = S.segments(sb[order])
            return pa.table({"sb": pa.array(sb[order][starts]),
                             "s": pa.array(np.add.reduceat(s[order], starts))})

        sb_partial.__name__ = "cumsum_super_partial"
        from kamae_ray.base import collect_tables

        sparts = collect_tables(
            parts_ds.map_batches(sb_partial, batch_format="pyarrow",
                                 zero_copy_batch=True, batch_size=None)
        )
        sparts = [p for p in sparts if "sb" in p.column_names]
        if sparts:
            st = pa.concat_tables(sparts, promote_options="permissive")
            sb_all = st.column("sb").to_numpy(zero_copy_only=False)
            ss_all = st.column("s").to_numpy(zero_copy_only=False)
            order = np.argsort(sb_all, kind="stable")
            starts, _l = S.segments(sb_all[order])
            sbs = sb_all[order][starts]
            ssum = np.add.reduceat(ss_all[order], starts)
            sb_bases = np.concatenate((np.zeros(1, ssum.dtype), np.cumsum(ssum)[:-1]))
        else:
            sbs = np.zeros(0, np.int64)
            sb_bases = np.zeros(0, np.int64)
        sb_ref = ray.put((sbs, sb_bases))  # O(superbuckets) — the ONLY driver state

        def add_sb(block: pa.Table) -> pa.Table:
            if block.num_rows == 0 or "b" not in block.column_names:
                return pa.table({"b": pa.array([], pa.int64()), "s": pa.array([], pa.int64()),
                                 "sb": pa.array([], pa.int64())})
            b = block.column("b").to_numpy(zero_copy_only=False)
            return block.append_column("sb", pa.array(np.floor_divide(b, sw)))

        def bucket_bases(block: pa.Table) -> pa.Table:
            # block holds WHOLE superbuckets (sort key == sb): merge each
            # bucket's partial sums, exclusive-prefix them within the
            # superbucket, add the driver superbucket base
            if block.num_rows == 0:
                return pa.table({"b": pa.array([], pa.int64()), "base": pa.array([], base_t)})
            b = block.column("b").to_numpy(zero_copy_only=False)
            s = block.column("s").to_numpy(zero_copy_only=False)
            order = np.argsort(b, kind="stable")
            starts, lens = S.segments(b[order])
            b_u = b[order][starts]
            bsum = np.add.reduceat(s[order], starts)
            sb_u = np.floor_divide(b_u, sw)
            sstarts, slens = S.segments(sb_u)
            cum = np.cumsum(bsum)
            seg0 = cum[sstarts] - bsum[sstarts]
            pre = cum - bsum - np.repeat(seg0, slens)
            bks, bbs = ray.get(sb_ref)
            base = pre + bbs[np.searchsorted(bks, sb_u)]
            return pa.table({"b": pa.array(b_u), "base": pc.cast(pa.array(base), base_t, safe=False)})

        bases_ds = sorted_block_apply(
            parts_ds.map_batches(_NamedFn(add_sb, "cumsum_add_sb"), batch_format="pyarrow",
                                 zero_copy_batch=True, batch_size=None),
            ["sb"], bucket_bases, "cumsum_bucket_bases",
        )

        def prep_data(block: pa.Table) -> pa.Table:
            n = block.num_rows
            cols = {c: block.column(c) for c in names}
            cols[_BKT] = pa.array(np.floor_divide(_order(block), bw)) if n else pa.array([], pa.int64())
            cols[_BASE] = pa.nulls(n, base_t)
            cols[_SD] = pa.array(np.zeros(n, np.int8))
            return pa.table(cols)

        def prep_base(block: pa.Table) -> pa.Table:
            n = block.num_rows
            cols = {c: pa.nulls(n, types[c]) for c in names}
            cols[_BKT] = block.column("b") if n else pa.array([], pa.int64())
            cols[_BASE] = block.column("base") if n else pa.array([], base_t)
            cols[_SD] = pa.array(np.ones(n, np.int8))
            return pa.table(cols)

        dt = ds.map_batches(_NamedFn(prep_data, "cumsum_prep_data"), batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=None)
        bt = bases_ds.map_batches(_NamedFn(prep_base, "cumsum_prep_base"), batch_format="pyarrow",
                                  zero_copy_batch=True, batch_size=None)

        def kern2(block: pa.Table) -> pa.Table:
            meta = [_BKT, _BASE, _SD]
            side = block.column(_SD).to_numpy(zero_copy_only=False) if block.num_rows else np.zeros(0, np.int8)
            data = block.filter(pa.array(side == 0)).drop_columns([_BASE, _SD])
            if data.num_rows == 0:
                return data.drop_columns([_BKT]).append_column(out_col, pa.array([], base_t))
            baser = block.filter(pa.array(side == 1))
            bb = baser.column(_BKT).to_numpy(zero_copy_only=False)
            bv = baser.column(_BASE).to_numpy(zero_copy_only=False)
            border = np.argsort(bb, kind="stable")
            bb, bv = bb[border], bv[border]
            v, is_int = _vals(data)
            o = _order(data)
            b = data.column(_BKT).to_numpy(zero_copy_only=False)
            idx = np.lexsort((o, b))
            bs, vs = b[idx], v[idx]
            starts, lens = S.segments(bs)
            cs = np.cumsum(vs)
            seg0 = cs[starts] - vs[starts]
            pre = cs - np.repeat(seg0, lens)
            if exclusive:
                pre = pre - vs
            base = bv[np.searchsorted(bb, bs[starts])]
            pre = pre + np.repeat(base, lens)
            out = pre.astype(np.int64) if is_int else pre.astype(np.float64)
            return data.take(pa.array(idx)).drop_columns([_BKT]).append_column(out_col, pa.array(out))

        return sorted_block_apply(dt.union(bt), [_BKT], kern2, "cumsum_finalize2")

    from kamae_ray.base import collect_tables

    parts = collect_tables(
        proj.map_batches(bucket_partial, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None)
    )
    parts = [p for p in parts if "b" in p.column_names]  # Ray may emit schema-less empties
    if parts:
        part_tbl = pa.concat_tables(
            parts,
            promote_options="permissive",  # empty blocks emit int64 's'; float inputs double
        )
        b_all = part_tbl.column("b").to_numpy(zero_copy_only=False)
        s_all = part_tbl.column("s").to_numpy(zero_copy_only=False)
    else:
        b_all = np.zeros(0, np.int64)
        s_all = np.zeros(0, np.int64)
    order = np.argsort(b_all, kind="stable")
    if len(b_all):
        starts, _lens = S.segments(b_all[order])
        buckets = b_all[order][starts]
        sums = np.add.reduceat(s_all[order], starts)
        bases = np.concatenate((np.zeros(1, sums.dtype), np.cumsum(sums)[:-1]))
    else:
        buckets = np.zeros(0, np.int64)
        bases = np.zeros(0, np.int64)
    base_ref = ray.put((buckets, bases))

    def add_bucket(block: pa.Table) -> pa.Table:
        return block.append_column("__kr_bucket", pa.array(np.floor_divide(_order(block), bw)))

    add_bucket.__name__ = "cumsum_bucket_col"
    with_b = ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    def kern(block: pa.Table) -> pa.Table:
        block = block.drop_columns(["__kr_bucket"])
        if block.num_rows == 0:
            return block.append_column(out_col, pa.array([], pa.int64()))
        bks, bss = ray.get(base_ref)
        v, is_int = _vals(block)
        o = _order(block)
        b = np.floor_divide(o, bw)
        idx = np.lexsort((o, b))
        bs, vs = b[idx], v[idx]
        starts, lens = S.segments(bs)
        cs = np.cumsum(vs)
        seg0 = cs[starts] - vs[starts]
        pre = cs - np.repeat(seg0, lens)
        if exclusive:
            pre = pre - vs
        base = bss[np.searchsorted(bks, bs[starts])]
        pre = pre + np.repeat(base, lens)
        out = pre.astype(np.int64) if is_int else pre.astype(np.float64)
        return block.take(pa.array(idx)).append_column(out_col, pa.array(out))

    from kamae_ray.stages.window import sorted_block_apply

    return sorted_block_apply(with_b, ["__kr_bucket"], kern, "cumsum_finalize")


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


def quantile_per_group(ds, keys, col: str, qs, out_prefix: str | None = None,
                       method: str = "cont"):
    """Exact quantiles of ``col`` per ``keys`` tuple — SQL
    ``quantile_cont(col, q)`` (``method='cont'``, linear interpolation) or
    ``quantile_disc`` / ``percentile_disc`` (``method='disc'``: the smallest
    actual value whose cumulative fraction >= q). Nulls ignored; empty
    group -> null. Output: key columns + ``{prefix}_p{round(q*100)}``.

    Exact quantiles are not mergeable from per-block partials, so the plan
    is ONE sort-shuffle of the PROJECTED (keys, col) columns — never the
    full row — then a fully vectorized segmented kernel: one in-block
    lexsort, per-group non-null counts via reduceat, and a gather-interpolate
    with no per-group Python loop."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    if method not in ("cont", "disc"):
        raise ValueError("method must be cont|disc")
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
            if method == "disc":
                # smallest value with cumulative fraction >= q: ceil(q*m)-1
                k = np.maximum(np.ceil(q * m).astype(np.int64) - 1, 0)
                res = v[starts + np.minimum(k, np.maximum(m - 1, 0))]
            else:
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


def weighted_quantile_per_group(ds, keys, value_col: str, weight_col: str,
                                q_ppm: int = 500_000, output_col: str | None = None):
    """Exact WEIGHTED quantile of ``value_col`` per group — the smallest
    actual value ``v`` whose cumulative weight (ties/peers included, SQL
    RANGE-frame semantics) satisfies the EXACT integer rule

        ``1_000_000 * cumw(v) >= q_ppm * totw``

    i.e. the weighted ``q_ppm/1e6``-quantile (500000 = the weighted
    median). Weights must be non-negative integers (exact int64 sums —
    order-free, no float accumulation anywhere; the rule is a pure integer
    comparison so it mirrors bit-exactly in SQL:

        ``SELECT g, MIN(v) FROM (... SUM(w) OVER (PARTITION BY g ORDER BY
        v) AS cw ...) JOIN tot USING (g) WHERE 1000000*cw >= q_ppm*tw``

    ). The selected value is an actual data value gathered type-preserving
    (no float round-trip). Rows with NULL value or NULL weight are excluded
    (mirror with WHERE on both). Output: key columns + the selected value
    (``output_col``, default ``{value_col}_wq``) + ``{weight_col}_total``.

    Scale plan: ONE sort-shuffle of the PROJECTED (keys, value, weight)
    columns, then a fully vectorized segmented kernel (lexsort + segmented
    cumsum + run-end peer fold + one minimum.reduceat) — no per-group
    Python loop."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    if not (0 < q_ppm <= 1_000_000):
        raise ValueError("q_ppm must be in (0, 1000000]")
    out_name = output_col or f"{value_col}_wq"

    def kern(block: pa.Table) -> pa.Table:
        varr = A.as_array(block.column(value_col))
        warr = A.as_array(block.column(weight_col))
        keep = pc.and_(pc.is_valid(varr), pc.is_valid(warr))
        block = block.filter(keep)
        if block.num_rows == 0:
            out = {kc: A.as_array(block.column(kc)) for kc in keys}
            out[out_name] = A.as_array(block.column(value_col))
            out[f"{weight_col}_total"] = pa.array([], pa.int64())
            return pa.table(out)
        varr = A.as_array(block.column(value_col))
        gids = S.group_ids(block, keys)
        v = pc.cast(varr, pa.float64(), safe=False).to_numpy(zero_copy_only=False)
        w = pc.cast(A.as_array(block.column(weight_col)), pa.int64(),
                    safe=False).to_numpy(zero_copy_only=False)
        if w.min() < 0:
            raise ValueError("weighted_quantile_per_group weights must be >= 0")
        order = np.lexsort((v, gids))
        gs, vs, ws = gids[order], v[order], w[order]
        n = len(gs)
        starts, lens = S.segments(gs)
        cum = np.cumsum(ws)
        base = cum[starts] - ws[starts]
        cum_in = cum - np.repeat(base, lens)
        tw = np.add.reduceat(ws, starts)
        if int(tw.max()) >= 2**63 // 1_000_000:
            raise ValueError(
                "weighted_quantile_per_group group weight exceeds the exact "
                "int64 rule range (2^63 / 1e6) — rescale weights")
        new_run = np.ones(n, bool)
        new_run[1:] = (gs[1:] != gs[:-1]) | (vs[1:] != vs[:-1])
        run_id = np.cumsum(new_run) - 1
        last_mask = np.r_[new_run[1:], True]
        run_last_cum = cum_in[last_mask]
        peer_cum = run_last_cum[run_id]
        elig = 1_000_000 * peer_cum >= q_ppm * np.repeat(tw, lens)
        cand = np.where(elig, np.arange(n, dtype=np.int64), n)
        first = np.minimum.reduceat(cand, starts)
        orig = order[first]
        take = pa.array(orig)
        out = {kc: A.as_array(block.column(kc)).take(take) for kc in keys}
        out[out_name] = varr.take(take)
        out[f"{weight_col}_total"] = pa.array(tw, pa.int64())
        return pa.table(out)

    if isinstance(ds, pa.Table):
        return kern(ds)
    proj = ds
    try:
        proj = ds.select_columns(list(dict.fromkeys(keys + [value_col, weight_col])))
    except Exception:
        pass
    from kamae_ray.stages.window import sorted_block_apply

    return sorted_block_apply(proj, keys, kern, "weighted_group_quantile")


def _dedup_block_all(block: pa.Table, cols: list[str]) -> pa.Table:
    if block.num_rows == 0:
        return block
    gids = S.group_ids(block, cols)
    order = np.argsort(gids, kind="stable")
    starts, _l = S.segments(gids[order])
    return block.take(pa.array(order[starts]))


def _set_op(left, right, mode: str):
    """SQL ``EXCEPT`` / ``INTERSECT`` (set semantics, both sides deduped).

    Unlike joins, SQL set ops compare rows with IS NOT DISTINCT FROM — NULLs
    equal each other — which is exactly this engine's factorize semantics
    (``group_ids`` treats null as its own value), so the plan is the distinct
    plan with a side tag: per-block dedup on both sides (combiner), one
    sort-shuffle on all columns co-locates equal tuples, and the block kernel
    emits one representative per tuple present on the qualifying sides.

    Right columns are matched to the left's BY POSITION (SQL union
    compatibility)."""
    from kamae_ray.base import dataset_schema

    l_schema = dataset_schema(left)
    cols = list(l_schema.names)
    _SIDE = "__kr_setside"

    def prep(batch: pa.Table, side: int) -> pa.Table:
        if side == 1:
            batch = batch.rename_columns(cols)
        batch = _dedup_block_all(batch.select(cols), cols)
        return batch.append_column(
            _SIDE, pa.array(np.full(batch.num_rows, side, dtype=np.int8))
        )

    def finalize(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return block.drop_columns([_SIDE])
        gids = S.group_ids(block, cols)
        side = block.column(_SIDE).to_numpy(zero_copy_only=False)
        order = np.argsort(gids, kind="stable")
        starts, lens = S.segments(gids[order])
        s_sorted = side[order]
        has_r = np.add.reduceat(s_sorted.astype(np.int64), starts) > 0
        has_l = np.add.reduceat((s_sorted == 0).astype(np.int64), starts) > 0
        keep = (has_l & ~has_r) if mode == "except" else (has_l & has_r)
        # representative: the first LEFT row of each kept segment (sides are
        # interleaved arbitrarily; any row has identical key columns)
        firsts = order[starts[keep]]
        return block.take(pa.array(firsts)).drop_columns([_SIDE])

    finalize.__name__ = f"{mode}_finalize"
    if isinstance(left, pa.Table) and isinstance(right, pa.Table):
        both = pa.concat_tables([prep(left, 0), prep(right, 1)])
        return finalize(both)
    import ray  # noqa: F401
    from kamae_ray.stages.window import _NamedFn, sorted_block_apply

    if isinstance(left, pa.Table):
        left = ray.data.from_arrow(left)
    if isinstance(right, pa.Table):
        right = ray.data.from_arrow(right)
    lt = left.map_batches(_NamedFn(lambda b: prep(b, 0), f"{mode}_prep_left"),
                          batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    rt = right.map_batches(_NamedFn(lambda b: prep(b, 1), f"{mode}_prep_right"),
                           batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    return sorted_block_apply(lt.union(rt), cols, finalize, f"{mode}_finalize")


def except_distinct(left, right):
    """SQL ``left EXCEPT right``: distinct left tuples absent from right
    (NULLs compare equal, set semantics)."""
    return _set_op(left, right, "except")


def intersect_distinct(left, right):
    """SQL ``left INTERSECT right``: distinct tuples present on both sides
    (NULLs compare equal, set semantics)."""
    return _set_op(left, right, "intersect")


def groupby_collect(ds, keys: str | list[str], col: str,
                    order_col: str | None = None, out_col: str | None = None):
    """SQL ``list(col ORDER BY order_col) GROUP BY keys`` (Spark
    ``collect_list`` + ``sort_array``): one row per key tuple with the
    group's values gathered into a list column, ordered by ``order_col``
    (nulls last, SQL default; omit for arbitrary arrival order — like SQL,
    only a unique order key makes the result deterministic). Null values are
    KEPT in the list (DuckDB ``list()`` semantics).

    Scale plan: ONE sort-shuffle on ``keys`` co-locates each group, then a
    block kernel lexsorts and slices the values array into list offsets —
    no per-group Python, no driver merge. A single key's list must fit in a
    block (same contract as every listwise/window op)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    out_col = out_col or f"{col}_list"

    def kern(block: pa.Table) -> pa.Table:
        vals_all = A.as_array(block.column(col))
        if block.num_rows == 0:
            out = {k: block.column(k) for k in keys}
            out[out_col] = pa.array([], pa.list_(vals_all.type))
            return pa.table(out)
        gids = S.group_ids(block, keys)
        if order_col is not None:
            from kamae_ray.stages.window import _time_to_numeric

            o, omask = A.to_numpy(pc.cast(
                _time_to_numeric(A.as_array(block.column(order_col))), pa.float64(), safe=False))
            o = o.astype(np.float64, copy=True)
            if omask is not None:
                o[omask] = np.inf  # SQL ORDER BY ASC: NULLS LAST
            order = np.lexsort((o, gids))
        else:
            order = np.argsort(gids, kind="stable")
        starts, lens = S.segments(gids[order])
        firsts = order[starts]
        vals = vals_all.take(pa.array(order))
        offsets = pa.array(np.concatenate([[0], np.cumsum(lens)]).astype(np.int32))
        out = {k: A.as_array(block.column(k)).take(pa.array(firsts)) for k in keys}
        out[out_col] = pa.ListArray.from_arrays(offsets, vals)
        return pa.table(out)

    kern.__name__ = "groupby_collect"
    if isinstance(ds, pa.Table):
        return kern(ds)
    proj = ds
    try:
        proj = ds.select_columns(list(dict.fromkeys(keys + [col] + ([order_col] if order_col else []))))
    except Exception:
        pass
    from kamae_ray.stages.window import sorted_block_apply

    return sorted_block_apply(proj, keys, kern, "groupby_collect")


def groupby_corr(ds, keys: str | list[str], x: str, y: str, regression: bool = False):
    """Per-group Pearson correlation + covariance of two columns — SQL
    ``corr(x, y)``, ``covar_pop``, ``covar_samp`` GROUP BY keys.

    ``regression=True`` adds the simple-OLS columns from the same partials:
    ``slope`` (= cov/var(x), SQL regr_slope(y, x)), ``intercept``
    (regr_intercept) and ``r2`` (regr_r2, Postgres edge rules: NULL when
    var(x)=0; 1.0 when var(y)=0 but var(x)>0).

    Rows where EITHER value is null are excluded (SQL pair semantics).
    Outputs: keys + ``n`` (pair count), ``corr`` (NULL when n < 2 or either
    variance is 0 — SQL), ``covar_pop`` (NULL when n = 0), ``covar_samp``
    (NULL when n < 2). Correlation is scale-free, so the population moments
    used here equal SQL's sample-based definition exactly (the n/(n-1)
    factors cancel).

    Same partial-agg plan as groupby_agg: per-block (n, sx, sy, sxx, syy,
    sxy) partials — all six merge by addition — then one small sort-shuffle
    + block finalize; never a driver merge."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    P = ("n", "sx", "sy", "sxx", "syy", "sxy")

    def _xy(block: pa.Table):
        xv, xm = A.to_numpy(pc.cast(A.as_array(block.column(x)), pa.float64(), safe=False))
        yv, ym = A.to_numpy(pc.cast(A.as_array(block.column(y)), pa.float64(), safe=False))
        xv = xv.astype(np.float64, copy=True)
        yv = yv.astype(np.float64, copy=True)
        if xm is not None:
            xv[xm] = np.nan
        if ym is not None:
            yv[ym] = np.nan
        ok = ~(np.isnan(xv) | np.isnan(yv))
        return np.where(ok, xv, 0.0), np.where(ok, yv, 0.0), ok

    def partial(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            cols = {k: block.column(k) for k in keys}
            cols.update({f"__p_{p}": pa.array([], pa.float64()) for p in P})
            return pa.table(cols)
        gids = S.group_ids(block, keys)
        order = np.argsort(gids, kind="stable")
        starts, _ = S.segments(gids[order])
        firsts = order[starts]
        xv, yv, ok = _xy(block)
        xv, yv, okf = xv[order], yv[order], ok[order].astype(np.float64)
        cols = {k: A.as_array(block.column(k)).take(pa.array(firsts)) for k in keys}
        for p, v in zip(P, (okf, xv, yv, xv * xv, yv * yv, xv * yv)):
            cols[f"__p_{p}"] = pa.array(np.add.reduceat(v, starts))
        return pa.table(cols)

    partial.__name__ = "corr_partial"

    def finalize(partials: pa.Table) -> pa.Table:
        if partials.num_rows == 0:
            cols = {k: partials.column(k) for k in keys}
            cols.update({"n": pa.array([], pa.int64())})
            extra = ("slope", "intercept", "r2") if regression else ()
            for c in ("corr", "covar_pop", "covar_samp", *extra):
                cols[c] = pa.array([], pa.float64())
            return pa.table(cols)
        gids = S.group_ids(partials, keys)
        order = np.argsort(gids, kind="stable")
        starts, _ = S.segments(gids[order])
        firsts = order[starts]
        m = {
            p: np.add.reduceat(
                partials.column(f"__p_{p}").to_numpy(zero_copy_only=False)[order], starts
            )
            for p in P
        }
        n = m["n"]
        safe = np.where(n == 0, 1, n)
        mx, my = m["sx"] / safe, m["sy"] / safe
        cov = m["sxy"] / safe - mx * my
        vx = np.clip(m["sxx"] / safe - mx * mx, 0, None)
        vy = np.clip(m["syy"] / safe - my * my, 0, None)
        denom = np.sqrt(vx * vy)
        with np.errstate(invalid="ignore", divide="ignore"):
            r = np.where((n >= 2) & (denom > 0), cov / np.where(denom == 0, 1, denom), np.nan)
            csamp = np.where(n >= 2, cov * n / np.where(n < 2, 1, n - 1), np.nan)
        out = {k: A.as_array(partials.column(k)).take(pa.array(firsts)) for k in keys}
        out["n"] = pa.array(n.astype(np.int64))
        out["corr"] = pa.array(np.clip(r, -1.0, 1.0))
        out["covar_pop"] = pa.array(np.where(n > 0, cov, np.nan))
        out["covar_samp"] = pa.array(csamp)
        if regression:
            with np.errstate(invalid="ignore", divide="ignore"):
                slope = np.where((n > 0) & (vx > 0), cov / np.where(vx == 0, 1, vx), np.nan)
                intercept = np.where(np.isnan(slope), np.nan, my - slope * mx)
                r2 = np.where(
                    (n > 0) & (vx > 0),
                    np.where(vy > 0, np.clip(r, -1.0, 1.0) ** 2, 1.0),
                    np.nan,
                )
            out["slope"] = pa.array(slope)
            out["intercept"] = pa.array(intercept)
            out["r2"] = pa.array(r2)
        return pa.table(out)

    if isinstance(ds, pa.Table):
        return finalize(partial(ds))
    proj = ds
    try:
        proj = ds.select_columns(list(dict.fromkeys(keys + [x, y])))
    except Exception:
        pass
    parts = proj.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                             batch_size=None)
    from kamae_ray.stages.window import sorted_block_apply

    return sorted_block_apply(parts, keys, finalize, "corr_finalize")


def groupby_mode(ds, keys: str | list[str], col: str):
    """SQL-style MODE per group: the most frequent NON-NULL value of ``col``
    per ``keys`` tuple, ties broken by the smallest value (deterministic —
    ``ROW_NUMBER() OVER (... ORDER BY count DESC, value ASC) = 1``, unlike
    SQL's unspecified ``mode()`` tie).

    Plan: (keys, col) frequency via groupby_agg's partial-agg shuffle, then
    ``topk_per_group(k=1)`` — the second exchange carries at most one row
    per (block, keys) after the partial head. Output: keys + ``{col}_mode``
    + ``{col}_mode_count``."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def prep(block: pa.Table) -> pa.Table:
        # drop nulls; count a ones column (the value column itself may be a
        # string — groupby_agg's moment kernel is numeric-only)
        block = block.filter(pc.is_valid(A.as_array(block.column(col))))
        return block.append_column("__kr_one", pa.array(np.ones(block.num_rows, np.int64)))

    prep.__name__ = "mode_prep"
    src = prep(ds) if isinstance(ds, pa.Table) else ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    counts = groupby_agg(src, keys + [col], {"__kr_one": ["count"]})
    top = topk_per_group(counts, keys, "__kr_one_count", 1, descending=True, tiebreak=[col])

    def finish(block: pa.Table) -> pa.Table:
        out = {k: block.column(k) for k in keys}
        out[f"{col}_mode"] = block.column(col)
        out[f"{col}_mode_count"] = pc.cast(block.column("__kr_one_count"), pa.int64())
        return pa.table(out)

    finish.__name__ = "mode_finish"
    if isinstance(top, pa.Table):
        return finish(top)
    return top.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=None)


def histogram(ds, col: str, bins: int, lo: float, hi: float):
    """Fixed-width histogram of ``col`` over ``[lo, hi]``: one row per
    non-empty bin, ``bin = min(floor((v - lo) / w), bins - 1)`` with
    ``w = (hi - lo) / bins`` (the conventional right-closed last bin).
    Values outside [lo, hi] and nulls are dropped. The bin expression is
    evaluated identically in SQL, so counts are exactly reproducible.

    Scale plan: one ``np.bincount`` per block (the combiner — at most
    ``bins`` rows leave each block), then the partial-agg groupby sums the
    tiny (bin, n) table. Explicit ``lo``/``hi`` keep it a single pass; feed
    them from ``profile_columns`` / ``exact_quantiles`` when unknown."""
    if bins <= 0 or not hi > lo:
        raise ValueError("need bins > 0 and hi > lo")
    w = (hi - lo) / bins

    def kern(block: pa.Table) -> pa.Table:
        v, mask = A.to_numpy(pc.cast(A.as_array(block.column(col)), pa.float64(), safe=False))
        v = v.astype(np.float64, copy=True)
        if mask is not None:
            v[mask] = np.nan
        ok = ~np.isnan(v) & (v >= lo) & (v <= hi)
        b = np.minimum(np.floor((v[ok] - lo) / w).astype(np.int64), bins - 1)
        counts = np.bincount(b, minlength=bins)
        nz = np.flatnonzero(counts)
        return pa.table({
            "bin": pa.array(nz.astype(np.int64)),
            "n": pa.array(counts[nz].astype(np.int64)),
        })

    kern.__name__ = "hist_partial"
    if isinstance(ds, pa.Table):
        cells = kern(ds)
    else:
        proj = ds
        try:
            proj = ds.select_columns([col])
        except Exception:
            pass
        cells = proj.map_batches(kern, batch_format="pyarrow", zero_copy_batch=True,
                                 batch_size=None)
    agg = groupby_agg(cells, "bin", {"n": ["sum"]})

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "bin": b.column("bin"),
            "n_rows": pc.cast(b.column("n_sum"), pa.int64(), safe=False),
        })

    finish.__name__ = "hist_finish"
    if isinstance(agg, pa.Table):
        return finish(agg)
    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=None)


def cooccurrence_counts(ds, group_col: str, item_col: str,
                        max_group_size: int = 10_000):
    """Item co-occurrence (market-basket) counts: for every unordered item
    pair inside one group (order/basket/document), count the co-occurrences
    across all groups — SQL
    ``FROM t a JOIN t b ON a.g = b.g AND a.item < b.item GROUP BY pair``
    (duplicate occurrences multiply, exactly like the self-join).

    Scale plan: ONE sort-shuffle on the group key; per block a vectorized
    pair enumeration over each group segment (items pre-sorted, so pairs
    come out with a < b for free), then per-block partial pair counts —
    the final exchange carries only (item_a, item_b, n) cells. Pair
    emission is quadratic in group size BY DEFINITION; groups larger than
    ``max_group_size`` raise rather than OOM (pre-cap baskets upstream)."""

    def kern(block: pa.Table) -> pa.Table:
        empty = pa.table({
            "item_a": pa.array([], pa.int64()),
            "item_b": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        })
        if block.num_rows == 0:
            return empty
        items = pc.cast(A.as_array(block.column(item_col)), pa.int64(), safe=False)
        if items.null_count:
            # SQL parity: NULL never satisfies a.item < b.item — and a null
            # would otherwise poison the int64 numpy view (NaN/float64 flip)
            keep = pc.is_valid(items)
            block = block.filter(keep)
            items = items.filter(keep)
            if block.num_rows == 0:
                return empty
        iv = items.to_numpy(zero_copy_only=False)
        gids = S.group_ids(block, [group_col])
        order = np.lexsort((iv, gids))
        gs, its = gids[order], iv[order]
        starts, lens = S.segments(gs)
        if lens.max(initial=0) > max_group_size:
            raise ValueError(
                f"cooccurrence group larger than max_group_size={max_group_size} "
                "— pair fan-out is quadratic; cap the basket upstream"
            )
        rem = (np.arange(len(gs)) - np.repeat(starts, lens))  # position in segment
        rem = np.repeat(lens, lens) - rem - 1                 # pairs AFTER each row
        total = int(rem.sum())
        if total == 0:
            return empty
        a_pos = np.repeat(np.arange(len(gs)), rem)
        off = np.arange(total) - np.repeat(np.cumsum(rem) - rem, rem)
        b_pos = a_pos + 1 + off
        ia, ib = its[a_pos], its[b_pos]
        ok = ia != ib  # SQL a.item < b.item excludes equal items
        ia, ib = ia[ok], ib[ok]
        if not len(ia):
            return empty
        order2 = np.lexsort((ib, ia))
        a_s, b_s = ia[order2], ib[order2]
        new = np.ones(len(a_s), dtype=bool)
        new[1:] = (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])
        idx = np.flatnonzero(new)
        counts = np.diff(np.append(idx, len(a_s)))
        return pa.table({
            "item_a": pa.array(a_s[idx]),
            "item_b": pa.array(b_s[idx]),
            "n": pa.array(counts.astype(np.int64)),
        })

    kern.__name__ = "cooccur_partial"
    if isinstance(ds, pa.Table):
        cells = kern(ds)
    else:
        from kamae_ray.stages.window import sorted_block_apply

        proj = ds
        try:
            proj = ds.select_columns(list(dict.fromkeys([group_col, item_col])))
        except Exception:
            pass
        cells = sorted_block_apply(proj, [group_col], kern, "cooccur_cells")
    agg = groupby_agg(cells, ["item_a", "item_b"], {"n": ["sum"]})

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "item_a": b.column("item_a"),
            "item_b": b.column("item_b"),
            "n": pc.cast(b.column("n_sum"), pa.int64(), safe=False),
        })

    finish.__name__ = "cooccur_finish"
    if isinstance(agg, pa.Table):
        return finish(agg)
    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def robust_outliers(ds, keys, col: str, k: float = 3.0,
                    max_groups: int = 2_000_000):
    """Per-group robust outlier flags via MAD (median absolute deviation):
    a row is an outlier when ``|v - median(group)| > k * MAD(group)`` with
    ``MAD = median(|v - median|)`` — the classic data-quality screen that,
    unlike z-scores, is not itself corrupted by the outliers it hunts.

    Exactness: medians are exact ``quantile_cont`` (one interpolation op);
    the deviation, the multiply by ``k`` and the compare are each a single
    float64 op over identical inputs on both engines, so the flag is
    deterministic cross-engine (no accumulation order anywhere — the
    lesson-24 family). Null values: never outliers (flag null), excluded
    from both medians (SQL aggregate semantics).

    Scale plan: two ``quantile_per_group`` sort-shuffles over the PROJECTED
    (keys, value) columns; group-level tables (bounded by ``max_groups``,
    guarded) broadcast back via ``broadcast_join`` — no row-level shuffle
    joins. Output: input columns + ``grp_median, grp_mad, is_outlier``."""
    from kamae_ray.stages.join import broadcast_join

    keys = [keys] if isinstance(keys, str) else list(keys)

    def _small(d):
        if isinstance(d, pa.Table):
            out = d if d.num_rows else None
        else:
            from kamae_ray.base import collect_tables

            parts = [t for t in collect_tables(d) if t.num_rows]
            out = (pa.concat_tables(parts).combine_chunks() if parts
                   else None)
        if out is not None and out.num_rows > max_groups:
            raise ValueError(
                f"robust_outliers: {out.num_rows} groups > max_groups="
                f"{max_groups}; use a shuffle join for the merge at this "
                "group cardinality")
        return out

    med = _small(quantile_per_group(ds, keys, col, [0.5], out_prefix="__med",
                                    method="cont"))
    if med is None or med.num_rows == 0:
        empty_flag = pa.array([], pa.bool_())
        base = ds if isinstance(ds, pa.Table) else None
        if base is not None:
            return (base.append_column("grp_median", pa.array([], pa.float64()))
                    .append_column("grp_mad", pa.array([], pa.float64()))
                    .append_column("is_outlier", empty_flag))
        return ds
    med = med.rename_columns(
        [c if c != "__med_p50" else "grp_median" for c in med.column_names])
    joined = broadcast_join(ds, med, on=keys)

    def dev(block: pa.Table) -> pa.Table:
        v = pc.cast(block.column(col), pa.float64(), safe=False)
        m = block.column("grp_median")
        return block.append_column("__absdev", pc.abs(pc.subtract(v, m)))

    dev.__name__ = "mad_absdev"
    devd = (dev(joined) if isinstance(joined, pa.Table)
            else joined.map_batches(dev, batch_format="pyarrow",
                                    zero_copy_batch=True, batch_size=None))
    mad = _small(quantile_per_group(devd, keys, "__absdev",
                                    [0.5], out_prefix="__mad", method="cont"))
    mad = mad.rename_columns(
        [c if c != "__mad_p50" else "grp_mad" for c in mad.column_names])
    full = broadcast_join(devd, mad, on=keys)

    def flag(block: pa.Table) -> pa.Table:
        adev = block.column("__absdev")
        thr = pc.multiply(pc.cast(block.column("grp_mad"), pa.float64()),
                          pa.scalar(float(k), pa.float64()))
        return (block.drop_columns(["__absdev"])
                .append_column("is_outlier", pc.greater(adev, thr)))

    flag.__name__ = "mad_flag"
    if isinstance(full, pa.Table):
        return flag(full)
    return full.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True,
                            batch_size=None)


def groupby_skew_kurt(ds, keys: str | list[str], col: str,
                      max_partial_rows: int = 2_000_000):
    """Per-group population skewness and excess kurtosis of an INTEGER
    column, exact-integer end to end (the lesson-24 family): each block
    contributes (keys, n, S1..S4) int64 power-sum partials (segmented
    ``np.add.reduceat``, per-block overflow-guarded), the driver folds
    them in arbitrary-precision Python ints, and the only float ops are

    - ``skew_pop    = A / (B * sqrt(B))``,   A = n^2*S3 - 3n*S1*S2 + 2*S1^3
    - ``kurt_excess = C / (B * B) - 3``,     C = n^3*S4 - 4n^2*S1*S3
                                                 + 6n*S1^2*S2 - 3*S1^4
      with B = n*S2 - S1^2

    — a division, a correctly-rounded sqrt, and exact-rounded multiplies of
    integer-derived doubles, so the result is bit-identical to the same SQL
    expression over HUGEINT sums. Values must cast to int64 exactly (raises
    otherwise); nulls are skipped per SQL; zero-variance groups yield NULL.
    Driver fold is O(blocks x in-block keys), guarded by
    ``max_partial_rows`` — pre-bucket hot keys or raise the budget above.

    Returns ``(keys..., n, skew_pop, kurt_excess)`` sorted by key tuple."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def partial(block: pa.Table) -> pa.Table:
        v = block.column(col)
        valid = pc.is_valid(v)
        if not pc.all(valid).as_py():
            block = block.filter(valid)
        empty_cols = {k: A.as_array(block.column(k)).slice(0, 0) for k in keys}
        for c in ("n", "s1", "s2", "s3", "s4"):
            empty_cols[c] = pa.array([], pa.int64())
        if block.num_rows == 0:
            return pa.table(empty_cols)
        x = pc.cast(block.column(col), pa.int64()).to_numpy(zero_copy_only=False)
        mx = int(np.abs(x).max()) if len(x) else 0
        if mx and mx ** 4 * len(x) >= 1 << 62:
            raise ValueError(
                f"groupby_skew_kurt: |{col}| up to {mx} overflows int64 "
                "block partials — rescale the column first")
        gids = S.group_ids(block, keys)
        order = np.argsort(gids, kind="stable")
        xs = x[order]
        x2 = xs * xs
        starts, lens = S.segments(gids[order])
        firsts = order[starts]
        out = {k: A.as_array(block.column(k)).take(pa.array(firsts)) for k in keys}
        out["n"] = pa.array(lens.astype(np.int64))
        out["s1"] = pa.array(np.add.reduceat(xs, starts))
        out["s2"] = pa.array(np.add.reduceat(x2, starts))
        out["s3"] = pa.array(np.add.reduceat(x2 * xs, starts))
        out["s4"] = pa.array(np.add.reduceat(x2 * x2, starts))
        return pa.table(out)

    partial.__name__ = "skew_kurt_partial"
    if isinstance(ds, pa.Table):
        parts = partial(ds)
    else:
        proj = ds
        try:
            proj = ds.select_columns(list(dict.fromkeys(keys + [col])))
        except Exception:
            pass
        from kamae_ray.base import collect_tables

        tbls = [t for t in collect_tables(
            proj.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                             batch_size=None)) if t.num_rows]
        parts = pa.concat_tables(tbls) if tbls else partial(
            pa.table({k: pa.array([], pa.string()) for k in keys}
                     | {col: pa.array([], pa.int64())}))
    if parts.num_rows > max_partial_rows:
        raise ValueError(
            f"groupby_skew_kurt: {parts.num_rows} partial rows > "
            f"max_partial_rows={max_partial_rows}; pre-bucket the key or "
            "raise the budget")
    # arbitrary-precision driver fold: exact at any group size/magnitude
    import math

    acc: dict[tuple, list[int]] = {}
    key_rows = list(zip(*[parts.column(k).to_pylist() for k in keys])) \
        if parts.num_rows else []
    cols = [parts.column(c).to_pylist() for c in ("n", "s1", "s2", "s3", "s4")]
    for i, kt in enumerate(key_rows):
        a = acc.setdefault(kt, [0, 0, 0, 0, 0])
        for j in range(5):
            a[j] += cols[j][i]
    out_keys = sorted(acc, key=repr)
    skews, kurts, ns = [], [], []
    for kt in out_keys:
        n, s1, s2, s3, s4 = acc[kt]
        ns.append(n)
        B = n * s2 - s1 * s1
        if B <= 0:
            skews.append(None)
            kurts.append(None)
            continue
        A_ = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 ** 3
        C_ = n ** 3 * s4 - 4 * n * n * s1 * s3 + 6 * n * s1 * s1 * s2 - 3 * s1 ** 4
        fb = float(B)
        skews.append(float(A_) / (fb * math.sqrt(fb)))
        kurts.append(float(C_) / (fb * fb) - 3.0)
    out = {k: pa.array([kt[i] for kt in out_keys],
                       A.as_array(parts.column(k)).type)
           for i, k in enumerate(keys)}
    out["n"] = pa.array(ns, pa.int64())
    out["skew_pop"] = pa.array(skews, pa.float64())
    out["kurt_excess"] = pa.array(kurts, pa.float64())
    return pa.table(out)


def global_percent_rank(ds, value_col: str, id_col: str, n_rows: int | None = None,
                        max_value: int = 1 << 27, max_id: int = 1 << 32,
                        rank_col: str = "rank", out_col: str = "percent_rank"):
    """Dataset-wide rank + quantile-uniform transform of an integer column —
    the GLOBAL twin of the windowed ``percent_rank`` (sklearn
    QuantileTransformer(output_distribution="uniform") with a deterministic
    ROW_NUMBER tie-break): every row gets its 0-based position under
    ``ORDER BY value, id`` and ``percent_rank = rank / (n-1)`` (ONE double
    division of exact ints; 0.0 when n == 1).

    Scale plan (no global serial scan): the rank is ``global_cumsum(ones)``
    over the composite int64 order key ``value * max_id + id`` with
    ``bucket_width = max_id`` — the cumsum bucket id IS the value, so the
    driver's bucket prefix is O(distinct values), corpus-size-independent.
    Requires integer values in [0, ``max_value``) and unique non-null
    integer ids in [0, ``max_id``) (both raise per block); ``n_rows`` skips
    the count pass when the caller already knows it (fresh parquet reads
    answer ``count()`` from footer metadata)."""
    mw, mi = np.int64(max_value), np.int64(max_id)
    if int(mw) * int(mi) >= 1 << 63:
        raise ValueError("max_value * max_id must fit int64")

    def add_key(block: pa.Table) -> pa.Table:
        v = pc.cast(block.column(value_col), pa.int64()).to_numpy(zero_copy_only=False)
        i = pc.cast(block.column(id_col), pa.int64()).to_numpy(zero_copy_only=False)
        if len(v) and (v.min() < 0 or v.max() >= mw):
            raise ValueError(f"values outside [0, {int(mw)}) — raise max_value")
        if len(i) and (i.min() < 0 or i.max() >= mi):
            raise ValueError(f"ids outside [0, {int(mi)}) — raise max_id")
        block = block.append_column("__kr_prk", pa.array(v * mi + i, pa.int64()))
        return block.append_column("__kr_one", pa.array(np.ones(len(v), np.int64)))

    add_key.__name__ = "percent_rank_key"
    if isinstance(ds, pa.Table):
        n = ds.num_rows if n_rows is None else int(n_rows)
        ranked = global_cumsum(add_key(ds), "__kr_prk", "__kr_one",
                               out_col=rank_col, bucket_width=int(mi),
                               exclusive=True)
    else:
        n = ds.count() if n_rows is None else int(n_rows)
        keyed = ds.map_batches(add_key, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=None)
        ranked = global_cumsum(keyed, "__kr_prk", "__kr_one", out_col=rank_col,
                               bucket_width=int(mi), exclusive=True)
    denom = float(n - 1) if n > 1 else 1.0

    def finish(block: pa.Table) -> pa.Table:
        r = block.column(rank_col).to_numpy(zero_copy_only=False)
        block = block.drop_columns(["__kr_prk", "__kr_one"])
        return block.append_column(
            out_col, pa.array(r.astype(np.float64) / denom, pa.float64()))

    finish.__name__ = "percent_rank_finish"
    if isinstance(ranked, pa.Table):
        return finish(ranked)
    return ranked.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)


def quantile_normalize(ds, group_cols, value_col: str, id_col: str,
                       n_rows: int | None = None, max_value: int = 1 << 27,
                       max_id: int = 1 << 32, out_col: str | None = None):
    """Quantile normalization across groups — map every row's value onto
    the GLOBAL distribution's value at the row's within-group rank fraction
    (the batch-effect/domain-shift alignment transform; sklearn
    QuantileTransformer fit on the whole corpus, applied per group):

        ``target = floor(r_g / (n_g - 1) * (N - 1))``  (0 when n_g == 1)
        ``out    = global_value_at_rank(target)``

    with ``r_g`` the 0-based (value, id) rank inside the group and the
    global rank table built by :func:`global_percent_rank`'s bucketed
    ``global_cumsum`` (no serial scan). The target expression is
    integer-derived floats through divide/multiply/floor only — mirrored
    exactly by ``FLOOR(r::DOUBLE / (ng-1)::DOUBLE * (N-1)::DOUBLE)``; the
    output value is an actual data value (no arithmetic). Integer values in
    [0, max_value), unique non-negative ids in [0, max_id).

    Scale plan: ONE group sort (in-block rank kernel), the bucketed global
    cumsum, and ONE equi-join of rows onto the O(N) rank->value table.
    Output: input columns + ``{value_col}_qn``."""
    from kamae_ray.stages.join import shuffle_join
    from kamae_ray.stages.window import sorted_block_apply

    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    out_name = out_col or f"{value_col}_qn"
    if isinstance(ds, pa.Table):
        n = ds.num_rows if n_rows is None else int(n_rows)
    else:
        n = ds.count() if n_rows is None else int(n_rows)
        ds = ds.materialize()  # consumed twice (global ranks + group ranks)
    ranked = global_percent_rank(ds, value_col, id_col, n_rows=n,
                                 max_value=max_value, max_id=max_id)

    def lookup_cols(block: pa.Table) -> pa.Table:
        return pa.table({
            "__tgt": pc.cast(block.column("rank"), pa.int64(), safe=False),
            out_name: block.column(value_col),
        })

    lookup_cols.__name__ = "qn_rank_lookup"
    lookup = lookup_cols(ranked) if isinstance(ranked, pa.Table) else \
        ranked.map_batches(lookup_cols, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
    nf = float(n - 1) if n > 1 else 0.0

    def group_rank(block: pa.Table) -> pa.Table:
        m = block.num_rows
        if m == 0:
            return block.append_column("__tgt", pa.array([], pa.int64()))
        gids = S.group_ids(block, group_cols)
        v = pc.cast(A.as_array(block.column(value_col)), pa.int64(),
                    safe=False).to_numpy(zero_copy_only=False)
        i = pc.cast(A.as_array(block.column(id_col)), pa.int64(),
                    safe=False).to_numpy(zero_copy_only=False)
        order = np.lexsort((i, v, gids))
        gs = gids[order]
        starts, lens = S.segments(gs)
        r = np.arange(m, dtype=np.int64) - np.repeat(starts, lens)
        ng = np.repeat(lens, lens).astype(np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            tgt_s = np.where(
                ng > 1,
                np.floor(r.astype(np.float64) / (ng - 1).astype(np.float64)
                         * nf).astype(np.int64),
                0)
        tgt = np.empty(m, np.int64)
        tgt[order] = tgt_s
        return block.append_column("__tgt", pa.array(tgt))

    out = sorted_block_apply(ds, group_cols, group_rank, "qn_group_rank") \
        if not isinstance(ds, pa.Table) else group_rank(ds)
    if isinstance(out, pa.Table):
        lk = lookup if isinstance(lookup, pa.Table) else None
        joined = out.join(lk, keys="__tgt", join_type="inner") \
            .sort_by(id_col)
        return joined.drop_columns(["__tgt"])
    joined = shuffle_join(out, lookup, on="__tgt", how="inner")

    def drop_tgt(block: pa.Table) -> pa.Table:
        return block.drop_columns(["__tgt"])

    drop_tgt.__name__ = "qn_finish"
    return joined.map_batches(drop_tgt, batch_format="pyarrow",
                              zero_copy_batch=True)


def nucleus_filter(ds, group_cols, weight_col: str, item_col: str,
                   p_ppm: int = 900_000):
    """Top-p (nucleus) truncation per group — keep the smallest
    highest-weight item set whose mass reaches ``p_ppm/1e6`` of the group
    total (vocabulary truncation, nucleus sampling support sets, long-tail
    pruning): under ``(weight DESC, item ASC)`` order a row survives iff

        ``1_000_000 * cum_before < p_ppm * total``

    — a pure int64 rule on exact integer weights (exclusive prefix sums;
    the boundary-crossing row is kept, everything after it cut). Rows with
    NULL weight or item are dropped (mirror with WHERE). Output: the
    surviving input rows unchanged.

    Scale plan: ONE sort-shuffle on the group key, then a segmented
    cumsum/filter kernel."""
    from kamae_ray.stages.window import sorted_block_apply

    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    if not (0 < p_ppm <= 1_000_000):
        raise ValueError("p_ppm must be in (0, 1e6]")

    def kern(block: pa.Table) -> pa.Table:
        keep0 = pc.and_(pc.is_valid(A.as_array(block.column(weight_col))),
                        pc.is_valid(A.as_array(block.column(item_col))))
        block = block.filter(keep0)
        n = block.num_rows
        if n == 0:
            return block
        gids = S.group_ids(block, group_cols)
        w = pc.cast(A.as_array(block.column(weight_col)), pa.int64(),
                    safe=False).to_numpy(zero_copy_only=False)
        if w.min() < 0:
            raise ValueError("nucleus_filter weights must be >= 0")
        it = A.as_array(block.column(item_col))
        # item tiebreak via rank (any total order type), weight descending
        itr = pc.rank(it, sort_keys="ascending").to_numpy(zero_copy_only=False)
        order = np.lexsort((itr, -w, gids))
        gs, ws = gids[order], w[order]
        starts, lens = S.segments(gs)
        tot = np.add.reduceat(ws, starts)
        if len(tot) and int(tot.max()) >= 2**63 // 1_000_000:
            raise ValueError("nucleus_filter group weight exceeds the exact "
                             "int64 rule range — rescale weights")
        cum = np.cumsum(ws)
        excl = (cum - ws) - np.repeat(cum[starts] - ws[starts], lens)
        keep_s = 1_000_000 * excl < p_ppm * np.repeat(tot, lens)
        keep = np.zeros(n, bool)
        keep[order] = keep_s
        return block.filter(pa.array(keep))

    if isinstance(ds, pa.Table):
        return kern(ds)
    return sorted_block_apply(ds, group_cols, kern, "nucleus_filter")


def time_decayed_sum(ds, key_col: str, time_col: str, value_col: str,
                     half_life: int, ref_time: int, max_age: int = 32,
                     out_col: str = "decayed"):
    """Per-key exponentially time-decayed sum with EXACT dyadic decay — the
    classic recency-weighted engagement feature, formulated so both engines
    compute bit-identical float64:

        age    = (ref_time - t) // half_life   (integer floor-div; rows
                 after ``ref_time`` or older than ``max_age`` half-lives
                 are dropped, as are null values)
        result = ((b_0 + b_1 * 0.5) + b_2 * 0.25) + ...   (ages ascending)

    where ``b_a`` is the key's EXACT int64 value sum in age bucket ``a``.
    Each term is an exact integer scaled by a power of two (lossless in
    IEEE float64 while ``|b_a| < 2^53``, asserted per block), and the
    additions run in one FIXED order — the ranking_dcg mirrored-chain
    family, so a generated SQL pivot reproduces the bits exactly
    (:func:`time_decayed_sum_oracle_sql`). Output: ``key, decayed``.

    Scale plan: a per-block (key, age) partial combiner shrinks the
    exchange to O(keys x max_age) rows per block, ONE key sort co-locates
    partials, and a segmented fold emits one row per key — no driver
    state."""
    from kamae_ray.stages.window import sorted_block_apply

    hl = np.int64(half_life)
    ref = np.int64(ref_time)
    if half_life <= 0:
        raise ValueError("half_life must be positive")
    weights = 0.5 ** np.arange(max_age + 1)  # exact dyadic in float64

    def partial(block: pa.Table) -> pa.Table:
        keys = pc.cast(A.as_array(block.column(key_col)), pa.int64(), safe=False)
        vals = A.as_array(block.column(value_col))
        t = pc.cast(A.as_array(block.column(time_col)), pa.int64(), safe=False)
        ok = pc.and_(pc.is_valid(vals), pc.is_valid(keys))
        sub = pa.table({"k": keys, "v": pc.cast(vals, pa.int64(), safe=False),
                        "t": t}).filter(ok)
        k = sub.column("k").to_numpy(zero_copy_only=False)
        v = sub.column("v").to_numpy(zero_copy_only=False)
        tt = sub.column("t").to_numpy(zero_copy_only=False)
        age = (ref - tt) // hl
        keep = (tt <= ref) & (age <= max_age)
        k, v, age = k[keep], v[keep], age[keep]
        if len(k) == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "age": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        code = np.lexsort((age, k))
        ks, ages, vs = k[code], age[code], v[code]
        changes = np.ones(len(ks), bool)
        changes[1:] = (ks[1:] != ks[:-1]) | (ages[1:] != ages[:-1])
        starts = np.flatnonzero(changes)
        sums = np.add.reduceat(vs, starts)
        return pa.table({"k": pa.array(ks[starts], pa.int64()),
                         "age": pa.array(ages[starts], pa.int64()),
                         "s": pa.array(sums, pa.int64())})

    partial.__name__ = "decay_partial"

    def fold(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table({key_col: pa.array([], pa.int64()),
                             out_col: pa.array([], pa.float64())})
        k = block.column("k").to_numpy(zero_copy_only=False)
        age = block.column("age").to_numpy(zero_copy_only=False)
        s = block.column("s").to_numpy(zero_copy_only=False)
        code = np.lexsort((age, k))
        k, age, s = k[code], age[code], s[code]
        changes = np.ones(len(k), bool)
        changes[1:] = (k[1:] != k[:-1]) | (age[1:] != age[:-1])
        starts = np.flatnonzero(changes)
        bk, bage = k[starts], age[starts]
        bs = np.add.reduceat(s, starts)
        if np.abs(bs).max(initial=0) >= (1 << 53):
            raise ValueError("time_decayed_sum: bucket sum exceeds 2^53 — "
                             "exact float64 scaling no longer holds; shrink "
                             "values or half_life buckets")
        kstarts = np.flatnonzero(np.concatenate([[True], bk[1:] != bk[:-1]]))
        klens = np.diff(np.append(kstarts, len(bk)))
        acc = np.zeros(len(kstarts))
        # ages ascending within key (lexsort) — terms added in fixed order;
        # loop over the <= max_age+1 distinct positions, vectorized over keys
        maxlen = int(klens.max()) if len(klens) else 0
        for j in range(maxlen):
            has = klens > j
            idx = kstarts[has] + j
            acc[has] = acc[has] + bs[idx] * weights[bage[idx]]
        return pa.table({key_col: pa.array(bk[kstarts], pa.int64()),
                         out_col: pa.array(acc, pa.float64())})

    fold.__name__ = "decay_fold"
    if isinstance(ds, pa.Table):
        return fold(partial(ds))
    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
    return sorted_block_apply(parts, ["k"], fold, "decay_fold")


def time_decayed_sum_oracle_sql(table_expr: str, key_col: str, time_col: str,
                                value_expr: str, half_life: int, ref_expr: str,
                                max_age: int = 32, out_col: str = "decayed") -> str:
    """DuckDB mirror of :func:`time_decayed_sum`: the same integer bucket
    sums pivoted into one left-associated chain of dyadic-scaled terms (the
    generated-fixed-order-float family). ``value_expr`` must yield BIGINT;
    ``ref_expr`` a BIGINT epoch-us scalar subquery or literal."""
    base = (
        f"WITH __base AS (SELECT {key_col} AS k, "
        f"(({ref_expr}) - epoch_us({time_col})) // {half_life} AS age, "
        f"{value_expr} AS v FROM {table_expr} "
        f"WHERE {value_expr} IS NOT NULL AND {key_col} IS NOT NULL "
        f"AND epoch_us({time_col}) <= ({ref_expr})), "
        f"__b AS (SELECT k, age, CAST(SUM(v) AS BIGINT) AS s FROM __base "
        f"WHERE age <= {max_age} GROUP BY k, age)"
    )
    chain = "CAST(0 AS DOUBLE)"
    for a in range(max_age + 1):
        w = 0.5 ** a
        chain = (f"({chain} + coalesce(MAX(CASE WHEN age = {a} THEN s END), 0) "
                 f"* CAST({w!r} AS DOUBLE))")
    return (f"{base} SELECT k AS {key_col}, {chain} AS {out_col} "
            f"FROM __b GROUP BY k")
