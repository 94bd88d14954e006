"""Privacy-preserving training-data preparation: k-anonymity suppression
and l-diversity auditing over quasi-identifier (QI) column tuples.

Reference scope note: the reference engine (ExpediaGroup/kamae) has no
privacy layer — these are the training-data-platform extensions the build
brief asks for, expressed Ray-Data-first.

Scale plan: ``k_anonymize`` is ONE distributed sort on exactly the QI key
tuple (the partitioning contract — tests/test_sort_contract.py — puts every
QI group inside one block) followed by a vectorized block kernel that counts
each run and filters; no join, no second pass, no driver state.
``l_diversity`` reuses the pair-count combiner of
:func:`~kamae_ray.stages.aggregate.groupby_cat_stats`: the exchange carries
one row per distinct (QI, sensitive) cell, never the data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kamae_ray.functions import arrays as A
from kamae_ray.functions import segments as S


def k_anonymize(ds, qi_cols: str | list[str], k: int):
    """Keep only rows whose QI group has at least ``k`` rows (k-anonymity
    suppression, SQL ``QUALIFY COUNT(*) OVER (PARTITION BY qi...) >= k``).

    NULL QI values form real groups (window-partition NULL-equal
    semantics, same convention as :func:`group_ids`). Row order within the
    output is not defined (set semantics).
    """
    qi_cols = [qi_cols] if isinstance(qi_cols, str) else list(qi_cols)
    if k <= 1:
        return ds

    def suppress(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return block
        gids = S.group_ids(block, qi_cols)
        order = np.argsort(gids, kind="stable")
        starts, lens = S.segments(gids[order])
        sizes = np.empty(len(gids), np.int64)
        sizes[order] = np.repeat(lens, lens)
        return block.filter(pa.array(sizes >= k))

    suppress.__name__ = "kanon_suppress"
    if isinstance(ds, pa.Table):
        return suppress(ds)
    from kamae_ray.stages.window import sorted_block_apply

    # QI keys may be nullable strings — lesson 22: Ray's native sort
    # partitioner crashes on null string keys; the surrogate path is safe.
    return sorted_block_apply(ds, qi_cols, suppress, "kanon_suppress",
                              force_surrogate=True)


def l_diversity(ds, qi_cols: str | list[str], sensitive_col: str, l: int):
    """Per-QI-group l-diversity audit: ``n`` (non-null sensitive rows),
    ``n_sensitive`` (distinct sensitive values, SQL ``COUNT(DISTINCT ...)``
    — nulls not counted) and ``diverse`` = 1 when ``n_sensitive >= l``.

    Counts are integers, so every output column is cross-engine exact."""
    from kamae_ray.stages.aggregate import groupby_cat_stats

    qi_cols = [qi_cols] if isinstance(qi_cols, str) else list(qi_cols)
    stats = groupby_cat_stats(ds, qi_cols, sensitive_col)

    def finish(block: pa.Table) -> pa.Table:
        nd = block.column("n_distinct")
        out = block.select(qi_cols + ["n"]).append_column(
            "n_sensitive", nd
        )
        return out.append_column(
            "diverse", pc.cast(pc.greater_equal(nd, l), pa.int64())
        )

    finish.__name__ = "ldiv_finish"
    if isinstance(stats, pa.Table):
        return finish(stats)
    return stats.map_batches(finish, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=None)


def t_closeness(ds, qi_cols: str | list[str], sensitive_col: str,
                t_ppm: int, max_categories: int = 100_000):
    """Per-QI-group t-closeness audit over a CATEGORICAL sensitive column:
    the total-variation distance between the group's sensitive distribution
    and the GLOBAL one,

        ``tv = (1/2) * sum_c |n_gc / n_g - n_c / n|``

    computed EXACTLY as the integer ``sum_c |n_gc * n - n_c * n_g|`` over
    the cross-multiplied counts (categories absent from a group contribute
    ``n_c * n_g`` — folded in closed form as ``(n - sum_present n_c) *
    n_g``, so the kernel never materializes the full group x category
    grid). ``tv_ppm = num * 1e6 // (2 * n * n_g)`` by exact integer
    division (per-group Python-int fold — the numerator times 1e6 exceeds
    int64; groups are post-aggregation rows, so the loop is O(distinct QI
    tuples), never O(corpus)). ``close`` = 1 when ``tv_ppm <= t_ppm``.

    Null sensitive values are excluded from both distributions (the
    :func:`l_diversity` convention); null QI values form real groups.
    Requires fewer than 2^31 non-null rows (cross-multiplied terms stay
    int64) and at most ``max_categories`` sensitive categories (the
    broadcast margin table) — both raise.

    Scale plan: one combiner pass folds the corpus to (QI, sensitive) cell
    counts; the category margins are a second aggregate OVER THE CELLS
    (bounded by categories, broadcast to the fold); the per-group fold is
    one sort of the cell table. The corpus itself is read once."""
    from kamae_ray.stages.aggregate import groupby_agg
    from kamae_ray.stages.window import sorted_block_apply

    qi_cols = [qi_cols] if isinstance(qi_cols, str) else list(qi_cols)

    def prep(block: pa.Table) -> pa.Table:
        s = A.as_array(block.column(sensitive_col))
        block = block.filter(pc.is_valid(s))
        return block.append_column(
            "__one", pa.array(np.ones(block.num_rows, np.int64)))

    prep.__name__ = "tclose_prep"
    if isinstance(ds, pa.Table):
        cells = groupby_agg(prep(ds), qi_cols + [sensitive_col],
                            {"__one": ["count"]})
    else:
        pre = ds.map_batches(prep, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=None)
        cells = groupby_agg(pre, qi_cols + [sensitive_col],
                            {"__one": ["count"]}).materialize()

    # category margins: aggregate over the CELLS (category-bounded)
    marg = groupby_agg(cells, [sensitive_col], {"__one_count": ["sum"]})
    if not isinstance(marg, pa.Table):
        from kamae_ray.base import collect_tables

        marg = pa.concat_tables(collect_tables(marg))
    if marg.num_rows > max_categories:
        raise ValueError(
            f"t_closeness: {marg.num_rows} sensitive categories exceed "
            f"max_categories={max_categories}")
    cats = pc.cast(A.as_array(marg.column(sensitive_col)), pa.string(),
                   safe=False)
    nc = A.as_array(marg.column("__one_count_sum")) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    n_total = int(nc.sum())
    if n_total >= 2 ** 31:
        raise ValueError("t_closeness: >= 2^31 non-null rows — "
                         "cross-multiplied terms would overflow int64")

    def fold(block: pa.Table) -> pa.Table:
        empty = {c: pa.array([], A.as_array(block.column(c)).type
                             if block.num_rows else pa.string())
                 for c in qi_cols}
        if block.num_rows == 0:
            empty.update({"n": pa.array([], pa.int64()),
                          "tv_ppm": pa.array([], pa.int64()),
                          "close": pa.array([], pa.int64())})
            return pa.table(empty)
        gids = S.group_ids(block, qi_cols)
        order = np.argsort(gids, kind="stable")
        gs = gids[order]
        starts, lens = S.segments(gs)
        firsts = order[starts]
        ngc = A.as_array(block.column("__one_count")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)[order]
        sv = pc.cast(A.as_array(block.column(sensitive_col)), pa.string(),
                     safe=False).take(pa.array(order))
        pos = pc.index_in(sv, value_set=cats).to_numpy(zero_copy_only=False)
        nci = nc[pos]
        ng = np.add.reduceat(ngc, starts)
        ng_rep = np.repeat(ng, lens)
        terms = np.abs(ngc * n_total - nci * ng_rep)
        num_present = np.add.reduceat(terms, starts)
        nc_present = np.add.reduceat(nci, starts)
        num = num_present + (n_total - nc_present) * ng
        tv = np.fromiter(
            (int(a) * 1_000_000 // (2 * n_total * int(b))
             for a, b in zip(num.tolist(), ng.tolist())),
            np.int64, count=len(ng))
        out = {c: A.as_array(block.column(c)).take(pa.array(firsts))
               for c in qi_cols}
        out["n"] = pa.array(ng, pa.int64())
        out["tv_ppm"] = pa.array(tv, pa.int64())
        out["close"] = pa.array((tv <= t_ppm).astype(np.int64))
        return pa.table(out)

    fold.__name__ = "tclose_fold"
    if isinstance(cells, pa.Table):
        return fold(cells)
    return sorted_block_apply(cells, qi_cols, fold, "tclose_fold",
                              force_surrogate=True)
