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
