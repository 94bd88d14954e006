"""Hot-key (skew) detection for the wide stages.

A distributed sort co-locates ALL rows of one key in one partition
(tests/test_sort_contract.py), so a key holding a large share of the input
produces one giant block — the classic skew straggler/OOM. ``shuffle_join``
and ``asof_join`` accept ``salt_partitions="auto"``: this pre-pass counts
rows per key (per-block partial counts pre-aggregate before a tiny shuffle —
the driver only ever receives keys that crossed the threshold) and only the
detected hot keys get salted, so the replication cost of salting is paid
exclusively where the skew is.

Cost: one extra streaming pass over the input (re-executing its upstream
plan if lazy). Callers doing an expensive upstream transform should
materialize it first or pass an integer ``salt_partitions`` with an explicit
hot-key list.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_CNT = "__kr_cnt"


def _partial_counts(batch: pa.Table, on: list[str]) -> pa.Table:
    t = batch.select(on)
    # drop null-keyed rows: they never join-match (SQL NULL semantics), can't
    # be salted via index_in, and Ray's range-partitioned groupby cannot
    # compare null against non-null keys
    for k in on:
        col = t.column(k)
        if col.null_count:
            t = t.filter(pc.is_valid(col))
    out = t.group_by(on).aggregate([([], "count_all")])
    return out.rename_columns(on + [_CNT])


def detect_hot_keys(ds, on: list[str], threshold: int) -> pa.Table:
    """Keys of ``ds`` (Dataset or Table) with more than ``threshold`` rows,
    as a (small) ``pa.Table`` with columns ``on``."""

    if isinstance(ds, pa.Table):
        counts = _partial_counts(ds, on)
        return counts.filter(pc.greater(counts.column(_CNT), threshold)).select(on)

    def part(batch: pa.Table) -> pa.Table:
        return _partial_counts(batch, on)

    part.__name__ = "hot_key_partial_counts"
    agg = (
        ds.select_columns(on)
        .map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(on)
        .sum(_CNT)
    )
    total_col = f"sum({_CNT})"

    def hot_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch.column(total_col), threshold)).select(on)

    hot_only.__name__ = "hot_keys_filter"
    hot = agg.map_batches(hot_only, batch_format="pyarrow", zero_copy_batch=True)
    tabs = list(hot.iter_batches(batch_format="pyarrow"))
    if not tabs:
        schema = ds.schema()
        fields = [(n, t) for n, t in zip(schema.names, schema.types) if n in on]
        return pa.table({n: pa.array([], t) for n, t in fields})
    return pa.concat_tables(tabs)
