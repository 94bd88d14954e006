"""Broadcast (dimension-lookup) equi-join.

The reference delegates joins to Spark; this engine provides the
scale-correct Ray Data equivalents:

- ``broadcast_join``: small right side (a ``pa.Table`` of dimension rows with
  UNIQUE join keys) is put into the object store ONCE (``ray.put``) and every
  map task resolves matches with one vectorized ``pc.index_in`` + ``take`` —
  no shuffle at all, the canonical plan when one side fits in memory.
- for large-x-large joins use ``asof_join``'s machinery (co-partitioned
  sort-shuffle) or a ``groupby`` co-group; a broadcast join on a big right
  side would OOM every worker, so the right side is required to be a
  ``pa.Table`` here by design.

Right-key uniqueness is validated up front: with duplicate keys an SQL join
multiplies rows, which a lookup join silently would not — better to fail
fast and let the caller pre-aggregate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kamae_ray.functions import arrays as A

_JK = "__kr_jk"


def _combined_key(table_or_batch: pa.Table, on: list[str]) -> pa.Array:
    """Single join-key array: the column itself for one key, a NUL-joined
    string for composite keys (cast to string first)."""
    if len(on) == 1:
        return A.as_array(table_or_batch.column(on[0]))
    parts = [pc.cast(A.as_array(table_or_batch.column(k)), pa.string(), safe=False) for k in on]
    return pc.binary_join_element_wise(*parts, "\x1f")


def broadcast_join(
    ds,
    right: pa.Table,
    on: str | list[str],
    right_cols: list[str] | None = None,
    how: str = "left",
    suffix: str = "_r",
):
    """Enrich ``ds`` (Dataset or Table) with columns from a small ``right``
    table by equality on ``on``. ``how`` is ``'left'`` (unmatched -> nulls)
    or ``'inner'`` (unmatched rows dropped). Exactly matches SQL
    LEFT/INNER JOIN when right keys are unique (enforced)."""
    on = [on] if isinstance(on, str) else list(on)
    if how not in ("left", "inner"):
        raise ValueError("how must be left|inner")
    payload = [c for c in (right_cols or right.column_names) if c not in on]
    rkey = _combined_key(right, on)
    n_distinct = len(pc.unique(rkey))
    if n_distinct != len(right):
        raise ValueError(
            f"broadcast_join right side has duplicate keys on {on} "
            f"({len(right)} rows, {n_distinct} distinct) — an SQL join would "
            "multiply rows; pre-aggregate the right side first"
        )
    rpayload = right.select(payload)

    def join_batch(batch: pa.Table, key_arr: pa.Array, payload_tbl: pa.Table, left_names) -> pa.Table:
        lkey = _combined_key(batch, on)
        idx = pc.index_in(lkey, value_set=key_arr)  # null when unmatched
        for c in payload_tbl.column_names:
            out_name = f"{c}{suffix}" if c in left_names else c
            taken = payload_tbl.column(c).take(idx)  # null idx -> null value
            batch = batch.append_column(out_name, taken)
        if how == "inner":
            batch = batch.filter(pc.is_valid(idx))
        return batch

    if isinstance(ds, pa.Table):
        return join_batch(ds, rkey, rpayload, set(ds.column_names))

    left_names = set(ds.schema().names)

    class _BroadcastJoin:
        def __init__(self, right_ref):
            import ray

            r = ray.get(right_ref)  # once per actor/task process
            self._key = r["key"]
            self._payload = r["payload"]
            self.__name__ = "broadcast_join"

        def __call__(self, batch: pa.Table) -> pa.Table:
            return join_batch(batch, self._key, self._payload, left_names)

    import ray

    right_ref = ray.put({"key": rkey, "payload": rpayload})
    return ds.map_batches(
        _BroadcastJoin,
        fn_constructor_args=(right_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
        concurrency=(1, 8),
    )
