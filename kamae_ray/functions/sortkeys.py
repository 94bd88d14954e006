"""Int64 surrogate sort keys for the wide (sort-shuffle) stages.

Ray's distributed sort compares full key tuples; with string entity columns
the per-block SortMap dominates the shuffle (measured: 140 CPU-s of sort vs
26 CPU-s of kernel work on a 6M-row window pass). Every wide kernel in this
repo groups by the REAL key columns inside the block
(``functions/segments.group_ids`` factorizes by value and the kernels lexsort
within the block), so the distributed sort only needs to CO-LOCATE equal
keys — any deterministic int64 function of the key tuple works, and hash
collisions merely co-locate two groups in one block (never merge them).

``surrogate_sorted(ds, keys)`` sorts by one vectorized int64 hash column
instead of the raw tuple and exposes the same partitioning contract: a row's
block is a pure function of its full key tuple (pinned by
tests/test_sort_contract.py for the plain sort; the surrogate inherits it
because equal tuples hash equal).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kamae_ray.functions import arrays as A

SKEY = "__kr_skey"
_P = np.uint64(0x9E3779B97F4A7C15)
_SEED = np.uint64(0xC2B2AE3D27D4EB4F)
#: bytes of each string hashed (prefix) — longer strings mix length + prefix;
#: collisions only co-locate, so a bounded prefix is safe
_MAX_BYTES = 48


def _string_hash64(arr: pa.Array) -> np.ndarray:
    """Vectorized polynomial hash over utf8 bytes (numpy passes over byte
    positions, no per-row Python)."""
    arr = pc.fill_null(arr, "")
    if pa.types.is_dictionary(arr.type):
        arr = pc.cast(arr, pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.zeros(0, np.uint64)
    bufs = arr.buffers()
    width = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(bufs[1], dtype=width)[arr.offset : arr.offset + n + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.zeros(0, np.uint8)
    lens = offs[1:] - offs[:-1]
    h = lens.astype(np.uint64) * _P + _SEED
    m_len = int(min(lens.max(initial=0), _MAX_BYTES))
    starts = offs[:-1]
    for j in range(m_len):
        m = lens > j
        if not m.any():
            break
        h[m] = h[m] * _P + data[starts[m] + j]
    return h


def _col_hash64(arr) -> np.ndarray:
    arr = A.as_array(arr)
    t = arr.type
    if pa.types.is_dictionary(t):
        t = t.value_type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return _string_hash64(arr)
    # numeric/bool/temporal: the value itself (null -> fixed sentinel)
    vals = pc.fill_null(pc.cast(arr, pa.int64(), safe=False), -(1 << 62))
    return vals.to_numpy(zero_copy_only=False).view(np.uint64) * _P


def add_surrogate_key(batch: pa.Table, keys: list[str]) -> pa.Table:
    h = np.full(batch.num_rows, _SEED, dtype=np.uint64)
    for k in keys:
        h = h * _P ^ _col_hash64(batch.column(k))
    return batch.append_column(SKEY, pa.array(h.view(np.int64), pa.int64()))


def _any_string_key(schema: pa.Schema, keys: list[str]) -> bool:
    for k in keys:
        t = schema.field(k).type
        if pa.types.is_dictionary(t):
            t = t.value_type
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return True
    return False


def surrogate_sorted(ds, keys: list[str], schema=None, force: bool = False):
    """``ds.sort(keys)`` replacement for wide stages: sorts by one int64
    surrogate when a key column is a string (much cheaper comparisons in the
    distributed sort), plain sort otherwise. The returned dataset still
    carries the ``SKEY`` column in the surrogate case — block fns must drop
    it (zero-copy) before emitting.

    Mode (env ``KAMAE_SURROGATE_SORT`` = auto|always|never, default auto):
    the surrogate removes almost all SortMap CPU (measured 140 -> 2.4 CPU-s
    at 6M rows) but adds one operator stage, which costs ~1 s of wall on
    small many-tiny-block inputs where the sort wasn't CPU-bound anyway.
    auto = surrogate when ``ds.size_bytes()`` is >= 1 GiB or unknown
    (design-for-scale default: at the 100 TB target every input clears the
    bar; only toy inputs fall back to the plain sort).

    ``schema``: optional pa.Schema-like hint from the caller (checked for
    string keys without touching the dataset); when absent, only
    metadata-inferred schema is consulted — never an executing probe.

    ``force=True`` always takes the surrogate path for string keys: Ray's
    native sort partitioner crashes comparing None vs str boundary values
    (object-dtype searchsorted), so callers whose string keys may contain
    NULLs must not fall back to the plain sort on small inputs."""
    import os

    # NEVER execute the plan to pick a strategy: ``ds.schema()`` with
    # fetch_if_missing (the default) runs a limit-1 probe of the whole
    # upstream chain — which pays actor-pool startup and first-block compute
    # for every wide stage (measured ~1-3 s per stage on chained pipelines).
    # Metadata-only schema; when unknown (any post-map_batches input) take
    # the surrogate path: it is correct for every dtype, the int64 hash is
    # one vectorized pass, and only adds ~1 s on toy inputs.
    if schema is None:
        try:
            schema = ds.schema(fetch_if_missing=False)
        except TypeError:  # older Ray without the flag
            schema = ds.schema()
    if schema is not None and not _any_string_key(
        pa.schema(list(zip(schema.names, schema.types))), keys
    ):
        return _coalesced(ds).sort(keys), False
    mode = os.environ.get("KAMAE_SURROGATE_SORT", "auto")
    if force:
        mode = "always"
    if mode != "always":
        small = False
        if mode == "never":
            small = True
        else:
            # Inferred metadata ONLY — ds.size_bytes() is a ConsumptionAPI that
            # EXECUTES the upstream plan when metadata is absent (always the
            # case after any map_batches), which would materialize the whole
            # pipeline just to pick a sort strategy. None => unknown => treat
            # as large (design-for-scale default).
            try:
                size = ds._logical_plan.dag.infer_metadata().size_bytes
            except Exception:
                size = None
            small = size is not None and size < (1 << 30)
        if small:
            return _coalesced(ds).sort(keys), False

    def add_key(batch: pa.Table) -> pa.Table:
        return add_surrogate_key(batch, keys)

    add_key.__name__ = "surrogate_sort_key"
    keyed = ds.map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=_sort_block_rows())
    return keyed.sort(SKEY), True


def _sort_block_rows() -> int | None:
    """Pre-sort block coalescing width (rows), env KAMAE_SORT_BLOCK_ROWS
    (0 disables). Ray's distributed sort spawns one map task AND one reduce
    partition per INPUT block — a small single-file read split into 64 tiny
    ~1k-row blocks turns a 120k-row sort into 128+ near-empty tasks whose
    scheduling dominates wall time (measured: as-of join 3.5 s -> 0.7 s just
    by feeding the same rows as 8 blocks). Bundling the pre-sort map to
    ~16k-row batches sizes the sort's task count to DATA VOLUME instead of
    the reader's ambient split; at scale the same width yields thousands of
    right-sized partitions."""
    import os

    v = int(os.environ.get("KAMAE_SORT_BLOCK_ROWS", "65536"))
    return v if v > 0 else None


def _coalesced(ds):
    """Identity map that re-bundles tiny blocks before a PLAIN sort (the
    surrogate path coalesces inside its own key map; see _sort_block_rows)."""
    t = _sort_block_rows()
    if t is None:
        return ds

    def noop(batch: pa.Table) -> pa.Table:
        return batch

    noop.__name__ = "sort_coalesce"
    return ds.map_batches(noop, batch_format="pyarrow", zero_copy_batch=True, batch_size=t)


def drop_skey(block: pa.Table) -> pa.Table:
    if SKEY in block.column_names:
        return block.drop_columns([SKEY])
    return block
