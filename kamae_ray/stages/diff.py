"""Keyed snapshot diff — the incremental-pipeline staple the reference
delegates upstream: given two snapshots of the same keyed table, emit which
keys were added, removed, or changed (unchanged keys are dropped, so the
output is the delta to process).

Ray design: each side projects to key columns + a 128-bit row fingerprint of
the compare columns (two independently-seeded vectorized hash lanes — value
equality <-> fingerprint equality up to a ~2^-128 collision, the same
discipline as the dedup index) + a side tag; the union then takes ONE
distributed sort-shuffle on the key (the window-family partitioning
contract) and a vectorized block kernel classifies every key segment. No
driver state, no join — the shuffle payload is keys + 17 bytes/row
regardless of row width.

Duplicate keys within a side are handled as MULTISETS: a key is unchanged
only if both sides carry the same multiset of row fingerprints (sorted-lane
alignment inside the kernel), which matches the SQL FULL OUTER JOIN oracle
when keys are unique and degrades sanely when they are not.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from kamae_ray.functions import arrays as A
from kamae_ray.functions import segments as S

_SIDE = "__kr_side"
_FP0 = "__kr_fp0"
_FP1 = "__kr_fp1"


def row_fingerprint(tbl: pa.Table, cols: list[str], seed: int) -> np.ndarray:
    """One uint64 fingerprint lane over ``cols``: per column the vectorized
    _hash_any (bit-pattern floats, FarmHash strings), nulls mapped to a
    seed-derived sentinel, columns folded with a splitmix64 chain so column
    order matters and lanes with different seeds are independent."""
    from kamae_ray.stages.sketches import _hash_any, _splitmix64

    n = tbl.num_rows
    acc = np.full(n, np.uint64(seed), dtype=np.uint64)
    for i, c in enumerate(cols):
        h, valid = _hash_any(tbl.column(c))
        # wraparound constants via Python-int mod 2^64 (numpy scalar uint64
        # multiply warns on the intentional overflow)
        salt = np.uint64((0x9E3779B97F4A7C15 * (i + 1)) & 0xFFFFFFFFFFFFFFFF)
        null_const = _splitmix64(np.uint64((seed + int(salt)) & 0xFFFFFFFFFFFFFFFF))
        h = np.where(valid, h, null_const)
        with np.errstate(over="ignore"):
            acc = _splitmix64(acc ^ (h + salt))
    return acc


def _tag_side(key_cols: list[str], compare_cols: list[str], side: int):
    def tag(batch: pa.Table) -> pa.Table:
        out = {k: batch.column(k) for k in key_cols}
        out[_FP0] = pa.array(
            row_fingerprint(batch, compare_cols, 0x51ED27).view(np.int64), pa.int64())
        out[_FP1] = pa.array(
            row_fingerprint(batch, compare_cols, 0xC3A5B1).view(np.int64), pa.int64())
        out[_SIDE] = pa.array(np.full(batch.num_rows, side, dtype=np.int8), pa.int8())
        return pa.table(out)

    tag.__name__ = f"diff_tag_side{side}"
    return tag


def _classify_kernel(key_cols: list[str], status_col: str):
    def kern(block: pa.Table) -> pa.Table:
        empty = {k: pa.chunked_array([[]], block.schema.field(k).type) for k in key_cols}
        empty[status_col] = pa.array([], pa.string())
        if block.num_rows == 0:
            return pa.table(empty)
        gids = S.group_ids(block, key_cols)
        side = A.as_array(block.column(_SIDE)).to_numpy(zero_copy_only=False).astype(np.int64)
        f0 = A.as_array(block.column(_FP0)).to_numpy(zero_copy_only=False)
        f1 = A.as_array(block.column(_FP1)).to_numpy(zero_copy_only=False)
        order = np.lexsort((f1, f0, side, gids))
        g, s, a, b = gids[order], side[order], f0[order], f1[order]
        starts, lens = S.segments(g)
        n_seg = len(starts)
        c1 = np.add.reduceat(s, starts) if n_seg else np.zeros(0, np.int64)
        c0 = lens - c1
        added = c0 == 0
        removed = c1 == 0
        both = ~added & ~removed
        changed = both & (c0 != c1)
        eq = both & (c0 == c1)
        if eq.any():
            st, c = starts[eq], c0[eq]
            tot = int(c.sum())
            rep_st = np.repeat(st, c)
            rep_c = np.repeat(c, c)
            seg_off = np.concatenate(([0], np.cumsum(c)[:-1]))
            intra = np.arange(tot, dtype=np.int64) - np.repeat(seg_off, c)
            i0 = rep_st + intra
            i1 = rep_st + rep_c + intra
            neq = (a[i0] != a[i1]) | (b[i0] != b[i1])
            any_neq = np.logical_or.reduceat(neq, seg_off) if tot else np.zeros(0, bool)
            ch = np.zeros(n_seg, dtype=bool)
            ch[np.where(eq)[0]] = any_neq
            changed |= ch
        emit = added | removed | changed
        if not emit.any():
            return pa.table(empty)
        first = order[starts[emit]]
        status = np.where(added[emit], "added",
                          np.where(removed[emit], "removed", "changed"))
        out = {k: A.as_array(block.column(k)).take(pa.array(first)) for k in key_cols}
        out[status_col] = pa.array(status.astype(object), pa.string())
        return pa.table(out)

    kern.__name__ = "snapshot_diff_classify"
    return kern


def snapshot_diff(old_ds, new_ds, key_cols, compare_cols,
                  status_col: str = "status"):
    """Delta between two snapshots keyed by ``key_cols``: key columns +
    ``status`` in {'added', 'removed', 'changed'}; unchanged keys dropped.
    Works on pa.Table pairs (no Ray) and ray.data.Dataset pairs."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    compare_cols = [compare_cols] if isinstance(compare_cols, str) else list(compare_cols)
    old_tag = _tag_side(key_cols, compare_cols, 0)
    new_tag = _tag_side(key_cols, compare_cols, 1)
    kern = _classify_kernel(key_cols, status_col)
    if isinstance(old_ds, pa.Table) and isinstance(new_ds, pa.Table):
        both = pa.concat_tables([old_tag(old_ds), new_tag(new_ds)])
        idx = pa.compute.sort_indices(
            both.select(key_cols + [_SIDE]),
            sort_keys=[(k, "ascending") for k in key_cols + [_SIDE]])
        return kern(both.take(idx))
    from kamae_ray.stages.window import sorted_block_apply

    tagged = old_ds.map_batches(
        old_tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).union(new_ds.map_batches(
        new_tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=None))
    return sorted_block_apply(tagged, key_cols, kern, "snapshot_diff")
