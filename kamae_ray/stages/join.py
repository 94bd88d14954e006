"""Broadcast (dimension-lookup) equi-join.
The reference delegates joins to Spark; this engine provides the
scale-correct Ray Data equivalents:
- ``broadcast_join``: small right side (a ``pa.Table`` of dimension rows with
  UNIQUE join keys) is put into the object store ONCE (``ray.put``) and every
  map task resolves matches with one vectorized ``pc.index_in`` + ``take`` —
  no shuffle at all, the canonical plan when one side fits in memory.
- ``shuffle_join``: large-x-large equi-join — both sides union into ONE
  sort-shuffle on the key (int64 surrogate for string keys, see
  functions/sortkeys.py) and a block-local vectorized cross-product per key
  segment emits the SQL join result, duplicate keys on both sides included.
``broadcast_join`` right-key uniqueness is validated up front: with
duplicate keys an SQL join multiplies rows, which a lookup join silently
would not — better to fail fast; use ``shuffle_join`` for that shape.
"""
from __future__ import annotations
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from kamae_ray.functions import arrays as A
def _combined_key(table_or_batch: pa.Table, on: list[str]) -> pa.Array:
    """Single join-key array: the column itself for one key, an escaped
    separator-joined string for composite keys (cast to string first).
    Separator bytes inside values are escaped (\\x1e-prefixed) so distinct
    tuples can never collide — ('a\\x1fb','c') != ('a','b\\x1fc'). A null in
    any component yields a null combined key (SQL: NULL equality never
    matches)."""
    if len(on) == 1:
        return A.as_array(table_or_batch.column(on[0]))
    parts = []
    for k in on:
        p = pc.cast(A.as_array(table_or_batch.column(k)), pa.string(), safe=False)
        p = pc.replace_substring(p, "\x1e", "\x1e\x1e")
        p = pc.replace_substring(p, "\x1f", "\x1e\x1f")
        parts.append(p)
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
    table by equality on ``on``. ``how`` is ``'left'`` (unmatched -> nulls),
    ``'inner'`` (unmatched rows dropped), ``'semi'`` (SQL EXISTS filter: keep
    left rows with >=1 match, no right columns appended) or ``'anti'`` (SQL
    NOT EXISTS: keep left rows with NO match). Exactly matches SQL
    LEFT/INNER JOIN when right keys are unique (enforced for left/inner only
    — semi/anti never multiply rows, so duplicate right keys are fine); NULL
    keys follow SQL semantics (NULL never equals NULL: null-keyed left rows
    are unmatched — dropped by semi, KEPT by anti per NOT EXISTS — and
    null-keyed right rows are dropped up front)."""
    on = [on] if isinstance(on, str) else list(on)
    if how not in ("left", "inner", "semi", "anti"):
        raise ValueError("how must be left|inner|semi|anti")
    filter_only = how in ("semi", "anti")
    payload = [] if filter_only else [
        c for c in (right_cols or right.column_names) if c not in on
    ]
    rkey = _combined_key(right, on)
    if rkey.null_count:
        right = right.filter(pc.is_valid(rkey))  # SQL: null right key matches nothing
        rkey = _combined_key(right, on)
    if filter_only:
        rkey = pc.unique(rkey)  # membership only — dedupe shrinks the broadcast
    else:
        n_distinct = len(pc.unique(rkey))
        if n_distinct != len(right):
            raise ValueError(
                f"broadcast_join right side has duplicate keys on {on} "
                f"({len(right)} rows, {n_distinct} distinct) — an SQL join would "
                "multiply rows; pre-aggregate the right side first"
            )
    rpayload = right.select(payload)
    def join_batch(batch: pa.Table, key_arr: pa.Array, payload_tbl: pa.Table) -> pa.Table:
        left_names = set(batch.column_names)  # per batch: avoids a schema probe
        lkey = _combined_key(batch, on)
        idx = pc.index_in(lkey, value_set=key_arr)  # null when unmatched
        if lkey.null_count:
            # SQL NULL semantics: a null left key never matches (index_in
            # would otherwise pair null with a null in the value set)
            idx = pc.if_else(pc.is_valid(lkey), idx, pa.nulls(len(lkey), idx.type))
        if how == "semi":
            return batch.filter(pc.is_valid(idx))
        if how == "anti":
            # null lkey -> null idx -> kept: SQL NOT EXISTS keeps null keys
            return batch.filter(pc.is_null(idx))
        for c in payload_tbl.column_names:
            out_name = f"{c}{suffix}" if c in left_names else c
            taken = payload_tbl.column(c).take(idx)  # null idx -> null value
            batch = batch.append_column(out_name, taken)
        if how == "inner":
            batch = batch.filter(pc.is_valid(idx))
        return batch
    if isinstance(ds, pa.Table):
        return join_batch(ds, rkey, rpayload)
    import ray

    right_ref = ray.put({"key": rkey, "payload": rpayload})
    side_bytes = rkey.nbytes + rpayload.nbytes
    # Small right side: plain task function — ``ray.get`` of a local Arrow
    # object is zero-copy, so per-task cost is negligible and we skip the
    # actor pool's multi-second startup. Large right side: actor pool, so
    # any per-process deserialization happens once per ACTOR, not per task.
    if side_bytes < 64 << 20:

        def bjoin(batch: pa.Table) -> pa.Table:
            r = ray.get(right_ref)  # zero-copy from the local object store
            return join_batch(batch, r["key"], r["payload"])

        bjoin.__name__ = "broadcast_join"
        return ds.map_batches(
            bjoin, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )

    class _BroadcastJoin:
        def __init__(self, right_ref):
            import ray
            r = ray.get(right_ref)  # once per actor/task process
            self._key = r["key"]
            self._payload = r["payload"]
            self.__name__ = "broadcast_join"
        def __call__(self, batch: pa.Table) -> pa.Table:
            return join_batch(batch, self._key, self._payload)
    try:
        _cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        _cpus = 8
    return ds.map_batches(
        _BroadcastJoin,
        fn_constructor_args=(right_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
        # autoscaling actor pool sized to the CLUSTER, not a fixed 8
        concurrency=(1, max(8, _cpus)),
    )
def shuffle_join(
    left,
    right,
    on: str | list[str],
    right_cols: list[str] | None = None,
    how: str = "left",
    suffix: str = "_r",
    max_group_product: int = 10_000_000,
    salt_partitions: int | str | None = None,
    hot_key_rows: int = 1_000_000,
):
    """Large-x-large equi-join: ONE sort-shuffle co-locates equal keys (same
    plan + partitioning contract as the window family; string keys ride the
    int64 surrogate), then a block-local vectorized cross-product per key
    segment — matches SQL LEFT/INNER/RIGHT/FULL OUTER JOIN incl. duplicate
    keys on BOTH sides, plus ``'semi'`` / ``'anti'`` (SQL EXISTS / NOT
    EXISTS filters: a subset of the LEFT rows, no right columns; the right
    side is block-deduped to distinct keys before the shuffle, and anti
    keeps null-keyed left rows per NOT EXISTS), and SQL NULL semantics
    elsewhere (a null key never matches:
    such rows are emitted unmatched or dropped per ``how``; note all
    null-keyed rows co-locate in one sort partition, so heavily-null keys
    should be pre-filtered by the caller).

    Hot keys never OOM or raise: segments whose cross product exceeds
    ``max_group_product`` rows stream out in bounded chunks (the block fn is
    a generator), so memory stays flat no matter the skew — one task still
    computes the whole segment (wall-clock straggler).

    ``salt_partitions`` addresses the straggler: ``"auto"`` (or an int S)
    runs a hot-key pre-pass (functions/skew.py, threshold ``hot_key_rows``;
    costs one extra streaming read of each side) and salts ONLY the detected
    hot keys — their left rows split across S sub-partitions and their right
    rows replicate into every sub-partition, so the per-partition product
    drops Sx. Split-left/replicate-right is direction-safe for every ``how``:
    each left row still sees the key's full right set, and replicated right
    copies carry a tag excluding them from right-unmatched emission (only the
    salt-0 original can emit unmatched, and salt 0 provably holds left rows
    whenever any exist — split is ``arange % S`` per batch)."""
    on = [on] if isinstance(on, str) else list(on)
    if how not in ("left", "inner", "right", "outer", "semi", "anti"):
        raise ValueError("how must be left|inner|right|outer|semi|anti")
    import numpy as _np
    from kamae_ray.functions import segments as S
    from kamae_ray.base import dataset_schema

    filter_only = how in ("semi", "anti")
    l_schema, r_schema = dataset_schema(left), dataset_schema(right)
    l_names = list(l_schema.names)
    payload = [] if filter_only else [
        c for c in (right_cols or r_schema.names) if c not in on
    ]
    payload_out = [f"{c}{suffix}" if c in l_names else c for c in payload]
    r_types = {f.name: f.type for f in r_schema}
    l_types = {f.name: f.type for f in l_schema}
    _SIDE = "__kr_jside"
    _SALTJ = "__kr_jsalt"
    _REPL = "__kr_jrepl"

    # --- hot-key detection (Dataset path only; a Table is one block anyway)
    salts = 0
    hot_keys_arr = None  # combined-key array (l_types) of hot keys
    if salt_partitions and not isinstance(left, pa.Table):
        from kamae_ray.functions.skew import detect_hot_keys

        salts = 16 if salt_partitions == "auto" else int(salt_partitions)
        hot_l = detect_hot_keys(left, on, hot_key_rows)
        hot_r = detect_hot_keys(right, on, hot_key_rows)
        # normalize both to the LEFT key types before building combined keys
        def _norm(t: pa.Table) -> pa.Table:
            return pa.table({k: pc.cast(A.as_array(t.column(k)), l_types[k], safe=False) for k in on})
        hot = pa.concat_tables([_norm(hot_l), _norm(hot_r)])
        if hot.num_rows:
            hot_keys_arr = pc.unique(_combined_key(hot, on))
        else:
            salts = 0

    def prep(batch: pa.Table, side: int) -> pa.Table:
        if filter_only and side == 1 and batch.num_rows:
            # membership only: block-level combiner — one right row per
            # distinct key leaves this block (shrinks the shuffle)
            codes = S.group_ids(batch, on)
            _, first = np.unique(codes, return_index=True)
            if len(first) < batch.num_rows:
                batch = batch.take(pa.array(np.sort(first)))
        n = batch.num_rows
        cols = {}
        if side == 0:
            for c in l_names:
                cols[c] = batch.column(c)
            for c, out_name in zip(payload, payload_out):
                cols[out_name] = pa.nulls(n, r_types[c])
        else:
            for c in l_names:
                if c in on:
                    cols[c] = pc.cast(A.as_array(batch.column(c)), l_types[c], safe=False)
                else:
                    cols[c] = pa.nulls(n, l_types[c])
            for c, out_name in zip(payload, payload_out):
                cols[out_name] = batch.column(c)
        cols[_SIDE] = pa.array(np.full(n, side, dtype=np.int8))
        if salts:
            key = _combined_key(pa.table({k: cols[k] for k in on}), on)
            hot_m = pc.is_valid(pc.index_in(key, value_set=hot_keys_arr)).to_numpy(zero_copy_only=False)
            salt = np.zeros(n, dtype=np.int32)
            repl = np.zeros(n, dtype=np.int8)
            if side == 0:
                # split hot-left rows round-robin; salt 0 always receives the
                # first hot row of each batch (right-unmatched safety proof)
                salt[hot_m] = np.arange(int(hot_m.sum())) % salts
                cols[_SALTJ] = pa.array(salt)
                cols[_REPL] = pa.array(repl)
                return pa.table(cols)
            cols[_SALTJ] = pa.array(salt)
            cols[_REPL] = pa.array(repl)
            out = pa.table(cols)
            hot_idx = np.flatnonzero(hot_m)
            if len(hot_idx):
                # replicate hot-key right rows into salts 1..S-1 (tagged)
                extra_idx = np.tile(hot_idx, salts - 1)
                extra = out.take(pa.array(extra_idx))
                extra = extra.set_column(
                    extra.column_names.index(_SALTJ), _SALTJ,
                    pa.array(np.repeat(np.arange(1, salts, dtype=np.int32), len(hot_idx))),
                )
                extra = extra.set_column(
                    extra.column_names.index(_REPL), _REPL,
                    pa.array(np.ones(len(extra_idx), np.int8)),
                )
                out = pa.concat_tables([out, extra])
            return out
        return pa.table(cols)

    group_cols = on + ([_SALTJ] if salts else [])
    meta_cols = [_SIDE] + ([_SALTJ, _REPL] if salts else [])

    def merge_parts(block: pa.Table):
        """Generator: join result for one key-sorted block, oversized key
        segments emitted in <= max_group_product-row chunks."""
        n = block.num_rows
        if n == 0:
            yield block.drop_columns(meta_cols)
            return
        # SQL NULL semantics: rows whose key tuple contains a null never match.
        nullmask = _np.zeros(n, dtype=bool)
        for k in on:
            col = A.as_array(block.column(k))
            if col.null_count:
                nullmask |= pc.is_null(col).to_numpy(zero_copy_only=False)
        null_out = None
        if nullmask.any():
            sd = block.column(_SIDE).to_numpy(zero_copy_only=False)
            keep = _np.zeros(n, dtype=bool)
            if how in ("left", "outer", "anti"):  # anti: NOT EXISTS keeps null keys
                keep |= nullmask & (sd == 0)
            if how in ("right", "outer"):
                keep |= nullmask & (sd == 1)
            if keep.any():
                null_out = block.filter(pa.array(keep)).drop_columns(meta_cols)
            block = block.filter(pa.array(~nullmask))
            n = block.num_rows
            if n == 0:
                out = block.drop_columns(meta_cols)
                yield pa.concat_tables([out, null_out.select(out.column_names)]) if null_out is not None else out
                return
        side = block.column(_SIDE).to_numpy(zero_copy_only=False)
        gids = S.group_ids(block, group_cols)
        order = _np.lexsort((side, gids))
        gs, ss = gids[order], side[order]
        starts, lens = S.segments(gs)
        # per segment: lefts sort first (side 0), rights after
        n_left = _np.zeros(len(starts), dtype=_np.int64)
        _np.add.at(n_left, _np.searchsorted(starts, _np.nonzero(ss == 0)[0], side="right") - 1, 1)
        n_right = lens - n_left
        if filter_only:
            # semi: left rows in segments with >=1 right row; anti: with none.
            # No cross-product — output is a subset of the left rows.
            seg_idx = _np.repeat(_np.arange(len(starts)), lens)
            want = (ss == 0) & (
                (n_right[seg_idx] > 0) if how == "semi" else (n_right[seg_idx] == 0)
            )
            out = block.take(pa.array(order[want])).drop_columns(meta_cols)
            if null_out is not None:
                out = pa.concat_tables([out, null_out.select(out.column_names)])
            yield out
            return
        prod = n_left * n_right
        keep_left_solo = how in ("left", "outer")
        # right-unmatched rows (right/outer): right rows in segments with no
        # lefts pass through directly — their left columns are already null
        # from prep; replicated salt copies are excluded (only the salt-0
        # original may emit unmatched)
        extra = None
        if how in ("right", "outer"):
            seg_idx = _np.repeat(_np.arange(len(starts)), lens)
            rmask = (ss == 1) & (n_left[seg_idx] == 0)
            if salts:
                repl = block.column(_REPL).to_numpy(zero_copy_only=False)
                rmask &= repl[order] == 0
            if rmask.any():
                extra = block.take(pa.array(order[rmask])).drop_columns(meta_cols)
        if null_out is not None:
            nn = null_out.select([c for c in block.column_names if c not in meta_cols])
            extra = pa.concat_tables([t for t in (extra, nn) if t is not None])

        def emit(seg_sel: _np.ndarray, chunk: tuple[int, int] | None = None):
            """Materialize the join output for the selected segments (all
            matched/solo rows, or one [lo, hi) output-row slice)."""
            sel_starts = starts[seg_sel]
            sel_nl = n_left[seg_sel]
            sel_nr = n_right[seg_sel]
            out_per = _np.where(sel_nr > 0, sel_nl * sel_nr, sel_nl if keep_left_solo else 0)
            out_off = _np.concatenate([[0], _np.cumsum(out_per)])
            total = int(out_off[-1])
            lo, hi = (0, total) if chunk is None else chunk
            if hi <= lo:
                return None
            within_abs = _np.arange(lo, hi, dtype=_np.int64)
            seg_of = _np.searchsorted(out_off, within_abs, side="right") - 1
            within = within_abs - out_off[seg_of]
            R = sel_nr[seg_of]
            Rdiv = _np.where(R > 0, R, 1)
            li = within // Rdiv
            ri = within % Rdiv
            matched = R > 0
            left_rows = order[sel_starts[seg_of] + li]
            right_pos = _np.where(matched, sel_starts[seg_of] + sel_nl[seg_of] + ri, sel_starts[seg_of] + li)
            right_rows = order[right_pos]
            cols = {}
            left_part = block.take(pa.array(left_rows))
            right_part = block.take(pa.array(right_rows))
            for c in block.column_names:
                if c in meta_cols:
                    continue
                if c in payload_out:
                    taken = right_part.column(c)
                    if not matched.all():
                        taken = pc.if_else(pa.array(matched), taken.combine_chunks(), pa.nulls(hi - lo, taken.type))
                    cols[c] = taken
                else:
                    cols[c] = left_part.column(c)
            return pa.table(cols)

        small = prod <= max_group_product
        emitted = False
        first = emit(_np.flatnonzero(small))
        if first is not None or extra is not None:
            parts = [t for t in (first, extra.select(first.column_names) if (extra is not None and first is not None) else extra) if t is not None]
            yield pa.concat_tables(parts) if len(parts) > 1 else parts[0]
            emitted = True
        big = _np.flatnonzero(~small)
        for b in big:
            seg = _np.array([b])
            total = int(prod[b]) if n_right[b] > 0 else (int(n_left[b]) if keep_left_solo else 0)
            for lo in range(0, total, max_group_product):
                t = emit(seg, (lo, min(lo + max_group_product, total)))
                if t is not None:
                    yield t
                    emitted = True
        if not emitted:
            yield block.take(pa.array([], pa.int64())).drop_columns(meta_cols)

    merge_parts.__name__ = "shuffle_join_merge"
    if isinstance(left, pa.Table):
        both = pa.concat_tables([prep(left, 0), prep(right, 1)])
        return pa.concat_tables(list(merge_parts(both)))
    import ray  # noqa: F401  (Dataset path)
    from kamae_ray.stages.window import _NamedFn, sorted_block_apply
    lt = left.map_batches(_NamedFn(lambda b: prep(b, 0), "join_prep_left"), batch_format="pyarrow", zero_copy_batch=True)
    rt = right.map_batches(_NamedFn(lambda b: prep(b, 1), "join_prep_right"), batch_format="pyarrow", zero_copy_batch=True)
    return sorted_block_apply(lt.union(rt), group_cols, merge_parts, "shuffle_join_merge")


def _bloom_hashes(table_or_batch: pa.Table, on: list[str]):
    """(h1, h2, valid) double-hashing bases for the join key tuple: h2 is
    odd so the Kirsch-Mitzenmacher probe sequence h1 + i*h2 covers the
    power-of-two bit space. Null key tuples are invalid (SQL: never match)."""
    from kamae_ray.stages.sketches import _hash_any, _splitmix64

    h1, valid = _hash_any(_combined_key(table_or_batch, on))
    with np.errstate(over="ignore"):
        h2 = _splitmix64(h1) | np.uint64(1)
    return h1, h2, valid


def bloom_semi_join(left, right, on: str | list[str], how: str = "semi",
                    bits_log2: int = 23, n_hashes: int = 4,
                    reduce_partitions: int = 8):
    """EXACT SQL EXISTS / NOT EXISTS filter (semi/anti join) with a Bloom
    prefilter — the scale plan for a right side whose distinct keys are too
    big to broadcast while the left is far bigger still:

    1. right blocks each build a local 2^bits_log2-bit Bloom bitmap of their
       distinct keys (a FIXED-size partial, independent of key count);
    2. bitmaps OR-reduce in two levels (per-block -> ``reduce_partitions``
       groups -> driver), so driver traffic is O(reduce_partitions * 2^bits)
       bytes, never O(keys);
    3. the broadcast bitmap filters the left in one map pass — only bloom
       candidates (true matches + ~fp_rate of the rest) enter the exact
       :func:`shuffle_join` verify, shrinking the all-to-all exchange by the
       left's non-matching fraction;
    4. the verify join keeps the result EXACT (false positives are dropped
       there), so the output equals plain ``shuffle_join(..., how)``.

    ``how='anti'``: rows the bloom rejects are DEFINITE non-matches and
    bypass the exchange entirely; only candidates are verified. (The anti
    path evaluates the prefilter map twice — once per branch — because both
    branches stream from the input; the hash is cheap relative to the
    exchange it avoids.) Size ``bits_log2`` to ~10 bits per expected distinct
    right key for a ~1% false-positive rate."""
    on = [on] if isinstance(on, str) else list(on)
    if how not in ("semi", "anti"):
        raise ValueError("how must be semi|anti")
    if not 10 <= bits_log2 <= 33:
        raise ValueError("bits_log2 must be in [10, 33]")
    if n_hashes < 1:
        raise ValueError("n_hashes must be >= 1")
    m = np.uint64(1 << bits_log2)
    mask = np.uint64(m - np.uint64(1))
    n_words = int(m) >> 6

    def bloom_partial(block: pa.Table) -> pa.Table:
        words = np.zeros(n_words, np.uint64)
        if block.num_rows:
            h1, h2, valid = _bloom_hashes(block, on)
            h1, h2 = h1[valid], h2[valid]
            with np.errstate(over="ignore"):
                for i in range(n_hashes):
                    pos = (h1 + np.uint64(i) * h2) & mask
                    np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                                     np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({"__bloom": pa.array([words.tobytes()], pa.binary())})

    bloom_partial.__name__ = "bloom_build_partial"

    def or_rows(block: pa.Table) -> pa.Table:
        acc = np.zeros(n_words, np.uint64)
        for b in block.column("__bloom").to_pylist():
            acc |= np.frombuffer(b, np.uint64)
        return pa.table({"__bloom": pa.array([acc.tobytes()], pa.binary())})

    or_rows.__name__ = "bloom_or_reduce"

    table_path = isinstance(left, pa.Table)
    if isinstance(right, pa.Table):
        words = np.frombuffer(
            bloom_partial(right).column("__bloom")[0].as_py(), np.uint64
        ).copy()
    else:
        from kamae_ray.base import collect_tables

        parts = right.map_batches(bloom_partial, batch_format="pyarrow",
                                  zero_copy_batch=True, batch_size=None)
        parts = parts.repartition(reduce_partitions).map_batches(
            or_rows, batch_format="pyarrow", batch_size=None)
        words = np.zeros(n_words, np.uint64)
        for t in collect_tables(parts):
            for b in t.column("__bloom").to_pylist():
                words |= np.frombuffer(b, np.uint64)

    def candidate_mask(block: pa.Table, w: np.ndarray) -> np.ndarray:
        h1, h2, ok = _bloom_hashes(block, on)
        with np.errstate(over="ignore"):
            for i in range(n_hashes):
                pos = (h1 + np.uint64(i) * h2) & mask
                bit = (w[(pos >> np.uint64(6)).astype(np.int64)]
                       >> (pos & np.uint64(63))) & np.uint64(1)
                ok &= bit.astype(bool)
                if not ok.any():
                    break
        return ok

    if table_path:
        cand = candidate_mask(left, words) if left.num_rows else np.zeros(0, bool)
        cands = left.filter(pa.array(cand))
        if not isinstance(right, pa.Table):
            import ray

            cands = ray.data.from_arrow(cands)
        verified = shuffle_join(cands, right, on, how=how)
        if how == "semi":
            return verified
        definite = left.filter(pa.array(~cand)) if left.num_rows else left
        if isinstance(verified, pa.Table):
            return pa.concat_tables([definite, verified])
        import ray

        return ray.data.from_arrow(definite).union(verified)
    import ray

    words_ref = ray.put(words)

    def keep(block: pa.Table) -> pa.Table:
        if not block.num_rows:
            return block
        return block.filter(pa.array(candidate_mask(block, ray.get(words_ref))))

    keep.__name__ = "bloom_prefilter"

    def reject(block: pa.Table) -> pa.Table:
        if not block.num_rows:
            return block
        return block.filter(pa.array(~candidate_mask(block, ray.get(words_ref))))

    reject.__name__ = "bloom_definite_nonmatch"
    cands = left.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True,
                             batch_size=None)
    verified = shuffle_join(cands, right, on, how=how)
    if how == "semi":
        return verified
    definite = left.map_batches(reject, batch_format="pyarrow", zero_copy_batch=True,
                                batch_size=None)
    return definite.union(verified)


def fuzzy_join(
    ds,
    right: pa.Table,
    left_on: str,
    right_on: str | None = None,
    right_cols: list[str] | None = None,
    max_distance: int | None = None,
    how: str = "left",
    suffix: str = "_r",
    out_distance: str = "distance",
    max_len: int = 128,
):
    """Nearest-string (Levenshtein) lookup join — entity resolution against a
    small dimension table: each left row matches the right row whose
    ``right_on`` value has the smallest edit distance to ``left_on``
    (deterministic ties: lexicographically smallest right value); matches
    farther than ``max_distance`` (when set) are unmatched. ``how`` is
    ``'left'`` or ``'inner'``. Null left values never match (SQL semantics);
    duplicate right values are rejected (lookup-join contract, as
    broadcast_join). Appends the matched payload plus ``out_distance``.

    Scale plan: the right side is broadcast ONCE; per batch only the
    DISTINCT left values are scored (dictionary encode) with the vectorized
    Wagner-Fischer matrix (functions/editdist.py) — no shuffle, no per-pair
    Python."""
    right_on = right_on or left_on
    if how not in ("left", "inner"):
        raise ValueError("how must be left|inner")
    from kamae_ray.functions.editdist import levenshtein_matrix

    rvals_all = pc.cast(A.as_array(right.column(right_on)), pa.string(), safe=False)
    if rvals_all.null_count:
        right = right.filter(pc.is_valid(rvals_all))
        rvals_all = pc.cast(A.as_array(right.column(right_on)), pa.string(), safe=False)
    order = pc.sort_indices(rvals_all)
    right = right.take(order)
    rvals = pc.cast(A.as_array(right.column(right_on)), pa.string(), safe=False)
    if len(pc.unique(rvals)) != len(right):
        raise ValueError("fuzzy_join right side has duplicate values — a nearest-match lookup needs unique keys")
    payload = [c for c in (right_cols or right.column_names) if c != right_on]
    rpayload = right.select(payload)

    def match_batch(batch: pa.Table, rv: pa.Array, pay: pa.Table) -> pa.Table:
        left_names = set(batch.column_names)
        lvals = pc.cast(A.as_array(batch.column(left_on)), pa.string(), safe=False)
        d = lvals.dictionary_encode()
        codes = pc.fill_null(d.indices, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        M = levenshtein_matrix(d.dictionary, rv, max_len=max_len)  # distinct once
        if M.shape[0] == 0 or M.shape[1] == 0:  # all-null batch / empty right
            idx = np.full(max(len(d.dictionary), 1), -1, np.int64)
            dist = np.full(max(len(d.dictionary), 1), -1, np.int64)
        else:
            idx = M.argmin(axis=1).astype(np.int64)  # rv sorted: first min = smallest value
            dist = M[np.arange(M.shape[0]), idx].astype(np.int64)
        row_idx = idx[codes]
        row_dist = dist[codes]
        matched = row_idx >= 0
        if max_distance is not None:
            matched &= row_dist <= max_distance
        if lvals.null_count:
            matched &= lvals.is_valid().to_numpy(zero_copy_only=False)
        if len(rv):
            take = pa.array(np.where(matched, row_idx, 0), pa.int64())
        else:
            take = pa.nulls(len(matched), pa.int64())  # take(null) -> null payload
        mpa = pa.array(matched)
        out = batch
        for c in pay.column_names:
            name = f"{c}{suffix}" if c in left_names else c
            colv = A.as_array(pay.column(c)).take(take)
            if not matched.all():
                colv = pc.if_else(mpa, colv, pa.nulls(len(matched), colv.type))
            out = out.append_column(name, colv)
        dcol = pa.array(np.where(matched, row_dist, 0), pa.int64())
        if not matched.all():
            dcol = pc.if_else(mpa, dcol, pa.nulls(len(matched), pa.int64()))
        out = out.append_column(out_distance, dcol)
        if how == "inner":
            out = out.filter(mpa)
        return out

    if isinstance(ds, pa.Table):
        return match_batch(ds, rvals, rpayload)
    import ray

    ref = ray.put({"rv": rvals, "pay": rpayload})

    def fjoin(batch: pa.Table) -> pa.Table:
        r = ray.get(ref)
        return match_batch(batch, r["rv"], r["pay"])

    fjoin.__name__ = "fuzzy_join"
    return ds.map_batches(fjoin, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def cross_join(ds, right: pa.Table, suffix: str = "_r", max_right_rows: int = 100_000):
    """SQL CROSS JOIN against a SMALL broadcast right table: every left row
    paired with every right row (feature-cross / grid-expansion shape).
    The right side ships once (``ray.put``); each block emits
    ``rows x len(right)`` output — guarded by ``max_right_rows`` because the
    fan-out is multiplicative by design. Left columns keep their names;
    colliding right columns get ``suffix``."""
    if right.num_rows > max_right_rows:
        raise ValueError(
            f"cross_join right side has {right.num_rows} rows > "
            f"max_right_rows={max_right_rows} — the output would fan out "
            "multiplicatively; raise the cap explicitly if intended"
        )
    right = right.combine_chunks()

    def xjoin(batch: pa.Table, rt: pa.Table) -> pa.Table:
        n, m = batch.num_rows, rt.num_rows
        left_names = set(batch.column_names)
        li = pa.array(np.repeat(np.arange(n, dtype=np.int64), m))
        ri = pa.array(np.tile(np.arange(m, dtype=np.int64), n))
        cols = {c: A.as_array(batch.column(c)).take(li) for c in batch.column_names}
        for c in rt.column_names:
            out_name = f"{c}{suffix}" if c in left_names else c
            cols[out_name] = A.as_array(rt.column(c)).take(ri)
        return pa.table(cols)

    if isinstance(ds, pa.Table):
        return xjoin(ds, right)
    import ray

    ref = ray.put(right)

    def xj(batch: pa.Table) -> pa.Table:
        return xjoin(batch, ray.get(ref))

    xj.__name__ = "cross_join"
    return ds.map_batches(xj, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
