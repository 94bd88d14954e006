"""Sequence packing for LLM pretraining data: concatenate documents' token
streams in a deterministic global order and chop into fixed-length training
sequences ("concat-and-chunk", the standard pretraining packing).

No reference analog (kamae stops at per-row features; packing is the step
between a deduped corpus and the trainer). The distributed shape is the
``global_cumsum`` prefix-sum plan: a tiny bucket-sum pass plus ONE
sort-shuffle — no serial scan, no driver materialization of rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from kamae_ray.stages.aggregate import global_cumsum


def pack_sequences(ds, id_col: str, count_col: str, seq_len: int,
                   bucket_width: int = 65536):
    """Assign every document its token span in the packed stream.

    Documents are concatenated in ascending ``id_col`` order (unique non-null
    integer ids); the stream is chopped into sequences of ``seq_len`` tokens.
    Rows where ``count_col`` <= 0 or null are dropped (they occupy no
    tokens). Output adds, all int64 and exact:

    - ``tok_offset``  — the doc's first token position in the global stream
      (= SQL ``SUM(count) OVER (ORDER BY id ROWS ... 1 PRECEDING)``),
    - ``seq_first`` / ``seq_last`` — first/last training sequence the doc's
      tokens land in (``tok_offset // seq_len`` etc.); a doc spanning
      multiple sequences is split across them, exactly like the usual
      pretraining loader.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    L = np.int64(seq_len)

    def keep_pos(block: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        c = pc.cast(block.column(count_col), pa.int64(), safe=False)
        return block.filter(pc.fill_null(pc.greater(c, 0), False))

    keep_pos.__name__ = "drop_empty_docs"
    if isinstance(ds, pa.Table):
        kept = keep_pos(ds)
    else:
        kept = ds.map_batches(keep_pos, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    out = global_cumsum(kept, id_col, count_col, out_col="tok_offset",
                        bucket_width=bucket_width, exclusive=True)

    def spans(block: pa.Table) -> pa.Table:
        off = block.column("tok_offset").to_numpy(zero_copy_only=False)
        n = block.column(count_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return block.append_column("seq_first", pa.array(off // L)) \
                    .append_column("seq_last", pa.array((off + n - 1) // L))

    spans.__name__ = "seq_spans"
    if isinstance(out, pa.Table):
        return spans(out)
    return out.map_batches(spans, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def balanced_shards(ds, id_col: str, weight_col: str, num_shards: int,
                    max_weight: int = 1 << 20, max_id: int = 1 << 32,
                    out_col: str = "shard"):
    """Weight-balanced shard assignment ("snake" / boustrophedon deal) for
    training-data sharding: rows ranked by (``weight_col`` DESC, ``id_col``
    ASC) deal into shards 0,1,..,S-1,S-1,..,1,0,0,1,.. — the order-free
    cousin of the sequential LPT greedy. Every pair of adjacent passes gives
    each shard one heavy + one light item, so shard weight totals stay
    within ~one item of each other for realistic (heavy-tailed) weight
    distributions, unlike hash sharding which only balances COUNTS.

    Deterministic and SQL-reproducible:
    ``m = rank % 2S; shard = m if m < S else 2S-1-m`` with
    ``rank = ROW_NUMBER() OVER (ORDER BY weight DESC, id) - 1``.

    Scale plan: the rank is ``global_cumsum(ones)`` over the composite
    order key ``(max_weight-1-w) * max_id + id`` — unique int64s, monotone
    in the target order; ``bucket_width = max_id`` makes the cumsum bucket
    id the (inverted) weight itself, so the driver's bucket prefix is
    O(distinct weights), corpus-size-independent. Requires integer weights
    in [0, max_weight) and unique non-null integer ids in [0, max_id)
    (both raise per block when violated); rows with null weight are
    dropped (they cannot be ranked)."""
    S = int(num_shards)
    if S < 1:
        raise ValueError("num_shards must be >= 1")
    mw, mi = np.int64(max_weight), np.int64(max_id)
    if int(mw) * int(mi) >= 1 << 63:
        raise ValueError("max_weight * max_id must fit int64")

    def add_key(block: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        w_arr = block.column(weight_col)
        if pc.any(pc.is_null(w_arr, nan_is_null=True)).as_py():
            block = block.filter(pc.is_valid(w_arr))
        w = block.column(weight_col).to_numpy(zero_copy_only=False).astype(np.int64)
        i = block.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(w) and (w.min() < 0 or w.max() >= mw):
            raise ValueError(f"weights outside [0, {int(mw)}) — raise max_weight")
        if len(i) and (i.min() < 0 or i.max() >= mi):
            raise ValueError(f"ids outside [0, {int(mi)}) — raise max_id")
        key = (mw - 1 - w) * mi + i
        block = block.append_column("__kr_bsk", pa.array(key, pa.int64()))
        return block.append_column("__kr_one", pa.array(np.ones(len(w), np.int64)))

    add_key.__name__ = "shard_order_key"
    keyed = add_key(ds) if isinstance(ds, pa.Table) else ds.map_batches(
        add_key, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    ranked = global_cumsum(keyed, "__kr_bsk", "__kr_one", out_col="__kr_rank",
                           bucket_width=int(mi), exclusive=True)

    def snake(block: pa.Table) -> pa.Table:
        r = block.column("__kr_rank").to_numpy(zero_copy_only=False)
        m = r % np.int64(2 * S)
        shard = np.where(m < S, m, 2 * S - 1 - m).astype(np.int64)
        block = block.drop_columns(["__kr_bsk", "__kr_one", "__kr_rank"])
        return block.append_column(out_col, pa.array(shard, pa.int64()))

    snake.__name__ = "snake_shard"
    if isinstance(ranked, pa.Table):
        return snake(ranked)
    return ranked.map_batches(snake, batch_format="pyarrow", zero_copy_batch=True,
                              batch_size=None)


_NS_P = 0x9E3779B97F4A7C15  # Knuth multiplicative (shared with HashSplit)
_NS_Q = 0xC2B2AE3D27D4EB4F  # xxhash prime2


def negative_sampling(ds, key_col: str, item_col: str, num_items: int,
                      k: int = 4, salt: int = 0, output_col: str = "neg_item"):
    """Deterministic hash-based negative sampling over a (key, item)
    interaction table — the contrastive-training prep op (recommenders,
    two-tower retrieval): for each DISTINCT key emit up to ``k`` distinct
    candidate items

        ``((key + salt) * P + j * Q  mod 2^64) mod num_items``,  j in [0, k)

    then anti-join the observed positives away (SQL NOT EXISTS, exact).
    The sample is a pure function of (key, j, salt, num_items) — stable
    across runs, partitions and cluster sizes — and the uint64 arithmetic
    mirrors exactly in HUGEINT SQL (q_negatives oracle). Keys and items
    must be non-negative integers (ids); item ids are assumed dense in
    [0, num_items).

    Scale plan: candidates are k x distinct(keys) rows built by one
    vectorized map over the distinct-key table; the one shuffle is the
    anti-join, whose positive side block-dedups to distinct (key, item)
    before moving. Expected yield per key is k * (1 - interaction density);
    callers wanting exactly-k should over-sample and rank. Output columns:
    ``(key_col, output_col)``, both int64."""
    import pyarrow.compute as pc

    from kamae_ray.functions import arrays as A
    from kamae_ray.stages.aggregate import distinct
    from kamae_ray.stages.join import shuffle_join

    if num_items <= 0 or k <= 0 or salt < 0:
        raise ValueError("num_items and k must be positive, salt non-negative")

    def emit(batch: pa.Table) -> pa.Table:
        ka = A.as_array(batch.column(key_col))
        valid = pc.is_valid(ka).to_numpy(zero_copy_only=False)
        kv = pc.fill_null(pc.cast(ka, pa.int64(), safe=False), 0).to_numpy(
            zero_copy_only=False)[valid]
        if len(kv) and kv.min() < 0:
            raise ValueError("negative_sampling keys must be non-negative")
        rep = np.repeat(kv, k)
        j = np.tile(np.arange(k, dtype=np.uint64), len(kv))
        h = (rep.astype(np.uint64) + np.uint64(salt)) * np.uint64(_NS_P) \
            + j * np.uint64(_NS_Q)
        item = (h % np.uint64(num_items)).astype(np.int64)
        return pa.table({key_col: pa.array(rep), output_col: pa.array(item)})

    emit.__name__ = "emit_negative_candidates"
    keys = distinct(ds, [key_col])
    if isinstance(keys, pa.Table):
        cand = emit(keys)
        pos = pa.table({key_col: ds.column(key_col), output_col: ds.column(item_col)})
    else:
        cand = keys.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)

        def strip_pos(batch: pa.Table) -> pa.Table:
            return pa.table({
                key_col: pc.cast(A.as_array(batch.column(key_col)), pa.int64(), safe=False),
                output_col: pc.cast(A.as_array(batch.column(item_col)), pa.int64(), safe=False),
            })

        strip_pos.__name__ = "strip_positives"
        pos = ds.map_batches(strip_pos, batch_format="pyarrow", zero_copy_batch=True)
    # duplicate candidates (two j landing on one item) collapse first
    cand = distinct(cand, [key_col, output_col])
    return shuffle_join(cand, pos, on=[key_col, output_col], how="anti")


def negative_sampling_oracle_sql(pos_table: str, key_col: str, item_col: str,
                                 items_count_sql: str, k: int, salt: int,
                                 out_key: str, out_item: str) -> str:
    """GENERATED DuckDB oracle for :func:`negative_sampling` — the same
    (key+salt)*P + j*Q construction in HUGEINT with an explicit mod-2^64
    fold (non-negative keys by contract, so no negative-remainder
    normalization is needed), NOT EXISTS for the anti-join."""
    return (
        f"WITH ks AS (SELECT DISTINCT {key_col} AS kk FROM {pos_table} "
        f"WHERE {key_col} IS NOT NULL), "
        f"m AS (SELECT ({items_count_sql})::HUGEINT AS n), "
        f"c AS (SELECT kk, ((((kk::HUGEINT + {salt}) * {_NS_P} + j::HUGEINT * {_NS_Q}) "
        f"% 18446744073709551616) % (SELECT n FROM m))::BIGINT AS item "
        f"FROM ks, range(0, {k}) t(j)), "
        f"d AS (SELECT DISTINCT kk, item FROM c) "
        f"SELECT d.kk AS {out_key}, d.item AS {out_item} FROM d "
        f"WHERE NOT EXISTS (SELECT 1 FROM {pos_table} l "
        f"WHERE l.{key_col} = d.kk AND l.{item_col} = d.item)"
    )


def stratified_kfold(ds, stratum_cols, id_col: str, k: int, salt: int = 0,
                     output_col: str = "fold"):
    """Balanced, deterministic stratified K-fold assignment — the CV-split
    prep op: within each stratum, rows rank by the salted Knuth
    multiplicative hash of their id (tiebreak id) and take
    ``fold = (rank - 1) % k``, so every stratum's folds differ by at most
    one row (EXACT balance, unlike independent hash-mod splits) and the
    assignment is a pure function of (ids in the stratum, salt) — stable
    across runs, partitionings and cluster sizes. Ids must be non-negative
    integers; the uint64 arithmetic mirrors exactly in HUGEINT SQL
    (q_kfold oracle).

    Scale plan: ONE stratum sort-shuffle + an in-block lexsort over the
    hash; nothing else moves."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from kamae_ray.functions import arrays as A
    from kamae_ray.functions import segments as S
    from kamae_ray.stages.window import sorted_block_apply

    stratum_cols = [stratum_cols] if isinstance(stratum_cols, str) else list(stratum_cols)
    if k < 2:
        raise ValueError("k must be >= 2")

    def kern(block: pa.Table) -> pa.Table:
        n = block.num_rows
        if n == 0:
            return block.append_column(output_col, pa.array([], pa.int64()))
        ids = pc.cast(A.as_array(block.column(id_col)), pa.int64(),
                      safe=False).to_numpy(zero_copy_only=False)
        if ids.min() < 0:
            raise ValueError("stratified_kfold ids must be non-negative")
        gids = S.group_ids(block, stratum_cols)
        h = (ids.astype(np.uint64) + np.uint64(salt)) * np.uint64(_NS_P)
        # a signed view of the uint64 hash is order-INconsistent across the
        # sign boundary — sort on (high bit, then signed low 63) instead
        order = np.lexsort((ids, h.astype(np.int64),
                            (h >> np.uint64(63)).astype(np.int64), gids))
        starts, lens = S.segments(gids[order])
        rank = (np.arange(n, dtype=np.int64) - np.repeat(starts, lens))
        fold = np.empty(n, np.int64)
        fold[order] = rank % np.int64(k)
        return block.append_column(output_col, pa.array(fold))

    if isinstance(ds, pa.Table):
        return kern(ds)
    return sorted_block_apply(ds, stratum_cols, kern, "kfold_assign")


def rebalance_classes(ds, class_col: str, id_col: str, salt: int = 0,
                      max_classes: int = 100_000):
    """Deterministic majority-class downsampling — equalize class sizes to
    the minority count without resampling randomness: a row survives iff

        ``((id + salt) * P mod 2^64) mod n_class < n_min``

    (the q_negatives hash construction — a pure function of (id, salt) and
    the class counts, stable across partitions/cluster sizes and
    HUGEINT-mirrorable). Expected kept per class = n_min (exact in
    distribution; the rule is the standard hash-thinning used for
    class-balanced corpus sampling). Null classes are dropped. Ids
    non-negative ints.

    Scale plan: ONE partial-agg groupby for the O(classes) count table
    (driver-held, guarded by ``max_classes``), then a stateless broadcast
    filter map — the corpus never shuffles."""
    import pyarrow.compute as pc

    from kamae_ray.base import collect_tables
    from kamae_ray.functions import arrays as A
    from kamae_ray.stages.aggregate import groupby_agg

    def ones(batch: pa.Table) -> pa.Table:
        return pa.table({class_col: batch.column(class_col),
                         "__one": pa.array(np.ones(batch.num_rows, np.int64))})

    ones.__name__ = "rebalance_ones"
    if isinstance(ds, pa.Table):
        cells = groupby_agg(ones(ds), class_col, {"__one": ["count"]})
    else:
        parts = [t for t in collect_tables(groupby_agg(
            ds.map_batches(ones, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=None),
            class_col, {"__one": ["count"]})) if t.num_rows]
        cells = pa.concat_tables(parts) if parts else pa.table(
            {class_col: pa.array([], pa.string()),
             "__one_count": pa.array([], pa.int64())})
    if cells.num_rows > max_classes:
        raise ValueError(f"rebalance_classes saw {cells.num_rows} classes "
                         f"(> max_classes={max_classes})")
    carr = A.as_array(cells.column(class_col))
    keep = pc.is_valid(carr).to_numpy(zero_copy_only=False)
    counts = pc.cast(cells.column("__one_count"), pa.int64(), safe=False) \
        .to_numpy(zero_copy_only=False)[keep]
    classes = carr.filter(pa.array(keep))
    n_min = int(counts.min()) if len(counts) else 0

    def thin(batch: pa.Table) -> pa.Table:
        cl = A.as_array(batch.column(class_col))
        valid = pc.is_valid(cl)
        batch = batch.filter(valid)
        cl = A.as_array(batch.column(class_col))
        ids = pc.cast(A.as_array(batch.column(id_col)), pa.int64(),
                      safe=False).to_numpy(zero_copy_only=False)
        if len(ids) and ids.min() < 0:
            raise ValueError("rebalance_classes ids must be non-negative")
        d = cl.dictionary_encode()
        dvals = pc.cast(d.dictionary, classes.type, safe=False) if len(classes) \
            else d.dictionary
        pos = pc.index_in(dvals, value_set=classes) if len(classes) else \
            pa.nulls(len(dvals), pa.int32())
        pos = pc.fill_null(pos, -1).to_numpy(zero_copy_only=False).astype(np.int64)
        idx = pc.fill_null(d.indices, 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        rci = pos[idx] if len(pos) else np.full(len(ids), -1, np.int64)
        ng = np.where(rci >= 0, counts[np.maximum(rci, 0)] if len(counts) else 1, 1)
        h = (ids.astype(np.uint64) + np.uint64(salt)) * np.uint64(_NS_P)
        keep_row = (h % ng.astype(np.uint64)).astype(np.int64) < n_min
        keep_row &= rci >= 0
        return batch.filter(pa.array(keep_row))

    thin.__name__ = "rebalance_thin"
    if isinstance(ds, pa.Table):
        return thin(ds)
    return ds.map_batches(thin, batch_format="pyarrow", zero_copy_batch=True)
