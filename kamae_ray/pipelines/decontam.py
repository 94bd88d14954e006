"""Benchmark decontamination — flag corpus documents that share a word
n-gram with a (small) benchmark/eval set.

This is the standard LLM training-data hygiene pass (the "13-gram overlap"
rule popularized by GPT-3 / Gopher appendix decontamination): any training
document containing an exact word n-gram that also appears in a held-out
benchmark must be dropped or flagged before training. The reference engine
has no analog (kamae delegates corpus hygiene upstream); the distributed
shape here is the house broadcast pattern:

1. **Benchmark side (small by contract — an eval suite, not a corpus):**
   one pass collects the DISTINCT benchmark n-grams as (a) a sorted
   ``uint64`` rolling-hash array and (b) the exact gram strings
   (space-joined). Per-block dedup before the driver merge keeps the
   collect bounded by the benchmark's distinct-gram count.
2. **Corpus side:** ``ray.put`` the benchmark set ONCE; every ``map_batches``
   task reads it zero-copy from the local object store. Per batch, all full
   word n-grams are hashed with the same vectorized rolling polynomial used
   by the MinHash shingler (farmhash per DISTINCT word, never per
   occurrence), candidates are found with one ``searchsorted`` against the
   broadcast hash array, and ONLY candidate positions materialize their
   gram string for an exact ``pc.is_in`` string verification — hash
   collisions can therefore never produce a false flag. Output is the final
   per-document hit count (a document is one row, so its grams never span
   blocks: no shuffle anywhere on the corpus side).

Gram identity for the distinct-hit count is the 61-bit rolling hash of
verified (string-equal) grams; two DISTINCT matched grams colliding within
one document would undercount by one — probability ~ (grams/doc)^2 / 2^61,
and deterministic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kamae_ray.functions import arrays as A

_MERSENNE = (1 << 61) - 1
_P = np.uint64(0x9E3779B97F4A7C15)  # same rolling constant as the shingler


def _full_gram_data(texts: pa.Array, n: int):
    """Vectorized full word n-grams for a string array.

    Words = ``\\s+`` regex split (parity with the SQL oracle's
    ``regexp_split_to_array``); only documents with >= n words contribute
    grams (no short-doc padding — decontamination semantics, unlike the
    MinHash shingler). Returns ``(hashes uint64[G], doc_of int64[G],
    word_start int64[G], words_flat StringArray, offsets int64[rows+1])``
    where gram g covers ``words_flat[word_start[g] : word_start[g]+n]`` and
    row r's words are ``words_flat[offsets[r] : offsets[r+1]]``.
    """
    flat = pc.fill_null(pc.cast(texts, pa.string(), safe=False), "")
    nrows = len(flat)
    split = pc.split_pattern_regex(flat, pattern=r"\s+")
    levels, words = A.unwrap(A.as_array(split) if isinstance(split, pa.ChunkedArray) else split)
    offsets = np.asarray(levels[0][0])
    lens = np.diff(offsets)
    from kamae_ray.functions.farmhash import hash64_column

    d = words.dictionary_encode()
    wh, _ = hash64_column(d.dictionary)  # one hash per DISTINCT word
    idx = np.asarray(d.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
    whf = wh[idx] & np.uint64(_MERSENNE) if len(idx) else np.zeros(0, np.uint64)
    n_full = max(len(whf) - n + 1, 0)
    acc = np.zeros(n_full, dtype=np.uint64)
    with np.errstate(over="ignore"):  # uint64 wrap IS the hash arithmetic
        for j in range(n):
            acc = acc * _P + whf[j : n_full + j]
    n_g = np.maximum(lens - n + 1, 0).astype(np.int64)
    g_off = np.concatenate([[0], np.cumsum(n_g)])
    total = int(g_off[-1])
    doc_of = np.repeat(np.arange(nrows, dtype=np.int64), n_g)
    within = np.arange(total, dtype=np.int64) - np.repeat(g_off[:-1], n_g)
    word_start = offsets[:-1][doc_of] + within
    hashes = (acc[word_start] & np.uint64(_MERSENNE)) if total else np.zeros(0, np.uint64)
    return hashes, doc_of, word_start, words, np.asarray(offsets, dtype=np.int64)


def _gram_strings_at(words: pa.Array, word_start: np.ndarray, n: int) -> pa.Array:
    """Materialize the space-joined gram strings at the given start positions
    (called on CANDIDATES only — rare)."""
    if len(word_start) == 0:
        return pa.array([], pa.string())
    parts = [words.take(pa.array(word_start + j, pa.int64())) for j in range(n)]
    return A.as_array(pc.binary_join_element_wise(*parts, " "))


def benchmark_ngram_set(source, text_col: str, n: int = 3) -> dict:
    """Collect the distinct word n-grams of a (small) benchmark set.

    ``source`` is a ``pa.Table`` or a ``ray.data.Dataset``. Returns
    ``{"n", "hashes" (sorted uint64), "grams" (distinct StringArray)}``.
    Driver memory is O(distinct benchmark grams) — the benchmark-is-small
    contract; per-block dedup bounds what each task ships."""

    def block_pairs(block: pa.Table) -> pa.Table:
        h, _, ws, words, _ = _full_gram_data(A.as_array(block.column(text_col)), n)
        uh, first = np.unique(h, return_index=True)  # per-block dedup
        grams = _gram_strings_at(words, ws[first], n)
        return pa.table({"__kr_gh": pa.array(uh.view(np.int64), pa.int64()), "__kr_g": grams})

    if isinstance(source, pa.Table):
        parts = [block_pairs(source)]
    else:
        from kamae_ray.base import collect_tables

        ds = source.map_batches(
            block_pairs, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
        parts = collect_tables(ds)
    nonempty = [p for p in parts if p.num_rows]
    if not (nonempty or parts):  # zero blocks materialized: empty gram set
        return {"n": n, "hashes": np.zeros(0, np.uint64),
                "grams": pa.array([], pa.string())}
    merged = pa.concat_tables(nonempty or parts[:1])
    h = merged.column("__kr_gh").to_numpy(zero_copy_only=False).view(np.uint64)
    uh, first = np.unique(h, return_index=True)
    grams = A.as_array(merged.column("__kr_g").take(pa.array(first, pa.int64())))
    return {"n": n, "hashes": uh, "grams": grams}


def _decontam_batch(batch: pa.Table, bench: dict, text_col: str, id_col: str,
                    min_hits: int, keep_clean: bool, project: bool = True) -> pa.Table:
    n = bench["n"]
    bh: np.ndarray = bench["hashes"]
    h, doc_of, word_start, words, _ = _full_gram_data(A.as_array(batch.column(text_col)), n)
    if len(h) and len(bh):
        pos = np.searchsorted(bh, h)
        pos[pos == len(bh)] = 0
        cand = bh[pos] == h
    else:
        cand = np.zeros(len(h), dtype=bool)
    ci = np.flatnonzero(cand)
    if len(ci):
        # exact string verification of the rare hash candidates
        gs = _gram_strings_at(words, word_start[ci], n)
        ok = pc.is_in(gs, value_set=bench["grams"]).to_numpy(zero_copy_only=False)
        ci = ci[ok]
    if len(ci):
        # distinct (doc, gram-hash) pairs: lexsort + adjacent-diff (no 64-bit
        # pair packing — doc index needs more than the 3 spare hash bits)
        order = np.lexsort((h[ci], doc_of[ci]))
        d_s, h_s = doc_of[ci][order], h[ci][order]
        new = np.ones(len(d_s), dtype=bool)
        new[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
        docs, counts = np.unique(d_s[new], return_counts=True)
    else:
        docs = np.zeros(0, np.int64)
        counts = np.zeros(0, np.int64)
    n_hits = np.zeros(batch.num_rows, dtype=np.int64)
    n_hits[docs] = counts
    base = batch.select([id_col]) if project else batch
    out = base.append_column("n_hits", pa.array(n_hits, pa.int64()))
    if keep_clean:
        return out.filter(pa.array(n_hits < min_hits))
    return out.filter(pa.array(n_hits >= min_hits))


def decontaminate(
    ds,
    bench: dict,
    text_col: str,
    id_col: str,
    min_hits: int = 1,
    keep_clean: bool = False,
    project: bool = True,
):
    """Flag (or drop) corpus documents sharing >= ``min_hits`` DISTINCT word
    n-grams with the benchmark set from :func:`benchmark_ngram_set`.

    Returns ``(id_col, n_hits)`` rows for contaminated documents
    (``keep_clean=False``) or for clean ones (``keep_clean=True``,
    ``n_hits`` < min_hits — the "safe to train on" survivor list). ``ds``
    is a ``pa.Table`` or ``ray.data.Dataset``; the Dataset path broadcasts
    the benchmark set with ONE ``ray.put`` and never shuffles the corpus.
    ``project=False`` keeps ALL input columns (+ ``n_hits``) so the op can
    sit mid-pipeline (e.g. before dedup/packing)."""
    if isinstance(ds, pa.Table):
        return _decontam_batch(ds, bench, text_col, id_col, min_hits, keep_clean, project)
    import ray

    ref = ray.put(bench)

    def dec(batch: pa.Table) -> pa.Table:
        b = ray.get(ref)  # zero-copy from the local object store
        return _decontam_batch(batch, b, text_col, id_col, min_hits, keep_clean, project)

    dec.__name__ = "decontaminate"
    return ds.map_batches(dec, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def _doc_gram_block(batch: pa.Table, text_col: str, id_col: str, n: int) -> tuple:
    """(ids per gram, DISTINCT-per-doc gram hashes, per-doc distinct counts)."""
    h, doc_of, _, _, _ = _full_gram_data(A.as_array(batch.column(text_col)), n)
    ids = A.as_array(batch.column(id_col))
    if len(h):
        order = np.lexsort((h, doc_of))
        d_s, h_s = doc_of[order], h[order]
        keep = np.ones(len(d_s), dtype=bool)
        keep[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
        d_s, h_s = d_s[keep], h_s[keep]
    else:
        d_s = np.zeros(0, np.int64)
        h_s = np.zeros(0, np.uint64)
    docs_u, totals = np.unique(d_s, return_counts=True)
    return ids, d_s, h_s, docs_u, totals


def duplicate_passage_stats(ds, text_col: str, id_col: str, n: int = 13, min_docs: int = 2):
    """Per-document duplicated-passage fraction — the Lee et al. (2022)
    "Deduplicating Training Data" corpus-quality signal: for each document,
    the share of its DISTINCT word n-grams that also occur in at least
    ``min_docs - 1`` OTHER documents (n=13 is the paper's dedup window).

    Scale plan (no all-pairs, no driver state):

    1. totals pass — per-block kernel emits one (id, n_grams) row per doc
       (distinct grams per doc; a doc never spans blocks). No shuffle.
    2. dup pass — the (id, gram-hash) pairs take ONE sort-shuffle on the
       hash (the partitioning contract co-locates a gram's rows); a block
       kernel counts docs per gram segment and emits per-doc partial dup
       counts ONLY for grams meeting ``min_docs`` — the second (tiny)
       exchange aggregates those partials per doc.
    3. one ``shuffle_join`` stitches totals and dup counts (left join,
       missing -> 0). Output: (id, n_grams, n_dup, dup_frac), only docs
       with >= 1 full n-gram.

    Gram identity is the 61-bit rolling hash (same caveat as the MinHash
    shingler: a cross-doc collision could overcount dup grams, p ~
    distinct_grams^2 / 2^61, deterministic)."""
    from kamae_ray.stages.aggregate import groupby_agg
    from kamae_ray.stages.join import shuffle_join
    from kamae_ray.functions import segments as S

    def totals_block(batch: pa.Table) -> pa.Table:
        ids, _, _, docs_u, totals = _doc_gram_block(batch, text_col, id_col, n)
        return pa.table({
            id_col: ids.take(pa.array(docs_u, pa.int64())),
            "n_grams": pa.array(totals.astype(np.int64)),
        })

    totals_block.__name__ = "passage_totals"

    def pairs_block(batch: pa.Table) -> pa.Table:
        ids, d_s, h_s, _, _ = _doc_gram_block(batch, text_col, id_col, n)
        return pa.table({
            id_col: ids.take(pa.array(d_s, pa.int64())),
            "__kr_g": pa.array(h_s.view(np.int64), pa.int64()),
        })

    pairs_block.__name__ = "passage_grams"

    def dup_partials(block: pa.Table) -> pa.Table:
        # rows of one gram hash are co-located; group by the REAL hash value
        if block.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "c": pa.array([], pa.float64())})
        g = block.column("__kr_g").to_numpy(zero_copy_only=False)
        order = np.argsort(g, kind="stable")
        starts, lens = S.segments(g[order])
        kept = order[np.repeat(lens >= min_docs, lens)]
        ids = A.as_array(block.column(id_col)).take(pa.array(kept, pa.int64()))
        docs_u, counts = np.unique(ids.to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({
            id_col: pa.array(docs_u, pa.int64()),
            "c": pa.array(counts.astype(np.float64)),
        })

    dup_partials.__name__ = "passage_dup_partials"

    def finish(batch: pa.Table) -> pa.Table:
        nd = pc.fill_null(pc.cast(batch.column("c_sum"), pa.int64(), safe=False), 0)
        tot = batch.column("n_grams")
        frac = pc.divide(pc.cast(nd, pa.float64()), pc.cast(tot, pa.float64()))
        return pa.table({
            id_col: batch.column(id_col), "n_grams": tot,
            "n_dup": nd, "dup_frac": frac,
        })

    finish.__name__ = "passage_finish"

    if isinstance(ds, pa.Table):
        totals = totals_block(ds)
        nd = groupby_agg(dup_partials(pairs_block(ds)), id_col, {"c": ["sum"]})
        joined = shuffle_join(totals, nd, on=id_col, how="left")
        return finish(joined)

    from kamae_ray.stages.window import sorted_block_apply

    totals = ds.map_batches(totals_block, batch_format="pyarrow", zero_copy_batch=True,
                            batch_size=None)
    pairs = ds.map_batches(pairs_block, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=None)
    dups = sorted_block_apply(pairs, ["__kr_g"], dup_partials, "passage_dup")
    nd = groupby_agg(dups, id_col, {"c": ["sum"]})
    joined = shuffle_join(totals, nd, on=id_col, how="left")
    return joined.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True,
                              batch_size=None)


def _covered_mask(flag: np.ndarray, n: int) -> np.ndarray:
    """Coverage closure of dup-gram start flags: word i is covered iff some
    flagged start s exists with s <= i <= s+n-1. A start s and its n covered
    words are inside one document by construction, so the shifted ORs can
    never bleed across document boundaries."""
    covered = flag.copy()
    for j in range(1, n):
        covered[j:] |= flag[:-j]
    return covered


def _rebuild_from_flags(batch: pa.Table, flag: np.ndarray, offsets: np.ndarray,
                        words: pa.Array, text_col: str, id_col: str,
                        out_col: str, n: int) -> pa.Table:
    """Rebuild cleaned texts given a dup-start flag per flat word position.

    EVERY document is rebuilt from its word split and re-joined with single
    spaces (so whitespace normalization matches the SQL oracle's
    ``string_agg(word, ' ')`` on both covered and untouched docs)."""
    covered = _covered_mask(flag, n)
    keep = ~covered
    lens = np.diff(offsets)
    cs = np.concatenate([[0], np.cumsum(keep, dtype=np.int64)])
    kept_counts = cs[offsets[1:]] - cs[offsets[:-1]]
    new_off = np.concatenate([[0], np.cumsum(kept_counts)])
    kept_words = words.filter(pa.array(keep)) if len(keep) else words
    la = pa.ListArray.from_arrays(pa.array(new_off, pa.int32()),
                                  pc.cast(kept_words, pa.string(), safe=False))
    clean = A.as_array(pc.binary_join(la, " "))
    return pa.table({
        id_col: batch.column(id_col),
        out_col: clean,
        "n_removed": pa.array((lens - kept_counts).astype(np.int64), pa.int64()),
    })


def _dup_start_flags_from_set(batch: pa.Table, dup_sorted: np.ndarray,
                              text_col: str, n: int):
    """(flag per flat word position, offsets, words) via sorted-set membership."""
    h, _, word_start, words, offsets = _full_gram_data(
        A.as_array(batch.column(text_col)), n)
    nwords = int(offsets[-1]) if len(offsets) else 0
    flag = np.zeros(nwords, dtype=bool)
    if len(h) and len(dup_sorted):
        pos = np.searchsorted(dup_sorted, h)
        isdup = (pos < len(dup_sorted)) & (
            dup_sorted[np.minimum(pos, len(dup_sorted) - 1)] == h)
        flag[word_start[isdup]] = True
    return flag, offsets, words


def remove_duplicate_passages(
    ds,
    text_col: str,
    id_col: str,
    n: int = 5,
    min_docs: int = 2,
    out_col: str = "clean_text",
    broadcast_budget: int = 2_000_000,
    force_distributed: bool = False,
):
    """Lee et al. (2022) duplicate-passage REMOVAL (the rewrite,
    ``duplicate_passage_stats`` is the metric): drop every word covered by a
    word n-gram occurring in >= ``min_docs`` distinct documents, re-join the
    survivors with single spaces. Output: ``(id_col, out_col, n_removed)``,
    one row per input document (short docs pass through whitespace-normalized,
    ``n_removed = 0``).

    Scale plan (never all-pairs, no unbounded driver state):

    1. dup-gram discovery — distinct (doc, gram-hash) pairs take ONE
       sort-shuffle on the hash; a block kernel emits each gram hash whose
       segment spans >= ``min_docs`` docs. The dup set is materialized (it
       bounds both paths and is consumed twice on the distributed one).
    2a. broadcast path (dup set <= ``broadcast_budget`` grams): ``ray.put``
       the sorted hash array once; ONE ``map_batches`` over the corpus does
       searchsorted membership + coverage closure + rebuild. No corpus
       shuffle at all.
    2b. distributed path: per-gram occurrences (id, start, hash) inner-join
       the dup set on the hash (shuffle join), ``groupby_collect`` the start
       positions per doc, left-join those lists back onto the corpus, and a
       block kernel rebuilds. Driver stays O(1) in the dup-set size.

    Gram identity is the 61-bit rolling hash (same deterministic-collision
    caveat as :func:`duplicate_passage_stats`; a collision could over-remove,
    p ~ distinct_grams^2 / 2^61)."""
    from kamae_ray.functions import segments as S
    from kamae_ray.stages.aggregate import groupby_collect
    from kamae_ray.stages.join import shuffle_join
    from kamae_ray.stages.window import sorted_block_apply

    def drop_null_text(batch: pa.Table) -> pa.Table:
        # SQL split semantics: regexp_split_to_array(NULL) unnests to zero
        # rows, so the oracle emits no row for a null-text doc — drop them
        tcol = A.as_array(batch.column(text_col))
        return batch.filter(pc.is_valid(tcol)) if tcol.null_count else batch

    drop_null_text.__name__ = "dup_removal_valid_text"

    def pairs_block(batch: pa.Table) -> pa.Table:
        _, d_s, h_s, _, _ = _doc_gram_block(batch, text_col, id_col, n)
        ids = A.as_array(batch.column(id_col))
        return pa.table({
            id_col: ids.take(pa.array(d_s, pa.int64())),
            "__kr_g": pa.array(h_s.view(np.int64), pa.int64()),
        })

    pairs_block.__name__ = "dup_removal_grams"

    def dup_hashes_block(block: pa.Table) -> pa.Table:
        # rows of one gram hash are co-located after the sort; pairs are
        # already distinct per doc, so a segment's length == its doc count
        g = block.column("__kr_g").to_numpy(zero_copy_only=False)
        if len(g) == 0:
            return pa.table({"__kr_g": pa.array([], pa.int64())})
        order = np.argsort(g, kind="stable")
        starts, lens = S.segments(g[order])
        return pa.table({"__kr_g": pa.array(g[order][starts[lens >= min_docs]],
                                            pa.int64())})

    dup_hashes_block.__name__ = "dup_removal_dup_hashes"

    if isinstance(ds, pa.Table):
        ds = drop_null_text(ds)
        dup = dup_hashes_block(pairs_block(ds).sort_by("__kr_g"))
        dup_sorted = np.sort(
            dup.column("__kr_g").to_numpy(zero_copy_only=False).view(np.uint64))
        flag, offsets, words = _dup_start_flags_from_set(ds, dup_sorted, text_col, n)
        return _rebuild_from_flags(ds, flag, offsets, words, text_col, id_col,
                                   out_col, n)

    import ray

    ds = ds.map_batches(drop_null_text, batch_format="pyarrow",
                        zero_copy_batch=True, batch_size=None)
    pairs = ds.map_batches(pairs_block, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
    dups = sorted_block_apply(pairs, ["__kr_g"], dup_hashes_block,
                              "dup_removal_dup").materialize()
    n_dup = dups.count()

    if n_dup <= broadcast_budget and not force_distributed:
        from kamae_ray.base import collect_tables

        parts = [t.column("__kr_g").to_numpy(zero_copy_only=False)
                 for t in collect_tables(dups)]
        dup_sorted = np.sort(np.concatenate(parts).view(np.uint64)) if parts \
            else np.zeros(0, np.uint64)
        ref = ray.put(dup_sorted)

        def rebuild_bcast(batch: pa.Table) -> pa.Table:
            dup_arr = ray.get(ref)  # zero-copy from the local object store
            flag, offsets, words = _dup_start_flags_from_set(batch, dup_arr,
                                                             text_col, n)
            return _rebuild_from_flags(batch, flag, offsets, words, text_col,
                                       id_col, out_col, n)

        rebuild_bcast.__name__ = "dup_removal_rebuild"
        return ds.map_batches(rebuild_bcast, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)

    def occ_block(batch: pa.Table) -> pa.Table:
        h, doc_of, word_start, _, offsets = _full_gram_data(
            A.as_array(batch.column(text_col)), n)
        ids = A.as_array(batch.column(id_col))
        return pa.table({
            id_col: ids.take(pa.array(doc_of, pa.int64())),
            "__kr_s": pa.array(word_start - offsets[doc_of], pa.int64()),
            "__kr_g": pa.array(h.view(np.int64), pa.int64()),
        })

    occ_block.__name__ = "dup_removal_occurrences"

    occ = ds.map_batches(occ_block, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None)
    hits = shuffle_join(occ, dups, on="__kr_g", how="semi")
    starts = groupby_collect(hits, id_col, "__kr_s", order_col="__kr_s",
                             out_col="__kr_starts")
    joined = shuffle_join(ds, starts, on=id_col, how="left")

    def rebuild_dist(batch: pa.Table) -> pa.Table:
        _, _, _, words, offsets = _full_gram_data(
            A.as_array(batch.column(text_col)), n)
        nwords = int(offsets[-1]) if len(offsets) else 0
        flag = np.zeros(nwords, dtype=bool)
        sl = batch.column("__kr_starts")
        sl = sl.combine_chunks() if isinstance(sl, pa.ChunkedArray) else sl
        if batch.num_rows and len(sl):
            lists = pc.list_flatten(pc.fill_null(sl, [])).to_numpy(
                zero_copy_only=False).astype(np.int64)
            counts = pc.list_value_length(pc.fill_null(sl, [])).to_numpy(
                zero_copy_only=False).astype(np.int64)
            row_of = np.repeat(np.arange(batch.num_rows, dtype=np.int64), counts)
            flag[offsets[row_of] + lists] = True
        return _rebuild_from_flags(batch, flag, offsets, words, text_col,
                                   id_col, out_col, n)

    rebuild_dist.__name__ = "dup_removal_rebuild_dist"
    return joined.map_batches(rebuild_dist, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)


def semantic_decontaminate(
    ds,
    bench_vecs,
    emb_col: str,
    id_col: str,
    threshold: float = 0.9,
    project: bool = True,
):
    """Semantic (embedding-space) benchmark decontamination: drop every
    corpus row whose embedding has cosine >= ``threshold`` to ANY benchmark
    vector — the embedding analog of the n-gram ``decontaminate`` rule,
    catching paraphrased/reworded eval contamination an exact-gram rule
    misses.

    Distributed shape = the house broadcast pattern: the benchmark matrix is
    small by contract (an eval suite), normalized once and shipped via
    ``ray.put``; each corpus batch does ONE (batch x bench) matmul and keeps
    rows with max cosine under the threshold. NO shuffle, no corpus-side
    state. Returns survivors as ``(id_col, max_bench_cosine)``
    (``project=False`` keeps ALL original columns + max_bench_cosine, for
    chaining)."""
    bn = np.asarray(bench_vecs, dtype=np.float64)
    norms = np.linalg.norm(bn, axis=1)
    bn = bn / np.where(norms == 0, 1, norms)[:, None]

    class _Filter:
        def __init__(self, bench_ref):
            self._ref = bench_ref
            self._b = None

        def _bench(self) -> np.ndarray:
            if self._b is None:
                import ray

                self._b = ray.get(self._ref) if not isinstance(self._ref, np.ndarray) else self._ref
            return self._b

        def __call__(self, batch: pa.Table) -> pa.Table:
            b = self._bench()
            m, _ = A.matrix_view(batch.column(emb_col))
            x = m.astype(np.float64)
            xn = x / np.where(np.linalg.norm(x, axis=1) == 0, 1, np.linalg.norm(x, axis=1))[:, None]
            mx = (xn @ b.T).max(axis=1) if len(b) else np.full(len(x), -1.0)
            keep = mx < threshold
            out = batch if not project else batch.select([id_col])
            out = out.append_column("max_bench_cosine", pa.array(mx, pa.float64()))
            return out.filter(pa.array(keep))

    if isinstance(ds, pa.Table):
        return _Filter(bn)(ds)
    import ray

    fn = _Filter(ray.put(bn))
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def fuzzy_decontaminate(
    corpus,
    bench,
    text_col: str,
    id_col: str,
    jaccard_threshold: float = 0.7,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    seed: int = 42,
    id_offset: int = 1 << 32,
    driver_id_budget: int = 2_000_000,
    driver_pair_budget: int = 200_000,
):
    """Near-duplicate (fuzzy) benchmark decontamination: flag corpus docs
    whose word-shingle Jaccard against ANY benchmark doc is >=
    ``jaccard_threshold`` — the fuzzy companion of :func:`decontaminate`'s
    exact n-gram rule, for eval material that was paraphrased or
    reformatted rather than copied verbatim.

    Scale plan (the ``near_dedup`` machinery, applied cross-corpus):
    benchmark ids shift above ``id_offset`` and both sides UNION into one
    stream, so the banded-LSH candidate pass (only (id, band, band_hash)
    rows shuffle) and the distributed exact-Jaccard verification
    (``verified_pairs_distributed``: candidate semi-join + shingle-list
    joins + vectorized block Jaccard, driver O(1) in candidates) are shared
    verbatim with near-dedup; only CROSS pairs (corpus x bench) verify.
    The contaminated-id set is duplicate-bounded; it broadcasts under
    ``driver_id_budget`` (one ``ray.put``, zero-copy per task) with a
    distributed join tail above it. Returns the corpus (id, text …
    projected to [id, text]) plus a ``contaminated`` bool column.

    Corpus ids must lie in [0, ``id_offset``) and bench ids below
    2^63 - id_offset (both raise per block when violated)."""
    from kamae_ray.pipelines.dedup import (
        _shingle_hash_flat,
        minhash_lsh_candidates,
        verified_pairs_distributed,
    )

    off = np.int64(id_offset)

    def _check_corpus(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) and (int(ids.min()) < 0 or int(ids.max()) >= int(off)):
            raise ValueError(f"corpus ids outside [0, {int(off)}) — raise id_offset")
        return batch.select([id_col, text_col])

    def _shift_bench(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) and (int(ids.min()) < 0 or int(ids.max()) >= (1 << 63) - int(off)):
            raise ValueError("bench ids too large for id_offset shift")
        shifted = pa.array(ids + off, pa.int64())
        return pa.table({id_col: shifted, text_col: batch.column(text_col)})

    _check_corpus.__name__ = "corpus_ids"
    _shift_bench.__name__ = "shift_bench_ids"

    if isinstance(corpus, pa.Table):
        if not isinstance(bench, pa.Table):
            raise TypeError("Table corpus requires a Table bench")
        c = _check_corpus(corpus)
        b = _shift_bench(bench)
        union = pa.concat_tables([c, b])
        pairs = minhash_lsh_candidates(union, text_col, id_col, num_perm,
                                       bands, shingle_k, seed)
        mask = pc.and_(pc.less(pairs.column("id_a"), pa.scalar(int(off))),
                       pc.greater_equal(pairs.column("id_b"), pa.scalar(int(off))))
        cross = pairs.filter(mask)
        # exact Jaccard on the driver (Table path is small by definition)
        ids_need = sorted({*cross.column("id_a").to_pylist(),
                           *cross.column("id_b").to_pylist()})
        sel = union.filter(pc.is_in(union.column(id_col), value_set=pa.array(ids_need)))
        sh, o = _shingle_hash_flat(A.as_array(sel.column(text_col)), shingle_k)
        sh_map = {i: np.unique(sh[o[j]:o[j + 1]])
                  for j, i in enumerate(sel.column(id_col).to_pylist())}
        bad = set()
        for a_, b_ in zip(cross.column("id_a").to_pylist(), cross.column("id_b").to_pylist()):
            sa, sb = sh_map[a_], sh_map[b_]
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            if inter / (sa.size + sb.size - inter) >= jaccard_threshold:
                bad.add(a_)
        flag = pc.is_in(c.column(id_col), value_set=pa.array(sorted(bad), pa.int64()))
        return c.append_column("contaminated", pc.fill_null(flag, False))

    c = corpus.map_batches(_check_corpus, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
    b = bench.map_batches(_shift_bench, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
    union = c.union(b).materialize()  # consumed twice (LSH + verify semi-join)

    def _cross_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.and_(
            pc.less(batch.column("id_a"), pa.scalar(int(off))),
            pc.greater_equal(batch.column("id_b"), pa.scalar(int(off)))))

    _cross_only.__name__ = "cross_pairs"
    pairs = minhash_lsh_candidates(union, text_col, id_col, num_perm, bands,
                                   shingle_k, seed)
    cross = pairs.map_batches(_cross_only, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None).materialize()

    def _flag_broadcast(bad_arr: pa.Array):
        import ray

        bad_ref = ray.put(bad_arr)

        class _Flag:
            def __init__(self):
                self._s = None
                self.__name__ = "flag_contaminated"

            def __call__(self, batch: pa.Table) -> pa.Table:
                if self._s is None:
                    self._s = ray.get(bad_ref)
                f = pc.is_in(batch.column(id_col), value_set=self._s)
                return batch.append_column("contaminated", pc.fill_null(f, False))

        return c.map_batches(_Flag(), batch_format="pyarrow", zero_copy_batch=True,
                             batch_size=None)

    if cross.count() <= driver_pair_budget:
        # candidate-bounded driver verify (same fast path as near_dedup):
        # skips the 3-join distributed tail when duplicates are rare
        rows = cross.take_all()
        pair_rows = [(r["id_a"], r["id_b"]) for r in rows]
        if not pair_rows:
            return _flag_broadcast(pa.array([], pa.int64()))
        cand_set = pa.array(sorted({i for p in pair_rows for i in p}), pa.int64())

        def _keep_cand(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.is_in(batch.column(id_col), value_set=cand_set))

        _keep_cand.__name__ = "filter_candidates"
        sel = union.map_batches(_keep_cand, batch_format="pyarrow",
                                zero_copy_batch=True).take_all()
        sh, o = _shingle_hash_flat(
            pa.array([r[text_col] for r in sel], pa.string()), shingle_k)
        sh_map = {r[id_col]: np.unique(sh[o[j]:o[j + 1]])
                  for j, r in enumerate(sel)}
        bad = set()
        for a_, b_ in pair_rows:
            sa, sb = sh_map[a_], sh_map[b_]
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            if inter / (sa.size + sb.size - inter) >= jaccard_threshold:
                bad.add(a_)
        return _flag_broadcast(pa.array(sorted(bad), pa.int64()))

    verified = verified_pairs_distributed(
        union, cross, text_col, id_col, jaccard_threshold, shingle_k)

    def _flag_ids(batch: pa.Table) -> pa.Table:
        ids = batch.column("id_a").to_numpy(zero_copy_only=False)
        return pa.table({id_col: pa.array(np.unique(ids), pa.int64())})

    _flag_ids.__name__ = "contaminated_ids"
    flagged = (verified.map_batches(_flag_ids, batch_format="pyarrow",
                                    zero_copy_batch=True)
               .groupby(id_col).count().drop_columns(["count()"]).materialize())
    if flagged.count() <= driver_id_budget:
        from kamae_ray.base import collect_tables

        tbls = [t for t in collect_tables(flagged) if t.num_rows]
        bad_arr = (pa.concat_tables(tbls).column(id_col).combine_chunks()
                   if tbls else pa.array([], pa.int64()))
        return _flag_broadcast(bad_arr)
    # scale tail: distributed flag join (left join against the flagged set)
    from kamae_ray.stages.join import shuffle_join

    def _tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__kr_hit", pa.array(np.ones(batch.num_rows, dtype=bool)))

    _tag.__name__ = "tag_flagged"
    tagged = flagged.map_batches(_tag, batch_format="pyarrow",
                                 zero_copy_batch=True, batch_size=None)
    joined = shuffle_join(c, tagged, on=id_col, how="left")

    def _finish(batch: pa.Table) -> pa.Table:
        f = pc.fill_null(batch.column("__kr_hit"), False)
        return batch.drop_columns(["__kr_hit"]).append_column("contaminated", f)

    _finish.__name__ = "finish_flag"
    return joined.map_batches(_finish, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)


def novelty_scores(ds, bench: dict, text_col: str, id_col: str):
    """Per-document n-gram NOVELTY against a reference set — the
    curation-weighting twin of :func:`decontaminate` (prefer documents
    whose content is new relative to what the corpus/benchmark already
    covers): for each document, the distinct-gram count, the number of
    those grams present in the reference set (hash candidates via
    searchsorted + EXACT string verification, decontaminate's rule), and

        novelty_ppm = (n_grams - n_hits) * 1_000_000 // n_grams

    (integer-exact; null when the document has no full n-gram). Every
    input document emits a row. Gram identity carries the 61-bit rolling
    hash's distinctness caveat (duplicate_passage_stats' note).

    Scale plan: the reference set broadcasts with ONE ``ray.put``; the
    corpus side is a single shuffle-free map."""

    def nov(batch: pa.Table, b: dict) -> pa.Table:
        n = b["n"]
        bh: np.ndarray = b["hashes"]
        h, doc_of, word_start, words, _ = _full_gram_data(
            A.as_array(batch.column(text_col)), n)
        if len(h):
            order = np.lexsort((h, doc_of))
            keep = np.ones(len(order), dtype=bool)
            d_o, h_o = doc_of[order], h[order]
            keep[1:] = (d_o[1:] != d_o[:-1]) | (h_o[1:] != h_o[:-1])
            sel = order[keep]                 # one representative per (doc, gram)
            d_s, h_s = doc_of[sel], h[sel]
        else:
            sel = np.zeros(0, np.int64)
            d_s = np.zeros(0, np.int64)
            h_s = np.zeros(0, np.uint64)
        totals = np.zeros(batch.num_rows, dtype=np.int64)
        if len(d_s):
            du, dc = np.unique(d_s, return_counts=True)
            totals[du] = dc
        hits = np.zeros(batch.num_rows, dtype=np.int64)
        if len(h_s) and len(bh):
            pos = np.searchsorted(bh, h_s)
            pos[pos == len(bh)] = 0
            cand = bh[pos] == h_s
            ci = np.flatnonzero(cand)
            if len(ci):
                gs = _gram_strings_at(words, word_start[sel[ci]], n)
                ok = pc.is_in(gs, value_set=b["grams"]).to_numpy(zero_copy_only=False)
                ci = ci[ok]
            if len(ci):
                hu, hc = np.unique(d_s[ci], return_counts=True)
                hits[hu] = hc
        with np.errstate(divide="ignore", invalid="ignore"):
            ppm = np.where(totals > 0, (totals - hits) * np.int64(1_000_000)
                           // np.where(totals == 0, 1, totals), 0)
        return pa.table({
            id_col: batch.column(id_col),
            "n_grams": pa.array(totals),
            "n_hits": pa.array(hits),
            "novelty_ppm": pa.array(ppm, pa.int64(), mask=~(totals > 0)),
        })

    if isinstance(ds, pa.Table):
        return nov(ds, bench)
    import ray

    ref = ray.put(bench)

    def fn(batch: pa.Table) -> pa.Table:
        return nov(batch, ray.get(ref))

    fn.__name__ = "novelty_scores"
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=None)
