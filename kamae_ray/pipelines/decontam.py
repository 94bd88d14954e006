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
    word_start int64[G], words_flat StringArray)`` where gram g covers
    ``words_flat[word_start[g] : word_start[g]+n]``.
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
    return hashes, doc_of, word_start, words


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
        h, _, ws, words = _full_gram_data(A.as_array(block.column(text_col)), n)
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
    h, doc_of, word_start, words = _full_gram_data(A.as_array(batch.column(text_col)), n)
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
    h, doc_of, _, _ = _full_gram_data(A.as_array(batch.column(text_col)), n)
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
