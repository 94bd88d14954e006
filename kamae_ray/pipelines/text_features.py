"""TF-IDF term scoring over a document corpus — the classic training-data
relevance feature, built from this engine's scale primitives.

No reference analog (kamae delegates corpus statistics to upstream Spark
jobs); the distributed shape is the house pattern end to end:

1. ``tf`` pass — one vectorized ``map_batches``: whitespace-split each doc,
   count terms per (doc, term) INSIDE the block (every doc lives in exactly
   one input row, so term frequency is block-local — no shuffle). Distinct
   words are dictionary-encoded once per block; counting is a single
   sort + ``reduceat`` over dense (row, word-id) pair codes.
2. ``df`` pass — document frequency per term via ``groupby_agg`` (per-block
   partial counts, then a small distributed finalize; the shuffle carries
   one partial row per (block, term), never the corpus).
3. idf join — ``broadcast_join`` of the df table (``ray.put`` once, read by
   every task) when the vocabulary is bounded; ``join_strategy="shuffle"``
   switches to the sort-shuffle equi-join for unbounded vocabularies.
4. score + top-k — ``tfidf = tf * (ln((N+1)/(df+1)) + 1)`` (smoothed idf,
   the sklearn formulation) and ``topk_per_group`` keeps the k best terms
   per doc with partial top-k pre-reduction before its shuffle.

Every stage streams; driver memory is O(vocabulary) only on the broadcast
path (guarded by ``max_broadcast_terms``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kamae_ray.functions import arrays as A
from kamae_ray.functions import segments as S


def term_frequencies(ds, id_col: str, text_col: str):
    """Long (id, term, tf) table: one row per distinct (doc, whitespace
    word). Vectorized block kernel; no shuffle (docs never span blocks)."""

    def tf_block(block: pa.Table) -> pa.Table:
        ids = A.as_array(block.column(id_col))
        txt = pc.fill_null(pc.cast(block.column(text_col), pa.string(), safe=False), "")
        split = pc.split_pattern_regex(txt, pattern=r"\s+")
        levels, words = A.unwrap(split.combine_chunks() if isinstance(split, pa.ChunkedArray) else split)
        offsets = levels[0][0]
        n_words = len(words)
        empty = pa.table({id_col: ids.slice(0, 0), "term": pa.array([], pa.string()),
                          "tf": pa.array([], pa.int64())})
        if n_words == 0:
            return empty
        d = words.dictionary_encode()
        widx = pc.fill_null(d.indices, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        dict_vals = d.dictionary
        # drop empty strings (split artifacts of leading/trailing whitespace)
        dv_ok = pc.not_equal(dict_vals, pa.scalar("")).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(block.num_rows, dtype=np.int64), np.diff(offsets))
        keep = dv_ok[widx]
        doc_idx, widx = doc_idx[keep], widx[keep]
        if len(widx) == 0:
            return empty
        # dense pair code (doc, word): block-local so the product fits int64
        code = doc_idx * np.int64(len(dict_vals)) + widx
        order = np.argsort(code, kind="stable")
        starts, lens = S.segments(code[order])
        firsts = order[starts]
        return pa.table({
            id_col: ids.take(pa.array(doc_idx[firsts])),
            "term": dict_vals.take(pa.array(widx[firsts])),
            "tf": pa.array(lens.astype(np.int64)),
        })

    tf_block.__name__ = "term_frequencies"
    if isinstance(ds, pa.Table):
        return tf_block(ds)
    proj = ds
    try:
        proj = ds.select_columns([id_col, text_col])
    except Exception:
        pass
    return proj.map_batches(tf_block, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def inverted_index(ds, id_col: str, text_col: str, min_df: int = 1):
    """Inverted index (search/posting-list build): one row per distinct
    whitespace word with ``df`` (document frequency), ``cf`` (collection
    frequency — total occurrences), and ``postings`` (the doc-id list in
    ascending id order).

    Scale plan: ``term_frequencies`` explodes distinct (doc, term, tf) rows
    block-locally (docs never span blocks), then ONE sort-shuffle on term
    co-locates each term's postings; the block kernel lexsorts (term, id)
    and slices ids into ListArray offsets — no per-group Python, no driver
    state. A single term's postings must fit in a block (the listwise-op
    contract); for web-scale corpora drop stopword-class terms upstream or
    cap postings at the consumer. ``min_df`` filters inside the kernel
    (each term's full group is co-located, so the filter is exact)."""
    tf_long = term_frequencies(ds, id_col, text_col)

    def kern(block: pa.Table) -> pa.Table:
        ids_arr = A.as_array(block.column(id_col))
        if block.num_rows == 0:
            return pa.table({
                "term": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
                "cf": pa.array([], pa.int64()),
                "postings": pa.array([], pa.list_(ids_arr.type)),
            })
        gids = S.group_ids(block, ["term"])
        o = pc.cast(ids_arr, pa.float64(), safe=False).to_numpy(zero_copy_only=False)
        order = np.lexsort((o, gids))
        starts, lens = S.segments(gids[order])
        firsts = order[starts]
        tf = block.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
        cf = np.add.reduceat(tf[order], starts)
        offsets = pa.array(np.concatenate([[0], np.cumsum(lens)]).astype(np.int32))
        out = pa.table({
            "term": A.as_array(block.column("term")).take(pa.array(firsts)),
            "df": pa.array(lens.astype(np.int64)),
            "cf": pa.array(cf),
            "postings": pa.ListArray.from_arrays(offsets, ids_arr.take(pa.array(order))),
        })
        if min_df > 1:
            out = out.filter(pc.greater_equal(out.column("df"), min_df))
        return out

    kern.__name__ = "inverted_index"
    if isinstance(tf_long, pa.Table):
        return kern(tf_long)
    from kamae_ray.stages.window import sorted_block_apply

    return sorted_block_apply(tf_long, ["term"], kern, "inverted_index")


def tfidf_top_terms(
    ds,
    id_col: str,
    text_col: str,
    k: int = 5,
    n_docs: int | None = None,
    join_strategy: str = "broadcast",
    max_broadcast_terms: int = 5_000_000,
):
    """Top-``k`` terms per document by smoothed TF-IDF.

    Output columns: ``id_col, term, tf, df, tfidf`` — at most k rows per doc,
    ordered deterministically (score desc, term asc on ties).

    ``n_docs`` is the corpus size N for the idf; when None it is taken from
    ``ds.count()`` (metadata-only for fresh parquet reads). On the broadcast
    path the df table materializes to the driver once and is ``ray.put``
    ONCE (read per actor, not per batch); vocabularies above
    ``max_broadcast_terms`` must use ``join_strategy="shuffle"``, which
    keeps everything distributed.
    """
    from kamae_ray.stages.aggregate import groupby_agg, topk_per_group
    from kamae_ray.stages.join import broadcast_join, shuffle_join

    if join_strategy not in ("broadcast", "shuffle"):
        raise ValueError("join_strategy must be broadcast|shuffle")
    if n_docs is None:
        n_docs = ds.num_rows if isinstance(ds, pa.Table) else ds.count()
    tf_long = term_frequencies(ds, id_col, text_col)
    if not isinstance(tf_long, pa.Table):
        # consumed TWICE (df aggregation + the idf join input): materialize
        # once so the split+count kernel doesn't re-execute (build-note #14);
        # spillable object-store blocks, never driver memory
        tf_long = tf_long.materialize()
    # df(term) = number of docs containing it = count of (doc, term) rows
    df_agg = groupby_agg(tf_long, "term", {id_col: [ "count" ]})

    def _rename(t: pa.Table) -> pa.Table:
        i = t.column_names.index(f"{id_col}_count")
        return t.set_column(i, "df", pc.cast(t.column(f"{id_col}_count"), pa.int64()))

    if isinstance(tf_long, pa.Table):
        joined = broadcast_join(tf_long, _rename(df_agg), on="term", how="inner")
    elif join_strategy == "broadcast":
        from kamae_ray.base import collect_tables

        refs = [t for t in collect_tables(df_agg) if t.num_rows]  # drop Ray's schema-less empties
        df_tbl = pa.concat_tables(refs) if refs else pa.table(
            {"term": pa.array([], pa.string()), f"{id_col}_count": pa.array([], pa.int64())}
        )
        if df_tbl.num_rows > max_broadcast_terms:
            raise ValueError(
                f"vocabulary has {df_tbl.num_rows} terms > max_broadcast_terms="
                f"{max_broadcast_terms}; use join_strategy='shuffle'"
            )
        joined = broadcast_join(tf_long, _rename(df_tbl), on="term", how="inner")
    else:
        df_ds = df_agg.map_batches(_rename, batch_format="pyarrow", batch_size=None)
        joined = shuffle_join(tf_long, df_ds, on="term", how="inner")

    ln_n1 = float(n_docs + 1)

    def score(block: pa.Table) -> pa.Table:
        tf = block.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        df = block.column("df").to_numpy(zero_copy_only=False).astype(np.float64)
        # libm_log: oracle-mirrored ln must match DuckDB bit-for-bit
        idf = A.libm_log(ln_n1 / (df + 1.0)) + 1.0
        return block.append_column("tfidf", pa.array(tf * idf, pa.float64()))

    score.__name__ = "tfidf_score"
    if isinstance(joined, pa.Table):
        scored = score(joined)
    else:
        scored = joined.map_batches(score, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    return topk_per_group(scored, [id_col], "tfidf", k, tiebreak=["term"])


def bm25_scores(
    ds,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
):
    """Okapi BM25 retrieval scores of every document against a fixed query
    term set (the standard keyword-relevance op for corpus curation /
    retrieval-augmented pipelines; no reference analog — kamae delegates
    corpus stats upstream).

    score(d) = sum_t idf_t * (tf_t * (k1+1)) / (tf_t + k1*((1-b) + b*dl/avgdl)),
    idf_t = ln(((N - df_t) + 0.5) / (df_t + 0.5) + 1)   (Lucene's +1 form)

    Distributed shape: ONE vectorized block pass computes per-doc ``dl`` and
    per-term ``tf`` (no shuffle — a doc never spans blocks); corpus stats
    (N, sum dl, per-term df) fold from O(blocks) partial rows on the driver;
    the final score map broadcasts the tiny (m-term) idf vector. Only docs
    matching at least one term are returned. Float parity discipline: the
    scoring expression tree is mirrored token-for-token by
    ``bm25_oracle_sql`` (constants repr-generated), idf uses scalar libm
    ``math.log`` = DuckDB ``ln``; results round to 6dp on both sides.

    Output columns: ``id_col, dl, tf0..tf{m-1}, bm25``."""
    import math

    m = len(query_terms)
    if m == 0:
        raise ValueError("query_terms must be non-empty")

    def tf_block(block: pa.Table) -> pa.Table:
        ids = A.as_array(block.column(id_col))
        n = block.num_rows
        txt = pc.fill_null(pc.cast(block.column(text_col), pa.string(), safe=False), "")
        split = pc.split_pattern_regex(txt, pattern=r"\s+")
        levels, words = A.unwrap(split.combine_chunks() if isinstance(split, pa.ChunkedArray) else split)
        offsets = levels[0][0]
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
        nonempty = pc.not_equal(words, pa.scalar("")).to_numpy(zero_copy_only=False)
        cols: dict = {id_col: ids}
        cols["dl"] = pa.array(np.bincount(doc_idx[nonempty], minlength=n).astype(np.int64))
        for j, term in enumerate(query_terms):
            hit = pc.fill_null(pc.equal(words, pa.scalar(term)), False).to_numpy(zero_copy_only=False)
            cols[f"tf{j}"] = pa.array(np.bincount(doc_idx[hit], minlength=n).astype(np.int64))
        return pa.table(cols)

    tf_block.__name__ = "bm25_tf"

    if isinstance(ds, pa.Table):
        per_doc = tf_block(ds)
        parts = [per_doc]
    else:
        proj = ds
        try:
            proj = ds.select_columns([id_col, text_col])
        except Exception:
            pass
        per_doc = proj.map_batches(tf_block, batch_format="pyarrow", zero_copy_batch=True,
                                   batch_size=None)
        # consumed twice (stats fold + score map): spillable blocks, not driver
        per_doc = per_doc.materialize()

        def partial(block: pa.Table) -> pa.Table:
            out = {"n": pa.array([block.num_rows], pa.int64()),
                   "sdl": pa.array([int(pc.sum(block.column("dl")).as_py() or 0)], pa.int64())}
            for j in range(m):
                tf = block.column(f"tf{j}")
                out[f"df{j}"] = pa.array(
                    [int(pc.sum(pc.cast(pc.greater(tf, 0), pa.int64())).as_py() or 0)], pa.int64())
            return pa.table(out)

        partial.__name__ = "bm25_stats_partial"
        from kamae_ray.base import collect_tables

        parts = [t for t in collect_tables(
            per_doc.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                                batch_size=None)) if t.num_rows]

    if isinstance(ds, pa.Table):
        N = per_doc.num_rows
        sdl = int(pc.sum(per_doc.column("dl")).as_py() or 0)
        dfs = [int(pc.sum(pc.cast(pc.greater(per_doc.column(f"tf{j}"), 0), pa.int64())).as_py() or 0)
               for j in range(m)]
    else:
        stats = pa.concat_tables(parts) if parts else None
        N = int(pc.sum(stats.column("n")).as_py() or 0) if stats is not None else 0
        sdl = int(pc.sum(stats.column("sdl")).as_py() or 0) if stats is not None else 0
        dfs = [int(pc.sum(stats.column(f"df{j}")).as_py() or 0) if stats is not None else 0
               for j in range(m)]
    if N == 0:
        raise ValueError("bm25_scores: empty corpus")
    # exact expression mirror of bm25_oracle_sql (integer inputs -> identical
    # doubles; ln on identical inputs; products/divisions IEEE-identical)
    avgdl = sdl / N
    idfs = [math.log(((N - df) + 0.5) / (df + 0.5) + 1.0) for df in dfs]
    k1p1 = k1 + 1.0
    omb = 1.0 - b

    def score(block: pa.Table) -> pa.Table:
        dl = block.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        tfs = [block.column(f"tf{j}").to_numpy(zero_copy_only=False) for j in range(m)]
        s = np.zeros(block.num_rows, dtype=np.float64)
        any_hit = np.zeros(block.num_rows, dtype=np.int64)
        for j in range(m):
            tf = tfs[j].astype(np.float64)
            s = s + idfs[j] * (tf * k1p1) / (tf + k1 * (omb + b * (dl / avgdl)))
            any_hit += tfs[j]
        out = block.append_column("bm25", pa.array(s, pa.float64()))
        return out.filter(pa.array(any_hit > 0))

    score.__name__ = "bm25_score"
    if isinstance(per_doc, pa.Table):
        return score(per_doc)
    return per_doc.map_batches(score, batch_format="pyarrow", zero_copy_batch=True,
                               batch_size=None)


def bm25_oracle_sql(
    table: str,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    round_digits: int = 6,
) -> str:
    """GENERATED DuckDB oracle mirroring ``bm25_scores`` expression-for-
    expression (constants repr-inlined so both engines evaluate identical
    double literals)."""
    m = len(query_terms)
    k1p1, omb = repr(k1 + 1.0), repr(1.0 - b)
    k1r, br = repr(float(k1)), repr(float(b))
    tf_cols = ", ".join(
        "CAST(len(list_filter(ws, x -> x = '{0}')) AS BIGINT) AS tf{1}".format(
            t.replace("'", "''"), j)
        for j, t in enumerate(query_terms))
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf{j} > 0 THEN 1 ELSE 0 END)::DOUBLE AS df{j}" for j in range(m))
    terms = " + ".join(
        f"ln(((s.n - s.df{j}) + 0.5) / (s.df{j} + 0.5) + 1.0) "
        f"* (d.tf{j} * {k1p1}) / (d.tf{j} + {k1r} * ({omb} + {br} * (d.dl / (s.sdl / s.n))))"
        for j in range(m))
    hit = " + ".join(f"d.tf{j}" for j in range(m))
    tf_out = ", ".join(f"d.tf{j}" for j in range(m))
    return (
        f"WITH w AS (SELECT {id_col}, "
        f"list_filter(string_split_regex(coalesce({text_col}, ''), '\\s+'), "
        f"x -> length(x) > 0) AS ws FROM {table}), "
        f"d AS (SELECT {id_col}, CAST(len(ws) AS BIGINT) AS dl, {tf_cols} FROM w), "
        f"s AS (SELECT COUNT(*)::DOUBLE AS n, SUM(dl)::DOUBLE AS sdl, {df_cols} FROM d) "
        f"SELECT d.{id_col}, d.dl, {tf_out}, "
        f"ROUND({terms}, {round_digits}) AS bm25 "
        f"FROM d, s WHERE ({hit}) > 0"
    )


def word_freq_scores(
    ds,
    id_col: str,
    text_col: str,
    multiplier: int = 1_000_000,
    max_broadcast_terms: int = 5_000_000,
):
    """Mean word corpus-frequency per document — the integer-exact stand-in
    for a unigram-LM/perplexity quality filter (rare-word-heavy or garbled
    docs score LOW, boilerplate scores high; same signal family as CCNet's
    LM filtering, minus the external model this sandbox can't ship).

    INTEGER-EXACT design (lesson-24 family): ``freq_ppm(w) =
    floor(count_w * multiplier / total_words)`` — pure int64 floor division,
    bit-identical in numpy and SQL (all operands positive, so DuckDB's
    truncating ``//`` == numpy floor) — and the per-doc score is ONE double
    division of two exact ints. No ln, no float sums, no rounding risk.
    Requires ``total_words * multiplier < 2^63`` (guarded): at ppm scale
    that is ~9e12 corpus words; drop ``multiplier`` for bigger corpora.

    Distributed shape: tf pass (block-local, no shuffle) -> partial-agg
    word-count table -> broadcast vocab (``max_broadcast_terms`` guard, the
    tfidf pattern) -> one score map. Docs with zero words drop (SQL join
    semantics). Output: ``(id_col, n_words, sum_ppm, freq_score)``."""
    from kamae_ray.stages.aggregate import groupby_agg

    tf_long = term_frequencies(ds, id_col, text_col)
    if not isinstance(tf_long, pa.Table):
        tf_long = tf_long.materialize()  # consumed twice (counts + score join)
    cnt = groupby_agg(tf_long, "term", {"tf": ["sum"]})
    if isinstance(cnt, pa.Table):
        vocab_tbl = cnt
    else:
        from kamae_ray.base import collect_tables

        refs = [t for t in collect_tables(cnt) if t.num_rows]
        vocab_tbl = pa.concat_tables(refs) if refs else pa.table(
            {"term": pa.array([], pa.string()), "tf_sum": pa.array([], pa.int64())})
    if vocab_tbl.num_rows > max_broadcast_terms:
        raise ValueError(
            f"vocabulary has {vocab_tbl.num_rows} terms > max_broadcast_terms="
            f"{max_broadcast_terms}")
    counts = pc.cast(vocab_tbl.column("tf_sum"), pa.int64()).to_numpy(zero_copy_only=False)
    total = int(counts.sum())
    if total <= 0:
        raise ValueError("word_freq_scores: empty corpus")
    if total * multiplier >= (1 << 63):
        raise ValueError("total_words * multiplier overflows int64 — lower multiplier")
    ppm = (counts * np.int64(multiplier)) // np.int64(total)
    vocab = A.as_array(vocab_tbl.column("term"))

    def score(block: pa.Table) -> pa.Table:
        # block rows are (id, term, tf) — gather ppm per distinct term, then
        # segment-sum tf-weighted ppm per doc
        pos = pc.index_in(block.column("term"), value_set=vocab)
        pos = pc.fill_null(pos, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        tf = block.column("tf").to_numpy(zero_copy_only=False)
        ids_arr = A.as_array(block.column(id_col))
        gids = ids_arr.dictionary_encode().indices.to_numpy(zero_copy_only=False).astype(np.int64)
        if len(gids) == 0:
            return pa.table({id_col: ids_arr.slice(0, 0),
                             "n_words": pa.array([], pa.int64()),
                             "sum_ppm": pa.array([], pa.int64()),
                             "freq_score": pa.array([], pa.float64())})
        # exact int64 segment sums (no float bincount detour)
        from kamae_ray.functions import segments as S

        order = np.argsort(gids, kind="stable")
        starts, _lens = S.segments(gids[order])
        contrib = (ppm[pos] * tf)[order]
        csum = np.concatenate([[0], np.cumsum(contrib)])
        ends = np.concatenate([starts[1:], [len(gids)]])
        sum_ppm = csum[ends] - csum[starts]
        tsum = np.concatenate([[0], np.cumsum(tf[order])])
        n_words = tsum[ends] - tsum[starts]
        out_ids = ids_arr.take(pa.array(order[starts]))
        fs = sum_ppm.astype(np.float64) / n_words.astype(np.float64)
        return pa.table({
            id_col: out_ids,
            "n_words": pa.array(n_words),
            "sum_ppm": pa.array(sum_ppm),
            "freq_score": pa.array(fs, pa.float64()),
        })

    score.__name__ = "word_freq_score"
    if isinstance(tf_long, pa.Table):
        return score(tf_long)
    return tf_long.map_batches(score, batch_format="pyarrow", zero_copy_batch=True,
                               batch_size=None)


def chunk_documents(ds, id_col: str, text_col: str, chunk_words: int = 128,
                    overlap: int = 32, out_text: str = "chunk_text"):
    """Split long documents into overlapping fixed-size WORD windows — the
    RAG / long-context pre-training chunking step (each chunk is
    ``chunk_words`` words; consecutive chunks overlap by ``overlap``; the
    final chunk is the remainder, never padded). Emits one row per chunk:
    id column(s) + ``chunk_idx`` (0-based) + ``out_text`` + ``n_chunk_words``.
    Empty / null documents emit no chunks.

    Fully vectorized, block-local (a document lives in one row, so chunking
    never crosses blocks — NO shuffle at any scale): one whitespace split
    per batch, chunk spans from integer arithmetic over the word offsets,
    ONE flat gather builds every chunk's word list (repeat + intra-arange,
    lesson-33 family), one ``binary_join`` re-joins. Peak memory per batch
    is the ~``chunk_words/step``x word duplication of the overlap — bounded
    by the batch, not the corpus."""
    if chunk_words <= 0 or not 0 <= overlap < chunk_words:
        raise ValueError("need chunk_words > 0 and 0 <= overlap < chunk_words")
    step = chunk_words - overlap

    def kern(block: pa.Table) -> pa.Table:
        flat = A.as_array(block.column(text_col))
        split = pc.split_pattern_regex(pc.fill_null(flat, ""), pattern=r"\s+")
        split = A._normalize_list(split)
        offsets = split.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        words = split.values
        nonempty = pc.utf8_length(words).to_numpy(zero_copy_only=False) > 0
        words = words.filter(pa.array(nonempty))
        kept = np.concatenate(([0], np.cumsum(nonempty.astype(np.int64))))
        starts_doc = kept[offsets[:-1]]
        nw = kept[offsets[1:]] - starts_doc
        n_chunks = np.where(nw > 0, 1 + np.maximum(0, -(-(nw - chunk_words) // step)), 0)
        doc_rep = np.repeat(np.arange(block.num_rows), n_chunks)
        n_out = len(doc_rep)
        cstarts = np.concatenate(([0], np.cumsum(n_chunks)))
        chunk_idx = np.arange(n_out) - cstarts[doc_rep]
        rel_start = chunk_idx * step
        lens = np.minimum(chunk_words, nw[doc_rep] - rel_start)
        abs_start = starts_doc[doc_rep] + rel_start
        total = int(lens.sum())
        row_off = np.concatenate(([0], np.cumsum(lens)))
        intra = np.arange(total) - np.repeat(row_off[:-1], lens)
        word_idx = np.repeat(abs_start, lens) + intra
        gathered = words.take(pa.array(word_idx))
        chunk_list = pa.ListArray.from_arrays(pa.array(row_off, pa.int32()), gathered)
        out = {c: A.as_array(block.column(c)).take(pa.array(doc_rep))
               for c in ([id_col] if isinstance(id_col, str) else list(id_col))}
        out["chunk_idx"] = pa.array(chunk_idx.astype(np.int64))
        out[out_text] = pc.binary_join(chunk_list, " ")
        out["n_chunk_words"] = pa.array(lens.astype(np.int64))
        return pa.table(out)

    kern.__name__ = "chunk_documents"
    if isinstance(ds, pa.Table):
        return kern(ds)
    return ds.map_batches(kern, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=None)


def chi2_scores(ds, text_col: str, class_col: str, stat: str = "chi2"):
    """Per-(term, class) chi-squared feature scores over DOCUMENT PRESENCE
    (the sklearn/NLP vocabulary-selection statistic): for each term and
    class, the 2x2 chi2 of [docs-in-class with/without term vs other-class
    docs with/without term]. Output: ``term, class, n_docs`` (= a, docs of
    the class containing the term) ``, chi2`` (null when a margin is empty).
    Null classes are dropped; docs with no words still count as
    "without the term" (SQL semantics).

    All four cell counts derive from EXACT int64 counts; chi2 is one fixed
    float64 expression over them, mirrored operation-for-operation by the
    SQL oracle (q_cat_stats entropy precedent — deterministic to the ULP,
    absorbed by 6dp rounding).

    ``stat="mi"`` emits 2x2 mutual information in nats instead
    (sklearn mutual_info-style feature relevance): ``sum over cells of
    (cell/N) * ln(cell*N / (row*col))`` with empty cells contributing 0 —
    same exact-integer cells, four mirrored ``libm_log`` terms summed in a
    fixed order (lesson 38: pc.ln == DuckDB ln bit-for-bit).

    Scale plan: one tiny class-totals partial pass, one block pass emitting
    per-block (term, class, count) partials from PER-DOC DISTINCT terms
    (dictionary-encode once, one np.unique over dense pair codes), ONE sort
    on term (partials merge in-block; class totals broadcast), vectorized
    chi2 kernel. The exchange carries O(blocks x vocab x classes) partial
    rows, never the corpus."""
    from kamae_ray.base import collect_tables
    from kamae_ray.stages.window import sorted_block_apply

    # pass A: class totals (tiny)
    def cls_partial(block: pa.Table) -> pa.Table:
        t = block.select([class_col])
        t = t.filter(pc.is_valid(t.column(class_col)))
        t = t.set_column(0, class_col,
                         pc.cast(t.column(class_col), pa.string(), safe=False))
        return t.group_by(class_col).aggregate([([], "count_all")])

    cls_partial.__name__ = "chi2_class_totals"
    if isinstance(ds, pa.Table):
        parts = [cls_partial(ds)]
    else:
        from kamae_ray.sources import io as _io

        # lesson 25: select_columns does NOT prune at the scan — re-issue a
        # narrowed read so the count-only pass never deserializes the text
        narrow = _io.narrow_read(ds, [class_col])
        src_a = narrow if narrow is not None else ds
        parts = collect_tables(
            src_a.map_batches(cls_partial, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None))
    n_class: dict[str, int] = {}
    for t in parts:
        for lab, c in zip(t.column(class_col).to_pylist(),
                          t.column("count_all").to_pylist()):
            n_class[lab] = n_class.get(lab, 0) + int(c)
    if not n_class:
        raise ValueError("chi2_scores: no non-null class values")
    N = sum(n_class.values())
    labels = sorted(n_class)
    ncl_arr = np.array([n_class[lab] for lab in labels], dtype=np.int64)

    # pass B: per-block (term, class, cnt) partials from per-doc DISTINCT terms
    def pair_partial(block: pa.Table) -> pa.Table:
        cls = pc.cast(A.as_array(block.column(class_col)), pa.string(), safe=False)
        ok = pc.is_valid(cls).to_numpy(zero_copy_only=False)
        split = pc.split_pattern_regex(
            pc.fill_null(A.as_array(block.column(text_col)), ""), pattern=r"\s+")
        split = A._normalize_list(split)
        offsets = split.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        words = split.values
        d = words.dictionary_encode()
        dvals = d.dictionary
        widx = pc.fill_null(d.indices, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        nonempty = pc.utf8_length(dvals).to_numpy(zero_copy_only=False) > 0
        row_rep = np.repeat(np.arange(block.num_rows), np.diff(offsets))
        cidx = pc.fill_null(
            pc.index_in(cls, value_set=pa.array(labels, pa.string())), -1
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ok[row_rep] & nonempty[widx] & (cidx[row_rep] >= 0)
        rr, wi = row_rep[keep], widx[keep]
        nd = len(dvals)
        # distinct (doc, term): unique over dense pair codes
        pair = rr * nd + wi
        upair = np.unique(pair)
        urow = upair // nd
        uterm = upair % nd
        ucls = cidx[urow]
        # count per (term, class)
        code = uterm * len(labels) + ucls
        code_u, cnt = np.unique(code, return_counts=True)
        term_arr = dvals.take(pa.array(code_u // len(labels)))
        cls_arr = pa.array(np.array(labels, dtype=object)[code_u % len(labels)],
                           pa.string())
        return pa.table({"term": pc.cast(term_arr, pa.string(), safe=False),
                         "class": cls_arr,
                         "cnt": pa.array(cnt.astype(np.int64))})

    pair_partial.__name__ = "chi2_pair_partial"
    if stat not in ("chi2", "mi"):
        raise ValueError("stat must be 'chi2' or 'mi'")

    def chi2_kern(block: pa.Table) -> pa.Table:
        from kamae_ray.functions import segments as S

        if block.num_rows == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "class": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64()),
                             "chi2": pa.array([], pa.float64())})
        tg = S.group_ids(block, ["term"])
        ci = pc.fill_null(pc.index_in(block.column("class"),
                                      value_set=pa.array(labels, pa.string())), 0
                          ).to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = pc.cast(block.column("cnt"), pa.int64()).to_numpy(zero_copy_only=False)
        code = tg * len(labels) + ci
        order = np.argsort(code, kind="stable")
        cs, cc = code[order], cnt[order]
        starts, _l = S.segments(cs)
        a = np.add.reduceat(cc, starts)
        gterm = cs[starts] // len(labels)
        gcls = cs[starts] % len(labels)
        # n_term per output row: segment-sum of a over gterm
        tstarts, tlens = S.segments(gterm)
        tsum = np.add.reduceat(a, tstarts)
        n_term = np.repeat(tsum, tlens)
        first_of_term = order[starts][tstarts]
        term_vals = A.as_array(block.column("term")).take(
            pa.array(first_of_term)).take(
            pa.array(np.repeat(np.arange(len(tstarts)), tlens)))
        af = a.astype(np.float64)
        ncl = ncl_arr[gcls].astype(np.float64)
        ntm = n_term.astype(np.float64)
        Nf = float(N)
        b = ncl - af
        c = ntm - af
        dd = Nf - ncl - ntm + af
        if stat == "mi":
            def _term(cell, row, col):
                with np.errstate(divide="ignore", invalid="ignore"):
                    ratio = cell * Nf / (row * col)
                    lg = A.libm_log(np.where(ratio > 0, ratio, 1.0))
                    return np.where(cell > 0, (cell / Nf) * lg, 0.0)

            mi = (_term(af, ntm, ncl) + _term(b, Nf - ntm, ncl)
                  + _term(c, ntm, Nf - ncl) + _term(dd, Nf - ntm, Nf - ncl))
            return pa.table({
                "term": term_vals,
                "class": pa.array(np.array(labels, dtype=object)[gcls], pa.string()),
                "n_docs": pa.array(a),
                "mi": pa.array(mi, pa.float64()),
            })
        dif = af * dd - b * c
        d1 = (af + b) * (c + dd)
        d2 = (af + c) * (b + dd)
        denom = d1 * d2
        with np.errstate(divide="ignore", invalid="ignore"):
            chi2 = Nf * (dif * dif) / denom
        return pa.table({
            "term": term_vals,
            "class": pa.array(np.array(labels, dtype=object)[gcls], pa.string()),
            "n_docs": pa.array(a),
            "chi2": pa.array(chi2, pa.float64(),
                             mask=(denom == 0) | ~np.isfinite(chi2)),
        })

    if isinstance(ds, pa.Table):
        return chi2_kern(pair_partial(ds))
    pairs = ds.map_batches(pair_partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
    return sorted_block_apply(pairs, ["term"], chi2_kern, "chi2_scores")


def collocations(ds, text_col: str, min_count: int = 2,
                 max_broadcast_terms: int = 5_000_000):
    """Bigram collocation mining with pointwise mutual information — the
    corpus-analysis staple (phrase detection, word2vec-style phrase merging):
    for every adjacent word pair, ``pmi = ln(n_pair * N / (left_total *
    right_total))`` over EXACT int64 counts (N = total bigrams; margins =
    bigrams starting/ending with the word). Output: ``w1, w2, n_pair, pmi``
    for pairs with ``n_pair >= min_count``.

    Scale plan: per-block adjacent-pair combiner (dictionary encode once,
    one np.unique over dense pair codes — occurrences never leave the
    block), ONE (w1, w2) partial-agg groupby; the margins are vocab-bounded
    unigram tables folded on the driver and broadcast into the score map
    (``max_broadcast_terms`` guard, the word_freq pattern). The pmi is one
    float64 expression over exact ints, mirrored by the SQL oracle."""
    from kamae_ray.base import collect_tables
    from kamae_ray.stages.aggregate import groupby_agg

    def pair_partial(block: pa.Table) -> pa.Table:
        split = pc.split_pattern_regex(
            pc.fill_null(A.as_array(block.column(text_col)), ""), pattern=r"\s+")
        split = A._normalize_list(split)
        offsets = split.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        words = split.values
        d = words.dictionary_encode()
        dvals = d.dictionary
        widx = pc.fill_null(d.indices, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        nonempty = (pc.utf8_length(dvals).to_numpy(zero_copy_only=False) > 0) \
            if len(dvals) else np.zeros(0, bool)
        n_words = len(widx)
        row_rep = np.repeat(np.arange(block.num_rows), np.diff(offsets))
        if n_words < 2:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        left, right = widx[:-1], widx[1:]
        same_row = row_rep[:-1] == row_rep[1:]
        ok = same_row & nonempty[left] & nonempty[right]
        lw, rw = left[ok], right[ok]
        nd = len(dvals)
        code = lw * nd + rw
        code_u, cnt = np.unique(code, return_counts=True)
        return pa.table({
            "w1": pc.cast(dvals.take(pa.array(code_u // nd)), pa.string(), safe=False),
            "w2": pc.cast(dvals.take(pa.array(code_u % nd)), pa.string(), safe=False),
            "cnt": pa.array(cnt.astype(np.int64)),
        })

    pair_partial.__name__ = "bigram_partial"
    if isinstance(ds, pa.Table):
        pairs = pair_partial(ds)
        bigrams = groupby_agg(pairs, ["w1", "w2"], {"cnt": ["sum"]})
    else:
        pairs = ds.map_batches(pair_partial, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=None)
        # lesson 14: the bigram table feeds three consumers (margins x2 +
        # score) — materialize ONCE and derive the margins from the
        # AGGREGATED table (far smaller than the per-block pairs partials),
        # replacing two full-size exchanges with two vocab-bounded ones
        bigrams = groupby_agg(pairs, ["w1", "w2"], {"cnt": ["sum"]})
        bigrams = bigrams.materialize()

    # vocab-bounded margins, folded on the driver and broadcast
    def margin(key):
        m = groupby_agg(bigrams, [key], {"cnt_sum": ["sum"]})
        col = "cnt_sum_sum"
        if isinstance(m, pa.Table):
            t = m
        else:
            refs = [t for t in collect_tables(m) if t.num_rows]
            t = pa.concat_tables(refs) if refs else pa.table(
                {key: pa.array([], pa.string()), col: pa.array([], pa.int64())})
        if t.num_rows > max_broadcast_terms:
            raise ValueError(f"vocabulary has {t.num_rows} terms > "
                             f"max_broadcast_terms={max_broadcast_terms}")
        return dict(zip(t.column(key).to_pylist(),
                        pc.cast(t.column(col), pa.int64()).to_pylist()))

    left_tot = margin("w1")
    right_tot = margin("w2")
    N = sum(left_tot.values())
    if N == 0:
        raise ValueError("collocations: no bigrams in the corpus")
    l_labels = sorted(left_tot)
    r_labels = sorted(right_tot)
    l_arr = np.array([left_tot[w] for w in l_labels], dtype=np.int64)
    r_arr = np.array([right_tot[w] for w in r_labels], dtype=np.int64)

    def score(block: pa.Table) -> pa.Table:
        cnt = pc.cast(block.column("cnt_sum"), pa.int64())
        keep = pc.greater_equal(cnt, pa.scalar(min_count, pa.int64()))
        block = block.filter(keep)
        cnt_np = pc.cast(block.column("cnt_sum"), pa.int64()).to_numpy(zero_copy_only=False)
        li = pc.fill_null(pc.index_in(block.column("w1"),
                                      value_set=pa.array(l_labels, pa.string())), 0
                          ).to_numpy(zero_copy_only=False).astype(np.int64)
        ri = pc.fill_null(pc.index_in(block.column("w2"),
                                      value_set=pa.array(r_labels, pa.string())), 0
                          ).to_numpy(zero_copy_only=False).astype(np.int64)
        lt = l_arr[li].astype(np.float64)
        rt = r_arr[ri].astype(np.float64)
        with np.errstate(divide="ignore"):
            # libm_log: oracle-mirrored ln must match DuckDB bit-for-bit
            pmi = A.libm_log((cnt_np.astype(np.float64) * float(N)) / (lt * rt))
        return pa.table({"w1": block.column("w1"), "w2": block.column("w2"),
                         "n_pair": pa.array(cnt_np), "pmi": pa.array(pmi)})

    score.__name__ = "pmi_score"
    if isinstance(bigrams, pa.Table):
        return score(bigrams)
    return bigrams.map_batches(score, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=None)


def lm_bigram_scores(ds, id_col: str, text_col: str,
                     multiplier: int = 1_000_000,
                     max_broadcast_pairs: int = 5_000_000):
    """Bigram language-model fluency score per document — the integer-exact
    stand-in for CCNet-style LM/perplexity quality filtering one order above
    :func:`word_freq_scores`'s unigram version: per adjacent word pair, the
    corpus conditional frequency ``cond_ppm(w1,w2) = floor(C(w1,w2) *
    multiplier / C(w1->*))`` (pure positive int64 floor division, numpy ==
    DuckDB ``//``), summed over the document's ordered bigrams; the score is
    ONE double division ``sum_ppm / n_bigrams``. Garbled or rare-transition
    text scores LOW; fluent boilerplate scores HIGH. No ln, no float sums.

    Distributed shape: block-local adjacent-pair combiner (the collocations
    kernel) -> ONE (w1, w2) partial-agg groupby -> the aggregated bigram
    table + its w1 margins broadcast ONCE via ``ray.put``
    (``max_broadcast_pairs`` guard — pair vocabularies beyond it need a
    shuffle-join variant) -> one score map over the corpus (occurrences
    never leave their block; lookups hash each DISTINCT in-block pair once).
    Docs with < 2 words emit no row (SQL join semantics). Output:
    ``(id_col, n_bigrams, sum_ppm, lm_score)``."""
    from kamae_ray.base import collect_tables
    from kamae_ray.stages.aggregate import groupby_agg

    def pair_partial(block: pa.Table) -> pa.Table:
        split = pc.split_pattern_regex(
            pc.fill_null(A.as_array(block.column(text_col)), ""), pattern=r"\s+")
        split = A._normalize_list(split)
        offsets = split.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        words = split.values
        d = words.dictionary_encode()
        dvals = d.dictionary
        widx = pc.fill_null(d.indices, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        nonempty = (pc.utf8_length(dvals).to_numpy(zero_copy_only=False) > 0) \
            if len(dvals) else np.zeros(0, bool)
        row_rep = np.repeat(np.arange(block.num_rows), np.diff(offsets))
        if len(widx) < 2:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        left, right = widx[:-1], widx[1:]
        ok = (row_rep[:-1] == row_rep[1:]) & nonempty[left] & nonempty[right]
        lw, rw = left[ok], right[ok]
        nd = len(dvals)
        code_u, cnt = np.unique(lw * nd + rw, return_counts=True)
        return pa.table({
            "w1": pc.cast(dvals.take(pa.array(code_u // nd)), pa.string(), safe=False),
            "w2": pc.cast(dvals.take(pa.array(code_u % nd)), pa.string(), safe=False),
            "cnt": pa.array(cnt.astype(np.int64)),
        })

    pair_partial.__name__ = "bigram_partial"
    if isinstance(ds, pa.Table):
        bigrams = groupby_agg(pair_partial(ds), ["w1", "w2"], {"cnt": ["sum"]})
        bt = bigrams
    else:
        pairs = ds.map_batches(pair_partial, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=None)
        agg = groupby_agg(pairs, ["w1", "w2"], {"cnt": ["sum"]})
        refs = [t for t in collect_tables(agg) if t.num_rows]
        bt = pa.concat_tables(refs) if refs else pa.table(
            {"w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
             "cnt_sum": pa.array([], pa.int64())})
    if bt.num_rows > max_broadcast_pairs:
        raise ValueError(
            f"bigram vocabulary has {bt.num_rows} pairs > max_broadcast_pairs="
            f"{max_broadcast_pairs}")
    c2 = pc.cast(bt.column("cnt_sum"), pa.int64()).to_numpy(zero_copy_only=False)
    if len(c2) and int(c2.max()) * multiplier >= (1 << 63):
        raise ValueError("bigram count * multiplier overflows int64 — lower multiplier")
    # pair keys joined with ' ' — unambiguous: words never contain whitespace
    pair_key = pc.binary_join_element_wise(
        pc.cast(bt.column("w1"), pa.string()), pc.cast(bt.column("w2"), pa.string()), " ")
    # w1 margins from the aggregated table (vocab-bounded, exact int64)
    w1_arr = bt.column("w1")
    w1d = pc.cast(w1_arr, pa.string()).combine_chunks().dictionary_encode()
    nw = len(w1d.dictionary)
    w1_idx = pc.fill_null(w1d.indices, 0).to_numpy(zero_copy_only=False).astype(np.int64)
    margins = np.zeros(max(nw, 1), dtype=np.int64)
    np.add.at(margins, w1_idx, c2)
    w_labels = pc.cast(w1d.dictionary, pa.string(), safe=False)
    mult = np.int64(multiplier)

    def make_score(get_state):
        def score(block: pa.Table) -> pa.Table:
            pk, pcnt, wl, mg = get_state()
            split = pc.split_pattern_regex(
                pc.fill_null(A.as_array(block.column(text_col)), ""), pattern=r"\s+")
            split = A._normalize_list(split)
            offsets = split.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            words = split.values
            ids_arr = A.as_array(block.column(id_col))
            empty = pa.table({id_col: ids_arr.slice(0, 0),
                              "n_bigrams": pa.array([], pa.int64()),
                              "sum_ppm": pa.array([], pa.int64()),
                              "lm_score": pa.array([], pa.float64())})
            d = words.dictionary_encode()
            dvals = d.dictionary
            if len(d) < 2:
                return empty
            widx = pc.fill_null(d.indices, 0).to_numpy(zero_copy_only=False).astype(np.int64)
            nonempty = (pc.utf8_length(dvals).to_numpy(zero_copy_only=False) > 0) \
                if len(dvals) else np.zeros(0, bool)
            row_rep = np.repeat(np.arange(block.num_rows), np.diff(offsets))
            left, right = widx[:-1], widx[1:]
            ok = (row_rep[:-1] == row_rep[1:]) & nonempty[left] & nonempty[right]
            if not ok.any():
                return empty
            lw, rw, docs = left[ok], right[ok], row_rep[:-1][ok]
            nd = len(dvals)
            # hash each DISTINCT in-block pair once (lesson 12), then gather
            code_u, inv = np.unique(lw * nd + rw, return_inverse=True)
            keys_u = pc.binary_join_element_wise(
                pc.cast(dvals.take(pa.array(code_u // nd)), pa.string(), safe=False),
                pc.cast(dvals.take(pa.array(code_u % nd)), pa.string(), safe=False),
                " ")
            ppos = pc.fill_null(pc.index_in(keys_u, value_set=pk), -1) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            cu = np.where(ppos >= 0, pcnt[ppos.clip(min=0)], 0)
            w1u = pc.fill_null(pc.index_in(
                pc.cast(dvals.take(pa.array(code_u // nd)), pa.string(), safe=False),
                value_set=wl), -1).to_numpy(zero_copy_only=False).astype(np.int64)
            m1 = np.where(w1u >= 0, mg[w1u.clip(min=0)], 1)
            ppm_u = (cu * mult) // np.maximum(m1, 1)
            contrib = ppm_u[inv]
            order = np.argsort(docs, kind="stable")
            starts, lens = S.segments(docs[order])
            csum = np.concatenate([[0], np.cumsum(contrib[order])])
            ends = np.concatenate([starts[1:], [len(docs)]])
            sum_ppm = csum[ends] - csum[starts]
            out_ids = ids_arr.take(pa.array(docs[order[starts]]))
            nb = lens.astype(np.int64)
            return pa.table({
                id_col: out_ids,
                "n_bigrams": pa.array(nb),
                "sum_ppm": pa.array(sum_ppm.astype(np.int64)),
                "lm_score": pa.array(sum_ppm.astype(np.float64) / nb.astype(np.float64)),
            })

        score.__name__ = "lm_bigram_score"
        return score

    if isinstance(ds, pa.Table):
        state = (pair_key, c2, w_labels, margins)
        return make_score(lambda: state)(ds)
    import ray

    ref = ray.put((pair_key, c2, w_labels, margins))
    holder = {}

    def get_state():
        if "s" not in holder:
            holder["s"] = ray.get(ref)
        return holder["s"]

    return ds.map_batches(make_score(get_state), batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)


def rrf_fuse(ds, group_cols, item_col: str, rank_col: str,
             k0: int = 60, scale: int = 1_000_000,
             output_col: str = "rrf_score"):
    """Reciprocal Rank Fusion (Cormack et al. 2009) over a UNION of
    per-source ranking rows — the standard hybrid-retrieval combiner
    (BM25 + embedding top-k): each ``(group, item, rank)`` row contributes

        ``scale // (k0 + rank)``

    and the fused score is the exact int64 sum over sources (order-free —
    partition/merge order can never flip a result; no reference analog).
    Input rows carry one rank per (source, group, item); sources are
    implicit (each UNION branch is one source). Output: one row per
    distinct ``group_cols + [item_col]`` with ``output_col`` (int64 fused
    score) and ``n_sources`` (int64 contributing-source count).

    Scale plan: one vectorized contribution map + ONE partial-agg groupby
    over (group, item) — contributions pre-combine inside blocks, so only
    per-block partials shuffle."""
    from kamae_ray.stages.aggregate import groupby_agg

    if k0 < 0 or scale <= 0:
        raise ValueError("k0 must be non-negative and scale positive")
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)

    def contrib(batch: pa.Table) -> pa.Table:
        r = pc.cast(A.as_array(batch.column(rank_col)), pa.int64(),
                    safe=False).to_numpy(zero_copy_only=False)
        if len(r) and r.min() < 1:
            raise ValueError("rrf_fuse ranks must be 1-based positive integers")
        c = scale // (k0 + r)
        cols = {g: batch.column(g) for g in group_cols}
        cols[item_col] = batch.column(item_col)
        cols["__c"] = pa.array(c, pa.int64())
        return pa.table(cols)

    contrib.__name__ = "rrf_contribution"
    if isinstance(ds, pa.Table):
        tbl = groupby_agg(contrib(ds), group_cols + [item_col],
                          {"__c": ["sum", "count"]})
        out = tbl
    else:
        out = groupby_agg(
            ds.map_batches(contrib, batch_format="pyarrow", zero_copy_batch=True),
            group_cols + [item_col], {"__c": ["sum", "count"]})

    def finish(batch: pa.Table) -> pa.Table:
        cols = {g: batch.column(g) for g in group_cols}
        cols[item_col] = batch.column(item_col)
        cols[output_col] = pc.cast(batch.column("__c_sum"), pa.int64(), safe=False)
        cols["n_sources"] = pc.cast(batch.column("__c_count"), pa.int64(), safe=False)
        return pa.table(cols)

    finish.__name__ = "rrf_finish"
    if isinstance(out, pa.Table):
        return finish(out)
    return out.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def dsir_scores(ds_source, ds_target, id_col: str, text_col: str,
                n_buckets: int = 4096, mu_scale: int = 1_000_000):
    """DSIR-style importance weights for data selection (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling" —
    public recipe): score each SOURCE document by the log-likelihood ratio
    of a hashed-unigram bag model fit on the TARGET domain vs the source:

        lr_mu[b]   = round(mu_scale * (ln((t_b+1)/(T+B)) - ln((s_b+1)/(S+B))))
        dsir_sum   = sum over word OCCURRENCES of lr_mu[bucket(word)]

    Buckets are the SQL-certifiable codepoint polynomial (poly31 % B — the
    q_hash_encode constants), both ln's route through libm (lesson 38), and
    each per-bucket log-ratio quantizes to exact int64 MICRO-units
    (half-away — the km_curve family), so the per-doc aggregation is an
    ORDER-FREE integer sum: no cross-word float accumulation exists.
    ``dsir_avg = (sum/n_words)/mu_scale`` is two mirrored divisions. Docs
    with zero words drop (SQL join semantics).

    Scale plan: two tf passes (block-local, no shuffle) -> O(blocks x B)
    dense bucket-count partials folded on the driver (B is fixed and
    small) -> the lr table rides the score-map closure (broadcast once) ->
    one score map. Output: (id_col, n_words, dsir_sum_mu, dsir_avg)."""
    from kamae_ray.base import collect_tables
    from kamae_ray.functions import segments as S
    from kamae_ray.stages.hashing import poly31_column

    B = int(n_buckets)
    if B < 2 or B > 1_000_000:
        raise ValueError("n_buckets must be in [2, 1e6]")

    def bucket_counts(tf_long):
        def partial(block: pa.Table) -> pa.Table:
            h, _ = poly31_column(A.as_array(block.column("term")))
            b = h % np.int64(B)
            tf = block.column("tf").to_numpy(zero_copy_only=False)
            dense = np.zeros(B, np.int64)
            np.add.at(dense, b, tf)
            return pa.table({"b": pa.array(np.arange(B, dtype=np.int64)),
                             "c": pa.array(dense)})

        partial.__name__ = "dsir_bucket_counts"
        if isinstance(tf_long, pa.Table):
            parts = [partial(tf_long)]
        else:
            parts = [t for t in collect_tables(
                tf_long.map_batches(partial, batch_format="pyarrow",
                                    zero_copy_batch=True, batch_size=None))
                if t.num_rows]
        dense = np.zeros(B, np.int64)
        for t in parts:
            dense[t.column("b").to_numpy(zero_copy_only=False)] += \
                t.column("c").to_numpy(zero_copy_only=False)
        return dense

    tf_src = term_frequencies(ds_source, id_col, text_col)
    if not isinstance(tf_src, pa.Table):
        tf_src = tf_src.materialize()  # consumed twice (counts + scoring)
    s_b = bucket_counts(tf_src)
    t_b = bucket_counts(term_frequencies(ds_target, id_col, text_col))
    S_tot, T_tot = int(s_b.sum()), int(t_b.sum())
    if S_tot == 0 or T_tot == 0:
        raise ValueError("dsir_scores: empty source or target corpus")
    # mirrored float chain: integer adds, two casts, two libm lns, round
    lr = A.libm_log((t_b + 1).astype(np.float64) / float(T_tot + B)) \
        - A.libm_log((s_b + 1).astype(np.float64) / float(S_tot + B))
    lr_mu = pc.cast(pc.round(pa.array(float(mu_scale) * lr), ndigits=0,
                             round_mode="half_towards_infinity"),
                    pa.int64()).to_numpy(zero_copy_only=False)

    def score(block: pa.Table) -> pa.Table:
        ids_arr = A.as_array(block.column(id_col))
        empty = pa.table({id_col: ids_arr.slice(0, 0),
                          "n_words": pa.array([], pa.int64()),
                          "dsir_sum_mu": pa.array([], pa.int64()),
                          "dsir_avg": pa.array([], pa.float64())})
        if block.num_rows == 0:
            return empty
        h, _ = poly31_column(A.as_array(block.column("term")))
        b = h % np.int64(B)
        tf = block.column("tf").to_numpy(zero_copy_only=False)
        gids = ids_arr.dictionary_encode().indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(gids, kind="stable")
        starts, _lens = S.segments(gids[order])
        contrib = (lr_mu[b] * tf)[order]
        csum = np.concatenate([[0], np.cumsum(contrib)])
        ends = np.concatenate([starts[1:], [len(gids)]])
        sum_mu = csum[ends] - csum[starts]
        tsum = np.concatenate([[0], np.cumsum(tf[order])])
        n_words = tsum[ends] - tsum[starts]
        if len(sum_mu) and int(np.abs(sum_mu).max()) >= (1 << 62):
            raise ValueError("dsir per-doc sums exceed int64")
        avg = (sum_mu.astype(np.float64) / n_words.astype(np.float64)) \
            / float(mu_scale)
        return pa.table({
            id_col: ids_arr.take(pa.array(order[starts])),
            "n_words": pa.array(n_words),
            "dsir_sum_mu": pa.array(sum_mu),
            "dsir_avg": pa.array(avg, pa.float64()),
        })

    score.__name__ = "dsir_score"
    if isinstance(tf_src, pa.Table):
        return score(tf_src)
    return tf_src.map_batches(score, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)


def zipf_fit(ds, text_col: str, top_r: int = 1000):
    """Zipf's-law fit of the corpus unigram distribution: least-squares
    slope/intercept of ``ln(freq) ~ ln(rank)`` over the top ``top_r`` terms
    (count DESC, term ASC rank order) — the classic corpus-health readout
    (natural text slopes ~ -1). Both log coordinates quantize to EXACT
    milli-ln integers (``round(ln(v) * 1000)``, libm ln + half-away — bits
    identical cross-engine), so the regression moments are exact int64 and
    the slope is ONE division; the intercept chain is one fixed IEEE order.
    Output: one row ``n_terms, slope, intercept``.

    Scale plan: term counts are one explode + partial-agg exchange; the
    partial top-k plan bounds the second exchange at k rows per block; the
    driver sees only ``top_r`` rows."""
    from kamae_ray.stages.aggregate import groupby_agg, topk_per_group
    from kamae_ray.stages.reshape import explode
    from kamae_ray.stages.text import NGramTransformer

    terms = NGramTransformer(input_col=text_col, n=1, output_col="term").transform(ds)
    terms = explode(terms, "term")

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({"term": t.column("term"),
                         "one": pa.array(np.ones(t.num_rows, np.int64))})

    proj.__name__ = "zipf_proj"
    if isinstance(terms, pa.Table):
        counts = groupby_agg(proj(terms), "term", {"one": ["sum"]})
    else:
        counts = groupby_agg(
            terms.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True,
                              batch_size=None),
            "term", {"one": ["sum"]})

    def addg(t: pa.Table) -> pa.Table:
        return pa.table({"__g": pa.array(np.zeros(t.num_rows, np.int64)),
                         "term": t.column("term"),
                         "n": pc.cast(t.column("one_sum"), pa.int64(), safe=False)})

    addg.__name__ = "zipf_addg"
    if isinstance(counts, pa.Table):
        top = topk_per_group(addg(counts), "__g", "n", top_r,
                             descending=True, tiebreak="term")
    else:
        top = topk_per_group(
            counts.map_batches(addg, batch_format="pyarrow", zero_copy_batch=True,
                               batch_size=None),
            "__g", "n", top_r, descending=True, tiebreak="term")
        from kamae_ray.base import collect_tables

        top = pa.concat_tables(collect_tables(top)).combine_chunks()
    if top.num_rows < 2:
        return pa.table({"n_terms": pa.array([top.num_rows], pa.int64()),
                         "slope": pa.array([None], pa.float64()),
                         "intercept": pa.array([None], pa.float64())})
    # rank order: (n DESC, term ASC)
    idx = pc.sort_indices(top, sort_keys=[("n", "descending"), ("term", "ascending")])
    cnt = top.column("n").take(idx).to_numpy(zero_copy_only=False)
    k = len(cnt)
    r = np.arange(1, k + 1, dtype=np.float64)
    x = np.floor(A.libm_log(r) * 1000.0 + 0.5).astype(np.int64)
    y = np.floor(A.libm_log(cnt.astype(np.float64)) * 1000.0 + 0.5).astype(np.int64)
    kk = np.int64(k)
    sx, sy = int(x.sum()), int(y.sum())
    sxy, sxx = int((x * y).sum()), int((x * x).sum())
    num = int(kk) * sxy - sx * sy
    den = int(kk) * sxx - sx * sx
    slope = float(num) / float(den)
    intercept = (float(sy) - slope * float(sx)) / float(k)
    return pa.table({"n_terms": pa.array([k], pa.int64()),
                     "slope": pa.array([slope], pa.float64()),
                     "intercept": pa.array([intercept], pa.float64())})


def zipf_oracle_sql(table: str, text_col: str, top_r: int = 1000) -> str:
    """DuckDB mirror of :func:`zipf_fit` — same tokenization
    (whitespace-split non-empty), same milli-ln quantization, same exact
    integer moments and single-order float chain."""
    return (
        r"WITH w AS (SELECT unnest(list_filter(string_split_regex("
        rf"coalesce({text_col}, ''), '\s+'), x -> length(x) > 0)) AS term "
        f"FROM {table}), "
        "c AS (SELECT term, count(*)::BIGINT AS n FROM w GROUP BY term), "
        "t AS (SELECT n, row_number() OVER (ORDER BY n DESC, term) AS r FROM c), "
        f"q AS (SELECT CAST(round(ln(r) * 1000) AS BIGINT) AS x, "
        f"CAST(round(ln(n) * 1000) AS BIGINT) AS y FROM t WHERE r <= {top_r}), "
        "m AS (SELECT count(*)::BIGINT AS k, CAST(SUM(x) AS BIGINT) AS sx, "
        "CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * y) AS BIGINT) AS sxy, "
        "CAST(SUM(x * x) AS BIGINT) AS sxx FROM q) "
        "SELECT k AS n_terms, "
        "CAST(k * sxy - sx * sy AS DOUBLE) / (k * sxx - sx * sx) AS slope, "
        "(CAST(sy AS DOUBLE) - (CAST(k * sxy - sx * sy AS DOUBLE) / "
        "(k * sxx - sx * sx)) * CAST(sx AS DOUBLE)) / k AS intercept FROM m"
    )
