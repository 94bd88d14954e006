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
        idf = np.log(ln_n1 / (df + 1.0)) + 1.0
        return block.append_column("tfidf", pa.array(tf * idf, pa.float64()))

    score.__name__ = "tfidf_score"
    if isinstance(joined, pa.Table):
        scored = score(joined)
    else:
        scored = joined.map_batches(score, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    return topk_per_group(scored, [id_col], "tfidf", k, tiebreak=["term"])
