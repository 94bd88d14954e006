"""End-to-end LLM corpus preparation — the full hygiene chain this engine
exists for, composed from its own primitives:

    raw documents
      -> quality filter        (length / stopword-ratio heuristics — one
                                vectorized map, no shuffle)
      -> decontamination       (drop docs sharing an n-gram with the eval
                                set — broadcast gram set, no shuffle)
      -> exact dedup           (keep min-id per identical text — one
                                key-hash sort-shuffle)
      -> sequence packing      (concat-and-chunk token spans — distributed
                                prefix sum, one bucket-keyed shuffle)

Every step is SQL-expressible, so the WHOLE chain is certified end-to-end
by one chained-CTE oracle (q_llm_prep). Total exchanges for the pipeline:
two (dedup key sort + packing bucket sort) — everything else streams.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def llm_corpus_prep(
    docs,
    bench,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 100,
    min_stop_ratio: float = 0.05,
    decontam_n: int = 3,
    seq_len: int = 512,
):
    """Run the quality -> decontaminate -> dedup -> pack chain.

    ``docs``/``bench`` are Datasets (or Tables) with (id_col, text_col).
    Returns (id, n_tok, tok_offset, seq_first, seq_last) for the surviving
    training documents — the packed-stream manifest a pretraining loader
    consumes."""
    from kamae_ray.pipelines.decontam import benchmark_ngram_set, decontaminate
    from kamae_ray.pipelines.dedup import exact_dedup
    from kamae_ray.pipelines.packing import pack_sequences
    from kamae_ray.stages.text import QualityScoreTransformer, TokenCountTransformer

    q = QualityScoreTransformer(input_col=text_col, output_col="__kr_q")
    scored = q.transform(docs)

    def qual_filter(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(batch.column("__kr_q_len"), pa.scalar(min_chars)),
            pc.greater_equal(batch.column("__kr_q_stop_ratio"), pa.scalar(min_stop_ratio)),
        )
        return batch.filter(pc.fill_null(keep, False)).select([id_col, text_col])

    qual_filter.__name__ = "quality_filter"
    qual = qual_filter(scored) if isinstance(scored, pa.Table) else scored.map_batches(
        qual_filter, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    bset = benchmark_ngram_set(bench, text_col, n=decontam_n)
    clean = decontaminate(qual, bset, text_col, id_col, keep_clean=True, project=False)

    def drop_hits(batch: pa.Table) -> pa.Table:
        return batch.drop_columns(["n_hits"])

    drop_hits.__name__ = "drop_hits"
    clean = drop_hits(clean) if isinstance(clean, pa.Table) else clean.map_batches(
        drop_hits, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    deduped = exact_dedup(clean, text_col, id_col)

    tok = TokenCountTransformer(input_col=text_col, output_col="__kr_ntok").transform(deduped)

    def narrow(batch: pa.Table) -> pa.Table:
        return pa.table({id_col: batch.column(id_col), "n_tok": batch.column("__kr_ntok")})

    narrow.__name__ = "pack_narrow"
    counts = narrow(tok) if isinstance(tok, pa.Table) else tok.map_batches(
        narrow, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return pack_sequences(counts, id_col, "n_tok", seq_len=seq_len)
