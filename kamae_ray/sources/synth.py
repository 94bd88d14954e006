"""Deterministic synthetic sources.

The north-star input (BASELINE.json ``input_hint``) is a Parquet table of
pre-tokenized training sequences ``(doc_id:string, tokens:array<int32>,
n_tok:int32, source:string)``. The driver's testdata has no such table, so we
synthesize it two ways:

1. ``make_tokens_table`` — pure numpy, seed-deterministic, Zipf-skewed doc_id
   repeat counts (exercises skew salting) with monotone per-(source, doc_id)
   positions; used for tests and bench at any scale.
2. ``tokens_from_documents`` — derive it from the driver's documents table via
   the SQL-expressible tokenizer (stages/text.py TokenizeTransformer), so the
   DuckDB oracle can verify the exact same derivation.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from kamae_ray.sources.io import read_parquet_clean

_SOURCES = ["web", "books", "code", "chat"]


def make_tokens_table(
    n_rows: int = 10_000,
    n_docs: int = 2_000,
    vocab_size: int = 50_000,
    max_len: int = 512,
    seed: int = 42,
) -> pa.Table:
    """Deterministic F1 tokens table with Zipf-skewed entities and a
    ``position`` column (monotone per (source, doc_id) — the event time)."""
    rng = np.random.RandomState(seed)
    # Zipf-distributed doc popularity: some entities have long histories
    doc_ids = rng.zipf(1.3, size=n_rows) % n_docs
    sources = np.asarray(_SOURCES)[rng.randint(0, len(_SOURCES), size=n_rows)]
    lens = rng.randint(1, max_len + 1, size=n_rows)
    total = int(lens.sum())
    tokens = rng.randint(0, vocab_size, size=total).astype(np.int32)
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    tok_col = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(tokens))
    # position: running index within (source, doc_id), in row order
    key = np.char.add(np.char.add(sources.astype(str), "\x1f"), doc_ids.astype(str))
    order = np.argsort(key, kind="stable")
    pos = np.empty(n_rows, dtype=np.int64)
    sorted_key = key[order]
    new_grp = np.concatenate([[True], sorted_key[1:] != sorted_key[:-1]])
    grp_start = np.maximum.accumulate(np.where(new_grp, np.arange(n_rows), 0))
    pos[order] = np.arange(n_rows) - grp_start
    return pa.table(
        {
            "doc_id": pa.array(doc_ids.astype(str), pa.string()),
            "tokens": tok_col,
            "n_tok": pa.array(lens.astype(np.int32), pa.int32()),
            "source": pa.array(sources.astype(str), pa.string()),
            "position": pa.array(pos, pa.int64()),
        }
    )


def tokens_table_path(
    n_rows: int, seed: int = 42, cache_dir: str = "/tmp/kamae_ray_synth", rows_per_file: int = 25_000
) -> str:
    """Write (once) and return the path of a cached synthetic tokens table as
    a DIRECTORY of parquet shards. Ray assigns one read task per file, so a
    single giant file serializes the whole read (measured: 1 read task feeding
    200 split blocks); sharding is also the resumable-output unit."""
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"tokens_n{n_rows}_s{seed}_sharded")
    done = path + ".done"  # marker outside the dir so readers only see parquet
    if not os.path.exists(done):
        t = make_tokens_table(n_rows=n_rows, seed=seed)
        os.makedirs(path, exist_ok=True)
        i = 0
        for start in range(0, max(t.num_rows, 1), rows_per_file):
            part = t.slice(start, rows_per_file)
            pq.write_table(part, os.path.join(path, f"part-{i:05d}.parquet"), row_group_size=25_000)
            i += 1
        with open(done, "w") as f:
            f.write(str(t.num_rows))
    return path


def tokens_from_documents(sf_dir: str, vocab_size: int = 50_000):
    """documents.parquet -> tokens table via the deterministic SQL-expressible
    tokenizer. Returns a ray Dataset when ray is initialised, else pa.Table."""
    from kamae_ray.stages.text import TokenizeTransformer, TokenCountTransformer

    tok = TokenizeTransformer(input_col="text", vocab_size=vocab_size, output_col="tokens")
    cnt = TokenCountTransformer(input_col="text", mode="whitespace", output_col="n_tok")
    path = os.path.join(sf_dir, "documents.parquet")
    try:
        import ray

        if ray.is_initialized():
            ds = read_parquet_clean(path, columns=["doc_id", "text", "source"])
            out = tok.transform(ds)
            out = cnt.transform(out)

            def finish(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                return pa.table(
                    {
                        "doc_id": pc.cast(batch.column("doc_id"), pa.string()),
                        "tokens": batch.column("tokens"),
                        "n_tok": pc.cast(batch.column("n_tok"), pa.int32()),
                        "source": batch.column("source"),
                    }
                )

            return out.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    except ImportError:
        pass
    import pyarrow.compute as pc

    t = pq.read_table(path, columns=["doc_id", "text", "source"])
    t = cnt.transform_batch(tok.transform_batch(t))
    return pa.table(
        {
            "doc_id": pc.cast(t.column("doc_id"), pa.string()),
            "tokens": t.column("tokens"),
            "n_tok": pc.cast(t.column("n_tok"), pa.int32()),
            "source": t.column("source"),
        }
    )
