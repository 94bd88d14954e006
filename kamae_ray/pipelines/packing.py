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
