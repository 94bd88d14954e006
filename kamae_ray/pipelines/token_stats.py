"""Corpus statistics over pre-tokenized ``tokens: list<int>`` columns — the
graft's native payload (BASELINE.json input_hint): BPE-style adjacent-pair
counts (the tokenizer-training inner step) and OOV-rate scoring against a
fitted top-K vocabulary.

No reference analog (kamae has no corpus-level token statistics); both ops
follow the repo's exact-integer discipline — counts stay int64 end to end,
the only float is one final division — so the DuckDB oracles are hash-exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kamae_ray.functions import arrays as A

_PAIR_LIMIT = 1 << 30  # |token id| bound for the packed int64 pair code


def _flat_tokens(block: pa.Table, tokens_col: str):
    """(row_lengths, flat int64 values) of a list column, aligned: null list
    rows count as empty (and their offset spans — which Arrow may still
    populate — are dropped from the flat values), null ELEMENTS are dropped
    as a guard (our token expressions never produce them)."""
    arr = A.as_array(block.column(tokens_col))
    levels, flat = A.unwrap(arr)
    offsets, validity = levels[0]
    lens0 = np.diff(offsets)
    vals = pc.cast(flat, pa.int64(), safe=False)
    v = pc.fill_null(vals, 0).to_numpy(zero_copy_only=False)
    keep = None
    if validity is not None:
        keep = np.repeat(validity.to_numpy(zero_copy_only=False), lens0)
    if flat.null_count:
        ek = pc.is_valid(vals).to_numpy(zero_copy_only=False)
        keep = ek if keep is None else (keep & ek)
    if keep is None:
        return lens0.astype(np.int64), v
    csum = np.concatenate(([0], np.cumsum(keep.astype(np.int64))))
    ends = np.concatenate(([0], np.cumsum(lens0)))
    lens = csum[ends[1:]] - csum[ends[:-1]]
    return lens.astype(np.int64), v[keep]


def bpe_pair_counts(ds, tokens_col: str, min_count: int = 1):
    """Adjacent token-pair frequencies across the corpus — the inner
    statistic of BPE/WordPiece tokenizer training: for every row, each
    consecutive ``(tokens[i], tokens[i+1])`` pair counts once (pairs never
    span rows). Output: ``tok_a, tok_b, cnt`` (all int64, cnt >= min_count),
    sorted (cnt DESC, tok_a, tok_b).

    Scale plan: each block dedups its pairs to (pair, partial-count) via ONE
    np.unique over packed int64 codes — the exchange carries O(blocks x
    in-block distinct pairs), never the token stream — then one sort-shuffle
    on the pair code and a segment-sum kernel. Integer counts are order-free,
    so the merge is exact at any partitioning. Token ids must satisfy
    ``|id| < 2^30`` (the packed-code range; any real vocab does)."""

    def partial(block: pa.Table) -> pa.Table:
        lens, v = _flat_tokens(block, tokens_col)
        if len(v) and (np.abs(v).max() >= _PAIR_LIMIT):
            raise ValueError(
                f"bpe_pair_counts: |token id| >= 2^30 cannot pack into the "
                f"int64 pair code")
        # valid pair positions: every flat index except each row's last
        ends = np.cumsum(lens)
        valid = np.ones(len(v), dtype=bool)
        valid[ends[lens > 0] - 1] = False
        a = v[:-1][valid[:-1]] if len(v) else v
        b = v[1:][valid[:-1]] if len(v) else v
        code = (a + _PAIR_LIMIT) * (1 << 32) + (b + _PAIR_LIMIT)
        u, cnt = np.unique(code, return_counts=True)
        return pa.table({"pair": pa.array(u, pa.int64()),
                         "cnt": pa.array(cnt.astype(np.int64))})

    partial.__name__ = "bpe_pair_partial"

    def merge(block: pa.Table) -> pa.Table:
        from kamae_ray.functions import segments as S

        if block.num_rows == 0:
            return pa.table({"tok_a": pa.array([], pa.int64()),
                             "tok_b": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        code = block.column("pair").to_numpy(zero_copy_only=False)
        cnt = block.column("cnt").to_numpy(zero_copy_only=False)
        order = np.argsort(code, kind="stable")
        cs, cc = code[order], cnt[order]
        starts, _lens = S.segments(cs)
        tot = np.add.reduceat(cc, starts)
        keep = tot >= min_count
        ucode, tot = cs[starts][keep], tot[keep]
        return pa.table({
            "tok_a": pa.array(ucode // (1 << 32) - _PAIR_LIMIT, pa.int64()),
            "tok_b": pa.array(ucode % (1 << 32) - _PAIR_LIMIT, pa.int64()),
            "cnt": pa.array(tot),
        })

    if isinstance(ds, pa.Table):
        out = merge(partial(ds))
        return out.sort_by([("cnt", "descending"), ("tok_a", "ascending"),
                            ("tok_b", "ascending")])
    from kamae_ray.stages.window import sorted_block_apply

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
    return sorted_block_apply(parts, ["pair"], merge, "bpe_pair_merge")


def token_counts(ds, tokens_col: str, max_vocab_rows: int = 5_000_000):
    """Global per-token frequencies as ``{token_id: count}`` (exact int64).
    Per-block np.unique partials -> driver segment-sum fold, bounded by
    ``max_vocab_rows`` distinct tokens (vocabularies are bounded by
    construction; above the budget raise and point to the distributed
    merge)."""

    def partial(block: pa.Table) -> pa.Table:
        _lens, v = _flat_tokens(block, tokens_col)
        u, cnt = np.unique(v, return_counts=True)
        return pa.table({"tok": pa.array(u, pa.int64()),
                         "cnt": pa.array(cnt.astype(np.int64))})

    partial.__name__ = "token_count_partial"
    if isinstance(ds, pa.Table):
        parts = [partial(ds)]
    else:
        from kamae_ray.base import collect_tables
        from kamae_ray.state.aggregators import _project

        parts = collect_tables(
            _project(ds, [tokens_col]).map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=None))
    parts = [t for t in parts if t.num_rows]
    if not parts:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    allp = pa.concat_tables(parts)
    if allp.num_rows > max_vocab_rows:
        raise ValueError(
            f"token_counts: {allp.num_rows} partial rows > max_vocab_rows="
            f"{max_vocab_rows}; merge with sorted_block_apply instead of the "
            "driver fold at this vocabulary size")
    toks = allp.column("tok").to_numpy(zero_copy_only=False)
    cnts = allp.column("cnt").to_numpy(zero_copy_only=False)
    order = np.argsort(toks, kind="stable")
    ts, cs = toks[order], cnts[order]
    from kamae_ray.functions import segments as S

    starts, _lens = S.segments(ts)
    return ts[starts], np.add.reduceat(cs, starts)


def oov_stats(ds, id_col: str, tokens_col: str, vocab_k: int = 1000,
              max_vocab_rows: int = 5_000_000):
    """Fit a top-K vocabulary by global token frequency (ties -> smaller
    token id, deterministic), then score every row: ``n_tok`` (int64),
    ``n_oov`` (tokens outside the vocab, int64), ``oov_rate`` (one exact
    double division, 6dp half-away; null when the row has no tokens) — the
    vocabulary-coverage gate of tokenizer/corpus QA.

    Scale plan: fit = the token_counts fold (vocab-bounded partials);
    apply = broadcast sorted vocab ids (closure constant, tiny) + one
    searchsorted membership map per block. No shuffle."""
    toks, cnts = token_counts(ds, tokens_col, max_vocab_rows=max_vocab_rows)
    if len(toks):
        order = np.lexsort((toks, -cnts))[:vocab_k]
        vocab = np.sort(toks[order])
    else:
        vocab = toks

    def score(block: pa.Table) -> pa.Table:
        lens, v = _flat_tokens(block, tokens_col)
        if len(vocab):
            pos = np.searchsorted(vocab, v)
            pos_c = np.minimum(pos, len(vocab) - 1)
            oov = (vocab[pos_c] != v).astype(np.int64)
        else:
            oov = np.ones(len(v), dtype=np.int64)
        csum = np.concatenate(([0], np.cumsum(oov)))
        ends = np.concatenate(([0], np.cumsum(lens)))
        n_oov = csum[ends[1:]] - csum[ends[:-1]]
        with np.errstate(divide="ignore", invalid="ignore"):
            rate = n_oov.astype(np.float64) / lens.astype(np.float64)
        rate_r = pc.round(pa.array(rate, pa.float64(), mask=(lens == 0)),
                          ndigits=6, round_mode="half_towards_infinity")
        return pa.table({
            id_col: block.column(id_col),
            "n_tok": pa.array(lens),
            "n_oov": pa.array(n_oov),
            "oov_rate": rate_r,
        })

    score.__name__ = "oov_score"
    if isinstance(ds, pa.Table):
        return score(ds)
    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=None)


_TRI_LIMIT = 1 << 20  # |token id| bound for the packed int64 trigram code


def token_trigram_counts(ds, tokens_col: str, min_count: int = 1):
    """Adjacent token-TRIGRAM frequencies across the corpus — the n=3
    sibling of :func:`bpe_pair_counts` (n-gram LM / repeated-phrase mining
    over token streams). For every row each consecutive
    ``(tokens[i], tokens[i+1], tokens[i+2])`` counts once; trigrams never
    span rows. Output: ``tok_a, tok_b, tok_c, cnt`` (int64,
    cnt >= min_count), sorted (cnt DESC, tok_a, tok_b, tok_c).

    Same scale plan as the pair op: per-block np.unique over packed int64
    codes (base 2^21 — three 21-bit fields), ONE code sort-shuffle, a
    segment-sum merge; exchanges carry O(blocks x in-block distinct
    trigrams). Token ids must satisfy ``|id| < 2^20`` (any real vocab
    does; bpe_pair_counts allows 2^30 because it only packs two)."""
    B = np.int64(1 << 21)

    def partial(block: pa.Table) -> pa.Table:
        lens, v = _flat_tokens(block, tokens_col)
        if len(v) and (np.abs(v).max() >= _TRI_LIMIT):
            raise ValueError(
                "token_trigram_counts: |token id| >= 2^20 cannot pack into "
                "the int64 trigram code")
        ends = np.cumsum(lens)
        valid = np.ones(len(v), dtype=bool)
        # a trigram starts everywhere except each row's last TWO positions
        valid[ends[lens > 0] - 1] = False
        valid[ends[lens > 1] - 2] = False
        n = len(v)
        starts_ok = valid[: n - 2] if n >= 2 else valid[:0]
        a = v[: n - 2][starts_ok] if n else v
        b = v[1 : n - 1][starts_ok] if n else v
        c = v[2:][starts_ok] if n else v
        code = ((a + _TRI_LIMIT) * B + (b + _TRI_LIMIT)) * B + (c + _TRI_LIMIT)
        u, cnt = np.unique(code, return_counts=True)
        return pa.table({"tri": pa.array(u, pa.int64()),
                         "cnt": pa.array(cnt.astype(np.int64))})

    partial.__name__ = "trigram_partial"

    def merge(block: pa.Table) -> pa.Table:
        from kamae_ray.functions import segments as S

        if block.num_rows == 0:
            return pa.table({"tok_a": pa.array([], pa.int64()),
                             "tok_b": pa.array([], pa.int64()),
                             "tok_c": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        code = block.column("tri").to_numpy(zero_copy_only=False)
        cnt = block.column("cnt").to_numpy(zero_copy_only=False)
        order = np.argsort(code, kind="stable")
        cs, cc = code[order], cnt[order]
        starts, _lens = S.segments(cs)
        tot = np.add.reduceat(cc, starts)
        keep = tot >= min_count
        ucode, tot = cs[starts][keep], tot[keep]
        return pa.table({
            "tok_a": pa.array(ucode // (B * B) - _TRI_LIMIT, pa.int64()),
            "tok_b": pa.array((ucode // B) % B - _TRI_LIMIT, pa.int64()),
            "tok_c": pa.array(ucode % B - _TRI_LIMIT, pa.int64()),
            "cnt": pa.array(tot),
        })

    if isinstance(ds, pa.Table):
        out = merge(partial(ds))
        return out.sort_by([("cnt", "descending"), ("tok_a", "ascending"),
                            ("tok_b", "ascending"), ("tok_c", "ascending")])
    from kamae_ray.stages.window import sorted_block_apply

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
    return sorted_block_apply(parts, ["tri"], merge, "trigram_merge")
