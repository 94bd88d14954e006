"""token_stats: BPE adjacent-pair counts + OOV-rate scoring over
``tokens: list<int>`` columns (the graft's native payload)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from kamae_ray.pipelines.token_stats import bpe_pair_counts, oov_stats, token_counts


def _corpus(n=400, seed=0, vocab=60):
    rng = np.random.default_rng(seed)
    rows = [rng.integers(0, vocab, size=rng.integers(0, 14)).tolist()
            for _ in range(n)]
    rows[3] = None
    rows[7] = []
    rows[11] = [5]  # single token: no pairs
    return pa.table({"doc_id": pa.array(np.arange(n)),
                     "toks": pa.array(rows, pa.list_(pa.int32()))})


class TestBpePairCounts:
    def test_matches_sql_oracle(self):
        t = _corpus()
        out = bpe_pair_counts(t, "toks", min_count=2)
        con = duckdb.connect()
        con.register("t", t)
        ora = con.execute("""
          WITH p AS (SELECT toks[i]::BIGINT a, toks[i+1]::BIGINT b
                     FROM t, LATERAL (SELECT unnest(range(1, len(toks))) i) g
                     WHERE toks IS NOT NULL)
          SELECT a tok_a, b tok_b, CAST(COUNT(*) AS BIGINT) cnt FROM p
          GROUP BY 1, 2 HAVING COUNT(*) >= 2 ORDER BY cnt DESC, tok_a, tok_b
        """).arrow()
        assert out.combine_chunks().equals(ora.cast(out.schema).combine_chunks())

    def test_pairs_never_span_rows(self):
        t = pa.table({"toks": pa.array([[1, 2], [3, 4]], pa.list_(pa.int32()))})
        out = bpe_pair_counts(t, "toks")
        got = {(r["tok_a"], r["tok_b"]) for r in out.to_pylist()}
        assert got == {(1, 2), (3, 4)}  # (2, 3) must NOT appear

    def test_negative_ids_and_range_guard(self):
        t = pa.table({"toks": pa.array([[-7, -7, -7]], pa.list_(pa.int32()))})
        out = bpe_pair_counts(t, "toks")
        assert out.to_pylist() == [{"tok_a": -7, "tok_b": -7, "cnt": 2}]
        big = pa.table({"toks": pa.array([[2 ** 30, 1]], pa.list_(pa.int64()))})
        with pytest.raises(ValueError, match="2\\^30"):
            bpe_pair_counts(big, "toks")

    def test_dataset_matches_table(self, ray_session):
        import ray

        t = _corpus(600, seed=2)
        want = bpe_pair_counts(t, "toks", min_count=2)
        ds = ray.data.from_arrow(t).repartition(5)
        got = pa.concat_tables(
            [pa.table(b) for b in bpe_pair_counts(ds, "toks", min_count=2)
             .iter_batches(batch_format="pyarrow")])
        key = [("cnt", "descending"), ("tok_a", "ascending"), ("tok_b", "ascending")]
        assert got.sort_by(key).combine_chunks().equals(
            want.sort_by(key).combine_chunks())


class TestOovStats:
    def test_matches_sql_oracle_and_tie_break(self):
        t = _corpus(500, seed=1, vocab=40)
        out = oov_stats(t, "doc_id", "toks", vocab_k=10)
        con = duckdb.connect()
        con.register("t", t)
        ora = con.execute("""
          WITH u AS (SELECT doc_id, unnest(toks)::BIGINT tok FROM t
                     WHERE toks IS NOT NULL),
          v AS (SELECT tok FROM (SELECT tok, COUNT(*) c FROM u GROUP BY tok)
                ORDER BY c DESC, tok LIMIT 10),
          per AS (SELECT u.doc_id, CAST(COUNT(*) AS BIGINT) n_tok,
                  CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) n_oov
                  FROM u LEFT JOIN v ON u.tok = v.tok GROUP BY u.doc_id)
          SELECT t.doc_id, COALESCE(per.n_tok, 0) n_tok,
                 COALESCE(per.n_oov, 0) n_oov,
                 ROUND(per.n_oov::DOUBLE / per.n_tok, 6) oov_rate
          FROM t LEFT JOIN per ON t.doc_id = per.doc_id ORDER BY t.doc_id
        """).arrow()
        assert out.combine_chunks().equals(ora.cast(out.schema).combine_chunks())

    def test_empty_and_null_rows_score_zero_with_null_rate(self):
        t = _corpus(20)
        out = oov_stats(t, "doc_id", "toks", vocab_k=5).to_pylist()
        for i in (3, 7):  # null row / empty row
            assert out[i]["n_tok"] == 0 and out[i]["n_oov"] == 0
            assert out[i]["oov_rate"] is None

    def test_half_boundary_rounds_away_like_duckdb(self):
        # 1/128 = 0.0078125 — the 6dp half boundary; DuckDB rounds away
        toks = [[0] * 127 + [999]]  # 999 is OOV with vocab_k=1
        t = pa.table({"doc_id": pa.array([0]),
                      "toks": pa.array(toks, pa.list_(pa.int32()))})
        out = oov_stats(t, "doc_id", "toks", vocab_k=1)
        assert out.column("oov_rate").to_pylist() == [0.007813]

    def test_dataset_matches_table(self, ray_session):
        import ray

        t = _corpus(500, seed=3)
        want = oov_stats(t, "doc_id", "toks", vocab_k=8).sort_by("doc_id")
        ds = ray.data.from_arrow(t).repartition(4)
        got = pa.concat_tables(
            [pa.table(b) for b in oov_stats(ds, "doc_id", "toks", vocab_k=8)
             .iter_batches(batch_format="pyarrow")]).sort_by("doc_id")
        assert got.select(want.column_names).combine_chunks().equals(
            want.combine_chunks())

    def test_token_counts_budget_raise(self):
        t = _corpus(200, vocab=100)
        with pytest.raises(ValueError, match="max_vocab_rows"):
            token_counts(t, "toks", max_vocab_rows=5)


def test_char_diversity_matches_oracle_and_counter():
    import duckdb
    import numpy as np
    import pyarrow as pa
    from collections import Counter

    from kamae_ray.stages import CharDiversityTransformer
    from kamae_ray.stages.text import char_diversity_oracle_sql

    rng = np.random.default_rng(3)
    texts = []
    for i in range(300):
        L = int(rng.integers(0, 40))
        texts.append("".join(chr(int(c)) for c in rng.integers(32, 127, L)))
    texts += ["", None, "aaaaab", "héllo wörld", "日本語テキスト", "a" * 5000]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = CharDiversityTransformer(input_col="text", output_col="cd").transform_batch(t)
    # vs per-row Counter reference
    for txt, n, s2, ppm in zip(
        texts, out.column("cd_n_chars").to_pylist(), out.column("cd_s2").to_pylist(),
        out.column("cd_ppm").to_pylist()
    ):
        c = Counter(txt or "")
        en, es2 = sum(c.values()), sum(v * v for v in c.values())
        assert (n, s2) == (en, es2)
        assert ppm == (0 if es2 == 0 else (en * en * 1_000_000) // es2)
    # vs the generated DuckDB oracle
    con = duckdb.connect()
    con.register("docs", t.to_pandas())
    res = con.execute(
        char_diversity_oracle_sql("docs", "doc_id", "text", "cd") + " ORDER BY doc_id"
    ).fetchall()
    assert [r[1:] for r in res] == list(zip(
        out.column("cd_n_chars").to_pylist(), out.column("cd_s2").to_pylist(),
        out.column("cd_ppm").to_pylist(),
    ))


def test_token_trigram_counts_matches_counter(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray
    from collections import Counter

    from kamae_ray.pipelines.token_stats import token_trigram_counts

    rng = np.random.default_rng(13)
    rows = [rng.integers(0, 9, rng.integers(0, 12)).tolist() for _ in range(800)]
    t = pa.table({"toks": pa.array(rows, pa.list_(pa.int64()))})
    exp = Counter()
    for r in rows:
        for i in range(len(r) - 2):
            exp[(r[i], r[i + 1], r[i + 2])] += 1
    out = token_trigram_counts(t, "toks", min_count=2)
    got = {(a, b, c): v for a, b, c, v in zip(
        out.column("tok_a").to_pylist(), out.column("tok_b").to_pylist(),
        out.column("tok_c").to_pylist(), out.column("cnt").to_pylist())}
    assert got == {k: v for k, v in exp.items() if v >= 2}
    # dataset path: same result at any partitioning (trigrams never span rows)
    ds = ray.data.from_arrow(t).repartition(7)
    rows_out = token_trigram_counts(ds, "toks", min_count=2).take_all()
    got_ds = {(r["tok_a"], r["tok_b"], r["tok_c"]): r["cnt"] for r in rows_out}
    assert got_ds == got
    # id-range guard
    big = pa.table({"toks": pa.array([[1 << 20, 1, 2]], pa.list_(pa.int64()))})
    try:
        token_trigram_counts(big, "toks")
        assert False, "expected ValueError"
    except ValueError:
        pass
