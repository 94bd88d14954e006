"""Benchmark decontamination (pipelines/decontam.py): parity with a plain
Python n-gram reference, edge cases (short docs, nulls, whitespace), and
Dataset path == Table path."""

import re

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kamae_ray.pipelines.decontam import benchmark_ngram_set, decontaminate


def _py_ngrams(text, n):
    ws = re.split(r"\s+", text or "")
    return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}


def _py_decontam(corpus, bench_texts, n, min_hits=1):
    bench = set()
    for t in bench_texts:
        bench |= _py_ngrams(t, n)
    out = {}
    for did, t in corpus:
        hits = len(_py_ngrams(t, n) & bench)
        if hits >= min_hits:
            out[did] = hits
    return out


WORDS = ["the", "cat", "sat", "on", "mat", "dog", "ran", ""]


@st.composite
def _doc(draw):
    if draw(st.booleans()) and draw(st.integers(0, 9)) == 0:
        return None
    k = draw(st.integers(0, 8))
    return " ".join(draw(st.sampled_from(WORDS)) for _ in range(k))


@given(
    corpus=st.lists(_doc(), min_size=1, max_size=30),
    bench=st.lists(_doc(), min_size=1, max_size=8),
    n=st.integers(2, 4),
)
@settings(max_examples=60, deadline=None)
def test_decontaminate_matches_python(corpus, bench, n):
    bt = pa.table({"text": pa.array(bench, pa.string())})
    ct = pa.table(
        {"doc_id": pa.array(range(len(corpus)), pa.int64()), "text": pa.array(corpus, pa.string())}
    )
    bs = benchmark_ngram_set(bt, "text", n=n)
    got = decontaminate(ct, bs, "text", "doc_id")
    gmap = dict(zip(got.column("doc_id").to_pylist(), got.column("n_hits").to_pylist()))
    want = _py_decontam(
        [(i, t or "") for i, t in enumerate(corpus)], [t or "" for t in bench], n
    )
    assert gmap == want


def test_keep_clean_is_complement():
    corpus = ["a b c d", "x y z", "a b q", "c d e"]
    ct = pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": pa.array(corpus)})
    bs = benchmark_ngram_set(pa.table({"text": ["a b c", "c d e f"]}), "text", n=3)
    hit = decontaminate(ct, bs, "text", "doc_id")
    clean = decontaminate(ct, bs, "text", "doc_id", keep_clean=True)
    assert sorted(
        hit.column("doc_id").to_pylist() + clean.column("doc_id").to_pylist()
    ) == [0, 1, 2, 3]
    assert set(hit.column("doc_id").to_pylist()) == {0, 3}


def test_min_hits_threshold():
    ct = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                   "text": ["a b c x y z", "a b c only"]})
    bs = benchmark_ngram_set(pa.table({"text": ["a b c", "x y z"]}), "text", n=3)
    out = decontaminate(ct, bs, "text", "doc_id", min_hits=2)
    assert out.column("doc_id").to_pylist() == [0]


def test_dataset_path_matches_table(ray_session):
    import ray

    rng = np.random.default_rng(7)
    corpus = [" ".join(rng.choice(WORDS[:-1], size=rng.integers(1, 12))) for _ in range(400)]
    bench = corpus[::37]
    ct = pa.table({"doc_id": pa.array(range(len(corpus)), pa.int64()),
                   "text": pa.array(corpus)})
    bt = pa.table({"text": pa.array(bench)})
    bs_t = benchmark_ngram_set(bt, "text", n=3)
    bs_d = benchmark_ngram_set(ray.data.from_arrow(bt).repartition(4), "text", n=3)
    assert np.array_equal(bs_t["hashes"], bs_d["hashes"])
    want = decontaminate(ct, bs_t, "text", "doc_id")
    ds = ray.data.from_arrow(ct).repartition(5)
    got = pa.concat_tables(
        [pa.table(b) for b in decontaminate(ds, bs_d, "text", "doc_id").iter_batches(batch_format="pyarrow")]
    ).sort_by("doc_id")
    assert got.equals(want.sort_by("doc_id"))


def _py_dup_stats(corpus, n, min_docs=2):
    grams = {did: _py_ngrams(t, n) for did, t in corpus}
    from collections import Counter

    cnt = Counter(g for gs in grams.values() for g in gs)
    out = {}
    for did, gs in grams.items():
        if not gs:
            continue
        nd = sum(1 for g in gs if cnt[g] >= min_docs)
        out[did] = (len(gs), nd)
    return out


@given(
    corpus=st.lists(_doc(), min_size=1, max_size=40),
    n=st.integers(2, 4),
    min_docs=st.integers(2, 3),
)
@settings(max_examples=40, deadline=None)
def test_duplicate_passage_stats_matches_python(corpus, n, min_docs):
    from kamae_ray.pipelines.decontam import duplicate_passage_stats

    ct = pa.table(
        {"doc_id": pa.array(range(len(corpus)), pa.int64()),
         "text": pa.array(corpus, pa.string())}
    )
    got = duplicate_passage_stats(ct, "text", "doc_id", n=n, min_docs=min_docs)
    gmap = {r["doc_id"]: (r["n_grams"], r["n_dup"]) for r in got.to_pylist()}
    want = _py_dup_stats([(i, t or "") for i, t in enumerate(corpus)], n, min_docs)
    assert gmap == want


def test_duplicate_passage_dataset_matches_table(ray_session):
    import ray

    from kamae_ray.pipelines.decontam import duplicate_passage_stats

    rng = np.random.default_rng(3)
    corpus = [" ".join(rng.choice(WORDS[:-1], size=rng.integers(2, 15))) for _ in range(300)]
    ct = pa.table({"doc_id": pa.array(range(len(corpus)), pa.int64()),
                   "text": pa.array(corpus)})
    want = duplicate_passage_stats(ct, "text", "doc_id", n=3).sort_by("doc_id")
    ds = ray.data.from_arrow(ct).repartition(5)
    got = pa.concat_tables(
        [pa.table(b) for b in duplicate_passage_stats(ds, "text", "doc_id", n=3)
         .iter_batches(batch_format="pyarrow")]
    ).sort_by("doc_id")
    assert got.equals(want)


def test_llm_corpus_prep_chain(ray_session):
    """End-to-end chain: quality -> decontaminate -> dedup -> pack.
    Dataset path == Table path; dedup/filters actually fire."""
    import ray

    from kamae_ray.pipelines.llm_prep import llm_corpus_prep

    rng = np.random.default_rng(5)
    words = ["the", "cat", "sat", "on", "a", "mat", "dog", "ran", "far", "away"]
    def doc(k):
        return " ".join(rng.choice(words, size=k))
    corpus = [doc(40) for _ in range(60)]
    corpus[10] = corpus[5]            # exact duplicate -> dedup drops one
    corpus[20] = "x y z"              # too short -> quality filter
    bench = [corpus[7]]               # contaminates doc 7 (and any sharing a 3-gram)
    ct = pa.table({"doc_id": pa.array(range(len(corpus)), pa.int64()),
                   "text": pa.array(corpus)})
    bt = pa.table({"text": pa.array(bench)})
    want = llm_corpus_prep(ct, bt, min_chars=50, min_stop_ratio=0.0, seq_len=64)
    ids = want.column("doc_id").to_pylist()
    assert 20 not in ids and 7 not in ids
    assert not (5 in ids and 10 in ids)  # dedup kept at most one copy
    # offsets are a proper packing: cumulative and gap-free
    nt = want.column("n_tok").to_pylist()
    off = want.column("tok_offset").to_pylist()
    order = np.argsort(ids)
    run = 0
    for i in order:
        assert off[i] == run
        run += nt[i]
    ds_out = llm_corpus_prep(
        ray.data.from_arrow(ct).repartition(4), ray.data.from_arrow(bt),
        min_chars=50, min_stop_ratio=0.0, seq_len=64,
    )
    got = pa.concat_tables(
        [pa.table(b) for b in ds_out.iter_batches(batch_format="pyarrow")]
    ).sort_by("doc_id")
    assert got.equals(want.sort_by("doc_id"))


def _py_remove_dups(corpus, n, min_docs=2):
    """Plain-Python reference for remove_duplicate_passages."""
    from collections import defaultdict

    split = {did: re.split(r"\s+", t or "") for did, t in corpus}
    docs_of = defaultdict(set)
    for did, ws in split.items():
        for i in range(len(ws) - n + 1):
            docs_of[" ".join(ws[i : i + n])].add(did)
    out = {}
    for did, ws in split.items():
        covered = [False] * len(ws)
        for i in range(len(ws) - n + 1):
            if len(docs_of[" ".join(ws[i : i + n])]) >= min_docs:
                for j in range(i, i + n):
                    covered[j] = True
        kept = [w for w, c in zip(ws, covered) if not c]
        out[did] = (" ".join(kept), sum(covered))
    return out


@given(
    corpus=st.lists(_doc(), min_size=1, max_size=40),
    n=st.integers(2, 4),
    min_docs=st.integers(2, 3),
)
@settings(max_examples=40, deadline=None)
def test_remove_duplicate_passages_matches_python(corpus, n, min_docs):
    from kamae_ray.pipelines.decontam import remove_duplicate_passages

    ct = pa.table(
        {"doc_id": pa.array(range(len(corpus)), pa.int64()),
         "text": pa.array(corpus, pa.string())}
    )
    got = remove_duplicate_passages(ct, "text", "doc_id", n=n, min_docs=min_docs)
    gmap = {r["doc_id"]: (r["clean_text"], r["n_removed"]) for r in got.to_pylist()}
    # null texts DROP (SQL regexp_split_to_array(NULL) unnests to zero rows)
    want = _py_remove_dups(
        [(i, t) for i, t in enumerate(corpus) if t is not None], n, min_docs)
    assert gmap == want


def test_remove_duplicate_passages_dataset_paths(ray_session):
    """Broadcast path == Table path == forced-distributed path."""
    import ray

    from kamae_ray.pipelines.decontam import remove_duplicate_passages

    rng = np.random.default_rng(11)
    corpus = [" ".join(rng.choice(WORDS[:-1], size=rng.integers(2, 20)))
              for _ in range(300)]
    ct = pa.table({"doc_id": pa.array(range(len(corpus)), pa.int64()),
                   "text": pa.array(corpus)})
    want = remove_duplicate_passages(ct, "text", "doc_id", n=3).sort_by("doc_id")
    assert int(pa.compute.sum(want.column("n_removed")).as_py() or 0) > 0
    ds = ray.data.from_arrow(ct).repartition(5)
    for forced in (False, True):
        out = remove_duplicate_passages(ds, "text", "doc_id", n=3,
                                        force_distributed=forced)
        got = pa.concat_tables(
            [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
        ).sort_by("doc_id")
        got = got.select(want.column_names).cast(want.schema)
        assert got.equals(want), f"forced={forced}"


def test_bm25_scores_table_and_dataset(ray_session):
    """BM25: hand-computed formula on a tiny corpus; Table == Dataset path."""
    import math

    import numpy as np
    import ray

    from kamae_ray.pipelines.text_features import bm25_scores

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": ["cat dog cat", "dog dog dog fish", "bird", None],
    })
    out = bm25_scores(t, "doc_id", "text", ["cat", "dog"], k1=1.2, b=0.75)
    # docs 1,2 match; doc 3 (bird) and 4 (null) filtered out
    assert out.column("doc_id").to_pylist() == [1, 2]
    N, sdl = 4, 8  # null text -> dl 0
    avgdl = sdl / N

    def idf(df):
        return math.log(((N - df) + 0.5) / (df + 0.5) + 1.0)

    def term(tf, dl, df):
        tf = float(tf)
        return idf(df) * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))

    exp1 = term(2, 3, 1) + term(1, 3, 2)  # doc1: cat x2, dog x1
    exp2 = term(0, 4, 1) + term(3, 4, 2)  # doc2: dog x3
    got = out.column("bm25").to_pylist()
    assert np.allclose(got, [exp1, exp2], rtol=0, atol=1e-12)
    assert out.column("dl").to_pylist() == [3, 4]
    assert out.column("tf0").to_pylist() == [2, 0]

    ds = ray.data.from_arrow(t).repartition(3)
    dout = bm25_scores(ds, "doc_id", "text", ["cat", "dog"], k1=1.2, b=0.75)
    rows = sorted((r["doc_id"], r["dl"], r["tf0"], r["tf1"], r["bm25"]) for r in dout.take_all())
    trows = sorted(zip(*(out.column(c).to_pylist() for c in ["doc_id", "dl", "tf0", "tf1", "bm25"])))
    assert rows == trows


def test_semantic_decontaminate(ray_session):
    """Embedding-space decontamination: brute-force reference; bench rows
    self-match (cosine 1) and drop; Table == Dataset path."""
    import ray

    from kamae_ray.pipelines.decontam import semantic_decontaminate

    rng = np.random.RandomState(11)
    bench = rng.standard_normal((3, 8))
    rows = [bench[0] + 1e-3 * rng.standard_normal(8)]  # contaminated
    rows += [rng.standard_normal(8) for _ in range(20)]
    rows += [bench[2]]  # exact benchmark copy
    t = pa.table({
        "id": pa.array(np.arange(len(rows), dtype=np.int64)),
        "emb": pa.array([list(map(float, r)) for r in rows], pa.list_(pa.float32())),
    })
    out = semantic_decontaminate(t, bench, "emb", "id", threshold=0.9)
    x = np.asarray([np.asarray(r, np.float32) for r in rows], dtype=np.float64)
    xn = x / np.linalg.norm(x, axis=1)[:, None]
    bn = bench / np.linalg.norm(bench, axis=1)[:, None]
    mx = (xn @ bn.T).max(axis=1)
    expect = [int(i) for i in range(len(rows)) if mx[i] < 0.9]
    assert out.column("id").to_pylist() == expect
    assert 0 not in expect and (len(rows) - 1) not in expect  # both contaminated

    ds = ray.data.from_arrow(t).repartition(4)
    dout = semantic_decontaminate(ds, bench, "emb", "id", threshold=0.9)
    drows = sorted((r["id"], round(r["max_bench_cosine"], 9)) for r in dout.take_all())
    trows = sorted((i, round(c, 9)) for i, c in
                   zip(out.column("id").to_pylist(), out.column("max_bench_cosine").to_pylist()))
    assert drows == trows


def test_word_freq_scores(ray_session):
    """Integer-exact word-frequency quality score: hand-computed ppm on a
    tiny corpus; empty docs drop; Table == Dataset; overflow/vocab guards."""
    import ray

    from kamae_ray.pipelines.text_features import word_freq_scores

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": ["cat cat dog", "dog rare", "", None],
    })
    out = word_freq_scores(t, "doc_id", "text")
    # corpus: cat x2, dog x2, rare x1 -> total 5
    ppm = {"cat": 2 * 1_000_000 // 5, "dog": 2 * 1_000_000 // 5, "rare": 1_000_000 // 5}
    exp = {
        1: (3, 2 * ppm["cat"] + ppm["dog"]),
        2: (2, ppm["dog"] + ppm["rare"]),
    }
    got = {r["doc_id"]: (r["n_words"], r["sum_ppm"], r["freq_score"]) for r in out.to_pylist()}
    assert set(got) == {1, 2}  # empty/null docs drop
    for d, (n, sp) in exp.items():
        assert got[d] == (n, sp, sp / n)

    ds = ray.data.from_arrow(t).repartition(3)
    dout = word_freq_scores(ds, "doc_id", "text")
    drows = sorted((r["doc_id"], r["n_words"], r["sum_ppm"], r["freq_score"])
                   for r in dout.take_all())
    assert drows == sorted((d, *v) for d, v in got.items())

    with pytest.raises(ValueError):
        word_freq_scores(t, "doc_id", "text", max_broadcast_terms=1)
    with pytest.raises(ValueError):
        word_freq_scores(t, "doc_id", "text", multiplier=1 << 62)


def test_bm25_oracle_escapes_quotes():
    """Terms containing single quotes must not break the generated SQL."""
    import duckdb

    from kamae_ray.pipelines.text_features import bm25_oracle_sql, bm25_scores

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": ["o'brien cat", "dog"]})
    out = bm25_scores(t, "doc_id", "text", ["o'brien"])
    con = duckdb.connect()
    con.register("docs", t)
    o = con.sql(bm25_oracle_sql("docs", "doc_id", "text", ["o'brien"])).arrow()
    assert out.column("doc_id").to_pylist() == o.column("doc_id").to_pylist() == [1]
    rounded = pa.compute.round(out.column("bm25"), ndigits=6,
                               round_mode="half_towards_infinity")
    assert rounded.to_pylist() == o.column("bm25").to_pylist()


@settings(max_examples=25, deadline=None)
@given(st.lists(
    st.one_of(st.none(),
              st.lists(st.sampled_from(["cat", "dog", "fish", "o'x", "zz"]),
                       min_size=0, max_size=6).map(" ".join)),
    min_size=1, max_size=12).filter(
        lambda docs: any(d and d.strip() for d in docs)))
def test_word_freq_scores_property_vs_duckdb(docs):
    """word_freq_scores == the SQL oracle formula on arbitrary tiny corpora
    (nulls, empties, quotes)."""
    import duckdb

    from kamae_ray.pipelines.text_features import word_freq_scores

    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    out = word_freq_scores(t, "doc_id", "text").sort_by("doc_id")
    con = duckdb.connect()
    con.register("documents", t)
    o = con.sql(r"""
      WITH w AS (SELECT doc_id, unnest(list_filter(string_split_regex(coalesce(text,''),'\s+'),
                 x -> length(x)>0)) AS word FROM documents),
      v AS (SELECT word, COUNT(*)::BIGINT AS c FROM w GROUP BY word),
      tt AS (SELECT SUM(c)::BIGINT AS total FROM v),
      s AS (SELECT w.doc_id, COUNT(*)::BIGINT AS n_words,
            SUM((v.c * 1000000) // tt.total)::BIGINT AS sum_ppm
            FROM w JOIN v USING (word), tt GROUP BY w.doc_id)
      SELECT doc_id, n_words, sum_ppm,
             CAST(sum_ppm AS DOUBLE) / CAST(n_words AS DOUBLE) AS freq_score
      FROM s ORDER BY doc_id""").arrow()
    assert out.to_pylist() == o.to_pylist()


@settings(max_examples=25, deadline=None)
@given(st.lists(
    st.one_of(st.none(),
              st.lists(st.sampled_from(["cat", "dog", "fish", "bird"]),
                       min_size=0, max_size=6).map(" ".join)),
    min_size=1, max_size=10))
def test_bm25_property_vs_duckdb(docs):
    """bm25_scores == its generated oracle on arbitrary tiny corpora."""
    import duckdb

    import pyarrow.compute as _pc
    from kamae_ray.pipelines.text_features import bm25_oracle_sql, bm25_scores

    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    out = bm25_scores(t, "doc_id", "text", ["cat", "dog"]).sort_by("doc_id")
    out = out.set_column(out.column_names.index("bm25"), "bm25",
                         _pc.round(out.column("bm25"), ndigits=6,
                                   round_mode="half_towards_infinity"))
    con = duckdb.connect()
    con.register("documents", t)
    o = con.sql(bm25_oracle_sql("documents", "doc_id", "text", ["cat", "dog"])
                ).arrow().sort_by("doc_id")
    assert out.to_pylist() == o.to_pylist()


def test_novelty_scores_exact(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from kamae_ray.pipelines.decontam import benchmark_ngram_set, novelty_scores

    bench = pa.table({"doc_id": [0], "text": ["the cat sat on the mat"]})
    corpus = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "the cat sat on a rug",          # shares 'the cat sat' + 'cat sat on'
            "dogs bark loudly at night",     # all novel
            "one two",                       # < 3 words -> no grams
            None,                            # null text -> no grams
        ],
    })
    bset = benchmark_ngram_set(bench, "text", n=3)
    out = novelty_scores(corpus, bset, "text", "doc_id").sort_by("doc_id")
    rows = out.to_pylist()
    assert rows[0]["n_grams"] == 4 and rows[0]["n_hits"] == 2
    assert rows[0]["novelty_ppm"] == 2 * 1_000_000 // 4
    assert rows[1]["n_hits"] == 0 and rows[1]["novelty_ppm"] == 1_000_000
    assert rows[2]["n_grams"] == 0 and rows[2]["novelty_ppm"] is None
    assert rows[3]["n_grams"] == 0 and rows[3]["novelty_ppm"] is None
    # Dataset path identical
    d = novelty_scores(ray.data.from_arrow(corpus), bset, "text", "doc_id")
    dt = pa.concat_tables([pa.table(b) for b in d.iter_batches(batch_format="pyarrow")])
    assert dt.sort_by("doc_id").equals(out)
    assert isinstance(np.int64(1), np.int64)
