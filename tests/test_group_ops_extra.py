"""topk_per_group / quantile_per_group / stratified_sample / tfidf_top_terms
— randomized parity vs DuckDB on both the pa.Table path and the Dataset path.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from kamae_ray.pipelines.text_features import tfidf_top_terms
from kamae_ray.stages.aggregate import quantile_per_group, topk_per_group
from kamae_ray.stages.hashing import stratified_sample


def _rand_table(n=5000, seed=7, with_nulls=False):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, 200, n)
    vals = np.round(rng.normal(100.0, 25.0, n), 3)
    tie = np.arange(n, dtype=np.int64)
    v = pa.array(vals)
    if with_nulls:
        mask = rng.random(n) < 0.1
        v = pa.array(np.where(mask, np.nan, vals))
        v = pc.if_else(pa.array(~mask), v, pa.nulls(n, pa.float64()))
    return pa.table({"k": pa.array(keys, pa.int64()), "v": v, "tie": pa.array(tie)})


def _canon(tbl: pa.Table) -> list:
    t = tbl.combine_chunks()
    t = t.select(sorted(t.column_names))
    idx = pc.sort_indices(t, sort_keys=[(c, "ascending") for c in t.column_names])
    return t.take(idx).to_pylist()


def test_topk_per_group_matches_duckdb():
    t = _rand_table()
    out = topk_per_group(t, "k", "v", 3, descending=True, tiebreak=["tie"])
    sql = (
        "SELECT k, v, tie FROM (SELECT *, ROW_NUMBER() OVER "
        "(PARTITION BY k ORDER BY v DESC, tie) rn FROM t) WHERE rn <= 3"
    )
    oracle = duckdb.query(sql).arrow()
    assert _canon(out) == _canon(oracle)


def test_topk_ascending_and_k_bigger_than_group():
    t = _rand_table(n=300, seed=3)
    out = topk_per_group(t, "k", "v", 50, descending=False, tiebreak=["tie"])
    sql = (
        "SELECT k, v, tie FROM (SELECT *, ROW_NUMBER() OVER "
        "(PARTITION BY k ORDER BY v ASC, tie) rn FROM t) WHERE rn <= 50"
    )
    oracle = duckdb.query(sql).arrow()
    assert _canon(out) == _canon(oracle)


def test_topk_nulls_sort_last():
    t = pa.table({"k": [1, 1, 1, 2], "v": [None, 5.0, 3.0, None], "tie": [0, 1, 2, 3]})
    out = topk_per_group(t, "k", "v", 2, descending=True, tiebreak=["tie"])
    rows = _canon(out)
    # group 1 keeps the two non-null values; group 2 keeps its only (null) row
    assert rows == _canon(
        pa.table({"k": [1, 1, 2], "v": [5.0, 3.0, None], "tie": [1, 2, 3]})
    )


def test_topk_dataset_path(ray_session):
    import ray

    t = _rand_table(n=4000, seed=11)
    ds = ray.data.from_arrow(t).repartition(7)
    out = pa.concat_tables(
        ray.get(topk_per_group(ds, "k", "v", 4, tiebreak=["tie"]).to_arrow_refs())
    )
    expected = topk_per_group(t, "k", "v", 4, tiebreak=["tie"])
    assert _canon(out) == _canon(expected)


def test_quantile_per_group_matches_duckdb():
    t = _rand_table(n=4000, seed=5, with_nulls=True)
    out = quantile_per_group(t, "k", "v", [0.25, 0.5, 0.9])
    sql = (
        "SELECT k, quantile_cont(v, 0.25) AS v_p25, quantile_cont(v, 0.5) AS v_p50, "
        "quantile_cont(v, 0.9) AS v_p90 FROM t GROUP BY k"
    )
    oracle = duckdb.query(sql).arrow()
    eng = {r["k"]: r for r in out.to_pylist()}
    for r in oracle.to_pylist():
        e = eng[r["k"]]
        for c in ("v_p25", "v_p50", "v_p90"):
            if r[c] is None:
                assert np.isnan(e[c])
            else:
                assert e[c] == pytest.approx(r[c], abs=1e-9)


def test_quantile_all_null_group_is_nan():
    t = pa.table({"k": [1, 1, 2], "v": pa.array([None, None, 4.0], pa.float64())})
    out = quantile_per_group(t, "k", "v", [0.5])
    got = {r["k"]: r["v_p50"] for r in out.to_pylist()}
    assert np.isnan(got[1]) and got[2] == 4.0


def test_quantile_dataset_path(ray_session):
    import ray

    t = _rand_table(n=3000, seed=13)
    ds = ray.data.from_arrow(t).repartition(5)
    out = pa.concat_tables(
        ray.get(quantile_per_group(ds, "k", "v", [0.5, 0.75]).to_arrow_refs())
    )
    expected = quantile_per_group(t, "k", "v", [0.5, 0.75])
    eng = {r["k"]: r for r in out.to_pylist()}
    for r in expected.to_pylist():
        for c in ("v_p50", "v_p75"):
            assert eng[r["k"]][c] == pytest.approx(r[c], abs=1e-12)


# ---------------------------------------------------------------------------
# stratified_sample
# ---------------------------------------------------------------------------


def _strata_table(n=20000, seed=17):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "uid": pa.array(rng.integers(0, 1_000_000, n), pa.int64()),
            "label": pa.array(rng.choice(["pos", "neg", "other"], n, p=[0.1, 0.8, 0.1])),
        }
    )


def test_stratified_sample_fractions_and_determinism():
    t = _strata_table()
    fr = {"pos": 1.0, "neg": 0.125}
    out1 = stratified_sample(t, "uid", "label", fr, default_fraction=0.5, salt=3)
    out2 = stratified_sample(t, "uid", "label", fr, default_fraction=0.5, salt=3)
    assert out1.equals(out2)
    lab = out1.column("label").to_pylist()
    n_pos_in = pc.sum(pc.equal(t.column("label"), "pos")).as_py()
    assert lab.count("pos") == n_pos_in  # fraction >= 1 keeps everything
    n_neg_in = pc.sum(pc.equal(t.column("label"), "neg")).as_py()
    assert 0.09 < lab.count("neg") / n_neg_in < 0.16
    n_oth_in = pc.sum(pc.equal(t.column("label"), "other")).as_py()
    assert 0.42 < lab.count("other") / n_oth_in < 0.58


def test_stratified_sample_key_consistent_within_stratum():
    # repeated (key, stratum) rows stay or go together
    t = pa.table(
        {
            "uid": pa.array([5, 5, 5, 9, 9] * 200, pa.int64()),
            "label": pa.array(["a"] * 1000),
        }
    )
    out = stratified_sample(t, "uid", "label", {"a": 0.5}, salt=1)
    kept = set(out.column("uid").to_pylist())
    for k in kept:
        assert out.filter(pc.equal(out.column("uid"), k)).num_rows in (400, 600)


def test_stratified_sample_null_key_dropped_and_null_stratum_default():
    t = pa.table(
        {
            "uid": pa.array([None, 2, 3], pa.int64()),
            "label": pa.array(["a", None, "a"]),
        }
    )
    out = stratified_sample(t, "uid", "label", {"a": 1.0}, default_fraction=0.0)
    assert out.column("uid").to_pylist() == [3]  # null key dropped, null stratum -> default 0


def test_stratified_sample_string_keys_and_dataset_path(ray_session):
    import ray

    rng = np.random.default_rng(23)
    t = pa.table(
        {
            "uid": pa.array([f"user_{i}" for i in rng.integers(0, 100000, 8000)]),
            "label": pa.array(rng.choice(["x", "y"], 8000)),
        }
    )
    expected = stratified_sample(t, "uid", "label", {"x": 0.3}, default_fraction=0.7, salt=9)
    ds = ray.data.from_arrow(t).repartition(6)
    out = pa.concat_tables(
        ray.get(
            stratified_sample(ds, "uid", "label", {"x": 0.3}, default_fraction=0.7, salt=9)
            .to_arrow_refs()
        )
    )
    assert _canon(out) == _canon(expected)


# ---------------------------------------------------------------------------
# tfidf
# ---------------------------------------------------------------------------

_TFIDF_SQL = """
WITH words AS (
  SELECT doc_id, w AS term FROM (
    SELECT doc_id, unnest(regexp_split_to_array(coalesce(text,''), '\\s+')) AS w FROM t
  ) WHERE w <> ''
),
tf AS (SELECT doc_id, term, COUNT(*)::BIGINT AS tf FROM words GROUP BY 1, 2),
df AS (SELECT term, COUNT(*)::BIGINT AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         tf.tf * (ln(({n} + 1.0) / (df.df + 1.0)) + 1.0) AS tfidf
  FROM tf JOIN df USING (term)
)
SELECT doc_id, term, tf, df, tfidf FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) rn
  FROM scored
) WHERE rn <= {k}
"""


def _docs_table(n=400, seed=29):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(60)]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(0, 30)).tolist()) for _ in range(n)
    ]
    texts[0] = ""
    texts[1] = "   "
    return pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)), "text": texts})


def test_tfidf_matches_duckdb_table_path():
    t = _docs_table()
    out = tfidf_top_terms(t, "doc_id", "text", k=4)
    oracle = duckdb.query(_TFIDF_SQL.format(n=t.num_rows, k=4)).arrow()
    eng = sorted(out.to_pylist(), key=lambda r: (r["doc_id"], r["term"]))
    ora = sorted(oracle.to_pylist(), key=lambda r: (r["doc_id"], r["term"]))
    assert len(eng) == len(ora)
    for a, b in zip(eng, ora):
        assert (a["doc_id"], a["term"], a["tf"], a["df"]) == (
            b["doc_id"],
            b["term"],
            b["tf"],
            b["df"],
        )
        assert a["tfidf"] == pytest.approx(b["tfidf"], abs=1e-9)


def test_tfidf_dataset_broadcast_vs_shuffle(ray_session):
    import ray

    t = _docs_table(n=300, seed=31)
    expected = _canon(tfidf_top_terms(t, "doc_id", "text", k=3))
    for strategy in ("broadcast", "shuffle"):
        ds = ray.data.from_arrow(t).repartition(5)
        got = pa.concat_tables(
            ray.get(
                tfidf_top_terms(ds, "doc_id", "text", k=3, join_strategy=strategy)
                .to_arrow_refs()
            )
        )
        assert _canon(got) == expected, strategy


def test_tfidf_broadcast_vocab_guard(ray_session):
    import ray

    t = _docs_table(n=100, seed=37)
    ds = ray.data.from_arrow(t)
    with pytest.raises(ValueError, match="max_broadcast_terms"):
        tfidf_top_terms(ds, "doc_id", "text", k=3, max_broadcast_terms=5).count()


# ---------------------------------------------------------------------------
# deterministic_sample / group_sample
# ---------------------------------------------------------------------------


def test_deterministic_sample_is_min_hash_set():
    from kamae_ray.stages.hashing import _split_hash, deterministic_sample

    t = _strata_table(n=5000, seed=41)
    out = deterministic_sample(t, "uid", 100, salt=7)
    assert out.num_rows == 100
    h_all, _ = _split_hash(t.column("uid").combine_chunks(), 7)
    h_out, _ = _split_hash(out.column("uid").combine_chunks(), 7)
    assert set(np.sort(h_all)[:100]) == set(h_out)
    # deterministic across calls
    assert _canon(deterministic_sample(t, "uid", 100, salt=7)) == _canon(out)


def test_deterministic_sample_dataset_matches_table(ray_session):
    import ray

    from kamae_ray.stages.hashing import deterministic_sample

    t = _strata_table(n=8000, seed=43)
    expected = _canon(deterministic_sample(t, "uid", 250, salt=1))
    ds = ray.data.from_arrow(t).repartition(7)
    got = pa.concat_tables(
        ray.get(deterministic_sample(ds, "uid", 250, salt=1).to_arrow_refs())
    )
    assert _canon(got) == expected


def test_deterministic_sample_null_keys_dropped():
    from kamae_ray.stages.hashing import deterministic_sample

    t = pa.table({"uid": pa.array([1, None, 2], pa.int64())})
    out = deterministic_sample(t, "uid", 10)
    assert sorted(out.column("uid").to_pylist()) == [1, 2]


def test_group_sample_k_per_group(ray_session):
    import ray

    from kamae_ray.stages.hashing import group_sample

    t = _strata_table(n=6000, seed=47)
    out = group_sample(t, "label", "uid", 50, salt=9)
    import collections

    counts = collections.Counter(out.column("label").to_pylist())
    for lbl, c in counts.items():
        assert c == 50, (lbl, c)
    ds = ray.data.from_arrow(t).repartition(5)
    refs = ray.get(group_sample(ds, "label", "uid", 50, salt=9).to_arrow_refs())
    got = pa.concat_tables([r for r in refs if r.num_rows])  # Ray emits schema-less empties
    assert _canon(got) == _canon(out)


# ---------------------------------------------------------------------------
# distinct
# ---------------------------------------------------------------------------


def test_distinct_matches_duckdb():
    from kamae_ray.stages.aggregate import distinct

    rng = np.random.default_rng(53)
    t = pa.table({
        "a": pa.array([None if i % 17 == 0 else int(v) for i, v in enumerate(rng.integers(0, 12, 3000))], pa.int64()),
        "b": pa.array(rng.choice(["x", "y", "z"], 3000)),
        "c": pa.array(rng.standard_normal(3000)),  # projected away
    })
    out = distinct(t, ["a", "b"])
    oracle = duckdb.query("SELECT DISTINCT a, b FROM t").arrow()
    assert _canon(out) == _canon(oracle)


def test_distinct_dataset_path(ray_session):
    import ray

    from kamae_ray.stages.aggregate import distinct

    rng = np.random.default_rng(59)
    t = pa.table({
        "a": pa.array(rng.integers(0, 40, 8000)),
        "b": pa.array(rng.choice(["p", "q"], 8000)),
    })
    expected = _canon(distinct(t, ["a", "b"]))
    ds = ray.data.from_arrow(t).repartition(7)
    refs = ray.get(distinct(ds, ["a", "b"]).to_arrow_refs())
    got = pa.concat_tables([r for r in refs if r.num_rows])
    assert _canon(got) == expected


def test_groupby_count_distinct_matches_duckdb(ray_session):
    import ray

    from kamae_ray.stages.aggregate import groupby_count_distinct

    rng = np.random.default_rng(61)
    t = pa.table({
        "k": pa.array(rng.integers(0, 30, 6000)),
        "v": pa.array([None if i % 13 == 0 else int(x) for i, x in enumerate(rng.integers(0, 25, 6000))], pa.int64()),
    })
    out = groupby_count_distinct(t, "k", "v")
    oracle = duckdb.query(
        "SELECT k, COUNT(DISTINCT v)::BIGINT AS v_count_distinct FROM t GROUP BY k"
    ).arrow()
    assert _canon(out) == _canon(oracle)
    ds = ray.data.from_arrow(t).repartition(7)
    refs = ray.get(groupby_count_distinct(ds, "k", "v").to_arrow_refs())
    got = pa.concat_tables([r for r in refs if r.num_rows])
    assert _canon(got) == _canon(oracle)


def test_groupby_count_distinct_all_null_group():
    from kamae_ray.stages.aggregate import groupby_count_distinct

    t = pa.table({"k": [1, 1, 2], "v": pa.array([None, None, 5], pa.int64())})
    out = {r["k"]: r["v_count_distinct"] for r in groupby_count_distinct(t, "k", "v").to_pylist()}
    assert out == {1: 0, 2: 1}


def test_l2_normalize_unit_norms(ray_session):
    import ray

    from kamae_ray.stages.similarity import L2NormalizeTransformer

    t = pa.table({"e": pa.array([[3.0, 4.0], [0.0, 0.0], [1.0, 0.0]], pa.list_(pa.float64()))})
    out = L2NormalizeTransformer(input_col="e", output_col="u").transform(t)
    u = out.column("u").to_pylist()
    assert u[0] == pytest.approx([0.6, 0.8])
    assert u[1] == [0.0, 0.0]  # zero vector stays zero
    assert u[2] == [1.0, 0.0]
    ds = ray.data.from_arrow(t)
    got = pa.concat_tables([b for b in ray.get(
        L2NormalizeTransformer(input_col="e", output_col="u").transform(ds).to_arrow_refs()
    ) if b.num_rows])
    assert got.column("u").to_pylist() == u


def test_groupby_collect_vs_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray

    from kamae_ray.stages import groupby_collect

    rng = np.random.RandomState(7)
    n = 600
    t = pa.table({
        "g": pa.array([int(rng.randint(12)) for _ in range(n)], pa.int64()),
        "o": pa.array(list(rng.permutation(n)), pa.int64()),  # unique order key
        "v": pa.array([None if rng.rand() < 0.1 else float(x) for x in rng.standard_normal(n)], pa.float64()),
    })
    got = (
        groupby_collect(ray.data.from_arrow(t).repartition(5), "g", "v", order_col="o", out_col="vs")
        .take_all()
    )
    got = {r["g"]: [None if x is None or (isinstance(x, float) and np.isnan(x)) else round(x, 9) for x in r["vs"]] for r in got}
    odf = duckdb.sql("SELECT g, list(v ORDER BY o) vs FROM t GROUP BY g").df()
    for _, row in odf.iterrows():
        exp = [None if x is None or (isinstance(x, float) and np.isnan(x)) else round(float(x), 9) for x in row["vs"].tolist()]
        assert got[row["g"]] == exp, row["g"]


def test_winsorize_estimator_clips_to_quantiles():
    import duckdb
    import numpy as np
    import pyarrow as pa

    from kamae_ray.stages import WinsorizeEstimator

    rng = np.random.RandomState(1)
    x = np.concatenate([rng.standard_normal(1000), [100.0, -100.0]])
    t = pa.table({"x": x})
    m = WinsorizeEstimator(input_col="x", lower_q=0.05, upper_q=0.95,
                           boundary_decimals=6, output_col="y").fit(t)
    lo, hi = duckdb.sql(
        "SELECT ROUND(quantile_cont(x, 0.05)::DOUBLE, 6), ROUND(quantile_cont(x, 0.95)::DOUBLE, 6) FROM t"
    ).fetchone()
    assert abs(m.min_value - lo) < 1e-9 and abs(m.max_value - hi) < 1e-9
    y = m.transform_batch(t).column("y").to_numpy()
    assert y.min() >= lo - 1e-9 and y.max() <= hi + 1e-9
    inside = (x >= lo) & (x <= hi)
    assert np.allclose(y[inside], x[inside])


def test_clip_transformer_null_and_one_sided():
    import pyarrow as pa

    from kamae_ray.stages import ClipTransformer

    t = pa.table({"x": pa.array([None, -5.0, 5.0], pa.float64())})
    got = ClipTransformer(input_col="x", min_value=0.0, output_col="y").transform_batch(t)
    assert got.column("y").to_pylist() == [None, 0.0, 5.0]


def test_inverted_index_matches_duckdb(ray_session):
    import duckdb
    import ray

    from kamae_ray.pipelines.text_features import inverted_index

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": ["the cat sat", "the dog  ran", "cat cat dog", None],
    })
    got = inverted_index(docs, "doc_id", "text", min_df=2).to_pandas()
    got = got.sort_values("term").reset_index(drop=True)
    con = duckdb.connect()
    con.register("docs", docs)
    exp = con.execute(r"""
        WITH words AS (SELECT doc_id, w AS term FROM (SELECT doc_id,
          unnest(regexp_split_to_array(coalesce(text,''), '\s+')) AS w FROM docs)
          WHERE w <> ''),
        tf AS (SELECT doc_id, term, COUNT(*)::BIGINT AS tf FROM words GROUP BY 1,2)
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(tf) AS BIGINT) AS cf,
               list(doc_id ORDER BY doc_id) AS postings
        FROM tf GROUP BY term HAVING COUNT(*) >= 2 ORDER BY term
    """).fetchdf()
    assert got["term"].tolist() == exp["term"].tolist()
    assert got["df"].tolist() == exp["df"].astype(int).tolist()
    assert got["cf"].tolist() == exp["cf"].astype(int).tolist()
    assert [list(p) for p in got["postings"]] == [list(p) for p in exp["postings"]]
    # Dataset path agrees with the Table path
    ds_out = inverted_index(ray.data.from_arrow(docs).repartition(3),
                            "doc_id", "text", min_df=2)
    rows = sorted((r["term"], r["df"], r["cf"], tuple(r["postings"]))
                  for r in ds_out.take_all())
    want = sorted(zip(got["term"], got["df"], got["cf"],
                      (tuple(p) for p in got["postings"])))
    assert rows == want


def test_groupby_skew_kurt(ray_session):
    import duckdb
    import ray

    from kamae_ray.stages.aggregate import groupby_skew_kurt

    rng = np.random.RandomState(3)
    n = 5000
    t = pa.table({
        "k": pa.array(rng.randint(0, 4, n), pa.int64()),
        "v": pa.array(np.where(rng.rand(n) < 0.05, None,
                               rng.randint(-40, 200, n)).tolist(), pa.int64()),
    })
    # zero-variance group
    t = pa.concat_tables([t, pa.table({"k": pa.array([9, 9, 9], pa.int64()),
                                       "v": pa.array([7, 7, 7], pa.int64())})])
    got = groupby_skew_kurt(t, "k", "v").to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute("""
        WITH s AS (SELECT k, COUNT(v)::HUGEINT AS n, SUM(v)::HUGEINT s1,
          SUM(v*v)::HUGEINT s2, SUM(v*v*v)::HUGEINT s3, SUM(v*v*v*v)::HUGEINT s4
          FROM t WHERE v IS NOT NULL GROUP BY k),
        f AS (SELECT k, CAST(n AS BIGINT) n, (n*s2 - s1*s1) B,
          (n*n*s3 - 3*n*s1*s2 + 2*s1*s1*s1) A,
          (n*n*n*s4 - 4*n*n*s1*s3 + 6*n*s1*s1*s2 - 3*s1*s1*s1*s1) C FROM s)
        SELECT k, n,
          CASE WHEN B <= 0 THEN NULL ELSE CAST(A AS DOUBLE) /
            (CAST(B AS DOUBLE) * sqrt(CAST(B AS DOUBLE))) END AS skew_pop,
          CASE WHEN B <= 0 THEN NULL ELSE CAST(C AS DOUBLE) /
            (CAST(B AS DOUBLE) * CAST(B AS DOUBLE)) - 3.0 END AS kurt_excess
        FROM f ORDER BY k
    """).fetchdf()
    # BIT-identical floats (exact-integer construction), nulls where B=0
    assert got["k"].tolist() == exp["k"].tolist()
    assert got["n"].tolist() == exp["n"].astype(int).tolist()
    for c in ("skew_pop", "kurt_excess"):
        g, x = got[c].to_numpy(), exp[c].to_numpy()
        assert ((g == x) | (np.isnan(g) & np.isnan(x))).all()
    assert np.isnan(got.loc[got["k"] == 9, "skew_pop"].iloc[0])
    # Dataset path agrees with the Table path
    dgot = groupby_skew_kurt(ray.data.from_arrow(t).repartition(5), "k", "v").to_pandas()
    assert dgot.equals(got)
    # sanity vs numpy population moments
    sub = t.to_pandas().dropna()
    v0 = sub[sub.k == 0]["v"].to_numpy(dtype=float)
    m = v0.mean()
    ref_skew = ((v0 - m) ** 3).mean() / (v0.var() ** 1.5)
    assert abs(got.loc[got["k"] == 0, "skew_pop"].iloc[0] - ref_skew) < 1e-9
    # guards: magnitude overflow + budget raise
    big = pa.table({"k": pa.array([1] * 10, pa.int64()),
                    "v": pa.array([10**5] * 10, pa.int64())})
    with pytest.raises(ValueError):
        groupby_skew_kurt(big, "k", "v")
    with pytest.raises(ValueError):
        groupby_skew_kurt(t, "k", "v", max_partial_rows=1)


def test_lm_bigram_scores(ray_session):
    import duckdb
    import ray

    from kamae_ray.pipelines.text_features import lm_bigram_scores

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": ["the cat sat on the mat", "the cat ran", "zz yy xx",
                 "one", None],  # <2-word docs emit no row
    })
    got = lm_bigram_scores(docs, "doc_id", "text").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("docs", docs)
    exp = con.execute(r"""
        WITH words AS (SELECT doc_id, list_filter(string_split_regex(
          coalesce(text,''), '\s+'), x -> length(x) > 0) AS ws FROM docs),
        bg AS (SELECT doc_id, ws[g.i] AS w1, ws[g.i+1] AS w2
          FROM words, LATERAL (SELECT unnest(range(1, len(ws))) AS i) g),
        p AS (SELECT w1, w2, COUNT(*)::BIGINT c2 FROM bg GROUP BY 1,2),
        m AS (SELECT w1, CAST(SUM(c2) AS BIGINT) c1 FROM p GROUP BY 1)
        SELECT bg.doc_id, CAST(COUNT(*) AS BIGINT) n_bigrams,
               CAST(SUM((p.c2 * 1000000) // m.c1) AS BIGINT) sum_ppm
        FROM bg JOIN p USING (w1, w2) JOIN m USING (w1)
        GROUP BY bg.doc_id ORDER BY doc_id
    """).fetchdf()
    assert got["doc_id"].tolist() == exp["doc_id"].astype(int).tolist() == [1, 2, 3]
    assert got["n_bigrams"].tolist() == exp["n_bigrams"].astype(int).tolist()
    assert got["sum_ppm"].tolist() == exp["sum_ppm"].astype(int).tolist()
    # Dataset path agrees
    dgot = lm_bigram_scores(ray.data.from_arrow(docs).repartition(3),
                            "doc_id", "text").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert dgot.equals(got)


def test_global_percent_rank(ray_session):
    import ray

    from kamae_ray.stages.aggregate import global_percent_rank

    rng = np.random.RandomState(2)
    n = 1000
    t = pa.table({"v": pa.array(rng.randint(0, 50, n), pa.int64()),
                  "id": pa.array(rng.permutation(n), pa.int64())})
    got = global_percent_rank(t, "v", "id").to_pandas().sort_values("id")
    # reference: argsort over (v, id)
    df = t.to_pandas()
    order = np.lexsort((df["id"].to_numpy(), df["v"].to_numpy()))
    rank = np.empty(n, np.int64)
    rank[order] = np.arange(n)
    ref = df.assign(rank=rank).sort_values("id")
    assert got["rank"].tolist() == ref["rank"].tolist()
    assert np.allclose(got["percent_rank"].to_numpy(),
                       ref["rank"].to_numpy() / (n - 1), atol=0)
    # Dataset path agrees
    dgot = global_percent_rank(ray.data.from_arrow(t).repartition(7), "v", "id") \
        .to_pandas().sort_values("id")
    assert dgot["rank"].tolist() == ref["rank"].tolist()
    # single row -> 0.0; guards raise
    one = global_percent_rank(pa.table({"v": pa.array([5], pa.int64()),
                                        "id": pa.array([0], pa.int64())}), "v", "id")
    assert one.column("percent_rank").to_pylist() == [0.0]
    with pytest.raises(ValueError):
        global_percent_rank(pa.table({"v": pa.array([-1], pa.int64()),
                                      "id": pa.array([0], pa.int64())}), "v", "id")


def test_rrf_fuse(ray_session):
    import pyarrow as pa
    import ray

    from kamae_ray.pipelines.text_features import rrf_fuse

    # two sources over one group: item 10 is rank 1 in both
    t = pa.table({
        "g": ["x"] * 5,
        "item": [10, 11, 12, 10, 12],
        "r": [1, 2, 3, 1, 2],
    })
    out = rrf_fuse(t, "g", "item", "r", k0=60, scale=1_000_000)
    rows = {r["item"]: (r["rrf_score"], r["n_sources"])
            for r in out.to_pylist()}
    c = lambda r: 1_000_000 // (60 + r)  # noqa: E731
    assert rows == {10: (2 * c(1), 2), 11: (c(2), 1), 12: (c(3) + c(2), 2)}
    # dataset path identical
    ds = ray.data.from_arrow(t).repartition(2)
    got = {r["item"]: (r["rrf_score"], r["n_sources"])
           for r in rrf_fuse(ds, "g", "item", "r").take_all()}
    assert got == rows
    # 0-based rank rejected
    import pytest
    with pytest.raises(ValueError):
        rrf_fuse(pa.table({"g": ["x"], "item": [1], "r": [0]}), "g", "item", "r")


def test_weighted_quantile_per_group(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from kamae_ray.stages.aggregate import weighted_quantile_per_group

    # hand case: group a values 1,2,3 weights 1,1,2 -> tot 4, median at
    # cum>=2 -> v=2; group b has a tie run (2,2) whose peers fold together
    t = pa.table({
        "g": ["a", "a", "a", "b", "b", "b"],
        "v": [1.0, 2.0, 3.0, 2.0, 2.0, 9.0],
        "w": [1, 1, 2, 1, 1, 6],
    })
    out = weighted_quantile_per_group(t, "g", "v", "w", q_ppm=500_000)
    got = {r["g"]: (r["v_wq"], r["w_total"]) for r in out.to_pylist()}
    assert got == {"a": (2.0, 4), "b": (9.0, 8)}
    # b: cum at v=2 run end = 2; 1e6*2 >= 5e5*8 -> 2>=4 false -> v=9
    # naive reference sweep incl. zero weights and p90
    rng = np.random.default_rng(3)
    g = rng.choice(["x", "y", "z"], 500).tolist()
    v = rng.integers(0, 40, 500).astype(float)
    w = rng.integers(0, 5, 500)
    tt = pa.table({"g": g, "v": v, "w": w})
    for q in (250_000, 500_000, 900_000):
        res = {r["g"]: r["v_wq"] for r in
               weighted_quantile_per_group(tt, "g", "v", "w", q_ppm=q).to_pylist()}
        for grp in ("x", "y", "z"):
            vals = sorted((vv, ww) for vv, ww, gg in zip(v, w, g) if gg == grp)
            tw = sum(ww for _, ww in vals)
            cum = 0
            byval = {}
            for vv, ww in vals:
                cum += ww
                byval[vv] = cum  # last write per value = peer-inclusive cum
            exp = min(vv for vv, cw in byval.items() if 1_000_000 * cw >= q * tw)
            assert res[grp] == exp, (grp, q)
    # dataset path identical; type-preserving gather (int values stay int)
    ti = pa.table({"g": ["a", "a"], "v": [5, 7], "w": [1, 3]})
    oi = weighted_quantile_per_group(ti, "g", "v", "w")
    assert oi.column("v_wq").type == pa.int64() and oi.column("v_wq").to_pylist() == [7]
    ds = ray.data.from_arrow(tt).repartition(3)
    got_ds = {r["g"]: r["v_wq"] for r in
              weighted_quantile_per_group(ds, "g", "v", "w").take_all()}
    got_t = {r["g"]: r["v_wq"] for r in
             weighted_quantile_per_group(tt, "g", "v", "w").to_pylist()}
    assert got_ds == got_t


def test_benford_test(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from kamae_ray.functions import arrays as A
    from kamae_ray.stages.profile import benford_test

    rng = np.random.default_rng(5)
    # log-uniform values follow Benford closely; group y is uniform (bad fit)
    va = np.floor(10 ** rng.uniform(0, 6, 3000)).astype(np.int64) + 1
    vb = rng.integers(1, 1000, 1000)
    t = pa.table({"g": ["a"] * 3000 + ["b"] * 1000,
                  "v": np.concatenate([va, vb])})
    out = benford_test(t, "g", "v")
    rows = {r["g"]: r for r in out.to_pylist()}
    # counts: exact first-digit tallies
    for grp, vals in (("a", va), ("b", vb)):
        digs = np.array([int(str(x)[0]) for x in vals])
        for d in range(1, 10):
            assert rows[grp][f"d{d}"] == int((digs == d).sum())
        assert rows[grp]["n"] == len(vals)
        # chi2 vs naive reference (tolerance: ordering is the only diff)
        n = len(vals)
        p = np.log((np.arange(1, 10) + 1.0) / np.arange(1, 10)) / np.log(10.0)
        e = n * p
        c = np.array([(digs == d).sum() for d in range(1, 10)], float)
        ref = (((c - e) ** 2) / e).sum()
        assert abs(rows[grp]["chi2"] - ref) < 1e-9
    # null / non-positive rows excluded
    t2 = pa.table({"g": ["a", "a", "a"], "v": pa.array([19, None, 0], pa.int64())})
    r2 = benford_test(t2, "g", "v").to_pylist()[0]
    assert r2["n"] == 1 and r2["d1"] == 1
    # dataset path identical
    ds = ray.data.from_arrow(t).repartition(3)
    got = {r["g"]: (r["n"], r["chi2"]) for r in benford_test(ds, "g", "v").take_all()}
    assert got == {g: (rows[g]["n"], rows[g]["chi2"]) for g in ("a", "b")}


def test_multiplier_bootstrap(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from kamae_ray.stages.profile import (_BOOT_P, _BOOT_Q, _popcount32,
                                          multiplier_bootstrap)

    # popcount SWAR vs python bin() on the hash domain
    rng = np.random.default_rng(1)
    v = rng.integers(0, 2**32, 2000).astype(np.uint64)
    assert (_popcount32(v) ==
            np.array([bin(int(z)).count("1") for z in v])).all()
    ids = np.arange(100, dtype=np.int64)
    x = rng.integers(-1000, 1000, 100)
    t = pa.table({"id": ids, "x": x})
    out = multiplier_bootstrap(t, "id", "x", replicates=4, salt=2)
    rows = out.to_pylist()
    for r in range(4):
        h = (ids.astype(np.uint64) * np.uint64(_BOOT_P)
             + np.uint64(r + 2) * np.uint64(_BOOT_Q)) & np.uint64(0xFFFFFFFF)
        w = np.array([bin(int(z)).count("1") for z in h])
        exp = int((w * x).sum())
        assert rows[r]["wsum"] == exp
        assert rows[r]["estimate"] == exp / 16.0
    # replicate estimates scatter AROUND the true total (sanity)
    est = np.array([r["estimate"] for r in rows])
    assert abs(est.mean() - x.sum()) < 6 * (abs(x).sum() ** 0.5) * 40
    # dataset path identical regardless of partitioning (order-free sums)
    ds = ray.data.from_arrow(t).repartition(5)
    out2 = multiplier_bootstrap(ds, "id", "x", replicates=4, salt=2)
    assert out2.to_pylist() == rows


def test_welch_t_by_group(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from kamae_ray.stages.profile import welch_t_by_group

    rng = np.random.default_rng(9)
    g = rng.choice(["g1", "g2"], 400).tolist()
    cls = rng.choice(["a", "b", "other"], 400).tolist()
    x = rng.integers(-100, 200, 400)
    t = pa.table({"g": g, "c": cls, "x": x})
    out = welch_t_by_group(t, "g", "c", "x", class_a="a", class_b="b")
    rows = {r["g"]: r for r in out.to_pylist()}
    for grp in ("g1", "g2"):
        xa = np.array([xx for xx, gg, cc in zip(x, g, cls) if gg == grp and cc == "a"], float)
        xb = np.array([xx for xx, gg, cc in zip(x, g, cls) if gg == grp and cc == "b"], float)
        va, vb = xa.var(ddof=1), xb.var(ddof=1)
        se2 = va / len(xa) + vb / len(xb)
        t_ref = (xa.mean() - xb.mean()) / np.sqrt(se2)
        df_ref = se2**2 / ((va / len(xa))**2 / (len(xa) - 1)
                           + (vb / len(xb))**2 / (len(xb) - 1))
        r = rows[grp]
        assert r["n_a"] == len(xa) and r["n_b"] == len(xb)
        assert abs(r["t_stat"] - t_ref) < 1e-9
        assert abs(r["df"] - df_ref) < 1e-6
        assert abs(r["mean_a"] - xa.mean()) < 1e-12
    # degenerate: one class missing -> null t/df
    t2 = pa.table({"g": ["z"] * 3, "c": ["a", "a", "a"], "x": [1, 2, 3]})
    r2 = welch_t_by_group(t2, "g", "c", "x", class_a="a", class_b="b").to_pylist()[0]
    assert r2["t_stat"] is None and r2["mean_b"] is None and r2["n_b"] == 0
    # dataset path identical
    ds = ray.data.from_arrow(t).repartition(4)
    out2 = welch_t_by_group(ds, "g", "c", "x", class_a="a", class_b="b")
    assert out2.to_pylist() == out.to_pylist()


def test_quantile_normalize(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from kamae_ray.stages.aggregate import quantile_normalize

    # two shifted groups map onto the same global ladder
    rng = np.random.default_rng(13)
    ga = rng.integers(0, 100, 60)
    gb = rng.integers(500, 600, 40)
    v = np.concatenate([ga, gb]).astype(np.int64)
    ids = np.arange(100, dtype=np.int64)
    g = ["a"] * 60 + ["b"] * 40
    t = pa.table({"id": ids, "g": g, "v": v})
    ds = ray.data.from_arrow(t).repartition(3)
    out = {r["id"]: r["v_qn"] for r in
           quantile_normalize(ds, "g", "v", "id").take_all()}
    # naive reference
    glob = sorted(zip(v.tolist(), ids.tolist()))
    gvals = [x for x, _ in glob]
    N = len(v)
    for grp, size in (("a", 60), ("b", 40)):
        sub = sorted((vv, ii) for vv, ii, gg in zip(v, ids, g) if gg == grp)
        for r, (vv, ii) in enumerate(sub):
            tgt = int(np.floor(np.float64(r) / np.float64(size - 1)
                               * np.float64(N - 1)))
            assert out[ii] == gvals[tgt], (grp, r, ii)
    # min maps to global min, max to global max in both groups
    amin = min(ii for vv, ii in zip(v, ids) if g[ii] == "a" and vv == ga.min())
    assert out[amin] == min(v)
    # singleton group -> global min
    t2 = pa.table({"id": [0, 1, 2], "g": ["x", "y", "y"], "v": [50, 7, 9]})
    o2 = {r["id"]: r["v_qn"] for r in
          quantile_normalize(ray.data.from_arrow(t2), "g", "v", "id").take_all()}
    assert o2[0] == 7  # rank fraction 0 -> global rank 0 value


def test_render_grouped_text(ray_session):
    import pyarrow as pa
    import ray

    from kamae_ray.stages.text import render_grouped_text

    t = pa.table({
        "g": ["a", "a", "b", "a", "b"],
        "line": ["x", None, "p", "y", "q"],
        "o": [2, 1, 9, 1, 3],
    })
    out = render_grouped_text(t, "g", "line", "o", sep="|", out_col="doc")
    rows = {r["g"]: (r["doc"], r["n_lines"]) for r in out.to_pylist()}
    # null line dropped; order by o: a -> y(1), x(2); b -> q(3), p(9)
    assert rows == {"a": ("y|x", 2), "b": ("q|p", 2)}
    # dataset path identical
    ds = ray.data.from_arrow(t).repartition(3)
    got = {r["g"]: (r["doc"], r["n_lines"])
           for r in render_grouped_text(ds, "g", "line", "o", sep="|",
                                        out_col="doc").take_all()}
    assert got == rows


def test_nucleus_filter(ray_session):
    import pyarrow as pa
    import ray

    from kamae_ray.stages.aggregate import nucleus_filter

    # group a: weights 50,30,15,5 -> p=0.8: excl prefixes 0,50,80,95;
    # keep while excl < 80 -> first two; the crossing row (excl=80) is CUT
    # because 80 < 80 is false... boundary: keep iff 1e6*excl < p*tot
    t = pa.table({"g": ["a"] * 4 + ["b"] * 2,
                  "item": ["w", "x", "y", "z", "p", "q"],
                  "wt": [50, 30, 15, 5, 1, 1]})
    out = nucleus_filter(t, "g", "wt", "item", p_ppm=800_000)
    got = sorted((r["g"], r["item"]) for r in out.to_pylist())
    # a: tot=100; excl(w)=0<80 keep, excl(x)=50<80 keep, excl(y)=80 !<80 cut
    # b: tot=2; excl(p)=0<1.6 keep, excl(q)=1*1e6 < 0.8*2e6 keep (ties by item)
    assert got == [("a", "w"), ("a", "x"), ("b", "p"), ("b", "q")]
    # tie handling: equal weights ordered by item rank
    t2 = pa.table({"g": ["a"] * 3, "item": ["c", "b", "a"], "wt": [1, 1, 1]})
    o2 = sorted(r["item"] for r in
                nucleus_filter(t2, "g", "wt", "item", p_ppm=600_000).to_pylist())
    assert o2 == ["a", "b"]  # excl: a=0, b=1e6<1.8e6, c=2e6 cut
    # dataset path identical
    ds = ray.data.from_arrow(t).repartition(2)
    got_ds = sorted((r["g"], r["item"]) for r in
                    nucleus_filter(ds, "g", "wt", "item", 800_000).take_all())
    assert got_ds == got


def test_rebalance_classes(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from kamae_ray.pipelines.packing import _NS_P, rebalance_classes

    ids = np.arange(300, dtype=np.int64)
    cls = ["maj"] * 250 + ["min"] * 50
    t = pa.table({"id": ids, "c": cls})
    out = rebalance_classes(t, "c", "id", salt=1)
    rows = out.to_pylist()
    # exact keep rule per row
    for r in rows:
        n_cl = 250 if r["c"] == "maj" else 50
        h = ((int(r["id"]) + 1) * _NS_P) % 2**64
        assert h % n_cl < 50
    kept_maj = sum(1 for r in rows if r["c"] == "maj")
    kept_min = sum(1 for r in rows if r["c"] == "min")
    assert kept_min == 50  # minority class fully kept
    assert 20 <= kept_maj <= 90  # expected ~50
    # dataset path identical
    ds = ray.data.from_arrow(t).repartition(3)
    got = sorted(r["id"] for r in rebalance_classes(ds, "c", "id", salt=1).take_all())
    assert got == sorted(r["id"] for r in rows)


def test_time_decayed_sum_bitexact_vs_duckdb_and_distributed(ray_session):
    import duckdb
    import ray

    from kamae_ray.stages.aggregate import time_decayed_sum, time_decayed_sum_oracle_sql

    rng = np.random.default_rng(8)
    n = 4000
    hl = 1000
    ref = 50_000
    t = pa.table({
        "k": pa.array(rng.integers(0, 60, n), pa.int64()),
        "t_us": pa.array(rng.integers(0, 60_000, n), pa.int64()),
        "v": pa.array(rng.integers(-500, 500, n), pa.int64()),
    })
    want = time_decayed_sum(t, "k", "t_us", "v", hl, ref, max_age=10).sort_by("k")
    con = duckdb.connect()
    con.register("src", t)
    sql = time_decayed_sum_oracle_sql(
        "(SELECT k, make_timestamp(t_us) AS ts, v FROM src)", "k", "ts", "v",
        hl, str(ref), max_age=10)
    exp = con.sql(sql + " ORDER BY k").arrow()
    assert want.column("k").to_pylist() == exp.column("k").to_pylist()
    ga = want.column("decayed").to_numpy()
    ea = exp.column("decayed").to_numpy()
    assert (ga.view(np.int64) == ea.view(np.int64)).all()  # BIT-identical
    ds = ray.data.from_arrow(t).repartition(7)
    got = pa.concat_tables(
        [pa.table(x) for x in time_decayed_sum(ds, "k", "t_us", "v", hl, ref, max_age=10)
         .iter_batches(batch_format="pyarrow")]
    ).sort_by("k")
    assert got.cast(want.schema).equals(want)
    with pytest.raises(ValueError):
        time_decayed_sum(t, "k", "t_us", "v", 0, ref)


def test_zipf_fit_dataset_matches_table_and_law(ray_session):
    import ray

    from kamae_ray.pipelines.text_features import zipf_fit

    rng = np.random.default_rng(6)
    # synthesize a corpus whose term counts actually follow freq ~ rank^-1
    words = []
    for r in range(1, 80):
        words.extend([f"w{r:03d}"] * max(1, 8000 // r))
    rng.shuffle(words)
    docs = [" ".join(words[i::50]) for i in range(50)]
    t = pa.table({"doc_id": pa.array(range(50), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    want = zipf_fit(t, "text", top_r=79)
    slope = want.column("slope")[0].as_py()
    assert -1.15 < slope < -0.85  # recovers the planted -1 exponent
    ds = ray.data.from_arrow(t).repartition(4)
    got = zipf_fit(ds, "text", top_r=79)
    assert got.equals(want)
    empty = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": pa.array([""], pa.string())})
    deg = zipf_fit(empty, "text")
    assert deg.column("slope").null_count == 1


def test_grouped_power_means_dataset_and_references(ray_session):
    import ray

    from kamae_ray.stages.profile import grouped_power_means

    rng = np.random.default_rng(3)
    n = 3000
    g = rng.integers(0, 5, n)
    v = rng.integers(1, 100000, n).astype(object)
    v[4] = None
    v[9] = 0  # dropped: outside the log/reciprocal domain
    t = pa.table({"g": pa.array(g, pa.int64()), "v": pa.array(list(v), pa.int64())})
    want = grouped_power_means(t, "g", "v").sort_by("g")
    # sanity vs naive float references (quantization error ~1e-6 relative)
    mask = np.array([x is not None and x > 0 for x in v])
    for row in want.to_pylist():
        sel = np.array([int(x) for x, m, gg in zip(v, mask, g)
                        if m and gg == row["g"]], dtype=float)
        assert abs(row["gmean"] - np.exp(np.mean(np.log(sel)))) / row["gmean"] < 1e-5
        assert abs(row["hmean"] - len(sel) / np.sum(1.0 / sel)) / row["hmean"] < 1e-5
        assert row["n"] == len(sel)
    ds = ray.data.from_arrow(t).repartition(5)
    got = pa.concat_tables(
        [pa.table(x) for x in grouped_power_means(ds, "g", "v")
         .iter_batches(batch_format="pyarrow")]
    ).sort_by("g")
    assert got.cast(want.schema).equals(want)
