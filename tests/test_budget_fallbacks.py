"""Forced-fallback sweep (r4 verdict task 8): every budget-guarded pipeline
must produce the SAME result with the driver budget forced past its limit —
so the 100x-scale paths stay exercised as the surface grows.

near_dedup's driver_pair_budget=0 twin is already asserted in
tests/test_dedup_ann_text.py (kept there — it shares that file's corpus
fixtures). This file sweeps the rest: pagerank, groupby_rollup, groupby_cube,
dedup_against_index, plus the raise-type guards (knn_graph and
groupby_vector_mean point to their scale path instead of degrading).
"""

import numpy as np
import pyarrow as pa
import pytest


def _canon(obj) -> list[tuple]:
    """Any Dataset/Table result -> sorted list of row tuples (floats kept
    exact: both paths promise bit-identical results, not approximate)."""
    if not isinstance(obj, pa.Table):
        obj = pa.concat_tables(
            [pa.table(b) for b in obj.iter_batches(batch_format="pyarrow")]
        ) if hasattr(obj, "iter_batches") else pa.table(obj)
    cols = sorted(obj.column_names)

    def freeze(v):
        return tuple(v) if isinstance(v, (list, np.ndarray)) else v

    rows = [tuple(freeze(r[c]) for c in cols) for r in obj.select(cols).to_pylist()]
    return sorted(rows, key=repr)


@pytest.fixture(scope="module")
def edges_ds(ray_session):
    import ray

    rng = np.random.default_rng(11)
    n = 4000
    t = pa.table({
        "src": pa.array(rng.integers(0, 300, n)),
        "dst": pa.array(rng.integers(0, 300, n)),
    })
    return ray.data.from_arrow(t).repartition(6)


class TestBudgetFallbackEquality:
    def test_pagerank_driver_vs_distributed(self, edges_ds):
        from kamae_ray.pipelines.graph import pagerank

        kw = dict(damping=0.85, iters=4, fixed_point=10**6)
        fast = pagerank(edges_ds, driver_node_budget=2_000_000, **kw)
        dist = pagerank(edges_ds, driver_node_budget=0, **kw)
        assert _canon(fast) == _canon(dist)

    @pytest.mark.parametrize("fn_name", ["groupby_rollup", "groupby_cube"])
    def test_rollup_cube_driver_vs_distributed(self, ray_session, fn_name):
        import ray

        from kamae_ray.stages import aggregate as agg

        rng = np.random.default_rng(5)
        n = 5000
        t = pa.table({
            "a": pa.array(rng.choice(["x", "y", "z"], n)),
            "b": pa.array(rng.integers(0, 7, n)),
            "v": pa.array(rng.integers(0, 1000, n)),
        })
        ds = ray.data.from_arrow(t).repartition(5)
        fn = getattr(agg, fn_name)
        aggs = {"v": ["sum", "count", "min", "max"]}
        fast = fn(ds, ["a", "b"], aggs, driver_level_budget=1_000_000)
        dist = fn(ds, ["a", "b"], aggs, driver_level_budget=0)
        assert _canon(fast) == _canon(dist)

    def test_dedup_index_broadcast_vs_sorted_bucket(self, ray_session, tmp_path):
        import ray

        from kamae_ray.pipelines.dedup import dedup_against_index, dedup_index_build

        rng = np.random.default_rng(7)
        corpus = pa.table({"k": pa.array([f"doc-{i}" for i in rng.integers(0, 900, 2000)])})
        dedup_index_build(ray.data.from_arrow(corpus).repartition(4), "k",
                          str(tmp_path / "idx"), num_buckets=8)
        shard = pa.table({
            "k": pa.array([f"doc-{i}" for i in rng.integers(500, 1400, 1500)]),
            "payload": pa.array(np.arange(1500)),
        })
        sh = ray.data.from_arrow(shard).repartition(3)
        kept_b = dedup_against_index(sh, "k", str(tmp_path / "idx"),
                                     broadcast_budget_bytes=64 << 20)
        kept_s = dedup_against_index(sh, "k", str(tmp_path / "idx"),
                                     broadcast_budget_bytes=0)
        got_b, got_s = _canon(kept_b), _canon(kept_s)
        assert got_b == got_s
        assert 0 < len(got_b) < shard.num_rows  # both regimes actually filter


class TestBudgetRaiseGuards:
    """Guards with no degraded path must RAISE and name the scale path."""

    def test_knn_graph_over_budget_raises(self):
        from kamae_ray.pipelines.ann import knn_graph

        rng = np.random.default_rng(0)
        t = pa.table({
            "id": pa.array(np.arange(50)),
            "emb": pa.array(rng.normal(size=(50, 8)).tolist(),
                            pa.list_(pa.float64())),
        })
        with pytest.raises(ValueError, match="ivf_build"):
            knn_graph(t, "id", "emb", k=3, max_broadcast_rows=10)

    def test_groupby_vector_mean_over_budget_raises(self):
        from kamae_ray.stages.linalg import groupby_vector_mean

        rng = np.random.default_rng(1)
        t = pa.table({
            "k": pa.array(np.arange(100)),  # 100 distinct groups
            "emb": pa.array(rng.normal(size=(100, 4)).tolist(),
                            pa.list_(pa.float64())),
        })
        with pytest.raises(ValueError, match="max_partial_rows"):
            groupby_vector_mean(t, "k", "emb", max_partial_rows=10)


class TestRobustOutliers:
    def test_matches_duckdb_and_dataset_path(self, ray_session):
        import duckdb
        import ray

        from kamae_ray.stages.aggregate import robust_outliers

        rng = np.random.default_rng(0)
        n = 3000
        vals = np.where(rng.random(n) < 0.02,
                        rng.normal(500, 100, n), rng.normal(10, 2, n))
        t = pa.table({
            "g": pa.array(rng.choice(["a", "b", "c"], n)),
            "id": pa.array(np.arange(n)),
            "v": pa.array(vals),
        })
        want = robust_outliers(t, "g", "v", k=3.0)
        con = duckdb.connect()
        con.register("t", t)
        ora = con.execute("""
          WITH med AS (SELECT g, quantile_cont(v, 0.5) m FROM t GROUP BY g),
          d AS (SELECT t.*, med.m grp_median, abs(t.v - med.m) ad
                FROM t JOIN med USING (g)),
          mad AS (SELECT g, quantile_cont(ad, 0.5) md FROM d GROUP BY g)
          SELECT d.g, d.id, d.v, d.grp_median, mad.md grp_mad,
                 d.ad > 3.0 * mad.md AS is_outlier
          FROM d JOIN mad USING (g) ORDER BY id
        """).arrow()
        cols = ["g", "id", "v", "grp_median", "grp_mad", "is_outlier"]
        eng = want.sort_by("id").select(cols).combine_chunks()
        assert eng.equals(ora.cast(eng.schema).combine_chunks())
        assert sum(1 for x in eng.column("is_outlier").to_pylist() if x) > 0
        ds = ray.data.from_arrow(t).repartition(5)
        got = pa.concat_tables(
            [pa.table(b) for b in robust_outliers(ds, "g", "v", k=3.0)
             .iter_batches(batch_format="pyarrow")]).sort_by("id")
        assert got.select(cols).combine_chunks().equals(eng)

    def test_group_budget_raise(self):
        from kamae_ray.stages.aggregate import robust_outliers

        t = pa.table({"g": pa.array([str(i) for i in range(50)]),
                      "v": pa.array(np.arange(50.0))})
        with pytest.raises(ValueError, match="max_groups"):
            robust_outliers(t, "g", "v", max_groups=10)


def test_fuzzy_decontaminate_driver_vs_distributed(ray_session):
    import ray

    from kamae_ray.pipelines.decontam import fuzzy_decontaminate

    base = [
        "the quick brown fox jumps over the lazy dog today",
        "pack my box with five dozen liquor jugs right now",
        "sphinx of black quartz judge my vow said the king",
        "how vexingly quick daft zebras jump over the fence",
    ]
    corpus_rows, bench_rows = [], []
    for i in range(40):
        if i % 3 == 0:  # unrelated docs stay clean
            s = f"original corpus entry {i} discussing topic alpha{i} beta{i} gamma{i} delta{i} epsilon{i}"
        else:
            s = base[i % 4] + f" tail{i % 7}"
        corpus_rows.append((i, s))
    for j in range(8):
        # bench docs 0..3 are near-copies of base (high Jaccard), 4..7 unrelated
        if j < 4:
            bench_rows.append((j, base[j] + " extra"))
        else:
            bench_rows.append((j, f"completely unrelated benchmark text number {j} "
                                  "with distinct vocabulary tokens"))
    corpus = pa.table({"doc_id": pa.array([r[0] for r in corpus_rows], pa.int64()),
                       "text": [r[1] for r in corpus_rows]})
    bench = pa.table({"doc_id": pa.array([r[0] for r in bench_rows], pa.int64()),
                      "text": [r[1] for r in bench_rows]})
    cds = ray.data.from_arrow(corpus).repartition(4)
    bds = ray.data.from_arrow(bench).repartition(2)
    fast = fuzzy_decontaminate(cds, bds, "text", "doc_id", jaccard_threshold=0.6)
    dist = fuzzy_decontaminate(cds, bds, "text", "doc_id", jaccard_threshold=0.6,
                               driver_pair_budget=0, driver_id_budget=0)
    assert _canon(fast) == _canon(dist)
    # sanity: some contaminated, some clean, and the Table path agrees
    tbl = fuzzy_decontaminate(corpus, bench, "text", "doc_id", jaccard_threshold=0.6)
    flags = dict(zip(tbl.column("doc_id").to_pylist(),
                     tbl.column("contaminated").to_pylist()))
    assert any(flags.values()) and not all(flags.values())
    assert _canon(fast) == _canon(tbl)


def test_triangle_count_known_graph(ray_session):
    import ray

    from kamae_ray.pipelines.graph import triangle_count

    # K4 (4 triangles) + a pendant edge + a duplicate/reversed/self-loop noise
    s = [0, 0, 0, 1, 1, 2, 2, 4, 3, 9]
    d = [1, 2, 3, 2, 3, 3, 0, 5, 1, 9]
    t = pa.table({"src": pa.array(s, pa.int64()), "dst": pa.array(d, pa.int64())})
    got = triangle_count(t)
    assert got.column("n_triangles").to_pylist() == [4]
    # wedges of K4 + pendant: per K4 vertex C(3,2)=3 -> 12, but only a<b<c
    # ordered paths count: K4 has 4 ordered wedges per triangle? verify vs SQL
    import duckdb
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute("""
        WITH e AS (SELECT DISTINCT least(src,dst) a, greatest(src,dst) b
                   FROM t WHERE src <> dst),
        w AS (SELECT e1.a, e1.b, e2.b AS c FROM e e1 JOIN e e2 ON e1.b = e2.a)
        SELECT (SELECT COUNT(*) FROM w)::BIGINT,
               (SELECT COUNT(*) FROM w JOIN e e3 ON e3.a=w.a AND e3.b=w.c)::BIGINT
    """).fetchone()
    assert got.column("n_wedges").to_pylist() == [exp[0]]
    assert got.column("n_triangles").to_pylist() == [exp[1]]
    # Dataset path agrees; empty graph returns zeros
    dgot = triangle_count(ray.data.from_arrow(t).repartition(4))
    assert dgot.to_pylist() == got.to_pylist()
    empty = triangle_count(pa.table({"src": pa.array([7], pa.int64()),
                                     "dst": pa.array([7], pa.int64())}))
    assert empty.to_pylist() == [{"n_wedges": 0, "n_triangles": 0}]


def test_near_dedup_keep_best_driver_vs_distributed(ray_session):
    import ray

    from kamae_ray.pipelines.dedup import near_dedup_keep_best

    base = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten eleven",
        "red orange yellow green blue indigo violet pink brown black",
    ]
    rows = []
    for i in range(30):
        if i % 5 == 4:
            rows.append((i, f"unique document {i} with its own words aa{i} bb{i} cc{i}", 10 + i))
        else:
            # near-dup families with varying lengths: longest should win
            rows.append((i, base[i % 3] + (" extra" * (i % 4)), 100 + (i % 4) * 50))
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": [r[1] for r in rows],
        "n_chars": pa.array([r[2] for r in rows], pa.int64()),
    })
    ds = ray.data.from_arrow(t).repartition(4)
    fast, w_fast = near_dedup_keep_best(ds, "text", "doc_id", "n_chars",
                                        jaccard_threshold=0.5)
    dist, w_dist = near_dedup_keep_best(ds, "text", "doc_id", "n_chars",
                                        jaccard_threshold=0.5,
                                        driver_pair_budget=0)
    assert _canon(fast) == _canon(dist)
    # the keep rule actually differs from min-id: some winner isn't its cluster rep
    assert isinstance(w_fast, dict) and any(rep != wid for rep, wid in w_fast.items())
    # Table path agrees with the Dataset driver path
    tbl, w_tbl = near_dedup_keep_best(t, "text", "doc_id", "n_chars",
                                      jaccard_threshold=0.5)
    assert _canon(fast) == _canon(tbl)
    assert w_tbl == w_fast


def test_binary_auc_driver_and_distributed_equal(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from kamae_ray.stages.profile import binary_auc

    rng = np.random.default_rng(31)
    n = 30000
    score = rng.integers(0, 400, n)  # heavy ties
    y = (rng.random(n) < (score / 500.0)).astype(np.int64)
    t = pa.table({"s": pa.array(score, pa.int64()), "y": pa.array(y, pa.int64())})
    # searchsorted Mann-Whitney reference with tie correction
    ps, ns = np.sort(score[y == 1]), np.sort(score[y == 0])
    lt = np.searchsorted(ns, ps, side="left")
    le = np.searchsorted(ns, ps, side="right")
    ref = (lt.sum() + 0.5 * (le - lt).sum()) / (len(ps) * len(ns))
    table_out = binary_auc(t, "s", "y")
    assert abs(table_out.column("auc").to_pylist()[0] - ref) < 1e-12
    ds = ray.data.from_arrow(t).repartition(6)
    driver = binary_auc(ds, "s", "y")  # under budget -> driver fold
    forced = binary_auc(ds, "s", "y", driver_budget=0)  # distributed prefix
    for c in ("num2", "pos_total", "neg_total"):
        assert driver.column(c).to_pylist() == table_out.column(c).to_pylist()
        assert forced.column(c).to_pylist() == table_out.column(c).to_pylist(), c
    # non-binary label raises
    bad = pa.table({"s": pa.array([1, 2], pa.int64()), "y": pa.array([2, 0], pa.int64())})
    try:
        binary_auc(bad, "s", "y")
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_calibration_bins_dataset_matches_table(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from kamae_ray.stages.profile import calibration_bins

    rng = np.random.default_rng(41)
    n = 8000
    s = rng.integers(0, 500, n)
    y = (rng.random(n) < s / 600).astype(np.int64)
    t = pa.table({"s": pa.array(s, pa.int64()), "y": pa.array(y)})
    exp = calibration_bins(t, "s", "y", bins=8, max_score=500)
    ds = ray.data.from_arrow(t).repartition(5)
    got = calibration_bins(ds, "s", "y", bins=8, max_score=500)
    assert got.to_pylist() == exp.to_pylist()
    # range guard
    try:
        calibration_bins(t, "s", "y", bins=8, max_score=100)
        assert False, "expected ValueError"
    except Exception:
        pass


def test_group_auc_and_brier(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from kamae_ray.stages.profile import binary_auc, binary_auc_by_group, brier_score

    rng = np.random.default_rng(43)
    n = 15000
    g = rng.choice(["m1", "m2", "m3"], n).tolist()
    s = rng.integers(0, 200, n)
    y = (rng.random(n) < s / 260).astype(np.int64)
    t = pa.table({"g": g, "s": pa.array(s, pa.int64()), "y": pa.array(y)})
    table_out = {r["g"]: r for r in binary_auc_by_group(t, "g", "s", "y").to_pylist()}
    # each group equals the global op run on that group's slice
    for grp in ("m1", "m2", "m3"):
        sub = t.filter(pa.compute.equal(t.column("g"), grp))
        ref = binary_auc(sub, "s", "y").to_pylist()[0]
        got = table_out[grp]
        assert (got["num2"], got["pos_total"], got["neg_total"]) == \
            (ref["num2"], ref["pos_total"], ref["neg_total"]), grp
    # dataset path equals the table path
    ds = ray.data.from_arrow(t).repartition(6)
    rows = binary_auc_by_group(ds, "g", "s", "y").take_all()
    assert {r["g"]: (r["num2"], r["pos_total"], r["neg_total"]) for r in rows} == \
        {k: (v["num2"], v["pos_total"], v["neg_total"]) for k, v in table_out.items()}
    # brier: table, dataset and numpy reference agree
    bt = brier_score(t, "s", "y", scale=200).to_pylist()[0]
    bd = brier_score(ds, "s", "y", scale=200).to_pylist()[0]
    ref = float(np.mean((s / 200 - y) ** 2))
    assert bt == bd and abs(bt["brier"] - ref) < 1e-12
