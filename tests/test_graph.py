"""pagerank (pipelines/graph.py): Python-reference parity, fixed-point
exactness, and driver-state == fully-distributed plan equality."""

import numpy as np
import pyarrow as pa
import pytest

from kamae_ray.pipelines.graph import pagerank


def _ref(E, iters, d=0.85):
    nodes = sorted({u for u, _ in E} | {v for _, v in E})
    deg = {}
    for u, _ in E:
        deg[u] = deg.get(u, 0) + 1
    r = {n: 1.0 for n in nodes}
    for _ in range(iters):
        s = {n: 0.0 for n in nodes}
        for u, v in E:
            s[v] += r[u] / deg[u]
        r = {n: (1 - d) + d * s[n] for n in nodes}
    return r


def _ref_fixed(E, iters, scale=1_000_000, d_num=85):
    nodes = sorted({u for u, _ in E} | {v for _, v in E})
    deg = {}
    for u, _ in E:
        deg[u] = deg.get(u, 0) + 1
    r = {n: scale for n in nodes}
    for _ in range(iters):
        s = {n: 0 for n in nodes}
        for u, v in E:
            s[v] += r[u] // deg[u]
        r = {n: (100 - d_num) * scale // 100 + d_num * s[n] // 100 for n in nodes}
    return r


def _edges(E):
    return pa.table({"src": pa.array([u for u, _ in E], pa.int64()),
                     "dst": pa.array([v for _, v in E], pa.int64())})


EDGE_SET = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 1), (4, 1), (5, 6)]


def test_pagerank_table_matches_reference():
    out = pagerank(_edges(EDGE_SET), iters=4)
    got = dict(zip(out.column("node").to_pylist(), out.column("rank").to_pylist()))
    want = _ref(EDGE_SET, 4)
    assert set(got) == set(want)
    assert all(abs(got[k] - want[k]) < 1e-12 for k in want)


def test_pagerank_fixed_point_exact():
    out = pagerank(_edges(EDGE_SET), iters=4, fixed_point=1_000_000)
    got = dict(zip(out.column("node").to_pylist(), out.column("rank").to_pylist()))
    want = _ref_fixed(EDGE_SET, 4)
    assert got == want
    with pytest.raises(ValueError):
        pagerank(_edges(EDGE_SET), iters=1, fixed_point=1_000_000, damping=1 / 3)


def test_pagerank_dataset_paths_agree(ray_session):
    import ray

    rng = np.random.default_rng(8)
    E = [(int(rng.integers(0, 60)), int(rng.integers(0, 60))) for _ in range(500)]
    t = _edges(E)
    want = pagerank(t, iters=3, fixed_point=1_000_000).sort_by("node")
    for budget in (2_000_000, 0):  # driver-state path, then fully distributed
        ds = ray.data.from_arrow(t).repartition(4)
        out = pagerank(ds, iters=3, fixed_point=1_000_000, driver_node_budget=budget)
        got = pa.concat_tables(
            [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
        ).sort_by("node")
        assert got.column("node").to_pylist() == want.column("node").to_pylist(), budget
        assert got.column("rank").to_pylist() == want.column("rank").to_pylist(), budget


def test_clustering_coefficients(ray_session):
    import pyarrow as pa
    import ray

    from kamae_ray.pipelines.graph import clustering_coefficients

    # K4 minus edge (3,4): triangles {1,2,3} and {1,2,4}
    edges = pa.table({"src": [1, 1, 1, 2, 2],
                      "dst": [2, 3, 4, 3, 4]})
    out = clustering_coefficients(edges)
    rows = {r["node"]: r for r in out.to_pylist()}
    assert rows[1]["degree"] == 3 and rows[1]["triangles"] == 2
    assert rows[1]["lcc_ppm"] == (2_000_000 * 2) // (3 * 2)
    assert rows[3]["degree"] == 2 and rows[3]["triangles"] == 1
    assert rows[3]["lcc_ppm"] == 1_000_000
    # isolated-in-triangle-terms node with degree 1 -> null
    e2 = pa.table({"src": [1, 2, 3, 4], "dst": [2, 3, 1, 1]})
    r2 = {r["node"]: r for r in clustering_coefficients(e2).to_pylist()}
    assert r2[4]["degree"] == 1 and r2[4]["lcc_ppm"] is None
    assert r2[4]["triangles"] == 0
    # dataset path + duplicate/reversed edges collapse
    e3 = pa.table({"src": [1, 2, 2, 3, 1], "dst": [2, 1, 3, 2, 3]})
    ds = ray.data.from_arrow(e3).repartition(2)
    r3 = {r["node"]: r for r in clustering_coefficients(ds).take_all()}
    assert all(r3[n]["triangles"] == 1 and r3[n]["lcc_ppm"] == 1_000_000
               for n in (1, 2, 3))


def test_degree_assortativity_star_and_reference(ray_session):
    import ray

    from kamae_ray.pipelines.graph import degree_assortativity

    # star K1,4: hub degree 4, leaves degree 1 -> perfectly disassortative
    star = pa.table({"src": [0, 0, 0, 0], "dst": [1, 2, 3, 4]})
    out = degree_assortativity(star)
    assert out.column("n")[0].as_py() == 8
    assert abs(out.column("assortativity")[0].as_py() + 1.0) < 1e-12
    # cycle: regular graph -> zero variance -> NULL
    cyc = pa.table({"src": [0, 1, 2], "dst": [1, 2, 0]})
    assert degree_assortativity(cyc).column("assortativity")[0].as_py() is None
    # random graph vs naive numpy reference (dups/reverses/self-loops mixed in)
    rng = np.random.default_rng(3)
    s = rng.integers(0, 30, 300)
    d = rng.integers(0, 30, 300)
    t = pa.table({"src": pa.array(s), "dst": pa.array(d)})
    out = degree_assortativity(ray.data.from_arrow(t))
    es = set()
    for a, b in zip(s.tolist(), d.tolist()):
        if a != b:
            es.add((min(a, b), max(a, b)))
    deg = {}
    for a, b in es:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs = [deg[a] for a, b in es] + [deg[b] for a, b in es]
    ys = [deg[b] for a, b in es] + [deg[a] for a, b in es]
    ref = np.corrcoef(np.array(xs, float), np.array(ys, float))[0, 1]
    assert abs(out.column("assortativity")[0].as_py() - ref) < 1e-9
    assert out.column("n")[0].as_py() == 2 * len(es)


def test_link_prediction(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray

    from kamae_ray.pipelines.graph import link_prediction

    rng = np.random.default_rng(23)
    m = 400
    t = pa.table({
        "src": pa.array(rng.integers(0, 30, m), pa.int64()),
        "dst": pa.array(rng.integers(0, 30, m), pa.int64()),
    })
    con = duckdb.connect()
    con.register("t", t)
    want = {(r[0], r[1]): r[2:] for r in con.sql("""
        WITH e AS (SELECT DISTINCT LEAST(src,dst) a, GREATEST(src,dst) b
                   FROM t WHERE src <> dst),
        und AS (SELECT a AS node, b AS nbr FROM e UNION ALL SELECT b, a FROM e),
        deg AS (SELECT node, count(*)::BIGINT AS deg FROM und GROUP BY node),
        w AS (SELECT l.node AS u, r.node AS v, count(*)::BIGINT AS cn
              FROM und l JOIN und r ON l.nbr = r.nbr AND l.node < r.node
              GROUP BY 1, 2)
        SELECT u, v, cn, du.deg, dv.deg,
               cn * 1000000 // (du.deg + dv.deg - cn),
               CAST(CASE WHEN EXISTS(SELECT 1 FROM e WHERE e.a = u AND e.b = v)
                    THEN 1 ELSE 0 END AS BIGINT)
        FROM w JOIN deg du ON du.node = u JOIN deg dv ON dv.node = v
        WHERE cn >= 2
    """).fetchall()}
    cols = ["cn", "deg_u", "deg_v", "jaccard_ppm", "is_edge"]
    # Table path
    out = link_prediction(t, min_common=2)
    assert out.num_rows == len(want)
    for r in out.to_pylist():
        assert want[(r["u"], r["v"])] == tuple(r[c] for c in cols)
    # Dataset path
    rows = link_prediction(ray.data.from_arrow(t).repartition(4),
                           min_common=2).take_all()
    assert len(rows) == len(want)
    for r in rows:
        assert want[(r["u"], r["v"])] == tuple(r[c] for c in cols)


def test_k_core_distributed_matches_driver_and_oracle(ray_session):
    import duckdb
    import ray

    from kamae_ray.pipelines.graph import k_core, k_core_oracle_sql

    rng = np.random.default_rng(12)
    src = rng.integers(0, 200, 700)
    dst = rng.integers(0, 200, 700)
    chain = np.arange(500, 530)
    t = pa.table({"src": pa.array(np.concatenate([src, chain[:-1]]), pa.int64()),
                  "dst": pa.array(np.concatenate([dst, chain[1:]]), pa.int64())})
    want = k_core(t, 3).sort_by("node")
    con = duckdb.connect()
    con.register("g", t)
    exp = con.sql(k_core_oracle_sql("SELECT src, dst FROM g", 3) + " ORDER BY node").arrow()
    assert want.equals(exp.cast(want.schema))
    ds = ray.data.from_arrow(t).repartition(4)
    # driver fast path returns a Table directly (lesson-23 style)
    got = k_core(ds, 3).sort_by("node")
    assert got.cast(want.schema).equals(want)
    # forced distributed tier (budget 0) must agree exactly
    got2 = pa.concat_tables(
        [pa.table(x) for x in k_core(ds, 3, max_driver_edges=0)
         .iter_batches(batch_format="pyarrow")]
    ).sort_by("node")
    assert got2.cast(want.schema).equals(want)
    with pytest.raises(ValueError):
        k_core(t, 0)


def test_adamic_adar_matches_sql_and_discounts_hubs(ray_session):
    import duckdb
    import ray

    from kamae_ray.pipelines.graph import adamic_adar

    rng = np.random.default_rng(4)
    t = pa.table({"src": pa.array(rng.integers(0, 120, 500), pa.int64()),
                  "dst": pa.array(rng.integers(0, 120, 500), pa.int64())})
    got = pa.concat_tables(
        [pa.table(x) for x in adamic_adar(t).iter_batches(batch_format="pyarrow")]
    ).sort_by([("u", "ascending"), ("v", "ascending")])
    con = duckdb.connect()
    con.register("g", t)
    exp = con.sql("""
        WITH e AS (SELECT DISTINCT least(src,dst) a, greatest(src,dst) b FROM g
                   WHERE src <> dst),
        und AS (SELECT a AS node, b AS z FROM e UNION ALL SELECT b, a FROM e),
        deg AS (SELECT node AS z, count(*)::BIGINT AS d FROM und GROUP BY node),
        zt AS (SELECT z, CASE WHEN d < 2 THEN 0 ELSE
               CAST(round(1000000.0 / ln(CAST(d AS DOUBLE))) AS BIGINT) END
               AS term FROM deg),
        w AS (SELECT l.node AS u, r.node AS v, zt.term FROM und l
              JOIN und r ON l.z = r.z JOIN zt ON zt.z = l.z WHERE l.node < r.node)
        SELECT u, v, count(*)::BIGINT AS cn, CAST(SUM(term) AS BIGINT) AS aa_micro
        FROM w GROUP BY u, v ORDER BY u, v""").arrow()
    assert got.equals(exp.cast(got.schema))
    # hub discount: a pair with one low-degree shared neighbor can outscore
    # one with a single hub neighbor
    star = pa.table({"src": pa.array([0] * 10 + [100, 101], pa.int64()),
                     "dst": pa.array(list(range(1, 11)) + [200, 200], pa.int64())})
    s = pa.concat_tables(
        [pa.table(x) for x in adamic_adar(star).iter_batches(batch_format="pyarrow")])
    rows = {(r["u"], r["v"]): r["aa_micro"] for r in s.to_pylist()}
    assert rows[(100, 101)] > rows[(1, 2)]  # deg(200)=2 beats deg(0)=10
