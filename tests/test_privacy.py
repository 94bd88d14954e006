"""k_anonymize / l_diversity (stages/privacy.py): hand cases, DuckDB
QUALIFY/GROUP BY equivalence on the pa.Table path, null-QI grouping, and
table-vs-Dataset parity."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from kamae_ray.stages.privacy import k_anonymize, l_diversity


def _collect(obj) -> pa.Table:
    if isinstance(obj, pa.Table):
        return obj
    return pa.concat_tables(
        [pa.table(b) for b in obj.iter_batches(batch_format="pyarrow")])


@pytest.fixture(scope="module")
def people():
    rng = np.random.default_rng(42)
    n = 5000
    seg = rng.choice(["a", "b", "c", None], n, p=[0.4, 0.3, 0.2, 0.1])
    return pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "seg": pa.array(seg),
        "bucket": pa.array(rng.integers(0, 400, n)),
        "disease": pa.array(rng.choice(["x", "y", "z"], n)),
    })


def test_kanon_hand_case():
    t = pa.table({
        "id": [1, 2, 3, 4, 5, 6],
        "g": ["a", "a", "a", "b", "b", "c"],
    })
    out = k_anonymize(t, "g", 2)
    assert sorted(out.column("id").to_pylist()) == [1, 2, 3, 4, 5]
    out3 = k_anonymize(t, "g", 3)
    assert sorted(out3.column("id").to_pylist()) == [1, 2, 3]


def test_kanon_k1_is_noop():
    t = pa.table({"id": [1, 2], "g": ["a", "b"]})
    assert k_anonymize(t, "g", 1) is t


def test_kanon_null_qi_forms_a_group():
    t = pa.table({
        "id": [1, 2, 3, 4],
        "g": [None, None, "a", None],
    })
    out = k_anonymize(t, "g", 3)
    assert sorted(out.column("id").to_pylist()) == [1, 2, 4]


def test_kanon_matches_duckdb_qualify(people):
    out = k_anonymize(people, ["seg", "bucket"], 3)
    con = duckdb.connect()
    con.register("people", people)
    exp = con.execute(
        "SELECT id FROM people QUALIFY COUNT(*) OVER "
        "(PARTITION BY seg, bucket) >= 3 ORDER BY id"
    ).fetchall()
    con.close()
    assert sorted(out.column("id").to_pylist()) == [r[0] for r in exp]


def test_kanon_dataset_parity(ray_session, people):
    import ray

    ds = ray.data.from_arrow(people).repartition(7)
    got = _collect(k_anonymize(ds, ["seg", "bucket"], 3))
    want = k_anonymize(people, ["seg", "bucket"], 3)
    assert sorted(got.column("id").to_pylist()) == \
        sorted(want.column("id").to_pylist())


def test_ldiv_hand_case():
    t = pa.table({
        "g": ["a", "a", "a", "b", "b", "c"],
        "s": ["x", "x", "y", "x", None, "z"],
    })
    out = _collect(l_diversity(t, "g", "s", 2)).sort_by("g")
    rows = out.to_pylist()
    assert rows[0] == {"g": "a", "n": 3, "n_sensitive": 2, "diverse": 1}
    # b has one non-null sensitive value -> not diverse
    assert rows[1] == {"g": "b", "n": 1, "n_sensitive": 1, "diverse": 0}
    assert rows[2] == {"g": "c", "n": 1, "n_sensitive": 1, "diverse": 0}


def test_ldiv_matches_duckdb(people):
    out = _collect(l_diversity(people, ["seg", "bucket"], "disease", 3))
    con = duckdb.connect()
    con.register("people", people)
    exp = con.execute(
        "SELECT seg, bucket, COUNT(disease)::BIGINT AS n, "
        "COUNT(DISTINCT disease)::BIGINT AS n_sensitive, "
        "CAST(COUNT(DISTINCT disease) >= 3 AS BIGINT) AS diverse "
        "FROM people WHERE disease IS NOT NULL GROUP BY 1, 2 "
        "ORDER BY seg NULLS LAST, bucket"
    ).fetch_arrow_table()
    con.close()
    key = lambda t: sorted(  # noqa: E731
        ((r["seg"] or "~"), r["bucket"], r["n"], r["n_sensitive"], r["diverse"])
        for r in t.to_pylist())
    assert key(out) == key(exp)


def test_ldiv_dataset_parity(ray_session, people):
    import ray

    ds = ray.data.from_arrow(people).repartition(5)
    got = _collect(l_diversity(ds, ["seg", "bucket"], "disease", 2))
    want = _collect(l_diversity(people, ["seg", "bucket"], "disease", 2))
    key = lambda t: sorted(  # noqa: E731
        ((r["seg"] or "~"), r["bucket"], r["n"], r["n_sensitive"], r["diverse"])
        for r in t.to_pylist())
    assert key(got) == key(want)


def test_t_closeness(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray

    from kamae_ray.stages.privacy import t_closeness

    rng = np.random.default_rng(9)
    n = 2500
    t = pa.table({
        "qi": pa.array([f"q{v}" for v in rng.integers(0, 9, n)]),
        "s": pa.array([None if rng.random() < 0.07 else f"s{v}"
                       for v in rng.integers(0, 5, n)]),
    })
    con = duckdb.connect()
    con.register("t", t)
    want = {r[0]: r[1:] for r in con.sql("""
        WITH base AS (SELECT qi, s FROM t WHERE s IS NOT NULL),
        cells AS (SELECT qi, s, count(*)::BIGINT AS ngc FROM base GROUP BY qi, s),
        gm AS (SELECT qi, SUM(ngc)::BIGINT AS ng FROM cells GROUP BY qi),
        cm AS (SELECT s, SUM(ngc)::BIGINT AS nc FROM cells GROUP BY s),
        tot AS (SELECT SUM(ngc)::BIGINT AS n FROM cells),
        grid AS (SELECT gm.qi, cm.s, gm.ng, cm.nc FROM gm CROSS JOIN cm),
        j AS (SELECT grid.qi, grid.ng, grid.nc, COALESCE(cells.ngc, 0) AS ngc
              FROM grid LEFT JOIN cells ON grid.qi = cells.qi AND grid.s = cells.s),
        agg AS (SELECT qi, MAX(ng) AS n,
                SUM(ABS(ngc * (SELECT n FROM tot) - nc * ng)) AS num FROM j GROUP BY qi)
        SELECT qi, n, CAST(CAST(num AS HUGEINT) * 1000000
               // (2 * (SELECT n FROM tot) * n) AS BIGINT) AS tv_ppm FROM agg
    """).fetchall()}
    # Table path
    out = t_closeness(t, "qi", "s", t_ppm=120_000)
    for r in out.to_pylist():
        assert want[r["qi"]] == (r["n"], r["tv_ppm"])
        assert r["close"] == int(r["tv_ppm"] <= 120_000)
    # Dataset path
    rows = t_closeness(ray.data.from_arrow(t).repartition(4), "qi", "s",
                       t_ppm=120_000).take_all()
    assert len(rows) == 9
    for r in rows:
        assert want[r["qi"]] == (r["n"], r["tv_ppm"])
    # uniform group == global distribution -> tv 0
    u = pa.table({"qi": ["a"] * 4 + ["b"] * 4, "s": ["x", "y"] * 4})
    ou = t_closeness(u, "qi", "s", t_ppm=0)
    assert ou.column("tv_ppm").to_pylist() == [0, 0]
    assert ou.column("close").to_pylist() == [1, 1]
    # category budget raise
    import pytest
    with pytest.raises(ValueError, match="categories"):
        t_closeness(t, "qi", "s", t_ppm=0, max_categories=2)
