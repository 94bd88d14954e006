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
