"""lexical_stats (stages/text.py): hand cases, DuckDB token-count
equivalence on random text, zero-token filtering, Dataset parity."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from kamae_ray.stages.text import lexical_stats


def _collect(obj) -> pa.Table:
    if isinstance(obj, pa.Table):
        return obj
    return pa.concat_tables(
        [pa.table(b) for b in obj.iter_batches(batch_format="pyarrow")])


def test_hand_case():
    t = pa.table({"id": [1, 2, 3, 4],
                  "text": ["a b a c", "", "x x x", None]})
    rows = lexical_stats(t, "id", "text").to_pylist()
    assert rows == [
        {"id": 1, "n_tok": 4, "n_types": 3, "n_hapax": 2, "ttr_ppm": 750_000},
        {"id": 3, "n_tok": 3, "n_types": 1, "n_hapax": 0, "ttr_ppm": 333_333},
    ]


def test_whitespace_variants():
    t = pa.table({"id": [1], "text": ["  a\t b\n\na  "]})
    rows = lexical_stats(t, "id", "text").to_pylist()
    assert rows == [{"id": 1, "n_tok": 3, "n_types": 2, "n_hapax": 1,
                     "ttr_ppm": 666_666}]


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, rng.integers(0, 30)))
             for _ in range(800)]
    return pa.table({"id": pa.array(np.arange(800, dtype=np.int64)),
                     "text": texts})


def test_matches_duckdb(corpus):
    got = lexical_stats(corpus, "id", "text").to_pylist()
    con = duckdb.connect()
    con.register("t", corpus)
    exp = con.execute(
        r"WITH w AS (SELECT id, list_filter(string_split_regex("
        r"coalesce(text,''), '\s+'), x -> length(x) > 0) AS ws FROM t), "
        "x AS (SELECT id, unnest(ws) AS tok FROM w WHERE len(ws) > 0), "
        "c AS (SELECT id, tok, count(*)::BIGINT AS n FROM x GROUP BY 1, 2) "
        "SELECT id, SUM(n)::BIGINT AS n_tok, COUNT(*)::BIGINT AS n_types, "
        "SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax, "
        "CAST((COUNT(*)::BIGINT * 1000000) // SUM(n)::BIGINT AS BIGINT) AS ttr_ppm "
        "FROM c GROUP BY id ORDER BY id"
    ).fetch_arrow_table().to_pylist()
    con.close()
    assert sorted(got, key=lambda r: r["id"]) == exp


def test_dataset_parity(ray_session, corpus):
    import ray

    ds = ray.data.from_arrow(corpus).repartition(6)
    got = _collect(lexical_stats(ds, "id", "text")).to_pylist()
    want = lexical_stats(corpus, "id", "text").to_pylist()
    key = lambda r: r["id"]  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key)
