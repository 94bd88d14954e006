"""QuantizeEmbeddingTransformer (stages/similarity.py): hand cases, the
dequantization error bound, constant/null/empty vectors, DuckDB list-lambda
equivalence, and levels > 256."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from kamae_ray.stages.similarity import QuantizeEmbeddingTransformer


def _t(vectors):
    return pa.table({
        "id": pa.array(np.arange(len(vectors), dtype=np.int64)),
        "emb": pa.array(vectors, pa.list_(pa.float64())),
    })


def test_hand_case():
    out = QuantizeEmbeddingTransformer(input_col="emb", output_col="q")\
        .transform_batch(_t([[0.0, 1.0, 0.5]]))
    assert out.column("q").to_pylist() == [[0, 255, 128]]  # .5 rounds half-up
    assert out.column("q_lo").to_pylist() == [0.0]
    assert out.column("q_hi").to_pylist() == [1.0]


def test_constant_vector_is_all_zero():
    out = QuantizeEmbeddingTransformer(input_col="emb", output_col="q")\
        .transform_batch(_t([[3.5, 3.5, 3.5]]))
    assert out.column("q").to_pylist() == [[0, 0, 0]]


def test_null_and_empty_rows():
    t = pa.table({
        "id": [0, 1, 2],
        "emb": pa.array([[1.0, 2.0], None, []], pa.list_(pa.float64())),
    })
    out = QuantizeEmbeddingTransformer(input_col="emb", output_col="q")\
        .transform_batch(t)
    assert out.column("q").to_pylist() == [[0, 255], None, []]
    assert out.column("q_lo").to_pylist() == [1.0, None, None]
    assert out.column("q_hi").to_pylist() == [2.0, None, None]


def test_dequant_error_bound():
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(200, 32)).tolist()
    out = QuantizeEmbeddingTransformer(input_col="emb", output_col="q")\
        .transform_batch(_t(vecs))
    q = out.column("q").to_pylist()
    lo = out.column("q_lo").to_pylist()
    hi = out.column("q_hi").to_pylist()
    for row, codes, a, b in zip(vecs, q, lo, hi):
        deq = np.asarray(codes) * (b - a) / 255.0 + a
        assert np.abs(deq - np.asarray(row)).max() <= (b - a) / (2 * 255.0) + 1e-12


def test_levels_above_256_use_int32():
    out = QuantizeEmbeddingTransformer(input_col="emb", output_col="q",
                                       levels=1024)\
        .transform_batch(_t([[0.0, 1.0]]))
    assert out.column("q").type == pa.list_(pa.int32())
    assert out.column("q").to_pylist() == [[0, 1023]]


def test_matches_duckdb_list_lambda():
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(500, 16)).astype(np.float32)
    t = pa.table({
        "id": pa.array(np.arange(500, dtype=np.int64)),
        "emb": pa.array(vecs.tolist(), pa.list_(pa.float32())),
    })
    out = QuantizeEmbeddingTransformer(input_col="emb", output_col="q")\
        .transform_batch(t)
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute(
        "WITH b AS (SELECT id, list_transform(emb, x -> x::DOUBLE) AS e FROM t), "
        "m AS (SELECT id, e, list_min(e) AS lo, list_max(e) AS hi FROM b) "
        "SELECT id, list_transform(e, x -> CASE WHEN hi = lo THEN 0 ELSE "
        "CAST(floor((x - lo) * CAST(255 AS DOUBLE) / (hi - lo) "
        "+ CAST(0.5 AS DOUBLE)) AS INT) END) AS q FROM m ORDER BY id"
    ).fetchall()
    con.close()
    got = out.column("q").to_pylist()
    for i, (rid, codes) in enumerate(exp):
        assert got[rid] == codes, f"row {rid}"


def test_null_elements_rejected():
    t = pa.table({"id": [0], "emb": pa.array([[1.0, None]], pa.list_(pa.float64()))})
    with pytest.raises(ValueError, match="null list elements"):
        QuantizeEmbeddingTransformer(input_col="emb", output_col="q")\
            .transform_batch(t)
