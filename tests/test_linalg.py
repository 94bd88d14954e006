"""gram_moments / covariance_table / PCA — parity vs numpy and DuckDB."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from kamae_ray.stages.linalg import (
    PCAProjectEstimator,
    covariance_table,
    gram_moments,
)


def _emb_table(n=2000, d=16, seed=3):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, d)) @ rng.standard_normal((d, d)) * 0.5
    flat = pa.array(m.reshape(-1))
    offs = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32))
    return pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                     "embedding": pa.ListArray.from_arrays(offs, flat)}), m


def test_gram_moments_matches_numpy():
    t, m = _emb_table()
    g = gram_moments(t, "embedding")
    assert g["count"] == len(m)
    np.testing.assert_allclose(g["sum"], m.sum(axis=0), rtol=1e-12)
    np.testing.assert_allclose(g["sxx"], m.T @ m, rtol=1e-12)


def test_covariance_matches_duckdb():
    t, m = _emb_table(n=500, d=6)
    out = covariance_table(t, "embedding")
    got = {(r["i"], r["j"]): r["cov"] for r in out.to_pylist()}
    for i in range(1, 7):
        for j in range(i, 7):
            want = duckdb.query(
                f"SELECT covar_pop(embedding[{i}]::DOUBLE, embedding[{j}]::DOUBLE) FROM t"
            ).fetchone()[0]
            assert got[(i, j)] == pytest.approx(want, rel=1e-9), (i, j)


def test_covariance_matches_numpy_cov():
    t, m = _emb_table(n=800, d=5)
    out = covariance_table(t, "embedding")
    cov = np.cov(m.T, bias=True)
    for r in out.to_pylist():
        assert r["cov"] == pytest.approx(cov[r["i"] - 1, r["j"] - 1], rel=1e-9)


def test_gram_dataset_matches_table(ray_session):
    import ray

    t, _ = _emb_table(n=4000, d=12, seed=9)
    expect = gram_moments(t, "embedding")
    ds = ray.data.from_arrow(t).repartition(6)
    got = gram_moments(ds, "embedding")
    assert got["count"] == expect["count"]
    np.testing.assert_allclose(got["sxx"], expect["sxx"], rtol=1e-12)


def test_pca_matches_numpy():
    t, m = _emb_table(n=3000, d=10, seed=17)
    model = PCAProjectEstimator(input_col="embedding", output_col="pc", n_components=3).fit(t)
    out = model.transform(t)
    proj = np.asarray(out.column("pc").to_pylist())
    # numpy reference PCA
    c = m - m.mean(axis=0)
    w, v = np.linalg.eigh(np.cov(m.T, bias=True))
    order = np.argsort(w)[::-1][:3]
    comps = v[:, order].T
    flip = np.sign(comps[np.arange(3), np.abs(comps).argmax(axis=1)])
    ref = c @ (comps * flip[:, None]).T
    np.testing.assert_allclose(proj, ref, atol=1e-9)
    # top component captures the most variance
    assert proj[:, 0].var() >= proj[:, 1].var() >= proj[:, 2].var()


def test_pca_dataset_fit_and_transform(ray_session):
    import ray

    t, _ = _emb_table(n=2500, d=8, seed=23)
    expect_model = PCAProjectEstimator(input_col="embedding", output_col="pc", n_components=2).fit(t)
    ds = ray.data.from_arrow(t).repartition(5)
    model = PCAProjectEstimator(input_col="embedding", output_col="pc", n_components=2).fit(ds)
    np.testing.assert_allclose(model.components, expect_model.components, atol=1e-9)
    out = model.transform(ds)
    refs = [b for b in ray.get(out.to_arrow_refs()) if b.num_rows]
    got = pa.concat_tables(refs)
    assert got.num_rows == 2500 and len(got.column("pc")[0].as_py()) == 2


def test_gram_null_vectors_skipped_and_empty():
    t = pa.table({"embedding": pa.array([[1.0, 2.0], None, [3.0, 4.0]],
                                        pa.list_(pa.float64()))})
    g = gram_moments(t, "embedding")
    assert g["count"] == 2
    np.testing.assert_allclose(g["sum"], [4.0, 6.0])
    empty = pa.table({"embedding": pa.array([], pa.list_(pa.float64()))})
    assert gram_moments(empty, "embedding")["count"] == 0
    assert covariance_table(empty, "embedding").num_rows == 0


def test_linear_score_fixed_point(ray_session):
    """Exact int64 logit: quantize-floor then integer dot; Table == Dataset;
    overflow guard trips on oversized weights."""
    import ray

    from kamae_ray.stages.linalg import LinearScoreTransformer, default_linear_weights

    w = np.array([3, -2, 5], dtype=np.int64)
    t = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "v": pa.array([[0.5, -0.25, 1.0], [0.1, 0.2, -0.3]], pa.list_(pa.float32())),
    })
    tr = LinearScoreTransformer(input_col="v", output_col="logit", weights=w, bias=7, scale_bits=4)
    out = tr.transform_batch(t)
    x = np.asarray([np.asarray(r, np.float32) for r in t.column("v").to_pylist()], dtype=np.float64)
    exp = (np.floor(x * 16.0).astype(np.int64) @ w + 7).tolist()
    assert out.column("logit").to_pylist() == exp

    ds = ray.data.from_arrow(t).repartition(2)
    dout = tr.transform(ds)
    assert sorted((r["id"], r["logit"]) for r in dout.take_all()) == sorted(
        zip([1, 2], exp))

    dw, bias = default_linear_weights(64)
    assert len(dw) == 64 and np.abs(dw).max() < 2048 and bias == 12345
    # deterministic
    dw2, _ = default_linear_weights(64)
    assert (dw == dw2).all()

    with pytest.raises(ValueError):
        LinearScoreTransformer(input_col="v", output_col="l",
                               weights=np.full(64, 1 << 40), scale_bits=20)
    with pytest.raises(ValueError):
        tr.transform_batch(pa.table({"v": pa.array([[1.0]], pa.list_(pa.float32())), "id": [1]}))


def test_groupby_vector_mean(ray_session):
    """Centroids: fixed-point exactness, null vector/key handling, Table ==
    Dataset under any partitioning, float mode determinism, budget guard."""
    import ray

    from kamae_ray.stages.linalg import groupby_vector_mean

    t = pa.table({
        "g": pa.array(["a", "b", "a", None, "b", "a"], pa.string()),
        "v": pa.array([[1.0, 2.0], [3.0, -1.0], [2.0, 2.5], [9.0, 9.0], None, [0.5, 0.25]],
                      pa.list_(pa.float32())),
    })
    out = groupby_vector_mean(t, "g", "v", scale_bits=4)

    def q(x):
        return np.floor(np.float64(np.float32(x)) * 16.0)

    # group a: rows 0,2,5; b: row 1 (row 4 null vector skipped); None: row 3
    exp_a = [(q(1.0) + q(2.0) + q(0.5)) / 3.0 / 16.0, (q(2.0) + q(2.5) + q(0.25)) / 3.0 / 16.0]
    got = {r["g"]: (r["n"], r["centroid"]) for r in out.to_pylist()}
    assert got["a"] == (3, exp_a)
    assert got["b"] == (1, [q(3.0) / 16.0, q(-1.0) / 16.0])
    assert got[None][0] == 1  # null key forms its own group

    ds = ray.data.from_arrow(t).repartition(4)
    dout = groupby_vector_mean(ds, "g", "v", scale_bits=4)
    assert dout.to_pylist() == out.to_pylist()

    # float mode: deterministic across repeated runs
    f1 = groupby_vector_mean(ds, "g", "v", scale_bits=None)
    f2 = groupby_vector_mean(ds, "g", "v", scale_bits=None)
    assert f1.to_pylist() == f2.to_pylist()

    with pytest.raises(ValueError):
        groupby_vector_mean(t, "g", "v", max_partial_rows=1)


def test_groupby_vector_mean_all_null_keys():
    """Every key null -> one all-null group (regression: empty dictionary
    indexing crashed the fold)."""
    from kamae_ray.stages.linalg import groupby_vector_mean

    t = pa.table({"g": pa.array([None, None], pa.string()),
                  "v": pa.array([[1.0, 2.0], [3.0, 4.0]], pa.list_(pa.float32()))})
    out = groupby_vector_mean(t, "g", "v", scale_bits=4)
    assert out.num_rows == 1 and out.column("n").to_pylist() == [2]


def test_grouped_ols2_recovers_planted_coefficients(ray_session):
    import duckdb
    import ray

    from kamae_ray.stages.linalg import grouped_ols2, grouped_ols2_oracle_sql

    rng = np.random.default_rng(5)
    n = 6000
    g = rng.integers(0, 4, n)
    x1 = rng.integers(0, 50, n)
    x2 = rng.integers(0, 100, n)
    noise = rng.integers(-3, 4, n)
    y = 7 + 3 * x1 - 2 * x2 + noise
    t = pa.table({"g": pa.array(g, pa.int64()), "x1": pa.array(x1, pa.int64()),
                  "x2": pa.array(x2, pa.int64()), "y": pa.array(y, pa.int64())})
    want = grouped_ols2(t, "g", "x1", "x2", "y").sort_by("g")
    b1 = np.array(want.column("b1").to_pylist())
    b2 = np.array(want.column("b2").to_pylist())
    assert np.allclose(b1, 3.0, atol=0.05) and np.allclose(b2, -2.0, atol=0.05)
    con = duckdb.connect()
    con.register("src", t)
    exp = con.sql(grouped_ols2_oracle_sql("src", "g", "x1", "x2", "y")
                  + " ORDER BY g").arrow()
    for c in ("b0", "b1", "b2"):
        ga = np.asarray(want.column(c).to_numpy(zero_copy_only=False))
        ea = np.asarray(exp.column(c).to_numpy(zero_copy_only=False))
        assert (ga.view(np.int64) == ea.view(np.int64)).all()
    ds = ray.data.from_arrow(t).repartition(6)
    got = pa.concat_tables(
        [pa.table(x) for x in grouped_ols2(ds, "g", "x1", "x2", "y")
         .iter_batches(batch_format="pyarrow")]
    ).sort_by("g")
    assert got.cast(want.schema).equals(want)
    # singular group (constant features) -> null betas
    s = pa.table({"g": pa.array([9, 9, 9], pa.int64()),
                  "x1": pa.array([1, 1, 1], pa.int64()),
                  "x2": pa.array([2, 2, 2], pa.int64()),
                  "y": pa.array([5, 6, 7], pa.int64())})
    sing = grouped_ols2(s, "g", "x1", "x2", "y")
    assert sing.column("b1").null_count == 1
