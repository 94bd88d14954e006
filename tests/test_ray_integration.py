"""End-to-end integration over ray.data.Dataset (session-scoped ray fixture)."""

import numpy as np
import pyarrow as pa
import pytest

from kamae_ray.pipelines import Pipeline
from kamae_ray.sources.synth import make_tokens_table, tokens_table_path
from kamae_ray.stages import (
    ArrayCropTransformer,
    HashIndexTransformer,
    LagTransformer,
    ListMeanTransformer,
    LogTransformer,
    SessionizeTransformer,
    StandardScaleEstimator,
    StringIndexEstimator,
    asof_join,
)

SF = "/root/testdata/sf0.001"


def test_fit_transform_matches_table_path(ray_session, scalar_mixed):
    ray = ray_session
    ds = ray.data.from_arrow(scalar_mixed)
    pipe = Pipeline([
        LogTransformer(input_col="col1", alpha=1.0, output_col="lg"),
        StandardScaleEstimator(input_col="col1", output_col="cs"),
        StringIndexEstimator(input_col="col4", output_col="ci"),
    ])
    pm_ds = pipe.fit(ds)
    pm_tb = pipe.fit(scalar_mixed)
    a = pm_ds.transform(ds).to_pandas().sort_values("col1").reset_index(drop=True)
    b = pa.Table.to_pandas(pm_tb.transform(scalar_mixed)).sort_values("col1").reset_index(drop=True)
    assert np.allclose(a["cs"], b["cs"])
    assert (a["ci"] == b["ci"]).all()


def test_tokens_pipeline_end_to_end(ray_session, tmp_path):
    ray = ray_session
    path = tokens_table_path(2000)
    ds = ray.data.read_parquet(path)
    pipe = Pipeline([
        ArrayCropTransformer(input_col="tokens", array_length=32, pad_value=-1, output_col="tokens_32"),
        LogTransformer(input_col="n_tok", output_col="log_n_tok"),
        StandardScaleEstimator(input_col="n_tok", output_col="n_tok_std"),
        StringIndexEstimator(input_col="source", output_col="source_idx"),
        HashIndexTransformer(input_col="doc_id", num_bins=1024, output_col="doc_bucket"),
    ])
    pm = pipe.fit(ds)
    out = pm.transform(ds)
    out.write_parquet(str(tmp_path / "out"))
    back = ray.data.read_parquet(str(tmp_path / "out"))
    assert back.count() == 2000
    row = back.take(1)[0]
    assert len(row["tokens_32"]) == 32
    assert row["source_idx"] >= 1


def test_window_ops_on_dataset_match_table(ray_session):
    ray = ray_session
    t = make_tokens_table(3000)
    ds = ray.data.from_arrow(t)
    lag = LagTransformer(input_col="n_tok", entity_cols=["source", "doc_id"], time_col="position", output_col="prev_n")
    sess = SessionizeTransformer(entity_cols=["source", "doc_id"], time_col="position", gap=1.5, output_col="sid")
    got = sess.transform(lag.transform(ds)).to_pandas()
    want = sess.transform_batch(lag.transform_batch(t)).to_pandas()
    key = ["source", "doc_id", "position"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert np.allclose(got["prev_n"].fillna(-1), want["prev_n"].fillna(-1))
    assert (got["sid"] == want["sid"]).all()


def test_asof_dataset_matches_table(ray_session):
    ray = ray_session
    rng = np.random.RandomState(3)
    left = pa.table({
        "u": rng.randint(0, 20, 200),
        "t": rng.randint(0, 1000, 200),
        "x": rng.rand(200),
    })
    right = pa.table({
        "u": rng.randint(0, 20, 150),
        "t": rng.randint(0, 1000, 150),
        "p": rng.rand(150),
    })
    want = asof_join(left, right, by=["u"], left_on="t").to_pandas().sort_values(["u", "t", "x"]).reset_index(drop=True)
    got = (
        asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right), by=["u"], left_on="t")
        .to_pandas()
        .sort_values(["u", "t", "x"])
        .reset_index(drop=True)
    )
    assert np.allclose(got["p"].fillna(-1), want["p"].fillna(-1))


def test_listwise_dataset_matches_table(ray_session, ):
    ray = ray_session
    rng = np.random.RandomState(4)
    t = pa.table({"q": rng.randint(0, 30, 500), "v": rng.rand(500)})
    lw = ListMeanTransformer(input_col="v", query_id_col="q", output_col="m")
    got = lw.transform(ray.data.from_arrow(t)).to_pandas().sort_values(["q", "v"]).reset_index(drop=True)
    want = lw.transform(t).to_pandas().sort_values(["q", "v"]).reset_index(drop=True)
    assert np.allclose(got["m"], want["m"])


def test_asof_strict_tolerance_dataset_matches_table(ray_session):
    ray = ray_session
    rng = np.random.RandomState(11)
    left = pa.table({"u": rng.randint(0, 10, 120), "t": rng.randint(0, 500, 120), "x": rng.rand(120)})
    right = pa.table({"u": rng.randint(0, 10, 90), "t": rng.randint(0, 500, 90), "p": rng.rand(90)})
    for kwargs in ({"strict": True}, {"tolerance": 40}, {"strict": True, "tolerance": 25}):
        want = (
            asof_join(left, right, by=["u"], left_on="t", **kwargs)
            .to_pandas().sort_values(["u", "t", "x"]).reset_index(drop=True)
        )
        got = (
            asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right), by=["u"], left_on="t", **kwargs)
            .to_pandas().sort_values(["u", "t", "x"]).reset_index(drop=True)
        )
        assert np.allclose(got["p"].fillna(-1), want["p"].fillna(-1)), kwargs
