import numpy as np
import pyarrow as pa
import pytest

from kamae_ray.pipelines import Pipeline, PipelineModel
from kamae_ray.pipelines.pipeline import topo_sort
from kamae_ray.stages import (
    LogTransformer,
    StandardScaleEstimator,
    StringIndexEstimator,
    SumTransformer,
)
from kamae_ray.state.checkpoint import ResumableRunner, op_chain_hash


def test_topo_sort_orders_producers_first(scalar_mixed):
    a = LogTransformer(input_col="col1", output_col="lg")
    b = SumTransformer(input_col="lg", constant=1.0, output_col="lg1")
    ordered = topo_sort([b, a])
    assert ordered[0] is a


def test_selective_fit_runs_needed_transformers(scalar_mixed):
    # estimator consumes the OUTPUT of a transformer -> transformer must run at fit
    pipe = Pipeline([
        LogTransformer(input_col="col1", output_col="lg"),
        StandardScaleEstimator(input_col="lg", output_col="lgs"),
    ])
    pm = pipe.fit(scalar_mixed)
    vals = np.log([1.0, 4.0, 7.0])
    fitted = [s for s in pm.stages if hasattr(s, "mean")][0]
    assert fitted.mean == pytest.approx([vals.mean()])
    out = pm.transform(scalar_mixed)
    assert out.column("lgs").to_pylist() == pytest.approx(((vals - vals.mean()) / vals.std()).tolist())


def test_nested_pipeline_flattening(scalar_mixed):
    inner = Pipeline([LogTransformer(input_col="col1", output_col="lg")])
    outer = Pipeline([inner, SumTransformer(input_col="lg", constant=1.0, output_col="lg1")])
    assert len(outer.stages) == 2
    pm = outer.fit(scalar_mixed)
    out = pm.transform(scalar_mixed)
    assert "lg1" in out.column_names


def test_pipeline_model_roundtrip(tmp_path, scalar_mixed):
    pipe = Pipeline([
        LogTransformer(input_col="col1", output_col="lg"),
        StandardScaleEstimator(input_col="col1", output_col="cs"),
        StringIndexEstimator(input_col="col4", output_col="ci"),
    ])
    pm = pipe.fit(scalar_mixed)
    path = str(tmp_path / "model")
    pm.save(path)
    pm2 = PipelineModel.load(path)
    a = pm.transform(scalar_mixed)
    b = pm2.transform(scalar_mixed)
    assert a.equals(b)


def test_unfitted_pipeline_roundtrip(tmp_path, scalar_mixed):
    pipe = Pipeline([LogTransformer(input_col="col1", alpha=2.0, output_col="lg")])
    path = str(tmp_path / "pipe")
    pipe.save(path)
    pipe2 = Pipeline.load(path)
    assert pipe2.fit(scalar_mixed).transform(scalar_mixed).column("lg").to_pylist() == pytest.approx(
        np.log([3.0, 6.0, 9.0]).tolist()
    )


def test_schema_not_mutated(scalar_mixed):
    pm = PipelineModel([LogTransformer(input_col="col1", output_col="lg")])
    out = pm.transform(scalar_mixed)
    assert out.column_names[: len(scalar_mixed.column_names)] == scalar_mixed.column_names


def test_resumable_runner(tmp_path, scalar_mixed):
    import pyarrow.parquet as pq

    files = []
    for i in range(3):
        f = str(tmp_path / f"in-{i}.parquet")
        pq.write_table(scalar_mixed, f)
        files.append(f)

    pm = PipelineModel([LogTransformer(input_col="col1", output_col="lg")])
    h = op_chain_hash(pm)
    outdir = str(tmp_path / "out")

    calls = []

    def partition_fn(fs):
        calls.append(fs)
        return pm.transform(pq.read_table(fs[0]))

    runner = ResumableRunner(outdir, h)
    recs = runner.run(files, partition_fn)
    assert all(not r["skipped"] for r in recs)
    assert len(calls) == 3

    # resume: nothing recomputed
    calls.clear()
    recs2 = ResumableRunner(outdir, h).run(files, partition_fn)
    assert all(r["skipped"] for r in recs2)
    assert calls == []

    # kill-mid-run simulation: delete one partition's lineage -> only it reruns
    import os

    os.remove(os.path.join(outdir, "lineage-00001.json"))
    recs3 = ResumableRunner(outdir, h).run(files, partition_fn)
    assert [r["skipped"] for r in recs3] == [True, False, True]
    assert len(calls) == 1

    # op change invalidates everything
    pm2 = PipelineModel([LogTransformer(input_col="col1", alpha=1.0, output_col="lg")])
    h2 = op_chain_hash(pm2)
    assert h2 != h
    calls.clear()
    recs4 = ResumableRunner(outdir, h2).run(files, partition_fn)
    assert all(not r["skipped"] for r in recs4)


def test_resumable_runner_parallel(tmp_path, scalar_mixed, ray_session):
    import pyarrow.parquet as pq

    files = []
    for i in range(4):
        f = str(tmp_path / f"in-{i}.parquet")
        pq.write_table(scalar_mixed, f)
        files.append(f)

    pm = PipelineModel([LogTransformer(input_col="col1", output_col="lg")])
    h = op_chain_hash(pm)
    outdir = str(tmp_path / "out")

    def partition_fn(fs):
        return pm.transform(pq.read_table(fs[0]))

    recs = ResumableRunner(outdir, h).run_parallel(files, partition_fn, max_in_flight=2)
    assert [r["partition"] for r in recs] == [0, 1, 2, 3]
    assert all(not r["skipped"] for r in recs)
    assert all(r["rows"] == scalar_mixed.num_rows for r in recs)

    # resume after simulated crash (one lineage lost): only that one reruns
    import os

    os.remove(os.path.join(outdir, "lineage-00002.json"))
    recs2 = ResumableRunner(outdir, h).run_parallel(files, partition_fn)
    assert [r["skipped"] for r in recs2] == [True, True, False, True]

    # outputs identical to the sequential path
    seq_dir = str(tmp_path / "seq")
    ResumableRunner(seq_dir, h).run(files, partition_fn)
    for i in range(4):
        a = pq.read_table(os.path.join(outdir, f"part-{i:05d}.parquet"))
        b = pq.read_table(os.path.join(seq_dir, f"part-{i:05d}.parquet"))
        assert a.equals(b)


def test_window_listwise_stage_persistence(tmp_path):
    import pyarrow as pa

    from kamae_ray.stages import LagTransformer, ListMeanTransformer, SessionizeTransformer

    t = pa.table({"u": [1, 1, 2], "ts": [1, 2, 1], "v": [1.0, 2.0, 3.0]})
    pm = PipelineModel([
        LagTransformer(input_col="v", entity_cols=["u"], time_col="ts", output_col="lag_v"),
        SessionizeTransformer(entity_cols=["u"], time_col="ts", gap=10, output_col="sid"),
        ListMeanTransformer(input_col="v", query_id_col="u", output_col="mean_v"),
    ])
    path = str(tmp_path / "wmodel")
    pm.save(path)
    pm2 = PipelineModel.load(path)
    assert pm.transform(t).equals(pm2.transform(t))


def test_sample_fraction_fit(scalar_mixed, ray_session):
    est = StandardScaleEstimator(input_col="col1", output_col="o", sample_fraction=0.5)
    # sampled fits FUSE (Pipeline groups by fraction); no more per-estimator pass
    assert est.fit_spec() == ("moments", ("col1", None))
    m = est.fit(scalar_mixed)  # table path ignores sampling; still fits
    assert len(m.mean) == 1

    # Dataset path: fused (pipeline) fit == standalone fit (same seeded sample)
    import ray

    rng = np.random.RandomState(3)
    big = pa.table({"col1": rng.standard_normal(5000)})
    ds = ray.data.from_arrow(big).repartition(8)
    solo = StandardScaleEstimator(input_col="col1", output_col="o", sample_fraction=0.5).fit(ds)
    piped = Pipeline(
        [StandardScaleEstimator(input_col="col1", output_col="o", sample_fraction=0.5)]
    ).fit(ds).stages[0]
    assert solo.mean == piped.mean and solo.stddev == piped.stddev
    # sanity: sampling actually sampled (mean close to, not identical to, full)
    full = StandardScaleEstimator(input_col="col1", output_col="o").fit(ds)
    assert solo.mean != full.mean


def test_current_time_ops_pinned():
    import pyarrow as pa

    from kamae_ray.stages import (
        CurrentDateTimeTransformer,
        CurrentDateTransformer,
        CurrentUnixTimestampTransformer,
    )

    t = pa.table({"x": [1, 2]})
    pin = "2021-06-15 12:30:00.000"
    assert CurrentDateTransformer(pinned_datetime=pin, output_col="o").transform_batch(t).column("o").to_pylist() == ["2021-06-15"] * 2
    assert CurrentDateTimeTransformer(pinned_datetime=pin, output_col="o").transform_batch(t).column("o").to_pylist() == [pin] * 2
    out = CurrentUnixTimestampTransformer(pinned_datetime=pin, unit="s", output_col="o").transform_batch(t)
    assert out.column("o").to_pylist() == [1623760200.0] * 2


def test_lazy_cache_transformers_survive_load(tmp_path):
    """_load_stages rebuilds via __new__ + params: private lazy caches
    (popped from get_params) must be getattr-guarded — a bare
    ``self._cached is None`` raises AttributeError after load (found on
    RareLabel; TargetEncode/CountEncode had the same latent bug)."""
    import numpy as np
    import pyarrow as pa

    from kamae_ray.pipelines import Pipeline, PipelineModel
    from kamae_ray.stages import (
        CountEncodeEstimator,
        FeatureCrossTransformer,
        GroupedImputeEstimator,
        GroupedQuantileBucketizeEstimator,
        LooTargetEncodeEstimator,
        RareLabelEncoderEstimator,
        TargetEncodeEstimator,
        WoeEncodeEstimator,
    )

    rng = np.random.default_rng(1)
    t = pa.table({
        "a": rng.choice(["x", "y", "z", "w"], 400).tolist(),
        "b": rng.choice(["p", "q"], 400).tolist(),
        "v": pa.array([None if rng.random() < 0.1 else float(x)
                       for x in rng.standard_normal(400)], pa.float64()),
        "y": pa.array(rng.integers(0, 2, 400), pa.int64()),
    })
    pipe = Pipeline([
        FeatureCrossTransformer(input_cols=["a", "b"], output_col="cross", num_bins=50),
        RareLabelEncoderEstimator(input_col="a", output_col="a_cap", min_freq=1, max_categories=2),
        WoeEncodeEstimator(input_col="b", target_col="y", output_col="b_woe"),
        LooTargetEncodeEstimator(input_col="a", target_col="y", output_col="a_loo"),
        TargetEncodeEstimator(input_col="a", target_col="y", output_col="a_te", smoothing=1.0),
        CountEncodeEstimator(input_col="a", output_col="a_cnt"),
        GroupedImputeEstimator(input_col="v", group_col="b", output_col="v_fill"),
        GroupedQuantileBucketizeEstimator(input_col="v", group_col="b", output_col="v_bkt",
                                          num_buckets=4, boundary_decimals=6),
    ])
    pm = pipe.fit(t)
    out1 = pm.transform(t)
    path = str(tmp_path / "pm")
    pm.save(path)
    out2 = PipelineModel.load(path).transform(t)
    assert out1.equals(out2)


def test_session6_stages_roundtrip_and_transform_after_load(tmp_path):
    """Lesson-41 class: every stage must transform correctly after a
    __new__-based load (no lazily-built private attrs assumed present)."""
    from kamae_ray.pipelines import PipelineModel
    from kamae_ray.stages import (
        Base64DecodeTransformer,
        Base64EncodeTransformer,
        BitHammingTransformer,
        EditDistanceTransformer,
        HexEncodeTransformer,
        SoundexTransformer,
    )

    t = pa.table({
        "a": pa.array(["Robert", "crème", None, ""], pa.string()),
        "b": pa.array(["Rupert", "creme", "x", "y"], pa.string()),
        "h1": pa.array([5, -1, 0, 2**62], pa.int64()),
        "h2": pa.array([3, -1, -1, 0], pa.int64()),
    })
    pm = PipelineModel([
        EditDistanceTransformer(input_cols=["a", "b"], output_col="dl", mode="damerau"),
        EditDistanceTransformer(input_cols=["a", "b"], output_col="jw",
                                mode="jaro_winkler", max_len=32),
        SoundexTransformer(input_col="a", output_col="sdx"),
        Base64EncodeTransformer(input_col="a", output_col="b64"),
        Base64DecodeTransformer(input_col="b64", output_col="raw"),
        HexEncodeTransformer(input_col="b", output_col="hx"),
        BitHammingTransformer(input_cols=["h1", "h2"], output_col="bits"),
    ])
    want = pm.transform(t)
    path = str(tmp_path / "pm")
    pm.save(path)
    loaded = PipelineModel.load(path)
    got = loaded.transform(t)
    assert got.equals(want)
    # mode/max_len params survived the round trip
    assert loaded.stages[1].mode == "jaro_winkler" and loaded.stages[1].max_len == 32
