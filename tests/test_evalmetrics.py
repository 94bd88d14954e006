"""Evaluation-metrics family (stages/evalmetrics.py): ranking metrics,
confusion matrices, two-sample KS, lift tables — table-vs-Dataset parity,
the KS driver-vs-distributed fallback twin, and the exactness edge cases
(zero-relevance queries, empty sides, all-one-class groups)."""

import numpy as np
import pyarrow as pa
import pytest

from kamae_ray.stages.evalmetrics import (
    confusion_by_group,
    ks_statistic,
    lift_table,
    ranking_metrics,
)


def _collect(obj) -> pa.Table:
    if isinstance(obj, pa.Table):
        return obj
    return pa.concat_tables(
        [pa.table(b) for b in obj.iter_batches(batch_format="pyarrow")])


@pytest.fixture(scope="module")
def eval_data():
    rng = np.random.default_rng(42)
    n = 6000
    return pa.table({
        "q": pa.array(rng.integers(0, 250, n)),
        "ts": pa.array(rng.integers(0, 10**9, n)),
        "eid": pa.array(np.arange(n, dtype=np.int64)),
        "rel": pa.array((rng.random(n) < 0.25).astype(np.int64)
                        * rng.integers(1, 4, n)),
        "s": pa.array(rng.integers(0, 1000, n)),
        "y": pa.array((rng.random(n) < 0.35).astype(np.int64)),
        "g": pa.array(rng.choice(["a", "b", "c"], n)),
    })


def test_ranking_metrics_table_vs_dataset(ray_session, eval_data):
    import ray

    t = ranking_metrics(eval_data, "q", ["ts", "eid"], "rel", k=10).sort_by("q")
    d = _collect(ranking_metrics(ray.data.from_arrow(eval_data), "q",
                                 ["ts", "eid"], "rel", k=10)).sort_by("q")
    assert t.schema == d.schema
    for c in t.column_names:
        a = t.column(c).to_numpy(zero_copy_only=False)
        b = d.column(c).to_numpy(zero_copy_only=False)
        if a.dtype.kind == "f":
            na = np.isnan(a.astype(float))
            assert (na == np.isnan(b.astype(float))).all()
            assert (a[~na] == b[~na]).all(), c  # bit-identical, not approx
        else:
            assert (a == b).all(), c


def test_ranking_metrics_hand_case():
    # one query: ranks 1..4, rel (0, 2, 0, 1)
    t = pa.table({"q": [1, 1, 1, 1], "o": [10, 20, 30, 40],
                  "rel": [0, 2, 0, 1]})
    out = ranking_metrics(t, "q", ["o"], "rel", k=3)
    assert out.num_rows == 1
    r = out.to_pylist()[0]
    assert r["n"] == 4 and r["total_rel"] == 2 and r["hits_k"] == 1
    assert r["prec_k"] == 1 / 3 and r["recall_k"] == 0.5 and r["rr_k"] == 0.5
    ln = np.log  # plain log fine for a tolerance check
    dcg = 2 * (ln(2) / ln(3))
    idcg = 2 * (ln(2) / ln(2)) + 1 * (ln(2) / ln(3))
    assert abs(r["dcg_k"] - dcg) < 1e-12
    assert abs(r["idcg_k"] - idcg) < 1e-12
    assert abs(r["ndcg_k"] - dcg / idcg) < 1e-12


def test_ranking_metrics_zero_relevance_query():
    t = pa.table({"q": [7, 7, 8], "o": [1, 2, 1], "rel": [0, 0, 2]})
    out = ranking_metrics(t, "q", ["o"], "rel", k=5).sort_by("q")
    rows = out.to_pylist()
    assert rows[0]["rr_k"] == 0.0            # MRR convention: 0, not null
    assert rows[0]["recall_k"] is None       # no relevant items -> null
    assert rows[0]["ndcg_k"] is None         # idcg = 0 -> null
    assert rows[1]["ndcg_k"] == 1.0


def test_ranking_metrics_rejects_negative_rel():
    t = pa.table({"q": [1], "o": [1], "rel": [-1]})
    with pytest.raises(ValueError, match="relevance"):
        ranking_metrics(t, "q", ["o"], "rel")


def test_confusion_by_group_exact(eval_data):
    out = confusion_by_group(eval_data, "g", "s", "y", 500).sort_by("g")
    import pandas as pd

    df = eval_data.to_pandas()
    for row in out.to_pylist():
        sub = df[df.g == row["g"]]
        pred = sub.s >= 500
        assert row["tp"] == int((pred & (sub.y == 1)).sum())
        assert row["fp"] == int((pred & (sub.y == 0)).sum())
        assert row["fn"] == int((~pred & (sub.y == 1)).sum())
        assert row["tn"] == int((~pred & (sub.y == 0)).sum())
        assert row["f1"] == (2 * row["tp"]) / (2 * row["tp"] + row["fp"] + row["fn"])
    assert isinstance(df, pd.DataFrame)


def test_confusion_one_class_group_nulls():
    # a group with no positive predictions -> precision null, recall defined
    t = pa.table({"g": ["x", "x"], "s": [1, 2], "y": [1, 0]})
    out = confusion_by_group(t, "g", "s", "y", 100)
    r = out.to_pylist()[0]
    assert r["tp"] == 0 and r["fp"] == 0 and r["precision"] is None
    assert r["recall"] == 0.0 and r["f1"] == 0.0


def test_ks_statistic_matches_scipy_form(eval_data):
    out = ks_statistic(eval_data, "s", "g", "a", "b")
    r = out.to_pylist()[0]
    df = eval_data.to_pandas()
    xa = np.sort(df[df.g == "a"].s.to_numpy())
    xb = np.sort(df[df.g == "b"].s.to_numpy())
    grid = np.unique(np.concatenate([xa, xb]))
    fa = np.searchsorted(xa, grid, side="right") / len(xa)
    fb = np.searchsorted(xb, grid, side="right") / len(xb)
    assert abs(r["ks"] - np.abs(fa - fb).max()) < 1e-12
    assert r["n_a"] == len(xa) and r["n_b"] == len(xb)


def test_ks_driver_vs_distributed_twin(ray_session, eval_data):
    import ray

    ds = ray.data.from_arrow(eval_data)
    a = ks_statistic(ds, "s", "g", "a", "b", driver_budget=5_000_000)
    b = ks_statistic(ds, "s", "g", "a", "b", driver_budget=0)  # force packed path
    assert a.to_pylist() == b.to_pylist()
    c = ks_statistic(eval_data, "s", "g", "a", "b")
    assert a.to_pylist() == c.to_pylist()


def test_ks_distributed_negative_values(ray_session):
    # negative integer values exercise global_cumsum's negative bucket ids
    import ray

    rng = np.random.default_rng(13)
    t = pa.table({
        "g": pa.array(rng.choice(["a", "b"], 4000)),
        "s": pa.array(rng.integers(-5000, 5000, 4000)),
    })
    ds = ray.data.from_arrow(t)
    a = ks_statistic(ds, "s", "g", "a", "b", driver_budget=0)
    b = ks_statistic(t, "s", "g", "a", "b")
    assert a.to_pylist() == b.to_pylist()


def test_ks_empty_side():
    t = pa.table({"g": ["a", "a"], "s": [1, 2]})
    r = ks_statistic(t, "s", "g", "a", "b").to_pylist()[0]
    assert r["n_b"] == 0 and r["d_num"] == 0 and np.isnan(r["ks"])


def test_lift_table_exact(eval_data):
    out = lift_table(eval_data, "s", "y", bins=10, max_score=1000)
    df = eval_data.to_pandas()
    total_n, total_pos = len(df), int(df.y.sum())
    rows = out.to_pylist()
    assert [r["bucket"] for r in rows] == sorted([r["bucket"] for r in rows],
                                                 reverse=True)
    assert rows[-1]["cum_n"] == total_n and rows[-1]["cum_pos"] == total_pos
    assert rows[-1]["gain"] == 1.0
    for r in rows:
        assert r["lift"] == (r["cum_pos"] * total_n) / (r["cum_n"] * total_pos)


def test_lift_table_rejects_out_of_range():
    t = pa.table({"s": [5000], "y": [1]})
    with pytest.raises(ValueError, match="outside"):
        lift_table(t, "s", "y", bins=10, max_score=1000)


def test_ab_test_chi2_hand_case():
    from kamae_ray.stages.evalmetrics import ab_test_chi2

    # a=30/100 control, c=40/100 variant; chi2 = N(ad-bc)^2 / margins
    rows = ([("e", 0, 1)] * 30 + [("e", 0, 0)] * 70
            + [("e", 1, 1)] * 40 + [("e", 1, 0)] * 60)
    t = pa.table({"e": [r[0] for r in rows], "v": [r[1] for r in rows],
                  "y": [r[2] for r in rows]})
    r = ab_test_chi2(t, "e", "v", "y").to_pylist()[0]
    assert (r["n_control"], r["n_variant"]) == (100, 100)
    assert (r["success_control"], r["success_variant"]) == (30, 40)
    a, b, c, d = 30, 70, 40, 60
    exp = 200 * (a * d - b * c) ** 2 / ((a + b) * (c + d) * (a + c) * (b + d))
    assert abs(r["chi2"] - exp) < 1e-12
    assert r["rate_control"] == 0.3 and r["rate_variant"] == 0.4


def test_ab_test_chi2_degenerate_margin_null():
    from kamae_ray.stages.evalmetrics import ab_test_chi2

    # all successes -> a failure margin of 0 -> chi2 null
    t = pa.table({"e": ["x", "x"], "v": [0, 1], "y": [1, 1]})
    assert ab_test_chi2(t, "e", "v", "y").to_pylist()[0]["chi2"] is None


def test_trimmed_mean_matches_numpy(ray_session, eval_data):
    import ray

    from kamae_ray.stages.evalmetrics import trimmed_mean_by_group

    t = trimmed_mean_by_group(eval_data, "g", "s", trim_ppm=100_000).sort_by("g")
    df = eval_data.to_pandas()
    for row in t.to_pylist():
        v = np.sort(df[df.g == row["g"]].s.to_numpy().astype(np.int64))
        k = len(v) * 100_000 // 1_000_000
        surv = v[k:len(v) - k]
        assert row["n_used"] == len(surv)
        assert row["trimmed_sum"] == int(surv.sum())
        assert row["trimmed_mean"] == surv.sum() / len(surv)
    d = _collect(trimmed_mean_by_group(ray.data.from_arrow(eval_data),
                                       "g", "s", trim_ppm=100_000)).sort_by("g")
    assert t.equals(d.select(t.column_names))


def test_trimmed_mean_zero_trim_is_mean():
    from kamae_ray.stages.evalmetrics import trimmed_mean_by_group

    t = pa.table({"g": ["a"] * 4, "v": [1, 2, 3, 10]})
    r = trimmed_mean_by_group(t, "g", "v", trim_ppm=0).to_pylist()[0]
    assert r["trimmed_mean"] == 4.0 and r["n_used"] == 4


def test_cyclical_encode_roundtrip(tmp_path):
    import numpy as np

    from kamae_ray.pipelines import PipelineModel
    from kamae_ray.stages import CyclicalEncodeTransformer

    t = pa.table({"h": pa.array([0.0, 6.0, 12.0, 18.0, None], pa.float64())})
    tr = CyclicalEncodeTransformer(input_col="h", output_col="hod", period=24)
    out = tr.transform(t)
    assert out.column("hod_sin")[0].as_py() == 0.0
    assert out.column("hod_cos")[0].as_py() == 1.0
    assert abs(out.column("hod_sin")[1].as_py() - 1.0) < 1e-15
    assert out.column("hod_sin")[4].as_py() is None
    # boundary adjacency: 23h is close to 0h in (sin, cos) space
    t2 = pa.table({"h": pa.array([23.0, 0.0], pa.float64())})
    o2 = tr.transform(t2)
    d = np.hypot(o2.column("hod_sin")[0].as_py() - o2.column("hod_sin")[1].as_py(),
                 o2.column("hod_cos")[0].as_py() - o2.column("hod_cos")[1].as_py())
    assert d < 0.3
    # lesson-41 contract: save/load then transform works and matches
    pm = PipelineModel([tr])
    pm.save(str(tmp_path / "cyc"))
    pm2 = PipelineModel.load(str(tmp_path / "cyc"))
    assert pm2.transform(t).equals(out)


def test_cyclical_rejects_bad_period():
    from kamae_ray.stages import CyclicalEncodeTransformer

    with pytest.raises(ValueError, match="period"):
        CyclicalEncodeTransformer(input_col="h", output_col="o", period=0)


def test_ranking_metrics_ap_hand_case():
    # rel at ranks 1..5: (1, 0, 1, 0, 1); k=5; total_rel=3
    t = pa.table({"q": [1] * 5, "o": list(range(5)),
                  "rel": [1, 0, 1, 0, 1]})
    r = ranking_metrics(t, "q", ["o"], "rel", k=5).to_pylist()[0]
    # AP@5 = (1/1 + 2/3 + 3/5) / min(3, 5)
    assert r["ap_k"] == (1 / 1 + 2 / 3 + 3 / 5) / 3
    # k truncation: same rels, k=2 -> (1/1) / min(3, 2)
    r2 = ranking_metrics(t, "q", ["o"], "rel", k=2).to_pylist()[0]
    assert r2["ap_k"] == 1.0 / 2
    # zero-relevance query -> null
    t0 = pa.table({"q": [9, 9], "o": [1, 2], "rel": [0, 0]})
    assert ranking_metrics(t0, "q", ["o"], "rel", k=3).to_pylist()[0]["ap_k"] is None
    # graded relevance counts as binary for AP (rel>0)
    tg = pa.table({"q": [1, 1], "o": [1, 2], "rel": [3, 2]})
    assert ranking_metrics(tg, "q", ["o"], "rel", k=2).to_pylist()[0]["ap_k"] == \
        (1 / 1 + 2 / 2) / 2


def test_logloss_by_group(ray_session):
    import math

    import ray

    from kamae_ray.stages.evalmetrics import logloss_by_group

    # logits quantized at 2^4: z = q/16
    t = pa.table({"g": ["a", "a", "b", "b"],
                  "logit": [32, -16, 0, 48],
                  "y": [1, 0, 1, 0]})
    out = logloss_by_group(t, "g", "logit", "y", logit_scale_bits=4)
    rows = {r["g"]: r for r in out.to_pylist()}

    def mu(z, y):
        s = 1.0 / (1.0 + math.exp(-z))
        term = -math.log(s) if y == 1 else -math.log(1.0 - s)
        return math.floor(term * 1e6 + 0.5)

    ea = mu(2.0, 1) + mu(-1.0, 0)
    eb = mu(0.0, 1) + mu(3.0, 0)
    assert rows["a"]["ll_sum_ppm"] == ea and rows["a"]["n"] == 2
    assert rows["b"]["ll_sum_ppm"] == eb
    assert rows["a"]["mean_logloss"] == (ea / 2) / 1e6
    # dataset path identical
    ds = ray.data.from_arrow(t).repartition(2)
    got = {r["g"]: r["ll_sum_ppm"]
           for r in logloss_by_group(ds, "g", "logit", "y", 4).take_all()}
    assert got == {"a": ea, "b": eb}
    # label and |z| guards
    with pytest.raises(ValueError, match="0/1"):
        logloss_by_group(pa.table({"g": ["a"], "logit": [1], "y": [2]}),
                         "g", "logit", "y", 4)
    with pytest.raises(ValueError, match="z"):
        logloss_by_group(pa.table({"g": ["a"], "logit": [600], "y": [1]}),
                         "g", "logit", "y", 4)


def test_km_curve(ray_session):
    import math

    import ray

    from kamae_ray.stages.evalmetrics import km_curve

    # classic hand case: times 1,2,2,3(c),4 in one group
    t = pa.table({"g": ["x"] * 5,
                  "t": [1, 2, 2, 3, 4],
                  "e": [1, 1, 1, 0, 1]})
    out = km_curve(t, "g", "t", "e")
    rows = {r["t"]: r for r in out.to_pylist()}
    # t=1: n=5 d=1 -> S=4/5; t=2: n=4 d=2 -> S=4/5*2/4; t=3 censored: S holds
    assert rows[1]["n"] == 5 and rows[1]["d"] == 1
    assert rows[2]["n"] == 4 and rows[2]["d"] == 2
    assert rows[3]["n"] == 2 and rows[3]["d"] == 0 and rows[3]["c"] == 1

    def mu(frac):
        return math.floor(1e6 * math.log(frac) + 0.5) if math.log(frac) >= 0 \
            else -math.floor(-1e6 * math.log(frac) + 0.5)

    m1 = mu(4 / 5)
    m2 = m1 + mu(2 / 4)
    assert rows[1]["km_logmu"] == m1
    assert rows[2]["km_logmu"] == m2 == rows[3]["km_logmu"]
    assert abs(rows[2]["survival"] - math.exp(m2 / 1e6)) < 1e-12
    # µ-precision tracks the true product within 1e-5
    assert abs(rows[2]["survival"] - 0.4) < 1e-5
    # absorption: last at-risk row dies -> survival exactly 0, logmu null
    assert rows[4]["n"] == 1 and rows[4]["d"] == 1
    assert rows[4]["survival"] == 0.0 and rows[4]["km_logmu"] is None
    # dataset path identical
    ds = ray.data.from_arrow(t).repartition(2)
    got = sorted((r["t"], r["n"], r["survival"])
                 for r in km_curve(ds, "g", "t", "e").take_all())
    exp = sorted((r["t"], r["n"], r["survival"]) for r in out.to_pylist())
    assert got == exp
    # validation
    with pytest.raises(ValueError, match="0/1"):
        km_curve(pa.table({"g": ["a"], "t": [1], "e": [3]}), "g", "t", "e")


def test_pinball_loss_by_group(ray_session):
    import ray

    from kamae_ray.stages.evalmetrics import pinball_loss_by_group

    t = pa.table({"g": ["a", "a", "b"],
                  "y": [100, 50, 10],
                  "p": [80, 70, 10]})
    out = pinball_loss_by_group(t, "g", "y", "p", q_ppm=900_000)
    rows = {r["g"]: r for r in out.to_pylist()}
    # a: e=20 -> 0.9*20e6=18e6; e=-20 -> max(-18e6, 2e6)=2e6
    assert rows["a"]["pinball_sum_mu"] == 18_000_000 + 2_000_000
    assert rows["a"]["mean_pinball"] == (20_000_000 / 2) / 1e6
    assert rows["b"]["pinball_sum_mu"] == 0
    ds = ray.data.from_arrow(t).repartition(2)
    got = {r["g"]: r["pinball_sum_mu"]
           for r in pinball_loss_by_group(ds, "g", "y", "p", 900_000).take_all()}
    assert got == {"a": 20_000_000, "b": 0}


def test_binary_ap_by_group(ray_session):
    import ray

    from kamae_ray.stages.evalmetrics import binary_ap_by_group

    # scores rank ids 1..4 descending; labels 1,0,1,0 -> AP = (1/1 + 2/3)/2
    t = pa.table({"g": ["x"] * 4, "s": [40, 30, 20, 10],
                  "y": [1, 0, 1, 0], "id": [1, 2, 3, 4]})
    r = binary_ap_by_group(t, "g", "s", "y", "id").to_pylist()[0]
    exp_mu = 1_000_000 + round(1_000_000 * 2 / 3)
    assert r["n_pos"] == 2 and r["ap_sum_mu"] == exp_mu
    assert r["ap"] == (exp_mu / 2) / 1e6
    # no positives -> null
    t0 = pa.table({"g": ["z"], "s": [1], "y": [0], "id": [1]})
    assert binary_ap_by_group(t0, "g", "s", "y", "id").to_pylist()[0]["ap"] is None
    # score ties break by id (deterministic)
    tt = pa.table({"g": ["x"] * 2, "s": [5, 5], "y": [0, 1], "id": [1, 2]})
    rt = binary_ap_by_group(tt, "g", "s", "y", "id").to_pylist()[0]
    assert rt["ap_sum_mu"] == 500_000  # positive lands at rank 2
    # dataset path identical
    ds = ray.data.from_arrow(t).repartition(2)
    assert binary_ap_by_group(ds, "g", "s", "y", "id").take_all()[0]["ap_sum_mu"] == exp_mu


def test_mcc_by_group_matches_reference(ray_session, eval_data):
    import ray

    from kamae_ray.stages.evalmetrics import mcc_by_group

    t = mcc_by_group(eval_data, "g", "s", "y", 500).sort_by("g")
    d = _collect(mcc_by_group(ray.data.from_arrow(eval_data), "g", "s", "y",
                              500)).sort_by("g")
    assert t.schema == d.schema
    assert t.equals(d)
    # naive per-group reference
    g = eval_data.column("g").to_numpy(zero_copy_only=False)
    s = eval_data.column("s").to_numpy(zero_copy_only=False)
    y = eval_data.column("y").to_numpy(zero_copy_only=False)
    for i, lab in enumerate(t.column("g").to_pylist()):
        m = g == lab
        pred = (s[m] >= 500).astype(np.int64)
        yy = y[m]
        tp = int(((pred == 1) & (yy == 1)).sum())
        fp = int(((pred == 1) & (yy == 0)).sum())
        fn = int(((pred == 0) & (yy == 1)).sum())
        tn = int(((pred == 0) & (yy == 0)).sum())
        assert t.column("tp")[i].as_py() == tp
        assert t.column("tn")[i].as_py() == tn
        ref = (tp * tn - fp * fn) / np.sqrt(float(tp + fp) * (tp + fn)
                                            * (tn + fp) * (tn + fn))
        assert abs(t.column("mcc")[i].as_py() - ref) < 1e-12


def test_mcc_zero_margin_is_null():
    from kamae_ray.stages.evalmetrics import mcc_by_group

    t = pa.table({"g": ["a", "a"], "s": [5, 9], "y": [1, 1]})  # no negatives
    out = mcc_by_group(t, "g", "s", "y", 7)
    assert out.column("mcc")[0].as_py() is None


def test_mcc_rejects_bad_label():
    from kamae_ray.stages.evalmetrics import mcc_by_group

    t = pa.table({"g": ["a"], "s": [5], "y": [2]})
    with pytest.raises(ValueError, match="0/1"):
        mcc_by_group(t, "g", "s", "y", 7)


def test_cohen_kappa_hand_case(ray_session):
    import ray

    from kamae_ray.stages.evalmetrics import cohen_kappa_by_group

    # classic 2x2: 20 yes/yes, 5 yes/no, 10 no/yes, 15 no/no
    a = ["y"] * 25 + ["n"] * 25
    b = ["y"] * 20 + ["n"] * 5 + ["y"] * 10 + ["n"] * 15
    t = pa.table({"g": ["s"] * 50, "a": a, "b": b})
    out = cohen_kappa_by_group(t, "g", "a", "b")
    assert out.column("n")[0].as_py() == 50
    assert out.column("agree")[0].as_py() == 35
    # po=0.7, pe=(25*30 + 25*20)/2500=0.5 -> kappa=0.4
    assert abs(out.column("kappa")[0].as_py() - 0.4) < 1e-15
    d = cohen_kappa_by_group(ray.data.from_arrow(t), "g", "a", "b")
    assert out.equals(d)


def test_cohen_kappa_constant_raters_null_and_nulls_dropped():
    from kamae_ray.stages.evalmetrics import cohen_kappa_by_group

    t = pa.table({"g": ["s"] * 4, "a": ["x", "x", "x", None],
                  "b": ["x", "x", "x", "x"]})
    out = cohen_kappa_by_group(t, "g", "a", "b")
    assert out.column("n")[0].as_py() == 3  # null rating dropped
    assert out.column("kappa")[0].as_py() is None  # n*n == pe_num


def test_cohen_kappa_multiclass_reference():
    from kamae_ray.stages.evalmetrics import cohen_kappa_by_group

    rng = np.random.default_rng(7)
    a = rng.choice(list("abc"), 500)
    b = rng.choice(list("abcd"), 500)  # label spaces may differ
    t = pa.table({"g": rng.choice(["u", "v"], 500), "a": a, "b": b})
    out = cohen_kappa_by_group(t, "g", "a", "b")
    g = t.column("g").to_numpy(zero_copy_only=False)
    for i, lab in enumerate(out.column("g").to_pylist()):
        m = g == lab
        aa, bb = a[m], b[m]
        n = int(m.sum())
        agree = int((aa == bb).sum())
        pe_num = sum(int((aa == c).sum()) * int((bb == c).sum())
                     for c in set(aa) | set(bb))
        ref = (n * agree - pe_num) / (n * n - pe_num)
        assert out.column("n")[i].as_py() == n
        assert out.column("agree")[i].as_py() == agree
        assert abs(out.column("kappa")[i].as_py() - ref) < 1e-15


def test_categorical_drift_jsd(ray_session):
    from kamae_ray.stages.profile import categorical_drift

    ta = pa.table({"c": ["x"] * 30 + ["y"] * 10})
    tb = pa.table({"c": ["x"] * 10 + ["y"] * 30})
    out = categorical_drift(ta, tb, "c", stat="jsd")
    # symmetric: swapping sides swaps p_a/p_b but keeps jsd_term
    rev = categorical_drift(tb, ta, "c", stat="jsd")
    assert out.column("jsd_term").equals(rev.column("jsd_term"))
    assert all(v > 0 for v in out.column("jsd_term").to_pylist())
    # identical distributions -> exactly 0.0 terms (ln(1) == 0)
    same = categorical_drift(ta, ta, "c", stat="jsd")
    assert same.column("jsd_term").to_pylist() == [0.0, 0.0]
    # total JSD over the union is bounded by ln 2
    assert sum(out.column("jsd_term").to_pylist()) <= np.log(2.0) + 1e-12
    with pytest.raises(ValueError, match="unknown stat"):
        categorical_drift(ta, tb, "c", stat="kl")


def test_logrank_hand_case(ray_session):
    import ray

    from kamae_ray.stages.evalmetrics import logrank_terms

    # arm a: events at t=1,3; censored at 4. arm b: event at 1 (x2), censored 2.
    t = pa.table({
        "t": pa.array([1, 3, 4, 1, 1, 2], pa.int64()),
        "ev": pa.array([1, 1, 0, 1, 1, 0], pa.int64()),
        "arm": pa.array(["a", "a", "a", "b", "b", "b"]),
    })
    out = logrank_terms(t, "t", "ev", "arm", "a", "b")
    assert out.column("t").to_pylist() == [1, 3]
    # t=1: n_a=3, n_b=3, d_a=1, d_b=2 -> oe = 1 - 3*3/6 = -0.5
    assert out.column("n_a")[0].as_py() == 3
    assert out.column("n_b")[0].as_py() == 3
    assert out.column("oe")[0].as_py() == 1.0 - (3 * 3) / 6.0
    v0 = (3 * 3 * 3 * (6 - 3)) / (6 * 6 * 5)
    assert out.column("v")[0].as_py() == v0
    # t=3: n_a=2, n_b=0, d=1 -> oe = 1 - 1*2/2 = 0, v = 0
    assert out.column("oe")[1].as_py() == 0.0
    assert out.column("v")[1].as_py() == 0.0
    d = logrank_terms(ray.data.from_arrow(t), "t", "ev", "arm", "a", "b")
    assert out.equals(d)


def test_logrank_guards():
    from kamae_ray.stages.evalmetrics import logrank_terms

    bad = pa.table({"t": [1], "ev": [2], "arm": ["a"]})
    with pytest.raises(ValueError, match="0/1"):
        logrank_terms(bad, "t", "ev", "arm", "a", "b")
    nul = pa.table({"t": pa.array([None], pa.int64()), "ev": [1], "arm": ["a"]})
    with pytest.raises(ValueError, match="non-null"):
        logrank_terms(nul, "t", "ev", "arm", "a", "b")
    # rows outside the two arms are dropped; empty result keeps schema
    other = pa.table({"t": [1], "ev": [1], "arm": ["zz"]})
    out = logrank_terms(other, "t", "ev", "arm", "a", "b")
    assert out.num_rows == 0 and "oe" in out.column_names


def test_wasserstein_matches_reference(ray_session, eval_data):
    import ray

    from kamae_ray.stages.evalmetrics import wasserstein_distance

    t = pa.table({"v": eval_data.column("s"), "g": eval_data.column("g")})
    out = wasserstein_distance(t, "v", "g", "a", "b")
    d = wasserstein_distance(ray.data.from_arrow(t), "v", "g", "a", "b")
    assert out.equals(d)
    v = t.column("v").to_numpy(zero_copy_only=False)
    g = t.column("g").to_numpy(zero_copy_only=False)
    a, b = np.sort(v[g == "a"]), np.sort(v[g == "b"])
    grid = np.unique(np.concatenate([a, b]))
    ca = np.searchsorted(a, grid, side="right") / len(a)
    cb = np.searchsorted(b, grid, side="right") / len(b)
    ref = float((np.abs(ca - cb)[:-1] * np.diff(grid)).sum())
    assert abs(out.column("w1")[0].as_py() - ref) < 1e-9
    assert out.column("n_a")[0].as_py() == len(a)


def test_wasserstein_shift_and_identity():
    from kamae_ray.stages.evalmetrics import wasserstein_distance

    base = np.arange(100, dtype=np.int64)
    t = pa.table({"v": pa.array(np.concatenate([base, base + 7])),
                  "g": ["a"] * 100 + ["b"] * 100})
    out = wasserstein_distance(t, "v", "g", "a", "b")
    assert out.column("w1")[0].as_py() == 7.0  # pure shift
    same = pa.table({"v": pa.array(np.concatenate([base, base])),
                     "g": ["a"] * 100 + ["b"] * 100})
    assert wasserstein_distance(same, "v", "g", "a", "b") \
        .column("w1")[0].as_py() == 0.0
    empty = pa.table({"v": pa.array(base), "g": ["a"] * 100})
    assert wasserstein_distance(empty, "v", "g", "a", "b") \
        .column("w1")[0].as_py() is None


def test_wasserstein_budget_raise(ray_session):
    import ray

    from kamae_ray.stages.evalmetrics import wasserstein_distance

    t = pa.table({"v": pa.array(np.arange(100, dtype=np.int64)),
                  "g": ["a", "b"] * 50})
    with pytest.raises(ValueError, match="driver_budget"):
        wasserstein_distance(ray.data.from_arrow(t), "v", "g", "a", "b",
                             driver_budget=10)


def test_rbo_hand_cases(ray_session):
    import ray

    from kamae_ray.stages.evalmetrics import rbo_by_query

    # identical rankings of 5 items -> overlap@d = d -> rbo = sum (1-p)p^(d-1)
    t = pa.table({"q": ["a"] * 5, "ra": [1, 2, 3, 4, 5], "rb": [1, 2, 3, 4, 5]})
    out = rbo_by_query(t, "q", "ra", "rb", k=5, p=0.5)
    ref = 0.0
    c = 0.5
    for d in range(1, 6):
        ref = ref + float(d) / float(d) * c
        c *= 0.5
    assert out.column("rbo_k")[0].as_py() == ref
    assert out.column("inter_k")[0].as_py() == 5
    # disjoint prefixes -> 0
    t2 = pa.table({"q": ["a"] * 4, "ra": [1, 2, None, None],
                   "rb": [None, None, 1, 2]})
    out2 = rbo_by_query(t2, "q", "ra", "rb", k=5, p=0.5)
    assert out2.column("rbo_k")[0].as_py() == 0.0
    # naive reference on random rankings + Dataset parity
    rng = np.random.default_rng(9)
    qs, ras, rbs = [], [], []
    for q in range(50):
        n = rng.integers(3, 12)
        pa_ = rng.permutation(n) + 1
        pb_ = rng.permutation(n) + 1
        qs += [q] * n
        ras += pa_.tolist()
        rbs += pb_.tolist()
    big = pa.table({"q": pa.array(qs, pa.int64()), "ra": pa.array(ras),
                    "rb": pa.array(rbs)})
    out3 = rbo_by_query(big, "q", "ra", "rb", k=7, p=0.5).sort_by("q")
    d3 = pa.concat_tables([pa.table(b) for b in
                           rbo_by_query(ray.data.from_arrow(big), "q", "ra",
                                        "rb", k=7, p=0.5)
                           .iter_batches(batch_format="pyarrow")]).sort_by("q")
    assert out3.equals(d3)
    df = big.to_pandas()
    for row in out3.to_pylist():
        sub = df[df.q == row["q"]]
        ref = 0.0
        c = 0.5
        for d in range(1, 8):
            ov = int(((sub.ra <= d) & (sub.rb <= d)).sum())
            ref = ref + float(ov) / float(d) * c
            c *= 0.5
        assert abs(row["rbo_k"] - ref) < 1e-15


def test_rbo_guards():
    from kamae_ray.stages.evalmetrics import rbo_by_query

    with pytest.raises(ValueError, match="1-based"):
        rbo_by_query(pa.table({"q": ["a"], "ra": [0], "rb": [1]}),
                     "q", "ra", "rb", k=3)
    with pytest.raises(ValueError, match="p must be"):
        rbo_by_query(pa.table({"q": ["a"], "ra": [1], "rb": [1]}),
                     "q", "ra", "rb", k=3, p=1.5)
