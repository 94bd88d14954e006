"""Property-based tests: the session-4 evaluation/statistics kernels vs
naive per-group python references (hypothesis)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from kamae_ray.stages.evalmetrics import ks_statistic, ranking_metrics
from kamae_ray.stages.profile import gini_by_group


@st.composite
def ranked_data(draw):
    n = draw(st.integers(1, 150))
    nq = draw(st.integers(1, 6))
    q = np.asarray(draw(st.lists(st.integers(0, nq - 1), min_size=n, max_size=n)))
    rel = np.asarray(draw(st.lists(st.integers(0, 3), min_size=n, max_size=n)))
    o = np.random.default_rng(draw(st.integers(0, 10))).permutation(n)
    return pa.table({"q": q, "o": o, "rel": rel})


@given(ranked_data(), st.integers(1, 8))
@settings(max_examples=50, deadline=None)
def test_ranking_metrics_matches_naive(t, k):
    out = ranking_metrics(t, "q", ["o"], "rel", k=k).sort_by("q")
    df = t.to_pandas()
    for row in out.to_pylist():
        sub = df[df.q == row["q"]].sort_values("o")
        rel = sub.rel.to_numpy()
        top = rel[:k]
        hits = int((top > 0).sum())
        assert row["n"] == len(rel)
        assert row["total_rel"] == int((rel > 0).sum())
        assert row["hits_k"] == hits
        assert row["prec_k"] == hits / k
        if (rel > 0).sum():
            assert abs(row["recall_k"] - hits / (rel > 0).sum()) < 1e-12
        else:
            assert row["recall_k"] is None
        relranks = np.nonzero(top > 0)[0]
        exp_rr = 1.0 / (relranks[0] + 1) if len(relranks) else 0.0
        assert row["rr_k"] == exp_rr
        c = np.log(2) / np.log(np.arange(2, k + 2))
        pad = np.zeros(k)
        pad[:len(top)] = top
        dcg = float((pad * c).sum())
        ideal = np.sort(rel)[::-1][:k].astype(float)
        padi = np.zeros(k)
        padi[:len(ideal)] = ideal
        idcg = float((padi * c).sum())
        assert abs(row["dcg_k"] - dcg) < 1e-9
        assert abs(row["idcg_k"] - idcg) < 1e-9
        if idcg > 0:
            assert abs(row["ndcg_k"] - dcg / idcg) < 1e-9
        else:
            assert row["ndcg_k"] is None


@given(st.lists(st.tuples(st.sampled_from(["a", "b"]),
                          st.integers(-50, 50)), min_size=2, max_size=300))
@settings(max_examples=80, deadline=None)
def test_ks_matches_brute_force(rows):
    t = pa.table({"g": [r[0] for r in rows], "s": [r[1] for r in rows]})
    r = ks_statistic(t, "s", "g", "a", "b").to_pylist()[0]
    xa = np.sort([v for g, v in rows if g == "a"])
    xb = np.sort([v for g, v in rows if g == "b"])
    if not (len(xa) and len(xb)):
        assert np.isnan(r["ks"])
        return
    grid = np.unique(np.concatenate([xa, xb]))
    fa = np.searchsorted(xa, grid, side="right") / len(xa)
    fb = np.searchsorted(xb, grid, side="right") / len(xb)
    assert abs(r["ks"] - np.abs(fa - fb).max()) < 1e-12


@given(st.lists(st.tuples(st.sampled_from(["x", "y"]),
                          st.integers(0, 1000)), min_size=1, max_size=200))
@settings(max_examples=80, deadline=None)
def test_gini_matches_naive(rows):
    t = pa.table({"g": [r[0] for r in rows], "v": [r[1] for r in rows]})
    out = gini_by_group(t, "g", "v").sort_by("g")
    for row in out.to_pylist():
        v = np.sort([x for g, x in rows if g == row["g"]])
        n = len(v)
        num = int(((2 * np.arange(1, n + 1) - n - 1) * v).sum())
        assert row["gini_num"] == num
        if n * v.sum() > 0:
            assert row["gini"] == num / (n * int(v.sum()))
        else:
            assert row["gini"] is None
