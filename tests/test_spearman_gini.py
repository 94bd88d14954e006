"""spearman_by_group + gini_by_group (stages/profile.py): pandas/closed-form
equivalence, tie handling, constant-column nulls, Dataset parity."""

import numpy as np
import pyarrow as pa
import pytest

from kamae_ray.stages.profile import gini_by_group, spearman_by_group


def _collect(obj) -> pa.Table:
    if isinstance(obj, pa.Table):
        return obj
    return pa.concat_tables(
        [pa.table(b) for b in obj.iter_batches(batch_format="pyarrow")])


@pytest.fixture(scope="module")
def stat_data():
    rng = np.random.default_rng(17)
    n = 12000
    return pa.table({
        "g": pa.array(rng.choice(["a", "b", "c"], n)),
        "x": pa.array(rng.integers(0, 200, n)),    # heavy ties
        "y": pa.array(rng.integers(0, 10**7, n)),
        "v": pa.array(rng.integers(0, 40000, n)),
    })


def test_spearman_matches_pandas_rank_corr(stat_data):
    out = spearman_by_group(stat_data, "g", "x", "y").sort_by("g")
    df = stat_data.to_pandas()
    for row in out.to_pylist():
        sub = df[df.g == row["g"]]
        ref = sub.x.rank().corr(sub.y.rank())   # pearson of average ranks
        assert abs(row["spearman"] - ref) < 1e-12


def test_spearman_perfect_and_constant():
    t = pa.table({"g": ["a"] * 5 + ["b"] * 5,
                  "x": [1, 2, 3, 4, 5, 7, 7, 7, 7, 7],
                  "y": [10, 20, 30, 40, 50, 1, 2, 3, 4, 5]})
    out = spearman_by_group(t, "g", "x", "y").sort_by("g").to_pylist()
    # sqrt(S)*sqrt(S) is not exactly S unless S is a perfect square — the
    # contract is bit-parity with the oracle's identical expression, not 1.0
    assert abs(out[0]["spearman"] - 1.0) < 1e-15
    assert out[0]["s_ab"] == out[0]["s_aa"] == out[0]["s_bb"]  # exact ints DO say rho=1
    assert out[1]["spearman"] is None           # constant x -> s_aa = 0


def test_spearman_dataset_parity(ray_session, stat_data):
    import ray

    t = spearman_by_group(stat_data, "g", "x", "y").sort_by("g")
    d = _collect(spearman_by_group(ray.data.from_arrow(stat_data),
                                   "g", "x", "y")).sort_by("g")
    assert t.equals(d.select(t.column_names))


def test_gini_closed_forms():
    # all-equal values -> gini 0; one owner of everything -> (n-1)/n
    t = pa.table({"g": ["e"] * 4 + ["o"] * 4,
                  "v": [5, 5, 5, 5, 0, 0, 0, 100]})
    out = gini_by_group(t, "g", "v").sort_by("g").to_pylist()
    assert out[0]["gini"] == 0.0
    assert out[1]["gini"] == 3 / 4


def test_gini_matches_numpy(stat_data):
    out = gini_by_group(stat_data, "g", "v").sort_by("g")
    df = stat_data.to_pandas()
    for row in out.to_pylist():
        v = np.sort(df[df.g == row["g"]].v.to_numpy().astype(np.int64))
        n = len(v)
        num = int(((2 * np.arange(1, n + 1) - n - 1) * v).sum())
        assert row["gini_num"] == num
        assert row["gini"] == num / (n * int(v.sum()))


def test_gini_rejects_negative():
    t = pa.table({"g": ["a"], "v": [-1]})
    with pytest.raises(ValueError, match="non-negative"):
        gini_by_group(t, "g", "v")


def test_herfindahl_null_categories_and_closed_form():
    from kamae_ray.stages.profile import herfindahl_by_group

    # group "m": one category owns everything -> ppm 1_000_000; group "s":
    # 4 equal categories (incl. a NULL category) -> 250_000 ppm
    t = pa.table({
        "g": ["m"] * 3 + ["s"] * 4,
        "c": pa.array([7, 7, 7, 1, 2, 3, None], pa.int64()),
    })
    out = herfindahl_by_group(t, "g", "c").sort_by("g").to_pylist()
    assert out[0] == {"g": "m", "n_categories": 1, "total": 3,
                      "hhi_num": 9, "hhi_ppm": 1_000_000}
    assert out[1] == {"g": "s", "n_categories": 4, "total": 4,
                      "hhi_num": 4, "hhi_ppm": 250_000}


def test_herfindahl_dataset_parity(ray_session, stat_data):
    import ray

    from kamae_ray.stages.profile import herfindahl_by_group

    t = herfindahl_by_group(stat_data, "g", "x").sort_by("g")
    d = _collect(herfindahl_by_group(ray.data.from_arrow(stat_data),
                                     "g", "x")).sort_by("g")
    assert t.equals(d.select(t.column_names))


def test_check_rules_all_kinds(ray_session):
    import ray

    from kamae_ray.stages.profile import check_rules

    t = pa.table({
        "a": pa.array([1, 2, None, 500, 7], pa.int64()),
        "s": pa.array(["x@y.com", "bad", None, "a@b.org", "c@d.net"]),
        "k": pa.array([1, 1, 2, 3, 3], pa.int64()),
    })
    rules = [
        {"col": "a", "rule": "not_null"},
        {"col": "a", "rule": "max", "value": 100},
        {"col": "a", "rule": "min", "value": 2},
        {"col": "s", "rule": "matches", "pattern": r"[^@]+@[^@]+\.[a-z]+"},
        {"col": "k", "rule": "unique"},
        {"col": "k", "rule": "in_set", "values": [1, 2]},
    ]
    out = check_rules(t, rules).to_pylist()
    assert [r["violations"] for r in out] == [1, 1, 1, 1, 2, 2]
    assert out[4]["n_rows"] == 5          # unique counts non-null rows
    # Dataset path identical
    d = check_rules(ray.data.from_arrow(t), rules).to_pylist()
    assert d == out


def test_check_rules_rejects_unknown():
    from kamae_ray.stages.profile import check_rules

    with pytest.raises(ValueError, match="unknown rule"):
        check_rules(pa.table({"a": [1]}), [{"col": "a", "rule": "nope"}])


def test_kendall_tau_matches_naive(ray_session):
    import ray

    from kamae_ray.stages.profile import kendall_tau_by_group

    rng = np.random.default_rng(11)
    n = 900
    t = pa.table({
        "g": pa.array(rng.choice(["a", "b", "c"], n)),
        "x": pa.array(rng.integers(0, 40, n)),   # heavy ties
        "y": pa.array(rng.integers(-50, 50, n)),
    })
    out = kendall_tau_by_group(t, "g", "x", "y")
    d = kendall_tau_by_group(ray.data.from_arrow(t), "g", "x", "y")
    dt = pa.concat_tables([pa.table(b) for b in
                           d.iter_batches(batch_format="pyarrow")]).sort_by("g")
    assert out.sort_by("g").equals(dt)
    g = t.column("g").to_numpy(zero_copy_only=False)
    x = t.column("x").to_numpy(zero_copy_only=False)
    y = t.column("y").to_numpy(zero_copy_only=False)
    srt = out.sort_by("g")
    for i, lab in enumerate(srt.column("g").to_pylist()):
        m = g == lab
        xv, yv = x[m], y[m]
        nn = len(xv)
        ncd = n1 = n2 = 0
        for a in range(nn):
            for b in range(a + 1, nn):
                ncd += int(np.sign(xv[a] - xv[b])) * int(np.sign(yv[a] - yv[b]))
                n1 += xv[a] == xv[b]
                n2 += yv[a] == yv[b]
        n0 = nn * (nn - 1) // 2
        assert srt.column("ncd")[i].as_py() == ncd
        assert srt.column("ties_x")[i].as_py() == n1
        assert srt.column("ties_y")[i].as_py() == n2
        ref = ncd / (np.sqrt(float(n0 - n1)) * np.sqrt(float(n0 - n2)))
        assert srt.column("tau_b")[i].as_py() == ref


def test_kendall_perfect_and_degenerate():
    from kamae_ray.stages.profile import kendall_tau_by_group

    t = pa.table({"g": ["a"] * 5, "x": [1, 2, 3, 4, 5], "y": [10, 20, 30, 40, 50]})
    # sqrt(n0)*sqrt(n0) != n0 exactly unless n0 is a perfect square — the
    # fixed chain is the contract (spearman lesson), so compare with 1 ULP
    assert abs(kendall_tau_by_group(t, "g", "x", "y").column("tau_b")[0].as_py()
               - 1.0) < 1e-15
    c = pa.table({"g": ["a"] * 4, "x": [7, 7, 7, 7], "y": [1, 2, 3, 4]})
    out = kendall_tau_by_group(c, "g", "x", "y")
    assert out.column("tau_b")[0].as_py() is None  # constant x: n0 == n1
    # null x/y rows are dropped (SQL pair-scan semantics)
    nl = pa.table({"g": ["a"] * 3, "x": [1, None, 2], "y": [5, 9, None]})
    assert kendall_tau_by_group(nl, "g", "x", "y").column("n")[0].as_py() == 1


def test_kendall_group_cap_raises():
    from kamae_ray.stages.profile import kendall_tau_by_group

    t = pa.table({"g": ["a"] * 10, "x": list(range(10)), "y": list(range(10))})
    with pytest.raises(ValueError, match="max_group_rows"):
        kendall_tau_by_group(t, "g", "x", "y", max_group_rows=5)


def test_contingency_residuals(ray_session):
    import ray

    from kamae_ray.stages.profile import contingency_residuals

    rng = np.random.default_rng(13)
    t = pa.table({"x": pa.array(rng.choice(["r", "s", "t"], 800)),
                  "y": pa.array(rng.choice(["u", "v"], 800))})
    out = contingency_residuals(t, "x", "y")
    d = contingency_residuals(ray.data.from_arrow(t), "x", "y")
    assert out.equals(d)
    xs = t.column("x").to_numpy(zero_copy_only=False)
    ys = t.column("y").to_numpy(zero_copy_only=False)
    n = len(xs)
    for i in range(out.num_rows):
        xv = out.column("x")[i].as_py()
        yv = out.column("y")[i].as_py()
        o = int(((xs == xv) & (ys == yv)).sum())
        e = int((xs == xv).sum()) * int((ys == yv).sum()) / n
        assert out.column("observed")[i].as_py() == o
        assert abs(out.column("expected")[i].as_py() - e) < 1e-9
        assert abs(out.column("residual")[i].as_py() - (o - e) / np.sqrt(e)) < 1e-9
    # expected counts over all cells sum to n
    assert abs(sum(out.column("expected").to_pylist()) - n) < 1e-6
    # null categories are dropped
    t2 = pa.table({"x": ["a", None], "y": ["b", "b"]})
    assert contingency_residuals(t2, "x", "y").column("observed").to_pylist() == [1]


def test_acf_matches_corrcoef(ray_session):
    import ray

    from kamae_ray.stages.profile import acf_by_group

    rng = np.random.default_rng(23)
    n = 3000
    t = pa.table({
        "g": pa.array(rng.choice(["a", "b"], n)),
        "o": pa.array(rng.permutation(n).astype(np.int64)),
        "v": pa.array(rng.integers(-1000, 1000, n)),
    })
    out = acf_by_group(t, "g", ["o"], "v", max_lag=4).sort_by(
        [("g", "ascending"), ("lag", "ascending")])
    d = acf_by_group(ray.data.from_arrow(t), "g", ["o"], "v", max_lag=4)
    dt = pa.concat_tables([pa.table(b) for b in
                           d.iter_batches(batch_format="pyarrow")]).sort_by(
        [("g", "ascending"), ("lag", "ascending")])
    assert out.equals(dt)
    df = t.to_pandas().sort_values("o")
    for row in out.to_pylist():
        v = df[df.g == row["g"]].v.to_numpy()
        x, y = v[:-row["lag"]], v[row["lag"]:]
        assert row["n_pairs"] == len(x)
        ref = np.corrcoef(x.astype(float), y.astype(float))[0, 1]
        assert abs(row["acf"] - ref) < 1e-9


def test_acf_edge_cases():
    from kamae_ray.stages.profile import acf_by_group

    # perfectly alternating series: lag-1 acf = -1, lag-2 acf = +1
    t = pa.table({"g": ["a"] * 8, "o": list(range(8)),
                  "v": [1, -1, 1, -1, 1, -1, 1, -1]})
    out = acf_by_group(t, "g", ["o"], "v", max_lag=2).to_pylist()
    assert abs(out[0]["acf"] + 1.0) < 1e-15
    assert abs(out[1]["acf"] - 1.0) < 1e-15
    # constant series -> variance 0 -> NULL
    c = pa.table({"g": ["a"] * 5, "o": list(range(5)), "v": [3] * 5})
    assert acf_by_group(c, "g", ["o"], "v", max_lag=1).to_pylist()[0]["acf"] is None
    # nulls dropped BEFORE pairing (SQL LAG over the filtered set)
    nl = pa.table({"g": ["a"] * 4, "o": [0, 1, 2, 3],
                   "v": pa.array([5, None, 6, 7], pa.int64())})
    out = acf_by_group(nl, "g", ["o"], "v", max_lag=1)
    assert out.column("n_pairs")[0].as_py() == 2  # (5,6), (6,7)
    with pytest.raises(ValueError, match="26 bits"):
        acf_by_group(pa.table({"g": ["a"], "o": [0], "v": [1 << 27]}),
                     "g", ["o"], "v", max_lag=1)


def test_theil_index_by_group_dataset_and_reference(ray_session):
    import ray

    from kamae_ray.stages.profile import theil_index_by_group

    rng = np.random.default_rng(13)
    n = 4000
    g = rng.integers(0, 4, n)
    v = rng.integers(1, 10_000, n).astype(object)
    v[3] = None
    v[8] = 0
    t = pa.table({"g": pa.array(g, pa.int64()), "v": pa.array(list(v), pa.int64())})
    want = theil_index_by_group(t, "g", "v").sort_by("g")
    for row in want.to_pylist():
        sel = np.array([int(x) for x, gg in zip(v, g)
                        if x is not None and x > 0 and gg == row["g"]], dtype=float)
        mu = sel.mean()
        ref = float(np.mean((sel / mu) * np.log(sel / mu)))
        assert abs(row["theil"] - ref) < 1e-5
        assert row["theil"] >= 0.0
        assert row["n"] == len(sel)
    # equal values -> exactly zero
    eq = pa.table({"g": pa.array([1] * 10, pa.int64()),
                   "v": pa.array([7] * 10, pa.int64())})
    assert theil_index_by_group(eq, "g", "v").column("theil")[0].as_py() == 0.0
    ds = ray.data.from_arrow(t).repartition(5)
    got = pa.concat_tables(
        [pa.table(x) for x in theil_index_by_group(ds, "g", "v")
         .iter_batches(batch_format="pyarrow")]
    ).sort_by("g")
    assert got.cast(want.schema).equals(want)


def test_lorenz_points_by_group_properties_and_dataset(ray_session):
    import ray

    from kamae_ray.stages.profile import lorenz_points_by_group

    rng = np.random.default_rng(7)
    n = 3000
    g = rng.integers(0, 4, n)
    v = rng.integers(0, 10_000, n)
    t = pa.table({"g": pa.array(g, pa.int64()), "v": pa.array(v, pa.int64())})
    want = lorenz_points_by_group(t, "g", "v").sort_by(
        [("g", "ascending"), ("k", "ascending")])
    rows = want.to_pylist()
    by_g = {}
    for r in rows:
        by_g.setdefault(r["g"], []).append(r["cum_ppm"])
    for gg, curve in by_g.items():
        assert len(curve) == 10
        assert curve == sorted(curve)           # monotone
        assert curve[-1] == 1_000_000           # full share at k=10
        sel = np.sort(v[g == gg]).astype(np.int64)
        k5 = (5 * len(sel)) // 10
        expect5 = (1_000_000 * int(sel[:k5].sum())) // int(sel.sum())
        assert curve[4] == expect5              # exact decile share
    ds = ray.data.from_arrow(t).repartition(5)
    got = pa.concat_tables(
        [pa.table(x) for x in lorenz_points_by_group(ds, "g", "v")
         .iter_batches(batch_format="pyarrow")]
    ).sort_by([("g", "ascending"), ("k", "ascending")])
    assert got.cast(want.schema).equals(want)
