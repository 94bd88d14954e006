"""HyperLogLog approx-distinct: error bounds at high cardinality, exactness
in the linear-counting regime, determinism, merge-order invariance, and the
Dataset path vs exact COUNT(DISTINCT)."""

import numpy as np
import pyarrow as pa
import pytest

from kamae_ray.stages.sketches import (
    _hll_estimate,
    approx_count_distinct,
    groupby_approx_count_distinct,
)


@pytest.mark.parametrize("true_n", [100, 5_000, 100_000])
def test_error_bound_table_path(true_n):
    rng = np.random.RandomState(true_n)
    vals = rng.randint(0, 1 << 62, true_n)
    t = pa.table({"g": np.zeros(true_n, np.int64), "v": vals})
    exact = len(np.unique(vals))
    est = groupby_approx_count_distinct(t, "g", "v").column("v_approx_distinct")[0].as_py()
    # sigma = 1.04/sqrt(4096) ~ 1.6%; allow 5 sigma
    assert abs(est - exact) / exact < 0.081, (est, exact)
    assert approx_count_distinct(t, "v") == est  # same registers, same estimate


def test_small_range_exact_and_deterministic():
    t = pa.table({"g": ["a"] * 6 + ["b"] * 4,
                  "v": ["x", "y", "x", None, "z", "x", "q", "q", None, "r"]})
    out1 = groupby_approx_count_distinct(t, "g", "v").to_pylist()
    out2 = groupby_approx_count_distinct(t, "g", "v").to_pylist()
    assert out1 == out2
    got = {r["g"]: r["v_approx_distinct"] for r in out1}
    assert got == {"a": 3, "b": 2}  # nulls not counted, SQL semantics


def test_merge_order_invariance():
    """Register max is commutative: splitting the data into blocks in any
    order gives the same merged estimate."""
    rng = np.random.RandomState(3)
    vals = rng.randint(0, 10_000, 30_000)
    t = pa.table({"g": np.zeros(len(vals), np.int64), "v": vals})
    whole = groupby_approx_count_distinct(t, "g", "v").column("v_approx_distinct")[0].as_py()
    from kamae_ray.stages.sketches import _hash_any, _hll_ranks, _regs_from_block

    h, valid = _hash_any(t.column("v"))
    idx, rank = _hll_ranks(h[valid], 12)
    parts = []
    for sl in (slice(0, 7000), slice(7000, 20_000), slice(20_000, None)):
        parts.append(_regs_from_block(np.zeros(len(idx[sl]), np.int64), idx[sl], rank[sl], 1, 4096))
    merged = np.maximum.reduce([p[0] for p in parts])[None, :]
    assert int(np.rint(_hll_estimate(merged))[0]) == whole


def test_dataset_path_vs_exact(ray_session):
    import ray

    rng = np.random.RandomState(11)
    n = 40_000
    t = pa.table({
        "g": pa.array([int(rng.randint(5)) for _ in range(n)], pa.int64()),
        "v": pa.array([int(x) for x in rng.randint(0, 3000, n)], pa.int64()),
    })
    got = {
        r["g"]: r["v_approx_distinct"]
        for r in groupby_approx_count_distinct(
            ray.data.from_arrow(t).repartition(6), "g", "v"
        ).take_all()
    }
    import duckdb

    exact = dict(duckdb.sql("SELECT g, count(DISTINCT v) FROM t GROUP BY g").fetchall())
    for g, e in exact.items():
        assert abs(got[g] - e) / e < 0.081, (g, got[g], e)
    # Dataset and Table paths agree exactly (same deterministic registers)
    table_got = {
        r["g"]: r["v_approx_distinct"]
        for r in groupby_approx_count_distinct(t, "g", "v").to_pylist()
    }
    assert got == table_got


def test_global_approx_dataset(ray_session):
    import ray

    rng = np.random.RandomState(7)
    vals = rng.randint(0, 8000, 50_000)
    t = pa.table({"v": vals})
    exact = len(np.unique(vals))
    est = approx_count_distinct(ray.data.from_arrow(t).repartition(5), "v")
    assert abs(est - exact) / exact < 0.081
    assert est == approx_count_distinct(t, "v")


def test_profile_columns_vs_duckdb(ray_session):
    import duckdb
    import ray

    from kamae_ray.stages import profile_columns

    rng = np.random.RandomState(17)
    n = 3000
    t = pa.table({
        "i": pa.array([None if rng.rand() < 0.1 else int(rng.randint(1000)) for _ in range(n)], pa.int64()),
        "s": pa.array([None if rng.rand() < 0.1 else f"v{rng.randint(40)}" for _ in range(n)], pa.string()),
    })
    got = {
        r["column"]: r
        for r in profile_columns(
            ray.data.from_arrow(t).repartition(5), ["i", "s"], approx_distinct=True
        ).to_pylist()
    }
    o_i = duckdb.sql(
        "SELECT count(*) n, count(*) - count(i) AS n_null, min(i) mn, max(i) mx, "
        "avg(i) mean, stddev_pop(i) std, count(DISTINCT i) d FROM t"
    ).fetchone()
    assert got["i"]["n_rows"] == o_i[0] and got["i"]["n_nulls"] == o_i[1]
    assert got["i"]["min"] == str(o_i[2]) and got["i"]["max"] == str(o_i[3])
    assert abs(got["i"]["mean"] - o_i[4]) < 1e-9 and abs(got["i"]["std"] - o_i[5]) < 1e-9
    assert abs(got["i"]["approx_distinct"] - o_i[6]) / o_i[6] < 0.081
    o_s = duckdb.sql(
        "SELECT count(*) - count(s), min(s), max(s), count(DISTINCT s) FROM t"
    ).fetchone()
    assert got["s"]["n_nulls"] == o_s[0]
    assert got["s"]["min"] == o_s[1] and got["s"]["max"] == o_s[2]
    assert got["s"]["mean"] is None and got["s"]["std"] is None
    assert abs(got["s"]["approx_distinct"] - o_s[3]) / o_s[3] < 0.081
    # Table path identical
    tp = {r["column"]: r for r in profile_columns(t, ["i", "s"], approx_distinct=True).to_pylist()}
    assert tp == got


def test_top_frequent_exact_under_compression(ray_session):
    """Heavy hitters: capacity far below cardinality must still return the
    EXACT top-k (Misra-Gries superset guarantee + exact recount)."""
    import duckdb
    import ray

    from kamae_ray.stages.sketches import top_frequent

    rng = np.random.RandomState(0)
    vals = [f"hot{i}" for i in range(6) for _ in range(2000 - i * 200)]
    vals += [f"tail{rng.randint(200000)}" for _ in range(60000)]
    rng.shuffle(vals)
    t = pa.table({"v": pa.array(vals, pa.string())})
    got = top_frequent(ray.data.from_arrow(t).repartition(8), "v", k=6, capacity=128).to_pylist()
    oracle = duckdb.sql("SELECT v, count(*)::DOUBLE c FROM t GROUP BY v ORDER BY c DESC, v LIMIT 6").fetchall()
    assert [(r["v"], r["count"]) for r in got] == [(a, b) for a, b in oracle]


def test_top_frequent_weighted(ray_session):
    import duckdb
    import ray

    from kamae_ray.stages.sketches import top_frequent

    rng = np.random.RandomState(2)
    n = 5000
    t = pa.table({
        "v": pa.array([f"k{rng.randint(50)}" for _ in range(n)], pa.string()),
        "w": pa.array([float(rng.randint(1, 10)) for _ in range(n)]),
    })
    got = top_frequent(ray.data.from_arrow(t).repartition(4), "v", k=5, weight_col="w").to_pylist()
    oracle = duckdb.sql("SELECT v, sum(w) c FROM t GROUP BY v ORDER BY c DESC, v LIMIT 5").fetchall()
    assert [(r["v"], r["count"]) for r in got] == [(a, float(b)) for a, b in oracle]


def test_quantile_sketch_exact_regime_and_error(ray_session):
    """n <= k: exact order statistics (percentile_disc rule). Compaction
    regime: interval rank error bounded across distributions; merge order
    canonicalized (Table == Dataset under any partitioning)."""
    import ray

    from kamae_ray.stages.sketches import QuantileSketch, approx_quantiles_sketch

    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    # exact regime
    vals = np.random.RandomState(5).standard_normal(200)
    t = pa.table({"x": pa.array(vals, pa.float64())})
    est = approx_quantiles_sketch(t, "x", qs, k=256)
    srt = np.sort(vals)
    exact = [srt[max(int(np.ceil(q * len(srt))) - 1, 0)] for q in qs]
    assert list(est) == exact

    # compaction regime: bounded interval rank error on 3 distributions
    rng = np.random.RandomState(7)
    for data in [rng.rand(300_000), rng.zipf(1.5, 300_000).astype(float),
                 np.arange(300_000, dtype=float)]:
        s = QuantileSketch(256)
        for i in range(0, len(data), 50_000):
            s.add(data[i:i + 50_000])
        srt = np.sort(data)
        for q, e in zip(qs, s.quantiles(qs)):
            lo = np.searchsorted(srt, e, "left") / len(srt)
            hi = np.searchsorted(srt, e, "right") / len(srt)
            err = 0.0 if lo <= q <= hi else min(abs(q - lo), abs(q - hi))
            assert err < 0.02, (q, err)

    # distributed fold: deterministic for a FIXED partitioning (canonical
    # merge order makes block COMPLETION order irrelevant), and any
    # partitioning stays within the error bound (block BOUNDARIES shape a
    # compaction sketch's sample — inherent to the KLL family)
    data = rng.standard_normal(30_000)
    t = pa.table({"x": pa.array(data, pa.float64())})
    srt = np.sort(data)
    for parts in (3, 11):
        ds = ray.data.from_arrow(t).repartition(parts)
        r1 = approx_quantiles_sketch(ds, "x", qs, k=128)
        r2 = approx_quantiles_sketch(ds, "x", qs, k=128)
        assert list(r1) == list(r2), parts
        for q, e in zip(qs, r1):
            lo = np.searchsorted(srt, e, "left") / len(srt)
            hi = np.searchsorted(srt, e, "right") / len(srt)
            err = 0.0 if lo <= q <= hi else min(abs(q - lo), abs(q - hi))
            assert err < 0.04, (parts, q, err)

    # nulls skipped; merge k mismatch raises
    tn = pa.table({"x": pa.array([1.0, None, 2.0, None, 3.0], pa.float64())})
    assert list(approx_quantiles_sketch(tn, "x", [0.5], k=64)) == [2.0]
    with pytest.raises(ValueError):
        QuantileSketch(64).merge(QuantileSketch(128))


def test_quantile_sketch_generator_qs():
    """quantiles() must accept a one-shot iterable (regression: a generator
    was consumed twice, returning uninitialized memory)."""
    from kamae_ray.stages.sketches import QuantileSketch

    s = QuantileSketch(64).add(np.arange(100, dtype=float))
    got = s.quantiles(q for q in [0.5, 0.9])
    assert list(got) == list(s.quantiles([0.5, 0.9]))
    empty = QuantileSketch(64)
    assert np.isnan(empty.quantiles(q for q in [0.5])).all()


def test_groupby_approx_quantiles(ray_session):
    """Grouped sketch: exact regime == quantile_per_group(disc); huge skewed
    group bounded error; null values/keys; Table == Dataset (fixed parts)."""
    import ray

    from kamae_ray.stages.aggregate import quantile_per_group
    from kamae_ray.stages.sketches import groupby_approx_quantiles

    rng = np.random.RandomState(9)
    t = pa.table({
        "g": pa.array(list("abc") * 50 + [None] * 5),
        "v": pa.array(list(rng.standard_normal(150)) + [1.0, None, 2.0, 3.0, 4.0],
                      pa.float64()),
    })
    qs = [0.25, 0.5, 0.75]
    approx = groupby_approx_quantiles(t, "g", "v", qs, k=512)
    exact = quantile_per_group(t, "g", "v", qs, method="disc")
    a = sorted(approx.to_pylist(), key=lambda r: (r["g"] is None, r["g"]))
    e = sorted(exact.to_pylist(), key=lambda r: (r["g"] is None, r["g"]))
    assert a == e  # exact regime

    ds = ray.data.from_arrow(t).repartition(6)
    d1 = groupby_approx_quantiles(ds, "g", "v", qs, k=512)
    rows = sorted(d1.take_all(), key=lambda r: (r["g"] is None, r["g"]))
    assert [tuple(r.values()) for r in rows] == [tuple(r.values()) for r in a]

    # compaction regime on a skewed group: bounded interval rank error
    g = np.where(rng.rand(200_000) < 0.95, "big", "rest")
    v = rng.standard_normal(200_000)
    tt = pa.table({"g": pa.array(g), "v": pa.array(v)})
    out = groupby_approx_quantiles(tt, "g", "v", [0.5, 0.99], k=256)
    for r in out.to_pylist():
        sub = np.sort(v[g == r["g"]])
        for q, est in [(0.5, r["v_p50"]), (0.99, r["v_p99"])]:
            lo = np.searchsorted(sub, est, "left") / len(sub)
            hi = np.searchsorted(sub, est, "right") / len(sub)
            err = 0.0 if lo <= q <= hi else min(abs(q - lo), abs(q - hi))
            assert err < 0.02, (r["g"], q, err)


class TestCountMin:
    def test_never_undercounts_and_bound(self):
        import collections

        rng = np.random.default_rng(0)
        vals = rng.choice([f"v{i}" for i in range(200)], size=30000)
        t = pa.table({"c": pa.array(vals)})
        from kamae_ray.stages.sketches import countmin_estimate, countmin_sketch

        # tiny width FORCES collisions: estimates may only OVERcount, and by
        # at most 2N/width for most rows (classic bound, prob 1 - 2^-depth)
        sk = countmin_sketch(t, "c", width=64, depth=4)
        true = collections.Counter(vals.tolist())
        probe = [f"v{i}" for i in range(200)]
        est = countmin_estimate(sk, probe)
        err = np.array([int(est[i]) - true[p] for i, p in enumerate(probe)])
        assert (err >= 0).all()
        assert (err <= 2 * 30000 / 64).mean() > 0.9

    def test_partition_invariant_integer_merge(self):
        import numpy as _np

        from kamae_ray.stages.sketches import countmin_sketch

        rng = np.random.default_rng(1)
        vals = rng.choice([f"v{i}" for i in range(40)], size=9000)
        t = pa.table({"c": pa.array(vals)})
        whole = countmin_sketch(t, "c")["table"]
        split = sum(countmin_sketch(t.slice(i, 1234), "c")["table"]
                    for i in range(0, 9000, 1234))
        assert _np.array_equal(whole, split)

    def test_exact_in_no_collision_regime_and_nulls(self):
        from kamae_ray.stages.sketches import approx_counts

        t = pa.table({"c": pa.array(["a"] * 5 + ["b"] * 3 + [None] * 2)})
        out = approx_counts(t, "c", ["a", "b", "missing"])
        assert out.column("approx_count").to_pylist() == [5, 3, 0]

    def test_weighted(self):
        from kamae_ray.stages.sketches import countmin_estimate, countmin_sketch

        t = pa.table({"c": ["x", "x", "y"], "w": pa.array([10, 5, 7], pa.int64())})
        sk = countmin_sketch(t, "c", weight_col="w")
        assert countmin_estimate(sk, ["x", "y"]).tolist() == [15, 7]
        assert sk["n"] == 22

    def test_dataset_matches_table(self, ray_session):
        import ray

        from kamae_ray.stages.sketches import countmin_sketch

        rng = np.random.default_rng(2)
        vals = rng.choice([f"v{i}" for i in range(30)], size=6000)
        t = pa.table({"c": pa.array(vals)})
        want = countmin_sketch(t, "c")
        ds = ray.data.from_arrow(t).repartition(7)
        got = countmin_sketch(ds, "c")
        assert np.array_equal(want["table"], got["table"]) and want["n"] == got["n"]


class TestDriftReport:
    def test_matches_mirrored_psi_sql(self):
        import duckdb
        import pyarrow.compute as pc

        from kamae_ray.stages.profile import drift_report

        rng = np.random.default_rng(0)
        a = pa.table({"v": pa.array(np.r_[rng.normal(50, 10, 5000)], pa.float64())})
        b = pa.table({"v": pa.array(rng.normal(60, 15, 4000), pa.float64())})
        out = drift_report(a, b, "v", bins=10, lo=0.0, hi=100.0)
        ora = duckdb.query("""
            WITH ha AS (SELECT CAST(least(floor((v - 0.0) / 10.0), 9) AS BIGINT) AS bin,
                        count(*)::BIGINT AS n FROM a
                        WHERE v IS NOT NULL AND v >= 0.0 AND v <= 100.0 GROUP BY 1),
            hb AS (SELECT CAST(least(floor((v - 0.0) / 10.0), 9) AS BIGINT) AS bin,
                   count(*)::BIGINT AS n FROM b
                   WHERE v IS NOT NULL AND v >= 0.0 AND v <= 100.0 GROUP BY 1),
            g AS (SELECT unnest(generate_series(0, 9)) AS bin),
            j AS (SELECT g.bin, COALESCE(ha.n, 0) AS n_a, COALESCE(hb.n, 0) AS n_b,
                  (SELECT SUM(n) FROM ha) AS Na, (SELECT SUM(n) FROM hb) AS Nb
                  FROM g LEFT JOIN ha USING (bin) LEFT JOIN hb USING (bin)),
            p AS (SELECT bin, n_a, n_b, (n_a::DOUBLE + 1.0) / (Na::DOUBLE + 10.0) AS p_a,
                  (n_b::DOUBLE + 1.0) / (Nb::DOUBLE + 10.0) AS p_b FROM j)
            SELECT bin, n_a, n_b, ROUND(p_a, 6) AS p_a, ROUND(p_b, 6) AS p_b,
                   ROUND((p_a - p_b) * ln(p_a / p_b), 6) AS psi_term FROM p ORDER BY bin
        """).arrow()
        eng = pa.table({
            "bin": out.column("bin"), "n_a": out.column("n_a"), "n_b": out.column("n_b"),
            "p_a": pc.round(out.column("p_a"), ndigits=6, round_mode="half_towards_infinity"),
            "p_b": pc.round(out.column("p_b"), ndigits=6, round_mode="half_towards_infinity"),
            "psi_term": pc.round(out.column("psi_term"), ndigits=6,
                                 round_mode="half_towards_infinity"),
        }).combine_chunks()
        assert eng.equals(ora.cast(eng.schema).combine_chunks())

    def test_psi_magnitude_reflects_drift(self):
        from kamae_ray.stages.profile import drift_report

        rng = np.random.default_rng(1)
        base = rng.normal(50, 10, 5000)
        same = drift_report(pa.table({"v": pa.array(base)}),
                            pa.table({"v": pa.array(rng.normal(50, 10, 5000))}),
                            "v", bins=10, lo=0.0, hi=100.0)
        moved = drift_report(pa.table({"v": pa.array(base)}),
                             pa.table({"v": pa.array(rng.normal(70, 10, 5000))}),
                             "v", bins=10, lo=0.0, hi=100.0)
        assert sum(same.column("psi_term").to_pylist()) < 0.1
        assert sum(moved.column("psi_term").to_pylist()) > 0.25

    def test_empty_side_raises(self):
        import pytest as _pt

        from kamae_ray.stages.profile import drift_report

        a = pa.table({"v": pa.array([1.0, 2.0])})
        b = pa.table({"v": pa.array([1e9])})  # out of range
        with _pt.raises(ValueError):
            drift_report(a, b, "v", bins=4, lo=0.0, hi=10.0)


class TestContentChecksum:
    def test_matches_hugeint_oracle_and_invariances(self):
        import duckdb

        from kamae_ray.stages.profile import checksum_oracle_sql, content_checksum

        rng = np.random.default_rng(0)
        # explicit negatives: rng.integers(-1000, 1e12) is negative with
        # p ~ 1e-9 — the two's-complement SQL path needs REAL coverage
        # (the HUGEINT overflow it hides was a review finding)
        t = pa.table({
            "k": pa.array(np.r_[rng.integers(-1000, 10**12, 3000),
                                [0, -1, -1000, -3_000_000_000_000_000_000]].tolist()
                          + [None], pa.int64()),
            "s": pa.array([f"v{i % 37}" for i in range(3004)] + [None], pa.string()),
        })
        got = content_checksum(t, ["k", "s"], salt=3)
        # dedicated connection: register() on duckdb's DEFAULT connection
        # would shadow every later test's replacement-scan of a local `t`
        con = duckdb.connect()
        con.register("t", t)
        ora = con.execute(checksum_oracle_sql(
            "t", ["k", "s"], {"k": "int", "s": "str"}, salt=3)).fetchone()
        con.close()
        assert (got["checksum"], got["n_rows"]) == ora
        # multiset semantics: any permutation / partitioning yields the same value
        perm = t.take(pa.array(np.random.default_rng(1).permutation(len(t))))
        assert content_checksum(perm, ["k", "s"], salt=3) == got
        split_sum = 0
        for i in range(0, len(t), 701):
            split_sum = (split_sum + int(content_checksum(
                t.slice(i, 701), ["k", "s"], salt=3)["checksum"])) % (1 << 64)
        assert str(split_sum) == got["checksum"]
        # sensitivity: a single changed value changes the checksum
        t2 = t.set_column(0, "k", pa.array([7] + t.column("k").to_pylist()[1:], pa.int64()))
        assert content_checksum(t2, ["k", "s"], salt=3) != got

    def test_dataset_matches_table(self, ray_session):
        import ray

        from kamae_ray.stages.profile import content_checksum

        t = pa.table({"k": pa.array(range(2000), pa.int64()),
                      "s": pa.array([f"x{i % 9}" for i in range(2000)])})
        want = content_checksum(t, ["k", "s"])
        ds = ray.data.from_arrow(t).repartition(7)
        assert content_checksum(ds, ["k", "s"]) == want


def test_categorical_drift_matches_sql(ray_session):
    import duckdb
    import pyarrow.compute as pc

    from kamae_ray.stages.profile import categorical_drift

    rng = np.random.default_rng(0)
    a = pa.table({"c": pa.array(rng.choice(["x", "y", "z"], 4000, p=[.6, .3, .1]).tolist()
                                + [None])})
    b = pa.table({"c": pa.array(rng.choice(["x", "y", "w"], 3000, p=[.3, .5, .2]).tolist())})
    out = categorical_drift(a, b, "c")
    ora = duckdb.query("""
        WITH ca AS (SELECT c, count(*)::BIGINT AS n FROM a WHERE c IS NOT NULL GROUP BY 1),
        cb AS (SELECT c, count(*)::BIGINT AS n FROM b WHERE c IS NOT NULL GROUP BY 1),
        u AS (SELECT c FROM ca UNION SELECT c FROM cb),
        k AS (SELECT COUNT(*)::BIGINT AS K FROM u),
        j AS (SELECT u.c, COALESCE(ca.n, 0) AS n_a, COALESCE(cb.n, 0) AS n_b,
              (SELECT SUM(n) FROM ca) AS Na, (SELECT SUM(n) FROM cb) AS Nb, k.K
              FROM u LEFT JOIN ca USING (c) LEFT JOIN cb USING (c) CROSS JOIN k),
        p AS (SELECT c, n_a, n_b, (n_a::DOUBLE + 1.0) / (Na::DOUBLE + (1 * K)::DOUBLE) AS p_a,
              (n_b::DOUBLE + 1.0) / (Nb::DOUBLE + (1 * K)::DOUBLE) AS p_b FROM j)
        SELECT c, n_a, n_b, ROUND(p_a, 6) AS p_a, ROUND(p_b, 6) AS p_b,
               ROUND((p_a - p_b) * ln(p_a / p_b), 6) AS psi_term FROM p ORDER BY c
    """).arrow()
    eng = pa.table({
        "c": out.column("c"), "n_a": out.column("n_a"), "n_b": out.column("n_b"),
        "p_a": pc.round(out.column("p_a"), ndigits=6, round_mode="half_towards_infinity"),
        "p_b": pc.round(out.column("p_b"), ndigits=6, round_mode="half_towards_infinity"),
        "psi_term": pc.round(out.column("psi_term"), ndigits=6,
                             round_mode="half_towards_infinity"),
    }).combine_chunks()
    assert eng.equals(ora.cast(eng.schema).combine_chunks())
    # dataset path matches the table path
    import ray

    da = ray.data.from_arrow(a).repartition(3)
    db = ray.data.from_arrow(b).repartition(2)
    got = categorical_drift(da, db, "c")
    assert got.equals(out)


def test_narrow_read_declines_on_filtered_reads(ray_session):
    import pyarrow.dataset as pds

    from kamae_ray.sources.io import narrow_read, read_parquet_clean

    ds = read_parquet_clean("/root/testdata/sf0.001/documents.parquet",
                            columns=["source", "lang"],
                            filter=pds.field("lang") == "en")
    assert narrow_read(ds, ["source"]) is None  # filter references lang
    ds2 = read_parquet_clean("/root/testdata/sf0.001/documents.parquet",
                             columns=["source", "lang"])
    assert narrow_read(ds2, ["source"]) is not None


class TestApproxCountsProbeTypes:
    def test_integer_probe_values_keep_their_type(self):
        """approx_counts must not hardcode string probe columns — integer
        probes should come back as an int column with correct estimates
        (ADVICE r4)."""
        from kamae_ray.stages.sketches import approx_counts

        t = pa.table({"x": pa.array([1, 2, 2, 3, 3, 3], pa.int64())})
        out = approx_counts(t, "x", [2, 3, 99])
        assert out.schema.field("x").type == pa.int64()
        assert out.column("approx_count").to_pylist() == [2, 3, 0]


def test_bottomk_sketch(ray_session):
    import ray

    import pyarrow.compute as pc

    from kamae_ray.stages.hashing import POLY_P, poly31_scalar
    from kamae_ray.stages.sketches import bottomk_sketch

    rng = np.random.default_rng(41)
    items = [f"item{v}" for v in rng.integers(0, 5000, 20000)]
    t = pa.table({"g": pa.array(rng.choice(["a", "b"], 20000)),
                  "it": pa.array(items)})
    k = 256
    out = bottomk_sketch(t, "g", "it", k=k).sort_by(
        [("g", "ascending"), ("rank", "ascending")])
    d = bottomk_sketch(ray.data.from_arrow(t), "g", "it", k=k)
    dt = pa.concat_tables([pa.table(b) for b in
                           d.iter_batches(batch_format="pyarrow")]).sort_by(
        [("g", "ascending"), ("rank", "ascending")])
    assert out.equals(dt)  # partition invariance: Dataset == Table
    g = np.array(t.column("g").to_pylist())
    for lab in ("a", "b"):
        distinct = sorted(set(np.array(items)[g == lab].tolist()))
        hs = sorted(((poly31_scalar(v) * 2654435761) % POLY_P, v) for v in distinct)[:k]
        sub = out.filter(pc.equal(out.column("g"), lab))
        assert sub.column("hash").to_pylist() == [h for h, _ in hs]
        assert sub.column("it").to_pylist() == [v for _, v in hs]
        # estimator within 30% at k=256 (KMV error ~1/sqrt(k) ~ 6%; one
        # fixed sample, so leave generous slack — determinism, not luck)
        est = sub.column("est_distinct")[k - 1].as_py()
        true = len(distinct)
        assert abs(est - true) / true < 0.3
        assert est == (float(k - 1) * float(POLY_P)) / float(hs[k - 1][0])
    # below-k group: sketch is exact, estimator NULL
    small = bottomk_sketch(pa.table({"g": ["s"] * 3,
                                     "it": ["x", "y", "z"]}), "g", "it", k=8)
    assert small.num_rows == 3
    assert all(v is None for v in small.column("est_distinct").to_pylist())
