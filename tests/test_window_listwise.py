import numpy as np
import pyarrow as pa
import pytest

from kamae_ray.stages import (
    BackfillTransformer,
    CumulativeAggTransformer,
    LagTransformer,
    LeadTransformer,
    ListMeanTransformer,
    ListMedianTransformer,
    ListRankTransformer,
    ListStdDevTransformer,
    RollingAggTransformer,
    SessionizeTransformer,
    asof_join,
)


@pytest.fixture()
def listwise_t():
    return pa.table(
        {
            "q": [1, 1, 1, 2, 2, 3],
            "v": [10.0, 20.0, 30.0, 5.0, None, 7.0],
            "srt": [3.0, 2.0, 1.0, 1.0, 2.0, 1.0],
            "seg": ["a", "a", "b", "a", "a", "a"],
        }
    )


@pytest.fixture()
def events_t():
    return pa.table(
        {
            "u": [1, 1, 1, 1, 2, 2],
            "ts": [10, 20, 35, 100, 5, 8],
            "val": [1.0, None, 3.0, 4.0, 5.0, 6.0],
        }
    )


def test_list_stats(listwise_t):
    t = listwise_t
    assert ListMeanTransformer(input_col="v", query_id_col="q", output_col="o").transform(t).column("o").to_pylist() == [20.0, 20.0, 20.0, 5.0, 5.0, 7.0]
    assert ListMedianTransformer(input_col="v", query_id_col="q", output_col="o").transform(t).column("o").to_pylist()[:3] == [20.0] * 3
    assert ListStdDevTransformer(input_col="v", query_id_col="q", nan_fill_value=-1.0, output_col="o").transform(t).column("o").to_pylist() == [10.0, 10.0, 10.0, -1.0, -1.0, -1.0]


def test_list_topn_filter_segment(listwise_t):
    t = listwise_t
    # top 2 by srt asc within q=1 -> rows with srt 1,2 -> values 30,20 -> mean 25
    out = ListMeanTransformer(input_col="v", query_id_col="q", sort_col="srt", top_n=2, output_col="o").transform(t)
    assert out.column("o").to_pylist()[:3] == [25.0] * 3
    out2 = ListMeanTransformer(input_col="v", query_id_col="q", min_filter_value=15.0, output_col="o").transform(t)
    assert out2.column("o").to_pylist()[:3] == [25.0] * 3
    out3 = ListMeanTransformer(input_col="v", query_id_col="q", segment_col="seg", output_col="o").transform(t)
    assert out3.column("o").to_pylist()[:3] == [15.0, 15.0, 30.0]


def test_list_rank(listwise_t):
    out = ListRankTransformer(input_col="v", query_id_col="q", sort_order="desc", output_col="o").transform(listwise_t)
    assert out.column("o").to_pylist() == [3, 2, 1, 1, 2, 1]


def test_lag_lead_backfill(events_t):
    assert LagTransformer(input_col="val", entity_cols=["u"], time_col="ts", output_col="o").transform(events_t).column("o").to_pylist() == [None, 1.0, None, 3.0, None, 5.0]
    assert LeadTransformer(input_col="val", entity_cols=["u"], time_col="ts", output_col="o").transform(events_t).column("o").to_pylist() == [None, 3.0, 4.0, None, 6.0, None]
    assert BackfillTransformer(input_col="val", entity_cols=["u"], time_col="ts", output_col="o").transform(events_t).column("o").to_pylist() == [1.0, 1.0, 3.0, 4.0, 5.0, 6.0]
    assert BackfillTransformer(input_col="val", entity_cols=["u"], time_col="ts", method="bfill", output_col="o").transform(events_t).column("o").to_pylist() == [1.0, 3.0, 3.0, 4.0, 5.0, 6.0]


def test_sessionize(events_t):
    out = SessionizeTransformer(entity_cols=["u"], time_col="ts", gap=20, output_col="o").transform(events_t)
    assert out.column("o").to_pylist() == [0, 0, 0, 1, 0, 0]


def test_cumulative_leakage_free(events_t):
    out = CumulativeAggTransformer(
        input_col="val", entity_cols=["u"], time_col="ts", stat="sum", include_current=False, output_col="o"
    ).transform(events_t)
    assert out.column("o").to_pylist() == [None, 1.0, 1.0, 4.0, None, 5.0]
    cnt = CumulativeAggTransformer(
        input_col="val", entity_cols=["u"], time_col="ts", stat="count", include_current=False, output_col="o"
    ).transform(events_t)
    assert cnt.column("o").to_pylist() == [0.0, 1.0, 1.0, 2.0, 0.0, 1.0]


def test_rolling(events_t):
    out = RollingAggTransformer(
        input_col="val", entity_cols=["u"], time_col="ts", stat="mean", window=2, output_col="o"
    ).transform(events_t)
    assert out.column("o").to_pylist() == [1.0, 1.0, 3.0, 3.5, 5.0, 5.5]


def test_rolling_median():
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    n = 400
    t = pa.table({
        "u": rng.integers(0, 5, n),
        "ts": rng.integers(0, 10_000, n).cumsum(),  # strictly increasing, no ties
        "val": np.where(rng.random(n) < 0.1, np.nan, rng.normal(size=n)),
    })
    out = RollingAggTransformer(
        input_col="val", entity_cols=["u"], time_col="ts", stat="median",
        window=5, output_col="o",
    ).transform(t)
    df = t.to_pandas().sort_values(["u", "ts"], kind="stable")
    ref = df.groupby("u")["val"].apply(
        lambda s: s.rolling(5, min_periods=1).median()
    ).reset_index(level=0, drop=True).sort_index()
    got = np.asarray(out.column("o").to_pylist(), dtype=float)
    exp = ref.to_numpy()
    assert np.allclose(got, exp, equal_nan=True, atol=0)


def test_asof_backward_strict_tolerance():
    left = pa.table({"u": [1, 1, 2, 3], "t": [15, 40, 7, 1], "x": [1.0, 2.0, 3.0, 4.0]})
    right = pa.table({"u": [1, 1, 2], "t": [10, 30, 7], "p": [100.0, 200.0, 300.0]})
    assert asof_join(left, right, by=["u"], left_on="t").column("p").to_pylist() == [100.0, 200.0, 300.0, None]
    assert asof_join(left, right, by=["u"], left_on="t", strict=True).column("p").to_pylist() == [100.0, 200.0, None, None]
    assert asof_join(left, right, by=["u"], left_on="t", tolerance=6).column("p").to_pylist() == [100.0, None, 300.0, None]


def test_asof_right_tiebreak_deterministic(ray_session):
    import ray

    # two right rows at the SAME (entity, time): max seq wins with tiebreak
    left = pa.table({"u": [1, 1], "t": [10, 20], "x": [1.0, 2.0]})
    right = pa.table({"u": [1, 1, 1], "t": [10, 10, 15], "seq": [2, 1, 5], "p": [20.0, 10.0, 50.0]})
    out = asof_join(left, right, by=["u"], left_on="t", right_tiebreak="seq")
    assert out.column("p").to_pylist() == [20.0, 50.0]  # seq=2 beats seq=1 at t=10
    # reversed right arrival order gives the SAME answer
    out2 = asof_join(left, right.take(pa.array([1, 0, 2])), by=["u"], left_on="t", right_tiebreak="seq")
    assert out2.column("p").to_pylist() == [20.0, 50.0]
    # Dataset path agrees with the Table path
    out3 = asof_join(
        ray.data.from_arrow(left),
        ray.data.from_arrow(right),
        by=["u"],
        left_on="t",
        right_tiebreak="seq",
    )
    rows = sorted(out3.take_all(), key=lambda r: r["t"])
    assert [r["p"] for r in rows] == [20.0, 50.0]


def test_asof_zero_leakage_truncation_equivalence():
    """Feature at time t must be identical whether or not future right rows
    exist (SURVEY.md §5 leakage test)."""
    rng = np.random.RandomState(7)
    lt = np.sort(rng.randint(0, 1000, 50))
    rt = np.sort(rng.randint(0, 1000, 80))
    left = pa.table({"u": [1] * 50, "t": lt, "x": rng.rand(50)})
    right = pa.table({"u": [1] * 80, "t": rt, "p": rng.rand(80)})
    full = asof_join(left, right, by=["u"], left_on="t").column("p").to_pylist()
    # truncate right side to rows <= each left time: join against truncated
    # right must give the same answer for that row
    for i in [0, 10, 25, 49]:
        cut = rt <= lt[i]
        r_trunc = right.filter(pa.array(cut))
        got = asof_join(left.slice(i, 1), r_trunc, by=["u"], left_on="t").column("p").to_pylist()[0]
        assert got == full[i]


def test_keyed_window_preserves_row_order(events_t):
    out = LagTransformer(input_col="val", entity_cols=["u"], time_col="ts", output_col="o").transform(events_t)
    assert out.column("ts").to_pylist() == events_t.column("ts").to_pylist()
    assert out.column("u").to_pylist() == events_t.column("u").to_pylist()


def test_time_range_rolling_matches_duckdb(ray_session):
    import duckdb
    import ray

    from kamae_ray.stages.window import TimeRangeRollingTransformer

    rng = np.random.default_rng(71)
    n = 4000
    t = pa.table({
        "u": pa.array(rng.integers(0, 25, n)),
        "ts": pa.array(rng.integers(0, 500, n).astype(np.int64)),  # many ties
        "v": pa.array([None if i % 19 == 0 else float(x) for i, x in enumerate(rng.standard_normal(n))], pa.float64()),
        "rid": pa.array(np.arange(n)),
    })
    tr = TimeRangeRollingTransformer(
        input_col="v", entity_cols=["u"], time_col="ts", stat="sum",
        range_width=50, output_col="w_sum",
    )
    out = tr.transform(t)
    oracle = duckdb.query(
        "SELECT rid, SUM(v) OVER (PARTITION BY u ORDER BY ts "
        "RANGE BETWEEN 50 PRECEDING AND CURRENT ROW) AS w_sum FROM t"
    ).arrow()
    got = dict(zip(out.column("rid").to_pylist(), out.column("w_sum").to_pylist()))
    for r in oracle.to_pylist():
        g, w = got[r["rid"]], r["w_sum"]
        if w is None:
            assert g is None
        else:
            assert g == pytest.approx(w, abs=1e-9), r["rid"]
    # dataset path matches the table path
    ds = ray.data.from_arrow(t).repartition(5)
    refs = [b for b in ray.get(tr.transform(ds).to_arrow_refs()) if b.num_rows]
    dgot = dict(zip(
        pa.concat_tables(refs).column("rid").to_pylist(),
        pa.concat_tables(refs).column("w_sum").to_pylist(),
    ))
    for k, v in got.items():
        assert (dgot[k] is None and v is None) or dgot[k] == pytest.approx(v, abs=1e-9)


def test_time_range_rolling_exclude_current_and_mean():
    from kamae_ray.stages.window import TimeRangeRollingTransformer

    t = pa.table({
        "u": [1, 1, 1, 1],
        "ts": pa.array([0, 10, 10, 25], pa.int64()),
        "v": [1.0, 2.0, 3.0, 4.0],
    })
    inc = TimeRangeRollingTransformer(
        input_col="v", entity_cols=["u"], time_col="ts", stat="sum",
        range_width=15, output_col="s",
    ).transform(t).column("s").to_pylist()
    # peers at ts=10 include each other (SQL RANGE); ts=25 sees [10,25]
    assert inc == [1.0, 6.0, 6.0, 9.0]
    exc = TimeRangeRollingTransformer(
        input_col="v", entity_cols=["u"], time_col="ts", stat="sum",
        range_width=15, include_current=False, output_col="s",
    ).transform(t).column("s").to_pylist()
    # strict t' < t: peers excluded; ts=0 has empty window -> null
    assert exc == [None, 1.0, 1.0, 5.0]
    mean = TimeRangeRollingTransformer(
        input_col="v", entity_cols=["u"], time_col="ts", stat="mean",
        range_width=15, min_periods=2, output_col="m",
    ).transform(t).column("m").to_pylist()
    assert mean[0] is None and mean[1] == pytest.approx(2.0) and mean[3] == pytest.approx(3.0)


def test_window_rank_methods_vs_duckdb(ray_session):
    """All five ranking window functions vs SQL, Dataset path, tie-prone and
    unique order keys."""
    import duckdb
    import ray

    from kamae_ray.stages import WindowRankTransformer
    from kamae_ray.stages.window import apply_sorted

    rng = np.random.RandomState(9)
    n = 800
    t = pa.table({
        "u": pa.array([int(rng.randint(10)) for _ in range(n)], pa.int64()),
        "ts": pa.array([int(rng.randint(25)) for _ in range(n)], pa.int64()),
        "uid": pa.array(list(range(n)), pa.int64()),
    })
    mk = lambda m, col, out: WindowRankTransformer(  # noqa: E731
        entity_cols=["u"], time_col=col, method=m, n_tiles=3, output_col=out
    )
    out = apply_sorted(
        ray.data.from_arrow(t).repartition(5),
        mk("row_number", "uid", "rn"), mk("rank", "ts", "rk"),
        mk("dense_rank", "ts", "drk"), mk("percent_rank", "ts", "prk"),
        mk("ntile", "uid", "nt"), mk("cume_dist", "ts", "cd"),
    ).to_pandas().sort_values(["u", "uid"]).reset_index(drop=True)
    oracle = duckdb.sql(
        "SELECT u, uid, row_number() OVER (PARTITION BY u ORDER BY uid) rn, "
        "rank() OVER (PARTITION BY u ORDER BY ts) rk, "
        "dense_rank() OVER (PARTITION BY u ORDER BY ts) drk, "
        "percent_rank() OVER (PARTITION BY u ORDER BY ts) prk, "
        "ntile(3) OVER (PARTITION BY u ORDER BY uid) nt, "
        "cume_dist() OVER (PARTITION BY u ORDER BY ts) cd FROM t"
    ).df().sort_values(["u", "uid"]).reset_index(drop=True)
    for c in ("rn", "rk", "drk", "nt"):
        assert out[c].astype(int).tolist() == oracle[c].astype(int).tolist(), c
    assert np.allclose(out["prk"].to_numpy(), oracle["prk"].to_numpy(), atol=1e-12)
    assert np.allclose(out["cd"].to_numpy(), oracle["cd"].to_numpy(), atol=1e-12)


def test_ewm_mean_vs_pandas(ray_session):
    """EwmMeanTransformer vs pandas ewm(adjust=False, ignore_na=True) over
    grouped data with nulls, Dataset path, several alphas."""
    import pandas as pd
    import ray

    from kamae_ray.stages import EwmMeanTransformer

    rng = np.random.RandomState(4)
    n = 2000
    df = pd.DataFrame({
        "u": rng.randint(0, 12, n),
        "o": rng.permutation(n),
        "x": np.where(rng.rand(n) < 0.15, np.nan, rng.standard_normal(n)),
    })
    t = pa.table({"u": df["u"].astype("int64"), "o": df["o"].astype("int64"),
                  "x": pa.array([None if np.isnan(v) else float(v) for v in df["x"]], pa.float64())})
    for alpha in (0.1, 0.5, 0.95):
        got = (
            EwmMeanTransformer(input_col="x", entity_cols=["u"], time_col="o",
                               alpha=alpha, output_col="y")
            .transform(ray.data.from_arrow(t).repartition(5))
            .to_pandas().sort_values(["u", "o"]).reset_index(drop=True)
        )
        exp = (
            df.sort_values(["u", "o"])
            .groupby("u")["x"]
            .transform(lambda s: s.ewm(alpha=alpha, adjust=False, ignore_na=True).mean())
            .reset_index(drop=True)
        )
        a = got["y"].to_numpy()
        b = exp.to_numpy()
        assert ((np.isnan(a) & np.isnan(b)) | np.isclose(a, b, atol=1e-8)).all(), alpha


def test_funnel_vs_duckdb(ray_session):
    """Ordered funnel: strict-after chaining, stalls, nulls, Dataset==Table."""
    import duckdb
    import ray

    from kamae_ray.stages.window import funnel

    rng = np.random.RandomState(11)
    n = 2000
    t = pa.table({
        "u": pa.array([int(rng.randint(40)) for _ in range(n)], pa.int64()),
        "ts": pa.array([int(rng.randint(1000)) for _ in range(n)], pa.int64()),
        "ev": pa.array([str(rng.choice(["a", "b", "c", "x"])) for _ in range(n)]),
    })
    want = funnel(t, "u", "ts", "ev", ["a", "b", "c"]).sort_by("u")
    oracle = duckdb.sql(
        "WITH u AS (SELECT DISTINCT u FROM t), "
        "s1 AS (SELECT u, min(ts) t1 FROM t WHERE ev='a' GROUP BY u), "
        "s2 AS (SELECT t.u, min(t.ts) t2 FROM t JOIN s1 USING(u) WHERE t.ev='b' AND t.ts > s1.t1 GROUP BY t.u), "
        "s3 AS (SELECT t.u, min(t.ts) t3 FROM t JOIN s2 USING(u) WHERE t.ev='c' AND t.ts > s2.t2 GROUP BY t.u) "
        "SELECT u.u, s1.t1, s2.t2, s3.t3 FROM u LEFT JOIN s1 USING(u) "
        "LEFT JOIN s2 USING(u) LEFT JOIN s3 USING(u) ORDER BY u"
    ).df()
    got = want.to_pandas()
    for eng_c, ora_c in [("step1_ts", "t1"), ("step2_ts", "t2"), ("step3_ts", "t3")]:
        a, b = got[eng_c], oracle[ora_c]
        assert list(a.where(a.notna(), None)) == list(b.where(b.notna(), None)), eng_c
    ds_out = funnel(ray.data.from_arrow(t).repartition(5), "u", "ts", "ev", ["a", "b", "c"])
    ds_t = pa.concat_tables(
        [pa.table(b) for b in ds_out.iter_batches(batch_format="pyarrow")]
    ).sort_by("u")
    assert ds_t.equals(want)


def test_retention_cohorts_vs_duckdb(ray_session):
    """Daily retention cohorts: Dataset == Table == SQL, incl. null times."""
    import duckdb
    import ray

    from kamae_ray.stages.window import retention_cohorts

    rng = np.random.RandomState(13)
    n = 3000
    t = pa.table({
        "u": pa.array([int(rng.randint(80)) for _ in range(n)], pa.int64()),
        "ts": pa.array([None if rng.rand() < 0.02 else int(rng.randint(0, 40 * 86400)) * 1_000_000
                        for _ in range(n)], pa.int64()),
    })
    want = retention_cohorts(t, "u", "ts").sort_by([("cohort", "ascending"), ("age", "ascending")])
    con = duckdb.connect()
    con.register("t", t)
    ora = con.sql(
        "WITH v AS (SELECT u, ts // 86400000000 AS d FROM t WHERE ts IS NOT NULL), "
        "f AS (SELECT u, min(d) AS cohort FROM v GROUP BY u) "
        "SELECT cohort, age, count(DISTINCT u) AS n FROM ("
        "SELECT v.u, f.cohort, v.d - f.cohort AS age FROM v JOIN f USING (u)) "
        "GROUP BY 1, 2 ORDER BY 1, 2"
    ).df()
    assert want.column("cohort").to_pylist() == ora["cohort"].astype(int).tolist()
    assert want.column("age").to_pylist() == ora["age"].astype(int).tolist()
    assert want.column("n_entities").to_pylist() == ora["n"].astype(int).tolist()
    ds_out = retention_cohorts(ray.data.from_arrow(t).repartition(5), "u", "ts")
    got = pa.concat_tables(
        [pa.table(b) for b in ds_out.iter_batches(batch_format="pyarrow")]
    ).sort_by([("cohort", "ascending"), ("age", "ascending")])
    assert got.equals(want)


def test_merge_intervals_vs_duckdb(ray_session):
    """Gaps-and-islands coalescing: numeric + timestamp domains, min_gap,
    Dataset == Table."""
    import duckdb
    import ray

    from kamae_ray.stages.window import merge_intervals

    rng = np.random.RandomState(17)
    n = 2500
    u = rng.randint(0, 40, n)
    s = rng.randint(0, 800, n).astype(float)
    e = s + rng.randint(1, 50, n)
    t = pa.table({"u": pa.array(u, pa.int64()), "s": pa.array(s), "e": pa.array(e)})
    want = merge_intervals(t, "u", "s", "e").sort_by(
        [("u", "ascending"), ("island_start", "ascending")]
    )
    con = duckdb.connect()
    con.register("t", t)
    ora = con.sql(
        "WITH o AS (SELECT u, s, e, max(e) OVER (PARTITION BY u ORDER BY s, e "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM t), "
        "m AS (SELECT u, s, e, CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS brk FROM o), "
        "g AS (SELECT u, s, e, sum(brk) OVER (PARTITION BY u ORDER BY s, e) AS isl FROM m) "
        "SELECT u, min(s) st, max(e) en, count(*) c FROM g GROUP BY u, isl ORDER BY u, st"
    ).df()
    assert want.column("u").to_pylist() == ora["u"].astype(int).tolist()
    assert np.allclose(want.column("island_start").to_numpy(zero_copy_only=False), ora["st"])
    assert np.allclose(want.column("island_end").to_numpy(zero_copy_only=False), ora["en"])
    assert want.column("n_intervals").to_pylist() == ora["c"].astype(int).tolist()
    # timestamp domain must be exact at real epoch magnitudes (ulp trap)
    base = 1_700_000_000_000_000
    t2 = pa.table({
        "u": pa.array(u, pa.int64()),
        "s": pa.array((s * 1_000_000 + base).astype("int64")).cast(pa.timestamp("us")),
        "e": pa.array((e * 1_000_000 + base).astype("int64")).cast(pa.timestamp("us")),
    })
    got_ts = merge_intervals(t2, "u", "s", "e").sort_by(
        [("u", "ascending"), ("island_start", "ascending")]
    )
    import pyarrow.compute as pc

    ist = pc.cast(got_ts.column("island_start"), pa.int64()).to_numpy(zero_copy_only=False)
    assert np.array_equal(
        ist,
        (want.column("island_start").to_numpy(zero_copy_only=False) * 1_000_000 + base).astype("int64"),
    )
    # min_gap merges near-adjacent islands
    t3 = pa.table({"u": pa.array([1, 1], pa.int64()), "s": pa.array([0.0, 12.0]), "e": pa.array([10.0, 20.0])})
    assert merge_intervals(t3, "u", "s", "e").num_rows == 2
    assert merge_intervals(t3, "u", "s", "e", min_gap=2.0).num_rows == 1
    # Dataset path
    ds_out = merge_intervals(ray.data.from_arrow(t).repartition(5), "u", "s", "e")
    got = pa.concat_tables(
        [pa.table(b) for b in ds_out.iter_batches(batch_format="pyarrow")]
    ).sort_by([("u", "ascending"), ("island_start", "ascending")])
    assert got.equals(want)


def test_review_fixes_retention_units_intervals_guard(ray_session):
    """retention_cohorts scales by the timestamp column's native unit;
    merge_intervals rejects end < start."""
    from kamae_ray.stages.window import merge_intervals, retention_cohorts

    days = np.array([0, 0, 1, 5, 5, 9], dtype=np.int64)
    users = pa.array([1, 2, 1, 1, 2, 2], pa.int64())
    want = None
    for unit, per in [("s", 1), ("ms", 1_000), ("us", 1_000_000), ("ns", 1_000_000_000)]:
        ts = pa.array(days * 86_400 * per).cast(pa.timestamp(unit))
        out = retention_cohorts(pa.table({"u": users, "ts": ts}), "u", "ts").sort_by(
            [("cohort", "ascending"), ("age", "ascending")]
        )
        if want is None:
            want = out
        else:
            assert out.equals(want), unit  # unit-invariant buckets
    # both users join in period 0: cells merge across them
    assert want.column("age").to_pylist() == [0, 1, 5, 9]
    assert want.column("n_entities").to_pylist() == [2, 1, 2, 1]

    bad = pa.table({"u": pa.array([1], pa.int64()),
                    "s": pa.array([10.0]), "e": pa.array([3.0])})
    with pytest.raises(ValueError, match="end < start"):
        merge_intervals(bad, "u", "s", "e")


class TestScd2Build:
    def test_matches_lag_lead_sql(self):
        import duckdb

        from kamae_ray.stages.window import scd2_build

        rng = np.random.default_rng(3)
        n = 4000
        t = pa.table({
            "k": pa.array(rng.integers(0, 150, n)),
            "ts": pa.array(rng.integers(0, 800, n)),
            "eid": pa.array(np.arange(n)),
            "val": pa.array(rng.choice(["a", "b", None], n).tolist(), pa.string()),
        })
        out = scd2_build(t, "k", "ts", ["val"], tiebreak_col="eid", carry_cols=["eid"])
        ora = duckdb.query("""
            WITH s AS (SELECT k, ts, eid, val FROM t WHERE ts IS NOT NULL),
            o AS (SELECT *, LAG(val) OVER w AS prev, ROW_NUMBER() OVER w AS rn
                  FROM s WINDOW w AS (PARTITION BY k ORDER BY ts, eid)),
            ch AS (SELECT k, ts, eid, val FROM o WHERE rn = 1 OR (prev IS DISTINCT FROM val)),
            v AS (SELECT k, eid, val, ts AS valid_from, LEAD(ts) OVER w2 AS valid_to,
                  ROW_NUMBER() OVER w2 AS version
                  FROM ch WINDOW w2 AS (PARTITION BY k ORDER BY ts, eid))
            SELECT k, eid, val, valid_from, valid_to, CAST(version AS BIGINT) AS version,
                   valid_to IS NULL AS is_current FROM v ORDER BY k, version
        """).arrow()
        eng = out.select(ora.column_names).sort_by(
            [("k", "ascending"), ("version", "ascending")]).combine_chunks()
        assert eng.equals(ora.cast(eng.schema).combine_chunks())

    def test_multi_attr_and_timestamps(self):
        from kamae_ray.stages.window import scd2_build

        ts = pa.array([1, 2, 3, 4], pa.timestamp("us"))
        t = pa.table({
            "k": pa.array([1, 1, 1, 1]),
            "ts": ts,
            "a": pa.array(["x", "x", "y", "y"]),
            "b": pa.array([1, 2, 2, 2], pa.int64()),
        })
        out = scd2_build(t, "k", "ts", ["a", "b"])
        # versions: (x,1)@1, (x,2)@2, (y,2)@3; row4 unchanged
        assert out.column("version").to_pylist() == [1, 2, 3]
        assert out.column("valid_to").to_pylist()[-1] is None
        assert out.column("is_current").to_pylist() == [False, False, True]
        assert str(out.column("valid_from").type) == "timestamp[us]"

    def test_dataset_matches_table(self, ray_session):
        import ray

        from kamae_ray.stages.window import scd2_build

        rng = np.random.default_rng(5)
        n = 3000
        t = pa.table({
            "k": pa.array(rng.integers(0, 60, n)),
            "ts": pa.array(rng.integers(0, 500, n)),
            "eid": pa.array(np.arange(n)),
            "val": pa.array(rng.choice(["a", "b"], n).tolist(), pa.string()),
        })
        want = scd2_build(t, "k", "ts", ["val"], tiebreak_col="eid",
                          carry_cols=["eid"]).sort_by([("k", "ascending"), ("version", "ascending")])
        ds = ray.data.from_arrow(t).repartition(6)
        got = pa.concat_tables(
            [pa.table(b) for b in scd2_build(ds, "k", "ts", ["val"], tiebreak_col="eid",
                                             carry_cols=["eid"]).iter_batches(batch_format="pyarrow")]
        ).sort_by([("k", "ascending"), ("version", "ascending")])
        assert got.select(want.column_names).combine_chunks().equals(want.combine_chunks())


class TestTimeWeightedAvg:
    def test_matches_hugeint_lead_sql(self):
        import duckdb

        from kamae_ray.stages.window import time_weighted_avg

        rng = np.random.default_rng(0)
        n = 6000
        t = pa.table({
            "u": pa.array(rng.integers(0, 150, n)),
            "ts": pa.array(rng.integers(0, 10**9, n), pa.int64()).cast(pa.timestamp("us")),
            "v": pa.array(np.round(rng.normal(50, 10, n), 2)),
        })
        out = time_weighted_avg(t, "u", "ts", "v")
        ora = duckdb.query("""
            WITH s AS (SELECT u, epoch_us(ts) AS tu, CAST(round(v * 100) AS BIGINT) AS cents
                       FROM t WHERE ts IS NOT NULL AND v IS NOT NULL),
            d AS (SELECT u, tu, cents, LEAD(tu) OVER (PARTITION BY u ORDER BY tu) AS nxt FROM s),
            g AS (SELECT u, COUNT(*)::BIGINT AS n_obs,
                  SUM(CASE WHEN nxt IS NULL THEN 0 ELSE CAST((nxt - tu) AS HUGEINT) * cents END) AS num,
                  SUM(CASE WHEN nxt IS NULL THEN 0 ELSE nxt - tu END)::BIGINT AS duration_us
                  FROM d GROUP BY u)
            SELECT u, CASE WHEN duration_us = 0 THEN NULL
                   ELSE ROUND(CAST(num AS DOUBLE) / (CAST(duration_us AS DOUBLE) * 100), 6) END AS twap,
                   n_obs, COALESCE(duration_us, 0) AS duration_us FROM g ORDER BY u
        """).arrow()
        import pyarrow.compute as pc2

        eng = pa.table({
            "u": out.column("u"),
            "twap": pc2.round(out.column("twap"), ndigits=6,
                              round_mode="half_towards_infinity"),
            "n_obs": out.column("n_obs"), "duration_us": out.column("duration_us"),
        }).sort_by("u").combine_chunks()
        assert eng.equals(ora.cast(eng.schema).combine_chunks())

    def test_hand_computed_and_single_obs(self):
        from kamae_ray.stages.window import time_weighted_avg

        ts = pa.array([0, 10, 30], pa.int64()).cast(pa.timestamp("us"))
        t = pa.table({"u": [1, 1, 1], "ts": ts, "v": [10.0, 40.0, 99.0]})
        out = time_weighted_avg(t, "u", "ts", "v")
        # (10us * 10 + 20us * 40) / 30us = 30.0 (the last value never counts)
        assert out.column("twap").to_pylist() == [30.0]
        one = pa.table({"u": [1], "ts": ts.slice(0, 1), "v": [5.0]})
        out1 = time_weighted_avg(one, "u", "ts", "v")
        assert out1.column("twap").to_pylist() == [None]
        assert out1.column("n_obs").to_pylist() == [1]

    def test_dataset_matches_table(self, ray_session):
        import ray

        from kamae_ray.stages.window import time_weighted_avg

        rng = np.random.default_rng(1)
        n = 3000
        t = pa.table({
            "u": pa.array(rng.integers(0, 50, n)),
            "ts": pa.array(rng.integers(0, 10**8, n), pa.int64()).cast(pa.timestamp("us")),
            "v": pa.array(np.round(rng.normal(0, 5, n), 2)),
        })
        want = time_weighted_avg(t, "u", "ts", "v").sort_by("u")
        ds = ray.data.from_arrow(t).repartition(5)
        got = pa.concat_tables(
            [pa.table(b) for b in time_weighted_avg(ds, "u", "ts", "v")
             .iter_batches(batch_format="pyarrow")]).sort_by("u")
        assert got.select(want.column_names).combine_chunks().equals(want.combine_chunks())


class TestTwapAdviceFixes:
    def test_half_boundary_rounds_away_from_zero(self):
        """0.005*100 lands EXACTLY on 0.5 in float64 — the engine must round
        half-away like DuckDB round(), not half-even (ADVICE r4)."""
        import duckdb

        from kamae_ray.stages.window import time_weighted_avg

        ts = pa.array([0, 10, 20, 30, 40], pa.int64()).cast(pa.timestamp("us"))
        vals = [0.005, 0.015, -0.005, 0.025, 1.0]  # all v*100 exactly on .5
        t = pa.table({"u": [1] * 5, "ts": ts, "v": vals})
        out = time_weighted_avg(t, "u", "ts", "v")
        ora = duckdb.query(
            "WITH s AS (SELECT CAST(round(v * 100) AS BIGINT) AS cents, "
            "epoch_us(ts) tu FROM t), "
            "d AS (SELECT cents, LEAD(tu) OVER (ORDER BY tu) - tu AS dt FROM s) "
            "SELECT CAST(SUM(CAST(dt AS HUGEINT) * cents) AS DOUBLE) / "
            "(SUM(dt) * 100.0) AS twap FROM d WHERE dt IS NOT NULL"
        ).fetchone()[0]
        assert out.column("twap").to_pylist() == [ora]
        # duckdb round(0.5)=1, round(-0.5)=-1: (10*1 + 10*2 + 10*-1 + 10*3)/40/100
        assert out.column("twap").to_pylist() == [(1 + 2 - 1 + 3) * 10 / 40 / 100]

    def test_per_entity_sum_overflow_raises(self):
        """Terms that each fit int64 but whose per-entity SUM exceeds 2^62
        must raise, never silently wrap (ADVICE r4)."""
        import pytest

        from kamae_ray.stages.window import time_weighted_avg

        dt = 2 ** 40
        ts = pa.array([i * dt for i in range(6)], pa.int64()).cast(pa.timestamp("us"))
        v = float(2 ** 21) / 100  # cents = 2^21 -> term = 2^61 each, sum = 5*2^61
        t = pa.table({"u": [1] * 6, "ts": ts, "v": [v] * 6})
        with pytest.raises(ValueError, match="overflows int64"):
            time_weighted_avg(t, "u", "ts", "v")


def test_rolling_quantile_matches_pandas_reference():
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from kamae_ray.stages import RollingAggTransformer

    rng = np.random.default_rng(21)
    n = 3000
    t = pa.table({
        "u": pa.array(rng.integers(0, 20, n)),
        "ts": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(np.round(rng.standard_normal(n) * 50, 3)),
    })
    for q, w in ((0.9, 7), (0.25, 4), (0.5, 5)):
        r = RollingAggTransformer(
            input_col="v", entity_cols=["u"], time_col="ts",
            stat="quantile", q=q, window=w, min_periods=1, output_col="rq",
        )
        got = r.transform(t)
        df = pd.DataFrame({"u": t.column("u").to_pylist(), "v": t.column("v").to_pylist()})
        exp = df.groupby("u")["v"].transform(
            lambda s: s.rolling(w, min_periods=1).quantile(q, interpolation="linear")
        ).to_numpy()
        assert got.column("rq").to_pylist() == exp.tolist(), (q, w)


def test_window_value_gather_preserves_types():
    import numpy as np
    import pyarrow as pa

    from kamae_ray.stages import WindowValueTransformer

    # string channel + exact int64-us timestamps (values float64 would alias)
    base = 1 << 60
    t = pa.table({
        "u": pa.array([0, 0, 0, 1, 1]),
        "ts": pa.array([base + 2, base + 1, base + 3, base + 130, base + 129],
                       pa.timestamp("us")),
        "ch": pa.array(["b", "a", None, "y", "x"]),
    })
    first_ch = WindowValueTransformer(
        input_col="ch", entity_cols=["u"], time_col="ts",
        method="first_value", output_col="fc",
    ).transform_batch(t)
    assert first_ch.column("fc").to_pylist() == ["a", "a", "a", "x", "x"]
    assert first_ch.column("fc").type == pa.string()
    first_ts = WindowValueTransformer(
        input_col="ts", entity_cols=["u"], time_col="ts",
        method="first_value", output_col="ft",
    ).transform_batch(t)
    got = pa.compute.cast(first_ts.column("ft"), pa.int64()).to_pylist()
    # exact: +129 beats +130 even though both alias in float64 at 2^60
    assert got == [base + 1] * 3 + [base + 129] * 2
    last_ch = WindowValueTransformer(
        input_col="ch", entity_cols=["u"], time_col="ts",
        method="last_value", output_col="lc",
    ).transform_batch(t)
    assert last_ch.column("lc").to_pylist() == [None, None, None, "y", "y"]


def test_session_drift_dataset_matches_table_and_nulls(ray_session):
    import ray

    from kamae_ray.stages.window import session_drift

    rng = np.random.default_rng(9)
    n = 2000
    ts = np.sort(rng.integers(0, 10**9, n)) * 1000 + 1_700_000_000_000_000
    types = rng.choice(["view", "click", "purchase", "", "signup"], n).astype(object)
    types[rng.random(n) < 0.05] = None
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 40, n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "event_id": pa.array(np.arange(n), pa.int64()),
        "event_type": pa.array(list(types), pa.string()),
    })
    want = session_drift(t, "user_id", "ts", "event_id", "event_type",
                         50_000_000_000, max_seq=8).sort_by(
        [("user_id", "ascending"), ("session_id", "ascending")])
    ds = ray.data.from_arrow(t).repartition(5)
    got = pa.concat_tables(
        [pa.table(x) for x in session_drift(ds, "user_id", "ts", "event_id",
                                            "event_type", 50_000_000_000, max_seq=8)
         .iter_batches(batch_format="pyarrow")]
    ).sort_by([("user_id", "ascending"), ("session_id", "ascending")])
    assert got.cast(want.schema).equals(want)
    assert want.num_rows > 0
    import pyarrow.compute as pc

    assert pc.max(pc.utf8_length(want.column("seq"))).as_py() <= 8


def test_scd2_merge_equals_rebuild_and_guards(ray_session):
    import duckdb
    import ray

    from kamae_ray.stages.window import scd2_build, scd2_merge

    rng = np.random.default_rng(11)
    n = 3000
    uid = rng.integers(0, 80, n)
    ts = np.sort(rng.integers(0, 10**6, n)) * 1000
    t = pa.table({"user_id": pa.array(uid, pa.int64()),
                  "ts": pa.array(ts, pa.timestamp("us")),
                  "event_id": pa.array(np.arange(n), pa.int64()),
                  "event_type": pa.array(list(rng.choice(["a", "b", None], n)),
                                         pa.string())})
    cutoff = 5 * 10**8  # microseconds; ts spans [0, 1e9) us
    old = t.filter(pa.array(ts < cutoff))
    post = t.filter(pa.array(ts >= cutoff))
    assert old.num_rows > 0 and post.num_rows > 0
    con = duckdb.connect()
    con.register("post", post)
    snap = con.sql(
        "SELECT user_id, event_id, event_type, ts FROM (SELECT *, row_number() "
        "OVER (PARTITION BY user_id ORDER BY ts DESC, event_id) rn FROM post) "
        "WHERE rn = 1").arrow()
    dim = scd2_build(old, "user_id", "ts", ["event_type"],
                     tiebreak_col="event_id", carry_cols=["event_id"])
    want = scd2_merge(dim, snap, "user_id", "ts", ["event_type"],
                      carry_cols=["event_id"])
    cols = ["user_id", "ts", "event_id", "event_type"]
    uni = pa.concat_tables([old.select(cols), snap.select(cols).cast(old.select(cols).schema)])
    rebuilt = scd2_build(uni, "user_id", "ts", ["event_type"],
                         tiebreak_col="event_id", carry_cols=["event_id"])
    key = [("user_id", "ascending"), ("version", "ascending")]
    assert want.sort_by(key).select(rebuilt.column_names).cast(
        rebuilt.schema).equals(rebuilt.sort_by(key))
    # dataset path agrees
    dim_ds = ray.data.from_arrow(dim).repartition(4)
    snap_ds = ray.data.from_arrow(snap).repartition(3)
    got = pa.concat_tables(
        [pa.table(x) for x in scd2_merge(dim_ds, snap_ds, "user_id", "ts",
                                         ["event_type"], carry_cols=["event_id"])
         .iter_batches(batch_format="pyarrow")])
    assert got.sort_by(key).cast(want.sort_by(key).schema).equals(want.sort_by(key))
    # guards: duplicate snapshot keys; non-later snapshot time
    dup = pa.concat_tables([snap, snap.slice(0, 1)])
    with pytest.raises(ValueError):
        scd2_merge(dim, dup, "user_id", "ts", ["event_type"], carry_cols=["event_id"])
    stale = snap.set_column(snap.schema.get_field_index("ts"), "ts",
                            pa.array(np.zeros(snap.num_rows, np.int64),
                                     pa.timestamp("us")))
    with pytest.raises(ValueError):
        scd2_merge(dim, stale, "user_id", "ts", ["event_type"], carry_cols=["event_id"])
    # empty CDC batch is a no-op
    noop = scd2_merge(dim, snap.slice(0, 0), "user_id", "ts", ["event_type"],
                      carry_cols=["event_id"])
    assert noop.sort_by(key).equals(dim.select(noop.column_names).sort_by(key))


def test_change_point_by_entity_planted_shift_and_dataset(ray_session):
    import duckdb
    import ray

    from kamae_ray.stages.window import change_point_by_entity

    rng = np.random.default_rng(2)
    n = 3000
    e = rng.integers(0, 40, n)
    t = np.sort(rng.integers(0, 10**6, n))
    v = rng.integers(0, 100, n)
    v[(e == 0) & (t > 500_000)] += 500  # planted level shift
    tt = pa.table({"e": pa.array(e, pa.int64()), "t": pa.array(t, pa.int64()),
                   "id": pa.array(np.arange(n), pa.int64()),
                   "v": pa.array(v, pa.int64())})
    want = change_point_by_entity(tt, "e", "t", "id", "v").sort_by("entity")
    con = duckdb.connect()
    con.register("src", tt)
    exp = con.sql("""
        WITH o AS (SELECT e, t, id, v, SUM(v) OVER (PARTITION BY e ORDER BY t, id
          ROWS UNBOUNDED PRECEDING) AS s1, ROW_NUMBER() OVER (PARTITION BY e
          ORDER BY t, id) AS k, COUNT(*) OVER (PARTITION BY e) AS n,
          SUM(v) OVER (PARTITION BY e) AS s FROM src),
        c AS (SELECT e, t, k, n, CAST(s1*(n-k) - (s-s1)*k AS BIGINT) AS d
          FROM o WHERE k < n),
        sc AS (SELECT e, t, k, (CAST(d AS DOUBLE)*CAST(d AS DOUBLE)) /
          CAST(k*(n-k) AS DOUBLE) AS score FROM c),
        p AS (SELECT *, row_number() OVER (PARTITION BY e ORDER BY score DESC, k) rn
          FROM sc)
        SELECT e AS entity, t AS split_t, CAST(k AS BIGINT) AS k, score
        FROM p WHERE rn = 1 ORDER BY entity""").arrow()
    assert want.equals(exp.cast(want.schema))
    r0 = [r for r in want.to_pylist() if r["entity"] == 0][0]
    assert abs(r0["split_t"] - 500_000) < 80_000  # shift located
    ds = ray.data.from_arrow(tt).repartition(5)
    got = pa.concat_tables(
        [pa.table(x) for x in change_point_by_entity(ds, "e", "t", "id", "v")
         .iter_batches(batch_format="pyarrow")]
    ).sort_by("entity")
    assert got.cast(want.schema).equals(want)
