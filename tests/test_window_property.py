"""Property-based tests: Rolling/Cumulative/Backfill window kernels vs pandas
groupby references over random entity/time data (unique timestamps per entity
— tie order within equal timestamps is arrival order and not pinned)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kamae_ray.stages import (
    BackfillTransformer,
    CumulativeAggTransformer,
    RollingAggTransformer,
)


@st.composite
def keyed_series(draw):
    n = draw(st.integers(1, 120))
    n_ent = draw(st.integers(1, 5))
    ent = draw(st.lists(st.integers(0, n_ent - 1), min_size=n, max_size=n))
    rng = np.random.RandomState(draw(st.integers(0, 1000)))
    t = rng.permutation(n * 3)[:n]  # unique times overall -> unique per entity
    vals = [
        draw(st.one_of(st.floats(-50, 50), st.none()))
        for _ in range(n)
    ]
    return ent, t, vals


def _table(ent, t, vals):
    return pa.table(
        {
            "u": pa.array(ent, pa.int64()),
            "ts": pa.array(t, pa.int64()),
            "v": pa.array(vals, pa.float64()),
            "rid": pa.array(np.arange(len(ent))),
        }
    )


def _df(ent, t, vals):
    return pd.DataFrame({"u": ent, "ts": t, "v": vals, "rid": np.arange(len(ent))})


@given(keyed_series(), st.sampled_from(["sum", "mean", "min", "max"]), st.integers(1, 5))
@settings(max_examples=40, deadline=None)
def test_rolling_matches_pandas(data, stat, window):
    ent, t, vals = data
    out = RollingAggTransformer(
        input_col="v", entity_cols=["u"], time_col="ts", stat=stat, window=window, output_col="o"
    ).transform_batch(_table(ent, t, vals))
    got = pd.Series(out.column("o").to_pylist(), dtype=float)
    df = _df(ent, t, vals).sort_values(["u", "ts"])
    ref = (
        df.groupby("u")["v"]
        .rolling(window, min_periods=1)
        .agg(stat)
        .reset_index(level=0, drop=True)
    )
    df["ref"] = ref
    expect = df.sort_values("rid")["ref"].reset_index(drop=True)
    pd.testing.assert_series_equal(got, expect, check_names=False, atol=1e-9)


@given(keyed_series(), st.sampled_from(["sum", "mean"]), st.booleans())
@settings(max_examples=40, deadline=None)
def test_cumulative_matches_pandas(data, stat, include_current):
    ent, t, vals = data
    out = CumulativeAggTransformer(
        input_col="v", entity_cols=["u"], time_col="ts", stat=stat,
        include_current=include_current, output_col="o",
    ).transform_batch(_table(ent, t, vals))
    got = pd.Series(out.column("o").to_pylist(), dtype=float)
    df = _df(ent, t, vals).sort_values(["u", "ts"])

    def per_group(s):
        e = s.expanding().agg(stat)
        if not include_current:
            e = e.shift(1)
        return e

    df["ref"] = df.groupby("u")["v"].transform(per_group)
    expect = df.sort_values("rid")["ref"].reset_index(drop=True)
    pd.testing.assert_series_equal(got, expect, check_names=False, atol=1e-9)


@given(keyed_series(), st.sampled_from(["ffill", "bfill"]))
@settings(max_examples=40, deadline=None)
def test_backfill_matches_pandas(data, method):
    ent, t, vals = data
    out = BackfillTransformer(
        input_col="v", entity_cols=["u"], time_col="ts", method=method, output_col="o"
    ).transform_batch(_table(ent, t, vals))
    got = pd.Series(out.column("o").to_pylist(), dtype=float)
    df = _df(ent, t, vals).sort_values(["u", "ts"])
    df["ref"] = getattr(df.groupby("u")["v"], method)()
    expect = df.sort_values("rid")["ref"].reset_index(drop=True).astype(float)
    pd.testing.assert_series_equal(got, expect, check_names=False, atol=1e-9)


def test_rolling_corr_vs_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray

    from kamae_ray.stages.window import rolling_corr

    rng = np.random.default_rng(11)
    n = 400
    e = rng.choice(["a", "b", "c"], n)
    t = rng.permutation(n).astype(np.int64)  # unique order key
    x = rng.integers(-50, 50, n)
    y = x * 2 + rng.integers(-30, 30, n)  # correlated
    tbl = pa.table({"e": e, "t": t, "x": x, "y": y})
    out = rolling_corr(tbl, "e", "t", "x", "y", window=7, min_periods=2)
    got = out.column("roll_corr").to_pylist()
    # pandas reference in the same per-entity time order
    df = pd.DataFrame({"e": e, "t": t, "x": x, "y": y, "i": np.arange(n)})
    df = df.sort_values(["e", "t"])
    # manual per-row window reference
    exp = [None] * n
    for ent, sub in df.groupby("e"):
        xs = sub["x"].to_numpy(); ys = sub["y"].to_numpy(); idx = sub["i"].to_numpy()
        for j in range(len(xs)):
            lo = max(0, j - 6)
            wx, wy = xs[lo:j + 1], ys[lo:j + 1]
            c = len(wx)
            if c < 2:
                continue
            num = c * int((wx * wy).sum()) - int(wx.sum()) * int(wy.sum())
            da = c * int((wx * wx).sum()) - int(wx.sum()) ** 2
            db = c * int((wy * wy).sum()) - int(wy.sum()) ** 2
            if da > 0 and db > 0:
                exp[idx[j]] = num / (np.sqrt(float(da)) * np.sqrt(float(db)))
    assert got == exp
    # dataset path identical (sorted by t)
    ds = ray.data.from_arrow(tbl).repartition(3)
    rows = {r["t"]: r["roll_corr"] for r in
            rolling_corr(ds, "e", "t", "x", "y", window=7, min_periods=2).take_all()}
    assert rows == {tt: g for tt, g in zip(t.tolist(), got)}
    # null input rejected
    with pytest.raises(ValueError):
        rolling_corr(pa.table({"e": ["a"], "t": [1], "x": pa.array([None], pa.int64()),
                               "y": [1]}), "e", "t", "x", "y", window=3)
    # overflow guard trips on huge values
    with pytest.raises(ValueError):
        rolling_corr(pa.table({"e": ["a", "a"], "t": [1, 2],
                               "x": [2**31, 2**31], "y": [1, 2]}),
                     "e", "t", "x", "y", window=10**6)


def test_cusum_flags(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from kamae_ray.stages.window import cusum_flags

    # recurrence reference: s_up = max(0, s+d), s_dn = max(0, s-d)
    rng = np.random.default_rng(21)
    n = 300
    e = rng.choice(["a", "b"], n)
    t = rng.permutation(n).astype(np.int64)
    x = rng.integers(0, 20, n)
    tbl = pa.table({"e": e, "t": t, "x": x})
    out = cusum_flags(tbl, "e", "t", "x", target_ppm=9_500_000,
                      threshold_ppm=40_000_000)
    up = out.column("cusum_up").to_pylist()
    dn = out.column("cusum_dn").to_pylist()
    al = out.column("cusum_alarm").to_pylist()
    import pandas as pd
    df = pd.DataFrame({"e": e, "t": t, "x": x, "i": np.arange(n)}).sort_values(["e", "t"])
    exp_up, exp_dn = [0] * n, [0] * n
    for ent, sub in df.groupby("e"):
        su = sd = 0
        for _, row in sub.iterrows():
            d = int(row["x"]) * 1_000_000 - 9_500_000
            su = max(0, su + d)
            sd = max(0, sd - d)
            exp_up[int(row["i"])] = su
            exp_dn[int(row["i"])] = sd
    assert up == exp_up and dn == exp_dn
    assert al == [int(u > 40_000_000 or d > 40_000_000)
                  for u, d in zip(exp_up, exp_dn)]
    # dataset path identical
    ds = ray.data.from_arrow(tbl).repartition(3)
    rows = {r["t"]: (r["cusum_up"], r["cusum_dn"])
            for r in cusum_flags(ds, "e", "t", "x", 9_500_000, 40_000_000).take_all()}
    assert rows == {tt: (u, d) for tt, u, d in zip(t.tolist(), exp_up, exp_dn)}


def test_event_ngram_counts(ray_session):
    import ray

    from kamae_ray.stages.window import event_ngram_counts

    rng = np.random.default_rng(31)
    n = 4000
    t = pa.table({
        "u": pa.array(rng.integers(0, 120, n)),
        "ts": pa.array(rng.permutation(n).astype(np.int64)),
        "eid": pa.array(np.arange(n, dtype=np.int64)),
        "e": pa.array(rng.choice(["a", "b", "c", None], n,
                                 p=[0.4, 0.3, 0.2, 0.1])),
    })
    out = event_ngram_counts(t, "u", "ts", "e", 3, tiebreak_col="eid",
                             sep=">").sort_by("path")
    d = event_ngram_counts(ray.data.from_arrow(t), "u", "ts", "e", 3,
                           tiebreak_col="eid", sep=">")
    dt = pa.concat_tables([pa.table(b) for b in
                           d.iter_batches(batch_format="pyarrow")]).sort_by("path")
    assert out.equals(dt)
    # naive reference: nulls consume their position, windows touching drop
    df = t.to_pandas().sort_values(["u", "ts", "eid"])
    ref = {}
    for _, grp in df.groupby("u"):
        evs = grp.e.tolist()
        for i in range(len(evs) - 2):
            w = evs[i:i + 3]
            if all(x is not None for x in w):
                ref[">".join(w)] = ref.get(">".join(w), 0) + 1
    got = {r["path"]: r["n"] for r in out.to_pylist()}
    assert got == ref
    # n=2 equals transition_counts totals
    from kamae_ray.stages.window import transition_counts

    two = event_ngram_counts(t, "u", "ts", "e", 2, tiebreak_col="eid", sep=">")
    tc = transition_counts(t, "u", "ts", "e", tiebreak_col="eid")
    pairs = {f'{r["from_event"]}>{r["to_event"]}': r["n"] for r in tc.to_pylist()}
    assert {r["path"]: r["n"] for r in two.to_pylist()} == pairs
    with pytest.raises(ValueError, match=r"\[2, 8\]"):
        event_ngram_counts(t, "u", "ts", "e", 1)


def test_rolling_count_distinct(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray

    from kamae_ray.stages.window import rolling_count_distinct

    rng = np.random.default_rng(41)
    n = 3000
    t = pa.table({
        "g": pa.array(rng.integers(0, 11, n), pa.int64()),
        "ts": pa.array(rng.permutation(n), pa.int64()),
        "item": pa.array([None if rng.random() < 0.1 else f"i{v}"
                          for v in rng.integers(0, 7, n)]),
    })
    con = duckdb.connect()
    con.register("t", t)
    want = {(g, ts): d for g, ts, d in zip(*con.sql(
        "SELECT g, ts, count(DISTINCT item) OVER (PARTITION BY g ORDER BY ts "
        "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) FROM t"
    ).fetchnumpy().values())}
    # Table path
    o = rolling_count_distinct(t, "g", "ts", "item", window=4).to_pydict()
    assert all(want[(g, ts)] == v for g, ts, v in
               zip(o["g"], o["ts"], o["item_wdistinct"]))
    # Dataset path (multi-block, groups co-located by the sort)
    ds = ray.data.from_arrow(t).repartition(5)
    rows = rolling_count_distinct(ds, "g", "ts", "item", window=4).take_all()
    assert len(rows) == n
    assert all(want[(r["g"], r["ts"])] == r["item_wdistinct"] for r in rows)
