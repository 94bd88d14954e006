"""resample_ohlc + expanding_zscore_flags (stages/window.py): hand cases,
pandas-equivalence, table-vs-Dataset parity, and the exact-integer flag
rule's edge cases."""

import numpy as np
import pyarrow as pa
import pytest

from kamae_ray.stages.window import expanding_zscore_flags, resample_ohlc


def _collect(obj) -> pa.Table:
    if isinstance(obj, pa.Table):
        return obj
    return pa.concat_tables(
        [pa.table(b) for b in obj.iter_batches(batch_format="pyarrow")])


@pytest.fixture(scope="module")
def series_data():
    rng = np.random.default_rng(9)
    n = 8000
    return pa.table({
        "u": pa.array(rng.integers(0, 120, n)),
        "t": pa.array(rng.integers(0, 50 * 86_400, n)),  # plain-int seconds
        "eid": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(rng.integers(-500, 5000, n)),
    })


def test_ohlc_hand_case():
    t = pa.table({
        "u": [1, 1, 1, 1, 2],
        "t": [10, 5, 20, 90_000, 5],     # bucket 0: ts 5,10,20; bucket 1: 90000
        "eid": [1, 2, 3, 4, 5],
        "v": [7, 3, -2, 9, 11],
    })
    out = resample_ohlc(t, "u", "t", "v", bucket_s=86_400,
                        tiebreak_cols=["eid"]).sort_by([("u", "ascending"),
                                                        ("bucket", "ascending")])
    rows = out.to_pylist()
    assert rows[0] == {"u": 1, "bucket": 0, "open": 3, "high": 7, "low": -2,
                       "close": -2, "value_sum": 8, "n": 3}
    assert rows[1] == {"u": 1, "bucket": 1, "open": 9, "high": 9, "low": 9,
                       "close": 9, "value_sum": 9, "n": 1}
    assert rows[2]["open"] == 11 and rows[2]["close"] == 11


def test_ohlc_equal_ts_tiebreak():
    # equal timestamps: open/close resolved by the tiebreak column
    t = pa.table({"u": [1, 1], "t": [5, 5], "eid": [2, 1], "v": [100, 200]})
    r = resample_ohlc(t, "u", "t", "v", 60, tiebreak_cols=["eid"]).to_pylist()[0]
    assert r["open"] == 200 and r["close"] == 100  # eid 1 first, eid 2 last


def test_ohlc_matches_pandas(series_data):
    out = resample_ohlc(series_data, "u", "t", "v", bucket_s=86_400,
                        tiebreak_cols=["eid"])
    df = series_data.to_pandas()
    df["bucket"] = df.t // 86_400
    df = df.sort_values(["u", "bucket", "t", "eid"])
    g = df.groupby(["u", "bucket"])
    exp = g.agg(open=("v", "first"), high=("v", "max"), low=("v", "min"),
                close=("v", "last"), value_sum=("v", "sum"),
                n=("v", "size")).reset_index()
    got = out.sort_by([("u", "ascending"), ("bucket", "ascending")]).to_pandas()
    exp = exp.sort_values(["u", "bucket"]).reset_index(drop=True)
    for c in ("open", "high", "low", "close", "value_sum", "n"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_ohlc_table_vs_dataset(ray_session, series_data):
    import ray

    t = resample_ohlc(series_data, "u", "t", "v", 86_400,
                      tiebreak_cols=["eid"]).sort_by(
        [("u", "ascending"), ("bucket", "ascending")])
    d = _collect(resample_ohlc(ray.data.from_arrow(series_data), "u", "t", "v",
                               86_400, tiebreak_cols=["eid"])).sort_by(
        [("u", "ascending"), ("bucket", "ascending")])
    assert t.equals(d.select(t.column_names))


def test_anomaly_matches_pandas(series_data):
    out = expanding_zscore_flags(series_data, "u", "t", "v", z=3,
                                 min_history=5, tiebreak_cols=["eid"])
    got = out.sort_by("eid").to_pandas()
    df = series_data.to_pandas().sort_values(["u", "t", "eid"])
    flags, nprevs = {}, {}
    for _, sub in df.groupby("u"):
        v = sub.v.to_numpy().astype(np.int64)
        for i, eid in enumerate(sub.eid.to_numpy()):
            hist = v[:i]
            nprevs[eid] = i
            if i < 5:
                flags[eid] = None
            else:
                mu, var = hist.mean(), hist.var()
                flags[eid] = bool((v[i] - mu) ** 2 > 9 * var)
    assert (got.n_prev.to_numpy() == np.array([nprevs[e] for e in got.eid])).all()
    exp = [flags[e] for e in got.eid]
    got_f = [None if pd_na(x) else bool(x) for x in got.anomaly.tolist()]
    assert got_f == exp


def pd_na(x):
    import pandas as pd

    return pd.isna(x)


def test_anomaly_zero_variance_history():
    # constant history, equal value -> not anomalous; different value -> is
    t = pa.table({"u": [1] * 7, "t": list(range(7)), "eid": list(range(7)),
                  "v": [10, 10, 10, 10, 10, 10, 99]})
    out = expanding_zscore_flags(t, "u", "t", "v", z=3, min_history=5,
                                 tiebreak_cols=["eid"]).sort_by("eid")
    rows = out.to_pylist()
    assert rows[4]["anomaly"] is None or rows[4]["n_prev"] == 4
    assert rows[5]["anomaly"] is False     # 10 equals the constant history
    assert rows[6]["anomaly"] is True      # 99 vs zero-variance history


def test_anomaly_table_vs_dataset(ray_session, series_data):
    import ray

    t = expanding_zscore_flags(series_data, "u", "t", "v", 3, 5,
                               tiebreak_cols=["eid"]).sort_by("eid")
    d = _collect(expanding_zscore_flags(ray.data.from_arrow(series_data),
                                        "u", "t", "v", 3, 5,
                                        tiebreak_cols=["eid"])).sort_by("eid")
    assert t.equals(d.select(t.column_names))
