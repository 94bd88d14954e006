"""Property-based tests: segmented kernels vs naive per-group reference
implementations (hypothesis)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from kamae_ray.functions import segments as S


@st.composite
def grouped_data(draw):
    n = draw(st.integers(1, 120))
    n_groups = draw(st.integers(1, 8))
    gids = np.sort(np.asarray(draw(st.lists(st.integers(0, n_groups - 1), min_size=n, max_size=n))))
    vals = np.asarray(
        draw(st.lists(st.one_of(st.floats(-100, 100), st.just(float("nan"))), min_size=n, max_size=n))
    )
    t = np.asarray(draw(st.lists(st.integers(0, 1000), min_size=n, max_size=n)), dtype=np.float64)
    # sort time within groups (kernel precondition)
    order = np.lexsort((t, gids))
    return gids[order], vals[order], t[order]


def _per_group(gids, fn):
    starts, lens = S.segments(gids)
    out = np.empty(len(gids))
    for s, l in zip(starts, lens):
        out[s : s + l] = fn(slice(s, s + l))
    return starts, lens, out


@given(grouped_data())
@settings(max_examples=60, deadline=None)
def test_seg_lag_matches_naive(data):
    gids, vals, t = data
    starts, lens = S.segments(gids)
    srep = np.repeat(starts, lens)
    got = S.seg_lag(vals, 1, srep)
    for s, l in zip(starts, lens):
        seg = vals[s : s + l]
        want = np.concatenate([[np.nan], seg[:-1]])
        np.testing.assert_array_equal(np.isnan(got[s : s + l]), np.isnan(want))
        m = ~np.isnan(want)
        np.testing.assert_allclose(got[s : s + l][m], want[m])


@given(grouped_data())
@settings(max_examples=60, deadline=None)
def test_seg_ffill_matches_naive(data):
    gids, vals, t = data
    starts, lens = S.segments(gids)
    srep = np.repeat(starts, lens)
    got = S.seg_ffill(vals, srep)
    for s, l in zip(starts, lens):
        last = np.nan
        for i in range(s, s + l):
            if not np.isnan(vals[i]):
                last = vals[i]
            want = last
            if np.isnan(want):
                assert np.isnan(got[i])
            else:
                assert got[i] == want


@given(grouped_data())
@settings(max_examples=60, deadline=None)
def test_seg_cumsum_and_sessionize(data):
    gids, vals, t = data
    starts, lens = S.segments(gids)
    filled = np.where(np.isnan(vals), 0.0, vals)
    got = S.seg_cumsum(filled, starts, lens)
    for s, l in zip(starts, lens):
        np.testing.assert_allclose(got[s : s + l], np.cumsum(filled[s : s + l]), atol=1e-9)
    sid = S.seg_sessionize(t, 50.0, starts, lens)
    for s, l in zip(starts, lens):
        want = np.concatenate([[0], np.cumsum((np.diff(t[s : s + l]) > 50.0).astype(int))]) if l else []
        np.testing.assert_array_equal(sid[s : s + l], want)


@given(grouped_data())
@settings(max_examples=60, deadline=None)
def test_seg_reduce_stats(data):
    gids, vals, t = data
    starts, lens = S.segments(gids)
    cond = ~np.isnan(vals)
    for stat in ("sum", "count", "mean", "min", "max", "median", "stddev"):
        got = S.seg_reduce(vals, cond, starts, lens, stat, nan_fill=-1.0)
        for k, (s, l) in enumerate(zip(starts, lens)):
            sel = vals[s : s + l][cond[s : s + l]]
            if len(sel) == 0:
                # count of an empty selection is 0 (never NaN -> no nan_fill)
                want = 0.0 if stat == "count" else -1.0
            elif stat == "sum":
                want = sel.sum()
            elif stat == "count":
                want = float(len(sel))
            elif stat == "mean":
                want = sel.mean()
            elif stat == "min":
                want = sel.min()
            elif stat == "max":
                want = sel.max()
            elif stat == "median":
                want = float(np.median(sel))
            else:
                want = float(np.std(sel, ddof=1)) if len(sel) > 1 else -1.0
            np.testing.assert_allclose(got[k], want, rtol=1e-9, atol=1e-9, err_msg=stat)


@given(grouped_data())
@settings(max_examples=60, deadline=None)
def test_seg_rolling_matches_pandas(data):
    import pandas as pd

    gids, vals, t = data
    starts, lens = S.segments(gids)
    srep = np.repeat(starts, lens)
    s, cnt = S.seg_rolling_sum_count(vals, 3, srep)
    gid_rep = np.repeat(np.arange(len(starts)), lens)
    want = pd.Series(vals).groupby(gid_rep).rolling(3, min_periods=1).sum().to_numpy()
    m = ~np.isnan(want)
    np.testing.assert_allclose(np.where(cnt > 0, s, np.nan)[m], want[m], atol=1e-9)


@given(st.integers(0, 2**64 - 1).map(lambda x: x))
@settings(max_examples=30, deadline=None)
def test_group_ids_stability(seed):
    rng = np.random.RandomState(seed % (2**32))
    n = 50
    t = pa.table(
        {
            "a": rng.randint(0, 5, n),
            "b": np.asarray(["x", "y", "z"])[rng.randint(0, 3, n)],
        }
    )
    gids = S.group_ids(t, ["a", "b"])
    # same (a, b) pair -> same gid; different -> different
    seen = {}
    a = t.column("a").to_pylist()
    b = t.column("b").to_pylist()
    for i in range(n):
        key = (a[i], b[i])
        if key in seen:
            assert gids[i] == seen[key]
        else:
            assert gids[i] not in set(seen.values())
            seen[key] = gids[i]
