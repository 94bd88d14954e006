"""Surrogate-sort correctness: with KAMAE_SURROGATE_SORT=always, the wide
stages must produce exactly the plain-sort / single-block results (collisions
may co-locate groups but never merge them — kernels group by real columns)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

ray = pytest.importorskip("ray")

from kamae_ray.functions import sortkeys as SK


def test_string_hash_deterministic_across_slices():
    arr = pa.array(["alpha", "beta", "alpha", "", None, "γδ"], pa.string())
    h1 = SK._string_hash64(arr)
    # equal values hash equal; distinct values differ
    assert h1[0] == h1[2]
    assert len({h1[0], h1[1], h1[3]}) == 3
    # null hashes like empty string (fill_null "")
    assert h1[4] == h1[3]
    # slicing (non-zero arr.offset) must not change hashes
    h2 = SK._string_hash64(arr.slice(2, 4))
    assert h2.tolist() == h1[2:6].tolist()
    # chunked input
    ch = pa.chunked_array([arr.slice(0, 3), arr.slice(3, 3)])
    h3 = SK._string_hash64(ch.combine_chunks())
    assert h3.tolist() == h1.tolist()


def test_surrogate_equals_plain_window(ray_session, monkeypatch):
    monkeypatch.setenv("KAMAE_SURROGATE_SORT", "always")
    from kamae_ray.stages import LagTransformer, ListMeanTransformer, SessionizeTransformer
    from kamae_ray.stages.window import apply_sorted

    rng = np.random.RandomState(11)
    n = 5000
    t = pa.table(
        {
            "src": pa.array(np.array(["a", "b", "c"])[rng.randint(0, 3, n)]),
            "doc": pa.array([f"d{int(i):03d}" for i in rng.randint(0, 40, n)]),
            "ts": pa.array(rng.permutation(n).astype(np.int64)),
            "v": pa.array(rng.standard_normal(n)),
            "rid": pa.array(np.arange(n)),
        }
    )
    stages = lambda: (
        LagTransformer(input_col="v", entity_cols=["src", "doc"], time_col="ts", output_col="lag"),
        SessionizeTransformer(entity_cols=["src", "doc"], time_col="ts", gap=3.0, output_col="sess"),
    )
    expect = apply_sorted(t, *stages()).to_pandas().sort_values("rid").reset_index(drop=True)
    ds = ray.data.from_arrow(t).repartition(16)
    got = apply_sorted(ds, *stages()).to_pandas().sort_values("rid").reset_index(drop=True)
    assert SK.SKEY not in got.columns
    pd.testing.assert_frame_equal(got[["rid", "lag", "sess"]], expect[["rid", "lag", "sess"]])

    lm = ListMeanTransformer(input_col="v", query_id_col="doc", output_col="m")
    e2 = lm.transform(t).to_pandas().sort_values("rid").reset_index(drop=True)
    g2 = lm.transform(ray.data.from_arrow(t).repartition(16)).to_pandas().sort_values("rid").reset_index(drop=True)
    assert SK.SKEY not in g2.columns
    pd.testing.assert_frame_equal(g2[["rid", "m"]], e2[["rid", "m"]])


def test_surrogate_equals_plain_asof(ray_session, monkeypatch):
    monkeypatch.setenv("KAMAE_SURROGATE_SORT", "always")
    from kamae_ray.stages import asof_join

    rng = np.random.RandomState(5)
    nl, nr = 2000, 800
    ent = lambda k: [f"u{int(i)}" for i in rng.randint(0, 25, k)]
    left = pa.table({"u": pa.array(ent(nl)), "t": pa.array(rng.randint(0, 500, nl).astype(np.int64)), "rid": pa.array(np.arange(nl))})
    right = pa.table(
        {
            "u": pa.array(ent(nr)),
            "t": pa.array(rng.randint(0, 500, nr).astype(np.int64)),
            "seq": pa.array(np.arange(nr, dtype=np.int64)),
            "p": pa.array(rng.standard_normal(nr)),
        }
    )
    expect = (
        asof_join(left, right, by=["u"], left_on="t", right_cols=["t", "p"], right_tiebreak="seq")
        .to_pandas().sort_values("rid").reset_index(drop=True)
    )
    got = (
        asof_join(
            ray.data.from_arrow(left).repartition(8),
            ray.data.from_arrow(right).repartition(8),
            by=["u"], left_on="t", right_cols=["t", "p"], right_tiebreak="seq",
        )
        .to_pandas().sort_values("rid").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["rid", "p"]], expect[["rid", "p"]])
