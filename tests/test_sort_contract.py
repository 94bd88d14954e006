"""Pin the Ray sort contract the wide layer depends on: after ``ds.sort(keys)``
equal keys never straddle block boundaries (the same mechanism
``groupby().map_groups`` trusts — range partition boundaries fall BETWEEN
distinct key values). Every listwise / window / dedup block kernel assumes it
(kamae_ray/stages/listwise.py, window.py, pipelines/dedup.py).

The scenario judged risky in round 1: MANY blocks, FEW distinct keys — every
sampled boundary collides with a real key value. If a Ray upgrade ever splits
equal keys across blocks, these multi-block results diverge from the
single-block pa.Table path and this module goes red.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

ray = pytest.importorskip("ray")


N_ROWS = 20_000
N_BLOCKS = 64
KEYS = ["k0", "k1", "k2", "k3", "k4"]  # 5 distinct keys << 64 blocks


@pytest.fixture(scope="module")
def skewed_table(ray_session):
    rng = np.random.RandomState(7)
    key = np.array(KEYS)[rng.randint(0, len(KEYS), N_ROWS)]
    t = rng.permutation(N_ROWS).astype(np.int64)
    val = rng.standard_normal(N_ROWS)
    return pa.table(
        {
            "entity": pa.array(key),
            "ts": pa.array(t),
            "value": pa.array(val),
            "rid": pa.array(np.arange(N_ROWS)),
        }
    )


def _multi_block(table):
    return ray.data.from_arrow(table).repartition(N_BLOCKS)


def _sorted_df(obj, cols):
    df = obj.to_pandas() if not isinstance(obj, pa.Table) else obj.to_pandas()
    return df.sort_values(cols).reset_index(drop=True)


def test_listwise_multi_block_equals_single_block(skewed_table):
    from kamae_ray.stages import ListMeanTransformer

    lm = ListMeanTransformer(input_col="value", query_id_col="entity", output_col="m")
    expect = _sorted_df(lm.transform(skewed_table), ["rid"])
    got = _sorted_df(lm.transform(_multi_block(skewed_table)), ["rid"])
    pd.testing.assert_frame_equal(got[["rid", "m"]], expect[["rid", "m"]])


def test_lag_multi_block_equals_single_block(skewed_table):
    from kamae_ray.stages import LagTransformer

    lg = LagTransformer(input_col="value", entity_cols=["entity"], time_col="ts", offset=1, output_col="prev")
    expect = _sorted_df(lg.transform(skewed_table), ["rid"])
    got = _sorted_df(lg.transform(_multi_block(skewed_table)), ["rid"])
    pd.testing.assert_frame_equal(got[["rid", "prev"]], expect[["rid", "prev"]])


def test_asof_multi_block_equals_single_block(skewed_table):
    from kamae_ray.stages import asof_join

    right = skewed_table.filter(pa.array(np.arange(N_ROWS) % 7 == 0)).select(["entity", "ts", "value"])
    right = right.rename_columns(["entity", "rts", "rval"])
    expect = asof_join(
        skewed_table, right, by=["entity"], left_on="ts", right_on="rts", right_cols=["rval"]
    )
    got = asof_join(
        _multi_block(skewed_table),
        ray.data.from_arrow(right).repartition(16),
        by=["entity"],
        left_on="ts",
        right_on="rts",
        right_cols=["rval"],
    )
    e = _sorted_df(expect, ["rid"])
    g = _sorted_df(got, ["rid"])
    pd.testing.assert_frame_equal(g[["rid", "rval"]], e[["rid", "rval"]])


def test_exact_dedup_multi_block(skewed_table):
    from kamae_ray.pipelines.dedup import exact_dedup

    # entity column has 5 distinct values -> 5 survivors, min rid each
    tbl = skewed_table.select(["entity", "rid"])
    expect = _sorted_df(exact_dedup(tbl, "entity", "rid"), ["entity"])
    got = _sorted_df(exact_dedup(_multi_block(tbl), "entity", "rid"), ["entity"])
    pd.testing.assert_frame_equal(got, expect)
    assert len(got) == len(KEYS)


def test_segment_pairs_multi_block(ray_session):
    """Bucketed pair emission must see each bucket whole after the sort."""
    from kamae_ray.pipelines.dedup import _SegmentPairs

    rng = np.random.RandomState(3)
    n = 5000
    bucket = rng.randint(0, 4, n).astype(np.int64)  # 4 buckets, many blocks
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table({"band": pa.array(bucket), "band_hash": pa.array(bucket), "id": pa.array(ids)})
    pairer = _SegmentPairs(["band", "band_hash"], "id", max_bucket_size=10_000)
    expect = pairer(tbl.sort_by([("band", "ascending"), ("band_hash", "ascending"), ("id", "ascending")]))
    # group key ONLY in the distributed sort (the partitioning contract);
    # adding "id" to the sort keys splits equal buckets across blocks
    ds = ray.data.from_arrow(tbl).repartition(32).sort(["band", "band_hash"])
    got = ds.map_batches(pairer, batch_format="pyarrow", zero_copy_batch=True)
    ge = _sorted_df(got, ["id_a", "id_b"])
    ee = _sorted_df(expect, ["id_a", "id_b"])
    pd.testing.assert_frame_equal(ge, ee)


def test_check_sorted_partitioning_utility(skewed_table):
    from kamae_ray.stages.window import check_sorted_partitioning

    ds = _multi_block(skewed_table).sort(["entity"])
    check_sorted_partitioning(ds, ["entity"])  # must not raise on a real sort
