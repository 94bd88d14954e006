"""global_cumsum (distributed ordered prefix sum) and pack_sequences
(concat-and-chunk LLM packing) — parity vs DuckDB window SQL."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from kamae_ray.pipelines.packing import pack_sequences
from kamae_ray.stages.aggregate import global_cumsum


def _tbl(n=5000, seed=3, dtype="int"):
    rng = np.random.default_rng(seed)
    ids = rng.permutation(n).astype(np.int64) * 7  # unique, gappy, shuffled
    if dtype == "int":
        vals = pa.array(rng.integers(0, 900, n), pa.int64())
    else:
        vals = pa.array(np.round(rng.normal(5.0, 2.0, n), 3))
    return pa.table({"rid": pa.array(ids), "v": vals})


def _sorted_rows(tbl: pa.Table):
    import pyarrow.compute as pc

    return tbl.take(pc.sort_indices(tbl, sort_keys=[("rid", "ascending")])).to_pylist()


def test_global_cumsum_table_matches_duckdb_int_exclusive_and_inclusive():
    t = _tbl()
    for exclusive, frame in ((True, "AND 1 PRECEDING"), (False, "AND CURRENT ROW")):
        out = global_cumsum(t, "rid", "v", out_col="cs", exclusive=exclusive)
        sql = (
            "SELECT rid, v, CAST(COALESCE(SUM(v) OVER (ORDER BY rid ROWS BETWEEN "
            f"UNBOUNDED PRECEDING {frame}), 0) AS BIGINT) AS cs FROM t"
        )
        oracle = duckdb.query(sql).arrow()
        assert _sorted_rows(out) == _sorted_rows(oracle)
        assert out.column("cs").type == pa.int64()


def test_global_cumsum_float_and_nulls():
    t = pa.table({"rid": pa.array([3, 1, 2, 0], pa.int64()),
                  "v": pa.array([1.5, None, 2.25, 4.0])})
    out = global_cumsum(t, "rid", "v", out_col="cs")
    got = {r["rid"]: r["cs"] for r in out.to_pylist()}
    assert got == {0: 0.0, 1: 4.0, 2: 4.0, 3: 6.25}  # null adds 0


def test_global_cumsum_dataset_matches_table(ray_session):
    import ray

    t = _tbl(n=20000, seed=9)
    expected = {r["rid"]: r["cs"] for r in global_cumsum(t, "rid", "v", out_col="cs").to_pylist()}
    ds = ray.data.from_arrow(t).repartition(9)
    # small bucket_width forces many buckets; blocks hold multiple buckets
    out = pa.concat_tables(
        ray.get(global_cumsum(ds, "rid", "v", out_col="cs", bucket_width=1000).to_arrow_refs())
    )
    assert out.num_rows == t.num_rows
    for r in out.to_pylist():
        assert r["cs"] == expected[r["rid"]], r
    assert out.column("cs").type == pa.int64()


def test_global_cumsum_empty(ray_session):
    import ray

    t = pa.table({"rid": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    assert global_cumsum(t, "rid", "v").num_rows == 0
    ds = ray.data.from_arrow(t)
    assert global_cumsum(ds, "rid", "v").count() == 0


_PACK_SQL = """
WITH c AS (
  SELECT rid, v AS n_tok,
    CAST(COALESCE(SUM(v) OVER (ORDER BY rid ROWS BETWEEN UNBOUNDED PRECEDING
      AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
  FROM t WHERE v > 0
)
SELECT rid, n_tok, tok_offset, tok_offset // {L} AS seq_first,
       (tok_offset + n_tok - 1) // {L} AS seq_last FROM c
"""


def test_pack_sequences_matches_duckdb():
    t = _tbl(n=3000, seed=21)
    out = pack_sequences(t, "rid", "v", seq_len=512)
    oracle = duckdb.query(_PACK_SQL.format(L=512)).arrow()
    eng = _sorted_rows(out.rename_columns(["rid", "n_tok", "tok_offset", "seq_first", "seq_last"]))
    assert eng == _sorted_rows(oracle)


def test_pack_sequences_drops_empty_and_null_docs():
    t = pa.table({"rid": pa.array([0, 1, 2, 3], pa.int64()),
                  "v": pa.array([5, 0, None, 600], pa.int64())})
    out = pack_sequences(t, "rid", "v", seq_len=512)
    rows = {r["rid"]: r for r in out.to_pylist()}
    assert set(rows) == {0, 3}
    assert rows[0]["tok_offset"] == 0 and rows[0]["seq_first"] == 0 and rows[0]["seq_last"] == 0
    # doc 3 starts at token 5 and spans past the 512 boundary -> two sequences
    assert rows[3]["tok_offset"] == 5 and (rows[3]["seq_first"], rows[3]["seq_last"]) == (0, 1)


def test_pack_sequences_dataset_path(ray_session):
    import ray

    t = _tbl(n=8000, seed=27)
    expected = _sorted_rows(pack_sequences(t, "rid", "v", seq_len=256))
    ds = ray.data.from_arrow(t).repartition(7)
    out = pa.concat_tables(
        ray.get(pack_sequences(ds, "rid", "v", seq_len=256, bucket_width=500).to_arrow_refs())
    )
    assert _sorted_rows(out) == expected


def test_pack_sequences_rejects_bad_seq_len():
    with pytest.raises(ValueError):
        pack_sequences(_tbl(10), "rid", "v", seq_len=0)


def test_global_cumsum_two_level_matches_single_level(ray_session):
    """levels=2 (distributed bucket merge, driver holds only the superbucket
    prefix) must equal levels=1 and DuckDB exactly — tiny widths force many
    buckets AND many superbuckets per run."""
    import duckdb
    import ray

    from kamae_ray.stages.aggregate import global_cumsum

    rng = np.random.RandomState(13)
    n = 5_000
    ids = rng.permutation(n * 3)[:n]  # sparse, unique
    vals = rng.randint(-5, 50, n)
    t = pa.table({"rid": pa.array(ids, pa.int64()), "v": pa.array(vals, pa.int64())})
    for exclusive in (True, False):
        oracle = duckdb.sql(
            "SELECT rid, sum(v) OVER (ORDER BY rid ROWS BETWEEN UNBOUNDED PRECEDING AND "
            + ("1 PRECEDING" if exclusive else "CURRENT ROW") + ") AS c FROM t"
        ).df().fillna(0).sort_values("rid").reset_index(drop=True)
        one = (
            global_cumsum(ray.data.from_arrow(t).repartition(6), "rid", "v",
                          out_col="c", bucket_width=64, exclusive=exclusive)
            .to_pandas().sort_values("rid").reset_index(drop=True)
        )
        two = (
            global_cumsum(ray.data.from_arrow(t).repartition(6), "rid", "v",
                          out_col="c", bucket_width=64, exclusive=exclusive,
                          levels=2, super_width=16)
            .to_pandas().sort_values("rid").reset_index(drop=True)
        )
        assert one["c"].astype(int).tolist() == oracle["c"].astype(int).tolist()
        assert two["c"].astype(int).tolist() == oracle["c"].astype(int).tolist()
        assert list(two.columns) == list(one.columns)


def test_global_cumsum_two_level_float_values(ray_session):
    import ray

    from kamae_ray.stages.aggregate import global_cumsum

    rng = np.random.RandomState(3)
    n = 1200
    t = pa.table({"rid": pa.array(list(rng.permutation(n)), pa.int64()),
                  "v": rng.standard_normal(n)})
    one = global_cumsum(ray.data.from_arrow(t).repartition(4), "rid", "v",
                        bucket_width=32).to_pandas().sort_values("rid")
    two = global_cumsum(ray.data.from_arrow(t).repartition(4), "rid", "v",
                        bucket_width=32, levels=2, super_width=8).to_pandas().sort_values("rid")
    assert np.allclose(one["v_cumsum"].to_numpy(), two["v_cumsum"].to_numpy(), atol=1e-9)


def test_global_cumsum_two_level_driver_state_bounded(ray_session):
    """Wide-domain regression (VERDICT r3 task 7): with ids spread over a
    multi-million-id domain and a tiny bucket_width (many thousands of
    data-bearing buckets), the levels=2 driver must hold ONLY the
    superbucket prefix — O(id_range / (bucket_width * super_width)) entries
    — never the per-bucket table. Pinned by intercepting the single
    ray.put of driver state and counting its entries, plus an exactness
    check against the table path."""
    import ray

    from kamae_ray.stages import aggregate as agg
    from kamae_ray.stages.aggregate import global_cumsum

    rng = np.random.RandomState(21)
    n = 20_000
    domain = 5_000_000
    ids = rng.choice(domain, size=n, replace=False).astype(np.int64)
    vals = rng.randint(-3, 9, n)
    t = pa.table({"rid": pa.array(ids, pa.int64()), "v": pa.array(vals, pa.int64())})
    bucket_width, super_width = 4, 2048
    n_superbuckets_max = domain // (bucket_width * super_width) + 2
    n_buckets_with_data = len(np.unique(ids // bucket_width))
    assert n_buckets_with_data > 4 * n_superbuckets_max  # the test has teeth

    del agg  # ray is imported inside global_cumsum; patch the ray module itself
    captured = []
    real_put = ray.put

    def spy_put(obj, *a, **k):
        if (isinstance(obj, tuple) and len(obj) == 2
                and all(isinstance(x, np.ndarray) for x in obj)):
            captured.append(len(obj[0]))
        return real_put(obj, *a, **k)

    ray.put = spy_put
    try:
        got = global_cumsum(
            ray.data.from_arrow(t).repartition(8), "rid", "v", out_col="c",
            bucket_width=bucket_width, levels=2, super_width=super_width,
        ).to_pandas().sort_values("rid").reset_index(drop=True)
    finally:
        ray.put = real_put
    assert captured, "driver superbucket state was never ray.put"
    assert max(captured) <= n_superbuckets_max, (max(captured), n_superbuckets_max)
    want = global_cumsum(t, "rid", "v", out_col="c")
    wdf = want.to_pandas().sort_values("rid").reset_index(drop=True)
    assert got["c"].astype(int).tolist() == wdf["c"].astype(int).tolist()


def test_balanced_shards_table_and_dataset(ray_session):
    import ray

    from kamae_ray.pipelines.packing import balanced_shards

    rng = np.random.RandomState(11)
    n, S = 503, 8
    # heavy-tailed weights like doc token counts
    w = (rng.pareto(1.5, n) * 50).astype(np.int64) + 1
    t = pa.table({"id": pa.array(np.arange(n), pa.int64()),
                  "w": pa.array(w, pa.int64())})
    out = balanced_shards(t, "id", "w", S)
    df = out.to_pandas().sort_values("id").reset_index(drop=True)
    # reference: snake fold of ROW_NUMBER() OVER (ORDER BY w DESC, id)
    order = np.lexsort((np.arange(n), -w))
    rank = np.empty(n, np.int64)
    rank[order] = np.arange(n)
    m = rank % (2 * S)
    ref = np.where(m < S, m, 2 * S - 1 - m)
    assert df["shard"].to_numpy().tolist() == ref.tolist()
    # balance: every shard total within one max item of the mean
    totals = df.groupby("shard")["w"].sum()
    assert len(totals) == S
    assert totals.max() - totals.min() <= w.max()
    # Dataset path agrees with the Table path
    got = balanced_shards(ray.data.from_arrow(t).repartition(6), "id", "w", S)
    gdf = got.to_pandas().sort_values("id").reset_index(drop=True)
    assert gdf["shard"].tolist() == df["shard"].tolist()
    # guards: out-of-range weights/ids raise
    bad = pa.table({"id": pa.array([0], pa.int64()), "w": pa.array([-1], pa.int64())})
    with pytest.raises(ValueError):
        balanced_shards(bad, "id", "w", S)
    bad2 = pa.table({"id": pa.array([1 << 33], pa.int64()), "w": pa.array([1], pa.int64())})
    with pytest.raises(ValueError):
        balanced_shards(bad2, "id", "w", S)


def test_negative_sampling_dataset_matches_table(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from kamae_ray.pipelines.packing import negative_sampling

    rng = np.random.default_rng(9)
    t = pa.table({
        "u": pa.array(rng.integers(0, 50, 2000)),
        "i": pa.array(rng.integers(0, 40, 2000)),
    })
    expect = negative_sampling(t, "u", "i", num_items=40, k=6)
    er = sorted(zip(expect.column("u").to_pylist(), expect.column("neg_item").to_pylist()))
    ds = ray.data.from_arrow(t).repartition(7)
    out = negative_sampling(ds, "u", "i", num_items=40, k=6)
    rows = out.take_all()
    gr = sorted((r["u"], r["neg_item"]) for r in rows)
    assert gr == er
    # no emitted pair is a positive; items within range; determinism across runs
    pos = set(zip(t.column("u").to_pylist(), t.column("i").to_pylist()))
    assert not (set(gr) & pos)
    assert all(0 <= it < 40 for _, it in gr)
    again = negative_sampling(ds, "u", "i", num_items=40, k=6).take_all()
    assert sorted((r["u"], r["neg_item"]) for r in again) == gr


def test_stratified_kfold_balance_and_determinism(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from kamae_ray.pipelines.packing import stratified_kfold

    rng = np.random.default_rng(3)
    n = 9000
    t = pa.table({"g": pa.array(rng.choice(["a", "b", "c"], n)),
                  "id": pa.array(rng.permutation(n).astype(np.int64))})
    out = stratified_kfold(t, "g", "id", k=4, salt=11)
    import collections

    cnt = collections.Counter(zip(out.column("g").to_pylist(),
                                  out.column("fold").to_pylist()))
    for g in "abc":
        sizes = [cnt[(g, f)] for f in range(4)]
        assert max(sizes) - min(sizes) <= 1          # exact balance
    # pure function of (ids, salt): Dataset path == Table path, rerun-stable
    d = stratified_kfold(ray.data.from_arrow(t), "g", "id", k=4, salt=11)
    dt = pa.concat_tables([pa.table(b) for b in d.iter_batches(batch_format="pyarrow")])
    a = out.sort_by([("g", "ascending"), ("id", "ascending")])
    b = dt.sort_by([("g", "ascending"), ("id", "ascending")])
    assert a.equals(b.select(a.column_names))
    # different salt -> different assignment (not degenerate)
    alt = stratified_kfold(t, "g", "id", k=4, salt=12)
    assert out.column("fold").to_pylist() != alt.column("fold").to_pylist()
