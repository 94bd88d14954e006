"""deterministic_shuffle (reproducible global permutation) and mix_corpora
(weighted multi-source mixing)."""

import numpy as np
import pyarrow as pa
import pytest

from kamae_ray.stages.hashing import deterministic_shuffle, mix_corpora


def test_shuffle_is_exact_permutation_and_reproducible():
    keys = pa.array(list(range(0, 5000, 3)), pa.int64())
    t = pa.table({"k": keys, "v": pa.array(range(len(keys)), pa.int64())})
    a = deterministic_shuffle(t, "k", salt=1).sort_by("k")
    b = deterministic_shuffle(t, "k", salt=1).sort_by("k")
    pos = a.column("shuffle_pos").to_pylist()
    assert sorted(pos) == list(range(len(keys)))  # exact permutation
    assert pos == b.column("shuffle_pos").to_pylist()  # pure function of data
    c = deterministic_shuffle(t, "k", salt=2).sort_by("k")
    assert pos != c.column("shuffle_pos").to_pylist()  # salt changes the order


def test_shuffle_dataset_matches_table(ray_session):
    import ray

    t = pa.table({"k": pa.array(range(4000), pa.int64())})
    want = deterministic_shuffle(t, "k", salt=9).sort_by("k")
    ds = ray.data.from_arrow(t).repartition(7)
    got = pa.concat_tables(
        [pa.table(b) for b in deterministic_shuffle(ds, "k", salt=9).iter_batches(batch_format="pyarrow")]
    ).sort_by("k")
    assert got.column("shuffle_pos").to_pylist() == want.column("shuffle_pos").to_pylist()


def test_shuffle_null_keys_dropped():
    t = pa.table({"k": pa.array([1, None, 3], pa.int64())})
    out = deterministic_shuffle(t, "k")
    assert out.num_rows == 2
    assert sorted(out.column("shuffle_pos").to_pylist()) == [0, 1]


def test_mix_corpora_rates_and_determinism():
    n = 20000
    t = pa.table({"k": pa.array(range(n), pa.int64())})
    out = mix_corpora([(t, 1.0, "all"), (t, 0.5, "half"), (t, 0.1, "tenth")], "k", salt=4)
    import collections

    counts = collections.Counter(out.column("mix_source").to_pylist())
    assert counts["all"] == n
    assert abs(counts["half"] / n - 0.5) < 0.02
    assert abs(counts["tenth"] / n - 0.1) < 0.01
    again = mix_corpora([(t, 1.0, "all"), (t, 0.5, "half"), (t, 0.1, "tenth")], "k", salt=4)
    assert out.sort_by([("mix_source", "ascending"), ("k", "ascending")]).equals(
        again.sort_by([("mix_source", "ascending"), ("k", "ascending")])
    )
    with pytest.raises(ValueError):
        mix_corpora([], "k")


def test_mix_corpora_dataset_matches_table(ray_session):
    import ray

    t = pa.table({"k": pa.array(range(3000), pa.int64())})
    want = mix_corpora([(t, 0.3, "a"), (t, 0.7, "b")], "k", salt=11)
    ds = ray.data.from_arrow(t).repartition(4)
    got = pa.concat_tables(
        [pa.table(b) for b in mix_corpora([(ds, 0.3, "a"), (ds, 0.7, "b")], "k", salt=11)
         .iter_batches(batch_format="pyarrow")]
    )
    key = [("mix_source", "ascending"), ("k", "ascending")]
    assert got.sort_by(key).equals(want.sort_by(key))


def test_weighted_sample_semantics(ray_session):
    import ray

    from kamae_ray.stages.hashing import weighted_sample

    n = 20000
    t = pa.table({
        "k": pa.array(list(range(n - 2)) + [None, 12345], pa.int64()),
        "w": pa.array([0, 1_000_000] + [250_000] * (n - 4) + [None, 250_000],
                      pa.int64()),
    })
    got = weighted_sample(t, "k", "w", salt=3)
    ks = got.column("k").to_pylist()
    assert 0 not in ks            # weight 0 never keeps
    assert 1 in ks                # weight >= scale always keeps
    assert None not in ks         # null key drops
    # null weight drops (key n-1 ... the null-weight row had k = n-3)
    assert (n - 3) not in ks
    frac = len(ks) / n
    assert 0.2 < frac < 0.3       # ~250k ppm keep rate
    # deterministic: same result twice, and Dataset path == Table path
    assert weighted_sample(t, "k", "w", salt=3).equals(got)
    ds = ray.data.from_arrow(t).repartition(4)
    got_ds = pa.concat_tables(
        [pa.table(b) for b in weighted_sample(ds, "k", "w", salt=3)
         .iter_batches(batch_format="pyarrow")]).sort_by("k")
    assert got_ds.cast(got.schema).to_pylist() == got.sort_by("k").to_pylist()


class TestTemperatureMix:
    def _table(self, n=20000, seed=0):
        rng = np.random.default_rng(seed)
        corpus = rng.choice(["en"] * 80 + ["fr"] * 15 + ["de"] * 4 + ["sw"], size=n)
        return pa.table({"k": pa.array(np.arange(n)), "c": pa.array(corpus)})

    def test_matches_hugeint_oracle_and_proportions(self):
        import collections

        import duckdb

        from kamae_ray.stages.hashing import temperature_mix, temperature_mix_oracle_cond

        t = self._table()
        for alpha, salt in ((0.5, 7), (1 / 3, 3), (2 / 3, 11)):
            out = temperature_mix(t, "k", "c", alpha=alpha, salt=salt)
            cond = temperature_mix_oracle_cond("k", "n_corpus", "n_min", alpha=alpha, salt=salt)
            ora = duckdb.query(
                "WITH c AS (SELECT k, c, COUNT(*) OVER (PARTITION BY c) AS n_corpus "
                "FROM t WHERE c IS NOT NULL), "
                "m AS (SELECT *, MIN(n_corpus) OVER () AS n_min FROM c) "
                f"SELECT k, c, n_corpus FROM m WHERE {cond} ORDER BY k"
            ).arrow()
            eng = out.sort_by("k").select(["k", "c", "n_corpus"]).combine_chunks()
            assert eng.equals(ora.cast(eng.schema).combine_chunks()), (alpha, salt)
        # expected kept size ~ n_min^(1-a) * n_i^a; smallest corpus kept whole
        out = temperature_mix(t, "k", "c", alpha=0.5, salt=7)
        tot = collections.Counter(t.column("c").to_pylist())
        kept = collections.Counter(out.column("c").to_pylist())
        n_min = min(tot.values())
        assert kept["sw"] == tot["sw"]
        for lab, n in tot.items():
            exp = n * (n_min / n) ** 0.5
            assert abs(kept[lab] - exp) <= 4 * exp**0.5 + 2, (lab, kept[lab], exp)

    def test_alpha_one_keeps_everything(self):
        from kamae_ray.stages.hashing import temperature_mix

        t = self._table(n=500)
        assert temperature_mix(t, "k", "c", alpha=1.0).num_rows == 500

    def test_null_corpus_and_null_keys_dropped(self):
        from kamae_ray.stages.hashing import temperature_mix

        t = pa.table({
            "k": pa.array([1, None, 3, 4], pa.int64()),
            "c": pa.array(["a", "a", None, "a"]),
        })
        out = temperature_mix(t, "k", "c", alpha=1.0)
        assert out.column("k").to_pylist() == [1, 4]
        assert out.column("n_corpus").to_pylist() == [3, 3]  # count includes null-key row

    def test_dataset_matches_table(self, ray_session):
        import ray

        from kamae_ray.stages.hashing import temperature_mix

        t = self._table(n=6000, seed=1)
        want = temperature_mix(t, "k", "c", alpha=0.5, salt=5).sort_by("k")
        ds = ray.data.from_arrow(t).repartition(5)
        got = pa.concat_tables(
            [pa.table(b) for b in temperature_mix(ds, "k", "c", alpha=0.5, salt=5)
             .iter_batches(batch_format="pyarrow")]
        ).sort_by("k")
        assert got.select(want.column_names).combine_chunks().equals(want.combine_chunks())

    def test_irrational_alpha_rejected(self):
        import pytest as _pt

        from kamae_ray.stages.hashing import temperature_mix

        t = self._table(n=100)
        with _pt.raises(ValueError):
            temperature_mix(t, "k", "c", alpha=0.55)
        with _pt.raises(ValueError):
            temperature_mix(t, "k", "c", alpha=0.0)


class TestTemperatureMixNegativeKeys:
    def test_oracle_parity_with_negative_int_keys(self):
        """DuckDB % returns negative remainders for negative operands; the
        generated keep-condition folds into [0, 2^64) to match the engine's
        two's-complement hashing (ADVICE r4)."""
        import duckdb

        from kamae_ray.stages.hashing import temperature_mix, temperature_mix_oracle_cond

        rng = np.random.default_rng(3)
        n = 8000
        ks = rng.integers(-(2 ** 62), 2 ** 62, n)
        corpus = rng.choice(["en"] * 9 + ["sw"], size=n)
        t = pa.table({"k": pa.array(ks), "c": pa.array(corpus)})
        for alpha, salt in ((0.5, 0), (0.5, 7), (1 / 3, 3)):
            out = temperature_mix(t, "k", "c", alpha=alpha, salt=salt)
            cond = temperature_mix_oracle_cond("k", "n_corpus", "n_min", alpha=alpha, salt=salt)
            ora = duckdb.query(
                "WITH c AS (SELECT k, c, COUNT(*) OVER (PARTITION BY c) AS n_corpus "
                "FROM t WHERE c IS NOT NULL), "
                "m AS (SELECT *, MIN(n_corpus) OVER () AS n_min FROM c) "
                f"SELECT k, c, n_corpus FROM m WHERE {cond} ORDER BY k"
            ).arrow()
            eng = out.sort_by("k").select(["k", "c", "n_corpus"]).combine_chunks()
            assert eng.equals(ora.cast(eng.schema).combine_chunks()), (alpha, salt)
            assert 0 < out.num_rows < n  # both branches of the keep rule hit


def test_weighted_sample_noreplace_props_and_dataset(ray_session):
    import ray

    from kamae_ray.stages.hashing import weighted_sample_noreplace

    n = 5000
    ids = np.arange(n)
    # first half weight 1, second half weight 50
    w = np.where(ids < n // 2, 1, 50).astype(np.int64)
    t = pa.table({"id": pa.array(ids, pa.int64()), "w": pa.array(w, pa.int64())})
    want = weighted_sample_noreplace(t, "id", "w", 400, salt=3).sort_by("id")
    assert want.num_rows == 400
    # no replacement: ids unique
    got_ids = want.column("id").to_pylist()
    assert len(set(got_ids)) == 400
    # heavy rows dominate the sample (P[heavy] ~ 50x)
    heavy = sum(1 for i in got_ids if i >= n // 2)
    assert heavy > 350
    ds = ray.data.from_arrow(t).repartition(6)
    got = pa.concat_tables(
        [pa.table(x) for x in weighted_sample_noreplace(ds, "id", "w", 400, salt=3)
         .iter_batches(batch_format="pyarrow")]
    ).sort_by("id")
    assert got.cast(want.schema).equals(want)
    bad = pa.table({"id": pa.array([1, 2], pa.int64()), "w": pa.array([1, 0], pa.int64())})
    with pytest.raises(ValueError):
        weighted_sample_noreplace(bad, "id", "w", 1)


def test_ucb_scores_dataset_matches_table(ray_session):
    import ray

    from kamae_ray.stages.evalmetrics import ucb_scores

    rng = np.random.default_rng(2)
    n = 3000
    arms = rng.choice(["a", "b", "c", "d"], n).astype(object)
    arms[5] = None
    v = rng.integers(-100, 400, n).astype(object)
    v[7] = None
    t = pa.table({"arm": pa.array(list(arms), pa.string()),
                  "v": pa.array(list(v), pa.int64())})
    want = ucb_scores(t, "arm", "v")
    assert want.num_rows == 4
    ds = ray.data.from_arrow(t).repartition(5)
    got = ucb_scores(ds, "arm", "v")
    assert got.equals(want)
    # exploration bonus shrinks with n: arm with fewer pulls has bigger bonus
    import numpy as _np

    nn = _np.array(want.column("n").to_pylist(), dtype=float)
    assert (nn > 0).all()
