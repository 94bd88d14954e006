import numpy as np
import pyarrow as pa
import pytest

from kamae_ray.functions.farmhash import safe_hash64
from kamae_ray.stages import (
    ImputeEstimator,
    MinMaxScaleEstimator,
    OneHotEncodeEstimator,
    SharedStringIndexEstimator,
    SingleFeatureArrayStandardScaleEstimator,
    StandardScaleEstimator,
    StringIndexEstimator,
    StringIndexTransformer,
)


def test_standard_scale_scalar(scalar_mixed):
    m = StandardScaleEstimator(input_col="col1", output_col="o").fit(scalar_mixed)
    vals = np.array([1.0, 4.0, 7.0])
    assert m.mean == pytest.approx([vals.mean()])
    assert m.stddev == pytest.approx([vals.std()])  # population std
    out = m.transform_batch(scalar_mixed).column("o").to_pylist()
    assert out == pytest.approx(((vals - vals.mean()) / vals.std()).tolist())


def test_standard_scale_array_positions(scalar_mixed):
    m = StandardScaleEstimator(input_col="col1_col2_col3", output_col="o").fit(scalar_mixed)
    mat = np.array([[1.0, 2.0, 3.0], [4.0, 2.0, 6.0], [7.0, 8.0, 3.0]])
    assert m.mean == pytest.approx(mat.mean(axis=0).tolist())
    assert m.stddev == pytest.approx(mat.std(axis=0).tolist())


def test_standard_scale_mask_and_zero_std():
    t = pa.table({"a": [[1.0, 5.0], [-1.0, 5.0], [3.0, 5.0]]})
    m = StandardScaleEstimator(input_col="a", mask_value=-1.0, output_col="o").fit(t)
    assert m.mean == pytest.approx([2.0, 5.0])
    assert m.stddev == pytest.approx([1.0, 0.0])
    out = m.transform_batch(t).column("o").to_pylist()
    # std==0 -> scale 0; mask positions pass through
    assert out[0] == pytest.approx([-1.0, 0.0])
    assert out[1] == pytest.approx([-1.0, 0.0])  # masked value unchanged


def test_single_feature_array_scale():
    t = pa.table({"a": [[1.0, 2.0], [3.0, 4.0]]})
    m = SingleFeatureArrayStandardScaleEstimator(input_col="a", output_col="o").fit(t)
    flat = np.array([1.0, 2.0, 3.0, 4.0])
    assert m.mean == pytest.approx([flat.mean()])
    assert m.stddev == pytest.approx([flat.std()])


def test_minmax(scalar_mixed):
    m = MinMaxScaleEstimator(input_col="col1_col2_col3", output_col="o").fit(scalar_mixed)
    assert m.min == [1.0, 2.0, 3.0]
    assert m.max == [7.0, 8.0, 6.0]
    out = m.transform_batch(scalar_mixed).column("o").to_pylist()
    assert out[0] == pytest.approx([0.0, 0.0, 0.0])


def test_impute_mean_median():
    t = pa.table({"x": [1.0, None, 3.0, -999.0, 10.0]})
    m = ImputeEstimator(input_col="x", mask_value=-999.0, impute_method="mean", output_col="o").fit(t)
    assert m.impute_value == pytest.approx(np.mean([1.0, 3.0, 10.0]))
    assert m.transform_batch(t).column("o").to_pylist() == pytest.approx(
        [1.0, m.impute_value, 3.0, m.impute_value, 10.0]
    )
    m2 = ImputeEstimator(input_col="x", mask_value=-999.0, impute_method="median", output_col="o").fit(t)
    assert m2.impute_value == pytest.approx(3.0)


def test_impute_median_even_interpolates():
    t = pa.table({"x": [1.0, 2.0, 3.0, 10.0]})
    m = ImputeEstimator(input_col="x", impute_method="median", output_col="o").fit(t)
    assert m.impute_value == pytest.approx(2.5)


def test_string_index_rules(strings_edge):
    m = StringIndexEstimator(
        input_col="label", mask_token="PAD", string_order_type="frequencyDesc", output_col="o"
    ).fit(strings_edge)
    # frequencies: x=3, y=2, zz=1 (PAD and null excluded)
    assert m.labels_array == ["x", "y", "zz"]
    out = m.transform_batch(strings_edge).column("o").to_pylist()
    # mask->0, null->0; known = pos + num_oov(1) + mask(1)
    assert out == [2, 3, 2, 0, 0, 2, 3, 4]


def test_string_index_oov_hash():
    m = StringIndexTransformer(
        input_col="s", labels_array=["a"], mask_token=None, num_oov_indices=2, output_col="o"
    )
    t = pa.table({"s": ["a", "UNSEEN"]})
    out = m.transform_batch(t).column("o").to_pylist()
    assert out[0] == 2  # pos 0 + 2 oov
    assert out[1] == (safe_hash64("UNSEEN") % 2)  # oov bucket, start=0


def test_string_index_alphabetical(strings_edge):
    m = StringIndexEstimator(
        input_col="label", string_order_type="alphabeticalAsc", output_col="o"
    ).fit(strings_edge)
    assert m.labels_array == ["PAD", "x", "y", "zz"]  # no mask -> PAD is a label


def test_string_index_max_labels(strings_edge):
    m = StringIndexEstimator(
        input_col="label", mask_token="PAD", max_num_labels=1, output_col="o"
    ).fit(strings_edge)
    assert m.labels_array == ["x"]


def test_shared_string_index(strings_edge):
    m = SharedStringIndexEstimator(
        input_cols=["label", "label"], output_cols=["o1", "o2"], mask_token="PAD"
    ).fit(strings_edge)
    out = m.transform_batch(strings_edge)
    assert out.column("o1").to_pylist() == out.column("o2").to_pylist()


def test_string_index_on_arrays(strings_edge):
    m = StringIndexEstimator(input_col="label_arr", mask_token="PAD", output_col="o").fit(strings_edge)
    # counts over flattened arrays: a=3,b=3,c=2,d=1 -> tie a/b broken lexicographically
    assert m.labels_array == ["a", "b", "c", "d"]
    out = m.transform_batch(strings_edge).column("o").to_pylist()
    assert out[0] == [2, 3, 2]
    assert out[1] == [0, 4]
    assert out[4] is None


def test_one_hot(strings_edge):
    m = OneHotEncodeEstimator(input_col="label", mask_token="PAD", output_col="o").fit(strings_edge)
    out = m.transform_batch(strings_edge).column("o").to_pylist()
    width = len(m.labels_array) + 1 + 1
    assert all(len(v) == width for v in out)
    assert out[0][2] == 1.0 and sum(out[0]) == 1.0
    m2 = OneHotEncodeEstimator(input_col="label", mask_token="PAD", drop_unseen=True, output_col="o").fit(strings_edge)
    out2 = m2.transform_batch(strings_edge).column("o").to_pylist()
    assert all(len(v) == len(m2.labels_array) for v in out2)
    assert sum(out2[3]) == 0.0  # mask row drops to all-zeros


def test_target_encode_semantics_and_dataset_path(ray_session):
    import duckdb
    import ray

    from kamae_ray.stages.indexers import TargetEncodeEstimator

    t = pa.table({
        "rid": pa.array(range(8), pa.int64()),
        "cat": pa.array(["a", "b", "a", "c", None, "b", "a", "d"]),
        "y": pa.array([1, 2, 3, 4, 5, 6, None, 8], pa.int64()),
    })
    tr = TargetEncodeEstimator(input_col="cat", output_col="enc",
                               target_col="y", smoothing=2.0).fit(t)
    out = tr.transform(t).sort_by("rid")
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        "WITH g AS (SELECT cat, sum(y)::DOUBLE s, count(y)::DOUBLE c FROM t "
        "WHERE cat IS NOT NULL GROUP BY cat), "
        "p AS (SELECT sum(y)::DOUBLE / count(y) pr FROM t) "
        "SELECT t.rid, COALESCE((g.s + 2 * p.pr) / (g.c + 2), p.pr) AS enc "
        "FROM t LEFT JOIN g USING (cat) CROSS JOIN p ORDER BY rid"
    ).fetch_arrow_table()
    assert out.column("enc").to_pylist() == want.column("enc").to_pylist()
    # Dataset fit == Table fit; unseen category at transform -> prior
    ds = ray.data.from_arrow(t).repartition(3)
    tr_ds = TargetEncodeEstimator(input_col="cat", output_col="enc",
                                  target_col="y", smoothing=2.0).fit(ds)
    assert sorted(zip(tr_ds.categories, tr_ds.encodings)) == \
        sorted(zip(tr.categories, tr.encodings))
    assert tr_ds.default_value == tr.default_value
    novel = pa.table({"cat": pa.array(["zzz"]), "y": pa.array([0], pa.int64())})
    assert tr.transform(novel).column("enc").to_pylist() == [tr.default_value]
    got_ds = pa.concat_tables(
        [pa.table(b) for b in tr_ds.transform(ds)
         .iter_batches(batch_format="pyarrow")]).sort_by("rid")
    assert got_ds.column("enc").to_pylist() == out.column("enc").to_pylist()


def test_count_encode_semantics_and_dataset_path(ray_session):
    import ray

    from kamae_ray.stages.indexers import CountEncodeEstimator

    t = pa.table({"cat": pa.array(["a", "b", "a", None, "a", "c"])})
    tr = CountEncodeEstimator(input_col="cat", output_col="cnt").fit(t)
    probe = pa.table({"cat": pa.array(["a", "b", "zz", None])})
    assert tr.transform(probe).column("cnt").to_pylist() == [3, 1, 0, 0]
    trn = CountEncodeEstimator(input_col="cat", output_col="fr",
                               normalize=True).fit(t)
    assert trn.transform(probe).column("fr").to_pylist() == [0.6, 0.2, 0.0, 0.0]
    # int categories via the vocab string round-trip; Dataset fit == Table fit
    ti = pa.table({"cat": pa.array([7, 7, 8, None], pa.int64())})
    tri = CountEncodeEstimator(input_col="cat", output_col="cnt").fit(ti)
    assert tri.transform(ti).column("cnt").to_pylist() == [2, 2, 1, 0]
    ds = ray.data.from_arrow(t).repartition(3)
    tr_ds = CountEncodeEstimator(input_col="cat", output_col="cnt").fit(ds)
    assert sorted(zip(tr_ds.categories, tr_ds.counts)) == \
        sorted(zip(tr.categories, tr.counts))


def test_rare_label_encoder_threshold_and_cap(ray_session):
    import ray

    import pyarrow as pa
    from kamae_ray.stages import RareLabelEncoderEstimator

    t = pa.table({"c": ["a"] * 5 + ["b"] * 3 + ["d"] * 3 + ["x", "y", None]})
    # threshold: drop singletons
    tr = RareLabelEncoderEstimator(input_col="c", output_col="o", min_freq=2).fit(t)
    assert tr.keep == ["a", "b", "d"]
    got = tr.transform(t).column("o").to_pylist()
    assert got == ["a"] * 5 + ["b"] * 3 + ["d"] * 3 + ["__rare__", "__rare__", None]
    # cap with the (count DESC, value ASC) tie rule: b ties d -> b kept
    tr2 = RareLabelEncoderEstimator(input_col="c", output_col="o", min_freq=1, max_categories=2).fit(t)
    assert tr2.keep == ["a", "b"]
    # dataset fit (distributed sort+limit path) matches the table fit
    ds = ray.data.from_arrow(t).repartition(3)
    tr3 = RareLabelEncoderEstimator(input_col="c", output_col="o", min_freq=1, max_categories=2).fit(ds)
    assert tr3.keep == tr2.keep
    # custom rare token round-trips through params
    tr4 = RareLabelEncoderEstimator(input_col="c", output_col="o", min_freq=2, rare_label="<RARE>").fit(t)
    assert tr4.transform(t).column("o").to_pylist()[-2] == "<RARE>"


def test_woe_encode_matches_manual(ray_session):
    import math

    import numpy as np
    import pyarrow as pa
    import ray

    from kamae_ray.stages import WoeEncodeEstimator

    rng = np.random.default_rng(5)
    cats = rng.choice(["a", "b", "c", "d"], 5000).tolist()
    y = rng.integers(0, 2, 5000).tolist()
    t = pa.table({"c": cats, "y": pa.array(y, pa.int64())})
    tr = WoeEncodeEstimator(input_col="c", target_col="y", output_col="w").fit(t)
    # manual reference
    from collections import Counter
    pos, n = Counter(), Counter()
    for c, yy in zip(cats, y):
        n[c] += 1
        pos[c] += yy
    K = len(n)
    pt, nt = sum(pos.values()), sum(n.values()) - sum(pos.values())
    exp = {c: math.log(((pos[c] + 1) * (nt + K)) / (((n[c] - pos[c]) + 1) * (pt + K))) for c in n}
    got = dict(zip(tr.categories, tr.encodings))
    for c in n:
        assert got[c] == exp[c], c
    # dataset fit identical (int sums are order-free)
    ds = ray.data.from_arrow(t).repartition(5)
    tr2 = WoeEncodeEstimator(input_col="c", target_col="y", output_col="w").fit(ds)
    assert dict(zip(tr2.categories, tr2.encodings)) == got
    # non-binary target raises
    bad = pa.table({"c": ["a", "b"], "y": pa.array([2, 0], pa.int64())})
    try:
        WoeEncodeEstimator(input_col="c", target_col="y", output_col="w").fit(bad)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_grouped_impute_median_and_mean(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from kamae_ray.stages import GroupedImputeEstimator

    t = pa.table({
        "g": ["a", "a", "a", "b", "b", "c", "c", None, "z"],
        "v": [1.0, None, 3.0, 10.0, None, None, None, 7.0, None],
    })
    tr = GroupedImputeEstimator(input_col="v", group_col="g", output_col="o").fit(t)
    # a-median 2.0, b 10.0; all-null c dropped from the map; global median
    # of [1,3,10,7] = 5.0 backs c, unseen z and the null group
    assert (tr.groups, tr.values, tr.default_value) == (["a", "b"], [2.0, 10.0], 5.0)
    assert tr.transform(t).column("o").to_pylist() == \
        [1.0, 2.0, 3.0, 10.0, 10.0, 5.0, 5.0, 7.0, 5.0]
    # dataset fit identical
    ds = ray.data.from_arrow(t).repartition(4)
    tr2 = GroupedImputeEstimator(input_col="v", group_col="g", output_col="o").fit(ds)
    assert (tr2.groups, tr2.values, tr2.default_value) == (tr.groups, tr.values, tr.default_value)
    # mean strategy on integers (order-free exact)
    ti = pa.table({"g": ["a", "a", "b"], "v": pa.array([2, 4, None], pa.int64())})
    trm = GroupedImputeEstimator(input_col="v", group_col="g", output_col="o",
                                 strategy="mean").fit(ti)
    got = trm.transform(ti).column("o").to_pylist()
    assert got == [2.0, 4.0, 3.0]  # b all-null -> global mean (2+4)/2


def test_loo_target_encode(ray_session):
    import pyarrow as pa
    import ray

    from kamae_ray.stages import LooTargetEncodeEstimator

    t = pa.table({"c": ["a", "a", "a", "b", "b", "x", None], "y": [1, 0, 1, 1, 1, 0, 1]})
    tr = LooTargetEncodeEstimator(input_col="c", target_col="y", output_col="e").fit(t)
    got = tr.transform(t).column("e").to_pylist()
    # prior = mean over NON-NULL-category rows = 4/6
    p = 4 / 6
    assert got == [0.5, 1.0, 0.5, 1.0, 1.0, p, p]
    # zero leakage: a row's own label never reaches its encode — flipping
    # row 1's label changes every OTHER a-row's encode but row 1 keeps the
    # encode implied by the other rows
    t2 = pa.table({"c": ["a", "a", "a"], "y": [1, 1, 1]})
    tr2 = LooTargetEncodeEstimator(input_col="c", target_col="y", output_col="e").fit(t2)
    assert tr2.transform(t2).column("e").to_pylist() == [1.0, 1.0, 1.0]
    # dataset fit matches table fit
    ds = ray.data.from_arrow(t).repartition(3)
    tr3 = LooTargetEncodeEstimator(input_col="c", target_col="y", output_col="e").fit(ds)
    assert (tr3.categories, tr3.sums, tr3.counts, tr3.prior) == \
        (tr.categories, tr.sums, tr.counts, tr.prior)


def test_grouped_quantile_bucketize(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from kamae_ray.stages import GroupedQuantileBucketizeEstimator

    rng = np.random.default_rng(7)
    # group b shifted so its quartiles differ from a's
    g = rng.choice(["a", "b"], 2000).tolist()
    v = rng.standard_normal(2000) + np.where(np.array(g) == "b", 10.0, 0.0)
    t = pa.table({"g": g, "v": v})
    tr = GroupedQuantileBucketizeEstimator(
        input_col="v", group_col="g", output_col="b",
        num_buckets=4, boundary_decimals=6).fit(t)
    out = tr.transform(t)
    import collections
    c = collections.Counter(zip(out.column("g").to_pylist(), out.column("b").to_pylist()))
    # each group's own quartiles -> ~balanced buckets within each group
    for grp in ("a", "b"):
        n = sum(cnt for (gg, _b), cnt in c.items() if gg == grp)
        for bkt in (1, 2, 3, 4):
            assert abs(c[(grp, bkt)] - n / 4) <= 2, (grp, bkt, c)
    # unseen group falls back to GLOBAL splits; null value stays null
    t2 = pa.table({"g": ["zzz", "a"], "v": [100.0, None]})
    got = tr.transform(t2).column("b").to_pylist()
    assert got[0] == 4 and got[1] is None
    # dataset fit matches table fit
    ds = ray.data.from_arrow(t).repartition(5)
    tr2 = GroupedQuantileBucketizeEstimator(
        input_col="v", group_col="g", output_col="b",
        num_buckets=4, boundary_decimals=6).fit(ds)
    assert tr2.groups == tr.groups and tr2.splits_per_group == tr.splits_per_group \
        and tr2.default_splits == tr.default_splits


def test_cv_target_encode(ray_session):
    import pyarrow as pa
    import ray

    from kamae_ray.pipelines.packing import _NS_P
    from kamae_ray.stages import cv_target_encode

    ids = list(range(12))
    keys = ["a"] * 8 + ["b"] * 3 + [None]
    y = [1, 0, 1, 1, 0, 0, 1, 0, 1, 1, 0, 1]
    t = pa.table({"id": ids, "k": keys, "y": y})
    out = cv_target_encode(t, "k", "y", "id", n_folds=3, salt=5, output_col="e")
    folds = [((i + 5) * _NS_P % 2**64) % 3 for i in ids]
    assert out.column("fold").to_pylist() == folds
    # naive reference: OOF mean per (key, fold); singleton-fold keys / null
    # keys take the global prior over non-null-key rows
    from collections import defaultdict
    sums, cnts = defaultdict(int), defaultdict(int)
    for i, k, yy in zip(ids, keys, y):
        if k is not None:
            sums[(k, folds[i])] += yy
            cnts[(k, folds[i])] += 1
    tot_s = {k: sum(v for (kk, f), v in sums.items() if kk == k) for k in ("a", "b")}
    tot_n = {k: sum(v for (kk, f), v in cnts.items() if kk == k) for k in ("a", "b")}
    prior = sum(tot_s.values()) / sum(tot_n.values())
    exp = []
    for i, k in zip(ids, keys):
        if k is None:
            exp.append(prior)
        else:
            on = tot_n[k] - cnts[(k, folds[i])]
            exp.append((tot_s[k] - sums[(k, folds[i])]) / on if on > 0 else prior)
    assert out.column("e").to_pylist() == exp
    # no-leakage: flipping a row's own label never changes its OWN encode
    y2 = list(y)
    y2[0] = 0
    out2 = cv_target_encode(pa.table({"id": ids, "k": keys, "y": y2}),
                            "k", "y", "id", n_folds=3, salt=5, output_col="e")
    e1 = out.column("e").to_pylist()
    e2 = out2.column("e").to_pylist()
    f0 = folds[0]
    for i in range(12):
        if keys[i] == "a" and folds[i] == f0:
            assert e1[i] == e2[i]  # same fold as row 0 -> excluded either way
    # dataset path matches table path (sorted by id)
    ds = ray.data.from_arrow(t).repartition(3)
    got = cv_target_encode(ds, "k", "y", "id", n_folds=3, salt=5, output_col="e")
    rows = sorted(
        (r["id"], r["fold"], r["e"]) for r in got.take_all()
    )
    assert rows == sorted(zip(ids, folds, exp))


def test_woe_iv_table(ray_session):
    import math

    import pyarrow as pa
    import ray

    from kamae_ray.stages.indexers import woe_iv_table

    t = pa.table({"c": ["a", "a", "a", "b", "b", None],
                  "y": [1, 1, 0, 0, 0, 1]})
    out = woe_iv_table(t, "c", "y")
    rows = {r["c"]: r for r in out.to_pylist()}
    # totals over NON-NULL categories: pt=2, nt=3, K=2
    pt, nt, k = 2, 3, 2
    for cat, (p, ng) in {"a": (2, 1), "b": (0, 2)}.items():
        woe = math.log(((p + 1) * (nt + k)) / ((ng + 1) * (pt + k)))
        iv = ((p + 1) / (pt + k) - (ng + 1) / (nt + k)) * woe
        assert rows[cat]["pos"] == p and rows[cat]["neg"] == ng
        assert abs(rows[cat]["woe"] - woe) < 1e-12
        assert abs(rows[cat]["iv"] - iv) < 1e-12
    assert None not in rows
    # dataset fit matches table fit
    ds = ray.data.from_arrow(t).repartition(2)
    out2 = woe_iv_table(ds, "c", "y")
    assert sorted(out.to_pylist(), key=lambda r: r["c"]) == \
        sorted(out2.to_pylist(), key=lambda r: r["c"])
    # non-binary target rejected
    import pytest
    with pytest.raises(ValueError, match="binary"):
        woe_iv_table(pa.table({"c": ["a"], "y": [2]}), "c", "y")


def test_grouped_standard_scale(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from kamae_ray.stages import GroupedStandardScaleEstimator

    t = pa.table({"g": ["a", "a", "a", "b", "b", None],
                  "x": pa.array([1, 2, 3, 10, 10, 7], pa.int64())})
    tr = GroupedStandardScaleEstimator(input_col="x", group_col="g",
                                       output_col="z").fit(t)
    out = tr.transform(t).column("z").to_pylist()
    ma, sa = 2.0, np.sqrt((3 * 14 - 36) / 9)  # group a: 1,2,3
    assert abs(out[0] - (1 - ma) / sa) < 1e-15
    assert out[4] == 0.0  # zero-std group b
    # null group -> GLOBAL fallback over fitted rows (a+b)
    tot_n, tot_sx, tot_sxx = 5, 26, 214
    gm = tot_sx / tot_n
    gs = np.sqrt((tot_n * tot_sxx - tot_sx**2) / tot_n**2)
    assert abs(out[5] - (7 - gm) / gs) < 1e-15
    # null value -> null
    t2 = pa.table({"g": ["a", "a"], "x": pa.array([1, None], pa.int64())})
    tr2 = GroupedStandardScaleEstimator(input_col="x", group_col="g",
                                        output_col="z").fit(t2)
    assert tr2.transform(t2).column("z").to_pylist()[1] is None
    # dataset fit identical; float input rejected
    ds = ray.data.from_arrow(t).repartition(3)
    tr3 = GroupedStandardScaleEstimator(input_col="x", group_col="g",
                                        output_col="z").fit(ds)
    assert (tr3.groups, tr3.means, tr3.stds) == (tr.groups, tr.means, tr.stds)
    import pytest
    with pytest.raises(ValueError, match="integer"):
        GroupedStandardScaleEstimator(input_col="f", group_col="g",
                                      output_col="z").fit(
            pa.table({"g": ["a"], "f": [1.5]}))
