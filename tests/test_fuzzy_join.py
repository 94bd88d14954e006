"""fuzzy_join (nearest-Levenshtein lookup) vs DuckDB levenshtein(): the
vectorized Wagner-Fischer matrix (functions/editdist.py) must agree exactly
with DuckDB on random ASCII strings, and the join must implement SQL
nearest-match semantics (min distance, lexicographic tiebreak, max_distance
cutoff, NULL left never matches, left vs inner)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kamae_ray.functions.editdist import levenshtein_matrix
from kamae_ray.stages import fuzzy_join

ALPHA = "abcdexyz"


def _rand_strings(rng, n, max_len=12):
    return ["".join(rng.choice(list(ALPHA), size=rng.integers(0, max_len))) for _ in range(n)]


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 10_000))
def test_levenshtein_matrix_matches_duckdb(seed):
    rng = np.random.default_rng(seed)
    a = _rand_strings(rng, int(rng.integers(1, 20)))
    b = _rand_strings(rng, int(rng.integers(1, 15)))
    M = levenshtein_matrix(pa.array(a), pa.array(b))
    con = duckdb.connect()
    con.register("a", pd.DataFrame({"i": range(len(a)), "s": a}))
    con.register("b", pd.DataFrame({"j": range(len(b)), "s": b}))
    exp = con.sql(
        "SELECT i, j, levenshtein(a.s, b.s) d FROM a CROSS JOIN b ORDER BY i, j"
    ).fetchnumpy()
    want = np.zeros_like(M)
    want[exp["i"], exp["j"]] = exp["d"]
    np.testing.assert_array_equal(M, want)


def _oracle(left: pa.Table, right: pa.Table, max_distance, how):
    con = duckdb.connect()
    con.register("l", left.to_pandas().reset_index(names="_rid"))
    con.register("r", right.to_pandas())
    cut = f"AND d <= {max_distance}" if max_distance is not None else ""
    jn = "LEFT JOIN" if how == "left" else "JOIN"
    return con.sql(
        "WITH scored AS (SELECT l._rid, r.name rname, r.code, levenshtein(l.name, r.name) d, "
        "row_number() OVER (PARTITION BY l._rid ORDER BY levenshtein(l.name, r.name), r.name) rn "
        "FROM l JOIN r ON l.name IS NOT NULL) "
        f"SELECT l.id, l.name, s.code, s.d distance FROM l {jn} "
        f"(SELECT * FROM scored WHERE rn = 1 {cut}) s ON l._rid = s._rid ORDER BY l.id"
    ).df()


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 10_000), st.sampled_from([None, 2, 5]), st.sampled_from(["left", "inner"]))
def test_fuzzy_join_matches_duckdb(seed, max_distance, how):
    rng = np.random.default_rng(seed)
    lnames = _rand_strings(rng, int(rng.integers(1, 60)))
    lnames = [None if rng.random() < 0.15 else s for s in lnames]
    rnames = list(dict.fromkeys(_rand_strings(rng, int(rng.integers(1, 12)))))
    left = pa.table({"id": pa.array(range(len(lnames)), pa.int64()), "name": pa.array(lnames, pa.string())})
    right = pa.table(
        {"name": pa.array(rnames, pa.string()), "code": pa.array(range(len(rnames)), pa.int64())}
    )
    got = (
        fuzzy_join(left, right, left_on="name", max_distance=max_distance, how=how)
        .to_pandas()
        .sort_values(["id"])
        .reset_index(drop=True)
    )
    exp = _oracle(left, right, max_distance, how).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"code": "float64", "distance": "float64"}),
        exp.astype({"code": "float64", "distance": "float64"}),
        check_dtype=False,
    )


def test_fuzzy_join_rejects_duplicate_right():
    left = pa.table({"name": ["a"]})
    right = pa.table({"name": ["x", "x"], "code": [1, 2]})
    with pytest.raises(ValueError, match="duplicate"):
        fuzzy_join(left, right, left_on="name")


def test_fuzzy_join_suffix_collision():
    left = pa.table({"name": ["abc"], "code": [99]})
    right = pa.table({"name": ["abd"], "code": [1]})
    out = fuzzy_join(left, right, left_on="name")
    assert out.column_names == ["name", "code", "code_r", "distance"]
    assert out.column("code_r").to_pylist() == [1]
    assert out.column("distance").to_pylist() == [1]


def test_fuzzy_join_dataset_path(ray_session):
    import ray

    left = pa.table(
        {"id": pa.array(range(200), pa.int64()), "name": pa.array([f"val{i % 17:03d}" for i in range(200)])}
    )
    right = pa.table({"name": [f"val{i:03d}" for i in range(0, 17, 2)], "code": list(range(9))})
    expect = fuzzy_join(left, right, left_on="name", max_distance=1)
    ds = ray.data.from_arrow(left).repartition(4)
    got = pa.concat_tables(
        ray.get(fuzzy_join(ds, right, left_on="name", max_distance=1).to_arrow_refs())
    ).sort_by("id")
    assert got.equals(expect.sort_by("id").cast(got.schema))


def test_edit_distance_transformer_vs_duckdb(ray_session):
    import random
    import string as _string

    import duckdb
    import ray

    from kamae_ray.stages import EditDistanceTransformer

    rng = random.Random(3)
    a = ["".join(rng.choices(_string.ascii_lowercase, k=rng.randint(0, 12))) for _ in range(400)]
    b = ["".join(rng.choices(_string.ascii_lowercase, k=rng.randint(0, 12))) for _ in range(400)]
    a[5] = None
    t = pa.table({"i": pa.array(range(400), pa.int64()),
                  "a": pa.array(a, pa.string()), "b": pa.array(b, pa.string())})
    tf = EditDistanceTransformer(input_cols=["a", "b"], output_col="d")
    want = tf.transform_batch(t)
    ora = duckdb.sql(
        "SELECT levenshtein(coalesce(a,''), coalesce(b,'')) d FROM t ORDER BY i"
    ).df()
    assert want.column("d").to_pylist() == ora["d"].astype(int).tolist()
    ds = ray.data.from_arrow(t).repartition(4)
    got = pa.concat_tables(
        [pa.table(x) for x in tf.transform(ds).iter_batches(batch_format="pyarrow")]
    ).sort_by("i")
    assert got.column("d").to_pylist() == want.column("d").to_pylist()
    with pytest.raises(ValueError):
        EditDistanceTransformer(input_cols=["a"], output_col="d")


def test_edit_distance_damerau_and_hamming_vs_duckdb():
    import random
    import string as _string

    import duckdb

    from kamae_ray.stages import EditDistanceTransformer

    rng = random.Random(11)
    alph = _string.ascii_lowercase[:6] + "é"
    a = ["".join(rng.choices(alph, k=rng.randint(0, 10))) for _ in range(500)]
    b = ["".join(rng.choices(alph, k=rng.randint(0, 10))) for _ in range(500)]
    a[0], b[0] = "ca", "abc"  # full-DL witness: 2 (OSA would say 3)
    a[3] = None
    t = pa.table({"i": pa.array(range(500), pa.int64()),
                  "a": pa.array(a, pa.string()), "b": pa.array(b, pa.string())})
    dam = EditDistanceTransformer(input_cols=["a", "b"], output_col="d", mode="damerau")
    got = dam.transform_batch(t).column("d").to_pylist()
    ora = duckdb.sql(
        "SELECT damerau_levenshtein(coalesce(a,''), coalesce(b,'')) d FROM t ORDER BY i"
    ).df()["d"].astype(int).tolist()
    assert got == ora
    assert got[0] == 2

    # hamming: ASCII-only (DuckDB length/substr are char-based; engine is bytes)
    a2 = ["".join(rng.choices(_string.ascii_lowercase, k=rng.randint(0, 8))) for _ in range(500)]
    b2 = ["".join(rng.choices(_string.ascii_lowercase, k=rng.randint(0, 8))) for _ in range(500)]
    b2[7] = None
    t2 = pa.table({"i": pa.array(range(500), pa.int64()),
                   "a": pa.array(a2, pa.string()), "b": pa.array(b2, pa.string())})
    ham = EditDistanceTransformer(input_cols=["a", "b"], output_col="d", mode="hamming")
    got2 = ham.transform_batch(t2).column("d").to_pylist()
    ora2 = duckdb.sql(
        "SELECT CASE WHEN least(length(coalesce(a,'')), length(coalesce(b,''))) = 0 "
        "THEN abs(length(coalesce(a,'')) - length(coalesce(b,''))) "
        "ELSE hamming(substr(coalesce(a,''), 1, least(length(coalesce(a,'')), length(coalesce(b,'')))), "
        "substr(coalesce(b,''), 1, least(length(coalesce(a,'')), length(coalesce(b,''))))) "
        "+ abs(length(coalesce(a,'')) - length(coalesce(b,''))) END d FROM t2 ORDER BY i"
    ).df()["d"].astype(int).tolist()
    assert got2 == ora2

    with pytest.raises(ValueError):
        EditDistanceTransformer(input_cols=["a", "b"], output_col="d", mode="cosine")


def test_charset_jaccard_mode_vs_duckdb():
    import random
    import string as _string

    import duckdb

    from kamae_ray.stages import EditDistanceTransformer

    rng = random.Random(23)
    a = ["".join(rng.choices(_string.ascii_lowercase[:9] + " #", k=rng.randint(0, 10))) for _ in range(600)]
    b = ["".join(rng.choices(_string.ascii_lowercase[:9] + " #", k=rng.randint(0, 10))) for _ in range(600)]
    a[0] = b[0] = ""
    a[1] = ""
    b[2] = None
    t = pa.table({"i": pa.array(range(600), pa.int64()),
                  "a": pa.array(a, pa.string()), "b": pa.array(b, pa.string())})
    tf = EditDistanceTransformer(input_cols=["a", "b"], output_col="d", mode="charset_jaccard")
    got = tf.transform_batch(t).column("d").to_pylist()
    ora = duckdb.sql(
        "WITH s AS (SELECT i, list_distinct(regexp_split_to_array(coalesce(a,''), '')) da, "
        "list_distinct(regexp_split_to_array(coalesce(b,''), '')) db, "
        "length(coalesce(a,'')) la, length(coalesce(b,'')) lb FROM t) "
        "SELECT CASE WHEN la = 0 AND lb = 0 THEN 1000000 WHEN la = 0 OR lb = 0 THEN 0 "
        "ELSE (1000000 * len(list_intersect(da, db))) // "
        "(len(da) + len(db) - len(list_intersect(da, db))) END d FROM s ORDER BY i"
    ).df()["d"].astype(int).tolist()
    assert got == ora
    assert got[0] == 1000000 and got[1] == 0


def test_jaro_winkler_modes_bitexact_vs_duckdb_native():
    import random
    import string as _string

    import duckdb
    import numpy as np

    from kamae_ray.stages import EditDistanceTransformer

    rng = random.Random(31)
    alph = _string.ascii_lowercase[:7] + "é "
    a = ["".join(rng.choices(alph, k=rng.randint(0, 14))) for _ in range(4000)]
    b = ["".join(rng.choices(alph, k=rng.randint(0, 14))) for _ in range(4000)]
    a[0], b[0] = "martha", "marhta"  # classic: jaro 0.944..., jw 0.961...
    a[2] = None
    t = pa.table({"i": pa.array(range(4000), pa.int64()),
                  "a": pa.array(a, pa.string()), "b": pa.array(b, pa.string())})
    for mode, fn in (("jaro", "jaro_similarity"),
                     ("jaro_winkler", "jaro_winkler_similarity")):
        tf = EditDistanceTransformer(input_cols=["a", "b"], output_col="s", mode=mode)
        got = tf.transform_batch(t).column("s").to_numpy()
        exp = duckdb.sql(
            f"SELECT {fn}(coalesce(a,''), coalesce(b,'')) s FROM t ORDER BY i"
        ).df()["s"].to_numpy()
        assert (got.view(np.int64) == exp.view(np.int64)).all()
    jw = EditDistanceTransformer(input_cols=["a", "b"], output_col="s",
                                 mode="jaro_winkler").transform_batch(t)
    assert abs(jw.column("s")[0].as_py() - 0.9611111111111111) < 1e-15


def test_jaccard_sim_mode_bitexact_vs_duckdb_native():
    import random
    import string as _string

    import duckdb
    import numpy as np

    from kamae_ray.stages import EditDistanceTransformer

    rng = random.Random(41)
    alph = _string.ascii_lowercase[:8] + "é "
    a = ["".join(rng.choices(alph, k=rng.randint(1, 12))) for _ in range(3000)]
    b = ["".join(rng.choices(alph, k=rng.randint(1, 12))) for _ in range(3000)]
    a[0] = ""
    b[1] = ""
    a[2] = b[2] = ""
    t = pa.table({"i": pa.array(range(3000), pa.int64()),
                  "a": pa.array(a, pa.string()), "b": pa.array(b, pa.string())})
    tf = EditDistanceTransformer(input_cols=["a", "b"], output_col="s",
                                 mode="jaccard_sim")
    got = tf.transform_batch(t).column("s").to_numpy()
    exp = duckdb.sql(
        "SELECT CASE WHEN length(a) = 0 AND length(b) = 0 THEN CAST(1.0 AS DOUBLE) "
        "WHEN length(a) = 0 OR length(b) = 0 THEN CAST(0.0 AS DOUBLE) "
        "ELSE jaccard(a, b) END s FROM t ORDER BY i").df()["s"].to_numpy()
    assert (got.view(np.int64) == exp.view(np.int64)).all()
    assert got[0] == 0.0 and got[1] == 0.0 and got[2] == 1.0
