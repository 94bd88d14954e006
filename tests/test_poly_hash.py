"""SQL-expressible polynomial hash mode (hash_fn="poly") for the encoder
trio — engine kernels vs the scalar recurrence vs the generated DuckDB SQL."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from kamae_ray.stages.hashing import (
    POLY_MULT,
    POLY_P,
    POLY_SEED,
    BloomEncodeTransformer,
    HashIndexTransformer,
    MinHashIndexTransformer,
    poly31_column,
    poly31_scalar,
    poly31_sql,
)


def test_poly31_column_matches_scalar_and_sql():
    vals = ["1-URGENT", "", None, "héé😀", "abc", "a" * 50, "é", "PAD7"]
    arr = pa.array(vals, pa.string())
    h, nm = poly31_column(arr)
    for v, hv, m in zip(vals, h, nm):
        assert m == (v is None)
        if v is not None:
            assert hv == poly31_scalar(v)
    # sliced (nonzero offset) and large_string inputs
    h2, _ = poly31_column(arr.slice(3, 4))
    assert list(h2) == [poly31_scalar(v) for v in vals[3:7]]
    h3, _ = poly31_column(pa.array(["abc", "é"], pa.large_string()))
    assert list(h3) == [poly31_scalar("abc"), poly31_scalar("é")]
    # generated SQL reproduces the engine exactly (incl. non-ASCII + empty)
    con = duckdb.connect()
    t = pa.table({"s": pa.array([v for v in vals if v is not None])})
    con.register("t", t)
    got = [r[0] for r in con.sql(f"SELECT {poly31_sql('s')} FROM t").fetchall()]
    assert got == [poly31_scalar(v) for v in vals if v is not None]


def test_hash_index_poly_mode():
    t = pa.table({"s": ["x", "yy", None, "x", "MASK"]})
    out = HashIndexTransformer(
        input_col="s", num_bins=64, mask_value="MASK", output_col="h", hash_fn="poly"
    ).transform_batch(t)
    got = out.column("h").to_pylist()
    exp = [(poly31_scalar(v) % 63) + 1 if v not in (None, "MASK") else 0 for v in t.column("s").to_pylist()]
    assert got == exp
    # farm mode differs (different hash family) but shares null/mask rules
    farm = HashIndexTransformer(
        input_col="s", num_bins=64, mask_value="MASK", output_col="h"
    ).transform_batch(t).column("h").to_pylist()
    assert farm[2] == 0 and farm[4] == 0 and farm != got


def test_bloom_minhash_poly_mode():
    t = pa.table({"s": ["ab", None], "ws": [["ab", "PAD"], None]})
    bl = BloomEncodeTransformer(
        input_col="s", num_bins=128, num_hash_fns=3, output_col="b", hash_fn="poly"
    ).transform_batch(t).column("b").to_pylist()
    assert bl[0] == [(poly31_scalar("ab" + str(i)) % 127) + 1 for i in range(3)]
    assert bl[1] == [0, 0, 0]
    mh = MinHashIndexTransformer(
        input_col="ws", num_permutations=4, output_col="m", hash_fn="poly"
    ).transform_batch(t).column("m").to_pylist()
    exp0 = [
        min((poly31_scalar(w + str(p)) % 2147483646) + 1 for w in ["ab", "PAD"]) % 2
        for p in range(4)
    ]
    assert mh[0] == exp0
    assert mh[1] is None


def test_poly_mode_rejects_unknown():
    with pytest.raises(ValueError):
        HashIndexTransformer(input_col="s", num_bins=4, output_col="h", hash_fn="md5")


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    max_size=12)), min_size=1, max_size=8))
def test_poly31_property_vs_duckdb(vals):
    """poly31 engine == DuckDB expression for arbitrary unicode (minus NUL,
    which VARCHAR can't hold, and surrogates)."""
    import duckdb

    arr = pa.array(vals, pa.string())
    h, nm = poly31_column(arr)
    nonnull = [v for v in vals if v is not None]
    if nonnull:
        con = duckdb.connect()
        con.register("t", pa.table({"s": pa.array(nonnull)}))
        got = [r[0] for r in con.sql(f"SELECT {poly31_sql('s')} FROM t").fetchall()]
        assert got == [poly31_scalar(v) for v in nonnull]
    for v, hv, m in zip(vals, h, nm):
        assert m == (v is None)
        if v is not None:
            assert hv == poly31_scalar(v)


class TestHashingVectorizer:
    def test_matches_poly31_sql(self):
        import duckdb

        from kamae_ray.stages.hashing import poly31_sql
        from kamae_ray.stages.text import HashingVectorizerTransformer

        t = pa.table({"doc_id": [1, 2, 3, 4], "text": [
            "the quick brown fox the", "héllo wörld héllo", "", None]})
        out = HashingVectorizerTransformer(
            input_col="text", output_col="tf_vec", dim=8).transform_batch(t)
        ora = duckdb.query(f"""
            WITH w AS (SELECT doc_id, unnest(list_filter(string_split_regex(
                       coalesce(text,''), '\\s+'), x -> length(x) > 0)) AS w FROM t),
            b AS (SELECT doc_id, ({poly31_sql('w')}) % 8 AS b FROM w),
            c AS (SELECT doc_id, b, COUNT(*)::BIGINT AS n FROM b GROUP BY 1, 2),
            g AS (SELECT d.doc_id, gs.b, COALESCE(c.n, 0) AS n
                  FROM (SELECT doc_id FROM t) d
                  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS b) gs
                  LEFT JOIN c ON c.doc_id = d.doc_id AND c.b = gs.b)
            SELECT doc_id, list(n ORDER BY b) AS tf_vec FROM g GROUP BY doc_id
            ORDER BY doc_id
        """).arrow()
        assert out.column("tf_vec").to_pylist() == ora.column("tf_vec").to_pylist()
        # null/empty -> zero vector; counts sum to word count
        assert sum(out.column("tf_vec").to_pylist()[0]) == 5
        assert sum(out.column("tf_vec").to_pylist()[3]) == 0

    def test_stateless_partition_invariance(self):
        import numpy as np

        from kamae_ray.stages.text import HashingVectorizerTransformer

        rng = np.random.default_rng(0)
        docs = [" ".join(rng.choice([f"w{i}" for i in range(40)],
                                    size=rng.integers(1, 30))) for _ in range(500)]
        t = pa.table({"doc_id": pa.array(range(500)), "text": pa.array(docs)})
        tr = HashingVectorizerTransformer(input_col="text", output_col="v", dim=32)
        whole = tr.transform_batch(t).column("v").to_pylist()
        split = sum((tr.transform_batch(t.slice(i, 123)).column("v").to_pylist()
                     for i in range(0, 500, 123)), [])
        assert whole == split


def test_feature_cross_buckets_and_null_rule():
    import duckdb
    import pyarrow as pa

    from kamae_ray.stages import FeatureCrossTransformer
    from kamae_ray.stages.hashing import feature_cross_sql, poly31_scalar

    t = pa.table({
        "a": ["ab", "a", "x", None, "café"],
        "b": ["c", "bc", "y", "z", "naïve"],
    })
    tr = FeatureCrossTransformer(input_cols=["a", "b"], output_col="xb", num_bins=100)
    got = tr.transform_batch(t).column("xb").to_pylist()
    # separator discrimination: ('ab','c') and ('a','bc') land in
    # independent buckets (keys differ), any-null -> 0, non-ASCII exercised
    exp = [
        (poly31_scalar("ab\x1fc") % 99) + 1,
        (poly31_scalar("a\x1fbc") % 99) + 1,
        (poly31_scalar("x\x1fy") % 99) + 1,
        0,
        (poly31_scalar("café\x1fnaïve") % 99) + 1,
    ]
    assert got == exp
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    sql = con.execute(
        "SELECT " + feature_cross_sql(["a", "b"], 100) + " AS xb FROM t"
    ).fetchall()
    assert [r[0] for r in sql] == exp

    # farm mode shares the null rule and bucket range
    fr = FeatureCrossTransformer(input_cols=["a", "b"], output_col="xb", num_bins=100, hash_fn="farm")
    fgot = fr.transform_batch(t).column("xb").to_pylist()
    assert fgot[3] == 0 and all(1 <= v <= 99 for i, v in enumerate(fgot) if i != 3)
