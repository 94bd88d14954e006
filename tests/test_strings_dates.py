import pyarrow as pa
import pytest

from kamae_ray.stages import (
    DateAddTransformer,
    DateDiffTransformer,
    DateParseTransformer,
    DateTimeToUnixTimestampTransformer,
    StringAffixTransformer,
    StringCaseTransformer,
    StringConcatenateTransformer,
    StringContainsListTransformer,
    StringContainsTransformer,
    StringIsInListTransformer,
    StringListToStringTransformer,
    StringReplaceTransformer,
    StringToStringListTransformer,
    SubStringDelimAtIndexTransformer,
    UnixTimestampToDateTimeTransformer,
)


def col(t, name):
    return t.column(name).to_pylist()


@pytest.fixture()
def st():
    return pa.table(
        {
            "s": ["Hello World", "a,b,c", None],
            "s2": ["World", "x", "y"],
            "arr": [["p", "q"], ["r"], None],
        }
    )


def test_affix_case_concat(st):
    assert col(StringAffixTransformer(input_col="s", prefix="<", suffix=">", output_col="o").transform_batch(st), "o") == ["<Hello World>", "<a,b,c>", None]
    assert col(StringCaseTransformer(input_col="s", string_case_type="upper", output_col="o").transform_batch(st), "o") == ["HELLO WORLD", "A,B,C", None]
    assert col(StringConcatenateTransformer(input_cols=["s", "s2"], separator="_", output_col="o").transform_batch(st), "o")[:2] == ["Hello World_World", "a,b,c_x"]


def test_contains_isin(st):
    assert col(StringContainsTransformer(input_col="s", string_constant="World", output_col="o").transform_batch(st), "o") == [True, False, None]
    assert col(StringContainsTransformer(input_cols=["s", "s2"], output_col="o").transform_batch(st), "o") == [True, False, None]
    assert col(StringContainsListTransformer(input_col="s", string_constant_list=["b,", "Hello"], output_col="o").transform_batch(st), "o") == [True, True, None]
    assert col(StringIsInListTransformer(input_col="s2", string_constant_list=["World", "y"], output_col="o").transform_batch(st), "o") == [True, False, True]


def test_replace_split_join(st):
    assert col(StringReplaceTransformer(input_col="s", string_match_constant="l+", string_replace_constant="L", output_col="o").transform_batch(st), "o") == ["HeLo WorLd", "a,b,c", None]
    assert col(SubStringDelimAtIndexTransformer(input_col="s", delimiter=",", index=1, default_value="NA", output_col="o").transform_batch(st), "o") == ["NA", "b", None]
    assert col(StringListToStringTransformer(input_col="arr", separator="-", output_col="o").transform_batch(st), "o") == ["p-q", "r", None]
    out = StringToStringListTransformer(input_col="s", separator=",", list_length=2, default_value="PAD", output_col="o").transform_batch(st)
    assert col(out, "o") == [["Hello World", "PAD"], ["a", "b"], None]


def test_date_parse_parts():
    t = pa.table({"d": ["2021-03-15 13:45:30.250"]})
    expect = {
        "Year": 2021, "MonthOfYear": 3, "DayOfMonth": 15, "DayOfWeek": 1,
        "DayOfYear": 74, "Hour": 13, "Minute": 45, "Second": 30, "Millisecond": 250,
    }
    for part, v in expect.items():
        out = DateParseTransformer(input_col="d", date_part=part, output_col="o").transform_batch(t)
        assert col(out, "o") == [v], part


def test_date_add_diff_roundtrip():
    t = pa.table({"a": ["2021-01-30"], "b": ["2021-02-02"]})
    assert col(DateAddTransformer(input_col="a", num_days=3, output_col="o").transform_batch(t), "o") == ["2021-02-02"]
    assert col(DateDiffTransformer(input_cols=["a", "b"], output_col="o").transform_batch(t), "o") == [3]
    u = DateTimeToUnixTimestampTransformer(input_col="a", unit="ms", output_col="u").transform_batch(t)
    assert col(u, "u") == [1611964800000]
    back = UnixTimestampToDateTimeTransformer(input_col="u", unit="ms", output_col="o").transform_batch(u)
    assert col(back, "o") == ["2021-01-30 00:00:00.000"]


def test_two_column_string_ops_distinct_once_parity():
    """The vectorized distinct-once dispatch (one Arrow kernel per DISTINCT
    pattern, permutation-take scatter) must match the per-row reference
    semantics exactly — including nulls on either side, repeated patterns in
    arbitrary order, and the high-cardinality fallback path."""
    import re

    import numpy as np

    from kamae_ray.stages.strings import (
        StringContainsTransformer,
        StringReplaceTransformer,
    )

    rng = np.random.RandomState(7)
    n = 3000
    xs = [None if rng.rand() < 0.05 else f"w{rng.randint(30)} mid w{rng.randint(30)}" for _ in range(n)]
    ps = [None if rng.rand() < 0.05 else f"w{rng.randint(12)}" for _ in range(n)]
    t = pa.table({"x": pa.array(xs, pa.string()), "p": pa.array(ps, pa.string())})

    got = StringContainsTransformer(input_cols=["x", "p"], output_col="o").transform_batch(t)
    want = [None if (x is None or p is None) else (p in x) for x, p in zip(xs, ps)]
    assert got.column("o").to_pylist() == want
    gneg = StringContainsTransformer(input_cols=["x", "p"], output_col="o", negation=True).transform_batch(t)
    assert gneg.column("o").to_pylist() == [None if v is None else not v for v in want]

    rep = StringReplaceTransformer(input_cols=["x", "p"], string_replace_constant="#", output_col="o")
    got2 = rep.transform_batch(t).column("o").to_pylist()
    want2 = [None if (x is None or p is None) else re.sub(p, "#", x) for x, p in zip(xs, ps)]
    assert got2 == want2
    # literal (non-regex) replace with pattern AND replacement columns
    rs = [f"R{rng.randint(4)}" for _ in range(n)]
    t3 = pa.table({"x": pa.array(xs, pa.string()), "p": pa.array(ps, pa.string()),
                   "r": pa.array(rs, pa.string())})
    rep3 = StringReplaceTransformer(input_cols=["x", "p", "r"], regex=False, output_col="o")
    got3 = rep3.transform_batch(t3).column("o").to_pylist()
    want3 = [None if (x is None or p is None) else x.replace(p, r) for x, p, r in zip(xs, ps, rs)]
    assert got3 == want3
    # high-cardinality fallback: all-distinct patterns
    hx = [f"a{i}b" for i in range(2000)]
    hp = [str(i) for i in range(2000)]
    th = pa.table({"x": pa.array(hx), "p": pa.array(hp)})
    gh = StringContainsTransformer(input_cols=["x", "p"], output_col="o").transform_batch(th)
    assert gh.column("o").to_pylist() == [True] * 2000


class TestRedactPii:
    def test_matches_duckdb_regexp_oracle(self):
        import duckdb

        from kamae_ray.stages.text import RedactPiiTransformer, redact_oracle_exprs

        t = pa.table({"id": [1, 2, 3, 4, 5], "text": [
            "contact bob.smith+x@corp-mail.co.uk or call +1 415-555-0199 now",
            "server at 10.0.42.7 and 192.168.1.255, backup 8.8.8.8",
            "no pii here at all",
            None,
            "a@b.io c@d.org 12345678901 and 5551234567",
        ]})
        out = RedactPiiTransformer(input_col="text", output_col="red").transform_batch(t)
        ora = duckdb.query(
            "SELECT id, " + redact_oracle_exprs("text", "red") + " FROM t ORDER BY id"
        ).arrow()
        eng = out.select(ora.column_names).combine_chunks()
        assert eng.equals(ora.cast(eng.schema).combine_chunks())
        assert eng.column("red").to_pylist()[0] == "contact <EMAIL> or call <PHONE> now"
        assert eng.column("red_n_ip").to_pylist() == [0, 3, 0, None, 0]

    def test_category_order_prevents_double_count(self):
        from kamae_ray.stages.text import RedactPiiTransformer

        # the email's digit run must NOT also count as a phone
        t = pa.table({"text": ["mail user12345678@x.com now"]})
        out = RedactPiiTransformer(input_col="text", output_col="red").transform_batch(t)
        assert out.column("red_n_email").to_pylist() == [1]
        assert out.column("red_n_phone").to_pylist() == [0]

    def test_custom_patterns_and_list_input(self):
        from kamae_ray.stages.text import RedactPiiTransformer

        tr = RedactPiiTransformer(
            input_col="text", output_col="red",
            patterns={"ssn": (r"\d{3}-\d{2}-\d{4}", "<SSN>")},
        )
        t = pa.table({"text": pa.array([["ssn 123-45-6789", "clean"], None],
                                       pa.list_(pa.string()))})
        out = tr.transform_batch(t)
        assert out.column("red").to_pylist() == [["ssn <SSN>", "clean"], None]
        assert out.column("red_n_ssn").to_pylist() == [[1, 0], None]


class TestLineFilter:
    def test_matches_duckdb_list_lambda_oracle(self):
        import duckdb

        from kamae_ray.stages.text import LineFilterTransformer, line_filter_oracle_exprs

        t = pa.table({"id": [1, 2, 3, 4, 5], "text": [
            "Good long line with words.\nshort.\nno terminal punct here at all\n"
            "Another fine long line!\nBad javascript cookie line here.",
            "",
            None,
            "one two three.\n\n\nfour five six?",
            "x",
        ]})
        out = LineFilterTransformer(
            input_col="text", output_col="clean", min_words=3,
            blocklist=["javascript"],
        ).transform_batch(t)
        ora = duckdb.query(
            "SELECT id, " + line_filter_oracle_exprs("text", "clean", blocklist=["javascript"])
            + " FROM t ORDER BY id"
        ).arrow()
        eng = out.select(ora.column_names).combine_chunks()
        assert eng.equals(ora.cast(eng.schema).combine_chunks())
        assert eng.column("clean").to_pylist()[0] == (
            "Good long line with words.\nAnother fine long line!"
        )
        # fully-filtered doc -> null (SQL array_to_string-of-empty semantics)
        assert eng.column("clean").to_pylist()[1] is None
        assert eng.column("clean_n_kept").to_pylist() == [2, 0, None, 2, 0]

    def test_rules_independent(self):
        from kamae_ray.stages.text import LineFilterTransformer

        t = pa.table({"text": ["ok line one.\nok line two."]})
        out = LineFilterTransformer(
            input_col="text", output_col="c", min_words=0, terminal_regex=None,
        ).transform_batch(t)
        assert out.column("c").to_pylist() == ["ok line one.\nok line two."]


class TestGopherQuality:
    def test_matches_generated_sql_oracle(self):
        import duckdb

        from kamae_ray.stages.text import GopherQualityTransformer, gopher_oracle_exprs

        t = pa.table({"id": [1, 2, 3, 4, 5], "text": [
            "the quick brown fox jumps over to be of and that have with many "
            "plain words " * 5 + "done now.",
            "### ... ### short",
            None,
            "aa " * 60,                       # mean word length 2 -> fails
            "supercalifragilistic " * 60,     # mean word length 20 -> fails
        ]})
        out = GopherQualityTransformer(input_col="text", output_col="g").transform_batch(t)
        m, fl = gopher_oracle_exprs("text", "g")
        ora = duckdb.query(
            f"WITH m AS (SELECT id, {m} FROM t) "
            f"SELECT *, {fl}, (g_flag_words AND g_flag_mean_len AND g_flag_symbol "
            "AND g_flag_alpha AND g_flag_stop) AS g_pass FROM m ORDER BY id"
        ).arrow()
        eng = out.select(ora.column_names).combine_chunks()
        assert eng.equals(ora.cast(eng.schema).combine_chunks())
        assert eng.column("g_pass").to_pylist() == [True, False, None, False, False]
        assert eng.column("g_flag_mean_len").to_pylist() == [True, True, None, False, False]

    def test_integer_boundary_exactness(self):
        # exactly at the rational boundaries: 10% symbols, 80% alpha words
        from kamae_ray.stages.text import GopherQualityTransformer

        words = ["word"] * 8 + ["123", "456"]  # 10 words, 8 alpha = exactly 80%
        text = " ".join(words) + " #"          # '#' is an 11th word... keep separate
        t = pa.table({"text": [" ".join(words)]})
        out = GopherQualityTransformer(
            input_col="text", output_col="g", min_words=1, min_stopwords=0,
        ).transform_batch(t)
        assert out.column("g_flag_alpha").to_pylist() == [True]   # >= 4/5 inclusive
        t2 = pa.table({"text": [" ".join(["word"] * 9 + ["1", "2", "3"])]})  # 9/12 = 75%
        out2 = GopherQualityTransformer(
            input_col="text", output_col="g", min_words=1, min_stopwords=0,
        ).transform_batch(t2)
        assert out2.column("g_flag_alpha").to_pylist() == [False]


class TestJsonExtract:
    def test_matches_duckdb_native_json_parser(self):
        import duckdb

        from kamae_ray.stages.strings import JsonExtractTransformer

        t = pa.table({"j": [
            '{"k": 87, "s": "web"}',
            '{"s": "only"}',
            '{"k": -350}',
            '{"k": true, "x": 1}',
            '{"k": null}',
            '{"k": "he said \\"hi\\" \\\\ ok"}',
            '{ "k" :  "spaced" }',
            None,
        ]})
        for f in ("k", "s"):
            out = JsonExtractTransformer(input_col="j", output_col="v", field=f).transform_batch(t)
            ora = duckdb.query(
                f"SELECT json_extract_string(j, '$.{f}') AS v FROM t"
            ).arrow()
            assert out.column("v").to_pylist() == ora.column("v").to_pylist(), f

    def test_malformed_returns_null_and_field_validated(self):
        import pytest as _pt

        from kamae_ray.stages.strings import JsonExtractTransformer

        t = pa.table({"j": ["not json", ""]})
        out = JsonExtractTransformer(input_col="j", output_col="v", field="k").transform_batch(t)
        assert out.column("v").to_pylist() == [None, None]
        with _pt.raises(ValueError):
            JsonExtractTransformer(input_col="j", output_col="v", field='a"b')


class TestTextNormalize:
    def test_unicode_forms_match_unicodedata(self):
        import unicodedata

        from kamae_ray.stages.text import TextNormalizeTransformer

        samples = ["Ｃａｆé ﬁne ①", "ÉÀ çũ", "ḱṷōn", "ﬀ ʰ ²", "ascii", "각", None]
        t = pa.table({"s": samples})
        for form in ("NFC", "NFKC", "NFD", "NFKD"):
            out = TextNormalizeTransformer(
                input_col="s", output_col="n", form=form, lowercase=False,
                collapse_whitespace=False, trim=False,
            ).transform_batch(t)
            want = [None if s is None else unicodedata.normalize(form, s)
                    for s in samples]
            assert out.column("n").to_pylist() == want, form

    def test_strip_accents_is_nfkd_minus_marks(self):
        import unicodedata

        from kamae_ray.stages.text import TextNormalizeTransformer

        samples = ["Éàç ũḱ", "naïve café", "ascii"]
        t = pa.table({"s": samples})
        out = TextNormalizeTransformer(
            input_col="s", output_col="n", lowercase=False, strip_accents=True,
            collapse_whitespace=False, trim=False,
        ).transform_batch(t)
        want = ["".join(c for c in unicodedata.normalize("NFKD", s)
                        if unicodedata.category(c) != "Mn") for s in samples]
        assert out.column("n").to_pylist() == want

    def test_sql_steps_match_duckdb(self):
        import duckdb

        from kamae_ray.stages.text import TextNormalizeTransformer

        t2 = pa.table({"s": ["  Hello   WORLD \t x ", "A\nB", None, ""]})
        out = TextNormalizeTransformer(input_col="s", output_col="n").transform_batch(t2)
        ora = duckdb.query(
            r"SELECT trim(regexp_replace(lower(s), '\s+', ' ', 'g')) AS n FROM t2"
        ).arrow()
        assert out.column("n").to_pylist() == ora.column("n").to_pylist()


def test_json_extract_quoted_null_literal_stays_string():
    import duckdb

    from kamae_ray.stages.strings import JsonExtractTransformer

    t = pa.table({"j": ['{"k": "null"}', '{"k": null}', '{"k": "ok"}']})
    out = JsonExtractTransformer(input_col="j", output_col="v", field="k").transform_batch(t)
    ora = duckdb.query("SELECT json_extract_string(j, '$.k') AS v FROM t").arrow()
    assert out.column("v").to_pylist() == ora.column("v").to_pylist() == ["null", None, "ok"]


def test_new_kernels_empty_and_degenerate_inputs():
    from kamae_ray.pipelines.ann import knn_graph
    from kamae_ray.pipelines.text_features import chunk_documents
    from kamae_ray.stages.text import GopherQualityTransformer, LineFilterTransformer
    from kamae_ray.stages.window import scd2_build

    t = pa.table({"k": pa.array([], pa.int64()), "ts": pa.array([], pa.timestamp("us")),
                  "v": pa.array([], pa.string())})
    out = scd2_build(t, "k", "ts", ["v"])
    assert out.num_rows == 0 and str(out.schema.field("valid_to").type) == "timestamp[us]"
    t2 = pa.table({"k": [1, 2], "ts": pa.array([None, None], pa.timestamp("us")),
                   "v": ["a", "b"]})
    assert scd2_build(t2, "k", "ts", ["v"]).num_rows == 0
    e = pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    assert chunk_documents(e, "doc_id", "text").num_rows == 0
    one = pa.table({"vec_id": pa.array([1], pa.int64()),
                    "embedding": pa.array([[1.0, 0.0]], pa.list_(pa.float32()))})
    assert knn_graph(one, "vec_id", "embedding", k=3).num_rows == 0  # no other vectors
    es = pa.table({"t": pa.array([], pa.string())})
    assert LineFilterTransformer(input_col="t", output_col="c").transform_batch(es).num_rows == 0
    assert GopherQualityTransformer(input_col="t", output_col="g").transform_batch(es).num_rows == 0


class TestUrlDomain:
    def test_matches_duckdb_regexp_pipeline(self):
        import duckdb

        from kamae_ray.stages.strings import UrlDomainTransformer

        t = pa.table({"u": [
            "https://www.Shop42.example.com/item/9?q=1",
            "http://user:pw@api.internal.co.uk:8080/path",
            "ftp://files.example.org",
            "bare-host.net/path",
            "spam.bad-site.com",
            None,
        ]})
        out = UrlDomainTransformer(input_col="u", output_col="url",
                                   blocklist=["bad-site.com"]).transform_batch(t)
        ora = duckdb.query(r"""
            SELECT
              regexp_replace(lower(regexp_extract(u,
                '^(?:[A-Za-z][A-Za-z0-9+.\-]*://)?(?:[^/@?#]*@)?([^/:?#]+)', 1)),
                '^www\.', '') AS url_host,
              CASE WHEN u IS NULL THEN NULL ELSE (
                SELECT array_to_string(h[greatest(len(h)-1,1):len(h)], '.') FROM (
                  SELECT string_split(regexp_replace(lower(regexp_extract(u,
                    '^(?:[A-Za-z][A-Za-z0-9+.\-]*://)?(?:[^/@?#]*@)?([^/:?#]+)', 1)),
                    '^www\.', ''), '.') AS h)) END AS url_domain
            FROM t
        """).arrow()
        assert out.select(["url_host", "url_domain"]).combine_chunks().to_pylist() \
            == ora.to_pylist()
        assert out.column("url_blocked").to_pylist() == [False, False, False, False, True, None]

    def test_tld_levels(self):
        from kamae_ray.stages.strings import UrlDomainTransformer

        t = pa.table({"u": ["https://a.b.example.co.uk/x"]})
        out2 = UrlDomainTransformer(input_col="u", output_col="url").transform_batch(t)
        out3 = UrlDomainTransformer(input_col="u", output_col="url",
                                    tld_levels=3).transform_batch(t)
        assert out2.column("url_domain").to_pylist() == ["co.uk"]
        assert out3.column("url_domain").to_pylist() == ["example.co.uk"]


def test_ip_to_int():
    from kamae_ray.stages.strings import IpToIntTransformer

    t = IpToIntTransformer(input_col="ip", output_col="ipn")
    tb = pa.table({"ip": ["0.0.0.0", "255.255.255.255", "10.0.0.1",
                          "256.1.1.1", "1.2.3", "1.2.3.4.5", "a.b.c.d",
                          "1..2.3", None, " 1.2.3.4"]})
    out = t.transform(tb)
    assert out.column("ipn").to_pylist() == [
        0, 4294967295, 167772161, None, None, None, None, None, None, None]
    assert out.column("ipn_net24").to_pylist()[2] == 167772161 >> 8
    assert out.column("ipn").type == pa.int64()


def test_readability():
    from kamae_ray.stages.text import ReadabilityTransformer

    t = ReadabilityTransformer(input_col="t", output_col="fl")
    tb = pa.table({"t": ["The cat sat. It was flat!", "no punctuation here",
                         "", None]})
    out = t.transform(tb)
    assert out.column("fl_words").to_pylist() == [6, 3, 0, 0]
    assert out.column("fl_sentences").to_pylist() == [2, 1, 1, 1]  # floor 1
    # vowel-group runs: The(1) cat(1) sat(1) It(1) was(1) flat(1) = 6
    assert out.column("fl_syllables")[0].as_py() == 6
    ref = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
    assert out.column("fl")[0].as_py() == ref
    assert out.column("fl")[2].as_py() is None  # zero words -> null


def test_strip_accents_matches_duckdb_native_on_accent_class():
    import duckdb

    from kamae_ray.stages.text import TextNormalizeTransformer

    words = ["Crème", "Brûlée", "naïve", "São", "Ångström", "Ж", "œuf",
             "ñoño", "ÀÉÎÕÜ çĆč", "mixed Énd", "plain ascii", ""]
    t = pa.table({"i": pa.array(range(len(words)), pa.int64()),
                  "s": pa.array(words, pa.string())})
    tf = TextNormalizeTransformer(input_col="s", output_col="o", lowercase=False,
                                  strip_accents=True, collapse_whitespace=False,
                                  trim=False)
    got = tf.transform_batch(t).column("o").to_pylist()
    exp = [r[0] for r in duckdb.sql(
        "select strip_accents(s) from (select * from t order by i)").fetchall()]
    assert got == exp
    # documented divergence: compatibility ligatures decompose under NFKD
    lig = pa.table({"s": pa.array(["ﬁn"], pa.string())})
    assert tf.transform_batch(lig).column("o").to_pylist() == ["fin"]


def test_base64_encode_vs_python_and_duckdb():
    import base64 as _b64
    import random

    import duckdb

    from kamae_ray.functions.arrays import base64_encode
    from kamae_ray.stages import Base64EncodeTransformer

    rng = random.Random(7)
    vals = [bytes(rng.randrange(256) for _ in range(rng.randrange(0, 25)))
            for _ in range(3000)]
    arr = pa.array(vals, pa.binary())
    got = base64_encode(arr).to_pylist()
    assert got == [_b64.b64encode(v).decode() for v in vals]
    exp = [r[0] for r in duckdb.sql(
        "select to_base64(b) from (select * from t)").fetchall()] if False else None
    con = duckdb.connect()
    con.register("t", pa.table({"b": arr}))
    assert got == [r[0] for r in con.sql("select to_base64(b) from t").fetchall()]
    s = pa.table({"s": pa.array(["hello!x", None, "", "é"], pa.string())})
    tf = Base64EncodeTransformer(input_col="s", output_col="o")
    assert tf.transform_batch(s).column("o").to_pylist() == \
        ["aGVsbG8heA==", None, "", "w6k="]


def test_base64_decode_roundtrip_and_guards():
    import random

    from kamae_ray.functions.arrays import base64_decode, base64_encode
    from kamae_ray.stages import Base64DecodeTransformer

    rng = random.Random(19)
    vals = [bytes(rng.randrange(256) for _ in range(rng.randrange(0, 30)))
            for _ in range(2000)]
    enc = base64_encode(pa.array(vals, pa.binary()))
    assert base64_decode(enc).to_pylist() == vals
    t = pa.table({"s": pa.array(["aGVsbG8heA==", None, "", "w6k="], pa.string())})
    tf = Base64DecodeTransformer(input_col="s", output_col="o")
    assert tf.transform_batch(t).column("o").to_pylist() == \
        [b"hello!x", None, b"", b"\xc3\xa9"]
    for bad in ["abc", "a===", "ab=c", "=abc", "a!bc"]:
        with pytest.raises(ValueError):
            base64_decode(pa.array([bad]))


def test_hex_and_bit_hamming_vs_duckdb():
    import random

    import duckdb
    import numpy as np

    from kamae_ray.functions.arrays import hex_encode, popcount_int64
    from kamae_ray.stages import BitHammingTransformer

    rng = random.Random(5)
    vals = [bytes(rng.randrange(256) for _ in range(rng.randrange(0, 20)))
            for _ in range(2000)]
    con = duckdb.connect()
    con.register("t", pa.table({"b": pa.array(vals, pa.binary())}))
    exp = [r[0] for r in con.sql("select hex(b) from t").fetchall()]
    assert hex_encode(pa.array(vals, pa.binary())).to_pylist() == exp
    g = np.random.default_rng(4)
    x = np.concatenate([g.integers(-2**62, 2**62, 3000), [0, -1, -2**63]]).astype(np.int64)
    y = np.concatenate([g.integers(-2**62, 2**62, 3000), [-1, -1, 2**62]]).astype(np.int64)
    t = pa.table({"a": pa.array(x, pa.int64()), "b": pa.array(y, pa.int64())})
    tf = BitHammingTransformer(input_cols=["a", "b"], output_col="d")
    got = tf.transform_batch(t).column("d").to_pylist()
    con.register("u", t)
    expd = [r[0] for r in con.sql("select bit_count(xor(a, b)) from u").fetchall()]
    assert got == expd
    assert got[-3] == 64  # 0 vs -1


def test_soundex_vs_sql_list_dedup_recipe():
    import random
    import string as _string

    import duckdb

    from kamae_ray.stages import SoundexTransformer

    words = ["Robert", "Rupert", "Ashcraft", "Tymczak", "Pfister", "Honeyman",
             "", "a1b2c3", "éclair", None]
    rng = random.Random(5)
    words += ["".join(rng.choices(_string.ascii_letters + "0123456789 -é",
                                  k=rng.randint(0, 15))) for _ in range(2000)]
    t = pa.table({"i": pa.array(range(len(words)), pa.int64()),
                  "w": pa.array(words, pa.string())})
    tf = SoundexTransformer(input_col="w", output_col="sdx")
    got = tf.transform_batch(t).column("sdx").to_pylist()
    assert got[:6] == ["R163", "R163", "A226", "T522", "P236", "H555"]
    assert got[6] == "" and got[9] is None
    exp = [r[0] for r in duckdb.sql(r"""
        WITH u AS (SELECT i, upper(regexp_replace(coalesce(w,''), '[^A-Za-z]', '', 'g')) AS c FROM t),
        t2 AS (SELECT i, c, regexp_split_to_array(translate(c,
          'AEIOUYHWBFPVCGJKQSXZDTLMNR', '00000000111122222222334556'), '') AS lst FROM u),
        d AS (SELECT i, c, array_to_string(list_transform(list_filter(list_zip(lst,
          list_prepend('#', lst[1:len(lst)-1])), p -> p[1] IS DISTINCT FROM p[2]),
          p -> p[1]), '') AS dd FROM t2)
        SELECT CASE WHEN length(c) = 0 THEN '' ELSE substr(c,1,1) ||
          substr(replace(substr(dd, 2), '0', '') || '000', 1, 3) END
        FROM d ORDER BY i""").fetchall()]
    assert ["" if g is None else g for g in got] == exp
