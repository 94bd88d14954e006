"""anova_f_by_group / cramers_v (stages/profile.py): hand cases, BIT-exact
equality against the generated SQL oracles (no 6dp rounding), degenerate
groups, guards, and Dataset parity."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from kamae_ray.stages.profile import (
    anova_f_by_group,
    anova_f_oracle_sql,
    cramers_v,
    cramers_v_oracle_sql,
)


def test_anova_hand_case():
    t = pa.table({"g": ["a"] * 9 + ["b"] * 6,
                  "c": ["x", "y", "z"] * 5,
                  "v": [1, 5, 9, 2, 6, 8, 3, 4, 7, 1, 1, 1, 9, 9, 9]})
    rows = anova_f_by_group(t, "g", "c", "v", ["x", "y", "z"]).to_pylist()
    # group a: class means 2/5/8, SSB=54, SSW=6 -> F=(54/2)/(6/6)=27
    assert rows[0] == {"g": "a", "n": 9, "n_classes": 3, "f_stat": 27.0}
    # group b: identical class distributions -> F=0
    assert rows[1]["f_stat"] == 0.0


def test_anova_degenerate_cases():
    t = pa.table({"g": ["a", "a", "b", "b", "b"],
                  "c": ["x", "x", "x", "y", "y"],
                  "v": [1, 2, 3, 3, 3]})
    rows = anova_f_by_group(t, "g", "c", "v", ["x", "y"]).to_pylist()
    assert rows[0]["n_classes"] == 1 and rows[0]["f_stat"] is None
    # group b: SSW contains one zero-variance class but SSB=0 and SSW=0
    assert rows[1]["f_stat"] is None


def test_anova_value_guard():
    t = pa.table({"g": ["a"], "c": ["x"], "v": [1 << 32]})
    with pytest.raises(ValueError, match="31 bits"):
        anova_f_by_group(t, "g", "c", "v", ["x", "y"])


@pytest.fixture(scope="module")
def anova_data():
    rng = np.random.default_rng(5)
    n = 20_000
    return pa.table({
        "g": pa.array(rng.integers(0, 30, n)),
        "c": pa.array(rng.choice(["x", "y", "z", "w"], n)),
        "v": pa.array(rng.integers(-100, 100, n)),
    })


def test_anova_bit_exact_vs_generated_oracle(anova_data):
    got = anova_f_by_group(anova_data, "g", "c", "v", ["x", "y", "z", "w"])
    con = duckdb.connect()
    con.register("t", anova_data)
    sql = anova_f_oracle_sql("t", "g", "g", "c", "v", ["x", "y", "z", "w"])
    # strip the 6dp ROUND for the bit-exact form
    sql = sql.replace("ROUND(CASE", "(CASE").replace("END, 6) ", "END) ")
    exp = {r[0]: r for r in con.execute(sql).fetchall()}
    con.close()
    for row in got.to_pylist():
        e = exp[row["g"]]
        assert (row["n"], row["n_classes"]) == (e[1], e[2])
        assert row["f_stat"] == e[3], f"group {row['g']}"


def test_anova_dataset_parity(ray_session, anova_data):
    import ray

    ds = ray.data.from_arrow(anova_data).repartition(6)
    got = anova_f_by_group(ds, "g", "c", "v", ["x", "y", "z", "w"])
    want = anova_f_by_group(anova_data, "g", "c", "v", ["x", "y", "z", "w"])
    assert got.to_pylist() == want.to_pylist()


def test_cramers_hand_independent():
    t = pa.table({"x": ["a", "a", "a", "b", "b", "b"],
                  "y": ["p", "q", "r"] * 2})
    out = cramers_v(t, "x", "y", ["a", "b"], ["p", "q", "r"]).to_pylist()[0]
    assert out == {"n": 6, "chi2": 0.0, "v": 0.0}


def test_cramers_perfect_association():
    t = pa.table({"x": ["a"] * 5 + ["b"] * 5,
                  "y": ["p"] * 5 + ["q"] * 5})
    out = cramers_v(t, "x", "y", ["a", "b"], ["p", "q"]).to_pylist()[0]
    assert out["v"] == 1.0


def test_cramers_bit_exact_vs_generated_oracle(anova_data):
    got = cramers_v(anova_data, "c", "g",
                    ["x", "y", "z", "w"], list(range(30))).to_pylist()[0]
    con = duckdb.connect()
    con.register("t", anova_data)
    sql = cramers_v_oracle_sql("t", "c", "g", ["x", "y", "z", "w"],
                               list(range(30)))
    sql = sql.replace("ROUND(chi2, 6)", "chi2") \
        .replace("ROUND(CASE", "(CASE").replace("END, 6) ", "END) ")
    n, chi2, v = con.execute(sql).fetchall()[0]
    con.close()
    assert got["n"] == n
    assert got["chi2"] == chi2
    assert got["v"] == v


def test_cramers_dataset_parity(ray_session, anova_data):
    import ray

    ds = ray.data.from_arrow(anova_data).repartition(8)
    got = cramers_v(ds, "c", "g", ["x", "y", "z", "w"], list(range(30)))
    want = cramers_v(anova_data, "c", "g", ["x", "y", "z", "w"],
                     list(range(30)))
    assert got.to_pylist() == want.to_pylist()


def test_chatterjee_xi_by_group(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray

    from kamae_ray.stages.profile import chatterjee_xi_by_group

    rng = np.random.default_rng(31)
    n = 3000
    g = rng.integers(0, 6, n)
    x = np.round(rng.standard_normal(n), 2)
    y = np.where(g % 2 == 0, np.round(x * x, 1),
                 np.round(rng.standard_normal(n), 1))
    t = pa.table({
        "g": pa.array(g, pa.int64()),
        "x": pa.array(np.where(rng.random(n) < 0.03, np.nan, x)),
        "y": y,
        "tb": pa.array(rng.permutation(n), pa.int64()),
    })
    # nan -> null for SQL parity
    import pyarrow.compute as pc
    xa = pc.if_else(pc.is_nan(t.column("x").combine_chunks()), None,
                    t.column("x").combine_chunks())
    t = t.set_column(1, "x", xa)
    con = duckdb.connect()
    con.register("t", t)
    want = {r[0]: r[1:] for r in con.sql("""
        WITH rk AS (SELECT g, x, tb,
          COUNT(*) OVER (PARTITION BY g) AS n,
          COUNT(*) OVER (PARTITION BY g ORDER BY y
            RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r,
          COUNT(*) OVER (PARTITION BY g ORDER BY y DESC
            RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS l
          FROM t WHERE x IS NOT NULL AND y IS NOT NULL),
        d AS (SELECT g, n, l, r,
              LEAD(r) OVER (PARTITION BY g ORDER BY x, tb) AS rn FROM rk),
        agg AS (SELECT g, MAX(n)::BIGINT AS n,
                COALESCE(SUM(ABS(rn - r)) FILTER (rn IS NOT NULL), 0)::BIGINT AS sd,
                SUM(l * (n - l))::BIGINT AS sl FROM d GROUP BY g)
        SELECT g, n, n * sd, 2 * sl,
          CASE WHEN sl > 0 THEN 1 - CAST(n * sd AS DOUBLE) / (2 * sl) END
        FROM agg
    """).fetchall()}
    cols = ["n", "num", "den", "xi"]
    out = chatterjee_xi_by_group(t, "g", "x", "y", tiebreak_cols=["tb"])
    assert {r["g"]: tuple(r[c] for c in cols)
            for r in out.to_pylist()} == want  # bit-exact incl. xi
    rows = chatterjee_xi_by_group(ray.data.from_arrow(t).repartition(4),
                                  "g", "x", "y",
                                  tiebreak_cols=["tb"]).take_all()
    assert {r["g"]: tuple(r[c] for c in cols) for r in rows} == want
    # functional y = f(x) with distinct x -> xi close to 1; constant y -> null
    xs = np.linspace(0, 1, 400)
    ft = pa.table({"g": pa.array([0] * 400 + [1] * 400, pa.int64()),
                   "x": pa.array(np.concatenate([xs, xs])),
                   "y": pa.array(np.concatenate([xs ** 2, np.zeros(400)])),
                   "tb": pa.array(np.arange(800), pa.int64())})
    fo = {r["g"]: r for r in
          chatterjee_xi_by_group(ft, "g", "x", "y",
                                 tiebreak_cols=["tb"]).to_pylist()}
    assert fo[0]["xi"] > 0.95 and fo[1]["xi"] is None
