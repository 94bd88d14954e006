"""Distributed column profiling — the engine's ``describe()``: one
streaming pass computes per-column row/null counts, numeric moments
(min/max/mean/std), string min/max, and (optionally) a HyperLogLog
approximate distinct count, for any subset of columns at once.

Scale plan: each block reduces to ONE partial row per column (counts,
partial moments, 2^p HLL registers); the driver merges |blocks| x |cols|
tiny rows — never the data. The same shape at 100 TB: the collect is
O(blocks), spillable until the final merge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kamae_ray.functions import arrays as A
from kamae_ray.functions import segments as S


def profile_columns(ds, cols: list[str] | None = None,
                    approx_distinct: bool = False, p: int = 12) -> pa.Table:
    """One row per column: ``column, n_rows, n_nulls, min, max, mean, std``
    (min/max as strings — exact for integers/strings; floats formatted by
    repr, use mean/std for numeric comparisons), plus ``approx_distinct``
    when requested (deterministic HLL, ~1.6% at p=12).

    Numeric moments are NaN-skipping (SQL aggregate semantics); mean/std
    are null for non-numeric columns. ``std`` is population stddev
    (stddev_pop), matching groupby_agg."""
    from kamae_ray.stages.sketches import _hash_any, _hll_estimate, _hll_ranks, _regs_from_block

    m = 1 << p

    def partial(block: pa.Table) -> pa.Table:
        names = cols or block.column_names
        out = {
            "column": [], "n": [], "nulls": [], "vmin": [], "vmax": [],
            "nmin": [], "nmax": [], "sum": [], "sumsq": [], "cnt": [],
        }
        regs = []
        for c in names:
            arr = A.as_array(block.column(c))
            out["column"].append(c)
            out["n"].append(len(arr))
            out["nulls"].append(arr.null_count)
            t = arr.type
            numeric = pa.types.is_integer(t) or pa.types.is_floating(t)
            if len(arr) == arr.null_count:
                out["vmin"].append(None)
                out["vmax"].append(None)
                out["nmin"].append(None)
                out["nmax"].append(None)
                out["sum"].append(0.0)
                out["sumsq"].append(0.0)
                out["cnt"].append(0)
            else:
                mm = pc.min_max(arr)
                if numeric:
                    # numeric extrema merge NUMERICALLY (lexicographic string
                    # merge would say "10" < "9"); stringified only at the end
                    out["vmin"].append(None)
                    out["vmax"].append(None)
                    out["nmin"].append(float(mm["min"].as_py()))
                    out["nmax"].append(float(mm["max"].as_py()))
                else:
                    out["vmin"].append(str(mm["min"].as_py()))
                    out["vmax"].append(str(mm["max"].as_py()))
                    out["nmin"].append(None)
                    out["nmax"].append(None)
                if numeric:
                    v, mask = A.to_numpy(pc.cast(arr, pa.float64(), safe=False))
                    v = v.astype(np.float64, copy=True)
                    if mask is not None:
                        v[mask] = np.nan
                    ok = ~np.isnan(v)
                    vz = np.where(ok, v, 0.0)
                    out["sum"].append(float(vz.sum()))
                    out["sumsq"].append(float((vz * vz).sum()))
                    out["cnt"].append(int(ok.sum()))
                else:
                    out["sum"].append(None)
                    out["sumsq"].append(None)
                    out["cnt"].append(0)
            if approx_distinct:
                h, valid = _hash_any(block.column(c))
                idx, rank = _hll_ranks(h[valid], p)
                r = _regs_from_block(np.zeros(int(valid.sum()), np.int64), idx, rank, 1, m)
                regs.append(r.reshape(-1))
        tbl = {
            "column": pa.array(out["column"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "nulls": pa.array(out["nulls"], pa.int64()),
            "vmin": pa.array(out["vmin"], pa.string()),
            "vmax": pa.array(out["vmax"], pa.string()),
            "nmin": pa.array(out["nmin"], pa.float64()),
            "nmax": pa.array(out["nmax"], pa.float64()),
            "sum": pa.array(out["sum"], pa.float64()),
            "sumsq": pa.array(out["sumsq"], pa.float64()),
            "cnt": pa.array(out["cnt"], pa.int64()),
        }
        if approx_distinct:
            flat = np.concatenate(regs) if regs else np.zeros(0, np.uint8)
            tbl["regs"] = pa.FixedSizeListArray.from_arrays(pa.array(flat), m)
        return pa.table(tbl)

    partial.__name__ = "profile_partial"
    if isinstance(ds, pa.Table):
        parts = [partial(ds)]
    else:
        proj = ds
        if cols:
            try:
                proj = ds.select_columns(cols)
            except Exception:
                pass
        from kamae_ray.base import collect_tables

        parts = [t for t in collect_tables(
            proj.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        ) if t.num_rows]
    merged: dict[str, dict] = {}
    order: list[str] = []
    for t in parts:
        rows = t.to_pylist()
        for i, r in enumerate(rows):
            c = r["column"]
            if c not in merged:
                order.append(c)
                merged[c] = {"n": 0, "nulls": 0, "vmin": None, "vmax": None,
                             "nmin": None, "nmax": None,
                             "sum": 0.0, "sumsq": 0.0, "cnt": 0,
                             "regs": np.zeros(m, np.uint8) if approx_distinct else None,
                             "numeric": r["sum"] is not None}
            g = merged[c]
            g["n"] += r["n"]
            g["nulls"] += r["nulls"]
            if r["vmin"] is not None:
                g["vmin"] = r["vmin"] if g["vmin"] is None else min(g["vmin"], r["vmin"])
            if r["vmax"] is not None:
                g["vmax"] = r["vmax"] if g["vmax"] is None else max(g["vmax"], r["vmax"])
            if r["nmin"] is not None:
                g["nmin"] = r["nmin"] if g["nmin"] is None else min(g["nmin"], r["nmin"])
            if r["nmax"] is not None:
                g["nmax"] = r["nmax"] if g["nmax"] is None else max(g["nmax"], r["nmax"])
            if r["sum"] is not None:
                g["numeric"] = True
                g["sum"] += r["sum"]
                g["sumsq"] += r["sumsq"]
                g["cnt"] += r["cnt"]
            if approx_distinct:
                g["regs"] = np.maximum(g["regs"], np.asarray(r["regs"], np.uint8))
    res = {"column": [], "n_rows": [], "n_nulls": [], "min": [], "max": [],
           "mean": [], "std": []}
    if approx_distinct:
        res["approx_distinct"] = []
    for c in order:
        g = merged[c]
        res["column"].append(c)
        res["n_rows"].append(g["n"])
        res["n_nulls"].append(g["nulls"])
        if g["nmin"] is not None:
            fmt = lambda x: str(int(x)) if float(x).is_integer() and abs(x) < 1e15 else str(x)  # noqa: E731
            res["min"].append(fmt(g["nmin"]))
            res["max"].append(fmt(g["nmax"]))
        else:
            res["min"].append(g["vmin"])
            res["max"].append(g["vmax"])
        if g["numeric"] and g["cnt"]:
            mean = g["sum"] / g["cnt"]
            var = max(g["sumsq"] / g["cnt"] - mean * mean, 0.0)
            res["mean"].append(mean)
            res["std"].append(float(np.sqrt(var)))
        else:
            res["mean"].append(None)
            res["std"].append(None)
        if approx_distinct:
            res["approx_distinct"].append(int(np.rint(_hll_estimate(g["regs"][None, :]))[0]))
    out = {
        "column": pa.array(res["column"], pa.string()),
        "n_rows": pa.array(res["n_rows"], pa.int64()),
        "n_nulls": pa.array(res["n_nulls"], pa.int64()),
        "min": pa.array(res["min"], pa.string()),
        "max": pa.array(res["max"], pa.string()),
        "mean": pa.array(res["mean"], pa.float64()),
        "std": pa.array(res["std"], pa.float64()),
    }
    if approx_distinct:
        out["approx_distinct"] = pa.array(res["approx_distinct"], pa.int64())
    return pa.table(out)


def drift_report(ds_a, ds_b, col: str, bins: int, lo: float, hi: float,
                 smoothing: int = 1) -> pa.Table:
    """Distribution-drift report between two snapshots of a numeric column —
    the training-data monitoring staple (PSI, population stability index):
    histogram both sides on the SAME fixed bins (the exactly-SQL-reproducible
    ``stages.aggregate.histogram`` binning), Laplace-smooth the counts
    (``p = (n + smoothing) / (N + smoothing * bins)`` — exact integers, no
    empty-bin ln(0)), and emit one row per bin with both counts, both
    smoothed proportions and the bin's PSI contribution
    ``psi_term = (p_a - p_b) * ln(p_a / p_b)``; ``sum(psi_term)`` is the PSI
    (rule of thumb: < 0.1 stable, > 0.25 drifted).

    Every count is an exact int64; the proportions and psi_term are a fixed
    float64 expression over those ints, mirrored operation-for-operation by
    the SQL oracle (entropy-precedent ULP discipline). Scale plan: two
    histogram passes (per-block bincount combiners, at most ``bins`` rows
    leave a block) + an O(bins) driver join — driver state never exceeds
    the bin count."""
    from kamae_ray.base import collect_tables
    from kamae_ray.stages.aggregate import histogram

    def counts(ds):
        h = histogram(ds, col, bins=bins, lo=lo, hi=hi)
        if not isinstance(h, pa.Table):
            parts = [t for t in collect_tables(h) if t.num_rows]
            h = pa.concat_tables(parts) if parts else pa.table(
                {"bin": pa.array([], pa.int64()), "n_rows": pa.array([], pa.int64())})
        out = np.zeros(bins, dtype=np.int64)
        b = h.column("bin").to_numpy(zero_copy_only=False)
        n = h.column("n_rows").to_numpy(zero_copy_only=False)
        out[b] = n
        return out

    na, nb = counts(ds_a), counts(ds_b)
    Na, Nb = int(na.sum()), int(nb.sum())
    if Na == 0 or Nb == 0:
        raise ValueError("drift_report: a side has no in-range values")
    s = int(smoothing)
    pa_ = (na.astype(np.float64) + float(s)) / (float(Na) + float(s * bins))
    pb_ = (nb.astype(np.float64) + float(s)) / (float(Nb) + float(s * bins))
    # libm_log: oracle-mirrored ln must match DuckDB bit-for-bit
    psi = (pa_ - pb_) * A.libm_log(pa_ / pb_)
    return pa.table({
        "bin": pa.array(np.arange(bins, dtype=np.int64)),
        "n_a": pa.array(na), "n_b": pa.array(nb),
        "p_a": pa.array(pa_), "p_b": pa.array(pb_),
        "psi_term": pa.array(psi),
    })


_CK_P = 0x9E3779B97F4A7C15       # Knuth multiplicative (int columns)
_CK_M = 0x100000001B3            # FNV-1a prime (column fold)
_CK_NULL = 0xDEADBEEFCAFEF00D    # null sentinel
_CK_MOD = 1 << 64


def content_checksum(ds, cols: list[str], salt: int = 0):
    """Order-invariant 64-bit content checksum of selected columns — the
    migration/replication verifier: two datasets hold the same multiset of
    rows (over ``cols``) iff their checksums and row counts match (up to the
    2^-64 collision bound). Returns ``{"checksum": str (decimal uint64),
    "n_rows": int}``.

    Row hash = FNV-style fold over the columns' hashes (int columns: Knuth
    multiplicative ``(v + salt) * P mod 2^64``; string columns: poly31, the
    SQL-certifiable codepoint polynomial; nulls: a fixed sentinel); the
    dataset checksum is the SUM of row hashes mod 2^64 — an order-free
    INTEGER merge, so it is partition- and execution-order-invariant (the
    Count-Min property) and exactly reproducible in HUGEINT SQL
    (``checksum_oracle_sql``). Scale plan: one vectorized pass per block
    emitting (partial_sum, n) — two ints per block through the fold."""
    from kamae_ray.stages.hashing import poly31_column

    def block_sum(block: pa.Table) -> pa.Table:
        n = block.num_rows
        acc = np.zeros(n, dtype=np.uint64)
        for c in cols:
            arr = A.as_array(block.column(c))
            nulls = pc.is_null(arr).to_numpy(zero_copy_only=False)
            if pa.types.is_integer(arr.type):
                v = pc.fill_null(pc.cast(arr, pa.int64(), safe=False), 0)
                h = (v.to_numpy(zero_copy_only=False).view(np.uint64)
                     + np.uint64(salt)) * np.uint64(_CK_P)
            else:
                hv, _m = poly31_column(pc.cast(arr, pa.string(), safe=False))
                h = hv.view(np.uint64)
            h = np.where(nulls, np.uint64(_CK_NULL), h)
            acc = acc * np.uint64(_CK_M) + h
        total = np.uint64(0) if n == 0 else np.sum(acc, dtype=np.uint64)
        return pa.table({"s": pa.array([int(total)], pa.uint64()),
                         "n": pa.array([n], pa.int64())})

    block_sum.__name__ = "checksum_partial"
    if isinstance(ds, pa.Table):
        rows = [block_sum(ds)]
    else:
        from kamae_ray.sources import io as _io

        # lesson 25: prune at the SCAN for bare tagged reads
        proj = _io.narrow_read(ds, list(cols))
        if proj is None:
            proj = ds
            try:
                proj = ds.select_columns(list(cols))
            except Exception:
                pass
        parts = proj.map_batches(block_sum, batch_format="pyarrow",
                                 zero_copy_batch=True, batch_size=None)
        rows = [pa.table(b) for b in parts.iter_batches(batch_format="pyarrow")]
    s, n = 0, 0
    for t in rows:
        for sv, nv in zip(t.column("s").to_pylist(), t.column("n").to_pylist()):
            s = (s + int(sv)) % _CK_MOD
            n += int(nv)
    return {"checksum": str(s), "n_rows": n}


def checksum_oracle_sql(table: str, cols: list[str], col_types: dict,
                        salt: int = 0) -> str:
    """HUGEINT SQL computing the SAME checksum (oracle generation):
    ``col_types`` maps column -> 'int' | 'str'."""
    from kamae_ray.stages.hashing import poly31_sql

    # a * P mod 2^64 with a < 2^64 and P 63-bit would overflow INT128
    # (a*P < 2^127 only when a < 2^63.9 — a two's-complement negative is
    # ~2^64 and DuckDB raises 'Overflow in multiplication of INT128', found
    # by review + pinned in tests). Split P = P_hi*2^32 + P_lo so every
    # intermediate stays under 2^96:
    #   a*P mod 2^64 = (a*P_lo mod 2^64 + ((a*P_hi) mod 2^32)*2^32) mod 2^64
    p_hi, p_lo = _CK_P >> 32, _CK_P & 0xFFFFFFFF
    two32 = 1 << 32
    acc = "CAST(0 AS HUGEINT)"
    for c in cols:
        if col_types[c] == "int":
            # negative ints: two's-complement view — add 2^64 then mod
            a = (f"(((CAST({c} AS HUGEINT) % {_CK_MOD}) + {_CK_MOD} + {salt}) "
                 f"% {_CK_MOD})")
            h = (f"(({a} * {p_lo}) % {_CK_MOD} + "
                 f"(({a} * {p_hi}) % {two32}) * {two32}) % {_CK_MOD}")
        else:
            h = f"CAST({poly31_sql(c)} AS HUGEINT)"
        h = f"CASE WHEN {c} IS NULL THEN CAST({_CK_NULL} AS HUGEINT) ELSE {h} END"
        acc = f"(({acc}) * {_CK_M} + {h}) % {_CK_MOD}"
    return (f"SELECT CAST(SUM(row_h) % {_CK_MOD} AS VARCHAR) AS checksum, "
            f"COUNT(*)::BIGINT AS n_rows FROM "
            f"(SELECT {acc} AS row_h FROM {table})")


def categorical_drift(ds_a, ds_b, col: str, smoothing: int = 1,
                      max_broadcast_terms: int = 5_000_000,
                      stat: str = "psi") -> pa.Table:
    """PSI drift between two snapshots of a CATEGORICAL column — the
    numeric ``drift_report``'s sibling: value-count both sides, take the
    union of observed categories, Laplace-smooth
    (``p = (n + smoothing) / (N + smoothing * K)``, K = union size) and emit
    per-category counts, proportions and psi_term (exact int counts, one
    mirrored float expression). Nulls count as their own category is NOT
    implemented — nulls are dropped (SQL GROUP BY semantics with a WHERE).

    ``stat="jsd"`` emits the Jensen-Shannon divergence contribution instead
    (``jsd_term = 0.5*p*ln(p/m) + 0.5*q*ln(q/m)``, ``m=(p+q)/2``, nats) —
    the bounded symmetric divergence (0..ln 2) used to compare corpus
    composition between snapshots/mixtures; the per-category terms are
    emitted (not summed) so no cross-row float accumulation exists, the
    same per-term discipline as PSI/IV. Both ln's route through
    ``libm_log`` (lesson 38) and every sub-expression is mirrored verbatim
    by the oracle SQL.

    Scale plan: two per-block ``group_by`` count partials (vocab-bounded
    driver folds, the temperature_mix pattern); driver state O(categories)
    guarded by ``max_broadcast_terms``."""
    from kamae_ray.base import collect_tables

    def counts(ds):
        def partial(block: pa.Table) -> pa.Table:
            t = block.select([col])
            t = t.filter(pc.is_valid(t.column(col)))
            t = t.set_column(0, col, pc.cast(t.column(col), pa.string(), safe=False))
            return t.group_by(col).aggregate([([], "count_all")])

        partial.__name__ = "cat_drift_counts"
        if isinstance(ds, pa.Table):
            parts = [partial(ds)]
        else:
            from kamae_ray.sources import io as _io

            narrow = _io.narrow_read(ds, [col])
            parts = collect_tables(
                (narrow if narrow is not None else ds).map_batches(
                    partial, batch_format="pyarrow", zero_copy_batch=True,
                    batch_size=None))
        out: dict[str, int] = {}
        for t in parts:
            for lab, c in zip(t.column(col).to_pylist(),
                              t.column("count_all").to_pylist()):
                out[lab] = out.get(lab, 0) + int(c)
            # guard INSIDE the fold: a mistakenly-categorical unique-id
            # column must fail before it absorbs the whole domain
            if len(out) > max_broadcast_terms:
                raise ValueError(f"> {max_broadcast_terms} categories "
                                 "(max_broadcast_terms)")
        return out

    ca, cb = counts(ds_a), counts(ds_b)
    if not ca or not cb:
        raise ValueError("categorical_drift: a side has no non-null values")
    cats = sorted(set(ca) | set(cb))
    K = len(cats)
    na = np.array([ca.get(c, 0) for c in cats], dtype=np.int64)
    nb = np.array([cb.get(c, 0) for c in cats], dtype=np.int64)
    Na, Nb = int(na.sum()), int(nb.sum())
    s = int(smoothing)
    pa_ = (na.astype(np.float64) + float(s)) / (float(Na) + float(s * K))
    pb_ = (nb.astype(np.float64) + float(s)) / (float(Nb) + float(s * K))
    if stat == "jsd":
        m = (pa_ + pb_) / 2.0
        # libm_log: oracle-mirrored ln must match DuckDB bit-for-bit;
        # fixed left-assoc 0.5*p*ln(p/m) + 0.5*q*ln(q/m)
        term = 0.5 * pa_ * A.libm_log(pa_ / m) + 0.5 * pb_ * A.libm_log(pb_ / m)
        return pa.table({
            col: pa.array(cats, pa.string()),
            "n_a": pa.array(na), "n_b": pa.array(nb),
            "p_a": pa.array(pa_), "p_b": pa.array(pb_),
            "jsd_term": pa.array(term),
        })
    if stat != "psi":
        raise ValueError(f"unknown stat {stat!r} (psi | jsd)")
    # libm_log: oracle-mirrored ln must match DuckDB bit-for-bit
    psi = (pa_ - pb_) * A.libm_log(pa_ / pb_)
    return pa.table({
        col: pa.array(cats, pa.string()),
        "n_a": pa.array(na), "n_b": pa.array(nb),
        "p_a": pa.array(pa_), "p_b": pa.array(pb_),
        "psi_term": pa.array(psi),
    })


def binary_auc(ds, score_col: str, label_col: str,
               driver_budget: int = 5_000_000):
    """EXACT ROC-AUC of a binary 0/1 integer label against an INTEGER score
    column (model-eval at corpus scale; float scores should be quantized to
    fixed-point first — the repo's integer-score discipline, e.g.
    LinearScoreTransformer's int64 logits). Rank formulation with exact tie
    handling, all in int64:

        num2 = sum over distinct scores v of  pos_v * (2*cumneg_below_v + neg_v)
        AUC  = num2 / (2 * P * N)        (ONE double division)

    which equals P(score_pos > score_neg) + 0.5*P(==) — the Mann-Whitney
    statistic. Returns a 1-row table (num2, pos_total, neg_total, auc).

    Scale plan: ONE partial-agg groupby builds the distinct-score
    (pos_v, n_v) table; under ``driver_budget`` distinct scores the fold is
    a driver numpy pass, above it the exclusive prefix rides
    ``global_cumsum`` (bucket id = score, driver state O(distinct scores /
    bucket)) and the fold is per-block partials + an O(blocks) driver sum.
    Both paths are exact integers (asserted equal in tests). Raises when
    2*P*N would leave int64 (~2e9 balanced rows) — beyond that compute AUC
    per shard/group and average, or subsample."""
    from kamae_ray.stages.aggregate import global_cumsum, groupby_agg

    def _fold_sorted(scores, pos, n):
        neg = n - pos
        if len(pos) and (pos.min() < 0 or (pos > n).any()):
            raise ValueError("binary_auc label must be a 0/1 integer column")
        order = np.argsort(scores, kind="stable")
        pos, neg = pos[order], neg[order]
        P, N = int(pos.sum()), int(neg.sum())
        if 2 * P * N >= 1 << 63:
            raise ValueError("2*P*N exceeds int64 — compute AUC per group/shard")
        cumneg = np.concatenate([[0], np.cumsum(neg)[:-1]]).astype(np.int64)
        num2 = int((pos * (2 * cumneg + neg)).sum())
        return num2, P, N

    def _result(num2, P, N):
        auc = float(num2) / (2.0 * P * N) if P and N else float("nan")
        return pa.table({
            "num2": pa.array([num2], pa.int64()),
            "pos_total": pa.array([P], pa.int64()),
            "neg_total": pa.array([N], pa.int64()),
            "auc": pa.array([auc], pa.float64()),
        })

    if isinstance(ds, pa.Table):
        stats = groupby_agg(ds.select([score_col, label_col]), score_col,
                            {label_col: ["sum", "count"]})
        keep = pc.is_valid(stats.column(score_col)).to_numpy(zero_copy_only=False)
        s = pc.cast(stats.column(score_col), pa.int64(), safe=False).to_numpy(zero_copy_only=False)[keep]
        p = pc.cast(stats.column(f"{label_col}_sum"), pa.int64(), safe=False).to_numpy(zero_copy_only=False)[keep]
        n = pc.cast(stats.column(f"{label_col}_count"), pa.int64(), safe=False).to_numpy(zero_copy_only=False)[keep]
        return _result(*_fold_sorted(s, p, n))

    from kamae_ray.base import collect_tables
    from kamae_ray.state.aggregators import _project

    proj = _project(ds, [score_col, label_col])
    stats = groupby_agg(proj, score_col, {label_col: ["sum", "count"]})
    stats = stats.materialize()  # consumed twice below on the distributed path
    n_distinct = stats.count()
    if n_distinct <= driver_budget:
        parts = [t for t in collect_tables(stats) if t.num_rows]
        if not parts:
            return _result(0, 0, 0)
        tbl = pa.concat_tables(parts)
        keep = pc.is_valid(tbl.column(score_col)).to_numpy(zero_copy_only=False)
        s = pc.cast(tbl.column(score_col), pa.int64(), safe=False).to_numpy(zero_copy_only=False)[keep]
        p = pc.cast(tbl.column(f"{label_col}_sum"), pa.int64(), safe=False).to_numpy(zero_copy_only=False)[keep]
        n = pc.cast(tbl.column(f"{label_col}_count"), pa.int64(), safe=False).to_numpy(zero_copy_only=False)[keep]
        return _result(*_fold_sorted(s, p, n))

    # distributed path: exclusive neg-prefix over the distinct-score order
    def prep(block: pa.Table) -> pa.Table:
        keep = pc.is_valid(block.column(score_col))
        block = block.filter(keep)
        s = pc.cast(block.column(score_col), pa.int64(), safe=False)
        p = pc.cast(block.column(f"{label_col}_sum"), pa.int64(), safe=False).to_numpy(zero_copy_only=False)
        n = pc.cast(block.column(f"{label_col}_count"), pa.int64(), safe=False).to_numpy(zero_copy_only=False)
        if len(p) and (p.min() < 0 or (p > n).any()):
            raise ValueError("binary_auc label must be a 0/1 integer column")
        return pa.table({"__auc_s": s, "__auc_pos": pa.array(p),
                         "__auc_neg": pa.array(n - p)})

    prep.__name__ = "auc_prep"
    keyed = stats.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True,
                              batch_size=None)
    ranked = global_cumsum(keyed, "__auc_s", "__auc_neg", out_col="__auc_cumneg",
                           exclusive=True)

    def partial(block: pa.Table) -> pa.Table:
        p = block.column("__auc_pos").to_numpy(zero_copy_only=False)
        g = block.column("__auc_neg").to_numpy(zero_copy_only=False)
        c = block.column("__auc_cumneg").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "num2": pa.array([int((p * (2 * c + g)).sum())], pa.int64()),
            "p": pa.array([int(p.sum())], pa.int64()),
            "n": pa.array([int(g.sum())], pa.int64()),
        })

    partial.__name__ = "auc_partial"
    parts = [t for t in collect_tables(
        ranked.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=None)) if t.num_rows]
    num2 = sum(int(x) for t in parts for x in t.column("num2").to_pylist())
    P = sum(int(x) for t in parts for x in t.column("p").to_pylist())
    N = sum(int(x) for t in parts for x in t.column("n").to_pylist())
    if 2 * P * N >= 1 << 63:
        raise ValueError("2*P*N exceeds int64 — compute AUC per group/shard")
    return _result(num2, P, N)


def calibration_bins(ds, score_col: str, label_col: str, bins: int,
                     max_score: int):
    """Reliability-diagram / calibration-curve bins for a binary 0/1 label
    against an INTEGER score in ``[0, max_score)`` (quantize floats first —
    binary_auc's convention): equal-width bucket ``score * bins //
    max_score``, per-bucket exact int64 (n, positives, score_sum) and the
    two derived rates (each ONE double division). Returns a driver table
    sorted by bucket — O(bins), the bounded-output contract.

    Scale plan: one derived-bucket map + ONE partial-agg groupby; nothing
    else moves."""
    from kamae_ray.stages.aggregate import groupby_agg

    if bins <= 0 or max_score <= 0 or bins * max_score >= 1 << 62:
        raise ValueError("bins and max_score must be positive with bins*max_score < 2^62")

    def bucketize(block: pa.Table) -> pa.Table:
        s = pc.cast(A.as_array(block.column(score_col)), pa.int64(), safe=False)
        ok = pc.is_valid(s)
        block = pa.table({"s": s, "y": pc.cast(A.as_array(block.column(label_col)), pa.int64(), safe=False)}).filter(ok)
        sv = block.column("s").to_numpy(zero_copy_only=False)
        if len(sv) and (sv.min() < 0 or sv.max() >= max_score):
            raise ValueError(f"scores outside [0, {max_score}) — raise max_score")
        b = sv * np.int64(bins) // np.int64(max_score)
        return pa.table({"bucket": pa.array(b, pa.int64()),
                         "y": block.column("y"), "s": block.column("s")})

    bucketize.__name__ = "calibration_bucketize"
    if isinstance(ds, pa.Table):
        stats = groupby_agg(bucketize(ds), "bucket",
                            {"y": ["sum", "count"], "s": ["sum"]})
    else:
        from kamae_ray.base import collect_tables
        from kamae_ray.state.aggregators import _project

        proj = _project(ds, [score_col, label_col]) or ds
        keyed = proj.map_batches(bucketize, batch_format="pyarrow",
                                 zero_copy_batch=True, batch_size=None)
        stats = groupby_agg(keyed, "bucket", {"y": ["sum", "count"], "s": ["sum"]})
        parts = [t for t in collect_tables(stats) if t.num_rows]
        stats = pa.concat_tables(parts) if parts else pa.table(
            {"bucket": pa.array([], pa.int64()), "y_sum": pa.array([], pa.float64()),
             "y_count": pa.array([], pa.int64()), "s_sum": pa.array([], pa.float64())})
    stats = stats.sort_by("bucket")
    n = pc.cast(stats.column("y_count"), pa.int64()).to_numpy(zero_copy_only=False)
    pos_f = pc.cast(stats.column("y_sum"), pa.float64(), safe=False).to_numpy(zero_copy_only=False)
    ss_f = pc.cast(stats.column("s_sum"), pa.float64(), safe=False).to_numpy(zero_copy_only=False)
    if len(ss_f) and (np.abs(ss_f).max() >= 2.0**53 or np.abs(pos_f).max() >= 2.0**53):
        raise ValueError("per-bucket sums exceed exact float64 range — use more bins")
    pos = pos_f.astype(np.int64)
    ssum = ss_f.astype(np.int64)
    if len(pos) and (pos < 0).any() or len(pos) and (pos > n).any():
        raise ValueError("calibration label must be a 0/1 integer column")
    with np.errstate(invalid="ignore", divide="ignore"):
        rate = np.where(n > 0, pos / np.where(n == 0, 1, n), np.nan)
        mean_s = np.where(n > 0, ssum / np.where(n == 0, 1, n), np.nan)
    return pa.table({
        "bucket": stats.column("bucket"),
        "n": pa.array(n),
        "pos": pa.array(pos),
        "score_sum": pa.array(ssum),
        "pos_rate": pa.array(rate, pa.float64()),
        "mean_score": pa.array(mean_s, pa.float64()),
    })


def binary_auc_by_group(ds, group_col: str, score_col: str, label_col: str):
    """Per-GROUP exact ROC-AUC (:func:`binary_auc` segmented by a model /
    slice / cohort column): one partial-agg groupby on (group, score), then
    ONE group sort and a fully vectorized segmented fold — exclusive
    neg-prefix per group via the cumsum-minus-segment-base trick. Output:
    one row per group (num2, pos_total, neg_total, auc), all int64 except
    the single-division auc. Raises when any group's 2*P*N leaves int64."""
    from kamae_ray.functions import segments as S
    from kamae_ray.stages.aggregate import groupby_agg
    from kamae_ray.stages.window import sorted_block_apply

    stats = groupby_agg(
        ds if isinstance(ds, pa.Table) else ds,
        [group_col, score_col], {label_col: ["sum", "count"]})

    def fold(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table({group_col: block.column(group_col),
                             "num2": pa.array([], pa.int64()),
                             "pos_total": pa.array([], pa.int64()),
                             "neg_total": pa.array([], pa.int64()),
                             "auc": pa.array([], pa.float64())})
        keep = pc.is_valid(block.column(score_col)).to_numpy(zero_copy_only=False)
        block = block.filter(pa.array(keep))
        gids = S.group_ids(block, [group_col])
        s = pc.cast(block.column(score_col), pa.int64(), safe=False).to_numpy(zero_copy_only=False)
        p = pc.cast(block.column(f"{label_col}_sum"), pa.int64(), safe=False).to_numpy(zero_copy_only=False)
        n = pc.cast(block.column(f"{label_col}_count"), pa.int64(), safe=False).to_numpy(zero_copy_only=False)
        if len(p) and (p.min() < 0 or (p > n).any()):
            raise ValueError("binary_auc_by_group label must be a 0/1 integer column")
        neg = n - p
        order = np.lexsort((s, gids))
        gs, ps, ns = gids[order], p[order], neg[order]
        starts, lens = S.segments(gs)
        cum = np.cumsum(ns) - ns  # inclusive-prefix minus self = exclusive
        base = np.repeat(cum[starts], lens)
        cumneg = cum - base
        terms = ps * (2 * cumneg + ns)
        num2 = np.add.reduceat(terms, starts)
        P = np.add.reduceat(ps, starts)
        N = np.add.reduceat(ns, starts)
        if len(P) and (2.0 * P.astype(np.float64) * N.astype(np.float64)).max() >= 2.0**63:
            raise ValueError("a group's 2*P*N exceeds int64 — shard further")
        first = order[starts]
        with np.errstate(invalid="ignore", divide="ignore"):
            auc = np.where((P > 0) & (N > 0),
                           num2.astype(np.float64) / (2.0 * P * N), np.nan)
        return pa.table({
            group_col: A.as_array(block.column(group_col)).take(pa.array(first)),
            "num2": pa.array(num2), "pos_total": pa.array(P),
            "neg_total": pa.array(N),
            "auc": pa.array(auc, pa.float64(), mask=~((P > 0) & (N > 0))),
        })

    if isinstance(stats, pa.Table):
        return fold(stats)
    return sorted_block_apply(stats, [group_col], fold, "group_auc_fold")


def brier_score(ds, score_col: str, label_col: str, scale: int):
    """EXACT Brier score of fixed-point probability scores (``p = s /
    scale``, s integer in [0, scale]) against a binary 0/1 label:

        ``num = sum (s - y*scale)^2``  (exact int64)
        ``brier = num / (n * scale^2)``  (ONE double division)

    Per-block int64 partials, O(blocks) driver fold — no shuffle at all.
    Returns a 1-row table (num, n, brier). Guard: n * scale^2 must stay
    inside int64."""
    if scale <= 0:
        raise ValueError("scale must be positive")

    def partial(block: pa.Table) -> pa.Table:
        s = pc.cast(A.as_array(block.column(score_col)), pa.int64(), safe=False)
        y = pc.cast(A.as_array(block.column(label_col)), pa.int64(), safe=False)
        ok = pc.and_(pc.is_valid(s), pc.is_valid(y))
        t = pa.table({"s": s, "y": y}).filter(ok)
        sv = t.column("s").to_numpy(zero_copy_only=False)
        yv = t.column("y").to_numpy(zero_copy_only=False)
        if len(sv) and (sv.min() < 0 or sv.max() > scale):
            raise ValueError(f"scores outside [0, {scale}]")
        if len(yv) and ((yv < 0) | (yv > 1)).any():
            raise ValueError("brier_score label must be a 0/1 integer column")
        d = sv - yv * np.int64(scale)
        return pa.table({"num": pa.array([int((d * d).sum())], pa.int64()),
                         "n": pa.array([len(sv)], pa.int64())})

    partial.__name__ = "brier_partial"
    if isinstance(ds, pa.Table):
        parts = [partial(ds)]
    else:
        from kamae_ray.base import collect_tables
        from kamae_ray.state.aggregators import _project

        proj = _project(ds, [score_col, label_col]) or ds
        parts = [t for t in collect_tables(
            proj.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=None)) if t.num_rows]
    num = sum(int(x) for t in parts for x in t.column("num").to_pylist())
    n = sum(int(x) for t in parts for x in t.column("n").to_pylist())
    if n * scale * scale >= 1 << 63:
        raise ValueError("n * scale^2 exceeds int64 — reduce scale")
    brier = (num / (n * scale * scale)) if n else float("nan")
    return pa.table({"num": pa.array([num], pa.int64()),
                     "n": pa.array([n], pa.int64()),
                     "brier": pa.array([brier], pa.float64())})


def spearman_by_group(ds, group_col: str, x_col: str, y_col: str):
    """Per-group Spearman rank correlation with exact tie handling: both
    columns rank within their group with AVERAGE ranks for ties, carried as
    the INTEGER ``2*avg_rank = 2*min_rank + tie_count - 1`` (the lesson-24
    exact-integer family — no float rank arithmetic on either engine), then
    centered by the integer group constant ``n+1`` so every power sum is an
    exact int64:

        spearman = S_ab / (sqrt(S_aa) * sqrt(S_bb))

    with S_ab/S_aa/S_bb the centered integer products (emitted for
    hash-exact certification; sqrt/mul/div of integer-derived doubles are
    IEEE-exact and bit-identical cross-engine — the groupby_skew_kurt
    precedent). Null pairs are dropped (SQL pair semantics); spearman is
    null when n < 2 or either column is constant. Raises when a group's
    4*n^3 rank-product sum would leave int64 (n ~> 1e6 — shard or sample).

    Scale plan: ONE group sort-shuffle, three in-block lexsorts (x-rank,
    y-rank, segment fold) — ranks need the whole group co-located, so this
    is sort-based by necessity, unlike the partial-agg groupby_corr."""
    from kamae_ray.stages.window import sorted_block_apply

    def _num(block, col):
        arr = A.as_array(block.column(col))
        t = pa.int64() if pa.types.is_integer(arr.type) else pa.float64()
        return pc.cast(arr, t, safe=False).to_numpy(zero_copy_only=False)

    def fold(block: pa.Table) -> pa.Table:
        ok = pc.and_kleene(pc.is_valid(block.column(x_col)),
                           pc.is_valid(block.column(y_col)))
        block = block.filter(pc.fill_null(ok, False))
        n = block.num_rows
        if n == 0:
            return pa.table({
                group_col: block.column(group_col),
                "n": pa.array([], pa.int64()),
                "s_ab": pa.array([], pa.int64()),
                "s_aa": pa.array([], pa.int64()),
                "s_bb": pa.array([], pa.int64()),
                "spearman": pa.array([], pa.float64()),
            })
        gids = S.group_ids(block, [group_col])
        g_order = np.argsort(gids, kind="stable")
        starts, lens = S.segments(gids[g_order])
        if float(lens.max()) ** 3 * 4.0 >= 2.0**62:
            raise ValueError("spearman_by_group: a group's rank-product sum "
                             "overflows int64 — shard or sample the group")
        ng = np.empty(n, np.int64)                      # group size per row
        ng[g_order] = np.repeat(lens.astype(np.int64), lens)

        def r2(v):
            order = np.lexsort((v, gids))
            gs, vs = gids[order], v[order]
            st, ln = S.segments(gs)
            pos = (np.arange(n, dtype=np.int64) - np.repeat(st, ln)) + 1
            new = np.concatenate([[True], (gs[1:] != gs[:-1]) | (vs[1:] != vs[:-1])])
            rst = np.nonzero(new)[0]
            rln = np.diff(np.concatenate([rst, [n]]))
            rend = rst + rln - 1
            out = np.empty(n, np.int64)
            out[order] = np.repeat(pos[rst] + pos[rend], rln)
            return out

        a = r2(_num(block, x_col)) - (ng + 1)           # centered 2*rank
        b = r2(_num(block, y_col)) - (ng + 1)
        asort, bsort = a[g_order], b[g_order]
        s_ab = np.add.reduceat(asort * bsort, starts).astype(np.int64)
        s_aa = np.add.reduceat(asort * asort, starts).astype(np.int64)
        s_bb = np.add.reduceat(bsort * bsort, starts).astype(np.int64)
        nseg = lens.astype(np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            denom = np.sqrt(s_aa.astype(np.float64)) * np.sqrt(s_bb.astype(np.float64))
            rho = np.where(denom > 0, s_ab.astype(np.float64)
                           / np.where(denom == 0, 1.0, denom), np.nan)
        okm = (nseg >= 2) & (s_aa > 0) & (s_bb > 0)
        firsts = g_order[starts]
        return pa.table({
            group_col: A.as_array(block.column(group_col)).take(pa.array(firsts)),
            "n": pa.array(nseg),
            "s_ab": pa.array(s_ab), "s_aa": pa.array(s_aa), "s_bb": pa.array(s_bb),
            "spearman": pa.array(rho, pa.float64(), mask=~okm),
        })

    if isinstance(ds, pa.Table):
        return fold(ds)
    return sorted_block_apply(ds, [group_col], fold, "spearman_fold")


def gini_by_group(ds, group_col: str, value_col: str):
    """Per-group Gini concentration coefficient over a NON-NEGATIVE integer
    value column (cents discipline) — the classic inequality measure for
    spend / exposure / token-count distributions:

        gini = sum((2*i - n - 1) * v_i) / (n * sum(v))    (v sorted asc,
                                                           1-based i)

    The numerator is a pure int64 segment sum (tie-order invariant: equal
    values commute across their positions, so the engine's stable sort and
    the oracle's arbitrary row_number tie order agree exactly); gini is ONE
    double division. Nulls drop; negative values raise. Output per group:
    n, value_sum, gini_num (all exact int64) + gini (null when n*sum = 0).

    Scale plan: ONE group sort-shuffle + an in-block lexsort and reduceat;
    guarded against int64 overflow (raise, never wrap)."""
    from kamae_ray.stages.window import sorted_block_apply

    def fold(block: pa.Table) -> pa.Table:
        block = block.filter(pc.is_valid(block.column(value_col)))
        n = block.num_rows
        if n == 0:
            return pa.table({
                group_col: block.column(group_col),
                "n": pa.array([], pa.int64()),
                "value_sum": pa.array([], pa.int64()),
                "gini_num": pa.array([], pa.int64()),
                "gini": pa.array([], pa.float64()),
            })
        v = pc.cast(A.as_array(block.column(value_col)), pa.int64(),
                    safe=False).to_numpy(zero_copy_only=False)
        if v.min() < 0:
            raise ValueError("gini_by_group requires non-negative values")
        gids = S.group_ids(block, [group_col])
        order = np.lexsort((v, gids))
        gs, vs = gids[order], v[order]
        starts, lens = S.segments(gs)
        if len(vs) and float(lens.max()) ** 2 * float(vs.max(initial=0)) >= 2.0**62:
            raise ValueError("gini_by_group: numerator overflows int64 — "
                             "rescale values or shard groups")
        pos = (np.arange(n, dtype=np.int64) - np.repeat(starts, lens)) + 1
        nrep = np.repeat(lens.astype(np.int64), lens)
        num = np.add.reduceat((2 * pos - nrep - 1) * vs, starts).astype(np.int64)
        vsum = np.add.reduceat(vs, starts).astype(np.int64)
        nseg = lens.astype(np.int64)
        denom = nseg * vsum
        with np.errstate(invalid="ignore", divide="ignore"):
            gini = np.where(denom > 0, num.astype(np.float64)
                            / np.where(denom == 0, 1, denom).astype(np.float64),
                            np.nan)
        firsts = order[starts]
        return pa.table({
            group_col: A.as_array(block.column(group_col)).take(pa.array(firsts)),
            "n": pa.array(nseg),
            "value_sum": pa.array(vsum),
            "gini_num": pa.array(num),
            "gini": pa.array(gini, pa.float64(), mask=~(denom > 0)),
        })

    if isinstance(ds, pa.Table):
        return fold(ds)
    return sorted_block_apply(ds, [group_col], fold, "gini_fold")


def herfindahl_by_group(ds, group_col: str, category_col: str,
                        driver_budget: int = 5_000_000):
    """Per-group Herfindahl-Hirschman concentration index over a category
    column (how concentrated is a slice's activity across users / domains /
    sources): with c_i the per-category counts inside a group,

        hhi_ppm = sum(c_i^2) * 1_000_000 // (sum(c_i))^2

    — integer-exact ppm (the char-diversity/inverse-Simpson family), plus
    the exact int64 ingredients (n_categories, total, hhi_num). Null
    categories count as a category (SQL GROUP BY semantics). Raises when a
    group's total leaves the exact int64 square range (~3e9 rows).

    Scale plan: ONE partial-agg groupby on (group, category) builds the
    count cells; the per-group fold is a segment kernel over ONE group
    sort of those cells (cells, not rows, move)."""
    from kamae_ray.stages.aggregate import groupby_agg
    from kamae_ray.stages.window import sorted_block_apply

    # COUNT(*) per cell, not COUNT(category): a null category still forms a
    # cell whose size is its row count (the r4 count-vs-count(*) lesson)
    def ones(block: pa.Table) -> pa.Table:
        return pa.table({
            group_col: block.column(group_col),
            category_col: block.column(category_col),
            "__one": pa.array(np.ones(block.num_rows, np.int64)),
        })

    ones.__name__ = "hhi_ones"
    tagged = ones(ds) if isinstance(ds, pa.Table) else ds.map_batches(
        ones, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    cells = groupby_agg(tagged, [group_col, category_col], {"__one": ["count"]})
    cnt_col = "__one_count"

    def fold(block: pa.Table) -> pa.Table:
        n = block.num_rows
        if n == 0:
            return pa.table({
                group_col: block.column(group_col),
                "n_categories": pa.array([], pa.int64()),
                "total": pa.array([], pa.int64()),
                "hhi_num": pa.array([], pa.int64()),
                "hhi_ppm": pa.array([], pa.int64()),
            })
        gids = S.group_ids(block, [group_col])
        order = np.argsort(gids, kind="stable")
        gs = gids[order]
        # count counts non-null; null categories still form a cell whose
        # size is the row count — recover it from the groupby's count=0 rows
        c = pc.cast(block.column(cnt_col), pa.int64(), safe=False) \
            .to_numpy(zero_copy_only=False)[order]
        starts, lens = S.segments(gs)
        total = np.add.reduceat(c, starts).astype(np.int64)
        if len(total) and float(total.max()) ** 2 >= 2.0**62:
            raise ValueError("herfindahl_by_group: total^2 overflows int64")
        num = np.add.reduceat(c * c, starts).astype(np.int64)
        ppm = np.where(total > 0, num * np.int64(1_000_000)
                       // np.where(total == 0, 1, total * total), 0)
        firsts = order[starts]
        return pa.table({
            group_col: A.as_array(block.column(group_col)).take(pa.array(firsts)),
            "n_categories": pa.array(lens.astype(np.int64)),
            "total": pa.array(total),
            "hhi_num": pa.array(num),
            "hhi_ppm": pa.array(ppm, pa.int64(), mask=~(total > 0)),
        })

    if isinstance(cells, pa.Table):
        return fold(cells)
    return sorted_block_apply(cells, [group_col], fold, "hhi_fold")


def check_rules(ds, rules: list[dict]):
    """Data-quality assertion report — the expectations layer a 100-TB
    ingest needs before features are trusted: each rule yields one output
    row ``(rule_idx, col, rule, violations, n_rows)`` with EXACT int64
    counts. Supported rules (``{"col": ..., "rule": ..., ...}``):

    - ``not_null`` — violations = null count
    - ``min`` / ``max`` (param ``value``) — non-null values outside the
      bound (null passes; pair with not_null to forbid)
    - ``in_set`` (param ``values``) — non-null values outside the set
    - ``matches`` (param ``pattern``, RE2 full-match) — non-null strings
      not matching
    - ``unique`` — surplus duplicates = count(col) - count(distinct col)
      (SQL form; nulls don't count)

    Scale plan: ALL row-local rules ride ONE shared pass (per-block int64
    partials, O(blocks x rules) driver fold — the profile_columns shape);
    each ``unique`` rule adds one distinct-count exchange on just that
    column. Nothing materializes."""
    from kamae_ray.base import collect_tables
    from kamae_ray.state.aggregators import _project

    for i, r in enumerate(rules):
        if r.get("rule") not in ("not_null", "min", "max", "in_set",
                                 "matches", "unique"):
            raise ValueError(f"rule {i}: unknown rule {r.get('rule')!r}")
        if "col" not in r:
            raise ValueError(f"rule {i}: missing col")

    local = [(i, r) for i, r in enumerate(rules) if r["rule"] != "unique"]
    uniq = [(i, r) for i, r in enumerate(rules) if r["rule"] == "unique"]

    def partial(block: pa.Table) -> pa.Table:
        n = block.num_rows
        counts = []
        for i, r in local:
            col = A.as_array(block.column(r["col"]))
            rule = r["rule"]
            if rule == "not_null":
                v = col.null_count
            elif rule in ("min", "max"):
                cmpfn = pc.less if rule == "min" else pc.greater
                bad = cmpfn(col, r["value"])
                v = pc.sum(pc.cast(bad, pa.int64())).as_py() or 0
            elif rule == "in_set":
                ok = pc.is_in(col, value_set=pa.array(list(r["values"])))
                bad = pc.and_(pc.invert(ok), pc.is_valid(col))
                v = pc.sum(pc.cast(bad, pa.int64())).as_py() or 0
            else:  # matches
                ok = pc.match_substring_regex(
                    pc.cast(col, pa.string(), safe=False),
                    f"^(?:{r['pattern']})$")
                bad = pc.and_(pc.invert(ok), pc.is_valid(col))
                v = pc.sum(pc.cast(bad, pa.int64())).as_py() or 0
            counts.append(int(v))
        return pa.table({
            "rule_idx": pa.array([i for i, _ in local], pa.int64()),
            "violations": pa.array(counts, pa.int64()),
            "n_rows": pa.array([n] * len(local), pa.int64()),
        })

    partial.__name__ = "rules_partial"
    need = sorted({r["col"] for _, r in local})
    out_v = {i: 0 for i, _ in local}
    out_n = {i: 0 for i, _ in local}
    if local:
        if isinstance(ds, pa.Table):
            parts = [partial(ds)]
        else:
            proj = _project(ds, need) or ds
            parts = [t for t in collect_tables(
                proj.map_batches(partial, batch_format="pyarrow",
                                 zero_copy_batch=True, batch_size=None))
                     if t.num_rows]
        for t in parts:
            for ri, v, n in zip(t.column("rule_idx").to_pylist(),
                                t.column("violations").to_pylist(),
                                t.column("n_rows").to_pylist()):
                out_v[ri] += int(v)
                out_n[ri] += int(n)

    for i, r in uniq:
        from kamae_ray.stages.aggregate import groupby_agg

        col = r["col"]
        if isinstance(ds, pa.Table):
            src = ds.select([col]).filter(pc.is_valid(ds.column(col)))
            cells = groupby_agg(src.append_column(
                "__one", pa.array(np.ones(src.num_rows, np.int64))),
                col, {"__one": ["count"]})
            cnts = pc.cast(cells.column("__one_count"), pa.int64()).to_numpy(zero_copy_only=False)
            total, distinct = int(cnts.sum()), len(cnts)
        else:
            def ones(block: pa.Table, _c=col) -> pa.Table:
                block = block.filter(pc.is_valid(block.column(_c)))
                return pa.table({_c: block.column(_c),
                                 "__one": pa.array(np.ones(block.num_rows, np.int64))})

            ones.__name__ = "unique_ones"
            proj = _project(ds, [col]) or ds
            cells = groupby_agg(proj.map_batches(
                ones, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=None), col, {"__one": ["count"]})

            def fold(block: pa.Table) -> pa.Table:
                c = pc.cast(block.column("__one_count"), pa.int64()).to_numpy(zero_copy_only=False)
                return pa.table({"t": pa.array([int(c.sum())], pa.int64()),
                                 "d": pa.array([len(c)], pa.int64())})

            fold.__name__ = "unique_fold"
            parts = [t for t in collect_tables(
                cells.map_batches(fold, batch_format="pyarrow",
                                  zero_copy_batch=True, batch_size=None))
                     if t.num_rows]
            total = sum(int(x) for t in parts for x in t.column("t").to_pylist())
            distinct = sum(int(x) for t in parts for x in t.column("d").to_pylist())
        out_v[i] = total - distinct
        out_n[i] = total

    order = sorted(out_v)
    return pa.table({
        "rule_idx": pa.array(order, pa.int64()),
        "col": pa.array([rules[i]["col"] for i in order], pa.string()),
        "rule": pa.array([rules[i]["rule"] for i in order], pa.string()),
        "violations": pa.array([out_v[i] for i in order], pa.int64()),
        "n_rows": pa.array([out_n[i] for i in order], pa.int64()),
    })


def benford_test(ds, group_col: str, value_col: str):
    """Per-group Benford's-law first-digit screen over a POSITIVE integer
    column — the classic fabricated-data / unit-mix data-quality signal:
    exact int64 digit counts d1..d9 plus the chi-squared statistic against
    the Benford expectation ``p_d = ln((d+1)/d) / ln(10)``.

    First digits come from the integer's decimal string (both engines
    format int64 identically — no float formatting anywhere); counts are
    order-free int64; the chi2 is nine fixed-order mirrored float terms
    ``(c_d - n*p_d)^2 / (n*p_d)`` with every ln through libm
    (:func:`benford_chi2_sql` generates the identical SQL). Rows with NULL
    or non-positive values are excluded (mirror with WHERE).

    Scale plan: one vectorized digit map + ONE partial-agg groupby to
    (group, digit) cells, then a segment fold over ONE sort of the cells
    (<= 9 cells per group move, never rows)."""
    from kamae_ray.stages.aggregate import groupby_agg
    from kamae_ray.stages.window import sorted_block_apply

    def prep(block: pa.Table) -> pa.Table:
        v = A.as_array(block.column(value_col))
        keep = pc.and_(pc.is_valid(v), pc.greater(
            pc.cast(v, pa.int64(), safe=False), 0))
        block = block.filter(keep)
        vi = pc.cast(A.as_array(block.column(value_col)), pa.int64(), safe=False)
        dig = pc.cast(pc.utf8_slice_codeunits(
            pc.cast(vi, pa.string()), 0, 1), pa.int64())
        return pa.table({
            group_col: block.column(group_col),
            "__dig": dig,
            "__one": pa.array(np.ones(block.num_rows, np.int64)),
        })

    prep.__name__ = "benford_digits"
    tagged = prep(ds) if isinstance(ds, pa.Table) else ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    cells = groupby_agg(tagged, [group_col, "__dig"], {"__one": ["count"]})

    l10 = A.libm_log(np.array([10.0]))[0]
    pd_ = A.libm_log((np.arange(1, 10) + 1.0) / np.arange(1, 10)) / l10

    def fold(block: pa.Table) -> pa.Table:
        out_cols = {group_col: None, "n": pa.int64()}
        if block.num_rows == 0:
            cols = {group_col: A.as_array(block.column(group_col)),
                    "n": pa.array([], pa.int64())}
            for d in range(1, 10):
                cols[f"d{d}"] = pa.array([], pa.int64())
            cols["chi2"] = pa.array([], pa.float64())
            return pa.table(cols)
        gids = S.group_ids(block, [group_col])
        order = np.argsort(gids, kind="stable")
        gs = gids[order]
        dig = pc.cast(A.as_array(block.column("__dig")), pa.int64(),
                      safe=False).to_numpy(zero_copy_only=False)[order]
        cnt = pc.cast(A.as_array(block.column("__one_count")), pa.int64(),
                      safe=False).to_numpy(zero_copy_only=False)[order]
        starts, lens = S.segments(gs)
        nseg = len(starts)
        seg_idx = np.repeat(np.arange(nseg, dtype=np.int64), lens)
        mat = np.zeros((nseg, 9), np.int64)
        mat[seg_idx, dig - 1] = cnt
        n = mat.sum(axis=1)
        nf = n.astype(np.float64)
        chi2 = np.zeros(nseg, np.float64)
        for j in range(9):
            e = nf * pd_[j]
            diff = mat[:, j].astype(np.float64) - e
            chi2 = chi2 + diff * diff / e
        firsts = order[starts]
        cols = {group_col: A.as_array(block.column(group_col)).take(pa.array(firsts)),
                "n": pa.array(n)}
        for d in range(1, 10):
            cols[f"d{d}"] = pa.array(mat[:, d - 1])
        cols["chi2"] = pa.array(chi2, pa.float64())
        return pa.table(cols)

    if isinstance(cells, pa.Table):
        return fold(cells)
    return sorted_block_apply(cells, [group_col], fold, "benford_fold")


def benford_chi2_sql(n_expr: str, cnt_fmt: str) -> str:
    """The oracle-side Benford chi2 GENERATED term-for-term like the engine
    fold: nine left-associative ``(c_d - n*p_d)^2 / (n*p_d)`` terms with
    ``p_d = ln((d+1)/d)/ln(10)``. ``cnt_fmt`` is a format string with
    ``{d}`` producing the digit-d count expression."""
    terms = []
    for d in range(1, 10):
        cd = cnt_fmt.format(d=d)
        e = (f"({n_expr})::DOUBLE * (ln(CAST({d + 1} AS DOUBLE) / "
             f"CAST({d} AS DOUBLE)) / ln(CAST(10 AS DOUBLE)))")
        terms.append(f"((({cd})::DOUBLE - {e}) * (({cd})::DOUBLE - {e}) / ({e}))")
    return " + ".join(terms)


_BOOT_P = 0x9E3779B97F4A7C15  # Knuth multiplicative (shared with HashSplit)
_BOOT_Q = 0xC2B2AE3D27D4EB4F


def _popcount32(v: np.ndarray) -> np.ndarray:
    """Vectorized popcount of uint64 values with only the low 32 bits set
    (SWAR — numpy 1.26 has no bitwise_count)."""
    v = v - ((v >> np.uint64(1)) & np.uint64(0x55555555))
    v = (v & np.uint64(0x33333333)) + ((v >> np.uint64(2)) & np.uint64(0x33333333))
    v = (v + (v >> np.uint64(4))) & np.uint64(0x0F0F0F0F)
    # uint64 doesn't truncate the byte-fold multiply like uint32 — mask to
    # the count byte (max 32 fits in 6 bits)
    return (((v * np.uint64(0x01010101)) >> np.uint64(24))
            & np.uint64(0x3F)).astype(np.int64)


def multiplier_bootstrap(ds, id_col: str, value_col: str,
                         replicates: int = 16, salt: int = 0):
    """Deterministic multiplier bootstrap of a SUM statistic — distributed
    uncertainty estimation without resampling the data: replicate ``r``
    reweights each row by

        ``w = popcount32((id*P + (r+salt)*Q) mod 2^32)``  (Binomial(32, 1/2))

    and reports ``wsum_r = sum(w * x)`` (exact int64, order-free) plus the
    unbiased ``estimate_r = wsum_r / 16`` (division by a power of two —
    exact IEEE; E[w] = 16). The spread of the R estimates is the bootstrap
    uncertainty of ``sum(x)``. Pure function of (id, r, salt): stable
    across partitions/cluster sizes and HUGEINT-mirrorable in SQL
    (bit_count — parity verified). Ids non-negative ints; values int64.

    Scale plan: one vectorized map emits R partial rows PER BLOCK (never
    per row); the driver folds O(blocks x R) integers. Output: one row per
    replicate (replicate, wsum, estimate)."""
    if not (1 <= replicates <= 64):
        raise ValueError("replicates must be in [1, 64]")
    if salt < 0:
        raise ValueError("salt must be non-negative")

    def partial(block: pa.Table) -> pa.Table:
        ids_a = A.as_array(block.column(id_col))
        vals_a = A.as_array(block.column(value_col))
        keep = pc.and_(pc.is_valid(ids_a), pc.is_valid(vals_a))
        block = block.filter(keep)
        ids = pc.cast(A.as_array(block.column(id_col)), pa.int64(),
                      safe=False).to_numpy(zero_copy_only=False)
        x = pc.cast(A.as_array(block.column(value_col)), pa.int64(),
                    safe=False).to_numpy(zero_copy_only=False)
        if len(ids) and ids.min() < 0:
            raise ValueError("multiplier_bootstrap ids must be non-negative")
        if len(x) and 32 * int(np.abs(x).max()) * len(x) >= 2**62:
            raise ValueError("multiplier_bootstrap block weighted sum risks "
                             "int64 overflow — rescale values")
        hbase = ids.astype(np.uint64) * np.uint64(_BOOT_P)
        reps = np.arange(replicates, dtype=np.int64)
        sums = np.zeros(replicates, np.int64)
        for r in range(replicates):
            h = (hbase + np.uint64((r + salt)) * np.uint64(_BOOT_Q)) \
                & np.uint64(0xFFFFFFFF)
            w = _popcount32(h)
            sums[r] = int((w * x).sum())
        return pa.table({"replicate": pa.array(reps),
                         "wsum": pa.array(sums)})

    partial.__name__ = "bootstrap_block_partial"
    if isinstance(ds, pa.Table):
        parts = [partial(ds)]
    else:
        from kamae_ray.base import collect_tables

        parts = [t for t in collect_tables(
            ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)) if t.num_rows]
    tot = np.zeros(replicates, np.int64)
    for t in parts:
        r = t.column("replicate").to_numpy(zero_copy_only=False)
        s = t.column("wsum").to_numpy(zero_copy_only=False)
        np.add.at(tot, r, s)
    est = tot.astype(np.float64) / 16.0
    return pa.table({
        "replicate": pa.array(np.arange(replicates, dtype=np.int64)),
        "wsum": pa.array(tot),
        "estimate": pa.array(est, pa.float64()),
    })


def welch_t_by_group(ds, group_col: str, class_col: str, value_col: str,
                     class_a, class_b, max_cells: int = 2_000_000):
    """Per-group Welch two-sample t statistic over an INTEGER metric — the
    unequal-variance A/B readout (the parametric sibling of
    ``ab_test_chi2``): within each group, compare ``value_col`` between
    ``class_a`` and ``class_b`` rows.

    Exactness: per-(group, class) n / sum(x) / sum(x^2) are order-free
    int64 partials through ONE groupby; means, sample variances, the t
    statistic and the Welch–Satterthwaite df are a fixed mirrored float
    chain over integer-derived doubles (sqrt/mul/div only — q_moments
    family; the ``n*sxx - sx^2`` numerators fold in arbitrary-precision
    python ints, then convert once — the same round-to-nearest DuckDB's
    HUGEINT::DOUBLE applies). ``t``/``df`` are NULL when either class has
    n < 2 or the pooled standard error is 0. Sums are guarded < 2^53
    (exactness through the float64 agg path).

    Scale plan: one derived map + ONE partial-agg groupby to (group, class)
    cells; the driver folds O(groups) cells (guarded by ``max_cells``)."""
    from kamae_ray.stages.aggregate import groupby_agg

    def prep(block: pa.Table) -> pa.Table:
        cls = A.as_array(block.column(class_col))
        keep = pc.and_(pc.is_valid(A.as_array(block.column(value_col))),
                       pc.or_(pc.equal(cls, class_a), pc.equal(cls, class_b)))
        block = block.filter(keep)
        x = pc.cast(A.as_array(block.column(value_col)), pa.int64(), safe=False)
        xv = x.to_numpy(zero_copy_only=False)
        if len(xv) and int(np.abs(xv).max()) >= (1 << 31):
            raise ValueError("welch_t_by_group values must fit 31 bits "
                             "(x^2 must stay exact int64) — rescale")
        return pa.table({
            group_col: block.column(group_col),
            "__is_a": pc.cast(pc.equal(A.as_array(block.column(class_col)),
                                       class_a), pa.int64()),
            "__x": x,
            "__xx": pa.array(xv * xv),
        })

    prep.__name__ = "welch_prep"
    tagged = prep(ds) if isinstance(ds, pa.Table) else ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    cells = groupby_agg(tagged, [group_col, "__is_a"],
                        {"__x": ["sum", "count"], "__xx": ["sum"]})
    if isinstance(cells, pa.Table):
        tbl = cells
    else:
        from kamae_ray.base import collect_tables

        parts = [t for t in collect_tables(cells) if t.num_rows]
        tbl = pa.concat_tables(parts) if parts else None
    if tbl is None or tbl.num_rows == 0:
        return pa.table({group_col: pa.array([], pa.string()),
                         "n_a": pa.array([], pa.int64()),
                         "n_b": pa.array([], pa.int64()),
                         "mean_a": pa.array([], pa.float64()),
                         "mean_b": pa.array([], pa.float64()),
                         "t_stat": pa.array([], pa.float64()),
                         "df": pa.array([], pa.float64())})
    if tbl.num_rows > max_cells:
        raise ValueError(f"welch_t_by_group cells ({tbl.num_rows}) exceed "
                         f"max_cells={max_cells}")
    sx = pc.cast(tbl.column("__x_sum"), pa.int64(), safe=False) \
        .to_numpy(zero_copy_only=False)
    n = pc.cast(tbl.column("__x_count"), pa.int64(), safe=False) \
        .to_numpy(zero_copy_only=False)
    sxx = pc.cast(tbl.column("__xx_sum"), pa.int64(), safe=False) \
        .to_numpy(zero_copy_only=False)
    if len(sxx) and int(np.abs(sxx).max()) >= (1 << 53):
        raise ValueError("welch_t_by_group sums exceed exact float64 range")
    isa = pc.cast(tbl.column("__is_a"), pa.int64(), safe=False) \
        .to_numpy(zero_copy_only=False)
    garr = A.as_array(tbl.column(group_col))
    cells_by_g: dict = {}
    for i in range(tbl.num_rows):
        g = garr[i].as_py()
        cells_by_g.setdefault(g, {})[int(isa[i])] = (
            int(n[i]), int(sx[i]), int(sxx[i]))
    groups = sorted(cells_by_g, key=lambda v: (v is None, str(v)))
    out_g, na_l, nb_l, ma_l, mb_l, t_l, df_l = [], [], [], [], [], [], []
    for g in groups:
        a = cells_by_g[g].get(1, (0, 0, 0))
        b = cells_by_g[g].get(0, (0, 0, 0))
        na, sa, sxxa = a
        nb, sb, sxxb = b
        ma = sa / na if na else None
        mb = sb / nb if nb else None
        t = df = None
        if na >= 2 and nb >= 2:
            va = float(na * sxxa - sa * sa) / float(na * (na - 1))
            vb = float(nb * sxxb - sb * sb) / float(nb * (nb - 1))
            sea = va / float(na)
            seb = vb / float(nb)
            se2 = sea + seb
            if se2 > 0:
                t = (ma - mb) / np.sqrt(se2)
                da = sea * sea / float(na - 1)
                db = seb * seb / float(nb - 1)
                df = (se2 * se2) / (da + db)
        out_g.append(g)
        na_l.append(na)
        nb_l.append(nb)
        ma_l.append(ma)
        mb_l.append(mb)
        t_l.append(None if t is None else float(t))
        df_l.append(None if df is None else float(df))
    return pa.table({
        group_col: pa.array(out_g, garr.type),
        "n_a": pa.array(na_l, pa.int64()),
        "n_b": pa.array(nb_l, pa.int64()),
        "mean_a": pa.array(ma_l, pa.float64()),
        "mean_b": pa.array(mb_l, pa.float64()),
        "t_stat": pa.array(t_l, pa.float64()),
        "df": pa.array(df_l, pa.float64()),
    })


def kendall_tau_by_group(ds, group_col: str, x_col: str, y_col: str,
                         max_group_rows: int = 100_000):
    """Per-group Kendall tau-b rank correlation over two INTEGER columns —
    the tie-aware concordance statistic (``spearman_by_group``'s sibling
    for ordinal agreement):

        ncd   = sum over pairs i<j of sign(x_i-x_j) * sign(y_i-y_j)
        tau_b = ncd / (sqrt(n0 - n1) * sqrt(n0 - n2))

    with ``n0 = n(n-1)/2`` and ``n1``/``n2`` the tied-pair counts in x/y.
    Exactness: ncd and the tie counts are pure int64 (sign products summed
    over the symmetric pair matrix, halved — always even), tau_b is a fixed
    sqrt/mul/div chain over integer-derived doubles (bit-identical
    cross-engine). Rows with a null x or y are dropped (SQL pair-scan
    semantics); tau_b is NULL when either tie-corrected pair count is 0.

    Scale plan: ONE sort-shuffle on the group key, then a per-group kernel
    that is O(n^2) pairwise sign products TILED to ~16 MB chunks (lesson
    31) — exact and vectorized; groups above ``max_group_rows`` raise
    (document the merge-sort inversion O(n log n) path before lifting the
    cap). Output: group, n, ncd, ties_x, ties_y, tau_b."""
    from kamae_ray.stages.window import sorted_block_apply

    def prep(block: pa.Table) -> pa.Table:
        xa = A.as_array(block.column(x_col))
        ya = A.as_array(block.column(y_col))
        t = pa.table({group_col: A.as_array(block.column(group_col)),
                      x_col: pc.cast(xa, pa.int64(), safe=False),
                      y_col: pc.cast(ya, pa.int64(), safe=False)})
        return t.filter(pc.and_(pc.is_valid(xa), pc.is_valid(ya)))

    prep.__name__ = "kendall_prep"

    def kern(block: pa.Table) -> pa.Table:
        garr = A.as_array(block.column(group_col))
        if block.num_rows == 0:
            return pa.table({
                group_col: garr.slice(0, 0),
                "n": pa.array([], pa.int64()),
                "ncd": pa.array([], pa.int64()),
                "ties_x": pa.array([], pa.int64()),
                "ties_y": pa.array([], pa.int64()),
                "tau_b": pa.array([], pa.float64()),
            })
        gids = S.group_ids(block, [group_col])
        x = A.as_array(block.column(x_col)).to_numpy(zero_copy_only=False)
        y = A.as_array(block.column(y_col)).to_numpy(zero_copy_only=False)
        if len(x) and max(int(np.abs(x).max()), int(np.abs(y).max())) >= (1 << 62):
            raise ValueError("kendall values must fit 62 bits (sign diffs)")
        order = np.argsort(gids, kind="stable")
        gs, xs, ys = gids[order], x[order], y[order]
        starts, lens = S.segments(gs)
        out_g, n_l, ncd_l, t1_l, t2_l, tau_l = [], [], [], [], [], []
        for s0, ln in zip(starts, lens):
            n = int(ln)
            if n > max_group_rows:
                raise ValueError(f"kendall group of {n} rows exceeds "
                                 f"max_group_rows={max_group_rows}")
            xv, yv = xs[s0:s0 + n], ys[s0:s0 + n]
            acc = 0
            chunk = max(1, 2_000_000 // max(n, 1))
            for i in range(0, n, chunk):
                sx = np.sign(xv[i:i + chunk, None] - xv[None, :]).astype(np.int8)
                sy = np.sign(yv[i:i + chunk, None] - yv[None, :]).astype(np.int8)
                acc += int((sx * sy).sum(dtype=np.int64))
            ncd = acc // 2  # symmetric matrix, zero diagonal -> always even
            _, cx = np.unique(xv, return_counts=True)
            _, cy = np.unique(yv, return_counts=True)
            n1 = int((cx * (cx - 1) // 2).sum())
            n2 = int((cy * (cy - 1) // 2).sum())
            n0 = n * (n - 1) // 2
            tau = None
            if n0 - n1 > 0 and n0 - n2 > 0:
                tau = float(ncd) / (np.sqrt(float(n0 - n1))
                                    * np.sqrt(float(n0 - n2)))
            out_g.append(int(s0))
            n_l.append(n)
            ncd_l.append(ncd)
            t1_l.append(n1)
            t2_l.append(n2)
            tau_l.append(tau)
        firsts = order[np.array(out_g, dtype=np.int64)]
        return pa.table({
            group_col: garr.take(pa.array(firsts)),
            "n": pa.array(n_l, pa.int64()),
            "ncd": pa.array(ncd_l, pa.int64()),
            "ties_x": pa.array(t1_l, pa.int64()),
            "ties_y": pa.array(t2_l, pa.int64()),
            "tau_b": pa.array(tau_l, pa.float64()),
        })

    if isinstance(ds, pa.Table):
        return kern(prep(ds))
    keyed = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=None)
    return sorted_block_apply(keyed, [group_col], kern, "kendall_fold")


def contingency_residuals(ds, x_col: str, y_col: str,
                          max_cells: int = 2_000_000):
    """Contingency-table cell diagnostics between two CATEGORICAL columns —
    per-cell observed count, expected count under independence and the
    standardized Pearson residual

        e     = row_x * col_y / n       (exact-int product, ONE division)
        resid = (o - e) / sqrt(e)       (fixed mirrored float chain)

    Per-CELL terms are emitted (the chi-squared total would be an
    order-sensitive cross-cell float sum — the PSI/IV discipline; the
    caller's ``sum(resid^2)`` over the bounded cells table is its one
    driver step). Rows with a null x or y are dropped (SQL GROUP BY with a
    WHERE); categories are compared as strings.

    Scale plan: ONE partial-agg groupby to (x, y) cells; margins fold on
    the driver over O(cells) guarded by ``max_cells``."""
    from kamae_ray.base import collect_tables
    from kamae_ray.stages.aggregate import groupby_agg

    def prep(block: pa.Table) -> pa.Table:
        xv = pc.cast(A.as_array(block.column(x_col)), pa.string(), safe=False)
        yv = pc.cast(A.as_array(block.column(y_col)), pa.string(), safe=False)
        t = pa.table({"__cx": xv, "__cy": yv,
                      "__one": pa.array(np.ones(block.num_rows, np.int64))})
        return t.filter(pc.and_(pc.is_valid(xv), pc.is_valid(yv)))

    prep.__name__ = "contingency_cells"
    keyed = prep(ds) if isinstance(ds, pa.Table) else ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    cells = groupby_agg(keyed, ["__cx", "__cy"], {"__one": ["sum"]})
    if isinstance(cells, pa.Table):
        tbl = cells
    else:
        parts = [t for t in collect_tables(cells) if t.num_rows]
        tbl = pa.concat_tables(parts) if parts else None
    if tbl is None or tbl.num_rows == 0:
        return pa.table({x_col: pa.array([], pa.string()),
                         y_col: pa.array([], pa.string()),
                         "observed": pa.array([], pa.int64()),
                         "expected": pa.array([], pa.float64()),
                         "residual": pa.array([], pa.float64())})
    if tbl.num_rows > max_cells:
        raise ValueError(f"contingency cells ({tbl.num_rows}) exceed "
                         f"max_cells={max_cells}")
    xs = tbl.column("__cx").to_pylist()
    ys = tbl.column("__cy").to_pylist()
    o = pc.cast(tbl.column("__one_sum"), pa.int64(), safe=False) \
        .to_numpy(zero_copy_only=False)
    rows: dict = {}
    colm: dict = {}
    n = 0
    for i in range(tbl.num_rows):
        c = int(o[i])
        rows[xs[i]] = rows.get(xs[i], 0) + c
        colm[ys[i]] = colm.get(ys[i], 0) + c
        n += c
    order = sorted(range(tbl.num_rows), key=lambda i: (xs[i], ys[i]))
    out_x, out_y, o_l, e_l, r_l = [], [], [], [], []
    for i in order:
        e = float(rows[xs[i]] * colm[ys[i]]) / float(n)
        resid = (float(int(o[i])) - e) / np.sqrt(e)
        out_x.append(xs[i])
        out_y.append(ys[i])
        o_l.append(int(o[i]))
        e_l.append(e)
        r_l.append(resid)
    return pa.table({x_col: pa.array(out_x, pa.string()),
                     y_col: pa.array(out_y, pa.string()),
                     "observed": pa.array(o_l, pa.int64()),
                     "expected": pa.array(e_l, pa.float64()),
                     "residual": pa.array(r_l, pa.float64())})


def acf_by_group(ds, group_col: str, order_cols, value_col: str,
                 max_lag: int = 5):
    """Autocorrelation function per group — the lag-1..K Pearson table over
    an INTEGER value column ordered within each entity (seasonality /
    persistence screening; generalizes the lag-1 composition behind
    q_autocorr to a full ACF):

    for each lag k, the pairs are (v_i, v_{i+k}) within a group under the
    ``order_cols`` total order; exact int64 power sums (n, sx, sy, sxy,
    sxx, syy) per (group, lag) accumulate via vectorized scatter-adds, the
    Pearson close is the fixed mirrored

        r = (n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy))

    chain with python-int numerators (the welch family). Values must fit
    26 bits (squares' SUMS stay exact int64 at any realistic group size);
    null values are dropped BEFORE pairing (= the SQL LAG over the filtered
    set). ``acf`` is NULL when n < 2 or either variance term is 0.

    Scale plan: ONE sort-shuffle on the group key; the kernel is one
    in-block lexsort + K shifted vectorized passes; output is O(groups*K)
    cells. Include a unique tiebreak in ``order_cols``."""
    from kamae_ray.stages.window import sorted_block_apply

    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    if max_lag < 1 or max_lag > 256:
        raise ValueError("max_lag must be in [1, 256]")

    def prep(block: pa.Table) -> pa.Table:
        v = pc.cast(A.as_array(block.column(value_col)), pa.int64(), safe=False)
        cols = {group_col: A.as_array(block.column(group_col))}
        for c in order_cols:
            cols[c] = pc.cast(A.as_array(block.column(c)), pa.int64(),
                              safe=False)
        cols[value_col] = v
        return pa.table(cols).filter(pc.is_valid(v))

    prep.__name__ = "acf_prep"

    def kern(block: pa.Table) -> pa.Table:
        garr = A.as_array(block.column(group_col))
        empty = pa.table({
            group_col: garr.slice(0, 0),
            "lag": pa.array([], pa.int64()),
            "n_pairs": pa.array([], pa.int64()),
            "acf": pa.array([], pa.float64()),
        })
        if block.num_rows == 0:
            return empty
        gids = S.group_ids(block, [group_col])
        v = A.as_array(block.column(value_col)).to_numpy(zero_copy_only=False)
        if len(v) and int(np.abs(v).max()) >= (1 << 26):
            raise ValueError("acf values must fit 26 bits — rescale "
                             "(squares' sums must stay exact int64)")
        okeys = [A.as_array(block.column(c)).to_numpy(zero_copy_only=False)
                 for c in order_cols]
        order = np.lexsort(tuple(reversed(okeys)) + (gids,))
        gs, vs = gids[order], v[order]
        n_g = int(gs.max()) + 1
        firsts_idx = np.full(n_g, len(gs), np.int64)
        np.minimum.at(firsts_idx, gs, np.arange(len(gs), dtype=np.int64))
        out_lag, out_n, out_acf, out_gid = [], [], [], []
        for k in range(1, max_lag + 1):
            if len(vs) <= k:
                break
            m = gs[:-k] == gs[k:]
            gid = gs[:-k][m]
            x = vs[:-k][m]
            y = vs[k:][m]
            n = np.zeros(n_g, np.int64)
            sx = np.zeros(n_g, np.int64)
            sy = np.zeros(n_g, np.int64)
            sxy = np.zeros(n_g, np.int64)
            sxx = np.zeros(n_g, np.int64)
            syy = np.zeros(n_g, np.int64)
            np.add.at(n, gid, 1)
            np.add.at(sx, gid, x)
            np.add.at(sy, gid, y)
            np.add.at(sxy, gid, x * y)
            np.add.at(sxx, gid, x * x)
            np.add.at(syy, gid, y * y)
            if len(n) and max(int(sxx.max()), int(syy.max()),
                              int(np.abs(sxy).max())) >= (1 << 62):
                raise ValueError("acf power sums exceed int64")
            for g in np.flatnonzero(n > 0):
                ng = int(n[g])
                va = ng * int(sxx[g]) - int(sx[g]) ** 2
                vb = ng * int(syy[g]) - int(sy[g]) ** 2
                r = None
                if ng >= 2 and va > 0 and vb > 0:
                    r = float(ng * int(sxy[g]) - int(sx[g]) * int(sy[g])) / (
                        np.sqrt(float(va)) * np.sqrt(float(vb)))
                out_gid.append(int(g))
                out_lag.append(k)
                out_n.append(ng)
                out_acf.append(r)
        if not out_gid:
            return empty
        take_idx = order[firsts_idx[np.array(out_gid, np.int64)]]
        return pa.table({
            group_col: garr.take(pa.array(take_idx)),
            "lag": pa.array(out_lag, pa.int64()),
            "n_pairs": pa.array(out_n, pa.int64()),
            "acf": pa.array(out_acf, pa.float64()),
        })

    if isinstance(ds, pa.Table):
        return kern(prep(ds))
    keyed = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=None)
    return sorted_block_apply(keyed, [group_col], kern, "acf_fold")


def anova_f_by_group(ds, group_col: str, class_col: str, value_col: str,
                     classes: list, max_cells: int = 2_000_000):
    """Per-group one-way ANOVA F statistic over an INTEGER metric across a
    FIXED class list (the g-sample generalization of ``welch_t_by_group``):

        SSB = sum_j s_j^2/n_j - S^2/N      (between-class)
        SSW = sum_j (ss_j - s_j^2/n_j)     (within-class)
        F   = (SSB/(g-1)) / (SSW/(N-g))

    with g the number of classes present (n_j > 0). ``classes`` must be the
    explicit category list — the float chains accumulate left-associatively
    in that exact order on BOTH engines (the ranking-DCG static-chain
    pattern), so F is bit-identical to a generated SQL oracle. Per-class
    n/sum/sum-of-squares are order-free int64 partials (values guarded to
    31 bits, sums to 2^53). ``f_stat`` is NULL when fewer than 2 classes
    are present, N <= g, or SSW <= 0.

    Scale plan: one derived map + ONE partial-agg groupby to
    (group, class) cells; the driver folds O(groups x classes) tiny cells
    (guarded by ``max_cells``)."""
    from kamae_ray.stages.aggregate import groupby_agg

    classes = list(classes)
    cmap = {c: i for i, c in enumerate(classes)}
    if len(cmap) != len(classes) or len(classes) < 2:
        raise ValueError("classes must be >= 2 distinct values")

    def prep(block: pa.Table) -> pa.Table:
        cls = A.as_array(block.column(class_col))
        member = pc.is_in(cls, value_set=pa.array(classes, cls.type))
        keep = pc.and_(pc.is_valid(A.as_array(block.column(value_col))), member)
        block = block.filter(keep)
        x = pc.cast(A.as_array(block.column(value_col)), pa.int64(), safe=False)
        xv = x.to_numpy(zero_copy_only=False)
        if len(xv) and int(np.abs(xv).max()) >= (1 << 31):
            raise ValueError("anova_f_by_group values must fit 31 bits "
                             "(x^2 must stay exact int64) — rescale")
        ci = pc.index_in(A.as_array(block.column(class_col)),
                         value_set=pa.array(classes, cls.type))
        return pa.table({
            group_col: block.column(group_col),
            "__cls": pc.cast(ci, pa.int64()),
            "__x": x,
            "__xx": pa.array(xv * xv),
        })

    prep.__name__ = "anova_prep"
    tagged = prep(ds) if isinstance(ds, pa.Table) else ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    cells = groupby_agg(tagged, [group_col, "__cls"],
                        {"__x": ["sum", "count"], "__xx": ["sum"]})
    if isinstance(cells, pa.Table):
        tbl = cells
    else:
        from kamae_ray.base import collect_tables

        parts = [t for t in collect_tables(cells) if t.num_rows]
        tbl = pa.concat_tables(parts) if parts else None
    gtype = None
    if tbl is None or tbl.num_rows == 0:
        return pa.table({group_col: pa.array([], pa.string()),
                         "n": pa.array([], pa.int64()),
                         "n_classes": pa.array([], pa.int64()),
                         "f_stat": pa.array([], pa.float64())})
    if tbl.num_rows > max_cells:
        raise ValueError(f"anova_f_by_group cells ({tbl.num_rows}) exceed "
                         f"max_cells={max_cells}")
    sx = pc.cast(tbl.column("__x_sum"), pa.int64(), safe=False) \
        .to_numpy(zero_copy_only=False)
    n = pc.cast(tbl.column("__x_count"), pa.int64(), safe=False) \
        .to_numpy(zero_copy_only=False)
    sxx = pc.cast(tbl.column("__xx_sum"), pa.int64(), safe=False) \
        .to_numpy(zero_copy_only=False)
    if len(sxx) and int(np.abs(sxx).max()) >= (1 << 53):
        raise ValueError("anova_f_by_group sums exceed exact float64 range")
    ci = pc.cast(tbl.column("__cls"), pa.int64(), safe=False) \
        .to_numpy(zero_copy_only=False)
    garr = A.as_array(tbl.column(group_col))
    gtype = garr.type
    by_g: dict = {}
    for i in range(tbl.num_rows):
        gval = garr[i].as_py()
        by_g.setdefault(gval, {})[int(ci[i])] = (int(n[i]), int(sx[i]),
                                                 int(sxx[i]))
    groups = sorted(by_g, key=lambda v: (v is None, str(v)))
    out_g, n_l, g_l, f_l = [], [], [], []
    for gval in groups:
        cellmap = by_g[gval]
        N = sum(c[0] for c in cellmap.values())
        S = sum(c[1] for c in cellmap.values())
        g_present = sum(1 for c in cellmap.values() if c[0] > 0)
        # left-assoc float chains in the declared class order — the SQL
        # oracle emits the identical parenthesization
        tb = 0.0
        sw = 0.0
        for j in range(len(classes)):
            nj, sj, ssj = cellmap.get(j, (0, 0, 0))
            if nj > 0:
                term = (float(sj) * float(sj)) / float(nj)
                tb = tb + term
                sw = sw + (float(ssj) - term)
        f = None
        if g_present >= 2 and N > g_present:
            ssb = tb - (float(S) * float(S)) / float(N)
            if sw > 0:
                f = (ssb / float(g_present - 1)) / (sw / float(N - g_present))
        out_g.append(gval)
        n_l.append(N)
        g_l.append(g_present)
        f_l.append(f)
    return pa.table({
        group_col: pa.array(out_g, gtype),
        "n": pa.array(n_l, pa.int64()),
        "n_classes": pa.array(g_l, pa.int64()),
        "f_stat": pa.array(f_l, pa.float64()),
    })


def anova_f_oracle_sql(table: str, group_expr: str, group_name: str,
                       class_col: str, value_expr: str,
                       classes: list) -> str:
    """GENERATE the exact SQL oracle for :func:`anova_f_by_group` — pivoted
    per-class cells + the SAME left-associative float chains."""
    def lit(v):
        return "'" + str(v).replace("'", "''") + "'" if isinstance(v, str) \
            else str(v)

    piv = ", ".join(
        f"COALESCE(MAX(CASE WHEN cls = {lit(c)} THEN n END), 0) AS n_{i}, "
        f"COALESCE(MAX(CASE WHEN cls = {lit(c)} THEN sx END), 0) AS s_{i}, "
        f"COALESCE(MAX(CASE WHEN cls = {lit(c)} THEN sxx END), 0) AS ss_{i}"
        for i, c in enumerate(classes))
    tb = "CAST(0 AS DOUBLE)"
    sw = "CAST(0 AS DOUBLE)"
    for i in range(len(classes)):
        term = (f"(CAST(s_{i} AS DOUBLE) * CAST(s_{i} AS DOUBLE)) "
                f"/ CAST(n_{i} AS DOUBLE)")
        tb = f"({tb} + CASE WHEN n_{i} > 0 THEN {term} ELSE 0 END)"
        sw = (f"({sw} + CASE WHEN n_{i} > 0 THEN "
              f"CAST(ss_{i} AS DOUBLE) - {term} ELSE 0 END)")
    ntot = " + ".join(f"n_{i}" for i in range(len(classes)))
    gpres = " + ".join(f"CASE WHEN n_{i} > 0 THEN 1 ELSE 0 END"
                       for i in range(len(classes)))
    stot = " + ".join(f"s_{i}" for i in range(len(classes)))
    inlist = ", ".join(lit(c) for c in classes)
    return (
        f"WITH b AS (SELECT {group_expr} AS {group_name}, {class_col} AS cls, "
        f"{value_expr} AS x FROM {table} "
        f"WHERE ({value_expr}) IS NOT NULL AND {class_col} IN ({inlist})), "
        "c AS (SELECT " + group_name + ", cls, COUNT(*)::BIGINT AS n, "
        "SUM(x)::BIGINT AS sx, "
        "SUM(x*x)::BIGINT AS sxx FROM b GROUP BY 1, cls), "
        f"p AS (SELECT {group_name}, {piv} FROM c GROUP BY 1), "
        f"v AS (SELECT {group_name}, ({ntot})::BIGINT AS n, ({gpres})::BIGINT AS n_classes, "
        f"({stot})::BIGINT AS s, {tb} AS tb, {sw} AS sw FROM p) "
        "SELECT " + group_name + ", n, n_classes, "
        "ROUND(CASE WHEN n_classes >= 2 AND n > n_classes AND sw > 0 THEN "
        "((tb - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / CAST(n AS DOUBLE)) "
        "/ CAST(n_classes - 1 AS DOUBLE)) / "
        "(sw / CAST(n - n_classes AS DOUBLE)) END, 6) "
        "AS f_stat FROM v"
    )


def cramers_v(ds, x_col: str, y_col: str, x_values: list, y_values: list,
              max_parts: int = 1_000_000):
    """Global Cramér's V association between two categorical columns over
    FIXED category lists: ``V = sqrt(chi2 / (n * min(r-1, c-1)))`` with the
    classic chi-square over the r x c contingency table (rows outside the
    given lists are dropped). Cell counts and margins are exact int64 (one
    per-block bincount partial — O(blocks x r x c) rows shuffle, never the
    data); the chi2 sum accumulates left-associatively in (x, y) declared
    order on both engines, so the statistic is bit-identical to the
    generated oracle. Returns ONE row: n, chi2, v."""
    x_values, y_values = list(x_values), list(y_values)
    r, c = len(x_values), len(y_values)
    if r < 2 or c < 2:
        raise ValueError("need >= 2 categories per side")

    def partial(block: pa.Table) -> pa.Table:
        xs = A.as_array(block.column(x_col))
        ys = A.as_array(block.column(y_col))
        xi = pc.index_in(xs, value_set=pa.array(x_values, xs.type))
        yi = pc.index_in(ys, value_set=pa.array(y_values, ys.type))
        xv = pc.fill_null(xi, -1).to_numpy(zero_copy_only=False).astype(np.int64)
        yv = pc.fill_null(yi, -1).to_numpy(zero_copy_only=False).astype(np.int64)
        m = (xv >= 0) & (yv >= 0)
        counts = np.bincount(xv[m] * c + yv[m], minlength=r * c)
        return pa.table({"cell": pa.array(np.arange(r * c, dtype=np.int64)),
                         "cnt": pa.array(counts.astype(np.int64))})

    partial.__name__ = "cramers_partial"
    if isinstance(ds, pa.Table):
        cnt = partial(ds).column("cnt").to_numpy(zero_copy_only=False).copy()
    else:
        from kamae_ray.base import collect_tables

        parts = ds.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=None)
        cnt = np.zeros(r * c, np.int64)
        n_parts = 0
        for t in collect_tables(parts):
            n_parts += 1
            if n_parts > max_parts:
                raise ValueError("cramers_v partials exceed max_parts")
            if t.num_rows:
                cell = t.column("cell").to_numpy(zero_copy_only=False)
                cv = t.column("cnt").to_numpy(zero_copy_only=False)
                np.add.at(cnt, cell, cv)
    o = cnt.reshape(r, c)
    rows = o.sum(axis=1)
    cols = o.sum(axis=0)
    n = int(o.sum())
    chi2 = None
    v = None
    if n > 0 and (rows > 0).sum() >= 2 and (cols > 0).sum() >= 2:
        # BLOCKED left-assoc in (x, y) declared order — per-x inner chain,
        # outer chain across x (the oracle emits the identical association;
        # a flat r*c chain would exceed DuckDB's 128-deep binder recursion)
        acc = 0.0
        for i in range(r):
            rowacc = 0.0
            for j in range(c):
                if rows[i] > 0 and cols[j] > 0:
                    e = (float(rows[i]) * float(cols[j])) / float(n)
                    d = float(o[i, j]) - e
                    rowacc = rowacc + (d * d) / e
            acc = acc + rowacc
        chi2 = acc
        dof = min(int((rows > 0).sum()) - 1, int((cols > 0).sum()) - 1)
        v = float(np.sqrt(chi2 / (float(n) * float(dof))))
    return pa.table({"n": pa.array([n], pa.int64()),
                     "chi2": pa.array([chi2], pa.float64()),
                     "v": pa.array([v], pa.float64())})


def cramers_v_oracle_sql(table: str, x_col: str, y_col: str,
                         x_values: list, y_values: list,
                         where: str = "TRUE") -> str:
    """GENERATE the exact SQL oracle for :func:`cramers_v` — static pivoted
    cells and the SAME left-associative (x, y)-ordered chi2 chain."""
    def lit(v):
        return "'" + str(v).replace("'", "''") + "'" if isinstance(v, str) \
            else str(v)

    r, c = len(x_values), len(y_values)
    cells = ", ".join(
        f"SUM(CASE WHEN {x_col} = {lit(x)} AND {y_col} = {lit(y)} "
        f"THEN 1 ELSE 0 END)::BIGINT AS o_{i}_{j}"
        for i, x in enumerate(x_values) for j, y in enumerate(y_values))
    rowsum = {i: " + ".join(f"o_{i}_{j}" for j in range(c)) for i in range(r)}
    colsum = {j: " + ".join(f"o_{i}_{j}" for i in range(r)) for j in range(c)}
    margins = ", ".join(
        [f"({rowsum[i]})::BIGINT AS r_{i}" for i in range(r)]
        + [f"({colsum[j]})::BIGINT AS c_{j}" for j in range(c)])
    ntot = " + ".join(f"r_{i}" for i in range(r))
    acc = "CAST(0 AS DOUBLE)"
    for i in range(r):
        rowacc = "CAST(0 AS DOUBLE)"
        for j in range(c):
            e = (f"(CAST(r_{i} AS DOUBLE) * CAST(c_{j} AS DOUBLE)) "
                 f"/ CAST(n AS DOUBLE)")
            d = f"(CAST(o_{i}_{j} AS DOUBLE) - ({e}))"
            rowacc = (f"({rowacc} + CASE WHEN r_{i} > 0 AND c_{j} > 0 THEN "
                      f"({d} * {d}) / ({e}) ELSE 0 END)")
        acc = f"({acc} + {rowacc})"
    rpres = " + ".join(f"CASE WHEN r_{i} > 0 THEN 1 ELSE 0 END"
                       for i in range(r))
    cpres = " + ".join(f"CASE WHEN c_{j} > 0 THEN 1 ELSE 0 END"
                       for j in range(c))
    return (
        f"WITH p AS (SELECT {cells} FROM {table} WHERE {where}), "
        f"m AS (SELECT *, {margins} FROM p), "
        f"v AS (SELECT *, ({ntot})::BIGINT AS n, "
        f"({rpres})::BIGINT AS rp, ({cpres})::BIGINT AS cp FROM m), "
        f"w AS (SELECT n, rp, cp, CASE WHEN n > 0 AND rp >= 2 AND cp >= 2 "
        f"THEN {acc} END AS chi2 FROM v) "
        f"SELECT n, ROUND(chi2, 6) AS chi2, "
        f"ROUND(CASE WHEN chi2 IS NOT NULL THEN sqrt(chi2 / "
        f"(CAST(n AS DOUBLE) * CAST(LEAST(rp - 1, cp - 1) AS DOUBLE))) "
        f"END, 6) AS v FROM w"
    )


def chatterjee_xi_by_group(ds, group_col: str, x_col: str, y_col: str,
                           tiebreak_cols=()):
    """Per-group Chatterjee rank correlation xi(x -> y) (Chatterjee 2021's
    non-linear dependence coefficient, ~0 for independence, ~1 when y is a
    measurable function of x), the general tie-aware form: with rows
    ordered by ``(x, tiebreaks)`` inside the group,

        ``xi = 1 - n * sum_i |r_{i+1} - r_i| / (2 * sum_i l_i (n - l_i))``

    where ``r_i = #{j: y_j <= y_i}`` and ``l_i = #{j: y_j >= y_i}``. Both
    sums are exact int64 (the spearman_by_group lesson-24 family); the
    only float step is the single division (+1 -) of integer-derived
    doubles — bit-identical cross-engine. ``num`` / ``den`` are emitted
    for hash-exact certification; xi is NULL when the denominator is 0
    (constant y or n = 1). Null x/y pairs are dropped (SQL pair
    semantics). Ties in x make xi order-dependent — pass unique
    ``tiebreak_cols`` for a deterministic result (the SQL mirror's ORDER
    BY). Raises when a group's n^3 leaves the float64-exact integer range.

    Scale plan: ONE group sort-shuffle, two in-block lexsorts (y-rank
    runs, x-order scan) — ranks need the whole group co-located."""
    from kamae_ray.stages.window import sorted_block_apply

    tiebreak_cols = list(tiebreak_cols)

    def _num(block, col):
        arr = A.as_array(block.column(col))
        t = pa.int64() if pa.types.is_integer(arr.type) else pa.float64()
        return pc.cast(arr, t, safe=False).to_numpy(zero_copy_only=False)

    def fold(block: pa.Table) -> pa.Table:
        ok = pc.and_kleene(pc.is_valid(block.column(x_col)),
                           pc.is_valid(block.column(y_col)))
        block = block.filter(pc.fill_null(ok, False))
        n = block.num_rows
        if n == 0:
            return pa.table({
                group_col: block.column(group_col),
                "n": pa.array([], pa.int64()),
                "num": pa.array([], pa.int64()),
                "den": pa.array([], pa.int64()),
                "xi": pa.array([], pa.float64()),
            })
        gids = S.group_ids(block, [group_col])
        g_order = np.argsort(gids, kind="stable")
        starts, lens = S.segments(gids[g_order])
        if float(lens.max()) ** 3 >= 2.0**53:
            raise ValueError("chatterjee_xi_by_group: a group's n^3 leaves "
                             "the float64-exact range — shard or sample")
        ng = np.empty(n, np.int64)
        ng[g_order] = np.repeat(lens.astype(np.int64), lens)
        # r = max rank (count <=), minr -> l = n - minr + 1, over y runs
        y = _num(block, y_col)
        yo = np.lexsort((y, gids))
        gs, vs = gids[yo], y[yo]
        st, ln = S.segments(gs)
        pos = (np.arange(n, dtype=np.int64) - np.repeat(st, ln)) + 1
        new = np.concatenate([[True], (gs[1:] != gs[:-1]) | (vs[1:] != vs[:-1])])
        rst = np.nonzero(new)[0]
        rln = np.diff(np.concatenate([rst, [n]]))
        rend = rst + rln - 1
        r = np.empty(n, np.int64)
        r[yo] = np.repeat(pos[rend], rln)
        minr = np.empty(n, np.int64)
        minr[yo] = np.repeat(pos[rst], rln)
        l = ng - minr + 1
        # scan in (group, x, tiebreaks) order
        keys = [_num(block, c) if not pa.types.is_string(
                    A.as_array(block.column(c)).type)
                else A.as_array(block.column(c)).to_numpy(zero_copy_only=False)
                for c in tiebreak_cols]
        xo = np.lexsort(tuple(reversed(keys)) + (_num(block, x_col), gids))
        gx, rx = gids[xo], r[xo]
        d = np.abs(np.diff(rx))
        d[gx[1:] != gx[:-1]] = 0
        dpad = np.concatenate([[0], d])
        dpad[starts] = 0
        sd = np.add.reduceat(dpad, starts).astype(np.int64)
        lg = l[g_order]
        sl = np.add.reduceat(lg * (ng[g_order] - lg), starts).astype(np.int64)
        nseg = lens.astype(np.int64)
        num = nseg * sd
        den = 2 * sl
        with np.errstate(invalid="ignore", divide="ignore"):
            xi = 1.0 - num.astype(np.float64) / np.where(den == 0, 1.0,
                                                         den.astype(np.float64))
        firsts = g_order[starts]
        return pa.table({
            group_col: A.as_array(block.column(group_col)).take(pa.array(firsts)),
            "n": pa.array(nseg),
            "num": pa.array(num), "den": pa.array(den),
            "xi": pa.array(xi, pa.float64(), mask=den == 0),
        })

    if isinstance(ds, pa.Table):
        return fold(ds)
    return sorted_block_apply(ds, [group_col], fold, "chatterjee_fold")


def grouped_power_means(ds, group_cols, value_col: str):
    """Geometric and harmonic means per group over POSITIVE integer values
    (zero/negative/null rows dropped — log/reciprocal domain, SQL WHERE
    mirror), both in engine-exact forms:

    - geometric: each ``ln(v)`` quantizes to micro-ln int64 (libm ln +
      half-away — bit-identical cross-engine), so the group sum is exact
      and ``exp((S/1e6)/n)`` is one fixed IEEE chain (pc.exp == DuckDB exp,
      lesson 38 class).
    - harmonic: reciprocals as exact integers ``1e12 // v`` (floor), so the
      group sum is exact int64 and ``(n * 1e12) / S`` is ONE division.

    Output: group cols, ``n, gmean, hmean``. One partial-agg exchange; the
    final sums are guarded < 2^53 (the float64 agg path is lossless below
    it)."""
    from kamae_ray.stages.aggregate import groupby_agg

    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)

    def prep(t: pa.Table) -> pa.Table:
        v = pc.cast(A.as_array(t.column(value_col)), pa.int64(), safe=False)
        cols = {k: t.column(k) for k in group_cols}
        vn = v.to_numpy(zero_copy_only=False)
        ok_np = np.asarray(pc.is_valid(v).to_numpy(zero_copy_only=False)) & (
            np.nan_to_num(vn, nan=0) > 0) if v.null_count else (vn > 0)
        vv = np.where(ok_np, vn, 1)
        lnm = np.floor(A.libm_log(vv.astype(np.float64)) * 1_000_000.0 + 0.5) \
            .astype(np.int64)
        rec = np.int64(1_000_000_000_000) // vv
        cols["__one"] = pa.array(np.ones(t.num_rows, np.int64))
        cols["__lnm"] = pa.array(lnm, pa.int64())
        cols["__rec"] = pa.array(rec, pa.int64())
        return pa.table(cols).filter(pa.array(ok_np))

    prep.__name__ = "pmean_prep"
    aggs = {"__one": ["sum"], "__lnm": ["sum"], "__rec": ["sum"]}
    if isinstance(ds, pa.Table):
        agg = groupby_agg(prep(ds), group_cols, aggs)
    else:
        keyed = ds.map_batches(prep, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=None)
        agg = groupby_agg(keyed, group_cols, aggs)

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("__one_sum").to_numpy(zero_copy_only=False)
        sln = t.column("__lnm_sum").to_numpy(zero_copy_only=False)
        srec = t.column("__rec_sum").to_numpy(zero_copy_only=False)
        for v in (sln, srec):
            if len(v) and np.abs(v).max(initial=0) >= (1 << 53):
                raise ValueError("grouped_power_means: sum exceeds 2^53 — "
                                 "the float64 agg path is no longer exact")
        gmean = pc.exp(pa.array((sln / 1_000_000.0) / n, pa.float64()))
        hmean = pa.array((n * 1_000_000_000_000.0) / srec, pa.float64())
        out = {k: t.column(k) for k in group_cols}
        out["n"] = pa.array(n.astype(np.int64), pa.int64())
        out["gmean"] = gmean
        out["hmean"] = hmean
        return pa.table(out)

    finish.__name__ = "pmean_finish"
    if isinstance(agg, pa.Table):
        return finish(agg)
    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)


def theil_index_by_group(ds, group_cols, value_col: str):
    """Theil T inequality index per group over POSITIVE integer values:
    ``T = (1/n) * sum((x/mu) * ln(x/mu))`` — the entropy-based inequality
    measure complementing Gini. Engine-exact despite the transcendental:
    ``mu = S/n`` is ONE division of exact ints, each row term
    ``(x/mu) * ln(x/mu)`` (libm ln, IEEE ops) quantizes half-away to
    micro-units int64, so the cross-row sum is ORDER-FREE exact (the
    Kaplan-Meier/logloss family) and the close is one fixed float chain.
    Zero/negative/null values are dropped (WHERE mirror). Output:
    group cols, ``n, theil``.

    Scale plan: pass 1 = one partial-agg exchange for (n, S) per group;
    the O(groups) mean table broadcasts back (never a shuffle join); pass 2
    = one more partial-agg exchange over the quantized terms."""
    from kamae_ray.stages.aggregate import groupby_agg
    from kamae_ray.stages.join import broadcast_join

    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)

    def clean(t: pa.Table) -> pa.Table:
        v = pc.cast(A.as_array(t.column(value_col)), pa.int64(), safe=False)
        cols = {k: t.column(k) for k in group_cols}
        cols["__v"] = v
        cols["__one"] = pa.array(np.ones(t.num_rows, np.int64))
        vn = v.to_numpy(zero_copy_only=False)
        ok = np.asarray(pc.is_valid(v).to_numpy(zero_copy_only=False)) & (
            np.nan_to_num(vn, nan=0) > 0) if v.null_count else (vn > 0)
        return pa.table(cols).filter(pa.array(ok))

    clean.__name__ = "theil_clean"
    if isinstance(ds, pa.Table):
        base = clean(ds)
        agg = groupby_agg(base, group_cols, {"__v": ["sum"], "__one": ["sum"]})
    else:
        base = ds.map_batches(clean, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None).materialize()
        agg_ds = groupby_agg(base, group_cols, {"__v": ["sum"], "__one": ["sum"]})
        from kamae_ray.base import collect_tables

        agg = pa.concat_tables(collect_tables(agg_ds)).combine_chunks()
    s = agg.column("__v_sum").to_numpy(zero_copy_only=False)
    n = agg.column("__one_sum").to_numpy(zero_copy_only=False)
    if len(s) and np.abs(s).max(initial=0) >= (1 << 53):
        raise ValueError("theil_index_by_group: group sum exceeds 2^53")
    means = pa.table({**{k: agg.column(k) for k in group_cols},
                      "__mu": pa.array(s / n, pa.float64()),
                      "__n": pa.array(n.astype(np.int64), pa.int64())})

    def terms(t: pa.Table) -> pa.Table:
        v = t.column("__v").to_numpy(zero_copy_only=False).astype(np.float64)
        mu = t.column("__mu").to_numpy(zero_copy_only=False)
        r = v / mu
        term = r * A.libm_log(r)
        q = np.where(term >= 0, np.floor(term * 1_000_000.0 + 0.5),
                     np.ceil(term * 1_000_000.0 - 0.5)).astype(np.int64)
        cols = {k: t.column(k) for k in group_cols}
        cols["__term"] = pa.array(q, pa.int64())
        cols["__n"] = t.column("__n")
        return pa.table(cols)

    terms.__name__ = "theil_terms"

    def finish(t: pa.Table) -> pa.Table:
        ts_ = t.column("__term_sum").to_numpy(zero_copy_only=False)
        nn = t.column("__n_max").to_numpy(zero_copy_only=False)
        if len(ts_) and np.abs(ts_).max(initial=0) >= (1 << 53):
            raise ValueError("theil_index_by_group: term sum exceeds 2^53")
        out = {k: t.column(k) for k in group_cols}
        out["n"] = pa.array(nn.astype(np.int64), pa.int64())
        out["theil"] = pa.array((ts_ / 1_000_000.0) / nn, pa.float64())
        return pa.table(out)

    finish.__name__ = "theil_finish"
    if isinstance(ds, pa.Table):
        joined = broadcast_join(base, means, on=group_cols, how="inner")
        tt = terms(joined)
        agg2 = groupby_agg(tt, group_cols, {"__term": ["sum"], "__n": ["max"]})
        return finish(agg2)
    joined = broadcast_join(base, means, on=group_cols, how="inner")
    tt = joined.map_batches(terms, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=None)
    agg2 = groupby_agg(tt, group_cols, {"__term": ["sum"], "__n": ["max"]})
    return agg2.map_batches(finish, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=None)


def lorenz_points_by_group(ds, group_cols, value_col: str, points: int = 10):
    """Lorenz-curve sample points per group over non-negative integer
    values — the Gini index's visualization table: for k = 1..points, the
    cumulative value share (exact integer ppm, ``1e6 * cum_k // total``)
    held by the poorest ``floor(k * n / points)`` rows (value-ascending,
    ties broken by arrival after ONE in-block lexsort — share values are
    tie-invariant because equal values contribute equally). Output: group
    cols, ``k, n_rows, cum_ppm``. Null/negative values are dropped (SQL
    WHERE mirror).

    Scale plan: ONE group sort-shuffle, an in-block cumsum + one gather at
    the point positions — rows never leave their block twice."""
    from kamae_ray.stages.window import sorted_block_apply

    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)

    def clean(t: pa.Table) -> pa.Table:
        v = pc.cast(A.as_array(t.column(value_col)), pa.int64(), safe=False)
        cols = {k: t.column(k) for k in group_cols}
        cols["__v"] = v
        vn = v.to_numpy(zero_copy_only=False)
        ok = (np.asarray(pc.is_valid(v).to_numpy(zero_copy_only=False))
              & (np.nan_to_num(vn, nan=-1) >= 0)) if v.null_count else (vn >= 0)
        return pa.table(cols).filter(pa.array(ok))

    clean.__name__ = "lorenz_clean"

    def kern(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            out = {g: block.column(g) for g in group_cols}
            out.update({"k": pa.array([], pa.int64()),
                        "n_rows": pa.array([], pa.int64()),
                        "cum_ppm": pa.array([], pa.int64())})
            return pa.table(out)
        gids = S.group_ids(block, group_cols)
        v = block.column("__v").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, gids))
        gs, vs = gids[order], v[order]
        starts, lens = S.segments(gs)
        cs = np.cumsum(vs)
        base = np.repeat(cs[starts] - vs[starts], lens)
        cum = cs - base  # inclusive within-group prefix
        tot = np.repeat(cum[starts + lens - 1], len(starts)) if False else cum[starts + lens - 1]
        if np.abs(cs).max(initial=0) >= (1 << 53):
            raise ValueError("lorenz_points_by_group: cumsum exceeds 2^53")
        ks = np.tile(np.arange(1, points + 1, dtype=np.int64), len(starts))
        grp = np.repeat(np.arange(len(starts)), points)
        n_g = lens[grp]
        pos = (ks * n_g) // points  # rows included at point k
        # cumulative value at position pos (0 -> 0)
        idx = starts[grp] + np.maximum(pos - 1, 0)
        cv = np.where(pos > 0, cum[idx], 0)
        totg = tot[grp]
        ppm = np.where(totg > 0, (1_000_000 * cv) // np.maximum(totg, 1), 0)
        firsts = order[starts]
        out = {g: A.as_array(block.column(g)).take(pa.array(firsts[grp]))
               for g in group_cols}
        out["k"] = pa.array(ks, pa.int64())
        out["n_rows"] = pa.array(n_g.astype(np.int64), pa.int64())
        out["cum_ppm"] = pa.array(ppm.astype(np.int64), pa.int64())
        return pa.table(out)

    if isinstance(ds, pa.Table):
        return kern(clean(ds))
    cleaned = ds.map_batches(clean, batch_format="pyarrow", zero_copy_batch=True,
                             batch_size=None)
    return sorted_block_apply(cleaned, group_cols, kern, "lorenz_points")
