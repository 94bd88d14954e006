"""Model / ranking evaluation metrics at corpus scale — the offline-eval
family that sits next to training-data prep: per-query ranking metrics
(DCG/NDCG/MRR/precision/recall@k), thresholded confusion matrices per
slice, the two-sample Kolmogorov-Smirnov statistic, and cumulative
gain/lift tables.

Exactness discipline (the repo invariant): every statistic is either a
pure int64 count, a single IEEE division of two exact integers, or a
fixed-order float expression whose every transcendental routes through
``functions/arrays.libm_log`` so the DuckDB oracle reproduces it
bit-for-bit (CLAUDE lesson 38).

Scale plan per op is documented on the function; none of them ever
materializes the input — confusion/KS/lift reduce to per-distinct-value
or per-group partials, ranking_metrics is ONE query-key sort plus a
vectorized segment kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kamae_ray.functions import arrays as A
from kamae_ray.functions import segments as S

_BIG = np.int64(1) << np.int64(62)


def _dcg_constants(k: int) -> np.ndarray:
    """c_r = ln(2)/ln(r+1) for ranks r=1..k, every term a libm ln and one
    IEEE division — bit-identical to the SQL ``ln(CAST(2 AS DOUBLE)) /
    ln(CAST(r+1 AS DOUBLE))`` the oracle generator emits."""
    ln = A.libm_log(np.arange(2.0, k + 2.0))
    ln2 = A.libm_log(np.array([2.0]))[0]
    return ln2 / ln


def ranking_dcg_sql(k: int, rel_expr: str, rank_col: str) -> str:
    """The oracle-side DCG@k expression GENERATED from the same constants
    as the engine kernel: a left-associative sum of
    ``COALESCE(MAX(CASE WHEN rank=r THEN rel END), 0) * (ln(2)/ln(r+1))``
    terms — the engine accumulates in the identical left-to-right order, so
    the float result is bit-identical (shared-constants oracle pattern)."""
    terms = [
        f"COALESCE(MAX(CASE WHEN {rank_col} = {r} THEN {rel_expr} END), 0)::DOUBLE"
        f" * (ln(CAST(2 AS DOUBLE)) / ln(CAST({r + 1} AS DOUBLE)))"
        for r in range(1, k + 1)
    ]
    return " + ".join(terms)


def ranking_ap_sql(k: int, rel_expr: str, rank_col: str, cumhits_col: str) -> str:
    """The oracle-side average-precision@k numerator GENERATED to match the
    engine kernel term-for-term: a left-associative sum of
    ``COALESCE(MAX(CASE WHEN rank=r AND rel>0 THEN cumhits END), 0) / r``
    terms — each term is one exact-int-over-int division, so the only float
    sensitivity is the accumulation order, which is shared."""
    terms = [
        f"COALESCE(MAX(CASE WHEN {rank_col} = {r} AND {rel_expr} > 0 "
        f"THEN {cumhits_col} END), 0)::DOUBLE / CAST({r} AS DOUBLE)"
        for r in range(1, k + 1)
    ]
    return " + ".join(terms)


def ranking_metrics(ds, query_col: str, order_cols: list[str], rel_col: str,
                    k: int = 10):
    """Per-query ranking-evaluation metrics over a (query, rank-order,
    integer relevance) table: n, total_rel, hits@k, precision@k, recall@k,
    reciprocal rank@k, average precision@k, DCG@k, IDCG@k, NDCG@k — one
    output row per query
    (per-query rows on purpose: a global mean would be a cross-query float
    sum whose accumulation order differs between engines; averaging the
    bounded per-query table is the caller's one driver step).

    ``order_cols`` must define a TOTAL order within each query (include a
    unique tiebreak column); rank is the 1-based position in that order.
    ``rel_col`` is a non-negative integer (graded) relevance.

    Exactness: hits/totals are int64; precision/recall/RR are single
    divisions; DCG/IDCG are fixed-order dot products against
    ``ln(2)/ln(r+1)`` constants (libm via pyarrow — lesson 38), accumulated
    left-to-right exactly as the generated SQL (:func:`ranking_dcg_sql`);
    IDCG orders by (rel DESC, rank ASC) — mirrored by the oracle's
    row_number tiebreak. NDCG is one division, null when IDCG=0; RR@k is
    0.0 (not null) when no relevant item ranks <= k — the MRR convention.

    Scale plan: ONE distributed sort on the query key (the only exchange),
    then a fully vectorized block kernel (intra-query ordering via Arrow
    sort_indices, segment scatter into an (n_queries x k) matrix). Ranking
    semantics per reference listwise family (ListRankTransformer,
    /root/reference/src/kamae/spark/transformers/list_rank.py — here as an
    eval aggregate rather than a feature)."""
    from kamae_ray.stages.window import sorted_block_apply

    if k <= 0 or k > 1024:
        raise ValueError("k must be in [1, 1024]")
    C = _dcg_constants(k)

    def fold(block: pa.Table) -> pa.Table:
        empty = pa.table({
            query_col: pa.array([], block.schema.field(query_col).type),
            "n": pa.array([], pa.int64()),
            "total_rel": pa.array([], pa.int64()),
            "hits_k": pa.array([], pa.int64()),
            "prec_k": pa.array([], pa.float64()),
            "recall_k": pa.array([], pa.float64()),
            "rr_k": pa.array([], pa.float64()),
            "ap_k": pa.array([], pa.float64()),
            "dcg_k": pa.array([], pa.float64()),
            "idcg_k": pa.array([], pa.float64()),
            "ndcg_k": pa.array([], pa.float64()),
        })
        if block.num_rows == 0:
            return empty
        keys = [(query_col, "ascending")] + [(c, "ascending") for c in order_cols]
        block = block.take(pc.sort_indices(block, sort_keys=keys))
        gids = S.group_ids(block, [query_col])
        starts, lens = S.segments(gids)
        nseg = len(starts)
        if nseg * k > (1 << 27):
            raise ValueError("ranking_metrics: the per-block (queries x k) "
                             "scatter matrix exceeds 1 GiB — lower k or "
                             "repartition to smaller blocks")
        srep = S.starts_rep(starts, lens)
        r = (np.arange(block.num_rows, dtype=np.int64) - srep) + 1
        rel = pc.cast(A.as_array(block.column(rel_col)), pa.int64(),
                      safe=False).to_numpy(zero_copy_only=False)
        if len(rel) and rel.min() < 0:
            raise ValueError("ranking_metrics relevance must be >= 0")
        seg_idx = np.repeat(np.arange(nseg, dtype=np.int64), lens)
        relpos = (rel > 0).astype(np.int64)
        topk = r <= k

        n = lens.astype(np.int64)
        total_rel = np.add.reduceat(relpos, starts).astype(np.int64)
        hits = np.add.reduceat(relpos * topk, starts).astype(np.int64)
        cand = np.where((relpos > 0) & topk, r, _BIG)
        frank = np.minimum.reduceat(cand, starts)

        # rank-indexed relevance matrix (zeros beyond each query's length)
        h = np.zeros((nseg, k), dtype=np.float64)
        m = topk
        h[seg_idx[m], r[m] - 1] = rel[m]
        # ideal order: rel DESC then rank ASC inside each query
        ordd = np.lexsort((r, -rel, gids))
        hd = np.zeros((nseg, k), dtype=np.float64)
        hd[seg_idx[m], r[m] - 1] = rel[ordd][m]

        # left-to-right accumulation, same association as the generated SQL
        b = (h > 0).astype(np.int64)
        ch = np.cumsum(b, axis=1)
        dcg = h[:, 0] * C[0]
        idcg = hd[:, 0] * C[0]
        ap = (b[:, 0] * ch[:, 0]).astype(np.float64) / 1.0
        for j in range(1, k):
            dcg = dcg + h[:, j] * C[j]
            idcg = idcg + hd[:, j] * C[j]
            ap = ap + (b[:, j] * ch[:, j]).astype(np.float64) / float(j + 1)

        prec = hits / float(k)
        with np.errstate(invalid="ignore", divide="ignore"):
            recall = np.where(total_rel > 0,
                              hits / np.where(total_rel == 0, 1, total_rel), np.nan)
            rr = np.where(frank < _BIG, 1.0 / np.where(frank == 0, 1, frank), 0.0)
            ndcg = np.where(idcg > 0, dcg / np.where(idcg == 0, 1.0, idcg), np.nan)
            ap_den = np.minimum(total_rel, k)
            ap_k = np.where(total_rel > 0,
                            ap / np.where(ap_den == 0, 1, ap_den), np.nan)
        return pa.table({
            query_col: A.as_array(block.column(query_col)).take(pa.array(starts)),
            "n": pa.array(n),
            "total_rel": pa.array(total_rel),
            "hits_k": pa.array(hits),
            "prec_k": pa.array(prec, pa.float64()),
            "recall_k": pa.array(recall, pa.float64(), mask=~(total_rel > 0)),
            "rr_k": pa.array(rr, pa.float64()),
            "ap_k": pa.array(ap_k, pa.float64(), mask=~(total_rel > 0)),
            "dcg_k": pa.array(dcg, pa.float64()),
            "idcg_k": pa.array(idcg, pa.float64()),
            "ndcg_k": pa.array(ndcg, pa.float64(), mask=~(idcg > 0)),
        })

    if isinstance(ds, pa.Table):
        return fold(ds)
    return sorted_block_apply(ds, [query_col], fold, "ranking_metrics_fold")


def confusion_by_group(ds, group_col: str, score_col: str, label_col: str,
                       threshold):
    """Thresholded binary confusion matrix per slice: exact int64
    tp/fp/fn/tn counts (prediction = ``score >= threshold``), plus
    accuracy, precision, recall and F1, each ONE double division of exact
    integers (F1 = 2*tp / (2*tp + fp + fn) — the algebraic form with a
    single division, mirrored verbatim by the oracle; null when the
    denominator is 0).

    Scale plan: a derived-indicator map + ONE partial-agg groupby on the
    slice key; nothing else moves. Output is one row per group."""
    from kamae_ray.stages.aggregate import groupby_agg

    def prep(block: pa.Table) -> pa.Table:
        s = A.as_array(block.column(score_col))
        y = pc.cast(A.as_array(block.column(label_col)), pa.int64(), safe=False)
        ok = pc.and_(pc.is_valid(s), pc.is_valid(y))
        pred = pc.cast(pc.greater_equal(s, threshold), pa.int64())
        t = pa.table({
            "g": A.as_array(block.column(group_col)),
            "tp": pc.multiply(pred, y),
            "fp": pc.multiply(pred, pc.subtract(pa.scalar(1, pa.int64()), y)),
            "fn": pc.multiply(pc.subtract(pa.scalar(1, pa.int64()), pred), y),
            "tn": pc.multiply(pc.subtract(pa.scalar(1, pa.int64()), pred),
                              pc.subtract(pa.scalar(1, pa.int64()), y)),
        }).filter(ok)
        yv = t.column("tp").to_numpy(zero_copy_only=False) + \
            t.column("fn").to_numpy(zero_copy_only=False)
        if len(yv) and ((yv < 0) | (yv > 1)).any():
            raise ValueError("confusion_by_group label must be a 0/1 integer column")
        return t

    prep.__name__ = "confusion_indicators"

    def finish(stats: pa.Table) -> pa.Table:
        def col(name):
            v = pc.cast(stats.column(f"{name}_sum"), pa.float64(),
                        safe=False).to_numpy(zero_copy_only=False)
            if len(v) and np.abs(v).max() >= 2.0**53:
                raise ValueError("confusion counts exceed exact float64 range")
            return v.astype(np.int64)

        tp, fp, fn, tn = col("tp"), col("fp"), col("fn"), col("tn")
        n = tp + fp + fn + tn
        with np.errstate(invalid="ignore", divide="ignore"):
            acc = np.where(n > 0, (tp + tn) / np.where(n == 0, 1, n), np.nan)
            prec = np.where(tp + fp > 0, tp / np.where(tp + fp == 0, 1, tp + fp), np.nan)
            rec = np.where(tp + fn > 0, tp / np.where(tp + fn == 0, 1, tp + fn), np.nan)
            d = 2 * tp + fp + fn
            f1 = np.where(d > 0, (2 * tp) / np.where(d == 0, 1, d), np.nan)
        return pa.table({
            group_col: stats.column("g"),
            "tp": pa.array(tp), "fp": pa.array(fp),
            "fn": pa.array(fn), "tn": pa.array(tn),
            "accuracy": pa.array(acc, pa.float64(), mask=~(n > 0)),
            "precision": pa.array(prec, pa.float64(), mask=~(tp + fp > 0)),
            "recall": pa.array(rec, pa.float64(), mask=~(tp + fn > 0)),
            "f1": pa.array(f1, pa.float64(), mask=~(d > 0)),
        })

    aggs = {c: ["sum"] for c in ("tp", "fp", "fn", "tn")}
    if isinstance(ds, pa.Table):
        return finish(groupby_agg(prep(ds), "g", aggs))
    keyed = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=None)
    stats = groupby_agg(keyed, "g", aggs)
    finish.__name__ = "confusion_finish"
    return stats.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True,
                             batch_size=None)


def ks_statistic(ds, value_col: str, group_col: str, group_a, group_b,
                 driver_budget: int = 5_000_000):
    """EXACT two-sample Kolmogorov-Smirnov statistic between the rows of
    two groups over an INTEGER value column (quantize floats to fixed-point
    first — the repo's integer-score discipline). The sup-distance is
    evaluated in pure int64 by cross-multiplying the two empirical CDFs:

        d_num = max over distinct v of | cum_a(v) * n_b  -  cum_b(v) * n_a |
        ks    = d_num / (n_a * n_b)          (ONE double division)

    Returns a 1-row table (d_num, n_a, n_b, ks). Raises when n_a * n_b
    would leave int64 (~3e9 rows a side — shard or subsample beyond that).

    Scale plan: ONE partial-agg groupby builds the distinct-value
    (cnt_a, cnt_b) table. Under ``driver_budget`` distinct values the CDF
    fold is a driver numpy pass; above it, both running counts ride ONE
    ``global_cumsum`` exchange (the two counts packed into a single int64
    word — exact while each side stays < 2^30 rows, so the packed running
    sum cum_a * 2^32 + cum_b never leaves int64), then per-block max
    partials and an O(blocks) driver max. Both paths are exact integers
    (asserted equal in tests)."""
    from kamae_ray.base import collect_tables
    from kamae_ray.stages.aggregate import global_cumsum, groupby_agg
    from kamae_ray.state.aggregators import _project

    def prep(block: pa.Table) -> pa.Table:
        g = A.as_array(block.column(group_col))
        v = pc.cast(A.as_array(block.column(value_col)), pa.int64(), safe=False)
        is_a = pc.cast(pc.equal(g, group_a), pa.int64())
        is_b = pc.cast(pc.equal(g, group_b), pa.int64())
        keep = pc.and_(pc.is_valid(v),
                       pc.or_(pc.equal(is_a, 1), pc.equal(is_b, 1)))
        return pa.table({"v": v, "a": is_a, "b": is_b}).filter(keep)

    prep.__name__ = "ks_tag"

    def _result(d_num: int, na: int, nb: int):
        if na * nb >= 1 << 62:
            raise ValueError("n_a * n_b exceeds the exact int64 KS range")
        ks = (d_num / (na * nb)) if na and nb else float("nan")
        return pa.table({
            "d_num": pa.array([d_num], pa.int64()),
            "n_a": pa.array([na], pa.int64()),
            "n_b": pa.array([nb], pa.int64()),
            "ks": pa.array([ks], pa.float64()),
        })

    def _driver_fold(tbl: pa.Table):
        v = tbl.column("v").to_numpy(zero_copy_only=False)
        ca = tbl.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        cb = tbl.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(v, kind="stable")
        ca, cb = np.cumsum(ca[order]), np.cumsum(cb[order])
        na, nb = (int(ca[-1]), int(cb[-1])) if len(ca) else (0, 0)
        if not (na and nb):
            return _result(0, na, nb)
        d = np.abs(ca * nb - cb * na)
        return _result(int(d.max()), na, nb)

    if isinstance(ds, pa.Table):
        t = prep(ds)
        stats = groupby_agg(t, "v", {"a": ["sum"], "b": ["sum"]})
        return _driver_fold(pa.table({
            "v": stats.column("v"),
            "a": pc.cast(stats.column("a_sum"), pa.int64(), safe=False),
            "b": pc.cast(stats.column("b_sum"), pa.int64(), safe=False),
        }))

    proj = _project(ds, [value_col, group_col]) or ds
    keyed = proj.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True,
                             batch_size=None)
    stats = groupby_agg(keyed, "v", {"a": ["sum"], "b": ["sum"]}).materialize()
    if stats.count() <= driver_budget:
        parts = [t for t in collect_tables(stats) if t.num_rows]
        if not parts:
            return _result(0, 0, 0)
        tbl = pa.concat_tables(parts)
        return _driver_fold(pa.table({
            "v": tbl.column("v"),
            "a": pc.cast(tbl.column("a_sum"), pa.int64(), safe=False),
            "b": pc.cast(tbl.column("b_sum"), pa.int64(), safe=False),
        }))

    # distributed: pack both per-value counts into one int64 word so a
    # SINGLE global_cumsum carries both running CDFs (each < 2^31)
    def pack(block: pa.Table) -> pa.Table:
        a = pc.cast(block.column("a_sum"), pa.int64(), safe=False).to_numpy(zero_copy_only=False)
        b = pc.cast(block.column("b_sum"), pa.int64(), safe=False).to_numpy(zero_copy_only=False)
        return pa.table({
            "v": block.column("v"),
            "__ks_packed": pa.array(a * (np.int64(1) << np.int64(32)) + b),
            "a": pa.array(a), "b": pa.array(b),
        })

    pack.__name__ = "ks_pack"
    packed = stats.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True,
                               batch_size=None)
    totals = [t for t in collect_tables(
        packed.map_batches(
            lambda bl: pa.table({
                "a": pa.array([int(bl.column("a").to_numpy(zero_copy_only=False).sum())], pa.int64()),
                "b": pa.array([int(bl.column("b").to_numpy(zero_copy_only=False).sum())], pa.int64()),
            }), batch_format="pyarrow", zero_copy_batch=True, batch_size=None))
        if t.num_rows]
    na = sum(int(x) for t in totals for x in t.column("a").to_pylist())
    nb = sum(int(x) for t in totals for x in t.column("b").to_pylist())
    if not (na and nb):
        return _result(0, na, nb)
    if max(na, nb) >= 1 << 30:
        raise ValueError("packed KS path requires each side < 2^30 rows")
    packed = packed.materialize()  # consumed by the cumsum's two passes
    ranked = global_cumsum(packed, "v", "__ks_packed", out_col="__ks_cum",
                           exclusive=False)

    def block_max(block: pa.Table) -> pa.Table:
        cum = block.column("__ks_cum").to_numpy(zero_copy_only=False).astype(np.int64)
        ca = cum >> np.int64(32)
        cb = cum & ((np.int64(1) << np.int64(32)) - 1)
        d = np.abs(ca * np.int64(nb) - cb * np.int64(na))
        return pa.table({"d": pa.array([int(d.max()) if len(d) else 0], pa.int64())})

    block_max.__name__ = "ks_block_max"
    parts = [t for t in collect_tables(
        ranked.map_batches(block_max, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=None)) if t.num_rows]
    d_num = max((int(x) for t in parts for x in t.column("d").to_pylist()),
                default=0)
    return _result(d_num, na, nb)


def lift_table(ds, score_col: str, label_col: str, bins: int, max_score: int):
    """Cumulative gains / lift table over equal-width score buckets
    (descending from the top-score bucket — the classic model-targeting
    report): per-bucket exact int64 (n, pos), running cum_n / cum_pos, and

        gain = cum_pos / total_pos               (ONE double division)
        lift = (cum_pos * total_n) / (cum_n * total_pos)
                                                 (exact int64 products,
                                                  ONE double division)

    Scores are integers in [0, max_score) (quantize floats first). Output
    is a driver table sorted by bucket DESC — O(bins). Raises when an
    int64 product would overflow (rows ~> 3e9: use wider buckets or shard).

    Scale plan: one derived-bucket map + ONE partial-agg groupby, exactly
    :func:`calibration_bins`'s shape; the cumulative fold is O(bins) on the
    driver."""
    from kamae_ray.base import collect_tables
    from kamae_ray.stages.aggregate import groupby_agg
    from kamae_ray.state.aggregators import _project

    if bins <= 0 or max_score <= 0 or bins * max_score >= 1 << 62:
        raise ValueError("bins and max_score must be positive with bins*max_score < 2^62")

    def bucketize(block: pa.Table) -> pa.Table:
        s = pc.cast(A.as_array(block.column(score_col)), pa.int64(), safe=False)
        y = pc.cast(A.as_array(block.column(label_col)), pa.int64(), safe=False)
        ok = pc.and_(pc.is_valid(s), pc.is_valid(y))
        t = pa.table({"s": s, "y": y}).filter(ok)
        sv = t.column("s").to_numpy(zero_copy_only=False)
        if len(sv) and (sv.min() < 0 or sv.max() >= max_score):
            raise ValueError(f"scores outside [0, {max_score}) — raise max_score")
        b = sv * np.int64(bins) // np.int64(max_score)
        return pa.table({"bucket": pa.array(b, pa.int64()), "y": t.column("y")})

    bucketize.__name__ = "lift_bucketize"
    if isinstance(ds, pa.Table):
        stats = groupby_agg(bucketize(ds), "bucket", {"y": ["sum", "count"]})
    else:
        proj = _project(ds, [score_col, label_col]) or ds
        keyed = proj.map_batches(bucketize, batch_format="pyarrow",
                                 zero_copy_batch=True, batch_size=None)
        parts = [t for t in collect_tables(
            groupby_agg(keyed, "bucket", {"y": ["sum", "count"]})) if t.num_rows]
        stats = pa.concat_tables(parts) if parts else pa.table(
            {"bucket": pa.array([], pa.int64()),
             "y_sum": pa.array([], pa.float64()),
             "y_count": pa.array([], pa.int64())})
    stats = stats.sort_by([("bucket", "descending")])
    n = pc.cast(stats.column("y_count"), pa.int64()).to_numpy(zero_copy_only=False)
    pos_f = pc.cast(stats.column("y_sum"), pa.float64(), safe=False).to_numpy(zero_copy_only=False)
    if len(pos_f) and np.abs(pos_f).max() >= 2.0**53:
        raise ValueError("per-bucket sums exceed exact float64 range")
    pos = pos_f.astype(np.int64)
    if len(pos) and ((pos < 0) | (pos > n)).any():
        raise ValueError("lift_table label must be a 0/1 integer column")
    cum_n, cum_pos = np.cumsum(n), np.cumsum(pos)
    total_n = int(cum_n[-1]) if len(cum_n) else 0
    total_pos = int(cum_pos[-1]) if len(cum_pos) else 0
    if total_n and (total_n * total_n >= 1 << 62):
        raise ValueError("row count exceeds the exact int64 lift range")
    with np.errstate(invalid="ignore", divide="ignore"):
        gain = np.where(total_pos > 0, cum_pos / max(total_pos, 1), np.nan)
        lift = np.where((total_pos > 0) & (cum_n > 0),
                        (cum_pos * total_n) / np.where(cum_n * total_pos == 0, 1,
                                                       cum_n * total_pos), np.nan)
    return pa.table({
        "bucket": stats.column("bucket"),
        "n": pa.array(n), "pos": pa.array(pos),
        "cum_n": pa.array(cum_n.astype(np.int64)),
        "cum_pos": pa.array(cum_pos.astype(np.int64)),
        "gain": pa.array(gain, pa.float64(), mask=np.full(len(n), total_pos == 0)),
        "lift": pa.array(lift, pa.float64(),
                         mask=~((np.full(len(n), total_pos) > 0) & (cum_n > 0))),
    })


def ab_test_chi2(ds, exp_col: str, variant_col: str, success_col: str):
    """Per-experiment A/B readout: exact int64 2x2 cells (control/variant x
    success/failure), the two conversion rates (single divisions), and the
    chi-squared test statistic

        chi2 = N * (a*d - b*c)^2 / ((a+b) * (c+d) * (a+c) * (b+d))

    evaluated in a FIXED float expression order from the exact integer
    cells (the int -> double conversions and IEEE ops are deterministic, so
    the oracle's identical expression is bit-identical). ``variant_col``
    and ``success_col`` are 0/1 integers; null rows drop. chi2 is null when
    any margin is 0. Raises when a cell product a*d would leave int64
    (~2^31 rows per experiment).

    Scale plan: one indicator map + ONE partial-agg groupby on the
    experiment key; O(experiments) output."""
    from kamae_ray.stages.aggregate import groupby_agg

    def prep(block: pa.Table) -> pa.Table:
        v = pc.cast(A.as_array(block.column(variant_col)), pa.int64(), safe=False)
        y = pc.cast(A.as_array(block.column(success_col)), pa.int64(), safe=False)
        ok = pc.and_(pc.is_valid(v), pc.is_valid(y))
        t = pa.table({
            "e": A.as_array(block.column(exp_col)),
            "sa": pc.multiply(pc.subtract(pa.scalar(1, pa.int64()), v), y),
            "na": pc.subtract(pa.scalar(1, pa.int64()), v),
            "sb": pc.multiply(v, y),
            "nb": v,
        }).filter(ok)
        for c in ("na", "nb"):
            vv = t.column(c).to_numpy(zero_copy_only=False)
            if len(vv) and ((vv < 0) | (vv > 1)).any():
                raise ValueError("ab_test_chi2 variant must be a 0/1 integer column")
        return t

    prep.__name__ = "ab_indicators"

    def finish(stats: pa.Table) -> pa.Table:
        def col(name):
            v = pc.cast(stats.column(f"{name}_sum"), pa.float64(),
                        safe=False).to_numpy(zero_copy_only=False)
            if len(v) and np.abs(v).max() >= 2.0**53:
                raise ValueError("ab_test_chi2 counts exceed exact float64 range")
            return v.astype(np.int64)

        sa, na, sb, nb = col("sa"), col("na"), col("sb"), col("nb")
        if len(sa) and (((sa < 0) | (sa > na)) | ((sb < 0) | (sb > nb))).any():
            raise ValueError("ab_test_chi2 success must be a 0/1 integer column")
        a, b = sa, na - sa          # control success / failure
        c, d = sb, nb - sb          # variant success / failure
        if len(a) and (na.astype(np.float64) * nb.astype(np.float64)).max() >= 2.0**62:
            raise ValueError("ab_test_chi2: a cell product overflows int64")
        adbc = a * d - b * c
        n_tot = na + nb
        m1, m2, m3, m4 = a + b, c + d, a + c, b + d
        with np.errstate(invalid="ignore", divide="ignore"):
            rate_a = np.where(na > 0, a / np.where(na == 0, 1, na), np.nan)
            rate_b = np.where(nb > 0, c / np.where(nb == 0, 1, nb), np.nan)
            den = (m1.astype(np.float64) * m2.astype(np.float64)
                   * m3.astype(np.float64) * m4.astype(np.float64))
            num = n_tot.astype(np.float64) * (adbc.astype(np.float64)
                                              * adbc.astype(np.float64))
            chi2 = np.where(den > 0, num / np.where(den == 0, 1.0, den), np.nan)
        return pa.table({
            exp_col: stats.column("e"),
            "n_control": pa.array(na), "n_variant": pa.array(nb),
            "success_control": pa.array(sa), "success_variant": pa.array(sb),
            "rate_control": pa.array(rate_a, pa.float64(), mask=~(na > 0)),
            "rate_variant": pa.array(rate_b, pa.float64(), mask=~(nb > 0)),
            "chi2": pa.array(chi2, pa.float64(), mask=~(den > 0)),
        })

    aggs = {c: ["sum"] for c in ("sa", "na", "sb", "nb")}
    if isinstance(ds, pa.Table):
        return finish(groupby_agg(prep(ds), "e", aggs))
    keyed = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=None)
    finish.__name__ = "ab_finish"
    return groupby_agg(keyed, "e", aggs).map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def trimmed_mean_by_group(ds, group_col: str, value_col: str, trim_ppm: int):
    """Per-group symmetric trimmed mean of an INTEGER value column: drop
    the lowest and highest ``floor(n * trim_ppm / 1e6)`` observations, then
    the exact int64 sum of the survivors over their count — ONE double
    division. Tie-order invariant (equal values straddling the cut
    contribute the same sum whichever copies are dropped). Null values
    drop; groups trimmed to nothing emit null. Output: group, n, n_used,
    trimmed_sum (exact int64), trimmed_mean.

    Scale plan: ONE group sort-shuffle + an in-block lexsort, positional
    mask and reduceat — the gini_by_group shape."""
    from kamae_ray.stages.window import sorted_block_apply

    if not (0 <= trim_ppm < 500_000):
        raise ValueError("trim_ppm must be in [0, 500000)")

    def fold(block: pa.Table) -> pa.Table:
        block = block.filter(pc.is_valid(block.column(value_col)))
        n = block.num_rows
        if n == 0:
            return pa.table({
                group_col: block.column(group_col),
                "n": pa.array([], pa.int64()),
                "n_used": pa.array([], pa.int64()),
                "trimmed_sum": pa.array([], pa.int64()),
                "trimmed_mean": pa.array([], pa.float64()),
            })
        v = pc.cast(A.as_array(block.column(value_col)), pa.int64(),
                    safe=False).to_numpy(zero_copy_only=False)
        gids = S.group_ids(block, [group_col])
        order = np.lexsort((v, gids))
        gs, vs = gids[order], v[order]
        starts, lens = S.segments(gs)
        if len(vs) and float(np.abs(vs).max()) * float(lens.max()) >= 2.0**62:
            raise ValueError("trimmed_mean_by_group: group sum overflows int64")
        pos = (np.arange(n, dtype=np.int64) - np.repeat(starts, lens)) + 1
        nrep = np.repeat(lens.astype(np.int64), lens)
        krep = nrep * np.int64(trim_ppm) // np.int64(1_000_000)
        keep = (pos > krep) & (pos <= nrep - krep)
        tsum = np.add.reduceat(np.where(keep, vs, 0), starts).astype(np.int64)
        nseg = lens.astype(np.int64)
        k = nseg * np.int64(trim_ppm) // np.int64(1_000_000)
        used = nseg - 2 * k
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = np.where(used > 0, tsum.astype(np.float64)
                            / np.where(used == 0, 1, used).astype(np.float64),
                            np.nan)
        firsts = order[starts]
        return pa.table({
            group_col: A.as_array(block.column(group_col)).take(pa.array(firsts)),
            "n": pa.array(nseg),
            "n_used": pa.array(used),
            "trimmed_sum": pa.array(tsum),
            "trimmed_mean": pa.array(mean, pa.float64(), mask=~(used > 0)),
        })

    if isinstance(ds, pa.Table):
        return fold(ds)
    return sorted_block_apply(ds, [group_col], fold, "trimmed_mean_fold")


def logloss_by_group(ds, group_cols, logit_col: str, label_col: str,
                     logit_scale_bits: int = 20):
    """Per-group binary cross-entropy (log-loss) over integer fixed-point
    logits — the eval twin of :func:`confusion_by_group` for probabilistic
    scores. ``z = logit / 2^logit_scale_bits`` (division by a power of two:
    exact IEEE), ``p = 1/(1+exp(-z))`` (pyarrow's ``exp`` is bit-identical
    to DuckDB libm — verified 200k/200k like ``ln``, lesson 38), and each
    row's term ``-ln(p)`` / ``-ln(1-p)`` quantizes to exact int64
    MICRO-units (half-away ROUND — the certified cents-conversion pair), so
    the cross-row aggregation is an order-free INTEGER sum split into 2^20
    hi/lo partials (exact through the float64 agg path to ~2^73 totals —
    mirror with SUM(mu // 2^20)*2^20 + SUM(mu % 2^20); the q_pinball
    lesson). No float accumulation anywhere.

    Output per group: ``n`` (int64), ``ll_sum_ppm`` (int64 micro-logloss
    sum), ``mean_logloss`` (``(ll_sum_ppm / n) / 1e6``, one mirrored float
    chain). Labels must be 0/1 integers; |z| must stay < 36 (raises — past
    that ``1-p`` underflows to 0 and the term is infinite on both engines).

    Scale plan: one stateless vectorized map + ONE partial-agg groupby."""
    from kamae_ray.stages.aggregate import groupby_agg

    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    div = float(1 << logit_scale_bits)

    def per_row(batch: pa.Table) -> pa.Table:
        lq = pc.cast(A.as_array(batch.column(logit_col)), pa.int64(),
                     safe=False).to_numpy(zero_copy_only=False)
        y = pc.cast(A.as_array(batch.column(label_col)), pa.int64(),
                    safe=False).to_numpy(zero_copy_only=False)
        if len(y) and not np.isin(y, (0, 1)).all():
            raise ValueError("logloss_by_group labels must be 0/1")
        if len(lq) and int(np.abs(lq).max()) >= (1 << 53):
            raise ValueError("logit exceeds exact float64 range")
        z = lq.astype(np.float64) / div
        if len(z) and np.abs(z).max() >= 36.0:
            raise ValueError(
                "logloss_by_group |z| >= 36: 1-p underflows — raise "
                "logit_scale_bits to shrink the logits")
        s = 1.0 / (1.0 + pc.exp(pa.array(-z)).to_numpy(zero_copy_only=False))
        term = np.where(y == 1, -A.libm_log(s), -A.libm_log(1.0 - s))
        mu = pc.cast(pc.round(pa.array(term * 1_000_000.0), ndigits=0,
                              round_mode="half_towards_infinity"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        cols = {g: batch.column(g) for g in group_cols}
        # non-negative terms split into 2^20 hi/lo parts: each group sum
        # stays exact through the float64 agg path (the q_pinball lesson)
        cols["__hi"] = pa.array(mu >> 20)
        cols["__lo"] = pa.array(mu & np.int64((1 << 20) - 1))
        return pa.table(cols)

    per_row.__name__ = "logloss_micro_terms"
    if isinstance(ds, pa.Table):
        agg = groupby_agg(per_row(ds), group_cols,
                          {"__hi": ["sum", "count"], "__lo": ["sum"]})
    else:
        agg = groupby_agg(
            ds.map_batches(per_row, batch_format="pyarrow", zero_copy_batch=True),
            group_cols, {"__hi": ["sum", "count"], "__lo": ["sum"]})

    def finish(batch: pa.Table) -> pa.Table:
        hi = pc.cast(batch.column("__hi_sum"), pa.int64(), safe=False) \
            .to_numpy(zero_copy_only=False)
        lo = pc.cast(batch.column("__lo_sum"), pa.int64(), safe=False) \
            .to_numpy(zero_copy_only=False)
        su = (hi << 20) + lo
        n = pc.cast(batch.column("__hi_count"), pa.int64(), safe=False) \
            .to_numpy(zero_copy_only=False)
        mean = (su.astype(np.float64) / n) / 1_000_000.0
        cols = {g: batch.column(g) for g in group_cols}
        cols["n"] = pa.array(n)
        cols["ll_sum_ppm"] = pa.array(su)
        cols["mean_logloss"] = pa.array(mean, pa.float64())
        return pa.table(cols)

    finish.__name__ = "logloss_finish"
    if isinstance(agg, pa.Table):
        return finish(agg)
    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def km_curve(ds, group_cols, time_col: str, event_col: str):
    """Kaplan–Meier survival curve per group — time-to-event analysis at
    corpus scale (churn, time-to-purchase, document lifetime): one output
    row per distinct (group, time) with the at-risk count ``n``, events
    ``d``, censored ``c`` and the product-limit estimate

        ``S(t) = prod_{t_i <= t} (1 - d_i / n_i)``

    carried as ``km_logmu = cumsum(round(1e6 * ln((n-d)/n)))`` — each log
    factor quantizes to exact int64 MICRO-units (the certified half-away
    ROUND pair), so the cross-time accumulation is an order-free INTEGER
    sum; ``survival = exp(km_logmu / 1e6)`` is one mirrored exp (pc.exp ==
    DuckDB libm). Deterministic by construction (documented µ-precision KM
    — factors are exact to 1e-6 in log space). Once a time absorbs everyone
    at risk (d = n), ``survival`` is exactly 0.0 and ``km_logmu`` NULL from
    that time on. ``time_col`` int64 durations; ``event_col`` 0/1 (0 =
    censored). Null times/events are rejected.

    Scale plan: ONE partial-agg groupby to (group, time) cells, then a
    segment kernel over ONE sort of the cells (cells, never rows, move)."""
    from kamae_ray.stages.aggregate import groupby_agg
    from kamae_ray.stages.window import sorted_block_apply

    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)

    def prep(block: pa.Table) -> pa.Table:
        t = A.as_array(block.column(time_col))
        ev = A.as_array(block.column(event_col))
        if t.null_count or ev.null_count:
            raise ValueError("km_curve requires non-null time and event")
        y = pc.cast(ev, pa.int64(), safe=False).to_numpy(zero_copy_only=False)
        if len(y) and not np.isin(y, (0, 1)).all():
            raise ValueError("km_curve event must be 0/1")
        cols = {g: block.column(g) for g in group_cols}
        cols["__t"] = pc.cast(t, pa.int64(), safe=False)
        cols["__d"] = pa.array(y)
        cols["__c"] = pa.array(1 - y)
        return pa.table(cols)

    prep.__name__ = "km_cells_prep"
    tagged = prep(ds) if isinstance(ds, pa.Table) else ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    cells = groupby_agg(tagged, group_cols + ["__t"],
                        {"__d": ["sum"], "__c": ["sum"]})

    def fold(block: pa.Table) -> pa.Table:
        base = {g: A.as_array(block.column(g)) for g in group_cols}
        if block.num_rows == 0:
            out = dict(base)
            out["t"] = pa.array([], pa.int64())
            for c in ("n", "d", "c"):
                out[c] = pa.array([], pa.int64())
            out["km_logmu"] = pa.array([], pa.int64())
            out["survival"] = pa.array([], pa.float64())
            return pa.table(out)
        gids = S.group_ids(block, group_cols)
        t = pc.cast(A.as_array(block.column("__t")), pa.int64(),
                    safe=False).to_numpy(zero_copy_only=False)
        d = pc.cast(A.as_array(block.column("__d_sum")), pa.int64(),
                    safe=False).to_numpy(zero_copy_only=False)
        c = pc.cast(A.as_array(block.column("__c_sum")), pa.int64(),
                    safe=False).to_numpy(zero_copy_only=False)
        order = np.lexsort((t, gids))
        gs, ts, ds_, cs = gids[order], t[order], d[order], c[order]
        starts, lens = S.segments(gs)
        leave = ds_ + cs
        cum = np.cumsum(leave)
        base_off = cum[starts] - leave[starts]
        left_before = (cum - leave) - np.repeat(base_off, lens)
        tot = np.add.reduceat(leave, starts)
        n_at_risk = np.repeat(tot, lens) - left_before
        frac = (n_at_risk - ds_).astype(np.float64) / n_at_risk.astype(np.float64)
        with np.errstate(divide="ignore"):
            ln = A.libm_log(frac)
        absorbing = ds_ >= n_at_risk
        mu = np.zeros(len(ts), np.int64)
        fin = ~absorbing
        if fin.any():
            mu[fin] = pc.cast(pc.round(pa.array(ln[fin] * 1_000_000.0),
                                       ndigits=0,
                                       round_mode="half_towards_infinity"),
                              pa.int64()).to_numpy(zero_copy_only=False)
        cmu = np.cumsum(mu)
        cmu = cmu - np.repeat(cmu[starts] - mu[starts], lens)
        # absorbed at or after the first d == n row in the group
        ab_cum = np.cumsum(absorbing.astype(np.int64))
        ab_cum = ab_cum - np.repeat(
            ab_cum[starts] - absorbing[starts].astype(np.int64), lens)
        dead = ab_cum > 0
        surv = np.where(dead, 0.0,
                        pc.exp(pa.array(cmu.astype(np.float64) / 1_000_000.0))
                        .to_numpy(zero_copy_only=False))
        out = {g: base[g].take(pa.array(order)) for g in group_cols}
        out["t"] = pa.array(ts)
        out["n"] = pa.array(n_at_risk)
        out["d"] = pa.array(ds_)
        out["c"] = pa.array(cs)
        out["km_logmu"] = pa.array(cmu, pa.int64(), mask=dead)
        out["survival"] = pa.array(surv, pa.float64())
        return pa.table(out)

    if isinstance(cells, pa.Table):
        return fold(cells)
    return sorted_block_apply(cells, group_cols, fold, "km_fold")


def pinball_loss_by_group(ds, group_cols, actual_col: str, pred_col: str,
                          q_ppm: int = 500_000):
    """Per-group pinball (quantile) loss over INTEGER actual/prediction
    columns — the quantile-forecast eval metric, EXACT in int64 micro
    units: with ``e = actual - pred``,

        ``loss_mu = max(q_ppm * e, (q_ppm - 1_000_000) * e)``

    (both branches integer products; the max picks q*e for under-forecasts
    and (q-1)*e for over-forecasts). The non-negative loss splits into
    2^20 hi/lo parts so each group sum stays EXACT through the float64 agg
    path (totals to ~2^73 — mirror with SUM(mu // 2^20)*2^20 +
    SUM(mu % 2^20)); the mean is one mirrored float chain
    ``(sum::DOUBLE / n) / 1e6``. Rows with NULL actual or pred are
    excluded.

    Scale plan: one stateless map + ONE partial-agg groupby."""
    from kamae_ray.stages.aggregate import groupby_agg

    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    if not (0 < q_ppm < 1_000_000):
        raise ValueError("q_ppm must be in (0, 1e6)")

    def per_row(batch: pa.Table) -> pa.Table:
        a = A.as_array(batch.column(actual_col))
        p = A.as_array(batch.column(pred_col))
        keep = pc.and_(pc.is_valid(a), pc.is_valid(p))
        batch = batch.filter(keep)
        av = pc.cast(A.as_array(batch.column(actual_col)), pa.int64(),
                     safe=False).to_numpy(zero_copy_only=False)
        pv = pc.cast(A.as_array(batch.column(pred_col)), pa.int64(),
                     safe=False).to_numpy(zero_copy_only=False)
        e = av - pv
        if len(e) and int(np.abs(e).max()) >= 2**63 // 1_000_000:
            raise ValueError("pinball error exceeds exact int64 µ range")
        loss = np.maximum(q_ppm * e, (q_ppm - 1_000_000) * e)
        cols = {g: batch.column(g) for g in group_cols}
        # loss is non-negative; split into 2^20 hi/lo parts so each group
        # sum stays exact through the float64 agg path (sums to ~2^73)
        cols["__hi"] = pa.array(loss >> 20)
        cols["__lo"] = pa.array(loss & np.int64((1 << 20) - 1))
        return pa.table(cols)

    per_row.__name__ = "pinball_micro_terms"
    src = per_row(ds) if isinstance(ds, pa.Table) else ds.map_batches(
        per_row, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    agg = groupby_agg(src, group_cols, {"__hi": ["sum", "count"],
                                        "__lo": ["sum"]})

    def finish(batch: pa.Table) -> pa.Table:
        hi = pc.cast(batch.column("__hi_sum"), pa.int64(), safe=False) \
            .to_numpy(zero_copy_only=False)
        lo = pc.cast(batch.column("__lo_sum"), pa.int64(), safe=False) \
            .to_numpy(zero_copy_only=False)
        su = (hi << 20) + lo
        n = pc.cast(batch.column("__hi_count"), pa.int64(), safe=False) \
            .to_numpy(zero_copy_only=False)
        cols = {g: batch.column(g) for g in group_cols}
        cols["n"] = pa.array(n)
        cols["pinball_sum_mu"] = pa.array(su)
        cols["mean_pinball"] = pa.array(
            (su.astype(np.float64) / n) / 1_000_000.0, pa.float64())
        return pa.table(cols)

    finish.__name__ = "pinball_finish"
    if isinstance(agg, pa.Table):
        return finish(agg)
    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def binary_ap_by_group(ds, group_col: str, score_col: str, label_col: str,
                       id_col: str):
    """Per-group binary average precision (the PR-AUC estimator
    ``AP = mean over positives of precision@rank``) under the deterministic
    ``(score DESC, id ASC)`` order — each positive's precision term
    ``cum_pos/rank`` is an exact int-over-int division quantized to int64
    MICRO-units (half-away ROUND, the logloss/KM family), so the cross-row
    aggregation is an order-free integer sum:

        ``ap = (sum_mu / n_pos) / 1e6``   (NULL when a group has no positives)

    Integer scores and unique ids required (ties under equal scores break
    by id — mirror the full ORDER BY). Output: group, n, n_pos, ap_sum_mu,
    ap.

    Scale plan: ONE sort-shuffle on the group key + a segmented kernel."""
    from kamae_ray.stages.window import sorted_block_apply

    def kern(block: pa.Table) -> pa.Table:
        n = block.num_rows
        empty = pa.table({
            group_col: A.as_array(block.column(group_col)).slice(0, 0),
            "n": pa.array([], pa.int64()),
            "n_pos": pa.array([], pa.int64()),
            "ap_sum_mu": pa.array([], pa.int64()),
            "ap": pa.array([], pa.float64()),
        })
        if n == 0:
            return empty
        gids = S.group_ids(block, [group_col])
        s = pc.cast(A.as_array(block.column(score_col)), pa.int64(),
                    safe=False).to_numpy(zero_copy_only=False)
        y = pc.cast(A.as_array(block.column(label_col)), pa.int64(),
                    safe=False).to_numpy(zero_copy_only=False)
        if not np.isin(y, (0, 1)).all():
            raise ValueError("binary_ap_by_group labels must be 0/1")
        i = pc.cast(A.as_array(block.column(id_col)), pa.int64(),
                    safe=False).to_numpy(zero_copy_only=False)
        order = np.lexsort((i, -s, gids))
        gs, ys = gids[order], y[order]
        starts, lens = S.segments(gs)
        rnk = np.arange(n, dtype=np.int64) - np.repeat(starts, lens) + 1
        cum = np.cumsum(ys)
        cp = cum - np.repeat(cum[starts] - ys[starts], lens)
        term = 1_000_000.0 * (cp.astype(np.float64) / rnk.astype(np.float64))
        mu = pc.cast(pc.round(pa.array(term), ndigits=0,
                              round_mode="half_towards_infinity"),
                     pa.int64()).to_numpy(zero_copy_only=False)
        mu = np.where(ys == 1, mu, 0)
        ap_sum = np.add.reduceat(mu, starts).astype(np.int64)
        n_pos = np.add.reduceat(ys, starts).astype(np.int64)
        n_g = lens.astype(np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            ap = (ap_sum.astype(np.float64) / np.where(n_pos == 0, 1, n_pos)) \
                / 1_000_000.0
        firsts = order[starts]
        return pa.table({
            group_col: A.as_array(block.column(group_col)).take(pa.array(firsts)),
            "n": pa.array(n_g),
            "n_pos": pa.array(n_pos),
            "ap_sum_mu": pa.array(ap_sum),
            "ap": pa.array(ap, pa.float64(), mask=n_pos == 0),
        })

    if isinstance(ds, pa.Table):
        return kern(ds)
    return sorted_block_apply(ds, [group_col], kern, "binary_ap_fold")


def mcc_by_group(ds, group_col: str, score_col: str, label_col: str,
                 threshold):
    """Matthews correlation coefficient per slice — the balanced
    single-number summary of a thresholded binary confusion matrix
    (``confusion_by_group``'s chance-corrected sibling; the reference's
    eval layer stops at accuracy-family stats, so this extends it for
    imbalanced corpus labels):

        mcc = (tp*tn - fp*fn) /
              (sqrt(tp+fp) * sqrt(tp+fn) * sqrt(tn+fp) * sqrt(tn+fn))

    Exactness: tp/fp/fn/tn are exact int64 counts through ONE partial-agg
    groupby; the closing expression is a FIXED left-associative float chain
    over integer-derived doubles — products, subtraction, sqrt and division
    are all single correctly-rounded IEEE ops, so the mirrored SQL
    ``(tp::DOUBLE * tn - fp::DOUBLE * fn) / (sqrt(..)*sqrt(..)*..)`` is
    bit-identical at ANY magnitude (no 2^53 exactness requirement — both
    engines round the same way). ``mcc`` is NULL when any margin is 0.

    Scale plan: identical to confusion_by_group — one derived-indicator
    map + ONE groupby on the slice key; output is one row per group."""
    from kamae_ray.stages.aggregate import groupby_agg

    one = pa.scalar(1, pa.int64())

    def prep(block: pa.Table) -> pa.Table:
        s = A.as_array(block.column(score_col))
        y = pc.cast(A.as_array(block.column(label_col)), pa.int64(), safe=False)
        ok = pc.and_(pc.is_valid(s), pc.is_valid(y))
        yv = pc.cast(y, pa.int64(), safe=False).to_numpy(zero_copy_only=False)
        if len(yv) and not np.isin(yv[pc.is_valid(y).to_numpy(zero_copy_only=False)],
                                   (0, 1)).all():
            raise ValueError("mcc_by_group label must be a 0/1 integer column")
        pred = pc.cast(pc.greater_equal(s, threshold), pa.int64())
        return pa.table({
            "g": A.as_array(block.column(group_col)),
            "tp": pc.multiply(pred, y),
            "fp": pc.multiply(pred, pc.subtract(one, y)),
            "fn": pc.multiply(pc.subtract(one, pred), y),
            "tn": pc.multiply(pc.subtract(one, pred), pc.subtract(one, y)),
        }).filter(ok)

    prep.__name__ = "mcc_indicators"

    def finish(stats: pa.Table) -> pa.Table:
        def col(name):
            v = pc.cast(stats.column(f"{name}_sum"), pa.float64(),
                        safe=False).to_numpy(zero_copy_only=False)
            if len(v) and np.abs(v).max() >= 2.0**53:
                raise ValueError("mcc counts exceed exact float64 range")
            return v.astype(np.int64)

        tp, fp, fn, tn = col("tp"), col("fp"), col("fn"), col("tn")
        m1, m2, m3, m4 = tp + fp, tp + fn, tn + fp, tn + fn
        bad = (m1 == 0) | (m2 == 0) | (m3 == 0) | (m4 == 0)
        with np.errstate(invalid="ignore", divide="ignore"):
            # fixed left-assoc chain mirrored verbatim by the oracle SQL
            num = tp.astype(np.float64) * tn.astype(np.float64) \
                - fp.astype(np.float64) * fn.astype(np.float64)
            den = np.sqrt(m1.astype(np.float64)) * np.sqrt(m2.astype(np.float64)) \
                * np.sqrt(m3.astype(np.float64)) * np.sqrt(m4.astype(np.float64))
            mcc = num / np.where(bad, 1.0, den)
        return pa.table({
            group_col: stats.column("g"),
            "tp": pa.array(tp), "fp": pa.array(fp),
            "fn": pa.array(fn), "tn": pa.array(tn),
            "mcc": pa.array(mcc, pa.float64(), mask=bad),
        })

    aggs = {c: ["sum"] for c in ("tp", "fp", "fn", "tn")}
    if isinstance(ds, pa.Table):
        return finish(groupby_agg(prep(ds), "g", aggs))
    keyed = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=None)
    stats = groupby_agg(keyed, "g", aggs)
    finish.__name__ = "mcc_finish"
    return stats.map_batches(finish, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=None)


def cohen_kappa_by_group(ds, group_col: str, a_col: str, b_col: str,
                         max_cells: int = 2_000_000):
    """Cohen's kappa inter-rater agreement per group over two CATEGORICAL
    rating columns (label-quality audit for annotation pipelines — chance-
    corrected agreement between two labeling passes):

        kappa = (po - pe) / (1 - pe)
              = (n*agree - pe_num) / (n*n - pe_num)     [exact-int form]

    where ``agree = sum_c cell(c,c)`` and ``pe_num = sum_c row_c * col_c``
    over the union category space. Exactness: the whole statistic reduces
    to ONE IEEE division of two exact python-int-folded numerators (the
    cohen identity clears every inner division) — the DuckDB mirror
    ``(n*agree - pe)::DOUBLE / (n*n - pe)::DOUBLE`` computes the same two
    HUGEINT integers and applies the same round-to-nearest conversions.
    NULL when ``n*n == pe_num`` (both raters constant). Rows where either
    rating is null are dropped (SQL WHERE semantics).

    Scale plan: ratings cast to string, ONE partial-agg groupby to
    (group, a, b) cells; the driver folds O(groups x categories^2) cells
    guarded by ``max_cells``. Output: group, n, agree, kappa."""
    from kamae_ray.base import collect_tables
    from kamae_ray.stages.aggregate import groupby_agg

    def prep(block: pa.Table) -> pa.Table:
        av = pc.cast(A.as_array(block.column(a_col)), pa.string(), safe=False)
        bv = pc.cast(A.as_array(block.column(b_col)), pa.string(), safe=False)
        t = pa.table({group_col: A.as_array(block.column(group_col)),
                      "__ka": av, "__kb": bv,
                      "__one": pa.array(np.ones(block.num_rows, np.int64))})
        return t.filter(pc.and_(pc.is_valid(av), pc.is_valid(bv)))

    prep.__name__ = "kappa_cells"
    keyed = prep(ds) if isinstance(ds, pa.Table) else ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    cells = groupby_agg(keyed, [group_col, "__ka", "__kb"], {"__one": ["sum"]})
    if isinstance(cells, pa.Table):
        tbl = cells
    else:
        parts = [t for t in collect_tables(cells) if t.num_rows]
        tbl = pa.concat_tables(parts) if parts else None
    if tbl is None or tbl.num_rows == 0:
        return pa.table({group_col: pa.array([], pa.string()),
                         "n": pa.array([], pa.int64()),
                         "agree": pa.array([], pa.int64()),
                         "kappa": pa.array([], pa.float64())})
    if tbl.num_rows > max_cells:
        raise ValueError(f"cohen_kappa cells ({tbl.num_rows}) exceed "
                         f"max_cells={max_cells}")
    garr = A.as_array(tbl.column(group_col))
    aarr = tbl.column("__ka").to_pylist()
    barr = tbl.column("__kb").to_pylist()
    cnt = pc.cast(tbl.column("__one_sum"), pa.int64(), safe=False) \
        .to_numpy(zero_copy_only=False)
    by_g: dict = {}
    for i in range(tbl.num_rows):
        g = garr[i].as_py()
        st = by_g.setdefault(g, {"n": 0, "agree": 0, "row": {}, "col": {}})
        c = int(cnt[i])
        st["n"] += c
        if aarr[i] == barr[i]:
            st["agree"] += c
        st["row"][aarr[i]] = st["row"].get(aarr[i], 0) + c
        st["col"][barr[i]] = st["col"].get(barr[i], 0) + c
    groups = sorted(by_g, key=lambda v: (v is None, str(v)))
    out_g, n_l, ag_l, k_l = [], [], [], []
    for g in groups:
        st = by_g[g]
        n, agree = st["n"], st["agree"]
        pe_num = sum(r * st["col"].get(cat, 0) for cat, r in st["row"].items())
        den = n * n - pe_num
        kap = float(n * agree - pe_num) / float(den) if den else None
        out_g.append(g)
        n_l.append(n)
        ag_l.append(agree)
        k_l.append(kap)
    return pa.table({
        group_col: pa.array(out_g, garr.type),
        "n": pa.array(n_l, pa.int64()),
        "agree": pa.array(ag_l, pa.int64()),
        "kappa": pa.array(k_l, pa.float64()),
    })


def logrank_terms(ds, time_col: str, event_col: str, arm_col: str,
                  arm_a, arm_b, max_cells: int = 5_000_000):
    """Two-arm log-rank test terms — the survival-curve significance
    companion to :func:`km_curve`: one output row per distinct EVENT time
    with both arms' at-risk counts (``n_a``/``n_b``), event counts
    (``d_a``/``d_b``), the observed-minus-expected contribution

        ``oe = d_a - d*n_a/n``     (one exact-int product, one division)

    and the hypergeometric variance term

        ``v = d*n_a*n_b*(n-d) / (n^2*(n-1))``   (ONE division of two
                                                 exact python ints)

    Per-time TERMS are emitted, not the chi-squared sum — a cross-time
    float accumulation would be order-sensitive (the PSI/IV discipline);
    the caller's closing ``sum(oe)^2 / sum(v)`` over the bounded terms
    table is its one driver step. ``v`` is NULL when ``n <= 1``. Rows
    with an arm other than ``arm_a``/``arm_b`` are dropped; null
    times/events are rejected.

    Scale plan: ONE partial-agg groupby to (arm, time) cells (rows never
    move); the driver folds O(distinct times) cells guarded by
    ``max_cells`` — the binary_auc fold pattern."""
    from kamae_ray.base import collect_tables
    from kamae_ray.stages.aggregate import groupby_agg

    def prep(block: pa.Table) -> pa.Table:
        arm = A.as_array(block.column(arm_col))
        keep = pc.or_(pc.equal(arm, arm_a), pc.equal(arm, arm_b))
        block = block.filter(keep)
        t = A.as_array(block.column(time_col))
        ev = A.as_array(block.column(event_col))
        if t.null_count or ev.null_count:
            raise ValueError("logrank_terms requires non-null time and event")
        y = pc.cast(ev, pa.int64(), safe=False).to_numpy(zero_copy_only=False)
        if len(y) and not np.isin(y, (0, 1)).all():
            raise ValueError("logrank_terms event must be 0/1")
        return pa.table({
            "__isa": pc.cast(pc.equal(A.as_array(block.column(arm_col)),
                                      arm_a), pa.int64()),
            "__t": pc.cast(t, pa.int64(), safe=False),
            "__d": pa.array(y),
            "__m": pa.array(np.ones(block.num_rows, np.int64)),
        })

    prep.__name__ = "logrank_cells"
    tagged = prep(ds) if isinstance(ds, pa.Table) else ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    cells = groupby_agg(tagged, ["__isa", "__t"], {"__d": ["sum"],
                                                   "__m": ["sum"]})
    if isinstance(cells, pa.Table):
        tbl = cells
    else:
        parts = [t for t in collect_tables(cells) if t.num_rows]
        tbl = pa.concat_tables(parts) if parts else None
    empty = pa.table({"t": pa.array([], pa.int64()),
                      "n_a": pa.array([], pa.int64()),
                      "n_b": pa.array([], pa.int64()),
                      "d_a": pa.array([], pa.int64()),
                      "d_b": pa.array([], pa.int64()),
                      "oe": pa.array([], pa.float64()),
                      "v": pa.array([], pa.float64())})
    if tbl is None or tbl.num_rows == 0:
        return empty
    if tbl.num_rows > max_cells:
        raise ValueError(f"logrank cells ({tbl.num_rows}) exceed "
                         f"max_cells={max_cells}")
    isa = pc.cast(tbl.column("__isa"), pa.int64(), safe=False) \
        .to_numpy(zero_copy_only=False)
    tv = pc.cast(tbl.column("__t"), pa.int64(), safe=False) \
        .to_numpy(zero_copy_only=False)
    dv = pc.cast(tbl.column("__d_sum"), pa.int64(), safe=False) \
        .to_numpy(zero_copy_only=False)
    mv = pc.cast(tbl.column("__m_sum"), pa.int64(), safe=False) \
        .to_numpy(zero_copy_only=False)
    times = np.unique(tv)
    K = len(times)
    idx = np.searchsorted(times, tv)
    da = np.zeros(K, np.int64)
    db = np.zeros(K, np.int64)
    ma = np.zeros(K, np.int64)
    mb = np.zeros(K, np.int64)
    a = isa == 1
    np.add.at(da, idx[a], dv[a])
    np.add.at(db, idx[~a], dv[~a])
    np.add.at(ma, idx[a], mv[a])
    np.add.at(mb, idx[~a], mv[~a])
    tot_a, tot_b = int(ma.sum()), int(mb.sum())
    # at risk at t = total - everyone whose time < t (they left earlier)
    na = tot_a - (np.cumsum(ma) - ma)
    nb = tot_b - (np.cumsum(mb) - mb)
    keep = (da + db) > 0  # event times only
    out_t, na_l, nb_l, da_l, db_l, oe_l, v_l = [], [], [], [], [], [], []
    for i in np.flatnonzero(keep):
        n_a, n_b = int(na[i]), int(nb[i])
        d_a, d_b = int(da[i]), int(db[i])
        n, d = n_a + n_b, d_a + d_b
        oe = float(d_a) - float(d * n_a) / float(n)
        v = None
        if n > 1:
            v = float(d * n_a * n_b * (n - d)) / float(n * n * (n - 1))
        out_t.append(int(times[i]))
        na_l.append(n_a)
        nb_l.append(n_b)
        da_l.append(d_a)
        db_l.append(d_b)
        oe_l.append(oe)
        v_l.append(v)
    return pa.table({"t": pa.array(out_t, pa.int64()),
                     "n_a": pa.array(na_l, pa.int64()),
                     "n_b": pa.array(nb_l, pa.int64()),
                     "d_a": pa.array(da_l, pa.int64()),
                     "d_b": pa.array(db_l, pa.int64()),
                     "oe": pa.array(oe_l, pa.float64()),
                     "v": pa.array(v_l, pa.float64())})


def wasserstein_distance(ds, value_col: str, group_col: str, group_a, group_b,
                         driver_budget: int = 5_000_000):
    """EXACT two-sample 1-Wasserstein (earth mover's) distance between the
    rows of two groups over an INTEGER value column — :func:`ks_statistic`'s
    integral sibling (KS takes the sup of the CDF gap, W1 its area):

        num = sum over consecutive distinct values v_i of
              | cum_a(v_i)*n_b - cum_b(v_i)*n_a | * (v_{i+1} - v_i)
        w1  = num / (n_a * n_b)          (ONE division)

    ``num`` folds in arbitrary-precision python ints from exact int64 CDF
    cross-products, so there is no overflow anywhere; it is emitted as
    float64 (``w1_num``) — the identical round-to-nearest DuckDB applies to
    its HUGEINT sum. Returns a 1-row table (n_a, n_b, w1_num, w1); w1 NULL
    when a side is empty.

    Scale plan: ONE partial-agg groupby to distinct-value (cnt_a, cnt_b)
    cells; the driver folds O(distinct values) guarded by
    ``driver_budget`` — above it, quantize the value column to a coarser
    fixed-point grid first (W1 error is bounded by half the grid step;
    the documented scale path)."""
    from kamae_ray.base import collect_tables
    from kamae_ray.stages.aggregate import groupby_agg
    from kamae_ray.state.aggregators import _project

    def prep(block: pa.Table) -> pa.Table:
        g = A.as_array(block.column(group_col))
        v = pc.cast(A.as_array(block.column(value_col)), pa.int64(), safe=False)
        is_a = pc.cast(pc.equal(g, group_a), pa.int64())
        is_b = pc.cast(pc.equal(g, group_b), pa.int64())
        keep = pc.and_(pc.is_valid(v),
                       pc.or_(pc.equal(is_a, 1), pc.equal(is_b, 1)))
        return pa.table({"v": v, "a": is_a, "b": is_b}).filter(keep)

    prep.__name__ = "w1_tag"

    def _result(num: int, na: int, nb: int):
        w1 = (float(num) / float(na * nb)) if na and nb else None
        return pa.table({
            "n_a": pa.array([na], pa.int64()),
            "n_b": pa.array([nb], pa.int64()),
            "w1_num": pa.array([float(num)], pa.float64()),
            "w1": pa.array([w1], pa.float64()),
        })

    def _driver_fold(tbl: pa.Table):
        v = tbl.column("v").to_numpy(zero_copy_only=False)
        a = tbl.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = tbl.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(v, kind="stable")
        v = v[order].astype(np.int64)
        ca, cb = np.cumsum(a[order]), np.cumsum(b[order])
        na, nb = (int(ca[-1]), int(cb[-1])) if len(ca) else (0, 0)
        if not (na and nb):
            return _result(0, na, nb)
        if na * nb >= 1 << 62:
            raise ValueError("n_a * n_b exceeds the exact int64 W1 range")
        d = np.abs(ca[:-1] * nb - cb[:-1] * na)  # exact: cum*count < 2^62
        gaps = v[1:] - v[:-1]
        # arbitrary-precision fold: per-term products may exceed int64
        num = sum(int(x) * int(g) for x, g in zip(d.tolist(), gaps.tolist()))
        return _result(num, na, nb)

    if isinstance(ds, pa.Table):
        t = prep(ds)
        stats = groupby_agg(t, "v", {"a": ["sum"], "b": ["sum"]})
        return _driver_fold(pa.table({
            "v": stats.column("v"),
            "a": pc.cast(stats.column("a_sum"), pa.int64(), safe=False),
            "b": pc.cast(stats.column("b_sum"), pa.int64(), safe=False),
        }))

    proj = _project(ds, [value_col, group_col]) or ds
    keyed = proj.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True,
                             batch_size=None)
    stats = groupby_agg(keyed, "v", {"a": ["sum"], "b": ["sum"]}).materialize()
    n_distinct = stats.count()
    if n_distinct > driver_budget:
        raise ValueError(
            f"wasserstein_distance distinct values ({n_distinct}) exceed "
            f"driver_budget={driver_budget} — quantize to a coarser grid "
            "(error bounded by half the grid step)")
    parts = [t for t in collect_tables(stats) if t.num_rows]
    if not parts:
        return _result(0, 0, 0)
    tbl = pa.concat_tables(parts)
    return _driver_fold(pa.table({
        "v": tbl.column("v"),
        "a": pc.cast(tbl.column("a_sum"), pa.int64(), safe=False),
        "b": pc.cast(tbl.column("b_sum"), pa.int64(), safe=False),
    }))


def rbo_sql(k: int, p: float, inter_fmt: str) -> str:
    """The oracle-side truncated RBO@k expression GENERATED from the same
    constants as the engine kernel: a left-associative sum of
    ``inter_d::DOUBLE / d * c_d`` terms with ``c_d = (1-p) * p^(d-1)``
    emitted as exact round-trip float literals (repr(c) parses back to the
    identical double in DuckDB), accumulated in the engine's d order —
    the shared-constants pattern of :func:`ranking_dcg_sql`.
    ``inter_fmt`` formats the overlap@d SQL expression given d."""
    terms = []
    c = 1.0 - p
    for d in range(1, k + 1):
        terms.append(f"({inter_fmt.format(d=d)})::DOUBLE / "
                     f"CAST({d} AS DOUBLE) * CAST({c!r} AS DOUBLE)")
        c = c * p
    return " + ".join(terms)


def rbo_by_query(ds, query_col: str, rank_a_col: str, rank_b_col: str,
                 k: int = 10, p: float = 0.5):
    """Truncated rank-biased overlap (Webber et al. 2010, the prefix sum —
    no tail extrapolation) between TWO rankings of items per query:

        rbo@k = sum over d=1..k of (1-p)*p^(d-1) * overlap@d / d

    where ``overlap@d`` counts items whose positions in BOTH rankings are
    <= d. Input is the joined item table: one row per (query, item) with
    its 1-based integer position in each ranking (items absent from a
    ranking carry a null and never enter an overlap — standard prefix-RBO
    semantics).

    Exactness: overlap@d is the cumulative histogram of max(rank_a, rank_b)
    — pure int64; each term is one exact-int division times a shared
    constant, accumulated in fixed d order; the oracle is GENERATED from
    the identical constants (:func:`rbo_sql`) so the float chain is
    bit-identical. Output: query, inter_k, rbo_k.

    Scale plan: ONE sort-shuffle on the query key + a vectorized bincount
    segment kernel; O(queries) output rows."""
    from kamae_ray.stages.window import sorted_block_apply

    if k <= 0 or k > 1024:
        raise ValueError("k must be in [1, 1024]")
    if not (0.0 < p < 1.0):
        raise ValueError("p must be in (0, 1)")
    consts = np.empty(k, np.float64)
    c = 1.0 - p
    for d in range(k):
        consts[d] = c
        c = c * p

    def kern(block: pa.Table) -> pa.Table:
        qarr = A.as_array(block.column(query_col))
        empty = pa.table({
            query_col: qarr.slice(0, 0),
            "inter_k": pa.array([], pa.int64()),
            "rbo_k": pa.array([], pa.float64()),
        })
        if block.num_rows == 0:
            return empty
        gids = S.group_ids(block, [query_col])
        ra = A.as_array(block.column(rank_a_col))
        rb = A.as_array(block.column(rank_b_col))
        both = pc.and_(pc.is_valid(ra), pc.is_valid(rb)) \
            .to_numpy(zero_copy_only=False)
        rav = pc.fill_null(pc.cast(ra, pa.int64(), safe=False), 1 << 40) \
            .to_numpy(zero_copy_only=False)
        rbv = pc.fill_null(pc.cast(rb, pa.int64(), safe=False), 1 << 40) \
            .to_numpy(zero_copy_only=False)
        if both.any() and min(int(rav[both].min()), int(rbv[both].min())) < 1:
            raise ValueError("ranks must be 1-based positive integers")
        n_g = int(gids.max()) + 1
        m = np.maximum(rav, rbv)
        m = np.where(both & (m <= k), m, 0)  # 0 = never counted
        # per-(group, depth) counts -> cumulative overlap@d per group
        hist = np.zeros((n_g, k + 1), np.int64)
        np.add.at(hist, (gids, m), 1)
        hist[:, 0] = 0
        inter = np.cumsum(hist, axis=1)[:, 1:]  # (n_g, k)
        # fixed d-order left-assoc accumulation shared with the oracle
        rbo = np.zeros(n_g, np.float64)
        for d in range(1, k + 1):
            rbo = rbo + inter[:, d - 1].astype(np.float64) / float(d) \
                * consts[d - 1]
        firsts = np.full(n_g, len(gids), np.int64)
        np.minimum.at(firsts, gids, np.arange(len(gids), dtype=np.int64))
        return pa.table({
            query_col: qarr.take(pa.array(firsts)),
            "inter_k": pa.array(inter[:, k - 1]),
            "rbo_k": pa.array(rbo),
        })

    if isinstance(ds, pa.Table):
        return kern(ds)
    return sorted_block_apply(ds, [query_col], kern, "rbo_fold")


def ucb_scores(ds, arm_col: str, reward_col: str, max_arms: int = 1_000_000):
    """UCB1 exploration scores per arm (Auer 2002): ``mean + sqrt(2 ln N /
    n)`` over integer rewards — the classic bandit readout for
    offline-evaluating ranking/allocation policies. The float chain is ONE
    fixed order (sum/n + sqrt((2*lnN)/n)) with the log routed through
    ``arrays.libm_log`` (lesson 38), so a SQL mirror reproduces the bits
    exactly. Null arms and null rewards are excluded (SQL count/WHERE
    semantics); arms with zero counted rewards are dropped (HAVING n > 0).
    Output: ``arm, n, ucb``.

    Scale plan: one partial-agg exchange (groupby_agg int sums), then an
    O(arms) driver finish under ``max_arms`` (arm cardinality is small by
    nature; raise above)."""
    from kamae_ray.stages.aggregate import groupby_agg

    def prep(t: pa.Table) -> pa.Table:
        a = A.as_array(t.column(arm_col))
        v = A.as_array(t.column(reward_col))
        t2 = pa.table({"arm": a, "v": pc.cast(v, pa.int64(), safe=False)})
        return t2.filter(pc.and_(pc.is_valid(a), pc.is_valid(v)))

    prep.__name__ = "ucb_prep"
    if isinstance(ds, pa.Table):
        agg = groupby_agg(prep(ds), "arm", {"v": ["sum", "count"]})
    else:
        keyed = ds.map_batches(prep, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=None)
        agg = groupby_agg(keyed, "arm", {"v": ["sum", "count"]})
        from kamae_ray.base import collect_tables

        agg = pa.concat_tables(collect_tables(agg)).combine_chunks()
    if agg.num_rows > max_arms:
        raise ValueError(f"ucb_scores: {agg.num_rows} arms exceed max_arms")
    agg = agg.sort_by("arm")
    s = agg.column("v_sum").to_numpy(zero_copy_only=False)
    n = agg.column("v_count").to_numpy(zero_copy_only=False)
    keep = n > 0
    s, n = s[keep], n[keep]
    arms = agg.column("arm").filter(pa.array(keep))
    if np.abs(s).max(initial=0) >= (1 << 53) or int(n.sum()) >= (1 << 53):
        raise ValueError("ucb_scores: sums exceed exact float64 range")
    N = float(int(n.sum()))
    lnN = A.libm_log(np.array([N]))[0]
    nf = n.astype(np.float64)
    ucb = s / nf + np.sqrt((2.0 * lnN) / nf)
    return pa.table({"arm": arms, "n": pa.array(n.astype(np.int64), pa.int64()),
                     "ucb": pa.array(ucb, pa.float64())})
