"""Mergeable sketches for approximate distributed aggregation.

HyperLogLog (Flajolet et al. 2007, the public HLL formulation with linear
counting for the small range) — COUNT(DISTINCT) at 100 TB without carrying
distinct values through a shuffle: each block reduces to a fixed 2^p-byte
register vector per key (the partial), the exchange carries only those
vectors, and the finalize is an elementwise register max + the standard
estimator. Deterministic (FarmHash/splitmix64 inputs), mergeable in any
order, relative error ~1.04/sqrt(2^p) (~1.6% at p=12).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kamae_ray.functions import arrays as A
from kamae_ray.functions import segments as S


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public domain constant mix) — a
    full-avalanche 64-bit hash for integer keys."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _hash_any(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(uint64 hashes, valid mask) for any column type: integers/floats mix
    their bit patterns through splitmix64; strings go through the vectorized
    FarmHash64; everything else casts to string first."""
    arr = A.as_array(arr)
    valid = np.ones(len(arr), dtype=bool)
    if arr.null_count:
        valid = arr.is_valid().to_numpy(zero_copy_only=False)
    t = arr.type
    if pa.types.is_floating(t):
        # Hash the canonicalized float64 bit pattern (NOT a value cast, which
        # would truncate fractions and collapse all of [0,1) to one hash):
        # -0.0 normalizes to +0.0 and every NaN payload to one canonical NaN
        # so equal values always hash equal.
        v, _mask = A.to_numpy(pc.cast(pc.fill_null(arr, 0.0), pa.float64(), safe=False))
        v = np.where(v == 0.0, 0.0, v)          # -0.0 -> +0.0
        v = np.where(np.isnan(v), np.nan, v)    # canonical NaN payload
        return _splitmix64(v.view(np.uint64)), valid
    if pa.types.is_integer(t) or pa.types.is_temporal(t) or pa.types.is_boolean(t):
        v, _mask = A.to_numpy(pc.cast(pc.fill_null(arr, 0), pa.int64(), safe=False))
        return _splitmix64(v.astype(np.int64).view(np.uint64)), valid
    from kamae_ray.functions.farmhash import hash64_column

    if not pa.types.is_string(t) and not pa.types.is_large_string(t):
        arr = pc.cast(arr, pa.string(), safe=False)
    h, _null = hash64_column(pc.fill_null(arr, ""))
    return h.astype(np.uint64), valid


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (no float round-trip)."""
    v = w.copy()
    bl = np.zeros(len(w), dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(s))
        bl[m] += s
        v[m] >>= np.uint64(s)
    return bl + (v > 0)


def _hll_ranks(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) per hash: index = top p bits, rank = leading
    zeros of the remaining 64-p bits + 1 (capped when they are all zero)."""
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    with np.errstate(over="ignore"):
        rem = h << np.uint64(p)
    rank = np.where(rem == 0, 64 - p + 1, 64 - _bit_length_u64(rem) + 1).astype(np.int64)
    return idx, rank


def _regs_from_block(gids: np.ndarray, idx: np.ndarray, rank: np.ndarray,
                     n_groups: int, m: int) -> np.ndarray:
    """(n_groups, m) uint8 register matrix: max rank per (group, register),
    via one argsort + reduceat (no ufunc.at)."""
    regs = np.zeros((n_groups, m), dtype=np.uint8)
    if len(idx) == 0:
        return regs
    combined = gids * m + idx
    order = np.argsort(combined, kind="stable")
    cs = combined[order]
    starts, _l = S.segments(cs)
    mx = np.maximum.reduceat(rank[order], starts)
    slot = cs[starts]
    regs.reshape(-1)[slot] = np.minimum(mx, 255).astype(np.uint8)
    return regs


def _hll_estimate(regs: np.ndarray) -> np.ndarray:
    """Standard HLL estimator with linear-counting small-range correction.
    regs: (n, m) uint8 -> float64 estimates."""
    n, m = regs.shape
    alpha = 0.7213 / (1.0 + 1.079 / m)
    inv = np.power(2.0, -regs.astype(np.float64)).sum(axis=1)
    est = alpha * m * m / inv
    zeros = (regs == 0).sum(axis=1)
    small = (est <= 2.5 * m) & (zeros > 0)
    with np.errstate(divide="ignore"):
        # libm_log: oracle-mirrored ln must match DuckDB bit-for-bit
        lin = m * A.libm_log(m / np.where(zeros == 0, 1, zeros))
    return np.where(small, lin, est)


def groupby_approx_count_distinct(ds, keys, col: str, p: int = 12,
                                  out_col: str | None = None):
    """Approximate ``COUNT(DISTINCT col) GROUP BY keys`` via mergeable
    HyperLogLog registers (nulls not counted, SQL semantics). The shuffle
    carries one 2^p-byte register vector per (block, key) — independent of
    the number of distinct values, the property that makes this the
    100 TB-safe plan when exact ``groupby_count_distinct``'s one-row-per-
    distinct-value exchange is too wide. Deterministic; ~1.04/sqrt(2^p)
    relative error (p=12 -> ~1.6%)."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    keys = [keys] if isinstance(keys, str) else list(keys)
    out_col = out_col or f"{col}_approx_distinct"
    m = 1 << p
    _REG = "__kr_hll"

    def partial(block: pa.Table) -> pa.Table:
        n = block.num_rows
        if n == 0:
            out = {k: block.column(k) for k in keys}
            out[_REG] = pa.array([], pa.list_(pa.uint8(), m))
            return pa.table(out)
        gids = S.group_ids(block, keys)
        order = np.argsort(gids, kind="stable")
        starts, _l = S.segments(gids[order])
        firsts = order[starts]
        dense = np.empty(n, dtype=np.int64)
        dense[order] = np.repeat(np.arange(len(starts)), _l)
        h, valid = _hash_any(block.column(col))
        idx, rank = _hll_ranks(h[valid], p)
        regs = _regs_from_block(dense[valid], idx, rank, len(starts), m)
        out = {k: A.as_array(block.column(k)).take(pa.array(firsts)) for k in keys}
        out[_REG] = pa.FixedSizeListArray.from_arrays(pa.array(regs.reshape(-1)), m)
        return pa.table(out)

    partial.__name__ = "hll_partial"

    def finalize(block: pa.Table) -> pa.Table:
        nrows = block.num_rows
        if nrows == 0:
            out = {k: block.column(k) for k in keys}
            out[out_col] = pa.array([], pa.int64())
            return pa.table(out)
        gids = S.group_ids(block, keys)
        order = np.argsort(gids, kind="stable")
        starts, _l = S.segments(gids[order])
        firsts = order[starts]
        flat = A.as_array(block.column(_REG)).flatten().to_numpy(zero_copy_only=False)
        mat = flat.reshape(nrows, m)[order]
        merged = np.maximum.reduceat(mat, starts, axis=0)
        est = np.rint(_hll_estimate(merged)).astype(np.int64)
        out = {k: A.as_array(block.column(k)).take(pa.array(firsts)) for k in keys}
        out[out_col] = pa.array(est)
        return pa.table(out)

    finalize.__name__ = "hll_finalize"
    if isinstance(ds, pa.Table):
        return finalize(partial(ds))
    proj = ds
    try:
        proj = ds.select_columns(list(dict.fromkeys(keys + [col])))
    except Exception:
        pass
    parts = proj.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    from kamae_ray.stages.window import sorted_block_apply

    return sorted_block_apply(parts, keys, finalize, "hll_finalize")


def approx_count_distinct(ds, col: str, p: int = 12) -> int:
    """Dataset-global approximate COUNT(DISTINCT col): per-block HLL
    registers merged on the driver (one 2^p-byte vector per block — O(blocks)
    driver state, never the values)."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    m = 1 << p

    def block_regs(block: pa.Table) -> pa.Table:
        h, valid = _hash_any(block.column(col))
        idx, rank = _hll_ranks(h[valid], p)
        regs = _regs_from_block(np.zeros(int(valid.sum()), np.int64), idx, rank, 1, m)
        return pa.table({"regs": pa.FixedSizeListArray.from_arrays(pa.array(regs.reshape(-1)), m)})

    block_regs.__name__ = "hll_block_regs"
    if isinstance(ds, pa.Table):
        mat = A.as_array(block_regs(ds).column("regs")).flatten().to_numpy(zero_copy_only=False).reshape(1, m)
    else:
        proj = ds
        try:
            proj = ds.select_columns([col])
        except Exception:
            pass
        parts = proj.map_batches(block_regs, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        rows = parts.take_all()
        if not rows:
            return 0
        mat = np.stack([np.asarray(r["regs"], dtype=np.uint8) for r in rows])
    merged = mat.max(axis=0, keepdims=True)
    return int(np.rint(_hll_estimate(merged))[0])


def top_frequent(ds, col: str, k: int, capacity: int = 8192,
                 weight_col: str | None = None, candidates_margin: int = 4):
    """EXACT top-``k`` most frequent values of ``col`` (count desc, value asc
    on ties) with bounded shuffle at ANY cardinality — the heavy-hitters
    plan:

    1. per-block exact value counts, Misra-Gries-compressed to ``capacity``
       entries (subtract the (capacity+1)-th largest count, keep positive) —
       the exchange carries <= capacity rows per block no matter how many
       distinct values exist;
    2. distributed sum of the compressed partials (groupby_agg plan) gives
       LOWER BOUNDS; the top ``k * candidates_margin`` become candidates
       (Misra-Gries guarantee: any value with true count > total/capacity
       survives compression, so true heavy hitters are always candidates);
    3. exact recount of ONLY the candidates (broadcast membership filter +
       per-block partials, driver merge bounded by the candidate count),
       then the exact top-k.

    ``weight_col`` sums weights instead of counting rows (e.g. pre-computed
    term frequencies). Nulls in ``col`` are not counted."""
    from kamae_ray.stages.aggregate import groupby_agg

    if isinstance(ds, pa.Table):
        import ray

        ds = ray.data.from_arrow(ds)

    def mg_partial(block: pa.Table) -> pa.Table:
        n = block.num_rows
        vals = A.as_array(block.column(col))
        if weight_col is not None:
            w, wmask = A.to_numpy(pc.cast(block.column(weight_col), pa.float64(), safe=False))
            w = w.astype(np.float64, copy=True)
            if wmask is not None:
                w[wmask] = 0.0
        else:
            w = np.ones(n, np.float64)
        valid = np.ones(n, bool)
        if vals.null_count:
            valid = vals.is_valid().to_numpy(zero_copy_only=False)
        from kamae_ray.functions import segments as S

        sub = block.select([col]).filter(pa.array(valid)) if not valid.all() else block.select([col])
        wv = w[valid]
        if sub.num_rows == 0:
            return pa.table({col: vals.slice(0, 0), "__kr_cnt": pa.array([], pa.float64()),
                             "__kr_err": pa.array([], pa.float64())})
        gids = S.group_ids(sub, [col])
        order = np.argsort(gids, kind="stable")
        starts, _l = S.segments(gids[order])
        firsts = order[starts]
        cnt = np.add.reduceat(wv[order], starts)
        err = 0.0
        if len(cnt) > capacity:
            # Misra-Gries decrement: drop the tail mass from every counter.
            # ``err`` is this block's max per-value undercount — summed across
            # blocks it bounds how far any value's summed lower bound can sit
            # below its true count (used for the exactness certificate).
            thresh = np.partition(cnt, len(cnt) - capacity - 1)[len(cnt) - capacity - 1]
            keep = cnt > thresh
            if not keep.any():
                keep[:1] = True  # keep one zero-bound row so err survives
            firsts, cnt = firsts[keep], np.maximum(cnt[keep] - thresh, 0.0)
            err = float(thresh)
        errs = np.zeros(len(cnt), np.float64)
        if len(errs):
            errs[0] = err
        return pa.table({col: A.as_array(sub.column(col)).take(pa.array(firsts)),
                         "__kr_cnt": pa.array(cnt),
                         "__kr_err": pa.array(errs)})

    mg_partial.__name__ = "heavy_hitters_partial"
    proj = ds
    try:
        proj = ds.select_columns([col] + ([weight_col] if weight_col else []))
    except Exception:
        pass
    parts = proj.map_batches(mg_partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    # Consumed twice (error-bound sum + candidate groupby): materialize the
    # capacity-bounded partials once (CLAUDE.md lesson 14).
    parts = parts.materialize()

    def err_sum(block: pa.Table) -> pa.Table:
        s = float(np.nansum(block.column("__kr_err").to_numpy(zero_copy_only=False))) if block.num_rows else 0.0
        return pa.table({"__kr_err": pa.array([s], pa.float64())})

    err_sum.__name__ = "heavy_hitters_err"
    total_err = float(sum(r["__kr_err"] for r in
                          parts.map_batches(err_sum, batch_format="pyarrow", batch_size=None).take_all()))
    approx = groupby_agg(parts.select_columns([col, "__kr_cnt"]), col, {"__kr_cnt": ["sum"]})
    n_cand_limit = k * candidates_margin
    approx = approx.sort("__kr_cnt_sum", descending=True).limit(n_cand_limit)
    from kamae_ray.base import collect_tables

    cand_parts = [t for t in collect_tables(approx) if t.num_rows]
    if not cand_parts:
        return pa.table({col: pa.array([], pa.string()), "count": pa.array([], pa.float64())})
    cand_tab = pa.concat_tables(cand_parts)
    # If the limit wasn't binding, every distinct value is a candidate and
    # the recount is unconditionally exact; otherwise remember the weakest
    # selected lower bound for the exactness certificate below.
    limit_binding = cand_tab.num_rows >= n_cand_limit
    cutoff_lb = float(pc.min(cand_tab.column("__kr_cnt_sum")).as_py()) if limit_binding else 0.0
    cand = pc.unique(cand_tab.column(col).combine_chunks())
    import ray

    cand_ref = ray.put(cand)

    def exact_partial(block: pa.Table) -> pa.Table:
        c = ray.get(cand_ref)
        vals = A.as_array(block.column(col))
        m = pc.is_valid(pc.index_in(vals, value_set=c))
        sub = block.filter(m)
        return mg_partial(sub)  # <= |candidates| distinct: never compressed

    exact_partial.__name__ = "heavy_hitters_exact"
    ex_parts = [t for t in collect_tables(
        proj.map_batches(exact_partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    ) if t.num_rows]
    if not ex_parts:
        return pa.table({col: cand.slice(0, 0), "count": pa.array([], pa.float64())})
    allp = pa.concat_tables(ex_parts)
    from kamae_ray.functions import segments as S

    gids = S.group_ids(allp, [col])
    order = np.argsort(gids, kind="stable")
    starts, _l = S.segments(gids[order])
    firsts = order[starts]
    cnt = np.add.reduceat(allp.column("__kr_cnt").to_numpy(zero_copy_only=False)[order], starts)
    vals_u = A.as_array(allp.column(col)).take(pa.array(firsts))
    # exact top-k: count desc, value asc (deterministic tiebreak)
    top = pa.table({col: vals_u, "count": pa.array(cnt)})
    top = top.sort_by([("count", "descending"), (col, "ascending")]).slice(0, k)
    # Exactness certificate: a non-candidate's true count <= its summed lower
    # bound + total_err (max total Misra-Gries undercount). A value the limit
    # cut has bound <= cutoff_lb; a value MG dropped entirely has bound 0 (so
    # even a non-binding limit needs the check whenever compression happened).
    # If the exact k-th candidate count clears that ceiling, no non-candidate
    # can belong in the top-k.
    if total_err > 0:
        ceiling = (cutoff_lb if limit_binding else 0.0) + total_err
        kth = float(top.column("count")[k - 1].as_py()) if top.num_rows >= k else -np.inf
        if kth <= ceiling:
            raise ValueError(
                f"top_frequent cannot certify exactness: k-th count {kth} is within "
                f"the Misra-Gries error bound ({ceiling}) of the candidate cutoff — "
                f"raise capacity (={capacity}) or candidates_margin (={candidates_margin})")
    return top


# ---------------------------------------------------------------------------
# Mergeable quantile sketch (MRL/KLL family, deterministic compaction)
# ---------------------------------------------------------------------------


class QuantileSketch:
    """One-pass mergeable quantile sketch (the MRL/KLL family: Manku et al.
    1998, Karnin-Lang-Liberty 2016) — approximate quantiles at 100 TB in a
    single streaming pass with O(k·log(n/k)) memory, where exact_quantiles
    needs two full passes.

    Level ℓ holds values each standing for 2^ℓ originals; a level over
    ``k`` capacity sorts and keeps alternating elements (the survivors move
    up one level). Compaction offsets are DETERMINISTIC (per-level
    alternation) instead of KLL's coin flips — trading the randomized
    unbiasedness guarantee for reproducibility: a fixed input partitioning
    always yields the same result (and the distributed fold canonicalizes
    merge order, so block COMPLETION order is irrelevant — lesson-18
    family). Block BOUNDARIES still shape the surviving sample, as in any
    compaction sketch; the empirical normalized
    rank error stays well under levels/k (pinned by tests across uniform /
    zipf / sorted / constant streams). With n <= k nothing compacts and
    quantiles are EXACT order statistics (the oracle-certifiable regime —
    the same move as HLL's linear-counting certification)."""

    def __init__(self, k: int = 256):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.zeros(0, np.float64)]
        self._flips: list[int] = [0]
        self.n = 0  # exact ingested count (reporting only)

    def add(self, vals: np.ndarray) -> "QuantileSketch":
        v = np.asarray(vals, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return self
        self.n += len(v)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._cascade()
        return self

    def _cascade(self) -> None:
        lvl = 0
        while lvl < len(self.levels):
            if len(self.levels[lvl]) > self.k:
                buf = np.sort(self.levels[lvl], kind="stable")
                off = self._flips[lvl] & 1
                self._flips[lvl] += 1
                up = buf[off::2]
                self.levels[lvl] = np.zeros(0, np.float64)
                if lvl + 1 == len(self.levels):
                    self.levels.append(np.zeros(0, np.float64))
                    self._flips.append(0)
                self.levels[lvl + 1] = np.concatenate([self.levels[lvl + 1], up])
            lvl += 1

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        if other.k != self.k:
            raise ValueError("cannot merge sketches with different k")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.zeros(0, np.float64))
            self._flips.append(0)
        for lvl, buf in enumerate(other.levels):
            if len(buf):
                self.levels[lvl] = np.concatenate([self.levels[lvl], buf])
        self.n += other.n
        self._cascade()
        return self

    @property
    def weighted_count(self) -> int:
        return int(sum(len(b) << lvl for lvl, b in enumerate(self.levels)))

    def quantiles(self, qs) -> np.ndarray:
        """percentile_disc rule over the weighted sample: the smallest value
        whose cumulative weight fraction >= q (matches quantile_per_group's
        ceil(q*m)-1 in the unit-weight exact regime)."""
        qs = list(qs)  # a generator must not be consumed twice below
        vals = np.concatenate([b for b in self.levels]) if any(len(b) for b in self.levels) else np.zeros(0)
        if len(vals) == 0:
            return np.full(len(qs), np.nan)
        w = np.concatenate([np.full(len(b), 1 << lvl, np.int64)
                            for lvl, b in enumerate(self.levels)])
        order = np.argsort(vals, kind="stable")
        v, w = vals[order], w[order]
        cw = np.cumsum(w)
        W = cw[-1]
        out = np.empty(len(qs), np.float64)
        for i, q in enumerate(qs):
            target = max(int(np.ceil(q * W)), 1)
            out[i] = v[np.searchsorted(cw, target, side="left")]
        return out

    # -- partial-table (de)serialization for distributed merges --
    def to_rows(self) -> pa.Table:
        lvls = [lvl for lvl, b in enumerate(self.levels) if len(b)]
        return pa.table({
            "level": pa.array(lvls, pa.int64()),
            "flip": pa.array([self._flips[lvl] for lvl in lvls], pa.int64()),
            "vals": pa.array([self.levels[lvl].tolist() for lvl in lvls],
                             pa.list_(pa.float64())),
            "n": pa.array([self.n if i == 0 else 0 for i in range(len(lvls))], pa.int64()),
        })

    @classmethod
    def from_rows(cls, t: pa.Table, k: int) -> "QuantileSketch":
        s = cls(k)
        for r in t.to_pylist():
            lvl = int(r["level"])
            while len(s.levels) <= lvl:
                s.levels.append(np.zeros(0, np.float64))
                s._flips.append(0)
            s.levels[lvl] = np.asarray(r["vals"], np.float64)
            s._flips[lvl] = int(r["flip"])
            s.n += int(r["n"])
        return s


def approx_quantiles_sketch(ds, col: str, qs, k: int = 256) -> np.ndarray:
    """Distributed approximate quantiles in ONE streaming pass: each block
    reduces to a QuantileSketch partial (O(k log) rows), the driver merges
    partials in CANONICAL order (content-sorted — block completion order
    must not change the result, build-note lesson 18) and queries the merged
    sketch. Exact when the column has <= k non-null values."""
    qs = list(qs)

    def partial(block: pa.Table) -> pa.Table:
        s = QuantileSketch(k)
        vals, mask = A.to_numpy(pc.cast(A.as_array(block.column(col)), pa.float64(), safe=False))
        v = vals.astype(np.float64, copy=True)
        if mask is not None:
            v[mask] = np.nan
        s.add(v)
        return s.to_rows()

    partial.__name__ = "quantile_sketch_partial"
    if isinstance(ds, pa.Table):
        return QuantileSketch.from_rows(partial(ds), k).quantiles(qs)
    proj = ds
    try:
        proj = ds.select_columns([col])
    except Exception:
        pass
    from kamae_ray.base import collect_tables

    parts = [t for t in collect_tables(
        proj.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                         batch_size=None)) if t.num_rows]
    # canonical merge order: block sketches sorted by content
    def key(t: pa.Table):
        r = t.to_pylist()
        return (sum(x["n"] for x in r), len(r),
                tuple((x["level"], tuple(x["vals"][:4])) for x in r))

    merged = QuantileSketch(k)
    for t in sorted(parts, key=key):
        merged.merge(QuantileSketch.from_rows(t, k))
    return merged.quantiles(qs)


def _sketch_from_level_rows(levels_arr, flips_arr, vals_list, ns_arr, k: int) -> QuantileSketch:
    """Order-free bulk build: concatenate all rows' buffers per level, sum
    flips, then ONE cascade. Deterministic for any row multiset — compaction
    SORTS each buffer before halving, so concat order can't matter."""
    s = QuantileSketch(k)
    max_lvl = int(max(levels_arr)) if len(levels_arr) else 0
    while len(s.levels) <= max_lvl:
        s.levels.append(np.zeros(0, np.float64))
        s._flips.append(0)
    for lvl, flip, vals, n in zip(levels_arr, flips_arr, vals_list, ns_arr):
        lvl = int(lvl)
        v = np.asarray(vals, np.float64)
        if len(v):
            s.levels[lvl] = np.concatenate([s.levels[lvl], v])
        s._flips[lvl] += int(flip)
        s.n += int(n)
    s._cascade()
    return s


def groupby_approx_quantiles(ds, keys, col: str, qs, k: int = 256,
                             out_prefix: str | None = None):
    """Per-group approximate quantiles in ONE pass + ONE SMALL shuffle:
    each block reduces each in-block group to a QuantileSketch partial, so
    the exchange carries O(k·log) values per (block, key) — never the rows
    (``quantile_per_group`` is exact but its sort moves EVERY row; this is
    the right tool when single groups are huge). Groups that fit in one
    buffer (<= k values per block) take a fully vectorized fast path (one
    ListArray slice, no per-group sketch objects). Same output naming as
    quantile_per_group: key columns + ``{prefix}_p{round(q*100)}``. EXACT
    whenever a group's total non-null count is <= k (the certified regime)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    qs = list(qs)
    prefix = out_prefix or col
    names = [f"{prefix}_p{int(round(q * 100))}" for q in qs]

    def partial(block: pa.Table) -> pa.Table:
        kcols = {kc: A.as_array(block.column(kc)) for kc in keys}
        empty = pa.table({**{kc: kcols[kc].slice(0, 0) for kc in keys},
                          "__qs_level": pa.array([], pa.int64()),
                          "__qs_flip": pa.array([], pa.int64()),
                          "__qs_vals": pa.array([], pa.list_(pa.float64())),
                          "__qs_n": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        vals, mask = A.to_numpy(pc.cast(A.as_array(block.column(col)), pa.float64(), safe=False))
        v = vals.astype(np.float64, copy=True)
        if mask is not None:
            v[mask] = np.nan
        gids = S.group_ids(block, keys)
        # NaN-last in-group sort so each group's non-null run is contiguous:
        # the fast path (all groups <= k values) is then ONE vectorized
        # ListArray over the run offsets — no per-group Python on the block
        # hot path (house rule); only oversized groups build sketch objects
        order = np.lexsort((np.isnan(v), gids))
        starts, lens = S.segments(gids[order])
        firsts = order[starts]
        v_s = v[order]
        nn_counts = np.add.reduceat((~np.isnan(v_s)).astype(np.int64), starts) if len(v_s) else np.zeros(0, np.int64)
        nn_counts = np.atleast_1d(nn_counts)
        small = nn_counts <= k
        s_idx = np.flatnonzero(small)
        # vectorized small-group rows: slice each group's non-null run
        row_group, lvl_o, flip_o, n_o = [list(s_idx)], [np.zeros(len(s_idx), np.int64)],             [np.zeros(len(s_idx), np.int64)], [nn_counts[s_idx]]
        offs = np.zeros(len(s_idx) + 1, np.int64)
        np.cumsum(nn_counts[s_idx], out=offs[1:])
        counts = nn_counts[s_idx]
        intra = np.arange(int(offs[-1]), dtype=np.int64) - np.repeat(offs[:-1], counts)
        flat = v_s[np.repeat(starts[s_idx], counts) + intra] if len(intra) else np.zeros(0, np.float64)
        vals_chunks = [pa.ListArray.from_arrays(pa.array(offs, pa.int64()).cast(pa.int32()),
                                                pa.array(flat, pa.float64()))]
        # oversized groups: real sketches (rare by construction)
        big_rows_g, big_lvl, big_flip, big_n, big_vals = [], [], [], [], []
        for gi in np.flatnonzero(~small):
            seg = v_s[starts[gi] : starts[gi] + nn_counts[gi]]
            sk = QuantileSketch(k).add(seg)
            fne = _first_nonempty(sk)
            for lvl, b in enumerate(sk.levels):
                if len(b) or lvl == 0:
                    big_rows_g.append(gi)
                    big_lvl.append(lvl)
                    big_flip.append(sk._flips[lvl])
                    big_n.append(sk.n if lvl == fne else 0)
                    big_vals.append(b.tolist())
        if big_rows_g:
            row_group.append(big_rows_g)
            lvl_o.append(np.asarray(big_lvl, np.int64))
            flip_o.append(np.asarray(big_flip, np.int64))
            n_o.append(np.asarray(big_n, np.int64))
            vals_chunks.append(pa.array(big_vals, pa.list_(pa.float64())))
        rg = np.concatenate([np.asarray(x, np.int64) for x in row_group])
        key_arrays = {kc: kcols[kc].take(pa.array(firsts)).take(pa.array(rg))
                      for kc in keys}
        vals_arr = pa.concat_arrays([c.cast(pa.list_(pa.float64())) for c in vals_chunks])
        return pa.table({**key_arrays,
                         "__qs_level": pa.array(np.concatenate(lvl_o), pa.int64()),
                         "__qs_flip": pa.array(np.concatenate(flip_o), pa.int64()),
                         "__qs_vals": vals_arr,
                         "__qs_n": pa.array(np.concatenate(n_o), pa.int64())})

    partial.__name__ = "group_quantile_sketch_partial"

    def final(block: pa.Table) -> pa.Table:
        drop = ["__qs_level", "__qs_flip", "__qs_vals", "__qs_n"]
        if block.num_rows == 0:
            out = {kc: A.as_array(block.column(kc)).slice(0, 0) for kc in keys}
            out.update({nm: pa.array([], pa.float64()) for nm in names})
            return pa.table(out)
        gids = S.group_ids(block, keys)
        order = np.argsort(gids, kind="stable")
        starts, lens = S.segments(gids[order])
        firsts = order[starts]
        lv = block.column("__qs_level").to_numpy(zero_copy_only=False)
        fl = block.column("__qs_flip").to_numpy(zero_copy_only=False)
        nn = block.column("__qs_n").to_numpy(zero_copy_only=False)
        vl = block.column("__qs_vals").to_pylist()
        out = {kc: A.as_array(block.column(kc)).take(pa.array(firsts)) for kc in keys}
        res = np.empty((len(starts), len(qs)), np.float64)
        for gi, (st, ln) in enumerate(zip(starts, lens)):
            rows = order[st : st + int(ln)]
            sk = _sketch_from_level_rows(lv[rows], fl[rows], [vl[r] for r in rows],
                                         nn[rows], k)
            res[gi] = sk.quantiles(qs)
        for j, nm in enumerate(names):
            out[nm] = pa.array(res[:, j], pa.float64())
        return pa.table(out)

    final.__name__ = "group_quantile_sketch_final"
    if isinstance(ds, pa.Table):
        return final(partial(ds))
    proj = ds
    try:
        proj = ds.select_columns(list(dict.fromkeys(keys + [col])))
    except Exception:
        pass
    parts = proj.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                             batch_size=None)
    from kamae_ray.stages.window import sorted_block_apply

    return sorted_block_apply(parts, keys, final, "group_quantile_sketch",
                              force_surrogate=True)


def _first_nonempty(sk: QuantileSketch) -> int:
    for lvl, b in enumerate(sk.levels):
        if len(b):
            return lvl
    return 0


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------


def _cm_indices(h: np.ndarray, width: int, depth: int, seed: int) -> np.ndarray:
    """(depth, n) int64 cell indices: row j hashes h through splitmix64 with
    an odd per-row tweak, mod width."""
    out = np.empty((depth, len(h)), dtype=np.int64)
    for j in range(depth):
        tweak = np.uint64((seed * 0x9E3779B97F4A7C15 + (2 * j + 1) * 0xBF58476D1CE4E5B9) % (1 << 64))
        out[j] = (_splitmix64(h ^ tweak) % np.uint64(width)).astype(np.int64)
    return out


def countmin_sketch(ds, col: str, width: int = 2048, depth: int = 4,
                    seed: int = 0, weight_col: str | None = None):
    """Build a Count-Min sketch of ``col``'s value frequencies (optionally
    ``weight_col``-weighted) — the mergeable point-frequency primitive:
    approximate ``COUNT(*) WHERE col = v`` for ANY v from
    ``depth x width x 8`` bytes of state, never the values. Estimates NEVER
    undercount; overcount <= 2N/width with prob >= 1 - 2^-depth (classic
    bounds). Returns ``{"table": (depth, width) int64, "n": total}``.

    Unlike compaction sketches (KLL — lesson 32), CMS partials merge by
    INTEGER ADDITION: order-free and PARTITION-INVARIANT — any block split
    yields the bit-identical sketch (pinned in tests). Scale plan: one
    vectorized bincount partial per block (one (depth*width) int64 row per
    block through the exchange), one driver sum. Nulls are not counted."""
    if width < 2 or depth < 1:
        raise ValueError("need width >= 2 and depth >= 1")

    def block_cms(block: pa.Table) -> pa.Table:
        h, valid = _hash_any(block.column(col))
        h = h[valid]
        if weight_col is not None:
            w = pc.cast(A.as_array(block.column(weight_col)), pa.int64(),
                        safe=False)
            wv = pc.fill_null(w, 0).to_numpy(zero_copy_only=False)[valid]
        else:
            wv = None
        idx = _cm_indices(h, width, depth, seed)
        cms = np.zeros((depth, width), dtype=np.int64)
        for j in range(depth):
            cms[j] = np.bincount(idx[j], weights=wv, minlength=width).astype(np.int64) \
                if wv is not None else np.bincount(idx[j], minlength=width).astype(np.int64)
        n = int(wv.sum()) if wv is not None else int(valid.sum())
        return pa.table({
            "cms": pa.FixedSizeListArray.from_arrays(
                pa.array(cms.reshape(-1)), depth * width),
            "n": pa.array([n], pa.int64()),
        })

    block_cms.__name__ = "countmin_partial"
    if isinstance(ds, pa.Table):
        t = block_cms(ds)
        mat = A.as_array(t.column("cms")).flatten().to_numpy(
            zero_copy_only=False).reshape(depth, width).copy()
        return {"table": mat, "n": int(t.column("n")[0].as_py()),
                "width": width, "depth": depth, "seed": seed}
    proj = ds
    try:
        cols = [col] + ([weight_col] if weight_col else [])
        proj = ds.select_columns(cols)
    except Exception:
        pass
    parts = proj.map_batches(block_cms, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=None)
    rows = parts.take_all()
    mat = np.zeros((depth, width), dtype=np.int64)
    n = 0
    for r in rows:
        mat += np.asarray(r["cms"], dtype=np.int64).reshape(depth, width)
        n += int(r["n"])
    return {"table": mat, "n": n, "width": width, "depth": depth, "seed": seed}


def countmin_estimate(sk: dict, values) -> np.ndarray:
    """Point-frequency estimates for ``values`` from a ``countmin_sketch``
    result: min over the depth rows (int64, never undercounts)."""
    arr = values if isinstance(values, pa.Array) else pa.array(values)
    h, valid = _hash_any(arr)
    idx = _cm_indices(h, sk["width"], sk["depth"], sk["seed"])
    est = sk["table"][np.arange(sk["depth"])[:, None], idx].min(axis=0)
    est[~valid] = 0
    return est.astype(np.int64)


def approx_counts(ds, col: str, values: list, width: int = 2048,
                  depth: int = 4, seed: int = 0) -> pa.Table:
    """CMS point estimates for a fixed probe set, as a (value, approx_count)
    table. In the deterministic no-collision regime (probe values whose
    cells no other value touches) the estimate IS the exact count — the
    regime the q_countmin oracle certifies (HLL-oracle precedent)."""
    sk = countmin_sketch(ds, col, width=width, depth=depth, seed=seed)
    est = countmin_estimate(sk, values)
    # let Arrow infer the probe column's type — hardcoding pa.string() would
    # mistype (or fail on) integer probe values even though the sketch
    # itself hashes any type
    return pa.table({col: pa.array(values),
                     "approx_count": pa.array(est)})


def bottomk_sketch(ds, group_cols, item_col: str, k: int = 64):
    """Deterministic bottom-k (KMV) sketch per group over a STRING item
    column: the k smallest poly31 hashes of the group's DISTINCT items —
    simultaneously a mergeable distinct-count estimator and a deterministic
    uniform sample of the group's distinct values (the classic KMV /
    bottom-k construction; order-free and partition-invariant because
    min-k of a union is min-k of the per-part min-ks — the anti-lesson-32
    sketch, like Count-Min).

    Output: one row per (group, rank 1..k): the item, its hash, and on
    every row the group's ``n_seen`` (exact distinct count of SKETCHED
    items is NOT carried — the estimator is ``est = (k-1) * P / h_k`` on
    the rank-k row, ONE division of exact ints, NULL below k items where
    the sketch is EXACT and ``n_seen`` itself is the answer).

    Scale plan: block-local (group, hash) dedup -> partial bottom-k per
    group per block (<= k rows per key cross the ONE exchange) -> head-k
    finalize; hashes are the shared poly31 constants, so the whole sketch
    is SQL-certifiable."""
    from kamae_ray.stages.aggregate import distinct, topk_per_group
    from kamae_ray.stages.hashing import POLY_P, poly31_column

    KMIX = 2_654_435_761  # Knuth multiplier: (h*K) % P is a bijection on
    # [0, P) that decorrelates poly31's sequential-suffix banding (raw
    # poly31 of "item123"-style keys clusters, which would bias the KMV
    # estimator); h*K < 2^63 for h < P, exact in int64 on BOTH engines

    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    if k < 2 or k > 100_000:
        raise ValueError("k must be in [2, 1e5]")

    def tag(block: pa.Table) -> pa.Table:
        it = pc.cast(A.as_array(block.column(item_col)), pa.string(), safe=False)
        h, null_mask = poly31_column(it)
        h = (h * np.int64(KMIX)) % np.int64(POLY_P)
        cols = {g: A.as_array(block.column(g)) for g in group_cols}
        cols[item_col] = it
        cols["__h"] = pa.array(h, pa.int64())
        return pa.table(cols).filter(pa.array(~null_mask))

    tag.__name__ = "bottomk_hash"
    tagged = tag(ds) if isinstance(ds, pa.Table) else ds.map_batches(
        tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    # distinct (group, hash, item) tuples; a poly31 collision keeps both
    # items (documented: "k smallest distinct (hash, item) pairs" — the
    # estimator lives in hash space and the oracle mirrors the same rule)
    cells = distinct(tagged, group_cols + ["__h", item_col])
    top = topk_per_group(cells, group_cols, "__h", k, descending=False,
                         tiebreak=[item_col])

    def finish(block: pa.Table) -> pa.Table:
        base = {g: A.as_array(block.column(g)) for g in group_cols}
        empty = dict(base)
        if block.num_rows == 0:
            out = {g: a.slice(0, 0) for g, a in empty.items()}
            out["rank"] = pa.array([], pa.int64())
            out[item_col] = pa.array([], pa.string())
            out["hash"] = pa.array([], pa.int64())
            out["est_distinct"] = pa.array([], pa.float64())
            return pa.table(out)
        idx = np.asarray(pc.sort_indices(
            block, sort_keys=[(g, "ascending") for g in group_cols]
            + [("__h", "ascending"), (item_col, "ascending")]))
        gids = S.group_ids(block, group_cols)
        gs = gids[idx]
        starts, lens = S.segments(gs)
        rank = np.arange(len(gs), dtype=np.int64) - np.repeat(starts, lens) + 1
        h = block.column("__h").to_numpy(zero_copy_only=False)[idx]
        est = np.where((rank == k) & (h > 0),
                       (float(k - 1) * float(POLY_P)) /
                       np.where(h == 0, 1, h).astype(np.float64),
                       np.nan)
        out = {g: base[g].take(pa.array(idx)) for g in group_cols}
        out["rank"] = pa.array(rank)
        out[item_col] = A.as_array(block.column(item_col)).take(pa.array(idx))
        out["hash"] = pa.array(h)
        out["est_distinct"] = pa.array(est, pa.float64(),
                                       mask=~((rank == k) & (h > 0)))
        return pa.table(out)

    finish.__name__ = "bottomk_finish"
    if isinstance(top, pa.Table):
        return finish(top)
    return top.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=None)
