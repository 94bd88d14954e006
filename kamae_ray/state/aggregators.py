"""Fit-time aggregation passes: bounded-output reductions over a Dataset.

The Ray twin of the reference's fit computations
(reference: src/kamae/spark/estimators/standard_scale.py:100-163,
min_max_scale.py:102-165, impute.py:110-167, indexer_utils.py:48-129):
per-block numpy partials inside ``map_batches`` (partial aggregation — the
combiner side), then a driver-side merge of the tiny per-block results.
No full materialization: only O(num_blocks × width) rows reach the driver.

All moments use float64 accumulators; std is population std (stddev_pop) to
match the reference exactly (reference: standard_scale.py:136-144).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kamae_ray.functions import arrays as A

#: driver-merge guard: vocab fits merge per-block partials on the driver,
#: which is O(blocks × distinct). Beyond this many distinct values the merge
#: raises instead of silently OOMing the driver; callers should set
#: ``max_num_labels`` (pushes a distributed sort+limit) or index with
#: HashIndex instead. Module-level so tests can monkeypatch it down.
MAX_DRIVER_VOCAB = 4_000_000


class VocabOverflowError(ValueError):
    """Vocabulary exceeds the driver-merge guard (MAX_DRIVER_VOCAB)."""


def _flat_values(batch: pa.Table, col: str) -> pa.Array:
    arr = A.as_array(batch.column(col))
    _, flat = A.unwrap(arr)
    return flat


def _position_matrix(batch: pa.Table, col: str) -> np.ndarray:
    """(rows, width) float64 matrix of the innermost arrays (width=1 for
    scalar columns). NaN marks nulls."""
    arr = A.as_array(batch.column(col))
    levels, flat = A.unwrap(arr)
    vals, mask = A.to_numpy(pc.cast(flat, pa.float64(), safe=False))
    vals = vals.astype(np.float64, copy=True)
    if mask is not None:
        vals[mask] = np.nan
    if not levels:
        return vals.reshape(-1, 1)
    # per INNERMOST position, outer dims pooled (reference convention:
    # estimators/standard_scale.py:118 probes shape[-1])
    inner_lens = np.diff(levels[-1][0])
    if len(inner_lens) == 0:
        return vals.reshape(0, 1)
    w = int(inner_lens[0])
    if not np.all(inner_lens == w):
        raise ValueError(f"column {col}: ragged innermost arrays; per-position scaling needs fixed width")
    return vals.reshape(-1, w)


class _MomentsPartial:
    """Per-block partial (count, sum, sumsq, min, max) per array position."""

    def __init__(self, col: str, mask_value: float | None):
        self.col = col
        self.mask_value = mask_value

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _position_matrix(batch, self.col)
        if self.mask_value is not None:
            m = np.where(m == self.mask_value, np.nan, m)
        valid = ~np.isnan(m)
        cnt = valid.sum(axis=0).astype(np.float64)
        s = np.where(valid, m, 0.0).sum(axis=0)
        s2 = np.where(valid, m * m, 0.0).sum(axis=0)
        mn = np.where(cnt > 0, np.nanmin(np.where(valid, m, np.inf), axis=0, initial=np.inf), np.inf)
        mx = np.where(cnt > 0, np.nanmax(np.where(valid, m, -np.inf), axis=0, initial=-np.inf), -np.inf)
        return pa.table(
            {
                "cnt": [cnt.tolist()],
                "sum": [s.tolist()],
                "sumsq": [s2.tolist()],
                "min": [mn.tolist()],
                "max": [mx.tolist()],
            }
        )


def _project(ds, cols: list[str]):
    """Prune to needed columns. On an untransformed ``read_parquet_clean``
    dataset the projection is pushed INTO the parquet scan by re-issuing the
    read (Ray 2.49's select_columns stays a separate Project operator and
    deserializes the full payload — measured 633 MB read for a 2-column fit
    on the flagship tokens table); otherwise select_columns prunes between
    operators."""
    if isinstance(ds, pa.Table):
        return ds
    from kamae_ray.sources.io import narrow_read

    nd = narrow_read(ds, cols)
    if nd is not None:
        return nd
    try:
        return ds.select_columns(cols)
    except Exception:
        return ds



def _canon_rows(rows: list[dict]) -> list[dict]:
    """Sort per-block partial rows into a canonical order before the driver
    merge: ``take_all()`` returns blocks in completion order (observed to
    vary between a cold and a warm execution of the same plan), and float
    accumulation is order-sensitive, so an unordered merge makes repeated
    fits differ in the last ulp. O(blocks log blocks), driver-side only."""
    return sorted(rows, key=lambda r: repr(sorted(r.items())))

def moments(ds, col: str, mask_value: float | None = None) -> dict[str, np.ndarray]:
    """One streaming pass -> per-position {count, mean, std_pop, min, max}."""
    fn = _MomentsPartial(col, mask_value)
    if isinstance(ds, pa.Table):
        rows = fn(ds).to_pylist()
    else:
        rows = _canon_rows(
            _project(ds, [col]).map_batches(fn, batch_format="pyarrow", zero_copy_batch=True).take_all()
        )
    w = max(len(r["cnt"]) for r in rows)
    cnt = np.zeros(w)
    s = np.zeros(w)
    s2 = np.zeros(w)
    mn = np.full(w, np.inf)
    mx = np.full(w, -np.inf)
    for r in rows:
        cnt += np.asarray(r["cnt"])
        s += np.asarray(r["sum"])
        s2 += np.asarray(r["sumsq"])
        mn = np.minimum(mn, np.asarray(r["min"]))
        mx = np.maximum(mx, np.asarray(r["max"]))
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = np.where(cnt > 0, s / np.where(cnt == 0, 1, cnt), np.nan)
        var = np.where(cnt > 0, s2 / np.where(cnt == 0, 1, cnt) - mean * mean, np.nan)
        var = np.clip(var, 0, None)  # guard negative-epsilon from fp cancellation
        std = np.sqrt(var)
    return {"count": cnt, "mean": mean, "std_pop": std, "min": mn, "max": mx}


class _MultiMomentsPartial:
    """One pass computing moments partials for MANY columns at once (fused
    fit: k estimators -> 1 read instead of k)."""

    def __init__(self, specs: list[tuple[str, float | None]]):
        self.specs = specs

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {}
        for col, mask_value in self.specs:
            part = _MomentsPartial(col, mask_value)(batch)
            tag = f"{col}\x1f{mask_value}"
            for name in ("cnt", "sum", "sumsq", "min", "max"):
                cols[f"{tag}\x1f{name}"] = part.column(name)
        return pa.table(cols)


def moments_many(ds, specs: list[tuple[str, float | None]]) -> dict[tuple[str, float | None], dict[str, np.ndarray]]:
    """Shared single-pass moments for several (col, mask_value) specs."""
    specs = list(dict.fromkeys(specs))
    fn = _MultiMomentsPartial(specs)
    if isinstance(ds, pa.Table):
        rows = fn(ds).to_pylist()
    else:
        cols = list(dict.fromkeys(c for c, _ in specs))
        rows = _canon_rows(
            _project(ds, cols).map_batches(fn, batch_format="pyarrow", zero_copy_batch=True).take_all()
        )
    out = {}
    for col, mask_value in specs:
        tag = f"{col}\x1f{mask_value}"
        w = max(len(r[f"{tag}\x1fcnt"]) for r in rows)
        cnt = np.zeros(w)
        s = np.zeros(w)
        s2 = np.zeros(w)
        mn = np.full(w, np.inf)
        mx = np.full(w, -np.inf)
        for r in rows:
            cnt += np.asarray(r[f"{tag}\x1fcnt"])
            s += np.asarray(r[f"{tag}\x1fsum"])
            s2 += np.asarray(r[f"{tag}\x1fsumsq"])
            mn = np.minimum(mn, np.asarray(r[f"{tag}\x1fmin"]))
            mx = np.maximum(mx, np.asarray(r[f"{tag}\x1fmax"]))
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = np.where(cnt > 0, s / np.where(cnt == 0, 1, cnt), np.nan)
            var = np.clip(np.where(cnt > 0, s2 / np.where(cnt == 0, 1, cnt) - mean * mean, np.nan), 0, None)
        out[(col, mask_value)] = {
            "count": cnt,
            "mean": mean,
            "std_pop": np.sqrt(var),
            "min": mn,
            "max": mx,
        }
    return out


class _MultiValueCountsPartial:
    """One pass collecting value counts for several vocab specs; emits
    (spec_idx, value, count) rows."""

    def __init__(self, specs: list[tuple[tuple[str, ...], str | None]]):
        self.specs = specs

    def __call__(self, batch: pa.Table) -> pa.Table:
        idxs, values, counts = [], [], []
        for i, (cols, mask_token) in enumerate(self.specs):
            part = _ValueCountsPartial(list(cols), mask_token)(batch)
            idxs.extend([i] * part.num_rows)
            values.extend(part.column("value").to_pylist())
            counts.extend(part.column("count").to_pylist())
        return pa.table(
            {
                "spec": pa.array(idxs, pa.int32()),
                "value": pa.array(values, pa.string()),
                "count": pa.array(counts, pa.int64()),
            }
        )


def value_counts_many(
    ds, specs: list[tuple[tuple[str, ...], str | None]]
) -> dict[tuple[tuple[str, ...], str | None], dict[str, int]]:
    """Shared single-pass value counts for several (cols, mask_token) specs."""
    specs = list(dict.fromkeys(specs))
    fn = _MultiValueCountsPartial(specs)
    if isinstance(ds, pa.Table):
        rows = fn(ds).to_pylist()
    else:
        all_cols = list(dict.fromkeys(c for cols, _ in specs for c in cols))
        partial = _project(ds, all_cols).map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
        agg_ds = partial.groupby(["spec", "value"]).sum("count")
        rows = [
            {"spec": r["spec"], "value": r["value"], "count": r["sum(count)"]}
            for r in agg_ds.take_all()
        ]
    out: dict = {spec: {} for spec in specs}
    for r in rows:
        spec = specs[r["spec"]]
        d = out[spec]
        d[r["value"]] = d.get(r["value"], 0) + r["count"]
    return out


class _FusedFitPartial:
    """ONE pass emitting per-block partials for every moments spec AND every
    vocab spec (value/count lists). Vocab partials merge on the driver —
    vocabularies are bounded by construction (they are embedded in serving
    models, reference: indexer collect semantics), so the driver merge is
    O(blocks × vocab) and skips a groupby shuffle entirely."""

    def __init__(self, moment_specs, vocab_specs):
        self.moment_specs = moment_specs
        self.vocab_specs = vocab_specs

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {}
        for col, mask_value in self.moment_specs:
            part = _MomentsPartial(col, mask_value)(batch)
            tag = f"m\x1f{col}\x1f{mask_value}"
            for name in ("cnt", "sum", "sumsq", "min", "max"):
                cols[f"{tag}\x1f{name}"] = part.column(name)
        for i, (vcols, mask_token) in enumerate(self.vocab_specs):
            part = _ValueCountsPartial(list(vcols), mask_token)(batch)
            tag = f"v\x1f{i}"
            cols[f"{tag}\x1fvalues"] = pa.array([part.column("value").to_pylist()], pa.list_(pa.string()))
            cols[f"{tag}\x1fcounts"] = pa.array([part.column("count").to_pylist()], pa.list_(pa.int64()))
        return pa.table(cols)


def fused_fit_pass(ds, moment_specs, vocab_specs):
    """Single streaming pass -> ({moments_spec: moments}, {vocab_spec: counts})."""
    moment_specs = list(dict.fromkeys(moment_specs))
    vocab_specs = list(dict.fromkeys(vocab_specs))
    fn = _FusedFitPartial(moment_specs, vocab_specs)
    if isinstance(ds, pa.Table):
        rows = fn(ds).to_pylist()
    else:
        cols = list(
            dict.fromkeys(
                [c for c, _ in moment_specs] + [c for vc, _ in vocab_specs for c in vc]
            )
        )
        rows = _canon_rows(
            _project(ds, cols).map_batches(fn, batch_format="pyarrow", zero_copy_batch=True).take_all()
        )
    mout = {}
    for col, mask_value in moment_specs:
        tag = f"m\x1f{col}\x1f{mask_value}"
        w = max(len(r[f"{tag}\x1fcnt"]) for r in rows)
        cnt = np.zeros(w)
        s = np.zeros(w)
        s2 = np.zeros(w)
        mn = np.full(w, np.inf)
        mx = np.full(w, -np.inf)
        for r in rows:
            cnt += np.asarray(r[f"{tag}\x1fcnt"])
            s += np.asarray(r[f"{tag}\x1fsum"])
            s2 += np.asarray(r[f"{tag}\x1fsumsq"])
            mn = np.minimum(mn, np.asarray(r[f"{tag}\x1fmin"]))
            mx = np.maximum(mx, np.asarray(r[f"{tag}\x1fmax"]))
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = np.where(cnt > 0, s / np.where(cnt == 0, 1, cnt), np.nan)
            var = np.clip(np.where(cnt > 0, s2 / np.where(cnt == 0, 1, cnt) - mean * mean, np.nan), 0, None)
        mout[(col, mask_value)] = {
            "count": cnt,
            "mean": mean,
            "std_pop": np.sqrt(var),
            "min": mn,
            "max": mx,
        }
    vout = {}
    for i, spec in enumerate(vocab_specs):
        tag = f"v\x1f{i}"
        d: dict[str, int] = {}
        for r in rows:
            for v, c in zip(r[f"{tag}\x1fvalues"], r[f"{tag}\x1fcounts"]):
                d[v] = d.get(v, 0) + c
            if len(d) > MAX_DRIVER_VOCAB:
                raise VocabOverflowError(
                    f"fused vocab fit over {spec[0]} exceeds MAX_DRIVER_VOCAB="
                    f"{MAX_DRIVER_VOCAB} distinct values; set max_num_labels on the "
                    "estimator (it then fits via the distributed sort+limit path) "
                    "or use HashIndex for unbounded-cardinality keys"
                )
        vout[spec] = d
    return mout, vout


class _CountHistPartial:
    """Per-block (count_in_range_histogram, below, above) for quantile
    refinement."""

    def __init__(self, col: str, mask_value, lo: float, hi: float, bins: int):
        self.col = col
        self.mask_value = mask_value
        self.lo = lo
        self.hi = hi
        self.bins = bins

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat = _flat_values(batch, self.col)
        vals, mask = A.to_numpy(pc.cast(flat, pa.float64(), safe=False))
        vals = vals.astype(np.float64, copy=True)
        if mask is not None:
            vals[mask] = np.nan
        if self.mask_value is not None:
            vals = np.where(vals == self.mask_value, np.nan, vals)
        vals = vals[~np.isnan(vals)]
        below = int((vals < self.lo).sum())
        above = int((vals > self.hi).sum())
        sel = vals[(vals >= self.lo) & (vals <= self.hi)]
        hist, _ = np.histogram(sel, bins=self.bins, range=(self.lo, self.hi))
        return pa.table({"below": [below], "above": [above],
                         "hist": [hist.astype(np.int64).tolist()]})


def _hist_pass(ds, col, mask_value, lo, hi, bins):
    below, _above, hist = _hist_pass3(ds, col, mask_value, lo, hi, bins)
    return below, hist


def _hist_pass3(ds, col, mask_value, lo, hi, bins):
    fn = _CountHistPartial(col, mask_value, lo, hi, bins)
    if isinstance(ds, pa.Table):
        rows = fn(ds).to_pylist()
    else:
        rows = _project(ds, [col]).map_batches(fn, batch_format="pyarrow", zero_copy_batch=True).take_all()
    below = sum(r["below"] for r in rows)
    above = sum(r["above"] for r in rows)
    hist = np.sum([np.asarray(r["hist"], dtype=np.int64) for r in rows], axis=0)
    return below, above, hist


def _footer_minmax(ds, col: str):
    """EXACT global [min, max] of a scalar numeric column straight from the
    parquet footers of an UNTRANSFORMED ``read_parquet_clean`` dataset — a
    driver-side metadata scan that replaces the whole-column moments pass in
    ``exact_quantiles`` (one full streaming pass saved). Returns None when
    the dataset isn't a tagged bare read, the column isn't a scalar leaf, or
    any row group lacks statistics. Parquet min/max statistics for numeric
    types are exact values, not truncations."""
    import os

    import pyarrow.parquet as pq

    info = getattr(ds, "_kamae_read", None)
    if info is None:
        return None
    path = info["path"]
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
        )
    else:
        files = [path]
    if not files:
        return None
    mn, mx = np.inf, -np.inf
    any_vals = False
    try:
        for f in files:
            meta = pq.ParquetFile(f).metadata
            sch = meta.schema
            try:
                ci = sch.names.index(col)
            except ValueError:
                return None
            for rg in range(meta.num_row_groups):
                c = meta.row_group(rg).column(ci)
                st = c.statistics
                if st is None or not st.has_min_max:
                    return None
                if not isinstance(st.min, (int, float)) or isinstance(st.min, bool):
                    return None
                if st.num_values:
                    any_vals = True
                    mn = min(mn, float(st.min))
                    mx = max(mx, float(st.max))
    except Exception:
        return None
    if not any_vals:
        return None
    return float(mn), float(mx)


class _CollectRangePartial:
    def __init__(self, col: str, mask_value, lo: float, hi: float):
        self.col = col
        self.mask_value = mask_value
        self.lo = lo
        self.hi = hi

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat = _flat_values(batch, self.col)
        vals, mask = A.to_numpy(pc.cast(flat, pa.float64(), safe=False))
        vals = vals.astype(np.float64, copy=True)
        if mask is not None:
            vals[mask] = np.nan
        if self.mask_value is not None:
            vals = np.where(vals == self.mask_value, np.nan, vals)
        vals = vals[~np.isnan(vals)]
        sel = vals[(vals >= self.lo) & (vals <= self.hi)]
        return pa.table({"v": sel})


def exact_median(ds, col: str, mask_value: float | None = None) -> float | None:
    """Exact (interpolated) median without materializing the column: moments
    pass for [min,max] + histogram-refinement passes to bracket the middle
    order statistics, then collect only the tiny bracket.

    Matches Spark F.median / DuckDB median (average of the two middle values
    for even counts). Scale: each refinement is a streaming scan; the final
    collect is bounded by the refined bucket size.
    """
    # exact_quantiles([0.5]) implements the identical interpolation rule
    # (q=0.5, p=(n-1)/2: odd n -> middle value, even n -> mean of the two
    # middles) and carries every optimization: parquet-footer [min,max] on
    # tagged reads, histogram pass doubling as the count pass, ONE
    # multi-range collect — 2 full passes in the common case vs the old 4
    # (moments + hist + collect + a whole-column recount of `below`).
    return exact_quantiles(ds, col, [0.5], mask_value)[0]


class _MultiRangeCollectPartial:
    """Per-block (below_count per range, values inside each range) for the
    final quantile gather — ONE streaming pass covers every bracket."""

    def __init__(self, col: str, mask_value, ranges: list[tuple[float, float]]):
        self.col = col
        self.mask_value = mask_value
        self.ranges = ranges

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat = _flat_values(batch, self.col)
        vals, mask = A.to_numpy(pc.cast(flat, pa.float64(), safe=False))
        vals = vals.astype(np.float64, copy=True)
        if mask is not None:
            vals[mask] = np.nan
        if self.mask_value is not None:
            vals = np.where(vals == self.mask_value, np.nan, vals)
        vals = vals[~np.isnan(vals)]
        rows = {"r": [], "below": [], "v": []}
        for i, (lo, hi) in enumerate(self.ranges):
            rows["r"].append(i)
            rows["below"].append(int((vals < lo).sum()))
            rows["v"].append(vals[(vals >= lo) & (vals <= hi)].tolist())
        return pa.table({"r": pa.array(rows["r"], pa.int64()),
                         "below": pa.array(rows["below"], pa.int64()),
                         "v": pa.array(rows["v"], pa.list_(pa.float64()))})


def exact_quantiles(ds, col: str, qs, mask_value: float | None = None) -> list:
    """Exact linear-interpolated quantiles (SQL ``quantile_cont`` / numpy
    ``quantile``) of a whole column, computed WITHOUT materializing it.

    Plan (all streaming, driver state O(bins + bracket)):
    1. ``moments`` pass -> count, global [min, max];
    2. one 8192-bin histogram pass brackets every needed order statistic
       (per-bin population n/8192 — a 16-billion-row column leaves <=2M
       values per bin); oversized brackets refine recursively on their own
       subrange (another histogram pass each, rarely needed);
    3. ONE multi-range count+collect pass gathers just the bracketed values;
       the driver sorts each tiny bracket and interpolates.

    Returns one float per q (None when the column has no values).
    """
    qs = list(qs)
    bins = 8192
    # Fused fast path: an untransformed tagged read gives EXACT global
    # [min, max] from the parquet footers (driver metadata scan, zero data
    # passes), so the first histogram pass doubles as the count pass — the
    # whole-column moments pass is eliminated (2 full passes total instead
    # of 3 in the common fit-from-parquet case).
    fm = None if isinstance(ds, pa.Table) else _footer_minmax(ds, col)
    top_pre = None
    if fm is not None:
        lo0, hi0 = fm
        if lo0 == hi0:
            b1, a1, h1 = _hist_pass3(ds, col, mask_value, lo0, hi0, 1)
            n = b1 + a1 + int(h1.sum())
            return [None] * len(qs) if n == 0 else [lo0] * len(qs)
        below0, above0, hist0 = _hist_pass3(ds, col, mask_value, lo0, hi0, bins)
        n = below0 + above0 + int(hist0.sum())
        if n == 0:
            return [None] * len(qs)
        top_pre = (below0, hist0)
    else:
        mom = moments(ds, col, mask_value)
        n = int(mom["count"].sum())
        if n == 0:
            return [None] * len(qs)
        lo0, hi0 = float(np.nanmin(mom["min"])), float(np.nanmax(mom["max"]))
        if lo0 == hi0:
            return [lo0] * len(qs)
    # needed 0-based order statistics (k and k+1 for interpolation)
    want: dict[int, None] = {}
    for q in qs:
        p = q * (n - 1)
        k = int(np.floor(p))
        want[min(k, n - 1)] = None
        want[min(k + 1, n - 1)] = None
    ks = sorted(want)

    # bracket each k: (lo, hi, below) with <= max_bracket values inside
    max_bracket = 2_000_000
    brackets: dict[int, tuple[float, float]] = {}

    def bracket(lo, hi, targets, depth=0, pre=None):
        below, hist = pre if pre is not None else _hist_pass(ds, col, mask_value, lo, hi, bins)
        cum = np.cumsum(hist) + below
        edges = np.linspace(lo, hi, bins + 1)
        by_bin: dict[int, list[int]] = {}
        for k in targets:
            b = int(np.searchsorted(cum, k + 1))
            b = min(b, bins - 1)
            by_bin.setdefault(b, []).append(k)
        for b, kk in by_bin.items():
            if hist[b] > max_bracket and depth < 6 and edges[b] < edges[b + 1]:
                bracket(float(edges[b]), float(edges[b + 1]), kk, depth + 1)
            else:
                for k in kk:
                    brackets[k] = (float(edges[b]), float(edges[b + 1]))

    bracket(lo0, hi0, ks, pre=top_pre)
    # merge overlapping/adjacent ranges so the collect pass stays small
    uniq = sorted(set(brackets.values()))
    merged: list[list[float]] = []
    for lo, hi in uniq:
        if merged and lo <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    ranges = [(lo, hi) for lo, hi in merged]
    range_of = {}
    for k, (lo, hi) in brackets.items():
        for i, (mlo, mhi) in enumerate(ranges):
            if mlo <= lo and hi <= mhi:
                range_of[k] = i
                break

    fn = _MultiRangeCollectPartial(col, mask_value, ranges)
    if isinstance(ds, pa.Table):
        rows = fn(ds).to_pylist()
    else:
        rows = _project(ds, [col]).map_batches(
            fn, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
    below_tot = np.zeros(len(ranges), np.int64)
    vals_per: list[list[np.ndarray]] = [[] for _ in ranges]
    for r in rows:
        below_tot[r["r"]] += r["below"]
        vals_per[r["r"]].append(np.asarray(r["v"], dtype=np.float64))
    sorted_vals = [np.sort(np.concatenate(v)) if v else np.zeros(0) for v in vals_per]

    def order_stat(k: int) -> float:
        i = range_of[k]
        return float(sorted_vals[i][k - below_tot[i]])

    out = []
    for q in qs:
        p = q * (n - 1)
        k = int(np.floor(p))
        frac = p - k
        v1 = order_stat(min(k, n - 1))
        if frac == 0.0:
            out.append(v1)
        else:
            v2 = order_stat(min(k + 1, n - 1))
            out.append(v1 * (1.0 - frac) + v2 * frac)
    return out


class _ValueCountsPartial:
    """Per-block value counts of a column flattened to strings (combiner side
    of the vocab fit — pre-aggregates before the small shuffle)."""

    def __init__(self, cols: list[str], mask_token: str | None, guard: bool = True):
        self.cols = cols
        self.mask_token = mask_token
        # The per-block cardinality guard protects the DRIVER-merge path; when
        # the caller runs the distributed sort+limit path (top_k set) the
        # driver only sees k rows, so a high-cardinality block is fine.
        self.guard = guard

    def __call__(self, batch: pa.Table) -> pa.Table:
        tabs = []
        for col in self.cols:
            flat = _flat_values(batch, col)
            if not pa.types.is_string(flat.type):
                flat = pc.cast(flat, pa.string(), safe=False)
            vc = flat.value_counts()
            vals, cnts = vc.field("values"), vc.field("counts")
            keep = pc.is_valid(vals)
            if self.mask_token is not None:
                keep = pc.and_kleene(keep, pc.invert(pc.equal(vals, self.mask_token)))
            vals, cnts = vals.filter(keep), cnts.filter(keep)
            tabs.append(pa.table({"value": vals, "count": pc.cast(cnts, pa.int64())}))
        out = pa.concat_tables(tabs)
        if len(self.cols) > 1 and out.num_rows:
            out = out.group_by("value").aggregate([("count", "sum")])
            out = out.rename_columns(["value", "count"])
        if self.guard and out.num_rows > MAX_DRIVER_VOCAB:
            raise VocabOverflowError(
                f"block-level vocabulary over {self.cols} exceeds MAX_DRIVER_VOCAB="
                f"{MAX_DRIVER_VOCAB}; set max_num_labels or use HashIndex"
            )
        if out.num_rows == 0:
            return pa.table({"value": pa.array([], pa.string()), "count": pa.array([], pa.int64())})
        return out


def value_counts(
    ds,
    cols: list[str],
    mask_token: str | None = None,
    order: str | None = None,
    top_k: int | None = None,
) -> dict[str, int]:
    """Distributed value counts -> driver dict (vocab-sized by construction).

    When ``top_k`` is set (estimator ``max_num_labels``), the limit is pushed
    into the distributed plan as a sort+limit matching ``order`` — the driver
    only ever receives k rows, making high-cardinality fits safe. Without a
    top_k, more than MAX_DRIVER_VOCAB distinct values raises
    VocabOverflowError instead of OOMing the driver."""
    fn = _ValueCountsPartial(cols, mask_token, guard=top_k is None)
    if isinstance(ds, pa.Table):
        rows = fn(ds).to_pylist()
    else:
        partial = _project(ds, cols).map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
        agg = partial.groupby("value").sum("count")
        if top_k is not None:
            # distributed top-k with the SAME tie-break as ordered_labels
            if order in (None, "frequencyDesc"):
                agg = agg.sort(["sum(count)", "value"], descending=[True, False])
            elif order == "frequencyAsc":
                agg = agg.sort(["sum(count)", "value"], descending=[False, False])
            elif order == "alphabeticalAsc":
                agg = agg.sort("value")
            elif order == "alphabeticalDesc":
                agg = agg.sort("value", descending=True)
            else:
                raise ValueError(f"unknown string_order_type {order}")
            agg = agg.limit(top_k)
        # stream the merged counts: the early overflow raise below fires
        # before the driver materializes an unbounded vocabulary
        out: dict[str, int] = {}
        for b in agg.iter_batches(batch_format="pyarrow"):
            for v, c in zip(b.column("value").to_pylist(), b.column("sum(count)").to_pylist()):
                out[v] = out.get(v, 0) + c
            if top_k is None and len(out) > MAX_DRIVER_VOCAB:
                raise VocabOverflowError(
                    f"vocabulary over {cols} exceeds MAX_DRIVER_VOCAB={MAX_DRIVER_VOCAB} "
                    "distinct values; set max_num_labels on the estimator (pushes a "
                    "distributed sort+limit) or use HashIndex for unbounded-cardinality keys"
                )
        return out
    out = {}
    for r in rows:
        out[r["value"]] = out.get(r["value"], 0) + r["count"]
    return out


def ordered_labels(
    counts: dict[str, int],
    string_order_type: str = "frequencyDesc",
    max_num_labels: int | None = None,
) -> list[str]:
    """Order vocab labels. Frequency ties break lexicographically — a
    deterministic refinement of the reference (which leaves ties unspecified,
    reference: indexer_utils.py:111-118; see SURVEY.md §2.13 note)."""
    if string_order_type == "frequencyDesc":
        labels = sorted(counts, key=lambda v: (-counts[v], v))
    elif string_order_type == "frequencyAsc":
        labels = sorted(counts, key=lambda v: (counts[v], v))
    elif string_order_type == "alphabeticalAsc":
        labels = sorted(counts)
    elif string_order_type == "alphabeticalDesc":
        labels = sorted(counts, reverse=True)
    else:
        raise ValueError(f"unknown string_order_type {string_order_type}")
    if max_num_labels is not None:
        labels = labels[:max_num_labels]
    return labels
