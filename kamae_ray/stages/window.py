"""Point-in-time / windowed layer: as-of join, lag/lead, backfill,
sessionize-by-gap, cumulative and rolling aggregates.

This layer is NEW capability (no reference analog — the reference has no
joins or event-time windows, see SURVEY.md §2.14); semantics follow
BASELINE.json ``north_rule``: entity key = e.g. ``(source, doc_id)`` or
``user_id``, event time = a monotone position/timestamp column, and every
feature at time t is computable from rows with t' <= t only — zero temporal
leakage (strict ``<`` available via ``strict=True``).

Ray design:
- Both sides of the as-of join are co-partitioned by a hash shuffle on the
  entity key (one ``groupby(by).map_groups`` over the tagged union), then each
  partition performs a single vectorized sorted merge (np.searchsorted over
  the group's time vector) — O((n+m) log(n+m)) per entity, no per-row search.
- Keyed window ops are per-entity ordered scans over the same shuffle: one
  ``groupby(entity).map_groups`` with a fused numpy kernel; original row
  order inside each group is preserved in the output (kernels scatter back).
- Skew: ``salt_partitions`` on the as-of join splits a hot LEFT side into
  salted sub-keys and replicates the (small) right side of each entity into
  every salt — the merge stays partition-local. Ordered scans cannot be
  salted without boundary hand-off; entities are assumed to fit a partition
  (documented partitioning assumption).
- Ties at equal timestamps follow stable sort order (original arrival order);
  pin a deterministic secondary key upstream for full reproducibility.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kamae_ray.base import Transformer, _append_or_replace
from kamae_ray.functions import arrays as A

_SIDE = "__kr_side"
_TIME = "__kr_t"
_SALT = "__kr_salt"


def _time_to_numeric(arr: pa.Array) -> pa.Array:
    if pa.types.is_timestamp(arr.type):
        return pc.cast(arr, pa.int64())
    if pa.types.is_integer(arr.type):
        return pc.cast(arr, pa.int64())
    return pc.cast(arr, pa.float64(), safe=False)


def asof_join(
    left,
    right,
    by: Sequence[str],
    left_on: str,
    right_on: str | None = None,
    right_cols: Sequence[str] | None = None,
    strict: bool = False,
    tolerance: float | None = None,
    suffix: str = "_r",
    salt_partitions: int | None = None,
):
    """For each left row at time t, attach the latest right row of the same
    entity with t' <= t (or t' < t when ``strict``). Unmatched -> nulls.

    Works on ``ray.data.Dataset`` pairs (hash shuffle + partition-local sorted
    merge) and on ``pa.Table`` pairs (single-partition path, used in tests).
    """
    right_on = right_on or left_on
    by = list(by)
    if isinstance(left, pa.Table):
        return _asof_merge_tables(
            left, right, by, left_on, right_on, right_cols, strict, tolerance, suffix
        )

    import ray.data  # noqa: F401  (caller owns the session)

    left_schema = left.schema()
    right_schema = right.schema()
    l_names = list(left_schema.names)
    payload = [c for c in (right_cols or right_schema.names) if c not in by and c != right_on]
    payload_out = [f"{c}{suffix}" if c in l_names else c for c in payload]
    l_types = dict(zip(left_schema.names, left_schema.types))
    r_types = dict(zip(right_schema.names, right_schema.types))

    time_is_float = not (
        (pa.types.is_integer(l_types[left_on]) or pa.types.is_timestamp(l_types[left_on]))
        and (pa.types.is_integer(r_types[right_on]) or pa.types.is_timestamp(r_types[right_on]))
    )
    t_type = pa.float64() if time_is_float else pa.int64()

    salts = int(salt_partitions) if salt_partitions else 1

    def prep_left(batch: pa.Table) -> pa.Table:
        cols = {c: batch.column(c) for c in l_names}
        for c, out_name in zip(payload, payload_out):
            cols[out_name] = pa.nulls(batch.num_rows, r_types[c])
        t = _time_to_numeric(A.as_array(batch.column(left_on)))
        cols[_TIME] = pc.cast(t, t_type, safe=False)
        cols[_SIDE] = pa.array(np.zeros(batch.num_rows, dtype=np.int8))
        if salts > 1:
            cols[_SALT] = pa.array(
                (np.arange(batch.num_rows) % salts).astype(np.int32)
            )
        return pa.table(cols)

    def prep_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out_tables = []
        base: dict = {}
        for c in l_names:
            if c in by:
                base[c] = pc.cast(A.as_array(batch.column(c)), l_types[c], safe=False)
            else:
                base[c] = pa.nulls(n, l_types[c])
        for c, out_name in zip(payload, payload_out):
            base[out_name] = batch.column(c)
        t = _time_to_numeric(A.as_array(batch.column(right_on)))
        base[_TIME] = pc.cast(t, t_type, safe=False)
        base[_SIDE] = pa.array(np.ones(n, dtype=np.int8))
        if salts > 1:
            # replicate right rows into every salt so each sub-partition can
            # merge locally (right side is the small side by assumption)
            for s in range(salts):
                cols = dict(base)
                cols[_SALT] = pa.array(np.full(n, s, dtype=np.int32))
                out_tables.append(pa.table(cols))
            return pa.concat_tables(out_tables)
        return pa.table(base)

    lt = left.map_batches(prep_left, batch_format="pyarrow", zero_copy_batch=True)
    rt = right.map_batches(prep_right, batch_format="pyarrow", zero_copy_batch=True)
    both = lt.union(rt)
    keys = by + ([_SALT] if salts > 1 else [])

    merge = _AsofGroupMerge(payload_out, strict, tolerance, salts > 1)
    merge.__name__ = "asof_merge"  # ray map_groups wraps fn and reads __name__
    return both.groupby(keys).map_groups(merge, batch_format="pyarrow")


class _AsofGroupMerge:
    """Partition-local streaming merge for one entity (or entity×salt)."""

    def __init__(self, payload_out: list[str], strict: bool, tolerance, salted: bool):
        self.payload_out = payload_out
        self.strict = strict
        self.tolerance = tolerance
        self.salted = salted

    def __call__(self, group: pa.Table) -> pa.Table:
        side = group.column(_SIDE).to_numpy(zero_copy_only=False)
        t = group.column(_TIME).to_numpy(zero_copy_only=False)
        l_idx = np.nonzero(side == 0)[0]
        r_idx = np.nonzero(side == 1)[0]
        drop = [_SIDE, _TIME] + ([_SALT] if self.salted else [])
        if len(l_idx) == 0:
            empty = group.slice(0, 0)
            return empty.drop_columns(drop)
        left_rows = group.take(pa.array(l_idx))
        lt = t[l_idx]
        if len(r_idx) == 0:
            return left_rows.drop_columns(drop)
        rt = t[r_idx]
        order = np.argsort(rt, kind="stable")
        rt_sorted = rt[order]
        side_mode = "left" if self.strict else "right"
        pos = np.searchsorted(rt_sorted, lt, side=side_mode) - 1
        matched = pos >= 0
        if self.tolerance is not None:
            with np.errstate(invalid="ignore"):
                matched &= (lt - rt_sorted[np.clip(pos, 0, None)]) <= self.tolerance
        src_rows = r_idx[order[np.clip(pos, 0, None)]]
        cols = {}
        for name in left_rows.column_names:
            if name in drop:
                continue
            if name in self.payload_out:
                payload_col = A.as_array(group.column(name)).take(pa.array(src_rows))
                if not matched.all():
                    payload_col = pc.if_else(
                        pa.array(matched), payload_col, pa.nulls(len(matched), payload_col.type)
                    )
                cols[name] = payload_col
            else:
                cols[name] = left_rows.column(name)
        return pa.table(cols)


def _asof_merge_tables(left, right, by, left_on, right_on, right_cols, strict, tolerance, suffix):
    """Single-partition reference implementation over pa.Tables (tests)."""
    l_names = list(left.column_names)
    payload = [c for c in (right_cols or right.column_names) if c not in by and c != right_on]
    payload_out = [f"{c}{suffix}" if c in l_names else c for c in payload]
    lt = _time_to_numeric(A.as_array(left.column(left_on))).to_numpy(zero_copy_only=False)
    rt = _time_to_numeric(A.as_array(right.column(right_on))).to_numpy(zero_copy_only=False)
    l_keys = ["\x1f".join(str(left.column(k)[i].as_py()) for k in by) for i in range(left.num_rows)]
    r_keys = ["\x1f".join(str(right.column(k)[i].as_py()) for k in by) for i in range(right.num_rows)]
    r_by_key: dict[str, list[int]] = {}
    for i, k in enumerate(r_keys):
        r_by_key.setdefault(k, []).append(i)
    side_mode = "left" if strict else "right"
    match_idx = np.full(left.num_rows, -1, dtype=np.int64)
    for i, k in enumerate(l_keys):
        cand = r_by_key.get(k)
        if not cand:
            continue
        cand_arr = np.asarray(cand)
        order = np.argsort(rt[cand_arr], kind="stable")
        sorted_t = rt[cand_arr][order]
        p = int(np.searchsorted(sorted_t, lt[i], side=side_mode)) - 1
        if p >= 0:
            if tolerance is not None and (lt[i] - sorted_t[p]) > tolerance:
                continue
            match_idx[i] = cand_arr[order[p]]
    out = left
    for c, out_name in zip(payload, payload_out):
        col = A.as_array(right.column(c))
        if right.num_rows == 0:
            out = _append_or_replace(out, out_name, pa.nulls(left.num_rows, col.type))
            continue
        taken = col.take(pa.array(np.clip(match_idx, 0, None)))
        matched = match_idx >= 0
        if not matched.all():
            taken = pc.if_else(pa.array(matched), taken, pa.nulls(len(matched), col.type))
        out = _append_or_replace(out, out_name, taken)
    return out


class KeyedWindowTransformer(Transformer):
    """Base for per-entity ordered-scan ops: sort each entity's rows by the
    time column (stable), apply a vectorized kernel in time order, scatter
    results back to original row positions."""

    compatible_dtypes = None
    fusible = False
    #: emit NaN kernel results as Arrow nulls (SQL window-function parity)
    nan_as_null = True

    def __init__(self, *args, entity_cols: Sequence[str], time_col: str, **kwargs):
        super().__init__(*args, **kwargs)
        self.entity_cols = list(entity_cols)
        self.time_col = time_col

    def _kernel(self, vals_sorted: np.ndarray, t_sorted: np.ndarray) -> tuple[np.ndarray, pa.DataType]:
        raise NotImplementedError

    def _value_array(self, group: pa.Table):
        col = A.as_array(group.column(self.input_col))
        vals, mask = A.to_numpy(col, dtype=None)
        vals = vals.astype(np.float64, copy=True) if vals.dtype != object else vals
        if mask is not None and vals.dtype != object:
            vals[mask] = np.nan
        return vals

    def _map_group(self, group: pa.Table) -> pa.Table:
        t = _time_to_numeric(A.as_array(group.column(self.time_col))).to_numpy(zero_copy_only=False)
        order = np.argsort(t, kind="stable")
        vals = self._value_array(group)
        out_sorted, out_type = self._kernel(vals[order], t[order])
        out = np.empty_like(out_sorted)
        out[order] = out_sorted
        if out_sorted.dtype == object:
            col = pa.array(out.tolist(), out_type)
        else:
            mask = (
                np.isnan(out)
                if self.nan_as_null and np.issubdtype(out.dtype, np.floating)
                else None
            )
            col = pa.array(out, out_type, mask=mask) if mask is not None else pa.array(out, out_type)
        return _append_or_replace(group, self.output_col, self._cast_out(col))

    def transform(self, ds):
        if isinstance(ds, pa.Table):
            return self._transform_table(ds)
        return ds.groupby(self.entity_cols).map_groups(self._map_group, batch_format="pyarrow")

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        return self._transform_table(batch)

    def _transform_table(self, t: pa.Table) -> pa.Table:
        keys = [
            "\x1f".join(str(t.column(k)[i].as_py()) for k in self.entity_cols)
            for i in range(t.num_rows)
        ]
        _, inv = np.unique(np.asarray(keys), return_inverse=True)
        pieces = []
        idx_order = []
        for g in range(inv.max() + 1) if t.num_rows else []:
            idx = np.nonzero(inv == g)[0]
            pieces.append(self._map_group(t.take(pa.array(idx))))
            idx_order.append(idx)
        if not pieces:
            return self._map_group(t)
        combined = pa.concat_tables(pieces)
        back = np.empty(t.num_rows, dtype=np.int64)
        back[np.concatenate(idx_order)] = np.arange(t.num_rows)
        return combined.take(pa.array(back))


class LagTransformer(KeyedWindowTransformer):
    """Value of ``input_col`` k rows earlier within the entity's time order;
    first k rows -> ``default`` (null if None). Lead with negative offsets via
    LeadTransformer. Zero leakage: only past rows are read."""

    def __init__(self, *args, offset: int = 1, default=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.offset = int(offset)
        self.default = default

    def _kernel(self, vals, t):
        k = self.offset
        out = np.full(len(vals), np.nan)
        if k < len(vals):
            out[k:] = vals[: len(vals) - k]
        if self.default is not None:
            out = np.where(np.isnan(out), float(self.default), out)
        return out, pa.float64()


class LeadTransformer(KeyedWindowTransformer):
    """Value k rows later (future-looking — NOT leakage-safe; for label
    construction, e.g. next-event prediction targets)."""

    def __init__(self, *args, offset: int = 1, default=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.offset = int(offset)
        self.default = default

    def _kernel(self, vals, t):
        k = self.offset
        out = np.full(len(vals), np.nan)
        if k < len(vals):
            out[: len(vals) - k] = vals[k:]
        if self.default is not None:
            out = np.where(np.isnan(out), float(self.default), out)
        return out, pa.float64()


class BackfillTransformer(KeyedWindowTransformer):
    """Fill nulls from neighbours in time order: ``method='ffill'`` carries
    the last non-null earlier value (leakage-safe); ``'bfill'`` takes the next
    non-null later value (future-looking)."""

    def __init__(self, *args, method: str = "ffill", **kwargs):
        super().__init__(*args, **kwargs)
        if method not in ("ffill", "bfill"):
            raise ValueError("method must be ffill|bfill")
        self.method = method

    def _kernel(self, vals, t):
        n = len(vals)
        isnan = np.isnan(vals)
        if self.method == "ffill":
            idx = np.where(~isnan, np.arange(n), -1)
            np.maximum.accumulate(idx, out=idx)
            out = np.where(idx >= 0, vals[np.clip(idx, 0, None)], np.nan)
        else:
            rev = vals[::-1]
            isnan_r = np.isnan(rev)
            idx = np.where(~isnan_r, np.arange(n), -1)
            np.maximum.accumulate(idx, out=idx)
            out = np.where(idx >= 0, rev[np.clip(idx, 0, None)], np.nan)[::-1]
        return out, pa.float64()


class SessionizeTransformer(KeyedWindowTransformer):
    """New session whenever the gap to the previous event exceeds
    ``gap``; emits a 0-based session index per entity (int64)."""

    def __init__(self, *args, gap: float, input_col: str | None = None, **kwargs):
        kwargs.setdefault("input_col", input_col)
        super().__init__(*args, **kwargs)
        self.gap = float(gap)

    def _value_array(self, group):
        # sessionize needs no value column; reuse time
        return np.zeros(group.num_rows)

    def _kernel(self, vals, t):
        if len(t) == 0:
            return np.zeros(0, dtype=np.int64), pa.int64()
        delta = np.diff(t.astype(np.float64))
        new_session = np.concatenate([[0], (delta > self.gap).astype(np.int64)])
        return np.cumsum(new_session), pa.int64()


_CUM_STATS = ("sum", "count", "mean", "min", "max")


class CumulativeAggTransformer(KeyedWindowTransformer):
    """Expanding (point-in-time) aggregate over the entity's rows up to the
    current one: ``include_current=False`` uses strictly earlier rows only —
    the canonical leakage-free training feature. NaN rows are skipped."""

    def __init__(self, *args, stat: str = "sum", include_current: bool = True, **kwargs):
        super().__init__(*args, **kwargs)
        if stat not in _CUM_STATS:
            raise ValueError(f"stat must be one of {_CUM_STATS}")
        self.stat = stat
        self.include_current = include_current

    def _kernel(self, vals, t):
        x = vals.astype(np.float64, copy=True)
        nanmask = np.isnan(x)
        filled = np.where(nanmask, 0.0, x)
        cnt = np.cumsum(~nanmask)
        s = np.cumsum(filled)
        if self.stat == "min":
            out = np.minimum.accumulate(np.where(nanmask, np.inf, x))
            out = np.where(np.isinf(out), np.nan, out)
        elif self.stat == "max":
            out = np.maximum.accumulate(np.where(nanmask, -np.inf, x))
            out = np.where(np.isinf(out), np.nan, out)
        elif self.stat == "sum":
            out = np.where(cnt > 0, s, np.nan)
        elif self.stat == "count":
            out = cnt.astype(np.float64)
        else:  # mean
            out = np.where(cnt > 0, s / np.where(cnt == 0, 1, cnt), np.nan)
        if not self.include_current:
            shifted = np.full(len(out), np.nan)
            if len(out) > 1:
                shifted[1:] = out[:-1]
            if self.stat == "count":
                shifted = np.where(np.isnan(shifted), 0.0, shifted)
            out = shifted
        return out, pa.float64()


class RollingAggTransformer(KeyedWindowTransformer):
    """Rolling aggregate over the previous ``window`` rows (inclusive of the
    current row) in time order."""

    def __init__(self, *args, stat: str = "mean", window: int = 3, min_periods: int = 1, **kwargs):
        super().__init__(*args, **kwargs)
        if stat not in _CUM_STATS:
            raise ValueError(f"stat must be one of {_CUM_STATS}")
        self.stat = stat
        self.window = int(window)
        self.min_periods = int(min_periods)

    def _kernel(self, vals, t):
        import pandas as pd

        s = pd.Series(vals)
        r = s.rolling(self.window, min_periods=self.min_periods)
        out = getattr(r, self.stat)().to_numpy()
        return out, pa.float64()
