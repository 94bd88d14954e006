"""Point-in-time / windowed layer: as-of join, lag/lead, backfill,
sessionize-by-gap, cumulative and rolling aggregates.

This layer is NEW capability (no reference analog — the reference has no
joins or event-time windows, see SURVEY.md §2.14); semantics follow
BASELINE.json ``north_rule``: entity key = e.g. ``(source, doc_id)`` or
``user_id``, event time = a monotone position/timestamp column, and every
feature at time t is computable from rows with t' <= t only — zero temporal
leakage (strict ``<`` available via ``strict=True``).

Ray design (scale-critical path — no per-group Python):
- ONE sort-shuffle on the entity key (``ds.sort(entity)``, the same shuffle
  ``groupby().map_groups`` relies on: equal keys never straddle blocks), then
  a single vectorized block kernel: factorize keys -> lexsort by
  (entity, time) inside the block -> segmented numpy scans (cumsum /
  accumulate with the segment-start reset trick) -> scatter back to the
  block's row order.
- As-of join: both sides tagged and unioned, co-partitioned by the same
  entity sort; inside each block rows are lexsorted by (entity, time, side)
  and the latest-right-at-or-before-t is ONE ``np.maximum.accumulate`` over
  right-row indices — O(n log n) per block, no per-row search, no per-entity
  calls. A stale accumulate value from the previous entity is detected by
  comparing against the row's segment start (globally increasing indices).
- Skew: ``salt_partitions`` splits a hot LEFT side into salted sub-keys and
  replicates the (small) right side of each entity into every salt — the
  merge stays partition-local. Ordered scans cannot be salted without
  boundary hand-off; entities are assumed to fit a partition (documented
  partitioning assumption).
- Ties at equal timestamps follow stable sort order (original arrival
  order); pin a deterministic secondary key upstream for reproducibility.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kamae_ray.base import Transformer, _append_or_replace
from kamae_ray.functions import arrays as A
from kamae_ray.functions import segments as S

_SIDE = "__kr_side"
_TIME = "__kr_t"
_SALT = "__kr_salt"
_TB = "__kr_tb"


def _time_to_numeric(arr: pa.Array) -> pa.Array:
    if pa.types.is_timestamp(arr.type):
        return pc.cast(arr, pa.int64())
    if pa.types.is_integer(arr.type):
        return pc.cast(arr, pa.int64())
    return pc.cast(arr, pa.float64(), safe=False)


class _NamedFn:
    def __init__(self, fn, name):
        self.fn = fn
        self.__name__ = name

    def __call__(self, *a, **k):
        return self.fn(*a, **k)


class _ChainedBlockFn:
    """Apply several wide stages' block kernels over one shared sort."""

    def __init__(self, stages):
        self.stages = list(stages)
        self.__name__ = "+".join(type(s).__name__ for s in self.stages)[:60]

    def __call__(self, block: pa.Table) -> pa.Table:
        for s in self.stages:
            block = s._block_fn(block)
        return block


def check_sorted_partitioning(ds, keys: Sequence[str]):
    """Validate the partitioning contract the block kernels rely on: after
    ``ds.sort(keys)`` no key value may appear in two different blocks. One
    cheap extra pass (per-block first/last key only reaches the driver);
    raises ValueError naming the offending key if the contract is broken
    (e.g. a Ray upgrade changing sort boundary semantics, or a single entity
    larger than a block). Opt-in guard — used by tests and available to
    callers running on unfamiliar Ray versions."""
    keys = list(keys)

    def first_last(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return block.select(keys).slice(0, 0)
        return pa.concat_tables([block.select(keys).slice(0, 1), block.select(keys).slice(block.num_rows - 1, 1)])

    fl = ds.map_batches(_NamedFn(first_last, "partition_probe"), batch_format="pyarrow", batch_size=None)
    rows = fl.take_all()
    # rows arrive as [first_0, last_0, first_1, last_1, ...] in block order
    seen_last: set = set()
    for i in range(0, len(rows) - 1, 2):
        first_key = tuple(rows[i][k] for k in keys)
        last_key = tuple(rows[i + 1][k] for k in keys)
        if first_key in seen_last:
            raise ValueError(
                f"sorted-partitioning contract broken: key {first_key} straddles "
                "two blocks — block kernels would silently mis-compute. "
                "Check the Ray sort implementation / entity size vs block size."
            )
        seen_last.add(last_key)


def sorted_block_apply(ds, keys, fn, name, schema=None, force_surrogate=False):
    """ONE distributed sort-shuffle on ``keys`` then a block kernel.

    String keys sort via a vectorized int64 surrogate
    (functions/sortkeys.py): the kernels group by the REAL key columns inside
    each block, so the shuffle only has to co-locate equal keys — comparing
    one int64 is far cheaper than full string tuples (measured 140 -> ~20
    CPU-s of SortMap on a 6M-row window pass)."""
    from kamae_ray.functions import sortkeys as SK

    srt, used = SK.surrogate_sorted(ds, list(keys), schema=schema, force=force_surrogate)
    wrapped = _NamedFn((lambda b: fn(SK.drop_skey(b))) if used else fn, name)
    return srt.map_batches(wrapped, batch_format="pyarrow", batch_size=None)


def apply_sorted(ds, *stages):
    """Run several listwise/window stages that share the same ``sort_keys``
    over ONE sort-shuffle (instead of one shuffle per stage)."""
    keys = stages[0].sort_keys
    for s in stages[1:]:
        if s.sort_keys != keys:
            raise ValueError(f"sort_keys differ: {s.sort_keys} vs {keys}")
    chain = _ChainedBlockFn(stages)
    if isinstance(ds, pa.Table):
        return chain(ds)
    return sorted_block_apply(ds, keys, chain, chain.__name__)


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------


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
    salt_partitions: int | str | None = None,
    right_tiebreak: str | None = None,
    hot_key_rows: int = 1_000_000,
    direction: str = "backward",
):
    """For each left row at time t, attach the latest right row of the same
    entity with t' <= t (or t' < t when ``strict``). Unmatched -> nulls.

    ``direction="forward"`` flips the match to the EARLIEST right row with
    t' >= t (strict: t' > t; tolerance: t' - t <= tolerance) — implemented
    by negating the internal numeric time, so it shares the exact backward
    kernel, partitioning contract and salting. Tiebreak still takes the
    LARGEST ``right_tiebreak`` among equal timestamps.

    ``direction="nearest"`` (pandas ``merge_asof(direction='nearest')``
    parity) matches the right row minimizing ``|t' - t|``; equidistant
    backward/forward candidates resolve BACKWARD (the leakage-safe side);
    ``strict`` excludes exact-equal timestamps; ``tolerance`` bounds the
    absolute distance. Distances compare in the EXACT int64 time domain
    (never the float sort key) so microsecond-epoch timestamps can't alias.
    Implemented as two mirrored segmented scans inside the SAME block merge
    — one extra lexsort, no extra shuffle.

    Works on ``ray.data.Dataset`` pairs (entity sort-shuffle + vectorized
    block merge) and on ``pa.Table`` pairs (single-block path, same kernel).

    ``right_tiebreak``: optional numeric right column; when several right
    rows share the same (entity, time), the one with the LARGEST tiebreak
    value wins deterministically (default: arrival order, which is stable
    per run but not across shuffles).

    ``salt_partitions``: an int salts EVERY entity (left split round-robin,
    right replicated — original opt-in behaviour); ``"auto"`` first detects
    hot LEFT entities (> ``hot_key_rows`` rows; functions/skew.py — one extra
    streaming read of the left side) and salts ONLY those, so the
    replication cost is paid exactly where the skew is. No hot entities ->
    plain unsalted plan.
    """
    right_on = right_on or left_on
    by = list(by)
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be backward|forward|nearest")
    neg = direction == "forward"
    nearest = direction == "nearest"

    if isinstance(left, pa.Table):
        l_names = list(left.column_names)
        r_types = {f.name: f.type for f in right.schema}
        l_types = {f.name: f.type for f in left.schema}
        payload = [c for c in (right_cols or right.column_names) if c not in by and c != right_on]
        payload_out = [f"{c}{suffix}" if c in l_names else c for c in payload]
        t_type = _union_time_type(l_types[left_on], r_types[right_on])
        lt = _prep_side(left, l_names, by, payload, payload_out, r_types, l_types, left_on, right_on, t_type, side=0, salts=1, tiebreak=right_tiebreak, neg=neg)
        rt = _prep_side(right, l_names, by, payload, payload_out, r_types, l_types, left_on, right_on, t_type, side=1, salts=1, tiebreak=right_tiebreak, neg=neg)
        both = pa.concat_tables([lt, rt])
        merge = _AsofBlockMerge(by, payload_out, strict, tolerance, salted=False, tiebreak=right_tiebreak is not None, nearest=nearest)
        return merge(both)

    from kamae_ray.base import dataset_schema

    left_schema = dataset_schema(left)
    right_schema = dataset_schema(right)
    l_names = list(left_schema.names)
    payload = [c for c in (right_cols or right_schema.names) if c not in by and c != right_on]
    payload_out = [f"{c}{suffix}" if c in l_names else c for c in payload]
    l_types = dict(zip(left_schema.names, left_schema.types))
    r_types = dict(zip(right_schema.names, right_schema.types))
    t_type = _union_time_type(l_types[left_on], r_types[right_on])
    hot_keys = None
    if salt_partitions == "auto":
        from kamae_ray.functions.skew import detect_hot_keys
        from kamae_ray.stages.join import _combined_key

        hot = detect_hot_keys(left, by, hot_key_rows)
        if hot.num_rows:
            hot = pa.table({k: pc.cast(A.as_array(hot.column(k)), l_types[k], safe=False) for k in by})
            hot_keys = pc.unique(_combined_key(hot, by))
            salts = 16
        else:
            salts = 1
    else:
        salts = int(salt_partitions) if salt_partitions else 1

    def prep_left(batch: pa.Table) -> pa.Table:
        return _prep_side(batch, l_names, by, payload, payload_out, r_types, l_types, left_on, right_on, t_type, 0, salts, tiebreak=right_tiebreak, hot_keys=hot_keys, neg=neg)

    def prep_right(batch: pa.Table) -> pa.Table:
        return _prep_side(batch, l_names, by, payload, payload_out, r_types, l_types, left_on, right_on, t_type, 1, salts, tiebreak=right_tiebreak, hot_keys=hot_keys, neg=neg)

    lt = left.map_batches(_NamedFn(prep_left, "asof_prep_left"), batch_format="pyarrow", zero_copy_batch=True)
    rt = right.map_batches(_NamedFn(prep_right, "asof_prep_right"), batch_format="pyarrow", zero_copy_batch=True)
    both = lt.union(rt)
    keys = by + ([_SALT] if salts > 1 else [])
    merge = _AsofBlockMerge(by, payload_out, strict, tolerance, salted=salts > 1, tiebreak=right_tiebreak is not None, nearest=nearest)
    return sorted_block_apply(both, keys, merge, "asof_merge")


def _union_time_type(lt: pa.DataType, rt: pa.DataType) -> pa.DataType:
    int_like = lambda t: pa.types.is_integer(t) or pa.types.is_timestamp(t)
    return pa.int64() if (int_like(lt) and int_like(rt)) else pa.float64()


def _prep_side(
    batch, l_names, by, payload, payload_out, r_types, l_types, left_on, right_on, t_type, side, salts, tiebreak=None, hot_keys=None, neg=False
):
    n = batch.num_rows
    if side == 0:
        cols = {c: batch.column(c) for c in l_names}
        for c, out_name in zip(payload, payload_out):
            cols[out_name] = pa.nulls(n, r_types[c])
        t = _time_to_numeric(A.as_array(batch.column(left_on)))
    else:
        cols = {}
        for c in l_names:
            if c in by:
                cols[c] = pc.cast(A.as_array(batch.column(c)), l_types[c], safe=False)
            else:
                cols[c] = pa.nulls(n, l_types[c])
        for c, out_name in zip(payload, payload_out):
            cols[out_name] = batch.column(c)
        t = _time_to_numeric(A.as_array(batch.column(right_on)))
    cols[_TIME] = pc.cast(t, t_type, safe=False)
    if neg:  # forward as-of rides the backward kernel on negated time
        cols[_TIME] = pc.negate(cols[_TIME])
    cols[_SIDE] = pa.array(np.full(n, side, dtype=np.int8))
    if tiebreak is not None:
        if side == 1:
            cols[_TB] = pc.cast(A.as_array(batch.column(tiebreak)), pa.float64(), safe=False)
        else:
            cols[_TB] = pa.array(np.zeros(n))
    if salts > 1:
        if hot_keys is not None:
            # selective salting (salt_partitions="auto"): only detected hot
            # entities split/replicate; everything else rides salt 0
            from kamae_ray.stages.join import _combined_key

            key = _combined_key(pa.table({k: cols[k] for k in by}), by)
            hot_m = pc.is_valid(pc.index_in(key, value_set=hot_keys)).to_numpy(zero_copy_only=False)
            if side == 0:
                salt = np.zeros(n, dtype=np.int32)
                salt[hot_m] = np.arange(int(hot_m.sum())) % salts
                cols[_SALT] = pa.array(salt)
                return pa.table(cols)
            cols[_SALT] = pa.array(np.zeros(n, dtype=np.int32))
            out = pa.table(cols)
            hot_idx = np.flatnonzero(hot_m)
            if len(hot_idx):
                extra = out.take(pa.array(np.tile(hot_idx, salts - 1)))
                extra = extra.set_column(
                    extra.column_names.index(_SALT), _SALT,
                    pa.array(np.repeat(np.arange(1, salts, dtype=np.int32), len(hot_idx))),
                )
                out = pa.concat_tables([out, extra])
            return out
        if side == 0:
            cols[_SALT] = pa.array((np.arange(n) % salts).astype(np.int32))
            return pa.table(cols)
        # replicate right rows into every salt (small side by assumption)
        parts = []
        for s in range(salts):
            c2 = dict(cols)
            c2[_SALT] = pa.array(np.full(n, s, dtype=np.int32))
            parts.append(pa.table(c2))
        return pa.concat_tables(parts)
    return pa.table(cols)


class _AsofBlockMerge:
    """Vectorized block-local merge: one lexsort + one maximum.accumulate."""

    def __init__(self, by, payload_out, strict, tolerance, salted, tiebreak=False, nearest=False):
        self.by = by
        self.payload_out = payload_out
        self.strict = strict
        self.tolerance = tolerance
        self.salted = salted
        self.tiebreak = tiebreak
        self.nearest = nearest

    def _scan(self, t_sort, tb, side, side_key, gids, n):
        """One segmented backward scan over a (gids, t_sort, side_key, tb)
        lexsort: for every left row, the latest preceding right row index.
        Returns (left_orig, src_orig, matched) in original-row coordinates."""
        if tb is not None:
            order = np.lexsort((tb, side_key, t_sort, gids))
        else:
            order = np.lexsort((side_key, t_sort, gids))
        side_a = side[order]
        starts, lens = S.segments(gids[order])
        srep = np.repeat(starts, lens)
        idx = np.arange(n)
        last_right = np.maximum.accumulate(np.where(side_a == 1, idx, -1))
        left_pos = np.nonzero(side_a == 0)[0]
        lr = last_right[left_pos]
        matched = lr >= srep[left_pos]
        return order[left_pos], order[np.clip(lr, 0, None)], matched

    def __call__(self, block: pa.Table) -> pa.Table:
        drop = [_SIDE, _TIME] + ([_SALT] if self.salted else []) + ([_TB] if self.tiebreak else [])
        n = block.num_rows
        if n == 0:
            return block.drop_columns(drop)
        side = block.column(_SIDE).to_numpy(zero_copy_only=False)
        t_raw = block.column(_TIME).to_numpy(zero_copy_only=False)
        t = t_raw.astype(np.float64, copy=False)
        keys = self.by + ([_SALT] if self.salted else [])
        gids = S.group_ids(block, keys)
        # at equal times: non-strict wants rights visible to lefts (right
        # sorts first); strict hides them (left sorts first)
        side_key = (1 - side) if not self.strict else side
        # within equal (entity, t) the max-tiebreak right sorts LAST and
        # therefore wins the maximum.accumulate
        tb = block.column(_TB).to_numpy(zero_copy_only=False) if self.tiebreak else None
        if self.nearest:
            # Two mirrored scans in the EXACT time domain (int64 for integer/
            # timestamp time — float sort keys alias above 2^53 us).
            left_orig, src_orig, matched = self._scan(t_raw, tb, side, side_key, gids, n)
            dist_b = np.abs(t_raw[left_orig] - t_raw[src_orig])
            if self.tolerance is not None:
                matched &= dist_b <= self.tolerance
            # forward scan: mirror time; tb stays ASCENDING so the max-tb
            # right still sorts last among the equal nearest-future rows
            lf, sf, mf = self._scan(-t_raw, tb, side, side_key, gids, n)
            dist_f = np.abs(t_raw[lf] - t_raw[sf])
            if self.tolerance is not None:
                mf &= dist_f <= self.tolerance
            # combine per original left row: smaller distance wins, ties
            # resolve BACKWARD (strict < on the forward update)
            big = np.iinfo(np.int64).max if t_raw.dtype.kind == "i" else np.inf
            best_src = np.full(n, -1, dtype=np.int64)
            best_dist = np.full(n, big, dtype=dist_b.dtype)
            best_src[left_orig[matched]] = src_orig[matched]
            best_dist[left_orig[matched]] = dist_b[matched]
            upd = mf & (dist_f < best_dist[lf])
            best_src[lf[upd]] = sf[upd]
            # every left row appears exactly once in left_orig
            matched = best_src[left_orig] >= 0
            src_orig = np.clip(best_src[left_orig], 0, None)
            left_rows = block.take(pa.array(left_orig))
        else:
            if tb is not None:
                order = np.lexsort((tb, side_key, t, gids))
            else:
                order = np.lexsort((side_key, t, gids))
            side_a = side[order]
            t_a = t[order]
            starts, lens = S.segments(gids[order])
            srep = np.repeat(starts, lens)
            idx = np.arange(n)
            last_right = np.maximum.accumulate(np.where(side_a == 1, idx, -1))
            left_pos = np.nonzero(side_a == 0)[0]
            lr = last_right[left_pos]
            matched = lr >= srep[left_pos]
            if self.tolerance is not None:
                with np.errstate(invalid="ignore"):
                    matched &= (t_a[left_pos] - t_a[np.clip(lr, 0, None)]) <= self.tolerance
            left_orig = order[left_pos]
            src_orig = order[np.clip(lr, 0, None)]
            left_rows = block.take(pa.array(left_orig))
        cols = {}
        matched_pa = pa.array(matched)
        for name in left_rows.column_names:
            if name in drop:
                continue
            if name in self.payload_out:
                payload_col = A.as_array(block.column(name)).take(pa.array(src_orig))
                if not matched.all():
                    payload_col = pc.if_else(matched_pa, payload_col, pa.nulls(len(matched), payload_col.type))
                cols[name] = payload_col
            else:
                cols[name] = left_rows.column(name)
        return pa.table(cols)


# ---------------------------------------------------------------------------
# keyed window ops
# ---------------------------------------------------------------------------


class KeyedWindowTransformer(Transformer):
    """Base for per-entity ordered-scan ops: one block kernel that lexsorts by
    (entity, time), runs a segmented vectorized scan, and scatters results
    back to original row positions (block row order is preserved)."""

    compatible_dtypes = None
    fusible = False
    #: emit NaN kernel results as Arrow nulls (SQL window-function parity)
    nan_as_null = True
    out_type = pa.float64()

    def __init__(self, *args, entity_cols: Sequence[str], time_col: str, **kwargs):
        super().__init__(*args, **kwargs)
        self.entity_cols = list(entity_cols)
        self.time_col = time_col

    @property
    def sort_keys(self) -> list[str]:
        """Shuffle key — consecutive wide stages with equal sort_keys share
        ONE sort (PipelineModel fusion / apply_sorted)."""
        return list(self.entity_cols)

    # subclasses implement: sorted values/time + segment structure -> sorted output
    def _seg_kernel(self, vals, t, starts, lens, srep) -> np.ndarray:
        raise NotImplementedError

    def _needs_values(self) -> bool:
        return True

    def _block_fn(self, block: pa.Table) -> pa.Table:
        n = block.num_rows
        if n == 0:
            return _append_or_replace(block, self.output_col, pa.array([], self.out_type))
        gids = S.group_ids(block, self.entity_cols)
        # sort by the EXACT native numeric time (int64 for timestamps —
        # microsecond epochs exceed 2^53, so a float64 sort key aliases
        # ~256us-apart rows into arrival order); kernels keep float64 t
        t_raw = _time_to_numeric(A.as_array(block.column(self.time_col))).to_numpy(zero_copy_only=False)
        t = t_raw.astype(np.float64, copy=False)
        order = np.lexsort((t_raw, gids))
        gs = gids[order]
        t_s = t[order]
        starts, lens = S.segments(gs)
        srep = np.repeat(starts, lens)
        if self._needs_values():
            flat = A.as_array(block.column(self.input_col))
            vals, mask = A.to_numpy(pc.cast(flat, pa.float64(), safe=False))
            vals = vals.astype(np.float64, copy=True)
            if mask is not None:
                vals[mask] = np.nan
            vals = vals[order]
        else:
            vals = None
        res_sorted = self._seg_kernel(vals, t_s, starts, lens, srep)
        out = np.empty(n, dtype=res_sorted.dtype)
        out[order] = res_sorted
        if np.issubdtype(out.dtype, np.floating) and self.nan_as_null:
            col = pa.array(out, self.out_type, mask=np.isnan(out))
        else:
            col = pa.array(out, self.out_type)
        return _append_or_replace(block, self.output_col, self._cast_out(col))

    def transform(self, ds):
        if isinstance(ds, pa.Table):
            return self._block_fn(ds)
        self._validate_ds_schema(ds)
        return sorted_block_apply(ds, self.entity_cols, self._block_fn, type(self).__name__)

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        return self._block_fn(batch)


class LagTransformer(KeyedWindowTransformer):
    """Value of ``input_col`` k rows earlier within the entity's time order;
    first k rows -> ``default`` (null if None). Zero leakage: reads past only."""

    def __init__(self, *args, offset: int = 1, default=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.offset = int(offset)
        self.default = default

    def _seg_kernel(self, vals, t, starts, lens, srep):
        out = S.seg_lag(vals, self.offset, srep)
        if self.default is not None:
            out = np.where(np.isnan(out), float(self.default), out)
        return out


class LeadTransformer(KeyedWindowTransformer):
    """Value k rows later (future-looking — NOT leakage-safe; for label
    construction, e.g. next-event prediction targets)."""

    def __init__(self, *args, offset: int = 1, default=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.offset = int(offset)
        self.default = default

    def _seg_kernel(self, vals, t, starts, lens, srep):
        lens_rep = np.repeat(lens, lens)
        out = S.seg_lead(vals, self.offset, srep, lens_rep)
        if self.default is not None:
            out = np.where(np.isnan(out), float(self.default), out)
        return out


class BackfillTransformer(KeyedWindowTransformer):
    """Fill nulls from neighbours in time order: ``method='ffill'`` carries
    the last non-null earlier value (leakage-safe); ``'bfill'`` takes the next
    non-null later value (future-looking)."""

    def __init__(self, *args, method: str = "ffill", **kwargs):
        super().__init__(*args, **kwargs)
        if method not in ("ffill", "bfill"):
            raise ValueError("method must be ffill|bfill")
        self.method = method

    def _seg_kernel(self, vals, t, starts, lens, srep):
        if self.method == "ffill":
            return S.seg_ffill(vals, srep)
        lens_rep = np.repeat(lens, lens)
        return S.seg_bfill(vals, srep, lens_rep)


class SessionizeTransformer(KeyedWindowTransformer):
    """New session whenever the gap to the previous event exceeds ``gap``;
    emits a 0-based session index per entity (int64)."""

    nan_as_null = False
    out_type = pa.int64()

    def __init__(self, *args, gap: float, input_col: str | None = None, **kwargs):
        kwargs.setdefault("input_col", input_col)
        super().__init__(*args, **kwargs)
        self.gap = float(gap)

    def _needs_values(self):
        return False

    def _seg_kernel(self, vals, t, starts, lens, srep):
        return S.seg_sessionize(t, self.gap, starts, lens)


_RANK_METHODS = ("row_number", "rank", "dense_rank", "percent_rank", "ntile", "cume_dist")


class WindowRankTransformer(KeyedWindowTransformer):
    """SQL ranking window functions over (PARTITION BY entity ORDER BY time):
    ``row_number`` / ``rank`` / ``dense_rank`` / ``percent_rank`` / ``ntile``.

    rank/dense_rank/percent_rank are deterministic under order-key ties (tied
    rows get equal output, SQL semantics). row_number/ntile are only
    deterministic when the order key is unique within each entity — same
    caveat as SQL; pass a composite/unique key column for reproducible runs
    (documented ListRank precedent).

    Vectorized per block: one lexsort, tie starts from one shifted compare,
    everything else is arange/cumsum arithmetic — no per-group Python."""

    nan_as_null = False

    def __init__(self, *args, method: str = "row_number", n_tiles: int = 4,
                 input_col: str | None = None, **kwargs):
        kwargs.setdefault("input_col", input_col)
        super().__init__(*args, **kwargs)
        if method not in _RANK_METHODS:
            raise ValueError(f"method must be one of {_RANK_METHODS}")
        self.method = method
        self.n_tiles = int(n_tiles)
        self.out_type = pa.float64() if method in ("percent_rank", "cume_dist") else pa.int64()

    def _needs_values(self):
        return False

    def _seg_kernel(self, vals, t, starts, lens, srep):
        n = len(t)
        pos = np.arange(n, dtype=np.int64) - srep  # 0-based within segment
        if self.method == "row_number":
            return pos + 1
        if self.method == "ntile":
            ln = np.repeat(lens, lens)
            k = self.n_tiles
            q, r = ln // k, ln % k
            big = r * (q + 1)  # rows covered by the (q+1)-sized leading tiles
            small_q = np.where(q == 0, 1, q)  # k >= len(segment): every row its own tile
            return np.where(
                pos < big, pos // np.where(q + 1 == 0, 1, q + 1) + 1,
                r + (pos - big) // small_q + 1,
            ).astype(np.int64)
        # tie structure: a new value starts at each segment start or t change
        new_val = np.ones(n, dtype=bool)
        if n > 1:
            new_val[1:] = (t[1:] != t[:-1]) | (srep[1:] != srep[:-1])
        if self.method == "cume_dist":
            # SQL CUME_DIST: (# peers with value <= current) / partition size
            # = (index of the LAST row of this tie run - segment start + 1)/len
            idx = np.arange(n, dtype=np.int64)
            is_end = np.ones(n, dtype=bool)
            if n > 1:
                is_end[:-1] = new_val[1:]
            run_end = np.minimum.accumulate(np.where(is_end, idx, n)[::-1])[::-1]
            ln = np.repeat(lens, lens)
            return (run_end - srep + 1) / ln
        if self.method == "dense_rank":
            cum = np.cumsum(new_val)
            return (cum - cum[srep] + 1).astype(np.int64)
        # rank: 1 + index-in-segment of the first row with this value
        first_eq = np.maximum.accumulate(np.where(new_val, np.arange(n, dtype=np.int64), -1))
        rank = first_eq - srep + 1
        if self.method == "rank":
            return rank
        ln = np.repeat(lens, lens)
        with np.errstate(invalid="ignore", divide="ignore"):
            return np.where(ln > 1, (rank - 1) / np.where(ln == 1, 1, ln - 1), 0.0)


class WindowValueTransformer(KeyedWindowTransformer):
    """SQL FIRST_VALUE / LAST_VALUE over the WHOLE partition
    (``ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING``) in time
    order: every row of an entity gets the entity's first (or last) value —
    e.g. first-touch attribution, final-state labels. NaN/null values are
    REAL values here (SQL: FIRST_VALUE does not skip nulls); ties on the
    order key follow the stable lexsort (use a unique key for determinism,
    same caveat as SQL).

    The kernel is a TYPE-PRESERVING Arrow gather (no float64 round-trip):
    strings, timestamps and int64 come through exactly — first-touch
    channels and exact session-start timestamps work, and microsecond-epoch
    values can't alias in a float cast."""

    def __init__(self, *args, method: str = "first_value", **kwargs):
        super().__init__(*args, **kwargs)
        if method not in ("first_value", "last_value"):
            raise ValueError("method must be first_value|last_value")
        self.method = method

    def _block_fn(self, block: pa.Table) -> pa.Table:
        n = block.num_rows
        arr = A.as_array(block.column(self.input_col))
        if n == 0:
            return _append_or_replace(block, self.output_col, arr.slice(0, 0))
        gids = S.group_ids(block, self.entity_cols)
        # exact native numeric sort key (see KeyedWindowTransformer._block_fn)
        t_raw = _time_to_numeric(A.as_array(block.column(self.time_col))).to_numpy(
            zero_copy_only=False)
        order = np.lexsort((t_raw, gids))
        starts, lens = S.segments(gids[order])
        srep = np.repeat(starts, lens)
        if self.method == "first_value":
            src_sorted = order[srep]
        else:
            src_sorted = order[srep + np.repeat(lens, lens) - 1]
        idx = np.empty(n, np.int64)
        idx[order] = src_sorted
        out = arr.take(pa.array(idx))
        return _append_or_replace(block, self.output_col, self._cast_out(out))


class EwmMeanTransformer(KeyedWindowTransformer):
    """Exponentially weighted moving mean per entity in time order —
    ``y_0 = x_0``, ``y_t = (1-alpha) y_{t-1} + alpha x_t`` (pandas
    ``ewm(alpha, adjust=False, ignore_na=True).mean()`` semantics: null/NaN
    rows emit the previous mean and don't advance the decay). The classic
    leakage-safe recency feature (reads past rows only).

    Kernel: functions/segments.seg_ewm_mean — the sequential recurrence
    rewritten as a per-segment scaled cumsum processed in bounded-exponent
    chunks (no per-row Python; ~L-row numpy passes)."""

    def __init__(self, *args, alpha: float, **kwargs):
        super().__init__(*args, **kwargs)
        if not 0.0 < float(alpha) <= 1.0:
            raise ValueError("alpha must be in (0, 1]")
        self.alpha = float(alpha)

    def _seg_kernel(self, vals, t, starts, lens, srep):
        return S.seg_ewm_mean(vals, starts, lens, self.alpha)


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

    def _seg_kernel(self, vals, t, starts, lens, srep):
        nanmask = np.isnan(vals)
        filled = np.where(nanmask, 0.0, vals)
        cnt = S.seg_cumsum((~nanmask).astype(np.float64), starts, lens)
        if self.stat == "min":
            out = S.seg_cummin(np.where(nanmask, np.inf, vals), starts, lens)
            out = np.where(np.isinf(out), np.nan, out)
        elif self.stat == "max":
            out = S.seg_cummax(np.where(nanmask, -np.inf, vals), starts, lens)
            out = np.where(np.isinf(out), np.nan, out)
        else:
            s = S.seg_cumsum(filled, starts, lens)
            if self.stat == "sum":
                out = np.where(cnt > 0, s, np.nan)
            elif self.stat == "count":
                out = cnt
            else:
                with np.errstate(invalid="ignore", divide="ignore"):
                    out = np.where(cnt > 0, s / np.where(cnt == 0, 1, cnt), np.nan)
        if not self.include_current:
            out = S.seg_lag(out, 1, srep)
            if self.stat == "count":
                out = np.where(np.isnan(out), 0.0, out)
        return out


_ROLL_STATS = _CUM_STATS + ("median", "quantile")


class RollingAggTransformer(KeyedWindowTransformer):
    """Rolling aggregate over the previous ``window`` rows (inclusive of the
    current row) in time order. sum/count/mean are O(n) via prefix sums;
    min/max/median fall back to pandas' C rolling kernels (median is the
    O(n log w) skiplist selection — exact, NaN-skipping, no float
    accumulation, so it is deterministic cross-engine like SQL
    ``median(...) OVER (... ROWS BETWEEN w-1 PRECEDING AND CURRENT ROW)``)."""

    def __init__(self, *args, stat: str = "mean", window: int = 3, min_periods: int = 1,
                 q: float = 0.5, **kwargs):
        super().__init__(*args, **kwargs)
        if stat not in _ROLL_STATS:
            raise ValueError(f"stat must be one of {_ROLL_STATS}")
        self.stat = stat
        self.window = int(window)
        self.min_periods = int(min_periods)
        # stat="quantile" only: rolling q-quantile with pandas' linear
        # interpolation sorted[lo] + (sorted[hi]-sorted[lo]) * (pos-lo),
        # pos = q*(n-1). The SQL mirror is bit-identical PROVIDED the oracle
        # casts q to DOUBLE (a bare 0.9 literal is DECIMAL in DuckDB and the
        # decimal pos arithmetic diverges — measured 30000/30000 equal with
        # the cast, 7866/30000 without).
        self.q = float(q)

    def _seg_kernel(self, vals, t, starts, lens, srep):
        if self.stat in ("sum", "count", "mean"):
            s, cnt = S.seg_rolling_sum_count(vals, self.window, srep)
            with np.errstate(invalid="ignore", divide="ignore"):
                if self.stat == "sum":
                    out = np.where(cnt > 0, s, np.nan)
                elif self.stat == "count":
                    out = cnt.astype(np.float64)
                else:
                    out = np.where(cnt > 0, s / np.where(cnt == 0, 1, cnt), np.nan)
        else:
            import pandas as pd

            ser = pd.Series(vals)
            gid_rep = np.repeat(np.arange(len(starts)), lens)
            r = ser.groupby(gid_rep).rolling(self.window, min_periods=1)
            if self.stat == "quantile":
                out = r.quantile(self.q, interpolation="linear").to_numpy()
            else:
                out = getattr(r, self.stat)().to_numpy()
        if self.min_periods > 1:
            _, cnt_all = S.seg_rolling_sum_count(np.where(np.isnan(vals), np.nan, vals), self.window, srep)
            out = np.where(cnt_all >= self.min_periods, out, np.nan)
        return out


def broadcast_asof_join(
    left,
    right: pa.Table,
    by: Sequence[str],
    left_on: str,
    right_on: str | None = None,
    right_cols: Sequence[str] | None = None,
    strict: bool = False,
    tolerance: float | None = None,
    suffix: str = "_r",
    right_tiebreak: str | None = None,
    direction: str = "backward",
):
    """As-of join with a SMALL right side: the right table is sorted ONCE on
    the driver, broadcast via ``ray.put``, and every left batch resolves its
    matches with a vectorized per-entity binary search — NO shuffle and NO
    sort of the left side. This is the streaming complement to ``asof_join``
    (sort-merge): at 100 TB the left never leaves its read order, so the
    whole join is one ``map_batches`` over the scan.

    Semantics match ``asof_join`` (latest right with t' <= t, or < t when
    ``strict``; ``tolerance``; ``right_tiebreak`` = max wins among equal
    (entity, time), else right arrival order) with ONE documented
    divergence: NULL entities follow SQL (never match; null-keyed right rows
    are dropped) — the sort-merge path groups nulls together instead.

    ``direction="nearest"`` mirrors ``asof_join(direction="nearest")``:
    min ``|t'-t|``, equidistant resolves backward, strict excludes equal
    timestamps, tolerance bounds the absolute distance, max tiebreak among
    the winning side's equal-time run. Distances and search comparisons run
    in the EXACT native time domain (int64 for timestamps), three
    O(log segment) vectorized binary-search passes per batch.
    """
    import ray

    from kamae_ray.stages.join import _combined_key

    if direction not in ("backward", "nearest"):
        raise ValueError("broadcast_asof_join supports direction backward|nearest")
    nearest = direction == "nearest"
    right_on = right_on or left_on
    by = list(by)
    from kamae_ray.base import dataset_schema

    l_schema = dataset_schema(left)
    l_names = list(l_schema.names)
    l_types = {f.name: f.type for f in l_schema}
    r_types = {f.name: f.type for f in right.schema}
    payload = [c for c in (right_cols or right.column_names) if c not in by and c != right_on]
    payload_out = [f"{c}{suffix}" if c in l_names else c for c in payload]
    t_type = _union_time_type(l_types[left_on], r_types[right_on])

    # ---- driver-side right prep (small by contract) ----
    rkey = _combined_key(right, by)
    if rkey.null_count:
        right = right.filter(pc.is_valid(rkey))  # SQL: null keys never match
        rkey = _combined_key(right, by)
    # nearest compares exact distances: keep the native numeric time domain
    # (int64 for timestamps — float64 aliases above 2^53)
    _num_t = pa.float64() if t_type == pa.float64() else pa.int64()
    rt = pc.cast(_time_to_numeric(A.as_array(right.column(right_on))), _num_t, safe=False)
    rt_np = rt.to_numpy(zero_copy_only=False)
    # stable sort: (entity, time, [tiebreak]); the LAST row of an equal
    # (entity, time) run wins — stable order = arrival, tiebreak = max wins
    d = rkey.dictionary_encode()
    ent = pc.fill_null(d.indices, 0).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    if right_tiebreak is not None:
        tb = pc.cast(A.as_array(right.column(right_tiebreak)), pa.float64(), safe=False).to_numpy(zero_copy_only=False)
        order = np.lexsort((tb, rt_np, ent))
    else:
        order = np.lexsort((np.arange(len(ent)), rt_np, ent))
    ent_s = ent[order]
    times_s = rt_np[order]
    pay_s = right.select(payload).take(pa.array(order))
    # per-entity segment bounds, indexed by dictionary code
    n_ent = len(d.dictionary)
    seg_start = np.searchsorted(ent_s, np.arange(n_ent), side="left")
    seg_end = np.searchsorted(ent_s, np.arange(n_ent), side="right")
    state = {
        "ent_keys": d.dictionary,  # distinct entity keys (combined)
        "times": times_s,
        "payload": pay_s,
        "seg_start": seg_start,
        "seg_end": seg_end,
    }

    def join_batch(batch: pa.Table, st) -> pa.Table:
        n = batch.num_rows
        if len(st["times"]) == 0:  # empty right side: everything unmatched
            out = batch
            for c, out_name in zip(payload, payload_out):
                out = out.append_column(out_name, pa.nulls(n, r_types[c]))
            return out
        lkey = _combined_key(batch, by)
        code = pc.index_in(lkey, value_set=st["ent_keys"])
        if lkey.null_count:
            code = pc.if_else(pc.is_valid(lkey), code, pa.nulls(n, code.type))
        has_ent = pc.is_valid(code).to_numpy(zero_copy_only=False)
        code_np = pc.fill_null(code, 0).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        t = pc.cast(_time_to_numeric(A.as_array(batch.column(left_on))), _num_t, safe=False)
        if t.null_count:
            has_t = pc.is_valid(t).to_numpy(zero_copy_only=False)
            t = pc.fill_null(t, 0)
        else:
            has_t = None
        t_np = t.to_numpy(zero_copy_only=False)
        times = st["times"]
        seg_lo = np.where(has_ent, st["seg_start"][code_np], 0).astype(np.int64)
        seg_hi = np.where(has_ent, st["seg_end"][code_np], 0).astype(np.int64)

        def ins_point(leq: bool) -> np.ndarray:
            # vectorized binary search: FIRST idx in [seg_lo, seg_hi) with
            # times[idx] > t (leq=True) or >= t (leq=False);
            # O(log max_segment) numpy passes
            lo, hi = seg_lo.copy(), seg_hi.copy()
            while True:
                active = lo < hi
                if not active.any():
                    break
                mid = (lo + hi) // 2
                mv = times[np.clip(mid, 0, max(len(times) - 1, 0))]
                go_right = (mv <= t_np) if leq else (mv < t_np)
                go_right &= active
                lo = np.where(go_right, mid + 1, lo)
                hi = np.where(active & ~go_right, mid, hi)
            return lo

        if nearest:
            # backward: last idx with t' <= t (strict: < t)
            back_idx = ins_point(leq=not strict) - 1
            mb = has_ent & (back_idx >= seg_lo)
            dist_b = np.where(mb, t_np - times[np.clip(back_idx, 0, max(len(times) - 1, 0))], 0)
            if tolerance is not None:
                mb &= dist_b <= tolerance
            # forward: first idx with t' > t (equal times already belong to
            # the non-strict backward winner at distance 0)
            fwd_start = ins_point(leq=True)
            mf = has_ent & (fwd_start < seg_hi)
            ft = times[np.clip(fwd_start, 0, max(len(times) - 1, 0))]
            dist_f = np.where(mf, ft - t_np, 0)
            if tolerance is not None:
                mf &= dist_f <= tolerance
            # max-tiebreak among the forward run's equal timestamps: the
            # run's LAST row (sorted (t, tb) ascending) — one more search
            # against the run's own timestamp
            lo, hi = np.maximum(fwd_start, seg_lo), seg_hi.copy()
            tv = ft
            while True:
                active = lo < hi
                if not active.any():
                    break
                mid = (lo + hi) // 2
                mv = times[np.clip(mid, 0, max(len(times) - 1, 0))]
                go_right = (mv <= tv) & active
                lo = np.where(go_right, mid + 1, lo)
                hi = np.where(active & ~go_right, mid, hi)
            fwd_idx = lo - 1
            take_fwd = mf & (~mb | (dist_f < dist_b))  # ties resolve backward
            matched = mb | mf
            match_idx = np.where(take_fwd, fwd_idx, back_idx)
        else:
            match_idx = ins_point(leq=not strict) - 1
            matched = has_ent & (match_idx >= seg_lo)
            if tolerance is not None:
                mt = times[np.clip(match_idx, 0, max(len(times) - 1, 0))]
                matched &= (t_np - mt) <= tolerance
        if has_t is not None:
            matched &= has_t
        elif _num_t == pa.float64():
            with np.errstate(invalid="ignore"):
                matched &= ~np.isnan(t_np)
        take_idx = pa.array(np.where(matched, np.clip(match_idx, 0, None), 0), pa.int64())
        matched_pa = pa.array(matched)
        out = batch
        for c, out_name in zip(payload, payload_out):
            colv = A.as_array(st["payload"].column(c)).take(take_idx) if len(st["payload"]) else pa.nulls(n, r_types[c])
            if not matched.all():
                colv = pc.if_else(matched_pa, colv.combine_chunks() if isinstance(colv, pa.ChunkedArray) else colv, pa.nulls(n, colv.type))
            out = out.append_column(out_name, colv)
        return out

    if isinstance(left, pa.Table):
        return join_batch(left, state)

    state_ref = ray.put(state)

    class _BroadcastAsof:
        def __init__(self, ref):
            self._st = ray.get(ref)  # once per actor/task process
            self.__name__ = "broadcast_asof"

        def __call__(self, batch: pa.Table) -> pa.Table:
            return join_batch(batch, self._st)

    state_bytes = int(state["times"].nbytes + seg_start.nbytes + seg_end.nbytes
                      + pay_s.nbytes)
    if state_bytes < (64 << 20):
        # SMALL broadcast state: plain tasks — ray.get per task is one
        # zero-copy plasma read of ~MBs, while an autoscaling actor pool
        # pays ramp-up (starts at 1 actor) that dominates short stages
        def bjoin(batch: pa.Table) -> pa.Table:
            return join_batch(batch, ray.get(state_ref))

        bjoin.__name__ = "broadcast_asof"
        return left.map_batches(bjoin, batch_format="pyarrow",
                                zero_copy_batch=True, batch_size=None)

    try:
        _cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        _cpus = 8
    return left.map_batches(
        _BroadcastAsof,
        fn_constructor_args=(state_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
        # autoscaling actor pool sized to the CLUSTER, not a fixed 8 — a
        # hardcoded cap left 3/4 of a 32-cpu node idle on this stage
        concurrency=(1, max(8, _cpus)),
    )


class TimeRangeRollingTransformer(KeyedWindowTransformer):
    """Rolling aggregate over a TIME RANGE per entity — SQL
    ``SUM(v) OVER (PARTITION BY entity ORDER BY t
    RANGE BETWEEN w PRECEDING AND CURRENT ROW)``: every row of the same
    entity with t' in [t - w, t], INCLUDING all peers at exactly t (SQL RANGE
    frames are peer-inclusive, which also makes the result deterministic
    under timestamp ties). ``include_current=False`` flips to t' < t — the
    leak-free variant (peers excluded too).

    ``range_width`` is in the numeric units of the time column after
    casting (timestamps: their storage unit, e.g. microseconds).

    Kernel: one vectorized two-pointer pass — per-segment window bounds via
    ``searchsorted`` on stride-offset times, window sums from prefix sums;
    O(n log n) per block, no per-entity loop. Stats: sum | count | mean.
    """

    def __init__(self, *args, stat: str = "sum", range_width: float,
                 min_periods: int = 1, include_current: bool = True, **kwargs):
        super().__init__(*args, **kwargs)
        if stat not in ("sum", "count", "mean"):
            raise ValueError("stat must be sum|count|mean")
        self.stat = stat
        self.range_width = float(range_width)
        self.min_periods = int(min_periods)
        self.include_current = include_current

    def _seg_kernel(self, vals, t, starts, lens, srep):
        n = len(t)
        if n == 0:
            return np.zeros(0)
        side = "right" if self.include_current else "left"
        # Segment-relative times keep magnitudes small so the stride-offset
        # trick (one global searchsorted instead of one per entity) stays
        # EXACT in float64; if the offset range would exceed the 2^52 margin
        # (ulp >= 0.5 could misclassify an integer-time boundary row), fall
        # back to an exact per-segment searchsorted loop.
        t_rel = t - t[srep]
        stride = float(t_rel.max()) + self.range_width + 1.0
        n_seg = len(starts)
        if n_seg * stride < 2.0**52:
            gid_rep = np.repeat(np.arange(n_seg, dtype=np.float64), lens)
            t_adj = t_rel + gid_rep * stride
            lo = np.searchsorted(t_adj, t_adj - self.range_width, side="left")
            hi = np.searchsorted(t_adj, t_adj, side=side)
        else:
            lo = np.empty(n, dtype=np.int64)
            hi = np.empty(n, dtype=np.int64)
            for s0, ln in zip(starts, lens):
                seg = t[s0 : s0 + ln]
                lo[s0 : s0 + ln] = s0 + np.searchsorted(seg, seg - self.range_width, side="left")
                hi[s0 : s0 + ln] = s0 + np.searchsorted(seg, seg, side=side)
        ok = ~np.isnan(vals)
        vz = np.where(ok, vals, 0.0)
        cs = np.concatenate(([0.0], np.cumsum(vz)))
        cc = np.concatenate(([0], np.cumsum(ok.astype(np.int64))))
        s = cs[hi] - cs[lo]
        c = cc[hi] - cc[lo]
        with np.errstate(invalid="ignore", divide="ignore"):
            if self.stat == "sum":
                out = np.where(c > 0, s, np.nan)
            elif self.stat == "count":
                out = c.astype(np.float64)
            else:
                out = np.where(c > 0, s / np.where(c == 0, 1, c), np.nan)
        if self.min_periods > 1:
            out = np.where(c >= self.min_periods, out, np.nan)
        return out


_RSTART = "__kr_rs"
_REND = "__kr_re"


def range_join(
    left,
    right,
    by: Sequence[str],
    left_on: str,
    right_start: str,
    right_end: str,
    right_cols: Sequence[str] | None = None,
    how: str = "inner",
    suffix: str = "_r",
    max_chunk_rows: int = 10_000_000,
):
    """Interval-containment (range) join: a left row at time t matches EVERY
    right interval of the same entity with ``start <= t <= end`` (SQL
    ``p JOIN i ON p.key = i.key AND p.t BETWEEN i.s AND i.e``). ``how`` is
    ``'inner'`` (unmatched points dropped) or ``'left'`` (kept with null
    right columns). Duplicate/overlapping intervals each produce a row.

    Null semantics: null entity keys never match (SQL); intervals with a
    null endpoint and points with a null time never match.

    Scale plan: same ONE sort-shuffle as asof_join/shuffle_join (entity key
    co-locates both sides; whole entities per block). Per entity the
    candidate window for a point is intervals with
    ``start in [t - max_span, t]`` where ``max_span`` is the entity's widest
    interval — two searchsorteds on the start-sorted interval array, exact
    for any input and tight when spans are bounded (sessions, validity
    windows, promotions). Output pairs stream out of the block kernel in
    ``max_chunk_rows`` chunks, so a pathological entity (every interval
    covering every point) costs wall-clock, never memory."""
    by = list(by)
    if how not in ("inner", "left"):
        raise ValueError("how must be inner|left")

    from kamae_ray.base import dataset_schema

    l_schema = dataset_schema(left) if not isinstance(left, pa.Table) else left.schema
    r_schema = dataset_schema(right) if not isinstance(right, pa.Table) else right.schema
    l_names = list(l_schema.names)
    l_types = {f.name: f.type for f in l_schema}
    r_types = {f.name: f.type for f in r_schema}
    payload = [c for c in (right_cols or list(r_schema.names))
               if c not in by and c not in (right_start, right_end)]
    payload_out = [f"{c}{suffix}" if c in l_names else c for c in payload]
    t_type = _union_time_type(
        _union_time_type(l_types[left_on], r_types[right_start]), r_types[right_end]
    )

    def prep(batch: pa.Table, side: int) -> pa.Table:
        n = batch.num_rows
        if side == 0:
            cols = {c: batch.column(c) for c in l_names}
            for c, out_name in zip(payload, payload_out):
                cols[out_name] = pa.nulls(n, r_types[c])
            cols[_TIME] = pc.cast(_time_to_numeric(A.as_array(batch.column(left_on))), t_type, safe=False)
            cols[_RSTART] = pa.nulls(n, t_type)
            cols[_REND] = pa.nulls(n, t_type)
        else:
            cols = {}
            for c in l_names:
                if c in by:
                    cols[c] = pc.cast(A.as_array(batch.column(c)), l_types[c], safe=False)
                else:
                    cols[c] = pa.nulls(n, l_types[c])
            for c, out_name in zip(payload, payload_out):
                cols[out_name] = batch.column(c)
            cols[_TIME] = pa.nulls(n, t_type)
            cols[_RSTART] = pc.cast(_time_to_numeric(A.as_array(batch.column(right_start))), t_type, safe=False)
            cols[_REND] = pc.cast(_time_to_numeric(A.as_array(batch.column(right_end))), t_type, safe=False)
        cols[_SIDE] = pa.array(np.full(n, side, dtype=np.int8))
        return pa.table(cols)

    meta = [_SIDE, _TIME, _RSTART, _REND]

    def merge(block: pa.Table):
        n = block.num_rows
        out_names = [c for c in block.column_names if c not in meta]
        if n == 0:
            yield block.drop_columns(meta)
            return
        side = block.column(_SIDE).to_numpy(zero_copy_only=False)
        t, tmask = A.to_numpy(pc.cast(block.column(_TIME), pa.float64(), safe=False))
        s0, smask = A.to_numpy(pc.cast(block.column(_RSTART), pa.float64(), safe=False))
        e0, emask = A.to_numpy(pc.cast(block.column(_REND), pa.float64(), safe=False))
        t = t.astype(np.float64, copy=True)
        s0 = s0.astype(np.float64, copy=True)
        e0 = e0.astype(np.float64, copy=True)
        if tmask is not None:
            t[tmask] = np.nan
        if smask is not None:
            s0[smask] = np.nan
        if emask is not None:
            e0[emask] = np.nan
        # null entity keys never match
        keynull = np.zeros(n, dtype=bool)
        for k in by:
            col = A.as_array(block.column(k))
            if col.null_count:
                keynull |= pc.is_null(col).to_numpy(zero_copy_only=False)
        gids = S.group_ids(block, by)
        is_pt = side == 0
        # drop unusable rows: null-key or null-time points handled per how;
        # intervals with any null endpoint can never match
        pt_dead = is_pt & (keynull | np.isnan(t))
        iv_ok = (~is_pt) & ~keynull & ~np.isnan(s0) & ~np.isnan(e0)
        unmatched_dead = None
        if how == "left" and pt_dead.any():
            unmatched_dead = block.filter(pa.array(pt_dead)).drop_columns(meta)
        pts = np.flatnonzero(is_pt & ~pt_dead)
        ivs = np.flatnonzero(iv_ok)
        emitted = False
        if len(pts) and len(ivs):
            p_order = pts[np.lexsort((t[pts], gids[pts]))]
            i_order = ivs[np.lexsort((s0[ivs], gids[ivs]))]
            pg, ig = gids[p_order], gids[i_order]
            pt_t = t[p_order]
            iv_s, iv_e = s0[i_order], e0[i_order]
            p_starts, p_lens = S.segments(pg)
            i_starts, i_lens = S.segments(ig)
            # align segment lists: entities present on both sides
            common, pi, ii = np.intersect1d(pg[p_starts], ig[i_starts], return_indices=True)
            lo = np.zeros(len(p_order), dtype=np.int64)
            hi = np.zeros(len(p_order), dtype=np.int64)
            for k in range(len(common)):
                ps, pl = p_starts[pi[k]], p_lens[pi[k]]
                is_, il = i_starts[ii[k]], i_lens[ii[k]]
                seg_s = iv_s[is_: is_ + il]
                seg_e = iv_e[is_: is_ + il]
                span = float(np.max(seg_e - seg_s))
                q = pt_t[ps: ps + pl]
                lo[ps: ps + pl] = is_ + np.searchsorted(seg_s, q - max(span, 0.0), side="left")
                hi[ps: ps + pl] = is_ + np.searchsorted(seg_s, q, side="right")
            counts = hi - lo
            cum = np.concatenate([[0], np.cumsum(counts)])
            total = int(cum[-1])
            matched_any = np.zeros(len(p_order), dtype=bool)
            for chunk_lo in range(0, max(total, 1), max_chunk_rows):
                chunk_hi = min(chunk_lo + max_chunk_rows, total)
                if chunk_hi <= chunk_lo:
                    break
                within = np.arange(chunk_lo, chunk_hi, dtype=np.int64)
                p_of = np.searchsorted(cum, within, side="right") - 1
                iv_of = lo[p_of] + (within - cum[p_of])
                ok = (iv_s[iv_of] <= pt_t[p_of]) & (pt_t[p_of] <= iv_e[iv_of])
                if not ok.any():
                    continue
                p_rows = p_order[p_of[ok]]
                i_rows = i_order[iv_of[ok]]
                matched_any[p_of[ok]] = True
                lp = block.take(pa.array(p_rows))
                rp = block.take(pa.array(i_rows))
                cols = {}
                for c in out_names:
                    cols[c] = rp.column(c) if c in payload_out else lp.column(c)
                yield pa.table(cols)
                emitted = True
            if how == "left":
                un = p_order[~matched_any]
                if len(un):
                    yield block.take(pa.array(un)).drop_columns(meta)
                    emitted = True
        elif how == "left" and len(pts):
            yield block.take(pa.array(pts)).drop_columns(meta)
            emitted = True
        if unmatched_dead is not None:
            yield unmatched_dead.select(out_names)
            emitted = True
        if not emitted:
            yield block.take(pa.array([], pa.int64())).drop_columns(meta)

    merge.__name__ = "range_join_merge"
    if isinstance(left, pa.Table) and isinstance(right, pa.Table):
        both = pa.concat_tables([prep(left, 0), prep(right, 1)])
        return pa.concat_tables(list(merge(both)))
    import ray

    if isinstance(left, pa.Table):
        left = ray.data.from_arrow(left)
    if isinstance(right, pa.Table):
        right = ray.data.from_arrow(right)
    lt = left.map_batches(_NamedFn(lambda b: prep(b, 0), "range_prep_left"), batch_format="pyarrow", zero_copy_batch=True)
    rt = right.map_batches(_NamedFn(lambda b: prep(b, 1), "range_prep_right"), batch_format="pyarrow", zero_copy_batch=True)
    return sorted_block_apply(lt.union(rt), by, merge, "range_join_merge")


def broadcast_range_join(
    left,
    right: pa.Table,
    by: Sequence[str],
    left_on: str,
    right_start: str,
    right_end: str,
    right_cols: Sequence[str] | None = None,
    how: str = "inner",
    suffix: str = "_r",
):
    """Range (interval-containment) join with a SMALL interval table: the
    intervals are sorted ONCE on the driver — (entity, start) order, per-
    entity segment bounds, per-entity max span — broadcast via ``ray.put``,
    and every left batch resolves its matches with two vectorized binary
    searches + a pair expansion. NO shuffle and NO sort of the left side:
    at 100 TB the points never leave their read order (the streaming
    complement to ``range_join``, exactly as ``broadcast_asof_join`` is to
    ``asof_join``). Semantics match ``range_join`` (start <= t <= end, SQL
    NULL rules, 'inner'/'left')."""
    import ray

    from kamae_ray.stages.join import _combined_key

    by = list(by)
    if how not in ("inner", "left"):
        raise ValueError("how must be inner|left")
    from kamae_ray.base import dataset_schema

    l_schema = dataset_schema(left) if not isinstance(left, pa.Table) else left.schema
    l_names = list(l_schema.names)
    r_types = {f.name: f.type for f in right.schema}
    payload = [c for c in (right_cols or right.column_names)
               if c not in by and c not in (right_start, right_end)]
    payload_out = [f"{c}{suffix}" if c in l_names else c for c in payload]

    # ---- driver-side interval prep (small by contract) ----
    rkey = _combined_key(right, by)
    s_arr = pc.cast(_time_to_numeric(A.as_array(right.column(right_start))), pa.float64(), safe=False)
    e_arr = pc.cast(_time_to_numeric(A.as_array(right.column(right_end))), pa.float64(), safe=False)
    ok = pc.and_(pc.and_(pc.is_valid(rkey), pc.is_valid(s_arr)), pc.is_valid(e_arr))
    if len(right) and not pc.all(ok).as_py():
        right = right.filter(ok)
        rkey = _combined_key(right, by)
        s_arr = pc.cast(_time_to_numeric(A.as_array(right.column(right_start))), pa.float64(), safe=False)
        e_arr = pc.cast(_time_to_numeric(A.as_array(right.column(right_end))), pa.float64(), safe=False)
    s_np = s_arr.to_numpy(zero_copy_only=False)
    e_np = e_arr.to_numpy(zero_copy_only=False)
    d = rkey.dictionary_encode() if len(right) else pa.array([], pa.string()).dictionary_encode()
    ent = pc.fill_null(d.indices, 0).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    order = np.lexsort((s_np, ent)) if len(ent) else np.zeros(0, np.int64)
    ent_s, s_s, e_s = ent[order], s_np[order], e_np[order]
    pay_s = right.select(payload).take(pa.array(order))
    n_ent = len(d.dictionary)
    seg_start = np.searchsorted(ent_s, np.arange(n_ent), side="left")
    seg_end = np.searchsorted(ent_s, np.arange(n_ent), side="right")
    span = np.zeros(n_ent, np.float64)
    if len(ent_s):
        widths = e_s - s_s
        starts2, lens2 = S.segments(ent_s)
        span_vals = np.maximum.reduceat(widths, starts2)
        span[ent_s[starts2]] = np.maximum(span_vals, 0.0)
    state_ref = ray.put({
        "ent_keys": d.dictionary, "s": s_s, "e": e_s, "payload": pay_s,
        "seg_start": seg_start, "seg_end": seg_end, "span": span,
    })

    def _bsearch(times, lo0, hi0, target, pred_le):
        """Vectorized per-point binary search in [lo0, hi0): rightmost index
        whose value satisfies (<= target) when pred_le else (< target)."""
        lo, hi = lo0.copy(), hi0.copy()
        while True:
            active = lo < hi
            if not active.any():
                return lo
            mid = (lo + hi) // 2
            mv = times[np.clip(mid, 0, max(len(times) - 1, 0))]
            go_right = (mv <= target) if pred_le else (mv < target)
            go_right &= active
            lo = np.where(go_right, mid + 1, lo)
            hi = np.where(active & ~go_right, mid, hi)

    def join_batch(batch: pa.Table, st) -> pa.Table:
        n = batch.num_rows
        lkey = _combined_key(batch, by)
        code = pc.index_in(lkey, value_set=st["ent_keys"])
        if lkey.null_count:
            code = pc.if_else(pc.is_valid(lkey), code, pa.nulls(n, code.type))
        has_ent = pc.is_valid(code).to_numpy(zero_copy_only=False) if n else np.zeros(0, bool)
        code_np = pc.fill_null(code, 0).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        t = pc.cast(_time_to_numeric(A.as_array(batch.column(left_on))), pa.float64(), safe=False)
        t_np = t.to_numpy(zero_copy_only=False).astype(np.float64, copy=True)
        bad_t = np.isnan(t_np)
        has_ent = has_ent & ~bad_t
        lo0 = np.where(has_ent, st["seg_start"][code_np], 0).astype(np.int64)
        hi0 = np.where(has_ent, st["seg_end"][code_np], 0).astype(np.int64)
        sp = np.where(has_ent, st["span"][code_np], 0.0)
        # candidates: intervals with start in [t - span_e, t]
        hi_p = _bsearch(st["s"], lo0, hi0, t_np, pred_le=True)
        lo_p = _bsearch(st["s"], lo0, hi0, t_np - sp, pred_le=False)
        counts = np.maximum(hi_p - lo_p, 0)
        cum = np.concatenate([[0], np.cumsum(counts)])
        total = int(cum[-1])
        matched_any = np.zeros(n, bool)
        pair_p = np.zeros(0, np.int64)
        pair_i = np.zeros(0, np.int64)
        if total:
            within = np.arange(total, dtype=np.int64)
            p_of = np.searchsorted(cum, within, side="right") - 1
            iv_of = lo_p[p_of] + (within - cum[p_of])
            keep = st["e"][iv_of] >= t_np[p_of]
            pair_p, pair_i = p_of[keep], iv_of[keep]
            matched_any[pair_p] = True
        parts = []
        if len(pair_p):
            lp = batch.take(pa.array(pair_p))
            cols = {c: lp.column(c) for c in batch.column_names}
            for c, out_name in zip(payload, payload_out):
                colv = A.as_array(st["payload"].column(c)).take(pa.array(pair_i)) if len(st["payload"]) else pa.nulls(len(pair_i), r_types[c])
                cols[out_name] = colv
            parts.append(pa.table(cols))
        if how == "left" and not matched_any.all():
            un = batch.filter(pa.array(~matched_any))
            cols = {c: un.column(c) for c in batch.column_names}
            for c, out_name in zip(payload, payload_out):
                cols[out_name] = pa.nulls(un.num_rows, r_types[c])
            parts.append(pa.table(cols))
        if not parts:
            cols = {c: batch.column(c).slice(0, 0) for c in batch.column_names}
            for c, out_name in zip(payload, payload_out):
                cols[out_name] = pa.nulls(0, r_types[c])
            return pa.table(cols)
        return pa.concat_tables(parts) if len(parts) > 1 else parts[0]

    if isinstance(left, pa.Table):
        import ray as _ray

        return join_batch(left, _ray.get(state_ref))

    def brange(batch: pa.Table) -> pa.Table:
        import ray as _r

        return join_batch(batch, _r.get(state_ref))

    brange.__name__ = "broadcast_range_join"
    return left.map_batches(brange, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def funnel(ds, entity_cols, time_col: str, event_col: str, steps: list[str]):
    """Ordered-funnel analysis — the product-analytics staple the reference
    delegates upstream: for each entity, the FIRST time each funnel step was
    reached, where step k must occur STRICTLY AFTER the entity's step-(k-1)
    time (SQL parity: the chained ``min(ts) WHERE ev = step AND ts > prev``
    joins). Output: entity columns + ``step{k}_ts`` (null when the funnel
    stalls before step k; an entity that misses step k can never complete
    k+1) + ``funnel_depth`` (steps completed).

    Scale plan: ONE sort-shuffle on the entity key (shared partitioning
    contract with the whole window family), then a vectorized block kernel —
    per step one masked ``minimum.reduceat`` over the entity segments, so
    the work is O(rows x steps) with no per-entity Python. Timestamp and
    integer time columns stay in EXACT int64 arithmetic (any unit, incl. ns);
    only genuinely-float time columns take the float64 path."""
    entity_cols = [entity_cols] if isinstance(entity_cols, str) else list(entity_cols)
    if not steps:
        raise ValueError("steps must be non-empty")

    def kern(block: pa.Table) -> pa.Table:
        t_arr = A.as_array(block.column(time_col))
        is_ts = pa.types.is_timestamp(t_arr.type)
        unit = t_arr.type.unit if is_ts else None
        int_path = is_ts or pa.types.is_integer(t_arr.type)
        if int_path:
            tv = pc.cast(pc.fill_null(t_arr, 0), pa.int64(), safe=False)
            NEG, POS = np.iinfo(np.int64).min, np.iinfo(np.int64).max
        else:
            tv = pc.cast(t_arr, pa.float64(), safe=False)
            NEG, POS = -np.inf, np.inf
        tnp, tmask = A.to_numpy(tv)
        tnp = tnp.astype(np.int64 if int_path else np.float64, copy=True)
        vnp = np.ones(len(tnp), dtype=bool)
        if tmask is not None:
            vnp = ~tmask
        if not int_path:
            vnp &= ~np.isnan(tnp)
        tnp[~vnp] = POS  # null time: sorts last, never qualifies (vnp gate)
        ev = pc.cast(A.as_array(block.column(event_col)), pa.string(), safe=False)
        gids = S.group_ids(block, entity_cols)
        order = np.lexsort((tnp, gids))
        gs, ts = gids[order], tnp[order]
        vs = vnp[order]
        starts, lens = S.segments(gs)
        n_seg = len(starts)
        firsts = order[starts]
        seg_rep = np.repeat(np.arange(n_seg), lens)
        out = {k: A.as_array(block.column(k)).take(pa.array(firsts)) for k in entity_cols}
        step_codes = pc.index_in(ev, value_set=pa.array(steps, pa.string()))
        codes = pc.fill_null(step_codes, -1).to_numpy(zero_copy_only=False).astype(np.int64)[order]
        thr = np.full(n_seg, NEG, dtype=ts.dtype)
        depth = np.zeros(n_seg, dtype=np.int64)
        for k in range(len(steps)):
            qual = (codes == k) & (ts > thr[seg_rep]) & vs
            vals = np.where(qual, ts, POS)
            m = np.minimum.reduceat(vals, starts) if n_seg else np.zeros(0, ts.dtype)
            fin = m != POS
            depth += fin.astype(np.int64)
            thr = np.where(fin, m, POS)  # missed step k -> no k+1 possible
            col = np.where(fin, m, 0)
            if is_ts:
                arr = pa.array(col.astype(np.int64), mask=~fin).cast(pa.timestamp(unit))
            elif int_path:
                arr = pa.array(col.astype(np.int64), mask=~fin)
            else:
                arr = pa.array(col.astype(np.float64), mask=~fin)
            out[f"step{k + 1}_ts"] = arr
        out["funnel_depth"] = pa.array(depth)
        return pa.table(out)

    if isinstance(ds, pa.Table):
        return kern(ds)
    proj = ds
    try:
        proj = ds.select_columns(list(dict.fromkeys(entity_cols + [time_col, event_col])))
    except Exception:
        pass
    return sorted_block_apply(proj, entity_cols, kern, "funnel")


def retention_cohorts(ds, entity_col: str, time_col: str, period_s: int = 86400):
    """Retention cohort matrix — (cohort, age) -> distinct active entities,
    where an entity's cohort is the period of its FIRST event and age is
    periods since then. ``period_s`` is the bucket width in seconds
    (86400 = daily cohorts); periods are epoch-based integer buckets
    (``floor(epoch/period)``), exactly reproducible in SQL — not calendar
    weeks/months.

    Scale plan: ONE entity sort-shuffle, then a block kernel that computes
    each entity's first-event period (segment min), per-row age, and the
    block-exact distinct (cohort, age, entity) cell counts (an entity never
    spans blocks, so per-block distinct IS globally distinct); a final
    partial-agg groupby sums the tiny (cohort, age, n) cells. No join, no
    second pass over the events."""
    # numeric (non-timestamp) time columns are interpreted as epoch
    # MICROSECONDS; timestamp columns scale by their own unit in the kernel
    div = np.int64(int(period_s) * 1_000_000)

    def kern(block: pa.Table) -> pa.Table:
        empty = pa.table({
            "cohort": pa.array([], pa.int64()),
            "age": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        })
        if block.num_rows == 0:
            return empty
        t_arr = A.as_array(block.column(time_col))
        if pa.types.is_timestamp(t_arr.type):
            tv = pc.cast(t_arr, pa.int64(), safe=False)
            # period_s is an ABSOLUTE unit contract — scale by the column's
            # native resolution, not an assumed microsecond epoch
            per = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}[t_arr.type.unit]
            d = np.int64(int(period_s) * per)
        else:
            tv = pc.cast(pc.cast(t_arr, pa.float64(), safe=False), pa.int64(), safe=False)
            d = div
        valid = pc.is_valid(tv).to_numpy(zero_copy_only=False)
        if not valid.all():
            block = block.filter(pa.array(valid))
            if block.num_rows == 0:
                return empty
            tv = tv.filter(pa.array(valid))
        w = tv.to_numpy(zero_copy_only=False) // d
        gids = S.group_ids(block, [entity_col])
        order = np.argsort(gids, kind="stable")
        ws = w[order]
        starts, lens = S.segments(gids[order])
        seg_rep = np.repeat(np.arange(len(starts)), lens)
        t0 = np.minimum.reduceat(ws, starts)
        age = ws - t0[seg_rep]
        # distinct (entity-segment, age) pairs -> one count per (cohort, age)
        o2 = np.lexsort((age, seg_rep))
        s2, a2 = seg_rep[o2], age[o2]
        new = np.ones(len(s2), dtype=bool)
        new[1:] = (s2[1:] != s2[:-1]) | (a2[1:] != a2[:-1])
        cohort_p, age_p = t0[s2[new]], a2[new]
        cells = np.stack([cohort_p, age_p], axis=1)
        uniq, counts = np.unique(cells, axis=0, return_counts=True)
        return pa.table({
            "cohort": pa.array(uniq[:, 0], pa.int64()),
            "age": pa.array(uniq[:, 1], pa.int64()),
            "n": pa.array(counts.astype(np.int64)),
        })

    from kamae_ray.stages.aggregate import groupby_agg

    if isinstance(ds, pa.Table):
        cells = kern(ds)
    else:
        proj = ds
        try:
            proj = ds.select_columns(list(dict.fromkeys([entity_col, time_col])))
        except Exception:
            pass
        cells = sorted_block_apply(proj, [entity_col], kern, "retention_cells")
    agg = groupby_agg(cells, ["cohort", "age"], {"n": ["sum"]})

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "cohort": b.column("cohort"),
            "age": b.column("age"),
            "n_entities": pc.cast(b.column("n_sum"), pa.int64(), safe=False),
        })

    finish.__name__ = "retention_finish"
    if isinstance(agg, pa.Table):
        return finish(agg)
    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def merge_intervals(ds, entity_cols, start_col: str, end_col: str,
                    min_gap: float = 0.0):
    """Coalesce overlapping/adjacent intervals per entity (SQL
    gaps-and-islands): intervals whose start is <= the running max end of
    the previous intervals (+ ``min_gap``) merge into one island. Output:
    entity columns + ``island_start`` / ``island_end`` / ``n_intervals``
    per merged island. Null starts/ends are dropped.

    One entity sort-shuffle (the window-family partitioning contract), then
    a single vectorized sweep per block: lexsort by (entity, start), running
    ``np.maximum.accumulate`` of ends with the segment-start reset trick,
    island boundaries from one shifted compare — no per-entity Python."""
    entity_cols = [entity_cols] if isinstance(entity_cols, str) else list(entity_cols)

    def kern(block: pa.Table) -> pa.Table:
        s_arr = A.as_array(block.column(start_col))
        e_arr = A.as_array(block.column(end_col))
        is_ts = pa.types.is_timestamp(s_arr.type)
        unit = s_arr.type.unit if is_ts else None
        # timestamp/integer columns stay in EXACT int64 (any unit, incl. ns —
        # float64 would silently lose ~256 ns at ns-epoch magnitudes); only
        # genuinely-float columns take the float64 path
        int_path = is_ts or pa.types.is_integer(s_arr.type)
        to_num = lambda a: pc.cast(a, pa.int64(), safe=False) if int_path else pc.cast(  # noqa: E731
            a, pa.float64(), safe=False
        )
        dt = np.int64 if int_path else np.float64
        NEG = np.iinfo(np.int64).min if int_path else -np.inf
        sv, sm = A.to_numpy(to_num(s_arr))
        ev, em = A.to_numpy(to_num(e_arr))
        sv = sv.astype(dt, copy=True)
        ev = ev.astype(dt, copy=True)
        bad = np.zeros(len(sv), dtype=bool)
        if sm is not None:
            bad |= sm
        if em is not None:
            bad |= em
        if bad.any():
            block = block.filter(pa.array(~bad))
            sv, ev = sv[~bad], ev[~bad]
        if block.num_rows == 0:
            empty = {k: block.column(k) for k in entity_cols}
            for c in ("island_start", "island_end"):
                empty[c] = pa.array([], pa.timestamp(unit) if is_ts
                                    else (pa.int64() if int_path else pa.float64()))
            empty["n_intervals"] = pa.array([], pa.int64())
            return pa.table(empty)
        if (ev < sv).any():
            # a malformed interval opening an island would silently inherit
            # the PREVIOUS island's running-max end — reject instead
            raise ValueError("merge_intervals: found end < start; fix or swap the columns")
        gids = S.group_ids(block, entity_cols)
        order = np.lexsort((ev, sv, gids))
        gs, ss, es = gids[order], sv[order], ev[order]
        starts, lens = S.segments(gs)
        n = len(gs)
        seg_rep = np.repeat(np.arange(len(starts)), lens)
        # segmented running max of ends (exact — no offset trick, which loses
        # float ulps at timestamp magnitudes): Hillis-Steele doubling with a
        # segment-start clamp, O(n log n), ~log2(block) numpy passes
        start_idx = starts[seg_rep]
        run_end = es.copy()
        idx = np.arange(n)
        d = 1
        while d < n:
            src = idx - d
            valid = src >= start_idx
            contrib = np.where(valid, run_end[np.maximum(src, 0)], NEG)
            run_end = np.maximum(run_end, contrib)
            d <<= 1
        new_island = np.ones(n, dtype=bool)
        if n > 1:
            same_seg = seg_rep[1:] == seg_rep[:-1]
            # difference form keeps the int64 path exact: (s - e) is an exact
            # int64 subtraction; the scalar compare vs min_gap only promotes
            # the (small) gap, never the absolute epoch magnitudes
            new_island[1:] = ~same_seg | ((ss[1:] - run_end[:-1]) > min_gap)
        isl = np.cumsum(new_island) - 1
        i_starts, i_lens = S.segments(isl)
        firsts = order[starts][seg_rep[i_starts]]  # first row of the island's entity
        out = {k: A.as_array(block.column(k)).take(pa.array(firsts)) for k in entity_cols}
        ist = ss[i_starts]
        # island end = max end within the island (run_end at its last row)
        last = i_starts + i_lens - 1
        ien = run_end[last]
        if is_ts:
            out["island_start"] = pa.array(ist.astype(np.int64)).cast(pa.timestamp(unit))
            out["island_end"] = pa.array(ien.astype(np.int64)).cast(pa.timestamp(unit))
        else:
            out["island_start"] = pa.array(ist)
            out["island_end"] = pa.array(ien)
        out["n_intervals"] = pa.array(i_lens.astype(np.int64))
        return pa.table(out)

    if isinstance(ds, pa.Table):
        return kern(ds)
    proj = ds
    try:
        proj = ds.select_columns(list(dict.fromkeys(entity_cols + [start_col, end_col])))
    except Exception:
        pass
    return sorted_block_apply(proj, entity_cols, kern, "merge_intervals")


def transition_counts(ds, entity_cols, time_col: str, event_col: str,
                      tiebreak_col: str | None = None):
    """Markov transition matrix of an event stream: counts of consecutive
    (from_event, to_event) pairs per entity timeline, aggregated globally —
    SQL ``lag(event) OVER (PARTITION BY entity ORDER BY time[, tiebreak])``
    + GROUP BY. Pass a unique ``tiebreak_col`` for deterministic output
    under equal timestamps (same caveat as SQL).

    Scale plan: ONE entity sort-shuffle, block kernel = lexsort + one
    shifted compare (transitions never cross entities) + per-block partial
    pair counts; the final exchange carries only (from, to, n) cells."""
    entity_cols = [entity_cols] if isinstance(entity_cols, str) else list(entity_cols)

    def kern(block: pa.Table) -> pa.Table:
        empty = pa.table({
            "from_event": pa.array([], pa.string()),
            "to_event": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        })
        if block.num_rows == 0:
            return empty
        ev = pc.cast(A.as_array(block.column(event_col)), pa.string(), safe=False)
        d = ev.dictionary_encode()
        codes = pc.fill_null(d.indices, -1).to_numpy(zero_copy_only=False).astype(np.int64)
        t = _time_to_numeric(A.as_array(block.column(time_col))).to_numpy(zero_copy_only=False)
        gids = S.group_ids(block, entity_cols)
        keys = [t, gids]
        if tiebreak_col is not None:
            tb = pc.cast(A.as_array(block.column(tiebreak_col)), pa.int64(), safe=False)
            keys = [tb.to_numpy(zero_copy_only=False), t, gids]
        order = np.lexsort(tuple(keys))
        gs, cs = gids[order], codes[order]
        n = len(gs)
        if n < 2:
            return empty
        same = gs[1:] == gs[:-1]
        frm, to = cs[:-1][same], cs[1:][same]
        # transitions touching a NULL event drop on BOTH sides (the oracle
        # filters prev IS NOT NULL AND event IS NOT NULL identically); the
        # null row still consumes its timeline position, exactly like lag()
        ok = (frm >= 0) & (to >= 0)
        frm, to = frm[ok], to[ok]
        if not len(frm):
            return empty
        pair = frm * np.int64(len(d.dictionary)) + to
        uniq, counts = np.unique(pair, return_counts=True)
        dic = d.dictionary
        f_idx = pa.array(uniq // len(dic), pa.int64())
        t_idx = pa.array(uniq % len(dic), pa.int64())
        return pa.table({
            "from_event": dic.take(f_idx),
            "to_event": dic.take(t_idx),
            "n": pa.array(counts.astype(np.int64)),
        })

    from kamae_ray.stages.aggregate import groupby_agg

    if isinstance(ds, pa.Table):
        cells = kern(ds)
    else:
        cols = entity_cols + [time_col, event_col] + (
            [tiebreak_col] if tiebreak_col else []
        )
        proj = ds
        try:
            proj = ds.select_columns(list(dict.fromkeys(cols)))
        except Exception:
            pass
        cells = sorted_block_apply(proj, entity_cols, kern, "transition_cells")
    agg = groupby_agg(cells, ["from_event", "to_event"], {"n": ["sum"]})

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "from_event": b.column("from_event"),
            "to_event": b.column("to_event"),
            "n": pc.cast(b.column("n_sum"), pa.int64(), safe=False),
        })

    finish.__name__ = "transition_finish"
    if isinstance(agg, pa.Table):
        return finish(agg)
    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def hopping_window_agg(ds, entity_cols, time_col: str, size_s: int, hop_s: int,
                       aggs: dict, window_col: str = "window_start"):
    """Hopping (sliding) event-time window aggregate — and its ``size_s ==
    hop_s`` special case, the tumbling window: one output row per (entity,
    window start) where window starts are the multiples of ``hop_s`` and each
    window covers ``[start, start + size_s)``. ``size_s`` must be an integer
    multiple of ``hop_s``; an event at time t then belongs to EXACTLY
    ``k = size_s // hop_s`` windows (starts ``floor(t/hop)*hop - i*hop``,
    i in 0..k-1) — the standard streaming-window decomposition (Flink/Beam
    semantics, epoch-aligned, no calendar windows).

    ``size_s``/``hop_s`` are in SECONDS for timestamp columns (scaled by the
    column's native unit — the retention_cohorts contract); plain integer
    time columns use them as raw units. Null timestamps are dropped.

    Scale plan: a vectorized map expands each row into its k window rows
    (np.repeat + tiled offsets — k is small by construction: the expansion
    factor IS the overlap factor), then ONE partial-agg
    :func:`~kamae_ray.stages.aggregate.groupby_agg` on
    (entity, window_start): blocks pre-aggregate before the exchange, so the
    shuffle carries one partial row per (block, entity, window), not k rows
    per event. ``window_col`` returns in the column's native type."""
    from kamae_ray.stages.aggregate import groupby_agg

    entity_cols = [entity_cols] if isinstance(entity_cols, str) else list(entity_cols)
    size_s, hop_s = int(size_s), int(hop_s)
    if hop_s <= 0 or size_s <= 0 or size_s % hop_s != 0:
        raise ValueError("need size_s > 0, hop_s > 0 and size_s % hop_s == 0")
    k = size_s // hop_s

    def expand(block: pa.Table) -> pa.Table:
        t_arr = A.as_array(block.column(time_col))
        is_ts = pa.types.is_timestamp(t_arr.type)
        if is_ts:
            unit = t_arr.type.unit
            per = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}[unit]
        else:
            per = 1
        hop = np.int64(hop_s * per)
        tv = pc.cast(t_arr, pa.int64(), safe=False)
        valid = pc.is_valid(tv)
        if not pc.all(valid).as_py():
            block = block.filter(valid)
            tv = pc.cast(A.as_array(block.column(time_col)), pa.int64(), safe=False)
        n = block.num_rows
        t = tv.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        base = (t // hop) * hop  # numpy // floors: negative epochs stay exact
        idx = np.repeat(np.arange(n, dtype=np.int64), k)
        starts = np.repeat(base, k) - np.tile(np.arange(k, dtype=np.int64), n) * hop
        out = block.take(pa.array(idx))
        w = pa.array(starts)
        if is_ts:
            w = w.cast(pa.timestamp(unit))
        return out.append_column(window_col, w)

    expand.__name__ = "hopping_expand"
    if isinstance(ds, pa.Table):
        return groupby_agg(expand(ds), entity_cols + [window_col], aggs)
    proj = ds
    try:
        proj = ds.select_columns(list(dict.fromkeys(entity_cols + [time_col] + list(aggs))))
    except Exception:
        pass
    expanded = proj.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True,
                                batch_size=None)
    return groupby_agg(expanded, entity_cols + [window_col], aggs)


def resample_locf(ds, entity_cols, time_col: str, value_col: str, bucket_s: int,
                  out_bucket: str = "bucket_start",
                  out_observed: str = "observed",
                  max_buckets_per_entity: int = 1_000_000):
    """Time-series resample + gap fill: bucket each entity's events to
    ``bucket_s``-wide epoch buckets, keep ONE value per (entity, bucket) (the
    latest event's value; equal-timestamp ties resolve to the SMALLEST value
    — the deterministic ROW_NUMBER plan), then emit EVERY bucket between the
    entity's first and last observation with missing buckets carried forward
    (LOCF). ``observed`` marks real vs filled rows. ``bucket_s`` follows the
    seconds contract for timestamp columns (scaled by the native unit);
    plain-int time columns use raw units.

    Scale plan: one :func:`~kamae_ray.stages.aggregate.groupby_arg_extreme`
    pass reduces events to (entity, bucket) cells (per-block combiner), then
    ONE entity sort-shuffle and a fully vectorized block kernel builds the
    dense range per entity — output positions by repeat/arange, the LOCF
    source index by a marker-scatter + segment-reset cumsum; no per-entity
    Python. An entity's dense range is capped by
    ``max_buckets_per_entity`` (a sparse entity spanning years of
    seconds-resolution buckets would otherwise explode the output) — raise
    the cap deliberately, the output is the dense matrix by design."""
    from kamae_ray.stages.aggregate import groupby_arg_extreme

    entity_cols = [entity_cols] if isinstance(entity_cols, str) else list(entity_cols)
    bucket_s = int(bucket_s)
    if bucket_s <= 0:
        raise ValueError("bucket_s must be > 0")

    is_table = isinstance(ds, pa.Table)
    # resolve the time type ON THE DRIVER (schema metadata): kernel closures
    # run in remote tasks, so a mutated dict would never make it back
    if is_table:
        t_type = ds.schema.field(time_col).type
    else:
        from kamae_ray.base import dataset_schema

        t_type = dataset_schema(ds).field(time_col).type
    if pa.types.is_timestamp(t_type):
        meta = {"is_ts": True, "unit": t_type.unit}
        _per = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}[t_type.unit]
    else:
        meta = {"is_ts": False, "unit": None}
        _per = 1
    width = np.int64(bucket_s * _per)

    def to_buckets(block: pa.Table) -> pa.Table:
        t_arr = A.as_array(block.column(time_col))
        tv = pc.cast(t_arr, pa.int64(), safe=False)
        valid = pc.is_valid(tv)
        if not pc.all(valid).as_py():
            block = block.filter(valid)
            tv = pc.cast(A.as_array(block.column(time_col)), pa.int64(), safe=False)
        t = tv.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        out = block.select(entity_cols + [time_col, value_col])
        return out.append_column("__kr_bucket", pa.array(t // width))

    to_buckets.__name__ = "resample_bucketize"
    bucketed = to_buckets(ds) if is_table else ds.map_batches(
        to_buckets, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    # latest value per cell (ties: max time, then MIN value — deterministic)
    cells = groupby_arg_extreme(bucketed, entity_cols + ["__kr_bucket"],
                                value_col, time_col, "max")

    def densify(block: pa.Table) -> pa.Table:
        width_native = np.int64(bucket_s * (
            {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}[meta["unit"]]
            if meta["is_ts"] else 1))

        def bucket_arr(vals: np.ndarray) -> pa.Array:
            w = pa.array(vals * width_native)
            return w.cast(pa.timestamp(meta["unit"])) if meta["is_ts"] else w

        if block.num_rows == 0:
            out = {k: block.column(k) for k in entity_cols}
            out[out_bucket] = bucket_arr(np.zeros(0, np.int64))
            out[value_col] = block.column(value_col)
            out[out_observed] = pa.array([], pa.bool_())
            return pa.table(out)
        gids = S.group_ids(block, entity_cols)
        b = block.column("__kr_bucket").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, gids))
        gs, bs = gids[order], b[order]
        starts, lens = S.segments(gs)
        firsts = bs[starts]
        lasts = bs[starts + lens - 1]
        out_lens = lasts - firsts + 1
        if (out_lens > max_buckets_per_entity).any():
            worst = int(out_lens.max())
            raise ValueError(
                f"resample_locf: an entity spans {worst} buckets "
                f"(> max_buckets_per_entity={max_buckets_per_entity})")
        out_n = int(out_lens.sum())
        seg_rep = np.repeat(np.arange(len(starts)), out_lens)
        out_starts = np.concatenate(([0], np.cumsum(out_lens)[:-1]))
        intra = np.arange(out_n, dtype=np.int64) - out_starts[seg_rep]
        out_buckets = firsts[seg_rep] + intra
        # marker-scatter: each observed cell lands at its dense position;
        # segment-reset cumsum turns markers into the LOCF source index
        marker = np.zeros(out_n, np.int64)
        obs_pos = out_starts[np.repeat(np.arange(len(starts)), lens)] + (bs - firsts[np.repeat(np.arange(len(starts)), lens)])
        marker[obs_pos] = 1
        cum = np.cumsum(marker)
        src_rank = cum - cum[out_starts][seg_rep] + marker[out_starts][seg_rep] - 1
        # src_rank is the 0-based index of the governing observation WITHIN
        # the segment; map to global sorted row index
        src_global = starts[seg_rep] + src_rank
        take_idx = pa.array(order[src_global])
        ent_firsts = order[starts][seg_rep]
        out = {k: A.as_array(block.column(k)).take(pa.array(ent_firsts)) for k in entity_cols}
        out[out_bucket] = bucket_arr(out_buckets)
        out[value_col] = A.as_array(block.column(value_col)).take(take_idx)
        out[out_observed] = pa.array(marker.astype(bool))
        return pa.table(out)

    densify.__name__ = "resample_densify"
    if isinstance(cells, pa.Table):
        return densify(cells)
    return sorted_block_apply(cells, entity_cols, densify, "resample_densify")


def scd2_build(ds, key_cols, time_col: str, attr_cols, tiebreak_col: str | None = None,
               carry_cols: list[str] | None = None):
    """Build a slowly-changing-dimension type-2 history from snapshot/CDC
    rows — the warehouse staple the reference delegates upstream: per key,
    order rows by (time[, tiebreak]), collapse consecutive rows whose
    tracked ``attr_cols`` are all unchanged (null-safe IS DISTINCT FROM
    semantics), and emit one row per surviving VERSION with
    ``valid_from`` / ``valid_to`` (null = current), a 1-based ``version``
    number and ``is_current``. ``carry_cols`` pass through the version's
    FIRST row (e.g. a unique event id — also the deterministic identity
    under equal timestamps when used as ``tiebreak_col``). Null times are
    dropped (no ordering identity).

    Scale plan: ONE distributed sort on the key (the window-family
    partitioning contract — lesson 9: sort keys are exactly the group key;
    time ordering happens inside the block kernel), then a single vectorized
    sweep per block: lexsort, one shifted null-safe compare per tracked
    attr, segment bookkeeping via cumsums — no per-key Python."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    attr_cols = [attr_cols] if isinstance(attr_cols, str) else list(attr_cols)
    carry_cols = list(carry_cols or [])

    def kern(block: pa.Table) -> pa.Table:
        t_arr = A.as_array(block.column(time_col))
        if t_arr.null_count:
            block = block.filter(pc.is_valid(block.column(time_col)))
            t_arr = A.as_array(block.column(time_col))
        is_ts = pa.types.is_timestamp(t_arr.type)
        unit = t_arr.type.unit if is_ts else None
        int_path = is_ts or pa.types.is_integer(t_arr.type)
        tv = pc.cast(t_arr, pa.int64() if int_path else pa.float64(), safe=False)
        t = tv.to_numpy(zero_copy_only=False)
        n = block.num_rows
        gids = S.group_ids(block, key_cols)
        if tiebreak_col is not None:
            tb_arr = A.as_array(block.column(tiebreak_col))
            tb = pc.rank(tb_arr, sort_keys="ascending", null_placement="at_end",
                         tiebreaker="first").to_numpy(zero_copy_only=False)
            order = np.lexsort((tb, t, gids))
        else:
            order = np.lexsort((t, gids))
        gs, ts = gids[order], t[order]
        starts, lens = S.segments(gs)
        seg_rep = np.repeat(np.arange(len(starts)), lens)
        changed = np.zeros(n, dtype=bool)
        changed[starts] = True
        oidx = pa.array(order)
        for c in attr_cols:
            a = A.as_array(block.column(c)).take(oidx)
            if n > 1:
                cur, prev = a.slice(1), a.slice(0, n - 1)
                neq = pc.fill_null(pc.not_equal(cur, prev), False).to_numpy(
                    zero_copy_only=False)
                ncur = pc.is_null(cur).to_numpy(zero_copy_only=False)
                nprev = pc.is_null(prev).to_numpy(zero_copy_only=False)
                changed[1:] |= neq | (ncur != nprev)
        ki = np.flatnonzero(changed)
        seg_k = seg_rep[ki]
        kstarts, klens = S.segments(seg_k)
        krep = np.repeat(np.arange(len(kstarts)), klens)
        version = (np.arange(len(ki)) - kstarts[krep] + 1).astype(np.int64)
        has_next = np.zeros(len(ki), dtype=bool)
        if len(ki) > 1:
            has_next[:-1] = seg_k[1:] == seg_k[:-1]
        vt = np.zeros(len(ki), dtype=ts.dtype)
        if len(ki) > 1:
            vt[:-1] = ts[ki[1:]]
        take_idx = pa.array(order[ki])
        out = {c: A.as_array(block.column(c)).take(take_idx)
               for c in key_cols + carry_cols + attr_cols}

        def t_out(vals, mask=None):
            arr = pa.array(vals, pa.int64() if int_path else pa.float64(),
                           mask=mask)
            # ONE cast back to the source type — preserves the timezone of
            # tz-aware timestamp columns (pa.timestamp(unit) would drop it)
            return arr.cast(t_arr.type)

        out["valid_from"] = t_out(ts[ki].astype(np.int64) if int_path else ts[ki])
        out["valid_to"] = t_out(vt.astype(np.int64) if int_path else vt,
                                mask=~has_next)
        out["version"] = pa.array(version)
        out["is_current"] = pa.array(~has_next)
        return pa.table(out)

    if isinstance(ds, pa.Table):
        return kern(ds)
    need = list(dict.fromkeys(
        key_cols + [time_col] + attr_cols + carry_cols
        + ([tiebreak_col] if tiebreak_col else [])))
    try:
        ds = ds.select_columns(need)
    except Exception:
        pass
    return sorted_block_apply(ds, key_cols, kern, "scd2_build")


def time_weighted_avg(ds, entity_cols, time_col: str, value_col: str,
                      cents_scale: int = 100):
    """Time-weighted average per entity (TWAP — the market-data/telemetry
    aggregate where arithmetic means lie): left-continuous step integral
    ``sum(dt_i * v_i) / sum(dt_i)`` over consecutive observations, i.e. each
    value holds until the next one. Entities with a single observation (no
    interval) emit null. Output: entity cols + ``twap`` + ``n_obs`` +
    ``duration_us``.

    EXACT-INTEGER discipline (lesson-24 family): values quantize to
    fixed-point ``round(v * cents_scale)`` int64; each term ``dt_us *
    cents`` and the per-entity sums stay int64 (integer sums are order-free
    — no float accumulation risk); the TWAP is ONE double division of two
    exact ints, bit-identical to the HUGEINT SQL oracle. Guarded against
    int64 overflow (raise, never silently wrap). ONE entity sort-shuffle +
    a vectorized segmented kernel."""
    entity_cols = [entity_cols] if isinstance(entity_cols, str) else list(entity_cols)

    def kern(block: pa.Table) -> pa.Table:
        ok = pc.and_kleene(pc.is_valid(block.column(time_col)),
                           pc.is_valid(block.column(value_col)))
        block = block.filter(pc.fill_null(ok, False))
        t = _time_to_numeric(A.as_array(block.column(time_col))).to_numpy(
            zero_copy_only=False).astype(np.int64, copy=False)
        v = pc.cast(A.as_array(block.column(value_col)), pa.float64(),
                    safe=False).to_numpy(zero_copy_only=False)
        # half-AWAY-from-zero, matching DuckDB round() in the generated
        # oracle (np.rint is half-to-even — a v*scale landing exactly on .5,
        # e.g. 0.005*100, would diverge engine-vs-oracle)
        scaled = v * cents_scale
        cents = np.where(scaled >= 0, np.floor(scaled + 0.5), np.ceil(scaled - 0.5))
        if len(cents) and np.abs(cents).max() >= 2 ** 52:
            raise ValueError("time_weighted_avg: values overflow the "
                             "fixed-point range; lower cents_scale")
        cents = cents.astype(np.int64)
        gids = S.group_ids(block, entity_cols)
        order = np.lexsort((t, gids))
        gs, ts, cs = gids[order], t[order], cents[order]
        starts, lens = S.segments(gs)
        n = len(gs)
        num = np.zeros(len(starts), dtype=np.int64)
        dur = np.zeros(len(starts), dtype=np.int64)
        if n > 1:
            dt = ts[1:] - ts[:-1]
            same = gs[1:] == gs[:-1]
            term = np.where(same, dt * cs[:-1], 0)
            # overflow guard: recompute one suspicious term in python ints
            if len(term) and (np.abs(cs[:-1][same]).max(initial=0) > 0):
                mx = int(np.abs(dt[same]).max(initial=0)) * int(
                    np.abs(cs[:-1][same]).max(initial=0))
                if mx >= 2 ** 62:
                    raise ValueError("time_weighted_avg: dt*value term "
                                     "overflows int64; lower cents_scale")
            csum_t = np.concatenate(([0], np.cumsum(term)))
            csum_d = np.concatenate(([0], np.cumsum(np.where(same, dt, 0))))
            ends = starts + lens - 1
            num = csum_t[ends] - csum_t[starts]
            dur = csum_d[ends] - csum_d[starts]
            # per-entity SUM guard: individual terms fitting int64 does not
            # bound the numerator (the SQL oracle accumulates in HUGEINT).
            # A wrapped GLOBAL cumsum is harmless — differences are exact
            # mod 2^64 — but a per-entity sum >= 2^63 wraps `num` silently.
            # Approximate per-entity sums in float64 (error ~n*ulp, far
            # below the one-bit 2^62->2^63 margin) and raise, never wrap.
            fcsum = np.concatenate(([0.0], np.cumsum(term, dtype=np.float64)))
            fnum = fcsum[ends] - fcsum[starts]
            if len(fnum) and np.abs(fnum).max() >= 2 ** 62:
                raise ValueError("time_weighted_avg: per-entity dt*value "
                                 "sum overflows int64; lower cents_scale")
        firsts = order[starts]
        out = {c: A.as_array(block.column(c)).take(pa.array(firsts))
               for c in entity_cols}
        with np.errstate(divide="ignore", invalid="ignore"):
            twap = num.astype(np.float64) / (dur.astype(np.float64) * cents_scale)
        out["twap"] = pa.array(twap, pa.float64(), mask=(dur == 0))
        out["n_obs"] = pa.array(lens.astype(np.int64))
        out["duration_us"] = pa.array(dur)
        return pa.table(out)

    if isinstance(ds, pa.Table):
        return kern(ds)
    need = list(dict.fromkeys(entity_cols + [time_col, value_col]))
    try:
        ds = ds.select_columns(need)
    except Exception:
        pass
    return sorted_block_apply(ds, entity_cols, kern, "time_weighted_avg")


def resample_ohlc(ds, entity_cols, time_col: str, value_col: str,
                  bucket_s: int, tiebreak_cols=()):
    """OHLC time-bucket resample — the candlestick aggregate: per
    (entity, ``bucket_s``-wide epoch bucket), the OPEN (value at the
    earliest observation), HIGH/LOW (max/min), CLOSE (latest) plus exact
    int64 count and sum. ``value_col`` must be an INTEGER column (quantize
    floats to fixed-point cents first — the repo's integer discipline);
    everything emitted is exact int64, no float anywhere. Equal-timestamp
    ties resolve by ``tiebreak_cols`` — pass a unique column (e.g. the
    event id) for fully deterministic open/close.

    ``bucket_s`` follows :func:`resample_locf`'s seconds contract for
    timestamp columns (scaled by the native unit); plain-int time columns
    use raw units. Null time or value rows are dropped (SQL aggregate
    semantics).

    Scale plan: a derived-bucket map, then ONE distributed sort on
    (entity, bucket) — the partition contract key is exactly the group key
    (CLAUDE lesson 9) — and a vectorized segment kernel (lexsort intra,
    reduceat extremes, first/last gathers). Per-bucket sums are guarded
    against int64 overflow (raise, never wrap)."""
    entity_cols = [entity_cols] if isinstance(entity_cols, str) else list(entity_cols)
    tiebreak_cols = list(tiebreak_cols)
    bucket_s = int(bucket_s)
    if bucket_s <= 0:
        raise ValueError("bucket_s must be > 0")

    is_table = isinstance(ds, pa.Table)
    if is_table:
        schema = ds.schema
    else:
        from kamae_ray.base import dataset_schema

        schema = dataset_schema(ds)
    t_type = schema.field(time_col).type
    _per = ({"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}[t_type.unit]
            if pa.types.is_timestamp(t_type) else 1)
    width = np.int64(bucket_s * _per)
    for c in tiebreak_cols:
        tt = schema.field(c).type
        if not (pa.types.is_integer(tt) or pa.types.is_timestamp(tt)):
            raise ValueError(f"resample_ohlc tiebreak column {c!r} must be "
                             f"integer or timestamp (got {tt})")

    def to_buckets(block: pa.Table) -> pa.Table:
        ok = pc.and_kleene(pc.is_valid(block.column(time_col)),
                           pc.is_valid(block.column(value_col)))
        block = block.filter(pc.fill_null(ok, False))
        t = pc.cast(A.as_array(block.column(time_col)), pa.int64(),
                    safe=False).to_numpy(zero_copy_only=False)
        out = block.select(entity_cols + tiebreak_cols + [time_col, value_col])
        return out.append_column("__kr_bucket", pa.array(t // width))

    to_buckets.__name__ = "ohlc_bucketize"

    def kern(block: pa.Table) -> pa.Table:
        n = block.num_rows
        gcols = entity_cols + ["__kr_bucket"]
        if n == 0:
            out = {c: block.column(c) for c in entity_cols}
            out["bucket"] = pa.array([], pa.int64())
            for c in ("open", "high", "low", "close", "value_sum"):
                out[c] = pa.array([], pa.int64())
            out["n"] = pa.array([], pa.int64())
            return pa.table(out)
        gids = S.group_ids(block, gcols)
        t = pc.cast(A.as_array(block.column(time_col)), pa.int64(),
                    safe=False).to_numpy(zero_copy_only=False)
        v = pc.cast(A.as_array(block.column(value_col)), pa.int64(),
                    safe=False).to_numpy(zero_copy_only=False)
        tb = [pc.cast(A.as_array(block.column(c)), pa.int64(), safe=False)
              .to_numpy(zero_copy_only=False) for c in tiebreak_cols]
        order = np.lexsort(tuple(reversed(tb)) + (t, gids))
        gs, ts_, vs = gids[order], t[order], v[order]
        starts, lens = S.segments(gs)
        ends = starts + lens - 1
        if len(vs) and float(np.abs(vs).max()) * float(lens.max()) >= 2.0**62:
            raise ValueError("resample_ohlc: per-bucket sum may overflow "
                             "int64 — use a smaller bucket or rescale")
        firsts = order[starts]
        out = {c: A.as_array(block.column(c)).take(pa.array(firsts))
               for c in entity_cols}
        out["bucket"] = A.as_array(block.column("__kr_bucket")).take(pa.array(firsts))
        out["open"] = pa.array(vs[starts])
        out["high"] = pa.array(np.maximum.reduceat(vs, starts))
        out["low"] = pa.array(np.minimum.reduceat(vs, starts))
        out["close"] = pa.array(vs[ends])
        out["value_sum"] = pa.array(np.add.reduceat(vs, starts).astype(np.int64))
        out["n"] = pa.array(lens.astype(np.int64))
        return pa.table(out)

    if is_table:
        return kern(to_buckets(ds))
    bucketed = ds.map_batches(to_buckets, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)
    return sorted_block_apply(bucketed, entity_cols + ["__kr_bucket"], kern,
                              "ohlc_fold")


def expanding_zscore_flags(ds, entity_cols, time_col: str, value_col: str,
                           z: int = 3, min_history: int = 5, tiebreak_cols=()):
    """Leakage-safe streaming anomaly flags: for each observation, flag
    whether it sits more than ``z`` population standard deviations from the
    mean of its entity's PRIOR history (expanding window, current row
    excluded — the training-time-safe formulation). ``value_col`` must be
    an INTEGER column (fixed-point cents). The flag rule is EXACT-INTEGER
    (lesson-24 family — no float mean/std on either engine):

        flag  <=>  (n*x - s)^2  >  z^2 * (n*q - s^2)

    with n = prior count, s = prior sum, q = prior sum of squares — the
    cross-multiplied form of ``(x - s/n)^2 > z^2 * var``. Rows with fewer
    than ``min_history`` prior observations emit a null flag. Output:
    input columns + ``n_prev`` + ``anomaly``.

    Scale plan: ONE entity sort-shuffle, vectorized segmented exclusive
    prefix sums (int64, order-free). Every int64 product is guarded via a
    float64 magnitude estimate (raise, never wrap) — beyond ~1e6-row
    entity histories at cent scale, shard by time or rescale."""
    entity_cols = [entity_cols] if isinstance(entity_cols, str) else list(entity_cols)
    tiebreak_cols = list(tiebreak_cols)
    if z <= 0 or min_history < 1:
        raise ValueError("z must be > 0 and min_history >= 1")
    if tiebreak_cols:
        if isinstance(ds, pa.Table):
            schema = ds.schema
        else:
            from kamae_ray.base import dataset_schema

            schema = dataset_schema(ds)
        for c in tiebreak_cols:
            tt = schema.field(c).type
            if not (pa.types.is_integer(tt) or pa.types.is_timestamp(tt)):
                raise ValueError(f"expanding_zscore_flags tiebreak column "
                                 f"{c!r} must be integer or timestamp")

    def kern(block: pa.Table) -> pa.Table:
        ok = pc.and_kleene(pc.is_valid(block.column(time_col)),
                           pc.is_valid(block.column(value_col)))
        block = block.filter(pc.fill_null(ok, False))
        n = block.num_rows
        if n == 0:
            return block.append_column(
                "n_prev", pa.array([], pa.int64())).append_column(
                "anomaly", pa.array([], pa.bool_()))
        gids = S.group_ids(block, entity_cols)
        t = pc.cast(A.as_array(block.column(time_col)), pa.int64(),
                    safe=False).to_numpy(zero_copy_only=False)
        v = pc.cast(A.as_array(block.column(value_col)), pa.int64(),
                    safe=False).to_numpy(zero_copy_only=False)
        tb = [pc.cast(A.as_array(block.column(c)), pa.int64(), safe=False)
              .to_numpy(zero_copy_only=False) for c in tiebreak_cols]
        order = np.lexsort(tuple(reversed(tb)) + (t, gids))
        gs, vs = gids[order], v[order]
        starts, lens = S.segments(gs)
        srep = S.starts_rep(starts, lens)
        pos = np.arange(n, dtype=np.int64)
        n_prev = pos - srep
        vv = vs * vs
        if len(vs) and float(np.abs(vs).max()) ** 2 >= 2.0**62:
            raise ValueError("expanding_zscore_flags: value^2 overflows int64")
        cs = np.cumsum(vs)
        cq = np.cumsum(vv)
        # exclusive within-segment prefix: (inclusive - self) minus the
        # segment's base (the global exclusive prefix at its first row)
        s_prev = (cs - vs) - np.repeat((cs - vs)[starts], lens)
        q_prev = (cq - vv) - np.repeat((cq - vv)[starts], lens)
        # overflow guards on the cross-multiplied rule (float estimates)
        mx_s = float(np.abs(s_prev).max(initial=0))
        mx_q = float(np.abs(q_prev).max(initial=0))
        mx_n = float(n_prev.max(initial=0))
        mx_v = float(np.abs(vs).max(initial=0))
        if (max(mx_n * mx_v, mx_s) ** 2 >= 2.0**62
                or z * z * (mx_n * mx_q + mx_s * mx_s) >= 2.0**62):
            raise ValueError("expanding_zscore_flags: integer rule overflows "
                             "int64 — shard long entity histories or rescale")
        dev = n_prev * vs - s_prev
        lhs = dev * dev
        rhs = np.int64(z * z) * (n_prev * q_prev - s_prev * s_prev)
        flag = lhs > rhs
        known = n_prev >= min_history
        out = block.take(pa.array(order))
        out = out.append_column("n_prev", pa.array(n_prev))
        out = out.append_column("anomaly", pa.array(flag, pa.bool_(), mask=~known))
        return out

    if isinstance(ds, pa.Table):
        return kern(ds)
    return sorted_block_apply(ds, entity_cols, kern, "expanding_zscore")


def rolling_corr(ds, entity_cols, time_col: str, x_col: str, y_col: str,
                 window: int, min_periods: int = 2,
                 output_col: str = "roll_corr"):
    """Rolling Pearson correlation of two INTEGER series over the previous
    ``window`` rows (current inclusive) in per-entity time order — the
    pair-signal feature (price-vs-volume, click-vs-dwell). All five rolling
    power sums (sx, sy, sxx, syy, sxy) are exact int64 prefix-sum
    differences, so

        ``corr = (n*sxy - sx*sy) / (sqrt(n*sxx - sx^2) * sqrt(n*syy - sy^2))``

    is the q_moments family: integer-derived doubles through sqrt/mul/div
    only — bit-identical to the same SQL window expression (HUGEINT window
    sums cast ::DOUBLE). Zero variance on either side, or fewer than
    ``min_periods`` rows in frame, -> NULL. Inputs must be non-null int
    columns and ``time_col`` (a column or a LIST of columns, lexicographic)
    must be a unique order key within each entity — ROWS frames are
    tie-order-dependent, so mirror the full composite in the SQL ORDER BY.

    Scale plan: ONE sort-shuffle on the entity key, then a fully vectorized
    segmented kernel (padded cumsums + clipped lookback gather)."""
    entity_cols = [entity_cols] if isinstance(entity_cols, str) else list(entity_cols)
    time_cols = [time_col] if isinstance(time_col, str) else list(time_col)
    if window < 1:
        raise ValueError("window must be >= 1")
    W = int(window)

    def blockfn(block: pa.Table) -> pa.Table:
        n_rows = block.num_rows
        if n_rows == 0:
            return _append_or_replace(block, output_col,
                                      pa.array([], pa.float64()))
        for c in (x_col, y_col):
            if A.as_array(block.column(c)).null_count:
                raise ValueError(f"rolling_corr requires non-null {c!r}")
        gids = S.group_ids(block, entity_cols)
        tkeys = [_time_to_numeric(A.as_array(block.column(tc)))
                 .to_numpy(zero_copy_only=False) for tc in time_cols]
        order = np.lexsort(tuple(reversed(tkeys)) + (gids,))
        gs = gids[order]
        x = pc.cast(A.as_array(block.column(x_col)), pa.int64(), safe=False) \
            .to_numpy(zero_copy_only=False)[order]
        y = pc.cast(A.as_array(block.column(y_col)), pa.int64(), safe=False) \
            .to_numpy(zero_copy_only=False)[order]
        starts, lens = S.segments(gs)
        mx = int(np.abs(x).max()) if n_rows else 0
        my = int(np.abs(y).max()) if n_rows else 0
        L = int(lens.max()) if len(lens) else 0
        if (max(W * mx, W * my) ** 2 >= 2**63
                or L * max(mx * mx, my * my, mx * my, 1) >= 2**62):
            raise ValueError(
                "rolling_corr integer power sums would overflow int64 — "
                "rescale inputs or reduce the window")
        pos = np.arange(n_rows, dtype=np.int64) - np.repeat(starts, lens)
        c = np.minimum(pos + 1, W)
        lo = np.arange(n_rows, dtype=np.int64) + 1 - c

        def roll(v):
            cp = np.concatenate(([0], np.cumsum(v)))
            return cp[np.arange(n_rows) + 1] - cp[lo]

        sx, sy = roll(x), roll(y)
        sxx, syy, sxy = roll(x * x), roll(y * y), roll(x * y)
        num = c * sxy - sx * sy
        da = c * sxx - sx * sx
        db = c * syy - sy * sy
        ok = (c >= min_periods) & (da > 0) & (db > 0)
        with np.errstate(invalid="ignore", divide="ignore"):
            res = np.where(
                ok,
                num.astype(np.float64)
                / (np.sqrt(np.where(ok, da, 1).astype(np.float64))
                   * np.sqrt(np.where(ok, db, 1).astype(np.float64))),
                np.nan,
            )
        out = np.empty(n_rows, np.float64)
        out[order] = res
        col = pa.array(out, pa.float64(), mask=np.isnan(out))
        return _append_or_replace(block, output_col, col)

    if isinstance(ds, pa.Table):
        return blockfn(ds)
    return sorted_block_apply(ds, entity_cols, blockfn, "rolling_corr")


def cusum_flags(ds, entity_cols, time_col, value_col: str,
                target_ppm: int, threshold_ppm: int,
                output_prefix: str = "cusum"):
    """Two-sided CUSUM drift detector per entity in time order — the
    classic sequential change-point statistic, computed EXACTLY in int64
    micro-units: with ``d_t = value_t * 1e6 - target_ppm``,

        ``s_up_t = max(0, s_up_{t-1} + d_t) = cum_t - min(0, min_{j<=t} cum_j)``
        ``s_dn_t = max(0, s_dn_{t-1} - d_t) = max(0, max_{j<=t} cum_j) - cum_t``

    (the prefix-extremum identity turns the recurrence into one cumsum +
    one grouped running min/max — no float recurrence, bit-exact in SQL as
    ``SUM/MIN/MAX OVER (... ROWS UNBOUNDED PRECEDING)``). Alarms fire when
    the statistic exceeds ``threshold_ppm``. Values must be non-null
    integers; ``time_col`` (column or list) must be a unique in-entity
    order key (composite keys as in :func:`rolling_corr`).

    Output columns appended: ``{prefix}_up``, ``{prefix}_dn`` (int64
    micro-units) and ``{prefix}_alarm`` (int8 0/1, either side).

    Scale plan: ONE sort-shuffle on the entity key; the kernel is a
    segmented cumsum + pandas C grouped cummin/cummax."""
    entity_cols = [entity_cols] if isinstance(entity_cols, str) else list(entity_cols)
    time_cols = [time_col] if isinstance(time_col, str) else list(time_col)

    def blockfn(block: pa.Table) -> pa.Table:
        import pandas as pd

        n_rows = block.num_rows
        if n_rows == 0:
            out = _append_or_replace(block, f"{output_prefix}_up",
                                     pa.array([], pa.int64()))
            out = _append_or_replace(out, f"{output_prefix}_dn",
                                     pa.array([], pa.int64()))
            return _append_or_replace(out, f"{output_prefix}_alarm",
                                      pa.array([], pa.int8()))
        varr = A.as_array(block.column(value_col))
        if varr.null_count:
            raise ValueError("cusum_flags requires non-null values")
        gids = S.group_ids(block, entity_cols)
        tkeys = [_time_to_numeric(A.as_array(block.column(tc)))
                 .to_numpy(zero_copy_only=False) for tc in time_cols]
        order = np.lexsort(tuple(reversed(tkeys)) + (gids,))
        gs = gids[order]
        x = pc.cast(varr, pa.int64(), safe=False) \
            .to_numpy(zero_copy_only=False)[order]
        starts, lens = S.segments(gs)
        mx = int(np.abs(x).max()) if n_rows else 0
        L = int(lens.max()) if len(lens) else 0
        if L * (mx * 1_000_000 + abs(int(target_ppm))) >= 2**62:
            raise ValueError("cusum_flags cumulative micro-units risk int64 "
                             "overflow — rescale values")
        d = x * np.int64(1_000_000) - np.int64(target_ppm)
        cum = np.cumsum(d)
        base = cum[starts] - d[starts]
        cum_in = cum - np.repeat(base, lens)
        gid_rep = np.repeat(np.arange(len(starts)), lens)
        ser = pd.Series(cum_in)
        rmin = ser.groupby(gid_rep).cummin().to_numpy()
        rmax = ser.groupby(gid_rep).cummax().to_numpy()
        s_up = cum_in - np.minimum(rmin, 0)
        s_dn = np.maximum(rmax, 0) - cum_in
        alarm = ((s_up > threshold_ppm) | (s_dn > threshold_ppm)).astype(np.int8)
        up = np.empty(n_rows, np.int64)
        dn = np.empty(n_rows, np.int64)
        al = np.empty(n_rows, np.int8)
        up[order], dn[order], al[order] = s_up, s_dn, alarm
        out = _append_or_replace(block, f"{output_prefix}_up", pa.array(up))
        out = _append_or_replace(out, f"{output_prefix}_dn", pa.array(dn))
        return _append_or_replace(out, f"{output_prefix}_alarm", pa.array(al))

    if isinstance(ds, pa.Table):
        return blockfn(ds)
    return sorted_block_apply(ds, entity_cols, blockfn, "cusum_flags")


def event_ngram_counts(ds, entity_cols, time_col: str, event_col: str, n: int,
                       tiebreak_col: str | None = None, sep: str = "\x1f"):
    """Sequential path mining: global counts of every length-``n`` run of
    consecutive events within an entity timeline — the k-step
    generalization of :func:`transition_counts` (funnels / sankey paths /
    session n-grams). A path renders as the events joined by ``sep``
    (chr(31) by default — the FeatureCross unit-separator rule, so labels
    can never alias structurally).

    Null-event semantics match transition_counts (= the LEAD oracle with a
    final WHERE): a null event still consumes its timeline position but
    every window touching it drops. Pass a unique ``tiebreak_col`` for
    deterministic paths under equal timestamps.

    Scale plan: ONE entity sort-shuffle; the block kernel is one lexsort +
    n-1 shifted compares, paths pack into ONE int64 code (codes *
    K^j — K = block dictionary size, guarded < 2^62) for the per-block
    np.unique partial; the final exchange carries only (path, n) cells."""
    entity_cols = [entity_cols] if isinstance(entity_cols, str) else list(entity_cols)
    if n < 2 or n > 8:
        raise ValueError("n must be in [2, 8]")

    def kern(block: pa.Table) -> pa.Table:
        empty = pa.table({
            "path": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        })
        if block.num_rows == 0:
            return empty
        ev = pc.cast(A.as_array(block.column(event_col)), pa.string(), safe=False)
        d = ev.dictionary_encode()
        K = len(d.dictionary)
        if K and K ** n >= (1 << 62):
            raise ValueError("event_ngram_counts: dictionary^n exceeds int64 "
                             "packing — reduce n or the label cardinality")
        codes = pc.fill_null(d.indices, -1).to_numpy(zero_copy_only=False).astype(np.int64)
        t = _time_to_numeric(A.as_array(block.column(time_col))).to_numpy(zero_copy_only=False)
        gids = S.group_ids(block, entity_cols)
        keys = [t, gids]
        if tiebreak_col is not None:
            tb = pc.cast(A.as_array(block.column(tiebreak_col)), pa.int64(), safe=False)
            keys = [tb.to_numpy(zero_copy_only=False), t, gids]
        order = np.lexsort(tuple(keys))
        gs, cs = gids[order], codes[order]
        m = len(gs) - (n - 1)
        if m <= 0:
            return empty
        ok = gs[:m] == gs[n - 1:]          # window stays inside one entity
        packed = np.zeros(m, np.int64)
        for j in range(n):
            cj = cs[j:m + j]
            ok = ok & (cj >= 0)
            packed = packed * np.int64(max(K, 1)) + cj
        packed = packed[ok]
        if not len(packed):
            return empty
        uniq, counts = np.unique(packed, return_counts=True)
        parts = []
        rem = uniq
        for j in range(n):
            parts.append(rem % np.int64(max(K, 1)))
            rem = rem // np.int64(max(K, 1))
        labels = [d.dictionary.take(pa.array(p, pa.int64()))
                  for p in reversed(parts)]
        path = pc.binary_join_element_wise(*labels, pa.scalar(sep))
        return pa.table({"path": path,
                         "n": pa.array(counts.astype(np.int64))})

    from kamae_ray.stages.aggregate import groupby_agg

    if isinstance(ds, pa.Table):
        cells = kern(ds)
    else:
        cols = entity_cols + [time_col, event_col] + (
            [tiebreak_col] if tiebreak_col else [])
        proj = ds
        try:
            proj = ds.select_columns(list(dict.fromkeys(cols)))
        except Exception:
            pass
        cells = sorted_block_apply(proj, entity_cols, kern, "ngram_cells")
    agg = groupby_agg(cells, ["path"], {"n": ["sum"]})

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "path": b.column("path"),
            "n": pc.cast(b.column("n_sum"), pa.int64(), safe=False),
        })

    finish.__name__ = "ngram_finish"
    if isinstance(agg, pa.Table):
        return finish(agg)
    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=None)


def rolling_count_distinct(ds, entity_cols, time_col, item_col: str,
                           window: int, out_col: str | None = None):
    """Trailing-window distinct count per entity: for each row, the number
    of DISTINCT non-null ``item_col`` values among the last ``window`` rows
    of its entity in ``time_col`` order — SQL's windowed
    ``COUNT(DISTINCT item) OVER (... ROWS BETWEEN window-1 PRECEDING AND
    CURRENT ROW)``, integer-exact (no sketch).

    Vectorized via the previous-occurrence trick: order rows by (entity,
    time); a window row is NON-distinct at frame end ``i`` iff its previous
    in-entity occurrence of the same item also sits inside the frame, and
    each (prev, row) duplicate pair covers the CONTIGUOUS range of frame
    ends ``[row, prev + window - 1]`` — so all duplicate counts fold into
    ONE difference array + cumsum. A null item is in the frame but never
    distinct (SQL semantics): it covers its own ``[row, row + window - 1]``
    range. ``distinct_i = min(pos_in_entity + 1, window) - dup_i``.

    ``time_col`` (column or list) must be a unique in-entity order key for
    deterministic frames (composite keys as in :func:`rolling_corr`).

    Scale plan: ONE sort-shuffle on the entity key, then a block kernel of
    two lexsorts + one cumsum — no per-group Python, no per-window rescan."""
    entity_cols = [entity_cols] if isinstance(entity_cols, str) else list(entity_cols)
    time_cols = [time_col] if isinstance(time_col, str) else list(time_col)
    if window < 1:
        raise ValueError("window must be >= 1")
    name = out_col or f"{item_col}_wdistinct"
    W = int(window)

    def blockfn(block: pa.Table) -> pa.Table:
        n = block.num_rows
        if n == 0:
            return _append_or_replace(block, name, pa.array([], pa.int64()))
        gids = S.group_ids(block, entity_cols)
        tkeys = [_time_to_numeric(A.as_array(block.column(tc)))
                 .to_numpy(zero_copy_only=False) for tc in time_cols]
        order = np.lexsort(tuple(reversed(tkeys)) + (gids,))
        gs = gids[order]
        d = A.as_array(block.column(item_col)).dictionary_encode()
        codes = pc.fill_null(d.indices, -1).to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)[order]
        starts, lens = S.segments(gs)
        w = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
        glen = np.repeat(lens, lens).astype(np.int64, copy=False)
        # previous in-entity occurrence of the same item (within-entity pos)
        o2 = np.lexsort((w, codes, gs))
        gs2, c2, w2 = gs[o2], codes[o2], w[o2]
        pw = np.full(n, np.int64(-(2 ** 62)), np.int64)
        same = (gs2[1:] == gs2[:-1]) & (c2[1:] == c2[:-1])
        pw[1:][same] = w2[:-1][same]
        prev_w = np.empty(n, np.int64)
        prev_w[o2] = pw
        isnull = codes < 0
        prev_w[isnull] = w[isnull]  # null: duplicate in every frame holding it
        covered = prev_w >= w - (W - 1)
        j = np.nonzero(covered)[0]
        end = np.minimum(prev_w[j] + (W - 1), glen[j] - 1)
        diff = np.zeros(n + 1, np.int64)
        np.add.at(diff, j, 1)
        np.add.at(diff, j - w[j] + end + 1, -1)
        dup = np.cumsum(diff[:n])
        dist = np.minimum(w + 1, W) - dup
        res = np.empty(n, np.int64)
        res[order] = dist
        return _append_or_replace(block, name, pa.array(res))

    if isinstance(ds, pa.Table):
        return blockfn(ds)
    return sorted_block_apply(ds, entity_cols, blockfn, "rolling_count_distinct")


def session_drift(ds, entity_col: str, time_col: str, tiebreak_col: str,
                  type_col: str, gap: int, max_seq: int = 64):
    """Behavioral session drift: sessionize each entity's event stream by
    inactivity ``gap`` (microseconds, the q_session_stats semantics:
    break when gap STRICTLY exceeds), render every session as the string of
    its events' FIRST CHARACTERS in (time, tiebreak) order capped at
    ``max_seq``, and score each consecutive session pair with the
    byte-level Levenshtein distance (ASCII == SQL ``levenshtein``) — how
    much an entity's behavior pattern changed session-over-session. Null
    types are skipped in the string but still drive sessionization (SQL
    ``string_agg`` null-skipping); empty types contribute nothing.

    Output: ``user_id, session_id (the LATER session), prev_seq, seq,
    dist`` — sessions 1.. of each entity (session 0 has no predecessor).

    Scale plan: ONE wide stage — sort co-locates entities (sort key ==
    entity, lesson 9), then a single block kernel does sessionization,
    capped string assembly (one byte gather + offsets — no per-session
    Python) and the pair distances (functions/editdist, vectorized across
    pairs). SQL mirror: gaps-and-islands + ``substr(string_agg(c, ''
    ORDER BY ts, id), 1, max_seq)`` + ``lag`` + ``levenshtein``."""
    from kamae_ray.functions.editdist import levenshtein_pairwise

    gap_us = np.int64(gap)
    empty = pa.table({
        "user_id": pa.array([], pa.int64()),
        "session_id": pa.array([], pa.int64()),
        "prev_seq": pa.array([], pa.string()),
        "seq": pa.array([], pa.string()),
        "dist": pa.array([], pa.int64()),
    })

    def kern(block: pa.Table) -> pa.Table:
        n = block.num_rows
        if n == 0:
            return empty
        uid = pc.cast(A.as_array(block.column(entity_col)), pa.int64(),
                      safe=False).to_numpy(zero_copy_only=False)
        ts = pc.cast(A.as_array(block.column(time_col)), pa.int64(),
                     safe=False).to_numpy(zero_copy_only=False)
        tb = pc.cast(A.as_array(block.column(tiebreak_col)), pa.int64(),
                     safe=False).to_numpy(zero_copy_only=False)
        tarr = pc.cast(A.as_array(block.column(type_col)), pa.string(), safe=False)
        tarr = tarr.combine_chunks() if isinstance(tarr, pa.ChunkedArray) else tarr
        bufs = tarr.buffers()
        width = np.int64 if pa.types.is_large_string(tarr.type) else np.int32
        offs = np.frombuffer(bufs[-2], dtype=width)[
            tarr.offset: tarr.offset + n + 1].astype(np.int64)
        data = (np.frombuffer(bufs[-1], dtype=np.uint8)
                if bufs[-1] is not None else np.zeros(0, np.uint8))
        lens = offs[1:] - offs[:-1]
        valid = np.ones(n, bool)
        if tarr.null_count:
            valid = pc.is_valid(tarr).to_numpy(zero_copy_only=False)
        keep_row = valid & (lens > 0)
        first_byte = np.zeros(n, np.uint8)
        nz = lens > 0
        first_byte[nz] = data[offs[:-1][nz]]

        order = np.lexsort((tb, ts, uid))
        u, t = uid[order], ts[order]
        fb, k = first_byte[order], keep_row[order]
        ustarts, ulens = S.segments(u)
        prev_t = np.empty_like(t)
        prev_t[1:] = t[:-1]
        prev_t[ustarts] = t[ustarts]
        brk = (t - prev_t) > gap_us
        brk[ustarts] = False
        cs = np.cumsum(brk.astype(np.int64))
        sess = cs - np.repeat(cs[ustarts], ulens)

        newseg = brk.copy()
        newseg[ustarts] = True
        sstarts = np.flatnonzero(newseg)
        slens = np.diff(np.append(sstarts, n))
        ns = len(sstarts)
        # capped kept-rank inside each session
        kint = k.astype(np.int64)
        kc = np.cumsum(kint)
        kbase = np.repeat(kc[sstarts] - kint[sstarts], slens)
        rank0 = kc - kbase - 1  # 0-based among kept rows (valid where k)
        sel = k & (rank0 < max_seq)
        seq_bytes = fb[sel]
        cnt = np.add.reduceat(sel.astype(np.int64), sstarts) if ns else np.zeros(0, np.int64)
        # reduceat quirk: a trailing empty segment still yields its start elem
        cnt = cnt * (slens > 0)
        soff = np.concatenate([[0], np.cumsum(cnt)]).astype(np.int32)
        strs = pa.Array.from_buffers(
            pa.utf8(), ns,
            [None, pa.py_buffer(soff.tobytes()), pa.py_buffer(seq_bytes.tobytes())])

        su = u[sstarts]
        sidx = sess[sstarts]
        not_first = np.ones(ns, bool)
        su_starts, _ = S.segments(su)
        not_first[su_starts] = False
        cur = np.flatnonzero(not_first)
        if len(cur) == 0:
            return empty
        prev = cur - 1
        cur_a = strs.take(pa.array(cur))
        prev_a = strs.take(pa.array(prev))
        dist = levenshtein_pairwise(prev_a, cur_a, max_len=max_seq)
        return pa.table({
            "user_id": pa.array(su[cur], pa.int64()),
            "session_id": pa.array(sidx[cur], pa.int64()),
            "prev_seq": prev_a,
            "seq": cur_a,
            "dist": pa.array(dist.astype(np.int64), pa.int64()),
        })

    if isinstance(ds, pa.Table):
        return kern(ds)
    return sorted_block_apply(ds, [entity_col], kern, "session_drift")


def scd2_merge(dim, snapshot, key_cols, time_col: str, attr_cols,
               carry_cols: list[str] | None = None):
    """Incremental SCD2 merge — apply one CDC snapshot batch to an existing
    :func:`scd2_build` dimension WITHOUT rebuilding history: per key, if
    the snapshot's tracked attrs differ (null-safe) from the key's open
    version, close it at the snapshot time and open version+1; equal attrs
    and absent keys leave the dimension untouched; brand-new keys insert
    version 1. The certified contract (tests + q_scd2_merge oracle) is
    ``merge(build(old), snap) == build(old UNION snap)`` whenever each
    key's snapshot time is strictly later than its open ``valid_from``
    (raised otherwise) and the snapshot holds ONE row per key (raised).

    Scale plan: closed versions stream through untouched; only the open
    slice (one row per key) FULL-OUTER shuffle-joins the snapshot, and a
    vectorized block map emits unchanged/closed/new rows — O(keys)
    exchange, never the history."""
    from kamae_ray.stages.join import shuffle_join

    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    attr_cols = [attr_cols] if isinstance(attr_cols, str) else list(attr_cols)
    carry_cols = list(carry_cols or [])
    out_cols = key_cols + carry_cols + attr_cols + [
        "valid_from", "valid_to", "version", "is_current"]
    ren = {c: f"__s_{c}" for c in carry_cols + attr_cols + [time_col]}

    def snap_prep(t: pa.Table) -> pa.Table:
        cols = {k: t.column(k) for k in key_cols}
        for c, rc in ren.items():
            cols[rc] = t.column(c)
        cols["__s_present"] = pa.array(np.ones(t.num_rows, np.int64))
        return pa.table(cols)

    snap_prep.__name__ = "scd2m_snap"

    def split(pred):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pred(t.column("is_current")))
        return f

    def merge_block(t: pa.Table) -> pa.Table:
        n = t.num_rows
        o_has = pc.is_valid(t.column("version")).to_numpy(zero_copy_only=False)
        s_has = pc.is_valid(t.column("__s_present")).to_numpy(zero_copy_only=False)
        # null-safe "attrs differ" vector
        differ = np.zeros(n, bool)
        for c in attr_cols:
            a = A.as_array(t.column(c))
            b = A.as_array(t.column(f"__s_{c}"))
            av = pc.is_valid(a).to_numpy(zero_copy_only=False)
            bv = pc.is_valid(b).to_numpy(zero_copy_only=False)
            neq = pc.fill_null(pc.not_equal(a, b), True).to_numpy(zero_copy_only=False)
            differ |= np.where(av & bv, neq, av != bv)
        both = o_has & s_has
        if both.any():
            vf = pc.cast(A.as_array(t.column("valid_from")), pa.int64(),
                         safe=False).to_numpy(zero_copy_only=False)
            st = pc.cast(A.as_array(t.column(f"__s_{time_col}")), pa.int64(),
                         safe=False).to_numpy(zero_copy_only=False)
            if (st[both] <= vf[both]).any():
                raise ValueError(
                    "scd2_merge: a snapshot time is not strictly later than "
                    "the key's open valid_from — the incremental==rebuild "
                    "contract does not hold; rebuild with scd2_build")
        pieces = []
        unchanged = o_has & (~s_has | (s_has & ~differ))
        if unchanged.any():
            sub = t.filter(pa.array(unchanged))
            pieces.append(pa.table({c: sub.column(c) for c in out_cols}))
        closing = both & differ
        if closing.any():
            sub = t.filter(pa.array(closing))
            cols = {c: sub.column(c) for c in out_cols}
            cols["valid_to"] = pc.cast(sub.column(f"__s_{time_col}"),
                                       sub.column("valid_from").type, safe=False)
            cols["is_current"] = pa.array(np.zeros(sub.num_rows, bool))
            pieces.append(pa.table(cols))
            newc = {k: sub.column(k) for k in key_cols}
            for c in carry_cols + attr_cols:
                newc[c] = pc.cast(sub.column(f"__s_{c}"), sub.column(c).type,
                                  safe=False)
            newc["valid_from"] = pc.cast(sub.column(f"__s_{time_col}"),
                                         sub.column("valid_from").type, safe=False)
            newc["valid_to"] = pa.nulls(sub.num_rows, sub.column("valid_to").type)
            newc["version"] = pc.add(sub.column("version"), 1)
            newc["is_current"] = pa.array(np.ones(sub.num_rows, bool))
            pieces.append(pa.table({c: newc[c] for c in out_cols}))
        fresh = s_has & ~o_has
        if fresh.any():
            sub = t.filter(pa.array(fresh))
            newc = {k: sub.column(k) for k in key_cols}
            for c in carry_cols + attr_cols:
                newc[c] = pc.cast(sub.column(f"__s_{c}"), sub.column(c).type,
                                  safe=False)
            newc["valid_from"] = pc.cast(sub.column(f"__s_{time_col}"),
                                         sub.column("valid_from").type, safe=False)
            newc["valid_to"] = pa.nulls(sub.num_rows, sub.column("valid_to").type)
            newc["version"] = pa.array(np.ones(sub.num_rows, np.int64))
            newc["is_current"] = pa.array(np.ones(sub.num_rows, bool))
            pieces.append(pa.table({c: newc[c] for c in out_cols}))
        if not pieces:
            return t.select(out_cols).slice(0, 0)
        return pa.concat_tables(pieces)

    merge_block.__name__ = "scd2m_apply"

    def _check_unique(snap_tbl: pa.Table):
        gids = S.group_ids(snap_tbl, key_cols)
        if len(gids) and len(np.unique(gids)) != len(gids):
            raise ValueError("scd2_merge: snapshot must hold one row per key")

    if isinstance(dim, pa.Table):
        snap = snap_prep(snapshot)
        if snap.num_rows == 0:
            return dim.select(out_cols)  # empty CDC batch: no-op
        _check_unique(snap)
        closed = dim.filter(pc.invert(dim.column("is_current").combine_chunks()))
        open_ = dim.filter(dim.column("is_current").combine_chunks())
        j = shuffle_join(open_, snap, on=key_cols, how="outer")
        merged = merge_block(j)
        return pa.concat_tables([closed.select(out_cols), merged.select(out_cols)])

    import pyarrow.compute as _pc  # noqa: F401

    from kamae_ray.stages.aggregate import distinct

    snap = snapshot.map_batches(snap_prep, batch_format="pyarrow",
                                zero_copy_batch=True, batch_size=None).materialize()
    n_snap = snap.count()
    if n_snap == 0:
        return dim  # an empty CDC batch is a no-op (and lesson 19: an
        # empty materialized snapshot loses its schema through the join)
    if distinct(snap, key_cols).count() != n_snap:
        raise ValueError("scd2_merge: snapshot must hold one row per key")
    dim = dim.materialize()  # consumed twice (closed + open slices)

    def keep_closed(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(A.as_array(t.column("is_current")))) \
            .select(out_cols)

    def keep_open(t: pa.Table) -> pa.Table:
        return t.filter(A.as_array(t.column("is_current")))

    keep_closed.__name__ = "scd2m_closed"
    keep_open.__name__ = "scd2m_open"
    closed = dim.map_batches(keep_closed, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=None)
    open_ = dim.map_batches(keep_open, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=None)
    j = shuffle_join(open_, snap, on=key_cols, how="outer")
    merged = j.map_batches(merge_block, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
    return closed.union(merged)


def change_point_by_entity(ds, entity_col: str, time_col: str,
                           tiebreak_col: str, value_col: str):
    """Single change-point per entity (binary segmentation, K=1): the split
    k maximizing the between-segment sum of squares over the (time,
    tiebreak) order — CUSUM's location-estimating sibling. Engine-exact
    argmax: with prefix sum ``s1`` and totals (n, s), the score
    ``d^2 / (n1 * n2)`` with ``d = s1*n2 - s2*n1`` is built from EXACT
    int64 ints (guarded), so both engines compute bit-identical floats and
    the (score DESC, k ASC) winner matches SQL ROW_NUMBER exactly.
    Output: ``entity, split_t (last time of the left segment), k (1-based
    left size), score``. Entities with one row have no split and drop.

    Scale plan: ONE entity sort, one in-block prefix-sum sweep per entity —
    no per-row Python, no second pass."""
    empty = pa.table({
        "entity": pa.array([], pa.int64()),
        "split_t": pa.array([], pa.int64()),
        "k": pa.array([], pa.int64()),
        "score": pa.array([], pa.float64()),
    })

    def kern(block: pa.Table) -> pa.Table:
        n_rows = block.num_rows
        if n_rows == 0:
            return empty
        e = pc.cast(A.as_array(block.column(entity_col)), pa.int64(),
                    safe=False).to_numpy(zero_copy_only=False)
        t = pc.cast(A.as_array(block.column(time_col)), pa.int64(),
                    safe=False).to_numpy(zero_copy_only=False)
        tb = pc.cast(A.as_array(block.column(tiebreak_col)), pa.int64(),
                     safe=False).to_numpy(zero_copy_only=False)
        v = pc.cast(pc.fill_null(A.as_array(block.column(value_col)), 0),
                    pa.int64(), safe=False).to_numpy(zero_copy_only=False)
        order = np.lexsort((tb, t, e))
        e, t, v = e[order], t[order], v[order]
        estarts, elens = S.segments(e)
        cs = np.cumsum(v)
        base = np.repeat(cs[estarts] - v[estarts], elens)
        s1 = cs - base  # inclusive prefix within entity
        n = np.repeat(elens, elens).astype(np.int64)
        stot = np.repeat(s1[estarts + elens - 1], elens)
        k = np.arange(n_rows, dtype=np.int64) - np.repeat(estarts, elens) + 1
        n2 = n - k
        valid = n2 > 0
        if np.abs(s1).max(initial=0) * int(n.max(initial=1)) >= (1 << 62):
            raise ValueError("change_point_by_entity: prefix-sum x n risks "
                             "int64 overflow; shrink value units")
        d = s1 * n2 - (stot - s1) * k
        with np.errstate(invalid="ignore", divide="ignore"):
            score = np.where(valid,
                             (d.astype(np.float64) * d.astype(np.float64))
                             / (k * n2).astype(np.float64, copy=False),
                             -np.inf)
        # per-entity argmax, vectorized: segment max via reduceat, then the
        # FIRST position achieving it (rows are k-ascending -> smallest k)
        mx = np.maximum.reduceat(score, estarts)
        cand = np.flatnonzero(score == np.repeat(mx, elens))
        e_cand = e[cand]
        first = np.ones(len(cand), bool)
        first[1:] = e_cand[1:] != e_cand[:-1]
        best = cand[first]
        ok = elens > 1
        bidx = best[ok]
        return pa.table({"entity": pa.array(e[bidx], pa.int64()),
                         "split_t": pa.array(t[bidx], pa.int64()),
                         "k": pa.array(k[bidx], pa.int64()),
                         "score": pa.array(score[bidx], pa.float64())})

    if isinstance(ds, pa.Table):
        return kern(ds)
    return sorted_block_apply(ds, [entity_col], kern, "change_point")
