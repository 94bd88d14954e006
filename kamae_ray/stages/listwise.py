"""Listwise transformers: per-query-id group statistics broadcast back onto
every row, §2.11 of SURVEY.md.

Reference semantics: src/kamae/spark/transformers/{list_max,list_min,
list_mean,list_median,list_std_dev,list_rank}.py via
src/kamae/spark/utils/list_utils.py:59-159 —
- partition rows by ``query_id_col`` (optionally also a segment column),
- optionally restrict the statistic to the top-N rows by a sort column
  (row_number <= N) and/or to values >= ``min_filter_value``,
- compute the statistic and broadcast it to every row of the group,
- ``nan_fill_value`` replaces null/NaN results (empty groups).
ListRank emits row_number() over (query, order by value asc/desc); ties follow
row order (pin a deterministic secondary key upstream for reproducibility).

Ray design: the only wide transform family — a hash shuffle on the query key
via ``ds.groupby(keys).map_groups(fn, batch_format="pyarrow")`` with a
vectorized numpy kernel per group. Ray's map_groups sort-shuffles once and
keeps groups intact across block boundaries. Hot query-ids are bounded by
group size (listwise groups are result-page sized by construction); the
windowed layer (window.py) carries the salting machinery for skewed entities.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kamae_ray.base import Transformer, _append_or_replace
from kamae_ray.functions import arrays as A


def _std_samp(x: np.ndarray) -> float:
    return float(np.std(x, ddof=1)) if len(x) > 1 else float("nan")


_STATS = {
    "max": lambda x: float(np.max(x)),
    "min": lambda x: float(np.min(x)),
    "mean": lambda x: float(np.mean(x)),
    "median": lambda x: float(np.median(x)),
    "stddev": _std_samp,
}


class ListStatTransformer(Transformer):
    """Generic listwise statistic. stat in {max,min,mean,median,stddev}."""

    compatible_dtypes = None
    fusible = False
    stat: str = "mean"

    def __init__(
        self,
        *args,
        query_id_col: str,
        sort_col: str | None = None,
        segment_col: str | None = None,
        sort_order: str = "asc",
        top_n: int | None = None,
        min_filter_value: float | None = None,
        nan_fill_value: float = 0.0,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.query_id_col = query_id_col
        self.sort_col = sort_col
        self.segment_col = segment_col
        self.sort_order = sort_order
        self.top_n = top_n
        self.min_filter_value = min_filter_value
        self.nan_fill_value = nan_fill_value

    # -- per-group kernel (pure, numpy) --
    def _group_stat(self, group: pa.Table) -> float:
        vals = A.as_array(group.column(self.input_col)).to_numpy(zero_copy_only=False).astype(np.float64)
        cond = ~np.isnan(vals)
        if self.sort_col is not None:
            order_vals = A.as_array(group.column(self.sort_col)).to_numpy(zero_copy_only=False)
            order = np.argsort(order_vals, kind="stable")
            if self.sort_order == "desc":
                order = np.argsort(-order_vals, kind="stable")
            rank = np.empty(len(order), dtype=np.int64)
            rank[order] = np.arange(1, len(order) + 1)
            if self.top_n is None:
                raise ValueError("top_n must be set if sort_col is set")
            cond &= rank <= self.top_n
        if self.min_filter_value is not None:
            cond &= vals >= self.min_filter_value
        sel = vals[cond]
        if len(sel) == 0:
            return float(self.nan_fill_value)
        out = _STATS[self.stat](sel)
        if np.isnan(out):
            return float(self.nan_fill_value)
        return out

    def _map_group(self, group: pa.Table) -> pa.Table:
        stat = self._group_stat(group)
        col = pa.array(np.full(group.num_rows, stat), pa.float64())
        return _append_or_replace(group, self.output_col, self._cast_out(col))

    def _keys(self) -> list[str]:
        keys = [self.query_id_col]
        if self.segment_col is not None:
            keys.append(self.segment_col)
        return keys

    def transform(self, ds):
        if isinstance(ds, pa.Table):
            return self._transform_table(ds)
        return ds.groupby(self._keys()).map_groups(self._map_group, batch_format="pyarrow")

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        # listwise semantics only hold if the batch contains whole groups
        return self._transform_table(batch)

    def _transform_table(self, t: pa.Table) -> pa.Table:
        keys = self._keys()
        key_strs = [
            "\x1f".join(str(t.column(k)[i].as_py()) for k in keys) for i in range(t.num_rows)
        ]
        _, inv = np.unique(np.asarray(key_strs), return_inverse=True)
        out = np.empty(t.num_rows, dtype=np.float64)
        for g in range(inv.max() + 1) if t.num_rows else []:
            idx = np.nonzero(inv == g)[0]
            stat = self._group_stat(t.take(pa.array(idx)))
            out[idx] = stat
        col = pa.array(out, pa.float64())
        return _append_or_replace(t, self.output_col, self._cast_out(col))


class ListMaxTransformer(ListStatTransformer):
    """Reference: transformers/list_max.py:158."""

    stat = "max"


class ListMinTransformer(ListStatTransformer):
    """Reference: transformers/list_min.py:158."""

    stat = "min"


class ListMeanTransformer(ListStatTransformer):
    """Reference: transformers/list_mean.py:139-183."""

    stat = "mean"


class ListMedianTransformer(ListStatTransformer):
    """Exact (interpolated) median. Reference: transformers/list_median.py:139-183."""

    stat = "median"


class ListStdDevTransformer(ListStatTransformer):
    """Sample standard deviation. Reference: transformers/list_std_dev.py."""

    stat = "stddev"


class ListRankTransformer(ListStatTransformer):
    """row_number() over (query, order by value asc/desc); ties by row order.
    Reference: transformers/list_rank.py:97-132."""

    def _map_group(self, group: pa.Table) -> pa.Table:
        vals = A.as_array(group.column(self.input_col)).to_numpy(zero_copy_only=False)
        key = -vals if self.sort_order == "desc" else vals
        order = np.argsort(key, kind="stable")
        rank = np.empty(len(order), dtype=np.int64)
        rank[order] = np.arange(1, len(order) + 1)
        col = pa.array(rank, pa.int64())
        return _append_or_replace(group, self.output_col, self._cast_out(col))

    def _transform_table(self, t: pa.Table) -> pa.Table:
        keys = self._keys()
        key_strs = [
            "\x1f".join(str(t.column(k)[i].as_py()) for k in keys) for i in range(t.num_rows)
        ]
        _, inv = np.unique(np.asarray(key_strs), return_inverse=True)
        out = np.empty(t.num_rows, dtype=np.int64)
        vals = A.as_array(t.column(self.input_col)).to_numpy(zero_copy_only=False)
        for g in range(inv.max() + 1) if t.num_rows else []:
            idx = np.nonzero(inv == g)[0]
            key = -vals[idx] if self.sort_order == "desc" else vals[idx]
            order = np.argsort(key, kind="stable")
            r = np.empty(len(order), dtype=np.int64)
            r[order] = np.arange(1, len(order) + 1)
            out[idx] = r
        col = pa.array(out, pa.int64())
        return _append_or_replace(t, self.output_col, self._cast_out(col))
