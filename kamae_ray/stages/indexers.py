"""Vocabulary indexing / one-hot encoding: fitted transformers + estimators.

Reference semantics (exact null/mask/OOV integer rules):
- indexer_udf (reference: src/kamae/spark/utils/user_defined_functions.py:46-102):
  mask token -> 0; known label -> position + num_oov + (1 if mask else 0);
  unknown -> farmhash64(label) % num_oov + start_index; null -> 0 (error if
  num_oov == 0).
- one_hot_encoding_udf (:105-139): index then one-hot float vector;
  drop_unseen drops the mask/OOV slots.
- label collection (indexer_utils.py:48-172): frequency or alphabetical
  ordering, optional max_num_labels; frequency ties broken lexicographically
  here (deterministic refinement, see SURVEY.md §2.13).

Ray design: fit = per-block value-count partials + tiny groupby shuffle
(state/aggregators.py). Transform = O(1) dict lookups over the
dictionary-encoded batch (each distinct string resolved once per batch) —
vs the reference's O(V) ``labels.index``. Large vocabularies ride the
transformer object; pipelines run these stages in actor pools so the dict is
deserialized once per worker, not per batch (base.Transformer actor path).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kamae_ray.base import Estimator, Transformer, _append_or_replace
from kamae_ray.functions import arrays as A
from kamae_ray.functions.farmhash import cached_hash64
from kamae_ray.state import aggregators as agg


class _IndexerCore:
    """Shared label->index logic with mask/OOV rules."""

    labels_array: list[str]
    mask_token: str | None
    num_oov_indices: int

    def _index_map(self) -> dict[str, int]:
        if not hasattr(self, "_cached_map") or self._cached_map is None:
            start = 1 if self.mask_token is not None else 0
            offset = self.num_oov_indices + start
            self._cached_map = {lbl: i + offset for i, lbl in enumerate(self.labels_array)}
        return self._cached_map

    def warm_up(self) -> None:
        """Per-actor setup hook: build the lookup dict once per actor."""
        self._index_map()

    @property
    def state_size_hint(self) -> int:
        return len(self.labels_array)

    def _index_one(self, label: str | None) -> int:
        if label is None:
            if self.num_oov_indices > 0:
                return 0
            raise ValueError("Found null label but num_oov_indices is 0.")
        if self.mask_token is not None and label == self.mask_token:
            return 0
        m = self._index_map()
        idx = m.get(label)
        if idx is not None:
            return idx
        if self.num_oov_indices == 0:
            raise ValueError(f"Label {label} not found in labels array and num_oov_indices is 0.")
        start = 1 if self.mask_token is not None else 0
        return (cached_hash64(label) % self.num_oov_indices) + start

    def _index_flat(self, flat: pa.Array) -> pa.Array:
        if not pa.types.is_string(flat.type):
            flat = pc.cast(flat, pa.string(), safe=False)
        d = flat.dictionary_encode()
        dict_vals = d.dictionary.to_pylist()
        mapped = np.array([self._index_one(v) for v in dict_vals], dtype=np.int64) if dict_vals else np.array([], np.int64)
        indices = pc.fill_null(d.indices, 0).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        null_mask = pc.is_null(flat).to_numpy(zero_copy_only=False)
        out = np.zeros(len(flat), dtype=np.int64)
        valid = ~null_mask
        if len(mapped):
            out[valid] = mapped[indices[valid]]
        if null_mask.any() and self.num_oov_indices == 0:
            raise ValueError("Found null label but num_oov_indices is 0.")
        return pa.array(out, pa.int64())


class StringIndexTransformer(Transformer, _IndexerCore):
    """Vocab -> index with mask/OOV rules. Reference: transformers/string_index.py:124."""

    compatible_dtypes = None

    def __init__(
        self,
        *args,
        labels_array: Sequence[str],
        mask_token: str | None = None,
        num_oov_indices: int = 1,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.labels_array = list(labels_array)
        self.mask_token = mask_token
        self.num_oov_indices = int(num_oov_indices)
        self._cached_map = None

    def get_params(self):
        p = super().get_params()
        p.pop("_cached_map", None)
        return p

    def _transform_array(self, arr: pa.Array, batch: pa.Table) -> pa.Array:
        return A.lift(self._index_flat, arr)


class SharedStringIndexTransformer(StringIndexTransformer):
    """Same vocab applied to N columns. Reference: transformers/shared_string_index.py:129."""

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        for in_col, out_col in zip(self.input_cols, self.output_cols):
            arr = self._cast_in(batch.column(in_col))
            out = self._cast_out(A.lift(self._index_flat, arr))
            batch = _append_or_replace(batch, out_col, out)
        return batch


class OneHotEncodeTransformer(Transformer, _IndexerCore):
    """Index then one-hot float vector; drop_unseen drops mask/OOV slots.
    Reference: transformers/one_hot_encode.py:129-160,
    user_defined_functions.py:105-139."""

    compatible_dtypes = None

    def __init__(
        self,
        *args,
        labels_array: Sequence[str],
        mask_token: str | None = None,
        num_oov_indices: int = 1,
        drop_unseen: bool = False,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.labels_array = list(labels_array)
        self.mask_token = mask_token
        self.num_oov_indices = int(num_oov_indices)
        self.drop_unseen = drop_unseen
        self._cached_map = None

    def get_params(self):
        p = super().get_params()
        p.pop("_cached_map", None)
        return p

    def _transform_array(self, arr: pa.Array, batch: pa.Table) -> pa.Array:
        levels, flat = A.unwrap(arr)
        idx = self._index_flat(flat).to_numpy(zero_copy_only=False)
        mask_offset = 1 if self.mask_token is not None else 0
        if self.drop_unseen:
            width = len(self.labels_array)
            shifted = idx - (self.num_oov_indices + mask_offset)
            enc = np.zeros((len(idx), width), dtype=np.float32)
            ok = shifted >= 0
            enc[np.arange(len(idx))[ok], shifted[ok]] = 1.0
        else:
            width = len(self.labels_array) + self.num_oov_indices + mask_offset
            enc = np.zeros((len(idx), width), dtype=np.float32)
            enc[np.arange(len(idx)), idx] = 1.0
        inner = pa.ListArray.from_arrays(
            pa.array(np.arange(len(idx) + 1) * width, pa.int32()),
            pa.array(enc.reshape(-1), pa.float32()),
        )
        return A.rewrap(levels, inner)


class SharedOneHotEncodeTransformer(OneHotEncodeTransformer):
    """Shared-vocab one-hot over N cols. Reference: transformers/shared_one_hot_encode.py:148."""

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        for in_col, out_col in zip(self.input_cols, self.output_cols):
            arr = self._cast_in(batch.column(in_col))
            out = self._cast_out(self._transform_array(arr, batch))
            batch = _append_or_replace(batch, out_col, out)
        return batch


class StringIndexEstimator(Estimator):
    """Collect vocab (frequency/alphabetical order, optional cap) ->
    StringIndexTransformer. Reference: estimators/string_index.py:104-136."""

    def __init__(
        self,
        *args,
        string_order_type: str = "frequencyDesc",
        mask_token: str | None = None,
        num_oov_indices: int = 1,
        max_num_labels: int | None = None,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.string_order_type = string_order_type
        self.mask_token = mask_token
        self.num_oov_indices = int(num_oov_indices)
        self.max_num_labels = max_num_labels

    def _collect(self, ds, cols: list[str]) -> list[str]:
        ds = self._maybe_sample(ds)
        counts = agg.value_counts(
            ds, cols, self.mask_token, order=self.string_order_type, top_k=self.max_num_labels
        )
        return agg.ordered_labels(counts, self.string_order_type, self.max_num_labels)

    def _fit_cols(self) -> list[str]:
        return list(self.input_cols) if self.input_cols is not None else [self.input_col]

    def fit_spec(self):
        if self.max_num_labels is not None:
            # capped vocabs fit via the distributed sort+limit path (bounded
            # driver memory for high-cardinality columns) instead of the
            # fused driver-merge (aggregators.MAX_DRIVER_VOCAB guard)
            return None
        return ("vocab", (tuple(self._fit_cols()), self.mask_token))

    def fit_from(self, counts):
        labels = agg.ordered_labels(counts, self.string_order_type, self.max_num_labels)
        return self._build(labels)

    def fit(self, ds):
        return self._build(self._collect(ds, self._fit_cols()))

    def _build(self, labels) -> StringIndexTransformer:
        return StringIndexTransformer(
            input_col=self.input_col,
            output_col=self.output_col,
            input_dtype=self.input_dtype,
            output_dtype=self.output_dtype,
            layer_name=self.layer_name,
            labels_array=labels,
            mask_token=self.mask_token,
            num_oov_indices=self.num_oov_indices,
        )


class SharedStringIndexEstimator(StringIndexEstimator):
    """One vocab over N (flattened) cols. Reference: estimators/shared_string_index.py:105-139."""

    def _build(self, labels) -> SharedStringIndexTransformer:
        return SharedStringIndexTransformer(
            input_cols=self.input_cols,
            output_cols=self.output_cols,
            input_dtype=self.input_dtype,
            output_dtype=self.output_dtype,
            layer_name=self.layer_name,
            labels_array=labels,
            mask_token=self.mask_token,
            num_oov_indices=self.num_oov_indices,
        )


class OneHotEncodeEstimator(StringIndexEstimator):
    """Label collection -> OneHotEncodeTransformer. Reference:
    estimators/one_hot_encode.py."""

    def __init__(self, *args, drop_unseen: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.drop_unseen = drop_unseen

    def _build(self, labels) -> OneHotEncodeTransformer:
        return OneHotEncodeTransformer(
            input_col=self.input_col,
            output_col=self.output_col,
            input_dtype=self.input_dtype,
            output_dtype=self.output_dtype,
            layer_name=self.layer_name,
            labels_array=labels,
            mask_token=self.mask_token,
            num_oov_indices=self.num_oov_indices,
            drop_unseen=self.drop_unseen,
        )


class SharedOneHotEncodeEstimator(StringIndexEstimator):
    """Shared labels -> SharedOneHotEncodeTransformer. Reference:
    estimators/shared_one_hot_encode.py."""

    def __init__(self, *args, drop_unseen: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.drop_unseen = drop_unseen

    def _build(self, labels) -> SharedOneHotEncodeTransformer:
        return SharedOneHotEncodeTransformer(
            input_cols=self.input_cols,
            output_cols=self.output_cols,
            input_dtype=self.input_dtype,
            output_dtype=self.output_dtype,
            layer_name=self.layer_name,
            labels_array=labels,
            mask_token=self.mask_token,
            num_oov_indices=self.num_oov_indices,
            drop_unseen=self.drop_unseen,
        )


class TargetEncodeTransformer(Transformer):
    """Category -> smoothed target mean (classic target/mean encoding):
    ``enc(cat) = (sum_target(cat) + m * prior) / (count(cat) + m)`` with
    ``prior`` the global target mean. Unseen and NULL categories map to
    ``default_value`` (the prior) — SQL LEFT-JOIN + COALESCE semantics.
    The reference has no analog (its indexers stop at ordinal/one-hot);
    this is the standard supervised categorical encoder those feed.

    Lookup is distinct-once (dictionary encode, one ``index_in`` per
    DISTINCT value, gather by indices — lesson-12 discipline)."""

    compatible_dtypes = None

    def __init__(self, *args, categories: Sequence, encodings: Sequence[float],
                 default_value: float, **kwargs):
        super().__init__(*args, **kwargs)
        self.categories = list(categories)
        self.encodings = [float(e) for e in encodings]
        self.default_value = float(default_value)
        self._cached = None

    def get_params(self):
        p = super().get_params()
        p.pop("_cached", None)
        return p

    @property
    def state_size_hint(self) -> int:
        return len(self.categories)

    def _encode_flat(self, flat: pa.Array) -> pa.Array:
        # getattr guard: _load_stages rebuilds via __new__ + params (private
        # caches are popped from get_params and never restored)
        if getattr(self, "_cached", None) is None:
            cats = pa.array(self.categories)
            enc = np.asarray(self.encodings + [self.default_value], np.float64)
            self._cached = (cats, enc)
        cats, enc = self._cached
        d = flat.dictionary_encode()
        dvals = pc.cast(d.dictionary, cats.type, safe=False) if len(cats) \
            else d.dictionary
        pos = pc.index_in(dvals, value_set=cats) if len(cats) else \
            pa.nulls(len(dvals), pa.int32())
        pos = pc.fill_null(pos, len(enc) - 1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        per_distinct = enc[pos] if len(pos) else np.zeros(0, np.float64)
        # null inputs have null indices -> route to the default slot
        idx = pc.fill_null(d.indices, -1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        gathered = np.where(idx >= 0,
                            per_distinct[np.maximum(idx, 0)] if len(pos)
                            else self.default_value,
                            self.default_value)
        return pa.array(gathered, pa.float64())

    def _transform_array(self, arr: pa.Array, batch: pa.Table) -> pa.Array:
        return A.lift(self._encode_flat, arr)


class TargetEncodeEstimator(Estimator):
    """Fit per-category target sums/counts (ONE partial-agg groupby — the
    shuffle carries one row per (block, category)) plus the global prior,
    then build :class:`TargetEncodeTransformer`.

    Driver memory is O(categories) — the bounded-vocabulary contract shared
    with every indexer. Exact cross-engine parity holds for integer targets
    (int64 sums are accumulation-order-free; the smoothing arithmetic is
    then identical float64 on both engines)."""

    def __init__(self, *args, target_col: str, smoothing: float = 0.0,
                 **kwargs):
        super().__init__(*args, **kwargs)
        if smoothing < 0:
            raise ValueError("smoothing must be >= 0")
        self.target_col = target_col
        self.smoothing = float(smoothing)

    def fit(self, ds) -> TargetEncodeTransformer:
        from kamae_ray.stages.aggregate import groupby_agg

        ds = self._maybe_sample(ds)
        col = self.input_col
        if not isinstance(ds, pa.Table):
            from kamae_ray.base import collect_tables
            from kamae_ray.sources.io import narrow_read

            proj = narrow_read(ds, [col, self.target_col]) or ds
            stats = groupby_agg(proj, col, {self.target_col: ["sum", "count"]})
            parts = [t for t in collect_tables(stats) if t.num_rows]
            tbl = pa.concat_tables(parts) if parts else pa.table({
                col: pa.array([], pa.string()),
                f"{self.target_col}_sum": pa.array([], pa.float64()),
                f"{self.target_col}_count": pa.array([], pa.int64()),
            })
        else:
            tbl = groupby_agg(ds.select([col, self.target_col]), col,
                              {self.target_col: ["sum", "count"]})
        sums = pc.cast(tbl.column(f"{self.target_col}_sum"), pa.float64(),
                       safe=False).to_numpy(zero_copy_only=False)
        cnts = pc.cast(tbl.column(f"{self.target_col}_count"), pa.float64(),
                       safe=False).to_numpy(zero_copy_only=False)
        catarr = A.as_array(tbl.column(col))
        keep = pc.is_valid(catarr).to_numpy(zero_copy_only=False)
        total_s = float(sums.sum()) if len(sums) else 0.0
        total_c = float(cnts.sum()) if len(cnts) else 0.0
        prior = (total_s / total_c) if total_c else 0.0
        m = self.smoothing
        with np.errstate(invalid="ignore", divide="ignore"):
            enc = (sums + m * prior) / (cnts + m)
        enc = np.where(np.isfinite(enc), enc, prior)
        cats = catarr.filter(pa.array(keep))
        return TargetEncodeTransformer(
            input_col=self.input_col,
            output_col=self.output_col,
            input_dtype=self.input_dtype,
            output_dtype=self.output_dtype,
            layer_name=self.layer_name,
            categories=cats.to_pylist(),
            encodings=enc[keep].tolist(),
            default_value=prior,
        )


class LooTargetEncodeTransformer(Transformer):
    """LEAVE-ONE-OUT target encoding — the leakage-safe training-time
    variant of :class:`TargetEncodeTransformer`: each row's own target is
    excluded from its category's mean,

        ``enc(row) = (sum_target(cat) - y_row) / (count(cat) - 1)``

    so the feature never reads the row's own label (the same zero-leakage
    contract as the windowed layer). Singleton categories, unseen
    categories and NULLs encode the fitted global prior. Exact for integer
    targets: fitted sums/counts are int64 and the encode is ONE double
    division of exact ints per row. Requires ``target_col`` in the batch
    at transform time (training-time encode by construction)."""

    compatible_dtypes = None

    def __init__(self, *args, target_col: str, categories: Sequence,
                 sums: Sequence[int], counts: Sequence[int],
                 prior: float, **kwargs):
        super().__init__(*args, **kwargs)
        self.target_col = target_col
        self.categories = list(categories)
        self.sums = [int(s) for s in sums]
        self.counts = [int(c) for c in counts]
        self.prior = float(prior)
        self._cached = None

    def get_params(self):
        p = super().get_params()
        p.pop("_cached", None)
        return p

    @property
    def state_size_hint(self) -> int:
        return len(self.categories)

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        # getattr guard: survives the __new__-based _load_stages rebuild
        if getattr(self, "_cached", None) is None:
            self._cached = (
                pa.array(self.categories),
                np.asarray(self.sums + [0], np.int64),
                np.asarray(self.counts + [0], np.int64),
            )
        cats, sums, cnts = self._cached
        flat = A.as_array(batch.column(self.input_col))
        y = pc.cast(A.as_array(batch.column(self.target_col)), pa.int64(), safe=False)
        yv = pc.fill_null(y, 0).to_numpy(zero_copy_only=False)
        y_ok = pc.is_valid(y).to_numpy(zero_copy_only=False)
        d = flat.dictionary_encode()
        dvals = pc.cast(d.dictionary, cats.type, safe=False) if len(cats) else d.dictionary
        pos = pc.index_in(dvals, value_set=cats) if len(cats) else pa.nulls(len(dvals), pa.int32())
        pos = pc.fill_null(pos, len(sums) - 1).to_numpy(zero_copy_only=False).astype(np.int64)
        idx = pc.fill_null(d.indices, -1).to_numpy(zero_copy_only=False).astype(np.int64)
        row_pos = np.where(idx >= 0, pos[np.maximum(idx, 0)] if len(pos) else len(sums) - 1,
                           len(sums) - 1)
        s_r, c_r = sums[row_pos], cnts[row_pos]
        with np.errstate(invalid="ignore", divide="ignore"):
            enc = (s_r - yv).astype(np.float64) / (c_r - 1)
        usable = (c_r > 1) & y_ok
        out = np.where(usable, enc, self.prior)
        return _append_or_replace(batch, self.output_col,
                                  self._cast_out(pa.array(out, pa.float64())))


class LooTargetEncodeEstimator(Estimator):
    """Fit exact int64 per-category target sums/counts (ONE partial-agg
    groupby) plus the global prior, then build
    :class:`LooTargetEncodeTransformer`. Integer 0/1-or-count targets only
    (sums must be order-free exact; validated)."""

    def __init__(self, *args, target_col: str, **kwargs):
        super().__init__(*args, **kwargs)
        self.target_col = target_col

    def fit(self, ds) -> LooTargetEncodeTransformer:
        from kamae_ray.stages.aggregate import groupby_agg

        ds = self._maybe_sample(ds)
        col = self.input_col
        if not isinstance(ds, pa.Table):
            from kamae_ray.base import collect_tables
            from kamae_ray.sources.io import narrow_read

            proj = narrow_read(ds, [col, self.target_col]) or ds
            stats = groupby_agg(proj, col, {self.target_col: ["sum", "count"]})
            parts = [t for t in collect_tables(stats) if t.num_rows]
            tbl = pa.concat_tables(parts) if parts else pa.table({
                col: pa.array([], pa.string()),
                f"{self.target_col}_sum": pa.array([], pa.int64()),
                f"{self.target_col}_count": pa.array([], pa.int64()),
            })
        else:
            tbl = groupby_agg(ds.select([col, self.target_col]), col,
                              {self.target_col: ["sum", "count"]})
        s = pc.cast(tbl.column(f"{self.target_col}_sum"), pa.int64(), safe=False).to_numpy(zero_copy_only=False)
        n = pc.cast(tbl.column(f"{self.target_col}_count"), pa.int64(), safe=False).to_numpy(zero_copy_only=False)
        catarr = A.as_array(tbl.column(col))
        keep = pc.is_valid(catarr).to_numpy(zero_copy_only=False)
        s, n = s[keep], n[keep]
        # canonical order (lesson 18: collect order is completion order)
        cats = catarr.filter(pa.array(keep)).to_pylist()
        order = sorted(range(len(cats)), key=lambda i: str(cats[i]))
        cats = [cats[i] for i in order]
        s, n = s[order] if len(s) else s, n[order] if len(n) else n
        total_s, total_c = int(s.sum()) if len(s) else 0, int(n.sum()) if len(n) else 0
        prior = (total_s / total_c) if total_c else 0.0
        return LooTargetEncodeTransformer(
            input_col=self.input_col,
            output_col=self.output_col,
            input_dtype=self.input_dtype,
            output_dtype=self.output_dtype,
            layer_name=self.layer_name,
            target_col=self.target_col,
            categories=cats,
            sums=s.tolist(),
            counts=n.tolist(),
            prior=prior,
        )


class WoeEncodeEstimator(Estimator):
    """Weight-of-Evidence categorical encoder (the scorecard-standard
    log-odds sibling of :class:`TargetEncodeEstimator`) over a BINARY 0/1
    integer target:

    ``woe(c) = ln( ((pos_c + 1) * (neg_tot + K)) / ((neg_c + 1) * (pos_tot + K)) )``

    with Laplace +1 smoothing and K = number of fitted categories. Counts
    stay exact int64 through the ONE partial-agg groupby (order-free sums),
    the numerator/denominator are exact int64 PRODUCTS (overflow-guarded),
    and the only float ops are one division + one mirrored ``ln`` — the
    chi2/PSI oracle family. Unseen and NULL categories encode 0.0 (no
    evidence). Builds a :class:`TargetEncodeTransformer` (identical lookup
    semantics)."""

    def __init__(self, *args, target_col: str, **kwargs):
        super().__init__(*args, **kwargs)
        self.target_col = target_col

    def fit(self, ds) -> TargetEncodeTransformer:
        from kamae_ray.stages.aggregate import groupby_agg

        ds = self._maybe_sample(ds)
        col = self.input_col
        if not isinstance(ds, pa.Table):
            from kamae_ray.base import collect_tables
            from kamae_ray.sources.io import narrow_read

            proj = narrow_read(ds, [col, self.target_col]) or ds
            stats = groupby_agg(proj, col, {self.target_col: ["sum", "count"]})
            parts = [t for t in collect_tables(stats) if t.num_rows]
            tbl = pa.concat_tables(parts) if parts else pa.table({
                col: pa.array([], pa.string()),
                f"{self.target_col}_sum": pa.array([], pa.int64()),
                f"{self.target_col}_count": pa.array([], pa.int64()),
            })
        else:
            tbl = groupby_agg(ds.select([col, self.target_col]), col,
                              {self.target_col: ["sum", "count"]})
        pos = pc.cast(tbl.column(f"{self.target_col}_sum"), pa.int64(),
                      safe=False).to_numpy(zero_copy_only=False)
        n = pc.cast(tbl.column(f"{self.target_col}_count"), pa.int64(),
                    safe=False).to_numpy(zero_copy_only=False)
        catarr = A.as_array(tbl.column(col))
        keep = pc.is_valid(catarr).to_numpy(zero_copy_only=False)
        pos, n = pos[keep], n[keep]
        if len(pos) and (pos.min() < 0 or (pos > n).any()):
            raise ValueError("WoeEncode target must be a binary 0/1 integer column")
        neg = n - pos
        k = len(pos)
        pos_tot, neg_tot = int(pos.sum()), int(neg.sum())
        num = (pos + 1) * np.int64(neg_tot + k)
        den = (neg + 1) * np.int64(pos_tot + k)
        if len(num) and max(int(num.max()), int(den.max())) >= 2**53:
            raise ValueError(
                "WoeEncode count products exceed exact float64 range (2^53) — "
                "fit on a sample (sample_fraction) for corpora this large"
            )
        # A.libm_log, NOT np.log: numpy's SIMD log differs from libm (and
        # therefore DuckDB's ln) by 1 ULP on ~22% of inputs — a latent
        # 6dp-boundary flip (lesson 24).
        enc = A.libm_log(num.astype(np.float64) / den.astype(np.float64)) if k else np.zeros(0)
        cats = catarr.filter(pa.array(keep))
        return TargetEncodeTransformer(
            input_col=self.input_col,
            output_col=self.output_col,
            input_dtype=self.input_dtype,
            output_dtype=self.output_dtype,
            layer_name=self.layer_name,
            categories=cats.to_pylist(),
            encodings=enc.tolist(),
            default_value=0.0,
        )


class CountEncodeTransformer(Transformer):
    """Category -> its fitted occurrence count (``normalize=True``: its
    frequency share of non-null rows) — count/frequency encoding, the
    unsupervised sibling of :class:`TargetEncodeTransformer`. Unseen and
    NULL categories encode as 0 (SQL LEFT-JOIN + COALESCE semantics)."""

    compatible_dtypes = None

    def __init__(self, *args, categories: Sequence, counts: Sequence[int],
                 normalize: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.categories = list(categories)
        self.counts = [int(c) for c in counts]
        self.normalize = bool(normalize)
        self._cached = None

    def get_params(self):
        p = super().get_params()
        p.pop("_cached", None)
        return p

    @property
    def state_size_hint(self) -> int:
        return len(self.categories)

    def _encode_flat(self, flat: pa.Array) -> pa.Array:
        # getattr guard: _load_stages rebuilds via __new__ + params (private
        # caches are popped from get_params and never restored)
        if getattr(self, "_cached", None) is None:
            cats = pa.array(self.categories)
            total = float(sum(self.counts)) or 1.0
            vals = np.asarray(self.counts + [0], np.float64)
            if self.normalize:
                vals = vals / total
            self._cached = (cats, vals)
        cats, vals = self._cached
        d = flat.dictionary_encode()
        dvals = pc.cast(d.dictionary, cats.type, safe=False) if len(cats) \
            else d.dictionary
        pos = pc.index_in(dvals, value_set=cats) if len(cats) else \
            pa.nulls(len(dvals), pa.int32())
        pos = pc.fill_null(pos, len(vals) - 1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        per_distinct = vals[pos] if len(pos) else np.zeros(0, np.float64)
        idx = pc.fill_null(d.indices, -1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        out = np.where(idx >= 0,
                       per_distinct[np.maximum(idx, 0)] if len(pos) else 0.0,
                       0.0)
        if self.normalize:
            return pa.array(out, pa.float64())
        return pa.array(out.astype(np.int64), pa.int64())

    def _transform_array(self, arr: pa.Array, batch: pa.Table) -> pa.Array:
        return A.lift(self._encode_flat, arr)


class CountEncodeEstimator(Estimator):
    """Fit per-category occurrence counts via the shared vocab machinery
    (``state.aggregators.value_counts`` — per-block partials + one tiny
    groupby; participates in the FUSED fit pass like every indexer) and
    build :class:`CountEncodeTransformer`. Categories are stringified like
    all indexer vocabs; counts are exact int64 on both engines, so even the
    normalized form is a single identical float64 division. Null categories
    carry no count (they encode 0)."""

    def __init__(self, *args, normalize: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.normalize = bool(normalize)

    def fit_spec(self):
        return ("vocab", ((self.input_col,), None))

    def fit_from(self, counts: dict) -> CountEncodeTransformer:
        cats = sorted(counts)
        return CountEncodeTransformer(
            input_col=self.input_col,
            output_col=self.output_col,
            input_dtype=self.input_dtype,
            output_dtype=self.output_dtype,
            layer_name=self.layer_name,
            categories=cats,
            counts=[int(counts[c]) for c in cats],
            normalize=self.normalize,
        )

    def fit(self, ds) -> CountEncodeTransformer:
        ds = self._maybe_sample(ds)
        return self.fit_from(agg.value_counts(ds, [self.input_col]))


class RareLabelTransformer(Transformer):
    """Collapse infrequent categories into one ``rare_label`` token — the
    standard cardinality cap before one-hot / hashing (no reference analog;
    the reference's StringIndex routes rarity to OOV indices instead,
    estimators/string_index.py:104-136). Fitted ``keep`` categories pass
    through, anything else -> ``rare_label``, NULL stays NULL (SQL CASE
    semantics, certified by q_rare_label)."""

    compatible_dtypes = (pa.string(),)

    def __init__(self, *args, keep: Sequence[str], rare_label: str = "__rare__", **kwargs):
        super().__init__(*args, **kwargs)
        self.keep = list(keep)
        self.rare_label = str(rare_label)
        self._keep_set = None

    def get_params(self):
        p = super().get_params()
        p.pop("_keep_set", None)
        return p

    @property
    def state_size_hint(self) -> int:
        return len(self.keep)

    def _transform_array(self, arr: pa.Array, batch: pa.Table) -> pa.Array:
        # getattr guard: survives the __new__-based _load_stages rebuild
        if getattr(self, "_keep_set", None) is None:
            self._keep_set = pa.array(self.keep, pa.string())

        def kernel(flat: pa.Array) -> pa.Array:
            m = pc.is_in(flat, value_set=self._keep_set)
            out = pc.if_else(m, flat, pa.scalar(self.rare_label, pa.string()))
            return pc.if_else(pc.is_valid(flat), out, pa.nulls(len(flat), pa.string()))

        return A.lift(kernel, arr)


class RareLabelEncoderEstimator(Estimator):
    """Fit the frequent-category set — count >= ``min_freq``, optionally
    capped to the top ``max_categories`` by (count DESC, value ASC), the
    repo's documented vocab tie rule — via the shared ``value_counts``
    machinery, and build :class:`RareLabelTransformer`. Uncapped fits join
    the FUSED fit pass; capped fits push sort+limit into the distributed
    plan so the driver only ever sees k rows (high-cardinality safe)."""

    def __init__(self, *args, min_freq: int = 2, max_categories: int | None = None,
                 rare_label: str = "__rare__", **kwargs):
        super().__init__(*args, **kwargs)
        self.min_freq = int(min_freq)
        self.max_categories = int(max_categories) if max_categories is not None else None
        self.rare_label = str(rare_label)

    def fit_spec(self):
        if self.max_categories is not None:
            return None  # capped fit uses the distributed sort+limit path
        return ("vocab", ((self.input_col,), None))

    def fit_from(self, counts: dict) -> RareLabelTransformer:
        keep = sorted(
            (c for c in counts if c is not None and counts[c] >= self.min_freq),
            key=lambda c: (-counts[c], c),
        )
        if self.max_categories is not None:
            keep = keep[: self.max_categories]
        return RareLabelTransformer(
            input_col=self.input_col,
            output_col=self.output_col,
            input_dtype=self.input_dtype,
            output_dtype=self.output_dtype,
            layer_name=self.layer_name,
            keep=sorted(keep),
            rare_label=self.rare_label,
        )

    def fit(self, ds) -> RareLabelTransformer:
        ds = self._maybe_sample(ds)
        counts = agg.value_counts(
            ds, [self.input_col],
            order="frequencyDesc" if self.max_categories is not None else None,
            top_k=self.max_categories,
        )
        return self.fit_from(counts)


def cv_target_encode(ds, key_col: str, target_col: str, id_col: str,
                     n_folds: int = 5, salt: int = 0,
                     output_col: str = "te_cv",
                     max_stats_rows: int = 2_000_000):
    """K-fold cross-fitted target encoding — the leakage-safe batch-training
    sibling of :class:`LooTargetEncodeEstimator` (reference has no CV
    variant; LOO semantics at estimators/target_encode-style lookup): each
    row's encoding is its category's target mean computed over the OTHER
    folds only,

        ``enc = (sum_k - sum_{k,f}) / (n_k - n_{k,f})``

    with the row's fold ``f = ((id + salt) * P mod 2^64) mod n_folds`` — a
    pure hash of the row id (stable across partitions/cluster sizes, and
    mirrored exactly in HUGEINT SQL, the q_negatives construction). Rows
    whose category exists only inside their own fold, NULL and unseen
    categories take the global prior. Integer targets only: category sums
    stay exact int64 (order-free), so the single double division is
    bit-identical cross-engine.

    Scale plan: ONE partial-agg groupby over (key, fold) — the stats table
    is |categories| x n_folds rows (categorical-encoder contract, guarded
    by ``max_stats_rows``) — then a stateless broadcast map that recomputes
    the fold hash and encodes via two flat-array gathers. No row shuffle.

    Output columns: ``(id_col, key_col, "fold", output_col)`` with the
    encoding UNROUNDED float64 (callers round for oracle compare)."""
    from kamae_ray.pipelines.packing import _NS_P
    from kamae_ray.stages.aggregate import groupby_agg

    if n_folds < 2:
        raise ValueError("cv_target_encode needs n_folds >= 2")
    if salt < 0:
        raise ValueError("salt must be non-negative")
    nf = np.uint64(n_folds)

    def _fold(ids: pa.Array) -> np.ndarray:
        iv = pc.cast(ids, pa.int64(), safe=False).to_numpy(zero_copy_only=False)
        if len(iv) and iv.min() < 0:
            raise ValueError("cv_target_encode ids must be non-negative integers")
        h = (iv.astype(np.uint64) + np.uint64(salt)) * np.uint64(_NS_P)
        return (h % nf).astype(np.int64)

    def prep(batch: pa.Table) -> pa.Table:
        y = A.as_array(batch.column(target_col))
        if not pa.types.is_integer(y.type):
            raise ValueError("cv_target_encode target must be an integer column")
        return pa.table({
            key_col: A.as_array(batch.column(key_col)),
            "fold": pa.array(_fold(A.as_array(batch.column(id_col)))),
            target_col: pc.cast(y, pa.int64(), safe=False),
        })

    prep.__name__ = "cv_te_fold_assign"
    if isinstance(ds, pa.Table):
        stats = groupby_agg(prep(ds), [key_col, "fold"],
                            {target_col: ["sum", "count"]})
        parts = [stats] if stats.num_rows else []
    else:
        from kamae_ray.base import collect_tables
        from kamae_ray.sources.io import narrow_read

        proj = narrow_read(ds, [id_col, key_col, target_col]) or ds
        stats = groupby_agg(
            proj.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
            [key_col, "fold"], {target_col: ["sum", "count"]})
        parts = [t for t in collect_tables(stats) if t.num_rows]
    if parts:
        tbl = pa.concat_tables(parts)
    else:
        tbl = pa.table({key_col: pa.array([], pa.string()),
                        "fold": pa.array([], pa.int64()),
                        f"{target_col}_sum": pa.array([], pa.int64()),
                        f"{target_col}_count": pa.array([], pa.int64())})
    if tbl.num_rows > max_stats_rows:
        raise ValueError(
            f"cv_target_encode stats table ({tbl.num_rows} rows) exceeds "
            f"max_stats_rows={max_stats_rows} — this is a categorical "
            "encoder; reduce key cardinality or raise the budget")
    karr = A.as_array(tbl.column(key_col))
    keep = pc.is_valid(karr).to_numpy(zero_copy_only=False)
    s = pc.cast(tbl.column(f"{target_col}_sum"), pa.int64(), safe=False) \
        .to_numpy(zero_copy_only=False)[keep]
    n = pc.cast(tbl.column(f"{target_col}_count"), pa.int64(), safe=False) \
        .to_numpy(zero_copy_only=False)[keep]
    f = pc.cast(tbl.column("fold"), pa.int64(), safe=False) \
        .to_numpy(zero_copy_only=False)[keep]
    kkept = karr.filter(pa.array(keep))
    # int sums are order-free — no canonical reorder needed (lesson 18
    # only bites float partials); categories dedup via dictionary encode
    dk = kkept.dictionary_encode()
    cats = dk.dictionary
    ci = pc.fill_null(dk.indices, 0).to_numpy(zero_copy_only=False).astype(np.int64)
    k = len(cats)
    s_flat = np.zeros(k * n_folds, np.int64)
    c_flat = np.zeros(k * n_folds, np.int64)
    np.add.at(s_flat, ci * n_folds + f, s)
    np.add.at(c_flat, ci * n_folds + f, n)
    ts = s_flat.reshape(k, n_folds).sum(axis=1) if k else np.zeros(0, np.int64)
    tn = c_flat.reshape(k, n_folds).sum(axis=1) if k else np.zeros(0, np.int64)
    tot_s, tot_n = int(ts.sum()), int(tn.sum())
    prior = (tot_s / tot_n) if tot_n else 0.0

    def encode(batch: pa.Table) -> pa.Table:
        ids = A.as_array(batch.column(id_col))
        fold = _fold(ids)
        ka = A.as_array(batch.column(key_col))
        d = ka.dictionary_encode()
        dvals = pc.cast(d.dictionary, cats.type, safe=False) if k else d.dictionary
        pos = pc.index_in(dvals, value_set=cats) if k else \
            pa.nulls(len(dvals), pa.int32())
        pos = pc.fill_null(pos, -1).to_numpy(zero_copy_only=False).astype(np.int64)
        idx = pc.fill_null(d.indices, -1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        rci = np.where(idx >= 0, pos[np.maximum(idx, 0)] if len(pos) else -1, -1)
        safe = np.maximum(rci, 0)
        oof_s = ts[safe] - s_flat[safe * n_folds + fold] if k else np.zeros(len(rci))
        oof_n = tn[safe] - c_flat[safe * n_folds + fold] if k else np.zeros(len(rci))
        known = (rci >= 0) & (oof_n > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            enc = np.where(known, oof_s / np.maximum(oof_n, 1), prior)
        return pa.table({
            id_col: ids,
            key_col: ka,
            "fold": pa.array(fold),
            output_col: pa.array(enc, pa.float64()),
        })

    encode.__name__ = "cv_te_encode"
    if isinstance(ds, pa.Table):
        return encode(ds)
    return ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True)


def cv_target_encode_oracle_sql(table_expr: str, key_col: str, target_col: str,
                                id_col: str, n_folds: int, salt: int,
                                output_col: str = "te_cv") -> str:
    """GENERATED DuckDB oracle for :func:`cv_target_encode` — the same
    (id+salt)*P fold hash in HUGEINT with an explicit mod-2^64 fold
    (non-negative ids by contract), exact BIGINT sums, one mirrored
    double division, ROUND 6dp."""
    from kamae_ray.pipelines.packing import _NS_P

    return (
        f"WITH b AS (SELECT {id_col} AS rid, {key_col} AS kk, "
        f"{target_col} AS y, (((({id_col}::HUGEINT + {salt}) * {_NS_P}) "
        f"% 18446744073709551616) % {n_folds})::BIGINT AS f "
        f"FROM {table_expr}), "
        f"s AS (SELECT kk, f, SUM(y)::BIGINT AS sy, COUNT(*)::BIGINT AS n "
        f"FROM b WHERE kk IS NOT NULL GROUP BY kk, f), "
        f"t AS (SELECT kk, SUM(sy)::BIGINT AS ts, SUM(n)::BIGINT AS tn "
        f"FROM s GROUP BY kk), "
        f"g AS (SELECT CASE WHEN COALESCE(SUM(n), 0) = 0 THEN 0.0 "
        f"ELSE SUM(sy)::DOUBLE / SUM(n) END AS prior FROM s) "
        f"SELECT b.rid AS {id_col}, b.kk AS {key_col}, b.f AS fold, "
        f"ROUND(CASE WHEN t.kk IS NULL OR t.tn - s.n <= 0 THEN g.prior "
        f"ELSE (t.ts - s.sy)::DOUBLE / (t.tn - s.n) END, 6) AS {output_col} "
        f"FROM b LEFT JOIN s ON b.kk = s.kk AND b.f = s.f "
        f"LEFT JOIN t ON b.kk = t.kk CROSS JOIN g"
    )


def woe_iv_table(ds, key_col: str, target_col: str):
    """Per-category Weight-of-Evidence + Information-Value contribution
    table — the scorecard feature-selection report (IV = sum of the per-
    category ``iv`` column; emitted per-category so no cross-row float sum
    ever happens inside the engine). Same Laplace-smoothed construction as
    :class:`WoeEncodeEstimator` (exact int64 counts/products, one mirrored
    ln) plus the smoothed share difference:

        ``iv_c = ((pos_c+1)/(pos_tot+K) - (neg_c+1)/(neg_tot+K)) * woe_c``

    Binary 0/1 integer targets; NULL categories excluded. Output columns:
    key, pos, neg, woe, iv. One partial-agg groupby; the category table is
    vocab-bounded (driver-final like every indexer fit)."""
    from kamae_ray.stages.aggregate import groupby_agg

    if not isinstance(ds, pa.Table):
        from kamae_ray.base import collect_tables
        from kamae_ray.sources.io import narrow_read

        proj = narrow_read(ds, [key_col, target_col]) or ds
        stats = groupby_agg(proj, key_col, {target_col: ["sum", "count"]})
        parts = [t for t in collect_tables(stats) if t.num_rows]
        tbl = pa.concat_tables(parts) if parts else pa.table({
            key_col: pa.array([], pa.string()),
            f"{target_col}_sum": pa.array([], pa.int64()),
            f"{target_col}_count": pa.array([], pa.int64()),
        })
    else:
        tbl = groupby_agg(ds.select([key_col, target_col]), key_col,
                          {target_col: ["sum", "count"]})
    pos = pc.cast(tbl.column(f"{target_col}_sum"), pa.int64(),
                  safe=False).to_numpy(zero_copy_only=False)
    n = pc.cast(tbl.column(f"{target_col}_count"), pa.int64(),
                safe=False).to_numpy(zero_copy_only=False)
    catarr = A.as_array(tbl.column(key_col))
    keep = pc.is_valid(catarr).to_numpy(zero_copy_only=False)
    pos, n = pos[keep], n[keep]
    if len(pos) and (pos.min() < 0 or (pos > n).any()):
        raise ValueError("woe_iv_table target must be a binary 0/1 integer column")
    neg = n - pos
    k = len(pos)
    pt, nt = int(pos.sum()), int(neg.sum())
    num = (pos + 1) * np.int64(nt + k)
    den = (neg + 1) * np.int64(pt + k)
    if k and max(int(num.max()), int(den.max())) >= 2**53:
        raise ValueError("woe_iv_table count products exceed exact float64 "
                         "range (2^53) — fit on a sample")
    woe = A.libm_log(num.astype(np.float64) / den.astype(np.float64)) if k \
        else np.zeros(0)
    sp = (pos + 1).astype(np.float64) / np.float64(pt + k)
    sn = (neg + 1).astype(np.float64) / np.float64(nt + k)
    iv = (sp - sn) * woe
    return pa.table({
        key_col: catarr.filter(pa.array(keep)),
        "pos": pa.array(pos),
        "neg": pa.array(neg),
        "woe": pa.array(woe, pa.float64()),
        "iv": pa.array(iv, pa.float64()),
    })
