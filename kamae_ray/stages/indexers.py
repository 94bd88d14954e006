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
