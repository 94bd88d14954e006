"""Transformer / Estimator base classes for the Ray-Data-native engine.

Semantics mirror the reference's column-append dataflow contract
(reference: src/kamae/spark/transformers/base.py:39-89 — every transformer
appends output column(s), never mutates inputs) and its explicit
inputDtype/outputDtype casting policy
(reference: src/kamae/spark/params/base.py:36-132,
src/kamae/spark/common/spark_operation.py:246-300), re-expressed as
zero-copy Arrow batch functions suitable for ``ray.data.Dataset.map_batches``.

Design:
- A ``Transformer`` is a picklable parameter bag exposing
  ``transform_batch(pa.Table) -> pa.Table`` (pure, no Ray) plus
  ``transform(ds)`` which applies it via ``map_batches``.
- Batch-level transformers (most ops) are fusible: ``PipelineModel`` composes
  maximal runs of them into ONE ``map_batches`` stage so blocks stream through
  a single Python callable.
- Wide transformers (listwise, window layer) override ``transform`` with
  groupby/sort plans and set ``fusible = False``.
- An ``Estimator`` implements ``fit(ds) -> Transformer`` via bounded-output
  aggregation passes (per-block partials + driver merge), mirroring the
  reference's fit-then-transform lifecycle
  (reference: src/kamae/spark/estimators/base.py:34-91).
"""

from __future__ import annotations

import uuid
from typing import Any, Sequence

import pyarrow as pa

from kamae_ray import dtypes
from kamae_ray.functions import arrays as A


class Stage:
    """Common parameter plumbing for transformers and estimators."""

    #: element dtypes (pyarrow scalar types) this op accepts; None = any
    compatible_dtypes: tuple[pa.DataType, ...] | None = None
    #: heterogeneous-input ops (e.g. DateAdd's numeric days column,
    #: IfStatement's result operands) whitelist only their FIRST input
    validate_first_input_only: bool = False

    def __init__(
        self,
        input_col: str | None = None,
        output_col: str | None = None,
        input_cols: Sequence[str] | None = None,
        output_cols: Sequence[str] | None = None,
        input_dtype: str | None = None,
        output_dtype: str | None = None,
        layer_name: str | None = None,
    ) -> None:
        self.input_col = input_col
        self.output_col = output_col
        self.input_cols = list(input_cols) if input_cols is not None else None
        self.output_cols = list(output_cols) if output_cols is not None else None
        self.input_dtype = input_dtype
        self.output_dtype = output_dtype
        self.layer_name = layer_name or f"{type(self).__name__}_{uuid.uuid4().hex[:12]}"
        if self.output_col is None and self.output_cols is None:
            self.output_col = f"{self.layer_name}__output"

    # ---- dataflow graph wiring (reference: transformers/base.py:102-117) ----
    @property
    def inputs(self) -> list[str]:
        if self.input_cols is not None:
            return list(self.input_cols)
        return [self.input_col] if self.input_col else []

    @property
    def outputs(self) -> list[str]:
        if self.output_cols is not None:
            return list(self.output_cols)
        return [self.output_col] if self.output_col else []

    # ---- dtype casting policy ----
    def _cast_in(self, col: pa.Array | pa.ChunkedArray) -> pa.Array:
        arr = A.as_array(col)
        if self.input_dtype is None:
            return arr
        target = dtypes.arrow_type(self.input_dtype)
        if dtypes.element_type(arr.type).equals(target):
            return arr
        return A.lift(lambda flat: dtypes.cast_flat(flat, target), arr)

    def _cast_out(self, arr: pa.Array) -> pa.Array:
        if self.output_dtype is None:
            return arr
        target = dtypes.arrow_type(self.output_dtype)
        if dtypes.element_type(arr.type).equals(target):
            return arr
        return A.lift(lambda flat: dtypes.cast_flat(flat, target), arr)

    def _elem_compatible(self, elem: pa.DataType) -> bool:
        for ok in self.compatible_dtypes:
            if elem.equals(ok):
                return True
        # accept any numeric when a numeric type is whitelisted
        if any(dtypes.is_numeric(ok) for ok in self.compatible_dtypes) and dtypes.is_numeric(elem):
            return True
        if any(pa.types.is_string(ok) for ok in self.compatible_dtypes) and pa.types.is_large_string(elem):
            return True
        return False

    def _validate_dtype(self, arr: pa.Array) -> None:
        if self.compatible_dtypes is None:
            return
        elem = dtypes.element_type(arr.type)
        if not self._elem_compatible(elem):
            raise TypeError(
                f"{type(self).__name__}({self.layer_name}): element dtype {elem} "
                f"not in compatible dtypes {self.compatible_dtypes}"
            )

    def validate_schema(self, schema) -> None:
        """Driver-side fail-fast (reference: spark_operation.py:59-67,338-373):
        check each input column's element dtype against the op's whitelist
        BEFORE any task launches. ``schema`` is a ray.data Schema or
        pa.Schema; unknown columns (produced mid-pipeline) are skipped."""
        if self.compatible_dtypes is None:
            return
        names = getattr(schema, "names", None)
        types = getattr(schema, "types", None)
        if names is None or types is None:
            return
        by_name = dict(zip(names, types))
        check = self.inputs[:1] if self.validate_first_input_only else self.inputs
        for c in check:
            t = by_name.get(c)
            if t is None or not isinstance(t, pa.DataType):
                continue
            elem = (
                dtypes.arrow_type(self.input_dtype)
                if self.input_dtype is not None
                else dtypes.element_type(t)
            )
            if not self._elem_compatible(elem):
                raise TypeError(
                    f"{type(self).__name__}({self.layer_name}): input column {c!r} "
                    f"element dtype {elem} not in compatible dtypes "
                    f"{self.compatible_dtypes} (checked driver-side before launch)"
                )

    def _validate_ds_schema(self, ds) -> None:
        try:
            schema = ds.schema(fetch_if_missing=False)
        except Exception:
            return
        if schema is not None:
            self.validate_schema(schema)

    def get_params(self) -> dict[str, Any]:
        """JSON-serializable parameter dict (for pipeline persistence)."""
        out = {}
        for k, v in self.__dict__.items():
            if k.startswith("_"):
                continue
            out[k] = v
        return out


def dataset_schema(ds) -> pa.Schema:
    """pa.Schema of a Table or Dataset, metadata-first: Dataset.schema()
    with the default fetch_if_missing runs a limit-1 probe that executes the
    whole upstream chain (actor startups included); this consults inferred
    metadata first and only probes when the schema is genuinely unknowable."""
    if isinstance(ds, pa.Table):
        return ds.schema
    try:
        s = ds.schema(fetch_if_missing=False)
    except TypeError:  # older Ray without the flag
        s = None
    if s is None:
        s = ds.schema()
    return pa.schema(list(zip(s.names, s.types)))


def deterministic_block_sample(ds, fraction: float, seed: int = 42):
    """Fit-time Bernoulli downsample whose kept set is a pure function of
    (block content, seed) — unlike ``Dataset.random_sample``, whose per-TASK
    rng makes the sample depend on how the scheduler groups batches into
    tasks (observed: two executions of the same seeded plan sampling
    different rows). Each block seeds its own Generator from a cheap content
    fingerprint (row count + byte length of each column's buffers), so the
    same logical blocks always sample the same rows, on any cluster layout."""
    import numpy as np

    def sample(batch: pa.Table) -> pa.Table:
        P = np.uint64(1099511628211)
        sig = np.uint64(seed)
        with np.errstate(over="ignore"):
            for col in batch.columns:
                for chunk in col.chunks if isinstance(col, pa.ChunkedArray) else [col]:
                    for buf in chunk.buffers():
                        if buf is None:
                            continue
                        sig = sig * P + np.uint64(buf.size)
                        # head+tail bytes distinguish equal-shaped blocks
                        for bs in (buf.slice(0, min(16, buf.size)),
                                   buf.slice(max(0, buf.size - 16))):
                            sig = sig * P + np.uint64(
                                int.from_bytes(bs.to_pybytes(), "little") & 0xFFFFFFFFFFFFFFFF
                            )
        rng = np.random.default_rng([int(sig), batch.num_rows, seed])
        keep = np.where(rng.random(batch.num_rows) < fraction)[0]
        return batch.take(pa.array(keep))

    sample.__name__ = "deterministic_sample_blocks"
    return ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def _append_or_replace(batch: pa.Table, name: str, arr: pa.Array) -> pa.Table:
    if name in batch.column_names:
        i = batch.column_names.index(name)
        return batch.set_column(i, name, arr)
    return batch.append_column(name, arr)


class Transformer(Stage):
    """Base for batch-fusible transformers.

    Subclasses implement ``_transform_array`` (single-input ops) or override
    ``transform_batch`` (multi-input / multi-output ops). Contract: input
    columns are never mutated; outputs are appended (or replace a same-named
    column, which is how users express in-place renames).
    """

    fusible: bool = True

    @property
    def state_size_hint(self) -> int:
        """Approximate fitted-state cardinality; fused runs whose total hint
        exceeds the pipeline threshold execute as an actor pool (state ships
        once per actor via the object store instead of once per task)."""
        return 0

    # -- single-input convenience path --
    def _transform_array(self, arr: pa.Array, batch: pa.Table) -> pa.Array:
        raise NotImplementedError

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        arr = self._cast_in(batch.column(self.input_col))
        self._validate_dtype(arr)
        out = self._transform_array(arr, batch)
        out = self._cast_out(out)
        return _append_or_replace(batch, self.output_col, out)

    def transform(self, ds):
        """Apply to a ``ray.data.Dataset`` (or a plain ``pa.Table`` for tests)."""
        if isinstance(ds, pa.Table):
            return self.transform_batch(ds)
        self._validate_ds_schema(ds)
        return ds.map_batches(
            _BatchFnWrapper(self),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,  # whole blocks: avoid per-1024-row slice copies
        )

    def construct_layer_info(self) -> dict[str, Any]:
        return {
            "name": self.layer_name,
            "layer": type(self).__name__,
            "inputs": self.inputs,
            "outputs": self.outputs,
        }


class _BatchFnWrapper:
    """Picklable callable wrapping one or more fused transformers."""

    def __init__(self, *transformers: Transformer) -> None:
        self.transformers = transformers

    def __call__(self, batch: pa.Table) -> pa.Table:
        for t in self.transformers:
            batch = t.transform_batch(batch)
        return batch


class _ActorBatchFn:
    """Actor-pool variant: fitted state arrives via fn_constructor_args (one
    object-store read + deserialize per ACTOR, not per batch/task) — the
    canonical stateful-stage placement (SURVEY.md §2.12). Stages can hook
    per-actor warm-up (e.g. building lookup dicts) in ``warm_up``."""

    def __init__(self, transformers) -> None:
        self.transformers = transformers
        for t in transformers:
            warm = getattr(t, "warm_up", None)
            if warm is not None:
                warm()

    def __call__(self, batch: pa.Table) -> pa.Table:
        for t in self.transformers:
            batch = t.transform_batch(batch)
        return batch


class Estimator(Stage):
    """Base estimator: ``fit(ds) -> Transformer`` with state baked in.

    ``sample_fraction`` mirrors the reference's fit-time sampling
    (reference: src/kamae/spark/estimators/base.py:61-64): a deterministic
    per-block downsample applied before aggregation.
    """

    def __init__(self, *args, sample_fraction: float | None = None, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        self.sample_fraction = sample_fraction

    def _maybe_sample(self, ds):
        if self.sample_fraction is None or isinstance(ds, pa.Table):
            return ds
        return deterministic_block_sample(ds, self.sample_fraction, seed=42)

    def fit(self, ds) -> Transformer:
        raise NotImplementedError

    # -- fused-fit protocol (Pipeline groups independent estimators and runs
    # ONE shared aggregation pass per kind instead of one pass each) --
    def fit_spec(self):
        """("moments", (col, mask_value)) | ("vocab", (cols_tuple, mask_token))
        | None (estimator needs its own pass, e.g. exact median)."""
        return None

    def fit_from(self, result) -> Transformer:
        raise NotImplementedError

    def construct_layer_info(self) -> dict[str, Any]:
        return {
            "name": self.layer_name,
            "layer": type(self).__name__,
            "inputs": self.inputs,
            "outputs": self.outputs,
        }


def collect_tables(ds) -> list:
    """Collect a (small) Dataset's blocks as pyarrow Tables WITHOUT the
    hidden extra execution: ``Dataset.to_arrow_refs()`` begins with
    ``schema(fetch_if_missing=True)``, which on any post-map/post-shuffle
    plan EXECUTES the upstream chain once (limit-1 doesn't save an
    all-to-all) before the real run. Materializing first pays exactly one
    execution; the refs then come straight off the materialized blocks."""
    import ray

    mat = ds.materialize()
    return list(ray.get(mat.to_arrow_refs()))
