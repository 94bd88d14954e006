"""Portable fitted-pipeline artifact (train/serve parity without Ray).

The reference's core product is a fitted pipeline a SERVING system can apply
(``src/kamae/spark/pipeline/pipeline_model.py:106-129`` exports Keras
models). This engine has no TF dependency, so the portable equivalent is a
self-describing artifact any process with numpy + pyarrow (or an equivalent
kernel library) can apply — no kamae_ray, no Ray:

    <path>/spec.json    versioned op list; array-valued state referenced by
                        key into arrays.npz
    <path>/arrays.npz   numpy arrays (vocab label arrays, mean/std vectors)

Format (spec.json)::

    {"format": "kamae-ray-portable", "version": 1,
     "ops": [{"op": "<name>", "input": ..., "output": ..., ...}, ...]}

Ops are applied IN ORDER, each reading its ``input`` column(s) from the
table-so-far and appending/replacing its ``output`` column(s). v1 op
semantics (exact rules a re-implementation must follow):

- ``log``             out = ln(alpha + x), float64.
- ``abs``             out = |x|, float64.
- ``impute``          x null or == mask_value -> impute_value, float64.
- ``standard_scale``  out = (x - mean[p]) / stddev[p] per innermost array
  position p (scalar columns: p=0); positions beyond the fitted vector clamp
  to the last entry; stddev==0 -> out=0; x == mask_value passes through
  unchanged. ``conditional_standard_scale`` additionally leaves |x| <=
  epsilon as 0 when skip_zeros.
- ``min_max_scale``   out = (x - min[p]) / (max[p]-min[p]); range 0 -> 0;
  mask passthrough as above.
- ``string_index``    start = 1 if mask_token is set else 0; null -> 0;
  value == mask_token -> 0; known label -> labels.index(value) +
  num_oov_indices + start; unknown -> (farmhash64(value) % num_oov_indices)
  + start — when num_oov_indices == 1 this is just ``start`` and no hash
  implementation is needed (the spec carries ``"oov_hash": "farmhash64"``
  only when num_oov_indices > 1). num_oov_indices == 0 + unknown/null is an
  error. int64 output. ``shared_string_index``: same, applied to each
  (input, output) pair.
- ``one_hot``         index as string_index, then a float32 one-hot vector of
  width len(labels) + num_oov_indices + (1 if mask_token else 0); with
  ``drop_unseen`` the mask/OOV slots are dropped (width = len(labels), OOV
  rows all-zero).

``export_portable`` raises with the offending stage list if the model holds
any stage outside this op set (e.g. hash/window/listwise stages — serve them
with the engine itself). ``apply_portable`` is the in-repo reference
interpreter; tests/test_portable_artifact.py additionally pins a
kamae_ray-free re-implementation to the same outputs.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

PORTABLE_FORMAT = "kamae-ray-portable"
PORTABLE_VERSION = 1


def _spec_of(stage, arrays: dict[str, np.ndarray], counter: list[int]):
    """(op dict | None) for one fitted stage; array state goes to ``arrays``."""
    from kamae_ray.stages import elementwise as E
    from kamae_ray.stages import indexers as I
    from kamae_ray.stages import scalers as Sc

    def ref(arr) -> str:
        key = f"a{counter[0]}"
        counter[0] += 1
        arrays[key] = np.asarray(arr)
        return key

    t = type(stage)
    if t is E.LogTransformer:
        return {"op": "log", "input": stage.input_col, "output": stage.output_col,
                "alpha": float(stage.alpha)}
    if t is E.AbsoluteValueTransformer:
        return {"op": "abs", "input": stage.input_col, "output": stage.output_col}
    if t is Sc.ImputeTransformer:
        return {"op": "impute", "input": stage.input_col, "output": stage.output_col,
                "impute_value": float(stage.impute_value), "mask_value": stage.mask_value}
    if t in (Sc.StandardScaleTransformer, Sc.ConditionalStandardScaleTransformer):
        op = {"op": "standard_scale", "input": stage.input_col, "output": stage.output_col,
              "mean": ref(stage.mean), "stddev": ref(stage.stddev),
              "mask_value": stage.mask_value}
        if t is Sc.ConditionalStandardScaleTransformer:
            op.update(op="conditional_standard_scale", skip_zeros=bool(stage.skip_zeros),
                      epsilon=float(stage.epsilon))
        return op
    if t is Sc.MinMaxScaleTransformer:
        return {"op": "min_max_scale", "input": stage.input_col, "output": stage.output_col,
                "min": ref(stage.min), "max": ref(stage.max), "mask_value": stage.mask_value}
    if t in (I.StringIndexTransformer, I.SharedStringIndexTransformer,
             I.OneHotEncodeTransformer, I.SharedOneHotEncodeTransformer):
        shared = t in (I.SharedStringIndexTransformer, I.SharedOneHotEncodeTransformer)
        onehot = t in (I.OneHotEncodeTransformer, I.SharedOneHotEncodeTransformer)
        op = {
            "op": ("one_hot" if onehot else "string_index") + ("_shared" if shared else ""),
            "labels": ref(np.asarray(stage.labels_array, dtype=object)),
            "mask_token": stage.mask_token,
            "num_oov_indices": int(stage.num_oov_indices),
        }
        if shared:
            op["inputs"] = list(stage.input_cols)
            op["outputs"] = list(stage.output_cols)
        else:
            op["input"] = stage.input_col
            op["output"] = stage.output_col
        if stage.num_oov_indices > 1:
            op["oov_hash"] = "farmhash64"
        if onehot:
            op["drop_unseen"] = bool(stage.drop_unseen)
        return op
    return None


def export_portable(model, path: str) -> None:
    """Write the portable artifact for a fitted ``PipelineModel`` (or a list
    of fitted transformers). Raises ``ValueError`` naming every stage that
    has no portable op."""
    stages = model.stages if hasattr(model, "stages") else list(model)
    arrays: dict[str, np.ndarray] = {}
    counter = [0]
    ops, bad = [], []
    for s in stages:
        op = _spec_of(s, arrays, counter)
        if op is None:
            bad.append(type(s).__name__)
        else:
            ops.append(op)
    if bad:
        raise ValueError(
            f"stages without a portable op (serve these with the engine): {bad}"
        )
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "spec.json"), "w") as f:
        json.dump({"format": PORTABLE_FORMAT, "version": PORTABLE_VERSION, "ops": ops}, f, indent=1)
    np.savez(os.path.join(path, "arrays.npz"), **{k: _npz_safe(v) for k, v in arrays.items()})


def _npz_safe(v: np.ndarray) -> np.ndarray:
    return v.astype(str) if v.dtype == object else v


def apply_portable(path: str, table: pa.Table) -> pa.Table:
    """Reference interpreter: apply an exported artifact to a ``pa.Table``
    with numpy + pyarrow only (kamae_ray kernels are NOT used — this is the
    executable documentation of the format)."""
    with open(os.path.join(path, "spec.json")) as f:
        spec = json.load(f)
    if spec.get("format") != PORTABLE_FORMAT or spec.get("version") != PORTABLE_VERSION:
        raise ValueError(f"unsupported artifact: {spec.get('format')} v{spec.get('version')}")
    arrays = dict(np.load(os.path.join(path, "arrays.npz"), allow_pickle=False))

    def set_col(t: pa.Table, name: str, col: pa.Array) -> pa.Table:
        if name in t.column_names:
            return t.set_column(t.column_names.index(name), name, col)
        return t.append_column(name, col)

    def index_col(vals: pa.Array, op) -> np.ndarray:
        labels = arrays[op["labels"]]
        mask_token = op["mask_token"]
        num_oov = op["num_oov_indices"]
        start = 1 if mask_token is not None else 0
        offset = num_oov + start
        lut = {str(l): i + offset for i, l in enumerate(labels)}
        x = vals.to_pylist()
        out = np.zeros(len(x), dtype=np.int64)
        for i, v in enumerate(x):
            if v is None:
                if num_oov == 0:
                    raise ValueError("null label with num_oov_indices=0")
                out[i] = 0
            elif mask_token is not None and v == mask_token:
                out[i] = 0
            elif v in lut:
                out[i] = lut[v]
            elif num_oov == 1:
                out[i] = start
            elif num_oov == 0:
                raise ValueError(f"unknown label {v!r} with num_oov_indices=0")
            else:
                raise NotImplementedError("num_oov_indices>1 needs farmhash64 (see oov_hash)")
        return out

    for op in spec["ops"]:
        kind = op["op"]
        in_type = table.column(op["input"]).type if "input" in op else None
        is_list = in_type is not None and (pa.types.is_list(in_type) or pa.types.is_large_list(in_type))
        if is_list and kind in ("standard_scale", "conditional_standard_scale",
                                "min_max_scale", "log", "abs", "impute"):
            # one list level: apply per innermost position p (clamped to the
            # fitted vector length); same rules as the scalar branch
            col = table.column(op["input"]).combine_chunks()
            if pa.types.is_large_list(col.type):
                col = col.cast(pa.list_(col.type.value_type))
            if col.offset != 0:
                col = pa.concat_arrays([col])
            offs = np.asarray(col.offsets)
            flat = pc.cast(col.values.slice(0, int(offs[-1])), pa.float64(), safe=False)
            nulls = pc.is_null(flat).to_numpy(zero_copy_only=False)
            v = flat.to_numpy(zero_copy_only=False)
            lens = np.diff(offs)
            pos = (np.arange(len(v), dtype=np.int64)
                   - np.repeat(offs[:-1].astype(np.int64), lens)) if len(v) else np.zeros(0, np.int64)
            if kind == "log":
                out = np.log(v + op["alpha"])
            elif kind == "abs":
                out = np.abs(v)
            elif kind == "impute":
                out = np.where(nulls, op["impute_value"], v)
                if op["mask_value"] is not None:
                    out = np.where(out == op["mask_value"], op["impute_value"], out)
            elif kind in ("standard_scale", "conditional_standard_scale"):
                mean, std = arrays[op["mean"]], arrays[op["stddev"]]
                p = np.minimum(pos, len(mean) - 1)
                inv = np.where(std == 0, 0.0, 1.0 / np.where(std == 0, 1.0, std))
                out = (v - mean[p]) * inv[p]
                if op.get("skip_zeros"):
                    out = np.where(np.abs(v) > op["epsilon"], out, 0.0)
                if op["mask_value"] is not None:
                    out = np.where(v == op["mask_value"], v, out)
            else:
                mn, mx = arrays[op["min"]], arrays[op["max"]]
                p = np.minimum(pos, len(mn) - 1)
                rng = mx - mn
                inv = np.where(rng == 0, 0.0, 1.0 / np.where(rng == 0, 1.0, rng))
                out = (v - mn[p]) * inv[p]
                if op["mask_value"] is not None:
                    out = np.where(v == op["mask_value"], v, out)
            flat_out = pa.array(out, pa.float64(), mask=nulls if kind != "impute" else None)
            if col.null_count:
                rebuilt = pa.ListArray.from_arrays(
                    pa.array(offs, pa.int32()), flat_out, mask=pc.invert(col.is_valid())
                )
            else:
                rebuilt = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), flat_out)
            table = set_col(table, op["output"], rebuilt)
            continue
        if kind in ("log", "abs", "impute", "standard_scale",
                    "conditional_standard_scale", "min_max_scale"):
            x = pc.cast(table.column(op["input"]), pa.float64(), safe=False)
            # NaN is a VALUE (flows through arithmetic); only arrow NULLS
            # propagate as nulls (impute fills nulls, never NaN) — matches
            # the engine's pyarrow kernels exactly
            nulls = pc.is_null(x).to_numpy(zero_copy_only=False)
            v = x.to_numpy(zero_copy_only=False)  # nulls arrive as NaN here
            if kind == "log":
                out = np.log(v + op["alpha"])
            elif kind == "abs":
                out = np.abs(v)
            elif kind == "impute":
                out = np.where(nulls, op["impute_value"], v)
                if op["mask_value"] is not None:
                    out = np.where(out == op["mask_value"], op["impute_value"], out)
            elif kind in ("standard_scale", "conditional_standard_scale"):
                mean, std = arrays[op["mean"]], arrays[op["stddev"]]
                inv = np.where(std == 0, 0.0, 1.0 / np.where(std == 0, 1.0, std))
                out = (v - mean[0]) * inv[0]  # scalar column: position 0
                if op.get("skip_zeros"):
                    out = np.where(np.abs(v) > op["epsilon"], out, 0.0)
                if op["mask_value"] is not None:
                    out = np.where(v == op["mask_value"], v, out)
            else:
                mn, mx = arrays[op["min"]], arrays[op["max"]]
                rng = mx - mn
                inv = np.where(rng == 0, 0.0, 1.0 / np.where(rng == 0, 1.0, rng))
                out = (v - mn[0]) * inv[0]
                if op["mask_value"] is not None:
                    out = np.where(v == op["mask_value"], v, out)
            table = set_col(table, op["output"], pa.array(out, pa.float64(), mask=nulls if kind != "impute" else None))
        elif kind in ("string_index", "string_index_shared", "one_hot", "one_hot_shared"):
            pairs = (list(zip(op["inputs"], op["outputs"]))
                     if kind.endswith("_shared") else [(op["input"], op["output"])])
            for in_col, out_col in pairs:
                vals = pc.cast(table.column(in_col), pa.string(), safe=False)
                idx = index_col(vals, op)
                if kind.startswith("one_hot"):
                    labels = arrays[op["labels"]]
                    moff = 1 if op["mask_token"] is not None else 0
                    if op.get("drop_unseen"):
                        width = len(labels)
                        shifted = idx - (op["num_oov_indices"] + moff)
                        enc = np.zeros((len(idx), width), dtype=np.float32)
                        ok = shifted >= 0
                        enc[np.arange(len(idx))[ok], shifted[ok]] = 1.0
                    else:
                        width = len(labels) + op["num_oov_indices"] + moff
                        enc = np.zeros((len(idx), width), dtype=np.float32)
                        enc[np.arange(len(idx)), idx] = 1.0
                    col = pa.ListArray.from_arrays(
                        pa.array(np.arange(len(idx) + 1) * width, pa.int32()),
                        pa.array(enc.reshape(-1), pa.float32()),
                    )
                else:
                    col = pa.array(idx, pa.int64())
                table = set_col(table, out_col, col)
        else:
            raise ValueError(f"unknown op {kind!r}")
    return table


#: class names with a v1 portable op (consumed by discovery.get_capabilities
#: and kept in sync with _spec_of's dispatch by tests/test_portable_artifact.py)
PORTABLE_CLASSES = frozenset({
    "LogTransformer",
    "AbsoluteValueTransformer",
    "ImputeTransformer",
    "StandardScaleTransformer",
    "ConditionalStandardScaleTransformer",
    "MinMaxScaleTransformer",
    "StringIndexTransformer",
    "SharedStringIndexTransformer",
    "OneHotEncodeTransformer",
    "SharedOneHotEncodeTransformer",
})
