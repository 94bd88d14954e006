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

v2 additions (stateless serving ops; all state inline in spec.json):

- ``exp``             out = e^x, float64.
- ``round``           mode ceil | floor | half_away (round-half-away-from-zero
  to integral), float64.
- ``round_to_decimal``  round-half-away-from-zero to ``decimals`` places.
- ``bucketize``       out = bisect_right(splits, x) + 1 (int32); x ==
  mask_value -> 0; null -> null.
- ``bin``             ordered first-match-wins CASE chain: for each
  (condition_operators[i] in eq|neq|lt|leq|gt|geq, bin_values[i]) with
  cond(x, value) true emit bin_labels[i]; valid-but-unmatched ->
  default_label; null -> null. label_kind "number" -> float64 labels, else
  string labels.
- ``string_map``      exact-equality CASE: x == match[i] -> replace[i]; else
  ``default`` if set, else x unchanged; null -> null.
- ``string_case``     upper | lower.
- ``string_affix``    out = prefix + x + suffix.
- ``edit_distance``   two-column string distances (levenshtein / full
  damerau / extended hamming / charset-jaccard ppm / jaro / jaro_winkler);
  the interpreter carries plain-python reference DPs that are bit-identical
  to the engine's vectorized kernels.
- ``soundex``         simplified translate-collapse Soundex codes.
- ``base64_encode`` / ``base64_decode`` / ``hex_encode`` — binary-feature
  serialization (strict RFC 4648 decode; malformed input raises).
- ``bit_hamming``     popcount(xor) of two int64 columns.
- ``string_concat``   join ``inputs`` columns with ``separator``; any null
  input -> null row.
- ``string_replace``  replace all matches of ``pattern`` (RE2 regex when
  ``regex`` else literal substring) with ``replacement``.
- ``substring_delim_at_index``  split by ``delimiter``, take element
  ``index``; fewer than index+1 parts -> ``default_value``; null -> null.
- ``string_isin_list``   x in ``values`` (exact), boolean; XOR ``negation``.
- ``string_contains``    ``constant`` is a substring of x; XOR ``negation``.
- ``string_contains_list``  any of ``values`` is a substring of x; XOR
  ``negation``.

Any op may carry ``cast_input`` / ``cast_output`` dtype names (string bigint
int smallint tinyint float double boolean — plus int64/long/int32/... spelt
aliases); the cast applies to the input before / output after the op, with
the engine's cast policy: -0.0 normalises to +0.0 first, float -> int
TRUNCATES toward zero, bool -> string renders "true"/"false". On list
columns the cast applies to the innermost values.

The v2 reference interpreter applies numeric ops (log abs impute exp round
round_to_decimal standard_scale min_max_scale bucketize) to scalar columns
and one list level; bin and string ops to scalar columns (serve list-nested
string features with the engine itself).

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
PORTABLE_VERSION = 2


def _spec_of(stage, arrays: dict[str, np.ndarray], counter: list[int]):
    """(op dict | None) for one fitted stage; array state goes to ``arrays``."""
    from kamae_ray.stages import elementwise as E
    from kamae_ray.stages import indexers as I
    from kamae_ray.stages import scalers as Sc
    from kamae_ray.stages import strings as St

    def ref(arr) -> str:
        key = f"a{counter[0]}"
        counter[0] += 1
        arrays[key] = np.asarray(arr)
        return key

    def done(op):
        """Attach the stage's explicit dtype casts to the finished op dict."""
        if op is not None:
            if getattr(stage, "input_dtype", None) is not None:
                op["cast_input"] = stage.input_dtype
            if getattr(stage, "output_dtype", None) is not None:
                op["cast_output"] = stage.output_dtype
        return op

    t = type(stage)
    return done(_spec_of_inner(stage, t, E, I, Sc, St, ref))


def _spec_of_vector(stage, t, ref):
    """Vector (list-column) ops: PCA projection and L2 normalization."""
    from kamae_ray.stages import linalg as L
    from kamae_ray.stages import similarity as Si

    if t is L.PCAProjectTransformer:
        return {"op": "pca_project", "input": stage.input_col, "output": stage.output_col,
                "mean": ref(stage.mean), "components": ref(stage.components)}
    if t is Si.L2NormalizeTransformer:
        return {"op": "l2_normalize", "input": stage.input_col, "output": stage.output_col}
    if t is L.LinearScoreTransformer:
        return {"op": "linear_score", "input": stage.input_col, "output": stage.output_col,
                "weights": ref(stage.weights), "bias": int(stage.bias),
                "scale_bits": int(stage.scale_bits)}
    return None


def _spec_of_inner(stage, t, E, I, Sc, St, ref):
    vec = _spec_of_vector(stage, t, ref)
    if vec is not None:
        return vec
    from kamae_ray.stages import array_ops as Ar
    from kamae_ray.stages import hashing as H
    from kamae_ray.stages import listwise as Lw

    if t is Ar.ArrayCropTransformer:
        pv = stage.pad_value
        return {"op": "array_crop", "input": stage.input_col, "output": stage.output_col,
                "length": int(stage.array_length), "pad_value": pv,
                "pad_kind": "string" if isinstance(pv, str) else "number"}
    if t is H.HashIndexTransformer:
        return {"op": "hash_index", "input": stage.input_col, "output": stage.output_col,
                "num_bins": int(stage.num_bins), "mask_value": stage.mask_value,
                "hash": "farmhash64" if stage.hash_fn == "farm" else "poly31"}
    if t is H.FeatureCrossTransformer:
        return {"op": "feature_cross", "inputs": list(stage.input_cols),
                "output": stage.output_col, "num_bins": int(stage.num_bins),
                "hash": "farmhash64" if stage.hash_fn == "farm" else "poly31"}
    if t is I.RareLabelTransformer:
        return {"op": "rare_label", "input": stage.input_col, "output": stage.output_col,
                "keep": ref(np.asarray(stage.keep, dtype=object)),
                "rare_label": stage.rare_label}
    if t is Sc.GroupedImputeTransformer:
        return {"op": "grouped_impute", "input": stage.input_col,
                "group": stage.group_col, "output": stage.output_col,
                "groups": ref(np.asarray([str(g) for g in stage.groups], dtype=object)),
                "values": ref(np.asarray(stage.values, np.float64)),
                "default_value": float(stage.default_value)}
    if t is Sc.GroupedStandardScaleTransformer:
        return {"op": "grouped_standard_scale", "input": stage.input_col,
                "group": stage.group_col, "output": stage.output_col,
                "groups": ref(np.asarray([str(g) for g in stage.groups], dtype=object)),
                "means": ref(np.asarray(stage.means, np.float64)),
                "stds": ref(np.asarray(stage.stds, np.float64)),
                "default_mean": float(stage.default_mean),
                "default_std": float(stage.default_std)}
    if t is Sc.GroupedBucketizeTransformer:
        flat = np.asarray([x for s in stage.splits_per_group for x in s], np.float64)
        offs = np.cumsum([0] + [len(s) for s in stage.splits_per_group]).astype(np.int64)
        return {"op": "grouped_bucketize", "input": stage.input_col,
                "group": stage.group_col, "output": stage.output_col,
                "groups": ref(np.asarray([str(g) for g in stage.groups], dtype=object)),
                "splits_flat": ref(flat), "splits_offsets": ref(offs),
                "default_splits": ref(np.asarray(stage.default_splits, np.float64))}
    if t is Lw.ListRankTransformer or (isinstance(stage, Lw.ListStatTransformer)
                                       and t is not Lw.ListStatTransformer):
        op = {"op": "list_rank" if t is Lw.ListRankTransformer else "list_stat",
              "input": stage.input_col, "output": stage.output_col,
              "query_id": stage.query_id_col, "segment": stage.segment_col,
              "sort_col": stage.sort_col, "sort_order": stage.sort_order,
              "top_n": None if stage.top_n is None else int(stage.top_n),
              "min_filter": None if stage.min_filter_value is None else float(stage.min_filter_value),
              "nan_fill": float(stage.nan_fill_value)}
        if op["op"] == "list_stat":
            op["stat"] = stage.stat
        return op
    if t is E.LogTransformer:
        return {"op": "log", "input": stage.input_col, "output": stage.output_col,
                "alpha": float(stage.alpha)}
    if t is E.AbsoluteValueTransformer:
        return {"op": "abs", "input": stage.input_col, "output": stage.output_col}
    if t is E.ExpTransformer:
        return {"op": "exp", "input": stage.input_col, "output": stage.output_col}
    if t is E.ClipTransformer:
        return {"op": "clip", "input": stage.input_col, "output": stage.output_col,
                "min": None if stage.min_value is None else float(stage.min_value),
                "max": None if stage.max_value is None else float(stage.max_value)}
    if t is E.RoundTransformer:
        return {"op": "round", "input": stage.input_col, "output": stage.output_col,
                "mode": {"round": "half_away"}.get(stage.round_type, stage.round_type)}
    if t is E.RoundToDecimalTransformer:
        return {"op": "round_to_decimal", "input": stage.input_col,
                "output": stage.output_col, "decimals": int(stage.decimals)}
    if t is E.BucketizeTransformer:
        return {"op": "bucketize", "input": stage.input_col, "output": stage.output_col,
                "splits": [float(s) for s in stage.splits],
                "mask_value": None if stage.mask_value is None else float(stage.mask_value)}
    if t is E.BinTransformer:
        numeric = isinstance(stage.default_label, float)
        return {"op": "bin", "input": stage.input_col, "output": stage.output_col,
                "condition_operators": list(stage.condition_operators),
                "bin_values": [float(v) for v in stage.bin_values],
                "bin_labels": list(stage.bin_labels),
                "default_label": stage.default_label,
                "label_kind": "number" if numeric else "string"}
    if t is E.PolynomialExpandTransformer:
        return {"op": "polynomial_expand", "inputs": list(stage.input_cols),
                "output": stage.output_col}
    if t is St.IpToIntTransformer:
        return {"op": "ip_to_int", "input": stage.input_col,
                "output": stage.output_col}
    if t is St.EditDistanceTransformer:
        return {"op": "edit_distance", "inputs": list(stage.input_cols),
                "output": stage.output_col, "mode": stage.mode,
                "max_len": int(stage.max_len)}
    if t is St.SoundexTransformer:
        return {"op": "soundex", "input": stage.input_col,
                "output": stage.output_col}
    if t is St.Base64EncodeTransformer:
        return {"op": "base64_encode", "input": stage.input_col,
                "output": stage.output_col}
    if t is St.Base64DecodeTransformer:
        return {"op": "base64_decode", "input": stage.input_col,
                "output": stage.output_col}
    if t is St.HexEncodeTransformer:
        return {"op": "hex_encode", "input": stage.input_col,
                "output": stage.output_col}
    if t is E.BitHammingTransformer:
        return {"op": "bit_hamming", "inputs": list(stage.input_cols),
                "output": stage.output_col}
    if t is E.StringMapTransformer:
        return {"op": "string_map", "input": stage.input_col, "output": stage.output_col,
                "match": list(stage.string_match_values),
                "replace": list(stage.string_replace_values),
                "default": stage.default_value}
    if t is St.StringCaseTransformer:
        return {"op": "string_case", "input": stage.input_col,
                "output": stage.output_col, "case": stage.string_case_type}
    if t is St.StringAffixTransformer:
        return {"op": "string_affix", "input": stage.input_col,
                "output": stage.output_col, "prefix": stage.prefix, "suffix": stage.suffix}
    if t is St.StringConcatenateTransformer:
        if stage.input_cols is None:
            return None  # column + numeric-constant form: engine-only
        return {"op": "string_concat", "inputs": list(stage.input_cols),
                "output": stage.output_col, "separator": stage.separator}
    if t is St.StringReplaceTransformer:
        if stage.input_cols is not None:
            return None  # per-row pattern/replacement columns: engine-only
        op = {"op": "string_replace", "input": stage.input_col, "output": stage.output_col,
              "pattern": stage.string_match_constant,
              "replacement": stage.string_replace_constant, "regex": bool(stage.regex)}
        if stage.regex:
            op["regex_engine"] = "re2"
        return op
    if t is St.SubStringDelimAtIndexTransformer:
        return {"op": "substring_delim_at_index", "input": stage.input_col,
                "output": stage.output_col, "delimiter": stage.delimiter,
                "index": int(stage.index), "default_value": stage.default_value}
    if t is St.StringIsInListTransformer:
        return {"op": "string_isin_list", "input": stage.input_col, "output": stage.output_col,
                "values": list(stage.string_constant_list), "negation": bool(stage.negation)}
    if t is St.StringContainsListTransformer:
        return {"op": "string_contains_list", "input": stage.input_col, "output": stage.output_col,
                "values": list(stage.string_constant_list), "negation": bool(stage.negation)}
    if t is St.StringContainsTransformer:
        if stage.input_cols is not None:
            return None  # two-column contains: engine-only
        return {"op": "string_contains", "input": stage.input_col, "output": stage.output_col,
                "constant": stage.string_constant, "negation": bool(stage.negation)}
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
    if t is I.TargetEncodeTransformer:
        cats = np.asarray(stage.categories, dtype=object)
        if len(cats) and not all(isinstance(c, (str, int, np.integer))
                                 for c in cats):
            return None  # float categories don't round-trip through str: engine-only
        return {"op": "target_encode", "input": stage.input_col,
                "output": stage.output_col, "categories": ref(cats),
                "encodings": ref(np.asarray(stage.encodings, np.float64)),
                "default_value": float(stage.default_value)}
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


#: user-facing dtype names accepted by cast_input / cast_output
_PORTABLE_TYPES = {
    "string": pa.string(), "bigint": pa.int64(), "int64": pa.int64(),
    "long": pa.int64(), "int": pa.int32(), "int32": pa.int32(),
    "smallint": pa.int16(), "int16": pa.int16(), "tinyint": pa.int8(),
    "int8": pa.int8(), "float": pa.float32(), "float32": pa.float32(),
    "double": pa.float64(), "float64": pa.float64(),
    "boolean": pa.bool_(), "bool": pa.bool_(),
}


def _cast_portable(col, name: str):
    """Engine cast policy with numpy+pyarrow only: -0.0 -> +0.0 first,
    float -> int truncates toward zero, bool -> string is "true"/"false".
    One list level supported (cast applies to the innermost values)."""
    target = _PORTABLE_TYPES[name]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
        values = _cast_portable(col.values, name)
        offs = col.offsets
        if pa.types.is_large_list(col.type):
            offs = pc.cast(offs, pa.int32())
        mask = pc.invert(col.is_valid()) if col.null_count else None
        return pa.ListArray.from_arrays(offs, values, mask=mask)
    if col.type.equals(target):
        return col
    if pa.types.is_floating(col.type):
        zero = pc.equal(col, pa.scalar(0.0))  # normalise -0.0 before casting
        col = pc.if_else(pc.fill_null(zero, False), pa.scalar(0.0, col.type), col)
        if pa.types.is_integer(target):
            return pc.cast(pc.trunc(col), target, safe=False)
    if pa.types.is_boolean(col.type) and pa.types.is_string(target):
        return pc.if_else(col, pa.scalar("true"), pa.scalar("false"))
    return pc.cast(col, target, safe=False)


def apply_portable(path: str, table: pa.Table) -> pa.Table:
    """Reference interpreter: apply an exported artifact to a ``pa.Table``
    with numpy + pyarrow only (kamae_ray engine kernels are NOT used — this
    is the executable documentation of the format). Single carve-out: the
    ``hash_index`` op and the ``num_oov_indices>1`` indexer OOV rule use the
    repo's pure-numpy FarmHash64 module (a PUBLIC algorithm pinned to the
    published test vectors; zero Ray/engine imports), since duplicating a
    hash implementation would be worse documentation than naming it."""
    with open(os.path.join(path, "spec.json")) as f:
        spec = json.load(f)
    if spec.get("format") != PORTABLE_FORMAT or spec.get("version") not in (1, PORTABLE_VERSION):
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
                # oov_hash == farmhash64 (public algorithm; see hash_index
                # note): unknown -> farmhash64(label) % num_oov + start
                from kamae_ray.functions.farmhash import hash64_column

                h, _m = hash64_column(pa.array([v], pa.string()))
                out[i] = int(h[0] % np.uint64(num_oov)) + start
        return out

    _NUMERIC_KINDS = ("log", "abs", "impute", "exp", "round", "round_to_decimal",
                      "bucketize", "standard_scale", "conditional_standard_scale",
                      "min_max_scale", "clip")

    for op in spec["ops"]:
        kind = op["op"]

        def inp(name):
            col = table.column(name)
            return _cast_portable(col, op["cast_input"]) if "cast_input" in op else col

        def emit(t, name, col):
            if "cast_output" in op:
                col = _cast_portable(col, op["cast_output"])
            return set_col(t, name, col)

        in_type = inp(op["input"]).type if "input" in op else None
        is_list = in_type is not None and (pa.types.is_list(in_type) or pa.types.is_large_list(in_type))
        if is_list and kind in _NUMERIC_KINDS:
            # one list level: apply per innermost position p (clamped to the
            # fitted vector length); same rules as the scalar branch
            col = inp(op["input"]).combine_chunks()
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
            out, out_type = _numeric_kernel(kind, op, arrays, v, nulls, pos)
            flat_out = pa.array(out, out_type, mask=nulls if kind != "impute" else None)
            if col.null_count:
                rebuilt = pa.ListArray.from_arrays(
                    pa.array(offs, pa.int32()), flat_out, mask=pc.invert(col.is_valid())
                )
            else:
                rebuilt = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), flat_out)
            table = emit(table, op["output"], rebuilt)
            continue
        if kind in _NUMERIC_KINDS:
            x = pc.cast(inp(op["input"]), pa.float64(), safe=False)
            # NaN is a VALUE (flows through arithmetic); only arrow NULLS
            # propagate as nulls (impute fills nulls, never NaN) — matches
            # the engine's pyarrow kernels exactly
            nulls = pc.is_null(x).to_numpy(zero_copy_only=False)
            v = x.to_numpy(zero_copy_only=False)  # nulls arrive as NaN here
            out, out_type = _numeric_kernel(kind, op, arrays, v, nulls,
                                            np.zeros(len(v), np.int64))
            table = emit(table, op["output"], pa.array(out, out_type, mask=nulls if kind != "impute" else None))
        elif kind == "polynomial_expand":
            # upper-triangle degree-2 products; same promotion rule as the
            # engine transformer (int pairs stay exact int64, mixed -> f64)
            cols = {}
            for c in op["inputs"]:
                col = table.column(c)
                col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                cols[c] = pc.cast(col, pa.int64() if pa.types.is_integer(col.type)
                                  else pa.float64(), safe=False)
            ins = op["inputs"]
            for i, ci in enumerate(ins):
                for cj in ins[i:]:
                    a, b = cols[ci], cols[cj]
                    if pa.types.is_integer(a.type) != pa.types.is_integer(b.type):
                        a = pc.cast(a, pa.float64(), safe=False)
                        b = pc.cast(b, pa.float64(), safe=False)
                    table = emit(table, f"{op['output']}_{ci}_x_{cj}",
                                 pc.multiply_checked(a, b))
        elif kind == "edit_distance":
            # plain-python reference DPs (executable documentation; the
            # engine's vectorized kernels live in functions/editdist)
            a = pc.cast(inp(op["inputs"][0]), pa.string(), safe=False).fill_null("").to_pylist()
            b = pc.cast(inp(op["inputs"][1]), pa.string(), safe=False).fill_null("").to_pylist()
            mode = op["mode"]

            def _lev(x, y):
                xb, yb = x.encode(), y.encode()
                prev = list(range(len(yb) + 1))
                for i, ca in enumerate(xb, 1):
                    cur = [i]
                    for j, cb in enumerate(yb, 1):
                        cur.append(min(prev[j - 1] + (ca != cb), cur[-1] + 1,
                                       prev[j] + 1))
                    prev = cur
                return prev[-1]

            def _dl(x, y):
                xb, yb = x.encode(), y.encode()
                la, lb = len(xb), len(yb)
                inf = la + lb + 1
                d = [[inf] * (lb + 2) for _ in range(la + 2)]
                d[1][1] = 0
                for i in range(1, la + 1):
                    d[i + 1][1] = i
                for j in range(1, lb + 1):
                    d[1][j + 1] = j
                da = {}
                for i in range(1, la + 1):
                    db = 0
                    for j in range(1, lb + 1):
                        k = da.get(yb[j - 1], 0)
                        l = db
                        cost = 0 if xb[i - 1] == yb[j - 1] else 1
                        if cost == 0:
                            db = j
                        d[i + 1][j + 1] = min(
                            d[i][j] + cost, d[i + 1][j] + 1, d[i][j + 1] + 1,
                            d[k][l] + (i - k - 1) + 1 + (j - l - 1))
                    da[xb[i - 1]] = i
                return d[la + 1][lb + 1]

            def _ham(x, y):
                xb, yb = x.encode(), y.encode()
                m = min(len(xb), len(yb))
                return sum(1 for i in range(m) if xb[i] != yb[i]) + abs(len(xb) - len(yb))

            def _cj(x, y):
                sa, sb = set(x.encode()), set(y.encode())
                u = len(sa | sb)
                return 1_000_000 if u == 0 else (1_000_000 * len(sa & sb)) // u

            def _jaro(x, y, winkler):
                xb, yb = x.encode(), y.encode()
                la, lb = len(xb), len(yb)
                if la == 0 or lb == 0:
                    return 0.0
                w = max(max(la, lb) // 2 - 1, 0)
                bm = [False] * lb
                am = [False] * la
                for i in range(la):
                    for j in range(max(0, i - w), min(lb, i + w + 1)):
                        if not bm[j] and xb[i] == yb[j]:
                            am[i] = bm[j] = True
                            break
                m = sum(am)
                if m == 0:
                    return 0.0
                bs = [yb[j] for j in range(lb) if bm[j]]
                k = t2 = 0
                for i in range(la):
                    if am[i]:
                        if xb[i] != bs[k]:
                            t2 += 1
                        k += 1
                v = (m / la + m / lb + (m - t2 // 2) / m) / 3.0
                if winkler and v > 0.7:
                    p = 0
                    for cx, cy in zip(xb, yb):
                        if cx == cy and p < 4:
                            p += 1
                        else:
                            break
                    v = v + p * 0.1 * (1.0 - v)
                return v

            if mode == "levenshtein":
                out = pa.array([_lev(x, y) for x, y in zip(a, b)], pa.int32())
            elif mode == "damerau":
                out = pa.array([_dl(x, y) for x, y in zip(a, b)], pa.int32())
            elif mode == "hamming":
                out = pa.array([_ham(x, y) for x, y in zip(a, b)], pa.int32())
            elif mode == "charset_jaccard":
                out = pa.array([_cj(x, y) for x, y in zip(a, b)], pa.int32())
            else:
                out = pa.array([_jaro(x, y, mode == "jaro_winkler")
                                for x, y in zip(a, b)], pa.float64())
            table = emit(table, op["output"], out)
        elif kind == "soundex":
            import re as _re

            _code = str.maketrans("AEIOUYHWBFPVCGJKQSXZDTLMNR",
                                  "00000000111122222222334556")

            def _sdx(x):
                if x is None:
                    return None
                c = _re.sub("[^A-Za-z]", "", x).upper()
                if not c:
                    return ""
                codes = c.translate(_code)
                dedup = codes[0] + "".join(
                    codes[i] for i in range(1, len(codes))
                    if codes[i] != codes[i - 1])
                digits = dedup[1:].replace("0", "")
                return c[0] + (digits + "000")[:3]

            vals = pc.cast(inp(op["input"]), pa.string(), safe=False).to_pylist()
            table = emit(table, op["output"], pa.array([_sdx(v) for v in vals],
                                                       pa.string()))
        elif kind in ("base64_encode", "hex_encode"):
            import base64 as _b64
            import binascii as _ba

            col = inp(op["input"])
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                vals = [None if v is None else v.encode() for v in col.to_pylist()]
            else:
                vals = col.to_pylist()
            if kind == "base64_encode":
                out = [None if v is None else _b64.b64encode(v).decode() for v in vals]
            else:
                out = [None if v is None else _ba.hexlify(v).decode().upper()
                       for v in vals]
            table = emit(table, op["output"], pa.array(out, pa.string()))
        elif kind == "base64_decode":
            _ALPH = set("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/=")

            def _dec(v):
                if v is None:
                    return None
                if len(v) % 4 != 0 or not set(v) <= _ALPH:
                    raise ValueError("malformed base64")
                body = v.rstrip("=")
                if "=" in body or len(v) - len(body) > 2:
                    raise ValueError("malformed base64 padding")
                import base64 as _b64

                return _b64.b64decode(v)

            vals = pc.cast(inp(op["input"]), pa.string(), safe=False).to_pylist()
            table = emit(table, op["output"], pa.array([_dec(v) for v in vals],
                                                       pa.binary()))
        elif kind == "bit_hamming":
            av = pc.cast(inp(op["inputs"][0]), pa.int64(), safe=False).to_pylist()
            bv = pc.cast(inp(op["inputs"][1]), pa.int64(), safe=False).to_pylist()
            out = [None if (x is None or y is None)
                   else ((x ^ y) & 0xFFFFFFFFFFFFFFFF).bit_count()
                   for x, y in zip(av, bv)]
            table = emit(table, op["output"], pa.array(out, pa.int64()))
        elif kind == "ip_to_int":
            arr = table.column(op["input"])
            arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
            arr = pc.cast(arr, pa.string(), safe=False)
            split = pc.split_pattern(pc.fill_null(arr, ""), pattern=".")
            split = split.combine_chunks() if isinstance(split, pa.ChunkedArray) else split
            lens = pc.list_value_length(split).to_numpy(zero_copy_only=False)
            okm = (lens == 4) & pc.is_valid(arr).to_numpy(zero_copy_only=False)
            flat = pc.list_flatten(split)
            flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
            digits = pc.match_substring_regex(flat, r"^\d{1,3}$") \
                .to_numpy(zero_copy_only=False)
            vals = np.zeros(len(flat), np.int64)
            if digits.any():
                good = flat.filter(pa.array(digits))
                vals[digits] = pc.cast(good, pa.int64()).to_numpy(zero_copy_only=False)
            vals = np.where(digits & (vals <= 255), vals, -1)
            nrows = len(arr)
            mat = np.full((nrows, 4), -1, np.int64)
            rows4 = np.flatnonzero(okm)
            if len(rows4):
                starts = np.cumsum(np.concatenate([[0], lens[:-1]]))
                for j in range(4):
                    mat[rows4, j] = vals[starts[rows4] + j]
            okm = okm & (mat >= 0).all(axis=1)
            ipv = (mat[:, 0] << 24) + (mat[:, 1] << 16) + (mat[:, 2] << 8) + mat[:, 3]
            table = emit(table, op["output"], pa.array(ipv, pa.int64(), mask=~okm))
            table = set_col(table, op["output"] + "_net24",
                            pa.array(ipv >> 8, pa.int64(), mask=~okm))
        elif kind == "bin":
            flat = inp(op["input"]).combine_chunks() if isinstance(inp(op["input"]), pa.ChunkedArray) else inp(op["input"])
            label_type = pa.float64() if op["label_kind"] == "number" else pa.string()
            out = pa.nulls(len(flat), label_type)
            assigned = pa.array(np.zeros(len(flat), dtype=bool))
            cmp = {"eq": pc.equal, "neq": pc.not_equal, "lt": pc.less,
                   "leq": pc.less_equal, "gt": pc.greater, "geq": pc.greater_equal}
            for o, val, label in zip(op["condition_operators"], op["bin_values"], op["bin_labels"]):
                cond = cmp[o](flat, pa.scalar(val))
                cond = pc.and_(pc.fill_null(cond, False), pc.invert(assigned))
                out = pc.if_else(cond, pa.scalar(label, label_type), out)
                assigned = pc.or_(assigned, cond)
            take_default = pc.and_(pc.invert(assigned), pc.is_valid(flat))
            out = pc.if_else(take_default, pa.scalar(op["default_label"], label_type), out)
            table = emit(table, op["output"], out)
        elif kind in ("string_map", "string_case", "string_affix", "string_concat",
                      "string_replace", "substring_delim_at_index",
                      "string_isin_list", "string_contains", "string_contains_list"):
            table = emit(table, op["output"], _string_kernel(kind, op, table, inp))
        elif kind in ("string_index", "string_index_shared", "one_hot", "one_hot_shared"):
            pairs = (list(zip(op["inputs"], op["outputs"]))
                     if kind.endswith("_shared") else [(op["input"], op["output"])])
            for in_col, out_col in pairs:
                vals = pc.cast(inp(in_col), pa.string(), safe=False)
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
                table = emit(table, out_col, col)
        elif kind == "array_crop":
            col = inp(op["input"]).combine_chunks()
            if pa.types.is_large_list(col.type):
                col = col.cast(pa.list_(col.type.value_type))
            if col.offset != 0:
                col = pa.concat_arrays([col])
            offs = np.asarray(col.offsets, dtype=np.int64)
            flat = col.values.slice(0, int(offs[-1]))
            L = int(op["length"])
            keep = np.minimum(np.diff(offs), L)
            n = len(keep)
            new_offsets = np.arange(n + 1, dtype=np.int64) * L
            intra = (np.arange(int(keep.sum()), dtype=np.int64)
                     - np.repeat(np.cumsum(keep) - keep, keep))
            src = np.repeat(offs[:-1], keep) + intra
            dst = np.repeat(new_offsets[:-1], keep) + intra
            if flat.null_count == 0 and not pa.types.is_string(flat.type):
                vals = flat.to_numpy(zero_copy_only=False)
                out_vals = np.full(n * L, op["pad_value"], dtype=vals.dtype)
                out_vals[dst] = vals[src]
                out_flat = pa.array(out_vals, flat.type)
            else:
                py = flat.take(pa.array(src)).to_pylist()
                out_list = [op["pad_value"]] * (n * L)
                for d, vv in zip(dst, py):
                    out_list[int(d)] = vv
                out_flat = pa.array(out_list, flat.type)
            rebuilt = pa.ListArray.from_arrays(
                pa.array(new_offsets, pa.int32()), out_flat,
                mask=pc.invert(col.is_valid()) if col.null_count else None,
            )
            table = emit(table, op["output"], rebuilt)
        elif kind == "hash_index":
            # the ONE algorithmic dependency of the portable runtime beyond
            # numpy+pyarrow: the public FarmHash64 algorithm, as a pure-numpy
            # Ray-free module pinned to the published test vectors
            # (tests/test_farmhash_vectors.py); reimplementors follow the
            # FarmHash spec
            vals = pc.cast(inp(op["input"]), pa.string(), safe=False)
            vals = vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) else vals
            if op.get("hash") == "poly31":
                # self-contained: h = fold(seed 7, (h*31 + codepoint) % (1e9+7))
                null_mask = pc.is_null(vals).to_numpy(zero_copy_only=False)
                hp = np.empty(len(vals), dtype=np.int64)
                for i, v in enumerate(vals.to_pylist()):
                    hv = 7
                    for ch in (v or ""):
                        hv = (hv * 31 + ord(ch)) % 1000000007
                    hp[i] = hv
                out = (hp % np.int64(op["num_bins"] - 1)) + np.int64(1)
            else:
                from kamae_ray.functions.farmhash import hash64_column

                h, null_mask = hash64_column(vals)
                out = ((h % np.uint64(op["num_bins"] - 1)) + np.uint64(1)).astype(np.int64)
            out[null_mask] = 0
            if op["mask_value"] is not None:
                mm = pc.fill_null(pc.equal(vals, op["mask_value"]), False).to_numpy(zero_copy_only=False)
                out[mm] = 0
            table = emit(table, op["output"], pa.array(out, pa.int64()))
        elif kind == "target_encode":
            vals = pc.cast(inp(op["input"]), pa.string(), safe=False)
            vals = vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) else vals
            enc = np.append(arrays[op["encodings"]].astype(np.float64),
                            float(op["default_value"]))
            cats = pa.array(arrays[op["categories"]].astype(str))
            # null / unseen -> the default slot (index_in yields null there)
            pos = pc.fill_null(pc.index_in(vals, value_set=cats),
                               len(enc) - 1).to_numpy(zero_copy_only=False)
            out = enc[pos.astype(np.int64)]
            table = emit(table, op["output"], pa.array(out, pa.float64()))
        elif kind == "feature_cross":
            cols = [pc.cast(inp(c), pa.string(), safe=False) for c in op["inputs"]]
            cols = [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in cols]
            joined = pc.binary_join_element_wise(*cols, pa.scalar("\x1f"))
            null_mask = pc.is_null(joined).to_numpy(zero_copy_only=False)
            if op.get("hash") == "poly31":
                hp = np.empty(len(joined), dtype=np.int64)
                for i, v in enumerate(joined.to_pylist()):
                    hv = 7
                    for ch in (v or ""):
                        hv = (hv * 31 + ord(ch)) % 1000000007
                    hp[i] = hv
                out = (hp % np.int64(op["num_bins"] - 1)) + np.int64(1)
            else:
                from kamae_ray.functions.farmhash import hash64_column

                h, null_mask = hash64_column(joined)
                out = ((h % np.uint64(op["num_bins"] - 1)) + np.uint64(1)).astype(np.int64)
            out[null_mask] = 0
            table = emit(table, op["output"], pa.array(out, pa.int64()))
        elif kind == "rare_label":
            vals = pc.cast(inp(op["input"]), pa.string(), safe=False)
            vals = vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) else vals
            keep = pa.array(arrays[op["keep"]].astype(str))
            m = pc.is_in(vals, value_set=keep)
            out = pc.if_else(m, vals, pa.scalar(op["rare_label"], pa.string()))
            out = pc.if_else(pc.is_valid(vals), out, pa.nulls(len(vals), pa.string()))
            table = emit(table, op["output"], out)
        elif kind == "grouped_impute":
            x = pc.cast(inp(op["input"]), pa.float64(), safe=False)
            x = x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x
            g = pc.cast(inp(op["group"]), pa.string(), safe=False)
            g = g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g
            gk = pa.array(arrays[op["groups"]].astype(str))
            fillv = np.append(arrays[op["values"]].astype(np.float64),
                              float(op["default_value"]))
            pos = pc.fill_null(pc.index_in(g, value_set=gk),
                               len(fillv) - 1).to_numpy(zero_copy_only=False)
            fill = fillv[pos.astype(np.int64)]
            out = pc.if_else(pc.is_valid(x), x, pa.array(fill, pa.float64()))
            table = emit(table, op["output"], out)
        elif kind == "grouped_standard_scale":
            x = pc.cast(inp(op["input"]), pa.float64(), safe=False)
            x = x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x
            g = pc.cast(inp(op["group"]), pa.string(), safe=False)
            g = g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g
            gk = pa.array(arrays[op["groups"]].astype(str))
            means = np.append(arrays[op["means"]].astype(np.float64),
                              float(op["default_mean"]))
            stds = np.append(arrays[op["stds"]].astype(np.float64),
                             float(op["default_std"]))
            pos = pc.fill_null(pc.index_in(g, value_set=gk),
                               len(means) - 1).to_numpy(
                zero_copy_only=False).astype(np.int64)
            xv = x.to_numpy(zero_copy_only=False)
            nulls = pc.is_null(x).to_numpy(zero_copy_only=False)
            m, s = means[pos], stds[pos]
            with np.errstate(invalid="ignore", divide="ignore"):
                out = np.where(s == 0, 0.0,
                               (np.where(nulls, 0.0, xv) - m)
                               / np.where(s == 0, 1.0, s))
            table = emit(table, op["output"],
                         pa.array(out, pa.float64(), mask=nulls))
        elif kind == "grouped_bucketize":
            x = pc.cast(inp(op["input"]), pa.float64(), safe=False)
            x = x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x
            vals_np = x.to_numpy(zero_copy_only=False)
            nulls = pc.is_null(x).to_numpy(zero_copy_only=False)
            g = pc.cast(inp(op["group"]), pa.string(), safe=False)
            g = g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g
            gk = pa.array(arrays[op["groups"]].astype(str))
            flat = arrays[op["splits_flat"]].astype(np.float64)
            offs = arrays[op["splits_offsets"]].astype(np.int64)
            dflt = arrays[op["default_splits"]].astype(np.float64)
            n_g = len(gk)
            pos = pc.fill_null(pc.index_in(g, value_set=gk),
                               n_g).to_numpy(zero_copy_only=False).astype(np.int64)
            out = np.zeros(len(vals_np), np.int64)
            safe = np.where(nulls, 0.0, vals_np)
            for gi in np.unique(pos):
                m = pos == gi
                sp = flat[offs[gi]:offs[gi + 1]] if gi < n_g else dflt
                out[m] = np.searchsorted(sp, safe[m], side="right") + 1
            table = emit(table, op["output"],
                         pa.array(out.astype(np.int32), mask=nulls))
        elif kind in ("list_stat", "list_rank"):
            table = emit(table, op["output"], _listwise_kernel(kind, op, table, inp))
        elif kind in ("pca_project", "l2_normalize", "linear_score"):
            col = inp(op["input"])
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            if pa.types.is_large_list(col.type):
                col = col.cast(pa.list_(col.type.value_type))
            if col.offset != 0:
                col = pa.concat_arrays([col])
            offs = np.asarray(col.offsets)
            flat = pc.cast(col.values.slice(0, int(offs[-1])), pa.float64(), safe=False)
            v = flat.to_numpy(zero_copy_only=False)
            if kind == "linear_score":
                w = arrays[op["weights"]].astype(np.int64)
                d = w.shape[0]
                m = v.reshape(-1, d)
                xq = np.floor(m * float(1 << int(op["scale_bits"]))).astype(np.int64)
                out = pa.array(xq @ w + np.int64(op["bias"]), pa.int64())
            elif kind == "pca_project":
                mean = arrays[op["mean"]]
                comps = arrays[op["components"]]
                d = mean.shape[0]
                m = v.reshape(-1, d)  # raises if widths vary - fitted width required
                proj = (m - mean) @ comps.T
                k = proj.shape[1]
                out = pa.ListArray.from_arrays(
                    pa.array(np.arange(len(m) + 1, dtype=np.int64) * k, pa.int32()),
                    pa.array(proj.reshape(-1), pa.float64()),
                )
            else:
                lens = np.diff(offs)
                sq = v * v
                norms = np.sqrt(np.add.reduceat(sq, offs[:-1].clip(max=max(len(v) - 1, 0)))) if len(v) else np.zeros(0)
                per_row = np.repeat(np.where(norms == 0, 1.0, norms), lens)
                out = pa.ListArray.from_arrays(
                    pa.array(offs, pa.int32()), pa.array(v / per_row, pa.float64())
                )
            table = emit(table, op["output"], out)
        else:
            raise ValueError(f"unknown op {kind!r}")
    return table


def _listwise_kernel(kind, op, table: pa.Table, inp) -> pa.Array:
    """Listwise stats / rank over (query_id[, segment]) groups — an
    INDEPENDENT numpy implementation of the engine's segment kernels (it
    deliberately does not import kamae_ray.functions.segments, so the
    portable tests double as a cross-implementation check). Group semantics
    require the table to contain WHOLE groups — the same contract as the
    engine's transform_batch."""
    n = table.num_rows
    if n == 0:
        return pa.array([], pa.int64() if kind == "list_rank" else pa.float64())

    def codes(name):
        col = table.column(name)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        d = col.dictionary_encode()
        return pc.fill_null(d.indices, -1).to_numpy(zero_copy_only=False).astype(np.int64)

    gid_cols = [codes(op["query_id"])]
    if op.get("segment") is not None:
        gid_cols.append(codes(op["segment"]))
    if len(gid_cols) == 1:
        combined = gid_cols[0]
    else:
        combined = gid_cols[0] * (gid_cols[1].max() + 2) + gid_cols[1]
    _, gids = np.unique(combined, return_inverse=True)

    def fvals(name):
        x = pc.cast(inp(name), pa.float64(), safe=False)
        x = x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x
        v = x.to_numpy(zero_copy_only=False).astype(np.float64, copy=True)
        nulls = pc.is_null(x).to_numpy(zero_copy_only=False)
        v[nulls] = np.nan
        return v

    order = np.argsort(gids, kind="stable")
    gs = gids[order]
    starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])
    lens = np.diff(np.r_[starts, len(gs)])
    vals = fvals(op["input"])[order]
    desc = op["sort_order"] == "desc"

    def rank_within(order_vals):
        key = -order_vals if desc else order_vals
        o2 = np.lexsort((key, gs))
        rk = np.empty(n, dtype=np.int64)
        rk[o2] = np.arange(n) - np.repeat(starts, lens) + 1
        return rk

    if kind == "list_rank":
        rk = rank_within(vals)
        out = np.empty(n, dtype=np.int64)
        out[order] = rk
        return pa.array(out, pa.int64())

    cond = ~np.isnan(vals)
    if op.get("sort_col") is not None:
        cond &= rank_within(fvals(op["sort_col"])[order]) <= int(op["top_n"])
    if op.get("min_filter") is not None:
        cond &= vals >= op["min_filter"]
    stat, nan_fill = op["stat"], op["nan_fill"]
    cnt = np.add.reduceat(cond.astype(np.float64), starts)
    s = np.add.reduceat(np.where(cond, vals, 0.0), starts)
    with np.errstate(invalid="ignore", divide="ignore"):
        if stat == "mean":
            seg = np.where(cnt > 0, s / np.where(cnt == 0, 1, cnt), np.nan)
        elif stat in ("min", "max"):
            pad = np.inf if stat == "min" else -np.inf
            red = (np.minimum if stat == "min" else np.maximum).reduceat(
                np.where(cond, vals, pad), starts)
            seg = np.where(cnt > 0, red, np.nan)
        elif stat == "stddev":
            mean = np.where(cnt > 0, s / np.where(cnt == 0, 1, cnt), np.nan)
            dev2 = np.where(cond, (vals - np.repeat(mean, lens)) ** 2, 0.0)
            ss = np.add.reduceat(dev2, starts)
            seg = np.where(cnt > 1, np.sqrt(ss / np.clip(cnt - 1, 1, None)), np.nan)
        elif stat == "median":
            masked = np.where(cond, vals, np.inf)
            o2 = np.lexsort((masked, gs))
            sv = masked[o2]
            k = cnt.astype(np.int64)
            lo = starts + np.maximum((k - 1) // 2, 0)
            hi = starts + np.maximum(k // 2, 0)
            med = (sv[np.clip(lo, 0, n - 1)] + sv[np.clip(hi, 0, n - 1)]) / 2.0
            seg = np.where(k > 0, med, np.nan)
        else:
            raise ValueError(f"unknown list stat {stat!r}")
    seg = np.where(np.isnan(seg), nan_fill, seg)
    out = np.empty(n)
    out[order] = np.repeat(seg, lens)
    return pa.array(out, pa.float64())


def _numeric_kernel(kind, op, arrays, v, nulls, pos):
    """Shared scalar/list numeric computation: (out ndarray, output pa type).
    ``pos`` is the innermost array position per element (all-zero for scalar
    columns); fitted vectors clamp to their last entry beyond it."""
    if kind == "log":
        # pc.ln, not np.log: numpy's SIMD log differs from the engine's
        # arrow kernel by 1 ULP on ~22% of inputs (same class as exp below)
        import pyarrow.compute as _pc

        return _pc.ln(pa.array(v + op["alpha"])).to_numpy(zero_copy_only=False), pa.float64()
    if kind == "abs":
        return np.abs(v), pa.float64()
    if kind == "exp":
        # pc.exp, not np.exp: the two differ by 1 ULP on some inputs and the
        # engine's kernel is the arrow one
        return pc.exp(pa.array(v)).to_numpy(zero_copy_only=False), pa.float64()
    if kind == "round":
        if op["mode"] == "ceil":
            return np.ceil(v), pa.float64()
        if op["mode"] == "floor":
            return np.floor(v), pa.float64()
        return pc.round(pa.array(v), ndigits=0,
                        round_mode="half_towards_infinity").to_numpy(zero_copy_only=False), pa.float64()
    if kind == "round_to_decimal":
        return pc.round(pa.array(v), ndigits=op["decimals"],
                        round_mode="half_towards_infinity").to_numpy(zero_copy_only=False), pa.float64()
    if kind == "clip":
        # arrow kernels, not np.clip: arrow's element-wise max/min prefer a
        # VALID value over NaN (engine parity); nulls are re-masked by caller
        x = pa.array(v)
        opts = pc.ElementWiseAggregateOptions(skip_nulls=False)
        if op["min"] is not None:
            x = pc.max_element_wise(x, pa.scalar(float(op["min"])), options=opts)
        if op["max"] is not None:
            x = pc.min_element_wise(x, pa.scalar(float(op["max"])), options=opts)
        return x.to_numpy(zero_copy_only=False), pa.float64()
    if kind == "bucketize":
        idx = np.searchsorted(np.asarray(op["splits"], dtype=np.float64), v, side="right") + 1
        if op["mask_value"] is not None:
            idx = np.where(v == op["mask_value"], 0, idx)
        return idx.astype(np.int32), pa.int32()
    if kind == "impute":
        out = np.where(nulls, op["impute_value"], v)
        if op["mask_value"] is not None:
            out = np.where(out == op["mask_value"], op["impute_value"], out)
        return out, pa.float64()
    if kind in ("standard_scale", "conditional_standard_scale"):
        mean, std = arrays[op["mean"]], arrays[op["stddev"]]
        p = np.minimum(pos, len(mean) - 1)
        inv = np.where(std == 0, 0.0, 1.0 / np.where(std == 0, 1.0, std))
        out = (v - mean[p]) * inv[p]
        if op.get("skip_zeros"):
            out = np.where(np.abs(v) > op["epsilon"], out, 0.0)
        if op["mask_value"] is not None:
            out = np.where(v == op["mask_value"], v, out)
        return out, pa.float64()
    mn, mx = arrays[op["min"]], arrays[op["max"]]
    p = np.minimum(pos, len(mn) - 1)
    rng = mx - mn
    inv = np.where(rng == 0, 0.0, 1.0 / np.where(rng == 0, 1.0, rng))
    out = (v - mn[p]) * inv[p]
    if op["mask_value"] is not None:
        out = np.where(v == op["mask_value"], v, out)
    return out, pa.float64()


def _string_kernel(kind, op, table, inp):
    """v2 stateless string ops on scalar string columns (pyarrow kernels;
    identical call sequence to the engine's stages/strings.py)."""

    def flat(name):
        col = inp(name)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            raise ValueError(f"v2 interpreter: op {kind!r} supports scalar columns only")
        return col

    if kind == "string_map":
        x = flat(op["input"])
        if op["default"] is not None:
            out = pc.if_else(pc.is_valid(x),
                             pa.array([op["default"]] * len(x), pa.string()),
                             pa.nulls(len(x), pa.string()))
        else:
            out = x
        for match, repl in zip(op["match"], op["replace"]):
            out = pc.if_else(pc.equal(x, pa.scalar(match)), pa.scalar(repl), out)
        return out
    if kind == "string_case":
        x = flat(op["input"])
        return pc.utf8_upper(x) if op["case"] == "upper" else pc.utf8_lower(x)
    if kind == "string_affix":
        out = flat(op["input"])
        if op["prefix"]:
            out = pc.binary_join_element_wise(pa.scalar(op["prefix"]), out, pa.scalar(""))
        if op["suffix"]:
            out = pc.binary_join_element_wise(out, pa.scalar(op["suffix"]), pa.scalar(""))
        return out
    if kind == "string_concat":
        return pc.binary_join_element_wise(*[flat(c) for c in op["inputs"]],
                                           pa.scalar(op["separator"]))
    if kind == "string_replace":
        x = flat(op["input"])
        fn = pc.replace_substring_regex if op["regex"] else pc.replace_substring
        return fn(x, pattern=op["pattern"], replacement=op["replacement"])
    if kind == "substring_delim_at_index":
        x = flat(op["input"])
        split = pc.split_pattern(x, pattern=op["delimiter"])
        ok = pc.greater(pc.list_value_length(split), op["index"])
        joined = pc.binary_join(pc.list_slice(split, op["index"], op["index"] + 1), pa.scalar(""))
        out = pc.if_else(ok, joined, pa.scalar(op["default_value"]))
        return pc.if_else(pc.is_valid(x), out, pa.nulls(len(x), pa.string()))
    if kind == "string_isin_list":
        out = pc.is_in(flat(op["input"]), value_set=pa.array(op["values"], pa.string()))
        return pc.invert(out) if op["negation"] else out
    if kind == "string_contains":
        out = pc.match_substring(flat(op["input"]), op["constant"])
        return pc.invert(out) if op["negation"] else out
    # string_contains_list: any-of substrings via one alternation regex
    import re as _re

    pat = "|".join(_re.escape(s) for s in op["values"])
    out = pc.match_substring_regex(flat(op["input"]), pat)
    return pc.invert(out) if op["negation"] else out


#: class names with a portable op (consumed by discovery.get_capabilities
#: and kept in sync with _spec_of's dispatch by tests/test_portable_artifact.py).
#: StringConcatenate/StringReplace/StringContains are portable only in their
#: constant forms — the per-row-pattern column forms export as None and raise.
PORTABLE_CLASSES = frozenset({
    "TargetEncodeTransformer",
    "FeatureCrossTransformer",
    "RareLabelTransformer",
    "GroupedImputeTransformer",
    "GroupedStandardScaleTransformer",
    "GroupedBucketizeTransformer",
    "LogTransformer",
    "AbsoluteValueTransformer",
    "ExpTransformer",
    "RoundTransformer",
    "RoundToDecimalTransformer",
    "BucketizeTransformer",
    "BinTransformer",
    "ClipTransformer",
    "StringMapTransformer",
    "ImputeTransformer",
    "StandardScaleTransformer",
    "ConditionalStandardScaleTransformer",
    "MinMaxScaleTransformer",
    "StringIndexTransformer",
    "SharedStringIndexTransformer",
    "OneHotEncodeTransformer",
    "SharedOneHotEncodeTransformer",
    "StringCaseTransformer",
    "StringAffixTransformer",
    "StringConcatenateTransformer",
    "StringReplaceTransformer",
    "SubStringDelimAtIndexTransformer",
    "StringIsInListTransformer",
    "StringContainsTransformer",
    "StringContainsListTransformer",
    "PCAProjectTransformer",
    "L2NormalizeTransformer",
    "LinearScoreTransformer",
    "ArrayCropTransformer",
    "HashIndexTransformer",
    "ListMaxTransformer",
    "ListMinTransformer",
    "ListMeanTransformer",
    "ListMedianTransformer",
    "ListStdDevTransformer",
    "ListRankTransformer",
})
