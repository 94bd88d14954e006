"""Stateless hash / encode transformers, §2.7 of SURVEY.md.

Reference semantics: src/kamae/spark/transformers/{hash_index,min_hash_index,
bloom_encode}.py with the exact null/mask rules of
src/kamae/spark/utils/user_defined_functions.py:22-43,164-202.

FarmHash64 is computed by the vectorized numpy implementation
(functions/farmhash.hash64_column — exact parity with the scalar path,
pinned by tests/test_farmhash_vectors.py); per-permutation label hashes are
one vectorized pass per permutation over the batch's DISTINCT labels. These
stages are marked for actor-pool execution in pipelines (stateful setup once
per actor, reference design SURVEY.md §2.7).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kamae_ray.base import Transformer, _append_or_replace
from kamae_ray.functions import arrays as A
from kamae_ray.functions.farmhash import cached_hash64, safe_hash64

_INT32_MAX = np.iinfo(np.int32).max

# SQL-expressible polynomial codepoint hash (hash_fn="poly") — the same
# generated-oracle move as the mod-prime MinHash/SimHash modes: the engine
# and the DuckDB oracle share these constants, so hash-derived outputs are
# exactly certifiable. Default stays FarmHash64 (pinned to published vectors
# in tests/test_farmhash_vectors.py).
POLY_P = 1_000_000_007
POLY_MULT = 31
POLY_SEED = 7


def poly31_scalar(s: str) -> int:
    h = POLY_SEED
    for ch in s:
        h = (h * POLY_MULT + ord(ch)) % POLY_P
    return h


def poly31_column(arr) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized codepoint-polynomial hash of a string array:
    ``h = fold(seed=7, (h*31 + codepoint) % (1e9+7))``. Returns
    ``(int64 hashes, null mask)``; nulls hash to the seed (callers map them).

    ASCII rows (bytes == codepoints) vectorize straight off the Arrow UTF-8
    buffers — one fused numpy pass per byte position up to the max row
    length, so this targets short categorical keys; rows containing
    non-ASCII bytes are recomputed per DISTINCT value (lesson-12
    distinct-once discipline)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    null_mask = pc.is_null(arr).to_numpy(zero_copy_only=False)
    filled = pc.fill_null(arr, "")
    if isinstance(filled, pa.ChunkedArray):
        filled = filled.combine_chunks()
    n = len(filled)
    if n == 0:
        return np.zeros(0, np.int64), null_mask
    bufs = filled.buffers()
    width = np.int64 if pa.types.is_large_string(filled.type) else np.int32
    offsets = np.frombuffer(bufs[1], dtype=width)[filled.offset : filled.offset + n + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.zeros(0, np.uint8)
    lens = offsets[1:] - offsets[:-1]
    starts = offsets[:-1]
    h = np.full(n, POLY_SEED, dtype=np.int64)
    L = int(lens.max()) if n else 0
    for j in range(L):
        active = lens > j
        if not active.any():
            break
        idx = np.where(active, starts + j, 0)
        c = data[idx].astype(np.int64) if len(data) else np.zeros(n, np.int64)
        h = np.where(active, (h * POLY_MULT + c) % POLY_P, h)
    if len(data):
        non_ascii_cum = np.concatenate([[0], np.cumsum((data >= 128).astype(np.int64))])
        bad = np.flatnonzero((non_ascii_cum[offsets[1:]] - non_ascii_cum[offsets[:-1]]) > 0)
        if len(bad):
            vals = filled.take(pa.array(bad)).to_pylist()
            memo: dict[str, int] = {}
            for r, v in zip(bad, vals):
                hv = memo.get(v)
                if hv is None:
                    hv = memo[v] = poly31_scalar(v)
                h[r] = hv
    return h, null_mask


def hash_encode_oracle_sql() -> str:
    """GENERATED DuckDB oracle for the q_hash_encode pipeline (HashIndex +
    BloomEncode + StringToStringList + MinHashIndex, all in hash_fn="poly"
    mode over orders.o_orderpriority) — built from the same shared constants
    as the engine kernels, so the whole encoder stack is hash-certified."""
    i32m = _INT32_MAX - 1  # 2147483646
    perms = ", ".join(str(p) for p in range(8))
    return (
        "WITH b AS (SELECT o_orderkey, o_orderpriority AS s FROM orders), "
        "p AS (SELECT o_orderkey, s, "
        "[coalesce(string_split(s, '-')[1], 'PAD'), "
        "coalesce(string_split(s, '-')[2], 'PAD')] AS ws FROM b) "
        "SELECT o_orderkey, "
        f"CASE WHEN s IS NULL THEN 0 ELSE ({poly31_sql('s')} % 63) + 1 END AS prio_hash, "
        "CASE WHEN s IS NULL THEN [0, 0, 0]::BIGINT[] ELSE list_transform([0, 1, 2], i -> "
        f"({poly31_sql('s || i::VARCHAR')} % 127) + 1) END AS prio_bloom, "
        f"CASE WHEN s IS NULL THEN NULL ELSE list_transform([{perms}], pp -> "
        "list_min(list_transform(ws, w -> "
        f"({poly31_sql('w || pp::VARCHAR')} % {i32m}) + 1)) % 2) END AS prio_minhash "
        "FROM p"
    )


def poly31_sql(expr: str) -> str:
    """DuckDB expression reproducing ``poly31_column`` over the VARCHAR SQL
    expression ``expr`` exactly (unicode() is -1 for the empty-string
    artifact string_split_regex emits on '' — filtered out)."""
    return (
        f"list_reduce(list_prepend(CAST({POLY_SEED} AS BIGINT), "
        f"list_filter(list_transform(string_split_regex({expr}, ''), "
        f"c -> CAST(unicode(c) AS BIGINT)), x -> x >= 0)), "
        f"(a, c) -> (a * {POLY_MULT} + c) % {POLY_P})"
    )


def _hash_distinct(flat: pa.Array, fn) -> pa.Array:
    """Dictionary-encode then hash each distinct value once."""
    d = flat.dictionary_encode()
    dict_vals = d.dictionary.to_pylist()
    mapped = np.array([fn(v) for v in dict_vals], dtype=np.int64) if dict_vals else np.array([], np.int64)
    indices = pc.fill_null(d.indices, 0).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    out = np.zeros(len(flat), dtype=np.int64)
    valid = ~pc.is_null(flat).to_numpy(zero_copy_only=False)
    if len(mapped):
        out[valid] = mapped[indices[valid]]
    return pa.array(out, pa.int64())


class HashIndexTransformer(Transformer):
    """(hash(s) mod (num_bins-1)) + 1; null/mask -> 0. hash is FarmHash64
    (reference parity, default) or the SQL-expressible codepoint polynomial
    (hash_fn="poly", oracle-certifiable).
    Reference: transformers/hash_index.py:95-119."""

    compatible_dtypes = (pa.string(),)

    def __init__(self, *args, num_bins: int, mask_value: str | None = None,
                 hash_fn: str = "farm", **kwargs):
        super().__init__(*args, **kwargs)
        self.num_bins = int(num_bins)
        self.mask_value = mask_value
        if hash_fn not in ("farm", "poly"):
            raise ValueError("hash_fn must be 'farm' or 'poly'")
        self.hash_fn = hash_fn

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        arr = self._cast_in(batch.column(self.input_col))

        def kernel(flat):
            # vectorized FarmHash (functions/farmhash.hash64_column) — the
            # dictionary-amortized path degenerates to per-row Python on
            # high-cardinality ids (every doc_id distinct)
            from kamae_ray.functions.farmhash import hash64_column

            if self.hash_fn == "poly":
                hp, null_mask = poly31_column(flat)
                out = (hp % np.int64(self.num_bins - 1)) + np.int64(1)
            else:
                h, null_mask = hash64_column(flat)
                out = ((h % np.uint64(self.num_bins - 1)) + np.uint64(1)).astype(np.int64)
            out[null_mask] = 0
            if self.mask_value is not None:
                mm = pc.fill_null(pc.equal(flat, self.mask_value), False).to_numpy(
                    zero_copy_only=False
                )
                out[mm] = 0
            return pa.array(out, pa.int64())

        out = self._cast_out(A.lift(kernel, arr))
        return _append_or_replace(batch, self.output_col, out)


class FeatureCrossTransformer(Transformer):
    """Hashed categorical cross (the wide-and-deep / crossed-column shape;
    the reference's HashIndex is single-column, transformers/hash_index.py:
    95-119): the N input string columns join with the unit separator
    chr(31) — so ('ab','c') and ('a','bc') never alias structurally — and
    the joined key buckets to ``(hash % (num_bins-1)) + 1``; ANY null input
    -> 0 (the mask bucket, matching HashIndex's null rule).

    hash_fn="poly" (default) is the SQL-certifiable codepoint polynomial —
    the q_feature_cross oracle is GENERATED from the same constants via
    ``feature_cross_sql``; hash_fn="farm" swaps in vectorized FarmHash64
    for high-cardinality production crosses."""

    compatible_dtypes = (pa.string(),)

    def __init__(self, *args, num_bins: int, hash_fn: str = "poly", **kwargs):
        super().__init__(*args, **kwargs)
        self.num_bins = int(num_bins)
        if self.num_bins < 2:
            raise ValueError("num_bins must be >= 2 (bucket 0 is the null bucket)")
        if hash_fn not in ("farm", "poly"):
            raise ValueError("hash_fn must be 'farm' or 'poly'")
        if not self.input_cols or len(self.input_cols) < 2:
            raise ValueError("FeatureCross needs input_cols with >= 2 columns")
        self.hash_fn = hash_fn

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        cols = [A.as_array(batch.column(c)) for c in self.input_cols]
        # emit_null (the default): any null input nulls the joined key
        joined = pc.binary_join_element_wise(*cols, pa.scalar(_CROSS_SEP))
        if self.hash_fn == "poly":
            h, null_mask = poly31_column(joined)
            out = (h % np.int64(self.num_bins - 1)) + np.int64(1)
        else:
            from kamae_ray.functions.farmhash import hash64_column

            h, null_mask = hash64_column(joined)
            out = ((h % np.uint64(self.num_bins - 1)) + np.uint64(1)).astype(np.int64)
        out[null_mask] = 0
        return _append_or_replace(batch, self.output_col, pa.array(out, pa.int64()))


_CROSS_SEP = "\x1f"


def feature_cross_sql(cols: Sequence[str], num_bins: int) -> str:
    """GENERATED DuckDB expression mirroring FeatureCrossTransformer's
    hash_fn="poly" bucket over the SQL column expressions ``cols`` — built
    from the same POLY_* constants, so the cross is hash-certified."""
    joined = " || chr(31) || ".join(cols)
    any_null = " OR ".join(f"{c} IS NULL" for c in cols)
    return (
        f"CASE WHEN {any_null} THEN 0 "
        f"ELSE ({poly31_sql(joined)} % {int(num_bins) - 1}) + 1 END"
    )


class MinHashIndexTransformer(Transformer):
    """Per row-array: for i < num_permutations, min over labels of
    hash(label+str(i)), emit its low bit -> bit array.
    Reference: transformers/min_hash_index.py:165,
    user_defined_functions.py:164-202."""

    compatible_dtypes = (pa.string(),)

    def __init__(self, *args, num_permutations: int, mask_value: str | None = None,
                 hash_fn: str = "farm", **kwargs):
        super().__init__(*args, **kwargs)
        self.num_permutations = int(num_permutations)
        self.mask_value = mask_value
        if hash_fn not in ("farm", "poly"):
            raise ValueError("hash_fn must be 'farm' or 'poly'")
        self.hash_fn = hash_fn

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        arr = self._cast_in(batch.column(self.input_col))
        levels, flat = A.unwrap(arr)
        offsets, validity = levels[-1]
        n = len(offsets) - 1
        P = self.num_permutations

        # hash each distinct label once per permutation
        d = flat.dictionary_encode()
        dict_arr = d.dictionary
        indices = pc.fill_null(d.indices, 0).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        null_mask = pc.is_null(flat).to_numpy(zero_copy_only=False)
        # (num_distinct, P) hash matrix: one VECTORIZED farmhash pass per
        # permutation over the distinct labels (label+str(p) concat in Arrow)
        from kamae_ray.functions.farmhash import hash64_column

        nd = len(dict_arr)
        hm = np.empty((max(nd, 1), P), dtype=np.int64)
        if nd:
            for p in range(P):
                arr_p = pc.binary_join_element_wise(dict_arr, str(p), "")
                if self.hash_fn == "poly":
                    hp, _ = poly31_column(arr_p)
                    hm[:, p] = (hp % np.int64(_INT32_MAX - 1)) + np.int64(1)
                else:
                    hv, _ = hash64_column(arr_p)
                    hm[:, p] = ((hv % np.uint64(_INT32_MAX - 1)) + np.uint64(1)).astype(np.int64)
            if self.mask_value is not None:
                mmask = pc.fill_null(pc.equal(dict_arr, self.mask_value), False).to_numpy(
                    zero_copy_only=False
                )
                hm[mmask] = _INT32_MAX
        if self.hash_fn == "poly":
            empty_row = np.array(
                [(poly31_scalar(f"{p}") % (_INT32_MAX - 1)) + 1 for p in range(P)], dtype=np.int64
            )
        else:
            empty_row = np.array(
                [(cached_hash64(f"{p}") % (_INT32_MAX - 1)) + 1 for p in range(P)], dtype=np.int64
            )
        # vectorized per-row min: (flat, P) occurrence hashes (nulls pinned to
        # a +inf sentinel) -> minimum.reduceat per row segment; rows with no
        # usable label fall back to the reference's empty-labels row
        SENT = np.int64(1 << 62)
        offs = np.asarray(offsets, dtype=np.int64)
        lens = offs[1:] - offs[:-1]
        if len(indices):
            occ = hm[indices]
            occ = np.where(null_mask[:, None], SENT, occ)
        else:
            occ = np.zeros((0, P), dtype=np.int64)
        mins = np.empty((n, P), dtype=np.int64)
        nz = lens > 0
        if nz.any() and len(occ):
            starts = offs[:-1].clip(max=max(len(occ) - 1, 0))
            red = np.minimum.reduceat(occ, starts, axis=0)
            mins[nz] = red[nz]
        # empty rows, or rows where every label was null -> empty_row
        fallback = ~nz | (mins[:, 0] == SENT) if n else np.zeros(0, bool)
        mins[fallback] = empty_row
        out_vals = (mins & 1).reshape(-1)
        inner = pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1) * P, pa.int32()),
            pa.array(out_vals, pa.int64()),
            mask=pc.invert(validity) if validity is not None else None,
        )
        out = A.rewrap(levels[:-1], inner)
        out = self._cast_out(out)
        return _append_or_replace(batch, self.output_col, out)


class BloomEncodeTransformer(Transformer):
    """Hash a string num_hash_fns (>=2, default 3) times into an index array
    (bloom-filter-style dimensionality compression).
    Reference: transformers/bloom_encode.py:45-78,128,210-252."""

    compatible_dtypes = (pa.string(),)

    def __init__(
        self,
        *args,
        num_bins: int,
        num_hash_fns: int = 3,
        mask_value: str | None = None,
        use_heuristic_num_bins: bool = False,
        hash_fn: str = "farm",
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        if num_hash_fns < 2:
            raise ValueError("num_hash_fns must be >= 2")
        self.num_bins = int(num_bins)
        self.num_hash_fns = int(num_hash_fns)
        self.mask_value = mask_value
        if hash_fn not in ("farm", "poly"):
            raise ValueError("hash_fn must be 'farm' or 'poly'")
        self.hash_fn = hash_fn

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        arr = self._cast_in(batch.column(self.input_col))
        levels, flat = A.unwrap(arr)
        H = self.num_hash_fns
        d = flat.dictionary_encode()
        dict_arr = d.dictionary
        indices = pc.fill_null(d.indices, 0).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        null_mask = pc.is_null(flat).to_numpy(zero_copy_only=False)
        from kamae_ray.functions.farmhash import hash64_column

        nd = len(dict_arr)
        hm = np.zeros((max(nd, 1), H), dtype=np.int64)
        if nd:
            for h in range(H):
                arr_h = pc.binary_join_element_wise(dict_arr, str(h), "")
                if self.hash_fn == "poly":
                    hp, _ = poly31_column(arr_h)
                    hm[:, h] = (hp % np.int64(self.num_bins - 1)) + np.int64(1)
                else:
                    hv, _ = hash64_column(arr_h)
                    hm[:, h] = ((hv % np.uint64(self.num_bins - 1)) + np.uint64(1)).astype(np.int64)
            if self.mask_value is not None:
                mmask = pc.fill_null(pc.equal(dict_arr, self.mask_value), False).to_numpy(
                    zero_copy_only=False
                )
                hm[mmask] = 0
        n = len(flat)
        out_vals = np.zeros((n, H), dtype=np.int64)
        valid = ~null_mask
        if nd:
            out_vals[valid] = hm[indices[valid]]
        inner = pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1) * H, pa.int32()),
            pa.array(out_vals.reshape(-1), pa.int64()),
        )
        out = A.rewrap(levels, inner)
        out = self._cast_out(out)
        return _append_or_replace(batch, self.output_col, out)


class HashSplitTransformer(Transformer):
    """Deterministic train/val/test split assignment from a key column — the
    standard training-data-pipeline op the reference lacks (it delegates
    splits to Spark; SURVEY §2.14 names set ops as our design obligation).

    bucket(key) = multiplicative hash into [0, 2^64); the label is the first
    split whose cumulative threshold exceeds the bucket, so assignment is a
    pure function of (key, salt) — stable across runs, partitions and
    cluster sizes, and membership is consistent for repeated keys.

    - integer keys: Knuth multiplicative hash ``(key + salt) * 0x9E3779B97F4A7C15
      mod 2^64`` — exactly reproducible in SQL via HUGEINT arithmetic (see
      the q_split oracle), so the split is hash-certifiable.
    - string keys: FarmHash64 of ``key || ':' || salt`` (not SQL-expressible).
    - null keys -> null label.
    """

    compatible_dtypes = None
    _P = np.uint64(0x9E3779B97F4A7C15)

    def __init__(self, *args, splits: dict[str, float], salt: int = 0, **kwargs):
        super().__init__(*args, **kwargs)
        if abs(sum(splits.values()) - 1.0) > 1e-9:
            raise ValueError(f"split fractions must sum to 1, got {sum(splits.values())}")
        self.splits = dict(splits)
        self.salt = int(salt)

    def _thresholds(self) -> np.ndarray:
        cum, acc = [], 0.0
        for f in self.splits.values():
            acc += f
            cum.append(min(int(acc * 2.0**64), (1 << 64) - 1))
        cum[-1] = (1 << 64) - 1  # float rounding must never orphan the tail
        return np.array(cum, dtype=np.uint64)

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        arr = A.as_array(batch.column(self.input_col))
        labels = list(self.splits)
        thresholds = self._thresholds()
        h, null_mask = _split_hash(arr, self.salt)
        # side='right': bucket == threshold falls into the NEXT split —
        # matches the oracle's strict `h < threshold` comparison
        idx = np.searchsorted(thresholds, h, side="right")
        idx = np.minimum(idx, len(labels) - 1)
        lab = pa.DictionaryArray.from_arrays(
            pa.array(idx.astype(np.int32), pa.int32()), pa.array(labels, pa.string())
        ).cast(pa.string())
        if null_mask.any():
            lab = pc.if_else(pa.array(~null_mask), lab, pa.nulls(len(lab), pa.string()))
        return _append_or_replace(batch, self.output_col, lab)


def _split_hash(arr: pa.Array, salt: int) -> tuple:
    """(uint64 hash per row, null mask) with HashSplit's key hashing:
    Knuth multiplicative for integer keys (SQL-reproducible), FarmHash64 of
    ``key || ':' || salt`` for strings."""
    null_mask = pc.is_null(arr).to_numpy(zero_copy_only=False)
    if pa.types.is_integer(arr.type):
        k = pc.fill_null(pc.cast(arr, pa.int64(), safe=False), 0)
        h = (k.to_numpy(zero_copy_only=False).view(np.uint64) + np.uint64(salt)) \
            * HashSplitTransformer._P
    else:
        from kamae_ray.functions.farmhash import hash64_column

        salted = pc.binary_join_element_wise(
            pc.cast(arr, pa.string(), safe=False), str(salt), ":"
        )
        h, _ = hash64_column(salted)
    return h, null_mask


def stratified_sample(ds, key_col: str, strata_col: str, fractions: dict,
                      default_fraction: float = 0.0, salt: int = 0):
    """Deterministic per-stratum Bernoulli sample: a row is kept iff
    ``hash(key) < fraction[stratum] * 2^64`` — the standard class-rebalancing
    sampler for training data.

    Membership is a pure function of (key, salt): stable across runs,
    partitions and cluster sizes, and consistent for repeated keys (all rows
    of one key stay or go together WITHIN a stratum). Embarrassingly
    parallel — one vectorized ``map_batches`` filter, no shuffle, streaming.

    - ``fractions`` maps stratum value (compared as string) -> keep fraction;
      unlisted strata and null strata use ``default_fraction``.
    - fraction >= 1.0 keeps every row of the stratum (no hash edge case).
    - null keys are dropped (no hashable identity).
    - integer keys use the Knuth multiplicative hash, so the kept set is
      exactly reproducible in SQL via HUGEINT arithmetic (see the
      q_stratified oracle); string keys use FarmHash64.
    """
    labels = [str(k) for k in fractions]
    thr = np.array([min(int(f * 2.0**64), 2**64 - 1) for f in fractions.values()],
                   dtype=np.uint64)
    full = np.array([f >= 1.0 for f in fractions.values()], dtype=bool)
    default_thr = np.uint64(min(int(default_fraction * 2.0**64), 2**64 - 1))
    default_full = bool(default_fraction >= 1.0)

    def kern(block: pa.Table) -> pa.Table:
        h, null_mask = _split_hash(A.as_array(block.column(key_col)), salt)
        sv = pc.cast(A.as_array(block.column(strata_col)), pa.string(), safe=False)
        idx = pc.fill_null(
            pc.index_in(sv, value_set=pa.array(labels, pa.string())), -1
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        known = idx >= 0
        safe = np.maximum(idx, 0)
        row_thr = np.where(known, thr[safe], default_thr)
        row_full = np.where(known, full[safe], default_full)
        keep = (~null_mask) & (row_full | (h < row_thr))
        return block.filter(pa.array(keep))

    kern.__name__ = "stratified_sample"
    if isinstance(ds, pa.Table):
        return kern(ds)
    return ds.map_batches(kern, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)



def weighted_sample(ds, key_col: str, weight_col: str, salt: int = 0,
                    scale: int = 1_000_000):
    """Per-row weighted Bernoulli sample: keep a row iff
    ``hash(key, salt) % scale < weight`` — i.e. keep probability =
    ``weight / scale`` (ppm by default), a pure function of (key, salt).
    The standard quality-weighted corpus-curation sampler: rows carry their
    own integer keep-weight (0 drops always, >= scale keeps always; null
    weights and null keys drop — SQL comparison semantics).

    Deterministic and exactly SQL-reproducible for integer keys (Knuth
    multiplicative hash is a bijection; the oracle is one HUGEINT
    expression). Scale plan: a stateless block-local filter inside ONE
    ``map_batches`` — no shuffle, no driver state.
    """

    def keep(block: pa.Table) -> pa.Table:
        h, null_mask = _split_hash(A.as_array(block.column(key_col)), salt)
        w = pc.cast(A.as_array(block.column(weight_col)), pa.int64(),
                    safe=False)
        wn = pc.fill_null(w, -1).to_numpy(zero_copy_only=False)
        wnull = pc.is_null(w).to_numpy(zero_copy_only=False)
        mask = (h % np.uint64(scale)).astype(np.int64) < wn
        mask &= ~(null_mask | wnull)
        return block.filter(pa.array(mask))

    keep.__name__ = "weighted_sample"
    if isinstance(ds, pa.Table):
        return keep(ds)
    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=None)


def deterministic_sample(ds, key_col: str, k: int, salt: int = 0):
    """Exactly-``k`` uniform sample, a pure function of (key, salt):
    the k rows with the smallest row hash — ``ORDER BY hash(key) LIMIT k``.

    The Knuth multiplicative hash is a BIJECTION on 64-bit ints, so distinct
    integer keys can never tie and the sampled set is unique and exactly
    SQL-reproducible (HUGEINT oracle); string keys use FarmHash64. Null keys
    are dropped (no hashable identity).

    Scale plan: each block pre-reduces to its k smallest hashes inside
    ``map_batches`` (the global k-min of a union is contained in the union of
    per-block k-mins), so the final sort+limit only sees ``k x blocks`` rows
    — never the dataset."""
    if k <= 0:
        raise ValueError("k must be positive")

    def add_h(block: pa.Table) -> pa.Table:
        h, null_mask = _split_hash(A.as_array(block.column(key_col)), salt)
        block = block.append_column("__kr_h", pa.array(h))
        if null_mask.any():
            block = block.filter(pa.array(~null_mask))
        return block

    add_h.__name__ = "sample_hash"

    def head_k(block: pa.Table) -> pa.Table:
        if block.num_rows <= k:
            return block
        idx = pc.sort_indices(block, sort_keys=[("__kr_h", "ascending")])
        return block.take(idx.slice(0, k))

    head_k.__name__ = "sample_partial"
    if isinstance(ds, pa.Table):
        return head_k(add_h(ds)).drop_columns(["__kr_h"])

    parts = ds.map_batches(
        lambda b: head_k(add_h(b)), batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    out = parts.sort("__kr_h").limit(k)

    def drop_h(block: pa.Table) -> pa.Table:
        return block.drop_columns(["__kr_h"])

    drop_h.__name__ = "sample_project"
    return out.map_batches(drop_h, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def group_sample(ds, keys, key_col: str, k: int, salt: int = 0):
    """Deterministic ``k``-per-group sample: within each distinct ``keys``
    tuple keep the k rows with the smallest hash of ``key_col`` — SQL
    ``ROW_NUMBER() OVER (PARTITION BY keys ORDER BY hash(key)) <= k``.
    Same hash/bijection/null rules as ``deterministic_sample``; the heavy
    lifting is ``topk_per_group``'s partial top-k plan."""
    from kamae_ray.stages.aggregate import topk_per_group

    keys = [keys] if isinstance(keys, str) else list(keys)

    def add_h(block: pa.Table) -> pa.Table:
        h, null_mask = _split_hash(A.as_array(block.column(key_col)), salt)
        block = block.append_column("__kr_h", pa.array(h))
        if null_mask.any():
            block = block.filter(pa.array(~null_mask))
        return block

    add_h.__name__ = "group_sample_hash"
    if isinstance(ds, pa.Table):
        out = topk_per_group(add_h(ds), keys, "__kr_h", k, descending=False)
        return out.drop_columns(["__kr_h"])
    hashed = ds.map_batches(add_h, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    out = topk_per_group(hashed, keys, "__kr_h", k, descending=False)

    def drop_h(block: pa.Table) -> pa.Table:
        return block.drop_columns(["__kr_h"])

    drop_h.__name__ = "group_sample_project"
    return out.map_batches(drop_h, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def deterministic_shuffle(ds, key_col: str, salt: int = 0,
                          out_col: str = "shuffle_pos", **cumsum_kwargs):
    """Reproducible global shuffle for training data: every row gets its
    0-based position in the permutation ``ORDER BY hash(key, salt)`` — the
    same permutation on every run, every cluster size, every partitioning
    (unlike ``Dataset.random_shuffle``, whose seeded output depends on block
    structure; see build-notes lesson 18).

    Integer keys use the Knuth multiplicative hash — a BIJECTION on int64,
    so distinct keys can never tie and the position column is an exact
    permutation, SQL-reproducible in HUGEINT arithmetic. String keys use
    FarmHash64 (a tie would need a 64-bit collision; positions remain a
    permutation but tied keys' relative order is block-dependent).

    Scale plan: hash is one vectorized map; the rank is
    ``global_cumsum(ones)`` — bucket partial sums + ONE sort-shuffle on the
    bucket id (never a global serial scan). Because hashes are UNIFORM over
    2^64 (not dense row ids), the default ``bucket_width`` here is 2^44 so
    the bucket domain is a FIXED 2^20 ids — the driver's bucket prefix is
    O(2^20) at any corpus size (dense-id callers of global_cumsum use the
    narrow default instead). Rows come back hash-bucket-sorted: consuming
    in block order IS the shuffled order."""
    from kamae_ray.stages.aggregate import global_cumsum

    def add_cols(block: pa.Table) -> pa.Table:
        h, null_mask = _split_hash(A.as_array(block.column(key_col)), salt)
        # order-preserving signed view (uint64 order == int64 order after
        # flipping the top bit): global_cumsum buckets by integer division
        signed = (h ^ np.uint64(1 << 63)).view(np.int64)
        block = block.append_column("__kr_sh", pa.array(signed, pa.int64()))
        block = block.append_column(
            "__kr_one", pa.array(np.ones(block.num_rows, np.int64))
        )
        if null_mask.any():  # null keys have no hashable identity
            block = block.filter(pa.array(~null_mask))
        return block

    add_cols.__name__ = "shuffle_hash"
    # uniform hash domain: fixed 2^20-bucket width (see docstring)
    cumsum_kwargs.setdefault("bucket_width", 1 << 44)
    drop = ["__kr_sh", "__kr_one"]
    if isinstance(ds, pa.Table):
        out = global_cumsum(add_cols(ds), "__kr_sh", "__kr_one", out_col,
                            exclusive=True, **cumsum_kwargs)
        return out.drop_columns(drop)
    hashed = ds.map_batches(add_cols, batch_format="pyarrow", zero_copy_batch=True,
                            batch_size=None)
    out = global_cumsum(hashed, "__kr_sh", "__kr_one", out_col,
                        exclusive=True, **cumsum_kwargs)

    def project(block: pa.Table) -> pa.Table:
        return block.drop_columns([c for c in drop if c in block.column_names])

    project.__name__ = "shuffle_project"
    return out.map_batches(project, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=None)


def mix_corpora(sources, key_col: str, salt: int = 0, source_col: str = "mix_source"):
    """Weighted multi-corpus mixing — the LLM data-mixture step: sample each
    source at its target rate (deterministic per-key Bernoulli, same hash
    contract as ``stratified_sample``), tag provenance, and union.

    ``sources`` is a list of ``(ds_or_table, rate, name)``. Each source uses
    salt ``salt + index`` so shared keys across sources draw independent
    coins. rate >= 1.0 keeps everything; null keys are dropped. No shuffle:
    one vectorized filter per source, then ``Dataset.union`` (streaming,
    order-free). All sources must share a schema."""
    if not sources:
        raise ValueError("sources must be non-empty")
    kinds = {isinstance(src, pa.Table) for src, _, _ in sources}
    if len(kinds) > 1:
        # normalize: lift Tables into (single-block) Datasets so the union works
        import ray

        sources = [
            (ray.data.from_arrow(src) if isinstance(src, pa.Table) else src, r, n)
            for src, r, n in sources
        ]
    parts = []
    for i, (src, rate, name) in enumerate(sources):
        thr = np.uint64(min(int(rate * 2.0**64), 2**64 - 1))
        full = rate >= 1.0

        def kern(block: pa.Table, thr=thr, full=full, name=name, s=salt + i) -> pa.Table:
            h, null_mask = _split_hash(A.as_array(block.column(key_col)), s)
            keep = (~null_mask) & (full | (h < thr))
            block = block.filter(pa.array(keep))
            return block.append_column(
                source_col, pa.array([name] * block.num_rows, pa.string())
            )

        kern.__name__ = f"mix_{name}"
        if isinstance(src, pa.Table):
            parts.append(kern(src))
        else:
            parts.append(
                src.map_batches(kern, batch_format="pyarrow", zero_copy_batch=True,
                                batch_size=None)
            )
    if isinstance(parts[0], pa.Table):
        return pa.concat_tables(parts)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def zorder_key(ds, cols: list[str], bits: int = 16, out_col: str = "zorder_key",
               sort: bool = False):
    """Z-order (Morton) interleaved clustering key over 2-4 NON-NEGATIVE
    integer columns — the multi-dimensional layout primitive: sorting /
    partitioning / writing by the key gives locality in EVERY participating
    dimension at once, so parquet row-group min-max statistics prune
    multi-column range predicates (a single-column sort only ever prunes its
    own column). This is how a 100-TB table stays range-prunable on
    (tenant, time) or (lat-bucket, lon-bucket) simultaneously.

    Each value is masked to its low ``bits`` bits (callers pre-scale —
    quantile-bucket or rank — so the masked range is meaningful); bit ``i``
    of column ``j`` lands at output position ``i * len(cols) + (len(cols) -
    1 - j)`` (the FIRST column is the more significant within each bit
    group). Pure vectorized shifts per batch; ``bits * len(cols)`` must fit
    in a signed int64 (<= 62). Negative or null values raise — a clustering
    key must be total.

    ``sort=True`` returns the Dataset range-partitioned by the key (one
    distributed sort), the write-side clustering step."""
    cols = list(cols)
    if not 2 <= len(cols) <= 4:
        raise ValueError("zorder_key takes 2-4 columns")
    if not 1 <= bits * len(cols) <= 62:
        raise ValueError("bits * len(cols) must be in [1, 62]")
    k = len(cols)
    one = np.int64(1)

    def kern(block: pa.Table) -> pa.Table:
        n = block.num_rows
        out = np.zeros(n, np.int64)
        for j, c in enumerate(cols):
            arr = A.as_array(block.column(c))
            if arr.null_count:
                raise ValueError(f"zorder_key: null in {c!r} — a clustering key must be total")
            v = arr.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            if n and v.min() < 0:
                raise ValueError(f"zorder_key: negative value in {c!r}")
            v = v & np.int64((1 << bits) - 1)
            base = np.int64(k - 1 - j)
            for i in range(bits):
                out |= ((v >> np.int64(i)) & one) << (np.int64(i) * k + base)
        return block.append_column(out_col, pa.array(out))

    kern.__name__ = "zorder_key"
    if isinstance(ds, pa.Table):
        return kern(ds)
    out = ds.map_batches(kern, batch_format="pyarrow", zero_copy_batch=True,
                         batch_size=None)
    return out.sort(out_col) if sort else out


def zorder_oracle_sql(cols: list[str], bits: int, out_col: str = "zorder_key") -> str:
    """The SQL expression computing the SAME interleave (for oracle
    generation): a sum of shifted single-bit terms."""
    k = len(cols)
    terms = []
    for j, c in enumerate(cols):
        for i in range(bits):
            shift = i * k + (k - 1 - j)
            terms.append(f"(((({c} & {(1 << bits) - 1}) >> {i}) & 1) << {shift})")
    return "(" + " | ".join(terms) + f") AS {out_col}"


def temperature_mix(ds, key_col: str, corpus_col: str, alpha=0.5, salt: int = 0,
                    hash_mod: int = 1_000_000, count_col: str = "n_corpus"):
    """Temperature-balanced corpus resampling — the multilingual-LLM mixture
    step (mT5 / XLM-R style): downsample each corpus so the expected kept
    size is proportional to ``n_i ** alpha`` (alpha in (0, 1]; smaller alpha
    flattens the mixture toward uniform), with the SMALLEST corpus kept
    whole. Per-row keep probability is ``(n_min / n_i) ** (1 - alpha)``.

    Membership is EXACT-INTEGER and a pure function of (key, salt): with
    alpha = p/q rational (q <= 3) and e = q - p, a row is kept iff

        (hash(key) % hash_mod) ** q  *  n_i ** e  <  hash_mod ** q * n_min ** e

    — no float sqrt/pow on either engine, so the kept set is bit-identical
    to the HUGEINT SQL form (``temperature_mix_oracle_cond``). The engine
    side rewrites the comparison as ``lhs <= (T - 1) // n_i**e`` with the
    per-corpus bound folded on the driver in arbitrary-precision Python ints
    (lesson-24 family: compare exact integer forms).

    Scale plan: one partial-count pass (per-block ``group_by`` partials, the
    driver folds O(corpora) rows) + one stateless vectorized filter pass —
    no shuffle, no driver state beyond the corpus->bound map. Null corpus
    values and null keys are dropped (SQL comparison semantics). Appends
    ``count_col`` (the corpus's total row count) for downstream reweighting.
    """
    from fractions import Fraction

    fr = alpha if isinstance(alpha, Fraction) else Fraction(alpha).limit_denominator(3)
    if not (0 < fr <= 1):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if abs(float(fr) - float(alpha)) > 1e-12:
        raise ValueError(f"alpha must be rational with denominator <= 3, got {alpha}")
    p, q = fr.numerator, fr.denominator
    e = q - p
    if hash_mod ** q >= 2 ** 62:
        raise ValueError("hash_mod ** q must fit in int64")

    def partial(block: pa.Table) -> pa.Table:
        t = block.select([corpus_col])
        t = t.filter(pc.is_valid(t.column(corpus_col)))
        t = t.set_column(0, corpus_col, pc.cast(t.column(corpus_col), pa.string(), safe=False))
        return t.group_by(corpus_col).aggregate([([], "count_all")])

    partial.__name__ = "corpus_count_partial"
    from kamae_ray.base import collect_tables

    if isinstance(ds, pa.Table):
        parts = [partial(ds)]
    else:
        from kamae_ray.sources import io as _io

        # lesson 25: re-issue a narrowed scan for the count-only pass
        narrow = _io.narrow_read(ds, [corpus_col])
        parts = collect_tables(
            (narrow if narrow is not None else ds).map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=None)
        )
    counts: dict[str, int] = {}
    for t in parts:
        for lab, c in zip(t.column(corpus_col).to_pylist(), t.column("count_all").to_pylist()):
            counts[lab] = counts.get(lab, 0) + int(c)
    if not counts:
        raise ValueError("temperature_mix: no non-null corpus values")
    n_min = min(counts.values())
    T = hash_mod ** q * n_min ** e  # exact python int
    labels = sorted(counts)
    bounds = np.array(
        [min(hash_mod ** q - 1, (T - 1) // (counts[lab] ** e)) for lab in labels],
        dtype=np.int64,
    )
    n_arr = np.array([counts[lab] for lab in labels], dtype=np.int64)

    def kern(block: pa.Table) -> pa.Table:
        h, knull = _split_hash(A.as_array(block.column(key_col)), salt)
        hm = (h % np.uint64(hash_mod)).astype(np.int64)
        lhs = hm
        for _ in range(q - 1):
            lhs = lhs * hm
        idx = pc.index_in(
            pc.cast(A.as_array(block.column(corpus_col)), pa.string(), safe=False),
            value_set=pa.array(labels, pa.string()),
        )
        idxn = pc.fill_null(idx, -1).to_numpy(zero_copy_only=False).astype(np.int64)
        known = idxn >= 0
        safe = np.maximum(idxn, 0)
        keep = known & (~knull) & (lhs <= bounds[safe])
        block = block.filter(pa.array(keep))
        # the kept rows' label indices are already in hand — no second probe
        i2 = safe[keep]
        return _append_or_replace(block, count_col, pa.array(n_arr[i2]))

    kern.__name__ = "temperature_mix"
    if isinstance(ds, pa.Table):
        return kern(ds)
    return ds.map_batches(kern, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=None)


def temperature_mix_oracle_cond(key_expr: str, corpus_count_expr: str,
                                min_count_expr: str, alpha=0.5, salt: int = 0,
                                hash_mod: int = 1_000_000) -> str:
    """The SQL keep-condition computing the SAME exact-integer comparison
    (for oracle generation): HUGEINT arithmetic end to end."""
    from fractions import Fraction

    fr = alpha if isinstance(alpha, Fraction) else Fraction(alpha).limit_denominator(3)
    p, q = fr.numerator, fr.denominator
    e = q - p
    # normalize negatives: DuckDB % returns negative remainders for negative
    # operands, while the engine hashes in two's-complement uint64 — fold the
    # product into [0, 2^64) first (same pattern as checksum_oracle_sql)
    m64 = 18446744073709551616
    hm = (f"((((((CAST({key_expr} AS HUGEINT) + {salt}) * 11400714819323198485) "
          f"% {m64}) + {m64}) % {m64}) % {hash_mod})")
    lhs = " * ".join([hm] * q)
    rhs_n = " * ".join([f"CAST({corpus_count_expr} AS HUGEINT)"] * e) if e else "1"
    rhs_t = " * ".join([f"CAST({hash_mod} AS HUGEINT)"] * q)
    rhs_m = " * ".join([f"CAST({min_count_expr} AS HUGEINT)"] * e) if e else "1"
    return f"({lhs}) * ({rhs_n}) < ({rhs_t}) * ({rhs_m})"


def weighted_sample_noreplace(ds, id_col: str, weight_col: str, k: int,
                              salt: int = 0):
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006):
    each row draws a deterministic uniform from the house Knuth hash,
    ``u = ((hash >> 11) + 1) / 2^53`` (exact dyadic in (0, 1]), and the
    sample is the k LARGEST ``u^(1/w)`` — compared in log space as
    ``ln(u) / w`` (ln via arrays.libm_log, division IEEE — the whole key is
    bit-identical cross-engine, lesson 38), ties to the smallest id.
    Exactly reproduces inclusion probabilities proportional to weight
    without replacement, unlike the Bernoulli ``weighted_sample``. Weights
    must be POSITIVE integers (raises per block). Output: ``id, w, key``.

    Scale plan: one stateless map computes keys, then the partial top-k
    plan (block-local head-k before the shuffle) — the exchange carries at
    most k rows per block."""
    from kamae_ray.stages.aggregate import topk_per_group

    P = np.uint64(0x9E3779B97F4A7C15)
    s_u = np.uint64(salt)

    def keyed(t: pa.Table) -> pa.Table:
        ids = pc.cast(A.as_array(t.column(id_col)), pa.int64(), safe=False) \
            .to_numpy(zero_copy_only=False)
        w = pc.cast(A.as_array(t.column(weight_col)), pa.int64(), safe=False) \
            .to_numpy(zero_copy_only=False)
        if len(w) and w.min() <= 0:
            raise ValueError("weighted_sample_noreplace: weights must be positive")
        with np.errstate(over="ignore"):
            h = (ids.astype(np.uint64) + s_u) * P
        u = ((h >> np.uint64(11)) + np.uint64(1)).astype(np.float64) / float(1 << 53)
        key = A.libm_log(u) / w.astype(np.float64)
        return pa.table({"__g": pa.array(np.zeros(len(ids), np.int64)),
                         "id": pa.array(ids, pa.int64()),
                         "w": pa.array(w, pa.int64()),
                         "key": pa.array(key, pa.float64())})

    keyed.__name__ = "aes_keys"
    if isinstance(ds, pa.Table):
        kt = keyed(ds)
        top = topk_per_group(kt, "__g", "key", k, descending=True, tiebreak="id")
        return top.drop_columns(["__g"])
    mapped = ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True,
                            batch_size=None)
    top = topk_per_group(mapped, "__g", "key", k, descending=True, tiebreak="id")

    def finish(t: pa.Table) -> pa.Table:
        return t.drop_columns(["__g"])

    finish.__name__ = "aes_finish"
    return top.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=None)
