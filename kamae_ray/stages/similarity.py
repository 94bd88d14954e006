"""Similarity / geo transformers, §2.6 of SURVEY.md.

Reference semantics: src/kamae/spark/transformers/{cosine_similarity,
pairwise_cosine_similarity,haversine_distance,bearing_angle}.py

Kernels are numpy einsum/dot over fixed-width rows — vectorized per batch.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kamae_ray.base import Transformer, _append_or_replace
from kamae_ray.functions import arrays as A
from kamae_ray.stages.elementwise import MultiInputTransformer


def _segmented_dot(a_vals, b_vals, offsets):
    prod = a_vals * b_vals
    return np.add.reduceat(prod, offsets[:-1].clip(max=max(len(prod) - 1, 0))) if len(prod) else np.array([])


class CosineSimilarityTransformer(Transformer):
    """dot(a,b)/(||a||·||b||) over innermost arrays; 0.0 when either norm is 0.
    Reference: transformers/cosine_similarity.py:100-146."""

    compatible_dtypes = (pa.float64(),)

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        a = self._cast_in(batch.column(self.input_cols[0]))
        b = self._cast_in(batch.column(self.input_cols[1]))
        la, fa = A.unwrap(a)
        lb, fb = A.unwrap(b)
        offsets = la[-1][0]
        av = fa.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        bv = fb.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        lens = np.diff(offsets)
        dots = _segmented_dot(av, bv, offsets)
        na = np.sqrt(_segmented_dot(av, av, offsets))
        nb = np.sqrt(_segmented_dot(bv, bv, offsets))
        denom = na * nb
        with np.errstate(invalid="ignore", divide="ignore"):
            sim = np.where(denom > 0, dots / np.where(denom == 0, 1, denom), 0.0)
        sim = np.where(lens > 0, sim, 0.0)
        out = A.rewrap(la[:-1], pa.array(sim, pa.float64()))
        out = self._cast_out(out)
        return _append_or_replace(batch, self.output_col, out)


class PairwiseCosineSimilarityTransformer(Transformer):
    """Query vec vs flat array of k candidate vecs (embedding_dim strides)
    -> k sims. Reference: transformers/pairwise_cosine_similarity.py:85-140."""

    compatible_dtypes = (pa.float64(),)

    def __init__(self, *args, embedding_dim: int, **kwargs):
        super().__init__(*args, **kwargs)
        self.embedding_dim = int(embedding_dim)

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        q = self._cast_in(batch.column(self.input_cols[0]))
        c = self._cast_in(batch.column(self.input_cols[1]))
        qm, d = A.matrix_view(q)
        cm, kd = A.matrix_view(c)
        if d != self.embedding_dim:
            raise ValueError(f"query dim {d} != embedding_dim {self.embedding_dim}")
        k = kd // d
        n = qm.shape[0]
        cand = cm.reshape(n, k, d).astype(np.float64)
        qv = qm.astype(np.float64)
        dots = np.einsum("nkd,nd->nk", cand, qv)
        qn = np.linalg.norm(qv, axis=1)[:, None]
        cn = np.linalg.norm(cand, axis=2)
        denom = qn * cn
        with np.errstate(invalid="ignore", divide="ignore"):
            sims = np.where(denom > 0, dots / np.where(denom == 0, 1, denom), 0.0)
        out = pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1) * k, pa.int32()),
            pa.array(sims.reshape(-1), pa.float64()),
        )
        out = self._cast_out(out)
        return _append_or_replace(batch, self.output_col, out)


_EARTH_RADIUS_KM = 6371.0


class HaversineDistanceTransformer(MultiInputTransformer):
    """Great-circle km between (lat1,lon1) and (lat2,lon2) — 4 input cols or
    2 cols + lat_lon_constant. Reference: transformers/haversine_distance.py:254."""

    compatible_dtypes = (pa.float64(),)

    def __init__(self, *args, lat_lon_constant: tuple[float, float] | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.lat_lon_constant = list(lat_lon_constant) if lat_lon_constant else None

    def _fold(self, flats):
        lat1 = np.asarray(flats[0], dtype=np.float64)
        lon1 = np.asarray(flats[1], dtype=np.float64)
        if self.lat_lon_constant is not None:
            lat2 = np.full_like(lat1, self.lat_lon_constant[0])
            lon2 = np.full_like(lon1, self.lat_lon_constant[1])
        else:
            lat2 = np.asarray(flats[2], dtype=np.float64)
            lon2 = np.asarray(flats[3], dtype=np.float64)
        p1, p2 = np.radians(lat1), np.radians(lat2)
        dphi = np.radians(lat2 - lat1)
        dlmb = np.radians(lon2 - lon1)
        h = np.sin(dphi / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlmb / 2) ** 2
        # pc.asin, not np.arcsin: numpy diverges from libm/DuckDB by 1 ULP
        # on ~26% of inputs (lesson 38 — oracle-mirrored transcendentals
        # must ride Arrow kernels); np.sin/np.cos/np.sqrt are exact matches.
        asin = pc.asin(pa.array(np.sqrt(h))).to_numpy(zero_copy_only=False)
        return pa.array(2 * _EARTH_RADIUS_KM * asin, pa.float64())


class BearingAngleTransformer(MultiInputTransformer):
    """Navigation bearing in degrees between lat/lon pairs.
    Reference: transformers/bearing_angle.py:216."""

    compatible_dtypes = (pa.float64(),)

    def __init__(self, *args, lat_lon_constant: tuple[float, float] | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.lat_lon_constant = list(lat_lon_constant) if lat_lon_constant else None

    def _fold(self, flats):
        lat1 = np.asarray(flats[0], dtype=np.float64)
        lon1 = np.asarray(flats[1], dtype=np.float64)
        if self.lat_lon_constant is not None:
            lat2 = np.full_like(lat1, self.lat_lon_constant[0])
            lon2 = np.full_like(lon1, self.lat_lon_constant[1])
        else:
            lat2 = np.asarray(flats[2], dtype=np.float64)
            lon2 = np.asarray(flats[3], dtype=np.float64)
        p1, p2 = np.radians(lat1), np.radians(lat2)
        dlmb = np.radians(lon2 - lon1)
        y = np.sin(dlmb) * np.cos(p2)
        x = np.cos(p1) * np.sin(p2) - np.sin(p1) * np.cos(p2) * np.cos(dlmb)
        # pc.atan2, not np.arctan2: same lesson-38 libm-parity class
        at2 = pc.atan2(pa.array(y), pa.array(x)).to_numpy(zero_copy_only=False)
        theta = np.degrees(at2)
        return pa.array((theta + 360.0) % 360.0, pa.float64())


class L2NormalizeTransformer(Transformer):
    """Unit-normalize each innermost array: ``x / ||x||_2`` (all-zero
    vectors -> all zeros, matching the cosine norm-0 convention). The
    standard pre-step before cosine ANN — unit vectors turn cosine top-k
    into a pure dot-product matmul."""

    compatible_dtypes = (pa.float64(),)

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        arr = self._cast_in(batch.column(self.input_col))
        levels, flat = A.unwrap(arr)
        offsets = levels[-1][0]
        v = flat.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        norms = np.sqrt(_segmented_dot(v, v, offsets))
        lens = np.diff(offsets)
        per_row = np.repeat(np.where(norms == 0, 1.0, norms), lens)
        out = A.rewrap(levels, pa.array(v / per_row, pa.float64()))
        out = self._cast_out(out)
        return _append_or_replace(batch, self.output_col, out)


class QuantizeEmbeddingTransformer(Transformer):
    """Per-vector affine scalar quantization of an embedding list column —
    the int8 compression step before a memory-bounded ANN index (4x smaller
    than float32, 8x smaller than float64):

        code = floor((x - lo) * (levels-1) / (hi - lo) + 0.5)

    with ``lo``/``hi`` the vector's own min/max (emitted as
    ``{output_col}_lo`` / ``{output_col}_hi`` float64 columns for
    dequantization ``lo + code * (hi - lo) / (levels-1)``). Constant vectors
    (hi == lo) quantize to all zeros. The float chain is sub/mul/div/add/
    floor only — IEEE-exact ops, bit-identical across engines (no
    transcendentals, lesson-38 family). Codes are uint8 for levels <= 256,
    int32 above. Null rows emit null; null ELEMENTS are rejected.

    Stateless vectorized map — no fit, no shuffle; scale-safe by
    construction."""

    compatible_dtypes = (pa.float64(),)

    def __init__(self, levels: int = 256, **kwargs) -> None:
        super().__init__(**kwargs)
        if not 2 <= int(levels) <= 1 << 31:
            raise ValueError("levels must be in [2, 2^31]")
        self.levels = int(levels)

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        arr = self._cast_in(batch.column(self.input_col))
        lv, flat = A.unwrap(arr)
        if flat.null_count:
            raise ValueError("QuantizeEmbedding: null list elements unsupported")
        offsets, validity = lv[-1]
        v = flat.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        starts = offsets[:-1]
        lens = np.diff(offsets)
        n = len(lens)
        lo = np.zeros(n)
        hi = np.zeros(n)
        nz = lens > 0
        if v.size and nz.any():
            # reduceat over non-empty segments only: consecutive non-empty
            # starts delimit exactly their data (empty segments own no span)
            nz_starts = starts[nz]
            lo[nz] = np.minimum.reduceat(v, nz_starts)
            hi[nz] = np.maximum.reduceat(v, nz_starts)
        rng = hi - lo
        per_lo = np.repeat(lo, lens)
        per_rng = np.repeat(rng, lens)
        # EXACT SQL mirror: floor((x - lo) * (L-1) / (hi - lo) + 0.5)
        num = (v - per_lo) * float(self.levels - 1)
        q = np.floor(
            np.divide(num, per_rng, out=np.zeros_like(num), where=per_rng > 0)
            + 0.5
        )
        code_np = q.astype(np.uint8) if self.levels <= 256 else q.astype(np.int32)
        codes = A.rewrap(lv, pa.array(code_np))
        null_row = ~nz
        if validity is not None:
            null_row |= ~validity.to_numpy(zero_copy_only=False)
        mask = null_row if null_row.any() else None
        batch = _append_or_replace(batch, self.output_col, codes)
        batch = _append_or_replace(
            batch, f"{self.output_col}_lo", pa.array(lo, pa.float64(), mask=mask))
        return _append_or_replace(
            batch, f"{self.output_col}_hi", pa.array(hi, pa.float64(), mask=mask))


def rowwise_jaccard(ds, col_a: str, col_b: str, prefix: str = "jaccard"):
    """Per-row token-SET Jaccard similarity between two list columns (pair
    verification / variant scoring): appends ``{prefix}_inter`` and
    ``{prefix}_union`` (exact int64 distinct-element counts) and
    ``{prefix}_ppm`` (parts-per-million, ``inter * 1_000_000 // union`` —
    integer-exact, no float anywhere). Rows where either list is null emit
    nulls; ``union == 0`` (two empty lists) emits a null ppm (0/0). Lists
    are taken literally — no token normalization or empty-string dropping
    (compose upstream).

    Fully vectorized, shuffle-free (rows are independent): per block, BOTH
    columns' flat values dictionary-encode ONCE (lesson 12 — hash each
    distinct token once), then one lexsort over (row, code, side) and run-
    boundary arithmetic produce the per-row distinct/intersection counts;
    null rows' stale offset spans are dropped before encoding (lesson-21
    family)."""

    def _flat(block: pa.Table, col: str):
        arr = A.as_array(block.column(col))
        levels, flat = A.unwrap(arr)
        if len(levels) != 1:
            raise ValueError(f"rowwise_jaccard: {col} must be a flat list column")
        offsets, validity = levels[0]
        lens = np.diff(offsets).astype(np.int64)
        if validity is not None:
            vmask = validity.to_numpy(zero_copy_only=False)
            flat = flat.filter(pa.array(np.repeat(vmask, lens)))
            lens = np.where(vmask, lens, 0)
            return lens, flat, ~vmask
        return lens, flat, np.zeros(len(lens), dtype=bool)

    def kern(block: pa.Table) -> pa.Table:
        n = block.num_rows
        la, fa, nulla = _flat(block, col_a)
        lb, fb, nullb = _flat(block, col_b)
        either_null = nulla | nullb
        if len(fa) + len(fb):
            combined = pa.concat_arrays([
                pa.concat_arrays(fa.cast(pa.string()).chunks)
                if isinstance(fa, pa.ChunkedArray) else fa.cast(pa.string()),
                pa.concat_arrays(fb.cast(pa.string()).chunks)
                if isinstance(fb, pa.ChunkedArray) else fb.cast(pa.string()),
            ])
            codes = pc.fill_null(combined.dictionary_encode().indices, 0) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            codes = np.zeros(0, np.int64)
        rows = np.concatenate([np.repeat(np.arange(n, dtype=np.int64), la),
                               np.repeat(np.arange(n, dtype=np.int64), lb)])
        side = np.concatenate([np.zeros(int(la.sum()), np.int8),
                               np.ones(int(lb.sum()), np.int8)])
        # ignore tokens from null rows entirely (their spans were dropped
        # from the flats already; lens are 0 so rows/side exclude them)
        order = np.lexsort((side, codes, rows))
        rs, cs, ss = rows[order], codes[order], side[order]
        m = len(rs)
        inter = np.zeros(n, np.int64)
        union = np.zeros(n, np.int64)
        if m:
            new = np.concatenate([[True], (rs[1:] != rs[:-1]) | (cs[1:] != cs[:-1])])
            starts = np.nonzero(new)[0]
            ends = np.concatenate([starts[1:] - 1, [m - 1]])
            run_row = rs[starts]
            both = (ss[starts] == 0) & (ss[ends] == 1)
            union = np.bincount(run_row, minlength=n).astype(np.int64)
            inter = np.bincount(run_row[both], minlength=n).astype(np.int64)
        ppm = np.where(union > 0, inter * np.int64(1_000_000)
                       // np.where(union == 0, 1, union), 0)
        out = block
        out = out.append_column(f"{prefix}_inter",
                                pa.array(inter, pa.int64(), mask=either_null))
        out = out.append_column(f"{prefix}_union",
                                pa.array(union, pa.int64(), mask=either_null))
        out = out.append_column(f"{prefix}_ppm",
                                pa.array(ppm, pa.int64(),
                                         mask=either_null | (union == 0)))
        return out

    if isinstance(ds, pa.Table):
        return kern(ds)
    kern.__name__ = "rowwise_jaccard"
    return ds.map_batches(kern, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=None)
