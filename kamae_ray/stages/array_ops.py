"""Array-structure transformers (innermost-axis ops), §2.5 of SURVEY.md.

Reference semantics: src/kamae/spark/transformers/{array_concatenate,
array_crop,array_split,array_reduce_max,array_subtract_minimum,
ordinal_array_encode,string_sequence_to_embedding}.py

These operate on the innermost array (axis=-1). Token arrays are row-varying
length, so kernels are offset-aware (numpy on flat values + offsets); after an
ArrayCrop everything is fixed-width and views as a 2-D matrix zero-copy.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kamae_ray.base import Transformer, _append_or_replace
from kamae_ray.functions import arrays as A


class ArrayConcatenateTransformer(Transformer):
    """Concat N cols along the last dim; scalar inputs broadcast to ``[x]``
    inner singletons. Reference: transformers/array_concatenate.py:189-295
    (the Spark twin of VectorAssembler / tf.concat(axis=-1))."""

    compatible_dtypes = None

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        cols = [self._cast_in(batch.column(c)) for c in self.input_cols]
        unwrapped = [A.unwrap(a) for a in cols]
        n = batch.num_rows
        # per-row inner lengths for each input (scalars count as 1)
        per_col: list[tuple[np.ndarray, pa.Array]] = []
        for levels, flat in unwrapped:
            if levels:
                lens = A.flat_counts(levels)  # innermost-only when 1 level
                offs = A.composed_offsets(levels)
            else:
                lens = np.ones(n, dtype=np.int64)
                offs = np.arange(n + 1, dtype=np.int64)
            per_col.append((offs, flat))
        lens_each = [np.diff(o) for o, _ in per_col]
        total = np.sum(lens_each, axis=0)
        out_offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(total, out=out_offsets[1:])
        # interleave: for each row, values of col0 then col1 ...
        out_type = None
        flats_np = []
        for offs, flat in per_col:
            if out_type is None or pa.types.is_floating(flat.type):
                out_type = flat.type if out_type is None else out_type
        # promote to a common type via arrow concat rules: cast all to first float/widest
        types = [f.type for _, f in per_col]
        target = types[0]
        for t in types[1:]:
            if t.equals(target):
                continue
            if pa.types.is_floating(t) or pa.types.is_floating(target):
                target = pa.float64() if (pa.types.is_float64(t) or pa.types.is_float64(target)) else pa.float32()
            elif t.bit_width > target.bit_width:
                target = t
        np_dtype = target.to_pandas_dtype()
        out_vals = np.empty(int(out_offsets[-1]), dtype=np_dtype)
        # build gather indices per column
        cursor = out_offsets[:-1].copy()
        for (offs, flat), lens in zip(per_col, lens_each):
            vals = pc.cast(flat, target, safe=False).to_numpy(zero_copy_only=False)
            # destination positions: cursor[i] .. cursor[i]+lens[i]
            dst = np.repeat(cursor, lens) + (
                np.arange(int(lens.sum())) - np.repeat(np.cumsum(lens) - lens, lens)
            )
            src = np.repeat(offs[:-1], lens) + (
                np.arange(int(lens.sum())) - np.repeat(np.cumsum(lens) - lens, lens)
            )
            out_vals[dst] = vals[src]
            cursor += lens
        out = pa.ListArray.from_arrays(pa.array(out_offsets, pa.int32()), pa.array(out_vals, target))
        out = self._cast_out(out)
        return _append_or_replace(batch, self.output_col, out)


class ArrayCropTransformer(Transformer):
    """Crop innermost arrays to ``array_length`` or right-pad with
    ``pad_value``. Reference: transformers/array_crop.py:138-206."""

    compatible_dtypes = None

    def __init__(self, *args, array_length: int, pad_value, **kwargs):
        super().__init__(*args, **kwargs)
        self.array_length = int(array_length)
        self.pad_value = pad_value

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        arr = self._cast_in(batch.column(self.input_col))
        levels, flat = A.unwrap(arr)
        if not levels:
            raise TypeError("ArrayCrop requires a list input")
        L = self.array_length
        offsets, validity = levels[-1]
        keep = np.minimum(np.diff(offsets), L)
        n = len(keep)
        new_offsets = np.arange(n + 1, dtype=np.int64) * L
        total = int(keep.sum())
        # one intra-row index vector shared by gather source and scatter dest
        intra = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(keep) - keep, keep)
        src = np.repeat(offsets[:-1], keep) + intra
        dst = np.repeat(new_offsets[:-1], keep) + intra
        if flat.null_count == 0 and not pa.types.is_string(flat.type):
            vals = flat.to_numpy(zero_copy_only=False)
            out_vals = np.full(n * L, self.pad_value, dtype=vals.dtype)
            out_vals[dst] = vals[src]
            out_flat = pa.array(out_vals, flat.type)
        else:
            py = flat.take(pa.array(src)).to_pylist()
            out_list = [self.pad_value] * (n * L)
            for d, v in zip(dst, py):
                out_list[int(d)] = v
            out_flat = pa.array(out_list, flat.type)
        inner_out = pa.ListArray.from_arrays(
            pa.array(new_offsets, pa.int32()),
            out_flat,
            mask=pc.invert(validity) if validity is not None else None,
        )
        out = A.rewrap(levels[:-1], inner_out)
        out = self._cast_out(out)
        return _append_or_replace(batch, self.output_col, out)


def _intra(lens: np.ndarray) -> np.ndarray:
    """[0..lens[0]-1, 0..lens[1]-1, ...] — intra-row running index."""
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    return np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(lens) - lens, lens)


class ArraySplitTransformer(Transformer):
    """One output col per index: element_at(x, i+1) — inverse of
    ArrayConcatenate. Reference: transformers/array_split.py:83-104."""

    compatible_dtypes = None

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        arr = self._cast_in(batch.column(self.input_col))
        levels, flat = A.unwrap(arr)
        offsets = levels[-1][0]
        lens = np.diff(offsets)
        for i, name in enumerate(self.output_cols):
            ok = lens > i
            idx = offsets[:-1] + i
            taken = flat.take(pa.array(np.where(ok, idx, 0)))
            if not ok.all():
                taken = pa.array(taken.to_pylist(), flat.type, mask=~ok)
            out = A.rewrap(levels[:-1], taken)
            batch = _append_or_replace(batch, name, self._cast_out(out))
        return batch


class ArrayReduceMaxTransformer(Transformer):
    """Reduce innermost dim by max. Reference: transformers/array_reduce_max.py:84."""

    compatible_dtypes = None

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        arr = self._cast_in(batch.column(self.input_col))
        levels, flat = A.unwrap(arr)
        inner = A.rewrap([levels[-1]], flat)
        # pyarrow has no list_max; use numpy segmented reduce
        offsets, validity = levels[-1]
        vals = flat.to_numpy(zero_copy_only=False)
        red = np.maximum.reduceat(vals, offsets[:-1].clip(max=max(len(vals) - 1, 0))) if len(vals) else np.array([], dtype=vals.dtype)
        lens = np.diff(offsets)
        if len(vals):
            red = np.where(lens > 0, red, np.nan if np.issubdtype(vals.dtype, np.floating) else 0)
        mask = None
        if validity is not None:
            mask = ~validity.to_numpy(zero_copy_only=False)
        out = A.rewrap(levels[:-1], pa.array(red, flat.type, mask=mask))
        out = self._cast_out(out)
        return _append_or_replace(batch, self.output_col, out)


class ArraySubtractMinimumTransformer(Transformer):
    """x - min(x ignoring pad_value), pad positions unchanged — used for
    timestamp deltas. Reference: transformers/array_subtract_minimum.py:133-185."""

    compatible_dtypes = None

    def __init__(self, *args, pad_value=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.pad_value = pad_value

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        arr = self._cast_in(batch.column(self.input_col))
        levels, flat = A.unwrap(arr)
        offsets, _ = levels[-1]
        vals = flat.to_numpy(zero_copy_only=False).copy()
        lens = np.diff(offsets)
        row_of = np.repeat(np.arange(len(lens)), lens)
        if self.pad_value is not None:
            is_pad = vals == self.pad_value
            big = np.where(is_pad, np.inf if np.issubdtype(vals.dtype, np.floating) else np.iinfo(vals.dtype).max, vals)
        else:
            is_pad = np.zeros(len(vals), dtype=bool)
            big = vals
        mins = np.full(len(lens), 0, dtype=vals.dtype)
        if len(vals):
            red = np.minimum.reduceat(big, offsets[:-1].clip(max=len(vals) - 1))
            mins = np.where(lens > 0, red, 0)
        out_vals = np.where(is_pad, vals, vals - mins[row_of])
        out = A.rewrap(levels, pa.array(out_vals, flat.type))
        out = self._cast_out(out)
        return _append_or_replace(batch, self.output_col, out)


class OrdinalArrayEncodeTransformer(Transformer):
    """First-appearance ordinal encoding of strings within each row's array;
    ``pad_value`` -> -1. Reference: transformers/ordinal_array_encode.py:123,
    spark/utils/user_defined_functions.py:142-161."""

    compatible_dtypes = None

    def __init__(self, *args, pad_value: str | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.pad_value = pad_value

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        arr = self._cast_in(batch.column(self.input_col))
        levels, flat = A.unwrap(arr)
        offsets, _ = levels[-1]
        n_vals = len(flat)
        # vectorized first-appearance ordinal: dictionary-encode once, then
        # per (row, code) find the first occurrence via lexsort + searchsorted
        d = flat.dictionary_encode()
        import pyarrow.compute as _pc

        codes = _pc.fill_null(d.indices, -2).to_numpy(zero_copy_only=False).astype(np.int64, copy=False).copy()
        pad_code = -1
        if self.pad_value is not None:
            dict_vals = d.dictionary.to_pylist()
            try:
                pad_code = dict_vals.index(self.pad_value)
            except ValueError:
                pad_code = -1
        lens = np.diff(offsets)
        row_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        is_pad = codes == pad_code if pad_code >= 0 else np.zeros(n_vals, dtype=bool)
        # first occurrence index of each (row, code) pair among non-pad slots
        order = np.lexsort((np.arange(n_vals), codes, row_of))
        ro, co = row_of[order], codes[order]
        first_of_pair = np.concatenate([[True], (ro[1:] != ro[:-1]) | (co[1:] != co[:-1])]) if n_vals else np.zeros(0, bool)
        # ordinal of a pair = count of earlier distinct non-pad values in the
        # row = rank of the pair's first-occurrence position among the row's
        # first-occurrence slots; positions of first occurrences (orig order):
        firsts = np.zeros(n_vals, dtype=bool)
        firsts[order[first_of_pair]] = True
        firsts &= ~is_pad
        # ordinal at first-occurrence slots = running count of firsts within row
        cum = np.cumsum(firsts.astype(np.int64))
        row_start_cum = np.concatenate([[0], cum])[offsets[:-1]]
        ordinal_at_slot = (cum - 1) - np.repeat(row_start_cum, lens)
        # map every slot to its pair's first-occurrence slot
        pair_first = np.empty(n_vals, dtype=np.int64)
        grp_first = np.maximum.accumulate(np.where(first_of_pair, np.arange(n_vals), -1)) if n_vals else np.zeros(0, np.int64)
        pair_first[order] = order[grp_first] if n_vals else grp_first
        out_vals = ordinal_at_slot[pair_first].astype(np.int32)
        out_vals[is_pad] = -1
        out = A.rewrap(levels, pa.array(out_vals, pa.int32()))
        out = self._cast_out(out)
        return _append_or_replace(batch, self.output_col, out)


class StringSequenceToEmbeddingTransformer(Transformer):
    """Parse 'v1,v2;v3,v4' delimited string -> (seq_len, embedding_dim) float
    array; truncate/pad with pad_value, optional reverse of the non-pad prefix.
    Reference: transformers/string_sequence_to_embedding.py:204-283."""

    compatible_dtypes = (pa.string(),)

    def __init__(
        self,
        *args,
        outer_separator: str = ";",
        inner_separator: str = ",",
        seq_length: int,
        pad_value: float = 0.0,
        reverse: bool = False,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.outer_separator = outer_separator
        self.inner_separator = inner_separator
        self.seq_length = int(seq_length)
        self.pad_value = float(pad_value)
        self.reverse = reverse

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        arr = self._cast_in(batch.column(self.input_col))
        levels, flat = A.unwrap(arr)
        n = len(flat)
        L = self.seq_length
        # fully vectorized: two Arrow literal splits + one float cast + one
        # numpy scatter (rows -> parts -> values; no per-row Python)
        filled = pc.fill_null(flat, "")
        outer = pc.split_pattern(filled, pattern=self.outer_separator)
        o_lv, parts = A.unwrap(outer)
        o_off = np.asarray(o_lv[0][0], dtype=np.int64)
        keep = pc.not_equal(parts, "").to_numpy(zero_copy_only=False) if len(parts) else np.zeros(0, bool)
        part_row = np.repeat(np.arange(n), np.diff(o_off))
        inner = pc.split_pattern(parts, pattern=self.inner_separator)
        i_lv, vals_str = A.unwrap(inner)
        i_off = np.asarray(i_lv[0][0], dtype=np.int64)
        i_len = np.diff(i_off)
        kept = np.flatnonzero(keep)
        dim = int(i_len[kept[0]]) if len(kept) else 1
        out = np.full((n, L, dim), self.pad_value, dtype=np.float32)
        if len(kept):
            # values of dropped (empty) parts never scatter — blank them so
            # the cast only parses real numbers (parse errors on kept parts
            # still raise, matching the reference's float() behavior)
            val_keep = np.repeat(keep, i_len)
            safe_str = pc.if_else(pa.array(val_keep), vals_str, "0") if not val_keep.all() else vals_str
            vals = pc.cast(safe_str, pa.float32(), safe=False).to_numpy(zero_copy_only=False)
            # within-row rank of each kept part; truncate at L, then reverse
            # the non-pad prefix when requested (reference order)
            csum = np.cumsum(keep) - keep  # kept parts strictly before p
            kept_per_row = np.bincount(part_row, weights=keep.astype(np.int64), minlength=n).astype(np.int64)
            excl = np.cumsum(kept_per_row) - kept_per_row  # kept before row start
            rank = csum[kept] - excl[part_row[kept]]
            rows_k = part_row[kept]
            eff = np.minimum(kept_per_row, L)
            in_window = rank < L
            kp = kept[in_window]
            rk = rank[in_window]
            rw = rows_k[in_window]
            if self.reverse:
                rk = eff[rw] - 1 - rk
            m = np.minimum(i_len[kp], dim).astype(np.int64)
            tot = int(m.sum())
            if tot:
                intra = np.arange(tot, dtype=np.int64) - np.repeat(np.cumsum(m) - m, m)
                src = np.repeat(i_off[:-1][kp], m) + intra
                dst = np.repeat((rw * L + rk) * dim, m) + intra
                out.reshape(-1)[dst] = vals[src]
        inner = pa.array(out.reshape(-1), pa.float32())
        lvl2 = pa.ListArray.from_arrays(pa.array(np.arange(n * L + 1) * dim, pa.int32()), inner)
        lvl1 = pa.ListArray.from_arrays(pa.array(np.arange(n + 1) * L, pa.int32()), lvl2)
        out_arr = A.rewrap(levels, lvl1)
        out_arr = self._cast_out(out_arr)
        return _append_or_replace(batch, self.output_col, out_arr)


class ArrayDistinctSortTransformer(Transformer):
    """Per-row distinct + ascending sort of a list column — the token-set
    canonicalizer (per-row vocabulary for set-similarity / dedup features;
    extends the reference's array family, which has no set op). Null
    ELEMENTS are dropped and a null ROW stays null — exactly DuckDB's
    ``list_sort(list_distinct(x))`` (list_distinct removes NULLs), which
    the oracle mirrors verbatim.

    Vectorized kernel (no per-row loop): ONE dictionary-encode of the
    block's flat values (lesson 12), dictionary ids remapped to their
    lexicographic rank, ONE (row, rank) lexsort, boundary dedup, and a
    single ListArray rebuild from counts. Works for string and numeric
    value types alike."""

    compatible_dtypes = None

    def _transform_array(self, arr: pa.Array, batch: pa.Table) -> pa.Array:
        arr = A.as_array(arr)
        if not pa.types.is_list(arr.type) and not pa.types.is_large_list(arr.type):
            raise TypeError("ArrayDistinctSort needs a list column")
        n = len(arr)
        row_null = ~pc.is_valid(arr).to_numpy(zero_copy_only=False)
        lens = pc.fill_null(pc.list_value_length(arr), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = A.as_array(pc.list_flatten(arr))  # excludes null rows' spans
        rows_all = np.repeat(np.arange(n, dtype=np.int64), lens)
        keep = pc.is_valid(flat).to_numpy(zero_copy_only=False)
        flat = A.as_array(flat.filter(pa.array(keep)))
        rows = rows_all[keep]
        vtype = arr.type.value_type
        if len(flat) == 0:
            counts = np.zeros(n, np.int64)
            offsets = pa.array(np.concatenate([[0], np.cumsum(counts)]),
                               pa.int32())
            return pa.ListArray.from_arrays(
                offsets, pa.array([], vtype),
                mask=pa.array(row_null))
        d = pc.dictionary_encode(flat)
        codes = pc.fill_null(d.indices, 0).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uniq = d.dictionary
        order_u = pc.sort_indices(uniq).to_numpy(zero_copy_only=False)
        rank = np.empty(len(uniq), np.int64)
        rank[order_u] = np.arange(len(uniq), dtype=np.int64)
        key = rank[codes]
        order = np.lexsort((key, rows))
        rr, kk = rows[order], key[order]
        first = np.ones(len(order), bool)
        first[1:] = (rr[1:] != rr[:-1]) | (kk[1:] != kk[:-1])
        counts = np.bincount(rr[first], minlength=n).astype(np.int64)
        offsets = pa.array(np.concatenate([[0], np.cumsum(counts)]), pa.int32())
        values = A.as_array(flat.take(pa.array(order[first])))
        return pa.ListArray.from_arrays(offsets, values,
                                        mask=pa.array(row_null))


class ArraySetOpTransformer(Transformer):
    """Row-wise set algebra between TWO list columns — per-row sorted
    distinct ``intersect`` / ``union`` / ``except`` (A minus B), the
    token-set counterpart of the EXCEPT/INTERSECT relational ops (and
    ``rowwise_jaccard``'s constructive sibling: it returns the sets, not
    just their sizes). Null ELEMENTS are dropped; the output row is null
    when EITHER input row is null (DuckDB list-function null semantics,
    mirrored by the oracle's ``list_sort(list_distinct(list_intersect(..)))``
    family).

    Vectorized kernel (no per-row loop): both flats concatenate under a
    source tag, ONE dictionary-encode + rank remap, ONE (row, rank, src)
    lexsort; per-(row, value) presence bits fold via boundary scans and the
    keep rule is a mask — then one ListArray rebuild."""

    compatible_dtypes = None

    def __init__(self, *args, op: str, **kwargs):
        super().__init__(*args, **kwargs)
        if op not in ("intersect", "union", "except"):
            raise ValueError("op must be intersect | union | except")
        if not self.input_cols or len(self.input_cols) != 2:
            raise ValueError("ArraySetOp needs input_cols with exactly 2 columns")
        self.op = op

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        la = A.as_array(batch.column(self.input_cols[0]))
        lb = A.as_array(batch.column(self.input_cols[1]))
        for arr in (la, lb):
            if not pa.types.is_list(arr.type) and not pa.types.is_large_list(arr.type):
                raise TypeError("ArraySetOp needs list columns")
        n = len(la)
        row_null = (~pc.is_valid(la).to_numpy(zero_copy_only=False)) | \
            (~pc.is_valid(lb).to_numpy(zero_copy_only=False))
        vtype = la.type.value_type

        def flat_rows(arr):
            lens = pc.fill_null(pc.list_value_length(arr), 0) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            flat = A.as_array(pc.list_flatten(arr))
            rows = np.repeat(np.arange(n, dtype=np.int64), lens)
            keep = pc.is_valid(flat).to_numpy(zero_copy_only=False)
            return A.as_array(flat.filter(pa.array(keep))), rows[keep]

        fa, ra = flat_rows(la)
        fb, rb = flat_rows(lb)
        flat = pa.concat_arrays([fa, pc.cast(fb, fa.type, safe=False)])
        rows = np.concatenate([ra, rb])
        src = np.concatenate([np.zeros(len(ra), np.int8),
                              np.ones(len(rb), np.int8)])
        if len(flat) == 0:
            counts = np.zeros(n, np.int64)
            offsets = pa.array(np.concatenate([[0], np.cumsum(counts)]), pa.int32())
            return _append_or_replace(
                batch, self.output_col,
                pa.ListArray.from_arrays(offsets, pa.array([], vtype),
                                         mask=pa.array(row_null)))
        d = pc.dictionary_encode(flat)
        codes = pc.fill_null(d.indices, 0).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uniq = d.dictionary
        order_u = pc.sort_indices(uniq).to_numpy(zero_copy_only=False)
        rank = np.empty(len(uniq), np.int64)
        rank[order_u] = np.arange(len(uniq), dtype=np.int64)
        key = rank[codes]
        order = np.lexsort((src, key, rows))
        rr, kk, ss = rows[order], key[order], src[order]
        first = np.ones(len(order), bool)
        first[1:] = (rr[1:] != rr[:-1]) | (kk[1:] != kk[:-1])
        gid = np.cumsum(first) - 1   # dense (row, value) group ids
        in_a = np.zeros(gid[-1] + 1, bool)
        in_b = np.zeros(gid[-1] + 1, bool)
        in_a[gid[ss == 0]] = True
        in_b[gid[ss == 1]] = True
        if self.op == "intersect":
            keep_g = in_a & in_b
        elif self.op == "union":
            keep_g = in_a | in_b
        else:
            keep_g = in_a & ~in_b
        keep = first & keep_g[gid]
        counts = np.bincount(rr[keep], minlength=n).astype(np.int64)
        offsets = pa.array(np.concatenate([[0], np.cumsum(counts)]), pa.int32())
        values = A.as_array(flat.take(pa.array(order[keep])))
        return _append_or_replace(
            batch, self.output_col,
            pa.ListArray.from_arrays(offsets, values, mask=pa.array(row_null)))
