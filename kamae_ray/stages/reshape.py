"""Row-reshaping operators: explode (SQL UNNEST / Spark explode) and pivot
(wide conditional aggregation). The reference delegates both to Spark
(``F.explode`` / ``df.groupBy().pivot()``); these are the scale-correct Ray
Data equivalents.

- ``explode`` is embarrassingly parallel: ONE ``map_batches`` stage, the
  kernel is offsets arithmetic + one ``take`` per block — no shuffle, no
  per-row Python.
- ``pivot`` lowers to the existing partial-agg machinery: a block-local
  widen (one masked column per pivot value) feeds ``groupby_agg``, so the
  shuffle carries only per-block partial rows (keys x 1 row per block), the
  same plan SQL engines use for ``SUM(CASE WHEN ...)`` pivots.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kamae_ray.functions import arrays as A


def _explode_block(
    block: pa.Table, col: str, pos_col: str | None, keep_empty: bool
) -> pa.Table:
    arr = A.as_array(block.column(col))
    n = len(arr)
    if n == 0:
        cols = {}
        for c in block.column_names:
            if c == col:
                cols[c] = pa.array([], arr.type.value_type)
            else:
                cols[c] = block.column(c)
        if pos_col:
            cols[pos_col] = pa.array([], pa.int64())
        return pa.table(cols)
    lens = pc.list_value_length(arr)
    lens_np = pc.fill_null(lens, 0).to_numpy(zero_copy_only=False).astype(np.int64)
    values = pc.list_flatten(arr)  # null/empty lists contribute nothing
    parent = np.repeat(np.arange(n, dtype=np.int64), lens_np)
    pos = np.arange(len(parent), dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(lens_np)[:-1]]), lens_np
    )
    cols = {}
    parent_arr = pa.array(parent)
    for c in block.column_names:
        if c == col:
            cols[c] = values
        else:
            cols[c] = block.column(c).take(parent_arr)
    if pos_col:
        cols[pos_col] = pa.array(pos)
    out = pa.table(cols)
    if keep_empty:
        empty = np.flatnonzero(lens_np == 0)
        if len(empty):
            e_arr = pa.array(empty)
            ecols = {}
            for c in block.column_names:
                if c == col:
                    ecols[c] = pa.nulls(len(empty), values.type)
                else:
                    ecols[c] = block.column(c).take(e_arr)
            if pos_col:
                ecols[pos_col] = pa.nulls(len(empty), pa.int64())
            out = pa.concat_tables([out, pa.table(ecols)])
    return out


def explode(ds, col: str, pos_col: str | None = None, keep_empty: bool = False):
    """SQL ``UNNEST`` / Spark ``explode``: one output row per element of the
    list column ``col``; the element replaces the list in place, all other
    columns repeat. ``pos_col`` adds the 0-based position within the source
    list (``WITH ORDINALITY``). Null/empty lists emit no rows (SQL UNNEST) —
    ``keep_empty=True`` switches to ``explode_outer`` semantics (one row with
    a null element/position).

    Scale: stateless per-block kernel (offsets arithmetic + one ``take``),
    no shuffle; output blocks grow by the mean list length, so Ray's
    streaming executor re-slices them downstream as needed."""
    if isinstance(ds, pa.Table):
        return _explode_block(ds, col, pos_col, keep_empty)

    def fn(batch: pa.Table) -> pa.Table:
        return _explode_block(batch, col, pos_col, keep_empty)

    fn.__name__ = f"explode_{col}"
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def pivot(
    ds,
    keys: str | list[str],
    pivot_col: str,
    value_col: str,
    values: list | None = None,
    agg: str = "sum",
    prefix: str | None = None,
):
    """Wide conditional aggregation (Spark ``groupBy(keys).pivot(col).agg``,
    SQL ``agg(CASE WHEN pivot = v THEN value END) AS v_agg GROUP BY keys``):
    one output row per key tuple, one ``{prefix}{v}_{agg}`` column per pivot
    value.

    ``values`` (the output width) must be a SMALL list; when omitted it is
    discovered with one distinct pass over ``pivot_col`` (bounded at 1000 —
    an unbounded pivot width is a schema explosion, not a dataset).

    Scale plan: the widen step is block-local (one ``pc.if_else`` mask per
    pivot value); the heavy lifting is ``groupby_agg``'s partial-agg plan,
    so the shuffle carries one partial row per (block, key), never raw rows."""
    from kamae_ray.stages.aggregate import distinct, groupby_agg

    keys = [keys] if isinstance(keys, str) else list(keys)
    prefix = f"{value_col}_" if prefix is None else prefix
    if values is None:
        d = distinct(ds, pivot_col)
        if not isinstance(d, pa.Table):
            # limit BEFORE take_all so a high-cardinality pivot_col never
            # materializes more than 1001 distinct values on the driver —
            # the width guard then fires off the truncated count
            d = pa.Table.from_pylist(d.limit(1001).take_all())
        if d.num_rows > 1000:
            raise ValueError(
                f"pivot over >1000 distinct values of {pivot_col!r} — "
                "pass an explicit `values` list to pivot that wide"
            )
        col = d.column(pivot_col)
        values = sorted(v for v in col.to_pylist() if v is not None)
    wide_cols = [f"{prefix}{v}" for v in values]

    def widen(batch: pa.Table) -> pa.Table:
        pcol = A.as_array(batch.column(pivot_col))
        vcol = A.as_array(batch.column(value_col))
        cols = {k: batch.column(k) for k in keys}
        for v, name in zip(values, wide_cols):
            m = pc.equal(pcol, v)  # null pivot -> null mask -> null value
            cols[name] = pc.if_else(m, vcol, pa.nulls(len(vcol), vcol.type))
        return pa.table(cols)

    widen.__name__ = f"pivot_widen_{pivot_col}"
    if isinstance(ds, pa.Table):
        wide = widen(ds)
    else:
        wide = ds.map_batches(widen, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    return groupby_agg(wide, keys, {c: [agg] for c in wide_cols})


def melt(
    ds,
    id_cols: str | list[str],
    value_cols: list[str],
    var_col: str = "variable",
    value_col: str = "value",
    cast_to: pa.DataType | None = None,
):
    """Wide -> long (SQL UNPIVOT / pandas melt): one output row per
    (input row, value column), with the column name in ``var_col`` and its
    value in ``value_col``.

    Value columns must share a type (SQL union compatibility); mixed numeric
    types promote to float64, otherwise pass ``cast_to`` explicitly.

    Scale: stateless block-local kernel — k column selects + one concat per
    block, no shuffle, no per-row Python."""
    id_cols = [id_cols] if isinstance(id_cols, str) else list(id_cols)
    if not value_cols:
        raise ValueError("value_cols must be non-empty")

    def _target_type(types: list[pa.DataType]) -> pa.DataType:
        if cast_to is not None:
            return cast_to
        if len(set(types)) == 1:
            return types[0]
        import pyarrow.types as pt

        if all(pt.is_integer(t) or pt.is_floating(t) for t in types):
            return pa.float64()
        raise ValueError(
            f"value columns mix non-numeric types {types}; pass cast_to"
        )

    def unpivot(batch: pa.Table) -> pa.Table:
        target = _target_type([batch.schema.field(c).type for c in value_cols])
        parts = []
        for c in value_cols:
            cols = {k: batch.column(k) for k in id_cols}
            cols[var_col] = pa.array([c] * batch.num_rows, pa.string())
            cols[value_col] = pc.cast(batch.column(c), target, safe=False)
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    unpivot.__name__ = f"melt_{value_col}"
    if isinstance(ds, pa.Table):
        return unpivot(ds)
    return ds.map_batches(unpivot, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def chunk_text(ds, id_cols, text_col: str, chunk_size: int, overlap: int = 0,
               out_col: str = "chunk_text", idx_col: str = "chunk_idx"):
    """RAG-style document chunking: split ``text_col`` into fixed-size
    character windows with ``overlap`` shared characters between consecutive
    chunks. Output: id columns + ``idx_col`` (0-based) + ``out_col``.

    Chunk count per doc uses the exact integer form
    ``1 + ceil(max(len - chunk_size, 0) / stride)`` with
    ``stride = chunk_size - overlap`` (every doc gets >= 1 chunk; the last
    chunk may be short); SQL parity:
    ``substr(text, k*stride + 1, chunk_size)`` for ``k < n_chunks``.
    Null text emits no chunks (SQL lateral-join semantics).

    Scale plan: stateless flat fan-out (explode family) — ONE map_batches,
    no shuffle; the kernel loops over CHUNK ORDINALS (bounded by the longest
    doc in the block), each iteration one vectorized utf8 slice over the
    rows that still have a k-th chunk — never a per-row Python loop."""
    id_cols = [id_cols] if isinstance(id_cols, str) else list(id_cols)
    chunk_size = int(chunk_size)
    overlap = int(overlap)
    stride = chunk_size - overlap
    if chunk_size <= 0 or not 0 <= overlap < chunk_size:
        raise ValueError("need chunk_size > 0 and 0 <= overlap < chunk_size")

    def kernel(block: pa.Table) -> pa.Table:
        text = A.as_array(block.column(text_col))
        lens = pc.fill_null(pc.utf8_length(text), -1).to_numpy(zero_copy_only=False).astype(np.int64)
        n_chunks = np.where(
            lens < 0, 0,
            1 + (np.maximum(lens - chunk_size, 0) + stride - 1) // stride,
        )
        empty = {c: block.column(c).slice(0, 0) for c in id_cols}
        empty[idx_col] = pa.array([], pa.int64())
        empty[out_col] = pa.array([], pa.string())
        if block.num_rows == 0 or int(n_chunks.max(initial=0)) == 0:
            return pa.table(empty)
        parts = []
        for k in range(int(n_chunks.max())):
            sel = np.nonzero(n_chunks > k)[0]
            sub = text.take(pa.array(sel))
            sliced = pc.utf8_slice_codeunits(sub, start=k * stride,
                                             stop=k * stride + chunk_size)
            cols = {c: A.as_array(block.column(c)).take(pa.array(sel)) for c in id_cols}
            cols[idx_col] = pa.array(np.full(len(sel), k, np.int64))
            cols[out_col] = sliced
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    kernel.__name__ = f"chunk_{text_col}"
    if isinstance(ds, pa.Table):
        return kernel(ds)
    proj = ds
    try:
        proj = ds.select_columns(list(dict.fromkeys(id_cols + [text_col])))
    except Exception:
        pass
    return proj.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def sliding_windows(ds, id_cols, list_col: str, window: int, stride: int | None = None,
                    out_col: str = "window", idx_col: str = "win_idx"):
    """FULL fixed-length sliding windows over a list column — the LLM
    context-window fan-out (each training sequence yields its
    ``(len - window) // stride + 1`` complete windows; sequences shorter
    than ``window`` yield none). Output: id columns + ``idx_col`` +
    ``out_col`` (list of exactly ``window`` elements).

    SQL parity: ``list[k*stride + 1 : k*stride + window]`` (1-based
    inclusive slice) for ``k < n_win``. Null lists yield no windows.

    Scale plan: stateless flat fan-out, ONE map_batches, no shuffle; the
    kernel is pure offsets arithmetic — one 2-D gather index build
    (windows x window) + one take — no per-row Python, no per-window loop."""
    id_cols = [id_cols] if isinstance(id_cols, str) else list(id_cols)
    window = int(window)
    stride = window if stride is None else int(stride)
    if window <= 0 or stride <= 0:
        raise ValueError("need window > 0 and stride > 0")

    def kernel(block: pa.Table) -> pa.Table:
        arr = A.as_array(block.column(list_col))
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if pa.types.is_large_list(arr.type):
            arr = arr.cast(pa.list_(arr.type.value_type))
        vt = arr.type.value_type
        empty = {c: block.column(c).slice(0, 0) for c in id_cols}
        empty[idx_col] = pa.array([], pa.int64())
        empty[out_col] = pa.array([], pa.list_(vt))
        if block.num_rows == 0:
            return pa.table(empty)
        if arr.offset != 0:
            arr = pa.concat_arrays([arr])
        offs = np.asarray(arr.offsets, dtype=np.int64)
        lens = np.diff(offs)
        valid = arr.is_valid().to_numpy(zero_copy_only=False) if arr.null_count else np.ones(len(lens), bool)
        n_win = np.where(valid & (lens >= window), (lens - window) // stride + 1, 0)
        total = int(n_win.sum())
        if total == 0:
            return pa.table(empty)
        rep = np.repeat(np.arange(len(lens)), n_win)
        win_idx = (np.arange(total, dtype=np.int64)
                   - np.repeat(np.cumsum(n_win) - n_win, n_win))
        starts_flat = offs[:-1][rep] + win_idx * stride
        gather = (starts_flat[:, None] + np.arange(window, dtype=np.int64)).reshape(-1)
        flat = arr.values.take(pa.array(gather))
        out = pa.ListArray.from_arrays(
            pa.array(np.arange(total + 1, dtype=np.int64) * window, pa.int32()), flat
        )
        cols = {c: A.as_array(block.column(c)).take(pa.array(rep)) for c in id_cols}
        cols[idx_col] = pa.array(win_idx)
        cols[out_col] = out
        return pa.table(cols)

    kernel.__name__ = f"windows_{list_col}"
    if isinstance(ds, pa.Table):
        return kernel(ds)
    proj = ds
    try:
        proj = ds.select_columns(list(dict.fromkeys(id_cols + [list_col])))
    except Exception:
        pass
    return proj.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
