"""Distributed dense linear algebra over embedding columns: Gram/covariance
moments and PCA projection.

No reference analog (kamae has no matrix estimators); the scale shape is the
canonical one for covariance at any data size: each block contributes the
partial (n, Σx, XᵀX) — O(d²) floats regardless of rows — and the driver
merges |blocks| tiny partials. The eigendecomposition is O(d³) on the
driver, independent of the dataset.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kamae_ray.base import Estimator, Transformer, _append_or_replace
from kamae_ray.functions import arrays as A


def gram_moments(ds, col: str) -> dict:
    """One streaming pass -> {count, sum (d,), sxx (d, d)} of a fixed-width
    ``list<numeric>`` column in float64. Rows with null vectors are skipped;
    the merge is canonically ordered so repeated runs are bit-identical."""

    def partial(block: pa.Table) -> pa.Table:
        arr = A.as_array(block.column(col))
        valid = pc.is_valid(arr)
        if not pc.all(valid).as_py():
            block = block.filter(valid)
            arr = A.as_array(block.column(col))
        m, d = A.matrix_view(arr)
        m = m.astype(np.float64, copy=False)
        return pa.table({
            "n": pa.array([m.shape[0]], pa.int64()),
            "s": pa.array([m.sum(axis=0).tolist()], pa.list_(pa.float64())),
            "sxx": pa.array([(m.T @ m).reshape(-1).tolist()], pa.list_(pa.float64())),
            "d": pa.array([d], pa.int64()),
        })

    partial.__name__ = "gram_partial"
    if isinstance(ds, pa.Table):
        rows = partial(ds).to_pylist()
    else:
        # scan-level projection (lesson 25: select_columns does NOT prune
        # the parquet read — narrow_read re-issues a columns= scan)
        from kamae_ray.state.aggregators import _project

        proj = _project(ds, [col])
        rows = proj.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ).take_all()
        rows = sorted(rows, key=lambda r: (r["n"], r["s"]))  # order-insensitive float merge
    rows = [r for r in rows if r["n"]]
    if not rows:
        return {"count": 0, "sum": None, "sxx": None}
    d = rows[0]["d"]
    n = 0
    s = np.zeros(d)
    sxx = np.zeros((d, d))
    for r in rows:
        if r["d"] != d:
            raise ValueError(f"column {col!r}: mixed vector widths {d} vs {r['d']}")
        n += r["n"]
        s += np.asarray(r["s"])
        sxx += np.asarray(r["sxx"]).reshape(d, d)
    return {"count": n, "sum": s, "sxx": sxx}


def covariance_table(ds, col: str) -> pa.Table:
    """Population covariance matrix of the vector column as (i, j, cov) rows
    for i <= j, 1-based (matching SQL list indexing) —
    ``cov = E[x_i x_j] - E[x_i] E[x_j]`` (DuckDB ``covar_pop``)."""
    g = gram_moments(ds, col)
    if g["count"] == 0:
        return pa.table({"i": pa.array([], pa.int64()), "j": pa.array([], pa.int64()),
                         "cov": pa.array([], pa.float64())})
    n = float(g["count"])
    mean = g["sum"] / n
    cov = g["sxx"] / n - np.outer(mean, mean)
    d = len(mean)
    iu = np.triu_indices(d)
    return pa.table({
        "i": pa.array((iu[0] + 1).astype(np.int64)),
        "j": pa.array((iu[1] + 1).astype(np.int64)),
        "cov": pa.array(cov[iu]),
    })


class PCAProjectTransformer(Transformer):
    """Project a vector column onto fitted principal components:
    ``out = (x - mean) @ components.T`` — output is a
    ``list<float64>`` of length n_components."""

    def __init__(self, *args, mean, components, **kwargs):
        super().__init__(*args, **kwargs)
        self.mean = np.asarray(mean, dtype=np.float64)
        self.components = np.asarray(components, dtype=np.float64)  # (k, d)

    @property
    def state_size_hint(self) -> int:
        return int(self.components.size + self.mean.size)

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        arr = A.as_array(batch.column(self.input_col))
        m, d = A.matrix_view(arr)
        if d != self.mean.shape[0]:
            raise ValueError(f"vector width {d} != fitted width {self.mean.shape[0]}")
        proj = (m.astype(np.float64, copy=False) - self.mean) @ self.components.T
        k = proj.shape[1]
        out = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (len(m) + 1) * k, k, dtype=np.int32)),
            pa.array(proj.reshape(-1)),
        )
        return _append_or_replace(batch, self.output_col, out)


class PCAProjectEstimator(Estimator):
    """Fit PCA via the distributed Gram pass (one streaming aggregation,
    O(d²) driver state) + an O(d³) driver ``eigh``. Components are ordered
    by descending eigenvalue; each component's sign is normalized so its
    largest-|coefficient| entry is positive (eigh sign is otherwise
    arbitrary)."""

    def __init__(self, *args, n_components: int, **kwargs):
        super().__init__(*args, **kwargs)
        if n_components < 1:
            raise ValueError("n_components must be >= 1")
        self.n_components = n_components

    def fit(self, ds) -> PCAProjectTransformer:
        ds = self._maybe_sample(ds)
        g = gram_moments(ds, self.input_col)
        if g["count"] == 0:
            raise ValueError(f"column {self.input_col!r} has no vectors to fit PCA on")
        n = float(g["count"])
        mean = g["sum"] / n
        cov = g["sxx"] / n - np.outer(mean, mean)
        w, v = np.linalg.eigh(cov)  # ascending eigenvalues
        order = np.argsort(w)[::-1][: self.n_components]
        comps = v[:, order].T  # (k, d)
        flip = np.sign(comps[np.arange(len(comps)), np.abs(comps).argmax(axis=1)])
        comps = comps * np.where(flip == 0, 1.0, flip)[:, None]
        return PCAProjectTransformer(
            input_col=self.input_col,
            output_col=self.output_col,
            input_dtype=self.input_dtype,
            output_dtype=self.output_dtype,
            layer_name=self.layer_name,
            mean=mean,
            components=comps,
        )


def default_linear_weights(dim: int, seed: int = 1) -> tuple[np.ndarray, int]:
    """Deterministic data-independent weight vector + bias for
    ``LinearScoreTransformer`` demos/oracles: Knuth-multiplicative spread
    over [-2048, 2048). Shared by the engine and the generated SQL (the
    q_linear_score oracle inlines these as literals)."""
    i = np.arange(1, dim + 1, dtype=np.int64)
    w = ((i * np.int64(2654435761) * np.int64(seed)) % np.int64(4096)) - np.int64(2048)
    return w, 12345


class LinearScoreTransformer(Transformer):
    """Batched linear-model inference over a vector column — the
    fasttext-style quality-classifier scoring stage of LLM data pipelines
    (score each document embedding with fixed weights, filter on a
    threshold downstream).

    INTEGER fixed-point contract (lesson-24 family: no cross-engine float
    recurrences): each coordinate is quantized ``floor(x * 2^scale_bits)``
    (exact IEEE multiply + floor, bit-identical in numpy and SQL) and the
    logit is the exact int64 dot product with integer weights plus an
    integer bias — so the score is hash-certifiable. |w| < 2^11, |x_q| ~
    2^scale_bits, so dim * 2^(11+scale_bits) must stay below 2^63 (guarded).

    Weights ride the closure (tiny state; plain-task ``map_batches`` beats
    an actor pool for <64 MB state — build note lesson 29)."""

    def __init__(self, *args, weights, bias: int = 0, scale_bits: int = 20, **kwargs):
        super().__init__(*args, **kwargs)
        self.weights = np.asarray(weights, dtype=np.int64)
        self.bias = int(bias)
        self.scale_bits = int(scale_bits)
        maxw = int(np.abs(self.weights).max()) if self.weights.size else 0
        if maxw * len(self.weights) * (1 << (self.scale_bits + 2)) >= (1 << 62):
            raise ValueError("weights/scale_bits risk int64 overflow")

    @property
    def state_size_hint(self) -> int:
        return int(self.weights.size)

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        arr = A.as_array(batch.column(self.input_col))
        m, d = A.matrix_view(arr)
        if d != self.weights.shape[0]:
            raise ValueError(f"vector width {d} != weight width {self.weights.shape[0]}")
        scale = float(1 << self.scale_bits)
        xq = np.floor(m.astype(np.float64, copy=False) * scale).astype(np.int64)
        logit = xq @ self.weights + np.int64(self.bias)
        return _append_or_replace(batch, self.output_col, pa.array(logit, pa.int64()))


def linear_score_oracle_sql(
    table: str,
    id_col: str,
    emb_col: str,
    weights: np.ndarray,
    bias: int,
    scale_bits: int = 20,
    min_logit: int | None = None,
) -> str:
    """GENERATED DuckDB oracle for ``LinearScoreTransformer`` — weight
    literals inlined, quantization mirrored (floor of an exact double
    multiply)."""
    wlist = ", ".join(str(int(w)) for w in np.asarray(weights, dtype=np.int64))
    scale = repr(float(1 << scale_bits))
    n = len(weights)
    where = f" WHERE logit >= {int(min_logit)}" if min_logit is not None else ""
    return (
        f"WITH s AS (SELECT {id_col}, CAST(CAST({int(bias)} AS BIGINT) + list_sum("
        f"list_transform(range(1, {n + 1}), i -> "
        f"CAST(floor({emb_col}[CAST(i AS BIGINT)]::DOUBLE * {scale}) AS BIGINT) "
        f"* ([{wlist}])[CAST(i AS BIGINT)])) AS BIGINT) AS logit FROM {table}) "
        f"SELECT {id_col}, logit FROM s{where}"
    )


def groupby_vector_mean(
    ds,
    key: str,
    vec_col: str,
    scale_bits: int | None = 20,
    max_partial_rows: int = 2_000_000,
):
    """Per-group element-wise mean of a fixed-width vector column — class
    centroids / prototype embeddings (the grouped-VECTOR aggregate
    ``groupby_agg`` doesn't cover).

    Plan: each block contributes one (key, n, Σvec) partial per in-block
    distinct key (segmented ``np.add.reduceat`` after an in-block sort — no
    per-group Python), then the driver folds O(blocks × in-block keys)
    partials (centroid tables are small by definition; guarded by
    ``max_partial_rows``). Null vectors are skipped; null keys form their
    own group (SQL GROUP BY semantics).

    ``scale_bits`` set (default): coordinates quantize to
    ``floor(x * 2^scale_bits)`` int64 and the mean is
    ``(int_sum / n) / 2^scale_bits`` — two exact-rounded double divisions of
    integer-derived values, bit-identical cross-engine (the lesson-24
    fixed-point family; see ``vector_mean_oracle_sql``). ``scale_bits=None``
    keeps float64 partial sums (canonically ordered for run-to-run
    determinism, but subject to fp merge-order vs other engines).

    Returns ``(key, n, centroid list<double>)`` sorted by key."""
    from kamae_ray.functions import segments as S

    def partial(block: pa.Table) -> pa.Table:
        arr = A.as_array(block.column(vec_col))
        valid = pc.is_valid(arr)
        if not pc.all(valid).as_py():
            block = block.filter(valid)
            arr = A.as_array(block.column(vec_col))
        kt = block.column(key)
        empty = pa.table({
            key: A.as_array(kt).slice(0, 0), "n": pa.array([], pa.int64()),
            "s": pa.array([], pa.list_(pa.float64())),
        })
        if block.num_rows == 0:
            return empty
        m, d = A.matrix_view(arr)
        if scale_bits is not None:
            x = np.floor(m.astype(np.float64, copy=False) * float(1 << scale_bits)).astype(np.int64)
        else:
            x = m.astype(np.float64, copy=False)
        gids = S.group_ids(block, [key])
        order = np.argsort(gids, kind="stable")
        starts, lens = S.segments(gids[order])
        sums = np.add.reduceat(x[order], starts, axis=0)
        if len(starts) == 1:  # reduceat quirk-proof: single segment is fine
            sums = sums.reshape(1, -1)
        firsts = order[starts]
        return pa.table({
            key: A.as_array(kt).take(pa.array(firsts)),
            "n": pa.array(lens.astype(np.int64)),
            "s": pa.array([row.tolist() for row in sums.astype(np.float64)],
                          pa.list_(pa.float64())),
        })

    partial.__name__ = "vector_mean_partial"
    if isinstance(ds, pa.Table):
        parts = partial(ds)
    else:
        proj = ds
        try:
            proj = ds.select_columns([key, vec_col])
        except Exception:
            pass
        from kamae_ray.base import collect_tables

        tbls = [t for t in collect_tables(
            proj.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                             batch_size=None)) if t.num_rows]
        if not tbls:
            parts = None
        else:
            parts = pa.concat_tables(tbls)
    if parts is None or parts.num_rows == 0:
        return pa.table({key: pa.array([]), "n": pa.array([], pa.int64()),
                         "centroid": pa.array([], pa.list_(pa.float64()))})
    if parts.num_rows > max_partial_rows:
        raise ValueError(
            f"groupby_vector_mean: {parts.num_rows} partial rows > "
            f"max_partial_rows={max_partial_rows}; too many groups for the "
            "driver fold — pre-bucket the key or raise the budget")
    darr = A.as_array(parts.column(key)).dictionary_encode()
    # dictionary codes follow first-appearance order — remap to the
    # dictionary's own sort order so group ids are content-determined
    nd = len(darr.dictionary)
    idx = pc.fill_null(pc.cast(darr.indices, pa.int64()), -1).to_numpy(zero_copy_only=False)
    if nd == 0:  # every key null: one all-null group
        gids = np.full(len(idx), -1, dtype=np.int64)
    else:
        rank = np.empty(nd, dtype=np.int64)
        rank[np.argsort(np.asarray(darr.dictionary.to_pylist(), dtype=object), kind="stable")] = np.arange(nd)
        gids = np.where(idx >= 0, rank[idx.clip(min=0)], np.int64(-1))
    d = len(parts.column("s")[0])
    smat = np.asarray(parts.column("s").to_pylist(), dtype=np.float64).reshape(-1, d)
    if scale_bits is not None:
        smat = smat.astype(np.int64)
    npart = parts.column("n").to_numpy(zero_copy_only=False)
    # canonical fold order (key, n, s lex) so the float-mode merge is
    # run-to-run deterministic regardless of block completion order
    order = np.lexsort(tuple(smat[:, j] for j in reversed(range(d))) + (npart, gids))
    starts, lens = S.segments(gids[order])
    sums = np.add.reduceat(smat[order], starts, axis=0)
    if len(starts) == 1:
        sums = sums.reshape(1, -1)
    ns = np.add.reduceat(parts.column("n").to_numpy(zero_copy_only=False)[order], starts)
    if np.ndim(ns) == 0:
        ns = np.asarray([ns])
    mean = sums.astype(np.float64) / ns.astype(np.float64)[:, None]
    if scale_bits is not None:
        mean = mean / float(1 << scale_bits)
    firsts = order[starts]
    kvals = A.as_array(parts.column(key)).take(pa.array(firsts))
    out = pa.table({
        key: kvals,
        "n": pa.array(ns.astype(np.int64)),
        "centroid": pa.array([row.tolist() for row in mean], pa.list_(pa.float64())),
    })
    return out.sort_by([(key, "ascending")])


def vector_mean_oracle_sql(
    table: str,
    key: str,
    vec_col: str,
    dim: int,
    scale_bits: int = 20,
) -> str:
    """GENERATED DuckDB oracle for ``groupby_vector_mean`` in fixed-point
    mode: integer sums per (key, position), then the same two exact double
    divisions, array_agg'd in position order."""
    scale = repr(float(1 << scale_bits))
    return (
        f"WITH q AS (SELECT {key}, g.i, "
        f"SUM(CAST(floor({vec_col}[g.i]::DOUBLE * {scale}) AS BIGINT)) AS s, "
        f"COUNT(*)::BIGINT AS n FROM {table}, "
        f"LATERAL (SELECT unnest(range(1, {dim + 1})) AS i) g "
        f"WHERE {vec_col} IS NOT NULL GROUP BY {key}, g.i) "
        f"SELECT {key}, CAST(max(n) AS BIGINT) AS n, "
        f"array_agg((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / {scale} ORDER BY i) AS centroid "
        f"FROM q GROUP BY {key} ORDER BY {key}"
    )


def grouped_ols2(ds, group_cols, x1_col: str, x2_col: str, y_col: str):
    """Per-group ordinary least squares with TWO integer features and an
    intercept: ``y ~ b0 + b1*x1 + b2*x2`` solved in closed form by Cramer's
    rule over the group's EXACT int64 moment matrix (n, Sx1, Sx2, Sx11,
    Sx12, Sx22, Sy, Sx1y, Sx2y — all guarded < 2^53 so they ride the
    float64 agg path losslessly). The 3x3 determinants are ONE fixed
    IEEE expression over those exact integers — identical bits on any
    engine that mirrors the expression tree (the groupby_skew_kurt
    family); singular groups (det == 0) yield null betas. Output:
    group cols, ``n, b0, b1, b2``.

    Scale plan: one partial-agg exchange (nine int sums per group), O(1)
    finish per group — no driver state, no second pass."""
    from kamae_ray.stages.aggregate import groupby_agg

    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)

    def prep(t: pa.Table) -> pa.Table:
        x1 = pc.cast(A.as_array(t.column(x1_col)), pa.int64(), safe=False)
        x2 = pc.cast(A.as_array(t.column(x2_col)), pa.int64(), safe=False)
        y = pc.cast(A.as_array(t.column(y_col)), pa.int64(), safe=False)
        ok = pc.and_(pc.and_(pc.is_valid(x1), pc.is_valid(x2)), pc.is_valid(y))
        cols = {k: t.column(k) for k in group_cols}
        x1n = x1.to_numpy(zero_copy_only=False)
        x2n = x2.to_numpy(zero_copy_only=False)
        yn = y.to_numpy(zero_copy_only=False)
        cols.update({
            "__one": pa.array(np.ones(t.num_rows, np.int64)),
            "__x1": x1, "__x2": x2, "__y": y,
            "__x11": pa.array(x1n * x1n, pa.int64()),
            "__x12": pa.array(x1n * x2n, pa.int64()),
            "__x22": pa.array(x2n * x2n, pa.int64()),
            "__x1y": pa.array(x1n * yn, pa.int64()),
            "__x2y": pa.array(x2n * yn, pa.int64()),
        })
        return pa.table(cols).filter(ok)

    prep.__name__ = "ols2_prep"
    aggs = {c: ["sum"] for c in
            ("__one", "__x1", "__x2", "__y", "__x11", "__x12", "__x22",
             "__x1y", "__x2y")}
    if isinstance(ds, pa.Table):
        agg = groupby_agg(prep(ds), group_cols, aggs)
    else:
        keyed = ds.map_batches(prep, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=None)
        agg = groupby_agg(keyed, group_cols, aggs)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            out = {k: t.column(k) for k in group_cols}
            out.update({"n": pa.array([], pa.int64()),
                        "b0": pa.array([], pa.float64()),
                        "b1": pa.array([], pa.float64()),
                        "b2": pa.array([], pa.float64())})
            return pa.table(out)
        g = {c: t.column(f"{c}_sum").to_numpy(zero_copy_only=False)
             for c in ("__one", "__x1", "__x2", "__y", "__x11", "__x12",
                       "__x22", "__x1y", "__x2y")}
        for c, v in g.items():
            if np.abs(v).max(initial=0) >= (1 << 53):
                raise ValueError(f"grouped_ols2: sum of {c} exceeds 2^53 — "
                                 "shrink feature/target units")
        n = g["__one"]; a = g["__x1"]; b = g["__x2"]
        c_ = g["__x11"]; d = g["__x12"]; e = g["__x22"]
        p = g["__y"]; q = g["__x1y"]; r2 = g["__x2y"]
        det = n * (c_ * e - d * d) - a * (a * e - d * b) + b * (a * d - c_ * b)
        det0 = p * (c_ * e - d * d) - a * (q * e - d * r2) + b * (q * d - c_ * r2)
        det1 = n * (q * e - d * r2) - p * (a * e - d * b) + b * (a * r2 - q * b)
        det2 = n * (c_ * r2 - q * d) - a * (a * r2 - q * b) + p * (a * d - c_ * b)
        sing = det == 0.0
        safe = np.where(sing, 1.0, det)
        b0 = det0 / safe
        b1 = det1 / safe
        b2 = det2 / safe
        mask = ~sing
        out = {k: t.column(k) for k in group_cols}
        out["n"] = pa.array(n.astype(np.int64), pa.int64())
        out["b0"] = pa.array(np.where(mask, b0, 0.0), pa.float64(),
                             mask=~mask if sing.any() else None)
        out["b1"] = pa.array(np.where(mask, b1, 0.0), pa.float64(),
                             mask=~mask if sing.any() else None)
        out["b2"] = pa.array(np.where(mask, b2, 0.0), pa.float64(),
                             mask=~mask if sing.any() else None)
        return pa.table(out)

    finish.__name__ = "ols2_finish"
    if isinstance(agg, pa.Table):
        return finish(agg)
    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)


def grouped_ols2_oracle_sql(table_expr: str, group_cols, x1_expr: str,
                            x2_expr: str, y_expr: str) -> str:
    """DuckDB mirror of :func:`grouped_ols2`: the same exact-int moment
    sums and the same fixed Cramer expression tree (every product of two
    moments runs in float64 on both engines)."""
    gcols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    gsel = ", ".join(gcols)
    return (
        f"WITH __b AS (SELECT {gsel}, {x1_expr} AS x1, {x2_expr} AS x2, "
        f"{y_expr} AS y FROM {table_expr} WHERE {x1_expr} IS NOT NULL AND "
        f"{x2_expr} IS NOT NULL AND {y_expr} IS NOT NULL), "
        f"__m AS (SELECT {gsel}, CAST(count(*) AS DOUBLE) AS n, "
        "CAST(SUM(x1) AS DOUBLE) AS a, CAST(SUM(x2) AS DOUBLE) AS b, "
        "CAST(SUM(y) AS DOUBLE) AS p, CAST(SUM(x1 * x1) AS DOUBLE) AS c, "
        "CAST(SUM(x1 * x2) AS DOUBLE) AS d, CAST(SUM(x2 * x2) AS DOUBLE) AS e, "
        "CAST(SUM(x1 * y) AS DOUBLE) AS q, CAST(SUM(x2 * y) AS DOUBLE) AS r2 "
        f"FROM __b GROUP BY {gsel}), "
        f"__d AS (SELECT {gsel}, n, a, b, p, c, d, e, q, r2, "
        "n * (c * e - d * d) - a * (a * e - d * b) + b * (a * d - c * b) AS det "
        "FROM __m) "
        f"SELECT {gsel}, CAST(n AS BIGINT) AS n, "
        "(p * (c * e - d * d) - a * (q * e - d * r2) + b * (q * d - c * r2)) "
        "/ NULLIF(det, 0) AS b0, "
        "(n * (q * e - d * r2) - p * (a * e - d * b) + b * (a * r2 - q * b)) "
        "/ NULLIF(det, 0) AS b1, "
        "(n * (c * r2 - q * d) - a * (a * r2 - q * b) + p * (a * d - c * b)) "
        "/ NULLIF(det, 0) AS b2 "
        "FROM __d"
    )
