"""Scaling / imputation: fitted transformers + estimators, §2.12–2.13.

Reference semantics:
- StandardScale: (x-mean_i)/std_i per innermost position; std==0 -> scale 0;
  mask_value positions pass through (transformers/standard_scale.py:99-135);
  fit = per-position mean + stddev_pop, mask excluded
  (estimators/standard_scale.py:100-163).
- MinMaxScale: (x-min)/(max-min) per position, mask-aware
  (transformers/min_max_scale.py:188, estimators/min_max_scale.py:102-165).
- Impute: replace mask_value/null with fitted mean or exact median
  (transformers/impute.py:160, estimators/impute.py:110-167).
- ConditionalStandardScale / SingleFeatureArrayStandardScale variants
  (estimators/conditional_standard_scale.py:352-605,
  single_feature_array_standard_scale.py:96-156).

Ray design: fit runs the streaming partial-aggregate passes in
kamae_ray/state/aggregators.py (per-block numpy partials + driver merge —
only O(blocks × width) rows reach the driver); the fitted state is a plain
numpy vector that rides the transformer object into ``map_batches`` closures.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kamae_ray.base import Estimator, Transformer, _append_or_replace
from kamae_ray.functions import arrays as A
from kamae_ray.state import aggregators as agg


def _positionwise_apply(arr: pa.Array, fn, out_type=pa.float64()) -> pa.Array:
    """Apply fn(values_matrix_or_flat, position_index_array) over the innermost
    values; works for scalars (width 1) and fixed-width arrays."""
    levels, flat = A.unwrap(arr)
    vals, mask = A.to_numpy(pc.cast(flat, pa.float64(), safe=False))
    vals = vals.astype(np.float64, copy=True)
    if levels:
        # position within the INNERMOST array (per-position stats convention)
        inner_lens = np.diff(levels[-1][0])
        total = int(inner_lens.sum())
        pos = (
            np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(inner_lens) - inner_lens, inner_lens)
            if total
            else np.zeros(0, np.int64)
        )
    else:
        pos = np.zeros(len(vals), dtype=np.int64)
    out = fn(vals, pos)
    res = pa.array(out, out_type, mask=mask)
    return A.rewrap(levels, res)


class StandardScaleTransformer(Transformer):
    """(x - mean_i) / std_i per innermost position; std==0 -> multiply by 0;
    mask positions unchanged. Reference: transformers/standard_scale.py:118-130."""

    compatible_dtypes = (pa.float64(),)

    def __init__(self, *args, mean, stddev, mask_value: float | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.mean = [float(m) if m is not None else float("nan") for m in mean]
        self.stddev = [float(s) if s is not None else float("nan") for s in stddev]
        self.mask_value = mask_value

    def _transform_array(self, arr: pa.Array, batch: pa.Table) -> pa.Array:
        mean = np.asarray(self.mean)
        std = np.asarray(self.stddev)
        inv = np.where(std == 0, 0.0, 1.0 / np.where(std == 0, 1.0, std))

        def fn(vals, pos):
            p = np.minimum(pos, len(mean) - 1)
            out = (vals - mean[p]) * inv[p]
            if self.mask_value is not None:
                out = np.where(vals == self.mask_value, vals, out)
            return out

        return _positionwise_apply(arr, fn)


class MinMaxScaleTransformer(Transformer):
    """(x - min) / (max - min) per position, mask-aware.
    Reference: transformers/min_max_scale.py:188."""

    compatible_dtypes = (pa.float64(),)

    def __init__(self, *args, min, max, mask_value: float | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.min = [float(m) for m in min]
        self.max = [float(m) for m in max]
        self.mask_value = mask_value

    def _transform_array(self, arr: pa.Array, batch: pa.Table) -> pa.Array:
        mn = np.asarray(self.min)
        mx = np.asarray(self.max)
        rng = mx - mn
        inv = np.where(rng == 0, 0.0, 1.0 / np.where(rng == 0, 1.0, rng))

        def fn(vals, pos):
            p = np.minimum(pos, len(mn) - 1)
            out = (vals - mn[p]) * inv[p]
            if self.mask_value is not None:
                out = np.where(vals == self.mask_value, vals, out)
            return out

        return _positionwise_apply(arr, fn)


class ImputeTransformer(Transformer):
    """Replace mask_value / null with the fitted impute value.
    Reference: transformers/impute.py:160."""

    compatible_dtypes = (pa.float64(),)

    def __init__(self, *args, impute_value: float, mask_value: float | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.impute_value = impute_value
        self.mask_value = mask_value

    def _transform_array(self, arr: pa.Array, batch: pa.Table) -> pa.Array:
        def kernel(flat):
            x = pc.cast(flat, pa.float64(), safe=False)
            x = pc.fill_null(x, self.impute_value)
            if self.mask_value is not None:
                x = pc.if_else(
                    pc.equal(x, pa.scalar(float(self.mask_value))),
                    pa.scalar(float(self.impute_value)),
                    x,
                )
            return x

        return A.lift(kernel, arr)


class ConditionalStandardScaleTransformer(StandardScaleTransformer):
    """StandardScale with ``skip_zeros``: elements within ``epsilon`` of zero
    stay 0 instead of being scaled.
    Reference: transformers/conditional_standard_scale.py:112-158."""

    def __init__(self, *args, skip_zeros: bool = False, epsilon: float = 0.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.skip_zeros = skip_zeros
        self.epsilon = float(epsilon)

    def _transform_array(self, arr: pa.Array, batch: pa.Table) -> pa.Array:
        mean = np.asarray(self.mean)
        std = np.asarray(self.stddev)
        inv = np.where(std == 0, 0.0, 1.0 / np.where(std == 0, 1.0, std))

        def fn(vals, pos):
            p = np.minimum(pos, len(mean) - 1)
            out = (vals - mean[p]) * inv[p]
            if self.skip_zeros:
                out = np.where(np.abs(vals) > self.epsilon, out, 0.0)
            if self.mask_value is not None:
                out = np.where(vals == self.mask_value, vals, out)
            return out

        return _positionwise_apply(arr, fn)


class StandardScaleEstimator(Estimator):
    """Fit per-position mean + stddev_pop (mask-aware), then StandardScale.
    Reference: estimators/standard_scale.py:100-163."""

    def __init__(self, *args, mask_value: float | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.mask_value = mask_value

    def fit_spec(self):
        # sample_fraction fuses too: Pipeline groups by fraction and shares
        # one seeded random_sample + aggregation pass (pipeline._fit_group)
        return ("moments", (self.input_col, self.mask_value))

    def fit_from(self, mom) -> StandardScaleTransformer:
        return StandardScaleTransformer(
            input_col=self.input_col,
            output_col=self.output_col,
            input_dtype=self.input_dtype,
            output_dtype=self.output_dtype,
            layer_name=self.layer_name,
            mean=mom["mean"].tolist(),
            stddev=mom["std_pop"].tolist(),
            mask_value=self.mask_value,
        )

    def fit(self, ds) -> StandardScaleTransformer:
        ds = self._maybe_sample(ds)
        return self.fit_from(agg.moments(ds, self.input_col, self.mask_value))


class SingleFeatureArrayStandardScaleEstimator(Estimator):
    """ONE mean/std over ALL elements of the arrays, broadcast to every
    position. Reference: estimators/single_feature_array_standard_scale.py:96-156."""

    def __init__(self, *args, mask_value: float | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.mask_value = mask_value

    def fit_spec(self):
        # sample_fraction fuses too: Pipeline groups by fraction and shares
        # one seeded random_sample + aggregation pass (pipeline._fit_group)
        return ("moments", (self.input_col, self.mask_value))

    def fit(self, ds) -> StandardScaleTransformer:
        ds = self._maybe_sample(ds)
        return self.fit_from(agg.moments(ds, self.input_col, self.mask_value))

    def fit_from(self, mom) -> StandardScaleTransformer:
        cnt = mom["count"]
        n = cnt.sum()
        mean = float(np.nansum(mom["mean"] * cnt) / n) if n else float("nan")
        # combine per-position moments into global stddev_pop
        ex2 = np.nansum((mom["std_pop"] ** 2 + mom["mean"] ** 2) * cnt) / n if n else float("nan")
        std = float(np.sqrt(max(ex2 - mean * mean, 0.0))) if n else float("nan")
        return StandardScaleTransformer(
            input_col=self.input_col,
            output_col=self.output_col,
            input_dtype=self.input_dtype,
            output_dtype=self.output_dtype,
            layer_name=self.layer_name,
            mean=[mean],
            stddev=[std],
            mask_value=self.mask_value,
        )


class MinMaxScaleEstimator(Estimator):
    """Fit per-position min/max (mask-aware). Reference: estimators/min_max_scale.py:102-165."""

    def __init__(self, *args, mask_value: float | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.mask_value = mask_value

    def fit_spec(self):
        # sample_fraction fuses too: Pipeline groups by fraction and shares
        # one seeded random_sample + aggregation pass (pipeline._fit_group)
        return ("moments", (self.input_col, self.mask_value))

    def fit(self, ds) -> MinMaxScaleTransformer:
        ds = self._maybe_sample(ds)
        return self.fit_from(agg.moments(ds, self.input_col, self.mask_value))

    def fit_from(self, mom) -> MinMaxScaleTransformer:
        return MinMaxScaleTransformer(
            input_col=self.input_col,
            output_col=self.output_col,
            input_dtype=self.input_dtype,
            output_dtype=self.output_dtype,
            layer_name=self.layer_name,
            min=mom["min"].tolist(),
            max=mom["max"].tolist(),
            mask_value=self.mask_value,
        )


class ImputeEstimator(Estimator):
    """Fit global mean or exact median of flattened values (mask/null
    excluded). Reference: estimators/impute.py:110-167."""

    def __init__(self, *args, impute_method: str = "mean", mask_value: float | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        if impute_method not in ("mean", "median"):
            raise ValueError("impute_method must be mean|median")
        self.impute_method = impute_method
        self.mask_value = mask_value

    def fit_spec(self):
        if self.impute_method != "mean":
            return None  # exact median needs its own histogram-refinement pass
        return ("moments", (self.input_col, self.mask_value))

    def fit_from(self, mom) -> ImputeTransformer:
        n = mom["count"].sum()
        value = float(np.nansum(mom["mean"] * mom["count"]) / n) if n else None
        return self._build(value)

    def fit(self, ds) -> ImputeTransformer:
        ds = self._maybe_sample(ds)
        if self.impute_method == "mean":
            return self.fit_from(agg.moments(ds, self.input_col, self.mask_value))
        value = agg.exact_median(ds, self.input_col, self.mask_value)
        return self._build(value)

    def _build(self, value) -> ImputeTransformer:
        return ImputeTransformer(
            input_col=self.input_col,
            output_col=self.output_col,
            input_dtype=self.input_dtype,
            output_dtype=self.output_dtype,
            layer_name=self.layer_name,
            impute_value=value,
            mask_value=self.mask_value,
        )


class ConditionalStandardScaleEstimator(Estimator):
    """Standard-mode conditional scaling: rows pre-filtered by a mask
    condition on a second column before the moments pass; optional skip_zeros
    excludes exact zeros from the statistics.
    Reference: estimators/conditional_standard_scale.py:352-605 (standard
    mode; the 'binary' relevance-count mode computes mean=1-f/n from label
    frequencies)."""

    def __init__(
        self,
        *args,
        mask_value: float | None = None,
        skip_zeros: bool = False,
        mode: str = "standard",
        relevance_col: str | None = None,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.mask_value = mask_value
        self.skip_zeros = skip_zeros
        self.mode = mode
        self.relevance_col = relevance_col

    def fit(self, ds) -> StandardScaleTransformer:
        ds = self._maybe_sample(ds)
        mask = self.mask_value
        if self.skip_zeros:
            # exclude zeros by treating them as masked in the moments pass
            if mask is None:
                mask = 0.0
        if self.mode == "binary" and self.relevance_col is not None:
            # mean = 1 - (#relevant / n); bespoke std per reference :398-458
            mom_rel = agg.moments(ds, self.relevance_col, None)
            n = mom_rel["count"].sum()
            f = np.nansum(mom_rel["mean"] * mom_rel["count"])  # sum of 0/1 labels
            mean = 1.0 - (f / n if n else 0.0)
            std = float(np.sqrt(max((f / n) * (1 - f / n), 0.0))) if n else 0.0
            return StandardScaleTransformer(
                input_col=self.input_col,
                output_col=self.output_col,
                layer_name=self.layer_name,
                mean=[float(mean)],
                stddev=[std],
                mask_value=self.mask_value,
            )
        mom = agg.moments(ds, self.input_col, mask)
        return ConditionalStandardScaleTransformer(
            input_col=self.input_col,
            output_col=self.output_col,
            input_dtype=self.input_dtype,
            output_dtype=self.output_dtype,
            layer_name=self.layer_name,
            mean=mom["mean"].tolist(),
            stddev=mom["std_pop"].tolist(),
            mask_value=self.mask_value,
            skip_zeros=self.skip_zeros,
        )


class QuantileBucketizeEstimator(Estimator):
    """Learned-boundary discretizer (Spark QuantileDiscretizer shape, no
    direct reference analog — kamae's Bucketize takes given splits;
    transformers/bucketize.py:135-166): fit exact quantile_cont boundaries at
    ``i/num_buckets`` (or explicit ``probs``), then emit the standard
    BucketizeTransformer over them, so serving/persistence reuse the
    existing op. Fit cost: one moments pass + one histogram pass + one
    bracket-collect pass (state/aggregators.exact_quantiles) — driver state
    is O(bins + bracket), never the column.

    ``boundary_decimals`` optionally rounds the learned boundaries
    (half-away) — set it when an external system (e.g. a SQL oracle) must
    reproduce bucket assignment from its own quantile computation, where the
    unrounded values may differ in the last ulp.
    """

    def __init__(self, *args, num_buckets: int = 4, probs=None,
                 mask_value: float | None = None,
                 boundary_decimals: int | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        if probs is None:
            if num_buckets < 2:
                raise ValueError("num_buckets must be >= 2")
            probs = [i / num_buckets for i in range(1, num_buckets)]
        self.probs = [float(p) for p in probs]
        if not all(0.0 < p < 1.0 for p in self.probs):
            raise ValueError("probs must lie strictly inside (0, 1)")
        self.mask_value = mask_value
        self.boundary_decimals = boundary_decimals

    def fit(self, ds):
        from kamae_ray.stages.elementwise import BucketizeTransformer

        ds = self._maybe_sample(ds)
        bounds = agg.exact_quantiles(ds, self.input_col, self.probs, self.mask_value)
        if any(b is None for b in bounds):
            raise ValueError(f"column {self.input_col!r} has no values to fit quantiles on")
        if self.boundary_decimals is not None:
            r = pc.round(pa.array(bounds, pa.float64()), ndigits=self.boundary_decimals,
                         round_mode="half_towards_infinity")
            bounds = r.to_pylist()
        # drop duplicate boundaries (skewed data): bucket count shrinks, like
        # Spark QuantileDiscretizer's distinct-splits behavior
        splits = sorted(dict.fromkeys(bounds))
        return BucketizeTransformer(
            input_col=self.input_col,
            output_col=self.output_col,
            input_dtype=self.input_dtype,
            output_dtype=self.output_dtype,
            layer_name=self.layer_name,
            splits=splits,
            mask_value=self.mask_value,
        )


class WinsorizeEstimator(Estimator):
    """Learn percentile clipping bounds (outlier winsorization, a standard
    feature-eng step the reference leaves to upstream Spark SQL): fit the
    [lower_q, upper_q] exact quantiles of ``input_col`` (one streaming
    histogram+bracket pass, driver state O(bins), never the column), then
    emit a plain ClipTransformer — serving/persistence reuse the existing
    elementwise op. SQL twin: least(greatest(x, q_lo), q_hi) with
    quantile_cont bounds.

    ``boundary_decimals`` rounds the learned bounds (half-away) so an
    external system can reproduce them from its own quantile computation."""

    def __init__(self, *args, lower_q: float = 0.01, upper_q: float = 0.99,
                 mask_value: float | None = None,
                 boundary_decimals: int | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        if not 0.0 <= lower_q < upper_q <= 1.0:
            raise ValueError("need 0 <= lower_q < upper_q <= 1")
        self.lower_q = float(lower_q)
        self.upper_q = float(upper_q)
        self.mask_value = mask_value
        self.boundary_decimals = boundary_decimals

    def fit(self, ds):
        from kamae_ray.stages.elementwise import ClipTransformer

        ds = self._maybe_sample(ds)
        qs = [q for q in (self.lower_q, self.upper_q) if 0.0 < q < 1.0]
        bounds = agg.exact_quantiles(ds, self.input_col, qs, self.mask_value)
        if any(b is None for b in bounds):
            raise ValueError(f"column {self.input_col!r} has no values to fit quantiles on")
        it = iter(bounds)
        lo = next(it) if self.lower_q > 0.0 else None
        hi = next(it) if self.upper_q < 1.0 else None
        if self.boundary_decimals is not None:
            r = lambda v: None if v is None else pc.round(  # noqa: E731
                pa.scalar(float(v)), ndigits=self.boundary_decimals,
                round_mode="half_towards_infinity").as_py()
            lo, hi = r(lo), r(hi)
        return ClipTransformer(
            input_col=self.input_col,
            output_col=self.output_col,
            input_dtype=self.input_dtype,
            output_dtype=self.output_dtype,
            layer_name=self.layer_name,
            min_value=lo,
            max_value=hi,
        )


class RobustScaleEstimator(Estimator):
    """Median/IQR scaling ((x - median) / (q75 - q25)) — the outlier-robust
    cousin of StandardScale (sklearn RobustScaler semantics; the reference
    leaves robust scaling to upstream SQL). One streaming exact-quantile
    pass fits all three quantiles; emits a plain StandardScaleTransformer
    (mean=median, stddev=IQR; IQR==0 -> multiply by 0, the house zero-scale
    policy), so serving/persistence reuse the existing op unchanged.

    ``boundary_decimals`` rounds each fitted quantile (half-away) before the
    IQR subtraction so an external system can reproduce the parameters."""

    def __init__(self, *args, lower_q: float = 0.25, upper_q: float = 0.75,
                 mask_value: float | None = None,
                 boundary_decimals: int | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        if not 0.0 < lower_q < upper_q < 1.0:
            raise ValueError("need 0 < lower_q < upper_q < 1")
        self.lower_q = float(lower_q)
        self.upper_q = float(upper_q)
        self.mask_value = mask_value
        self.boundary_decimals = boundary_decimals

    def fit(self, ds):
        ds = self._maybe_sample(ds)
        qs = [self.lower_q, 0.5, self.upper_q]
        lo, med, hi = agg.exact_quantiles(ds, self.input_col, qs, self.mask_value)
        if med is None:
            raise ValueError(f"column {self.input_col!r} has no values to fit quantiles on")
        if self.boundary_decimals is not None:
            r = lambda v: pc.round(  # noqa: E731
                pa.scalar(float(v)), ndigits=self.boundary_decimals,
                round_mode="half_towards_infinity").as_py()
            lo, med, hi = r(lo), r(med), r(hi)
        return StandardScaleTransformer(
            input_col=self.input_col,
            output_col=self.output_col,
            input_dtype=self.input_dtype,
            output_dtype=self.output_dtype,
            layer_name=self.layer_name,
            mean=[med],
            stddev=[hi - lo],
            mask_value=self.mask_value,
        )


class GroupedImputeTransformer(Transformer):
    """Fill null values of ``input_col`` with the fitted PER-GROUP statistic
    of ``group_col`` (unseen or null groups -> the global ``default_value``)
    — the group-conditional sibling of :class:`ImputeTransformer`. Non-null
    values pass through unchanged. Lookup is one ``index_in`` over the
    fitted group list per batch."""

    compatible_dtypes = None

    def __init__(self, *args, group_col: str, groups: Sequence, values: Sequence[float],
                 default_value: float, **kwargs):
        super().__init__(*args, **kwargs)
        self.group_col = group_col
        self.groups = list(groups)
        self.values = [float(v) for v in values]
        self.default_value = float(default_value)
        self._cached = None

    def get_params(self):
        p = super().get_params()
        p.pop("_cached", None)
        return p

    @property
    def state_size_hint(self) -> int:
        return len(self.groups)

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        # getattr guard: survives the __new__-based _load_stages rebuild
        if getattr(self, "_cached", None) is None:
            self._cached = (pa.array(self.groups),
                            np.asarray(self.values + [self.default_value], np.float64))
        gkeys, vals = self._cached
        x = pc.cast(A.as_array(batch.column(self.input_col)), pa.float64(), safe=False)
        g = A.as_array(batch.column(self.group_col))
        if len(gkeys):
            pos = pc.index_in(pc.cast(g, gkeys.type, safe=False), value_set=gkeys)
            pos = pc.fill_null(pos, len(vals) - 1).to_numpy(zero_copy_only=False).astype(np.int64)
            fill = vals[pos]
        else:
            fill = np.full(batch.num_rows, self.default_value)
        # per-group medians can themselves be null (all-null group) -> default
        fill = np.where(np.isnan(fill), self.default_value, fill)
        out = pc.if_else(pc.is_valid(x), x, pa.array(fill, pa.float64()))
        return _append_or_replace(batch, self.output_col, self._cast_out(out))


class GroupedImputeEstimator(Estimator):
    """Fit one impute statistic PER CATEGORY of ``group_col`` plus the
    global fallback, then build :class:`GroupedImputeTransformer`.

    ``strategy="median"`` (default) is the exact ``quantile_cont`` selection
    — cross-engine exact (one projected (group, col) quantile sort;
    q_group_impute oracle). ``strategy="mean"`` is exact for integer columns
    (order-free int sums); float means are accumulation-order-sensitive
    across engines (documented, same caveat as TargetEncode). State is
    O(groups), the bounded-vocabulary contract."""

    def __init__(self, *args, group_col: str, strategy: str = "median", **kwargs):
        super().__init__(*args, **kwargs)
        if strategy not in ("median", "mean"):
            raise ValueError("strategy must be median|mean")
        self.group_col = group_col
        self.strategy = strategy

    def fit(self, ds) -> GroupedImputeTransformer:
        from kamae_ray.base import collect_tables
        from kamae_ray.state.aggregators import _project, exact_quantiles
        from kamae_ray.stages.aggregate import groupby_agg, quantile_per_group

        ds = self._maybe_sample(ds)
        col, grp = self.input_col, self.group_col
        proj = ds if isinstance(ds, pa.Table) else (_project(ds, [grp, col]) or ds)
        if not isinstance(proj, pa.Table):
            # the median fit consumes proj 4x (group quantile sort + the
            # 3-pass global exact_quantiles) — materialize the 2-column
            # intermediate once (lesson 14/30)
            proj = proj.materialize()
        if self.strategy == "median":
            stats = quantile_per_group(proj, [grp], col, [0.5], out_prefix="__gi")
            vname = "__gi_p50"
        else:
            stats = groupby_agg(proj, grp, {col: ["sum", "count"]})
        if not isinstance(stats, pa.Table):
            parts = [t for t in collect_tables(stats) if t.num_rows]
            stats = pa.concat_tables(parts) if parts else None
        groups, values = [], []
        gsum = gcnt = 0.0
        if stats is not None and stats.num_rows:
            garr = A.as_array(stats.column(grp))
            keep = pc.is_valid(garr).to_numpy(zero_copy_only=False)
            if self.strategy == "median":
                v = pc.cast(stats.column(vname), pa.float64(), safe=False).to_numpy(zero_copy_only=False)
            else:
                s = pc.cast(stats.column(f"{col}_sum"), pa.float64(), safe=False).to_numpy(zero_copy_only=False)
                c = pc.cast(stats.column(f"{col}_count"), pa.float64(), safe=False).to_numpy(zero_copy_only=False)
                # all-null groups have a null (NaN) sum — exclude them from
                # the global totals and give them a NaN statistic (dropped
                # below -> global-default fallback)
                ok = (c > 0) & ~np.isnan(s)
                gsum, gcnt = float(s[keep & ok].sum()), float(c[keep & ok].sum())
                with np.errstate(invalid="ignore", divide="ignore"):
                    v = np.where(ok, s / np.where(c == 0, 1, c), np.nan)
            groups = garr.filter(pa.array(keep)).to_pylist()
            values = v[keep].tolist()
        if self.strategy == "median":
            default = _table_median(proj, col) if isinstance(proj, pa.Table) \
                else exact_quantiles(proj, col, [0.5])[0]
        else:
            default = (gsum / gcnt) if gcnt else 0.0
        default = 0.0 if default is None or (isinstance(default, float) and np.isnan(default)) else float(default)
        # all-null groups carry a NaN statistic: drop them from the fitted
        # map so they fall back to the global default (not 0). Sort by group
        # — collect order follows block completion (lesson 18), fitted params
        # must be run-deterministic.
        kept = sorted(
            ((g, v) for g, v in zip(groups, values)
             if not (isinstance(v, float) and np.isnan(v))),
            key=lambda gv: gv[0],
        )
        return GroupedImputeTransformer(
            input_col=self.input_col,
            output_col=self.output_col,
            input_dtype=self.input_dtype,
            output_dtype=self.output_dtype,
            layer_name=self.layer_name,
            group_col=self.group_col,
            groups=[g for g, _v in kept],
            values=[v for _g, v in kept],
            default_value=default,
        )


def _table_median(t: pa.Table, col: str) -> float:
    v, mask = A.to_numpy(pc.cast(A.as_array(t.column(col)), pa.float64(), safe=False))
    v = v.astype(np.float64, copy=True)
    if mask is not None:
        v = v[~mask]
    v = v[~np.isnan(v)]
    if not len(v):
        return 0.0
    v.sort()
    n = len(v)
    # quantile_cont(0.5): linear interpolation == midpoint of the two
    # middle elements for even n
    return float(v[(n - 1) // 2]) if n % 2 else float((v[n // 2 - 1] + v[n // 2]) / 2)


class GroupedBucketizeTransformer(Transformer):
    """Per-group learned-boundary discretizer: each row buckets against ITS
    group's splits (``bisect_right + 1``, bucket 0 reserved — the
    BucketizeTransformer rule); unseen/null groups use the fitted GLOBAL
    splits; null values stay null. One searchsorted per distinct group
    present in the batch (groups are vocab-bounded)."""

    compatible_dtypes = None

    def __init__(self, *args, group_col: str, groups: Sequence,
                 splits_per_group: Sequence[Sequence[float]],
                 default_splits: Sequence[float], **kwargs):
        super().__init__(*args, **kwargs)
        self.group_col = group_col
        self.groups = list(groups)
        self.splits_per_group = [list(map(float, s)) for s in splits_per_group]
        self.default_splits = [float(s) for s in default_splits]
        self._cached = None

    def get_params(self):
        p = super().get_params()
        p.pop("_cached", None)
        return p

    @property
    def state_size_hint(self) -> int:
        return sum(len(s) for s in self.splits_per_group)

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        # getattr guard: survives the __new__-based _load_stages rebuild
        if getattr(self, "_cached", None) is None:
            self._cached = (pa.array(self.groups),
                            [np.asarray(s) for s in self.splits_per_group],
                            np.asarray(self.default_splits))
        gkeys, splits, dflt = self._cached
        vals, mask = A.to_numpy(pc.cast(A.as_array(batch.column(self.input_col)),
                                        pa.float64(), safe=False))
        g = A.as_array(batch.column(self.group_col))
        if len(gkeys):
            pos = pc.index_in(pc.cast(g, gkeys.type, safe=False), value_set=gkeys)
            pos = pc.fill_null(pos, len(splits)).to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            pos = np.full(batch.num_rows, 0, np.int64)
        out = np.zeros(len(vals), np.int64)
        for gi in np.unique(pos):
            m = pos == gi
            sp = splits[gi] if gi < len(splits) else dflt
            out[m] = np.searchsorted(sp, vals[m], side="right") + 1
        col = pa.array(out.astype(np.int32), mask=mask)
        return _append_or_replace(batch, self.output_col, self._cast_out(col))


class GroupedQuantileBucketizeEstimator(Estimator):
    """Fit exact ``quantile_cont`` boundaries at ``i/num_buckets`` PER
    CATEGORY of ``group_col`` (plus global fallback splits), then build
    :class:`GroupedBucketizeTransformer` — the group-conditional Spark
    QuantileDiscretizer. Fit = ONE projected (group, col) quantile sort +
    the global exact_quantiles passes; state O(groups x buckets).
    ``boundary_decimals`` rounds learned boundaries for oracle parity
    (QuantileBucketizeEstimator precedent); duplicate boundaries within a
    group collapse (skewed groups get fewer buckets, Spark behavior)."""

    def __init__(self, *args, group_col: str, num_buckets: int = 4,
                 boundary_decimals: int | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        if num_buckets < 2:
            raise ValueError("num_buckets must be >= 2")
        self.group_col = group_col
        self.num_buckets = int(num_buckets)
        self.boundary_decimals = boundary_decimals

    def fit(self, ds) -> GroupedBucketizeTransformer:
        from kamae_ray.base import collect_tables
        from kamae_ray.stages.aggregate import quantile_per_group

        ds = self._maybe_sample(ds)
        col, grp = self.input_col, self.group_col
        probs = [i / self.num_buckets for i in range(1, self.num_buckets)]
        if isinstance(ds, pa.Table):
            proj = ds
            stats = quantile_per_group(proj, [grp], col, probs, out_prefix="__gq")
        else:
            from kamae_ray.state.aggregators import _project

            proj = _project(ds, [grp, col]) or ds
            stats = quantile_per_group(proj, [grp], col, probs, out_prefix="__gq")
            parts = [t for t in collect_tables(stats) if t.num_rows]
            stats = pa.concat_tables(parts) if parts else None
        names = [f"__gq_p{int(round(q * 100))}" for q in probs]

        def _round(xs):
            if self.boundary_decimals is None:
                return [float(x) for x in xs]
            r = pc.round(pa.array([float(x) for x in xs], pa.float64()),
                         ndigits=self.boundary_decimals,
                         round_mode="half_towards_infinity")
            return r.to_pylist()

        groups, splits = [], []
        if stats is not None and stats.num_rows:
            garr = A.as_array(stats.column(grp))
            keep = pc.is_valid(garr).to_numpy(zero_copy_only=False)
            cols = [pc.cast(stats.column(nm), pa.float64(), safe=False).to_numpy(zero_copy_only=False)
                    for nm in names]
            for i in np.flatnonzero(keep):
                bounds = [c[i] for c in cols]
                if any(np.isnan(b) for b in bounds):
                    continue  # all-null group -> fallback to global splits
                groups.append(garr[int(i)].as_py())
                splits.append(sorted(dict.fromkeys(_round(bounds))))
        order = sorted(range(len(groups)), key=lambda i: str(groups[i]))
        groups = [groups[i] for i in order]
        splits = [splits[i] for i in order]
        if isinstance(proj, pa.Table):
            gl = [_table_quantile_cont(proj, col, q) for q in probs]
        else:
            from kamae_ray.state.aggregators import exact_quantiles

            gl = exact_quantiles(proj, col, probs)
        gl = [b for b in gl if b is not None and not (isinstance(b, float) and np.isnan(b))]
        default = sorted(dict.fromkeys(_round(gl))) if gl else []
        return GroupedBucketizeTransformer(
            input_col=self.input_col,
            output_col=self.output_col,
            input_dtype=self.input_dtype,
            output_dtype=self.output_dtype,
            layer_name=self.layer_name,
            group_col=self.group_col,
            groups=groups,
            splits_per_group=splits,
            default_splits=default,
        )


def _table_quantile_cont(t: pa.Table, col: str, q: float) -> float:
    v, mask = A.to_numpy(pc.cast(A.as_array(t.column(col)), pa.float64(), safe=False))
    v = v.astype(np.float64, copy=True)
    if mask is not None:
        v = v[~mask]
    v = v[~np.isnan(v)]
    if not len(v):
        return float("nan")
    v.sort()
    pos = q * (len(v) - 1)
    lo = int(np.floor(pos))
    hi = min(lo + 1, len(v) - 1)
    return float(v[lo] + (v[hi] - v[lo]) * (pos - lo))


class GroupedStandardScaleTransformer(Transformer):
    """Group-conditional z-score: ``(x - mean_g) / std_g`` with the fitted
    PER-GROUP population moments (unseen/null groups -> the global
    fallback; zero-std groups -> 0.0, the StandardScale convention; null
    values stay null). The division form is mirrored verbatim in SQL —
    never the multiply-by-reciprocal form (1 ULP apart)."""

    compatible_dtypes = None

    def __init__(self, *args, group_col: str, groups: Sequence,
                 means: Sequence[float], stds: Sequence[float],
                 default_mean: float, default_std: float, **kwargs):
        super().__init__(*args, **kwargs)
        self.group_col = group_col
        self.groups = list(groups)
        self.means = [float(m) for m in means]
        self.stds = [float(s) for s in stds]
        self.default_mean = float(default_mean)
        self.default_std = float(default_std)
        self._cached = None

    def get_params(self):
        p = super().get_params()
        p.pop("_cached", None)
        return p

    @property
    def state_size_hint(self) -> int:
        return len(self.groups)

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        # getattr guard: survives the __new__-based _load_stages rebuild
        if getattr(self, "_cached", None) is None:
            self._cached = (
                pa.array(self.groups),
                np.asarray(self.means + [self.default_mean], np.float64),
                np.asarray(self.stds + [self.default_std], np.float64),
            )
        gkeys, means, stds = self._cached
        xarr = A.as_array(batch.column(self.input_col))
        x, mask = A.to_numpy(pc.cast(xarr, pa.float64(), safe=False))
        g = A.as_array(batch.column(self.group_col))
        if len(gkeys):
            pos = pc.index_in(pc.cast(g, gkeys.type, safe=False), value_set=gkeys)
            pos = pc.fill_null(pos, len(means) - 1).to_numpy(
                zero_copy_only=False).astype(np.int64)
        else:
            pos = np.full(batch.num_rows, 0, np.int64)
            means = np.asarray([self.default_mean])
            stds = np.asarray([self.default_std])
        m, s = means[pos], stds[pos]
        with np.errstate(invalid="ignore", divide="ignore"):
            out = np.where(s == 0, 0.0, (x - m) / np.where(s == 0, 1.0, s))
        isnull = np.zeros(batch.num_rows, bool) if mask is None else mask
        col = pa.array(out, pa.float64(), mask=isnull)
        return _append_or_replace(batch, self.output_col, self._cast_out(col))


class GroupedStandardScaleEstimator(Estimator):
    """Fit per-group population mean/std over an INTEGER column (exact
    int64 power sums: mean = sx/n, var = (n*sxx - sx^2)/n^2 — the
    q_moments family, arbitrary-precision numerator fold, so the fitted
    moments and the transform are bit-identical to the SQL mirror) plus the
    global fallback over all fitted rows; build
    :class:`GroupedStandardScaleTransformer`. State is O(groups)."""

    def __init__(self, *args, group_col: str, **kwargs):
        super().__init__(*args, **kwargs)
        self.group_col = group_col

    def fit(self, ds) -> GroupedStandardScaleTransformer:
        from kamae_ray.base import collect_tables
        from kamae_ray.stages.aggregate import groupby_agg

        ds = self._maybe_sample(ds)
        col, grp = self.input_col, self.group_col

        def add_sq(block: pa.Table) -> pa.Table:
            x = A.as_array(block.column(col))
            if not pa.types.is_integer(x.type):
                raise ValueError(
                    "GroupedStandardScale requires an integer input column "
                    "(exact cross-engine moments) — quantize first")
            xv = pc.cast(x, pa.int64(), safe=False)
            xn = pc.fill_null(xv, 0).to_numpy(zero_copy_only=False)
            if len(xn) and int(np.abs(xn).max()) >= (1 << 31):
                raise ValueError("values must fit 31 bits (x^2 exactness)")
            sq = pc.multiply_checked(xv, xv)
            return pa.table({grp: block.column(grp), col: xv, "__sq": sq})

        add_sq.__name__ = "grouped_scale_sq"
        if isinstance(ds, pa.Table):
            stats = groupby_agg(add_sq(ds), grp, {col: ["sum", "count"],
                                                  "__sq": ["sum"]})
        else:
            tagged = ds.map_batches(add_sq, batch_format="pyarrow",
                                    zero_copy_batch=True, batch_size=None)
            parts = [t for t in collect_tables(
                groupby_agg(tagged, grp, {col: ["sum", "count"], "__sq": ["sum"]}))
                if t.num_rows]
            stats = pa.concat_tables(parts) if parts else None
        groups, means, stds = [], [], []
        tot_n = tot_sx = tot_sxx = 0
        if stats is not None and stats.num_rows:
            garr = A.as_array(stats.column(grp))
            keep = pc.is_valid(garr).to_numpy(zero_copy_only=False)
            sx = pc.cast(stats.column(f"{col}_sum"), pa.int64(), safe=False) \
                .to_numpy(zero_copy_only=False)
            n = pc.cast(stats.column(f"{col}_count"), pa.int64(), safe=False) \
                .to_numpy(zero_copy_only=False)
            sxx = pc.cast(stats.column("__sq_sum"), pa.int64(), safe=False) \
                .to_numpy(zero_copy_only=False)
            if len(sxx) and int(np.abs(sxx).max()) >= (1 << 53):
                raise ValueError("GroupedStandardScale sums exceed exact "
                                 "float64 range — fit on a sample")
            glist = garr.to_pylist()
            rows = sorted(
                (i for i in range(len(glist)) if keep[i] and n[i] > 0),
                key=lambda i: str(glist[i]))
            for i in rows:
                ni, sxi, sxxi = int(n[i]), int(sx[i]), int(sxx[i])
                groups.append(glist[i])
                means.append(sxi / ni)
                stds.append(float(np.sqrt(float(ni * sxxi - sxi * sxi)
                                          / float(ni * ni))))
                tot_n += ni
                tot_sx += sxi
                tot_sxx += sxxi
        if tot_n:
            dmean = tot_sx / tot_n
            dstd = float(np.sqrt(float(tot_n * tot_sxx - tot_sx * tot_sx)
                                 / float(tot_n * tot_n)))
        else:
            dmean, dstd = 0.0, 0.0
        return GroupedStandardScaleTransformer(
            input_col=self.input_col,
            output_col=self.output_col,
            input_dtype=self.input_dtype,
            output_dtype=self.output_dtype,
            layer_name=self.layer_name,
            group_col=self.group_col,
            groups=groups,
            means=means,
            stds=stds,
            default_mean=dmean,
            default_std=dstd,
        )
