"""Pipeline / PipelineModel: DAG wiring, selective fit, stage fusion,
JSON persistence.

Reference lifecycle (reimplemented, not ported):
- flattening of nested pipelines: src/kamae/spark/pipeline/pipeline.py:83-98
- column-edge DAG + topological sort: src/kamae/graph/pipeline_graph.py:37-117
- selective fit-time execution (only transformers that feed an estimator run
  during fit): src/kamae/spark/pipeline/pipeline.py:100-177
- sequential fold transform: src/kamae/spark/transformers/base.py:39-89
- JSON persistence: src/kamae/spark/params/default_read_write.py:1-132

Ray design: ``PipelineModel.transform`` composes each maximal run of fusible
(batch-level) transformers into ONE ``map_batches`` call over zero-copy Arrow
batches; wide stages (listwise / window layer) run their own groupby / sort
plans between fused runs. Datasets stay lazy throughout — nothing materializes
except estimator aggregates (bounded size by construction).
"""

from __future__ import annotations

import importlib
import json
import os
from graphlib import TopologicalSorter
from typing import Any, Sequence

import pyarrow as pa

from kamae_ray import base
from kamae_ray.base import Estimator, Stage, Transformer, _ActorBatchFn, _BatchFnWrapper

#: fused-run total state_size_hint above which the run executes as an actor
#: pool (state deserialized once per actor, not per task)
ACTOR_STATE_THRESHOLD = 50_000


def _run_map(ds, run: list[Transformer], actor_concurrency):
    """Execute one fused run of batch transformers on a Dataset."""
    total_hint = sum(getattr(t, "state_size_hint", 0) for t in run)
    if total_hint > ACTOR_STATE_THRESHOLD:
        if actor_concurrency == (1, 8):
            # default cap: size the autoscaling pool to the CLUSTER instead
            # of a fixed 8 (a hardcoded max left 3/4 of a 32-cpu node idle)
            try:
                import ray

                actor_concurrency = (1, max(8, int(ray.cluster_resources().get("CPU", 8))))
            except Exception:
                pass
        return ds.map_batches(
            _ActorBatchFn,
            fn_constructor_args=(list(run),),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
            concurrency=actor_concurrency,
        )
    return ds.map_batches(
        _BatchFnWrapper(*run), batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def _flatten(stages: Sequence[Any]) -> list[Stage]:
    out: list[Stage] = []
    for s in stages:
        if isinstance(s, (Pipeline, PipelineModel)):
            out.extend(_flatten(s.stages))
        else:
            out.append(s)
    return out


def topo_sort(stages: Sequence[Stage]) -> list[Stage]:
    """Order stages so every column producer precedes its consumers."""
    producer: dict[str, int] = {}
    for i, s in enumerate(stages):
        for col in s.outputs:
            producer[col] = i
    ts: TopologicalSorter = TopologicalSorter()
    for i, s in enumerate(stages):
        deps = {producer[c] for c in s.inputs if c in producer and producer[c] != i}
        ts.add(i, *deps)
    order = list(ts.static_order())
    return [stages[i] for i in order]


def _ancestor_closure(stages: list[Stage], targets: set[int]) -> set[int]:
    """Indices of stages whose outputs (transitively) feed any target stage."""
    producer: dict[str, int] = {}
    for i, s in enumerate(stages):
        for col in s.outputs:
            producer[col] = i
    needed: set[int] = set()
    frontier = list(targets)
    while frontier:
        i = frontier.pop()
        for col in stages[i].inputs:
            j = producer.get(col)
            if j is not None and j != i and j not in needed:
                needed.add(j)
                frontier.append(j)
    return needed


def _fit_group(ds, ests: list[Estimator]) -> list[Transformer]:
    """Fit several independent estimators with shared aggregation passes:
    all 'moments' specs in one map pass, all 'vocab' specs in one
    map+groupby pass; estimators without a spec (exact median) fall back to
    their own fit. Sampled estimators fuse too: one content-seeded block sample
    + one fused pass per DISTINCT sample fraction (same seed as the
    standalone ``_maybe_sample`` path, so results are identical — sampling
    makes the fit cheaper, never an extra full pass)."""
    from kamae_ray.state import aggregators as agg

    specs = [e.fit_spec() for e in ests]

    def _frac(e):
        # pa.Table inputs ignore sampling (parity with _maybe_sample)
        return None if isinstance(ds, pa.Table) else e.sample_fraction

    groups: dict = {}
    for e, sp in zip(ests, specs):
        if sp is None:
            continue
        m_specs, v_specs = groups.setdefault(_frac(e), ([], []))
        (m_specs if sp[0] == "moments" else v_specs).append(sp[1])
    mres: dict = {}
    vres: dict = {}
    for frac, (m_specs, v_specs) in groups.items():
        sub = ds if frac is None else base.deterministic_block_sample(ds, frac, seed=42)
        mres[frac], vres[frac] = agg.fused_fit_pass(sub, m_specs, v_specs)
    models = []
    for e, sp in zip(ests, specs):
        if sp is not None and sp[0] == "moments":
            models.append(e.fit_from(mres[_frac(e)][sp[1]]))
        elif sp is not None and sp[0] == "vocab":
            models.append(e.fit_from(vres[_frac(e)][sp[1]]))
        else:
            models.append(e.fit(ds))
    return models


class Pipeline:
    """Unfitted pipeline: mix of Transformers and Estimators in any topological
    order (nested pipelines are flattened)."""

    def __init__(self, stages: Sequence[Any]) -> None:
        self.stages = _flatten(stages)

    def fit(self, ds) -> "PipelineModel":
        stages = topo_sort(self.stages)
        est_idx = {i for i, s in enumerate(stages) if isinstance(s, Estimator)}
        # Selective fit: only transformers that feed some estimator execute at
        # fit time (reference: pipeline.py:100-133). We additionally only apply
        # a fitted estimator's transform when a *downstream* estimator needs it.
        needed = _ancestor_closure(stages, est_idx) | est_idx

        fitted: list[Transformer] = []
        running = ds
        pending_fns: list[Transformer] = []  # fusible transforms awaiting flush

        def flush(dataset):
            nonlocal pending_fns
            if not pending_fns:
                return dataset
            if isinstance(dataset, pa.Table):
                fn = _BatchFnWrapper(*pending_fns)
                dataset = fn(dataset)
            else:
                dataset = dataset.map_batches(
                    _BatchFnWrapper(*pending_fns),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                    batch_size=None,
                )
            pending_fns = []
            return dataset

        last_est = max(est_idx) if est_idx else -1
        i = 0
        while i < len(stages):
            s = stages[i]
            if isinstance(s, Estimator):
                # group consecutive estimators with no data dependency among
                # them -> ONE shared aggregation pass per kind (fused fit)
                group = [(i, s)]
                outs = set(s.outputs)
                j = i + 1
                while (
                    j < len(stages)
                    and isinstance(stages[j], Estimator)
                    and not (set(stages[j].inputs) & outs)
                ):
                    group.append((j, stages[j]))
                    outs |= set(stages[j].outputs)
                    j += 1
                running = flush(running)
                models = _fit_group(running, [e for _, e in group])
                for (gi, _), model in zip(group, models):
                    fitted.append(model)
                    downstream_needed = any(
                        k > gi and k in needed and gi in _ancestor_closure(stages, {k})
                        for k in est_idx
                    )
                    if downstream_needed:
                        if getattr(model, "fusible", True):
                            pending_fns.append(model)
                        else:
                            running = flush(running)
                            running = model.transform(running)
                i = j
            else:
                fitted.append(s)
                if i in needed and i < last_est:
                    if getattr(s, "fusible", True):
                        pending_fns.append(s)
                    else:
                        running = flush(running)
                        running = s.transform(running)
                i += 1
        return PipelineModel(fitted)

    def construct_layer_info(self):
        return [s.construct_layer_info() for s in self.stages]

    # ---- persistence ----
    def save(self, path: str) -> None:
        _save_stages(self.stages, path, fitted=False)

    @classmethod
    def load(cls, path: str) -> "Pipeline":
        return cls(_load_stages(path))


class PipelineModel:
    """Fitted pipeline: fold of transformers with maximal map_batches fusion.

    Fused runs whose combined fitted state is large (vocab dicts, wide
    mean/std vectors) execute as an actor pool — state is shipped through
    the object store and deserialized once per actor, not per task.
    """

    def __init__(self, stages: Sequence[Transformer], actor_concurrency=(1, 8)) -> None:
        self.stages = list(stages)
        self.actor_concurrency = tuple(actor_concurrency)

    def transform(self, ds):
        stages = topo_sort(self.stages)
        if isinstance(ds, pa.Table):
            for s in stages:
                ds = s.transform_batch(ds) if getattr(s, "fusible", True) else s.transform(ds)
            return ds
        run: list[Transformer] = []
        i = 0
        while i < len(stages):
            s = stages[i]
            if getattr(s, "fusible", True):
                run.append(s)
                i += 1
                continue
            if run:
                ds = _run_map(ds, run, self.actor_concurrency)
                run = []
            # fuse consecutive wide stages sharing the same shuffle key into
            # one sort (listwise/window stages expose sort_keys)
            keys = getattr(s, "sort_keys", None)
            if keys is not None:
                group = [s]
                j = i + 1
                while j < len(stages) and getattr(stages[j], "sort_keys", None) == keys:
                    group.append(stages[j])
                    j += 1
                if len(group) > 1:
                    from kamae_ray.stages.window import apply_sorted

                    ds = apply_sorted(ds, *group)
                    i = j
                    continue
            ds = s.transform(ds)
            i += 1
        if run:
            ds = _run_map(ds, run, self.actor_concurrency)
        return ds

    def fit(self, ds) -> "PipelineModel":  # parity with reference PipelineModel
        return self

    def save(self, path: str) -> None:
        _save_stages(self.stages, path, fitted=True)

    def export_portable(self, path: str) -> None:
        """Engine-agnostic serving artifact (spec.json + arrays.npz) a
        non-Ray process can apply — see state/portable.py for the format."""
        from kamae_ray.state.portable import export_portable

        export_portable(self, path)

    @classmethod
    def load(cls, path: str) -> "PipelineModel":
        return cls(_load_stages(path))


# ---------------------------------------------------------------------------
# JSON persistence (mirrors Spark ML metadata layout in spirit)
# ---------------------------------------------------------------------------


def _jsonable(v):
    import numpy as np

    if isinstance(v, np.ndarray):
        return {"__ndarray__": v.tolist(), "dtype": str(v.dtype)}
    if isinstance(v, np.generic):
        return v.item()
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    return v


def _unjson(v):
    import numpy as np

    if isinstance(v, dict) and "__ndarray__" in v:
        return np.asarray(v["__ndarray__"], dtype=v["dtype"])
    if isinstance(v, dict):
        return {k: _unjson(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_unjson(x) for x in v]
    return v


def _save_stages(stages: Sequence[Stage], path: str, fitted: bool) -> None:
    os.makedirs(path, exist_ok=True)
    meta = []
    for s in stages:
        meta.append(
            {
                "class": f"{type(s).__module__}.{type(s).__qualname__}",
                "params": _jsonable(s.get_params()),
            }
        )
    with open(os.path.join(path, "pipeline.json"), "w") as f:
        json.dump({"fitted": fitted, "stages": meta, "version": 1}, f, indent=1)


def _load_stages(path: str) -> list[Stage]:
    with open(os.path.join(path, "pipeline.json")) as f:
        doc = json.load(f)
    out = []
    for entry in doc["stages"]:
        mod_name, _, cls_name = entry["class"].rpartition(".")
        cls = getattr(importlib.import_module(mod_name), cls_name)
        obj = cls.__new__(cls)
        obj.__dict__.update(_unjson(entry["params"]))
        out.append(obj)
    return out
