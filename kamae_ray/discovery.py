"""Discovery API: enumerate available transformers / estimators.

Mirrors the reference's discovery surface (reference:
src/kamae/discovery.py:51-169 — get_compatible_layers/transformers) for the
Ray engine: everything is a plain class in kamae_ray.stages, so discovery is
introspection over the registry.
"""

from __future__ import annotations

import inspect

from kamae_ray import stages as _stages
from kamae_ray.base import Estimator, Transformer


def get_transformers() -> dict[str, type]:
    """All concrete Transformer classes by name."""
    out = {}
    for name in dir(_stages):
        obj = getattr(_stages, name)
        if inspect.isclass(obj) and issubclass(obj, Transformer) and not name.startswith("_"):
            out[name] = obj
    return out


def get_estimators() -> dict[str, type]:
    """All concrete Estimator classes by name."""
    out = {}
    for name in dir(_stages):
        obj = getattr(_stages, name)
        if inspect.isclass(obj) and issubclass(obj, Estimator) and not name.startswith("_"):
            out[name] = obj
    return out


def get_compatible_transformers(dtype) -> list[str]:
    """Transformer class names whose compatible_dtypes accept ``dtype``
    (a pyarrow scalar type); ops with no restriction are included."""
    import pyarrow as pa

    from kamae_ray import dtypes as D

    if isinstance(dtype, str):
        dtype = D.arrow_type(dtype)
    names = []
    for name, cls in get_transformers().items():
        ok = cls.compatible_dtypes
        if ok is None:
            names.append(name)
            continue
        if any(t.equals(dtype) for t in ok):
            names.append(name)
        elif any(D.is_numeric(t) for t in ok) and D.is_numeric(dtype):
            names.append(name)
    return sorted(names)


def get_capabilities() -> dict[str, dict]:
    """Per-stage capability metadata — the engine analog of the reference's
    ``jit_compatible`` / ``supported_backends`` discovery surface
    (reference: src/kamae/discovery.py:51-169 and the meta-test
    tests/kamae/spark/test_jit_compatibility.py:23-60):

    - ``kind``: "transformer" | "estimator"
    - ``backends``: execution surfaces — every stage here runs on both an
      in-process ``pa.Table`` and a ``ray.data.Dataset`` (the project
      invariant pinned by the dual-path tests)
    - ``fusible``: participates in fused ``map_batches`` runs (False = wide
      stage owning its own sort/groupby plan)
    - ``wide``: carries ``sort_keys`` (executes via the shared sort-shuffle)
    - ``portable``: has an op in the portable serving artifact
      (state/portable.py) — applyable without Ray
    """
    from kamae_ray.state.portable import PORTABLE_CLASSES

    out: dict[str, dict] = {}
    for name, cls in {**get_transformers(), **get_estimators()}.items():
        out[name] = {
            "kind": "estimator" if issubclass(cls, Estimator) else "transformer",
            "backends": ("arrow_table", "ray_dataset"),
            "fusible": bool(getattr(cls, "fusible", True)),
            "wide": hasattr(cls, "sort_keys"),
            "portable": name in PORTABLE_CLASSES,
        }
    return out
