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
