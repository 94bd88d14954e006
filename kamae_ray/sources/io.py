"""Parquet read helper.

Pandas-written parquet embeds a ``b'pandas'`` schema-metadata dict that makes
``pa.Schema`` unhashable (pyarrow 16), which silently disables Ray Data's
schema-dedup fast path in ``unify_schemas`` (every block union pays a full
schema unification and logs "Failed to hash the schemas"). Reading with an
explicit metadata-stripped schema restores the fast path; column projection
still pushes into the scan.
"""

from __future__ import annotations

import pyarrow.parquet as pq


def clean_schema(path: str, columns: list[str] | None = None):
    """Metadata-stripped (hashable) schema of a parquet file, optionally
    projected to ``columns`` in the requested order."""
    s = pq.read_schema(path)
    if columns is not None:
        s = s.empty_table().select(columns).schema
    return s.remove_metadata()


def read_parquet_clean(path: str, columns: list[str] | None = None, **kwargs):
    """``ray.data.read_parquet`` with a hashable schema override (see module
    docstring). ``path`` may be a file or a directory of parquet parts (the
    schema is probed from the first file)."""
    import os

    import ray.data

    probe = path
    if os.path.isdir(path):
        parts = sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
        )
        if parts:
            probe = parts[0]
    try:
        schema = clean_schema(probe, columns)
    except Exception:
        schema = None
    return ray.data.read_parquet(path, columns=columns, schema=schema, **kwargs)
