"""Source / sink helpers: clean parquet reads, CSV/JSON readers, and a
RESUMABLE hive-partitioned parquet sink.

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
    schema is probed from the first file).

    Pass ``filter=<pyarrow.dataset expression>`` to push a row filter into
    the scan itself (rows drop at the reader — row groups whose min/max
    statistics exclude the predicate never leave storage, and non-matching
    rows never enter the object store), instead of filtering in a
    downstream ``map_batches``."""
    import os

    import ray.data

    probe = path
    n_parts = None
    if os.path.isdir(path):
        parts = sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
        )
        if parts:
            probe = parts[0]
            n_parts = len(parts)
    try:
        schema = clean_schema(probe, columns)
    except Exception:
        schema = None
    if n_parts and columns is not None and "override_num_blocks" not in kwargs:
        # One read task per file for PROJECTED scans: Ray's min-200-block
        # default splits each file into tiny sub-blocks (measured: 24 files
        # -> 216 x 33 KB blocks on a 2-column scan), which un-fuses
        # downstream maps from the read and multiplies per-task overhead
        # through every later sort/map stage (flagship window phase 4.0s ->
        # 0.8s from this alone). Full-width scans keep Ray's splitting —
        # there the payload per file is large and finer blocks pipeline
        # better with downstream maps/writes (measured 2.3s vs 5.0s on the
        # flagship transform). Only when files >= half the cores; below
        # that the split parallelism is worth more.
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        if n_parts >= max(4, cpus // 2):
            kwargs = dict(kwargs, override_num_blocks=n_parts)
    ds = ray.data.read_parquet(path, columns=columns, schema=schema, **kwargs)
    try:
        # Tag the BARE read with its spec so fit passes can re-issue a
        # narrower scan (see narrow_read). Downstream transforms return new
        # Dataset objects without the tag, so only untransformed reads ever
        # re-read. ``names`` = all columns available in the source file.
        names = None
        try:
            names = set(pq.read_schema(probe).names)
        except Exception:
            pass
        ds._kamae_read = {"path": path, "columns": columns, "kwargs": kwargs,
                          "names": names, "n_parts": n_parts}
    except Exception:
        pass
    return ds


def narrow_read(ds, cols: list[str]):
    """Re-issue a tagged ``read_parquet_clean`` dataset as a NARROWER scan.

    Measured on Ray 2.49: ``Dataset.select_columns`` stays a separate
    Project operator — it does NOT push into the ReadParquet scan, so the
    full payload (e.g. a wide tokens column) is read and deserialized even
    when a fit pass needs two scalar columns. Passing ``columns=`` at read
    time DOES prune at the scan. This helper closes the gap: when ``ds`` is
    an untransformed read (tagged by read_parquet_clean) and ``cols`` is a
    strict subset of what it reads, return a fresh projected read; else
    return None (caller falls back to select_columns)."""
    info = getattr(ds, "_kamae_read", None)
    if info is None:
        return None
    if info["kwargs"].get("filter") is not None:
        # a row filter may reference columns outside `cols`; re-issuing the
        # read without them makes Ray's fragment sampler fail to bind the
        # expression ("No match for FieldRef...") — don't narrow filtered
        # reads (they are already scan-pruned)
        return None
    cols = list(dict.fromkeys(cols))
    names = info["names"]
    if names is None or not set(cols) <= names:
        return None  # can't validate availability -> don't risk a read error
    cur = set(info["columns"]) if info["columns"] is not None else names
    if not set(cols) < cur:
        return None  # nothing to narrow
    # read_parquet_clean re-applies the per-file block override itself
    return read_parquet_clean(info["path"], columns=cols, **info["kwargs"])


def read_csv_clean(path: str, columns: list[str] | None = None, **kwargs):
    """``ray.data.read_csv`` with optional column projection. CSV has no
    row-group pruning, so projection happens right after parse (one
    ``select_columns``, before any downstream stage sees the batch)."""
    import ray.data

    ds = ray.data.read_csv(path, **kwargs)
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds


def read_json_clean(path: str, columns: list[str] | None = None, **kwargs):
    """``ray.data.read_json`` (newline-delimited JSON) with optional column
    projection."""
    import ray.data

    ds = ray.data.read_json(path, **kwargs)
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds


_SUCCESS = "_SUCCESS"


def _hive_dirs(root: str, col: str) -> dict[str, str]:
    """Existing hive partition dirs for ``col``: {raw_value: dir_path}."""
    import os
    from urllib.parse import unquote

    out: dict[str, str] = {}
    if not os.path.isdir(root):
        return out
    prefix = f"{col}="
    for name in os.listdir(root):
        p = os.path.join(root, name)
        if os.path.isdir(p) and name.startswith(prefix):
            out[unquote(name[len(prefix):])] = p
    return out


def write_partitioned(ds, root: str, partition_col: str, skip_existing: bool = True) -> dict:
    """Resumable hive-partitioned parquet sink: ``root/col=value/*.parquet``
    with a ``_SUCCESS`` marker per completed partition.

    Restart contract (the 100 TB operational requirement — a failed run must
    skip finished work): partitions whose dir carries ``_SUCCESS`` are
    filtered OUT of the input before writing (one broadcast membership set,
    no shuffle); dirs WITHOUT the marker are presumed torn by a killed run
    and are cleaned before the write; markers are stamped only after the
    write completes. Returns ``{"written": [...], "skipped": [...]}``.

    Partition values are compared as strings (hive encoding); the partition
    column reads back as string — the standard hive round-trip caveat."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    existing = _hive_dirs(root, partition_col)
    done = sorted(v for v, p in existing.items() if os.path.exists(os.path.join(p, _SUCCESS)))
    if skip_existing and done:
        done_ref = ray.put(pa.array(done, pa.string()))

        def drop_done(batch: pa.Table) -> pa.Table:
            vals = pc.cast(batch.column(partition_col), pa.string(), safe=False)
            return batch.filter(pc.invert(pc.is_in(vals, value_set=ray.get(done_ref))))

        drop_done.__name__ = "skip_finished_partitions"
        ds = ds.map_batches(drop_done, batch_format="pyarrow", zero_copy_batch=True,
                            batch_size=None)
    # torn partitions (no marker) are always cleaned so the rerun can't
    # duplicate rows; with skip_existing=False the COMPLETED dirs go too —
    # full-overwrite semantics (otherwise write_parquet would append new
    # files alongside the old data under an already-stamped marker)
    for v, p in existing.items():
        if v not in done or not skip_existing:
            shutil.rmtree(p, ignore_errors=True)
    ds.write_parquet(root, partition_cols=[partition_col])
    written = []
    for v, p in _hive_dirs(root, partition_col).items():
        marker = os.path.join(p, _SUCCESS)
        if not os.path.exists(marker):
            with open(marker, "w"):
                pass
            written.append(v)
    return {"written": sorted(written), "skipped": list(done) if skip_existing else []}
