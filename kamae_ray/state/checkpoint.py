"""Per-partition lineage records + resumable runs.

north_rule requirement: a killed run resumes without recomputing completed
partitions. Design (SURVEY.md §4 checkpoint row):

- The unit of resume is an INPUT PARTITION (one input parquet fragment, or a
  contiguous row-range of one). A run = (input files, op-chain content hash).
- Each completed partition writes ``part-{i}.parquet`` plus
  ``lineage-{i}.json`` recording inputs, the op-chain hash, row counts and
  wall-time metrics. The parquet is written to a temp name and renamed after
  the lineage record — a crash can only lose the in-flight partition.
- On restart, partitions whose lineage exists AND matches the current op-hash
  and input fingerprint are skipped; everything else reruns. Outputs are
  byte-stable because every kernel is deterministic (no clocks/rng in
  transform paths; current-time ops pin their timestamp at construction).

This trades cross-partition streaming for restartability on the terminal
write; intermediate stages still stream within each partition's pipeline.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Callable, Sequence


def op_chain_hash(pipeline_model) -> str:
    """Content hash of a fitted pipeline's params (stable across processes)."""
    try:
        stages = pipeline_model.stages
    except AttributeError:
        stages = pipeline_model
    doc = []
    for s in stages:
        params = {k: v for k, v in sorted(s.get_params().items()) if not callable(v)}
        doc.append({"class": type(s).__name__, "params": params})
    payload = json.dumps(doc, sort_keys=True, default=str).encode()
    return hashlib.sha256(payload).hexdigest()[:16]


def _input_fingerprint(files: Sequence[str]) -> str:
    parts = []
    for f in sorted(files):
        st = os.stat(f)
        parts.append(f"{f}:{st.st_size}")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


class ResumableRunner:
    """Run a per-partition pipeline function over input files, skipping
    partitions already completed with matching lineage.

    ``partition_fn(files: list[str]) -> ray.data.Dataset | pa.Table`` builds
    and returns the transformed data for one partition; the runner writes it
    and records lineage. Partition granularity = one input file by default.
    """

    def __init__(self, output_dir: str, op_hash: str):
        self.output_dir = output_dir
        self.op_hash = op_hash
        os.makedirs(output_dir, exist_ok=True)

    def _lineage_path(self, i: int) -> str:
        return os.path.join(self.output_dir, f"lineage-{i:05d}.json")

    def _part_path(self, i: int) -> str:
        return os.path.join(self.output_dir, f"part-{i:05d}.parquet")

    def is_done(self, i: int, files: Sequence[str]) -> bool:
        lp = self._lineage_path(i)
        if not (os.path.exists(lp) and os.path.exists(self._part_path(i))):
            return False
        try:
            with open(lp) as f:
                rec = json.load(f)
        except (json.JSONDecodeError, OSError):
            return False
        return (
            rec.get("op_hash") == self.op_hash
            and rec.get("input_fingerprint") == _input_fingerprint(files)
        )

    def run_partition(self, i: int, files: Sequence[str], partition_fn: Callable) -> dict:
        """Process one partition (skip if lineage says done). Returns metrics."""
        if self.is_done(i, files):
            with open(self._lineage_path(i)) as f:
                rec = json.load(f)
            rec["skipped"] = True
            return rec
        return _compute_and_commit(self.output_dir, self.op_hash, i, list(files), partition_fn)

    def run(self, input_files: Sequence[str], partition_fn: Callable) -> list[dict]:
        """One partition per input file, sequentially on the caller."""
        return [self.run_partition(i, [f], partition_fn) for i, f in enumerate(sorted(input_files))]

    def run_parallel(
        self,
        input_files: Sequence[str],
        partition_fn: Callable,
        *,
        num_cpus: int = 1,
        max_in_flight: int | None = None,
    ) -> list[dict]:
        """One partition per input file, dispatched as Ray tasks.

        The scale path: already-done partitions are skipped driver-side (one
        lineage read each, no task launched); ``partition_fn`` is put into the
        object store ONCE and shared by every task rather than re-shipped per
        submission (it closes over the fitted model's state — vocab dicts,
        moments — which can be MBs). In-flight tasks are bounded by
        ``max_in_flight`` (default 2× cluster CPUs) so a million-partition run
        never floods the scheduler; results commit independently, so a crash
        loses only in-flight partitions. Output/lineage paths must be on
        storage shared by all workers (object store spill / NFS / S3 on a real
        cluster; one local disk in this sandbox).
        """
        import ray

        files = sorted(input_files)
        recs: dict[int, dict] = {}
        pending: list[tuple[int, str]] = []
        for i, f in enumerate(files):
            if self.is_done(i, [f]):
                with open(self._lineage_path(i)) as fh:
                    rec = json.load(fh)
                rec["skipped"] = True
                recs[i] = rec
            else:
                pending.append((i, f))
        if pending:
            fn_ref = ray.put(partition_fn)
            if max_in_flight is None:
                max_in_flight = max(4, int(ray.cluster_resources().get("CPU", 8)) * 2)
            task = ray.remote(num_cpus=num_cpus)(_compute_and_commit)
            in_flight: dict = {}
            it = iter(pending)
            exhausted = False
            while in_flight or not exhausted:
                while not exhausted and len(in_flight) < max_in_flight:
                    try:
                        i, f = next(it)
                    except StopIteration:
                        exhausted = True
                        break
                    in_flight[task.remote(self.output_dir, self.op_hash, i, [f], fn_ref)] = i
                if in_flight:
                    done_refs, _ = ray.wait(list(in_flight), num_returns=1)
                    for ref in done_refs:
                        recs[in_flight.pop(ref)] = ray.get(ref)
        return [recs[i] for i in sorted(recs)]


def _compute_and_commit(output_dir: str, op_hash: str, i: int, files: list, partition_fn: Callable) -> dict:
    """Run one partition and atomically commit part + lineage (driver or worker)."""
    t0 = time.time()
    result = partition_fn(list(files))
    part = os.path.join(output_dir, f"part-{i:05d}.parquet")
    tmp = part + f".tmp.{os.getpid()}"
    import pyarrow as pa
    import pyarrow.parquet as pq

    if isinstance(result, pa.Table):
        rows = result.num_rows
        pq.write_table(result, tmp)
    else:
        # ray Dataset: stream blocks into one file per partition
        tables = [b for b in result.iter_batches(batch_format="pyarrow", batch_size=None)]
        combined = pa.concat_tables(tables) if tables else None
        rows = combined.num_rows if combined is not None else 0
        if combined is not None:
            pq.write_table(combined, tmp)
        else:
            pq.write_table(pa.table({}), tmp)
    os.replace(tmp, part)
    rec = {
        "partition": i,
        "inputs": list(files),
        "input_fingerprint": _input_fingerprint(files),
        "op_hash": op_hash,
        "rows": rows,
        "wall_time_s": round(time.time() - t0, 3),
        "completed_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "skipped": False,
    }
    lp = os.path.join(output_dir, f"lineage-{i:05d}.json")
    with open(lp + f".tmp.{os.getpid()}", "w") as f:
        json.dump(rec, f, indent=1)
    os.replace(lp + f".tmp.{os.getpid()}", lp)
    return rec
