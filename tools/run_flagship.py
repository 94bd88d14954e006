"""Resumable flagship run: per-partition transform with lineage checkpoints.

Demonstrates the north_rule resumability contract end-to-end: fit once
(stats checkpointed with the model), then transform each input shard as its
own partition via state/checkpoint.ResumableRunner — `part-{i}.parquet` +
`lineage-{i}.json` per shard, temp-file + rename commit. Kill the process at
any point (`--kill-after K` simulates it); rerunning skips completed
partitions and byte-identically completes the rest.

    python tools/run_flagship.py --rows 60000 --out /tmp/kamae_flagship
    python tools/run_flagship.py --rows 60000 --out /tmp/kamae_flagship --kill-after 2
"""

from __future__ import annotations

import argparse
import glob
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kamae_ray.sources.io import read_parquet_clean  # noqa: E402 (needs sys.path above)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=60_000)
    ap.add_argument("--input", default=None, help="existing multi-file parquet dir (default: synthesize --rows)")
    ap.add_argument("--out", default="/tmp/kamae_flagship")
    ap.add_argument("--kill-after", type=int, default=None, help="simulate a crash after K partitions")
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # under `ray job submit` / an existing cluster, RAY_ADDRESS points at
        # the cluster — attach instead of starting a local instance
        addr = os.environ.get("RAY_ADDRESS")
        if addr and addr != "local":
            ray.init(address="auto", logging_level=logging.ERROR)
        else:
            ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False, logging_level=logging.ERROR)

    import pyarrow.parquet as pq

    from kamae_ray.pipelines import Pipeline, PipelineModel
    from kamae_ray.sources.synth import tokens_table_path
    from kamae_ray.stages import (
        ArrayCropTransformer,
        HashIndexTransformer,
        LogTransformer,
        StandardScaleEstimator,
        StringIndexEstimator,
    )
    from kamae_ray.state.checkpoint import ResumableRunner, op_chain_hash

    in_dir = args.input or tokens_table_path(args.rows)
    files = sorted(glob.glob(os.path.join(in_dir, "*.parquet")))

    # fit once; the fitted model IS part of the lineage (op hash covers its
    # state, so a changed fit invalidates prior partitions)
    model_dir = os.path.join(args.out, "model")
    pipe = Pipeline(
        [
            ArrayCropTransformer(input_col="tokens", array_length=128, pad_value=-1, output_col="tokens_128"),
            LogTransformer(input_col="n_tok", alpha=1.0, output_col="log_n_tok"),
            StandardScaleEstimator(input_col="n_tok", output_col="n_tok_std"),
            StringIndexEstimator(input_col="source", output_col="source_idx"),
            HashIndexTransformer(input_col="doc_id", num_bins=65_536, output_col="doc_bucket"),
        ]
    )
    if os.path.exists(os.path.join(model_dir, "pipeline.json")):
        model = PipelineModel.load(model_dir)
        print(f"resumed fitted model from {model_dir}")
    else:
        model = pipe.fit(read_parquet_clean(in_dir))
        model.save(model_dir)
        print(f"fitted and saved model to {model_dir}")

    runner = ResumableRunner(os.path.join(args.out, "parts"), op_chain_hash(model))

    def partition_fn(fs):
        return model.transform(pq.read_table(fs[0]))

    done = skipped = 0
    if args.kill_after is not None:
        # crash-simulation path runs sequentially so "after K partitions" is
        # well-defined; the real run below dispatches partitions as parallel
        # Ray tasks
        for i, f in enumerate(sorted(files)):
            if done >= args.kill_after:
                print(f"SIMULATED CRASH after {done} fresh partitions ({skipped} skipped)")
                ray.shutdown()
                sys.exit(1)
            rec = runner.run_partition(i, [f], partition_fn)
            if rec["skipped"]:
                skipped += 1
            else:
                done += 1
                print(f"partition {i}: {rec['rows']} rows in {rec['wall_time_s']}s")
    else:
        for rec in runner.run_parallel(sorted(files), partition_fn):
            if rec["skipped"]:
                skipped += 1
            else:
                done += 1
                print(f"partition {rec['partition']}: {rec['rows']} rows in {rec['wall_time_s']}s")
    total_rows = sum(
        json.load(open(p))["rows"] for p in sorted(glob.glob(os.path.join(args.out, "parts", "lineage-*.json")))
    )
    print(f"COMPLETE: {done} computed, {skipped} skipped, {total_rows} total rows -> {args.out}/parts")
    ray.shutdown()


if __name__ == "__main__":
    main()
