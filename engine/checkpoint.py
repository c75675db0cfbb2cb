"""Checkpoint-resumable partitioned runs with per-partition lineage +
metrics (north_rule: "resumable from checkpoint with per-partition
lineage + metrics"; SURVEY.md §4 checkpoint row).

Layout (resumable output, never one giant file):

    out_dir/
      part=00000/ *.parquet          # one directory per input shard group
      _manifest/part-00000.json      # lineage + metrics, written AFTER
                                     # the partition's data is durable
      _manifest/run.json             # run-level metrics (finalize_run)

A partition is complete iff its manifest exists — data files are
written first, the manifest write is the atomic commit point (written
to a temp file then os.replace). On resume, completed partitions are
skipped by filtering the shard list; a partition that died mid-write
leaves data files but no manifest and is re-run (output dir wiped
first), so retries never double-count.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from ray.data import Dataset

import geokit


def _manifest_path(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, "_manifest", f"part-{part:05d}.json")


def completed_partitions(out_dir: str) -> set[int]:
    mdir = os.path.join(out_dir, "_manifest")
    if not os.path.isdir(mdir):
        return set()
    out = set()
    for f in os.listdir(mdir):
        if f.startswith("part-") and f.endswith(".json"):
            out.add(int(f[5:-5]))
    return out


def run_resumable(
    shards: list[str],
    out_dir: str,
    pipeline_fn: Callable[[list[str]], Dataset],
    shard_group_size: int = 8,
    kernel_version: str = "1",
) -> dict:
    """Run ``pipeline_fn(shard_group) -> Dataset`` over groups of input
    shards, writing each group to its own partition dir + manifest.
    Already-manifested partitions are skipped. Returns run metrics."""
    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
    shards = sorted(shards)
    groups = [shards[i : i + shard_group_size] for i in range(0, len(shards), shard_group_size)]
    done = completed_partitions(out_dir)
    t_run = time.time()
    skipped, executed, rerun_stale, total_rows = 0, 0, 0, 0
    for part, group in enumerate(groups):
        if part in done:
            # A manifest only proves THIS shard group is complete if it
            # recorded the same src_files — a changed shard list or
            # group size shifts groups and would otherwise silently
            # skip unprocessed shards.
            with open(_manifest_path(out_dir, part)) as f:
                recorded = json.load(f).get("src_files")
            if recorded == group:
                skipped += 1
                continue
            os.unlink(_manifest_path(out_dir, part))
            rerun_stale += 1
        part_dir = os.path.join(out_dir, f"part={part:05d}")
        # A dead mid-write run leaves data without a manifest: wipe.
        if os.path.isdir(part_dir):
            for f in os.listdir(part_dir):
                os.unlink(os.path.join(part_dir, f))
        t0 = time.time()
        ds = pipeline_fn(group)
        ds.write_parquet(part_dir)
        # Row count from the durable files themselves (metadata only),
        # so the manifest records what is actually on disk.
        import pyarrow.parquet as pq

        n_rows = sum(
            pq.ParquetFile(os.path.join(part_dir, f)).metadata.num_rows
            for f in os.listdir(part_dir)
            if f.endswith(".parquet")
        )
        total_rows += n_rows
        manifest = {
            "part": part,
            "src_files": group,
            "rows_out": n_rows,
            "wall_sec": round(time.time() - t0, 3),
            "kernel_version": kernel_version,
            "geokit_version": getattr(geokit, "__version__", "0"),
            "written_at": time.time(),
        }
        tmp = _manifest_path(out_dir, part) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, _manifest_path(out_dir, part))
        executed += 1
    metrics = {
        "partitions": len(groups),
        "executed": executed,
        "skipped_complete": skipped,
        "rerun_stale_manifest": rerun_stale,
        "rows_out_this_run": total_rows,
        "wall_sec": round(time.time() - t_run, 3),
    }
    tmp = os.path.join(out_dir, "_manifest", "run.json.tmp")
    with open(tmp, "w") as f:
        json.dump(metrics, f)
    os.replace(tmp, os.path.join(out_dir, "_manifest", "run.json"))
    return metrics
