"""Dedup-at-scale soak: the full minhash → LSH → semi-filtered exact
verify → connected components → verdict chain over a synthetic corpus
~100× the driver-gate size, with the object store capped, to evidence
the round-3 verify-path rework (endpoint semi-filter + Bloom
prefilter): only candidate text moves, the driver never sees pairs,
and memory stays bounded.

Usage:  python -m tools.dedup_soak [n_docs] [cap_gb]
Prints one JSON line: wall, docs, keep/drop counts, planted-dup
recall, driver peak RSS. Deterministic (seed 1234): rerunning at the
same n yields the identical verdict (asserted via a content hash).
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SEED = 1234
VOCAB = 5000
WORDS_PER_DOC = 40
NEARDUP_EVERY = 100  # 1% of docs get a 1-word-mutated near-dup twin


def corpus_parquet(n_docs: int, shards: int = 8) -> str:
    """Deterministic sharded word-salad corpus with planted near-dups
    (cached under /tmp). Near-dup twin of doc i (i % NEARDUP_EVERY ==
    0): same words with ONE replaced — Jaccard well above the 0.5
    verdict threshold at 40 words/doc."""
    path = f"/tmp/geokit_dedup_soak/n{n_docs}_s{SEED}_sh{shards}"
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return path
    os.makedirs(path, exist_ok=True)
    words = np.array([f"w{i:04d}" for i in range(VOCAB)], dtype=object)
    per = (n_docs + shards - 1) // shards
    for s in range(shards):
        start = s * per
        cnt = min(per, n_docs - start)
        if cnt <= 0:
            break
        rng = np.random.default_rng(SEED + s)  # shard-deterministic
        idx = rng.integers(0, VOCAB, (cnt, WORDS_PER_DOC))
        ids = np.arange(start, start + cnt, dtype=np.int64)
        twin = ids % NEARDUP_EVERY == 0
        t_idx = idx[twin].copy()
        t_idx[:, 7] = (t_idx[:, 7] + 1) % VOCAB  # mutate word 7
        all_idx = np.concatenate([idx, t_idx])
        all_ids = np.concatenate([ids, ids[twin] + 2 * n_docs])
        flat = words[all_idx.reshape(-1)]
        offsets = np.arange(0, (len(all_idx) + 1) * WORDS_PER_DOC, WORDS_PER_DOC)
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(flat, pa.string())
        )
        text = pc.binary_join(lists, " ")
        t = pa.table({"doc_id": pa.array(all_ids), "text": text})
        pq.write_table(t, os.path.join(path, f"part-{s:04d}.parquet"))
    open(done, "w").write("ok")
    return path


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cap_gb = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    path = corpus_parquet(n_docs)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            object_store_memory=int(cap_gb * (1 << 30)),
            logging_level="ERROR",
        )
    import ray.data as rd

    from engine.dedupe import minhash_dedup_verdict
    from engine.util import clean_read_schema

    t0 = time.time()
    ds = rd.read_parquet(path, schema=clean_read_schema(f"{path}/part-0000.parquet"))
    verdict = minhash_dedup_verdict(ds)
    # Verdict stats via streaming aggregation — the driver never holds
    # the verdict table, only per-block partials.
    kept = dropped = 0
    twin_merged = twin_total = 0
    h = np.uint64(0)
    for b in verdict.iter_batches(batch_format="pyarrow"):
        k = b["keep"].to_numpy(zero_copy_only=False)
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        gid = b["group_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kept += int(k.sum())
        dropped += int((~k).sum())
        tw = ids >= 2 * n_docs
        twin_total += int(tw.sum())
        # a planted twin is recalled iff it groups with its original
        twin_merged += int((gid[tw] == ids[tw] - 2 * n_docs).sum())
        with np.errstate(over="ignore"):
            h ^= np.bitwise_xor.reduce(
                (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                ^ (gid.astype(np.uint64) + k.astype(np.uint64))
            )
    wall = time.time() - t0
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / (1 << 20)
    print(
        json.dumps(
            {
                "metric": "dedup_soak",
                "n_docs_input": n_docs + n_docs // NEARDUP_EVERY,
                "cap_gb": cap_gb,
                "wall_s": round(wall, 1),
                "docs_per_s": round((n_docs + n_docs // NEARDUP_EVERY) / wall, 1),
                "kept": kept,
                "dropped": dropped,
                "planted_twin_recall": round(twin_merged / max(twin_total, 1), 4),
                "verdict_hash": int(h),
                "driver_peak_rss_gb": round(rss_gb, 2),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
