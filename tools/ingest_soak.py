"""Multi-increment dedup-index lifecycle soak (VERDICT-r3 #5): proves
the persisted digest index is the steady-state append-only ingest
design — N crawl increments arrive, each is deduped against the index
WITHOUT re-reading any earlier increment's text, keepers extend the
index, the index is compacted (rewritten as one partitioned parquet
snapshot per increment) and its growth stays exactly content-bounded.

Planted plan (r = doc_id % 100, increment k holds ids [k*n, (k+1)*n)):
  r==1           -> duplicate of increment 0's same-position doc
                    (unique in increment 0; a cross-increment dup with
                    dup_of == id % n in every later increment)
  r==2 / r==3    -> within-increment twins (content keyed to the r==2
                    id; the r==3 doc is dropped, dup_of == id - 1)
  else           -> globally unique

Closed-form expectations per increment k:
  keepers(0)   = n - #r3                (r1 still unique)
  keepers(k>0) = n - #r1 - #r3
  index rows after k = (n - #r3) + k * (n - #r1 - #r3)

Also reported: digest-collision count (distinct digest pairs vs index
rows — expected 0 with the 128-bit FNV pair), per-increment wall,
compacted index bytes/files, verified dup_of spot checks.

Usage: python -m tools.ingest_soak [n_per_increment] [n_increments]
Prints one JSON line; raises if ANY expectation misses.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 4242


def _texts(ids: np.ndarray, n: int) -> list[str]:
    out = []
    for i in ids:
        r = i % 100
        if r == 1:
            key = i % n  # increment 0's same-position doc
        elif r == 3:
            key = i - 1  # twin of the preceding r==2 doc
        else:
            key = i
        out.append(
            f"document body {key} with shared words the and of to for "
            f"plus unique token u{key}x and tail t{key % 7}"
        )
    return out


def _increment_parquet(root: str, k: int, n: int) -> str:
    path = os.path.join(root, f"inc-{k:03d}.parquet")
    if not os.path.exists(path):
        ids = np.arange(k * n, (k + 1) * n, dtype=np.int64)
        pq.write_table(
            pa.table({"doc_id": pa.array(ids), "text": pa.array(_texts(ids, n))}),
            path,
        )
    return path


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    k_total = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    root = f"/tmp/geokit_ingest_soak/n{n}_k{k_total}_s{SEED}"
    os.makedirs(root, exist_ok=True)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data as rd

    from engine.dedupe import exact_dedup_index, incremental_exact_dedup
    from engine.joins import semi_filter
    from engine.util import clean_read_schema

    def cnt(r: int) -> int:
        return len(range(r, n, 100))

    idx_dir = None
    increments = []
    expect_rows = 0
    for k in range(k_total):
        t0 = time.time()
        inc_path = _increment_parquet(root, k, n)
        new_ds = rd.read_parquet(inc_path, schema=clean_read_schema(inc_path))
        if k == 0:
            kept_expect = n - cnt(3)
            # Bootstrap: the first increment IS the corpus.
            verd = None
            kept_ids = None
            new_index = exact_dedup_index(new_ds)
            kept = int(new_index.count())
        else:
            index = rd.read_parquet(idx_dir, schema=clean_read_schema(idx_dir))
            verd = incremental_exact_dedup(new_ds, index).materialize()
            kept_expect = n - cnt(1) - cnt(3)
            kept_tbl = verd.filter(lambda r: r["keep"])  # noqa: ARG005
            kept_ids = np.sort(
                np.concatenate(
                    [
                        b["doc_id"].to_numpy(zero_copy_only=False)
                        for b in kept_tbl.iter_batches(batch_format="pyarrow")
                    ]
                    or [np.zeros(0, dtype=np.int64)]
                )
            )
            kept = int(len(kept_ids))
            # dup_of spot check: every r==1 doc maps to increment 0.
            bad = 0
            for b in verd.iter_batches(batch_format="pyarrow"):
                ids = b["doc_id"].to_numpy(zero_copy_only=False)
                dof = b["dup_of"].to_numpy(zero_copy_only=False)
                r1 = ids % 100 == 1
                bad += int((dof[r1] != ids[r1] % n).sum())
                r3 = ids % 100 == 3
                bad += int((dof[r3] != ids[r3] - 1).sum())
            if bad:
                raise SystemExit(f"inc {k}: {bad} wrong dup_of verdicts")
            kept_docs = semi_filter(new_ds, kept_ids, "doc_id")
            new_index = index.union(exact_dedup_index(kept_docs))
        if kept != kept_expect:
            raise SystemExit(f"inc {k}: keepers {kept} != expected {kept_expect}")
        # Compaction: rewrite the whole index as ONE parquet snapshot
        # (old snapshot dropped after the new one is durable).
        new_dir = os.path.join(root, f"index-v{k:03d}")
        if os.path.isdir(new_dir):
            shutil.rmtree(new_dir)
        new_index.write_parquet(new_dir)
        old_dir, idx_dir = idx_dir, new_dir
        if old_dir:
            shutil.rmtree(old_dir)
        expect_rows = (n - cnt(3)) + k * (n - cnt(1) - cnt(3))
        files = [f for f in os.listdir(idx_dir) if f.endswith(".parquet")]
        rows = sum(
            pq.ParquetFile(os.path.join(idx_dir, f)).metadata.num_rows for f in files
        )
        if rows != expect_rows:
            raise SystemExit(f"inc {k}: index rows {rows} != expected {expect_rows}")
        increments.append(
            {
                "k": k,
                "kept": kept,
                "index_rows": rows,
                "index_files": len(files),
                "index_mb": round(
                    sum(os.path.getsize(os.path.join(idx_dir, f)) for f in files)
                    / 1e6,
                    2,
                ),
                "wall_s": round(time.time() - t0, 1),
            }
        )

    # Digest-collision stats over the final index: distinct pairs must
    # equal rows (one row per distinct content by construction).
    import duckdb

    dups = duckdb.sql(
        f"SELECT COUNT(*) - COUNT(DISTINCT (d1, d2)) FROM read_parquet('{idx_dir}/*.parquet')"
    ).fetchone()[0]
    if dups:
        raise SystemExit(f"{dups} digest collisions in the final index")
    print(
        json.dumps(
            {
                "metric": "ingest_soak",
                "n_per_increment": n,
                "n_increments": k_total,
                "total_docs": n * k_total,
                "final_index_rows": expect_rows,
                "digest_collisions": 0,
                "exact": True,
                "increments": increments,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
