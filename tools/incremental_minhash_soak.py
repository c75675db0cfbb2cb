"""Incremental-MinHash-at-scale soak (X50): build a near-dup
signature index over a large base corpus, PERSIST it to parquet (the
between-crawl state), then near-dup a 30% increment against it with
the object store capped — evidencing that the steady-state crawl
ingest never re-reads old text and stays memory-bounded.

Increment classes (per base id i, disjoint id offsets):
  i % 10 == 0 -> exact re-carry of the base text  (64/64 match: dup)
  i % 10 == 1 -> base text + ' zz qq' tail        (J = 38/42: dup)
  i % 10 == 2 -> fresh doc from a DISJOINT vocab  (0 shared shingles: keep)

All three verdicts are asserted for EVERY increment doc (the corpus
is seed-fixed, so the signature estimates are deterministic; the
tail-append class sits at estimated-Jaccard ~0.905, far above the 1/2
threshold, and fresh docs share no shingles, so cross-matches would
need 64-bit hash collisions).

Usage:  python -m tools.incremental_minhash_soak [n_base] [cap_gb]
Prints one JSON line.
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

SEED = 4321
VOCAB = 5000
WORDS_PER_DOC = 40


def base_parquet(n_docs: int, shards: int = 8) -> str:
    path = f"/tmp/geokit_incmh_soak/n{n_docs}_s{SEED}_sh{shards}"
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
        rng = np.random.default_rng(SEED + s)
        idx = rng.integers(0, VOCAB, (cnt, WORDS_PER_DOC))
        ids = np.arange(start, start + cnt, dtype=np.int64)
        flat = words[idx.reshape(-1)]
        offsets = np.arange(0, (cnt + 1) * WORDS_PER_DOC, WORDS_PER_DOC)
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(flat, pa.string())
        )
        text = pc.binary_join(lists, " ")
        pq.write_table(
            pa.table({"doc_id": pa.array(ids), "text": text}),
            os.path.join(path, f"part-{s:04d}.parquet"),
        )
    open(done, "w").write("ok")
    return path


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cap_gb = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    path = base_parquet(n_base)

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

    from engine.dedupe import incremental_minhash_dedup, minhash_index
    from engine.util import clean_read_schema

    idx_dir = f"/tmp/geokit_incmh_soak/index_n{n_base}"
    if os.path.isdir(idx_dir):  # write_parquet appends; start clean
        import shutil

        shutil.rmtree(idx_dir)

    t0 = time.time()
    base = rd.read_parquet(path, schema=clean_read_schema(f"{path}/part-0000.parquet"))
    minhash_index(base).write_parquet(idx_dir)  # the persisted crawl state
    t_index = time.time() - t0
    idx_bytes = sum(
        os.path.getsize(os.path.join(idx_dir, f))
        for f in os.listdir(idx_dir)
        if f.endswith(".parquet")
    )

    OFF_EXACT, OFF_NEAR, OFF_FRESH = 10 * n_base, 20 * n_base, 30 * n_base

    def make_new(b: pa.Table) -> pa.Table:
        b = b.combine_chunks()
        ids = b["doc_id"]
        txt = b["text"]
        iv = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        m0 = pa.array(iv % 10 == 0)
        m1 = pa.array(iv % 10 == 1)
        m2 = iv[iv % 10 == 2]
        near = pc.binary_join_element_wise(txt.filter(m1), " zz qq", "")
        # fresh docs: disjoint vocabulary, derived deterministically
        # from the doc id (no RNG inside the map); vectorized via a
        # word-table gather + ListArray join
        fwords = np.array([f"f{w:05d}" for w in range(9973)], dtype=object)
        widx = (
            m2[:, None] * 31 + np.arange(WORDS_PER_DOC, dtype=np.int64)[None, :] * 7
        ) % 9973
        lists = pa.ListArray.from_arrays(
            pa.array(
                np.arange(0, (len(m2) + 1) * WORDS_PER_DOC, WORDS_PER_DOC), pa.int32()
            ),
            pa.array(fwords[widx.reshape(-1)], pa.string()),
        )
        fr = pc.binary_join(lists, " ")
        return pa.concat_tables(
            [
                pa.table({"doc_id": pc.add(ids.filter(m0), OFF_EXACT), "text": txt.filter(m0)}),
                pa.table({"doc_id": pc.add(ids.filter(m1), OFF_NEAR), "text": near}),
                pa.table({"doc_id": pa.array(m2 + OFF_FRESH), "text": fr}),
            ]
        )

    t0 = time.time()
    new_ds = base.map_batches(make_new, batch_format="pyarrow")
    index = rd.read_parquet(idx_dir)  # old text never re-read from here on
    verdict = incremental_minhash_dedup(new_ds, index)

    counts = {"exact": [0, 0], "near": [0, 0], "fresh": [0, 0]}  # [rows, correct]
    for b in verdict.iter_batches(batch_format="pyarrow"):
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = b["keep"].to_numpy(zero_copy_only=False)
        dup = b["dup_of"].to_numpy(zero_copy_only=False).astype(np.int64)
        ex = (ids >= OFF_EXACT) & (ids < OFF_NEAR)
        ne = (ids >= OFF_NEAR) & (ids < OFF_FRESH)
        fr = ids >= OFF_FRESH
        counts["exact"][0] += int(ex.sum())
        counts["exact"][1] += int((~keep[ex] & (dup[ex] == ids[ex] - OFF_EXACT)).sum())
        counts["near"][0] += int(ne.sum())
        counts["near"][1] += int((~keep[ne] & (dup[ne] == ids[ne] - OFF_NEAR)).sum())
        counts["fresh"][0] += int(fr.sum())
        counts["fresh"][1] += int((keep[fr] & (dup[fr] == ids[fr])).sum())
    t_incr = time.time() - t0

    n_new = sum(v[0] for v in counts.values())
    assert counts["exact"][0] == counts["exact"][1], counts["exact"]
    assert counts["near"][0] == counts["near"][1], counts["near"]
    assert counts["fresh"][0] == counts["fresh"][1], counts["fresh"]
    assert n_new == sum(len(range(r, n_base, 10)) for r in (0, 1, 2))

    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / (1 << 20)
    print(
        json.dumps(
            {
                "metric": "incremental_minhash_soak",
                "n_base": n_base,
                "n_increment": n_new,
                "cap_gb": cap_gb,
                "index_build_s": round(t_index, 1),
                "index_bytes": idx_bytes,
                "increment_s": round(t_incr, 1),
                "increment_docs_per_s": round(n_new / t_incr, 1),
                "all_verdicts_exact": True,
                "driver_peak_rss_gb": round(rss_gb, 2),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
