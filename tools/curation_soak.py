"""Curation-chain soak: the FULL composed pipeline (quality → lang →
PII scrub → exact dedup → near-dup → line dedup → decontamination →
split) over a synthetic corpus ~200x the driver-gate size with the
object store capped, with every defect class planted at an exactly
countable rate on DISJOINT residues of one modulus (no stride
overlaps), so each report counter has one closed-form expected value.

Residue plan (m = doc_id % 1000):
  m=1 German text            -> language drop
  m=2 two tokens             -> min_tokens drop
  m=3 digit soup             -> alpha-ratio drop
  m=4 carries an email       -> scrubbed, survives
  m=5 identical COMMON_A     -> exact-dup drop (all but min id)
  m=6 COMMON_B + 1-token edit-> near-dup drop (all but min id)
  m=7 contains the bench 8-gram -> decontamination drop
  m=8 shared first line + unique second -> one line cut per doc
       after the first (doc survives; ~33% token overlap stays far
       below the 0.5 near-dup threshold)
  else unique good English.

Usage:  python -m tools.curation_soak [n_docs] [cap_gb]
Prints one JSON line; raises if ANY counter misses its expectation.
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

SEED = 7171
VOCAB = 5000
WORDS = 30
BENCH = "the quick brown fox jumps over the lazy dog"
COMMON_A = "the cat and the dog sat in the warm sun for many quiet hours today " + " ".join(
    f"fill{i}" for i in range(16)
)
COMMON_B = "it is a fine day to walk in the park and read a long book " + " ".join(
    f"pad{i}" for i in range(16)
)
COMMON_LINE = "the shared sentinel line is in every marked document here"
MARKERS = "the and of to a in is it that for"


def _texts(ids: np.ndarray, rng: np.random.Generator) -> list[str]:
    # ALPHA-ONLY vocab (digit-heavy fillers would fail the alpha-ratio
    # filter) and ~WORDS random words of per-doc entropy in every
    # surviving template (templates differing only in the doc id are
    # pairwise near-dups and would all merge in the near-dup stage).
    words = np.array(
        [
            f"{chr(97 + i % 26)}{chr(97 + (i // 26) % 26)}{chr(97 + (i // 676) % 26)}x"
            for i in range(VOCAB)
        ],
        dtype=object,
    )
    idx = rng.integers(0, VOCAB, (len(ids), WORDS))
    out = []
    for row, i in enumerate(ids):
        m = i % 1000
        uniq = " ".join(words[idx[row]][:15])
        if m == 1:
            out.append(f"der hund und die katze ist nicht mit der maus {i} zu hause heute")
        elif m == 2:
            out.append("too short")
        elif m == 3:
            out.append(f"the {i} " + " ".join(str(9000 + j) for j in range(20)))
        elif m == 4:
            out.append(f"{MARKERS} contact u{i}@host{i % 7}.net about {uniq}")
        elif m == 5:
            out.append(COMMON_A)
        elif m == 6:
            out.append(COMMON_B.replace("book", f"tome{i}"))
        elif m == 7:
            out.append(f"{MARKERS} intro {BENCH} trailing {uniq}")
        elif m == 8:
            out.append(f"{COMMON_LINE}\n{MARKERS} tail {uniq}")
        else:
            out.append(f"{MARKERS} " + " ".join(words[idx[row]]))
    return out


def corpus_parquet(n_docs: int, shards: int = 8) -> str:
    path = f"/tmp/geokit_curation_soak/n{n_docs}_s{SEED}_sh{shards}"
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return path
    os.makedirs(path, exist_ok=True)
    per = (n_docs + shards - 1) // shards
    for s in range(shards):
        start = s * per
        cnt = min(per, n_docs - start)
        if cnt <= 0:
            break
        rng = np.random.default_rng(SEED + s)
        ids = np.arange(start, start + cnt, dtype=np.int64)
        pq.write_table(
            pa.table({"doc_id": pa.array(ids), "text": pa.array(_texts(ids, rng))}),
            os.path.join(path, f"part-{s:04d}.parquet"),
        )
    open(done, "w").write("ok")
    return path


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
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

    from engine.curation import curate
    from engine.util import clean_read_schema

    # Object-store peak sampler: used = cluster - available (plasma
    # allocation is tracked as a resource). Evidence that the chain
    # STREAMS: peak should stay far below corpus size now that curate()
    # checkpoints multi-pass inputs to parquet instead of materialize().
    import threading

    total_store = float(ray.cluster_resources().get("object_store_memory", 0))
    peak = {"used": 0.0}
    stop = threading.Event()

    def _sample() -> None:
        while not stop.is_set():
            avail = float(
                ray.available_resources().get("object_store_memory", total_store)
            )
            peak["used"] = max(peak["used"], total_store - avail)
            stop.wait(0.2)

    sampler = threading.Thread(target=_sample, daemon=True)
    sampler.start()

    t0 = time.time()
    ds = rd.read_parquet(path, schema=clean_read_schema(f"{path}/part-0000.parquet"))
    out, report = curate(
        ds,
        langs=("en",),
        min_tokens=5,
        min_alpha_milli=500,
        neardup_threshold=0.5,
        scrub_pii=True,
        line_dedup=True,
        contamination_queries=(BENCH,),
        val_permille=50,
    )
    wall = time.time() - t0
    stop.set()
    sampler.join(timeout=2)
    corpus_bytes = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )

    def cnt(m: int) -> int:
        return len(range(m, n_docs, 1000))

    expect = {
        "input": n_docs,
        "after_quality_lang": n_docs - cnt(1) - cnt(2) - cnt(3),
        "pii_docs_scrubbed": cnt(4),
        "exact_dups_dropped": cnt(5) - 1,
        "near_dups_dropped": cnt(6) - 1,
        "lines_dropped": cnt(8) - 1,
        "emptied_docs_dropped": 0,
        "contaminated_dropped": cnt(7),
        "output": n_docs - cnt(1) - cnt(2) - cnt(3) - (cnt(5) - 1)
        - (cnt(6) - 1) - cnt(7),
    }
    mismatches = {
        k: (report.get(k), v) for k, v in expect.items() if report.get(k) != v
    }
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / (1 << 20)
    print(
        json.dumps(
            {
                "metric": "curation_soak",
                "n_docs": n_docs,
                "cap_gb": cap_gb,
                "wall_s": round(wall, 1),
                "docs_per_s": round(n_docs / wall, 1),
                "report": report,
                "exact": not mismatches,
                "mismatches": {k: list(v) for k, v in mismatches.items()},
                "driver_peak_rss_gb": round(rss_gb, 2),
                "corpus_parquet_gb": round(corpus_bytes / (1 << 30), 3),
                "object_store_peak_gb": round(peak["used"] / (1 << 30), 3),
            }
        )
    )
    if mismatches:
        raise SystemExit(f"report counters missed expectations: {mismatches}")
    ray.shutdown()


if __name__ == "__main__":
    main()
