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
  m=5 exact-dup CLIQUES of ~10 (identical within id//10000 blocks)
       -> exact-dup drop (all but the min id of each clique)
  m=6 near-dup TWINS (ids 2000p+6 / 2000p+1006 share per-pair words,
       one trailing token differs) -> near-dup drop (one per pair)
  m=7 contains the bench 8-gram -> decontamination drop
  m=8 shared first line + unique second -> one line cut per doc
       after the first (doc survives; ~33% token overlap stays far
       below the 0.5 near-dup threshold)
  else unique good English.

Dup groups are deliberately BOUNDED (cliques of ~10, twins of 2): the
LSH exact-verify stage is Θ(Σ_cliques |C|²·shingles) by construction —
an earlier variant planting a single 1000-doc near-identical clique
spent its wall clock verifying ~500k true pairs, which measures the
quadratic, not the pipeline (mega-cliques of IDENTICAL docs are
collapsed by the exact-dedup stage before minhash ever runs — the
curate() order — and truly near-identical mega-cliques are a
documented quadratic of all verify-exact LSH designs).

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

SEED = 7276  # bumped: residue plan v6 (rotated marker interleave, no shared prefix)
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


_M = MARKERS.split()


def _eng(rot: int, body: list[str]) -> str:
    """English-marker INTERLEAVE: the 10 langid marker words, rotated
    by ``rot``, woven between the first 10 body words. A fixed shared
    'MARKERS ' prefix on every English doc gave all ~n docs the same 8
    fixed-hash shingles — each minhash band then grows ONE bucket of
    ~n*(8/38)^4 docs, i.e. chance-pair count QUADRATIC in corpus size
    (~30M pairs at 1M docs; measured 320M exploded verify rows).
    Interleaving puts a body word in every 3-shingle, so docs with
    different bodies share no shingles at all."""
    m = _M[rot % 10 :] + _M[: rot % 10]
    toks: list[str] = []
    for k, w in enumerate(body):
        toks.append(w)
        if k < 10:
            toks.append(m[k])
    return " ".join(toks)


def _alpha(n: int) -> str:
    """Non-negative int -> pure-alphabetic token piece (digits would
    drag planted docs under the alpha-ratio threshold)."""
    s = ""
    n = int(n)
    while True:
        s += chr(97 + n % 26)
        n //= 26
        if n == 0:
            return s


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
        uniq_list = list(words[idx[row]][:15])
        if m == 1:
            out.append(f"der hund und die katze ist nicht mit der maus {i} zu hause heute")
        elif m == 2:
            out.append("too short")
        elif m == 3:
            out.append(f"the {i} " + " ".join(str(9000 + j) for j in range(20)))
        elif m == 4:
            # Email kept as ONE intact body token (PII regex target).
            out.append(_eng(i, [f"u{i}@host{i % 7}.net", "contact"] + uniq_list + ["about"]))
        elif m == 5:
            # Identical within an id//10000 block (rot keyed on the
            # BLOCK); block words unique by construction (namespaced
            # pure-alpha tokens), so exact-dedup KEEPERS share no
            # shingles and never merge in the near-dup stage.
            b = i // 10_000
            bw = [f"blk{_alpha(b)}w{_alpha(j)}" for j in range(25)]
            out.append(_eng(b, bw + ["same", "exact", "text", "here"]))
        elif m == 6:
            # Twins share rot (keyed on the PAIR) and all pair words,
            # differing in one trailing token -> J ~ 0.95.
            p = i // 2000
            pw = [f"pair{_alpha(p)}w{_alpha(j)}" for j in range(30)]
            edit = "editzero" if (i // 1000) % 2 == 0 else "editone"
            out.append(_eng(p, pw + [edit]))
        elif m == 7:
            # BENCH appended VERBATIM (decontamination needs the
            # contiguous 8-gram); shared within this sparse class only.
            out.append(_eng(i, uniq_list + ["intro"]) + " " + BENCH)
        elif m == 8:
            out.append(f"{COMMON_LINE}\n" + _eng(i, uniq_list))
        else:
            out.append(_eng(i, list(words[idx[row]])))
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

    # Bounded dup groups: exact cliques = distinct id//10000 blocks
    # among m=5 ids; near-dup groups = distinct pair indices id//2000
    # among m=6 ids (a lone unpaired doc keeps itself).
    exact_groups = len({i // 10_000 for i in range(5, n_docs, 1000)})
    near_groups = len({i // 2000 for i in range(6, n_docs, 1000)})
    expect = {
        "input": n_docs,
        "after_quality_lang": n_docs - cnt(1) - cnt(2) - cnt(3),
        "pii_docs_scrubbed": cnt(4),
        "exact_dups_dropped": cnt(5) - exact_groups,
        "near_dups_dropped": cnt(6) - near_groups,
        "lines_dropped": cnt(8) - 1,
        "emptied_docs_dropped": 0,
        "contaminated_dropped": cnt(7),
        "output": n_docs - cnt(1) - cnt(2) - cnt(3) - (cnt(5) - exact_groups)
        - (cnt(6) - near_groups) - cnt(7),
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
