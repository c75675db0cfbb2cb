"""Benchmark harness (driver contract + BASELINE.md protocol).

Plain run: executes the headline pipelines over ``$GRAFT_SF_DIR``
(default /root/testdata/sf0.1) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32)`` and prints ONE JSON line.

``--scaling``: runs the same bench twice in FRESH processes at
num_cpus=8 and num_cpus=32 on the same input — the sandbox proxy for
the N vs 4N node criterion (BASELINE.json:north_rule; no real
multi-node cluster is available here) — and reports both throughputs
plus scaling efficiency, writing BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.preserve_order = False

    from engine.util import filter_ray_empty_block_schema_warnings

    filter_ray_empty_block_schema_warnings()

    from engine.pages import pages_parquet, sf_to_n_rows
    from engine.pipeline import cell_rollup, enrich_pages
    from engine import queries as Q

    # 8x the sf row count by default: at 500k rows the ~0.4 s fixed
    # startup (read planning + worker pool) dominates and understates
    # steady-state throughput by ~2x; pages_rows is reported so the
    # ratio is explicit.
    n_pages = sf_to_n_rows(sf_dir) * int(os.environ.get("GRAFT_PAGES_MULT", "8"))
    pages_path = pages_parquet(n_pages)  # untimed generation (cached)

    # Warm the OS page cache so we measure compute+shuffle, not cold disk.
    import pyarrow.parquet as pq
    import glob

    warm_tables = ["lineitem", "orders", "events", "documents", "embeddings"]
    for f in glob.glob(pages_path + "/*.parquet") + [
        f"{sf_dir}/{t}.parquet" for t in warm_tables
    ]:
        pq.read_table(f)

    results: dict[str, float] = {}

    # One untimed warmup execution: fills the per-worker asset caches
    # and worker process pool, so the timed runs measure steady-state
    # compute + shuffle (BASELINE.md protocol). The box is a shared
    # host with visible steal-time noise -> report the median of 3.
    cell_rollup(enrich_pages(pages_path)).to_pandas()

    import statistics

    n_reps = int(os.environ.get("GRAFT_PAGES_REPS", "3"))
    walls = []
    for _ in range(n_reps):
        t0 = time.time()
        rollup = cell_rollup(enrich_pages(pages_path)).to_pandas()
        walls.append(time.time() - t0)
    # Report BOTH median and min walls (labelled): the shared host
    # shows whole-seconds of steal-time noise, so min approximates the
    # capability number while median is the robust expected-run number;
    # earlier baselines quoted min-of-3 only, which made cross-round
    # throughput comparisons silently apples-to-oranges.
    t_min = min(walls)
    t_med = statistics.median(walls)
    # Only the min wall enters the summed headline (the median is
    # reported top-level, NOT in results — summing both would double-
    # count the pages pipeline in headline_total_sec).
    results["pages_pipeline"] = round(t_min, 3)
    geotagged_rows = int(rollup.cnt.sum())

    extra: dict[str, float] = {}
    if not os.environ.get("GRAFT_BENCH_ONLY_PAGES"):
        for name in [
            "lineitem_agg",
            "segment_revenue",
            "events_daily",
            "doc_token_stats",
            "sessionize",
            "minhash_dedup",
            "ann_bruteforce",
            "helmert_chain",
            "skyline_events",
            "sweep_concurrency",
            "edit_join_docs",
            "snm_pairs_docs",
            "string_agg_orders",
            "global_kth_events",
        ]:
            fn, _ = Q.REGISTRY[name]
            t0 = time.time()
            r = fn(sf_dir)
            if hasattr(r, "to_pandas"):  # Dataset / pa.Table; else already pandas
                r.to_pandas()
            results[name] = round(time.time() - t0, 3)
        # Round-3 additions, timed OUTSIDE the headline sum so
        # headline_total_sec stays comparable across rounds.
        for name in [
            "asof_events",
            "interval_bands",
            "rollup_lineitem",
            "hopping_window",
            "grouped_quantiles",
            "semi_anti_orders",
            "vocab_topk",
            "json_props_stats",
            "cms_heavy_hitters",
            "pivot_orders",
            "moment_stats_events",
            "tfidf_top_terms",
            "repetition_signals",
            "pii_scrub",
            "stratified_sample",
            "line_dedup_docs",
            "lm_quality_scores",
            "semantic_clusters",
            "pack_shards_docs",
            "left_join_f_orders",
            "incremental_dedup",
            "corpus_diff_docs",
            "jaccard_join",
            "domain_cap_docs",
            # Round-4 additions (same out-of-headline contract).
            "winsorized_events",
            "chunk_docs",
            "budget_select_docs",
            "substr_dedup_docs",
            "canonical_urls",
            "decontam_docs",
            "pagerank_docs",
            "revenue_by_nation",
            "distinct_users_per_type",
            "clean_lines_docs",
            "triangle_counts_docs",
            "classifier_scores",
            "shard_shuffle_docs",
            "blocklist_docs",
            "html_extract_docs",
            "snapshot_merge_orders",
            "warc_records",
            "anchor_topk_docs",
            "label_centroids",
            # measured steady-state: its persisted index is bootstrapped
            # untimed below (pre-existing state of an incremental op)
            "incremental_minhash",
            "robots_filter_urls",
            "bpe_merges",
            "inverted_postings",
            "cooc_lift",
            "zorder_points",
            "gopher_quality_docs",
            "funnel_events",
            "dbscan_events",
            "tile_pyramid_events",
            "rect_join_orders",
            "cohort_retention",
        ]:
            if name == "incremental_minhash":
                # untimed bootstrap: build/persist the signature index
                # once so the timed run measures the steady-state
                # ingest (an incremental operator's index is
                # pre-existing state by definition; the build cost is
                # the PREVIOUS crawl's minhash_index pass)
                from engine.queries import _read, minhash_index_cached

                minhash_index_cached(
                    sf_dir,
                    _read(sf_dir, "documents", ["doc_id", "text"],
                          rows_per_block=256),
                )
            fn, _ = Q.REGISTRY[name]
            t0 = time.time()
            r = fn(sf_dir)
            if hasattr(r, "to_pandas"):
                r.to_pandas()
            extra[name] = round(time.time() - t0, 3)

    total = round(sum(results.values()), 3)
    out = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": results,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "pages_rows": n_pages,
        "pages_pipeline_median_sec": round(t_med, 3),
        "pages_walls_all": [round(w, 3) for w in walls],
        "geotagged_rows": geotagged_rows,
        # min-of-reps (capability) and median-of-reps (robust) labelled:
        "pages_rows_per_s": round(n_pages / t_min, 1),
        "pages_rows_per_s_median": round(n_pages / t_med, 1),
    }
    if extra:
        out["extra_queries"] = extra
    ray.shutdown()
    return out


def _hardware_control(lo: int, hi: int, reps: int = 3) -> dict:
    """Pure-CPU multiprocessing control, CPU-PINNED like the bench
    runs: how much speedup the box gives from ``lo`` cores to ``hi``
    cores for embarrassingly parallel work. With affinity pinning and
    no SMT this should be ~hi/lo; a lower number quantifies shared-
    host steal. Medians of ``reps`` measurements per level + spread
    are reported so the ceiling claim carries variance bounds."""
    import multiprocessing as mp
    import statistics

    def measure(nproc: int) -> float:
        old = os.sched_getaffinity(0)
        os.sched_setaffinity(0, set(range(nproc)))
        try:
            with mp.Pool(nproc) as p:
                t0 = time.time()
                p.map(_burn, [6_000_000] * 64)
                return time.time() - t0
        finally:
            os.sched_setaffinity(0, old)

    measure(lo)  # warm the pool path
    t_lo = sorted(measure(lo) for _ in range(reps))
    t_hi = sorted(measure(hi) for _ in range(reps))
    med_lo, med_hi = statistics.median(t_lo), statistics.median(t_hi)
    return {
        "speedup": med_lo / med_hi,
        "t_lo_all": [round(t, 3) for t in t_lo],
        "t_hi_all": [round(t, 3) for t in t_hi],
    }


def _burn(n: int) -> float:
    x = 1.0
    for _ in range(n):
        x = x * 1.0000001 + 1e-9
    return x


def run_scaling(sf_dir: str, pairs=((8, 32),)) -> dict:
    """Scaling protocol (BASELINE.json:north_rule proxy, BASELINE.md):

    - Each CPU level runs in a FRESH process, CPU-PINNED to exactly
      that many cores (``sched_setaffinity`` to cores [0, n) — the box
      has 32 real cores, no SMT), emulating an n-core node rather than
      n Ray slots floating over all 32 cores.
    - INTERLEAVED A/B runs (round-2 verdict #4): the ``n_runs``
      repetitions alternate lo/hi WITHIN the same window
      (lo,hi,lo,hi,...), so shared-host contention drift hits both
      levels equally; the headline number is the MEDIAN of the
      per-adjacent-pair efficiencies, which cancels slow-drift noise
      that a block design (all lo runs, then all hi runs) cannot.
    - ``GRAFT_SCALING_RUNS`` (default 5) interleaved pairs; per-run
      throughput is that run's MEDIAN pages-pipeline wall over
      ``GRAFT_PAGES_REPS`` reps (min-based numbers reported
      alongside, labelled — never silently mixed).
    - A pinned pure-CPU multiprocessing control quantifies the box's
      own ceiling with variance bounds.
    """
    import statistics

    n_runs = int(os.environ.get("GRAFT_SCALING_RUNS", "5"))

    def attempt(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_SF_DIR=sf_dir,
            # 32x corpus (16M rows at sf0.1) for the scaling runs: at
            # 2M rows the ~0.4 s fixed startup is 11% of the 32-CPU
            # wall but 3% of the 8-CPU wall, biasing efficiency DOWN;
            # at 16M rows both walls are dominated by streamed compute
            # (measured: raw 8->32 efficiency 0.40 at 2M rows vs
            # 0.75-0.8 at 8-16M on identical code).
            GRAFT_PAGES_MULT=os.environ.get("GRAFT_PAGES_MULT", "32"),
            GRAFT_PAGES_REPS=os.environ.get("GRAFT_PAGES_REPS", "5"),
            GRAFT_BENCH_ONLY_PAGES="1",
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            preexec_fn=lambda: os.sched_setaffinity(0, set(range(ncpu))),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    rows = []
    results = {}
    for lo, hi in pairs:
        lo_med, hi_med, lo_min, hi_min, paired = [], [], [], [], []
        for _ in range(n_runs):  # A/B interleaving: lo then hi, N times
            a = attempt(lo)
            b = attempt(hi)
            lo_med.append(a["pages_rows_per_s_median"])
            hi_med.append(b["pages_rows_per_s_median"])
            lo_min.append(a["pages_rows_per_s"])
            hi_min.append(b["pages_rows_per_s"])
            paired.append((hi_med[-1] / lo_med[-1]) / (hi / lo))
        pages_rows = b["pages_rows"]
        tp_lo = statistics.median(lo_med)
        tp_hi = statistics.median(hi_med)
        eff_paired = statistics.median(paired)
        eff_agg = (tp_hi / tp_lo) / (hi / lo)
        eff_best = (max(hi_min) / max(lo_min)) / (hi / lo)
        # Paired best-rep estimator: contention on a shared box is
        # one-sided (it only ever ADDS wall time), so within each
        # interleaved pair the best rep (min wall = max rows/s, the
        # `pages_rows_per_s` field) is the least-contaminated sample at
        # each level; the median over pairs then keeps the A/B pairing
        # that cancels slow drift. More robust than pairing medians when
        # a noise spike lands inside one run's rep window.
        paired_minwall = [
            (hb / lb) / (hi / lo) for lb, hb in zip(lo_min, hi_min)
        ]
        eff_paired_best = statistics.median(paired_minwall)
        hw = _hardware_control(lo, hi)
        hw_eff = hw["speedup"] / (hi / lo)
        results[f"{lo}->{hi}"] = {
            "pages_rows_per_s_lo": tp_lo,
            "pages_rows_per_s_hi": tp_hi,
            "efficiency": round(eff_paired, 3),
            "efficiency_paired_all": [round(e, 3) for e in paired],
            "efficiency_paired_bestrep": round(eff_paired_best, 3),
            "efficiency_paired_bestrep_all": [round(e, 3) for e in paired_minwall],
            "efficiency_aggregate_medians": round(eff_agg, 3),
            "efficiency_best_of_runs": round(eff_best, 3),
            "hardware_ceiling_efficiency": round(hw_eff, 3),
            "normalized_efficiency": round(eff_paired / hw_eff, 3),
            "runs_per_level": n_runs,
            "tp_lo_all_medians": sorted(lo_med),
            "tp_hi_all_medians": sorted(hi_med),
            "hw_control": hw,
        }
        rows.append((lo, hi, pages_rows, tp_lo, tp_hi, eff_paired, eff_agg, hw_eff))

    head = results[f"{pairs[0][0]}->{pairs[0][1]}"]
    res = {
        "metric": "scaling_efficiency",
        "value": head["efficiency"],
        "unit": "ratio",
        "sf": sf_dir,
        "pairs": results,
    }
    os.makedirs("BENCH", exist_ok=True)
    # Preserve the hand-maintained execution-variance history section
    # (everything from its "## Round-3 execution variance" heading on):
    # each --scaling run replaces only the headline table + raw record.
    history = ""
    if os.path.exists("BENCH/BASELINE.md"):
        old = open("BENCH/BASELINE.md").read()
        marker = old.find("## Round-3 execution variance")
        if marker >= 0:
            history = "\n" + old[marker:]
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH results — sandbox scaling proxy (interleaved pinned A/B runs)\n\n"
            "No real multi-node cluster exists in this sandbox; per the driver\n"
            "instruction the N-vs-4N-node criterion is evidenced by the same job\n"
            "at two `ray.init(num_cpus=...)` levels, each process CPU-PINNED to\n"
            "exactly that many cores (32 real cores, no SMT), so a level IS an\n"
            "n-core machine. Runs ALTERNATE lo/hi within one window so shared-\n"
            "host drift hits both levels; the headline `eff (paired)` is the\n"
            "median of per-adjacent-pair efficiencies. Aggregate-median and\n"
            "best-of-runs numbers are reported alongside, labelled.\n"
            "`eff (paired best-rep)` pairs each run's BEST rep (min wall)\n"
            "instead of its median — contention is one-sided (only adds\n"
            "time), so the best rep is the least-contaminated sample at each\n"
            "level while the per-pair median still cancels slow drift.\n\n"
            "`hw ceiling` = pinned pure-CPU multiprocessing control (box's own\n"
            "max speedup / (hi/lo)); `normalized = paired eff / hw ceiling`.\n\n"
            "| pair | pages rows | rows/s lo (med) | rows/s hi (med) | eff (paired) | eff (paired best-rep) | eff (agg med) | eff (best) | hw ceiling | normalized |\n"
            "|---|---|---|---|---|---|---|---|---|---|\n"
        )
        for lo, hi, pages_rows, tp_lo, tp_hi, eff_paired, eff_agg, hw_eff in rows:
            f.write(
                f"| {lo}->{hi} | {pages_rows} | {tp_lo} | {tp_hi} | "
                f"{eff_paired:.3f} | "
                f"{results[f'{lo}->{hi}']['efficiency_paired_bestrep']:.3f} | "
                f"{eff_agg:.3f} | "
                f"{results[f'{lo}->{hi}']['efficiency_best_of_runs']:.3f} | "
                f"{hw_eff:.3f} | {eff_paired / hw_eff:.3f} |\n"
            )
        f.write(f"\nraw: `{json.dumps(res)}`\n")
        if history:
            f.write(history)
    return res


if __name__ == "__main__":
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
    else:
        ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        print(json.dumps(run_bench(sf_dir, ncpu)))
