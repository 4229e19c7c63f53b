"""Benchmark driver (repo contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], PLUS the north-rule scaling measurement —
the same extraction job over the same pre-synthesized pages parquet
at local[N] and local[4N] (sandbox proxy for N vs 4N executors,
BASELINE.md) — and prints ONE JSON line.

Output keys:
  metric/value/unit/queries/sf      — driver contract
  extraction                        — pages/sec at both parallelism
                                      levels + scaling_efficiency
                                      ((p@4N / p@N) / 4, target >=0.8)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def _run_queries(sf_dir: str, cpus: int) -> tuple[dict, float]:
    from weakscraper_spark.plans.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("bench_queries", master=f"local[{cpus}]")
    qs = entrymod.queries()
    headline = [
        "q1_pricing_summary", "c3_dedup_latest", "c4_group_stats",
        "c5_broadcast_join", "c8_salted_agg", "c9_anti_join_resume",
        "dedup_exact", "minhash_lsh", "jaccard_pairs", "embedding_topk",
        "quality_scores", "simhash_pairs", "extract_pages",
    ]
    times: dict[str, float] = {}
    total = 0.0
    for name in headline:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        times[name] = dt
        total += dt
    spark.stop()
    return times, round(total, 3)


def _synth_bench_pages(n_pages: int, cpus: int, out: str) -> None:
    from weakscraper_spark.plans.session import get_spark
    from weakscraper_spark.sources.synth import synth_pages

    spark = get_spark("bench_synth", master=f"local[{cpus}]")
    # heavier pages than the test corpus (~200-word bodies) so the
    # Python parse stage, not job fixed costs, dominates the timing
    synth_pages(spark, n_pages, min_words=150, rng_words=100) \
        .write.mode("overwrite").parquet(out)
    spark.stop()


def _scaling(n_pages: int, n_lo: int, n_hi: int, workdir: str) -> dict:
    pages_path = os.path.join(workdir, "bench_pages")
    _synth_bench_pages(n_pages, n_hi, pages_path)
    results = {}
    for n in (n_lo, n_hi):
        proc = subprocess.run(
            [sys.executable, "-m", "weakscraper_spark.plans.bench_job",
             f"local[{n}]", pages_path],
            capture_output=True, text=True, cwd=os.path.dirname(
                os.path.abspath(__file__)))
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("{")][-1]
        results[n] = json.loads(line)
    p_lo = results[n_lo]["pages_per_s"]
    p_hi = results[n_hi]["pages_per_s"]
    return {
        f"pages_per_s_local{n_lo}": p_lo,
        f"pages_per_s_local{n_hi}": p_hi,
        f"wall_s_local{n_lo}": results[n_lo]["wall_s"],
        f"wall_s_local{n_hi}": results[n_hi]["wall_s"],
        "pages": results[n_hi]["pages"],
        "scaling_efficiency": round((p_hi / p_lo) / (n_hi / n_lo), 3),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    times, total = _run_queries(sf_dir, cpus)

    workdir = "/tmp/ws_bench"
    os.makedirs(workdir, exist_ok=True)
    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES",
                                 "120000" if sf == "0.1" else "8000"))
    scaling = _scaling(n_pages, max(cpus // 4, 2), cpus, workdir)
    shutil.rmtree(workdir, ignore_errors=True)

    print(json.dumps({
        "metric": "headline query wall-clock + extraction scaling",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf),
        "extraction": scaling,
    }))


if __name__ == "__main__":
    main()
