"""10× scale proof (VERDICT r05 #5): run the flagship extraction job
and one dedup path (MinHash-LSH) on a corpus 10× the bench size, at
two parallelism levels, and record

- pages/s + N→4N scaling efficiency at BOTH corpus sizes,
- wall growth vs row growth (the ~linear-or-better check that a
  hidden superlinear term would break — none of the sf0.1 walls can
  show one),
- that the PHYSICAL PLAN is unchanged across the 10× step (node-name
  sequence equality from explain("formatted") — a plan that flips
  strategy with size would invalidate the extrapolation).

Writes BENCH/scale10x.md. Same measurement discipline as bench.py
(noise-probe gating, interleaved rounds, min walls; this VM has
bursty noisy-neighbor steal).

Usage:  python tools/scale10x.py            (~10-15 min)
Env:    SCALE10X_BASE_PAGES (default 12000), SCALE10X_ROUNDS (2)
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (noise gate + hard-stop helpers)

WORKDIR = "/tmp/ws_scale10x"


def _plan_nodes(df) -> list[str]:
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return [m.group(1) for m in
            re.finditer(r"^\s*[*+-]*\s*\(\d+\)\s+(\w+)", buf.getvalue(),
                        re.M)]


def _extract_phase(base_pages: int, rounds: int) -> dict:
    """bench_job (scan → BHJ → Arrow extract) at 1× and 10× corpus
    size, local[2] vs local[8] interleaved."""
    sizes = {"1x": base_pages, "10x": base_pages * 10}
    paths = {}
    for tag, n in sizes.items():
        p = os.path.join(WORKDIR, f"pages_{tag}")
        bench._synth_bench_pages(n, 32, p)
        paths[tag] = p

    walls: dict[tuple[str, int], list[float]] = {
        (tag, m): [] for tag in sizes for m in (2, 8)}
    probes = []
    for _ in range(rounds):
        r, _w = bench._wait_for_quiet(240)
        probes.append(round(r, 2))
        for tag in sizes:
            for m in (8, 2):
                proc = subprocess.run(
                    [sys.executable, "-m",
                     "weakscraper_spark.plans.bench_job",
                     f"local[{m}]", paths[tag]],
                    capture_output=True, text=True, cwd=REPO)
                lines = [ln for ln in proc.stdout.splitlines()
                         if ln.startswith("{")]
                if proc.returncode or not lines:
                    # surface the child's failure instead of a bare
                    # IndexError that throws away 15 min of ladder
                    # work and its diagnosis (r06 review)
                    raise RuntimeError(
                        f"bench_job local[{m}] {tag} failed "
                        f"(rc={proc.returncode}): "
                        f"{proc.stderr[-2000:]}")
                walls[(tag, m)].append(json.loads(lines[-1])["wall_s"])

    out = {"noise_probe_per_round": probes}
    for tag, n in sizes.items():
        w2 = min(walls[(tag, 2)])
        w8 = min(walls[(tag, 8)])
        out[tag] = {
            "pages": n, "wall_s_local2": w2, "wall_s_local8": w8,
            "pages_per_s_local2": round(n / w2, 1),
            "pages_per_s_local8": round(n / w8, 1),
            "scaling_efficiency": round((w2 / w8) / 4, 3),
            "all_walls": {"local2": walls[(tag, 2)],
                          "local8": walls[(tag, 8)]},
        }
    out["wall_growth_local8"] = round(
        out["10x"]["wall_s_local8"] / out["1x"]["wall_s_local8"], 2)
    out["row_growth"] = 10.0
    return out


def _minhash_phase(base_docs: int, rounds: int) -> dict:
    """minhash_lsh_pairs at 1× and 10× document count, local[8];
    plus the plan-unchanged audit at both sizes."""
    from weakscraper_spark.operators.dedup import minhash_lsh_pairs
    from weakscraper_spark.plans.session import get_spark
    from weakscraper_spark.sources.synth import synth_rich_text
    from pyspark.sql import functions as F

    spark = get_spark("scale10x_minhash", master="local[8]")
    sizes = {"1x": base_docs, "10x": base_docs * 10}
    dfs = {}
    for tag, n in sizes.items():
        p = os.path.join(WORKDIR, f"docs_{tag}")
        (synth_rich_text(spark, n, partitions=max(16, n // 500))
         .select("doc_id", "text", F.lit("en").alias("lang"),
                 F.lit("synth").alias("source"),
                 F.length("text").alias("n_chars"))
         .write.mode("overwrite").parquet(p))
        dfs[tag] = spark.read.parquet(p)

    plans = {tag: _plan_nodes(minhash_lsh_pairs(dfs[tag]))
             for tag in sizes}
    walls: dict[str, list[float]] = {tag: [] for tag in sizes}
    # untimed warmup (python daemon fork, pandas import)
    minhash_lsh_pairs(dfs["1x"]).write.format("noop") \
        .mode("overwrite").save()
    for _ in range(rounds):
        bench._wait_for_quiet(120)
        for tag in sizes:
            # the operator persists its signature relation; Spark's
            # CacheManager matches by LOGICAL PLAN, so without this a
            # later round silently reuses the earlier round's cache
            # and times a warm read instead of the job (caught r06:
            # 50k docs "ran" in 1.3 s)
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            minhash_lsh_pairs(dfs[tag]).write.format("noop") \
                .mode("overwrite").save()
            walls[tag].append(round(time.perf_counter() - t0, 2))
    bench._stop_hard(spark)
    return {
        "1x": {"docs": sizes["1x"], "wall_s": min(walls["1x"])},
        "10x": {"docs": sizes["10x"], "wall_s": min(walls["10x"])},
        "all_walls": walls,
        "wall_growth": round(min(walls["10x"]) / min(walls["1x"]), 2),
        "row_growth": 10.0,
        "plan_unchanged": plans["1x"] == plans["10x"],
        "plan_nodes": plans["1x"],
    }


def _graph_phase(rounds: int) -> dict:
    """The two heaviest shuffle-loop walls at 1× and 10× graph size
    (VERDICT r06 #4) — where a superlinear term would actually live
    (per-round join cost, lineage truncation, checkpoint behavior):

    - connected_components (minprop): deterministic chain-clusters of
      8 nodes, so the ROUND COUNT is constant across the 10× step and
      the measurement isolates per-round join+agg cost vs edge count.
      200k → 2M nodes (~175k → 1.75M edges).
    - pagerank (10 fixed power iterations): host graph from the
      linked-corpus generator with BOTH pages and hosts scaled 10×
      (12k pages / 50 hosts → 120k / 500), edge extraction
      precomputed UNTIMED to parquet so the wall is the loop alone.

    Same cache discipline as the minhash phase: clearCache() per
    round (Spark's CacheManager matches by logical plan — a repeat
    round would otherwise time a warm read)."""
    from weakscraper_spark.operators.graph import connected_components
    from weakscraper_spark.operators.links import (extract_links,
                                                   host_graph,
                                                   pagerank)
    from weakscraper_spark.plans.session import get_spark
    from weakscraper_spark.sources.synth import synth_linked_pages
    from pyspark.sql import functions as F

    spark = get_spark("scale10x_graph", master="local[8]")
    cc_sizes = {"1x": 200_000, "10x": 2_000_000}
    cc_dfs = {}
    for tag, n in cc_sizes.items():
        p = os.path.join(WORKDIR, f"cc_edges_{tag}")
        (spark.range(n, numPartitions=max(16, n // 100_000))
         .filter((F.col("id") % 8) != 7)
         .select(F.col("id").alias("doc_a"),
                 (F.col("id") + 1).alias("doc_b"))
         .write.mode("overwrite").parquet(p))
        cc_dfs[tag] = spark.read.parquet(p)

    pr_sizes = {"1x": (12_000, 50), "10x": (120_000, 500)}
    pr_dfs = {}
    for tag, (n_pages, n_hosts) in pr_sizes.items():
        p = os.path.join(WORKDIR, f"pr_edges_{tag}")
        (host_graph(extract_links(synth_linked_pages(
            spark, n_pages, n_hosts=n_hosts,
            partitions=max(16, n_pages // 1000))))
         .write.mode("overwrite").parquet(p))
        pr_dfs[tag] = spark.read.parquet(p)
    pr_edges = {tag: pr_dfs[tag].count() for tag in pr_sizes}

    # untimed warmup
    connected_components(cc_dfs["1x"]).write.format("noop") \
        .mode("overwrite").save()
    cc_walls: dict[str, list[float]] = {t: [] for t in cc_sizes}
    pr_walls: dict[str, list[float]] = {t: [] for t in pr_sizes}
    for _ in range(rounds):
        bench._wait_for_quiet(120)
        for tag in cc_sizes:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            connected_components(cc_dfs[tag]).write.format("noop") \
                .mode("overwrite").save()
            cc_walls[tag].append(round(time.perf_counter() - t0, 2))
        for tag in pr_sizes:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            pagerank(pr_dfs[tag], iters=10).write.format("noop") \
                .mode("overwrite").save()
            pr_walls[tag].append(round(time.perf_counter() - t0, 2))

    # plan identity: both loops run eagerly, so compare the FINAL
    # returned plan (checkpoint-truncated result relation) across the
    # 10× step — a strategy flip with size would show here
    cc_plans = {t: _plan_nodes(connected_components(cc_dfs[t]))
                for t in cc_sizes}
    pr_plans = {t: _plan_nodes(pagerank(pr_dfs[t], iters=10))
                for t in pr_sizes}
    bench._stop_hard(spark)
    return {
        "cc": {"1x": {"nodes": cc_sizes["1x"],
                      "wall_s": min(cc_walls["1x"])},
               "10x": {"nodes": cc_sizes["10x"],
                       "wall_s": min(cc_walls["10x"])},
               "all_walls": cc_walls,
               "wall_growth": round(min(cc_walls["10x"]) /
                                    min(cc_walls["1x"]), 2),
               "plan_unchanged": cc_plans["1x"] == cc_plans["10x"]},
        "pagerank": {"1x": {"pages": pr_sizes["1x"][0],
                            "edges": pr_edges["1x"],
                            "wall_s": min(pr_walls["1x"])},
                     "10x": {"pages": pr_sizes["10x"][0],
                             "edges": pr_edges["10x"],
                             "wall_s": min(pr_walls["10x"])},
                     "all_walls": pr_walls,
                     "edge_growth": round(pr_edges["10x"] /
                                          pr_edges["1x"], 1),
                     "wall_growth": round(min(pr_walls["10x"]) /
                                          min(pr_walls["1x"]), 2),
                     "plan_unchanged":
                         pr_plans["1x"] == pr_plans["10x"]},
    }


def main() -> None:
    os.makedirs(WORKDIR, exist_ok=True)
    base_pages = int(os.environ.get("SCALE10X_BASE_PAGES", "12000"))
    rounds = int(os.environ.get("SCALE10X_ROUNDS", "2"))

    # a cached extract-phase result lets the (cheap) minhash phase be
    # re-measured without repeating the ~15-min extraction ladder
    cache = os.environ.get("SCALE10X_EXT_CACHE", "")
    if cache and os.path.exists(cache):
        with open(cache) as fh:
            ext = json.load(fh)
    else:
        ext = _extract_phase(base_pages, rounds)
        if cache:
            with open(cache, "w") as fh:
                json.dump(ext, fh)
    mh = _minhash_phase(5000, rounds)
    gr = _graph_phase(rounds)
    cc, pr = gr["cc"], gr["pagerank"]

    md = os.path.join(REPO, "BENCH", "scale10x.md")
    with open(md, "w") as fh:
        fh.write(f"""# 10× scale proof (r06; graph phase r07)

Flagship extraction + MinHash-LSH dedup at 1× and 10× the bench
corpus, measured with the bench.py discipline (noise-gated,
interleaved, min-of-{rounds} rounds). Generated by tools/scale10x.py.

## Extraction (scan → broadcast join → Arrow extract, bench_job)

| corpus | pages | local[2] wall | local[8] wall | pages/s @8 | N→4N eff |
|---|---|---|---|---|---|
| 1× | {ext['1x']['pages']} | {ext['1x']['wall_s_local2']} s | {ext['1x']['wall_s_local8']} s | {ext['1x']['pages_per_s_local8']} | {ext['1x']['scaling_efficiency']} |
| 10× | {ext['10x']['pages']} | {ext['10x']['wall_s_local2']} s | {ext['10x']['wall_s_local8']} s | {ext['10x']['pages_per_s_local8']} | {ext['10x']['scaling_efficiency']} |

Wall growth at local[8]: **{ext['wall_growth_local8']}×** for
**{ext['row_growth']}×** rows — no superlinear term in the map-only
extract path (fixed per-job constants amortize, so <10× is expected).

## MinHash-LSH near-dup pairs (capped band self-join), local[8]

| corpus | docs | wall |
|---|---|---|
| 1× | {mh['1x']['docs']} | {mh['1x']['wall_s']} s |
| 10× | {mh['10x']['docs']} | {mh['10x']['wall_s']} s |

Wall growth: **{mh['wall_growth']}×** for **{mh['row_growth']}×**
rows. Physical plan IDENTICAL across the 10× step (node-name
sequence equality from explain("formatted")):
**{mh['plan_unchanged']}**.

Plan nodes (both sizes): `{' → '.join(mh['plan_nodes'])}`

## Iterative shuffle loops (r07: VERDICT r06 #4), local[8]

The two heaviest walls in the headline set are fixed-iteration graph
loops — where a superlinear term would actually live (per-round join
cost, lineage truncation, checkpoint behavior). Both measured at 1×
and 10× GRAPH size with cold caches per round (CacheManager is
plan-keyed) and plan-identity asserted across the step.

### connected_components (minprop; chain-clusters of 8 ⇒ constant round count)

| graph | nodes | wall | plan unchanged |
|---|---|---|---|
| 1× | {cc['1x']['nodes']} | {cc['1x']['wall_s']} s | — |
| 10× | {cc['10x']['nodes']} | {cc['10x']['wall_s']} s | {cc['plan_unchanged']} |

Wall growth **{cc['wall_growth']}×** for **10×** nodes/edges.

### pagerank (10 fixed power iterations; pages AND hosts ×10)

| graph | pages | host edges | wall | plan unchanged |
|---|---|---|---|---|
| 1× | {pr['1x']['pages']} | {pr['1x']['edges']} | {pr['1x']['wall_s']} s | — |
| 10× | {pr['10x']['pages']} | {pr['10x']['edges']} | {pr['10x']['wall_s']} s | {pr['plan_unchanged']} |

Wall growth **{pr['wall_growth']}×** for **{pr['edge_growth']}×**
host edges (edge extraction precomputed untimed — the wall is the
loop alone).

## Raw walls

```json
{json.dumps({'extract': {k: v for k, v in ext.items() if k in ('1x', '10x', 'noise_probe_per_round')}, 'minhash': mh['all_walls'], 'cc': cc['all_walls'], 'pagerank': pr['all_walls']}, indent=1)}
```
""")
    print(json.dumps({"extract": ext, "minhash": {
        k: v for k, v in mh.items() if k != "plan_nodes"},
        "graph": gr}))
    print(f"wrote {md}")


if __name__ == "__main__":
    import shutil
    try:
        main()
    finally:
        shutil.rmtree(WORKDIR, ignore_errors=True)
