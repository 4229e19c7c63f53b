"""Supplementary benchmark runner for optimization work (bench.py is
FROZEN as the driver's measurement contract — this file exists so the
round's iteration loop can time SUBSETS of the headline queries
without touching it).

Usage:
    python bench_extra.py [--rounds N] [--quiet SECONDS] [query ...]

Runs the named headline queries (default: bench.py's full list) at
$SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS], with bench.py's
setup replicated: the same pre-synthesized corpora for the
extraction/link/md families, the same stage-free runners for
ivf/recrawl, the same untimed warmup, noop sink, noise-probe gating
and min-over-interleaved-rounds discipline. Prints one line per
query plus a sum, and appends a record to BENCH/extra_runs.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time


def build_runners(spark, sf_dir: str, workdir: str, names: list[str]):
    """The headline runner table — same construction as
    bench._run_queries (pre-synthesized corpora, stage-free runners),
    limited to ``names``. Untimed."""
    import __spark_entry__ as entrymod
    from weakscraper_spark.plans.pipeline import build_extract_plan
    from weakscraper_spark.sources.synth import (
        compiled_specs, synth_pages, synth_templates)

    qs = entrymod.queries()
    runners = {name: qs[name] for name in names if name in qs}

    sf = sf_dir.rstrip("/").split("sf")[-1]
    n = 20000 if sf == "0.1" else (2000 if sf == "0.01" else 600)

    if {"extract_pages", "boiler_extract"} & set(names):
        pages_path = os.path.join(workdir, "headline_pages")
        synth_pages(spark, n, partitions=max(32, n // 1000)) \
            .write.mode("overwrite").parquet(pages_path)
        templates = synth_templates(spark)
        specs = compiled_specs()

        def extract_headline(spark, _sf):
            return build_extract_plan(spark.read.parquet(pages_path),
                                      templates, specs)

        def boiler_headline(spark, _sf):
            from weakscraper_spark.operators.heuristic import (
                heuristic_extract)
            return heuristic_extract(spark.read.parquet(pages_path))

        runners["extract_pages"] = extract_headline
        runners["boiler_extract"] = boiler_headline

    link_family = {"link_graph", "host_rank", "anchor_topk",
                   "recrawl_plan"}
    if link_family & set(names):
        from weakscraper_spark.sources.synth import synth_linked_pages
        linked_path = os.path.join(workdir, "headline_linked")
        synth_linked_pages(spark, n, partitions=max(32, n // 1000)) \
            .drop("links", "anchors") \
            .write.mode("overwrite").parquet(linked_path)

        def link_graph_headline(spark, _sf):
            from weakscraper_spark.operators.links import (
                extract_links, host_graph)
            return host_graph(
                extract_links(spark.read.parquet(linked_path)))

        def host_rank_headline(spark, _sf):
            from weakscraper_spark.operators.links import (
                extract_links, host_graph, pagerank)
            return pagerank(host_graph(
                extract_links(spark.read.parquet(linked_path))),
                iters=10)

        def anchor_topk_headline(spark, _sf):
            from weakscraper_spark.operators.links import (
                anchor_topk, extract_links)
            return anchor_topk(
                extract_links(spark.read.parquet(linked_path)))

        def recrawl_headline(spark, _sf):
            from pyspark.sql import functions as SF
            from weakscraper_spark.operators.drift import (
                snapshot_change_rate)
            from weakscraper_spark.operators.links import (
                extract_links, host_graph, pagerank)
            from weakscraper_spark.plans.recrawl import plan_recrawl
            pages = spark.read.parquet(linked_path)
            ranks = pagerank(host_graph(extract_links(pages)), iters=10)
            i = SF.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
            host = SF.lower(SF.regexp_extract(
                "url", r"^[^:/?#]+://([^/?#:]*)", 1))
            base = pages.select("url", i.alias("i"), host.alias("host"))
            ii = SF.col("i")
            old = base.select(
                "host", "url",
                SF.concat(SF.lit("c"), ii.cast("string"))
                  .alias("content_hash"))
            kept = base.filter(ii % 10 != 0).select(
                "host", "url",
                SF.concat(SF.when(ii % 7 == 0, SF.lit("x"))
                            .otherwise(SF.lit("c")), ii.cast("string"))
                  .alias("content_hash"))
            added = base.filter(ii % 11 == 0).select(
                "host",
                SF.concat(SF.col("url"), SF.lit("?v=2")).alias("url"),
                SF.concat(SF.lit("a"), ii.cast("string"))
                  .alias("content_hash"))
            churn = snapshot_change_rate(old, kept.unionByName(added))
            return plan_recrawl(ranks, churn)

        runners["link_graph"] = link_graph_headline
        runners["host_rank"] = host_rank_headline
        runners["anchor_topk"] = anchor_topk_headline
        runners["recrawl_plan"] = recrawl_headline

    if "md_convert" in names:
        from weakscraper_spark.sources.synthmd import synth_md_pages
        md_path = os.path.join(workdir, "headline_md")
        synth_md_pages(spark, n, partitions=max(32, n // 1000)) \
            .drop("md") \
            .write.mode("overwrite").parquet(md_path)

        def md_convert_headline(spark, _sf):
            from weakscraper_spark.operators.markdown import (
                html_to_markdown)
            return html_to_markdown(spark.read.parquet(md_path))

        runners["md_convert"] = md_convert_headline

    if "ivf_ann_topk" in names:
        def ivf_headline(spark, sfd):
            from pyspark.sql import functions as SF
            from weakscraper_spark.operators.similarity import ivf_topk
            emb = spark.read.parquet(
                os.path.join(sfd, "embeddings.parquet"))
            queries_df = emb.filter(SF.col("vec_id") < 8).select(
                SF.col("vec_id").alias("query_id"), "embedding")
            return ivf_topk(emb, queries_df, k=5, n_lists=16, n_probe=4)

        runners["ivf_ann_topk"] = ivf_headline

    return runners


def main() -> None:
    import bench as benchmod

    args = sys.argv[1:]
    rounds, quiet_budget = 3, 240.0
    while args and args[0].startswith("--"):
        if args[0] == "--rounds":
            rounds = int(args[1])
        elif args[0] == "--quiet":
            quiet_budget = float(args[1])
        args = args[2:]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    workdir = "/tmp/ws_bench_extra"
    os.makedirs(workdir, exist_ok=True)

    # default: bench.py's full headline list (read from its source so
    # the two can't drift)
    import inspect
    import re
    src = inspect.getsource(benchmod._run_queries)
    m = re.search(r"headline = \[(.*?)\]", src, re.S)
    full_list = [s.strip().strip('",') for s in m.group(1).split()
                 if s.strip().strip('",')]
    names = args or full_list

    from weakscraper_spark.plans.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("bench_extra", master=f"local[{cpus}]")
    runners = build_runners(spark, sf_dir, workdir, names)
    qs = entrymod.queries()

    # untimed warmup (bench.py's): JVM JIT, python daemon fork, etc.
    qs["c4_group_stats"](spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()

    walls: dict[str, list[float]] = {name: [] for name in names}
    for _rnd in range(rounds):
        ratio, waited = benchmod._wait_for_quiet(quiet_budget)
        quiet_budget -= waited
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            runners[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            walls[name].append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
    spark.stop()

    times = {name: min(w) for name, w in walls.items()}
    for name in sorted(times, key=lambda n: -times[n]):
        print(f"{times[name]:8.3f}  {name}  {walls[name]}")
    print(json.dumps({"sum": round(sum(times.values()), 3),
                      "n": len(times), "sf_dir": sf_dir,
                      "rounds": rounds}))
    rec = {"ts": time.strftime("%Y-%m-%dT%H:%M:%S"), "sf_dir": sf_dir,
           "rounds": rounds, "mins": times, "walls": walls}
    os.makedirs("BENCH", exist_ok=True)
    with open(os.path.join("BENCH", "extra_runs.jsonl"), "a") as fh:
        fh.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
