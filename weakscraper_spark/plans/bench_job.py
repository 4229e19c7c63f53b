"""One timed extraction run at a given parallelism level — the unit
of the north-rule scaling measurement (N vs 4N; sandbox proxy is
local[8] vs local[32], BASELINE.md).

Run as a subprocess so each parallelism level gets a fresh JVM:

    python -m weakscraper_spark.plans.bench_job <master> <pages_parquet>

Reads the SAME pre-synthesized pages parquet in both runs, executes
the full extract plan (dedup → broadcast template join → salted
repartition → mapInPandas extract) into a no-op sink, and prints one
JSON line: {"master":..., "pages":..., "wall_s":..., "pages_per_s":...}.
"""

from __future__ import annotations

import json
import sys
import time


def main(master: str, pages_path: str) -> None:
    from pyspark.sql import functions as F

    from .pipeline import build_extract_plan
    from .session import get_spark
    from ..sources.synth import compiled_specs, synth_templates

    spark = get_spark(f"bench_{master}", master=master)
    pages = spark.read.parquet(pages_path)
    templates = synth_templates(spark)
    plan = build_extract_plan(pages, templates, compiled_specs())

    t0 = time.perf_counter()
    plan.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0

    n = pages.select("url").distinct().count()
    print(json.dumps({
        "master": master, "pages": n, "wall_s": round(wall, 3),
        "pages_per_s": round(n / wall, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
