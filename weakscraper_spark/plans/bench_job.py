"""One timed extraction run at a given parallelism level — the unit
of the north-rule scaling measurement (N vs 4N executors; sandbox
proxy local[2] vs local[8], BASELINE.md).

Run as a subprocess so each parallelism level gets a fresh JVM:

    python -m weakscraper_spark.plans.bench_job <master> <pages_parquet>

Reads the SAME pre-synthesized pages parquet in both runs and times
the EXTRACTION JOB — scan → filter/project → broadcast template join
→ Arrow mapInPandas extract → no-op sink. This is the north-star unit
("batch-parses each page's html ... emits captured fields and main
text per url"); the latest-snapshot dedup is a downstream narrow-row
compaction (Iceberg-MERGE-shaped) that is correctness-tested in
tests/test_pipeline.py and timed separately by the ``extract_pages``
headline query (full plan incl. dedup).

Why 2 and 8 (not 8 and 32): the box exposes 32 SMT threads on ~16
physical cores, and in local mode each Spark task keeps BOTH a JVM
feed thread and a Python worker busy. At local[2]/local[8] the
2×N busy threads fit inside the physical cores at BOTH levels — the
ratio then measures data-parallel scaling, which is what multi-
executor scaling looks like on a real cluster (executors get
dedicated cores). At local[16]+ the JVM and Python sides start
competing for cores and SMT caps the ratio at ~2.6×/4 regardless of
the code under test (measured; see BASELINE.md).

Prints one JSON line:
    {"master":..., "pages":..., "wall_s":..., "pages_per_s":...}
"""

from __future__ import annotations

import json
import sys
import time


def main(master: str, pages_path: str) -> None:
    from .pipeline import attach_template, prepare_pages
    from .session import get_spark
    from ..operators.extract import extract_pages
    from ..sources.synth import compiled_specs, synth_templates

    spark = get_spark(f"bench_{master}", master=master)
    pages = spark.read.parquet(pages_path)
    staged = attach_template(prepare_pages(pages), synth_templates(spark))
    plan = extract_pages(staged, compiled_specs())

    t0 = time.perf_counter()
    plan.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0

    n = pages.count()  # rows fed to the extractor (incl. snapshots)
    print(json.dumps({
        "master": master, "pages": n, "wall_s": round(wall, 3),
        "pages_per_s": round(n / wall, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
