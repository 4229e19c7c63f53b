"""SparkSession builder tuned for the extraction workload
(SURVEY.md §5 physical-execution table).

Scale rationale (designed for 1000-executor / 100 TB, tested on
local[N]):
- AQE on: runtime shuffle-partition coalescing + skew-join splitting
  ("AQE-tuned shuffle partitioning", BASELINE.json:6).
- Arrow batches into mapInPandas; ``maxRecordsPerBatch`` lowered
  because rows carry whole HTML blobs (~2–50 KB) — a 10k-row default
  batch would be hundreds of MB in a Python worker.
- ``spark.python.worker.reuse=true`` so the per-worker compiled-spec
  cache (operators/extract.py) amortizes across batches.
- shuffle partitions default to 4× cores locally; on a real cluster
  AQE coalesces from a high initial count instead.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "weakscraper_spark",
              master: str | None = None,
              shuffle_partitions: int | None = None,
              arrow_batch_rows: int = 512,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    cores = os.cpu_count() or 8
    if shuffle_partitions is None:
        if master.startswith("local["):
            inner = master[6:-1]
            n = cores if inner == "*" else int(inner)
            shuffle_partitions = max(4, 4 * n)
        else:
            shuffle_partitions = 4 * cores

    builder = (
        SparkSession.builder.master(master).appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(arrow_batch_rows))
        .config("spark.python.worker.reuse", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
