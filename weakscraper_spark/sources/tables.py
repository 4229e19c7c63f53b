"""Catalog shim (SURVEY.md §8 risk register "Iceberg in sandbox"):
one read/write seam so the pipeline code is identical in prod
(Iceberg DSv2: ``spark.table`` / ``writeTo(...).append()``) and in
the sandbox (parquet dirs — no Iceberg jars/network here).

Prod configuration (documented, not executable in this sandbox):

    spark.sql.catalog.cc = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.cc.type = glue|hive|rest
    pages = spark.table("cc.web.pages")           # partition pruning,
    out.writeTo("cc.web.pages_out").append()      # snapshot commits =
                                                  # checkpoint barrier
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    """format='parquet' (sandbox) or 'iceberg' (prod)."""

    def __init__(self, spark: SparkSession, fmt: str = "parquet"):
        self.spark = spark
        self.fmt = fmt

    def read(self, ref: str) -> DataFrame:
        if self.fmt == "iceberg":
            return self.spark.table(ref)
        return self.spark.read.parquet(ref)

    def append(self, df: DataFrame, ref: str) -> None:
        if self.fmt == "iceberg":
            df.writeTo(ref).append()
        else:
            df.write.mode("append").parquet(ref)

    def overwrite_partitions(self, df: DataFrame, ref: str) -> None:
        if self.fmt == "iceberg":
            df.writeTo(ref).overwritePartitions()
        else:
            df.write.mode("overwrite").parquet(ref)
