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
    """format='parquet' (sandbox plain dirs), 'snap' (sandbox with
    snapshot semantics — snaptable.py: atomic commits, time travel,
    incremental reads), or 'iceberg' (prod)."""

    def __init__(self, spark: SparkSession, fmt: str = "parquet"):
        self.spark = spark
        self.fmt = fmt

    def _snap(self, ref: str):
        from .snaptable import SnapTable
        return SnapTable(self.spark, ref)

    def read(self, ref: str) -> DataFrame:
        if self.fmt == "iceberg":
            return self.spark.table(ref)
        if self.fmt == "snap":
            return self._snap(ref).read()
        return self.spark.read.parquet(ref)

    def append(self, df: DataFrame, ref: str) -> None:
        if self.fmt == "iceberg":
            df.writeTo(ref).append()
        elif self.fmt == "snap":
            self._snap(ref).commit_append(df)
        else:
            df.write.mode("append").parquet(ref)

    def overwrite_partitions(self, df: DataFrame, ref: str) -> None:
        if self.fmt == "iceberg":
            df.writeTo(ref).overwritePartitions()
        elif self.fmt == "snap":
            self._snap(ref).commit_overwrite(df)
        else:
            df.write.mode("overwrite").parquet(ref)
