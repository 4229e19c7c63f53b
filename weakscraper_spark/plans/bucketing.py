"""Bucketed tables — the co-located-join tool in the scale kit next
to broadcast (small dims), salting (skewed keys), and AQE (runtime
re-plan): both sides of a recurring equi-join are written
``bucketBy(N, key)`` + ``sortBy(key)``, so every future join on that
key is EXCHANGE-FREE — at 100 TB
the shuffle a url-keyed join would otherwise pay on every run is paid
once at write time and amortized across all downstream consumers
(resume anti-joins, snapshot diffs, postings joins against the same
page table).

When NOT to bucket: one-off joins (the write-side shuffle costs the
same as the join's), skewed keys (a hot bucket is a hot task — salt
instead), or sides that broadcast anyway. Bucket counts must match
(or divide) across tables for the co-location to hold.

Sandbox note: bucketed tables need the session catalog
(``saveAsTable``); data lands at the caller's explicit ``path`` so
nothing writes into an implicit ``spark-warehouse/`` under the repo.
The in-memory catalog entry dies with the session; `drop_table`
cleans up both."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, name: str, key: str,
                   n_buckets: int, path: str,
                   sort: bool = True) -> None:
    """Write ``df`` as a bucketed parquet table ``name`` at ``path``:
    hash-partitioned into ``n_buckets`` buckets by ``key``, each
    bucket sorted by it when ``sort`` — the layout Catalyst
    recognizes to elide the Exchange under a matching-key
    SortMergeJoin. (Since SPARK-28220 the reader no longer trusts
    per-bucket sort order — a residual Sort over the pre-sorted
    bucket remains in plans; it is a cheap merge of sorted runs, not
    a shuffle.)"""
    from pyspark.sql import functions as F

    # pre-shuffle on the bucket key with matching partition count:
    # Spark's bucket assignment and repartition share the Murmur3
    # hash, so each write task holds exactly ONE bucket → one file
    # per bucket. Without this, every task emits a file per bucket
    # (tasks × buckets small files at scale) and the reader can no
    # longer trust per-bucket sort order, so joins re-Sort.
    df = df.repartition(n_buckets, F.col(key))
    w = (df.write.mode("overwrite").format("parquet")
         .bucketBy(n_buckets, key))
    if sort:
        w = w.sortBy(key)
    w.option("path", os.path.join(path, name)).saveAsTable(name)


def bucketed_join(spark: SparkSession, left: str, right: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key. The
    plan contract (asserted in tests/test_bucketing.py): zero
    Exchange operators — each task reads matching bucket files from
    both sides directly."""
    return spark.table(left).join(spark.table(right), key, how)


def drop_table(spark: SparkSession, name: str) -> None:
    """Drop the catalog entry (the caller owns the path's files)."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
