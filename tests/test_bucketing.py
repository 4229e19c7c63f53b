"""Bucketed co-located joins: correctness, and the plan contract —
a matching-key join over co-bucketed tables has ZERO Exchange."""

import contextlib
import io
import re

import pytest

from pyspark.sql import functions as F

from weakscraper_spark.plans.bucketing import (bucketed_join,
                                               drop_table,
                                               write_bucketed)


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("buckets"))
    left = spark.range(0, 500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("a"))
    right = spark.range(0, 500, 2).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5).alias("b"))
    write_bucketed(left, "bk_left", "doc_id", 8, path)
    write_bucketed(right, "bk_right", "doc_id", 8, path)
    yield "bk_left", "bk_right"
    drop_table(spark, "bk_left")
    drop_table(spark, "bk_right")


def test_join_values(spark, tables):
    out = bucketed_join(spark, *tables, key="doc_id")
    rows = {r.doc_id: (r.a, r.b) for r in out.collect()}
    assert len(rows) == 250
    assert rows[6] == (6, 1)
    assert 7 not in rows


def test_join_plan_is_exchange_free(spark, tables):
    """The point of bucketing: the shuffle was paid at write time."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = bucketed_join(spark, *tables, key="doc_id")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain("formatted")
        txt = buf.getvalue()
        names = [m.group(1) for m in
                 re.finditer(r"^\s*[*+-]*\s*\(\d+\)\s+(\w+)",
                             txt, re.M)]
        assert "Exchange" not in names, names
        assert "SortMergeJoin" in names, names
        # and the scans really are bucketed
        assert "Bucketed: true" in txt, txt
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_mismatched_key_still_correct(spark, tables):
    """Joining on a NON-bucket key must still be correct (it just
    pays the shuffle) — bucketing is an optimization, not a
    constraint."""
    out = (spark.table("bk_left").join(
        spark.table("bk_right").withColumnRenamed("doc_id", "d2"),
        F.col("doc_id") == F.col("d2")))
    assert out.count() == 250
