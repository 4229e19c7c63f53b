"""Streaming ring (SURVEY.md §4.4 optional wrapper): readStream over
a pages directory → foreachBatch reusing the batch extract stage →
parquet sink, exactly-once via checkpoint. availableNow trigger so the
test is bounded."""

from pyspark.sql import functions as F

from weakscraper_spark.sources.synth import (
    PAGES_SCHEMA, compiled_specs, synth_pages, synth_templates)
from weakscraper_spark.streaming import stream_extract


def test_stream_extract_available_now(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    pages = synth_pages(spark, 120)
    pages.write.parquet(src)
    templates = synth_templates(spark)

    q = stream_extract(spark, src, PAGES_SCHEMA, templates,
                       compiled_specs(), out, ckpt)
    q.awaitTermination(240)

    got = spark.read.parquet(out)
    assert got.count() == pages.count()  # every snapshot row extracted
    assert got.filter(F.col("status") == "ok").count() > 0

    # restart with the same checkpoint: no new data → no duplicates
    q2 = stream_extract(spark, src, PAGES_SCHEMA, templates,
                        compiled_specs(), out, ckpt)
    q2.awaitTermination(240)
    assert spark.read.parquet(out).count() == pages.count()
