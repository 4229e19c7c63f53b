"""Archive tier (plans/archive_pipeline.py): pages → WARC blob table
+ CDXJ sidecar in one pass; both sinks must round-trip through the
repo's own readers — and the loop closes: a corpus written by the
archive tier, read back through raw-ingestion + index fetch, yields
the original pages."""

from pyspark.sql import functions as F

from weakscraper_spark.operators.cdx import parse_cdxj
from weakscraper_spark.plans.archive_pipeline import run_archive_tier
from weakscraper_spark.sources.warc import fetch_by_index, warc_pages


def _pages(spark, n=60):
    return spark.range(n).select(
        F.concat(F.lit("https://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".example.com/p/"),
                 F.col("id").cast("string")).alias("url"),
        F.to_timestamp(F.lit("2024-05-01 10:00:00")).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body>page "),
                          F.col("id").cast("string"),
                          F.lit("</body></html>")), "UTF-8")
         .alias("html"))


def test_archive_tier_roundtrip(spark, tmp_path):
    out = str(tmp_path / "tier")
    pages = _pages(spark)
    stats = run_archive_tier(pages, out, n_archives=8)
    assert stats["n_records"] == 60
    assert 1 <= stats["n_archives"] <= 8

    # sink 1: the blob table re-ingests through warc_pages
    blobs = spark.read.parquet(f"{out}/archives")
    got_pages = warc_pages(blobs, path_col="filename",
                           content_col="content")
    want = {(r.url, bytes(r.html)) for r in pages.collect()}
    got = {(r.url, bytes(r.html)) for r in got_pages.collect()}
    assert got == want

    # sink 2: the CDXJ sidecar parses clean and drives random access
    recs = parse_cdxj(spark.read.text(f"{out}/cdx")
                      .withColumnRenamed("value", "line"))
    ok = recs.filter("status = 'ok'")
    assert ok.count() == 60
    fetched = fetch_by_index(blobs, ok)
    got2 = {(r.url, bytes(r.html)) for r in fetched.collect()
            if r.status == "ok"}
    assert got2 == want


def test_archive_tier_deterministic_bytes(spark, tmp_path):
    """Same page set, different partitioning → byte-identical
    archives (sharding is md5-of-url, kernels sort)."""
    pages = _pages(spark, 40)
    a_dir = str(tmp_path / "a")
    b_dir = str(tmp_path / "b")
    run_archive_tier(pages.repartition(1), a_dir, n_archives=4)
    run_archive_tier(pages.repartition(5, "url"), b_dir, n_archives=4)
    a = {r.filename: bytes(r.content) for r in
         spark.read.parquet(f"{a_dir}/archives").collect()}
    b = {r.filename: bytes(r.content) for r in
         spark.read.parquet(f"{b_dir}/archives").collect()}
    assert a == b
