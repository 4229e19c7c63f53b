"""Raw-crawl entry plan: WARC archives on disk → pages → extraction.
Closes the last gap between "a clean parquet pages table was handed
to us" and what a crawl actually delivers — compressed WARC files of
HTTP traffic in unknown charsets:

    binaryFile scan (one task per archive)
      → warc_records flat map (sources/warc.py)        [narrow]
      → 200 text/html response filter                  [narrow]
      → charset sniff+decode (operators/charset.py,
        transport charset from the WARC mime param)    [narrow]
      → re-encoded UTF-8 pages rows (url, warc_ts, html)
      → build_extract_plan (template extract +
        heuristic fallback + dedup_latest)

Everything before the extract stage is map-only: at 10^12 documents
the whole ingest adds ZERO shuffles on top of the extraction plan —
archives are the parallel unit (CC ships ~64k per crawl), so
file-level parallelism saturates any executor count without a
repartition.

``spark.read.format("binaryFile")`` loads whole files as (path,
content) rows — correct for CC's ~1 GB archives at default
``maxPartitionBytes`` because binaryFile never splits files, and
GUARDED for anything larger: the scan filters on the pushed-down
``length`` metadata column (binaryFile prunes the file BEFORE
reading content, so an over-limit archive can't kill the reader
task — Spark hard-fails any binaryFile row above Int.MaxValue
bytes), ``oversize_archives`` reports what was pruned as status
rows, and ``warc_records`` itself degrades to an error:Oversize row
if a caller hand-feeds giant bytes. Memory envelope per task:
compressed archive + one inflated record + the Arrow copy — see
``warc.DEFAULT_MAX_ARCHIVE_BYTES``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.charset import decode_html
from ..sources.warc import DEFAULT_MAX_ARCHIVE_BYTES, warc_records
from .pipeline import build_extract_plan


def warc_to_pages(files: DataFrame) -> DataFrame:
    """(path, content) archive rows → standard pages rows
    (url, warc_ts, html utf-8 bytes, encoding, n_bytes, src).
    Narrow end to end; bodies are charset-sniffed with the WARC
    record's transport charset as the first hint and re-encoded
    UTF-8 so every downstream stage can assume one encoding."""
    recs = warc_records(files)
    html = (recs.filter((F.col("status") == "ok") &
                        (F.col("record_type") == "response") &
                        (F.col("http_status") == 200) &
                        F.col("mime").startswith("text/html"))
            .withColumn("transport_charset",
                        F.regexp_extract(F.col("mime"),
                                         r"(?i)charset\s*=\s*\"?'?"
                                         r"([A-Za-z0-9_.:-]+)", 1))
            # record-level status already filtered to ok — drop it so
            # decode_html's own status column is unambiguous
            .select("url", "warc_ts", "html", "n_bytes", "src",
                    "transport_charset"))
    decoded = decode_html(html, charset_col="transport_charset",
                          out_col="text_decoded")
    return (decoded.filter(F.col("status").startswith("ok"))
            .select("url", "warc_ts",
                    F.encode("text_decoded", "UTF-8").alias("html"),
                    "encoding",
                    F.col("n_bytes").alias("n_raw_bytes"),
                    F.col("src").alias("warc_src")))


def _archive_scan(spark: SparkSession, warc_dir: str):
    return (spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.warc*")
            .load(warc_dir))


def build_raw_extract_plan(spark: SparkSession, warc_dir: str,
                           templates: DataFrame,
                           specs: dict[str, str],
                           fallback: str | None = "heuristic",
                           max_archive_bytes: int =
                           DEFAULT_MAX_ARCHIVE_BYTES) -> DataFrame:
    """The composed plan from an archive DIRECTORY (lazy, no
    action): binaryFile scan → warc_to_pages → template extraction
    with heuristic fallback → latest-per-url. Archives above
    ``max_archive_bytes`` are pruned by the pushed-down ``length``
    filter (never read into memory); audit the pruned set with
    ``oversize_archives`` — same visible-drop contract as every other
    cap in the repo."""
    files = (_archive_scan(spark, warc_dir)
             .filter(F.col("length") <= max_archive_bytes)
             .select(F.col("path"), F.col("content")))
    return build_extract_plan(warc_to_pages(files), templates, specs,
                              fallback=fallback)


def oversize_archives(spark: SparkSession, warc_dir: str,
                      max_archive_bytes: int =
                      DEFAULT_MAX_ARCHIVE_BYTES) -> DataFrame:
    """Audit side output for the scan's length guard: (src, n_bytes,
    status) for every archive the extract plan pruned. Metadata-only
    scan — the length filter is pushed down, content is never read."""
    return (_archive_scan(spark, warc_dir)
            .filter(F.col("length") > max_archive_bytes)
            .select(F.col("path").alias("src"),
                    F.col("length").alias("n_bytes"),
                    F.lit("error:Oversize").alias("status")))
