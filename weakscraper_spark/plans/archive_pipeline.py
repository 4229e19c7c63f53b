"""The ARCHIVE tier — the write-side sibling of plans/raw_pipeline.py
(which reads archives): pages → sharded WARC archives + CDXJ index,
produced in ONE pass. This is the half of a crawl system that ships
bytes: the fetch fleet lands pages rows, this plan serializes them
into the Common-Crawl layout (one gzip member per record, ~fixed-size
archives, index lines alongside) that every downstream consumer —
including this repo's own raw_pipeline / cdx family — navigates.

Scale shape: sharding is a deterministic md5 bucket of the url
(``assign_archives`` — revisits co-located, resume-stable), archive
serialization is one applyInPandas task per archive with url-sorted
kernels (bytes are a pure function of the row set), and both sinks
write through Spark's committer (exactly-once per run directory).
The archive blobs land in a parquet blob table (filename, content,
n_records) — on object storage each row is one ranged-readable
object; ``fetch_by_index`` consumes it directly — and the CDXJ lines
land as a text dataset ready for ``parse_cdxj``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.cdx import format_cdxj
from ..sources.warc import assign_archives, pages_to_warc


def run_archive_tier(pages: DataFrame, out_dir: str,
                     n_archives: int = 64,
                     prefix: str = "crawl") -> dict:
    """Serialize ``pages`` (url, warc_ts, html) into
    ``<out_dir>/archives`` (blob table) + ``<out_dir>/cdx`` (CDXJ
    text), one pass. Returns {n_archives, n_records} — the archive
    relation is persisted once for its two sinks and unpersisted
    before returning."""
    from pyspark import StorageLevel

    archives = pages_to_warc(assign_archives(pages, n_archives),
                             prefix=prefix) \
        .persist(StorageLevel.DISK_ONLY)
    try:
        (archives.select("filename", "content", "n_records")
         .write.mode("overwrite")
         .parquet(f"{out_dir}/archives"))
        # mime/http_status come from the cdx struct itself (written
        # by the same kernel that serialized the bytes) — the
        # sidecar can never drift from the archives it describes
        idx = (archives.select(
                   F.col("filename").alias("src"),
                   F.explode("cdx").alias("c"))
               .select("src", "c.url", "c.warc_ts", "c.offset",
                       "c.length", "c.digest", "c.mime",
                       "c.http_status"))
        (format_cdxj(idx, filename_col="src")
         .write.mode("overwrite").text(f"{out_dir}/cdx"))
        stats = (archives.agg(
            F.count("*").alias("n_archives"),
            F.sum("n_records").alias("n_records")).collect()[0])
        return {"n_archives": stats["n_archives"],
                "n_records": int(stats["n_records"] or 0)}
    finally:
        archives.unpersist()
