"""Streaming extraction (SURVEY.md §4.4): ``readStream`` over a pages
source → the SAME batch extract stage via ``foreachBatch`` → append
sink. Extraction is per-row (stateless), so no watermark/state store
is needed; late data just appends. The optional watermark only bounds
any downstream windowed aggregation a caller adds.

The foreachBatch body reuses ``build_extract_plan``'s stages minus the
global dedup window (global latest-per-url needs either a batch
compaction pass or ``applyInPandasWithState`` — documented choice:
streaming appends raw extractions; the batch dedup view stays the
source of truth, mirroring the prod Iceberg MERGE pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import extract_pages
from ..plans.pipeline import attach_template, prepare_pages


def stream_extract(spark: SparkSession, source_dir: str,
                   source_schema: str,
                   templates: DataFrame, specs: dict[str, str],
                   out_dir: str, checkpoint_dir: str,
                   watermark: str | None = None,
                   trigger_available_now: bool = True):
    """Start (and return) a streaming query writing extraction rows to
    ``out_dir`` with exactly-once file-sink semantics via
    ``checkpoint_dir``."""
    stream = (spark.readStream.schema(source_schema)
              .parquet(source_dir))
    if watermark:
        stream = stream.withWatermark("warc_ts", watermark)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        staged = attach_template(prepare_pages(batch_df), templates)
        out = extract_pages(staged, specs)
        out.write.mode("append").parquet(out_dir)

    writer = (stream.writeStream.foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
