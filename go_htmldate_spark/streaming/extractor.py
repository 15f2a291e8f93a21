"""Structured Streaming variant of the extraction pipeline.

The crawl itself is a resumable batch loop (the north rule asks for
snapshot-resumable rounds, not a continuous stream — SURVEY.md §2.9),
but ingest-side date extraction composes naturally with readStream:
new page files land in a directory (or Kafka at scale), the same staged
extraction operator runs per micro-batch, checkpointed output appends
to the extracted table.

The extraction operator is stateless per row, so it lifts to streaming
unchanged — one code path for batch and streaming (the DataFrame API
contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..operators.extract import extract_dates
from ..options import Options

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    opts: Options = Options(),
    trigger_once: bool = True,
):
    """Wire a file-source stream through the extraction operator.

    trigger_once=True drains available input and stops (testable in CI);
    production would use a processing-time trigger or availableNow."""
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .format("parquet")
        .load(input_dir)
    )
    extracted = extract_dates(stream, opts).select(
        "url", "warc_ts", "date", "datetime", "has_time", "has_tz",
        "tz_offset", "src_string", "lang",
    )
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
