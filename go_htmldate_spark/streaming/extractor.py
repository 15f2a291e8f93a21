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


def host_fetch_rates(pages: DataFrame, window: str = "10 minutes",
                     watermark: str = "20 minutes",
                     opts: Options | None = None) -> DataFrame:
    """Event-time windowed per-host fetch/extraction rates with a
    watermark for late WARC records (crawl telemetry the politeness
    budget consumes). Works identically on a batch or streaming
    DataFrame — on a stream the watermark bounds window state: windows
    older than max(warc_ts) - watermark are finalized and dropped from
    the state store, and later-arriving rows for them are discarded
    (the at-scale guarantee that state is O(open windows × hosts), not
    O(history)).

    Shuffle shape: one hash partition on (window, host) — the same
    single-exchange aggregation whether batch or micro-batch."""
    from pyspark.sql import functions as F

    from ..plans.canonical import url_host

    dated = extract_dates(pages, opts or Options()).select(
        "url", "warc_ts", (F.col("date") != "").alias("dated")
    )
    return (
        dated.withWatermark("warc_ts", watermark)
        .groupBy(
            F.window("warc_ts", window).alias("win"),
            url_host(F.col("url")).alias("host"),
        )
        .agg(
            F.count("*").alias("n_fetched"),
            F.sum(F.col("dated").cast("long")).alias("n_dated"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "host", "n_fetched", "n_dated",
        )
    )


def stream_host_rates(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    window: str = "10 minutes",
    watermark: str = "20 minutes",
    max_files_per_trigger: int | None = None,
):
    """host_fetch_rates as an append-mode file-source stream: a window's
    row is emitted exactly once, in the first micro-batch whose watermark
    passes its end (the watermark advances between batches of a run —
    availableNow + maxFilesPerTrigger splits a backlog into ordered
    batches). Rows older than the current watermark are dropped; rows
    for still-open windows fold into checkpointed state
    (tests/test_operators.py pins both behaviors)."""
    reader = spark.readStream.schema(PAGES_SCHEMA).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(input_dir)
    rates = host_fetch_rates(stream, window=window, watermark=watermark)
    return (
        rates.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
