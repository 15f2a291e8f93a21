"""The streaming analog of the batch crawl round: one file-source
readStream of fetched-page batches driving BOTH stateful pieces at once.

Composition (the proof the stateful parts compose — round-4 item 7):

    readStream(pages)
      ├─ q1: per-shard bounded-state URL dedup (bloom bitset + exact
      │      recent window, payload passed through) → staged extraction
      │      → parquet fetch-set sink
      ├─ q2: watermarked event-time host rates → parquet telemetry sink
      └─ q3: running Cho–Garcia-Molina change-rate estimates over the
             RAW (un-deduped) fetch stream — revisits ARE the change
             signal — → parquet freshness sink (feeds the next crawl's
             recrawl_priority seeding)

Each landing file is one micro-batch of fetched pages (the streaming
analog of run_round's fetch stage). q1's output is the crawl's fetch
set: exactly the FIRST occurrence of every canonical URL across all
micro-batches — the same seen-set semantics as the batch scheduler's
anti-join (whose fetch set equals the unseen set whenever the
politeness budget doesn't bind), with per-shard state bounded at
m_bits/8 bytes + exact_cap longs forever. q2 is the politeness
telemetry the budget consumes, with watermark-bounded window state.

Three streaming queries share one input directory (q3's checkpoint is
ckpt_freshness); Spark tracks file progress per query in its own
checkpoint, so each resumes independently
— same recovery contract as the batch snapshot chain [north-rule
resumability].
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from ..operators.extract import extract_dates
from ..options import Options
from ..plans.canonical import canonicalize_url, url_hash
from .extractor import PAGES_SCHEMA, host_fetch_rates
from .frontier import BLOOM_STATE_SCHEMA, _make_bloom_dedup

DEDUP_PAGES_SCHEMA = (
    "url string, url_canon string, url_hash long, warc_ts timestamp, "
    "html binary, text string, lang string"
)

_PAGE_COLS = [
    "url", "url_canon", "url_hash", "warc_ts", "html", "text", "lang"
]


def dedup_pages_stream(
    pages,
    n_partitions: int = 16,
    m_bits: int = 1 << 20,
    k: int = 6,
    exact_cap: int = 4096,
):
    """pages stream → first-occurrence-only page stream (keyed by
    canonical URL, stateful across micro-batches, bounded state)."""
    keyed = pages.withColumn(
        "url_canon", canonicalize_url(F.col("url"))
    ).withColumn(
        "url_hash", url_hash(F.col("url_canon"))
    ).withColumn(
        "shard", F.pmod(F.col("url_hash"), F.lit(n_partitions)).cast("int")
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        _make_bloom_dedup(m_bits, k, exact_cap, out_cols=_PAGE_COLS),
        outputStructType=DEDUP_PAGES_SCHEMA,
        stateStructType=BLOOM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_crawl(
    spark: SparkSession,
    input_dir: str,
    work_dir: str,
    opts: Options = Options(skip_extensive_search=True),
    n_partitions: int = 8,
    m_bits: int = 1 << 18,
    exact_cap: int = 4096,
    window: str = "10 minutes",
    watermark: str = "20 minutes",
    max_files_per_trigger: int | None = 1,
    max_outlinks: int = 256,
    respect_nofollow: bool = False,
    robots_agent: str | None = None,
):
    """Start every channel of the streaming crawl loop over
    `input_dir` and drain everything available (availableNow), then
    return (fetch_set_dir, rates_dir, freshness_dir, discovery_dir).
    maxFilesPerTrigger=1 makes each landed file its own micro-batch —
    the streaming analog of one run_round. The discovery channel
    closes the loop: landed pages' own anchors (relative hrefs
    resolved against the page origin, per-page cap, optional nofollow
    compliance) stream through the bounded-state URL dedup and emerge
    as the first-occurrence seed stream for the next fetch cycle."""
    fetch_dir = f"{work_dir}/fetch_set"
    rates_dir = f"{work_dir}/host_rates"

    def _reader():
        r = spark.readStream.schema(PAGES_SCHEMA).format("parquet")
        if max_files_per_trigger is not None:
            r = r.option("maxFilesPerTrigger", max_files_per_trigger)
        return r.load(input_dir)

    pages = _reader()

    deduped = dedup_pages_stream(
        pages, n_partitions=n_partitions, m_bits=m_bits, exact_cap=exact_cap
    )
    extracted = extract_dates(deduped, opts).select(
        "url", "url_canon", "url_hash", "warc_ts", "date", "src_string", "lang"
    )
    q1 = (
        extracted.writeStream.format("parquet")
        .option("path", fetch_dir)
        .option("checkpointLocation", f"{work_dir}/ckpt_fetch")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )

    rates = host_fetch_rates(
        _reader(), window=window, watermark=watermark, opts=opts,
    )
    q2 = (
        rates.writeStream.format("parquet")
        .option("path", rates_dir)
        .option("checkpointLocation", f"{work_dir}/ckpt_rates")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    from .recrawl import stream_change_rate

    freshness_dir = f"{work_dir}/freshness"
    hist = _reader().select(
        F.col("url"),
        F.col("warc_ts").cast("double").alias("fetch_ts"),
        F.xxhash64(F.col("html")).cast("string").alias("content_sig"),
    )
    q3 = (
        stream_change_rate(hist, n_partitions=n_partitions)
        .writeStream.format("parquet")
        .option("path", freshness_dir)
        .option("checkpointLocation", f"{work_dir}/ckpt_freshness")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # discovery channel: anchors → canonical first-occurrence seeds
    from ..plans.metarobots import derive_outlinks
    from .frontier import stream_dedup_urls_bloom

    discovery_dir = f"{work_dir}/discovery"
    outlinks = derive_outlinks(
        _reader(), max_links=max_outlinks,
        respect_nofollow=respect_nofollow, agent=robots_agent,
    ).select(F.explode("outlinks").alias("url"))
    q4 = (
        stream_dedup_urls_bloom(
            outlinks, n_partitions=n_partitions, m_bits=m_bits,
            exact_cap=exact_cap,
        )
        .writeStream.format("parquet")
        .option("path", discovery_dir)
        .option("checkpointLocation", f"{work_dir}/ckpt_discovery")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination()
    q2.awaitTermination()
    q3.awaitTermination()
    q4.awaitTermination()
    return fetch_dir, rates_dir, freshness_dir, discovery_dir
