"""WARC revisit records: digest-based storage dedup at fetch time.

A recurring crawl re-fetches pages whose content usually has not
changed.  WARC 1.1 (ISO 28500-2017 §6.7.2) defines the ``revisit``
record for exactly this: when the payload digest of a new fetch equals
the digest recorded for a previous capture, the writer stores a
payload-free ``revisit`` record carrying ``WARC-Profile:
.../revisit/identical-payload-digest`` and ``WARC-Refers-To-*``
pointers to the original capture, instead of storing the body again.
Heritrix and the Internet Archive's crawlers ship this as
"identical-payload-digest deduplication"; at Common-Crawl scale it is
the difference between storing a monthly snapshot and storing only
its delta.

Shape: ONE shuffle — a left join of the current fetch batch against
the prior digest index on the canonical URL key.  Both sides project
to (url, digest[, date]) before the exchange, so page bodies never
move; with both tables bucketed by url (the layout the scheduler's
state tables already use) the exchange disappears.  Classification
itself is a codegen CASE — no Python anywhere.

Reference anchor: the reference engine is single-document
(``core.go:FromDocument``); revisit dedup belongs to the crawl-scale
layer the Spark engine adds, alongside ``plans/snapshots.py`` (which
diffs whole passes) and ``plans/recrawl.py`` (which prices the
re-fetch this operator then dedups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["revisit_classify", "revisit_stats", "REVISIT_PROFILE"]

# WARC 1.1 Annex C profile URI for identical-payload-digest revisits.
REVISIT_PROFILE = "http://netpreservation.org/warc/1.1/revisit/identical-payload-digest"


def revisit_classify(
    fetched: DataFrame,
    prior_index: DataFrame,
    url_col: str = "url",
    digest_col: str = "payload_digest",
    date_col: str = "warc_date",
) -> DataFrame:
    """Classify a fetch batch against the prior capture index.

    ``fetched``: this pass's fetches — (url, payload_digest, warc_date,
    n_bytes).  ``prior_index``: one row per URL from the previous pass
    — (url, payload_digest, warc_date).  Returns one row per fetch:

    - ``record_type``: ``revisit`` when the prior digest equals this
      fetch's digest, else ``response`` (first capture or changed
      content).
    - ``profile``: the WARC-Profile URI for revisit rows, null for
      response rows.
    - ``refers_to_date``: the prior capture's WARC-Date for revisit
      rows (the WARC-Refers-To-Date header), null otherwise.
    - ``bytes_stored``: 0 for revisit rows (payload-free record),
      ``n_bytes`` for response rows — the storage the archive actually
      pays.

    Duplicate URLs within a pass are resolved upstream (the frontier
    guarantees one fetch per canonical URL per pass); ``prior_index``
    must be unique on url — keep the LATEST capture per URL, which is
    what ``revisit_index`` of the previous pass produces.
    """
    cur = fetched.select(
        F.col(url_col).alias("url"),
        F.col(digest_col).alias("digest"),
        F.col(date_col).alias("warc_date"),
        F.col("n_bytes").cast("long").alias("n_bytes"),
    )
    prev = prior_index.select(
        F.col(url_col).alias("url"),
        F.col(digest_col).alias("prior_digest"),
        F.col(date_col).alias("prior_date"),
    )
    j = cur.join(prev, "url", "left")
    is_rev = F.col("prior_digest").isNotNull() & (
        F.col("prior_digest") == F.col("digest")
    )
    return j.select(
        "url",
        "digest",
        "warc_date",
        F.when(is_rev, F.lit("revisit")).otherwise(F.lit("response")).alias(
            "record_type"
        ),
        F.when(is_rev, F.lit(REVISIT_PROFILE)).alias("profile"),
        F.when(is_rev, F.col("prior_date")).alias("refers_to_date"),
        F.col("n_bytes").alias("bytes_fetched"),
        F.when(is_rev, F.lit(0).cast("long"))
        .otherwise(F.col("n_bytes"))
        .alias("bytes_stored"),
    )


def revisit_stats(classified: DataFrame) -> DataFrame:
    """Roll the classification up to the archive's storage ledger:
    one row per record_type with record count, bytes fetched, bytes
    stored, and ``bytes_saved`` = fetched − stored (the dedup win —
    nonzero only on the revisit row).  Tiny partial-aggregated
    shuffle riding on whatever partitioning the classification has."""
    return (
        classified.groupBy("record_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_records"),
            F.sum("bytes_fetched").cast("long").alias("bytes_fetched"),
            F.sum("bytes_stored").cast("long").alias("bytes_stored"),
        )
        .withColumn(
            "bytes_saved", (F.col("bytes_fetched") - F.col("bytes_stored")).cast("long")
        )
    )
