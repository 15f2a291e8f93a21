"""Cross-snapshot crawl diff: what changed between two crawls.

A recurring crawl (Common Crawl's monthly snapshots, a tier crawl's
weekly passes) needs the delta between passes — which URLs appeared,
which disappeared, which pages changed content — both to seed the
next frontier (new URLs enter at discovery priority, changed pages
feed the Cho & Garcia-Molina change-rate estimator in
``plans/recrawl.py``) and to report corpus drift (the "evolution of
the web" measurements of Ntoulas/Cho/Olston, WWW 2004, are exactly
this diff aggregated).

Shape: ONE shuffle — a full-outer join on the canonical URL key.
Both sides project down to (url, content_hash) before the exchange,
so the page bodies never move; at 100 TB the join is two
hash-partitioned scans of kilobyte-wide rows. When both snapshots
are written bucketed-by-url (the layout ``plans/scheduler.py``'s
state tables already use), the exchange disappears entirely and the
diff is a zero-shuffle zip of co-located buckets. No Python, no
iteration, whole-stage codegen end to end.

Reference anchor: the reference engine is single-corpus
(``core.go:FromDocument`` has no multi-snapshot notion); this
operator is part of the crawl-scale layer the Spark engine adds on
top, like ``plans/recrawl.py`` (which consumes the `changed` rows
this diff produces).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["snapshot_diff", "snapshot_diff_stats"]


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Per-URL diff of two crawl snapshots.

    Returns (url, old_hash, new_hash, status) with status one of
    ``added`` (in new only), ``removed`` (in old only), ``changed``
    (both, different hash), ``unchanged`` (both, same hash).

    ``hash_col`` must be non-null for present rows (it is the
    presence marker after the full-outer join); any stable content
    fingerprint works — md5/xxhash64 of the body, a simhash, or the
    extracted date string. Duplicate URLs within a snapshot should be
    resolved upstream (the frontier's seen-filter already guarantees
    one fetch per canonical URL per pass).
    """
    o = old.select(
        F.col(url_col).alias("url"), F.col(hash_col).alias("old_hash")
    ).filter(F.col("old_hash").isNotNull())
    n = new.select(
        F.col(url_col).alias("url"), F.col(hash_col).alias("new_hash")
    ).filter(F.col("new_hash").isNotNull())
    j = o.join(n, "url", "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") == F.col("new_hash"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select("url", "old_hash", "new_hash", status.alias("status"))


def snapshot_diff_stats(diff: DataFrame) -> DataFrame:
    """Roll a per-URL diff up to corpus-drift counts: one row per
    status with its URL count and fraction of the union. The second
    (tiny) aggregation reuses the diff's partitioning; the fraction
    is computed against a one-row broadcast total."""
    counts = diff.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls")
    )
    total = diff.agg(F.count(F.lit(1)).cast("double").alias("_tot"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "status",
            "n_urls",
            F.round(F.col("n_urls") / F.col("_tot"), 6).alias("frac"),
        )
    )
