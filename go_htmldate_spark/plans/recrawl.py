"""Freshness-aware recrawl scheduling over fetch history.

A tier crawl refetches; WHAT to refetch first is a change-rate
problem. Given the fetch history a crawl accumulates anyway —
(url, fetch_ts, content_sig) with content_sig any stable content
fingerprint (xxhash64 of the body, the extracted date, a simhash) —
estimate each URL's Poisson change rate with the Cho &
Garcia-Molina estimator (ACM TOIT 3(3) 2003, "Estimating frequency
of change"): for n observed intervals of mean length Δt with X
detected changes,

    λ̂ = -ln((n - X + 0.5) / (n + 0.5)) / Δt

(the +0.5 regularizer keeps the estimator defined at X = n, where
naive X/(nΔt) saturates), and the probability the page changed since
its last fetch is 1 - exp(-λ̂ · age). That probability IS the recrawl
priority: it ranks a fast-changing page fetched yesterday above a
static page fetched last year, in the same [0, 1) scale the
frontier's recency priorities live in.

Everything is one window (lag over the per-URL fetch sequence) plus
one groupBy on the url key — two exchanges total at any history size,
both on the key the history table is naturally partitioned by. No
Python, no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def change_rate(
    history: DataFrame,
    url_col: str = "url",
    ts_col: str = "fetch_ts",
    sig_col: str = "content_sig",
) -> DataFrame:
    """(url, fetch_ts, content_sig) → one row per URL with >= 2
    fetches: (url, n_intervals, n_changes, last_fetch_ts,
    rate_per_day). Change detection compares consecutive signatures
    in fetch order; rate is the CGM estimator per mean interval,
    scaled to 1/day (ts in epoch seconds)."""
    # deterministic tie-break: two fetches at the same instant order by
    # signature, so n_changes cannot flip with partition order (the
    # oracle-gate contract: every window pins its ties)
    w = Window.partitionBy("url").orderBy("ts", "sig")
    obs = history.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).cast("double").alias("ts"),
        F.col(sig_col).alias("sig"),
    ).withColumn("prev_sig", F.lag("sig").over(w))
    agg = (
        obs.groupBy("url")
        .agg(
            (F.count("*") - 1).alias("n_intervals"),
            F.sum(
                F.when(
                    F.col("prev_sig").isNotNull()
                    & (F.col("sig") != F.col("prev_sig")),
                    1,
                ).otherwise(0)
            ).alias("n_changes"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .filter(F.col("n_intervals") >= 1)
    )
    mean_dt_days = (F.col("last_ts") - F.col("first_ts")) / F.col(
        "n_intervals"
    ) / 86400.0
    lam = -F.log(
        (F.col("n_intervals") - F.col("n_changes") + 0.5)
        / (F.col("n_intervals") + 0.5)
    )
    return agg.select(
        "url",
        F.col("n_intervals").cast("int").alias("n_intervals"),
        F.col("n_changes").cast("int").alias("n_changes"),
        F.col("last_ts").alias("last_fetch_ts"),
        F.when(mean_dt_days > 0, lam / mean_dt_days).alias("rate_per_day"),
    )


def recrawl_priority(
    rates: DataFrame, as_of_ts: float
) -> DataFrame:
    """change_rate output + a deterministic `as_of` epoch-seconds
    timestamp → (url, priority) with priority = P[changed since last
    fetch] = 1 - exp(-rate · age_days). Zero-rate (never-changed) URLs
    get priority 0 — they recrawl last. Feed straight into
    CrawlScheduler.init_from_seeds for a refetch round."""
    age_days = (F.lit(float(as_of_ts)) - F.col("last_fetch_ts")) / 86400.0
    p = F.lit(1.0) - F.exp(
        -F.coalesce(F.col("rate_per_day"), F.lit(0.0))
        * F.greatest(age_days, F.lit(0.0))
    )
    return rates.select("url", p.alias("priority"))
