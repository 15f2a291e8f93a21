"""Failure-aware politeness: exponential host backoff from fetch logs.

A host that times out or 5xx-es on its last k fetches should not keep
receiving its full politeness budget — retry storms against a dying
server waste the crawl's round budget and are impolite in exactly the
way robots.txt cannot express. The standard remedy (Heritrix's
retry-delay ladder, every production fetcher's exponential backoff)
maps the TRAILING consecutive-failure streak to a halved budget per
failure, floored so the host keeps getting the occasional probe that
lets it recover:

    budget(host) = max(floor, base * 0.5^streak)

where streak = number of failures since the host's last success (all
of them, if it never succeeded).

Spark-first shape over the (host, fetch_ts, ok) log a crawl already
emits: one window computes the last-success timestamp per host and the
streak aggregation groups on the same host key, so Catalyst plans ONE
exchange for the whole operator at any log size. Output is one row per
host — the same broadcast-size budget-table currency as PageRank's
rank_to_budget and mirror_demotion, and merges the same way (min per
host wins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def host_backoff(
    fetch_log: DataFrame,
    base_budget: float = 8.0,
    floor_budget: float = 0.25,
    host_col: str = "host",
    ts_col: str = "fetch_ts",
    ok_col: str = "ok",
) -> DataFrame:
    """(host, fetch_ts, ok) → (host, streak, politeness_budget) with
    budget = max(floor_budget, base_budget · 0.5^streak); streak is
    the count of failures strictly after the host's last success
    (ties on fetch_ts resolve success-last, i.e. a success at the same
    instant clears the streak)."""
    h = F.col(host_col)
    ts = F.col(ts_col).cast("double")
    ok = F.col(ok_col)

    w = Window.partitionBy(host_col)
    t_ok = F.max(F.when(ok, ts)).over(w)
    tagged = fetch_log.withColumn("_tok", t_ok)
    agg = tagged.groupBy(h.alias("host")).agg(
        F.sum(
            F.when(
                (~ok) & (F.col("_tok").isNull() | (ts > F.col("_tok"))),
                1,
            ).otherwise(0)
        ).cast("int").alias("streak")
    )
    budget = F.greatest(
        F.lit(float(floor_budget)),
        F.lit(float(base_budget)) * F.pow(F.lit(0.5), F.col("streak")),
    )
    return agg.select("host", "streak", budget.alias("politeness_budget"))


def adaptive_delay(
    fetch_log: DataFrame,
    delay_factor: float = 5.0,
    min_delay_ms: float = 100.0,
    max_delay_ms: float = 30000.0,
    round_seconds: float = 60.0,
    host_col: str = "host",
    ts_col: str = "fetch_ts",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Response-time-adaptive politeness (Heritrix's delay-factor
    policy): the gap a crawler leaves before re-hitting a host is a
    MULTIPLE of how long that host took to answer last time —
    ``delay = clamp(delay_factor · last_fetch_duration)`` — so a slow
    (loaded) server is automatically backed off and a fast CDN is
    drained at full politeness-floor speed. host_backoff reacts to
    FAILURES; this reacts to latency, the leading indicator.

    (host, fetch_ts, duration_ms) → one row per host with the last
    observed duration (max_by on fetch_ts — feed unique timestamps;
    a crawl log's (host, ts) is unique by construction since fetches
    to one host are serialized by the very politeness this computes),
    the mean duration and fetch count for the host datacard, the
    clamped delay, and ``politeness_budget`` = fetches this host can
    absorb per scheduler round (round_seconds / delay) — the same
    broadcast-size budget currency as host_backoff / rank_to_budget,
    min-merged by the scheduler.

    Scale shape: ONE partial-aggregated exchange on host; output is
    O(hosts) rows. Reference anchor: the reference is a single-page
    parser (core.go) with no fetch layer; the policy is public crawler
    practice (Heritrix CrawlController delay-factor, RFC 9309's
    crawl-delay analog)."""
    h = F.col(host_col)
    agg = fetch_log.groupBy(h.alias("host")).agg(
        F.max_by(F.col(duration_col).cast("double"), F.col(ts_col))
        .alias("last_duration_ms"),
        F.avg(F.col(duration_col).cast("double")).alias("mean_duration_ms"),
        F.count(F.lit(1)).cast("long").alias("n_fetches"),
    )
    delay = F.least(
        F.lit(float(max_delay_ms)),
        F.greatest(
            F.lit(float(min_delay_ms)),
            F.lit(float(delay_factor)) * F.col("last_duration_ms"),
        ),
    )
    out = agg.withColumn("crawl_delay_ms", delay)
    budget = F.lit(float(round_seconds) * 1000.0) / F.col("crawl_delay_ms")
    return out.withColumn("politeness_budget", budget)


def politeness_audit(
    log: DataFrame,
    delays: DataFrame,
    host_col: str = "host",
    ts_col: str = "fetch_ts",
    delay_col: str = "crawl_delay",
) -> DataFrame:
    """Politeness-compliance audit over the (host, fetch_ts) fetch log
    against per-host crawl delays (robots crawl_delay, adaptive_delay
    output — seconds): per host, the number of fetch gaps SHORTER than
    the host's delay, the minimum observed gap, and the compliance
    rate.  This is the crawl's own SLA check — a scheduler bug, a
    mis-merged budget table or a skew-salting error shows up here as
    violations long before a webmaster complaint does (Heritrix ships
    the same check as its politeness report).

    Shape: gaps come from ONE lag() window keyed by host and the
    aggregation groups on the same key, so Catalyst plans a single
    exchange for the whole audit at any log size; the delay table is
    host-cardinality and broadcast.  Single-fetch hosts have no gap and
    report zero violations with NULL min_gap_s.
    """
    gaps = (
        log.select(F.col(host_col).alias("host"),
                   F.col(ts_col).cast("double").alias("ts"))
        .withColumn("_gap", F.col("ts") - F.lag("ts").over(
            Window.partitionBy("host").orderBy("ts", "host")))
        .drop("ts")
    )
    # one row per host BEFORE the join: a delay table unioned across
    # sources/rounds would otherwise fan out every gap row and inflate
    # n_fetches/n_violations. The strictest (max) delay is the binding
    # requirement the audit checks against.
    d = F.broadcast(
        delays.select(F.col(host_col).alias("host"),
                      F.col(delay_col).cast("double").alias("_delay"))
        .groupBy("host")
        .agg(F.max("_delay").alias("_delay"))
    )
    return (
        gaps.join(d, "host", "left")
        .groupBy("host")
        .agg(
            F.count("*").cast("long").alias("n_fetches"),
            F.min("_gap").alias("min_gap_s"),
            F.max(F.col("_delay")).alias("crawl_delay_s"),
            F.sum(
                F.when(
                    F.col("_gap").isNotNull()
                    & F.col("_delay").isNotNull()
                    & (F.col("_gap") < F.col("_delay")),
                    1,
                ).otherwise(0)
            ).cast("long").alias("n_violations"),
        )
        .select(
            "host", "n_fetches", "min_gap_s", "crawl_delay_s",
            "n_violations",
            F.when(
                F.col("n_fetches") > 1,
                F.lit(1.0)
                - F.col("n_violations")
                / (F.col("n_fetches") - F.lit(1)).cast("double"),
            ).otherwise(F.lit(1.0)).alias("compliance_rate"),
        )
    )
