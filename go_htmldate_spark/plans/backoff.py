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
