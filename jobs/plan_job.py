"""spark-submit entrypoint for the crawl-cycle allocation layer.

    spark-submit --py-files go_htmldate_spark.zip jobs/plan_job.py \
        --frontier /data/frontier_parquet --total-budget 3000000000 \
        --horizon 4 --output /data/cycle_plan \
        [--budgets /data/budgets_parquet] \
        [--fetch-log /data/fetchlog --delays /data/delays]

Turns a frontier snapshot into an executable multi-round fetch plan:

1. per-host demand = frontier depth (one count aggregation);
2. politeness budgets — either a supplied (host, politeness_budget)
   table or the max-min fair water-fill of --total-budget across the
   demands (plans/budget.water_fill_budgets, exact integer closed
   form);
3. the wave plan — every in-horizon URL gets its fetch round via the
   salted two-phase exact rank (plans/budget.fetch_wave_plan);
4. a fairness report over the allocation (Jain + Gini,
   plans/budget.allocation_fairness), printed as one JSON line;
5. optionally, a politeness-compliance audit of a PREVIOUS cycle's
   fetch log against per-host delays (plans/backoff.politeness_audit)
   — the feedback half of the loop.

Outputs: <output>/waves (host, url, priority, host_rank, wave),
<output>/budgets (host, politeness_budget), and with --fetch-log,
<output>/audit (per-host compliance). One summary JSON line per stage
on stdout, same contract as crawl_job's manifests.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frontier", required=True,
                    help="parquet dir of frontier URLs (url, priority); "
                    "host is derived via the scheduler's url_host law")
    ap.add_argument("--output", required=True, help="plan output dir")
    ap.add_argument("--total-budget", type=int, default=0,
                    help="global fetch slots per cycle, water-filled "
                    "across hosts by frontier depth (ignored with "
                    "--budgets)")
    ap.add_argument("--budgets",
                    help="parquet dir of per-host politeness budgets "
                    "(host, politeness_budget); overrides "
                    "--total-budget")
    ap.add_argument("--horizon", type=int, default=4,
                    help="politeness rounds to plan ahead (default 4)")
    ap.add_argument("--n-salts", type=int, default=8,
                    help="salting width for the two-phase rank "
                    "(default 8; raise for worse host skew)")
    ap.add_argument("--fetch-log",
                    help="parquet dir of a previous cycle's fetch log "
                    "(host, fetch_ts) for the politeness audit")
    ap.add_argument("--delays",
                    help="with --fetch-log: parquet dir of per-host "
                    "crawl delays (host, crawl_delay seconds)")
    args = ap.parse_args()
    if not args.budgets and args.total_budget <= 0:
        ap.error("need --budgets or a positive --total-budget")
    if bool(args.fetch_log) != bool(args.delays):
        ap.error("--fetch-log and --delays go together")

    from pyspark.sql import functions as F

    from go_htmldate_spark.plans.budget import (
        allocation_fairness,
        fetch_wave_plan,
        water_fill_budgets,
    )
    from go_htmldate_spark.plans.canonical import url_host
    from go_htmldate_spark.session import get_spark

    spark = get_spark(app_name="plan-job")

    frontier = spark.read.parquet(args.frontier).select(
        "url",
        F.col("priority").cast("double").alias("priority"),
    ).withColumn("host", url_host(F.col("url")))

    if args.budgets:
        budgets = spark.read.parquet(args.budgets).select(
            "host", F.col("politeness_budget").cast("long")
            .alias("politeness_budget"))
        fair_src = budgets.select("host",
                                  F.col("politeness_budget").alias("alloc"))
    else:
        demands = frontier.groupBy("host").agg(
            F.count("*").cast("long").alias("demand"))
        alloc = water_fill_budgets(demands, args.total_budget)
        budgets = alloc.select(
            "host", F.col("alloc").alias("politeness_budget"))
        fair_src = alloc.select("host", "alloc")

    budgets.write.mode("overwrite").parquet(f"{args.output}/budgets")
    fair = allocation_fairness(fair_src).collect()[0].asDict()
    print(json.dumps({"stage": "budgets", **{
        k: (round(v, 6) if isinstance(v, float) else v)
        for k, v in fair.items()}}))

    waves = fetch_wave_plan(
        frontier, budgets, horizon=args.horizon, n_salts=args.n_salts)
    waves.write.mode("overwrite").parquet(f"{args.output}/waves")
    waves_out = spark.read.parquet(f"{args.output}/waves")
    per_wave = {int(r["wave"]): r["n"] for r in waves_out.groupBy("wave")
                .agg(F.count("*").alias("n")).collect()}
    print(json.dumps({"stage": "waves", "horizon": args.horizon,
                      "n_planned": sum(per_wave.values()),
                      "per_wave": {str(k): per_wave[k]
                                   for k in sorted(per_wave)}}))

    if args.fetch_log:
        from go_htmldate_spark.plans.backoff import politeness_audit

        audit = politeness_audit(
            spark.read.parquet(args.fetch_log),
            spark.read.parquet(args.delays),
        )
        audit.write.mode("overwrite").parquet(f"{args.output}/audit")
        summary = spark.read.parquet(f"{args.output}/audit").agg(
            F.count("*").alias("n_hosts"),
            F.sum("n_violations").alias("n_violations"),
            F.sum(F.when(F.col("n_violations") > 0, 1).otherwise(0))
            .alias("n_hosts_violating"),
        ).collect()[0]
        print(json.dumps({"stage": "audit",
                          "n_hosts": summary["n_hosts"],
                          "n_violations": int(summary["n_violations"] or 0),
                          "n_hosts_violating":
                          int(summary["n_hosts_violating"] or 0)}))

    spark.stop()


if __name__ == "__main__":
    main()
