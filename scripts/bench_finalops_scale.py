"""Two-parallelism scaling point for the final-session operators
(north-rule two-cluster-size proxy): token-balanced shard planning
(distributed exact global rank), typosquat detection (length-banded
broadcast levenshtein, 1M hosts x 2k brands), and the URL-pattern
yield prior (signature aggregation + broadcast re-rank over a 1.5M-row
frontier).

One parallelism level per invocation so the process can be pinned:

    taskset -c 0-3  python scripts/bench_finalops_scale.py 4
    taskset -c 0-15 python scripts/bench_finalops_scale.py 16

Prints one JSON line per run; efficiency = (T_N / T_4N) / 4.  The
row-count outputs (n_shard_rows, checksum fields) must be IDENTICAL
across parallelism — the repo-wide determinism invariant.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICATE = int(os.environ.get("FINALOPS_REPLICATE", "300"))
N_HOSTS = int(os.environ.get("FINALOPS_HOSTS", "1000000"))
N_BRANDS = int(os.environ.get("FINALOPS_BRANDS", "2000"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def materialize(spark, base_dir: str) -> None:
    """Replicated doc corpus (distinct ids), a synthetic host table
    with planted squat classes, a brand list, and a url fetch-log /
    frontier pair — all written once, untimed."""
    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    corpus = None
    for k in range(REPLICATE):
        rep = docs.select(
            (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" r{k}")).alias("text"),
        )
        corpus = rep if corpus is None else corpus.unionByName(rep)
    corpus.repartition(128).write.mode("overwrite").parquet(f"{base_dir}/docs")

    # hosts: every 50th host is a 1-edit squat of brand (i % N_BRANDS),
    # every 97th a TLD squat; the rest unrelated long cores
    i = F.col("id")
    brand_core = F.concat(F.lit("brandname"), (i % N_BRANDS).cast("string"))
    host = (
        F.when(i % 50 == 0, F.concat(F.lit("brandnam"),
                                     (i % N_BRANDS).cast("string"),
                                     F.lit(".com")))
        .when(i % 97 == 0, F.concat(brand_core, F.lit(".net")))
        .otherwise(F.concat(F.lit("unrelatedhost"), i.cast("string"),
                            F.lit(".com")))
    )
    spark.range(N_HOSTS).select(host.alias("host")).repartition(64) \
        .write.mode("overwrite").parquet(f"{base_dir}/hosts")
    spark.range(N_BRANDS).select(
        F.concat(F.lit("brandname"), F.col("id").cast("string"),
                 F.lit(".com")).alias("brand")
    ).write.mode("overwrite").parquet(f"{base_dir}/brands")

    # fetch log + frontier: five URL shape classes, planted yield law
    def urls(df):
        k = F.col("id")
        h = F.concat(F.lit("https://h"), (k % 5000).cast("string"),
                     F.lit(".example"))
        path = F.expr(
            "CASE CAST(id % 5 AS INT) "
            "WHEN 0 THEN '/blog/' || CAST(2000 + id % 25 AS STRING) "
            "  || '/p-' || CAST(id AS STRING) || '.html' "
            "WHEN 1 THEN '/tag/t' || CAST(id % 50 AS STRING) "
            "WHEN 2 THEN '/' "
            "WHEN 3 THEN '/img/i' || CAST(id % 10 AS STRING) || '.png' "
            "ELSE '/news/' || CAST(id AS STRING) || '.html' END"
        )
        return df.select(F.concat(h, path).alias("url"), k)

    n_log = REPLICATE * 5000
    urls(spark.range(n_log)).select(
        "url", ((F.col("id") % 7) < (F.col("id") % 5)).alias("dated")
    ).repartition(64).write.mode("overwrite").parquet(f"{base_dir}/fetchlog")
    urls(spark.range(n_log, 2 * n_log)).select(
        "url", ((F.col("id") % 13 + 1) / 13.0).alias("priority")
    ).repartition(64).write.mode("overwrite").parquet(f"{base_dir}/frontier")


def run_ops(spark, base_dir: str) -> dict:
    import pyspark.sql.functions as F

    from go_htmldate_spark.operators.shards import shard_plan, shard_plan_stats
    from go_htmldate_spark.plans.typosquat import typosquat_pairs
    from go_htmldate_spark.plans.yield_prior import (
        apply_yield_prior,
        pattern_yield,
    )

    out = {}
    t0 = time.time()
    plan = shard_plan(spark.read.parquet(f"{base_dir}/docs"), n_shards=64)
    stats = shard_plan_stats(plan).agg(
        F.sum("n_tokens").alias("t"), F.count(F.lit(1)).alias("s"),
        F.max("n_tokens").alias("mx"), F.min("n_tokens").alias("mn"),
    ).head()
    out["shard_wall_s"] = round(time.time() - t0, 2)
    out["shard_total_tokens"] = int(stats["t"])
    out["shard_imbalance"] = round(
        (stats["mx"] - stats["mn"]) / (stats["t"] / stats["s"]), 6
    )

    t0 = time.time()
    pairs = typosquat_pairs(
        spark.read.parquet(f"{base_dir}/hosts"),
        spark.read.parquet(f"{base_dir}/brands"),
        max_dist=1,
    )
    row = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.crc32(F.col("host"))).alias("ck"),
    ).head()
    out["typosquat_wall_s"] = round(time.time() - t0, 2)
    out["typosquat_pairs"] = int(row["n"])
    out["typosquat_checksum"] = int(row["ck"])

    t0 = time.time()
    y = pattern_yield(spark.read.parquet(f"{base_dir}/fetchlog"))
    ranked = apply_yield_prior(
        spark.read.parquet(f"{base_dir}/frontier"), y
    )
    row = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        # per-row truncate BEFORE the sum so the checksum is an exact
        # integer fold — bit-identical under any partitioning
        F.sum((F.col("priority") * 1e6).cast("long")).alias("ps"),
    ).head()
    out["yield_wall_s"] = round(time.time() - t0, 2)
    out["yield_frontier_rows"] = int(row["n"])
    out["yield_priority_checksum"] = int(row["ps"])
    return out


def main() -> None:
    import shutil
    import tempfile

    from go_htmldate_spark.session import get_spark

    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    spark = get_spark(
        app_name=f"finalops-scale-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
    )
    base_dir = tempfile.mkdtemp(prefix="finalops_scale_")
    try:
        materialize(spark, base_dir)
        run_ops(spark, base_dir)  # warm: codegen + broadcast builds
        best = None
        for _ in range(2):
            t0 = time.time()
            r = run_ops(spark, base_dir)
            el = time.time() - t0
            if best is None or el < best[0]:
                best = (el, r)
        el, r = best
        r.update({
            "metric": "finalops_scaling_point",
            "cores": cores,
            "wall_s": round(el, 2),
        })
        print(json.dumps(r))
    finally:
        shutil.rmtree(base_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
