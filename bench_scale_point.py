"""Order-of-magnitude bench point + skew stress (round-3 item 8).

Two evidence runs beyond the per-round suite:

1. BIG: 2M synthetic pages (~5x the scaling run's 400k, ~16 GB of HTML)
   through the extraction cascade at local[32] — shows docs/s holds at
   an order of magnitude more data (the 100x story is partitioning: the
   per-partition work is identical, only partition COUNT grows).
2. SKEW: a frontier where 90% of URLs share ONE host, pushed through
   the scheduler's two-phase salted per-host top-k — the plan that
   bounds any single task's sort at scale. Reports wall for skewed vs
   uniform frontiers of the same size; parity of the salted plan is
   pinned by tests/test_frontier.py (skewed-hosts oracle test).

Usage: python bench_scale_point.py [n_big] [n_frontier]
Appends a JSON line to stdout; BENCH.md gets the table separately.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    n_big = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_frontier = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000

    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from go_htmldate_spark.operators.extract import extract_dates
    from go_htmldate_spark.options import Options
    from go_htmldate_spark.session import get_spark
    from go_htmldate_spark.sources.pages import synth_pages

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="scale-point", master=f"local[{cores}]",
        shuffle_partitions=cores,
    )

    # -- 1. big extraction run (pages generated on the fly; at 2M rows
    # the corpus never fits the page cache, matching a real scan)
    pages = synth_pages(
        spark, n_big, seed=42, partitions=cores * 4, filler_repeats=8
    ).select("url", "html")
    # warm every Python worker before timing
    warm = synth_pages(spark, cores * 64, seed=7, partitions=cores)
    extract_dates(warm, Options()).count()

    t0 = time.time()
    n_ok = extract_dates(pages, Options()).filter(F.col("date") != "").count()
    big_wall = time.time() - t0
    big = {
        "n_pages": n_big,
        "n_dated": n_ok,
        "wall_sec": round(big_wall, 1),
        "docs_per_sec": round(n_big / big_wall, 1),
        "docs_per_sec_per_core": round(n_big / big_wall / cores, 1),
    }

    # -- 2. salted top-k under 90%-single-host skew vs uniform
    from go_htmldate_spark.plans.canonical import url_hash, url_host

    def topk_wall(heavy_share: int) -> float:
        urls = synth_pages(
            spark, n_frontier, seed=11, heavy_host_share=heavy_share,
            partitions=cores * 4, filler_repeats=0,
        ).select("url")
        fr = urls.select(
            "url",
            url_hash(F.col("url")).alias("url_hash"),
            url_host(F.col("url")).alias("host"),
        ).withColumn(
            "priority", (F.pmod(F.col("url_hash"), F.lit(1000)) / 1000.0)
        )
        n_salts = 32
        salt = F.pmod(F.col("url_hash"), F.lit(n_salts))
        w1 = Window.partitionBy("host", "salt").orderBy(
            F.desc("priority"), F.asc("url")
        )
        w2 = Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("url"))
        k = 1000
        t0 = time.time()
        n = (
            fr.withColumn("salt", salt)
            .withColumn("r1", F.row_number().over(w1))
            .filter(F.col("r1") <= k)
            .withColumn("r2", F.row_number().over(w2))
            .filter(F.col("r2") <= k)
            .count()
        )
        wall = time.time() - t0
        assert n > 0
        return round(wall, 1)

    skew_wall = topk_wall(90)
    uniform_wall = topk_wall(0)
    skew = {
        "n_urls": n_frontier,
        "skewed_90pct_one_host_wall_sec": skew_wall,
        "uniform_wall_sec": uniform_wall,
        "skew_penalty_x": round(skew_wall / max(uniform_wall, 0.1), 2),
    }

    print("RESULT " + json.dumps({"big_extract": big, "salted_topk": skew}))
    spark.stop()


if __name__ == "__main__":
    main()
