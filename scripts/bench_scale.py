"""Scaling bench: the 10 heaviest queries at two data scales and/or two
parallelism levels.

Two axes of evidence (VERDICT r4 task 7 + the north rule's two-cluster
criterion, which this sandbox can only approximate with core counts):

  data scaling   — sf0.1 (driver tables) vs sf1 (scripts/make_sf1.py,
                   10x): per-query wall ratio should stay ~<=12x
                   (linear + shuffle growth); super-linear outliers are
                   scale bugs.
  cluster scaling— the SAME sf input at local[8] vs local[32]: report
                   throughput at both plus efficiency
                   (t_8 / t_32) / (32/8).

Usage:
  python scripts/bench_scale.py --sf-dir /root/testdata/sf0.1 --cpus 32
  python scripts/bench_scale.py --sf-dir .localdata/sf1 --cpus 32
  python scripts/bench_scale.py --sf-dir .localdata/sf1 --cpus 8

Prints ONE JSON line per invocation:
  {"sf": ..., "cpus": ..., "queries": {name: sec, ...}}
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_dust_pages(spark, mult: int):
    """_dust_pages (__spark_entry__) scaled: 2000*mult duplicate groups
    + 500*mult noise URLs."""
    from pyspark.sql import functions as F

    df = spark.range(6000 * mult)
    g = (F.col("id") / 3).cast("long")
    v = F.col("id") % 3
    base = F.concat(
        F.lit("https://d"), (g % (7 * mult)).cast("string"),
        F.lit(".example/art/"), g.cast("string"),
    )
    url = (
        F.when(v == 0, base)
        .when(v == 1, F.concat(base, F.lit("?sessionid=zz")))
        .otherwise(F.concat(base, F.lit("/index.html")))
    )
    pages = df.filter((v < 2) | (g % 3 == 0)).select(
        url.alias("url"), g.alias("content_sig")
    )
    noise = spark.range(500 * mult).select(
        F.concat(
            F.lit("https://noise.example/n/"), F.col("id").cast("string")
        ).alias("url"),
        (F.col("id") + 100000 * mult).alias("content_sig"),
    )
    return pages.unionByName(noise)


def synth_mirror_hosts(spark, mult: int):
    """q_mirror_hosts's planted corpus scaled: full mirrors + partial
    overlaps + a boilerplate mega-signature shared by many hosts."""
    from pyspark.sql import functions as F

    full = spark.range(2000 * mult).select(
        F.concat(
            F.when(F.col("id") % 40 < 20, F.lit("ma")).otherwise(F.lit("mb")),
            (F.col("id") / 40).cast("long").cast("string"),
            F.lit(".example"),
        ).alias("host"),
        ((F.col("id") / 40).cast("long") * 100 + F.col("id") % 20).alias(
            "content_sig"
        ),
    )
    partial = spark.range(1200 * mult).select(
        F.concat(
            F.when(F.col("id") % 40 < 20, F.lit("pa")).otherwise(F.lit("pb")),
            (F.col("id") / 40).cast("long").cast("string"),
            F.lit(".example"),
        ).alias("host"),
        (
            10_000_000
            + (F.col("id") / 40).cast("long") * 100
            + F.when(F.col("id") % 40 < 20, F.col("id") % 20).otherwise(
                F.col("id") % 20 + 10
            )
        ).alias("content_sig"),
    )
    boiler = spark.range(200 * mult).select(
        F.concat(F.lit("bp"), F.col("id").cast("string"), F.lit(".example"))
        .alias("host"),
        F.lit(99_999_999).alias("content_sig"),
    )
    return full.unionByName(partial).unionByName(boiler)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()
    sf_dir = args.sf_dir
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1
    mult = max(1, round(sf / 0.1))

    import pyspark.sql.functions as F

    import __spark_entry__ as entrymod
    from go_htmldate_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from go_htmldate_spark.operators.extract import extract_dates
    from go_htmldate_spark.operators.similarity import ann_selfjoin_pairs
    from go_htmldate_spark.options import Options
    from go_htmldate_spark.plans.dust import apply_dust_rules, dust_rules
    from go_htmldate_spark.plans.mirrors import mirror_host_pairs
    from go_htmldate_spark.session import get_spark
    from go_htmldate_spark.sources.pages import synth_pages

    spark = get_spark(app_name="bench-scale", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    timings: dict[str, float] = {}

    def run(name: str, fn, reps: int = 2) -> None:
        if args.only and name not in args.only:
            return
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn()
            el = time.time() - t0
            best = el if best is None or el < best else best
        timings[name] = round(best, 3)
        print(f"  {name}: {best:.2f}s", file=sys.stderr)

    # warm JVM + Python workers
    warm = synth_pages(spark, args.cpus * 32, seed=1, partitions=args.cpus)
    extract_dates(warm, Options()).count()

    # 1. flagship cascade, corpus sized to sf (bench.py's law)
    n_pages = max(2000, int(200_000 * sf))
    pages = synth_pages(spark, n_pages, seed=42).cache()
    pages.count()
    run("extract_cascade", lambda: extract_dates(
        pages, Options(use_original_date=True)
    ).write.format("noop").mode("overwrite").save(), reps=1)
    pages.unpersist()

    # 2. dedup/ANN at the at-scale hash family over the sf tables
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    dup = docs.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(dup)
    run("minhash_lsh_pairs", lambda: lsh_candidate_pairs(
        minhash_signatures(corpus, n_hashes=32), bands=8
    ).write.format("noop").mode("overwrite").save(), reps=3)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    edup = emb.filter(F.col("vec_id") % 9 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    run("ann_selfjoin", lambda: ann_selfjoin_pairs(
        emb.unionByName(edup), dim=64, min_cosine=0.9, n_planes=8, n_tables=8
    ).write.format("noop").mode("overwrite").save())

    # 3. driver-contract heavies straight from queries() (documents /
    # orders scale with the sf dir)
    queries = entrymod.queries()
    for name in ("jaccard_pairs", "pipeline_curate", "host_pagerank",
                 "sitemap_parse"):
        fn = queries[name]
        run(name, lambda f=fn: f(spark, sf_dir)
            .write.format("noop").mode("overwrite").save())

    # 4. dust + mirrors over mult-scaled planted corpora
    dust_pages = synth_dust_pages(spark, mult).cache()
    dust_pages.count()
    run("dust_apply", lambda: apply_dust_rules(
        dust_pages.select("url").distinct(),
        dust_rules(dust_pages, min_support=2),
    ).write.format("noop").mode("overwrite").save())
    dust_pages.unpersist()
    mh = synth_mirror_hosts(spark, mult).cache()
    mh.count()
    run("mirror_hosts", lambda: mirror_host_pairs(
        mh, min_shared=3, min_resemblance=0.25
    ).write.format("noop").mode("overwrite").save())
    mh.unpersist()

    # 5. full crawl round, every crawl-waste gate active (bench.py 3b)
    from go_htmldate_spark.plans.backoff import host_backoff
    from go_htmldate_spark.plans.canonical import url_host
    from go_htmldate_spark.plans.redirects import resolve_redirects
    from go_htmldate_spark.plans.scheduler import CrawlConfig, CrawlScheduler

    if not args.only or "frontier_round_all_gates" in args.only:
        crawl_pages = synth_pages(
            spark, max(5000, int(50_000 * sf)), seed=42, heavy_host_share=30
        ).cache()
        crawl_pages.count()
        dust_rules_df = spark.createDataFrame(
            [("?sessionid=zz", "", 50), ("/index.html", "", 30)],
            "alpha string, beta string, support long",
        )
        redirects_df = resolve_redirects(spark.createDataFrame(
            [(f"https://r{i}.example/a", f"https://r{i}.example/t")
             for i in range(200)],
            "src_url string, dst_url string",
        ))
        blocklist_df = spark.createDataFrame(
            [(f"blocked{i}.example",) for i in range(500)], "domain string"
        )
        hosts_df = crawl_pages.select(
            url_host(F.col("url")).alias("host")
        ).distinct()
        host_ip_df = hosts_df.select(
            "host", F.concat(F.lit("10.0."), (F.xxhash64("host") % 64)
                             .cast("string")).alias("ip")
        )
        backoff_df = host_backoff(hosts_df.select(
            "host", F.lit(1.0).alias("fetch_ts"), F.lit(True).alias("ok")
        ))
        best = None
        for _ in range(2):
            state_dir = tempfile.mkdtemp(prefix="bench_scale_crawl_")
            try:
                sched = CrawlScheduler(
                    spark, crawl_pages, robots=None,
                    host_budget=backoff_df.select(
                        "host", "politeness_budget"
                    ),
                    state_dir=state_dir,
                    config=CrawlConfig(
                        n_bloom_partitions=8, bloom_bits=1 << 18,
                        trap_guard=True, ip_budget=4, aging=0.05,
                    ),
                    blocklist=blocklist_df, redirects=redirects_df,
                    dust=dust_rules_df, host_ip=host_ip_df,
                )
                seeds = crawl_pages.select("url").limit(256).withColumn(
                    "priority", F.lit(1.0)
                )
                sched.init_from_seeds(seeds)
                t0 = time.time()
                sched.run_round()
                el = time.time() - t0
                best = el if best is None or el < best else best
            finally:
                shutil.rmtree(state_dir, ignore_errors=True)
        timings["frontier_round_all_gates"] = round(best, 3)
        print(f"  frontier_round_all_gates: {best:.2f}s", file=sys.stderr)
        crawl_pages.unpersist()

    print(json.dumps({
        "sf": sf, "cpus": args.cpus, "queries": timings,
        "total": round(sum(timings.values()), 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
