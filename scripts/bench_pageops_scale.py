"""Two-parallelism scaling point for the page-structure operators
(north-rule two-cluster-size proxy): meta-robots flags + nofollow
anchor extraction (map-only page scan), rel=next pagination-chain
assembly (pointer doubling over millions of edges), and hreflang
translation-cluster keying + roll-up (join-free map pass + one
exchange).

One parallelism level per invocation so the process can be pinned:

    taskset -c 0-3  python scripts/bench_pageops_scale.py 4
    taskset -c 0-15 python scripts/bench_pageops_scale.py 16

Prints one JSON line per run; efficiency = (T_N / T_4N) / 4.  The
count/checksum fields must be IDENTICAL across parallelism — the
repo-wide determinism invariant.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PAGES = int(os.environ.get("PAGEOPS_PAGES", "1500000"))


def materialize(spark, base_dir: str) -> None:
    """One synthetic page corpus serving all three operators, written
    once untimed: page i carries a robots meta on i%5==0 (nofollow on
    i%10==0), two absolute anchors (the second rel=nofollow on
    i%3==0), a rel=next link forming 8-page chains over id//8, and a
    4-variant hreflang block over cluster id//4."""
    import pyspark.sql.functions as F

    i = F.col("id")
    chain, j = (i / 8).cast("long"), i % 8
    cluster, v = (i / 4).cast("long"), i % 4
    url = F.concat(F.lit("https://h"), (i % 20000).cast("string"),
                   F.lit(".example/p/"), i.cast("string"))
    meta = (
        F.when(i % 10 == 0,
               F.lit('<meta name="robots" content="noindex, nofollow">'))
        .when(i % 5 == 0, F.lit('<meta name="robots" content="noarchive">'))
        .otherwise(F.lit('<meta charset="utf-8">'))
    )
    a1 = F.concat(F.lit('<a href="https://t'), (i % 97).cast("string"),
                  F.lit('.example/a/'), i.cast("string"),
                  F.lit('">Read Article</a>'))
    a2 = F.concat(
        F.when(i % 3 == 0, F.lit('<a rel="nofollow" href="https://t'))
        .otherwise(F.lit('<a href="https://t')),
        ((i + 3) % 97).cast("string"), F.lit('.example/b/'),
        i.cast("string"), F.lit('">more</a>'),
    )
    nxt = F.when(j < 7, F.concat(
        F.lit('<link rel="next" href="https://h'),
        ((i + 1) % 20000).cast("string"), F.lit(".example/p/"),
        (i + 1).cast("string"), F.lit('">'),
    )).otherwise(F.lit(""))
    lang = (
        F.when(v == 0, F.lit("de")).when(v == 1, F.lit("en"))
        .when(v == 2, F.lit("fr")).otherwise(F.lit("pt"))
    )

    def variant(w, lg):
        return F.concat(
            F.lit(f'<link rel="alternate" hreflang="{lg}" '
                  f'href="https://{lg}.c'),
            cluster.cast("string"), F.lit('.example/d">'),
        )

    hreflang = F.concat(variant(0, "de"), variant(1, "en"),
                        variant(2, "fr"), variant(3, "pt"))
    og = F.when(i % 4 == 0, F.concat(
        F.lit('<meta property="og:url" content="https://canon'),
        (i % 9).cast("string"), F.lit(".example/c/"), i.cast("string"),
        F.lit('">'),
    )).otherwise(F.lit(""))
    refresh = F.when(i % 100 == 0, F.concat(
        F.lit('<meta http-equiv="refresh" content="0;url=https://mv'),
        (i % 7).cast("string"), F.lit(".example/r/"), i.cast("string"),
        F.lit('">'),
    )).otherwise(F.lit(""))
    page_url = F.concat(F.lit("https://"), lang, F.lit(".c"),
                        cluster.cast("string"), F.lit(".example/d"))
    html = F.concat(
        F.lit("<html><head>"), meta, og, refresh, nxt, hreflang,
        F.lit('<link rel="stylesheet" href="/css"></head><body>'),
        a1, F.lit(" filler text between the anchors "), a2,
        F.lit("</body></html>"),
    )
    spark.range(N_PAGES).select(
        url.alias("url"), page_url.alias("hurl"), html.alias("html")
    ).repartition(64).write.mode("overwrite").parquet(f"{base_dir}/pages")


def run_ops(spark, base_dir: str) -> dict:
    import pyspark.sql.functions as F

    from go_htmldate_spark.plans.hreflang import (
        hreflang_cluster_stats,
        hreflang_clusters,
    )
    from go_htmldate_spark.plans.metarobots import (
        extract_follow_anchors,
        meta_robots_flags,
    )
    from go_htmldate_spark.plans.pagination import (
        pagination_chains,
        rel_next_edges,
    )

    pages = spark.read.parquet(f"{base_dir}/pages")
    out = {}

    t0 = time.time()
    flags = meta_robots_flags(pages)
    anchors = extract_follow_anchors(pages)
    frow = flags.agg(
        F.sum(F.when(F.col("noindex"), 1).otherwise(0)).alias("ni"),
        F.sum(F.when(F.col("nofollow"), 1).otherwise(0)).alias("nf"),
    ).head()
    arow = anchors.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("followed"), 1).otherwise(0)).alias("fl"),
        F.sum(F.crc32(F.col("target_url"))).alias("ck"),
    ).head()
    out["robots_wall_s"] = round(time.time() - t0, 2)
    out["robots_noindex"] = int(frow["ni"])
    out["robots_nofollow"] = int(frow["nf"])
    out["anchors_rows"] = int(arow["n"])
    out["anchors_followed"] = int(arow["fl"])
    out["anchors_checksum"] = int(arow["ck"])

    t0 = time.time()
    chains = pagination_chains(
        rel_next_edges(pages), max_pages=16
    )
    crow = chains.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("page_idx").alias("si"),
        F.sum(F.crc32(F.col("root_url"))).alias("ck"),
    ).head()
    out["chains_wall_s"] = round(time.time() - t0, 2)
    out["chains_rows"] = int(crow["n"])
    out["chains_idx_sum"] = int(crow["si"])
    out["chains_checksum"] = int(crow["ck"])

    t0 = time.time()
    cl = hreflang_clusters(pages.select(
        F.col("hurl").alias("url"), "html"
    ))
    stats = hreflang_cluster_stats(cl)
    srow = stats.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_members").alias("m"),
        F.sum(F.crc32(F.col("cluster_key"))).alias("ck"),
    ).head()
    out["hreflang_wall_s"] = round(time.time() - t0, 2)
    out["hreflang_clusters"] = int(srow["n"])
    out["hreflang_members"] = int(srow["m"])
    out["hreflang_checksum"] = int(srow["ck"])

    # closing ops composed: visible-text carrier + single-scan alias
    # union + anchor-derived outlinks, all map-only over the corpus
    from go_htmldate_spark.operators.textextract import pages_to_text
    from go_htmldate_spark.plans.aliases import page_alias_edges
    from go_htmldate_spark.plans.metarobots import derive_outlinks

    t0 = time.time()
    vt = pages_to_text(pages).agg(
        F.sum("n_chars").alias("c"), F.sum("n_lines").alias("l"),
    ).head()
    al = page_alias_edges(pages).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.crc32(F.col("dst_url"))).alias("ck"),
    ).head()
    ol = derive_outlinks(pages).agg(
        F.sum(F.size("outlinks")).alias("n"),
    ).head()
    out["closing_wall_s"] = round(time.time() - t0, 2)
    out["text_chars"] = int(vt["c"])
    out["text_lines"] = int(vt["l"])
    out["alias_edges"] = int(al["n"])
    out["alias_checksum"] = int(al["ck"])
    out["outlinks_total"] = int(ol["n"])
    return out


def main() -> None:
    import shutil
    import tempfile

    from go_htmldate_spark.session import get_spark

    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    spark = get_spark(
        app_name=f"pageops-scale-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
    )
    base_dir = tempfile.mkdtemp(prefix="pageops_scale_")
    try:
        materialize(spark, base_dir)
        out = {"cores": cores, "n_pages": N_PAGES}
        t0 = time.time()
        out.update(run_ops(spark, base_dir))
        out["total_wall_s"] = round(time.time() - t0, 2)
        out["pages_per_sec"] = round(N_PAGES / out["total_wall_s"], 1)
        print(json.dumps(out))
    finally:
        shutil.rmtree(base_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
