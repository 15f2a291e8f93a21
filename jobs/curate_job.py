"""spark-submit entrypoint for the WARC→training-text curation pipeline.

    spark-submit --py-files go_htmldate_spark.zip jobs/curate_job.py \
        --warc '/data/crawl/*.warc.gz' --output /data/clean_parquet \
        [--blocklist /data/ut1.parquet] [--sample en=1.0,de=0.3,*=0.05]

Build the zip with:  python -m zipfile -c go_htmldate_spark.zip go_htmldate_spark

Pipeline (all stages oracle-gated individually as driver queries):
WARC read → pages projection → host blocklist gate → date extraction →
lang-ID + C4 heuristics + Gopher repetition gates → optional line-level
cross-document dedup (--line-dedup N) → optional ExactSubstr span cut
(--exact-substr NGRAM) → exact dedup → deterministic stratified sample
→ token stats → parquet sink.

Input can also be a pages parquet table (--pages) to skip the WARC
edge, or --synth N to synthesize a corpus in this sandbox.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_fractions(spec: str) -> tuple[dict, float]:
    """'en=1.0,de=0.3,*=0.05' → ({'en': 1.0, 'de': 0.3}, 0.05)."""
    fracs: dict[str, float] = {}
    default = 0.0
    for part in spec.split(","):
        k, _, v = part.partition("=")
        if k.strip() == "*":
            default = float(v)
        else:
            fracs[k.strip()] = float(v)
    return fracs, default


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warc", help="WARC glob (Common-Crawl layout)")
    ap.add_argument("--pages", help="parquet dir of pages (url, warc_ts, html)")
    ap.add_argument("--synth", type=int, default=0, help="synthesize N pages instead")
    ap.add_argument("--output", required=True, help="curated parquet dir")
    ap.add_argument("--blocklist", help="parquet dir with a 'domain' column (UT1-style)")
    ap.add_argument("--sample", default="", help="stratum fractions, e.g. en=1.0,de=0.3,*=0.05")
    ap.add_argument("--seed", type=int, default=0, help="sampling seed")
    ap.add_argument(
        "--line-dedup", type=int, default=0, metavar="MIN_DOCS",
        help="remove lines repeating across >= MIN_DOCS docs (RefinedWeb "
        "line-wise correction); 0 disables",
    )
    ap.add_argument(
        "--exact-substr", type=int, default=0, metavar="NGRAM",
        help="cut tokens covered by any corpus-duplicated NGRAM-token "
        "window (ExactSubstr, Lee et al. 2022); 0 disables",
    )
    ap.add_argument(
        "--quality-threshold", type=float, default=None, metavar="LOGIT",
        help="keep docs whose hashing-trick linear-classifier logit "
        "exceeds LOGIT (fastText-shaped quality model); omit to disable",
    )
    ap.add_argument(
        "--quality-weights", metavar="DIR",
        help="parquet dir with (bucket, weight) trained weights for "
        "--quality-threshold; defaults to the deterministic dyadic "
        "stand-in vector",
    )
    ap.add_argument(
        "--quality-dim", type=int, default=4096,
        help="hash bucket count for --quality-threshold",
    )
    ap.add_argument(
        "--quality-seed", type=int, default=0,
        help="feature-hash seed for --quality-threshold; part of the "
        "trained model's identity (weights trained under one seed "
        "score noise under another), so it is deliberately decoupled "
        "from the sampling --seed",
    )
    ap.add_argument(
        "--host-cap", type=int, default=0, metavar="CAP",
        help="keep at most CAP docs per host (domain-fairness guard, "
        "salted two-phase exact rank); 0 disables",
    )
    ap.add_argument(
        "--year-mix", default="", metavar="SPEC",
        help="temporal rebalance to a publication-year mix, e.g. "
        "'2020=0.5,2021=0.3,2022=0.2' (years come from the extracted "
        "date; undated docs drop under a mix)",
    )
    ap.add_argument(
        "--gopher-rules", action="store_true",
        help="also gate on the Gopher structural rules (symbol ratio, "
        "bullet/ellipsis line fractions, alphabetic-word share, "
        "stop-word presence)",
    )
    ap.add_argument(
        "--blockwords", metavar="FILE",
        help="newline-delimited word blocklist (C4's word-level "
        "exclusion gate); documents containing any listed token drop",
    )
    ap.add_argument(
        "--text-extractor", choices=["strip", "visible"], default="strip",
        help="text carrier for the curation chain: 'strip' (bare tag "
        "removal, the historical default) or 'visible' (drop "
        "script/style/head subtrees and comments, block tags to "
        "newlines, entities decoded — operators/textextract)",
    )
    ap.add_argument(
        "--respect-noindex", action="store_true",
        help="honor page-level robots metas: pages whose own "
        "<meta name=robots> says noindex (or none) never enter the "
        "curated corpus (a training corpus is an index)",
    )
    ap.add_argument(
        "--robots-agent", metavar="NAME",
        help="with --respect-noindex: also honor the crawler's own "
        "named meta (<meta name=NAME>) in union with the generic "
        "robots meta",
    )
    ap.add_argument(
        "--hreflang-dedup", action="store_true",
        help="collapse declared hreflang translation clusters to one "
        "page each (the x-default/cluster-key representative when "
        "fetched, else the first member) before extraction",
    )
    ap.add_argument(
        "--wet-output", metavar="DIR",
        help="also export the curated text as WET shards (WARC "
        "conversion records, the Common Crawl text artifact) into DIR",
    )
    ap.add_argument(
        "--wet-shards", type=int, default=8,
        help="shard count for --wet-output (deterministic url ranges)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from go_htmldate_spark.operators.curation import (
        c4_heuristics, host_blocklist_flag, line_dedup, remove_dup_spans,
        stratified_sample,
    )
    from go_htmldate_spark.operators.dedup import exact_dedup
    from go_htmldate_spark.operators.extract import extract_dates
    from go_htmldate_spark.operators.textstats import (
        gopher_repetition, lang_id, token_count,
    )
    from go_htmldate_spark.plans.canonical import url_host
    from go_htmldate_spark.session import get_spark
    from go_htmldate_spark.sources.pages import synth_pages
    from go_htmldate_spark.sources.warc import read_warc, warc_to_pages

    spark = get_spark(app_name="curate-job")

    if args.warc:
        pages = warc_to_pages(read_warc(spark, args.warc))
    elif args.pages:
        pages = spark.read.parquet(args.pages)
    elif args.synth:
        pages = synth_pages(spark, args.synth, seed=42)
    else:
        ap.error("need --warc, --pages, or --synth")

    # 1. URL gate first — cheapest filter, drops rows before any
    #    byte-heavy work (broadcast joins, no shuffle of pages)
    pages = pages.withColumn("host", url_host(F.col("url")))
    if args.blocklist:
        bl = spark.read.parquet(args.blocklist)
        pages = host_blocklist_flag(pages, bl, host_col="host").filter(
            ~F.col("blocked")
        ).drop("blocked")
    # 1b. page-level compliance + declared-duplicate gates, still on
    #     raw pages — map-only / projected-exchange work that drops
    #     rows before the byte-heavy extraction stage
    if args.respect_noindex:
        from go_htmldate_spark.plans.metarobots import noindex_corpus_gate

        pages = noindex_corpus_gate(pages, agent=args.robots_agent)
    if args.hreflang_dedup:
        from go_htmldate_spark.plans.hreflang import (
            hreflang_representative_filter,
        )

        pages = hreflang_representative_filter(pages)

    # 2. extraction (C-kernel pandas UDF; staged native URL fast path)
    html_str = F.col("html").cast("string")
    docs = extract_dates(
        pages.withColumn("html", html_str), url_col="url", html_col="html"
    ).select(
        "url", "host", "warc_ts", "date",
        F.col("html").cast("string").alias("text_html"),
    )
    # text = visible body text; here the html body itself is the text
    # carrier (a real deployment plugs a text extractor UDF in between)
    if args.text_extractor == "visible":
        from go_htmldate_spark.operators.textextract import visible_text

        docs = docs.withColumn(
            "text", visible_text(F.col("text_html"))
        ).drop("text_html")
    else:
        docs = docs.withColumn(
            "text",
            F.regexp_replace("text_html", r"<[^>]+>", " "),
        ).drop("text_html")

    # 3. quality + language gates (all native, map-only)
    # doc_id must be UNIQUE PER ROW: Common-Crawl inputs carry the same
    # URL at multiple fetch times (revisits) and occasionally the same
    # record twice across segments. xxhash64(url) alone would give
    # every revisit one id and the flag joins below would multiply
    # rows (2 fetches -> 2x2x2 = 8 output rows). Distinct fetches get
    # distinct (url, warc_ts); byte-identical re-stored records are
    # the same fetch and collapse here by construction.
    docs = docs.dropDuplicates(["url", "warc_ts"]).withColumn(
        "doc_id", F.xxhash64("url", "warc_ts")
    )
    docs = docs.withColumn("lang", lang_id(F.col("text")))
    c4 = c4_heuristics(docs.select("doc_id", "text")).select("doc_id", "c4_ok")
    rep = gopher_repetition(docs.select("doc_id", "text")).select(
        "doc_id", "gopher_ok"
    )
    docs = (
        docs.join(c4, "doc_id").join(rep, "doc_id")
        .filter(F.col("c4_ok") & F.col("gopher_ok"))
        .drop("c4_ok", "gopher_ok")
    )
    if args.gopher_rules:
        from go_htmldate_spark.operators.curation import (
            gopher_quality_rules,
        )

        gq = gopher_quality_rules(docs.select("doc_id", "text"))
        docs = docs.join(
            gq.filter("gopher_rules_ok").select("doc_id"), "doc_id"
        )
    if args.blockwords:
        from go_htmldate_spark.operators.curation import blockword_filter

        words = Path(args.blockwords).read_text(
            encoding="utf-8"
        ).splitlines()
        bw = blockword_filter(docs.select("doc_id", "text"), words)
        docs = docs.join(
            bw.filter("blockword_ok").select("doc_id"), "doc_id"
        )

    # 4. dedup + sample + token stats
    if args.line_dedup:
        # cross-document boilerplate lines out first (nav bars, cookie
        # banners), so exact dedup below sees the cleaned bodies; pages
        # reduced to nothing by the correction are dropped
        docs = (
            line_dedup(docs, min_docs=args.line_dedup)
            .join(docs.drop("text"), "doc_id")
            .withColumnRenamed("clean_text", "text")
            .filter(F.trim(F.col("text")) != "")
            .drop("n_lines", "n_removed")
        )
    if args.exact_substr:
        # corpus-duplicated n-token spans cut next (ExactSubstr, word
        # granularity): hashed=True shuffles 8-byte window keys, not
        # gram strings — the 100 TB path; emptied docs drop like above
        docs = (
            remove_dup_spans(docs, n=args.exact_substr, hashed=True)
            .join(docs.drop("text"), "doc_id")
            .withColumnRenamed("clean_text", "text")
            .filter(F.trim(F.col("text")) != "")
            .drop("n_tok", "n_removed")
        )
    if args.quality_threshold is not None:
        from go_htmldate_spark.operators.curation import (
            hashed_weights, linear_quality_score,
        )

        # the feature-hash seed is the MODEL's seed, not the sampling
        # seed: varying --seed to draw a different sample must not
        # remap every token bucket under trained --quality-weights
        w = (spark.read.parquet(args.quality_weights)
             if args.quality_weights
             else hashed_weights(spark, dim=args.quality_dim,
                                 seed=args.quality_seed))
        kept = linear_quality_score(
            docs.select("doc_id", "text"), w, dim=args.quality_dim,
            seed=args.quality_seed,
        ).filter(F.col("logit") > args.quality_threshold).select("doc_id")
        docs = docs.join(kept, "doc_id")
    docs = exact_dedup(docs, text_col="text", id_col="doc_id")
    if args.host_cap:
        from go_htmldate_spark.operators.curation import host_cap_sample

        docs = host_cap_sample(docs, "host", "doc_id", cap=args.host_cap,
                               seed=args.seed)
    if args.year_mix:
        from go_htmldate_spark.operators.curation import temporal_rebalance

        mix = {int(k): float(v) for k, v in
               (p.partition("=")[::2] for p in args.year_mix.split(","))}
        docs = docs.withColumn(
            "pub_year", F.substring("date", 1, 4).cast("int")
        )
        docs = temporal_rebalance(docs, "pub_year", "doc_id", mix,
                                  seed=args.seed).drop("pub_year")
    if args.sample:
        fracs, default = parse_fractions(args.sample)
        docs = stratified_sample(
            docs, "lang", fracs, key_col="doc_id", seed=args.seed,
            default_fraction=default,
        )
    docs = docs.withColumn("n_tok", token_count(F.col("text")).cast("long"))

    docs.write.mode("overwrite").parquet(args.output)
    out = spark.read.parquet(args.output)
    if args.wet_output:
        from go_htmldate_spark.sources.warc import write_wet_shards

        write_wet_shards(
            out.select("url", "warc_ts", "text"),
            args.wet_output,
            n_shards=args.wet_shards,
        )
    stats = out.agg(
        F.count("*").alias("docs"),
        F.sum("n_tok").alias("tokens"),
    ).head()
    print(json.dumps({
        "curated_docs": int(stats["docs"]),
        "curated_tokens": int(stats["tokens"] or 0),
        "output": args.output,
        **({"wet_output": args.wet_output} if args.wet_output else {}),
    }))


if __name__ == "__main__":
    main()
