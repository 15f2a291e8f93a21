"""spark-submit entrypoint for the crawl frontier + extraction engine.

    spark-submit --py-files go_htmldate_spark.zip jobs/crawl_job.py \
        --pages /data/pages_parquet --state /data/crawl_state \
        --seeds /data/seeds.parquet --rounds 10 [--resume]

Build the zip with:  python -m zipfile -c go_htmldate_spark.zip go_htmldate_spark

In this sandbox the corpus can be synthesized: pass --synth N instead
of --pages. Seeds can come from fetched sitemaps (--sitemaps, parsed
natively and prioritized by lastmod recency) and per-host politeness
budgets from host-graph PageRank over the corpus outlinks
(--pagerank-budgets LO,HI) or live OPIC importance that re-ranks after
every round's fetches (--opic-budgets LO,HI).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="parquet dir of pages (url, warc_ts, html, text, lang, outlinks)")
    ap.add_argument("--synth", type=int, default=0, help="synthesize N pages instead")
    ap.add_argument("--seeds", help="parquet dir of seeds (url, priority)")
    ap.add_argument("--n-seeds", type=int, default=64, help="derive seeds from corpus when --seeds absent")
    ap.add_argument("--state", required=True, help="state/snapshot directory")
    ap.add_argument("--robots", help="parquet dir of robots rules (optional)")
    ap.add_argument("--budgets", help="parquet dir of host budgets (optional)")
    ap.add_argument(
        "--blocklist",
        help="parquet/csv dir of blocked domains, UT1-style (a 'domain' "
        "column); discovered URLs on blocked hosts never enter the frontier",
    )
    ap.add_argument(
        "--sitemaps",
        help="parquet dir of fetched sitemap bodies (sitemap_url, xml); "
        "parsed urlset entries become the seed list, prioritized by "
        "lastmod recency (ignored with --seeds or --resume)",
    )
    ap.add_argument(
        "--sitemaps-from-robots",
        metavar="ROBOTS_BODIES",
        help="with --sitemaps: parquet dir of raw robots bodies "
        "(host, robots_txt); only sitemap bodies advertised by a "
        "`Sitemap:` line are parsed into seeds",
    )
    ap.add_argument(
        "--feeds",
        help="parquet dir of fetched RSS/Atom feed bodies (feed_url, "
        "xml); parsed entries become seeds prioritized by pubDate "
        "recency, merged with --sitemaps seeds when both are given "
        "(max priority per url; ignored with --seeds or --resume)",
    )
    ap.add_argument(
        "--pagerank-budgets", metavar="LO,HI",
        help="derive per-host politeness budgets from host-graph PageRank "
        "over the corpus outlinks, log-mapped onto [LO,HI] "
        "(e.g. 1.0,8.0); overrides --budgets",
    )
    ap.add_argument(
        "--opic-budgets", metavar="LO,HI",
        help="OPIC on-line importance (Abiteboul WWW'03): a 3-sweep "
        "cold-start batch over the corpus out-link host graph seeds "
        "per-host politeness budgets log-mapped onto [LO,HI]; each "
        "crawl round then runs ONE online sweep (that round's fetched "
        "hosts spend cash over that round's observed out-links) and "
        "budgets refresh as min(other sources, OPIC) — importance "
        "stays live without ever re-running a batch rank job",
    )
    ap.add_argument(
        "--hits-budgets", metavar="LO,HI",
        help="derive per-host politeness budgets from HITS hub scores "
        "(Kleinberg JACM'99) over the corpus outlinks, log-mapped onto "
        "[LO,HI] — hubs are link farms of good targets whose recrawl "
        "yields fresh frontier URLs, so this allocates outlink-harvest "
        "budget; min-merges with the other budget sources",
    )
    ap.add_argument(
        "--trustrank-budgets", metavar="LO,HI",
        help="TrustRank (Gyöngyi VLDB'04) over the corpus outlinks with "
        "the teleport restricted to --trust-seeds hosts, log-mapped "
        "onto [LO,HI] and min-merged: link-spam farms rank high on raw "
        "PageRank but starve here, losing fetch budget the blocklist "
        "never heard of",
    )
    ap.add_argument(
        "--trust-seeds", metavar="PARQUET",
        help="with --trustrank-budgets: parquet dir of hand-vetted "
        "trusted hosts (host)",
    )
    ap.add_argument(
        "--lang-budgets", metavar="LANG=Q[,...][,*=F]",
        help="language-balanced crawl: per-host majority language "
        "mapped to fetch quotas (e.g. en=8,de=4,*=1), min-merged with "
        "the other budget sources",
    )
    ap.add_argument(
        "--redirects",
        help="parquet dir of one-hop redirect edges (src_url, dst_url, "
        "canonical); chains resolve to terminal targets before "
        "discovered URLs enter the frontier, cycle members drop",
    )
    ap.add_argument(
        "--canonical-links", action="store_true",
        help="mine rel=canonical alias edges from the page corpus "
        "(map-only regexp scan) and resolve them together with "
        "--redirects edges — discovered aliases collapse to the "
        "page-declared canonical target",
    )
    ap.add_argument(
        "--collapse-aliases", action="store_true",
        help="mine EVERY client-side alias channel (meta-refresh, "
        "og:url, AMP and m-dot mobile variants) from the page corpus "
        "and resolve them with the other redirect edges — a "
        "discovered variant URL collapses into the page that owns the "
        "frontier slot",
    )
    ap.add_argument(
        "--refresh-redirects", action="store_true",
        help="mine <meta http-equiv=refresh> client-side redirect "
        "edges from the page corpus (map-only regexp scan) and "
        "resolve them together with --redirects/--canonical-links "
        "edges — chains crossing channels (a 301 landing on a refresh "
        "shell) still collapse to one terminal",
    )
    ap.add_argument(
        "--recrawl-history",
        help="parquet dir of fetch history (url, fetch_ts, content_sig); "
        "seeds become Cho-Garcia-Molina recrawl priorities "
        "1-exp(-rate*age) — a refetch round over already-crawled URLs. "
        "Age is measured at --recrawl-as-of, defaulting to the history's "
        "newest fetch_ts (deterministic, data-derived). URLs with a "
        "single fetch have no interval and are not re-seeded. Ignored "
        "with --seeds or --resume.",
    )
    ap.add_argument(
        "--recrawl-as-of", type=float, default=None, metavar="EPOCH_S",
        help="with --recrawl-history: the 'now' against which page age "
        "is measured (epoch seconds)",
    )
    ap.add_argument(
        "--dust-history",
        help="parquet dir of (url, content_sig) observations (the "
        "fetch-history table works); DUST alias rules are mined from "
        "same-content URL pairs and discovered outlinks rewrite to "
        "their canonical spelling before entering the frontier",
    )
    ap.add_argument(
        "--demote-mirrors",
        metavar="HISTORY_DIR",
        help="parquet dir of (url, content_sig) observations; hosts "
        "detected as mirrors (Broder resemblance of per-host "
        "fingerprint sets >= --mirror-threshold) are demoted to a "
        "0-fetch politeness budget, keeping one host per mirror set",
    )
    ap.add_argument(
        "--mirror-threshold", type=float, default=0.9,
        help="resemblance at or above which the greater host of a "
        "pair is demoted (default 0.9)",
    )
    ap.add_argument(
        "--demote-soft404",
        metavar="PAGES_DIR",
        help="parquet dir of fetched pages (url, text); hosts whose "
        "soft-404 rate (error-phrase+tiny-body pages and host error "
        "templates served as 200s) reaches --soft404-threshold over "
        ">= 20 observed pages are demoted to a 0-fetch budget",
    )
    ap.add_argument(
        "--soft404-threshold", type=float, default=0.5,
        help="per-host soft-404 rate at or above which the host is "
        "demoted (default 0.5)",
    )
    ap.add_argument(
        "--demote-parked",
        metavar="PAGES_DIR",
        help="parquet dir of fetched pages (url, html, text); hosts "
        "whose parked/link-farm page rate (registrar phrases, "
        "meta-refresh shells, anchor grids) reaches --parked-threshold "
        "over >= 3 observed pages are demoted to a 0-fetch budget",
    )
    ap.add_argument(
        "--parked-threshold", type=float, default=0.8,
        help="per-host parked rate at or above which the host is "
        "demoted (default 0.8)",
    )
    ap.add_argument(
        "--backoff-log",
        help="parquet dir of the fetch log (host, fetch_ts, ok); hosts "
        "with trailing failure streaks get exponentially halved "
        "politeness budgets, floored at 0.25 so they stay probe-able",
    )
    ap.add_argument(
        "--adaptive-delay-log",
        help="parquet dir of the timed fetch log (host, fetch_ts, "
        "duration_ms); per-host crawl delay = clamp(--delay-factor x "
        "last fetch duration) and the implied fetches/round budget "
        "min-merges with the other sources (only ever lowering a "
        "host below the scheduler default)",
    )
    ap.add_argument(
        "--delay-factor", type=float, default=5.0,
        help="multiple of the last fetch duration a host rests "
        "between fetches (default 5.0, the Heritrix default)",
    )
    ap.add_argument(
        "--max-delay-ms", type=float, default=120000.0,
        help="delay clamp for --adaptive-delay-log (default 120000: a "
        "host answering in 24s+ drops to 0.5 fetches/round)",
    )
    ap.add_argument(
        "--round-seconds", type=float, default=60.0,
        help="wall seconds one scheduler round represents when mapping "
        "--adaptive-delay-log delays onto fetches/round budgets",
    )
    ap.add_argument(
        "--host-ip",
        help="parquet dir of the DNS cache (host, ip); with "
        "--ip-budget, virtual hosts resolving to one server share the "
        "per-IP fetch cap (queue-by-IP politeness)",
    )
    ap.add_argument(
        "--ip-budget", type=int, default=0,
        help="fetches/round shared by all hosts on one IP (0 = off)",
    )
    ap.add_argument(
        "--site-budget", type=int, default=0,
        help="fetches/round shared by all hosts of one registrable "
        "domain (publicsuffix.org grouping: www/img1/img2 of one site "
        "share the cap, *.github.io tenants stay separate; 0 = off)",
    )
    ap.add_argument(
        "--psl", metavar="FILE",
        help="with --site-budget: public suffix list file (one rule "
        "per line, publicsuffix.org format); default is the built-in "
        "representative subset",
    )
    ap.add_argument(
        "--aging", type=float, default=0.0,
        help="starvation guard: additive per-round priority boost for "
        "frontier URLs that lost the politeness race (0 = off)",
    )
    ap.add_argument(
        "--trap-guard", action="store_true",
        help="drop discovered URLs that look like crawl traps (depth "
        "caps, consecutive path-segment repeats, query cross products, "
        "session-id minting) before they enter the frontier",
    )
    ap.add_argument(
        "--respect-nofollow", action="store_true",
        help="honor page-level robots metas: a fetched page whose own "
        "<meta name=robots> says nofollow (or none) contributes no "
        "outlinks to discovery",
    )
    ap.add_argument(
        "--robots-agent", metavar="NAME",
        help="with --respect-nofollow: also honor the crawler's own "
        "named meta (<meta name=NAME>), the Robots Meta Tag spec's "
        "per-bot channel, in union with the generic robots meta",
    )
    ap.add_argument(
        "--demote-noindex",
        metavar="PAGES_DIR",
        help="parquet dir of fetched pages (url, html); hosts whose "
        "noindex-page rate reaches --noindex-threshold over >= 5 "
        "observed pages are demoted to a 0-fetch budget — fetching "
        "pages the index must drop is wasted politeness",
    )
    ap.add_argument(
        "--noindex-threshold", type=float, default=0.8,
        help="per-host noindex rate at or above which the host is "
        "demoted (default 0.8)",
    )
    ap.add_argument(
        "--max-outlinks", type=int, default=256,
        help="per-page cap when outlinks must be derived from anchors "
        "(corpora without an outlinks column, e.g. WARC-sourced); a "
        "link-farm page cannot flood the frontier (default 256)",
    )
    ap.add_argument(
        "--demote-deep-pages",
        metavar="PAGES_DIR",
        help="parquet dir of fetched pages (url, html); rel=next "
        "pagination chains are assembled from their declarations and "
        "members past --max-page-idx (plus every cyclic member) are "
        "suppressed from discovery — tag-archive page 47 stops "
        "consuming politeness slots",
    )
    ap.add_argument(
        "--max-page-idx", type=int, default=3,
        help="deepest pagination index still crawled by "
        "--demote-deep-pages (default 3)",
    )
    ap.add_argument(
        "--yield-log",
        metavar="LOG_DIR",
        help="parquet dir of a prior cycle's fetch log (url + date or "
        "dated); per-URL-pattern date-yield rates are learned from it "
        "(Beta(1,1) posterior mean) and each round's scheduling "
        "priority is multiplied by the pattern's yield — URL shapes "
        "that historically produce dated articles outrank nav/tag/"
        "asset shapes. Frontier state stays in base priority currency",
    )
    ap.add_argument(
        "--demote-typosquat",
        metavar="BRANDS_FILE",
        help="newline-delimited list of protected brand hosts; corpus "
        "hosts whose registrable core is within --typosquat-dist edits "
        "of a brand core (or the same core on another suffix) are "
        "demoted to a 0-fetch budget",
    )
    ap.add_argument(
        "--typosquat-dist", type=int, default=1,
        help="edit-distance radius for --demote-typosquat (default 1)",
    )
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument(
        "--expire-keep", type=int, default=0, metavar="N",
        help="after the run, expire state snapshots keeping the newest "
        "N fully-resumable rounds (seen-chain segments still referenced "
        "by kept manifests survive; 0 = never expire)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from go_htmldate_spark.plans.scheduler import CrawlConfig, CrawlScheduler
    from go_htmldate_spark.session import get_spark
    from go_htmldate_spark.sources.pages import synth_pages

    spark = get_spark(app_name="crawl-job")

    if args.synth:
        pages = synth_pages(spark, args.synth, seed=42)
    elif args.pages:
        pages = spark.read.parquet(args.pages)
    else:
        ap.error("need --pages or --synth")

    if "outlinks" not in pages.columns:
        # WARC-derived corpora carry only (url, warc_ts, html):
        # discovery edges come from the pages' own anchors — resolved
        # against each page's origin, capped per page, optionally
        # nofollow-filtered. Map-only; rides the corpus partitioning.
        from go_htmldate_spark.plans.metarobots import derive_outlinks

        pages = derive_outlinks(
            pages, max_links=args.max_outlinks,
            respect_nofollow=args.respect_nofollow,
            agent=args.robots_agent,
        )
        print(f"derived outlinks from anchors (cap {args.max_outlinks})")

    robots = spark.read.parquet(args.robots) if args.robots else None
    budgets = spark.read.parquet(args.budgets) if args.budgets else None
    # per-host min across budget tables: the more cautious source
    # (demotion, backoff) always wins — the scheduler's own merge law
    from go_htmldate_spark.plans.scheduler import min_budgets as merge_budgets

    def _lohi(flag):
        lo, _, hi = flag.partition(",")
        return float(lo), float(hi or lo)

    edges = None

    def _host_edges():
        # ONE outlink host-edge frame shared by every rank source AND
        # the OPIC cold start — the pages explode + url_host scan is
        # paid once, not per flag — checkpointed so each consumer
        # reads the materialized edges
        nonlocal edges
        if edges is None:
            from go_htmldate_spark.plans.canonical import url_host

            edges = pages.select(
                url_host(F.col("url")).alias("src"),
                F.explode("outlinks").alias("out_url"),
            ).select(
                "src", url_host(F.col("out_url")).alias("dst")
            ).localCheckpoint(eager=True)
        return edges

    if args.pagerank_budgets or args.hits_budgets or args.trustrank_budgets:
        from go_htmldate_spark.plans.hostgraph import rank_to_budget

        edges = _host_edges()

    if args.pagerank_budgets:
        # link analysis → politeness: host-graph PageRank over the corpus
        # outlinks, log-mapped onto [lo, hi] fetches/round per host. The
        # rank table is one row per host — broadcast-size by construction
        # for the scheduler's own budget join.
        from go_htmldate_spark.plans.hostgraph import host_pagerank

        lo, hi = _lohi(args.pagerank_budgets)
        budgets = rank_to_budget(host_pagerank(edges), lo=lo, hi=hi)

    if args.hits_budgets:
        # discovery-side rank: HITS hubs over the same outlink host
        # graph, ≥1-clamped (no-out-link hosts have hub 0) through the
        # log-affine bridge, min-merged with whatever else is set.
        # scale=10**9 keeps host_hits' n·scale ≤ 2^62 long bound out to
        # ~4.6e9 hosts (the whole-web count) — ppb rank resolution, far
        # past what the log-affine budget map distinguishes anyway.
        from go_htmldate_spark.plans.hostgraph import host_hits

        lo, hi = _lohi(args.hits_budgets)
        hub_ranks = host_hits(edges, scale=10**9).select(
            "host", F.greatest(F.col("hub"), F.lit(1)).alias("rank")
        )
        budgets = merge_budgets(budgets, rank_to_budget(hub_ranks, lo=lo, hi=hi))

    if args.lang_budgets:
        # language-balanced allocation: majority language per host →
        # quota; same parse syntax as curate_job --sample
        from go_htmldate_spark.plans.hostgraph import host_lang_budgets

        quotas: dict[str, float] = {}
        lang_default = 1.0
        for part in args.lang_budgets.split(","):
            k, _, v = part.partition("=")
            if k.strip() == "*":
                lang_default = float(v)
            else:
                quotas[k.strip()] = float(v)
        budgets = merge_budgets(
            budgets,
            host_lang_budgets(pages, quotas, default=lang_default)
            .select("host", "politeness_budget"),
        )

    if args.trustrank_budgets:
        # spam demotion: teleport restricted to the vetted seed hosts,
        # ≥1-clamped (unreachable hosts have trust 0) through the log
        # bridge so farms land on the budget floor, then min-merged.
        # Same whole-web-safe scale: trust CONCENTRATES, so
        # host_trustrank requires the full n·scale mass to fit int64.
        if not args.trust_seeds:
            ap.error("--trustrank-budgets requires --trust-seeds")
        from go_htmldate_spark.plans.hostgraph import host_trustrank

        lo, hi = _lohi(args.trustrank_budgets)
        trust = host_trustrank(
            edges, spark.read.parquet(args.trust_seeds), scale=10**9
        ).select("host", F.greatest(F.col("trust"), F.lit(1)).alias("rank"))
        budgets = merge_budgets(budgets, rank_to_budget(trust, lo=lo, hi=hi))

    if args.demote_mirrors:
        from go_htmldate_spark.plans.canonical import url_host
        from go_htmldate_spark.plans.mirrors import (
            mirror_demotion,
            mirror_host_pairs,
        )

        obs = spark.read.parquet(args.demote_mirrors).select(
            url_host(F.col("url")).alias("host"), "content_sig"
        )
        budgets = merge_budgets(budgets, mirror_demotion(
            mirror_host_pairs(obs), threshold=args.mirror_threshold
        ))

    if args.demote_soft404:
        from go_htmldate_spark.plans.soft404 import (
            soft404_demotion,
            soft404_host_stats,
        )

        obs = spark.read.parquet(args.demote_soft404).select("url", "text")
        budgets = merge_budgets(budgets, soft404_demotion(
            soft404_host_stats(obs), threshold=args.soft404_threshold
        ))

    if args.demote_parked:
        from go_htmldate_spark.plans.parked import (
            parked_budget_demotion,
            parked_flags,
            parked_host_stats,
        )

        obs = spark.read.parquet(args.demote_parked)
        # tolerate corpora that archive html as binary
        html_c = (F.decode(F.col("html"), "UTF-8")
                  if dict(obs.dtypes).get("html") == "binary"
                  else F.col("html"))
        obs = obs.select("url", html_c.alias("html"), "text")
        budgets = merge_budgets(budgets, parked_budget_demotion(
            parked_host_stats(parked_flags(obs)),
            threshold=args.parked_threshold,
        ))

    if args.demote_typosquat:
        from go_htmldate_spark.plans.canonical import (
            canonicalize_url,
            url_host,
        )
        from go_htmldate_spark.plans.typosquat import (
            typosquat_demotion,
            typosquat_pairs,
        )

        brands = spark.createDataFrame(
            [(b.strip(),) for b in
             Path(args.demote_typosquat).read_text(encoding="utf-8")
             .splitlines() if b.strip()],
            "brand string",
        )
        hosts = pages.select(
            url_host(canonicalize_url(F.col("url"))).alias("host")
        ).distinct()
        budgets = merge_budgets(budgets, typosquat_demotion(
            typosquat_pairs(hosts, brands, max_dist=args.typosquat_dist)
        ))

    if args.demote_noindex:
        from go_htmldate_spark.plans.metarobots import (
            meta_robots_host_stats,
            noindex_host_demotion,
        )

        obs = spark.read.parquet(args.demote_noindex)
        html_c = (F.decode(F.col("html"), "UTF-8")
                  if dict(obs.dtypes).get("html") == "binary"
                  else F.col("html"))
        obs = obs.select("url", html_c.alias("html"))
        budgets = merge_budgets(budgets, noindex_host_demotion(
            meta_robots_host_stats(obs, agent=args.robots_agent),
            threshold=args.noindex_threshold,
        ))

    url_suppress = None
    if args.demote_deep_pages:
        from go_htmldate_spark.plans.pagination import (
            deep_page_demotion,
            pagination_chains,
            rel_next_edges,
        )

        obs = spark.read.parquet(args.demote_deep_pages)
        html_c = (F.decode(F.col("html"), "UTF-8")
                  if dict(obs.dtypes).get("html") == "binary"
                  else F.col("html"))
        obs = obs.select("url", html_c.alias("html"))
        url_suppress = deep_page_demotion(
            pagination_chains(rel_next_edges(obs)),
            max_page_idx=args.max_page_idx,
        ).select("url")

    if args.backoff_log:
        from go_htmldate_spark.plans.backoff import host_backoff
        from go_htmldate_spark.plans.scheduler import CrawlConfig as _CC

        # backoff must only ever LOWER a host's budget: base the decay
        # at the scheduler's default and keep only streak>0 rows, so a
        # healthy host keeps whatever budget its other sources gave it
        # (emitting base-budget rows for streak-0 hosts would RAISE
        # unlisted hosts above default_budget via the merge)
        decayed = host_backoff(
            spark.read.parquet(args.backoff_log),
            base_budget=_CC.default_budget,
        ).filter(F.col("streak") > 0)
        budgets = merge_budgets(budgets, decayed)

    if args.adaptive_delay_log:
        from go_htmldate_spark.plans.backoff import adaptive_delay
        from go_htmldate_spark.plans.scheduler import CrawlConfig as _CC2

        # latency-derived budgets only SLOW hosts: keep rows whose
        # implied fetches/round fall below the scheduler default (same
        # only-lower contract as --backoff-log)
        slowed = adaptive_delay(
            spark.read.parquet(args.adaptive_delay_log),
            delay_factor=args.delay_factor,
            max_delay_ms=args.max_delay_ms,
            round_seconds=args.round_seconds,
        ).select("host", "politeness_budget").filter(
            F.col("politeness_budget") < _CC2.default_budget
        )
        budgets = merge_budgets(budgets, slowed)

    opic_state = None
    opic_range = (1.0, 8.0)
    if args.opic_budgets:
        opic_range = _lohi(args.opic_budgets)
    if args.opic_budgets and not args.resume:
        # cold start only on a fresh crawl: resume() reloads the round
        # snapshot's swept state (or opic_init), so running the 3-sweep
        # batch here would be discarded work on every resume
        from go_htmldate_spark.plans.opic import opic_run

        o_edges = _host_edges()
        o_hosts = o_edges.select(F.col("src").alias("host")).unionByName(
            o_edges.select(F.col("dst").alias("host"))
        )
        opic_state = opic_run(o_hosts, o_edges, sweeps=3)

    dust = None
    if args.dust_history:
        from go_htmldate_spark.plans.dust import dust_rules

        dust = dust_rules(spark.read.parquet(args.dust_history))

    blocklist = None
    if args.blocklist:
        if args.blocklist.endswith(".csv"):
            # a real CSV (header, possibly extra columns): take the
            # domain column — raw read.text would turn
            # 'badsite.example,adult' lines into garbage domains that
            # silently never block
            blocklist = spark.read.csv(
                args.blocklist, header=True
            ).select("domain")
        elif args.blocklist.endswith(".txt"):
            blocklist = spark.read.text(args.blocklist).select(
                F.col("value").alias("domain")
            )
        else:
            blocklist = spark.read.parquet(args.blocklist)

    os.makedirs(args.state, exist_ok=True)
    redirects = None
    if (args.redirects or args.canonical_links or args.refresh_redirects
            or args.collapse_aliases):
        from go_htmldate_spark.plans.canonical import canonicalize_url
        from go_htmldate_spark.plans.redirects import resolve_redirects

        edges = None
        if args.redirects:
            edges = spark.read.parquet(args.redirects).select(
                "src_url", "dst_url"
            )
        if args.canonical_links:
            from go_htmldate_spark.plans.rel_canonical import (
                rel_canonical_edges,
            )

            canon = rel_canonical_edges(pages)
            edges = canon if edges is None else edges.unionByName(canon)
        if args.collapse_aliases:
            from go_htmldate_spark.plans.aliases import alias_redirect_edges

            alias = alias_redirect_edges(pages)
            edges = alias if edges is None else edges.unionByName(alias)
        elif args.refresh_redirects:
            from go_htmldate_spark.plans.aliases import meta_refresh_edges

            refresh = meta_refresh_edges(pages).select("src_url", "dst_url")
            edges = refresh if edges is None else edges.unionByName(refresh)
        # the scheduler applies resolved edges to CANONICALIZED
        # discovered URLs, so both endpoints must be canonicalized too
        # (raw-spelling src keys would never match; raw dst targets
        # would enter the frontier under a second hash). Edges that
        # collapse to self after canonicalization are spelling-only
        # aliases already handled by canonicalize_url — drop them so
        # they don't register as 1-cycles and kill the URL.
        edges = edges.select(
            canonicalize_url(F.col("src_url")).alias("src_url"),
            canonicalize_url(F.col("dst_url")).alias("dst_url"),
        ).filter(F.col("src_url") != F.col("dst_url"))
        redirects = resolve_redirects(edges)

    yield_table = None
    if args.yield_log:
        from go_htmldate_spark.plans.yield_prior import pattern_yield

        ylog = spark.read.parquet(args.yield_log)
        dated_c = (
            F.col("dated") if "dated" in ylog.columns
            else (F.col("date").isNotNull() & (F.col("date") != ""))
        )
        yield_table = pattern_yield(
            ylog.select("url", dated_c.alias("dated"))
        )

    sched = CrawlScheduler(
        spark, pages, robots=robots, host_budget=budgets,
        state_dir=args.state,
        config=CrawlConfig(
            trap_guard=args.trap_guard, ip_budget=args.ip_budget,
            respect_nofollow=args.respect_nofollow,
            robots_agent=args.robots_agent,
            site_budget=args.site_budget,
            psl_rules=tuple(
                Path(args.psl).read_text(encoding="utf-8").splitlines()
            ) if args.psl else (),
            aging=args.aging,
            opic_lo=opic_range[0], opic_hi=opic_range[1],
        ),
        blocklist=blocklist, redirects=redirects, dust=dust,
        host_ip=(
            spark.read.parquet(args.host_ip) if args.host_ip else None
        ),
        opic_state=opic_state,
        yield_table=yield_table,
        url_suppress=url_suppress,
    )

    if args.resume:
        next_round = sched.resume()
        print(f"resumed at round {next_round}")
    else:
        if args.seeds:
            seeds = spark.read.parquet(args.seeds)
        elif args.recrawl_history:
            from go_htmldate_spark.plans.recrawl import (
                change_rate,
                recrawl_priority,
            )

            # cache: the window+groupBy over the full history is the
            # seeding path's heaviest job, and it feeds BOTH the
            # data-derived as_of aggregate and the priority projection
            rates = change_rate(
                spark.read.parquet(args.recrawl_history)
            ).cache()
            as_of = args.recrawl_as_of
            if as_of is None:
                # data-derived "now": deterministic for a given history
                as_of = rates.agg(F.max("last_fetch_ts")).first()[0] or 0.0
            seeds = recrawl_priority(rates, as_of_ts=float(as_of))
        elif args.sitemaps or args.feeds:
            seeds = None
            if args.sitemaps:
                from go_htmldate_spark.sources.sitemaps import (
                    seeds_from_robots,
                    sitemap_seeds,
                )

                bodies = spark.read.parquet(args.sitemaps)
                if args.sitemaps_from_robots:
                    robots_bodies = spark.read.parquet(args.sitemaps_from_robots)
                    seeds = seeds_from_robots(robots_bodies, bodies).select(
                        "url", "priority"
                    )
                else:
                    seeds = sitemap_seeds(bodies).select("url", "priority")
            if args.feeds:
                from go_htmldate_spark.sources.feeds import feed_seeds

                fs = feed_seeds(spark.read.parquet(args.feeds)).select(
                    "url", "priority"
                )
                # both channels advertise overlapping URLs; keep each
                # url once at its best (max) priority
                seeds = fs if seeds is None else seeds.unionByName(fs)
            seeds = seeds.groupBy("url").agg(
                F.max("priority").alias("priority")
            )
        else:
            # hash order disperses seeds across hosts — alphabetical order
            # would cluster them onto a couple of hosts and politeness
            # budgets would throttle round 0 to a handful of fetches
            seeds = (
                pages.select("url").orderBy(F.xxhash64("url")).limit(args.n_seeds)
                .withColumn("priority", F.lit(1.0))
            )
        sched.init_from_seeds(seeds)

    manifests = sched.run(args.rounds)
    for m in manifests:
        print(json.dumps(m))
    if args.expire_keep > 0:
        from go_htmldate_spark.plans.scheduler import expire_snapshots

        print(json.dumps(expire_snapshots(args.state, args.expire_keep)))
    spark.stop()


if __name__ == "__main__":
    main()
