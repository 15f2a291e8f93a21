"""CLI wiring of the spark-submit job entrypoints, run in-process
against the shared test session (the deployment *shape* — zip-only
package resolution — is gated separately by test_spark_submit_job; here
we pin that the flag plumbing composes the right operators: sitemap
seeds feed the frontier, PageRank-derived budgets reach the scheduler's
politeness join)."""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load_job(name: str):
    spec = importlib.util.spec_from_file_location(name, REPO / "jobs" / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_crawl_job_sitemap_seeds_and_pagerank_budgets(
    spark, tmp_path_factory, monkeypatch, capsys
):
    """--sitemaps drives seeding (urlset locs become round-0 frontier,
    prioritized by lastmod recency) and --pagerank-budgets derives the
    per-host politeness table from the corpus link graph, min-merged
    with --hits-budgets hub-rank discovery budgets and
    --trustrank-budgets seed-teleport trust budgets — exercised
    through the real argv surface."""
    import go_htmldate_spark.session as sess
    from go_htmldate_spark.sources.pages import synth_pages

    base = tmp_path_factory.mktemp("crawl_cli")

    # sitemap bodies whose <loc>s are REAL corpus URLs (same synth
    # parameters the job uses for --synth 600), so fetched rounds
    # discover onward links and round 2 has work to schedule
    urls = [
        r["url"]
        for r in synth_pages(spark, 600, seed=42).select("url").limit(12).collect()
    ]
    xml = "<urlset>" + "".join(
        f"<url><loc>{u}</loc><lastmod>2023-0{1 + i % 9}-11</lastmod></url>"
        for i, u in enumerate(urls)
    ) + "</urlset>"
    sitemap_dir = str(base / "sitemaps")
    spark.createDataFrame(
        [("https://seeds.example/sitemap.xml", xml)], "sitemap_url string, xml string"
    ).write.parquet(sitemap_dir)

    # the job must run on the shared session and must not tear it down
    monkeypatch.setattr(sess, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(type(spark), "stop", lambda self: None)

    from pyspark.sql import functions as F

    from go_htmldate_spark.plans.canonical import url_host as _uh
    seeds_dir = str(base / "trust_seeds")
    synth_pages(spark, 600, seed=42).select(
        _uh(F.col("url")).alias("host")
    ).distinct().limit(3).write.parquet(seeds_dir)

    job = _load_job("crawl_job")
    monkeypatch.setattr(sys, "argv", [
        "crawl_job.py",
        "--synth", "600",
        "--state", str(base / "state"),
        "--rounds", "2",
        "--sitemaps", sitemap_dir,
        "--pagerank-budgets", "1.0,4.0",
        "--hits-budgets", "1.0,6.0",
        "--trustrank-budgets", "1.0,5.0",
        "--trust-seeds", seeds_dir,
        "--lang-budgets", "en=6,de=3,*=1",
    ])
    job.main()

    out = capsys.readouterr().out
    manifests = [json.loads(l) for l in out.splitlines()
                 if l.startswith("{") and "n_scheduled" in l]
    assert len(manifests) == 2
    assert all(m["n_scheduled"] > 0 for m in manifests)
    # round 1 fetched real pages (sitemap locs exist in the corpus) and
    # discovery produced new frontier URLs for round 2
    assert manifests[0]["n_fetched"] > 0
    assert manifests[1]["n_scheduled"] > 0
    assert (base / "state").iterdir(), "no snapshot state written"

def test_crawl_job_recrawl_history_seeds(
    spark, tmp_path_factory, monkeypatch, capsys
):
    """--recrawl-history turns fetch history into the seed list via the
    Cho-Garcia-Molina change-rate priorities: multi-fetch URLs with
    observed changes are re-seeded, single-fetch URLs (no interval)
    are not — pinned through the real argv surface."""
    import go_htmldate_spark.session as sess
    from go_htmldate_spark.plans.canonical import url_host
    from go_htmldate_spark.sources.pages import synth_pages
    from pyspark.sql import functions as F

    base = tmp_path_factory.mktemp("recrawl_cli")

    # 4 corpus URLs on distinct hosts get a 3-fetch changing history
    # (re-seeded); 3 more get a single fetch (dropped: no interval)
    corpus = synth_pages(spark, 600, seed=42)
    hosts = corpus.select(
        url_host(F.col("url")).alias("h"), "url"
    ).dropDuplicates(["h"]).limit(7).collect()
    assert len(hosts) == 7
    day = 86400.0
    rows = []
    for i, r in enumerate(hosts[:4]):
        for j in range(3):
            rows.append((r["url"], float(j) * day, f"sig{i}-{j}"))
    for r in hosts[4:]:
        rows.append((r["url"], 0.0, "only-once"))
    hist_dir = str(base / "history")
    spark.createDataFrame(
        rows, "url string, fetch_ts double, content_sig string"
    ).write.parquet(hist_dir)

    monkeypatch.setattr(sess, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(type(spark), "stop", lambda self: None)

    job = _load_job("crawl_job")
    monkeypatch.setattr(sys, "argv", [
        "crawl_job.py",
        "--synth", "600",
        "--state", str(base / "state"),
        "--rounds", "1",
        "--recrawl-history", hist_dir,
        "--recrawl-as-of", str(9 * day),
        # plumbing coverage: DUST mining + mirror demotion over the
        # same history (per-fetch sigs are unique there, so both are
        # provably no-ops — the flags must not disturb the frontier)
        "--dust-history", hist_dir,
        "--demote-mirrors", hist_dir,
    ])
    job.main()

    out = capsys.readouterr().out
    manifests = [json.loads(l) for l in out.splitlines()
                 if l.startswith("{") and "n_scheduled" in l]
    assert len(manifests) == 1
    # exactly the 4 changing multi-fetch URLs seed the refetch round
    # (distinct hosts, budget 2/host — politeness never binds)
    assert manifests[0]["n_scheduled"] == 4
    assert manifests[0]["n_fetched"] == 4

def test_crawl_job_composed_crawl_waste_flags(
    spark, tmp_path_factory, monkeypatch, capsys
):
    """All crawl-waste features composed in ONE job run: recrawl
    seeding, DUST mining, mirror demotion, per-IP politeness, trap
    guard, and snapshot expiry. One fetch-history parquet plants every
    structure; assertions check each gate's observable effect on the
    round-0 fetch set and the post-run state layout."""
    import go_htmldate_spark.session as sess
    from go_htmldate_spark.plans.canonical import url_host
    from go_htmldate_spark.sources.pages import synth_pages
    from pyspark.sql import functions as F

    base = tmp_path_factory.mktemp("composed_cli")
    corpus = synth_pages(spark, 600, seed=42)
    by_host = {}
    for r in corpus.select(
        url_host(F.col("url")).alias("h"), "url"
    ).orderBy("url").collect():
        by_host.setdefault(r["h"], []).append(r["url"])
    hosts = sorted(h for h, us in by_host.items() if len(us) >= 5)[:7]
    assert len(hosts) == 7
    day = 86400.0

    rows = []
    # recrawl plant: hosts[0..5] each get one 3-fetch changing URL
    # (re-seeded); hosts[6] single fetch (dropped)
    for i, h in enumerate(hosts[:6]):
        for j in range(3):
            rows.append((by_host[h][0], j * day, f"chg{i}-{j}"))
    rows.append((by_host[hosts[6]][0], 0.0, "once"))
    # mirror plant: hosts[4] and hosts[5] share 3 fingerprints across
    # DISTINCT paths (no common dust middles -> no support-2 rules)
    for i in range(1, 4):
        rows.append((by_host[hosts[4]][i], 0.0, f"mir{i}"))
        rows.append((by_host[hosts[5]][i], 0.0, f"mir{i}"))
    # dust plant: two alias groups on hosts[0]
    for i in (1, 2):
        u = by_host[hosts[0]][i + 2]
        rows.append((u, 0.0, f"alias{i}"))
        rows.append((u + "?sess=x", 0.0, f"alias{i}"))
    hist_dir = str(base / "history")
    spark.createDataFrame(
        rows, "url string, fetch_ts double, content_sig string"
    ).write.parquet(hist_dir)

    # per-IP plant: hosts[0] and hosts[1] share one server
    ip_dir = str(base / "hostip")
    spark.createDataFrame(
        [(hosts[0], "10.1.1.1"), (hosts[1], "10.1.1.1")],
        "host string, ip string",
    ).write.parquet(ip_dir)

    # soft-404 plant: hosts[2] serves an error template as 200 on 24
    # observed pages (>= min_pages 20, rate 1.0) -> demoted to 0-fetch
    s404_dir = str(base / "soft404pages")
    spark.createDataFrame(
        [(f"https://{hosts[2]}/dead/{i}",
          "Error 404 - Page Not Found. Sorry.") for i in range(24)],
        "url string, text string",
    ).write.parquet(s404_dir)

    # parked plant: hosts[3] serves registrar landers on 4 observed
    # pages (>= min_pages 3, rate 1.0) -> demoted to 0-fetch
    parked_dir = str(base / "parkedpages")
    spark.createDataFrame(
        [(f"https://{hosts[3]}/x/{i}",
          "<html><body>This domain is for sale.</body></html>",
          "This domain is for sale.") for i in range(4)],
        "url string, html string, text string",
    ).write.parquet(parked_dir)

    monkeypatch.setattr(sess, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    job = _load_job("crawl_job")
    monkeypatch.setattr(sys, "argv", [
        "crawl_job.py",
        "--synth", "600",
        "--state", str(base / "state"),
        "--rounds", "2",
        "--recrawl-history", hist_dir,
        "--recrawl-as-of", str(9 * day),
        "--dust-history", hist_dir,
        "--demote-mirrors", hist_dir,
        "--mirror-threshold", "0.3",
        "--host-ip", ip_dir,
        "--ip-budget", "1",
        "--trap-guard",
        "--demote-soft404", s404_dir,
        "--demote-parked", parked_dir,
        "--expire-keep", "1",
    ])
    job.main()

    out = capsys.readouterr().out
    manifests = [json.loads(l) for l in out.splitlines()
                 if l.startswith("{") and "n_scheduled" in l]
    assert len(manifests) == 2 and all(m["n_scheduled"] > 0 for m in manifests)

    # round_0's snapshot was expired (keep 1) so its gate effects are
    # read from the manifest counts: recrawl seeded 6 URLs; the demoted
    # mirror host, the soft-404 farm and the parked registrar lander
    # each lost their slot at the budget join and the shared-IP pair
    # kept only one of two -> exactly 2 scheduled and fetched
    assert manifests[0]["n_scheduled"] == 2
    assert manifests[0]["n_fetched"] == 2

    # expiry kept exactly the newest round resumable
    exp = [json.loads(l) for l in out.splitlines()
           if l.startswith("{") and "kept_rounds" in l]
    assert len(exp) == 1 and exp[0]["kept_rounds"] == [1]
    state = base / "state"
    assert not (state / "round_0" / "manifest.json").exists()
    assert (state / "round_1" / "manifest.json").exists()
    # the kept round's fetched table is intact and discovery kept the
    # crawl alive through every gate
    fetched_r1 = spark.read.parquet(str(state / "round_1" / "fetched"))
    assert fetched_r1.count() == manifests[1]["n_fetched"] > 0


def test_crawl_job_feed_seeds_merge_with_sitemaps(
    spark, tmp_path_factory, monkeypatch, capsys
):
    """--feeds seeds the frontier from RSS/Atom entries; given with
    --sitemaps the two channels merge one-row-per-url at max priority,
    exercised through the real argv surface."""
    import go_htmldate_spark.session as sess
    from go_htmldate_spark.sources.pages import synth_pages

    base = tmp_path_factory.mktemp("crawl_cli_feeds")
    urls = [
        r["url"]
        for r in synth_pages(spark, 600, seed=42).select("url").limit(12).collect()
    ]
    # sitemaps advertise the first 8 (stale lastmod), feeds advertise
    # urls 4..11 (fresh pubDate) — overlap 4..7 must surface once
    sm = "<urlset>" + "".join(
        f"<url><loc>{u}</loc><lastmod>2020-01-11</lastmod></url>"
        for u in urls[:8]
    ) + "</urlset>"
    rss = "<rss><channel>" + "".join(
        f"<item><link>{u}</link>"
        "<pubDate>Tue, 05 Mar 2024 10:30:00 GMT</pubDate></item>"
        for u in urls[4:]
    ) + "</channel></rss>"
    sm_dir, feed_dir = str(base / "sm"), str(base / "feeds")
    spark.createDataFrame(
        [("https://seeds.example/sitemap.xml", sm)],
        "sitemap_url string, xml string",
    ).write.parquet(sm_dir)
    spark.createDataFrame(
        [("https://seeds.example/feed.xml", rss)],
        "feed_url string, xml string",
    ).write.parquet(feed_dir)

    monkeypatch.setattr(sess, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    job = _load_job("crawl_job")
    monkeypatch.setattr(sys, "argv", [
        "crawl_job.py",
        "--synth", "600",
        "--state", str(base / "state"),
        "--rounds", "1",
        "--sitemaps", sm_dir,
        "--feeds", feed_dir,
    ])
    job.main()
    out = capsys.readouterr().out
    manifests = [json.loads(l) for l in out.splitlines()
                 if l.startswith("{") and "n_scheduled" in l]
    assert len(manifests) == 1 and manifests[0]["n_fetched"] > 0
    # merged seed table is one-row-per-url: round 0 schedules from the
    # 12-url union, never more (the 4-url overlap collapsed)
    assert manifests[0]["n_scheduled"] <= len(set(urls))
    assert (base / "state" / "round_0" / "frontier").exists()


def test_curate_job_wet_output(spark, tmp_path_factory, monkeypatch, capsys):
    """--wet-output exports the curated corpus as re-readable WET
    conversion shards whose text matches the curated parquet."""
    import go_htmldate_spark.session as sess

    from pyspark.sql import functions as F

    base = tmp_path_factory.mktemp("curate_wet")
    monkeypatch.setattr(sess, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    # pages with C4-passing prose (synth pages fail the quality gates)
    pages_dir = str(base / "pages")
    spark.createDataFrame(
        [(f"https://curate.example/post/{i}",
          f"2024-01-01T00:00:{i % 60:02d}",
          (f'<html><head><meta property="article:published_time" '
           f'content="2021-06-{1 + i % 28:02d}"></head><body>'
           f"<p>the quick brown fox number {i} jumps over the lazy dog "
           f"and the weather is nice today in the small town.</p>"
           f"</body></html>").encode())
         for i in range(40)],
        "url string, warc_ts string, html binary",
    ).withColumn(
        "warc_ts", F.to_timestamp("warc_ts", "yyyy-MM-dd'T'HH:mm:ss")
    ).write.parquet(pages_dir)

    job = _load_job("curate_job")
    out_dir, wet_dir = str(base / "out"), str(base / "wet")
    monkeypatch.setattr(sys, "argv", [
        "curate_job.py",
        "--pages", pages_dir,
        "--output", out_dir,
        "--wet-output", wet_dir,
        "--wet-shards", "3",
    ])
    job.main()
    stats = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert stats["curated_docs"] > 0 and stats["wet_output"] == wet_dir

    from go_htmldate_spark.sources.warc import read_warc, wet_to_docs

    back = wet_to_docs(
        read_warc(spark, f"{wet_dir}/*.warc.wet.gz",
                  warc_types=("conversion",))
    )
    curated = spark.read.parquet(out_dir)
    assert back.count() == stats["curated_docs"]
    # text roundtrips byte-identically
    diff = back.select("url", "text").exceptAll(
        curated.select("url", "text")
    )
    assert diff.count() == 0


def test_curate_job_quality_cap_yearmix(spark, tmp_path_factory, monkeypatch,
                                        capsys):
    """--quality-threshold / --host-cap / --year-mix compose in the
    curation job: the linear classifier gates docs, each host keeps at
    most CAP docs, and the output's publication years follow the
    requested mix (non-target years dropped)."""
    import go_htmldate_spark.session as sess

    from pyspark.sql import functions as F

    base = tmp_path_factory.mktemp("curate_qcy")
    monkeypatch.setattr(sess, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    pages_dir = str(base / "pages")
    # 60 pages across 4 hosts; years 2020 (i%3==0), 2021 (else)
    spark.createDataFrame(
        [(f"https://h{i % 4}.example/post/{i}",
          f"2024-01-01T00:00:{i % 60:02d}",
          (f'<html><head><meta property="article:published_time" '
           f'content="{2020 + (0 if i % 3 == 0 else 1)}-06-'
           f'{1 + i % 28:02d}"></head><body>'
           f"<p>the quick brown fox number {i} jumps over the lazy dog "
           f"and the weather is nice today in the small town.</p>"
           f"</body></html>").encode())
         for i in range(60)],
        "url string, warc_ts string, html binary",
    ).withColumn(
        "warc_ts", F.to_timestamp("warc_ts", "yyyy-MM-dd'T'HH:mm:ss")
    ).write.parquet(pages_dir)

    job = _load_job("curate_job")
    out_dir = str(base / "out")
    monkeypatch.setattr(sys, "argv", [
        "curate_job.py",
        "--pages", pages_dir,
        "--output", out_dir,
        "--quality-threshold", "-1.0",  # keeps all (logit in [-1,1))
        "--host-cap", "8",
        "--year-mix", "2020=0.6,2021=0.4",
        "--seed", "3",
    ])
    job.main()
    stats = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert stats["curated_docs"] > 0
    out = spark.read.parquet(out_dir)
    per_host = [r["n"] for r in out.groupBy("host")
                .agg(F.count("*").alias("n")).collect()]
    assert per_host and all(n <= 8 for n in per_host)
    years = {r["y"] for r in out.select(
        F.substring("date", 1, 4).alias("y")).distinct().collect()}
    assert years <= {"2020", "2021"}
    assert out.count() == stats["curated_docs"]


def test_crawl_job_site_budget_cap(spark, tmp_path_factory,
                                   monkeypatch, capsys):
    """--site-budget groups politeness by registrable domain: every
    synth host is a shard of example.org ('org' is a public suffix),
    so the whole round-0 schedule collapses to the site cap, while the
    plain run schedules per-host."""
    import go_htmldate_spark.session as sess

    base = tmp_path_factory.mktemp("site_cli")
    monkeypatch.setattr(sess, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    job = _load_job("crawl_job")

    def run(state, extra):
        monkeypatch.setattr(sys, "argv", [
            "crawl_job.py", "--synth", "300",
            "--state", str(base / state), "--rounds", "1",
            "--n-seeds", "48",
        ] + extra)
        job.main()
        out = capsys.readouterr().out
        return [json.loads(l) for l in out.splitlines()
                if l.startswith("{") and "n_scheduled" in l][0]

    plain = run("plain", [])
    capped = run("capped", ["--site-budget", "3"])
    assert plain["n_scheduled"] > 3
    assert capped["n_scheduled"] == 3


def test_crawl_job_adaptive_delay_budgets(spark, tmp_path_factory,
                                          monkeypatch, capsys):
    """--adaptive-delay-log slows a latency-heavy host: its implied
    fetches/round budget (round_seconds / clamp(factor x last
    duration)) min-merges below the scheduler default, so round 0
    schedules fewer URLs from that host than a plain run would, while
    fast hosts are untouched (their rows are filtered, never raising
    anyone)."""
    import go_htmldate_spark.session as sess
    from go_htmldate_spark.plans.canonical import url_host
    from go_htmldate_spark.sources.pages import synth_pages
    from pyspark.sql import functions as F

    base = tmp_path_factory.mktemp("adaptive_cli")
    corpus = synth_pages(spark, 400, seed=42)
    hosts = sorted(
        r["h"] for r in corpus.select(url_host(F.col("url")).alias("h"))
        .groupBy("h").agg(F.count("*").alias("n"))
        .filter("n >= 4").collect()
    )[:2]
    slow, fast = hosts
    log_dir = str(base / "timedlog")
    spark.createDataFrame(
        [(slow, 1.0, 40000.0),   # 5x40s -> clamp 120s -> 0.5/round
         (slow, 2.0, 50000.0),
         (fast, 1.0, 10.0)],     # 5x10ms -> min 100ms -> 600/round
        "host string, fetch_ts double, duration_ms double",
    ).write.parquet(log_dir)

    monkeypatch.setattr(sess, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    job = _load_job("crawl_job")

    def run(state, extra):
        monkeypatch.setattr(sys, "argv", [
            "crawl_job.py", "--synth", "400",
            "--state", str(base / state), "--rounds", "1",
            "--n-seeds", "64",
        ] + extra)
        job.main()
        out = capsys.readouterr().out
        m = [json.loads(l) for l in out.splitlines()
             if l.startswith("{") and "n_scheduled" in l][0]
        fetched = spark.read.parquet(
            str(base / state / "round_0" / "fetched"))
        per_host = {r["h"]: r["n"] for r in fetched.select(
            url_host(F.col("url")).alias("h")).groupBy("h")
            .agg(F.count("*").alias("n")).collect()}
        return m, per_host

    _, plain = run("plain", [])
    _, slowed = run("slowed", ["--adaptive-delay-log", log_dir])
    # the slow host lost budget: 0.5/round floors to 0 scheduled
    assert plain.get(slow, 0) >= 1
    assert slowed.get(slow, 0) < plain[slow]
    # the fast host's 600/round row was filtered out, not merged up:
    # its schedule is unchanged from the plain run
    assert slowed.get(fast, 0) == plain.get(fast, 0)


def test_plan_job_water_fill_waves_and_audit(spark, tmp_path_factory,
                                             monkeypatch, capsys):
    """plan_job end-to-end: frontier → water-filled budgets → wave
    plan → fairness line, plus the politeness audit of a prior fetch
    log. Planted shape: 3 hosts with depths 10/6/2 and budget 9 →
    water level 3 with remainder to the deepest-demand... (progressive
    fill: alloc {4,3,2}); horizon 2 plans min(depth, alloc*2) URLs."""
    import go_htmldate_spark.session as sess

    base = tmp_path_factory.mktemp("plan_cli")
    rows = []
    for h, n in (("a", 10), ("b", 6), ("c", 2)):
        for i in range(n):
            rows.append((f"https://{h}.example/p/{i}", float(i % 7)))
    spark.createDataFrame(rows, "url string, priority double") \
        .write.parquet(str(base / "frontier"))
    spark.createDataFrame(
        [("a.example", 0.0), ("a.example", 1.0), ("a.example", 10.0)],
        "host string, fetch_ts double",
    ).write.parquet(str(base / "log"))
    spark.createDataFrame(
        [("a.example", 2.0)], "host string, crawl_delay double",
    ).write.parquet(str(base / "delays"))

    monkeypatch.setattr(sess, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    job = _load_job("plan_job")
    monkeypatch.setattr(sys, "argv", [
        "plan_job.py", "--frontier", str(base / "frontier"),
        "--output", str(base / "out"), "--total-budget", "9",
        "--horizon", "2",
        "--fetch-log", str(base / "log"), "--delays", str(base / "delays"),
    ])
    job.main()
    out = capsys.readouterr().out
    stages = {json.loads(l)["stage"]: json.loads(l)
              for l in out.splitlines() if l.startswith("{")}
    assert stages["budgets"]["total_alloc"] == 9
    # water fill of 9 over depths {a:10, b:6, c:2}: level 3, remainder
    # 1 -> first host above the level by host order (a) gets +1
    budgets = {r["host"]: r["politeness_budget"] for r in
               spark.read.parquet(str(base / "out" / "budgets")).collect()}
    assert budgets == {"a.example": 4, "b.example": 3, "c.example": 2}
    # horizon 2: a plans 8, b plans 6 (depth-limited), c plans 2
    waves = spark.read.parquet(str(base / "out" / "waves"))
    per_host = {r["host"]: r["n"] for r in
                waves.groupBy("host").count().withColumnRenamed(
                    "count", "n").collect()}
    assert per_host == {"a.example": 8, "b.example": 6, "c.example": 2}
    assert stages["waves"]["n_planned"] == 16
    # audit: gaps 1.0 and 9.0 against delay 2.0 -> one violation
    assert stages["audit"] == {"stage": "audit", "n_hosts": 1,
                               "n_violations": 1, "n_hosts_violating": 1}


def test_crawl_job_demote_typosquat(spark, tmp_path_factory,
                                    monkeypatch, capsys):
    """--demote-typosquat: every synth host registers as example.org,
    whose core 'example' is one edit from the protected brand core
    'examples' — the whole corpus demotes to a 0-fetch budget and
    round 0 schedules nothing, while the plain run schedules freely."""
    import go_htmldate_spark.session as sess

    base = tmp_path_factory.mktemp("typosquat_cli")
    bf = base / "brands.txt"
    bf.write_text("examples.com\n", encoding="utf-8")
    monkeypatch.setattr(sess, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    job = _load_job("crawl_job")

    def run(state, extra):
        monkeypatch.setattr(sys, "argv", [
            "crawl_job.py", "--synth", "200",
            "--state", str(base / state), "--rounds", "1",
            "--n-seeds", "24",
        ] + extra)
        job.main()
        out = capsys.readouterr().out
        return [json.loads(l) for l in out.splitlines()
                if l.startswith("{") and "n_scheduled" in l][0]

    plain = run("plain", [])
    squat = run("squat", ["--demote-typosquat", str(bf)])
    assert plain["n_scheduled"] > 0
    assert squat["n_scheduled"] == 0


def test_crawl_job_yield_log_reranks(spark, tmp_path_factory,
                                     monkeypatch, capsys):
    """--yield-log: a fetch history where /posts/ URLs never dated and
    date-path URLs always did re-ranks round 0 — the fetched set
    changes vs the plain run (same counts: the gate reorders the
    politeness race, it never filters)."""
    import go_htmldate_spark.session as sess
    from pyspark.sql import functions as F
    from go_htmldate_spark.sources.pages import synth_pages

    base = tmp_path_factory.mktemp("yield_cli")
    pages = synth_pages(spark, 200, seed=42)
    log = pages.select(
        "url", (~F.col("url").contains("/posts/")).alias("dated")
    )
    log_dir = base / "fetchlog"
    log.write.parquet(str(log_dir))

    monkeypatch.setattr(sess, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    job = _load_job("crawl_job")

    def run(state, extra):
        monkeypatch.setattr(sys, "argv", [
            "crawl_job.py", "--synth", "200",
            "--state", str(base / state), "--rounds", "1",
            "--n-seeds", "24",
        ] + extra)
        job.main()
        capsys.readouterr()
        return [r.url for r in spark.read.parquet(
            str(base / state / "round_0" / "fetched")
        ).orderBy(F.desc("priority"), F.asc("url")).collect()]

    plain = run("plain", [])
    gated = run("gated", ["--yield-log", str(log_dir)])
    assert plain and gated
    assert plain != gated


def test_crawl_job_deep_pages_and_nofollow(spark, tmp_path_factory,
                                           monkeypatch, capsys):
    """--demote-deep-pages + --respect-nofollow: rel=next chains
    assembled from an observed-pages dir suppress members past
    --max-page-idx from discovery, and a nofollow page's outlinks
    never enter the frontier — the plain run discovers all seven
    outlinks, the gated run exactly four."""
    import go_htmldate_spark.session as sess

    base = tmp_path_factory.mktemp("deep_cli")
    date_meta = ("<meta property='article:published_time' "
                 "content='2024-01-02'/>")
    ok = f"<html><head>{date_meta}</head><body>x</body></html>"
    nf = (f"<html><head>{date_meta}"
          "<meta name='robots' content='nofollow'>"
          "</head><body>x</body></html>")
    chain = [f"https://d.example.org/list?page={i}" for i in range(1, 6)]
    clean = "https://d.example.org/article"
    gated = "https://d.example.org/hidden"
    corpus = spark.createDataFrame(
        [
            ("https://d.example.org/start", ok, chain + [clean]),
            ("https://d.example.org/nfpage", nf, [gated]),
        ],
        "url string, html string, outlinks array<string>",
    )
    pages_dir = base / "pages"
    corpus.write.parquet(str(pages_dir))
    # observed pages declaring the chain: page i rel=next page i+1
    obs = spark.createDataFrame(
        [(chain[i],
          f'<html><head><link rel="next" href="{chain[i + 1]}">'
          "</head></html>")
         for i in range(len(chain) - 1)]
        + [(chain[-1], "<html><head></head></html>")],
        "url string, html string",
    )
    obs_dir = base / "obs"
    obs.write.parquet(str(obs_dir))

    monkeypatch.setattr(sess, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    job = _load_job("crawl_job")

    def run(state, extra):
        monkeypatch.setattr(sys, "argv", [
            "crawl_job.py", "--pages", str(pages_dir),
            "--state", str(base / state), "--rounds", "1",
            "--n-seeds", "4",
        ] + extra)
        job.main()
        out = capsys.readouterr().out
        return [json.loads(l) for l in out.splitlines()
                if l.startswith("{") and "n_frontier" in l][0]

    plain = run("plain", [])
    assert plain["n_frontier"] == 7
    gated_run = run("gated", [
        "--demote-deep-pages", str(obs_dir), "--max-page-idx", "3",
        "--respect-nofollow",
    ])
    # chain pages 4 and 5 suppressed, the nofollow page's link gone
    assert gated_run["n_frontier"] == 4


def test_crawl_job_refresh_redirects(spark, tmp_path_factory,
                                     monkeypatch, capsys):
    """--refresh-redirects: a discovered outlink whose page declares a
    meta-refresh collapses to the refresh target before entering the
    frontier; without the flag the shell URL enters as-is."""
    import go_htmldate_spark.session as sess

    base = tmp_path_factory.mktemp("refresh_cli")
    date_meta = ("<meta property='article:published_time' "
                 "content='2024-01-02'/>")
    ok = f"<html><head>{date_meta}</head><body>x</body></html>"
    shell = ("<html><head><meta http-equiv='refresh' "
             "content=\"0;url=https://r.example.org/target\">"
             "</head><body>moved</body></html>")
    corpus = spark.createDataFrame(
        [
            ("https://r.example.org/start", ok,
             ["https://r.example.org/shell"]),
            ("https://r.example.org/shell", shell, []),
            ("https://r.example.org/target", ok, []),
        ],
        "url string, html string, outlinks array<string>",
    )
    pages_dir = base / "pages"
    corpus.write.parquet(str(pages_dir))
    monkeypatch.setattr(sess, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    job = _load_job("crawl_job")

    def frontier(state, extra):
        monkeypatch.setattr(sys, "argv", [
            "crawl_job.py", "--pages", str(pages_dir),
            "--state", str(base / state), "--rounds", "1",
            "--n-seeds", "1",
        ] + extra)
        job.main()
        capsys.readouterr()
        import pyspark.sql.functions as F  # noqa: F401
        snap = spark.read.parquet(str(base / state / "round_0" / "frontier"))
        return {r["url"] for r in snap.select("url").collect()}

    plain = frontier("plain", [])
    assert "https://r.example.org/shell" in plain
    mined = frontier("mined", ["--refresh-redirects"])
    assert "https://r.example.org/target" in mined
    assert "https://r.example.org/shell" not in mined


def test_curate_job_noindex_and_hreflang(spark, tmp_path_factory,
                                         monkeypatch, capsys):
    """--respect-noindex + --hreflang-dedup: noindex pages never reach
    the curated corpus and declared translation clusters collapse to
    their representative before extraction."""
    import go_htmldate_spark.session as sess

    from pyspark.sql import functions as F

    base = tmp_path_factory.mktemp("curate_nih")
    monkeypatch.setattr(sess, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    body = ("<p>the quick brown fox jumps over the lazy dog and the "
            "weather is nice today in the small town square.</p>")
    date_meta = ('<meta property="article:published_time" '
                 'content="2023-06-02">')
    de, en = "https://de.example/a", "https://en.example/a"
    alts = (f'<link rel="alternate" hreflang="de" href="{de}">'
            f'<link rel="alternate" hreflang="en" href="{en}">'
            f'<link rel="alternate" hreflang="x-default" href="{en}">')
    rows = [
        ("https://plain.example/keep", ""),
        ("https://noidx.example/drop",
         '<meta name="robots" content="noindex">'),
        (de, alts), (en, alts),
    ]
    pages_dir = str(base / "pages")
    spark.createDataFrame(
        [(u, "2024-01-01T00:00:00",
          f"<html><head>{date_meta}{extra}</head><body>{body}</body>"
          "</html>".encode())
         for u, extra in rows],
        "url string, warc_ts string, html binary",
    ).withColumn(
        "warc_ts", F.to_timestamp("warc_ts", "yyyy-MM-dd'T'HH:mm:ss")
    ).write.parquet(pages_dir)

    job = _load_job("curate_job")
    out_dir = str(base / "out")
    monkeypatch.setattr(sys, "argv", [
        "curate_job.py", "--pages", pages_dir, "--output", out_dir,
        "--respect-noindex", "--hreflang-dedup",
    ])
    job.main()
    capsys.readouterr()
    kept = {r["url"] for r in
            spark.read.parquet(out_dir).select("url").collect()}
    assert kept == {"https://plain.example/keep", en}


def test_curate_job_visible_text_extractor(spark, tmp_path_factory,
                                           monkeypatch, capsys):
    """--text-extractor visible: inline script/style bodies never
    reach the curated text (the bare strip leaks them as words)."""
    import go_htmldate_spark.session as sess

    from pyspark.sql import functions as F

    base = tmp_path_factory.mktemp("curate_vt")
    monkeypatch.setattr(sess, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    date_meta = ('<meta property="article:published_time" '
                 'content="2023-06-02">')
    body = ("<p>the quick brown fox jumps over the lazy dog and the "
            "weather is nice today in the small town square.</p>")
    script = "<script>var leakedWordSentinel = 1;</script>"
    pages_dir = str(base / "pages")
    spark.createDataFrame(
        [(f"https://v{i}.example/a", "2024-01-01T00:00:00",
          f"<html><head>{date_meta}</head><body>{script}{body}</body>"
          "</html>".encode())
         for i in range(8)],
        "url string, warc_ts string, html binary",
    ).withColumn(
        "warc_ts", F.to_timestamp("warc_ts", "yyyy-MM-dd'T'HH:mm:ss")
    ).write.parquet(pages_dir)

    job = _load_job("curate_job")

    def run(name, extractor):
        out_dir = str(base / name)
        monkeypatch.setattr(sys, "argv", [
            "curate_job.py", "--pages", pages_dir, "--output", out_dir,
            "--text-extractor", extractor,
        ])
        job.main()
        capsys.readouterr()
        return " ".join(r["text"] for r in
                        spark.read.parquet(out_dir).select("text").collect())

    assert "leakedWordSentinel" in run("strip", "strip")
    visible = run("visible", "visible")
    assert visible and "leakedWordSentinel" not in visible


def test_crawl_job_derives_outlinks_for_warc_shaped_corpus(
        spark, tmp_path_factory, monkeypatch, capsys):
    """A corpus WITHOUT an outlinks column (the WARC shape:
    url/warc_ts/html) still drives discovery — the job derives edges
    from the pages' own anchors, relative hrefs resolved against each
    page's origin."""
    import go_htmldate_spark.session as sess

    base = tmp_path_factory.mktemp("derive_cli")
    date_meta = ("<meta property='article:published_time' "
                 "content='2024-01-02'/>")
    corpus = spark.createDataFrame(
        [
            ("https://w.example.org/start",
             f"<html><head>{date_meta}</head><body>"
             '<a href="/found">go</a></body></html>'.encode()),
            ("https://w.example.org/found",
             f"<html><head>{date_meta}</head><body>x</body>"
             "</html>".encode()),
        ],
        "url string, html binary",
    )
    pages_dir = base / "pages"
    corpus.write.parquet(str(pages_dir))
    seeds_dir = base / "seeds"
    spark.createDataFrame(
        [("https://w.example.org/start", 1.0)],
        "url string, priority double",
    ).write.parquet(str(seeds_dir))
    monkeypatch.setattr(sess, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    job = _load_job("crawl_job")
    monkeypatch.setattr(sys, "argv", [
        "crawl_job.py", "--pages", str(pages_dir),
        "--seeds", str(seeds_dir),
        "--state", str(base / "state"), "--rounds", "1",
    ])
    job.main()
    capsys.readouterr()
    snap = spark.read.parquet(str(base / "state" / "round_0" / "frontier"))
    assert "https://w.example.org/found" in {
        r["url"] for r in snap.select("url").collect()
    }


def test_crawl_job_collapse_aliases(spark, tmp_path_factory,
                                    monkeypatch, capsys):
    """--collapse-aliases: a discovered AMP-variant URL collapses into
    the canonical page that declared it — the variant never enters the
    frontier; without the flag it does."""
    import go_htmldate_spark.session as sess

    base = tmp_path_factory.mktemp("alias_cli")
    date_meta = ("<meta property='article:published_time' "
                 "content='2024-01-02'/>")
    amp = "https://c.example.org/art/amp"
    canon = "https://c.example.org/art"
    corpus = spark.createDataFrame(
        [
            ("https://c.example.org/start",
             f"<html><head>{date_meta}</head><body>x</body></html>",
             [amp]),
            (canon,
             f"<html><head>{date_meta}"
             f'<link rel="amphtml" href="{amp}">'
             "</head><body>x</body></html>", []),
            (amp,
             f"<html><head>{date_meta}</head><body>x</body></html>", []),
        ],
        "url string, html string, outlinks array<string>",
    )
    pages_dir = base / "pages"
    corpus.write.parquet(str(pages_dir))
    seeds_dir = base / "seeds"
    spark.createDataFrame(
        [("https://c.example.org/start", 1.0)],
        "url string, priority double",
    ).write.parquet(str(seeds_dir))
    monkeypatch.setattr(sess, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    job = _load_job("crawl_job")

    def frontier(state, extra):
        monkeypatch.setattr(sys, "argv", [
            "crawl_job.py", "--pages", str(pages_dir),
            "--seeds", str(seeds_dir),
            "--state", str(base / state), "--rounds", "1",
        ] + extra)
        job.main()
        capsys.readouterr()
        snap = spark.read.parquet(str(base / state / "round_0" / "frontier"))
        return {r["url"] for r in snap.select("url").collect()}

    plain = frontier("plain", [])
    assert amp in plain
    collapsed = frontier("collapsed", ["--collapse-aliases"])
    assert amp not in collapsed
    assert canon in collapsed


def test_curate_job_blockwords(spark, tmp_path_factory, monkeypatch,
                               capsys):
    """--blockwords: documents containing a listed token never reach
    the curated output."""
    import go_htmldate_spark.session as sess

    from pyspark.sql import functions as F

    base = tmp_path_factory.mktemp("curate_bw")
    monkeypatch.setattr(sess, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    date_meta = ('<meta property="article:published_time" '
                 'content="2023-06-02">')
    body = ("the quick brown fox jumps over the lazy dog and the "
            "weather is nice today in the small town square.")
    rows = [
        ("https://bw.example/keep", body),
        ("https://bw.example/drop", body + " zzqx tail words here."),
    ]
    pages_dir = str(base / "pages")
    spark.createDataFrame(
        [(u, "2024-01-01T00:00:00",
          f"<html><head>{date_meta}</head><body><p>{t}</p></body>"
          "</html>".encode())
         for u, t in rows],
        "url string, warc_ts string, html binary",
    ).withColumn(
        "warc_ts", F.to_timestamp("warc_ts", "yyyy-MM-dd'T'HH:mm:ss")
    ).write.parquet(pages_dir)
    bw = base / "words.txt"
    bw.write_text("zzqx\nqqzzv\n", encoding="utf-8")

    job = _load_job("curate_job")
    out_dir = str(base / "out")
    monkeypatch.setattr(sys, "argv", [
        "curate_job.py", "--pages", pages_dir, "--output", out_dir,
        "--blockwords", str(bw),
    ])
    job.main()
    capsys.readouterr()
    kept = {r["url"] for r in
            spark.read.parquet(out_dir).select("url").collect()}
    assert kept == {"https://bw.example/keep"}


def test_curate_job_gopher_rules(spark, tmp_path_factory, monkeypatch,
                                 capsys):
    """--gopher-rules: a bullet-list shell drops, prose survives."""
    import go_htmldate_spark.session as sess

    from pyspark.sql import functions as F

    base = tmp_path_factory.mktemp("curate_gr")
    monkeypatch.setattr(sess, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    date_meta = ('<meta property="article:published_time" '
                 'content="2023-06-02">')
    prose = ("the quick brown fox jumps over the lazy dog and we have "
             "plenty of fine weather to share with the town today.")
    bullets = "<br>".join("- the item of note here now" for _ in range(9))
    pages_dir = str(base / "pages")
    spark.createDataFrame(
        [("https://gr.example/keep", "2024-01-01T00:00:00",
          f"<html><head>{date_meta}</head><body><p>{prose}</p></body>"
          "</html>".encode()),
         ("https://gr.example/drop", "2024-01-01T00:00:00",
          f"<html><head>{date_meta}</head><body><p>{bullets}</p></body>"
          "</html>".encode())],
        "url string, warc_ts string, html binary",
    ).withColumn(
        "warc_ts", F.to_timestamp("warc_ts", "yyyy-MM-dd'T'HH:mm:ss")
    ).write.parquet(pages_dir)

    job = _load_job("curate_job")
    out_dir = str(base / "out")
    monkeypatch.setattr(sys, "argv", [
        "curate_job.py", "--pages", pages_dir, "--output", out_dir,
        "--gopher-rules", "--text-extractor", "visible",
    ])
    job.main()
    capsys.readouterr()
    kept = {r["url"] for r in
            spark.read.parquet(out_dir).select("url").collect()}
    assert kept == {"https://gr.example/keep"}


def test_crawl_job_demote_noindex(spark, tmp_path_factory, monkeypatch,
                                  capsys):
    """--demote-noindex: a host serving mostly noindex pages loses its
    fetch budget; the compliant host schedules normally."""
    import go_htmldate_spark.session as sess

    from pyspark.sql import functions as F

    base = tmp_path_factory.mktemp("noidx_cli")
    date_meta = ("<meta property='article:published_time' "
                 "content='2024-01-02'/>")
    ni = "<meta name='robots' content='noindex'>"

    def page(host, i, noindex):
        extra = ni if noindex else ""
        return (f"https://{host}/p/{i}",
                f"<html><head>{date_meta}{extra}</head><body>x</body>"
                "</html>", [])

    corpus = spark.createDataFrame(
        [page("w.example.org", i, True) for i in range(6)]
        + [page("c.example.org", i, False) for i in range(6)],
        "url string, html string, outlinks array<string>",
    )
    pages_dir = base / "pages"
    corpus.write.parquet(str(pages_dir))
    monkeypatch.setattr(sess, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    job = _load_job("crawl_job")

    def fetched(state, extra):
        monkeypatch.setattr(sys, "argv", [
            "crawl_job.py", "--pages", str(pages_dir),
            "--state", str(base / state), "--rounds", "1",
            "--n-seeds", "12",
        ] + extra)
        job.main()
        capsys.readouterr()
        snap = spark.read.parquet(str(base / state / "round_0" / "fetched"))
        return {r["url"] for r in snap.select("url").collect()}

    plain = fetched("plain", [])
    assert any("w.example.org" in u for u in plain)
    gated = fetched("gated", ["--demote-noindex", str(pages_dir)])
    assert not any("w.example.org" in u for u in gated)
    assert any("c.example.org" in u for u in gated)
