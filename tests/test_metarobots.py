"""Page-level robots directives (plans/metarobots): meta flag parsing,
nofollow-aware anchor extraction, and the noindex corpus gate.

Reference analog: none — go-htmldate has no crawl layer; the tag-soup
regexp discipline mirrors its meta scan (core.go examineMeta family).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from go_htmldate_spark.plans.metarobots import (
    extract_follow_anchors,
    meta_robots_flags,
    noindex_corpus_gate,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def _flags(spark, html):
    row = meta_robots_flags(
        _pages(spark, [("https://a.example/p", html)])
    ).head()
    return (row["noindex"], row["nofollow"], row["noarchive"])


def test_flag_parsing_variants(spark):
    # plain double-quoted, comma-separated
    assert _flags(
        spark, '<meta name="robots" content="noindex, nofollow">'
    ) == (True, True, False)
    # reversed attribute order, single quotes, self-closing
    assert _flags(
        spark, "<meta content='noarchive' name='robots'/>"
    ) == (False, False, True)
    # unquoted + uppercase; none == noindex+nofollow
    assert _flags(spark, "<META NAME=ROBOTS CONTENT=NONE>") == (
        True, True, False,
    )
    # explicit index,follow is not a restriction
    assert _flags(
        spark, '<meta name="robots" content="index, follow">'
    ) == (False, False, False)
    # no meta at all
    assert _flags(spark, "<html><body>x</body></html>") == (
        False, False, False,
    )


def test_multiple_metas_union_most_restrictive(spark):
    html = (
        '<meta name="robots" content="noindex"><p>body</p>'
        "<meta name='robots' content='nofollow'>"
    )
    assert _flags(spark, html) == (True, True, False)


def test_token_and_name_boundaries(spark):
    # name="robots-extra" is a different meta; noindexing substring
    # tokens must not match either
    assert _flags(
        spark, '<meta name="robots-extra" content="noindex">'
    ) == (False, False, False)
    assert _flags(
        spark, '<meta name="robots" content="noindexing">'
    ) == (False, False, False)
    # description metas whose content happens to say none don't count
    assert _flags(
        spark, '<meta name="description" content="none">'
    ) == (False, False, False)


def test_follow_anchors_page_and_anchor_level(spark):
    pages = _pages(spark, [
        # anchor-level nofollow on the second link only
        ("https://s.example/a",
         '<a href="https://t.example/1">One</a>'
         '<a rel="nofollow" href="https://t.example/2">Two</a>'),
        # page-level meta nofollow discounts every anchor
        ("https://s.example/b",
         '<meta name="robots" content="nofollow">'
         '<a href="https://t.example/3">Three</a>'),
        # multi-token rel counts; nofollownot does not; relative dropped
        ("https://s.example/c",
         "<a rel='nofollow noopener' href='https://t.example/4'>Four</a>"
         '<a rel="nofollownot" href="https://t.example/5">Five</a>'
         '<a href="/relative">skip</a>'),
    ])
    rows = {
        r["target_url"]: (r["src_host"], r["anchor"], r["followed"])
        for r in extract_follow_anchors(pages).collect()
    }
    assert rows == {
        "https://t.example/1": ("s.example", "one", True),
        "https://t.example/2": ("s.example", "two", False),
        "https://t.example/3": ("s.example", "three", False),
        "https://t.example/4": ("s.example", "four", False),
        "https://t.example/5": ("s.example", "five", True),
    }


def test_anchor_text_normalized(spark):
    pages = _pages(spark, [
        ("https://s.example/a",
         '<a href="https://t.example/1">  Read   MORE\n here </a>'),
    ])
    row = extract_follow_anchors(pages).head()
    assert row["anchor"] == "read more here"
    assert row["followed"]


def test_noindex_corpus_gate(spark):
    pages = _pages(spark, [
        ("https://a.example/keep", "<html><body>fine</body></html>"),
        ("https://a.example/drop1",
         '<meta name="robots" content="noindex">x'),
        ("https://a.example/drop2", "<META NAME=ROBOTS CONTENT=none>x"),
        ("https://a.example/keep2",
         '<meta name="robots" content="nofollow">x'),
    ]).withColumn("extra", F.length("html"))
    out = noindex_corpus_gate(pages)
    kept = sorted(r["url"] for r in out.collect())
    assert kept == ["https://a.example/keep", "https://a.example/keep2"]
    # original columns survive the gate
    assert set(out.columns) == {"url", "html", "extra"}


def test_meta_flags_plan_is_map_only(spark):
    """The 100 TB contract: the flags compute in the page's own row —
    no exchange, no Python eval anywhere in the plan."""
    pages = _pages(
        spark, [("https://a.example/p", '<meta name="robots" content="x">')]
    )
    plan = (
        meta_robots_flags(pages)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_rel_scan_ignores_anchor_text_and_title(spark):
    """The rel= scan must cover the OPENING TAG only: 'rel=nofollow'
    appearing in the anchor's text (an SEO article) or inside another
    quoted attribute never flags the link."""
    pages = _pages(spark, [
        ("https://s.example/a",
         '<a href="https://t.example/1">how to use rel=nofollow</a>'
         '<a title="rel=nofollow explained" href="https://t.example/2">two</a>'
         '<a title="a>b" rel="nofollow" href="https://t.example/3">three</a>'),
    ])
    rows = {r["target_url"]: r["followed"]
            for r in extract_follow_anchors(pages).collect()}
    assert rows["https://t.example/1"] is True
    assert rows["https://t.example/2"] is True
    # quoted '>' inside an attr must not truncate the rel scan
    assert rows["https://t.example/3"] is False


def test_agent_named_meta_unions_with_generic(spark):
    """The Robots Meta Tag per-bot channel: with an agent configured,
    <meta name="<agent>"> directives union with the generic robots
    meta; other bots' metas never apply; without an agent only the
    generic meta counts."""
    from go_htmldate_spark.plans.metarobots import (
        page_nofollow,
        page_noindex,
    )

    rows = [
        # generic says nothing, our bot's meta says noindex
        ("https://a.example/1",
         '<meta name="mybot" content="noindex">'),
        # another bot's meta must not apply to us
        ("https://a.example/2",
         '<meta name="otherbot" content="noindex, nofollow">'),
        # union: generic noarchive + agent nofollow
        ("https://a.example/3",
         '<meta name="robots" content="noarchive">'
         "<meta name='MyBot' content='nofollow'>"),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    got = {
        r["url"]: (r["ni"], r["nf"])
        for r in df.select(
            "url",
            page_noindex(F.col("html"), "mybot").alias("ni"),
            page_nofollow(F.col("html"), "mybot").alias("nf"),
        ).collect()
    }
    assert got == {
        "https://a.example/1": (True, False),
        "https://a.example/2": (False, False),
        "https://a.example/3": (False, True),
    }
    # no agent configured: only the generic meta counts
    base = {
        r["url"]: r["ni"]
        for r in df.select(
            "url", page_noindex(F.col("html")).alias("ni")
        ).collect()
    }
    assert base == {
        "https://a.example/1": False,
        "https://a.example/2": False,
        "https://a.example/3": False,
    }


def test_noindex_gate_with_agent(spark):
    pages = _pages(spark, [
        ("https://a.example/drop", '<meta name="mybot" content="none">x'),
        ("https://a.example/keep", '<meta name="other" content="none">x'),
    ])
    kept = [r["url"] for r in noindex_corpus_gate(
        pages, agent="mybot"
    ).collect()]
    assert kept == ["https://a.example/keep"]


def test_derive_outlinks(spark):
    """Corpora without an outlinks column get one from their own
    anchors: relative hrefs resolve against the page origin, in-page
    duplicates collapse, the per-page cap holds, and respect_nofollow
    drops flagged anchors (and everything on page-nofollow pages)."""
    from go_htmldate_spark.plans.metarobots import derive_outlinks

    many = "".join(f'<a href="/p/{i}">l</a>' for i in range(10))
    pages = _pages(spark, [
        ("https://d.example/a",
         '<a href="https://x.example/abs">a</a>'
         "<a href='/rel'>r</a>"
         '<a href="//cdn.example/pr">p</a>'
         '<a href="/rel">dup</a>'
         '<a href="../dotted">skip</a>'
         '<a rel="nofollow" href="/paid">n</a>'),
        ("https://d.example/cap", many),
        ("https://d.example/nf",
         '<meta name="robots" content="nofollow">'
         '<a href="/gone">x</a>'),
    ])
    plain = {r["url"]: r["outlinks"]
             for r in derive_outlinks(pages, max_links=4).collect()}
    assert plain["https://d.example/a"] == [
        "https://x.example/abs", "https://d.example/rel",
        "https://cdn.example/pr", "https://d.example/paid",
    ]
    assert len(plain["https://d.example/cap"]) == 4
    assert plain["https://d.example/nf"] == ["https://d.example/gone"]
    strict = {r["url"]: r["outlinks"] for r in derive_outlinks(
        pages, max_links=4, respect_nofollow=True
    ).collect()}
    assert strict["https://d.example/a"] == [
        "https://x.example/abs", "https://d.example/rel",
        "https://cdn.example/pr",
    ]
    assert strict["https://d.example/nf"] == []
    # map-only plan
    plan = (derive_outlinks(pages)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_host_stats_and_noindex_demotion(spark):
    from go_htmldate_spark.plans.metarobots import (
        meta_robots_host_stats,
        noindex_host_demotion,
    )

    ni = '<meta name="robots" content="noindex">'
    rows = []
    # bad.example: 5/6 noindex; ok.example: 1/6; tiny.example: 2/2 but
    # under min_pages
    for i in range(6):
        rows.append((f"https://bad.example/{i}",
                     ni if i < 5 else "<html></html>"))
        rows.append((f"https://ok.example/{i}",
                     ni if i == 0 else "<html></html>"))
    rows += [(f"https://tiny.example/{i}", ni) for i in range(2)]
    stats = meta_robots_host_stats(_pages(spark, rows))
    by = {r["host"]: r for r in stats.collect()}
    assert by["bad.example"]["n_noindex"] == 5
    assert abs(by["bad.example"]["noindex_rate"] - 5 / 6) < 1e-6
    assert by["ok.example"]["n_noindex"] == 1
    demoted = {r["host"] for r in noindex_host_demotion(
        stats, threshold=0.8, min_pages=5
    ).collect()}
    assert demoted == {"bad.example"}
