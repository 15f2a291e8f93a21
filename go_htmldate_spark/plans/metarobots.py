"""Page-level robots directives: `<meta name="robots">` flags and
nofollow-aware link extraction.

robots.txt (sources/robots.py) is the HOST-level exclusion protocol;
pages carry their own layer: `<meta name="robots"
content="noindex, nofollow">` (and the per-anchor `rel="nofollow"`
microformat). A compliant pipeline must honor both — noindex pages
are fetchable but must not enter the index/training corpus, nofollow
pages contribute no outlinks to discovery, and nofollow ANCHORS must
not feed the link graph (they are the paid/UGC links PageRank-family
signals are required to ignore; every major engine discounts them,
which is exactly why plans/hostgraph.py's rank tables want the
filtered edge stream).

Reference analog: none — go-htmldate has no crawl layer; the meta
scan reuses the same tag-soup regexp discipline its kernel applies to
date metas (core.go examineMeta family), here as native Catalyst
expressions.

Spark-first shape: everything is MAP-ONLY — a tag-level
regexp_extract_all scan plus array HOFs inside one projection chain,
zero exchanges, zero Python, no DOM build (the rel_canonical.py
contract: discovery passes over 100 TB must be scan-speed). Directive
semantics follow the Robots Meta Tag spec: values are comma-separated
case-insensitive tokens, `none` ≡ noindex+nofollow, multiple robots
metas union their restrictions (most-restrictive-wins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_META_TAG_RX = r"(?i)<meta\s[^>]*>"
# name value must terminate right after 'robots' (quote/space/'>') so
# name="robots-extra" never matches — rel_canonical.py's boundary
# discipline.
_NAME_ROBOTS_RX = r"(?i)\bname\s*=\s*['\"]?robots(?:['\"]|[\s>])"
# quoted content: backreference-delimited (commas and spaces legal
# inside); unquoted content: one token, commas legal, stops at
# quote/space/'>'
_CONTENT_Q_RX = r"""(?i)\bcontent\s*=\s*(["'])((?:(?!\1)[^>])*)\1"""
_CONTENT_U_RX = r"""(?i)\bcontent\s*=\s*([^'" >]+)"""

# directive token inside the comma-joined union of all robots metas:
# token boundaries are start/end/comma/whitespace
def _has_token(joined: Column, token: str) -> Column:
    return joined.rlike(r"(?i)(?:^|[,\s])" + token + r"(?:[,\s]|$)")


def _name_rx(agent: str | None) -> str:
    """Meta-name matcher: the generic robots meta, plus the crawler's
    own named meta when an agent is configured (the Robots Meta Tag
    spec's per-bot channel — <meta name="googlebot"> restricts that
    bot in UNION with the generic meta; most-restrictive-wins falls
    out of the same concat)."""
    if agent is None:
        return _NAME_ROBOTS_RX
    import re as _re

    return (r"(?i)\bname\s*=\s*['\"]?(?:robots|"
            + _re.escape(agent.lower()) + r")(?:['\"]|[\s>])")


def robots_directives(html: Column, agent: str | None = None) -> Column:
    """The page's robots-meta directives as one comma-joined lowered
    string (empty when no robots meta): the shared scan every
    flag/gate in this module keys on. With `agent`, directives from
    <meta name="<agent>"> union in alongside the generic robots meta.
    Pure column algebra — stays in whole-stage codegen wherever it's
    placed."""
    h = html.cast("string")
    tags = F.regexp_extract_all(h, F.lit(_META_TAG_RX), F.lit(0))
    robots = F.filter(tags, lambda t: t.rlike(_name_rx(agent)))
    contents = F.transform(
        robots,
        lambda t: F.lower(
            F.coalesce(
                F.nullif(F.regexp_extract(t, _CONTENT_Q_RX, 2), F.lit("")),
                F.regexp_extract(t, _CONTENT_U_RX, 1),
            )
        ),
    )
    # cheap guard before the tag scan: a page whose bytes never spell
    # the meta NAME can't carry a robots meta, so the directives are
    # provably '' — one substring probe replaces the regexp_extract_all
    # + per-tag rlike chain on the (overwhelmingly common) plain page.
    # CaseWhen evaluates branches lazily, so the guarded branch truly
    # skips the scan (guide §4: cut per-row work before config).
    needles = F.instr(F.lower(h), "robots") > 0
    if agent is not None:
        needles = needles | (F.instr(F.lower(h), agent.lower()) > 0)
    return F.when(needles, F.concat_ws(",", contents)).otherwise(F.lit(""))


def page_nofollow(html: Column, agent: str | None = None) -> Column:
    """True when the page's own robots meta (generic, plus the
    agent-named meta when configured) says its links must not be
    followed (nofollow or none) — the discovery-side gate the
    scheduler applies under CrawlConfig.respect_nofollow."""
    joined = robots_directives(html, agent)
    return _has_token(joined, "nofollow") | _has_token(joined, "none")


def page_noindex(html: Column, agent: str | None = None) -> Column:
    """True when the page's own robots meta (generic, plus the
    agent-named meta when configured) says it must not be indexed
    (noindex or none)."""
    joined = robots_directives(html, agent)
    return _has_token(joined, "noindex") | _has_token(joined, "none")


def meta_robots_flags(
    pages: DataFrame, url_col: str = "url", html_col: str = "html",
    agent: str | None = None,
) -> DataFrame:
    """pages → (url, noindex, nofollow, noarchive): the page's own
    robots directives. Both attribute orders, any quote style/case,
    multiple robots metas union (most restrictive wins), `none`
    implies noindex+nofollow; pages with no robots meta (or an
    explicit index,follow) report all-false. Map-only."""
    casted = pages.select(
        F.col(url_col).alias("url"),
        F.col(html_col).cast("string").alias("_h"),
    )
    staged = casted.select(
        "url", robots_directives(F.col("_h"), agent).alias("_directives")
    )
    d = F.col("_directives")
    none_ = _has_token(d, "none")
    return staged.select(
        "url",
        (_has_token(d, "noindex") | none_).alias("noindex"),
        (_has_token(d, "nofollow") | none_).alias("nofollow"),
        _has_token(d, "noarchive").alias("noarchive"),
    )


def _anchor_rel_nofollow(tag: Column) -> Column:
    """True when one <a ...> tag carries rel=nofollow (token-exact:
    rel="nofollownot" and rel="not-nofollow" don't count; multi-token
    rel="nofollow noopener" does). The input is ANCHOR_RX group 0 —
    the whole `<a ...>text</a>` — so two containment traps apply:
    anchor TEXT like 'how to use rel=nofollow' and OTHER attributes'
    quoted values like title="rel=nofollow explained" must never flag
    the link. The opening tag is cut with ANCHOR_RX's own quote-aware
    attr salad (a bare '>' split would truncate at a quoted '>'),
    then its attributes are TOKENIZED left-to-right — a quoted value
    is consumed whole by its own name=value pair, so 'rel=' text
    inside one can never start a match — and only a pair actually
    NAMED rel is inspected."""
    open_tag = F.regexp_extract(
        tag, r"""(?is)^<a\s((?:[^>"']|"[^"]*"|'[^']*')*)""", 1
    )
    attr_rx = r"""(?i)\b([a-zA-Z_-]+)\s*=\s*("[^"]*"|'[^']*'|[^'"\s>]+)"""
    names = F.regexp_extract_all(open_tag, F.lit(attr_rx), F.lit(1))
    vals = F.regexp_extract_all(open_tag, F.lit(attr_rx), F.lit(2))
    rel_val = F.get(
        F.filter(
            F.arrays_zip(names.alias("n"), vals.alias("v")),
            lambda s: F.lower(s["n"]) == "rel",
        ),
        0,
    )["v"]
    unquoted = F.regexp_replace(rel_val, r"""^["']|["']$""", "")
    full = F.coalesce(
        unquoted.rlike(r"(?i)(?:^|\s)nofollow(?:\s|$)"), F.lit(False)
    )
    # cheap guard: an anchor that never spells 'nofollow' anywhere can't
    # token-match it — one substring probe short-circuits the quote-aware
    # attribute tokenization for the overwhelming majority of anchors
    # (CaseWhen branches evaluate lazily)
    return F.when(
        F.instr(F.lower(tag), "nofollow") > 0, full
    ).otherwise(F.lit(False))


def extract_follow_anchors(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """hostgraph.extract_anchors with robots semantics: (src_host,
    target_url, anchor, followed) — followed=false when the anchor
    carries rel=nofollow OR the page's robots meta says nofollow.
    Feed `.filter("followed")` to the rank/anchor-text layers; keeping
    the flag (rather than dropping rows) lets the same pass audit how
    much of a host's linking is discounted. Map-only: the anchor scan
    (three zipped regexp_extract_all passes over one read of the page
    bytes) and the meta scan run in the same projection."""
    from .canonical import url_host
    from .hostgraph import ANCHOR_RX

    casted = pages.select(
        F.col(url_col).alias("_url"),
        F.col(html_col).cast("string").alias("_h"),
    )
    h = F.col("_h")
    # ONE ANCHOR_RX pass over the page bytes (group 0); href and text
    # re-extract per tag from the short matched span — the document is
    # scanned once instead of three times, and group extraction runs on
    # ~60-char tags (guide §2.3: do the heavy scan once)
    full = F.regexp_extract_all(h, F.lit(ANCHOR_RX), F.lit(0))
    pairs = casted.select(
        url_host(F.col("_url")).alias("src_host"),
        page_nofollow(h).alias("_page_nf"),
        F.explode(full).alias("g"),
    )
    g = F.col("g")
    return pairs.select(
        "src_host",
        F.regexp_extract(g, ANCHOR_RX, 2).alias("target_url"),
        F.lower(
            F.trim(
                F.regexp_replace(
                    F.regexp_extract(g, ANCHOR_RX, 3), r"\s+", " "
                )
            )
        ).alias("anchor"),
        (
            ~F.col("_page_nf") & ~_anchor_rel_nofollow(g)
        ).alias("followed"),
    ).filter(F.col("target_url").rlike(r"^https?://"))


def noindex_corpus_gate(
    pages: DataFrame, url_col: str = "url", html_col: str = "html",
    agent: str | None = None,
) -> DataFrame:
    """Corpus-side compliance filter: drop noindex pages before
    curation/training export (the page said 'do not index me'; a
    training corpus is an index). Broadcast-free: the flags compute in
    the page's own row, so this is a map-only filter that preserves
    whatever partitioning the corpus has."""
    casted = pages.withColumn("_h", F.col(html_col).cast("string"))
    return casted.filter(~page_noindex(F.col("_h"), agent)).drop("_h")


def derive_outlinks(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    max_links: int = 256,
    respect_nofollow: bool = False,
    agent: str | None = None,
) -> DataFrame:
    """Add the scheduler's `outlinks` column to a corpus that lacks
    one (WARC-derived pages carry only url/warc_ts/html): per page,
    the distinct resolved anchor targets — absolute http(s) kept,
    protocol-relative and root-relative completed against the page's
    own origin (real-web links are mostly relative; dropping them
    would blind discovery) — capped at max_links so a link-farm page
    can't flood the frontier. With respect_nofollow, anchors carrying
    rel=nofollow (and every anchor of a page whose robots meta says
    nofollow) contribute nothing.

    Map-only: one ANCHOR_RX pass over the page bytes plus array HOFs
    in the page's own row — no explode, no exchange, the corpus
    partitioning rides untouched."""
    from .canonical import resolve_href, url_authority_of, url_scheme_of
    from .hostgraph import ANCHOR_RX

    h = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    u = F.col(url_col)
    scheme, host = url_scheme_of(u), url_authority_of(u)
    if respect_nofollow:
        full = F.regexp_extract_all(h, F.lit(ANCHOR_RX), F.lit(0))
        kept_tags = F.filter(full, lambda t: ~_anchor_rel_nofollow(t))
        hrefs = F.transform(
            kept_tags,
            lambda t: F.regexp_extract(t, ANCHOR_RX, 2),
        )
        hrefs = F.when(page_nofollow(h, agent), F.array()).otherwise(hrefs)
    else:
        hrefs = F.regexp_extract_all(h, F.lit(ANCHOR_RX), F.lit(2))
    resolved = F.transform(hrefs, lambda x: resolve_href(x, scheme, host))
    out = F.slice(
        F.array_distinct(F.filter(resolved, lambda x: x.isNotNull())),
        1, max_links,
    )
    return pages.withColumn("outlinks", out)


def meta_robots_host_stats(
    pages: DataFrame, url_col: str = "url", html_col: str = "html",
    agent: str | None = None,
) -> DataFrame:
    """Per-host robots-meta compliance roll-up: (host, n_pages,
    n_noindex, n_nofollow, noindex_rate) — the audit view of the
    page-level layer. A host marking most of its corpus noindex is
    wasted politeness: every fetch lands a page the index must drop.
    Map-only flags then ONE host-keyed exchange of counter columns;
    page bytes never shuffle."""
    from .canonical import url_host

    flags = pages.select(
        url_host(F.col(url_col)).alias("host"),
        page_noindex(F.col(html_col).cast("string"), agent)
        .alias("_ni"),
        page_nofollow(F.col(html_col).cast("string"), agent)
        .alias("_nf"),
    )
    return flags.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_pages"),
        F.sum(F.when(F.col("_ni"), 1).otherwise(0)).cast("long")
        .alias("n_noindex"),
        F.sum(F.when(F.col("_nf"), 1).otherwise(0)).cast("long")
        .alias("n_nofollow"),
    ).select(
        "host", "n_pages", "n_noindex", "n_nofollow",
        (F.round(F.col("n_noindex") / F.col("n_pages"), 6) + F.lit(0.0))
        .alias("noindex_rate"),
    )


def noindex_host_demotion(
    stats: DataFrame, threshold: float = 0.8, min_pages: int = 5
) -> DataFrame:
    """Hosts whose noindex rate reaches `threshold` over at least
    `min_pages` observed pages, in the scheduler's demotion currency
    (host, politeness_budget 0.0) — min-merged with the other budget
    sources like soft-404 / parked / mirror demotion."""
    return stats.filter(
        (F.col("n_pages") >= min_pages)
        & (F.col("noindex_rate") >= threshold)
    ).select("host", F.lit(0.0).alias("politeness_budget"))
