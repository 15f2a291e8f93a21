"""rel=canonical edge mining: the page's own alias declaration.

`<link rel="canonical" href="...">` is the canonicalization signal
site owners publish precisely so crawlers stop fetching duplicate
spellings (Google/Bing honor it; reference analog: the extraction
kernel itself reads the same element family for URL recovery,
core.go:69-79 canonical-link URL fallback). Mined as (src_url,
dst_url) edges, it feeds the SAME pointer-doubling resolution and
frontier collapse as HTTP redirects (plans/redirects.py) — canonical
chains (A declares B, B declares C) terminate, cycles drop.

Spark-first shape: a map-only native regexp scan over the raw page
bytes — zero exchanges, zero Python, no DOM build. That is deliberate:
edge DISCOVERY is a coarse fast path over 100 TB of html where a DOM
parse per page would cost more than the fetch savings; the per-row
extraction kernel stays the authority for per-document semantics.
Attribute order (rel-first / href-first), quote style, and case all
match; href resolution covers the absolute, protocol-relative, and
root-relative forms and deliberately skips dotted-relative hrefs (a
path-relative canonical is a site bug more often than a signal, and
resolving it needs the reference-resolution state machine — documented
miss, not silent)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# rel before href / href before rel; ['"]? covers unquoted values up
# to the next space or '>'. The value must TERMINATE right after
# 'canonical' (quote, whitespace, '/', '>', or end of input) so
# rel="canonical-next" / rel="canonicalize" never match — without the
# boundary, [^>]* would happily absorb the suffix. RE2-safe (no
# lookaround, no backrefs) so the same pattern family runs under Java
# regex and RE2.
# Boundary classes follow the HTML5 tokenizer exactly (pinned by a
# 5000-case differential fuzz against html.parser):
# - '>' is NOT in _REL_FIRST's class — the href must live in the SAME
#   tag; consuming the terminator would let [^>]* capture the NEXT
#   tag's href ('<link rel=canonical><a href=evil>' is not an edge).
# - '/' is in NEITHER class — in an UNQUOTED attribute value a solidus
#   is part of the value per spec, so 'rel=canonical/>' parses as
#   rel="canonical/" and is not a canonical declaration (browsers
#   agree); a QUOTED 'rel="canonical"/>' terminates at the quote.
_REL_FIRST = (
    r"(?i)<link[^>]*\brel\s*=\s*['\"]?canonical(?:['\"]|\s)[^>]*"
    r"\bhref\s*=\s*['\"]?([^'\" >]+)"
)
_HREF_FIRST = (
    r"(?i)<link[^>]*\bhref\s*=\s*['\"]?([^'\" >]+)['\"]?[^>]*"
    r"\brel\s*=\s*['\"]?canonical(?:['\"]|[\s>]|$)"
)


def rel_canonical_href(html: Column) -> Column:
    """First declared canonical href in the raw html, else NULL."""
    h = html.cast("string")
    return F.nullif(
        F.coalesce(
            F.nullif(F.regexp_extract(h, _REL_FIRST, 1), F.lit("")),
            F.nullif(F.regexp_extract(h, _HREF_FIRST, 1), F.lit("")),
        ),
        F.lit(""),
    )


def rel_canonical_edges(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """pages → (src_url, dst_url) alias edges from rel=canonical
    declarations: absolute http(s) hrefs as-is, protocol-relative
    completed with the page's scheme, root-relative with the page's
    scheme://host; dotted-relative skipped; self-declarations dropped
    (a page canonicalizing to itself is the non-alias case)."""
    # Staged projections keep every generated method under Janino's
    # 64 KB limit (inlining blew it and silently forfeited whole-stage
    # codegen — interpreted fallback).  Two stages matter:
    # 1. `_h` = cast(html) in its OWN projection: the href extraction
    #    references the page text twice (rel-first + href-first regex),
    #    and CollapseProject would otherwise substitute the upstream
    #    html expression into BOTH slots, doubling its code.  A
    #    twice-referenced non-cheap projection is never collapsed.
    # 2. `_href` materialized once before the branchy resolution, so
    #    the regexp chains aren't re-inlined into every when() branch.
    # 3. `_mid` (monotonically_increasing_id) is a deliberate optimizer
    #    FENCE: PushDownPredicates only pushes a filter through a
    #    Project when every projected field is deterministic, and
    #    without the fence it substitutes the whole href/resolution
    #    tree into the dst_url predicates multiplicatively (~16 copies,
    #    >64 KB of generated code AND 3x regex work per page on a
    #    100 TB scan).  With it, dst_url is computed once and the
    #    filter reads the attribute.  The filter references _mid with
    #    an always-true conjunct so column pruning keeps the fence.
    # The plan stays map-only — projections fuse into one codegen stage
    # with separate per-operator doConsume methods.
    u = F.col(url_col)
    casted = pages.select(
        u.alias("src_url"),
        F.col(html_col).cast("string").alias("_h"),
    )
    h = F.col("_h")
    su = F.col("src_url")
    staged = casted.select(
        su,
        # rel_canonical_href over the staged _h (the cast inside the
        # helper is a no-op on the already-string column, so the two
        # regex slots still reference the cheap `_h` attribute)
        rel_canonical_href(h).alias("_href"),
        F.regexp_extract(su, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1).alias("_scheme"),
        F.regexp_extract(su, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1).alias(
            "_host"
        ),
        F.monotonically_increasing_id().alias("_mid"),
    )
    href, scheme, host = F.col("_href"), F.col("_scheme"), F.col("_host")
    dst = (
        F.when(href.rlike(r"^(?i)https?://"), href)
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(
            href.startswith("/"),
            F.concat(scheme, F.lit("://"), host, href),
        )
    )
    return (
        staged.select(F.col("src_url"), dst.alias("dst_url"), F.col("_mid"))
        .filter(
            F.col("dst_url").isNotNull()
            & (F.col("dst_url") != F.col("src_url"))
            & (F.col("_mid") >= 0)
        )
        .select("src_url", "dst_url")
    )
