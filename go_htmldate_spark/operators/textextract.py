"""Visible-text extraction: html → the text a reader sees, as native
column algebra.

The curation stack (c4_heuristics, gopher_repetition, lang_id,
line_dedup, quality models) is only as good as its text carrier; a
bare tag strip leaves javascript, css, and entity soup in the
"document" and every downstream statistic measures the wrong thing
(a page that is 80% inline script passes word-count gates on code
tokens). This is the boilerplate-light middle ground between that
strip and a full readability segmenter:

1. comments and non-content SUBTREES drop whole (script, style,
   noscript, template, svg, head — their inner text was never
   visible),
2. block-level tags become newlines (paragraph structure survives for
   the line-wise operators), remaining tags a space,
3. the common named/numeric entities decode,
4. whitespace normalizes: space runs collapse within a line, newline
   runs collapse to one (one output line per visible block), edges
   strip.

Reference analog: none — go-htmldate parses dates, not bodies; the
regexp discipline mirrors its tag-soup scans (core.go examineMeta
family).

Spark-first shape: ONE chained regexp_replace projection — map-only,
zero exchanges, zero Python, whole-stage codegen. Patterns avoid
lookaround/backreferences so the DuckDB oracle replays the identical
law on the RE2 engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# subtrees whose inner text is never visible; (?s) so bodies span
# lines, non-greedy so adjacent blocks don't merge. One alternative
# per tag (no backreference) so the DuckDB oracle's RE2 engine can
# replay the identical pattern.
_DROP_SUBTREE_RX = "(?is)" + "|".join(
    rf"<{tag}\b[^>]*>.*?</{tag}\s*>"
    for tag in ("script", "style", "noscript", "template", "svg", "head")
)
# block-level boundaries → newline so lines mean something downstream
_BLOCK_TAG_RX = (
    r"(?i)</?(?:p|div|br|h[1-6]|li|ul|ol|tr|table|thead|tbody|td|th|"
    r"dl|dd|dt|section|article|header|footer|blockquote|pre|nav|"
    r"aside|figure|figcaption|form|hr|option|select)\b[^>]*/?>"
)
_ANY_TAG_RX = r"(?s)<[^>]+>"

# the entities that dominate real-web text; chained literal replaces
# (amp LAST so '&amp;lt;' decodes to '&lt;' not '<')
_ENTITIES = [
    ("&nbsp;", " "), ("&#160;", " "),
    ("&lt;", "<"), ("&#60;", "<"),
    ("&gt;", ">"), ("&#62;", ">"),
    ("&quot;", '"'), ("&#34;", '"'),
    ("&apos;", "'"), ("&#39;", "'"),
    ("&rsquo;", "’"), ("&lsquo;", "‘"),
    ("&rdquo;", "”"), ("&ldquo;", "“"),
    ("&ndash;", "–"), ("&mdash;", "—"),
    ("&hellip;", "…"), ("&middot;", "·"),
    ("&copy;", "©"), ("&reg;", "®"),
    ("&shy;", ""),
    ("&amp;", "&"), ("&#38;", "&"),
]


def visible_text(html: Column) -> Column:
    """html → visible text: non-content subtrees dropped, block tags
    to newlines, other tags to spaces, common entities decoded,
    whitespace normalized (space/tab runs collapse, newline runs
    collapse to one, edges strip). NULL html → ''."""
    t = F.coalesce(html.cast("string"), F.lit(""))
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, _DROP_SUBTREE_RX, " ")
    t = F.regexp_replace(t, _BLOCK_TAG_RX, "\n")
    t = F.regexp_replace(t, _ANY_TAG_RX, " ")
    for ent, repl in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(repl))
    # space runs → one space; newline runs (with any surrounding
    # spaces) → one newline; strip ALL edge whitespace (F.trim only
    # strips spaces, not newlines)
    t = F.regexp_replace(t, r"[ \t\r\f]+", " ")
    t = F.regexp_replace(t, r" ?\n[ \n]*", "\n")
    t = F.regexp_replace(t, r"^\s+", "")
    return F.regexp_replace(t, r"\s+$", "")


def pages_to_text(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """pages → (url, text, n_chars, n_lines): the corpus in its
    curation-ready text form. Map-only; rides the corpus partitioning
    untouched."""
    txt = visible_text(F.col(html_col))
    return pages.select(
        F.col(url_col).alias("url"),
        txt.alias("text"),
    ).select(
        "url", "text",
        F.length("text").cast("long").alias("n_chars"),
        F.when(F.col("text") == "", F.lit(0))
        .otherwise(F.size(F.split(F.col("text"), "\n")))
        .cast("long").alias("n_lines"),
    )


def link_density(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, n_anchor_chars, n_text_chars, link_density): the share of
    a page's visible text living inside anchors — the classic
    boilerplate/navigation/spam signal (link farms and nav shells run
    near 1.0, articles near 0.0; the block-level version underlies
    Kohlschütter et al. WSDM'10 boilerplate detection, here at page
    granularity for the host-demotion layers). Anchor text is measured
    on the SAME whitespace-collapse law as visible_text so the ratio
    is a true subset share; density is 0.0 on empty pages. Map-only:
    the anchor scan and the visible-text chain run in one projection."""
    from ..plans.hostgraph import ANCHOR_RX

    h = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    texts = F.regexp_extract_all(h, F.lit(ANCHOR_RX), F.lit(3))
    anchor_chars = F.aggregate(
        F.transform(
            texts,
            lambda t: F.length(
                F.trim(F.regexp_replace(t, r"\s+", " "))
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    text_chars = F.length(visible_text(h)).cast("long")
    # stage the two counters in their own projection: inlined, the
    # density column re-evaluates the visible_text regexp chain (and
    # the anchor fold) two more times per row — CollapseProject keeps
    # non-cheap aliases staged, so each chain runs exactly once
    staged = pages.select(
        F.col(url_col).alias("url"),
        anchor_chars.alias("n_anchor_chars"),
        text_chars.alias("n_text_chars"),
    )
    ac, tc = F.col("n_anchor_chars"), F.col("n_text_chars")
    return staged.select(
        "url", "n_anchor_chars", "n_text_chars",
        F.when(tc > 0, F.round(ac / tc, 6) + F.lit(0.0))
        .otherwise(F.lit(0.0)).alias("link_density"),
    )
