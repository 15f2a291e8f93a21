"""RSS/Atom feed parsing as a native Spark operator.

Feeds are the third discovery channel of a tier crawl, next to
sitemaps (`sources/sitemaps.py`) and in-page links: news and blog
hosts advertise fresh URLs with publication timestamps minutes after
they exist, long before a sitemap regenerates. Parsed entries become
frontier seeds with recency priority — the same law sitemap seeds
use — and their pubDates are discovery-time publication evidence the
extraction cascade can cross-check (the reference extracts the same
fact from the page body itself; a feed gives it to the crawl before
the page is ever fetched).

Feed-lite semantics, same discipline as the sitemap parser:

- RSS 2.0 `<item>` blocks yield `<link>` + `<pubDate>` (RFC 822:
  `Mon, 02 Jun 2025 10:30:00 GMT` → the date is rebuilt from the
  day/month-name/year core, the only part every feed agrees on);
- Atom `<entry>` blocks yield the first `<link href=...>` and
  `<updated>`/`<published>` (ISO 8601; the date prefix is kept,
  `published` preferred when both exist);
- entity-decoding covers the five XML built-ins.

Everything is native Catalyst (regexp_extract_all over dotall block
patterns, posexplode, regexp_extract within the block) — no Python,
no XML library, RE2-safe patterns (non-greedy, no backreferences) so
the DuckDB oracle replays them verbatim. 10^8 feed bodies parse as a
plain column map over whatever partitioning the fetch corpus has.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sitemaps import _xml_unescape

_RSS_ITEM = r"(?s)<item[\s>](.*?)</item\s*>"
_ATOM_ENTRY = r"(?s)<entry[\s>](.*?)</entry\s*>"
_RSS_LINK = r"(?s)<link\s*>\s*(.*?)\s*</link\s*>"
_ATOM_LINK = r'(?s)<link[^>]*href\s*=\s*"([^"]*)"'
# RFC 822 date core: "02 Jun 2025" (optionally 1-digit day)
_RFC822_CORE = r"(?s)<pubDate\s*>[^<]*?(\d{1,2}) ([A-Za-z]{3}) (\d{4})"
_ATOM_PUBLISHED = r"(?s)<published\s*>\s*(\d{4}-\d{2}-\d{2})"
_ATOM_UPDATED = r"(?s)<updated\s*>\s*(\d{4}-\d{2}-\d{2})"

_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]


def _rfc822_date(block):
    """'<pubDate>Mon, 02 Jun 2025 ...' → '2025-06-02' (empty-string
    when absent/unparseable — same sentinel as regexp_extract)."""
    day = F.regexp_extract(block, _RFC822_CORE, 1)
    mon = F.regexp_extract(block, _RFC822_CORE, 2)
    yr = F.regexp_extract(block, _RFC822_CORE, 3)
    mnum = F.element_at(
        F.create_map(*[
            F.lit(x)
            for i, name in enumerate(_MONTHS)
            for x in (name, f"{i + 1:02d}")
        ]),
        mon,
    )
    return F.when(
        (day != "") & mnum.isNotNull(),
        F.concat(yr, F.lit("-"), mnum, F.lit("-"), F.lpad(day, 2, "0")),
    ).otherwise(F.lit(""))


def parse_feeds(
    df: DataFrame, xml_col: str = "xml", src_col: str = "feed_url"
) -> DataFrame:
    """(feed_url, xml) → one row per entry: (feed_url, kind, loc,
    pub_date) with kind 'rss' for `<item>` members and 'atom' for
    `<entry>` members; pub_date is YYYY-MM-DD or NULL. Entries without
    a link are dropped. Map-only — the only shuffle is whatever the
    caller does next."""
    rss = df.select(
        F.col(src_col),
        F.lit("rss").alias("kind"),
        F.explode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_RSS_ITEM), 1)
        ).alias("block"),
    )
    atom = df.select(
        F.col(src_col),
        F.lit("atom").alias("kind"),
        F.explode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_ATOM_ENTRY), 1)
        ).alias("block"),
    )
    entries = rss.unionByName(atom)
    block = F.col("block")
    loc = _xml_unescape(
        F.when(F.col("kind") == "rss",
               F.regexp_extract(block, _RSS_LINK, 1))
        .otherwise(F.regexp_extract(block, _ATOM_LINK, 1))
    )
    published = F.regexp_extract(block, _ATOM_PUBLISHED, 1)
    updated = F.regexp_extract(block, _ATOM_UPDATED, 1)
    date = (
        F.when(F.col("kind") == "rss", _rfc822_date(block))
        .when(published != "", published)
        .otherwise(updated)
    )
    return (
        entries.select(
            src_col,
            "kind",
            loc.alias("loc"),
            F.when(date != "", date).alias("pub_date"),
        )
        .filter(F.col("loc") != "")
    )


def feed_seeds(df: DataFrame, xml_col: str = "xml",
               src_col: str = "feed_url") -> DataFrame:
    """Parsed feed entries as frontier seeds: (url, priority,
    pub_date) with priority = recency_score(pub_date) — identical law
    to sitemap_seeds, so both channels merge into one seed table for
    CrawlScheduler.init_from_seeds. Entries with no parseable date get
    the scheduler's no-evidence floor (recency_score(NULL))."""
    from go_htmldate_spark.plans.scheduler import recency_score

    return parse_feeds(df, xml_col=xml_col, src_col=src_col).select(
        F.col("loc").alias("url"),
        F.round(recency_score(F.col("pub_date")), 6).alias("priority"),
        "pub_date",
    )
