"""robots.txt parsing as a native Spark operator.

Turns raw robots.txt bodies into the scheduler's rules schema
(host, rules array<struct<path_prefix, allow>>, crawl_delay) — the
missing step between a crawled `/robots.txt` corpus and
`CrawlScheduler(robots=…)`. RFC 9309-lite semantics:

- directives are case-insensitive, `#` starts a comment
- consecutive `User-agent:` lines open ONE group; the group's rules run
  until the next group starts
- only groups naming the target agent (default `*`) apply; multiple
  matching groups merge in file order; when NO group names the specific
  agent, the `*` groups apply instead (RFC 9309 §2.2.1 — specific wins
  over `*`, never merged with it)
- empty `Disallow:` / `Allow:` values impose no rule
- `Crawl-delay` is the minimum across matching groups

Everything is native Catalyst (split/posexplode/window/groupBy): at
10^10-URL scale robots bodies arrive as one more page table and parse
in the same executors — no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DIRECTIVES = ("user-agent", "allow", "disallow", "crawl-delay")


def parse_robots(
    df: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
    user_agent: str = "*",
) -> DataFrame:
    """(host, robots_txt) → (host, rules, crawl_delay)."""
    line = F.trim(F.regexp_replace(F.col("_line"), r"#.*$", ""))
    directive = F.lower(F.regexp_extract(line, r"^([A-Za-z-]+)\s*:", 1))
    value = F.trim(F.regexp_extract(line, r"^[A-Za-z-]+\s*:\s*(.*)$", 1))

    lines = (
        df.select(
            F.col(host_col).alias("host"),
            F.posexplode(F.split(F.col(body_col), "\n")).alias("pos", "_line"),
        )
        .select("host", "pos", directive.alias("dir"), value.alias("val"))
        .filter(F.col("dir").isin(*_DIRECTIVES))
    )

    # group id: a user-agent line NOT preceded by another user-agent line
    # starts a new group (robots files are tiny — the per-host window is
    # bounded by file length, hosts partition the shuffle)
    w = Window.partitionBy("host").orderBy("pos")
    new_group = (
        (F.col("dir") == "user-agent")
        & (F.coalesce(F.lag("dir").over(w) != "user-agent", F.lit(True)))
    ).cast("int")
    grouped = lines.withColumn(
        "gid",
        F.sum(new_group).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )

    groups = grouped.groupBy("host", "gid").agg(
        F.collect_set(
            F.when(F.col("dir") == "user-agent", F.lower("val"))
        ).alias("uas"),
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col("dir").isin("allow", "disallow") & (F.col("val") != ""),
                    F.struct(
                        F.col("pos").alias("pos"),
                        F.struct(
                            F.col("val").alias("path_prefix"),
                            (F.col("dir") == "allow").alias("allow"),
                        ).alias("rule"),
                    ),
                )
            )
        ).alias("ordered_rules"),
        F.min(
            F.when(F.col("dir") == "crawl-delay", F.col("val").cast("double"))
        ).alias("crawl_delay"),
    )

    # RFC 9309 group selection: groups naming the specific agent win; if
    # none do, fall back to the '*' groups (specific-or-star, not merged).
    # Without the fallback a named crawler would see NO rules from a
    # '*'-only file and fetch disallowed paths (fails impolite).
    hw = Window.partitionBy("host")
    flagged = groups.withColumn(
        "_m_specific", F.array_contains("uas", user_agent.lower())
    ).withColumn(
        "_has_specific",
        F.max(F.col("_m_specific").cast("int")).over(hw) == 1,
    )
    matching = flagged.filter(
        F.col("_m_specific")
        | (~F.col("_has_specific") & F.array_contains("uas", "*"))
    )
    return (
        matching.groupBy("host")
        .agg(
            F.flatten(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(F.col("gid"), F.col("ordered_rules"))
                        )
                    ),
                    lambda g: F.transform(g["ordered_rules"], lambda r: r["rule"]),
                )
            ).alias("rules"),
            F.min("crawl_delay").alias("crawl_delay"),
        )
    )


def robots_sitemaps(
    df: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """(host, robots_txt) → (host, pos, sitemap_url): the `Sitemap:`
    advertisement lines (sitemaps.org / RFC 9309 §2.2.4 "other
    records"). Unlike Allow/Disallow these are group-INDEPENDENT — a
    `Sitemap:` line applies no matter which User-agent group surrounds
    it — so no group machinery runs here. The directive key is
    case-insensitive; the value must be the sitemap's full URL, so
    non-absolute values are dropped. `pos` is the line number, keeping
    file order (a file may advertise several sitemaps).

    Map-only (split + posexplode + regexp, zero exchanges): at
    10^10-host scale discovery rides the robots corpus partitioning;
    feed sitemap_url into the fetch stage and the fetched bodies into
    sources/sitemaps.parse_sitemaps / sitemap_seeds.
    """
    line = F.trim(F.regexp_replace(F.col("_line"), r"#.*$", ""))
    url = F.regexp_extract(line, r"^(?i)sitemap\s*:\s*(\S+)$", 1)
    return (
        df.select(
            F.col(host_col).alias("host"),
            F.posexplode(F.split(F.col(body_col), "\n")).alias("pos", "_line"),
        )
        .select("host", "pos", url.alias("sitemap_url"))
        .filter(F.col("sitemap_url").rlike(r"^(?i)https?://"))
    )
