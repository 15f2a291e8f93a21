"""hreflang alternate-language clusters: translation-set detection as
a map-only page plan.

International sites publish every page in k language variants and
declare the full set on EACH variant with
`<link rel="alternate" hreflang="xx" href>` (Google's hreflang
contract: annotations must be bidirectional — every member lists
every member, usually including itself, optionally plus an
`x-default` fallback). For a crawler / training-data pipeline that
set is a declared near-duplicate cluster: fetch budget should treat
the cluster as one logical document (crawl the variants you want,
not 40 copies of the boilerplate), and language-mix curation
(host_lang_budgets, ccnet_buckets) can sample variants per cluster
instead of per URL.

Reference analog: none — this is crawl-side structure over the corpus
the reference processes one page at a time.

Spark-first shape: because the spec makes every member carry the full
membership list, the cluster key needs NO join and NO connected
components — each page computes min(declared hrefs ∪ {self}) in its
own row. The whole operator is ONE map-only projection over the page
scan (native regexp + array HOFs, zero exchanges, zero Python): at
100 TB it rides the corpus partitioning untouched. Contrast
operators/dedup.py's pointer-jumping components, needed only when
membership is *discovered* rather than declared; pages whose
annotations are in fact non-bidirectional simply land in different
clusters (the same degraded behavior search engines apply).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# All <link ...> tags; a quoted '>' inside an attribute would end the
# capture early (documented: hreflang/href values never contain '>').
_LINK_TAG_RX = r"(?i)<link\s[^>]*>"
# rel value must terminate right after 'alternate' (quote / space /
# '>') so rel="alternate-print" never matches — the boundary
# discipline of plans/rel_canonical.py.
_REL_ALT_RX = r"(?i)\brel\s*=\s*['\"]?alternate(?:['\"]|[\s>])"
_HREFLANG_RX = r"(?i)\bhreflang\s*=\s*['\"]?([a-zA-Z0-9-]+)"
# quoted href: backreference-delimited so the other quote kind is
# legal inside the URL; unquoted fallback stops at quote/space/'>'
_HREF_Q_RX = r"""(?i)\bhref\s*=\s*(["'])((?:(?!\1)[^>])*)\1"""
_HREF_U_RX = r"""(?i)\bhref\s*=\s*([^'" >]+)"""


def _resolved_href(tag: Column, scheme: Column, host: Column) -> Column:
    """href attribute of one <link> tag, resolved against the page's
    scheme/host via the shared plans/canonical.resolve_href law
    (dotted-relative, mailto, empty → NULL)."""
    from .canonical import resolve_href

    href = F.coalesce(
        F.nullif(F.regexp_extract(tag, _HREF_Q_RX, 2), F.lit("")),
        F.nullif(F.regexp_extract(tag, _HREF_U_RX, 1), F.lit("")),
    )
    return resolve_href(href, scheme, host)


def hreflang_clusters(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """pages → (url, cluster_key, representative, n_alternates,
    has_xdefault, is_representative) translation-cluster assignment.

    cluster_key = lexicographic min over the page's declared alternate
    hrefs plus its own url (stable under any partitioning, identical
    on every member of a bidirectional set). representative = the
    x-default target when declared (the site's own fallback choice),
    else the cluster key. Pages declaring nothing form singleton
    clusters (cluster_key = url) with n_alternates 0.

    Map-only: tag scan → per-tag (lang, href) structs → array algebra,
    all in one projection chain; no exchange anywhere."""
    from .canonical import url_authority_of, url_scheme_of

    u = F.col(url_col)
    casted = pages.select(
        u.alias("url"),
        # NULL html (failed/empty fetches) must behave like a page
        # declaring nothing — a SINGLETON cluster keyed on its own url.
        # Without the coalesce, NULL propagates through the array
        # algebra into cluster_key, and every null-html page lands in
        # ONE shared NULL cluster (a skew hotspot that
        # hreflang_representative_filter would collapse to one row).
        F.coalesce(F.col(html_col).cast("string"), F.lit(""))
        .alias("_h"),
    )
    staged = casted.select(
        "url",
        F.regexp_extract_all(
            F.col("_h"), F.lit(_LINK_TAG_RX), F.lit(0)
        ).alias("_tags"),
        url_scheme_of(F.col("url")).alias("_scheme"),
        url_authority_of(F.col("url")).alias("_host"),
    )
    scheme, host = F.col("_scheme"), F.col("_host")
    alt_tags = F.filter(
        F.col("_tags"),
        lambda t: t.rlike(_REL_ALT_RX) & t.rlike(_HREFLANG_RX),
    )
    alts = staged.select(
        "url",
        F.filter(
            F.transform(
                alt_tags,
                lambda t: F.struct(
                    F.lower(F.regexp_extract(t, _HREFLANG_RX, 1)).alias("lang"),
                    _resolved_href(t, scheme, host).alias("href"),
                ),
            ),
            lambda s: s["href"].isNotNull(),
        ).alias("_alts"),
    )
    a = F.col("_alts")
    hrefs = F.transform(a, lambda s: s["href"])
    xdef = F.filter(a, lambda s: s["lang"] == "x-default")
    cluster = F.array_min(
        F.array_union(hrefs, F.array(F.col("url")))
    ).alias("cluster_key")
    out = alts.select(
        "url",
        cluster,
        F.coalesce(
            # 0-based get() is NULL-safe on empty arrays (element_at
            # throws under ANSI when no x-default is declared)
            F.get(F.transform(xdef, lambda s: s["href"]), 0),
            F.array_min(F.array_union(hrefs, F.array(F.col("url")))),
        ).alias("representative"),
        F.size(a).cast("long").alias("n_alternates"),
        (F.size(xdef) > 0).alias("has_xdefault"),
    )
    return out.withColumn(
        "is_representative", F.col("url") == F.col("representative")
    )


def hreflang_cluster_stats(clusters: DataFrame) -> DataFrame:
    """Cluster roll-up in budget terms: members per cluster and how
    many declare the full set (bidirectional-consistency audit — a
    cluster where n_members disagrees with the declared n_alternates+1
    has broken annotations, the thing Search Console warns about).
    One exchange on cluster_key, O(clusters) output."""
    return clusters.groupBy("cluster_key").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.max("n_alternates").cast("long").alias("max_declared"),
        F.sum(F.when(F.col("has_xdefault"), 1).otherwise(0))
        .cast("long").alias("n_with_xdefault"),
    )


def hreflang_representative_filter(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Keep ONE page per translation cluster: the declared
    representative (x-default target when present, else the cluster
    key) if it is in the corpus, else the first member by
    (representative-flag desc, url asc) — so a cluster whose
    representative was never fetched still contributes exactly one
    variant. Pages declaring nothing are singleton clusters and always
    survive.

    Shuffle shape: the decision runs over the PROJECTED
    (url, cluster_key, is_representative) columns — one exchange on
    cluster_key carrying ~3 small strings per page — then a url-keyed
    semi join brings the verdict back to the full rows (the
    line_dedup/remove_dup_spans join-back convention in
    jobs/curate_job.py); page bytes cross one exchange at most."""
    from pyspark.sql import Window

    cl = hreflang_clusters(pages, url_col, html_col).select(
        "url", "cluster_key", "is_representative"
    )
    w = Window.partitionBy("cluster_key").orderBy(
        F.col("is_representative").desc(), F.col("url").asc()
    )
    keep = (
        cl.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col("url").alias("_keep_url"))
    )
    return pages.join(
        keep, pages[url_col] == keep["_keep_url"], "left_semi"
    )
