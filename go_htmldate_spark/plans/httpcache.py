"""HTTP cache semantics for recrawl scheduling (RFC 9111).

A crawler is a shared cache: the origin tells it how long a fetched
page stays fresh (Cache-Control: max-age / s-maxage, Expires) and
hands it validators (ETag, Last-Modified) that turn a refetch into a
cheap 304 Not Modified. The reference engine never refetches (it is
a per-document extractor, core.go:48-133); at crawl tier this layer
decides WHEN a URL re-enters the frontier and HOW to fetch it, and
complements the observed-change-rate estimator in plans/recrawl.py:
cache semantics are the origin's declared freshness, change-rate is
the measured one — the scheduler takes the later of the two before a
URL is eligible again.

Both operators are built for the 10^10-row fetch log:

- `parse_cache_headers` is a pure map-only scan-transform — regexp
  directive parse + closed-form TTL arithmetic, zero exchanges, rides
  whatever partitioning the fetch log already has.
- `revalidation_plan` is one groupBy on the url key the log is
  naturally partitioned by — one exchange at any history size, with
  map-side partial aggregation.

TTL derivation (RFC 9111 §4.2, §5.2.2):

    no-store / no-cache          -> 0 (always revalidate)
    s-maxage=N  (shared cache)   -> N        (overrides max-age)
    max-age=N                    -> N
    Expires                      -> max(0, expires - fetch)
    heuristic (§4.2.2)           -> 10% of (fetch - last_modified),
                                    clamped to [60 s, 30 d]
    none of the above            -> default_ttl_s

All explicit TTLs are capped at 1 year (the RFC's guidance for
sanity-capping absurd lifetimes). Integer-second arithmetic
throughout, so the output is bit-stable across partitionings and
exactly replicable in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ONE_YEAR_S = 31_536_000
_HEUR_MIN_S = 60
_HEUR_MAX_S = 2_592_000  # 30 days


def parse_cache_headers(
    fetches: DataFrame,
    url_col: str = "url",
    fetch_ts_col: str = "fetch_ts",
    cc_col: str = "cache_control",
    expires_col: str = "expires_ts",
    lm_col: str = "last_modified_ts",
    etag_col: str = "etag",
    default_ttl_s: int = 86_400,
) -> DataFrame:
    """Fetch log → (url, fetch_ts, ttl_s, fresh_until, has_validator,
    ttl_source). Timestamps are epoch seconds (BIGINT); ttl_s is an
    integer number of seconds; fresh_until = fetch_ts + ttl_s. The
    Cache-Control string is parsed with RE2-safe regexes (directive
    names are case-insensitive per RFC 9110 §5.6.2); a directive
    match anywhere in the header wins — a crawler has no reason to
    honor quoted-string corner cases an origin would never emit."""
    cc = F.coalesce(F.col(cc_col), F.lit(""))
    fetch = F.col(fetch_ts_col).cast("long")
    exp = F.col(expires_col).cast("long")
    lm = F.col(lm_col).cast("long")

    no_store = cc.rlike(r"(?i)\bno-store\b")
    no_cache = cc.rlike(r"(?i)\bno-cache\b")
    s_maxage = F.nullif(
        F.regexp_extract(cc, r"(?i)\bs-maxage\s*=\s*\"?(\d{1,18})", 1),
        F.lit(""),
    ).cast("long")
    max_age = F.nullif(
        F.regexp_extract(cc, r"(?i)\bmax-age\s*=\s*\"?(\d{1,18})", 1),
        F.lit(""),
    ).cast("long")

    cap = F.lit(int(_ONE_YEAR_S)).cast("long")
    zero = F.lit(0).cast("long")
    heur = F.least(
        F.greatest(
            ((fetch - lm) / F.lit(10)).cast("long"),
            F.lit(int(_HEUR_MIN_S)).cast("long"),
        ),
        F.lit(int(_HEUR_MAX_S)).cast("long"),
    )

    ttl = (
        F.when(no_store | no_cache, zero)
        .when(s_maxage.isNotNull(), F.least(s_maxage, cap))
        .when(max_age.isNotNull(), F.least(max_age, cap))
        .when(exp.isNotNull(), F.least(F.greatest(exp - fetch, zero), cap))
        .when(lm.isNotNull() & (fetch > lm), heur)
        .otherwise(F.lit(int(default_ttl_s)).cast("long"))
    )
    source = (
        F.when(no_store, F.lit("no-store"))
        .when(no_cache, F.lit("no-cache"))
        .when(s_maxage.isNotNull(), F.lit("s-maxage"))
        .when(max_age.isNotNull(), F.lit("max-age"))
        .when(exp.isNotNull(), F.lit("expires"))
        .when(lm.isNotNull() & (fetch > lm), F.lit("heuristic"))
        .otherwise(F.lit("default"))
    )
    has_validator = (
        F.coalesce(F.col(etag_col), F.lit("")) != F.lit("")
    ) | F.col(lm_col).isNotNull()

    return fetches.select(
        F.col(url_col).alias("url"),
        fetch.alias("fetch_ts"),
        ttl.alias("ttl_s"),
        (fetch + ttl).alias("fresh_until"),
        has_validator.alias("has_validator"),
        source.alias("ttl_source"),
    )


def revalidation_plan(
    history: DataFrame,
    as_of_ts: int,
    url_col: str = "url",
    ts_col: str = "fetch_ts",
    status_col: str = "status",
    bytes_col: str = "body_bytes",
    etag_col: str = "etag",
    lm_col: str = "last_modified_ts",
) -> DataFrame:
    """Per-URL conditional-GET plan from the fetch history: for every
    URL, how to refetch (conditional vs full) and what a conditional
    refetch is expected to cost.

    Input rows are individual fetches: status 200 (full body,
    body_bytes counted) or 304 (validator hit, no body). Output one
    row per URL:

        n_fetches       total observed fetches
        n_not_modified  how many came back 304
        revalidate_rate n_304 / (fetches after the first) — the
                        empirical P[unchanged] for this URL; NULL
                        until a URL has been refetched at least once
        avg_body_bytes  mean 200-response body size (integer floor,
                        bit-stable)
        mode            'conditional' when the LAST fetch carried a
                        validator (ETag or Last-Modified), else 'full'
        est_fetch_bytes expected bytes of the next refetch:
                        conditional -> avg_body * (1 - revalidate_rate)
                        (the 304 path transfers ~0 body), full ->
                        avg_body. Integer floor.

    One exchange: everything is a single groupBy(url) with max_by for
    last-fetch attribution (deterministic — ties on fetch_ts break by
    status then etag so reordering partitions cannot flip the plan).
    """
    url = F.col(url_col)
    ts = F.col(ts_col).cast("long")
    status = F.col(status_col).cast("int")
    nbytes = F.col(bytes_col).cast("long")
    has_val = (
        (F.coalesce(F.col(etag_col), F.lit("")) != F.lit(""))
        | F.col(lm_col).isNotNull()
    )
    # deterministic last-fetch pick: order by (ts, status, etag)
    ordkey = F.struct(
        ts.alias("ts"),
        status.alias("st"),
        F.coalesce(F.col(etag_col), F.lit("")).alias("et"),
    )
    agg = (
        history.select(
            url.alias("url"),
            ts.alias("ts"),
            status.alias("status"),
            nbytes.alias("nbytes"),
            has_val.alias("has_val"),
            ordkey.alias("ord"),
        )
        .groupBy("url")
        .agg(
            F.count("*").alias("n_fetches"),
            F.sum(F.when(F.col("status") == 304, 1).otherwise(0)).alias(
                "n_not_modified"
            ),
            F.sum(
                F.when(F.col("status") == 200, F.col("nbytes")).otherwise(0)
            ).alias("_body_total"),
            F.sum(F.when(F.col("status") == 200, 1).otherwise(0)).alias(
                "_n_200"
            ),
            F.max_by("has_val", F.col("ord")).alias("_last_has_val"),
            F.max(F.col("ts")).alias("last_fetch_ts"),
        )
    )
    refetches = F.col("n_fetches") - 1
    reval_rate = F.when(
        refetches > 0,
        F.col("n_not_modified").cast("double") / refetches.cast("double"),
    )
    avg_body = F.when(
        F.col("_n_200") > 0,
        (F.col("_body_total") / F.col("_n_200")).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    mode = F.when(F.col("_last_has_val"), F.lit("conditional")).otherwise(
        F.lit("full")
    )
    est = F.when(
        F.col("_last_has_val"),
        (
            avg_body.cast("double")
            * (F.lit(1.0) - F.coalesce(reval_rate, F.lit(0.0)))
        ).cast("long"),
    ).otherwise(avg_body)
    return agg.select(
        "url",
        F.col("n_fetches").cast("int").alias("n_fetches"),
        F.col("n_not_modified").cast("int").alias("n_not_modified"),
        (F.round(reval_rate, 6) + F.lit(0.0)).alias("revalidate_rate"),
        avg_body.alias("avg_body_bytes"),
        mode.alias("mode"),
        est.alias("est_fetch_bytes"),
        F.col("last_fetch_ts").alias("last_fetch_ts"),
    )
