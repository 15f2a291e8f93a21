"""URL-pattern yield prior: learn which URL shapes pay, re-rank the
frontier with the evidence.

Cho, Garcia-Molina & Page (WWW'98, "Efficient crawling through URL
ordering") showed that ordering the frontier by cheap URL-derived
evidence beats BFS for any notion of page value; focused crawlers
(Chakrabarti WWW'99, Menczer/Pant TOIT'04) learn that evidence online
from their own fetch history.  This engine's notion of value is the
one its extraction cascade measures on every fetch: DID THE PAGE YIELD
A PUBLICATION DATE (``date IS NOT NULL`` in the fetch log — dated
pages are articles; undated ones are nav shells, tag indexes, search
results).  The fetch log therefore already contains a labeled training
set keyed by URL shape, and this module closes the loop:

* ``url_pattern_signature`` — a map-only shape key: host | first path
  segment | depth bucket (0,1,2,3+) | has-a-4-digit-run flag | extension
  class (page / asset / none).  ``/blog/2024/03/x.html`` and
  ``/tag/foo`` land in different buckets on every axis that predicts
  article-ness; all native regexp/split algebra, no Python.
* ``pattern_yield`` — per-signature Beta(alpha, alpha) posterior mean
  of the date-yield rate: (n_dated + alpha) / (n_fetched + 2*alpha)
  (Laplace smoothing keeps one lucky fetch from minting a 100% prior).
  Exact integer sums, ONE map-side-combined exchange on the signature
  key; output is O(patterns) = O(hosts x lead segments) — kilobytes
  per host, a broadcastable side table at any corpus size.
* ``apply_yield_prior`` — frontier priority *= learned yield (unseen
  patterns fall back to the smoothed prior mean 0.5): signature
  derivation is map-only on the frontier, the yield table broadcasts,
  so the 10^10-row frontier NEVER shuffles for this gate — the same
  zero-exchange contract as the blocklist/trap gates it composes with
  in the scheduler.

Reference: no analog (go-htmldate has no frontier); the priority it
modulates is plans/scheduler.py's politeness x recency law, and the
``dated`` label is the cascade's own output — this is the operator
that makes the extractor feed the crawler.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .canonical import url_host, url_path

_PAGE_EXT = ("html", "htm", "php", "asp", "aspx", "jsp", "shtml")
_ASSET_EXT = ("jpg", "jpeg", "png", "gif", "svg", "webp", "css", "js",
              "ico", "pdf", "zip", "xml", "mp4", "mp3", "woff", "woff2")


def url_pattern_signature(url: Column) -> Column:
    """host | seg1 | depth bucket | digit flag | extension class —
    the URL's shape key, all native expression algebra."""
    path = url_path(url)
    trimmed = F.regexp_replace(path, r"^/+", "")
    seg1 = F.substring_index(trimmed, "/", 1)
    depth = F.size(F.filter(F.split(trimmed, "/"), lambda x: x != ""))
    depth_b = F.when(depth >= 3, F.lit("3+")).otherwise(depth.cast("string"))
    digits = F.when(path.rlike("[0-9]{4}"), "d").otherwise("-")
    ext = F.lower(F.regexp_extract(path, r"\.([a-zA-Z0-9]+)$", 1))
    ext_c = (
        F.when(ext.isin(*_PAGE_EXT), "page")
        .when(ext.isin(*_ASSET_EXT), "asset")
        .otherwise("none")
    )
    return F.concat_ws("|", url_host(url), seg1, depth_b, digits, ext_c)


_RX_HOST = None
_RX_PATH = None
_RX_EXT = None


def url_pattern_signature_py(url: str) -> str:
    """Single-URL reference implementation of ``url_pattern_signature``
    (oracle scheduler + tests) — byte-identical to the column
    expression on every URL."""
    global _RX_HOST, _RX_PATH, _RX_EXT
    import re

    if _RX_HOST is None:
        _RX_HOST = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]*)")
        _RX_PATH = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)")
        _RX_EXT = re.compile(r"\.([a-zA-Z0-9]+)$")
    m = _RX_HOST.search(url)
    host = m.group(1).lower() if m else ""
    m = _RX_PATH.search(url)
    path = m.group(1) if m else ""
    if path == "":
        path = "/"
    trimmed = re.sub(r"^/+", "", path)
    seg1 = trimmed.split("/")[0]
    depth = sum(1 for x in trimmed.split("/") if x != "")
    depth_b = "3+" if depth >= 3 else str(depth)
    digits = "d" if re.search(r"[0-9]{4}", path) else "-"
    m = _RX_EXT.search(path)
    ext = m.group(1).lower() if m else ""
    if ext in _PAGE_EXT:
        ext_c = "page"
    elif ext in _ASSET_EXT:
        ext_c = "asset"
    else:
        ext_c = "none"
    return f"{host}|{seg1}|{depth_b}|{digits}|{ext_c}"


def pattern_yield(
    fetch_log: DataFrame,
    alpha: float = 1.0,
    url_col: str = "url",
    dated_col: str = "dated",
) -> DataFrame:
    """Fetch log (url, dated boolean) → per-signature smoothed
    date-yield table (signature, n_fetched, n_dated, yield)."""
    a = float(alpha)
    sig = fetch_log.select(
        url_pattern_signature(F.col(url_col)).alias("signature"),
        F.col(dated_col).cast("long").alias("_hit"),
    )
    agg = sig.groupBy("signature").agg(
        F.count(F.lit(1)).alias("n_fetched"),
        F.sum("_hit").alias("n_dated"),
    )
    return agg.withColumn(
        "yield",
        (F.col("n_dated") + F.lit(a)) / (F.col("n_fetched") + F.lit(2.0 * a)),
    )


def apply_yield_prior(
    frontier: DataFrame,
    yields: DataFrame,
    url_col: str = "url",
    priority_col: str = "priority",
    default_yield: float = 0.5,
) -> DataFrame:
    """Multiply frontier priority by the learned pattern yield
    (broadcast join on the map-only signature; unseen patterns get the
    prior mean). Adds signature, yield, and prior_priority; priority
    becomes the re-ranked value the scheduler's top-k consumes."""
    f = frontier.withColumn(
        "signature", url_pattern_signature(F.col(url_col))
    )
    y = yields.select("signature", "yield")
    out = f.join(F.broadcast(y), "signature", "left").withColumn(
        "yield", F.coalesce(F.col("yield"), F.lit(float(default_yield)))
    )
    return out.withColumn(
        "prior_priority", F.col(priority_col)
    ).withColumn(priority_col, F.col("prior_priority") * F.col("yield"))
