"""Crawl-trap detection as native Catalyst expressions.

A tier crawl dies on URL spaces that grow without bound: calendar
pages linking to next-month forever, path-segment echo loops
(`/a/a/a/...` from broken relative links), session-id links that mint
a fresh URL per fetch, and query-string cross products. The classic
guards (Heritrix's path-repetition rule, depth caps, opaque-token
detection) are all per-URL string predicates, so they compile to
map-only whole-stage-codegen — at 10^10 discovered URLs per round the
gate rides the discovery stream's existing partitioning with zero
exchanges and zero Python.

Flags are advisory signals; `trap_filter` is the hard gate the
scheduler applies to discovered outlinks (CrawlConfig.trap_guard)
so trapped URLs never enter the frontier — the same never-enters
placement as the domain blocklist.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# query keys that mint per-visitor URL spaces
_SESSION_KEYS = "phpsessid|jsessionid|aspsessionid[a-z]*|sessionid|sessid|session|sid"


def _path(url: Column) -> Column:
    # scheme://authority<path>; consecutive slashes collapse so they
    # can't inflate depth, trailing slashes drop
    p = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    return F.regexp_replace(F.regexp_replace(p, "/{2,}", "/"), "/+$", "")


def url_trap_flags(
    df: DataFrame,
    url_col: str = "url",
    max_depth: int = 16,
    max_params: int = 8,
    min_repeat: int = 3,
) -> DataFrame:
    """Append per-URL trap signals and the combined `trapped` verdict:

    - path_depth: path segments after slash collapsing (depth caps are
      the blunt guard against infinite descent);
    - seg_repeat: some segment occurs >= min_repeat times CONSECUTIVELY
      (Heritrix's path-repetition trap rule — echo loops);
    - n_params: query parameters (cross-product traps);
    - session_like: a session-id query key, or an opaque >=24-hex-char
      token value (per-visitor URL minting).

    Map-only: every signal is a codegen'd string expression over the
    URL column; no joins, no shuffles, no Python.
    """
    url = F.col(url_col)
    path = _path(url)
    depth = F.when(path == "", F.lit(0)).otherwise(
        F.length(path) - F.length(F.replace(path, F.lit("/"), F.lit("")))
    )
    # backreference: a captured segment immediately re-matched
    # min_repeat-1 more times, ending at a boundary. Java regex on the
    # Spark side; the driver oracle derives the flag analytically.
    repeat_rx = r"/([^/]+)(?:/\1){%d}(?:/|$)" % (min_repeat - 1)
    q = F.regexp_extract(url, r"\?([^#]*)", 1)
    n_params = F.when(q == "", F.lit(0)).otherwise(
        F.length(q) - F.length(F.replace(q, F.lit("&"), F.lit(""))) + 1
    )
    session_like = url.rlike(r"(?i)[?&](?:%s)=" % _SESSION_KEYS) | url.rlike(
        r"[?&][^=&#]*=[0-9a-fA-F]{24,}(?:&|#|$)"
    )
    out = (
        df.withColumn("path_depth", depth.cast("int"))
        .withColumn("seg_repeat", path.rlike(repeat_rx))
        .withColumn("n_params", n_params.cast("int"))
        .withColumn("session_like", session_like)
    )
    return out.withColumn(
        "trapped",
        (F.col("path_depth") > max_depth)
        | F.col("seg_repeat")
        | (F.col("n_params") > max_params)
        | F.col("session_like"),
    )


def trap_filter(
    df: DataFrame,
    url_col: str = "url",
    max_depth: int = 16,
    max_params: int = 8,
    min_repeat: int = 3,
) -> DataFrame:
    """Drop trapped URLs, keep the caller's schema (flags are internal
    to the gate). The scheduler applies this to discovered outlinks."""
    flagged = url_trap_flags(
        df, url_col=url_col, max_depth=max_depth,
        max_params=max_params, min_repeat=min_repeat,
    )
    return flagged.filter(~F.col("trapped")).drop(
        "path_depth", "seg_repeat", "n_params", "session_like", "trapped"
    )
