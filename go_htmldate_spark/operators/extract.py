"""The extraction operator: staged native fast path + Arrow-batched UDF.

Physical strategy (SURVEY.md §4.1): the URL-date stage — the first rung
of the reference cascade (core.go:138-144) — runs engine-side as a
whole-stage-codegen'd regexp, so pages whose URL already carries the
date never enter Python. Only unresolved rows reach the pandas UDF
(their html is nulled-in, not re-scanned: one parquet pass, no union
shuffle). This is a manual rewrite Catalyst cannot do itself because
UDFs are opaque to it.
"""

from __future__ import annotations

import re
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..cascade import EMPTY_RESULT, from_html
from ..functions.native import normalize_spaces_col, url_date
from ..options import Options

RESULT_SCHEMA = StructType(
    [
        StructField("date", StringType()),          # 'yyyy-MM-dd' or ''
        StructField("datetime", StringType()),      # wall clock 'yyyy-MM-dd HH:mm:ss'
        StructField("has_time", BooleanType()),
        StructField("has_tz", BooleanType()),
        StructField("tz_offset", IntegerType()),    # seconds east of UTC
        StructField("src_string", StringType()),
    ]
)


def _result_row(res) -> tuple:
    return (
        res.date,
        res.wall_datetime.strftime("%Y-%m-%d %H:%M:%S") if res.wall_datetime else "",
        res.has_time,
        res.has_tz,
        res.tz_offset,
        res.src_string,
    )


_EMPTY_ROW = _result_row(EMPTY_RESULT)


# -- charset sniffing (WHATWG-style, real-crawl HTML is full of legacy
# encodings). The Go reference CLI feeds raw bytes straight to
# x/net/html (cmd/go-htmldate/main.go:112-137 → core.go:50 dom.Parse),
# i.e. assumes UTF-8 — sniffing is a strict extension for crawl
# robustness: valid UTF-8 decodes identically, so reference parity on
# the eval corpus is untouched.

_META_CHARSET = re.compile(
    rb"""charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.I
)

# WHATWG encoding table highlights: legacy latin labels map to cp1252
_ENC_ALIASES = {
    "iso-8859-1": "cp1252", "latin-1": "cp1252", "latin1": "cp1252",
    "us-ascii": "cp1252", "ascii": "cp1252", "windows-1252": "cp1252",
    "iso-8859-9": "cp1254", "windows-1254": "cp1254",
    "utf8": "utf-8",
}


def sniff_decode(raw: bytes) -> str:
    """bytes → str: BOM, then <meta charset> within the first 1024 bytes
    (the HTML5 prescan), then strict UTF-8, then the WHATWG legacy-web
    fallback cp1252."""
    if raw[:3] == b"\xef\xbb\xbf":
        return raw[3:].decode("utf-8", "replace")
    if raw[:2] == b"\xff\xfe" or raw[:2] == b"\xfe\xff":
        return raw.decode("utf-16", "replace")
    m = _META_CHARSET.search(raw[:1024])
    if m:
        label = m.group(1).decode("ascii", "replace").lower()
        enc = _ENC_ALIASES.get(label, label)
        if enc not in ("utf-8",):
            try:
                return raw.decode(enc, "replace")
            except LookupError:
                pass  # unknown label: fall through to utf-8/cp1252
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("cp1252", "replace")


def make_extract_udf(opts: Options):
    """Build the flagship pandas UDF. Iterator-of-batches form amortizes
    per-batch setup; opts is closure-captured (shipped once per worker)."""
    opts = opts.with_defaults()

    @pandas_udf(RESULT_SCHEMA)
    def extract(
        it: Iterator[tuple[pd.Series, pd.Series]],
    ) -> Iterator[pd.DataFrame]:
        from ..gctune import GcPacer

        cols = list(RESULT_SCHEMA.fieldNames())
        # DOM trees are cyclic (parent links): pace the collector to one
        # gen-0 pass per 256 docs instead of ~1/page (gctune.py)
        with GcPacer() as pacer:
            for html_s, url_s in it:
                rows = []
                for html, url in zip(html_s, url_s):
                    if html is None:
                        rows.append(_EMPTY_ROW)  # engine-side resolved row
                        continue
                    if isinstance(html, (bytes, bytearray, memoryview)):
                        html = sniff_decode(bytes(html))
                    try:
                        res = from_html(html, opts.with_url(url or ""))
                    except Exception:
                        res = EMPTY_RESULT  # never fail a whole Arrow batch
                    pacer.tick()
                    rows.append(_result_row(res))
                yield pd.DataFrame(rows, columns=cols)

    return extract


def extract_dates(
    pages: DataFrame,
    opts: Options = Options(),
    url_col: str = "url",
    html_col: str = "html",
    staged: bool = True,
) -> DataFrame:
    """pages(url, html, …) → + (date, datetime, has_time, has_tz,
    tz_offset, src_string), preserving all input columns."""
    opts = opts.with_defaults()
    udf = make_extract_udf(opts)
    url = F.col(url_col)

    # The native fast path replicates the URL stage only when it
    # short-circuits the whole cascade in the reference: URL present,
    # extractor not deferred, and no time extraction requested (findTime
    # inspects the raw string Python-side).
    use_fast_path = staged and not opts.defer_url_extractor and not opts.extract_time

    if not use_fast_path:
        res = udf(F.col(html_col), url)
        return pages.withColumn("_r", res).select("*", "_r.*").drop("_r")

    u_date = url_date(url, opts.min_date, opts.max_date)
    resolved = u_date.isNotNull()

    gated_html = F.when(~resolved, F.col(html_col))  # NULL html for resolved rows
    res = udf(gated_html, url)

    native = F.struct(
        F.date_format(u_date, "yyyy-MM-dd").alias("date"),
        F.concat(F.date_format(u_date, "yyyy-MM-dd"), F.lit(" 00:00:00")).alias(
            "datetime"
        ),
        F.lit(False).alias("has_time"),
        F.lit(False).alias("has_tz"),
        F.lit(None).cast(IntegerType()).alias("tz_offset"),
        normalize_spaces_col(url).alias("src_string"),
    )

    combined = F.when(resolved, native).otherwise(res)
    return pages.withColumn("_r", combined).select("*", "_r.*").drop("_r")
