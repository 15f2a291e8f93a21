"""Spark-side extraction tests: staged plan correctness on the synthetic
corpus, fast-path gating, and plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from go_htmldate_spark.operators.extract import extract_dates
from go_htmldate_spark.options import Options
from go_htmldate_spark.sources.pages import synth_pages


@pytest.fixture(scope="module")
def extracted(spark):
    pages = synth_pages(spark, 500, seed=42)
    return extract_dates(pages, Options()).cache()


def test_all_planted_stages_recovered(extracted):
    rows = (
        extracted.withColumn("ok", F.col("date") == F.col("expected_date"))
        .groupBy("planted_stage")
        .agg(F.count("*").alias("n"), F.sum(F.col("ok").cast("int")).alias("ok"))
        .collect()
    )
    by_stage = {r["planted_stage"]: (r["n"], r["ok"]) for r in rows}
    assert set(by_stage) == {
        "url", "meta_published", "meta_modified", "jsonld", "time_tag",
        "abbr", "div_class", "idio", "copyright", "none",
    }
    for stage, (n, ok) in by_stage.items():
        assert n > 10, f"stage {stage} undersampled"
        assert ok == n, f"stage {stage}: {ok}/{n} matched"


def test_original_flavor(spark):
    pages = synth_pages(spark, 300, seed=7)
    out = extract_dates(pages, Options(use_original_date=True))
    bad = out.filter(F.col("date") != F.col("expected_date_original")).count()
    assert bad == 0


def test_deterministic_generator(spark):
    a = synth_pages(spark, 100, seed=42).select("url", "text").collect()
    b = synth_pages(spark, 100, seed=42).select("url", "text").collect()
    assert a == b


def test_fast_path_in_plan(spark):
    """URL-stage rows must resolve without Python: the staged plan nulls
    html before the ArrowEvalPython node."""
    pages = synth_pages(spark, 50, seed=42)
    plan = extract_dates(pages, Options())._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan  # UDF present for unresolved rows
    # the gate: html only flows into the UDF behind the url-date CASE WHEN
    assert "CASE WHEN" in plan


def test_schema(extracted):
    for col in ["date", "datetime", "has_time", "has_tz", "tz_offset", "src_string"]:
        assert col in extracted.columns
    # pass-through columns preserved
    for col in ["url", "warc_ts", "html", "text", "lang"]:
        assert col in extracted.columns


# -- charset sniffing (legacy-encoding crawl pages) -------------------------

_LATIN_PAGE = (
    '<html><head><meta http-equiv="Content-Type" '
    'content="text/html; charset=iso-8859-1"/><title>Müller</title></head>'
    '<body><p>Die Bäckerei feierte.</p>'
    '<div class="post-date">15.03.2019</div></body></html>'
)


def test_sniff_decode_unit():
    from go_htmldate_spark.operators.extract import sniff_decode

    latin = _LATIN_PAGE.encode("iso-8859-1")
    assert "Müller" in sniff_decode(latin)          # meta-charset path
    assert sniff_decode("<p>ok</p>".encode("utf-8")) == "<p>ok</p>"
    bom = "﻿<p>Ã¼</p>".encode("utf-8")          # BOM wins over content
    assert sniff_decode(bom) == "<p>Ã¼</p>"
    utf16 = "<p>dátum</p>".encode("utf-16")          # BOM'd utf-16
    assert "dátum" in sniff_decode(utf16)
    # undeclared legacy bytes: strict utf-8 fails → cp1252 fallback
    raw = "© 2020 Bäcker".encode("cp1252")
    assert sniff_decode(raw) == "© 2020 Bäcker"


def test_extract_latin1_page_end_to_end(spark):
    from pyspark.sql.types import BinaryType, StringType, StructField, StructType

    schema = StructType([
        StructField("url", StringType()),
        StructField("html", BinaryType()),
    ])
    rows = [
        ("https://legacy.example.org/posts/a", _LATIN_PAGE.encode("iso-8859-1")),
        ("https://legacy.example.org/posts/b", _LATIN_PAGE.encode("utf-8")),
    ]
    df = spark.createDataFrame(rows, schema)
    got = {r.url: r.date for r in extract_dates(df, Options()).collect()}
    # both encodings must extract the same planted date
    assert got["https://legacy.example.org/posts/a"] == "2019-03-15"
    assert got["https://legacy.example.org/posts/b"] == "2019-03-15"


def test_time_mode_staged_equals_unstaged(spark):
    """extract_time=True keeps the native URL fast path (new in r4):
    staged output must be row-identical to the all-Python unstaged run
    over the time corpus — including the URL-resolved rows that now stay
    native (time-free URLs) or ship empty html (maybe-time URLs)."""
    from go_htmldate_spark.operators.extract import extract_dates
    from go_htmldate_spark.options import Options
    from go_htmldate_spark.sources.pages import synth_pages_time

    pages = synth_pages_time(spark, 300).cache()
    opts = Options(extract_time=True)
    cols = ["url", "date", "datetime", "has_time", "has_tz", "tz_offset", "src_string"]
    fast = {r["url"]: r for r in extract_dates(pages, opts).select(cols).collect()}
    slow = {r["url"]: r for r in
            extract_dates(pages, opts, staged=False).select(cols).collect()}
    assert fast == slow and len(fast) == 300


def test_time_mode_url_carrying_time_routes_to_kernel(spark):
    """URL-resolved rows whose URL could match a findTime pattern must
    fall through to the real kernel (empty-html short-circuit) and
    produce the reference's findTime-on-srcString result."""
    from go_htmldate_spark.operators.extract import extract_dates
    from go_htmldate_spark.options import Options

    rows = [
        # ISO time with tz inside the URL: findTime finds it
        ("https://ex.org/2020/05/06/live-12:30:01Z", "<html></html>"),
        # French 7h08 form inside the slug
        ("https://ex.org/2020/05/06/show-7h08", "<html></html>"),
        # time-free URL: fully native
        ("https://ex.org/2020/05/06/plain-article", "<html></html>"),
    ]
    pages = spark.createDataFrame(rows, ["url", "html"])
    opts = Options(extract_time=True)
    got = {r["url"]: r for r in extract_dates(pages, opts).collect()}
    slow = {r["url"]: r for r in
            extract_dates(pages, opts, staged=False).collect()}
    for u in got:
        for f in ["date", "datetime", "has_time", "has_tz", "tz_offset", "src_string"]:
            assert got[u][f] == slow[u][f], (u, f, got[u][f], slow[u][f])
    iso = got["https://ex.org/2020/05/06/live-12:30:01Z"]
    assert iso["has_time"] and iso["has_tz"] and iso["tz_offset"] == 0
    assert iso["datetime"] == "2020-05-06 12:30:01"
    fr = got["https://ex.org/2020/05/06/show-7h08"]
    assert fr["has_time"] and fr["datetime"] == "2020-05-06 07:08:00"
    plain = got["https://ex.org/2020/05/06/plain-article"]
    assert not plain["has_time"] and plain["datetime"] == "2020-05-06 00:00:00"


def test_time_mode_unicode_whitespace_url_routes_to_kernel(spark):
    """The native time-free gate must reject URLs containing UNICODE
    whitespace (Python's \\s, not Java's ASCII \\s): '7\\u00a0h\\u00a008'
    is a French time to the kernel once normalize_spaces splits on
    U+00A0 — staged output must equal unstaged for such URLs."""
    from go_htmldate_spark.operators.extract import extract_dates
    from go_htmldate_spark.options import Options

    rows = [
        ("https://ex.org/2020/05/06/7 h 08", "<html></html>"),
        ("https://ex.org/2020/05/06/foo UTC", "<html></html>"),
        ("https://ex.org/2020/05/06/x +0500", "<html></html>"),
    ]
    pages = spark.createDataFrame(rows, ["url", "html"])
    opts = Options(extract_time=True)
    got = {r["url"]: r for r in extract_dates(pages, opts).collect()}
    slow = {r["url"]: r for r in
            extract_dates(pages, opts, staged=False).collect()}
    for u in got:
        for f in ["date", "datetime", "has_time", "has_tz", "tz_offset", "src_string"]:
            assert got[u][f] == slow[u][f], (u, f, got[u][f], slow[u][f])
    fr = got["https://ex.org/2020/05/06/7 h 08"]
    assert fr["has_time"] and fr["datetime"] == "2020-05-06 07:08:00"
    tz = got["https://ex.org/2020/05/06/foo UTC"]
    assert tz["has_tz"] and tz["tz_offset"] == 0
