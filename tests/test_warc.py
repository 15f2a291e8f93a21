"""WARC source: pure-stdlib parser + Spark binaryFile/mapInPandas reader
(sources/warc.py). Fixtures are written with the module's own writer —
the reader is the unit under test; the driver-level `warc_roundtrip`
query additionally oracle-checks the chain against an independent
DuckDB reconstruction."""

from __future__ import annotations

import gzip
import io

import pytest
from pyspark.sql import functions as F

from go_htmldate_spark.sources.warc import (
    http_response_payload,
    iter_warc_records,
    read_warc,
    split_http_response,
    warc_to_pages,
    write_warc_record,
)


def _one_file(records, gzip_member=False) -> bytes:
    out = io.BytesIO()
    for i, (url, body) in enumerate(records):
        write_warc_record(
            out, "response", http_response_payload(body), url=url,
            warc_date=f"2024-01-01T00:00:{i:02d}Z",
            record_id=f"urn:uuid:{i}", gzip_member=gzip_member,
        )
    return out.getvalue()


def test_parser_roundtrip_plain_and_gzip_members():
    raw = _one_file([("https://a.example/x", b"<html>a</html>"),
                     ("https://b.example/y", b"<html>b</html>")])
    for data in (raw, _one_file(
        [("https://a.example/x", b"<html>a</html>"),
         ("https://b.example/y", b"<html>b</html>")], gzip_member=True)):
        recs = list(iter_warc_records(data))
        assert [r["headers"]["warc-target-uri"] for r in recs] == [
            "https://a.example/x", "https://b.example/y"]
        status, ctype, body = split_http_response(recs[0]["payload"])
        assert (status, ctype, body) == (200, "text/html", b"<html>a</html>")


def test_parser_whole_file_gzip():
    raw = _one_file([("https://a.example/x", b"<p>hi</p>")])
    gz = io.BytesIO()
    with gzip.GzipFile(fileobj=gz, mode="wb", mtime=0) as g:
        g.write(raw)
    recs = list(iter_warc_records(gz.getvalue()))
    assert len(recs) == 1 and recs[0]["headers"]["warc-type"] == "response"


def test_parser_case_insensitive_headers_and_payload_binary_safety():
    # hand-built record with odd header casing and CRLF bytes inside the payload
    body = b"\r\n\r\nbinary\x00stuff\r\n"
    payload = http_response_payload(body)
    blob = (
        b"WARC/1.1\r\n"
        b"warc-type: response\r\n"
        b"WARC-TARGET-URI: https://c.example/z\r\n"
        b"CONTENT-LENGTH: " + str(len(payload)).encode() + b"\r\n"
        b"\r\n" + payload + b"\r\n\r\n"
    )
    recs = list(iter_warc_records(blob))
    assert len(recs) == 1
    assert recs[0]["headers"]["warc-target-uri"] == "https://c.example/z"
    assert split_http_response(recs[0]["payload"])[2] == body


def test_parser_truncated_record_fails_loudly():
    raw = _one_file([("https://a.example/x", b"<html>a</html>")])
    with pytest.raises(ValueError, match="truncated"):
        list(iter_warc_records(raw[:-20]))


def test_parser_rejects_garbage_version_line():
    with pytest.raises(ValueError, match="version"):
        list(iter_warc_records(b"NOT-A-WARC\r\nfoo: bar\r\n\r\n"))


def test_read_warc_spark_roundtrip(spark, tmp_path):
    # two files, mixed record types; reader keeps responses only
    f1 = tmp_path / "shard-0.warc.gz"
    out = io.BytesIO()
    write_warc_record(out, "warcinfo", b"software: test", gzip_member=True,
                      content_type="application/warc-fields")
    write_warc_record(out, "response", http_response_payload(b"<html>one</html>"),
                      url="https://w.example/1",
                      warc_date="2024-01-01T00:00:01Z", gzip_member=True)
    write_warc_record(out, "request", b"GET /2 HTTP/1.1\r\n\r\n",
                      url="https://w.example/2", gzip_member=True,
                      content_type="application/http; msgtype=request")
    f1.write_bytes(out.getvalue())
    f2 = tmp_path / "shard-1.warc.gz"
    out2 = io.BytesIO()
    write_warc_record(out2, "response", http_response_payload(b"<html>two</html>"),
                      url="https://w.example/2",
                      warc_date="2024-01-01T00:00:02Z", gzip_member=True)
    f2.write_bytes(out2.getvalue())

    df = read_warc(spark, str(tmp_path / "*.warc.gz"))
    rows = {r["url"]: r for r in df.collect()}
    assert set(rows) == {"https://w.example/1", "https://w.example/2"}
    assert bytes(rows["https://w.example/1"]["payload"]) == b"<html>one</html>"
    assert rows["https://w.example/2"]["http_status"] == 200
    assert rows["https://w.example/1"]["warc_type"] == "response"

    pages = warc_to_pages(df).collect()
    assert {str(r["warc_ts"]) for r in pages} == {
        "2024-01-01 00:00:01", "2024-01-01 00:00:02"}
    assert {bytes(r["html"]) for r in pages} == {
        b"<html>one</html>", b"<html>two</html>"}


def test_read_warc_feeds_extraction_kernel(spark, tmp_path):
    """The ingestion edge composes with the cascade: WARC response html
    → extract_dates finds the planted meta date."""
    from go_htmldate_spark.operators.extract import extract_dates

    html = (b'<html><head><meta property="article:published_time" '
            b'content="2021-05-04"></head><body>x</body></html>')
    out = io.BytesIO()
    write_warc_record(out, "response", http_response_payload(html),
                      url="https://k.example/post", gzip_member=True,
                      warc_date="2024-01-01T00:00:00Z")
    (tmp_path / "s.warc.gz").write_bytes(out.getvalue())
    pages = warc_to_pages(read_warc(spark, str(tmp_path / "s.warc.gz")))
    got = extract_dates(pages.withColumn("html", pages["html"].cast("string"))).collect()
    assert len(got) == 1 and got[0]["date"] == "2021-05-04"


def test_write_warc_shards_roundtrip(spark, tmp_path):
    """Export sink → reader parity: a pages DataFrame written as WARC
    shards reads back row-identical (url, ts, html), and the layout is
    deterministic across reruns."""
    import hashlib
    import pathlib

    from go_htmldate_spark.sources.warc import write_warc_shards

    pages = spark.createDataFrame(
        [(f"https://s.example/p{i}", f"2024-02-0{1 + i % 3}T00:00:{i:02d}",
          f"<html>{i}</html>".encode()) for i in range(20)],
        "url string, warc_ts string, html binary",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts", "yyyy-MM-dd'T'HH:mm:ss"))

    out1, out2 = tmp_path / "w1", tmp_path / "w2"
    write_warc_shards(pages, str(out1), n_shards=3)
    write_warc_shards(pages, str(out2), n_shards=3)

    def digest(d):
        return {p.name: hashlib.md5(p.read_bytes()).hexdigest()
                for p in pathlib.Path(d).glob("*.warc.gz")}

    assert digest(out1) == digest(out2) and len(digest(out1)) >= 1

    back = read_warc(spark, str(out1 / "*.warc.gz"))
    got = {(r["url"], str(r["warc_date"]), bytes(r["payload"]))
           for r in back.select("url", "warc_date", "payload").collect()}
    want = {(f"https://s.example/p{i}",
             f"2024-02-0{1 + i % 3}T00:00:{i:02d}Z",
             f"<html>{i}</html>".encode()) for i in range(20)}
    # payload comes back through the HTTP split
    got_bodies = {(u, d, b) for (u, d, b) in got}
    assert got_bodies == want


def test_write_wet_shards_roundtrip(spark, tmp_path):
    """WET export sink → reader parity: text written as conversion
    records reads back row-identical through wet_to_docs (including
    non-ASCII through the UTF-8 chain), layout deterministic across
    reruns, and response-mode readers skip conversion records."""
    import hashlib
    import pathlib

    from go_htmldate_spark.sources.warc import (
        wet_to_docs, write_wet_shards,
    )

    pages = spark.createDataFrame(
        [(f"https://s.example/p{i}", f"2024-02-0{1 + i % 3}T00:00:{i:02d}",
          f"döc {i} — café 中文") for i in range(20)],
        "url string, warc_ts string, text string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts", "yyyy-MM-dd'T'HH:mm:ss"))

    out1, out2 = tmp_path / "w1", tmp_path / "w2"
    write_wet_shards(pages, str(out1), n_shards=3)
    write_wet_shards(pages, str(out2), n_shards=3)

    def digest(d):
        return {p.name: hashlib.md5(p.read_bytes()).hexdigest()
                for p in pathlib.Path(d).glob("*.warc.wet.gz")}

    assert digest(out1) == digest(out2) and len(digest(out1)) >= 1

    back = wet_to_docs(
        read_warc(spark, str(out1 / "*.warc.wet.gz"),
                  warc_types=("conversion",))
    )
    got = {(r["url"], str(r["warc_ts"]), r["text"]) for r in back.collect()}
    want = {(f"https://s.example/p{i}",
             f"2024-02-0{1 + i % 3} 00:00:{i:02d}",
             f"döc {i} — café 中文") for i in range(20)}
    assert got == want
    # a response-mode reader must not surface conversion records
    assert read_warc(spark, str(out1 / "*.warc.wet.gz")).count() == 0


def test_warc_roundtrip_property_fuzz():
    """Property: write_warc_record → iter_warc_records is the identity
    on (url, date, type, payload) for arbitrary binary payloads —
    including payloads containing CRLF runs, gzip magic, and WARC
    version strings — in both plain and gzip-member layouts."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    payloads = st.lists(
        st.binary(min_size=0, max_size=200), min_size=1, max_size=6)

    @settings(max_examples=60, deadline=None)
    @given(payloads=payloads, gz=st.booleans())
    def check(payloads, gz):
        out = io.BytesIO()
        for i, p in enumerate(payloads):
            # adversarial framing bytes inside the payload
            p = b"\r\n\r\nWARC/1.0\r\n\x1f\x8b" + p
            write_warc_record(out, "resource", p,
                              url=f"https://f.example/{i}",
                              warc_date=f"2024-03-01T00:00:{i:02d}Z",
                              record_id=f"urn:uuid:{i}",
                              content_type="application/octet-stream",
                              gzip_member=gz)
        recs = list(iter_warc_records(out.getvalue()))
        assert len(recs) == len(payloads)
        for i, (p, r) in enumerate(zip(payloads, recs)):
            assert r["headers"]["warc-target-uri"] == f"https://f.example/{i}"
            assert r["headers"]["warc-date"] == f"2024-03-01T00:00:{i:02d}Z"
            assert r["headers"]["warc-type"] == "resource"
            assert r["payload"] == b"\r\n\r\nWARC/1.0\r\n\x1f\x8b" + p

    check()


def test_gzip_tail_garbage_fails_loudly():
    """A gzip WARC stream cut at a member boundary or carrying non-gzip
    bytes between members must raise, not silently drop the tail
    records; classic NUL tape padding stays accepted."""
    from go_htmldate_spark.sources.warc import iter_warc_records

    out = io.BytesIO()
    write_warc_record(out, "response", http_response_payload(b"<html>a</html>"),
                      url="https://w.example/a", gzip_member=True)
    good = out.getvalue()

    with pytest.raises(ValueError):
        list(iter_warc_records(good + b"not gzip at all"))
    # truncated second member
    out2 = io.BytesIO()
    write_warc_record(out2, "response", http_response_payload(b"<html>b</html>"),
                      url="https://w.example/b", gzip_member=True)
    with pytest.raises(ValueError):
        list(iter_warc_records(good + out2.getvalue()[:10]))
    # NUL padding is fine
    assert len(list(iter_warc_records(good + b"\x00" * 512))) == 1


def test_warc_to_pages_fractional_seconds(spark, tmp_path):
    """WARC 1.1 fractional-second WARC-Date values must parse (to
    second precision), not null out warc_ts."""
    from go_htmldate_spark.sources.warc import read_warc, warc_to_pages

    out = io.BytesIO()
    write_warc_record(out, "response", http_response_payload(b"<html>f</html>"),
                      url="https://w.example/frac", gzip_member=True,
                      warc_date="2024-01-02T03:04:05.123456Z")
    p = tmp_path / "frac.warc.gz"
    p.write_bytes(out.getvalue())
    pages = warc_to_pages(read_warc(spark, str(p))).collect()
    assert len(pages) == 1 and pages[0]["warc_ts"] is not None
    assert pages[0]["warc_ts"].second == 5


def test_write_warc_shards_overwrite_clears_stale(spark, tmp_path):
    """Re-exporting into the same directory with fewer shards must not
    leave stale part files from the previous layout behind."""
    from go_htmldate_spark.sources.warc import read_warc, write_warc_shards

    out_dir = str(tmp_path / "shards")
    rows = [(f"https://s.example/{i}", None, b"<html>x</html>") for i in range(40)]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")
    write_warc_shards(df, out_dir, n_shards=8)
    first = {r["url"] for r in read_warc(spark, out_dir + "/*.warc.gz").collect()}
    assert len(first) == 40

    small = df.filter(F.col("url").endswith("/1"))
    write_warc_shards(small, out_dir, n_shards=2)
    again = [r["url"] for r in read_warc(spark, out_dir + "/*.warc.gz").collect()]
    assert again == ["https://s.example/1"]


def test_surt_key_transform(spark):
    """SURT urlkey: host labels reversed comma-joined (domain subtrees
    collate), www-prefix stripped, path lowered, query params sorted,
    fragment-free; non-default ports kept, :80/:443 dropped."""
    from pyspark.sql import functions as F

    from go_htmldate_spark.plans.canonical import surt_key

    cases = [
        ("https://www.Example.com/A/b?z=1&a=2", "com,example)/a/b?a=2&z=1"),
        ("http://news.sub.Example.org/Path", "org,example,sub,news)/path"),
        ("https://example.com", "com,example)/"),
        ("https://www2.example.com/x#frag", "com,example)/x"),
        ("https://example.com/x?b=2", "com,example)/x?b=2"),
        ("http://example.com:8080/x", "com,example:8080)/x"),
        ("https://example.com:443/x", "com,example)/x"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["k"] for r in
           df.select(surt_key(F.col("url")).alias("k")).collect()]
    assert got == [k for _, k in cases]


def test_cdx_index_offsets_and_order(spark, tmp_path):
    """The CDX sidecar's (offset, filename) bookkeeping is REAL: for
    every index row, parsing the named shard file at exactly that byte
    offset yields the record whose body sha256/length the row claims —
    the property no SQL oracle can check (offsets depend on gzip
    member sizes). Output arrives (urlkey, ts14)-sorted."""
    import hashlib

    from go_htmldate_spark.sources.warc import cdx_index, read_warc

    # 2 shards, 3 records each, urls crafted so urlkey order differs
    # from write order; one non-response record to be skipped
    urls = [
        "https://z.example/1", "https://a.example/2", "https://m.example/3",
        "https://a.example/1", "https://z.example/0", "https://b.example/9",
    ]
    for i in range(2):
        out = io.BytesIO()
        if i == 0:
            write_warc_record(out, "warcinfo", b"software: t",
                              gzip_member=True,
                              content_type="application/warc-fields")
        for j, u in enumerate(urls[i * 3:(i + 1) * 3]):
            write_warc_record(
                out, "response",
                http_response_payload(f"<html>{u}</html>".encode()),
                url=u, warc_date=f"2024-02-0{j + 1}T0{i}:00:00Z",
                gzip_member=True,
            )
        (tmp_path / f"shard-{i}.warc.gz").write_bytes(out.getvalue())

    idx = cdx_index(read_warc(spark, str(tmp_path / "*.warc.gz"))).collect()
    assert len(idx) == 6
    # sorted by (urlkey, ts14)
    keys = [(r["urlkey"], r["ts14"]) for r in idx]
    assert keys == sorted(keys)
    assert keys[0][0].startswith("example,a)")
    # every (filename, offset) resolves to the claimed record —
    # offsets address the DECOMPRESSED record stream (the reader's
    # bookkeeping contract), so decompress before seeking
    from go_htmldate_spark.sources.warc import _maybe_decompress
    for r in idx:
        blob = _maybe_decompress((tmp_path / r["filename"]).read_bytes())
        rec = next(iter_warc_records(blob[r["offset"]:]))
        assert rec["headers"]["warc-target-uri"] == r["url"]
        _, _, body = split_http_response(rec["payload"])
        assert hashlib.sha256(body).hexdigest() == r["digest"]
        assert len(body) == r["length"]


def test_write_dedup_warc_shards(spark, tmp_path):
    """Dedup-aware WARC sink (write_dedup_warc_shards): revisit rows
    are stored payload-free with WARC-Profile / WARC-Refers-To-Date /
    WARC-Payload-Digest headers, response rows keep their payload; the
    reader surfaces both; the archive is physically smaller than a
    dedup-less export of the same fetches."""
    import glob
    import os

    from go_htmldate_spark.plans.revisits import REVISIT_PROFILE
    from go_htmldate_spark.sources.warc import (
        read_warc, write_dedup_warc_shards,
    )

    body = b"<html>" + b"x" * 2000 + b"</html>"
    rows = [
        ("https://a.example/1", "2026-08-01T00:00:00Z", "revisit",
         "d1", "2026-07-01T00:00:00Z", None),
        ("https://a.example/2", "2026-08-01T00:00:00Z", "response",
         "d2", None, bytearray(body)),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_date string, record_type string,"
        " digest string, refers_to_date string, payload binary")
    out = str(tmp_path / "dedup")
    write_dedup_warc_shards(df, out, n_shards=1)
    recs = {r["url"]: r for r in read_warc(
        spark, out + "/*.warc.gz", warc_types=("response", "revisit")
    ).collect()}
    rev = recs["https://a.example/1"]
    assert rev["warc_type"] == "revisit"
    assert rev["warc_profile"] == REVISIT_PROFILE
    assert rev["warc_refers_to_date"] == "2026-07-01T00:00:00Z"
    assert bytes(rev["payload"]) == b""
    resp = recs["https://a.example/2"]
    assert resp["warc_type"] == "response"
    assert resp["warc_profile"] is None
    assert bytes(resp["payload"]) == body
    # the dedup shard is materially smaller than storing both bodies
    total = sum(os.path.getsize(f)
                for f in glob.glob(out + "/*.warc.gz"))
    assert total < 2 * len(body)
