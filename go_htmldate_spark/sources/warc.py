"""WARC source: read Common-Crawl-style WARC files into the pages table.

The north rule's input is an Iceberg/parquet table of Common-Crawl-style
pages; Common Crawl itself ships WARC (ISO 28500) files, so this module
is the ingestion edge: WARC-on-disk → DataFrame in the input_hint shape
(url, warc_ts, html, ...). Pure stdlib parser (no warcio in this
sandbox — the format is simple enough that a from-scratch reader is
~100 lines and auditable).

Scale shape: one WARC file = one task. Common Crawl's convention is
~1 GB gzip per file with each record its own gzip member; members are
not splittable without an external index, so the standard distributed
strategy — what warcio+Spark pipelines and CC's own examples do — is
file-level parallelism: `spark.read.format("binaryFile")` lists the
glob (distributed listing), each task decompresses + parses its file
streaming record-by-record, and `mapInPandas` emits Arrow batches of
records. 100 TB = ~100k files ≫ cores, so file granularity saturates
any cluster; html payloads go straight into Arrow binary columns for
the extraction kernel (operators/extract.py) with no per-row Python
beyond the parser itself.

Format notes (ISO 28500 / WARC 1.0-1.1):
- record = version line 'WARC/1.x\r\n', header lines 'Name: value\r\n',
  blank line, Content-Length payload bytes, '\r\n\r\n' terminator.
- header names are case-insensitive; values may be %-escaped URIs in
  '<...>' (WARC-Record-ID).
- response records carry an HTTP message as payload: status line +
  headers + '\r\n\r\n' + body.
"""

from __future__ import annotations

import gzip
import io
import zlib
from typing import BinaryIO, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

CRLF = b"\r\n"

WARC_SCHEMA = StructType([
    StructField("warc_file", StringType()),
    StructField("record_offset", LongType()),
    StructField("warc_type", StringType()),
    StructField("url", StringType()),
    StructField("warc_date", StringType()),
    StructField("record_id", StringType()),
    StructField("content_type", StringType()),
    StructField("http_status", IntegerType()),
    StructField("http_content_type", StringType()),
    StructField("warc_profile", StringType()),
    StructField("warc_refers_to_date", StringType()),
    StructField("payload", BinaryType()),
])


# ---------------------------------------------------------------------------
# record-level parser (pure stdlib, streaming)
# ---------------------------------------------------------------------------

def _maybe_decompress(data: bytes) -> bytes:
    """Whole-buffer gzip sniff. Handles multi-member gzip (Common
    Crawl's one-member-per-record layout) by looping decompressobj
    over the remaining tail. Fails loudly (like the record parser's
    contract) when bytes remain after the last member that are not a
    further gzip member — a stream cut at a member boundary or with
    interleaved garbage must not silently drop its tail records."""
    if data[:2] != b"\x1f\x8b":
        return data
    # Chunk-fed decompression over a memoryview: the obvious
    # `rest = d.unused_data` loop copies the ENTIRE remaining tail once
    # per gzip member — O(members x bytes), ~31 GB of memcpy for a
    # 50k-member shard (r06 finding; Common Crawl's layout is one
    # member per record). Feeding bounded chunks keeps the per-member
    # overhead at one <=256 KB copy, O(bytes) overall, with identical
    # output and the same loud-failure contract.
    out = []
    mv = memoryview(data)
    pos = 0
    n = len(data)
    chunk_sz = 1 << 18
    while pos < n:
        if bytes(mv[pos:pos + 2]) != b"\x1f\x8b":
            break
        start = pos
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        while not d.eof:
            if pos >= n:
                raise ValueError(
                    "truncated gzip member in WARC stream "
                    f"({n - start} bytes remaining)"
                )
            chunk = mv[pos:pos + chunk_sz]
            out.append(d.decompress(chunk))
            pos += len(chunk)
        out.append(d.flush())
        pos -= len(d.unused_data)  # member ended inside the last chunk
    if pos < n and bytes(mv[pos:]).strip(b"\x00"):  # allow NUL tape padding
        raise ValueError(
            f"{n - pos} non-gzip bytes after last gzip member in WARC stream"
        )
    return b"".join(out)


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """Yield one dict per WARC record: raw headers (lower-cased names)
    plus 'payload' bytes and 'offset' (byte offset in the decompressed
    stream). Tolerates leading/trailing blank lines; raises ValueError
    on a malformed version line or short payload (truncated files fail
    loudly, not silently)."""
    buf = _maybe_decompress(data)
    pos = 0
    n = len(buf)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and buf[pos:pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            return
        offset = pos
        eol = buf.find(CRLF, pos)
        if eol < 0:
            raise ValueError(f"no version line at offset {pos}")
        version = buf[pos:eol].decode("ascii", "replace")
        if not version.startswith("WARC/"):
            raise ValueError(f"bad WARC version line at {pos}: {version!r}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = buf.find(CRLF, pos)
            if eol < 0:
                raise ValueError(f"unterminated header block at {pos}")
            line = buf[pos:eol]
            pos = eol + 2
            if not line:
                break
            # continuation lines (obs-fold) append to the previous value
            if line[:1] in (b" ", b"\t") and headers:
                last = next(reversed(headers))
                headers[last] += " " + line.strip().decode("utf-8", "replace")
                continue
            name, _, value = line.partition(b":")
            headers[name.strip().decode("ascii", "replace").lower()] = (
                value.strip().decode("utf-8", "replace")
            )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError as exc:
            raise ValueError(f"missing/bad Content-Length at {offset}") from exc
        payload = buf[pos:pos + clen]
        if len(payload) != clen:
            raise ValueError(
                f"truncated record at {offset}: want {clen}, have {len(payload)}"
            )
        pos += clen
        yield {"version": version, "offset": offset,
               "headers": headers, "payload": payload}


def split_http_response(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content-type, body) from an HTTP response message; a
    payload with no HTTP preamble comes back as (None, None, payload)."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return None, None, payload
    head, body = payload[:sep], payload[sep + 4:]
    lines = head.split(CRLF)
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        status = None
    ctype = None
    for line in lines[1:]:
        name, _, value = line.partition(b":")
        if name.strip().lower() == b"content-type":
            ctype = value.strip().decode("latin-1")
            break
    return status, ctype, body


def _clean_record_id(raw: str | None) -> str | None:
    if raw is None:
        return None
    return raw.strip().removeprefix("<").removesuffix(">")


# ---------------------------------------------------------------------------
# writer (deterministic fixtures + export sink)
# ---------------------------------------------------------------------------

def write_warc_record(
    out: BinaryIO,
    warc_type: str,
    payload: bytes,
    url: str | None = None,
    warc_date: str = "2024-01-01T00:00:00Z",
    record_id: str = "urn:uuid:00000000-0000-0000-0000-000000000000",
    content_type: str = "application/http; msgtype=response",
    gzip_member: bool = False,
    extra_headers: list[tuple[str, str]] | None = None,
) -> None:
    """One spec-shaped record; gzip_member wraps it in its own gzip
    member (the Common Crawl layout). extra_headers (e.g.
    WARC-Profile / WARC-Refers-To-Date on revisit records) are
    emitted between the record id and Content-Type, in order."""
    head = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Date: " + warc_date.encode(),
        b"WARC-Record-ID: <" + record_id.encode() + b">",
        b"Content-Type: " + content_type.encode(),
        b"Content-Length: " + str(len(payload)).encode(),
    ]
    for i, (k, v) in enumerate(extra_headers or []):
        head.insert(4 + i, k.encode() + b": " + v.encode())
    if url is not None:
        head.insert(2, b"WARC-Target-URI: " + url.encode())
    blob = CRLF.join(head) + CRLF + CRLF + payload + CRLF + CRLF
    if gzip_member:
        gz = io.BytesIO()
        # mtime=0 + fixed filename keep the bytes deterministic
        with gzip.GzipFile(fileobj=gz, mode="wb", mtime=0) as g:
            g.write(blob)
        blob = gz.getvalue()
    out.write(blob)


def http_response_payload(
    body: bytes, status: int = 200, content_type: str = "text/html"
) -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


# ---------------------------------------------------------------------------
# Spark reader
# ---------------------------------------------------------------------------

def read_warc(
    spark: SparkSession,
    path: str,
    warc_types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """WARC glob → one row per record of the requested types.

    binaryFile handles distributed listing + whole-file bytes (CC files
    are ~1 GB — well under binaryFile's 2 GB ceiling and sized to be
    one task's unit of work); the parser streams records out of each
    file inside mapInPandas, so parallelism is file-granular and the
    only Python cost is the parse itself, Arrow-batched on the way out.
    """
    types = set(warc_types) if warc_types else None
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for rec in iter_warc_records(bytes(content)):
                    h = rec["headers"]
                    wtype = h.get("warc-type", "")
                    if types is not None and wtype not in types:
                        continue
                    status, http_ctype, body = split_http_response(rec["payload"])
                    rows.append((
                        fpath, rec["offset"], wtype,
                        h.get("warc-target-uri"), h.get("warc-date"),
                        _clean_record_id(h.get("warc-record-id")),
                        h.get("content-type"), status, http_ctype,
                        h.get("warc-profile"),
                        h.get("warc-refers-to-date"), body,
                    ))
            yield pd.DataFrame(rows, columns=[f.name for f in WARC_SCHEMA.fields])

    return files.mapInPandas(parse, WARC_SCHEMA)


def warc_to_pages(records: DataFrame) -> DataFrame:
    """Project response records into the input_hint pages shape
    (url, warc_ts, html binary); text/lang are downstream concerns
    (extraction kernel / lang-ID operator)."""
    # WARC 1.1 permits fractional seconds of ANY digit count in
    # WARC-Date (wget/warcio emit them); Spark's S pattern wants an
    # exact digit count, so strip the fraction first (second precision
    # is what every consumer here keys on) instead of nulling every
    # 1.1 timestamp
    return records.filter(F.col("warc_type") == "response").select(
        F.col("url"),
        F.to_timestamp(
            F.regexp_replace(F.col("warc_date"), r"\.\d+", ""),
            "yyyy-MM-dd'T'HH:mm:ssX",
        ).alias("warc_ts"),
        F.col("payload").alias("html"),
    )


# ---------------------------------------------------------------------------
# distributed writer sink
# ---------------------------------------------------------------------------

def write_warc_shards(
    pages: DataFrame,
    out_dir: str,
    url_col: str = "url",
    html_col: str = "html",
    ts_col: str = "warc_ts",
    n_shards: int | None = None,
) -> None:
    """pages(url, warc_ts, html) → WARC shard files, one per partition
    (the export sink mirroring read_warc): each task streams its rows
    into `part-{pid:05d}.warc.gz` with one gzip member per record —
    re-readable by any WARC consumer, including read_warc.

    Deterministic layout: rows are range-partitioned + sorted on url,
    so the same input always produces the same shard contents (gzip
    mtime pinned to 0). Scale shape: no shuffle beyond the one
    repartitionByRange (needed for determinism; pass n_shards=None to
    keep the input partitioning and skip it), no driver involvement —
    each executor writes its own file.

    Filesystem contract: `out_dir` must be a filesystem shared between
    the driver and every executor (tasks open() the path directly, and
    the driver pre-cleans stale `part-*.warc.gz` with a glob — both
    assume one namespace). Local mode and NFS/shared-mount clusters
    qualify; for object stores, export via an fsspec-style URI writer
    or the task output committer instead — this sink does not speak
    those protocols.
    """
    def write_row(out, pid, r):
        body = bytes(r[2]) if r[2] is not None else b""
        ts = r[1]
        write_warc_record(
            out, "response", http_response_payload(body),
            url=r[0],
            warc_date=ts.strftime("%Y-%m-%dT%H:%M:%SZ") if ts else
            "1970-01-01T00:00:00Z",
            record_id=f"urn:warc-export:{pid}:{r[0]}",
            gzip_member=True,
        )

    cols = [F.col(url_col), F.col(ts_col).cast("timestamp"),
            F.col(html_col).cast("binary")]
    _write_shard_files(pages.select(*cols), out_dir, url_col, n_shards,
                       "warc", write_row)


def _write_shard_files(df, out_dir, url_col, n_shards, ext, write_row):
    """Shared shard-file scaffolding for the WARC/WET export sinks:
    optional deterministic range partition + sort on url, stale-part
    cleanup, tmp-file atomic rename, empty-partition skip. Same
    shared-filesystem contract as write_warc_shards."""
    import os

    import glob as _glob

    if n_shards is not None:
        df = (df.repartitionByRange(n_shards, F.col(url_col))
                .sortWithinPartitions(url_col))
    os.makedirs(out_dir, exist_ok=True)
    # overwrite semantics: a previous export with MORE partitions (or
    # data where this run's partition is empty) would otherwise leave
    # stale part files behind, and a glob read of the dir would mix
    # two corpora — clear our own naming scheme first
    for stale in _glob.glob(os.path.join(out_dir, f"part-*.{ext}.gz")):
        os.remove(stale)

    def dump(pid, rows):
        path = os.path.join(out_dir, f"part-{pid:05d}.{ext}.gz")
        tmp = path + ".tmp"
        wrote = False
        with open(tmp, "wb") as out:
            for r in rows:
                wrote = True
                write_row(out, pid, r)
        if wrote:
            os.replace(tmp, path)
        else:
            os.remove(tmp)
        return iter(())

    df.rdd.mapPartitionsWithIndex(dump).count()


def write_wet_shards(
    pages: DataFrame,
    out_dir: str,
    url_col: str = "url",
    text_col: str = "text",
    ts_col: str = "warc_ts",
    n_shards: int | None = None,
) -> None:
    """pages(url, warc_ts, text) → WET shard files: WARC `conversion`
    records whose block is the extracted plain text (Content-Type
    text/plain, UTF-8) — the Common Crawl WET layout, the artifact a
    text-only training pipeline ingests instead of raw WARC. Together
    with write_warc_shards and cdx_index this completes the CC
    artifact trio (WARC / WET / CDX). Records are re-readable with
    ``read_warc(spark, glob, warc_types=("conversion",))`` — a
    non-HTTP payload passes through split_http_response unsplit.

    Same determinism (range partition + sort on url, gzip mtime 0) and
    shared-filesystem contract as write_warc_shards."""
    def write_row(out, pid, r):
        text = r[2] if r[2] is not None else ""
        ts = r[1]
        write_warc_record(
            out, "conversion", text.encode("utf-8"),
            url=r[0],
            warc_date=ts.strftime("%Y-%m-%dT%H:%M:%SZ") if ts else
            "1970-01-01T00:00:00Z",
            record_id=f"urn:wet-export:{pid}:{r[0]}",
            content_type="text/plain",
            gzip_member=True,
        )

    cols = [F.col(url_col), F.col(ts_col).cast("timestamp"),
            F.col(text_col).cast("string")]
    _write_shard_files(pages.select(*cols), out_dir, url_col, n_shards,
                       "warc.wet", write_row)


def wet_to_docs(records: DataFrame) -> DataFrame:
    """read_warc conversion records → (url, warc_ts, text): the WET
    ingest projection, decoding the UTF-8 text block. Mirror of
    warc_to_pages for the text-only artifact."""
    return records.filter(F.col("warc_type") == "conversion").select(
        F.col("url"),
        F.to_timestamp(
            F.regexp_replace(F.col("warc_date"), r"\.\d+", ""),
            "yyyy-MM-dd'T'HH:mm:ssX",
        ).alias("warc_ts"),
        F.decode(F.col("payload"), "UTF-8").alias("text"),
    )


# ---------------------------------------------------------------------------
# CDX index build (the Common-Crawl lookup sidecar)
# ---------------------------------------------------------------------------

def cdx_index(records: DataFrame) -> DataFrame:
    """read_warc response records → CDX index rows (urlkey, ts14, url,
    mime, status, digest, length, offset, filename), sorted by
    (urlkey, ts14) — the Common-Crawl/Internet-Archive lookup sidecar:
    given a URL, find which WARC file and byte offset holds its
    capture. urlkey is the SURT transform (plans/canonical.surt_key)
    so a range scan covers a whole domain subtree; ts14 is the
    14-digit capture timestamp; digest is sha256 hex of the HTTP body
    (this engine's variant of CC's sha1-b32 — sha256 because both
    Spark and the DuckDB oracle compute it natively; disclosed
    format deviation); offset/filename come straight from the reader's
    record bookkeeping.

    Scale shape: everything except the final ordering is computed in
    the scan projection (codegen'd string/hash ops, no Python beyond
    the WARC parse itself); the sort is one range exchange — exactly
    the global order a CDX file needs, and Spark's range partitioner
    writes it shard-parallel. Output is O(records) small rows (no
    payload column survives the projection, so page bytes never enter
    the sort)."""
    from go_htmldate_spark.plans.canonical import surt_key

    r = records.filter(F.col("warc_type") == "response")
    ts14 = F.regexp_replace(
        F.regexp_replace(F.col("warc_date"), r"\.\d+", ""), r"[^0-9]", ""
    )
    mime = F.trim(F.regexp_extract(F.col("http_content_type"), r"^([^;]*)", 1))
    return (
        r.select(
            surt_key(F.col("url")).alias("urlkey"),
            ts14.alias("ts14"),
            "url",
            mime.alias("mime"),
            F.col("http_status").alias("status"),
            F.sha2(F.col("payload"), 256).alias("digest"),
            F.length("payload").cast("long").alias("length"),
            F.col("record_offset").alias("offset"),
            F.regexp_extract(F.col("warc_file"), r"([^/]+)$", 1)
            .alias("filename"),
        )
        .orderBy("urlkey", "ts14")
    )


# ---------------------------------------------------------------------------
# WAT metadata extraction + sink (the third Common-Crawl artifact)
# ---------------------------------------------------------------------------

# Title: plain inner text only ([^<]*), case-insensitive, attributes on
# the tag tolerated. Java regex on the Spark side; oracles rebuild the
# planted values closed-form (same contract as hostgraph.ANCHOR_RX).
TITLE_RX = r"(?is)<title[^>]*>([^<]*)</title>"

# <meta name=... content=...> pairs, name-before-content attribute
# order (the order every CMS emits; content-first tags are skipped —
# disclosed scope bound). Quote-aware attribute scanning identical to
# ANCHOR_RX: quoted values are skipped atomically so a '>' or 'name='
# inside another attribute's value can't hijack the match, and each
# value is delimited by a backreference to its own opening quote.
# Groups: 2 = name, 4 = content.
META_RX = (
    r"""(?is)<meta\s(?:[^>"']|"[^"]*"|'[^']*')*?"""
    r"""name\s*=\s*(["'])((?:(?!\1)[^>])*)\1"""
    r"""(?:[^>"']|"[^"]*"|'[^']*')*?"""
    r"""content\s*=\s*(["'])((?:(?!\3)[^>])*)\3"""
    r"""(?:[^>"']|"[^"]*"|'[^']*')*>"""
)

# Common Crawl's JSON-path notation for an <a href> link in WAT files.
WAT_LINK_PATH = "A@/href"


def wat_metadata(records: DataFrame) -> DataFrame:
    """read_warc response records → one WAT-envelope metadata row per
    capture: WARC header fields (url, warc_date, record_id), HTTP
    response message (status, MIME), payload byte length, and the
    HTML-Metadata block Common Crawl's WAT extractor emits — <title>
    (whitespace-collapsed), <meta name/content> pairs as two aligned
    arrays, and <a href> link targets in document order.

    Scale shape: MAP-ONLY — one projection over the scan, every
    extraction a codegen'd regexp over the decoded payload; page bytes
    are read once and never shuffle, and the output is O(records)
    small rows the downstream WAT sink serializes per-partition.

    Reference anchor: the reference engine parses one document at a
    time (core.go:FromDocument); WAT production is crawl-archive
    tooling the Spark layer adds, completing the WARC / WAT / WET /
    CDX artifact family (write_warc_shards / this / write_wet_shards /
    cdx_index)."""
    from go_htmldate_spark.plans.hostgraph import ANCHOR_RX

    html = F.decode(F.col("payload"), "UTF-8")
    title = F.trim(
        F.regexp_replace(F.regexp_extract(html, TITLE_RX, 1), r"\s+", " ")
    )
    mime = F.trim(F.regexp_extract(F.col("http_content_type"), r"^([^;]*)", 1))
    links = F.regexp_extract_all(html, F.lit(ANCHOR_RX), F.lit(2))
    return records.filter(F.col("warc_type") == "response").select(
        "url",
        "warc_date",
        "record_id",
        F.col("http_status").alias("status"),
        mime.alias("mime"),
        F.octet_length(F.col("payload")).cast("long").alias("payload_len"),
        title.alias("title"),
        F.regexp_extract_all(html, F.lit(META_RX), F.lit(2)).alias("meta_names"),
        F.regexp_extract_all(html, F.lit(META_RX), F.lit(4)).alias(
            "meta_contents"
        ),
        links.alias("links"),
        F.size(links).cast("long").alias("n_links"),
    )


def write_wat_shards(
    meta: DataFrame,
    out_dir: str,
    n_shards: int | None = None,
) -> None:
    """wat_metadata rows → WAT shard files: WARC ``metadata`` records
    whose block is the JSON envelope (Content-Type application/json),
    each carrying WARC-Refers-To pointing at the described capture —
    the Common Crawl WAT layout. Envelope structure follows CC's
    published shape: Envelope → WARC-Header-Metadata +
    Payload-Metadata → HTTP-Response-Metadata → Response-Message /
    Headers / HTML-Metadata (Head.Title, Head.Metas, Links with
    path "A@/href"). JSON is serialized with fixed key order and
    compact separators so the export is byte-deterministic.

    Same determinism (range partition + sort on url, gzip mtime 0,
    stale-part cleanup, tmp-rename) and shared-filesystem contract as
    write_warc_shards. Re-readable via
    ``read_warc(spark, glob, warc_types=("metadata",))`` →
    ``wat_to_metadata``."""
    import json

    cols = ["url", "warc_date", "record_id", "status", "mime",
            "payload_len", "title", "meta_names", "meta_contents", "links"]

    def write_row(out, pid, r):
        (url, warc_date, record_id, status, mime, payload_len, title,
         meta_names, meta_contents, links) = r
        env = {
            "Envelope": {
                "Format": "WARC",
                "WARC-Header-Metadata": {
                    "WARC-Type": "response",
                    "WARC-Target-URI": url,
                    "WARC-Date": warc_date,
                    "WARC-Record-ID": record_id,
                },
                "Payload-Metadata": {
                    "Actual-Content-Length": payload_len,
                    "HTTP-Response-Metadata": {
                        "Response-Message": {"Status": status},
                        "Headers": {"Content-Type": mime},
                        "HTML-Metadata": {
                            "Head": {
                                "Title": title,
                                "Metas": [
                                    {"name": n, "content": c}
                                    for n, c in zip(meta_names or [],
                                                    meta_contents or [])
                                ],
                            },
                            "Links": [
                                {"path": WAT_LINK_PATH, "url": u}
                                for u in (links or [])
                            ],
                        },
                    },
                },
            }
        }
        payload = json.dumps(
            env, separators=(",", ":"), ensure_ascii=True
        ).encode("ascii")
        write_warc_record(
            out, "metadata", payload,
            url=url,
            warc_date=warc_date or "1970-01-01T00:00:00Z",
            record_id=f"urn:wat-export:{pid}:{url}",
            content_type="application/json",
            gzip_member=True,
        )

    _write_shard_files(meta.select(*cols), out_dir, "url", n_shards,
                       "warc.wat", write_row)


def wat_to_metadata(records: DataFrame) -> DataFrame:
    """read_warc metadata records → the wat_metadata column set,
    recovered from the JSON envelope with from_json (JVM-native JSON
    parse, no Python): the WAT ingest projection, mirror of
    warc_to_pages / wet_to_docs for the metadata artifact."""
    from pyspark.sql.types import (
        ArrayType, LongType, StringType, StructField, StructType,
    )

    link_t = StructType([StructField("path", StringType()),
                         StructField("url", StringType())])
    meta_t = StructType([StructField("name", StringType()),
                         StructField("content", StringType())])
    env_t = StructType([StructField("Envelope", StructType([
        StructField("Format", StringType()),
        StructField("WARC-Header-Metadata", StructType([
            StructField("WARC-Type", StringType()),
            StructField("WARC-Target-URI", StringType()),
            StructField("WARC-Date", StringType()),
            StructField("WARC-Record-ID", StringType()),
        ])),
        StructField("Payload-Metadata", StructType([
            StructField("Actual-Content-Length", LongType()),
            StructField("HTTP-Response-Metadata", StructType([
                StructField("Response-Message", StructType([
                    StructField("Status", LongType()),
                ])),
                StructField("Headers", StructType([
                    StructField("Content-Type", StringType()),
                ])),
                StructField("HTML-Metadata", StructType([
                    StructField("Head", StructType([
                        StructField("Title", StringType()),
                        StructField("Metas", ArrayType(meta_t)),
                    ])),
                    StructField("Links", ArrayType(link_t)),
                ])),
            ])),
        ])),
    ]))])

    j = records.filter(F.col("warc_type") == "metadata").select(
        F.from_json(F.decode(F.col("payload"), "UTF-8"), env_t).alias("j")
    )
    hdr = "j.Envelope.`WARC-Header-Metadata`"
    pm = "j.Envelope.`Payload-Metadata`"
    http = f"{pm}.`HTTP-Response-Metadata`"
    html_md = f"{http}.`HTML-Metadata`"
    links = F.col(f"{html_md}.Links")
    return j.select(
        F.col(f"{hdr}.`WARC-Target-URI`").alias("url"),
        F.col(f"{hdr}.`WARC-Date`").alias("warc_date"),
        F.col(f"{hdr}.`WARC-Record-ID`").alias("record_id"),
        F.col(f"{http}.`Response-Message`.Status").cast("int").alias("status"),
        F.col(f"{http}.Headers.`Content-Type`").alias("mime"),
        F.col(f"{pm}.`Actual-Content-Length`").alias("payload_len"),
        F.col(f"{html_md}.Head.Title").alias("title"),
        F.col(f"{html_md}.Head.Metas.name").alias("meta_names"),
        F.col(f"{html_md}.Head.Metas.content").alias("meta_contents"),
        F.transform(links, lambda x: x["url"]).alias("links"),
        F.size(links).cast("long").alias("n_links"),
    )


def write_dedup_warc_shards(
    classified: DataFrame,
    out_dir: str,
    n_shards: int | None = None,
) -> None:
    """revisit-classified fetches → WARC shards with fetch-time storage
    dedup (the Heritrix/IA layout plans/revisits computes the
    classification for): ``response`` rows store their payload;
    ``revisit`` rows store a PAYLOAD-FREE record carrying WARC-Profile
    (identical-payload-digest), WARC-Refers-To-Date (the prior
    capture), and WARC-Payload-Digest (the shared digest) — a
    recurring crawl's archive grows by its delta, not its size.

    Input columns: url, warc_date, record_type ('response'|'revisit'),
    digest, refers_to_date (null on response rows), payload (binary;
    ignored on revisit rows — callers may pass NULL there so revisit
    page bodies never even reach the sink's exchange). Re-readable via
    ``read_warc(spark, glob, warc_types=("response", "revisit"))``;
    the reader surfaces warc_profile / warc_refers_to_date columns.

    Same determinism + shared-filesystem contract as
    write_warc_shards."""
    # import here to avoid a module cycle at import time
    from go_htmldate_spark.plans.revisits import REVISIT_PROFILE

    cols = ["url", "warc_date", "record_type", "digest",
            "refers_to_date", "payload"]

    def write_row(out, pid, r):
        url, warc_date, rtype, digest, refers, payload = r
        date = warc_date or "1970-01-01T00:00:00Z"
        if rtype == "revisit":
            write_warc_record(
                out, "revisit", b"",
                url=url, warc_date=date,
                record_id=f"urn:dedup-export:{pid}:{url}",
                content_type="message/http",
                gzip_member=True,
                extra_headers=[
                    ("WARC-Profile", REVISIT_PROFILE),
                    ("WARC-Refers-To-Date", refers or date),
                    ("WARC-Payload-Digest", f"md5:{digest}"),
                ],
            )
        else:
            write_warc_record(
                out, "response", bytes(payload) if payload else b"",
                url=url, warc_date=date,
                record_id=f"urn:dedup-export:{pid}:{url}",
                content_type="text/html",
                gzip_member=True,
                extra_headers=[("WARC-Payload-Digest", f"md5:{digest}")],
            )

    _write_shard_files(classified.select(*cols), out_dir, "url", n_shards,
                       "warc", write_row)
