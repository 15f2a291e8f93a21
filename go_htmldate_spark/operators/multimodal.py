"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as BinaryType columns with a metadata
struct. The Spark-side plumbing (schemas, Arrow batch shapes,
mapInPandas signatures, partition sizing) is real and tested.

Codecs: formats the Python STANDARD LIBRARY can decode — uncompressed
24-bit BMP, binary PPM (P6), 16-bit PCM WAV — are decoded for REAL
(header parse + full pixel/sample walk; see decode_bmp / decode_ppm /
decode_wav). Compressed formats (JPEG/PNG/MP4/...) stay honestly
STUBBED — this container has no image/audio libraries — behind
`_decode_image_bytes`'s deterministic fake, flagged in `decode_ok`.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),       # image|audio|video
        StructField("payload", BinaryType()),     # opaque encoded bytes
        StructField("mime", StringType()),
        StructField("width", IntegerType()),      # typed metadata
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("feat_dim", IntegerType()),
        StructField("feature", StringType()),     # hex-packed feature vector
        StructField("payload_sha", StringType()),  # sha256 hex of raw payload
        StructField("decode_ok", StringType()),
    ]
)


def synth_media(spark, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = hash-derived bytes."""
    return spark.range(n_rows).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.abs(F.xxhash64(F.lit(seed), "id")) % 3).cast("int") + 1,
        ).alias("kind"),
        F.encode(F.sha2(F.concat(F.lit(seed), F.col("id")), 256), "UTF-8").alias(
            "payload"
        ),
        F.lit("application/octet-stream").alias("mime"),
        ((F.abs(F.xxhash64(F.lit(seed + 1), "id")) % 1920) + 16).cast("int").alias("width"),
        ((F.abs(F.xxhash64(F.lit(seed + 2), "id")) % 1080) + 16).cast("int").alias("height"),
        ((F.abs(F.xxhash64(F.lit(seed + 3), "id")) % 600000)).cast("int").alias("duration_ms"),
    )


def synth_media_arith(spark, n_rows: int) -> DataFrame:
    """Oracle-checkable media table: every column a pure-arithmetic
    function of the id (kind = id%3, duration_ms = (id*37)%60000) so a
    SQL oracle can re-derive downstream plans (e.g. frame sampling)."""
    i = F.col("id")
    return spark.range(n_rows).select(
        i.alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (i % 3).cast("int") + 1,
        ).alias("kind"),
        F.encode(F.sha2(F.concat(F.lit("m"), i), 256), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        ((i * 13) % 1920 + 16).cast("int").alias("width"),
        ((i * 29) % 1080 + 16).cast("int").alias("height"),
        ((i * 37) % 60000).cast("int").alias("duration_ms"),
    )


# ---------------------------------------------------------------------------
# Real stdlib codecs (no external libraries).
#
# Encoders exist so tests/benches can synthesize genuinely-encoded
# payloads with closed-form pixel laws; decoders parse the container
# headers for real (dimensions come from the FILE, not the metadata
# columns) and walk every pixel/sample.
# ---------------------------------------------------------------------------


def encode_bmp(width: int, height: int, r: int, g_base: int, b: int) -> bytes:
    """Uncompressed 24-bit bottom-up BI_RGB BMP. Pixel at row-major
    index k (top-left origin) is (r, g_base + k, b) — the caller must
    keep g_base + width*height - 1 <= 255."""
    row_pad = (-(width * 3)) % 4
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up storage order
        row = bytearray()
        for x in range(width):
            k = y * width + x
            row += bytes((b, g_base + k, r))  # BGR on disk
        row += b"\x00" * row_pad
        rows.append(bytes(row))
    pixels = b"".join(rows)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels),
        2835, 2835, 0, 0,
    )
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + len(dib) + len(pixels), 0, 0, 14 + len(dib)
    )
    return header + dib + pixels


def encode_ppm(width: int, height: int, r: int, g_base: int, b: int) -> bytes:
    """Binary PPM (P6, maxval 255) with the same pixel law as
    encode_bmp, stored top-down in RGB order."""
    body = bytearray()
    for k in range(width * height):
        body += bytes((r, g_base + k, b))
    return b"P6\n%d %d\n255\n" % (width, height) + bytes(body)


def encode_wav(n_samples: int, rate: int, base: int) -> bytes:
    """16-bit PCM mono WAV; sample k = base + k (caller keeps the ramp
    inside int16)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(
            struct.pack(f"<{n_samples}h", *(base + k for k in range(n_samples)))
        )
    return buf.getvalue()


def decode_bmp(payload: bytes) -> dict:
    """Parse a BITMAPINFOHEADER-family 24-bit uncompressed BMP: header
    fields from the file, then a full pixel walk (bottom-up unless
    biHeight < 0) accumulating per-channel sums and value extrema."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size < 40:
        raise ValueError("BITMAPCOREHEADER unsupported")
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant bpp={bpp} comp={compression}")
    top_down = height < 0
    height = abs(height)
    row_stride = width * 3 + ((-(width * 3)) % 4)
    if data_off + row_stride * height > len(payload):
        raise ValueError("truncated BMP pixel array")
    sum_r = sum_g = sum_b = 0
    v_min, v_max = 255, 0
    for row_i in range(height):
        src_row = row_i if top_down else height - 1 - row_i
        off = data_off + src_row * row_stride
        row = payload[off : off + width * 3]
        sum_b += sum(row[0::3])
        sum_g += sum(row[1::3])
        sum_r += sum(row[2::3])
        v_min = min(v_min, min(row))
        v_max = max(v_max, max(row))
    return {
        "width": width, "height": height,
        "sum_c0": sum_r, "sum_c1": sum_g, "sum_c2": sum_b,
        "v_min": v_min, "v_max": v_max,
    }


def decode_ppm(payload: bytes) -> dict:
    """Parse a binary P6 PPM: whitespace/comment-tolerant header, then
    a full RGB pixel walk."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval
    width, height, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    body = payload[pos : pos + width * height * 3]
    if len(body) < width * height * 3:
        raise ValueError("truncated PPM raster")
    return {
        "width": width, "height": height,
        "sum_c0": sum(body[0::3]), "sum_c1": sum(body[1::3]),
        "sum_c2": sum(body[2::3]),
        "v_min": min(body), "v_max": max(body),
    }


def decode_wav(payload: bytes) -> dict:
    """Parse a PCM WAV with the stdlib wave module (RIFF chunk walk,
    fmt validation) and unpack every sample: count, rate, sum, extrema."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getcomptype() != "NONE" or w.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM supported")
        nch, rate, n = w.getnchannels(), w.getframerate(), w.getnframes()
        samples = struct.unpack(f"<{n * nch}h", w.readframes(n))
    return {
        "n_samples": n, "sample_rate": rate, "n_channels": nch,
        "sum_c0": sum(samples),
        "v_min": min(samples) if samples else None,
        "v_max": max(samples) if samples else None,
    }


def sniff_media(payload: bytes) -> str:
    """Magic-byte container sniff for the formats this module can
    genuinely decode; everything else reports 'unknown'."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return "unknown"


def synth_media_stdlib(spark, n_rows: int) -> DataFrame:
    """Media table whose payloads are REAL encoded bytes (BMP / PPM /
    WAV by id % 3) with pure-arithmetic pixel/sample laws, so a SQL
    oracle can re-derive every decoded statistic in closed form:

      bmp/ppm: w = 4 + id%5, h = 3 + id%4, pixel k = (id%256,
               (id*7)%200 + k, (id*13)%256)  [g ramp stays <= 246+47]
      wav:     n = 64 + id%64, rate 16000, sample k = (id*11)%1000-500+k
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = ("bmp", "ppm", "wav")[i % 3]
                if kind == "wav":
                    n = 64 + i % 64
                    payload = encode_wav(n, 16000, (i * 11) % 1000 - 500)
                    w = h = None
                    dur = n * 1000 // 16000
                else:
                    w, h = 4 + i % 5, 3 + i % 4
                    enc = encode_bmp if kind == "bmp" else encode_ppm
                    payload = enc(w, h, i % 256, (i * 7) % 200, (i * 13) % 256)
                    dur = None
                rows.append(
                    (i, "audio" if kind == "wav" else "image", payload,
                     {"bmp": "image/bmp", "ppm": "image/x-portable-pixmap",
                      "wav": "audio/wav"}[kind], w, h, dur)
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "payload", "mime",
                         "width", "height", "duration_ms"],
            )

    return spark.range(n_rows).mapInPandas(gen, MEDIA_SCHEMA)


STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("codec", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("sum_c0", LongType()),
        StructField("sum_c1", LongType()),
        StructField("sum_c2", LongType()),
        StructField("v_min", LongType()),
        StructField("v_max", LongType()),
        StructField("decode_ok", StringType()),
    ]
)

_STATS_COLS = [f.name for f in STATS_SCHEMA.fields]


def extract_media_stats(media: DataFrame) -> DataFrame:
    """mapInPandas REAL decode over stdlib-decodable payloads: sniff the
    container by magic bytes, parse its header, walk every pixel/sample.
    Unknown containers (JPEG/MP4/...) degrade to an honest
    `decode_ok='stub:unknown-codec'` row — never a batch failure."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                base = dict.fromkeys(_STATS_COLS)
                base["media_id"] = int(mid)
                try:
                    raw = bytes(payload)
                    codec = sniff_media(raw)
                    base["codec"] = codec
                    if codec == "wav":
                        # n_samples counts FRAMES; sum/extrema run over
                        # all interleaved samples (n_samples*n_channels
                        # values) — n_channels stays in the row so a
                        # consumer can reconcile (mean = sum_c0 /
                        # (n_samples*n_channels))
                        base.update(decode_wav(raw))
                        base["decode_ok"] = "ok"
                    elif codec in ("bmp", "ppm"):
                        dec = decode_bmp if codec == "bmp" else decode_ppm
                        base.update(dec(raw))
                        base["decode_ok"] = "ok"
                    else:
                        base["decode_ok"] = "stub:unknown-codec"
                except Exception as e:  # codec errors must not kill the batch
                    base["decode_ok"] = f"error:{type(e).__name__}"
                rows.append(tuple(base[c] for c in _STATS_COLS))
            yield pd.DataFrame(rows, columns=_STATS_COLS)

    return media.select("media_id", "payload").mapInPandas(run, STATS_SCHEMA)


def _decode_image_bytes(payload: bytes, width: int, height: int) -> list[float]:
    """Feature decode: stdlib-decodable containers (BMP/PPM/WAV) produce
    an 8-dim feature from REAL decoded statistics; anything else falls
    back to the deterministic hash fake (a real deployment calls
    PIL/ffmpeg there) so the distributed plumbing stays testable.

    Raises NotImplementedError for kinds a real codec would reject."""
    if payload is None:
        raise NotImplementedError("no payload")
    codec = sniff_media(payload)
    if codec in ("bmp", "ppm"):
        d = (decode_bmp if codec == "bmp" else decode_ppm)(payload)
        n = d["width"] * d["height"]
        return [
            d["width"] / 4096.0, d["height"] / 4096.0,
            d["sum_c0"] / (255.0 * n), d["sum_c1"] / (255.0 * n),
            d["sum_c2"] / (255.0 * n), d["v_min"] / 255.0,
            d["v_max"] / 255.0, 1.0,
        ]
    if codec == "wav":
        d = decode_wav(payload)
        n = max(d["n_samples"], 1)
        return [
            d["n_samples"] / 1e6, d["sample_rate"] / 1e6,
            d["sum_c0"] / (32768.0 * n),
            (d["v_min"] or 0) / 32768.0, (d["v_max"] or 0) / 32768.0,
            d["n_channels"] / 8.0, 0.0, 2.0,
        ]
    h = hashlib.sha256(payload).digest()
    return [v / 255.0 for v in h[:8]]


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, per-batch decode
    loop, never fails a batch on one bad payload."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload, w, h in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                try:
                    raw = bytes(payload)
                    # width/height metadata are hints only (audio rows
                    # carry none); the real decoders read the container
                    feat = _decode_image_bytes(
                        raw,
                        int(w) if w is not None and not pd.isna(w) else 0,
                        int(h) if h is not None and not pd.isna(h) else 0,
                    )
                    out.append(
                        (
                            int(mid),
                            len(feat),
                            struct.pack(f"{len(feat)}f", *feat).hex(),
                            hashlib.sha256(raw).hexdigest(),
                            "ok",
                        )
                    )
                except NotImplementedError as e:
                    out.append((int(mid), 0, "", "", f"stub:{e}"))
                except Exception as e:  # codec errors must not kill the batch
                    out.append((int(mid), 0, "", "", f"error:{type(e).__name__}"))
            yield pd.DataFrame(
                out,
                columns=["media_id", "feat_dim", "feature", "payload_sha", "decode_ok"],
            )

    cols = ["media_id", "payload", "width", "height"]
    return media.select(*cols).mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explode timestamps natively so the
    (stubbed) per-frame decode receives one row per frame — the shuffle
    and fan-out shape is the real thing even though decode is fake."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
