"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as BinaryType columns with a metadata
struct. The Spark-side plumbing (schemas, Arrow batch shapes,
mapInPandas signatures, partition sizing) is real and tested; the
actual codec calls are STUBBED — this container has no image/audio
libraries — behind `_decode_image_bytes`, which produces a
deterministic fake so pipelines are testable end-to-end.
"""

from __future__ import annotations

import hashlib
import struct
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


def _decode_image_bytes(payload: bytes, width: int, height: int) -> list[float]:
    """STUB decode: a real deployment calls PIL/ffmpeg here. This
    deterministic fake derives an 8-dim feature from the payload hash so
    the distributed plumbing (batching, schema, ordering) is testable.

    Raises NotImplementedError for kinds a real codec would reject."""
    if payload is None:
        raise NotImplementedError("no payload")
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
                    feat = _decode_image_bytes(raw, int(w), int(h))
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
