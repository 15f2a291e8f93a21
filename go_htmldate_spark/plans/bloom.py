"""Partitioned Bloom URL-seen filter [north-rule].

State table: one row per partition — (partition_id int, bloom binary,
n_items long). Partitioning key is pmod(url_hash, P), the same url_hash
(xxhash64 of the canonical URL) used everywhere, so probe inputs
co-partition with the state.

Scale story (10^10 URLs): P partitions × m bits each; build/merge is an
applyInPandas over co-grouped hashes (numpy-vectorized bit setting, no
per-row Python); the probe is a broadcast of the state rows followed by
a vectorized membership test. The bloom is a PRE-filter: rows it rules
out skip the exact anti-join entirely (the common case for new URLs);
only maybe-seen rows hit the exact `seen` table, so correctness never
depends on the filter (no false negatives by construction).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

BLOOM_SCHEMA = StructType(
    [
        StructField("partition_id", IntegerType(), False),
        StructField("bloom", BinaryType(), False),
        StructField("n_items", LongType(), False),
    ]
)

DEFAULT_BITS = 1 << 20  # 128 KiB per partition
DEFAULT_K = 6


def _positions(hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """k probe positions per hash, double-hashing from the 64-bit key."""
    uh = hashes.astype(np.uint64)
    h1 = uh % np.uint64(m_bits)
    h2 = ((uh >> np.uint64(33)) | np.uint64(1)) % np.uint64(m_bits)
    i = np.arange(k, dtype=np.uint64)[:, None]
    return (h1[None, :] + i * h2[None, :]) % np.uint64(m_bits)  # (k, n)


def _set_bits(bits: np.ndarray, pos: np.ndarray) -> None:
    flat = pos.reshape(-1)
    np.bitwise_or.at(bits, (flat >> np.uint64(3)).astype(np.int64),
                     (np.uint8(1) << (flat & np.uint64(7)).astype(np.uint8)))


def _test_bits(bits: np.ndarray, pos: np.ndarray) -> np.ndarray:
    byte_idx = (pos >> np.uint64(3)).astype(np.int64)
    bit_msk = (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
    hit = (bits[byte_idx] & bit_msk) != 0  # (k, n)
    return hit.all(axis=0)


def partition_of(url_hash_col, n_partitions: int):
    return F.pmod(url_hash_col, F.lit(n_partitions)).cast("int")


def build_blooms(
    hashes: DataFrame,
    n_partitions: int,
    m_bits: int = DEFAULT_BITS,
    k: int = DEFAULT_K,
    hash_col: str = "url_hash",
) -> DataFrame:
    """hashes(url_hash) → bloom state rows, one per partition."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        h = pdf[hash_col].to_numpy()
        if len(h):
            _set_bits(bits, _positions(h, m_bits, k))
        return pd.DataFrame(
            {
                "partition_id": [int(pdf["partition_id"].iloc[0])],
                "bloom": [bits.tobytes()],
                "n_items": [len(h)],
            }
        )

    with_pid = hashes.select(
        F.col(hash_col), partition_of(F.col(hash_col), n_partitions).alias("partition_id")
    )
    return with_pid.groupBy("partition_id").applyInPandas(build, BLOOM_SCHEMA)


def merge_blooms(state_a: DataFrame, state_b: DataFrame) -> DataFrame:
    """OR two state tables partition-wise (outer: partitions may be new)."""

    def merge(key, pdfs: Iterable[pd.DataFrame]) -> pd.DataFrame:
        acc = None
        n = 0
        for pdf in pdfs:
            for _, row in pdf.iterrows():
                b = np.frombuffer(row["bloom"], dtype=np.uint8)
                acc = b.copy() if acc is None else (acc | b)
                n += int(row["n_items"])
        return pd.DataFrame(
            {"partition_id": [key[0]], "bloom": [acc.tobytes()], "n_items": [n]}
        )

    both = state_a.unionByName(state_b)
    return both.groupBy("partition_id").applyInPandas(
        lambda pdf: merge((int(pdf["partition_id"].iloc[0]),), [pdf]), BLOOM_SCHEMA
    )


def probe_blooms_cogrouped(
    candidates: DataFrame,
    state: DataFrame,
    n_partitions: int,
    m_bits: int = DEFAULT_BITS,
    k: int = DEFAULT_K,
    hash_col: str = "url_hash",
) -> DataFrame:
    """Probe without broadcasting: cogroup candidates with their state
    shard on partition_id. The 10^10-URL path — state shards stay on
    executors (P × m/8 bytes total never visits the driver), candidates
    shuffle once on the same key the state is partitioned by."""
    out_schema = "url_hash long, maybe_seen boolean"

    def probe(key, cand_pdf: pd.DataFrame, state_pdf: pd.DataFrame) -> pd.DataFrame:
        bits = None
        for blob in state_pdf["bloom"]:
            b = np.frombuffer(blob, dtype=np.uint8)
            bits = b if bits is None else (bits | b)
        h = cand_pdf[hash_col].to_numpy()
        if bits is None:
            seen = np.zeros(len(h), dtype=bool)
        else:
            seen = _test_bits(bits, _positions(h, m_bits, k))
        return pd.DataFrame({hash_col: h, "maybe_seen": seen})

    cand_keyed = candidates.select(
        F.col(hash_col), partition_of(F.col(hash_col), n_partitions).alias("partition_id")
    ).groupBy("partition_id")
    state_keyed = state.groupBy("partition_id")
    flags = cand_keyed.cogroup(state_keyed).applyInPandas(probe, out_schema)
    return candidates.join(flags, hash_col)


def probe_blooms(
    candidates: DataFrame,
    state: DataFrame,
    n_partitions: int,
    m_bits: int = DEFAULT_BITS,
    k: int = DEFAULT_K,
    hash_col: str = "url_hash",
) -> DataFrame:
    """candidates + `maybe_seen` flag. Missing state partition ⇒ False
    (definitely new). Broadcast-probe variant: right while the state fits
    in driver/executor memory; use probe_blooms_cogrouped beyond that."""
    spark = candidates.sparkSession
    rows = state.collect()  # P × m/8 bytes; broadcast to executors
    blooms = {int(r["partition_id"]): np.frombuffer(r["bloom"], dtype=np.uint8)
              for r in rows}
    bc = spark.sparkContext.broadcast(blooms)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def maybe_seen(h: pd.Series) -> pd.Series:
        table = bc.value
        hv = h.to_numpy()
        pid = (hv % n_partitions + n_partitions) % n_partitions
        out = np.zeros(len(hv), dtype=bool)
        for p in np.unique(pid):
            bits = table.get(int(p))
            if bits is None:
                continue
            mask = pid == p
            out[mask] = _test_bits(bits, _positions(hv[mask], m_bits, k))
        return pd.Series(out)

    return candidates.withColumn("maybe_seen", maybe_seen(F.col(hash_col)))
