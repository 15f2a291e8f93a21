"""Partitioned cuckoo URL-seen filter [north-rule: "Bloom/cuckoo"].

Same state-table contract as plans/bloom.py — one row per partition
(partition_id, table binary, n_items, saturated) keyed by
pmod(url_hash, P) — but a cuckoo filter instead of a bloom: 1-byte
fingerprints in B buckets × S slots, supporting DELETION (a bloom
cannot un-set bits) and denser occupancy at equal false-positive rate.

Soundness contract (matches the bloom's): NO false negatives, ever.
- insert failure (eviction chain exhausted at high load) flips the
  partition's `saturated` flag; a saturated partition answers
  maybe_seen=True for everything — degenerate but sound, and the
  scheduler's exact anti-join backstop keeps correctness regardless.
- merge re-inserts the RHS fingerprints; cuckoo tables are mergeable
  without the original keys because the alternate bucket is
  i2 = i1 XOR H(fingerprint) (partial-key cuckoo hashing, Fan et al.,
  "Cuckoo Filter: Practically Better Than Bloom", CoNEXT'14).
- delete removes one copy of a fingerprint; only delete keys that were
  inserted (standard cuckoo-filter precondition).

Probe is numpy-vectorized (gather on 4+4 slots per key); insert/delete
walk a Python loop per partition inside applyInPandas — state
maintenance off the hot path, bounded by per-round scheduled counts.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

CUCKOO_SCHEMA = StructType(
    [
        StructField("partition_id", IntegerType(), False),
        StructField("table", BinaryType(), False),
        StructField("n_items", LongType(), False),
        StructField("saturated", BooleanType(), False),
    ]
)

SLOTS = 4
MAX_KICKS = 500
DEFAULT_BUCKETS = 1 << 15  # 32k buckets × 4 slots × 1B = 128 KiB / partition


def _require_pow2(n_buckets: int) -> None:
    """The alt-bucket map i XOR H(fp) is an involution (alt(alt(i)) == i)
    only when n_buckets is a power of two; any other size silently makes
    relocated/merged fingerprints unfindable (false negatives).  Fail
    loudly instead."""
    if n_buckets <= 0 or (n_buckets & (n_buckets - 1)) != 0:
        raise ValueError(
            f"cuckoo n_buckets must be a power of two, got {n_buckets}"
        )


def _fingerprint(h: np.ndarray) -> np.ndarray:
    """Nonzero 1-byte fingerprint from the high hash bits."""
    return ((h.astype(np.uint64) >> np.uint64(40)) % np.uint64(255) + np.uint64(1)).astype(
        np.uint8
    )


def _i1(h: np.ndarray, n_buckets: int) -> np.ndarray:
    return (h.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int64)


def _alt(i: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    # H(fp): odd multiplier scramble of the fingerprint byte.  n_buckets
    # is validated power-of-two, so masking keeps XOR an involution
    # (alt(alt(i)) == i) — required for lookups after eviction/merge.
    mask = np.uint64(n_buckets - 1)
    hfp = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & mask
    return ((i.astype(np.uint64) ^ hfp) & mask).astype(np.int64)


def _insert_one(table: np.ndarray, fp: int, i1: int, n_buckets: int, rng_state: int) -> bool:
    """Insert one fingerprint; returns False when the eviction chain is
    exhausted (caller marks the partition saturated)."""
    i2 = int(_alt(np.array([i1]), np.array([fp], dtype=np.uint8), n_buckets)[0])
    for idx in (i1, i2):
        row = table[idx]
        empty = np.nonzero(row == 0)[0]
        if len(empty):
            row[empty[0]] = fp
            return True
    # evict: bounded random walk (deterministic LCG so runs reproduce)
    idx = i1 if rng_state % 2 == 0 else i2
    cur = np.uint8(fp)
    state = rng_state
    for _ in range(MAX_KICKS):
        state = (state * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        slot = state % SLOTS
        cur, table[idx][slot] = table[idx][slot], cur
        idx = int(_alt(np.array([idx]), np.array([cur], dtype=np.uint8), n_buckets)[0])
        row = table[idx]
        empty = np.nonzero(row == 0)[0]
        if len(empty):
            row[empty[0]] = cur
            return True
    return False


def partition_of(url_hash_col, n_partitions: int):
    return F.pmod(url_hash_col, F.lit(n_partitions)).cast("int")


def build_cuckoo(
    hashes: DataFrame,
    n_partitions: int,
    n_buckets: int = DEFAULT_BUCKETS,
    hash_col: str = "url_hash",
) -> DataFrame:
    _require_pow2(n_buckets)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        table = np.zeros((n_buckets, SLOTS), dtype=np.uint8)
        h = pdf[hash_col].to_numpy()
        saturated = False
        fps = _fingerprint(h)
        i1s = _i1(h, n_buckets)
        for k in range(len(h)):
            if not _insert_one(table, int(fps[k]), int(i1s[k]), n_buckets, int(h[k]) & 0xFFFFFFFF):
                saturated = True
                break
        return pd.DataFrame(
            {
                "partition_id": [int(pdf["partition_id"].iloc[0])],
                "table": [table.tobytes()],
                "n_items": [len(h)],
                "saturated": [saturated],
            }
        )

    with_pid = hashes.select(
        F.col(hash_col), partition_of(F.col(hash_col), n_partitions).alias("partition_id")
    )
    return with_pid.groupBy("partition_id").applyInPandas(build, CUCKOO_SCHEMA)


def merge_cuckoo(
    state_a: DataFrame, state_b: DataFrame, n_buckets: int = DEFAULT_BUCKETS
) -> DataFrame:
    """Partition-wise merge by re-inserting the RHS fingerprints (the
    alternate bucket is recoverable from (bucket, fp) alone)."""
    _require_pow2(n_buckets)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = None
        n = 0
        saturated = False
        for _, row in pdf.iterrows():
            t = np.frombuffer(row["table"], dtype=np.uint8).reshape(n_buckets, SLOTS).copy()
            n += int(row["n_items"])
            saturated = saturated or bool(row["saturated"])
            if acc is None:
                acc = t
                continue
            occ_i, occ_s = np.nonzero(t)
            for i, s in zip(occ_i, occ_s):
                if not _insert_one(acc, int(t[i, s]), int(i), n_buckets, int(i) * 31 + int(s)):
                    saturated = True
                    break
        return pd.DataFrame(
            {
                "partition_id": [int(pdf["partition_id"].iloc[0])],
                "table": [acc.tobytes()],
                "n_items": [n],
                "saturated": [saturated],
            }
        )

    both = state_a.unionByName(state_b)
    return both.groupBy("partition_id").applyInPandas(merge, CUCKOO_SCHEMA)


def delete_cuckoo(
    state: DataFrame,
    hashes: DataFrame,
    n_partitions: int,
    n_buckets: int = DEFAULT_BUCKETS,
    hash_col: str = "url_hash",
) -> DataFrame:
    """Remove one fingerprint copy per key (keys must have been
    inserted — the standard cuckoo-filter deletion precondition)."""
    _require_pow2(n_buckets)
    keyed = hashes.select(
        F.col(hash_col), partition_of(F.col(hash_col), n_partitions).alias("partition_id")
    ).groupBy("partition_id")

    def delete(key, del_pdf: pd.DataFrame, state_pdf: pd.DataFrame) -> pd.DataFrame:
        if state_pdf.empty:
            return pd.DataFrame(
                columns=["partition_id", "table", "n_items", "saturated"]
            ).astype({"partition_id": "int32", "n_items": "int64", "saturated": "bool"})
        row = state_pdf.iloc[0]
        table = np.frombuffer(row["table"], dtype=np.uint8).reshape(n_buckets, SLOTS).copy()
        h = del_pdf[hash_col].to_numpy() if not del_pdf.empty else np.array([], dtype=np.int64)
        fps = _fingerprint(h)
        i1s = _i1(h, n_buckets)
        i2s = _alt(i1s, fps, n_buckets)
        removed = 0
        for k in range(len(h)):
            done = False
            for idx in (int(i1s[k]), int(i2s[k])):
                slots = np.nonzero(table[idx] == fps[k])[0]
                if len(slots):
                    table[idx][slots[0]] = 0
                    removed += 1
                    done = True
                    break
            # absent fingerprint: precondition violated for this key; skip
        return pd.DataFrame(
            {
                "partition_id": [int(row["partition_id"])],
                "table": [table.tobytes()],
                "n_items": [max(0, int(row["n_items"]) - removed)],
                "saturated": [bool(row["saturated"])],
            }
        )

    return keyed.cogroup(state.groupBy("partition_id")).applyInPandas(
        delete, CUCKOO_SCHEMA
    )


def probe_cuckoo(
    candidates: DataFrame,
    state: DataFrame,
    n_partitions: int,
    n_buckets: int = DEFAULT_BUCKETS,
    hash_col: str = "url_hash",
) -> DataFrame:
    """candidates + maybe_seen flag; vectorized 8-slot gather per key.
    Missing partition ⇒ definitely new; saturated partition ⇒ all maybe."""
    _require_pow2(n_buckets)
    spark = candidates.sparkSession
    rows = state.collect()
    tables = {
        int(r["partition_id"]): (
            np.frombuffer(r["table"], dtype=np.uint8).reshape(n_buckets, SLOTS),
            bool(r["saturated"]),
        )
        for r in rows
    }
    bc = spark.sparkContext.broadcast(tables)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def maybe_seen(h: pd.Series) -> pd.Series:
        lut = bc.value
        hv = h.to_numpy()
        pid = (hv % n_partitions + n_partitions) % n_partitions
        out = np.zeros(len(hv), dtype=bool)
        for p in np.unique(pid):
            entry = lut.get(int(p))
            if entry is None:
                continue
            table, saturated = entry
            mask = pid == p
            if saturated:
                out[mask] = True
                continue
            hh = hv[mask]
            fp = _fingerprint(hh)
            i1 = _i1(hh, n_buckets)
            i2 = _alt(i1, fp, n_buckets)
            hit = (table[i1] == fp[:, None]).any(axis=1) | (
                table[i2] == fp[:, None]
            ).any(axis=1)
            out[mask] = hit
        return pd.Series(out)

    return candidates.withColumn("maybe_seen", maybe_seen(F.col(hash_col)))


def _probe_table(
    table: np.ndarray | None, saturated: bool, h: np.ndarray, n_buckets: int
) -> np.ndarray:
    """Vectorized membership check of hashes against one shard table."""
    if table is None:
        return np.zeros(len(h), dtype=bool)
    if saturated:
        return np.ones(len(h), dtype=bool)
    fp = _fingerprint(h)
    i1 = _i1(h, n_buckets)
    i2 = _alt(i1, fp, n_buckets)
    return (table[i1] == fp[:, None]).any(axis=1) | (
        table[i2] == fp[:, None]
    ).any(axis=1)


def probe_cuckoo_cogrouped(
    candidates: DataFrame,
    state: DataFrame,
    n_partitions: int,
    n_buckets: int = DEFAULT_BUCKETS,
    hash_col: str = "url_hash",
) -> DataFrame:
    """Probe without broadcasting: cogroup candidates with their state
    shard on partition_id — the 10^10-URL path (mirrors
    bloom.probe_blooms_cogrouped): shard tables stay on executors, the
    driver never holds P × B × S bytes, candidates shuffle once on the
    same key the state is partitioned by. Missing shard ⇒ definitely
    new; saturated shard ⇒ all maybe (sound, backstopped by the exact
    anti-join)."""
    _require_pow2(n_buckets)
    out_schema = f"{hash_col} long, maybe_seen boolean"

    def probe(key, cand_pdf: pd.DataFrame, state_pdf: pd.DataFrame) -> pd.DataFrame:
        h = cand_pdf[hash_col].to_numpy()
        seen = np.zeros(len(h), dtype=bool)
        # normally one row per shard; an unmerged union is still sound —
        # membership in ANY table counts (tables can't be OR'd like
        # bloom bitsets, so probe each)
        for _, row in state_pdf.iterrows():
            t = np.frombuffer(row["table"], dtype=np.uint8).reshape(
                n_buckets, SLOTS
            )
            seen |= _probe_table(t, bool(row["saturated"]), h, n_buckets)
        return pd.DataFrame({hash_col: h, "maybe_seen": seen})

    cand_keyed = candidates.select(
        F.col(hash_col),
        partition_of(F.col(hash_col), n_partitions).alias("partition_id"),
    ).groupBy("partition_id")
    state_keyed = state.groupBy("partition_id")
    flags = cand_keyed.cogroup(state_keyed).applyInPandas(probe, out_schema)
    return candidates.join(flags, hash_col)
