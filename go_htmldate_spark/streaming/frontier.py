"""Stateful streaming frontier primitives.

The batch crawl's URL-seen dedup lifted to Structured Streaming with
applyInPandasWithState: discovered URLs stream in, the first occurrence
of each canonical URL passes through, every later occurrence (within a
micro-batch or across them) is dropped. State is partitioned exactly
like the batch bloom (pmod(url_hash, P) — plans/bloom.partition_of), so
a hash never visits two groups and each group's state stays bounded to
its shard.

State representation: the exact seen-hash array per shard (the
correctness-bearing layout; at 10^10 URLs the same hook swaps the array
for the bloom bitset of plans/bloom.py + an exact side table, identical
to the batch design). State survives restarts through the streaming
checkpoint — the streaming analog of the batch snapshot/resume
[north-rule resumability].
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..plans.canonical import canonicalize_url, url_hash

OUT_SCHEMA = "url string, url_hash long"
STATE_SCHEMA = "hashes array<long>"


def _dedup_group(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    for pdf in pdfs:
        keep_rows = []
        for url, h in zip(pdf["url"], pdf["url_hash"]):
            h = int(h)
            if h not in seen:  # also dedups within the micro-batch
                seen.add(h)
                keep_rows.append((url, h))
        if keep_rows:
            yield pd.DataFrame(keep_rows, columns=["url", "url_hash"])
    state.update((list(seen),))


def stream_dedup_urls(urls: DataFrame, n_partitions: int = 16) -> DataFrame:
    """urls(url) streaming DataFrame → first-occurrence-only stream of
    (url, url_hash), canonicalized, stateful across micro-batches."""
    keyed = urls.select(
        canonicalize_url(F.col("url")).alias("url")
    ).select(
        "url", url_hash(F.col("url")).alias("url_hash")
    ).withColumn(
        "shard", F.pmod(F.col("url_hash"), F.lit(n_partitions)).cast("int")
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- bounded-state variant ---------------------------------------------------

BLOOM_STATE_SCHEMA = "bits binary, recent array<long>"


def _make_bloom_dedup(
    m_bits: int, k: int, exact_cap: int, out_cols: list[str] | None = None
):
    """Group function for the bounded-state variant: per-shard state is
    a fixed-size bloom bitset (m_bits/8 bytes, the FULL crawl history)
    plus an exact recent-hash window capped at exact_cap entries.

    Membership: recent-window hit → dup (exact); bloom hit → dup (the
    long tail — wrong with probability ≤ the bloom FPP, the standard
    at-scale dedup trade: state stays O(m + cap) forever instead of
    growing linearly with distinct URLs). The batch scheduler keeps
    exactness via its on-disk anti-join backstop; a pure stream has no
    such table, so the bounded variant is explicitly approximate.

    out_cols selects which input columns the kept rows carry (default
    just (url, url_hash); the streaming crawl loop passes the full page
    payload) — one implementation, so the membership invariants (the
    bloom test against CURRENT bits, the eviction order) stay in sync
    for every caller."""
    import numpy as np

    from ..plans.bloom import _positions, _set_bits, _test_bits

    cols = out_cols or ["url", "url_hash"]

    def dedup(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            bits_bytes, recent_list = state.get
            bits = np.frombuffer(bits_bytes, dtype=np.uint8).copy()
            recent = list(recent_list)
            recent_set = set(recent)
        else:
            bits = np.zeros(m_bits // 8, dtype=np.uint8)
            recent = []
            recent_set = set()
        for pdf in pdfs:
            keep_idx = []
            hs = pdf["url_hash"].to_numpy()
            pos = _positions(hs, m_bits, k)
            for i, h in enumerate(hs):
                h = int(h)
                # bloom test must run against the CURRENT bits: a dup
                # later in the same batch whose hash already aged out of
                # the exact window is only caught by the bits set when
                # its first occurrence was inserted
                if h in recent_set or _test_bits(bits, pos[:, i : i + 1])[0]:
                    continue
                _set_bits(bits, pos[:, i : i + 1])
                recent_set.add(h)
                recent.append(h)
                if len(recent) > exact_cap:
                    recent_set.discard(recent.pop(0))
                keep_idx.append(i)
            if keep_idx:
                yield pdf.iloc[keep_idx][cols]
        state.update((bits.tobytes(), recent))

    return dedup


def stream_dedup_urls_bloom(
    urls: DataFrame,
    n_partitions: int = 16,
    m_bits: int = 1 << 20,
    k: int = 6,
    exact_cap: int = 4096,
) -> DataFrame:
    """Bounded-state streaming URL dedup: same output contract as
    stream_dedup_urls up to the bloom FPP, with per-shard state fixed at
    m_bits/8 bytes + exact_cap longs no matter how many URLs stream
    through — the 10^10-URL shape the exact-array variant can't hold."""
    keyed = urls.select(
        canonicalize_url(F.col("url")).alias("url")
    ).select(
        "url", url_hash(F.col("url")).alias("url_hash")
    ).withColumn(
        "shard", F.pmod(F.col("url_hash"), F.lit(n_partitions)).cast("int")
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        _make_bloom_dedup(m_bits, k, exact_cap),
        outputStructType=OUT_SCHEMA,
        stateStructType=BLOOM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
