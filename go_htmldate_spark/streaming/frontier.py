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
