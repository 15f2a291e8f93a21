"""Streaming freshness estimation: the Cho & Garcia-Molina change-rate
estimator (plans/recrawl.py) lifted to Structured Streaming.

A long-running crawl does not re-scan its whole fetch history per
round; it folds each new fetch observation into per-URL sufficient
statistics as it happens. The estimator needs exactly five numbers per
URL — (n_intervals, n_changes, first_ts, last_ts, last_sig) — so the
state is tiny and the closed form

    λ̂ = -ln((n - X + 0.5) / (n + 0.5)) / Δ̄t

recomputes per emission from the statistics alone. Each micro-batch
emits the CURRENT estimate for every URL it touched (an update stream
of freshness priors; feed the latest row per URL to recrawl_priority).

State is sharded by pmod(xxhash64(url), P) like every frontier state
table, so a URL never visits two groups and per-shard state stays
bounded to its hash range; it survives restarts through the streaming
checkpoint [north-rule resumability]. Within a micro-batch rows sort
by (url, fetch_ts); across micro-batches arrival order is assumed
ts-monotone per URL (a crawl emits observations as it fetches — the
same assumption the watermarked host-rate windows document).

max_urls_per_shard bounds per-shard state for 10^10-URL crawls: past
the cap the stalest URLs (smallest last_ts) are evicted and restart
their statistics on the next observation — the same bounded-state
discipline as the bloom-bounded streaming URL dedup.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "url string, n_intervals int, n_changes int, "
    "last_fetch_ts double, rate_per_day double"
)
STATE_SCHEMA = (
    "urls array<string>, ns array<int>, xs array<int>, "
    "first array<double>, last array<double>, sig array<string>"
)


def _make_rate_group(max_urls_per_shard: int | None):
    def _rate_group(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        return _rate_group_impl(key, pdfs, state, max_urls_per_shard)

    return _rate_group


def _rate_group_impl(
    key,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    max_urls_per_shard: int | None = None,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        urls, ns, xs, first, last, sig = state.get
        st = {
            u: [int(n), int(x), float(f), float(l), g]
            for u, n, x, f, l, g in zip(urls, ns, xs, first, last, sig)
        }
    else:
        st = {}
    touched = set()
    # a shard's micro-batch arrives as MULTIPLE Arrow chunks past
    # arrow.maxRecordsPerBatch — sorting per chunk would fold a URL's
    # observations out of timestamp order across chunk boundaries, so
    # concatenate first and sort ONCE per group
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        whole = (
            pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1
            else chunks[0]
        ).sort_values(
            # same tie-break as the batch window (ts, sig): equal-
            # instant fetches fold in signature order on both paths
            ["url", "fetch_ts", "content_sig"], kind="mergesort"
        )
        for u, t, g in zip(
            whole["url"], whole["fetch_ts"], whole["content_sig"]
        ):
            u, t, g = str(u), float(t), str(g)
            cur = st.get(u)
            if cur is None:
                st[u] = [0, 0, t, t, g]
            else:
                cur[0] += 1
                if g != cur[4]:
                    cur[1] += 1
                cur[3] = t
                cur[4] = g
            touched.add(u)
    out = []
    for u in sorted(touched):
        n, x, f, l, _ = st[u]
        if n < 1:
            continue  # single fetch: no interval yet (batch parity)
        mean_dt_days = (l - f) / n / 86400.0
        lam = -math.log((n - x + 0.5) / (n + 0.5))
        rate = lam / mean_dt_days if mean_dt_days > 0 else None
        out.append((u, n, x, l, rate))
    if out:
        yield pd.DataFrame(
            out,
            columns=[
                "url", "n_intervals", "n_changes",
                "last_fetch_ts", "rate_per_day",
            ],
        )
    if max_urls_per_shard is not None and len(st) > max_urls_per_shard:
        # bounded state: evict the STALEST URLs (smallest last_ts, ties
        # by url) down to the cap. An evicted URL restarts its
        # statistics on its next observation — the freshness prior
        # degrades gracefully for exactly the pages whose priors matter
        # least (coldest last fetch), and per-shard state stays fixed.
        keep = sorted(st.items(), key=lambda kv: (-kv[1][3], kv[0]))[
            :max_urls_per_shard
        ]
        st = dict(keep)
    items = sorted(st.items())
    state.update((
        [u for u, _ in items],
        [v[0] for _, v in items],
        [v[1] for _, v in items],
        [v[2] for _, v in items],
        [v[3] for _, v in items],
        [v[4] for _, v in items],
    ))


def stream_change_rate(
    history: DataFrame,
    n_partitions: int = 16,
    max_urls_per_shard: int | None = None,
) -> DataFrame:
    """history(url, fetch_ts, content_sig) streaming DataFrame →
    per-micro-batch update stream of (url, n_intervals, n_changes,
    last_fetch_ts, rate_per_day) — the running CGM estimate for every
    URL the batch touched, equal to the batch change_rate() over the
    same observations."""
    keyed = history.select(
        F.col("url"),
        F.col("fetch_ts").cast("double").alias("fetch_ts"),
        F.col("content_sig").cast("string").alias("content_sig"),
    ).withColumn(
        "shard",
        F.pmod(F.xxhash64("url"), F.lit(n_partitions)).cast("int"),
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        _make_rate_group(max_urls_per_shard),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
