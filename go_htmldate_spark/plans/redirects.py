"""Redirect-chain resolution as an iterative pointer-jumping plan.

A fetch stage emits redirect edges (src_url → dst_url, one hop each:
301/302/canonical-link). The frontier must schedule the TERMINAL
target — following chains one hop per crawl round wastes a round per
hop, and redirect cycles (A→B→A) must be detected, not chased
forever. `resolve_redirects` collapses every chain to its terminal in
O(log max_hops) self-join sweeps (pointer doubling: after sweep k
every pointer has skipped 2^k hops), so a 16-hop chain costs 4
sweeps, not 16 — and at 10^9 redirect rows each sweep is one shuffle
on the pointer key with checkpoint-truncated lineage, the same
discipline as connected components (operators/dedup.py).

Cycle handling: a node whose pointer is still itself a source after
the final sweep sits on (or drains into) a cycle longer than the hop
budget allows it to escape — flagged resolved=false with its
part-resolved target kept for diagnostics. Self-loops (A→A) are
cycles of length 1 and flag immediately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    edges: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    max_hops: int = 16,
) -> DataFrame:
    """(src_url, dst_url) one-hop redirect edges → one row per distinct
    source: (url, target, resolved) with target the chain's terminal
    (a node that is not itself a source) and resolved=false for chains
    that are cyclic or exceed max_hops. Duplicate edges collapse; a
    source with conflicting destinations keeps the lexicographically
    smallest (deterministic under any partitioning)."""
    sc = edges.sparkSession.sparkContext

    def ckpt(df: DataFrame) -> DataFrame:
        if sc.getCheckpointDir() is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    # one pointer per source; min() collapses dup/conflicting edges
    ptr = ckpt(
        edges.groupBy(F.col(src_col).alias("url"))
        .agg(F.min(dst_col).alias("target"))
    )
    sweeps = max(1, (max_hops - 1).bit_length())  # 2^sweeps >= max_hops
    for _ in range(sweeps):
        # pointer doubling: target ← target's target where target is
        # itself a source. One shuffle per sweep (the self-join key);
        # checkpoint truncates lineage so plans stay flat.
        hop = ptr.select(
            F.col("url").alias("t_url"), F.col("target").alias("t_target")
        )
        ptr = ckpt(
            ptr.join(hop, ptr["target"] == hop["t_url"], "left").select(
                "url", F.coalesce("t_target", "target").alias("target")
            )
        )
    # a terminal is a non-source; anything still pointing at a source
    # after 2^sweeps hop-skips is cyclic (or beyond the hop budget)
    srcs = ptr.select(F.col("url").alias("s_url"))
    return ptr.join(srcs, ptr["target"] == srcs["s_url"], "left").select(
        "url", "target", F.col("s_url").isNull().alias("resolved")
    )


def apply_redirects(
    df: DataFrame,
    resolved: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Map a URL column through a resolve_redirects table: resolved
    chains replace the URL with their terminal target; unresolved
    (cyclic) sources DROP — scheduling a cycle member would refetch
    the cycle forever. Non-redirecting URLs pass through unchanged.
    Left join on the URL key; broadcast it when the redirect map is
    small, which Catalyst/AQE decides from stats."""
    m = resolved.select(
        F.col("url").alias("_r_url"),
        F.col("target").alias("_r_target"),
        F.col("resolved").alias("_r_ok"),
    )
    joined = df.join(m, df[url_col] == m["_r_url"], "left")
    return (
        joined.filter(F.col("_r_ok").isNull() | F.col("_r_ok"))
        .withColumn(
            url_col, F.coalesce(F.col("_r_target"), F.col(url_col))
        )
        .drop("_r_url", "_r_target", "_r_ok")
    )
