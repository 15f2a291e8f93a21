"""Token-balanced output-shard planning for training-data writers.

``curation.pack_sequences`` lays documents into per-shard token streams
with ``shard = id % n_shards`` — uniform in DOC COUNT.  Web corpora are
heavy-tailed in document length (a few book-length pages carry as many
tokens as thousands of stubs), so count-uniform sharding leaves the
token mass of output files skewed and the downstream training loader
stalls on the fattest file.  ``shard_plan`` balances token MASS: rank
every document on the total order (n_tok desc, id asc) and deal ranks
out serpentine (boustrophedon) across the K shards —

    block = (rank-1) div K,  pos = (rank-1) mod K
    shard = pos            if block is even
            K - 1 - pos    if block is odd

the classic snake draft: each K-row block hands every shard exactly one
document, alternating pick order so the shard that drew the largest doc
of one block draws the smallest of the next.  On a non-increasing size
sequence the max-min shard spread is bounded by the largest document —
LPT-grade balance with zero iterative state, bit-deterministic under
any partitioning, and replayable as one SQL ``row_number()`` window.

**Distributed exact global rank** (the part that must survive 10^10
docs): ``row_number() OVER (ORDER BY n_tok DESC, id)`` as an
unpartitioned Spark window is a single-task sort — the exact
anti-pattern this repo pins against.  Instead the rank decomposes over
the group key g = (n_tok, id div B):

* within-group rank: a window partitioned by g ordered by id — every
  group holds <= B rows by construction (ids within one bucket), so no
  task ever sorts more than B (id, n_tok) pairs;
* within-size offsets: group counts windowed per n_tok over bucket —
  one row per ACTIVE bucket, <= docs/B rows per size class;
* across-size offsets: a prefix sum over the distinct-size totals,
  O(distinct n_tok) rows (token counts are bounded by the longest
  document — ~10^6 distinct values at the absolute worst), the only
  single-task window in the plan and it never sees document rows.

global_rank = size_offset(n_tok) + bucket_offset(n_tok, bucket) +
rank_in_group — equal to the naive global row_number by construction
(buckets of the same n_tok are ordered by id).  The document table
crosses ONE hash exchange on g carrying only (id, n_tok); the offset
tables are kilobytes and broadcast back.  Text never moves.

Reference: no analog in go-htmldate; complements
operators/curation.pack_sequences (count-uniform layout) the way
water_fill complements rank_to_budget.  Balance law: Graham's LPT
bound (SIAM J. Appl. Math. 17(2), 1969) — serpentine dealing of a
sorted sequence is the stateless special case shard writers use
(e.g. TFRecord/Megatron corpus builders).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _global_rank_by_size(
    toks: DataFrame, id_col: str, rank_bucket: int
) -> DataFrame:
    """Add ``rank`` = row_number over (n_tok desc, id asc) without an
    unpartitioned window; see module docstring for the decomposition."""
    b = F.floor(F.col(id_col) / F.lit(int(rank_bucket))).alias("_bkt")
    t = toks.withColumn("_bkt", b)

    # per-(n_tok, bucket) counts -> within-size and across-size offsets
    grp = t.groupBy("n_tok", "_bkt").agg(F.count(F.lit(1)).alias("_c"))
    w_size = (
        Window.partitionBy("n_tok")
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    grp = grp.withColumn(
        "_bkt_off", F.coalesce(F.sum("_c").over(w_size), F.lit(0))
    )
    totals = grp.groupBy("n_tok").agg(F.sum("_c").alias("_t"))
    w_all = (
        Window.orderBy(F.col("n_tok").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    totals = totals.withColumn(
        "_size_off", F.coalesce(F.sum("_t").over(w_all), F.lit(0))
    )
    offsets = grp.join(F.broadcast(totals.select("n_tok", "_size_off")),
                       "n_tok").select(
        "n_tok", "_bkt",
        (F.col("_size_off") + F.col("_bkt_off")).alias("_off"),
    )

    w_grp = Window.partitionBy("n_tok", "_bkt").orderBy(id_col)
    return (
        t.join(F.broadcast(offsets), ["n_tok", "_bkt"])
        .withColumn(
            "rank", (F.col("_off") + F.row_number().over(w_grp)).cast("long")
        )
        .drop("_bkt", "_off")
    )


def shard_plan(
    df: DataFrame,
    n_shards: int = 64,
    id_col: str = "doc_id",
    tok_col: str | None = None,
    text_col: str = "text",
    rank_bucket: int = 1 << 20,
) -> DataFrame:
    """Assign every document a token-balanced output shard.

    Returns (id, n_tok, rank, shard): rank is the exact global
    row_number over (n_tok desc, id asc); shard the serpentine deal of
    rank over ``n_shards``.  ``tok_col`` names a precomputed token
    count; otherwise ``text_col`` is counted with the engine's
    whitespace token law.
    """
    if tok_col is None:
        from .textstats import token_count

        toks = df.select(
            F.col(id_col), token_count(F.col(text_col)).cast("long").alias("n_tok")
        )
    else:
        toks = df.select(F.col(id_col), F.col(tok_col).cast("long").alias("n_tok"))

    k = int(n_shards)
    ranked = _global_rank_by_size(toks, id_col, rank_bucket)
    rn0 = F.col("rank") - 1
    block = F.floor(rn0 / k)
    pos = rn0 % k
    shard = F.when(block % 2 == 0, pos).otherwise(k - 1 - pos)
    return ranked.select(
        id_col, "n_tok", "rank", shard.cast("long").alias("shard")
    )


def shard_plan_stats(plan: DataFrame) -> DataFrame:
    """Per-shard doc and token totals — the pre-flight balance audit
    (pair with plans/budget.allocation_fairness over n_tokens for the
    Jain/Gini numbers)."""
    return plan.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
    )
