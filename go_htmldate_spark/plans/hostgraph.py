"""Host-graph link analysis for crawl prioritization.

A tier crawl budgets HOSTS, not just URLs: Common Crawl publishes a
host-level web graph and ranks it to decide which hosts deserve crawl
budget, and the reference's frontier (priority = politeness × recency,
plans/scheduler.py) is exactly the place such a rank plugs in as the
politeness prior. `host_pagerank` computes damped PageRank over
(src_host, dst_host) edges in EXACT integer fixed-point so the result
is engine-portable and fold-order-free:

- ranks are integral multiples of 1/SCALE held as DECIMAL(38,0)
  (exact group sums in Spark; HUGEINT sums in the DuckDB oracle);
- per-edge contribution is truncating integer division
  rank div outdeg, implemented as (a - a % b) / b — the numerator is
  an exact multiple of b, so the decimal divide is exact;
- damping is (in_sum * d_num) div d_den, same construct.

No floating point anywhere means the sum over in-neighbors is exact
under ANY partitioning/combine order — the property that makes the
result reproducible between a 1-core oracle and a 1000-executor
cluster run (a double-based PageRank differs in the last bits per
shuffle layout, which poisons bit-parity testing at scale).

Semantics: standard damped PageRank with uniform base mass
SCALE*(den-num)/den per node, K fixed sweeps, dangling-node mass
dropped (hosts with no out-links absorb rank; the usual crawl-ranking
simplification — we want a relative ordering, not a stochastic
eigenvector). Self-loops removed, parallel edges collapsed.

Scale shape: each sweep is one join edges⋈ranks on src (both sides
hash-partitioned on the same key after the first sweep — AQE reuses
the exchange) and one hash-agg on dst with map-side partial sums;
state per sweep is one (host, rank) row per node, checkpointed with
the same reliable-dir-aware discipline as connected_components so
lineage stays flat over K sweeps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def _idiv(a, b):
    """Truncating integer division on non-negative DECIMAL(38,0)
    columns, exact by construction: (a - a % b) is an exact multiple
    of b, so the decimal divide yields an integral value that any
    result scale represents exactly."""
    a = a.cast(_DEC)
    b = b.cast(_DEC)
    return ((a - a % b) / b).cast(_DEC)


def host_pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 4,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
) -> DataFrame:
    """(src_host, dst_host) link edges → (host, rank) with rank the
    integer fixed-point PageRank mass (multiples of 1/scale), BIGINT.

    Every node starts at `scale` (i.e. 1.0); after each sweep
    rank = base + damp(sum over in-edges of rank div outdeg) with
    base = scale*(den-num) div den. K sweeps of exact integer
    arithmetic — see the module docstring for why not doubles.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    sc = edges.sparkSession.sparkContext

    def ckpt(df: DataFrame) -> DataFrame:
        if sc.getCheckpointDir() is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    e = ckpt(e)
    nodes = ckpt(
        e.select(F.col("src").alias("host"))
        .unionByName(e.select(F.col("dst").alias("host")))
        .distinct()
    )
    outdeg = e.groupBy(F.col("src").alias("host")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    # outdeg rides with the rank state so each sweep's join is
    # edges ⋈ state on one key, not a three-way join
    base = (scale * (damping_den - damping_num)) // damping_den
    state = ckpt(
        nodes.join(outdeg, "host", "left").select(
            "host",
            F.lit(scale).cast(_DEC).alias("rank"),
            F.coalesce(F.col("outdeg"), F.lit(0)).alias("outdeg"),
        )
    )
    for _ in range(iters):
        contrib = (
            e.join(state, e["src"] == state["host"])
            .select(
                F.col("dst"),
                _idiv(F.col("rank"), F.col("outdeg")).alias("contrib"),
            )
        )
        in_sum = contrib.groupBy(F.col("dst").alias("host")).agg(
            F.sum("contrib").cast(_DEC).alias("in_sum")
        )
        state = ckpt(
            state.select("host", "outdeg")
            .join(in_sum, "host", "left")
            .select(
                "host",
                (
                    F.lit(base).cast(_DEC)
                    + _idiv(
                        F.coalesce(F.col("in_sum"), F.lit(0)).cast(_DEC)
                        * F.lit(damping_num),
                        F.lit(damping_den),
                    )
                ).cast(_DEC).alias("rank"),
                "outdeg",
            )
        )
    return state.select("host", F.col("rank").cast("long").alias("rank"))


def host_pagerank_py(
    edges: list[tuple[str, str]],
    iters: int = 4,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
) -> dict[str, int]:
    """Single-threaded exact-integer reference (test oracle)."""
    e = sorted({(s, d) for s, d in edges if s != d})
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    outdeg: dict[str, int] = {}
    for s, _ in e:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = (scale * (damping_den - damping_num)) // damping_den
    rank = {n: scale for n in nodes}
    for _ in range(iters):
        in_sum = {n: 0 for n in nodes}
        for s, d in e:
            in_sum[d] += rank[s] // outdeg[s]
        rank = {n: base + (in_sum[n] * damping_num) // damping_den for n in nodes}
    return rank


def rank_to_budget(
    ranks: DataFrame, lo: float = 1.0, hi: float = 8.0
) -> DataFrame:
    """(host, rank) → (host, politeness_budget): log-scaled rank mapped
    affinely onto [lo, hi], ready to feed CrawlScheduler(host_budget=…)
    — the rank→crawl-budget bridge (Common Crawl allocates crawl budget
    from host rank the same way). Log scale because PageRank mass is
    heavy-tailed: a linear map would give every non-hub host the floor.

    One scalar agg (min/max log-rank) broadcast back over the rank
    table; output is one row per host — broadcast-size by construction
    for the scheduler's own budget join. Degenerate all-equal ranks map
    to the midpoint."""
    lr = F.log(F.col("rank").cast("double"))
    bounds = ranks.agg(
        F.min(lr).alias("_lo"), F.max(lr).alias("_hi")
    )
    span = F.col("_hi") - F.col("_lo")
    budget = F.when(
        span > 0,
        F.lit(lo) + (F.lit(hi - lo)) * (lr - F.col("_lo")) / span,
    ).otherwise(F.lit((lo + hi) / 2.0))
    return (
        ranks.crossJoin(F.broadcast(bounds))
        .select("host", budget.alias("politeness_budget"))
    )
