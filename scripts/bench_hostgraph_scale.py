"""Two-parallelism scaling point for the host-graph PageRank operator
(the north-rule two-cluster-size proxy applied to the link-analysis
side): run host_pagerank(iters=4) over the same materialized edge
table at local[N] and local[4N] and report throughput at both plus
scaling efficiency (eff = T_N / (4 * T_4N); 1.0 = perfect).

PageRank is the most shuffle-bound operator in the repo — per sweep
one edges⋈state join (edge side scanned in place from the
bucketed+sorted table prepare_host_edges lays down, so the contrib→dst
aggregation is the only edge-sized exchange) plus state checkpointing
between sweeps — so this point exercises exactly the path a
1000-executor host-graph job would stress. The exact-integer
arithmetic (64-bit codegen fast path under the provable
n_hosts·scale ≤ 2^62 mass bound, DECIMAL(38,0) beyond it) means the
two runs must agree BIT-FOR-BIT (asserted via an order-free checksum),
not just approximately: fold-order-free sums are what make
cross-parallelism determinism checkable at all.

Edge synthesis is deterministic (xxhash64 streams): n_hosts hosts,
~20% of edges target a small hub set (heavy-tailed in-degree, like a
real host graph), self-loops land naturally and are dropped by the
operator.

Usage: python scripts/bench_hostgraph_scale.py [low_cores] [high_cores]
Env:   HOSTGRAPH_EDGES (default 8000000), HOSTGRAPH_HOSTS (default 1000000)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_EDGES = int(os.environ.get("HOSTGRAPH_EDGES", "8000000"))
N_HOSTS = int(os.environ.get("HOSTGRAPH_HOSTS", "1000000"))


def materialize_edges(spark, table: str, path: str, buckets: int) -> None:
    """Build + persist the host graph ONCE (untimed) via
    prepare_host_edges: deduped, self-loop-free, bucketed+sorted on src
    — a real host graph is a prepared table on disk; timing covers the
    rank sweeps, not row synthesis or the one-time layout."""
    import pyspark.sql.functions as F

    from go_htmldate_spark.plans.hostgraph import prepare_host_edges

    n_hubs = max(N_HOSTS // 1000, 1)
    e = spark.range(N_EDGES).select(
        F.concat(
            F.lit("h"), F.pmod(F.xxhash64("id", F.lit(1)), F.lit(N_HOSTS))
        ).alias("src"),
        F.concat(
            F.lit("h"),
            F.when(
                F.pmod(F.xxhash64("id", F.lit(2)), F.lit(5)) == 0,
                F.pmod(F.xxhash64("id", F.lit(3)), F.lit(n_hubs)),
            ).otherwise(F.pmod(F.xxhash64("id", F.lit(3)), F.lit(N_HOSTS))),
        ).alias("dst"),
    )
    prepare_host_edges(e, table, n_buckets=buckets, path=path)


def run_job(spark, table: str) -> tuple[int, int]:
    """4 PageRank sweeps; returns (n_hosts, order-free exact checksum)."""
    import pyspark.sql.functions as F

    from go_htmldate_spark.plans.hostgraph import host_pagerank

    ranks = host_pagerank(spark.table(table), iters=4, prepared=True)
    row = ranks.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("host", "rank").cast("decimal(38,0)")).alias("chk"),
    ).head()
    return int(row["n"]), int(row["chk"])


def _cpu_times() -> tuple[int, int]:
    """(steal_jiffies, total_jiffies) from /proc/stat."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:9]]
    return vals[7], sum(vals)


def visit(cores: int) -> tuple[float, int, int, float]:
    """One visit to a parallelism level: fresh session, prep (untimed),
    warm run, one timed run. Returns (wall, n, checksum, steal_pct
    during the timed window). Visits to the two levels are interleaved
    by main() — this VM has multi-minute hypervisor phases where
    identical runs vary ±50%, so back-to-back A/A/B/B timing conflates
    phase with parallelism; A/B/A/B + best-per-level does not."""
    import shutil
    import tempfile

    from go_htmldate_spark.session import get_spark

    spark = get_spark(
        app_name=f"hostgraph-scale-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(cores * 2, 8),
    )
    edges_dir = tempfile.mkdtemp(prefix="hostgraph_scale_")
    table = f"hostgraph_bench_{cores}"
    try:
        materialize_edges(
            spark, table, f"{edges_dir}/edges", buckets=max(cores * 2, 8)
        )
        run_job(spark, table)  # warm: codegen + shuffle services
        s0, tot0 = _cpu_times()
        t0 = time.time()
        n, chk = run_job(spark, table)
        el = time.time() - t0
        s1, tot1 = _cpu_times()
        steal = 100.0 * (s1 - s0) / max(tot1 - tot0, 1)
        return el, n, chk, steal
    finally:
        shutil.rmtree(edges_dir, ignore_errors=True)
        spark.stop()


def main() -> None:
    low = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    high = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    reps = int(os.environ.get("HOSTGRAPH_REPS", "2"))

    results: dict[int, list[tuple[float, float]]] = {low: [], high: []}
    checks = set()
    for _ in range(reps):
        for cores in (low, high):
            el, n, chk, steal = visit(cores)
            results[cores].append((el, steal))
            checks.add((n, chk))
    assert len(checks) == 1, (
        f"exact-integer PageRank diverged across parallelism: {checks}"
    )
    n = next(iter(checks))[0]
    t_low, steal_low = min(results[low])
    t_high, steal_high = min(results[high])
    eff = (t_low / t_high) / (high / low)
    print(json.dumps({
        "metric": "hostgraph_pagerank_scaling",
        "n_edges": N_EDGES, "n_hosts_ranked": n, "iters": 4,
        "low_cores": low, "high_cores": high,
        "wall_low_s": round(t_low, 2), "wall_high_s": round(t_high, 2),
        "edges_per_sec_low": round(N_EDGES / t_low, 1),
        "edges_per_sec_high": round(N_EDGES / t_high, 1),
        "scaling_efficiency": round(eff, 3),
        "steal_pct_low": round(steal_low, 1),
        "steal_pct_high": round(steal_high, 1),
        "interleaved_reps": reps,
        "all_walls": {str(c): [round(e, 2) for e, _ in results[c]]
                      for c in (low, high)},
        "bit_identical_across_parallelism": True,
    }))


if __name__ == "__main__":
    main()
