"""Two-parallelism scaling point for OPIC on-line page importance
(the north-rule two-cluster-size proxy applied to the incremental
link-analysis side): run 3 batch sweeps + 1 online sweep (a crawled
~1/3 host subset, the per-crawl-round shape) over the same
materialized host graph at local[N] and local[4N] and report
throughput at both plus scaling efficiency
(eff = T_N / (4 * T_4N); 1.0 = perfect).

Per sweep the only edge-sized moves are the src-keyed edges⋈flush join
and the dst-keyed in-cash aggregation; everything else is host-keyed
plus two one-row broadcast scalars — the same shape a 1000-executor
per-round budget refresh would stress. The exact-integer cash law
(truncating splits, virtual-root remainder pool) means the two
parallelism levels must agree BIT-FOR-BIT (asserted via an order-free
checksum), and total cash must equal n_hosts·unit exactly at the end.

Edge synthesis is deterministic (xxhash64 streams) with a hub-skewed
in-degree like bench_hostgraph_scale; the crawled subset is a
deterministic hash bucket of the hosts.

Usage: python scripts/bench_opic_scale.py [low_cores] [high_cores]
Env:   OPIC_EDGES (default 32000000), OPIC_HOSTS (default 2000000)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_EDGES = int(os.environ.get("OPIC_EDGES", "32000000"))
N_HOSTS = int(os.environ.get("OPIC_HOSTS", "2000000"))
UNIT = 10**9


def materialize(spark, path: str, table: str, buckets: int) -> None:
    """Build + persist the cleaned host graph (via prepare_host_edges:
    bucketed+sorted on src, so every sweep's edges⋈flush join scans
    the edge side in place — the Iceberg-state-table shape the rank
    sweeps want) and the host list ONCE, untimed: a real crawl holds
    both as tables already; timing covers the sweeps, not row
    synthesis or the one-time layout."""
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
    prepare_host_edges(e, table, n_buckets=buckets, path=f"{path}/edges")
    hosts = (
        spark.range(N_HOSTS)
        .select(F.concat(F.lit("h"), F.col("id")).alias("host"))
    )
    hosts.write.mode("overwrite").parquet(f"{path}/hosts")
    # deterministic ~1/3 crawled subset for the online sweep
    hosts.filter(F.pmod(F.xxhash64("host"), F.lit(3)) == 0).write.mode(
        "overwrite"
    ).parquet(f"{path}/crawled")


def run_job(
    spark, path: str, table: str, buckets: int
) -> tuple[int, int, int]:
    """3 batch sweeps + 1 online (crawled-subset) sweep; returns
    (n_hosts, total_cash, order-free exact checksum).

    The state between sweeps is a parquet table bucketed+sorted on
    host (same discipline as the edge table): a localCheckpoint
    reports UnknownPartitioning under AQE, so every sweep re-exchanged
    the full state for each of its host-keyed joins (state⋈outdeg,
    state⋈flush, state⋈in_cash) — with bucketed state those joins
    scan in place and the in-cash dst aggregation stays the only
    edge-sized exchange. This is also the resumable Iceberg-state
    shape the scheduler's per-round snapshot wants."""
    import pyspark.sql.functions as F

    from go_htmldate_spark.plans.opic import opic_init, opic_sweep

    def bucketed(df, name: str):
        (
            df.write.mode("overwrite")
            .bucketBy(buckets, "host").sortBy("host")
            .option("path", f"{path}/{name}")
            .saveAsTable(f"{table}_{name}")
        )
        return spark.table(f"{table}_{name}")

    e = spark.table(table)
    hosts = spark.read.parquet(f"{path}/hosts")
    crawled = spark.read.parquet(f"{path}/crawled")

    # batch sweeps use opic_run's shape: out-degrees once, grow off
    # (init covers every endpoint); the online sweep keeps the full
    # per-round shape — fresh-edge out-degree agg + auto-grow — since
    # a real crawl round's observed edges are new every time
    od = bucketed(
        e.groupBy(F.col("src").alias("host")).agg(
            F.count(F.lit(1)).alias("od")
        ),
        "od",
    )
    state = bucketed(opic_init(hosts, unit=UNIT), "st0")
    for i in range(3):
        state = bucketed(
            opic_sweep(state, e, prepared=True, grow=False, outdeg=od),
            f"st{i + 1}",
        )
    # the online round observes ONLY the out-links of the pages it
    # fetched (scheduler.run_round builds round_edges from the
    # extracted batch) — the crawled ~1/3 subset's edges here, scanned
    # in place from the bucketed table (src-keyed semi join). Fresh
    # out-degree agg + auto-grow stay inside the timed sweep: a real
    # round pays both on its own (new) edge set every time.
    e_round = e.join(
        crawled.select(F.col("host").alias("src")), "src", "semi"
    )
    state = opic_sweep(state, e_round, crawled=crawled, prepared=True)
    row = state.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cash").alias("cash"),
        F.sum(
            F.xxhash64("host", "cash", "history").cast("decimal(38,0)")
        ).alias("chk"),
    ).head()
    return int(row["n"]), int(row["cash"]), int(row["chk"])


def _cpu_times() -> tuple[int, int]:
    """(steal_jiffies, total_jiffies) from /proc/stat."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:9]]
    return vals[7], sum(vals)


def visit(cores: int) -> tuple[float, tuple[int, int, int], float, int]:
    """One visit to a parallelism level: fresh session, prep (untimed),
    warm run, one timed run. Visits to the two levels are interleaved
    by main() — this VM has multi-minute hypervisor phases where
    identical runs vary ±50%, so back-to-back A/A/B/B timing conflates
    phase with parallelism; A/B/A/B + best-per-level does not."""
    import shutil
    import tempfile

    from go_htmldate_spark.session import get_spark

    # buckets and shuffle partitions are FIXED across the two levels
    # (sized for the high leg): a real crawl's state/edge tables have a
    # cluster-size-invariant bucket count, and letting the layout track
    # core count would compare two different jobs — fewer, larger
    # buckets at the low leg are cheaper per row, biasing efficiency.
    buckets = int(os.environ.get("OPIC_BUCKETS", "32"))
    spark = get_spark(
        app_name=f"opic-scale-{cores}", master=f"local[{cores}]",
        shuffle_partitions=buckets,
    )
    path = tempfile.mkdtemp(prefix="opic_scale_")
    table = f"opic_bench_{cores}"
    try:
        materialize(spark, path, table, buckets=buckets)
        run_job(spark, path, table, buckets=buckets)  # warm: codegen + shuffle services
        s0, tot0 = _cpu_times()
        t0 = time.time()
        res = run_job(spark, path, table, buckets=buckets)
        el = time.time() - t0
        s1, tot1 = _cpu_times()
        steal = 100.0 * (s1 - s0) / max(tot1 - tot0, 1)
        # untimed: edges the ONLINE sweep actually processed (the
        # crawled-subset semi-join) — the honest throughput numerator
        # is 3*N_EDGES + this, not 4*N_EDGES
        import pyspark.sql.functions as F
        n_round = (
            spark.table(table)
            .join(spark.read.parquet(f"{path}/crawled")
                  .select(F.col("host").alias("src")), "src", "semi")
            .count()
        )
        return el, res, steal, n_round
    finally:
        shutil.rmtree(path, ignore_errors=True)
        spark.stop()


def main() -> None:
    low = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    high = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    reps = int(os.environ.get("OPIC_REPS", "2"))

    results: dict[int, list[tuple[float, float]]] = {low: [], high: []}
    checks = set()
    rounds = set()
    for _ in range(reps):
        for cores in (low, high):
            el, res, steal, n_round = visit(cores)
            results[cores].append((el, steal))
            checks.add(res)
            rounds.add(n_round)
    assert len(checks) == 1, (
        f"exact-integer OPIC diverged across parallelism: {checks}"
    )
    n_rows, cash, _ = next(iter(checks))
    assert len(rounds) == 1, f"online edge subset diverged: {rounds}"
    n_round = next(iter(rounds))
    n = n_rows - 1  # state carries one virtual-root row
    assert cash == n * UNIT, f"cash not conserved: {cash} != {n}*{UNIT}"
    t_low, steal_low = min(results[low])
    t_high, steal_high = min(results[high])
    factor = high / low
    print(json.dumps({
        "metric": "opic_sweeps_scaling",
        "n_edges": N_EDGES,
        "n_hosts": n,
        "sweeps": 4,
        "cores_low": low,
        "cores_high": high,
        "wall_low_s": round(t_low, 2),
        "wall_high_s": round(t_high, 2),
        "n_online_edges": n_round,
        "edge_sweeps_per_s_low": round((3 * N_EDGES + n_round) / t_low),
        "edge_sweeps_per_s_high": round((3 * N_EDGES + n_round) / t_high),
        "scaling_efficiency": round(t_low / (factor * t_high), 3),
        "steal_pct_low": round(steal_low, 1),
        "steal_pct_high": round(steal_high, 1),
        "bit_identical_across_parallelism": True,
        "cash_conserved": True,
    }))


if __name__ == "__main__":
    main()
