"""Scaling-efficiency evidence for the north rule's two-cluster-size
criterion, sandbox proxy per BASELINE.md: run the identical job at
local[8] and local[32] on the same deterministic input and report
throughput at both plus efficiency = T32 / (4 × T8).

The job models "frontier URLs scheduled + dates extracted": build a
frontier over the synthetic corpus, drop a seen-set (anti-join),
per-host politeness top-k (window), fetch-join, full date-extraction
cascade, count. One fused DAG, no snapshot IO.

Usage: python bench_scaling.py [n_pages]       (default 40000)
       python bench_scaling.py --child <cores> <n>   (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def job(cores: int, n_pages: int) -> dict:
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from go_htmldate_spark.operators.extract import extract_dates
    from go_htmldate_spark.options import Options
    from go_htmldate_spark.plans.canonical import canonicalize_url, url_hash, url_host
    from go_htmldate_spark.session import get_spark
    from go_htmldate_spark.sources.pages import synth_pages

    spark = get_spark(app_name=f"scale-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=cores)

    # 4× cores: fine partitions smooth stragglers in the Python stage.
    # filler_repeats=8 ≈ 8KB pages: closer to crawl payloads, and enough
    # per-row work that fixed stage latency doesn't mask the scaling
    pages = synth_pages(
        spark, n_pages, seed=42, partitions=cores * 4, filler_repeats=8
    ).cache()
    pages.count()
    # warm ALL Python workers (one per core): a limit() would collapse to a
    # single partition and leave cores-1 workers cold-importing pandas
    # inside the timed section
    warm = synth_pages(spark, cores * 64, seed=7, partitions=cores)
    extract_dates(warm, Options()).count()

    def _cpu_snap():
        v = open("/proc/stat").readline().split()
        return list(map(int, v[1:9]))

    def timed_once() -> tuple[float, int, float]:
        a = _cpu_snap()
        t0 = time.time()
        n = _pipeline(pages, cores)
        wall = time.time() - t0
        b = _cpu_snap()
        d = [y - x for x, y in zip(a, b)]
        steal = d[7] / max(1, sum(d))  # hypervisor steal during the run
        return wall, n, steal

    wall, n, steal = timed_once()
    wall2, _, steal2 = timed_once()  # steady state: codegen + workers warm
    if wall2 < wall:
        wall, steal = wall2, steal2

    # extraction-only throughput (the dominant kernel of the north metric)
    import pyspark.sql.functions as F
    ex_in = pages.select("url", "html")
    t0 = time.time()
    extract_dates(ex_in, Options()).filter(F.col("date") != "").count()
    ex_wall = time.time() - t0
    t0 = time.time()
    extract_dates(ex_in, Options()).filter(F.col("date") != "").count()
    ex_wall = min(ex_wall, time.time() - t0)

    spark.stop()
    return {"cores": cores, "n_pages": n_pages, "n_extracted": n,
            "wall_sec": round(wall, 2),
            "rows_per_sec": round(n_pages / wall, 1),
            "extract_only_sec": round(ex_wall, 2),
            "extract_only_rows_per_sec": round(n_pages / ex_wall, 1),
            "cpu_steal_pct": round(100 * steal, 1)}


def _pipeline(pages, cores: int) -> int:
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from go_htmldate_spark.operators.extract import extract_dates
    from go_htmldate_spark.options import Options
    from go_htmldate_spark.plans.canonical import canonicalize_url, url_hash, url_host

    frontier = pages.select(
        canonicalize_url(F.col("url")).alias("url")
    ).select(
        "url",
        url_hash(F.col("url")).alias("url_hash"),
        url_host(F.col("url")).alias("host"),
    ).withColumn("priority", (F.pmod(F.col("url_hash"), F.lit(1000)) / 1000.0))

    seen = frontier.filter(F.pmod(F.col("url_hash"), F.lit(10)) < 3).select("url_hash")
    # shuffle-hash, not broadcast: the seen table is never broadcastable at
    # crawl scale, and the driver-side broadcast build is serial
    candidates = frontier.join(seen.hint("shuffle_hash"), "url_hash", "left_anti")

    w = Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("url"))
    scheduled = candidates.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= 1000
    ).drop("r")

    corpus = pages.withColumn("url_canon", canonicalize_url(F.col("url"))).select(
        "url_canon", "html", F.lit(None).cast("array<string>").alias("outlinks")
    )
    # broadcast the scheduled keys, stream the corpus: the html payload
    # never shuffles (the corpus-side Exchange was the non-scaling IO
    # component that capped efficiency at round 1)
    from go_htmldate_spark.plans.scheduler import fetch_join

    fetch = fetch_join(corpus, scheduled.select("url", "url_hash", "host", "priority"))
    # no repartition: the broadcast join preserves the corpus's even
    # cores*4 partitioning (no shuffle → no AQE byte-based coalescing),
    # so the CPU-bound Python stage is already balanced and the html
    # payload never crosses the wire
    out = extract_dates(fetch.select("url", "html"), Options())
    return out.filter(F.col("date") != "").count()


def best_of(cores: int, n: int, reps: int) -> dict:
    """Best of `reps` child runs — the sandbox host has multi-minute
    performance swings; min wall measures the engine, not the neighbors."""
    best = None
    for _ in range(reps):
        # taskset pins the WHOLE process tree (JVM task threads + Python
        # workers) to `cores` CPUs — bare local[N] only caps JVM task
        # threads while Python workers spill onto extra cores, which would
        # fake the small-config throughput and sandbag the efficiency ratio
        proc = subprocess.run(
            ["taskset", "-c", f"0-{cores - 1}",
             sys.executable, os.path.abspath(__file__), "--child", str(cores), str(n)],
            capture_output=True, text=True,
        )
        lines = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")]
        if not lines:
            print(proc.stdout[-2000:], proc.stderr[-2000:])
            raise SystemExit(f"child failed for {cores} cores")
        r = json.loads(lines[-1][len("RESULT "):])
        if best is None or r["wall_sec"] < best["wall_sec"]:
            best = r
    return best


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        print("RESULT " + json.dumps(job(int(sys.argv[2]), int(sys.argv[3]))))
        return

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    reps = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "3"))
    small = int(os.environ.get("SPARK_GRAFT_SCALE_N_SMALL", "4"))
    big = 4 * small
    results: dict[int, dict | None] = {small: None, big: None}
    # interleave configs so slow host phases hit both equally
    for _ in range(reps):
        for cores in (small, big):
            r = best_of(cores, n, 1)
            if results[cores] is None or r["wall_sec"] < results[cores]["wall_sec"]:
                results[cores] = r

    ts, tb = results[small]["rows_per_sec"], results[big]["rows_per_sec"]
    eff = round(tb / (4 * ts), 3)
    ex_eff = round(
        results[big]["extract_only_rows_per_sec"]
        / (4 * results[small]["extract_only_rows_per_sec"]), 3,
    )
    summary = {
        "job": "frontier schedule (dedup anti-join + politeness top-k) + fetch-join + date extraction",
        "n_pages": n,
        f"cpus_{small}": results[small],
        f"cpus_{big}": results[big],
        "scaling_efficiency_N_to_4N": eff,
        "extract_only_efficiency_N_to_4N": ex_eff,
        "meets_0.8_target": eff >= 0.8,
    }
    print(json.dumps(summary))
    # preserve everything after the scaling section (kernel/eval/suite
    # tables maintained by hand) — only the measured block is rewritten
    marker = "<!-- scaling:end -->"
    tail = ""
    try:
        old = open("BENCH.md").read()
        if marker in old:
            tail = old.split(marker, 1)[1]
        elif old.strip():
            # pre-marker BENCH.md: keep the whole old body as the tail
            # rather than silently dropping hand-maintained sections
            tail = "\n\n<!-- preserved pre-marker BENCH.md body -->\n\n" + old
    except FileNotFoundError:
        pass
    with open("BENCH.md", "w") as f:
        f.write(
            "# BENCH — scaling evidence (north-rule two-cluster-size proxy)\n\n"
            "Same job, same input, two parallelism levels (sandbox proxy per\n"
            f"BASELINE.md: no real cluster; {small} vs {big} CPUs, pinned with\n"
            "taskset so JVM task threads AND Python workers share exactly N\n"
            "cores, run serially and interleaved). Job: frontier scheduling\n"
            "(URL-seen anti-join + per-host politeness top-k) + fetch-join +\n"
            f"full date-extraction cascade over {n} synthetic pages.\n"
            "cpu_steal_pct records hypervisor steal observed during the timed\n"
            "section (this sandbox VM sees multi-minute steal phases).\n\n"
            "| config | wall sec | pages/sec | steal % |\n|---|---|---|---|\n"
            f"| {small} CPUs (local[{small}]) | {results[small]['wall_sec']} | {ts} | {results[small]['cpu_steal_pct']} |\n"
            f"| {big} CPUs (local[{big}]) | {results[big]['wall_sec']} | {tb} | {results[big]['cpu_steal_pct']} |\n\n"
            f"**Scaling efficiency (full pipeline)** T4N/(4·TN) = **{eff}** "
            f"(target ≥ 0.8: {'MET' if eff >= 0.8 else 'NOT MET'})\n\n"
            f"**Scaling efficiency (extraction kernel only)** = **{ex_eff}**\n\n"
            f"Raw: `{json.dumps(summary)}`\n\n{marker}{tail}"
        )


if __name__ == "__main__":
    main()
