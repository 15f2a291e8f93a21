"""Water-filling budget allocation + multi-wave fetch planning
(plans/budget.py) against single-threaded Python references."""

from __future__ import annotations

import math
import random

import pytest

from go_htmldate_spark.plans.budget import fetch_wave_plan, water_fill_budgets


def _water_fill_ref(demands: dict[str, int], budget: int) -> dict[str, int]:
    """Progressive-filling reference (Bertsekas & Gallager §6.5.2):
    raise the integer level one unit at a time, then hand the
    remainder one-each to hosts above the level in host order."""
    alloc = {h: 0 for h in demands}
    left = budget
    while left > 0:
        open_hosts = [h for h in demands if alloc[h] < demands[h]]
        if not open_hosts:
            break
        if left >= len(open_hosts):
            for h in open_hosts:
                alloc[h] += 1
            left -= len(open_hosts)
        else:
            for h in sorted(open_hosts)[:left]:
                alloc[h] += 1
            left = 0
    return alloc


@pytest.mark.parametrize("seed,budget", [(1, 0), (2, 7), (3, 100),
                                         (4, 999), (5, 10**6)])
def test_water_fill_matches_progressive_reference(spark, seed, budget):
    rng = random.Random(seed)
    demands = {f"h{i}": rng.choice([1, 2, 3, 10, 50, 1000, 10**5])
               for i in range(rng.randint(1, 40))}
    df = spark.createDataFrame(list(demands.items()), "host string, demand long")
    got = {r["host"]: r["alloc"]
           for r in water_fill_budgets(df, budget).collect()}
    assert got == _water_fill_ref(demands, budget)


def test_water_fill_invariants(spark):
    rng = random.Random(99)
    demands = {f"h{i:03d}": rng.randint(1, 500) for i in range(200)}
    b = 9_137
    df = spark.createDataFrame(list(demands.items()), "host string, demand long")
    rows = water_fill_budgets(df, b).collect()
    alloc = {r["host"]: r["alloc"] for r in rows}
    assert sum(alloc.values()) == min(b, sum(demands.values()))
    assert all(0 <= alloc[h] <= demands[h] for h in demands)
    # max-min fairness: unsatisfied hosts sit within 1 of each other
    unsat = [alloc[h] for h in demands if alloc[h] < demands[h]]
    if unsat:
        assert max(unsat) - min(unsat) <= 1
        # and no satisfied host exceeds the unsat ceiling
        assert all(alloc[h] <= max(unsat) or alloc[h] == demands[h]
                   for h in demands)


def test_water_fill_budget_exceeds_demand(spark):
    df = spark.createDataFrame([("a", 5), ("b", 3)], "host string, demand long")
    got = {r["host"]: r["alloc"] for r in water_fill_budgets(df, 100).collect()}
    assert got == {"a": 5, "b": 3}


def _wave_ref(frontier, budgets, horizon):
    out = {}
    by_host: dict[str, list] = {}
    for host, url, pr in frontier:
        by_host.setdefault(host, []).append((url, pr))
    for host, urls in by_host.items():
        b = budgets.get(host, 0)
        if b <= 0:
            continue
        urls.sort(key=lambda t: (-t[1], t[0]))
        for rank, (url, _pr) in enumerate(urls[: b * horizon], start=1):
            out[url] = (rank, (rank - 1) // b + 1)
    return out


def test_wave_plan_matches_reference(spark):
    rng = random.Random(7)
    budgets = {f"h{i}": rng.choice([1, 2, 3, 8]) for i in range(12)}
    frontier = [
        (f"h{rng.randint(0, 13)}",  # h12/h13 have no budget row
         f"https://x/{j}",
         round(rng.random(), 6))
        for j in range(800)
    ]
    fdf = spark.createDataFrame(frontier, "host string, url string, priority double")
    bdf = spark.createDataFrame(
        list(budgets.items()), "host string, politeness_budget long")
    got = {r["url"]: (r["host_rank"], r["wave"])
           for r in fetch_wave_plan(fdf, bdf, horizon=3).collect()}
    assert got == _wave_ref(frontier, budgets, 3)


def test_wave_plan_bounds_and_determinism(spark):
    # a mega-host (10k rows, budget 5, horizon 2) keeps only 10 rows,
    # identical across salting, and wave counts are exactly budget-sized
    rows = [("big", f"https://big/{i:05d}", float(i % 97)) for i in range(10_000)]
    fdf = spark.createDataFrame(rows, "host string, url string, priority double")
    bdf = spark.createDataFrame([("big", 5)], "host string, politeness_budget long")
    out = fetch_wave_plan(fdf, bdf, horizon=2, n_salts=4).collect()
    assert len(out) == 10
    waves = {}
    for r in out:
        waves.setdefault(r["wave"], []).append(r)
    assert sorted(waves) == [1, 2]
    assert all(len(v) == 5 for v in waves.values())
    # ordering law: every wave-1 row outranks every wave-2 row
    assert max(r["host_rank"] for r in waves[1]) < min(
        r["host_rank"] for r in waves[2])


def test_allocation_fairness_known_values(spark):
    from go_htmldate_spark.plans.budget import allocation_fairness

    # equal shares: jain = 1, gini = 0
    eq = spark.createDataFrame([(f"h{i}", 10) for i in range(8)],
                               "host string, alloc long")
    row = allocation_fairness(eq).collect()[0]
    assert row["jain_index"] == 1.0 and abs(row["gini"]) < 1e-12
    assert row["total_alloc"] == 80

    # one host has everything: jain = 1/n
    mono = spark.createDataFrame(
        [("a", 0), ("b", 0), ("c", 0), ("d", 100)], "host string, alloc long")
    row = allocation_fairness(mono).collect()[0]
    assert abs(row["jain_index"] - 0.25) < 1e-12
    assert abs(row["gini"] - 0.75) < 1e-12  # (n-1)/n for a monopoly


def test_allocation_fairness_matches_python(spark):
    import random
    rng = random.Random(5)
    xs = [rng.randint(0, 50) for _ in range(60)]
    df = spark.createDataFrame(
        [(f"h{i:02d}", x) for i, x in enumerate(xs)], "host string, alloc long")
    from go_htmldate_spark.plans.budget import allocation_fairness
    row = allocation_fairness(df).collect()[0]
    n, s, s2 = len(xs), sum(xs), sum(x * x for x in xs)
    assert abs(row["jain_index"] - s * s / (n * s2)) < 1e-12
    srt = sorted(xs)
    gini = 2.0 * sum((i + 1) * x for i, x in enumerate(srt)) / (n * s) \
        - (n + 1.0) / n
    assert abs(row["gini"] - gini) < 1e-12


def test_politeness_audit_semantics(spark):
    from go_htmldate_spark.plans.backoff import politeness_audit

    log = spark.createDataFrame(
        [("a", 0.0), ("a", 1.0), ("a", 5.0), ("a", 5.5),  # gaps 1, 4, .5
         ("b", 10.0),                                     # single fetch
         ("c", 0.0), ("c", 9.0)],                         # gap 9, no delay
        "host string, fetch_ts double")
    delays = spark.createDataFrame(
        [("a", 2.0), ("b", 2.0)], "host string, crawl_delay double")
    got = {r["host"]: r for r in politeness_audit(log, delays).collect()}
    a = got["a"]
    assert (a["n_fetches"], a["n_violations"]) == (4, 2)  # 1.0 and 0.5 < 2
    assert a["min_gap_s"] == 0.5
    assert abs(a["compliance_rate"] - (1 - 2 / 3)) < 1e-12
    b = got["b"]
    assert (b["n_fetches"], b["n_violations"], b["min_gap_s"],
            b["compliance_rate"]) == (1, 0, None, 1.0)
    c = got["c"]  # no delay on file: gaps exist but nothing can violate
    assert (c["n_fetches"], c["n_violations"], c["crawl_delay_s"]) == (2, 0, None)
    assert c["compliance_rate"] == 1.0


def test_politeness_audit_single_exchange(spark):
    from go_htmldate_spark.plans.backoff import politeness_audit

    log = spark.createDataFrame(
        [("a", float(i)) for i in range(20)], "host string, fetch_ts double")
    delays = spark.createDataFrame([("a", 2.0)],
                                   "host string, crawl_delay double")
    plan = politeness_audit(log, delays)._jdf.queryExecution() \
        .executedPlan().toString()
    import re
    # <= 2 exchanges: ONE over the log (the lag window's host key,
    # reused by the same-key aggregation) + the O(hosts) delay-table
    # dedup; the log must reach the delay table via broadcast
    assert len(re.findall(r"hashpartitioning", plan)) <= 2
    assert "BroadcastHashJoin" in plan
