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
