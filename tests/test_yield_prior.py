"""URL-pattern yield prior (plans/yield_prior.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_htmldate_spark.plans.yield_prior import (
    apply_yield_prior,
    pattern_yield,
    url_pattern_signature,
)


def test_signature_axes(spark):
    urls = [
        "https://a.example/blog/2024/03/x.html",   # blog | 3+ | d | page
        "https://a.example/tag/foo",               # tag  | 2  | - | none
        "https://a.example/",                      # ''   | 0  | - | none
        "https://A.EXAMPLE/img/logo.PNG",          # img  | 2  | - | asset
        "https://a.example/blog/2023/04/y.html",   # same bucket as row 0
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r["s"] for r in
           df.select(url_pattern_signature(F.col("url")).alias("s")).collect()]
    assert got[0] == "a.example|blog|3+|d|page"
    assert got[1] == "a.example|tag|2|-|none"
    assert got[2] == "a.example||0|-|none"
    assert got[3] == "a.example|img|2|-|asset"
    assert got[4] == got[0]


def test_pattern_yield_laplace_and_apply(spark):
    log = spark.createDataFrame(
        [("https://h.example/blog/a.html", True)] * 8
        + [("https://h.example/blog/b.html", False)] * 2
        + [("https://h.example/tag/x", False)] * 5,
        "url string, dated boolean",
    )
    y = {r["signature"]: r for r in pattern_yield(log, alpha=1.0).collect()}
    blog = y["h.example|blog|2|-|page"]
    assert (blog["n_fetched"], blog["n_dated"]) == (10, 8)
    assert abs(blog["yield"] - 9 / 12) < 1e-12
    tag = y["h.example|tag|2|-|none"]
    assert abs(tag["yield"] - 1 / 7) < 1e-12

    frontier = spark.createDataFrame(
        [("https://h.example/blog/c.html", 2.0),
         ("https://h.example/tag/y", 2.0),
         ("https://h.example/about", 2.0)],   # unseen pattern
        "url string, priority double",
    )
    out = {r["url"]: r for r in
           apply_yield_prior(frontier, pattern_yield(log)).collect()}
    assert abs(out["https://h.example/blog/c.html"]["priority"] - 2.0 * 9 / 12) < 1e-12
    assert abs(out["https://h.example/tag/y"]["priority"] - 2.0 / 7) < 1e-12
    assert out["https://h.example/about"]["priority"] == 1.0  # default 0.5
    assert all(r["prior_priority"] == 2.0 for r in out.values())


def test_apply_is_broadcast_frontier_never_shuffles(spark):
    log = spark.createDataFrame(
        [("https://h.example/blog/a.html", True)], "url string, dated boolean"
    )
    frontier = spark.createDataFrame(
        [("https://h.example/blog/c.html", 2.0)], "url string, priority double"
    )
    plan = (
        apply_yield_prior(frontier, pattern_yield(log))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    # the only hash exchange keys on the signature aggregation (yield side)
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "signature" in line, line
