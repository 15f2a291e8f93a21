"""Token-balanced shard planning (operators/shards.py)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from go_htmldate_spark.operators.shards import shard_plan, shard_plan_stats


def _docs(spark):
    # heavy-tailed sizes: a few giants, many stubs; ids deliberately
    # non-contiguous so the id-bucket decomposition sees gaps
    rows = [(i * 7 + 3, "w " * ((i * i * 37) % 400 + 1)) for i in range(300)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shard_plan_rank_matches_naive_global_window(spark):
    docs = _docs(spark)
    # tiny rank_bucket forces many (n_tok, bucket) groups — the
    # decomposition must still reproduce the naive single-window rank
    plan = shard_plan(docs, n_shards=5, rank_bucket=64)
    from go_htmldate_spark.operators.textstats import token_count

    naive = (
        docs.select("doc_id", token_count(F.col("text")).cast("long").alias("n_tok"))
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.col("n_tok").desc(), F.col("doc_id")))
            .cast("long"),
        )
    )
    got = {r["doc_id"]: (r["n_tok"], r["rank"]) for r in plan.collect()}
    want = {r["doc_id"]: (r["n_tok"], r["rank"]) for r in naive.collect()}
    assert got == want


def test_shard_plan_serpentine_and_balance(spark):
    docs = _docs(spark)
    k = 5
    plan = shard_plan(docs, n_shards=k, rank_bucket=64).collect()
    by_rank = {r["rank"]: r["shard"] for r in plan}
    # serpentine law: block 0 deals 0..k-1, block 1 deals k-1..0
    assert [by_rank[i] for i in range(1, k + 1)] == list(range(k))
    assert [by_rank[i] for i in range(k + 1, 2 * k + 1)] == list(range(k - 1, -1, -1))
    # token balance: max-min spread bounded by the largest document
    stats = {r["shard"]: r["n_tokens"]
             for r in shard_plan_stats(
                 shard_plan(docs, n_shards=k, rank_bucket=64)).collect()}
    assert set(stats) == set(range(k))
    biggest = max(r["n_tok"] for r in plan)
    assert max(stats.values()) - min(stats.values()) <= biggest


def test_shard_plan_precomputed_tok_col_and_no_text_shuffle(spark):
    docs = _docs(spark).withColumn("ntok", F.lit(7))
    plan = shard_plan(docs, n_shards=3, tok_col="ntok")
    # all-equal sizes: rank degrades to id order
    rows = sorted(plan.collect(), key=lambda r: r["doc_id"])
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    # the text column never enters the plan
    ep = (
        shard_plan(_docs(spark), n_shards=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for line in ep.splitlines():
        if "Exchange" in line and "SinglePartition" not in line:
            assert "text" not in line, line
