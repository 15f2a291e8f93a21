"""Synthesize an sf1 (10x sf0.1) dataset for the scaling bench.

The driver ships sf{0.001,0.01,0.1} only; the super-linear-behavior
check (VERDICT r4 task 7) needs one 10x point. This generator emits the
three tables the heavy benches read — documents (50k), embeddings
(20k), orders (1.5M) — deterministically (xxhash64 of the row id, no
RNG state), matching /root/testdata's schema and distribution shape:
same 31-word vocabulary and 10-100 word docs, same 5-lang mix, same
64-dim float embeddings, same orders key ranges scaled 10x.

Usage: python scripts/make_sf1.py [out_dir]   (default .localdata/sf1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = (
    "batch part spark line column order small sort fast value scan a hash "
    "slow group agg filter query big key window row table stream merge data "
    "join scan2 page plan shard"
).split()
LANGS = ["en", "de", "es", "fr", "zh"]


def make_sf1(spark, out_dir: str, scale: float = 1.0) -> None:
    from pyspark.sql import functions as F

    n_docs = int(50_000 * scale)
    n_vecs = int(20_000 * scale)
    n_orders = int(1_500_000 * scale)

    def h(seed: int, *cols):
        return F.abs(F.xxhash64(F.lit(seed), *cols))

    # documents: n_words in [10, 100], words drawn from the 31-word
    # vocabulary by per-position hash — same shape as the driver's table
    vocab_arr = F.array(*[F.lit(w) for w in VOCAB])
    lang_arr = F.array(*[F.lit(lang) for lang in LANGS])
    d = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    d = d.withColumn("n_words", (h(1, "doc_id") % 91 + 10).cast("int"))
    d = d.withColumn(
        "text",
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.col("n_words") - 1),
                lambda k: F.element_at(
                    vocab_arr,
                    (F.abs(F.xxhash64(F.lit(2), F.col("doc_id"), k))
                     % len(VOCAB)).cast("int") + 1,
                ),
            ),
            " ",
        ),
    ).select(
        "doc_id",
        "text",
        # ~41% en, rest even — the driver's observed mix
        F.element_at(
            lang_arr,
            F.when(h(3, "doc_id") % 100 < 41, F.lit(1)).otherwise(
                (h(3, "doc_id") % 4).cast("int") + 2
            ),
        ).alias("lang"),
        F.concat(F.lit("src"), (h(4, "doc_id") % 20).cast("string")).alias(
            "source"
        ),
        F.length("text").alias("n_chars"),
    )
    d.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )

    # embeddings: 64 floats uniform [-0.25, 0.25)
    e = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda k: (
                (F.abs(F.xxhash64(F.lit(5), F.col("id"), k)) % 2001 - 1000)
                / 4000.0
            ).cast("float"),
        ).alias("embedding"),
        (h(6, "id") % 8).cast("int").alias("label"),
    )
    e.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )

    o = spark.range(n_orders).select(
        F.col("id").alias("o_orderkey"),
        (h(7, "id") % int(150_000 * scale)).alias("o_custkey"),
        F.element_at(
            F.array(F.lit("F"), F.lit("O"), F.lit("P")),
            (h(8, "id") % 3).cast("int") + 1,
        ).alias("o_orderstatus"),
        ((h(9, "id") % 40_000_000) / 100.0 + 900.0).alias("o_totalprice"),
        F.timestamp_seconds(
            F.lit(788918400) + (h(10, "id") % 2400) * 86400
        ).alias("o_orderdate"),
        F.concat(
            (h(11, "id") % 5 + 1).cast("string"), F.lit("-PRIORITY")
        ).alias("o_orderpriority"),
    )
    o.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "orders.parquet")
    )

    # events: 10x the sf0.1 driver table — 30-day ts window (window does
    # NOT scale with sf, verified at sf0.01/sf0.1), user_id over
    # customers/10, 5 uniform event types, exp(mean~50) value, tiny
    # JSON props
    n_events = int(1_000_000 * scale)
    n_users = int(15_000 * scale)
    ev = spark.range(n_events).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(1704067200)
            + (h(12, "id") % (30 * 86400)).cast("double")
            + (h(13, "id") % 1_000_000).cast("double") / 1e6
        ).alias("ts"),
        (h(14, "id") % n_users).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in
                      ("click", "error", "purchase", "signup", "view")]),
            (h(15, "id") % 5).cast("int") + 1,
        ).alias("event_type"),
        F.round(
            -50.0 * F.log((h(16, "id") % 99_999 + 1).cast("double") / 1e5), 2
        ).alias("value"),
        F.concat(
            F.lit('{"k": '), (h(17, "id") % 100).cast("string"), F.lit("}")
        ).alias("props"),
    )
    ev.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet")
    )

    # lineitem: 10x — TPC-H-shaped ranges observed on the driver tables
    n_li = int(6_000_000 * scale)
    li = spark.range(n_li).select(
        (h(18, "id") % n_orders).alias("l_orderkey"),
        (h(19, "id") % int(200_000 * scale)).alias("l_partkey"),
        (h(20, "id") % int(10_000 * scale)).alias("l_suppkey"),
        ((h(21, "id") % 7) + 1).cast("int").alias("l_linenumber"),
        ((h(22, "id") % 50) + 1).cast("double").alias("l_quantity"),
        ((h(23, "id") % 10_410_000) / 100.0 + 900.0).alias("l_extendedprice"),
        ((h(24, "id") % 11) / 100.0).alias("l_discount"),
        ((h(25, "id") % 9) / 100.0).alias("l_tax"),
        F.element_at(
            F.array(F.lit("A"), F.lit("N"), F.lit("R")),
            (h(26, "id") % 3).cast("int") + 1,
        ).alias("l_returnflag"),
        F.element_at(
            F.array(F.lit("F"), F.lit("O")),
            (h(27, "id") % 2).cast("int") + 1,
        ).alias("l_linestatus"),
        F.timestamp_seconds(
            F.lit(788998400) + (h(28, "id") % 2498) * 86400
        ).alias("l_shipdate"),
    )
    li.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "lineitem.parquet")
    )

    # customer: 10x — Customer#%09d names, 25 nations, 5 segments
    n_cust = int(150_000 * scale)
    cu = spark.range(n_cust).select(
        F.col("id").alias("c_custkey"),
        F.format_string("Customer#%09d", F.col("id")).alias("c_name"),
        (h(29, "id") % 25).cast("int").alias("c_nationkey"),
        ((h(30, "id") % 1_099_966) / 100.0 - 999.85).alias("c_acctbal"),
        F.element_at(
            F.array(*[F.lit(s) for s in
                      ("AUTOMOBILE", "BUILDING", "FURNITURE",
                       "HOUSEHOLD", "MACHINERY")]),
            (h(31, "id") % 5).cast("int") + 1,
        ).alias("c_mktsegment"),
    )
    cu.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "customer.parquet")
    )


def _flatten(out_dir: str) -> None:
    """Collapse each single-part directory table to a bare .parquet
    FILE — the driver ships bare-file tables, and helpers size them
    with os.path.getsize, so the layout must match for comparable
    benches."""
    import shutil

    for name in os.listdir(out_dir):
        p = os.path.join(out_dir, name)
        if not os.path.isdir(p):
            continue
        parts = [f for f in os.listdir(p) if f.endswith(".parquet")]
        assert len(parts) == 1, (p, parts)
        tmp = p + ".file"
        shutil.move(os.path.join(p, parts[0]), tmp)
        shutil.rmtree(p)
        shutil.move(tmp, p)


if __name__ == "__main__":
    from go_htmldate_spark.session import get_spark

    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata", "sf1",
    )
    spark = get_spark(app_name="make-sf1", master="local[32]",
                      shuffle_partitions=32)
    make_sf1(spark, out)
    _flatten(out)
    print("wrote", out)
