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
    d.repartition(32).write.mode("overwrite").parquet(
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
    e.repartition(32).write.mode("overwrite").parquet(
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
    o.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "orders.parquet")
    )


if __name__ == "__main__":
    from go_htmldate_spark.session import get_spark

    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata", "sf1",
    )
    spark = get_spark(app_name="make-sf1", master="local[32]",
                      shuffle_partitions=32)
    make_sf1(spark, out)
    print("wrote", out)
