"""Two-parallelism scaling point for the final-session curation
operators (north-rule two-cluster-size proxy): the composed chain —
hashing-trick linear quality score (broadcast weight table) → per-host
document cap (salted two-phase rank) → temporal rebalance (count
pre-pass + map-only filter) — over a replicated sf0.1 corpus.

One parallelism level per invocation so the process can be pinned:

    taskset -c 0-3  python scripts/bench_newops_scale.py 4
    taskset -c 0-15 python scripts/bench_newops_scale.py 16

Prints one JSON line per run; efficiency = (T_N / T_4N) / 4.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICATE = int(os.environ.get("NEWOPS_REPLICATE", "100"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def materialize_corpus(spark, out_dir: str) -> None:
    """Replicated corpus with distinct ids, a skewed host column (every
    3rd doc lands on one mega-host — the host-cap stress shape) and a
    planted year, written once untimed."""
    import pyspark.sql.functions as F

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    corpus = None
    for k in range(REPLICATE):
        rep = base.select(
            (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" r{k}")).alias("text"),
        )
        corpus = rep if corpus is None else corpus.unionByName(rep)
    corpus = corpus.select(
        "doc_id", "text",
        F.concat(
            F.lit("h"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(0))
            .otherwise(F.col("doc_id") % 997).cast("string"),
        ).alias("host"),
        (F.lit(2015) + (F.col("doc_id") * 13) % 10).cast("int").alias("year"),
    )
    corpus.repartition(128).write.mode("overwrite").parquet(out_dir)


def run_chain(spark, corpus_dir: str) -> int:
    import pyspark.sql.functions as F

    from go_htmldate_spark.operators.curation import (
        hashed_weights, host_cap_sample, linear_quality_score,
        temporal_rebalance,
    )

    corpus = spark.read.parquet(corpus_dir)
    w = hashed_weights(spark, dim=4096, seed=13)
    kept = linear_quality_score(
        corpus.select("doc_id", "text"), w, dim=4096, seed=13
    ).filter(F.col("logit") > -0.2).select("doc_id")
    gated = corpus.join(kept, "doc_id")
    capped = host_cap_sample(gated, "host", "doc_id", cap=200, seed=17)
    mixed = temporal_rebalance(
        capped, "year", "doc_id", {2016: 0.5, 2019: 0.3, 2022: 0.2},
        seed=11,
    )
    return mixed.count()


def main() -> None:
    import shutil
    import tempfile

    from go_htmldate_spark.session import get_spark

    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    spark = get_spark(
        app_name=f"newops-scale-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
    )
    corpus_dir = tempfile.mkdtemp(prefix="newops_scale_")
    try:
        materialize_corpus(spark, corpus_dir)
        n_in = spark.read.parquet(corpus_dir).count()
        run_chain(spark, corpus_dir)  # warm: codegen + broadcast build
        best, n_out = None, None
        for _ in range(2):
            t0 = time.time()
            n_out = run_chain(spark, corpus_dir)
            el = time.time() - t0
            best = el if best is None or el < best else best
        print(json.dumps({
            "metric": "newops_chain_scaling_point",
            "cores": cores,
            "n_docs_in": n_in,
            "n_docs_out": n_out,
            "wall_s": round(best, 2),
            "docs_per_sec": round(n_in / best, 1),
        }))
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
