"""Two-parallelism scaling point for the curation operators (the
north-rule two-cluster-size proxy applied to the training-data side):
run the same curation chain — exact dedup → deterministic stratified
sample → gopher repetition gate → benchmark 8-gram decontamination →
token stats — over the same replicated corpus at local[N] and
local[4N], and report throughput at both plus scaling efficiency
(eff = T_N / (4 * T_4N); 1.0 = perfect).

The input is sf0.1 documents replicated REPLICATE x (default 100 ->
500k docs) with distinct ids, large enough that fixed per-stage
scheduling latency (~15 sequential AQE stages regardless of cores)
doesn't dominate the parallel region.

Usage: python scripts/bench_curation_scale.py [low_cores] [high_cores]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICATE = int(os.environ.get("CURATION_REPLICATE", "100"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def materialize_corpus(spark, out_dir: str, partitions: int) -> None:
    """Write the replicated corpus as a parquet table ONCE (untimed) —
    a real corpus is a table on disk, and timing a 20-way inline union
    would measure driver-side plan optimization of the union replicated
    across the chain's branches, not the engine."""
    import pyspark.sql.functions as F

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    corpus = None
    for k in range(REPLICATE):
        # distinct ids per replica; every 4th replica repeats its texts
        # verbatim (so dedup has real work) while the rest get a
        # replica-tag token appended (so the gram stages see a corpus
        # that GROWS with replication instead of collapsing back to the
        # base after dedup)
        text = F.col("text") if k % 4 == 0 else F.concat(
            F.col("text"), F.lit(f" r{k}")
        )
        rep = base.select(
            (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
            text.alias("text"), "lang",
        )
        corpus = rep if corpus is None else corpus.unionByName(rep)
    corpus.repartition(partitions).write.mode("overwrite").parquet(out_dir)


def run_chain(spark, corpus_dir, n_docs_out):
    import pyspark.sql.functions as F

    from go_htmldate_spark.operators.curation import (
        ngram_contamination, stratified_sample,
    )
    from go_htmldate_spark.operators.dedup import exact_dedup
    from go_htmldate_spark.operators.textstats import (
        gopher_repetition, token_count,
    )

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    corpus = spark.read.parquet(corpus_dir)

    deduped = exact_dedup(corpus)
    sampled = stratified_sample(
        deduped, "lang", {"en": 1.0, "de": 0.3}, "doc_id", seed=7,
        default_fraction=0.05,
    )
    rep = gopher_repetition(sampled)
    bench = base.filter(F.col("doc_id") % 17 == 0).select("text")
    contam = ngram_contamination(sampled, bench, n=8)
    flags = sampled.join(rep.select("doc_id", "gopher_ok"), "doc_id").join(
        contam.select("doc_id", "contamination_frac"), "doc_id", "left"
    )
    final = flags.filter(
        F.col("gopher_ok")
        & (F.coalesce(F.col("contamination_frac"), F.lit(0.0)) <= 0.05)
    ).select("doc_id", token_count(F.col("text")).alias("n_tok"))
    n = final.count()
    n_docs_out.append(n)
    return n


def time_at(cores: int) -> tuple[float, int, int]:
    import shutil
    import tempfile

    from go_htmldate_spark.session import get_spark

    spark = get_spark(
        app_name=f"curation-scale-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
    )
    corpus_dir = tempfile.mkdtemp(prefix="curation_scale_")
    try:
        materialize_corpus(spark, corpus_dir, partitions=128)
        out = []
        run_chain(spark, corpus_dir, out)  # warm: codegen + python workers
        best = None
        for _ in range(2):
            t0 = time.time()
            run_chain(spark, corpus_dir, out)
            el = time.time() - t0
            best = el if best is None or el < best else best
        n_in = spark.read.parquet(corpus_dir).count()
        return best, out[-1], n_in
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)
        spark.stop()


def main() -> None:
    low = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    high = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    t_low, n_out_low, n_in = time_at(low)
    t_high, n_out_high, _ = time_at(high)
    assert n_out_low == n_out_high, "chain is not deterministic across parallelism"
    eff = (t_low / t_high) / (high / low)
    print(json.dumps({
        "metric": "curation_chain_scaling",
        "n_docs_in": n_in,
        "n_docs_out": n_out_low,
        "low_cores": low, "high_cores": high,
        "wall_low_s": round(t_low, 2), "wall_high_s": round(t_high, 2),
        "docs_per_sec_low": round(n_in / t_low, 1),
        "docs_per_sec_high": round(n_in / t_high, 1),
        "scaling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
