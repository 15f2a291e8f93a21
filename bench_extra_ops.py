"""Round-6 noop-sink timings for the operator paths bench.py (frozen)
calls directly — minhash/simhash/ann_selfjoin/incremental_dedup — with
the exact argument shapes bench.py uses, so operator-internal
optimizations are measured the way the driver will measure them.

Usage: python bench_extra_ops.py [--reps N] [op ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as bench.py).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("ops", nargs="*", default=[])
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1

    import pyspark.sql.functions as F

    from go_htmldate_spark.operators.dedup import (
        incremental_dedup,
        lsh_candidate_pairs,
        minhash_signatures,
        simhash_dup_groups,
        simhash_near_pairs,
    )
    from go_htmldate_spark.operators.similarity import ann_selfjoin_pairs
    from go_htmldate_spark.session import get_spark

    spark = get_spark(app_name="bench_extra_ops", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    dup = docs.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(dup)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding")
    edup = emb.filter(F.col("vec_id") % 9 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    ecorpus = emb.unionByName(edup)

    inc_corpus_sigs = minhash_signatures(docs, n_hashes=32).cache()
    inc_new_sigs = minhash_signatures(
        dup.unionByName(
            docs.filter(F.col("doc_id") % 7 == 3).select(
                (F.col("doc_id") + 2000000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" novel tail")).alias("text"),
            )
        ),
        n_hashes=32,
    ).cache()
    inc_corpus_sigs.count(), inc_new_sigs.count()

    ops = {
        "minhash_lsh_pairs": lambda: lsh_candidate_pairs(
            minhash_signatures(corpus, n_hashes=32), bands=8),
        "incremental_dedup": lambda: incremental_dedup(
            inc_corpus_sigs, inc_new_sigs, bands=8),
        "simhash_groups": lambda: simhash_dup_groups(corpus),
        "simhash_near_pairs": lambda: simhash_near_pairs(corpus, radius=3),
        "ann_selfjoin": lambda: ann_selfjoin_pairs(
            ecorpus, dim=64, min_cosine=0.9, n_planes=8, n_tables=8),
    }
    todo = args.ops or list(ops)

    timings = {}
    for name in todo:
        samples = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra_ops:{name}")
            t0 = time.time()
            ops[name]().write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        timings[name] = {"min": min(samples), "samples": samples}
    print(json.dumps({"sf": sf, "ops": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
