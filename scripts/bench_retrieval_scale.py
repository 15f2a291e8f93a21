"""Two-parallelism scaling point for the inverted-index build (the
north-rule two-cluster-size proxy applied to the retrieval subsystem):
run build_postings + corpus_stats over the same materialized document
table at local[N] and local[4N] and report throughput at both plus
scaling efficiency (eff = T_N / (4 * T_4N); 1.0 = perfect).

The index build is tokenize-explode (Generate, codegen) into the
(term, doc)-keyed aggregation — one token-volume shuffle — plus the
doc-keyed window that attaches dl; it stresses the explode→shuffle
path none of the other scale points cover. Counts are integers, so
the two parallelism levels must agree BIT-FOR-BIT on an order-free
checksum over (term, doc_id, tf, dl). A BM25 lookup against the
prepared bucketed postings table is reported as a side metric
(lookup_s, untimed toward efficiency — it is sub-second by design:
bucket pruning + broadcast dfs + TakeOrderedAndProject).

Document synthesis is deterministic (xxhash64 streams): TOKENS_PER_DOC
tokens per doc, ~20% drawn from a 100-word hot head and the rest from
a VOCAB-sized tail — a Zipf-ish mix so term df is heavy-tailed like
real text.

Usage: python scripts/bench_retrieval_scale.py [low_cores] [high_cores]
Env:   RETRIEVAL_DOCS (default 300000), RETRIEVAL_VOCAB (default 50000),
       RETRIEVAL_TOKENS_PER_DOC (default 120), RETRIEVAL_REPS (default 2)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("RETRIEVAL_DOCS", "300000"))
VOCAB = int(os.environ.get("RETRIEVAL_VOCAB", "50000"))
TOK_PER_DOC = int(os.environ.get("RETRIEVAL_TOKENS_PER_DOC", "120"))


def materialize_docs(spark, path: str) -> None:
    """Synthesize + persist the document table ONCE (untimed): the raw
    corpus is a parquet table on disk in any real deployment; timing
    covers the index build, not row synthesis."""
    import pyspark.sql.functions as F

    tok = (
        "concat('w', CASE WHEN pmod(xxhash64(id, i, 1), 5) = 0 "
        f"THEN pmod(xxhash64(id, i, 2), 100) "
        f"ELSE pmod(xxhash64(id, i, 2), {VOCAB}) END)"
    )
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"concat_ws(' ', transform(sequence(1, {TOK_PER_DOC}), "
            f"i -> {tok}))"
        ).alias("text"),
    )
    docs.write.mode("overwrite").parquet(path)


def run_build(spark, docs_path: str) -> tuple[int, int]:
    """Index build; returns (n_postings, order-free exact checksum)."""
    import pyspark.sql.functions as F

    from go_htmldate_spark.operators.retrieval import build_postings

    p = build_postings(spark.read.parquet(docs_path))
    row = p.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.xxhash64("term", "doc_id", "tf", "dl").cast("decimal(38,0)")
        ).alias("chk"),
    ).head()
    return int(row["n"]), int(row["chk"])


def _cpu_times() -> tuple[int, int]:
    """(steal_jiffies, total_jiffies) from /proc/stat."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:9]]
    return vals[7], sum(vals)


def visit(cores: int) -> tuple[float, float, int, int, float]:
    """One visit to a parallelism level: fresh session, synthesis
    (untimed), warm run, one timed build, one timed prepared-table BM25
    lookup. Returns (build_wall, lookup_wall, n, checksum, steal_pct).
    Visits are interleaved by main() — this VM has multi-minute
    hypervisor phases where identical runs vary ±50%; A/B/A/B +
    best-per-level decouples phase from parallelism."""
    import shutil
    import tempfile

    from go_htmldate_spark.operators.retrieval import (
        bm25_topk, build_postings, corpus_stats, prepare_postings,
    )
    from go_htmldate_spark.session import get_spark

    spark = get_spark(
        app_name=f"retrieval-scale-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(cores * 2, 8),
    )
    work = tempfile.mkdtemp(prefix="retrieval_scale_")
    table = f"retrieval_bench_{cores}"
    try:
        materialize_docs(spark, f"{work}/docs")
        run_build(spark, f"{work}/docs")  # warm: codegen + shuffle services
        s0, tot0 = _cpu_times()
        t0 = time.time()
        n, chk = run_build(spark, f"{work}/docs")
        el = time.time() - t0
        s1, tot1 = _cpu_times()
        steal = 100.0 * (s1 - s0) / max(tot1 - tot0, 1)

        # side metric: prepared-table lookup latency (bucket-pruned)
        postings = build_postings(spark.read.parquet(f"{work}/docs"))
        t = prepare_postings(postings, table, n_buckets=max(cores * 2, 8),
                             path=f"{work}/postings")
        stats = corpus_stats(t).localCheckpoint(eager=True)
        bm25_topk(t, stats, ["w3", "w17", "w41"], k=10).collect()  # warm
        t1 = time.time()
        bm25_topk(t, stats, ["w5", "w23", "w67"], k=10).collect()
        lookup = time.time() - t1
        return el, lookup, n, chk, steal
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


def main() -> None:
    low = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    high = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    reps = int(os.environ.get("RETRIEVAL_REPS", "2"))

    results: dict[int, list[tuple[float, float]]] = {low: [], high: []}
    lookups: dict[int, list[float]] = {low: [], high: []}
    checks = set()
    for _ in range(reps):
        for cores in (low, high):
            el, lk, n, chk, steal = visit(cores)
            results[cores].append((el, steal))
            lookups[cores].append(lk)
            checks.add((n, chk))
    assert len(checks) == 1, (
        f"integer postings diverged across parallelism: {checks}"
    )
    n = next(iter(checks))[0]
    t_low, steal_low = min(results[low])
    t_high, steal_high = min(results[high])
    eff = (t_low / t_high) / (high / low)
    n_tokens = N_DOCS * TOK_PER_DOC
    print(json.dumps({
        "metric": "retrieval_index_build_scaling",
        "n_docs": N_DOCS, "n_tokens": n_tokens, "n_postings": n,
        "low_cores": low, "high_cores": high,
        "wall_low_s": round(t_low, 2), "wall_high_s": round(t_high, 2),
        "tokens_per_sec_low": round(n_tokens / t_low, 1),
        "tokens_per_sec_high": round(n_tokens / t_high, 1),
        "scaling_efficiency": round(eff, 3),
        "bm25_lookup_s_low": round(min(lookups[low]), 3),
        "bm25_lookup_s_high": round(min(lookups[high]), 3),
        "steal_pct_low": round(steal_low, 1),
        "steal_pct_high": round(steal_high, 1),
        "interleaved_reps": reps,
        "all_walls": {str(c): [round(e, 2) for e, _ in results[c]]
                      for c in (low, high)},
        "bit_identical_across_parallelism": True,
    }))


if __name__ == "__main__":
    main()
