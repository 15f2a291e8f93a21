"""Two-parallelism scaling point for the WARC ingestion edge (the
north-rule two-cluster-size proxy applied to sources/warc.py): write a
replicated corpus as gzip-member WARC shards ONCE with the distributed
export sink, then time the distributed read (gzip + WARC header parse +
HTTP split) of the same files at local[N] and local[4N], reporting
records/s and MB/s at both plus scaling efficiency
(eff = T_N / (4 * T_4N); 1.0 = perfect).

The shard files live on disk between runs, so both levels read
byte-identical input; determinism is asserted on record count and total
payload bytes. Shards ≫ cores (file-granular parallelism), which is the
Common Crawl deployment shape — ~100k files against any cluster size.

Usage: python scripts/bench_warc_scale.py [low_cores] [high_cores]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICATE = int(os.environ.get("WARC_REPLICATE", "40"))
N_SHARDS = int(os.environ.get("WARC_SHARDS", "64"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def materialize_shards(spark, out_dir: str) -> None:
    """Replicated documents → WARC shards via the export sink (untimed:
    a crawl store's files exist ahead of any read)."""
    import pyspark.sql.functions as F

    from go_htmldate_spark.sources.warc import write_warc_shards

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    corpus = None
    for k in range(REPLICATE):
        rep = base.select(
            (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" r{k}")).alias("text"),
            "lang",
        )
        corpus = rep if corpus is None else corpus.unionByName(rep)
    pages = corpus.select(
        F.concat(F.lit("https://warc.example/"), F.col("lang"), F.lit("/doc-"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.concat(F.lit("<html><body><p>"), F.col("text"),
                 F.lit("</p></body></html>")).cast("binary").alias("html"),
    )
    write_warc_shards(pages, out_dir, n_shards=N_SHARDS)


def run_read(spark, warc_dir: str) -> tuple[int, int]:
    import pyspark.sql.functions as F

    from go_htmldate_spark.sources.warc import read_warc

    row = (
        read_warc(spark, os.path.join(warc_dir, "*.warc.gz"))
        .agg(F.count("*").alias("n"),
             F.sum(F.length("payload")).alias("payload_bytes"))
        .head()
    )
    return int(row["n"]), int(row["payload_bytes"])


def time_at(cores: int, warc_dir: str) -> tuple[float, int, int]:
    from go_htmldate_spark.session import get_spark

    spark = get_spark(
        app_name=f"warc-scale-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
    )
    try:
        if not os.path.exists(os.path.join(warc_dir, "_DONE")):
            materialize_shards(spark, warc_dir)
            with open(os.path.join(warc_dir, "_DONE"), "w") as f:
                f.write("ok")
        run_read(spark, warc_dir)  # warm: codegen + python workers
        best = None
        n = payload = 0
        for _ in range(2):
            t0 = time.time()
            n, payload = run_read(spark, warc_dir)
            el = time.time() - t0
            best = el if best is None or el < best else best
        return best, n, payload
    finally:
        spark.stop()


def main() -> None:
    import shutil
    import tempfile

    low = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    high = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    warc_dir = tempfile.mkdtemp(prefix="warc_scale_")
    try:
        t_low, n_low, b_low = time_at(low, warc_dir)
        t_high, n_high, b_high = time_at(high, warc_dir)
        assert (n_low, b_low) == (n_high, b_high), "read not deterministic"
        disk_bytes = sum(
            os.path.getsize(os.path.join(warc_dir, p))
            for p in os.listdir(warc_dir) if p.endswith(".warc.gz")
        )
        eff = (t_low / t_high) / (high / low)
        print(json.dumps({
            "metric": "warc_read_scaling",
            "n_records": n_low,
            "payload_mb": round(b_low / 1e6, 1),
            "gzip_disk_mb": round(disk_bytes / 1e6, 1),
            "n_shards": N_SHARDS,
            "low_cores": low, "high_cores": high,
            "wall_low_s": round(t_low, 2), "wall_high_s": round(t_high, 2),
            "records_per_sec_low": round(n_low / t_low, 1),
            "records_per_sec_high": round(n_low / t_high, 1),
            "scaling_efficiency": round(eff, 3),
        }))
    finally:
        shutil.rmtree(warc_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
