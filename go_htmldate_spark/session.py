"""SparkSession factory with the engine's standard configuration.

Arrow on (the extraction kernel is an Arrow-batched pandas UDF), AQE on
(runtime re-planning, skew-join splitting), modest Arrow batch size
(HTML payloads are tens of KB per row — bound executor memory, see
SURVEY.md §4.2).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "go-htmldate-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    # Scan split size. The sf inputs are one parquet file per table with
    # row groups of ~13-25 MB; the 128 MB default packs them into 1-2
    # scan tasks, serializing every downstream projection (guide §6.1).
    # 16 MB locally splits each row group into its own task; production
    # (100 TB, many large files) should RAISE this toward 512m-1g via
    # the env var — more bytes per task, fewer map tasks feeding each
    # shuffle (guide §2.2) — which is why it is parameterised rather
    # than hard-coded.
    max_part = os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "16m")
    # Floor on scan parallelism (guide §6.1): without it the split
    # packer bundles small files — e.g. the WARC/WET gzip shards, one
    # parse task per FILE — into a couple of tasks (each file charged
    # openCostInBytes=4m against the 16m split). A floor of one split
    # per core spreads multi-file reads without touching row-group
    # bound parquet scans.
    min_parts = os.environ.get("SPARK_GRAFT_MIN_PARTITION_NUM", cpus)
    # Shuffle/scratch directory. This sandbox's disk is the noisy
    # resource (multi-second I/O-wait phases while CPUs idle), so
    # shuffle files and spills default to tmpfs when /dev/shm exists —
    # RAM-backed, bounded by the same memory budget the block manager
    # already uses. Production nodes with real local SSDs should point
    # SPARK_GRAFT_LOCAL_DIR at them (guide §2.1: local disk bandwidth
    # for shuffle files can be the tighter limit).
    default_local = "/dev/shm/spark_graft_tmp" if os.path.isdir("/dev/shm") \
        else None
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR", default_local)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    return (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.files.maxPartitionBytes", max_part)
        .config("spark.sql.files.minPartitionNum", str(min_parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # NOTE (r06): AQE sizes post-shuffle partitions by BYTES, so a
        # byte-small aggregate feeding CPU-heavy per-row work coalesces
        # onto 1-2 cores; a global minPartitionSize=256k was A/B'd and
        # REVERTED (neutral-to-worse — it adds tasks to every small
        # stage), in favor of explicit round-robin spreads at the three
        # measured hot spots (bucket pair fan-outs in dedup/similarity).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.session.timeZone", "UTC")
        # local mode runs every task thread in the driver JVM: size the
        # heap for the thread count or 32 string-heavy tasks GC-thrash
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
