"""Crawl frontier + date-aware fetch scheduler [north-rule].

Batch round loop over snapshot-versioned Parquet state (an
Iceberg-snapshot layout stand-in — no Iceberg runtime jars in this
sandbox; the semantics: every round is fully resumable from its
snapshot directory, with per-partition lineage in a manifest).

Round r:
  1. candidates   = pending frontier entries
  2. URL-seen     = bloom pre-filter (definitely-new skips the join)
                    + exact left-anti join backstop on url_hash
  3. robots       = broadcast join per host, longest-prefix rule
  4. priority     = politeness_budget(host) × recency(parent page date)
  5. politeness   = per-host top-k (k = floor(budget)), salted two-phase
                    rank for heavy hosts (exact: per-salt top-k ⊇ host top-k)
  6. fetch        = join the pages corpus on url (the sandbox "network"),
                    run the staged date-extraction engine
  7. discovery    = explode outlinks → canonicalize → hash → new pending
  8. state update = seen ∪ fetched∪missing; blooms merged; frontier =
                    (pending ∖ scheduled) ∪ discovered (max-priority dedup)

Ordering within a round is fully deterministic: (priority DESC, url ASC).
The single-threaded oracle (plans/oracle.py) implements the same spec;
tests assert identical per-round fetch lists and final URL-seen sets.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .bloom import build_blooms, merge_blooms, probe_blooms
from .canonical import canonicalize_url, url_hash, url_host, url_path

REF_DATE = "2024-06-01"


@dataclass
class CrawlConfig:
    n_bloom_partitions: int = 16
    bloom_bits: int = 1 << 20
    salt_threshold: int = 10_000   # pending-per-host above which we salt
    n_salts: int = 8
    default_budget: float = 2.0
    no_date_recency: float = 0.1
    # below this seen-set size the bloom pre-filter costs more jobs than
    # the exact anti-join it would skip; it's rebuilt from `seen` once the
    # threshold is crossed (the filter is advisory, never correctness)
    bloom_min_seen: int = 50_000


def recency_score(date_col):
    """1/(1 + age_years); pages without a date get a fixed low score.
    Same IEEE double arithmetic as the oracle's Python implementation."""
    age_days = F.greatest(
        F.lit(0), F.datediff(F.lit(REF_DATE).cast("date"), date_col.cast("date"))
    )
    return F.when(
        date_col.isNotNull() & (date_col != ""),
        F.lit(1.0) / (F.lit(1.0) + age_days.cast("double") / F.lit(365.0)),
    ).otherwise(F.lit(CrawlConfig.no_date_recency))


def robots_allowed(path_col, rules_col):
    """Longest-prefix rule wins; length ties prefer allow; no match ⇒
    allow. Native lambda expressions only."""
    matched = F.filter(
        rules_col, lambda r: path_col.startswith(r["path_prefix"])
    )
    best = F.array_max(
        F.transform(
            matched,
            lambda r: F.struct(
                F.length(r["path_prefix"]).alias("l"),
                r["allow"].cast("int").alias("a"),
            ),
        )
    )
    return best.isNull() | (best["a"] == 1)


class CrawlScheduler:
    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        robots: DataFrame | None,
        host_budget: DataFrame | None,
        state_dir: str,
        config: CrawlConfig = CrawlConfig(),
    ) -> None:
        self.spark = spark
        self.config = config
        self.state_dir = state_dir
        # the fetchable universe, keyed by canonical url
        self.pages = pages.withColumn("url_canon", canonicalize_url(F.col("url")))
        self.robots = robots
        self.host_budget = host_budget
        self.round = 0
        self.frontier: DataFrame | None = None
        self.seen: DataFrame | None = None
        self.blooms: DataFrame | None = None

    # -- state bootstrap ---------------------------------------------------
    def init_from_seeds(self, seeds: DataFrame) -> None:
        """seeds(url, priority)"""
        canon = seeds.select(
            canonicalize_url(F.col("url")).alias("url"), F.col("priority")
        )
        self.frontier = (
            canon.select(
                "url",
                url_hash(F.col("url")).alias("url_hash"),
                url_host(F.col("url")).alias("host"),
                F.col("priority").cast("double").alias("priority"),
            )
            .groupBy("url", "url_hash", "host")
            .agg(F.max("priority").alias("priority"))
            # co-partition by hash from the start: seed lists often arrive
            # as a single-partition LIMIT, which would serialize round 0
            .repartition(
                self.spark.sparkContext.defaultParallelism, "url_hash"
            )
        )
        self.seen = self.spark.createDataFrame([], "url_hash long")
        self.blooms = build_blooms(
            self.spark.createDataFrame([], "url_hash long"),
            self.config.n_bloom_partitions,
            self.config.bloom_bits,
        )
        self._seen_count = 0
        self.round = 0

    # -- resume ------------------------------------------------------------
    def resume(self) -> int:
        """Load the latest complete snapshot; returns the next round no."""
        rounds = []
        for name in os.listdir(self.state_dir):
            mf = os.path.join(self.state_dir, name, "manifest.json")
            if name.startswith("round_") and os.path.exists(mf):
                rounds.append(int(name.split("_")[1]))
        if not rounds:
            raise FileNotFoundError(f"no snapshots under {self.state_dir}")
        r = max(rounds)
        base = os.path.join(self.state_dir, f"round_{r}")
        self.frontier = self.spark.read.parquet(f"{base}/frontier")
        self.seen = self.spark.read.parquet(f"{base}/seen")
        self.blooms = self.spark.read.parquet(f"{base}/blooms")
        with open(f"{base}/manifest.json") as f:
            self._seen_count = json.load(f)["n_seen"]
        self.round = r + 1
        return self.round

    # -- one round ---------------------------------------------------------
    def run_round(self) -> dict:
        cfg = self.config
        t0 = time.time()

        pending = self.frontier

        # 2. URL-seen: bloom pre-filter (once the seen set is big enough
        # to be worth it), exact anti-join backstop either way
        if self._seen_count >= cfg.bloom_min_seen:
            probed = probe_blooms(
                pending, self.blooms, cfg.n_bloom_partitions, cfg.bloom_bits
            )
            definitely_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
            maybe = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
            confirmed_new = maybe.join(self.seen, "url_hash", "left_anti")
            candidates = definitely_new.unionByName(confirmed_new)
        else:
            candidates = pending.join(self.seen, "url_hash", "left_anti")

        # 3. robots (broadcast join per host)
        if self.robots is not None:
            candidates = candidates.join(
                F.broadcast(self.robots), "host", "left"
            ).filter(
                F.col("rules").isNull()
                | robots_allowed(url_path(F.col("url")), F.col("rules"))
            ).drop("rules", "crawl_delay")

        # 4-5. politeness budget + per-host top-k (salted two-phase)
        if self.host_budget is not None:
            candidates = candidates.join(
                F.broadcast(self.host_budget), "host", "left"
            ).withColumn(
                "budget", F.coalesce("politeness_budget", F.lit(cfg.default_budget))
            ).drop("politeness_budget")
        else:
            candidates = candidates.withColumn("budget", F.lit(cfg.default_budget))

        k = F.floor(F.col("budget")).cast("int")
        # phase 1: rank inside (host, salt) — bounds any single task's sort
        salt = F.pmod(F.col("url_hash"), F.lit(cfg.n_salts))
        w1 = Window.partitionBy("host", "salt").orderBy(
            F.desc("priority"), F.asc("url")
        )
        phase1 = (
            candidates.withColumn("salt", salt)
            .withColumn("r1", F.row_number().over(w1))
            .filter(F.col("r1") <= k)   # per-salt top-k ⊇ per-host top-k
        )
        # phase 2: exact top-k per host over the salted heads
        w2 = Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("url"))
        scheduled = (
            phase1.withColumn("r2", F.row_number().over(w2))
            .filter(F.col("r2") <= k)
            .drop("r1", "r2", "salt", "budget")
        ).cache()  # feeds fetch, seen update, leftover anti-join, manifest

        # 6. fetch + extract
        from ..operators.extract import extract_dates
        from ..options import Options

        # shuffle-hash: build on the (small) scheduled side, stream the
        # corpus — sort-merge would sort the html-payload side
        corpus = self.pages.select("url_canon", "html", "outlinks")
        fetch = scheduled.hint("shuffle_hash").join(
            corpus, scheduled["url"] == corpus["url_canon"], "left"
        )
        fetched = fetch.filter(F.col("url_canon").isNotNull())
        # repartition before the UDF: AQE sizes post-join partitions by
        # bytes, but extraction cost is per-row CPU — without this the
        # Python stage runs on a handful of coalesced partitions
        n_part = self.spark.sparkContext.defaultParallelism * 2
        extracted = extract_dates(
            fetched.select(
                "url", "url_hash", "host", "priority", "html", "outlinks"
            ).repartition(n_part),
            Options(skip_extensive_search=True),
        ).cache()

        # 7. discovery
        discovered = (
            extracted.select(
                F.col("date").alias("parent_date"),
                F.explode("outlinks").alias("out_url"),
            )
            .select(
                canonicalize_url(F.col("out_url")).alias("url"),
                recency_score(F.col("parent_date")).alias("recency"),
            )
            .select(
                "url",
                url_hash(F.col("url")).alias("url_hash"),
                url_host(F.col("url")).alias("host"),
                F.col("recency"),
            )
        )
        if self.host_budget is not None:
            discovered = discovered.join(
                F.broadcast(self.host_budget), "host", "left"
            ).withColumn(
                "budget", F.coalesce("politeness_budget", F.lit(cfg.default_budget))
            ).drop("politeness_budget")
        else:
            discovered = discovered.withColumn("budget", F.lit(cfg.default_budget))
        discovered = discovered.select(
            "url", "url_hash", "host",
            (F.col("budget") * F.col("recency")).alias("priority"),
        )

        # 8. state update. Bloom maintenance is adaptive: below the
        # threshold the state stays empty (the exact anti-join covers
        # dedup alone); when crossing it, blooms rebuild from the FULL
        # seen set once, then merge incrementally per round.
        scheduled_hashes = scheduled.select("url_hash")
        new_seen = self.seen.unionByName(scheduled_hashes).distinct()
        n_scheduled = scheduled.count()  # cached; cheap
        new_seen_estimate = self._seen_count + n_scheduled  # upper bound
        if new_seen_estimate >= cfg.bloom_min_seen:
            if self._seen_count < cfg.bloom_min_seen:
                new_blooms = build_blooms(  # first crossing: full rebuild
                    new_seen, cfg.n_bloom_partitions, cfg.bloom_bits
                )
            else:
                new_blooms = merge_blooms(
                    self.blooms,
                    build_blooms(
                        scheduled_hashes, cfg.n_bloom_partitions, cfg.bloom_bits
                    ),
                )
        else:
            new_blooms = self.blooms
        leftover = pending.join(scheduled_hashes, "url_hash", "left_anti")
        new_frontier = (
            leftover.unionByName(discovered)
            .groupBy("url", "url_hash", "host")
            .agg(F.max("priority").alias("priority"))
            # drop anything already seen so the frontier stays bounded
            .join(new_seen, "url_hash", "left_anti")
        )

        # snapshot + manifest (per-partition lineage). Counting happens on
        # the re-read snapshots — cheap metadata-ish scans instead of
        # recomputing the round's DAG once per metric.
        base = os.path.join(self.state_dir, f"round_{self.round}")
        fetch_order = extracted.select("url", "priority", "date").orderBy(
            F.desc("priority"), F.asc("url")
        )
        # the four snapshot writes are independent: submit them as
        # concurrent Spark jobs (threads share the session's scheduler)
        from concurrent.futures import ThreadPoolExecutor

        writes = [
            (fetch_order, f"{base}/fetched"),
            (new_frontier, f"{base}/frontier"),
            (new_seen, f"{base}/seen"),
            (new_blooms, f"{base}/blooms"),
        ]
        with ThreadPoolExecutor(4) as pool:
            list(
                pool.map(
                    lambda w: w[0].write.mode("overwrite").parquet(w[1]), writes
                )
            )

        # reload from snapshot: truncates lineage (no ever-growing plan)
        self.frontier = self.spark.read.parquet(f"{base}/frontier")
        self.seen = self.spark.read.parquet(f"{base}/seen")
        self.blooms = self.spark.read.parquet(f"{base}/blooms")

        stats = self.frontier.groupBy(
            F.spark_partition_id().alias("pid")
        ).agg(F.count("*").alias("n")).collect()
        part_stats = [
            {"partition_id": int(r["pid"]), "rows": int(r["n"])} for r in stats
        ]
        n_fetched = self.spark.read.parquet(f"{base}/fetched").count()
        manifest = {
            "round": self.round,
            "n_scheduled": n_scheduled,
            "n_fetched": n_fetched,
            "n_missing": n_scheduled - n_fetched,
            "n_frontier": sum(p["rows"] for p in part_stats),
            "n_seen": self.seen.count(),
            "wall_ms": int((time.time() - t0) * 1000),
            "frontier_partitions": part_stats,
        }
        with open(f"{base}/manifest.json", "w") as f:
            json.dump(manifest, f)

        self._seen_count = manifest["n_seen"]
        extracted.unpersist()
        scheduled.unpersist()
        self.round += 1
        return manifest

    def run(self, n_rounds: int) -> list[dict]:
        out = []
        for _ in range(n_rounds):
            m = self.run_round()
            out.append(m)
            if m["n_scheduled"] == 0:
                break
        return out
