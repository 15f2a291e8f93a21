"""Mirror-host detection: hosts serving (near-)identical content sets.

Replicated collections — full mirrors, country-TLD clones, CDN
staging hosts — waste a crawl's budget host by host, below the reach
of URL-level dedup (every URL differs). The classic fix (Cho,
Shivakumar & Garcia-Molina, "Finding replicated Web collections",
SIGMOD 2000; Bharat & Broder, WWW 1999) scores host pairs by the
Broder resemblance of their content-fingerprint sets:

    r(A, B) = |S_A ∩ S_B| / |S_A ∪ S_B|

and a scheduler drops or down-budgets the non-canonical side of any
pair above threshold.

Spark-first shape over the (host, content_sig) observations a crawl
already has (no reference analog — the reference is a per-document
extractor):

1. distinct (host, sig) — one shuffle;
2. exact per-host set sizes |S_H| — rides as a second aggregation;
3. per-sig host buckets capped at `max_sig_hosts` smallest hosts with
   a row_number window BEFORE the collect (mega-bucket discipline: a
   boilerplate "empty page" fingerprint shared by 10^6 hosts caps at
   max_sig_hosts instead of generating 10^12 pairs or OOMing the
   aggregation buffer — same guard as the LSH pair generator);
4. bucket-local pair generation with MULTIPLICITY (each shared sig
   contributes one (a, b) row), then one shuffle on the pair key
   counts |S_A ∩ S_B|;
5. two broadcast joins attach the exact set sizes (one row per host —
   broadcast-size at any corpus scale) and compute resemblance via
   inclusion-exclusion |A ∪ B| = |A| + |B| − |A ∩ B|.

Everything is native Catalyst; the only approximation is the
documented cap in step 3 (exact whenever a fingerprint is shared by
<= max_sig_hosts hosts; mega-sig fingerprints are boilerplate, not
mirrors, so truncating them is the semantics you want).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mirror_host_pairs(
    docs: DataFrame,
    host_col: str = "host",
    sig_col: str = "content_sig",
    max_sig_hosts: int = 64,
    min_shared: int = 2,
    min_resemblance: float = 0.25,
) -> DataFrame:
    """(host, content_sig) observations → (host_a, host_b, shared,
    n_a, n_b, resemblance) for host pairs with >= min_shared common
    fingerprints and resemblance >= min_resemblance; host_a < host_b."""
    hs = docs.select(
        F.col(host_col).alias("host"), F.col(sig_col).alias("sig")
    ).distinct()

    sizes = hs.groupBy("host").agg(F.count("*").alias("n"))

    w = Window.partitionBy("sig").orderBy(F.col("host").asc())
    capped = (
        hs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_sig_hosts)
        .drop("_rn")
    )
    buckets = (
        capped.groupBy("sig")
        .agg(F.sort_array(F.collect_list("host")).alias("hosts"))
        .filter(F.size("hosts") > 1)
    )
    # multiplicity preserved: one (a, b) row per shared fingerprint
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("hosts"),
                    lambda a: F.transform(
                        F.filter(F.col("hosts"), lambda b: b > a),
                        lambda b: F.struct(
                            a.alias("host_a"), b.alias("host_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.host_a", "p.host_b")

    shared = (
        pairs.groupBy("host_a", "host_b")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    sa = sizes.select(F.col("host").alias("host_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("host").alias("host_b"), F.col("n").alias("n_b"))
    j = shared.join(F.broadcast(sa), "host_a").join(F.broadcast(sb), "host_b")
    res = F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared"))
    return j.select(
        "host_a",
        "host_b",
        "shared",
        "n_a",
        "n_b",
        res.alias("resemblance"),
    ).filter(F.col("resemblance") >= min_resemblance)


def mirror_demotion(
    pairs: DataFrame,
    threshold: float = 0.9,
    demoted_budget: float = 0.0,
) -> DataFrame:
    """mirror_host_pairs output → (host, politeness_budget) demotion
    rows for the scheduler's budget table: in every pair at or above
    `threshold`, the lexicographically GREATER host is demoted (pairs
    are emitted host_a < host_b, so host_b is always the demoted
    side); a mirror clique a<b<c therefore keeps exactly its minimum
    member. The default budget 0.0 floors to 0 fetches/round — the
    mirror side never schedules. Union the result under the regular
    budget table (this one wins ties by being the lower budget) or
    feed it to CrawlScheduler(host_budget=...) directly.

    One row per demoted host: broadcast-size at any corpus scale,
    like every budget table."""
    return (
        pairs.filter(F.col("resemblance") >= threshold)
        .select(F.col("host_b").alias("host"))
        .distinct()
        .withColumn("politeness_budget", F.lit(float(demoted_budget)))
    )
