"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale notes (the 100 TB story):
- exact: one shuffle on the 128-bit content hash; map-side partial agg
  makes the shuffle carry one row per distinct hash per partition.
- MinHash+LSH: signatures are computed natively (no Python) per row;
  the only shuffle is the band-bucket groupBy, whose fan-in is bounded
  by collecting at most `max_bucket` ids per bucket (skew guard for
  boilerplate pages that all hash together).
- SimHash: 64-bit signature natively via bit ops; near-dup = identical
  signature buckets (probe-friendly at scale; Hamming-radius probing
  can be layered by re-bucketing with masked signatures).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per exact content hash. groupBy (not a
    window) so the partial agg combines map-side before the shuffle."""
    fp = F.md5(F.col(text_col))
    keep = (
        df.select(fp.alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(keep, on=id_col, how="inner").drop("fp")


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Duplicate-group summary: one row per content hash with count and
    representative id."""
    return (
        df.select(F.md5(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("rep_id"))
        .filter(F.col("n_dups") > 1)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _shingle_expr(text_col: str, k: int) -> Column:
    # substring with a dynamic start needs expr-lambda form
    return F.expr(
        f"""
        CASE WHEN length(_norm_{text_col}) >= {k}
        THEN transform(sequence(1, length(_norm_{text_col}) - {k - 1}),
                       i -> substring(_norm_{text_col}, i, {k}))
        ELSE array(_norm_{text_col}) END
        """
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    shingle_k: int = 5,
) -> DataFrame:
    """doc → array<long> of n_hashes minima over xxhash64(seed, shingle).

    Shape: explode shingles once, then n_hashes MIN aggregates. Catalyst
    would otherwise re-inline the shingling expression into every seed's
    lambda (interpreted HOFs have no common-subexpression elimination) —
    the explode evaluates it exactly once per document, and the groupBy
    combines map-side, so the shuffle carries one signature row per doc."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    out = df.withColumn(f"_norm_{text_col}", norm)
    shingles = _shingle_expr(text_col, shingle_k)
    exploded = out.select(
        F.col(id_col), F.explode(F.array_distinct(shingles)).alias("_sh")
    )
    mins = [
        F.min(F.xxhash64(F.lit(seed), F.col("_sh"))).alias(f"_m{seed}")
        for seed in range(n_hashes)
    ]
    return exploded.groupBy(id_col).agg(*mins).select(
        F.col(id_col),
        F.array(*[F.col(f"_m{seed}") for seed in range(n_hashes)]).alias("minhash"),
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    max_bucket: int = 64,
) -> DataFrame:
    """Band the signatures, bucket-join, emit candidate near-dup pairs
    (a < b). max_bucket caps pathological buckets (boilerplate skew)."""
    n_hashes = bands  # rows per band derived below
    sig = F.col("minhash")
    rows_per_band = F.size(sig) / F.lit(bands)

    banded = signatures.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.slice(
                            sig,
                            (b * rows_per_band + 1).cast("int"),
                            rows_per_band.cast("int"),
                        ).cast("array<string>"),
                    ),
                    b,
                ),
            )
        ).alias("band", "bucket"),
    )
    buckets = (
        banded.groupBy("band", "bucket")
        .agg(F.slice(F.sort_array(F.collect_list(id_col)), 1, max_bucket).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    lambda a: F.transform(
                        F.filter(F.col("ids"), lambda b: b > a),
                        lambda b: F.struct(a.alias("a"), b.alias("b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.a", "p.b").distinct()
    return pairs


def minhash_jaccard_estimate(
    signatures: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Estimated Jaccard from signature agreement for candidate pairs."""
    sa = signatures.select(F.col(id_col).alias("a"), F.col("minhash").alias("sig_a"))
    sb = signatures.select(F.col(id_col).alias("b"), F.col("minhash").alias("sig_b"))
    joined = pairs.join(sa, "a").join(sb, "b")
    agree = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    return joined.select(
        "a", "b", (agree.cast("double") / F.size("sig_a")).alias("est_jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash natively: per token hash, add ±1 per bit position,
    sign-aggregate. SQL-lambda form because the Python shiftright wrapper
    only accepts constant bit counts."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    with_hashes = df.select(
        F.col(id_col),
        F.transform(F.split(norm, " "), lambda t: F.xxhash64(t)).alias("_hashes"),
    )
    sh = F.expr(
        """
        aggregate(
          transform(sequence(0, 63), b ->
            CASE WHEN aggregate(_hashes, 0,
                   (acc, h) -> acc + CASE WHEN shiftright(h, b) & 1 = 1
                                     THEN 1 ELSE -1 END) > 0
                 THEN shiftleft(1L, b) ELSE 0L END),
          0L, (acc, x) -> acc | x)
        """
    )
    return with_hashes.select(F.col(id_col), sh.alias("simhash"))


def simhash_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-dup groups = identical simhash (radius-0 buckets)."""
    return (
        simhash(df, text_col, id_col)
        .groupBy("simhash")
        .agg(F.count("*").alias("n"), F.min(id_col).alias("rep_id"))
        .filter(F.col("n") > 1)
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, for candidate verification / small scopes)
# ---------------------------------------------------------------------------

def token_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    key_col: str = "source",
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Exact distinct-token Jaccard for pairs sharing `key_col` (co-group
    key bounds the quadratic blowup; at scale the key is an LSH bucket)."""
    toks = df.select(
        F.col(id_col),
        F.col(key_col),
        F.array_distinct(
            F.split(F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))), " ")
        ).alias("toks"),
    )
    a = toks.select(
        F.col(key_col), F.col(id_col).alias("a"), F.col("toks").alias("toks_a")
    )
    b = toks.select(
        F.col(key_col), F.col(id_col).alias("b"), F.col("toks").alias("toks_b")
    )
    pairs = a.join(b, key_col).filter(F.col("a") < F.col("b"))
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size("toks_a") + F.size("toks_b") - inter
    jac = F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(
        F.lit(0.0)
    )
    return pairs.select(
        "a", "b", F.round(jac, 6).alias("jaccard")
    ).filter(F.col("jaccard") >= min_jaccard)
