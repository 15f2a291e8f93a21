"""DUST detection: mining URL-alias rewrite rules from content
duplicates ("Do not crawl in the DUST: different URLs with similar
text", Bar-Yossef, Keidar & Schonfeld, WWW 2007).

A crawl that fetches both `/story/42` and `/story/42?sessionid=x93`
wastes its politeness budget. The DustBuster insight is that such
aliases are *systematic* — one substring substitution rule
(alpha → beta) explains thousands of duplicate pairs — so the rules
can be mined once from the duplicates a crawl has already observed
and then applied to canonicalize URLs BEFORE they are fetched.

Spark-first shape (no reference analog; the reference is a
single-document extractor):

1. distinct (url, content_sig) — one shuffle on the sig key;
2. per-sig duplicate buckets capped at `max_group` smallest URLs with
   a row_number window BEFORE any aggregation buffer materializes the
   bucket (same mega-bucket discipline as the LSH pair generator:
   a parked domain serving one page under 10^7 URLs caps at
   max_group, it cannot OOM an executor);
3. bucket-local pair generation (collect_list + nested transform —
   never a self-join of the full table);
4. rule extraction per pair via the position-explode trick: explode
   sequence(1, least(len)) once per pair and take the MIN mismatch
   position for the forward string (longest common prefix) and the
   reversed string (longest common suffix) in ONE aggregation — all
   whole-stage-codegen'd expressions, no lambda HOFs on the hot path
   (interpreted), no Python anywhere;
5. support counting: one shuffle on the (alpha, beta) rule key.

Three exchanges total (sig, pair-local explode re-uses the pair key
partitioning, rule key), each on a key that shrinks the data.

Rules are oriented so `alpha` is the longer middle (ties: the
lexicographically greater), i.e. applying alpha→beta always shortens
or canonicalizes — `apply_dust_rules` then rewrites the first
occurrence natively (instr + concat surgery, codegen'd; no regex, so
rule text can contain any metacharacter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dust_rules(
    pages: DataFrame,
    url_col: str = "url",
    sig_col: str = "content_sig",
    max_group: int = 32,
    min_support: int = 2,
) -> DataFrame:
    """(url, content_sig) observations → (alpha, beta, support):
    substring substitution rules alpha→beta, each supported by
    `support` distinct same-content URL pairs, support >= min_support.

    alpha/beta are the differing middles after stripping the longest
    common prefix and (non-overlapping) longest common suffix of each
    pair; oriented so (length, lexicographic) of alpha >= beta."""
    # Zero-length URLs are dropped up front: an empty string in a
    # duplicate bucket would give the position explode an empty range
    # (F.sequence(1, 0) yields a DESCENDING [1, 0], letting position 0
    # into the mismatch scan and invalidating the lcp/lcs algebra).
    dup = (
        pages.select(F.col(url_col).alias("url"), F.col(sig_col).alias("sig"))
        .filter(F.length("url") > 0)
        .distinct()
    )

    # cap each duplicate bucket BEFORE the collect (mega-bucket guard)
    w = Window.partitionBy("sig").orderBy(F.col("url").asc())
    capped = (
        dup.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_group)
        .drop("_rn")
    )
    buckets = (
        capped.groupBy("sig")
        .agg(F.sort_array(F.collect_list("url")).alias("urls"))
        .filter(F.size("urls") > 1)
    )
    pairs = (
        buckets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("urls"),
                        lambda a: F.transform(
                            F.filter(F.col("urls"), lambda b: b > a),
                            lambda b: F.struct(a.alias("a"), b.alias("b")),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .distinct()
    )

    # longest common prefix / suffix via ONE position explode per pair:
    # min position where the forward (reversed) characters differ.
    # sequence+explode+substring are all codegen'd; the groupBy key is
    # the pair itself so the aggregation is pair-local.
    m = F.least(F.length("a"), F.length("b"))
    pos = pairs.select(
        "a",
        "b",
        F.explode(F.sequence(F.lit(1), m)).alias("p"),
    )
    mism = pos.groupBy("a", "b").agg(
        F.coalesce(
            F.min(
                F.when(
                    F.expr("substring(a, p, 1) <> substring(b, p, 1)"),
                    F.col("p"),
                )
            ),
            F.least(F.length("a"), F.length("b")) + 1,
        ).alias("_fm"),
        F.coalesce(
            F.min(
                F.when(
                    F.expr(
                        "substring(reverse(a), p, 1) <> substring(reverse(b), p, 1)"
                    ),
                    F.col("p"),
                )
            ),
            F.least(F.length("a"), F.length("b")) + 1,
        ).alias("_rm"),
    )

    # lcp = _fm - 1; lcs = least(_rm - 1, min_len - lcp) — the least()
    # keeps prefix and suffix from overlapping on the shorter string;
    # middles are what's left between them on each side
    mids = mism.select(
        F.expr(
            "substring(a, _fm, greatest(0, length(a) - (_fm - 1) "
            "- least(_rm - 1, least(length(a), length(b)) - (_fm - 1))))"
        ).alias("x"),
        F.expr(
            "substring(b, _fm, greatest(0, length(b) - (_fm - 1) "
            "- least(_rm - 1, least(length(a), length(b)) - (_fm - 1))))"
        ).alias("y"),
    )

    # orient: alpha = the (longer, then lexicographically greater) middle
    swap = (F.length("y") > F.length("x")) | (
        (F.length("y") == F.length("x")) & (F.col("y") > F.col("x"))
    )
    oriented = mids.select(
        F.when(swap, F.col("y")).otherwise(F.col("x")).alias("alpha"),
        F.when(swap, F.col("x")).otherwise(F.col("y")).alias("beta"),
    )
    return (
        oriented.groupBy("alpha", "beta")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= min_support)
    )


def apply_dust_rules(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    min_support: int = 2,
    max_rules: int = 256,
) -> DataFrame:
    """Rewrite each URL by its best applicable rule (one pass):
    highest support, then longest alpha, then lexicographic.
    Replacement is first-occurrence via instr + concat surgery
    (native, regex-free — rule text may contain any metacharacter).
    Rules with empty alpha (pure insertions) never apply — nothing to
    anchor on.

    Scale shape: the rule table is the OUTPUT of a support threshold
    over an entire crawl's duplicate pairs — a few hundred rows by
    construction at any corpus size — so the top-`max_rules` list is
    collected once (bounded driver state, same discipline as the bloom
    shards) and compiled into ONE priority-ordered chained-`when`
    column expression. Application is then map-only whole-stage
    codegen over the URL table: zero exchanges, zero Python, no
    broadcast-nested-loop join against a rule relation."""
    top = collect_top_rules(rules, min_support=min_support, max_rules=max_rules)
    u = F.col(url_col)
    canonical, support = dust_rewrite_exprs(u, top)
    return urls.select(
        u.alias(url_col),
        canonical.alias("canonical_url"),
        support.cast("long").alias("rule_support"),
    )


def collect_top_rules(
    rules: DataFrame, min_support: int = 2, max_rules: int = 256
) -> list:
    """Materialize the bounded, priority-ordered rule list (highest
    support, then longest alpha, then lexicographic; empty-alpha
    insertion rules dropped — nothing to anchor a rewrite on)."""
    return (
        rules.filter(
            (F.col("support") >= min_support) & (F.length("alpha") > 0)
        )
        .orderBy(
            F.col("support").desc(),
            F.length("alpha").desc(),
            F.col("alpha").asc(),
            F.col("beta").asc(),
        )
        .limit(max_rules)
        .collect()
    )


def dust_rewrite_exprs(u, top: list):
    """Compile a collected rule list into (canonical, support) column
    expressions over the url column `u` — the map-only application
    the scheduler splices into its discovery stream.

    Rewrites are scoped to everything AFTER the scheme marker
    ('scheme://'): path-anchored rules (alpha starting '/') can then
    never fire inside the authority — a hostname contains no '/' — so
    '/index.html'→'' leaves 'https://index.html.example/…' intact,
    while host-alias rules like 'www.'→'' (DustBuster's flagship
    mirror case) still collapse the authority. The residual ambiguity
    (a dot-rule matching inside a path segment) is inherent to
    substring rules without the paper's fetch-validation step and is
    bounded by the support threshold. Non-hierarchical strings have an
    empty scheme match and rewrite whole, as before."""
    auth = F.regexp_extract(
        u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", 0
    )
    rest = F.substring(u, F.length(auth) + 1, F.length(u))
    canonical_rest = rest
    support = F.lit(0)
    # build the chain INNERMOST-first so the highest-priority rule ends
    # up as the outermost when — first match in priority order wins
    for r in reversed(top):
        a, b = F.lit(r["alpha"]), F.lit(r["beta"])
        hit = F.instr(rest, a) > 0
        rewrite = F.concat(
            F.substring(rest, F.lit(1), F.instr(rest, a) - 1),
            b,
            F.substring(
                rest, F.instr(rest, a) + F.length(a), F.length(rest)
            ),
        )
        canonical_rest = F.when(hit, rewrite).otherwise(canonical_rest)
        support = F.when(hit, F.lit(r["support"])).otherwise(support)
    return F.concat(auth, canonical_rest), support
