"""Inverted postings + BM25 retrieval over the document corpus.

A web-text engine that curates training data also has to FIND things
in it — decontamination audits ("which documents mention this eval
phrase?"), corpus QA, and retrieval-augmented pipelines all reduce to
an inverted index plus a ranked lookup. The classic shape (Robertson &
Zaragoza, Found. Trends IR 2009) maps cleanly onto Spark:

- the "index" is not a driver-side data structure but a LAYOUT: a
  postings table (term, doc_id, tf, dl) written bucketed+sorted on
  term (prepare_postings), so a term lookup scans only the buckets
  that can hold the term and parquet min/max row-group stats skip the
  rest — no collect_list posting arrays anywhere, the sorted table IS
  the posting list;
- corpus statistics (N, total length) are computed ONCE at index
  build (corpus_stats) and ride as a one-row broadcast, the same
  shape as the IVF codebook;
- a query is a handful of terms: the postings filter is an InSet
  pushed into the scan, document frequencies for the query terms are
  a tiny broadcast, and the final top-k is TakeOrderedAndProject —
  never a full sort.

Determinism contract (the oracle gate, same discipline as
curation.lm_score): each (doc, term) partial score is rounded to 6
decimals, collected as (term, score) structs, sorted, and summed by
an explicit left fold — one defined double-accumulation order that
DuckDB reproduces bit-for-bit, where a groupBy sum(double) would be
partition-order dependent.

Reference: no analog (go-htmldate has no retrieval layer); public
literature: Robertson/Zaragoza 2009 (BM25), Lucene's positive idf
variant ln(1 + (N - df + 0.5)/(df + 0.5)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# letter/digit runs on the lowercased text: the same RE2 class works
# verbatim in the DuckDB oracle's regexp_extract_all
TOKEN_RX = r"[a-z0-9]+"


def build_postings(
    docs: DataFrame, doc_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, text) → postings (term, doc_id, tf, dl): term frequency
    per document with the document length (total token count)
    denormalized onto every row, so scoring never joins a separate
    doc-length table. One tokenize-explode (Generate, codegen) and one
    (term, doc)-keyed aggregation — the single shuffle an index build
    pays: dl is size(token array), stamped on every exploded row
    before the shuffle and carried through the aggregation as a
    constant-per-group max, so it rides the SAME exchange (an earlier
    doc-keyed window here was a second full exchange + sort and capped
    the build's scaling at ~0.72)."""
    toks = F.expr(
        f"regexp_extract_all(lower({text_col}), '{TOKEN_RX}', 0)"
    )
    return (
        docs.select(F.col(doc_col).alias("doc_id"), toks.alias("_t"))
        .select(
            "doc_id",
            F.size("_t").cast("long").alias("dl"),
            F.explode("_t").alias("term"),
        )
        .groupBy("term", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf"),
            F.max("dl").alias("dl"),  # constant per doc: rides the exchange
        )
        .select("term", "doc_id", "tf", "dl")
    )


def prepare_postings(
    postings: DataFrame,
    table: str,
    n_buckets: int | None = None,
    path: str | None = None,
) -> DataFrame:
    """Persist postings ONCE bucketed AND sorted on term — the lookup
    substrate. A query-term InSet prunes to the buckets that can hold
    each term, and the in-bucket sort gives parquet min/max row-group
    skipping inside them: a lookup reads O(matching postings), not the
    corpus. Same one-file-per-bucket discipline as prepare_host_edges."""
    spark = postings.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    writer = (
        postings.repartition(n_buckets, "term")
        .write.bucketBy(n_buckets, "term").sortBy("term")
        .mode("overwrite").format("parquet")
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    return spark.table(table)


def corpus_stats(postings: DataFrame) -> DataFrame:
    """One-row (n_docs, avgdl) frame, computed ONCE at index build and
    broadcast at query time. dl repeats on every posting row of a doc,
    so the doc-level pass dedups first — O(postings) once, never per
    query."""
    per_doc = postings.groupBy("doc_id").agg(F.first("dl").alias("dl"))
    return per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )


def bm25_topk(
    postings: DataFrame,
    stats: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Postings + one-row stats + query terms → top-k (doc_id, score)
    by Okapi BM25 with Lucene's positive idf. The postings filter is an
    InSet on term (bucket-pruned + row-group-skipped against a
    prepare_postings table); per-term document frequencies are a
    ≤|query|-row broadcast; ties break on doc_id so the cut at k is
    deterministic. Per-doc summation follows the lm_score fold-order
    contract: round-6 partial scores, sort_array, explicit left fold."""
    if not query_terms:
        raise ValueError("need at least one query term")
    terms = sorted({t.lower() for t in query_terms})
    hits = postings.filter(F.col("term").isin(terms))
    df_t = hits.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tfn = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        hits.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id", "term", F.round(idf * tfn, 6).alias("_s"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sort_array(F.collect_list(F.struct("term", "_s"))).alias("_ss"),
    )
    total = F.round(
        F.aggregate(F.col("_ss"), F.lit(0.0), lambda a, x: a + x["_s"]), 6
    )
    return (
        per_doc.select("doc_id", "n_terms", total.alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
