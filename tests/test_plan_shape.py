"""Physical-plan shape assertions — the 100 TB levers must stay in the
plan: parquet filter pushdown + column pruning, per-partition top-k
(TakeOrderedAndProject, not a global sort), bounded shuffle counts."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_parquet_pushdown_and_pruning(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    q = orders.filter(F.col("o_orderkey") == 42).select("o_orderkey", "o_orderdate")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)]" in plan
    # column pruning: scan must not read all 6 columns
    assert "o_totalprice" not in plan.split("ReadSchema")[1][:200]


def test_topk_is_take_ordered(spark):
    from go_htmldate_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = [0.1] * 64
    plan = _plan(brute_force_topk(emb, q, k=10))
    assert "TakeOrderedAndProject" in plan  # heap top-k, no global sort


def test_exact_dedup_single_shuffle(spark):
    from go_htmldate_spark.operators.dedup import exact_dup_groups

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(exact_dup_groups(docs))
    # one hash-partitioned exchange for the groupBy, nothing else
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan or "partial" in plan.lower()  # map-side combine


def test_minhash_shuffle_carries_signatures_only(spark):
    from go_htmldate_spark.operators.dedup import minhash_signatures

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    plan = _plan(minhash_signatures(docs, n_hashes=16))
    # partial min aggregates before the exchange = one sig row per doc
    # crosses the wire, not the exploded shingles
    before_exchange = plan.split("Exchange hashpartitioning")[-1]
    assert "partial_min" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_staged_extraction_prunes_columns(spark):
    from go_htmldate_spark.operators.extract import extract_dates
    from go_htmldate_spark.options import Options
    from go_htmldate_spark.sources.pages import synth_pages

    pages = synth_pages(spark, 10, seed=1)
    out = extract_dates(pages, Options()).select("url", "date")
    plan = _plan(out)
    assert "ArrowEvalPython" in plan
    assert "CASE WHEN" in plan  # native URL fast path gates the UDF input


def test_ann_selfjoin_no_cartesian(spark):
    """Batch ANN must stay bucket-joined — no cartesian/nested-loop
    product anywhere in the plan."""
    from go_htmldate_spark.operators.similarity import ann_selfjoin_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")
    plan = _plan(ann_selfjoin_pairs(emb, dim=64, min_cosine=0.9))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_swar_single_shuffle(spark):
    """SWAR simhash groups: one hash-partitioned exchange (the groupBy),
    signature computation fully map-side."""
    from go_htmldate_spark.operators.dedup import simhash_dup_groups

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    plan = _plan(simhash_dup_groups(docs))
    assert plan.count("Exchange hashpartitioning") == 1


def test_budget_ranks_have_no_host_table_global_window(spark):
    """r06: water_fill_budgets / allocation_fairness rank the host
    table through _ranged_rank (range-partitioned rank + broadcast
    offsets), NOT a Window.orderBy over every host — no
    windowspecdefinition may reference the host column without
    partition columns. The surviving unpartitioned windows run over
    the O(distinct demand)/O(n_partitions) stats frames only."""
    import re

    from go_htmldate_spark.plans.budget import (
        allocation_fairness,
        water_fill_budgets,
    )

    c = spark.read.parquet(f"{SF}/customer.parquet")
    demands = c.groupBy(
        F.concat(F.lit("h"), (F.col("c_custkey") % 37).cast("string"))
        .alias("host")
    ).agg(F.sum(F.lit(1) + F.col("c_custkey") % 211).cast("long")
          .alias("demand"))
    wf = water_fill_budgets(demands, 20_000)
    fair = allocation_fairness(wf)
    for plan in (_plan(wf), _plan(fair)):
        # every window spec that mentions a host-derived column must be
        # the tiny stats cumsum (_pid) or demand-level cumsum (demand),
        # never an order over host rows
        for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
            assert "host" not in spec and "_h" not in spec, spec


def test_ivf_topk_map_only_probe(spark):
    """IVF probe: codebook + query ride a broadcast row; the corpus side
    is a pruned map-only scan feeding a heap top-k — no hash-partitioned
    exchange anywhere."""
    from go_htmldate_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _plan(ivf_topk(emb, query_id=3, k=10))
    assert plan.count("Exchange hashpartitioning") == 0
    assert "TakeOrderedAndProject" in plan


def test_ivf_partitioned_write_prunes_scan(spark, tmp_path_factory):
    """The IVF scale path: corpus written partitionBy(cluster) turns the
    probe filter into partition pruning — the scan reads nprobe/nlist of
    the data, visible as PartitionFilters in the plan."""
    import pyspark.sql.functions as F

    from go_htmldate_spark.operators.similarity import ivf_assign

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = str(tmp_path_factory.mktemp("ivf") / "bucketed")
    emb.join(ivf_assign(emb, n_centroids=16), "vec_id").write.partitionBy(
        "cluster"
    ).parquet(out)

    probed = spark.read.parquet(out).filter(F.col("cluster").isin([1, 5, 9]))
    plan = _plan(probed)
    assert "PartitionFilters" in plan and "cluster" in plan.split(
        "PartitionFilters"
    )[1][:80]
    # pruned scan touches only the probed clusters' rows
    asg = {r["cluster"] for r in probed.select("cluster").distinct().collect()}
    assert asg == {1, 5, 9}


def test_bucket_pairs_cap_shares_exchange(spark):
    """The row_number pre-cap in bucket_candidate_pairs must ride the
    SAME (band, bucket) exchange as the collect_list groupBy — exactly
    one (band, bucket) exchange plus the final pair-distinct exchange,
    nothing more. This is the mega-bucket OOM guard's plan contract."""
    from go_htmldate_spark.operators.dedup import bucket_candidate_pairs

    banded = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("int").alias("band"),
        (F.col("id") % 7).alias("bucket"),
    )
    plan = _plan(bucket_candidate_pairs(banded, "doc_id", 16))
    assert plan.count("Exchange hashpartitioning") == 2  # (band,bucket) + distinct
    assert "row_number" in plan  # cap applied pre-collect


def test_bucket_pairs_mega_bucket_bounded(spark):
    """A single boilerplate bucket with 200k members (the 100 TB skew
    hazard) must be cut to max_bucket rows BEFORE aggregation: the pair
    count is exactly C(max_bucket, 2) over the SMALLEST ids, and the job
    completes without materializing a 200k-element aggregation buffer."""
    from go_htmldate_spark.operators.dedup import bucket_candidate_pairs

    n, cap = 200_000, 32
    banded = spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        F.lit(0).alias("band"),
        F.lit(0).cast("long").alias("bucket"),
    )
    pairs = bucket_candidate_pairs(banded, "doc_id", cap).collect()
    assert len(pairs) == cap * (cap - 1) // 2
    # survivors are the cap smallest ids
    assert max(max(r["a"], r["b"]) for r in pairs) == cap - 1


def test_ivf_pruned_probe_matches_and_prunes(spark, tmp_path_factory):
    """ivf_topk_pruned over a materialized partitionBy(cluster) table:
    result must equal the on-the-fly ivf_topk for the same query, and
    the TIMED plan must carry PartitionFilters on cluster (the scan
    reads nprobe/nlist of the files, not the corpus)."""
    from go_htmldate_spark.operators.similarity import (
        ivf_assign,
        ivf_codebook_local,
        ivf_topk,
        ivf_topk_pruned,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = str(tmp_path_factory.mktemp("ivfp") / "parted")
    emb.join(ivf_assign(emb, n_centroids=16), "vec_id").write.partitionBy(
        "cluster"
    ).parquet(out)
    parted = spark.read.parquet(out)

    codebook = ivf_codebook_local(emb, n_centroids=16)
    qvec = list(emb.filter(F.col("vec_id") == 3).head()["embedding"])
    pruned = ivf_topk_pruned(parted, codebook, qvec, k=10, nprobe=4)

    plan = _plan(pruned)
    assert "PartitionFilters" in plan
    assert "cluster" in plan.split("PartitionFilters")[1][:120]
    assert "TakeOrderedAndProject" in plan

    got = [(r["vec_id"], r["cluster"], r["cosine"]) for r in pruned.collect()]
    ref = [
        (r["vec_id"], r["cluster"], r["cosine"])
        for r in ivf_topk(emb, query_id=3, k=10, n_centroids=16, nprobe=4).collect()
    ]
    assert got == ref


def test_gopher_gram_plan_no_hof_and_agg_rides_window(spark):
    """The gram stream must be window/lead-generated (lambda HOFs
    evaluate interpreted — no whole-stage codegen) and the (id, n,
    gram) aggregation must reuse the window's id-keyed exchange: one
    hashpartitioning exchange on doc_id feeds window + both gram aggs;
    only the final pivot adds its own."""
    from go_htmldate_spark.operators.textstats import gopher_repetition

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    plan = _plan(gopher_repetition(docs))
    # no interpreted lambda HOFs in the gram path
    assert "lambdafunction" not in plan.lower()
    # the window sort + gram aggs share one doc_id exchange; the pivot
    # re-aggregation adds one more — anything beyond that is a
    # regression reintroducing a shuffle of the raw gram stream
    assert plan.count("Exchange hashpartitioning") <= 2, plan



def test_blocklist_is_broadcast_only_no_shuffle(spark):
    """The URL side of the blocklist gate must never shuffle: every
    depth probe is a BroadcastHashJoin against a per-depth list slice."""
    from go_htmldate_spark.operators.curation import host_blocklist_flag

    urls = spark.read.parquet(f"{SF}/orders.parquet").select(
        F.concat(F.lit("h"), (F.col("o_custkey") % 50).cast("string"),
                 F.lit(".ads.example")).alias("host"))
    bl = spark.createDataFrame([("ads.example",), ("x.y.example",)], "domain string")
    plan = _plan(host_blocklist_flag(urls, bl, max_depth=4))
    assert "BroadcastHashJoin" in plan
    # the only shuffles are the kilobyte list side's dedup (the cleaned
    # `domain` column, `_bl_domain` after rename); the URL table itself
    # never hits an exchange
    import re
    exchanges = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert exchanges and all(
        c.startswith(("_bl_domain", "domain")) for c in exchanges
    ), plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_sitemap_parse_is_map_only(spark):
    """Sitemap parsing must stay shuffle-free: both the urlset and the
    sitemapindex branch are generator+projection over the same scan,
    and the union of two map-only branches is itself map-only — 10^8
    sitemap files parse as a plain column map with no exchange."""
    from go_htmldate_spark.sources.sitemaps import parse_sitemaps

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("sitemap_url"),
        F.concat(F.lit("<urlset><url><loc>https://x/"),
                 F.col("doc_id").cast("string"),
                 F.lit("</loc></url></urlset>")).alias("xml"),
    )
    plan = _plan(parse_sitemaps(docs))
    assert "Exchange" not in plan, plan
    assert "Generate" in plan  # explode of the entry blocks


def test_pagerank_sweep_single_edge_exchange(spark, tmp_path_factory):
    """A rank sweep over a prepared host graph must scan the edge table
    in place (Bucketed: true) and pay exactly one edge-sized exchange —
    the contrib→dst aggregation. The edge side of the edges⋈state join
    must see no Exchange of its own (bucketed layout carries
    HashPartitioning(src); a per-sweep edge re-shuffle is the 10^10-edge
    scale-killer)."""
    import re

    from go_htmldate_spark.plans.hostgraph import prepare_host_edges

    edges = spark.range(2000).selectExpr(
        "concat('h', id % 97) as src", "concat('h', (id * 7) % 97) as dst"
    )
    t = prepare_host_edges(
        edges, "pr_plan_edges_test", n_buckets=8,
        path=str(tmp_path_factory.mktemp("prplan") / "edges"),
    )
    state = t.groupBy(F.col("src").alias("host")).agg(
        F.count(F.lit(1)).alias("outdeg")
    ).withColumn("rank", F.lit(10**12))
    contrib = t.join(state, t["src"] == state["host"]).select(
        "dst", F.expr("rank div outdeg").alias("contrib")
    )
    sweep = contrib.groupBy("dst").agg(F.sum("contrib").alias("in_sum"))
    plan = _plan(sweep)
    assert "Bucketed: true" in plan, plan
    # every hash exchange keys on dst (the agg) or on the small state
    # side (host); never on the edge table's src
    keys = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert keys and all(k.startswith(("dst", "host")) for k in keys), plan
    spark.sql("DROP TABLE IF EXISTS pr_plan_edges_test")


def test_dust_apply_is_map_only(spark):
    """DUST canonicalization compiles the collected rule list into one
    chained-when projection: applying rules to the URL table must be
    map-only — zero exchanges, zero Python (at 10^10 URLs a rule join
    or window would shuffle the whole frontier)."""
    from go_htmldate_spark.plans.dust import apply_dust_rules

    rules = spark.createDataFrame(
        [("?sessionid=zz", "", 20), ("/index.html", "", 7)],
        "alpha string, beta string, support long",
    )
    urls = spark.range(1000).select(
        F.concat(F.lit("https://h.example/p/"),
                 F.col("id").cast("string")).alias("url")
    )
    plan = _plan(apply_dust_rules(urls, rules))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_dust_rules_capped_before_collect(spark):
    """The per-sig duplicate bucket must be bounded by a row_number
    window BEFORE collect_list materializes it (mega-bucket guard), and
    the window must ride the same exchange as the groupBy."""
    from go_htmldate_spark.plans.dust import dust_rules

    pages = spark.range(400).select(
        F.concat(F.lit("https://h.example/p/"),
                 F.col("id").cast("string")).alias("url"),
        (F.col("id") % 50).alias("content_sig"),
    )
    plan = _plan(dust_rules(pages, max_group=4))
    w_idx = plan.find("RunningWindowFunction")
    if w_idx == -1:
        w_idx = plan.find("Window")
    c_idx = plan.find("collect_list")
    assert w_idx != -1 and c_idx != -1
    # executed plans print downstream operators first: the collect_list
    # aggregate must appear ABOVE the window that feeds it
    assert c_idx < w_idx, plan
    # exactly the four key-shrinking exchanges: (url,sig) distinct,
    # sig window+groupBy (shared), (a,b) pair distinct, (alpha,beta)
    # support agg — the position explode and lcp/lcs aggregation ride
    # the pair key with no exchange of their own
    assert plan.count("Exchange hashpartitioning") == 4, plan


def test_mirror_pairs_capped_and_sized_exactly(spark):
    """Mega-sig buckets cap at max_sig_hosts (boilerplate fingerprints
    cannot explode pair generation), while per-host set sizes stay
    EXACT (computed before the cap); the size joins broadcast."""
    from go_htmldate_spark.plans.mirrors import mirror_host_pairs

    rows = [(f"m{i:02d}.example", s) for i in range(2) for s in range(4)]
    rows += [(f"x{i:03d}.example", 777) for i in range(100)]
    docs = spark.createDataFrame(rows, "host string, content_sig long")
    out = mirror_host_pairs(
        docs, max_sig_hosts=8, min_shared=2, min_resemblance=0.1
    )
    got = {(r["host_a"], r["host_b"]): r for r in out.collect()}
    # the planted mirror pair survives with exact sizes…
    assert ("m00.example", "m01.example") in got
    r = got[("m00.example", "m01.example")]
    assert (r["shared"], r["n_a"], r["n_b"]) == (4, 4, 4)
    # …and the 100-host mega-sig contributes nothing past the cap
    # (every x-pair shares only 1 sig < min_shared)
    assert len(got) == 1
    plan = _plan(out)
    # AQE prints Final + Initial sections; pin the executed one.
    # Both size joins broadcast (the second may reuse the first's
    # exchange — sa and sb scan the same aggregate)
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("BroadcastHashJoin") == 2, final
    assert "SortMergeJoin" not in final, final


def test_rel_canonical_filter_not_pushed_into_regex(spark):
    """rel=canonical mining must stay map-only AND keep its filter
    ABOVE the href-extraction projection.  Without the nondeterministic
    fence (plans/rel_canonical.py), PushDownPredicates substitutes the
    whole href/resolution tree into the dst_url predicates
    multiplicatively (~16 copies -> Janino 64 KB overflow ->
    interpreted fallback, plus 3x regex work per page at 100 TB).  Pin:
    zero exchanges, zero Python, and no regexp in any Filter condition
    (the filter must read computed attributes, not recompute them)."""
    import re

    from go_htmldate_spark.plans.rel_canonical import rel_canonical_edges

    pages = spark.range(2000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".example/p/"), F.col("id").cast("string")).alias("url"),
        F.concat(F.lit('<link rel="canonical" href="/c/'),
                 F.col("id").cast("string"), F.lit('">')).alias("html"),
    )
    plan = _plan(rel_canonical_edges(pages))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    for cond in re.findall(r"Filter \(?(.*)", plan):
        assert "regexp_extract" not in cond, cond


def test_anchor_text_agg_exchanges_are_post_aggregate(spark):
    """anchor_text_agg's raw link stream must reach its first exchange
    only as target-keyed aggregate input: the top-anchor path collapses
    to (target, anchor) phrase counts BEFORE its window/join exchanges,
    so no exchange ever carries page html and no collect_list/cartesian
    appears anywhere — at 10^10 links the heavy bytes stay map-side."""
    import re

    from go_htmldate_spark.plans.hostgraph import anchor_text_agg

    pages = spark.read.parquet(f"{SF}/orders.parquet").select(
        F.concat(F.lit("https://s"), (F.col("o_custkey") % 9).cast("string"),
                 F.lit(".example/p")).alias("url"),
        F.concat(F.lit('<a href="https://t'),
                 (F.col("o_orderkey") % 5).cast("string"),
                 F.lit('.example/x">anchor phrase</a>')).alias("html"),
    )
    plan = _plan(anchor_text_agg(pages))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "collect_list" not in plan
    # every hash exchange is keyed on the aggregate keys, never raw html
    keys = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert keys and all(k.startswith(("target_url", "anchor")) for k in keys), plan


def test_feed_parse_is_map_only(spark):
    """parse_feeds must stay a zero-exchange scan-transform: XML blobs
    never shuffle and no Python enters the plan — at 10^8 feed bodies
    the parse rides the fetch corpus's partitioning untouched."""
    from go_htmldate_spark.sources.feeds import parse_feeds

    feeds = spark.range(2000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".example/feed")).alias("feed_url"),
        F.concat(F.lit("<rss><channel><item><link>https://h.example/p/"),
                 F.col("id").cast("string"),
                 F.lit("</link></item></channel></rss>")).alias("xml"),
    )
    plan = _plan(parse_feeds(feeds))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_snapshot_diff_is_single_join_no_payload(spark):
    """snapshot_diff must be ONE join keyed on url with both sides
    projected to (url, hash) BEFORE the exchange — page bodies never
    move, and nothing degenerates to a nested-loop join."""
    import re

    from go_htmldate_spark.plans.snapshots import snapshot_diff

    snap = spark.range(2000).select(
        F.concat(F.lit("https://h.example/p/"),
                 F.col("id").cast("string")).alias("url"),
        F.md5(F.col("id").cast("string")).alias("content_hash"),
        F.repeat(F.lit("x"), 100).alias("html"),  # payload that must not move
    )
    plan = _plan(snapshot_diff(snap, snap))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "html" not in plan  # projected away before any exchange
    keys = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert keys and all(k.startswith("url") for k in keys), plan


def test_host_datacard_shuffles_counters_not_text(spark):
    """host_datacard's wide exchange must carry (host, lang) partial
    counters — the text column is consumed map-side by the C4 flag
    projection and never crosses the wire; every later exchange and
    the majority window run on the collapsed O(hosts × langs) table."""
    from go_htmldate_spark.operators.curation import host_datacard

    pages = spark.range(2000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".example/p/"), F.col("id").cast("string")).alias("url"),
        F.repeat(F.lit("word "), 50).alias("text"),
        F.lit("en").alias("lang"),
    )
    plan = _plan(host_datacard(pages))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # map-side combine before the first exchange; text absent after it
    assert "partial_count" in plan or "partial_sum" in plan
    post_first_exchange = plan.split("Exchange hashpartitioning", 1)[1]
    assert "text#" not in post_first_exchange, plan


def test_incremental_dedup_no_corpus_self_pairing(spark):
    """incremental_dedup must never pair the corpus against itself: no
    cartesian/nested-loop anywhere, the probe join keyed on the
    (band, bucket) index key, and the corpus-side mega-bucket cap a
    window (rides the same exchange), not a post-collect slice."""
    import re

    from go_htmldate_spark.operators.dedup import (
        incremental_dedup, minhash_signatures,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    corpus_sigs = minhash_signatures(docs, n_hashes=16)
    new_sigs = minhash_signatures(
        docs.select((F.col("doc_id") + 10_000).alias("doc_id"), "text"),
        n_hashes=16,
    )
    plan = _plan(incremental_dedup(corpus_sigs, new_sigs, bands=4))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "collect_list" not in plan
    keys = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    # exchanges are the sig groupBys (doc_id), the band/bucket probe
    # join, and the per-new-doc best-match window — nothing else
    assert keys and all(
        k.startswith(("doc_id", "band", "bucket", "_new_id", "_corpus_id"))
        for k in keys
    ), keys


def test_revisit_classify_single_join_no_payload(spark):
    """revisit_classify must be ONE url-keyed join with both sides
    projected to (url, digest, date[, n_bytes]) before the exchange —
    the page body column never moves, and nothing degenerates to a
    nested-loop join."""
    import re

    from go_htmldate_spark.plans.revisits import revisit_classify

    base = spark.range(2000).select(
        F.concat(F.lit("https://h.example/r/"),
                 F.col("id").cast("string")).alias("url"),
        F.md5(F.col("id").cast("string")).alias("payload_digest"),
        F.lit("2026-08-01").alias("warc_date"),
        (F.col("id") % 997 + 1).alias("n_bytes"),
        F.repeat(F.lit("x"), 100).alias("html"),  # must not move
    )
    plan = _plan(revisit_classify(base, base.drop("n_bytes")))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "html" not in plan  # projected away before any exchange
    # small prior index → broadcast equi-join (zero shuffles); at scale
    # both sides hash-exchange on url and nothing else
    keys = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    if keys:
        assert all(k.startswith("url") for k in keys), plan
    else:
        assert "BroadcastHashJoin [url" in plan, plan


def test_wat_metadata_is_map_only(spark):
    """wat_metadata must be a single projection over the scan — no
    exchange, no Python: page bytes are read once and never move."""
    from go_htmldate_spark.sources.warc import wat_metadata

    rec = spark.range(100).select(
        F.concat(F.lit("https://h.example/"), F.col("id").cast("string"))
        .alias("url"),
        F.lit("2026-08-01T00:00:00Z").alias("warc_date"),
        F.lit("urn:x").alias("record_id"),
        F.lit(200).alias("http_status"),
        F.lit("text/html").alias("http_content_type"),
        F.encode(F.lit("<title>t</title>"), "UTF-8").alias("payload"),
        F.lit("response").alias("warc_type"),
    )
    plan = _plan(wat_metadata(rec))
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_temporal_rebalance_filter_is_map_only(spark):
    """After the O(#years) count pre-pass, the returned plan must be a
    pure scan+filter — the per-year rates fold into a literal CASE, no
    exchange, no Python."""
    from go_htmldate_spark.operators.curation import temporal_rebalance

    df = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        (F.lit(2015) + (F.col("id") * 13) % 10).cast("int").alias("year"),
    )
    out = temporal_rebalance(df, "year", "doc_id",
                             {2016: 0.5, 2019: 0.3, 2022: 0.2}, seed=1)
    plan = _plan(out)
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_adaptive_delay_single_host_exchange(spark):
    """adaptive_delay: ONE partial-aggregated exchange on host and
    nothing else."""
    import re

    from go_htmldate_spark.plans.backoff import adaptive_delay

    log = spark.range(10000).select(
        F.concat(F.lit("h"), (F.col("id") % 50).cast("string")).alias("host"),
        F.col("id").alias("fetch_ts"),
        (F.col("id") % 997).cast("double").alias("duration_ms"),
    )
    plan = _plan(adaptive_delay(log))
    keys = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert len(keys) == 1 and keys[0].startswith("host"), plan
    assert "partial" in plan.lower() or "partial_" in plan, plan


def test_linear_quality_broadcasts_weights(spark):
    """linear_quality_score: the weight table must broadcast (the token
    stream never shuffles for the lookup); the only hash exchange is
    the final doc-key aggregation, partial-aggregated."""
    import re

    from go_htmldate_spark.operators.curation import (
        hashed_weights, linear_quality_score,
    )

    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok"), (F.col("id") % 100).cast("string"),
                 F.lit(" common word"), (F.col("id") % 7).cast("string"))
        .alias("text"),
    )
    plan = _plan(linear_quality_score(
        docs, hashed_weights(spark, dim=256, seed=1), dim=256, seed=1))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # the only permissible hash exchange is the doc-key aggregation
    # (and over an already-co-partitioned source even that is elided)
    keys = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert all(k.startswith("doc_id") for k in keys), keys


def test_host_cap_sample_salted_windows(spark):
    """host_cap_sample must rank in two phases — (host, salt) then
    host — so no single task sorts a mega-host; no join, no Python."""
    import re

    from go_htmldate_spark.operators.curation import host_cap_sample

    df = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("h"), (F.col("id") % 11).cast("string")).alias("host"),
    )
    plan = _plan(host_cap_sample(df, "host", "doc_id", cap=4, seed=1))
    keys = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert len(keys) == 2, keys
    assert any("_salt" in k for k in keys), keys  # phase-1 salted exchange
    for marker in ("BatchEvalPython", "ArrowEvalPython", "SortMergeJoin"):
        assert marker not in plan
