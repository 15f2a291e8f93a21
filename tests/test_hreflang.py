"""hreflang translation clusters (plans/hreflang): join-free cluster
keying from the spec's every-member-declares-everyone contract,
x-default representatives, and the consistency roll-up.

Reference analog: none — crawl-side structure over the corpus the
reference processes one page at a time.
"""

from __future__ import annotations

from go_htmldate_spark.plans.hreflang import (
    hreflang_cluster_stats,
    hreflang_clusters,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def _alt(lang, href):
    return f'<link rel="alternate" hreflang="{lang}" href="{href}">'


def test_bidirectional_cluster_same_key_everywhere(spark):
    de, en, fr = (
        "https://de.example/a", "https://en.example/a",
        "https://fr.example/a",
    )
    full = _alt("de", de) + _alt("en", en) + _alt("fr", fr)
    out = hreflang_clusters(_pages(spark, [
        (de, full), (en, full), (fr, full),
    ]))
    rows = {r["url"]: r for r in out.collect()}
    assert {r["cluster_key"] for r in rows.values()} == {de}
    assert all(r["n_alternates"] == 3 for r in rows.values())
    assert not any(r["has_xdefault"] for r in rows.values())
    assert rows[de]["is_representative"]
    assert not rows[en]["is_representative"]


def test_xdefault_overrides_representative(spark):
    de, en = "https://de.example/a", "https://en.example/a"
    full = _alt("de", de) + _alt("en", en) + _alt("x-default", en)
    out = hreflang_clusters(_pages(spark, [(de, full), (en, full)]))
    rows = {r["url"]: r for r in out.collect()}
    for r in rows.values():
        assert r["cluster_key"] == de
        assert r["representative"] == en
        assert r["has_xdefault"]
        assert r["n_alternates"] == 3
    assert rows[en]["is_representative"]
    assert not rows[de]["is_representative"]


def test_singleton_and_distractors(spark):
    url = "https://solo.example/a"
    html = (
        '<link rel="alternate-print" hreflang="xx" href="https://bad.example/">'
        '<link rel="alternate" type="application/rss+xml" href="/feed">'
        '<link rel="stylesheet" href="/css">'
    )
    row = hreflang_clusters(_pages(spark, [(url, html)])).head()
    assert row["cluster_key"] == url
    assert row["representative"] == url
    assert row["n_alternates"] == 0
    assert not row["has_xdefault"]
    assert row["is_representative"]


def test_nonbidirectional_degrades_to_separate_clusters(spark):
    # a declares b, but b declares nothing: they land in different
    # clusters (the degraded behavior search engines apply)
    a, b = "https://b.example/x", "https://z.example/x"
    out = hreflang_clusters(_pages(spark, [
        (a, _alt("en", b)),
        (b, "<html></html>"),
    ]))
    rows = {r["url"]: r for r in out.collect()}
    # min(b_declared ∪ {a}) is a itself (b sorts after a's host)
    assert rows[a]["cluster_key"] == a
    assert rows[b]["cluster_key"] == b


def test_relative_href_resolution(spark):
    url = "https://de.example/a"
    html = (
        _alt("de", "/a")                      # root-relative → self host
        + _alt("en", "//en.example/a")        # protocol-relative
        + _alt("fr", "../rel")                # dotted → skipped
    )
    row = hreflang_clusters(_pages(spark, [(url, html)])).head()
    assert row["n_alternates"] == 2
    assert row["cluster_key"] == "https://de.example/a"


def test_cluster_stats(spark):
    de, en = "https://de.example/a", "https://en.example/a"
    full = _alt("de", de) + _alt("en", en)
    broken = _alt("de", de) + _alt("en", en) + _alt("fr", "https://fr.example/a")
    stats = hreflang_cluster_stats(hreflang_clusters(_pages(spark, [
        (de, full),
        (en, broken),   # en over-declares: max_declared 3 vs 2 members
        ("https://solo.example/b", "<html></html>"),
    ])))
    rows = {r["cluster_key"]: r for r in stats.collect()}
    assert rows[de]["n_members"] == 2
    assert rows[de]["max_declared"] == 3
    assert rows[de]["n_with_xdefault"] == 0
    assert rows["https://solo.example/b"]["n_members"] == 1
    assert rows["https://solo.example/b"]["max_declared"] == 0


def test_cluster_plan_is_map_only(spark):
    """The whole operator is one projection chain: no exchange, no
    Python eval — at 100 TB it rides the corpus partitioning."""
    pages = _pages(
        spark, [("https://de.example/a", _alt("de", "https://de.example/a"))]
    )
    plan = (
        hreflang_clusters(pages)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_representative_filter(spark):
    """One survivor per cluster: the declared representative when
    fetched; the first member by (rep-flag, url) when the
    representative is missing from the corpus; singletons always
    survive."""
    from go_htmldate_spark.plans.hreflang import (
        hreflang_representative_filter,
    )

    de, en, fr = (
        "https://de.example/a", "https://en.example/a",
        "https://fr.example/a",
    )
    full = _alt("de", de) + _alt("en", en) + _alt("x-default", en)
    # cluster B's members declare a representative (bb) that was never
    # fetched: the min fetched member must survive instead
    b1, b2, bb = (
        "https://b1.example/x", "https://b2.example/x",
        "https://a0.example/x",
    )
    declb = _alt("de", b1) + _alt("en", b2) + _alt("fr", bb)
    out = hreflang_representative_filter(_pages(spark, [
        (de, full), (en, full), (fr, full),   # en is x-default rep
        (b1, declb), (b2, declb),             # bb (cluster key) absent
        ("https://solo.example/s", "<html></html>"),
    ]))
    kept = {r["url"] for r in out.collect()}
    assert kept == {en, b1, "https://solo.example/s"}


def test_null_html_is_singleton_not_shared_cluster(spark):
    """NULL html (failed/empty fetches) must behave like a page
    declaring nothing: singleton cluster keyed on its own url — NOT a
    shared NULL cluster the representative filter would collapse."""
    from go_htmldate_spark.plans.hreflang import (
        hreflang_representative_filter,
    )

    pages = spark.createDataFrame(
        [("https://n1.example/a", None), ("https://n2.example/a", None)],
        "url string, html string",
    )
    rows = {r["url"]: r for r in hreflang_clusters(pages).collect()}
    assert rows["https://n1.example/a"]["cluster_key"] == "https://n1.example/a"
    assert rows["https://n1.example/a"]["n_alternates"] == 0
    kept = {r["url"] for r in
            hreflang_representative_filter(pages).collect()}
    assert kept == {"https://n1.example/a", "https://n2.example/a"}
