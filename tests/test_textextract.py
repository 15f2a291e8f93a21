"""Visible-text extraction (operators/textextract): subtree drops,
block structure, entities, whitespace law.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from go_htmldate_spark.operators.textextract import (
    pages_to_text,
    visible_text,
)


def _text(spark, html):
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(visible_text(F.col("html")).alias("t")).head()["t"]


def test_invisible_subtrees_drop_whole(spark):
    html = (
        "<html><head><title>never shown</title>"
        "<style>body { color: red; }</style></head>"
        "<body><script>var x = 'not text';</script>"
        "<noscript>enable js</noscript>"
        "<p>Real content.</p>"
        "<!-- a comment with words --></body></html>"
    )
    assert _text(spark, html) == "Real content."


def test_block_tags_become_lines_inline_tags_spaces(spark):
    html = ("<h1>Title</h1><p>First <b>bold</b> para.</p>"
            "<ul><li>one</li><li>two</li></ul>")
    assert _text(spark, html) == "Title\nFirst bold para.\none\ntwo"


def test_entities_decode(spark):
    html = "<p>Fish &amp; Chips &lt;3 &quot;quoted&quot; &nbsp; &#39;x&#39;</p>"
    assert _text(spark, html) == "Fish & Chips <3 \"quoted\" 'x'"


def test_double_escaped_amp_not_overdecoded(spark):
    # '&amp;lt;' is the TEXT '&lt;', not '<' — amp decodes last
    assert _text(spark, "<p>&amp;lt;</p>") == "&lt;"


def test_whitespace_law(spark):
    html = ("<div>  a   lot\tof   space  </div><div></div><div></div>"
            "<div>next</div>")
    assert _text(spark, html) == "a lot of space\nnext"


def test_null_and_empty(spark):
    df = spark.createDataFrame([("u1", None), ("u2", "")],
                               "url string, html string")
    rows = {r["url"]: (r["text"], r["n_chars"], r["n_lines"])
            for r in pages_to_text(df).collect()}
    assert rows == {"u1": ("", 0, 0), "u2": ("", 0, 0)}


def test_pages_to_text_counts(spark):
    df = spark.createDataFrame(
        [("u", "<p>one</p><p>two</p>")], "url string, html string"
    )
    row = pages_to_text(df).head()
    assert row["text"] == "one\ntwo"
    assert row["n_chars"] == 7
    assert row["n_lines"] == 2


def test_plan_is_map_only(spark):
    df = spark.createDataFrame([("u", "<p>x</p>")],
                               "url string, html string")
    plan = pages_to_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_link_density(spark):
    from go_htmldate_spark.operators.textextract import link_density

    pages = spark.createDataFrame([
        ("nav", '<a href="/h">Home</a> <a href="/a">About</a>'),
        ("art", '<p>A longer article body sits here.</p>'
                '<a href="/m">More</a>'),
        ("empty", "<html><body></body></html>"),
        ("none", None),
    ], "url string, html string")
    rows = {r["url"]: r for r in link_density(pages).collect()}
    assert rows["nav"]["n_anchor_chars"] == 9
    assert rows["nav"]["n_text_chars"] == 10
    assert rows["nav"]["link_density"] == 0.9
    assert rows["art"]["n_anchor_chars"] == 4
    assert rows["art"]["link_density"] < 0.15
    assert rows["empty"]["link_density"] == 0.0
    assert rows["none"]["link_density"] == 0.0
    plan = link_density(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
