"""HTTP cache-semantics recrawl layer (plans/httpcache, RFC 9111)."""

from __future__ import annotations

from go_htmldate_spark.plans.httpcache import (
    parse_cache_headers,
    revalidation_plan,
)


def _ttl_rows(spark, rows):
    df = spark.createDataFrame(
        rows,
        "url string, fetch_ts long, cache_control string, "
        "expires_ts long, last_modified_ts long, etag string",
    )
    out = parse_cache_headers(df)
    return {r["url"]: r.asDict() for r in out.collect()}


def test_ttl_directive_precedence(spark):
    t = 1_000_000
    got = _ttl_rows(
        spark,
        [
            # no-store beats everything
            ("a", t, "no-store, max-age=500", t + 9999, None, None),
            # no-cache also forces revalidation
            ("b", t, "public, no-cache", None, None, '"e1"'),
            # s-maxage overrides max-age for a shared cache
            ("c", t, "max-age=100, s-maxage=700", None, None, None),
            ("d", t, "MAX-AGE=300", None, None, None),  # case-insensitive
            # Expires only when no CC directive
            ("e", t, "public", t + 1234, None, None),
            # stale Expires clamps to 0
            ("f", t, None, t - 50, None, None),
        ],
    )
    assert (got["a"]["ttl_s"], got["a"]["ttl_source"]) == (0, "no-store")
    assert (got["b"]["ttl_s"], got["b"]["ttl_source"]) == (0, "no-cache")
    assert (got["c"]["ttl_s"], got["c"]["ttl_source"]) == (700, "s-maxage")
    assert (got["d"]["ttl_s"], got["d"]["ttl_source"]) == (300, "max-age")
    assert (got["e"]["ttl_s"], got["e"]["ttl_source"]) == (1234, "expires")
    assert (got["f"]["ttl_s"], got["f"]["ttl_source"]) == (0, "expires")


def test_ttl_heuristic_and_default(spark):
    t = 10_000_000
    got = _ttl_rows(
        spark,
        [
            # heuristic: 10% of age since Last-Modified
            ("h1", t, None, None, t - 50_000, None),
            # clamped below at 60 s
            ("h2", t, None, None, t - 100, None),
            # clamped above at 30 d
            ("h3", t, None, None, t - 9_000_000_000, None),
            # nothing at all -> default 86400
            ("h4", t, None, None, None, None),
            # explicit max-age capped at 1 year
            ("h5", t, "max-age=999999999999", None, None, None),
        ],
    )
    assert (got["h1"]["ttl_s"], got["h1"]["ttl_source"]) == (5000, "heuristic")
    assert got["h2"]["ttl_s"] == 60
    assert got["h3"]["ttl_s"] == 2_592_000
    assert (got["h4"]["ttl_s"], got["h4"]["ttl_source"]) == (86400, "default")
    assert got["h5"]["ttl_s"] == 31_536_000
    assert got["h1"]["fresh_until"] == t + 5000


def test_validator_flag(spark):
    t = 500
    got = _ttl_rows(
        spark,
        [
            ("v1", t, None, None, None, '"abc"'),
            ("v2", t, None, None, t - 100_000, None),
            ("v3", t, None, None, None, None),
            ("v4", t, None, None, None, ""),  # empty etag is no validator
        ],
    )
    assert got["v1"]["has_validator"] is True
    assert got["v2"]["has_validator"] is True
    assert got["v3"]["has_validator"] is False
    assert got["v4"]["has_validator"] is False


def test_revalidation_plan_modes_and_savings(spark):
    hist = spark.createDataFrame(
        [
            # u1: validator, 3 refetches, 2 came back 304
            ("u1", 100, 200, 10000, '"e"', 50),
            ("u1", 200, 304, 0, '"e"', 50),
            ("u1", 300, 304, 0, '"e"', 50),
            ("u1", 400, 200, 20000, '"e"', 50),
            # u2: no validator ever -> full
            ("u2", 100, 200, 5000, None, None),
            ("u2", 200, 200, 7000, None, None),
            # u3: single fetch, validator -> conditional, rate NULL
            ("u3", 100, 200, 400, None, 90),
        ],
        "url string, fetch_ts long, status int, body_bytes long, "
        "etag string, last_modified_ts long",
    )
    out = {r["url"]: r.asDict() for r in
           revalidation_plan(hist, as_of_ts=1000).collect()}

    u1 = out["u1"]
    assert (u1["n_fetches"], u1["n_not_modified"]) == (4, 2)
    assert abs(u1["revalidate_rate"] - 2 / 3) < 1e-6
    assert u1["avg_body_bytes"] == 15000
    assert u1["mode"] == "conditional"
    # expected bytes: 15000 * (1 - 2/3) = 5000
    assert u1["est_fetch_bytes"] == 5000

    u2 = out["u2"]
    assert u2["mode"] == "full"
    assert u2["avg_body_bytes"] == 6000
    assert u2["est_fetch_bytes"] == 6000

    u3 = out["u3"]
    assert u3["mode"] == "conditional"
    assert u3["revalidate_rate"] is None
    # no refetch history -> assume change, pay the full body
    assert u3["est_fetch_bytes"] == 400


def test_revalidation_deterministic_across_partitionings(spark):
    rows = [
        ("u", 100 + i, 304 if i % 3 else 200, 1000 * (i % 5 + 1),
         '"e"' if i % 2 else None, None)
        for i in range(30)
    ]
    schema = ("url string, fetch_ts long, status int, body_bytes long, "
              "etag string, last_modified_ts long")
    a = revalidation_plan(
        spark.createDataFrame(rows, schema).repartition(1), as_of_ts=0
    ).collect()
    b = revalidation_plan(
        spark.createDataFrame(list(reversed(rows)), schema).repartition(7),
        as_of_ts=0,
    ).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
