"""URL canonicalization + dedup hashing [north-rule].

All native Catalyst: lowercase scheme/host, strip fragments and default
ports, drop trailing '?', sort query parameters, collapse duplicate
slashes. The dedup key is the built-in xxhash64 over the canonical form
— the exact function the north rule names, and the same hash the
partitioned bloom filter and the url_seen table key on, so every stage
co-partitions without re-hashing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def canonicalize_url(url: Column) -> Column:
    u = F.trim(url)
    # strip fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # lowercase scheme + host (authority part only)
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1))
    rest = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$", 1)
    # default ports
    host = F.regexp_replace(host, r":80$|:443$", "")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.regexp_replace(path, r"//+", "/")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    sorted_query = F.array_join(F.sort_array(F.split(query, "&")), "&")
    return F.when(
        scheme == "",
        u,  # not a hierarchical URL: leave as-is
    ).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(query != "", F.concat(F.lit("?"), sorted_query)).otherwise(F.lit("")),
        )
    )


def pushdown_barrier(df):
    """No-fanout Generate (stack(1, …)) over all columns: a plan-level
    barrier that stops Catalyst pushing predicates below this point.

    PushPredicateThroughNonJoin substitutes projection aliases into a
    pushed predicate with NO cost model, so a filter (or a join's
    inferred isnotnull constraint) on a computed column re-evaluates
    the column's entire expression chain down at the FileScan — below
    any spread repartition, on however few tasks the scan has
    (measured r06: meta_refresh's drop-filter expanded the meta-tag
    scan 26x at the scan; sitemap_coverage's join constraint re-ran
    canonicalize_url per input row pre-spread). Generate is a pushdown
    barrier in Catalyst; stack with one argument group emits exactly
    the input row, so rows, types and values are identical."""
    cols = df.columns
    quoted = ", ".join(f"`{c}`" for c in cols)
    return df.select(F.expr(
        f"stack(1, {quoted}) as ({', '.join(cols)})"
    ))


def url_hash(url_canon: Column) -> Column:
    """64-bit dedup key (north rule: xxhash64)."""
    return F.xxhash64(url_canon)


def url_host(url_canon: Column) -> Column:
    return F.lower(F.regexp_extract(url_canon, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]*)", 1))


def url_path(url_canon: Column) -> Column:
    p = F.regexp_extract(url_canon, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def canonicalize_url_py(url: str) -> str:
    """Single-URL reference implementation (oracle scheduler + tests).
    Must stay semantically identical to canonicalize_url."""
    import re

    u = url.strip()
    u = re.sub(r"#.*$", "", u)
    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)(.*)$", u)
    if not m:
        return u
    scheme = m.group(1).lower()
    host = re.sub(r":80$|:443$", "", m.group(2).lower())
    rest = m.group(3)
    qpos = rest.find("?")
    path = rest if qpos < 0 else rest[:qpos]
    query = "" if qpos < 0 else rest[qpos + 1 :]
    path = re.sub(r"//+", "/", path) or "/"
    out = f"{scheme}://{host}{path}"
    if query:
        out += "?" + "&".join(sorted(query.split("&")))
    return out


def surt_key(url: Column) -> Column:
    """SURT urlkey (Sort-friendly URI Reordering Transform — the
    Internet Archive / Common Crawl CDX index key): host labels
    reversed and comma-joined so a lexicographic sort clusters every
    URL under a domain subtree, then ')' + lowercased path +
    '?' + param-sorted query. 'www\\d*.' prefixes strip (Heritrix's
    canonicalization — www variants of a host must collate together);
    default ports (:80/:443) drop and any other port stays as
    ':port' after the reversed host, so captures of one host on two
    ports never collide under one urlkey.
    All codegen'd string ops — the key is computed in the scan
    projection of a CDX build, never in Python.

    Example: https://www.Example.com/A/b?z=1&a=2 →
    'com,example)/a/b?a=2&z=1'."""
    host = url_host(url)
    host = F.regexp_replace(host, r"^www\d*\.", "")
    rev_host = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    # url_host truncates at ':', so recover the port from the authority
    # and keep it when non-default (:80/:443 drop — canonicalize_url's
    # law): captures of one host on two ports must NOT collide
    port = F.regexp_extract(
        url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*:(\d+)", 1
    )
    port_sfx = F.when(
        port.isin("", "80", "443"), F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.lower(url_path(url))
    query = F.lower(F.regexp_extract(url, r"\?([^#]*)", 1))
    sorted_query = F.array_join(F.sort_array(F.split(query, "&")), "&")
    return F.concat(
        rev_host, port_sfx, F.lit(")"), path,
        F.when(query != "", F.concat(F.lit("?"), sorted_query))
        .otherwise(F.lit("")),
    )


def url_scheme_of(url: Column) -> Column:
    """Scheme of an absolute URL ('' when none)."""
    return F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)


def url_authority_of(url: Column) -> Column:
    """Authority (host[:port]) of an absolute URL ('' when none)."""
    return F.regexp_extract(
        url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1
    )


def resolve_href(href: Column, scheme: Column, host: Column) -> Column:
    """The shared href-resolution law of the page-plan miners
    (rel_canonical semantics): absolute http(s) as-is,
    protocol-relative completed with the page's scheme, root-relative
    with scheme://host; anything else (dotted-relative, mailto,
    javascript:, empty, NULL) → NULL. One definition so a resolution
    fix lands everywhere at once (pagination, hreflang, aliases)."""
    return (
        F.when(href.rlike(r"^(?i)https?://"), href)
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(href.startswith("/"),
              F.concat(scheme, F.lit("://"), host, href))
    )
