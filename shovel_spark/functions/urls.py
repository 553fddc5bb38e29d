"""URL canonicalization for web-corpus pipelines — native Column expressions.

A Common-Crawl-style corpus keys everything by URL (the north rule's
per-row invariant is byte-identical text PER URL), and raw crawl URLs are
noisy: mixed-case hosts, userinfo, tracking parameters, unsorted query
strings, fragments. Canonicalization is the first dedup stage of every real
crawl pipeline (two fetches of the same page must collapse to one key) and
the host-reversal (SURT) form is the standard locality key for range
partitioning a crawl by registered domain.

All map-only, whole-stage-codegen expressions — no UDFs, no shuffle; at
100 TB this fuses into the scan like textstats. Identical regexp subtrees
across the helpers collapse under Spark's subexpression elimination, and
the oracle SQL in demo_queries is GENERATED from _URL_RE/TRACKING_PARAMS
below (one definition of the grammar).
"""

from __future__ import annotations

import functools

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query parameters that never change page identity (analytics trackers);
#: a trailing '_' means prefix-match (utm_source, utm_medium, ...)
TRACKING_PARAMS = ("utm_", "fbclid", "gclid", "msclkid", "mc_eid", "_ga")

_URL_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"


def url_scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _URL_RE, 1))


def url_host(url: Column) -> Column:
    """Lowercased host: userinfo dropped (SURT semantics — 'user@' is not
    page identity and is case-sensitive, so it must not be lowercased into
    a key), and the scheme's OWN default port stripped (':80' only for
    http, ':443' only for https — an https server on port 80 is a
    different endpoint and keeps its port)."""
    host = F.lower(F.regexp_replace(F.regexp_extract(url, _URL_RE, 2), r"^[^@]*@", ""))
    scheme = url_scheme(url)
    return (
        F.when(scheme == "http", F.regexp_replace(host, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, r":443$", ""))
        .otherwise(host)
    )


def url_path(url: Column) -> Column:
    """Path with ALL trailing slashes normalized away (idempotent; bare
    '/' → '')."""
    return F.regexp_replace(F.regexp_extract(url, _URL_RE, 3), r"/+$", "")


def url_query_canonical(url: Column, drop_prefixes: tuple[str, ...] = TRACKING_PARAMS) -> Column:
    """Query string with tracking params dropped and the rest SORTED —
    param order never changes page identity."""
    raw = F.regexp_extract(url, _URL_RE, 4)

    def _dropped(p: Column) -> Column:
        conds = [
            p.startswith(pre) if pre.endswith("_") else p.startswith(pre + "=") | (p == pre)
            for pre in drop_prefixes
        ]
        return functools.reduce(lambda a, b: a | b, conds, F.lit(False))

    parts = F.filter(F.split(raw, "&"), lambda p: (p != "") & ~_dropped(p))
    return F.array_join(F.array_sort(parts), "&")


def canonical_url(url: Column, drop_prefixes: tuple[str, ...] = TRACKING_PARAMS) -> Column:
    """scheme://host/path[?sorted-kept-params] — fragments and userinfo
    gone, hosts lowercased, scheme-default ports and trailing slashes
    stripped, tracking params removed, survivors sorted. Idempotent:
    canonicalizing a canonical URL is a no-op. Rows that don't parse as
    absolute URLs canonicalize to NULL (callers route them to
    dead-letter)."""
    host = url_host(url)
    q = url_query_canonical(url, drop_prefixes)
    base = F.concat(url_scheme(url), F.lit("://"), host, url_path(url))
    out = F.when(q == "", base).otherwise(F.concat(base, F.lit("?"), q))
    return F.when(host == "", F.lit(None).cast("string")).otherwise(out)


def surt_host(url: Column) -> Column:
    """Host with labels reversed ('news.example.co.uk' → 'uk.co.example.news')
    — the SURT-style key that makes range/Z-order partitioning co-locate a
    registered domain's pages (crawl layouts sort by this)."""
    return F.array_join(F.reverse(F.split(url_host(url), r"\.")), ".")


def tracking_drop_sql(drop_prefixes: tuple[str, ...] = TRACKING_PARAMS) -> str:
    """The DuckDB predicate matching _dropped() above, generated from the
    same TRACKING_PARAMS so the oracle can never drift from the engine."""
    terms = []
    for pre in drop_prefixes:
        if pre.endswith("_"):
            terms.append(f"starts_with(p, '{pre}')")
        else:
            terms.append(f"starts_with(p, '{pre}=') OR p = '{pre}'")
    return " OR ".join(terms) if terms else "FALSE"
