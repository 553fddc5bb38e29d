"""URL canonicalization for web-corpus pipelines — native Column expressions.

A Common-Crawl-style corpus keys everything by URL (the north rule's
per-row invariant is byte-identical text PER URL), and raw crawl URLs are
noisy: mixed-case hosts, tracking parameters, unsorted query strings,
fragments. Canonicalization is the first dedup stage of every real crawl
pipeline (two fetches of the same page must collapse to one key) and the
host-reversal (SURT) form is the standard locality key for range
partitioning a crawl by registered domain.

All map-only, whole-stage-codegen expressions — no UDFs, no shuffle; at
100 TB this fuses into the scan like textstats.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query parameters that never change page identity (analytics trackers)
TRACKING_PARAMS = ("utm_", "fbclid", "gclid", "msclkid", "mc_eid", "_ga")

_URL_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"


def url_scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _URL_RE, 1))


def url_host(url: Column) -> Column:
    """Lowercased host, default ports stripped."""
    host = F.lower(F.regexp_extract(url, _URL_RE, 2))
    return F.regexp_replace(host, r":(80|443)$", "")


def url_path(url: Column) -> Column:
    """Path with trailing slash normalized away (except bare '/' → '')."""
    return F.regexp_replace(F.regexp_extract(url, _URL_RE, 3), r"/$", "")


def url_query_canonical(url: Column, drop_prefixes: tuple[str, ...] = TRACKING_PARAMS) -> Column:
    """Query string with tracking params dropped and the rest SORTED —
    param order never changes page identity."""
    raw = F.regexp_extract(url, _URL_RE, 4)

    def _dropped(p: Column) -> Column:
        conds = [
            p.startswith(pre) if pre.endswith("_") else p.startswith(pre + "=") | (p == pre)
            for pre in drop_prefixes
        ]
        return functools.reduce(lambda a, b: a | b, conds)

    parts = F.filter(F.split(raw, "&"), lambda p: (p != "") & ~_dropped(p))
    return F.array_join(F.array_sort(parts), "&")


def canonical_url(url: Column, drop_prefixes: tuple[str, ...] = TRACKING_PARAMS) -> Column:
    """scheme://host/path[?sorted-kept-params] — fragments gone, hosts
    lowercased, default ports and trailing slashes stripped, tracking
    params removed, survivors sorted. Rows that don't parse as absolute
    URLs canonicalize to NULL (callers route them to dead-letter)."""
    q = url_query_canonical(url, drop_prefixes)
    base = F.concat(url_scheme(url), F.lit("://"), url_host(url), url_path(url))
    out = F.when(q == "", base).otherwise(F.concat(base, F.lit("?"), q))
    return F.when(url_host(url) == "", F.lit(None).cast("string")).otherwise(out)


def surt_host(url: Column) -> Column:
    """Host with labels reversed ('news.example.co.uk' → 'uk.co.example.news')
    — the SURT-style key that makes range/Z-order partitioning co-locate a
    registered domain's pages (crawl layouts sort by this)."""
    return F.array_join(F.reverse(F.split(url_host(url), r"\.")), ".")
