"""Deterministic synthetic pages table — a pure function of (seed, n).

Built entirely from native Column expressions over ``spark.range(n)`` so
generation itself is distributed, JVM-side, and byte-stable across runs and
parallelism levels (no Python in the loop, no RNG state). The html wraps the
expected ``text`` verbatim, so the parse invariant (byte-identical extracted
text per url) is checkable by construction.

Skew is intentional: 2 hot domains carry ~35% of rows (FIXTURES.md §1) to
exercise salted aggregation and AQE skew handling at scale.

Edge-case rows (by stable hash of the row id):
  - ~2%  malformed html (missing </p>)  -> parse must reject (dead-letter)
  - ~3%  empty body                      -> text = ''
  - ~5%  non-ascii body (é, 中文, emoji) -> byte-exactness under multibyte utf-8
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from shovel_spark.session import local_rows_df

# 64-word vocabulary; index picked by xxhash64 of (seed, row id, position).
_WORDS = (
    "the quick brown fox jumps over lazy dog data spark batch stream table "
    "row column query plan join merge sort hash scan filter group count sum "
    "window frame page crawl index shard bucket vector token text lang href "
    "title body head link meta script style div span list item node graph "
    "edge path key value store cache disk wire proto codec"
).split()

_DOMAINS = [
    # (domain, weight out of 100) — first two are the hot (skewed) domains.
    ("news.example.com", 20),
    ("blog.example.org", 15),
    ("shop.example.net", 10),
    ("docs.example.io", 10),
    ("forum.example.dev", 8),
    ("wiki.example.edu", 8),
    ("mail.example.co", 7),
    ("video.example.tv", 7),
    ("code.example.sh", 5),
    ("img.example.cdn", 4),
    ("spam.badsite.biz", 3),
    ("evil.badsite.biz", 3),
]

_LANGS = [
    # raw codes incl. variants needing normalization + unknowns (FIXTURES.md §1)
    ("en", 28),
    ("en-US", 10),
    ("fr", 10),
    ("FR", 5),
    ("de", 10),
    ("es", 8),
    ("zh", 7),
    ("ja", 9),
    ("zz", 7),
    ("", 6),
]

NON_ASCII_SUFFIX = " café 中文 🚀"


def _weighted_slots(pairs: list[tuple[str, int]]) -> list[str]:
    slots: list[str] = []
    for value, weight in pairs:
        slots.extend([value] * weight)
    assert len(slots) == 100, f"weights must sum to 100, got {len(slots)}"
    return slots


def _pick(slots: list[str], key: Column) -> Column:
    return F.element_at(F.array(*[F.lit(s) for s in slots]), (F.pmod(key, F.lit(100)) + 1).cast("int"))


def synth_pages(spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Generate ``n`` deterministic pages rows ``(url, warc_ts, html, text, lang)``."""
    if partitions is None:
        partitions = max(1, min(256, n // 50_000 or 1))
    df = spark.range(0, n, 1, partitions)
    sid = F.lit(seed)
    rid = F.col("id")

    def h(tag: str) -> Column:
        return F.abs(F.xxhash64(sid, rid, F.lit(tag)))

    domain = _pick(_weighted_slots(_DOMAINS), h("domain"))
    lang = _pick(_weighted_slots(_LANGS), h("lang"))
    url = F.concat(F.lit("https://"), domain, F.lit("/p/"), rid.cast("string"))

    # Event time spread across 90 days from 2024-01-01 (no now()).
    warc_ts = F.to_timestamp(
        F.from_unixtime(F.lit(1704067200) + F.pmod(h("ts"), F.lit(90 * 86400)))
    )

    # Body: 5..68 words, each picked by a per-position hash — one nested
    # higher-order function, all JVM-side.
    n_words = (F.pmod(h("len"), F.lit(64)) + 5).cast("int")
    words_arr = F.array(*[F.lit(w) for w in _WORDS])
    body = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda i: F.element_at(
                words_arr, (F.pmod(F.abs(F.xxhash64(sid, rid, i)), F.lit(len(_WORDS))) + 1).cast("int")
            ),
        ),
        " ",
    )

    edge = F.pmod(h("edge"), F.lit(100))
    text = (
        F.when(edge < 2, body)  # malformed html, text kept for reference
        .when(edge < 5, F.lit(""))  # empty body
        .when(edge < 10, F.concat(body, F.lit(NON_ASCII_SUFFIX)))
        .otherwise(body)
    )
    title = F.concat(F.lit("Page "), rid.cast("string"), F.lit(" of "), domain)

    html_ok = F.concat(
        F.lit("<html><head><title>"),
        title,
        F.lit("</title></head><body><p>"),
        text,
        F.lit("</p></body></html>"),
    )
    html_malformed = F.concat(  # unclosed <p> — the parse stage must reject
        F.lit("<html><head><title>"),
        title,
        F.lit("</title></head><body><p>"),
        text,
        F.lit("</body></html>"),
    )
    html = F.encode(F.when(edge < 2, html_malformed).otherwise(html_ok), "UTF-8")

    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


def default_lang_map(spark: SparkSession) -> DataFrame:
    """lang_raw -> lang_norm lookup (~the reference's util.translate dict)."""
    rows = [
        ("en", "en"),
        ("en-US", "en"),
        ("en-GB", "en"),
        ("fr", "fr"),
        ("FR", "fr"),
        ("fr-CA", "fr"),
        ("de", "de"),
        ("DE", "de"),
        ("es", "es"),
        ("zh", "zh"),
        ("zh-CN", "zh"),
        ("ja", "ja"),
        ("pt", "pt"),
        ("it", "it"),
        ("ko", "ko"),
        ("ru", "ru"),
        ("nl", "nl"),
        ("pl", "pl"),
        ("sv", "sv"),
        ("tr", "tr"),
    ]
    return local_rows_df(spark, rows, "lang_raw string, lang_norm string")


def default_domain_rules(spark: SparkSession) -> DataFrame:
    """domain -> (action, sink) routing rules; unlisted domains default-allow."""
    rows = [
        ("news.example.com", "allow", "hot"),
        ("blog.example.org", "allow", "hot"),
        ("shop.example.net", "allow", "commerce"),
        ("docs.example.io", "allow", "knowledge"),
        ("wiki.example.edu", "allow", "knowledge"),
        ("forum.example.dev", "allow", None),
        ("mail.example.co", "allow", None),
        ("video.example.tv", "allow", "media"),
        ("img.example.cdn", "allow", "media"),
        ("code.example.sh", "allow", "knowledge"),
        ("spam.badsite.biz", "deny", None),
        ("evil.badsite.biz", "deny", None),
    ]
    return local_rows_df(spark, rows, "domain string, action string, sink string")
