"""Custom Python Data Source (Spark 4 API) — the input-plugin extension point.

Shovel's input slot loads arbitrary plugin modules that feed messages into
the graph (reference: src/core/node.js:291-307, src/inputs/*.js). The
Spark-native extension point for "a source the built-ins don't cover" is the
Python Data Source API: register once, then ``spark.read.format("pages")``
anywhere — fully partitioned, schema'd, and filter-aware.

This instance generates the deterministic synthetic pages corpus (same
data model as synth.py) purely from (seed, n) — a WARC-fetcher or
API-poller source would swap the row generator and keep every other line.

Scale: ``numPartitions`` input splits, each generating its id range
independently on its executor — no driver bottleneck, linear scale-out.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


class PagesDataSource(DataSource):
    """``spark.read.format("pages").option("n", 10000).option("seed", 42)``"""

    @classmethod
    def name(cls) -> str:
        return "pages"

    def schema(self) -> str:
        return _DDL

    def reader(self, schema: StructType) -> "PagesReader":
        return PagesReader(self.options)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class PagesReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.seed = int(options.get("seed", 42))
        self.num_partitions = int(options.get("numPartitions", 8))

    def partitions(self):
        step = max(1, self.n // self.num_partitions)
        parts = []
        start = 0
        while start < self.n:
            end = min(self.n, start + step)
            parts.append(_RangePartition(start, end, self.seed))
            start = end
        return parts

    def read(self, partition: _RangePartition):
        """Executor-side row generation for one id range — mirrors synth.py's
        hash-driven construction in plain Python (xxhash64 is JVM-only; md5
        keeps determinism without a JVM dependency)."""
        import datetime
        import hashlib

        domains = [
            ("news.example.com", 20), ("blog.example.org", 15), ("shop.example.net", 10),
            ("docs.example.io", 10), ("forum.example.dev", 8), ("wiki.example.edu", 8),
            ("mail.example.co", 7), ("video.example.tv", 7), ("code.example.sh", 5),
            ("img.example.cdn", 4), ("spam.badsite.biz", 3), ("evil.badsite.biz", 3),
        ]
        langs = [
            ("en", 28), ("en-US", 10), ("fr", 10), ("FR", 5), ("de", 10),
            ("es", 8), ("zh", 7), ("ja", 9), ("zz", 7), ("", 6),
        ]
        dom_slots = [d for d, w in domains for _ in range(w)]
        lang_slots = [l for l, w in langs for _ in range(w)]
        words = "the quick brown fox jumps data spark batch table row query join merge".split()

        def h(rid: int, tag: str) -> int:
            dig = hashlib.md5(f"{self.seed}:{rid}:{tag}".encode()).digest()
            return int.from_bytes(dig[:8], "big")

        base_ts = datetime.datetime(2024, 1, 1)
        for rid in range(partition.start, partition.end):
            domain = dom_slots[h(rid, "domain") % 100]
            lang = lang_slots[h(rid, "lang") % 100]
            url = f"https://{domain}/p/{rid}"
            warc_ts = base_ts + datetime.timedelta(seconds=h(rid, "ts") % (90 * 86400))
            n_words = 5 + h(rid, "len") % 64
            text = " ".join(words[h(rid, f"w{i}") % len(words)] for i in range(n_words))
            title = f"Page {rid} of {domain}"
            html = (
                f"<html><head><title>{title}</title></head>"
                f"<body><p>{text}</p></body></html>"
            ).encode()
            yield (url, warc_ts, html, text, lang)


def register(spark) -> None:
    spark.dataSource.register(PagesDataSource)
