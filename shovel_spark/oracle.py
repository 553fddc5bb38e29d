"""Pure-Python oracle of shovel's parse → enrich → route → count semantics.

Used only by the test suite: it re-implements the reference's message path
(reference: src/core/processor.js:120-144 counters; src/core/node.js:461-466
auto-reject on handler exception; src/core/output.js:32-45 ack/ignore/reject
all count as delivered 'out') row-by-row in plain Python, so the Spark
pipeline's per-sink counts and routed-row sets can be asserted equal to an
independent implementation (BASELINE.md "per-sink count equality").
"""

from __future__ import annotations

import re
from collections import Counter
from dataclasses import dataclass, field
from urllib.parse import urlparse

_BODY_RE = re.compile(r"<p>(.*?)</p>", re.S)
_TITLE_RE = re.compile(r"<title>(.*?)</title>", re.S)


@dataclass
class OracleResult:
    counts: Counter = field(default_factory=Counter)  # status -> n
    sink_rows: dict[str, set] = field(default_factory=dict)  # sink -> {url}
    sink_counts: Counter = field(default_factory=Counter)  # sink -> n
    texts: dict[str, str] = field(default_factory=dict)  # url -> extracted text


def run_oracle(
    rows: list[dict],
    lang_map: dict[str, str],
    domain_rules: dict[str, tuple[str, str | None]],
    sink_rules: list[tuple[str, str, object]],
) -> OracleResult:
    """Replay the pipeline row-by-row.

    ``sink_rules``: ordered list of (name, field, value) — first match wins,
    where value may be a str or a set of str (isin).
    """
    res = OracleResult()
    for row in rows:
        res.counts["in"] += 1
        url = row["url"]
        html: bytes = row["html"]

        # --- parse (decoder slot) --- U+FFFD replacement, matching every
        # Spark parse path and the reference's Buffer.toString: invalid bytes
        # degrade the text, they don't by themselves reject the row
        decoded = html.decode("utf-8", "replace") if html is not None else None
        m = _BODY_RE.search(decoded) if decoded is not None else None
        parse_ok = m is not None
        text = m.group(1) if m else None

        # --- enrich (translate with default) ---
        lang_norm = lang_map.get(row["lang"], "und")
        domain = urlparse(url).hostname
        action, rule_sink = domain_rules.get(domain, ("allow", None))

        # --- route ---
        if not parse_ok or action == "deny":
            status, sink = "rejected", "dead_letter"
        else:
            sink = None
            ctx = {"lang_norm": lang_norm, "rule_sink": rule_sink, "domain": domain}
            for name, fld, value in sink_rules:
                v = ctx.get(fld)
                matched = v in value if isinstance(value, (set, frozenset)) else v == value
                if matched:
                    sink = name
                    break
            status = "acked" if sink is not None else "ignored"

        res.counts[status] += 1
        if sink is not None:
            res.sink_rows.setdefault(sink, set()).add(url)
            res.sink_counts[sink] += 1
        if parse_ok:
            res.texts[url] = text
    return res
