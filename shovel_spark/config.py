"""Declarative job config — the YAML pipeline spec, Spark-first.

Shovel wires its six node slots from YAML with ``${ENV:default}``
substitution and per-node validated options (reference:
src/core/pipeline_config.js:30-54, src/core/node.js:316-325). Here the same
declarative surface compiles to the DataFrame chain: sink predicates are SQL
expressions (Catalyst-visible → pushdown/codegen), lookups are inline maps or
parquet paths, and validation happens at load time (config error ≙ analysis
error, never mid-job).

Example::

    name: pages
    input: { path: /data/pages, format: parquet }
    parser: native            # native | regex | pandas
    buckets: 64
    out_dir: ${OUT_DIR:/tmp/shovel_out}
    lang_map: { en: en, en-US: en, fr: fr }
    lang_default: und
    domain_rules:
      - { domain: spam.badsite.biz, action: deny }
      - { domain: news.example.com, action: allow, sink: hot }
    sinks:
      - { name: hot, predicate: "rule_sink = 'hot'" }
      - { name: english, predicate: "lang_norm = 'en'" }
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from shovel_spark.session import local_rows_df
from pyspark.sql import functions as F

from shovel_spark.operators.route import SinkRule
from shovel_spark.pipeline import JobConfig, substitute_env

_VALID_PARSERS = ("native", "regex", "pandas")


@dataclass
class PipelineSpec:
    """Validated job spec; ``compile`` yields the runnable pieces."""

    name: str
    input_path: str | None
    out_dir: str
    parser: str = "native"
    buckets: int = 64
    lang_map: dict[str, str] = field(default_factory=dict)
    lang_default: str = "und"
    domain_rules: list[dict[str, Any]] = field(default_factory=list)
    sinks: list[dict[str, str]] = field(default_factory=list)

    @classmethod
    def from_dict(cls, raw: dict[str, Any]) -> "PipelineSpec":
        raw = _substitute_deep(raw)
        errors: list[str] = []
        name = raw.get("name") or "pages"
        inp = raw.get("input") or {}
        out_dir = raw.get("out_dir")
        if not out_dir:
            errors.append("out_dir is required")
        parser = raw.get("parser", "native")
        if parser not in _VALID_PARSERS:
            errors.append(f"parser must be one of {_VALID_PARSERS}, got {parser!r}")
        buckets = int(raw.get("buckets", 64))
        if buckets < 1:
            errors.append("buckets must be >= 1")
        sinks = raw.get("sinks") or []
        seen: set[str] = set()
        for s in sinks:
            if not s.get("name") or not s.get("predicate"):
                errors.append(f"sink needs name+predicate: {s}")
            elif s["name"] in seen:
                errors.append(f"duplicate sink name: {s['name']}")
            else:
                seen.add(s["name"])
        for r in raw.get("domain_rules") or []:
            if r.get("action") not in ("allow", "deny"):
                errors.append(f"domain_rule action must be allow|deny: {r}")
        if errors:
            raise ValueError("invalid pipeline spec: " + "; ".join(errors))
        return cls(
            name=name,
            input_path=inp.get("path"),
            out_dir=out_dir,
            parser=parser,
            buckets=buckets,
            lang_map=dict(raw.get("lang_map") or {}),
            lang_default=raw.get("lang_default", "und"),
            domain_rules=list(raw.get("domain_rules") or []),
            sinks=list(sinks),
        )

    @classmethod
    def load(cls, path: str) -> "PipelineSpec":
        """YAML or JSON file (YAML needs pyyaml; JSON always works)."""
        with open(path) as f:
            text = f.read()
        if path.endswith(".json"):
            return cls.from_dict(json.loads(text))
        import yaml

        return cls.from_dict(yaml.safe_load(text))

    def job_config(self) -> JobConfig:
        rules = [SinkRule(s["name"], F.expr(s["predicate"])) for s in self.sinks]
        return JobConfig(
            name=self.name,
            input_path=self.input_path,
            out_dir=self.out_dir,
            parser_impl=self.parser,
            lang_default=self.lang_default,
            n_buckets=self.buckets,
            sink_rules=rules,
        )

    def lang_map_df(self, spark: SparkSession) -> DataFrame:
        # truly empty when unconfigured — a dummy ("","") row would map
        # empty-string langs to "" instead of the default
        return local_rows_df(
            spark, list(self.lang_map.items()), "lang_raw string, lang_norm string"
        )

    def domain_rules_df(self, spark: SparkSession) -> DataFrame:
        rows = [(r["domain"], r["action"], r.get("sink")) for r in self.domain_rules]
        return local_rows_df(spark, rows, "domain string, action string, sink string")


def _substitute_deep(value):
    """${ENV:default} substitution through nested config (reference:
    src/core/pipeline_config.js:42-54)."""
    if isinstance(value, str):
        return substitute_env(value)
    if isinstance(value, dict):
        return {k: _substitute_deep(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_substitute_deep(v) for v in value]
    return value


# --- duration strings (reference: src/core/utils.js:97-101 wraps the
# parse-duration package; used for flush timeouts and batching windows) ---

_DURATION_SEG = re.compile(r"(-?\d*\.?\d+)\s*([a-zA-Zµ]*)")

_MS = 1.0
_DURATION_UNITS = {
    "": _MS, "ms": _MS, "millisecond": _MS, "milliseconds": _MS,
    "ns": _MS / 1e6, "nanosecond": _MS / 1e6, "nanoseconds": _MS / 1e6,
    "us": _MS / 1e3, "µs": _MS / 1e3, "microsecond": _MS / 1e3, "microseconds": _MS / 1e3,
    "s": 1000.0, "sec": 1000.0, "secs": 1000.0, "second": 1000.0, "seconds": 1000.0,
    "m": 60_000.0, "min": 60_000.0, "mins": 60_000.0, "minute": 60_000.0, "minutes": 60_000.0,
    "h": 3_600_000.0, "hr": 3_600_000.0, "hrs": 3_600_000.0, "hour": 3_600_000.0, "hours": 3_600_000.0,
    "d": 86_400_000.0, "day": 86_400_000.0, "days": 86_400_000.0,
    "w": 604_800_000.0, "wk": 604_800_000.0, "week": 604_800_000.0, "weeks": 604_800_000.0,
    "y": 31_557_600_000.0, "yr": 31_557_600_000.0, "year": 31_557_600_000.0, "years": 31_557_600_000.0,
    "mo": 31_557_600_000.0 / 12, "month": 31_557_600_000.0 / 12, "months": 31_557_600_000.0 / 12,
}


def parse_duration(value: str | int | float) -> float:
    """'1h 30min' / '500ms' / '2.5 hrs' / 90 → milliseconds.

    The config-surface twin of the reference's Utils.Duration.parse
    (src/core/utils.js:97-101, parse-duration semantics: unit-suffixed
    segments summed; a bare number is milliseconds; year = 365.25 days,
    month = year/12). Raises ValueError on unknown units or empty input.
    """
    if isinstance(value, (int, float)):
        return float(value)
    # digit-grouping commas vanish BEFORE parsing ('1,000ms' == 1000ms),
    # matching the npm package's /(\d),(\d)/ strip — without this, '1,000ms'
    # would misparse as 1 bare-ms + 000ms = 1.0
    text = re.sub(r"(\d),(\d)", r"\1\2", value).strip()
    if not text:
        raise ValueError("empty duration")
    total = 0.0
    matches = list(_DURATION_SEG.finditer(text))
    # every non-separator character must belong to a parsed segment
    consumed = "".join(re.sub(r"[\s,]+", "", m.group(0)) for m in matches)
    if not matches or consumed != re.sub(r"[\s,]+", "", text):
        raise ValueError(f"cannot parse duration {value!r}")
    for m in matches:
        num, unit = m.groups()
        key = unit.lower()
        if key not in _DURATION_UNITS:
            raise ValueError(f"unknown duration unit {unit!r} in {value!r}")
        total += float(num) * _DURATION_UNITS[key]
    return total
