"""Unicode text normalization for the corpus (NFC/NFKC + control strip).

Web-crawled text arrives in mixed normalization forms: the same visible
string can be composed (é = U+00E9) or decomposed (e + U+0301), which
silently defeats exact dedup, shingle hashing, and equality joins —
every content-hash operator in this engine assumes byte-identical text
for identical content. Normalizing to NFC before hashing is the
standard fix (and what the C* web-corpus pipelines do before dedup).

The reference performs no unicode handling (documents pass through
byte-identical, `/root/reference/src/decoders/noop.js`); this module is
part of the LLM-pipeline cleaning tier.

Spark shape: the JVM has no NFC builtin reachable from `pyspark.sql.
functions`, so this is one of the engine's few deliberate Python paths —
an Arrow-batched pandas UDF (vectorized transfer, no per-row pickling)
applying `unicodedata.normalize`. It is a map-only projection: no
shuffle, composes with any downstream hash/dedup stage, and the batch
size rides `spark.sql.execution.arrow.maxRecordsPerBatch`. Control-char
stripping stays JVM-side as a single `regexp_replace`.

DuckDB's `nfc_normalize` matches `unicodedata.normalize("NFC", ...)`
codepoint-for-codepoint (both implement UAX #15), so oracle queries can
value-check the UDF output by md5 (`demo_queries.docs_nfc_normalize`).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_FORMS = ("NFC", "NFD", "NFKC", "NFKD")


def normalize_udf(form: str = "NFC"):
    """Arrow-batched pandas UDF normalizing strings to the given Unicode
    form. NULLs pass through."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: unicodedata.normalize(form, v) if v is not None else None
        )

    return _norm


def nfc(col: Column | str) -> Column:
    """NFC-normalize a string column (the dedup-safe canonical form)."""
    return normalize_udf("NFC")(F.col(col) if isinstance(col, str) else col)


def nfkc(col: Column | str) -> Column:
    """NFKC-normalize (also folds compatibility forms: ligatures,
    full-width digits — lossier, for matching rather than storage)."""
    return normalize_udf("NFKC")(F.col(col) if isinstance(col, str) else col)


def strip_controls(col: Column | str) -> Column:
    """Remove C0/C1 control characters except tab and newline — JVM-side
    single regexp_replace, no Python."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"[\x00-\x08\x0B-\x1F\x7F-\x9F]", "")
