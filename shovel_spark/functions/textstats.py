"""Text analysis functions for training-data pipelines — all native Column
expressions (JVM-side, whole-stage codegen; no Python in the hot path).

These extend the engine beyond the reference's operator set (SURVEY.md §2.8):
a 100 TB web-text pipeline needs token counts, quality scores, language ID,
and content fingerprints at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny stopword profiles for the n-gram/stopword language-ID heuristic.
#: Real deployments would broadcast a bigger profile table; the *shape*
#: (per-language evidence score → argmax) is the scalable part.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "fr": ["le", "la", "les", "de", "et", "est", "que", "une"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "es": ["el", "la", "los", "de", "que", "es", "una", "por"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenizer (split on runs of whitespace, trimmed)."""
    return F.split(F.trim(text), r"\s+")


def adjacent_pairs(arr: Column) -> Column:
    """array<struct<l, r>> of each adjacent element pair of ``arr`` —
    the n-gram/bigram idiom shared by BPE pair counting and phrase
    mining. Empty for arrays of size < 2 (the slice length is floored at
    0, so empty input is safe under ANSI mode)."""
    n = F.greatest(F.size(arr) - 1, F.lit(0))
    return F.arrays_zip(
        F.slice(arr, 1, n).alias("l"),
        F.slice(arr, 2, n).alias("r"),
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def word_token_count(text: Column) -> Column:
    """BPE-ish sub-word proxy: words + punctuation marks counted separately
    (a cheap, deterministic stand-in for a real tokenizer's token count)."""
    words = F.size(F.array_remove(F.split(F.trim(text), r"[\s\p{Punct}]+"), ""))
    puncts = F.length(F.regexp_replace(text, r"[^\p{Punct}]", ""))
    return words + puncts


def stopword_hits(text: Column, words: list[str]) -> Column:
    """Occurrences of any profile word as a whole token."""
    pattern = r"(?i)\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(1)))


def lang_id(text: Column, profiles: dict[str, list[str]] | None = None, default: str = "und") -> Column:
    """Argmax over per-language stopword-evidence scores; ties/zero → default.

    One pass of regexp counting per language — at scale this is a map-only
    stage fused into the scan (no shuffle, no UDF).
    """
    profiles = profiles or LANG_PROFILES
    toks = token_count(text)
    best_score = F.lit(0.0)
    best_lang = F.lit(default)
    for lang, words in profiles.items():
        score = stopword_hits(text, words) / F.greatest(toks, F.lit(1))
        better = score > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, score).otherwise(best_score)
    return F.when(best_score > 0.02, best_lang).otherwise(F.lit(default))


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic — the shape of C4/Gopher-style
    filters: length band + alphabetic-word-length band + alpha ratio +
    punctuation band, equally weighted."""
    n_tok = token_count(text)
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(text, r"[^\p{Punct}]", ""))
    avg_alpha_word = n_alpha / F.greatest(n_tok, F.lit(1))
    alpha_ratio = n_alpha / F.greatest(n_chars, F.lit(1))
    length_ok = F.when((n_tok >= 10) & (n_tok <= 10000), 1.0).otherwise(0.0)
    word_ok = F.when((avg_alpha_word >= 2.0) & (avg_alpha_word <= 12.0), 1.0).otherwise(0.0)
    punct_ok = F.when(n_punct / F.greatest(n_chars, F.lit(1)) <= 0.2, 1.0).otherwise(0.0)
    return F.round((length_ok + word_ok + alpha_ratio + punct_ok) / 4.0, 6)


def duplicate_word_fraction(toks: Column) -> Column:
    """Gopher-style repetition signal: 1 - distinct_words/words. Takes the
    token ARRAY (like :func:`bigrams`) so a caller computing several
    token-level stats tokenizes once — pure array math, map-only."""
    return 1.0 - F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1))


def bigrams(toks: Column) -> Column:
    """Adjacent word pairs as 'w1 w2' strings (clamped like shingles: a
    1-token doc yields its single word).

    Takes the token ARRAY, not raw text: expressions inside higher-order
    lambdas get no CSE, so an inlined split() would re-tokenize the
    document once per bigram (measured 5.6s vs 0.9s at sf0.1) — project
    ``tokens(text)`` behind its own alias first."""
    n = F.size(toks)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, 2), " "),
    )


#: Engine-neutral PII patterns (no lookaround/backrefs — valid in both
#: Java regex and RE2, so a DuckDB oracle replays them byte-for-byte).
#: Order matters: emails first (contain dots+digits), phones before IPs
#: (a dotted phone would otherwise half-match the IP pattern).
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redact_pii(text: Column) -> Column:
    """Replace emails / phone numbers / IPv4 addresses with typed markers —
    the C4-style scrub a web corpus gets before training. Chained
    regexp_replace: map-only, fused into the scan, no UDF."""
    out = text
    for pattern, marker in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, marker)
    return out


def fingerprint(text: Column) -> Column:
    """Exact-dup fingerprint: md5 of whitespace-normalized text."""
    return F.md5(F.regexp_replace(F.trim(text), r"\s+", " "))


def rolling_fingerprint(text: Column, window: int = 8) -> Column:
    """Winnowing-style robust fingerprint: min hash over rolling word
    windows — stable under small edits far from the minimum."""
    toks = tokens(text)
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (window - 1), F.lit(1))),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, window))),
    )
    return F.array_min(grams)
