"""Distributed BPE vocabulary learning and subword segmentation.

Byte-pair encoding (Sennrich, Haddow & Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units") is how every modern LLM
tokenizer's vocabulary is learned; a training-data engine that reports
token budgets, packs sequences (`sampling.pack_blocks`) or measures
tokenizer fertility needs it natively. The reference has no analog (its
closest surface is per-document routing, `/root/reference/src/core/node.js`);
this module is part of the LLM-pipeline tier SURVEY §2 adds on top.

Spark-first shape — the key scale decision is WHAT the iterations run on:

- :func:`word_counts` is the ONLY corpus-sized pass: one tokenize +
  map-side-combined groupBy down to the word-frequency table, whose size
  is the corpus VOCABULARY (Heaps' law: ~millions of rows at 100 TB),
  not the corpus.
- :func:`bpe_train` then iterates on that small table: per merge step,
  one pair-count groupBy (rows = distinct adjacent symbol pairs) and one
  TakeOrdered(1) election — driver state is exactly one (left, right,
  count) row per step, bounded by ``num_merges``. The merge is applied
  with a literal string `replace` on a separator-joined form (below), a
  map-only projection; `localCheckpoint` truncates the per-iteration
  lineage so step k's plan does not replay steps 1..k-1.
- :func:`bpe_segment` applies a learned merge list to documents as one
  map-only projection: the merges are collected (``num_merges`` rows,
  bounded) and unrolled into a chain of nested `replace` calls inside a
  single `transform` lambda — whole-stage-codegen, no Python in the row
  path, no shuffle.

Greedy-merge fidelity: a symbol sequence [a, b, c] is carried as the
string ``" a  b  c "`` — symbols joined by TWO spaces, wrapped by one.
Merging pair (l, r) is then ``replace(s, " l  r ", " lr ")``: literal
`replace` scans left-to-right over non-overlapping occurrences, which is
exactly BPE's greedy merge pass ("aaa" + (a,a) -> [aa, a]), and the
shared double-space separator keeps back-to-back occurrences mergeable
(" a  b  a  b " -> " ab  ab ") while the single-space boundary stops
false matches against symbol suffixes (["xa","b"] never matches " a  b ").
DuckDB's `replace` has identical semantics, so the oracle replays every
step bit-for-bit (`demo_queries.docs_bpe_merges`).

Words are restricted to printable ASCII by default: `split(word, '')`
splits on UTF-16 code units in the JVM and code points elsewhere, so
non-ASCII words would be engine-divergent (documented limitation; pass
``ascii_only=False`` when the corpus is known single-script and both
sides agree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shovel_spark.session import local_rows_df
from pyspark.sql.types import LongType, StringType, StructField, StructType

from pyspark.sql import Column

from shovel_spark.functions.textstats import adjacent_pairs, tokens

END_OF_WORD = "</w>"

_MERGES_SCHEMA = StructType(
    [
        StructField("step", LongType(), False),
        StructField("left", StringType(), False),
        StructField("right", StringType(), False),
        StructField("pair_count", LongType(), False),
    ]
)


def word_counts(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    ascii_only: bool = True,
) -> DataFrame:
    """(word, cnt) frequency table — the single corpus-sized pass.

    Whitespace tokens, empty strings dropped, optionally restricted to
    printable ASCII (see module docstring). ``min_count`` prunes the
    long tail before the merge iterations ever see it.
    """
    w = (
        df.filter(F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != ""))
        .select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
    )
    if ascii_only:
        w = w.filter(F.col("word").rlike(r"^[ -~]+$"))
    out = w.groupBy("word").agg(F.count("*").alias("cnt"))
    if min_count > 1:
        out = out.filter(F.col("cnt") >= min_count)
    return out


def _seq_str(syms: Column | str) -> Column:
    """Separator-joined carrier string for a symbol array (see module
    doc) — the ONLY place the carrier format is defined; every merge
    application goes through it."""
    return F.concat(F.lit(" "), F.array_join(syms, "  "), F.lit(" "))


def _merge_in_carrier(s: Column, left: str, right: str) -> Column:
    """One greedy merge pass applied to a carrier string."""
    return F.replace(s, F.lit(f" {left}  {right} "), F.lit(f" {left}{right} "))


def _from_carrier(s: Column) -> Column:
    """Carrier string back to the symbol array."""
    return F.split(F.trim(s), "  ")


def _merge_once(syms_col, left: str, right: str) -> Column:
    """Apply one greedy merge pass to a symbol-array column."""
    return _from_carrier(_merge_in_carrier(_seq_str(syms_col), left, right))


def bpe_train(
    spark: SparkSession,
    words: DataFrame,
    num_merges: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Learn ``num_merges`` BPE merges from a (word, cnt) table.

    Returns ``(merges, final_words)``: merges is (step, left, right,
    pair_count) — ``pair_count`` the corpus frequency that elected the
    pair, ties broken (count desc, left asc, right asc) so the election
    is deterministic and oracle-replayable; final_words is (word, cnt,
    syms) with each word's symbol sequence after all merges.

    Every word starts as its characters plus the standard ``</w>``
    end-of-word marker. Stops early if no pair remains (all words fully
    merged). Per-step cost: one groupBy over distinct adjacent pairs of
    the VOCAB table + a 1-row TakeOrdered — nothing corpus-sized.
    """
    # eager=False: the next step's pair-count collect materializes the
    # checkpoint inside its own job — one job per merge instead of two
    # (the checkpoint still truncates lineage at first use)
    state = words.select(
        "word",
        "cnt",
        F.concat(F.split("word", ""), F.array(F.lit(END_OF_WORD))).alias("syms"),
    ).localCheckpoint(eager=False)

    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, num_merges + 1):
        pairs = state.select(
            "cnt", F.explode(adjacent_pairs(F.col("syms"))).alias("__p")
        ).select(
            F.col("__p.l").alias("left"), F.col("__p.r").alias("right"), "cnt"
        )
        best = (
            pairs.groupBy("left", "right")
            .agg(F.sum("cnt").alias("pair_count"))
            .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        row = best[0]
        merges.append((step, row.left, row.right, row.pair_count))
        state = state.withColumn(
            "syms", _merge_once("syms", row.left, row.right)
        ).localCheckpoint(eager=False)

    merges_df = local_rows_df(spark, merges, _MERGES_SCHEMA)
    return merges_df, state


def bpe_segment(
    df: DataFrame,
    merges: DataFrame | list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    ascii_only: bool = True,
) -> DataFrame:
    """Segment each document into BPE subword tokens using learned merges.

    Adds ``out_col`` (array<string>): for every whitespace word, split to
    characters + ``</w>`` and apply the merges IN TRAINING ORDER, then
    flatten across words. The merge list is collected to the driver
    (``num_merges`` rows, bounded by construction) and unrolled into
    nested literal `replace` calls inside one `transform` lambda — the
    whole segmentation is a single map-only, codegen'd projection.

    Words outside printable ASCII are kept as one opaque symbol +
    ``</w>`` when ``ascii_only`` (matching :func:`word_counts`'s
    exclusion of them from training).
    """
    if isinstance(merges, DataFrame):
        ordered = [
            (r.left, r.right)
            for r in merges.orderBy("step").select("step", "left", "right").collect()
        ]
    else:
        ordered = list(merges)

    def seg_word(w):
        chars = F.when(
            F.lit(ascii_only) & ~w.rlike(r"^[ -~]+$"), F.array(w)
        ).otherwise(F.split(w, ""))
        s = _seq_str(F.concat(chars, F.array(F.lit(END_OF_WORD))))
        for left, right in ordered:
            s = _merge_in_carrier(s, left, right)
        return _from_carrier(s)

    toks = F.filter(tokens(F.col(text_col)), lambda w: w != "")
    return df.withColumn(out_col, F.flatten(F.transform(toks, seg_word)))
