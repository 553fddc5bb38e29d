"""Corpus-statistical quality scoring — n-gram commonness.

Between the scan-speed heuristics (textstats.quality_score) and a real
LM-perplexity filter sits the self-supervised statistical tier: score each
document by how common its word bigrams are IN THIS CORPUS. Fluent prose
reuses the corpus's own frequent n-grams; gibberish and boilerplate-free
junk sit in the rare tail. No external model — the corpus is the model
(the same two-pass shape as IDF).

Scale shape: grams are first reduced to per-(doc, gram) counts — a
map-side-combined groupBy, so the shuffle carries one row per DISTINCT
(doc, gram), not per occurrence. Corpus totals are a second (tiny,
pre-aggregated) groupBy on the gram key, joined back as an equi-join that
AQE's skew-join splits if a stop-gram is still hot. Never a window over
the gram key: ``count(*) OVER (PARTITION BY gram)`` would sort every
occurrence of "of the" into ONE task at 100 TB — the exact skew
``dedup.py`` documents for shingles. The per-(doc, gram) rollup bounds a
hot gram's join bucket at n_docs rows instead of n_occurrences.
Grams are hashed to 8-byte longs before any shuffle (the gram STRING
never shuffles — at 100 TB the bigram universe is billions of short
strings; same md5/xxhash64 family knob as operators/sampling, so a DuckDB
oracle replays the exact grouping). Per-doc score is exact integer
arithmetic until one final division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from shovel_spark.functions.textstats import bigrams, tokens
from shovel_spark.operators.sampling import _hash_long


def ngram_commonness(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 7,
    family: str = "xxhash64",
) -> DataFrame:
    """Add ``commonness`` = mean corpus-wide occurrence count of the doc's
    bigram occurrences (≥ 1.0; higher = more formulaic/fluent, 1.0 = every
    bigram unique in the corpus). Deterministic: depends only on the corpus
    multiset, never on partitioning. Clamps like :func:`textstats.bigrams`
    (a 1-token doc scores its single word).

    Rows with NULL ids or NULL text are passed through with NULL
    commonness (left join back onto ``df``); NULL ids contribute nothing
    to the corpus statistics. ``id_col`` must be unique per row — duplicate
    ids would pool their grams into one score fanned back onto every
    duplicate row.
    """
    grams = (
        df.filter(F.col(id_col).isNotNull())
        .select(F.col(id_col).alias("__id"), tokens(F.col(text_col)).alias("__w"))
        .select("__id", F.explode(bigrams(F.col("__w"))).alias("__gram"))
        # NULL text yields [NULL] from the clamped bigram transform, and
        # concat_ws would hash that to the shared '{seed}:' key, coupling
        # every NULL-text doc — drop the NULL grams instead (those docs
        # then surface with NULL commonness via the left join)
        .filter(F.col("__gram").isNotNull())
        .select("__id", _hash_long(F.col("__gram"), seed, family).alias("__gk"))
    )
    # one shuffle (map-side combined) to per-(doc, gram) occurrence counts
    doc_gram = grams.groupBy("__id", "__gk").agg(F.count("*").alias("__c"))
    # corpus totals over the pre-aggregated pairs (hot gram = n_docs rows,
    # not n_occurrences); the join back is AQE-skew-splittable
    totals = doc_gram.groupBy("__gk").agg(F.sum("__c").alias("__cnt"))
    per_doc = doc_gram.join(totals, "__gk").groupBy("__id").agg(
        # mean over occurrences: each (doc, gram) contributes its corpus
        # total once per occurrence — exact integers until this division
        (F.sum(F.col("__c") * F.col("__cnt")) / F.sum("__c")).alias("commonness")
    )
    return df.join(per_doc, df[id_col] == per_doc["__id"], "left").drop("__id")


def tfidf_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 3,
) -> DataFrame:
    """Top-``top_k`` characteristic terms per document by smoothed TF-IDF —
    the per-doc keyword signal a curation pipeline uses for topic tagging
    and mix balancing (the inverse of :func:`ngram_commonness`: that scores
    how ORDINARY a doc is, this extracts what makes it DISTINCT).

    score = (tf / n_tokens) * ln((N + 1) / (df + 1)), ties broken by term
    text ascending — deterministic, partition-invariant, engine-neutral
    (natural log on exact integer counts; no corpus-order dependence).

    Scale shape: one shuffle to per-(doc, term) counts (map-side combined),
    document frequency from a second groupBy over the DISTINCT pairs (a
    stop-word's reduce row count is n_docs, not n_occurrences — the same
    rollup-before-totals defense as ngram_commonness), an equi-join back
    (AQE-skew-splittable), then a rank-limit window per doc
    (WindowGroupLimit). Returns (id, term, score) rows. NULL/empty texts
    and NULL ids yield no rows.
    """
    from pyspark.sql import Window

    base = (
        df.filter(
            F.col(id_col).isNotNull()
            & F.col(text_col).isNotNull()
            & (F.trim(F.col(text_col)) != "")
        )
        .select(F.col(id_col).alias("__id"), tokens(F.col(text_col)).alias("__w"))
        .withColumn("__n", F.size("__w"))
    )
    # tf feeds the doc-frequency rollup AND the score join (and n_docs
    # triggers base): checkpoint so the scan+tokenize+explode runs once,
    # not three times (same multi-consumer rule as classify.logreg_fit)
    tf = (
        base.select("__id", "__n", F.explode("__w").alias("term"))
        .groupBy("__id", "term", "__n")
        .agg(F.count("*").alias("__tf"))
        .localCheckpoint(eager=False)
    )
    n_docs = tf.select("__id").distinct().count()
    docfreq = tf.groupBy("term").agg(F.count("*").alias("__df"))
    scored = tf.join(docfreq, "term").select(
        F.col("__id").alias(id_col),
        "term",
        (
            (F.col("__tf") / F.col("__n"))
            * F.log((F.lit(float(n_docs)) + 1.0) / (F.col("__df") + 1.0))
        ).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= top_k)
        .drop("__rn")
    )


#: Fixed stopword list for the Gopher "contains >= 2 stopwords" rule
#: (Rae et al. 2021 use a similar small English function-word set).
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_flags(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    max_dup_frac: float = 0.30,
) -> DataFrame:
    """Per-rule Gopher quality flags (Rae et al. 2021, appendix A1.1 —
    the public rule set behind MassiveText; also the template for
    RefinedWeb/Dolma filtering): each rule is an INDEPENDENT boolean
    column so the pipeline can report per-rule removal rates and audit
    WHICH rule rejected a document, instead of one opaque score
    (textstats.quality_score is the blended-score sibling).

      - wc_ok:    min_words <= word count <= max_words (Gopher: 50..100k)
      - mwl_ok:   3 <= mean word length <= 10
      - sym_ok:   symbol-to-word ratio (#, ellipsis) <= 0.1
      - alpha_ok: >= 80% of words contain an alphabetic character
      - stop_ok:  >= 2 hits from an 8-word stopword list
      - rep_ok:   duplicate-word fraction <= max_dup_frac (Gopher: 0.30)
      - gopher_pass: AND of all six

    All JVM Column expressions over ONE tokenization — map-only, no
    shuffle, fully replayable in SQL (the oracle recomputes every rule).
    Adds the six flags + gopher_pass to the input columns.

    The word-count band and the repetition ceiling are parameterized
    (defaults = the published Gopher values) because they are the two
    knobs real pipelines re-tune per corpus: a tiny-vocabulary corpus
    (like the synthetic test tables here) pushes duplicate-word fractions
    far above Gopher's web-text 0.30, which would turn the AND gate into
    a constant. Tune the knob, never the rule definitions.
    """
    from shovel_spark.functions.textstats import (
        duplicate_word_fraction,
        stopword_hits,
        tokens as _tok,
    )

    out = df.withColumn("__toks", _tok(F.col(text_col)))
    n = F.size("__toks")
    nz = F.greatest(n, F.lit(1))
    # sum of word lengths == chars excluding whitespace (exact, no loop)
    char_sum = F.length(F.regexp_replace(F.col(text_col), r"\s+", ""))
    mwl = char_sum / nz
    n_sym = (
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"(#|\.\.\.)"), F.lit(1)))
    )
    n_alpha_words = F.size(F.filter("__toks", lambda w: w.rlike("[A-Za-z]")))
    flags = {
        "wc_ok": (n >= min_words) & (n <= max_words),
        "mwl_ok": (mwl >= 3.0) & (mwl <= 10.0),
        "sym_ok": (n_sym / nz) <= 0.1,
        "alpha_ok": (n_alpha_words / nz) >= 0.80,
        "stop_ok": stopword_hits(F.col(text_col), GOPHER_STOPWORDS) >= 2,
        "rep_ok": duplicate_word_fraction(F.col("__toks")) <= max_dup_frac,
    }
    for name, expr in flags.items():
        out = out.withColumn(name, expr)
    gate = F.lit(True)
    for name in flags:
        gate = gate & F.col(name)
    return out.withColumn("gopher_pass", gate).drop("__toks")


def remove_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: list[str] | None = None,
    para_words: int = 10,
    min_words: int = 5,
    min_stop_ratio: float = 0.2,
) -> DataFrame:
    """jusText-style boilerplate removal with document reassembly — the
    main-content extraction stage of a webtext pipeline (trafilatura /
    jusText sit here in production crawls): classify each paragraph as
    content or boilerplate from LOCAL signals, then apply jusText's
    context rule so borderline paragraphs sandwiched between good ones
    survive, and rebuild each document from the kept paragraphs in order.

    Paragraphs are consecutive ``para_words``-word windows (same
    convention as dedup.paragraph_dedup: the synthetic corpus has no
    newline structure; swap the splitter for ``split(text, '\\n\\n')``
    on real pages). A paragraph is GOOD if it has >= ``min_words`` words
    AND a stopword ratio >= ``min_stop_ratio`` — jusText's core signal:
    functional prose carries function words, link lists and nav chrome
    don't. A non-good paragraph is NEAR-GOOD (kept) if an adjacent
    paragraph is good; everything else is dropped.

    Returns (id, n_paras, n_kept, text) — one row per input doc, text =
    kept paragraphs rejoined ('' if everything was boilerplate).

    Scale shape: splitting and scoring are map-only higher-order array
    functions (no shuffle, no Python); the context rule is a lag/lead
    window PARTITIONED BY doc — bounded by one document's paragraph
    count, never global; reassembly is the same per-doc sort_array
    groupBy as paragraph_dedup. The stopword list rides along as a
    literal array (broadcast-sized by definition).
    """
    from pyspark.sql import Window

    from shovel_spark.operators.dedup import (
        reassemble_paragraphs,
        split_paragraph_windows,
    )

    if stopwords is None:
        stopwords = ["the", "data", "key", "value", "row"]
    stop_arr = F.array(*[F.lit(w) for w in stopwords])

    with_counts, windows = split_paragraph_windows(df, text_col, id_col, para_words)
    paras = windows.select(
        id_col,
        "idx",
        F.array_join("__pw", " ").alias("__para"),
        F.size("__pw").alias("__nw"),
        F.size(
            F.filter("__pw", lambda w: F.array_contains(stop_arr, w))
        ).alias("__ns"),
    )
    good = (F.col("__nw") >= min_words) & (
        F.col("__ns") >= F.col("__nw") * F.lit(min_stop_ratio)
    )
    w = Window.partitionBy(id_col).orderBy("idx")
    scored = paras.withColumn("__good", good).withColumn(
        "__keep",
        F.col("__good")
        | F.coalesce(F.lag("__good").over(w), F.lit(False))
        | F.coalesce(F.lead("__good").over(w), F.lit(False)),
    )
    kept = scored.filter("__keep").select(id_col, "idx", "__para")
    return reassemble_paragraphs(with_counts, kept, text_col, id_col)
