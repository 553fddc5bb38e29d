from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shovel_spark.operators.quality import ngram_commonness


def test_unique_bigrams_score_one(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["commonness"] for r in ngram_commonness(df).collect()}
    assert out == {1: 1.0, 2: 1.0}


def test_repeated_bigrams_score_higher(spark):
    rows = [(i, "the cat sat") for i in range(5)] + [(99, "weird zxq glyph")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["commonness"] for r in ngram_commonness(df).collect()}
    assert out[0] == 5.0  # both bigrams occur 5x corpus-wide
    assert out[99] == 1.0
    assert all(out[i] == 5.0 for i in range(5))


def test_single_token_doc_clamps(spark):
    df = spark.createDataFrame([(1, "solo"), (2, "solo")], "doc_id long, text string")
    out = {r["doc_id"]: r["commonness"] for r in ngram_commonness(df).collect()}
    assert out == {1: 2.0, 2: 2.0}


def test_null_text_passes_through(spark):
    df = spark.createDataFrame([(1, "a b"), (2, None)], "doc_id long, text string")
    out = {r["doc_id"]: r["commonness"] for r in ngram_commonness(df).collect()}
    assert out[1] == 1.0 and out[2] is None


def test_partition_invariant(spark):
    rows = [(i, f"tok{i % 3} tok{(i + 1) % 3} tok{i % 2}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc_id"]: r["commonness"] for r in ngram_commonness(df).collect()}
    b = {r["doc_id"]: r["commonness"] for r in ngram_commonness(df.repartition(7)).collect()}
    assert a == b


def test_no_window_over_gram_key(spark):
    """Scale guard: corpus frequency must come from a map-side-combined
    groupBy + equi-join, never ``count(*) OVER (PARTITION BY gram)`` — a
    window would sort every occurrence of a stop-gram into one task."""
    df = spark.createDataFrame([(1, "a b c"), (2, "a b")], "doc_id long, text string")
    plan = ngram_commonness(df)._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in plan


def test_tfidf_rare_terms_beat_stopwords(spark):
    """A term appearing in every doc scores below a doc-unique term at
    equal tf; output is top-k, tie-broken by term, WindowGroupLimit plan."""
    from shovel_spark.operators.quality import tfidf_terms

    rows = [(i, f"stop stop unique{i} other{i}") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_terms(df, top_k=2)
    got = {(r.doc_id, r.term) for r in out.collect()}
    for i in range(6):
        assert (i, f"unique{i}") in got and (i, f"other{i}") in got  # 'stop' never top
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_tfidf_partition_invariant_and_skips_empty(spark):
    from shovel_spark.operators.quality import tfidf_terms

    rows = [(i, f"w{i % 3} w{(i + 1) % 4} common") for i in range(20)] + [
        (90, ""), (91, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {(r.doc_id, r.term, round(r.score, 9)) for r in tfidf_terms(df).collect()}
    b = {(r.doc_id, r.term, round(r.score, 9)) for r in tfidf_terms(df.repartition(7)).collect()}
    assert a == b
    assert not any(d in (90, 91) for d, _, _ in a)


def test_bigram_lm_hand_computed(spark):
    """Add-alpha bigram LM against hand-computed probabilities on a 2-doc
    training corpus, including the unseen-bigram and unseen-history paths."""
    import math

    from shovel_spark.operators.lm import score_bigram_logprob, train_bigram_lm

    train = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    # train bigrams: (a,b)x3, (b,a)x1, (b,c)x1; histories: a:3, b:2; V=2
    uni, bi = train_bigram_lm(train)
    u = {r.w1: r.c1 for r in uni.collect()}
    b = {(r.w1, r.w2): r.c12 for r in bi.collect()}
    assert u == {"a": 3, "b": 2}
    assert b == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}

    score = {
        r.doc_id: (r.n_bigrams, r.avg_logprob, r.perplexity)
        for r in score_bigram_logprob(
            spark.createDataFrame(
                [(10, "a b"), (11, "a z"), (12, "z q"), (13, "solo")],
                "doc_id long, text string",
            ),
            uni, bi, alpha=0.5,
        ).collect()
    }
    V = 2
    p_ab = (3 + 0.5) / (3 + 0.5 * V)      # seen bigram
    p_az = (0 + 0.5) / (3 + 0.5 * V)      # unseen bigram, seen history
    p_zq = (0 + 0.5) / (0 + 0.5 * V)      # unseen history -> 1/V
    assert score[10][0] == 1 and abs(score[10][1] - math.log(p_ab)) < 1e-12
    assert abs(score[11][1] - math.log(p_az)) < 1e-12
    assert abs(score[12][1] - math.log(p_zq)) < 1e-12
    assert 13 not in score  # single-token doc: no bigrams, excluded
    assert abs(score[10][2] - math.exp(-score[10][1])) < 1e-12

    # min_count prunes rare bigrams but never the history table
    uni2, bi2 = train_bigram_lm(train, min_count=2)
    assert {(r.w1, r.w2) for r in bi2.collect()} == {("a", "b")}
    assert {r.w1 for r in uni2.collect()} == {"a", "b"}


def test_bigram_lm_ranks_shuffled_text_below_natural(spark):
    """The filter's point: token-shuffled (unnatural) text scores lower
    than text drawn from the training distribution."""
    from shovel_spark.operators.lm import score_bigram_logprob, train_bigram_lm

    sent = "the quick brown fox jumps over the lazy dog"
    train = spark.createDataFrame(
        [(i, sent) for i in range(20)], "doc_id long, text string"
    )
    uni, bi = train_bigram_lm(train)
    probe = spark.createDataFrame(
        [(100, sent), (101, "dog the over quick lazy fox brown jumps the")],
        "doc_id long, text string",
    )
    s = {r.doc_id: r.avg_logprob for r in score_bigram_logprob(probe, uni, bi).collect()}
    assert s[100] > s[101]


def test_gopher_flags_each_rule(spark):
    """Each Gopher rule trips independently on a constructed offender."""
    from shovel_spark.operators.quality import gopher_flags

    good = "the quick brown fox and the lazy dog went to of that have with " + \
        " ".join(f"word{i:03d}" for i in range(40))
    rows = [
        (0, good),                                      # passes everything
        (1, "the of and " + " ".join(f"w{i}" for i in range(10))),  # too short
        (2, "the of " + " ".join("ab" for _ in range(60))),          # mwl < 3, repetitious
        (3, good + " " + " ".join("#" for _ in range(20))),          # symbol ratio
        (4, " ".join(f"word{i:03d}" for i in range(60))),            # no stopwords
        (5, "the of and that " + " ".join("same" for _ in range(56))),  # repetition
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in gopher_flags(df).collect()}
    assert got[0].gopher_pass
    assert not got[1].wc_ok and not got[1].gopher_pass
    assert not got[2].mwl_ok and not got[2].rep_ok
    assert not got[3].sym_ok
    assert not got[4].stop_ok
    assert not got[5].rep_ok and got[5].stop_ok


def test_phrase_mining_hand_computed(spark):
    """top_phrases matches a hand-computed word2phrase score and applies
    min_count before scoring."""
    from shovel_spark.operators.phrases import top_phrases

    rows = [
        (1, "new york new york new york new york new york"),
        (2, "a new day"),
        (3, "york a a"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r.word_a, r.word_b, r.pair_count, r.score)
        for r in top_phrases(df, top_k=5, min_count=2, delta=1.0).collect()
    ]
    # unigrams: new=6 york=6 a=3 day=1, N=16; bigrams >=2:
    # (new,york)=5 -> (5-1)*16/36; (york,new)=4 -> (4-1)*16/36
    assert got == [
        ("new", "york", 5, round(4 * 16 / 36, 6)),
        ("york", "new", 4, round(3 * 16 / 36, 6)),
    ]


def test_bm25_topk_hand_computed(spark):
    """bm25_topk matches a hand-computed Okapi BM25 (Lucene idf) on a
    3-doc corpus, counts matched terms, and orders (score desc, id)."""
    import math

    from shovel_spark.operators.search import bm25_topk, build_postings

    rows = [(1, "a b a"), (2, "b c"), (3, "c c c d"), (4, None), (5, "  ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    post = {(r.term, r.doc_id): (r.tf, r.dl) for r in build_postings(df).collect()}
    assert post[("a", 1)] == (2, 3) and post[("c", 3)] == (3, 4)
    assert len(post) == 6  # a,b @1; b,c @2; c,d @3 — no rows for 4/5

    got = [(r.doc_id, r.n_terms, r.score) for r in
           bm25_topk(df, ["a", "c"], top_k=10).collect()]

    # N=3 scorable docs, avgdl=3; df(a)=1, df(c)=2; k1=1.2, b=0.75
    idf_a, idf_c = math.log(1 + 2.5 / 1.5), math.log(1 + 1.5 / 2.5)

    def part(tf, dl):
        return tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0))

    exp = sorted(
        [
            (1, 1, round(idf_a * part(2, 3), 6)),
            (2, 1, round(idf_c * part(1, 2), 6)),
            (3, 1, round(idf_c * part(3, 4), 6)),
        ],
        key=lambda t: (-t[2], t[0]),
    )
    assert got == exp


def test_remove_boilerplate_classification_and_context(spark):
    """Hand-built doc: [chrome x10][good x10][chrome x10][chrome x10] with
    stopwords only in the good window. The good window survives, BOTH
    chrome windows adjacent to it are context-saved, the far chrome
    window dies; reassembly preserves order."""
    from shovel_spark.operators.quality import remove_boilerplate

    chrome = "home login menu nav search profile settings logout help about"
    good = "the data flows by key and value per row in"
    text = " ".join([chrome, good, chrome, chrome])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = remove_boilerplate(df).first()
    assert row.n_paras == 4
    assert row.n_kept == 3  # good + its two neighbors; window 4 dropped
    assert row.text == " ".join([chrome, good, chrome])


def test_remove_boilerplate_all_chrome_and_empty(spark):
    from shovel_spark.operators.quality import remove_boilerplate

    chrome = "home login menu nav search profile settings logout help about"
    df = spark.createDataFrame(
        [(1, chrome + " " + chrome), (2, "")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in remove_boilerplate(df).collect()}
    assert rows[1].n_kept == 0 and rows[1].text == ""
    # tokens("") is [""] in both engines (paragraph_dedup convention):
    # one empty paragraph, classified boilerplate and dropped
    assert rows[2].n_paras == 1 and rows[2].n_kept == 0 and rows[2].text == ""


def test_remove_boilerplate_short_paragraph_rules(spark):
    """A trailing short window (< min_words) is boilerplate on its own
    but context-saved when its neighbor is good."""
    from shovel_spark.operators.quality import remove_boilerplate

    good = "the data flows by key and value per row in"
    df = spark.createDataFrame(
        [(1, good + " tail"), (2, "home login menu nav search profile settings logout help about tail")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in remove_boilerplate(df).collect()}
    assert rows[1].n_kept == 2 and rows[1].text == good + " tail"
    assert rows[2].n_kept == 0


def test_corpus_datacard_invariants(spark):
    """Datacard sanity on the sf0.001 corpus: HLL estimate within the
    64-register error band of the exact distinct, rates in [0, 1],
    totals consistent."""
    from shovel_spark.demo_queries import SPARK_QUERIES

    rows = SPARK_QUERIES["docs_corpus_datacard"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert 0 <= r.dup_rate <= 1 and 0 <= r.pct_short <= 1
        assert r.distinct_texts <= r.n_docs <= r.total_tokens
        assert abs(r.est_distinct - r.distinct_texts) <= max(
            6.0, 0.35 * r.distinct_texts
        )
