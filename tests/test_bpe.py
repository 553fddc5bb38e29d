"""BPE vocabulary learning + segmentation (operators/bpe.py)."""

import pytest
from pyspark.sql import functions as F

from shovel_spark.operators.bpe import bpe_segment, bpe_train, word_counts

# Sennrich et al. 2016's worked corpus: low x5, lower x2, newest x6, widest x3
CORPUS = [
    (1, "low low low low low"),
    (2, "lower lower"),
    (3, "newest newest newest newest newest newest"),
    (4, "widest widest widest"),
    (5, None),
    (6, "   "),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_word_counts(spark, docs):
    got = {r.word: r.cnt for r in word_counts(docs).collect()}
    assert got == {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    # non-ASCII words are excluded from training by default
    extra = spark.createDataFrame([(9, "café low")], "doc_id long, text string")
    got2 = {r.word: r.cnt for r in word_counts(extra).collect()}
    assert got2 == {"low": 1}


def test_bpe_train_hand_computed(spark, docs):
    """First 4 merges match the hand-derived trajectory, including the
    3-way count tie at step 1 broken on left asc ((e,s) over (s,t) and
    (t,</w>)) and the (l,o)/(o,w) tie at step 4."""
    merges, final = bpe_train(spark, word_counts(docs), num_merges=4)
    got = [(r.step, r.left, r.right, r.pair_count) for r in merges.orderBy("step").collect()]
    assert got == [
        (1, "e", "s", 9),
        (2, "es", "t", 9),
        (3, "est", "</w>", 9),
        (4, "l", "o", 7),
    ]
    syms = {r.word: r.syms for r in final.collect()}
    assert syms["newest"] == ["n", "e", "w", "est</w>"]
    assert syms["widest"] == ["w", "i", "d", "est</w>"]
    assert syms["low"] == ["lo", "w", "</w>"]
    assert syms["lower"] == ["lo", "w", "e", "r", "</w>"]


def test_bpe_train_adjacent_greedy(spark):
    """Greedy left-to-right non-overlap: 'aaaa' with merge (a,a) becomes
    [aa, aa, </w>], and back-to-back merged pairs stay mergeable."""
    df = spark.createDataFrame([(1, "aaaa aaaa")], "doc_id long, text string")
    merges, final = bpe_train(spark, word_counts(df), num_merges=2)
    got = [(r.left, r.right) for r in merges.orderBy("step").collect()]
    assert got[0] == ("a", "a")
    syms = {r.word: r.syms for r in final.collect()}
    # step 1: [a,a,a,a,</w>] -> [aa,aa,</w>] (greedy non-overlap, and the
    # back-to-back pair merges). Step 2: (aa,aa) and (aa,</w>) tie at 2;
    # '</w>' < 'aa' byte-wise so (aa,</w>) is elected.
    assert got[1] == ("aa", "</w>")
    assert syms["aaaa"] == ["aa", "aa</w>"]


def test_bpe_segment(spark, docs):
    merges, _ = bpe_train(spark, word_counts(docs), num_merges=4)
    df = spark.createDataFrame(
        [(1, "newest low"), (2, "café low"), (3, None)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.bpe_tokens
        for r in bpe_segment(df, merges).filter(F.col("text").isNotNull()).collect()
    }
    assert got[1] == ["n", "e", "w", "est</w>", "lo", "w", "</w>"]
    # non-ASCII word rides through as one opaque symbol + </w>
    assert got[2] == ["café", "</w>", "lo", "w", "</w>"]


def test_bpe_train_early_stop(spark):
    """Fully merged vocab stops electing: a 1-char word exhausts after
    its only pair merges."""
    df = spark.createDataFrame([(1, "a a")], "doc_id long, text string")
    merges, final = bpe_train(spark, word_counts(df), num_merges=5)
    got = [(r.left, r.right) for r in merges.orderBy("step").collect()]
    assert got == [("a", "</w>")]
    assert [r.syms for r in final.collect()] == [["a</w>"]]
