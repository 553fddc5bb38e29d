"""Text-analysis functions vs plain-Python expectations."""

from __future__ import annotations

from pyspark.sql import functions as F

from shovel_spark.functions import textstats as ts


def _vals(spark, rows, fn, typ="string"):
    df = spark.createDataFrame([(r,) for r in rows], f"v {typ}")
    return [r["o"] for r in df.select(fn(F.col("v")).alias("o")).collect()]


def test_token_count(spark):
    got = _vals(spark, ["a b c", "  x   y  ", "single"], ts.token_count)
    assert got == [3, 2, 1]


def test_lang_id_stopword_profiles(spark):
    rows = [
        "the cat and the dog sat in that house and it is warm",
        "le chat et la maison est une belle chose que les gens",
        "der hund und die katze ist nicht ein problem zu haben",
        "el perro y la casa es una cosa que los gatos quieren por eso",
        "xxxx yyyy zzzz qqqq wwww",
    ]
    got = _vals(spark, rows, ts.lang_id)
    assert got == ["en", "fr", "de", "es", "und"]


def test_quality_score_bands(spark):
    good = "this is a reasonably long sentence with normal english words in it"
    short = "too short"
    garbage = "!!! ### $$$ %%% ^^^ &&& *** ((( ))) ___ +++ === ~~~ ``` ||| @@@"
    got = _vals(spark, [good, short, garbage], ts.quality_score)
    assert got[0] > 0.9
    assert got[1] < got[0]
    assert got[2] < 0.5


def test_fingerprint_whitespace_invariant(spark):
    got = _vals(spark, ["a  b   c", "a b c", " a b c "], ts.fingerprint)
    assert got[0] == got[1] == got[2]


def test_rolling_fingerprint_stability(spark):
    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16"
    tail_edit = base.replace("w16", "EDITED")
    head_edit = base.replace("w1", "EDITED")
    f_base, f_tail, f_head = _vals(spark, [base, tail_edit, head_edit], ts.rolling_fingerprint)
    # winnowing property: at least one of the single-word edits preserves the
    # minimum window hash (both changing would require the min window to
    # overlap both ends)
    assert f_base == f_tail or f_base == f_head


def test_word_token_count_counts_punct(spark):
    got = _vals(spark, ["hello, world!", "no punct here"], ts.word_token_count)
    assert got[0] == 4  # hello world , !
    assert got[1] == 3
