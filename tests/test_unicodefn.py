"""Unicode normalization functions (functions/unicodefn.py)."""

import pytest
from pyspark.sql import functions as F

from shovel_spark.functions.unicodefn import nfc, nfkc, normalize_udf, strip_controls


def test_nfc_composes_and_passes_nulls(spark):
    rows = [
        (1, "café"),  # decomposed -> café
        (2, "café"),  # already composed, unchanged
        (3, None),
        (4, "plain ascii"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {r.id: r.n for r in df.select("id", nfc("t").alias("n")).collect()}
    assert got[1] == "café" == got[2]
    assert got[3] is None
    assert got[4] == "plain ascii"


def test_nfkc_folds_compatibility(spark):
    df = spark.createDataFrame([(1, "ﬁle １")], "id long, t string")
    assert df.select(nfkc("t").alias("n")).first().n == "file 1"


def test_normalize_udf_rejects_bad_form():
    with pytest.raises(ValueError):
        normalize_udf("NFX")


def test_strip_controls_keeps_tab_newline(spark):
    df = spark.createDataFrame([(1, "a\x00b\x07c\td\ne\x7ff")], "id long, t string")
    assert df.select(strip_controls("t").alias("s")).first().s == "abc\td\nef"


def test_nfc_is_map_only(spark):
    """The normalization must plan as a projection — no shuffle."""
    df = spark.range(10).select(F.concat(F.lit("x"), F.col("id")).alias("t"))
    plan = (
        df.select(nfc("t"))._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan
