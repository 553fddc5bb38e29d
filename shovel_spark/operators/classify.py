"""Distributed text classification — hashed bag-of-words + logistic
regression trained with broadcast weights and map-side gradients.

The model-based tier of quality/language filtering (fastText-shape:
hashed n-gram features, linear model), built WITHOUT MLlib so the
training loop has the same scale anatomy as the rest of the engine
(reference analog: shovel has no ML at all; this is part of the
training-data-pipeline tier, like operators/quality.py):

  - features: token -> ``pmod(hash(token), dim)`` bucket, per-doc counts
    normalized by doc length — a SPARSE (id, bucket, x) table, one row
    per distinct (doc, bucket); document text never enters the loop;
  - per iteration (full-batch gradient descent): broadcast the dim+1
    weights (a few KB), one groupBy(id) to score docs (p = sigmoid of
    the sparse dot), one groupBy(bucket) for the gradient — two
    key-shuffles over the sparse table, nothing else; only dim+1 rows
    cross to the driver per iteration;
  - determinism / engine parity (the kmeans_centroids recipe): gradients
    and weights are rounded to ``round_decimals`` between iterations, so
    double accumulation order and libm exp() ULP differences can't drift
    the trajectory across engines — a DuckDB oracle replays every
    iteration exactly.

At 100 TB: the sparse table is ~distinct-(doc, bucket) rows of 20 bytes;
the two per-iteration shuffles are the whole cost, embarrassingly
parallel; weights stay broadcast-sized for any dim a linear model wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from shovel_spark.session import local_rows_df

from shovel_spark.functions.textstats import tokens


def hashed_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    family: str = "xxhash64",
) -> DataFrame:
    """(id, bucket, x) sparse hashed-BoW features: token hash mod ``dim``,
    per-doc counts divided by the doc's token count (length-normalized).
    Empty/NULL texts are excluded (no tokens -> no features)."""
    if family == "md5":
        h = F.conv(F.substring(F.md5(F.col("__tok")), 1, 15), 16, 10).cast("long")
    elif family == "xxhash64":
        h = F.xxhash64(F.col("__tok"))
    else:
        raise ValueError(f"unknown hash family: {family!r}")
    base = (
        df.filter(
            F.col(id_col).isNotNull()
            & F.col(text_col).isNotNull()
            & (F.trim(F.col(text_col)) != "")
        )
        .select(F.col(id_col), tokens(F.col(text_col)).alias("__w"))
        .withColumn("__n", F.size("__w"))
    )
    ex = base.select(id_col, "__n", F.explode("__w").alias("__tok"))
    return (
        ex.withColumn("bucket", F.pmod(h, F.lit(dim)).cast("int"))
        .groupBy(id_col, "bucket", "__n")
        .agg(F.count("*").alias("__c"))
        .select(
            id_col, "bucket", (F.col("__c") / F.col("__n")).alias("x")
        )
    )


def logreg_fit(
    features: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    dim: int = 64,
    iters: int = 3,
    lr: float = 1.0,
    round_decimals: int = 6,
) -> list[float]:
    """Full-batch logistic-regression fit over sparse (id, bucket, x)
    features and (id, y) labels; returns ``dim + 1`` weights (bias last).

    Deterministic: weights start at 0, gradients are averaged over docs
    and rounded to ``round_decimals`` before each update — the same
    parity recipe as kmeans_centroids, so an external engine replays the
    trajectory bit-for-bit at the rounded precision. Docs with a label
    but no features (empty text) contribute through the bias only.
    """
    spark = features.sparkSession
    # the sparse table feeds TWO joins per iteration (scoring + gradient):
    # checkpoint once or the tokenize+hash+groupBy feature build re-executes
    # 2*iters times
    feats = (
        features.join(labels, id_col)
        .select(id_col, "bucket", "x", "y")
        .localCheckpoint(eager=False)
    )
    docs = labels.select(id_col, "y").localCheckpoint(eager=False)
    n_docs = docs.count()
    w = [0.0] * dim
    b = 0.0
    for _ in range(iters):
        wdf = local_rows_df(spark, list(enumerate(w)), "bucket int, w double")
        scored = (
            feats.join(F.broadcast(wdf), "bucket")
            .groupBy(id_col)
            .agg(F.sum(F.col("x") * F.col("w")).alias("__dot"))
        )
        p = (
            docs.join(scored, id_col, "left")
            .select(
                id_col,
                "y",
                (
                    F.lit(1.0)
                    / (F.lit(1.0) + F.exp(-(F.coalesce(F.col("__dot"), F.lit(0.0)) + b)))
                ).alias("p"),
            )
        )
        resid = p.select(id_col, (F.col("p") - F.col("y")).alias("r"))
        # weight grads and the bias grad in ONE job: the bias rides as a
        # synthetic bucket -1 row (sum of residuals over docs). The r6
        # shape ran a second full scoring pass just for sum(r); the
        # per-iteration rounding absorbs any summation-order noise either
        # way (that is what round_decimals exists for).
        grad_rows = (
            feats.join(resid, id_col)
            .select("bucket", (F.col("r") * F.col("x")).alias("__rx"))
            .unionByName(resid.select(F.lit(-1).alias("bucket"), F.col("r").alias("__rx")))
            .groupBy("bucket")
            .agg(F.sum("__rx").alias("g"))
            .collect()
        )
        g = [0.0] * dim
        gb = 0.0
        for row in grad_rows:
            if row["bucket"] == -1:
                gb = row["g"] or 0.0
            else:
                g[row["bucket"]] = row["g"]
        w = [round(wi - lr * gi / n_docs, round_decimals) for wi, gi in zip(w, g)]
        b = round(b - lr * gb / n_docs, round_decimals)
    return [*w, b]


def logreg_predict(
    features: DataFrame,
    weights: list[float],
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, p) scores for the given weights (bias last) — a broadcast join
    + one groupBy, the map-side scoring pass a filter pipeline runs."""
    spark = features.sparkSession
    dim = len(weights) - 1
    wdf = local_rows_df(spark, list(enumerate(weights[:dim])), "bucket int, w double")
    return (
        features.join(F.broadcast(wdf), "bucket")
        .groupBy(id_col)
        .agg(
            (
                F.lit(1.0)
                / (
                    F.lit(1.0)
                    + F.exp(-(F.sum(F.col("x") * F.col("w")) + F.lit(weights[-1])))
                )
            ).alias("p")
        )
    )
