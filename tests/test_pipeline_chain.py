"""Cross-pipeline routing (reference: src/outputs/pipeline.js:18-30 +
master relay): pipeline A's sink table is pipeline B's source — the DAG of
linear chains (SURVEY.md §1.2/§3.3), with intermediate tables as the edges
instead of IPC message relays."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from shovel_spark.operators.route import SinkRule
from shovel_spark.pipeline import JobConfig, run_resumable
from shovel_spark.synth import default_domain_rules, default_lang_map, synth_pages


def test_two_stage_pipeline_dag(spark, tmp_path):
    pages = synth_pages(spark, 1500, seed=41)
    lm, dr = default_lang_map(spark), default_domain_rules(spark)

    # pipeline A: the standard router
    cfg_a = JobConfig(name="stage_a", out_dir=str(tmp_path / "a"), n_buckets=4)
    run_resumable(spark, pages, lm, dr, cfg_a)

    # pipeline B consumes A's `english` sink (its rows are already parsed —
    # re-wrap the surviving text as pages, the cross-pipeline re-inject
    # analog of Processor.in, reference: src/core/processor.js:105-111)
    a_out = spark.read.parquet(os.path.join(cfg_a.out_dir, "sink_english"))
    reinjected = a_out.select(
        "url",
        "warc_ts",
        F.encode(F.concat(F.lit("<p>"), F.col("text"), F.lit("</p>")), "UTF-8").alias("html"),
        "text",
        F.col("lang_norm").alias("lang"),
    )
    cfg_b = JobConfig(
        name="stage_b",
        out_dir=str(tmp_path / "b"),
        n_buckets=4,
        sink_rules=[
            SinkRule("longform", F.length("text") >= 200),
            SinkRule("shortform", F.length("text") < 200),
        ],
    )
    run_resumable(spark, reinjected, lm, dr, cfg_b)

    n_a = a_out.count()
    longform = spark.read.parquet(os.path.join(cfg_b.out_dir, "sink_longform"))
    shortform = spark.read.parquet(os.path.join(cfg_b.out_dir, "sink_shortform"))
    assert longform.count() + shortform.count() == n_a  # nothing lost between stages
    assert longform.filter(F.length("text") < 200).count() == 0
    # stage B re-parsed the re-encoded html byte-identically
    assert longform.count() > 0 and shortform.count() > 0
    mism = longform.unionByName(shortform).join(
        a_out.select("url", F.col("text").alias("orig")), "url"
    ).filter(F.col("text") != F.col("orig"))
    assert mism.count() == 0
