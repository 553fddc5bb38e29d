"""Streaming pipeline: incremental consumption + equality with the batch run.

The stream checkpoint is the broker-ack analog: files consumed once are never
reprocessed across restarts (reference semantics: src/inputs/amqp.js:101-112
unacked replay / at-least-once)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from shovel_spark.pipeline import JobConfig, build_routed
from shovel_spark.streaming.pipeline import run_stream_once
from shovel_spark.synth import default_domain_rules, default_lang_map, synth_pages

N1, N2, SEED = 1200, 800, 23


def _sink_urls(spark, out_dir, sink):
    return {
        r["url"]
        for r in spark.read.parquet(os.path.join(out_dir, f"sink_{sink}")).select("url").collect()
    }


def test_stream_matches_batch_and_resumes(spark, tmp_path):
    in_dir = str(tmp_path / "pages_in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    lm, dr = default_lang_map(spark), default_domain_rules(spark)
    cfg = JobConfig(out_dir=out_dir, n_buckets=8)

    # chunk 1 arrives
    chunk1 = synth_pages(spark, N1, seed=SEED)
    chunk1.write.mode("append").parquet(in_dir)
    run_stream_once(spark, in_dir, lm, dr, cfg, ckpt)
    got1 = _sink_urls(spark, out_dir, "english")

    # chunk 2 arrives; resumed stream must process ONLY the new files
    chunk2 = synth_pages(spark, N2, seed=SEED + 1)
    chunk2.write.mode("append").parquet(in_dir)
    run_stream_once(spark, in_dir, lm, dr, cfg, ckpt)
    got = _sink_urls(spark, out_dir, "english")
    assert got1 <= got

    # equality with the one-shot batch chain over the same union
    batch = build_routed(chunk1.unionByName(chunk2), lm, dr, cfg)
    want = {r["url"] for r in batch.filter(F.col("sink") == "english").select("url").collect()}
    assert got == want

    # no double-routing: consumed files were not re-read on resume
    df = spark.read.parquet(os.path.join(out_dir, "sink_english"))
    assert df.count() == df.select("url").distinct().count()


def test_windowed_metrics_stream_schema(spark, tmp_path):
    from shovel_spark.streaming.pipeline import read_pages_stream, windowed_metrics_stream

    in_dir = str(tmp_path / "pages_in2")
    synth_pages(spark, 500, seed=5).write.mode("append").parquet(in_dir)
    m = windowed_metrics_stream(read_pages_stream(spark, in_dir))
    assert m.isStreaming
    assert set(m.columns) == {"window_start", "window_end", "lang", "n"}


def test_stream_dedupe_by_uuid(spark, tmp_path):
    """Effectively-once from at-least-once delivery: streaming
    dropDuplicates keyed on the deterministic uuid — the queue-stored
    dedupe-header analog (reference: src/queues/batch.js:149-155) with
    state across micro-batches."""
    in_dir = str(tmp_path / "dup_in")
    ckpt = str(tmp_path / "dup_ck")

    base = synth_pages(spark, 300, seed=77)
    base.write.mode("append").parquet(in_dir)

    out_dir = str(tmp_path / "dup_out")

    def run():
        # file sink (memory sink can't recover from a checkpoint)
        stream = spark.readStream.schema(base.schema).parquet(in_dir)
        deduped = stream.withColumn("uuid", F.sha2("url", 256)).dropDuplicates(["uuid"])
        q = (
            deduped.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        df = spark.read.parquet(out_dir)
        return df.count(), df.select("uuid").distinct().count()

    n1, u1 = run()
    assert n1 == 300 == u1

    # redelivery: the SAME rows arrive again in a new file (at-least-once)
    base.write.mode("append").parquet(in_dir)
    n2, u2 = run()
    assert (n2, u2) == (300, 300)  # redelivered rows suppressed by dedupe state


def test_stream_dedups_by_canonical_url(spark, tmp_path):
    """Streaming crawl-intake dedup: noisy re-fetches of the same page in
    LATER micro-batches collapse onto the canonical key — canonical_url is
    plain codegen, so it drops into a stream unchanged, and
    dropDuplicates(canonical) persists membership across batches via the
    stream checkpoint (the queue-dedupe analog over canonical identity)."""
    from shovel_spark.functions.urls import canonical_url

    in_dir = str(tmp_path / "urls_in")
    out_dir = str(tmp_path / "urls_out")
    ckpt = str(tmp_path / "urls_ckpt")

    def arrivals(rows):
        spark.createDataFrame(rows, "u string, payload long").write.mode("append").parquet(in_dir)
        (
            spark.readStream.schema("u string, payload long")
            .parquet(in_dir)
            .withColumn("curl", canonical_url(F.col("u")))
            .filter(F.col("curl").isNotNull())
            .dropDuplicates(["curl"])
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        return {(r["curl"], r["payload"]) for r in spark.read.parquet(out_dir).collect()}

    got1 = arrivals([("https://a.com/p/1/?b=2&a=1&utm_source=x", 1), ("not a url", 9)])
    assert got1 == {("https://a.com/p/1?a=1&b=2", 1)}
    # a noisy re-fetch of page 1 in a later batch is a duplicate; page 2 is new
    got2 = arrivals([("HTTPS://A.com:443/p/1?a=1&b=2#f", 10), ("https://a.com/p/2", 2)])
    assert got2 == {("https://a.com/p/1?a=1&b=2", 1), ("https://a.com/p/2", 2)}


def test_stream_neardup_ingest_across_batches(spark, tmp_path):
    """Streaming near-dup-filtered ingest (run_neardup_ingest_once): a
    micro-batch's docs are deduped against every PREVIOUS batch via the
    standing MinHash index (first-wins) and against themselves
    (lowest-id-wins); survivors extend the index so later batches see them."""
    from shovel_spark.streaming.pipeline import run_neardup_ingest_once

    inp = str(tmp_path / "in")
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    base = "the quick brown fox jumps over the lazy dog again and again until done"
    other = "completely different content about spark query engines and shuffles here"

    # batch 1: an original, its within-batch near-dup, and an unrelated doc
    spark.createDataFrame(
        [(10, base), (11, base.replace("lazy", "sleepy")), (12, other)],
        "doc_id long, text string",
    ).write.mode("append").parquet(inp)
    run_neardup_ingest_once(spark, inp, idx, out, ckpt, threshold=0.3)
    ingested = {r.doc_id for r in spark.read.parquet(os.path.join(out, "docs")).collect()}
    assert ingested == {10, 12}  # 11 dropped within-batch

    # batch 2: a LOWER-id near-dup of the already-ingested doc 10 (first-wins
    # must drop it despite the lower id), plus a genuinely new doc
    spark.createDataFrame(
        [(1, base + " extra"), (20, "entirely novel words appear in this row")],
        "doc_id long, text string",
    ).write.mode("append").parquet(inp)
    run_neardup_ingest_once(spark, inp, idx, out, ckpt, threshold=0.3)
    ingested = {r.doc_id for r in spark.read.parquet(os.path.join(out, "docs")).collect()}
    assert ingested == {10, 12, 20}  # doc 1 dropped vs the standing index

    # batch 3: near-dup of batch-2's survivor — the index kept growing
    spark.createDataFrame(
        [(30, "entirely novel words appear in this row too")],
        "doc_id long, text string",
    ).write.mode("append").parquet(inp)
    run_neardup_ingest_once(spark, inp, idx, out, ckpt, threshold=0.3)
    ingested = {r.doc_id for r in spark.read.parquet(os.path.join(out, "docs")).collect()}
    assert ingested == {10, 12, 20}


def test_neardup_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-processing the SAME batch id (crash
    between writes and checkpoint commit) must reproduce identical survivors
    and index contents — batch-keyed dynamic overwrite, not append."""
    from shovel_spark.streaming.pipeline import _process_neardup_batch

    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    base = "the quick brown fox jumps over the lazy dog again and again until done"
    mh_kw = dict(text_col="text", id_col="doc_id", k=3, num_hashes=16, bands=8,
                 family="xxhash64")
    b0 = spark.createDataFrame(
        [(10, base), (11, base.replace("lazy", "sleepy"))], "doc_id long, text string"
    )
    _process_neardup_batch(spark, b0, 0, idx, out, 0.3, "doc_id", mh_kw)

    def state():
        docs = sorted(r.doc_id for r in spark.read.parquet(os.path.join(out, "docs")).collect())
        nb = spark.read.parquet(os.path.join(idx, "buckets")).count()
        nk = spark.read.parquet(os.path.join(idx, "shingles")).count()
        return docs, nb, nk

    first = state()
    # replay batch 0 (index now contains batch 0's survivors: self-pairs
    # must be ignored, writes must replace, not duplicate)
    _process_neardup_batch(spark, b0, 0, idx, out, 0.3, "doc_id", mh_kw)
    assert state() == first
    assert first[0] == [10]  # near-dup 11 dropped, survivor 10 kept once


def test_neardup_batches_survive_default_static_overwrite(spark, tmp_path):
    """Regression (round-4 driver FAIL, stream_neardup_two_batches): the
    batch-keyed writers must pin partitionOverwriteMode=dynamic PER-WRITE.
    Under a session that does NOT set the session-level conf (Spark's
    default is *static* overwrite, e.g. the external correctness driver's
    vanilla SparkSession), batch 1's mode('overwrite').partitionBy('__batch')
    write used to delete batch 0's partitions — of the survivors table AND
    the standing MinHash index. Simulate the vanilla session by unsetting
    the conf (reverts to the 'static' default) for the duration."""
    from shovel_spark.streaming.pipeline import _process_neardup_batch

    conf_key = "spark.sql.sources.partitionOverwriteMode"
    saved = spark.conf.get(conf_key, None)
    spark.conf.unset(conf_key)
    try:
        assert spark.conf.get(conf_key).lower() == "static"  # vanilla default
        idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
        mh_kw = dict(text_col="text", id_col="doc_id", k=3, num_hashes=16,
                     bands=8, family="xxhash64")
        b0 = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
            "doc_id long, text string",
        )
        b1 = spark.createDataFrame(
            [(2, "one two three four five six seven eight nine ten eleven")],
            "doc_id long, text string",
        )
        _process_neardup_batch(spark, b0, 0, idx, out, 0.3, "doc_id", mh_kw)
        _process_neardup_batch(spark, b1, 1, idx, out, 0.3, "doc_id", mh_kw)

        docs = spark.read.parquet(os.path.join(out, "docs"))
        assert sorted(r.doc_id for r in docs.select("doc_id").collect()) == [1, 2]
        assert sorted(
            r["__batch"] for r in docs.select("__batch").distinct().collect()
        ) == [0, 1]
        # the standing index keeps BOTH batches' segments
        buckets = spark.read.parquet(os.path.join(idx, "buckets"))
        assert sorted(
            r["__batch"] for r in buckets.select("__batch").distinct().collect()
        ) == [0, 1]
        shingles = spark.read.parquet(os.path.join(idx, "shingles"))
        assert sorted(
            r["__batch"] for r in shingles.select("__batch").distinct().collect()
        ) == [0, 1]
    finally:
        if saved is not None:
            spark.conf.set(conf_key, saved)


def test_neardup_ingest_with_doc_freq_cap(spark, tmp_path):
    """max_doc_freq threads through the streaming ingest: batch-wide
    boilerplate (hot shingles) can't make every doc in the batch a
    near-dup of every other — with the cap, distinct docs all survive."""
    from shovel_spark.streaming.pipeline import run_neardup_ingest_once

    boiler = "all rights reserved terms of service privacy policy contact us"
    inp, idx, out, ckpt = (str(tmp_path / d) for d in ("in", "idx", "out", "ck"))
    rows = [(i, f"{boiler} unique{i} body{i} words{i} here{i} now{i}") for i in range(8)]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode("append").parquet(inp)
    run_neardup_ingest_once(
        spark, inp, idx, out, ckpt, threshold=0.3, max_doc_freq=4
    )
    docs = spark.read.parquet(os.path.join(out, "docs"))
    assert docs.count() == 8  # capped: boilerplate can't collapse the batch

    # control: uncapped, the shared boilerplate dominates the shingle sets
    # and collapses the batch to one survivor
    idx2, out2, ckpt2 = (str(tmp_path / d) for d in ("idx2", "out2", "ck2"))
    run_neardup_ingest_once(spark, inp, idx2, out2, ckpt2, threshold=0.3)
    assert spark.read.parquet(os.path.join(out2, "docs")).count() < 8


def test_sketch_ingest_stream_checkpoint_and_merge(spark, tmp_path):
    """Streaming HLL ingest through the REAL readStream path: chunk 1 is
    consumed, chunk 2 (overlapping keys) only on the resumed run; the
    merged cardinality tracks the true distinct count within HLL error,
    and equals a single batch build over the union (lossless union)."""
    from shovel_spark.operators.sketches import hll_build, hll_cardinality
    from shovel_spark.streaming.pipeline import (
        read_stream_cardinality,
        run_sketch_ingest_once,
    )

    in_dir = str(tmp_path / "ev_in")
    out_dir = str(tmp_path / "sk_out")
    ckpt = str(tmp_path / "sk_ckpt")
    mk = lambda lo, hi: spark.range(lo, hi).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 500).alias("user_id"),
        F.lit(1.0).alias("value"),
    )
    mk(0, 2000).write.mode("append").parquet(in_dir)
    run_sketch_ingest_once(spark, in_dir, out_dir, ckpt, "user_id", b=6)
    est1 = read_stream_cardinality(spark, out_dir, b=6).first()["est"]
    assert abs(est1 - 500) / 500 < 0.4

    mk(2000, 3000).write.mode("append").parquet(in_dir)  # users 0..499 again
    run_sketch_ingest_once(spark, in_dir, out_dir, ckpt, "user_id", b=6)
    est2 = read_stream_cardinality(spark, out_dir, b=6).first()["est"]
    # overlap must not inflate: max-merge, not sum
    assert est2 == est1

    whole = {
        r.bucket: r.reg
        for r in hll_build(mk(0, 3000), "user_id", b=6).collect()
    }
    regs = spark.read.parquet(os.path.join(out_dir, "registers"))
    merged = {
        r.bucket: r.reg
        for r in regs.groupBy("bucket").agg(F.max("reg").alias("reg")).collect()
    }
    assert merged == whole


def test_sketch_batch_replay_replaces_partition(spark, tmp_path):
    """A replayed foreachBatch call (at-least-once crash window) must
    REPLACE its __batch partition under a vanilla static-overwrite
    session, not duplicate rows or wipe other batches."""
    from shovel_spark.streaming.pipeline import _process_sketch_batch

    out = str(tmp_path / "sk")
    df0 = spark.range(100).select((F.col("id") % 40).alias("user_id"))
    df1 = spark.range(100, 200).select((F.col("id") % 70).alias("user_id"))
    conf_key = "spark.sql.sources.partitionOverwriteMode"
    had = spark.conf.get(conf_key, None)
    try:
        spark.conf.unset(conf_key)  # Spark default: STATIC
        _process_sketch_batch(df0, 0, out, "user_id", b=6)
        _process_sketch_batch(df1, 1, out, "user_id", b=6)
        before = sorted(
            (r["__batch"], r.bucket, r.reg)
            for r in spark.read.parquet(os.path.join(out, "registers")).collect()
        )
        _process_sketch_batch(df1, 1, out, "user_id", b=6)  # replay
        after = sorted(
            (r["__batch"], r.bucket, r.reg)
            for r in spark.read.parquet(os.path.join(out, "registers")).collect()
        )
        assert after == before
        assert {b for b, _, _ in after} == {0, 1}
    finally:
        if had is not None:
            spark.conf.set(conf_key, had)
