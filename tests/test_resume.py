"""Kill/resume: no reprocessing, no double-routing (SURVEY.md §5 item 3).

Simulates a crash by running only K of B buckets (max_buckets), then
resuming; the final sink tables and ledger must equal a single-shot run.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from shovel_spark.pipeline import JobConfig, metrics_from_ledger, run_resumable
from shovel_spark.synth import default_domain_rules, default_lang_map, synth_pages

N = 2500
SEED = 13
B = 8


def _inputs(spark):
    return synth_pages(spark, N, seed=SEED), default_lang_map(spark), default_domain_rules(spark)


def _sink_urls(spark, out_dir, sink):
    path = os.path.join(out_dir, f"sink_{sink}")
    return {r["url"] for r in spark.read.parquet(path).select("url").collect()}


def test_resume_equals_single_run(spark, tmp_path):
    pages, lm, dr = _inputs(spark)

    golden_cfg = JobConfig(out_dir=str(tmp_path / "golden"), n_buckets=B)
    run_resumable(spark, pages, lm, dr, golden_cfg)

    cfg = JobConfig(out_dir=str(tmp_path / "resumed"), n_buckets=B)
    r1 = run_resumable(spark, pages, lm, dr, cfg, max_buckets=3)  # "crash" after 3
    assert len(r1["processed_buckets"]) == 3
    r2 = run_resumable(spark, pages, lm, dr, cfg)  # resume
    assert r2["skipped_buckets"] == r1["processed_buckets"]  # no reprocessing
    assert set(r1["processed_buckets"]).isdisjoint(r2["processed_buckets"])
    assert sorted(r1["processed_buckets"] + r2["processed_buckets"]) == list(range(B))

    for sink in cfg.sinks:
        g = _sink_urls(spark, golden_cfg.out_dir, sink)
        got = _sink_urls(spark, cfg.out_dir, sink)
        assert got == g, f"sink {sink} diverged after resume"

    led = spark.read.parquet(os.path.join(cfg.out_dir, "ledger"))
    per_bucket = led.filter(F.col("status") == "done").groupBy("bucket").count().collect()
    assert all(r["count"] == 1 for r in per_bucket)  # each bucket done exactly once
    assert len(per_bucket) == B

    m = metrics_from_ledger(spark, cfg.out_dir).first()
    gm = metrics_from_ledger(spark, golden_cfg.out_dir).first()
    assert m["in_rows"] == gm["in_rows"] == N
    assert (m["acked"], m["ignored"], m["rejected"]) == (gm["acked"], gm["ignored"], gm["rejected"])
    # broker-redelivery analog: the B-3 buckets killed before their ack were
    # re-attempted by the resume -> one nack each; a clean run nacks nothing
    assert m["nacked"] == B - 3
    assert gm["nacked"] == 0


def test_rerun_of_unacked_bucket_overwrites_not_appends(spark, tmp_path):
    """Crash between sink write and ledger append: the re-run must replace the
    bucket's output (dynamic partition overwrite), not double it."""
    pages, lm, dr = _inputs(spark)
    cfg = JobConfig(out_dir=str(tmp_path / "o"), n_buckets=B)

    # First pass writes bucket 0-2 outputs; wipe the ledger to simulate dying
    # before the ack (ledger append) happened.
    run_resumable(spark, pages, lm, dr, cfg, max_buckets=3)
    import shutil

    shutil.rmtree(os.path.join(cfg.out_dir, "ledger"))

    run_resumable(spark, pages, lm, dr, cfg)  # reruns everything

    golden_cfg = JobConfig(out_dir=str(tmp_path / "g"), n_buckets=B)
    run_resumable(spark, pages, lm, dr, golden_cfg)
    for sink in cfg.sinks:
        assert _sink_urls(spark, cfg.out_dir, sink) == _sink_urls(spark, golden_cfg.out_dir, sink)
    # row *multiset* check: no duplicated urls from double-routing
    df = spark.read.parquet(os.path.join(cfg.out_dir, "sink_english"))
    assert df.count() == df.select("url").distinct().count()


def test_dimension_counts_written_and_salted_equal(spark, tmp_path):
    """north_star-mandated per-domain/per-lang salted counts as pipeline
    outputs; must equal naive groupBy."""
    import os

    from shovel_spark.pipeline import JobConfig, build_routed, run_once

    pages, lm, dr = _inputs(spark)
    cfg = JobConfig(out_dir=str(tmp_path / "dims"), n_buckets=B)
    run_once(spark, pages, lm, dr, cfg)
    routed = build_routed(pages, lm, dr, cfg)
    for dim in ("domain", "lang_norm"):
        table = "per_domain_counts" if dim == "domain" else "per_lang_counts"
        got = {
            r[dim]: r["n"]
            for r in spark.read.parquet(os.path.join(cfg.out_dir, table)).collect()
        }
        want = {r[dim]: r["count"] for r in routed.groupBy(dim).count().collect()}
        assert got == want


def test_per_sink_metrics_survive_resume(spark, tmp_path):
    """metrics_by_bucket is dynamic-partition-overwritten like the sinks:
    after crash+resume, per-sink totals equal a single-shot run's."""
    from shovel_spark.pipeline import JobConfig, run_resumable, sink_metrics_from_buckets

    pages, lm, dr = _inputs(spark)
    golden_cfg = JobConfig(out_dir=str(tmp_path / "g2"), n_buckets=B)
    run_resumable(spark, pages, lm, dr, golden_cfg)
    cfg = JobConfig(out_dir=str(tmp_path / "r2"), n_buckets=B)
    run_resumable(spark, pages, lm, dr, cfg, max_buckets=4)
    run_resumable(spark, pages, lm, dr, cfg)

    def rows(out_dir):
        return {
            (r["sink"], r["in_rows"], r["acked"], r["ignored"], r["rejected"])
            for r in sink_metrics_from_buckets(spark, out_dir).collect()
        }

    got, want = rows(cfg.out_dir), rows(golden_cfg.out_dir)
    assert got == want
    assert len(got) >= 3


def test_bucketed_resume_prunes_at_scan(spark, tmp_path):
    """Scan-level resume: over a bucket-partitioned ingest, done buckets are
    eliminated by parquet partition pruning (PartitionFilters), not a
    post-read filter — zero I/O for completed work."""
    from shovel_spark.pipeline import (
        JobConfig,
        build_routed,
        ingest_bucketed,
        read_bucketed,
        run_resumable,
        run_resumable_bucketed,
    )

    pages, lm, dr = _inputs(spark)
    ingest = str(tmp_path / "ingest")
    ingest_bucketed(pages, ingest, n_buckets=B)

    cfg = JobConfig(out_dir=str(tmp_path / "out"), n_buckets=B)
    r1 = run_resumable_bucketed(spark, ingest, lm, dr, cfg, max_buckets=3)
    assert len(r1["processed_buckets"]) == 3
    r2 = run_resumable_bucketed(spark, ingest, lm, dr, cfg)
    assert r2["skipped_buckets"] == r1["processed_buckets"]

    # equality with the plain (unbucketed) path
    golden = JobConfig(out_dir=str(tmp_path / "golden"), n_buckets=B)
    run_resumable(spark, pages, lm, dr, golden)
    for sink in cfg.sinks:
        assert _sink_urls(spark, cfg.out_dir, sink) == _sink_urls(spark, golden.out_dir, sink)

    # plan proof: the resume filter appears as a partition filter on the scan
    done = set(r1["processed_buckets"])
    pruned = read_bucketed(spark, ingest).filter(~F.col("bucket").isin(sorted(done)))
    plan = pruned._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan
    scan = plan[plan.index("Scan parquet"):]
    pf_line = [l for l in scan.splitlines() if "PartitionFilters" in l][0]
    assert "bucket" in pf_line and "PartitionFilters: []" not in pf_line


def test_throttle_pacing_progresses_past_empty_buckets(spark, tmp_path):
    """throttle=True paces K buckets per invocation without phantom nacks,
    and empty buckets are acked with zero counts — a zero-row bucket must
    not be re-selected forever (livelock)."""
    pages, lm, dr = _inputs(spark)
    few = pages.limit(40)  # 16 buckets, ~some guaranteed empty
    cfg = JobConfig(out_dir=str(tmp_path / "t"), n_buckets=16)
    seen = set()
    for i in range(4):
        r = run_resumable(spark, few, lm, dr, cfg, max_buckets=4, throttle=True)
        got = set(r["processed_buckets"])
        assert got, f"invocation {i} made no progress"
        assert got.isdisjoint(seen)
        seen |= got
    assert seen == set(range(16))  # all buckets done in exactly 16/4 rounds
    m = metrics_from_ledger(spark, cfg.out_dir).first()
    assert m["nacked"] == 0 and m["in_rows"] == 40


def test_run_history_reports_each_invocation(spark, tmp_path):
    """run_history: one row per run_id; the kill run shows attempted > 
    completed, the resume completes the rest, totals reconcile."""
    from shovel_spark.pipeline import run_history

    pages, lm, dr = _inputs(spark)
    cfg = JobConfig(out_dir=str(tmp_path / "h"), n_buckets=B)
    r1 = run_resumable(spark, pages, lm, dr, cfg, max_buckets=3)
    r2 = run_resumable(spark, pages, lm, dr, cfg)
    hist = {r["run_id"]: r for r in run_history(spark, cfg.out_dir).collect()}
    h1, h2 = hist[r1["run_id"]], hist[r2["run_id"]]
    assert h1["attempted"] == B and h1["completed"] == 3  # crash semantics
    assert h2["attempted"] == B - 3 and h2["completed"] == B - 3
    assert h1["in_rows"] + h2["in_rows"] == N


def test_progress_monitor_records_stage_samples(spark, tmp_path):
    """Mid-run observability (reference: src/core/master.js:104-129 live
    metrics endpoint): run_resumable samples scheduler progress while the
    job runs and persists it to {out_dir}/progress. Crash + resume appends
    (one 'run' summary row per invocation); samples reference real stages."""
    from shovel_spark.observability import read_progress
    from shovel_spark.pipeline import JobConfig, run_resumable
    from shovel_spark.synth import default_domain_rules, default_lang_map, synth_pages

    out = str(tmp_path / "obs_out")
    pages = synth_pages(spark, 30_000, seed=11)
    lm, dr = default_lang_map(spark), default_domain_rules(spark)
    cfg = JobConfig(out_dir=out, n_buckets=8)
    run_resumable(spark, pages, lm, dr, cfg, max_buckets=3)   # crash
    run_resumable(spark, pages, lm, dr, cfg)                  # resume
    prog = read_progress(spark, out)
    rows = prog.collect()
    summaries = [r for r in rows if r.stage_id == -1]
    assert len(summaries) == 2  # one per invocation
    assert all(r.name == "run" and r.complete_tasks >= 0 for r in summaries)
    samples = [r for r in rows if r.stage_id >= 0]
    # 30k rows through parse+route+write is slow enough to catch stages
    assert samples, "no stage samples recorded"
    assert all(0 <= r.complete_tasks <= r.num_tasks for r in samples)
    assert all(r.ts_ms > 0 and r.name for r in samples)

    # monitor=False writes nothing new
    import shutil
    shutil.rmtree(out)
    run_resumable(spark, pages, lm, dr, cfg, monitor=False)
    import os as _os
    assert not _os.path.exists(_os.path.join(out, "progress"))


def test_resume_survives_default_static_overwrite_session(spark, tmp_path):
    """The write_sinks/metrics_by_bucket dynamic-overwrite pins must hold
    WITHOUT the session-level conf (Spark's default is static, under which
    a resume's partitioned overwrite used to delete every already-done
    bucket's output). Simulate the vanilla session by unsetting the conf."""
    from shovel_spark.pipeline import JobConfig, metrics_from_ledger, run_resumable
    from shovel_spark.synth import default_domain_rules, default_lang_map, synth_pages

    conf_key = "spark.sql.sources.partitionOverwriteMode"
    saved = spark.conf.get(conf_key, None)
    spark.conf.unset(conf_key)
    try:
        assert spark.conf.get(conf_key).lower() == "static"
        out = str(tmp_path / "vanilla_out")
        pages = synth_pages(spark, 12_000, seed=31)
        lm, dr = default_lang_map(spark), default_domain_rules(spark)
        cfg = JobConfig(out_dir=out, n_buckets=8)
        run_resumable(spark, pages, lm, dr, cfg, max_buckets=3)   # crash
        run_resumable(spark, pages, lm, dr, cfg)                  # resume
        m = metrics_from_ledger(spark, out).first()
        assert m.in_rows == 12_000
        assert m.acked + m.ignored + m.rejected == m.in_rows
        # resumed sinks keep the crash-era buckets: no dup urls, full rows
        import os as _os

        from pyspark.sql import functions as F

        total = 0
        for d in _os.listdir(out):
            if d.startswith("sink_"):
                sdf = spark.read.parquet(_os.path.join(out, d))
                assert sdf.count() == sdf.select("url").distinct().count(), d
                total += sdf.count()
        # ignored rows are dropped by routing, never written to a sink
        assert total == 12_000 - m.ignored
        # per-bucket metrics kept all 8 buckets, not just the resumed ones
        mb = spark.read.parquet(_os.path.join(out, "metrics_by_bucket"))
        assert mb.select("bucket").distinct().count() == 8
        assert mb.agg(F.sum("n")).first()[0] == 12_000
    finally:
        if saved is not None:
            spark.conf.set(conf_key, saved)


def test_replay_dead_letters_redelivers_fixed_config(spark, tmp_path):
    """Dead-letter replay (shovel's nack -> requeue redelivery, batch
    form): after relaxing the domain deny-list, previously rule-denied
    docs recover into their sinks; parse failures stay dead. A second
    replay under the same config is a no-op."""
    from pyspark.sql import functions as F

    from shovel_spark.pipeline import (
        JobConfig,
        replay_dead_letters,
        run_resumable,
    )
    from shovel_spark.synth import default_domain_rules, default_lang_map, synth_pages

    out = str(tmp_path / "replay_out")
    pages = synth_pages(spark, 15_000, seed=41)
    lm, dr = default_lang_map(spark), default_domain_rules(spark)
    cfg = JobConfig(out_dir=out, n_buckets=8)
    run_resumable(spark, pages, lm, dr, cfg)

    dl0 = spark.read.parquet(f"{out}/sink_dead_letter")
    n_dead0 = dl0.count()
    n_rule_denied = dl0.filter(F.col("error").startswith("domain_rule:deny")).count()
    assert n_dead0 > 0 and 0 < n_rule_denied < n_dead0
    sink_counts0 = {}
    import os as _os
    for d in _os.listdir(out):
        if d.startswith("sink_") and d != "sink_dead_letter":
            sink_counts0[d] = spark.read.parquet(_os.path.join(out, d)).count()

    # "fix" the config: allow everything previously denied
    allow_all = dr.withColumn("action", F.lit("allow"))
    res = replay_dead_letters(spark, pages, lm, allow_all, cfg)
    assert res["retried"] == n_dead0
    assert res["recovered"] == n_rule_denied
    assert res["still_dead"] == n_dead0 - n_rule_denied
    # some recovered rows route to IGNORED (processed fine, no sink)
    assert sum(res["per_sink"].values()) + res["ignored"] == n_rule_denied

    dl1 = spark.read.parquet(f"{out}/sink_dead_letter")
    assert dl1.count() == n_dead0 - n_rule_denied
    assert dl1.filter(F.col("error").startswith("domain_rule:deny")).count() == 0
    gained = 0
    for d, before in sink_counts0.items():
        sdf = spark.read.parquet(_os.path.join(out, d))
        assert sdf.count() == sdf.select("uuid").distinct().count(), d  # no dups
        gained += sdf.count() - before
    assert gained == sum(res["per_sink"].values())

    # idempotent-by-outcome: same config again recovers nothing
    res2 = replay_dead_letters(spark, pages, lm, allow_all, cfg)
    assert res2["recovered"] == 0 and res2["retried"] == res["still_dead"]
    assert spark.read.parquet(f"{out}/sink_dead_letter").count() == res["still_dead"]


def test_replay_preserves_unmatched_and_dedupes_recrawled_urls(spark, tmp_path):
    """Round-5 review hardening: (a) dead letters whose url is absent
    from the supplied pages snapshot are NOT lost — they stay dead and
    are reported as unmatched; (b) a url that appears twice in pages
    (re-crawl) retries its latest snapshot ONCE — previously-delivered
    rows are not re-appended; (c) metrics_by_bucket is updated to match
    the post-replay sink contents."""
    from pyspark.sql import functions as F

    from shovel_spark.pipeline import (
        JobConfig,
        read_dead_letters,
        replay_dead_letters,
        run_resumable,
        sink_metrics_from_buckets,
    )
    from shovel_spark.synth import default_domain_rules, default_lang_map, synth_pages

    out = str(tmp_path / "replay2_out")
    pages = synth_pages(spark, 8_000, seed=57)
    lm, dr = default_lang_map(spark), default_domain_rules(spark)
    cfg = JobConfig(out_dir=out, n_buckets=8)
    run_resumable(spark, pages, lm, dr, cfg)
    n_dead0 = read_dead_letters(spark, out).count()
    dead_urls = [r.url for r in read_dead_letters(spark, out).select("url").collect()]
    import os as _os0
    before_sink_rows = sum(
        spark.read.parquet(_os0.path.join(out, d)).count()
        for d in _os0.listdir(out)
        if d.startswith("sink_") and d != "sink_dead_letter"
    )

    # partial snapshot: drop half the dead urls from pages; duplicate the
    # rest (re-crawl rows, 1s later — the retry must pick ONE per url)
    keep = set(dead_urls[: len(dead_urls) // 2])
    partial = pages.filter(
        ~F.col("url").isin([u for u in dead_urls if u not in keep])
    )
    recrawl = partial.join(
        spark.createDataFrame([(u,) for u in keep], "url string"), "url", "left_semi"
    ).withColumn("warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 SECOND"))
    snapshot = partial.unionByName(recrawl)

    allow_all = dr.withColumn("action", F.lit("allow"))
    res = replay_dead_letters(spark, snapshot, lm, allow_all, cfg)
    assert res["unmatched"] == n_dead0 - len(keep)
    assert res["retried"] == len(keep)  # one retry per url despite dup rows
    dl = read_dead_letters(spark, out)
    assert dl.count() == res["unmatched"] + res["still_dead"]
    # no sink holds duplicate uuids after the replay, and the total rows
    # appended across sinks equal the recovered-with-a-sink count
    import os as _os
    total_after = 0
    for d in _os.listdir(out):
        if d.startswith("sink_") and d != "sink_dead_letter":
            sdf = spark.read.parquet(_os.path.join(out, d))
            assert sdf.count() == sdf.select("uuid").distinct().count(), d
            total_after += sdf.count()
    assert total_after == before_sink_rows + res["recovered"] - res["ignored"]
    # metrics_by_bucket agrees with the actual sink row counts
    m = {r["sink"]: r["in_rows"] - r["ignored"] for r in
         sink_metrics_from_buckets(spark, out).collect()}
    for d in _os.listdir(out):
        if d.startswith("sink_") and d != "sink_dead_letter":
            name = d[len("sink_"):]
            got = spark.read.parquet(_os.path.join(out, d)).count()
            assert m.get(name, 0) == got, (name, m.get(name), got)
