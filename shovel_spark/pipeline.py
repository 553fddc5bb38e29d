"""The engine's planner: job config → one lazy DataFrame chain → sinks.

Shovel wires six node slots from YAML at startup (reference:
src/core/processor.js:65-84); here the same declarative config compiles to

    read pages → parse (uuid, domain, text) → broadcast enrich (lang map,
    domain rules) → route (status, sink) → bucket → fan-out writes + metrics

which Catalyst fuses into scan + one codegen stage + two broadcast joins —
predicate pushdown, column pruning (the count-only paths never read ``html``)
and join planning are free (SURVEY.md §4).

Resume protocol (``run_resumable``): see ledger.py — skip done buckets,
dynamic-partition-overwrite the rest, ledger-append as commit point.
"""

from __future__ import annotations

import contextlib
import os
import re
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from shovel_spark import ledger as L
from shovel_spark.functions.parse import parse_pages
from shovel_spark.io.sinks import write_sinks
from shovel_spark.operators.aggregate import sink_metrics
from shovel_spark.operators.enrich import apply_domain_rules, normalize_lang
from shovel_spark.operators.route import SinkRule, apply_routes, default_sink_rules

#: Columns each sink table carries (html dropped post-parse: at 10^12 rows the
#: binary column dominates bytes; sinks store extracted fields only).
OUTPUT_COLS = [
    "uuid",
    "url",
    "warc_ts",
    "domain",
    "lang_norm",
    "text",
    "title",
    "status",
    "sink",
    "error",
]

_ENV_RE = re.compile(r"\$\{(\w+)(?::([^}]*))?\}")


def substitute_env(value: str) -> str:
    """``${VAR:default}`` substitution, mirroring the reference's config
    loader (reference: src/core/pipeline_config.js:42-54)."""
    return _ENV_RE.sub(lambda m: os.environ.get(m.group(1), m.group(2) or ""), value)


@dataclass
class JobConfig:
    name: str = "pages"
    input_path: str | None = None  # parquet dir or None (caller passes a DF)
    out_dir: str = "/tmp/shovel_spark_out"
    parser_impl: str = "native"  # 'native' (JVM regexp) | 'pandas' (Arrow UDF)
    lang_default: str = "und"  # unmapped-lang fallthrough (config lang_default)
    n_buckets: int = 64
    sink_rules: list[SinkRule] = field(default_factory=default_sink_rules)
    sinks: list[str] = field(default_factory=list)

    def __post_init__(self) -> None:
        if not self.sinks:
            self.sinks = [r.name for r in self.sink_rules] + ["dead_letter"]


def build_routed(
    pages: DataFrame,
    lang_map: DataFrame,
    domain_rules: DataFrame,
    cfg: JobConfig,
) -> DataFrame:
    """The full lazy chain, no action triggered."""
    df = parse_pages(pages, impl=cfg.parser_impl)
    df = normalize_lang(df, lang_map, default=cfg.lang_default)
    df = apply_domain_rules(df, domain_rules)
    df = apply_routes(df, cfg.sink_rules)
    # every dead-lettered row must carry WHY (per-doc error isolation,
    # reference: src/outputs/elasticsearch.js:156-165): parse failures keep
    # the parser's message, rule-deny rejects get a synthetic reason
    df = df.withColumn("text", F.col("parsed.text")).withColumn(
        "title", F.col("parsed.title")
    ).withColumn(
        "error",
        F.coalesce(
            F.col("parsed.error"),
            F.when(F.col("rule_action") == "deny", F.concat(F.lit("domain_rule:deny:"), F.col("domain"))),
        ),
    )
    return L.with_bucket(df.select(*OUTPUT_COLS, "lang"), n_buckets=cfg.n_buckets)


def run_once(
    spark: SparkSession,
    pages: DataFrame,
    lang_map: DataFrame,
    domain_rules: DataFrame,
    cfg: JobConfig,
) -> DataFrame:
    """Single-shot run (no ledger): write all sinks, return metrics DF."""
    routed = build_routed(pages, lang_map, domain_rules, cfg)
    # one persist shared by ALL consumers (sinks + metrics + dimension
    # counts) — otherwise each output re-runs the full parse chain
    routed = routed.persist()
    try:
        write_sinks(routed, cfg.out_dir, cfg.sinks, partition_cols=["bucket"], output_cols=OUTPUT_COLS)
        metrics = sink_metrics(routed, pipeline=cfg.name)
        metrics.coalesce(1).write.mode("overwrite").parquet(os.path.join(cfg.out_dir, "metrics"))
        write_dimension_counts(routed, cfg.out_dir)
    finally:
        routed.unpersist()
    return spark.read.parquet(os.path.join(cfg.out_dir, "metrics"))


def write_dimension_counts(routed: DataFrame, out_dir: str) -> None:
    """Driver-mandated per-domain / per-lang aggregates (BASELINE.json
    north_star), salted: hot domains carry ~35% of rows, so the two-phase
    aggregate bounds any single reducer at 1/K of the hot key."""
    from shovel_spark.operators.aggregate import salted_count

    salted_count(routed, "domain", out_col="n").coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "per_domain_counts")
    )
    salted_count(routed, "lang_norm", out_col="n").coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "per_lang_counts")
    )


def run_resumable(
    spark: SparkSession,
    pages: DataFrame,
    lang_map: DataFrame,
    domain_rules: DataFrame,
    cfg: JobConfig,
    run_id: str | None = None,
    max_buckets: int | None = None,
    lineage: str = "",
    throttle: bool = False,
    monitor: bool = True,
) -> dict:
    """Resumable run over logical buckets (see ledger.py for the protocol).

    ``max_buckets`` processes only the first K pending buckets. By default
    that models a CRASH mid-run (the test suite's kill simulation,
    FIXTURES.md §4): attempt rows are recorded for every pending bucket —
    the run intended them all — so the unprocessed ones correctly count as
    redeliveries when a resume re-attempts them. Pass ``throttle=True``
    when max_buckets is deliberate pacing instead (process K buckets per
    invocation): attempts are then recorded only for the buckets actually
    taken, and later invocations accrue no phantom nacks.

    ``monitor`` (default on) records live per-stage progress samples to
    ``{out_dir}/progress`` while the run executes — the batch analog of
    the reference's mid-run metrics endpoint (observability.py).
    Returns {run_id, processed_buckets, skipped_buckets}.
    """
    from shovel_spark.observability import ProgressMonitor
    run_id = run_id or L.new_run_id()
    ledger_dir = os.path.join(cfg.out_dir, "ledger")
    done = L.read_done_buckets(spark, ledger_dir)

    # the delivery record: every bucket this run intends to process gets an
    # 'attempt' row BEFORE any work — attempts without a 'done' ack make
    # the resume's re-attempt count as nacked = attempts - 1 in
    # metrics_from_ledger (broker-redelivery semantics)
    candidates = sorted(set(range(cfg.n_buckets)) - done)
    intended = (
        candidates[:max_buckets] if (throttle and max_buckets is not None) else candidates
    )
    L.append_attempts(spark, ledger_dir, run_id, intended)

    routed = build_routed(pages, lang_map, domain_rules, cfg)
    pending_pred = ~F.col("bucket").isin(sorted(done)) if done else F.lit(True)
    pending = routed.filter(pending_pred)

    if max_buckets is not None:
        pending = pending.filter(F.col("bucket").isin(candidates[:max_buckets]))

    # One distributed pass shared by three consumers (sink writes, per-bucket
    # metrics, ledger counts): repartition by the write's directory-partition
    # key FIRST (so each consumer inherits the write-aligned layout), then
    # persist. write_sinks detects the caller-managed cache and will neither
    # re-persist nor unpersist it.
    t0 = time.time()
    mon = ProgressMonitor(spark, cfg.out_dir) if monitor else contextlib.nullcontext()
    pending = pending.repartition("bucket").persist(StorageLevel.MEMORY_AND_DISK)
    try:
        with mon:
            write_sinks(
                pending, cfg.out_dir, cfg.sinks, partition_cols=["bucket"],
                output_cols=OUTPUT_COLS,
            )
            # per-(bucket, sink, status) metric rows, idempotent under
            # re-runs via the same dynamic-partition-overwrite trick as the
            # sinks themselves
            (
                pending.groupBy("bucket", "sink", "status")
                .agg(F.count("*").alias("n"))
                .write.mode("overwrite")
                # pinned per-write (default is static, which would wipe the
                # done buckets' metric rows on resume)
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("bucket")
                .parquet(os.path.join(cfg.out_dir, "metrics_by_bucket"))
            )
            counts = (
                pending.groupBy("bucket")
                .agg(
                    F.count("*").alias("in_rows"),
                    F.sum(F.when(F.col("status") == "acked", 1).otherwise(0)).alias("acked"),
                    F.sum(F.when(F.col("status") == "ignored", 1).otherwise(0)).alias("ignored"),
                    F.sum(F.when(F.col("status") == "rejected", 1).otherwise(0)).alias("rejected"),
                )
                .collect()
            )
    finally:
        pending.unpersist()
    bucket_counts = [r.asDict() for r in counts]
    # a processed bucket that held ZERO rows still completed — ack it with
    # zero counts, or it stays pending forever (a throttled caller would
    # re-select it every invocation and never progress past it)
    processed_slice = candidates[:max_buckets] if max_buckets is not None else candidates
    seen_buckets = {int(b["bucket"]) for b in bucket_counts}
    bucket_counts += [
        {"bucket": b, "in_rows": 0, "acked": 0, "ignored": 0, "rejected": 0}
        for b in processed_slice
        if b not in seen_buckets
    ]
    if bucket_counts:
        L.append_ledger(spark, ledger_dir, run_id, bucket_counts, lineage or f"pages->{cfg.out_dir}")
    return {
        "run_id": run_id,
        "processed_buckets": sorted(int(b["bucket"]) for b in bucket_counts),
        "skipped_buckets": sorted(done),
        "elapsed_sec": time.time() - t0,
    }


def sink_metrics_from_buckets(spark: SparkSession, out_dir: str, pipeline: str = "pages") -> DataFrame:
    """Per-sink metrics rows (METRICS_SCHEMA shape) aggregated from the
    idempotent per-bucket metric partitions a resumable run maintains."""
    m = spark.read.parquet(os.path.join(out_dir, "metrics_by_bucket"))
    per = (
        m.filter(F.col("sink").isNotNull())
        .groupBy("sink")
        .agg(
            F.sum("n").alias("in_rows"),
            F.sum(F.when(F.col("status") == "acked", F.col("n")).otherwise(0)).alias("acked"),
            F.lit(0).cast("long").alias("nacked"),
            F.sum(F.when(F.col("status") == "ignored", F.col("n")).otherwise(0)).alias("ignored"),
            F.sum(F.when(F.col("status") == "rejected", F.col("n")).otherwise(0)).alias("rejected"),
        )
        .withColumn("pipeline", F.lit(pipeline))
    )
    cols = ["pipeline", "sink", "in_rows", "acked", "nacked", "ignored", "rejected"]
    return per.select(*cols)


def ingest_bucketed(pages: DataFrame, path: str, n_buckets: int = 64, key: str = "url") -> None:
    """Materialize the input partitioned by its stable bucket — the scan-level
    resume optimization: a resumed run over a bucketed ingest PRUNES done
    buckets at the parquet scan (PartitionFilters), so skipped work costs
    zero I/O instead of read-then-filter. At 10^12 rows that's the
    difference between re-scanning 100 TB and scanning only the pending
    fraction."""
    # full rebuild: pin STATIC overwrite (a re-ingest over fewer rows must
    # not leave stale bucket partitions under a globally-dynamic session)
    L.with_bucket(pages, key=key, n_buckets=n_buckets).write.mode("overwrite").option(
        "partitionOverwriteMode", "static"
    ).partitionBy("bucket").parquet(path)


def read_bucketed(spark: SparkSession, path: str) -> DataFrame:
    """Read a bucketed ingest; the partition column 'bucket' comes back as a
    real column, and build_routed/with_bucket will reuse it (with_bucket
    recomputes the identical value — same hash, same key — so plans that
    filter on bucket before the recompute still prune)."""
    return spark.read.parquet(path)


def run_resumable_bucketed(
    spark: SparkSession,
    ingest_path: str,
    lang_map: DataFrame,
    domain_rules: DataFrame,
    cfg: JobConfig,
    run_id: str | None = None,
    max_buckets: int | None = None,
    throttle: bool = False,
) -> dict:
    """run_resumable over a bucketed ingest: done buckets are eliminated by
    partition pruning at the scan (assert: PartitionFilters in the plan),
    not by a post-read filter. ``max_buckets``/``throttle`` as in
    :func:`run_resumable`."""
    run_id = run_id or L.new_run_id()
    ledger_dir = os.path.join(cfg.out_dir, "ledger")
    done = L.read_done_buckets(spark, ledger_dir)

    # delivery records for the intended buckets (see run_resumable)
    candidates = sorted(set(range(cfg.n_buckets)) - done)
    intended = (
        candidates[:max_buckets] if (throttle and max_buckets is not None) else candidates
    )
    L.append_attempts(spark, ledger_dir, run_id, intended)

    pages = read_bucketed(spark, ingest_path)
    if done:
        pages = pages.filter(~F.col("bucket").isin(sorted(done)))  # prunes partitions
    if max_buckets is not None:
        pages = pages.filter(F.col("bucket").isin(candidates[:max_buckets]))

    routed = build_routed(pages.drop("bucket"), lang_map, domain_rules, cfg)
    t0 = time.time()
    # Same shared-persist pattern as run_resumable: one parse/route pass feeds
    # both the sink writes and the ledger counts.
    routed = routed.repartition("bucket").persist(StorageLevel.MEMORY_AND_DISK)
    try:
        write_sinks(
            routed, cfg.out_dir, cfg.sinks, partition_cols=["bucket"], output_cols=OUTPUT_COLS
        )
        counts = (
            routed.groupBy("bucket")
            .agg(
                F.count("*").alias("in_rows"),
                F.sum(F.when(F.col("status") == "acked", 1).otherwise(0)).alias("acked"),
                F.sum(F.when(F.col("status") == "ignored", 1).otherwise(0)).alias("ignored"),
                F.sum(F.when(F.col("status") == "rejected", 1).otherwise(0)).alias("rejected"),
            )
            .collect()
        )
    finally:
        routed.unpersist()
    bucket_counts = [r.asDict() for r in counts]
    # a processed bucket that held ZERO rows still completed — ack it with
    # zero counts, or it stays pending forever (a throttled caller would
    # re-select it every invocation and never progress past it)
    processed_slice = candidates[:max_buckets] if max_buckets is not None else candidates
    seen_buckets = {int(b["bucket"]) for b in bucket_counts}
    bucket_counts += [
        {"bucket": b, "in_rows": 0, "acked": 0, "ignored": 0, "rejected": 0}
        for b in processed_slice
        if b not in seen_buckets
    ]
    if bucket_counts:
        L.append_ledger(spark, ledger_dir, run_id, bucket_counts, f"bucketed:{ingest_path}")
    return {
        "run_id": run_id,
        "processed_buckets": sorted(int(b["bucket"]) for b in bucket_counts),
        "skipped_buckets": sorted(done),
        "elapsed_sec": time.time() - t0,
    }


def metrics_from_ledger(spark: SparkSession, out_dir: str, pipeline: str = "pages") -> DataFrame:
    """Pipeline totals reconstructed from the ledger (the reference's
    cross-worker metric aggregation analog, src/core/aggregated_metrics.js:100-132).

    ``nacked`` is derived, per acked bucket, as (attempt rows - 1): a bucket
    re-run after a crash was delivered more than once before its ack — the
    batch form of a broker redelivery count (src/core/master.js:183-185)."""
    led_all = spark.read.parquet(os.path.join(out_dir, "ledger"))
    led = led_all.filter(F.col("status") == "done")
    # Last writer wins per bucket (a re-run replaces the bucket's output).
    # max_by(completed_at) makes "last" deterministic — F.last() in a groupBy
    # has no row-order guarantee across parquet files.
    attempts = (
        led_all.filter(F.col("status") == "attempt")
        .groupBy("bucket")
        .agg(F.count("*").alias("__attempts"))
    )
    latest = (
        led.groupBy("bucket")
        .agg(
            F.max_by("in_rows", "completed_at").alias("in_rows"),
            F.max_by("acked", "completed_at").alias("acked"),
            F.max_by("ignored", "completed_at").alias("ignored"),
            F.max_by("rejected", "completed_at").alias("rejected"),
        )
        # pre-attempt-row ledgers have no attempt records -> nacked 0
        .join(attempts, "bucket", "left")
        .withColumn(
            "nacked",
            F.greatest(F.coalesce(F.col("__attempts"), F.lit(1)) - 1, F.lit(0)),
        )
    )
    return latest.agg(
        F.lit(pipeline).alias("pipeline"),
        F.lit(None).cast("string").alias("sink"),
        F.sum("in_rows").alias("in_rows"),
        F.sum("acked").alias("acked"),
        F.sum("nacked").alias("nacked"),
        F.sum("ignored").alias("ignored"),
        F.sum("rejected").alias("rejected"),
    )


def run_history(spark: SparkSession, out_dir: str) -> DataFrame:
    """Per-run ledger digest, newest first: (run_id, attempted, completed,
    in_rows, acked, ignored, rejected, started_at, finished_at) — the batch
    analog of the reference's per-worker end-of-run report lines
    (src/core/master.js:183-185), reconstructed from the attempt/done
    records so an operator can see every invocation's footprint (what a
    resume picked up, what a throttled run took, what a crash left behind).
    """
    led = spark.read.parquet(os.path.join(out_dir, "ledger"))
    return (
        led.groupBy("run_id")
        .agg(
            F.sum(F.when(F.col("status") == "attempt", 1).otherwise(0)).alias("attempted"),
            F.sum(F.when(F.col("status") == "done", 1).otherwise(0)).alias("completed"),
            F.sum(F.when(F.col("status") == "done", F.col("in_rows")).otherwise(0)).alias("in_rows"),
            F.sum(F.when(F.col("status") == "done", F.col("acked")).otherwise(0)).alias("acked"),
            F.sum(F.when(F.col("status") == "done", F.col("ignored")).otherwise(0)).alias("ignored"),
            F.sum(F.when(F.col("status") == "done", F.col("rejected")).otherwise(0)).alias("rejected"),
            F.min("completed_at").alias("started_at"),
            F.max("completed_at").alias("finished_at"),
        )
        .orderBy(F.desc("started_at"))
    )


#: non-string sink column types (everything else in OUTPUT_COLS is string)
_OUTPUT_COL_TYPES = {"warc_ts": "timestamp"}

#: dead-letter sink schema — DERIVED from OUTPUT_COLS (+ the bucket
#: partition) so the two can't drift apart. Reads use it EXPLICITLY so an
#: emptied table (all rows replayed) stays readable even though an empty
#: partitioned write leaves no data files.
DEAD_LETTER_SCHEMA = (
    ", ".join(f"{c} {_OUTPUT_COL_TYPES.get(c, 'string')}" for c in OUTPUT_COLS)
    + ", bucket int"
)


def read_dead_letters(spark: SparkSession, out_dir: str) -> DataFrame:
    """The dead-letter table with its explicit schema (safe when empty)."""
    return spark.read.schema(DEAD_LETTER_SCHEMA).parquet(
        os.path.join(out_dir, "sink_dead_letter")
    )


def replay_dead_letters(
    spark: SparkSession,
    pages: DataFrame,
    lang_map: DataFrame,
    domain_rules: DataFrame,
    cfg: JobConfig,
) -> dict:
    """Redeliver dead-lettered documents through a (presumably fixed)
    pipeline config — the batch form of shovel's nack → requeue retry
    (reference: src/inputs/amqp.js:101-112 requeues nacked deliveries;
    src/outputs/elasticsearch.js:156-165 dead-letters per-doc failures).

    A dead-letter row keeps WHY it failed but not the raw ``html`` (sinks
    store extracted fields, never source bytes — the scale rule), so the
    retry semi-joins the ORIGINAL pages table by url: only dead-lettered
    docs are re-parsed/re-routed — O(dead letters), not O(corpus), and
    the semi-join pushes into the pages scan. A url that appears several
    times in ``pages`` (re-crawl) retries its LATEST snapshot only
    (keep-latest upsert), so previously-delivered duplicates are never
    re-appended. Dead letters whose url is ABSENT from ``pages`` are NOT
    retried and stay in the dead-letter table (reported as
    ``unmatched`` — replaying against a partial snapshot must not lose
    them).

    Merge semantics: newly-successful rows APPEND to their sinks via the
    shared fan-out writer (absent before, so one replay adds no
    duplicates; uuid is the downstream dedupe key if a crashed replay is
    rerun — at-least-once, like the broker it mirrors); rows that now
    route to IGNORED leave the set without joining a sink; the
    still-failing remainder (plus unmatched rows) replaces the
    dead-letter table via rename-swap, and a crash mid-swap self-heals on
    the next invocation (the pre-swap copy at ``__replay_old`` is
    restored, same recipe as compact_parquet). ``metrics_by_bucket`` —
    when present — is updated for the affected buckets: every matched
    dead-letter ROW leaves (dead_letter, rejected) and each retried URL
    re-enters at its new sink/status, keeping the metrics consistent with
    actual table contents; a would-be-negative count (evidence of a
    replay that crashed between its metrics write and the swap) raises
    instead of silently corrupting — and the check runs BEFORE the sink
    appends, so a detectably-inconsistent prior state aborts without
    mutating any sink. A second replay under the same
    config retries the remainder, recovers nothing, appends nothing —
    observable no-op.

    Returns {retried, recovered, ignored, still_dead, unmatched,
    per_sink}. Units: retried/recovered/ignored/still_dead count RETRIED
    URLS (one per url after the keep-latest dedupe); unmatched counts
    dead-letter ROWS left untouched. A replay that empties the table
    leaves a partitioned dir with no data files — read it via
    :func:`read_dead_letters` (explicit schema), not bare
    ``spark.read.parquet``.
    """
    import shutil

    from shovel_spark.operators.merge import upsert_latest

    dl_path = os.path.join(cfg.out_dir, "sink_dead_letter")
    old_dir = dl_path + "__replay_old"
    tmp = dl_path + "__replay_tmp"
    # self-heal a replay that crashed mid-swap (same recipe as
    # compact_parquet): if the canonical path is gone, the pre-swap copy
    # at __replay_old is authoritative — restore it and retry from scratch
    if not os.path.exists(dl_path) and os.path.exists(old_dir):
        os.rename(old_dir, dl_path)
    shutil.rmtree(tmp, ignore_errors=True)

    dl = read_dead_letters(spark, cfg.out_dir).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        dl_urls = dl.select("url").where(F.col("url").isNotNull()).distinct()
        matched = pages.join(dl_urls, "url", "left_semi")
        # latest snapshot per url; ties broken by content hash (total
        # order). Checkpointed: it feeds the routed chain AND the
        # unmatched anti-join below.
        retry_pages = upsert_latest(
            matched.limit(0), matched, key="url", ts_col="warc_ts",
            tiebreak=F.xxhash64("html"),
        ).localCheckpoint(eager=False)
        # NULL-url rows never match anything and stay dead (left_anti keeps
        # null-key rows), as do urls missing from this pages snapshot.
        # Anti-join against the RETRY urls (O(dead letters)) — a
        # pages-wide distinct would re-scan the whole corpus.
        unmatched = dl.join(retry_pages.select("url"), "url", "left_anti")
        n_unmatched = unmatched.count()
        routed = build_routed(retry_pages, lang_map, domain_rules, cfg).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        try:
            recovered = routed.filter(F.col("status") != "rejected")
            still = routed.filter(F.col("status") == "rejected")
            # ONE aggregation job over the cached frame yields every
            # counter (retried/still/per-sink/ignored) the r6 shape
            # collected with four separate actions
            status_sink = (
                routed.groupBy("status", "sink").agg(F.count("*").alias("n")).collect()
            )
            n_retried = sum(int(r["n"]) for r in status_sink)
            n_still = sum(int(r["n"]) for r in status_sink if r["status"] == "rejected")
            n_recovered = n_retried - n_still
            per_sink: dict = {}
            for r in status_sink:
                if r["status"] != "rejected" and r["sink"] is not None:
                    per_sink[r["sink"]] = per_sink.get(r["sink"], 0) + int(r["n"])
            n_ignored = sum(
                int(r["n"])
                for r in status_sink
                if r["status"] != "rejected" and r["sink"] is None
            )
            # keep metrics_by_bucket consistent: retried docs leave
            # (dead_letter, rejected) and re-enter at their new
            # (sink, status); only affected bucket partitions rewrite.
            # COMPUTED (and consistency-checked) BEFORE any sink mutation:
            # the would-go-negative guard below detects a prior replay
            # that crashed between its metrics write and the dead-letter
            # swap — that state must abort the run before this one
            # appends anything, or a rerun re-appends the same recovered
            # rows (duplicate uuids downstream).
            updated = None
            mb_path = os.path.join(cfg.out_dir, "metrics_by_bucket")
            if os.path.isdir(mb_path):
                # rows LEAVING the table = every matched dl row (a url that
                # was dead-lettered twice removes two rows even though it
                # retries once) — subtract per (bucket), not per retry
                removed_rows = dl.join(retry_pages.select("url"), "url", "left_semi")
                affected = (
                    routed.select("bucket")
                    .unionByName(removed_rows.select("bucket"))
                    .distinct()
                )
                old = spark.read.parquet(mb_path).join(affected, "bucket", "left_semi")
                minus = removed_rows.groupBy("bucket").agg(
                    (-F.count("*")).alias("n")
                ).select(
                    "bucket", F.lit("dead_letter").alias("sink"),
                    F.lit("rejected").alias("status"), "n",
                )
                plus = routed.groupBy("bucket", "sink", "status").agg(
                    F.count("*").alias("n")
                )
                updated = (
                    old.unionByName(minus).unionByName(plus)
                    .groupBy("bucket", "sink", "status")
                    .agg(F.sum("n").alias("n"))
                    .localCheckpoint()  # must not read mb_path while overwriting it
                )
                # a negative count means the subtraction ran against
                # metrics that were ALREADY updated (a replay crashed
                # after the metrics write but before the dead-letter
                # swap) — surface it instead of silently dropping rows
                if updated.filter(F.col("n") < 0).limit(1).count() > 0:
                    raise RuntimeError(
                        "metrics_by_bucket would go negative — a prior "
                        "replay crashed between its metrics update and "
                        "dead-letter swap; restore metrics_by_bucket from "
                        "the sinks (sink_metrics_from_buckets inputs) "
                        "before replaying again"
                    )
            if per_sink:
                # the shared fan-out writer: concurrent filtered appends
                # against one cached frame (write_sinks semantics) — runs
                # only after the guard above has vouched for the metrics
                write_sinks(
                    recovered.filter(F.col("sink").isNotNull()),
                    cfg.out_dir,
                    sorted(per_sink),
                    partition_cols=["bucket"],
                    mode="append",
                    output_cols=OUTPUT_COLS,
                )
            if updated is not None:
                (
                    updated.filter(F.col("n") > 0)
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("bucket")
                    .parquet(mb_path)
                )
            # rewrite the remainder (still-failing + unmatched) to a
            # sibling, then swap via renames; a crash between the renames
            # leaves the pre-swap copy at __replay_old, which the next
            # invocation's self-heal restores
            remainder = still.select(*OUTPUT_COLS, "bucket").unionByName(
                unmatched.select(*OUTPUT_COLS, "bucket")
            )
            (
                remainder.write.mode("overwrite")
                .option("partitionOverwriteMode", "static")
                .partitionBy("bucket")
                .parquet(tmp)
            )
        finally:
            routed.unpersist()
    finally:
        dl.unpersist()
    shutil.rmtree(old_dir, ignore_errors=True)
    os.rename(dl_path, old_dir)
    os.rename(tmp, dl_path)
    shutil.rmtree(old_dir)
    return {
        "retried": n_retried,
        "recovered": n_recovered,
        "ignored": n_ignored,
        "still_dead": n_retried - n_recovered,
        "unmatched": n_unmatched,
        "per_sink": per_sink,
    }
