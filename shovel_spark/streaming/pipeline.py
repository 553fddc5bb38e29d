"""Streaming pipeline — shovel's native unbounded mode, Spark-first.

Shovel daemons tail unbounded inputs (file follow, AMQP, MQTT, TCP —
reference: src/inputs/*.js) and deliver with ack/nack guarantees. The
Structured Streaming equivalent:

  - source: file-stream over the pages directory (new parquet files are the
    "deliveries"); the stream checkpoint tracks consumed files — the broker
    ack analog (a restarted query never re-reads consumed input, like AMQP's
    unacked-replay, reference: src/inputs/amqp.js:101-112);
  - the SAME ``build_routed`` lazy chain runs per micro-batch (one engine,
    two execution modes — batch and streaming share all operator code);
  - sinks: ``foreachBatch`` fan-out reusing the multi-sink writer; the
    micro-batch is shovel's queue flush (size/time batching,
    reference: src/queues/batch.js:209-239);
  - event-time: watermarked tumbling-window counts over ``warc_ts`` — the
    metrics stream (late rows beyond the watermark are dropped, a semantics
    shovel doesn't have at all: its `date` is arrival wall-clock).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shovel_spark.io.sinks import write_sinks
from shovel_spark.pipeline import OUTPUT_COLS, JobConfig, build_routed
from shovel_spark.schema import PAGES_SCHEMA


def read_pages_stream(spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(input_dir)


def run_stream_once(
    spark: SparkSession,
    input_dir: str,
    lang_map: DataFrame,
    domain_rules: DataFrame,
    cfg: JobConfig,
    checkpoint_dir: str,
) -> None:
    """Process all currently-available input (Trigger.AvailableNow), then stop.

    Repeated invocations resume from the stream checkpoint: already-consumed
    files are never reprocessed (at-least-once per micro-batch; the batch
    ledger path covers exactly-once where that matters).
    """
    stream = read_pages_stream(spark, input_dir)
    routed = build_routed(stream, lang_map, domain_rules, cfg)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        write_sinks(
            batch_df,
            cfg.out_dir,
            cfg.sinks,
            partition_cols=["bucket"],
            mode="append",
            output_cols=OUTPUT_COLS,
        )

    q = (
        routed.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_metrics_stream(
    pages_stream: DataFrame, watermark: str = "1 day", window: str = "1 day"
) -> DataFrame:
    """Watermarked tumbling-window per-lang counts over event time
    (the streaming form of the metrics table; late data beyond the
    watermark is dropped)."""
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("lang"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n",
        )
    )


def run_windowed_metrics_once(
    spark: SparkSession, input_dir: str, out_dir: str, checkpoint_dir: str
) -> None:
    """Append-mode windowed counts to parquet (finalized windows only)."""
    metrics = windowed_metrics_stream(read_pages_stream(spark, input_dir))
    q = (
        metrics.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "windowed_metrics"))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
