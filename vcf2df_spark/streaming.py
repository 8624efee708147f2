"""Structured Streaming: incremental encode of arriving transcript data.

The reference is a batch one-shot CLI (its line scanner is streaming I/O,
not stream semantics — SURVEY.md §2.2); the engine generalizes it: new
files landing in the input directory are encoded incrementally via
``readStream`` + ``foreachBatch``, each micro-batch running the same
salted-partition encode and appending blocks + a manifest row per
(job, epoch, partition). Checkpointing makes restarts exactly-once at the
micro-batch level — the streaming twin of the batch job's commit-log
resume.

Also provides a watermarked tumbling-window turn-rate aggregation — the
standard late-data pattern over the ``ts`` column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .blocks import TRANSCRIPT_SCHEMA
from .encode import encode_transcripts


def incremental_encode(
    spark: SparkSession,
    input_dir: str,
    warehouse: str,
    checkpoint: str,
    num_partitions: int = 8,
    job_id: str = "stream",
):
    """Encode new parquet files as they arrive; returns the StreamingQuery.

    Uses Trigger.AvailableNow semantics when started with
    ``.trigger(availableNow=True)`` by the caller-facing helper below, so
    tests drain the backlog and stop deterministically.
    """
    from . import manifest

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )

    def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        blocks = encode_transcripts(batch_df, num_partitions=num_partitions).cache()
        try:
            blocks.count()
            blocks.write.mode("append").parquet(f"{warehouse}/blocks")
            manifest.build_manifests(
                blocks, f"{job_id}-epoch{epoch_id}", input_dir
            ).write.mode("append").parquet(f"{warehouse}/manifests")
        finally:
            blocks.unpersist()

    return (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def turn_rate_windows(stream: DataFrame, window: str = "1 hour",
                      watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window turn counts per role (late data dropped
    beyond the watermark)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("role"))
        .agg(F.count("*").alias("n_turns"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "role",
            "n_turns",
        )
    )
