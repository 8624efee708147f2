"""Driver-checkable STREAMING queries: each drives a real Structured
Streaming query (readStream -> stateful operator -> availableNow drain)
to completion inside a batch-query wrapper, and returns only the
deterministic part of the emitted stream — so the streaming operators get
first-class driver correctness rows against ANSI-SQL oracles instead of
the round-3 "driver-untestable" pytest-only status.

Determinism contract: WHICH occurrence a stateful operator emits first is
micro-batch-order dependent, so the returned frames keep only columns that
are invariant to batch order (the hash set for dedup; the final converged
state per key for the conversation tracker, reconstructed by aggregating
the update stream — every tracked quantity is monotone across updates).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _drain(stream_df, name: str, checkpoint: str) -> None:
    q = (
        stream_df.writeStream.format("memory").queryName(name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    if q.isActive:  # pragma: no cover - drain must terminate
        q.stop()
        raise RuntimeError(f"streaming drain {name} did not terminate")


def q_stream_dedup_drain(spark: SparkSession, sf_dir: str):
    """Exact dedup as a STREAM: documents flow through
    ``streaming.streaming_dedup`` (applyInPandasWithState keyed by content
    hash) and the drained emission set is one row per distinct text —
    exactly the batch ``dedup_exact`` key set, which is the oracle."""
    from vcf2df_spark import streaming
    from vcf2df_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    work = tempfile.mkdtemp(prefix="streamq_dedup_")
    try:
        src = docs.select(
            F.col("doc_id").cast("string").alias("conv_id"),
            F.lit(0).cast("int").alias("turn_idx"),
            F.col("text"),
        )
        src.write.mode("overwrite").parquet(f"{work}/in")
        prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            stream = spark.readStream.schema(
                "conv_id string, turn_idx int, text string"
            ).parquet(f"{work}/in")
            _drain(
                streaming.streaming_dedup(stream),
                "streamq_dedup_out", f"{work}/ck",
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
        # memory sink: fully materialized once the drain terminates
        return spark.table("streamq_dedup_out").select("text_hash")
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_stream_conv_state(spark: SparkSession, sf_dir: str):
    """The custom stateful operator (``streaming.conversation_state``,
    applyInPandasWithState) driven over event-derived transcripts; the
    update stream is collapsed to the final converged per-conversation
    state (every tracked quantity is monotone across updates, so the
    aggregate of updates IS the final state regardless of batching)."""
    from vcf2df_spark import streaming
    from vcf2df_spark.operators.engineops import _derived
    from vcf2df_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # epoch_us parity
    work = tempfile.mkdtemp(prefix="streamq_state_")
    try:
        src = _derived(spark, sf_dir).select(
            "conv_id", "turn_idx", "role", "text", "tool", "ts"
        )
        src.write.mode("overwrite").parquet(f"{work}/in")
        prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            stream = spark.readStream.schema(
                "conv_id string, turn_idx int, role string, text string, "
                "tool string, ts timestamp"
            ).parquet(f"{work}/in")
            _drain(
                streaming.conversation_state(stream),
                "streamq_state_out", f"{work}/ck",
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
        out = spark.table("streamq_state_out")
        return out.groupBy("conv_id").agg(
            F.max("n_turns").alias("n_turns"),
            F.min("first_us").alias("first_us"),
            F.max("last_us").alias("last_us"),
            F.max("max_turn_idx").alias("max_turn_idx"),
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES = {
    "stream_dedup_drain": q_stream_dedup_drain,
    "stream_conv_state": q_stream_conv_state,
}

ORACLES = {
    "stream_dedup_drain": "SELECT DISTINCT md5(text) AS text_hash FROM documents",
    "stream_conv_state": """
        WITH t AS (
            SELECT printf('u%06d', user_id) AS conv_id,
                   CAST(row_number() OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id)
                        AS INTEGER) AS turn_idx,
                   ts
            FROM events
        )
        SELECT conv_id,
               CAST(count(*) AS BIGINT) AS n_turns,
               CAST(min(epoch_us(ts)) AS BIGINT) AS first_us,
               CAST(max(epoch_us(ts)) AS BIGINT) AS last_us,
               CAST(max(turn_idx) AS BIGINT) AS max_turn_idx
        FROM t GROUP BY conv_id
    """,
}
