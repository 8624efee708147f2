"""SparkSession factory with the engine's required configuration.

UTC session timezone + Arrow transfer are load-bearing: the bit-identity
contract for ``ts`` (compared as unix_micros int64, SURVEY.md §7 "hard
parts") must survive the JVM<->Python Arrow boundary in both directions.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(master: str | None = None, app_name: str = "vcf2df_spark",
              shuffle_partitions: int = 32) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    return (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.adaptive.enabled", "true")
        # AQE's coalescing floor (default 1m) is sized for JVM row work;
        # our post-shuffle stages run Arrow->Python compression kernels at
        # ~100ms per MB of input, so a 1MB floor caps a CPU-bound stage at
        # totalBytes/1MB tasks and under-subscribes cores exactly when the
        # per-stage data is small relative to the machine (measured: the
        # sf0.1 encode ran 18 tasks on 32 cores). At production shuffle
        # sizes partitions are advisory-size bound and the floor is
        # irrelevant, so lowering it is scale-neutral. Env-overridable.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION", "64k"),
        )
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
