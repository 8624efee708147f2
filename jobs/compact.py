"""Compaction job: streaming epoch warehouse -> batch-shaped warehouse.

    spark-submit --py-files vcf2df_spark.zip jobs/compact.py \
        --warehouse /path/stream_wh --out /path/compacted_wh --partitions 32

Structured Streaming appends one block set per epoch: micro-batch-sized
chunks (often far below the 64k-row target) with per-epoch directories.
That layout is correct but degrades over time — more chunk metadata, worse
compression (small dictionaries, short runs), more files to open per scan.
This job is the engine's OPTIMIZE: one shuffle-free datasource read over
all epochs, one standard re-encode (global sort contract, 64k chunks,
salted hash partitioning), manifests with hash-routing metadata — after
which point lookups route in O(1) and scans see batch-shaped chunks.

The read side is the same scan the SQL surface uses, so compaction doubles
as an end-to-end exercise of epoch-keyed decode. The output is written to
a NEW warehouse directory: compaction never mutates its input (swap is the
caller's atomic-rename/catalog-flip, matching the blocks-first,
manifest-commit-last convention of the encode job).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--warehouse", required=True, help="input warehouse (any layout)")
    p.add_argument("--out", required=True, help="output warehouse (must not exist)")
    p.add_argument("--partitions", type=int, default=32)
    p.add_argument("--shard-dirs", type=int, default=0,
                   help="two-level output layout (see jobs/encode.py)")
    p.add_argument("--job-id", default="compact")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    import os

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from vcf2df_spark import manifest
    from vcf2df_spark.datasource import read_warehouse
    from vcf2df_spark.encode import encode_keyed, with_partition_key
    from vcf2df_spark.session import get_spark
    from vcf2df_spark.shipping import ensure_shipped

    if os.path.exists(args.out):
        print(json.dumps({"status": "error",
                          "error": f"--out {args.out} already exists; "
                                   "compaction writes a fresh warehouse"}))
        sys.exit(2)

    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(master=args.master, app_name=f"compact:{args.job_id}")
    ensure_shipped(spark)
    t0 = time.time()

    from vcf2df_spark.decode import group_keys

    old_blocks = spark.read.parquet(f"{args.warehouse}/blocks")
    before = old_blocks.agg(
        # epoch-aware chunk identity: two epochs may reuse (pid, chunk)
        F.count_distinct(*group_keys(old_blocks)).alias("chunks"),
        F.sum("enc_bytes").alias("enc"),
    ).collect()[0]

    df = read_warehouse(spark, args.warehouse)  # epoch-aware, shuffle-free
    keyed = with_partition_key(df, args.partitions)
    from pyspark import StorageLevel

    blocks = encode_keyed(keyed).persist(StorageLevel.MEMORY_AND_DISK)
    after = blocks.agg(
        F.sum(F.when(F.col("column") == "conv_id", F.col("n_rows"))).alias("rows"),
        F.count_distinct("partition_id", "chunk_idx").alias("chunks"),
        F.sum("enc_bytes").alias("enc"),
    ).collect()[0]

    if args.shard_dirs:
        blocks.withColumn(
            "shard", F.pmod(F.col("partition_id"), F.lit(args.shard_dirs))
        ).write.partitionBy("shard", "partition_id").parquet(f"{args.out}/blocks")
    else:
        blocks.write.partitionBy("partition_id").parquet(f"{args.out}/blocks")
    manifest.build_manifests(
        blocks, args.job_id, args.warehouse, num_partitions=args.partitions,
        shard_dirs=args.shard_dirs or None,
    ).write.parquet(f"{args.out}/manifests")
    blocks.unpersist()

    print(json.dumps({
        "status": "ok",
        "rows": int(after["rows"]),
        "chunks_before": int(before["chunks"]),
        "chunks_after": int(after["chunks"]),
        "enc_bytes_before": int(before["enc"]),
        "enc_bytes_after": int(after["enc"]),
        "wall_sec": round(time.time() - t0, 2),
    }))
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
