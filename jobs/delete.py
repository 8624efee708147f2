"""Delete job: remove one conversation from an encoded warehouse.

    spark-submit --py-files vcf2df_spark.zip jobs/delete.py \
        --warehouse /path/warehouse --conv-id conv-00000042 [--conv-id ...]

Batch deletes amortize: every requested conversation's routed partitions
are rewritten in ONE pass (union of routes, one decode/encode/commit).

The GDPR-shaped operation a training-data warehouse needs: targeted
deletion without a full rewrite. The manifests' hash-routing metadata
bounds the work to the ~1-2 partition dirs that can hold the key (the
same routing as the point lookup), so at the 100-TB design point a delete
rewrites a couple of dirs out of ~400k:

1. route: `scan._route` computes the candidate partition ids from the
   manifests (requires routing metadata — a warehouse without
   `num_partitions` on record fails loudly rather than silently scanning);
2. rewrite: ONLY those partitions' blocks are decoded (parquet partition
   pruning on the hive dirs), the conversation's rows filtered out, and
   the survivors re-encoded through the SAME salted hash partitioner —
   rows land back in their original partition ids by construction;
3. commit: rewritten dirs are replaced via dynamic partition overwrite
   (a partition left EMPTY by the delete has its dir removed explicitly),
   and the manifests table is rewritten with fresh rows for the touched
   partitions (materialized on the driver first — never read-then-
   overwrite one path in a single lazy plan). Blocks first, manifests
   last: a crash in between leaves stale manifest checksums over new
   blocks, which `decode_verify` flags as checksum mismatches.

Prints one JSON line: rows_deleted, partitions_rewritten, wall_sec.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--warehouse", required=True)
    p.add_argument("--conv-id", required=True, action="append",
                   help="repeatable: all given conversations are removed "
                        "in one routed rewrite")
    p.add_argument("--job-id", default=None,
                   help="job id recorded on the rewritten manifest rows "
                        "(default: delete-<conv-id>)")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from vcf2df_spark import manifest
    from vcf2df_spark.blocks import MANIFEST_SCHEMA
    from vcf2df_spark.decode import decode_blocks
    from vcf2df_spark.encode import encode_keyed, with_partition_key
    from vcf2df_spark.scan import _route
    from vcf2df_spark.session import get_spark
    from vcf2df_spark.shipping import ensure_shipped

    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(master=args.master, app_name="delete")
    ensure_shipped(spark)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    t0 = time.time()
    wh = args.warehouse.rstrip("/")
    conv_ids = sorted(set(args.conv_id))
    job_id = args.job_id or "delete-" + "-".join(conv_ids[:3])

    pids: set | None = set()
    shard_dirs = None
    for cid in conv_ids:
        p_i, shard_dirs = _route(wh, cid)
        if p_i is None:
            pids = None
            break
        pids.update(p_i)
    if pids is None:
        print(json.dumps({
            "status": "error",
            "error": "warehouse has no manifests routing metadata "
                     "(num_partitions); targeted delete needs it — "
                     "re-encode with jobs/encode.py or compact first",
        }))
        sys.exit(2)

    manifests_all = spark.read.parquet(f"{wh}/manifests")
    if "epoch" in manifests_all.columns:
        print(json.dumps({
            "status": "error",
            "error": "streaming (epoch-partitioned) warehouses are not "
                     "supported; run jobs/compact.py first",
        }))
        sys.exit(2)
    mods = {
        r["num_partitions"]
        for r in manifests_all.select("num_partitions").distinct().collect()
    }
    num_partitions = mods.pop() if len(mods) == 1 and None not in mods else None
    if num_partitions is None:
        print(json.dumps({
            "status": "error",
            "error": "ambiguous num_partitions across manifest rows; "
                     "compact the warehouse to one partitioner first",
        }))
        sys.exit(2)

    # decode ONLY the routed partitions (hive partition pruning)
    blocks = spark.read.parquet(f"{wh}/blocks").filter(
        F.col("partition_id").isin(sorted(pids))
    )
    dec = decode_blocks(blocks).cache()
    try:
        n_before = dec.count()
        kept = dec.filter(~F.col("conv_id").isin(conv_ids))
        n_after = kept.count()
        if n_after == n_before:
            print(json.dumps({
                "status": "noop", "rows_deleted": 0,
                "partitions_routed": sorted(pids),
                "wall_sec": round(time.time() - t0, 2),
            }))
            return

        # survivors re-key to their ORIGINAL partitions (same hash).
        # The rewrite is STAGED first: new blocks are materialized to a
        # scratch dir and re-read from there, so every later action has a
        # lineage rooted in the staging files — a .cache() is only a
        # best-effort barrier, and a cache miss after the dynamic
        # overwrite would recompute through the just-deleted source files
        # (the CLAUDE.md read-then-overwrite rule, applied to blocks too)
        keyed = with_partition_key(kept, num_partitions)
        staging = f"{wh}/.delete_staging"
        shutil.rmtree(staging, ignore_errors=True)
        encode_keyed(keyed).write.parquet(f"{staging}/blocks")
        dec.unpersist()
        new_blocks = spark.read.parquet(f"{staging}/blocks")
        live_pids = {
            r["partition_id"]
            for r in new_blocks.select("partition_id").distinct().collect()
        }
        stray = live_pids - set(pids)
        assert not stray, f"re-keyed rows left the routed partitions: {stray}"

        # blocks first: dynamic overwrite replaces only the rewritten dirs
        if shard_dirs:
            new_blocks.withColumn(
                "shard", F.pmod(F.col("partition_id"), F.lit(shard_dirs))
            ).write.mode("overwrite").partitionBy(
                "shard", "partition_id"
            ).parquet(f"{wh}/blocks")
        else:
            new_blocks.write.mode("overwrite").partitionBy(
                "partition_id"
            ).parquet(f"{wh}/blocks")
        # a partition emptied by the delete writes nothing — remove its dir
        emptied = sorted(set(pids) - live_pids)
        for pid in emptied:
            d = (f"{wh}/blocks/shard={pid % shard_dirs}/partition_id={pid}"
                 if shard_dirs else f"{wh}/blocks/partition_id={pid}")
            shutil.rmtree(d, ignore_errors=True)

        # manifests last: materialize the untouched rows on the driver
        # (lineage cut — never read-then-overwrite one path lazily), then
        # rewrite the table = untouched rows + fresh rows for live pids
        untouched = manifests_all.filter(
            ~F.col("partition_id").isin(sorted(pids))
        ).collect()
        fresh = manifest.build_manifests(
            new_blocks, job_id, "delete:" + ",".join(conv_ids),
            num_partitions=num_partitions, shard_dirs=shard_dirs,
        ).collect()
        names = [f.name for f in MANIFEST_SCHEMA.fields]
        # by-name projection onto the current schema: pre-r4 manifest rows
        # (no schema_sig) rewrite cleanly with a null signature
        rows = [
            {n: d.get(n) for n in names}
            for d in (r.asDict() for r in untouched + fresh)
        ]
        merged = spark.createDataFrame(rows, MANIFEST_SCHEMA)
        merged.coalesce(4).write.mode("overwrite").parquet(f"{wh}/manifests")
        shutil.rmtree(staging, ignore_errors=True)

        print(json.dumps({
            "status": "ok",
            "rows_deleted": int(n_before - n_after),
            "partitions_routed": sorted(pids),
            "partitions_rewritten": sorted(live_pids),
            "partitions_emptied": emptied,
            "wall_sec": round(time.time() - t0, 2),
        }))
    finally:
        dec.unpersist()
        if owns_session:
            spark.stop()


if __name__ == "__main__":
    main()
