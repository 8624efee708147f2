"""Routed staged rewrite: the shared core of targeted delete and upsert.

The point-write analogue of the routed point read (scan.fetch_conversation):
given a set of conversation ids, rewrite ONLY the partition dirs their hash
routes to — at the 100-TB design point that is a couple of dirs out of
~400k, never a warehouse scan. Reference analogue: correcting a file means
re-running the CLI on it (``converter/convert_test.go:25-31`` deletes and
regenerates the whole output); ours is partition-bounded.

Commit discipline (same as jobs/encode.py):

1. route: manifests hash-routing metadata -> candidate partition ids
   (loud failure without it — never a silent full scan);
2. stage: routed partitions decode (hive partition pruning), target
   conversations drop out, replacement rows (if any) union in, survivors
   re-encode through the SAME salted hash partitioner and land in a
   scratch dir. Every later action reads the STAGING files — a .cache()
   is only a best-effort barrier, and a cache miss after the overwrite
   would recompute through the just-deleted source files (the CLAUDE.md
   read-then-overwrite rule, applied to blocks);
3. commit blocks: staged blocks are repartitioned BY partition_id (all of
   a partition's rows in one task => whole chunk groups per file — the
   blocks write invariant; a raw staging scan can split at row-group
   boundaries at production dir sizes) and swapped in via dynamic
   partition overwrite; partitions emptied by a delete have their dirs
   removed explicitly;
4. commit manifests LAST, as a staged Spark rewrite + directory swap —
   untouched rows are filtered and written by executors, NEVER collected
   to the driver (at ~400k manifest rows a driver materialization is a
   multi-hundred-MB single-threaded round-trip on every delete). A crash
   between blocks and manifests leaves stale checksums over new blocks,
   which decode_verify flags.

Local-filesystem warehouses only (loud failure otherwise — see fsutil):
the directory swaps use os/shutil, which silently no-op on remote URIs.
One rewrite at a time per warehouse (O_EXCL ``.rewrite_lock``; concurrent
rewrites would race on the staging dir and the manifests swap). The lock
does NOT coordinate with a concurrent encode-append or streaming epoch
writer to the same warehouse — a manifest file appended during the swap
window would be lost with the old directory. Run rewrites in maintenance
windows (or against quiesced warehouses), like any compaction.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class RewriteError(RuntimeError):
    """Warehouse not rewritable in place (missing routing metadata,
    streaming epochs, ambiguous partitioner, remote URI)."""


# above this many ids, drop-filters use a broadcast LEFT ANTI join instead
# of an isin literal list: a bulk GDPR batch inlined as 100k+ literals
# bloats the plan tree and the codegen source (the same reason resume's
# committed-id filter is an anti-join, not isin)
_ISIN_MAX_IDS = 1000


def _without_ids(spark: SparkSession, df: DataFrame, conv_ids: list) -> DataFrame:
    """df minus the given conv_ids — literal isin for small batches,
    broadcast anti-join for bulk ones."""
    if len(conv_ids) <= _ISIN_MAX_IDS:
        return df.filter(~F.col("conv_id").isin(conv_ids))
    ids_df = spark.createDataFrame(
        [(c,) for c in conv_ids], "conv_id string"
    )
    return df.join(F.broadcast(ids_df), "conv_id", "left_anti")


def _manifest_projection(df: DataFrame) -> DataFrame:
    """By-name projection onto the current MANIFEST_SCHEMA: pre-r4 rows
    (no schema_sig) rewrite cleanly with a null signature."""
    from .blocks import MANIFEST_SCHEMA

    cols = []
    have = set(df.columns)
    for f in MANIFEST_SCHEMA.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def routed_rewrite(
    spark: SparkSession,
    warehouse: str,
    conv_ids: list[str],
    job_id: str,
    desc: str,
    replacement: DataFrame | None = None,
) -> dict:
    """Remove ``conv_ids``' rows from the warehouse; insert ``replacement``
    rows (already normalized, same schema as the decoded warehouse) if
    given. Returns a JSON-able summary dict. Raises RewriteError when the
    warehouse cannot be rewritten in place."""
    from . import fsutil

    try:
        local = fsutil.require_local(warehouse, "warehouse")
    except ValueError as e:
        raise RewriteError(str(e)) from e
    wh = local.rstrip("/")

    # one rewrite at a time per warehouse: two concurrent staged rewrites
    # would race on the staging dir and the manifests swap (last writer
    # silently drops the other's rows)
    try:
        with fsutil.exclusive_lock(f"{wh}/.rewrite_lock", job_id, "rewrite"):
            # crash recovery: a rewrite that died between the manifests
            # rename and the staging move leaves NO manifests dir (every
            # read breaks). Restore the pre-swap manifests — over the
            # possibly-new blocks they may carry stale checksums, which
            # decode_verify flags, the same observable state as a crash
            # between the blocks and manifests commits.
            old_m = f"{wh}/.manifests_old"
            if not os.path.exists(f"{wh}/manifests") and os.path.exists(old_m):
                os.rename(old_m, f"{wh}/manifests")
            return _routed_rewrite_locked(
                spark, wh, conv_ids, job_id, desc, replacement
            )
    except fsutil.LockHeldError as e:
        raise RewriteError(str(e)) from None


def _routed_rewrite_locked(
    spark: SparkSession,
    wh: str,
    conv_ids: list[str],
    job_id: str,
    desc: str,
    replacement: DataFrame | None,
) -> dict:
    from . import fsutil, manifest
    from .decode import decode_blocks
    from .encode import encode_keyed, with_partition_key
    from .scan import _route_many

    conv_ids = sorted(set(conv_ids))
    # ONE manifests read routes the whole batch (a per-id loop would pay
    # K full metadata reads on a bulk GDPR delete)
    p_list, shard_dirs = _route_many(wh, conv_ids)
    if p_list is None:
        raise RewriteError(
            "warehouse has no manifests routing metadata "
            "(num_partitions); targeted rewrite needs it — re-encode "
            "with jobs/encode.py or compact first"
        )
    pids: set = set(p_list)

    manifests_all = spark.read.parquet(f"{wh}/manifests")
    if "epoch" in manifests_all.columns:
        raise RewriteError(
            "streaming (epoch-partitioned) warehouses cannot be rewritten "
            "in place; compact to a batch warehouse first "
            "(jobs/compact.py) — for deletes, jobs/delete.py "
            "--via-compact --out NEW_WH folds the erasure into that "
            "compaction"
        )
    mods = {
        r["num_partitions"]
        for r in manifests_all.select("num_partitions").distinct().collect()
    }
    num_partitions = mods.pop() if len(mods) == 1 and None not in mods else None
    if num_partitions is None:
        raise RewriteError(
            "ambiguous num_partitions across manifest rows; compact the "
            "warehouse to one partitioner first"
        )

    # decode ONLY the routed partitions (hive partition pruning)
    blocks = spark.read.parquet(f"{wh}/blocks").filter(
        F.col("partition_id").isin(sorted(pids))
    )
    dec = decode_blocks(blocks).cache()
    prior_mode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", None
    )
    try:
        n_before = dec.count()
        kept = _without_ids(spark, dec, conv_ids)
        n_after = kept.count()
        n_inserted = 0
        if replacement is not None:
            n_inserted = replacement.count()
            kept = kept.unionByName(replacement)
        if n_after == n_before and n_inserted == 0:
            return {
                "status": "noop", "rows_deleted": 0, "rows_inserted": 0,
                "partitions_routed": sorted(pids),
            }

        # stage: survivors (+ replacements) re-key to their hash partitions
        keyed = with_partition_key(kept, num_partitions)
        staging = f"{wh}/.rewrite_staging"
        fsutil.rmtree_checked(staging)
        encode_keyed(keyed).write.parquet(f"{staging}/blocks")
        dec.unpersist()
        new_blocks = spark.read.parquet(f"{staging}/blocks")
        live_pids = {
            r["partition_id"]
            for r in new_blocks.select("partition_id").distinct().collect()
        }
        stray = live_pids - set(pids)
        assert not stray, f"re-keyed rows left the routed partitions: {stray}"

        # commit blocks: dynamic overwrite replaces only the rewritten dirs.
        # repartition by partition_id first — one task per partition keeps
        # every chunk group whole within one file (the write invariant);
        # the raw staging scan can split a group at row-group boundaries.
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        final = new_blocks.repartition("partition_id")
        if shard_dirs:
            final.withColumn(
                "shard", F.pmod(F.col("partition_id"), F.lit(shard_dirs))
            ).write.mode("overwrite").partitionBy(
                "shard", "partition_id"
            ).parquet(f"{wh}/blocks")
        else:
            final.write.mode("overwrite").partitionBy(
                "partition_id"
            ).parquet(f"{wh}/blocks")
        # a partition emptied by the delete writes nothing — remove its dir
        emptied = sorted(set(pids) - live_pids)
        for pid in emptied:
            d = (f"{wh}/blocks/shard={pid % shard_dirs}/partition_id={pid}"
                 if shard_dirs else f"{wh}/blocks/partition_id={pid}")
            fsutil.rmtree_checked(d)

        # commit manifests LAST, distributed: untouched rows + fresh rows
        # for the rewritten partitions, staged then swapped — no driver
        # materialization of the warehouse-sized table, and no plan ever
        # reads and overwrites wh/manifests in one lineage (the staging
        # write reads wh/manifests, the swap is driver-side fs ops).
        untouched = _manifest_projection(
            manifests_all.filter(~F.col("partition_id").isin(sorted(pids)))
        )
        fresh = _manifest_projection(
            manifest.build_manifests(
                new_blocks, job_id, desc,
                num_partitions=num_partitions, shard_dirs=shard_dirs,
            )
        )
        untouched.unionByName(fresh).coalesce(4).write.parquet(
            f"{staging}/manifests"
        )
        old = f"{wh}/.manifests_old"
        fsutil.rmtree_checked(old)
        os.rename(f"{wh}/manifests", old)
        shutil.move(f"{staging}/manifests", f"{wh}/manifests")
        fsutil.rmtree_checked(old)
        fsutil.rmtree_checked(staging)

        return {
            "status": "ok",
            "rows_deleted": int(n_before - n_after),
            "rows_inserted": int(n_inserted),
            "partitions_routed": sorted(pids),
            "partitions_rewritten": sorted(live_pids),
            "partitions_emptied": emptied,
        }
    finally:
        dec.unpersist()
        if prior_mode is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prior_mode
            )
