"""Delete job: remove one conversation from an encoded warehouse.

    spark-submit --py-files vcf2df_spark.zip jobs/delete.py \
        --warehouse /path/warehouse --conv-id conv-00000042 [--conv-id ...]

Batch deletes amortize: every requested conversation's routed partitions
are rewritten in ONE pass (union of routes, one decode/encode/commit).
Bulk GDPR batches go through --conv-ids-file (one id per line); routing
is one manifests read for the whole batch, and above ~1k ids the drop
filter becomes a broadcast anti-join instead of an isin literal list.
When a huge batch routes to most partitions, prefer a filtered full
rewrite: jobs/compact.py run_compact(exclude_conv_ids=...) via
--via-compact.

The GDPR-shaped operation a training-data warehouse needs: targeted
deletion without a full rewrite. The manifests' hash-routing metadata
bounds the work to the ~1-2 partition dirs that can hold the key (the
same routing as the point lookup), so at the 100-TB design point a delete
rewrites a couple of dirs out of ~400k. The staged-rewrite mechanics
(route -> stage -> commit blocks -> commit manifests last, all
scale-bounded) live in vcf2df_spark/rewrite.py, shared with jobs/upsert.py.

Streaming (epoch-partitioned) warehouses have no in-place rewrite: the
epoch dirs ARE the block identity and the live checkpoint may append at
any time. For those, ``--via-compact --out NEW_WH`` folds the delete into
the compaction the warehouse periodically needs anyway — one filtered
re-encode into a fresh batch-shaped warehouse (jobs/compact.py
``run_compact(exclude_conv_ids=...)``); the caller swaps it in as usual.
Without the flag, an epoch warehouse fails loudly with that instruction.

NOTE: any ANN index built over embeddings derived from the deleted
conversations keeps serving them — complete the erasure with
``jobs/index.py --forget``.

Prints one JSON line: rows_deleted, partitions_rewritten, wall_sec.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _run_compact():
    """jobs.compact.run_compact, importable both as a package member
    (pytest) and as a standalone spark-submit script (no ``jobs`` package
    on sys.path — load the sibling file by location)."""
    try:
        from jobs.compact import run_compact
        return run_compact
    except ModuleNotFoundError:
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "_vcf2df_compact_job",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "compact.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.run_compact


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--warehouse", required=True)
    p.add_argument("--conv-id", action="append", default=None,
                   help="repeatable: all given conversations are removed "
                        "in one routed rewrite")
    p.add_argument("--conv-ids-file", default=None,
                   help="bulk alternative: file with one conv_id per line "
                        "(blank lines ignored); combined with any --conv-id")
    p.add_argument("--job-id", default=None,
                   help="job id recorded on the rewritten manifest rows "
                        "(default: delete-<conv-id>)")
    p.add_argument("--via-compact", action="store_true",
                   help="epoch (streaming) warehouses: delete by filtered "
                        "compaction into --out instead of in-place rewrite")
    p.add_argument("--out", default=None,
                   help="output warehouse for --via-compact (must not exist)")
    p.add_argument("--partitions", type=int, default=32,
                   help="--via-compact: output hash partitions")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from vcf2df_spark.rewrite import RewriteError, routed_rewrite
    from vcf2df_spark.session import get_spark
    from vcf2df_spark.shipping import ensure_shipped

    if args.via_compact and not args.out:
        print(json.dumps({"status": "error",
                          "error": "--via-compact requires --out"}))
        sys.exit(2)

    conv_ids = set(args.conv_id or [])
    if args.conv_ids_file:
        with open(args.conv_ids_file) as f:
            conv_ids.update(line.strip() for line in f if line.strip())
    conv_ids = sorted(conv_ids)
    if not conv_ids:
        print(json.dumps({"status": "error",
                          "error": "no conversations given: pass --conv-id "
                                   "and/or --conv-ids-file"}))
        sys.exit(2)

    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(master=args.master, app_name="delete")
    ensure_shipped(spark)
    t0 = time.time()
    job_id = args.job_id or "delete-" + "-".join(conv_ids[:3])

    try:
        if args.via_compact:
            out = _run_compact()(
                spark, args.warehouse, args.out, args.partitions,
                job_id=job_id, exclude_conv_ids=conv_ids,
            )
            if out["status"] != "ok":
                print(json.dumps(out))
                sys.exit(2)
        else:
            out = routed_rewrite(
                spark, args.warehouse, conv_ids, job_id,
                "delete:" + ",".join(conv_ids),
            )
    except RewriteError as e:
        print(json.dumps({"status": "error", "error": str(e)}))
        sys.exit(2)
    finally:
        if owns_session:
            spark.stop()

    out.pop("rows_inserted", None)  # delete never inserts
    out["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
