"""Per-column size audit vs the zstd-parquet baseline (BENCH/BASELINE.md).

For each column of the bench fixture:
  ours     = that column's block rows (payload+aux only) written as their
             own zstd-parquet file (pages shared across chunks, exactly
             like the real blocks table), minus the empty-file floor
  baseline = the raw column as its own zstd-parquet file, minus the floor

``--partitions`` controls chunk size (rows/partition, capped at
CHUNK_ROWS=64k): 32 reproduces the toy-chunk table in BENCH/BASELINE.md,
4 gives ~63k-row chunks — the production shape, where per-chunk fixed
overhead (duplicated dictionaries, page/offset framing) amortizes away.

    python tools/percolumn_audit.py --partitions 32
    python tools/percolumn_audit.py --partitions 4
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _file_bytes(d: str) -> int:
    return sum(os.path.getsize(f) for f in glob.glob(f"{d}/*.parquet"))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--partitions", type=int, default=32)
    p.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = p.parse_args()

    from bench import _sf_from_dir, bench_input
    from vcf2df_spark.encode import encode_transcripts, normalize_input
    from vcf2df_spark.session import get_spark
    from vcf2df_spark.shipping import ensure_shipped

    spark = get_spark(master="local[8]", app_name="percolumn")
    ensure_shipped(spark)
    src = normalize_input(
        spark.read.parquet(bench_input(_sf_from_dir(args.sf_dir)))
    )
    blocks = encode_transcripts(src, num_partitions=args.partitions).cache()
    n_rows = src.count()

    work = tempfile.mkdtemp(prefix="percol_")

    def zparquet(df, name: str) -> int:
        d = f"{work}/{name}"
        df.coalesce(1).write.mode("overwrite").option(
            "compression", "zstd"
        ).parquet(d)
        return _file_bytes(d)

    # empty-file floors per written schema
    floor_ours = zparquet(
        blocks.select("payload", "aux").limit(0), "floor_ours"
    )
    out = {"partitions": args.partitions, "rows": n_rows, "columns": {}}
    total_ours = total_base = 0
    for col in src.columns:
        ours = zparquet(
            blocks.filter(blocks.column == col).select("payload", "aux"),
            f"ours_{col}",
        ) - floor_ours
        floor_base = zparquet(src.select(col).limit(0), f"floorb_{col}")
        base = zparquet(src.select(col), f"base_{col}") - floor_base
        n_chunks = blocks.filter(blocks.column == col).count()
        out["columns"][col] = {
            "ours": ours, "baseline": base,
            "delta_pct": round(100.0 * (ours - base) / base, 1),
            "n_chunks": n_chunks,
        }
        total_ours += ours
        total_base += base
    out["total_ours"] = total_ours
    out["total_baseline"] = total_base
    out["ratio"] = round(total_ours / total_base, 3)
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
