"""Scan job: predicate-pruned reads over the encoded warehouse.

    spark-submit --py-files vcf2df_spark.zip jobs/scan.py \
        --warehouse /wh [--conv-id conv-00000042] \
        [--conv-range LO HI] [--turn-range LO HI] [--columns conv_id,text] \
        [--limit 20]

Completes the CLI triple (encode / decode_verify / scan): zone-map chunk
pruning + column-pruned decode, or a single-conversation point lookup with
random-access text decode.
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--warehouse", required=True)
    p.add_argument("--conv-id", default=None, help="point lookup of one conversation")
    p.add_argument("--conv-range", nargs=2, default=None, metavar=("LO", "HI"))
    p.add_argument("--turn-range", nargs=2, type=int, default=None, metavar=("LO", "HI"))
    p.add_argument("--columns", default=None, help="comma-separated subset")
    p.add_argument("--limit", type=int, default=20)
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from vcf2df_spark import scan
    from vcf2df_spark.session import get_spark
    from vcf2df_spark.shipping import ensure_shipped

    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(master=args.master, app_name="scan")
    ensure_shipped(spark)

    if args.conv_id is not None:
        pdf = scan.fetch_conversation(spark, args.warehouse, args.conv_id)
        print(json.dumps({"conv_id": args.conv_id, "n_turns": len(pdf)}))
        print(pdf.head(args.limit).to_string())
    else:
        from pyspark.sql import functions as F

        from vcf2df_spark.datasource import read_warehouse, scan_warehouse

        cols = args.columns.split(",") if args.columns else None
        preds = []
        if args.conv_range:
            lo, hi = args.conv_range
            preds += [F.col("conv_id") >= lo, F.col("conv_id") <= hi]
            if cols and "conv_id" not in cols:
                cols.append("conv_id")
        if args.turn_range:
            lo, hi = args.turn_range
            preds += [F.col("turn_idx") >= int(lo), F.col("turn_idx") <= int(hi)]
            if cols and "turn_idx" not in cols:
                cols.append("turn_idx")
        # predicates ride the pushdown format (task-side zone-map pruning,
        # Spark re-applies exactly); a bare dump rides the safe format
        df = (scan_warehouse(spark, args.warehouse, preds, columns=cols)
              if preds else read_warehouse(spark, args.warehouse, columns=cols))
        n = df.count()
        print(json.dumps({"rows_matched": n}))
        df.show(args.limit, truncate=60)
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
