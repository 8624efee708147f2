"""Index job: build a persisted IVF ANN index over an embedding table.

    spark-submit --py-files vcf2df_spark.zip jobs/index.py \
        --embeddings /path/embeddings.parquet --out /path/ann_index \
        --k-cells 64 --iters 2

    # probe it (exact cosine top-k within the nprobe nearest cells):
    spark-submit ... jobs/index.py --out /path/ann_index \
        --probe-vec-id 42 --embeddings /path/embeddings.parquet \
        --top-k 10 --nprobe 4

    # incremental maintenance: assign NEW vectors with the persisted
    # centroids, append into the cell dirs (no rebuild):
    spark-submit ... jobs/index.py --out /path/ann_index \
        --embeddings /path/new_embeddings.parquet --append

    # delete cascade (run after jobs/delete.py erases the warehouse rows —
    # GDPR erasure is incomplete while the index serves deleted vectors):
    spark-submit ... jobs/index.py --out /path/ann_index \
        --embeddings /path/embeddings.parquet --forget 42 --forget 43

The similarity-search analogue of the warehouse point lookup: the index is
built once (one map-only assignment pass + a partitioned write), and every
probe touches only ``nprobe`` of the ``k_cells`` hive partition dirs.
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--embeddings", required=True,
                   help="parquet table with id + array<float> columns")
    p.add_argument("--out", required=True, help="index directory")
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--vec-col", default="embedding")
    p.add_argument("--k-cells", type=int, default=8)
    p.add_argument("--iters", type=int, default=0,
                   help="deterministic Lloyd refinement rounds (0 = seed "
                        "centroids only, SQL-reproducible)")
    p.add_argument("--skip-build", action="store_true",
                   help="probe an existing index without rebuilding")
    p.add_argument("--append", action="store_true",
                   help="incremental maintenance: assign --embeddings with "
                        "the index's PERSISTED centroids and append into "
                        "the cell dirs (no rebuild)")
    p.add_argument("--forget", action="append", default=None,
                   help="repeatable id-col value: drop these vectors from "
                        "the index (the delete cascade for jobs/delete.py "
                        "— GDPR erasure is incomplete while an index keeps "
                        "serving deleted vectors)")
    p.add_argument("--probe-vec-id", type=int, default=None,
                   help="probe: report top-k neighbors of this vector")
    p.add_argument("--top-k", type=int, default=5)
    p.add_argument("--nprobe", type=int, default=2)
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from vcf2df_spark import ann
    from vcf2df_spark.session import get_spark
    from vcf2df_spark.shipping import ensure_shipped

    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(master=args.master, app_name="ann-index")
    ensure_shipped(spark)
    t0 = time.time()
    emb = spark.read.parquet(args.embeddings)

    out: dict = {"status": "ok", "index": args.out}
    if args.forget:
        # id-col values arrive as strings; coerce to the column's type
        id_type = dict(emb.dtypes).get(args.id_col, "string")
        ids = [
            int(v) if id_type in ("bigint", "int", "smallint") else v
            for v in args.forget
        ]
        out.update(ann.forget(spark, args.out, ids, id_col=args.id_col))
    elif args.append:
        out.update(
            ann.append_index(
                spark, emb, args.out,
                id_col=args.id_col, vec_col=args.vec_col,
            )
        )
    elif not args.skip_build:
        out.update(
            ann.build_index(
                spark, emb, args.out, k_cells=args.k_cells,
                iters=args.iters, id_col=args.id_col, vec_col=args.vec_col,
            )
        )

    if args.probe_vec_id is not None:
        qvec = (
            emb.filter(F.col(args.id_col) == args.probe_vec_id)
            .select(F.col(args.vec_col).cast("array<double>").alias("v"))
            .collect()
        )
        if not qvec:
            raise SystemExit(
                f"--probe-vec-id {args.probe_vec_id} not in {args.embeddings}"
            )
        hits = ann.probe(
            spark, args.out, qvec[0]["v"], top_k=args.top_k,
            nprobe=args.nprobe, exclude_id=args.probe_vec_id,
            id_col=args.id_col, vec_col=args.vec_col,
        ).collect()
        out["probe"] = {
            "vec_id": args.probe_vec_id,
            "neighbors": [r.asDict() for r in hits],
        }

    out["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(out))
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
