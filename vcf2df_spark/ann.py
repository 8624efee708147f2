"""Persisted IVF (inverted-file) ANN index over an embedding table.

The similarity-search analogue of the warehouse's routed point lookup
(scan.py): instead of recomputing a coarse quantizer per query (the
``ivf_probe`` demo), ``build_index`` writes the index INTO the warehouse —
a tiny ``centroids`` table plus the vectors repartitioned into
``assignments/cell=C/`` hive directories — and ``probe`` touches only the
probed cells' partition dirs (parquet partition pruning), never the full
corpus.

Scale design (100 TB / 1000 executors):
- assignment is MAP-ONLY: the k centroids are driver-side literals folded
  into one projection (an ``array_min`` over (neg_sim, cell) structs), so
  the only exchange in ``build_index`` is the final ``partitionBy(cell)``
  write — no per-row join, no shuffle for argmin;
- Lloyd refinement (``iters``) keeps the same shape per round: one map-only
  assignment + one partial-aggregated per-dimension mean (k x dim rows to
  the driver — bytes, not data);
- ``probe`` reads only ``nprobe`` partition dirs and ends in a
  TakeOrderedAndProject — work is O(corpus/k_cells * nprobe), not O(corpus).

Determinism/oracle contract: seed centroids are the ``k_cells``
smallest-id vectors, similarities are sequential-fold double dot products
rounded to 6 decimals before argmax with cell-id tie-break — exactly
reproducible in ANSI SQL (``textops.ORACLES['ann_index_probe']``), so the
engine-built index is checksum-verified against a DuckDB recomputation.
With ``iters>0`` the quantizer is still deterministic, just no longer
oracle-recomputable in one SQL statement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SIM_DECIMALS = 6  # assignment rounds sims before argmax (cross-engine parity)


def _lit_vec(values) -> F.Column:
    return F.array(*[F.lit(float(v)) for v in values])


def _dot(a, b) -> F.Column:
    """Sequential left-to-right double fold — the accumulation order the
    SQL oracle's list_dot_product uses, so sims agree across engines."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(_dot(a, a))


def _assign_cell(vec, vnorm, cents: list, cnorms: list) -> F.Column:
    """argmax-cosine cell id as ONE projection: array_min over
    (neg_rounded_sim, cell) structs — struct ordering gives the
    (best sim, smallest cell) tie-break without any join or window."""
    entries = [
        F.struct(
            # a zero-norm vector yields a null sim: coalesce to -inf so it
            # deterministically lands in the smallest cell id (matching the
            # oracle's DESC NULLS LAST + cid ASC tie-break) instead of
            # letting null-field struct comparison pick arbitrarily
            (-F.coalesce(
                F.round(
                    _dot(vec, _lit_vec(c)) / (vnorm * F.lit(float(cn))),
                    _SIM_DECIMALS,
                ),
                F.lit(float("-inf")),
            )).alias("negsim"),
            F.lit(int(ci)).alias("cell"),
        )
        for ci, (c, cn) in enumerate(zip(cents, cnorms))
    ]
    return F.array_min(F.array(*entries))["cell"]


def _centroid_norms(spark: SparkSession, cents: list) -> list:
    """Norms via the same in-engine fold as every other similarity (a
    driver-side numpy norm could differ in the last ulp and flip a
    rounded argmax)."""
    df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "cell int, centroid array<double>",
    )
    rows = df.select("cell", _norm(F.col("centroid")).alias("n")).collect()
    return [r["n"] for r in sorted(rows, key=lambda r: r["cell"])]


def build_index(
    spark: SparkSession,
    emb: DataFrame,
    out: str,
    k_cells: int = 8,
    iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Write an IVF index: ``{out}/centroids.parquet`` (cell, centroid,
    cnorm) + ``{out}/assignments/cell=C/`` (all input columns + cell).

    Seed centroids are the ``k_cells`` smallest-``id_col`` vectors;
    ``iters`` Lloyd rounds refine them (deterministic, same seed -> same
    index). Returns {"k_cells", "iters", "n_vectors"}.
    """
    e = (
        emb.withColumn("_v", F.col(vec_col).cast("array<double>"))
        .withColumn("_vnorm", _norm(F.col("_v")))
    )
    seeds = (
        e.orderBy(id_col).limit(k_cells).select("_v").collect()
    )
    cents = [r["_v"] for r in seeds]
    if len(cents) < k_cells:
        raise ValueError(
            f"need >= {k_cells} vectors to seed {k_cells} cells, "
            f"got {len(cents)}"
        )

    for _ in range(iters):
        cnorms = _centroid_norms(spark, cents)
        asg = e.withColumn(
            "cell", _assign_cell(F.col("_v"), F.col("_vnorm"), cents, cnorms)
        )
        # per-dimension means: partial (map-side) agg -> k*dim tiny rows
        means = (
            asg.select("cell", F.posexplode("_v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = r["m"]
        dim = len(cents[0])
        # empty cells keep their previous centroid (standard Lloyd fallback)
        cents = [
            [by_cell[ci][p] for p in range(dim)] if ci in by_cell else cents[ci]
            for ci in range(len(cents))
        ]

    cnorms = _centroid_norms(spark, cents)
    cents_df = spark.createDataFrame(
        [
            (i, [float(x) for x in c], float(n))
            for i, (c, n) in enumerate(zip(cents, cnorms))
        ],
        "cell int, centroid array<double>, cnorm double",
    )
    cents_df.coalesce(1).write.mode("overwrite").parquet(
        f"{out}/centroids.parquet"
    )
    assigned = e.withColumn(
        "cell", _assign_cell(F.col("_v"), F.col("_vnorm"), cents, cnorms)
    ).drop("_v", "_vnorm")
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        f"{out}/assignments"
    )
    # vector count from the written parquet FOOTERS (driver-side metadata)
    # — a df.count() here would be a second full corpus scan
    import pyarrow.dataset as pads

    n_vectors = pads.dataset(
        f"{out}/assignments", format="parquet", partitioning="hive"
    ).count_rows()
    return {
        "k_cells": k_cells,
        "iters": iters,
        "n_vectors": n_vectors,
    }


def probe(
    spark: SparkSession,
    index: str,
    query_vec,
    top_k: int = 5,
    nprobe: int = 2,
    exclude_id=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k within the ``nprobe`` nearest cells.

    Cell selection is driver-side over the tiny centroids table; the
    assignments scan carries a ``cell IN (...)`` partition filter, so only
    the probed hive directories are listed and read. Returns
    (id, cell, cosine) ordered by (cosine desc, id asc).
    """
    q = [float(x) for x in query_vec]
    cents = spark.read.parquet(f"{index}/centroids.parquet")
    qn_df = spark.createDataFrame([(q,)], "q array<double>")
    qnorm = qn_df.select(_norm(F.col("q")).alias("n")).collect()[0]["n"]
    scored = (
        cents.select(
            "cell",
            F.round(
                _dot(_lit_vec(q), F.col("centroid"))
                / (F.lit(qnorm) * F.col("cnorm")),
                _SIM_DECIMALS,
            ).alias("s"),
        )
        .orderBy(F.desc("s"), F.asc("cell"))
        .limit(nprobe)
        .collect()
    )
    cells = [r["cell"] for r in scored]

    asg = spark.read.parquet(f"{index}/assignments").filter(
        F.col("cell").isin(cells)  # hive partition pruning: nprobe dirs
    )
    if exclude_id is not None:
        asg = asg.filter(F.col(id_col) != F.lit(exclude_id))
    ve = F.col(vec_col).cast("array<double>")
    cosine = F.round(
        _dot(ve, _lit_vec(q)) / (_norm(ve) * F.lit(qnorm)), 3
    )
    return (
        asg.select(
            F.col(id_col), F.col("cell").cast("int").alias("cell"),
            cosine.alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(top_k)
    )
