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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_SIM_DECIMALS = 6  # assignment rounds sims before argmax (cross-engine parity)

# k_cells * dim above which assignment switches from the literal-folded
# projection to the batched pandas_udf: higher-order functions are codegen
# fallbacks and CSE does not collapse repeated folds, so at production IVF
# scale (k ~ sqrt(N), real dims) the literal plan is O(k*dim) expression
# nodes — it would not compile or run acceptably. The literal path stays
# the default at oracle scale (exact sequential-fold parity with DuckDB).
_LITERAL_MAX_ENTRIES = 512


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


def _assign_cell_batched(spark: SparkSession, cents: list, cnorms: list):
    """Batched argmax assignment for production k: one Arrow-vectorized
    pandas_udf doing a numpy matmul against a BROADCAST (k x dim) centroid
    matrix — O(1) plan nodes regardless of k, versus the literal path's
    O(k*dim) folded expressions.

    Same rounded-sim/tie-break contract as ``_assign_cell``: sims rounded
    HALF_UP to ``_SIM_DECIMALS`` before argmax (sign-aware floor(x*1e6+.5)
    — np.round is HALF_EVEN and could pick a different cell than F.round
    on an exact 6-decimal half, ADVICE r5), ties (and zero-norm vectors,
    whose sims are all -inf) break to the smallest cell id (np.argmax
    returns the FIRST max). The only divergence from the literal path is
    dot accumulation order (BLAS vs sequential fold) — a last-ulp
    difference that the rounding makes vanishingly unlikely to flip an
    argmax; the oracle-checked small-k path always uses the literal fold.
    """
    bc = spark.sparkContext.broadcast(
        (
            np.asarray(cents, dtype=np.float64),
            np.asarray(cnorms, dtype=np.float64),
        )
    )

    @F.pandas_udf("int")
    def assign(vec: pd.Series, vnorm: pd.Series) -> pd.Series:
        cmat, cn = bc.value
        if len(vec) == 0:
            return pd.Series([], dtype="int32")
        v = np.stack(vec.to_numpy())  # (n, dim)
        sims = v @ cmat.T  # (n, k)
        scale = 10.0 ** _SIM_DECIMALS
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = sims / (vnorm.to_numpy()[:, None] * cn[None, :])
            sims = np.sign(sims) * np.floor(
                np.abs(sims) * scale + 0.5
            ) / scale  # HALF_UP, matching F.round
        sims = np.where(np.isfinite(sims), sims, -np.inf)
        return pd.Series(np.argmax(sims, axis=1).astype(np.int32))

    return assign


def _is_vectorized(cents: list, vectorized: bool | None) -> bool:
    """ONE decision point for the assignment path, shared by the dispatch
    and build_index's reported mode (ADVICE r5: they computed the
    threshold differently and could disagree); empty-cents guarded."""
    if vectorized is not None:
        return vectorized
    return bool(cents) and len(cents) * len(cents[0]) > _LITERAL_MAX_ENTRIES


def assignment_expr(
    spark: SparkSession,
    cents: list,
    cnorms: list,
    vectorized: bool | None = None,
) -> "callable[[Column, Column], Column]":
    """(vec, vnorm) -> cell expression; literal fold for oracle-scale k,
    batched pandas_udf above ``_LITERAL_MAX_ENTRIES`` plan entries."""
    if _is_vectorized(cents, vectorized):
        udf = _assign_cell_batched(spark, cents, cnorms)
        return lambda vec, vnorm: udf(vec, vnorm)
    return lambda vec, vnorm: _assign_cell(vec, vnorm, cents, cnorms)


def _fold_norm(values) -> float:
    """Bit-exact driver-side twin of ``_norm``: the engine fold is a
    sequential left-to-right double accumulation of x*x followed by
    Math.sqrt — Python floats ARE IEEE doubles and this loop performs
    the identical operations in the identical order (and sqrt is
    correctly rounded on both sides), so the result matches the
    in-engine fold to the last ulp. A numpy norm would NOT (pairwise /
    SIMD summation reorders the adds) — that is the divergence the old
    per-call Spark job (createDataFrame + interpreted fold + collect,
    ~0.3-1.2s, twice per build_index) existed to avoid; this keeps the
    guarantee without the jobs (r6)."""
    import math

    acc = 0.0
    for x in values:
        v = float(x)
        acc = acc + v * v
    return math.sqrt(acc)


def _centroid_norms(spark: SparkSession, cents: list) -> list:
    """Norms via the same accumulation order as every other in-engine
    similarity (see ``_fold_norm``); ``spark`` kept for call-site
    compatibility."""
    return [_fold_norm(c) for c in cents]


def build_index(
    spark: SparkSession,
    emb: DataFrame,
    out: str,
    k_cells: int = 8,
    iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool | None = None,
) -> dict:
    """Write an IVF index: ``{out}/centroids.parquet`` (cell, centroid,
    cnorm) + ``{out}/assignments/cell=C/`` (all input columns + cell).

    Seed centroids are the ``k_cells`` smallest-``id_col`` vectors;
    ``iters`` Lloyd rounds refine them (deterministic, same seed -> same
    index; refined per-dimension means are ROUNDED to ``_SIM_DECIMALS``
    so a refined quantizer stays reproducible across engines — an
    unrounded mean differs in the last ulp between summation orders).
    ``vectorized`` picks the assignment path (None = by k_cells*dim; see
    ``assignment_expr``). Returns {"k_cells", "iters", "n_vectors",
    "assignment"}.
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
        assign = assignment_expr(spark, cents, cnorms, vectorized)
        asg = e.withColumn("cell", assign(F.col("_v"), F.col("_vnorm")))
        # per-dimension means: partial (map-side) agg -> k*dim tiny rows.
        # Rounded IN-ENGINE (F.round = HALF_UP, same as the SQL oracle's
        # round) so a refined quantizer is reproducible across engines —
        # an unrounded mean differs in the last ulp between summation
        # orders, and Python's round() is HALF_EVEN, not HALF_UP.
        means = (
            asg.select("cell", F.posexplode("_v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.round(F.avg("x"), _SIM_DECIMALS).alias("m"))
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
    assign = assignment_expr(spark, cents, cnorms, vectorized)
    assigned = e.withColumn(
        "cell", assign(F.col("_v"), F.col("_vnorm"))
    ).drop("_v", "_vnorm")
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        f"{out}/assignments"
    )
    _write_routing(spark, out, id_col, mode="overwrite")
    return {
        "k_cells": k_cells,
        "iters": iters,
        "n_vectors": _count_rows(f"{out}/assignments"),
        "assignment": (
            "batched" if _is_vectorized(cents, vectorized) else "literal"
        ),
    }


def _write_routing(spark: SparkSession, index: str, id_col: str,
                   mode: str, source: DataFrame | None = None) -> None:
    """(vec_id -> cell) routing sidecar, ``{index}/routing/cell=C/`` with
    files SORTED by vec_id. The warehouse's manifests-routing move applied
    to the index (VERDICT r5 #1): ``forget`` locates the cells that hold
    its ids from this narrow sorted table (row-group stats prune the point
    reads) instead of scanning every cell's assignment files — O(touched),
    not O(index).

    ``source`` defaults to a read-back of the committed assignments (a
    two-column, column-pruned pass). The sortWithinPartitions on
    (cell, id) keeps the write exchange-free — the partitionBy writer's
    required ordering is already satisfied — while making each routing
    file internally id-sorted for stat pruning.
    """
    src = source if source is not None else spark.read.parquet(
        f"{index}/assignments"
    )
    (
        src.select(id_col, "cell")
        .sortWithinPartitions("cell", id_col)
        .write.mode(mode).partitionBy("cell")
        .parquet(f"{index}/routing")
    )


def _count_rows(path: str, **filter_kwargs) -> int:
    """Row count from the parquet FOOTERS (driver-side metadata) — a
    df.count() here would be a second full corpus scan."""
    import pyarrow.dataset as pads

    return pads.dataset(path, format="parquet", partitioning="hive").count_rows(
        **filter_kwargs
    )


def _index_lock(index: str, owner: str):
    """Exclusive index-mutation lock (append racing forget's dynamic
    overwrite would lose the appended rows in rewritten cells). Taken
    when the index is a local path; a remote index only supports the
    Spark-side append, which has nothing to race."""
    import contextlib

    from . import fsutil

    try:
        local = fsutil.require_local(index, "index")
    except ValueError:
        return contextlib.nullcontext()
    return fsutil.exclusive_lock(f"{local}/.index_lock", owner,
                                 "index mutation")


def append_index(
    spark: SparkSession,
    emb_new: DataFrame,
    index: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool | None = None,
) -> dict:
    """Incremental index maintenance: assign NEW vectors with the
    PERSISTED centroids and append them into the cell dirs — no rebuild,
    existing cells' files untouched. The quantizer is whatever
    ``build_index`` committed (seeds or Lloyd-refined), so a probe after
    append sees old + new vectors under one consistent cell geometry.

    At scale this is the streaming-epoch story: each new embedding batch
    is one map-only assignment + a partitioned append (no shuffle beyond
    the partitionBy write), O(batch) not O(corpus). The appended row count
    rides the write via observe() and the total costs ONE footer-metadata
    listing — the before/after double footer scan (VERDICT r5 #2) is gone.
    """
    import os

    from pyspark.sql import Observation

    with _index_lock(index, "append"):
        cents_rows = (
            spark.read.parquet(f"{index}/centroids.parquet")
            .orderBy("cell").collect()
        )
        cents = [list(r["centroid"]) for r in cents_rows]
        cnorms = [r["cnorm"] for r in cents_rows]
        e = (
            emb_new.withColumn("_v", F.col(vec_col).cast("array<double>"))
            .withColumn("_vnorm", _norm(F.col("_v")))
        )
        assign = assignment_expr(spark, cents, cnorms, vectorized)
        assigned = e.withColumn(
            "cell", assign(F.col("_v"), F.col("_vnorm"))
        ).drop("_v", "_vnorm")
        # routing appended FIRST: a crash between the two writes leaves
        # routing a superset of assignments, which forget treats as noise
        # rows (harmless); the reverse order would let a forget MISS the
        # batch's ids. Pre-routing indexes (no sidecar dir) stay without
        # one — a partial sidecar would silently break forget's lookup.
        if os.path.isdir(f"{index.rstrip('/')}" + "/routing"):
            _write_routing(spark, index, id_col, mode="append",
                           source=assigned)
        obs = Observation()
        assigned.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
            "append"
        ).partitionBy("cell").parquet(f"{index}/assignments")
        n_appended = int(obs.get["n"])
        return {
            "n_appended": n_appended,
            "n_vectors": _count_rows(f"{index}/assignments"),
        }


def forget(
    spark: SparkSession,
    index: str,
    ids: list,
    id_col: str = "vec_id",
) -> dict:
    """Delete cascade: drop vectors from the index so a probe never serves
    them again (the GDPR completion of jobs/delete.py — a warehouse delete
    without this leaves the erased ids living on in the ANN index).

    Routed rewrite: only the cells that HOLD the ids are rewritten (the
    id filter is pushed into the parquet scan, so untouched cells prune at
    the row-group level); survivors are staged to a scratch dir first
    (lineage cut — never read-then-overwrite one path in a single lazy
    plan) and swapped in via dynamic partition overwrite. A cell emptied
    entirely has its dir removed. Local-filesystem indexes only (loud
    failure otherwise — see fsutil).
    """
    from . import fsutil

    local = fsutil.require_local(index, "index")
    with fsutil.exclusive_lock(f"{local}/.index_lock", "forget",
                               "index mutation"):
        return _forget_locked(spark, index, local, ids, id_col)


def _routed_hit_cells(index, local, ids, id_col):
    """Cells that can hold ``ids``, from the routing sidecar — a driver
    pyarrow point read over the narrow id-sorted (vec_id, cell) table
    (row-group stats prune), never the assignment payloads. None when the
    sidecar is absent or incomplete (fewer rows than assignments — e.g. a
    pre-routing index appended after the fact): the caller then falls
    back to the full assignments scan, which is always correct."""
    import os

    import pyarrow.dataset as pads

    routing = f"{local}/routing"
    if not os.path.isdir(routing):
        return None
    try:
        d = pads.dataset(routing, format="parquet", partitioning="hive")
        # a crash between append's routing and assignments writes leaves
        # routing a SUPERSET (harmless noise rows); a SUBSET would let a
        # forget miss ids — fall back loudly-correct to the full scan
        if d.count_rows() < _count_rows(f"{index}/assignments"):
            return None
        t = d.to_table(
            columns=[id_col, "cell"], filter=pads.field(id_col).isin(ids)
        )
    except (FileNotFoundError, OSError):
        return None
    return sorted(set(t.column("cell").to_pylist()))


def _forget_locked(spark, index, local, ids, id_col):
    import os

    from . import fsutil

    ids = sorted(set(ids))
    hit_cells = _routed_hit_cells(index, local, ids, id_col)
    if hit_cells is None:  # no/incomplete sidecar: full assignments scan
        asg_all = spark.read.parquet(f"{index}/assignments")
        hit_cells = sorted(
            r["cell"]
            for r in asg_all.filter(F.col(id_col).isin(ids))
            .select("cell")
            .distinct()
            .collect()
        )
    if not hit_cells:
        return {"n_forgotten": 0, "cells_rewritten": [], "cells_emptied": []}
    # only the hit cells' dirs are even LISTED (basePath keeps the cell
    # hive column) — the full-tree filtered read paid the whole index's
    # file listing for a couple of touched cells
    hit_dirs = [
        d for d in (f"{local}/assignments/cell={c}" for c in hit_cells)
        if os.path.isdir(d)
    ]
    if not hit_dirs:  # routing noise rows pointing at removed cells
        return {"n_forgotten": 0, "cells_rewritten": [], "cells_emptied": []}
    touched = spark.read.option(
        "basePath", f"{index}/assignments"
    ).parquet(*hit_dirs)

    staging = f"{local}/.forget_staging"
    fsutil.rmtree_checked(staging)
    kept = touched.filter(~F.col(id_col).isin(ids))
    kept.write.parquet(staging)

    import pyarrow.dataset as pads

    n_touched = _count_rows(
        f"{index}/assignments", filter=pads.field("cell").isin(hit_cells)
    )
    staged = spark.read.parquet(staging)
    n_kept = _count_rows(staging)

    prior = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        staged.write.mode("overwrite").partitionBy("cell").parquet(
            f"{index}/assignments"
        )
    finally:
        if prior is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prior)

    live = {
        r["cell"] for r in staged.select("cell").distinct().collect()
    }
    emptied = sorted(set(hit_cells) - live)
    for c in emptied:
        fsutil.rmtree_checked(f"{local}/assignments/cell={c}")

    # keep the routing sidecar in step: the hit cells' routing dirs
    # rewrite from the same staged survivors (GDPR: the forgotten vec_ids
    # must leave the sidecar too). A crash before this point leaves
    # routing a superset — harmless for lookups, see _routed_hit_cells.
    if os.path.isdir(f"{local}/routing"):
        prior = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", None
        )
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
        try:
            _write_routing(spark, index, id_col, mode="overwrite",
                           source=staged)
        finally:
            if prior is None:
                spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
            else:
                spark.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", prior
                )
        for c in emptied:
            fsutil.rmtree_checked(f"{local}/routing/cell={c}")

    fsutil.rmtree_checked(staging)
    return {
        "n_forgotten": n_touched - n_kept,
        "cells_rewritten": sorted(live & set(hit_cells)),
        "cells_emptied": emptied,
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
    qnorm = _fold_norm(q)  # bit-exact twin of the in-engine fold
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
