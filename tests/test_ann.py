"""Persisted IVF ANN index (vcf2df_spark/ann.py + jobs/index.py): build,
probe, determinism, and the partition-pruned probe plan."""

from __future__ import annotations

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from vcf2df_spark import ann


def _emb_df(spark, n=40, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    rows = [(int(i), [float(x) for x in vecs[i]], int(i % 3)) for i in range(n)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ), vecs


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ann") / "idx")
    emb, vecs = _emb_df(spark)
    info = ann.build_index(spark, emb, root, k_cells=4, iters=0)
    assert info["n_vectors"] == 40 and info["k_cells"] == 4
    return root, emb, vecs


def test_layout_and_total_coverage(spark, idx):
    root, emb, _ = idx
    cents = spark.read.parquet(f"{root}/centroids.parquet").collect()
    assert sorted(r["cell"] for r in cents) == [0, 1, 2, 3]
    asg = spark.read.parquet(f"{root}/assignments")
    assert asg.count() == emb.count()  # every vector lands in exactly one cell
    assert asg.select("vec_id").distinct().count() == emb.count()
    # label (an arbitrary extra column) rides along into the index
    assert "label" in asg.columns


def test_probe_matches_bruteforce_within_cells(spark, idx):
    """The probe is EXACT within the probed cells: recompute with numpy
    over the same cell membership and compare ids + cosines."""
    root, _, vecs = idx
    q = vecs[0].astype(np.float64)
    got = ann.probe(spark, root, q, top_k=5, nprobe=2, exclude_id=0).collect()
    assert len(got) == 5

    asg = spark.read.parquet(f"{root}/assignments").select("vec_id", "cell")
    cell_of = {r["vec_id"]: r["cell"] for r in asg.collect()}
    probed = {r["cell"] for r in got}
    assert len(probed) <= 2
    # brute force within the probed cells
    cands = [
        i for i, c in cell_of.items() if c in probed and i != 0
    ]
    sims = {
        i: float(
            np.dot(vecs[i].astype(np.float64), q)
            / (np.linalg.norm(vecs[i].astype(np.float64)) * np.linalg.norm(q))
        )
        for i in cands
    }
    want = sorted(sims, key=lambda i: (-round(sims[i], 3), i))[:5]
    assert [r["vec_id"] for r in got] == want
    for r in got:
        assert abs(r["cosine"] - round(sims[r["vec_id"]], 3)) <= 1e-9


def test_probe_plan_is_partition_pruned(spark, idx):
    """Only the nprobe probed cells' hive dirs are scanned: the plan's
    PartitionFilters carries the cell IN (...) predicate."""
    root, _, vecs = idx
    df = ann.probe(spark, root, vecs[0], top_k=3, nprobe=2)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and "cell" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan[:2000]
    # and the top-k is a TakeOrderedAndProject, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_lloyd_refinement_deterministic(spark, tmp_path):
    emb, _ = _emb_df(spark, n=60)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    ann.build_index(spark, emb, a, k_cells=4, iters=2)
    ann.build_index(spark, emb, b, k_cells=4, iters=2)
    ca = spark.read.parquet(f"{a}/centroids.parquet").orderBy("cell").collect()
    cb = spark.read.parquet(f"{b}/centroids.parquet").orderBy("cell").collect()
    assert [r["centroid"] for r in ca] == [r["centroid"] for r in cb]
    # refinement actually moved the centroids off the seeds
    seeds = emb.orderBy("vec_id").limit(4).select(
        F.col("embedding").cast("array<double>")
    ).collect()
    assert [r["centroid"] for r in ca] != [r[0] for r in seeds]


def test_build_rejects_tiny_corpus(spark):
    emb, _ = _emb_df(spark, n=3)
    with pytest.raises(ValueError, match="seed"):
        ann.build_index(spark, emb, "/tmp/never-written", k_cells=8)


def test_index_job_cli(spark, tmp_path, capsys):
    import jobs.index as index_job

    emb, _ = _emb_df(spark, n=30)
    src = str(tmp_path / "emb.parquet")
    emb.write.parquet(src)
    out = str(tmp_path / "jidx")
    index_job.main([
        "--embeddings", src, "--out", out,
        "--k-cells", "4", "--iters", "1",
        "--probe-vec-id", "5", "--top-k", "3", "--nprobe", "2",
    ])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["status"] == "ok" and rec["n_vectors"] == 30
    ns = rec["probe"]["neighbors"]
    assert len(ns) == 3 and all(n["vec_id"] != 5 for n in ns)
    cosines = [n["cosine"] for n in ns]
    assert cosines == sorted(cosines, reverse=True)
