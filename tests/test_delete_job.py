"""jobs/delete.py: targeted conversation deletion via manifests routing."""

from __future__ import annotations

import contextlib
import io
import json

import pytest
from pyspark.sql import functions as F

import jobs.delete as delete_job
import jobs.encode as encode_job
from vcf2df_spark import fixtures
from vcf2df_spark.datasource import read_warehouse
from vcf2df_spark.scan import fetch_conversation


def _run(main, argv):
    out = io.StringIO()
    code = 0
    with contextlib.redirect_stdout(out):
        try:
            main(argv)
        except SystemExit as e:
            code = e.code or 0
    lines = [json.loads(l) for l in out.getvalue().strip().splitlines() if l]
    return code, lines[-1]


@pytest.fixture()
def wh(spark, tmp_path):
    src = tmp_path / "src.parquet"
    fixtures.write_parquet(fixtures.transcripts_small(n_convs=60), str(src))
    root = str(tmp_path / "dwh")
    code, rec = _run(encode_job.main, [
        "--input", str(src), "--out", root, "--partitions", "8",
        "--job-id", "d0", "--master", "local[4]",
    ])
    assert code == 0 and rec["status"] == "ok"
    return root


def test_delete_conversation(spark, wh):
    full = read_warehouse(spark, wh)
    cid = full.select("conv_id").first()[0]
    n_total = full.count()
    n_conv = full.filter(F.col("conv_id") == cid).count()
    assert n_conv > 0
    # survivors captured BEFORE the rewrite (the lazy plan would otherwise
    # re-read the rewritten warehouse and compare it to itself)
    want = (
        full.filter(F.col("conv_id") != cid)
        .orderBy("conv_id", "turn_idx").collect()
    )

    code, rec = _run(delete_job.main, [
        "--warehouse", wh, "--conv-id", cid, "--master", "local[4]",
    ])
    assert code == 0 and rec["status"] == "ok"
    assert rec["rows_deleted"] == n_conv
    assert rec["partitions_rewritten"], rec

    # gone from every read surface; everything else intact bit-for-bit
    after = read_warehouse(spark, wh)
    assert after.filter(F.col("conv_id") == cid).count() == 0
    assert after.count() == n_total - n_conv
    assert len(fetch_conversation(spark, wh, cid)) == 0

    got = after.orderBy("conv_id", "turn_idx").collect()
    assert got == want

    # manifests invariant: one committed row per partition, no stale pids
    m = spark.read.parquet(f"{wh}/manifests").toPandas()
    assert m["partition_id"].is_unique
    assert int(m["n_rows"].sum()) == n_total - n_conv

    # repeat delete: noop
    code, rec = _run(delete_job.main, [
        "--warehouse", wh, "--conv-id", cid, "--master", "local[4]",
    ])
    assert code == 0 and rec["status"] == "noop" and rec["rows_deleted"] == 0


def test_delete_requires_routing(spark, tmp_path):
    """A warehouse without routing metadata fails loudly, never scans."""
    from vcf2df_spark import manifest
    from vcf2df_spark.encode import encode_transcripts, normalize_input

    src = normalize_input(
        spark.createDataFrame(fixtures.transcripts_small(n_convs=10))
    )
    root = str(tmp_path / "nrwh")
    blocks = encode_transcripts(src, num_partitions=2)
    blocks.write.partitionBy("partition_id").parquet(f"{root}/blocks")
    manifest.build_manifests(blocks, "j", "mem").write.parquet(
        f"{root}/manifests"
    )  # no num_partitions on record
    code, rec = _run(delete_job.main, [
        "--warehouse", root, "--conv-id", "conv-00000001",
        "--master", "local[4]",
    ])
    assert code == 2 and rec["status"] == "error"
    assert "routing" in rec["error"] or "num_partitions" in rec["error"]


def test_batch_delete(spark, wh):
    """Several conversations in ONE routed rewrite (union of routes)."""
    full = read_warehouse(spark, wh)
    cids = [r[0] for r in
            full.select("conv_id").distinct().orderBy("conv_id").take(3)]
    n_total = full.count()
    n_del = full.filter(F.col("conv_id").isin(cids)).count()
    assert n_del > 0

    argv = ["--warehouse", wh, "--master", "local[4]"]
    for c in cids:
        argv += ["--conv-id", c]
    code, rec = _run(delete_job.main, argv)
    assert code == 0 and rec["status"] == "ok"
    assert rec["rows_deleted"] == n_del

    after = read_warehouse(spark, wh)
    assert after.filter(F.col("conv_id").isin(cids)).count() == 0
    assert after.count() == n_total - n_del
    m = spark.read.parquet(f"{wh}/manifests").toPandas()
    assert m["partition_id"].is_unique
    assert int(m["n_rows"].sum()) == n_total - n_del


def test_delete_on_sharded_layout(spark, tmp_path):
    """The two-level shard=N/partition_id=M layout: the delete rewrites the
    correct shard subdirs and the routed lookup stays consistent."""
    src = tmp_path / "ssrc.parquet"
    fixtures.write_parquet(fixtures.transcripts_small(n_convs=60), str(src))
    wh = str(tmp_path / "swh")
    code, rec = _run(encode_job.main, [
        "--input", str(src), "--out", wh, "--partitions", "8",
        "--shard-dirs", "2", "--job-id", "sd", "--master", "local[4]",
    ])
    assert code == 0

    full = read_warehouse(spark, wh)
    cid = full.select("conv_id").first()[0]
    n_total = full.count()
    n_conv = full.filter(F.col("conv_id") == cid).count()

    code, rec = _run(delete_job.main, [
        "--warehouse", wh, "--conv-id", cid, "--master", "local[4]",
    ])
    assert code == 0 and rec["status"] == "ok"
    assert rec["rows_deleted"] == n_conv > 0

    after = read_warehouse(spark, wh)
    assert after.count() == n_total - n_conv
    assert after.filter(F.col("conv_id") == cid).count() == 0
    assert len(fetch_conversation(spark, wh, cid)) == 0
    # layout invariant intact: rewritten dirs stayed under their shards
    import os

    for shard in os.listdir(f"{wh}/blocks"):
        assert shard.startswith("shard=")
        s = int(shard.split("=")[1])
        for pd_dir in os.listdir(f"{wh}/blocks/{shard}"):
            assert int(pd_dir.split("=")[1]) % 2 == s
