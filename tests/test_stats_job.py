"""jobs/stats.py: the no-Spark ANALYZE over the manifests commit log."""

from __future__ import annotations

import json

from vcf2df_spark import fixtures, manifest
from vcf2df_spark.encode import encode_transcripts, normalize_input


def test_stats_summary(spark, tmp_path, capsys):
    import jobs.stats as stats_job

    src = normalize_input(
        spark.createDataFrame(fixtures.transcripts_small(n_convs=60))
    )
    wh = str(tmp_path / "swh")
    blocks = encode_transcripts(src, num_partitions=4)
    blocks.write.partitionBy("partition_id").parquet(f"{wh}/blocks")
    manifest.build_manifests(blocks, "statjob", "mem", num_partitions=4).write.parquet(
        f"{wh}/manifests"
    )

    stats_job.main(["--warehouse", wh])
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["status"] == "ok"
    assert rec["partitions"] == 4
    assert rec["n_rows"] == src.count()
    assert rec["schema"]["text"] == "str" and rec["schema"]["turn_idx"] == "i32"
    assert rec["compression_ratio"] > 0
    assert any(k.startswith("role:") for k in rec["codec_partitions"])
    assert rec["jobs"] == ["statjob"]
    # wall time is driver-side metadata only — no Spark job ran; the
    # SparkSession in this test exists only to build the fixture warehouse


def test_stats_empty_warehouse(tmp_path, capsys):
    import pytest

    import jobs.stats as stats_job

    with pytest.raises(SystemExit):
        stats_job.main(["--warehouse", str(tmp_path / "nope")])
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["status"] == "error"


def test_stats_epoch_warehouse_counts_block_dirs(spark, tmp_path, capsys):
    """Streaming warehouses: the block identity is (partition_id, epoch),
    so 'partitions' must count the physical epoch dirs, not collapse the
    same pid committed in N epochs into one (ADVICE r4)."""
    import jobs.stats as stats_job

    src = normalize_input(
        spark.createDataFrame(fixtures.transcripts_small(n_convs=20))
    )
    wh = str(tmp_path / "ewh")
    blocks = encode_transcripts(src, num_partitions=2)
    for epoch in (0, 1):
        blocks.write.partitionBy("partition_id").parquet(
            f"{wh}/blocks/epoch={epoch}"
        )
        manifest.build_manifests(
            blocks, f"sjob-epoch{epoch}", "mem", num_partitions=2
        ).write.parquet(f"{wh}/manifests/epoch={epoch}")

    stats_job.main(["--warehouse", wh])
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["status"] == "ok"
    assert rec["partitions"] == 4  # 2 pids x 2 epochs
    assert rec["epochs"] == [0, 1]
    assert rec["n_rows"] == 2 * src.count()
