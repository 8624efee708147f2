"""Compaction: streaming epoch warehouse -> batch-shaped warehouse.

Two epochs of micro-batch-sized chunks compact into one hash-partitioned
64k-chunk warehouse with routing manifests; content is bit-preserved and
the compacted warehouse serves routed point lookups.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from jobs import compact
from vcf2df_spark import datasource, fixtures, scan
from vcf2df_spark.encode import encode_transcripts, normalize_input


def _stream_wh(spark, tmp_path) -> tuple[str, int]:
    root = str(tmp_path / "swh")
    total = 0
    for epoch in (0, 1):
        pdf = fixtures.transcripts_small(n_convs=40, seed=11 + epoch)
        pdf["conv_id"] = f"e{epoch}-" + pdf["conv_id"]
        total += len(pdf)
        src = normalize_input(spark.createDataFrame(pdf))
        encode_transcripts(src, num_partitions=2, chunk_rows=64).write.parquet(
            f"{root}/blocks/epoch={epoch}"
        )
    return root, total


def test_compact_epoch_warehouse(spark, tmp_path, capsys):
    wh, total = _stream_wh(spark, tmp_path)
    out = str(tmp_path / "cwh")
    compact.main(["--warehouse", wh, "--out", out, "--partitions", "4"])
    verdict = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert verdict["status"] == "ok"
    assert verdict["rows"] == total
    assert verdict["chunks_after"] < verdict["chunks_before"], (
        "64-row epoch chunks must merge into fewer batch-shaped chunks"
    )

    want = (
        datasource.read_warehouse(spark, wh)
        .orderBy("conv_id", "turn_idx")
        .collect()
    )
    got = (
        datasource.read_warehouse(spark, out)
        .orderBy("conv_id", "turn_idx")
        .collect()
    )
    assert got == want and len(got) == total

    # routed point lookup works against the compacted warehouse
    target = want[len(want) // 2].conv_id
    pids = scan._manifest_conv_partitions(out, target)
    assert pids is not None and len(pids) == 1
    hit = scan.fetch_conversation(spark, out, target)
    assert len(hit) == sum(1 for r in want if r.conv_id == target) > 0

    # refuses to overwrite an existing output warehouse
    try:
        compact.main(["--warehouse", wh, "--out", out, "--partitions", "4"])
        raised = False
    except SystemExit as e:
        raised = e.code == 2
    assert raised


def test_compact_retention_sweep(spark, tmp_path, capsys):
    """--drop-where ages out rows by SQL predicate during the compaction
    rewrite; survivors are bit-identical and the deleted count is
    reported from block metadata (no extra decode pass)."""
    wh, total = _stream_wh(spark, tmp_path)
    cutoff = (
        datasource.read_warehouse(spark, wh)
        .selectExpr("percentile_approx(ts, 0.5) AS c").collect()[0]["c"]
    )
    pred = f"ts < timestamp'{cutoff}'"
    want = (
        datasource.read_warehouse(spark, wh)
        .filter(f"NOT ({pred})")
        .orderBy("conv_id", "turn_idx")
        .collect()
    )
    assert 0 < len(want) < total

    out = str(tmp_path / "rwh")
    compact.main(["--warehouse", wh, "--out", out, "--partitions", "4",
                  "--drop-where", pred])
    verdict = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert verdict["status"] == "ok"
    assert verdict["rows"] == len(want)
    assert verdict["rows_deleted"] == total - len(want)

    got = (
        datasource.read_warehouse(spark, out)
        .orderBy("conv_id", "turn_idx").collect()
    )
    assert got == want
