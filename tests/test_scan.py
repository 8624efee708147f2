"""Zone-map chunk pruning + column-pruned decode tests."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from vcf2df_spark import fixtures, scan
from vcf2df_spark.decode import decode_blocks
from vcf2df_spark.encode import encode_transcripts


def _warehouse(spark, tmp_path):
    # small chunks -> many sorted chunks per partition -> zone maps can
    # prune within each hash partition (at production scale 64k-row chunks
    # play the same role inside multi-GB partitions)
    src = fixtures.transcripts_small(n_convs=500)
    blocks = encode_transcripts(
        spark.createDataFrame(src), num_partitions=4, chunk_rows=256
    )
    path = str(tmp_path / "wh")
    blocks.write.parquet(f"{path}/blocks")
    return src, path


def test_conv_id_range_scan_prunes_and_matches(spark, tmp_path):
    src, wh = _warehouse(spark, tmp_path)
    blocks = spark.read.parquet(f"{wh}/blocks")
    total_chunks = blocks.select("partition_id", "chunk_idx").distinct().count()

    rng = ("conv-00000100", "conv-00000120")
    qual = scan.qualifying_chunks(blocks, conv_id_range=rng).count()
    assert qual < total_chunks, "zone maps must prune some chunks"

    got = (
        scan.scan_transcripts(spark, wh, conv_id_range=rng)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        src[(src.conv_id >= rng[0]) & (src.conv_id <= rng[1])]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert (got["text"].to_numpy() == want["text"].to_numpy()).all()


def test_ts_range_scan_matches(spark, tmp_path):
    src, wh = _warehouse(spark, tmp_path)
    lo = pd.Timestamp("2026-03-01")
    hi = pd.Timestamp("2026-03-15")
    got = scan.scan_transcripts(
        spark, wh, columns=["conv_id", "turn_idx", "ts"],
        ts_range=(lo.to_pydatetime(), hi.to_pydatetime()),
    ).toPandas()
    src_us = src["ts"].astype("datetime64[us]").astype("int64")
    mask = (src_us >= lo.value // 1000) & (src_us <= hi.value // 1000)
    assert len(got) == int(mask.sum()) > 0
    assert list(got.columns) == ["conv_id", "turn_idx", "ts"]


def test_column_pruned_decode(spark, tmp_path):
    src, wh = _warehouse(spark, tmp_path)
    blocks = spark.read.parquet(f"{wh}/blocks")
    out = decode_blocks(blocks, columns=["conv_id", "role"])
    pdf = out.toPandas()
    assert list(pdf.columns) == ["conv_id", "role"]
    assert len(pdf) == len(src)
    # pruned plan shuffles only the requested columns' block rows
    assert (
        blocks.filter(F.col("column").isin(["conv_id", "role"])).count()
        == blocks.count() // 3
    )


def test_turn_idx_pruning(spark, tmp_path):
    src, wh = _warehouse(spark, tmp_path)
    got = scan.scan_transcripts(
        spark, wh, columns=["conv_id", "turn_idx"], turn_idx_range=(150, None)
    ).toPandas()
    want = src[src.turn_idx >= 150]
    assert len(got) == len(want)


def test_sql_view_over_encoded_warehouse(spark, tmp_path):
    src, wh = _warehouse(spark, tmp_path)
    scan.register_transcript_view(spark, wh, "t_view")
    out = spark.sql(
        "SELECT role, count(*) AS n FROM t_view GROUP BY role"
    ).toPandas().set_index("role")["n"]
    want = src.groupby("role").size()
    assert out.sort_index().equals(want.sort_index())


def test_fetch_conversation_point_lookup(spark, tmp_path):
    src, wh = _warehouse(spark, tmp_path)
    target = "conv-00000042"
    got = scan.fetch_conversation(spark, wh, target)
    want = (
        src[src.conv_id == target]
        .sort_values("turn_idx")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert (got["text"].to_numpy() == want["text"].to_numpy()).all()
    assert (got["turn_idx"].to_numpy() == want["turn_idx"].to_numpy()).all()
    gts = got["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    wts = want["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    assert (gts == wts).all()
    # missing conversation -> empty frame, not an error
    assert len(scan.fetch_conversation(spark, wh, "conv-99999999")) == 0
