"""Streaming incremental encode + multimodal plumbing tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from vcf2df_spark import fixtures, streaming
from vcf2df_spark.decode import decode_blocks
from vcf2df_spark.operators import multimodal


def test_incremental_encode_matches_batch(spark, tmp_path):
    """Two file drops -> stream drains -> decoded union is bit-identical."""
    src = fixtures.transcripts_small(n_convs=300)
    half = len(src) // 2
    indir = tmp_path / "in"
    indir.mkdir()
    fixtures.write_parquet(src.iloc[:half], str(indir / "part1.parquet"))
    fixtures.write_parquet(src.iloc[half:], str(indir / "part2.parquet"))

    wh = str(tmp_path / "wh")
    q = streaming.incremental_encode(
        spark, str(indir), wh, checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    manifests = spark.read.parquet(f"{wh}/manifests").toPandas()
    assert manifests["n_rows"].sum() == len(src)

    decoded = decode_blocks(spark.read.parquet(f"{wh}/blocks")).toPandas()
    assert len(decoded) == len(src)
    l = src.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    r = decoded.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (l["text"].to_numpy() == r["text"].to_numpy()).all()
    lts = l["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    rts = r["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    assert np.array_equal(lts, rts)

    # restart with the same checkpoint: no new data -> no duplicate blocks
    q2 = streaming.incremental_encode(
        spark, str(indir), wh, checkpoint=str(tmp_path / "ckpt")
    )
    q2.awaitTermination(60)
    decoded2 = decode_blocks(spark.read.parquet(f"{wh}/blocks"))
    assert decoded2.count() == len(src)


def test_turn_rate_windows_batch_semantics(spark):
    """Window agg shape check on a static frame (same plan as streaming)."""
    src = spark.createDataFrame(fixtures.transcripts_tiny())
    out = streaming.turn_rate_windows(src.withColumn("ts", F.col("ts").cast("timestamp")))
    pdf = out.toPandas()
    assert set(pdf.columns) == {"window_start", "window_end", "role", "n_turns"}
    assert pdf["n_turns"].sum() == 4


def test_multimodal_features(spark):
    media = multimodal.synthesize_media(spark, n=64)
    feats = multimodal.extract_features(media).toPandas()
    assert len(feats) == 64
    # header magic survives the arrow roundtrip
    img = feats[feats["kind"] == "image"]
    assert (img["header_hex"] == b"\x89PNG\r\n\x1a\n".hex()).all()
    # stub decode is marked, not silently skipped
    assert (~feats["decoded"]).all()
    assert (feats["n_bytes"] > 8).all()
    assert ((feats["byte_entropy"] > 0) & (feats["byte_entropy"] <= 8)).all()


def test_multimodal_stub_raises():
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        multimodal._decode_image(b"\x89PNG")
