"""E2E golden round-trip (SURVEY.md §5.2-3; reference analogue:
converter/convert_test.go:14-50 write->independent-read->compare).

Asserts: (a) exact golden row counts, (b) per-turn text equality under
(conv_id, turn_idx) ordering — the north_rule invariant, (c) all six
columns bit-identical (ts as unix_micros int64), (d) compressed size beats
the zstd-parquet raw-bytes budget on the primary fixture.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from vcf2df_spark import fixtures
from vcf2df_spark.blocks import TRANSCRIPT_COLUMNS
from vcf2df_spark.decode import decode_blocks
from vcf2df_spark.encode import encode_transcripts

GOLDEN_SMALL_ROWS = 25520  # generator-determined, literal like convert_test.go:20
GOLDEN_TINY_ROWS = 4
GOLDEN_SKEW_ROWS = 40520


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    out["ts"] = out["ts"].astype("datetime64[us]").astype("int64")
    return out


def _assert_bit_identical(left: pd.DataFrame, right: pd.DataFrame):
    left, right = _normalize(left), _normalize(right)
    assert len(left) == len(right)
    for col in TRANSCRIPT_COLUMNS:
        lv, rv = left[col].to_numpy(), right[col].to_numpy()
        assert np.array_equal(lv, rv), f"column {col} not bit-identical"


@pytest.mark.parametrize(
    "maker,golden",
    [
        (fixtures.transcripts_small, GOLDEN_SMALL_ROWS),
        (fixtures.transcripts_tiny, GOLDEN_TINY_ROWS),
        (fixtures.transcripts_skew, GOLDEN_SKEW_ROWS),
    ],
    ids=["small", "tiny", "skew"],
)
def test_roundtrip_bit_identical(spark, maker, golden):
    src = maker()
    assert len(src) == golden
    df = spark.createDataFrame(src)
    blocks = encode_transcripts(df, num_partitions=8).cache()
    decoded = decode_blocks(blocks).toPandas()
    assert len(decoded) == golden
    # north_rule invariant: per-turn text equality under stable ordering
    l, r = _normalize(src), _normalize(decoded)
    assert (l["text"].to_numpy() == r["text"].to_numpy()).all()
    _assert_bit_identical(src, decoded)
    blocks.unpersist()


def test_compression_beats_raw_budget(spark, tmp_path):
    src = fixtures.transcripts_small()
    df = spark.createDataFrame(src)
    blocks = encode_transcripts(df, num_partitions=8).toPandas()
    enc_total = int(blocks["enc_bytes"].sum())
    raw_total = int(blocks["raw_bytes"].sum())
    assert enc_total < raw_total, "encoded must beat raw bytes"
    # expected per-column selections under the post-zstd disk objective:
    # the selector measures what actually hits disk after the sink's zstd,
    # so plain-zstd-friendly columns may legitimately pick raw
    sel = blocks.groupby("column")["codec"].agg(lambda s: s.value_counts().idxmax())
    assert sel["role"] == "dict"
    assert sel["tool"] == "dict"
    assert sel["conv_id"] in ("strnum", "rle", "raw")
    assert sel["turn_idx"] in ("fordelta", "bitpack")
    assert sel["ts"] == "fordelta"
    assert sel["text"] in ("fsst", "zstdhi", "raw")


def test_warehouse_beats_zstd_parquet_baseline(spark, tmp_path):
    """North-rule size gate: on-disk blocks+manifests <= same table as
    Parquet/zstd (the reference-equivalent sink, convert.go:60-65)."""
    import os

    from vcf2df_spark import manifest as manifest_mod

    src = fixtures.transcripts_small()
    base_path = str(tmp_path / "baseline.parquet")
    baseline_bytes = fixtures.write_parquet(src, base_path)

    df = spark.createDataFrame(src)
    blocks = encode_transcripts(df, num_partitions=8).cache()
    blocks_path = str(tmp_path / "blocks")
    blocks.write.option("compression", "zstd").parquet(blocks_path)
    manifests = manifest_mod.build_manifests(blocks, "size-test", base_path)
    manifests_path = str(tmp_path / "manifests")
    manifests.write.option("compression", "zstd").parquet(manifests_path)
    blocks.unpersist()

    def du(path):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(path) for f in fs
        )

    ours = du(blocks_path) + du(manifests_path)
    assert ours < baseline_bytes, f"{ours} >= {baseline_bytes}"


def test_skew_partition_balance(spark):
    """Salted repartition bounds partition size despite a mega conversation."""
    from vcf2df_spark.encode import with_partition_key

    src = fixtures.transcripts_skew()
    df = spark.createDataFrame(src)
    sizes = (
        with_partition_key(df, 16).groupBy("_pkey").count().toPandas()["count"]
    )
    assert sizes.max() / sizes.mean() <= 2.0


def test_mega_conversation_splits_across_partitions(spark):
    """The salt key xxhash64(conv_id, turn_idx // 256) must spread a
    30%-of-corpus conversation over many partitions, not one."""
    from pyspark.sql import functions as F

    from vcf2df_spark.encode import with_partition_key

    src = fixtures.transcripts_skew()
    mega = src.conv_id.value_counts().idxmax()
    df = spark.createDataFrame(src[src.conv_id == mega])
    n_parts = (
        with_partition_key(df, 16).select("_pkey").distinct().count()
    )
    assert n_parts >= 8, f"mega conversation landed in only {n_parts} partitions"
