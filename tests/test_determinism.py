"""Determinism contract (reference analogue: lexically-sorted schema so
output is byte-stable and testable, converter/schema.go:99-101): encoding
the same input twice produces byte-identical blocks — same codecs, same
payload bytes, same checksums — regardless of input row order."""

from __future__ import annotations

import pandas as pd

from vcf2df_spark import fixtures
from vcf2df_spark.encode import encode_transcripts
from vcf2df_spark.manifest import build_manifests


def _checksums(spark, pdf):
    blocks = encode_transcripts(spark.createDataFrame(pdf), num_partitions=8)
    m = build_manifests(blocks, "det", "mem").toPandas()
    return m.sort_values("partition_id")[["partition_id", "checksum",
                                          "n_rows", "enc_bytes"]].reset_index(drop=True)


def test_encode_is_deterministic_and_order_independent(spark):
    src = fixtures.transcripts_small(n_convs=200)
    a = _checksums(spark, src)
    b = _checksums(spark, src)
    pd.testing.assert_frame_equal(a, b)
    # shuffle the input rows differently: same bytes must come out
    shuffled = src.sample(frac=1.0, random_state=7).reset_index(drop=True)
    c = _checksums(spark, shuffled)
    pd.testing.assert_frame_equal(a, c)
