"""Manifest aggregation edge cases.

Regression: per-chunk measured codec selection can pick DIFFERENT codecs
for the same column across chunks of one partition (dict vs rle flips,
zstdhi's >=1MB gate excluding a small tail chunk). The codecs field must
tolerate that — a column->codec MAP threw DUPLICATED_MAP_KEY and crashed
the encode job after blocks were written but before the manifest commit,
making every resume retry fail identically.
"""

from __future__ import annotations

import json

from vcf2df_spark import manifest
from vcf2df_spark.blocks import BLOCKS_SCHEMA


def _block(pid, chunk, column, codec, n_rows=10):
    return (pid, chunk, column, codec, n_rows, b"payload", b"", "{}",
            100, 50, None, None, None, None)


def test_build_manifests_multi_codec_per_column(spark):
    rows = [
        _block(0, 0, "conv_id", "rle"),
        _block(0, 1, "conv_id", "dict"),   # same column, different codec
        _block(0, 0, "text", "fsst"),
        _block(0, 1, "text", "raw"),       # same column, different codec
        _block(1, 0, "conv_id", "rle"),
        _block(1, 0, "text", "zstdhi"),
    ]
    blocks = spark.createDataFrame(rows, BLOCKS_SCHEMA)
    m = manifest.build_manifests(blocks, "t", "src").toPandas()
    m = m.set_index("partition_id").sort_index()

    assert json.loads(m.loc[0, "codecs"]) == [
        "conv_id:dict", "conv_id:rle", "text:fsst", "text:raw",
    ]
    assert json.loads(m.loc[1, "codecs"]) == ["conv_id:rle", "text:zstdhi"]
    # self-describing output: per-column data dictionary rides the manifest
    desc = json.loads(m.loc[0, "column_desc"])
    assert desc["conv_id"] == manifest.CORE_DESCRIPTIONS["conv_id"]
    assert desc["text"] == manifest.CORE_DESCRIPTIONS["text"]
    # n_rows counts the designated column's rows, not sum-over-all/6
    assert m.loc[0, "n_rows"] == 20  # two conv_id chunks of 10
    assert m.loc[1, "n_rows"] == 10
    assert (m["status"] == "committed").all()


def test_build_manifests_column_pruned_blocks(spark):
    # a pruned blocks frame (text only, no conv_id) must not mis-report
    # n_rows; with no designated-column blocks the count is null -> 0 clamp
    rows = [_block(0, 0, "conv_id", "rle", n_rows=7),
            _block(0, 0, "text", "raw", n_rows=7),
            _block(0, 1, "conv_id", "rle", n_rows=3),
            _block(0, 1, "text", "raw", n_rows=3)]
    blocks = spark.createDataFrame(rows, BLOCKS_SCHEMA)
    m = manifest.build_manifests(blocks, "t", "src").toPandas()
    assert m.loc[0, "n_rows"] == 10
