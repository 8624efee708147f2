"""Distributed decode: encoded blocks DataFrame -> transcripts DataFrame.

The independent-reader half of the round-trip contract (reference analogue:
``readParquet`` re-opening the output with a second reader,
``converter/convert_test.go:63-97``). Groups the six column blocks of each
(partition, chunk) and reverses the codec kernels; bit-identical by the
codec contract, verified in tests by per-turn ``text`` equality and full
column comparison under stable (conv_id, turn_idx) ordering.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from . import codecs
from .blocks import TRANSCRIPT_SCHEMA, TRANSCRIPT_COLUMNS


def decode_chunk(block_rows: pd.DataFrame) -> pd.DataFrame:
    """Six block rows (one per column) -> reconstructed chunk."""
    cols = {}
    n = int(block_rows["n_rows"].iloc[0])
    for _, row in block_rows.iterrows():
        values = codecs.decode(
            row["codec"],
            bytes(row["payload"] or b""),
            bytes(row["aux"] or b""),
            json.loads(row["meta"]),
            n,
        )
        col = row["column"]
        if col == "ts":
            values = pd.to_datetime(np.asarray(values, dtype=np.int64), unit="us")
        elif col == "turn_idx":
            values = np.asarray(values, dtype=np.int32)
        cols[col] = values
    return pd.DataFrame({c: cols[c] for c in TRANSCRIPT_COLUMNS})


def _decode_group(pdf: pd.DataFrame) -> pd.DataFrame:
    return decode_chunk(pdf)


def decode_blocks(blocks: DataFrame) -> DataFrame:
    """blocks -> transcripts (row order unspecified; sort to compare)."""
    return blocks.groupBy("partition_id", "chunk_idx").applyInPandas(
        _decode_group, TRANSCRIPT_SCHEMA
    )
