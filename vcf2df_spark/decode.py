"""Distributed decode: encoded blocks DataFrame -> transcripts DataFrame.

The independent-reader half of the round-trip contract (reference analogue:
``readParquet`` re-opening the output with a second reader,
``converter/convert_test.go:63-97``). Groups the six column blocks of each
(partition, chunk) and reverses the codec kernels; bit-identical by the
codec contract, verified in tests by per-turn ``text`` equality and full
column comparison under stable (conv_id, turn_idx) ordering.

Arrow-native like the encode path: string columns are rebuilt directly
from (utf8 buffer, offsets) with no per-row Python.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame

from . import arrow_ops, codecs
from .blocks import TRANSCRIPT_SCHEMA, TRANSCRIPT_COLUMNS

_STRING_COLS = ("conv_id", "role", "text", "tool")

_TRANSCRIPT_ARROW_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us", tz="UTC")),
    ]
)


def decode_chunk_arrow(block_rows: list[dict]) -> pa.Table:
    """Six block dicts (one per column) -> reconstructed Arrow chunk."""
    by_col = {r["column"]: r for r in block_rows}
    n = int(block_rows[0]["n_rows"])
    cols = {}
    for col in TRANSCRIPT_COLUMNS:
        r = by_col[col]
        payload = bytes(r["payload"] or b"")
        aux = bytes(r["aux"] or b"")
        meta = json.loads(r["meta"])
        if col in _STRING_COLS:
            arr = arrow_ops.decode_string_column(r["codec"], payload, aux, meta, n)
            if pa.types.is_large_string(arr.type):
                arr = arr.cast(pa.string())
            cols[col] = arr
        else:
            values = codecs.decode(r["codec"], payload, aux, meta, n)
            if col == "turn_idx":
                cols[col] = pa.array(np.asarray(values, dtype=np.int32), type=pa.int32())
            else:  # ts
                cols[col] = pa.array(
                    np.asarray(values, dtype=np.int64)
                ).cast(pa.timestamp("us", tz="UTC"))
    return pa.Table.from_arrays(
        [cols[c] for c in TRANSCRIPT_COLUMNS], schema=_TRANSCRIPT_ARROW_SCHEMA
    )


def _decode_group(table: pa.Table) -> pa.Table:
    return decode_chunk_arrow(table.to_pylist())


def decode_blocks(blocks: DataFrame) -> DataFrame:
    """blocks -> transcripts (row order unspecified; sort to compare)."""
    return blocks.groupBy("partition_id", "chunk_idx").applyInArrow(
        _decode_group, TRANSCRIPT_SCHEMA
    )
