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
    """Block dicts (one per column present) -> reconstructed Arrow chunk.

    Columns absent from ``block_rows`` are skipped — the column-pruned
    decode path ships only the requested columns' blocks to this UDF.
    """
    by_col = {r["column"]: r for r in block_rows}
    n = int(block_rows[0]["n_rows"])
    cols = {}
    for col in TRANSCRIPT_COLUMNS:
        if col not in by_col:
            continue
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
    present = [c for c in TRANSCRIPT_COLUMNS if c in cols]
    schema = pa.schema([_TRANSCRIPT_ARROW_SCHEMA.field(c) for c in present])
    return pa.Table.from_arrays([cols[c] for c in present], schema=schema)


def _decode_group(table: pa.Table) -> pa.Table:
    return decode_chunk_arrow(table.to_pylist())


def decode_blocks(blocks: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """blocks -> transcripts (row order unspecified; sort to compare).

    ``columns`` prunes the decode to the requested columns: only those
    columns' block rows are shuffled and decoded — the columnar read path
    (analogue of ReadSchema pruning at a parquet scan, but over our own
    encoded blocks).
    """
    import pyspark.sql.functions as F
    from pyspark.sql import types as T

    if columns is None:
        out_schema = TRANSCRIPT_SCHEMA
    else:
        order = [c for c in TRANSCRIPT_COLUMNS if c in set(columns)]
        blocks = blocks.filter(F.col("column").isin(order))
        out_schema = T.StructType(
            [TRANSCRIPT_SCHEMA[c] for c in order]
        )
    return blocks.groupBy("partition_id", "chunk_idx").applyInArrow(
        _decode_group, out_schema
    )
