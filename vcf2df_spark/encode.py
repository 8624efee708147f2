"""Distributed encode: transcripts DataFrame -> encoded blocks DataFrame.

The Spark re-imagination of the reference's single-threaded convert loop
(``converter/convert.go:67-98``): the per-row parse/format pipeline becomes
a declarative plan — salted repartition (skew defusal), stable in-partition
sort (the determinism contract the reference got from coordinate-sorted
input + lexical schema order, ``converter/schema.go:99-100``), then one
Arrow-vectorized ``applyInPandas`` that pivots each partition's columns
through the stats-driven codec kernels. No per-row Python anywhere.

Scale design (100 TB / 1000 executors):
- the only shuffle is the salted repartition by
  ``xxhash64(conv_id, turn_idx // TURNS_PER_SPLIT) % num_partitions``;
  mega-conversations split across partitions at TURNS_PER_SPLIT boundaries,
  so no single task inherits a whole skewed conversation;
- partition count is a parameter: size so each group ~ a few hundred MB;
- chunking inside the UDF (CHUNK_ROWS) bounds peak memory per task
  regardless of group size;
- output blocks are small (compressed) — the write is cheap and columnar.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import planner
from .blocks import BLOCKS_SCHEMA, TRANSCRIPT_COLUMNS

TURNS_PER_SPLIT = 256  # conversations longer than this are split across partitions
CHUNK_ROWS = 65536


def _ts_to_micros(series: pd.Series) -> np.ndarray:
    return series.astype("datetime64[us]").astype("int64")


def encode_chunk(chunk: pd.DataFrame, partition_id: int, chunk_idx: int) -> list[dict]:
    """Encode one sorted chunk: six column blocks (pure numpy kernels)."""
    rows = []
    n = len(chunk)
    for col in TRANSCRIPT_COLUMNS:
        if col == "ts":
            values = _ts_to_micros(chunk[col])
        elif col == "turn_idx":
            values = chunk[col].to_numpy()
        else:
            values = chunk[col].to_numpy(dtype=object)
        codec, payload, aux, meta, raw_bytes = planner.encode_best(values)
        rows.append(
            {
                "partition_id": partition_id,
                "chunk_idx": chunk_idx,
                "column": col,
                "codec": codec,
                "n_rows": n,
                "payload": payload,
                "aux": aux,
                "meta": json.dumps(meta, separators=(",", ":")),
                "raw_bytes": int(raw_bytes),
                "enc_bytes": len(payload) + len(aux),
            }
        )
    return rows


def _encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
    partition_id = int(pdf["_pkey"].iloc[0])
    pdf = pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    out: list[dict] = []
    for chunk_idx, lo in enumerate(range(0, len(pdf), CHUNK_ROWS)):
        out.extend(encode_chunk(pdf.iloc[lo : lo + CHUNK_ROWS], partition_id, chunk_idx))
    return pd.DataFrame(out)


def with_partition_key(df: DataFrame, num_partitions: int) -> DataFrame:
    """Salted deterministic partition key; splits skewed conversations."""
    return df.withColumn(
        "_pkey",
        F.pmod(
            F.xxhash64("conv_id", (F.col("turn_idx") / F.lit(TURNS_PER_SPLIT)).cast("int")),
            F.lit(num_partitions),
        ).cast("int"),
    )


def normalize_input(df: DataFrame) -> DataFrame:
    """Project the 6 engine columns; unify ts to TIMESTAMP (LTZ, UTC session).

    Parquet written without tz info reads back as TIMESTAMP_NTZ; with the
    session timezone pinned to UTC (session.py) the cast is value-identical,
    so bit-identity on unix_micros is preserved in both directions.
    """
    return df.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        "role", "text", "tool",
        F.col("ts").cast("timestamp").alias("ts"),
    )


def encode_transcripts(df: DataFrame, num_partitions: int = 32) -> DataFrame:
    """transcripts -> blocks. One shuffle (groupBy _pkey); Arrow-vectorized."""
    keyed = with_partition_key(normalize_input(df), num_partitions)
    return keyed.groupBy("_pkey").applyInPandas(_encode_group, BLOCKS_SCHEMA)
