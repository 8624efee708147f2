"""Transcript source readers: parquet, JSONL(.gz), CSV — schema-enforced.

The reference's source is a gzipped VCF text stream
(``converter/convert.go:42``, ``vcfio.ReadNewVcf``); the modern transcript
interchange equivalents are gzip JSONL and CSV exports next to columnar
parquet. Every reader funnels through ``normalize_input`` so downstream
code sees exactly the six engine columns with a UTC TIMESTAMP ``ts``.

Scale note: like gzip VCF, a ``.jsonl.gz`` file is non-splittable — one
task per file. That is acceptable for ingest-once conversion (the
reference's whole job) but the engine immediately repartitions by content
hash, so the non-splittable read never constrains the encode parallelism
beyond the file count. Land many moderate files, not one giant one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .blocks import TRANSCRIPT_SCHEMA
from .encode import normalize_input

_JSON_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts string"
)


def read_transcripts(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Load a transcript table from ``path`` in the given format."""
    if fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt in ("json", "jsonl"):
        # ts carried as ISO-8601 string in JSONL; parsed below
        df = spark.read.schema(_JSON_SCHEMA).json(path)
        df = df.withColumn("ts", F.to_timestamp("ts"))
    elif fmt == "csv":
        df = (
            spark.read.option("header", "true")
            .schema(TRANSCRIPT_SCHEMA)
            .csv(path)
        )
    else:
        raise ValueError(f"unsupported transcript format: {fmt}")
    return normalize_input(df)
