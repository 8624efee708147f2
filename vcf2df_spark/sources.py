"""Transcript source readers: parquet, ORC, JSONL(.gz), CSV/TSV — dynamic schema.

The reference's source is a gzipped VCF text stream whose *output schema is
computed per input file* from header metadata (``converter/convert.go:42``,
``converter/schema.go:17-107``: 16 fixed columns + one typed column per
``##INFO`` declaration). The engine mirrors that for its text sources: the
six core columns are required, and any extra columns the file carries are
discovered (Spark schema inference = the header-read analogue for
schema-less text), typed, and funneled through ``normalize_input`` exactly
like the parquet path — so a jsonl.gz or csv export with extra columns
round-trips them instead of silently dropping them.

Scale note: like gzip VCF, a ``.jsonl.gz`` file is non-splittable — one
task per file. That is acceptable for ingest-once conversion (the
reference's whole job) but the engine immediately repartitions by content
hash, so the non-splittable read never constrains the encode parallelism
beyond the file count. Land many moderate files, not one giant one.
Schema inference costs one extra pass over the text input; pass ``schema``
explicitly to skip it when the layout is known.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .blocks import TRANSCRIPT_COLUMNS
from .encode import normalize_input


def _require_core(df: DataFrame, path: str) -> None:
    """Fail fast (S2 source validation, ``fileTools.go:21-29`` analogue)
    when a source lacks any of the six core transcript columns."""
    missing = [c for c in TRANSCRIPT_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(
            f"source {path} is missing core transcript columns {missing}; "
            f"found {df.columns}"
        )


def _parse_ts(df: DataFrame) -> DataFrame:
    """Text sources carry ``ts`` as an ISO-8601 string; parse it. A source
    whose inference already yielded a timestamp passes through."""
    if isinstance(df.schema["ts"].dataType, T.StringType):
        df = df.withColumn("ts", F.to_timestamp("ts"))
    return df


def read_transcripts(
    spark: SparkSession, path: str, fmt: str = "parquet", schema=None
) -> DataFrame:
    """Load a transcript table from ``path`` in the given format.

    ``schema`` (optional, jsonl/csv): explicit input schema; when omitted
    the schema is inferred from the data — the dynamic-schema move the
    reference makes from the VCF header (``schema.go:17-107``). Extra
    columns beyond the core six flow through ``normalize_input`` (typed
    zero-defaults, lexical order, unsupported shapes dropped).
    """
    if fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt == "orc":
        # the other schema-carrying columnar landing format Spark ships
        # with; same typed path as parquet (no inference pass needed)
        df = spark.read.orc(path)
    elif fmt in ("json", "jsonl"):
        if schema is not None:
            df = spark.read.schema(schema).json(path)
        else:
            df = spark.read.json(path)
        _require_core(df, path)
        df = _parse_ts(df)
    elif fmt in ("csv", "tsv"):
        # escape='"' = RFC-4180 doubled quotes (pandas/excel exports);
        # Spark's default backslash escape mis-parses them, which silently
        # degrades every later column's inferred type to string
        reader = spark.read.option("header", "true").option("escape", '"')
        if fmt == "tsv":
            reader = reader.option("sep", "\t")
        if schema is not None:
            df = reader.schema(schema).csv(path)
        else:
            df = reader.option("inferSchema", "true").csv(path)
        _require_core(df, path)
        df = _parse_ts(df)
    else:
        raise ValueError(f"unsupported transcript format: {fmt}")
    _require_core(df, path)
    return normalize_input(df)
