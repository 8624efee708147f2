"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video ride as ``binary`` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInArrow`` stages. The media codecs themselves are NOT available in
this environment, so the pixel/sample decode step is a clearly-marked
deterministic stub (`_STUB_DECODERS`) — everything Spark-side (schema,
batch shape, partitioning, metadata extraction, checksumming) is real and
tested.

Scale notes: mapInArrow preserves the input partitioning (no shuffle);
payload bytes stream through Arrow record batches bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``; per-batch work is
vectorized over the Arrow binary buffers.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", T.StringType(), False),  # JSON sidecar
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("byte_entropy", T.DoubleType(), False),
        T.StructField("header_hex", T.StringType(), False),
        T.StructField("decoded", T.BooleanType(), False),
    ]
)

_FEATURE_ARROW = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),
        pa.field("n_bytes", pa.int64()),
        pa.field("byte_entropy", pa.float64()),
        pa.field("header_hex", pa.string()),
        pa.field("decoded", pa.bool_()),
    ]
)


def _decode_image(payload: bytes) -> np.ndarray:
    """Real implementation would be PIL/libjpeg; not present in this env."""
    raise NotImplementedError("image decode requires a media library")


def _decode_audio(payload: bytes) -> np.ndarray:
    raise NotImplementedError("audio decode requires a media library")


_STUB_DECODERS = {"image": _decode_image, "audio": _decode_audio,
                  "video": _decode_image}


def _byte_entropy(arr: np.ndarray) -> float:
    if len(arr) == 0:
        return 0.0
    counts = np.bincount(arr, minlength=256).astype(np.float64)
    p = counts[counts > 0] / len(arr)
    return float(-(p * np.log2(p)).sum())


def _feature_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for batch in batches:
        payload = batch.column(batch.schema.get_field_index("payload"))
        n = len(batch)
        n_bytes = np.empty(n, dtype=np.int64)
        entropy = np.empty(n, dtype=np.float64)
        header = []
        decoded = np.zeros(n, dtype=bool)
        kinds = batch.column(batch.schema.get_field_index("kind")).to_pylist()
        for i in range(n):
            b = payload[i].as_py() or b""
            a = np.frombuffer(b, dtype=np.uint8)
            n_bytes[i] = len(a)
            entropy[i] = round(_byte_entropy(a), 6)
            header.append(a[:8].tobytes().hex())
            try:  # the stub decode: plumbing is exercised, media libs absent
                _STUB_DECODERS[kinds[i]](b)
                decoded[i] = True
            except NotImplementedError:
                decoded[i] = False
        yield pa.RecordBatch.from_arrays(
            [
                batch.column(batch.schema.get_field_index("media_id")),
                batch.column(batch.schema.get_field_index("kind")),
                pa.array(n_bytes),
                pa.array(entropy),
                pa.array(header, type=pa.string()),
                pa.array(decoded),
            ],
            schema=_FEATURE_ARROW,
        )


def extract_features(media: DataFrame) -> DataFrame:
    """media table -> per-item byte features; no shuffle (mapInArrow)."""
    return media.select("media_id", "kind", "payload").mapInArrow(
        _feature_batches, FEATURE_SCHEMA
    )


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media payloads (magic header + seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    magic = {"image": b"\x89PNG\r\n\x1a\n", "audio": b"RIFF\x00\x00\x00\x00",
             "video": b"\x00\x00\x00\x18ftyp"}
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        body = rng.integers(0, 256, int(rng.integers(64, 2048)),
                            dtype=np.uint8).tobytes()
        rows.append((i, kind, magic[kind] + body,
                     '{"w": 64, "h": 64}' if kind == "image" else "{}"))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
