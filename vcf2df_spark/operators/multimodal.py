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


def parse_bmp(payload: bytes) -> dict:
    """REAL image decode for uncompressed BMP — numpy only, no media
    library. Reads the BITMAPFILEHEADER + BITMAPINFOHEADER and decodes
    8-bit (palette/gray) and 24/32-bit BI_RGB pixel data into a uint8
    (height, width, channels) array (rows un-flipped from the BMP
    bottom-up layout; 4-byte row padding stripped). Compressed BMPs
    (RLE/JPEG-in-BMP) and other containers (PNG/JPEG) raise
    NotImplementedError like the remaining media stubs.

    Returns {"width", "height", "bits", "channels", "pixels"}.
    """
    if len(payload) < 54 or payload[:2] != b"BM":
        raise NotImplementedError("not an uncompressed BMP payload")
    data_off = int(np.frombuffer(payload[10:14], "<u4")[0])
    hdr_size = int(np.frombuffer(payload[14:18], "<u4")[0])
    if hdr_size < 40:
        raise NotImplementedError("pre-BITMAPINFOHEADER BMP")
    width = int(np.frombuffer(payload[18:22], "<i4")[0])
    height = int(np.frombuffer(payload[22:26], "<i4")[0])
    bits = int(np.frombuffer(payload[28:30], "<u2")[0])
    compression = int(np.frombuffer(payload[30:34], "<u4")[0])
    if compression != 0:  # BI_RGB only; RLE/JPEG-in-BMP need codecs
        raise NotImplementedError(f"compressed BMP (method {compression})")
    if bits not in (8, 24, 32) or width <= 0 or height == 0:
        raise NotImplementedError(f"unsupported BMP geometry ({bits}-bit)")
    flip = height > 0  # positive height = bottom-up row order
    height = abs(height)
    channels = bits // 8
    row_bytes = (width * channels + 3) & ~3  # rows pad to 4 bytes
    need = data_off + row_bytes * height
    if len(payload) < need:
        raise NotImplementedError("truncated BMP pixel data")
    rows = np.frombuffer(
        payload[data_off : data_off + row_bytes * height], dtype=np.uint8
    ).reshape(height, row_bytes)[:, : width * channels]
    pixels = rows.reshape(height, width, channels)
    if flip:
        pixels = pixels[::-1]
    return {
        "width": width,
        "height": height,
        "bits": bits,
        "channels": channels,
        "pixels": pixels,
    }


def _decode_image(payload: bytes) -> np.ndarray:
    """Uncompressed BMP decodes for real (parse_bmp); PNG/JPEG/video
    containers need a media library and stay stubbed."""
    return parse_bmp(payload)["pixels"]


def parse_wav(payload: bytes) -> dict:
    """REAL audio decode for RIFF/WAVE PCM — numpy only, no media library.

    Walks the RIFF chunk list (chunks are (4-byte tag, uint32le size,
    payload, pad-to-even) — tolerant of extra chunks like LIST/fact),
    reads the ``fmt `` header, and decodes the ``data`` chunk into a
    float64 (n_frames, channels) sample matrix in [-1, 1]. Supports
    format 1 (integer PCM, 8/16/32-bit) and format 3 (IEEE float 32/64);
    compressed formats (mp3-in-wav, ADPCM, extensible) raise
    NotImplementedError like the other media stubs.

    Returns {"sample_rate", "channels", "bits", "n_frames",
    "duration_sec", "samples"}.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload")
    fmt = None
    data = None
    pos = 12
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        size = int(np.frombuffer(payload[pos + 4 : pos + 8], "<u4")[0])
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"fmt " and len(body) >= 16:
            fmt = {
                "format": int(np.frombuffer(body[0:2], "<u2")[0]),
                "channels": int(np.frombuffer(body[2:4], "<u2")[0]),
                "sample_rate": int(np.frombuffer(body[4:8], "<u4")[0]),
                "bits": int(np.frombuffer(body[14:16], "<u2")[0]),
            }
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise NotImplementedError("WAVE payload missing fmt/data chunk")
    if fmt["channels"] == 0 or fmt["sample_rate"] == 0:
        raise NotImplementedError("degenerate WAVE fmt header")
    dtypes = {
        (1, 8): ("u1", 127.5, -1.0),   # unsigned, midpoint 127.5
        (1, 16): ("<i2", 32768.0, 0.0),
        (1, 32): ("<i4", 2147483648.0, 0.0),
        (3, 32): ("<f4", 1.0, 0.0),
        (3, 64): ("<f8", 1.0, 0.0),
    }
    key = (fmt["format"], fmt["bits"])
    if key not in dtypes:
        raise NotImplementedError(
            f"WAVE format {fmt['format']}/{fmt['bits']}-bit needs a codec "
            "library (only integer/float PCM decode here)"
        )
    dt, scale, center = dtypes[key]
    width = fmt["bits"] // 8 * fmt["channels"]
    n_frames = len(data) // width if width else 0
    raw = np.frombuffer(data[: n_frames * width], dtype=dt).astype(np.float64)
    samples = (raw / scale + center).reshape(n_frames, fmt["channels"])
    return {
        "sample_rate": fmt["sample_rate"],
        "channels": fmt["channels"],
        "bits": fmt["bits"],
        "n_frames": n_frames,
        "duration_sec": n_frames / fmt["sample_rate"],
        "samples": samples,
    }


def _decode_audio(payload: bytes) -> np.ndarray:
    """WAV PCM decodes for real (parse_wav); other containers stub."""
    return parse_wav(payload)["samples"]


_STUB_DECODERS = {"image": _decode_image, "audio": _decode_audio,
                  "video": _decode_image}


def _binary_buf_offsets(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """BinaryArray -> (uint8 data view, int64 offsets rebased to 0)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.zeros(0, dtype=np.uint8), np.zeros(1, dtype=np.int64)
    off_dtype = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    offsets = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[
        offsets[0] : offsets[-1]
    ]
    return data, offsets - offsets[0]


def _batch_features(payload: pa.Array) -> tuple[np.ndarray, np.ndarray, list[str]]:
    """Vectorized (n_bytes, entropy, header_hex) straight from the Arrow
    binary buffer — no per-row ``.as_py()`` payload materialization.

    Entropy: one segmented 256-bin histogram for the whole batch
    (``np.bincount`` over ``segment_id * 256 + byte``), then a vectorized
    Shannon sum per row. Headers touch at most 8 bytes per row.
    """
    data, offsets = _binary_buf_offsets(payload)
    lengths = np.diff(offsets)
    n = len(lengths)
    if n == 0:
        return lengths, np.zeros(0), []
    # segmented histogram in bounded sub-batches: the int64 key array is a
    # ~16x transient over the payload bytes, so cap each slice at ~8MB of
    # payload — memory stays O(cap), not O(batch payload)
    _SLICE_BYTES = 1 << 23
    entropy = np.zeros(n, dtype=np.float64)
    lo = 0
    while lo < n:
        hi = lo + 1
        while hi < n and offsets[hi + 1] - offsets[lo] <= _SLICE_BYTES:
            hi += 1
        k = hi - lo
        seg = np.repeat(np.arange(k, dtype=np.int64),
                        lengths[lo:hi])
        chunk = data[offsets[lo] : offsets[hi]]
        counts = np.bincount(
            seg * 256 + chunk.astype(np.int64), minlength=k * 256
        ).reshape(k, 256)
        with np.errstate(divide="ignore", invalid="ignore"):
            p = counts / np.maximum(lengths[lo:hi], 1)[:, None]
            terms = np.where(counts > 0, p * np.log2(p), 0.0)
        entropy[lo:hi] = -terms.sum(axis=1)
        lo = hi
    entropy = np.round(entropy, 6)
    entropy[lengths == 0] = 0.0
    starts = offsets[:-1]
    take = np.minimum(lengths, 8)
    headers = [data[s : s + t].tobytes().hex() for s, t in zip(starts, take)]
    return lengths, entropy, headers


def _feature_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for batch in batches:
        payload = batch.column(batch.schema.get_field_index("payload"))
        kind_arr = batch.column(batch.schema.get_field_index("kind"))
        n = len(batch)
        n_bytes, entropy, header = _batch_features(payload)
        # decoder probed once per distinct kind per batch on a
        # representative payload, not per row (image/video still raise —
        # media libs absent; audio decodes for real iff the probe row is
        # RIFF/WAVE PCM — see parse_wav; per-row verdicts live in
        # audio_features)
        decoded_by_kind = {}
        enc = pa.compute.dictionary_encode(kind_arr)
        kind_values = enc.dictionary.to_pylist()
        first_idx = {}
        codes = enc.indices.to_numpy(zero_copy_only=False)
        for k_i, k in enumerate(kind_values):
            pos = int(np.argmax(codes == k_i))
            first_idx[k] = pos
        for k, pos in first_idx.items():
            try:
                _STUB_DECODERS[k](payload[pos].as_py() or b"")
                decoded_by_kind[k] = True
            except NotImplementedError:
                decoded_by_kind[k] = False
        decoded = np.array(
            [decoded_by_kind[kind_values[c]] for c in codes], dtype=bool
        ) if n else np.zeros(0, dtype=bool)
        yield pa.RecordBatch.from_arrays(
            [
                batch.column(batch.schema.get_field_index("media_id")),
                kind_arr,
                pa.array(np.asarray(n_bytes, dtype=np.int64)),
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


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("decoded", T.BooleanType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("bits", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("duration_sec", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)

_AUDIO_ARROW = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("decoded", pa.bool_()),
        pa.field("sample_rate", pa.int32()),
        pa.field("channels", pa.int32()),
        pa.field("bits", pa.int32()),
        pa.field("n_frames", pa.int64()),
        pa.field("duration_sec", pa.float64()),
        pa.field("rms", pa.float64()),
    ]
)


def _audio_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for batch in batches:
        payload = batch.column(batch.schema.get_field_index("payload"))
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        cols: dict[str, list] = {k: [] for k in _AUDIO_ARROW.names[1:]}
        # per-row decode is the real work here (each payload is an opaque
        # container — the exact shape a production media pipeline has);
        # the numpy sample math inside parse_wav is vectorized per payload
        for i in range(len(batch)):
            try:
                w = parse_wav(payload[i].as_py() or b"")
            except NotImplementedError:
                cols["decoded"].append(False)
                for k in ("sample_rate", "channels", "bits", "n_frames",
                          "duration_sec", "rms"):
                    cols[k].append(None)
                continue
            cols["decoded"].append(True)
            cols["sample_rate"].append(w["sample_rate"])
            cols["channels"].append(w["channels"])
            cols["bits"].append(w["bits"])
            cols["n_frames"].append(w["n_frames"])
            cols["duration_sec"].append(round(w["duration_sec"], 6))
            s = w["samples"]
            cols["rms"].append(
                round(float(np.sqrt(np.mean(s * s))), 6) if s.size else 0.0
            )
        yield pa.RecordBatch.from_arrays(
            [batch.column(batch.schema.get_field_index("media_id"))]
            + [pa.array(cols[k], type=_AUDIO_ARROW.field(k).type)
               for k in _AUDIO_ARROW.names[1:]],
            schema=_AUDIO_ARROW,
        )


def audio_features(media: DataFrame) -> DataFrame:
    """Audio rows -> REAL decoded features (sample rate, duration, RMS
    level) for RIFF/WAVE PCM payloads; rows whose container needs a codec
    library come back with decoded=false and null features. mapInArrow —
    no shuffle, payloads never leave the Arrow batch."""
    return media.select("media_id", "payload").mapInArrow(
        _audio_batches, AUDIO_SCHEMA
    )


IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("decoded", T.BooleanType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("bits", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
    ]
)

_IMAGE_ARROW = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("decoded", pa.bool_()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("bits", pa.int32()),
        pa.field("mean_luma", pa.float64()),
    ]
)


def _image_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for batch in batches:
        payload = batch.column(batch.schema.get_field_index("payload"))
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        cols: dict[str, list] = {k: [] for k in _IMAGE_ARROW.names[1:]}
        for i in range(len(batch)):
            try:
                b = parse_bmp(payload[i].as_py() or b"")
            except NotImplementedError:
                cols["decoded"].append(False)
                for k in ("width", "height", "bits", "mean_luma"):
                    cols[k].append(None)
                continue
            cols["decoded"].append(True)
            cols["width"].append(b["width"])
            cols["height"].append(b["height"])
            cols["bits"].append(b["bits"])
            cols["mean_luma"].append(round(float(b["pixels"].mean()), 6))
        yield pa.RecordBatch.from_arrays(
            [batch.column(batch.schema.get_field_index("media_id"))]
            + [pa.array(cols[k], type=_IMAGE_ARROW.field(k).type)
               for k in _IMAGE_ARROW.names[1:]],
            schema=_IMAGE_ARROW,
        )


def image_features(media: DataFrame) -> DataFrame:
    """Image rows -> REAL decoded features (dimensions, bit depth, mean
    luminance) for uncompressed BMP payloads; containers that need a
    codec library come back decoded=false with null features. mapInArrow
    — no shuffle."""
    return media.select("media_id", "payload").mapInArrow(
        _image_batches, IMAGE_SCHEMA
    )


def synthesize_bmp(width: int, height: int, bits: int = 24,
                   seed: int = 0) -> bytes:
    """Deterministic uncompressed BMP bytes (seeded gradient) — the
    fixture generator for the real image decode path."""
    if bits == 24:
        x = np.arange(width, dtype=np.uint32)
        y = np.arange(height, dtype=np.uint32)[:, None]
        px = np.empty((height, width, 3), dtype=np.uint8)
        px[:, :, 0] = (x + seed) % 256
        px[:, :, 1] = (y + 2 * seed) % 256
        px[:, :, 2] = (x + y) % 256
    elif bits == 8:
        x = np.arange(width, dtype=np.uint32)
        y = np.arange(height, dtype=np.uint32)[:, None]
        px = ((x + y + seed) % 256).astype(np.uint8)[..., None]
    else:
        raise ValueError("synthesize_bmp supports 8 or 24 bits")
    ch = bits // 8
    row_bytes = (width * ch + 3) & ~3
    rows = np.zeros((height, row_bytes), dtype=np.uint8)
    rows[:, : width * ch] = px.reshape(height, width * ch)
    pix = rows[::-1].tobytes()  # bottom-up row order
    # 8-bit BMPs carry a 256-entry BGRA palette (grayscale identity here)
    palette = b""
    if bits == 8:
        g = np.arange(256, dtype=np.uint8)
        palette = np.stack(
            [g, g, g, np.zeros(256, dtype=np.uint8)], axis=1
        ).tobytes()
    data_off = 54 + len(palette)
    file_hdr = (
        b"BM" + np.array([data_off + len(pix)], "<u4").tobytes()
        + b"\x00\x00\x00\x00" + np.array([data_off], "<u4").tobytes()
    )
    info_hdr = (
        np.array([40], "<u4").tobytes()
        + np.array([width, height], "<i4").tobytes()
        + np.array([1, bits], "<u2").tobytes()
        + np.array([0, len(pix), 2835, 2835, 0, 0], "<u4").tobytes()
    )
    return file_hdr + info_hdr + palette + pix


def synthesize_wav(
    n_frames: int, sample_rate: int = 16000, channels: int = 1,
    freq_hz: float = 440.0, bits: int = 16,
) -> bytes:
    """Deterministic PCM WAV bytes (sine per channel, phase-shifted) —
    the fixture generator for the real decode path."""
    t = np.arange(n_frames, dtype=np.float64) / sample_rate
    waves = np.stack(
        [np.sin(2 * np.pi * freq_hz * t + c * np.pi / 4)
         for c in range(channels)], axis=1,
    )
    if bits == 16:
        fmt_code, data = 1, (waves * 32767).astype("<i2").tobytes()
    elif bits == 32:
        fmt_code, data = 3, waves.astype("<f4").tobytes()
    else:
        raise ValueError("synthesize_wav supports 16 (PCM) or 32 (float)")
    block = bits // 8 * channels
    fmt = (
        np.array([fmt_code, channels], "<u2").tobytes()
        + np.array([sample_rate, sample_rate * block], "<u4").tobytes()
        + np.array([block, bits], "<u2").tobytes()
    )
    chunks = b"WAVE"
    for tag, body in ((b"fmt ", fmt), (b"data", data)):
        chunks += tag + np.array([len(body)], "<u4").tobytes() + body
        chunks += b"\x00" * (len(body) & 1)
    return b"RIFF" + np.array([len(chunks)], "<u4").tobytes() + chunks


def wav_roundtrip(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Append REAL-decoded WAV features derived by synth -> parse_wav.

    For every row, a deterministic PCM WAV is synthesized with parameters
    derived from ``id_col`` (sample rate 8/16/24 kHz, 1-2 channels,
    400-1184 frames) and immediately decoded by the real container parser.
    The emitted columns come from the PARSE, not the synthesis inputs —
    so a driver/oracle check against the analytic parameter formulas
    proves the decode path end-to-end. mapInArrow, no shuffle; payloads
    never leave the worker."""
    in_schema = df.schema
    out_schema = T.StructType(
        list(in_schema.fields)
        + [
            T.StructField("wav_sample_rate", T.IntegerType(), False),
            T.StructField("wav_channels", T.IntegerType(), False),
            T.StructField("wav_n_frames", T.LongType(), False),
            T.StructField("wav_duration", T.DoubleType(), False),
        ]
    )

    def batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            ids = batch.column(batch.schema.get_field_index(id_col)).to_numpy(
                zero_copy_only=False
            )
            srs, chs, nfs, durs = [], [], [], []
            for i in ids:
                i = int(i)
                raw = synthesize_wav(
                    400 + (i % 50) * 16,
                    sample_rate=8000 * (1 + i % 3),
                    channels=1 + i % 2,
                )
                w = parse_wav(raw)
                srs.append(w["sample_rate"])
                chs.append(w["channels"])
                nfs.append(w["n_frames"])
                durs.append(w["duration_sec"])
            yield pa.RecordBatch.from_arrays(
                list(batch.columns)
                + [
                    pa.array(srs, type=pa.int32()),
                    pa.array(chs, type=pa.int32()),
                    pa.array(nfs, type=pa.int64()),
                    pa.array(durs, type=pa.float64()),
                ],
                schema=pa.schema(
                    list(pa.schema(batch.schema))
                    + [
                        pa.field("wav_sample_rate", pa.int32()),
                        pa.field("wav_channels", pa.int32()),
                        pa.field("wav_n_frames", pa.int64()),
                        pa.field("wav_duration", pa.float64()),
                    ]
                ),
            )

    return df.mapInArrow(batches, out_schema)


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
