"""BITPACK codec: frame-of-reference + minimal-width bit packing for ints.

Target column: ``turn_idx`` (small non-negative ints). Re-imagines the
reference's type-narrowing moves (float QUAL -> int32 at
``converter/formatOutput.go:26``; int32 columns at ``converter/schema.go:53``)
as a *lossless* width reduction: store ``min`` once, pack ``value - min``
at ``ceil(log2(range+1))`` bits.

Pure numpy, vectorized; no per-row Python.
"""

from __future__ import annotations

import numpy as np

NAME = "bitpack"


def _bit_width(max_delta: int) -> int:
    if max_delta <= 0:
        return 0
    return int(max_delta).bit_length()


def pack_u64(vals: np.ndarray, width: int) -> bytes:
    """Pack a uint64 array at ``width`` bits per value, little-endian bit order."""
    if width == 0 or len(vals) == 0:
        return b""
    vals = vals.astype(np.uint64, copy=False)
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((vals[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def unpack_u64(buf: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack_u64`; returns uint64 array of length ``n``."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(
        np.frombuffer(buf, dtype=np.uint8), count=n * width, bitorder="little"
    )
    bits = bits.reshape(n, width).astype(np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    return (bits << shifts[None, :]).sum(axis=1, dtype=np.uint64)


def encode(values: np.ndarray) -> tuple[bytes, bytes, dict]:
    """Encode an integer array. Returns (payload, aux, meta)."""
    values = np.asarray(values)
    n = len(values)
    if n == 0:
        return b"", b"", {"min": 0, "width": 0, "dtype": str(values.dtype)}
    vmin = int(values.min())
    vmax = int(values.max())
    width = _bit_width(vmax - vmin)
    # deltas fit in uint64 by construction (range of int64 column)
    deltas = (values.astype(np.int64) - np.int64(vmin)).astype(np.uint64)
    return pack_u64(deltas, width), b"", {
        "min": vmin,
        "width": width,
        "dtype": str(np.asarray(values).dtype),
    }


def decode(payload: bytes, aux: bytes, meta: dict, n: int) -> np.ndarray:
    deltas = unpack_u64(payload, meta["width"], n)
    out = deltas.astype(np.int64) + np.int64(meta["min"])
    return out.astype(meta.get("dtype", "int64"))
