"""Float64 codecs: byte-shuffle (fshuffle) and bit-pattern dictionary (fdict).

The reference's type lattice carries doubles as a first-class column type
(``converter/schema.go:58``, ``converter/formatOutput.go:49-51``); the
engine encodes them losslessly at the bit-pattern level:

- ``fshuffle``: transpose the 8 byte planes of the float64 array
  (byte 0 of every value, then byte 1 of every value, ...). Doubles from a
  common range share exponent/high-mantissa bytes, so the transposed
  layout gives the sink's zstd long same-byte runs — the classic
  byte-stream-split trick Parquet added for FP columns.
- ``fdict``: dictionary over the raw int64 bit patterns (``np.unique`` on
  the bit view). Operating on bit patterns sidesteps float equality
  entirely: every NaN payload, and -0.0 vs +0.0, round-trips exactly.

Both are pure numpy and bit-identical by construction; RAW is the floor.
"""

from __future__ import annotations

import numpy as np

from . import bitpack

NAME = "fshuffle"
DICT_NAME = "fdict"


def encode(values: np.ndarray) -> tuple[bytes, bytes, dict]:
    values = np.ascontiguousarray(values, dtype=np.float64)
    n = len(values)
    if n == 0:
        return b"", b"", {}
    planes = values.view(np.uint8).reshape(n, 8).T
    return np.ascontiguousarray(planes).tobytes(), b"", {}


def decode(payload: bytes, aux: bytes, meta: dict, n: int) -> np.ndarray:
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    planes = np.frombuffer(payload, dtype=np.uint8).reshape(8, n)
    return np.ascontiguousarray(planes.T).view(np.float64).ravel()


def encode_dict(values: np.ndarray) -> tuple[bytes, bytes, dict]:
    values = np.ascontiguousarray(values, dtype=np.float64)
    n = len(values)
    if n == 0:
        return b"", b"", {"width": 0, "ndv": 0}
    bits = values.view(np.int64)
    uniq, codes = np.unique(bits, return_inverse=True)
    width = bitpack._bit_width(len(uniq) - 1)
    payload = bitpack.pack_u64(codes.astype(np.uint64), width)
    return payload, uniq.tobytes(), {"width": width, "ndv": int(len(uniq))}


def decode_dict(payload: bytes, aux: bytes, meta: dict, n: int) -> np.ndarray:
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    uniq = np.frombuffer(aux, dtype=np.int64)
    codes = bitpack.unpack_u64(payload, meta["width"], n).astype(np.int64)
    return uniq[codes].view(np.float64)
