"""ZSTDHI codec: high-level zstd for write-once string payloads.

The blocks table's sink compression is zstd at the default fast level; for
encode-once/read-many transcript text it is worth spending encode CPU on a
higher level — measured on the fixture corpus: level 12 is 13.6% smaller
than level 3 at ~29 MB/s/core (level 19 gains 6% more at 10x the cost).
The selector compares final disk bytes, so this codec wins exactly when
the extra CPU actually buys bytes; the already-compressed payload passes
through the sink's zstd untouched.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import bitpack, strutil

NAME = "zstdhi"
LEVEL = 12

_CODEC = pa.Codec("zstd", compression_level=LEVEL)
_DECODEC = pa.Codec("zstd")


def encode_from_buf(buf: bytes, lengths: np.ndarray) -> tuple[bytes, bytes, dict]:
    payload = _CODEC.compress(buf) if buf else b""
    if len(lengths):
        lmin = int(lengths.min())
        lwidth = bitpack._bit_width(int(lengths.max()) - lmin)
        lpack = bitpack.pack_u64((lengths - lmin).astype(np.uint64), lwidth)
    else:
        lmin, lwidth, lpack = 0, 0, b""
    return bytes(payload), lpack, {
        "lwidth": lwidth, "lmin": lmin, "raw_len": len(buf), "level": LEVEL,
    }


def decode_to_buf(payload: bytes, aux: bytes, meta: dict, n: int) -> tuple[bytes, np.ndarray]:
    lengths = bitpack.unpack_u64(aux, meta["lwidth"], n).astype(np.int64) + meta["lmin"]
    buf = (
        _DECODEC.decompress(payload, meta["raw_len"]).to_pybytes()
        if payload else b""
    )
    return buf, lengths


def encode(values: np.ndarray) -> tuple[bytes, bytes, dict]:
    buf, lengths = strutil.strings_to_bytes_and_lengths(
        np.asarray(values, dtype=object)
    )
    return encode_from_buf(buf, lengths)


def decode(payload: bytes, aux: bytes, meta: dict, n: int) -> np.ndarray:
    buf, lengths = decode_to_buf(payload, aux, meta, n)
    return strutil.split_bytes(buf, lengths)
