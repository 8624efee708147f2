"""RAW codec: passthrough fallback — guarantees encoded size ~= raw size.

The selector's floor (SURVEY.md §4.3): every column always has a codec whose
encoded size is never worse than the input, so measured auto-selection can
always fall back. Block-level zstd at the Parquet sink still applies on top.

Strings: payload = utf8 concat, lengths bitpacked into aux.
Ints: payload = raw little-endian buffer.
"""

from __future__ import annotations

import numpy as np

from . import bitpack, strutil

NAME = "raw"


def encode_str(values: np.ndarray) -> tuple[bytes, bytes, dict]:
    buf, lengths = strutil.strings_to_bytes_and_lengths(np.asarray(values, dtype=object))
    if len(lengths) == 0:
        return b"", b"", {"kind": "str", "lwidth": 0, "lmin": 0}
    lmin = int(lengths.min())
    lwidth = bitpack._bit_width(int(lengths.max()) - lmin)
    aux = bitpack.pack_u64((lengths - lmin).astype(np.uint64), lwidth)
    return buf, aux, {"kind": "str", "lwidth": lwidth, "lmin": lmin}


def encode_int(values: np.ndarray) -> tuple[bytes, bytes, dict]:
    values = np.asarray(values)
    return values.tobytes(), b"", {"kind": "int", "dtype": str(values.dtype)}


def encode(values: np.ndarray) -> tuple[bytes, bytes, dict]:
    values = np.asarray(values)
    if values.dtype == object:
        return encode_str(values)
    return encode_int(values)


def decode(payload: bytes, aux: bytes, meta: dict, n: int) -> np.ndarray:
    if meta["kind"] == "int":
        return np.frombuffer(payload, dtype=meta["dtype"]).copy()
    lengths = bitpack.unpack_u64(aux, meta["lwidth"], n).astype(np.int64) + meta["lmin"]
    return strutil.split_bytes(payload, lengths)
