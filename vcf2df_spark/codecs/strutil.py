"""Shared vectorized string-array <-> bytes serialization.

Layout for a string list: ``uint32 count | uint32 lengths[count] | utf8 concat``.
All construction/parsing is numpy buffer work; no per-row Python beyond the
unavoidable utf-8 materialization at the pandas boundary.
"""

from __future__ import annotations

import numpy as np


def strings_to_bytes_and_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Object array of str -> (concatenated utf8 bytes, int64 lengths)."""
    if len(values) == 0:
        return b"", np.zeros(0, dtype=np.int64)
    encoded = [s.encode("utf-8") for s in values]
    lengths = np.fromiter((len(b) for b in encoded), dtype=np.int64, count=len(encoded))
    return b"".join(encoded), lengths


def split_bytes(buf: bytes, lengths: np.ndarray) -> np.ndarray:
    """Inverse of :func:`strings_to_bytes_and_lengths` -> object array of str."""
    n = len(lengths)
    out = np.empty(n, dtype=object)
    if n == 0:
        return out
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    mv = memoryview(buf)
    for i in range(n):  # test/decode boundary only; hot path uses codec decoders
        out[i] = bytes(mv[offsets[i] : offsets[i + 1]]).decode("utf-8")
    return out


def pack_str_list(items: list[bytes]) -> bytes:
    """Serialize a small list of byte strings (symbol tables / dictionaries)."""
    lengths = np.fromiter((len(b) for b in items), dtype=np.uint32, count=len(items))
    head = np.array([len(items)], dtype=np.uint32).tobytes()
    return head + lengths.tobytes() + b"".join(items)


def unpack_str_list(buf: bytes) -> list[bytes]:
    count = int(np.frombuffer(buf[:4], dtype=np.uint32)[0])
    lengths = np.frombuffer(buf[4 : 4 + 4 * count], dtype=np.uint32)
    out = []
    pos = 4 + 4 * count
    for ln in lengths:
        out.append(buf[pos : pos + int(ln)])
        pos += int(ln)
    return out
