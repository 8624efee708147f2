"""FOR-DELTA codec: delta + zigzag + frame-of-reference bit packing.

Target column: ``ts`` (timestamps, near-monotone within a conversation,
carried as unix_micros int64 — exact, preserving bit identity across the
Arrow boundary). The analogue of the reference's ordered-coordinate columns
(POS/END, ``converter/parseVariant.go:26-33``), which vcf2df stores raw;
we exploit the ordering instead.

Layout: first value stored in meta; payload = bitpacked
``zigzag(diff) - min_zigzag``.
"""

from __future__ import annotations

import numpy as np

from . import bitpack

NAME = "fordelta"


def _zigzag(d: np.ndarray) -> np.ndarray:
    d = d.astype(np.int64, copy=False)
    return ((d << np.int64(1)) ^ (d >> np.int64(63))).astype(np.uint64)


def _unzigzag(z: np.ndarray) -> np.ndarray:
    z = z.astype(np.uint64, copy=False)
    return ((z >> np.uint64(1)).astype(np.int64)) ^ -((z & np.uint64(1)).astype(np.int64))


def encode(values: np.ndarray) -> tuple[bytes, bytes, dict]:
    values = np.asarray(values, dtype=np.int64)
    n = len(values)
    if n == 0:
        return b"", b"", {"first": 0, "zmin": 0, "width": 0}
    first = int(values[0])
    if n == 1:
        return b"", b"", {"first": first, "zmin": 0, "width": 0}
    zz = _zigzag(np.diff(values))
    zmin = int(zz.min())
    zmax = int(zz.max())
    width = bitpack._bit_width(zmax - zmin)
    payload = bitpack.pack_u64(zz - np.uint64(zmin), width)
    return payload, b"", {"first": first, "zmin": zmin, "width": width}


def decode(payload: bytes, aux: bytes, meta: dict, n: int) -> np.ndarray:
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    out = np.empty(n, dtype=np.int64)
    out[0] = meta["first"]
    if n > 1:
        zz = bitpack.unpack_u64(payload, meta["width"], n - 1) + np.uint64(meta["zmin"])
        out[1:] = _unzigzag(zz)
        np.cumsum(out, out=out)
    return out
