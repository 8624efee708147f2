"""BOOLPACK codec: 1-bit packing for boolean columns.

The reference's type lattice has first-class boolean columns
(``converter/schema.go:63``, presence-flag semantics at
``converter/formatOutput.go:57-58``); the engine stores them at 1 bit/value
via ``np.packbits`` (little-endian bit order, matching bitpack.py).
"""

from __future__ import annotations

import numpy as np

NAME = "boolpack"


def encode(values: np.ndarray) -> tuple[bytes, bytes, dict]:
    values = np.asarray(values, dtype=np.bool_)
    if len(values) == 0:
        return b"", b"", {}
    return np.packbits(values, bitorder="little").tobytes(), b"", {}


def decode(payload: bytes, aux: bytes, meta: dict, n: int) -> np.ndarray:
    if n == 0:
        return np.zeros(0, dtype=np.bool_)
    return (
        np.unpackbits(np.frombuffer(payload, dtype=np.uint8), count=n,
                      bitorder="little")
        .astype(np.bool_)
    )
