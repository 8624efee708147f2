"""DICT codec: dictionary encoding for low-cardinality string columns.

Target columns: ``role``, ``tool`` (reference analogue: low-cardinality enum
columns SVTYPE/CHROM, ``converter/reservedColumns.go`` + README.md:39-41).

payload = bitpacked codes at ceil(log2(ndv)) bits; aux = symbol table
(length-prefixed utf8 list, sorted for determinism). Codes are assigned by
sorted-unique order so encode output is byte-stable regardless of row order
of first occurrence — the same determinism move as the reference's lexical
column sort (``converter/schema.go:99-100``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import bitpack, strutil

NAME = "dict"


def codes_and_table(values: np.ndarray) -> tuple[np.ndarray, list[str]]:
    """Stable dictionary: sorted unique values, int64 codes."""
    uniques = pd.unique(values)
    uniques = np.sort(uniques.astype(object))
    lookup = {v: i for i, v in enumerate(uniques)}
    codes = np.fromiter((lookup[v] for v in values), dtype=np.int64, count=len(values))
    return codes, list(uniques)


def encode(values: np.ndarray) -> tuple[bytes, bytes, dict]:
    values = np.asarray(values, dtype=object)
    n = len(values)
    if n == 0:
        return b"", strutil.pack_str_list([]), {"width": 0, "ndv": 0}
    codes, table = codes_and_table(values)
    width = bitpack._bit_width(len(table) - 1)
    payload = bitpack.pack_u64(codes.astype(np.uint64), width)
    aux = strutil.pack_str_list([s.encode("utf-8") for s in table])
    return payload, aux, {"width": width, "ndv": len(table)}


def decode(payload: bytes, aux: bytes, meta: dict, n: int) -> np.ndarray:
    table = np.array(
        [b.decode("utf-8") for b in strutil.unpack_str_list(aux)], dtype=object
    )
    if n == 0:
        return np.empty(0, dtype=object)
    codes = bitpack.unpack_u64(payload, meta["width"], n).astype(np.int64)
    return table[codes]
