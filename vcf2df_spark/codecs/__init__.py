"""Codec registry: name -> (encode, decode) over numpy arrays.

The target engine's closed, exhaustively-tested codec/type matrix — the
re-imagined analogue of the reference's per-type encode switch
(``converter/formatOutput.go:44-88``), with codecs chosen per observed
statistics (see ``planner.py``) instead of per declared type.

Contract: ``encode(values) -> (payload: bytes, aux: bytes, meta: dict)``,
``decode(payload, aux, meta, n) -> values`` with
``decode(*encode(x), len(x))`` bit-identical to ``x``.
"""

from __future__ import annotations

import numpy as np

from . import (
    bitpack, boolpack, dictionary, floats, fordelta, fsst, raw, rle, strnum,
    zstdhi,
)

_CODECS = {
    bitpack.NAME: (bitpack.encode, bitpack.decode),
    fordelta.NAME: (fordelta.encode, fordelta.decode),
    dictionary.NAME: (dictionary.encode, dictionary.decode),
    rle.NAME: (rle.encode, rle.decode),
    fsst.NAME: (fsst.encode, fsst.decode),
    strnum.NAME: (strnum.encode, strnum.decode),
    zstdhi.NAME: (zstdhi.encode, zstdhi.decode),
    floats.NAME: (floats.encode, floats.decode),
    floats.DICT_NAME: (floats.encode_dict, floats.decode_dict),
    boolpack.NAME: (boolpack.encode, boolpack.decode),
    raw.NAME: (raw.encode, raw.decode),
}

STRING_CODECS = (dictionary.NAME, rle.NAME, fsst.NAME, strnum.NAME, zstdhi.NAME, raw.NAME)
INT_CODECS = (bitpack.NAME, fordelta.NAME, raw.NAME)
FLOAT_CODECS = (floats.NAME, floats.DICT_NAME, raw.NAME)
BOOL_CODECS = (boolpack.NAME, raw.NAME)


def encode(codec: str, values: np.ndarray) -> tuple[bytes, bytes, dict]:
    return _CODECS[codec][0](values)


def decode(codec: str, payload: bytes, aux: bytes, meta: dict, n: int) -> np.ndarray:
    return _CODECS[codec][1](payload, aux, meta, n)


def names() -> list[str]:
    return list(_CODECS)
