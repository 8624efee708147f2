"""Vectorized column functions exposed as Arrow-batched pandas UDFs.

The engine's user-facing scalar-function surface (the analogue of the
reference's inline helpers, ``parseVariant.go:26-33`` /
``formatOutput.go:60-80``) for cases where no built-in Spark expression
exists. Everything here is a ``pandas_udf`` — Arrow batch transfer,
pandas/numpy C-speed string kernels inside, never row-at-a-time Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf

# whitespace words, numbers, or single non-alphanumeric marks — the
# "BPE-ish" tokenizer shape used by training-data token accounting
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@pandas_udf("int")
def bpe_token_count(text: pd.Series) -> pd.Series:
    """Token count under the BPE-ish regex (vectorized str.count)."""
    return text.str.count(BPE_ISH_PATTERN).fillna(0).astype("int32")


@pandas_udf("double")
def utf8_ratio(text: pd.Series) -> pd.Series:
    """Bytes-per-character ratio — >1.0 flags multi-byte (non-ASCII) text."""
    nbytes = text.str.encode("utf-8").str.len().astype("float64")
    nchars = text.str.len().clip(lower=1).astype("float64")
    return (nbytes / nchars).round(6)


@pandas_udf("long")
def rolling_content_hash(text: pd.Series) -> pd.Series:
    """Deterministic 61-bit rolling hash of the raw text bytes (vectorized
    via pandas hashing of byte content, reduced mod 2^61-1)."""
    h = pd.util.hash_pandas_object(text.fillna(""), index=False).astype("uint64")
    return (h % (2**61 - 1)).astype("int64")


@pandas_udf("long")
def f64_bits(values: pd.Series) -> pd.Series:
    """Raw IEEE-754 bit pattern of a double as int64.

    Spark's xxhash64/exceptAll canonicalize NaN payloads and normalize
    -0.0 to +0.0, so value-level comparison cannot detect a codec
    corrupting those bits; hashing THROUGH this projection makes the e2e
    verify gate bit-exact for float columns (ADVICE r2)."""
    import numpy as np

    return pd.Series(values.to_numpy(dtype=np.float64).view(np.int64))
