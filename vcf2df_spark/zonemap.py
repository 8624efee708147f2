"""Order-preserving zone-map keys.

Block rows carry per-chunk min/max statistics (the engine's analogue of
Parquet row-group statistics). Numeric stats live in two int64 columns
(``stat_min_num``/``stat_max_num``); doubles are mapped through the
standard IEEE-754 total-order transform so that *signed int64 comparison
of the keys matches double comparison of the values* — the scan side
applies the same transform to its predicate bounds:

    x >= +0.0 : key = bits(x)                 (sign bit clear)
    x <  0.0  : key = ~bits(x) XOR 2^63       (flip magnitude, keep order)

Properties: -0.0 < +0.0, -inf < everything < +inf < NaN; a chunk whose
values include NaN gets a huge max key, which only makes pruning
conservative (never incorrect).
"""

from __future__ import annotations

import numpy as np

_SIGN = np.uint64(1 << 63)


def f64_key_array(values: np.ndarray) -> np.ndarray:
    """float64 array -> order-preserving int64 keys (vectorized)."""
    b = np.ascontiguousarray(values, dtype=np.float64).view(np.int64)
    u = b.view(np.uint64)
    k = np.where(b < 0, np.bitwise_xor(np.invert(u), _SIGN), u)
    return k.view(np.int64)


def f64_key(value: float) -> int:
    """Scalar helper for predicate bounds on the scan side."""
    return int(f64_key_array(np.array([value], dtype=np.float64))[0])


def f64_lo_key(value: float) -> int:
    """Lower predicate bound -> key, under SPARK comparison semantics.

    The total-order key space separates -0.0 < +0.0, but Spark predicates
    treat them as equal (``score = 0.0`` matches -0.0 rows). A zero lower
    bound therefore maps to key(-0.0) so chunks holding only -0.0 are
    never pruned away from a predicate that matches them. (NaN bounds need
    no special case: Spark 4.1 predicate comparisons with NaN are all
    false — IEEE — so no row ever matches and any pruning outcome is
    vacuously safe.)
    """
    return f64_key(-0.0) if value == 0 else f64_key(value)


def f64_hi_key(value: float) -> int:
    """Upper predicate bound -> key; zero maps to key(+0.0) (see
    :func:`f64_lo_key`)."""
    return f64_key(0.0) if value == 0 else f64_key(value)
