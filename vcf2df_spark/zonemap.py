"""Order-preserving zone-map keys.

Block rows carry per-chunk min/max statistics (the engine's analogue of
Parquet row-group statistics). Numeric stats live in two int64 columns
(``stat_min_num``/``stat_max_num``); doubles are mapped through the
standard IEEE-754 total-order transform so that *signed int64 comparison
of the keys matches double comparison of the values* — the scan side
applies the same transform to its predicate bounds:

    x >= +0.0 : key = bits(x)                 (sign bit clear)
    x <  0.0  : key = ~bits(x) XOR 2^63       (flip magnitude, keep order)

Properties: -0.0 < +0.0, -inf < everything < +inf < NaN.

NaN invariant: Spark's comparison semantics (unlike IEEE) treat all NaNs
as EQUAL to each other and GREATER than every non-NaN value — ``NaN = NaN``
and ``NaN > 5.0`` are both true, so predicates DO match NaN rows. Stats
must therefore place every NaN at the single topmost key. The raw
total-order transform would key a negative-bit-pattern NaN (sign bit set)
BELOW -inf — a chunk of such NaNs would then be wrongly pruned for
``x >= v`` or ``x = NaN``. :func:`f64_key_array` canonicalizes every NaN
bit pattern to ``key(float('nan'))`` (quiet positive NaN, topmost) so the
recorded stats match Spark's all-NaNs-equal-and-greatest order by
construction, whatever bit patterns ingest delivers.
"""

from __future__ import annotations

import numpy as np

_SIGN = np.uint64(1 << 63)


def f64_key_array(values: np.ndarray) -> np.ndarray:
    """float64 array -> order-preserving int64 keys (vectorized).

    NaNs are canonicalized first (any payload/sign -> quiet positive NaN)
    so every NaN maps to the one topmost key — see the module docstring.
    """
    v = np.ascontiguousarray(values, dtype=np.float64)
    if np.isnan(v).any():
        v = np.where(np.isnan(v), np.float64("nan"), v)
    b = v.view(np.int64)
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
    never pruned away from a predicate that matches them. (A NaN bound
    needs no special case here: under Spark's NaN-greatest semantics
    ``x = NaN`` matches exactly the NaN rows, and canonicalized NaN stats
    (:func:`f64_key_array`) put those at key(NaN) — which is what this
    function returns for a NaN bound.)
    """
    return f64_key(-0.0) if value == 0 else f64_key(value)


def f64_hi_key(value: float) -> int:
    """Upper predicate bound -> key; zero maps to key(+0.0) (see
    :func:`f64_lo_key`)."""
    return f64_key(0.0) if value == 0 else f64_key(value)
