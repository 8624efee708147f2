"""The f64 total-order key must compare exactly like the doubles it maps."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from vcf2df_spark.zonemap import f64_key, f64_key_array

EDGES = [0.0, -0.0, 1.0, -1.0, 5e-324, -5e-324, 1.5e308, -1.5e308,
         float("inf"), float("-inf")]


def test_edge_ordering():
    keys = [f64_key(x) for x in EDGES]
    order = sorted(range(len(EDGES)), key=lambda i: keys[i])
    assert [EDGES[i] for i in order] == sorted(EDGES)
    assert f64_key(-0.0) < f64_key(0.0)  # total order, not IEEE equality


@given(st.lists(st.floats(allow_nan=False, width=64), min_size=2, max_size=50))
@settings(max_examples=200, deadline=None)
def test_key_order_matches_double_order(xs):
    arr = np.array(xs, dtype=np.float64)
    keys = f64_key_array(arr)
    by_key = arr[np.argsort(keys, kind="stable")]
    assert np.array_equal(np.sort(arr), by_key) or np.array_equal(
        np.sort(arr), np.where(by_key == 0.0, 0.0, by_key)
    )  # -0.0/+0.0 tie order differs from numpy's but values are equal


def test_nan_maps_above_inf():
    assert f64_key(float("nan")) > f64_key(float("inf"))


def test_negative_bitpattern_nan_canonicalized():
    """Spark's semantics make every NaN equal and greatest; a sign-bit-set
    NaN delivered by a non-Spark ingest must not key below -inf (it would
    wrongly prune its chunk for ``x >= v`` and ``x = NaN``)."""
    neg_nan = np.frombuffer(
        np.uint64(0xFFF8000000000001).tobytes(), dtype=np.float64
    )[0]
    arr = np.array([neg_nan, float("nan"), -np.inf, 3.5], dtype=np.float64)
    keys = f64_key_array(arr)
    assert keys[0] == keys[1] == f64_key(float("nan"))
    assert keys.max() == f64_key(float("nan"))

    # the pure pruner keeps a chunk of such NaNs for NaN-matching predicates
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual

    from vcf2df_spark.datasource import chunk_overlaps

    stats = {"score": {"stat_min_num": int(keys.min()),
                       "stat_max_num": int(keys.max())}}
    ctypes = {"score": "f64"}
    assert chunk_overlaps([GreaterThanOrEqual(("score",), 1.0)], stats, ctypes)
    assert chunk_overlaps([EqualTo(("score",), float("nan"))], stats, ctypes)
