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
