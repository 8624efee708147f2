"""Unit golden tests for the codec auto-selector (SURVEY.md §5.2-2).

Pure-function golden style mirrors the reference's schema-derivation test
(converter/schema_test.go:10-62): fixed inputs -> exact expected plan.
"""

from __future__ import annotations

import numpy as np

from vcf2df_spark import planner


def test_choose_low_cardinality_strings_dict():
    stats = planner.ColumnStats(n=10000, ndv=4, mean_run_len=1.2, is_int=False)
    assert planner.choose_codec(stats) == "dict"


def test_choose_long_runs_rle():
    stats = planner.ColumnStats(n=10000, ndv=800, mean_run_len=12.5, is_int=False)
    assert planner.choose_codec(stats) == "rle"


def test_choose_high_entropy_text_fsst():
    stats = planner.ColumnStats(n=10000, ndv=9900, mean_run_len=1.0,
                                is_int=False, avg_len=120.0)
    assert planner.choose_codec(stats) == "fsst"


def test_choose_small_ints_bitpack():
    stats = planner.ColumnStats(n=10000, ndv=200, mean_run_len=1.0, is_int=True,
                                int_min=0, int_max=199, sorted_frac=0.3)
    assert planner.choose_codec(stats) == "bitpack"


def test_choose_monotone_ts_fordelta():
    stats = planner.ColumnStats(n=10000, ndv=10000, mean_run_len=1.0, is_int=True,
                                int_min=0, int_max=10**15, sorted_frac=0.97)
    assert planner.choose_codec(stats) == "fordelta"


def test_empty_column_raw():
    assert planner.choose_codec(planner.ColumnStats(0, 0, 0.0, False)) == "raw"


def test_column_stats_runs_and_ndv():
    vals = np.array(["a"] * 10 + ["b"] * 10 + ["a"] * 10, dtype=object)
    s = planner.column_stats(vals)
    assert (s.n, s.ndv) == (30, 2)
    assert s.mean_run_len == 10.0


def test_column_stats_sorted_frac():
    vals = np.array([1, 2, 3, 4, 5, 4, 6, 7, 8, 9], dtype=np.int64)
    s = planner.column_stats(vals)
    assert s.is_int and 0.8 <= s.sorted_frac < 1.0


def test_encode_best_never_loses_to_raw():
    # adversarial: all-distinct long random strings — fsst may not win; the
    # measured fallback must cap encoded size at raw
    rng = np.random.default_rng(0)
    vals = np.array(
        ["".join(map(chr, rng.integers(0x4E00, 0x9FFF, 50))) for _ in range(200)],
        dtype=object,
    )
    codec, payload, aux, meta, raw_bytes = planner.encode_best(vals)
    assert len(payload) + len(aux) <= raw_bytes
