"""Local emulation of the driver's correctness gate: run every queries()
entry on Spark AND its oracle_sql() on DuckDB against the same sf0.001
parquet tables; compare row counts and values (columns sorted by name,
rows sorted, exact match after the queries' own rounding)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = __import__("os").environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind in "fc":
            df[c] = df[c].round(9)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _kinds(df: pd.DataFrame) -> dict:
    # int-family vs float-family vs other: the driver hashes rendered values,
    # so DuckDB HUGEINT->float64 (42.0) vs Spark bigint (42) is a REAL
    # mismatch even when numerically equal. Strict here = green at the driver.
    fam = {"i": "int", "u": "int", "f": "float", "c": "float"}
    return {c: fam.get(df[c].dtype.kind, "other") for c in df.columns}


def _all_queries():
    """Registered queries plus the unregistered demos — the demos stay
    parity-tested here even though the driver no longer sees them."""
    from vcf2df_spark.operators import relational, textops

    out = dict(entry_mod.queries())
    out.update(textops.DEMO_QUERIES)
    out.update(relational.DEMO_QUERIES)
    return out


def _all_oracles():
    from vcf2df_spark.operators import relational, textops

    out = dict(entry_mod.oracle_sql())
    out.update(textops.DEMO_ORACLES)
    out.update(relational.DEMO_ORACLES)
    return out


QUERY_NAMES = sorted(_all_queries())


def test_registry_fits_driver_window():
    # the driver checks at most 50 queries per round; a larger registry
    # leaves some operators without correctness evidence (round-2 verdict)
    assert len(entry_mod.queries()) <= 50


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = _all_queries()[name]
    sql = _all_oracles().get(name)
    got = q(spark, SF_DIR).toPandas()
    assert sql is not None, f"{name} has no oracle"
    want = duck.execute(sql).df()
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    g, w = _canon(got), _canon(want)
    assert list(g.columns) == list(w.columns), f"{name}: columns {list(g.columns)} vs {list(w.columns)}"
    assert _kinds(g) == _kinds(w), f"{name}: dtype families {_kinds(g)} vs {_kinds(w)} (DuckDB HUGEINT? add CAST(... AS BIGINT))"
    pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=False,
                                  rtol=0, atol=1e-9, obj=name)


def test_kmv_estimate_accuracy(spark, duck):
    # the registered kmv_distinct is combiner-only (no full-corpus
    # countDistinct — round-2 verdict #5); ground truth lives here instead
    got = _all_queries()["kmv_distinct"](spark, SF_DIR).collect()[0]
    exact = duck.execute(
        """
        SELECT count(DISTINCT cast(concat('0x', substr(md5(w), 1, 14)) as bigint))
        FROM (SELECT unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS w
              FROM documents)
        """
    ).fetchone()[0]
    est = got["ndv_estimate"]
    # K=64 KMV: relative stderr ~ 1/sqrt(K-1) ~ 12.7%; deterministic fixture
    assert exact * 0.6 <= est <= exact * 1.5, (est, exact)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 6  # one summary row per column at minimum
    assert {"column", "codec", "rows", "raw_bytes", "enc_bytes"} <= set(df.columns)
