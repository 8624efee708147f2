"""Fast distributed equality checks between two transcript DataFrames.

``exceptAll`` both ways is exact but shuffles the full data twice. For the
routine bit-identity gate we instead compare order-insensitive multiset
signatures computed map-side: per row a 64-bit content hash, aggregated
with count + XOR + modular sum. Each aggregate is commutative, so Catalyst
computes them as partial+final with no full-data shuffle — O(rows) scan,
O(1) shuffle. Collision odds for accidental equality are ~2^-64 per
aggregate and the three aggregates are independent checks.

The deep (exact) path stays available for forensics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_P = 2_147_483_629  # large 31-bit prime: modular sum stays overflow-free


def _signature(df: DataFrame):
    from pyspark.sql import types as T

    # hash EVERY column (dynamic schema), sorted by name so both sides
    # agree on order; timestamps as unix_micros, doubles as raw IEEE-754
    # bit patterns (xxhash64 canonicalizes NaN payloads and -0.0, which
    # would mask a codec corrupting those bits — ADVICE r2)
    exprs = []
    needs_udf = False
    for name in sorted(df.columns):
        field = df.schema[name]
        if isinstance(field.dataType, (T.TimestampType, T.TimestampNTZType)):
            exprs.append(F.unix_micros(name))
        elif isinstance(field.dataType, (T.DoubleType, T.FloatType)):
            from .functions import f64_bits

            exprs.append(f64_bits(F.col(name).cast("double")))
            needs_udf = True
        else:
            exprs.append(F.col(name))
    if needs_udf:
        from .shipping import ensure_shipped

        ensure_shipped(df.sparkSession)
    sig = F.xxhash64(*exprs)
    return df.select(
        F.count("*").alias("n"),
        F.bit_xor(sig).alias("h_xor"),
        F.sum(F.pmod(sig, F.lit(_P))).alias("h_sum"),
    ).collect()[0]


def multiset_equal(left: DataFrame, right: DataFrame) -> dict:
    """Order-insensitive multiset equality over all shared columns.

    The two signature aggregates are independent Spark jobs — submitted
    from two driver threads so the cheaper side's tasks back-fill the
    other's idle executors (guide §2.6) instead of running back to back.
    """
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    cols_equal = set(left.columns) == set(right.columns)
    common = sorted(set(left.columns) & set(right.columns))
    left, right = left.select(*common), right.select(*common)
    spark = left.sparkSession
    with ThreadPoolExecutor(max_workers=2) as pool:
        fl = pool.submit(inheritable_thread_target(spark)(
            lambda: _signature(left)))
        fr = pool.submit(inheritable_thread_target(spark)(
            lambda: _signature(right)))
        l, r = fl.result(), fr.result()
    return {
        "equal": cols_equal and (l.n, l.h_xor, l.h_sum) == (r.n, r.h_xor, r.h_sum),
        "rows_left": l.n,
        "rows_right": r.n,
    }
