"""Relational operators (SURVEY.md §2): the reference's dataflow semantics
re-expressed as declarative Spark plans over the driver testdata tables,
plus the join/agg/window/sort/set categories the reference lacks (§2.2)
that the target engine needs.

Every query here has an exactly-matching DuckDB oracle in ORACLES (same
column names, same rounding) for the driver's side-by-side value-hash
check. All plans are pure DataFrame API: filters/projections push down to
the parquet scan, small dimensions are broadcast, aggregates use Catalyst's
partial+final hash aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- aggregation (partial+final hash agg; reference has none, §2.2) -------

def q_agg_pricing(spark, sf_dir):
    """TPC-H Q1-shaped pricing summary (grouped agg with derived exprs)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# (P3 derived-key projection — the VARIANTKEY concat, formatOutput.go:21 —
# is exercised by the line_key column of q_type_narrowing below; it was a
# standalone query through round 2, merged to fit the driver's 50-query
# correctness window.)


# --- filter with pushdown (F1: early-exit predicate, parseVariant.go:20) ---

def q_filter_pushdown(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_rows"),
        )
    )


# --- explode / flatMap (E1: per-sample row explosion, convert.go:81-97) ----

def q_explode_wordcount(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .count()
        .orderBy(F.desc("count"), F.asc("word"))
        .limit(20)
    )


# --- missing-value imputation (P7: typed defaults, formatOutput.go:89) -----

def q_impute(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.coalesce(F.nullif(F.col("props"), F.lit("")), F.lit("{}")).alias(
                "props_filled"
            ),
            F.coalesce("value", F.lit(0.0)).alias("value_filled"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("props_filled") == "{}", 1).otherwise(0)).alias(
                "n_defaulted"
            ),
            F.round(F.sum("value_filled"), 2).alias("sum_value"),
        )
    )


# (array->string encode — P6 comma-joined arrays — lives in the head3
# column of q_doc_transforms below, merged with normalize_text.)


# --- type narrowing + derived key (P5 + P3, formatOutput.go:21-36) ---------

def q_type_narrowing(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.floor("l_extendedprice").cast("long").alias("price_int"),
        F.upper("l_returnflag").alias("flag"),
        (F.col("l_linenumber") + 1).cast("int").alias("linenumber_1based"),
        # P3: synthetic primary key, the VARIANTKEY CHR-POS-REF-ALT analogue
        F.concat_ws(
            "-", F.upper("l_returnflag"), F.col("l_orderkey"), F.col("l_linenumber")
        ).alias("line_key"),
    )


# --- per-user profile: lag-window run detection + conditional pivot --------
# merges round-2's window_runs (RLE-stats run counting via lag) and
# pivot_conditional (per-type conditional sums) into one per-user pass

def q_user_profile(spark, sf_dir):
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    runs = ev.withColumn(
        "is_new_run",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        ).otherwise(0),
    )
    pivots = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")
        for t in ("click", "view", "purchase", "signup", "error")
    ]
    return runs.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum("is_new_run").alias("n_runs"),
        *pivots,
    )


# --- broadcast join (§2.2: blocks x manifests shape) ------------------------

def q_join_broadcast(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


# --- semi + anti join (§2.2: the resume commit-log pattern) -----------------
# one query, both join types: semi = customers with orders, anti = without
# (the exact shape of manifest.resume_filter's committed-partition anti-join)

def q_semi_anti_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .select(F.lit("semi").alias("side"), "c_mktsegment", "n_customers")
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .select(F.lit("anti").alias("side"), "c_mktsegment", "n_customers")
    )
    return semi.unionByName(anti)


# --- sort / top-k (§2.2: skew diagnostics shape) -----------------------------

def q_topk(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


# --- set ops (§2.2: union/intersect/except in one tagged query) -------------

def q_set_ops(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    union = c.unionByName(s).distinct()
    inter = c.intersect(s)
    exc = c.distinct().subtract(s.distinct())  # set EXCEPT (not exceptAll)
    return (
        union.select(F.lit("union").alias("op"), "nationkey")
        .unionByName(inter.select(F.lit("intersect").alias("op"), "nationkey"))
        .unionByName(exc.select(F.lit("except").alias("op"), "nationkey"))
    )


# (regexp_extract — P2 text-field extraction — is exercised by the
# n_with_k_re column of q_json_extract below; standalone through round 2,
# merged to fit the driver's 50-query correctness window.)


# --- positional explode ----------------------------------------------------------

def q_posexplode(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    words = F.filter(F.split("text", " "), lambda w: w != "")
    return (
        docs.select("doc_id", F.posexplode(words).alias("pos", "word"))
        .filter(F.col("pos") < 5)
        .select("doc_id", "pos", "word")
    )


# --- stats profile (M1 analogue: the codec planner's sampler, §4.3) ----------

def q_stats_profile(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("event_type").alias("ndv_event_type"),
        F.countDistinct("user_id").alias("ndv_user_id"),
        F.round(F.min("value"), 4).alias("min_value"),
        F.round(F.max("value"), 4).alias("max_value"),
        F.round(F.avg(F.length("props")), 4).alias("avg_props_len"),
    )


# --- rollup + cube (§2.2 grouping sets, one tagged query) ---------------------

def q_rollup_cube(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")

    def shape(gdf, tag):
        return (
            gdf.agg(F.count("*").alias("n"),
                    F.round(F.sum("l_quantity"), 2).alias("qty"))
            .select(
                F.lit(tag).alias("gset"),
                F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
                F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
                "n", "qty",
            )
        )

    return shape(li.rollup("l_returnflag", "l_linestatus"), "rollup").unionByName(
        shape(li.cube("l_returnflag", "l_linestatus"), "cube")
    )


# --- range / interval join (§2.2 joins) ---------------------------------------

def q_range_join(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").alias("c")
    buys = ev.filter(F.col("event_type") == "purchase").alias("p")
    pairs = clicks.join(
        buys,
        (F.col("c.user_id") == F.col("p.user_id"))
        & (F.col("p.ts") >= F.col("c.ts"))
        & (F.col("p.ts") <= F.col("c.ts") + F.expr("interval 5 minutes")),
    )
    return pairs.groupBy(F.col("c.user_id").alias("user_id")).agg(
        F.count("*").alias("n_pairs")
    )


# --- as-of join via window frame (§2.2) ----------------------------------------

def q_asof_prior_click(spark, sf_dir):
    from pyspark.sql.window import Window

    spark.conf.set("spark.sql.session.timeZone", "UTC")  # epoch_us parity
    ev = _t(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")  # NTZ -> LTZ (UTC session)
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.unix_micros("ts"))
    ).over(w)
    return (
        ev.withColumn("last_click_us", last_click)
        .filter(F.col("event_type") == "purchase")
        .filter(F.col("last_click_us").isNotNull())
        .select(
            "event_id",
            "user_id",
            (F.unix_micros("ts") - F.col("last_click_us")).alias("gap_us"),
        )
    )


# --- sessionization (gap-based session windows over the event stream) ----------

def q_sessionize(spark, sf_dir):
    from pyspark.sql.window import Window

    spark.conf.set("spark.sql.session.timeZone", "UTC")  # epoch_us parity
    ev = _t(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    new_session = F.when(
        gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1
    ).otherwise(0)
    sessions = ev.withColumn(
        "session_idx",
        F.sum(new_session).over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return sessions.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))).alias(
            "duration_us"
        ),
    )


# --- JSON + regexp scalar extraction (P2 field-extraction analogue) --------------
# n_with_k_re extracts the same field with a regexp — both extraction
# surfaces in one query (regexp_extract was standalone through round 2)

def q_json_extract(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    k_re = F.regexp_extract("props", r'"k": (\d+)', 1)
    return ev.groupBy("event_type").agg(
        F.count(k).alias("n_with_k"),
        F.sum(k).cast("long").alias("sum_k"),
        F.min(k).cast("long").alias("min_k"),
        F.max(k).cast("long").alias("max_k"),
        F.count(F.when(k_re != "", 1)).alias("n_with_k_re"),
    )


# --- document transforms: text normalization + array->string encode --------------
# merges round-2's normalize_text (P5 in the text domain) and array_encode
# (P6 comma-joined arrays, formatOutput.go:60) into one per-doc projection

def q_doc_transforms(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return docs.select(
        "doc_id",
        F.md5(norm).alias("norm_hash"),
        F.array_join(F.slice(F.split("text", " "), 1, 3), ",").alias("head3"),
    )


# --- date/time functions ------------------------------------------------------------

def q_date_funcs(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
            "o_totalprice",
        )
        .groupBy("y", "m")
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )


# --- funnel analysis (ordered-stage conversion over the event stream) -----------------

def q_funnel(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    stages = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_buy"),
    )
    return stages.agg(
        F.count("*").alias("n_users"),
        F.sum(F.when(F.col("t_signup").isNotNull(), 1).otherwise(0)).alias("n_signup"),
        F.sum(
            F.when(
                F.col("t_signup").isNotNull()
                & F.col("t_click").isNotNull()
                & (F.col("t_click") > F.col("t_signup")),
                1,
            ).otherwise(0)
        ).alias("n_signup_then_click"),
        F.sum(
            F.when(
                F.col("t_signup").isNotNull()
                & F.col("t_click").isNotNull()
                & F.col("t_buy").isNotNull()
                & (F.col("t_click") > F.col("t_signup"))
                & (F.col("t_buy") > F.col("t_click")),
                1,
            ).otherwise(0)
        ).alias("n_full_funnel"),
    )


# --- window frames: bounded moving average + unbounded first/last ---------------------
# merges round-2's moving_avg (ROWS BETWEEN 2 PRECEDING) and
# first_last_window (unbounded-both frame) into one per-event projection

def q_window_frames(spark, sf_dir):
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    w3 = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    wall = (
        Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "event_id", "user_id",
        F.round(F.avg("value").over(w3), 4).alias("mavg3"),
        F.first("event_type").over(wall).alias("first_type"),
        F.last("event_type").over(wall).alias("last_type"),
    ).filter(F.col("user_id") < 50)


# (pivot-via-conditional-aggregation is exercised by the n_click..n_error
# columns of q_user_profile above, merged with window_runs.)


# --- sorted array aggregation -------------------------------------------------------------

def q_collect_sorted(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), "|").alias("nations"),
        F.count("*").alias("n_nations"),
    )


# --- ranking windows (row_number/rank/dense_rank) ---------------------------------

def q_rank_windows(spark, sf_dir):
    from pyspark.sql.window import Window

    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        c.select(
            "c_custkey", "c_nationkey",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


# --- correlated-subquery shape (above-group-average filter) -------------------------

def q_above_nation_avg(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    avg_by_nation = c.groupBy("c_nationkey").agg(
        F.avg("c_acctbal").alias("nation_avg")
    )
    return (
        c.join(F.broadcast(avg_by_nation), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_above_avg"))
    )


# --- string functions (P5-style scalar surface) --------------------------------------

def q_string_funcs(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.substring("n_name", 1, 3).alias("prefix3"),
        F.lpad("n_name", 12, ".").alias("padded"),
        F.reverse("n_name").alias("reversed"),
        F.length("n_name").alias("name_len"),
        F.concat_ws("/", "n_name", F.col("n_regionkey").cast("string")).alias("tagged"),
    )


# --- edit-distance near-pairs (levenshtein over blocked candidates) -------------------

def q_levenshtein_pairs(spark, sf_dir):
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    a, b = p.alias("a"), p.alias("b")
    pairs = a.join(
        b,
        (F.col("a.p_partkey") < F.col("b.p_partkey"))
        & (F.substring(F.col("a.p_brand"), 1, 6)
           == F.substring(F.col("b.p_brand"), 1, 6)),
    )
    return (
        pairs.select(
            F.col("a.p_brand").alias("brand_a"),
            F.col("b.p_brand").alias("brand_b"),
            F.levenshtein(F.col("a.p_brand"), F.col("b.p_brand")).alias("dist"),
        )
        .filter(F.col("dist") <= 1)
        .groupBy("brand_a", "brand_b", "dist")
        .agg(F.count("*").alias("n_pairs"))
    )


# --- value histogram: bucketed agg + exact per-bucket percentiles -----------------
# merges round-2's histogram (floor-bucketing) and percentiles (exact
# interpolated percentile) into one bucket-grain aggregation

def q_value_histogram(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(F.floor(F.col("value") / 50).cast("long").alias("bucket"), "value")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
        )
    )


# registry note (round 3): consolidated from 37 entries to 27 so the full
# 49-query registry fits the driver's 50-row correctness window. Every
# round-2 operator is still exercised — merged queries name their ancestors
# in the per-function comments above.
QUERIES = {
    "agg_pricing": q_agg_pricing,
    "rollup_cube": q_rollup_cube,
    "range_join": q_range_join,
    "asof_prior_click": q_asof_prior_click,
    "value_histogram": q_value_histogram,
    "sessionize": q_sessionize,
    "json_extract": q_json_extract,
    "doc_transforms": q_doc_transforms,
    "rank_windows": q_rank_windows,
    "above_nation_avg": q_above_nation_avg,
    "string_funcs": q_string_funcs,
    "levenshtein_pairs": q_levenshtein_pairs,
    "date_funcs": q_date_funcs,
    "funnel": q_funnel,
    "window_frames": q_window_frames,
    "filter_pushdown": q_filter_pushdown,
    "explode_wordcount": q_explode_wordcount,
    "impute": q_impute,
    "type_narrowing": q_type_narrowing,
    "user_profile": q_user_profile,
    "join_broadcast": q_join_broadcast,
    "semi_anti_join": q_semi_anti_join,
    "topk": q_topk,
    "set_ops": q_set_ops,
    "stats_profile": q_stats_profile,
}

ORACLES = {
    "rollup_cube": """
        SELECT 'rollup' AS gset,
               coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               count(*) AS n, round(sum(l_quantity), 2) AS qty
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        UNION ALL
        SELECT 'cube' AS gset,
               coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               count(*) AS n, round(sum(l_quantity), 2) AS qty
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    "range_join": """
        SELECT c.user_id AS user_id, count(*) AS n_pairs
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 5 MINUTE
        GROUP BY c.user_id
    """,
    "asof_prior_click": """
        SELECT event_id, user_id, epoch_us(ts) - last_click_us AS gap_us
        FROM (
            SELECT event_id, user_id, ts, event_type,
                   max(CASE WHEN event_type = 'click'
                            THEN epoch_us(ts) END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS last_click_us
            FROM events
        )
        WHERE event_type = 'purchase' AND last_click_us IS NOT NULL
    """,
    "value_histogram": """
        SELECT CAST(floor(value / 50) AS BIGINT) AS bucket, count(*) AS n,
               round(CAST(quantile_cont(value, 0.5) AS DOUBLE), 4) AS p50,
               round(CAST(quantile_cont(value, 0.95) AS DOUBLE), 4) AS p95
        FROM events GROUP BY 1
    """,
    "sessionize": """
        WITH gaps AS (
            SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                   epoch_us(ts) - lag(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
            FROM events
        ), marked AS (
            SELECT user_id, event_id, ts_us,
                   CAST(sum(CASE WHEN gap_us IS NULL OR gap_us > 30*60*1000000
                            THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS session_idx
            FROM gaps
        )
        SELECT user_id, session_idx, count(*) AS n_events,
               max(ts_us) - min(ts_us) AS duration_us
        FROM marked GROUP BY user_id, session_idx
    """,
    "window_frames": """
        SELECT event_id, user_id,
               round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mavg3,
               first_value(event_type) OVER w AS first_type,
               last_value(event_type) OVER w AS last_type
        FROM events WHERE user_id < 50
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    "date_funcs": """
        SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
               count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
        FROM orders GROUP BY 1, 2
    """,
    "funnel": """
        WITH stages AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
                   min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                   min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
            FROM events GROUP BY user_id
        )
        SELECT count(*) AS n_users,
               CAST(sum(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_signup,
               CAST(sum(CASE WHEN t_signup IS NOT NULL AND t_click IS NOT NULL
                             AND t_click > t_signup THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_signup_then_click,
               CAST(sum(CASE WHEN t_signup IS NOT NULL AND t_click IS NOT NULL
                             AND t_buy IS NOT NULL AND t_click > t_signup
                             AND t_buy > t_click THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_full_funnel
        FROM stages
    """,
    "rank_windows": """
        SELECT c_custkey, c_nationkey, rn, rnk, drnk FROM (
            SELECT c_custkey, c_nationkey,
                   row_number() OVER w AS rn,
                   rank() OVER w AS rnk,
                   dense_rank() OVER w AS drnk
            FROM customer
            WINDOW w AS (PARTITION BY c_nationkey
                         ORDER BY c_acctbal DESC, c_custkey ASC)
        ) WHERE rn <= 3
    """,
    "above_nation_avg": """
        SELECT c_nationkey, count(*) AS n_above_avg
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        GROUP BY c_nationkey
    """,
    "string_funcs": """
        SELECT n_nationkey,
               substr(n_name, 1, 3) AS prefix3,
               lpad(n_name, 12, '.') AS padded,
               reverse(n_name) AS reversed,
               length(n_name) AS name_len,
               concat_ws('/', n_name, CAST(n_regionkey AS VARCHAR)) AS tagged
        FROM nation
    """,
    "levenshtein_pairs": """
        SELECT brand_a, brand_b, dist, count(*) AS n_pairs FROM (
            SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
                   levenshtein(a.p_brand, b.p_brand) AS dist
            FROM part a JOIN part b
              ON a.p_partkey < b.p_partkey
             AND substr(a.p_brand, 1, 6) = substr(b.p_brand, 1, 6)
        ) WHERE dist <= 1
        GROUP BY brand_a, brand_b, dist
    """,
    "json_extract": """
        SELECT event_type,
               count(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS n_with_k,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER))
                    AS BIGINT) AS sum_k,
               CAST(min(CAST(json_extract_string(props, '$.k') AS INTEGER))
                    AS BIGINT) AS min_k,
               CAST(max(CAST(json_extract_string(props, '$.k') AS INTEGER))
                    AS BIGINT) AS max_k,
               count(nullif(regexp_extract(props, '"k": (\\d+)', 1), ''))
                    AS n_with_k_re
        FROM events GROUP BY event_type
    """,
    "doc_transforms": """
        SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS norm_hash,
               array_to_string(list_slice(string_split(text, ' '), 1, 3), ',') AS head3
        FROM documents
    """,
    "agg_pricing": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "filter_pushdown": """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
               count(*) AS n_rows
        FROM lineitem
        WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
    """,
    "explode_wordcount": """
        SELECT word, count(*) AS count
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE word <> ''
        GROUP BY word ORDER BY count DESC, word ASC LIMIT 20
    """,
    "impute": """
        SELECT event_type, count(*) AS n,
               CAST(sum(CASE WHEN coalesce(nullif(props, ''), '{}') = '{}'
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_defaulted,
               round(sum(coalesce(value, 0.0)), 2) AS sum_value
        FROM events GROUP BY event_type
    """,
    "type_narrowing": """
        SELECT l_orderkey, l_linenumber,
               CAST(floor(l_extendedprice) AS BIGINT) AS price_int,
               upper(l_returnflag) AS flag,
               CAST(l_linenumber + 1 AS INTEGER) AS linenumber_1based,
               concat_ws('-', upper(l_returnflag), l_orderkey, l_linenumber)
                   AS line_key
        FROM lineitem
    """,
    "user_profile": """
        SELECT user_id, count(*) AS n_events,
               CAST(sum(is_new_run) AS BIGINT) AS n_runs,
               CAST(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_click,
               CAST(sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_view,
               CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_purchase,
               CAST(sum(CASE WHEN event_type='signup' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_signup,
               CAST(sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_error
        FROM (
            SELECT user_id, event_type,
                   CASE WHEN lag(event_type) OVER w IS NULL
                             OR lag(event_type) OVER w <> event_type
                        THEN 1 ELSE 0 END AS is_new_run
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ) GROUP BY user_id
    """,
    "join_broadcast": """
        SELECT n_name, round(sum(o_totalprice), 2) AS revenue,
               count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "semi_anti_join": """
        SELECT 'semi' AS side, c_mktsegment, count(*) AS n_customers
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment
        UNION ALL
        SELECT 'anti' AS side, c_mktsegment, count(*) AS n_customers
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment
    """,
    "topk": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    "set_ops": """
        SELECT 'union' AS op, nationkey FROM (
            SELECT DISTINCT nationkey FROM (
                SELECT c_nationkey AS nationkey FROM customer
                UNION ALL
                SELECT s_nationkey AS nationkey FROM supplier
            )
        )
        UNION ALL
        SELECT 'intersect' AS op, nationkey FROM (
            SELECT c_nationkey AS nationkey FROM customer
            INTERSECT
            SELECT s_nationkey FROM supplier
        )
        UNION ALL
        SELECT 'except' AS op, nationkey FROM (
            SELECT c_nationkey AS nationkey FROM customer
            EXCEPT
            SELECT s_nationkey FROM supplier
        )
    """,
    "stats_profile": """
        SELECT count(*) AS n_rows,
               count(DISTINCT event_type) AS ndv_event_type,
               count(DISTINCT user_id) AS ndv_user_id,
               round(min(value), 4) AS min_value,
               round(max(value), 4) AS max_value,
               round(avg(length(props)), 4) AS avg_props_len
        FROM events
    """,
}


# demoted to pytest-parity-only demos (r4): sorts/top-k evidence is carried
# by `topk`, explode evidence by `explode_wordcount` — these two freed the
# driver-registry slots for the streaming queries (operators/streamq.py)
DEMO_QUERIES = {
    "collect_sorted": q_collect_sorted,
    "posexplode": q_posexplode,
}

DEMO_ORACLES = {
    "collect_sorted": """
        SELECT n_regionkey,
               array_to_string(list_sort(list(n_name)), '|') AS nations,
               count(*) AS n_nations
        FROM nation GROUP BY n_regionkey
    """,
    "posexplode": """
        WITH w AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS ws
            FROM documents WHERE doc_id < 50
        ), idx AS (
            SELECT doc_id, ws,
                   unnest(generate_series(1, len(ws))) AS i
            FROM w
        )
        SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, ws[i] AS word
        FROM idx WHERE i <= 5
    """,
}
