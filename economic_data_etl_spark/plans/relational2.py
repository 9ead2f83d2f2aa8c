"""Breadth extension of the relational surface: subqueries (correlated /
EXISTS shapes), pivot/unpivot, statistical aggregates, percentiles,
ordered string aggregation, word counts via explode, calendar fill with
generated sequences, regexp extraction, FILTER-style conditional
aggregation, approximate distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.operators.topk import grouped_top_k
from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.sources.tables import load_table


def _r(col):
    return biased_round(col)


# --------------------------------------------------------------------------
# Correlated-subquery shape: rows matching their group's minimum.
# --------------------------------------------------------------------------
@register(
    "subquery_min_per_group",
    oracle="""
        SELECT p.p_brand, p.p_partkey, p.p_retailprice
        FROM part p
        WHERE p.p_retailprice = (
            SELECT MIN(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
        )
        ORDER BY p.p_brand, p.p_partkey
    """,
    doc="TPC-H Q2 shape: correlated min subquery, decorrelated to a "
    "groupBy-min + join in the DataFrame plan (one extra agg, no per-row scan).",
)
def subquery_min_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    mins = part.groupBy(F.col("p_brand").alias("mb")).agg(
        F.min("p_retailprice").alias("min_price")
    )
    return (
        part.join(
            F.broadcast(mins),
            (part.p_brand == mins.mb) & (part.p_retailprice == mins.min_price),
        )
        .select("p_brand", "p_partkey", "p_retailprice")
        .orderBy("p_brand", "p_partkey")
    )


# --------------------------------------------------------------------------
# EXISTS correlated subquery (TPC-H Q4 shape).
# --------------------------------------------------------------------------
@register(
    "subquery_exists_late_lineitems",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-07-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    doc="EXISTS correlated subquery → left-semi join on (orderkey, date cond).",
)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    semi = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        semi.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item revenue per customer, top 20.
# --------------------------------------------------------------------------
@register(
    "q10_returned_item_revenue",
    oracle="""
        SELECT c_custkey, c_name, n_name,
               ROUND(5e-10 + SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1997-04-01'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    doc="Fact-fact join + broadcast dims + agg + top-20 (TPC-H Q10 shape).",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            _r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Pivot (wide conditional aggregation).
# --------------------------------------------------------------------------
@register(
    "pivot_status_by_priority",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
               COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
               COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    doc="Pivot via GroupedData.pivot with explicit values (single-pass "
    "conditional aggregation, no second scan for value discovery).",
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return (
        pv.select(
            "o_orderpriority",
            F.coalesce(F.col("F"), F.lit(0)).alias("status_f"),
            F.coalesce(F.col("O"), F.lit(0)).alias("status_o"),
            F.coalesce(F.col("P"), F.lit(0)).alias("status_p"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Unpivot (melt wide → long).
# --------------------------------------------------------------------------
@register(
    "unpivot_part_measures",
    oracle="""
        SELECT p_partkey, metric, ROUND(5e-10 + val, 4) AS val FROM (
            SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
            UNION ALL
            SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS val FROM part
        ) t
        WHERE p_partkey < 100
        ORDER BY p_partkey, metric
    """,
    doc="unpivot/melt: two measure columns → (metric, val) long format.",
)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    wide = part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    )
    long = wide.unpivot("p_partkey", ["size", "retailprice"], "metric", "val")
    return long.select(
        "p_partkey", "metric", _r(F.col("val")).alias("val")
    ).orderBy("p_partkey", "metric")


# --------------------------------------------------------------------------
# Statistical aggregates + percentiles.
# --------------------------------------------------------------------------
@register(
    "agg_statistics",
    oracle="""
        SELECT l_returnflag,
               ROUND(5e-10 + stddev_samp(l_quantity), 4)                 AS sd_qty,
               ROUND(5e-10 + var_samp(l_extendedprice), 4)               AS var_price,
               ROUND(5e-10 + corr(l_quantity, l_extendedprice), 4)       AS corr_qty_price,
               ROUND(5e-10 + covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
               ROUND(5e-10 + quantile_cont(l_quantity, 0.5), 4)          AS median_qty,
               ROUND(5e-10 + quantile_cont(l_extendedprice, 0.9), 4)     AS p90_price
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    doc="stddev/variance/corr/covar + interpolated percentiles per group.",
)
def agg_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            _r(F.stddev_samp("l_quantity")).alias("sd_qty"),
            _r(F.var_samp("l_extendedprice")).alias("var_price"),
            _r(F.corr("l_quantity", "l_extendedprice")).alias("corr_qty_price"),
            _r(F.covar_samp("l_quantity", "l_extendedprice")).alias("covar_qty_price"),
            _r(F.expr("percentile(l_quantity, 0.5)")).alias("median_qty"),
            _r(F.expr("percentile(l_extendedprice, 0.9)")).alias("p90_price"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Ordered string aggregation (deterministic list → csv).
# --------------------------------------------------------------------------
@register(
    "agg_string_collect",
    oracle="""
        SELECT p_brand,
               array_to_string(list_sort(list_distinct(list(p_type))), ',') AS types_csv
        FROM part
        GROUP BY p_brand
        ORDER BY p_brand
    """,
    doc="collect_set → array_sort → join: deterministic ordered string agg.",
)
def agg_string_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy("p_brand")
        .agg(
            F.array_join(F.array_sort(F.collect_set("p_type")), ",").alias(
                "types_csv"
            )
        )
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------------
# Explode + count: document word frequencies, top 20.
# --------------------------------------------------------------------------
@register(
    "text_top_words",
    oracle=r"""
        SELECT word, COUNT(*) AS n FROM (
            SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                                      x -> x <> '')) AS word
            FROM documents
        ) t
        GROUP BY word
        ORDER BY n DESC, word ASC
        LIMIT 20
    """,
    doc="explode(split(text)) → word count → top-20 (map-side partial agg "
    "makes this a tiny shuffle even at corpus scale).",
)
def text_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.filter(F.split("text", "\\s+"), lambda t: t != "")).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Calendar fill: generated date sequence left-joined to order counts.
# --------------------------------------------------------------------------
@register(
    "calendar_fill_daily_orders",
    oracle="""
        WITH bounds AS (
            SELECT CAST(MIN(o_orderdate) AS DATE) AS lo,
                   CAST(MAX(o_orderdate) AS DATE) AS hi
            FROM orders
        ), days AS (
            SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
            FROM bounds
        ), per_day AS (
            SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
            FROM orders GROUP BY 1
        )
        SELECT CAST(d.day AS TIMESTAMP) AS day, COALESCE(p.n, 0) AS n_orders
        FROM days d LEFT JOIN per_day p ON d.day = p.day
        WHERE d.day < DATE '1995-04-01'
        ORDER BY d.day
    """,
    doc="sequence()+explode generates the calendar spine distributively "
    "(no driver-side date loop); left join fills gaps with zero.",
)
def calendar_fill_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("hi"),
    )
    days = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    per_day = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        days.join(per_day, "day", "left")
        .filter(F.col("day") < F.lit("1995-04-01").cast("date"))
        .select(
            F.col("day").cast("timestamp").alias("day"),
            F.coalesce("n", F.lit(0)).alias("n_orders"),
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# Regexp extraction + FILTER-style conditional aggregation.
# --------------------------------------------------------------------------
@register(
    "regexp_extract_part_nouns",
    oracle="""
        SELECT regexp_extract(p_name, '([a-z]+)$', 1) AS noun,
               COUNT(*) AS n,
               COUNT(*) FILTER (WHERE p_size >= 25) AS n_large,
               ROUND(5e-10 + AVG(p_retailprice) FILTER (WHERE p_type = 'ECONOMY'), 4)
                   AS avg_economy_price
        FROM part
        GROUP BY 1
        ORDER BY noun
    """,
    doc="regexp_extract group capture + FILTER(WHERE) conditional aggregates.",
)
def regexp_extract_part_nouns(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy(
            F.regexp_extract("p_name", "([a-z]+)$", 1).alias("noun")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("p_size") >= 25, 1)).alias("n_large"),
            _r(
                F.avg(F.when(F.col("p_type") == "ECONOMY", F.col("p_retailprice")))
            ).alias("avg_economy_price"),
        )
        .orderBy("noun")
    )


# --------------------------------------------------------------------------
# Approximate count-distinct (HLL — implementation-specific, rows-only).
# --------------------------------------------------------------------------
@register(
    "agg_approx_count_distinct",
    oracle=None,
    doc="approx_count_distinct (HyperLogLog++): sketch values differ across "
    "engines by design, so the check is rows-only; the exact companion is "
    "agg_distinct_parts_per_brand.",
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .orderBy("l_returnflag")
    )
