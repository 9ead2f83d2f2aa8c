"""Window functions, multi-dimensional aggregates, scalar function surface.

Covers SURVEY.md §2.5 (window functions), §2.4 extensions (rollup / cube /
grouping sets), and §2.8 (string / date / math / JSON scalar functions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from economic_data_etl_spark.operators.topk import grouped_top_k
from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.sources.tables import load_table


def _r(col):
    return biased_round(col)


# --------------------------------------------------------------------------
# Window: ranking (top-3 parts per brand by price).
# --------------------------------------------------------------------------
@register(
    "window_rank_parts_per_brand",
    oracle="""
        SELECT p_brand, p_partkey, p_retailprice, rnk FROM (
            SELECT p_brand, p_partkey, p_retailprice,
                   ROW_NUMBER() OVER (
                       PARTITION BY p_brand
                       ORDER BY p_retailprice DESC, p_partkey ASC
                   ) AS rnk
            FROM part
        ) t
        WHERE rnk <= 3
        ORDER BY p_brand, rnk
    """,
    doc="Grouped top-k via row_number window (WindowGroupLimit pushdown).",
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        grouped_top_k(
            part.select("p_brand", "p_partkey", "p_retailprice"),
            ["p_brand"],
            [F.desc("p_retailprice"), F.asc("p_partkey")],
            3,
            rank_col="rnk",
        )
        .select("p_brand", "p_partkey", "p_retailprice", "rnk")
        .orderBy("p_brand", "rnk")
    )


# --------------------------------------------------------------------------
# Window: analytic frame (moving average over preceding rows).
# --------------------------------------------------------------------------
@register(
    "window_moving_avg_order_price",
    oracle="""
        SELECT o_custkey, o_orderkey,
               ROUND(5e-10 + AVG(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               ), 4) AS moving_avg
        FROM orders
        ORDER BY o_custkey, o_orderkey
    """,
    doc="rowsBetween(-2, 0) running average per customer.",
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            _r(F.avg("o_totalprice").over(w)).alias("moving_avg"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# --------------------------------------------------------------------------
# Window: lag/lead + cumulative sum.
# --------------------------------------------------------------------------
@register(
    "window_lag_cumsum",
    oracle="""
        SELECT o_custkey, o_orderkey,
               ROUND(5e-10 + o_totalprice - LAG(o_totalprice) OVER w, 4) AS delta_prev,
               ROUND(5e-10 + SUM(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 4) AS cum_spend
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, o_orderkey
    """,
    doc="lag() delta + running total in one window pass.",
)
def window_lag_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            _r(F.col("o_totalprice") - F.lag("o_totalprice").over(w)).alias(
                "delta_prev"
            ),
            _r(F.sum("o_totalprice").over(w_cum)).alias("cum_spend"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# --------------------------------------------------------------------------
# Window: rank family (dense_rank / percent_rank / ntile).
# --------------------------------------------------------------------------
@register(
    "window_rank_family",
    oracle="""
        SELECT s_suppkey, s_acctbal,
               DENSE_RANK()   OVER w AS drnk,
               CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
               ROUND(5e-10 + PERCENT_RANK() OVER w, 4) AS pct_rank
        FROM supplier
        WINDOW w AS (ORDER BY s_acctbal DESC, s_suppkey ASC)
        ORDER BY s_suppkey
    """,
    doc="dense_rank / ntile / percent_rank over a global ordering.",
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    w = Window.orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return (
        supp.select(
            "s_suppkey",
            "s_acctbal",
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
            _r(F.percent_rank().over(w)).alias("pct_rank"),
        )
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Rollup / cube / grouping sets.
# --------------------------------------------------------------------------
@register(
    "agg_rollup_orders",
    oracle="""
        SELECT o_orderpriority, o_orderstatus,
               COUNT(*) AS n_orders,
               ROUND(5e-10 + SUM(o_totalprice), 4) AS total_price
        FROM orders
        GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
    """,
    doc="ROLLUP hierarchy: (priority,status) → (priority) → ().",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _r(F.sum("o_totalprice")).alias("total_price"),
        )
        .orderBy(
            F.col("o_orderpriority").asc_nulls_first(),
            F.col("o_orderstatus").asc_nulls_first(),
        )
    )


@register(
    "agg_cube_lineitem",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n,
               ROUND(5e-10 + AVG(l_quantity), 4) AS avg_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="CUBE: all 4 grouping-set combinations.",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), _r(F.avg("l_quantity")).alias("avg_qty"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "agg_grouping_sets",
    oracle="""
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
        ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
    """,
    doc="Explicit GROUPING SETS — two independent groupings in one pass.",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__gs_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
        FROM __gs_orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
        ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST
        """
    )


# --------------------------------------------------------------------------
# Scalar functions: strings.
# --------------------------------------------------------------------------
@register(
    "scalar_string_functions",
    oracle="""
        SELECT
            p_partkey,
            UPPER(p_name)                                   AS name_upper,
            LENGTH(p_name)                                  AS name_len,
            SUBSTRING(p_type, 1, 3)                         AS type_prefix,
            CONCAT(p_brand, ':', p_type)                    AS brand_type,
            REPLACE(p_name, 'a', '@')                       AS name_replaced,
            CASE WHEN p_size >= 25 THEN 'large' ELSE 'small' END AS size_class,
            CAST(STRPOS(p_name, 'e') AS INT)                AS first_e
        FROM part
        ORDER BY p_partkey
        LIMIT 100
    """,
    doc="upper/length/substring/concat/replace/case/instr surface.",
)
def scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.length("p_name").alias("name_len"),
            F.substring("p_type", 1, 3).alias("type_prefix"),
            F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
            F.regexp_replace("p_name", "a", "@").alias("name_replaced"),
            F.when(F.col("p_size") >= 25, "large").otherwise("small").alias(
                "size_class"
            ),
            F.instr(F.col("p_name"), "e").alias("first_e"),
        )
        .orderBy("p_partkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Scalar functions: dates.
# --------------------------------------------------------------------------
@register(
    "scalar_date_functions",
    oracle="""
        SELECT
            o_orderkey,
            CAST(EXTRACT(YEAR  FROM o_orderdate) AS INT)  AS order_year,
            CAST(EXTRACT(MONTH FROM o_orderdate) AS INT)  AS order_month,
            CAST(EXTRACT(DAY   FROM o_orderdate) AS INT)  AS order_day,
            CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS order_quarter,
            CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
            CAST(o_orderdate AS DATE) + INTERVAL 30 DAY   AS due_ts,
            CAST(DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT) AS days_to_y2k
        FROM orders
        ORDER BY o_orderkey
        LIMIT 100
    """,
    doc="year/month/day/quarter/date_trunc/date arithmetic/datediff surface.",
)
def scalar_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.dayofmonth("o_orderdate").alias("order_day"),
            F.quarter("o_orderdate").alias("order_quarter"),
            F.date_trunc("month", "o_orderdate").alias("month_start"),
            (F.col("o_orderdate").cast("date") + F.expr("INTERVAL 30 DAYS"))
            .cast("timestamp")
            .alias("due_ts"),
            F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
                "days_to_y2k"
            ),
        )
        .orderBy("o_orderkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Scalar functions: math.
# --------------------------------------------------------------------------
@register(
    "scalar_math_functions",
    oracle="""
        SELECT
            l_orderkey,
            l_linenumber,
            ROUND(5e-10 + ABS(l_discount - 0.05), 4)            AS abs_disc_diff,
            CAST(CEIL(l_quantity) AS BIGINT)            AS qty_ceil,
            CAST(FLOOR(l_extendedprice / 100) AS BIGINT) AS price_hundreds,
            ROUND(5e-10 + SQRT(l_extendedprice), 4)             AS price_sqrt,
            ROUND(5e-10 + LN(l_extendedprice + 1), 4)           AS price_ln,
            ROUND(5e-10 + POWER(1 + l_tax, 2), 4)               AS tax_sq,
            CAST(l_linenumber % 3 AS INT)               AS line_mod3,
            ROUND(5e-10 + GREATEST(l_discount, l_tax), 4)       AS max_rate,
            ROUND(5e-10 + LEAST(l_discount, l_tax), 4)          AS min_rate
        FROM lineitem
        WHERE l_orderkey <= 200
        ORDER BY l_orderkey, l_linenumber
    """,
    doc="abs/ceil/floor/sqrt/ln/power/mod/greatest/least surface.",
)
def scalar_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") <= 200)
        .select(
            "l_orderkey",
            "l_linenumber",
            _r(F.abs(F.col("l_discount") - 0.05)).alias("abs_disc_diff"),
            F.ceil("l_quantity").alias("qty_ceil"),
            F.floor(F.col("l_extendedprice") / 100).alias("price_hundreds"),
            _r(F.sqrt("l_extendedprice")).alias("price_sqrt"),
            _r(F.log(F.col("l_extendedprice") + 1)).alias("price_ln"),
            _r(F.pow(F.lit(1) + F.col("l_tax"), 2)).alias("tax_sq"),
            (F.col("l_linenumber") % 3).cast("int").alias("line_mod3"),
            _r(F.greatest("l_discount", "l_tax")).alias("max_rate"),
            _r(F.least("l_discount", "l_tax")).alias("min_rate"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# --------------------------------------------------------------------------
# JSON access (events.props is a JSON string).
# --------------------------------------------------------------------------
@register(
    "scalar_json_extract",
    oracle="""
        SELECT
            event_type,
            COUNT(*) AS n,
            CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
            ROUND(5e-10 + AVG(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc="get_json_object over a stringly-JSON column + aggregate.",
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            _r(F.avg("k")).alias("avg_k"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Conditional / null-handling surface (coalesce, nullif, nvl-chain).
# --------------------------------------------------------------------------
@register(
    "scalar_null_handling",
    oracle="""
        SELECT
            c_custkey,
            COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_or_other,
            CASE
                WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'rich'
            END AS balance_band,
            ROUND(5e-10 + COALESCE(c_acctbal, 0.0), 4) AS acctbal_filled
        FROM customer
        ORDER BY c_custkey
        LIMIT 200
    """,
    doc="nullif/coalesce/multi-branch case expression surface.",
)
def scalar_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.select(
            "c_custkey",
            F.coalesce(
                F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
            ).alias("segment_or_other"),
            F.when(F.col("c_acctbal") < 0, "debt")
            .when(F.col("c_acctbal") < 5000, "mid")
            .otherwise("rich")
            .alias("balance_band"),
            _r(F.coalesce(F.col("c_acctbal"), F.lit(0.0))).alias("acctbal_filled"),
        )
        .orderBy("c_custkey")
        .limit(200)
    )
