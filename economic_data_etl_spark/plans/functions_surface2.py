"""Second breadth batch: navigation window functions (lead / first_value /
last_value / nth_value / cume_dist), extended string and date function
surface, bitwise operations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.sources.tables import load_table


def _r(col):
    return biased_round(col)


@register(
    "window_navigation_functions",
    oracle="""
        SELECT o_custkey, o_orderkey,
               ROUND(5e-10 + LEAD(o_totalprice) OVER w, 4)         AS next_price,
               ROUND(5e-10 + FIRST_VALUE(o_totalprice) OVER w, 4)  AS first_price,
               ROUND(5e-10 + LAST_VALUE(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ), 4)                                               AS last_price,
               ROUND(5e-10 + NTH_VALUE(o_totalprice, 2) OVER w, 4) AS second_price,
               ROUND(5e-10 + CUME_DIST() OVER w, 4)                AS cume
        FROM orders
        WHERE o_custkey <= 100
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, o_orderkey
    """,
    doc="lead / first_value / last_value (full frame) / nth_value / cume_dist.",
)
def window_navigation_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            _r(F.lead("o_totalprice").over(w)).alias("next_price"),
            _r(F.first("o_totalprice").over(w)).alias("first_price"),
            _r(F.last("o_totalprice").over(w_full)).alias("last_price"),
            _r(F.nth_value("o_totalprice", 2).over(w)).alias("second_price"),
            _r(F.cume_dist().over(w)).alias("cume"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "scalar_string_functions2",
    oracle="""
        SELECT p_partkey,
               LPAD(CAST(p_partkey AS VARCHAR), 8, '0')  AS padded_key,
               TRIM('  ' || p_name || '  ')              AS trimmed,
               split_part(p_name, ' ', 1)                AS first_word,
               split_part(p_name, ' ', -1)               AS last_word,
               REVERSE(p_brand)                          AS brand_rev,
               REPEAT('*', p_size % 5)                   AS stars,
               LEFT(p_type, 4)                           AS type_left,
               RIGHT(p_type, 3)                          AS type_right,
               translate(p_name, 'aeiou', 'AEIOU')       AS vowels_upper,
               CAST(contains(p_name, 'red') AS INT)      AS has_red
        FROM part
        WHERE p_partkey < 200
        ORDER BY p_partkey
    """,
    doc="lpad/trim/split_part/reverse/repeat/left/right/translate/contains.",
)
def scalar_string_functions2(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    words = F.split("p_name", " ")
    return (
        part.select(
            "p_partkey",
            F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded_key"),
            F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias(
                "trimmed"
            ),
            F.element_at(words, 1).alias("first_word"),
            F.element_at(words, -1).alias("last_word"),
            F.reverse("p_brand").alias("brand_rev"),
            F.repeat(F.lit("*"), (F.col("p_size") % 5).cast("int")).alias("stars"),
            F.substring("p_type", 1, 4).alias("type_left"),
            F.expr("right(p_type, 3)").alias("type_right"),
            F.translate("p_name", "aeiou", "AEIOU").alias("vowels_upper"),
            F.col("p_name").contains("red").cast("int").alias("has_red"),
        )
        .orderBy("p_partkey")
    )


@register(
    "scalar_date_functions2",
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH          AS plus_3mo,
               CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
               CAST(date_part('dow', o_orderdate) AS INT)            AS dow,
               CAST(date_part('doy', o_orderdate) AS INT)            AS doy,
               CAST(date_part('week', o_orderdate) AS INT)           AS iso_week,
               CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR)       AS year_month
        FROM orders
        WHERE o_orderkey < 300
        ORDER BY o_orderkey
    """,
    doc="add_months/last_day/dayofweek/dayofyear/weekofyear/date_format.",
)
def scalar_date_functions2(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    d = F.col("o_orderdate").cast("date")
    return (
        orders.select(
            "o_orderkey",
            F.add_months(d, 3).cast("timestamp").alias("plus_3mo"),
            F.last_day(d).cast("timestamp").alias("month_end"),
            # Spark dayofweek: 1=Sunday..7=Saturday; DuckDB dow: 0=Sunday..6
            (F.dayofweek(d) - 1).cast("int").alias("dow"),
            F.dayofyear(d).cast("int").alias("doy"),
            F.weekofyear(d).cast("int").alias("iso_week"),
            F.date_format(d, "yyyy-MM").alias("year_month"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "scalar_bitwise_ops",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_linenumber & 3                          AS and3,
               l_linenumber | 8                          AS or8,
               xor(l_linenumber, 5)                      AS xor5,
               l_linenumber << 2                         AS shl2,
               CAST(l_orderkey >> 3 AS BIGINT)           AS shr3
        FROM lineitem
        WHERE l_orderkey < 100
        ORDER BY l_orderkey, l_linenumber
    """,
    doc="bitwise and/or/xor/shift surface.",
)
def scalar_bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    ln = F.col("l_linenumber")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            ln.bitwiseAND(F.lit(3)).alias("and3"),
            ln.bitwiseOR(F.lit(8)).alias("or8"),
            ln.bitwiseXOR(F.lit(5)).alias("xor5"),
            F.shiftleft(ln, 2).alias("shl2"),
            F.shiftright(F.col("l_orderkey"), 3).alias("shr3"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )
