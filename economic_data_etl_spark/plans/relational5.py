"""TPC-H Q11/Q15/Q16/Q17/Q21 shapes, adapted to the reduced schema.

No partsupp table exists, so the part↔supplier relationship is derived
from lineitem; the plan shapes (scalar-subquery HAVING threshold, view
+ max-equality, distinct-count by attributes, correlated per-part avg,
single-culprit EXISTS/NOT-EXISTS) match the public TPC-H spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.sources.tables import load_table


def _r(col):
    return biased_round(col)


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q11_important_parts",
    oracle="""
        WITH nat_rev AS (
            SELECT l_partkey, l_extendedprice * (1 - l_discount) AS rev
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation   ON n_nationkey = s_nationkey
            WHERE n_name = 'NATION_5'
        )
        SELECT l_partkey AS partkey,
               ROUND(5e-10 + SUM(rev), 4) AS part_value
        FROM nat_rev
        GROUP BY l_partkey
        HAVING SUM(rev) > (SELECT SUM(rev) * 0.001 FROM nat_rev)
        ORDER BY part_value DESC, partkey
    """,
    doc="TPC-H Q11 shape (partsupp value → lineitem revenue): per-part "
    "revenue within one nation, kept only above a scalar-subquery share "
    "of that nation's total. The threshold is a 1-row broadcast, not a "
    "collect().",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_5"
    )
    nat_rev = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("l_partkey"), _rev().alias("rev"))
    )
    # One scan feeds both the per-part rollup and the global threshold.
    nat_rev = nat_rev.persist()
    per_part = nat_rev.groupBy("l_partkey").agg(F.sum("rev").alias("__raw"))
    threshold = nat_rev.agg((F.sum("rev") * 0.001).alias("__thr"))
    return (
        per_part.join(F.broadcast(threshold))
        .filter(F.col("__raw") > F.col("__thr"))
        .select(
            F.col("l_partkey").alias("partkey"),
            _r(F.col("__raw")).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), F.col("partkey"))
    )


@register(
    "q15_top_supplier",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name,
               ROUND(5e-10 + total_revenue, 4) AS total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """,
    doc="TPC-H Q15 shape: quarterly revenue view, then equality against "
    "the view's MAX via a 1-row broadcast join (no collect; the view is "
    "computed once and reused through a persist).",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev()).alias("__total"))
        .persist()
    )
    top = revenue.agg(F.max("__total").alias("__max_total"))
    return (
        revenue.join(F.broadcast(top))
        .filter(F.col("__total") == F.col("__max_total"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            _r(F.col("__total")).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_count_by_part",
    oracle="""
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM part JOIN lineitem ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1' AND p_size IN (1, 4, 9, 16, 25)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape (partsupp → lineitem as the part↔supplier "
    "link): distinct-supplier counts per part attribute triple with an "
    "exclusion filter pushed into the part scan.",
)
def q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 9, 16, 25)
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
        WITH brand_lines AS (
            SELECT l_partkey, l_quantity, l_extendedprice
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_brand = 'Brand#2' AND p_size < 10
        )
        SELECT ROUND(5e-10 + SUM(l_extendedprice) / 7.0, 4) AS avg_yearly
        FROM brand_lines b
        WHERE l_quantity < (
            SELECT 0.2 * AVG(l_quantity) FROM brand_lines
            WHERE l_partkey = b.l_partkey
        )
    """,
    doc="TPC-H Q17 shape: lines below 20% of their part's average "
    "quantity. The correlated per-part AVG becomes a window over "
    "l_partkey — one shuffle, no self-join.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#2") & (F.col("p_size") < 10)
    )
    li = load_table(spark, sf_dir, "lineitem")
    brand_lines = li.join(part, li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey")
    return (
        brand_lines.withColumn("__avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.2 * F.col("__avg_qty"))
        .agg(_r(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@register(
    "q21_suppliers_kept_waiting",
    oracle="""
        WITH order_lines AS (
            SELECT l_orderkey, l_suppkey,
                   CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                        THEN 1 ELSE 0 END AS is_late
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
            WHERE o_orderstatus = 'F'
        ), per_order AS (
            SELECT l_orderkey,
                   COUNT(DISTINCT l_suppkey) AS n_supp,
                   COUNT(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END)
                       AS n_late,
                   MAX(CASE WHEN is_late = 1 THEN l_suppkey END) AS culprit
            FROM order_lines
            GROUP BY l_orderkey
        )
        SELECT s_name, COUNT(*) AS numwait
        FROM per_order JOIN supplier ON s_suppkey = culprit
        WHERE n_supp > 1 AND n_late = 1
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
    doc="TPC-H Q21 shape: in finished multi-supplier orders, the single "
    "supplier whose line shipped late. The EXISTS/NOT-EXISTS pair "
    "collapses into one aggregation over l_orderkey — distinct supplier "
    "count, distinct late count, and the culprit key in a single pass — "
    "instead of two self-joins of lineitem.",
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supp = load_table(spark, sf_dir, "supplier")
    late_supp = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
        F.col("l_suppkey"),
    )
    per_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.count_distinct("l_suppkey").alias("n_supp"),
            F.count_distinct(late_supp).alias("n_late"),
            F.max(late_supp).alias("culprit"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    return (
        per_order.join(supp, per_order.culprit == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )
