"""TPC-H Q4/Q7/Q8/Q9/Q12/Q13 shapes, adapted to the reduced schema.

The testdata tables lack l_commitdate / l_receiptdate / l_shipmode /
o_comment / partsupp, so each query keeps the ORIGINAL plan shape
(EXISTS semi-join, multi-nation volume join, market-share conditional
ratio, profit rollup, CASE-bucketed counts, outer-join distribution)
while substituting available columns: "late" means the shipment left
more than N days after the order date.

Reference parity: these cover the relational surface of the reference's
analytical queries (reference src/transformations.py aggregation paths);
shapes follow the public TPC-H spec.
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
    "q4_order_priority_late",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1997-04-01'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS semi-join (order has a late-shipping "
    "line) + grouped count per priority. Spark plans a LeftSemi hash "
    "join on l_orderkey with the date predicate pushed to both scans.",
)
def q4_order_priority_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q7_volume_shipping",
    oracle="""
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS ship_year,
               ROUND(5e-10 + SUM(l_extendedprice * (1 - l_discount)), 4)
                   AS revenue
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey  = o_custkey
        JOIN supplier ON s_suppkey  = l_suppkey
        JOIN nation sn ON sn.n_nationkey = s_nationkey
        JOIN nation cn ON cn.n_nationkey = c_nationkey
        WHERE ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
            OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3'))
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape: bidirectional nation-pair volume. The nation "
    "dim joins are broadcast; the disjunctive pair filter lands after "
    "both nation names are attached.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    sn = F.broadcast(nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    ))
    cn = F.broadcast(nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    ))
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | (
        (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
        .join(cn, F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(_r(F.sum(_rev())).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


@register(
    "q8_market_share",
    oracle="""
        SELECT ship_year,
               ROUND(5e-10 + SUM(CASE WHEN supp_nation = 'NATION_5'
                                      THEN volume ELSE 0 END)
                           / SUM(volume), 4) AS mkt_share
        FROM (
            SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS ship_year,
                   l_extendedprice * (1 - l_discount) AS volume,
                   sn.n_name AS supp_nation
            FROM lineitem
            JOIN part     ON p_partkey = l_partkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation cn ON cn.n_nationkey = c_nationkey
            JOIN region   ON r_regionkey = cn.n_regionkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation sn ON sn.n_nationkey = s_nationkey
            WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
        ) all_volume
        GROUP BY ship_year
        ORDER BY ship_year
    """,
    doc="TPC-H Q8 shape: national market share inside a consumer region "
    "— conditional-sum ratio over a 7-table join; region/nation "
    "broadcast, part filter pushed below the fact joins.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = F.broadcast(
        nation.join(
            F.broadcast(region), nation.n_regionkey == region.r_regionkey
        ).select(F.col("n_nationkey").alias("cn_key"))
    )
    sn = F.broadcast(nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    ))
    volume = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(cn, F.col("c_nationkey") == F.col("cn_key"), "inner")
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
        .select(
            F.year("l_shipdate").alias("ship_year"),
            _rev().alias("volume"),
            "supp_nation",
        )
    )
    national = F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(
        F.lit(0.0)
    )
    return (
        volume.groupBy("ship_year")
        .agg(_r(F.sum(national) / F.sum("volume")).alias("mkt_share"))
        .orderBy("ship_year")
    )


@register(
    "q9_product_profit",
    oracle="""
        SELECT n_name AS supp_nation,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
               ROUND(5e-10 + SUM(l_extendedprice * (1 - l_discount)), 4)
                   AS profit
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY 1, 2
        ORDER BY 1, 2 DESC
    """,
    doc="TPC-H Q9 shape (no partsupp in the schema, so profit omits "
    "supplycost): per-nation per-year profit on parts matching a "
    "LIKE pattern. The LIKE filter prunes part before the fact join.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    )
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").alias("order_year"),
        )
        .agg(_r(F.sum(_rev())).alias("profit"))
        .orderBy(F.col("supp_nation"), F.col("order_year").desc())
    )


@register(
    "q12_priority_by_lateness",
    oracle="""
        SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                    THEN 'late' ELSE 'on_time' END AS lateness,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY 1
        ORDER BY 1
    """,
    doc="TPC-H Q12 shape (shipmode → lateness bucket): CASE-bucketed "
    "conditional counts over a fact-fact join.",
)
def q12_priority_by_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .withColumn(
            "lateness",
            F.when(
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                F.lit("late"),
            ).otherwise(F.lit("on_time")),
        )
        .groupBy("lateness")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("lateness")
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
            GROUP BY c_custkey
        ) per_cust
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape: customer order-count distribution via LEFT "
    "OUTER join with a join-side predicate (comment filter → priority "
    "filter), then a second aggregation over the first's result.",
)
def q13_customer_order_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )
