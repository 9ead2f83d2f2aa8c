"""Core relational queries: scan → filter → join → aggregate → sort/limit.

Covers SURVEY.md §2.1-2.4, §2.6-2.7 (scans, projections/filters, joins
including semi/anti, aggregations, sorts/limits/top-k, set ops) over the
driver's TPC-H-ish tables.

Scale notes (100 TB design point):
- Dimension joins carry explicit `F.broadcast` hints — region/nation/
  supplier/part stay broadcast-size at any realistic SF, so these joins
  never shuffle the fact table.
- Fact-fact joins (orders ⋈ lineitem) are left to sort-merge + AQE; both
  sides shuffle on the join key once, and AQE splits skewed partitions.
- Filters are applied before joins so Catalyst pushes them into the
  parquet scan (verify via .explain → PushedFilters).
- Aggregates are partial (map-side combine) automatically via hash
  aggregation; no collect() anywhere.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.sources.tables import load_table


def _r(col):
    return biased_round(col)


# --------------------------------------------------------------------------
# Q1: pricing summary (TPC-H Q1 shape) — the flagship query.
# Scan+filter pushdown → hash aggregate (map-side partials) → small sort.
# --------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle="""
        SELECT
            l_returnflag,
            l_linestatus,
            ROUND(5e-10 + SUM(l_quantity), 4)                                        AS sum_qty,
            ROUND(5e-10 + SUM(l_extendedprice), 4)                                   AS sum_base_price,
            ROUND(5e-10 + SUM(l_extendedprice * (1 - l_discount)), 4)                AS sum_disc_price,
            ROUND(5e-10 + SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)  AS sum_charge,
            ROUND(5e-10 + AVG(l_quantity), 4)                                        AS avg_qty,
            ROUND(5e-10 + AVG(l_extendedprice), 4)                                   AS avg_price,
            ROUND(5e-10 + AVG(l_discount), 4)                                        AS avg_disc,
            COUNT(*)                                                         AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    doc="Filter → groupBy agg (8 aggregates) → sort. TPC-H Q1 shape.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r(F.sum("l_quantity")).alias("sum_qty"),
            _r(F.sum("l_extendedprice")).alias("sum_base_price"),
            _r(F.sum(disc_price)).alias("sum_disc_price"),
            _r(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
            _r(F.avg("l_quantity")).alias("avg_qty"),
            _r(F.avg("l_extendedprice")).alias("avg_price"),
            _r(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Q3: shipping priority (TPC-H Q3 shape) — fact⋈fact join + top-k.
# --------------------------------------------------------------------------
@register(
    "q3_shipping_priority",
    oracle="""
        SELECT
            l_orderkey,
            ROUND(5e-10 + SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
            o_orderdate
        FROM customer
        JOIN orders    ON c_custkey = o_custkey
        JOIN lineitem  ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate  > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
        LIMIT 10
    """,
    doc="3-way join (broadcast customer-filter, SMJ orders⋈lineitem) → agg → top-10.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    # NOTE: the filtered customer side scales with SF (1/5 of customers),
    # so no explicit broadcast hint — AQE broadcasts it while its runtime
    # size is under the threshold and falls back to shuffle join beyond.
    joined = orders.join(
        cust.select("c_custkey"),
        orders.o_custkey == F.col("c_custkey"),
    ).join(li, li.l_orderkey == orders.o_orderkey)
    return (
        joined.groupBy("l_orderkey", "o_orderdate")
        .agg(
            _r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q5: local supplier volume (TPC-H Q5 shape) — snowflake join chain.
# --------------------------------------------------------------------------
@register(
    "q5_region_revenue",
    oracle="""
        SELECT
            n_name,
            ROUND(5e-10 + SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    doc="6-way snowflake join; all dims broadcast; one fact-fact SMJ.",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        # supplier scales with SF → no hint (AQE decides); nation/region
        # are fixed-cardinality → hinted broadcast is always safe.
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            _r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


# --------------------------------------------------------------------------
# Q6: forecast revenue change (TPC-H Q6 shape) — pure scan+filter+agg.
# --------------------------------------------------------------------------
@register(
    "q6_forecast_revenue",
    oracle="""
        SELECT ROUND(5e-10 + SUM(l_extendedprice * l_discount), 4) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    doc="Tight multi-predicate filter fully pushed to the parquet scan.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(_r(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"))


# --------------------------------------------------------------------------
# Broadcast dimension join: customers per region.
# --------------------------------------------------------------------------
@register(
    "join_broadcast_dims",
    oracle="""
        SELECT r_name, COUNT(*) AS n_customers,
               ROUND(5e-10 + SUM(c_acctbal), 4) AS total_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        ORDER BY r_name
    """,
    doc="Two chained broadcast hash joins — zero shuffle of the fact side.",
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _r(F.sum("c_acctbal")).alias("total_acctbal"),
        )
        .orderBy("r_name")
    )


# --------------------------------------------------------------------------
# Semi / anti joins (SURVEY.md §2.2 P5, §2.3 J3).
# --------------------------------------------------------------------------
@register(
    "join_semi_customers_with_urgent_orders",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey IN (
            SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        )
        ORDER BY c_custkey
    """,
    doc="Left-semi join: existence check without duplicating the left side.",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_anti_customers_without_orders",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        ORDER BY c_custkey
    """,
    doc="Left-anti join — the reference's dim-insert pattern (src/load.py:123-128).",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# Outer join with null-handling (reference's upsert-classify shape, J2).
# --------------------------------------------------------------------------
@register(
    "join_outer_order_counts",
    oracle="""
        SELECT
            c_custkey,
            c_name,
            COUNT(o_orderkey) AS n_orders
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name
        ORDER BY n_orders DESC, c_custkey
        LIMIT 25
    """,
    doc="Left outer join + count over nullable side (TPC-H Q13 shape).",
)
def join_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("c_custkey"))
        .limit(25)
    )


# --------------------------------------------------------------------------
# Distinct / count-distinct aggregations (§2.4 extension).
# --------------------------------------------------------------------------
@register(
    "agg_distinct_parts_per_brand",
    oracle="""
        SELECT p_brand,
               COUNT(DISTINCT p_type) AS n_types,
               COUNT(DISTINCT p_size) AS n_sizes,
               COUNT(*) AS n_parts
        FROM part
        GROUP BY p_brand
        ORDER BY p_brand
    """,
    doc="Multiple exact count-distincts in one aggregate (expand + partial agg).",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy("p_brand")
        .agg(
            F.countDistinct("p_type").alias("n_types"),
            F.countDistinct("p_size").alias("n_sizes"),
            F.count(F.lit(1)).alias("n_parts"),
        )
        .orderBy("p_brand")
    )


@register(
    "distinct_rows",
    oracle="""
        SELECT DISTINCT l_returnflag, l_linestatus
        FROM lineitem
        ORDER BY l_returnflag, l_linestatus
    """,
    doc="DISTINCT as shuffle-dedup (hash aggregate, no agg functions).",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Sorts / limits / top-k (§2.6).
# --------------------------------------------------------------------------
@register(
    "topk_orders_by_price",
    oracle="""
        SELECT o_orderkey, o_totalprice, o_orderdate
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 15
    """,
    doc="Global top-k: Spark runs TakeOrderedAndProject, no full sort.",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(15)
    )


# --------------------------------------------------------------------------
# Set operations (§2.7).
# --------------------------------------------------------------------------
@register(
    "setop_union_all",
    oracle="""
        SELECT * FROM (
            SELECT c_custkey AS key, 'building' AS bucket
            FROM customer WHERE c_mktsegment = 'BUILDING'
            UNION ALL
            SELECT c_custkey AS key, 'machinery' AS bucket
            FROM customer WHERE c_mktsegment = 'MACHINERY'
        ) t
        ORDER BY key, bucket
    """,
    doc="Union-all of two filtered scans — the reference's combine_fact_tables shape (U1).",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("key"), F.lit("building").alias("bucket")
    )
    b = cust.filter(F.col("c_mktsegment") == "MACHINERY").select(
        F.col("c_custkey").alias("key"), F.lit("machinery").alias("bucket")
    )
    return a.unionByName(b).orderBy("key", "bucket")


@register(
    "setop_intersect",
    oracle="""
        SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        INTERSECT
        SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '5-LOW'
        ORDER BY custkey
    """,
    doc="INTERSECT (distinct semantics) between two filtered projections.",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    b = orders.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersect(b).orderBy("custkey")


@register(
    "setop_except",
    oracle="""
        SELECT c_custkey AS custkey FROM customer
        EXCEPT
        SELECT o_custkey AS custkey FROM orders
        ORDER BY custkey
    """,
    doc="EXCEPT (distinct semantics) — set difference.",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    )
    return cust.exceptAll(orders).distinct().orderBy("custkey")


# --------------------------------------------------------------------------
# Multi-way union (the reference unions 10 frames, U1).
# --------------------------------------------------------------------------
@register(
    "union_nway_event_buckets",
    oracle="""
        SELECT bucket, COUNT(*) AS n FROM (
            SELECT 'clicks' AS bucket FROM events WHERE event_type = 'click'
            UNION ALL SELECT 'views' FROM events WHERE event_type = 'view'
            UNION ALL SELECT 'purchases' FROM events WHERE event_type = 'purchase'
            UNION ALL SELECT 'signups' FROM events WHERE event_type = 'signup'
            UNION ALL SELECT 'errors' FROM events WHERE event_type = 'error'
        ) t GROUP BY bucket ORDER BY bucket
    """,
    doc="functools.reduce(unionByName) over n frames, as the reference's combiner.",
)
def union_nway(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    buckets = {
        "clicks": "click",
        "views": "view",
        "purchases": "purchase",
        "signups": "signup",
        "errors": "error",
    }
    frames = [
        ev.filter(F.col("event_type") == v).select(F.lit(k).alias("bucket"))
        for k, v in buckets.items()
    ]
    unioned = functools.reduce(DataFrame.unionByName, frames)
    return unioned.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).orderBy("bucket")
