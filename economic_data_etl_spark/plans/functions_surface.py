"""Remaining function-surface breadth: RANGE window frames, min_by/max_by,
array higher-order functions over embeddings, map/JSON explode, TPC-H
Q14/Q18 shapes (conditional ratio aggregate, HAVING + join-back).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.sources.tables import load_table


def _r(col):
    return biased_round(col)


# --------------------------------------------------------------------------
# RANGE window frame: trailing-30-day spend per customer.
# --------------------------------------------------------------------------
@register(
    "window_range_frame_trailing_spend",
    oracle="""
        SELECT o_custkey, o_orderkey,
               ROUND(5e-10 + SUM(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY DATEDIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                   RANGE BETWEEN 29 PRECEDING AND CURRENT ROW
               ), 4) AS trailing_30d_spend
        FROM orders
        WHERE o_custkey <= 100
        ORDER BY o_custkey, o_orderkey
    """,
    doc="RANGE frame over a day-number order key: all orders in the trailing "
    "30 days count, regardless of row adjacency (vs ROWS frames).",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    day_num = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day_num)
        .rangeBetween(-29, Window.currentRow)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            _r(F.sum("o_totalprice").over(w)).alias("trailing_30d_spend"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# --------------------------------------------------------------------------
# min_by / max_by (argmin/argmax aggregates).
# --------------------------------------------------------------------------
@register(
    "agg_min_max_by",
    oracle="""
        SELECT p_brand,
               arg_max(p_partkey, p_retailprice + p_partkey * 1e-9) AS priciest_part,
               arg_min(p_partkey, p_retailprice + p_partkey * 1e-9) AS cheapest_part,
               ROUND(5e-10 + MAX(p_retailprice), 4) AS max_price,
               ROUND(5e-10 + MIN(p_retailprice), 4) AS min_price
        FROM part
        GROUP BY p_brand
        ORDER BY p_brand
    """,
    doc="max_by/min_by (argmax/argmin) aggregates. Prices have 0.1 "
    "granularity, so exact price ties are common; the +partkey*1e-9 term "
    "(far below price granularity, far above double ulp) makes the "
    "ordering value strictly unique — argmax ties break toward the "
    "highest partkey, argmin toward the lowest, on both engines.",
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    tiebroken = F.col("p_retailprice") + F.col("p_partkey") * F.lit(1e-9)
    return (
        part.groupBy("p_brand")
        .agg(
            F.max_by("p_partkey", tiebroken).alias("priciest_part"),
            F.min_by("p_partkey", tiebroken).alias("cheapest_part"),
            _r(F.max("p_retailprice")).alias("max_price"),
            _r(F.min("p_retailprice")).alias("min_price"),
        )
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------------
# Array higher-order functions over the embedding column.
# --------------------------------------------------------------------------
@register(
    "array_functions_embeddings",
    oracle="""
        SELECT vec_id,
               CAST(len(embedding) AS INT)                              AS dim,
               ROUND(5e-10 + list_sum(list_transform(embedding[1:8]::DOUBLE[],
                                                     x -> x)), 4)      AS head8_sum,
               ROUND(5e-10 + embedding[-1], 4)                          AS last_dim,
               ROUND(5e-10 + list_max(embedding::DOUBLE[]), 4)          AS max_dim,
               ROUND(5e-10 + list_min(embedding::DOUBLE[]), 4)          AS min_dim,
               CAST(len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS INT)
                   AS n_positive
        FROM embeddings
        WHERE vec_id < 50
        ORDER BY vec_id
    """,
    doc="slice/element_at/reverse/array_min/array_max/filter over "
    "array<float> — the array-function surface on a real nested column.",
)
def array_functions_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    v = F.col("embedding").cast("array<double>")
    head8_sum = F.aggregate(
        F.slice(v, 1, 8), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        emb.select(
            "vec_id",
            F.size("embedding").alias("dim"),
            _r(head8_sum).alias("head8_sum"),
            _r(F.element_at(F.reverse(v), 1)).alias("last_dim"),
            _r(F.array_max(v)).alias("max_dim"),
            _r(F.array_min(v)).alias("min_dim"),
            F.size(F.filter(v, lambda x: x > 0)).alias("n_positive"),
        )
        .orderBy("vec_id")
    )


# --------------------------------------------------------------------------
# Map/JSON: parse props into a map, explode entries, aggregate per key.
# --------------------------------------------------------------------------
@register(
    "map_json_explode",
    oracle="""
        SELECT k AS prop_key,
               COUNT(*) AS n,
               CAST(SUM(CAST(json_extract_string(props, '$.' || k) AS INT))
                    AS BIGINT) AS total
        FROM (SELECT props, unnest(json_keys(props)) AS k FROM events) t
        GROUP BY k
        ORDER BY prop_key
    """,
    doc="from_json → map<string,int> → explode(map) → per-key aggregate "
    "(generalizes to arbitrary JSON property bags).",
)
def map_json_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        F.explode(F.from_json("props", "map<string,int>")).alias("prop_key", "val")
    )
    return (
        parsed.groupBy("prop_key")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").cast("long").alias("total"))
        .orderBy("prop_key")
    )


# --------------------------------------------------------------------------
# TPC-H Q14 shape: promo revenue share (conditional ratio aggregate).
# --------------------------------------------------------------------------
@register(
    "q14_promo_revenue_share",
    oracle="""
        SELECT ROUND(5e-10 + 100.0 * SUM(CASE WHEN p_type = 'PROMO'
                       THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                   / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-03-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
    """,
    doc="Conditional ratio aggregate over a broadcast join (TPC-H Q14 shape).",
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    # part scales with SF — leave the join strategy to AQE size stats.
    return li.join(part, li.l_partkey == part.p_partkey).agg(
        _r(F.lit(100.0) * F.sum(promo) / F.sum(rev)).alias("promo_pct")
    )


# --------------------------------------------------------------------------
# TPC-H Q18 shape: large-quantity orders (HAVING + join back).
# --------------------------------------------------------------------------
@register(
    "q18_large_quantity_orders",
    oracle="""
        SELECT c_custkey, o_orderkey,
               ROUND(5e-10 + total_qty, 4) AS total_qty
        FROM (
            SELECT l_orderkey, SUM(l_quantity) AS total_qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(l_quantity) > 150
        ) big
        JOIN orders   ON o_orderkey = big.l_orderkey
        JOIN customer ON c_custkey = o_custkey
        ORDER BY total_qty DESC, o_orderkey
    """,
    doc="HAVING (post-aggregation filter) + join-back to dimensions "
    "(TPC-H Q18 shape).",
)
def q18_large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(orders, orders.o_orderkey == big.l_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .select("c_custkey", "o_orderkey", _r(F.col("total_qty")).alias("total_qty"))
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
    )
