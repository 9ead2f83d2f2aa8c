"""TPC-H Q2/Q20 shapes, adapted to the reduced schema.

With no partsupp table, the part↔supplier relationship and its cost /
availability attributes are derived from lineitem (one aggregation over
(l_partkey, l_suppkey)), mirroring the Q11/Q16/Q17 adaptations. The plan
shapes match the public TPC-H spec: Q2's correlated per-part MIN
subquery and Q20's nested IN + correlated quantity threshold.

Determinism notes (Spark vs DuckDB oracle):
- Q2 uses MIN(l_extendedprice / l_quantity) as the unit cost. Each
  division is one deterministic double op and MIN selects an existing
  value, so — unlike AVG, whose summation order differs between engines
  — both sides see bit-identical costs and the equality-with-min filter
  cannot flip on a boundary row.
- Q20 compares SUM(l_quantity) terms; quantities are integral doubles,
  so the sums are exact integers and the > comparison is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.sources.tables import load_table


def _supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """partsupp surrogate: per-(part, supplier) cost + quantity facts."""
    li = load_table(spark, sf_dir, "lineitem")
    in_1997 = (
        F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    return li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "unit_cost"
        ),
        F.sum("l_quantity").alias("qty_total"),
        F.sum(F.when(in_1997, F.col("l_quantity")).otherwise(0.0)).alias(
            "qty_1997"
        ),
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
        WITH supply AS (
            SELECT l_partkey, l_suppkey,
                   MIN(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem
            GROUP BY l_partkey, l_suppkey
        ), eur AS (
            SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, unit_cost
            FROM supply
            JOIN part     ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation   ON n_nationkey = s_nationkey
            JOIN region   ON r_regionkey = n_regionkey
            WHERE p_size = 4 AND p_type = 'SMALL' AND r_name = 'EUROPE'
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
               ROUND(5e-10 + unit_cost, 4) AS unit_cost
        FROM eur e
        WHERE unit_cost = (
            SELECT MIN(unit_cost) FROM eur WHERE p_partkey = e.p_partkey
        )
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    doc="TPC-H Q2 shape (partsupp cost → lineitem min unit price): for "
    "each qualifying part, the EUROPE supplier(s) offering the minimum "
    "unit cost. The correlated MIN subquery becomes a window over "
    "p_partkey on the already-filtered region slice — no re-scan, no "
    "self-join. part/supplier/nation/region are broadcast dims at any "
    "SF; only the supply aggregation shuffles.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 4) & (F.col("p_type") == "SMALL")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    eur_suppliers = (
        supp.join(
            F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    eur = (
        _supply(spark, sf_dir)
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .join(
            F.broadcast(eur_suppliers),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            "unit_cost",
        )
    )
    w = Window.partitionBy("p_partkey")
    return (
        eur.withColumn("__min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("__min_cost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            biased_round(F.col("unit_cost")).alias("unit_cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@register(
    "q20_concentrated_suppliers",
    oracle="""
        WITH supply AS (
            SELECT l_partkey, l_suppkey,
                   SUM(l_quantity) AS qty_total,
                   SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                             AND l_shipdate <  TIMESTAMP '1998-01-01'
                            THEN l_quantity ELSE 0 END) AS qty_1997
            FROM lineitem
            GROUP BY l_partkey, l_suppkey
        )
        SELECT s_suppkey, s_name
        FROM supplier
        JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_3'
          AND s_suppkey IN (
            SELECT l_suppkey
            FROM supply JOIN part ON p_partkey = l_partkey
            WHERE p_name LIKE '%widget%'
              AND qty_1997 > 0.5 * qty_total
          )
        ORDER BY s_suppkey
    """,
    doc="TPC-H Q20 shape (availqty threshold → shipped-quantity "
    "concentration): NATION_3 suppliers whose 1997 shipments of a "
    "widget part exceed half their all-time volume of that part. The "
    "nested IN over partsupp becomes a LEFT SEMI join against the "
    "supply aggregate; the correlated per-(part,supplier) quantity "
    "subquery folds into the same single-pass conditional aggregation.",
)
def q20_concentrated_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    candidates = (
        _supply(spark, sf_dir)
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .filter(F.col("qty_1997") > 0.5 * F.col("qty_total"))
        .select("l_suppkey")
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(
            candidates,
            supp.s_suppkey == candidates.l_suppkey,
            "left_semi",
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )
