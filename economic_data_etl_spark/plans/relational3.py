"""TPC-H Q19/Q22 shapes: disjunctive multi-attribute predicates and
anti-join with an aggregate subquery threshold."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.sources.tables import load_table


def _r(col):
    return biased_round(col)


@register(
    "q19_disjunctive_predicates",
    oracle="""
        SELECT ROUND(5e-10 + SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity >= 5 AND l_quantity <= 20)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
               AND l_quantity >= 10 AND l_quantity <= 30)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
               AND l_quantity >= 20 AND l_quantity <= 40)
    """,
    doc="TPC-H Q19 shape: OR of conjunctive brand/size/quantity clauses — "
    "Catalyst extracts the common join key and pushes the residual "
    "disjunction below the join.",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")

    def clause(brand: str, size_lo: int, size_hi: int, q_lo: int, q_hi: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(size_lo, size_hi)
            & (F.col("l_quantity") >= q_lo)
            & (F.col("l_quantity") <= q_hi)
        )

    cond = (
        clause("Brand#1", 1, 15, 5, 20)
        | clause("Brand#2", 10, 30, 10, 30)
        | clause("Brand#3", 20, 50, 20, 40)
    )
    # part scales with SF — no explicit hint (AQE decides at runtime).
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            _r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
    )


@register(
    "q22_global_avg_anti_join",
    oracle="""
        SELECT SUBSTRING(c_name, 10, 2) AS name_suffix,
               COUNT(*) AS n_customers,
               ROUND(5e-10 + SUM(c_acctbal), 4) AS total_bal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY 1
        ORDER BY 1
    """,
    doc="TPC-H Q22 shape: scalar aggregate subquery threshold (broadcast "
    "single-row cross join) + NOT EXISTS anti-join + substring grouping.",
)
def q22_global_avg_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    rich = (
        cust.join(F.broadcast(avg_bal))  # single-row threshold, no collect()
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    )
    return (
        rich.groupBy(F.substring("c_name", 10, 2).alias("name_suffix"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _r(F.sum("c_acctbal")).alias("total_bal"),
        )
        .orderBy("name_suffix")
    )
