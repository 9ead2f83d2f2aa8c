"""Data-quality audit: declarative constraint checking over the star
schema, one row per constraint with its violation count.

The engine-side analogue of the reference's load-time validation
(src/load.py:5-24 declares PKs/NOT NULLs that SQLite enforces; Spark
tables enforce nothing, so constraints become audit queries). Each
check is a single aggregation or anti-join:

- primary-key uniqueness  -> groupBy(key) HAVING count > 1
- foreign-key integrity   -> left_anti join child->parent
- domain rules            -> filter counts (non-negative amounts,
                             discount within [0, 1])

All checks share one pass per table where possible and every violation
count is exact — at 100 TB each check is one shuffle on its key (the
anti-joins broadcast the parent key sets when small). Emitting counts
(not offending rows) keeps the result O(#constraints); a production
run would add a quarantine sink for the anti-join outputs themselves.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.plans.catalog import register
from economic_data_etl_spark.sources.tables import load_table


@register(
    "dq_constraint_violations",
    oracle="""
    SELECT 'pk_orders_unique' AS constraint_name,
           CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) AS n_violations
    FROM (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey) t
    WHERE n > 1
    UNION ALL
    SELECT 'pk_lineitem_unique',
           CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
    FROM (SELECT COUNT(*) AS n FROM lineitem
          GROUP BY l_orderkey, l_linenumber) t
    WHERE n > 1
    UNION ALL
    SELECT 'fk_lineitem_orders', CAST(COUNT(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS
        (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'fk_orders_customer', CAST(COUNT(*) AS BIGINT)
    FROM orders o WHERE NOT EXISTS
        (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'fk_customer_nation', CAST(COUNT(*) AS BIGINT)
    FROM customer c WHERE NOT EXISTS
        (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
    UNION ALL
    SELECT 'chk_quantity_positive', CAST(COUNT(*) AS BIGINT)
    FROM lineitem WHERE NOT COALESCE(l_quantity > 0, FALSE)
    UNION ALL
    SELECT 'chk_discount_range', CAST(COUNT(*) AS BIGINT)
    FROM lineitem WHERE NOT COALESCE(l_discount >= 0 AND l_discount <= 1, FALSE)
    UNION ALL
    SELECT 'chk_totalprice_nonneg', CAST(COUNT(*) AS BIGINT)
    FROM orders WHERE NOT COALESCE(o_totalprice >= 0, FALSE)
    ORDER BY constraint_name
    """,
    doc="Constraint audit over the star schema: PK uniqueness (excess "
    "rows per duplicated key), FK integrity (anti-join orphan counts "
    "for lineitem->orders, orders->customer, customer->nation), and "
    "domain rules (positive quantity, discount in [0,1], non-negative "
    "total). One row per constraint; a NULL in a checked column is a "
    "violation via NOT COALESCE(pred, FALSE) on both engines.",
)
def dq_constraint_violations(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    def _count(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("constraint_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_violations"),
        )

    def _pk_excess(name: str, df: DataFrame, keys: list[str]) -> DataFrame:
        dup = (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
        )
        return dup.agg(
            F.lit(name).alias("constraint_name"),
            F.coalesce(F.sum(F.col("n") - 1), F.lit(0))
            .cast("bigint")
            .alias("n_violations"),
        )

    checks = [
        _pk_excess("pk_orders_unique", orders, ["o_orderkey"]),
        _pk_excess(
            "pk_lineitem_unique", lineitem, ["l_orderkey", "l_linenumber"]
        ),
        _count(
            "fk_lineitem_orders",
            lineitem.join(
                orders.select("o_orderkey"),
                lineitem["l_orderkey"] == orders["o_orderkey"],
                "left_anti",
            ),
        ),
        _count(
            "fk_orders_customer",
            orders.join(
                customer.select("c_custkey"),
                orders["o_custkey"] == customer["c_custkey"],
                "left_anti",
            ),
        ),
        _count(
            "fk_customer_nation",
            customer.join(
                F.broadcast(nation.select("n_nationkey")),
                customer["c_nationkey"] == nation["n_nationkey"],
                "left_anti",
            ),
        ),
        _count(
            "chk_quantity_positive",
            lineitem.filter(~F.coalesce(F.col("l_quantity") > 0, F.lit(False))),
        ),
        _count(
            "chk_discount_range",
            lineitem.filter(
                ~F.coalesce(
                    (F.col("l_discount") >= 0)
                    & (F.col("l_discount") <= 1),
                    F.lit(False),
                )
            ),
        ),
        _count(
            "chk_totalprice_nonneg",
            orders.filter(~F.coalesce(F.col("o_totalprice") >= 0, F.lit(False))),
        ),
    ]
    return reduce(DataFrame.unionByName, checks).orderBy(
        "constraint_name"
    )
