"""Third breadth batch: bag-semantics set ops (INTERSECT ALL / EXCEPT
ALL), explicit cross join, null-ordering sorts, posexplode with ordinality,
and cogrouped applyInPandas.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.plans.catalog import ROUND_BIAS, biased_round, register
from economic_data_etl_spark.sources.tables import load_table


def _r(col):
    return biased_round(col)


@register(
    "setop_intersect_all",
    oracle="""
        SELECT custkey FROM (
            SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
            INTERSECT ALL
            SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        ) t
        ORDER BY custkey
    """,
    doc="INTERSECT ALL: bag semantics — min(multiplicity) per value survives.",
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    b = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersectAll(b).orderBy("custkey")


@register(
    "setop_except_all",
    oracle="""
        SELECT custkey FROM (
            SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
            EXCEPT ALL
            SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        ) t
        ORDER BY custkey
    """,
    doc="EXCEPT ALL: bag difference — multiplicities subtract.",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    b = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.exceptAll(b).orderBy("custkey")


@register(
    "cross_join_small",
    oracle="""
        SELECT r.r_name, s.segment, COUNT(c.c_custkey) AS n
        FROM region r
        CROSS JOIN (SELECT DISTINCT c_mktsegment AS segment FROM customer) s
        LEFT JOIN nation n2 ON n2.n_regionkey = r.r_regionkey
        LEFT JOIN customer c
               ON c.c_nationkey = n2.n_nationkey AND c.c_mktsegment = s.segment
        GROUP BY r.r_name, s.segment
        ORDER BY r.r_name, s.segment
    """,
    doc="Explicit cross join of two tiny domains forming a dense grid, then "
    "left-joined counts (reporting matrix with zero-filled cells).",
)
def cross_join_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    segments = cust.select(
        F.col("c_mktsegment").alias("segment")
    ).distinct()
    grid = region.crossJoin(segments)
    return (
        grid.join(nation, nation.n_regionkey == region.r_regionkey, "left")
        .join(
            cust,
            (cust.c_nationkey == nation.n_nationkey)
            & (cust.c_mktsegment == F.col("segment")),
            "left",
        )
        .groupBy("r_name", "segment")
        .agg(F.count("c_custkey").alias("n"))
        .orderBy("r_name", "segment")
    )


@register(
    "sort_null_ordering",
    oracle="""
        SELECT o_custkey, o_orderkey,
               ROUND(5e-10 + o_totalprice - LAG(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ), 4) AS delta
        FROM orders
        WHERE o_custkey <= 30
        ORDER BY delta DESC NULLS LAST, o_orderkey
    """,
    doc="ORDER BY nullable expression with explicit NULLS LAST placement.",
)
def sort_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 30)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            _r(F.col("o_totalprice") - F.lag("o_totalprice").over(w)).alias("delta"),
        )
        .orderBy(F.col("delta").desc_nulls_last(), F.asc("o_orderkey"))
    )


@register(
    "posexplode_with_ordinality",
    oracle=r"""
        SELECT doc_id,
               CAST(pos - 1 AS INT) AS pos,
               word
        FROM (
            SELECT doc_id,
                   unnest(list_filter(string_split_regex(text, '\s+'),
                                      x -> x <> '')) AS word,
                   generate_subscripts(list_filter(string_split_regex(text, '\s+'),
                                                   x -> x <> ''), 1) AS pos
            FROM documents
            WHERE doc_id < 20
        ) t
        WHERE pos <= 5
        ORDER BY doc_id, pos
    """,
    doc="posexplode (explode with ordinality): first five word positions per doc.",
)
def posexplode_with_ordinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    toks = F.filter(F.split("text", "\\s+"), lambda t: t != "")
    return (
        docs.select("doc_id", F.posexplode(toks).alias("pos", "word"))
        .filter(F.col("pos") <= 4)
        .select("doc_id", "pos", "word")
        .orderBy("doc_id", "pos")
    )


@register(
    "pandas_cogroup_order_fill",
    oracle="""
        SELECT o.o_orderkey,
               ROUND(5e-10 + o.o_totalprice, 4) AS o_totalprice,
               ROUND(5e-10 + COALESCE(l.line_total, 0.0), 4) AS line_total,
               CAST(COALESCE(l.n_lines, 0) AS BIGINT) AS n_lines
        FROM (SELECT * FROM orders WHERE o_orderkey < 500) o
        LEFT JOIN (
            SELECT l_orderkey,
                   SUM(l_extendedprice * (1 - l_discount)) AS line_total,
                   COUNT(*) AS n_lines
            FROM lineitem GROUP BY l_orderkey
        ) l ON l.l_orderkey = o.o_orderkey
        ORDER BY o.o_orderkey
    """,
    doc="cogroup(...).applyInPandas: orders and lineitems co-partitioned by "
    "orderkey, merged in pandas per group — the FlatMapCoGroupsInPandas "
    "surface, oracle-checked against the equivalent join+aggregate.",
)
def pandas_cogroup_order_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )

    def merge(odf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
        if odf.empty:  # lineitems whose order is filtered out
            return pd.DataFrame(
                columns=["o_orderkey", "o_totalprice", "line_total", "n_lines"]
            )
        total = float((ldf["l_extendedprice"] * (1 - ldf["l_discount"])).sum())
        return pd.DataFrame(
            {
                "o_orderkey": odf["o_orderkey"].iloc[:1],
                "o_totalprice": (odf["o_totalprice"].iloc[:1] + ROUND_BIAS).round(4)
                + 0.0,
                "line_total": [round(total + ROUND_BIAS, 4) + 0.0],
                "n_lines": [len(ldf)],
            }
        )

    return (
        orders.groupBy("o_orderkey")
        .cogroup(li.groupBy("l_orderkey"))
        .applyInPandas(
            merge,
            "o_orderkey long, o_totalprice double, line_total double, n_lines long",
        )
        .orderBy("o_orderkey")
    )
