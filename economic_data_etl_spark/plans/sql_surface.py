"""SQL-text interface: the engine's catalog is equally drivable through
`spark.sql` — CTEs, LATERAL VIEW explode, window specs in SQL. These
queries register temp views over the parquet catalog and submit SQL
strings, proving the SQL front door end-to-end (same Catalyst plans as
the DataFrame API).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from economic_data_etl_spark.plans.catalog import register
from economic_data_etl_spark.sources.tables import load_table


def _view(spark: SparkSession, sf_dir: str, table: str, view: str) -> None:
    load_table(spark, sf_dir, table).createOrReplaceTempView(view)


@register(
    "sql_cte_window",
    oracle="""
        WITH seg_orders AS (
            SELECT c_mktsegment, o_orderkey, o_totalprice
            FROM customer JOIN orders ON c_custkey = o_custkey
        ), ranked AS (
            SELECT c_mktsegment, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS rn
            FROM seg_orders
        )
        SELECT c_mktsegment, o_orderkey,
               ROUND(5e-10 + o_totalprice, 4) AS o_totalprice
        FROM ranked WHERE rn <= 5
        ORDER BY c_mktsegment, o_totalprice DESC, o_orderkey
    """,
    doc="SQL front door: chained CTEs + window ranking submitted as SQL text.",
)
def sql_cte_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "customer", "__sql_customer")
    _view(spark, sf_dir, "orders", "__sql_orders")
    return spark.sql(
        """
        WITH seg_orders AS (
            SELECT c_mktsegment, o_orderkey, o_totalprice
            FROM __sql_customer JOIN __sql_orders ON c_custkey = o_custkey
        ), ranked AS (
            SELECT c_mktsegment, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS rn
            FROM seg_orders
        )
        SELECT c_mktsegment, o_orderkey,
               ROUND(o_totalprice + 5e-10, 4) AS o_totalprice
        FROM ranked WHERE rn <= 5
        ORDER BY c_mktsegment, o_totalprice DESC, o_orderkey
        """
    )


@register(
    "sql_lateral_view_explode",
    oracle=r"""
        SELECT source, word, COUNT(*) AS n
        FROM (
            SELECT source,
                   unnest(list_filter(string_split_regex(text, '\s+'),
                                      x -> x <> '')) AS word
            FROM documents
        ) t
        WHERE word IN ('spark', 'data', 'query')
        GROUP BY source, word
        ORDER BY source, word
    """,
    doc="SQL front door: LATERAL VIEW explode (HiveQL-style) over split text.",
)
def sql_lateral_view_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "documents", "__sql_documents")
    return spark.sql(
        r"""
        SELECT source, word, COUNT(*) AS n
        FROM __sql_documents
        LATERAL VIEW explode(filter(split(text, '\\s+'), t -> t != '')) w AS word
        WHERE word IN ('spark', 'data', 'query')
        GROUP BY source, word
        ORDER BY source, word
        """
    )
