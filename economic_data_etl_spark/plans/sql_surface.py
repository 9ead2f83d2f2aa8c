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


_BFS_BODY = """
    WITH RECURSIVE base AS (
        SELECT DISTINCT o_custkey AS c, l_suppkey AS s
        FROM {orders} JOIN {lineitem} ON o_orderkey = l_orderkey
    ), edges AS (
        SELECT 'c:' || CAST(c AS {str_t}) AS src,
               's:' || CAST(s AS {str_t}) AS dst
        FROM base
        UNION ALL
        SELECT 's:' || CAST(s AS {str_t}), 'c:' || CAST(c AS {str_t})
        FROM base
    ), reach(node, hop) AS (
        SELECT 'c:' || CAST(c_custkey AS {str_t}), 0
        FROM {customer} WHERE c_custkey <= 3
        UNION ALL
        SELECT DISTINCT e.dst, r.hop + 1
        FROM reach r JOIN edges e ON e.src = r.node
        WHERE r.hop < 3
    )
    SELECT hop, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM (SELECT node, MIN(hop) AS hop FROM reach GROUP BY node) t
    GROUP BY hop
    ORDER BY hop
"""


@register(
    "sql_recursive_bfs",
    oracle=_BFS_BODY.format(
        orders="orders", lineitem="lineitem", customer="customer",
        str_t="VARCHAR",
    ),
    doc="SQL front door: WITH RECURSIVE (Spark 4.x) breadth-first "
    "reachability over the customer↔supplier trade graph — nodes within "
    "3 hops of customers 1-3, counted at their MINIMUM hop distance. "
    "The recursive step is SELECT DISTINCT, so each level is a node-SET "
    "(≤|V| rows), not a path multiset — without it the dense bipartite "
    "graph enumerates paths and blows the 1M-row recursion limit at "
    "sf0.01 (UNION-distinct recursion would be equivalent but Spark 4.1 "
    "rejects it: UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE). Depth guard "
    "terminates the cyclic (undirected) walk; the identical SQL text "
    "runs on DuckDB as the oracle. Complements the DataFrame-API "
    "iteration operators (components, pagerank).",
)
def sql_recursive_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "orders", "__sql_r_orders")
    _view(spark, sf_dir, "lineitem", "__sql_r_lineitem")
    _view(spark, sf_dir, "customer", "__sql_r_customer")
    return spark.sql(
        _BFS_BODY.format(
            orders="__sql_r_orders",
            lineitem="__sql_r_lineitem",
            customer="__sql_r_customer",
            str_t="STRING",
        )
    )
