"""Driver contract for the spark-graft builder (PySpark target).

Exposes the engine's query catalog (economic_data_etl_spark.plans) to the
driver: `entry` runs the flagship query at sf0.001, `queries()` maps every
implemented operator to a (spark, sf_dir) -> DataFrame builder, and
`oracle_sql()` provides the DuckDB-equivalent SQL for each SQL-expressible
query (hash-based ops are rows-only by design).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from economic_data_etl_spark.plans import REGISTRY

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["q1_pricing_summary"].spark(spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query; hash-family ops are omitted
    (rows-only check) because their hash functions are not SQL-portable."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
