"""Parquet table catalog over a scale-factor directory.

At 100 TB the same reader works unchanged: `spark.read.parquet` gives
splittable columnar scans with predicate pushdown and column pruning; the
`sf_dir` would be an object-store prefix instead of a local path. Nothing
here materializes data on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic SF; used by
# plans/ to add explicit broadcast hints (AQE would usually pick these up,
# but the hint makes the plan deterministic).
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part"})


# Columns written as parquet TIMESTAMP(NANOS), which Spark refuses to read
# natively ([PARQUET_TYPE_ILLEGAL]). We read them as raw nanos via the
# legacy conf and truncate to microsecond timestamps — the same floor-to-µs
# DuckDB applies, so oracle comparisons agree.
NANOS_TS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    nanos_cols = NANOS_TS_COLUMNS.get(name, ())
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for col in nanos_cols:
        if isinstance(df.schema[col].dataType, LongType):
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"{col} div 1000"))
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
