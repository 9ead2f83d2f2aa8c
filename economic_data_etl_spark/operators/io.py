"""Partitioned-layout writers and pruning-aware readers.

The silver/gold layout story at 100 TB: facts written partitioned by a
coarse time column (and optionally bucketed by join key, see
operators/skew.py). A reader filtering on the partition column touches
only the matching directories — the scan lists N files, not the table
(`PartitionFilters` in the plan, verified in tests/test_io.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write a table hive-partitioned by `partition_cols`.

    Partition columns should be low-cardinality (date-derived buckets,
    source ids): each distinct combination is a directory, and >~10k
    partitions per write degrades listing and small-files behavior.
    """
    df.write.mode(mode).partitionBy(*partition_cols).format(fmt).save(path)


def read_partitioned(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Read a partitioned layout; partition-column filters prune
    directories before any data file is opened."""
    return spark.read.format(fmt).load(path)
