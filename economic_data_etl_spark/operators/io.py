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


def compact_partitioned(
    spark: SparkSession,
    path: str,
    partition_cols: Sequence[str],
    files_per_partition: int = 1,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Small-files compaction: rewrite a partitioned table with a bounded
    file count per partition.

    Streaming/incremental writers accrete many small files per partition;
    at scale that degrades scan listing and parquet row-group efficiency.
    `repartition(partition_cols)` co-locates each hive partition's rows so
    the writer emits `files_per_partition` files for it;
    `sortWithinPartitions` additionally clusters rows so min/max row-group
    stats become selective (poor-man's data clustering). Staged rewrite +
    directory swap, same atomicity story as the upsert.
    """
    import os
    import shutil

    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    cols = [F.col(c) for c in partition_cols]
    compacted = df.repartition(files_per_partition * max(1, len(partition_cols)), *cols)
    if sort_cols:
        compacted = compacted.sortWithinPartitions(*sort_cols)
    staging = f"{path}.compacting"
    compacted.write.mode("overwrite").partitionBy(*partition_cols).parquet(staging)
    shutil.rmtree(path)
    os.rename(staging, path)
