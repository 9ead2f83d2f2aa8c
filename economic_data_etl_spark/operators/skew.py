"""Skew mitigation and co-location utilities.

At 100 TB, two things kill jobs that look fine at test scale: a hot key
funneling one reducer (skew) and re-shuffling a fact table for every join
(co-location). These helpers encode the standard countermeasures:

- **Salted aggregation**: two-phase agg — first over (key, salt) spreading
  a hot key across `salt_buckets` reducers, then over (key). Correct for
  decomposable aggregates (sum/count/min/max; avg = sum/count).
- **Salted broadcast-side replication join**: replicate the small side
  per salt so a skewed big side joins on (key, salt) without one reducer
  owning the hot key. (AQE's skew-join split handles sort-merge cases;
  explicit salting covers aggregations and deterministic plans.)
- **Bucketed tables**: write both join sides bucketed by the join key so
  subsequent joins are shuffle-free scans (SortMergeJoin without
  Exchange). At 100 TB this converts every recurring fact-fact join from
  a full-network shuffle into a local merge.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence
from urllib.parse import urlparse

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_sum(
    df: DataFrame,
    keys: Sequence[str],
    agg_cols: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-resistant aggregation.

    `agg_cols` maps column → output alias; each is summed. Phase 1
    aggregates on (keys..., salt) — the hot key's rows spread over
    `salt_buckets` partial groups; phase 2 sums the partials per key.
    """
    salted = df.withColumn(
        SALT_COL, (F.rand(seed=42) * salt_buckets).cast("int")
    )
    phase1 = salted.groupBy(*keys, SALT_COL).agg(
        *[F.sum(c).alias(f"__p_{c}") for c in agg_cols],
        F.count(F.lit(1)).alias("__p_cnt"),
    )
    return phase1.groupBy(*keys).agg(
        *[F.sum(f"__p_{c}").alias(alias) for c, alias in agg_cols.items()],
        F.sum("__p_cnt").alias("n_rows"),
    )


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Join a skewed big side to a small side by replicating the small side
    once per salt value. The big side's hot key spreads across
    `salt_buckets` tasks; the small side stays broadcast-size times the
    salt factor."""
    big_salted = big.withColumn(
        SALT_COL, (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(salt_buckets - 1))
    ).alias(SALT_COL)
    small_replicated = small.select("*", salts)
    return big_salted.join(
        F.broadcast(small_replicated), [on, SALT_COL]
    ).drop(SALT_COL)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by the join key.

    Joins between two tables bucketed identically on the join key run
    WITHOUT a shuffle (no Exchange in the plan) — the scan is already
    partitioned the way the join needs.

    Stale-location handling: with the session-scoped in-memory
    metastore, a managed-table DIRECTORY can survive from a previous
    session while the table entry does not — saveAsTable then refuses
    with LOCATION_ALREADY_EXISTS even in overwrite mode (it sees a
    CREATE, not a REPLACE). Drop any current-session table first, then
    clear the orphaned location. A deployment with a persistent
    metastore (Hive/Glue/Unity) never enters this state — overwrite
    resolves through the catalog — so the filesystem fallback is
    local-mode-only by construction.
    """
    spark = df.sparkSession
    # Resolve the would-be managed location through the CATALOG, not by
    # assuming <warehouse>/<table>: a non-default current database puts
    # managed tables under <warehouse>/<db>.db/<table>, and a
    # db-qualified name must split before lowercasing. DESCRIBE DATABASE
    # reports the database's actual location in both layouts.
    parts = [p.strip("`") for p in table_name.split(".")]
    if len(parts) == 2:
        db, tbl = parts
    else:
        db, tbl = spark.catalog.currentDatabase(), parts[-1]
    spark.sql(f"DROP TABLE IF EXISTS `{db}`.`{tbl}`")
    db_loc = None
    for r in spark.sql(f"DESCRIBE DATABASE `{db}`").collect():
        if r[0].strip().lower().startswith("location"):
            db_loc = r[1]
            break
    if db_loc:
        loc = os.path.join(urlparse(db_loc).path or db_loc, tbl.lower())
        if os.path.isdir(loc):
            shutil.rmtree(loc, ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)
