"""Streaming crawl frontier: canonical-URL dedup against a standing
seen-set, emitting only never-crawled pages.

The frontier is the stateful heart of a crawler: every discovered link
is canonicalized (operators/urls.py) and checked against the set of
URLs already seen; only new canonicals are emitted for fetching and
added to the seen-set. foreachBatch + a parquet seen-index is the right
Spark surface (the index outlives the stream — schedulers, re-crawl
policies and audits read it), the same externalized-state shape as the
other standing-index sinks (incremental_dedup/phash/semantic/substring).

Per-batch cost is O(batch): canonicalize (pure JVM projection), one
batch-local groupBy for first-occurrence, one anti-join against the
index on the canonical key. The index never self-joins.

Write order is load-bearing: frontier rows are appended BEFORE the index
rows. If the sink dies between the two appends, replay finds the batch's
canonicals still index-absent, recomputes the IDENTICAL frontier rows
(appended as exact duplicates — readers dedupe by canonical) and then
lands the index append; the reversed order would swallow the batch's
frontier output on replay. A fully redelivered batch appends nothing at
all (its canonicals are already indexed). Covered at every kill offset
by tests/test_crawl_frontier_stream.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from economic_data_etl_spark.operators.urls import canonical_url
from economic_data_etl_spark.streaming.util import read_parquet_or_empty

INDEX_SCHEMA = StructType(
    [
        StructField("canonical", StringType(), True),
        StructField("first_doc", LongType(), True),
    ]
)


def foreach_batch_crawl_frontier(
    index_dir: str,
    frontier_dir: str,
    id_col: str = "doc_id",
    url_col: str = "url",
):
    """Build the foreachBatch handler. Per micro-batch:

    1. canonicalize batch URLs; keep the batch-local first occurrence
       (min id) per canonical
    2. anti-join the standing seen-index -> new frontier rows
    3. append frontier rows to frontier_dir, THEN canonicals to
       index_dir (order is the crash-convergence contract above)
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        index = read_parquet_or_empty(spark, index_dir, INDEX_SCHEMA)
        firsts = (
            batch_df.select(
                F.col(id_col).alias("first_doc"),
                canonical_url(F.col(url_col)).alias("canonical"),
            )
            .groupBy("canonical")
            .agg(F.min("first_doc").alias("first_doc"))
        )
        new = firsts.join(
            index.select("canonical"), "canonical", "left_anti"
        ).persist()
        new.select("canonical", "first_doc").write.mode("append").parquet(
            frontier_dir
        )
        new.select("canonical", "first_doc").write.mode("append").parquet(
            index_dir
        )
        new.unpersist()

    return handle
