"""Streaming exact-substring dedup: each micro-batch marks its k-gram
occurrences against a persistent gram index, emits merged duplicated
spans, and appends the retained first occurrence of its index-new grams.

The streaming twin of `operators/substring.py` (the Lee et al.
exact-substring pass): corpus text is tokenized and grammed exactly once
— on arrival — the standing index is parquet, and per-batch work is
O(batch tokens) plus one index join; the index never self-joins. In
production the index is written BUCKETED by gram (operators/skew.py:
write_bucketed): the membership join then shuffles only the batch side
while the corpus-sized index scans Exchange-free — plan-pinned in
tests/test_substring.py (bucketed gram-index test).

foreachBatch rather than a stateful operator for the same reason as the
MinHash/pHash/semantic streaming twins: the gram index must outlive the
stream (later batch jobs and other streams read it), the externalized-
state shape of the foreachBatch-MERGE sink in streaming/windows.py.

Restart semantics: the index carries PROVENANCE — each gram's retained
first occurrence — so a redelivered batch reproduces its original spans
bit-for-bit (its own firsts stay firsts; see
substring_incremental_dups_prov) and appends no index rows. Both sinks
are therefore at-least-once with EXACT-duplicate rows only; readers
dedupe spans by (doc_id, span_start) and the index is convergent
as-is (a gram's row is unique by construction, replay appends none).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from economic_data_etl_spark.operators.substring import (
    merge_spans,
    substring_incremental_dups_prov,
)
from economic_data_etl_spark.streaming.util import read_parquet_or_empty

INDEX_SCHEMA = StructType(
    [
        StructField("gram", StringType(), True),
        StructField("first_id", LongType(), True),
        StructField("first_pos", LongType(), True),
    ]
)


def foreach_batch_incremental_substring(
    index_dir: str,
    spans_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
):
    """Build the foreachBatch function. Per micro-batch:

    1. merged duplicated spans of the batch vs (index + batch)
       → append spans_dir
    2. retained first occurrences of the batch's index-new grams
       → append index_dir (empty on a redelivered batch)
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.persist()
        index = read_parquet_or_empty(spark, index_dir, INDEX_SCHEMA)
        dups, new_firsts = substring_incremental_dups_prov(
            index, batch_df, id_col, text_col, k
        )
        merge_spans(dups, id_col, k).write.mode("append").parquet(
            spans_dir
        )
        new_firsts.write.mode("append").parquet(index_dir)
        batch_df.unpersist()

    return handle
