"""Stream-stream LEFT OUTER interval join: matched pairs must equal the
batch join; unmatched left rows must surface null-padded once the
watermark passes their match interval.

The outer join can only emit an unmatched row when the watermark proves
no match can still arrive, and with availableNow replay the watermark
computed in the final micro-batch is only APPLIED by a subsequent batch.
A far-future flush event appended to both inputs forces that batch, so
every real row's interval is provably closed by termination.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row, functions as F

from economic_data_etl_spark.sources.tables import load_table
from economic_data_etl_spark.streaming.windows import (
    stream_stream_left_outer_join,
)

SF_DIR = "/root/testdata/sf0.001"
FLUSH_ID = -999


class TestStreamStreamLeftOuterJoin:
    def test_matched_equal_batch_unmatched_null_padded(self, spark, tmp_path):
        ev = load_table(spark, SF_DIR, "events").orderBy("event_id").limit(600)
        purchases = ev.filter(F.col("event_type") == "purchase").select(
            "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
        )
        views = ev.filter(F.col("event_type") == "view").select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
            F.col("event_id").alias("v_id"),
        )
        max_ts = ev.agg(F.max("ts")).collect()[0][0]
        flush_ts = max_ts + dt.timedelta(days=30)
        p_flush = spark.createDataFrame(
            [Row(user_id=FLUSH_ID, p_ts=flush_ts, p_id=FLUSH_ID)],
            schema=purchases.schema,
        )
        v_flush = spark.createDataFrame(
            [Row(v_user=FLUSH_ID, v_ts=flush_ts, v_id=FLUSH_ID)],
            schema=views.schema,
        )
        p_dir, v_dir = str(tmp_path / "p"), str(tmp_path / "v")
        purchases.unionByName(p_flush).coalesce(1).write.parquet(p_dir)
        views.unionByName(v_flush).coalesce(1).write.parquet(v_dir)

        p_stream = spark.readStream.schema(purchases.schema).parquet(p_dir)
        v_stream = (
            spark.readStream.schema(views.schema)
            .parquet(v_dir)
            .withColumnRenamed("v_user", "user_id")
        )
        joined = stream_stream_left_outer_join(
            p_stream, v_stream, "user_id", "p_ts", "v_ts", max_delay="1 hour"
        ).select("p_id", "v_id")
        q = (
            joined.writeStream.format("memory")
            .queryName("t_ssoj")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), "streaming query timed out"
        got = {
            (r["p_id"], r["v_id"])
            for r in spark.table("t_ssoj").collect()
            if r["p_id"] != FLUSH_ID
        }

        matched = {
            (r["p_id"], r["v_id"])
            for r in purchases.join(
                views,
                (purchases.user_id == views.v_user)
                & (views.v_ts <= purchases.p_ts)
                & (views.v_ts >= purchases.p_ts - F.expr("INTERVAL 1 HOUR")),
            ).collect()
        }
        matched_left = {p for p, _ in matched}
        unmatched = {
            (r["p_id"], None)
            for r in purchases.collect()
            if r["p_id"] not in matched_left
        }
        assert got == matched | unmatched
        assert matched and unmatched  # both behaviors exercised
