"""Stream-stream interval join: must equal the equivalent batch join."""

from __future__ import annotations

from pyspark.sql import functions as F

from economic_data_etl_spark.sources.tables import load_table
from economic_data_etl_spark.streaming.windows import stream_stream_interval_join

SF_DIR = "/root/testdata/sf0.001"


class TestStreamStreamJoin:
    def test_matches_batch_interval_join(self, spark, tmp_path):
        ev = load_table(spark, SF_DIR, "events").orderBy("event_id").limit(600)
        purchases = ev.filter(F.col("event_type") == "purchase").select(
            "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
        )
        views = ev.filter(F.col("event_type") == "view").select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
            F.col("event_id").alias("v_id"),
        )
        p_dir, v_dir = str(tmp_path / "p"), str(tmp_path / "v")
        purchases.coalesce(1).write.parquet(p_dir)
        views.coalesce(1).write.parquet(v_dir)

        p_stream = spark.readStream.schema(purchases.schema).parquet(p_dir)
        v_stream = (
            spark.readStream.schema(views.schema)
            .parquet(v_dir)
            .withColumnRenamed("v_user", "user_id")
        )
        joined = stream_stream_interval_join(
            p_stream, v_stream, "user_id", "p_ts", "v_ts", max_delay="1 hour"
        ).select("p_id", "v_id")
        q = (
            joined.writeStream.format("memory")
            .queryName("t_ssj")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {(r["p_id"], r["v_id"]) for r in spark.table("t_ssj").collect()}

        want = {
            (r["p_id"], r["v_id"])
            for r in purchases.join(
                views,
                (purchases.user_id == views.v_user)
                & (views.v_ts <= purchases.p_ts)
                & (views.v_ts >= purchases.p_ts - F.expr("INTERVAL 1 HOUR")),
            ).collect()
        }
        assert got == want
        assert want  # non-trivial: some purchase-view pairs exist
