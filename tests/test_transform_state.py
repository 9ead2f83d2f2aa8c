"""transformWithStateInPandas: streaming top-k state must equal a batch
top-k over the same input, and state must persist across micro-batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from economic_data_etl_spark.sources.tables import load_table
from economic_data_etl_spark.streaming.transform_state import (
    running_topk_per_user,
)
from economic_data_etl_spark.streaming.windows import events_stream

SF_DIR = "/root/testdata/sf0.001"


class TestTransformWithState:
    def test_missing_protobuf_gives_actionable_error(self, spark, tmp_path):
        from economic_data_etl_spark.streaming import transform_state as ts

        if ts.protobuf_available():
            pytest.skip("protobuf present; the guard path is unreachable")
        stream = spark.readStream.schema("user_id long, value double").parquet(
            str(tmp_path)
        )
        with pytest.raises(ImportError, match="google.protobuf"):
            running_topk_per_user(stream)

    @pytest.mark.skipif(
        not __import__(
            "economic_data_etl_spark.streaming.transform_state",
            fromlist=["protobuf_available"],
        ).protobuf_available(),
        reason="google.protobuf not installed in this image (required by "
        "PySpark's transformWithState driver worker)",
    )
    def test_streaming_topk_matches_batch(self, spark, tmp_path):
        """Two micro-batches (file drops); the FINAL emitted row per user
        (max n_seen) must carry the batch-computed top-3 over all rows."""
        ev = (
            load_table(spark, SF_DIR, "events")
            .orderBy("event_id")
            .limit(300)
            .select("event_id", "user_id", "ts", "value")
        )
        src = tmp_path / "src"
        src.mkdir()
        ev.filter(F.col("event_id") < 150).coalesce(1).write.parquet(
            str(tmp_path / "d1")
        )
        ev.filter(F.col("event_id") >= 150).coalesce(1).write.parquet(
            str(tmp_path / "d2")
        )
        i = 0
        for sub in ("d1", "d2"):
            for f in sorted((tmp_path / sub).glob("*.parquet")):
                f.rename(src / f"drop{i}.parquet")
                i += 1

        schema = "event_id long, user_id long, ts timestamp, value double"
        stream = events_stream(spark, str(src), schema)
        q = (
            running_topk_per_user(stream, k=3)
            .writeStream.format("memory")
            .queryName("topk_state")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.table("topk_state").collect()

        # latest emission per user = the one having seen the most rows
        final: dict[int, tuple[int, list[float]]] = {}
        for r in rows:
            prev = final.get(r["user_id"])
            if prev is None or r["n_seen"] > prev[0]:
                final[r["user_id"]] = (r["n_seen"], list(r["top_values"]))

        expected = {
            r["user_id"]: (r["n"], list(r["top"]))
            for r in ev.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.slice(
                    F.sort_array(F.collect_list("value"), asc=False), 1, 3
                ).alias("top"),
            )
            .collect()
        }
        assert set(final) == set(expected)
        for uid, (n, top) in expected.items():
            got_n, got_top = final[uid]
            assert got_n == n, f"user {uid}: saw {got_n} rows, want {n}"
            assert got_top == pytest.approx(top), f"user {uid} top-k"
