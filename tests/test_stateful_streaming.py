"""applyInPandasWithState: per-key state must accumulate across
micro-batches and emit cumulative totals."""

from __future__ import annotations

from pyspark.sql import functions as F

from economic_data_etl_spark.streaming.stateful import running_totals_per_user


class TestRunningTotals:
    def test_state_accumulates_across_batches(self, spark, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        schema = "user_id long, value double"
        spark.createDataFrame([(1, 10.0), (1, 5.0), (2, 1.0)], schema) \
            .coalesce(1).write.parquet(str(tmp_path / "b1"))
        spark.createDataFrame([(1, 2.5), (3, 7.0)], schema) \
            .coalesce(1).write.parquet(str(tmp_path / "b2"))
        i = 0
        for sub in ["b1", "b2"]:
            for f in sorted((tmp_path / sub).glob("*.parquet")):
                f.rename(src / f"drop{i}.parquet")
                i += 1

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            running_totals_per_user(stream)
            .writeStream.format("memory")
            .queryName("t_running")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        rows = spark.table("t_running").collect()
        # last emission per user = cumulative totals over both batches
        last = {}
        for r in rows:  # memory sink appends per batch; later rows overwrite
            last[r["user_id"]] = (r["total_events"], r["total_value"])
        assert last[1] == (3, 17.5)  # 10+5 in batch1, +2.5 in batch2
        assert last[2] == (1, 1.0)
        assert last[3] == (1, 7.0)
