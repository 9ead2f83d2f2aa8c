"""Streaming semantics: stream-static joins and watermark late-data drop."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def _drops(spark, tmp_path, batches, schema):
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(tmp_path / f"b{i}")
        )
    j = 0
    for i in range(len(batches)):
        for f in sorted((tmp_path / f"b{i}").glob("*.parquet")):
            f.rename(src / f"drop{j}.parquet")
            j += 1
    return src


class TestStreamStaticJoin:
    def test_stream_enriched_by_static_dim(self, spark, tmp_path):
        schema = "user_id long, value double"
        src = _drops(
            spark,
            tmp_path,
            [[(1, 10.0), (2, 20.0)], [(1, 5.0), (3, 30.0)]],
            schema,
        )
        static_dim = spark.createDataFrame(
            [(1, "gold"), (2, "silver"), (3, "bronze")], "user_id long, tier string"
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        enriched = (
            stream.join(static_dim, "user_id")  # stream-static join
            .groupBy("tier")
            .agg(F.sum("value").alias("total"))
        )
        q = (
            enriched.writeStream.format("memory")
            .queryName("t_static_join")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {r["tier"]: r["total"] for r in spark.table("t_static_join").collect()}
        assert got == {"gold": 15.0, "silver": 20.0, "bronze": 30.0}


class TestWatermarkLateData:
    def test_late_rows_beyond_watermark_are_dropped(self, spark, tmp_path):
        """Run the query twice over a shared checkpoint so the watermark
        from run 1 (12:10 - 1h = 11:10) is durably committed before the
        late data arrives in run 2 — deterministic batch boundaries."""
        schema = "ts timestamp, value double"
        t = lambda h, m=0: datetime.datetime(2024, 1, 1, h, m)
        src = tmp_path / "src"
        src.mkdir()
        ckpt = str(tmp_path / "ckpt")
        out = str(tmp_path / "out")

        def run_once(qname: str):
            stream = spark.readStream.schema(schema).parquet(str(src))
            agg = (
                stream.withWatermark("ts", "1 hour")
                .groupBy(F.window("ts", "1 hour").alias("w"))
                .agg(F.sum("value").alias("total"))
                .select(F.col("w.start").alias("ws"), "total")
            )
            q = (
                agg.writeStream.format("parquet")
                .queryName(qname)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .option("path", out)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        def drop(name, rows):
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
                str(tmp_path / name)
            )
            for f in (tmp_path / name).glob("*.parquet"):
                f.rename(src / f"{name}.parquet")

        drop("d0", [(t(12, 0), 1.0), (t(12, 10), 1.0)])
        run_once("t_latedrop_1")  # commits watermark 11:10

        drop("d1", [(t(9, 30), 99.0), (t(11, 30), 5.0)])
        drop("d2", [(t(20, 0), 1.0)])  # advances time so open windows close
        run_once("t_latedrop_2")

        got = {r["ws"]: r["total"] for r in spark.read.parquet(out).collect()}
        assert t(9) not in got  # >1h-late row dropped entirely
        assert got.get(t(11)) == 5.0  # in-watermark row survives
        assert got.get(t(12)) == 2.0
