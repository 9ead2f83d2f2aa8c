"""Custom Python DataSource: reading bronze snapshots must reproduce the
explicit parsers' output."""

from __future__ import annotations

import json

from economic_data_etl_spark.sources.bls import parse_bls_batch
from economic_data_etl_spark.sources.datasource import register
from economic_data_etl_spark.sources.fred import parse_fred_observations
from tests.fixtures_ref import RAW_BLS_JSON, RAW_FRED_JSON


class TestSnapshotDataSource:
    def test_reads_fred_and_bls_snapshots(self, spark, tmp_path):
        (tmp_path / "FRED_UNRATE_2024_01_15.json").write_text(
            json.dumps(RAW_FRED_JSON)
        )
        (tmp_path / "BLS_batch_2024_01_15.json").write_text(json.dumps(RAW_BLS_JSON))

        register(spark)
        df = spark.read.format("economic_snapshots").load(str(tmp_path))
        rows = {
            (r["series_id"], r["date"]): (r["series_name"], r["value"], r["source"])
            for r in df.collect()
        }
        # 4 FRED rows + 5 BLS monthly rows (M13 dropped)
        assert len(rows) == 9

        # parity with the explicit parsers
        fred = parse_fred_observations(
            spark, RAW_FRED_JSON, "UNRATE", "unemployment_rate"
        )
        for r in fred.collect():
            assert rows[("UNRATE", r["date"])] == (
                "unemployment_rate",
                r["value"],
                "FRED",
            )
        bls = parse_bls_batch(
            spark, RAW_BLS_JSON, {"nonfarm_payrolls": "CES0000000001"}
        )
        for r in bls.collect():
            got_name, got_value, got_source = rows[(r["series_id"], r["date"])]
            assert (got_value, got_source) == (r["value"], "BLS")

    def test_stream_reader_tails_new_snapshots(self, spark, tmp_path):
        """The streaming surface of the same source: first run consumes
        the initial drop; after a NEW snapshot lands, a second run from
        the same checkpoint reads only the new file."""
        src = tmp_path / "bronze"
        src.mkdir()
        ckpt = str(tmp_path / "ckpt")
        (src / "FRED_UNRATE_2024_01_15.json").write_text(
            json.dumps(RAW_FRED_JSON)
        )
        register(spark)

        out = str(tmp_path / "out")

        def run_once():
            q = (
                spark.readStream.format("economic_snapshots")
                .load(str(src))
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            return spark.read.parquet(out).collect()

        first = run_once()
        assert {r["source"] for r in first} == {"FRED"}
        n_first = len(first)
        assert n_first == 4

        (src / "BLS_batch_2024_01_16.json").write_text(json.dumps(RAW_BLS_JSON))
        second = run_once()
        # memory sink accumulates across restarts within the session:
        # total = first drop + only the new file's rows (no re-read)
        assert len(second) == n_first + 5
        assert {r["source"] for r in second} == {"FRED", "BLS"}

    def test_partitioned_by_file(self, spark, tmp_path):
        for i in range(3):
            (tmp_path / f"FRED_S{i}_2024_01_15.json").write_text(
                json.dumps(RAW_FRED_JSON)
            )
        register(spark)
        df = spark.read.format("economic_snapshots").load(str(tmp_path))
        assert df.rdd.getNumPartitions() == 3  # one partition per snapshot
        assert df.count() == 12
