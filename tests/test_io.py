"""Partitioned layout: round-trip fidelity + partition pruning proof."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from economic_data_etl_spark.operators.io import read_partitioned, write_partitioned
from economic_data_etl_spark.sources.tables import load_table


class TestPartitionedLayout:
    def test_roundtrip_and_pruning(self, spark, sf_dir, tmp_path):
        orders = load_table(spark, sf_dir, "orders").withColumn(
            "order_year", F.year("o_orderdate")
        )
        path = str(tmp_path / "orders_by_year")
        write_partitioned(orders, path, ["order_year"])

        back = read_partitioned(spark, path)
        assert back.count() == orders.count()

        filtered = back.filter(F.col("order_year") == 1996)
        want = orders.filter(F.col("order_year") == 1996).count()
        assert filtered.count() == want

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            filtered.explain("formatted")
        plan = buf.getvalue()
        pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
        assert "order_year" in pf  # pruning happens at listing time

    def test_compaction_bounds_file_count(self, spark, sf_dir, tmp_path):
        from pathlib import Path

        from economic_data_etl_spark.operators.io import compact_partitioned

        orders = load_table(spark, sf_dir, "orders").withColumn(
            "order_year", F.year("o_orderdate")
        )
        path = str(tmp_path / "orders_fragmented")
        # simulate an accreting writer: 8 small files per partition
        orders.repartition(8).write.partitionBy("order_year").parquet(path)
        before = len(list(Path(path).glob("order_year=*/*.parquet")))
        n_parts = orders.select("order_year").distinct().count()
        assert before > n_parts  # genuinely fragmented

        compact_partitioned(spark, path, ["order_year"], files_per_partition=1)
        after_files = list(Path(path).glob("order_year=*/*.parquet"))
        per_dir: dict[str, int] = {}
        for f in after_files:
            per_dir[f.parent.name] = per_dir.get(f.parent.name, 0) + 1
        assert all(n <= 2 for n in per_dir.values())  # bounded per partition
        back = spark.read.parquet(path)
        assert back.count() == orders.count()

    def test_partitioned_json_roundtrip(self, spark, sf_dir, tmp_path):
        docs = load_table(spark, sf_dir, "documents")
        path = str(tmp_path / "docs_by_source")
        write_partitioned(docs, path, ["source"], fmt="json")
        back = read_partitioned(spark, path, fmt="json")
        assert back.count() == docs.count()
        assert back.filter(F.col("source") == "src1").count() == docs.filter(
            F.col("source") == "src1"
        ).count()
