"""Skew/co-location utilities: correctness of salted shapes and the
no-shuffle property of bucketed joins."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from economic_data_etl_spark.operators.skew import (
    salted_broadcast_join,
    salted_sum,
    write_bucketed,
)
from economic_data_etl_spark.sources.tables import load_table


class TestSaltedAgg:
    def test_matches_plain_aggregation(self, spark, sf_dir):
        li = load_table(spark, sf_dir, "lineitem")
        salted = salted_sum(
            li, ["l_returnflag"], {"l_quantity": "sum_qty"}, salt_buckets=8
        )
        plain = li.groupBy("l_returnflag").agg(
            F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n_rows")
        )
        got = {r["l_returnflag"]: (round(r["sum_qty"], 4), r["n_rows"]) for r in salted.collect()}
        want = {r["l_returnflag"]: (round(r["sum_qty"], 4), r["n_rows"]) for r in plain.collect()}
        assert got == want


class TestSaltedJoin:
    def test_matches_plain_join(self, spark, sf_dir):
        orders = load_table(spark, sf_dir, "orders")
        cust = load_table(spark, sf_dir, "customer").withColumnRenamed(
            "c_custkey", "o_custkey"
        )
        salted = salted_broadcast_join(orders, cust, "o_custkey", salt_buckets=4)
        plain = orders.join(cust, "o_custkey")
        assert salted.count() == plain.count()
        got = salted.groupBy("c_mktsegment").count().collect()
        want = plain.groupBy("c_mktsegment").count().collect()
        assert {r[0]: r[1] for r in got} == {r[0]: r[1] for r in want}


class TestBucketedJoin:
    def test_bucketed_join_has_no_exchange(self, spark, sf_dir):
        # saveAsTable writes to the session warehouse dir (static conf);
        # DROP TABLE in the finally block removes the managed files.
        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        write_bucketed(orders, "b_orders", "o_orderkey", 8, sort_col="o_orderkey")
        write_bucketed(li, "b_lineitem", "l_orderkey", 8, sort_col="l_orderkey")

        a = spark.table("b_orders")
        b = spark.table("b_lineitem")
        # Disable auto-broadcast so the join would otherwise be a
        # shuffle-requiring SortMergeJoin.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, a.o_orderkey == b.l_orderkey)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                joined.explain("formatted")
            plan = buf.getvalue()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan  # bucketing removed the shuffle
            assert joined.count() == li.count()
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
            spark.sql("DROP TABLE IF EXISTS b_orders")
            spark.sql("DROP TABLE IF EXISTS b_lineitem")


class TestAqeSkewJoin:
    def test_runtime_skew_split_activates(self, spark):
        """Salting (above) is the manual defense; AQE's skew-join split
        is the automatic one. Pin that a runtime-detected hot key turns
        the final adaptive plan into SortMergeJoin(skew=true) —
        thresholds scaled down so test-sized partitions count as skewed
        (defaults: factor 5, 256MB)."""
        confs = {
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        }
        saved = {k: spark.conf.get(k, None) for k in confs}
        try:
            for k, v in confs.items():
                spark.conf.set(k, v)
            hot = spark.range(200000).select(
                F.lit(0).alias("k"), F.col("id").alias("v")
            )
            cold = spark.range(1000).select(
                (F.col("id") % 100 + 1).alias("k"), F.col("id").alias("v")
            )
            right = spark.range(101).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("w")
            )
            j = hot.union(cold).join(right, "k")
            assert len(j.collect()) == 201000
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "isFinalPlan=true" in plan
            assert "skew=true" in plan
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
