"""Runtime bloom-filter join reduction (Catalyst InjectRuntimeFilter).

The 100 TB join pattern: a selectively-filtered dimension joined to a
huge fact shuffles the ENTIRE fact side unless something prunes it
first. Spark's runtime filter builds a bloom filter over the filtered
(creation) side's join keys and injects `might_contain(...)` into the
application side's scan filter — fact rows that cannot match are dropped
BEFORE the shuffle, map-side. This is the idiomatic Spark answer to
semi-join reduction; no custom operator needed, which is why the engine
relies on the optimizer here rather than shipping one.

`spark.sql.optimizer.runtime.bloomFilter.enabled` is default-true in
Spark 4; the injection additionally requires the application side to
look scan-heavy (default threshold 10 GB), so at test scale the
thresholds are lowered to make the rewrite observable. At real scale the
defaults fire on exactly the joins that need it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from economic_data_etl_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def bloom_confs(spark):
    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
    }
    old = {}
    for k, v in keys.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


class TestRuntimeBloomFilter:
    def test_default_enabled(self, spark):
        assert (
            spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
            == "true"
        )

    def test_bloom_injected_and_result_exact(self, spark, bloom_confs):
        orders = load_table(spark, SF, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, SF, "lineitem")
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, (
            "runtime bloom filter not injected:\n" + plan[:2000]
        )
        # bloom filters have false positives but NO false negatives:
        # the reduced join must be value-identical to the plain join.
        with_bloom = {tuple(r) for r in j.collect()}
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
        )
        try:
            without = {tuple(r) for r in j.collect()}
        finally:
            spark.conf.set(
                "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
            )
        assert with_bloom == without
