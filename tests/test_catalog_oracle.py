"""Every SQL-expressible catalog query must match its DuckDB oracle at
sf0.001 (fast) — the same check the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from economic_data_etl_spark.plans import REGISTRY
from tests.oracle_util import compare_query

SQL_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle)
ROWS_ONLY = sorted(name for name, q in REGISTRY.items() if not q.oracle)


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_oracle_match(spark, sf_dir, name):
    q = REGISTRY[name]
    compare_query(spark, q.spark, q.oracle, sf_dir)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    q = REGISTRY[name]
    df = q.spark(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
