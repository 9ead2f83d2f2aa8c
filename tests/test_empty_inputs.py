"""Every catalog query must run (not crash) on EMPTY input tables.

At 100 TB, empty slices are routine — a partition with no rows for the
filter, a tenant with no documents, a cold-start index. A query that
crashes on empty input (numpy on a 0-row sample, 1/n teleport terms,
argmax over an empty centroid array) takes the whole pipeline down.
Empty in → empty (or all-zero aggregate) out, same schema.
"""

from __future__ import annotations

import pytest

from economic_data_etl_spark.plans import REGISTRY
from economic_data_etl_spark.sources.tables import TABLES, load_table

SRC_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory) -> str:
    """All catalog tables with their real schemas and ZERO rows."""
    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        load_table(spark, SRC_DIR, t).limit(0).write.mode(
            "overwrite"
        ).parquet(str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_runs_on_empty_tables(spark, empty_sf, name):
    df = REGISTRY[name].spark(spark, empty_sf)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
