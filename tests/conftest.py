from __future__ import annotations

import pytest

from economic_data_etl_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF001_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="engine-tests", master="local[4]", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
