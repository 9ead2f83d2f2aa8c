"""FRED observations → fact-table rows (DataFrame-native).

Reference parity: `parse_fred_observations`
(/root/reference/src/transform.py:4-30) — project (date, value), lenient
numeric cast where the string "." encodes a missing value, attach the
series literals, and emit the canonical 5-column fact schema
(/root/reference/src/transform.py:30).

Spark-first shape: the raw payload lands as ONE row with a nested
observations array (exactly how `spark.read.json` would load the bronze
snapshot), then explode → select. At scale the same plan runs over
thousands of snapshot files without touching the driver.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.functions.casts import try_double
from economic_data_etl_spark.schemas import FACT_COLUMNS, RAW_FRED_SCHEMA


def fred_observations_df(spark: SparkSession, payload: dict[str, Any]) -> DataFrame:
    """Lift a raw FRED JSON payload into the declared nested schema."""
    if "observations" not in payload:
        # Reference raises ValueError on malformed responses
        # (/root/reference/src/extract.py:94-95).
        raise ValueError("Invalid FRED response: missing 'observations'")
    return spark.createDataFrame([payload], RAW_FRED_SCHEMA)


def parse_fred_observations(
    spark: SparkSession,
    payload: dict[str, Any],
    series_id: str,
    series_name: str,
) -> DataFrame:
    """Raw FRED payload → fact rows (series_id, series_name, date, value,
    source). `"."` (FRED's missing marker) → NULL via try_cast; metadata
    fields (realtime_start etc.) are projected away."""
    raw = fred_observations_df(spark, payload)
    obs = raw.select(F.explode("observations").alias("o"))
    return obs.select(
        F.lit(series_id).alias("series_id"),
        F.lit(series_name).alias("series_name"),
        F.to_date("o.date", "yyyy-MM-dd").alias("date"),
        try_double(F.col("o.value")).alias("value"),
        F.lit("FRED").alias("source"),
    ).select(*FACT_COLUMNS)
