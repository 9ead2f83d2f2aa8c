"""Semi-structured VARIANT surface (Spark 4 `parse_json` / `variant_get`).

VARIANT is Spark 4's binary-encoded semi-structured type: unlike a
stringly-JSON column, a VARIANT is parsed once at ingest and every
downstream path access is a cheap binary probe (no per-access re-parse),
which is the difference between usable and unusable JSON analytics at
100 TB. The oracle sidesteps the engine-specific binary encoding by
checking VALUES: DuckDB computes the same typed extractions with its
JSON functions, so any drift in path semantics, typed-cast behavior, or
missing-path nullability fails the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.sources.tables import load_table


@register(
    "variant_typed_extraction",
    oracle="""
        SELECT event_type AS etype,
               COUNT(*) AS n,
               ROUND(5e-10 + SUM(value), 4) AS sum_v,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT))
                    AS BIGINT) AS sum_k,
               CAST(COUNT(CAST(NULL AS INT)) AS BIGINT) AS n_missing
        FROM events
        GROUP BY event_type
        ORDER BY etype
    """,
    doc="Events re-encoded as a nested VARIANT (parse_json over a "
    "to_json'd struct embedding the stringly props), then typed path "
    "extraction: variant_get('$.t'/'$.v') for present paths, "
    "try_variant_get for an absent path (must be NULL, so its COUNT is "
    "0). Parse once, probe many — the binary VARIANT never re-parses "
    "per path access.",
)
def variant_typed_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    payload = F.parse_json(
        F.to_json(
            F.struct(
                F.col("event_type").alias("t"),
                F.col("value").alias("v"),
                F.get_json_object("props", "$.k").cast("int").alias("k"),
            )
        )
    )
    probed = ev.select(
        F.variant_get(payload, "$.t", "string").alias("etype"),
        F.variant_get(payload, "$.v", "double").alias("v"),
        F.try_variant_get(payload, "$.k", "int").alias("k"),
        F.try_variant_get(payload, "$.not_there", "int").alias("missing"),
    )
    return (
        probed.groupBy("etype")
        .agg(
            F.count(F.lit(1)).alias("n"),
            biased_round(F.sum("v")).alias("sum_v"),
            F.sum("k").alias("sum_k"),
            F.count("missing").alias("n_missing"),
        )
        .orderBy("etype")
    )
