"""Pandas-UDF surface (SURVEY.md §2.11): scalar pandas_udf, grouped-map
applyInPandas, grouped-agg pandas_udf — each Arrow-batched, each checked
against a pure-SQL oracle so the Python path is value-verified, not just
exercised.

These exist to prove the extension surface. The same computations ARE
expressible natively (and the native forms elsewhere in the catalog are
the preferred path); a real workload would reserve these hooks for logic
Spark can't express — model scoring, custom normalizations, library calls.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from economic_data_etl_spark.plans.catalog import ROUND_BIAS, register
from economic_data_etl_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# Scalar pandas_udf: vectorized discounted price.
# --------------------------------------------------------------------------
@pandas_udf(DoubleType())
def _discounted_price(ep: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
    return ep * (1.0 - disc) * (1.0 + tax)


@register(
    "pandas_udf_scalar_pricing",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               ROUND(5e-10 + l_extendedprice * (1 - l_discount) * (1 + l_tax), 4)
                   AS charged
        FROM lineitem
        WHERE l_orderkey <= 100
        ORDER BY l_orderkey, l_linenumber
    """,
    doc="Scalar pandas_udf (Arrow-vectorized, 3 input columns) — the slow-path "
    "escape hatch, value-checked against the native expression.",
)
def pandas_udf_scalar_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            (
                F.round(
                    _discounted_price("l_extendedprice", "l_discount", "l_tax")
                    + F.lit(ROUND_BIAS),
                    4,
                )
                + F.lit(0.0)  # collapse -0.0 (see catalog.biased_round)
            ).alias("charged"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# --------------------------------------------------------------------------
# Grouped-map applyInPandas: per-group z-score normalization.
# --------------------------------------------------------------------------
@register(
    "pandas_grouped_map_zscore",
    oracle="""
        SELECT o_orderkey, o_custkey,
               ROUND(5e-10 + CASE WHEN sd IS NULL OR sd = 0 THEN 0.0
                                  ELSE (o_totalprice - mu) / sd END, 4) AS zscore
        FROM (
            SELECT o_orderkey, o_custkey, o_totalprice,
                   AVG(o_totalprice)        OVER (PARTITION BY o_custkey) AS mu,
                   stddev_samp(o_totalprice) OVER (PARTITION BY o_custkey) AS sd
            FROM orders
        ) t
        WHERE o_custkey <= 200
        ORDER BY o_custkey, o_orderkey
    """,
    doc="applyInPandas grouped-map: per-customer z-score of order totals; "
    "oracle is the equivalent window-function SQL.",
)
def pandas_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["o_totalprice"].mean()
        sd = pdf["o_totalprice"].std(ddof=1)  # sample stddev, as stddev_samp
        if pd.isna(sd) or sd == 0:
            z = pd.Series(0.0, index=pdf.index)
        else:
            z = (pdf["o_totalprice"] - mu) / sd
        return pd.DataFrame(
            {
                "o_orderkey": pdf["o_orderkey"],
                "o_custkey": pdf["o_custkey"],
                "zscore": (z + ROUND_BIAS).round(4) + 0.0,
            }
        )

    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .groupBy("o_custkey")
        .applyInPandas(zscore, "o_orderkey long, o_custkey long, zscore double")
        .orderBy("o_custkey", "o_orderkey")
    )


# --------------------------------------------------------------------------
# Grouped-agg pandas_udf: trimmed mean (drop top/bottom 10%).
# --------------------------------------------------------------------------
@pandas_udf(DoubleType())
def _trimmed_mean(v: pd.Series) -> float:
    lo, hi = v.quantile(0.1), v.quantile(0.9)
    kept = v[(v >= lo) & (v <= hi)]
    return float(kept.mean()) if len(kept) else float("nan")


@register(
    "pandas_grouped_agg_trimmed_mean",
    oracle="""
        SELECT l_returnflag,
               ROUND(5e-10 + AVG(l_extendedprice) FILTER (
                   WHERE l_extendedprice >= q10 AND l_extendedprice <= q90), 4)
                   AS trimmed_mean_price
        FROM (
            SELECT l_returnflag, l_extendedprice,
                   quantile_cont(l_extendedprice, 0.1)
                       OVER (PARTITION BY l_returnflag) AS q10,
                   quantile_cont(l_extendedprice, 0.9)
                       OVER (PARTITION BY l_returnflag) AS q90
            FROM lineitem
        ) t
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    doc="Grouped-agg pandas_udf (10% trimmed mean) — a UDAF the SQL surface "
    "has no single builtin for; oracle reconstructs it with window quantiles.",
)
def pandas_grouped_agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            (
                F.round(_trimmed_mean("l_extendedprice") + F.lit(ROUND_BIAS), 4)
                + F.lit(0.0)
            ).alias("trimmed_mean_price")
        )
        .orderBy("l_returnflag")
    )
