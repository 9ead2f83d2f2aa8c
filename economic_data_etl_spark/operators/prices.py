"""Index-number computation over a (partkey, yr, p, q) unit-value table.

Laspeyres (base-year basket), Paasche (current basket), and the Fisher
ideal (their geometric mean) — the CPI arithmetic. Consumes the
parts x years table one aggregation produces from the fact volume, NOT
raw lineitems; the basket join is partkey-keyed (bucketable) and the
index arithmetic runs on a years-sized table.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def price_indices(
    py: DataFrame,
    round_fn: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """(yr, n_parts, laspeyres, paasche, fisher) per year, base = the
    earliest year. Only parts present in BOTH the base year and year t
    enter year t's index (the matched-sample convention). `py` feeds
    several consumers — pass it materialized (localCheckpoint) when it
    derives from a large scan."""
    rnd = round_fn if round_fn is not None else (lambda c: c)
    base_yr = py.agg(F.min("yr").alias("yr0"))
    # broadcast-of-scalar: the 1-row base year reaches every partition
    # without a shuffle.
    b = (
        py.join(F.broadcast(base_yr), py.yr == base_yr.yr0)
        .select("partkey", F.col("p").alias("p0"), F.col("q").alias("q0"))
    )
    m = (
        py.join(b, "partkey")
        .groupBy("yr")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.col("p") * F.col("q0")).alias("ptq0"),
            F.sum(F.col("p0") * F.col("q0")).alias("p0q0"),
            F.sum(F.col("p") * F.col("q")).alias("ptqt"),
            F.sum(F.col("p0") * F.col("q")).alias("p0qt"),
        )
    )
    lasp = F.col("ptq0") / F.col("p0q0")
    paas = F.col("ptqt") / F.col("p0qt")
    return m.select(
        "yr",
        "n_parts",
        rnd(lasp).alias("laspeyres"),
        rnd(paas).alias("paasche"),
        rnd(F.sqrt(lasp * paas)).alias("fisher"),
    )
