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


def chained_price_indices(
    py: DataFrame,
    round_fn: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """Chain-linked indices — what statistical agencies actually
    publish: each year links to the PREVIOUS year's basket (so new and
    exiting parts only affect the one link they straddle, unlike the
    fixed-base matched sample), and the chained index is the running
    product of links, computed as exp of a running log-sum window over
    the years-sized link table. Base year chains to exactly 1.

    (yr, n_parts_link, fisher_link, chained_laspeyres,
    chained_paasche, chained_fisher); the consecutive-year basket join
    is partkey-keyed like the fixed-base one."""
    from pyspark.sql.window import Window

    rnd = round_fn if round_fn is not None else (lambda c: c)
    prev = py.select(
        "partkey",
        (F.col("yr") + 1).alias("yr"),
        F.col("p").alias("p_prev"),
        F.col("q").alias("q_prev"),
    )
    lk = (
        py.join(prev, ["partkey", "yr"])
        .groupBy("yr")
        .agg(
            F.count(F.lit(1)).alias("n_parts_link"),
            F.sum(F.col("p") * F.col("q_prev")).alias("ptq0"),
            F.sum(F.col("p_prev") * F.col("q_prev")).alias("p0q0"),
            F.sum(F.col("p") * F.col("q")).alias("ptqt"),
            F.sum(F.col("p_prev") * F.col("q")).alias("p0qt"),
        )
    )
    l_link = F.col("ptq0") / F.col("p0q0")
    p_link = F.col("ptqt") / F.col("p0qt")
    links = lk.select(
        "yr",
        "n_parts_link",
        l_link.alias("l_link"),
        p_link.alias("p_link"),
        F.sqrt(l_link * p_link).alias("f_link"),
    )
    yrs = py.select("yr").distinct()
    w = (
        Window.orderBy("yr")  # years-sized table: global window is fine
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def chain(link_col: str) -> Column:
        return F.exp(
            F.sum(F.coalesce(F.log(F.col(link_col)), F.lit(0.0))).over(w)
        )

    return (
        yrs.join(links, "yr", "left")
        .select(
            "yr",
            F.coalesce(F.col("n_parts_link"), F.lit(0)).alias(
                "n_parts_link"
            ),
            rnd(F.col("f_link")).alias("fisher_link"),
            rnd(chain("l_link")).alias("chained_laspeyres"),
            rnd(chain("p_link")).alias("chained_paasche"),
            rnd(chain("f_link")).alias("chained_fisher"),
        )
        .orderBy("yr")
    )


def quantity_indices(
    py: DataFrame,
    round_fn: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """Quantity (volume) indices — the industrial-production twin of
    the price indices: Laspeyres_q = sum(p0*qt)/sum(p0*q0) (base-year
    prices), Paasche_q = sum(pt*qt)/sum(pt*q0), Fisher_q their
    geometric mean, plus the value ratio sum(pt*qt)/sum(p0*q0). Fisher
    satisfies the FACTOR-REVERSAL test by construction —
    Fisher_p * Fisher_q = value ratio algebraically — which the
    planted tests pin as an exact identity."""
    rnd = round_fn if round_fn is not None else (lambda c: c)
    base_yr = py.agg(F.min("yr").alias("yr0"))
    b = (
        py.join(F.broadcast(base_yr), py.yr == base_yr.yr0)
        .select("partkey", F.col("p").alias("p0"), F.col("q").alias("q0"))
    )
    m = (
        py.join(b, "partkey")
        .groupBy("yr")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.col("p0") * F.col("q")).alias("p0qt"),
            F.sum(F.col("p0") * F.col("q0")).alias("p0q0"),
            F.sum(F.col("p") * F.col("q")).alias("ptqt"),
            F.sum(F.col("p") * F.col("q0")).alias("ptq0"),
        )
    )
    lq = F.col("p0qt") / F.col("p0q0")
    pq = F.col("ptqt") / F.col("ptq0")
    return m.select(
        "yr",
        "n_parts",
        rnd(lq).alias("laspeyres_q"),
        rnd(pq).alias("paasche_q"),
        rnd(F.sqrt(lq * pq)).alias("fisher_q"),
        rnd(F.col("ptqt") / F.col("p0q0")).alias("value_ratio"),
    )
