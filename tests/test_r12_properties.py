"""Property tests for the round-12 statistical operators: closed-form
edge cases that the fixture data cannot reach."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from economic_data_etl_spark.plans.survival import km_curve


def test_km_without_censoring_is_empirical_survival(spark):
    """With zero censoring the KM estimator collapses to the plain
    empirical survival function: S(t) = #{gaps > t} / n exactly."""
    ts = [1, 1, 2, 3, 3, 3, 5, 8]
    df = spark.createDataFrame(
        [(t, 0) for t in ts], "t long, cens int"
    )
    out = {r["t"]: r["survival"] for r in km_curve(df).collect()}
    n = len(ts)
    for t in sorted(set(ts)):
        emp = sum(1 for x in ts if x > t) / n
        assert out[t] == pytest.approx(emp, abs=1e-4), t


def test_km_survival_is_monotone_nonincreasing(spark):
    rows = [(1, 0), (2, 1), (2, 0), (4, 0), (4, 1), (7, 0), (9, 1)]
    df = spark.createDataFrame(rows, "t long, cens int")
    s = [r["survival"] for r in km_curve(df).orderBy("t").collect()]
    assert all(a >= b for a, b in zip(s, s[1:]))


def test_auc_perfect_and_inverted_separation(spark):
    """AUC machinery: all positives above all negatives -> 2U = 2PN
    (AUC 1); inverted -> 0."""
    from economic_data_etl_spark.operators.rank import (
        with_global_cumsum,
    )

    def twice_u(rows):
        df = spark.createDataFrame(rows, "s double, y int")
        grp = df.groupBy("s").agg(
            F.sum("y").cast("long").alias("pos"),
            (F.count(F.lit(1)) - F.sum("y"))
            .cast("long")
            .alias("neg"),
        )
        cum = with_global_cumsum(grp, ["s"], ["neg"])
        return cum.agg(
            F.sum(
                F.col("pos")
                * (
                    2 * (F.col("cum_neg") - F.col("neg"))
                    + F.col("neg")
                )
            ).alias("u2")
        ).collect()[0]["u2"]

    perfect = [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)]
    inverted = [(0.9, 0), (0.8, 0), (0.2, 1), (0.1, 1)]
    assert twice_u(perfect) == 2 * 2 * 2
    assert twice_u(inverted) == 0


def test_markov_stationary_mass_conserved(spark, tmp_path):
    """Every state has outgoing probability mass summing to 1, so the
    power iteration conserves total mass exactly: sum(pi) == 1 at
    every round (up to rounding of the output)."""
    import datetime as dt

    from economic_data_etl_spark.plans import REGISTRY

    base = dt.datetime(2024, 2, 1)
    rows, eid = [], 0
    # one user cycling a->b->c->a...; another bouncing a<->c
    for i, t in enumerate("abcabcabc"):
        rows.append((eid, base + dt.timedelta(hours=i), 1,
                     f"t{t}", 1.0, "{}"))
        eid += 1
    for i, t in enumerate("acacac"):
        rows.append((eid, base + dt.timedelta(hours=i), 2,
                     f"t{t}", 1.0, "{}"))
        eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = REGISTRY["events_markov_stationary"].spark(
        spark, str(tmp_path)
    ).collect()
    assert sum(r["pi"] for r in out) == pytest.approx(1.0, abs=1e-3)


def test_trimmed_mean_resists_planted_outlier(spark, tmp_path):
    """One absurd order must move the raw mean but leave the trimmed
    mean at the clean value."""
    import datetime as dt

    from economic_data_etl_spark.plans import REGISTRY

    rows = [
        (i, 1, "O", 100.0 + i, dt.datetime(2024, 1, 1), "1-URGENT")
        for i in range(20)
    ] + [(99, 1, "O", 1e9, dt.datetime(2024, 1, 1), "1-URGENT")]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = REGISTRY["agg_trimmed_mean"].spark(
        spark, str(tmp_path)
    ).collect()[0]
    assert out["mean"] > 1e7  # the outlier owns the raw mean
    # 21 rows -> k = 2 trimmed each side -> rows 2..18 of the sorted
    # clean values survive; the 1e9 outlier is gone
    clean = sorted([100.0 + i for i in range(20)] + [1e9])[2:-2]
    assert out["trimmed_mean"] == pytest.approx(
        sum(clean) / len(clean), abs=1e-3
    )
