"""Compactor quantile sketch (operators/kll.py): exact weight
conservation under any partitioning, measured rank error within the
self-reported bound on planted data, and degenerate-input behavior."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from economic_data_etl_spark.operators.kll import (
    kll_quantiles,
    kll_sketch,
)

_QS = [0.1, 0.5, 0.9]


def _vals_df(spark, vals, parts):
    return spark.createDataFrame(
        [(float(v),) for v in vals], "value double"
    ).repartition(parts)


def test_weight_conservation_any_partitioning(spark):
    vals = [((v * 2654435761) % 10007) / 7.0 for v in range(5000)]
    for parts in (1, 3, 16):
        pdf = kll_sketch(_vals_df(spark, vals, parts), "value").toPandas()
        (q, est, total, bound) = kll_quantiles(pdf, [0.5])[0]
        assert total == 5000, parts
        assert bound > 0 and not math.isnan(est)


def test_planted_uniform_ranks_within_bound(spark):
    """Values are a permutation of 0..9999: the true rank of any
    estimate is the estimate itself (+1), so the bound check is exact
    arithmetic on known ground truth."""
    vals = [(v * 4241) % 10000 for v in range(10000)]  # a permutation
    pdf = kll_sketch(_vals_df(spark, vals, 8), "value").toPandas()
    for q, est, total, bound in kll_quantiles(pdf, _QS):
        assert total == 10000
        true_rank = est + 1  # rank of <= est among 0..9999
        w_max = 1 << int(pdf.loc[pdf["level"] >= 0, "level"].max())
        assert abs(true_rank - q * total) <= bound + w_max + 1, (
            q,
            est,
            bound,
        )


def test_small_inputs_are_exact(spark):
    """Below one level capacity no compaction ever happens: the bound
    is 0 and quantiles are exact order statistics."""
    vals = list(range(100))
    pdf = kll_sketch(_vals_df(spark, vals, 4), "value").toPandas()
    for q, est, total, bound in kll_quantiles(pdf, _QS):
        assert total == 100 and bound == 0
        assert est == math.ceil(q * 100) - 1  # exact order statistic


def test_nulls_and_empty(spark):
    df = spark.createDataFrame(
        [(None,), (None,)], "value double"
    )
    pdf = kll_sketch(df, "value").toPandas()
    (q, est, total, bound) = kll_quantiles(pdf, [0.5])[0]
    assert total == 0 and math.isnan(est)
    # mixed: nulls are excluded from the weight
    df2 = spark.createDataFrame(
        [(1.0,), (None,), (2.0,)], "value double"
    )
    pdf2 = kll_sketch(df2, "value").toPandas()
    assert kll_quantiles(pdf2, [0.5])[0][2] == 2


def test_merge_of_summaries_matches_full_build_weight(spark):
    """Union-then-sketch and sketch-then-merge see the same total
    weight and both honor the bound on the same query points (the
    sketches themselves may differ — compaction order is arrival-
    dependent — but the CONTRACT is weight + bound, not bit equality)."""
    a = [float(v % 977) for v in range(3000)]
    b = [float((v * 13) % 977) for v in range(2000)]
    both = kll_sketch(_vals_df(spark, a + b, 8), "value").toPandas()
    (q, est, total, bound) = kll_quantiles(both, [0.5])[0]
    assert total == 5000
    exact = sorted(a + b)
    true_rank = sum(1 for v in exact if v <= est)
    w_max = 1 << int(both.loc[both["level"] >= 0, "level"].max())
    assert abs(true_rank - 0.5 * total) <= bound + w_max + 1


def test_rank_error_certificate_holds_with_null_values(spark, tmp_path):
    """inv_kll_rank_error's q=-1 conservation row must compare sketch
    weight against the NON-NULL, non-NaN value count (the sketch's
    stated contract), not COUNT(*): on data with NULL/NaN values the
    raw row count would falsely fail the certificate."""
    import datetime

    from economic_data_etl_spark.plans import REGISTRY

    rows = [
        (datetime.datetime(2024, 1, 1, 0, 0, i % 60), float(v % 97))
        for i, v in enumerate(range(500))
    ]
    rows += [(datetime.datetime(2024, 1, 2), None)] * 25
    rows += [(datetime.datetime(2024, 1, 3), float("nan"))] * 25
    spark.createDataFrame(rows, "ts timestamp, value double").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    out = REGISTRY["inv_kll_rank_error"].spark(spark, str(tmp_path))
    got = {r.q: r.within_bound for r in out.collect()}
    assert got[-1.0] == 1, got  # conservation vs non-null count
    assert all(v == 1 for v in got.values()), got
