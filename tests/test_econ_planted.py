"""Planted-ground-truth tests for the Granger, price-index, and KL
operators: each statistic must FIND what it claims to measure on data
with a known answer — the semantic layer the cross-engine oracle hash
cannot express."""

from __future__ import annotations

import datetime
import math

from economic_data_etl_spark.operators.granger import granger_lead_fit
from economic_data_etl_spark.operators.prices import price_indices
from economic_data_etl_spark.plans.text5 import kl_by_source

_EPOCH = datetime.datetime(2024, 3, 4)


def _wave(d: int) -> float:
    # deterministic exciting input: bounded, non-periodic-in-7, zero-ish
    # mean — enough variance for the moments to be well-conditioned
    return math.sin(0.9 * d) + 0.3 * math.sin(2.3 * d + 1.0)


def _daily_xy(spark, rows):
    return spark.createDataFrame(
        [
            (_EPOCH + datetime.timedelta(days=d), float(x), float(y))
            for d, x, y in rows
        ],
        "day timestamp, x double, y double",
    )


def test_granger_recovers_planted_lag_coefficients(spark):
    """y_t = 0.5*y_{t-1} + 2*x_{t-1} exactly (no noise): the closed-form
    fit must recover both coefficients to float precision, with
    r2_full = 1 and an enormous F."""
    xs = [_wave(d) for d in range(80)]
    ys = [0.0]
    for d in range(1, 80):
        ys.append(0.5 * ys[d - 1] + 2.0 * xs[d - 1])
    rows = [(d, xs[d], ys[d]) for d in range(80)]
    (got,) = granger_lead_fit(_daily_xy(spark, rows)).collect()
    assert got.n == 79
    assert abs(got.b_ylag - 0.5) < 1e-9
    assert abs(got.b_xlag - 2.0) < 1e-9
    assert got.r2_full > 1.0 - 1e-12
    assert got.r2_ar < 0.9  # y's own lag alone cannot explain it
    assert got.f_stat > 1e6


def test_granger_null_when_x_is_irrelevant(spark):
    """y is a pure AR(1) process; an independent x must add ~nothing
    (F far below any significance threshold for n ~ 80)."""
    ys = [1.0]
    for d in range(1, 80):
        ys.append(0.8 * ys[d - 1] + _wave(d))  # AR(1) driven by _wave
    xs = [math.cos(1.7 * d + 0.5) for d in range(80)]  # unrelated
    rows = [(d, xs[d], ys[d]) for d in range(80)]
    (got,) = granger_lead_fit(_daily_xy(spark, rows)).collect()
    assert got.r2_full - got.r2_ar < 0.05
    assert got.f_stat < 4.0


def test_price_indices_on_uniform_inflation(spark):
    """Every part's price exactly doubles each year: Laspeyres, Paasche,
    and Fisher must all equal 2^t regardless of quantity drift, and the
    base year indexes at exactly 1."""
    rows = []
    for part in range(5):
        for yr in range(3):
            p0 = 10.0 + part
            rows.append(
                (part, 2000 + yr, p0 * (2.0**yr), 100.0 + 7 * part + yr)
            )
    py = spark.createDataFrame(
        rows, "partkey long, yr int, p double, q double"
    )
    out = {r.yr: r for r in price_indices(py).collect()}
    for yr, want in ((2000, 1.0), (2001, 2.0), (2002, 4.0)):
        r = out[yr]
        assert r.n_parts == 5
        for c in ("laspeyres", "paasche", "fisher"):
            assert abs(getattr(r, c) - want) < 1e-12, (yr, c)


def test_kl_orders_sources_by_planted_divergence(spark):
    """Two sources drawn from the corpus-typical vocabulary and one
    from a disjoint vocabulary: the divergent source must score far
    above both typical ones."""
    typical = "alpha beta gamma delta " * 10
    rows = (
        [(i, typical, "same_a") for i in range(10)]
        + [(i + 10, typical, "same_b") for i in range(10)]
        + [(i + 20, "omega sigma tau " * 12, "diverse") for i in range(4)]
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    kl = {r.source: r.kl_nats for r in kl_by_source(docs).collect()}
    assert kl["diverse"] > 5 * max(kl["same_a"], kl["same_b"])
    assert kl["same_a"] >= 0 and kl["same_b"] >= 0


def test_kl_excludes_null_source_entirely(spark):
    """A NULL-source doc must neither appear as an output group NOR
    leak its tokens into the global corpus distribution: results with
    the NULL doc present must equal results with it removed (the
    documented symmetric source-IS-NOT-NULL contract of the lane)."""
    base = [
        (0, "alpha beta gamma " * 5, "s_a"),
        (1, "alpha beta delta " * 5, "s_b"),
    ]
    with_null = base + [(2, "omega sigma tau " * 8, None)]
    schema = "doc_id long, text string, source string"
    got = {
        r.source: (r.n_tokens, r.vocab_present, round(r.kl_nats, 9))
        for r in kl_by_source(
            spark.createDataFrame(with_null, schema)
        ).collect()
    }
    want = {
        r.source: (r.n_tokens, r.vocab_present, round(r.kl_nats, 9))
        for r in kl_by_source(
            spark.createDataFrame(base, schema)
        ).collect()
    }
    assert None not in got
    assert got == want


def test_chained_indices_survive_part_churn(spark):
    """Uniform 2x-per-year inflation with parts ENTERING and EXITING:
    every year-over-year link still sees doubling on its overlap, so
    the chained index is exactly 2^t — the churn-robustness chaining
    exists for (a fixed-base matched sample shrinks instead)."""
    from economic_data_etl_spark.operators.prices import (
        chained_price_indices,
    )

    rows = []
    for part in range(6):
        # part 0 exists only in years 0-1, part 5 only in years 1-2
        years = (
            (0, 1) if part == 0 else (1, 2) if part == 5 else (0, 1, 2)
        )
        for yr in years:
            rows.append(
                (part, 2000 + yr, (10.0 + part) * (2.0**yr), 50.0 + part)
            )
    py = spark.createDataFrame(
        rows, "partkey long, yr int, p double, q double"
    )
    out = {r.yr: r for r in chained_price_indices(py).collect()}
    assert out[2000].fisher_link is None  # base year has no link
    for yr, want in ((2000, 1.0), (2001, 2.0), (2002, 4.0)):
        r = out[yr]
        for c in ("chained_laspeyres", "chained_paasche", "chained_fisher"):
            assert abs(getattr(r, c) - want) < 1e-9, (yr, c)
    assert out[2001].n_parts_link == 5  # part 5 enters in 2001
    assert out[2002].n_parts_link == 5  # part 0 exited after 2001


def test_fisher_factor_reversal_is_exact(spark):
    """Fisher's 'ideal' property: Fisher_price x Fisher_quantity equals
    the value ratio algebraically (sqrt collapses the cross terms) —
    checked on irregular planted data where the individual indices are
    NOT round numbers."""
    from economic_data_etl_spark.operators.prices import (
        price_indices,
        quantity_indices,
    )

    rows = []
    for part in range(7):
        for yr in range(3):
            p = 10.0 + 3 * part + 1.7 * yr * (part % 3 + 1)
            q = 40.0 + 5 * part - 2.0 * yr * (part % 2)
            rows.append((part, 2000 + yr, p, q))
    py = spark.createDataFrame(
        rows, "partkey long, yr int, p double, q double"
    )
    pr = {r.yr: r for r in price_indices(py).collect()}
    qt = {r.yr: r for r in quantity_indices(py).collect()}
    for yr in (2000, 2001, 2002):
        assert (
            abs(pr[yr].fisher * qt[yr].fisher_q - qt[yr].value_ratio)
            < 1e-9
        ), yr


def test_quantity_index_on_uniform_volume_growth(spark):
    """Quantities exactly double each year at constant prices: every
    quantity index and the value ratio equal 2^t."""
    from economic_data_etl_spark.operators.prices import quantity_indices

    rows = [
        (part, 2000 + yr, 10.0 + part, (50.0 + part) * (2.0**yr))
        for part in range(5)
        for yr in range(3)
    ]
    py = spark.createDataFrame(
        rows, "partkey long, yr int, p double, q double"
    )
    out = {r.yr: r for r in quantity_indices(py).collect()}
    for yr, want in ((2000, 1.0), (2001, 2.0), (2002, 4.0)):
        r = out[yr]
        for c in ("laspeyres_q", "paasche_q", "fisher_q", "value_ratio"):
            assert abs(getattr(r, c) - want) < 1e-12, (yr, c)


def test_holt_winters_tracks_planted_trend_plus_seasonality(spark):
    """Noiseless y_t = a + b*t + s_{t mod 7} (zero-sum weekly
    pattern): after enough observations the smoother's forecasts must
    track the true continuation closely (the recurrence is a
    contraction; init bias decays geometrically). Also pins horizon
    shape and date arithmetic."""
    import datetime

    from economic_data_etl_spark.operators.holtwinters import (
        holt_winters_forecast,
    )

    a, b = 100.0, 2.0
    s = [6.0, -3.0, 1.0, -4.0, 5.0, -2.0, -3.0]  # sums to 0
    n = 140  # 20 weeks
    rows = [
        (
            "k",
            datetime.datetime(2024, 1, 1) + datetime.timedelta(days=t),
            a + b * t + s[t % 7],
        )
        for t in range(n)
    ]
    daily = spark.createDataFrame(
        rows, "event_type string, day timestamp, total double"
    )
    got = holt_winters_forecast(daily, horizon=7).collect()
    assert len(got) == 7
    for r in got:
        t = n + r.h - 1  # forecast position (0-based)
        truth = a + b * t + s[t % 7]
        assert abs(r.yhat - truth) / truth < 0.02, (r.h, r.yhat, truth)
        assert r.forecast_day == (
            datetime.date(2024, 1, 1) + datetime.timedelta(days=t)
        )


def test_holt_winters_drops_short_series(spark):
    import datetime

    from economic_data_etl_spark.operators.holtwinters import (
        holt_winters_forecast,
    )

    rows = [
        (
            "short",
            datetime.datetime(2024, 1, 1) + datetime.timedelta(days=t),
            float(t),
        )
        for t in range(13)  # < 2*M
    ]
    daily = spark.createDataFrame(
        rows, "event_type string, day timestamp, total double"
    )
    assert holt_winters_forecast(daily, horizon=7).count() == 0


def _model_select_rows(spark, rows):
    """Run the full model-selection pipeline over an in-memory daily
    fixture (same train/holdout split and candidates as the catalog
    query, without the events-table plumbing)."""
    import datetime

    from pyspark.sql import functions as F

    from economic_data_etl_spark.operators.holtwinters import (
        holt_winters_damped_forecast,
        holt_winters_forecast,
        ses_forecast,
    )

    daily = spark.createDataFrame(
        rows, "event_type string, day timestamp, total double"
    )
    max_day = daily.agg(F.max("day")).collect()[0][0]
    cutoff = max_day - datetime.timedelta(days=7)
    train = daily.filter(F.col("day") <= F.lit(cutoff))
    actuals = daily.select(
        "event_type",
        F.col("day").cast("date").alias("forecast_day"),
        "total",
    )
    out = {}
    for name, fc in (
        ("holt_winters", holt_winters_forecast(train, 7)),
        ("damped_trend", holt_winters_damped_forecast(train, 7)),
        ("ses", ses_forecast(train, 7)),
    ):
        scored = fc.join(actuals, ["event_type", "forecast_day"])
        for r in (
            scored.groupBy("event_type")
            .agg(F.avg(F.abs(F.col("yhat") - F.col("total"))).alias("mae"))
            .collect()
        ):
            out.setdefault(r.event_type, {})[name] = r.mae
    return out


def test_model_select_prefers_hw_on_planted_seasonal_trend(spark):
    """On a noiseless trend+weekly-seasonal series the additive
    Holt-Winters holdout error must beat BOTH the damped-trend variant
    (which decays a persistent trend) and SES (which sees only a
    level) — the backtest-improvement claim behind
    ts_forecast_model_select, pinned on a fixture where the right
    answer is known."""
    import datetime

    a, b = 100.0, 2.0
    s = [6.0, -3.0, 1.0, -4.0, 5.0, -2.0, -3.0]
    rows = [
        (
            "k",
            datetime.datetime(2024, 1, 1) + datetime.timedelta(days=t),
            a + b * t + s[t % 7],
        )
        for t in range(140)
    ]
    maes = _model_select_rows(spark, rows)["k"]
    assert maes["holt_winters"] < maes["damped_trend"]
    assert maes["holt_winters"] < maes["ses"]
    # and not marginally: SES misses the whole trend+seasonal signal
    assert maes["ses"] > 5 * maes["holt_winters"]


def test_model_select_prefers_ses_on_trendless_series(spark):
    """On a flat series with non-periodic deterministic jitter the
    seasonal models hallucinate a weekly pattern from the first weeks'
    jitter while SES just tracks the level — SES must win."""
    import datetime

    rows = [
        (
            "k",
            datetime.datetime(2024, 1, 1) + datetime.timedelta(days=t),
            100.0 + 7.0 * (((t * 7919) % 13) - 6.0) / 6.0,
        )
        for t in range(140)
    ]
    maes = _model_select_rows(spark, rows)["k"]
    assert maes["ses"] < maes["holt_winters"]
    assert maes["ses"] < maes["damped_trend"]


def test_model_select_prefers_damped_on_decelerating_trend(spark):
    """Linear growth through training, then the holdout grows at 40%
    of the train slope: plain Holt-Winters extrapolates the full slope
    (overshoot grows with h), SES forecasts flat (misses the remaining
    growth AND carries the (1-a)/a trend lag), while the phi-damped
    forecast's shrunken trend lands closest — the regime the damped
    model exists for. (A FLAT holdout would instead be SES's exact
    forecast form — SES wins any plateau fixture, which is why this
    one decelerates rather than stops.)"""
    import datetime

    slope, frac, n = 20.0, 0.4, 140
    cut = n - 8  # last train day; the final 7 days are the holdout
    rows = [
        (
            "k",
            datetime.datetime(2024, 1, 1) + datetime.timedelta(days=t),
            100.0 + slope * min(t, cut) + frac * slope * max(t - cut, 0),
        )
        for t in range(n)
    ]
    maes = _model_select_rows(spark, rows)["k"]
    assert maes["damped_trend"] < maes["holt_winters"]
    assert maes["damped_trend"] < maes["ses"]
