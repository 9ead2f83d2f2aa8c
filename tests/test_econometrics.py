"""Econometrics-lane invariants: properties the oracle hash can't state
directly — reconstruction identities, margin calibration, index-number
inequalities — plus plan-shape pins for the lane's scale claims."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from economic_data_etl_spark.plans import REGISTRY


def _rows(spark, sf_dir, name):
    return REGISTRY[name].spark(spark, sf_dir).collect()


def _plan(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].spark(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ---------------------------------------------------------------- values


def test_seasonal_reconstruction_identity(spark, sf_dir):
    """total == trend + seasonal + residual wherever the trend is
    defined (additive decomposition is exact by construction), and the
    seasonal indices sum to ~0 per series (they are normalized)."""
    rows = _rows(spark, sf_dir, "ts_seasonal_decompose")
    assert rows
    seasonal_by_type: dict[str, dict[int, float]] = {}
    for r in rows:
        if r.trend is not None:
            assert (
                abs(r.total - (r.trend + r.seasonal + r.residual)) < 1e-3
            ), r
        seasonal_by_type.setdefault(r.event_type, {})[r.dow] = r.seasonal
    for et, by_dow in seasonal_by_type.items():
        assert len(by_dow) == 7, (et, sorted(by_dow))
        assert abs(sum(by_dow.values())) < 1e-3, et


def test_fisher_between_laspeyres_and_paasche(spark, sf_dir):
    """The Fisher ideal index is the geometric mean of Laspeyres and
    Paasche, hence always between them; the base year indexes at 1."""
    rows = _rows(spark, sf_dir, "agg_price_index_fisher")
    assert rows
    base = min(rows, key=lambda r: r.yr)
    for c in ("laspeyres", "paasche", "fisher"):
        assert abs(getattr(base, c) - 1.0) < 1e-3, base
    for r in rows:
        lo, hi = sorted((r.laspeyres, r.paasche))
        assert lo - 1e-3 <= r.fisher <= hi + 1e-3, r
        assert r.real_rev_m > 0 and r.n_parts > 0


def test_benford_fractions_form_a_distribution(spark, sf_dir):
    rows = _rows(spark, sf_dir, "dq_benford_first_digit")
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.obs_frac for r in rows) - 1.0) < 1e-2
    # Benford expectations are a fixed distribution summing to 1
    assert abs(sum(r.benford_frac for r in rows) - 1.0) < 1e-2
    assert all(r.chisq_term >= 0 for r in rows)


def test_cusum_stat_and_incremental_twin_agree(spark, sf_dir):
    """The incremental fold must reproduce the one-shot CUSUM exactly
    at the rounded-output level (the driver checks this vs SQL; here
    we pin Spark-vs-Spark so a fold bug can't hide behind the oracle
    rounding)."""
    a = _rows(spark, sf_dir, "ts_cusum_changepoint")
    b = _rows(spark, sf_dir, "ts_incremental_cusum")
    assert a == b and a
    for r in a:
        assert r.s_max >= 0 and r.cusum_stat >= 0 and r.n_days > 1


def test_ipf_margins_calibrate(spark, sf_dir):
    """After the final COLUMN sweep, raked column margins equal the
    rescaled population margins exactly; row margins are within the
    usual one-sweep IPF slack."""
    from economic_data_etl_spark.plans.econometrics import _IPF_CUT
    from economic_data_etl_spark.sources.tables import load_table

    rows = _rows(spark, sf_dir, "ml_ipf_raking")
    assert rows
    orders = load_table(spark, sf_dir, "orders")
    n_pop = orders.count()
    n_samp = (
        orders.filter(F.col("o_totalprice") > _IPF_CUT).count()
    )
    scale = n_samp / n_pop
    pop_c = {
        r.st: r.n * scale
        for r in orders.groupBy(
            F.col("o_orderstatus").alias("st")
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got_c: dict[str, float] = {}
    for r in rows:
        got_c[r.st] = got_c.get(r.st, 0.0) + r.raked
        assert r.weight > 0
    for st, target in pop_c.items():
        assert abs(got_c[st] - target) < 1e-2, (st, got_c[st], target)


def test_hhi_bounds(spark, sf_dir):
    rows = _rows(spark, sf_dir, "agg_herfindahl_concentration")
    assert rows
    for r in rows:
        assert 1.0 / r.n_suppliers - 1e-6 <= r.hhi <= 1.0 + 1e-6, r
        assert abs(r.effective_suppliers * r.hhi - 1.0) < 1e-2, r


def test_kl_divergence_nonnegative(spark, sf_dir):
    rows = _rows(spark, sf_dir, "text_corpus_divergence_kl")
    assert rows
    for r in rows:
        assert r.kl_nats >= -1e-6, r
        assert 0 < r.vocab_present <= r.n_tokens


def test_hard_negatives_are_lexical_minus_semantic(spark, sf_dir):
    from economic_data_etl_spark.plans.text5 import _HN_K

    rows = _rows(spark, sf_dir, "retrieval_hard_negatives")
    assert rows  # the synthetic corpus has lexical/semantic divergence
    for r in rows:
        assert r.r_bm25 <= _HN_K and r.r_sem > _HN_K, r


def test_fertility_counts_are_consistent(spark, sf_dir):
    rows = _rows(spark, sf_dir, "text_tokenizer_fertility")
    assert rows
    for r in rows:
        assert r.n_tokens > 0 and r.n_bytes >= r.n_tokens, r
        # mean token length >= 1 char; tokens can't outnumber bytes
        assert r.avg_token_chars >= 1.0, r
        assert 0 < r.tokens_per_100_bytes <= 100.0, r


def test_granger_nesting_inequality(spark, sf_dir):
    """The full model nests the restricted one, so R2 can only rise,
    and the F statistic for the added regressor is nonnegative."""
    (row,) = _rows(spark, sf_dir, "ts_granger_lead_test")
    assert row.n > 3
    assert row.r2_full >= row.r2_ar - 1e-9
    assert row.f_stat >= -1e-9
    assert 0.0 <= row.r2_full <= 1.0 + 1e-9


# ------------------------------------------------------------ plan shapes


def test_price_index_base_year_broadcasts(spark, sf_dir):
    """The 1-row base-year scalar and the basket join must broadcast —
    a shuffled 1-row join at 100 TB would serialize the job."""
    plan = _plan(spark, sf_dir, "agg_price_index_fisher")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_benford_total_broadcasts(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dq_benford_first_digit")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_kl_join_is_token_keyed_not_grid(spark, sf_dir):
    """The Spark plan must never materialize the source x vocab grid:
    no cartesian product, and the postings join is hash-keyed."""
    plan = _plan(spark, sf_dir, "text_corpus_divergence_kl")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_cross_correlation_lag_grid_broadcasts(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ts_cross_correlation_lags")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_cusum_argmax_is_window_group_limit(spark, sf_dir):
    """row_number = 1 must short-circuit (WindowGroupLimit), not rank
    the whole cumsum table and filter."""
    plan = _plan(spark, sf_dir, "ts_cusum_changepoint")
    assert "WindowGroupLimit" in plan