"""ml_ols_normal_equations correctness beyond the oracle: the closed-form
Cramer solve must agree with numpy's least-squares on arbitrary data —
the oracle only proves Spark and DuckDB state the SAME formula; this
proves the formula is actually OLS."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from economic_data_etl_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _spark_ols_on(spark, rows):
    """Run the production moment+Cramer pipeline on an arbitrary
    (x1, x2, y) dataset by aliasing it to the lineitem column names."""
    from economic_data_etl_spark.plans.mlstats import (
        ml_ols_normal_equations,
    )

    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in rows],
        "l_quantity double, l_discount double, l_extendedprice double",
    )
    import economic_data_etl_spark.plans.mlstats as M

    orig = M.load_table
    M.load_table = lambda s, d, t: df
    try:
        return ml_ols_normal_equations(spark, "unused").collect()[0]
    finally:
        M.load_table = orig


class TestOlsAgainstNumpy:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_lstsq_on_random_data(self, spark, seed):
        rng = np.random.default_rng(seed)
        n = 400
        x1 = rng.uniform(1, 50, n)
        x2 = rng.uniform(0, 0.1, n)
        y = 3.0 + 2.5 * x1 - 40.0 * x2 + rng.normal(0, 5.0, n)
        row = _spark_ols_on(spark, zip(x1, x2, y))
        X = np.column_stack([np.ones(n), x1, x2])
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        assert row["n_rows"] == n
        assert row["beta0"] == pytest.approx(beta[0], abs=2e-4)
        assert row["beta1"] == pytest.approx(beta[1], abs=2e-4)
        assert row["beta2"] == pytest.approx(beta[2], abs=2e-4)
        resid = y - X @ beta
        r2 = 1 - (resid @ resid) / ((y - y.mean()) @ (y - y.mean()))
        assert row["r2"] == pytest.approx(r2, abs=2e-4)

    def test_exact_fit_recovers_coefficients(self, spark):
        """Noise-free plane → exact betas and R^2 == 1."""
        rows = [
            (a, b / 10.0, 2.0 + 0.5 * a - 3.0 * (b / 10.0))
            for a in range(1, 11)
            for b in range(1, 11)
        ]
        row = _spark_ols_on(spark, rows)
        assert row["beta0"] == pytest.approx(2.0, abs=1e-3)
        assert row["beta1"] == pytest.approx(0.5, abs=1e-3)
        assert row["beta2"] == pytest.approx(-3.0, abs=1e-3)
        assert row["r2"] == pytest.approx(1.0, abs=1e-3)

    def test_real_table_r2_in_range(self, spark):
        row = None
        from economic_data_etl_spark.plans.mlstats import (
            ml_ols_normal_equations,
        )

        row = ml_ols_normal_equations(spark, SF).collect()[0]
        n = load_table(spark, SF, "lineitem").count()
        assert row["n_rows"] == n
        assert 0.0 <= row["r2"] <= 1.0
