"""Distributed full-batch logistic GD: monotone loss at the fixed
step size, recovery of a separable concept, and the gradient math
against a numpy twin."""

from __future__ import annotations

import numpy as np

from economic_data_etl_spark.operators.logreg import (
    is_monotone,
    logistic_gd,
    predict_accuracy,
)


def _data(spark, n=400, seed=3):
    rng = np.random.RandomState(seed)
    x1 = rng.randn(n)
    x2 = rng.randn(n)
    y = ((2.0 * x1 - 1.0 * x2) > 0).astype(float)
    rows = [
        (float(a), float(b), float(c)) for a, b, c in zip(x1, x2, y)
    ]
    return (
        spark.createDataFrame(rows, "x1 double, x2 double, y double"),
        np.column_stack([np.ones(n), x1, x2]),
        y,
    )


def test_matches_numpy_twin_and_monotone(spark):
    df, X, y = _data(spark)
    lr, T = 2.0, 6
    betas, losses = logistic_gd(df, ["x1", "x2"], "y", lr=lr, steps=T)
    # numpy twin of the exact update rule
    b = np.zeros(3)
    np_losses = []
    for _ in range(T + 1):
        z = X @ b
        p = 1 / (1 + np.exp(-z))
        np_losses.append(
            float(-np.mean(y * np.log(p) + (1 - y) * np.log(1 - p)))
        )
        if len(np_losses) == T + 1:
            break
        b += lr * X.T @ (y - p) / len(y)
    assert np.allclose(betas, b, atol=1e-9)
    assert np.allclose(losses, np_losses, atol=1e-9)
    assert is_monotone(losses)
    assert losses[-1] < losses[0] * 0.8  # genuinely learned


def test_separable_concept_high_accuracy(spark):
    df, X, y = _data(spark)
    betas, _ = logistic_gd(df, ["x1", "x2"], "y", lr=5.0, steps=12)
    n_correct = predict_accuracy(df, ["x1", "x2"], "y", betas)
    assert n_correct / len(y) >= 0.95
    # learned direction matches the planted (2, -1) up to scale
    assert betas[1] > 0 and betas[2] < 0


def test_is_monotone_edges():
    assert is_monotone([1.0, 0.5, 0.5, 0.2])
    assert not is_monotone([1.0, 1.1])
    assert not is_monotone([1.0, float("nan")])
