"""Distributed logistic regression via full-batch gradient descent.

The Lloyd-k-means execution split applied to a GLM: per step, ONE
distributed job computes the d+1 gradient sums and the current
log-loss (map-side combined — d+2 doubles leave each partition), the
driver updates the weight vector, and nothing driver-side grows with
the corpus. Full-batch with a FIXED learning rate and step count —
deterministic, no RNG, no line search — so the whole optimization is
replayable: the catalog certificate's DuckDB oracle re-runs every
step as a generated CTE chain (the inv_kmeans_pp_monotone pattern)
and the final weights/loss/accuracy are cross-engine value checks.

Loss history is recorded BEFORE each update plus once after the last,
so monotone descent (which full-batch GD delivers at a stable step
size) is a checkable verdict rather than an assumption.

No reference counterpart; extends the ML surface next to the
normal-equations OLS (plans/mlstats.py) with the classifier a
quality-gating pipeline actually trains (CCNet-style fasttext gates
reduce to exactly this shape: featurize, fit a linear classifier,
threshold).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logistic_gd(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float = 5.0,
    steps: int = 8,
) -> tuple[list[float], list[float]]:
    """Fit p(y=1|x) = sigmoid(b0 + sum_j b_j x_j) by `steps` full-batch
    gradient steps from beta = 0. Returns (betas, losses) with
    len(losses) == steps + 1 (loss at each beta, including the final).

    beta_j += lr * SUM((y - p) * x_j) / n   (x_0 = 1)
    """
    d = len(feature_cols)
    betas = [0.0] * (d + 1)
    losses: list[float] = []
    y = F.col(label_col).cast("double")
    xs = [F.col(c).cast("double") for c in feature_cols]

    for _ in range(steps + 1):
        z = F.lit(betas[0])
        for j in range(d):
            z = z + F.lit(betas[j + 1]) * xs[j]
        p = _sigmoid(z)
        resid = y - p
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            (-F.avg(
                y * F.log(p) + (F.lit(1.0) - y) * F.log(F.lit(1.0) - p)
            )).alias("loss"),
            F.sum(resid).alias("g0"),
            *[
                F.sum(resid * xs[j]).alias(f"g{j + 1}")
                for j in range(d)
            ],
        ).collect()[0]
        if row["n"] == 0:
            # empty corpus: nothing to fit — zero weights, no history
            # (empty in -> well-defined out, the catalog-wide contract)
            return betas, []
        losses.append(float(row["loss"]))
        if len(losses) == steps + 1:
            break
        n = float(row["n"])
        betas = [
            betas[j] + lr * float(row[f"g{j}"]) / n
            for j in range(d + 1)
        ]
    return betas, losses


def predict_accuracy(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    betas: list[float],
) -> int:
    """Exact count of rows where sign(z) matches the label."""
    z = F.lit(betas[0])
    for j, c in enumerate(feature_cols):
        z = z + F.lit(betas[j + 1]) * F.col(c).cast("double")
    correct = (z > 0) == (F.col(label_col).cast("double") == 1.0)
    return df.agg(
        F.sum(correct.cast("long")).alias("n_correct")
    ).collect()[0]["n_correct"]


def is_monotone(losses: list[float], rel_tol: float = 1e-9) -> bool:
    return all(
        losses[i + 1] <= losses[i] * (1 + rel_tol) + 1e-15
        for i in range(len(losses) - 1)
    ) and all(math.isfinite(v) for v in losses)
