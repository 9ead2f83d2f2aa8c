"""Vector math over `array<float|double>` columns — pure column expressions.

Everything stays JVM-side (higher-order functions `zip_with`/`aggregate`),
so whole-stage codegen applies and there is no Python serialization in the
hot path. Inputs are cast to array<double> so accumulation runs in float64
regardless of the stored element type.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot_product(a: Column, b: Column) -> Column:
    """Elementwise multiply + left-to-right sum (deterministic order)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a,b) = a·b / (|a||b|); NULL if either norm is zero."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, dot_product(a, b) / denom)


def l2_normalize(a: Column) -> Column:
    """v / |v| elementwise (float64); NULL elements if |v| = 0.

    For pairwise work, normalizing each vector ONCE and comparing with a
    single dot product replaces the three folds cosine_similarity costs
    per pair (dot + two norms) — interpreted higher-order functions make
    that 3× the whole pair-scoring bill (measured 67 s → 12 s on the
    semantic-dedup pair join at sf0.1).
    """
    from economic_data_etl_spark.functions.text import let

    # Bind the norm ONCE per row: a captured expression re-evaluates on
    # every lambda invocation, so referencing the O(dim) norm fold
    # inside the per-element lambda was O(dim²) interpreted work per
    # row (the lambda-CSE rule). Same value, same arithmetic — the
    # norm is now a bound lambda-variable slot read per element.
    return let(
        l2_norm(a),
        lambda n: F.transform(
            _as_double(a), lambda x: F.when(n != 0.0, x / n)
        ),
    )
