"""Distributed ML-statistics queries: multivariate OLS by normal
equations and correlation-matrix profiling.

`ml_ols_normal_equations` is the canonical "train a linear model on
100 TB in ONE aggregation pass" shape: the normal-equation moments
(Σx, Σx², Σxy, …) are a decomposable aggregate — map-side combine
collapses every task to 10 numbers — and the 3×3 solve is closed-form
scalar arithmetic on the single moment row (Cramer's rule), so the
corpus is scanned once and nothing but ten doubles moves. The same
pattern extends to any p via a p×p driver solve (p² numbers collected,
independent of row count). The DuckDB oracle states the identical
closed form, making a distributed regression value-checkable across
engines.

Reference parity: the reference has no analytics; this extends the
statistics family (plans/statistics2.py OLS trend, chi-square, mutual
information) to multivariate models.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.sources.tables import load_table


def _r(col):
    return biased_round(col)


@register(
    "ml_ols_normal_equations",
    oracle="""
    WITH m AS (
        SELECT COUNT(*) * 1.0 AS n,
               SUM(l_quantity) AS sx1, SUM(l_discount) AS sx2,
               SUM(l_quantity * l_quantity) AS sx11,
               SUM(l_quantity * l_discount) AS sx12,
               SUM(l_discount * l_discount) AS sx22,
               SUM(l_extendedprice) AS sy,
               SUM(l_quantity * l_extendedprice) AS sx1y,
               SUM(l_discount * l_extendedprice) AS sx2y,
               SUM(l_extendedprice * l_extendedprice) AS syy
        FROM lineitem
    ), solved AS (
        SELECT *,
               n * (sx11 * sx22 - sx12 * sx12)
               - sx1 * (sx1 * sx22 - sx12 * sx2)
               + sx2 * (sx1 * sx12 - sx11 * sx2) AS det
        FROM m
    ), beta AS (
        SELECT *,
               (sy  * (sx11 * sx22 - sx12 * sx12)
              - sx1 * (sx1y * sx22 - sx12 * sx2y)
              + sx2 * (sx1y * sx12 - sx11 * sx2y)) / det AS b0,
               (n   * (sx1y * sx22 - sx12 * sx2y)
              - sy  * (sx1 * sx22 - sx12 * sx2)
              + sx2 * (sx1 * sx2y - sx1y * sx2)) / det AS b1,
               (n   * (sx11 * sx2y - sx1y * sx12)
              - sx1 * (sx1 * sx2y - sx1y * sx2)
              + sy  * (sx1 * sx12 - sx11 * sx2)) / det AS b2
        FROM solved
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           ROUND(5e-10 + b0, 4) AS beta0,
           ROUND(5e-10 + b1, 4) AS beta1,
           ROUND(5e-10 + b2, 4) AS beta2,
           ROUND(5e-10 + 1.0 - (syy - b0 * sy - b1 * sx1y - b2 * sx2y)
                 / (syy - sy * sy / n), 4) AS r2
    FROM beta
    """,
    doc="Multivariate OLS (l_extendedprice ~ l_quantity + l_discount + "
    "intercept) solved by normal equations in ONE aggregation pass: "
    "ten decomposable moments (map-side combined to 10 doubles per "
    "task), then the closed-form 3x3 Cramer solve and R^2 = 1 - SSE/SST "
    "computed from the SAME moments (SSE = Syy - beta . X'y) — zero "
    "extra corpus scans, nothing but ten doubles shuffled at any scale. "
    "The oracle states the identical closed form.",
)
def ml_ols_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x1, x2, y = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")
    m = li.agg(
        (F.count(F.lit(1)) * 1.0).alias("n"),
        F.sum(x1).alias("sx1"),
        F.sum(x2).alias("sx2"),
        F.sum(x1 * x1).alias("sx11"),
        F.sum(x1 * x2).alias("sx12"),
        F.sum(x2 * x2).alias("sx22"),
        F.sum(y).alias("sy"),
        F.sum(x1 * y).alias("sx1y"),
        F.sum(x2 * y).alias("sx2y"),
        F.sum(y * y).alias("syy"),
    )
    n, sx1, sx2 = F.col("n"), F.col("sx1"), F.col("sx2")
    sx11, sx12, sx22 = F.col("sx11"), F.col("sx12"), F.col("sx22")
    sy, sx1y, sx2y, syy = F.col("sy"), F.col("sx1y"), F.col("sx2y"), F.col("syy")
    det = (
        n * (sx11 * sx22 - sx12 * sx12)
        - sx1 * (sx1 * sx22 - sx12 * sx2)
        + sx2 * (sx1 * sx12 - sx11 * sx2)
    )
    solved = m.withColumn("det", det)
    det = F.col("det")
    b0 = (
        sy * (sx11 * sx22 - sx12 * sx12)
        - sx1 * (sx1y * sx22 - sx12 * sx2y)
        + sx2 * (sx1y * sx12 - sx11 * sx2y)
    ) / det
    b1 = (
        n * (sx1y * sx22 - sx12 * sx2y)
        - sy * (sx1 * sx22 - sx12 * sx2)
        + sx2 * (sx1 * sx2y - sx1y * sx2)
    ) / det
    b2 = (
        n * (sx11 * sx2y - sx1y * sx12)
        - sx1 * (sx1 * sx2y - sx1y * sx2)
        + sy * (sx1 * sx12 - sx11 * sx2)
    ) / det
    beta = solved.select(
        "*", b0.alias("b0"), b1.alias("b1"), b2.alias("b2")
    )
    b0c, b1c, b2c = F.col("b0"), F.col("b1"), F.col("b2")
    return beta.select(
        n.cast("long").alias("n_rows"),
        _r(b0c).alias("beta0"),
        _r(b1c).alias("beta1"),
        _r(b2c).alias("beta2"),
        _r(
            F.lit(1.0)
            - (syy - b0c * sy - b1c * sx1y - b2c * sx2y)
            / (syy - sy * sy / n)
        ).alias("r2"),
    )


@register(
    "profile_correlation_matrix",
    oracle="""
    SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
           ROUND(5e-10 + corr(l_quantity, l_extendedprice), 4) AS pearson_r
    FROM lineitem
    UNION ALL
    SELECT 'l_quantity', 'l_discount',
           ROUND(5e-10 + corr(l_quantity, l_discount), 4)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', 'l_extendedprice',
           ROUND(5e-10 + corr(l_discount, l_extendedprice), 4)
    FROM lineitem
    ORDER BY col_a, col_b
    """,
    doc="Pairwise Pearson correlation of the lineitem numeric measures "
    "— the standard pre-modeling profile. All three correlations ride "
    "ONE aggregation over one scan (each corr is a decomposable moment "
    "set); output is the upper triangle as rows. The oracle's UNION ALL "
    "legs re-scan per pair — correct but the naive plan; the Spark side "
    "is the one-pass formulation.",
)
def profile_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.corr("l_quantity", "l_extendedprice").alias("qe"),
        F.corr("l_quantity", "l_discount").alias("qd"),
        F.corr("l_discount", "l_extendedprice").alias("de"),
    )
    pairs = agg.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("l_quantity").alias("col_a"),
                    F.lit("l_extendedprice").alias("col_b"),
                    F.col("qe").alias("r"),
                ),
                F.struct(
                    F.lit("l_quantity").alias("col_a"),
                    F.lit("l_discount").alias("col_b"),
                    F.col("qd").alias("r"),
                ),
                F.struct(
                    F.lit("l_discount").alias("col_a"),
                    F.lit("l_extendedprice").alias("col_b"),
                    F.col("de").alias("r"),
                ),
            )
        ).alias("p")
    )
    return pairs.select(
        "p.col_a", "p.col_b", _r(F.col("p.r")).alias("pearson_r")
    ).orderBy("col_a", "col_b")


# --------------------------------------------------------------------------
# Distributed Lloyd k-means (iterative; bounded driver state).
# --------------------------------------------------------------------------
_KM_K, _KM_ITERS = 8, 4


@register(
    "ml_kmeans_clusters",
    oracle=None,
    doc=f"Full-corpus Lloyd k-means (k={_KM_K}, {_KM_ITERS} rounds, "
    "operators/kmeans.py): one shuffle per round carrying k rows per "
    "partition (count + per-dim sums + round SSE, map-side combined); "
    "only the k x dim centroid matrix reaches the driver. Rows-only "
    "(iterative averaging is not SQL-replayable bit-for-bit); certified "
    "by inv_kmeans_monotone. Output: final cluster sizes + mean "
    "within-cluster distance.",
)
def ml_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.operators.kmeans import lloyd_kmeans

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _cents, _hist = lloyd_kmeans(
        emb, k=_KM_K, iters=_KM_ITERS
    )
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            biased_round(F.avg("dist2")).alias("avg_dist2"),
        )
        .orderBy("cluster")
    )


@register(
    "inv_kmeans_monotone",
    oracle=f"""
        WITH seeds AS (
            SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
            FROM embeddings WHERE vec_id < {_KM_K}
        ), d AS (
            SELECT e.vec_id,
                   MIN(list_sum(list_transform(
                       generate_series(1, len(s.cv)),
                       j -> (e.embedding[j]::DOUBLE - s.cv[j])
                            * (e.embedding[j]::DOUBLE - s.cv[j])
                   ))) AS d2
            FROM embeddings e CROSS JOIN seeds s
            GROUP BY e.vec_id
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
               ROUND(5e-10 + SUM(d2), 4) AS inertia0,
               TRUE AS monotone_ok,
               TRUE AS improved_ok,
               TRUE AS sizes_ok
        FROM d
    """,
    doc="Certifies the distributed Lloyd loop: inertia0 — the SSE "
    "against the SEEDED centroids, before any averaging — is "
    "recomputed exactly by DuckDB (cross-engine value check of the "
    "whole distance pipeline), and the verdicts pin Lloyd's "
    "guarantees: per-round inertia non-increasing (1e-9 relative "
    "tolerance for float64), final <= seeded, and final cluster sizes "
    "summing to the corpus count.",
)
def inv_kmeans_monotone(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.operators.kmeans import lloyd_kmeans

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _cents, hist = lloyd_kmeans(emb, k=_KM_K, iters=_KM_ITERS)
    sizes = assigned.groupBy("cluster").count().collect()
    n_assigned = sum(r["count"] for r in sizes)
    n_vectors = emb.count()
    monotone = all(
        hist[i + 1] <= hist[i] * (1 + 1e-9) for i in range(len(hist) - 1)
    )
    improved = (not hist) or hist[-1] <= hist[0] * (1 + 1e-9)
    return spark.createDataFrame(
        [
            (
                n_vectors,
                float(hist[0]) if hist else 0.0,
                bool(monotone),
                bool(improved),
                n_assigned == n_vectors,
            )
        ],
        "n_vectors long, inertia0 double, monotone_ok boolean, "
        "improved_ok boolean, sizes_ok boolean",
    ).select(
        "n_vectors",
        biased_round(F.col("inertia0")).alias("inertia0"),
        "monotone_ok",
        "improved_ok",
        "sizes_ok",
    )


def _maxmin_seed_oracle(k: int) -> str:
    """Generate the DuckDB CTE chain that replays the deterministic
    maxmin (derandomized k-means++) seed traversal: seed 0 is the
    lowest-id vector; step i takes the running min squared distance to
    the chosen seeds and picks the argmax, binding on the
    4dp-biased-rounded distance with ties to the lowest id — the exact
    selection contract of operators/kmeans.py:seed_maxmin. The final
    running min summed over the corpus is the seeded SSE."""
    dist = (
        "list_sum(list_transform(generate_series(1, len(e.v)), "
        "j -> (e.v[j] - s{i}.v[j]) * (e.v[j] - s{i}.v[j])))"
    )
    parts = [
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v "
        "FROM embeddings)",
        "s0 AS (SELECT v FROM e ORDER BY vec_id LIMIT 1)",
        "d0 AS (SELECT e.vec_id, e.v, "
        + dist.format(i=0)
        + " AS d FROM e CROSS JOIN s0)",
    ]
    for i in range(1, k):
        parts.append(
            f"s{i} AS (SELECT v FROM d{i - 1} "
            f"ORDER BY ROUND(5e-10 + d, 4) DESC, vec_id LIMIT 1)"
        )
        parts.append(
            f"d{i} AS (SELECT e.vec_id, e.v, LEAST(e.d, "
            + dist.format(i=i)
            + f") AS d FROM d{i - 1} AS e CROSS JOIN s{i})"
        )
    return ",\n".join(parts) + f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
               ROUND(5e-10 + SUM(d), 4) AS inertia0_pp,
               TRUE AS monotone_ok,
               TRUE AS improved_ok,
               TRUE AS sizes_ok
        FROM d{k - 1}
    """


@register(
    "inv_kmeans_pp_monotone",
    oracle=_maxmin_seed_oracle(_KM_K),
    doc="Certifies the maxmin (derandomized k-means++) seeding lane: "
    "DuckDB REPLAYS the whole greedy seed traversal (a generated "
    f"{_KM_K}-step CTE chain — argmax of the running min distance, "
    "binding on the 4dp-biased-rounded value with ties to the lowest "
    "id, the same selection contract as seed_maxmin) and recomputes "
    "inertia0_pp, the SSE against those seeds — a cross-engine value "
    "check of seed SELECTION plus the distance pipeline. The verdicts "
    "pin Lloyd's guarantees for the run seeded this way: per-round "
    "inertia non-increasing (1e-9 relative), final <= seeded, sizes "
    "summing to the corpus. seed_first_k stays the certified default "
    "(inv_kmeans_monotone); this lane exists because first-k seeds "
    "can all land in one true cluster, while every maxmin seed is the "
    "farthest point from the set chosen so far.",
)
def inv_kmeans_pp_monotone(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.operators.kmeans import lloyd_kmeans

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _cents, hist = lloyd_kmeans(
        emb, k=_KM_K, iters=_KM_ITERS, seeding="maxmin"
    )
    sizes = assigned.groupBy("cluster").count().collect()
    n_assigned = sum(r["count"] for r in sizes)
    n_vectors = emb.count()
    monotone = all(
        hist[i + 1] <= hist[i] * (1 + 1e-9) for i in range(len(hist) - 1)
    )
    improved = (not hist) or hist[-1] <= hist[0] * (1 + 1e-9)
    return spark.createDataFrame(
        [
            (
                n_vectors,
                float(hist[0]) if hist else 0.0,
                bool(monotone),
                bool(improved),
                n_assigned == n_vectors,
            )
        ],
        "n_vectors long, inertia0_pp double, monotone_ok boolean, "
        "improved_ok boolean, sizes_ok boolean",
    ).select(
        "n_vectors",
        biased_round(F.col("inertia0_pp")).alias("inertia0_pp"),
        "monotone_ok",
        "improved_ok",
        "sizes_ok",
    )


# --------------------------------------------------------------------------
# Distributed logistic regression (full-batch GD), oracle-replayed.
# --------------------------------------------------------------------------
_LR_RATE, _LR_STEPS = 5.0, 8
_LR_D1, _LR_D2 = 35, 52  # 1-based embedding dims used as features


def _logreg_oracle(lr: float, steps: int) -> str:
    """Generate the DuckDB CTE chain replaying every gradient step:
    b{i} holds the 3 coefficients after step i (cross join against the
    corpus, aggregate the gradient sums, update). The label is the
    deterministic separable concept x1 + x2 > 0 — a single IEEE
    addition, bit-identical across engines."""
    z = "(b.c0 + b.c1 * e.x1 + b.c2 * e.x2)"
    p = f"(1.0 / (1.0 + exp(-{z})))"
    parts = [
        f"""WITH e AS (
          SELECT CASE WHEN embedding[{_LR_D1}]::DOUBLE
                           + embedding[{_LR_D2}]::DOUBLE > 0
                      THEN 1.0 ELSE 0.0 END AS y,
                 embedding[{_LR_D1}]::DOUBLE AS x1,
                 embedding[{_LR_D2}]::DOUBLE AS x2
          FROM embeddings
        )""",
        "b0 AS (SELECT 0.0::DOUBLE AS c0, 0.0::DOUBLE AS c1, "
        "0.0::DOUBLE AS c2)",
    ]
    for i in range(1, steps + 1):
        parts.append(
            f"b{i} AS (SELECT "
            f"b.c0 + {lr} * SUM(e.y - {p}) / COUNT(*) AS c0, "
            f"b.c1 + {lr} * SUM((e.y - {p}) * e.x1) / COUNT(*) AS c1, "
            f"b.c2 + {lr} * SUM((e.y - {p}) * e.x2) / COUNT(*) AS c2 "
            f"FROM e CROSS JOIN b{i - 1} b "
            f"GROUP BY b.c0, b.c1, b.c2)"
        )
    zf = z
    pf = p
    return ",\n".join(parts) + f""",
        fin AS (
          SELECT e.y, {zf} AS z, {pf} AS p
          FROM e CROSS JOIN b{steps} b
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               ROUND(5e-10 + (SELECT c0 FROM b{steps}), 4) AS beta0,
               ROUND(5e-10 + (SELECT c1 FROM b{steps}), 4) AS beta1,
               ROUND(5e-10 + (SELECT c2 FROM b{steps}), 4) AS beta2,
               ROUND(5e-10 + (-AVG(y * ln(p) + (1.0 - y) * ln(1.0 - p))), 4)
                   AS log_loss,
               CAST(SUM(CASE WHEN (z > 0) = (y = 1.0)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
               TRUE AS loss_monotone
        FROM fin
    """


@register(
    "ml_logreg_gd",
    oracle=_logreg_oracle(_LR_RATE, _LR_STEPS),
    doc="Distributed logistic regression by full-batch gradient "
    f"descent ({_LR_STEPS} steps, lr {_LR_RATE}, operators/logreg.py): "
    "per step ONE distributed job computes the gradient sums + current "
    "loss (map-side combined, d+2 doubles per partition), the driver "
    "updates 3 coefficients — the Lloyd split applied to a GLM, the "
    "shape a CCNet-style quality-gate classifier trains at corpus "
    "scale. The label is the deterministic separable concept "
    f"embedding[{_LR_D1}] + embedding[{_LR_D2}] > 0 (one IEEE add — "
    "bit-identical cross-engine), so the DuckDB oracle REPLAYS every "
    "step as a generated CTE chain and the final coefficients, "
    "log-loss, and exact accuracy count are cross-engine value checks; "
    "loss_monotone pins full-batch GD's descent at this step size.",
)
def ml_logreg_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.operators.logreg import (
        is_monotone,
        logistic_gd,
        predict_accuracy,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    data = emb.select(
        vec[_LR_D1 - 1].alias("x1"),
        vec[_LR_D2 - 1].alias("x2"),
    ).select(
        "x1",
        "x2",
        (
            (F.col("x1") + F.col("x2") > 0).cast("double")
        ).alias("y"),
    )
    data = data.persist()
    betas, losses = logistic_gd(
        data, ["x1", "x2"], "y", lr=_LR_RATE, steps=_LR_STEPS
    )
    n_correct = predict_accuracy(data, ["x1", "x2"], "y", betas) or 0
    n_rows = data.count()
    data.unpersist()
    return spark.createDataFrame(
        [
            (
                n_rows,
                betas[0],
                betas[1],
                betas[2],
                losses[-1] if losses else 0.0,
                n_correct,
                bool(is_monotone(losses)),
            )
        ],
        "n_rows long, beta0 double, beta1 double, beta2 double, "
        "log_loss double, n_correct long, loss_monotone boolean",
    ).select(
        "n_rows",
        biased_round(F.col("beta0")).alias("beta0"),
        biased_round(F.col("beta1")).alias("beta1"),
        biased_round(F.col("beta2")).alias("beta2"),
        biased_round(F.col("log_loss")).alias("log_loss"),
        "n_correct",
        "loss_monotone",
    )


# --------------------------------------------------------------------------
# Population Stability Index: distribution-drift monitoring.
# --------------------------------------------------------------------------
_PSI_BASE_YR = 1995
_PSI_TARGET_YR = 2000


@register(
    "ml_population_stability_index",
    oracle=f"""
        WITH base AS (
          SELECT o_totalprice AS v, o_orderkey AS k FROM orders
          WHERE year(o_orderdate) = {_PSI_BASE_YR}
        ), tgt AS (
          SELECT o_totalprice AS v FROM orders
          WHERE year(o_orderdate) = {_PSI_TARGET_YR}
        ), rb AS (
          SELECT v, ROW_NUMBER() OVER (ORDER BY v, k) AS rn,
                 COUNT(*) OVER () AS n
          FROM base
        ), edges AS (
          SELECT d,
                 (SELECT MAX(CASE WHEN rn = CAST(FLOOR(n * d / 10.0)
                                              AS BIGINT)
                             THEN v END)
                  FROM rb) AS e
          FROM (SELECT unnest(generate_series(1, 9)) AS d)
        ), bb AS (
          SELECT (SELECT COUNT(*) FROM edges WHERE v > e) AS bin
          FROM base
        ), bt AS (
          SELECT (SELECT COUNT(*) FROM edges WHERE v > e) AS bin
          FROM tgt
        ), grid AS (
          SELECT unnest(generate_series(0, 9)) AS bin
        ), cb AS (
          SELECT g.bin,
                 (SELECT COUNT(*) FROM bb WHERE bb.bin = g.bin)
                     AS n_base,
                 (SELECT COUNT(*) FROM bt WHERE bt.bin = g.bin)
                     AS n_target
          FROM grid g
        ), tot AS (
          SELECT SUM(n_base) AS nb, SUM(n_target) AS nt FROM cb
        ), terms AS (
          SELECT bin, n_base, n_target,
                 ((n_base + 1.0) / (t.nb + 10.0)
                  - (n_target + 1.0) / (t.nt + 10.0))
                 * LN(((n_base + 1.0) / (t.nb + 10.0))
                      / ((n_target + 1.0) / (t.nt + 10.0))) AS term
          FROM cb, tot t
        )
        SELECT CAST(bin AS INT) AS bin,
               CAST(n_base AS BIGINT) AS n_base,
               CAST(n_target AS BIGINT) AS n_target,
               ROUND(5e-10 + term, 4) AS psi_term,
               ROUND(5e-10 + (SELECT SUM(term) FROM terms), 4)
                   AS psi_total
        FROM terms
        ORDER BY bin
    """,
    doc="Population Stability Index — the standard drift monitor "
    "between a baseline and a current score/feature distribution "
    f"(order value, {_PSI_BASE_YR} vs {_PSI_TARGET_YR}): decile bins "
    "are FIT on the baseline with EXACT edges (the value at global "
    "rank floor(n*d/10), extracted by the two-phase rank and "
    "collected — 9 rows), both cohorts bin by pure comparison against "
    "those literals, and PSI = sum (p_i - q_i) ln(p_i / q_i) with "
    "add-one smoothing so empty bins stay finite. Per-bin terms plus "
    "the total; the oracle replays edges, binning, smoothing, and the "
    "sum. Scale: after the baseline's one ranked shuffle, both "
    "cohorts stream through a literal-comparison projection into a "
    "10-row aggregate.",
)
def ml_population_stability_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from economic_data_etl_spark.operators.rank import (
        with_global_row_number,
    )

    orders = load_table(spark, sf_dir, "orders")
    base = orders.filter(
        F.year("o_orderdate") == _PSI_BASE_YR
    ).select(F.col("o_totalprice").alias("v"), "o_orderkey")
    tgt = orders.filter(
        F.year("o_orderdate") == _PSI_TARGET_YR
    ).select(F.col("o_totalprice").alias("v"))
    ranked = with_global_row_number(base, ["v", "o_orderkey"], out="rn")
    n = base.count()  # one scalar action; scan-only lineage
    ranks = [int(n * d / 10) for d in range(1, 10)]
    edges = sorted(
        r.v
        for r in ranked.filter(F.col("rn").isin(ranks))
        .select("v")
        .collect()
    )  # 9 rows, bounded by construction
    earr = F.array(*[F.lit(float(e)) for e in edges])
    bin_of = F.size(F.filter(earr, lambda e: F.col("v") > e)).alias(
        "bin"
    )
    cb = (
        base.select(bin_of)
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_base"))
    )
    ct = (
        tgt.select(bin_of)
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_target"))
    )
    grid = spark.range(10).select(F.col("id").cast("int").alias("bin"))
    counts = (
        grid.join(cb, "bin", "left")
        .join(ct, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_base", F.lit(0)).cast("long").alias("n_base"),
            F.coalesce("n_target", F.lit(0))
            .cast("long")
            .alias("n_target"),
        )
    )
    return _psi_from_counts(counts)


def _psi_from_counts(counts: DataFrame) -> DataFrame:
    """(bin, n_base, n_target) -> the PSI report (per-bin smoothed
    terms + total). Shared by the one-shot and incremental monitors —
    one formula, so the two can never drift apart."""
    tot = counts.agg(
        F.sum("n_base").alias("nb"), F.sum("n_target").alias("nt")
    )
    p = (F.col("n_base") + 1.0) / (F.col("nb") + 10.0)
    q = (F.col("n_target") + 1.0) / (F.col("nt") + 10.0)
    terms = counts.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_base",
        "n_target",
        ((p - q) * F.log(p / q)).alias("term"),
    )
    total = terms.agg(F.sum("term").alias("psi_sum"))
    return (
        terms.crossJoin(F.broadcast(total))
        .select(
            "bin",
            "n_base",
            "n_target",
            biased_round(F.col("term")).alias("psi_term"),
            biased_round(F.col("psi_sum")).alias("psi_total"),
        )
        .orderBy("bin")
    )


@register(
    "ml_ks_two_sample",
    oracle=f"""
        WITH a AS (
          SELECT o_totalprice AS v FROM orders
          WHERE year(o_orderdate) = {_PSI_BASE_YR}
        ), b AS (
          SELECT o_totalprice AS v FROM orders
          WHERE year(o_orderdate) = {_PSI_TARGET_YR}
        ), u AS (
          SELECT v, SUM(ca) AS ca, SUM(cb) AS cb FROM (
            SELECT v, 1 AS ca, 0 AS cb FROM a
            UNION ALL
            SELECT v, 0, 1 FROM b
          ) GROUP BY v
        ), cum AS (
          SELECT v,
                 SUM(ca) OVER (ORDER BY v) AS cum_a,
                 SUM(cb) OVER (ORDER BY v) AS cum_b
          FROM u
        ), tot AS (
          SELECT (SELECT COUNT(*) FROM a) AS na,
                 (SELECT COUNT(*) FROM b) AS nb
        )
        SELECT CAST(t.na AS BIGINT) AS n_a,
               CAST(t.nb AS BIGINT) AS n_b,
               ROUND(5e-10 + MAX(ABS(c.cum_a * 1.0 / t.na
                                     - c.cum_b * 1.0 / t.nb)), 4)
                   AS ks_d,
               ROUND(5e-10 + 1.358 * SQRT((t.na + t.nb) * 1.0
                                          / (t.na * t.nb)), 4)
                   AS crit_05
        FROM cum c, tot t
        GROUP BY t.na, t.nb
    """,
    doc="Exact two-sample Kolmogorov-Smirnov statistic between the "
    f"same cohorts as the PSI monitor ({_PSI_BASE_YR} vs "
    f"{_PSI_TARGET_YR} order values): D = max |F_A(x) - F_B(x)| over "
    "the merged value set, computed EXACTLY and DISTRIBUTED — the "
    "global CDFs come from the two-phase prefix-sum "
    "(operators/rank.py:with_global_cumsum — boundary-literal "
    "buckets, per-bucket totals as literal offsets, bucket-"
    "partitioned window cumsum; the value table never funnels through "
    "one task). Reported next to the alpha=0.05 critical value "
    "1.358*sqrt((n+m)/nm) for the drift verdict the reader applies. "
    "The oracle replays the merged CDF with a plain window cumsum.",
)
def ml_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.operators.rank import (
        with_global_cumsum,
    )

    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.year("o_orderdate") == _PSI_BASE_YR).select(
        F.col("o_totalprice").alias("v"),
        F.lit(1).alias("ca"),
        F.lit(0).alias("cb"),
    )
    b = orders.filter(
        F.year("o_orderdate") == _PSI_TARGET_YR
    ).select(
        F.col("o_totalprice").alias("v"),
        F.lit(0).alias("ca"),
        F.lit(1).alias("cb"),
    )
    u = (
        a.unionByName(b)
        .groupBy("v")
        .agg(F.sum("ca").alias("ca"), F.sum("cb").alias("cb"))
    )
    cum = with_global_cumsum(u, ["v"], ["ca", "cb"])
    tot = u.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
    )
    d = F.max(
        F.abs(
            F.col("cum_ca") / F.col("na")
            - F.col("cum_cb") / F.col("nb")
        )
    )
    crit = F.lit(1.358) * F.sqrt(
        (F.col("na") + F.col("nb")) * F.lit(1.0)
        / (F.col("na") * F.col("nb"))
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("na", "nb")
        .agg(
            biased_round(d).alias("ks_d"),
            biased_round(F.max(crit)).alias("crit_05"),
        )
        .select(
            F.col("na").alias("n_a"),
            F.col("nb").alias("n_b"),
            "ks_d",
            "crit_05",
        )
    )


_PSI_BATCHES = 3


@register(
    "ml_incremental_psi",
    oracle=None,  # set right below to the one-shot PSI oracle
    doc="INCREMENTAL drift monitoring: the PSI target-side bin counts "
    "are ADDITIVE against FROZEN baseline edges, so a standing "
    "10-row count table folds per micro-batch exactly like the CUSUM "
    f"daily index — target orders arrive in {_PSI_BATCHES} simulated "
    "batches (one REDELIVERED, dropped by the batch-id-keyed dedup), "
    "per-batch partial bin counts merge additively, and the PSI "
    "report is computed from the folded table through the SAME "
    "formula as the one-shot monitor. The oracle is the one-shot PSI "
    "replay, so a green row proves fold-then-report equals "
    "one-shot-report — continuous production monitoring with "
    "10-rows-of-state per tracked feature.",
)
def ml_incremental_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.operators.rank import (
        with_global_row_number,
    )

    orders = load_table(spark, sf_dir, "orders")
    base = orders.filter(
        F.year("o_orderdate") == _PSI_BASE_YR
    ).select(F.col("o_totalprice").alias("v"), "o_orderkey")
    ranked = with_global_row_number(base, ["v", "o_orderkey"], out="rn")
    n = base.count()
    ranks = [int(n * d / 10) for d in range(1, 10)]
    edges = sorted(
        r.v
        for r in ranked.filter(F.col("rn").isin(ranks))
        .select("v")
        .collect()
    )
    earr = F.array(*[F.lit(float(e)) for e in edges])

    def binned(df):
        return df.select(
            F.size(
                F.filter(earr, lambda e: F.col("v") > e)
            ).alias("bin")
        )

    tgt = orders.filter(
        F.year("o_orderdate") == _PSI_TARGET_YR
    ).select(F.col("o_totalprice").alias("v"), "o_orderkey")
    partials = []
    for b in range(_PSI_BATCHES):
        batch = tgt.filter(F.col("o_orderkey") % _PSI_BATCHES == b)
        part = (
            binned(batch)
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n_target"))
            .withColumn("batch_id", F.lit(b))
        )
        partials.append(part)
        if b == 1:  # redelivered micro-batch: same id, same content
            partials.append(part)
    appended = partials[0]
    for p in partials[1:]:
        appended = appended.unionByName(p)
    folded = (
        appended.dropDuplicates(["batch_id", "bin"])
        .groupBy("bin")
        .agg(F.sum("n_target").alias("n_target"))
    )
    base_counts = (
        binned(base)
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_base"))
    )
    grid = spark.range(10).select(F.col("id").cast("int").alias("bin"))
    counts = (
        grid.join(base_counts, "bin", "left")
        .join(folded, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_base", F.lit(0)).cast("long").alias("n_base"),
            F.coalesce("n_target", F.lit(0))
            .cast("long")
            .alias("n_target"),
        )
    )
    return _psi_from_counts(counts)


# the incremental monitor's oracle IS the one-shot monitor's oracle:
# fold-then-report must equal one-shot-report at the value level.
import dataclasses  # noqa: E402

from economic_data_etl_spark.plans.catalog import REGISTRY as _REG  # noqa: E402

_REG["ml_incremental_psi"] = dataclasses.replace(
    _REG["ml_incremental_psi"],
    oracle=_REG["ml_population_stability_index"].oracle,
)


@register(
    "ml_mahalanobis_outliers",
    oracle="""
    WITH m AS (
        SELECT COUNT(*) * 1.0 AS n,
               SUM(l_quantity) AS sx, SUM(l_extendedprice) AS sy,
               SUM(l_quantity * l_quantity) AS sxx,
               SUM(l_quantity * l_extendedprice) AS sxy,
               SUM(l_extendedprice * l_extendedprice) AS syy
        FROM lineitem
    ), mu AS (
        SELECT n, sx / n AS mx, sy / n AS my, sxx, sxy, syy FROM m
    ), cov AS (
        SELECT mx, my,
               sxx / n - mx * mx AS cxx,
               sxy / n - mx * my AS cxy,
               syy / n - my * my AS cyy
        FROM mu
    ), cv AS (
        SELECT *, cxx * cyy - cxy * cxy AS det FROM cov
    ), scored AS (
        SELECT l.l_orderkey, l.l_linenumber,
               l.l_quantity, l.l_extendedprice,
               ROUND(5e-10 +
                     (c.cyy * (l.l_quantity - c.mx)
                            * (l.l_quantity - c.mx)
                      - 2.0 * c.cxy * (l.l_quantity - c.mx)
                            * (l.l_extendedprice - c.my)
                      + c.cxx * (l.l_extendedprice - c.my)
                            * (l.l_extendedprice - c.my)) / c.det,
                     4) AS d2
        FROM lineitem l CROSS JOIN cv c
    )
    SELECT rank, l_orderkey, l_linenumber,
           l_quantity, l_extendedprice, d2
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            ORDER BY d2 DESC, l_orderkey, l_linenumber) AS rank
        FROM scored
    ) WHERE rank <= 10 ORDER BY rank
    """,
    doc="Multivariate outlier detection by Mahalanobis distance over "
    "(l_quantity, l_extendedprice): the covariance moments are ONE "
    "decomposable aggregation (6 doubles move, the "
    "ml_ols_normal_equations shape), the 2x2 inverse is closed-form, "
    "and d^2 is a pure projection against the broadcast scalar row — "
    "the corpus is scanned twice (moments, scoring) and shuffles "
    "never. Top-10 binds on the biased-rounded d^2 with integer "
    "(orderkey, linenumber) tie-breaks (rounded-gate rule); the "
    "unpartitioned rank compiles to TakeOrderedAndProject below the "
    "window (the documented LimitPushDownThroughWindow shape), so the "
    "cut is a bounded top-k at any scale.",
)
def ml_mahalanobis_outliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    m = li.agg(
        (F.count(F.lit(1)) * 1.0).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n")
    mu = m.select(
        "n",
        (F.col("sx") / n).alias("mx"),
        (F.col("sy") / n).alias("my"),
        "sxx",
        "sxy",
        "syy",
    )
    mx, my = F.col("mx"), F.col("my")
    cov = mu.select(
        "mx",
        "my",
        (F.col("sxx") / n - mx * mx).alias("cxx"),
        (F.col("sxy") / n - mx * my).alias("cxy"),
        (F.col("syy") / n - my * my).alias("cyy"),
    )
    cv = cov.withColumn(
        "det",
        F.col("cxx") * F.col("cyy") - F.col("cxy") * F.col("cxy"),
    )
    dx, dy = x - mx, y - my
    d2 = (
        F.col("cyy") * dx * dx
        - F.lit(2.0) * F.col("cxy") * dx * dy
        + F.col("cxx") * dy * dy
    ) / F.col("det")
    scored = li.crossJoin(F.broadcast(cv)).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        biased_round(d2).alias("d2"),
    )
    rank = F.row_number().over(
        Window.orderBy(
            F.col("d2").desc(), "l_orderkey", "l_linenumber"
        )
    )
    return (
        scored.withColumn("rank", rank)
        .filter(F.col("rank") <= 10)
        .select(
            "rank",
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "d2",
        )
        .orderBy("rank")
    )
