"""Product-quantization (PQ) approximate nearest neighbor.

The compressed-index leg of the ANN stack (stateless SRP-LSH in
operators/similarity.py, coarse-cluster IVF in operators/ivf.py): each
corpus vector is stored as m sub-space codebook ids — m bytes instead of
dim floats (32x smaller at dim=64, m=8, k<=256) — and queries score codes
through a per-query lookup table (ADC, asymmetric distance computation).

Scale split, explicit:

- **Training is a constant-size problem**: PQ codebooks are fit on a
  bounded sample (industry practice is ~100k vectors no matter the
  corpus size), so the Lloyd loop runs on the driver in numpy over a
  deterministic `orderBy(id).limit(sample_n)` sample. Nothing here
  grows with the corpus.
- **Encoding and scoring are corpus-size**: both run as pure JVM
  expressions. Encoding = per-subspace argmax of (x_s·c - |c|²/2) over
  literal codebooks; scoring = ONE 128-float LUT built per query row,
  then each (query, code) pair costs m array lookups + adds instead of
  a dim-wide dot product — the whole point of ADC.

No reference counterpart; extends the engine's ANN surface.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from economic_data_etl_spark.operators.topk import grouped_top_k


def train_pq(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 2048,
) -> list[list[list[float]]]:
    """codebooks[s][c] = centroid c of subspace s. Deterministic: the
    sample is a hash-stride gate (every `stride`-th id by xxhash64,
    driver-sorted by id, truncated to `sample_n`), init is the sample's
    first k subvectors, and numpy reductions are fixed-order.

    The gate replaces an `orderBy(id).limit(n)` sample — a GLOBAL SORT
    of the corpus just to pick training rows, which at 100 TB is the
    most expensive operator in the whole pipeline. The filter runs
    inside the same scan that encoding needs anyway, moves ~sample_n
    rows to the driver, and stays deterministic (hash of the id, not
    partition order). When the corpus is smaller than `sample_n`
    (stride 1) it degenerates to the full corpus — identical to the
    old sample."""
    n_total = corpus.count()  # one scalar to the driver
    stride = max(1, n_total // sample_n)
    rows = (
        corpus.filter(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(stride)) == 0
        )
        .select(id_col, vec_col)
        .collect()
    )
    rows.sort(key=lambda r: r[0])
    if not rows:
        # empty corpus: nothing to train — callers short-circuit.
        return []
    X = np.array([r[1] for r in rows[:sample_n]], dtype=np.float64)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d_sub = dim // m
    codebooks = []
    for s in range(m):
        Xs = X[:, s * d_sub : (s + 1) * d_sub]
        C = Xs[:k].copy()
        for _ in range(iters):
            d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                members = Xs[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        codebooks.append(C.tolist())
    return codebooks


def _books_lit(codebooks: list[list[list[float]]]) -> Column:
    """Literal 3-D codebook [m][k][d_sub]. CreateArray of foldable
    children constant-folds to ONE Literal, so the expression tree —
    and the whole-stage-codegen source — stays O(1) in m*k. The
    previous formulation inlined m*k aggregate/zip_with subtrees, which
    pushed Janino compilation to ~20 s cold and task binaries past
    2 MiB (the dominant cost of the PQ queries, not the math)."""
    return F.array(
        *[
            F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in book])
            for book in codebooks
        ]
    )


def _norms2_lit(codebooks: list[list[list[float]]]) -> Column:
    """Literal [m][k] table of |c|^2 (numpy float64, same values the
    previous per-centroid F.lit carried)."""
    return F.array(
        *[
            F.array(*[F.lit(float(np.dot(c, c))) for c in book])
            for book in codebooks
        ]
    )


def _let(value: Column, body) -> Column:
    """Bind `value` once per row (see functions/text.py:let)."""
    return F.element_at(F.transform(F.array(value), body), 1)


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Add `codes` (array<int>, one id per subspace) and `recon_norm`
    (L2 norm of the reconstruction, read off the codes — no second pass
    over the vector).

    Expressed as interpreted higher-order functions over the literal
    codebook (one small expression) rather than m*k inlined codegen
    subtrees — identical float semantics (same slice bounds, same
    left-to-right accumulation, same argmax tie rule), a fraction of
    the compile time."""
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    books = _books_lit(codebooks)
    norms2 = _norms2_lit(codebooks)
    vec = F.col(vec_col).cast("array<double>")

    def code_for(s: Column) -> Column:
        sub = F.slice(vec, s * d_sub + 1, d_sub)
        # argmin ||x_s - c||^2 == argmax (x_s·c - |c|^2/2)
        scores = F.transform(
            F.element_at(books, s + 1),
            lambda cv, ci: F.aggregate(
                F.zip_with(sub, cv, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            - F.element_at(F.element_at(norms2, s + 1), ci + 1) * 0.5,
        )
        return _let(
            scores,
            lambda sc: (
                F.array_position(sc, F.array_max(sc)) - 1
            ).cast("int"),
        )

    codes = F.transform(F.sequence(F.lit(0), F.lit(m - 1)), code_for)
    out = df.withColumn("codes", codes)
    norm2 = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda c, s: F.element_at(F.element_at(norms2, s + 1), c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return out.withColumn("recon_norm", F.sqrt(norm2))


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    corpus_id: str = "vec_id",
    query_id: str = "q_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via ADC over PQ codes.

    score(q, x) ~= dot(q, reconstruct(codes)) / (|q| * recon_norm);
    dot(q, x̂) = sum_s LUT_q[s*k + codes[s]] where LUT_q holds the m×k
    sub-dots of THIS query against every codebook centroid — built once
    per query row, so the per-pair cost is m lookups, not a dim-wide
    dot. Queries are broadcast (they're the small side); the encoded
    corpus streams through unshuffled."""
    m = len(codebooks)
    kc = len(codebooks[0])
    d_sub = len(codebooks[0][0])
    encoded = pq_encode(corpus, codebooks, vec_col).select(
        corpus_id, "codes", "recon_norm"
    )
    books = _books_lit(codebooks)
    vec = F.col(vec_col).cast("array<double>")
    lut = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda s: _let(
                F.slice(vec, s * d_sub + 1, d_sub),
                lambda sub: F.transform(
                    F.element_at(books, s + 1),
                    lambda cv: F.aggregate(
                        F.zip_with(sub, cv, lambda a, b: a * b),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ),
                ),
            ),
        )
    )
    q_norm = F.sqrt(
        F.aggregate(
            F.col(vec_col).cast("array<double>"),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
    )
    q = queries.select(
        query_id, lut.alias("__lut"), q_norm.alias("__qnorm")
    )
    # per-pair ADC: sum over subspaces of LUT[s*kc + code_s]
    approx_dot = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda c, s: F.element_at("__lut", s * kc + c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    denom = F.col("__qnorm") * F.col("recon_norm")
    scored = (
        encoded.join(F.broadcast(q), F.col(corpus_id) != F.col(query_id))
        .select(
            query_id,
            corpus_id,
            (
                F.round(
                    F.when(denom != 0.0, approx_dot / denom) + F.lit(5e-10), 4
                )
                + F.lit(0.0)  # collapse -0.0 (see catalog.biased_round)
            ).alias("score"),
        )
    )
    return grouped_top_k(
        scored, [query_id], [F.desc("score"), F.asc(corpus_id)], k,
        rank_col="rank",
    ).select(query_id, corpus_id, "score", "rank")


def pq_topk_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    shortlist: int = 100,
    corpus_id: str = "vec_id",
    query_id: str = "q_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC shortlist + exact re-rank — the standard production PQ shape.

    Stage 1 scans the compressed codes (m bytes/vector) and keeps a
    `shortlist` per query; stage 2 fetches full vectors for ONLY those
    shortlist rows and re-scores exactly. At 100 TB the full-precision
    table is touched for shortlist×queries rows instead of the whole
    corpus — the compressed scan does the winnowing. Deterministic ties
    (score desc, id asc) at both stages."""
    from economic_data_etl_spark.functions.vectors import cosine_similarity

    short = pq_topk(
        corpus, queries, codebooks, k=shortlist,
        corpus_id=corpus_id, query_id=query_id, vec_col=vec_col,
    ).select(query_id, corpus_id)
    qv = queries.select(
        query_id, F.col(vec_col).alias("__qvec")
    )
    rescored = (
        short.join(corpus.select(corpus_id, vec_col), corpus_id)
        .join(F.broadcast(qv), query_id)
        .select(
            query_id,
            corpus_id,
            (
                F.round(
                    cosine_similarity(F.col(vec_col), F.col("__qvec"))
                    + F.lit(5e-10),
                    4,
                )
                + F.lit(0.0)
            ).alias("score"),
        )
    )
    return grouped_top_k(
        rescored, [query_id], [F.desc("score"), F.asc(corpus_id)], k,
        rank_col="rank",
    ).select(query_id, corpus_id, "score", "rank")
