"""Unigram-LM tokenizer queries: Viterbi segmentation under the
frequency-seeded model (full cross-engine replay) and the hard-EM
monotonicity certificate.

The oracle for `text_unigram_tokenize` replays the ENTIRE pipeline in
DuckDB — tokenization, candidate n-gram weights, the top-K prune with
its (weight desc, piece asc) tie-break, the C-libm log-probabilities,
and the Viterbi DP itself as a recursive CTE whose state carries the
last MAX_PIECE (dp, n_pieces) slots with the same longest-piece
tie-break — so a lattice bug, a prune-boundary slip, or a tie-break
divergence is a value-hash mismatch, not a silent pass. The DP adds
bit-identical doubles in the same left-to-right order on both engines
(see operators/unigram.py), so exact `=` comparisons against the
running max agree.

`inv_unigram_em_monotone` certifies the Viterbi-EM loop the way
inv_kmeans_monotone certifies Lloyd: the vocabulary pipeline is
value-checked cross-engine (size + total weight), and the verdicts pin
the CEM guarantee — total Viterbi log-likelihood non-decreasing per
round (M-step = exact MLE of the hard assignments; Viterbi optimal
under the new model), final >= first, and full coverage (no sentinel
leak: every word segments under every round's model).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.operators.unigram import (
    MAX_WORD,
    VOCAB_K,
    candidate_pieces,
    hard_em,
    select_vocab,
    viterbi_segment,
    vocab_logprobs,
    word_frequencies,
)
from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.sources.tables import load_table

_VOCAB_SQL = f"""
    sw AS (
        SELECT source, word, COUNT(*) AS swc FROM (
            SELECT source,
                   unnest(list_filter(string_split_regex(lower(text),
                       '[ \\t\\n\\r]+'), x -> x <> '')) AS word
            FROM documents
        )
        WHERE length(word) BETWEEN 1 AND {MAX_WORD}
        GROUP BY 1, 2
    ), words AS (
        SELECT word, SUM(swc) AS wc, length(word) AS wlen
        FROM sw GROUP BY 1, 3
    ), cand AS (
        SELECT substr(w.word, CAST(i AS INTEGER), nn.n) AS piece,
               SUM(w.wc) AS weight
        FROM words w
        CROSS JOIN (VALUES (1), (2), (3), (4)) AS nn(n),
             UNNEST(range(1, w.wlen - nn.n + 2)) AS t(i)
        WHERE w.wlen >= nn.n
        GROUP BY 1
    ), sel AS (
        SELECT piece, weight FROM cand WHERE length(piece) = 1
        UNION ALL
        SELECT piece, weight FROM (
            SELECT piece, weight FROM cand WHERE length(piece) >= 2
            ORDER BY weight DESC, piece LIMIT {VOCAB_K}
        )
    )
"""

_VIT_SQL = """
    , tot AS (
        SELECT SUM(weight) AS s FROM sel
    ), vocab AS (
        SELECT piece,
               LN(CAST(weight AS DOUBLE) / CAST(s AS DOUBLE)) AS lp
        FROM sel CROSS JOIN tot
    ), vit AS (
        SELECT word, wlen, 0 AS pos,
               CAST(0.0 AS DOUBLE) AS dp1, CAST(NULL AS DOUBLE) AS dp2,
               CAST(NULL AS DOUBLE) AS dp3, CAST(NULL AS DOUBLE) AS dp4,
               CAST(0 AS BIGINT) AS np1, CAST(NULL AS BIGINT) AS np2,
               CAST(NULL AS BIGINT) AS np3, CAST(NULL AS BIGINT) AS np4
        FROM words
        UNION ALL
        SELECT v.word, v.wlen, v.pos + 1,
               GREATEST(
                   COALESCE(v.dp1 + p1.lp, -1e18),
                   COALESCE(v.dp2 + p2.lp, -1e18),
                   COALESCE(v.dp3 + p3.lp, -1e18),
                   COALESCE(v.dp4 + p4.lp, -1e18)),
               v.dp1, v.dp2, v.dp3,
               CASE
                   WHEN COALESCE(v.dp4 + p4.lp, -1e18) = GREATEST(
                        COALESCE(v.dp1 + p1.lp, -1e18),
                        COALESCE(v.dp2 + p2.lp, -1e18),
                        COALESCE(v.dp3 + p3.lp, -1e18),
                        COALESCE(v.dp4 + p4.lp, -1e18))
                       THEN v.np4 + 1
                   WHEN COALESCE(v.dp3 + p3.lp, -1e18) = GREATEST(
                        COALESCE(v.dp1 + p1.lp, -1e18),
                        COALESCE(v.dp2 + p2.lp, -1e18),
                        COALESCE(v.dp3 + p3.lp, -1e18),
                        COALESCE(v.dp4 + p4.lp, -1e18))
                       THEN v.np3 + 1
                   WHEN COALESCE(v.dp2 + p2.lp, -1e18) = GREATEST(
                        COALESCE(v.dp1 + p1.lp, -1e18),
                        COALESCE(v.dp2 + p2.lp, -1e18),
                        COALESCE(v.dp3 + p3.lp, -1e18),
                        COALESCE(v.dp4 + p4.lp, -1e18))
                       THEN v.np2 + 1
                   ELSE v.np1 + 1 END,
               v.np1, v.np2, v.np3
        FROM vit v
        LEFT JOIN vocab p1 ON p1.piece = substr(v.word, v.pos + 1, 1)
        LEFT JOIN vocab p2
               ON v.pos + 1 >= 2 AND p2.piece = substr(v.word, v.pos, 2)
        LEFT JOIN vocab p3
               ON v.pos + 1 >= 3
              AND p3.piece = substr(v.word, v.pos - 1, 3)
        LEFT JOIN vocab p4
               ON v.pos + 1 >= 4
              AND p4.piece = substr(v.word, v.pos - 2, 4)
        WHERE v.pos < v.wlen
    ), segd AS (
        SELECT word, dp1 AS ll, np1 AS n_pieces
        FROM vit WHERE pos = wlen
    )
"""


@register(
    "text_unigram_tokenize",
    oracle="WITH RECURSIVE "
    + _VOCAB_SQL
    + _VIT_SQL
    + """
    SELECT sw.source,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_words,
           CAST(SUM(sw.swc) AS BIGINT) AS n_tokens,
           CAST(SUM(sw.swc * s.n_pieces) AS BIGINT) AS total_pieces,
           ROUND(5e-10 + CAST(SUM(sw.swc * s.n_pieces) AS DOUBLE)
                 / CAST(SUM(sw.swc) AS DOUBLE), 4) AS pieces_per_token,
           ROUND(5e-10 + SUM(sw.swc * s.ll), 4) AS sum_ll
    FROM sw JOIN segd s USING (word)
    GROUP BY 1
    ORDER BY 1
    """,
    doc="Unigram-LM tokenizer (Kudo, ACL 2018), frequency-seeded: "
    "candidate pieces = char 1..4-grams over the Zipf-bounded word "
    "table, multi-char candidates cut to the top-500 by (weight "
    "desc, piece asc) TakeOrderedAndProject with ALL single chars "
    "kept (coverage guarantee); Viterbi max-likelihood segmentation "
    "runs as ONE Catalyst aggregate-fold per word (state = last-4 "
    "(dp, n_pieces) slots, longest-piece tie-break) with the model "
    "as a single constant-folded map literal — zero Python, zero "
    "corpus shuffle in the scoring pass. Per-source fertility "
    "(pieces per token) + total lattice log-likelihood. Oracle "
    "replays EVERYTHING including the DP as a recursive CTE with "
    "bit-identical doubles.",
)
def text_unigram_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    toks = docs.select(
        "source",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[ \\t\\n\\r]+"),
                lambda t: t != "",
            )
        ).alias("word"),
    ).filter(F.length("word") <= MAX_WORD)
    sw = toks.groupBy("source", "word").agg(
        F.count(F.lit(1)).alias("swc")
    ).localCheckpoint(eager=False)
    wf = sw.groupBy("word").agg(F.sum("swc").alias("wc"))

    lp0 = vocab_logprobs(select_vocab(candidate_pieces(wf), k=VOCAB_K))
    seg = viterbi_segment(wf, lp0)
    return (
        sw.join(seg.select("word", "ll", "n_pieces"), "word")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_words"),
            F.sum("swc").alias("n_tokens"),
            F.sum(F.col("swc") * F.col("n_pieces")).alias(
                "total_pieces"
            ),
            biased_round(
                F.sum(F.col("swc") * F.col("n_pieces")).cast("double")
                / F.sum("swc").cast("double")
            ).alias("pieces_per_token"),
            biased_round(
                F.sum(F.col("swc").cast("double") * F.col("ll"))
            ).alias("sum_ll"),
        )
        .orderBy("source")
    )


_EM_ITERS = 3


@register(
    "inv_unigram_em_monotone",
    oracle="WITH "
    + _VOCAB_SQL
    + """
    SELECT CAST((SELECT COUNT(*) FROM words) AS BIGINT) AS n_words,
           CAST(COUNT(*) AS BIGINT) AS vocab_size,
           CAST(SUM(weight) AS BIGINT) AS total_weight,
           TRUE AS monotone_ok,
           TRUE AS improved_ok,
           TRUE AS coverage_ok
    FROM sel
    """,
    doc="Certifies the Viterbi-EM (hard EM) trainer: n_words / "
    "vocab_size / total_weight are recomputed exactly by DuckDB "
    "(cross-engine check of the candidate + selection pipeline), and "
    "the verdicts pin the CEM guarantee — total Viterbi "
    "log-likelihood non-decreasing across 3 rounds (M-step is the "
    "exact MLE of the hard assignments, Viterbi is optimal under the "
    "new model; 1e-9 relative tolerance for float64), final >= "
    "first, and no coverage loss (every word segments under every "
    "round's model — piece pruning keeps each word's own previous "
    "path feasible).",
)
def inv_unigram_em_monotone(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("text")
    wf = word_frequencies(docs).localCheckpoint()
    vocab = select_vocab(candidate_pieces(wf), k=VOCAB_K)
    sized = vocab.agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum("weight").alias("total_weight"),
    ).collect()[0]
    lp0 = vocab_logprobs(vocab)
    _model, hist = hard_em(wf, lp0, iterations=_EM_ITERS)
    n_words = wf.count()

    def _tol(x: float) -> float:
        return abs(x) * 1e-9

    monotone = all(
        hist[i + 1] >= hist[i] - _tol(hist[i])
        for i in range(len(hist) - 1)
    )
    improved = hist[-1] >= hist[0] - _tol(hist[0])
    coverage = all(h > -1e17 for h in hist)  # no sentinel leak
    return spark.createDataFrame(
        [
            (
                n_words,
                int(sized["vocab_size"]),
                # SUM over an empty vocab is NULL (empty corpus)
                int(sized["total_weight"] or 0),
                bool(monotone),
                bool(improved),
                bool(coverage),
            )
        ],
        "n_words long, vocab_size long, total_weight long, "
        "monotone_ok boolean, improved_ok boolean, coverage_ok boolean",
    )
