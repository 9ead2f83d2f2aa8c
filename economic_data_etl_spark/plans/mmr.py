"""MMR diversified retrieval (Carbonell & Goldstein, SIGIR 1998).

Maximal Marginal Relevance re-ranks a lexical top-K so the result set
trades relevance against redundancy — the diversification step RAG
pipelines run between retrieval and context packing:

    pick argmax_i  lambda * rel_i - (1 - lambda) * max_{j in S} sim_ij

greedily until k are chosen (the seed pick is pure relevance).

Scale shape: the expensive parts are DISTRIBUTED and bounded — the
postings-filtered BM25 lane produces the top-K candidates (a
TakeOrderedAndProject cut, K = config), and the candidate-pair cosine
matrix is a K x K broadcast self-join against the embeddings table.
The greedy selection itself is inherently sequential over K*k scalar
comparisons, so it runs driver-side over the K- and K^2-bounded
collected tables (the same bounded-collect class as the model
literals; nothing corpus-sized ever reaches the driver).

Cross-engine determinism: relevance and pairwise similarity are
BIASED-ROUNDED before the greedy (both engines see identical 4dp
doubles), the marginal score is the same IEEE expression
0.7 * rel - 0.3 * maxsim on both sides (literals, not 1-lambda), ties
break doc_id-asc, and the emitted mmr doubles are NOT re-rounded —
identical inputs through identical ops reproduce bit-for-bit, which
the strict value hash checks. The oracle replays the greedy as a
recursive CTE carrying the chosen list in the recursion state (the
recursive relation is referenced once; the lateral argmax correlates
only on its columns).

Reference parity: none; completes the retrieval lane next to
retrieval_hybrid_rrf (fusion) and retrieval_hard_negatives
(contrastive mining).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.functions.text import WORD_SPLIT_RE
from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.sources.tables import load_table

_MMR_TERMS = ("stream", "table", "hash")
_MMR_POOL = 20  # lexical candidate pool (top-K BM25)
_MMR_K = 10  # diversified picks
_MMR_LAM = 0.7  # relevance weight; diversity weight 0.3 as literal

_MMR_ORACLE = f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '{WORD_SPLIT_RE}'),
                         x -> x <> '') AS w
      FROM documents
    ), ex AS (
      SELECT doc_id, unnest(w) AS token FROM toks
    ), dl AS (
      SELECT doc_id, len(w) AS dl FROM toks
    ), stats AS (
      SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM ex
      WHERE token IN {_MMR_TERMS!r}
      GROUP BY 1, 2
    ), df AS (
      SELECT token, COUNT(DISTINCT doc_id) AS df FROM ex
      WHERE token IN {_MMR_TERMS!r}
      GROUP BY token
    ), bm AS (
      SELECT t.doc_id,
             ROUND(5e-10 + SUM(
                 ln(1.0 + ((SELECT n_docs FROM stats) - d.df + 0.5)
                          / (d.df + 0.5))
                 * t.tf * {1.2 + 1.0}
                 / (t.tf + 1.2 * (1 - 0.75
                      + 0.75 * l.dl / (SELECT avgdl FROM stats)))
             ), 4) AS rel
      FROM tf t JOIN df d USING (token) JOIN dl l USING (doc_id)
      GROUP BY t.doc_id
    ), cand AS (
      SELECT bm.doc_id, bm.rel FROM bm
      JOIN embeddings emq ON emq.vec_id = bm.doc_id
      ORDER BY bm.rel DESC, bm.doc_id LIMIT {_MMR_POOL}
    ), sims AS (
      SELECT a.doc_id AS i, b.doc_id AS j,
             ROUND(5e-10 + list_cosine_similarity(
                 ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]),
                 4) AS sim
      FROM cand a
      JOIN embeddings ea ON ea.vec_id = a.doc_id
      JOIN cand b ON b.doc_id <> a.doc_id
      JOIN embeddings eb ON eb.vec_id = b.doc_id
    ), seed AS (
      SELECT doc_id, rel FROM cand ORDER BY rel DESC, doc_id LIMIT 1
    ), sel AS (
      SELECT 1 AS rank, [s.doc_id] AS chosen,
             s.doc_id, s.rel, s.rel AS mmr
      FROM seed s
      UNION ALL
      SELECT s.rank + 1, list_append(s.chosen, nxt.doc_id),
             nxt.doc_id, nxt.rel, nxt.mmr
      FROM sel s JOIN LATERAL (
        SELECT c.doc_id, c.rel,
               {_MMR_LAM} * c.rel - 0.3 * MAX(m.sim) AS mmr
        FROM cand c
        JOIN sims m ON m.i = c.doc_id
                   AND list_contains(s.chosen, m.j)
        WHERE NOT list_contains(s.chosen, c.doc_id)
        GROUP BY c.doc_id, c.rel
        ORDER BY mmr DESC, c.doc_id
        LIMIT 1
      ) nxt ON TRUE
      WHERE s.rank < {_MMR_K}
    )
    SELECT rank, doc_id, rel, mmr FROM sel ORDER BY rank
"""


def mmr_greedy(cand_rows, sim_rows, k: int, lam: float):
    """Driver-side greedy over the K-bounded candidate table and the
    K^2-bounded rounded similarity table — the exact IEEE twin of the
    oracle's recursive CTE (0.7 * rel - 0.3 * maxsim, doc_id-asc
    ties, seed = pure relevance)."""
    rel = {r["doc_id"]: r["rel"] for r in cand_rows}
    sim = {(r["i"], r["j"]): r["sim"] for r in sim_rows}
    chosen: list = []
    out = []
    while rel and len(out) < k:
        remaining = [d for d in rel if d not in chosen]
        if not remaining:
            break
        if not chosen:
            scored = [(rel[d], d) for d in remaining]
            scored.sort(key=lambda t: (-t[0], t[1]))
            mmr = scored[0][0]
            pick = scored[0][1]
        else:
            best = None
            for d in sorted(remaining):
                ms = max(sim[(d, j)] for j in chosen)
                s = lam * rel[d] - 0.3 * ms
                if best is None or s > best[0]:
                    best = (s, d)
            mmr, pick = best
        chosen.append(pick)
        out.append((len(out) + 1, pick, rel[pick], mmr))
    return out


@register(
    "retrieval_mmr_diversified",
    oracle=_MMR_ORACLE,
    doc=f"MMR diversified retrieval (lambda={_MMR_LAM}): the "
    f"postings-filtered BM25 lane cuts a top-{_MMR_POOL} candidate "
    "pool (TakeOrderedAndProject), the candidate-pair cosine matrix "
    "is a K x K broadcast join against embeddings, and the greedy "
    f"marginal-relevance selection of {_MMR_K} runs driver-side over "
    "those K/K^2-bounded collected tables (inherently sequential; "
    "nothing corpus-sized moves). Relevance and similarity are "
    "biased-rounded BEFORE the greedy so both engines select over "
    "identical doubles; the emitted mmr scores are un-rerounded IEEE "
    "twins of the oracle's recursive-CTE replay, and ties break "
    "doc_id-asc.",
)
def retrieval_mmr_diversified(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from economic_data_etl_spark.functions.vectors import (
        dot_product,
        l2_normalize,
    )
    from economic_data_etl_spark.operators.retrieval import bm25_scores

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    # candidates are cut AMONG EMBEDDABLE docs (left-semi against the
    # embeddings table): a doc without a vector cannot participate in
    # the diversity term, and silently dropping it from the sim matrix
    # while keeping it in the pool crashes the greedy (found at sf0.1,
    # where only a subset of docs carries embeddings)
    cand = (
        bm25_scores(docs, list(_MMR_TERMS))
        .join(
            emb.select(F.col("vec_id").alias("doc_id")),
            "doc_id",
            "left_semi",
        )
        .select("doc_id", biased_round(F.col("score")).alias("rel"))
        .orderBy(F.desc("rel"), F.asc("doc_id"))
        .limit(_MMR_POOL)
        .localCheckpoint(eager=False)
    )
    ce = cand.join(
        emb.select(
            F.col("vec_id").alias("doc_id"),
            l2_normalize(F.col("embedding")).alias("v"),
        ),
        "doc_id",
    ).localCheckpoint(eager=False)
    a, b = ce.alias("a"), ce.alias("b")
    sims = (
        a.crossJoin(b)
        .filter(F.col("a.doc_id") != F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("i"),
            F.col("b.doc_id").alias("j"),
            biased_round(
                dot_product(F.col("a.v"), F.col("b.v"))
            ).alias("sim"),
        )
    )
    picked = mmr_greedy(
        cand.collect(), sims.collect(), _MMR_K, _MMR_LAM
    )
    rank_items: list = []
    mmr_items: list = []
    for rank, doc_id, _, mmr in picked:
        rank_items += [F.lit(doc_id), F.lit(int(rank))]
        mmr_items += [F.lit(doc_id), F.lit(float(mmr))]
    rank_map = F.create_map(*rank_items)
    mmr_map = F.create_map(*mmr_items)
    return (
        cand.filter(
            F.col("doc_id").isin([p[1] for p in picked])
        )
        .select(
            F.element_at(rank_map, F.col("doc_id")).alias("rank"),
            "doc_id",
            "rel",
            F.element_at(mmr_map, F.col("doc_id")).alias("mmr"),
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# Dirichlet-smoothed query likelihood

_QLD_TERMS = ("stream", "table", "hash")
_QLD_MU = 300.0
_QLD_TOPK = 10

_QLD_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '{WORD_SPLIT_RE}'),
                         x -> x <> '') AS w
      FROM documents
    ), ex AS (
      SELECT doc_id, unnest(w) AS token FROM toks
    ), dl AS (
      SELECT doc_id, len(w) AS dl FROM toks
    ), ctot AS (SELECT COUNT(*) AS c FROM ex
    ), cf AS (
      SELECT
        SUM(CASE WHEN token = 'stream' THEN 1 ELSE 0 END) AS cf_s,
        SUM(CASE WHEN token = 'table' THEN 1 ELSE 0 END) AS cf_t,
        SUM(CASE WHEN token = 'hash' THEN 1 ELSE 0 END) AS cf_h
      FROM ex
    ), tf AS (
      SELECT doc_id,
        SUM(CASE WHEN token = 'stream' THEN 1 ELSE 0 END) AS tf_s,
        SUM(CASE WHEN token = 'table' THEN 1 ELSE 0 END) AS tf_t,
        SUM(CASE WHEN token = 'hash' THEN 1 ELSE 0 END) AS tf_h
      FROM ex WHERE token IN {_QLD_TERMS!r}
      GROUP BY doc_id
    ), scored AS (
      SELECT t.doc_id,
             ROUND(5e-10 +
               LN((t.tf_s + {_QLD_MU} * (f.cf_s * 1.0 / c.c))
                  / (l.dl + {_QLD_MU}))
             + LN((t.tf_t + {_QLD_MU} * (f.cf_t * 1.0 / c.c))
                  / (l.dl + {_QLD_MU}))
             + LN((t.tf_h + {_QLD_MU} * (f.cf_h * 1.0 / c.c))
                  / (l.dl + {_QLD_MU})), 4) AS score
      FROM tf t
      JOIN dl l USING (doc_id)
      CROSS JOIN cf f CROSS JOIN ctot c
    )
    SELECT rank, doc_id, score FROM (
      SELECT *, ROW_NUMBER() OVER (
          ORDER BY score DESC, doc_id) AS rank
      FROM scored
    ) WHERE rank <= {_QLD_TOPK} ORDER BY rank
"""


@register(
    "retrieval_query_likelihood",
    oracle=_QLD_ORACLE,
    doc=f"Dirichlet-smoothed query-likelihood retrieval (mu="
    f"{_QLD_MU}, Zhai & Lafferty 2001) — the language-model IR "
    "baseline next to BM25: score = sum over query terms of "
    "ln((tf + mu * p_corpus(t)) / (dl + mu)), candidates = docs "
    "matching >= 1 term (postings-filtered — absent terms contribute "
    "the background mass, so only matching docs can beat the all-"
    "background floor among equals... candidates are the standard "
    "serving set). The three ln terms add in FIXED term-literal order "
    "on both engines; corpus stats enter as one broadcast scalar row; "
    f"top-{_QLD_TOPK} binds on the biased-rounded score with doc_id "
    "tie-break (TakeOrderedAndProject).",
)
def retrieval_query_likelihood(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            F.filter(
                F.split(F.col("text"), WORD_SPLIT_RE),
                lambda t: t != "",
            ).alias("w"),
        )
        .localCheckpoint(eager=False)
    )
    ex = toks.select(
        "doc_id", F.explode("w").alias("token")
    ).localCheckpoint(eager=False)
    dl = toks.select("doc_id", F.size("w").alias("dl"))
    ctot = ex.agg(F.count(F.lit(1)).alias("c"))
    term_flag = {
        "s": "stream",
        "t": "table",
        "h": "hash",
    }
    cf = ex.agg(
        *[
            F.sum(
                F.when(F.col("token") == t, 1).otherwise(0)
            ).alias(f"cf_{k}")
            for k, t in term_flag.items()
        ]
    )
    tf = (
        ex.filter(F.col("token").isin(list(_QLD_TERMS)))
        .groupBy("doc_id")
        .agg(
            *[
                F.sum(
                    F.when(F.col("token") == t, 1).otherwise(0)
                ).alias(f"tf_{k}")
                for k, t in term_flag.items()
            ]
        )
    )
    mu = F.lit(_QLD_MU)

    def term_ll(k):
        return F.log(
            (
                F.col(f"tf_{k}")
                + mu * (F.col(f"cf_{k}") * F.lit(1.0) / F.col("c"))
            )
            / (F.col("dl") + mu)
        )

    scored = (
        tf.join(dl, "doc_id")
        .crossJoin(F.broadcast(cf))
        .crossJoin(F.broadcast(ctot))
        .select(
            "doc_id",
            biased_round(
                term_ll("s") + term_ll("t") + term_ll("h")
            ).alias("score"),
        )
    )
    from pyspark.sql.window import Window as _W

    rank = F.row_number().over(
        _W.orderBy(F.desc("score"), F.asc("doc_id"))
    )
    return (
        scored.withColumn("rank", rank)
        .filter(F.col("rank") <= _QLD_TOPK)
        .select("rank", "doc_id", "score")
        .orderBy("rank")
    )
