"""Corpus-curation analytics, round 10: tokenizer fertility profiling,
corpus-drift KL divergence, and contrastive hard-negative mining.

These are the measurement lanes a training-data pipeline runs before
committing to a data mix: fertility decides tokenizer/language cost,
KL(source || corpus) quantifies how far each source's token distribution
sits from the blend, and hard negatives (lexically similar, semantically
far) are the standard contrastive-training pair source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from economic_data_etl_spark.functions.text import WORD_SPLIT_RE
from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.sources.tables import load_table


def _r(col):
    return biased_round(col)


@register(
    "text_tokenizer_fertility",
    oracle=f"""
        WITH toks AS (
            SELECT lang, strlen(text) AS nb,
                   list_filter(string_split_regex(text,
                       '{WORD_SPLIT_RE}'), x -> x <> '') AS w
            FROM documents
        ), per AS (
            SELECT lang, nb, len(w) AS n_tok,
                   COALESCE(list_aggregate(
                       list_transform(w, x -> length(x)), 'sum'),
                       0) AS tok_chars
            FROM toks
        )
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
               CAST(SUM(nb) AS BIGINT) AS n_bytes,
               ROUND(5e-10 + 100.0 * SUM(n_tok) / SUM(nb), 4)
                   AS tokens_per_100_bytes,
               ROUND(5e-10 + SUM(tok_chars) * 1.0 / SUM(n_tok), 4)
                   AS avg_token_chars
        FROM per GROUP BY lang ORDER BY lang
    """,
    doc="Tokenizer fertility by language: tokens per 100 bytes and mean "
    "token length — the numbers that decide per-language training cost "
    "(a language whose fertility doubles pays double the sequence "
    "budget). Per-doc token/char counts are in-row array arithmetic "
    "(aggregate over the materialized token array, no explode); only "
    "language-sized totals shuffle. All counts are exact integers, so "
    "cross-engine parity is exact; only the two ratios round.",
)
def text_tokenizer_fertility(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.octet_length("text").alias("nb"),
        F.filter(
            F.split(F.col("text"), WORD_SPLIT_RE), lambda t: t != ""
        ).alias("w"),
    )
    per = toks.select(
        "lang",
        "nb",
        F.size("w").alias("n_tok"),
        F.aggregate(
            "w", F.lit(0), lambda acc, x: acc + F.length(x)
        ).alias("tok_chars"),
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum("nb").alias("n_bytes"),
            _r(
                F.lit(100.0) * F.sum("n_tok") / F.sum("nb")
            ).alias("tokens_per_100_bytes"),
            _r(
                F.sum("tok_chars") * F.lit(1.0) / F.sum("n_tok")
            ).alias("avg_token_chars"),
        )
        .orderBy("lang")
    )


@register(
    "text_corpus_divergence_kl",
    oracle=f"""
        WITH toks AS (
            -- source IS NOT NULL matches the Spark plan's symmetric
            -- filter: the decomposition's inner joins on "source"
            -- would drop a NULL-source group that this grid
            -- formulation (CROSS JOIN + LEFT JOIN) keeps, so both
            -- engines exclude it explicitly.
            SELECT source,
                   list_filter(string_split_regex(text,
                       '{WORD_SPLIT_RE}'), x -> x <> '') AS w
            FROM documents WHERE source IS NOT NULL
        ), ex AS (
            SELECT source, unnest(w) AS token FROM toks
        ), ct AS (
            SELECT token, COUNT(*) AS c FROM ex GROUP BY 1
        ), g AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS v,
                   CAST(SUM(c) AS BIGINT) AS n
            FROM ct
        ), cs AS (
            SELECT source, token, COUNT(*) AS c FROM ex GROUP BY 1, 2
        ), ns AS (
            SELECT source, CAST(SUM(c) AS BIGINT) AS n_s,
                   CAST(COUNT(*) AS BIGINT) AS v_s
            FROM cs GROUP BY 1
        ), grid AS (
            -- UNBLOCKED oracle formulation: the full source x vocab
            -- grid, summed naively. The Spark side never builds this
            -- grid (absent-token mass is folded in closed form).
            SELECT s.source, s.n_s, s.v_s,
                   t.c AS c_t, COALESCE(cs.c, 0) AS c_st
            FROM ns s
            CROSS JOIN ct t
            LEFT JOIN cs ON cs.source = s.source AND cs.token = t.token
        )
        SELECT source,
               ANY_VALUE(n_s) AS n_tokens,
               ANY_VALUE(v_s) AS vocab_present,
               ROUND(5e-10 + SUM(
                   ((c_st + 1.0) / (n_s + (SELECT v FROM g)))
                   * LN(((c_st + 1.0) / (n_s + (SELECT v FROM g)))
                        / ((c_t + 1.0)
                           / ((SELECT n FROM g) + (SELECT v FROM g))))
               ), 4) AS kl_nats
        FROM grid GROUP BY source ORDER BY source
    """,
    doc="Corpus-drift measurement: KL(source || corpus) over add-1-"
    "smoothed unigram distributions — the statistic data-mixing uses to "
    "spot a source whose language diverges from the blend. The oracle "
    "sums the naive source x vocab grid; the Spark plan NEVER builds "
    "that grid: present (source, token) pairs join token-keyed against "
    "the global counts (shuffle O(distinct postings)), and the absent-"
    "token mass collapses in closed form — every absent token "
    "contributes p0*(ln p0 - ln q_t) with constant p0 = 1/(n_s+V), so "
    "its sum is p0*((V-V_s)*ln p0 - (SumLnQ - sum of present ln q_t)) "
    "with SumLnQ a global scalar. Two independent formulations, one "
    "value — at 100 TB the grid is vocab x sources and unbuildable; "
    "the decomposition is postings-sized.",
)
def text_corpus_divergence_kl(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return kl_by_source(docs, round_fn=biased_round)


def kl_by_source(docs: DataFrame, round_fn=None) -> DataFrame:
    """(source, n_tokens, vocab_present, kl_nats): add-1-smoothed
    KL(source || corpus) via the postings-sized decomposition described
    on text_corpus_divergence_kl. Shared by the query and the
    training_dataset_card composition."""
    rnd = round_fn if round_fn is not None else (lambda c: c)
    # NULL-source docs are excluded UP FRONT, symmetrically with the
    # oracle: the decomposition's inner joins on "source" would drop
    # the NULL group's output row anyway, but its tokens would still
    # leak into the global corpus distribution — a silent asymmetry vs
    # any grid formulation that keys on source.
    ex = docs.filter(F.col("source").isNotNull()).select(
        "source",
        F.explode(
            F.filter(
                F.split(F.col("text"), WORD_SPLIT_RE), lambda t: t != ""
            )
        ).alias("token"),
    )
    # ONE pass over the exploded tokens: cs is the only stream-scale
    # aggregation; the global counts (ct), scalars, and per-source
    # totals all derive from the postings-sized cs, so the corpus is
    # tokenized exactly once. cs feeds four consumers — localCheckpoint
    # materializes it rather than re-exploding the corpus per branch.
    cs = (
        ex.groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("c_st"))
        .localCheckpoint()
    )
    ct = cs.groupBy("token").agg(F.sum("c_st").alias("c"))
    g1 = ct.agg(
        F.count(F.lit(1)).cast("bigint").alias("v"),
        F.sum("c").cast("bigint").alias("n"),
    )
    # ln q_t needs (N, V); broadcast the 1-row scalars over the
    # vocab-sized table, then reduce Sum(ln q) to a second scalar.
    lnq = ct.join(F.broadcast(g1)).select(
        "token",
        "c",
        F.log(
            (F.col("c") + F.lit(1.0)) / (F.col("n") + F.col("v"))
        ).alias("lnq"),
    )
    g2 = lnq.agg(F.sum("lnq").alias("sum_lnq"))
    ns = cs.groupBy("source").agg(
        F.sum("c_st").cast("bigint").alias("n_s"),
        F.count(F.lit(1)).cast("bigint").alias("v_s"),
    )
    present = (
        cs.join(lnq, "token")  # token-keyed: O(distinct postings)
        .join(F.broadcast(ns), "source")
        .join(F.broadcast(g1))
    )
    p = (F.col("c_st") + F.lit(1.0)) / (F.col("n_s") + F.col("v"))
    agg = present.groupBy("source").agg(
        F.first("n_s").alias("n_tokens"),
        F.first("v_s").alias("vocab_present"),
        F.sum(p * (F.log(p) - F.col("lnq"))).alias("present_terms"),
        F.sum("lnq").alias("present_lnq"),
    )
    p0 = F.lit(1.0) / (F.col("n_tokens") + F.col("v"))
    absent_terms = p0 * (
        (F.col("v") - F.col("vocab_present")) * F.log(p0)
        - (F.col("sum_lnq") - F.col("present_lnq"))
    )
    return (
        agg.join(F.broadcast(g1))
        .join(F.broadcast(g2))
        .select(
            "source",
            "n_tokens",
            "vocab_present",
            rnd(F.col("present_terms") + absent_terms).alias("kl_nats"),
        )
        .orderBy("source")
    )


# Query spec for hard-negative mining: the lexical probe terms (shared
# with the hybrid-RRF lane) and the semantic query vector's id.
_HN_TERMS = ("stream", "table", "hash")
_HN_QVEC = 0
_HN_K = 20


@register(
    "retrieval_hard_negatives",
    oracle=f"""
        WITH toks AS (
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
          WHERE token IN ('stream', 'table', 'hash')
          GROUP BY 1, 2
        ), df AS (
          SELECT token, COUNT(DISTINCT doc_id) AS df FROM ex
          WHERE token IN ('stream', 'table', 'hash')
          GROUP BY token
        ), bm AS (
          SELECT t.doc_id,
                 ROUND(5e-10 + SUM(
                     ln(1.0 + ((SELECT n_docs FROM stats) - d.df + 0.5)
                              / (d.df + 0.5))
                     * t.tf * {1.2 + 1.0}
                     / (t.tf + 1.2 * (1 - 0.75
                          + 0.75 * l.dl / (SELECT avgdl FROM stats)))
                 ), 4) AS s
          FROM tf t JOIN df d USING (token) JOIN dl l USING (doc_id)
          GROUP BY t.doc_id
        ), bm_r AS (
          SELECT doc_id, s,
                 ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS r_bm25
          FROM bm
        ), sem AS (
          SELECT e.vec_id AS doc_id,
                 ROUND(5e-10 + list_cosine_similarity(
                     e.embedding::DOUBLE[],
                     (SELECT embedding::DOUBLE[] FROM embeddings
                      WHERE vec_id = {_HN_QVEC})), 4) AS c
          FROM embeddings e
        ), sem_r AS (
          SELECT doc_id, c,
                 ROW_NUMBER() OVER (ORDER BY c DESC, doc_id) AS r_sem
          FROM sem
        )
        SELECT b.doc_id, b.r_bm25, b.s AS bm25,
               s.r_sem, s.c AS cosine
        FROM bm_r b JOIN sem_r s USING (doc_id)
        WHERE b.r_bm25 <= {_HN_K} AND s.r_sem > {_HN_K}
        ORDER BY b.r_bm25
    """,
    doc="Contrastive hard-negative mining: documents in the lexical "
    "(BM25) top-k that are NOT in the semantic (embedding-cosine) "
    "top-k — lexically confusable but semantically far, the pair "
    "source contrastive retrieval training wants. Both lanes rank on "
    "the biased-rounded score so rank order is engine-portable; the "
    "set difference is a doc-keyed join of two rank tables. Reuses the "
    "postings-filtered BM25 plan (shuffle O(matching postings)) and "
    "the broadcast-query cosine lane. 'Outside the semantic top-k' is "
    "decided by an exact rank recount — r_sem = 1 + count of docs "
    "ranked above, via one broadcast-nested-loop pass over the scored "
    "lane with the <=k BM25 candidates as build side — NEVER a global "
    "row_number over the corpus: the r>k complement of a rank window "
    "cannot be bounded by any group-limit rewrite, so at 100 TB it "
    "would be a corpus-sized single-task sort.",
)
def retrieval_hard_negatives(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from economic_data_etl_spark.functions.vectors import (
        dot_product,
        l2_normalize,
    )
    from economic_data_etl_spark.operators.retrieval import bm25_scores

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    bm = bm25_scores(docs, list(_HN_TERMS)).select(
        "doc_id", biased_round(F.col("score")).alias("bm25")
    )
    bm_r = bm.select(
        "doc_id",
        "bm25",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .alias("r_bm25"),
    )
    qrow = (
        emb.filter(F.col("vec_id") == _HN_QVEC)
        .select(l2_normalize(F.col("embedding")).alias("q"))
        .collect()
    )
    if qrow:
        qlit = F.array(*[F.lit(float(x)) for x in qrow[0]["q"]])
        sem = emb.select(
            F.col("vec_id").alias("doc_id"),
            biased_round(
                dot_product(l2_normalize(F.col("embedding")), qlit)
            ).alias("cosine"),
        )
    else:  # empty corpus: no semantic lane, no negatives
        sem = spark.createDataFrame([], "doc_id long, cosine double")
    # Score once, consume twice (membership join, rank recount):
    # localCheckpoint materializes the 16-byte/row (doc_id, cosine)
    # projection so the interpreted-HOF dot product runs ONE corpus
    # pass instead of one per consumer (measured 7.7 s vs 2.5 s at
    # sf0.1; the scored lane is what a serving system persists anyway).
    # Lazy: the job that first consumes it pays the pass — no separate
    # eager materialization action.
    sem = sem.localCheckpoint(eager=False)
    # "Not in the semantic top-k" WITHOUT a global row_number over the
    # corpus (whose r>k complement no group-limit rewrite can bound):
    # the semantic rank of each BM25-top-k candidate is recovered as
    # 1 + count of docs ranked above it — one broadcast-nested-loop
    # pass over the scored lane with the <=k candidate rows as build
    # side, a linear scan, never a single-partition corpus sort. The
    # order (cosine DESC, doc_id ASC) is total, so r_sem equals the
    # oracle's global ROW_NUMBER exactly and membership is r_sem > k.
    # Counting compares biased-rounded cosines, so the gate is
    # engine-portable.
    hard = bm_r.filter(F.col("r_bm25") <= _HN_K)
    # <=k rows, but its lineage includes the full BM25 pass — and it
    # feeds both the broadcast build of the recount AND the final join,
    # which would re-run BM25 once per consumer. Same lazy
    # checkpoint-once pattern as the scored lane above.
    cand = (
        hard.join(sem, "doc_id")
        .select("doc_id", "r_bm25", "bm25", "cosine")
        .localCheckpoint(eager=False)
    )
    above = (
        sem.select(
            F.col("doc_id").alias("o_id"), F.col("cosine").alias("o_c")
        )
        .join(
            F.broadcast(cand.select("doc_id", "cosine")),
            (F.col("o_c") > F.col("cosine"))
            | (
                (F.col("o_c") == F.col("cosine"))
                & (F.col("o_id") < F.col("doc_id"))
            ),
        )
        .groupBy("doc_id")
        .agg((F.count("*") + F.lit(1)).cast("long").alias("r_sem"))
    )
    return (
        cand.join(F.broadcast(above), "doc_id")
        .filter(F.col("r_sem") > _HN_K)
        .select("doc_id", "r_bm25", "bm25", "r_sem", "cosine")
        .orderBy("r_bm25")
    )


@register(
    "training_dataset_card",
    oracle=f"""
        WITH toks AS (
            SELECT source, lang, text, strlen(text) AS nb,
                   list_filter(string_split_regex(text,
                       '{WORD_SPLIT_RE}'), x -> x <> '') AS w
            FROM documents
        ), base AS (
            SELECT source,
                   COUNT(*) AS n_docs,
                   CAST(COUNT(DISTINCT text) AS BIGINT) AS n_unique_texts,
                   CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
                   CAST(SUM(len(w)) AS BIGINT) AS n_tokens,
                   CAST(SUM(nb) AS BIGINT) AS n_bytes
            FROM toks GROUP BY source
        ), ex AS (
            SELECT source, unnest(w) AS token FROM toks
        ), ct AS (
            SELECT token, COUNT(*) AS c FROM ex GROUP BY 1
        ), g AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS v,
                   CAST(SUM(c) AS BIGINT) AS n
            FROM ct
        ), cs AS (
            SELECT source, token, COUNT(*) AS c FROM ex GROUP BY 1, 2
        ), ns AS (
            SELECT source, CAST(SUM(c) AS BIGINT) AS n_s FROM cs GROUP BY 1
        ), grid AS (
            SELECT s.source, s.n_s, t.c AS c_t, COALESCE(cs.c, 0) AS c_st
            FROM ns s
            CROSS JOIN ct t
            LEFT JOIN cs ON cs.source = s.source AND cs.token = t.token
        ), kl AS (
            SELECT source,
                   SUM( ((c_st + 1.0) / (n_s + (SELECT v FROM g)))
                        * LN(((c_st + 1.0) / (n_s + (SELECT v FROM g)))
                             / ((c_t + 1.0)
                                / ((SELECT n FROM g)
                                   + (SELECT v FROM g)))) ) AS kl
            FROM grid GROUP BY source
        )
        SELECT b.source, b.n_docs, b.n_unique_texts,
               ROUND(5e-10 + 1.0 - b.n_unique_texts * 1.0 / b.n_docs, 4)
                   AS dup_rate,
               b.n_langs, b.n_tokens, b.n_bytes,
               ROUND(5e-10 + 100.0 * b.n_tokens / b.n_bytes, 4)
                   AS tokens_per_100_bytes,
               ROUND(5e-10 + k.kl, 4) AS kl_nats
        FROM base b JOIN kl k USING (source)
        ORDER BY b.source
    """,
    doc="The per-source DATASET CARD — the datasheet a data team ships "
    "with a training mix: volume (docs, tokens, bytes), exact-dup "
    "rate, language diversity, tokenizer fertility, and distribution "
    "drift (KL vs the blend) in one table. A composition of the "
    "already-certified lanes: one raw scan for the row stats, one "
    "tokenize+explode for the KL decomposition (postings-sized, never "
    "the grid — the oracle builds the naive grid). Everything after "
    "the two corpus passes is sources-sized.",
)
def training_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per = docs.select(
        "source",
        "lang",
        "text",
        F.octet_length("text").alias("nb"),
        F.size(
            F.filter(
                F.split(F.col("text"), WORD_SPLIT_RE), lambda t: t != ""
            )
        ).alias("n_tok"),
    )
    base = per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("text").alias("n_unique_texts"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_tok").alias("n_tokens"),
        F.sum("nb").alias("n_bytes"),
    )
    kl = kl_by_source(docs).select("source", "kl_nats")
    return (
        base.join(kl, "source")
        .select(
            "source",
            "n_docs",
            "n_unique_texts",
            _r(
                F.lit(1.0)
                - F.col("n_unique_texts") * F.lit(1.0) / F.col("n_docs")
            ).alias("dup_rate"),
            "n_langs",
            "n_tokens",
            "n_bytes",
            _r(
                F.lit(100.0) * F.col("n_tokens") / F.col("n_bytes")
            ).alias("tokens_per_100_bytes"),
            _r(F.col("kl_nats")).alias("kl_nats"),
        )
        .orderBy("source")
    )
