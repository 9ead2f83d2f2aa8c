"""Training-data curation queries over `documents`, part 2.

Repetition-based quality filtering (Gopher/MassiveText-style), TF-IDF
salient terms, and benchmark decontamination — the filters an LLM
training pipeline runs between raw crawl and tokenization. All
JVM-expression or broadcast-join plans; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from economic_data_etl_spark.functions import text as T
from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# Gopher-style repetition metrics + keep/drop verdict.
# --------------------------------------------------------------------------
_TOP_TOKEN_MAX = 0.15
_DUP_TOKEN_MAX = 0.55


@register(
    "text_repetition_metrics",
    oracle=rf"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
            FROM documents
        ), m AS (
            SELECT doc_id,
                   len(w) AS n,
                   len(list_distinct(w)) AS nd,
                   list_max(list_transform(
                       list_distinct(w),
                       d -> len(list_filter(w, x -> x = d)))) AS mx,
                   CASE WHEN len(w) >= 2
                        THEN list_transform(
                            generate_series(1, len(w) - 1),
                            i -> concat_ws(' ', w[i], w[i+1]))
                        ELSE [array_to_string(w, ' ')]
                   END AS g
            FROM toks
        )
        SELECT doc_id,
               ROUND(5e-10 + CASE WHEN n > 0 THEN mx * 1.0 / n ELSE 0.0 END, 4)
                   AS top_token_frac,
               ROUND(5e-10 + CASE WHEN n > 0 THEN 1.0 - nd * 1.0 / n ELSE 0.0 END, 4)
                   AS dup_token_frac,
               ROUND(5e-10 + 1.0 - len(list_distinct(g)) * 1.0 / len(g), 4)
                   AS dup_2gram_frac,
               CAST(CASE WHEN n > 0
                          AND mx * 1.0 / n <= {_TOP_TOKEN_MAX}
                          AND 1.0 - nd * 1.0 / n <= {_DUP_TOKEN_MAX}
                         THEN 1 ELSE 0 END AS INT) AS keep
        FROM m
        ORDER BY doc_id
    """,
    doc="Gopher-style repetition filters: most-frequent-token fraction, "
    "duplicate-token fraction, duplicate-bigram fraction, and the "
    "keep/drop verdict at fixed thresholds. The integer token/gram "
    "statistics come from ONE Arrow-batched pass "
    "(operators/textstats.repetition_stats — the expression lane's "
    "top-token count is O(tokens x distinct) interpreted lambda steps "
    "per document; the Counter pass is O(tokens), measured 2.8 s → "
    "≤1 s at sf0.1); every fraction, rounding step, and the verdict "
    "stay Spark expressions over those exact integers, so the oracle "
    "comparison is bit-identical (single correctly-rounded divisions). "
    "Embarrassingly parallel, no shuffle; the verdict binds on RAW "
    "ratios so rounding can't flip it. Expression twins remain in "
    "functions/text.py (used by the quality-score family) and the two "
    "lanes are pinned equal in tests/test_dedup_quality.py.",
)
def text_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.operators.textstats import (
        repetition_stats,
    )

    docs = load_table(spark, sf_dir, "documents")
    st = repetition_stats(docs)
    n = F.col("n_tok")
    top_frac = F.when(
        n > 0, F.col("max_tok_count") / n
    ).otherwise(F.lit(0.0))
    dup_frac = F.when(
        n > 0, F.lit(1.0) - F.col("n_distinct") / n
    ).otherwise(F.lit(0.0))
    dup2_frac = F.lit(1.0) - F.col("g_distinct") / F.col("g_total")
    keep = (
        (n > 0)
        & (top_frac <= _TOP_TOKEN_MAX)
        & (dup_frac <= _DUP_TOKEN_MAX)
    )
    return (
        st.select(
            "doc_id",
            biased_round(top_frac).alias("top_token_frac"),
            biased_round(dup_frac).alias("dup_token_frac"),
            biased_round(dup2_frac).alias("dup_2gram_frac"),
            keep.cast("int").alias("keep"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# TF-IDF salient term per document.
# --------------------------------------------------------------------------
@register(
    "text_tfidf_salient_term",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_filter(string_split_regex(text, '\\s+'),
                                      x -> x <> '')) AS term
            FROM documents
        ), tf AS (
            SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
        ), df AS (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
        ), n AS (
            SELECT COUNT(*) AS n_docs FROM documents
        ), scored AS (
            SELECT doc_id, term, tf, df,
                   ROW_NUMBER() OVER (
                       PARTITION BY doc_id
                       ORDER BY tf DESC, df ASC, term ASC) AS rn
            FROM tf JOIN df USING (term)
        )
        SELECT doc_id,
               term AS salient_term,
               CAST(tf AS BIGINT) AS tf,
               CAST(df AS BIGINT) AS df,
               ROUND(5e-10 + tf * ln(n_docs * 1.0 / df), 4) AS tfidf
        FROM scored, n
        WHERE rn = 1
        ORDER BY doc_id
    """,
    doc="Per-doc most salient term by TF-IDF. Corpus stats from ONE "
    "tokenize+explode pass: tf = per-(doc,term) counts, df = term's "
    "doc count derived from the already-distinct tf table (no second "
    "scan), N broadcast as a 1-row cross join. Ranking breaks ties on "
    "exact integers (tf desc, df asc, term) so cross-engine float noise "
    "in ln() can't reorder the answer; tfidf is display-rounded only.",
)
def text_tfidf_salient_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(T.tokens(F.col("text"))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        tf.join(df, "term")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            F.col("term").alias("salient_term"),
            "tf",
            "df",
            biased_round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df"))
            ).alias("tfidf"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Benchmark decontamination report.
# --------------------------------------------------------------------------
@register(
    "decontam_overlap_report",
    oracle=r"""
        WITH toks AS (
            SELECT doc_id, source,
                   list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
            FROM documents
        ), sh AS (
            SELECT doc_id, source,
                   list_distinct(
                       CASE WHEN len(w) >= 3
                            THEN list_transform(
                                generate_series(1, len(w) - 2),
                                i -> concat_ws(' ', w[i], w[i+1], w[i+2]))
                            ELSE [array_to_string(w, ' ')]
                       END) AS shingles
            FROM toks
        ), t_inv AS (
            SELECT doc_id AS train_id, unnest(shingles) AS shingle
            FROM sh WHERE source <> 'src0'
        ), b_inv AS (
            SELECT doc_id AS bench_id, unnest(shingles) AS shingle
            FROM sh WHERE source = 'src0'
        ), ov AS (
            SELECT train_id, bench_id, COUNT(*) AS overlap
            FROM t_inv JOIN b_inv USING (shingle)
            GROUP BY 1, 2
            HAVING COUNT(*) >= 3
        ), sel AS (
            SELECT train_id, bench_id, overlap,
                   ROW_NUMBER() OVER (
                       PARTITION BY train_id
                       ORDER BY overlap DESC, bench_id ASC) AS rn,
                   COUNT(*) OVER (PARTITION BY train_id) AS nb,
                   MAX(overlap) OVER (PARTITION BY train_id) AS mo
            FROM ov
        )
        SELECT train_id,
               CAST(nb AS BIGINT) AS n_bench_hits,
               CAST(mo AS BIGINT) AS max_overlap,
               bench_id AS worst_bench_id
        FROM sel
        WHERE rn = 1
        ORDER BY train_id
    """,
    doc="Benchmark decontamination (operators/contamination.py): training "
    "docs (source != src0) sharing >= 3 distinct 3-word shingles with "
    "any benchmark doc (source = src0), with the worst-offender bench "
    "doc. The small benchmark shingle index is BROADCAST, so the "
    "training corpus streams through a broadcast hash join without "
    "shuffling — the property that makes decontamination affordable "
    "when the corpus is 100 TB and the eval set is megabytes.",
)
def decontam_overlap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.operators.contamination import (
        contamination_report,
    )

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("source") != "src0")
    bench = docs.filter(F.col("source") == "src0")
    return contamination_report(
        train, bench, "doc_id", "text", n=3, min_overlap=3
    ).orderBy("train_id")


# --------------------------------------------------------------------------
# End-to-end curation funnel.
# --------------------------------------------------------------------------
@register(
    "curation_funnel_summary",
    oracle=rf"""
        WITH corpus AS (
            SELECT * FROM documents WHERE source <> 'src0'
        ), tokc AS (
            SELECT doc_id, text,
                   list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
            FROM corpus
        ), rep AS (
            SELECT doc_id, text, len(w) AS n, len(list_distinct(w)) AS nd,
                   list_max(list_transform(
                       list_distinct(w),
                       d -> len(list_filter(w, x -> x = d)))) AS mx
            FROM tokc
        ), kept AS (
            SELECT doc_id, text FROM rep
            WHERE n > 0 AND mx * 1.0 / n <= {_TOP_TOKEN_MAX}
              AND 1.0 - nd * 1.0 / n <= {_DUP_TOKEN_MAX}
        ), surv AS (
            SELECT MIN(doc_id) AS doc_id, text FROM kept GROUP BY text
        ), ssh AS (
            SELECT doc_id,
                   unnest(list_distinct(
                       CASE WHEN len(w) >= 3
                            THEN list_transform(
                                generate_series(1, len(w) - 2),
                                i -> concat_ws(' ', w[i], w[i+1], w[i+2]))
                            ELSE [array_to_string(w, ' ')]
                       END)) AS shingle
            FROM (SELECT doc_id,
                         list_filter(string_split_regex(text, '\s+'),
                                     x -> x <> '') AS w
                  FROM surv) t
        ), bsh AS (
            SELECT doc_id AS bench_id,
                   unnest(list_distinct(
                       CASE WHEN len(w) >= 3
                            THEN list_transform(
                                generate_series(1, len(w) - 2),
                                i -> concat_ws(' ', w[i], w[i+1], w[i+2]))
                            ELSE [array_to_string(w, ' ')]
                       END)) AS shingle
            FROM (SELECT doc_id,
                         list_filter(string_split_regex(text, '\s+'),
                                     x -> x <> '') AS w
                  FROM documents WHERE source = 'src0') t
        ), contaminated AS (
            SELECT DISTINCT doc_id FROM (
                SELECT s.doc_id, b.bench_id
                FROM ssh s JOIN bsh b USING (shingle)
                GROUP BY 1, 2
                HAVING COUNT(*) >= 3
            )
        ), final AS (
            SELECT * FROM surv
            WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
        )
        SELECT * FROM (
            SELECT 0 AS stage, 'raw' AS name,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM corpus) AS n_docs
            UNION ALL SELECT 1, 'quality',
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM kept)
            UNION ALL SELECT 2, 'exact_dedup',
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM surv)
            UNION ALL SELECT 3, 'decontam',
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM final)
        )
        ORDER BY stage
    """,
    doc="End-to-end curation funnel — the composed training-data pipeline "
    "as ONE declarative plan: repetition-filter the training corpus "
    "(source != src0), exact-dedup survivors (min doc_id per text), "
    "then drop docs sharing >= 3 shingles with the benchmark set, "
    "reporting per-stage document counts. Each stage reuses the "
    "standalone operator (functions/text.py thresholds, hash-groupBy "
    "dedup, operators/contamination.py broadcast decontam), so the "
    "funnel is the integration check that the pieces compose.",
)
def curation_funnel_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.operators.contamination import (
        contamination_report,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("source") != "src0")
    bench = docs.filter(F.col("source") == "src0")
    text = F.col("text")
    kept = corpus.filter(
        (T.token_count(text) > 0)
        & (T.top_token_frac(text) <= _TOP_TOKEN_MAX)
        & (T.dup_token_frac(text) <= _DUP_TOKEN_MAX)
    )
    surv = kept.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    contaminated = contamination_report(
        surv, bench, "doc_id", "text", n=3, min_overlap=3
    ).select(F.col("train_id").alias("doc_id"))
    final = surv.join(contaminated, "doc_id", "left_anti")

    def stage(i: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(i).alias("stage"), F.lit(name).alias("name"), "n_docs"
        )

    return (
        stage(0, "raw", corpus)
        .union(stage(1, "quality", kept))
        .union(stage(2, "exact_dedup", surv))
        .union(stage(3, "decontam", final))
        .orderBy("stage")
    )
