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


# --------------------------------------------------------------------------
# Benchmark decontamination EXCISION (GPT-3 style: remove the overlap,
# keep the document).
# --------------------------------------------------------------------------
_EXC_K = 3


@register(
    "curation_decontam_excision",
    oracle=rf"""
        WITH toks AS (
            SELECT doc_id, source,
                   list_filter(string_split_regex(text, '[ \t\n\r]+'),
                               x -> x <> '') AS w
            FROM documents
        ), tg AS (
            SELECT doc_id, w,
                   unnest(CASE WHEN len(w) >= {_EXC_K}
                               THEN generate_series(1, len(w) - {_EXC_K - 1})
                               ELSE [] END) AS i
            FROM toks WHERE source <> 'src0'
        ), tgrams AS (
            SELECT doc_id, i - 1 AS pos,
                   array_to_string(w[i:i+{_EXC_K - 1}], ' ') AS gram
            FROM tg
        ), bg AS (
            SELECT w,
                   unnest(CASE WHEN len(w) >= {_EXC_K}
                               THEN generate_series(1, len(w) - {_EXC_K - 1})
                               ELSE [] END) AS i
            FROM toks WHERE source = 'src0'
        ), bgrams AS (
            SELECT DISTINCT array_to_string(w[i:i+{_EXC_K - 1}], ' ') AS gram
            FROM bg
        ), hits AS (
            SELECT DISTINCT t.doc_id, t.pos
            FROM tgrams t JOIN bgrams b USING (gram)
        ), marked AS (
            SELECT doc_id, pos, pos + {_EXC_K} AS e,
                   CASE WHEN pos <= MAX(pos + {_EXC_K}) OVER (
                            PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING)
                        THEN 0 ELSE 1 END AS new_span
            FROM hits
        ), spans AS (
            SELECT doc_id,
                   SUM(new_span) OVER (
                       PARTITION BY doc_id ORDER BY pos) AS span_id,
                   pos, e
            FROM marked
        ), agg AS (
            SELECT doc_id, span_id, MIN(pos) AS st, MAX(e) AS e
            FROM spans GROUP BY 1, 2
        ), sstat AS (
            SELECT doc_id,
                   COUNT(*) AS n_spans,
                   SUM(e - st) AS contam_tokens
            FROM agg GROUP BY doc_id
        ), tokpos AS (
            SELECT doc_id, w,
                   unnest(CASE WHEN len(w) >= 1
                               THEN generate_series(1, len(w))
                               ELSE [] END) AS i
            FROM toks WHERE source <> 'src0'
        ), tp AS (
            SELECT doc_id, i - 1 AS idx, w[i] AS tok FROM tokpos
        ), kept AS (
            SELECT t.doc_id, t.idx, t.tok
            FROM tp t LEFT JOIN agg s
              ON t.doc_id = s.doc_id AND t.idx >= s.st AND t.idx < s.e
            WHERE s.doc_id IS NULL
        ), clean AS (
            SELECT doc_id,
                   COUNT(*) AS n_clean,
                   md5(string_agg(tok, ' ' ORDER BY idx)) AS cmd5
            FROM kept GROUP BY doc_id
        )
        SELECT t.doc_id,
               CAST(len(t.w) AS BIGINT) AS n_tokens,
               CAST(COALESCE(s.n_spans, 0) AS BIGINT) AS contam_spans,
               CAST(COALESCE(s.contam_tokens, 0) AS BIGINT)
                   AS contam_tokens,
               CAST(COALESCE(c.n_clean, 0) AS BIGINT) AS n_clean_tokens,
               COALESCE(c.cmd5, md5('')) AS clean_md5
        FROM (SELECT doc_id, w FROM toks WHERE source <> 'src0') t
        LEFT JOIN sstat s USING (doc_id)
        LEFT JOIN clean c USING (doc_id)
        ORDER BY t.doc_id
    """,
    doc="Benchmark decontamination EXCISION (operators/contamination.py:"
    "contaminated_spans/remove_contaminated_spans — the GPT-3-style "
    f"stage after the overlap report): every {_EXC_K}-token gram of a "
    "training doc (source != src0) that occurs anywhere in the "
    "benchmark set (source = src0) marks its window; overlapping "
    "windows merge into maximal spans (the substring-dedup span "
    "machinery) and the covered tokens are excised, keeping the rest "
    "of the document instead of dropping it. Output: per-doc "
    "accounting plus md5 of the cleaned text — the oracle replays "
    "gram match, span merge, and reassembly token-for-token. Scale "
    "shape: the bench gram set is broadcast (eval sets are megabytes, "
    "the corpus is 100 TB), the corpus never shuffles for matching, "
    "and the span merge carries hit occurrences only.",
)
def curation_decontam_excision(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from economic_data_etl_spark.operators.contamination import (
        contaminated_spans,
    )
    from economic_data_etl_spark.operators.substring import excise_spans

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("source") != "src0").select(
        "doc_id", "text"
    )
    bench = docs.filter(F.col("source") == "src0").select(
        "doc_id", "text"
    )
    spans = contaminated_spans(train, bench, "doc_id", "text", _EXC_K)
    stats = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("contam_spans"),
        F.sum(F.col("span_end") - F.col("span_start")).alias(
            "contam_tokens"
        ),
    )
    cleaned = excise_spans(train, spans, "doc_id", "text")
    # n_tokens = n_clean + contam by the excision conservation
    # identity — avoids a third tokenization pass of the corpus.
    return (
        cleaned.join(stats, "doc_id", "left")
        .select(
            "doc_id",
            (
                F.col("n_clean_tokens")
                + F.coalesce("contam_tokens", F.lit(0))
            ).cast("long").alias("n_tokens"),
            F.coalesce("contam_spans", F.lit(0)).cast("long").alias(
                "contam_spans"
            ),
            F.coalesce("contam_tokens", F.lit(0)).cast("long").alias(
                "contam_tokens"
            ),
            F.col("n_clean_tokens"),
            F.md5(F.col("clean_text")).alias("clean_md5"),
        )
        .orderBy("doc_id")
    )
