r"""Corpus-statistics and training-data-ordering queries.

Round-4 tranche: profiling / curation shapes an LLM-pipeline team runs
over the whole corpus before and after filtering — Zipf rank-frequency
fit (tokenizer sanity), inter-source n-gram novelty (mixture diversity),
token-length histograms (packing/curriculum design), per-source
character-trigram entropy (language/noise profiling), per-source quality
quantile filtering (CCNet-style percentile cuts), deterministic
per-epoch shuffle assignment (data ordering without a global sort), and
event Pareto concentration (hot-user profiling for the skew story).

Every query is DuckDB-oracle-backed: token/shingle definitions reuse the
exact idioms the dedup/text family already cross-proved
(`functions/text.py:tokens` ≡ `string_split_regex(text, '\s+')`
filtered; `word_shingles` ≡ the list_transform CTE in plans/text.py),
and hashes go through the portable md5-bucket formula from
operators/training.py.

Scale notes are per-query; the common theme is that every global sort or
collect here runs on a VOCABULARY- or USER-bounded table, never on the
corpus itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from economic_data_etl_spark.functions import text as T
from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.sources.tables import load_table


def _r(col):
    return biased_round(col)


_TOKS_CTE = r"""
    WITH toks AS (
        SELECT doc_id, source, lang,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
        FROM documents
    )
"""


@register(
    "text_zipf_rank_frequency",
    oracle=_TOKS_CTE
    + """
    , freq AS (
        SELECT tok, COUNT(*) AS freq
        FROM (SELECT unnest(w) AS tok FROM toks)
        GROUP BY tok
    ), ranked AS (
        SELECT tok, freq,
               ROW_NUMBER() OVER (ORDER BY freq DESC, tok ASC) AS rank
        FROM freq
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_top,
           ROUND(5e-10 + REGR_SLOPE(LN(freq), LN(rank)), 4) AS zipf_slope,
           ROUND(5e-10 + REGR_INTERCEPT(LN(freq), LN(rank)), 4)
               AS zipf_intercept
    FROM ranked WHERE rank <= 100
    """,
    doc="Zipf's-law fit over the corpus vocabulary: OLS slope/intercept "
    "of ln(freq) on ln(rank) for the top-100 tokens (slope ~ -1 for "
    "natural text; a flat slope flags synthetic/boilerplate corpora). "
    "The corpus contributes one vocab-bounded groupBy; the global "
    "rank sort runs on the VOCABULARY table (thousands of rows at any "
    "corpus size), never on the corpus.",
)
def text_zipf_rank_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ranked = freq.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("freq"), F.asc("tok"))),
    ).filter(F.col("rank") <= 100)
    ln_f, ln_r = F.log(F.col("freq")), F.log(F.col("rank"))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_top"),
        _r(F.regr_slope(ln_f, ln_r)).alias("zipf_slope"),
        _r(F.regr_intercept(ln_f, ln_r)).alias("zipf_intercept"),
    )


@register(
    "text_ngram_novelty_by_source",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, source,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
        FROM documents
    ), sh AS (
        SELECT DISTINCT source, unnest(
                   CASE WHEN len(w) >= 3
                        THEN list_transform(
                            generate_series(1, len(w) - 2),
                            i -> concat_ws(' ', w[i], w[i+1], w[i+2]))
                        ELSE [array_to_string(w, ' ')]
                   END) AS g
        FROM toks
    ), df AS (
        SELECT g, COUNT(*) AS n_src FROM sh GROUP BY g
    )
    SELECT sh.source,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN df.n_src = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_exclusive,
           ROUND(5e-10 + SUM(CASE WHEN df.n_src = 1 THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 4) AS novelty_ratio
    FROM sh JOIN df USING (g)
    GROUP BY sh.source
    ORDER BY sh.source
    """,
    doc="Inter-source n-gram novelty: per source, the fraction of its "
    "distinct 3-word shingles that occur in NO other source — a mixture-"
    "diversity metric (near-zero novelty = the source is redundant with "
    "the rest of the mix). Shingle definition identical to the dedup "
    "family's. Two shuffles, both on the (source, shingle) distinct set "
    "(vocab-bounded per source), never on raw docs.",
)
def text_ngram_novelty_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = (
        docs.select(
            "source",
            F.explode(T.word_shingles(F.col("text"), 3)).alias("g"),
        )
        .distinct()
    )
    df_ = sh.groupBy("g").agg(F.count(F.lit(1)).alias("n_src"))
    return (
        sh.join(df_, "g")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("n_src") == 1).cast("long")).alias("n_exclusive"),
            _r(
                F.sum((F.col("n_src") == 1).cast("long"))
                / F.count(F.lit(1))
            ).alias("novelty_ratio"),
        )
        .orderBy("source")
    )


@register(
    "text_token_length_histogram",
    oracle=_TOKS_CTE
    + """
    SELECT CAST(len(w) // 32 * 32 AS BIGINT) AS bucket_lo,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(w)) AS BIGINT) AS total_tokens
    FROM toks
    GROUP BY 1
    ORDER BY bucket_lo
    """,
    doc="Token-length histogram (width-32 buckets) over whitespace token "
    "counts — the packing/curriculum design profile. One map-side-"
    "combinable groupBy on a derived integer key; integer-only output "
    "makes the cross-engine check exact by construction.",
)
def text_token_length_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(T.tokens(F.col("text")))
    return (
        docs.select(
            (F.floor(n_tok / 32) * 32).cast("long").alias("bucket_lo"),
            n_tok.alias("n_tok"),
        )
        .groupBy("bucket_lo")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
        )
        .orderBy("bucket_lo")
    )


@register(
    "docs_char_trigram_entropy_by_source",
    oracle="""
    WITH tg AS (
        SELECT source,
               substring(lower(text), CAST(i AS INTEGER), 3) AS g
        FROM documents d, UNNEST(range(1, length(d.text) - 1)) AS t(i)
        WHERE length(d.text) >= 3
    ), cnt AS (
        SELECT source, g, COUNT(*) AS c FROM tg GROUP BY 1, 2
    ), tot AS (
        SELECT source, SUM(c) AS s FROM cnt GROUP BY 1
    )
    SELECT cnt.source,
           CAST(COUNT(*) AS BIGINT) AS n_trigrams,
           ROUND(5e-10 + -SUM((c / s) * LN(c / s)), 4) AS entropy
    FROM cnt JOIN tot ON cnt.source = tot.source
    GROUP BY cnt.source
    ORDER BY cnt.source
    """,
    doc="Per-source Shannon entropy of the character-trigram "
    "distribution — low entropy flags repetitive/templated sources, a "
    "CCNet-adjacent noise profile. The instance counts come from the "
    "Arrow-vectorized trigram lane "
    "(operators/textstats.char_trigram_counts: int64-packed trigrams, "
    "np.unique per batch — the interpreted transform+explode built one "
    "JVM string per corpus character; measured 2.9 s → ≤1 s at sf0.1). "
    "Count identity with the string pipeline is exact (the packing is "
    "injective), so the oracle is unchanged; per-source sums still run "
    "over the vocab-sized count table, map-side combined.",
)
def docs_char_trigram_entropy_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from economic_data_etl_spark.operators.textstats import (
        char_trigram_counts,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= 3
    )
    cnt = char_trigram_counts(docs, "source")
    tot = cnt.groupBy("source").agg(F.sum("c").alias("s"))
    p = F.col("c") / F.col("s")
    return (
        cnt.join(tot, "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            _r(-F.sum(p * F.log(p))).alias("entropy"),
        )
        .orderBy("source")
    )


@register(
    "curation_quality_quantile_filter",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, source, text,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
        FROM documents
    ), q AS (
        SELECT doc_id, source,
               ROUND(5e-10
                   + 0.5 * (CASE WHEN len(w) > 0
                                 THEN len(list_distinct(w)) * 1.0 / len(w)
                                 ELSE 0.0 END)
                   + 0.3 * LEAST(len(w) / 100.0, 1.0)
                   + 0.2 * (1.0 - CASE WHEN length(text) > 0
                                       THEN length(regexp_replace(text,
                                           '[a-zA-Z0-9\s]', '', 'g'))
                                           * 1.0 / length(text)
                                       ELSE 0.0 END), 4) AS quality
        FROM toks
    ), cut AS (
        SELECT source, quantile_cont(quality, 0.25) AS cutoff
        FROM q GROUP BY source
    )
    SELECT q.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN quality >= cutoff THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           ROUND(5e-10 + ANY_VALUE(cutoff), 4) AS cutoff,
           ROUND(5e-10 + AVG(CASE WHEN quality >= cutoff
                                  THEN quality END), 4) AS avg_quality_kept
    FROM q JOIN cut ON q.source = cut.source
    GROUP BY q.source
    ORDER BY q.source
    """,
    doc="CCNet-style percentile cut: drop each source's bottom quality "
    "quartile (per-source P25 cutoff via exact interpolated percentile, "
    "the same percentile pairing agg_ship_latency_percentiles proved "
    "cross-engine). The cutoff table is |sources| rows joined back "
    "broadcast; quality is the 4dp-rounded composite score shared with "
    "text_quality_metrics, so cutoff comparisons happen on the same "
    "grid in both engines.",
)
def curation_quality_quantile_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id",
        "source",
        T.quality_score(F.col("text")).alias("quality"),
    )
    cut = q.groupBy("source").agg(
        F.expr("percentile(quality, 0.25)").alias("cutoff")
    )
    kept = F.col("quality") >= F.col("cutoff")
    return (
        q.join(cut, "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(kept.cast("long")).alias("n_kept"),
            _r(F.any_value("cutoff")).alias("cutoff"),
            _r(F.avg(F.when(kept, F.col("quality")))).alias(
                "avg_quality_kept"
            ),
        )
        .orderBy("source")
    )


@register(
    "training_epoch_shuffle_assignment",
    oracle="""
    WITH e AS (
        SELECT doc_id, epoch
        FROM documents, UNNEST([0, 1, 2]) AS t(epoch)
    )
    SELECT epoch,
           CAST(('0x' || substring(md5('epoch-' || CAST(epoch AS VARCHAR)
                || '|' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 8
                AS INTEGER) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM e
    GROUP BY 1, 2
    ORDER BY epoch, shard
    """,
    doc="Deterministic per-epoch shuffle: each training epoch re-assigns "
    "every doc to one of 8 reader shards via the portable md5 bucket of "
    "(epoch, doc_id) — a different, reproducible permutation per epoch "
    "with NO global sort and no stored shuffle order (the standard "
    "hash-reshuffle trick for multi-epoch training over an immutable "
    "corpus). Output is the epoch x shard occupancy table; the md5 "
    "formula is the same one the train/val/test split operators "
    "cross-proved.",
)
def training_epoch_shuffle_assignment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    shard = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("epoch-"),
                        F.col("epoch").cast("string"),
                        F.lit("|"),
                        F.col("doc_id").cast("string"),
                    )
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % 8
    ).cast("int")
    return (
        docs.select(
            "doc_id", F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("epoch")
        )
        .select("epoch", shard.alias("shard"))
        .groupBy("epoch", "shard")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("epoch", "shard")
    )


@register(
    "events_pareto_concentration",
    oracle="""
    WITH per_user AS (
        SELECT user_id, COUNT(*) AS n_ev FROM events GROUP BY user_id
    ), ranked AS (
        SELECT user_id, n_ev,
               ROW_NUMBER() OVER (ORDER BY n_ev DESC, user_id ASC) AS rn,
               COUNT(*) OVER () AS n_users,
               SUM(n_ev) OVER () AS n_events
        FROM per_user
    )
    SELECT CAST(ANY_VALUE(n_users) AS BIGINT) AS n_users,
           CAST(ANY_VALUE(n_events) AS BIGINT) AS n_events,
           CAST(CEIL(ANY_VALUE(n_users) / 100.0) AS BIGINT)
               AS top1pct_users,
           ROUND(5e-10 + SUM(CASE WHEN rn <= CEIL(n_users / 100.0)
                                  THEN n_ev ELSE 0 END)
                 * 1.0 / ANY_VALUE(n_events), 4) AS top1pct_share
    FROM ranked
    """,
    doc="Pareto concentration of event volume: the share of all events "
    "generated by the top 1% of users (ceil(n/100) by event count, ties "
    "to lowest user_id) — the skew profile that motivates the hot-key "
    "handling documented in COVERAGE.md §2.5. The rank runs over the "
    "PER-USER count table (|users| rows, not |events|); at warehouse "
    "scale the same result comes from a percentile threshold instead "
    "of a full rank.",
)
def events_pareto_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_ev"))
    w = Window.orderBy(F.desc("n_ev"), F.asc("user_id"))
    ranked = per_user.select(
        "n_ev",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n_users"),
        F.sum("n_ev").over(Window.partitionBy()).alias("n_events"),
    )
    top_k = F.ceil(F.col("n_users") / F.lit(100.0))
    return ranked.agg(
        F.any_value("n_users").cast("long").alias("n_users"),
        F.any_value("n_events").cast("long").alias("n_events"),
        F.ceil(F.any_value("n_users") / F.lit(100.0))
        .cast("long")
        .alias("top1pct_users"),
        _r(
            F.sum(F.when(F.col("rn") <= top_k, F.col("n_ev")).otherwise(0))
            / F.any_value("n_events")
        ).alias("top1pct_share"),
    )
