"""Text-analysis and deduplication queries over `documents`.

The LLM-training-data-pipeline surface (SURVEY.md §2.11 extension): exact
dedup, n-gram Jaccard near-dedup (exact, oracle-checked), MinHash-LSH and
SimHash near-dedup (hash-based, rows-only checks), quality scoring,
lang-id heuristic, token counting, fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.functions import text as T
from economic_data_etl_spark.operators import dedup
from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# Exact dedup stats.
# --------------------------------------------------------------------------
@register(
    "dedup_exact_documents",
    oracle="""
        SELECT source,
               COUNT(*) AS n_docs,
               COUNT(DISTINCT text) AS n_distinct,
               CAST(COUNT(*) - COUNT(DISTINCT text) AS BIGINT) AS n_dups
        FROM documents
        GROUP BY source
        ORDER BY source
    """,
    doc="Exact dedup accounting per source (hash-groupBy, no payload sort).",
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("text").alias("n_distinct"),
            (F.count(F.lit(1)) - F.countDistinct("text")).alias("n_dups"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Exact n-gram Jaccard near-dedup (inverted-index join; oracle-checked).
# --------------------------------------------------------------------------
_JACCARD_ORACLE = r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
        FROM documents
    ), sh AS (
        SELECT doc_id,
               list_distinct(
                   CASE WHEN len(w) >= 3
                        THEN list_transform(
                            generate_series(1, len(w) - 2),
                            i -> concat_ws(' ', w[i], w[i+1], w[i+2]))
                        ELSE [array_to_string(w, ' ')]
                   END) AS shingles
        FROM toks
    ), inv AS (
        SELECT doc_id, unnest(shingles) AS shingle FROM sh
    ), sizes AS (
        SELECT doc_id, len(shingles) AS n_sh FROM sh
    ), inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(5e-10 + inter * 1.0 / (sa.n_sh + sb.n_sh - inter), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE inter * 1.0 / (sa.n_sh + sb.n_sh - inter) >= 0.8
    ORDER BY id_a, id_b
"""


@register(
    "dedup_ngram_jaccard",
    oracle=_JACCARD_ORACLE,
    doc="3-word-shingle Jaccard >= 0.8 pairs, exact, via prefix-filtered "
    "set-similarity join (PPJoin-style): only each doc's rarest "
    "|d|-⌈0.8|d|⌉+1 shingles enter the inverted index, candidates verify "
    "with array_intersect. Output proven identical to the naive "
    "inverted-index join (tests/test_dedup_quality.py).",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.jaccard_similar_pairs_prefix(
        docs, "doc_id", "text", n=3, threshold=0.8
    ).orderBy("id_a", "id_b")


@register(
    "features_hashed_tf",
    oracle=None,
    doc="Hashing-trick term frequencies (operators/features.py): sparse "
    "map of xxhash64(token) mod 2^12 buckets per document, no fitted "
    "vocabulary, two shuffles. Rows-only check (hash is Spark-"
    "specific); conservation — bucket counts sum to the exact "
    "whitespace token count — is pinned in tests/test_features.py.",
)
def features_hashed_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.operators.features import hashed_tf

    docs = load_table(spark, sf_dir, "documents")
    feats = hashed_tf(docs, "doc_id", "text", dim=1 << 12)
    return feats.select(
        "doc_id",
        F.size("features").alias("n_buckets"),
        "n_tokens",
    ).orderBy("doc_id")


_COMPONENTS_ORACLE = r"""
    WITH RECURSIVE toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
        FROM documents
    ), sh AS (
        SELECT doc_id,
               list_distinct(
                   CASE WHEN len(w) >= 3
                        THEN list_transform(
                            generate_series(1, len(w) - 2),
                            i -> concat_ws(' ', w[i], w[i+1], w[i+2]))
                        ELSE [array_to_string(w, ' ')]
                   END) AS shingles
        FROM toks
    ), inv AS (
        SELECT doc_id, unnest(shingles) AS shingle FROM sh
    ), sizes AS (
        SELECT doc_id, len(shingles) AS n_sh FROM sh
    ), inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), pairs AS (
        SELECT id_a, id_b
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE inter * 1.0 / (sa.n_sh + sb.n_sh - inter) >= 0.8
    ), edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ), nodes AS (
        SELECT DISTINCT u AS node FROM edges
    ), reach(node, lab) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.u, r.lab FROM edges e JOIN reach r ON r.node = e.v
    )
    SELECT node AS doc_id, CAST(MIN(lab) AS BIGINT) AS component
    FROM reach
    GROUP BY node
    ORDER BY doc_id
"""


@register(
    "dedup_cluster_components",
    oracle=_COMPONENTS_ORACLE,
    doc="Near-dup CLUSTERS, not just pairs: connected components over "
    "Jaccard >= 0.8 edges (operators/components.py, iterative min-label "
    "propagation with per-round lineage truncation). component = min "
    "reachable doc_id, i.e. the canonical survivor of each duplicate "
    "group. The DuckDB oracle computes the identical transitive closure "
    "with WITH RECURSIVE — an exact cross-engine check of an iterative "
    "graph algorithm.",
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.operators.components import (
        connected_components,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.jaccard_similar_pairs_prefix(
        docs, "doc_id", "text", n=3, threshold=0.8
    )
    return (
        connected_components(pairs, "id_a", "id_b")
        .select(F.col("node").alias("doc_id"), "component")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# MinHash-LSH near-dedup (rows-only: hash family not SQL-portable).
# --------------------------------------------------------------------------
@register(
    "dedup_minhash_lsh",
    oracle=None,
    doc="MinHash(32 perms) + LSH(8 bands x 4 rows) candidates, est. Jaccard "
    ">= 0.5 (band threshold (1/8)^(1/4) ~= 0.59; a 0.9-jaccard near-dup "
    "escapes all 8 bands with p ~= 3e-8). Per-row signatures, bucket join.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_dedup_pairs(
        docs, "doc_id", "text", num_perm=32, bands=8, threshold=0.5
    ).orderBy("id_a", "id_b")


# --------------------------------------------------------------------------
# SimHash near-dedup (rows-only).
# --------------------------------------------------------------------------
@register(
    "dedup_simhash",
    oracle=None,
    doc="64-bit SimHash; 4x16-bit banded candidate join finds ALL pairs with "
    "hamming <= 3 (pigeonhole), exact hamming filter on candidates only.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        dedup.simhash_candidate_pairs(docs, "doc_id", "text", chunks=4)
        .filter(F.col("hamming") <= 3)
        .orderBy("id_a", "id_b")
    )


# --------------------------------------------------------------------------
# Text quality metrics (oracle replicates the formula term-for-term).
# --------------------------------------------------------------------------
@register(
    "text_quality_metrics",
    oracle=r"""
        WITH toks AS (
            SELECT doc_id, text,
                   list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
            FROM documents
        ), m AS (
            SELECT doc_id,
                   len(w) AS n_tokens,
                   len(list_distinct(w)) AS n_distinct_tokens,
                   CASE WHEN len(w) > 0
                        THEN len(list_filter(w, x -> x IN ('a', 'the'))) * 1.0 / len(w)
                        ELSE 0.0 END AS sw_ratio,
                   CASE WHEN length(text) > 0
                        THEN length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) * 1.0 / length(text)
                        ELSE 0.0 END AS p_ratio,
                   CASE WHEN len(w) > 0
                        THEN len(list_distinct(w)) * 1.0 / len(w) ELSE 0.0 END AS diversity,
                   LEAST(len(w) / 100.0, 1.0) AS length_term
            FROM toks
        )
        SELECT doc_id,
               CAST(n_tokens AS INT) AS n_tokens,
               CAST(n_distinct_tokens AS INT) AS n_distinct_tokens,
               ROUND(5e-10 + sw_ratio, 4) AS stopword_ratio,
               ROUND(5e-10 + p_ratio, 4) AS punct_ratio,
               ROUND(5e-10 + 0.5 * diversity + 0.3 * length_term + 0.2 * (1.0 - p_ratio), 4)
                   AS quality_score
        FROM m
        ORDER BY doc_id
    """,
    doc="Per-doc token counts, stopword/punct ratios, composite quality score.",
)
def text_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    return (
        docs.select(
            "doc_id",
            T.token_count(text).alias("n_tokens"),
            F.size(T.distinct_tokens(text)).alias("n_distinct_tokens"),
            biased_round(T.stopword_ratio(text)).alias("stopword_ratio"),
            biased_round(T.punct_ratio(text)).alias("punct_ratio"),
            T.quality_score(text).alias("quality_score"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Token counting: whitespace + BPE-ish regex tokenizers.
# --------------------------------------------------------------------------
@register(
    "text_token_counts",
    oracle=r"""
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
                    AS INT) AS ws_tokens,
               CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))
                    AS INT) AS bpe_tokens
        FROM documents
        ORDER BY doc_id
    """,
    doc="Whitespace vs BPE-ish regex token counts per document.",
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            T.token_count(F.col("text")).alias("ws_tokens"),
            T.bpe_token_count(F.col("text")).alias("bpe_tokens"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Language-ID heuristic (marker function words + CJK script detection).
# --------------------------------------------------------------------------
_LANG_MARKERS = {
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "y", "es"),
    "en": ("the", "a", "of", "and", "is"),
}


def _lang_oracle() -> str:
    def inlist(words):
        return ", ".join(f"'{w}'" for w in words)

    return rf"""
        WITH toks AS (
            SELECT doc_id, lang, text,
                   list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
            FROM documents
        ), scored AS (
            SELECT lang,
                   regexp_matches(text, '[\x{{4e00}}-\x{{9fff}}]') AS has_cjk,
                   len(list_filter(w, x -> x IN ({inlist(_LANG_MARKERS['de'])}))) AS sc_de,
                   len(list_filter(w, x -> x IN ({inlist(_LANG_MARKERS['fr'])}))) AS sc_fr,
                   len(list_filter(w, x -> x IN ({inlist(_LANG_MARKERS['es'])}))) AS sc_es,
                   len(list_filter(w, x -> x IN ({inlist(_LANG_MARKERS['en'])}))) AS sc_en
            FROM toks
        )
        SELECT lang,
               CASE WHEN has_cjk THEN 'zh'
                    WHEN sc_de > sc_en AND sc_de >= sc_fr AND sc_de >= sc_es THEN 'de'
                    WHEN sc_fr > sc_en AND sc_fr >= sc_es THEN 'fr'
                    WHEN sc_es > sc_en THEN 'es'
                    WHEN sc_en > 0 THEN 'en'
                    ELSE 'unknown' END AS predicted_lang,
               COUNT(*) AS n
        FROM scored
        GROUP BY 1, 2
        ORDER BY 1, 2
    """


@register(
    "text_lang_id",
    oracle=_lang_oracle(),
    doc="N-gram/marker-word language-ID heuristic; confusion counts vs the lang label.",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = T.tokens(F.col("text"))

    def score(lang: str):
        return F.size(F.filter(w, lambda t: t.isin(*_LANG_MARKERS[lang])))

    has_cjk = F.col("text").rlike("[一-鿿]")
    sc = {lang: score(lang) for lang in _LANG_MARKERS}
    predicted = (
        F.when(has_cjk, "zh")
        .when(
            (sc["de"] > sc["en"]) & (sc["de"] >= sc["fr"]) & (sc["de"] >= sc["es"]),
            "de",
        )
        .when((sc["fr"] > sc["en"]) & (sc["fr"] >= sc["es"]), "fr")
        .when(sc["es"] > sc["en"], "es")
        .when(sc["en"] > 0, "en")
        .otherwise("unknown")
    )
    return (
        docs.select("lang", predicted.alias("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "predicted_lang")
    )


# --------------------------------------------------------------------------
# Document fingerprint: rolling polynomial hash over characters
# (portable formulation: mod 1e9+7 so both engines stay in int64).
# --------------------------------------------------------------------------
@register(
    "text_fingerprint",
    oracle="""
        SELECT doc_id,
               list_reduce(
                   list_prepend(
                       CAST(0 AS BIGINT),
                       list_transform(
                           list_filter(string_split(text, ''), c -> c <> ''),
                           c -> CAST(ascii(c) AS BIGINT))),
                   (acc, x) -> (acc * 31 + x) % 1000000007
               ) AS fingerprint
        FROM documents
        ORDER BY doc_id
    """,
    doc="Order-sensitive rolling-hash fingerprint (base 31 mod 1e9+7) per doc.",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    chars = F.filter(F.split(F.col("text"), ""), lambda c: c != "")
    fp = F.aggregate(
        F.transform(chars, lambda c: F.ascii(c).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % 1000000007,
    )
    return docs.select("doc_id", fp.alias("fingerprint")).orderBy("doc_id")


@register(
    "dedup_incremental_minhash",
    oracle=None,
    doc="Incremental near-dedup of an arriving batch (source = src10) "
    "against the standing corpus's PRECOMPUTED MinHash signature index "
    "(operators/dedup.py:minhash_incremental_pairs): only the batch is "
    "signed, the corpus text is never re-read, and the banded join "
    "touches only colliding buckets — the daily-crawl-increment "
    "pattern at 100 TB. Rows-only check (hash family not SQL-"
    "portable); equivalence with full-corpus LSH on pairs touching "
    "the batch is pinned in tests/test_dedup_quality.py.",
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    standing = docs.filter(F.col("source") != "src10")
    incoming = docs.filter(F.col("source") == "src10")
    index_sigs = dedup.minhash_signatures(
        standing, "doc_id", "text", num_perm=32, shingle_n=3
    )
    return dedup.minhash_incremental_pairs(
        index_sigs, incoming, "doc_id", "text",
        num_perm=32, bands=8, threshold=0.5,
    ).orderBy("id_a", "id_b")


# --------------------------------------------------------------------------
# Canonical-representative selection per near-dup cluster.
# --------------------------------------------------------------------------
_QUALITY_SQL = r"""
    ROUND(5e-10
      + 0.5 * (CASE WHEN len(list_filter(string_split_regex(text, '\s+'),
                                         x -> x <> '')) > 0
                    THEN len(list_distinct(list_filter(
                             string_split_regex(text, '\s+'),
                             x -> x <> ''))) * 1.0
                         / len(list_filter(string_split_regex(text, '\s+'),
                                           x -> x <> ''))
                    ELSE 0.0 END)
      + 0.3 * LEAST(len(list_filter(string_split_regex(text, '\s+'),
                                    x -> x <> '')) / 100.0, 1.0)
      + 0.2 * (1.0 - CASE WHEN length(text) > 0
                          THEN length(regexp_replace(
                                   text, '[a-zA-Z0-9\s]', '', 'g'))
                               * 1.0 / length(text)
                          ELSE 0.0 END), 4)
"""


@register(
    "dedup_cluster_representatives",
    oracle=f"""
    WITH comp AS ({_COMPONENTS_ORACLE}),
    q AS (
        SELECT doc_id, {_QUALITY_SQL} AS s FROM documents
    ), scored AS (
        SELECT c.component, c.doc_id, q.s
        FROM comp c JOIN q USING (doc_id)
    ), ranked AS (
        SELECT component, doc_id, s,
               ROW_NUMBER() OVER (
                   PARTITION BY component ORDER BY s DESC, doc_id ASC
               ) AS rn
        FROM scored
    )
    SELECT component,
           CAST(MAX(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT)
               AS rep_doc_id,
           MAX(CASE WHEN rn = 1 THEN s END) AS rep_quality,
           CAST(COUNT(*) AS BIGINT) AS n_members
    FROM ranked
    GROUP BY component
    ORDER BY component
    """,
    doc="The 'which copy to keep' step near-dup dedup ends with: per "
    "connected component (Jaccard >= 0.8 closure), the canonical "
    "representative is the member with the highest quality score "
    "(ties to lowest doc_id) — quality-aware survivor selection "
    "instead of the min-id default. Composes two certified operators "
    "(components + quality_score); one window per component.",
)
def dedup_cluster_representatives(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    from economic_data_etl_spark.operators.components import (
        connected_components,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.jaccard_similar_pairs_prefix(
        docs, "doc_id", "text", n=3, threshold=0.8
    )
    comp = connected_components(pairs, "id_a", "id_b").select(
        F.col("node").alias("doc_id"), "component"
    )
    q = docs.select("doc_id", T.quality_score(F.col("text")).alias("s"))
    ranked = comp.join(q, "doc_id").withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("component").orderBy(
                F.desc("s"), F.asc("doc_id")
            )
        ),
    )
    return (
        ranked.groupBy("component")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("doc_id")))
            .cast("long")
            .alias("rep_doc_id"),
            F.max(F.when(F.col("rn") == 1, F.col("s"))).alias(
                "rep_quality"
            ),
            F.count(F.lit(1)).cast("long").alias("n_members"),
        )
        .orderBy("component")
    )
