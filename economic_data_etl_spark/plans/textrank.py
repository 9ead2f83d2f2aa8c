"""TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004).

Keywords by weighted PageRank over the word co-occurrence graph: an
undirected edge {a, b} for every pair of distinct words within a
+/-2-token window, weighted by co-occurrence count, iterated

    s_i = (1 - d) + d * sum_{j in adj(i)} (w_ij / strength_j) * s_j

for a fixed 4 rounds (derandomized-iteration house rule: a fixed
round count the oracle unrolls as CTE stages, like
crawl_labelprop_communities).

Scale shape: pair generation is ONE in-row pass per document (the
window pairs come from O(1) element_at probes on the materialized
token array — no self-join) followed by a single (a, b) groupBy whose
output is VOCAB^2-bounded, never corpus-bounded; the iteration then
joins rank vectors against that bounded edge table (lazily
checkpointed so the corpus pair pass runs once, not once per round).
With a corpus-scale vocabulary the same top-K prune as lmppl.py caps
the graph; at the fixture vocab the full graph is tiny.

Determinism: weights are integers; per-round contribution sums are
float adds in engine order (the accepted repo-wide exposure), and the
only row-set gate — the top-10 cut — binds on the BIASED-ROUNDED score
with a word-asc tie-break on both engines (rounded-gate rule).

Reference parity: none (no text analytics in the reference); extends
the text lane next to text_tfidf_terms (frequency salience) with
graph salience, reusing the link-lane iteration discipline
(operators/pagerank.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from economic_data_etl_spark.functions.text import WORD_SPLIT_RE
from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.sources.tables import load_table

_D = 0.85
_ITERS = 4
_TOPK = 10

_TR_SCORE = "0.15 + 0.85 * SUM((d.wt / st.st) * s.sc)"

_ITER_CTE = """
    , it{k} AS (
        SELECT d.dst AS node, {score} AS sc
        FROM dir d
        JOIN str st ON st.src = d.src
        JOIN it{p} s ON s.node = d.src
        GROUP BY d.dst
    )"""

_TR_ORACLE = (
    """
    WITH toks AS (
        SELECT list_filter(string_split_regex(lower(text),
                   '[ \\t\\n\\r]+'), x -> x <> '') AS w
        FROM documents
    ), pairs AS (
        SELECT CASE WHEN w[i] < w[j] THEN w[i] ELSE w[j] END AS a,
               CASE WHEN w[i] < w[j] THEN w[j] ELSE w[i] END AS b
        FROM (SELECT * FROM toks WHERE len(w) >= 2),
             UNNEST(range(1, len(w) + 1)) AS t(ii),
             LATERAL (SELECT CAST(ii AS INTEGER) AS i),
             UNNEST([i + 1, i + 2]) AS u(jj),
             LATERAL (SELECT CAST(jj AS INTEGER) AS j)
        WHERE j <= len(w) AND w[i] <> w[j]
    ), und AS (
        SELECT a, b, COUNT(*) AS wt FROM pairs GROUP BY a, b
    ), dir AS (
        SELECT a AS src, b AS dst, wt FROM und
        UNION ALL
        SELECT b AS src, a AS dst, wt FROM und
    ), str AS (
        SELECT src, SUM(wt) AS st FROM dir GROUP BY src
    ), it0 AS (
        SELECT src AS node, 1.0 AS sc FROM str
    )"""
    + "".join(
        _ITER_CTE.format(k=k, p=k - 1, score=_TR_SCORE)
        for k in range(1, _ITERS + 1)
    )
    + f"""
    SELECT rank, word, score FROM (
        SELECT node AS word,
               ROUND(5e-10 + sc, 4) AS score,
               ROW_NUMBER() OVER (
                   ORDER BY ROUND(5e-10 + sc, 4) DESC, node ASC
               ) AS rank
        FROM it{_ITERS}
    ) WHERE rank <= {_TOPK}
    ORDER BY rank
"""
)


def cooccurrence_edges(docs: DataFrame) -> DataFrame:
    """Undirected (a, b, wt) word co-occurrence edges within a
    +/-2-token window: one in-row pair pass per doc (element_at probes
    on the materialized token array), one vocab^2-bounded groupBy."""
    toks = (
        docs.select(F.lower(F.col("text")).alias("lt"))
        .select(
            F.filter(
                F.split(F.col("lt"), WORD_SPLIT_RE), lambda t: t != ""
            ).alias("w")
        )
        .filter(F.size("w") >= 2)
    )
    w = F.col("w")
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size(w)),
            lambda i: F.filter(
                F.transform(
                    F.array(i + 1, i + 2),
                    lambda j: F.when(
                        (j <= F.size(w))
                        & (
                            F.element_at(w, i.cast("int"))
                            != F.element_at(w, j.cast("int"))
                        ),
                        F.struct(
                            F.least(
                                F.element_at(w, i.cast("int")),
                                F.element_at(w, j.cast("int")),
                            ).alias("a"),
                            F.greatest(
                                F.element_at(w, i.cast("int")),
                                F.element_at(w, j.cast("int")),
                            ).alias("b"),
                        ),
                    ),
                ),
                lambda s: s.isNotNull(),
            ),
        )
    )
    return (
        toks.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("wt"))
    )


def textrank_scores(
    und: DataFrame, iters: int = _ITERS, d: float = _D
) -> DataFrame:
    """(node, sc) after `iters` weighted-PageRank rounds over the
    undirected weighted edge table. Bounded-table iteration: the edge
    substrate is checkpointed once; each round shuffles only the rank
    vector."""
    und = und.localCheckpoint(eager=False)
    dirs = (
        und.select(
            F.col("a").alias("src"), F.col("b").alias("dst"), "wt"
        )
        .unionAll(
            und.select(
                F.col("b").alias("src"), F.col("a").alias("dst"), "wt"
            )
        )
        .localCheckpoint(eager=False)
    )
    strength = dirs.groupBy("src").agg(
        F.sum("wt").alias("st")
    ).localCheckpoint(eager=False)
    scores = strength.select(
        F.col("src").alias("node"), F.lit(1.0).alias("sc")
    )
    for _ in range(iters):
        scores = (
            dirs.join(strength, "src")
            .join(
                scores.withColumnRenamed("node", "src"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(
                (
                    F.lit(1.0 - d)
                    + F.lit(d)
                    * F.sum(
                        (F.col("wt") / F.col("st")) * F.col("sc")
                    )
                ).alias("sc")
            )
        )
    return scores


@register(
    "text_textrank_keywords",
    oracle=_TR_ORACLE,
    doc="TextRank keyword extraction: weighted PageRank (d=0.85, 4 "
    "derandomized rounds) over the +/-2-window word co-occurrence "
    "graph. Pair generation is one in-row pass per document; the "
    "(a, b) groupBy output is vocab^2-bounded, and the iteration "
    "joins rank vectors against that bounded substrate (checkpointed "
    "once — the corpus pair pass never re-runs per round). Top-10 "
    "binds on the biased-rounded score with word-asc tie-break; the "
    "oracle unrolls all 4 rounds as CTE stages.",
)
def text_textrank_keywords(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scores = textrank_scores(cooccurrence_edges(docs))
    rank = F.row_number().over(
        Window.orderBy(
            F.col("score").desc(), F.col("word").asc()
        )
    )
    return (
        scores.select(
            F.col("node").alias("word"),
            biased_round(F.col("sc")).alias("score"),
        )
        .withColumn("rank", rank)
        .filter(F.col("rank") <= _TOPK)
        .select("rank", "word", "score")
        .orderBy("rank")
    )
