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


# ---------------------------------------------------------------------------
# PMI collocations

_PMI_MIN = 5
_PMI_TOPK = 20


@register(
    "text_pmi_collocations",
    oracle=f"""
    WITH toks AS (
        SELECT list_filter(string_split_regex(lower(text),
                   '[ \\t\\n\\r]+'), x -> x <> '') AS w
        FROM documents
    ), uni AS (
        SELECT unnest(w) AS t FROM toks
    ), ucnt AS (
        SELECT t, COUNT(*) AS c FROM uni GROUP BY t
    ), un AS (SELECT SUM(c) AS n FROM ucnt
    ), bg AS (
        SELECT w[i] AS a, w[i + 1] AS b
        FROM (SELECT * FROM toks WHERE len(w) >= 2),
             UNNEST(range(1, len(w))) AS t(ii),
             LATERAL (SELECT CAST(ii AS INTEGER) AS i)
    ), bcnt AS (
        SELECT a, b, COUNT(*) AS cab FROM bg GROUP BY a, b
    ), bn AS (SELECT SUM(cab) AS nb FROM bcnt
    ), pmi AS (
        SELECT x.a, x.b, x.cab,
               ROUND(5e-10 + LN((x.cab * 1.0 / (SELECT nb FROM bn))
                     / ((ca.c * 1.0 / (SELECT n FROM un))
                        * (cb.c * 1.0 / (SELECT n FROM un)))),
                     4) AS pmi
        FROM bcnt x
        JOIN ucnt ca ON ca.t = x.a
        JOIN ucnt cb ON cb.t = x.b
        WHERE x.cab >= {_PMI_MIN}
    )
    SELECT rank, a, b, cab, pmi FROM (
        SELECT *, ROW_NUMBER() OVER (
            ORDER BY pmi DESC, a, b) AS rank
        FROM pmi
    ) WHERE rank <= {_PMI_TOPK} ORDER BY rank
    """,
    doc=f"PMI collocation mining (count floor {_PMI_MIN}, top-"
    f"{_PMI_TOPK}): pointwise mutual information ln(p(ab) / "
    "(p(a)p(b))) over adjacent-bigram and unigram counts — the "
    "classic collocation statistic (Church & Hanks 1990). Both count "
    "tables are ONE map-side-combinable groupBy each (vocab- and "
    "vocab^2-bounded outputs); bigrams come from in-row adjacent "
    "pairs (no self-join); the count floor is an integer gate and the "
    "top-k binds on the biased-rounded PMI with (a, b) tie-breaks, "
    "compiling to TakeOrderedAndProject.",
)
def text_pmi_collocations(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(F.lower(F.col("text")).alias("lt"))
        .select(
            F.filter(
                F.split(F.col("lt"), WORD_SPLIT_RE), lambda t: t != ""
            ).alias("w")
        )
        .localCheckpoint(eager=False)  # unigram + bigram consumers
    )
    ucnt = (
        toks.select(F.explode("w").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)  # two joins + total
    )
    un = ucnt.agg(F.sum("c").alias("n"))
    w = F.col("w")
    bigr = F.transform(
        F.sequence(F.lit(1), F.size(w) - 1),
        lambda i: F.struct(
            F.element_at(w, i.cast("int")).alias("a"),
            F.element_at(w, (i + 1).cast("int")).alias("b"),
        ),
    )
    bcnt = (
        toks.filter(F.size("w") >= 2)
        .select(F.explode(bigr).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("cab"))
        .localCheckpoint(eager=False)
    )
    # the bigram-mass normalizer sums ALL bigrams — computed BEFORE
    # the count floor (the floor gates candidates, not probability)
    bn = bcnt.agg(F.sum("cab").alias("nb"))
    bcnt = bcnt.filter(F.col("cab") >= _PMI_MIN)
    ca = ucnt.select(F.col("t").alias("a"), F.col("c").alias("c_a"))
    cb = ucnt.select(F.col("t").alias("b"), F.col("c").alias("c_b"))
    pmi_val = F.log(
        (F.col("cab") * F.lit(1.0) / F.col("nb"))
        / (
            (F.col("c_a") * F.lit(1.0) / F.col("n"))
            * (F.col("c_b") * F.lit(1.0) / F.col("n"))
        )
    )
    scored = (
        bcnt.join(F.broadcast(ca), "a")
        .join(F.broadcast(cb), "b")
        .crossJoin(F.broadcast(un))
        .crossJoin(F.broadcast(bn))
        .select("a", "b", "cab", biased_round(pmi_val).alias("pmi"))
    )
    rank = F.row_number().over(
        Window.orderBy(F.desc("pmi"), F.asc("a"), F.asc("b"))
    )
    return (
        scored.withColumn("rank", rank)
        .filter(F.col("rank") <= _PMI_TOPK)
        .select("rank", "a", "b", "cab", "pmi")
        .orderBy("rank")
    )
