"""Mergeable-sketch aggregates (Apache DataSketches HLL, Spark 3.5+).

The 100 TB pattern: COUNT(DISTINCT) re-shuffles raw keys for every
grouping level — the single most expensive aggregate in a rollup
hierarchy. A mergeable sketch is aggregated ONCE at the finest grain;
every coarser level is a cheap union of tiny binary sketches (bytes, not
keys), which is also what makes incremental/continuous rollups possible:
yesterday's sketches merge with today's without touching yesterday's
rows. sketch-of-union == union-of-sketches is proven exactly in
tests/test_sketches.py, alongside a <5% relative-error bound against the
exact distinct count.

Rows-only driver check: DuckDB's approx_distinct uses a different sketch
implementation, so estimates are engine-specific by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.plans.catalog import register
from economic_data_etl_spark.sources.tables import load_table


def per_type_user_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Finest-grain sketch table: one HLL of user_id per event_type."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )


@register(
    "sketch_hll_distinct_rollup",
    oracle=None,
    doc="Distinct users per event_type AND overall from ONE pass of "
    "sketching: per-type HLL sketches (hll_sketch_agg), overall = "
    "hll_union_agg over the per-type sketches — the raw user_id keys "
    "are never re-shuffled for the coarser level. Rows-only check "
    "(estimates are sketch-implementation-specific); merge-exactness "
    "and <5% error vs exact are pinned in tests/test_sketches.py.",
)
def sketch_hll_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    sketches = per_type_user_sketches(spark, sf_dir)
    per_type = sketches.select(
        "event_type",
        F.hll_sketch_estimate("sk").alias("approx_users"),
    )
    overall = sketches.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("ALL").alias("event_type"),
        F.hll_sketch_estimate("sk").alias("approx_users"),
    )
    return per_type.unionByName(overall).orderBy("event_type")


# --------------------------------------------------------------------------
# Exact heavy hitters via Misra-Gries candidate pruning.
# --------------------------------------------------------------------------
_HH_K = 1000  # threshold n/k: above-average bigrams over the ~930-bigram vocab


@register(
    "sketch_heavy_hitters_bigrams",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '[ \\t\\n\\r]+'),
                             x -> x <> '') AS w
          FROM documents
        ), g0 AS (
          SELECT doc_id, w,
                 unnest(CASE WHEN len(w) >= 2
                             THEN generate_series(1, len(w) - 1)
                             ELSE [] END) AS i
          FROM toks
        ), bg AS (
          SELECT array_to_string(w[i:i+1], ' ') AS bigram FROM g0
        ), tot AS (SELECT COUNT(*) AS n FROM bg),
        cnt AS (SELECT bigram, COUNT(*) AS c FROM bg GROUP BY bigram)
        SELECT bigram, CAST(c AS BIGINT) AS freq
        FROM cnt, tot
        WHERE c * {_HH_K} > n
        ORDER BY freq DESC, bigram
    """,
    doc=f"EXACT heavy hitters (bigram freq > n/{_HH_K}) by Misra-Gries "
    "candidate pruning + exact recount (operators/heavyhitters.py): one "
    "scan emits a bounded (<= k rows/partition) MG summary whose "
    "pigeonhole guarantee provably contains every true heavy hitter, a "
    "broadcast semi-join recounts only candidates — so the output is "
    "exact and SQL-checkable, while the shuffle never carries the full "
    "frequency table. Completes the sketch family next to the HLL "
    "rollup.",
)
def sketch_heavy_hitters_bigrams(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from economic_data_etl_spark.operators.heavyhitters import (
        heavy_hitters_exact,
    )
    from economic_data_etl_spark.operators.substring import (
        kgram_occurrences,
    )

    docs = load_table(spark, sf_dir, "documents")
    bigrams = kgram_occurrences(docs, "doc_id", "text", 2).select(
        F.col("gram").alias("bigram")
    )
    return heavy_hitters_exact(bigrams, "bigram", _HH_K).orderBy(
        F.desc("freq"), "bigram"
    )


# --------------------------------------------------------------------------
# Mergeable Misra-Gries certificate (the streaming heavy-hitters sink's
# math, driver-checkable).
# --------------------------------------------------------------------------
_MG_K = 30  # threshold n/30
_MG_BATCHES = 4


@register(
    "inv_mg_mergeable_bounds",
    oracle=f"""
        WITH items AS (
          SELECT CASE WHEN event_id % 2 = 0
                      THEN 'h' || CAST(event_id % 24 AS VARCHAR)
                      ELSE 's' || CAST(event_id AS VARCHAR) END AS item
          FROM events
        ), tot AS (SELECT COUNT(*) AS n FROM items),
        cnt AS (SELECT item, COUNT(*) AS c FROM items GROUP BY item)
        SELECT item, CAST(c AS BIGINT) AS freq,
               TRUE AS present, TRUE AS bounds_ok
        FROM cnt, tot
        WHERE c * {_MG_K} > n
        ORDER BY item
    """,
    doc="Mergeable Misra-Gries certificate (the streaming "
    "heavy-hitters sink's math — streaming/heavyhitters.py): a "
    "deterministic skewed item stream derived from event_id (12 heavy "
    "items h0..h22 at ~n/24 each, n/2 singletons — scale-free, so real "
    f"summary trims happen at every SF) is folded in {_MG_BATCHES} "
    "batches through per-partition bounded MG summaries and the "
    "weighted driver merge at capacity 2k+1. For every TRUE heavy "
    f"hitter (freq * {_MG_K} > n, recomputed exactly by both engines) "
    "the certificate emits present (the item survived every trim — "
    "the mergeability guarantee, err <= n/(k+1) < n/k) and bounds_ok "
    "(stored weight <= freq <= weight + err). Expected constant TRUE; "
    "any breach flips the driver's value hash.",
)
def inv_mg_mergeable_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.operators.heavyhitters import mg_summaries
    from economic_data_etl_spark.streaming.heavyhitters import _mg_merge

    cap = 2 * _MG_K + 1
    ev = load_table(spark, sf_dir, "events")
    items = ev.select(
        F.col("event_id"),
        F.when(
            F.col("event_id") % 2 == 0,
            F.concat(F.lit("h"), (F.col("event_id") % 24).cast("string")),
        )
        .otherwise(
            F.concat(F.lit("s"), F.col("event_id").cast("string"))
        )
        .alias("item"),
    )
    # fold in batches (event_id % _MG_BATCHES) through the mergeable
    # summary — each collect is <= cap x partitions rows (k-bounded,
    # never stream-bounded), mirroring the streaming sink exactly
    counters: dict[str, int] = {}
    n_total, err = 0, 0
    for b in range(_MG_BATCHES):
        batch = items.filter(F.col("event_id") % _MG_BATCHES == b)
        bc: dict[str, int] = {}
        bn = 0
        for r in mg_summaries(batch, "item", cap).collect():
            if r.is_count:
                bn += r.weight
            else:
                bc[r.item] = bc.get(r.item, 0) + r.weight
        counters, m = _mg_merge(counters, bc, cap)
        err += m + bn // (cap + 1)
        n_total += bn
    # exact frequencies (distributed groupBy) restricted to true hitters
    freq = (
        items.groupBy("item")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") * _MG_K > F.lit(n_total))
    )
    # counters is <= cap entries: broadcast-join the summary weights
    w_df = spark.createDataFrame(
        [(t, w) for t, w in counters.items()] or [(None, None)],
        "item string, w long",
    ).filter(F.col("item").isNotNull())
    return (
        freq.join(F.broadcast(w_df), "item", "left")
        .select(
            "item",
            "freq",
            F.col("w").isNotNull().alias("present"),
            (
                F.col("w").isNotNull()
                & (F.col("w") <= F.col("freq"))
                & (F.col("freq") <= F.col("w") + F.lit(err))
            ).alias("bounds_ok"),
        )
        .orderBy("item")
    )


# --------------------------------------------------------------------------
# Count-Min Sketch: point-frequency estimates, fully SQL-replayable.
# --------------------------------------------------------------------------
_CMS_DEPTH, _CMS_WIDTH = 3, 1024


@register(
    "sketch_cms_frequency",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '[ \\t\\n\\r]+'),
                             x -> x <> '') AS w
          FROM documents
        ), g0 AS (
          SELECT doc_id, w,
                 unnest(CASE WHEN len(w) >= 2
                             THEN generate_series(1, len(w) - 1)
                             ELSE [] END) AS i
          FROM toks
        ), bg AS (
          SELECT array_to_string(w[i:i+1], ' ') AS bigram FROM g0
        ), rws AS (
          SELECT unnest(generate_series(0, {_CMS_DEPTH - 1})) AS rw
        ), h AS (
          SELECT r.rw,
                 CAST(('0x' || substr(md5(CAST(r.rw AS VARCHAR) || ':'
                       || bg.bigram), 1, 8)) AS BIGINT)
                     % {_CMS_WIDTH} AS bucket
          FROM bg CROSS JOIN rws r
        ), sk AS (
          SELECT rw, bucket, COUNT(*) AS cnt FROM h GROUP BY rw, bucket
        ), q AS (
          SELECT DISTINCT bigram FROM bg
        ), qh AS (
          SELECT q.bigram, r.rw,
                 CAST(('0x' || substr(md5(CAST(r.rw AS VARCHAR) || ':'
                       || q.bigram), 1, 8)) AS BIGINT)
                     % {_CMS_WIDTH} AS bucket
          FROM q CROSS JOIN rws r
        ), est AS (
          SELECT bigram, MIN(COALESCE(sk.cnt, 0)) AS est
          FROM qh LEFT JOIN sk USING (rw, bucket)
          GROUP BY bigram
        ), cnt AS (
          SELECT bigram, COUNT(*) AS freq FROM bg GROUP BY bigram
        )
        SELECT c.bigram,
               CAST(c.freq AS BIGINT) AS freq,
               CAST(e.est AS BIGINT) AS est,
               TRUE AS no_undercount
        FROM cnt c JOIN est e USING (bigram)
        ORDER BY bigram
    """,
    doc=f"Count-Min Sketch ({_CMS_DEPTH} md5 hash rows x {_CMS_WIDTH} "
    "buckets, operators/cms.py) built over the corpus bigram stream; "
    "every distinct bigram is then point-queried against the sketch "
    "next to its exact count. The md5 bucketing is the repo's standard "
    "cross-engine hash, so DuckDB replays the ENTIRE build and every "
    "estimate — est is a full value check, and no_undercount pins the "
    "sketch's deterministic one-sided guarantee (est >= freq always; "
    "counts only add, every occurrence lands in its bucket in every "
    "row). Sketch size is depth x width regardless of corpus size and "
    "sketches ADD across partitions/days (linearity pinned in "
    "tests/test_cms.py).",
)
def sketch_cms_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.operators.cms import (
        cms_build,
        cms_estimate,
    )
    from economic_data_etl_spark.operators.substring import (
        kgram_occurrences,
    )

    docs = load_table(spark, sf_dir, "documents")
    bigrams = kgram_occurrences(docs, "doc_id", "text", 2).select(
        F.col("gram").alias("bigram")
    )
    sketch = cms_build(bigrams, "bigram", _CMS_DEPTH, _CMS_WIDTH)
    freq = bigrams.groupBy("bigram").agg(
        F.count(F.lit(1)).alias("freq")
    )
    est = cms_estimate(
        sketch, bigrams, "bigram", _CMS_DEPTH, _CMS_WIDTH
    ).withColumnRenamed("item", "bigram")
    return (
        freq.join(est, "bigram")
        .select(
            "bigram",
            "freq",
            "est",
            (F.col("est") >= F.col("freq")).alias("no_undercount"),
        )
        .orderBy("bigram")
    )


@register(
    "sketch_cms_join_size",
    oracle=f"""
        WITH keys AS (
          SELECT CAST(l_partkey AS VARCHAR) AS k FROM lineitem
        ), rws AS (
          SELECT unnest(generate_series(0, {_CMS_DEPTH - 1})) AS rw
        ), h AS (
          SELECT r.rw,
                 CAST(('0x' || substr(md5(CAST(r.rw AS VARCHAR) || ':'
                       || keys.k), 1, 8)) AS BIGINT)
                     % {_CMS_WIDTH} AS bucket
          FROM keys CROSS JOIN rws r
        ), sk AS (
          SELECT rw, bucket, COUNT(*) AS cnt FROM h GROUP BY rw, bucket
        ), ip AS (
          SELECT rw, SUM(cnt * cnt) AS ip FROM sk GROUP BY rw
        ), ex AS (
          SELECT SUM(c * c) AS exact
          FROM (SELECT COUNT(*) AS c FROM keys GROUP BY k)
        )
        SELECT CAST(exact AS BIGINT) AS exact_join_size,
               CAST((SELECT MIN(ip) FROM ip) AS BIGINT)
                   AS est_join_size,
               TRUE AS no_undercount
        FROM ex
    """,
    doc="Join-cardinality estimation from sketches (Cormode/"
    "Muthukrishnan — the optimizer's use of CMS): the self-join size "
    "of lineitem on l_partkey (= the second frequency moment "
    "sum f(k)², the quantity a planner needs to size a skewed join's "
    "output) estimated as min over hash rows of the bucket-wise "
    "inner product of the sketch with itself — collisions only add "
    "non-negative cross terms, so the estimate NEVER undercounts "
    "(deterministic one-sided bound, pinned as the constant-TRUE "
    "verdict). Exact value and estimate are both replayed in SQL; two "
    "constant-size summaries answer what would otherwise need a "
    "corpus-wide groupBy.",
)
def sketch_cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.operators.cms import (
        cms_build,
        cms_join_size_estimate,
    )

    keys = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("string").alias("k")
    )
    sketch = cms_build(keys, "k", _CMS_DEPTH, _CMS_WIDTH)
    est = cms_join_size_estimate(sketch, sketch)
    exact = (
        keys.groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).alias("exact_join_size"))
    )
    return exact.crossJoin(F.broadcast(est)).select(
        F.col("exact_join_size").cast("long"),
        F.col("est_join_size").cast("long"),
        (F.col("est_join_size") >= F.col("exact_join_size")).alias(
            "no_undercount"
        ),
    )


# --------------------------------------------------------------------------
# From-scratch deterministic compactor quantile sketch (operators/kll.py).
# --------------------------------------------------------------------------
_KLL_QS = (0.01, 0.25, 0.5, 0.75, 0.99)


@register(
    "sketch_kll_quantiles",
    oracle=None,  # estimates are sketch-specific; certified by
    # inv_kll_rank_error (measured rank error vs the sketch's own bound)
    doc="Quantiles of the event-value stream from the from-scratch "
    "deterministic compactor sketch (MRL-family, operators/kll.py): "
    "one mapInPandas pass builds per-partition sketches, one "
    "summary-sized merge task folds them, and the quantile read-out "
    "runs over O(k log(n/k)) rows. The sketch reports its own "
    "worst-case rank-error bound (sum of 2^level per compaction) and "
    "conserves total weight exactly. The mergeable alternative to "
    "exact percentile_cont when the column won't fit a sort at 100 TB.",
)
def sketch_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.operators.kll import (
        kll_quantiles,
        kll_sketch,
    )

    ev = load_table(spark, sf_dir, "events")
    # summary-sized collect: O(k log(n/k)) rows regardless of data size
    pdf = kll_sketch(ev, "value").toPandas()
    rows = kll_quantiles(pdf, list(_KLL_QS))
    return spark.createDataFrame(
        rows, "q double, est double, n long, err_bound long"
    ).orderBy("q")


@register(
    "inv_kll_rank_error",
    oracle="""
        SELECT CAST(q AS DOUBLE) AS q, CAST(ok AS INT) AS within_bound
        FROM (VALUES (-1.0, 1), (0.01, 1), (0.25, 1), (0.5, 1),
                     (0.75, 1), (0.99, 1)) t(q, ok)
        ORDER BY q
    """,
    doc="Certificate for the compactor quantile sketch: for every "
    "reported quantile, the MEASURED rank error |true_rank(est) - q*n| "
    "must lie within the sketch's self-reported bound plus one "
    "top-level weight of read-out discretization; the q = -1 row "
    "certifies exact total-weight conservation (sketch weight == "
    "row count). The oracle is the constant all-TRUE table, so any "
    "bound violation at sf0.01 fails the driver's value hash.",
)
def inv_kll_rank_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.operators.kll import (
        kll_quantiles,
        kll_sketch,
    )

    ev = load_table(spark, sf_dir, "events")
    pdf = kll_sketch(ev, "value").toPandas()  # summary-sized
    res = kll_quantiles(pdf, list(_KLL_QS))
    total, bound = res[0][2], res[0][3]
    item_levels = pdf.loc[pdf["level"] >= 0, "level"]
    # empty input: no items, no compactions — every check is trivially
    # true with unit read-out granularity
    w_max = 1 << int(item_levels.max()) if len(item_levels) else 1
    # ONE exact pass measures every true rank (conditional aggregates).
    # The conservation count matches the sketch's stated contract —
    # NULL and NaN values are dropped before sketching — so it counts
    # exactly the sketched rows, not COUNT(*): on data with NULLs the
    # raw row count would falsely fail the certificate.
    aggs = [
        F.sum((F.col("value") <= float(est)).cast("long")).alias(f"r{i}")
        for i, (_, est, _, _) in enumerate(res)
    ] + [
        F.sum(
            (F.col("value").isNotNull() & ~F.isnan("value")).cast("long")
        ).alias("n_rows")
    ]
    row = ev.agg(*aggs).collect()[0]
    out = [(-1.0, int(total == (row["n_rows"] or 0)))]
    for i, (q, _, _, _) in enumerate(res):
        # SUM over zero rows is NULL: an empty table has rank 0
        err = abs((row[f"r{i}"] or 0) - q * total)
        out.append((q, int(err <= bound + w_max + 1)))
    return spark.createDataFrame(
        out, "q double, within_bound int"
    ).orderBy("q")
