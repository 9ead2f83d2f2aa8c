"""Data-profiling queries: the QA pass a training-data pipeline runs
before trusting a new drop — per-column completeness/cardinality/range
and value-distribution histograms.

Both are single-pass shapes: the profile is ONE aggregation whose
results unpivot via stack() (no per-column scans), and the histogram
derives bucket edges from a 1-row min/max aggregate broadcast back over
the fact scan (no collect, no second full scan of an already-filtered
slice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.plans.catalog import register
from economic_data_etl_spark.sources.tables import load_table

_PROFILE_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def _profile_oracle() -> str:
    parts = [
        f"""
        SELECT '{c}' AS col,
               COUNT({c}) AS n_filled,
               COUNT(*) - COUNT({c}) AS n_null,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_value,
               CAST(MAX({c}) AS VARCHAR) AS max_value
        FROM documents
        """
        for c in _PROFILE_COLS
    ]
    return " UNION ALL ".join(parts) + " ORDER BY col"


@register(
    "profile_documents",
    oracle=_profile_oracle(),
    doc="Per-column profile (filled/null/distinct/min/max as strings) of "
    "the documents table in ONE aggregation — 4 aggregates per column "
    "computed in a single pass, unpivoted to rows with stack(). The "
    "oracle spells the same profile as a UNION ALL of per-column "
    "aggregates.",
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"{c}__filled"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__null"),
            F.count_distinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    stack_args = ", ".join(
        f"'{c}', {c}__filled, {c}__null, {c}__distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return (
        docs.agg(*aggs)
        .select(
            F.expr(
                f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
                "(col, n_filled, n_null, n_distinct, min_value, max_value)"
            )
        )
        .orderBy("col")
    )


@register(
    "table_fingerprint_orders",
    oracle="""
        SELECT CAST(SUM(('0x' || substring(md5(
                   concat_ws('|',
                       COALESCE(CAST(o_orderkey AS VARCHAR), '<null>'),
                       COALESCE(o_orderstatus, '<null>'),
                       COALESCE(CAST(o_orderpriority AS VARCHAR), '<null>')
                   )), 1, 12))::BIGINT)
                   % 2305843009213693951 AS BIGINT) AS fingerprint,
               COUNT(*) AS n_rows
        FROM orders
    """,
    doc="Order-insensitive table checksum: md5 each canonicalized row "
    "(null sentinel so NULL never collides with its string form), take "
    "48 bits, SUM in DECIMAL(38,0) — commutative, so two tables match "
    "iff content matches regardless of partitioning or row order — "
    "then reduce mod the Mersenne prime 2^61-1 into a BIGINT. The "
    "widened accumulator matters at scale: a plain BIGINT sum of "
    "48-bit hashes overflows ANSI arithmetic past ~65k rows-worth of "
    "high hashes (it failed at sf0.1's 150k orders); DECIMAL(38,0) "
    "holds ~1e38, i.e. 1e24 rows. Engine-portable by construction "
    "(md5 + hex arithmetic; DuckDB sums in HUGEINT), hence the exact "
    "DuckDB oracle.",
)
def table_fingerprint_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    sent = F.lit("<null>")
    canon = F.concat_ws(
        "|",
        F.coalesce(F.col("o_orderkey").cast("string"), sent),
        F.coalesce(F.col("o_orderstatus"), sent),
        F.coalesce(F.col("o_orderpriority").cast("string"), sent),
    )
    row_hash = F.conv(F.substring(F.md5(canon), 1, 12), 16, 10).cast(
        "decimal(38,0)"
    )
    mersenne = F.lit(2305843009213693951).cast("decimal(38,0)")
    return orders.agg(
        (F.sum(row_hash) % mersenne).cast("long").alias("fingerprint"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "snapshot_diff_summary",
    oracle="""
        WITH old AS (
            SELECT o_orderkey, o_totalprice FROM orders
            WHERE o_orderkey % 11 <> 0
        ), new AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 7 = 0
                        THEN o_totalprice * 1.1 ELSE o_totalprice END
                       AS o_totalprice
            FROM orders WHERE o_orderkey % 13 <> 0
        )
        SELECT CASE WHEN o.o_orderkey IS NULL THEN 'inserted'
                    WHEN n.o_orderkey IS NULL THEN 'deleted'
                    WHEN o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
                         THEN 'unchanged'
                    ELSE 'updated' END AS change,
               COUNT(*) AS n
        FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
        GROUP BY 1
        ORDER BY change
    """,
    doc="Snapshot diff audit (operators/diff.py): classify every key as "
    "inserted/deleted/updated/unchanged between two deterministic "
    "derivations of orders, in ONE full-outer join with null-safe "
    "column comparison. The oracle replays the same join in SQL.",
)
def snapshot_diff_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.operators.diff import diff_summary

    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 11 != 0).select(
        "o_orderkey", "o_totalprice"
    )
    new = orders.filter(F.col("o_orderkey") % 13 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") * 1.1
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    return diff_summary(old, new, ["o_orderkey"], ["o_totalprice"])


@register(
    "histogram_order_totalprice",
    oracle="""
        WITH bounds AS (
            SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx
            FROM orders
        )
        SELECT CAST(LEAST(FLOOR((o_totalprice - mn) /
                                ((mx - mn) / 10.0)), 9) AS BIGINT)
                   AS bucket,
               COUNT(*) AS n
        FROM orders, bounds
        GROUP BY 1
        ORDER BY bucket
    """,
    doc="Equi-width 10-bucket histogram of order totals. Bucket edges "
    "come from a 1-row min/max agg joined back by broadcast — the "
    "engine-portable formula floor((x-mn)/w) is evaluated identically "
    "in Spark and DuckDB (same double arithmetic), so counts "
    "value-match exactly.",
)
def histogram_order_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    bucket = F.least(
        F.floor(
            (F.col("o_totalprice") - F.col("mn"))
            / ((F.col("mx") - F.col("mn")) / 10.0)
        ),
        F.lit(9),
    ).cast("long")
    return (
        orders.join(F.broadcast(bounds))
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )
