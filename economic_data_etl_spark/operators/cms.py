"""Count-Min Sketch: a fixed-size, mergeable frequency summary with a
one-sided error guarantee (estimates never undercount).

Complements the sketch family: HLL answers distinct-count, Misra-Gries
answers "which items are heavy" (exact after recount), CMS answers
point frequency QUERIES for arbitrary items at O(depth x width) space
— the shape a 100 TB pipeline uses when it needs approximate counts
for items it cannot enumerate in advance (per-token frequencies, URL
hit counts) and wants sketches it can ADD across days/partitions
(the sketch is linear: cms(A ∪ B) = cms(A) + cms(B) bucket-wise,
pinned in tests/test_cms.py).

Determinism contract: the d hash rows are md5-based
(conv(substr(md5(j || ':' || item), 1, 8), 16, 10) % width) — the
repo's standard cross-engine hash (plans/curation.py's weighted
sample) — so DuckDB replays the ENTIRE sketch build and every
estimate exactly; the catalog row is a full value check, not a
rows-only one. The one-sided guarantee (estimate >= true count,
because every occurrence of x lands in x's bucket in every row and
counts only add) is deterministic, not probabilistic, so the oracle
can assert it as a constant-TRUE verdict.

Scale shape: the build is one scan exploded x depth, collapsed by
map-side combine to at most depth x width rows per task before the
one exchange; the sketch itself is depth x width rows regardless of
corpus size. Estimates join the query set against the sketch on
(row, bucket) — broadcast-sized on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(col, j: int, width: int):
    """Row-j bucket of an item: first 8 md5 hex digits of 'j:item' as
    an integer, mod width. Identical expression exists in DuckDB as
    CAST(('0x' || substr(md5(j || ':' || item), 1, 8)) AS BIGINT)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{j}:"), col)), 1, 8),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_build(
    items: DataFrame, col: str, depth: int = 3, width: int = 1024
) -> DataFrame:
    """Build the sketch: (row, bucket, cnt), at most depth x width
    rows. One scan of the item stream; the explode-by-depth is
    collapsed by partial aggregation before the exchange."""
    if depth < 1 or width < 1:
        raise ValueError(f"bad sketch shape {depth}x{width}")
    c = F.col(col)
    lanes = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"), _bucket(c, j, width).alias("bucket")
            )
            for j in range(depth)
        ]
    )
    return (
        items.where(c.isNotNull())
        .select(F.explode(lanes).alias("rb"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    col: str,
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for each distinct query item:
    (item, est) with est = min over rows of the item's bucket count
    (0 when a bucket row is absent — the sketch stores only non-empty
    buckets). est >= true count always; equality unless every hash row
    collides the item with other mass."""
    q = queries.select(F.col(col).alias("item")).where(
        F.col("item").isNotNull()
    ).distinct()
    lanes = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                _bucket(F.col("item"), j, width).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    probes = q.select("item", F.explode(lanes).alias("rb")).select(
        "item", F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    )
    return (
        probes.join(sketch, ["row", "bucket"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def cms_join_size_estimate(
    sketch_a: DataFrame, sketch_b: DataFrame
) -> DataFrame:
    """Equi-join cardinality estimate from two CMS sketches built on
    the join keys (Cormode/Muthukrishnan): |A join B on key| =
    sum_k f_A(k) * f_B(k) — the inner product of the frequency
    vectors — and each sketch row's bucket-wise product sum
    OVERESTIMATES it (collisions only add non-negative cross terms),
    so min over rows is a deterministic one-sided upper bound. This is
    the optimizer's use of frequency sketches: estimate a join's
    output size from two constant-size summaries without touching
    either table. Returns one row (est_join_size)."""
    per_row = (
        sketch_a.alias("a")
        .join(
            sketch_b.alias("b"),
            (F.col("a.row") == F.col("b.row"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .groupBy(F.col("a.row"))
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("ip"))
    )
    return per_row.agg(F.min("ip").alias("est_join_size"))


def cms_subtract(standing: DataFrame, revoked: DataFrame) -> DataFrame:
    """Right-to-be-forgotten for a standing CMS: the sketch is a LINEAR
    transform of the item stream (every cell is a sum of indicator
    counts), so erasing a revoked subset is exact CELL-WISE SUBTRACTION
    of the subset's own sketch — the erased table is bit-identical to a
    from-scratch build on the reduced stream, the property the
    governance_erasure_cms oracle value-checks. Cells reaching zero
    leave the table (the build stores only non-empty buckets). The same
    algebra cannot work for the non-linear sketches (KMV, KLL keep
    order statistics); those erase by rebuild."""
    neg = revoked.select(
        "row", "bucket", (-F.col("cnt")).cast("long").alias("cnt")
    )
    return (
        standing.unionByName(neg)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .filter(F.col("cnt") > 0)
    )
