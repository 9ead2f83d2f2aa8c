"""Exact distributed heavy hitters via Misra-Gries candidate pruning.

The candidate-then-verify shape for "which items exceed n/k of the
stream" at 100 TB: a single scan builds one bounded Misra-Gries summary
per PARTITION (capacity k, so <= k rows leave each partition no matter
how many items flow through it), the union of survivors is the
candidate set, and one exact recount restricted to candidates (a
broadcast semi-join — candidates are <= k x partitions rows) yields
EXACT counts.

Correctness is a pigeonhole argument, not an approximation: if
count(x) > n/k globally then in at least one partition
count_p(x)/n_p >= count(x)/n > 1/k >= 1/(k+1), and a capacity-k
Misra-Gries summary retains every item with local ratio > 1/(k+1)
(the total weight discarded by spills is <= n_p/(k+1)). So the
candidate set provably contains every true heavy hitter and the final
output — exact counts filtered at the threshold — is identical to the
brute-force answer, which is why the catalog query can be checked
against a plain SQL oracle.

No reference counterpart; completes the sketch family next to the HLL
rollup (mergeable cardinality) with a mergeable frequency summary.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_summaries(items: DataFrame, col: str, k: int) -> DataFrame:
    """One bounded Misra-Gries summary per partition: rows
    (item, weight, is_count=false) with <= k items per partition, plus
    one total row (item NULL, weight = partition row count,
    is_count=true) so the caller gets the exact stream length from the
    same scan. The total row is marked by its own column — never by an
    in-band NULL item — and NULL items are filtered out BEFORE the
    summary pass: heavy hitters are defined over non-NULL values only,
    and the threshold denominator n counts only non-NULL rows (the
    same population a SQL `WHERE col IS NOT NULL ... GROUP BY col`
    oracle counts).

    Batches within a partition accumulate in closure state (weighted
    MG merge: add the batch's value_counts, then on overflow subtract
    the (k+1)-th largest weight from everything and drop the
    non-positive — each spill discards >= (k+1) x m total weight, so
    the cumulative subtraction is <= n_p/(k+1)).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        n_rows = 0
        for pdf in batches:
            n_rows += len(pdf)
            for t, c in pdf[col].value_counts().items():
                counters[t] = counters.get(t, 0) + int(c)
            if len(counters) > k:
                vals = sorted(counters.values(), reverse=True)
                m = vals[k]  # (k+1)-th largest
                counters = {
                    t: w - m for t, w in counters.items() if w - m > 0
                }
        out = pd.DataFrame(
            {
                "item": list(counters) + [None],
                "weight": [int(w) for w in counters.values()] + [n_rows],
                "is_count": [False] * len(counters) + [True],
            }
        )
        yield out

    return (
        items.select(F.col(col).alias(col))
        .where(F.col(col).isNotNull())
        .mapInPandas(gen, "item string, weight long, is_count boolean")
    )


def heavy_hitters_exact(
    items: DataFrame, col: str, k: int
) -> DataFrame:
    """All non-NULL items with count * k > total, with EXACT counts
    (total = number of non-NULL rows; NULLs are excluded from both the
    numerator population and the threshold denominator).

    Two scans of `items`: the MG summary pass (which also carries the
    total row count in its per-partition total rows) and the candidate
    recount. The intermediate candidate set is <= k x partitions rows,
    so the recount join broadcasts.
    """
    summ = mg_summaries(items, col, k)
    cand = (
        summ.filter(~F.col("is_count"))
        .select(F.col("item").alias(col))
        .distinct()
    )
    total = summ.filter(F.col("is_count")).agg(
        F.sum("weight").alias("__total")
    )
    counted = (
        items.join(F.broadcast(cand), col)
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return (
        counted.crossJoin(total)
        .filter(F.col("freq") * k > F.col("__total"))
        .select(col, "freq")
    )
