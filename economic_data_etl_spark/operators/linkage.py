"""Record-linkage primitives: edit-distance self-join with complete
(lossless) blocking.

`fuzzy_pairs` finds every unordered pair of distinct strings within
levenshtein distance `max_dist`, without an all-pairs comparison. The
blocking invariant: one edit changes string length by at most 1, so
|len(a) - len(b)| <= max_dist for any matching pair; bucketing by
`length div (max_dist + 1)` and probing each string's bucket ±1 is
therefore COMPLETE — lengths within max_dist of each other can differ
by at most one bucket — and non-redundant (each pair meets in exactly
one (bucket, probe) combination). The expensive levenshtein runs only
inside blocks, in its thresholded early-exit form.

At web scale the same join shape swaps the block key for phonetic keys,
n-gram prefixes, or sorted-neighborhood windows — the candidate-
generation/verify split is the operator; the key is a parameter.

Reference parity: extends the reference's exact dict-lookup name join
(src/transform.py:52,60) to unreliable keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_pairs(
    names: DataFrame, name_col: str = "name", max_dist: int = 2
) -> DataFrame:
    """(name1, name2, lev_dist) for distinct values of `name_col` with
    name1 < name2 and levenshtein <= max_dist. Input rows are
    deduplicated; extra columns are dropped."""
    w = max_dist + 1
    distinct = names.select(F.col(name_col).alias("name")).distinct()
    left = distinct.select(
        F.col("name").alias("name1"),
        (F.length("name") / w).cast("int").alias("bucket"),
    )
    right = distinct.select(
        F.col("name").alias("name2"),
        F.explode(
            F.array(
                *[
                    ((F.length("name") / w).cast("int") + d)
                    for d in (-1, 0, 1)
                ]
            )
        ).alias("bucket"),
    )
    return (
        left.join(right, "bucket")
        .filter(
            # thresholded levenshtein returns -1 (not a large number)
            # when the bound is exceeded: keep-condition is ">= 0".
            (F.col("name1") < F.col("name2"))
            & (F.levenshtein("name1", "name2", max_dist) >= 0)
        )
        .select(
            "name1",
            "name2",
            F.levenshtein("name1", "name2").cast("int").alias("lev_dist"),
        )
    )
