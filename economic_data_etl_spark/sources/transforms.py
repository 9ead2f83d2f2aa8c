"""Fact-table combination (reference parity: combine_fact_tables,
/root/reference/src/transform.py:97-115)."""

from __future__ import annotations

import functools
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def combine_fact_tables(frames: Sequence[DataFrame]) -> DataFrame:
    """Union-all of n schema-aligned fact frames, oldest-first.

    Duplicates are preserved (the reference's combiner is a plain concat;
    dedup is the upsert's job). Empty input is a caller error — the
    reference also assumes at least one frame.
    """
    if not frames:
        raise ValueError("combine_fact_tables requires at least one frame")
    unioned = functools.reduce(DataFrame.unionByName, frames)
    # Ties (same date, different series) are unspecified in the reference's
    # quicksort too (SURVEY.md §2.6 O1); sort on the full key for
    # deterministic output.
    return unioned.orderBy(F.asc("date"), F.asc("series_id"))
