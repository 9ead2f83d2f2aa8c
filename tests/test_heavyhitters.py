"""Misra-Gries candidate pruning: the pigeonhole retention guarantee,
the spill path, and exactness of the final recount vs brute force."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from economic_data_etl_spark.operators.heavyhitters import (
    heavy_hitters_exact,
    mg_summaries,
)


def _df(spark, items, parts=4):
    return spark.createDataFrame(
        [(t,) for t in items], "item string"
    ).repartition(parts)


def test_exact_matches_bruteforce_with_spills(spark):
    # 3 genuinely heavy items + 200 singletons force constant spills at
    # k=5 while the heavy items must still surface with EXACT counts.
    items = ["hot1"] * 120 + ["hot2"] * 90 + ["hot3"] * 60 + [
        f"cold{i}" for i in range(200)
    ]
    df = _df(spark, items)
    k = 5
    got = {
        (r.item, r.freq) for r in heavy_hitters_exact(df, "item", k).collect()
    }
    cnt = Counter(items)
    n = len(items)
    want = {(t, c) for t, c in cnt.items() if c * k > n}
    assert got == want and got


def test_summary_bounded_and_totals_exact(spark):
    items = [f"t{i % 37}" for i in range(1000)]
    df = _df(spark, items, parts=3)
    k = 7
    summ = mg_summaries(df, "item", k).collect()
    per_part_items = [r for r in summ if not r.is_count]
    totals = [r for r in summ if r.is_count]
    # bounded: <= k surviving items per partition (3 partitions)
    assert len(per_part_items) <= k * 3
    assert all(r.item is not None for r in per_part_items)
    assert len(totals) == 3
    assert sum(r.weight for r in totals) == len(items)


def test_nulls_excluded_from_population_and_threshold(spark):
    # 400 NULLs would push "hot" below n/k if they inflated the
    # denominator (100 * 4 = 400 < 520); over the 120 non-NULL rows
    # hot is clearly heavy (100 * 4 = 400 > 120). NULL itself must
    # never appear as a hitter even though it exceeds n/k.
    items = ["hot"] * 100 + [f"c{i}" for i in range(20)] + [None] * 400
    df = _df(spark, items)
    got = {
        (r.item, r.freq)
        for r in heavy_hitters_exact(df, "item", 4).collect()
    }
    assert got == {("hot", 100)}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    items=st.lists(
        st.sampled_from([f"v{i}" for i in range(12)]),
        min_size=1,
        max_size=300,
    ),
    k=st.integers(min_value=2, max_value=6),
)
def test_property_exact_heavy_hitters(spark, items, k):
    df = _df(spark, items, parts=3)
    got = {
        (r.item, r.freq) for r in heavy_hitters_exact(df, "item", k).collect()
    }
    cnt = Counter(items)
    n = len(items)
    want = {(t, c) for t, c in cnt.items() if c * k > n}
    assert got == want
    # and the candidate set provably contains every true heavy hitter
    cands = {
        r.item
        for r in mg_summaries(df, "item", k).collect()
        if r.item is not None
    }
    assert {t for t, _ in want} <= cands
