"""Driver-rotation budget guard.

The driver checks only a ~50-query prefix of `__spark_entry__.queries()`
per round. The rotation puts failed-then-never-sampled queries first, so
every query that NEEDS a driver row gets one — but only while
(failed + never-sampled) <= 50. Adding new catalog queries consumes that
budget; this test fails loudly when growth would push a query that needs
proving out of the sample (round-3 verdict: freeze growth until the
fresh tail clears)."""

from __future__ import annotations

import __spark_entry__ as entry

DRIVER_SAMPLE = 50


def test_all_unproven_queries_fit_in_the_driver_sample():
    status = entry._driver_status()
    order = list(entry._rotation_order())
    needs_row = [n for n in order if status.get(n) is not True]
    assert len(needs_row) <= DRIVER_SAMPLE, (
        f"{len(needs_row)} queries need a driver row but the driver "
        f"samples only ~{DRIVER_SAMPLE} — the newest additions would "
        "crowd earlier unproven queries out of the sample. Freeze "
        f"catalog growth until rows land. Overflow: {needs_row[DRIVER_SAMPLE:]}"
    )


def test_unproven_queries_lead_the_rotation():
    status = entry._driver_status()
    order = list(entry._rotation_order())
    prefix = order[: len([n for n in order if status.get(n) is not True])]
    assert all(status.get(n) is not True for n in prefix), (
        "a driver-green query appears before an unproven one"
    )


def test_green_tail_is_aged_oldest_proof_first():
    """Once every query is driver-green, the ~50-row sample must refresh
    the STALEST proofs: the green tail is ordered by the round of each
    query's latest driver row, ascending (round-4 verdict item 6)."""
    history = entry._driver_history()
    order = list(entry._rotation_order())
    green_rounds = [
        history[n][1]
        for n in order
        if n in history and history[n][0] is True
    ]
    assert green_rounds == sorted(green_rounds)


def test_registry_and_rotation_agree():
    from economic_data_etl_spark.plans import REGISTRY

    order = entry._rotation_order()
    assert sorted(order) == sorted(REGISTRY)
    assert len(order) == len(set(order))
