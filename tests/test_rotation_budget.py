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
    # Count alone no longer implies position: unproven queries
    # interleave 1:1 with very-stale greens, so one may slip past the
    # sample prefix and wait a round — it must never wait two.
    last = max(
        (i for i, n in enumerate(order) if status.get(n) is not True),
        default=0,
    )
    assert last < 2 * DRIVER_SAMPLE, (
        f"an unproven query sits at rotation position {last}, beyond "
        f"two driver samples ({2 * DRIVER_SAMPLE}) — it would stay "
        "unproven for 2+ rounds. Freeze catalog growth."
    )


def test_unproven_queries_lead_the_rotation():
    """Failed, very-stale-green, and never-sampled queries must all fit
    before any FRESH green: the only greens allowed ahead of an unproven
    query are the very-stale ones (>= _VERY_STALE_ROUNDS behind the
    newest round), which refresh first so catalog growth cannot age any
    proof without bound (round-10 policy)."""
    status = entry._driver_status()
    history = entry._driver_history()
    newest = max((r for _, r in history.values()), default=0)
    order = list(entry._rotation_order())
    n_lead = len(
        [
            n
            for n in order
            if status.get(n) is not True
            or newest - history[n][1] >= entry._VERY_STALE_ROUNDS
        ]
    )
    for n in order[:n_lead]:
        assert (
            status.get(n) is not True
            or newest - history[n][1] >= entry._VERY_STALE_ROUNDS
        ), f"fresh green {n} appears before an unproven/very-stale query"


def test_very_stale_and_fresh_interleave_with_bounded_waits():
    """Very-stale greens and never-sampled queries share the lead block
    1:1 (neither can starve the other), and every fresh-green comes
    after that whole block. The wait bound: the i-th stale query sits
    within the first failed + 2i + 1 positions, and symmetrically for
    fresh."""
    status = entry._driver_status()
    history = entry._driver_history()
    newest = max((r for _, r in history.values()), default=0)
    order = list(entry._rotation_order())
    pos = {n: i for i, n in enumerate(order)}
    stale = [
        n
        for n in order
        if n in history
        and history[n][0] is True
        and newest - history[n][1] >= entry._VERY_STALE_ROUNDS
    ]
    fresh = [n for n in order if n not in history]
    n_failed = sum(
        1 for n in order if n in history and status.get(n) is False
    )
    lead_end = n_failed + len(stale) + len(fresh)
    fresh_green = [
        n
        for n in order
        if n in history
        and history[n][0] is True
        and newest - history[n][1] < entry._VERY_STALE_ROUNDS
    ]
    if fresh_green:
        assert min(pos[n] for n in fresh_green) >= lead_end
    for i, n in enumerate(stale):
        assert pos[n] <= n_failed + 2 * i + 1, (n, pos[n])
    for i, n in enumerate(fresh):
        assert pos[n] <= n_failed + 2 * i + 1, (n, pos[n])


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
