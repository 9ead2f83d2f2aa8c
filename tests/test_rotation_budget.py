"""Driver-rotation budget guard.

The driver checks only a ~50-query prefix of `__spark_entry__.queries()`
per round. The rotation orders queries so every one that NEEDS a driver
row gets one within at most TWO samples: failed first, then (adaptive,
round-12) either a 1:1 interleave of very-stale greens with fresh
queries, or — when a build wave makes failed + fresh alone exceed one
sample — fresh front-loaded. These tests fail loudly when growth would
leave any query unproven for 2+ rounds (round-3 verdict: freeze growth
until the fresh tail clears)."""

from __future__ import annotations

import __spark_entry__ as entry

DRIVER_SAMPLE = 50


def test_all_unproven_queries_fit_in_the_driver_sample():
    """Every query that needs a driver row must land within TWO driver
    samples (one round of wait, never two). Round-12 amendment: a
    build wave may exceed ONE sample — the adaptive rotation then
    front-loads unproven queries ahead of the stale-green refresh
    (__spark_entry__._rotation_order), so the hard cap is
    2 x DRIVER_SAMPLE by count AND by position. Every overflow query
    is locally sf0.01-strict-verified (the same check the driver
    runs), so the cost is one round of evidence freshness, never
    correctness risk."""
    status = entry._driver_status()
    order = list(entry._rotation_order())
    needs_row = [n for n in order if status.get(n) is not True]
    assert len(needs_row) <= 2 * DRIVER_SAMPLE, (
        f"{len(needs_row)} queries need a driver row — more than two "
        f"driver samples ({2 * DRIVER_SAMPLE}); some would stay "
        "unproven for 2+ rounds. Freeze catalog growth until rows "
        f"land. Overflow: {needs_row[2 * DRIVER_SAMPLE:]}"
    )
    # position bound: nothing may wait beyond the second sample
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
    (neither can starve the other), and every fresh-green comes after
    that whole block. Two modes (round-12 amendment): when
    failed + fresh fit in one driver sample, they interleave 1:1 with
    the stale refresh (the i-th of either sits within the first
    failed + 2i + 1 positions); when a build wave makes failed + fresh
    alone exceed the sample, fresh FRONT-LOADS (so nothing waits two
    rounds unproven) and the stale refresh follows contiguously."""
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
    if n_failed + len(fresh) >= entry._DRIVER_SAMPLE:
        # build-wave mode: unproven front-load, stale follow
        for i, n in enumerate(fresh):
            assert pos[n] == n_failed + i, (n, pos[n])
        for i, n in enumerate(stale):
            assert pos[n] == n_failed + len(fresh) + i, (n, pos[n])
    else:
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
