"""Driver contract for the spark-graft builder (PySpark target).

Exposes the engine's query catalog (economic_data_etl_spark.plans) to the
driver: `entry` runs the flagship query at sf0.001, `queries()` maps every
implemented operator to a (spark, sf_dir) -> DataFrame builder, and
`oracle_sql()` provides the DuckDB-equivalent SQL for each SQL-expressible
query (hash-based ops are rows-only by design).
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from economic_data_etl_spark.plans import REGISTRY

SF0001_DIR = "/root/testdata/sf0.001"
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["q1_pricing_summary"].spark(spark, SF0001_DIR)


def _driver_history() -> dict[str, tuple[bool, int]]:
    """name -> (latest driver verdict, round index of that verdict)
    across all prior CORRECTNESS_r*.json rounds; absent = never
    sampled. The round index ages the green tail: a query last proven
    in r01 should be re-proven before one proven in r04."""
    status: dict[str, tuple[bool, int]] = {}
    for rnd, path in enumerate(
        sorted(glob.glob(os.path.join(_REPO_DIR, "CORRECTNESS_r*.json")))
    ):
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if row.get("err") == "no_oracle":
                # rows-only by design: the driver ran the query and saw
                # rows — that's the strongest row this class can get.
                ok = row.get("spark_rows") is not None
            else:
                ok = bool(row.get("rows_match")) and row.get("err") is None
                # any explicit False on schema/hash is a failure.
                for k in ("schema_match", "hash_match"):
                    if row.get(k) is False:
                        ok = False
            status[name] = (ok, rnd)
    return status


def _driver_status() -> dict[str, bool]:
    """name -> latest driver verdict (True = green); absent = never
    sampled."""
    return {n: ok for n, (ok, _) in _driver_history().items()}


# A green driver row this many rounds older than the newest round is
# VERY STALE: it refreshes ahead of even never-sampled queries. Without
# this, a growing catalog (every round adds fresh queries, and fresh
# precedes green) can starve the oldest proofs indefinitely; with it,
# proof age is bounded regardless of catalog growth.
_VERY_STALE_ROUNDS = 4

# The driver checks roughly this many queries() entries per round —
# the budget the rotation allocates (tests/test_rotation_budget.py).
_DRIVER_SAMPLE = 50


def _rotation_order() -> list[str]:
    """All registered queries: queries whose LATEST driver row failed
    first (err / hash-mismatch — a fix needs a fresh row to prove
    itself), then green rows VERY STALE (>= _VERY_STALE_ROUNDS behind
    the newest round) stalest first, then never-driver-sampled queries,
    then the remaining green tail.

    The driver checks a ~50-query prefix of `queries()` per round, so a
    fixed order would leave the same tail unverified forever. Failed
    queries lead because re-proving a fix beats first-proving a query
    that already passes the local sf0.01 replica sweep; very-stale
    greens come next so catalog growth cannot age any proof without
    bound; fresh queries are interleaved round-robin by family (name
    prefix) so even a small sample touches every operator family;
    remaining greens go last, STALEST DRIVER ROW FIRST (once everything
    is green, each round's ~50-row sample refreshes the oldest proofs,
    keeping every green at most ⌈catalog/50⌉ rounds old).
    """
    names = list(REGISTRY)
    history = _driver_history()
    fresh = [n for n in names if n not in history]
    groups: dict[str, list[str]] = {}
    for n in fresh:
        groups.setdefault(n.split("_", 1)[0], []).append(n)
    order: list[str] = [
        n for n in names if n in history and history[n][0] is False
    ]
    green = [n for n in names if n in history and history[n][0] is True]
    # stable: ties on round put invariant certificates (inv_*) first —
    # they are the value-checked proof rows for the rows-only operators
    # (LSH/IVF/PQ recall, sketch error bounds, packing conservation),
    # so a stale inv_* weakens more claims than a stale plain query —
    # then keep registry order.
    green.sort(
        key=lambda n: (history[n][1], 0 if n.startswith("inv_") else 1)
    )
    newest = max((r for _, r in history.values()), default=0)
    cut = 0
    while (
        cut < len(green)
        and newest - history[green[cut]][1] >= _VERY_STALE_ROUNDS
    ):
        cut += 1
    # Interleave very-stale greens (stalest first) with fresh queries
    # (family round-robin) 1:1 — strict stale-first could starve a
    # fresh query for multiple rounds when the stale tail alone fills
    # the sample, and strict fresh-first (the old policy) starved the
    # stale tail as the catalog grew. Interleaving bounds both waits.
    #
    # ADAPTIVE exception (round-12): when a build wave makes
    # failed + fresh alone exceed the driver sample, every slot spent
    # on a stale-but-proven green delays a NEVER-proven query by a
    # full round — the worse trade. In that mode fresh queries
    # front-load (all unproven clear within two samples) and the
    # stale tail waits exactly one wave; the interleave resumes the
    # moment unproven fit in a sample again.
    fresh_rr: list[str] = []
    buckets = list(groups.values())
    while any(buckets):
        for b in buckets:
            if b:
                fresh_rr.append(b.pop(0))
    stale = green[:cut]
    if len(order) + len(fresh_rr) >= _DRIVER_SAMPLE:
        order.extend(fresh_rr)
        order.extend(stale)
    else:
        for i in range(max(len(stale), len(fresh_rr))):
            if i < len(stale):
                order.append(stale[i])
            if i < len(fresh_rr):
                order.append(fresh_rr[i])
    order.extend(green[cut:])
    return order


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: REGISTRY[name].spark for name in _rotation_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query; hash-family ops are omitted
    (rows-only check) because their hash functions are not SQL-portable."""
    return {
        name: REGISTRY[name].oracle
        for name in _rotation_order()
        if REGISTRY[name].oracle is not None
    }
