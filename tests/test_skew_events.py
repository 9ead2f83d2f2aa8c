"""Hot-key behavior of the per-user event operators (as-of, sessionize).

The as-of join and sessionize/funnel family partition by user_id, so a
single pathologically hot user is the one skew surface the join-side
salting in operators/skew.py does not cover. The mechanism that bounds
it (documented in COVERAGE.md §2.5):

- One shuffle on the key; a hot key lands on ONE task, but that task is
  LINEAR in the key's row count: the frames used everywhere are running
  frames (rowsBetween(unboundedPreceding, currentRow) /
  (currentRow, unboundedFollowing)), which Spark's WindowExec evaluates
  as a streaming accumulator over the sorted partition — no per-row
  frame re-scan, so no quadratic blowup.
- The per-partition sort behind the window is UnsafeExternalSorter,
  which spills to disk: a hot key larger than executor memory completes
  (slower), it does not OOM.
- AQE's skew split applies to sort-merge JOIN partitions, not window
  partitions — which is exactly why the as-of operator uses the
  union-then-window plan (ONE window over one shuffle) instead of a
  range join: the hot key costs one linear sorted scan rather than an
  O(hot²) range-join explosion.

These tests pin correctness (not just completion) under a deliberately
hot key: one user owns ~95% of all events, with adversarial ordering
(descending insert order, duplicate timestamps) so any accumulator
reset or frame-ordering bug under a large partition shows up.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from economic_data_etl_spark.operators.asof import asof_join
from economic_data_etl_spark.operators.sessionize import sessionize

BASE = dt.datetime(2024, 1, 1)

HOT_N = 20_000  # events owned by the hot user
COLD_USERS = 50  # normal users with 3 events each


def _hot_events(spark):
    """events(user_id, ts, kind): user 0 is hot, users 1..COLD_USERS have
    3 events each. Rows are generated descending so the window sort does
    real work; every 7th hot event shares its timestamp with the next
    (duplicate-ts ties)."""
    rows = []
    for i in range(HOT_N - 1, -1, -1):
        sec = i - (i % 7 == 0)  # duplicate ts every 7th row
        rows.append((0, BASE + dt.timedelta(seconds=max(sec, 0)),
                     "view" if i % 3 else "purchase"))
    for u in range(1, COLD_USERS + 1):
        for j in range(3):
            rows.append((u, BASE + dt.timedelta(minutes=40 * j), "view"))
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, kind string"
    )


class TestHotKeyEvents:
    def test_asof_backward_correct_under_hot_key(self, spark):
        ev = _hot_events(spark)
        views = ev.filter(F.col("kind") == "view").select(
            "user_id", "ts"
        )
        purchases = ev.filter(F.col("kind") == "purchase").select(
            "user_id", F.col("ts").alias("pts"), F.col("kind").alias("pk")
        )
        out = asof_join(
            views,
            purchases,
            on="user_id",
            left_ts="ts",
            right_ts="pts",
            right_payload=["pts"],
            direction="backward",
        )
        # row conservation: one output row per left row
        assert out.count() == views.count()
        # correctness on the hot key: matched pts is the max purchase ts
        # <= view ts — verify exactly via a groupBy-free spot check on a
        # deterministic sample of hot rows.
        sample = (
            out.filter(F.col("user_id") == 0)
            .orderBy("ts")
            .limit(500)
            .collect()
        )
        p_ts = sorted(
            r["pts"] for r in purchases.filter(
                F.col("user_id") == 0
            ).collect()
        )
        import bisect

        for r in sample:
            i = bisect.bisect_right(p_ts, r["ts"])
            expect = p_ts[i - 1] if i else None
            assert r["pts_asof"] == expect, (r["ts"], r["pts_asof"], expect)
        # cold keys unaffected: no purchases → all-null matches
        cold = out.filter(F.col("user_id") > 0)
        assert cold.filter(F.col("pts_asof").isNotNull()).count() == 0

    def test_sessionize_linear_frames_under_hot_key(self, spark):
        ev = _hot_events(spark)
        s = sessionize(ev, "user_id", "ts", gap="30 minutes")
        # hot user: events are 1 s apart → exactly one session
        hot = s.filter(F.col("user_id") == 0)
        assert hot.agg(F.max("session_id")).collect()[0][0] == 0
        # cold users: 40-minute gaps → each of the 3 events its own session
        cold = s.filter(F.col("user_id") == 1)
        assert sorted(r["session_id"] for r in cold.collect()) == [0, 1, 2]
        # total conservation
        assert s.count() == ev.count()

    def test_hot_key_lands_one_partition_but_completes(self, spark):
        """The documented mechanism, observed: after the window shuffle
        all hot-key rows are in one partition (spark_partition_id), and
        the job still completes correctly — linear frames + external
        sort, no OOM, no skew split expected for windows."""
        ev = _hot_events(spark)
        s = sessionize(ev, "user_id", "ts")
        # aggregate session_id per partition id and COLLECT (not count):
        # consuming the window output keeps the WindowExec and its
        # shuffle in the plan — a bare count() (or projecting
        # spark_partition_id alone) lets column pruning eliminate the
        # window entirely and read the scan's partitioning instead.
        rows = (
            s.filter(F.col("user_id") == 0)
            .groupBy(F.spark_partition_id().alias("p"))
            .agg(F.max("session_id").alias("max_sid"))
            .collect()
        )
        assert len(rows) == 1, rows
        assert rows[0]["max_sid"] == 0
