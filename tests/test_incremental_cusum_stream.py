"""Streaming CUSUM: the stream-folded daily index must equal the
one-shot batch build (additivity), redelivered batches must not
double-count, and a crash at ANY offset of the staged swap must
converge after replay."""

from __future__ import annotations

from tests.crash_points import crash_offsets

from pyspark.sql import functions as F

from economic_data_etl_spark.operators.cusum import (
    cusum_from_daily,
    daily_totals,
)
from economic_data_etl_spark.sources.tables import load_table
from economic_data_etl_spark.streaming.incremental_cusum import (
    STATE_SCHEMA,
    _META,
    cusum_now,
    foreach_batch_incremental_cusum,
    read_daily,
)

N_BATCHES = 4


def _batches(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return [
        ev.filter(F.col("event_id") % N_BATCHES == b)
        for b in range(N_BATCHES)
    ]


def _daily_dict(df):
    return {
        (r.event_type, r.day): (round(r.total, 6), r.n)
        for r in df.collect()
    }


def _cusum_rows(df):
    return [
        (
            r.event_type,
            r.n_days,
            r.cp_day,
            round(r.s_max, 6),
            round(r.cusum_stat, 6),
        )
        for r in df.collect()
    ]


def test_stream_equals_batch(spark, sf_dir, tmp_path):
    state_dir = str(tmp_path / "cusum")
    handle = foreach_batch_incremental_cusum(state_dir)
    for bi, b in enumerate(_batches(spark, sf_dir)):
        handle(b, bi)
    got = _daily_dict(read_daily(spark, state_dir))
    want = _daily_dict(daily_totals(load_table(spark, sf_dir, "events")))
    assert got == want and got
    # and the standing index serves the changepoint scan directly,
    # matching the batch operator on the full data
    assert _cusum_rows(cusum_now(spark, state_dir)) == _cusum_rows(
        cusum_from_daily(
            daily_totals(load_table(spark, sf_dir, "events"))
        )
    )


def test_one_index_serves_seasonal_too(spark, sf_dir, tmp_path):
    """The standing daily index serves the seasonal decomposition as
    well as CUSUM — fold once, read both. Must equal the batch
    operator on the full data."""
    from economic_data_etl_spark.operators.seasonal import (
        seasonal_from_daily,
    )
    from economic_data_etl_spark.streaming.incremental_cusum import (
        seasonal_now,
    )

    state_dir = str(tmp_path / "cusum")
    handle = foreach_batch_incremental_cusum(state_dir)
    for bi, b in enumerate(_batches(spark, sf_dir)):
        handle(b, bi)
    batch_daily = daily_totals(
        load_table(spark, sf_dir, "events")
    ).localCheckpoint()

    def rows(df):
        return [
            (
                r.event_type,
                r.day,
                r.dow,
                round(r.total, 6),
                None if r.trend is None else round(r.trend, 6),
                round(r.seasonal, 6),
                None if r.residual is None else round(r.residual, 6),
            )
            for r in df.collect()
        ]

    assert rows(seasonal_now(spark, state_dir)) == rows(
        seasonal_from_daily(batch_daily)
    )


def test_redelivery_skipped(spark, sf_dir, tmp_path):
    state_dir = str(tmp_path / "cusum")
    handle = foreach_batch_incremental_cusum(state_dir)
    first = _batches(spark, sf_dir)[0]
    handle(first, 0)
    s1 = _daily_dict(read_daily(spark, state_dir))
    handle(first, 0)  # replay
    assert _daily_dict(read_daily(spark, state_dir)) == s1


def test_null_series_key_accumulates_across_batches(spark, tmp_path):
    """NULL series keys are data: the meta filter must not drop them
    from the standing table between merges (a bare != meta evaluates
    NULL and would keep only the LAST batch's NULL-key totals)."""
    import datetime

    state_dir = str(tmp_path / "cusum_null")
    handle = foreach_batch_incremental_cusum(state_dir)
    day = datetime.datetime(2024, 5, 1, 12, 0)
    schema = "event_type string, ts timestamp, value double"
    handle(
        spark.createDataFrame([(None, day, 2.0), ("a", day, 1.0)], schema),
        0,
    )
    handle(spark.createDataFrame([(None, day, 3.0)], schema), 1)
    got = _daily_dict(read_daily(spark, state_dir))
    assert got[(None, day.replace(hour=0))] == (5.0, 2)
    assert got[("a", day.replace(hour=0))] == (1.0, 1)


def test_crash_at_every_offset_converges(spark, sf_dir, tmp_path):
    import os
    import shutil

    batches = _batches(spark, sf_dir)
    clean = str(tmp_path / "clean")
    handle = foreach_batch_incremental_cusum(clean)
    for bi, b in enumerate(batches):
        handle(b, bi)
    want = _daily_dict(read_daily(spark, clean))

    for kill_at in crash_offsets(3 * len(batches)):
        state_dir = str(tmp_path / f"k{kill_at}")
        staging = f"{state_dir}.staging"
        h = foreach_batch_incremental_cusum(state_dir)
        step = 0
        killed = False
        for bi, batch in enumerate(batches):
            if killed:
                h(batch, bi)
                continue
            # replicate the handler's step sequence
            if os.path.exists(staging) and not os.path.exists(state_dir):
                os.rename(staging, state_dir)
            merged = (
                read_daily(spark, state_dir)
                .unionByName(daily_totals(batch))
                .groupBy("event_type", "day")
                .agg(
                    F.sum("total").alias("total"), F.sum("n").alias("n")
                )
            )
            meta = spark.createDataFrame(
                [(_META, None, None, bi)], STATE_SCHEMA
            )
            steps = [
                lambda: merged.unionByName(meta)
                .write.mode("overwrite")
                .parquet(staging),
                lambda: shutil.rmtree(state_dir)
                if os.path.exists(state_dir)
                else None,
                lambda: os.rename(staging, state_dir),
            ]
            for fn in steps:
                if step == kill_at:
                    killed = True
                    break
                fn()
                step += 1
            if killed:
                h(batch, bi)  # recovery: redeliver through the handler
        got = _daily_dict(read_daily(spark, state_dir))
        assert got == want, f"kill_at={kill_at}"


def test_partial_staging_from_mid_write_crash_is_discarded(
    spark, sf_dir, tmp_path
):
    """Driver death MID-WRITE of the very first batch's staging parquet
    (partial rows on disk, no _SUCCESS marker, no state_dir yet): the
    recovery must NOT promote the partial dir — doing so makes the
    batch-id high-water mark read -1 and the redelivered batch refolds
    on top of the partial rows, double-counting. The kill-offset fuzz
    treats the parquet write as atomic, so this window needs its own
    test."""
    import os

    batches = _batches(spark, sf_dir)
    clean = str(tmp_path / "clean")
    handle = foreach_batch_incremental_cusum(clean)
    for bi, b in enumerate(batches):
        handle(b, bi)
    want = _daily_dict(read_daily(spark, clean))

    state_dir = str(tmp_path / "crashy")
    staging = f"{state_dir}.staging"
    # partial staging: real daily rows, meta row missing, commit marker
    # stripped — exactly what a mid-write death leaves behind.
    daily_totals(batches[0]).write.mode("overwrite").parquet(staging)
    os.remove(os.path.join(staging, "_SUCCESS"))

    h = foreach_batch_incremental_cusum(state_dir)
    for bi, b in enumerate(batches):  # batch 0 is the redelivery
        h(b, bi)
    assert _daily_dict(read_daily(spark, state_dir)) == want
    assert not os.path.exists(staging)
