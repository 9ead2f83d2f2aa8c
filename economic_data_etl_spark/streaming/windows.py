"""Structured Streaming operators (SURVEY.md §2.10).

The reference's incremental watermark (src/extract.py:109-113) is a batch
analogue of event-time processing; this module is the real streaming
surface: tumbling/sliding/session windows with watermarks for late data,
plus a foreachBatch-upsert sink so late corrections MERGE into the target
exactly like the reference's revision handling (src/load.py:73-103).

Every aggregation here shares its window math with the batch queries in
plans/events.py — the streaming and batch paths return identical results
on the same input (tested in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_event_time(df: DataFrame, ts: str) -> DataFrame:
    """Normalize an event-time column to TIMESTAMP (with local time zone).

    Spark 4.1 rejects `withWatermark` on TIMESTAMP_NTZ
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE): watermarks compare instants,
    and an NTZ value names a wall-clock, not an instant. The parquet
    fixtures carry NTZ, so every streaming operator pins the event-time
    column to TIMESTAMP first — a no-op when the source already provides
    instants.
    """
    from pyspark.sql.types import TimestampType

    if isinstance(df.schema[ts].dataType, TimestampType):
        return df
    return df.withColumn(ts, F.col(ts).cast("timestamp"))


def events_stream(spark, source_dir: str, schema, ts_col: str = "ts") -> DataFrame:
    """File-source stream over a directory of parquet drops.

    `maxFilesPerTrigger=1` makes micro-batch boundaries deterministic in
    tests; production would leave it unset and let the trigger interval
    govern batch size.
    """
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(source_dir)
    )


def tumbling_window_agg(
    stream: DataFrame,
    ts: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_extra: list[str] | None = None,
) -> DataFrame:
    """Windowed count+sum with a watermark bounding state for late data."""
    extra = group_extra or []
    return (
        _as_event_time(stream, ts)
        .withWatermark(ts, watermark)
        .groupBy(F.window(ts, window).alias("w"), *extra)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), *extra, "n_events", "total_value")
    )


def sliding_window_agg(
    stream: DataFrame,
    ts: str = "ts",
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    return (
        _as_event_time(stream, ts)
        .withWatermark(ts, watermark)
        .groupBy(F.window(ts, window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.avg("value").alias("avg_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "avg_value")
    )


def session_window_agg(
    stream: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Native streaming session windows (gap-based, state merged by Spark).

    The batch twin is operators/sessionize.py; semantics match: a session
    extends while consecutive events are within `gap`.
    """
    return (
        _as_event_time(stream, ts)
        .withWatermark(ts, watermark)
        .groupBy(F.session_window(ts, gap).alias("w"), key)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("session_value"),
        )
        .select(
            key,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def streaming_dedup(
    stream: DataFrame,
    keys: list[str],
    ts: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state.

    `dropDuplicates` on a stream keeps every key ever seen — state grows
    without bound and a 100 TB/day feed OOMs the state store. This uses
    `dropDuplicatesWithinWatermark`: a key's state is dropped once the
    watermark passes it, so memory is proportional to the watermark
    horizon, and any duplicate arriving within that horizon (the only
    kind an at-least-once upstream produces) is still suppressed. The
    batch twin is operators/dedup.py:exact_dedup.
    """
    return (
        _as_event_time(stream, ts)
        .withWatermark(ts, watermark)
        .dropDuplicatesWithinWatermark(keys)
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: pair each left event with right events of
    the same key whose timestamp falls in [left_ts - max_delay, left_ts].

    Both sides carry watermarks and the join condition bounds event-time
    distance, so Spark can size and expire the join state — without the
    interval bound, stream-stream join state grows forever. The canonical
    funnel shape: purchases joined to the views that preceded them.
    """
    return _interval_join(
        left, right, key, left_ts, right_ts, max_delay, watermark, "inner"
    )


def stream_stream_left_outer_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every left event is
    emitted — paired with matching right events of the same key in
    [left_ts - max_delay, left_ts], or null-padded if none arrive.

    The null-padded row for an unmatched left event can only be emitted
    once Spark has PROOF no match can still arrive: the watermark must
    pass the end of the event's match interval. That makes output
    latency = watermark delay by construction, and it means a terminal
    micro-batch can hold back tail rows until a later batch advances
    the watermark (tests append a flush event to force this). State for
    both sides is expired by the same watermark, so memory is bounded
    by the interval width × arrival rate, never by stream length.
    """
    return _interval_join(
        left, right, key, left_ts, right_ts, max_delay, watermark, "leftOuter"
    )


def _interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str,
    watermark: str,
    how: str,
) -> DataFrame:
    """Shared watermarked interval-join core: same key, right timestamp
    in [left_ts - max_delay, left_ts], both sides watermarked so state
    is expirable. Join type is the only degree of freedom."""
    l = _as_event_time(left, left_ts).withWatermark(left_ts, watermark)
    r = _as_event_time(right, right_ts).withWatermark(right_ts, watermark)
    cond = (
        (l[key] == r[key])
        & (r[right_ts] <= l[left_ts])
        & (r[right_ts] >= l[left_ts] - F.expr(f"INTERVAL {max_delay}"))
    )
    return l.join(r, cond, how)


def foreach_batch_upsert(target_path: str, keys: list[str], compare_cols: list[str]):
    """Sink factory: MERGE each micro-batch into a parquet target via the
    engine's upsert operator — late/revised rows update in place, exactly
    the reference's revision path re-expressed for streams.

    Usage: `stream.writeStream.foreachBatch(foreach_batch_upsert(...))`.
    """
    from economic_data_etl_spark.operators.upsert import upsert_parquet

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_parquet(
            batch_df.sparkSession, batch_df, target_path, keys, compare_cols
        )

    return _apply
