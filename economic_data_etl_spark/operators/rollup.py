"""Continuous aggregate (hypertable-rollup-style) maintenance.

A materialized time-bucket rollup kept current incrementally: each
refresh aggregates only rows newer than the stored watermark (minus a
lateness allowance) and MERGEs the re-computed buckets into the rollup
table. Equivalent to TimescaleDB continuous aggregates / a Kappa-style
batch view, built from this engine's own pieces: tumbling-window agg +
watermark state (sources/ingest.MetadataStore) + set-oriented upsert.

Scale: a refresh touches O(new data) rows plus the tail buckets it
re-opens — never the full history. The rollup table itself is the
upsert's staged-rewrite parquet; on real deployments partition it by
bucket date so the rewrite is partition-local.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.operators.upsert import upsert_parquet
from economic_data_etl_spark.sources.ingest import MetadataStore

ROLLUP_SOURCE = "ROLLUP"


def hourly_rollup(events: DataFrame, ts: str = "ts", value: str = "value") -> DataFrame:
    return (
        events.groupBy(
            F.window(ts, "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("bucket"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def refresh_continuous_aggregate(
    spark: SparkSession,
    events: DataFrame,
    rollup_path: str,
    state_dir: str | Path,
    rollup_id: str = "events_hourly",
    lateness: str = "1 hour",
    ts: str = "ts",
) -> dict[str, int]:
    """Incrementally refresh the hourly rollup at `rollup_path`.

    Re-aggregates rows with ts >= (stored watermark - lateness) — the
    lateness margin re-opens tail buckets that late rows may still land
    in — and upserts the resulting buckets. Returns the upsert stats.
    """
    store = MetadataStore(Path(state_dir))
    wm = store.watermark(ROLLUP_SOURCE, rollup_id)

    scoped = events
    if wm is not None:
        cutoff = F.lit(wm).cast("timestamp") - F.expr(f"INTERVAL {lateness}")
        scoped = events.filter(F.col(ts) >= cutoff)

    buckets = hourly_rollup(scoped, ts=ts)
    stats = upsert_parquet(
        spark,
        buckets,
        rollup_path,
        keys=["bucket", "event_type"],
        compare_cols=["n_events", "total_value"],
    )

    new_max = scoped.agg(F.max(ts).alias("m")).collect()[0]["m"]
    if new_max is not None:
        store.update_watermark(
            ROLLUP_SOURCE, rollup_id, payload_hash="",
            latest_observation_date=new_max.isoformat(),
        )
    return stats
