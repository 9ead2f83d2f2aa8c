"""Streaming CMS: the stream-folded sketch must equal the one-shot
batch build bit-for-bit (linearity), redelivered batches must not
double-count, and a crash at ANY offset of the staged swap must
converge after replay."""

from __future__ import annotations

from tests.crash_points import crash_offsets

from pyspark.sql import functions as F

from economic_data_etl_spark.operators.cms import cms_build, cms_estimate
from economic_data_etl_spark.streaming.incremental_cms import (
    STATE_SCHEMA,
    _META_KEY,
    foreach_batch_incremental_cms,
    read_sketch,
)

D, W = 3, 32


def _df(spark, items):
    return spark.createDataFrame([(t,) for t in items], "item string")


def _sketch_dict(df):
    return {(r.row, r.bucket): r.cnt for r in df.collect()}


BATCHES = [
    ["a"] * 5 + ["b"] * 3 + [f"u{i}" for i in range(10)],
    ["b"] * 7 + ["c"] * 4 + [f"w{i}" for i in range(8)],
    ["a"] * 2 + ["c"] * 6,
]


def test_stream_equals_batch_build(spark, tmp_path):
    state_dir = str(tmp_path / "cms")
    handle = foreach_batch_incremental_cms(state_dir, "item", D, W)
    for bi, b in enumerate(BATCHES):
        handle(_df(spark, b), bi)
    got = _sketch_dict(read_sketch(spark, state_dir))
    want = _sketch_dict(
        cms_build(_df(spark, [t for b in BATCHES for t in b]), "item", D, W)
    )
    assert got == want and got
    # and the standing sketch serves estimates directly
    est = {
        r.item: r.est
        for r in cms_estimate(
            read_sketch(spark, state_dir), _df(spark, ["a", "b", "c"]),
            "item", D, W,
        ).collect()
    }
    assert est["a"] >= 7 and est["b"] >= 10 and est["c"] >= 10


def test_redelivery_skipped(spark, tmp_path):
    state_dir = str(tmp_path / "cms")
    handle = foreach_batch_incremental_cms(state_dir, "item", D, W)
    handle(_df(spark, ["a", "a", "b"]), 0)
    s1 = _sketch_dict(read_sketch(spark, state_dir))
    handle(_df(spark, ["a", "a", "b"]), 0)  # replay
    assert _sketch_dict(read_sketch(spark, state_dir)) == s1


def test_crash_at_every_offset_converges(spark, tmp_path):
    import os
    import shutil

    clean = str(tmp_path / "clean")
    handle = foreach_batch_incremental_cms(clean, "item", D, W)
    for bi, b in enumerate(BATCHES):
        handle(_df(spark, b), bi)
    want = _sketch_dict(read_sketch(spark, clean))

    for kill_at in crash_offsets(3 * len(BATCHES)):
        state_dir = str(tmp_path / f"k{kill_at}")
        staging = f"{state_dir}.staging"
        h = foreach_batch_incremental_cms(state_dir, "item", D, W)
        step = 0
        killed = False
        for bi, items in enumerate(BATCHES):
            batch = _df(spark, items)
            if killed:
                h(batch, bi)
                continue
            # replicate the handler's step sequence
            if os.path.exists(staging) and not os.path.exists(state_dir):
                os.rename(staging, state_dir)
            merged = (
                read_sketch(spark, state_dir)
                .unionByName(
                    cms_build(batch, "item", D, W).select(
                        F.col("row").cast("long"), "bucket", "cnt"
                    )
                )
                .groupBy("row", "bucket")
                .agg(F.sum("cnt").alias("cnt"))
            )
            meta = spark.createDataFrame(
                [(_META_KEY, _META_KEY, bi)], STATE_SCHEMA
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
        got = _sketch_dict(read_sketch(spark, state_dir))
        assert got == want, f"kill_at={kill_at}"
