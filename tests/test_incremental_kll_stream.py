"""Streaming quantile sketch: the stream-folded sketch must conserve
exact total weight, honor its self-reported rank-error bound, skip
redelivered batches, and converge after a crash at ANY offset of the
staged swap."""

from __future__ import annotations

from tests.crash_points import crash_offsets

from economic_data_etl_spark.streaming.incremental_kll import (
    _BATCH_META_LEVEL,
    foreach_batch_incremental_kll,
    quantiles_now,
    read_sketch_rows,
)

K = 64

BATCHES = [
    [float((v * 2654435761) % 997) for v in range(1500)],
    [float((v * 40503) % 997) + 0.5 for v in range(1200)],
    [float(v % 31) for v in range(800)],
]
ALL = sorted(v for b in BATCHES for v in b)


def _df(spark, vals):
    return spark.createDataFrame(
        [(v,) for v in vals], "value double"
    ).repartition(4)


def _rows_dict(df):
    rows = df.collect()
    return sorted((r.level, r.value, r.cnt) for r in rows)


def _check_bound(spark, state_dir):
    pdf = read_sketch_rows(spark, state_dir).toPandas()
    w_max = 1 << int(pdf.loc[pdf["level"] >= 0, "level"].max())
    for q, est, total, bound in quantiles_now(
        spark, state_dir, [0.1, 0.5, 0.9]
    ):
        assert total == len(ALL)
        true_rank = sum(1 for v in ALL if v <= est)
        assert abs(true_rank - q * total) <= bound + w_max + 1, (q, est)


def test_stream_fold_conserves_weight_and_bound(spark, tmp_path):
    state_dir = str(tmp_path / "kll")
    handle = foreach_batch_incremental_kll(state_dir, "value", K)
    for bi, b in enumerate(BATCHES):
        handle(_df(spark, b), bi)
    _check_bound(spark, state_dir)


def test_redelivery_skipped(spark, tmp_path):
    state_dir = str(tmp_path / "kll")
    handle = foreach_batch_incremental_kll(state_dir, "value", K)
    handle(_df(spark, BATCHES[0]), 0)
    s1 = _rows_dict(read_sketch_rows(spark, state_dir))
    handle(_df(spark, BATCHES[0]), 0)  # replay
    assert _rows_dict(read_sketch_rows(spark, state_dir)) == s1


def test_crash_at_every_offset_converges(spark, tmp_path):
    import os
    import shutil

    from pyspark.sql import functions as F

    from economic_data_etl_spark.operators.kll import (
        SKETCH_SCHEMA,
        kll_sketch,
        merge_sketch_rows,
    )

    clean = str(tmp_path / "clean")
    handle = foreach_batch_incremental_kll(clean, "value", K)
    for bi, b in enumerate(BATCHES):
        handle(_df(spark, b), bi)
    want = _rows_dict(read_sketch_rows(spark, clean))

    for kill_at in crash_offsets(3 * len(BATCHES)):
        state_dir = str(tmp_path / f"k{kill_at}")
        staging = f"{state_dir}.staging"
        h = foreach_batch_incremental_kll(state_dir, "value", K)
        step = 0
        killed = False
        for bi, vals in enumerate(BATCHES):
            batch = _df(spark, vals)
            if killed:
                h(batch, bi)
                continue
            # replicate the handler's step sequence
            if os.path.exists(staging) and not os.path.exists(state_dir):
                os.rename(staging, state_dir)
            merged = (
                read_sketch_rows(spark, state_dir)
                .unionByName(kll_sketch(batch, "value", K))
                .groupBy(F.lit(1).alias("g"))
                .applyInPandas(
                    lambda _, pdf: merge_sketch_rows(pdf, K),
                    SKETCH_SCHEMA,
                )
            )
            meta = spark.createDataFrame(
                [(_BATCH_META_LEVEL, float(_BATCH_META_LEVEL), bi)],
                SKETCH_SCHEMA,
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
        got = _rows_dict(read_sketch_rows(spark, state_dir))
        assert got == want, f"kill_at={kill_at}"
        _check_bound(spark, state_dir)


def test_partial_staging_from_mid_write_crash_is_discarded(
    spark, tmp_path
):
    """Same mid-write-crash window as the CUSUM sink: a partial staging
    dir with no _SUCCESS marker and no state_dir must be deleted, not
    promoted — promotion would refold the redelivered batch on top of
    the partial rows and break exact weight conservation."""
    import os

    clean = str(tmp_path / "clean")
    handle = foreach_batch_incremental_kll(clean, "value", k=K)
    for bi, vals in enumerate(BATCHES):
        handle(_df(spark, vals), bi)
    want = _rows_dict(read_sketch_rows(spark, clean))

    state_dir = str(tmp_path / "crashy")
    staging = f"{state_dir}.staging"
    from economic_data_etl_spark.operators.kll import kll_sketch

    kll_sketch(_df(spark, BATCHES[0]), "value", k=K).write.mode(
        "overwrite"
    ).parquet(staging)
    os.remove(os.path.join(staging, "_SUCCESS"))

    h = foreach_batch_incremental_kll(state_dir, "value", k=K)
    for bi, vals in enumerate(BATCHES):  # batch 0 is the redelivery
        h(_df(spark, vals), bi)
    assert _rows_dict(read_sketch_rows(spark, state_dir)) == want
    assert not os.path.exists(staging)
