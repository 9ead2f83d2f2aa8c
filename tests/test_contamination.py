"""Decontamination operator semantics on hand-built corpora."""

from __future__ import annotations

from pyspark.sql import functions as F

from economic_data_etl_spark.operators.contamination import (
    contamination_report,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_verbatim_copy_is_worst_offender(spark):
    bench = _df(spark, [(100, "alpha beta gamma delta epsilon zeta")])
    train = _df(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta"),  # verbatim copy
            (2, "alpha beta gamma unrelated words here"),  # partial
            (3, "totally different text with nothing shared"),
        ],
    )
    rows = {
        r["train_id"]: r
        for r in contamination_report(
            train, bench, "doc_id", "text", n=3, min_overlap=1
        ).collect()
    }
    # verbatim copy shares all 4 shingles of the 6-token doc
    assert rows[1]["max_overlap"] == 4
    assert rows[1]["worst_bench_id"] == 100
    # partial overlap shares exactly the 1 shingle 'alpha beta gamma'
    assert rows[2]["max_overlap"] == 1
    assert 3 not in rows


def test_min_overlap_threshold_filters(spark):
    bench = _df(spark, [(100, "a b c d e f")])
    train = _df(spark, [(1, "a b c x y z")])  # shares 1 shingle
    out = contamination_report(
        train, bench, "doc_id", "text", n=3, min_overlap=2
    )
    assert out.count() == 0


def test_ties_break_to_smallest_bench_id(spark):
    bench = _df(spark, [(200, "p q r s"), (100, "p q r s")])
    train = _df(spark, [(1, "p q r s")])
    row = contamination_report(
        train, bench, "doc_id", "text", n=3, min_overlap=1
    ).collect()[0]
    assert row["n_bench_hits"] == 2
    assert row["worst_bench_id"] == 100


def test_bench_side_is_broadcast(spark):
    bench = _df(spark, [(100, "a b c d")])
    train = _df(spark, [(1, "a b c d")])
    plan = contamination_report(
        train, bench, "doc_id", "text"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
