"""Two-phase global rank (operators/rank.py): the distributed row
number must match a plain sort enumeration on every edge — NULL leading
keys, heavy ties, empty input, and bucket counts smaller than rows —
and the closed-form NTILE must match SQL NTILE semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from economic_data_etl_spark.operators.rank import (
    ntile_from_row_number,
    with_global_row_number,
)


def _check(spark, rows, parts):
    df = spark.createDataFrame(rows, "k double, id long")
    got = {
        r.id: r.rn
        for r in with_global_row_number(
            df, ["k", "id"], out="rn", num_partitions=parts
        ).collect()
    }
    want = {
        row[1]: i + 1
        for i, row in enumerate(
            sorted(rows, key=lambda r: (r[0] is not None, r[0] or 0, r[1]))
        )
    }
    assert got == want


def test_matches_sorted_enumeration(spark):
    rows = [(float((v * 37) % 101), v) for v in range(500)]
    _check(spark, rows, 8)


def test_nulls_rank_first_and_ties_break_on_id(spark):
    rows = [(None, 3), (1.0, 2), (None, 1), (1.0, 0), (0.5, 4)]
    _check(spark, rows, 4)


def test_heavy_ties_single_value(spark):
    # one massively repeated leading key: everything lands in one
    # bucket (documented skew shape); ranks must still be exact.
    rows = [(7.0, v) for v in range(200)] + [(1.0, 500), (9.0, 501)]
    _check(spark, rows, 8)


def test_empty_input(spark):
    df = spark.createDataFrame([], "k double, id long")
    assert (
        with_global_row_number(df, ["k", "id"], num_partitions=4).count()
        == 0
    )


def test_more_partitions_than_rows(spark):
    _check(spark, [(2.0, 0), (1.0, 1)], 16)


def test_ntile_matches_sql_ntile(spark):
    n = 23
    df = spark.createDataFrame(
        [(float(v), v) for v in range(n)], "k double, id long"
    )
    ranked = with_global_row_number(df, ["k", "id"], num_partitions=4)
    got = (
        ranked.select(
            "id",
            ntile_from_row_number(
                F.col("rn"), F.lit(n).cast("long"), 10
            ).alias("t"),
        )
        .orderBy("id")
        .collect()
    )
    want = spark.sql(
        f"SELECT id, NTILE(10) OVER (ORDER BY k, id) AS t FROM "
        f"(SELECT CAST(v AS DOUBLE) k, v id FROM "
        f"(SELECT explode(sequence(0, {n - 1})) v)) ORDER BY id"
    ).collect()
    assert [(r.id, r.t) for r in got] == [(r.id, r.t) for r in want]


def test_ntile_fewer_rows_than_buckets(spark):
    n = 3
    df = spark.createDataFrame(
        [(float(v), v) for v in range(n)], "k double, id long"
    )
    ranked = with_global_row_number(df, ["k", "id"], num_partitions=4)
    got = sorted(
        (r.id, r.t)
        for r in ranked.select(
            "id",
            ntile_from_row_number(
                F.col("rn"), F.lit(n).cast("long"), 10
            ).alias("t"),
        ).collect()
    )
    assert got == [(0, 1), (1, 2), (2, 3)]


def test_global_cumsum_matches_sorted_prefix_sums(spark):
    from economic_data_etl_spark.operators.rank import with_global_cumsum

    rows = [(float((v * 37) % 101), v, v % 5, 2 * v % 7) for v in range(400)]
    df = spark.createDataFrame(rows, "k double, id long, x long, y long")
    got = {
        r.id: (r.cum_x, r.cum_y)
        for r in with_global_cumsum(
            df, ["k", "id"], ["x", "y"], num_partitions=8
        ).collect()
    }
    run_x = run_y = 0
    for k, vid, x, y in sorted(rows):
        run_x += x
        run_y += y
        assert got[vid] == (run_x, run_y), vid


def test_global_cumsum_heavy_ties_one_bucket(spark):
    from economic_data_etl_spark.operators.rank import with_global_cumsum

    rows = [(5.0, v, 1) for v in range(300)]
    df = spark.createDataFrame(rows, "k double, id long, x long")
    got = sorted(
        r.cum_x
        for r in with_global_cumsum(
            df, ["k", "id"], ["x"], num_partitions=8
        ).collect()
    )
    assert got == list(range(1, 301))
