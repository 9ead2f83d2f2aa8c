"""asof_join direction semantics vs pandas merge_asof (the de-facto
reference implementation), plus the documented nearest-tie rule.

Timestamps are integers spaced so no left/right pair is equidistant
(left even, right odd) — pandas and our operator may lawfully differ on
equidistant nearest ties, so the randomized check avoids them and a
handcrafted case pins OUR rule (backward wins) explicitly.
"""

from __future__ import annotations

import pandas as pd
import pytest

from economic_data_etl_spark.operators.asof import asof_join


def _spark_asof(spark, left_pd, right_pd, direction):
    left = spark.createDataFrame(left_pd)
    right = spark.createDataFrame(right_pd)
    out = asof_join(
        left,
        right,
        on="k",
        left_ts="ts",
        right_ts="rts",
        right_payload=["v"],
        suffix="_m",
        direction=direction,
    )
    return (
        out.toPandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)[["k", "ts", "v_m"]]
    )


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_matches_pandas_merge_asof(spark, direction):
    import numpy as np

    rng = np.random.default_rng(7)
    left_pd = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 200),
            "ts": rng.choice(np.arange(0, 4000, 2), 200, replace=False).astype(
                "int64"
            ),
        }
    ).sort_values("ts")
    right_pd = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 150),
            "rts": rng.choice(
                np.arange(1, 4001, 2), 150, replace=False
            ).astype("int64"),
        }
    ).sort_values("rts")
    right_pd["v"] = right_pd["rts"] * 10

    got = _spark_asof(spark, left_pd, right_pd, direction)
    want = (
        pd.merge_asof(
            left_pd,
            right_pd,
            left_on="ts",
            right_on="rts",
            by="k",
            direction=direction,
        )
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
        .rename(columns={"v": "v_m"})[["k", "ts", "v_m"]]
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_nearest_tie_prefers_backward(spark):
    left_pd = pd.DataFrame({"k": [1], "ts": [10]})
    right_pd = pd.DataFrame({"k": [1, 1], "rts": [8, 12], "v": [80, 120]})
    got = _spark_asof(spark, left_pd, right_pd, "nearest")
    assert got["v_m"].tolist() == [80]


def test_forward_inclusive_at_equal_ts(spark):
    left_pd = pd.DataFrame({"k": [1], "ts": [10]})
    right_pd = pd.DataFrame({"k": [1, 1], "rts": [10, 11], "v": [100, 110]})
    got = _spark_asof(spark, left_pd, right_pd, "forward")
    assert got["v_m"].tolist() == [100]


def test_null_payload_row_still_wins(spark):
    """A matched right row whose payload is genuinely NULL must be the
    match (merge_asof semantics) — not skipped in favor of a stale
    earlier row (the failure mode of filling payload columns
    independently with ignorenulls)."""
    left_pd = pd.DataFrame({"k": [1], "ts": [10]})
    right_pd = pd.DataFrame(
        {"k": [1, 1], "rts": [2, 8], "v": [20.0, None]}
    )
    for direction in ("backward", "nearest"):
        got = _spark_asof(spark, left_pd, right_pd, direction)
        assert got["v_m"].isna().all(), direction
