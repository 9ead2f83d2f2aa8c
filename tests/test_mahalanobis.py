"""Planted Mahalanobis-outlier test: the correlation-breaking point
outranks a larger-magnitude on-axis point."""

from __future__ import annotations

import pytest

from economic_data_etl_spark.plans import REGISTRY


def _write_lineitem(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [
            (ok, 1, 1, ln, float(q), float(p), 0.0, 0.0, "N", "O",
             None)
            for ok, ln, q, p in rows
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    )
    df.write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )


def test_off_axis_point_is_top_outlier(spark, tmp_path):
    """Strongly correlated cloud y ~= 100x, one point ON the axis far
    out (large Euclidean distance) and one point OFF the axis nearby
    in Euclidean terms — Mahalanobis must rank the off-axis point
    first, which is the whole point of using the covariance."""
    cloud = [(i, 1, q, 100 * q + (1 if i % 2 else -1))
             for i, q in enumerate(range(10, 30), start=10)]
    on_axis = [(100, 1, 60, 6000)]       # far along the correlation
    off_axis = [(200, 1, 20, 3500)]      # breaks the correlation
    _write_lineitem(spark, tmp_path, cloud + on_axis + off_axis)
    out = REGISTRY["ml_mahalanobis_outliers"].spark(
        spark, str(tmp_path)
    ).collect()
    assert out[0]["l_orderkey"] == 200
    assert out[0]["rank"] == 1
    # reference d2 via numpy on the same population covariance
    import numpy as np

    pts = np.array(
        [(q, p) for _, _, q, p in cloud + on_axis + off_axis],
        dtype=float,
    )
    mu = pts.mean(axis=0)
    cov = np.cov(pts.T, bias=True)
    inv = np.linalg.inv(cov)
    d = pts[-1] - mu
    ref = float(d @ inv @ d)
    assert out[0]["d2"] == pytest.approx(ref, rel=1e-6)
