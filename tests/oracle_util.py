"""Local replica of the driver's correctness gate: run a catalog query in
Spark and its oracle SQL in DuckDB on the same parquet tables, compare row
count, column names, and order-insensitive values."""

from __future__ import annotations

import math
import struct

import duckdb

from economic_data_etl_spark.sources.tables import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql)


def _norm_lenient(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 vs 0.0 and float repr jitter at the 6th decimal
        return round(v, 6) + 0.0
    return v


def _norm_strict(v):
    """Bitwise float identity, matching the driver's exact value hash:
    preserves the sign of zero and every ulp (a -0.0 vs +0.0 divergence
    slipped past the old round-to-6 normalization — CORRECTNESS_r03's
    curation_weighted_sample red)."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return struct.pack("<d", v)
    return v


def compare_query(spark, query_fn, oracle: str, sf_dir: str, *, strict: bool = True) -> None:
    _norm = _norm_strict if strict else _norm_lenient
    sdf = query_fn(spark, sf_dir)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(_norm(v) for v in row) for row in sdf.collect()]

    cur = run_oracle(oracle, sf_dir)
    duck_cols = [d[0].lower() for d in cur.description]
    duck_rows = [tuple(_norm(v) for v in row) for row in cur.fetchall()]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={spark_cols} duck={duck_cols}"
    )
    # reorder both to sorted column order, then sort rows; None is not
    # comparable to other types in Python, so sort by a type-ranked key
    def row_key(row):
        return tuple((v is None, str(type(v)), str(v)) for v in row)

    s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
    d_idx = [duck_cols.index(c) for c in sorted(duck_cols)]
    s_sorted = sorted(
        (tuple(r[i] for i in s_idx) for r in spark_rows), key=row_key
    )
    d_sorted = sorted(
        (tuple(r[i] for i in d_idx) for r in duck_rows), key=row_key
    )
    assert len(s_sorted) == len(d_sorted), (
        f"row count mismatch: spark={len(s_sorted)} duck={len(d_sorted)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_sorted, d_sorted)) if a != b
    ]
    assert not mismatches, f"value mismatch (first 5): {mismatches[:5]}"
