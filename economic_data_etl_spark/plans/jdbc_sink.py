"""Driver-certified JDBC upsert (S6/S7's database tier).

The JDBC sink (sources/jdbc.py) mirrors the reference's DATABASE_URL
load path (reference src/load.py:42-134: pandas ``to_sql`` + per-row
UPDATE loop) with a set-oriented stage + DELETE/INSERT apply. It has
always been Derby-tested locally (tests/test_jdbc.py) but never had a
value-checked driver row; this query closes that gap by staging a real
upsert through the sink inside the query builder and reporting the
outcome — stats triple plus a final-table checksum — against a DuckDB
oracle that recomputes the same upsert relationally from the parquet
tables.

Derivation (deterministic, from `orders`): the "existing" table is
orders with o_orderkey % 4 != 0 (value = total price in cents, an
exact BIGINT so the checksum is order-insensitive integer math); the
"incoming" batch is the even keys, with the value perturbed (+7) when
o_orderkey % 8 == 2. That yields all three classes: keys ≡ 0 (mod 4)
are inserted (absent from existing), keys ≡ 2 (mod 8) are updated,
keys ≡ 6 (mod 8) are unchanged.

Scale note: a JDBC target holds dimension/fact summaries, never the
raw corpus — the database is the bottleneck by construction. The
Spark side stays set-oriented end to end (one classify join, staged
batch write, two set-based DML statements); nothing here is per-row
driver work, so the same plan shape holds whether the target is this
embedded in-memory Derby or a production Postgres.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.plans.catalog import register
from economic_data_etl_spark.sources.jdbc import (
    jdbc_append,
    jdbc_connection,
    jdbc_read,
    jdbc_upsert,
)
from economic_data_etl_spark.sources.tables import load_table

_TARGET = "jdbc_upsert_target"


def _orders_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → (k, v) with v = total price in CENTS (exact BIGINT):
    float sums are order-sensitive across engines, integer sums are
    not, so the final-table checksum hashes identically. ROUND lands
    ~0.5 from the nearest tie (2-decimal prices), so HALF_UP (Spark)
    and half-even (DuckDB) agree on every row."""
    return load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("v"),
    )


def _drop_memory_db(spark: SparkSession, db: str) -> None:
    """Derby in-memory databases are dropped via the drop=true URL
    attribute, which SIGNALS success with SQLException 08006."""
    try:
        with jdbc_connection(spark, f"jdbc:derby:{db};drop=true"):
            pass
    except Exception:  # noqa: BLE001 — 08006 is the success path
        pass


@register(
    "jdbc_upsert_order_stats",
    oracle="""
        WITH existing AS (
            SELECT o_orderkey AS k,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
            FROM orders WHERE o_orderkey % 4 <> 0
        ),
        incoming AS (
            SELECT o_orderkey AS k,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT)
                     + CASE WHEN o_orderkey % 8 = 2 THEN 7 ELSE 0 END AS v
            FROM orders WHERE o_orderkey % 2 = 0
        ),
        cls AS (
            SELECT i.k, i.v,
                   CASE WHEN e.k IS NULL THEN 'inserted'
                        WHEN e.v = i.v THEN 'unchanged'
                        ELSE 'updated' END AS st
            FROM incoming i LEFT JOIN existing e ON i.k = e.k
        ),
        final AS (
            SELECT COALESCE(i.v, e.v) AS v
            FROM existing e FULL JOIN incoming i ON e.k = i.k
        )
        SELECT
            (SELECT COUNT(*) FROM cls WHERE st = 'inserted')  AS n_inserted,
            (SELECT COUNT(*) FROM cls WHERE st = 'updated')   AS n_updated,
            (SELECT COUNT(*) FROM cls WHERE st = 'unchanged') AS n_unchanged,
            (SELECT COUNT(*) FROM final)                      AS final_rows,
            -- DuckDB SUM(BIGINT) yields HUGEINT (pandas float); pin the
            -- exact integer type the Spark side carries
            (SELECT CAST(SUM(v) AS BIGINT) FROM final)        AS final_cents_sum
    """,
    doc="Stage a real upsert through the JDBC sink (embedded Derby); "
    "report the stats triple + final-table checksum. Oracle recomputes "
    "the upsert relationally.",
)
def jdbc_upsert_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Derby boots once per JVM; point its home (derby.log) at tmp
    # BEFORE the first connection so the engine never litters the CWD.
    spark._jvm.java.lang.System.setProperty(  # noqa: SLF001
        "derby.system.home", tempfile.gettempdir()
    )
    db = f"memory:upsert_{uuid.uuid4().hex}"
    url = f"jdbc:derby:{db};create=true"
    kv = _orders_kv(spark, sf_dir)
    try:
        existing = kv.filter(F.col("k") % 4 != 0)
        incoming = kv.filter(F.col("k") % 2 == 0).withColumn(
            "v",
            F.col("v")
            + F.when(F.col("k") % 8 == 2, F.lit(7)).otherwise(F.lit(0)),
        )
        # creates the target with Spark's JDBC type mapping (all-numeric
        # columns, so no CLOB pitfalls) and populates it
        jdbc_append(existing, url, _TARGET, mode="overwrite")
        stats = jdbc_upsert(
            spark, incoming, url, _TARGET, keys=["k"], compare_cols=["v"]
        )
        # Materialize the checksum EAGERLY (one aggregated row — bounded
        # at any scale): the in-memory database is dropped on exit, so a
        # lazy plan over jdbc_read would scan a vanished table when the
        # caller finally collects.
        row = (
            jdbc_read(spark, url, _TARGET)
            .agg(
                F.count(F.lit(1)).alias("final_rows"),
                F.sum("v").alias("final_cents_sum"),
            )
            .collect()[0]
        )
        return spark.createDataFrame(
            [
                (
                    stats["inserted"],
                    stats["updated"],
                    stats["unchanged"],
                    row["final_rows"],
                    row["final_cents_sum"],
                )
            ],
            "n_inserted long, n_updated long, n_unchanged long, "
            "final_rows long, final_cents_sum long",
        )
    finally:
        _drop_memory_db(spark, db)
