"""One-shot audit: compare pandas dtype KINDS between each Spark catalog
query (.toPandas()) and its DuckDB oracle (.df()) at sf0.001.

The driver hashes values after a pandas conversion, so a DuckDB HUGEINT
(SUM over INT literals) that lands as float64/object breaks the hash even
when fetchall()-level values match — exactly how q12 failed in round 1.
This audit catches that entire class before the driver does.
"""

from __future__ import annotations

import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")

from economic_data_etl_spark.plans import REGISTRY  # noqa: E402
from economic_data_etl_spark.sources.tables import TABLES  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def kind(dtype) -> str:
    k = dtype.kind  # i,u,f,b,M,m,O
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    return "object"


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    bad = []
    names = [n for n, q in REGISTRY.items() if q.oracle is not None]
    for i, name in enumerate(names):
        q = REGISTRY[name]
        try:
            spdf = q.spark(spark, SF_DIR).toPandas()
            dpdf = con.execute(q.oracle).df()
        except Exception as e:  # noqa: BLE001
            bad.append((name, "ERROR", str(e)[:200]))
            print(f"[{i + 1}/{len(names)}] {name}: ERROR {e}", flush=True)
            continue
        s_kinds = {c.lower(): kind(spdf[c].dtype) for c in spdf.columns}
        d_kinds = {c.lower(): kind(dpdf[c].dtype) for c in dpdf.columns}
        diffs = []
        for c in sorted(set(s_kinds) | set(d_kinds)):
            sk, dk = s_kinds.get(c), d_kinds.get(c)
            if sk != dk:
                # empty frames: pandas defaults every column to object —
                # only a real drift if both sides have rows
                if len(spdf) == 0 and len(dpdf) == 0:
                    continue
                diffs.append(f"{c}: spark={sk} duck={dk}")
        status = "OK" if not diffs else "DRIFT"
        if diffs:
            bad.append((name, "DRIFT", "; ".join(diffs)))
        print(f"[{i + 1}/{len(names)}] {name}: {status} {'; '.join(diffs)}", flush=True)

    print("\n=== SUMMARY ===")
    for name, status, detail in bad:
        print(f"{status} {name}: {detail}")
    print(f"{len(bad)} of {len(names)} queries flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
