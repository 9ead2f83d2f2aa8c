"""Dump .explain('formatted') for named queries to plans/r13/<q>_<tag>.txt."""
import sys
from pyspark.sql import SparkSession
from economic_data_etl_spark.plans import REGISTRY
from economic_data_etl_spark.session import get_spark

def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark(app_name="plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    for n in names:
        df = REGISTRY[n].spark(spark, sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = f"plans/r13/{n}_{tag}.txt"
        with open(path, "w") as f:
            f.write(txt)
        print(path, len(txt.splitlines()), "lines",
              "Exchanges:", txt.count("Exchange"),
              "Joins:", txt.count("Join"),
              "Scans:", txt.count("Scan parquet"))
    spark.stop()

main()
