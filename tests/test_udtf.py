"""Python UDTF surface: SQL-lateral expansion with declared schemas."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from economic_data_etl_spark.functions.udtfs import Bigrams, register_udtfs
from economic_data_etl_spark.sources.tables import load_table


class TestBigramsUdtf:
    def test_matches_native_expansion(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
        docs.createOrReplaceTempView("__udtf_docs")
        register_udtfs(spark)

        got = spark.sql(
            """
            SELECT doc_id, b.bigram, b.pos
            FROM __udtf_docs, LATERAL bigrams(text) AS b
            ORDER BY doc_id, pos
            """
        ).collect()

        # native equivalent: zip words with their successors
        toks = F.filter(F.split("text", "\\s+"), lambda t: t != "")
        native = (
            docs.select(
                "doc_id",
                F.posexplode(
                    F.zip_with(
                        F.slice(toks, 1, F.size(toks) - 1),
                        F.slice(toks, 2, F.size(toks) - 1),
                        lambda a, b: F.concat_ws(" ", a, b),
                    )
                ).alias("pos", "bigram"),
            )
            .orderBy("doc_id", "pos")
            .collect()
        )
        assert [(r["doc_id"], r["bigram"], r["pos"]) for r in got] == [
            (r["doc_id"], r["bigram"], r["pos"]) for r in native
        ]


class TestMonthSpansUdtf:
    def test_expands_backfill_ranges(self, spark):
        register_udtfs(spark)
        spark.createDataFrame(
            [(datetime.date(2023, 11, 15), datetime.date(2024, 2, 10))],
            "lo date, hi date",
        ).createOrReplaceTempView("__udtf_range")
        rows = spark.sql(
            """
            SELECT m.start, m.stop
            FROM __udtf_range, LATERAL month_spans(lo, hi) AS m
            ORDER BY m.start
            """
        ).collect()
        spans = [(r["start"], r["stop"]) for r in rows]
        assert spans == [
            (datetime.date(2023, 11, 15), datetime.date(2023, 11, 30)),
            (datetime.date(2023, 12, 1), datetime.date(2023, 12, 31)),
            (datetime.date(2024, 1, 1), datetime.date(2024, 1, 31)),
            (datetime.date(2024, 2, 1), datetime.date(2024, 2, 10)),
        ]
