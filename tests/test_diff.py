"""Snapshot diff: classification correctness incl. null semantics."""

from __future__ import annotations

from economic_data_etl_spark.operators.diff import diff_summary, table_diff

SCHEMA = "k long, a string, b double"


class TestTableDiff:
    def test_all_four_classes(self, spark):
        old = spark.createDataFrame(
            [
                (1, "x", 1.0),   # unchanged
                (2, "y", 2.0),   # updated (b changes)
                (3, "z", 3.0),   # deleted
                (5, None, 5.0),  # unchanged with NULL (null-safe equal)
                (6, "q", None),  # updated: NULL -> value
            ],
            SCHEMA,
        )
        new = spark.createDataFrame(
            [
                (1, "x", 1.0),
                (2, "y", 2.5),
                (4, "w", 4.0),   # inserted
                (5, None, 5.0),
                (6, "q", 6.0),
            ],
            SCHEMA,
        )
        got = {
            r["k"]: r["change"]
            for r in table_diff(old, new, ["k"]).collect()
        }
        assert got == {
            1: "unchanged",
            2: "updated",
            3: "deleted",
            4: "inserted",
            5: "unchanged",
            6: "updated",
        }
        counts = {
            r["change"]: r["n"]
            for r in diff_summary(old, new, ["k"]).collect()
        }
        assert counts == {
            "unchanged": 2,
            "updated": 2,
            "deleted": 1,
            "inserted": 1,
        }

    def test_compare_cols_subset(self, spark):
        old = spark.createDataFrame([(1, "x", 1.0)], SCHEMA)
        new = spark.createDataFrame([(1, "CHANGED", 1.0)], SCHEMA)
        only_b = table_diff(old, new, ["k"], compare_cols=["b"]).collect()
        assert only_b[0]["change"] == "unchanged"
