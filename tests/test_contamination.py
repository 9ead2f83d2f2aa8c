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


class TestContaminationExcision:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_planted_overlap_is_excised_exactly(self, spark):
        from economic_data_etl_spark.operators.contamination import (
            remove_contaminated_spans,
        )

        bench = self._df(spark, [(100, "the quick brown fox jumps")])
        train = self._df(
            spark,
            [
                # overlap 'the quick brown fox' (k=3 windows at 0 and 1)
                # -> span [0, 4) excised
                (0, "the quick brown fox went home today"),
                (1, "nothing shared with any benchmark document here"),
                (2, ""),  # empty doc survives untouched
            ],
        )
        got = {
            r.doc_id: (r.clean_text, r.n_clean_tokens)
            for r in remove_contaminated_spans(
                train, bench, "doc_id", "text", 3
            ).collect()
        }
        assert got[0] == ("went home today", 3)
        assert got[1] == (
            "nothing shared with any benchmark document here",
            7,
        )
        assert got[2] == ("", 0)

    def test_adjacent_hits_merge_into_one_span(self, spark):
        from economic_data_etl_spark.operators.contamination import (
            contaminated_spans,
        )

        bench = self._df(spark, [(100, "a b c x y z")])
        # 'a b c' hits at pos 0 and 'x y z' at pos 3: intervals
        # [0,3) and [3,6) are adjacent -> ONE merged span [0,6)
        train = self._df(spark, [(0, "a b c x y z tail words here")])
        spans = contaminated_spans(
            train, bench, "doc_id", "text", 3
        ).collect()
        assert [(s.span_start, s.span_end) for s in spans] == [(0, 6)]

    def test_fully_contaminated_doc_empties(self, spark):
        from economic_data_etl_spark.operators.contamination import (
            remove_contaminated_spans,
        )

        bench = self._df(spark, [(100, "w1 w2 w3 w4")])
        train = self._df(spark, [(0, "w1 w2 w3 w4")])
        row = remove_contaminated_spans(
            train, bench, "doc_id", "text", 3
        ).collect()[0]
        assert row.clean_text == "" and row.n_clean_tokens == 0
