"""Python UDTFs (Spark 4 user-defined table functions, SURVEY.md §2.11).

A UDTF is the lateral-join escape hatch: one input row → many output rows
with a declared schema, callable from SQL (`LATERAL bigrams(text)`) or
the DataFrame API. Used where a table-generating transform has genuinely
row-local logic; set-expressible expansions (posexplode etc.) stay native.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="bigram: string, pos: int")
class Bigrams:
    """Emit consecutive word pairs with their position."""

    def eval(self, text: str):
        if text is None:
            return
        words = [w for w in text.split() if w]
        for i in range(len(words) - 1):
            yield f"{words[i]} {words[i + 1]}", i


@udtf(returnType="start: date, stop: date")
class MonthSpans:
    """Expand a [start, stop] date range into calendar-month spans —
    the ingest-backfill planner's unit of work."""

    def eval(self, start, stop):
        import datetime

        if start is None or stop is None:
            return
        cur = start.replace(day=1)
        while cur <= stop:
            nxt = (cur.replace(day=28) + datetime.timedelta(days=4)).replace(day=1)
            span_end = min(nxt - datetime.timedelta(days=1), stop)
            yield max(cur, start), span_end
            cur = nxt


def register_udtfs(spark) -> None:
    spark.udtf.register("bigrams", Bigrams)
    spark.udtf.register("month_spans", MonthSpans)
