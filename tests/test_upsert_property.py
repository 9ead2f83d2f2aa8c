"""Property-style upsert tests (SURVEY.md §7 M7): random revision patterns
checked against a driver-side dict model of MERGE semantics."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from economic_data_etl_spark.operators import upsert as U

KEYS = ["series_id", "date"]
COMPARE = ["value"]
SCHEMA = "series_id string, date date, value double"

_dates = st.integers(min_value=0, max_value=5).map(
    lambda i: datetime.date(2023, 1, 1) + datetime.timedelta(days=i)
)
_values = st.one_of(st.none(), st.floats(min_value=-100, max_value=100, width=32))
_batch = st.dictionaries(
    st.tuples(st.sampled_from(["A", "B"]), _dates), _values, max_size=8
)


def _df(spark, batch):
    rows = [(k[0], k[1], v) for k, v in batch.items()]
    return spark.createDataFrame(rows, SCHEMA) if rows else spark.createDataFrame([], SCHEMA)


def _model_eq(a, b, eps=1e-9):
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    return abs(a - b) < eps


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(existing=_batch, incoming=_batch)
def test_upsert_matches_dict_model(spark, existing, incoming):
    res = U.upsert(_df(spark, existing), _df(spark, incoming), KEYS, COMPARE)

    # model: classify each incoming key against existing
    want = {"inserted": 0, "updated": 0, "unchanged": 0}
    for k, v in incoming.items():
        if k not in existing:
            want["inserted"] += 1
        elif _model_eq(existing[k], v):
            want["unchanged"] += 1
        else:
            want["updated"] += 1
    assert res.stats == want

    # model: merged content = existing overridden by incoming
    merged_model = {**existing, **incoming}
    merged = {
        (r["series_id"], r["date"]): r["value"] for r in res.merged.collect()
    }
    assert set(merged) == set(merged_model)
    for k in merged_model:
        a, b = merged[k], merged_model[k]
        assert (a is None) == (b is None)
        if a is not None:
            assert abs(a - b) < 1e-6
