"""Property tests for IPF raking (operators/ipf.py): on ANY positive
contingency table whose row and column targets share a total, the final
COLUMN sweep calibrates column margins exactly, total mass equals the
target mass, and weights stay positive — the convergence facts survey
calibration relies on, independent of the orders-table fixture."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from economic_data_etl_spark.operators.ipf import ipf_rake

_ROWS = ("r0", "r1", "r2")
_COLS = ("c0", "c1")


@st.composite
def _tables(draw):
    """Cell counts >= 1 (every row/col present) plus positive margin
    targets rescaled to a shared total."""
    cells = {
        (r, c): draw(st.integers(min_value=1, max_value=50))
        for r in _ROWS
        for c in _COLS
    }
    row_t = {
        r: draw(st.integers(min_value=1, max_value=50)) for r in _ROWS
    }
    col_t = {
        c: draw(st.integers(min_value=1, max_value=50)) for c in _COLS
    }
    # rescale both target sets to the column-target total so the sweeps
    # have a consistent mass to converge to
    total = float(sum(col_t.values()))
    row_scale = total / sum(row_t.values())
    return (
        cells,
        {r: v * row_scale for r, v in row_t.items()},
        {c: float(v) for c, v in col_t.items()},
    )


@settings(max_examples=8, deadline=None)
@given(_tables())
def test_column_sweep_calibrates_margins(spark, table):
    cells, row_t, col_t = table
    df = spark.createDataFrame(
        [
            (r, c, float(n), row_t[r], col_t[c])
            for (r, c), n in cells.items()
        ],
        "pri string, st string, w double, rt double, ctg double",
    )
    out = ipf_rake(df, iters=3).collect()
    assert all(r.w > 0 for r in out)
    got_cols: dict[str, float] = {}
    for r in out:
        got_cols[r.st] = got_cols.get(r.st, 0.0) + r.w
    for c, target in col_t.items():
        assert abs(got_cols[c] - target) < 1e-9 * max(1.0, target), (
            c,
            got_cols[c],
            target,
        )
    assert (
        abs(sum(got_cols.values()) - sum(col_t.values()))
        < 1e-9 * sum(col_t.values())
    )
