"""Property test: the blocked fuzzy join finds EXACTLY the pairs a
brute-force all-pairs levenshtein finds — blocking loses nothing and
adds nothing, for arbitrary strings (including empty and unicode-ish
short alphabets that force heavy bucket collisions)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from economic_data_etl_spark.operators.linkage import fuzzy_pairs


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb),
                )
            )
        prev = cur
    return prev[-1]


def _brute(names: list[str], max_dist: int) -> set[tuple[str, str, int]]:
    uniq = sorted(set(names))
    out = set()
    for i, x in enumerate(uniq):
        for y in uniq[i + 1 :]:
            d = _lev(x, y)
            if d <= max_dist:
                out.add((x, y, d))
    return out


@settings(max_examples=15, deadline=None)
@given(
    names=st.lists(
        st.text(alphabet="abc", min_size=0, max_size=6),
        min_size=0,
        max_size=25,
    ),
    max_dist=st.integers(min_value=1, max_value=3),
)
def test_blocked_equals_bruteforce(spark, names, max_dist):
    df = spark.createDataFrame(
        [(n,) for n in names] or [("",)], "name string"
    )
    if not names:
        df = df.filter("name <> ''")
    got = {
        (r.name1, r.name2, r.lev_dist)
        for r in fuzzy_pairs(df, "name", max_dist).collect()
    }
    assert got == _brute(names, max_dist)
