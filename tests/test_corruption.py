"""T5-style span corruption (operators/corruption.py): the Spark
rendering must match an independent pure-Python reference on every
doc — span starts, interval merging, sentinel numbering, clamping at
the document end, and the no-span / empty-doc passthroughs."""

from __future__ import annotations

import hashlib

from economic_data_etl_spark.operators.corruption import (
    SALT,
    corrupt_spans,
)

PCT, L = 5, 3


def _bucket(doc_id: int, p: int) -> int:
    h = hashlib.md5(f"{SALT}{doc_id}:{p}".encode()).hexdigest()
    return int(h[:4], 16)


def _reference(doc_id: int, text: str):
    w = [t for t in text.split() if t]
    n = len(w)
    starts = [p for p in range(n) if _bucket(doc_id, p) % 100 < PCT]
    spans: list[list[int]] = []
    for s in starts:
        e = min(s + L, n)
        if spans and s <= spans[-1][1]:
            spans[-1][1] = e
        else:
            spans.append([s, e])
    parts = []
    for p in range(n):
        at = [i for i, (st, _) in enumerate(spans) if st == p]
        if at:
            parts.append(f"<extra_id_{at[0]}>")
        elif any(st < p < en for st, en in spans):
            continue
        else:
            parts.append(w[p])
    inp = " ".join(parts)
    tgt = " ".join(
        f"<extra_id_{i}> " + " ".join(w[st:en])
        for i, (st, en) in enumerate(spans)
    )
    return inp, tgt, len(spans), sum(en - st for st, en in spans)


def test_matches_python_reference_on_varied_docs(spark):
    docs = [
        (i, " ".join(f"tok{(i * 31 + j) % 17}" for j in range(i % 40)))
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.input_text, r.target_text, r.n_spans, r.n_masked)
        for r in corrupt_spans(df, start_rate_pct=PCT, span_len=L)
        .collect()
    }
    hits = 0
    for doc_id, text in docs:
        want = _reference(doc_id, text)
        assert got[doc_id] == want, doc_id
        hits += want[2]
    assert hits > 0  # the fixture must actually mask something


def test_conservation_and_sentinel_grammar(spark):
    docs = [(i, " ".join(f"w{j}" for j in range(120))) for i in range(8)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for r in corrupt_spans(df, start_rate_pct=20, span_len=L).collect():
        # masked + surviving tokens == original tokens
        n_orig = 120
        inp_toks = r.input_text.split()
        n_sentinels = sum(
            1 for t in inp_toks if t.startswith("<extra_id_")
        )
        assert n_sentinels == r.n_spans
        assert len(inp_toks) - n_sentinels + r.n_masked == n_orig
        # sentinels numbered 0..n_spans-1 in order in BOTH renderings
        order_in = [
            t for t in inp_toks if t.startswith("<extra_id_")
        ]
        order_tg = [
            t for t in r.target_text.split()
            if t.startswith("<extra_id_")
        ]
        want = [f"<extra_id_{i}>" for i in range(r.n_spans)]
        assert order_in == want and order_tg == want


def test_empty_and_unmasked_docs_pass_through(spark):
    df = spark.createDataFrame(
        [(1000000, ""), (1000001, "a")], "doc_id long, text string"
    )
    rows = {
        r.doc_id: r
        for r in corrupt_spans(df, start_rate_pct=0, span_len=L)
        .collect()
    }
    assert rows[1000000].input_text == ""
    assert rows[1000000].target_text == ""
    assert rows[1000000].n_spans == 0
    assert rows[1000001].input_text == "a"
    assert rows[1000001].n_masked == 0
