"""Arrow-vectorized text statistics — the scale lanes for the two
heaviest per-document text passes.

Both operators here replace interpreted higher-order-function pipelines
with one Arrow-batched Python pass that emits ONLY small integer
statistics; every fraction, threshold verdict, and rounding step stays
in Spark expressions on those integers, so the float semantics of the
oracle-gated catalog queries are untouched (integer counts are exact on
both engines; a single double division of two exact integers is
correctly rounded and therefore bit-identical across engines — the same
argument that lets the ML-stats moments be computed anywhere).

Why this is the 100 TB shape:

- `char_trigram_counts`: the interpreted
  `transform(sequence(1,n), i -> substring(lt,i,3))` + explode builds
  one JVM string object per trigram INSTANCE (~1 per character of
  corpus). The vectorized lane packs each trigram into an int64
  (3 × 21-bit code points, offset by +1 so short tail grams stay
  injective) and pre-aggregates per Arrow batch with np.unique — what
  crosses from Python is at most |batch vocab| (key, count) rows, and
  what crosses the shuffle after the map-side combine is at most
  |vocab| rows per task, exactly like the expression lane. Measured at
  sf0.1: the trigram pass drops ~2.9 s → ~1 s
  (docs_char_trigram_entropy_by_source).
- `repetition_stats`: the Gopher top-token fraction is
  O(tokens × distinct) interpreted lambda steps per document in the
  expression lane (array_max over per-distinct filter counts). One
  Counter pass per document inside Arrow batches is O(tokens) with
  C-speed dict ops, and ships 5 ints per document.

Semantics are kept EXACTLY aligned with the expression lane (and the
DuckDB oracles):

- tokenization splits on Java's \\s class `[ \\t\\n\\x0B\\f\\r]+`
  (re's \\s is Unicode-aware and would diverge on e.g. \\xa0);
  empty strings are dropped, matching F.split + filter.
- trigram positions run over the ORIGINAL string length while slicing
  the LOWERED text — substring past the end yields short grams — the
  exact arithmetic of `substring(lower(text), i, 3)` with
  `i ≤ char_length(text) - 2`. Rows where lower() changes the string
  length (exotic code points) take a per-row slicing fallback through
  the same packing.
- bigram identity: distinct (tok_i, tok_{i+1}) pairs equal distinct
  space-joined strings because tokens cannot contain whitespace.

No reference counterpart (the reference has no text analytics); these
are the scale lanes for plans/corpus_stats.py / plans/text2.py.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Java \s — NOT Python's Unicode-aware \s (see module docstring).
_JAVA_WS = "[ \t\n\x0b\f\r]+"


def _pack_gram(g: str) -> int:
    """Injective int64 encoding of a 0–3 char gram: (cp+1) per slot,
    21 bits each, missing slots 0. Max code point 0x10FFFF → cp+1 fits
    21 bits; three slots top out below 2^63."""
    v = 0
    for j, ch in enumerate(g[:3]):
        v |= (ord(ch) + 1) << (42 - 21 * j)
    return v


def char_trigram_counts(
    docs: DataFrame, by_col: str, text_col: str = "text"
) -> DataFrame:
    """(by_col, g: long, c: long) — exact counts of character-trigram
    INSTANCES of lower(text), grouped by `by_col`, with each trigram
    packed injectively into an int64 (see _pack_gram). Callers that
    only need the distribution (entropy, perplexity, novelty) never
    need the string back.

    Shape: mapInPandas pre-aggregates each Arrow batch to its (by, g)
    vocabulary — the corpus itself never leaves the JVM→Arrow scan —
    then one map-side-combinable groupBy collapses batch partials to
    the global vocab-bounded table. Rows shorter than 3 chars
    contribute nothing (callers filter length >= 3 to mirror their
    oracles).
    """
    import numpy as np

    def _count(batches):
        for pdf in batches:
            per_by: dict[str, Counter] = {}
            for by, t in zip(pdf[by_col], pdf[text_col]):
                # NULL text contributes no trigrams (substring(NULL)
                # yields NULL in the expression lane) — degrade per row
                # instead of failing the job.
                if t is None:
                    continue
                n = len(t) - 2
                if n <= 0:
                    continue
                s = t.lower()
                acc = per_by.setdefault(by, Counter())
                if len(s) == len(t):
                    codes = np.frombuffer(
                        s.encode("utf-32-le"), dtype=np.uint32
                    ).astype(np.int64) + 1
                    packed = (
                        (codes[:-2] << 42)
                        | (codes[1:-1] << 21)
                        | codes[2:]
                    )
                    u, c = np.unique(packed, return_counts=True)
                    for k, v in zip(u.tolist(), c.tolist()):
                        acc[k] += v
                else:
                    # lower() changed the length: slice per position
                    # like substring() does (short tail grams allowed).
                    for i in range(n):
                        acc[_pack_gram(s[i : i + 3])] += 1
            rows = [
                (by, k, v)
                for by, cnt in per_by.items()
                for k, v in cnt.items()
            ]
            yield pd.DataFrame(
                rows, columns=[by_col, "g", "c"]
            ) if rows else pd.DataFrame(
                {by_col: pd.Series([], dtype=object),
                 "g": pd.Series([], dtype="int64"),
                 "c": pd.Series([], dtype="int64")}
            )

    partial = docs.select(by_col, text_col).mapInPandas(
        _count, f"{by_col} string, g long, c long"
    )
    return partial.groupBy(by_col, "g").agg(F.sum("c").alias("c"))


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id_col, n_tok, n_distinct, max_tok_count, g_total, g_distinct)
    — the integer inputs of the Gopher repetition fractions, one Arrow
    pass per document batch. Gram semantics mirror
    functions/text.word_ngrams: documents with fewer than 2 tokens
    yield ONE whole-doc gram (g_total = g_distinct = 1), so
    dup_2gram_frac degenerates to 0.0 exactly like the expression
    lane."""
    import re

    ws = re.compile(_JAVA_WS)

    def _stats(batches):
        for pdf in batches:
            out = {
                id_col: pdf[id_col],
                "n_tok": [],
                "n_distinct": [],
                "max_tok_count": [],
                "g_total": [],
                "g_distinct": [],
            }
            for t in pdf[text_col]:
                # NULL text → empty-document stats (n_tok=0, one
                # degenerate whole-doc gram) rather than a job-killing
                # TypeError: the lane degrades per row like the
                # expression pipeline it replaces.
                toks = [] if t is None else [w for w in ws.split(t) if w]
                n = len(toks)
                if n:
                    cnt = Counter(toks)
                    nd, mx = len(cnt), max(cnt.values())
                else:
                    nd, mx = 0, 0
                if n >= 2:
                    gt = n - 1
                    gd = len(set(zip(toks, toks[1:])))
                else:
                    gt, gd = 1, 1
                out["n_tok"].append(n)
                out["n_distinct"].append(nd)
                out["max_tok_count"].append(mx)
                out["g_total"].append(gt)
                out["g_distinct"].append(gd)
            yield pd.DataFrame(out)

    return docs.select(id_col, text_col).mapInPandas(
        _stats,
        f"{id_col} long, n_tok long, n_distinct long, "
        "max_tok_count long, g_total long, g_distinct long",
    )
