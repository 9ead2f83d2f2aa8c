"""The Arrow-vectorized text-stats lanes (operators/textstats.py) must
be count-identical to the expression lanes they replaced — same
tokenizer class (Java \\s, not Python's Unicode \\s), same trigram
position arithmetic (original length over lowered text), same
short-document gram degeneracies."""

from __future__ import annotations

from pyspark.sql import functions as F

from economic_data_etl_spark.functions import text as T
from economic_data_etl_spark.operators.textstats import (
    char_trigram_counts,
    repetition_stats,
)
from economic_data_etl_spark.sources.tables import load_table


def _unpack(v: int) -> str:
    cps = [(v >> 42) & 0x1FFFFF, (v >> 21) & 0x1FFFFF, v & 0x1FFFFF]
    return "".join(chr(c - 1) for c in cps if c)


def _expr_trigram_counts(docs):
    return (
        docs.select(
            "source",
            F.lower(F.col("text")).alias("__lt"),
            (F.char_length("text") - 2).alias("__n"),
        )
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, __n), i -> substring(__lt, i, 3))"
                )
            ).alias("g"),
        )
        .groupBy("source", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )


class TestCharTrigramCounts:
    def test_full_count_table_matches_expression_lane(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents").filter(
            F.length("text") >= 3
        )
        fast = {
            (r["source"], _unpack(r["g"])): r["c"]
            for r in char_trigram_counts(docs, "source").collect()
        }
        expr = {
            (r["source"], r["g"]): r["c"]
            for r in _expr_trigram_counts(docs).collect()
        }
        assert fast == expr

    def test_lower_length_change_takes_slicing_fallback(self, spark):
        # U+0130 lowers to a TWO-char sequence — lengths diverge, so the
        # packed fast path must defer to per-position slicing, exactly
        # what substring(lower(text), i, 3) computes (incl. short tail
        # grams past the lowered end when lower() SHRINKS, and the
        # shifted window when it GROWS).
        docs = spark.createDataFrame(
            [(1, "s", "abİcd"), (2, "s", "plain text here")],
            "doc_id long, source string, text string",
        ).filter(F.length("text") >= 3)
        fast = {
            (r["source"], _unpack(r["g"])): r["c"]
            for r in char_trigram_counts(docs, "source").collect()
        }
        expr = {
            (r["source"], r["g"]): r["c"]
            for r in _expr_trigram_counts(docs).collect()
        }
        assert fast == expr


class TestRepetitionStats:
    def test_matches_expression_lane_on_corpus(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        text = F.col("text")
        expr = docs.select(
            "doc_id",
            T.top_token_frac(text).alias("top"),
            T.dup_token_frac(text).alias("dup"),
            T.dup_ngram_frac(text, 2).alias("dup2"),
        )
        n = F.col("n_tok")
        fast = repetition_stats(docs).select(
            "doc_id",
            F.when(n > 0, F.col("max_tok_count") / n)
            .otherwise(F.lit(0.0))
            .alias("top"),
            F.when(n > 0, F.lit(1.0) - F.col("n_distinct") / n)
            .otherwise(F.lit(0.0))
            .alias("dup"),
            (F.lit(1.0) - F.col("g_distinct") / F.col("g_total")).alias(
                "dup2"
            ),
        )
        e = {r["doc_id"]: (r["top"], r["dup"], r["dup2"]) for r in expr.collect()}
        f = {r["doc_id"]: (r["top"], r["dup"], r["dup2"]) for r in fast.collect()}
        # bit-identical, not approximately equal: both lanes divide the
        # same exact integers.
        assert e == f

    def test_tokenizer_is_java_ws_class_not_unicode(self, spark):
        # \xa0 (nbsp) is whitespace to Python's \s but NOT to Java's —
        # both lanes must treat "a\xa0b" as ONE token; \x0b (vertical
        # tab) splits in Java and must split here too. Degenerate docs
        # (empty, whitespace-only, single-token) pin the gram floors.
        docs = spark.createDataFrame(
            [
                (1, "a\xa0b c"),
                (2, "x\x0by"),
                (3, ""),
                (4, "   "),
                (5, "solo"),
            ],
            "doc_id long, text string",
        )
        text = F.col("text")
        expr = docs.select(
            "doc_id",
            F.size(T.tokens(text)).alias("n"),
            F.size(F.array_distinct(T.tokens(text))).alias("nd"),
        )
        fast = repetition_stats(docs).select(
            "doc_id",
            F.col("n_tok").alias("n"),
            F.col("n_distinct").alias("nd"),
        )
        e = {r["doc_id"]: (r["n"], r["nd"]) for r in expr.collect()}
        f = {r["doc_id"]: (r["n"], r["nd"]) for r in fast.collect()}
        assert e == f
        assert e[1] == (2, 2)  # nbsp glued "a\xa0b" into one token
        assert e[2] == (2, 2)  # vertical tab DOES split (Java \s has it)
        assert e[3] == (0, 0)
        assert e[4] == (0, 0)
        gram = {
            r["doc_id"]: (r["g_total"], r["g_distinct"])
            for r in repetition_stats(docs).collect()
        }
        assert gram[3] == (1, 1) and gram[5] == (1, 1)


class TestBM25:
    def test_matches_hand_computation(self, spark):
        import math

        from economic_data_etl_spark.operators.retrieval import bm25_scores

        corpus = {
            1: "cat dog cat",
            2: "dog mouse",
            3: "bird bird bird bird",
        }
        df = spark.createDataFrame(
            list(corpus.items()), "doc_id long, text string"
        )
        got = {
            r.doc_id: r.score
            for r in bm25_scores(df, ["cat", "dog"]).collect()
        }
        # independent reference
        toks = {d: t.split() for d, t in corpus.items()}
        n, avgdl = 3, sum(len(w) for w in toks.values()) / 3
        dfreq = {
            t: sum(1 for w in toks.values() if t in w)
            for t in ("cat", "dog")
        }
        want = {}
        for d, w in toks.items():
            s = 0.0
            for t in ("cat", "dog"):
                tf = w.count(t)
                if not tf:
                    continue
                idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
                s += idf * tf * 2.2 / (
                    tf + 1.2 * (1 - 0.75 + 0.75 * len(w) / avgdl)
                )
            if s:
                want[d] = s
        assert set(got) == set(want) == {1, 2}
        for d in got:
            assert abs(got[d] - want[d]) < 1e-12

    def test_empty_terms_rejected(self, spark):
        import pytest as _pytest

        from economic_data_etl_spark.operators.retrieval import bm25_scores

        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with _pytest.raises(ValueError):
            bm25_scores(df, [])


class TestPhraseSearch:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_basic_and_boundaries(self, spark):
        docs = self._docs(
            spark,
            [
                (1, "a b c d"),        # phrase at start
                (2, "x y a b c"),      # phrase at end
                (3, "a b x a b c a"),  # one real match after a decoy
                (4, "c b a"),          # reversed: no match
                (5, "a b"),            # too short
            ],
        )
        from economic_data_etl_spark.operators.retrieval import (
            phrase_occurrences,
        )

        got = {
            r.doc_id: (r.n_matches, r.first_pos)
            for r in phrase_occurrences(docs, ["a", "b", "c"]).collect()
        }
        assert got == {1: (1, 0), 2: (1, 2), 3: (1, 3)}

    def test_repeated_word_in_phrase(self, spark):
        # 'the X the': a single 'the' position must not satisfy both
        # offsets 0 and 2 — countDistinct(off) requires both aligned.
        docs = self._docs(
            spark,
            [
                (1, "the cat the dog"),   # match at 0
                (2, "the the cat"),       # no: offsets misaligned
                (3, "x the cat the the cat the"),  # matches at 1 and 4
            ],
        )
        from economic_data_etl_spark.operators.retrieval import (
            phrase_occurrences,
        )

        got = {
            r.doc_id: (r.n_matches, r.first_pos)
            for r in phrase_occurrences(
                docs, ["the", "cat", "the"]
            ).collect()
        }
        assert got == {1: (1, 0), 3: (2, 1)}

    def test_overlapping_occurrences_all_counted(self, spark):
        docs = self._docs(spark, [(1, "a a a a")])
        from economic_data_etl_spark.operators.retrieval import (
            phrase_occurrences,
        )

        got = phrase_occurrences(docs, ["a", "a"]).collect()
        assert (got[0].n_matches, got[0].first_pos) == (3, 0)

    def test_empty_phrase_rejected(self, spark):
        from economic_data_etl_spark.operators.retrieval import (
            phrase_occurrences,
        )

        with __import__("pytest").raises(ValueError):
            phrase_occurrences(self._docs(spark, [(1, "a")]), [])


class TestPositionalIndex:
    def test_index_served_equals_on_the_fly(self, spark):
        from economic_data_etl_spark.operators.retrieval import (
            build_positional_postings,
            phrase_from_index,
            phrase_occurrences,
        )
        from economic_data_etl_spark.sources.tables import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        phrase = ["stream", "table", "hash"]
        idx = build_positional_postings(docs)
        got = sorted(
            map(tuple, phrase_from_index(idx, phrase).collect())
        )
        want = sorted(
            map(tuple, phrase_occurrences(docs, phrase).collect())
        )
        assert got == want and got

    def test_append_idempotent_on_overlap(self, spark):
        from economic_data_etl_spark.operators.retrieval import (
            append_positional,
        )

        doclens = spark.createDataFrame(
            [(1, 3)], "doc_id long, dl long"
        )
        batch = spark.createDataFrame(
            [(1, "a b c"), (2, "x y")], "doc_id long, text string"
        )
        postings, new_dl = append_positional(doclens, batch)
        # doc 1 already indexed: only doc 2's rows appear
        assert {r.doc_id for r in postings.collect()} == {2}
        assert [tuple(r) for r in new_dl.collect()] == [(2, 2)]
