"""BPE trainer/tokenizer unit tests (operators/bpe.py).

The Spark-side catalog queries are certified by tests/test_catalog_oracle
(bpe_train_merges rows-only + inv_bpe_conservation value hash); these
tests pin the driver-side algorithms directly: known-corpus merge
sequences, encoder-vs-merge-replay equivalence, and the conservation /
reconstruction laws under hypothesis-generated vocabularies.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from economic_data_etl_spark.operators.bpe import END, encode_word

_WORD = st.text(
    alphabet=st.sampled_from("abcde"), min_size=1, max_size=8
)


def _train_on_histogram(
    hist: dict[str, int], num_merges: int
) -> list[tuple[str, str, int]]:
    """Driver-side reference of the trainer's merge loop (the same
    algorithm train_bpe_merges runs after the Spark histogram)."""
    words = {tuple(w) + (END,): c for w, c in hist.items()}
    merges = []
    for _ in range(num_merges):
        pc: dict[tuple[str, str], int] = {}
        for syms, c in words.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + c
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, cnt))
        ab = a + b
        nw: dict[tuple[str, ...], int] = {}
        for syms, c in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nw[tuple(out)] = nw.get(tuple(out), 0) + c
        words = nw
    return merges


class TestTrainer:
    def test_known_corpus_first_merges(self):
        # classic Sennrich example shape: 'low' x5, 'lower' x2,
        # 'newest' x6, 'widest' x3 -> first merges pick up 'es'/'est'
        hist = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
        merges = _train_on_histogram(hist, 4)
        assert merges[0][:2] == ("e", "s")  # count 9
        assert merges[1][:2] == ("es", "t")  # count 9
        assert merges[2][:2] == ("est", END)  # count 9
        assert merges[0][2] == merges[1][2] == merges[2][2] == 9

    def test_deterministic_tie_break(self):
        # every adjacent pair in {'ab' x3, 'ba' x3} ties at count 3;
        # the lexicographically smallest pair wins — ('a', '</w>'),
        # since '<' sorts before any lowercase letter
        hist = {"ab": 3, "ba": 3}
        merges = _train_on_histogram(hist, 1)
        assert merges[0][:2] == ("a", END)

    def test_merge_count_monotone_nonincreasing(self):
        rng = np.random.default_rng(0)
        hist = {
            "".join(
                rng.choice(list("abcd"), size=rng.integers(1, 7))
            ): int(rng.integers(1, 50))
            for _ in range(60)
        }
        merges = _train_on_histogram(hist, 20)
        counts = [c for _a, _b, c in merges]
        assert counts == sorted(counts, reverse=True)


class TestEncoder:
    @given(st.dictionaries(_WORD, st.integers(1, 30), max_size=25), _WORD)
    @settings(max_examples=60, deadline=None)
    def test_reconstruction_and_conservation(self, hist, word):
        if not hist:
            hist = {word: 1}
        merges = _train_on_histogram(hist, 10)
        ranks = {(a, b): i for i, (a, b, _c) in enumerate(merges)}
        toks = encode_word(word, ranks)
        assert "".join(toks) == word + END  # reconstruction
        assert 1 <= len(toks) <= len(word) + 1  # conservation bound

    def test_encoder_matches_training_segmentation(self):
        # a word FROM the training corpus must tokenize to the same
        # segmentation the trainer's histogram reached after its
        # merges (greedy rank order == training merge order)
        hist = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
        merges = _train_on_histogram(hist, 10)
        ranks = {(a, b): i for i, (a, b, _c) in enumerate(merges)}
        # replay training merges over the corpus words
        words = {w: tuple(w) + (END,) for w in hist}
        for a, b, _c in merges:
            ab = a + b
            for w, syms in words.items():
                out, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == a
                        and syms[i + 1] == b
                    ):
                        out.append(ab)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                words[w] = tuple(out)
        for w in hist:
            assert tuple(encode_word(w, ranks)) == words[w], w

    def test_unknown_symbols_pass_through(self):
        merges = _train_on_histogram({"aa": 5}, 2)
        ranks = {(a, b): i for i, (a, b, _c) in enumerate(merges)}
        toks = encode_word("zzz", ranks)
        assert "".join(toks) == "zzz" + END


class TestWhitespaceDialectParity:
    """ADVICE r7 (plans/bpe.py:60): Java \\s (ASCII incl. \\x0B), RE2
    \\s (excludes \\x0B), and Python str.split() (full Unicode
    whitespace) disagree — every pass now splits on the one explicit
    class WORD_SPLIT_RE. Nasty corpus: \\x0B, \\xa0, \\f, \\u2028 must
    tokenize identically in all three engines."""

    NASTY = "alpha\x0bbeta gamma\xa0delta\teps\fzeta" "\u2028" "eta\nlast"

    def test_three_engines_agree_on_nasty_whitespace(self, spark):
        import duckdb

        from economic_data_etl_spark.operators.bpe import (
            split_words,
            word_histogram,
        )

        py = split_words(self.NASTY)
        # \x0B, \xa0, \f, U+2028 are NOT separators under the explicit
        # class — they stay inside words
        assert py == [
            "alpha\x0bbeta",
            "gamma\xa0delta",
            "eps\fzeta" "\u2028" "eta",
            "last",
        ]
        docs = spark.createDataFrame(
            [(1, self.NASTY)], "doc_id long, text string"
        )
        spark_words = sorted(
            (r["word"], r["cnt"])
            for r in word_histogram(docs).collect()
        )
        assert spark_words == sorted((w, 1) for w in py)
        duck = duckdb.sql(
            "SELECT unnest(list_filter(string_split_regex("
            "?, '[ \\t\\n\\r]+'), x -> x <> ''))",
            params=[self.NASTY],
        ).fetchall()
        assert sorted(r[0] for r in duck) == sorted(py)

    def test_tokenize_stats_uses_the_same_split(self, spark):
        from economic_data_etl_spark.operators.bpe import (
            split_words,
            tokenize_stats,
        )

        docs = spark.createDataFrame(
            [(1, self.NASTY)], "doc_id long, text string"
        )
        row = tokenize_stats(docs, []).first()
        words = split_words(self.NASTY)
        assert row["n_words"] == len(words)
        assert row["initial_symbols"] == sum(
            len(w) + 1 for w in words
        )
