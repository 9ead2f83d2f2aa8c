"""Unigram language-model tokenizer (SentencePiece-style), from scratch:
frequency-seeded piece vocabulary, Viterbi segmentation as a pure
Catalyst in-row fold, and a derandomized hard-EM (Viterbi-EM) trainer
with a provable monotonicity certificate.

The unigram LM tokenizer (Kudo, ACL 2018) is the other standard
subword tokenizer next to BPE (operators/bpe.py): pieces carry
probabilities and a word's tokenization is the max-likelihood
segmentation over the piece lattice. This implementation derandomizes
everything (the engine's house rule for iterative operators):

- **Seed vocabulary**: all character n-grams (1..MAX_PIECE) of the
  corpus words, weighted by corpus occurrences; the multi-char
  candidates are cut to a top-K by (weight desc, piece asc) — a
  TakeOrderedAndProject, so the model is a CONFIG-bounded broadcast at
  any corpus size — and every single character is always kept, which
  guarantees full segmentation coverage.
- **Viterbi segmentation**: classic DP best[i] = max_k best[i-k] +
  lp(piece(i-k, i)), k <= MAX_PIECE. Runs as ONE Catalyst
  `aggregate()` fold per word over the word's character positions —
  zero Python in the hot path, the Holt-Winters fold pattern
  (operators/holtwinters.py). The fold state carries the last
  MAX_PIECE (dp, n_pieces) slots; score ties break to the LONGEST
  piece (branches are tested longest-first against the max).
- **Hard EM** (Viterbi-EM / Classification EM): E-step = Viterbi under
  the current model; M-step = exact MLE over the hard assignments
  (piece probabilities proportional to weighted usage counts). The
  total Viterbi log-likelihood is non-decreasing: LL(seg_t, model_t)
  <= LL(seg_t, model_{t+1}) because the M-step is the MLE of seg_t,
  and <= LL(seg_{t+1}, model_{t+1}) because Viterbi is optimal under
  model_{t+1}. Pieces whose count drops to zero leave the model; every
  word's own previous segmentation stays feasible, so coverage and
  the inequality both survive pruning.

Cross-engine determinism: piece log-probs are computed driver-side
with C-libm `math.log` over exact integer ratios — the same libm
DuckDB's LN calls — so the DP adds bit-identical doubles in the same
left-to-right order on both engines, and the longest-first tie-break
binds on exact equality. Words are capped at MAX_WORD chars (longer
words are excluded, identically on both sides — the documented
convention, like the MAX_DOC caps of the dedup lanes).

Scale: the word-frequency table (one corpus shuffle, map-side
combinable) is the working set — Zipf-bounded, orders of magnitude
smaller than the corpus. Candidate building, selection, segmentation,
and EM recounts all run over that table; the model itself is K-bounded
by construction.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from economic_data_etl_spark.functions.text import WORD_SPLIT_RE

MAX_PIECE = 4
MAX_WORD = 20
VOCAB_K = 500  # multi-char pieces kept; single chars always kept

_SENTINEL = -1e18  # invalid-branch score; real paths stay far above


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Corpus word-frequency table: (word, wc), lowercased whitespace
    tokens, 1..MAX_WORD chars. One map-side-combinable shuffle."""
    toks = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), WORD_SPLIT_RE),
                lambda t: t != "",
            )
        ).alias("word")
    )
    return (
        toks.filter(F.length("word") <= MAX_WORD)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def candidate_pieces(words: DataFrame) -> DataFrame:
    """All char n-grams (1..MAX_PIECE) over the word table, weighted by
    corpus occurrences: (piece, weight). Runs over the Zipf-bounded
    word table, never the corpus."""
    w = F.col("word")

    def _gram_of(n: int):
        # closure factory, NOT a default arg: a 2-parameter lambda
        # passed to F.transform is treated as (element, index)
        return lambda i: w.substr(i, F.lit(n))

    per_n = []
    for n in range(1, MAX_PIECE + 1):
        per_n.append(
            F.when(
                F.length(w) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.length(w) - F.lit(n - 1)),
                    _gram_of(n),
                ),
            ).otherwise(F.array().cast("array<string>"))
        )
    grams = words.select(
        "wc", F.explode(F.flatten(F.array(*per_n))).alias("piece")
    )
    return grams.groupBy("piece").agg(F.sum("wc").alias("weight"))


def select_vocab(cands: DataFrame, k: int = VOCAB_K) -> DataFrame:
    """Top-k multi-char pieces by (weight desc, piece asc) — a
    TakeOrderedAndProject — plus ALL single chars (coverage guarantee).
    Returns (piece, weight)."""
    multi = (
        cands.filter(F.length("piece") >= 2)
        .orderBy(F.desc("weight"), "piece")
        .limit(k)
    )
    singles = cands.filter(F.length("piece") == 1)
    return singles.unionByName(multi)


def vocab_logprobs(vocab: DataFrame) -> dict[str, float]:
    """Collect the K-bounded vocabulary and normalize driver-side with
    C-libm log over exact integer ratios (bit-identical to DuckDB's
    LN of the same division)."""
    rows = vocab.select("piece", "weight").collect()
    total = sum(r["weight"] for r in rows)
    return {r["piece"]: math.log(r["weight"] / total) for r in rows}


def _viterbi_expr(word, lp_map):
    """The Catalyst fold: best-path (dp, n_pieces) at the end of
    `word` under the piece log-prob map literal. State = array of
    MAX_PIECE (dp, np) slots for positions i-1 .. i-MAX_PIECE."""
    null_slot = F.struct(
        F.lit(None).cast("double").alias("dp"),
        F.lit(None).cast("long").alias("np"),
    )
    init = F.array(
        F.struct(
            F.lit(0.0).alias("dp"), F.lit(0).cast("long").alias("np")
        ),
        *[null_slot for _ in range(MAX_PIECE - 1)],
    )

    def step(acc, i):
        # branch k consumes the piece of length k ending at position i:
        # its predecessor state lives in slot k (position i-k).
        cs = []
        for k in range(1, MAX_PIECE + 1):
            prev = F.element_at(acc, k)
            piece = word.substr(i - F.lit(k - 1), F.lit(k))
            cs.append(
                F.coalesce(
                    prev["dp"] + F.element_at(lp_map, piece),
                    F.lit(_SENTINEL),
                )
            )
        m = F.greatest(*cs)
        # longest-first tie-break: chain whens from k=1 upward so each
        # later (longer) when WRAPS the earlier ones as its otherwise
        # branch — k = MAX_PIECE ends up as the outermost test.
        new_np = F.lit(None).cast("long")
        for k in range(1, MAX_PIECE + 1):
            new_np = F.when(
                cs[k - 1] == m, F.element_at(acc, k)["np"] + F.lit(1)
            ).otherwise(new_np)
        new = F.struct(m.alias("dp"), new_np.alias("np"))
        return F.array(
            new, *[F.element_at(acc, k) for k in range(1, MAX_PIECE)]
        )

    final = F.aggregate(
        F.sequence(F.lit(1), F.length(word)),
        init,
        step,
        lambda acc: F.element_at(acc, 1),
    )
    return final


def viterbi_segment(
    words: DataFrame, lp: dict[str, float]
) -> DataFrame:
    """Viterbi-segment every word in the (word, wc) table under the
    piece log-prob dict. Returns (word, wc, ll, n_pieces). Pure
    Catalyst — the model enters as ONE constant-folded map literal."""
    items: list = []
    for p, v in sorted(lp.items()):
        items.append(F.lit(p))
        items.append(F.lit(float(v)))
    lp_map = F.create_map(*items)
    fin = _viterbi_expr(F.col("word"), lp_map)
    return words.select(
        "word",
        "wc",
        fin["dp"].alias("ll"),
        fin["np"].alias("n_pieces"),
    )


def viterbi_pieces_expr(word, lp: dict[str, float]):
    """Segmentation PIECES (array<string>) for EM recounting: the same
    fold carrying the winning path's pieces instead of counts."""
    items: list = []
    for p, v in sorted(lp.items()):
        items.append(F.lit(p))
        items.append(F.lit(float(v)))
    lp_map = F.create_map(*items)

    null_slot = F.struct(
        F.lit(None).cast("double").alias("dp"),
        F.lit(None).cast("array<string>").alias("seg"),
    )
    init = F.array(
        F.struct(
            F.lit(0.0).alias("dp"),
            F.array().cast("array<string>").alias("seg"),
        ),
        *[null_slot for _ in range(MAX_PIECE - 1)],
    )

    def step(acc, i):
        cs, pieces = [], []
        for k in range(1, MAX_PIECE + 1):
            prev = F.element_at(acc, k)
            piece = word.substr(i - F.lit(k - 1), F.lit(k))
            pieces.append(piece)
            cs.append(
                F.coalesce(
                    prev["dp"] + F.element_at(lp_map, piece),
                    F.lit(_SENTINEL),
                )
            )
        m = F.greatest(*cs)
        new_seg = F.lit(None).cast("array<string>")
        for k in range(1, MAX_PIECE + 1):
            new_seg = F.when(
                cs[k - 1] == m,
                F.concat(
                    F.element_at(acc, k)["seg"],
                    F.array(pieces[k - 1]),
                ),
            ).otherwise(new_seg)
        new = F.struct(m.alias("dp"), new_seg.alias("seg"))
        return F.array(
            new, *[F.element_at(acc, k) for k in range(1, MAX_PIECE)]
        )

    return F.aggregate(
        F.sequence(F.lit(1), F.length(word)),
        init,
        step,
        lambda acc: F.element_at(acc, 1),
    )


def hard_em(
    words: DataFrame, lp0: dict[str, float], iterations: int = 3
) -> tuple[dict[str, float], list[float]]:
    """Viterbi-EM: returns (final model, total-LL history). History
    entry t = sum_w wc * LL(w) with segments AND model from round t;
    CEM guarantees it is non-decreasing (M-step = exact MLE of the
    hard assignments; Viterbi optimal under the new model)."""
    lp = dict(lp0)
    history: list[float] = []
    w = words.select("word", "wc").localCheckpoint()
    for _ in range(iterations):
        fin = viterbi_pieces_expr(F.col("word"), lp)
        seg = w.select(
            "wc", fin["dp"].alias("ll"), fin["seg"].alias("seg")
        ).localCheckpoint()
        (tot,) = seg.agg(
            F.sum(F.col("wc") * F.col("ll")).alias("t")
        ).collect()
        # empty corpus: SUM over zero rows is NULL — record 0.0 and
        # keep the current model (the MLE of an empty assignment is
        # undefined; freezing preserves the monotonicity invariant)
        history.append(
            float(tot["t"]) if tot["t"] is not None else 0.0
        )
        counts = (
            seg.select("wc", F.explode("seg").alias("piece"))
            .groupBy("piece")
            .agg(F.sum("wc").alias("c"))
            .collect()
        )
        total = sum(r["c"] for r in counts)
        if total:
            lp = {
                r["piece"]: math.log(r["c"] / total) for r in counts
            }
    return lp, history
