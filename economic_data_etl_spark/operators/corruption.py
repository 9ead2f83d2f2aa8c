"""T5-style span corruption (deterministic): the denoising-objective
data transform — mask contiguous token spans, emit (input with one
sentinel per span, target = sentinels + the masked tokens).

Raffel et al. (T5, JMLR 2020) sample mask spans at random; this
operator derandomizes the decision with the repo's portable md5 bucket
(salt || doc_id || ':' || position), so the corruption is reproducible
across engines and runs: position p STARTS a span when
bucket(doc, p) % 100 < start_rate_pct; spans have fixed nominal length
`span_len` and overlapping/adjacent spans merge into maximal spans
(same interval semantics as the substring-dedup spans). With the
defaults (5%, 3) ~15% of tokens mask.

Sentinel format: `<extra_id_N>` numbered 0.. in span order within the
document — the T5 vocabulary convention. input = unmasked tokens with
each span replaced by its sentinel; target = for each span, its
sentinel followed by the masked tokens, concatenated in order.

Scale shape: EVERYTHING is per-row narrow expressions — span starts,
interval merging (an in-row fold), and both renderings happen inside
one projection over the token array; the corpus never shuffles. The
DuckDB oracle replays the same decisions with the row-based
gaps-and-islands formulation (identical merged intervals: both merge
overlapping-or-adjacent [s, s+L) windows over the same deterministic
start set).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from economic_data_etl_spark.operators.substring import word_array

SALT = "t5span-v1"


def _bucket(doc_id: Column, pos: Column) -> Column:
    """Portable md5 bucket in [0, 65536) of (salt || doc || ':' || pos)
    — the same formula family as operators/training.py:hash_bucket,
    with the position folded into the key."""
    key = F.concat(
        F.lit(SALT),
        doc_id.cast("string"),
        F.lit(":"),
        pos.cast("string"),
    )
    return F.conv(F.substring(F.md5(key), 1, 4), 16, 10).cast("long")


def corrupt_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    start_rate_pct: int = 5,
    span_len: int = 3,
) -> DataFrame:
    """Adds input_text, target_text, n_spans, n_masked to each doc.

    Pure projection: token array -> deterministic span starts ->
    in-row interval merge (fold) -> two renderings. Documents with no
    masked span pass through with input_text = the original tokens
    re-joined and an empty target.
    """
    L = span_len
    did = F.col(id_col)
    toks = docs.select(
        *docs.columns, word_array(F.col(text_col)).alias("_w")
    )
    n = F.size("_w")
    starts = F.filter(
        F.sequence(F.lit(0), n - 1),
        lambda p: (_bucket(did, p) % 100)
        < F.lit(start_rate_pct),
    )
    # guard the empty-token-array case: sequence(0, -1) is invalid
    starts = F.when(n > 0, starts).otherwise(
        F.array().cast("array<int>")
    )
    empty_spans = F.array().cast(
        "array<struct<st:int,en:int>>"
    )

    def merge_step(acc: Column, s: Column) -> Column:
        last = F.element_at(acc, -1)
        extend = F.concat(
            F.slice(acc, 1, F.size(acc) - 1),
            F.array(
                F.struct(
                    last["st"].alias("st"),
                    F.least(s + L, n).cast("int").alias("en"),
                )
            ),
        )
        fresh = F.concat(
            acc,
            F.array(
                F.struct(
                    s.cast("int").alias("st"),
                    F.least(s + L, n).cast("int").alias("en"),
                )
            ),
        )
        return F.when(
            (F.size(acc) > 0) & (s <= last["en"]), extend
        ).otherwise(fresh)

    spans = F.aggregate(starts, empty_spans, merge_step)
    with_spans = toks.select(
        *docs.columns, "_w", spans.alias("_sp")
    )
    sp = F.col("_sp")
    w = F.col("_w")
    # index the spans once: (st, en, i)
    spi = F.transform(
        F.sequence(F.lit(1), F.size(sp)),
        lambda i: F.struct(
            F.element_at(sp, i)["st"].alias("st"),
            F.element_at(sp, i)["en"].alias("en"),
            (i - 1).alias("i"),
        ),
    )
    indexed = with_spans.select(
        *docs.columns,
        "_w",
        F.when(F.size(sp) > 0, spi)
        .otherwise(F.array().cast("array<struct<st:int,en:int,i:int>>"))
        .alias("_spi"),
    )
    spi_c = F.col("_spi")

    def sentinel(i: Column) -> Column:
        return F.concat(
            F.lit("<extra_id_"), i.cast("string"), F.lit(">")
        )

    # input: position p renders as its span's sentinel when p is a
    # span start, drops when strictly inside a span, else the token.
    def render(p: Column) -> Column:
        at_start = F.filter(spi_c, lambda s: s["st"] == p)
        inside = F.exists(
            spi_c, lambda s: (p > s["st"]) & (p < s["en"])
        )
        return (
            F.when(
                F.size(at_start) > 0,
                sentinel(F.element_at(at_start, 1)["i"]),
            )
            .when(inside, F.lit(None))
            .otherwise(F.element_at(w, p + 1))
        )

    input_parts = F.filter(
        F.transform(F.sequence(F.lit(0), F.size(w) - 1), render),
        lambda t: t.isNotNull(),
    )
    input_text = F.when(
        F.size(w) > 0, F.array_join(input_parts, " ")
    ).otherwise(F.lit(""))
    target_text = F.array_join(
        F.transform(
            spi_c,
            lambda s: F.concat(
                sentinel(s["i"]),
                F.lit(" "),
                F.array_join(
                    F.slice(w, s["st"] + 1, s["en"] - s["st"]), " "
                ),
            ),
        ),
        " ",
    )
    n_masked = F.aggregate(
        spi_c,
        F.lit(0),
        lambda acc, s: acc + (s["en"] - s["st"]),
    )
    return indexed.select(
        *docs.columns,
        input_text.alias("input_text"),
        target_text.alias("target_text"),
        F.size(spi_c).cast("long").alias("n_spans"),
        n_masked.cast("long").alias("n_masked"),
    )
