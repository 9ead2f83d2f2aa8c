"""Bloom-filter decontamination queries.

The benchmark-decontamination hygiene pass at corpus scale: flag every
training document whose fingerprint (here: the first-4-words prefix —
the same whitespace dialect as the rest of the text stack) appears in
the benchmark key set. `operators/bloom.py` turns the corpus-side
semi-join into a shuffle-free constant-folded bitmap scan followed by an
exact verify of the candidates only — the result is EXACT (a Bloom
filter has no false negatives), so the DuckDB oracle is the plain
semi-join with no bloom anywhere in it: the driver's value-hash check
proves the prefilter pruned nothing it shouldn't have.

`inv_bloom_fpr_bound` is the certificate for the pruning claim itself:
zero false negatives over the full benchmark key set, and a measured
false-positive rate within the sized bound (deterministic — the probe
positions are xxhash64, so the measured FPR is a fixed property of the
data, not a sample).

No reference-repo counterpart (the pandas reference has no membership
or dedup surface, src/transform.py:4-115); training-pipeline extension
alongside operators/contamination.py (n-gram overlap decontamination).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.functions.text import WORD_SPLIT_RE
from economic_data_etl_spark.operators import bloom
from economic_data_etl_spark.plans.catalog import register
from economic_data_etl_spark.sources.tables import load_table

# Benchmark side: docs below the split play the eval set, the rest are
# the training corpus. Fingerprint = first 4 words; the synthetic docs
# draw from a small vocabulary, so prefixes collide across the split
# (6-9 contaminated docs at test SFs) — a non-trivial exact answer.
_BENCH_SPLIT = 50
_PREFIX_WORDS = 4

# Deliberately tight bitmap so the FPR is measurable (not ~0) and the
# certificate's bound check is a real assertion: ~50 distinct bench
# keys in 512 bits, k=3 -> theoretical FPR ~1.6%.
_M_BITS = 512
_K_HASHES = 3

_KEYED_CTE = f"""
WITH keyed AS (
  SELECT doc_id,
         array_to_string(
             list_filter(string_split_regex(text, '[ \\t\\n\\r]+'),
                         x -> x != '')[1:{_PREFIX_WORDS}],
             ' ') AS fingerprint
  FROM documents
)"""


def _fingerprint(text_col):
    """First-N-words fingerprint; identical split/slice/join on both
    engines (WORD_SPLIT_RE is the shared whitespace dialect)."""
    words = F.filter(F.split(text_col, WORD_SPLIT_RE), lambda t: t != "")
    return F.array_join(F.slice(words, 1, _PREFIX_WORDS), " ")


def _keyed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", _fingerprint(F.col("text")).alias("fingerprint")
    )


@register(
    "curation_bloom_decontaminate",
    oracle=_KEYED_CTE
    + f"""
SELECT c.doc_id, c.fingerprint
FROM keyed c
WHERE c.doc_id >= {_BENCH_SPLIT}
  AND EXISTS (SELECT 1 FROM keyed b
              WHERE b.doc_id < {_BENCH_SPLIT}
                AND b.fingerprint = c.fingerprint)
ORDER BY c.doc_id
""",
    doc="Benchmark decontamination via Bloom prefilter + exact verify "
    "(operators/bloom.py): corpus docs whose first-4-words fingerprint "
    "appears in the bench set. The bitmap test is a constant-folded "
    "JVM expression (zero corpus shuffle); only candidates reach the "
    "broadcast semi-join, and the oracle is the PLAIN semi-join — the "
    "value-hash match proves the prefilter is lossless.",
)
def curation_bloom_decontaminate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    keyed = _keyed_docs(spark, sf_dir)
    bench = keyed.filter(F.col("doc_id") < _BENCH_SPLIT).select("fingerprint")
    corpus = keyed.filter(F.col("doc_id") >= _BENCH_SPLIT)
    flagged = bloom.bloom_decontaminate(
        corpus, bench, "fingerprint", m_bits=_M_BITS, k_hashes=_K_HASHES
    )
    return flagged.select("doc_id", "fingerprint").orderBy("doc_id")


@register(
    "inv_bloom_fpr_bound",
    oracle=_KEYED_CTE
    + f"""
, bench AS (
  SELECT DISTINCT fingerprint FROM keyed
  WHERE doc_id < {_BENCH_SPLIT} AND fingerprint IS NOT NULL
), trials AS (
  SELECT DISTINCT k.fingerprint FROM keyed k
  WHERE k.doc_id >= {_BENCH_SPLIT} AND k.fingerprint IS NOT NULL
    AND NOT EXISTS (SELECT 1 FROM bench b
                    WHERE b.fingerprint = k.fingerprint)
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM bench) AS n_bench_keys,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM trials) AS n_trials,
       CAST(0 AS BIGINT) AS n_false_negatives,
       TRUE AS fpr_within_bound
""",
    doc="Certifies the Bloom decontamination prefilter: n_bench_keys and "
    "n_trials (distinct non-member corpus fingerprints) are recomputed "
    "from the raw table by BOTH engines; n_false_negatives asserts "
    "every inserted key tests positive (structural Bloom guarantee, "
    "measured not assumed), and fpr_within_bound asserts the measured "
    "false-positive rate over the true non-members stays within "
    "3x theoretical + 2% absolute (xxhash64 probes are deterministic, "
    "so the measurement is a fixed property of the data).",
)
def inv_bloom_fpr_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    keyed = _keyed_docs(spark, sf_dir).filter(
        F.col("fingerprint").isNotNull()
    )
    bench = (
        keyed.filter(F.col("doc_id") < _BENCH_SPLIT)
        .select("fingerprint")
        .distinct()
    )
    trials = (
        keyed.filter(F.col("doc_id") >= _BENCH_SPLIT)
        .select("fingerprint")
        .distinct()
        .join(bench, "fingerprint", "left_anti")
    )
    bitmap = bloom.bloom_build(bench, "fingerprint", _M_BITS, _K_HASHES)
    test = bloom.bloom_might_contain(
        F.col("fingerprint"), bitmap, _K_HASHES
    )
    n_bench = bench.count()
    n_fn = bench.filter(~test).count()
    n_trials = trials.count()
    n_fp = trials.filter(test).count()
    bound = 3.0 * bloom.theoretical_fpr(_M_BITS, n_bench, _K_HASHES) + 0.02
    fpr = n_fp / n_trials if n_trials else 0.0
    return spark.createDataFrame(
        [(n_bench, n_trials, n_fn, fpr <= bound)],
        "n_bench_keys long, n_trials long, n_false_negatives long, "
        "fpr_within_bound boolean",
    )
