"""Distributed Bloom filter: build over a key set, test membership as a
pure JVM expression — the scale shape for benchmark decontamination.

The LLM-training decontamination problem at 100 TB: flag every corpus
document whose fingerprint appears in a benchmark/eval key set. The
exact answer needs a semi-join, but shuffling the full corpus on the
fingerprint is the dominant cost; the Bloom filter turns it into

    corpus scan --(bitmap test, no shuffle)--> candidates --exact join

where the candidate fraction is the true-match rate plus the filter's
false-positive rate. A Bloom filter NEVER produces false negatives, so
`candidates JOIN keys` is still the EXACT answer — the bitmap only
prunes work, it cannot change the result. (Spark's own runtime bloom
pushdown — InjectRuntimeFilter — applies the same idea inside a single
query; this operator makes the bitmap an explicit, reusable artifact so
one build can prefilter many scans.)

Design for 100 TB:

- BUILD is one distributed pass over the key set: k probe positions per
  key via `xxhash64(key, seed)` mod m, grouped by 64-bit word index with
  `collect_set(bit)` — at most m/64 rows ever reach the driver (the
  bitmap itself, typically KBs), independent of key-set size.
- TEST is constant-folded: the bitmap is embedded as an array<long>
  literal, membership = AND over k `getbit(element_at(bitmap, word),
  bit)` probes. Whole-stage codegen, zero shuffle, zero Python — the
  same constant-folding trick the PQ codebooks use (operators/pq.py).
- Sizing: FPR ~= (1 - exp(-k*n/m))^k for n keys; `optimal_k` below is
  round(m/n * ln 2). The caller picks m from its memory budget (a
  1 GiB bitmap = 2^33 bits handles ~600M keys at 1% FPR).

No reference-repo counterpart (the pandas reference has no dedup or
membership surface, src/transform.py:4-115); this extends the
training-pipeline decontamination lane (operators/contamination.py).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def optimal_k(m_bits: int, n_keys: int) -> int:
    """Hash count minimizing FPR for n keys in m bits: (m/n) ln 2."""
    if n_keys <= 0:
        return 1
    return max(1, round(m_bits / n_keys * math.log(2)))


def theoretical_fpr(m_bits: int, n_keys: int, k_hashes: int) -> float:
    """Standard Bloom FPR estimate (1 - e^{-kn/m})^k."""
    return (1.0 - math.exp(-k_hashes * n_keys / m_bits)) ** k_hashes


def _probe_positions(key: Column, m_bits: int, k_hashes: int) -> list[Column]:
    """k probe bit-positions in [0, m) for a key. Seeds enter as a second
    hashed column (xxhash64's own seed is fixed); positions are therefore
    deterministic across engines, sessions, and partitionings."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
        for i in range(k_hashes)
    ]


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int, k_hashes: int
) -> list[int]:
    """One distributed pass over the key set -> m_bits//64 Python longs.

    The aggregation is groupBy(word).collect_set(bit): bounded by 64
    distinct bits per word, and the collect is bounded by the bitmap's
    word count (m/64), NOT the key count — building over a billion keys
    still returns the same few KBs. NULL keys are excluded (a Bloom
    filter answers "is this key in the set"; NULL is not a key — the
    same non-null population rule as operators/heavyhitters.py).
    """
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 64: {m_bits}")
    key = F.col(key_col)
    pos = F.explode(F.array(*_probe_positions(key, m_bits, k_hashes)))
    words = (
        df.filter(key.isNotNull())
        .select(pos.alias("pos"))
        .select(
            (F.col("pos") / F.lit(64)).cast("int").alias("word"),
            F.pmod(F.col("pos"), F.lit(64)).cast("int").alias("bit"),
        )
        .groupBy("word")
        .agg(F.collect_set("bit").alias("bits"))
        .collect()
    )
    bitmap = [0] * (m_bits // 64)
    for row in words:
        w = 0
        for b in row["bits"]:
            w |= 1 << b
        # keep words signed-64 so F.lit() round-trips as array<long>
        bitmap[row["word"]] = w - (1 << 64) if w >= 1 << 63 else w
    return bitmap


def bloom_might_contain(
    key: Column, bitmap: list[int], k_hashes: int
) -> Column:
    """Pure-JVM membership test against a driver-held bitmap.

    The bitmap rides into the plan as an array<long> literal (same
    constant-folding shape as the PQ codebooks): k getbit probes ANDed,
    whole-stage-codegen friendly, no shuffle, no Python. False positives
    possible at the sized FPR; false negatives impossible — every bit a
    build-side key set is tested by the identical xxhash64 chain.
    """
    m_bits = len(bitmap) * 64
    # explicit cast: F.lit infers array<int> when every word happens to
    # fit in 32 bits, and getbit then rejects bit positions >= 32.
    lit_map = F.lit(bitmap).cast("array<long>")
    probes = []
    for pos in _probe_positions(key, m_bits, k_hashes):
        word = (pos / F.lit(64)).cast("int")
        bit = F.pmod(pos, F.lit(64)).cast("int")
        probes.append(F.getbit(F.element_at(lit_map, word + F.lit(1)), bit) == F.lit(1))
    out = probes[0]
    for p in probes[1:]:
        out = out & p
    return out


def bloom_decontaminate(
    corpus: DataFrame,
    bench_keys: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k_hashes: int | None = None,
) -> DataFrame:
    """EXACT decontamination via Bloom prefilter + exact verify.

    Returns the corpus rows whose `key_col` appears in `bench_keys`
    (which must expose the same column). The bitmap test prunes the
    corpus to candidates WITHOUT a shuffle; only candidates (true
    matches + the FPR-sized sliver) reach the exact broadcast semi-join,
    so the result is exact while the corpus-side shuffle disappears
    entirely. At 100 TB this is the difference between shuffling the
    corpus and streaming it.
    """
    keys = bench_keys.select(key_col).filter(F.col(key_col).isNotNull())
    n_keys = keys.distinct().count()
    k = k_hashes if k_hashes is not None else optimal_k(m_bits, max(n_keys, 1))
    bitmap = bloom_build(keys, key_col, m_bits, k)
    candidates = corpus.filter(
        F.col(key_col).isNotNull()
        & bloom_might_contain(F.col(key_col), bitmap, k)
    )
    return candidates.join(
        F.broadcast(keys.distinct()), key_col, "left_semi"
    )
