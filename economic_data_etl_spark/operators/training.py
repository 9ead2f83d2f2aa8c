"""Training-data pipeline operators: deterministic splits, dataset
mixing, and sequence packing.

Why hash-based rather than `df.sample()` / `randomSplit()`: at 100 TB a
split must be (a) reproducible across reruns and engines, (b) stable
under repartitioning (rows don't change split when the file layout
changes), and (c) leakage-safe (all rows sharing a key land in the same
split). Spark's samplers are seeded per-partition, so they fail (b) and
(c). Here the assignment is a pure function of the row key: a 16-bit
bucket from the md5 of (salt || key), computed JVM-side. md5 is
bit-identical in every engine (the DuckDB oracles replay the exact
formula), unlike xxhash64/murmur whose seeds differ between systems.

Sequence packing (grouping small documents into fixed-token-budget
training examples) is shard-local greedy first-fit-decreasing: shard by
a stable hash of the key, pack each shard independently inside
`applyInPandas`. Packing quality is within a few percent of global FFD
once shards hold thousands of docs, and nothing ever leaves its
executor — no global sort, no driver collect.
"""

from __future__ import annotations

from collections.abc import Mapping

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 1 << 16  # md5-derived bucket space (4 hex chars)


def hash_bucket(key: Column, salt: str) -> Column:
    """Deterministic bucket in [0, 65536) from md5(salt || key).

    Engine-portable: DuckDB spells it
    ('0x' || substring(md5(salt || CAST(key AS VARCHAR)), 1, 4))::BIGINT.
    """
    hex4 = F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 4)
    return F.conv(hex4, 16, 10).cast("long")


def split_column(
    key: Column, fractions: Mapping[str, float], salt: str = "split-v1"
) -> Column:
    """CASE expression assigning each row a split label by hash bucket.

    Fraction order matters (cumulative thresholds); pass an ordered
    mapping. Fractions must sum to 1.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions sum to {total}, expected 1.0")
    bucket = hash_bucket(key, salt)
    expr = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        cond = bucket < int(cum * BUCKETS)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: Mapping[str, float],
    salt: str = "split-v1",
) -> DataFrame:
    """Append a `split` column (train/val/test/...) keyed on `key_col`."""
    return df.withColumn(
        "split", split_column(F.col(key_col), fractions, salt)
    )


def weighted_mix(
    df: DataFrame,
    group_col: str,
    rates: Mapping[str, float],
    key_col: str,
    default_rate: float = 1.0,
    salt: str = "mix-v1",
) -> DataFrame:
    """Deterministic per-group downsampling — the training-mixture
    rebalance (e.g. keep 25% of 'en', 100% of low-resource langs).

    A row survives iff its hash bucket < rate(group) * 65536, so the
    kept set is reproducible and monotone in the rate (raising a rate
    only ADDS documents — mixtures stay comparable across experiments).
    One scan, no shuffle: the filter is a scalar expression.
    """
    bucket = hash_bucket(F.col(key_col), salt)
    rate = None
    for g, r in rates.items():
        cond = F.col(group_col) == g
        rate = F.when(cond, r) if rate is None else rate.when(cond, r)
    rate = F.lit(default_rate) if rate is None else rate.otherwise(default_rate)
    return df.filter(bucket < (rate * BUCKETS).cast("long"))


def pack_sequences(
    df: DataFrame,
    key_col: str,
    size_col: str,
    budget: int,
    num_shards: int = 64,
    salt: str = "pack-v1",
) -> DataFrame:
    """Pack items into groups whose sizes sum to ≤ `budget` (first-fit
    decreasing within a hash shard). Items with size ≥ budget get a
    singleton pack (the caller chunks or drops oversize docs).

    Returns (pack_id, keys array<long>, n_items, total_size, fill).
    Deterministic: shard assignment is an md5 bucket and FFD breaks ties
    by key, so reruns and relayouts produce identical packs.
    """
    out_schema = (
        "shard long, pack_id string, keys array<long>, n_items int, "
        "total_size long, fill double"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["__shard"].iloc[0])
        items = sorted(
            zip(pdf[key_col], pdf[size_col]),
            key=lambda kv: (-int(kv[1]), int(kv[0])),
        )
        bins: list[list] = []  # [remaining, keys, total]
        for k, s in items:
            k, s = int(k), int(s)
            placed = False
            if s < budget:
                for b in bins:
                    if b[0] >= s:
                        b[0] -= s
                        b[1].append(k)
                        b[2] += s
                        placed = True
                        break
            if not placed:
                # Oversize items get remaining = -1, not 0: a 0 would let
                # zero-size items join and silently break the "oversize
                # packs are singletons" contract.
                bins.append([budget - s if s < budget else -1, [k], s])
        return pd.DataFrame(
            {
                "shard": shard,
                "pack_id": [f"{shard}-{i}" for i in range(len(bins))],
                "keys": [b[1] for b in bins],
                "n_items": [len(b[1]) for b in bins],
                "total_size": [b[2] for b in bins],
                "fill": [min(1.0, b[2] / budget) for b in bins],
            }
        )

    shard = F.pmod(hash_bucket(F.col(key_col), salt), F.lit(num_shards))
    return (
        df.select(key_col, size_col)
        .withColumn("__shard", shard)
        .groupBy("__shard")
        .applyInPandas(pack, schema=out_schema)
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Split each document's token stream into fixed-size overlapping
    chunks — the training-prep / retrieval splitter.

    stride = chunk_tokens - overlap; chunk k covers token positions
    [k*stride, min(k*stride + chunk_tokens, n)). A document of n tokens
    yields 1 chunk if n <= chunk_tokens else 1 + ceil((n - chunk_tokens)
    / stride) — every token is covered, consecutive chunks share exactly
    `overlap` tokens, and the trailing chunk may be short. Empty docs
    yield one empty chunk (the operator stays total; callers filter).

    Entirely narrow: token array materialized behind a projection
    boundary (HOF lambdas get no CSE), chunk starts from a per-row
    sequence, posexplode — NO shuffle at any point, so at 100 TB this
    is scan-bound and embarrassingly parallel.

    Returns (id, chunk_id, chunk_start, n_chunk_tokens, chunk_text).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap=} "
            f"{chunk_tokens=}"
        )
    stride = chunk_tokens - overlap
    toked = docs.select(
        F.col(id_col),
        F.filter(
            F.split(F.col(text_col), "[ \\t\\n\\r]+"), lambda t: t != ""
        ).alias("w"),
    )
    n = F.size("w")
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.lit(1)
        + F.floor(
            (n - chunk_tokens + stride - 1) / F.lit(stride)
        ).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda k: F.slice(F.col("w"), k * stride + 1, chunk_tokens),
    )
    exploded = toked.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "c")
    )
    return exploded.select(
        id_col,
        "chunk_id",
        (F.col("chunk_id") * stride).cast("long").alias("chunk_start"),
        F.size("c").cast("long").alias("n_chunk_tokens"),
        F.array_join("c", " ").alias("chunk_text"),
    )
