"""Perceptual-hash image near-dup catalog query (operators/phash.py).

The corpus carries no real images, so the query PLANTS a controlled
image universe from doc_id (operators/planted.py): every doc gets a
texture whose pHash PROVABLY equals a BCH(31,16)-coded bit pattern,
so any two planted indices sit at hamming >= 14 — chance pairs are
impossible by the code's minimum distance (exhaustively verified in
tests/test_planted.py), not merely improbable, at any corpus size up
to the certified 32768-doc bound. Docs divisible by 3 additionally
get a JPEG-recompressed TWIN of their texture (a true near-duplicate:
drift measured 0 bits, certified tolerance <= 3); other docs
divisible by 7 get an UNRELATED planted texture as a decoy twin. The
pHash banded detector must then find exactly the planted
recompression pairs: the output reports, per planted doc, how many
near-dup partners its original and its twin found — (1, 1) for a
JPEG twin, (0, 0) for a decoy — so both a miss (recall) and any
false positive touching these images (precision) flips the driver's
value hash, while DuckDB reconstructs the expected outcome
arithmetically from the planting rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.plans.catalog import register
from economic_data_etl_spark.sources.tables import load_table

_TWIN_OFFSET = 1 << 40
_IDX_OFFSET = 1 << 41


@register(
    "multimodal_phash_near_dup",
    oracle="""
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'jpeg' ELSE 'noise' END
                   AS planted_kind,
               CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                    AS BIGINT) AS partners_orig,
               CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                    AS BIGINT) AS partners_twin
        FROM documents
        WHERE doc_id % 3 = 0 OR doc_id % 7 = 0
        ORDER BY doc_id
    """,
    doc="Image near-duplicate detection via DCT perceptual hashing "
    "(operators/phash.py): per-doc BCH-coded textures with PROVABLE "
    "pairwise hash distance >= 14 (operators/planted.py — no chance "
    "pairs at any corpus size up to the 32768-doc bound), "
    "JPEG-recompressed twins planted for doc_id % 3 = 0 (through the "
    "repo's own from-scratch JPEG codec), unrelated decoy twins for "
    "other doc_id % 7 = 0. Hashing is Arrow-batched and per-row "
    "independent; the match is a banded (8 x 8-bit, pigeonhole-"
    "complete to hamming 7) self-join plus a codegen bit_count "
    "verify, never all-pairs. The oracle reconstructs the expected "
    "detection outcome from the planting rule, so a recall miss OR "
    "any false-positive pair touching these images fails the hash.",
)
def multimodal_phash_near_dup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from economic_data_etl_spark.operators.phash import (
        near_dup_pairs_by_phash,
        phash64,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def hash_batch(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        from economic_data_etl_spark.operators.jpeg import (
            decode_jpeg,
            encode_jpeg_gray,
        )
        from economic_data_etl_spark.operators.planted import (
            planted_texture,
        )

        # index = 2*doc_id for originals, 2*doc_id + 1 for decoys:
        # injective into the BCH(31,16) message space for corpora up
        # to 32768 docs (every driver SF), so EVERY planted pair sits
        # at provable hamming >= 14 — no chance pairs at any scale
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                base = planted_texture(2 * d)
                rows.append((d, phash64(base)))
                if d % 3 == 0:  # true near-dup: recompressed twin
                    twin = decode_jpeg(encode_jpeg_gray(base))
                    rows.append((d + _TWIN_OFFSET, phash64(twin)))
                elif d % 7 == 0:  # decoy: unrelated planted texture
                    rows.append(
                        (
                            d + _TWIN_OFFSET,
                            phash64(planted_texture(2 * d + 1)),
                        )
                    )
            yield pd.DataFrame(rows, columns=["id", "phash"])

    hashes = docs.mapInPandas(hash_batch, "id long, phash long")
    # hash once: the banded self-join scans this twice and the outcome
    # assembly again — without a checkpoint each scan re-runs the
    # texture synthesis + JPEG recompression (same fix as the video
    # near-dup query; the hash table is 2 longs per image)
    hashes = hashes.localCheckpoint(eager=True)
    pairs = near_dup_pairs_by_phash(hashes, "id", "phash")
    touch = pairs.select(
        F.explode(F.array("id_a", "id_b")).alias("id")
    ).groupBy("id").agg(F.count(F.lit(1)).alias("n_partners"))
    planted = docs.where(
        (F.col("doc_id") % 3 == 0) | (F.col("doc_id") % 7 == 0)
    ).select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit("jpeg"))
        .otherwise(F.lit("noise"))
        .alias("planted_kind"),
    )
    return (
        planted.join(
            touch.withColumnRenamed("id", "doc_id").withColumnRenamed(
                "n_partners", "po"
            ),
            "doc_id",
            "left",
        )
        .join(
            touch.select(
                (F.col("id") - F.lit(_TWIN_OFFSET)).alias("doc_id"),
                F.col("n_partners").alias("pt"),
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            "planted_kind",
            F.coalesce(F.col("po"), F.lit(0))
            .cast("long")
            .alias("partners_orig"),
            F.coalesce(F.col("pt"), F.lit(0))
            .cast("long")
            .alias("partners_twin"),
        )
        .orderBy("doc_id")
    )


@register(
    "dedup_incremental_phash",
    oracle="""
        SELECT doc_id,
               CAST(CASE WHEN doc_id % 8 = 0 THEN 1 ELSE 0 END
                    AS BIGINT) AS n_index_partners,
               (doc_id % 8 = 0) AS is_duplicate
        FROM documents
        WHERE doc_id % 4 = 0
        ORDER BY doc_id
    """,
    doc="Incremental image dedup — the batch-vs-index maintenance "
    "shape (operators/phash.py:near_dup_pairs_by_phash_vs_index), "
    "completing the incremental family next to incremental MinHash "
    "and incremental semantic: docs with doc_id % 4 != 0 form the "
    "EXISTING fingerprint index; docs with doc_id % 4 = 0 arrive as "
    "the new batch, where every doc_id % 8 = 0 is a JPEG-recompressed "
    "copy of an EARLIER index image (a true incoming duplicate) and "
    "the rest are fresh BCH-coded textures. The banded join compares "
    "the batch "
    "against the index ONLY — each increment pays O(batch), never "
    "O(corpus^2) — and the provable >= 14 hamming separation "
    "(operators/planted.py) makes the expected outcome exact at any "
    "corpus size up to the certified bound. A recall miss on a "
    "recompressed copy or a false positive on a fresh image flips "
    "the value hash.",
)
def dedup_incremental_phash(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from economic_data_etl_spark.operators.phash import (
        near_dup_pairs_by_phash_vs_index,
        phash64,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def hash_batch(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        from economic_data_etl_spark.operators.jpeg import (
            decode_jpeg,
            encode_jpeg_gray,
        )
        from economic_data_etl_spark.operators.planted import (
            planted_texture,
        )

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 4 != 0:  # index member
                    rows.append(
                        (d + _IDX_OFFSET, phash64(planted_texture(2 * d)))
                    )
                elif d % 8 == 0:  # incoming duplicate of index image
                    # source d-3 is always an EARLIER corpus doc
                    # ((d-3) % 4 == 1, so an index member) — using
                    # d+1 would dangle when the corpus ends exactly
                    # at a multiple of 8; d == 0 falls back to doc 1
                    src_doc = 1 if d == 0 else d - 3
                    src = planted_texture(2 * src_doc)
                    twin = decode_jpeg(encode_jpeg_gray(src))
                    rows.append((d, phash64(twin)))
                else:  # fresh image, unseen codeword
                    rows.append((d, phash64(planted_texture(2 * d))))
            yield pd.DataFrame(rows, columns=["id", "phash"])

    hashes = docs.mapInPandas(
        hash_batch, "id long, phash long"
    ).localCheckpoint(eager=True)
    index = hashes.where(F.col("id") >= _IDX_OFFSET)
    batch = hashes.where(F.col("id") < _IDX_OFFSET)
    pairs = near_dup_pairs_by_phash_vs_index(batch, index, "id", "phash")
    hits = pairs.groupBy(F.col("batch_id").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("np")
    )
    return (
        docs.where(F.col("doc_id") % 4 == 0)
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("np"), F.lit(0))
            .cast("long")
            .alias("n_index_partners"),
            (F.coalesce(F.col("np"), F.lit(0)) > 0).alias(
                "is_duplicate"
            ),
        )
        .orderBy("doc_id")
    )
