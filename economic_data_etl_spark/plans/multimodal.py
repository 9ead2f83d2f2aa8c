"""Multimodal-column queries: binary payload decode + frame sampling.

Decode is REAL for every certified format (operators/codecs.py and
operators/jpeg.py — PNG/BMP/GIF/WAV/JPEG/MJPEG-AVI from scratch); the
byte-length metadata stub survives only in multimodal_decode_metadata,
which exercises the opaque-payload plumbing (binary columns,
Arrow-batched mapInPandas, 1-to-N frame explode) with stub arithmetic
the oracle replicates. Everything else here decodes actual bytes and is
value-checked cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.operators.multimodal import (
    attach_binary_payload,
    decode_media_metadata,
    sample_frames,
)
from economic_data_etl_spark.plans.catalog import register
from economic_data_etl_spark.sources.tables import load_table


@register(
    "multimodal_decode_metadata",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT)            AS byte_len,
               CAST(octet_length(encode(text)) % 64 + 16 AS INT)     AS width,
               CAST((octet_length(encode(text)) // 64) % 64 + 16 AS INT) AS height,
               CAST(octet_length(encode(text)) % 10 AS INT)          AS n_frames
        FROM documents
        ORDER BY doc_id
    """,
    doc="Binary payload → typed metadata via Arrow-batched mapInPandas "
    "(deterministic codec stub; oracle replicates its arithmetic).",
)
def multimodal_decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return decode_media_metadata(attach_binary_payload(docs)).orderBy("doc_id")


@register(
    "multimodal_frame_sampling",
    oracle="""
        SELECT doc_id,
               CAST(LEAST(CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT), 8)
                    AS BIGINT) AS n_sampled,
               CAST(LEAST(octet_length(encode(text)), 512) AS BIGINT) AS sampled_bytes
        FROM documents
        ORDER BY doc_id
    """,
    doc="Video-style frame sampling (1-to-N mapInPandas explode) then "
    "per-doc frame accounting.",
)
def multimodal_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(attach_binary_payload(docs), every_n_bytes=64, max_frames=8)
    return (
        frames.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(F.length("frame_bytes")).alias("sampled_bytes"),
        )
        .orderBy("doc_id")
    )


@register(
    "multimodal_byte_entropy",
    oracle=r"""
        WITH chars AS (
            SELECT doc_id, unnest(string_split(text, '')) AS c
            FROM documents
        ), cnt AS (
            SELECT doc_id, c, COUNT(*) AS n
            FROM chars WHERE c <> '' GROUP BY 1, 2
        ), tot AS (
            SELECT doc_id, SUM(n) AS t FROM cnt GROUP BY 1
        )
        SELECT cnt.doc_id,
               CAST(MAX(t) AS BIGINT) AS byte_len,
               CAST(COUNT(*) AS INT) AS n_distinct_bytes,
               ROUND(5e-10 - SUM((n * 1.0 / t) * log2(n * 1.0 / t)), 4)
                   AS entropy
        FROM cnt JOIN tot USING (doc_id)
        GROUP BY cnt.doc_id
        ORDER BY cnt.doc_id
    """,
    doc="Payload byte-entropy screen via mapInArrow "
    "(operators/multimodal.py byte_entropy_stats): raw Arrow buffers "
    "viewed by numpy with no pandas materialization — the zero-copy "
    "lane for binary media columns. The oracle histograms characters, "
    "which equals bytes for this ASCII corpus (asserted by the "
    "byte_len column doubling as an octet-length check).",
)
def multimodal_byte_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from economic_data_etl_spark.operators.multimodal import (
        byte_entropy_stats,
    )
    from economic_data_etl_spark.plans.catalog import biased_round

    docs = load_table(spark, sf_dir, "documents")
    stats = byte_entropy_stats(attach_binary_payload(docs))
    return stats.select(
        "doc_id",
        "byte_len",
        "n_distinct_bytes",
        biased_round(F.col("entropy")).alias("entropy"),
    ).orderBy("doc_id")


@register(
    "multimodal_container_header_parse",
    oracle="""
        SELECT doc_id,
               CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                               WHEN 2 THEN 'bmp' ELSE 'wav' END AS format,
               CAST(CASE WHEN doc_id % 4 < 3
                         THEN 16 + doc_id % 64 END AS INT) AS width,
               CAST(CASE WHEN doc_id % 4 < 3
                         THEN 16 + (doc_id // 64) % 64 END AS INT) AS height,
               CAST(CASE WHEN doc_id % 4 = 3
                         THEN 8000 + (doc_id % 8) * 1000 END AS INT)
                   AS sample_rate,
               CAST(CASE WHEN doc_id % 4 = 3
                         THEN 1 + doc_id % 2 END AS INT) AS channels
        FROM documents
        ORDER BY doc_id
    """,
    doc="REAL container-header parsing (operators/multimodal.py:"
    "parse_container_header): PNG IHDR, GIF logical screen, BMP info "
    "header, and WAV fmt chunks are struct-unpacked with no codec "
    "library — the format-routing/corrupt-screening first stage of a "
    "media ingest. End-to-end round-trip check: each doc gets a "
    "header-valid synthetic container whose fields derive from doc_id "
    "(build_sample_container), the parser reads them back from the "
    "BYTES, and the oracle recomputes the expected fields "
    "arithmetically — a builder/parser disagreement or an endianness "
    "bug flips the value hash. (Full pixel decode is certified by the "
    "multimodal_real_pixel_decode / multimodal_jpeg_decode / "
    "multimodal_video_frames queries.)",
)
def multimodal_container_header_parse(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from economic_data_etl_spark.operators.multimodal import (
        CONTAINER_META_SCHEMA,
        build_sample_container,
        parse_container_header,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth_and_parse(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                parse_container_header(build_sample_container(d))
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "format": [m["format"] for m in metas],
                    "width": pd.array(
                        [m["width"] for m in metas], dtype="Int32"
                    ),
                    "height": pd.array(
                        [m["height"] for m in metas], dtype="Int32"
                    ),
                    "sample_rate": pd.array(
                        [m["sample_rate"] for m in metas], dtype="Int32"
                    ),
                    "channels": pd.array(
                        [m["channels"] for m in metas], dtype="Int32"
                    ),
                }
            )

    return docs.mapInPandas(
        synth_and_parse, CONTAINER_META_SCHEMA
    ).orderBy("doc_id")


@register(
    "multimodal_real_pixel_decode",
    oracle="""
        WITH base AS (
            SELECT doc_id,
                   doc_id % 6 AS fmt,
                   16 + doc_id % 64 AS w,
                   16 + (doc_id // 64) % 64 AS h,
                   200 + doc_id % 100 AS ns,
                   1 + doc_id % 7 AS step
            FROM documents
        ), img AS (
            -- flat index of (y, x, c) in the C-order (h, w, 3) array
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_values,
                   CAST(SUM(v) AS BIGINT) AS val_sum,
                   CAST(SUM(v * v) AS BIGINT) AS val_sumsq,
                   CAST(SUM(((y * w + x) * 3 + c) * v) AS BIGINT)
                       AS val_possum
            FROM (
                SELECT b.doc_id, b.w, x.x, y.y, c.c,
                       (x.x + 2 * y.y + 5 * c.c + b.doc_id) % 256 AS v
                FROM base b,
                     UNNEST(range(0, b.w)) AS x(x),
                     UNNEST(range(0, b.h)) AS y(y),
                     UNNEST(range(0, 3)) AS c(c)
                WHERE b.fmt < 2
            ) t(doc_id, w, x, y, c, v) GROUP BY doc_id
        ), gif AS (
            -- 256-gray palette: index maps to (i, i, i), so pixel p
            -- contributes v to channels 3p, 3p+1, 3p+2 — possum term
            -- v*(9p+3). fmt 5 is the INTERLACED variant: same pixels,
            -- 4-pass row order on disk; the decoder must un-permute or
            -- the position-weighted sum shifts.
            SELECT doc_id,
                   CAST(3 * COUNT(*) AS BIGINT) AS n_values,
                   CAST(3 * SUM(v) AS BIGINT) AS val_sum,
                   CAST(3 * SUM(v * v) AS BIGINT) AS val_sumsq,
                   CAST(SUM((9 * (y * w + x) + 3) * v) AS BIGINT)
                       AS val_possum
            FROM (
                SELECT b.doc_id, b.w, x.x, y.y,
                       (x.x + 2 * y.y + b.doc_id) % 256 AS v
                FROM base b,
                     UNNEST(range(0, b.w)) AS x(x),
                     UNNEST(range(0, b.h)) AS y(y)
                WHERE b.fmt IN (2, 5)
            ) t(doc_id, w, x, y, v) GROUP BY doc_id
        ), pal AS (
            -- color-type-3 PNG: index v maps through the test palette
            -- (v, (2v)%256, (3v)%256) — channels differ, so skipping
            -- the palette indirection changes every statistic.
            SELECT doc_id,
                   CAST(3 * COUNT(*) AS BIGINT) AS n_values,
                   CAST(SUM(v + v2 + v3) AS BIGINT) AS val_sum,
                   CAST(SUM(v * v + v2 * v2 + v3 * v3) AS BIGINT)
                       AS val_sumsq,
                   CAST(SUM(3 * p * v + (3 * p + 1) * v2
                            + (3 * p + 2) * v3) AS BIGINT)
                       AS val_possum
            FROM (
                SELECT b.doc_id,
                       y.y * b.w + x.x AS p,
                       (x.x + 2 * y.y + b.doc_id) % 256 AS v,
                       (2 * ((x.x + 2 * y.y + b.doc_id) % 256)) % 256
                           AS v2,
                       (3 * ((x.x + 2 * y.y + b.doc_id) % 256)) % 256
                           AS v3
                FROM base b,
                     UNNEST(range(0, b.w)) AS x(x),
                     UNNEST(range(0, b.h)) AS y(y)
                WHERE b.fmt = 4
            ) t(doc_id, p, v, v2, v3) GROUP BY doc_id
        ), aud AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_values,
                   CAST(SUM(v) AS BIGINT) AS val_sum,
                   CAST(SUM(v * v) AS BIGINT) AS val_sumsq,
                   CAST(SUM(i * v) AS BIGINT) AS val_possum
            FROM (
                SELECT b.doc_id, i.i,
                       (i.i * b.step) % 1024 - 512 AS v
                FROM base b, UNNEST(range(0, b.ns)) AS i(i)
                WHERE b.fmt = 3
            ) t(doc_id, i, v) GROUP BY doc_id
        )
        SELECT b.doc_id,
               CASE b.fmt WHEN 0 THEN 'png' WHEN 1 THEN 'bmp'
                          WHEN 2 THEN 'gif' WHEN 3 THEN 'wav'
                          WHEN 4 THEN 'png' ELSE 'gif' END AS format,
               COALESCE(i.n_values, g.n_values, p.n_values, a.n_values)
                   AS n_values,
               COALESCE(i.val_sum, g.val_sum, p.val_sum, a.val_sum)
                   AS val_sum,
               COALESCE(i.val_sumsq, g.val_sumsq, p.val_sumsq,
                        a.val_sumsq) AS val_sumsq,
               COALESCE(i.val_possum, g.val_possum, p.val_possum,
                        a.val_possum) AS val_possum
        FROM base b
        LEFT JOIN img i USING (doc_id)
        LEFT JOIN gif g USING (doc_id)
        LEFT JOIN pal p USING (doc_id)
        LEFT JOIN aud a USING (doc_id)
        ORDER BY b.doc_id
    """,
    doc="REAL pixel/sample decode, certified cross-engine with no codec "
    "library (operators/codecs.py): each doc gets a COMPLETE valid "
    "media file cycling SIX profiles (truecolor PNG with scanlines "
    "cycling ALL five filter types / 24-bit padded BMP / "
    "LZW-compressed GIF / PCM16 WAV / color-type-3 palette PNG / "
    "INTERLACED GIF) whose pixel and sample values follow a "
    "closed-form pattern in doc_id. Spark recovers the values by "
    "genuinely decoding the bytes — zlib inflate, "
    "Sub/Up/Average/Paeth reconstruction, PLTE palette indirection, "
    "BGR/bottom-up/padding handling, variable-width LZW with "
    "dictionary resets, 4-pass de-interlacing, RIFF chunk walk — and "
    "emits exact integer statistics including a POSITION-WEIGHTED "
    "checksum (plain sums are order-invariant, so only Σ index·value "
    "catches a row flip, a skipped palette lookup, or a wrong "
    "de-interlace permutation); DuckDB computes the same statistics "
    "arithmetically from doc_id. Everything DEFLATE/LZW-based or "
    "uncompressed is decoded for real; baseline JPEG and MJPEG video "
    "are certified by their own queries (multimodal_jpeg_decode, "
    "multimodal_video_frames), leaving only non-baseline JPEG modes "
    "and inter-frame-predictive video as the documented "
    "NotImplementedError seam.",
)
def multimodal_real_pixel_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from economic_data_etl_spark.operators.codecs import (
        build_full_media,
        decode_media,
    )

    # The scan is one small parquet file → ONE input partition, which
    # would serialize the whole decode stage onto a single core. Spread
    # the ids round-robin first (the shuffle moves 8-byte longs only);
    # with real stored payloads spark.sql.files.maxPartitionBytes does
    # this sizing at scan time and the repartition disappears.
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = (
        "doc_id long, format string, n_values long, "
        "val_sum long, val_sumsq long, val_possum long"
    )

    def synth_decode_reduce(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                m = decode_media(build_full_media(int(d)))
                arr = m["data"].astype(np.int64)
                flat = arr.ravel()  # C-order — the oracle's index space
                rows.append(
                    (
                        int(d),
                        m["format"],
                        int(arr.size),
                        int(flat.sum()),
                        int((flat * flat).sum()),
                        int((np.arange(flat.size) * flat).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "format", "n_values",
                    "val_sum", "val_sumsq", "val_possum",
                ],
            )

    return docs.mapInPandas(synth_decode_reduce, schema).orderBy("doc_id")


@register(
    "multimodal_jpeg_decode",
    oracle="""
        WITH base AS (
            SELECT doc_id,
                   16 + doc_id % 64 AS w,
                   16 + (doc_id // 64) % 64 AS h
            FROM documents
        ), px AS (
            -- decoded pixel of the block-constant test image: every
            -- 8x8 block cell is constant, so all AC coefficients are
            -- exactly zero and baseline JPEG decode reduces to the
            -- DC closed form (quantize then dequantize+IDCT, both
            -- with the codec's pinned biased round-half-up; q=17 is
            -- odd so the inner rounding never ties; the 1e-6 bias
            -- resolves the outer L*q = 4 (mod 8) exact boundaries
            -- identically in IEEE doubles on both engines).
            SELECT b.doc_id, b.w,
                   y.y * b.w + x.x AS p,
                   LEAST(255, GREATEST(0,
                       CAST(FLOOR(
                           FLOOR(8 * (((x.x // 8) + 2 * (y.y // 8)
                                       + b.doc_id) % 256 - 128)
                                 / 17 + 0.5 + 1e-6)
                           * 17 / 8.0 + 0.5 + 1e-6) AS BIGINT)
                       + 128)) AS v
            FROM base b,
                 UNNEST(range(0, b.w)) AS x(x),
                 UNNEST(range(0, b.h)) AS y(y)
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_values,
               CAST(SUM(v) AS BIGINT) AS val_sum,
               CAST(SUM(v * v) AS BIGINT) AS val_sumsq,
               CAST(SUM(p * v) AS BIGINT) AS val_possum
        FROM px
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    doc="REAL baseline-JPEG decode certified cross-engine with no codec "
    "library (operators/jpeg.py — canonical Annex-K Huffman, zigzag, "
    "all-odd quantization, orthonormal 8x8 DCT, byte stuffing, all "
    "from scratch): each doc gets a complete JFIF file of a "
    "BLOCK-CONSTANT grayscale image, the subspace where lossy JPEG "
    "has an exact closed form (constant blocks have identically zero "
    "AC coefficients, so decode is the DC quantize/dequantize chain "
    "with the codec's pinned biased rounding). Spark genuinely "
    "encodes and entropy-decodes the bytes per document inside Arrow "
    "batches; DuckDB computes the same pixel statistics — including "
    "the order-sensitive position-weighted checksum — arithmetically "
    "from doc_id. A Huffman table mis-build, a DC-prediction slip, a "
    "zigzag transposition, or an IDCT scaling error changes the sums "
    "and fails the value hash. The general AC path (runs, ZRL, "
    "magnitude categories) is certified by independent-math "
    "round-trips in tests/test_jpeg.py. The per-document restart "
    "interval cycle (0-3 MCUs) puts DRI/RSTn marker handling — "
    "byte-aligned restart sync, DC prediction reset — under this "
    "row's value hash too: restarts reorganize only the entropy "
    "stream, so the closed-form oracle is unchanged.",
)
def multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from economic_data_etl_spark.operators.jpeg import (
        block_constant_pattern,
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = (
        "doc_id long, n_values long, val_sum long, "
        "val_sumsq long, val_possum long"
    )

    def synth_jpeg_reduce(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 16 + d % 64, 16 + (d // 64) % 64
                img = block_constant_pattern(d, w, h)
                # restart interval cycles 0 (none), 1, 2, 3 MCUs:
                # DRI/RSTn markers reorganize the ENTROPY stream only
                # (byte-aligned restarts, DC prediction reset), so the
                # decoded pixels — and the oracle — are unchanged, and
                # the driver row now certifies restart handling too
                arr = decode_jpeg_gray(
                    encode_jpeg_gray(img, restart_interval=d % 4)
                ).astype(np.int64)
                flat = arr.ravel()
                rows.append(
                    (
                        d,
                        int(arr.size),
                        int(flat.sum()),
                        int((flat * flat).sum()),
                        int((np.arange(flat.size) * flat).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_values", "val_sum",
                    "val_sumsq", "val_possum",
                ],
            )

    return docs.mapInPandas(synth_jpeg_reduce, schema).orderBy("doc_id")


@register(
    "multimodal_arithmetic_jpeg",
    oracle="""
        WITH base AS (
            SELECT doc_id,
                   16 + doc_id % 64 AS w,
                   16 + (doc_id // 64) % 64 AS h
            FROM documents
        ), px AS (
            -- identical closed form to multimodal_jpeg_decode: the
            -- arithmetic codec shares the baseline's quantization and
            -- IDCT, so on block-constant images the decoded pixels
            -- are the same DC chain — what this row adds under the
            -- value hash is the ENTIRE SOF9 entropy layer (QM coder,
            -- Annex F statistical models, conditioning contexts,
            -- byte stuffing, arithmetic restart re-initialization).
            SELECT b.doc_id, b.w,
                   y.y * b.w + x.x AS p,
                   LEAST(255, GREATEST(0,
                       CAST(FLOOR(
                           FLOOR(8 * (((x.x // 8) + 2 * (y.y // 8)
                                       + b.doc_id) % 256 - 128)
                                 / 17 + 0.5 + 1e-6)
                           * 17 / 8.0 + 0.5 + 1e-6) AS BIGINT)
                       + 128)) AS v
            FROM base b,
                 UNNEST(range(0, b.w)) AS x(x),
                 UNNEST(range(0, b.h)) AS y(y)
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_values,
               CAST(SUM(v) AS BIGINT) AS val_sum,
               CAST(SUM(v * v) AS BIGINT) AS val_sumsq,
               CAST(SUM(p * v) AS BIGINT) AS val_possum
        FROM px
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    doc="REAL arithmetic-coded JPEG decode — BOTH processes — "
    "certified cross-engine with no codec library: even doc_ids get "
    "a sequential SOF9 file (operators/jpeg_arithmetic.py — T.81 "
    "Annex D QM coder with its 113-state probability estimator, "
    "Annex F DC/AC statistical models with adaptive context bins, "
    "DAC conditioning, 0xFF byte stuffing), odd doc_ids a "
    "PROGRESSIVE SOF10 file (operators/jpeg_arith_progressive.py — "
    "spectral-selection bands + successive-approximation ladders "
    "Al 0-3 re-entropy-coded through the same QM coder, per-scan "
    "statistics resets). Both share the baseline codec's "
    "quantization/IDCT, so the oracle is the identical DC closed "
    "form of multimodal_jpeg_decode and every decoded pixel "
    "difference would be an entropy-layer bug. The restart cycle "
    "additionally pins arithmetic restart handling: coder flush + "
    "RSTn + full statistics re-initialization, in every scan of the "
    "progressive script. The general paths are certified by bitwise "
    "round-trip equality with the baseline decode on random images "
    "(tests/test_jpeg_arithmetic.py, "
    "tests/test_jpeg_arith_progressive.py).",
)
def multimodal_arithmetic_jpeg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from economic_data_etl_spark.operators.jpeg import (
        block_constant_pattern,
        decode_jpeg_gray,
    )
    from economic_data_etl_spark.operators.jpeg_arith_progressive import (
        encode_jpeg_arith_progressive,
    )
    from economic_data_etl_spark.operators.jpeg_arithmetic import (
        encode_jpeg_arith_gray,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = (
        "doc_id long, n_values long, val_sum long, "
        "val_sumsq long, val_possum long"
    )

    def synth_arith_reduce(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 16 + d % 64, 16 + (d // 64) % 64
                img = block_constant_pattern(d, w, h)
                if d % 2 == 0:  # sequential SOF9
                    payload = encode_jpeg_arith_gray(
                        img, restart_interval=d % 4
                    )
                else:  # progressive SOF10, Al ladder cycles 0..3
                    payload = encode_jpeg_arith_progressive(
                        img,
                        al=(d // 2) % 4,
                        restart_interval=d % 4,
                    )
                arr = decode_jpeg_gray(payload).astype(np.int64)
                flat = arr.ravel()
                rows.append(
                    (
                        d,
                        int(arr.size),
                        int(flat.sum()),
                        int((flat * flat).sum()),
                        int((np.arange(flat.size) * flat).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_values", "val_sum",
                    "val_sumsq", "val_possum",
                ],
            )

    return docs.mapInPandas(synth_arith_reduce, schema).orderBy("doc_id")


@register(
    "multimodal_lossless_jpeg",
    oracle="""
        WITH base AS (
            SELECT doc_id,
                   16 + doc_id % 64 AS w,
                   16 + (doc_id // 64) % 64 AS h
            FROM documents
        ), px AS (
            -- SOF3 is EXACTLY lossless, so the oracle is simply the
            -- input pattern itself: v = (x + 2y + d) % 256. No
            -- rounding pins, no tie analysis — any single-bit defect
            -- in prediction, the mod-2^16 difference wrap, Huffman
            -- coding, or restart resynchronization changes the sums.
            SELECT b.doc_id, b.w,
                   y.y * b.w + x.x AS p,
                   (x.x + 2 * y.y + b.doc_id) % 256 AS v
            FROM base b,
                 UNNEST(range(0, b.w)) AS x(x),
                 UNNEST(range(0, b.h)) AS y(y)
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_values,
               CAST(SUM(v) AS BIGINT) AS val_sum,
               CAST(SUM(v * v) AS BIGINT) AS val_sumsq,
               CAST(SUM(p * v) AS BIGINT) AS val_possum
        FROM px
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    doc="REAL lossless JPEG (SOF3) decode certified cross-engine "
    "(operators/jpeg_lossless.py — T.81 Annex H DPCM prediction with "
    "all seven predictors, mod-2^16 difference arithmetic, DC-style "
    "magnitude-category Huffman, restart context resets, no codec "
    "library): each doc's gradient pattern is encoded with predictor "
    "1 + doc_id % 7 and restart interval doc_id % 3, then decoded. "
    "Because the mode is exactly lossless the oracle needs no "
    "closed-form rounding analysis at all — it is the input pattern "
    "itself — so the value hash certifies bit-exact recovery through "
    "every predictor and the restart machinery across the corpus.",
)
def multimodal_lossless_jpeg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from economic_data_etl_spark.operators.codecs import gray_pattern
    from economic_data_etl_spark.operators.jpeg import decode_jpeg
    from economic_data_etl_spark.operators.jpeg_lossless import (
        encode_jpeg_lossless,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = (
        "doc_id long, n_values long, val_sum long, "
        "val_sumsq long, val_possum long"
    )

    def synth_lossless_reduce(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                w = 16 + d % 64
                # restart every 0 / 1 / 2 rows — realistic segment
                # sizes (a 1-sample restart interval is legal but
                # degenerates the stream to mostly RSTn markers)
                arr = decode_jpeg(
                    encode_jpeg_lossless(
                        gray_pattern(d),
                        predictor=1 + d % 7,
                        restart_interval=(d % 3) * w,
                    )
                ).astype(np.int64)
                flat = arr.ravel()
                rows.append(
                    (
                        d,
                        int(arr.size),
                        int(flat.sum()),
                        int((flat * flat).sum()),
                        int((np.arange(flat.size) * flat).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_values", "val_sum",
                    "val_sumsq", "val_possum",
                ],
            )

    return docs.mapInPandas(synth_lossless_reduce, schema).orderBy("doc_id")


@register(
    "multimodal_progressive_jpeg",
    oracle="""
        WITH base AS (
            SELECT doc_id,
                   16 + doc_id % 64 AS w,
                   16 + (doc_id // 64) % 64 AS h
            FROM documents
        ), px AS (
            -- identical closed form to multimodal_jpeg_decode: the
            -- scans only REORDER how the quantized coefficients
            -- travel; on block-constant images every AC is exactly
            -- zero in every scan and successive approximation
            -- reconstructs the full-precision DC bit-for-bit, so the
            -- decoded pixel is the same DC quantize/dequantize chain.
            SELECT b.doc_id, b.w,
                   y.y * b.w + x.x AS p,
                   LEAST(255, GREATEST(0,
                       CAST(FLOOR(
                           FLOOR(8 * (((x.x // 8) + 2 * (y.y // 8)
                                       + b.doc_id) % 256 - 128)
                                 / 17 + 0.5 + 1e-6)
                           * 17 / 8.0 + 0.5 + 1e-6) AS BIGINT)
                       + 128)) AS v
            FROM base b,
                 UNNEST(range(0, b.w)) AS x(x),
                 UNNEST(range(0, b.h)) AS y(y)
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_values,
               CAST(SUM(v) AS BIGINT) AS val_sum,
               CAST(SUM(v * v) AS BIGINT) AS val_sumsq,
               CAST(SUM(p * v) AS BIGINT) AS val_possum
        FROM px
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    doc="REAL progressive-JPEG decode certified cross-engine "
    "(operators/jpeg_progressive.py — spectral selection, successive "
    "approximation, EOB runs, from scratch): each doc is encoded as a "
    "multi-scan SOF2 stream (the successive-approximation depth "
    "cycles with doc_id % 4, so the driver row exercises "
    "spectral-selection-only AND 1-3 levels of DC/AC refinement) and "
    "entropy-decoded scan by scan inside Arrow batches; DuckDB "
    "computes the identical pixel statistics arithmetically from "
    "doc_id because block-constant images make every scan's AC "
    "contribution exactly zero and refinement reconstructs the full "
    "DC. A scan-sequencing bug, a refinement-bit slip, or a "
    "point-transform sign error changes the sums and fails the value "
    "hash. The general path (newly-significant runs, correction "
    "bits, ZRL-in-refinement, EOB runs across blocks) is pinned by "
    "tests/test_jpeg_progressive.py.",
)
def multimodal_progressive_jpeg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from economic_data_etl_spark.operators.jpeg import (
        block_constant_pattern,
        decode_jpeg_gray,
    )
    from economic_data_etl_spark.operators.jpeg_progressive import (
        encode_jpeg_progressive,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = (
        "doc_id long, n_values long, val_sum long, "
        "val_sumsq long, val_possum long"
    )

    def synth_prog_reduce(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 16 + d % 64, 16 + (d // 64) % 64
                img = block_constant_pattern(d, w, h)
                # cycle approximation depth AND restart interval per
                # doc: both reorganize only the entropy stream, so the
                # closed-form oracle is unchanged while the driver row
                # certifies every scan type with and without RSTn
                payload = encode_jpeg_progressive(
                    img, al=d % 4, restart_interval=d % 3
                )
                arr = decode_jpeg_gray(payload).astype(np.int64)
                flat = arr.ravel()
                rows.append(
                    (
                        d,
                        int(arr.size),
                        int(flat.sum()),
                        int((flat * flat).sum()),
                        int((np.arange(flat.size) * flat).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_values", "val_sum",
                    "val_sumsq", "val_possum",
                ],
            )

    return docs.mapInPandas(synth_prog_reduce, schema).orderBy("doc_id")


@register(
    "multimodal_color_jpeg_decode",
    oracle="""
        WITH base AS (
            SELECT doc_id,
                   16 + doc_id % 64 AS w,
                   16 + (doc_id // 64) % 64 AS h
            FROM documents
        ),
        tiles AS (
            -- 16x16-aligned constant-color tiles: constant 8x8 blocks
            -- in EVERY sampling layout (4:4:4/4:2:0/4:2:2/4:4:0), and
            -- chroma 2x2/1x2/2x1 means never straddle a tile, so the
            -- whole lossy pipeline collapses to per-tile constants
            SELECT b.doc_id, b.w, b.h, tx.tx, ty.ty,
                   LEAST(16, b.w - tx.tx * 16) AS nx,
                   LEAST(16, b.h - ty.ty * 16) AS ny
            FROM base b,
                 UNNEST(range(0, (b.w + 15) // 16)) AS tx(tx),
                 UNNEST(range(0, (b.h + 15) // 16)) AS ty(ty)
        ),
        consts AS (
            SELECT *,
                   (tx + 2 * ty + doc_id) % 256       AS r0,
                   (3 * tx + ty + 5 * doc_id) % 256   AS g0,
                   (2 * tx + 3 * ty + 7 * doc_id) % 256 AS b0
            FROM tiles
        ),
        ycc AS (
            -- the codec's rgb_to_ycbcr, verbatim: same literals, same
            -- left-associated IEEE double ops, same biased floor —
            -- DuckDB computes the bit-identical result
            SELECT *,
                LEAST(255, GREATEST(0, CAST(FLOOR(
                    0.299 * r0 + 0.587 * g0 + 0.114 * b0 + 0.5 + 1e-6
                ) AS BIGINT))) AS yv,
                LEAST(255, GREATEST(0, CAST(FLOOR(
                    128.0 - 0.168736 * r0 - 0.331264 * g0 + 0.5 * b0
                    + 0.5 + 1e-6
                ) AS BIGINT))) AS cbv,
                LEAST(255, GREATEST(0, CAST(FLOOR(
                    128.0 + 0.5 * r0 - 0.418688 * g0 - 0.081312 * b0
                    + 0.5 + 1e-6
                ) AS BIGINT))) AS crv
            FROM consts
        ),
        dec AS (
            -- per-plane DC quantize/dequantize chain (luma and chroma
            -- DC quantizers are both the odd 17 -> tie-free)
            SELECT *,
                LEAST(255, GREATEST(0, CAST(FLOOR(
                    FLOOR(8 * (yv - 128) / 17 + 0.5 + 1e-6)
                    * 17 / 8.0 + 0.5 + 1e-6) AS BIGINT) + 128)) AS yd,
                LEAST(255, GREATEST(0, CAST(FLOOR(
                    FLOOR(8 * (cbv - 128) / 17 + 0.5 + 1e-6)
                    * 17 / 8.0 + 0.5 + 1e-6) AS BIGINT) + 128)) AS cbd,
                LEAST(255, GREATEST(0, CAST(FLOOR(
                    FLOOR(8 * (crv - 128) / 17 + 0.5 + 1e-6)
                    * 17 / 8.0 + 0.5 + 1e-6) AS BIGINT) + 128)) AS crd
            FROM ycc
        ),
        rgb AS (
            -- the codec's ycbcr_to_rgb, verbatim
            SELECT *,
                LEAST(255, GREATEST(0, CAST(FLOOR(
                    yd + 1.402 * (crd - 128) + 0.5 + 1e-6
                ) AS BIGINT))) AS vr,
                LEAST(255, GREATEST(0, CAST(FLOOR(
                    yd - 0.344136 * (cbd - 128) - 0.714136 * (crd - 128)
                    + 0.5 + 1e-6
                ) AS BIGINT))) AS vg,
                LEAST(255, GREATEST(0, CAST(FLOOR(
                    yd + 1.772 * (cbd - 128) + 0.5 + 1e-6
                ) AS BIGINT))) AS vb
            FROM dec
        ),
        contrib AS (
            -- flat C-order index of pixel (y, x, c) is (y*w + x)*3 + c;
            -- per-tile sums of the index need only the arithmetic
            -- series over the tile's rows/cols
            SELECT doc_id, w, h, nx, ny, vr, vg, vb,
                   16 * tx * nx + (nx * (nx - 1)) // 2 AS sx,
                   16 * ty * ny + (ny * (ny - 1)) // 2 AS sy
            FROM rgb
        )
        SELECT doc_id,
               CAST(SUM(3 * nx * ny) AS BIGINT) AS n_values,
               CAST(SUM(nx * ny * (vr + vg + vb)) AS BIGINT) AS val_sum,
               CAST(SUM(nx * ny * (vr * vr + vg * vg + vb * vb))
                    AS BIGINT) AS val_sumsq,
               CAST(SUM(3 * (w * sy * nx + sx * ny) * (vr + vg + vb)
                        + nx * ny * (vg + 2 * vb))
                    AS BIGINT) AS val_possum
        FROM contrib
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    doc="REAL color-JPEG decode certified cross-engine — the first "
    "driver row through the full chroma pipeline (RGB->YCbCr with the "
    "codec's biased rounding, per-layout chroma reduction, separate "
    "luma/chroma tables, interleaved MCUs, replicate upsampling, "
    "YCbCr->RGB): each doc is a 16x16-tile block-constant COLOR image "
    "whose sampling layout cycles 4:4:4/4:2:0/4:2:2/4:4:0 and restart "
    "interval cycles 0-2 with doc_id. On that subspace every AC "
    "coefficient is exactly zero in every plane and the chroma means "
    "are exact, so the decode collapses to per-tile constants DuckDB "
    "computes by running the VERBATIM color-transform float "
    "expressions (same literals, same op order -> bit-identical IEEE "
    "doubles) plus the odd-17 DC chain; the oracle aggregates "
    "per-tile via arithmetic series instead of per-pixel rows. A "
    "chroma-swap, wrong-table, upsample-shift, or sampling-factor bug "
    "changes the sums and fails the value hash.",
)
def multimodal_color_jpeg_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from economic_data_etl_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_color,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = (
        "doc_id long, n_values long, val_sum long, "
        "val_sumsq long, val_possum long"
    )

    def synth_color_reduce(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        modes = ("444", "420", "422", "440")
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 16 + d % 64, 16 + (d // 64) % 64
                tx = (np.arange(w) // 16)[None, :]
                ty = (np.arange(h) // 16)[:, None]
                img = np.stack(
                    [
                        (tx + 2 * ty + d) % 256,
                        (3 * tx + ty + 5 * d) % 256,
                        (2 * tx + 3 * ty + 7 * d) % 256,
                    ],
                    axis=2,
                ).astype(np.uint8)
                payload = encode_jpeg_color(
                    img, subsample=modes[d % 4], restart_interval=d % 3
                )
                arr = decode_jpeg(payload).astype(np.int64)
                flat = arr.ravel()  # C-order (y, x, channel)
                rows.append(
                    (
                        d,
                        int(arr.size),
                        int(flat.sum()),
                        int((flat * flat).sum()),
                        int((np.arange(flat.size) * flat).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_values", "val_sum",
                    "val_sumsq", "val_possum",
                ],
            )

    return docs.mapInPandas(synth_color_reduce, schema).orderBy("doc_id")


@register(
    "multimodal_gif_animation",
    oracle="""
        WITH base AS (
            SELECT doc_id,
                   16 + doc_id % 64 AS w,
                   16 + (doc_id // 64) % 64 AS h,
                   2 + doc_id % 3 AS nf
            FROM documents
        ),
        px AS (
            -- frame 0 ships whole: v = (x + 2y + d) % 255 + 1 (values
            -- 1..255; index 0 is the transparent index). Later frames
            -- update ONLY the right half's alternating checkerboard
            -- ((x + y + f) even), so a pixel's value at frame f is the
            -- base advanced to its LAST update: f - ((x + y + f) % 2).
            -- The left half never changes after frame 0.
            SELECT b.doc_id, b.w, b.h, b.nf, f.f, y.y, x.x,
                   CASE
                       WHEN f.f = 0 OR x.x < b.w // 2
                           THEN (x.x + 2 * y.y + b.doc_id) % 255 + 1
                       ELSE (x.x + 2 * y.y + b.doc_id + f.f
                             - ((x.x + y.y + f.f) % 2)) % 255 + 1
                   END AS v
            FROM base b,
                 UNNEST(range(0, b.nf)) AS f(f),
                 UNNEST(range(0, b.h)) AS y(y),
                 UNNEST(range(0, b.w)) AS x(x)
        )
        SELECT doc_id,
               CAST(3 * COUNT(*) AS BIGINT) AS n_values,
               CAST(3 * SUM(v) AS BIGINT) AS val_sum,
               CAST(3 * SUM(v * v) AS BIGINT) AS val_sumsq,
               CAST(SUM((9 * ((f * h + y) * w + x) + 3) * v)
                    AS BIGINT) AS val_possum
        FROM px
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    doc="REAL animated-GIF decode certified cross-engine: each doc is "
    "a 2-4 frame animation whose right half advances an alternating "
    "checkerboard while the left half stays static. The encoder ships "
    "frame 0 whole and every later frame as the BOUNDING RECT of its "
    "changes with unchanged in-rect pixels transparent (disposal 1) — "
    "the standard delta layout — so the Spark-side decode must walk "
    "GCE extensions, composite sub-rect patches over the accumulated "
    "canvas, and honor the transparent index to reconstruct full "
    "frames. DuckDB computes the same per-frame pixel values from the "
    "closed form (a pixel's value is its base advanced to its last "
    "checkerboard update). A compositing bug — dropped transparency, "
    "wrong rect origin, canvas reset between frames — changes the "
    "position-weighted sums and fails the value hash.",
)
def multimodal_gif_animation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from economic_data_etl_spark.operators.codecs import (
        decode_gif_frames,
        encode_gif_animated,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = (
        "doc_id long, n_values long, val_sum long, "
        "val_sumsq long, val_possum long"
    )

    def synth_gif_reduce(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 16 + d % 64, 16 + (d // 64) % 64
                nf = 2 + d % 3
                x = np.arange(w)[None, :]
                y = np.arange(h)[:, None]
                frames = [((x + 2 * y + d) % 255 + 1).astype(np.uint8)]
                # advance the right half's alternating checkerboard —
                # the frames are built by the UPDATE RULE; the oracle
                # holds the closed form the rule must converge to
                for f in range(1, nf):
                    nxt = frames[-1].copy()
                    upd = ((x + y + f) % 2 == 0) & (x >= w // 2)
                    nxt[upd] = (((x + 2 * y + d + f) % 255 + 1)[upd]).astype(
                        np.uint8
                    )
                    frames.append(nxt)
                payload = encode_gif_animated(frames)
                arr = np.stack(
                    decode_gif_frames(payload), axis=0
                ).astype(np.int64)  # (nf, h, w, 3)
                flat = arr.ravel()
                rows.append(
                    (
                        d,
                        int(arr.size),
                        int(flat.sum()),
                        int((flat * flat).sum()),
                        int((np.arange(flat.size) * flat).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_values", "val_sum",
                    "val_sumsq", "val_possum",
                ],
            )

    return docs.mapInPandas(synth_gif_reduce, schema).orderBy("doc_id")


@register(
    "multimodal_video_frames",
    oracle="""
        WITH base AS (
            SELECT doc_id,
                   16 + doc_id % 64 AS w,
                   16 + (doc_id // 64) % 64 AS h,
                   2 + doc_id % 3 AS nf
            FROM documents
        ), fr AS (
            SELECT b.doc_id, b.w, b.h, f.f AS frame_idx
            FROM base b, UNNEST(range(0, b.nf)) AS f(f)
        ), px AS (
            -- frame f carries the block-constant pattern of
            -- (doc_id + f): the same DC-only JPEG closed form as
            -- multimodal_jpeg_decode, per frame
            SELECT fr.doc_id, fr.frame_idx,
                   y.y * fr.w + x.x AS p,
                   LEAST(255, GREATEST(0,
                       CAST(FLOOR(
                           FLOOR(8 * (((x.x // 8) + 2 * (y.y // 8)
                                       + fr.doc_id + fr.frame_idx)
                                      % 256 - 128)
                                 / 17 + 0.5 + 1e-6)
                           * 17 / 8.0 + 0.5 + 1e-6) AS BIGINT)
                       + 128)) AS v
            FROM fr,
                 UNNEST(range(0, fr.w)) AS x(x),
                 UNNEST(range(0, fr.h)) AS y(y)
        )
        SELECT doc_id,
               CAST(frame_idx AS BIGINT) AS frame_idx,
               CAST(COUNT(*) AS BIGINT) AS n_values,
               CAST(SUM(v) AS BIGINT) AS val_sum,
               CAST(SUM(p * v) AS BIGINT) AS val_possum
        FROM px
        GROUP BY doc_id, frame_idx
        ORDER BY doc_id, frame_idx
    """,
    doc="REAL video decode certified cross-engine with no codec "
    "library: each doc gets a complete MJPEG AVI (RIFF container "
    "built and walked from scratch, every '00dc' frame a baseline "
    "JPEG from operators/jpeg.py) of 2-4 block-constant grayscale "
    "frames. Spark walks the container, entropy-decodes every frame, "
    "and emits per-frame pixel statistics (including the "
    "order-sensitive position-weighted checksum); DuckDB computes the "
    "same statistics from doc_id and frame index via the DC-only "
    "closed form. This is the decode-explode shape of a real video "
    "ingest (one payload row to N frame rows inside Arrow batches). "
    "After this query the genuinely library-gated surface is "
    "inter-frame-predictive video only (H.264/VP9/AV1 motion "
    "compensation + arithmetic coding).",
)
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from economic_data_etl_spark.operators.codecs import (
        decode_mjpeg_avi,
        encode_mjpeg_avi,
    )
    from economic_data_etl_spark.operators.jpeg import (
        block_constant_pattern,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = (
        "doc_id long, frame_idx long, n_values long, "
        "val_sum long, val_possum long"
    )

    def synth_video_explode(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 16 + d % 64, 16 + (d // 64) % 64
                nf = 2 + d % 3
                payload = encode_mjpeg_avi(
                    [
                        block_constant_pattern(d + f, w, h)
                        for f in range(nf)
                    ]
                )
                for f, frame in enumerate(decode_mjpeg_avi(payload)):
                    flat = frame.astype(np.int64).ravel()
                    rows.append(
                        (
                            d,
                            f,
                            int(flat.size),
                            int(flat.sum()),
                            int((np.arange(flat.size) * flat).sum()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "n_values",
                    "val_sum", "val_possum",
                ],
            )

    return docs.mapInPandas(synth_video_explode, schema).orderBy(
        "doc_id", "frame_idx"
    )


@register(
    "multimodal_g711_audio_decode",
    oracle="""
        WITH base AS (
            SELECT doc_id, 200 + doc_id % 100 AS ns
            FROM documents
        ), sm AS (
            -- mu-law expand of code c (ITU G.711): complement, split
            -- into sign/exponent/mantissa, rebuild the segment
            -- midpoint — pure integer arithmetic, mirrored from
            -- operators/codecs.py:mulaw_decode
            SELECT b.doc_id, i.i,
                   CASE WHEN (255 - ((i.i * 7 + b.doc_id) % 256)) >= 128
                        THEN -(((255 - ((i.i * 7 + b.doc_id) % 256)) % 16)
                               * 8 + 132)
                             * CAST(POWER(2,
                                 ((255 - ((i.i * 7 + b.doc_id) % 256))
                                  // 16) % 8) AS BIGINT) + 132
                        ELSE (((255 - ((i.i * 7 + b.doc_id) % 256)) % 16)
                              * 8 + 132)
                             * CAST(POWER(2,
                                 ((255 - ((i.i * 7 + b.doc_id) % 256))
                                  // 16) % 8) AS BIGINT) - 132
                   END AS v
            FROM base b, UNNEST(range(0, b.ns)) AS i(i)
        ), sa AS (
            -- A-law expand of the SAME code stream: XOR the 0x55
            -- toggle, split sign/exponent/mantissa, rebuild the
            -- 13-bit segment midpoint and scale <<3 — sign bit SET
            -- means positive in A-law (the opposite of mu-law's
            -- complemented convention). Mirrors
            -- operators/codecs.py:alaw_decode exactly (verified over
            -- all 256 codes on both engines).
            SELECT b.doc_id, i.i,
                   CASE WHEN xor((i.i * 7 + b.doc_id) % 256, 85) >= 128
                        THEN 8
                        ELSE -8
                   END
                   * (CASE WHEN (xor((i.i * 7 + b.doc_id) % 256, 85)
                                 // 16) % 8 = 0
                           THEN 2 * (xor((i.i * 7 + b.doc_id) % 256, 85)
                                     % 16) + 1
                           ELSE (2 * (xor((i.i * 7 + b.doc_id) % 256, 85)
                                      % 16) + 33)
                                * CAST(POWER(2,
                                    (xor((i.i * 7 + b.doc_id) % 256, 85)
                                     // 16) % 8 - 1) AS BIGINT)
                      END) AS v
            FROM base b, UNNEST(range(0, b.ns)) AS i(i)
        )
        SELECT m.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_values,
               CAST(SUM(m.v) AS BIGINT) AS mu_sum,
               CAST(SUM(m.v * m.v) AS BIGINT) AS mu_sumsq,
               CAST(SUM(m.i * m.v) AS BIGINT) AS mu_possum,
               CAST(SUM(a.v) AS BIGINT) AS a_sum,
               CAST(SUM(a.v * a.v) AS BIGINT) AS a_sumsq,
               CAST(SUM(a.i * a.v) AS BIGINT) AS a_possum
        FROM sm m JOIN sa a ON m.doc_id = a.doc_id AND m.i = a.i
        GROUP BY m.doc_id
        ORDER BY m.doc_id
    """,
    doc="REAL G.711 telephony-audio decode certified cross-engine for "
    "BOTH laws: each doc gets a mu-law WAV (format tag 7) and an "
    "A-law WAV (tag 6) carrying the same closed-form CODE bytes; "
    "Spark walks each RIFF container and expands every code through "
    "the segmented-log integer mappings "
    "(operators/codecs.py:mulaw_decode/alaw_decode), DuckDB rebuilds "
    "both mappings in pure integer SQL (complement vs 0x55-toggle, "
    "sign/exponent/mantissa, segment midpoints — note the opposite "
    "sign-bit conventions). Any bias slip, exponent shift, or "
    "sign-fold error in either expander changes the sums. Complements "
    "the bijectivity proofs (A-law exact over all 256 codes, mu-law's "
    "single ±0 fold) in tests/test_codecs.py.",
)
def multimodal_g711_audio_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from economic_data_etl_spark.operators.codecs import decode_wav

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = (
        "doc_id long, n_values long, "
        "mu_sum long, mu_sumsq long, mu_possum long, "
        "a_sum long, a_sumsq long, a_possum long"
    )

    def synth_g711_reduce(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        import struct as _struct

        def wav_for(tag: int, data: bytes) -> bytes:
            fmt = _struct.pack(
                "<IHHIIHH", 16, tag, 1, 8000, 8000, 1, 8
            )
            return (
                b"RIFF"
                + _struct.pack("<I", 36 + len(data))
                + b"WAVE"
                + b"fmt "
                + fmt
                + b"data"
                + _struct.pack("<I", len(data))
                + data
            )

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = 200 + d % 100
                codes = (
                    (np.arange(n, dtype=np.int64) * 7 + d) % 256
                ).astype(np.uint8)
                data = codes.tobytes()
                stats = []
                for tag in (7, 6):  # mu-law, then A-law
                    _, samples = decode_wav(wav_for(tag, data))
                    flat = samples[:, 0].astype(np.int64)
                    stats += [
                        int(flat.sum()),
                        int((flat * flat).sum()),
                        int((np.arange(flat.size) * flat).sum()),
                    ]
                rows.append((d, n, *stats))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_values",
                    "mu_sum", "mu_sumsq", "mu_possum",
                    "a_sum", "a_sumsq", "a_possum",
                ],
            )

    return docs.mapInPandas(synth_g711_reduce, schema).orderBy("doc_id")
