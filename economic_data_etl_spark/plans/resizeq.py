"""Real image-resize catalog query (operators/resize.py).

Decode -> resize is the canonical multimodal preprocessing step this
query certifies end-to-end: the closed-form gradient image round-trips
through the from-scratch PNG codec, is box-mean downsampled to 16x16
in EXACT integer arithmetic (output pixel = sum(box) // area(box),
floor edges (i*dim)//16), and the resized pixels' statistics are
compared against a DuckDB oracle that recomputes every box sum from
the pixel formula and the same edge rule. No floats anywhere, so the
hash certifies the decode, the edge partition, the integer means, and
the output ordering (position-weighted checksum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from economic_data_etl_spark.plans.catalog import register
from economic_data_etl_spark.sources.tables import load_table

_OUT = 16


@register(
    "multimodal_image_resize",
    oracle="""
        WITH base AS (
            SELECT doc_id,
                   16 + doc_id % 64 AS w,
                   16 + (doc_id // 64) % 64 AS h
            FROM documents
        ),
        px AS (
            SELECT b.doc_id, b.w, b.h, x.x, y.y,
                   (x.x + 2 * y.y + b.doc_id) % 256 AS v
            FROM base b,
                 UNNEST(range(0, b.w)) AS x(x),
                 UNNEST(range(0, b.h)) AS y(y)
        ),
        cells AS (
            -- box index of pixel y under floor edges (i*h)//16:
            -- (i*h)//16 <= y  <=>  i*h < 16*y + 16  <=>
            -- i <= (16*y + 15)//h, so i = (16*y + 15)//h is the exact
            -- inverse whenever h >= 16 (guaranteed: dims are 16+...);
            -- verified exhaustively for every dim 16..80. Same for x.
            SELECT doc_id,
                   (16 * y + 15) // h AS i,
                   (16 * x + 15) // w AS j,
                   SUM(v) AS s,
                   COUNT(*) AS a
            FROM px
            GROUP BY doc_id, (16 * y + 15) // h, (16 * x + 15) // w
        ),
        resized AS (
            SELECT doc_id, i, j, s // a AS pv
            FROM cells
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_values,
               CAST(SUM(pv) AS BIGINT) AS val_sum,
               CAST(SUM(pv * pv) AS BIGINT) AS val_sumsq,
               CAST(SUM((i * 16 + j) * pv) AS BIGINT) AS val_possum
        FROM resized
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    doc="REAL image resize certified cross-engine "
    "(operators/resize.py — upgrading the early byte-averaging "
    "resize stub to pixel-space): the gradient image round-trips "
    "through the from-scratch PNG codec, then box-mean downsamples "
    "to 16x16 with EXACT integer arithmetic (pixel = box sum // box "
    "area under floor edges (i*dim)//16). DuckDB recomputes every "
    "box sum from the pixel formula and the inverse edge rule "
    "(i = (16*y + 15) // h, the exact inverse of the floor "
    "partition for dims >= 16), so the hash certifies decode, "
    "partition geometry, integer means, and output ordering.",
)
def multimodal_image_resize(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = (
        "doc_id long, n_values long, val_sum long, "
        "val_sumsq long, val_possum long"
    )

    def batch(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        from economic_data_etl_spark.operators.codecs import (
            decode_png,
            encode_png,
            gray_pattern,
        )
        from economic_data_etl_spark.operators.resize import (
            box_resize_exact,
        )

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                img = decode_png(encode_png(gray_pattern(d)))
                small = box_resize_exact(img, _OUT, _OUT).astype(
                    np.int64
                )
                flat = small.ravel()
                rows.append(
                    (
                        d,
                        int(flat.size),
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

    return docs.mapInPandas(batch, schema).orderBy("doc_id")
