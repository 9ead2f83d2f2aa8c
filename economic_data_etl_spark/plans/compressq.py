"""Compressibility (deflate-ratio) quality queries.

`text_compression_ratio` is rows-only by design — DuckDB has no zlib —
so, following the repo's invariant-certificate convention for every
rows-only family, `inv_compression_bounds` certifies the operator with
SQL-recomputable values plus constant-expected verdicts (see
operators/compress.py:compression_certificate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from economic_data_etl_spark.operators import compress
from economic_data_etl_spark.plans.catalog import biased_round, register
from economic_data_etl_spark.sources.tables import load_table

# Certificate sample: enough docs to cover the source mix, small enough
# that the O(bytes) Python-side zlib work stays a certification cost.
_CERT_DOCS = 64


@register(
    "text_compression_ratio",
    oracle=None,
    doc="Per-source deflate-ratio profile (CCNet/Gopher-style "
    "compressibility quality lane): avg and min compression ratio + "
    "total raw bytes per source. Arrow-batched zlib via mapInPandas "
    "(operators/compress.py), no shuffle before the per-source agg. "
    "Rows-only: DuckDB has no zlib; the operator is certified by "
    "inv_compression_bounds.",
)
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    stats = compress.compression_stats(docs, "doc_id", "text")
    per_source = docs.select("doc_id", "source").join(stats, "doc_id")
    return (
        per_source.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("raw_len").alias("raw_bytes"),
            biased_round(F.avg("ratio")).alias("avg_ratio"),
            biased_round(F.min("ratio")).alias("min_ratio"),
        )
        .orderBy("source")
    )


@register(
    "inv_compression_bounds",
    oracle=f"""
        SELECT doc_id,
               CAST(16 * strlen(text) AS BIGINT) AS raw_len_rep,
               TRUE AS rep_compresses,
               TRUE AS noise_incompressible,
               TRUE AS rep_beats_noise,
               TRUE AS roundtrip_ok
        FROM documents
        WHERE doc_id < {_CERT_DOCS}
        ORDER BY doc_id
    """,
    doc="Compression-operator certificate: per sampled doc, text "
    "repeated 16x must deflate below 0.35 (measured <= 0.08 — the "
    "32 KiB LZ77 window sees every repeat), an equal-length md5 chain "
    "must NOT compress (> 0.9, measured >= 1.0), repetition beats "
    "noise, and decompress(compress(x)) == x. raw_len_rep is "
    "recomputed by DuckDB as 16 * octet_length(text); the verdicts' "
    "expected value is constant TRUE, so any breach flips the driver's "
    "value hash.",
)
def inv_compression_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _CERT_DOCS
    )
    return compress.compression_certificate(docs, "doc_id", "text").orderBy(
        "doc_id"
    )


@register(
    "multimodal_payload_compressibility",
    oracle=f"""
        SELECT doc_id,
               CAST(64 * (2 + doc_id % 6) * (2 + (doc_id // 6) % 5)
                    AS BIGINT) AS n_pixels,
               TRUE AS bmp_compresses,
               TRUE AS png_incompressible,
               TRUE AS jpeg_incompressible,
               TRUE AS png_beats_bmp,
               TRUE AS lossless_roundtrip_ok
        FROM documents
        WHERE doc_id < {_CERT_DOCS}
        ORDER BY doc_id
    """,
    doc="Cross-modal compressibility certificate, tying the deflate "
    "quality lane to the REAL codecs: the same block-pattern image is "
    "encoded by the repo's own BMP, PNG, and baseline-JPEG encoders; "
    "raw BMP must deflate deeply (measured <= 0.066, certified < 0.3), "
    "PNG and JPEG payloads must NOT re-compress (both measured >= "
    "0.96, certified > 0.85 — their entropy coding already spent the "
    "redundancy; the exact signal a media-aware storage tier uses to "
    "skip recompression), PNG must beat raw BMP on size, and both "
    "lossless formats must round-trip to the original pixels. "
    "n_pixels is recomputed closed-form by DuckDB from doc_id.",
)
def multimodal_payload_compressibility(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import zlib
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < _CERT_DOCS
    )
    schema = (
        "doc_id long, n_pixels long, bmp_compresses boolean, "
        "png_incompressible boolean, jpeg_incompressible boolean, "
        "png_beats_bmp boolean, lossless_roundtrip_ok boolean"
    )

    def synth_and_score(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        from economic_data_etl_spark.operators.codecs import (
            decode_bmp,
            decode_png,
            encode_bmp,
            encode_png,
        )
        from economic_data_etl_spark.operators.jpeg import encode_jpeg_gray

        def ratio(b: bytes) -> float:
            return len(zlib.compress(bytes(b), 6)) / len(b)

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                w = 8 * (2 + d % 6)
                h = 8 * (2 + (d // 6) % 5)
                x = np.arange(w)[None, :]
                y = np.arange(h)[:, None]
                img = (
                    (((x // 8) + (y // 8) * 3 + d) % 7) * 36
                ).astype(np.uint8)
                rgb = np.stack([img, img, img], axis=-1)
                bmp = encode_bmp(rgb)
                png = encode_png(img)
                jpg = encode_jpeg_gray(img)
                roundtrip = bool(
                    np.array_equal(decode_png(png), img)
                    and np.array_equal(decode_bmp(bmp), rgb)
                )
                rows.append(
                    {
                        "doc_id": d,
                        "n_pixels": w * h,
                        "bmp_compresses": ratio(bmp) < 0.3,
                        "png_incompressible": ratio(png) > 0.85,
                        "jpeg_incompressible": ratio(jpg) > 0.85,
                        "png_beats_bmp": len(png) < len(bmp),
                        "lossless_roundtrip_ok": roundtrip,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return docs.mapInPandas(synth_and_score, schema).orderBy("doc_id")


@register(
    "multimodal_pdf_text_extract",
    oracle=f"""
        SELECT doc_id,
               CAST(2 AS BIGINT) AS n_pages,
               CAST(length(text) AS BIGINT) AS n_chars,
               md5(text) AS extracted_md5
        FROM documents
        WHERE doc_id < {_CERT_DOCS}
        ORDER BY doc_id
    """,
    doc="PDF text extraction round trip (operators/pdf.py — the "
    "training-data ingestion workload): each sampled document is "
    "written as a structurally-valid 2-page PDF 1.4 (FlateDecode "
    "content streams, TJ kerning arrays, string-literal escapes) and "
    "the text is recovered by parsing the object graph — pages-tree "
    "order, /Contents refs, /Length-sliced streams, Tj/TJ operators. "
    "extracted_md5 is the md5 of the CONCATENATED extracted pages; "
    "the oracle recomputes md5(text) directly, so any extraction "
    "defect (escape handling, page order, stream slicing, inflate) "
    "flips the value hash. Arrow mapInPandas lanes like every other "
    "codec; structure errors raise so corrupt files can be "
    "quarantined.",
)
def multimodal_pdf_text_extract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _CERT_DOCS
    ).select("doc_id", "text")

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from economic_data_etl_spark.operators.pdf import (
            extract_pdf_text,
            write_minimal_pdf,
        )

        for pdf_batch in batches:
            rows = []
            for did, text in zip(pdf_batch["doc_id"], pdf_batch["text"]):
                t = text or ""
                half = len(t) // 2
                blob = write_minimal_pdf(
                    [t[:half], t[half:]], compress=True, kern_every=16
                )
                pages = extract_pdf_text(blob)
                rows.append(
                    {
                        "doc_id": did,
                        "n_pages": len(pages),
                        "extracted": "".join(pages),
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    out = docs.mapInPandas(
        roundtrip, "doc_id long, n_pages long, extracted string"
    )
    return out.select(
        "doc_id",
        "n_pages",
        F.length("extracted").cast("long").alias("n_chars"),
        F.md5(F.col("extracted")).alias("extracted_md5"),
    ).orderBy("doc_id")


@register(
    "multimodal_html_text_extract",
    oracle=f"""
        SELECT doc_id,
               md5(CASE WHEN trim(text) = ''
                        THEN 'Doc ' || CAST(doc_id AS VARCHAR)
                             || chr(10) || 'a < b & c > d'
                        ELSE 'Doc ' || CAST(doc_id AS VARCHAR)
                             || chr(10)
                             || trim(regexp_replace(text,
                                     '[ \\t\\r]+', ' ', 'g'))
                             || chr(10) || 'a < b & c > d'
                   END) AS extracted_md5,
               TRUE AS decoys_absent
        FROM documents
        WHERE doc_id < {_CERT_DOCS}
        ORDER BY doc_id
    """,
    doc="HTML visible-text extraction round trip (operators/html.py — "
    "the crawl-to-text ingestion layer next to the PDF extractor): "
    "each sampled document is wrapped in a deterministic page whose "
    "boilerplate plants decoys in <style>, <script>, and a comment "
    "(all of which legally contain markup-looking text), plus a "
    "constant entity-encoded paragraph (a &lt; b &amp; c &gt; d). "
    "Extraction must recover title + text + the decoded entity "
    "paragraph (md5-checked against the oracle's reconstruction, "
    "whitespace-normalized) and must NOT leak any decoy "
    "(constant-TRUE verdict). Arrow mapInPandas lanes.",
)
def multimodal_html_text_extract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _CERT_DOCS
    ).select("doc_id", "text")

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from economic_data_etl_spark.operators.html import (
            html_to_text,
            write_page,
        )

        for pdf_b in batches:
            rows = []
            for did, text in zip(pdf_b["doc_id"], pdf_b["text"]):
                page = write_page(
                    f"Doc {did}", [text or "", "a < b & c > d"]
                )
                extracted = html_to_text(page)
                rows.append(
                    {
                        "doc_id": did,
                        "extracted": extracted,
                        "decoys_absent": not any(
                            d in extracted
                            for d in (
                                "DECOYSTYLE",
                                "DECOYSCRIPT",
                                "DECOYCOMMENT",
                            )
                        ),
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    out = docs.mapInPandas(
        roundtrip, "doc_id long, extracted string, decoys_absent boolean"
    )
    return out.select(
        "doc_id",
        F.md5(F.col("extracted")).alias("extracted_md5"),
        "decoys_absent",
    ).orderBy("doc_id")


def _sqlq(s: str) -> str:
    return s.replace("'", "''")


def _main_content_oracle() -> str:
    from economic_data_etl_spark.operators.html import (
        CONST_PARA,
        PROSE_PREFIX,
    )

    return f"""
        SELECT doc_id,
               md5(CASE WHEN trim(text) IS NULL OR trim(text) = ''
                        THEN '{_sqlq(PROSE_PREFIX)}'
                        ELSE '{_sqlq(PROSE_PREFIX)}' || ' ' ||
                             trim(regexp_replace(text,
                                  '[ \\t\\r\\n]+', ' ', 'g'))
                   END || chr(10) || '{_sqlq(CONST_PARA)}')
                   AS main_md5,
               TRUE AS decoys_absent
        FROM documents
        WHERE doc_id < {_CERT_DOCS}
        ORDER BY doc_id
    """


@register(
    "multimodal_html_main_content",
    oracle=_main_content_oracle(),
    doc="Boilerplate removal (main-content extraction), the jusText-"
    "style layer between raw HTML extraction and quality scoring "
    "(operators/html.py: html_blocks/classify_block/"
    "html_main_content): pages are tokenized into text blocks at "
    "block-tag boundaries and each block is classified context-free — "
    "nav/footer/header/aside container prior, link density > 1/3, "
    "length < 25 chars, 25..79 chars with stopword density < 0.2. "
    "Each sampled document is wrapped in a deterministic article page "
    "planting ONE decoy per bad rule (a prose-length footer that only "
    "the tag prior can reject, a link farm outside any container, a "
    "Share fragment, a low-stopword product string, plus the "
    "script/style/comment decoys); the article body is a constant "
    "80+-char stopword-rich prefix + the document text, so survival "
    "never depends on the wrapped text's own statistics and the "
    "oracle reconstructs the surviving main text exactly "
    "(md5-checked). decoys_absent must be constant TRUE. Arrow "
    "mapInPandas lanes, O(page) per row, no shuffle beyond the "
    "output sort.",
)
def multimodal_html_main_content(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _CERT_DOCS)
        .select("doc_id", "text")
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from economic_data_etl_spark.operators.html import (
            html_main_content,
            write_article_page,
        )

        decoys = (
            "DECOYSTYLE",
            "DECOYSCRIPT",
            "DECOYCOMMENT",
            "DECOYHEADER",
            "DECOYNAV",
            "DECOYMIDLEN",
            "DECOYLINKFARM",
            "DECOYFOOTER",
            "Share",
        )
        for pdf_b in batches:
            rows = []
            for did, text in zip(pdf_b["doc_id"], pdf_b["text"]):
                page = write_article_page(f"Doc {did}", text or "")
                main = html_main_content(page)
                rows.append(
                    {
                        "doc_id": did,
                        "main": main,
                        "decoys_absent": not any(
                            d in main for d in decoys
                        ),
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    out = docs.mapInPandas(
        extract, "doc_id long, main string, decoys_absent boolean"
    )
    return out.select(
        "doc_id",
        F.md5(F.col("main")).alias("main_md5"),
        "decoys_absent",
    ).orderBy("doc_id")


_WARC_DOCS_PER_FILE = 8


@register(
    "training_crawl_ingest",
    oracle=f"""
        SELECT doc_id,
               CAST(COUNT(*) OVER (PARTITION BY doc_id // {_WARC_DOCS_PER_FILE})
                    AS BIGINT) AS n_records_in_file,
               md5(CASE WHEN trim(text) = ''
                        THEN 'Doc ' || CAST(doc_id AS VARCHAR)
                             || chr(10) || 'a < b & c > d'
                        ELSE 'Doc ' || CAST(doc_id AS VARCHAR)
                             || chr(10)
                             || trim(regexp_replace(text,
                                     '[ \\t\\r]+', ' ', 'g'))
                             || chr(10) || 'a < b & c > d'
                   END) AS extracted_md5,
               TRUE AS uri_ok
        FROM documents
        WHERE doc_id < {_CERT_DOCS}
        ORDER BY doc_id
    """,
    doc="End-to-end crawl ingestion composition (the CommonCrawl "
    f"shape): documents are packed {_WARC_DOCS_PER_FILE}-per-file into "
    "WARC streams (operators/warc.py — Content-Length-sliced records, "
    "never delimiter-scanned), each archive is parsed back into "
    "records inside the same Arrow lane, every record's HTML payload "
    "goes through the visible-text extractor (operators/html.py, "
    "decoys planted), and the recovered text is md5-checked against "
    "the oracle's reconstruction per document. uri_ok pins that each "
    "record's WARC-Target-URI round-trips to its document id. "
    "Grouped applyInPandas — one archive per group, never the corpus "
    "on one executor.",
)
def training_crawl_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _CERT_DOCS
    ).select(
        "doc_id",
        "text",
        (F.col("doc_id") / _WARC_DOCS_PER_FILE)
        .cast("int")
        .alias("file_id"),
    )

    def ingest(pdf_b: pd.DataFrame) -> pd.DataFrame:
        from economic_data_etl_spark.operators.html import (
            html_to_text,
            write_page,
        )
        from economic_data_etl_spark.operators.warc import (
            read_warc,
            write_warc,
        )

        g = pdf_b.sort_values("doc_id")
        archive = write_warc(
            [
                (
                    f"http://corpus/doc/{did}",
                    write_page(
                        f"Doc {did}", [text or "", "a < b & c > d"]
                    ).encode("utf-8"),
                )
                for did, text in zip(g["doc_id"], g["text"])
            ]
        )
        rows = []
        records = read_warc(archive)
        for rec in records:
            uri = rec["headers"]["WARC-Target-URI"]
            did = int(uri.rsplit("/", 1)[1])
            extracted = html_to_text(rec["payload"].decode("utf-8"))
            rows.append(
                {
                    "doc_id": did,
                    "n_records_in_file": len(records),
                    "extracted": extracted,
                    "uri_ok": uri == f"http://corpus/doc/{did}",
                }
            )
        return pd.DataFrame(rows)

    out = docs.groupBy("file_id").applyInPandas(
        ingest,
        "doc_id long, n_records_in_file long, extracted string, "
        "uri_ok boolean",
    )
    return out.select(
        "doc_id",
        "n_records_in_file",
        F.md5(F.col("extracted")).alias("extracted_md5"),
        "uri_ok",
    ).orderBy("doc_id")
