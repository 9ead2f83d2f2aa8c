"""Unicode normalization lanes (operators/textnorm.py)."""

from __future__ import annotations

import unicodedata

from economic_data_etl_spark.operators import textnorm


def _lanes(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: (r["nfc"], r["folded"], r["changed"])
        for r in textnorm.normalize_text_lanes(
            df, "doc_id", "text"
        ).collect()
    }


def test_nfc_composes_decomposed(spark):
    got = _lanes(spark, [(1, "Café"), (2, "Café")])
    assert got[1] == ("Caf\u00e9", "cafe", True)
    assert got[2] == ("Caf\u00e9", "cafe", False)


def test_fold_strips_accents_and_case(spark):
    got = _lanes(
        spark,
        [(1, "São PAULO"), (2, "ÑOÑO"), (3, "plain")],
    )
    assert got[1][1] == "sao paulo"
    assert got[2][1] == "nono"
    assert got[3] == ("plain", "plain", False)


def test_null_passthrough(spark):
    got = _lanes(spark, [(1, None)])
    assert got[1] == (None, None, None)


def test_matches_python_unicodedata(spark):
    """Lane output is exactly what driver-side unicodedata computes."""
    samples = [
        (i, s)
        for i, s in enumerate(
            [
                "Å ring",  # A + combining ring -> Å
                "Ё",  # Cyrillic E + diaeresis -> Ё
                "ﬁn de siècle",
                "",
            ]
        )
    ]
    got = _lanes(spark, samples)
    for i, s in samples:
        n = unicodedata.normalize("NFC", s)
        fold = "".join(
            c
            for c in unicodedata.normalize("NFD", n)
            if not unicodedata.combining(c)
        ).lower()
        assert got[i] == (n, fold, n != s)


def test_fingerprint_collapses_variants(spark):
    df = spark.createDataFrame(
        [
            (1, "Café menu"),
            (2, "Café MENU"),
            (3, "cafe menu"),
            (4, "different"),
        ],
        "doc_id long, text string",
    )
    fps = {
        r["doc_id"]: r["fp"]
        for r in textnorm.normalized_fingerprint(
            df, "doc_id", "text"
        ).collect()
    }
    assert fps[1] == fps[2] == fps[3] != fps[4]
