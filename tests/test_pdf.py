"""Minimal PDF writer/extractor: byte-exact text round trip under
adversarial content (parens, backslashes, octal-looking runs,
unicode), page order, both stream encodings, the TJ kerning path,
and clean failure on corruption."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from economic_data_etl_spark.operators.pdf import (
    extract_pdf_text,
    write_minimal_pdf,
)

NASTY = [
    "plain text",
    "(already parenthesized)",
    "unbalanced ( paren",
    "unbalanced ) paren",
    "back\\slash and \\\\ double",
    "octal-looking \\101\\60 runs",
    "newline\nand\rcarriage\ttab",
    "",
    "你好 — ümläut ß … 𐍈",  # incl. an astral-plane code point
    ")" * 40,
    "\\" * 17,
    "stream endstream endobj trailer",  # keyword injection
]


@pytest.mark.parametrize("compress", [True, False])
@pytest.mark.parametrize("kern", [0, 3])
def test_nasty_pages_roundtrip(compress, kern):
    got = extract_pdf_text(
        write_minimal_pdf(NASTY, compress=compress, kern_every=kern)
    )
    assert got == NASTY


@settings(max_examples=40, deadline=None)
@given(
    pages=st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",)  # no lone surrogates
            ),
            max_size=80,
        ),
        min_size=1,
        max_size=4,
    ),
    compress=st.booleans(),
    kern=st.sampled_from([0, 1, 7]),
)
def test_property_roundtrip(pages, compress, kern):
    got = extract_pdf_text(
        write_minimal_pdf(pages, compress=compress, kern_every=kern)
    )
    assert got == pages


def test_page_order_preserved():
    pages = [f"page {i}" for i in range(9)]
    assert extract_pdf_text(write_minimal_pdf(pages)) == pages


def test_corruption_raises_cleanly():
    pdf = write_minimal_pdf(["some text that compresses"], compress=True)
    with pytest.raises(ValueError):
        extract_pdf_text(b"not a pdf at all")
    with pytest.raises(ValueError):
        extract_pdf_text(pdf[:-250])  # drop trailing objects
    # flip a byte inside the Flate payload: inflate must fail loudly
    at = pdf.index(b"stream\n") + 10
    broken = pdf[:at] + bytes([pdf[at] ^ 0xFF]) + pdf[at + 1 :]
    with pytest.raises(ValueError):
        extract_pdf_text(broken)


def test_structure_is_valid_pdf_shape():
    pdf = write_minimal_pdf(["a", "b"])
    assert pdf.startswith(b"%PDF-1.4")
    assert pdf.rstrip().endswith(b"%%EOF")
    assert pdf.count(b" 0 obj") == 7  # catalog+pages+font+2x(page+content)
    assert b"xref" in pdf and b"trailer" in pdf
    # xref offset actually points at the xref table
    start = int(pdf.rsplit(b"startxref", 1)[1].split()[0])
    assert pdf[start : start + 4] == b"xref"
