"""HTML visible-text extraction: entity grammar, raw-text element
dropping, comments, attribute quoting, block-boundary newlines,
whitespace normalization, and the page-writer round trip."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from economic_data_etl_spark.operators.html import (
    decode_entities,
    html_to_text,
    write_page,
)


def test_entities():
    assert decode_entities("a &amp; b &lt;c&gt; &quot;d&quot;") == (
        'a & b <c> "d"'
    )
    assert decode_entities("&#65;&#x41;&#x2014;") == "AA—"
    # unterminated / unknown: literal ampersand passes through
    assert decode_entities("AT&T & &bogus; &#xZZ;") == "AT&T & &bogus; &#xZZ;"


def test_script_style_comment_dropped():
    html = (
        "<p>keep1</p>"
        "<script>var s = '<p>no</p>'; if (a > b) {}</script>"
        "<style>p > a { color: red }</style>"
        "<!-- <p>commented out</p> -->"
        "<p>keep2</p>"
    )
    assert html_to_text(html) == "keep1\nkeep2"


def test_script_case_insensitive_close():
    assert html_to_text("<SCRIPT>x<y</ScRiPt ><p>ok</p>") == "ok"


def test_attribute_quoting_hides_gt():
    assert html_to_text("<div data-x='a > b'>text</div>") == "text"
    assert html_to_text('<img alt="5 > 4">after') == "after"


def test_block_newlines_and_ws_collapse():
    html = "<h1>Title</h1><p>a   b\t c</p><ul><li>x</li><li>y</li></ul>"
    assert html_to_text(html) == "Title\na b c\nx\ny"
    # inline tags do not break lines
    assert html_to_text("a <b>bold</b> c") == "a bold c"


def test_unterminated_tag_swallows_tail():
    assert html_to_text("ok <div unterminated") == "ok"


def test_writer_roundtrip_with_decoys():
    page = write_page("T & Co", ["x < y", "a&b"])
    got = html_to_text(page)
    assert got == "T & Co\nx < y\na&b"
    for decoy in ("DECOYSTYLE", "DECOYSCRIPT", "DECOYCOMMENT"):
        assert decoy in page and decoy not in got


@settings(max_examples=40, deadline=None)
@given(
    paras=st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
            max_size=60,
        ),
        min_size=1,
        max_size=3,
    )
)
def test_property_writer_roundtrip(paras):
    got = html_to_text(write_page("t", paras))
    ws = re.compile(r"[ \t\r\n\f\v ]+")
    want_lines = ["t"] + [ws.sub(" ", p).strip() for p in paras]
    assert got == "\n".join(ln for ln in want_lines if ln)
