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


# ---------------------------------------------------------------------------
# Main-content extraction (jusText-style boilerplate removal)
# ---------------------------------------------------------------------------
from economic_data_etl_spark.operators.html import (  # noqa: E402
    CONST_PARA,
    PROSE_PREFIX,
    classify_block,
    html_blocks,
    html_main_content,
    write_article_page,
)

GOOD_PROSE = (
    "This is a long enough piece of prose that it will be kept by the "
    "classifier because it is the main content of the page."
)


def _verdicts(html):
    return [(classify_block(b), b["text"]) for b in html_blocks(html)]


def test_container_prior_beats_prose_length():
    html = f"<footer>{GOOD_PROSE}</footer><p>{GOOD_PROSE}</p>"
    vs = _verdicts(html)
    assert vs[0][0] == "bad_container"
    assert vs[1][0] == "good"


def test_nested_containers_stay_boilerplate():
    html = (
        f"<nav><div><p>{GOOD_PROSE}</p></div></nav><p>{GOOD_PROSE}</p>"
    )
    vs = _verdicts(html)
    assert [v for v, _ in vs] == ["bad_container", "good"]


def test_unbalanced_container_close_clamps():
    html = f"</footer></nav><p>{GOOD_PROSE}</p>"
    assert _verdicts(html) == [("good", GOOD_PROSE)]


def test_link_density_rule():
    farm = (
        "<div><a href='/1'>first long promoted link text here</a> "
        "<a href='/2'>second long promoted link text here</a></div>"
    )
    assert _verdicts(farm)[0][0] == "bad_links"
    # one short link inside long prose: density well under 1/3 -> good
    mixed = f"<p>{GOOD_PROSE} <a href='/x'>ref</a></p>"
    assert _verdicts(mixed)[0][0] == "good"


def test_short_and_lowstop_rules():
    assert _verdicts("<div>Share</div>")[0][0] == "bad_short"
    assert (
        _verdicts(
            "<p>DECOYMIDLEN Product Catalog Item Number Blue Widget "
            "Edition</p>"
        )[0][0]
        == "bad_lowstop"
    )
    # same mid length WITH stopwords -> good (prose evidence)
    assert (
        _verdicts("<p>It is the story of a dog and a cat in the sun "
                  "by the sea.</p>")[0][0]
        == "good"
    )


def test_article_page_keeps_exactly_the_article():
    text = "Body words that the page carries for the reader to see."
    main = html_main_content(write_article_page("T", text))
    assert main == PROSE_PREFIX + " " + text + "\n" + CONST_PARA
    for decoy in (
        "DECOYHEADER",
        "DECOYNAV",
        "DECOYMIDLEN",
        "DECOYLINKFARM",
        "DECOYFOOTER",
        "DECOYSTYLE",
        "DECOYSCRIPT",
        "DECOYCOMMENT",
        "Share",
    ):
        assert decoy not in main


def test_article_page_empty_text():
    assert (
        html_main_content(write_article_page("T", ""))
        == PROSE_PREFIX + "\n" + CONST_PARA
    )


# ---------------------------------------------------------------------------
# Link extraction + reference resolution (the link-graph layer).
# ---------------------------------------------------------------------------

from economic_data_etl_spark.operators.html import (  # noqa: E402
    html_links,
    linked_page_base_url,
    resolve_url,
    write_linked_page,
)


def test_links_attribute_forms():
    html = (
        '<a href="/dq">double</a>'
        "<a href='/sq'>single</a>"
        "<a href=/bare>bare</a>"
        "<a class='x' href=\"/later\" rel=nofollow>attrs around</a>"
        "<a name='anchor-only'>no href</a>"
        "<A HREF=\"/upper\">case</A>"
    )
    assert html_links(html) == [
        ("/dq", "double"),
        ("/sq", "single"),
        ("/bare", "bare"),
        ("/later", "attrs around"),
        ("/upper", "case"),
    ]


def test_links_entities_and_whitespace():
    html = '<a href="/a?x=1&amp;y=2">Q&amp;A\n  page</a>'
    assert html_links(html) == [("/a?x=1&y=2", "Q&A page")]


def test_links_not_in_comment_script_style():
    html = (
        "<!-- <a href='/c'>c</a> -->"
        "<script>var a = '<a href=\"/s\">s</a>';</script>"
        "<style>a[href='/st'] {}</style>"
        '<a href="/real">real</a>'
    )
    assert html_links(html) == [("/real", "real")]


def test_links_implicit_close():
    # a new <a> implicitly closes the previous one (HTML parser spec)
    html = '<a href="/1">one <a href="/2">two</a>'
    assert html_links(html) == [("/1", "one"), ("/2", "two")]


def test_links_nested_markup_in_anchor():
    html = '<a href="/x"><b>bold</b> and <i>italic</i></a>'
    assert html_links(html) == [("/x", "bold and italic")]


def test_resolve_absolute_and_protocol_relative():
    base = "https://h.example.com/doc/5"
    assert resolve_url(base, "https://o.example.com/p") == (
        "https://o.example.com/p"
    )
    assert resolve_url(base, "HTTP://UP.example.com/p") == (
        "http://UP.example.com/p"
    )
    assert resolve_url(base, "//cdn.example.com/p") == (
        "https://cdn.example.com/p"
    )


def test_resolve_relative_forms():
    base = "https://h.example.com/doc/5?q=1#frag"
    assert resolve_url(base, "/root") == "https://h.example.com/root"
    assert resolve_url(base, "peer") == "https://h.example.com/doc/peer"
    assert resolve_url(base, "../other/7") == (
        "https://h.example.com/other/7"
    )
    assert resolve_url(base, "../../../deep") == (
        "https://h.example.com/deep"
    )
    assert resolve_url(base, "./same") == "https://h.example.com/doc/same"
    assert resolve_url(base, "?ref=2") == (
        "https://h.example.com/doc/5?ref=2"
    )


def test_resolve_non_edges():
    base = "https://h.example.com/doc/5"
    assert resolve_url(base, "#top") is None
    assert resolve_url(base, "") is None
    assert resolve_url(base, "mailto:x@example.com") is None
    assert resolve_url(base, "javascript:void(0)") is None


def test_resolve_fragment_stripped():
    base = "https://h.example.com/doc/5"
    assert resolve_url(base, "/p#sec2") == "https://h.example.com/p"


def test_linked_page_plants_seven_edges_and_four_non_edges():
    for did in (0, 13, 63):
        base = linked_page_base_url(did)
        page = write_linked_page(did, 64)
        pairs = html_links(page)
        resolved = [resolve_url(base, h) for h, _ in pairs]
        edges = [r for r in resolved if r is not None]
        assert len(edges) == 7
        # the four planted non-edges never become edges: fragment-only
        # resolves to None; missing-href / commented / script links
        # never extract
        assert resolved.count(None) == 1
        assert not any("decoy" in (r or "") for r in resolved)
        # every edge is on an http(s) site*.example.com URL
        assert all(re.match(r"https://site\d\.example\.com/", r)
                   for r in edges)
