"""Minimal from-scratch HTML text extractor (and a deterministic
page writer for certification).

The other canonical training-data ingestion workload next to PDF
(operators/pdf.py): web crawl -> visible text. The extractor is a
single-pass tokenizer over the markup:

- tag soup: anything between < and the matching > is markup; inside a
  tag, quoted attribute values may contain '>' and are skipped
  correctly;
- CDATA-ish elements: <script> and <style> content is dropped wholesale
  (their bodies are program text, not document text), terminated only
  by their case-insensitive closing tag, per the HTML parsing spec;
- comments <!-- ... --> are dropped, including any tags inside them;
- character references: named (&amp; &lt; &gt; &quot; &apos; &nbsp;),
  decimal (&#65;) and hex (&#x41;) forms decode; an unterminated or
  unknown reference passes through literally (browser behavior);
- whitespace: runs collapse to one space and block-level boundaries
  (p, div, br, li, tr, h1..h6, section, article) insert a newline —
  the usual visible-text normalization.

Honest scope seam: no DOM, no CSS visibility, no JavaScript — this is
the boilerplate-light extraction layer a crawl pipeline runs BEFORE
quality scoring, not a browser. Spark-side it rides Arrow mapInPandas
lanes like the PDF/codec extractors.
"""

from __future__ import annotations

import re

_NAMED = {
    "amp": "&",
    "lt": "<",
    "gt": ">",
    "quot": '"',
    "apos": "'",
    "nbsp": " ",
}

_BLOCK_TAGS = {
    "p", "div", "br", "li", "tr", "h1", "h2", "h3", "h4", "h5", "h6",
    "section", "article", "ul", "ol", "table", "blockquote",
}

_RAW_TEXT_TAGS = ("script", "style")

_WS_RE = re.compile(r"[ \t\r\n\f\v ]+")


def decode_entities(s: str) -> str:
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c != "&":
            out.append(c)
            i += 1
            continue
        semi = s.find(";", i + 1, i + 12)  # refs are short; cap the scan
        if semi == -1:
            out.append(c)
            i += 1
            continue
        body = s[i + 1 : semi]
        if body.startswith("#x") or body.startswith("#X"):
            try:
                out.append(chr(int(body[2:], 16)))
                i = semi + 1
                continue
            except (ValueError, OverflowError):
                pass
        elif body.startswith("#"):
            try:
                out.append(chr(int(body[1:], 10)))
                i = semi + 1
                continue
            except (ValueError, OverflowError):
                pass
        elif body in _NAMED:
            out.append(_NAMED[body])
            i = semi + 1
            continue
        out.append(c)  # unknown/invalid reference: literal ampersand
        i += 1
    return "".join(out)


def _skip_tag(s: str, i: int) -> tuple[int, str]:
    """i points at '<'. Return (index after '>', lowercased tag name).
    Quoted attribute values may contain '>'."""
    j = i + 1
    n = len(s)
    m = re.match(r"/?([a-zA-Z][a-zA-Z0-9-]*)", s[j : j + 32])
    name = m.group(1).lower() if m else ""
    quote = ""
    while j < n:
        c = s[j]
        if quote:
            if c == quote:
                quote = ""
        elif c in ("'", '"'):
            quote = c
        elif c == ">":
            return j + 1, name
        j += 1
    return n, name  # unterminated tag: swallow the tail (browser-like)


def html_to_text(html: str) -> str:
    """Visible text of an HTML fragment/document, whitespace-normalized
    (single spaces, newlines at block boundaries, stripped ends)."""
    parts: list[str] = []
    i, n = 0, len(html)
    while i < n:
        c = html[i]
        if c != "<":
            nxt = html.find("<", i)
            if nxt == -1:
                nxt = n
            parts.append(decode_entities(html[i:nxt]))
            i = nxt
            continue
        if html.startswith("<!--", i):
            end = html.find("-->", i + 4)
            i = n if end == -1 else end + 3
            continue
        j, name = _skip_tag(html, i)
        if name in _RAW_TEXT_TAGS and not html.startswith("</", i):
            close = re.compile(
                rf"</{name}\s*>", re.IGNORECASE
            ).search(html, j)
            j = n if close is None else close.end()
        if name in _BLOCK_TAGS:
            parts.append("\n")
        i = j
    text = "".join(parts)
    # collapse horizontal whitespace, keep block newlines, strip ends
    lines = [_WS_RE.sub(" ", ln).strip() for ln in text.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def encode_entities(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def write_page(title: str, paragraphs: list[str]) -> str:
    """Deterministic HTML page around the given text: entity-encoded
    paragraphs wrapped in boilerplate (head/script/style/nav/comments)
    whose decoy content must NOT survive extraction — the planted
    negative for the certificate."""
    body = "".join(
        f"<p class='c{i}'>{encode_entities(p)}</p>"
        for i, p in enumerate(paragraphs)
    )
    return (
        "<!DOCTYPE html><html><head>"
        f"<title>{encode_entities(title)}</title>"
        "<style>p { color: red; } /* DECOYSTYLE > */</style>"
        "<script>var x = '<p>DECOYSCRIPT</p>';</script>"
        "</head><body>"
        "<!-- DECOYCOMMENT <p>hidden</p> -->"
        f"<div id=\"main\" data-note='a > b'>{body}</div>"
        "</body></html>"
    )
