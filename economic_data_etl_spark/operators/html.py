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


# ---------------------------------------------------------------------------
# Main-content extraction (boilerplate removal), jusText-style.
# ---------------------------------------------------------------------------
# Containers whose text is site chrome, not document content. The tag
# prior beats every content signal: prose inside a <footer> is still
# boilerplate.
_BOILER_TAGS = {"nav", "footer", "header", "aside"}

# Small closed English stopword list for the prose-density signal
# (jusText's stoplist idea, trimmed to the highest-frequency function
# words; a closed set keeps the classifier deterministic and
# SQL-replayable).
_STOPWORDS = frozenset(
    "a an and are as at be but by for from had has have he her his i in "
    "is it its not of on or she that the their they this to was we were "
    "will with you your our us".split()
)

_WORD_PUNCT = ".,;:!?'\"()[]"

# Context-free thresholds (documented constants of the lane):
MAX_LINK_DENSITY = 1.0 / 3.0  # above: link farm / menu
MIN_BLOCK_CHARS = 25  # below: UI fragments ("Share", dates)
SHORT_BLOCK_CHARS = 80  # 25..80 needs prose evidence (stopwords)
MIN_STOP_DENSITY = 0.2


def html_blocks(html: str) -> list[dict]:
    """Tokenize markup into TEXT BLOCKS at block-tag boundaries,
    tracking per block: whitespace-collapsed text, raw char count,
    chars inside <a> elements (both measured pre-collapse, so link
    density is layout-independent), and whether any of it sat inside a
    boilerplate container (nav/footer/header/aside). Same tag-soup
    rules as html_to_text (quoted '>' in attributes, raw-text
    script/style bodies, comments); raw newlines are in-block
    whitespace — blocks are defined by TAGS, not source formatting."""
    blocks: list[dict] = []
    cur: list[str] = []
    raw_chars = 0
    link_chars = 0
    in_boiler = False
    a_depth = 0
    boiler_depth = 0

    def flush() -> None:
        nonlocal cur, raw_chars, link_chars, in_boiler
        text = _WS_RE.sub(" ", "".join(cur)).strip()
        if text:
            blocks.append(
                {
                    "text": text,
                    "raw_chars": raw_chars,
                    "link_chars": link_chars,
                    "boiler": in_boiler,
                }
            )
        cur = []
        raw_chars = 0
        link_chars = 0
        in_boiler = boiler_depth > 0

    i, n = 0, len(html)
    while i < n:
        c = html[i]
        if c != "<":
            nxt = html.find("<", i)
            if nxt == -1:
                nxt = n
            run = decode_entities(html[i:nxt])
            cur.append(run)
            stripped = len(run) - run.count("\n")  # raw newlines are ws
            raw_chars += stripped
            if a_depth > 0:
                link_chars += stripped
            if boiler_depth > 0:
                in_boiler = True
            i = nxt
            continue
        if html.startswith("<!--", i):
            end = html.find("-->", i + 4)
            i = n if end == -1 else end + 3
            continue
        closing = html.startswith("</", i)
        j, name = _skip_tag(html, i)
        if name in _RAW_TEXT_TAGS and not closing:
            close = re.compile(rf"</{name}\s*>", re.IGNORECASE).search(
                html, j
            )
            j = n if close is None else close.end()
        if name == "a":
            a_depth = max(0, a_depth - 1) if closing else a_depth + 1
        if name in _BOILER_TAGS:
            flush()  # container boundary is also a block boundary
            boiler_depth = (
                max(0, boiler_depth - 1) if closing else boiler_depth + 1
            )
            in_boiler = boiler_depth > 0
        elif name in _BLOCK_TAGS:
            flush()
        i = j
    flush()
    return blocks


def classify_block(block: dict) -> str:
    """Context-free jusText-style verdict for one block:
    'bad_container' (inside nav/footer/header/aside — the tag prior
    beats content), 'bad_links' (link density > 1/3: menus, link
    farms), 'bad_short' (< 25 chars: UI fragments), 'bad_lowstop'
    (25..79 chars with stopword density < 0.2: short non-prose), else
    'good'."""
    if block["boiler"]:
        return "bad_container"
    raw = block["raw_chars"]
    if raw == 0 or block["link_chars"] / raw > MAX_LINK_DENSITY:
        return "bad_links"
    text = block["text"]
    if len(text) < MIN_BLOCK_CHARS:
        return "bad_short"
    if len(text) < SHORT_BLOCK_CHARS:
        words = text.split()
        stops = sum(
            w.strip(_WORD_PUNCT).lower() in _STOPWORDS for w in words
        )
        if not words or stops / len(words) < MIN_STOP_DENSITY:
            return "bad_lowstop"
    return "good"


def html_main_content(html: str) -> str:
    """Visible MAIN text of a page: html_blocks -> classify_block,
    keep the good blocks, one per line. The trafilatura/jusText layer
    a crawl pipeline runs between raw extraction and quality scoring."""
    return "\n".join(
        b["text"] for b in html_blocks(html) if classify_block(b) == "good"
    )


# Constant prose used by the certification page writer: stopword-rich
# and >= 80 chars, so the article paragraphs classify 'good' by length
# alone — survival never depends on the wrapped document's own text.
PROSE_PREFIX = (
    "This is the part of the page that you and we are here to read, "
    "and it is the main content that a reader will want to keep."
)
CONST_PARA = (
    "It was not a surprise that the main text of the article is what "
    "we keep at the end of the day."
)


def write_article_page(title: str, text: str) -> str:
    """Deterministic article page whose chrome plants one decoy per
    bad-block rule: header/nav/footer containers (DECOYHEADER,
    DECOYNAV, DECOYFOOTER — the footer is deliberately long prose, so
    only the tag prior can reject it), a link farm outside any
    container (DECOYLINKFARM, link density ~1), a short UI fragment
    (Share), a mid-length low-stopword product string (DECOYMIDLEN),
    plus the script/style/comment decoys of write_page. The article
    body is PROSE_PREFIX + text and CONST_PARA — the only blocks that
    must survive html_main_content."""
    main = (PROSE_PREFIX + " " + (text or "")).strip()
    return (
        "<!DOCTYPE html><html><head>"
        f"<title>{encode_entities(title)}</title>"
        "<style>p { color: red; } /* DECOYSTYLE > */</style>"
        "<script>var x = '<p>DECOYSCRIPT</p>';</script>"
        "</head><body>"
        "<!-- DECOYCOMMENT <p>hidden</p> -->"
        "<header><h1><a href='/'>DECOYHEADER The Site Of The Test"
        "</a></h1></header>"
        "<nav><ul><li><a href='/h'>DECOYNAV Home</a></li>"
        "<li><a href='/n'>News and Politics of the Day</a></li>"
        "</ul></nav>"
        "<div class='share'>Share</div>"
        "<p>DECOYMIDLEN Product Catalog Item Number Blue Widget "
        "Edition</p>"
        "<div class='sidebar'>"
        "<a href='/1'>DECOYLINKFARM first promoted partner link goes "
        "right here</a> "
        "<a href='/2'>second promoted partner link text sits right "
        "here</a></div>"
        f"<article><p>{encode_entities(main)}</p>"
        f"<p>{CONST_PARA}</p></article>"
        "<footer>DECOYFOOTER It is a long footer that is written as "
        "prose and it has many of the stopwords in it, so only the "
        "container prior can reject it.</footer>"
        "</body></html>"
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


# ---------------------------------------------------------------------------
# Hyperlink extraction + reference resolution (the link-graph layer).
# ---------------------------------------------------------------------------
# A web-corpus pipeline needs the LINK GRAPH next to the text: anchor
# text is a labeled description of the *target* page (the classic
# anchor-text index), and host-level link statistics (out-degree,
# intra-host fraction) feed spam/quality priors. This layer extracts
# <a href> edges with the same tag-soup rules as html_to_text and
# resolves references RFC 3986-style (absolute, protocol-relative,
# root-relative, query-only, dot-segment relative). Fragment-only
# references are navigation within the page, not edges.

_ATTR_RE = re.compile(
    r"""([a-zA-Z][a-zA-Z0-9_:.-]*)\s*(?:=\s*("[^"]*"|'[^']*'|[^\s>]*))?"""
)


def _parse_tag(s: str, i: int) -> tuple[int, str, bool, dict]:
    """i points at '<'. Return (index after '>', lowercased tag name,
    is_closing, attrs). Same quote rules as _skip_tag; attribute values
    may be double-quoted, single-quoted, or bare."""
    j, name = _skip_tag(s, i)
    inner = s[i + 1 : j - 1] if j <= len(s) and j > i else s[i + 1 :]
    is_close = inner.startswith("/")
    attrs: dict[str, str] = {}
    if not is_close:
        m = re.match(r"[a-zA-Z][a-zA-Z0-9-]*", inner)
        rest = inner[m.end():] if m else ""
        for am in _ATTR_RE.finditer(rest):
            key = am.group(1).lower()
            val = am.group(2) or ""
            if val[:1] in ("'", '"'):
                val = val[1:-1]
            if key not in attrs:
                attrs[key] = decode_entities(val)
    return j, name, is_close, attrs


def html_links(html: str) -> list[tuple[str, str]]:
    """All (href, anchor_text) pairs of <a href=...> elements, in
    document order. Anchor text is the visible text between the open
    tag and the matching </a> (a new <a> implicitly closes the previous
    one, per the HTML parser spec), whitespace-collapsed and
    entity-decoded. Comment / script / style content never yields
    links; <a> without an href attribute yields nothing."""
    links: list[tuple[str, str]] = []
    cur_href: str | None = None
    cur_text: list[str] = []

    def close() -> None:
        nonlocal cur_href, cur_text
        if cur_href is not None:
            links.append(
                (cur_href, _WS_RE.sub(" ", "".join(cur_text)).strip())
            )
        cur_href, cur_text = None, []

    i, n = 0, len(html)
    while i < n:
        c = html[i]
        if c != "<":
            nxt = html.find("<", i)
            if nxt == -1:
                nxt = n
            if cur_href is not None:
                cur_text.append(decode_entities(html[i:nxt]))
            i = nxt
            continue
        if html.startswith("<!--", i):
            end = html.find("-->", i + 4)
            i = n if end == -1 else end + 3
            continue
        j, name, is_close, attrs = _parse_tag(html, i)
        if name in _RAW_TEXT_TAGS and not is_close:
            m = re.compile(rf"</{name}\s*>", re.IGNORECASE).search(html, j)
            j = n if m is None else m.end()
        elif name == "a":
            close()
            if not is_close and "href" in attrs:
                cur_href = attrs["href"]
        i = j
    close()
    return links


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 (iterative segment algorithm)."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    if path.endswith(("/.", "/..")):
        out.append("")
    return "/".join(out) or "/"


def resolve_url(base: str, href: str) -> str | None:
    """Resolve an href against the page URL, RFC 3986 §5-lite:
    absolute and protocol-relative pass through (scheme lowered),
    root-relative and dot-segment-relative merge against the base
    path, query-only replaces the base query. Fragments are always
    stripped; a fragment-ONLY reference is within-page navigation and
    returns None (not a link-graph edge). Unsupported schemes
    (mailto:, javascript:) return None."""
    href = href.strip()
    base = base.split("#", 1)[0]
    frag_cut = href.split("#", 1)
    href = frag_cut[0]
    if not href:
        return None
    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*):", href)
    if m:
        scheme = m.group(1).lower()
        if scheme not in ("http", "https"):
            return None
        return scheme + ":" + href[m.end():]
    bm = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?]*)([^?]*)(\?.*)?$",
                  base)
    if not bm:
        return None
    b_scheme, b_auth, b_path, b_query = (
        bm.group(1).lower(), bm.group(2), bm.group(3) or "/",
        bm.group(4) or "",
    )
    if href.startswith("//"):
        return f"{b_scheme}:{href}"
    if href.startswith("?"):
        return f"{b_scheme}://{b_auth}{b_path}{href}"
    q = ""
    if "?" in href:
        href, q = href.split("?", 1)
        q = "?" + q
    if href.startswith("/"):
        path = _remove_dot_segments(href)
    else:
        merged = b_path[: b_path.rfind("/") + 1] + href
        path = _remove_dot_segments(merged)
    return f"{b_scheme}://{b_auth}{path}{q}"


def linked_page_base_url(did: int) -> str:
    """The deterministic URL the certification page for doc `did` is
    served from: host is sharded by did % 7."""
    return f"https://site{did % 7}.example.com/doc/{did}"


def write_linked_page(did: int, n_docs: int) -> str:
    """Deterministic article page for doc `did` whose body plants one
    link per reference form the resolver must handle — absolute,
    protocol-relative (entity-encoded anchor), root-relative
    (single-quoted href), dot-segment relative (unquoted href),
    query-only — plus two nav chrome links, and three planted
    NON-edges: a fragment-only href, an <a> without href, a commented-
    out link, and a script-body link. The target arithmetic
    (t1..t4 below) is the contract the DuckDB oracle replays."""
    t1 = (7 * did + 3) % n_docs
    t2 = (13 * did + 5) % n_docs
    t3 = (3 * did + 1) % n_docs
    t4 = (5 * did + 2) % n_docs
    return (
        "<!DOCTYPE html><html><head>"
        f"<title>Doc {did}</title>"
        "<script>var x = '<a href=\"/decoy\">DECOYSCRIPTLINK</a>';"
        "</script></head><body>"
        "<!-- <a href='/decoy'>DECOYCOMMENTLINK</a> -->"
        "<nav><a href=\"/nav/home\">Home</a> "
        "<a href=\"/nav/about\">About</a></nav>"
        f"<p>Doc {did} body. "
        f"<a href=\"https://site{t1 % 7}.example.com/doc/{t1}\">"
        f"Topic {t1 % 13} in full</a> "
        f"<a href=\"//site{t2 % 7}.example.com/doc/{t2}\">"
        f"Q&amp;A page {t2}</a> "
        f"<a href='/doc/{t3}'>See also {t3}</a> "
        f"<a href=../doc/{t4}>Related {t4}</a> "
        f"<a href=\"?ref={did % 5}\">Sorted view</a> "
        "<a href=\"#top\">Back to top</a> "
        "<a name=\"x\">No href here</a></p>"
        "</body></html>"
    )
