"""Minimal from-scratch PDF writer + text extractor.

The canonical training-data ingestion workload — "extract the text out
of N million PDFs" — expressed with the repo's codec discipline: a
deterministic writer builds structurally-valid PDF 1.4 files (catalog,
pages tree, per-page FlateDecode or raw content streams, xref table,
trailer), and the extractor recovers per-page text by parsing the
object graph (pages-tree /Kids order -> /Contents refs -> content
streams) and interpreting the text-showing operators (Tj and TJ with
kerning arrays), including PDF string-literal escapes (\\( \\) \\\\
\\n \\r \\t and octal \\ddd) and balanced unescaped parentheses.

Honest scope seam (the NotImplementedError contract of the other
codecs): text payloads are stored as UTF-8 bytes inside string
literals and recovered byte-exactly — glyph encoding (/Encoding,
CMaps, ToUnicode) is out of scope, as are object streams
(/ObjStm), encryption, and incremental updates. The parser finds
objects by scanning `N 0 obj ... endobj` spans rather than trusting
the xref table — the standard robust-extractor choice, since
real-world xref tables are the least reliable part of a PDF.

Spark-side plumbing mirrors the other media lanes: encode/decode run
in Arrow mapInPandas batches over binary columns; structure errors
raise ValueError so try-style wrappers can quarantine corrupt files.
"""

from __future__ import annotations

import re
import zlib

_OBJ_START_RE = re.compile(rb"(\d+)\s+0\s+obj\b")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b")
_STREAM_KW_RE = re.compile(rb"stream\r?\n")


def _scan_objects(data: bytes) -> dict[int, bytes]:
    """num -> object body. Scans `N 0 obj ... endobj` spans, jumping
    past stream payloads by their declared /Length — a raw payload may
    legitimately contain `endobj`/`endstream`/`M 0 obj` as TEXT, so a
    flat regex over the file would truncate or invent objects."""
    objs: dict[int, bytes] = {}
    pos = 0
    while True:
        m = _OBJ_START_RE.search(data, pos)
        if m is None:
            break
        body_start = m.end()
        em = data.find(b"endobj", body_start)
        if em == -1:
            raise ValueError("unterminated object")
        sm = _STREAM_KW_RE.search(data, body_start)
        if sm is not None and sm.start() < em:
            lm = _LENGTH_RE.search(data, body_start, sm.start())
            if lm is None:
                raise ValueError("stream without /Length")
            em = data.find(b"endobj", sm.end() + int(lm.group(1)))
            if em == -1:
                raise ValueError("unterminated stream object")
        objs[int(m.group(1))] = data[body_start:em]
        pos = em + len(b"endobj")
    return objs
_KIDS_RE = re.compile(rb"/Kids\s*\[(.*?)\]", re.DOTALL)
_REF_RE = re.compile(rb"(\d+)\s+0\s+R")
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+0\s+R")
_PAGES_RE = re.compile(rb"/Type\s*/Pages\b")


def _escape_pdf_string(b: bytes) -> bytes:
    out = bytearray()
    for ch in b:
        if ch in (0x28, 0x29, 0x5C):  # ( ) backslash
            out.append(0x5C)
            out.append(ch)
        elif ch == 0x0D:  # bare CR would be normalized by readers
            out.extend(b"\\r")
        else:
            out.append(ch)
    return bytes(out)


def write_minimal_pdf(
    pages: list[str], compress: bool = True, kern_every: int = 0
) -> bytes:
    """Build a structurally-valid single-font PDF 1.4. One page per
    entry; `kern_every > 0` splits the text into that many-character
    segments shown via a TJ kerning array (exercises the array
    operator path); otherwise one Tj per page."""
    objs: dict[int, bytes] = {}
    n_pages = len(pages)
    # 1 catalog, 2 pages tree, 3 font; pages at 4..; contents after
    kids = b" ".join(
        b"%d 0 R" % (4 + i) for i in range(n_pages)
    )
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages
    )
    objs[3] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    body_parts: list[bytes] = []
    for i, text in enumerate(pages):
        page_num = 4 + i
        cont_num = 4 + n_pages + i
        objs[page_num] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> "
            b"/Contents %d 0 R >>" % cont_num
        )
        raw = text.encode("utf-8")
        if kern_every > 0 and raw:
            segs = [
                raw[j : j + kern_every]
                for j in range(0, len(raw), kern_every)
            ]
            arr = b" -12 ".join(
                b"(" + _escape_pdf_string(s) + b")" for s in segs
            )
            shown = b"[" + arr + b"] TJ"
        else:
            shown = b"(" + _escape_pdf_string(raw) + b") Tj"
        content = (
            b"BT /F1 12 Tf 72 720 Td " + shown + b" ET"
        )
        if compress:
            data = zlib.compress(content)
            objs[cont_num] = (
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n"
                % len(data)
                + data
                + b"\nendstream"
            )
        else:
            objs[cont_num] = (
                b"<< /Length %d >>\nstream\n" % len(content)
                + content
                + b"\nendstream"
            )
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    n = max(objs) + 1
    out += b"xref\n0 %d\n" % n
    out += b"0000000000 65535 f \n"
    for num in range(1, n):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (n, xref_at)
    )
    return bytes(out)


def _unescape_pdf_string(b: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(b):
        c = b[i]
        if c != 0x5C:  # not a backslash
            out.append(c)
            i += 1
            continue
        i += 1
        if i >= len(b):
            break
        e = b[i]
        simple = {
            0x6E: 0x0A,  # \n
            0x72: 0x0D,  # \r
            0x74: 0x09,  # \t
            0x62: 0x08,  # \b
            0x66: 0x0C,  # \f
            0x28: 0x28,  # \(
            0x29: 0x29,  # \)
            0x5C: 0x5C,  # \\
        }
        if e in simple:
            out.append(simple[e])
            i += 1
        elif 0x30 <= e <= 0x37:  # octal \d, \dd, \ddd
            j = i
            while j < len(b) and j < i + 3 and 0x30 <= b[j] <= 0x37:
                j += 1
            out.append(int(b[i:j], 8) & 0xFF)
            i = j
        else:  # unknown escape: PDF says drop the backslash
            out.append(e)
            i += 1
    return bytes(out)


def _string_literals(content: bytes) -> list[tuple[int, bytes]]:
    """(offset, unescaped bytes) of every ( ... ) literal, honoring
    escapes and balanced nested parentheses."""
    lits = []
    i = 0
    n = len(content)
    while i < n:
        if content[i] != 0x28:
            i += 1
            continue
        depth = 1
        j = i + 1
        while j < n and depth:
            c = content[j]
            if c == 0x5C:
                j += 2
                continue
            if c == 0x28:
                depth += 1
            elif c == 0x29:
                depth -= 1
            j += 1
        if depth:
            raise ValueError("unterminated string literal")
        lits.append((i, _unescape_pdf_string(content[i + 1 : j - 1])))
        i = j
    return lits


def _page_text(content: bytes) -> bytes:
    """Concatenate the text shown by Tj and TJ operators, in stream
    order. TJ kerning numbers are positioning, not text — skipped."""
    shown = bytearray()
    lits = _string_literals(content)
    # every literal in a content stream we emit is an argument of
    # Tj or TJ; a general extractor would track the operator stack,
    # but literals outside text-showing operators do not occur in
    # this writer's streams and real extractors treat stray literals
    # the same way (shown text is the common-denominator recovery)
    for _, lit in lits:
        shown += lit
    return bytes(shown)


def extract_pdf_text(data: bytes) -> list[str]:
    """Per-page text of a minimal PDF, in pages-tree order.

    Object discovery scans `N 0 obj ... endobj` spans (robust to a
    corrupt xref); pages come from the /Pages tree's /Kids order, each
    page's /Contents ref resolves to its stream, /FlateDecode streams
    are inflated. Raises ValueError on structural corruption."""
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF (missing %PDF- header)")
    objs = _scan_objects(data)
    if not objs:
        raise ValueError("no objects found")
    pages_obj = None
    for body in objs.values():
        if _PAGES_RE.search(body) and _KIDS_RE.search(body):
            pages_obj = body
            break
    if pages_obj is None:
        raise ValueError("no /Pages tree")
    kids_m = _KIDS_RE.search(pages_obj)
    kid_nums = [int(m.group(1)) for m in _REF_RE.finditer(kids_m.group(1))]
    texts: list[str] = []
    for kid in kid_nums:
        page = objs.get(kid)
        if page is None:
            raise ValueError(f"missing page object {kid}")
        cm = _CONTENTS_RE.search(page)
        if cm is None:
            texts.append("")
            continue
        cont_num = int(cm.group(1))
        cont = objs.get(cont_num)
        if cont is None:
            raise ValueError(f"missing contents object {cont_num}")
        sm = _STREAM_KW_RE.search(cont)
        if sm is None:
            raise ValueError("contents object has no stream")
        lm = _LENGTH_RE.search(cont[: sm.start()])
        if lm is None:
            raise ValueError("stream without /Length")
        # slice by the declared /Length — a compressed payload can
        # legitimately contain the bytes 'endstream', so a keyword
        # scan would truncate it
        length = int(lm.group(1))
        payload = cont[sm.end() : sm.end() + length]
        if len(payload) != length:
            raise ValueError("stream truncated vs declared /Length")
        if b"/FlateDecode" in cont[: sm.start()]:
            try:
                payload = zlib.decompress(payload)
            except zlib.error as e:
                raise ValueError(f"bad FlateDecode stream: {e}") from e
        texts.append(_page_text(payload).decode("utf-8"))
    return texts
