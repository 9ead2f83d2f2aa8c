"""Minimal from-scratch WARC (Web ARChive) writer + reader.

Completes the crawl-ingestion chain: WARC is the container format
CommonCrawl ships (ISO 28500) — a concatenation of records, each a
CRLF-delimited header block (WARC/1.0 version line + named fields)
followed by exactly Content-Length payload bytes and a blank-line
record separator. The reader slices records by Content-Length — the
payload is arbitrary bytes (it routinely CONTAINS header-looking
text), so delimiter scanning would corrupt records; the same
discipline as the PDF /Length-sliced streams.

Scope: 'response'/'resource'-style records with a raw payload; no
gzip-per-record (.warc.gz chunking), no request/metadata pairing, no
HTTP-header splitting — those are documented seams, and the payload
here is the HTML the page writer produces, parsed downstream by
operators/html.py. Spark-side the reader rides Arrow mapInPandas over
binary columns like every other container lane
(multimodal_container_header_parse).
"""

from __future__ import annotations

_CRLF = b"\r\n"


def write_warc(records: list[tuple[str, bytes]]) -> bytes:
    """Concatenate (target_uri, payload) pairs into a WARC stream."""
    out = bytearray()
    for uri, payload in records:
        out += b"WARC/1.0" + _CRLF
        out += b"WARC-Type: resource" + _CRLF
        out += b"WARC-Target-URI: " + uri.encode("utf-8") + _CRLF
        out += b"Content-Type: text/html" + _CRLF
        out += b"Content-Length: %d" % len(payload) + _CRLF
        out += _CRLF
        out += payload
        out += _CRLF + _CRLF
    return bytes(out)


def read_warc(data: bytes) -> list[dict]:
    """Parse a WARC stream into records:
    {'headers': {name: value}, 'payload': bytes}. Payloads are sliced
    by Content-Length, never delimiter-scanned. Raises ValueError on
    structural corruption (bad version line, missing Content-Length,
    truncated payload, missing record separator)."""
    records = []
    i, n = 0, len(data)
    while i < n:
        end_hdr = data.find(_CRLF + _CRLF, i)
        if end_hdr == -1:
            raise ValueError("unterminated record header block")
        lines = data[i:end_hdr].split(_CRLF)
        if not lines[0].startswith(b"WARC/"):
            raise ValueError(
                f"bad WARC version line at offset {i}"
            )
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, sep, v = ln.partition(b":")
            if not sep:
                raise ValueError(f"malformed header line {ln!r}")
            headers[k.strip().decode("ascii")] = v.strip().decode(
                "utf-8"
            )
        if "Content-Length" not in headers:
            raise ValueError("record missing Content-Length")
        length = int(headers["Content-Length"])
        payload_at = end_hdr + 4
        payload = data[payload_at : payload_at + length]
        if len(payload) != length:
            raise ValueError("payload truncated vs Content-Length")
        sep_at = payload_at + length
        if data[sep_at : sep_at + 4] != _CRLF + _CRLF:
            raise ValueError("missing record separator")
        records.append({"headers": headers, "payload": payload})
        i = sep_at + 4
    return records
