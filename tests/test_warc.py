"""WARC container: Content-Length-sliced round trip (payloads that
contain header-looking text must survive), header recovery, and clean
failure on corruption."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from economic_data_etl_spark.operators.warc import read_warc, write_warc


def test_roundtrip_with_hostile_payloads():
    recs = [
        ("http://a/1", b"plain payload"),
        # payload that LOOKS like a record boundary + headers
        (
            "http://a/2",
            b"\r\n\r\nWARC/1.0\r\nContent-Length: 99\r\n\r\nfake",
        ),
        ("http://a/3", b""),  # empty payload
        ("http://a/4", bytes(range(256)) * 3),  # raw binary
    ]
    got = read_warc(write_warc(recs))
    assert [(r["headers"]["WARC-Target-URI"], r["payload"]) for r in got] == recs
    assert all(r["headers"]["WARC-Type"] == "resource" for r in got)


@settings(max_examples=30, deadline=None)
@given(
    payloads=st.lists(st.binary(max_size=200), min_size=1, max_size=5)
)
def test_property_roundtrip(payloads):
    recs = [(f"http://x/{i}", p) for i, p in enumerate(payloads)]
    got = read_warc(write_warc(recs))
    assert [r["payload"] for r in got] == payloads


def test_corruption_raises():
    blob = write_warc([("http://a", b"abcdef")])
    with pytest.raises(ValueError):
        read_warc(blob[:-5])  # separator gone
    with pytest.raises(ValueError):
        read_warc(b"HTTP/1.1 200 OK\r\n\r\n")  # not WARC
    # declared length longer than the data
    broken = blob.replace(b"Content-Length: 6", b"Content-Length: 60")
    with pytest.raises(ValueError):
        read_warc(broken)
