"""Ingest-control parity tests (reference tests/test_extract.py:14-129):
hash determinism, metadata round-trip, snapshot naming, retry semantics,
idempotent snapshot writes, watermark preservation."""

from __future__ import annotations

import json

import pytest

from economic_data_etl_spark.sources import ingest


class TestComputeHash:
    def test_deterministic_64_hex(self):
        h = ingest.compute_hash({"a": 1, "b": [1, 2]})
        assert h == ingest.compute_hash({"a": 1, "b": [1, 2]})
        assert len(h) == 64 and all(c in "0123456789abcdef" for c in h)

    def test_key_order_independent(self):
        assert ingest.compute_hash({"a": 1, "b": 2}) == ingest.compute_hash(
            {"b": 2, "a": 1}
        )

    def test_different_payloads_differ(self):
        assert ingest.compute_hash({"a": 1}) != ingest.compute_hash({"a": 2})


class TestMetadataStore:
    def test_roundtrip_and_naming(self, tmp_path):
        store = ingest.MetadataStore(tmp_path)
        store.save("FRED", "UNRATE", {"last_hash": "abc"})
        assert (tmp_path / "fred_UNRATE_metadata.json").exists()
        assert store.load("FRED", "UNRATE") == {"last_hash": "abc"}

    def test_missing_is_empty(self, tmp_path):
        assert ingest.MetadataStore(tmp_path).load("FRED", "NOPE") == {}

    def test_watermark_preserved_on_empty_batch(self, tmp_path):
        # reference src/extract.py:109-113 / tests/test_extract.py:249-265
        store = ingest.MetadataStore(tmp_path)
        store.update_watermark("FRED", "UNRATE", "h1", "2023-04-01")
        store.update_watermark("FRED", "UNRATE", "h2", None)
        assert store.watermark("FRED", "UNRATE") == "2023-04-01"


class TestSnapshotPath:
    def test_name_format(self, tmp_path):
        p = ingest.snapshot_path(tmp_path, "fred", "UNRATE")
        name = p.name
        assert name.startswith("FRED_UNRATE_") and name.endswith(".json")
        datepart = name[len("FRED_UNRATE_") : -len(".json")]
        y, m, d = datepart.split("_")
        assert len(y) == 4 and len(m) == 2 and len(d) == 2


class TestRetry:
    def test_succeeds_after_transient_failures(self, monkeypatch):
        monkeypatch.setattr(ingest.time, "sleep", lambda s: None)
        calls = {"n": 0}

        @ingest.fetch_with_retry
        def flaky():
            calls["n"] += 1
            if calls["n"] < 3:
                raise ingest.RetryableFetchError("boom")
            return "ok"

        assert flaky() == "ok"
        assert calls["n"] == 3

    def test_raises_after_three_attempts(self, monkeypatch):
        sleeps = []
        monkeypatch.setattr(ingest.time, "sleep", sleeps.append)

        @ingest.fetch_with_retry
        def always_fails():
            raise ingest.RetryableFetchError("down")

        with pytest.raises(ingest.RetryableFetchError):
            always_fails()
        assert sleeps == [1, 2]  # exponential backoff 2**attempt

    def test_non_network_errors_propagate_immediately(self, monkeypatch):
        monkeypatch.setattr(ingest.time, "sleep", lambda s: None)
        calls = {"n": 0}

        @ingest.fetch_with_retry
        def bad_value():
            calls["n"] += 1
            raise ValueError("not retryable")

        with pytest.raises(ValueError):
            bad_value()
        assert calls["n"] == 1

    def test_preserves_name(self):
        @ingest.fetch_with_retry
        def my_fetch():
            return 1

        assert my_fetch.__name__ == "my_fetch"


class TestSnapshotWriteSkip:
    def test_first_write_then_skip_then_rewrite(self, tmp_path):
        raw = tmp_path / "raw"
        store = ingest.MetadataStore(tmp_path / "meta")
        payload = {"observations": [{"date": "2023-01-01", "value": "3.4"}]}

        wrote = ingest.write_snapshot_if_changed(
            raw, store, "FRED", "UNRATE", payload, payload["observations"], "2023-01-01"
        )
        assert wrote is True
        files = list(raw.glob("*.json"))
        assert len(files) == 1
        assert json.loads(files[0].read_text()) == payload

        # identical data → skip (but metadata still refreshed)
        wrote2 = ingest.write_snapshot_if_changed(
            raw, store, "FRED", "UNRATE", payload, payload["observations"], "2023-01-01"
        )
        assert wrote2 is False

        # revised data → rewrite (same-day overwrite: still one file)
        revised = {"observations": [{"date": "2023-01-01", "value": "9.9"}]}
        wrote3 = ingest.write_snapshot_if_changed(
            raw, store, "FRED", "UNRATE", revised, revised["observations"], "2023-01-01"
        )
        assert wrote3 is True
        assert len(list(raw.glob("*.json"))) == 1
