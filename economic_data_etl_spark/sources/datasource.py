"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) for the
bronze snapshot layer.

`spark.read.format("economic_snapshots").load(dir)` turns a directory of
raw FRED/BLS JSON snapshots (written by sources/ingest.py) into fact rows
with the same semantics as the explicit parsers (fred.py / bls.py):
"."/"-" → NULL, M13/quarterly periods dropped, registry name mapping with
id fallback.

Scale shape: one input partition per snapshot file, so a directory of
thousands of snapshots parses fully in parallel with no driver
involvement beyond listing. This is the SURVEY.md §2.1 S1/S2 surface as a
first-class Spark source instead of driver-side plumbing.
"""

from __future__ import annotations

import json
from datetime import date
from pathlib import Path

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from economic_data_etl_spark import config

FACT_DDL = (
    "series_id string, series_name string, date date, value double, source string"
)


def _try_float(raw: str | None) -> float | None:
    if raw is None:
        return None
    try:
        return float(raw)
    except ValueError:  # "." (FRED) / "-" (BLS) / any junk → NULL
        return None


class SnapshotPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class SnapshotReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("economic_snapshots requires a path")

    def partitions(self):
        files = sorted(Path(self.root).glob("*.json"))
        return [SnapshotPartition(str(f)) for f in files]

    def read(self, partition: SnapshotPartition):
        path = Path(partition.path)
        payload = json.loads(path.read_text())
        # bronze naming: {SOURCE}_{IDENTIFIER}_{YYYY_MM_DD}.json
        source, rest = path.stem.split("_", 1)
        identifier = rest.rsplit("_", 3)[0]
        if source == "FRED":
            yield from self._read_fred(payload, identifier)
        elif source == "BLS":
            yield from self._read_bls(payload)
        else:
            raise ValueError(f"unknown snapshot source {source!r} in {path.name}")

    def _read_fred(self, payload: dict, series_id: str):
        id_to_name = {v: k for k, v in config.FRED_SERIES.items()}
        name = id_to_name.get(series_id, series_id)
        for obs in payload.get("observations", []):
            yield (
                series_id,
                name,
                date.fromisoformat(obs["date"]),
                _try_float(obs.get("value")),
                "FRED",
            )

    def _read_bls(self, payload: dict):
        id_to_name = {v: k for k, v in config.BLS_SERIES.items()}
        for series in payload.get("Results", {}).get("series", []):
            sid = series["seriesID"]
            name = id_to_name.get(sid, sid)
            for point in series.get("data", []):
                period = point.get("period", "")
                # monthly grain only (M13 = annual average, Q/S = other grains)
                if not period.startswith("M") or period == "M13":
                    continue
                yield (
                    sid,
                    name,
                    date(int(point["year"]), int(period[1:]), 1),
                    _try_float(point.get("value")),
                    "BLS",
                )


class SnapshotStreamReader(DataSourceStreamReader):
    """Streaming tail of the bronze snapshot directory.

    `spark.readStream.format("economic_snapshots").load(dir)` — each
    micro-batch picks up snapshot files not seen by any previous batch.
    The offset is the SET of consumed file names (a JSON dict), so
    recovery from a checkpoint is exact regardless of listing order or
    clock skew, unlike an index/mtime watermark. The offset grows with
    file count — fine for bronze drops (thousands); a production source
    at millions of files would compact it into a manifest generation
    number. Parsing reuses the batch reader, one partition per new file.
    """

    def __init__(self, options: dict):
        self._batch = SnapshotReader(options)
        self.root = self._batch.root

    def initialOffset(self) -> dict:
        return {"seen": []}

    def latestOffset(self) -> dict:
        return {"seen": sorted(str(f) for f in Path(self.root).glob("*.json"))}

    def partitions(self, start: dict, end: dict):
        new = sorted(set(end["seen"]) - set(start["seen"]))
        # Zero-partition batches are disallowed; emit an empty marker.
        return [SnapshotPartition(p) for p in new] or [SnapshotPartition("")]

    def read(self, partition: SnapshotPartition):
        if not partition.path:
            return iter(())
        return self._batch.read(partition)

    def commit(self, end: dict) -> None:
        pass  # nothing external to clean up; offsets live in the checkpoint

    def stop(self) -> None:
        pass


class SnapshotDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "economic_snapshots"

    def schema(self) -> str:
        return FACT_DDL

    def reader(self, schema) -> SnapshotReader:
        return SnapshotReader(self.options)

    def streamReader(self, schema) -> SnapshotStreamReader:
        return SnapshotStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SnapshotDataSource)
