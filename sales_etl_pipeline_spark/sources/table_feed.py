"""Change-feed streaming SOURCE over a versioned table
(``sources/table.py``) — the consumption half of the format: every
committed version is delivered exactly once as streaming input, with the
commit version attached, so downstream jobs process table updates
incrementally instead of re-reading the whole table per run (the
Delta-source / Iceberg-incremental-read shape, on the engine's own
format).

``spark.readStream.format("versioned_table_feed").option("root", p)``:

- Offsets are COMMIT VERSIONS (``{"v": n}`` = everything up to and
  including version n has been delivered). The manifest log is
  append-only and versions are dense integers, so offset ranges are
  replayable by construction — a restarted query re-reads exactly the
  manifests in ``(start, end]``.
- ``latestOffset`` is the newest committed manifest — an external
  high-watermark, monotone and restart-safe (never internal drain
  state; see the SyntheticEventsStreamReader notes on why that matters
  under availableNow).
- ``partitions(start, end)`` fans out one input partition per DATA FILE
  of each version in the range — file-parallel reads, no driver
  materialization; workers read their single parquet file via pyarrow
  and yield Arrow RecordBatches (zero row-at-a-time Python).
- Each row carries ``_version`` (the commit it belongs to) and
  ``_operation`` (the manifest's operation tag) — consumers distinguish
  merges from overwrites and can latest-wins across versions.

Semantics note: versions are FULL snapshots (the table format commits
whole versions), so the feed is a snapshot-per-commit stream, not a
row-level diff; a consumer wanting deltas anti-joins consecutive
versions (both remain readable until vacuum). The common pattern —
"process each new state of the table once" (refresh a downstream
aggregate, re-export, validate) — needs exactly this.

Typical run mode is periodic ``trigger(availableNow=True)`` jobs
sharing a checkpoint: each run drains the versions committed since the
last run and stops (pinned in tests/test_table_feed.py, including
restart-continuation and vacuum of already-consumed versions).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

FORMAT_NAME = "versioned_table_feed"


@dataclass
class _FilePartition(InputPartition):
    path: str
    version: int
    operation: str


def _log_versions(root: str) -> list[int]:
    import re

    log = os.path.join(root, "_log")
    if not os.path.isdir(log):
        return []
    out = []
    for name in os.listdir(log):
        m = re.match(r"^(\d{12})\.json$", name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _manifest(root: str, version: int) -> dict:
    with open(os.path.join(root, "_log", f"{version:012d}.json")) as f:
        return json.load(f)


class VersionedTableFeedReader(DataSourceStreamReader):
    def __init__(self, options) -> None:
        self.root = options.get("root")
        if not self.root:
            raise ValueError("versioned_table_feed requires a 'root' option")

    def initialOffset(self) -> dict:
        # start BEFORE the first version: a fresh query delivers the
        # whole history once, then increments
        return {"v": -1}

    def latestOffset(self) -> dict:
        vs = _log_versions(self.root)
        return {"v": vs[-1] if vs else -1}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["v"], end["v"]
        parts = []
        for v in _log_versions(self.root):
            if lo < v <= hi:
                m = _manifest(self.root, v)
                op = m.get("operation") or ""
                for e in m["files"]:
                    parts.append(
                        _FilePartition(
                            os.path.join(self.root, "data", e["name"]), v, op
                        )
                    )
        return parts

    def read(self, partition: _FilePartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq

        table = pq.read_table(partition.path)
        n = table.num_rows
        table = table.append_column(
            "_version", pa.array([partition.version] * n, pa.int64())
        ).append_column(
            "_operation", pa.array([partition.operation] * n, pa.string())
        )
        for batch in table.to_batches():
            yield batch

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass


class VersionedTableFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        """Table schema (from the newest manifest) + the feed columns."""
        from pyspark.sql.types import StructType

        root = self.options.get("root")
        if not root:
            raise ValueError("versioned_table_feed requires a 'root' option")
        vs = _log_versions(root)
        if not vs:
            raise ValueError(
                f"no committed version under {root} — commit before streaming"
            )
        schema = StructType.fromJson(
            json.loads(_manifest(root, vs[-1])["schema"])
        )
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
        )
        return f"{cols}, _version bigint, _operation string"

    def streamReader(self, schema) -> VersionedTableFeedReader:
        return VersionedTableFeedReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(VersionedTableFeedDataSource)


def read_feed(spark, root: str):
    """The change-feed stream over a versioned table root."""
    register(spark)
    return spark.readStream.format(FORMAT_NAME).option("root", root).load()
