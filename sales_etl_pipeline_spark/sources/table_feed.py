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

Two modes:

- **snapshot mode** (default): versions are FULL snapshots (the table
  format commits whole versions), so each version's rows are delivered
  whole — "process each new state of the table once" (refresh a
  downstream aggregate, re-export, validate).
- **CDF mode** (``option("cdf", "true")``): ROW-LEVEL deltas in the
  Delta-CDF shape — each row carries ``_change_type`` ∈ insert /
  update_preimage / update_postimage / delete. Requires the table to
  have been committed with ``VersionedTable.key_columns`` set: diff
  commits ship their change parquet (read file-parallel, exactly like
  data files); append commits and version 0 synthesize ``insert`` rows
  straight from the data files added by that commit (zero extra read
  amplification); compact commits contribute no rows (no row changed).
  A version committed WITHOUT CDF bookkeeping raises rather than
  silently dropping its changes.

Both modes tolerate additive schema evolution mid-stream: files from
pre-evolution versions are read against the feed's declared schema and
missing columns come back null (pyarrow schema-fill, still columnar).

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

#: feed-added columns (everything else is the table's own schema)
_META_SNAPSHOT = ("_version", "_operation")
_META_CDF = ("_change_type", "_version", "_operation")


@dataclass
class _FilePartition(InputPartition):
    path: str
    version: int
    operation: str
    #: None = the file already carries _change_type (a diff change
    #: parquet); a string = synthesize that change type for every row
    #: (append / insert_all data files); "" in snapshot mode = no
    #: _change_type column at all
    synth_change: str | None = ""


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
    out.sort()
    # tolerate a torn trailing manifest exactly like VersionedTable.versions()
    while out:
        try:
            _manifest(root, out[-1])
            break
        except (json.JSONDecodeError, OSError):
            out.pop()
    return out


def _manifest(root: str, version: int) -> dict:
    with open(os.path.join(root, "_log", f"{version:012d}.json")) as f:
        return json.load(f)


class VersionedTableFeedReader(DataSourceStreamReader):
    def __init__(self, options, schema) -> None:
        self.root = options.get("root")
        if not self.root:
            raise ValueError("versioned_table_feed requires a 'root' option")
        self.cdf = str(options.get("cdf", "false")).lower() == "true"
        # the TABLE part of the declared feed schema — what every file
        # read is aligned to (fills nulls for pre-evolution files)
        meta = _META_CDF if self.cdf else _META_SNAPSHOT
        self.table_fields = [f for f in schema.fields if f.name not in meta]

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
            if not (lo < v <= hi):
                continue
            m = _manifest(self.root, v)
            op = m.get("operation") or ""
            if not self.cdf:
                for e in m["files"]:
                    parts.append(
                        _FilePartition(
                            os.path.join(self.root, "data", e["name"]),
                            v, op, "",
                        )
                    )
                continue
            cdf = m.get("cdf")
            if cdf is None:
                raise ValueError(
                    f"version {v} of {self.root} was committed without "
                    "CDF bookkeeping (VersionedTable.key_columns unset) — "
                    "its row-level changes are unrecoverable; use the "
                    "snapshot feed or recommit with key_columns"
                )
            mode = cdf.get("mode")
            if mode == "none":
                continue  # compact: no row changed
            if mode == "diff":
                names, synth = cdf["files"], None
            elif mode == "insert_all":
                names, synth = [e["name"] for e in m["files"]], "insert"
            elif mode == "insert_files":
                names, synth = cdf["files"], "insert"
            else:
                raise ValueError(f"unknown cdf mode {mode!r} at version {v}")
            for name in names:
                parts.append(
                    _FilePartition(
                        os.path.join(self.root, "data", name), v, op, synth
                    )
                )
        return parts

    def read(self, partition: _FilePartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import StructType

        # Project onto the declared table schema: selects the feed's
        # columns in order and NULL-fills any the file predates
        # (additive evolution) — columnar, no row-at-a-time work.
        want = StructType(self.table_fields)
        target = to_arrow_schema(want)
        raw = pq.read_table(partition.path)
        have = {f.name: i for i, f in enumerate(raw.schema)}
        n = raw.num_rows
        arrays = []
        for field in target:
            if field.name in have:
                arrays.append(
                    raw.column(have[field.name]).cast(field.type)
                )
            else:
                arrays.append(pa.nulls(n, field.type))
        table = pa.table(arrays, schema=target)
        if partition.synth_change != "":
            ct = (
                pa.array([partition.synth_change] * n, pa.string())
                if partition.synth_change is not None
                else raw.column(have["_change_type"]).cast(pa.string())
            )
            table = table.append_column("_change_type", ct)
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
        """Table schema (from the newest manifest) + the feed columns
        (+ ``_change_type`` in CDF mode)."""
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
        if str(self.options.get("cdf", "false")).lower() == "true":
            cols += ", _change_type string"
        return f"{cols}, _version bigint, _operation string"

    def streamReader(self, schema) -> VersionedTableFeedReader:
        return VersionedTableFeedReader(self.options, schema)


def register(spark) -> None:
    spark.dataSource.register(VersionedTableFeedDataSource)


def read_feed(spark, root: str, cdf: bool = False):
    """The change-feed stream over a versioned table root. With
    ``cdf=True``, row-level Delta-CDF deltas instead of full snapshots
    (requires the table's commits to carry ``key_columns`` bookkeeping)."""
    register(spark)
    return (
        spark.readStream.format(FORMAT_NAME)
        .option("root", root)
        .option("cdf", "true" if cdf else "false")
        .load()
    )
