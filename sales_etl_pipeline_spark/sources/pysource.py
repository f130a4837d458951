"""Custom Python DataSource (PySpark 4 ``pyspark.sql.datasource`` API) —
the connector-extension surface of the engine: how a user plugs a source
Spark has no built-in reader for (a bespoke service, a custom file
format, a synthetic generator) into the SAME DataFrame/Catalyst pipeline
as the parquet tables, batch AND streaming, without JVM code.

The reference's only source is a local Excel file read eagerly into
pandas (reference data/etl.py:44-54); this is the Spark-native answer to
"my data isn't in a supported format": implement `DataSource` once,
`spark.dataSource.register(...)`, then `spark.read.format(name)` /
`spark.readStream.format(name)` behave like any first-class source.

The concrete source here is a DETERMINISTIC synthetic event generator
(md5-derived fields, the engine's cross-engine hash convention —
functions.core.md5_long), which makes the connector itself
oracle-checkable: the exact same relation is computable in DuckDB from
``range()`` + md5 string math, so `synthetic_source_events` holds full
value parity like any other library plan — a correctness gate most
connectors never get.

Scale shape:
- Batch: `partitions()` splits the id range into contiguous slices — one
  per task, embarrassingly parallel, no driver materialization; each
  executor generates only its slice.
- Filter pushdown: `pushFilters` absorbs event_id range predicates into
  the slice bounds (generation is skipped entirely for pruned ids, the
  Python analog of parquet row-group pruning); unsupported filters are
  returned to Spark and evaluated post-scan as usual.
- Streaming: `DataSourceStreamReader` exposes monotone offsets over the
  id space (`{"i": n}`), so microbatches are replayable ranges —
  checkpoint/restart recovery works exactly as with the file source.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

FORMAT_NAME = "synthetic_events"
SCHEMA = "event_id bigint, user_id bigint, event_type string, value double, ts_sec bigint"
EVENT_TYPES = ("view", "click", "purchase", "signup", "error")
TS_BASE = 1_704_067_200  # 2024-01-01 00:00:00 UTC, epoch seconds
DEFAULT_ROWS = 10_000
DEFAULT_PARTITIONS = 8


def _md5_mod(i: int, tag: str, mod: int) -> int:
    """First 15 hex chars of md5(f"{i}#{tag}") mod ``mod`` — identical to
    the DuckDB expression CAST('0x'||substring(md5(i||'#tag'),1,15) AS
    BIGINT) % mod (same convention as functions.core.md5_long)."""
    h = hashlib.md5(f"{i}#{tag}".encode()).hexdigest()
    return int(h[:15], 16) % mod


def gen_row(i: int) -> tuple:
    """The deterministic row for id ``i`` (shared by batch and stream)."""
    return (
        i,
        _md5_mod(i, "u", 1000),
        EVENT_TYPES[_md5_mod(i, "t", len(EVENT_TYPES))],
        _md5_mod(i, "v", 100_000) / 100.0,
        TS_BASE + i,
    )


@dataclass
class _RangePartition(InputPartition):
    start: int
    end: int


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.rows = int(options.get("rows", DEFAULT_ROWS))
        self.num_partitions = int(options.get("partitions", DEFAULT_PARTITIONS))
        self.lo = 0
        self.hi = self.rows

    def pushFilters(self, filters):
        """Absorb event_id range/equality predicates into the generation
        bounds; everything else is returned for Spark to evaluate."""
        for f in filters:
            col = getattr(f, "attribute", None)
            if col == ("event_id",) or col == "event_id" or (
                isinstance(col, (list, tuple)) and list(col) == ["event_id"]
            ):
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, f.value + 1)
                    continue
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, f.value)
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, f.value)
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, f.value + 1)
                    continue
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, f.value)
                    self.hi = min(self.hi, f.value + 1)
                    continue
            yield f

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        n = max(1, min(self.num_partitions, hi - lo or 1))
        step = (hi - lo + n - 1) // n if hi > lo else 1
        return [
            _RangePartition(s, min(s + step, hi))
            for s in range(lo, hi, step)
        ] or [_RangePartition(lo, lo)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield gen_row(i)


class SyntheticEventsStreamReader(DataSourceStreamReader):
    """Offsets are positions in the id space: each microbatch covers
    [start.i, end.i) — deterministic, replayable ranges."""

    def __init__(self, options) -> None:
        self.rows = int(options.get("rows", DEFAULT_ROWS))
        self.num_partitions = int(options.get("partitions", DEFAULT_PARTITIONS))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def latestOffset(self) -> dict:
        # Bounded source: the whole id space is already "arrived", so the
        # high-watermark is self.rows and availableNow drains it in ONE
        # microbatch. An internal-state drain chunker (advance by N per
        # call) is deliberately NOT implemented: the Python stream API has
        # no admission control (no latestOffset(start, limit)), and
        # Spark's availableNow fallback for such sources captures
        # latestOffset() once — a chunked answer would silently truncate
        # the drain to the first chunk (measured: 500/2000 rows). An
        # unbounded feed would return its current external high-watermark
        # here, which is monotone and restart-safe by construction.
        return {"i": self.rows}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["i"], end["i"]
        n = max(1, min(self.num_partitions, hi - lo or 1))
        step = (hi - lo + n - 1) // n if hi > lo else 1
        return [
            _RangePartition(s, min(s + step, hi))
            for s in range(lo, hi, step)
        ] or [_RangePartition(lo, lo)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield gen_row(i)

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def streamReader(self, schema) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the source; afterwards
    ``spark.read.format("synthetic_events")`` works session-wide.
    Python-source filter pushdown is opt-in (Spark refuses to plan a
    reader that implements pushFilters while it is off), so enable it."""
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass  # pre-4.1 builds: reader works, pushdown just never fires
    spark.dataSource.register(SyntheticEventsDataSource)


def synthetic_source_events(spark, sf_dir: str):
    """Library plan: the custom connector read as a plain DataFrame —
    row count fixed at DEFAULT_ROWS so the DuckDB range() oracle matches
    at every sf (the connector doesn't depend on the corpus; ``sf_dir``
    is part of the plan signature contract)."""
    register(spark)
    return spark.read.format(FORMAT_NAME).option("rows", DEFAULT_ROWS).load()


#: library-tier plan registration (plans/__init__.py pulls these in)
QUERIES: dict = {}
ORACLE: dict = {}

_TYPES_SQL = "['" + "','".join(EVENT_TYPES) + "']"

#: DuckDB twin of gen_row() — the connector's correctness oracle
SYNTHETIC_SOURCE_SQL = f"""
    SELECT i AS event_id,
           CAST('0x' || substring(md5(CAST(i AS VARCHAR) || '#u'), 1, 15) AS BIGINT)
               % 1000 AS user_id,
           {_TYPES_SQL}[
               CAST(CAST('0x' || substring(md5(CAST(i AS VARCHAR) || '#t'), 1, 15) AS BIGINT)
                   % {len(EVENT_TYPES)} AS INTEGER) + 1] AS event_type,
           (CAST('0x' || substring(md5(CAST(i AS VARCHAR) || '#v'), 1, 15) AS BIGINT)
               % 100000) / 100.0 AS value,
           {TS_BASE} + i AS ts_sec
    FROM range(0, {DEFAULT_ROWS}) t(i)
"""

LIBRARY_QUERIES = {"synthetic_source_events": synthetic_source_events}
LIBRARY_ORACLE = {"synthetic_source_events": SYNTHETIC_SOURCE_SQL}
