"""Source readers (SURVEY.md §2.1).

The reference's only source is a whole-workbook Excel read
(``/root/reference/data/etl.py:44-54``). Here the primary source is columnar
parquet (partition-prunable, predicate-pushdown-able); Excel/CSV/JSON are
adapters. All readers return *lazy* DataFrames — no materialization until an
action, the inverse of the reference's eager ``pd.read_excel``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

STAR_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)

#: All driver-generated tables, including extension tables.
ALL_TABLES = STAR_TABLES + ("events", "documents", "embeddings")


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Columnar scan. Catalyst pushes filters/pruning into this scan —
    the engine's answer to the reference's fail-fast existence check
    (etl.py:48-49) is Spark's AnalysisException on a missing path."""
    return spark.read.parquet(path)


def read_csv(spark: SparkSession, path: str, schema=None, header: bool = True) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan (write twin: sources/writers.py:write_orc) — same
    pushdown/pruning behavior as the parquet scan."""
    return spark.read.orc(path)


def read_excel(spark: SparkSession, path: str, sheet_name=0) -> DataFrame:
    """Excel adapter (reference etl.py:51 ``pd.read_excel``).

    Excel is a driver-side, whole-file format — inherently not
    distributable. Only appropriate for dimension-sized inputs; fact
    data at scale must arrive as parquet/CSV.

    Prefers ``pd.read_excel`` when an engine (openpyxl) is installed —
    maximum format fidelity; otherwise falls back to the engine's own
    STDLIB xlsx parser (``sources/xlsx.py``: zip + SpreadsheetML XML,
    shared strings, style-based date detection), which covers the data-
    table subset the reference workbook uses — LIVE Excel ingestion no
    longer env-gates on openpyxl (round 9; parser tested against
    hand-built workbooks in tests/test_xlsx.py)."""
    if not os.path.exists(path):
        raise FileNotFoundError(f"Source file not found: {path}")
    try:
        import pandas as pd

        pdf = pd.read_excel(path, sheet_name=sheet_name)
        return spark.createDataFrame(pdf)
    except ImportError:  # no openpyxl: use the stdlib SpreadsheetML parser
        from .xlsx import read_excel_native

        return read_excel_native(spark, path, sheet_name=sheet_name)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-generated table from `{sf_dir}/{name}.parquet`."""
    if name == "events":
        return load_events(spark, sf_dir)
    return read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))


#: normalize_event_ts sanity ceiling: 2200-01-01 in epoch-µs. A value whose
#: chosen interpretation lands beyond this is almost certainly a
#: misclassified precision and must fail loudly, not parse silently.
_TS_SANE_MAX_US = 7_258_118_400_000_000


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an epoch-long event-time column to a µs timestamp.

    The batch parquet reader (under ``nanosAsLong=true``) delivers the
    INT64 TIMESTAMP(NANOS) column as nanoseconds, while the file-stream
    source delivers it already in microseconds — the same file, two
    precisions. Magnitude disambiguates: anything ≥1e17 is nanoseconds
    and gets the integer ``div 1000`` truncation (float division would
    lose precision beyond double's 53-bit mantissa and round some
    microseconds differently from DuckDB). No-op if the column is
    already a timestamp.

    Supported epoch range (documented contract): ns instants from
    1973-03-03 (1e17 ns) through 2262 (int64 ns max), µs instants from
    1970 through 2200. Outside it the magnitude heuristic is ambiguous —
    an ns instant BEFORE 1973-03 has magnitude <1e17 and would silently
    parse as a µs instant ~1000× later, so any result past 2200
    (``_TS_SANE_MAX_US``) raises instead of misparsing. The residual
    blind spot (ns instants in 1970-Jan–Mar, which map under 2200) is
    accepted: event-time data predating 1973 is out of scope.
    """
    if dict(df.dtypes).get(col) != "bigint":
        return df
    micros = F.when(
        F.abs(F.col(col)) >= F.lit(10**17), F.expr(f"{col} div 1000")
    ).otherwise(F.col(col))
    checked = F.when(
        micros > F.lit(_TS_SANE_MAX_US),
        F.raise_error(
            F.concat(
                F.lit(
                    f"normalize_event_ts({col}): epoch value "
                ),
                F.col(col).cast("string"),
                F.lit(
                    " parses past year 2200 — likely a nanosecond instant "
                    "before 1973-03 misread as microseconds; supported "
                    "range is 1973-03..2200 (see docstring)"
                ),
            )
        ).cast("long"),
    ).otherwise(micros)
    return df.withColumn(col, F.timestamp_micros(checked))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`events` with ns-precision ``ts`` normalized to a Spark timestamp.

    The parquet stores INT64 TIMESTAMP(NANOS), which Spark's reader rejects
    unless ``spark.sql.legacy.parquet.nanosAsLong=true``; with it, ``ts``
    arrives as nanoseconds-since-epoch (long) and we truncate to µs — the
    same truncation DuckDB applies, so event-time semantics match the
    oracle exactly.
    """
    path = os.path.join(sf_dir, "events.parquet")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    try:
        df = spark.read.parquet(path)
    except Exception:
        # Fallback for sessions where the legacy conf cannot be set:
        # arrow-side cast ns→µs. Driver-memory bound — correctness scales
        # only; cluster deployments set the conf at session build.
        import pyarrow.parquet as pq

        tbl = pq.read_table(path)
        import pyarrow as pa

        schema = pa.schema(
            [
                pa.field(f.name, pa.timestamp("us") if pa.types.is_timestamp(f.type) else f.type)
                for f in tbl.schema
            ]
        )
        return spark.createDataFrame(tbl.cast(schema).to_pandas())
    return normalize_event_ts(df)


def load_star(spark: SparkSession, sf_dir: str, tables=ALL_TABLES) -> dict[str, DataFrame]:
    """Load the star schema as a dict catalog — the engine's equivalent of
    the reference's ``transformed_data`` dict-of-DataFrames
    (etl.py:38-40). Also registers temp views for spark.sql access."""
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
