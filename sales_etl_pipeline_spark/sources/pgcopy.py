"""PostgreSQL bulk-COPY sink/source — the JDBC-free live-Postgres path
(reference sink K4, reference data/etl.py:305-332) for environments that
ship a Postgres server but no driver jar on the Spark classpath (this
container: ``initdb``/``pg_ctl``/``psql`` present, ``postgresql-*.jar``
absent — the round-12 env-gate note in COVERAGE.md).

Write path (``write_postgres_copy``): every PARTITION pipes its rows as
CSV into its own ``psql \\copy <table> FROM STDIN (FORMAT csv)``
subprocess inside ``mapInPandas`` — Arrow-batched ``pandas.to_csv``
encoding (no Python row loop), one COPY transaction per partition, all
partitions loading in parallel. That is exactly the shape a
1000-executor cluster uses against a real warehouse: per-executor
bulk-channel loads with NO driver staging; the only driver traffic is
one (partition, rows_written) row per partition, collected to report
the total. The reference's SQL-sink transforms apply: lowercase column
names (etl.py:328), optional 2-dp rounding of doubles (etl.py:356-357,
shared helpers with write_jdbc).

Read path (``read_postgres_copy``): one ``COPY (SELECT ...) TO STDOUT
(FORMAT csv, HEADER, NULL '\\N')`` into a staged local CSV, then a
schema'd ``spark.read.csv``. A single COPY TO is inherently one stream;
for parallel extraction pass ``split_predicates`` — one COPY subprocess
per predicate (the classic modulo/range split), one CSV part each, ONE
multi-file Spark scan. At warehouse scale the predicates align with the
table's partitioning so each stream is an index/partition scan.

NULL convention (documented contract): COPY runs with ``NULL '\\N'`` in
both directions and the CSV encoders use the same marker — SQL NULL
round-trips exactly; the pathological literal string ``\\N`` in a text
column is the one value this channel cannot distinguish (same limit as
every COPY-text pipeline; use the JDBC sink when that matters).

Auth: the psql argument vector carries host/port/user/dbname from the
``conninfo`` mapping; passwords ride the standard ``PGPASSWORD`` /
``.pgpass`` mechanisms — never on the command line.
"""

from __future__ import annotations

import os
import subprocess
import tempfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .writers import _lowercase_columns, _round_doubles

#: COPY NULL marker shared by both directions (see module docstring)
NULL_MARKER = r"\N"

#: Spark simpleString type → PostgreSQL column type (DDL for the
#: full-replace create; decimals keep precision/scale via startswith)
_PG_TYPES = {
    "tinyint": "SMALLINT",
    "smallint": "SMALLINT",
    "int": "INTEGER",
    "bigint": "BIGINT",
    "float": "REAL",
    "double": "DOUBLE PRECISION",
    "string": "TEXT",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
    "binary": "BYTEA",
}


def _pg_type(spark_type: str) -> str:
    if spark_type.startswith("decimal"):
        return spark_type.upper().replace("DECIMAL", "NUMERIC")
    try:
        return _PG_TYPES[spark_type]
    except KeyError:
        raise ValueError(
            f"no COPY-channel mapping for Spark type {spark_type!r} — "
            "flatten/serialize complex columns before the SQL sink "
            "(same contract as the JDBC sink)"
        ) from None


def _psql_argv(conninfo: dict) -> list[str]:
    argv = [conninfo.get("psql", "psql"), "-v", "ON_ERROR_STOP=1", "-q",
            "-X"]
    for flag, key in (("-h", "host"), ("-p", "port"), ("-U", "user"),
                      ("-d", "dbname")):
        if key in conninfo:
            argv += [flag, str(conninfo[key])]
    return argv


def _run_sql(conninfo: dict, sql: str) -> str:
    proc = subprocess.run(
        _psql_argv(conninfo) + ["-c", sql],
        capture_output=True, text=True,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"psql failed: {proc.stderr.strip()}")
    return proc.stdout


def write_postgres_copy(
    df: DataFrame,
    conninfo: dict,
    table: str,
    round_scale: int | None = None,
    create: bool = True,
) -> int:
    """Full-replace bulk load of ``df`` into ``table`` over the COPY
    protocol, one parallel COPY per partition (see module docstring).
    Returns the total rows written (observed by the load itself)."""
    out = _lowercase_columns(df)
    if round_scale is not None:
        out = _round_doubles(out, round_scale)
    if create:
        cols = ", ".join(
            f'"{name}" {_pg_type(dtype)}' for name, dtype in out.dtypes
        )
        _run_sql(conninfo, f'DROP TABLE IF EXISTS "{table}"')
        _run_sql(conninfo, f'CREATE TABLE "{table}" ({cols})')

    argv = _psql_argv(conninfo) + [
        "-c",
        f'\\copy "{table}" FROM STDIN WITH '
        f"(FORMAT csv, NULL '{NULL_MARKER}')",
    ]

    def load_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        proc = subprocess.Popen(
            argv, stdin=subprocess.PIPE, stderr=subprocess.PIPE, text=True
        )
        n = 0
        try:
            for pdf in batches:
                pdf.to_csv(
                    proc.stdin, header=False, index=False,
                    na_rep=NULL_MARKER,
                )
                n += len(pdf)
        finally:
            proc.stdin.close()
            err = proc.stderr.read()
            if proc.wait() != 0:
                raise RuntimeError(f"COPY FROM failed: {err.strip()}")
        yield pd.DataFrame({"rows_written": [n]})

    counts = out.mapInPandas(
        load_partition, "rows_written long"
    ).collect()  # bounded: one row per partition
    return int(sum(r.rows_written for r in counts))


def read_postgres_copy(
    spark: SparkSession,
    conninfo: dict,
    table: str,
    schema: str | None = None,
    split_predicates: list[str] | None = None,
    stage_dir: str | None = None,
) -> DataFrame:
    """Extract ``table`` over COPY TO into staged CSV part files and
    return a (schema'd if given, else header-inferred) Spark scan.
    ``split_predicates`` runs one parallel COPY stream per predicate —
    the predicates must partition the table (caller contract, like
    Spark's own JDBC partitionColumn bounds)."""
    stage = stage_dir or tempfile.mkdtemp(prefix=f"pgcopy_{table}_")
    os.makedirs(stage, exist_ok=True)
    preds = split_predicates or ["TRUE"]
    procs = []
    for i, pred in enumerate(preds):
        path = os.path.join(stage, f"part-{i:05d}.csv")
        sql = (
            f'\\copy (SELECT * FROM "{table}" WHERE {pred}) TO '
            f"'{path}' WITH (FORMAT csv, HEADER, NULL '{NULL_MARKER}')"
        )
        procs.append(
            (
                pred,
                subprocess.Popen(
                    _psql_argv(conninfo) + ["-c", sql],
                    stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
                    text=True,
                ),
            )
        )
    for pred, proc in procs:
        _, err = proc.communicate()
        if proc.returncode != 0:
            raise RuntimeError(
                f"COPY TO failed for predicate {pred!r}: {err.strip()}"
            )
    # RFC-4180 framing: COPY TO csv doubles embedded quotes and keeps
    # embedded newlines inside quoted fields — Spark needs escape='"'
    # (its default escape is backslash) and multiLine to parse both.
    # multiLine costs per-file (not per-line) input splits; parallelism
    # comes from the one-file-per-predicate staging, not line splits.
    reader = (
        spark.read.option("header", "true")
        .option("nullValue", NULL_MARKER)
        .option("escape", '"')
        .option("multiLine", "true")
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(stage)
