"""Local mirror of the driver's t2 correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet dir,
then compare row count, column names, and exact values order-insensitively.

This is intentionally STRICTER than any value-hash: exact cell equality
(floats compared exactly — the plans' shared rounding contract must absorb
engine-order divergence, or this harness fails first, before the driver).
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(v):
    """Canonicalize a cell for exact comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"  # distinct sentinel: never conflate NaN with NULL
        if v == 0.0:
            return 0.0  # -0.0 == 0.0
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return _canon(v.item())
    except ImportError:
        pass
    return v


def _dtype_kind_problems(spark_df, con, sql, name) -> list[str]:
    try:
        s_pd = spark_df.toPandas()
        o_pd = con.execute(sql).df()
    except Exception as exc:  # pragma: no cover - diagnostics only
        return [f"{name}: pandas conversion failed ({exc!r})"]
    if len(s_pd) == 0 and len(o_pd) == 0:
        return []
    s_dtype = {c.lower(): s_pd[c].dtype for c in s_pd.columns}
    o_dtype = {c.lower(): o_pd[c].dtype for c in o_pd.columns}
    int_kinds = {"i", "u"}
    out = []
    for c, sd in s_dtype.items():
        od = o_dtype.get(c)
        if od is None:
            continue
        kinds = {sd.kind, od.kind}
        if "f" in kinds and kinds & int_kinds:
            out.append(
                f"{name}: pandas dtype kind differs on '{c}' "
                f"spark={sd} oracle={od} (driver value-hash would fail)"
            )
    return out


def _rows_to_multiset(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return out


def compare(spark_df, con, sql: str, name: str = "?") -> list[str]:
    """Returns a list of mismatch descriptions; empty list == parity."""
    problems: list[str] = []
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = [c.lower() for c in spark_df.columns]
    o = con.execute(sql)
    o_cols = [d[0].lower() for d in o.description]
    o_rows = o.fetchall()

    # The driver's value hash goes through pandas, where dtype leaks into
    # the hashed repr (DuckDB HUGEINT → float64 `1435.0` vs Spark int64
    # `1435` failed the round-1 gate while plain-Python compare passed:
    # `1435 == 1435.0`). Mirror that: flag int-kind vs float-kind per
    # column. Narrow on purpose — wider dtype classes (dates, strings)
    # canonicalize fine on the driver side.
    problems += _dtype_kind_problems(spark_df, con, sql, name)

    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"{name}: columns differ spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"{name}: row count spark={len(s_rows)} oracle={len(o_rows)}")
    sm = _rows_to_multiset(s_cols, s_rows)
    om = _rows_to_multiset(o_cols, o_rows)
    if sm != om:
        diff_s = [r for r in sm if r not in set(om)][:5]
        diff_o = [r for r in om if r not in set(sm)][:5]
        problems.append(
            f"{name}: value mismatch; spark-only(≤5)={diff_s} oracle-only(≤5)={diff_o}"
        )
    return problems
