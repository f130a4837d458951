"""The pre-flight for the driver's t2 gate: every queries() entry that has
an oracle must match DuckDB exactly at sf0.001 (fast) — run sf0.01 via
``TEST_SF=/root/testdata/sf0.01 pytest tests/test_oracle_parity.py``.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tests.oracle_harness import compare, duckdb_connection  # noqa: E402

SF = os.environ.get("TEST_SF", "/root/testdata/sf0.001")

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF)
    yield c
    c.close()


def test_every_oracle_has_query():
    assert set(_ORACLES) <= set(_QUERIES)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and len(df.columns) > 0


def _assert_flat_schema(df, name):
    """Driver-harness compat (CORRECTNESS_r10 ERR: pandas sort_values
    cannot hash array cells): driver-tier plans must return only atomic
    top-level columns — serialize arrays (plans/bpe.py:_ids_as_str) for
    a driver twin and keep the array original at the library tier."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = [
        (f.name, f.dataType.simpleString())
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, f"{name}: complex top-level columns in driver tier {bad}"


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_parity(spark, con, name):
    df = _QUERIES[name](spark, SF)
    _assert_flat_schema(df, name)
    if name not in _ORACLES:
        # rows-only contract: must run and return a stable schema
        assert df.columns
        df.collect()
        return
    problems = compare(df, con, _ORACLES[name], name)
    assert not problems, "\n".join(problems)


def test_array_typed_bpe_plans_stay_library_tier():
    """The rotation policy must never promote the array-typed originals
    (the driver canonicalizer cannot hash complex cells — the r10 ERR);
    their *_str serialization twins may sit in EITHER tier (driver r11–
    r12, rotated to the library tier r13 as long-stable), but both tiers
    together must always carry them."""
    from sales_etl_pipeline_spark import plans

    driver = set(plans.all_queries())
    library = set(plans.library_queries())
    assert {"bpe_encoded_docs", "bpe_packed_windows"} <= library
    assert not {"bpe_encoded_docs", "bpe_packed_windows"} & driver
    assert {"bpe_encoded_docs_str", "bpe_packed_windows_str"} <= (
        driver | library
    )
