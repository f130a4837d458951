"""Oracle parity for the library-tier plans — the public-API plans kept out
of the driver's 50-entry registry (plans/__init__.py:48-61). Same compare()
harness as the driver-tier pre-flight (tests/test_oracle_parity.py); run at
sf0.01 via ``TEST_SF=/root/testdata/sf0.01 pytest tests/test_library_parity.py``.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sales_etl_pipeline_spark import plans  # noqa: E402
from tests.oracle_harness import compare, duckdb_connection  # noqa: E402

SF = os.environ.get("TEST_SF", "/root/testdata/sf0.001")

_QUERIES = plans.library_queries()
_ORACLES = plans.library_oracles()


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF)
    yield c
    c.close()


def test_every_library_oracle_has_query():
    assert set(_ORACLES) <= set(_QUERIES)


def test_library_tier_not_in_driver_registry():
    # A plan is either driver-checked or library-checked, never both.
    assert not set(_QUERIES) & set(plans.all_queries())


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_library_parity(spark, con, name):
    df = _QUERIES[name](spark, SF)
    if name not in _ORACLES:
        assert df.columns
        df.collect()
        return
    problems = compare(df, con, _ORACLES[name], name)
    assert not problems, "\n".join(problems)
