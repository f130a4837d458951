from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sales_etl_pipeline_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


def executed_plan(df) -> str:
    """Executed-plan text for physical pin assertions (shared by
    tests/test_plans.py and tests/test_tpch_plans.py)."""
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", master=f"local[{os.environ.get('TEST_CPUS', '8')}]", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_correctness_dir():
    return SF_CORRECTNESS
