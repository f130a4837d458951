"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship 6-table star-join query at sf0.001.
``queries()`` — every implemented operator plan (SURVEY.md §2 inventory).
``oracle_sql()`` — DuckDB-equivalent SQL per query (hash-parity contract:
column names/aliases identical on both sides; monetary aggregates rounded
identically; see sales_etl_pipeline_spark/plans/*.py docstrings).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sales_etl_pipeline_spark import plans
from sales_etl_pipeline_spark.plans.analytics import regional_supplier_volume
from sales_etl_pipeline_spark.session import tune_session

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_session(spark)
    return regional_supplier_volume(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    wrapped = {}
    for name, fn in plans.all_queries().items():

        def _run(spark: SparkSession, sf_dir: str, _fn=fn) -> DataFrame:
            tune_session(spark)
            return _fn(spark, sf_dir)

        wrapped[name] = _run
    return wrapped


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per queries() key (omitted ⇒ rows-only)."""
    return plans.all_oracles()
