"""Event-time plans over the ``events`` table (batch-over-event-time; the
streaming variants live in sales_etl_pipeline_spark/streaming/).
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLE: dict[str, str] = {}
