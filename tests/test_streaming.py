"""Streaming jobs' correctness oracle is their batch twin: the availableNow
trigger processes the whole events table as one bounded stream, so the
memory-sink result must equal the batch plan's result exactly."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sales_etl_pipeline_spark.plans import eventplans  # noqa: E402
from sales_etl_pipeline_spark.streaming import jobs  # noqa: E402

SF = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_stream_tumbling_matches_batch(spark):
    events = jobs.read_events_stream(spark, SF)
    out = jobs.run_to_memory(
        jobs.stream_tumbling_counts(events), "t_tumbling", "complete"
    )
    batch = eventplans.event_tumbling_window(spark, SF)
    cols = ["window_start", "window_end", "event_type", "event_count", "total_value"]
    assert _rows(out, cols) == _rows(batch, cols)


def test_stream_sessionization_matches_batch(spark):
    events = jobs.read_events_stream(spark, SF)
    out = jobs.run_to_memory(
        jobs.stream_sessionization(events), "t_sessions", "complete"
    )
    batch = eventplans.event_sessionization(spark, SF)
    cols = ["user_id", "session_start", "session_end", "session_events"]
    assert _rows(out, cols) == _rows(batch, cols)


def test_stream_dedup_bounded_state(spark):
    events = jobs.read_events_stream(spark, SF)
    out = jobs.run_to_memory(jobs.stream_dedup(events), "t_dedup", "append")
    n_events = out.count()
    # event_id is unique in the source → dedup is the identity here; the
    # assertion pins the operator wiring (watermark + state eviction runs).
    from sales_etl_pipeline_spark.sources.readers import load_events

    assert n_events == load_events(spark, SF).count()
    assert out.select("event_id").distinct().count() == n_events
