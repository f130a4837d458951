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


def test_stream_sliding_matches_batch(spark):
    from pyspark.sql import functions as F

    from sales_etl_pipeline_spark.functions.core import DEC
    from sales_etl_pipeline_spark.sources.readers import load_events

    events = jobs.read_events_stream(spark, SF)
    out = jobs.run_to_memory(
        jobs.stream_sliding_counts(events), "t_sliding", "complete"
    )
    batch = (
        load_events(spark, SF)
        .groupBy(F.window("ts", "10 minutes", "5 minutes"))
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_count",
            "total_value",
        )
    )
    cols = ["window_start", "window_end", "event_count", "total_value"]
    assert _rows(out, cols) == _rows(batch, cols)


def test_stream_parquet_sink_checkpoint(spark, tmp_path):
    """File-sink path: append mode + checkpoint. With a bounded stream the
    final watermark never passes the last windows, so append emits a strict
    subset of the batch result — the assertion pins exactly that (whatever
    was finalized matches batch, nothing extra, checkpoint dir created)."""
    events = jobs.read_events_stream(spark, SF)
    out_dir = str(tmp_path / "out")
    query = (
        jobs.stream_tumbling_counts(events)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    written = spark.read.parquet(out_dir)
    batch = eventplans.event_tumbling_window(spark, SF)
    cols = ["window_start", "window_end", "event_type", "event_count", "total_value"]
    got, want = _rows(written, cols), _rows(batch, cols)
    assert len(got) > 0
    assert set(got) <= set(want)
    assert os.path.isdir(str(tmp_path / "ckpt"))


def test_stream_dedup_bounded_state(spark):
    events = jobs.read_events_stream(spark, SF)
    out = jobs.run_to_memory(jobs.stream_dedup(events), "t_dedup", "append")
    n_events = out.count()
    # event_id is unique in the source → dedup is the identity here; the
    # assertion pins the operator wiring (watermark + state eviction runs).
    from sales_etl_pipeline_spark.sources.readers import load_events

    assert n_events == load_events(spark, SF).count()
    assert out.select("event_id").distinct().count() == n_events


def test_stream_foreach_batch_idempotent_sink(spark, tmp_path):
    """foreachBatch epoch-keyed writes: the last epoch's directory holds the
    complete-mode aggregate, which must equal the batch twin exactly."""
    events = jobs.read_events_stream(spark, SF)
    epochs = jobs.run_foreach_batch_parquet(
        jobs.stream_tumbling_counts(events),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    assert epochs  # at least one microbatch ran
    written = spark.read.parquet(str(tmp_path / "out" / f"epoch={epochs[-1]}"))
    batch = eventplans.event_tumbling_window(spark, SF)
    cols = ["window_start", "window_end", "event_type", "event_count", "total_value"]
    assert _rows(written, cols) == _rows(batch, cols)


def test_stream_custom_sessions_match_batch(spark, tmp_path):
    """Custom EventTimeTimeout sessionization vs the native session_window
    batch twin: the events table is split into time-ordered chunks streamed
    one file per microbatch, so the watermark advances between batches and
    fires the event-time timers. Every finalized session must equal a batch
    session exactly; the unfinalized tail (watermark never passes the last
    sessions on a bounded stream) is the only allowed difference."""
    from sales_etl_pipeline_spark.sources.readers import (
        load_events,
        normalize_event_ts,
    )

    pdf = load_events(spark, SF).orderBy("ts").toPandas()
    pdf["ts"] = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    src = tmp_path / "evsplit"
    src.mkdir()
    step = (len(pdf) + 3) // 4
    for i in range(4):
        pdf.iloc[i * step : (i + 1) * step].to_parquet(
            str(src / f"part{i}.parquet"), index=False
        )

    raw = (
        spark.readStream.schema(jobs.EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = jobs.run_to_memory(
        jobs.stream_custom_sessions(normalize_event_ts(raw)),
        "t_custom_sessions",
        "update",
    )
    cols = ["user_id", "session_start", "session_end", "session_events"]
    got = set(_rows(out, cols))
    want = set(_rows(eventplans.event_sessionization(spark, SF), cols))
    assert got, "no sessions finalized — timers never fired"
    assert got <= want  # every finalized session is bit-equal to batch
    assert len(got) >= 0.5 * len(want)  # and most sessions DID finalize
