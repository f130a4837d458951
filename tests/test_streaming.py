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


def test_stream_stream_join_matches_batch(spark):
    """Stream-stream self-join (watermarked click→purchase attribution):
    inner-join rows emit once both sides arrive, so the availableNow
    backfill must reproduce the batch interval join exactly."""
    events = jobs.read_events_stream(spark, SF)
    out = jobs.run_to_memory(
        jobs.stream_click_attribution(events), "t_attrib", "append"
    )
    batch = eventplans.event_attribution(spark, SF)
    cols = [
        "user_id",
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
        "lag_us",
    ]
    got = _rows(out, cols)
    assert len(got) > 0
    assert got == _rows(batch, cols)


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


def test_stream_stream_outer_join_matches_batch(spark):
    """LEFT OUTER stream-stream join: matched rows must equal the inner
    join exactly; NULL rows may only appear for clicks the batch
    anti-join also leaves unmatched (the tail — clicks whose window the
    bounded stream's final watermark never closed — is the only allowed
    shortfall), and at least some NULLs must finalize so the outer path
    is actually exercised."""
    from pyspark.sql import functions as F

    from sales_etl_pipeline_spark.sources.readers import load_events

    events = jobs.read_events_stream(spark, SF)
    out = jobs.run_to_memory(
        jobs.stream_click_attribution_outer(events), "t_attrib_outer", "append"
    ).collect()
    matched = {
        (r.user_id, r.click_id, r.purchase_id)
        for r in out
        if r.purchase_id is not None
    }
    nulls = {r.click_id for r in out if r.purchase_id is None}

    inner = {
        (r.user_id, r.click_id, r.purchase_id)
        for r in eventplans.event_attribution(spark, SF).collect()
    }
    assert matched == inner
    batch_matched_clicks = {c for _, c, _ in inner}
    all_clicks = {
        r.event_id
        for r in load_events(spark, SF)
        .filter(F.col("event_type") == "click")
        .collect()
    }
    batch_unmatched = all_clicks - batch_matched_clicks
    assert nulls, "no unmatched clicks finalized — outer path not exercised"
    assert nulls <= batch_unmatched
    assert not nulls & batch_matched_clicks


def test_stream_static_join_matches_batch(spark):
    """Stream-static enrichment: the event stream left-joined to the
    static per-user profile must equal the identical batch join — no
    state, no watermark, broadcast dimension."""
    from sales_etl_pipeline_spark.sources.readers import load_events

    profile = jobs.user_profile(spark, SF)
    events = jobs.read_events_stream(spark, SF)
    out = jobs.run_to_memory(
        jobs.stream_enrich_with_profile(events, profile), "t_enrich", "append"
    )
    batch = jobs.stream_enrich_with_profile(load_events(spark, SF), profile)
    cols = ["event_id", "user_id", "ts", "event_type", "signup_ts", "after_signup"]
    got = _rows(out, cols)
    assert len(got) > 0
    assert got == _rows(batch, cols)
    # enrichment happened (every sf0.001 user has a signup, so the NULL
    # branch of the left join is data-dependent — not asserted) and the
    # derived flag varies, so the join carried real values through
    assert any(r[4] is not None for r in got)
    assert {r[5] for r in got} == {True, False}


def test_stream_cdc_merge_snapshot_matches_batch(spark, tmp_path):
    """Streaming MERGE sink: the events changelog streamed in time-ordered
    chunks (one file per microbatch) through foreachBatch + merge_snapshot
    must leave the SAME snapshot on disk as the batch full recompute —
    inserts, updates, and tombstone deletes folded epoch by epoch."""
    from sales_etl_pipeline_spark.plans.cdc import cdc_latest_snapshot
    from sales_etl_pipeline_spark.sources.readers import (
        load_events,
        normalize_event_ts,
    )

    pdf = load_events(spark, SF).orderBy("ts").toPandas()
    pdf["ts"] = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    src = tmp_path / "evchunks"
    src.mkdir()
    step = (len(pdf) + 3) // 4
    for i in range(4):
        p = str(src / f"part{i}.parquet")
        pdf.iloc[i * step : (i + 1) * step].to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    raw = (
        spark.readStream.schema(jobs.EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    snap_dir = str(tmp_path / "snapshot")
    jobs.run_cdc_merge_stream(
        normalize_event_ts(raw), snap_dir, str(tmp_path / "ckpt")
    )
    got = spark.read.parquet(os.path.join(snap_dir, "live"))
    want = cdc_latest_snapshot(spark, SF)
    cols = [
        "user_id",
        "last_event_id",
        "last_ts",
        "last_event_type",
        "last_value",
    ]
    assert _rows(got, cols) == _rows(want, cols)


def test_stream_restart_recovery_from_checkpoint(spark, tmp_path):
    """Kill-and-resume: a second ``availableNow`` run over the SAME
    checkpoint must process only files added after the first run stopped —
    no reprocessing, no duplicate windows. This is the recovery contract a
    production deployment relies on (checkpoint = source offsets + sink
    commit log + watermark), exercised end-to-end with the parquet sink."""
    from sales_etl_pipeline_spark.sources.readers import (
        load_events,
        normalize_event_ts,
    )

    pdf = load_events(spark, SF).orderBy("ts").toPandas()
    pdf["ts"] = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    src = tmp_path / "evsrc"
    src.mkdir()
    step = (len(pdf) + 3) // 4
    paths = []
    for i in range(4):
        p = str(src / f"part{i}.parquet")
        pdf.iloc[i * step : (i + 1) * step].to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
        paths.append(p)
    # First run sees only the first two chunks.
    hidden = [p + ".later" for p in paths[2:]]
    for p, h in zip(paths[2:], hidden):
        os.rename(p, h)

    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run_once():
        raw = (
            spark.readStream.schema(jobs.EVENTS_RAW_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "*.parquet")
            .parquet(str(src))
        )
        q = (
            jobs.stream_tumbling_counts(normalize_event_ts(raw))
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()  # run 1: chunks 0-1, then the query stops (the "kill")
    first = set(
        tuple(r) for r in spark.read.parquet(out_dir).collect()
    )
    for p, h in zip(paths[2:], hidden):
        os.rename(h, p)
    run_once()  # run 2: resumes from checkpoint, sees only chunks 2-3

    cols = ["window_start", "window_end", "event_type", "event_count", "total_value"]
    written = spark.read.parquet(out_dir).select(*cols)
    got = [tuple(r) for r in written.collect()]
    # no duplicate windows despite the restart (append emitted each
    # finalized window exactly once across the two runs)
    keys = [(r[0], r[1], r[2]) for r in got]
    assert len(keys) == len(set(keys))
    # resumed run finalized MORE windows (watermark advanced past run 1's)
    assert len(got) > len(first) > 0
    # and every emitted window is bit-equal to the batch twin over ALL data
    want = set(_rows(eventplans.event_tumbling_window(spark, SF), cols))
    assert set(got) <= want


def test_stream_event_transitions_match_batch(spark, tmp_path):
    """Stateful incremental lag vs the batch event_transitions plan: the
    events table streams in 4 time-ordered chunks so the watermark
    advances between microbatches. Every emitted (from, to) pair must be
    one the batch lag relation also produces (per-key count inclusion),
    and most transitions must have finalized; the unfinalized tail (the
    watermark never passes the newest events of a bounded stream) is the
    only allowed shortfall."""
    from collections import Counter

    from sales_etl_pipeline_spark.sources.readers import (
        load_events,
        normalize_event_ts,
    )

    pdf = load_events(spark, SF).orderBy("ts").toPandas()
    pdf["ts"] = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    src = tmp_path / "evtrans"
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
        jobs.stream_event_transitions(normalize_event_ts(raw)),
        "t_transitions",
        "update",
    )
    got = Counter(
        (r.from_type, r.to_type)
        for r in out.select("from_type", "to_type").collect()
    )
    want = {
        (r.from_type, r.to_type): r.n_transitions
        for r in eventplans.event_transitions(spark, SF).collect()
    }
    assert got, "no transitions finalized — watermark never advanced"
    for k, n in got.items():
        assert k in want and n <= want[k], (k, n, want.get(k))
    assert sum(got.values()) >= 0.5 * sum(want.values())


def test_stream_custom_sessions_late_events_across_microbatches(spark, tmp_path):
    """Out-of-order events arriving in LATER microbatches, still inside the
    watermark: (a) an event earlier than the open session's start must
    extend the session backward (start = min(start, t)); (b) an event
    landing between two open sessions must merge them into one. Both match
    the batch session_window result exactly — this is the path the
    time-sorted chunk test never exercises."""
    import pandas as pd

    US = 1_000_000

    def ts(hhmm: str) -> int:  # µs since epoch for 2026-01-01 HH:MM
        return int(pd.Timestamp(f"2026-01-01 {hhmm}:00").value // 1000)

    # Watermark delay is 10 min, session gap 30 min. File boundaries chosen
    # so each late event is admitted (≥ watermark) when its batch runs:
    #   f0: u1@10:00                      → wm after f0 = 09:50
    #   f1: u1@09:55 (LATE, before the open session's start — backward
    #       extension), u2@10:00, u2@10:31 (two separate open sessions)
    #                                     → wm after f1 = 10:21
    #   f2: u2@10:25 (LATE, bridges u2's two open sessions into one)
    #   f3: u3@23:00 (advances wm to 22:50 → finalizes everything above)
    files = [
        [(1, ts("10:00"))],
        [(1, ts("09:55")), (2, ts("10:00")), (2, ts("10:31"))],
        [(2, ts("10:25"))],
        [(3, ts("23:00"))],
    ]
    src = tmp_path / "evlate"
    src.mkdir()
    for i, rows in enumerate(files):
        pdf = pd.DataFrame(
            {
                "event_id": range(i * 10, i * 10 + len(rows)),
                "ts": [t for _, t in rows],
                "user_id": [u for u, _ in rows],
                "event_type": "click",
                "value": 1.0,
                "props": "{}",
            }
        )
        path = str(src / f"part{i}.parquet")
        pdf.to_parquet(path, index=False)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))  # file order

    from sales_etl_pipeline_spark.sources.readers import normalize_event_ts

    raw = (
        spark.readStream.schema(jobs.EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = jobs.run_to_memory(
        jobs.stream_custom_sessions(normalize_event_ts(raw)),
        "t_custom_sessions_late",
        "update",
    )
    cols = ["user_id", "session_start", "session_end", "session_events"]
    got = set(_rows(out, cols))
    want = {
        # u1: {09:55, 10:00} → one session starting at the LATE event
        (1, pd.Timestamp("2026-01-01 09:55"), pd.Timestamp("2026-01-01 10:30"), 2),
        # u2: {10:00, 10:25, 10:31} → bridged into ONE session
        (2, pd.Timestamp("2026-01-01 10:00"), pd.Timestamp("2026-01-01 11:01"), 3),
        # u3's 23:00 session stays open (watermark never passes it)
    }
    assert got == want


def test_streaming_on_rocksdb_state_store(spark):
    """Run a stateful streaming job on the RocksDB state-store provider —
    the production backend for large state (the default in-memory
    HDFS-backed store keeps every key on-heap; RocksDB spills to local
    disk and bounds executor memory). The provider must produce the
    identical result to the batch twin, proving the jobs are not
    silently coupled to the default store."""
    provider_conf = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_conf, None)
    spark.conf.set(
        provider_conf,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        events = jobs.read_events_stream(spark, SF)
        out = jobs.run_to_memory(
            jobs.stream_tumbling_counts(events), "t_rocksdb", "complete"
        )
        batch = eventplans.event_tumbling_window(spark, SF)
        cols = [
            "window_start",
            "window_end",
            "event_type",
            "event_count",
            "total_value",
        ]
        assert _rows(out, cols) == _rows(batch, cols)
    finally:
        if old is None:
            spark.conf.unset(provider_conf)
        else:
            spark.conf.set(provider_conf, old)


def test_stream_dq_gate_rejects_empty_rules(spark, tmp_path):
    """An explicit rules={} must fail with a clear validation message at
    call time, not the confusing zero-arg F.concat() plan-build error."""
    import pytest

    from sales_etl_pipeline_spark.sources.readers import load_events

    with pytest.raises(ValueError, match="at least one rule"):
        jobs.run_dq_gate_stream(
            load_events(spark, SF), str(tmp_path / "o"),
            str(tmp_path / "c"), rules={},
        )


def test_stream_dq_gate_routes_and_reports(spark, tmp_path):
    """Streaming DQ gate: clean ∪ quarantine must PARTITION the input
    exactly (no loss, no duplication), quarantine rows carry the names of
    the rules they violate, and the per-epoch rule reports sum to the
    batch dq counts over the same data."""
    from pyspark.sql import functions as F

    from sales_etl_pipeline_spark.plans.validation import row_rule_report
    from sales_etl_pipeline_spark.sources.readers import (
        load_events,
        normalize_event_ts,
    )

    pdf = load_events(spark, SF).orderBy("ts").toPandas()
    pdf["ts"] = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    src = tmp_path / "dqchunks"
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
    out = str(tmp_path / "gated")
    epochs = jobs.run_dq_gate_stream(
        normalize_event_ts(raw), out, str(tmp_path / "dqckpt")
    )
    assert len(epochs) == 4  # one microbatch per chunk file

    batch = load_events(spark, SF)
    clean = spark.read.parquet(f"{out}/clean")
    quarantine = spark.read.parquet(f"{out}/quarantine")

    # exact partition of the input
    got_ids = sorted(
        r.event_id for r in clean.select("event_id").collect()
    ) + sorted(r.event_id for r in quarantine.select("event_id").collect())
    assert sorted(got_ids) == sorted(
        r.event_id for r in batch.select("event_id").collect()
    )

    # routing is exactly the rule disjunction; tags name the fired rule
    bad = batch.filter((F.col("value") < 0) | (F.col("event_type") == "error"))
    assert sorted(r.event_id for r in quarantine.collect()) == sorted(
        r.event_id for r in bad.collect()
    )
    assert all(
        "no_error_events" in r.violated_rules
        for r in quarantine.filter(F.col("event_type") == "error").collect()
    )

    # per-epoch reports sum to the batch report over the same rules
    reports = spark.read.parquet(f"{out}/report")
    summed = {
        r.rule_name: r.total
        for r in reports.groupBy("rule_name")
        .agg(F.sum("violation_count").alias("total"))
        .collect()
    }
    want = {
        r.rule_name: r.violation_count
        for r in row_rule_report(
            batch,
            "events",
            {
                "value_non_negative": F.col("value") < 0,
                "no_error_events": F.col("event_type") == "error",
            },
        ).collect()
    }
    assert summed == want
    assert want["no_error_events"] > 0  # the corpus really exercises the gate


def test_transform_with_state_matches_batch(spark):
    """transformWithStateInPandas (named typed state: MapState + ValueState
    per user) on RocksDB: counts are monotone across snapshot emissions,
    so max-per-(user,type) must equal the batch aggregate exactly, and
    the final per-user value totals match to accumulation order.

    ENV-GATED like the live-JDBC targets: the transformWithState protocol
    ships state over protobuf, and this container has no google.protobuf —
    the gap surfaces as an explicit SKIP, not silence."""
    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState needs protobuf (absent in container)",
    )
    from pyspark.sql import functions as F

    from sales_etl_pipeline_spark.sources.readers import load_events

    provider_conf = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_conf, None)
    spark.conf.set(
        provider_conf,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        events = jobs.read_events_stream(spark, SF)
        out = jobs.run_to_memory(
            jobs.stream_user_type_counts_tws(events), "t_tws", "update"
        )
        got_counts = {
            (r.user_id, r.event_type): r.n
            for r in out.groupBy("user_id", "event_type")
            .agg(F.max("n").alias("n"))
            .collect()
        }
        want_counts = {
            (r.user_id, r.event_type): r.n
            for r in load_events(spark, SF)
            .groupBy("user_id", "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got_counts == want_counts
        got_totals = {
            r.user_id: r.t
            for r in out.groupBy("user_id").agg(F.max("user_total").alias("t")).collect()
        }
        want_totals = {
            r.user_id: r.t
            for r in load_events(spark, SF)
            .groupBy("user_id")
            .agg(F.sum("value").alias("t"))
            .collect()
        }
        assert set(got_totals) == set(want_totals)
        for uid, t in want_totals.items():
            assert abs(got_totals[uid] - t) < 1e-6
    finally:
        if old is not None:
            spark.conf.set(provider_conf, old)
        else:
            spark.conf.unset(provider_conf)


def test_tws_processor_fold_logic_with_fake_state(spark):
    """Drive the transformWithState processor's fold through the SAME
    state interface with in-memory fakes (the protobuf runtime the real
    store needs is absent here): chunked per-user input must fold to the
    batch aggregate, with monotone snapshot emissions."""
    import pandas as pd

    class FakeValueState:
        def __init__(self):
            self._v = None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeMapState:
        def __init__(self):
            self._m = {}

        def containsKey(self, k):
            return k in self._m

        def getValue(self, k):
            return self._m[k]

        def updateValue(self, k, v):
            self._m[k] = v

        def iterator(self):
            return iter(sorted(self._m.items()))

    class FakeHandle:
        def getMapState(self, name, ks, vs, ttlDurationMs=None):
            return FakeMapState()

        def getValueState(self, name, s, ttlDurationMs=None):
            return FakeValueState()

    proc = jobs._make_user_type_counts_processor()()
    proc.init(FakeHandle())
    chunks = [
        pd.DataFrame({"event_type": ["view", "click", "view"], "value": [1.0, 2.0, 3.0]}),
        pd.DataFrame({"event_type": ["view"], "value": [4.0]}),
    ]
    first = list(proc.handleInputRows((7,), chunks[:1], None))[0]
    second = list(proc.handleInputRows((7,), chunks[1:], None))[0]
    got = {
        (r.user_id, r.event_type): (r.n, r.user_total)
        for r in second.itertuples()
    }
    assert got == {(7, "click"): (1, 10.0), (7, "view"): (3, 10.0)}
    # monotone: the first snapshot is dominated by the second
    prev = {
        (r.user_id, r.event_type): r.n for r in first.itertuples()
    }
    assert prev == {(7, "view"): 2, (7, "click"): 1}


def test_watermark_drops_late_rows_and_reports_metric(spark, tmp_path):
    """Late-data handling is observable, not silent: an event older than
    the watermark arriving in a later microbatch is excluded from its
    (already finalized) window, and the engine reports it in the state
    operator's numRowsDroppedByWatermark metric — what a production
    monitor alerts on."""
    import pandas as pd

    from sales_etl_pipeline_spark.sources.readers import (
        load_events,
        normalize_event_ts,
    )

    pdf = load_events(spark, SF).orderBy("ts").toPandas()
    pdf["ts"] = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    src = tmp_path / "latechunks"
    src.mkdir()
    # Three microbatches: state eviction lags a batch (a late row whose
    # window state still LIVES is aggregated in update mode, not
    # dropped), so the late replay must arrive after batch 1 advanced
    # the watermark and batch 1's commit evicted batch 0's windows.
    half = len(pdf) // 2
    p0 = str(src / "part0.parquet")
    pdf.iloc[:half].to_parquet(p0, index=False)
    p1 = str(src / "part1.parquet")
    pdf.iloc[half:].to_parquet(p1, index=False)
    late = pdf.iloc[[0]].copy()  # oldest event, replayed way too late
    late["event_id"] = 10_000_000
    p2 = str(src / "part2.parquet")
    late.to_parquet(p2, index=False)
    for i, p in enumerate((p0, p1, p2)):
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    raw = (
        spark.readStream.schema(jobs.EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        jobs.stream_tumbling_counts(normalize_event_ts(raw))
        .writeStream.format("memory")
        .queryName("t_late")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        op["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    assert dropped >= 1  # the late replay was dropped, and visibly so


def test_cdc_merge_recovers_from_crash_between_swap_renames(spark, tmp_path):
    """The snapshot swap is two renames; simulate a driver crash in the
    window between them (live already moved to old_epoch_*, staging not
    yet promoted) before the second half of the stream runs. The next
    run's recovery preamble must restore the newest old_epoch_* as live
    and re-merge the replayed epoch on top — ending with the snapshot
    the batch recompute produces, not one rebuilt from a single
    microbatch."""
    import shutil

    from sales_etl_pipeline_spark.plans.cdc import cdc_latest_snapshot
    from sales_etl_pipeline_spark.sources.readers import (
        load_events,
        normalize_event_ts,
    )

    pdf = load_events(spark, SF).orderBy("ts").toPandas()
    pdf["ts"] = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    src = tmp_path / "evchunks"
    src.mkdir()
    step = (len(pdf) + 3) // 4
    for i in range(2):
        p = str(src / f"part{i}.parquet")
        pdf.iloc[i * step : (i + 1) * step].to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    snap_dir = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")

    def _run():
        raw = (
            spark.readStream.schema(jobs.EVENTS_RAW_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        jobs.run_cdc_merge_stream(normalize_event_ts(raw), snap_dir, ckpt)

    _run()  # first half of the changelog is folded into live

    # simulate the crash window: live moved aside, promotion never ran;
    # leave a torn staging dir behind too, plus a STALE older old_epoch
    # whose number is lexicographically larger (9 > 10 as strings) —
    # recovery must restore the numerically newest
    live = os.path.join(snap_dir, "live")
    os.rename(live, os.path.join(snap_dir, "old_epoch_10"))
    os.makedirs(os.path.join(snap_dir, "old_epoch_9"))
    os.makedirs(os.path.join(snap_dir, "staging_epoch_10"))

    for i in range(2, 4):
        p = str(src / f"part{i}.parquet")
        pdf.iloc[i * step : (i + 1) * step].to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    _run()  # must recover, then fold the second half

    got = spark.read.parquet(live)
    want = cdc_latest_snapshot(spark, SF)
    cols = [
        "user_id",
        "last_event_id",
        "last_ts",
        "last_event_type",
        "last_value",
    ]
    assert _rows(got, cols) == _rows(want, cols)
    leftovers = [
        d for d in os.listdir(snap_dir) if d.startswith(("old_", "staging_"))
    ]
    assert leftovers == []
    shutil.rmtree(snap_dir)


def test_stream_bpe_tokenize_equals_batch(spark, tmp_path):
    """The trained tokenizer on the ingest stream: documents arrive in 3
    chunked microbatches, each leaves with its BPE segmentation attached
    — the union must equal the batch bpe_apply over the whole corpus
    exactly (pure projection ⇒ no state, no watermark, no reordering
    concerns)."""
    from sales_etl_pipeline_spark.plans import bpe
    from sales_etl_pipeline_spark.sources.readers import load_table

    merges, _ = bpe.train_bpe(spark, SF, 12)
    docs = load_table(spark, SF, "documents")
    pdf = docs.orderBy("doc_id").toPandas()
    src = tmp_path / "docchunks"
    src.mkdir()
    step = (len(pdf) + 2) // 3
    for i in range(3):
        pdf.iloc[i * step : (i + 1) * step].to_parquet(
            str(src / f"part{i}.parquet"), index=False
        )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = str(tmp_path / "tok")
    q = (
        jobs.stream_bpe_tokenize(stream, merges)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.doc_id: (list(r.bpe_tokens), r.n_bpe_tokens)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r.doc_id: (list(r.bpe_tokens), len(r.bpe_tokens))
        for r in bpe.bpe_apply(docs, "text", merges).collect()
    }
    assert got == want


def test_stream_quantile_digest_band_and_fold(spark, tmp_path):
    """Streaming quantile digest (jobs.stream_quantile_digest): the
    events table streams in 4 chunks; the LAST emitted estimate per
    (event_type, q) must satisfy the batch digest's 2/delta rank band
    against the exact per-type value distribution — the stream fold and
    the batch digest share one kernel (plans/quantiles._chunk_digest),
    so this is the stream ≡ batch gate stated as the band property a
    lossy summary supports."""
    import numpy as np

    from sales_etl_pipeline_spark.sources.readers import (
        load_events,
        normalize_event_ts,
    )

    pdf = load_events(spark, SF).orderBy("ts").toPandas()
    pdf["ts"] = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    src = tmp_path / "qdigest"
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
        jobs.stream_quantile_digest(normalize_event_ts(raw)),
        "t_qdigest",
        "update",
    )
    # update mode appends every emission; keep the LAST per (type, q).
    # The memory sink has no emission index, so re-read per key/q and
    # pick the final value via the batch count ordering: emissions per
    # key are one row per (q, update) — dedupe by taking each (key, q)'s
    # last occurrence in collection order (memory sink preserves
    # batch order).
    last = {}
    for r in out.collect():
        last[(r.event_type, r.q)] = r.value
    exact = {
        k: np.sort(g["value"].to_numpy(dtype="float64"))
        for k, g in load_events(spark, SF)
        .select("event_type", "value")
        .toPandas()
        .groupby("event_type")
    }
    assert {k for k, _ in last} == set(exact)
    eps = 2.0 / jobs.STREAM_DIGEST_DELTA
    for (etype, q), v in last.items():
        vals = exact[etype]
        lo = np.searchsorted(vals, v, side="left") / len(vals)
        hi = np.searchsorted(vals, v, side="right") / len(vals)
        r = (lo + hi) / 2
        if abs(r - q) <= eps:
            continue
        blo = float(np.quantile(vals, max(0.0, q - eps)))
        bhi = float(np.quantile(vals, min(1.0, q + eps)))
        tol = 1e-9 + 1e-3 * max(abs(blo), abs(bhi))
        assert blo - tol <= v <= bhi + tol, (etype, q, v, r)


def test_stream_sliding_quantile_digest_window_band(spark, tmp_path):
    """Sliding ring-of-digests: the LAST emission per (event_type, q)
    names its bucket-aligned window; the estimate must satisfy the
    2/delta band against the exact values of THAT window — proving
    eviction really narrowed the summary to the trailing buckets (an
    all-history digest would be badly off for a drifting stream; here
    we assert the window values themselves)."""
    import numpy as np
    import pandas as pd

    from sales_etl_pipeline_spark.sources.readers import (
        load_events,
        normalize_event_ts,
    )

    pdf = load_events(spark, SF).orderBy("ts").toPandas()
    pdf["ts"] = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    src = tmp_path / "sliding"
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
        jobs.stream_sliding_quantile_digest(normalize_event_ts(raw)),
        "t_sliding_digest",
        "update",
    )
    last = {}
    for r in out.collect():
        last[(r.event_type, r.q)] = (r.window_start, r.window_end, r.value)
    assert last, "no emissions"
    # fold-aware band: each incremental re-chunk of a bucket digest can
    # add up to 1/delta rank error (uniform-cap k0 digests have no
    # fold-free merge), so a bucket folded once per microbatch carries
    # <= n_chunks/delta, +1/delta for the ring merge +1/delta for the
    # midpoint interpolation — (4 + 2)/delta here. The all-history
    # stream test keeps the tighter 2/delta because its single digest
    # folds whole sorted batches (boundary blur only at batch seams).
    eps = (4 + 2) / jobs.STREAM_DIGEST_DELTA
    events = load_events(spark, SF).toPandas()
    events = events[events.value.notna()]  # the job folds non-null only
    checked = 0
    for (etype, q), (ws, we, v) in last.items():
        g = events[
            (events.event_type == etype)
            & (events.ts >= ws)
            & (events.ts < we)
        ]["value"].to_numpy(dtype="float64")
        assert len(g), (etype, ws, we)
        vals = np.sort(g)
        lo = np.searchsorted(vals, v, side="left") / len(vals)
        hi = np.searchsorted(vals, v, side="right") / len(vals)
        r = (lo + hi) / 2
        if abs(r - q) <= eps:
            checked += 1
            continue
        blo = float(np.quantile(vals, max(0.0, q - eps)))
        bhi = float(np.quantile(vals, min(1.0, q + eps)))
        tol = 1e-9 + 1e-3 * max(abs(blo), abs(bhi))
        assert blo - tol <= v <= bhi + tol, (etype, q, v, r)
        checked += 1
    assert checked == len(last)
    # TIME-based eviction: the window is exactly the trailing
    # RING_BUCKETS bucket slots behind the key's newest bucket —
    # recompute from the data (non-null values only, matching the job)
    bucket_us = jobs.SLIDING_BUCKET_MINUTES * 60 * 1_000_000
    ev_us = events.assign(
        us=events.ts.to_numpy().astype("datetime64[us]").astype("int64")
    )
    for (etype, q), (ws, we, v) in last.items():
        newest = int(ev_us[ev_us.event_type == etype].us.max() // bucket_us)
        floor_b = newest - jobs.SLIDING_RING_BUCKETS + 1
        assert ws == pd.Timestamp(floor_b * bucket_us, unit="us")
        assert we == pd.Timestamp((newest + 1) * bucket_us, unit="us")
        span_min = (we - ws).total_seconds() / 60
        assert span_min == (
            jobs.SLIDING_RING_BUCKETS * jobs.SLIDING_BUCKET_MINUTES
        )


def test_stream_paragraph_dedup_equals_batch(spark, tmp_path):
    """stream_paragraph_dedup over id-ordered document chunks ≡ the
    batch paragraph_dedup kept set, EXACTLY: the union of emitted rows
    equals the batch plan's first-occurrence rows (doc_id, piece_idx,
    win, ptext) — and the expression-level paragraph extraction agrees
    with curation._paragraphs' relational build."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sales_etl_pipeline_spark.plans import curation
    from sales_etl_pipeline_spark.sources.readers import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    pdf = docs.orderBy("doc_id").toPandas()
    src = tmp_path / "paradocs"
    src.mkdir()
    step = (len(pdf) + 3) // 4
    for i in range(4):
        pdf.iloc[i * step : (i + 1) * step].to_parquet(
            str(src / f"part{i}.parquet"), index=False
        )
    raw = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = jobs.run_to_memory(
        jobs.stream_paragraph_dedup(raw), "t_paradedup", "update"
    )
    got = {
        (r.doc_id, r.piece_idx, r.win, r.ptext) for r in out.collect()
    }
    para = curation._paragraphs(docs)
    w = Window.partitionBy("para_hash").orderBy(
        "doc_id", "piece_idx", "win"
    )
    want = {
        (r.doc_id, r.piece_idx, r.win, r.ptext)
        for r in para.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("doc_id", "piece_idx", "win", "ptext")
        .collect()
    }
    assert got == want and got


def test_stream_countmin_equals_batch(spark, tmp_path):
    """stream_countmin_sketch over a chunked document stream ≡ the
    batch countmin_sketch EXACTLY (linear counts; update-mode streaming
    aggregation): the final (r, cell) counts match bit-for-bit."""
    from sales_etl_pipeline_spark.plans import llmdata
    from sales_etl_pipeline_spark.sources.readers import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    pdf = docs.orderBy("doc_id").toPandas()
    src = tmp_path / "cmdocs"
    src.mkdir()
    step = (len(pdf) + 3) // 4
    for i in range(4):
        pdf.iloc[i * step : (i + 1) * step].to_parquet(
            str(src / f"part{i}.parquet"), index=False
        )
    raw = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = jobs.run_to_memory(
        jobs.stream_countmin_sketch(raw), "t_cmsketch", "complete"
    )
    got = {(r.r, r.cell): r.cnt for r in out.collect()}
    want = {
        (r.r, r.cell): r.cnt
        for r in llmdata.countmin_sketch(spark, SF).collect()
    }
    assert got == want and got


def test_stream_dsir_scores_equals_batch(spark, tmp_path):
    """stream_dsir_scores over id-ordered document chunks, joined to the
    batch-trained frozen model, ≡ the batch dsir_importance_weights rows
    EXACTLY (integer bits arithmetic end to end; one update-mode
    doc-grain aggregation)."""
    from sales_etl_pipeline_spark.plans import curation
    from sales_etl_pipeline_spark.sources.readers import load_table

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "text", "source"
    )
    model = curation.dsir_model(spark, SF).localCheckpoint()
    pdf = docs.orderBy("doc_id").toPandas()
    src = tmp_path / "dsirdocs"
    src.mkdir()
    step = (len(pdf) + 3) // 4
    for i in range(4):
        pdf.iloc[i * step : (i + 1) * step].to_parquet(
            str(src / f"part{i}.parquet"), index=False
        )
    raw = (
        spark.readStream.schema("doc_id long, text string, source string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = jobs.run_to_memory(
        jobs.stream_dsir_scores(raw, model), "t_dsir", "update"
    )
    got = {(r.doc_id, r.n_tokens, r.weight_bits) for r in out.collect()}
    want = {
        (r.doc_id, r.n_tokens, r.weight_bits)
        for r in curation.dsir_importance_weights(spark, SF).collect()
    }
    assert got == want and got


def test_stream_training_examples_equal_batch(spark, tmp_path):
    """stream_span_corruption / stream_sft_examples over id-ordered
    document chunks ≡ the batch plans EXACTLY — the stateless shared
    projection means the stream twin needs no state store at all."""
    from sales_etl_pipeline_spark.plans import assembly
    from sales_etl_pipeline_spark.sources.readers import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    pdf = docs.orderBy("doc_id").toPandas()
    src = tmp_path / "exdocs"
    src.mkdir()
    step = (len(pdf) + 3) // 4
    for i in range(4):
        pdf.iloc[i * step : (i + 1) * step].to_parquet(
            str(src / f"part{i}.parquet"), index=False
        )
    raw = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = jobs.run_to_memory(
        jobs.stream_span_corruption(raw), "t_spancor", "append"
    )
    got = {
        (r.doc_id, r.input_text, r.target_text, r.n_spans, r.n_masked)
        for r in out.collect()
    }
    want = {
        (r.doc_id, r.input_text, r.target_text, r.n_spans, r.n_masked)
        for r in assembly.span_corruption(spark, SF).collect()
    }
    assert got == want and got

    raw2 = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out2 = jobs.run_to_memory(
        jobs.stream_sft_examples(raw2), "t_sft", "append"
    )
    got2 = {
        (r.doc_id, r.rendered, r.loss_start, r.loss_end)
        for r in out2.collect()
    }
    want2 = {
        (r.doc_id, r.rendered, r.loss_start, r.loss_end)
        for r in assembly.sft_examples(spark, SF).collect()
    }
    assert got2 == want2 and got2


def test_stream_typo_normalize_equals_batch(spark, tmp_path):
    """stream_typo_normalize (frozen batch-trained canonical map as a
    per-row map-literal expression) over id-ordered chunks ≡ the batch
    text_typo_normalize rows EXACTLY."""
    from sales_etl_pipeline_spark.plans import fuzzy
    from sales_etl_pipeline_spark.sources.readers import load_table

    cmap = [
        (r.word, r.canonical)
        for r in fuzzy.typo_canonical_map(spark, SF).collect()
        if r.word != r.canonical
    ]
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    pdf = docs.orderBy("doc_id").toPandas()
    src = tmp_path / "typodocs"
    src.mkdir()
    step = (len(pdf) + 3) // 4
    for i in range(4):
        pdf.iloc[i * step : (i + 1) * step].to_parquet(
            str(src / f"part{i}.parquet"), index=False
        )
    raw = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = jobs.run_to_memory(
        jobs.stream_typo_normalize(raw, cmap), "t_typo", "append"
    )
    got = {
        (r.doc_id, r.normalized_text, r.n_tokens, r.n_changed)
        for r in out.collect()
    }
    want = {
        (r.doc_id, r.normalized_text, r.n_tokens, r.n_changed)
        for r in fuzzy.text_typo_normalize(spark, SF).collect()
    }
    assert got == want and got


def test_stream_media_fingerprints_equals_batch(spark, tmp_path):
    """Multimodal fingerprinting on the ingest stream: documents arrive
    in 3 chunked microbatches; the union of per-batch fingerprints must
    equal the batch kernel over the whole corpus exactly (stateless
    Arrow kernel ⇒ no state, no watermark, no reordering concerns)."""
    from pyspark.sql import functions as F

    from sales_etl_pipeline_spark.operators.multimodal import attach_media
    from sales_etl_pipeline_spark.plans import images
    from sales_etl_pipeline_spark.sources.readers import load_table

    docs = load_table(spark, SF, "documents")
    pdf = docs.orderBy("doc_id").toPandas()
    src = tmp_path / "mediachunks"
    src.mkdir()
    step = (len(pdf) + 2) // 3
    for i in range(3):
        pdf.iloc[i * step : (i + 1) * step].to_parquet(
            str(src / f"part{i}.parquet"), index=False
        )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = str(tmp_path / "fps")
    q = (
        jobs.stream_media_fingerprints(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "fpckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.img_id: (r.ahash_hex, r.dhash_hex, r.phash_hex)
        for r in spark.read.parquet(out).collect()
    }
    batch = images._fingerprints(
        attach_media(docs).select(
            F.col("doc_id").alias("img_id"),
            "payload",
            F.lit(None).cast("int").alias("perturb_block"),
        )
    )
    want = {
        r.img_id: (r.ahash_hex, r.dhash_hex, r.phash_hex)
        for r in batch.collect()
    }
    spark.catalog.clearCache()
    assert got == want and got


def test_stream_energy_and_frame_fingerprints_equal_batch(spark, tmp_path):
    """The r15 modality-stream symmetry: audio energy hashes and video
    frame fingerprints over 3 chunked microbatches must equal the batch
    passes exactly (both stateless — Arrow kernel / pure expressions)."""
    from pyspark.sql import functions as F

    from sales_etl_pipeline_spark.operators.multimodal import attach_media
    from sales_etl_pipeline_spark.plans import audio, video
    from sales_etl_pipeline_spark.sources.readers import load_table

    docs = load_table(spark, SF, "documents")
    pdf = docs.orderBy("doc_id").toPandas()
    src = tmp_path / "avchunks"
    src.mkdir()
    step = (len(pdf) + 2) // 3
    for i in range(3):
        pdf.iloc[i * step : (i + 1) * step].to_parquet(
            str(src / f"part{i}.parquet"), index=False
        )

    def run(job, outname):
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        out = str(tmp_path / outname)
        q = (
            job(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / (outname + "ck")))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out)

    corpus = attach_media(docs).select(
        F.col("doc_id").alias("img_id"),
        "payload",
        F.lit(None).cast("int").alias("perturb_block"),
    )
    got_e = {
        r.clip_id: r.ehash_hex
        for r in run(jobs.stream_energy_fingerprints, "efp").collect()
    }
    want_e = {
        r.clip_id: r.ehash_hex for r in audio._efingerprints(corpus).collect()
    }
    assert got_e == want_e and got_e
    got_f = {
        (r.clip_id, r.frame_idx): r.fhash_hex
        for r in run(jobs.stream_frame_fingerprints, "ffp").collect()
    }
    want_f = {
        (r.clip_id, r.frame_idx): r.fhash_hex
        for r in video._frame_fingerprints(corpus).collect()
    }
    assert got_f == want_f and got_f
    spark.catalog.clearCache()


def test_stream_interleaved_segments_equal_batch(spark, tmp_path):
    """The r16 multimodal-assembly stream twin: the interleaved
    segment layout over 3 chunked microbatches must equal the batch
    pass exactly (stateless pure expressions + one explode; the
    stateful packing stage's incremental shape is
    incremental_interleaved_fold, oracle-proven ≡ recompute)."""
    from sales_etl_pipeline_spark.plans import interleaved as I
    from sales_etl_pipeline_spark.sources.readers import load_table

    docs = load_table(spark, SF, "documents")
    pdf = docs.orderBy("doc_id").toPandas()
    src = tmp_path / "ilchunks"
    src.mkdir()
    step = (len(pdf) + 2) // 3
    for i in range(3):
        pdf.iloc[i * step : (i + 1) * step].to_parquet(
            str(src / f"part{i}.parquet"), index=False
        )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = str(tmp_path / "ilout")
    q = (
        jobs.stream_interleaved_segments(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ilck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.doc_id, r.seg_idx): (r.modality, r.start_tok, r.end_tok)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.doc_id, r.seg_idx): (r.modality, r.start_tok, r.end_tok)
        for r in I.mm_interleaved_spans(spark, SF).collect()
    }
    assert got == want and got
    spark.catalog.clearCache()


def test_stream_interleaved_pack_equals_batch(spark, tmp_path):
    """The STATEFUL streaming packing job: 3 chunked microbatches
    (doc_id order — the append-only ingest invariant) packed with
    per-source totals persisted between epochs must union to EXACTLY
    the batch mm_interleaved_packed_spans — the streaming form of the
    fold ≡ recompute proof. Also pins the carried state itself: the
    final epoch's totals equal the corpus totals."""
    from pyspark.sql import functions as F

    from sales_etl_pipeline_spark.plans import interleaved as I
    from sales_etl_pipeline_spark.sources.readers import load_table

    docs = load_table(spark, SF, "documents")
    pdf = docs.orderBy("doc_id").toPandas()
    src = tmp_path / "ipchunks"
    src.mkdir()
    step = (len(pdf) + 2) // 3
    for i in range(3):
        pdf.iloc[i * step : (i + 1) * step].to_parquet(
            str(src / f"part{i}.parquet"), index=False
        )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = tmp_path / "ipout"
    jobs.run_interleaved_pack_stream(
        stream, str(out), str(tmp_path / "ipck")
    )
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(str(out / "spans" / "epoch_*"))
        .select(
            "source", "window_id", "doc_id", "seg_idx", "modality",
            "start_tok", "end_tok", "loss_mask",
        )
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in I.mm_interleaved_packed_spans(spark, SF)
        .select(
            "source", "window_id", "doc_id", "seg_idx", "modality",
            "start_tok", "end_tok", "loss_mask",
        )
        .collect()
    )
    assert got == want and got
    # 3 epochs ran; the final state equals the corpus per-source totals
    import os

    epochs = sorted(os.listdir(out / "state"))
    assert len(epochs) == 3, epochs
    final_state = {
        r.source: r.base_tok
        for r in spark.read.parquet(
            str(out / "state" / epochs[-1])
        ).collect()
    }
    totals = {
        r.source: r.tot
        for r in I._doc_segments(spark, SF)
        .select("doc_id", "source", "total_tok")
        .distinct()
        .groupBy("source")
        .agg(F.sum("total_tok").alias("tot"))
        .collect()
    }
    assert final_state == totals
    spark.catalog.clearCache()
