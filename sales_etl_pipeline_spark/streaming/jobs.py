"""Structured Streaming variants of the event-time plans (SURVEY.md §2.10:
the reference has no streaming at all — scope defined by BASELINE.json).

Each job is the SAME logical transform as its batch twin in
plans/eventplans.py — the DataFrame code is shared shape-for-shape, only the
source (``readStream``) and the watermark differ. Batch results are
therefore the streaming jobs' correctness oracle (see
tests/test_streaming.py).

Watermark policy (ours to define, SURVEY §7 hard-item 5): 10 minutes on
``events.ts``. With the file source + ``availableNow`` trigger these jobs
also serve as deterministic backfill runs; on a real cluster the source
swaps to Kafka/kinesis with no plan change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.core import DEC
from ..sources.readers import normalize_event_ts

WATERMARK = "10 minutes"

#: events.parquet physical schema under ``nanosAsLong`` (ts = ns since epoch).
EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table. Schema is explicit
    (streaming sources cannot infer), ts normalized ns→µs exactly as the
    batch reader does (sources/readers.py:load_events)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    # The file stream source requires a directory; narrow to the events
    # table with a glob filter (new matching files picked up per microbatch).
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # Same normalization as the batch reader — the file-stream source has
    # delivered this column as ns OR µs across Spark versions, so the shared
    # helper branches on magnitude instead of assuming a precision.
    return normalize_event_ts(raw)


def stream_tumbling_counts(events: DataFrame) -> DataFrame:
    """Streaming twin of eventplans.event_tumbling_window: late rows beyond
    the watermark are dropped; state per open window only."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "event_count",
            "total_value",
        )
    )


def stream_sliding_counts(events: DataFrame) -> DataFrame:
    """Streaming twin of eventplans.event_sliding_window's windowing
    (10-minute windows sliding every 5 — each event feeds two overlapping
    windows). Distinct aggregations are unsupported in streaming, so the
    streamable aggregates (count + exact-decimal sum) stand in for the
    batch plan's countDistinct; the test compares against an identically
    aggregated batch twin."""
    return (
        events.withWatermark("ts", WATERMARK)
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


def stream_sessionization(events: DataFrame) -> DataFrame:
    """Streaming twin of eventplans.event_sessionization: session_window
    state merges as events arrive; sessions finalize when the watermark
    passes their gap."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("session_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "session_events",
        )
    )


def stream_dedup(events: DataFrame) -> DataFrame:
    """Streaming dedup on event_id with bounded state:
    ``dropDuplicatesWithinWatermark`` ejects seen-keys once the watermark
    passes — the unbounded-state hazard of plain dropDuplicates in streams
    is the reason this variant exists."""
    return events.withWatermark("ts", WATERMARK).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


USER_TOTALS_OUTPUT = "user_id long, event_count long, total_value double"
USER_TOTALS_STATE = "event_count long, total_value double"


def stream_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running totals that survive across microbatches — the escape hatch for
    stateful logic no built-in aggregation expresses (here deliberately
    simple so the batch groupBy is its oracle; swap the update body for
    custom decay/alerting logic).

    State is one (count, total) pair per user — bounded by user
    cardinality, partitioned by the group key across executors; each
    microbatch ships only that user's new rows through Arrow.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def _update(key, pdfs, state):
        import pandas as pd

        count, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            count += len(pdf)
            total += float(pdf["value"].sum())
        state.update((count, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "event_count": [count],
                "total_value": [total],
            }
        )

    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            USER_TOTALS_OUTPUT,
            USER_TOTALS_STATE,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


QUANTILE_DIGEST_OUTPUT = (
    "event_type string, q double, value double"
)
QUANTILE_DIGEST_STATE = "means array<double>, weights array<double>"

#: centroid budget of the streaming digest state (rank error ≤ 2/delta,
#: same contract as the batch twin in plans/quantiles.py)
STREAM_DIGEST_DELTA = 64

#: quantile spine the streaming digest emits per update
STREAM_DIGEST_QS = (0.25, 0.5, 0.75, 0.95)


def stream_quantile_digest(
    events: DataFrame, delta: int = STREAM_DIGEST_DELTA
) -> DataFrame:
    """Streaming twin of ``plans/quantiles.quantile_digest``: a
    per-event-type mergeable quantile digest folded incrementally across
    microbatches with ``applyInPandasWithState``, emitting the current
    quantile estimates (q ∈ STREAM_DIGEST_QS) of ``value`` after every
    update — the always-on latency/size percentile monitor over an
    unbounded stream.

    State per key is the centroid relation itself (≤ ~2·delta means +
    weights — bounded regardless of stream length; the same digest the
    batch plan computes, so fold ≡ batch holds up to the documented
    2/delta rank band, pinned in tests/test_quantiles.py). Each update
    sorts the batch's values, chunks them into centroids
    (plans/quantiles._chunk_digest — shared kernel, one semantics), and
    re-chunks the union with the retained state. NoTimeout: digests
    summarize ALL history by design; pair with a windowed pre-filter
    upstream for sliding semantics."""
    import numpy as np

    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..plans.quantiles import (
        _chunk_digest,
        _merge_centroid_arrays,
        _spine_estimates,
    )

    def _update(key, pdfs, state):
        import pandas as pd

        if state.exists:
            means, weights = state.get
            means = np.asarray(means, dtype="float64")
            weights = np.asarray(weights, dtype="float64")
        else:
            means = np.array([])
            weights = np.array([])
        # buffer the trigger's values across Arrow chunks and fold ONCE
        # — the error contract is fold-depth-linear (see the sliding
        # twin's docstring), so folds must count triggers, not chunks
        chunks = []
        for pdf in pdfs:
            v = pdf["value"].to_numpy(dtype="float64")
            v = v[~np.isnan(v)]
            if len(v):
                chunks.append(v)
        if chunks:
            v = np.sort(np.concatenate(chunks))
            bm, bw = _chunk_digest(v, np.ones(len(v)), delta)
            means, weights = _merge_centroid_arrays(
                [means, bm], [weights, bw], delta
            )
        if not len(means):
            return
        state.update((means.tolist(), weights.tolist()))
        est = _spine_estimates(means, weights, STREAM_DIGEST_QS)
        yield pd.DataFrame(
            [(key[0], q, v) for q, v in zip(STREAM_DIGEST_QS, est)],
            columns=["event_type", "q", "value"],
        )

    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy("event_type")
        .applyInPandasWithState(
            _update,
            QUANTILE_DIGEST_OUTPUT,
            QUANTILE_DIGEST_STATE,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


SLIDING_DIGEST_OUTPUT = (
    "event_type string, window_start timestamp, window_end timestamp, "
    "q double, value double"
)
SLIDING_DIGEST_STATE = (
    "bucket_ids array<long>, means array<array<double>>, "
    "weights array<array<double>>"
)

#: sub-digest bucket width and ring size of the sliding digest (the
#: trailing window = RING_BUCKETS × BUCKET_MINUTES, bucket-aligned)
SLIDING_BUCKET_MINUTES = 30
SLIDING_RING_BUCKETS = 4


def stream_sliding_quantile_digest(
    events: DataFrame,
    delta: int = STREAM_DIGEST_DELTA,
    bucket_minutes: int = SLIDING_BUCKET_MINUTES,
    ring_buckets: int = SLIDING_RING_BUCKETS,
) -> DataFrame:
    """SLIDING-window streaming quantiles — the ring-of-mergeable-
    sketches pattern the digest's associative merge exists for: per
    event type, values fold into per-bucket sub-digests
    (``bucket = ts div bucket_minutes``); eviction is TIME-based —
    exactly the trailing ``ring_buckets`` bucket slots behind the
    newest bucket survive (bounded state: ≤ ring_buckets × ~2·delta
    centroids per key regardless of stream length; a sparse key's
    stale buckets are DROPPED, never smeared into the window) — and
    each update emits the quantile spine over the MERGE of the live
    ring: the trailing bucket-aligned window, the "p95 over the last
    2 hours, continuously" shape an ops dashboard asks of an
    unbounded stream.

    vs ``stream_quantile_digest``: that one summarizes ALL history (no
    eviction); this one forgets — eviction is what a windowed percentile
    needs, and per-bucket sub-digests are what make eviction possible
    for a non-invertible summary (you cannot subtract from a digest, so
    the window must be a union of retained parts). Emitted
    (window_start, window_end) name the exact bucket-aligned span so
    the batch gate can recompute the same window
    (tests/test_streaming.py).

    Error contract: the k0 digest's rank bound degrades LINEARLY with
    fold depth (each incremental re-chunk can blur one cap-weight
    boundary), so a bucket folded once per trigger carries
    ≤ triggers/delta and the emitted estimate ≤ (triggers + 2)/delta
    (ring merge + interpolation). Negligible at dashboard cadences
    (hourly triggers, delta 64 → well under 1%/day of drift per
    bucket lifetime, and buckets EXPIRE); raise delta for tighter
    bands."""
    import numpy as np

    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..plans.quantiles import (
        _chunk_digest,
        _merge_centroid_arrays,
        _spine_estimates,
    )

    bucket_us = bucket_minutes * 60 * 1_000_000

    def _update(key, pdfs, state):
        import pandas as pd

        ring: dict[int, tuple] = {}
        if state.exists:
            bids, means, weights = state.get
            for b, m, w in zip(bids, means, weights):
                ring[int(b)] = (
                    np.asarray(m, dtype="float64"),
                    np.asarray(w, dtype="float64"),
                )
        # buffer the trigger's values per bucket across Arrow chunks and
        # fold ONCE per (bucket, trigger) — the fold-depth error contract
        # counts triggers, not chunks
        pending: dict[int, list] = {}
        for pdf in pdfs:
            ts_us = (
                pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            )
            vals = pdf["value"].to_numpy(dtype="float64")
            ok = ~np.isnan(vals)
            ts_us, vals = ts_us[ok], vals[ok]
            if not len(vals):
                continue
            buckets = ts_us // bucket_us
            for b in np.unique(buckets):
                pending.setdefault(int(b), []).append(vals[buckets == b])
        for b, parts in pending.items():
            v = np.sort(np.concatenate(parts))
            bm, bw = _chunk_digest(v, np.ones(len(v)), delta)
            old = ring.get(b)
            if old is None:
                ring[b] = (bm, bw)
            else:
                ring[b] = _merge_centroid_arrays(
                    [old[0], bm], [old[1], bw], delta
                )
        if not ring:
            return
        # TIME-based eviction: keep exactly the trailing ring_buckets
        # bucket slots behind the newest bucket — a sparse key must not
        # smear days-old data into a "last 2 hours" window (the
        # count-based newest-N variant would)
        newest = max(ring)
        floor_b = newest - ring_buckets + 1
        live = sorted(b for b in ring if b >= floor_b)
        ring = {b: ring[b] for b in live}
        state.update(
            (
                [int(b) for b in live],
                [ring[b][0].tolist() for b in live],
                [ring[b][1].tolist() for b in live],
            )
        )
        m, w = _merge_centroid_arrays(
            [ring[b][0] for b in live], [ring[b][1] for b in live], delta
        )
        est = _spine_estimates(m, w, STREAM_DIGEST_QS)
        w_start = pd.Timestamp(floor_b * bucket_us, unit="us")
        w_end = pd.Timestamp((newest + 1) * bucket_us, unit="us")
        yield pd.DataFrame(
            [
                (key[0], w_start, w_end, q, v)
                for q, v in zip(STREAM_DIGEST_QS, est)
            ],
            columns=["event_type", "window_start", "window_end", "q", "value"],
        )

    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy("event_type")
        .applyInPandasWithState(
            _update,
            SLIDING_DIGEST_OUTPUT,
            SLIDING_DIGEST_STATE,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


CUSTOM_SESSION_OUTPUT = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "session_events long"
)
CUSTOM_SESSION_STATE = (
    "starts array<long>, lasts array<long>, cnts array<long>"
)
_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes, matches the batch twin


def stream_custom_sessions(events: DataFrame) -> DataFrame:
    """Custom stateful sessionization via ``applyInPandasWithState`` with
    **EventTimeTimeout** — reimplements ``session_window``'s merge
    semantics as explicit per-user state, the pattern for session logic
    the built-in operator cannot express (per-session custom aggregates,
    conditional merges, side outputs on close).

    State per user is the list of OPEN sessions (start, last-event, count
    triples) the watermark has not yet passed — not just the latest one,
    so out-of-order events across microbatches are handled exactly:
    a watermark-admitted event earlier than an open session's start
    extends it backward (start = min(start, t)), one more than a gap
    before every open session opens its own earlier session, and one
    bridging two open sessions merges them (interval union, identical to
    ``session_window``'s merge rule: windows [t, t+gap) merge iff they
    overlap, i.e. strictly t < last + gap).

    A session is emitted only when the watermark passes its end
    (watermark ≥ last + gap) — at that point no admissible event can
    still merge into it, so every emitted row matches the batch
    ``event_sessionization`` bit-for-bit (tests/test_streaming.py
    asserts the subset, including a late-event-in-later-microbatch
    case). ``state.setTimeoutTimestamp`` on the earliest open session
    end keeps eviction event-time-correct with bounded state (open
    sessions per user ≤ in-flight sessions inside one watermark delay).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def _update(key, pdfs, state):
        import pandas as pd

        gap = _SESSION_GAP_US
        sessions: list[list[int]] = []  # [start_us, last_us, cnt]
        if state.exists:
            starts, lasts, cnts = state.get
            sessions = [list(t) for t in zip(starts, lasts, cnts)]

        if not state.hasTimedOut:
            parts = list(pdfs)
            if parts:
                rows = pd.concat(parts, ignore_index=True)
                ts_us = (
                    rows["ts"].to_numpy().astype("datetime64[us]").astype("int64")
                )
                sessions.extend([int(t), int(t), 1] for t in ts_us)
            # Interval-union merge, the same rule session_window applies:
            # [t, t+gap) merges into [start, last+gap) iff t < last + gap.
            sessions.sort(key=lambda s: s[0])
            merged: list[list[int]] = []
            for s in sessions:
                if merged and s[0] < merged[-1][1] + gap:
                    merged[-1][1] = max(merged[-1][1], s[1])
                    merged[-1][2] += s[2]
                else:
                    merged.append(s)
            sessions = merged

        # Finalize: watermark ≥ session end ⇒ no admissible event (ts ≥
        # watermark) can still satisfy ts < last + gap.
        wm_us = state.getCurrentWatermarkMs() * 1000
        out = [
            (
                key[0],
                pd.Timestamp(start, unit="us"),
                pd.Timestamp(last + gap, unit="us"),
                cnt,
            )
            for start, last, cnt in sessions
            if last + gap <= wm_us
        ]
        keep = [s for s in sessions if s[1] + gap > wm_us]
        if keep:
            state.update(
                (
                    [s[0] for s in keep],
                    [s[1] for s in keep],
                    [s[2] for s in keep],
                )
            )
            # ceil to ms so the timer fires only once wm*1000 ≥ last+gap
            state.setTimeoutTimestamp(
                (min(s[1] for s in keep) + gap + 999) // 1000
            )
        else:
            state.remove()
        yield pd.DataFrame(
            out,
            columns=[
                "user_id",
                "session_start",
                "session_end",
                "session_events",
            ],
        )

    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            CUSTOM_SESSION_OUTPUT,
            CUSTOM_SESSION_STATE,
            "update",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


TRANSITION_OUTPUT = (
    "user_id long, from_type string, to_type string, trans_ts timestamp"
)
TRANSITION_STATE = (
    "tss array<long>, eids array<long>, etypes array<string>"
)


def stream_event_transitions(events: DataFrame) -> DataFrame:
    """Streaming twin of ``plans/eventplans.event_transitions``: emit
    each within-session (gap < 30 min) consecutive event-type pair as
    it becomes FINAL — the lag relation computed incrementally across
    microbatches with ``applyInPandasWithState`` + EventTimeTimeout.

    Finality rule: admitted events satisfy ts ≥ watermark, so the pair
    (a, b) of buffer-consecutive events is immutable once
    ``b.ts < watermark`` STRICTLY — no admissible event can still sort
    between a and b (an equal-ts event could tie-break by event_id,
    hence strict). Each call merges the batch's rows into the per-user
    buffer (sorted by (ts, event_id), the batch plan's window order),
    emits every final pair whose gap is under the session limit, and
    drops consumed predecessors immediately — retained state is only
    the events the watermark has not yet passed, plus ONE predecessor
    row per user (bounded: state ≤ in-flight events per watermark
    delay + 1). An event-time timer on the newest buffered event
    flushes the tail when the watermark moves without new data for the
    user. Emitted pairs match the batch plan's lag semantics
    bit-for-bit; tests pin multiset inclusion and coverage."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def _update(key, pdfs, state):
        import pandas as pd

        gap = _SESSION_GAP_US
        buf: list[tuple[int, int, str]] = []
        if state.exists:
            tss, eids, etypes = state.get
            buf = [
                (int(t), int(e), str(y))
                for t, e, y in zip(tss, eids, etypes)
            ]
        if not state.hasTimedOut:
            parts = list(pdfs)
            if parts:
                rows = pd.concat(parts, ignore_index=True)
                ts_us = (
                    rows["ts"].to_numpy().astype("datetime64[us]").astype("int64")
                )
                buf.extend(
                    (int(t), int(e), str(y))
                    for t, e, y in zip(
                        ts_us, rows["event_id"], rows["event_type"]
                    )
                )
        buf.sort()
        wm_us = state.getCurrentWatermarkMs() * 1000
        out = []
        while len(buf) >= 2 and buf[1][0] < wm_us:
            a, b = buf[0], buf[1]
            if b[0] - a[0] < gap:
                out.append(
                    (key[0], a[2], b[2], pd.Timestamp(b[0], unit="us"))
                )
            buf.pop(0)
        if buf:
            state.update(
                (
                    [e[0] for e in buf],
                    [e[1] for e in buf],
                    [e[2] for e in buf],
                )
            )
            if len(buf) >= 2:
                # fire once the watermark strictly passes the newest
                # buffered event (ms-ceil + 1 keeps it > current wm)
                state.setTimeoutTimestamp(buf[-1][0] // 1000 + 1)
        else:
            state.remove()
        yield pd.DataFrame(
            out, columns=["user_id", "from_type", "to_type", "trans_ts"]
        )

    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            TRANSITION_OUTPUT,
            TRANSITION_STATE,
            "update",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_click_attribution(events: DataFrame) -> DataFrame:
    """Watermarked stream-stream inner join — the streaming twin of
    plans/eventplans.event_attribution (click→purchase pairs within the
    attribution window, same user). Both sides are filtered projections
    of the same event stream (a stream-stream SELF-join); each carries
    its own watermark, and the join's time-range condition lets Spark
    bound state: a buffered click can be dropped once the watermark
    passes click_ts + window (no future purchase can match it), a
    buffered purchase once the watermark passes purchase_ts. Without the
    range condition the state store would grow without bound — the
    reason the batch plan's join condition is reused verbatim rather
    than re-filtered after a plain equi-join.

    Inner-join rows are emitted as soon as both sides arrive, so with
    the availableNow backfill trigger the materialized result equals the
    batch twin exactly (tests/test_streaming.py pins it)."""
    from ..plans.eventplans import (
        attribution_cond,
        attribution_output,
        attribution_sides,
    )

    clicks, purchases = attribution_sides(events)
    return attribution_output(
        clicks.withWatermark("click_ts", WATERMARK).join(
            purchases.withWatermark("purchase_ts", WATERMARK),
            attribution_cond(),
        )
    )


def run_foreach_batch_parquet(
    df: DataFrame, out_dir: str, checkpoint_dir: str
) -> list[int]:
    """``foreachBatch`` sink: the per-microbatch handler receives
    (batch_df, epoch_id) — the escape hatch for sinks Structured Streaming
    lacks natively (JDBC upserts, MERGE, multi-table transactional
    writes). Idempotence contract: the write is keyed on ``epoch_id``
    (one overwritten directory per epoch), so an epoch replayed after a
    crash between sink write and checkpoint commit overwrites its own
    partial output instead of duplicating it — the standard
    exactly-once-effect recipe on an at-least-once trigger. Returns the
    epoch ids processed."""
    seen: list[int] = []

    def _write(batch_df: DataFrame, epoch_id: int) -> None:
        seen.append(epoch_id)
        batch_df.write.mode("overwrite").parquet(
            f"{out_dir}/epoch={epoch_id}"
        )

    query = (
        df.writeStream.foreachBatch(_write)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return seen


def stream_click_attribution_outer(events: DataFrame) -> DataFrame:
    """LEFT OUTER stream-stream join — same pairing as
    ``stream_click_attribution`` but clicks that find NO purchase within
    the attribution window are still emitted (purchase columns NULL).
    The outer side makes the watermark semantics visible: a NULL row for
    a click can only be emitted once the watermark passes
    click_ts + window (before that a matching purchase could still
    arrive), so on a bounded availableNow run the final watermark leaves
    the tail's unmatched clicks unemitted — matched rows equal the inner
    join exactly, NULL rows are exactly the batch anti-join's clicks
    whose window the watermark closed (tests/test_streaming.py pins all
    three properties)."""
    from ..plans.eventplans import attribution_cond, attribution_sides

    clicks, purchases = attribution_sides(events, with_value=False)
    return (
        clicks.withWatermark("click_ts", WATERMARK)
        .join(
            purchases.withWatermark("purchase_ts", WATERMARK),
            attribution_cond(),
            "left_outer",
        )
        .select("user_id", "click_id", "click_ts", "purchase_id", "purchase_ts")
    )


def user_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static per-user dimension for stream enrichment: earliest signup
    time per user (batch aggregate over the events table — stands in for
    the user/account dimension a production pipeline would load)."""
    from ..sources.readers import load_events

    events = load_events(spark, sf_dir)
    return (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )


def stream_bpe_tokenize(
    docs: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Tokenize a DOCUMENT STREAM with a trained BPE merge list — the
    streaming half of the tokenizer story: train offline
    (plans/bpe.train_bpe — bounded driver-sequenced rounds, not a
    streaming shape), then apply on the ingest stream. ``bpe_apply`` is
    a pure per-row projection (chained replaces inside a transform
    lambda — no state, no shuffle, no watermark needed), so it is
    streaming-safe by construction and every arriving document leaves
    with its ``bpe_tokens`` and ``n_bpe_tokens`` attached in the same
    microbatch. tests/test_streaming.py pins stream ≡ the identical
    batch application."""
    from ..plans.bpe import bpe_apply

    return bpe_apply(docs, "text", merges).withColumn(
        "n_bpe_tokens", F.size("bpe_tokens")
    )


def stream_media_fingerprints(docs: DataFrame) -> DataFrame:
    """Perceptual fingerprinting on the INGEST stream — the multimodal
    twin of stream_bpe_tokenize: every arriving document's payload
    leaves with its (ahash, dhash, phash) hex in the same microbatch.
    attach_media is a pure projection and the fingerprint kernel is a
    STATELESS Arrow ``mapInPandas`` (no state, no shuffle, no
    watermark), so the job is streaming-safe by construction.
    tests/test_streaming.py pins stream ≡ the identical batch pass."""
    from ..operators.multimodal import attach_media
    from ..plans.images import _fingerprints

    media = attach_media(docs)
    return _fingerprints(
        media.select(
            F.col("doc_id").alias("img_id"),
            "payload",
            F.lit(None).cast("int").alias("perturb_block"),
        )
    )


def stream_interleaved_segments(docs: DataFrame) -> DataFrame:
    """Interleaved image-text segment layout on the INGEST stream — the
    multimodal-assembly twin (r16): the per-document layout
    (plans/interleaved.py:_segments_of) is pure column expressions plus
    one explode, stateless per document, so it is streaming-safe by
    construction; each document's ≤2m+1 segment rows leave in its
    arrival microbatch. The downstream PACKING stage is inherently
    stateful (per-source running token totals) — its incremental shape
    is the batch fold ``incremental_interleaved_fold``, which resumes
    from one bigint per source. tests/test_streaming.py pins stream ≡
    the identical batch layout."""
    from ..plans.interleaved import _segments_of

    return _segments_of(docs).select(
        "doc_id", "source", "seg_idx", "modality", "start_tok", "end_tok"
    )


def run_interleaved_pack_stream(
    docs: DataFrame, out_dir: str, checkpoint_dir: str
) -> None:
    """Stateful STREAMING packing — the stage
    ``stream_interleaved_segments``'s docstring defers to: documents
    arrive on an append-only ingest stream (in doc_id order per source,
    the same invariant the batch fold documents), each microbatch is
    laid out, placed CONTINUING from the persisted per-source running
    token totals, window-clipped and appended; the totals are the ONLY
    state — one bigint per source.

    Exactly-once-effect without locks, via epoch-keyed outputs (the
    foreachBatch idempotence device, simpler than run_cdc_merge_stream's
    rename-swap because packing state is append-only, never rewritten
    in place): epoch e OVERWRITES ``spans/epoch_e`` and
    ``state/epoch_e``, and reads its base from the newest state epoch
    STRICTLY BELOW e — so a replayed epoch recomputes from the same
    pre-epoch state and overwrites its own previous partial output.
    Single-writer assumed (one stream owns out_dir; the CDC job shows
    the fenced-lock upgrade if that ever needs enforcing).

    tests/test_streaming.py pins the union of all span epochs over 3
    chunked microbatches EXACTLY equal to the batch
    ``mm_interleaved_packed_spans`` — the streaming form of the
    fold ≡ recompute proof."""
    import shutil

    from ..plans.interleaved import (
        MM_PACK_WINDOW,
        _batch_totals,
        _clip_windows,
        _place_batch,
        _segments_of,
    )

    spark = docs.sparkSession
    state_root = os.path.join(out_dir, "state")
    spans_root = os.path.join(out_dir, "spans")

    def _epochs(root: str) -> list[int]:
        if not os.path.isdir(root):
            return []
        return sorted(
            int(d.split("_")[-1])
            for d in os.listdir(root)
            if d.startswith("epoch_")
        )

    def _pack(batch_df: DataFrame, epoch_id: int) -> None:
        segs = _segments_of(batch_df).localCheckpoint()
        prior = [e for e in _epochs(state_root) if e < epoch_id]
        base = (
            spark.read.parquet(
                os.path.join(state_root, f"epoch_{prior[-1]}")
            )
            if prior
            else None
        )
        placed = _place_batch(segs, base)
        _clip_windows(placed, MM_PACK_WINDOW).write.mode(
            "overwrite"
        ).parquet(os.path.join(spans_root, f"epoch_{epoch_id}"))
        delta = _batch_totals(segs).withColumnRenamed(
            "base_tok", "delta_tok"
        )
        if base is not None:
            new_state = base.join(delta, "source", "full_outer").select(
                "source",
                (
                    F.coalesce("base_tok", F.lit(0))
                    + F.coalesce("delta_tok", F.lit(0))
                ).alias("base_tok"),
            )
        else:
            new_state = delta.select(
                "source", F.col("delta_tok").alias("base_tok")
            )
        staging = os.path.join(state_root, f"staging_{epoch_id}")
        new_state.write.mode("overwrite").parquet(staging)
        final = os.path.join(state_root, f"epoch_{epoch_id}")
        # replayed epoch: drop its stale state snapshot before the swap
        shutil.rmtree(final, ignore_errors=True)
        os.rename(staging, final)

    query = (
        docs.writeStream.foreachBatch(_pack)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def stream_energy_fingerprints(docs: DataFrame) -> DataFrame:
    """Acoustic fingerprinting on the INGEST stream — the audio twin of
    stream_media_fingerprints (r15, completing the modality-stream
    symmetry): every arriving clip leaves with its energy-contour hex in
    the same microbatch. Stateless Arrow ``mapInPandas`` — no state, no
    shuffle, no watermark. tests/test_streaming.py pins stream ≡ the
    identical batch pass."""
    from ..operators.multimodal import attach_media
    from ..plans.audio import _efingerprints

    media = attach_media(docs)
    return _efingerprints(
        media.select(
            F.col("doc_id").alias("img_id"),
            "payload",
            F.lit(None).cast("int").alias("perturb_block"),
        )
    )


def stream_frame_fingerprints(docs: DataFrame) -> DataFrame:
    """Per-frame video fingerprinting on the INGEST stream — the video
    twin (r15): the fingerprint is PURE column expressions
    (plans/video.py — zero Python, whole-stage codegen), so it is
    streaming-safe by construction; each clip's 8 frame rows leave in
    its arrival microbatch. tests/test_streaming.py pins stream ≡ the
    identical batch pass."""
    from ..operators.multimodal import attach_media
    from ..plans.video import _frame_fingerprints

    media = attach_media(docs)
    return _frame_fingerprints(
        media.select(
            F.col("doc_id").alias("img_id"),
            "payload",
            F.lit(None).cast("int").alias("perturb_block"),
        )
    )


def stream_enrich_with_profile(events: DataFrame, profile: DataFrame) -> DataFrame:
    """Stream-static join: enrich the event stream against a static (or
    slowly-refreshed) dimension — the third join mode Structured
    Streaming supports besides stream-stream and aggregation, and the
    everyday one (fact stream × dimension snapshot). The static side is
    re-planned every microbatch, so a dimension table that is overwritten
    between batches is picked up without restarting the query; broadcast
    keeps the join map-side (no stream-side shuffle, no state store —
    unlike the stream-stream join there is nothing to watermark or
    evict). Left join keeps pre-signup/no-signup events with NULL
    enrichment. tests/test_streaming.py pins stream ≡ the identical
    batch join."""
    return (
        events.join(F.broadcast(profile), "user_id", "left")
        .select(
            "event_id",
            "user_id",
            "ts",
            "event_type",
            "signup_ts",
            (F.col("ts") >= F.col("signup_ts")).alias("after_signup"),
        )
    )


#: snapshot writer-lock file name (single-writer contract, see below)
CDC_LOCK_FILE = "_writer.lock"


def _acquire_cdc_lock(snapshot_dir: str, force: bool = False) -> str:
    """Claim exclusive write ownership of a CDC snapshot directory.

    The two-rename swap in run_cdc_merge_stream is correct ONLY
    single-writer: two concurrent merge streams would interleave their
    live→old / staging→live renames and leave the snapshot at one
    writer's epoch with the other's updates silently lost (or no live
    dir at all). This lock makes the contract explicit and a violation
    LOUD: creation is O_CREAT|O_EXCL (atomic on POSIX), the payload
    carries a per-writer token + pid, and a second writer raises
    instead of corrupting the swap.

    A crashed writer leaves its lock behind; pass ``force=True`` (a
    deliberate operator action, not a default) to break it after
    confirming the owner is dead. Returns the owner token; pair with
    ``_check_cdc_lock`` (per-epoch ownership re-check) and
    ``_release_cdc_lock``."""
    import json
    import uuid

    os.makedirs(snapshot_dir, exist_ok=True)
    lock = os.path.join(snapshot_dir, CDC_LOCK_FILE)
    token = uuid.uuid4().hex
    payload = json.dumps({"token": token, "pid": os.getpid()})
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        if not force:
            try:
                with open(lock) as f:
                    holder = f.read()
            except OSError:
                holder = "<unreadable>"
            raise RuntimeError(
                f"snapshot {snapshot_dir} already has a live writer "
                f"({holder}); a second concurrent merge stream would "
                "corrupt the two-rename swap. If the holder crashed, "
                "re-run with force_lock=True."
            )
        os.remove(lock)
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    with os.fdopen(fd, "w") as f:
        f.write(payload)
    return token


def _check_cdc_lock(snapshot_dir: str, token: str) -> None:
    """Writer-epoch fencing: re-verify lock ownership before a swap. If a
    second writer force-took the lock, THIS writer is the stale one and
    must stop mutating the snapshot."""
    import json

    lock = os.path.join(snapshot_dir, CDC_LOCK_FILE)
    try:
        with open(lock) as f:
            data = json.load(f)
    except (OSError, ValueError):
        raise RuntimeError(
            f"snapshot writer lock at {lock} missing or unreadable — "
            "ownership was broken by another writer; aborting before "
            "corrupting the swap"
        )
    if data.get("token") != token:
        raise RuntimeError(
            f"snapshot writer lock at {lock} now belongs to another "
            "writer (force-taken); this stream is fenced off"
        )


def _release_cdc_lock(snapshot_dir: str, token: str) -> None:
    """Drop the lock iff still owned (a force-taker's lock is left alone)."""
    import json

    lock = os.path.join(snapshot_dir, CDC_LOCK_FILE)
    try:
        with open(lock) as f:
            if json.load(f).get("token") == token:
                os.remove(lock)
    except (OSError, ValueError):
        pass


def run_cdc_merge_stream(
    events: DataFrame,
    snapshot_dir: str,
    checkpoint_dir: str,
    force_lock: bool = False,
) -> None:
    """Streaming MERGE sink: maintain a latest-wins snapshot table from
    the changelog stream via ``foreachBatch`` + ``plans.cdc.merge_snapshot``
    — the streaming form of ``cdc_incremental_merge``, and the concrete
    use of the foreachBatch escape hatch the run_foreach_batch_parquet
    docstring points at (MERGE is not a native streaming sink).

    SINGLE-WRITER CONTRACT: exactly one merge stream may own a snapshot
    directory at a time — the two-rename swap is not safe under
    concurrent writers. The contract is enforced, not just documented: a
    writer lock is claimed before the query starts (second writer raises
    immediately), ownership is re-verified before every epoch's swap
    (writer fencing — a force-taken lock stops the stale writer), and
    the lock is released on completion. ``force_lock=True`` breaks a
    crashed writer's leftover lock; tests/test_cdc.py pins all three
    behaviors.

    Each microbatch reads the current snapshot parquet (empty on first
    epoch), merges the batch's changelog rows (insert/update/delete in
    one ranked-window pass), and atomically replaces the snapshot via
    write-to-staging + rename. Correctness leans on the same invariant
    as the batch MERGE (delta event-time ≥ base event-time — file
    streams deliver whole files, and merge_snapshot reduces latest-wins
    within the batch too, so intra-batch disorder is fine). Idempotence:
    replaying an epoch re-merges rows already folded into the snapshot —
    latest-wins is idempotent under replay (same key, same ts, same
    event wins again), so an at-least-once trigger yields
    exactly-once-effect state. tests/test_streaming.py pins the final
    snapshot equal to the batch ``cdc_latest_snapshot``."""
    import shutil

    from ..plans.cdc import _latest_wins, merge_snapshot

    spark = events.sparkSession
    live = os.path.join(snapshot_dir, "live")

    def _side_dirs(prefix: str) -> list[str]:
        """Epoch dirs sorted by NUMERIC epoch (lexicographic order would
        rank old_epoch_9 above old_epoch_10)."""
        if not os.path.isdir(snapshot_dir):
            return []
        names = [d for d in os.listdir(snapshot_dir) if d.startswith(prefix)]
        names.sort(key=lambda d: int(d[len(prefix):]))
        return [os.path.join(snapshot_dir, d) for d in names]

    def _recover() -> None:
        """The swap is two renames (live→old, staging→live) and cannot be
        atomic on a filesystem without exchange; make it CRASH-SAFE
        instead by re-establishing the invariant before every merge. If
        ``live`` is missing, a crash hit the window between the renames —
        restore the newest ``old_epoch_*`` (pre-epoch state; the replayed
        epoch re-merges on top, and latest-wins is idempotent). Leftover
        old/staging dirs in every other state are post-commit or torn
        pre-commit garbage — delete them."""
        if not os.path.isdir(live):
            olds = _side_dirs("old_epoch_")
            if olds:
                os.rename(olds[-1], live)
        for d in _side_dirs("old_epoch_") + _side_dirs("staging_epoch_"):
            shutil.rmtree(d, ignore_errors=True)

    token = _acquire_cdc_lock(snapshot_dir, force=force_lock)

    def _merge(batch_df: DataFrame, epoch_id: int) -> None:
        _check_cdc_lock(snapshot_dir, token)
        _recover()
        if os.path.isdir(live):
            base = spark.read.parquet(live)
            merged = merge_snapshot(base, batch_df)
        else:
            merged = _latest_wins(batch_df)
        staging = os.path.join(snapshot_dir, f"staging_epoch_{epoch_id}")
        merged.write.mode("overwrite").parquet(staging)
        # fencing re-check right before the swap: the write above is the
        # epoch's long pole, so this closes most of the takeover window
        _check_cdc_lock(snapshot_dir, token)
        old = os.path.join(snapshot_dir, f"old_epoch_{epoch_id}")
        if os.path.isdir(live):
            os.rename(live, old)
        os.rename(staging, live)
        if os.path.isdir(old):
            shutil.rmtree(old)

    try:
        query = (
            events.writeStream.foreachBatch(_merge)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        _release_cdc_lock(snapshot_dir, token)


def run_cdc_merge_stream_versioned(
    events: DataFrame,
    table_root: str,
    checkpoint_dir: str,
    writer: str = "cdc_merge",
) -> None:
    """The CDC merge sink on the VERSIONED table format
    (``sources/table.VersionedTable``) — the production-shaped upgrade of
    ``run_cdc_merge_stream``'s two-rename swap. Each microbatch merges
    the changelog rows into the latest snapshot version and commits the
    result as the NEXT version via the manifest log's atomic O_EXCL
    create. What the format buys over the rename dance:

    - **Readers never race the writer**: a reader resolves a committed
      manifest and reads only its immutable files — there is no window
      where ``live`` doesn't exist.
    - **Multi-writer safe by construction**: a concurrent writer's
      commit loses the manifest CAS and retries on the new base
      (optimistic concurrency) instead of interleaving renames; no lock
      file needed.
    - **Replay idempotence is exact, not semantic**: each commit records
      (writer, epoch); a replayed foreachBatch epoch finds its prior
      commit in the log and SKIPS, rather than relying on latest-wins
      re-merging to the same answer. ``writer`` must therefore be UNIQUE
      per logical stream — two different streams sharing a writer name
      would mistake each other's epochs for their own replays.
    - **Time travel + audit**: every epoch's snapshot stays readable at
      its version until ``vacuum`` reclaims it.

    tests/test_table.py pins final state ≡ batch cdc_latest_snapshot
    over a chunked stream, per-epoch time travel, and replay skip.
    """
    from ..plans.cdc import _latest_wins, merge_snapshot
    from ..sources.table import VersionedTable

    spark = events.sparkSession
    table = VersionedTable(spark, table_root)

    def _merge(batch_df: DataFrame, epoch_id: int) -> None:
        table.merge_commit(
            lambda base: (
                _latest_wins(batch_df)
                if base is None
                else merge_snapshot(base, batch_df)
            ),
            writer=writer,
            epoch=epoch_id,
        )

    query = (
        events.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def _sql_key_literal(v) -> str:
    """A deletion key as a safe Spark-SQL literal: numbers verbatim,
    strings single-quoted with BOTH backslash and quote escaped —
    Spark's default parser (escapedStringLiterals=false) treats ``\\``
    as an escape inside string literals, so '' doubling alone would let
    a key like ``a\\') OR (1=1) --`` break out of the literal (SQL
    injection via the deletion queue) and a trailing backslash would
    produce an unterminated literal.

    Non-finite floats are rejected up front (ADVICE r10): ``repr(nan)``/
    ``repr(inf)`` are bare identifiers Spark would parse as COLUMN
    REFERENCES — the predicate would fail with AnalysisException at
    best, silently resolve against a like-named column at worst."""
    import math

    if isinstance(v, bool) or v is None:
        raise ValueError(f"unsupported deletion-key literal: {v!r}")
    if isinstance(v, float) and not math.isfinite(v):
        raise ValueError(f"non-finite deletion-key literal: {v!r}")
    if isinstance(v, (int, float)):
        return repr(v)
    s = str(v).replace("\\", "\\\\").replace("'", "\\'")
    return f"'{s}'"


def _collect_epoch_keys(batch_df: DataFrame, key_col: str) -> list:
    """One epoch's distinct non-null deletion keys — request-grain
    driver traffic by the erasure-queue contract (humans and
    regulators generate deletion requests, not pipelines)."""
    return [
        r[0]
        for r in batch_df.select(key_col).distinct().collect()
        if r[0] is not None
    ]


def run_retention_delete_stream(
    requests: DataFrame,
    table_root: str,
    checkpoint_dir: str,
    key_col: str,
    writer: str = "retention_delete",
    key_columns: tuple[str, ...] = (),
    stat_columns: tuple[str, ...] = (),
    bloom_columns: tuple[str, ...] = (),
) -> None:
    """Streaming retention/erasure applier: a stream of deletion
    REQUESTS (one column ``key_col`` naming rows to erase — the GDPR
    right-to-be-forgotten queue shape) is applied to a
    ``VersionedTable`` as one copy-on-write ``delete_where`` commit per
    microbatch.

    Scale contract: the erasure queue is REQUEST-grain (humans and
    regulators generate it), orders of magnitude smaller than the table
    it erases from — so collecting one epoch's distinct keys to build
    the IN-list predicate is bounded driver traffic by construction,
    while the deletion itself stays file-grain copy-on-write (only
    files containing a requested key are rewritten; the batch's
    [min, max] key range pre-prunes via manifest stats). What must NOT
    happen at 100 TB — rewriting the whole table per epoch — is
    structurally impossible here: untouched files carry forward by
    reference.

    Exactly-once effect: ``delete_where`` records (writer, epoch) in
    the commit, so a replayed epoch (restart mid-stream, fresh
    checkpoint over the same queue) skips idempotently. Empty/no-match
    epochs commit nothing. With ``key_columns`` set on the table, every
    erased row rides the change feed as a ``_change_type='delete'`` CDF
    row — the downstream-propagation hook an erasure pipeline needs.
    ``key_columns`` / ``stat_columns`` / ``bloom_columns`` configure the
    table handle this job commits through (they are handle attributes,
    not table state): pass the same values the table's primary writer
    uses so erasure commits keep recording CDF rows, file stats, and
    bloom filters — otherwise every rewritten file silently loses its
    skipping metadata and point-lookup pruning degrades per epoch.
    """
    from ..sources.table import VersionedTable

    spark = requests.sparkSession
    table = VersionedTable(spark, table_root)
    table.key_columns = tuple(key_columns)
    table.stat_columns = tuple(stat_columns)
    table.bloom_columns = tuple(bloom_columns)

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        keys = _collect_epoch_keys(batch_df, key_col)
        if not keys:
            return
        pred = f"{key_col} IN ({', '.join(_sql_key_literal(k) for k in keys)})"
        table.delete_where(
            pred,
            writer=writer,
            epoch=epoch_id,
            prune=(key_col, min(keys), max(keys)),
        )

    query = (
        requests.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def run_retention_delete_stream_catalog(
    requests: DataFrame,
    catalog_root: str,
    checkpoint_dir: str,
    key_col: str,
    table_key_cols: dict[str, str],
    writer: str,
    table_configs: dict[str, dict] | None = None,
) -> None:
    """Multi-table erasure stream: each epoch of deletion requests is
    applied to EVERY listed catalog table as ONE atomic transaction —
    either the key disappears from all of them or from none (the
    actual right-to-be-forgotten contract when user data spans a
    document store, an events table, and derived summaries; per-table
    deletes can crash between tables and leave the user half-erased).

    ``table_key_cols`` maps catalog table name → the column holding the
    erasure key in that table. ``table_configs`` maps table name →
    ``configure()`` kwargs (key_columns / stat_columns / bloom_columns)
    and MUST mirror what the tables' primary writers use, or erasure
    commits stop emitting CDF delete rows and rewritten files lose
    their skipping metadata (the catalog's table config lives on the
    handle, not in the table).

    ``writer`` is REQUIRED and must be unique per logical erasure
    stream: the (writer, epoch) replay check is CATALOG-wide, so two
    streams sharing a writer name would mistake each other's epoch 0/1/…
    for their own replays and silently skip real deletions. Epoch
    numbering is only stable for an identical source + checkpoint —
    starting over with a fresh checkpoint after the queue grew regroups
    requests into different epochs, so also change ``writer`` when
    deliberately reprocessing a grown queue. Per-epoch idempotence:
    a replayed epoch re-commits nothing on any table (including
    no-match epochs — the catalog records an empty marker txn). Same
    request-grain driver-traffic contract as
    ``run_retention_delete_stream``; each table's delete is pre-pruned
    by the batch's [min, max] key range."""
    from ..sources.catalog import TableCatalog

    spark = requests.sparkSession
    cat = TableCatalog(spark, catalog_root)
    for name, cfg in (table_configs or {}).items():
        cat.configure(name, **cfg)

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        keys = _collect_epoch_keys(batch_df, key_col)
        if not keys:
            return
        in_list = ", ".join(_sql_key_literal(k) for k in keys)
        cat.commit(
            deletes={
                name: {
                    "predicate": f"{col} IN ({in_list})",
                    "prune": (col, min(keys), max(keys)),
                }
                for name, col in table_key_cols.items()
            },
            writer=writer,
            epoch=epoch_id,
        )

    query = (
        requests.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def run_stream_bm25_score(
    docs_stream: DataFrame,
    reference_docs: DataFrame,
    queries: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Streaming BM25 ranker: score an incoming document stream against
    a FROZEN index built once from ``reference_docs`` (df/avgdl stats —
    ``plans.search.bm25_index``), appending (query_id, doc_id, score)
    parquet per microbatch.

    Exactness: BM25 of a document depends only on the document's own
    term frequencies/length plus the frozen index stats, so per-batch
    scoring ≡ batch scoring of the union — no cross-batch state, no
    watermark needed; each epoch is one stream-static broadcast join.
    The index relations are term-grain and 1-row — pinned once on the
    driver side and broadcast into every epoch. Output is keyed on
    epoch (``epoch=N/`` subdir, overwritten on replay) so a microbatch
    re-run after a crash-before-checkpoint is idempotent — the repo's
    foreachBatch sink contract. Stream ≡ batch pinned in
    tests/test_search.py."""
    import os as _os

    from ..plans.search import bm25_index, bm25_score_with_index

    dfreq, consts = bm25_index(reference_docs)
    dfreq = dfreq.persist()
    consts = consts.persist()
    dfreq.count(), consts.count()  # materialize the frozen index once

    def _score(batch_df: DataFrame, epoch_id: int) -> None:
        bm25_score_with_index(batch_df, queries, dfreq, consts).write.mode(
            "overwrite"
        ).parquet(_os.path.join(out_dir, f"epoch={epoch_id}"))

    query = (
        docs_stream.writeStream.foreachBatch(_score)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    dfreq.unpersist()
    consts.unpersist()


def run_cdc_merge_stream_catalog(
    events: DataFrame,
    catalog_root: str,
    checkpoint_dir: str,
    writer: str = "cdc_merge_cat",
    max_retries: int = 5,
) -> None:
    """The CDC merge sink as a MULTI-TABLE transaction
    (``sources/catalog.TableCatalog``): each microbatch merges the
    changelog into the snapshot AND refreshes the derived per-event-type
    summary, committing BOTH as one txn — a reader resolving any txn seq
    sees the snapshot and the summary from the same epoch, never a
    snapshot with last epoch's summary (the cross-table alignment the
    single-table sink cannot promise). Replay idempotence is
    catalog-wide: a replayed epoch finds its (writer, epoch) txn and
    skips both tables together.

    The read-modify-write retry lives HERE (re-derive from the new
    snapshot on ``TxnConflict``), not in ``TableCatalog.commit`` — the
    catalog's internal retries would re-stage the SAME DataFrames,
    which is wrong for state derived from the read base (the same
    reason ``VersionedTable.merge_commit`` re-runs its merge_fn)."""
    from ..plans.cdc import _latest_wins, merge_snapshot
    from ..sources.catalog import TableCatalog, TxnConflict

    spark = events.sparkSession
    cat = TableCatalog(spark, catalog_root)

    def _summarize(snapshot: DataFrame) -> DataFrame:
        return snapshot.groupBy("last_event_type").agg(
            F.count(F.lit(1)).alias("n_users"),
            F.max("last_ts").alias("latest_ts"),
        )

    def _merge(batch_df: DataFrame, epoch_id: int) -> None:
        last: TxnConflict | None = None
        for _ in range(max_retries):
            cat.roll_forward()
            try:
                base = cat.read("snapshot")
            except FileNotFoundError:
                base = None
            merged = (
                _latest_wins(batch_df)
                if base is None
                else merge_snapshot(base, batch_df)
            )
            try:
                cat.commit(
                    overwrites={
                        "snapshot": merged,
                        "summary": _summarize(merged),
                    },
                    writer=writer,
                    epoch=epoch_id,
                    max_retries=1,
                )
                return
            except TxnConflict as e:
                last = e
                continue
        raise last or TxnConflict(0)

    query = (
        events.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def run_crawl_ingest_stream(
    spark,
    warc_dir: str,
    catalog_root: str,
    checkpoint_dir: str,
    writer: str = "crawl_ingest",
) -> None:
    """The crawl-to-corpus ingestion loop, end to end: TAIL a directory
    of WARC archives (``sources/warc.py`` streaming source — each
    microbatch is exactly the newly landed files), extract documents
    in-stream (HTTP-200 text/html responses → ``html_to_text``, stable
    md5 doc ids, registrable-domain sources — all stateless column
    ops, so they run inside the stream with no state store), and land
    each epoch as ONE catalog transaction: the documents APPEND plus
    the refreshed per-source stats OVERWRITE (counts/chars fold
    mergeably — old stats + batch stats, never re-reading the corpus).
    A reader at any txn seq sees documents and stats from the same
    epoch; a replayed epoch (restart mid-publish, checkpoint loss)
    hits the catalog's (writer, epoch) idempotence and commits
    NOTHING twice. Single-writer per catalog by contract (the
    ``writer`` name is the stream's identity, as in the CDC sinks)."""
    from ..functions.core import md5_long
    from ..functions.web import html_to_text, registrable_domain
    from ..sources import warc as warc_source
    from ..sources.catalog import TableCatalog

    warc_source.register(spark)
    recs = (
        spark.readStream.format(warc_source.FORMAT_NAME)
        .option("path", warc_dir)
        .load()
    )
    docs = (
        recs.filter(
            (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
            & F.col("http_content_type").startswith("text/html")
            & F.col("body").isNotNull()
        )
        .select(
            md5_long(F.col("record_id")).alias("doc_id"),
            registrable_domain(F.col("target_uri")).alias("source"),
            html_to_text(F.col("body").cast("string")).alias("text"),
        )
        .filter(F.length("text") > 0)
    )
    cat = TableCatalog(spark, catalog_root)

    def _ingest(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return  # no new files this trigger: no empty txn
        batch_stats = batch_df.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        try:
            old = cat.read("source_stats")
        except (FileNotFoundError, KeyError):
            old = None
        merged = (
            batch_stats
            if old is None
            else old.unionByName(batch_stats)
            .groupBy("source")
            .agg(
                F.sum("n_docs").alias("n_docs"),
                F.sum("n_chars").alias("n_chars"),
            )
        )
        cat.commit(
            appends={"documents": batch_df},
            overwrites={"source_stats": merged},
            writer=writer,
            epoch=epoch_id,
        )

    query = (
        docs.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def stream_countmin_sketch(docs: DataFrame) -> DataFrame:
    """Streaming Count-Min sketch of token frequencies — the stream twin
    of ``plans/llmdata.countmin_sketch``. Counts are LINEAR, so no
    custom stateful operator is needed at all: the d-way cell fanout is
    a stateless projection and the sketch is an ordinary streaming
    aggregation at (r, cell) grain (state ≤ d×w rows forever — the
    bounded-state property is the sketch itself). Run it in complete
    mode (re-emitting all ≤ d×w rows per trigger is cheap) or update
    mode (changed cells only); either way the aggregation state at any
    time is exactly the batch sketch of everything ingested so far
    (stream ≡ batch EXACT, pinned in tests/test_streaming.py — same
    md5 cell family, bit-identical)."""
    from ..plans.llmdata import CM_D, CM_W, _cm_cells
    from ..functions.core import tokens

    tok = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    return (
        tok.select(F.explode(_cm_cells(F.col("tok"), CM_W, CM_D)).alias("rc"))
        .select(F.col("rc.r").alias("r"), F.col("rc.cell").alias("cell"))
        .groupBy("r", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


PARA_DEDUP_OUTPUT = (
    "doc_id long, piece_idx int, win int, ptext string"
)
PARA_DEDUP_STATE = "seen boolean"


def stream_paragraph_dedup(docs: DataFrame) -> DataFrame:
    """Streaming paragraph dedup — the stream twin of
    ``plans/curation.incremental_paragraph_dedup``: documents arrive as
    an unbounded stream, each paragraph's hash is a state key, and only
    the corpus-lifetime FIRST occurrence of every paragraph is emitted
    (the CCNet pass as an always-on ingest filter instead of a batch
    job). State per key is a single seen flag — the smallest possible
    stateful operator, bounded by DISTINCT paragraphs, the same
    fingerprint grain as the batch state relation.

    Paragraph extraction must avoid window functions (unsupported on
    streams), so it runs as pure higher-order expressions per document
    row: blank-line split → index-aware transform → fixed
    ``PARA_TOKENS``-token slices — the same (piece_idx, win, ptext)
    relation ``curation._paragraphs`` builds relationally (equality
    pinned in tests/test_streaming.py). Interpreted-expression cost is
    per-DOC paragraph counts (tens), not the shingle-scale blowup the
    _shingle_table docstring warns about.

    Stream ≡ batch gate (tests/test_streaming.py): replaying id-ordered
    chunks, the union of emitted rows equals the batch
    ``paragraph_dedup`` kept set exactly. Same append-only assumption
    as the batch fold: a doc's rows arrive in one trigger and later
    triggers carry larger doc_ids."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..plans.curation import PARA_SEP, PARA_TOKENS

    pieces = F.filter(
        F.split(F.col("text"), PARA_SEP), lambda p: F.trim(p) != ""
    )
    toks = lambda p: F.split(p, " ")  # noqa: E731 — shared with tokens()
    paras = F.flatten(
        F.transform(
            pieces,
            lambda p, pi: F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size(toks(p)) / F.lit(PARA_TOKENS)).cast(
                        "int"
                    )
                    - 1,
                ),
                lambda w: F.struct(
                    pi.cast("int").alias("piece_idx"),
                    w.cast("int").alias("win"),
                    F.concat_ws(
                        " ",
                        F.slice(
                            toks(p), w * PARA_TOKENS + 1, PARA_TOKENS
                        ),
                    ).alias("ptext"),
                ),
            ),
        )
    )
    exploded = (
        docs.select("doc_id", F.explode(paras).alias("pw"))
        .select(
            "doc_id",
            F.col("pw.piece_idx").alias("piece_idx"),
            F.col("pw.win").alias("win"),
            F.col("pw.ptext").alias("ptext"),
        )
        .withColumn("para_hash", F.md5(F.lower(F.col("ptext"))))
    )

    def _update(key, pdfs, state):
        import pandas as pd

        if state.exists:
            # paragraph already kept in an earlier trigger — drop all
            for _ in pdfs:
                pass
            return
        best = None
        for pdf in pdfs:
            for row in pdf.itertuples(index=False):
                cand = (row.doc_id, row.piece_idx, row.win, row.ptext)
                if best is None or cand[:3] < best[:3]:
                    best = cand
        if best is None:
            return
        state.update((True,))
        yield pd.DataFrame(
            [best], columns=["doc_id", "piece_idx", "win", "ptext"]
        )

    return exploded.groupBy("para_hash").applyInPandasWithState(
        _update,
        PARA_DEDUP_OUTPUT,
        PARA_DEDUP_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def run_to_memory(
    df: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming DataFrame with the availableNow trigger into an
    in-memory table and return the materialized result — the deterministic
    'process everything currently available, then stop' harness used by the
    tests. Production sinks swap format for kafka/parquet + checkpoint."""
    query = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    spark = df.sparkSession
    return spark.table(name)


def run_dq_gate_stream(
    events: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    rules: dict | None = None,
) -> list[int]:
    """Per-microbatch data-quality gate with quarantine routing — the
    streaming form of plans/validation: every arriving row is annotated
    with the rules it violates, clean rows flow to the curated sink,
    violating rows land in a quarantine sink WITH their violation tags
    (so reprocessing after a rule fix is a filter on ``violated_rules``,
    not a re-ingest), and a rule-grain report row set is emitted per
    epoch for monitoring. This is how a 100-TB ingest actually applies
    constraint checks: inline, on the stream, without a second scan —
    the batch ``dq_report`` is the same rule set run retrospectively.

    ``rules`` maps rule_name → Boolean VIOLATION predicate (same
    convention as validation.row_rule_report, which produces the per-epoch
    report here). All three sinks are epoch-keyed overwrites, so replayed
    epochs rewrite their own output — idempotent under the at-least-once
    trigger, same recipe as run_foreach_batch_parquet.

    Returns the epoch ids processed.
    """
    from ..plans.validation import row_rule_report

    if rules is None:
        rules = {
            "value_non_negative": F.col("value") < 0,
            "no_error_events": F.col("event_type") == "error",
        }
    if not rules:
        # explicit {}: fail with a clear message instead of the confusing
        # plan-build error zero-arg F.concat() would raise below
        raise ValueError("run_dq_gate_stream requires at least one rule")

    # violated_rules: names of every rule whose violation predicate fires
    tags = F.concat(
        *[
            F.when(pred, F.array(F.lit(name))).otherwise(
                F.array().cast("array<string>")
            )
            for name, pred in rules.items()
        ]
    )
    seen: list[int] = []

    def _gate(batch_df: DataFrame, epoch_id: int) -> None:
        seen.append(epoch_id)
        tagged = batch_df.withColumn("violated_rules", tags)
        # one source pass per routed sink (file sinks can't share a scan
        # across independent writes); rule evaluation is a linear codegen
        # projection on each
        tagged.filter(F.size("violated_rules") == 0).drop(
            "violated_rules"
        ).write.mode("overwrite").parquet(f"{out_dir}/clean/epoch={epoch_id}")
        tagged.filter(F.size("violated_rules") > 0).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/quarantine/epoch={epoch_id}")
        row_rule_report(batch_df, "events", rules).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/report/epoch={epoch_id}")

    query = (
        events.writeStream.foreachBatch(_gate)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return seen


def _make_user_type_counts_processor():
    """Build the StatefulProcessor class lazily (the import pulls the
    transformWithState protocol stack). The fold logic is deliberately
    expressed only through the handle/state INTERFACE (getMapState /
    getValueState / get / update / containsKey / getValue / updateValue /
    iterator), so tests/test_streaming.py drives the identical code with
    in-memory fakes even where the protobuf runtime is absent."""
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class UserTypeCountsProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._types = handle.getMapState(
                "type_counts", "event_type string", "n bigint"
            )
            self._total = handle.getValueState("total", "v double")

        def handleInputRows(self, key, rows, timer_values):
            add: dict[str, int] = {}
            delta = 0.0
            for pdf in rows:
                for et, v in zip(pdf["event_type"], pdf["value"]):
                    add[et] = add.get(et, 0) + 1
                    delta += float(v)
            cur = self._total.get()
            total = (cur[0] if cur else 0.0) + delta
            self._total.update((total,))
            for et, k in add.items():
                prev = (
                    self._types.getValue((et,))[0]
                    if self._types.containsKey((et,))
                    else 0
                )
                self._types.updateValue((et,), (prev + k,))
            # emit the full per-user snapshot (monotone across batches)
            types, counts = [], []
            for (et,), (n,) in self._types.iterator():
                types.append(et)
                counts.append(n)
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(types),
                    "event_type": types,
                    "n": counts,
                    "user_total": [total] * len(types),
                }
            )

        def close(self) -> None:
            pass

    return UserTypeCountsProcessor


def stream_user_type_counts_tws(events: DataFrame) -> DataFrame:
    """``transformWithStateInPandas`` — Spark 4's arbitrary-state API (the
    successor of ``applyInPandasWithState``, used by ``stream_user_totals``):
    instead of one opaque state tuple per key, the StatefulProcessor holds
    NAMED, TYPED state primitives the store manages individually — here a
    MapState (event_type → count) and a ValueState (running value total)
    per user. Each microbatch emits the user's full current snapshot
    (one row per event type seen so far), so counts/totals are monotone
    across emissions and the final snapshot must equal the batch
    ``groupBy(user_id, event_type)`` aggregate exactly (count) /
    to double-accumulation order (total — the stream folds in chunk
    order; tests compare with an epsilon like the other stateful job).

    Requires the RocksDB state-store provider (the API targets it) AND
    the ``protobuf`` package (the state protocol between the Python
    worker and the store is protobuf-encoded — absent in this container,
    so the equivalence test is an explicit SKIP here and runs green on
    any standard PySpark 4 install);
    state is per-key-scoped, so executor memory is bounded by live keys
    of the CURRENT partition, not history — the same bounded-state story
    as the other stateful jobs, with finer-grained store layout (each
    map entry is its own store key; a hot user's map grows by type
    cardinality, not event count)."""
    UserTypeCountsProcessor = _make_user_type_counts_processor()
    return events.groupBy("user_id").transformWithStateInPandas(
        UserTypeCountsProcessor(),
        "user_id bigint, event_type string, n bigint, user_total double",
        "Update",
        "None",
    )


def stream_dsir_scores(docs: DataFrame, model: DataFrame) -> DataFrame:
    """Streaming DSIR importance scoring — the stream twin of
    ``plans/curation.dsir_importance_weights`` in the frozen-index
    pattern (the streaming BM25 ranker / ann-over-postings shape): the
    model is TRAINED batch-side (``curation.dsir_model`` — a ≤
    DSIR_BUCKETS-row relation) and the stream is scored against it with
    zero stateful re-training.

    Plan shape: stateless token-explode + bucket projection, a
    stream-static broadcast join onto the model relation, then ONE
    streaming aggregation at doc grain (Σ tf·(bits_r − bits_t) and the
    token count accumulate linearly, so update-mode state per doc is
    two longs). State is doc-grain for the stream's lifetime; a
    production deployment bounds it with an event-time watermark once
    docs carry ingest timestamps (same note as the other doc-grain
    twins). Contract mirrored from the batch plan: only raw-pool
    documents are scored, and tokens hashing to buckets absent from
    the TRAINING corpus are skipped (the batch twin never sees any —
    its model covers every bucket of the corpus it scores).

    Stream ≡ batch gate (tests/test_streaming.py): replaying id-ordered
    document chunks against the model trained on the same corpus, the
    final per-doc (n_tokens, weight_bits) equal the batch plan's rows
    EXACTLY (integer arithmetic end to end)."""
    from ..functions.core import md5_long, tokens
    from ..plans.curation import DSIR_BUCKETS, DSIR_TARGET_SOURCE

    tok = (
        docs.filter(F.col("source") != DSIR_TARGET_SOURCE)
        .select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
        .select(
            "doc_id",
            (md5_long(F.col("t")) % DSIR_BUCKETS).cast("int").alias("b"),
        )
    )
    return (
        tok.join(F.broadcast(model), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("bits_r") - F.col("bits_t")).alias("weight_bits"),
        )
    )


def stream_span_corruption(docs: DataFrame) -> DataFrame:
    """Streaming T5 span corruption — the stream twin of
    ``plans/assembly.span_corruption``, sharing its projection verbatim
    (``span_corruption_project``). Fully STATELESS: mask placement is a
    pure hash of (doc_id, slot), so a document corrupts identically
    whether it arrives in a backfill batch or one-at-a-time on a stream
    — no state store, no watermark, append mode. The online shape of
    training-example construction: examples materialize as documents
    land, instead of a nightly corpus pass.

    Stream ≡ batch gate (tests/test_streaming.py): replaying id-ordered
    document chunks yields EXACTLY the batch plan's rows."""
    from ..plans.assembly import span_corruption_project

    return span_corruption_project(docs)


def stream_sft_examples(docs: DataFrame) -> DataFrame:
    """Streaming SFT rendering — the stream twin of
    ``plans/assembly.sft_examples`` (shared projection, stateless
    per-row string expressions, append mode). Same gate shape as
    ``stream_span_corruption``."""
    from ..plans.assembly import sft_examples_project

    return sft_examples_project(docs)


def stream_typo_normalize(docs: DataFrame, cmap_pairs: list) -> DataFrame:
    """Streaming typo normalization — the frozen-model twin of
    ``plans/fuzzy.text_typo_normalize`` (the stream_dsir_scores
    pattern): the canonical map is TRAINED batch-side
    (``fuzzy.typo_canonical_map``, collected to (word, canonical)
    pairs — vocabulary-bounded, the broadcast-vocab contract) and
    applied as a pure per-row map-literal expression: token-wise lookup
    with pass-through, zero state, zero shuffle, append mode.

    Stream ≡ batch gate (tests/test_streaming.py): replaying id-ordered
    document chunks yields EXACTLY the batch plan's rows."""
    from ..plans.fuzzy import typo_map_expr

    s = typo_map_expr(cmap_pairs)
    return docs.select("doc_id", s.alias("s")).select(
        "doc_id", "s.normalized_text", "s.n_tokens", "s.n_changed"
    )
