"""CDC family invariants beyond the library-tier oracle (which already
pins cdc_latest_snapshot / cdc_incremental_merge / scd2_intervals against
DuckDB): the incremental MERGE must equal the full recompute for ANY
event-time cutoff, including degenerate ones (empty base, empty delta),
and the SCD2 dimension must tile each key's history exactly."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sales_etl_pipeline_spark.plans import cdc  # noqa: E402
from sales_etl_pipeline_spark.sources.readers import load_events  # noqa: E402

SF = "/root/testdata/sf0.001"


def _as_sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "cutoff",
    [
        "2023-01-01 00:00:00",  # empty base: everything is delta
        "2024-01-02 12:00:00",  # tiny base
        "2024-01-16 00:00:00",  # registry cutoff
        "2024-01-29 00:00:00",  # tiny delta
        "2025-01-01 00:00:00",  # empty delta: merge degenerates to base
    ],
)
def test_incremental_merge_equals_recompute(spark, cutoff):
    full = cdc.cdc_latest_snapshot(spark, SF)
    merged = cdc.cdc_incremental_merge(spark, SF, cutoff=cutoff)
    assert _as_sorted_rows(merged) == _as_sorted_rows(full)


def test_merge_handles_insert_update_delete(spark):
    """Unit-level MERGE semantics on a hand-built base/delta pair: a new
    key inserts, a newer upsert updates, a tombstone deletes, and an
    untouched key survives unchanged."""
    base = spark.createDataFrame(
        [
            (1, 10, "2024-01-01 00:00:00", "view", 1.0),   # will update
            (2, 11, "2024-01-01 00:00:00", "click", 2.0),  # will delete
            (3, 12, "2024-01-01 00:00:00", "view", 3.0),   # untouched
        ],
        "user_id long, last_event_id long, last_ts string,"
        " last_event_type string, last_value double",
    ).withColumn("last_ts", F.to_timestamp("last_ts"))
    delta = spark.createDataFrame(
        [
            (1, 20, "2024-01-02 00:00:00", "purchase", 9.0),
            (2, 21, "2024-01-02 00:00:00", cdc.TOMBSTONE_TYPE, 0.0),
            (4, 22, "2024-01-02 00:00:00", "signup", 4.0),  # insert
        ],
        "user_id long, event_id long, ts string,"
        " event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r.user_id: (r.last_event_id, r.last_event_type, r.last_value)
        for r in cdc.merge_snapshot(base, delta).collect()
    }
    assert got == {
        1: (20, "purchase", 9.0),
        3: (12, "view", 3.0),
        4: (22, "signup", 4.0),
    }


def test_scd2_tiles_history(spark):
    """Per key: versions are 1..n with no gaps, exactly one is_current row,
    and consecutive intervals abut (valid_to of version k == valid_from of
    version k+1) — the SCD2 tiling invariant."""
    dim = cdc.scd2_intervals(spark, SF).collect()
    by_user: dict = {}
    for r in dim:
        by_user.setdefault(r.user_id, []).append(r)
    events = load_events(spark, SF)
    n_events = events.count()
    assert sum(len(v) for v in by_user.values()) == n_events
    for rows in by_user.values():
        rows.sort(key=lambda r: r.version)
        assert [r.version for r in rows] == list(range(1, len(rows) + 1))
        assert sum(r.is_current for r in rows) == 1
        assert rows[-1].is_current and rows[-1].valid_to is None
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to == b.valid_from


# ---------------------------------------------------------------------------
# property-based: merge semantics against a pure-Python reference model

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False

if _HAS_HYPOTHESIS:
    _event_lists = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),   # user_id (collisions!)
            st.integers(min_value=0, max_value=50),  # ts offset seconds
            st.sampled_from(["view", "click", "purchase", cdc.TOMBSTONE_TYPE]),
            st.floats(min_value=-10, max_value=10, allow_nan=False),
        ),
        min_size=0,
        max_size=30,
    )

    def _py_snapshot(rows):
        """Reference model: latest (ts, event_id) per user wins; absent
        if the winner is a tombstone."""
        best: dict = {}
        for eid, (uid, ts, etype, val) in enumerate(rows):
            if uid not in best or (ts, eid) > (best[uid][0], best[uid][1]):
                best[uid] = (ts, eid, etype, val)
        return {
            uid: (eid, etype, val)
            for uid, (ts, eid, etype, val) in best.items()
            if etype != cdc.TOMBSTONE_TYPE
        }

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(rows=_event_lists, split_frac=st.floats(min_value=0, max_value=1))
    def test_merge_property_random_changelogs(spark, rows, split_frac):
        """For ANY changelog and ANY event-time-respecting split point,
        merge_snapshot(latest_wins(base), delta) must equal the pure
        Python latest-wins model of the whole log — inserts, updates,
        deletes, ties (same ts ⇒ higher event_id wins), empty sides."""
        from sales_etl_pipeline_spark.plans.cdc import _latest_wins, merge_snapshot

        data = [
            (eid, uid, f"2024-01-01 00:00:{ts:02d}", etype, val)
            for eid, (uid, ts, etype, val) in enumerate(rows)
        ]
        schema = (
            "event_id long, user_id long, ts string, event_type string,"
            " value double"
        )
        all_df = (
            spark.createDataFrame(data, schema)
            .withColumn("ts", F.to_timestamp("ts"))
        )
        # event-time split: base = earliest fraction (ties by event_id),
        # preserving the append-only invariant the merge documents
        srt = sorted(data, key=lambda r: (r[2], r[0]))
        k = int(len(srt) * split_frac)
        base_ids = {r[0] for r in srt[:k]}
        base = _latest_wins(all_df.filter(F.col("event_id").isin(base_ids) if base_ids else F.lit(False)))
        delta = all_df.filter(~F.col("event_id").isin(base_ids) if base_ids else all_df["event_id"].isNotNull())
        got = {
            r.user_id: (r.last_event_id, r.last_event_type, r.last_value)
            for r in merge_snapshot(base, delta).collect()
        }
        assert got == _py_snapshot(rows)


if _HAS_HYPOTHESIS:
    _doc_lists = st.lists(
        st.text(
            alphabet="ab ", min_size=0, max_size=12
        ),  # tiny alphabet → forced duplicate texts
        min_size=0,
        max_size=25,
    )

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(texts=_doc_lists, cuts=st.tuples(
        st.floats(min_value=0, max_value=1), st.floats(min_value=0, max_value=1)
    ))
    def test_incremental_exact_dedup_property(spark, texts, cuts):
        """For ANY corpus and ANY 3-way batch split (append-only id
        order), folding batches through incremental_exact_dedup must
        equal the single-pass model: canonical = min doc_id per distinct
        text, dup_count = group size."""
        from sales_etl_pipeline_spark.plans.llmdata import (
            incremental_exact_dedup,
        )

        docs = [(i, t) for i, t in enumerate(texts)]
        want: dict = {}
        for i, t in docs:
            if t not in want:
                want[t] = [i, 0]
            want[t][1] += 1
        a, b = sorted(int(len(docs) * c) for c in cuts)
        schema = "doc_id long, text string"
        state = spark.createDataFrame(
            [], "doc_id long, content_md5 string, dup_count long"
        )
        for lo, hi in ((0, a), (a, b), (b, len(docs))):
            batch = spark.createDataFrame(docs[lo:hi], schema)
            state = incremental_exact_dedup(state, batch)
        got = {
            r.content_md5: (r.doc_id, r.dup_count) for r in state.collect()
        }
        import hashlib

        expected = {
            hashlib.md5(t.encode()).hexdigest(): (i, n)
            for t, (i, n) in want.items()
        }
        assert got == expected


def test_merge_snapshot_replay_idempotent(spark):
    """At-least-once changelog delivery: re-merging a delta that was
    already folded into the snapshot must be a no-op (latest-wins picks
    the same winners again) — the property run_cdc_merge_stream's
    crash-replay safety rests on."""
    from pyspark.sql import functions as F

    from sales_etl_pipeline_spark.plans.cdc import _latest_wins, merge_snapshot
    from sales_etl_pipeline_spark.sources.readers import load_events

    events = load_events(spark, SF)
    cutoff = F.to_timestamp(F.lit("2024-01-16 00:00:00"))
    base = _latest_wins(events.filter(F.col("ts") < cutoff))
    delta = events.filter(F.col("ts") >= cutoff)
    once = merge_snapshot(base, delta)
    twice = merge_snapshot(once, delta)  # replayed delta
    cols = sorted(once.columns)
    a = sorted(map(tuple, once.select(cols).collect()))
    b = sorted(map(tuple, twice.select(cols).collect()))
    assert a == b


def test_cdc_snapshot_single_writer_lock(spark, tmp_path):
    """The snapshot's two-rename swap is single-writer; the contract is
    enforced: a second concurrent merge stream must raise at startup
    instead of corrupting the swap, and force_lock breaks a crashed
    writer's leftover lock."""
    from sales_etl_pipeline_spark.streaming import jobs

    snap = str(tmp_path / "snap")
    os.makedirs(snap)
    # simulate a live (or crashed) writer holding the lock
    with open(os.path.join(snap, jobs.CDC_LOCK_FILE), "w") as f:
        f.write('{"token": "someone-else", "pid": 1}')
    stream = spark.readStream.format("rate").load()
    with pytest.raises(RuntimeError, match="live writer"):
        jobs.run_cdc_merge_stream(stream, snap, str(tmp_path / "ckpt"))
    # the refused writer must not have clobbered the holder's lock
    with open(os.path.join(snap, jobs.CDC_LOCK_FILE)) as f:
        assert "someone-else" in f.read()
    # force_lock (deliberate break of a crashed writer's lock) acquires;
    # exercise it via the lock API directly, then verify release frees
    # the dir for the next writer
    token = jobs._acquire_cdc_lock(snap, force=True)
    jobs._check_cdc_lock(snap, token)  # owner passes fencing
    jobs._release_cdc_lock(snap, token)
    assert not os.path.exists(os.path.join(snap, jobs.CDC_LOCK_FILE))
    token2 = jobs._acquire_cdc_lock(snap)  # uncontended after release
    jobs._release_cdc_lock(snap, token2)


def test_cdc_lock_fencing_stops_stale_writer(spark, tmp_path):
    """Writer fencing: if a second writer force-takes the lock, the
    original writer's per-epoch ownership check must raise (it is now
    the stale writer) and its release must leave the taker's lock
    untouched."""
    from sales_etl_pipeline_spark.streaming import jobs

    snap = str(tmp_path / "snap")
    old_token = jobs._acquire_cdc_lock(snap)
    new_token = jobs._acquire_cdc_lock(snap, force=True)  # takeover
    with pytest.raises(RuntimeError, match="another writer"):
        jobs._check_cdc_lock(snap, old_token)
    jobs._release_cdc_lock(snap, old_token)  # no-op: not the owner
    jobs._check_cdc_lock(snap, new_token)  # taker still owns the lock
    jobs._release_cdc_lock(snap, new_token)


def test_scd2_compacted_tracks_null_transitions(spark, tmp_path):
    """Attribute transitions to/from NULL must OPEN new versions: the
    change test is null-safe (eqNullSafe / IS DISTINCT FROM). With a
    plain <>, (click,5.0)→(click,NULL) evaluates to NULL and the row is
    compacted away — the dimension would show 5.0 as still current (the
    code-review finding; the DuckDB oracle had the same blind spot, so
    parity alone could not catch it)."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:00",
                    "2024-01-02 00:00:00",
                    "2024-01-03 00:00:00",
                    "2024-01-04 00:00:00",
                    "2024-01-05 00:00:00",
                ]
            ).astype("datetime64[us]"),
            "user_id": [7, 7, 7, 7, 7],
            "event_type": ["click"] * 5,
            "value": [5.0, None, None, 5.0, 5.0],
            "props": ["{}"] * 5,
        }
    )
    pdf.to_parquet(str(tmp_path / "events.parquet"), index=False)
    dim = sorted(
        cdc.scd2_compacted(spark, str(tmp_path)).collect(),
        key=lambda r: r.version,
    )
    vals = [r.attr_value for r in dim]
    assert vals == [5.0, None, 5.0]  # NULL opened and closed a version
    assert [r.version for r in dim] == [1, 2, 3]
    assert [r.is_current for r in dim] == [False, False, True]


def test_point_in_time_join_matches_interval_lookup(spark):
    """The union-carry-forward point-in-time join must equal the naive
    interval definition (valid_from ≤ t < valid_to, open interval when
    valid_to is NULL) replayed in-Python from the collected dimension —
    including NULL attrs before a customer's first version and the
    tombstone (dim_deleted) versions; non-vacuous on all three
    outcomes."""
    got = {
        r.o_orderkey: (r.version, r.attr_event_type, r.attr_value)
        for r in cdc.scd2_point_in_time_join(spark, SF).collect()
    }
    intervals = {}
    for r in cdc.scd2_intervals(spark, SF).collect():
        intervals.setdefault(r.user_id, []).append(r)
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey", cdc._order_lookup_ts().alias("t")
    ).collect()
    assert set(got) == {o.o_orderkey for o in orders}
    n_null = n_del = n_live = 0
    for o in orders:
        match = None
        for v in intervals.get(o.o_custkey, []):
            if v.valid_from <= o.t and (v.valid_to is None or o.t < v.valid_to):
                match = v
        want = (
            (match.version, match.attr_event_type, match.attr_value)
            if match
            else (None, None, None)
        )
        assert got[o.o_orderkey] == want, o.o_orderkey
        if match is None:
            n_null += 1
        elif match.attr_event_type == cdc.TOMBSTONE_TYPE:
            n_del += 1
        else:
            n_live += 1
    assert n_null and n_del and n_live, (n_null, n_del, n_live)
    spark.catalog.clearCache()
