"""Change-feed streaming source over versioned tables
(sources/table_feed.py): full-history first drain, exactly-once
incremental continuation across runs sharing a checkpoint, per-row
version/operation tags, and tolerance to vacuum of consumed versions."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sales_etl_pipeline_spark.sources import table_feed  # noqa: E402
from sales_etl_pipeline_spark.sources.table import VersionedTable  # noqa: E402


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "k long, v string")


def _drain(spark, root, out, ckpt):
    q = (
        table_feed.read_feed(spark, root)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    try:
        return spark.read.parquet(out)
    except Exception:
        return None  # no output yet


def test_feed_drains_history_then_increments(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit_overwrite(_df(spark, [(1, "a"), (2, "b")]))
    t.commit_overwrite(_df(spark, [(1, "a2"), (3, "c")]), operation="merge")

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    got = _drain(spark, t.root, out, ckpt)
    rows = {(r.k, r.v, r._version, r._operation) for r in got.collect()}
    assert rows == {
        (1, "a", 0, "overwrite"),
        (2, "b", 0, "overwrite"),
        (1, "a2", 1, "merge"),
        (3, "c", 1, "merge"),
    }

    # no new commits: a second run over the same checkpoint adds nothing
    _drain(spark, t.root, out, ckpt)
    assert spark.read.parquet(out).count() == 4

    # a new commit: the third run delivers exactly that version's rows
    t.commit_overwrite(_df(spark, [(9, "z")]))
    got = _drain(spark, t.root, out, ckpt)
    assert got.count() == 5
    new = got.filter(F.col("_version") == 2).collect()
    assert [(r.k, r.v) for r in new] == [(9, "z")]


def test_feed_survives_vacuum_of_consumed_versions(spark, tmp_path):
    """Once a version is consumed (offset committed), vacuuming it away
    must not break the NEXT incremental run — the feed only reads
    manifests in (last_offset, latest]."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    for i in range(3):
        t.commit_overwrite(_df(spark, [(i, f"v{i}")]))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, t.root, out, ckpt)
    assert spark.read.parquet(out).count() == 3
    t.vacuum(keep_last=1)  # versions 0,1 gone
    t.commit_overwrite(_df(spark, [(7, "new")]))
    got = _drain(spark, t.root, out, ckpt)
    assert got.count() == 4
    assert got.filter("_version = 3").first().k == 7


def test_feed_matches_cdc_merge_sink_versions(spark, tmp_path):
    """End-to-end pipe: CDC merge sink writes versions; the feed
    re-reads them — per-version row sets must equal direct time-travel
    reads (writer and reader agree on the format)."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.merge_commit(lambda base: _df(spark, [(1, "x")]), writer="w", epoch=0)
    t.merge_commit(
        lambda base: base.unionByName(_df(spark, [(2, "y")])),
        writer="w",
        epoch=1,
    )
    got = _drain(
        spark, t.root, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    for v in t.versions():
        feed_rows = sorted(
            (r.k, r.v)
            for r in got.filter(F.col("_version") == v).collect()
        )
        tt_rows = sorted(map(tuple, t.read(version=v).collect()))
        assert feed_rows == tt_rows


def _drain_cdf(spark, root, out, ckpt):
    q = (
        table_feed.read_feed(spark, root, cdf=True)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


def _expected_cdf(t, lo, hi):
    """Independent oracle: the row-level diff of consecutive time-travel
    reads, computed driver-side on collected snapshots (test data is
    tiny). Returns the same (k, v, ..., _change_type, _version) tuples
    the CDF feed must deliver for versions in (lo, hi]."""
    want = set()
    for v in t.versions():
        if not (lo < v <= hi):
            continue
        if t._read_manifest(v).get("operation") == "compact":
            continue
        cur = {r[0]: tuple(r) for r in t.read(version=v).collect()}
        prev = (
            {r[0]: tuple(r) for r in t.read(version=v - 1).collect()}
            if v > 0
            else {}
        )
        # align widths across additive evolution (old snapshot lacks cols)
        width = max(len(r) for r in cur.values()) if cur else 0
        pad = lambda r: r + (None,) * (width - len(r))
        for k, row in cur.items():
            if k not in prev:
                want.add(pad(row) + ("insert", v))
            elif pad(prev[k]) != pad(row):
                want.add(pad(prev[k]) + ("update_preimage", v))
                want.add(pad(row) + ("update_postimage", v))
        for k, row in prev.items():
            if k not in cur:
                want.add(pad(row) + ("delete", v))
    return want


def test_cdf_feed_matches_antijoin_diff(spark, tmp_path):
    """Row-level CDF mode ≡ the key-wise diff of consecutive time-travel
    reads, across every commit kind: overwrite v0 (insert_all), diff
    overwrite (insert/update pre+post/delete), append (insert_files),
    compact (no rows)."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.key_columns = ("k",)
    t.commit_overwrite(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    # v1: update k=1, delete k=3, insert k=4, keep k=2 untouched
    t.commit_overwrite(_df(spark, [(1, "a2"), (2, "b"), (4, "d")]))
    t.commit_append(_df(spark, [(5, "e")]))           # v2: pure inserts
    t.compact(target_bytes=1 << 30)                   # v3: no row changes
    got = _drain_cdf(spark, t.root, str(tmp_path / "o"), str(tmp_path / "c"))
    rows = {
        (r.k, r.v, r._change_type, r._version) for r in got.collect()
    }
    assert rows == _expected_cdf(t, -1, 3)
    assert not {r for r in rows if r[3] == 3}  # compact contributed 0 rows
    # k=2 never changed after v0 → appears exactly once (its v0 insert)
    assert {r for r in rows if r[0] == 2} == {(2, "b", "insert", 0)}


def test_cdf_feed_restart_and_vacuum(spark, tmp_path):
    """Incremental continuation: a second run over the same checkpoint
    delivers only the changes of versions committed since — even after
    the consumed versions (and their change parquets) are vacuumed."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.key_columns = ("k",)
    t.commit_overwrite(_df(spark, [(1, "a"), (2, "b")]))
    t.commit_overwrite(_df(spark, [(1, "a2"), (2, "b")]))
    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
    got = _drain_cdf(spark, t.root, out, ckpt)
    assert got.count() == 4  # 2 inserts + update pre/post
    t.vacuum(keep_last=1)  # drops v0 and its files
    t.commit_overwrite(_df(spark, [(2, "b9")]))  # v2: delete k=1, update k=2
    got = _drain_cdf(spark, t.root, out, ckpt)
    new = {
        (r.k, r.v, r._change_type)
        for r in got.filter(F.col("_version") == 2).collect()
    }
    assert new == {
        (1, "a2", "delete"),
        (2, "b", "update_preimage"),
        (2, "b9", "update_postimage"),
    }
    assert got.count() == 7


def test_cdf_change_files_survive_vacuum_of_unconsumed(spark, tmp_path):
    """vacuum/gc_orphans must treat CDF change parquets as referenced:
    vacuuming OLDER versions may not delete the change files of kept
    versions, so a feed that has not yet consumed them still drains."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.key_columns = ("k",)
    t.commit_overwrite(_df(spark, [(1, "a")]))
    t.commit_overwrite(_df(spark, [(1, "a2")]))  # diff commit w/ change file
    t.vacuum(keep_last=1)  # v0 gone; v1 (and its change parquet) kept
    t.gc_orphans(older_than_seconds=0)
    got = _drain_cdf(spark, t.root, str(tmp_path / "o"), str(tmp_path / "c"))
    # v1's diff was computed against v0 before the vacuum — its change
    # parquet still delivers the update pair
    assert {
        (r.k, r.v, r._change_type, r._version) for r in got.collect()
    } == {(1, "a", "update_preimage", 1), (1, "a2", "update_postimage", 1)}


def test_cdf_requires_key_columns(spark, tmp_path):
    """A version committed without CDF bookkeeping must raise in CDF
    mode (silently dropping its changes would corrupt downstream state);
    the snapshot feed over the same table still works."""
    import pytest

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit_overwrite(_df(spark, [(1, "a")]))  # key_columns unset
    q = (
        table_feed.read_feed(spark, t.root, cdf=True)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "o"))
        .option("checkpointLocation", str(tmp_path / "c"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="without CDF bookkeeping"):
        q.awaitTermination()
    got = _drain(spark, t.root, str(tmp_path / "o2"), str(tmp_path / "c2"))
    assert got.count() == 1


def test_cdf_feed_across_additive_evolution(spark, tmp_path):
    """CDF rows from pre-evolution versions are delivered against the
    feed's (latest) schema with nulls for the added column."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.key_columns = ("k",)
    t.commit_overwrite(_df(spark, [(1, "a")]))
    t.commit_append(
        spark.createDataFrame([(2, "b", "X")], "k long, v string, extra string")
    )
    got = _drain_cdf(spark, t.root, str(tmp_path / "o"), str(tmp_path / "c"))
    rows = {
        (r.k, r.v, r.extra, r._change_type, r._version)
        for r in got.collect()
    }
    assert rows == {
        (1, "a", None, "insert", 0),
        (2, "b", "X", "insert", 1),
    }


def test_cdf_feed_delivers_delete_where_changes(spark, tmp_path):
    """A delete_where commit's CDF rows arrive through the feed exactly
    as _change_type='delete' rows for the removed keys — and match the
    anti-join diff of the surrounding time-travel reads."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.key_columns = ("k",)
    t.commit_overwrite(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    t.delete_where("k <= 2")  # v1
    got = _drain_cdf(spark, t.root, str(tmp_path / "o"), str(tmp_path / "c"))
    v1 = {
        (r.k, r.v, r._change_type)
        for r in got.filter(F.col("_version") == 1).collect()
    }
    assert v1 == {(1, "a", "delete"), (2, "b", "delete")}
    assert {
        (r.k, r.v, r._change_type, r._version) for r in got.collect()
    } == _expected_cdf(t, -1, 1)


def test_sustained_lakehouse_workload(spark, tmp_path):
    """VERDICT r10 item 5 — one sustained multi-epoch run interleaving
    the WHOLE maintenance surface: MERGE INTO, append, OPTIMIZE
    (+ZORDER), additive schema evolution, DELETE WHERE, vacuum, and two
    incremental CDF-feed drains across it. Invariants:

    - feed ≡ per-version anti-join diff for EVERY version, including
      those vacuumed after being consumed (slices are captured while
      both endpoints are still readable);
    - compact commits contribute zero CDF rows;
    - the final snapshot equals an independent dict-model replay of the
      whole epoch sequence.
    """
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.key_columns = ("k",)
    t.stat_columns = ("k",)
    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")

    expected: set = set()
    model: dict = {}

    def capture(lo, hi):
        # pad every captured slice row to the evolved width so slices
        # from pre-evolution versions compare against the feed's
        # latest-schema rows (nulls for added columns)
        for r in _expected_cdf(t, lo, hi):
            body, tags = r[:-2], r[-2:]
            expected.add(body + (None,) * (3 - len(body)) + tags)

    # v0: MERGE INTO on an empty table = all-insert
    t.merge_into(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), on=("k",))
    model.update({1: ("a", None), 2: ("b", None), 3: ("c", None)})
    # v1: MERGE upsert — update 2, insert 4
    t.merge_into(_df(spark, [(2, "B"), (4, "d")]), on=("k",))
    model.update({2: ("B", None), 4: ("d", None)})
    # v2: pure append
    t.commit_append(_df(spark, [(5, "e")]))
    model[5] = ("e", None)
    # v3: OPTIMIZE ZORDER — same rows, no CDF contribution
    t.compact(zorder_by=("k",))
    capture(-1, 3)

    # v4: additive schema evolution via append with a new column
    t.commit_append(
        spark.createDataFrame([(6, "f", "X")], "k long, v string, w string")
    )
    model[6] = ("f", "X")
    # v5: MERGE on the evolved schema — update 1 with w, insert 7
    t.merge_into(
        spark.createDataFrame(
            [(1, "A", "Y"), (7, "g", "Z")], "k long, v string, w string"
        ),
        on=("k",),
    )
    model.update({1: ("A", "Y"), 7: ("g", "Z")})
    # v6: DELETE WHERE
    t.delete_where("k = 3")
    del model[3]
    capture(3, 6)

    # drain #1, then vacuum the consumed history
    got = _drain_cdf(spark, t.root, out, ckpt)
    rows = {
        (r.k, r.v, r.w, r._change_type, r._version) for r in got.collect()
    }
    assert rows == expected
    assert not {r for r in rows if r[4] == 3}  # ZORDER compact: 0 rows
    t.vacuum(keep_last=2)  # v0–v4 gone; feed already consumed them
    t.gc_orphans(older_than_seconds=0)

    # v7: MERGE after vacuum — delete 5, update 6
    t.merge_into(
        spark.createDataFrame([(6, "F", "X2")], "k long, v string, w string"),
        on=("k",),
    )
    model[6] = ("F", "X2")
    t.merge_into(
        spark.createDataFrame([(5, "e", None)], "k long, v string, w string"),
        on=("k",),
        when_matched="delete",
        when_not_matched=None,
    )
    del model[5]
    # v9: plain OPTIMIZE
    t.compact()
    capture(6, 9)

    # drain #2: only the new versions arrive, still ≡ anti-join diff
    got = _drain_cdf(spark, t.root, out, ckpt)
    rows = {
        (r.k, r.v, r.w, r._change_type, r._version) for r in got.collect()
    }
    assert rows == expected
    assert not {r for r in rows if r[4] == 9}  # compact: 0 rows again

    # final snapshot ≡ dict-model replay of the whole sequence
    snap = {r.k: (r.v, r.w) for r in t.read().collect()}
    assert snap == model
    # and manifest-level pruning still works on the zordered stats
    assert len(t.files_for(t.latest_version(), where=("k", 100, None))) == 0
