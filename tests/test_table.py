"""Versioned snapshot table (sources/table.py): atomic commit visibility,
snapshot isolation, time travel, optimistic concurrency, vacuum safety,
and the versioned CDC merge sink (streaming/jobs.py:
run_cdc_merge_stream_versioned)."""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sales_etl_pipeline_spark.sources.table import (  # noqa: E402
    CommitConflict,
    VersionedTable,
)

SF = "/root/testdata/sf0.001"


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "k long, v string")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_commit_read_round_trip_and_history(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    assert t.versions() == []
    with pytest.raises(FileNotFoundError):
        t.read()
    v0 = t.commit_overwrite(_df(spark, [(1, "a"), (2, "b")]), writer="w")
    v1 = t.commit_overwrite(_df(spark, [(1, "a2")]), writer="w")
    assert (v0, v1) == (0, 1)
    assert _rows(t.read()) == [(1, "a2")]
    assert _rows(t.read(version=0)) == [(1, "a"), (2, "b")]  # time travel
    hist = t.history()
    assert [h["version"] for h in hist] == [0, 1]
    assert hist[0]["rows"] == 2 and hist[1]["rows"] == 1  # observed counts


def test_staged_but_uncommitted_files_invisible(spark, tmp_path):
    """The manifest log IS the table: data files with no manifest entry
    (a crashed writer's stage) are invisible to readers."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit_overwrite(_df(spark, [(1, "a")]))
    # fabricate a torn stage: file in data/, no manifest references it
    _df(spark, [(9, "torn")]).coalesce(1).write.parquet(str(tmp_path / "x"))
    part = next(
        p for p in os.listdir(str(tmp_path / "x")) if p.endswith(".parquet")
    )
    os.rename(
        str(tmp_path / "x" / part),
        os.path.join(t._data, "deadbeef.parquet"),
    )
    assert _rows(t.read()) == [(1, "a")]


def test_snapshot_isolation_across_commits(spark, tmp_path):
    """A DataFrame pinned to version N keeps returning version N's rows
    no matter what commits afterwards (immutable files + explicit file
    list — never a directory listing)."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit_overwrite(_df(spark, [(1, "old")]))
    pinned = t.read()
    t.commit_overwrite(_df(spark, [(1, "new"), (2, "n2")]))
    assert _rows(pinned) == [(1, "old")]
    assert _rows(t.read()) == [(1, "new"), (2, "n2")]


def test_commit_conflict_and_conditional_commit(spark, tmp_path):
    """The O_EXCL manifest create is the CAS: a stale writer loses with
    CommitConflict, commits nothing, and leaks no files."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit_overwrite(_df(spark, [(1, "a")]))
    # writer A derives from version 0; writer B commits version 1 first
    t.commit_overwrite(_df(spark, [(1, "b")]), expected_parent=0)
    with pytest.raises(CommitConflict):
        t.commit_overwrite(_df(spark, [(1, "stale")]), expected_parent=0)
    assert _rows(t.read()) == [(1, "b")]  # loser's write absent
    # loser's staged files were reclaimed: every data file is referenced
    referenced = set()
    for v in t.versions():
        referenced.update(e["name"] for e in t._read_manifest(v)["files"])
    on_disk = {f for f in os.listdir(t._data) if f.endswith(".parquet")}
    assert on_disk == referenced


def test_merge_commit_retries_on_conflict(spark, tmp_path):
    """Optimistic read-modify-write: when another writer commits between
    a merge's read and its commit, the merge re-derives from the NEW
    base and retries — the final state reflects BOTH writes (no lost
    update, the anomaly the two-rename swap could not rule out)."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit_overwrite(_df(spark, [(1, "base")]))

    interfered = {"done": False}

    def merge_fn(base):
        # simulate a concurrent writer landing AFTER our read, BEFORE
        # our commit — exactly once
        if not interfered["done"]:
            interfered["done"] = True
            t.commit_overwrite(
                base.unionByName(_df(spark, [(2, "concurrent")])),
                expected_parent=t.latest_version(),
            )
        return base.unionByName(_df(spark, [(3, "mine")]))

    t.merge_commit(merge_fn)
    assert _rows(t.read()) == [(1, "base"), (2, "concurrent"), (3, "mine")]


def test_concurrent_merge_commit_stress_no_lost_updates(spark, tmp_path):
    """REAL concurrency (not injected interleaving): 4 threads each run 3
    optimistic merge_commits appending their own distinct rows, racing on
    one table. The O_EXCL manifest CAS must serialize them: every one of
    the 12 appends survives into the final version (no lost updates —
    the anomaly unsynchronized read-modify-write suffers), versions are
    dense, and every data file on disk is manifest-referenced (losers'
    stages reclaimed)."""
    import threading

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit_overwrite(_df(spark, [(0, "base")]))
    errors = []

    def writer(wid: int):
        try:
            for j in range(3):
                row = _df(spark, [(100 * wid + j, f"w{wid}_{j}")])
                t.merge_commit(
                    lambda base, row=row: base.unionByName(row),
                    max_retries=50,
                )
        except Exception as exc:  # pragma: no cover - diagnostic
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(1, 5)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    got = _rows(t.read())
    want = sorted(
        [(0, "base")]
        + [(100 * w + j, f"w{w}_{j}") for w in range(1, 5) for j in range(3)]
    )
    assert got == want  # all 12 concurrent appends survived
    assert t.versions() == list(range(13))  # dense, one per merge
    referenced = set()
    for v in t.versions():
        referenced.update(e["name"] for e in t._read_manifest(v)["files"])
    on_disk = {f for f in os.listdir(t._data) if f.endswith(".parquet")}
    assert on_disk == referenced  # no leaked loser stages


def test_merge_commit_epoch_replay_skips(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    v1 = t.merge_commit(
        lambda base: _df(spark, [(1, "a")]), writer="w", epoch=7
    )
    v2 = t.merge_commit(
        lambda base: base.unionByName(_df(spark, [(2, "b")])),
        writer="w",
        epoch=8,
    )
    # replayed epoch 7: must SKIP (no new version, state unchanged)
    v3 = t.merge_commit(
        lambda base: _df(spark, [(9, "replayed")]), writer="w", epoch=7
    )
    assert (v1, v2, v3) == (0, 1, 1)
    assert _rows(t.read()) == [(1, "a"), (2, "b")]


def test_schema_mismatch_rejected(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit_overwrite(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="schema evolution"):
        t.commit_overwrite(
            spark.createDataFrame([(1.5,)], "x double")
        )
    assert t.latest_version() == 0


def test_manifest_stat_pruning(spark, tmp_path):
    """Iceberg-style data skipping: with stat_columns set, each commit
    records per-file min/max from the parquet FOOTERS into the manifest,
    and read(where=(col, lo, hi)) never opens files whose range cannot
    match. Pruning is an optimization only — a column without stats
    keeps every file, and surviving rows still need the real filter."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.stat_columns = ("k",)
    df = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    t.commit_overwrite(df.repartitionByRange(8, "k"))
    ver = t.latest_version()
    all_files = t.files_for(ver)
    assert len(all_files) == 8
    pruned = t.files_for(ver, where=("k", 0, 999))
    assert 1 <= len(pruned) <= 2  # ~1/8 of the key space
    got = sorted(
        r.k
        for r in t.read(where=("k", 0, 999))
        .filter(F.col("k") <= 999)
        .collect()
    )
    assert got == list(range(1000))  # pruning lost nothing
    # column with no recorded stats: every file kept (never a filter)
    assert t.files_for(ver, where=("v", 0, 0)) == all_files
    # unbounded sides work
    assert len(t.files_for(ver, where=("k", 9_000, None))) <= 2
    assert t.files_for(ver, where=("k", None, None)) == all_files


def test_vacuum_reclaims_only_unreferenced(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    for i in range(4):
        t.commit_overwrite(_df(spark, [(i, f"v{i}")]))
    # a concurrently STAGING writer's file: in data/, in no manifest yet
    inflight = os.path.join(t._data, "aaaa0000inflight.parquet")
    with open(inflight, "wb") as f:
        f.write(b"PAR1")
    stats = t.vacuum(keep_last=2)
    assert stats["dropped_versions"] == [0, 1]
    assert stats["removed_files"] > 0
    assert t.versions() == [2, 3]
    assert _rows(t.read(version=2)) == [(2, "v2")]  # kept versions readable
    assert _rows(t.read()) == [(3, "v3")]
    with pytest.raises(FileNotFoundError):
        t.read(version=0)
    # the in-flight stage survived vacuum (the Delta VACUUM race guard):
    # only files referenced exclusively by dropped manifests are removed
    assert os.path.exists(inflight)
    # ...and the age-gated orphan GC reclaims it only past the retention
    assert t.gc_orphans(older_than_seconds=3600)["removed_files"] == 0
    assert os.path.exists(inflight)
    assert t.gc_orphans(older_than_seconds=0)["removed_files"] == 1
    assert not os.path.exists(inflight)


def test_analytics_pipeline_versioned_publish(spark, tmp_path):
    """AnalyticsPipeline.load(versioned=True): each output table lands as
    a versioned-table commit — a second run publishes version 1 on top,
    the previous run stays time-travelable, and read-back equals the
    transformed relation."""
    from sales_etl_pipeline_spark.operators.pipeline import AnalyticsPipeline

    out = str(tmp_path / "out")
    pipe = AnalyticsPipeline(spark, SF, out)
    pipe.extract()
    pipe.transform()
    written = pipe.load(versioned=True)
    assert sorted(written) == ["versioned"]
    assert all(p.endswith("@v0") for p in written["versioned"])
    t = VersionedTable(spark, os.path.join(out, "versioned", "country_summary"))
    want = _rows(pipe.transformed_data["country_summary"])
    assert _rows(t.read()) == want
    assert t.history()[0]["operation"] == "publish"
    # second publish: version 1, version 0 still readable
    pipe2 = AnalyticsPipeline(spark, SF, out)
    pipe2.extract()
    pipe2.transform()
    written2 = pipe2.load(versioned=True)
    assert all(p.endswith("@v1") for p in written2["versioned"])
    assert _rows(t.read(version=0)) == want
    assert _rows(t.read(version=1)) == want  # same inputs ⇒ same table


def test_versioned_cdc_merge_stream_equals_batch(spark, tmp_path):
    """The versioned merge sink over a 4-chunk changelog stream: final
    version ≡ batch cdc_latest_snapshot, every epoch left a time-travel
    version, history carries (writer, epoch), and a full stream REPLAY
    (fresh checkpoint, same data) commits nothing new."""
    from sales_etl_pipeline_spark.plans.cdc import cdc_latest_snapshot
    from sales_etl_pipeline_spark.sources.readers import (
        load_events,
        normalize_event_ts,
    )
    from sales_etl_pipeline_spark.streaming import jobs

    pdf = load_events(spark, SF).orderBy("ts").toPandas()
    pdf["ts"] = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    src = tmp_path / "chunks"
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
    root = str(tmp_path / "table")
    jobs.run_cdc_merge_stream_versioned(
        normalize_event_ts(raw), root, str(tmp_path / "ckpt")
    )
    t = VersionedTable(spark, root)
    assert len(t.versions()) == 4  # one committed version per epoch
    cols = ["user_id", "last_event_id", "last_ts", "last_event_type", "last_value"]
    got = _rows(t.read().select(cols))
    want = _rows(cdc_latest_snapshot(spark, SF).select(cols))
    assert got == want
    assert [h["epoch"] for h in t.history()] == [0, 1, 2, 3]
    assert all(h["writer"] == "cdc_merge" for h in t.history())
    # per-epoch time travel: version k ≡ batch latest-wins over exactly
    # the first k+1 chunks (sizes are NOT monotone — tombstone chunks
    # legitimately shrink the snapshot, so compare content, not counts)
    from sales_etl_pipeline_spark.plans.cdc import _latest_wins

    for k in t.versions():
        prefix = normalize_event_ts(
            spark.read.schema(jobs.EVENTS_RAW_SCHEMA).parquet(
                *[str(src / f"part{i}.parquet") for i in range(k + 1)]
            )
        )
        assert _rows(t.read(version=k).select(cols)) == _rows(
            _latest_wins(prefix).select(cols)
        )
    # replay the whole stream with a FRESH checkpoint: every epoch is
    # already in the log -> skipped, no new versions
    jobs.run_cdc_merge_stream_versioned(
        normalize_event_ts(
            spark.readStream.schema(jobs.EVENTS_RAW_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        ),
        root,
        str(tmp_path / "ckpt2"),
    )
    assert len(t.versions()) == 4
    assert _rows(t.read().select(cols)) == want


def test_torn_trailing_manifest_tolerated_and_recovered(spark, tmp_path):
    """A writer killed mid-publish under the pre-link protocol left a
    0-byte/partial newest manifest. Readers must treat it as never
    committed (last good version stays readable), and the NEXT commit
    must recover the version slot instead of conflicting forever."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit_overwrite(_df(spark, [(1, "a")]))
    t.commit_overwrite(_df(spark, [(1, "a"), (2, "b")]))
    # fabricate the torn manifest the OLD protocol could leave
    with open(t._manifest_path(2), "w") as f:
        f.write('{"files": [')  # partial payload
    assert t.versions() == [0, 1]  # torn tail invisible
    assert t.latest_version() == 1
    assert _rows(t.read()) == [(1, "a"), (2, "b")]  # reads keep working
    assert [h["version"] for h in t.history()] == [0, 1]
    # the next commit claims version 2 by recovering the torn slot
    v = t.commit_overwrite(_df(spark, [(3, "c")]))
    assert v == 2
    assert t.versions() == [0, 1, 2]
    assert _rows(t.read()) == [(3, "c")]
    assert t._read_manifest(2)["operation"] == "overwrite"  # parses now


def test_manifest_publish_leaves_no_temp_files(spark, tmp_path):
    """The link-publish protocol: after any commit, _log holds only
    fully written manifests — no temp files, every manifest parses."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    for i in range(3):
        t.commit_overwrite(_df(spark, [(i, f"v{i}")]))
    names = sorted(os.listdir(t._log))
    assert all(n.endswith(".json") and not n.startswith(".") for n in names)
    for v in t.versions():
        assert isinstance(t._read_manifest(v), dict)


def test_commit_append_carries_parent_files_forward(spark, tmp_path):
    """commit_append: the new manifest = parent files + staged files, so
    reads see the union without rewriting a byte of old data; rows
    accumulate in history; time travel still sees the pre-append state."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit_overwrite(_df(spark, [(1, "a"), (2, "b")]))
    n_files_v0 = len(t.files_for(0))
    v = t.commit_append(_df(spark, [(3, "c")]))
    assert v == 1
    assert _rows(t.read()) == [(1, "a"), (2, "b"), (3, "c")]
    assert _rows(t.read(version=0)) == [(1, "a"), (2, "b")]
    # parent's files are referenced by BOTH manifests (immutable reuse)
    v0 = {e["name"] for e in t._read_manifest(0)["files"]}
    v1 = {e["name"] for e in t._read_manifest(1)["files"]}
    assert v0 < v1 and len(v1) > n_files_v0
    assert t.history()[1]["rows"] == 3  # cumulative row count


def test_additive_schema_evolution(spark, tmp_path):
    """A commit may ADD nullable columns: the manifest records the
    evolved schema, files from older versions are read with nulls for
    the new column (old + new files in ONE read via commit_append), and
    pre-evolution versions time-travel with their own schema. Drops,
    type changes, and non-nullable additions still raise."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit_overwrite(_df(spark, [(1, "a"), (2, "b")]))
    evolved = spark.createDataFrame(
        [(3, "c", "X")], "k long, v string, extra string"
    )
    v = t.commit_append(evolved)
    assert v == 1
    got = sorted(
        (r.k, r.v, r.extra) for r in t.read().collect()
    )  # one read spanning old-schema and new-schema files
    assert got == [(1, "a", None), (2, "b", None), (3, "c", "X")]
    # time travel: version 0 keeps its own (narrower) schema
    assert t.read(version=0).columns == ["k", "v"]
    # overwrite path evolves too
    t.commit_overwrite(
        spark.createDataFrame([(9, "z", None)], "k long, v string, extra string")
    )
    assert [r.extra for r in t.read().collect()] == [None]
    # non-additive changes raise (and commit nothing)
    latest = t.latest_version()
    with pytest.raises(ValueError, match="dropped"):
        t.commit_append(_df(spark, [(4, "d")]))  # missing 'extra'
    with pytest.raises(ValueError, match="changed type"):
        t.commit_overwrite(
            spark.createDataFrame(
                [(1.0, "a", "x")], "k double, v string, extra string"
            )
        )
    assert t.latest_version() == latest


def test_compact_commit_same_rows_new_files(spark, tmp_path):
    """OPTIMIZE: compact() rewrites the latest version's small files into
    size-derived right-sized ones as an operation="compact" commit —
    identical rows, fewer files, pre-compaction versions still
    time-travelable, manifest stats regenerated for pruning."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.stat_columns = ("k",)
    df = spark.range(0, 5_000).select(
        F.col("id").alias("k"), F.lit("x").alias("v")
    )
    t.commit_overwrite(df.repartition(16))  # 16 tiny files
    assert len(t.files_for(0)) == 16
    before = _rows(t.read())
    stats = t.compact(target_bytes=1 << 30)  # everything fits in 1 file
    assert stats == {
        "version": 1,
        "files_in": 16,
        "files_out": 1,
        "bytes": stats["bytes"],
    }
    assert stats["bytes"] > 0
    assert _rows(t.read()) == before  # row identity across compaction
    assert t.history()[1]["operation"] == "compact"
    assert len(t.files_for(0)) == 16  # time travel intact pre-compaction
    assert _rows(t.read(version=0)) == before
    # stats were regenerated on the rewritten file (pruning still works)
    m = t._read_manifest(1)
    assert m["files"][0]["stats"]["k"] == [0, 4999]
    # vacuum drops the 16 small files once version 0 ages out
    t.vacuum(keep_last=1)
    on_disk = {f for f in os.listdir(t._data) if f.endswith(".parquet")}
    assert on_disk == {e["name"] for e in m["files"]}


def test_compact_zorder_restores_pruning(spark, tmp_path):
    """OPTIMIZE ZORDER BY: epoch-ordered appends cluster on nothing, so
    range reads open every file; compact(zorder_by=(k, j)) rewrites the
    same rows clustered on the Morton key and the regenerated manifest
    stats prune file reads on BOTH columns. Row identity across the
    compaction commit is exact."""
    from pyspark.sql import functions as F

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.stat_columns = ("k", "j")
    # 4 append epochs, each spanning the FULL k/j range (worst case for
    # pruning: every file overlaps every range predicate)
    base = spark.range(4000).select(
        F.col("id").alias("rid"),
        (F.col("id") % 100).cast("long").alias("k"),
        ((F.col("id") * 7) % 100).cast("long").alias("j"),
    )
    for e in range(4):
        t.commit_append(
            base.filter(F.col("rid") % 4 == e).repartition(2), epoch=e,
            writer="load",
        )
    pre = t.latest_version()
    n_files_pre = len(t.files_for(pre))
    pruned_pre = len(t.files_for(pre, where=("k", 10, 12)))
    assert pruned_pre == n_files_pre  # nothing prunable before
    res = t.compact(target_bytes=5_000, zorder_by=("k", "j"))
    post = res["version"]
    n_files_post = len(t.files_for(post))
    assert n_files_post > 1  # multiple files, else pruning is vacuous
    # both clustered columns now prune files (z-order trades perfect
    # single-column pruning for partial pruning on EVERY clustered
    # column; pre-compaction skipped zero)
    assert len(t.files_for(post, where=("k", 10, 12))) <= n_files_post - 2
    assert len(t.files_for(post, where=("j", 10, 12))) <= n_files_post - 2
    # same rows, exactly
    want = sorted(map(tuple, t.read(pre).collect()))
    got = sorted(map(tuple, t.read(post).collect()))
    assert got == want
    # pruned read returns every matching row (pruning is never a filter)
    assert (
        t.read(post, where=("k", 10, 12)).filter("k between 10 and 12").count()
        == base.filter("k between 10 and 12").count()
    )


def test_delete_where_copy_on_write_file_grain(spark, tmp_path):
    """DELETE rewrites ONLY files containing a matching row: with 8
    range-partitioned files, a single-range predicate leaves the other
    files' manifest entries byte-identical (same names, same stats),
    removes exactly the matching rows, keeps time travel, and records
    operation='delete' with the updated row count."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.stat_columns = ("k",)
    df = spark.range(0, 8_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    t.commit_overwrite(df.repartitionByRange(8, "k"))
    before = {e["name"]: e for e in t._read_manifest(0)["files"]}

    res = t.delete_where("k >= 1000 AND k < 2000")
    assert res["version"] == 1
    assert res["deleted"] == 1000
    # range partitioner boundaries are approximate: the range spans 1-2
    # files, never all 8
    assert 1 <= res["files_rewritten"] <= 2
    assert res["files_kept"] == 8 - res["files_rewritten"]

    after = {e["name"]: e for e in t._read_manifest(1)["files"]}
    carried = set(before) & set(after)
    assert len(carried) == res["files_kept"]
    for n in carried:  # stats carried forward untouched, no rewrite
        assert before[n] == after[n]

    assert t.read().filter("k >= 1000 AND k < 2000").count() == 0
    assert t.read().count() == 7_000
    assert t.read(version=0).count() == 8_000  # time travel intact
    h = t.history()[-1]
    assert h["operation"] == "delete" and h["rows"] == 7_000

    # prune hint: same result, fewer files even scanned for matches
    res2 = t.delete_where("k < 500", prune=("k", None, 499))
    assert res2["deleted"] == 500
    assert t.read().count() == 6_500


def test_delete_where_null_predicate_rows_kept(spark, tmp_path):
    """SQL DELETE semantics: rows where the predicate evaluates to NULL
    are NOT deleted (only WHERE=TRUE rows go)."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit_overwrite(
        spark.createDataFrame(
            [(1, "a"), (2, None), (3, "b")], "k long, v string"
        )
    )
    res = t.delete_where("v = 'a'")  # NULL = 'a' is NULL, not TRUE
    assert res["deleted"] == 1
    assert _rows(t.read()) == [(2, None), (3, "b")]


def test_delete_where_no_match_commits_nothing(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit_overwrite(_df(spark, [(1, "a")]))
    res = t.delete_where("k = 999")
    assert (res["version"], res["deleted"], res["files_rewritten"]) == (
        0,
        0,
        0,
    )
    assert res["files_kept"] == len(t.files_for(0))
    assert t.versions() == [0]


def test_delete_where_whole_file_and_cdf_rows(spark, tmp_path):
    """Deleting every row of a file drops it from the manifest; with
    key_columns set the deleted rows ride the manifest as
    _change_type='delete' CDF rows, exactly the rows removed."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.key_columns = ("k",)
    t.commit_overwrite(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    res = t.delete_where("k <= 2")
    assert res["deleted"] == 2
    assert _rows(t.read()) == [(3, "c")]
    cdf = t._read_manifest(res["version"])["cdf"]
    assert cdf["mode"] == "diff"
    chg = spark.read.parquet(
        *[os.path.join(t._data, n) for n in cdf["files"]]
    )
    got = sorted((r.k, r.v, r._change_type) for r in chg.collect())
    assert got == [(1, "a", "delete"), (2, "b", "delete")]


def test_delete_where_epoch_replay_skips(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit_overwrite(_df(spark, [(1, "a"), (2, "b")]))
    r1 = t.delete_where("k = 1", writer="job", epoch=7)
    assert r1["deleted"] == 1 and t.read().count() == 1
    r2 = t.delete_where("k = 2", writer="job", epoch=7)  # replayed epoch
    assert r2.get("replayed") and t.read().count() == 1  # no second delete


def test_retention_delete_stream(spark, tmp_path):
    """Streaming erasure queue → per-epoch copy-on-write deletes: final
    table ≡ base minus all requested keys, each epoch left an
    operation='delete' version, erased rows rode the CDF as deletes,
    and a full queue REPLAY (fresh checkpoint) commits nothing new."""
    from sales_etl_pipeline_spark.streaming import jobs

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.key_columns = ("k",)
    t.stat_columns = ("k",)
    base = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("v")
    )
    t.commit_overwrite(base.repartitionByRange(4, "k"))

    # 2-chunk erasure queue: keys 10..19, then 500..509 (+ a no-op dup)
    src = tmp_path / "queue"
    src.mkdir()
    spark.createDataFrame([(int(k),) for k in range(10, 20)], "k long") \
        .coalesce(1).write.parquet(str(src / "c0"))
    spark.createDataFrame(
        [(int(k),) for k in list(range(500, 510)) + [10]], "k long"
    ).coalesce(1).write.parquet(str(src / "c1"))

    def queue_stream():
        return (
            spark.readStream.schema("k long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/c*")
        )

    jobs.run_retention_delete_stream(
        queue_stream(),
        t.root,
        str(tmp_path / "ckpt"),
        key_col="k",
        key_columns=("k",),
        stat_columns=("k",),
    )
    erased = set(range(10, 20)) | set(range(500, 510))
    assert {r.k for r in t.read().collect()} == set(range(1000)) - erased
    dels = [h for h in t.history() if h["operation"] == "delete"]
    assert len(dels) == 2
    assert all(h["writer"] == "retention_delete" for h in dels)
    # CDF carried every erased row exactly once as a delete
    chg = []
    for h in dels:
        cdf = t._read_manifest(h["version"])["cdf"]
        assert cdf["mode"] == "diff"
        chg += spark.read.parquet(
            *[os.path.join(t._data, n) for n in cdf["files"]]
        ).collect()
    assert {r.k for r in chg} == erased
    assert all(r._change_type == "delete" for r in chg)
    # replay with a fresh checkpoint: epochs already committed -> no-op
    n_versions = len(t.versions())
    jobs.run_retention_delete_stream(
        queue_stream(), t.root, str(tmp_path / "ckpt2"), key_col="k"
    )
    assert len(t.versions()) == n_versions


def test_sql_key_literal_escaping(spark):
    """Spark's parser treats backslash as an escape inside string
    literals, so BOTH must be escaped — and a hostile deletion key must
    parse as a plain value, not break out of the IN-list (verified by
    evaluating the generated predicate)."""
    from sales_etl_pipeline_spark.streaming.jobs import _sql_key_literal

    assert _sql_key_literal(7) == "7"
    assert _sql_key_literal("a'b") == "'a\\'b'"
    assert _sql_key_literal("a\\b") == "'a\\\\b'"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _sql_key_literal(None)

    hostile = ["a\\') OR (1=1) --", "a\\", "plain", "q'q"]
    df = spark.createDataFrame([(k,) for k in hostile + ["safe"]], "k string")
    pred = f"k IN ({', '.join(_sql_key_literal(k) for k in hostile)})"
    kept = {r.k for r in df.filter(pred).collect()}
    assert kept == set(hostile)  # exactly the listed keys — no breakout


def test_bloom_equality_skipping(spark, tmp_path):
    """Per-file bloom filters prune point lookups min/max cannot: with
    hash-partitioned uuid-like keys every file spans the whole key
    range (stats useless), but where_eq keeps only the 1-2 files whose
    bloom may contain the key — and pruning NEVER loses the row
    (checked for 20 sampled keys), while an absent key prunes ~98% of
    files (2% FP rate at 8 bits/key)."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.stat_columns = ("uid",)
    t.bloom_columns = ("uid",)
    df = spark.range(0, 20_000).select(
        F.md5(F.col("id").cast("string")).alias("uid"),
        F.col("id").alias("v"),
    )
    t.commit_overwrite(df.repartition(16, "uid"))
    ver = t.latest_version()
    all_files = t.files_for(ver)
    assert len(all_files) == 16
    # min/max is useless here: every file spans ~the full md5 range
    assert t.files_for(ver, where=("uid", "8", "80")) == all_files

    import hashlib

    keys = [hashlib.md5(str(i).encode()).hexdigest() for i in range(0, 2000, 100)]
    for k in keys:
        kept = t.files_for(ver, where_eq=("uid", k))
        assert len(kept) <= 3  # 1 true file + rare false positives
        got = t.read(where_eq=("uid", k)).filter(F.col("uid") == k).collect()
        assert len(got) == 1  # never a false negative
    # absent keys: almost everything pruned
    misses = [hashlib.md5(f"absent{i}".encode()).hexdigest() for i in range(50)]
    kept_counts = [len(t.files_for(ver, where_eq=("uid", m))) for m in misses]
    assert sum(kept_counts) <= 0.1 * 16 * len(misses)  # ≤10% avg kept
    # a column without blooms is never pruned
    assert t.files_for(ver, where_eq=("v", 5)) == all_files


def test_bloom_type_mismatch_never_prunes(spark, tmp_path):
    """ADVICE r10: bloom canonicalization is str(value), so a probe of a
    different-but-equal TYPE (1 vs 1.0 vs '1') hashes differently. The
    bloom entry now records the type tags it was built from, and a
    probe whose tag the file never stored KEEPS the file — pruning must
    degrade to a no-op, never become a (wrong) filter."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.bloom_columns = ("k",)
    t.commit_overwrite(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
        .repartition(2, "k")
    )
    ver = t.latest_version()
    all_files = t.files_for(ver)
    # same-typed probe: normal bloom behavior (hit keeps ≥1, miss prunes)
    assert len(t.files_for(ver, where_eq=("k", 1))) >= 1
    # differently-typed probes of an EXISTING value: no pruning at all
    assert t.files_for(ver, where_eq=("k", 1.0)) == all_files
    assert t.files_for(ver, where_eq=("k", "1")) == all_files
    assert t.files_for(ver, where_eq=("k", True)) == all_files
    # and the read path agrees (int64 column: 1.0 compares equal in SQL)
    got = t.read(where_eq=("k", 1.0)).filter(F.col("k") == 1.0).collect()
    assert len(got) == 1


def test_committed_at_monotone_under_writer_clock_skew(spark, tmp_path):
    """ADVICE r10: a writer with a FUTURE clock commits v0; v1's
    committed_at must be clamped to ≥ v0's (Delta-style monotonicity)
    so read_as_of(ts) can never return a snapshot containing data
    committed after ts in version order."""
    import time

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit_overwrite(_df(spark, [(1, "a")]))
    # simulate clock skew: rewrite v0's manifest with a far-future clock
    future = time.time() + 3600.0
    mpath = t._manifest_path(0)
    m = json.load(open(mpath))
    m["committed_at"] = future
    with open(mpath, "w") as f:
        json.dump(m, f)
    t.commit_overwrite(_df(spark, [(1, "b")]))
    at0 = t._read_manifest(0)["committed_at"]
    at1 = t._read_manifest(1)["committed_at"]
    assert at1 >= at0 == future
    # AS OF the skewed timestamp resolves to the newest version whose
    # committed_at <= ts — consistent with version order again
    assert t.version_as_of(future + 1) == 1
    assert _rows(t.read(t.version_as_of(future))) == [(1, "b")]


def test_merge_into_rejects_duplicate_source_keys(spark, tmp_path):
    """ADVICE r10: SQL MERGE's multiple-matched-rows condition is now
    enforced — duplicate source keys raise instead of silently landing
    as duplicate rows; check_source_unique=False restores the
    caller-owns-precondition behavior."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.merge_into(_df(spark, [(1, "a"), (2, "b")]), on=("k",))
    dup_src = _df(spark, [(2, "B"), (2, "B2"), (3, "c")])
    with pytest.raises(ValueError, match="duplicate source keys"):
        t.merge_into(dup_src, on=("k",))
    # nothing committed by the failed merge
    assert _rows(t.read()) == [(1, "a"), (2, "b")]
    # explicit opt-out keeps the documented join-multiplication behavior
    t.merge_into(dup_src, on=("k",), check_source_unique=False)
    assert t.read().filter("k = 2").count() == 2


def test_sql_key_literal_rejects_non_finite_floats(spark):
    """ADVICE r10: repr(nan)/repr(inf) are bare identifiers Spark would
    parse as column references — reject up front like bool/None."""
    from sales_etl_pipeline_spark.streaming.jobs import _sql_key_literal

    for bad in (float("nan"), float("inf"), float("-inf")):
        with pytest.raises(ValueError, match="non-finite"):
            _sql_key_literal(bad)
    assert _sql_key_literal(1.5) == "1.5"


def test_bloom_prunes_delete_where(spark, tmp_path):
    """Single-key erasure on an unordered key: prune_eq restricts even
    the match scan to bloom-positive files; the delete still lands."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.bloom_columns = ("uid",)
    t.key_columns = ("uid",)
    df = spark.range(0, 5_000).select(
        F.md5(F.col("id").cast("string")).alias("uid"),
        F.col("id").alias("v"),
    )
    t.commit_overwrite(df.repartition(8, "uid"))
    import hashlib

    target = hashlib.md5(b"42").hexdigest()
    res = t.delete_where(
        f"uid = '{target}'", prune_eq=("uid", target)
    )
    assert res["deleted"] == 1
    assert res["files_rewritten"] <= 2  # bloom-positive files only
    assert t.read().filter(F.col("uid") == target).count() == 0
    assert t.read().count() == 4_999


def test_read_as_of_timestamp(spark, tmp_path):
    """AS OF TIMESTAMP: reads resolve to the newest version committed
    at or before the given wall time; earlier-than-v0 raises."""
    import time

    t = VersionedTable(spark, str(tmp_path / "t"))
    before_any = time.time()
    t.commit_overwrite(_df(spark, [(1, "v0")]))
    between = time.time()
    time.sleep(0.01)
    t.commit_overwrite(_df(spark, [(1, "v1")]))
    after_all = time.time()
    assert t.version_as_of(between) == 0
    assert _rows(t.read_as_of(between)) == [(1, "v0")]
    assert t.version_as_of(after_all) == 1
    assert _rows(t.read_as_of(after_all)) == [(1, "v1")]
    with pytest.raises(FileNotFoundError):
        t.version_as_of(before_any - 60)
    assert all(h["committed_at"] is not None for h in t.history())


def test_verify_detects_loss_and_tamper(spark, tmp_path):
    """verify(): clean table passes; a deleted data file and a swapped
    (tampered) file are both detected against the manifest."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.stat_columns = ("k",)
    t.commit_overwrite(
        spark.range(0, 1000)
        .select(F.col("id").alias("k"), (F.col("id") % 3).alias("v"))
        .repartitionByRange(4, "k")
    )
    res = t.verify()
    assert res["ok"] and res["rows_found"] == res["rows_expected"] == 1000

    names = t.files_for(0)
    # tamper: overwrite one referenced file with a different one's bytes
    import shutil as _sh

    a, b = (os.path.join(t._data, n) for n in names[:2])
    _sh.copyfile(b, a)
    res = t.verify(0)
    assert not res["ok"]
    assert {m["column"] for m in res["stat_mismatches"]} == {"k"}
    # loss: remove a referenced file outright
    os.remove(os.path.join(t._data, names[3]))
    res = t.verify(0)
    assert names[3] in res["missing_files"]


def test_merge_into_upsert_delete_insert_modes(spark, tmp_path):
    """MERGE INTO semantics: whole-row update on match, optional
    delete-on-match, insert-when-unmatched, creation on empty table,
    and epoch-replay idempotence via merge_commit."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    # empty table: all-insert
    t.merge_into(_df(spark, [(1, "a"), (2, "b")]), on=("k",))
    assert _rows(t.read()) == [(1, "a"), (2, "b")]
    # upsert: update 2, insert 3, leave 1
    t.merge_into(_df(spark, [(2, "B"), (3, "c")]), on=("k",))
    assert _rows(t.read()) == [(1, "a"), (2, "B"), (3, "c")]
    # matched-delete: remove 1 and 3, key 9 unmatched and NOT inserted
    t.merge_into(
        _df(spark, [(1, "x"), (3, "x"), (9, "x")]),
        on=("k",),
        when_matched="delete",
        when_not_matched=None,
    )
    assert _rows(t.read()) == [(2, "B")]
    # matched=None: only inserts land
    t.merge_into(
        _df(spark, [(2, "zzz"), (4, "d")]),
        on=("k",),
        when_matched=None,
    )
    assert _rows(t.read()) == [(2, "B"), (4, "d")]
    # replayed epoch: no-op
    v = t.merge_into(
        _df(spark, [(5, "e")]), on=("k",), writer="m", epoch=1
    )
    v2 = t.merge_into(
        _df(spark, [(6, "f")]), on=("k",), writer="m", epoch=1
    )
    assert v2 == v and t.read().filter("k = 6").count() == 0


def test_merge_into_cdf_records_update_images(spark, tmp_path):
    """With key_columns set, an upsert's CDF carries pre+post images
    for updates and inserts for new keys."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.key_columns = ("k",)
    t.commit_overwrite(_df(spark, [(1, "a"), (2, "b")]))
    v = t.merge_into(_df(spark, [(2, "B"), (3, "c")]), on=("k",))
    cdf = t._read_manifest(v)["cdf"]
    assert cdf["mode"] == "diff"
    chg = spark.read.parquet(
        *[os.path.join(t._data, n) for n in cdf["files"]]
    )
    got = sorted((r.k, r.v, r._change_type) for r in chg.collect())
    assert got == [
        (2, "B", "update_postimage"),
        (2, "b", "update_preimage"),
        (3, "c", "insert"),
    ]


def test_merge_into_matches_dict_model_property(spark, tmp_path):
    """Property: any sequence of MERGE INTO upsert/delete batches leaves
    the table equal to a plain Python dict replaying the same ops — the
    executable spec of the MERGE semantics."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    batch = st.lists(
        st.tuples(st.integers(0, 9), st.sampled_from("abc")),
        min_size=1,
        max_size=4,
        unique_by=lambda t: t[0],  # MERGE requires key-unique sources
    )
    ops = st.lists(
        st.tuples(st.sampled_from(["update", "delete"]), batch),
        min_size=1,
        max_size=5,
    )

    counter = [0]

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(seq=ops)
    def check(seq):
        counter[0] += 1
        t = VersionedTable(spark, str(tmp_path / f"m{counter[0]}"))
        model: dict = {}
        for when_matched, rows in seq:
            t.merge_into(
                _df(spark, [(k, v) for k, v in rows]),
                on=("k",),
                when_matched=when_matched,
                when_not_matched="insert" if when_matched == "update" else None,
            )
            for k, v in rows:
                if when_matched == "update":
                    model[k] = v
                elif k in model:
                    del model[k]
        assert _rows(t.read()) == sorted(model.items())

    check()
