"""Multi-table ACID transactions (sources/catalog.py): atomic cross-
table commit, all-or-nothing failure, crash-window roll-forward,
epoch idempotence, genuinely concurrent writers, CDF-through-catalog,
and out-of-band-write detection."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from sales_etl_pipeline_spark.sources.catalog import (  # noqa: E402
    CatalogCorruption,
    TableCatalog,
)


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "k long, v string")


def test_txn_commits_tables_atomically_and_snapshots_align(spark, tmp_path):
    cat = TableCatalog(spark, str(tmp_path / "cat"))
    seq0 = cat.commit(
        overwrites={
            "snap": _df(spark, [(1, "a"), (2, "b")]),
            "summary": spark.createDataFrame([(2,)], "n long"),
        }
    )
    seq1 = cat.commit(
        overwrites={
            "snap": _df(spark, [(1, "a"), (2, "b"), (3, "c")]),
            "summary": spark.createDataFrame([(3,)], "n long"),
        }
    )
    assert (seq0, seq1) == (0, 1)
    # each catalog snapshot pins a mutually-consistent version pair
    assert cat.snapshot(seq0) == {"snap": 0, "summary": 0}
    assert cat.snapshot(seq1) == {"snap": 1, "summary": 1}
    assert cat.read("summary", seq0).first().n == 2
    assert cat.read("snap", seq0).count() == 2
    assert cat.read("summary", seq1).first().n == 3
    assert cat.read("snap", seq1).count() == 3
    # txn history carries the audit trail
    assert [h["tables"] for h in cat.history()] == [
        {"snap": 0, "summary": 0},
        {"snap": 1, "summary": 1},
    ]


def test_txn_failure_is_all_or_nothing(spark, tmp_path):
    cat = TableCatalog(spark, str(tmp_path / "cat"))
    cat.commit(
        overwrites={
            "a": _df(spark, [(1, "x")]),
            "b": spark.createDataFrame([(1,)], "n long"),
        }
    )
    # second txn: table "a" is fine, table "b" attempts a TYPE CHANGE
    # (non-additive evolution) — the whole transaction must fail with
    # NEITHER table advancing
    with pytest.raises(ValueError, match="type"):
        cat.commit(
            overwrites={
                "a": _df(spark, [(2, "y")]),
                "b": spark.createDataFrame([("oops",)], "n string"),
            }
        )
    assert cat.snapshot() == {"a": 0, "b": 0}
    assert cat.table("a").latest_version() == 0
    assert cat.table("b").latest_version() == 0
    assert [r.v for r in cat.read("a").collect()] == ["x"]
    # the failed txn's staged files were discarded: nothing unreferenced
    for name in ("a", "b"):
        t = cat.table(name)
        referenced = set()
        for v in t.versions():
            referenced.update(t._manifest_refs(t._read_manifest(v)))
        on_disk = {
            f for f in os.listdir(t._data) if f.endswith(".parquet")
        }
        assert on_disk == referenced


def test_crash_between_txn_commit_and_publish_rolls_forward(spark, tmp_path):
    """The atomicity crash window: the txn record is durable but the
    per-table manifests were never published (writer died). Any later
    catalog operation publishes them from the record — both tables
    surface together, never one without the other."""
    cat = TableCatalog(spark, str(tmp_path / "cat"))
    cat.commit(
        overwrites={
            "a": _df(spark, [(1, "x")]),
            "b": _df(spark, [(1, "y")]),
        }
    )
    # simulate the crash: prepare + txn-CAS by hand, skip publish
    pa = cat.table("a").prepare_commit(_df(spark, [(2, "xx")]))
    pb = cat.table("b").prepare_commit(_df(spark, [(2, "yy")]))
    record = {
        "seq": 1,
        "writer": None,
        "epoch": None,
        "tables": {
            n: {
                "version": p["version"],
                "manifest": {
                    k: p[k]
                    for k in (
                        "files", "schema", "operation", "writer",
                        "epoch", "rows", "parent", "cdf",
                    )
                },
            }
            for n, p in (("a", pa), ("b", pb))
        },
        "table_versions": {"a": 1, "b": 1},
    }
    cat._try_commit_txn(1, record)
    # manifests not yet published — direct table reads still see v0
    assert cat.table("a").latest_version() == 0
    # a FRESH catalog (new process) rolls forward on first read
    cat2 = TableCatalog(spark, str(tmp_path / "cat"))
    assert cat2.snapshot() == {"a": 1, "b": 1}
    assert [r.v for r in cat2.read("a").collect()] == ["xx"]
    assert [r.v for r in cat2.read("b").collect()] == ["yy"]
    # roll-forward is idempotent
    cat2.roll_forward()
    assert cat2.table("a").versions() == [0, 1]


def test_epoch_replay_returns_original_seq(spark, tmp_path):
    cat = TableCatalog(spark, str(tmp_path / "cat"))
    s1 = cat.commit(
        overwrites={"a": _df(spark, [(1, "x")])}, writer="job", epoch=7
    )
    s2 = cat.commit(
        overwrites={"a": _df(spark, [(9, "SHOULD NOT LAND")])},
        writer="job",
        epoch=7,
    )
    assert s1 == s2
    assert cat.latest_seq() == s1
    assert [r.v for r in cat.read("a").collect()] == ["x"]


def test_mixed_overwrite_append_txn(spark, tmp_path):
    cat = TableCatalog(spark, str(tmp_path / "cat"))
    cat.commit(
        overwrites={"snap": _df(spark, [(1, "a")])},
        appends={"log": _df(spark, [(1, "evt1")])},
    )
    cat.commit(
        overwrites={"snap": _df(spark, [(1, "a2")])},
        appends={"log": _df(spark, [(2, "evt2")])},
    )
    assert sorted(r.v for r in cat.read("log").collect()) == [
        "evt1", "evt2"
    ]
    assert [r.v for r in cat.read("snap").collect()] == ["a2"]
    # append carried the old file forward: log has 2 versions
    assert cat.table("log").versions() == [0, 1]
    with pytest.raises(ValueError, match="more than one write group"):
        cat.commit(
            overwrites={"x": _df(spark, [(1, "a")])},
            appends={"x": _df(spark, [(1, "b")])},
        )


def test_cdf_flows_through_catalog_commits(spark, tmp_path):
    cat = TableCatalog(spark, str(tmp_path / "cat"))
    cat.configure("snap", key_columns=("k",))
    cat.commit(overwrites={"snap": _df(spark, [(1, "a"), (2, "b")])})
    cat.commit(overwrites={"snap": _df(spark, [(1, "a"), (2, "B"), (3, "c")])})
    m = cat.table("snap")._read_manifest(1)
    assert m["cdf"]["mode"] == "diff"
    from sales_etl_pipeline_spark.sources import table_feed

    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = (
        table_feed.read_feed(spark, cat.table("snap").root, cdf=True)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.k, r._change_type)
        for r in spark.read.parquet(out).collect()
    }
    assert (3, "insert") in got
    assert (2, "update_postimage") in got


def test_out_of_band_write_detected(spark, tmp_path):
    """A direct VersionedTable write stealing a version the txn log has
    promised is the managed-table-contract violation — roll-forward
    must surface CatalogCorruption, never silently re-point."""
    cat = TableCatalog(spark, str(tmp_path / "cat"))
    cat.commit(overwrites={"a": _df(spark, [(1, "x")])})
    p = cat.table("a").prepare_commit(_df(spark, [(2, "txn")]))
    record = {
        "seq": 1,
        "writer": None,
        "epoch": None,
        "tables": {
            "a": {
                "version": p["version"],
                "manifest": {
                    k: p[k]
                    for k in (
                        "files", "schema", "operation", "writer",
                        "epoch", "rows", "parent", "cdf",
                    )
                },
            }
        },
        "table_versions": {"a": 1},
    }
    cat._try_commit_txn(1, record)
    # rogue direct writer takes version 1 first
    cat.table("a").commit_overwrite(_df(spark, [(9, "rogue")]))
    with pytest.raises(CatalogCorruption, match="outside the catalog"):
        cat.roll_forward()


def test_concurrent_catalog_writers_serialize(spark, tmp_path):
    """4 threads × 3 txns each against overlapping tables: every commit
    lands (retry loop absorbs conflicts), seqs are contiguous and
    unique, and the final snapshot equals the data of whichever txn
    committed last — verified via the txn log, not assumptions."""
    import threading

    cat = TableCatalog(spark, str(tmp_path / "cat"))
    cat.commit(
        overwrites={
            "t": _df(spark, [(0, "init")]),
            "audit": spark.createDataFrame([("init", 0)], "who string, i long"),
        }
    )
    errors: list = []
    seqs: list[int] = []
    lock = threading.Lock()

    def writer(wid: int):
        c = TableCatalog(spark, str(tmp_path / "cat"))
        for i in range(3):
            try:
                s = c.commit(
                    overwrites={
                        "t": _df(spark, [(wid, f"w{wid}i{i}")]),
                        "audit": spark.createDataFrame(
                            [(f"w{wid}", i)], "who string, i long"
                        ),
                    },
                    max_retries=50,
                )
                with lock:
                    seqs.append(s)
            except Exception as e:  # pragma: no cover
                with lock:
                    errors.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert sorted(seqs) == list(range(1, 13))  # 12 txns, contiguous
    # final snapshot is exactly the last txn's write, tables aligned
    last = cat._read_txn(cat.latest_seq())
    who = cat.read("audit").first()
    tv = cat.read("t").first().v
    assert last["tables"]["audit"]["version"] == cat.snapshot()["audit"]
    assert tv.startswith(who.who.replace("w", "w"))  # same writer id
    assert tv == f"{who.who}i{who.i}"


def test_snapshot_time_travel_spans_vacuum(spark, tmp_path):
    """Vacuuming a member table drops old versions; catalog snapshots
    at kept seqs still read, and the catalog never resurrects a
    vacuumed version during roll-forward."""
    cat = TableCatalog(spark, str(tmp_path / "cat"))
    for i in range(3):
        cat.commit(overwrites={"a": _df(spark, [(i, f"v{i}")])})
    cat.table("a").vacuum(keep_last=1)
    cat.roll_forward()  # must not re-create dropped manifests
    assert cat.table("a").versions() == [2]
    assert [r.v for r in cat.read("a", seq=2).collect()] == ["v2"]
    with pytest.raises(Exception):
        cat.read("a", seq=0).collect()


def test_catalog_cdc_stream_atomic_snapshot_plus_summary(spark, tmp_path):
    """The multi-table CDC sink (streaming/jobs.run_cdc_merge_stream_
    catalog): final snapshot ≡ batch cdc_latest_snapshot, and at EVERY
    txn seq the summary table equals a recompute from the snapshot at
    the SAME seq — the cross-table alignment the catalog exists for.
    A full replay with a fresh checkpoint commits nothing new."""
    from sales_etl_pipeline_spark.plans.cdc import cdc_latest_snapshot
    from sales_etl_pipeline_spark.sources.readers import (
        load_events,
        normalize_event_ts,
    )
    from sales_etl_pipeline_spark.streaming import jobs

    SF = "/root/testdata/sf0.001"
    pdf = load_events(spark, SF).orderBy("ts").toPandas()
    pdf["ts"] = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    src = tmp_path / "chunks"
    src.mkdir()
    step = (len(pdf) + 2) // 3
    for i in range(3):
        pdf.iloc[i * step : (i + 1) * step].to_parquet(
            str(src / f"part{i}.parquet"), index=False
        )
    root = str(tmp_path / "cat")
    jobs.run_cdc_merge_stream_catalog(
        normalize_event_ts(
            spark.readStream.schema(jobs.EVENTS_RAW_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        ),
        root,
        str(tmp_path / "ckpt"),
    )
    cat = TableCatalog(spark, root)
    assert cat.latest_seq() == 2  # one txn per epoch
    cols = ["user_id", "last_event_id", "last_ts", "last_event_type", "last_value"]
    got = sorted(map(tuple, cat.read("snapshot").select(cols).collect()))
    want = sorted(
        map(tuple, cdc_latest_snapshot(spark, SF).select(cols).collect())
    )
    assert got == want
    # seq-aligned consistency: summary(seq) ≡ recompute(snapshot(seq))
    for s in cat.txns():
        snap = cat.read("snapshot", seq=s)
        expect = sorted(
            map(
                tuple,
                snap.groupBy("last_event_type")
                .agg(
                    F.count(F.lit(1)).alias("n_users"),
                    F.max("last_ts").alias("latest_ts"),
                )
                .collect(),
            )
        )
        assert (
            sorted(map(tuple, cat.read("summary", seq=s).collect())) == expect
        ), f"summary misaligned at seq {s}"
    # replay: every epoch already committed catalog-wide -> no new txns
    jobs.run_cdc_merge_stream_catalog(
        normalize_event_ts(
            spark.readStream.schema(jobs.EVENTS_RAW_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        ),
        root,
        str(tmp_path / "ckpt2"),
    )
    assert cat.latest_seq() == 2


def test_analytics_pipeline_catalog_publish(spark, tmp_path):
    """AnalyticsPipeline.load(catalog=True): all five reference outputs
    land in ONE txn — snapshot(seq) pins a mutually-consistent set, and
    a second run is txn 1 with catalog-wide time travel back to run 0."""
    from sales_etl_pipeline_spark.operators.pipeline import AnalyticsPipeline

    SF = "/root/testdata/sf0.001"
    out = str(tmp_path / "out")
    pipe = AnalyticsPipeline(spark, SF, out)
    pipe.extract()
    pipe.transform()
    written = pipe.load(catalog=True)
    assert written["txn_seq"] == 0
    names = {p.split("@")[0] for p in written["catalog"]}
    assert names == set(pipe.transformed_data)
    cat = TableCatalog(spark, os.path.join(out, "catalog"))
    assert set(cat.snapshot(0)) == names
    want = sorted(
        map(tuple, pipe.transformed_data["country_summary"].collect())
    )
    assert (
        sorted(map(tuple, cat.read("country_summary", seq=0).collect()))
        == want
    )
    # second run: one more txn, run-0 snapshot intact catalog-wide
    pipe2 = AnalyticsPipeline(spark, SF, out)
    pipe2.extract()
    pipe2.transform()
    assert pipe2.load(catalog=True)["txn_seq"] == 1
    assert cat.snapshot(1) == {n: 1 for n in names}
    assert (
        sorted(map(tuple, cat.read("country_summary", seq=0).collect()))
        == want
    )


def test_catalog_vacuum_coherent_retention(spark, tmp_path):
    """catalog.vacuum(keep_last_txns=2) drops txn 0 and each table's
    pre-floor versions together: kept snapshots fully readable, dropped
    seq unresolvable, reclaimed data files actually gone, and
    roll-forward stays clean afterwards."""
    cat = TableCatalog(spark, str(tmp_path / "cat"))
    for i in range(3):
        cat.commit(
            overwrites={
                "a": _df(spark, [(i, f"a{i}")]),
                "b": _df(spark, [(i, f"b{i}")]),
            }
        )
    res = cat.vacuum(keep_last_txns=2)
    assert res["dropped_txns"] == [0]
    assert cat.txns() == [1, 2]
    assert cat.table("a").versions() == [1, 2]
    for s in (1, 2):
        assert [r.v for r in cat.read("a", seq=s).collect()] == [f"a{s}"]
        assert [r.v for r in cat.read("b", seq=s).collect()] == [f"b{s}"]
    with pytest.raises(Exception):
        cat.snapshot(0)
    # version-0 data files are gone from both tables
    for name in ("a", "b"):
        t = cat.table(name)
        referenced = set()
        for v in t.versions():
            referenced.update(t._manifest_refs(t._read_manifest(v)))
        on_disk = {
            f for f in os.listdir(t._data) if f.endswith(".parquet")
        }
        assert on_disk == referenced
    cat.roll_forward()  # no resurrection, no corruption raise
    assert cat.table("a").versions() == [1, 2]
    # writes continue on top after vacuum
    cat.commit(overwrites={"a": _df(spark, [(9, "a9")])})
    assert cat.latest_seq() == 3
    assert cat.snapshot() == {"a": 3, "b": 2}


def test_create_views_pins_consistent_sql_surface(spark, tmp_path):
    """create_views registers snapshot-pinned temp views: a spark.sql
    join across them reads one txn's state, and the views survive a
    LATER commit unchanged (immutable file lists, not live pointers)."""
    cat = TableCatalog(spark, str(tmp_path / "cat"))
    cat.commit(
        overwrites={
            "orders2": _df(spark, [(1, "a"), (2, "b")]),
            "totals": spark.createDataFrame([(2,)], "n long"),
        }
    )
    pinned = cat.create_views(prefix="cat_")
    assert pinned == {"orders2": 0, "totals": 0}
    joined = spark.sql(
        "SELECT t.n, COUNT(*) AS c FROM cat_orders2 o "
        "CROSS JOIN cat_totals t GROUP BY t.n"
    ).first()
    assert (joined.n, joined.c) == (2, 2)
    # a new txn does NOT move the already-registered views
    cat.commit(
        overwrites={
            "orders2": _df(spark, [(1, "a"), (2, "b"), (3, "c")]),
            "totals": spark.createDataFrame([(3,)], "n long"),
        }
    )
    assert spark.sql("SELECT COUNT(*) AS c FROM cat_orders2").first().c == 2
    assert spark.sql("SELECT n FROM cat_totals").first().n == 2
    # re-pinning at the new snapshot picks up txn 1
    cat.create_views(prefix="cat_")
    assert spark.sql("SELECT COUNT(*) AS c FROM cat_orders2").first().c == 3


def test_txn_delete_atomic_with_overwrite(spark, tmp_path):
    """A txn can mix a copy-on-write DELETE with an overwrite: both
    tables advance under ONE seq, the erased keys are gone, and the
    delete recorded operation='delete' in the member table's history."""
    cat = TableCatalog(spark, str(tmp_path / "cat"))
    cat.commit(
        overwrites={
            "docs": _df(spark, [(1, "a"), (2, "b"), (3, "c")]),
            "stats": spark.createDataFrame([(3,)], "n long"),
        }
    )
    seq = cat.commit(
        deletes={"docs": "k <= 2"},
        overwrites={"stats": spark.createDataFrame([(1,)], "n long")},
    )
    snap = cat.snapshot(seq)
    assert snap["docs"] == 1 and snap["stats"] == 1  # both advanced
    assert sorted(
        (r.k, r.v) for r in cat.read("docs", seq).collect()
    ) == [(3, "c")]
    assert [r.n for r in cat.read("stats", seq).collect()] == [1]
    hist = cat.table("docs").history()
    assert hist[-1]["operation"] == "delete"
    # pre-delete snapshot still reads the erased rows (time travel)
    assert cat.read("docs", seq - 1).count() == 3


def test_txn_no_match_delete_skips_table(spark, tmp_path):
    """A delete matching nothing must NOT advance its table — and if
    the whole txn degenerates, no txn commits at all."""
    cat = TableCatalog(spark, str(tmp_path / "cat"))
    s0 = cat.commit(overwrites={"docs": _df(spark, [(1, "a")])})
    s1 = cat.commit(
        deletes={"docs": "k = 999"},
        appends={"extra": _df(spark, [(7, "x")])},
    )
    assert s1 == s0 + 1
    assert cat.snapshot(s1)["docs"] == 0  # docs did not advance
    assert cat.commit(deletes={"docs": "k = 999"}) == s1  # pure no-op
    assert cat.latest_seq() == s1


def test_retention_delete_stream_catalog(spark, tmp_path):
    """Multi-table erasure stream: each epoch's keys vanish from BOTH
    tables in one txn; replay with a fresh checkpoint commits nothing."""
    from sales_etl_pipeline_spark.streaming import jobs

    cat = TableCatalog(spark, str(tmp_path / "cat"))
    docs = spark.range(0, 100).select(
        F.col("id").alias("uid"), F.lit("t").alias("text")
    )
    events = spark.range(0, 300).select(
        (F.col("id") % 100).alias("user_id"), F.col("id").alias("ev")
    )
    cat.commit(overwrites={"docs": docs, "events": events})

    src = tmp_path / "queue"
    src.mkdir()
    spark.createDataFrame([(5,), (6,)], "uid long").coalesce(1).write.parquet(
        str(src / "c0")
    )
    spark.createDataFrame([(70,)], "uid long").coalesce(1).write.parquet(
        str(src / "c1")
    )

    def queue():
        return (
            spark.readStream.schema("uid long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/c*")
        )

    cfgs = {
        "docs": {"key_columns": ("uid",), "stat_columns": ("uid",)},
        "events": {"key_columns": ("user_id", "ev")},
    }
    jobs.run_retention_delete_stream_catalog(
        queue(),
        cat.root,
        str(tmp_path / "ckpt"),
        key_col="uid",
        table_key_cols={"docs": "uid", "events": "user_id"},
        writer="erasure_main",
        table_configs=cfgs,
    )
    erased = {5, 6, 70}
    assert {r.uid for r in cat.read("docs").collect()} == (
        set(range(100)) - erased
    )
    assert not cat.read("events").filter(
        F.col("user_id").isin(*erased)
    ).count()
    assert cat.read("events").count() == 300 - 3 * len(erased)
    # with key_columns configured, every erased row rode the CDF
    for name, col in (("docs", "uid"), ("events", "user_id")):
        t = cat.table(name)
        dels = [
            h["version"]
            for h in t.history()
            if h["operation"] == "delete"
        ]
        assert len(dels) == 2
        chg = []
        for v in dels:
            cdf = t._read_manifest(v)["cdf"]
            assert cdf["mode"] == "diff"
            chg += spark.read.parquet(
                *[os.path.join(t._data, n) for n in cdf["files"]]
            ).collect()
        assert {getattr(r, col) for r in chg} == erased
        assert all(r._change_type == "delete" for r in chg)
    n_txns = len(cat.txns())
    jobs.run_retention_delete_stream_catalog(
        queue(),
        cat.root,
        str(tmp_path / "ckpt2"),
        key_col="uid",
        table_key_cols={"docs": "uid", "events": "user_id"},
        writer="erasure_main",  # SAME writer: this is a replay
        table_configs=cfgs,
    )
    assert len(cat.txns()) == n_txns  # catalog-wide replay no-op


def test_degenerate_delete_epoch_records_marker_txn(spark, tmp_path):
    """A (writer, epoch) delete txn whose every delete matches nothing
    still records an empty marker txn — so a replay of that epoch stays
    a no-op even after new data arrives for the same keys."""
    cat = TableCatalog(spark, str(tmp_path / "cat"))
    cat.commit(overwrites={"docs": _df(spark, [(1, "a")])})
    s = cat.commit(deletes={"docs": "k = 99"}, writer="w", epoch=5)
    assert s == cat.latest_seq()  # marker txn committed
    assert cat.snapshot(s)["docs"] == 0  # table did not advance
    # the key now APPEARS (user re-registers after erasure)
    cat.commit(appends={"docs": _df(spark, [(99, "new")])})
    # replayed epoch 5: must be a no-op, NOT a re-executed delete
    s2 = cat.commit(deletes={"docs": "k = 99"}, writer="w", epoch=5)
    assert s2 == s
    assert sorted(r.k for r in cat.read("docs").collect()) == [1, 99]
