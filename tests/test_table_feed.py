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
