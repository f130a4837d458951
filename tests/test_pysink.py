"""Custom Python DataSource writer (sources/pysink.py): two-phase-commit
JSON-lines sink — batch round trip, manifest-gated visibility (staged
garbage never leaks), overwrite semantics, and the epoch-keyed streaming
publish."""

from __future__ import annotations

import json
import os
import time
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sales_etl_pipeline_spark.sources import pysink, pysource  # noqa: E402

SCHEMA = "event_id bigint, user_id bigint, event_type string, value double, ts_sec bigint"


def _sample(spark, rows=500):
    pysource.register(spark)
    return spark.read.format(pysource.FORMAT_NAME).option("rows", rows).load()


def test_batch_write_round_trip_and_manifest(spark, tmp_path):
    pysink.register(spark)
    df = _sample(spark)
    out = str(tmp_path / "sink")
    df.write.format(pysink.FORMAT_NAME).option("path", out).mode("append").save()
    final = os.path.join(out, "data")
    with open(os.path.join(final, pysink.SUCCESS_FILE)) as f:
        manifest = json.load(f)
    assert manifest["rows"] == 500
    # one staged file per task, all published, staging cleaned up
    assert len(manifest["files"]) == df.rdd.getNumPartitions()
    assert not os.path.exists(os.path.join(out, "_staging"))
    back = pysink.read_back(spark, out, SCHEMA)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_orphaned_staging_files_never_visible(spark, tmp_path):
    """A torn/speculative task attempt = a staged file with no commit
    message. Simulate one by planting a file in the final dir that the
    manifest does not list: the manifest-gated reader must not see it."""
    pysink.register(spark)
    df = _sample(spark, rows=100)
    out = str(tmp_path / "sink")
    df.write.format(pysink.FORMAT_NAME).option("path", out).mode("append").save()
    orphan = os.path.join(out, "data", "part-orphan.jsonl")
    with open(orphan, "w") as f:
        f.write(json.dumps({"event_id": 999999, "user_id": 0,
                            "event_type": "view", "value": 0.0,
                            "ts_sec": 0}) + "\n")
    back = pysink.read_back(spark, out, SCHEMA)
    assert back.count() == 100
    assert back.filter(F.col("event_id") == 999999).count() == 0


def test_commit_sweeps_unmanifested_orphans(spark, tmp_path):
    """A crash mid-publish (some staged files renamed into the final dir,
    manifest never updated) leaves part files no manifest will ever list
    — the retried job stages fresh uuid names. The NEXT successful commit
    must reclaim them from disk (they were already invisible to
    read_back; the sweep stops them accumulating as garbage)."""
    pysink.register(spark)
    out = str(tmp_path / "sink")
    _sample(spark, rows=100).write.format(pysink.FORMAT_NAME).option(
        "path", out
    ).mode("append").save()
    orphan = os.path.join(out, "data", "part-deadbeef.jsonl")
    with open(orphan, "w") as f:
        f.write(json.dumps({"event_id": 1, "user_id": 0, "event_type": "view",
                            "value": 0.0, "ts_sec": 0}) + "\n")
    # age it past the sweep's retention window (crash debris is old by
    # the time the next commit runs)
    past = time.time() - pysink._ORPHAN_RETENTION_SECONDS - 60
    os.utime(orphan, (past, past))
    _sample(spark, rows=50).write.format(pysink.FORMAT_NAME).option(
        "path", out
    ).mode("append").save()
    assert not os.path.exists(orphan)  # reclaimed by the commit sweep
    back = pysink.read_back(spark, out, SCHEMA)
    assert back.count() == 150  # both commits intact, orphan rows absent


def test_commit_sweep_spares_fresh_unmanifested_files(spark, tmp_path):
    """The sweep is age-gated: a part file renamed in SECONDS ago by a
    concurrently publishing job (manifest not yet written) must survive
    another publisher's commit — deleting it would make the racing job's
    manifest reference a missing file and break its read_back."""
    pysink.register(spark)
    out = str(tmp_path / "sink")
    _sample(spark, rows=100).write.format(pysink.FORMAT_NAME).option(
        "path", out
    ).mode("append").save()
    racer = os.path.join(out, "data", "part-racer.jsonl")
    with open(racer, "w") as f:  # fresh mtime = racing publisher's file
        f.write(json.dumps({"event_id": 2, "user_id": 0, "event_type": "view",
                            "value": 0.0, "ts_sec": 0}) + "\n")
    _sample(spark, rows=50).write.format(pysink.FORMAT_NAME).option(
        "path", out
    ).mode("append").save()
    assert os.path.exists(racer)  # too fresh to be declared dead


def test_overwrite_replaces_previous_commit(spark, tmp_path):
    pysink.register(spark)
    out = str(tmp_path / "sink")
    _sample(spark, rows=300).write.format(pysink.FORMAT_NAME).option(
        "path", out
    ).mode("append").save()
    _sample(spark, rows=120).write.format(pysink.FORMAT_NAME).option(
        "path", out
    ).mode("overwrite").save()
    back = pysink.read_back(spark, out, SCHEMA)
    assert back.count() == 120


def test_stream_writer_publishes_per_epoch(spark, tmp_path):
    """Streaming sink: custom source → custom sink; every epoch publishes
    its own manifest-gated dir and the union of epochs equals the batch
    relation exactly. (The Python microbatch stream does not support
    Trigger.AvailableNow — Spark falls back to single-batch execution and
    the bounded source drains in one epoch — so epoch count is ≥1; the
    per-epoch publish path is exercised either way.)"""
    pysink.register(spark)
    pysource.register(spark)
    stream = (
        spark.readStream.format(pysource.FORMAT_NAME)
        .option("rows", 400)
        .load()
    )
    out = str(tmp_path / "streamsink")
    q = (
        stream.writeStream.format(pysink.FORMAT_NAME)
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    epochs = sorted(d for d in os.listdir(out) if d.startswith("epoch="))
    assert len(epochs) >= 1
    rows = []
    for e in epochs:
        rows += map(tuple, pysink.read_back(spark, out, SCHEMA, e).collect())
    batch = spark.read.format(pysource.FORMAT_NAME).option("rows", 400).load()
    assert sorted(rows) == sorted(map(tuple, batch.collect()))


def test_second_append_preserves_first_commit(spark, tmp_path):
    """Two append jobs into the same directory must BOTH stay visible:
    the second commit folds the prior manifest into its own instead of
    replacing it (the code-review finding: a fresh manifest listing only
    the second job's files silently orphans the first job's rows)."""
    pysink.register(spark)
    out = str(tmp_path / "sink")
    _sample(spark, rows=300).write.format(pysink.FORMAT_NAME).option(
        "path", out
    ).mode("append").save()
    _sample(spark, rows=120).write.format(pysink.FORMAT_NAME).option(
        "path", out
    ).mode("append").save()
    back = pysink.read_back(spark, out, SCHEMA)
    assert back.count() == 420
    with open(os.path.join(out, "data", pysink.SUCCESS_FILE)) as f:
        manifest = json.load(f)
    assert manifest["rows"] == 420
    # no torn-manifest artifact left behind (atomic os.replace publish)
    assert not os.path.exists(
        os.path.join(out, "data", pysink.SUCCESS_FILE + ".tmp")
    )
