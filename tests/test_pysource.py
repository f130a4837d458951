"""Custom Python DataSource (sources/pysource.py): batch read, filter
pushdown into the source, and streaming-offset reads. The connector's
full value parity vs the DuckDB range()+md5 twin runs in
tests/test_library_parity.py like any other library plan."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sales_etl_pipeline_spark.sources import pysource  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_batch_read_deterministic_and_partitioned(spark):
    df = pysource.synthetic_source_events(spark, SF)
    assert df.count() == pysource.DEFAULT_ROWS
    assert df.rdd.getNumPartitions() == pysource.DEFAULT_PARTITIONS
    # deterministic: two reads agree bit-for-bit
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, pysource.synthetic_source_events(spark, SF).collect()))
    assert a == b
    # field derivation matches the shared generator
    row = {r.event_id: r for r in df.filter(F.col("event_id") < 3).collect()}
    for i in range(3):
        eid, uid, etype, value, ts = pysource.gen_row(i)
        assert (row[i].user_id, row[i].event_type, row[i].value, row[i].ts_sec) == (
            uid,
            etype,
            value,
            ts,
        )


def test_filter_pushdown_prunes_generation(spark):
    """event_id range predicates are absorbed by pushFilters: the post-scan
    Filter keeps only the non-pushable isnotnull, and the source generates
    just the requested slice (partitions cover 100 ids, not 10k)."""
    pysource.register(spark)
    df = (
        spark.read.format(pysource.FORMAT_NAME)
        .option("rows", pysource.DEFAULT_ROWS)
        .load()
    )
    f = df.filter((F.col("event_id") >= 100) & (F.col("event_id") < 200))
    assert f.count() == 100
    assert sorted(r.event_id for r in f.collect()) == list(range(100, 200))
    plan = f._jdf.queryExecution().executedPlan().toString()
    # the range predicates must NOT survive as a post-scan Filter
    assert ">= 100" not in plan and "< 200" not in plan, plan
    # equality pushdown narrows to a single id
    e = df.filter(F.col("event_id") == 4321)
    assert [r.user_id for r in e.collect()] == [pysource.gen_row(4321)[1]]


def test_unsupported_filters_still_correct(spark):
    """Predicates the source can't absorb (on derived columns) are
    returned to Spark and applied post-scan — results stay exact."""
    df = pysource.synthetic_source_events(spark, SF)
    got = df.filter(F.col("event_type") == "error").count()
    want = sum(
        1
        for i in range(pysource.DEFAULT_ROWS)
        if pysource.gen_row(i)[2] == "error"
    )
    assert got == want > 0


def test_stream_reader_drains_to_batch_equivalence(spark, tmp_path):
    """availableNow over the custom stream source must deliver exactly the
    batch relation. The bounded source drains in ONE microbatch: Spark's
    availableNow fallback for Python stream sources captures
    latestOffset() once, so the source reports its full high-watermark
    (see SyntheticEventsStreamReader.latestOffset)."""
    pysource.register(spark)
    stream = (
        spark.readStream.format(pysource.FORMAT_NAME)
        .option("rows", 2000)
        .load()
    )
    query = (
        stream.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    got = spark.read.parquet(str(tmp_path / "out"))
    assert got.count() == 2000
    batch = (
        spark.read.format(pysource.FORMAT_NAME).option("rows", 2000).load()
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, batch.collect())
    )
