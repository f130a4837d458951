"""Epoch shuffle + sharding (plans/assembly, r13): permutation,
determinism, balance, and the writer's on-disk order contract. Oracle
parity for the two registry plans is covered by
tests/test_library_parity.py; these pin the semantics."""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from sales_etl_pipeline_spark.plans import assembly  # noqa: E402
from sales_etl_pipeline_spark.sources.readers import load_table  # noqa: E402
from sales_etl_pipeline_spark.sources.writers import write_epoch_shards  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_epoch_assignment_is_a_permutation(spark):
    docs = load_table(spark, SF, "documents")
    a = assembly.epoch_shuffle_assignment(spark, SF).collect()
    assert len(a) == docs.count()
    assert len({r.doc_id for r in a}) == len(a)  # each doc exactly once
    by_shard: dict[int, list[int]] = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard


def test_epoch_assignment_deterministic_and_seed_sensitive(spark):
    one = {(r.doc_id, r.shard, r.pos)
           for r in assembly.epoch_shuffle_assignment(spark, SF).collect()}
    two = {(r.doc_id, r.shard, r.pos)
           for r in assembly.epoch_shuffle_assignment(spark, SF).collect()}
    assert one == two
    other = {
        (r.doc_id, r.shard, r.pos)
        for r in assembly.epoch_shuffle_assignment(
            spark, SF, seed="ep1"
        ).collect()
    }
    assert other != one  # a new epoch seed re-permutes


def test_epoch_shards_balanced(spark):
    stats = assembly.epoch_shard_stats(spark, SF).collect()
    assert len(stats) == assembly.EPOCH_SHARDS
    sizes = [r.n_docs for r in stats]
    mean = sum(sizes) / len(sizes)
    # loose binomial bound: hash routing never concentrates a shard
    assert max(sizes) <= 2 * mean and min(sizes) >= mean / 4


def test_write_epoch_shards_preserves_epoch_order(spark, tmp_path):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    a = assembly.epoch_shuffle_assignment(spark, SF)
    out = str(tmp_path / "shards")
    write_epoch_shards(a.join(docs, "doc_id"), out, assembly.EPOCH_SHARDS)
    want = {}
    for r in a.collect():
        want.setdefault(r.shard, []).append((r.pos, r.doc_id))
    for shard, rows in want.items():
        files = sorted(glob.glob(os.path.join(out, f"shard={shard}", "*.parquet")))
        assert len(files) == 1, f"shard {shard} split across files"
        tbl = pq.read_table(files[0], columns=["pos", "doc_id"])
        got = list(zip(tbl.column("pos").to_pylist(),
                       tbl.column("doc_id").to_pylist()))
        assert got == sorted(rows), f"shard {shard} order broken"
