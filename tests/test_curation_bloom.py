"""contamination_bloom beyond its library oracle (which already pins it
against the exact contamination SQL): plan-level equality with
contamination_check, and a measured bound on the Bloom prefilter's false
positives — the quantity that decides how much shuffle the 100-TB path
actually saves."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sales_etl_pipeline_spark.plans import curation  # noqa: E402
from sales_etl_pipeline_spark.plans.llmdata import _shingle_table  # noqa: E402

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_bloom_equals_exact(spark):
    exact = curation.contamination_check(spark, SF)
    bloom = curation.contamination_bloom(spark, SF)
    assert _rows(bloom) == _rows(exact)


def test_bloom_prefilter_fp_rate(spark):
    """Measure the prefilter directly: of the train shingles that do NOT
    occur in the eval split, fewer than 2% may survive the Bloom test
    (theoretical ~0.6% at 12 bits/key, 5 probes; 2% leaves slack for
    small-m rounding). Guards against silently degrading the bitset —
    a Bloom that passes everything would still be oracle-correct but
    would reintroduce the full-shuffle plan."""
    sh = _shingle_table(spark, SF).persist()
    eval_ids = curation.stratified_sample(spark, SF).select("doc_id")
    eval_sh = sh.join(F.broadcast(eval_ids), "doc_id", "left_semi")
    eval_hashes = [
        r.h
        for r in eval_sh.select(F.xxhash64("s").alias("h")).distinct().collect()
    ]
    bits, m = curation._bloom_build(eval_hashes)
    might_contain = curation._bloom_contains_udf(bits, m)

    eval_set = {r.s for r in eval_sh.select("s").distinct().collect()}
    train_sh = (
        sh.join(F.broadcast(eval_ids), "doc_id", "left_anti")
        .select("s")
        .distinct()
        .withColumn("pass", might_contain(F.xxhash64("s")))
        .collect()
    )
    true_pos = sum(1 for r in train_sh if r.s in eval_set)
    passed = sum(1 for r in train_sh if r["pass"])
    negatives = len(train_sh) - true_pos
    false_pos = passed - true_pos
    assert all(r["pass"] for r in train_sh if r.s in eval_set), "no false negatives"
    assert negatives > 0
    assert false_pos / negatives < 0.02, (false_pos, negatives)
