"""Property checks for the corpus-curation plans (exact oracle parity is
covered by tests/test_oracle_parity.py; these pin the semantic invariants)."""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sales_etl_pipeline_spark.plans import curation  # noqa: E402
from sales_etl_pipeline_spark.sources.readers import load_table  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_repetition_fractions_bounded(spark):
    rows = curation.repetition_stats(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.distinct_frac <= 1.0
        assert 0.0 < r.top_token_frac <= 1.0
        # a doc's dominant bigram can't outnumber its dominant token + 1
        if r.top_bigram_frac is not None:
            assert 0.0 < r.top_bigram_frac <= 1.0


def test_quality_filter_partitions_corpus(spark):
    docs = load_table(spark, SF, "documents")
    verdicts = curation.quality_filter(spark, SF)
    assert verdicts.count() == docs.count()
    # kept ⇔ no reject reason, exhaustively
    assert verdicts.filter(F.col("kept") & F.col("reject_reason").isNotNull()).count() == 0
    assert verdicts.filter(~F.col("kept") & F.col("reject_reason").isNull()).count() == 0


def test_stratified_sample_exact_quota(spark):
    docs = load_table(spark, SF, "documents")
    strata = {
        (r.lang, r.source): r["count"]
        for r in docs.groupBy("lang", "source").count().collect()
    }
    sampled = curation.stratified_sample(spark, SF).collect()
    got = {}
    for r in sampled:
        got[(r.lang, r.source)] = got.get((r.lang, r.source), 0) + 1
        assert r.stratum_size == strata[(r.lang, r.source)]
    # every stratum sampled, exactly ⌈n/10⌉ rows each
    assert set(got) == set(strata)
    for key, n in strata.items():
        assert got[key] == math.ceil(n / curation.SAMPLE_DEN)


def test_stratified_sample_deterministic(spark):
    a = {r.doc_id for r in curation.stratified_sample(spark, SF).collect()}
    b = {r.doc_id for r in curation.stratified_sample(spark, SF).collect()}
    assert a == b
