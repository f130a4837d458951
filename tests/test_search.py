"""Full-text retrieval plans (plans/search.py): oracle parity is covered
by tests/test_library_parity.py; here we pin the physical plan shapes the
scale story depends on, the retrieval semantics the oracle can't see
(log-idf production ranking), and the API contracts.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sales_etl_pipeline_spark.plans import search  # noqa: E402
from sales_etl_pipeline_spark.sources.readers import load_table  # noqa: E402
from tests.conftest import SF_SMOKE, executed_plan  # noqa: E402


def _queries_df(spark):
    return spark.createDataFrame(
        [(qid, t) for qid, q in search.SEARCH_QUERIES for t in q.split(" ")],
        "query_id int, term string",
    )


def test_bm25_plan_shape(spark):
    """The query-term and stats relations must broadcast (postings-lookup
    join, never a shuffle of the tf relation against a 12-row table), and
    tokenization must stay in whole-stage codegen (no Python UDF)."""
    df = search.bm25_topk(spark, SF_SMOKE)
    plan = executed_plan(df)
    assert plan.count("BroadcastHashJoin") >= 3  # queries, dfreq, consts
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_bm25_topk_bounds_and_order(spark):
    rows = search.bm25_topk(spark, SF_SMOKE).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        assert len(rs) <= search.TOP_K
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.score for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_bm25_oov_term_does_not_null_query(spark):
    """q5 = 'spark warehouse': 'warehouse' has zero postings; the query
    must still rank documents by its in-vocabulary term."""
    rows = search.bm25_topk(spark, SF_SMOKE).where(F.col("query_id") == 5)
    assert rows.count() == search.TOP_K


def test_bm25_rare_term_dominates(spark):
    """q4 = 'dup' (df ≈ 5% of docs): every retrieved doc must actually
    contain the term — retrieval is postings-driven, not corpus-wide."""
    docs = load_table(spark, SF_SMOKE, "documents")
    hits = {
        r.doc_id
        for r in search.bm25_topk(spark, SF_SMOKE)
        .where(F.col("query_id") == 4)
        .collect()
    }
    with_term = {
        r.doc_id
        for r in docs.where(F.col("text").rlike(r"(^| )dup( |$)")).collect()
    }
    assert hits <= with_term and hits


def test_log_idf_preserves_ranking_on_single_term(spark):
    """For a single-term query the ln(1+x) idf is a positive monotone
    rescale of the odds-ratio idf, so the ranked doc order is identical.
    (Multi-term rankings may legitimately differ — the sum reweights.)"""
    docs = load_table(spark, SF_SMOKE, "documents")
    q = spark.createDataFrame([(4, "dup")], "query_id int, term string")

    def ranked(log_idf):
        return [
            r.doc_id
            for r in search.bm25_score(docs, q, log_idf=log_idf)
            .orderBy(F.desc("score"), "doc_id")
            .collect()
        ]

    assert ranked(False) == ranked(True)


def test_bm25_duplicate_query_terms_double_score(spark):
    """Bag-of-words contract: a repeated query term scores twice."""
    docs = load_table(spark, SF_SMOKE, "documents")
    q1 = spark.createDataFrame([(1, "dup")], "query_id int, term string")
    q2 = spark.createDataFrame(
        [(1, "dup"), (1, "dup")], "query_id int, term string"
    )
    s1 = {r.doc_id: r.score for r in search.bm25_score(docs, q1).collect()}
    s2 = {r.doc_id: r.score for r in search.bm25_score(docs, q2).collect()}
    assert set(s1) == set(s2)
    for d, v in s1.items():
        assert s2[d] == pytest.approx(2 * v, rel=1e-12)


def test_phrase_search_counts_match_python(spark):
    """Exact twin: count adjacent bigram occurrences in plain Python over
    the same corpus and compare the full result."""
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    expected = {}
    for pid, w1, w2 in search.PHRASE_QUERIES:
        for d in docs:
            toks = d.text.split(" ")
            n = sum(
                1
                for i in range(len(toks) - 1)
                if toks[i] == w1 and toks[i + 1] == w2
            )
            if n:
                expected[(pid, d.doc_id)] = n
    got = {
        (r.phrase_id, r.doc_id): r.n_occurrences
        for r in search.phrase_search(spark, SF_SMOKE).collect()
    }
    assert got == expected and expected


def test_phrase_search_plan_shape(spark):
    """The phrase literal broadcasts; the positional self-join keys on
    doc_id (co-partitioned intersection), and no Python evaluator."""
    plan = executed_plan(search.phrase_search(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bm25_score_api_on_custom_frames(spark):
    """bm25_score is corpus-agnostic: works on any (doc_id, text) frame."""
    docs = spark.createDataFrame(
        [(1, "red fox"), (2, "red red fox"), (3, "blue sky")],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(1, "red")], "query_id int, term string")
    rows = search.bm25_score(docs, q).orderBy(F.desc("score")).collect()
    assert [r.doc_id for r in rows] == [2, 1]  # higher tf wins; 3 absent


def test_bm25_self_index_equals_with_index(spark):
    """bm25_score ≡ bm25_score_with_index(docs, q, *bm25_index(docs)) —
    the frozen-index scorer's op tree is the same expression."""
    docs = load_table(spark, SF_SMOKE, "documents")
    q = _queries_df(spark)
    a = {(r.query_id, r.doc_id): r.score for r in search.bm25_score(docs, q).collect()}
    dfreq, consts = search.bm25_index(docs)
    b = {
        (r.query_id, r.doc_id): r.score
        for r in search.bm25_score_with_index(docs, q, dfreq, consts).collect()
    }
    assert a == b  # bit-identical, not approx


def test_bm25_frozen_index_scores_new_docs(spark):
    """Docs NOT in the reference corpus score against the frozen stats;
    index-absent terms drop out (frozen-vocabulary semantics)."""
    ref = spark.createDataFrame(
        [(1, "red fox red"), (2, "blue sky")], "doc_id long, text string"
    )
    dfreq, consts = search.bm25_index(ref)
    new = spark.createDataFrame(
        [(10, "red red novelterm")], "doc_id long, text string"
    )
    q = spark.createDataFrame(
        [(1, "red"), (1, "novelterm")], "query_id int, term string"
    )
    rows = search.bm25_score_with_index(new, q, dfreq, consts).collect()
    assert len(rows) == 1 and rows[0].doc_id == 10
    # score reflects ONLY 'red' (novelterm has no df in the index):
    # idf = (2 - 1 + 0.5)/(1 + 0.5) = 1.0; tf=2, dl=3, avgdl=2.5
    k1, b = search.K1, search.B
    norm = k1 * ((1 - b) + b * (3.0 / 2.5))
    want = 1.0 * (2.0 * (k1 + 1.0) / (2.0 + norm))
    assert rows[0].score == pytest.approx(want, rel=1e-12)


def test_stream_bm25_equals_batch(spark, tmp_path):
    """The streaming ranker over a 3-chunk document stream ≡ one batch
    scoring of the whole corpus against the same frozen index."""
    from sales_etl_pipeline_spark.streaming import jobs

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    src = tmp_path / "chunks"
    src.mkdir()
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(
            str(src / f"c{i}")
        )
    q = _queries_df(spark)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/c*")
    )
    out = str(tmp_path / "scored")
    jobs.run_stream_bm25_score(
        stream, docs, q, out, str(tmp_path / "ckpt")
    )
    got = {
        (r.query_id, r.doc_id): r.score
        for r in spark.read.parquet(out)
        .select("query_id", "doc_id", "score")  # epoch= partition dirs
        .collect()
    }
    dfreq, consts = search.bm25_index(docs)
    want = {
        (r.query_id, r.doc_id): r.score
        for r in search.bm25_score_with_index(docs, q, dfreq, consts).collect()
    }
    assert got == want  # bit-identical across the batch split


def test_rrf_fusion_semantics(spark):
    """RRF on hand-built rankings: a doc present in BOTH lists outranks
    a doc that is rank-1 in only one list; absent-list contributions
    are zero, and the score is exactly 1/(60+ra) + 1/(60+rb)."""
    a = spark.createDataFrame(
        [(1, 1, 100), (1, 2, 200), (1, 3, 300)],
        "query_id int, rank int, doc_id long",
    )
    b = spark.createDataFrame(
        [(1, 200), (2, 999)], "rank int, doc_id long"
    )
    got = {
        r.doc_id: (r.rank, r.rrf_score)
        for r in search.rrf_fuse(a, b).collect()
    }
    assert set(got) == {100, 200, 300, 999}
    # doc 200: rank 2 lexically + rank 1 prior beats lexical rank-1 100
    assert got[200][0] == 1 and got[100][0] == 2
    assert got[200][1] == 1.0 / 62 + 1.0 / 61
    assert got[100][1] == 1.0 / 61
    assert got[999][1] == 1.0 / 62  # prior-only doc still fused in


def test_fusion_quality_prior_is_take_ordered(spark):
    """The quality prior must be TakeOrderedAndProject over the corpus
    (per-partition top-N), never a single-partition global window sort
    of every document — the classic rank-then-filter scale bug."""
    df = search.bm25_quality_fusion(spark, SF_SMOKE)
    plan = executed_plan(df)
    assert "TakeOrderedAndProject" in plan
