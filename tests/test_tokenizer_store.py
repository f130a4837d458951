"""Tokenizer model registry (operators/tokenizer_store.py): exact
round-trip, tokenize-with-loaded ≡ tokenize-with-trained, AS OF time
travel across retrains, per-key CDF audit of vocabulary evolution, and
(writer, epoch) replay idempotence inherited from the table layer."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sales_etl_pipeline_spark.operators import tokenizer_store as TS  # noqa: E402
from sales_etl_pipeline_spark.plans import bpe, unigram  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_bpe_round_trip_and_apply(spark, tmp_path):
    merges, _ = bpe.train_bpe(spark, SF, 12)
    root = str(tmp_path / "bpe_model")
    v = TS.save_bpe_model(spark, root, merges)
    assert v == 0
    loaded = TS.load_bpe_model(spark, root)
    assert loaded == merges  # the equivalence claim IS the round-trip
    # and the loaded model actually tokenizes: merges fire (fewer
    # tokens than characters) on a deterministic doc subset
    docs = spark.read.parquet(
        os.path.join(SF, "documents.parquet")
    ).filter("doc_id < 20")
    from pyspark.sql import functions as F

    r = (
        bpe.bpe_apply(docs, "text", loaded)
        .agg(
            F.sum(F.size("bpe_tokens")).alias("toks"),
            F.sum(
                F.length(F.regexp_replace(F.lower("text"), "[^a-z]", ""))
            ).alias("chars"),
        )
        .first()
    )
    assert 0 < r.toks < r.chars


def test_bpe_time_travel_across_retrains(spark, tmp_path):
    """A retrain with more merges commits a new version; version pins and
    AS OF both recover the exact older model."""
    import time

    root = str(tmp_path / "bpe_model")
    m8, _ = bpe.train_bpe(spark, SF, 8)
    TS.save_bpe_model(spark, root, m8)
    t_after_v0 = time.time()
    m16, _ = bpe.train_bpe(spark, SF, 16)
    TS.save_bpe_model(spark, root, m16)
    assert TS.load_bpe_model(spark, root) == m16
    assert TS.load_bpe_model(spark, root, version=0) == m8
    assert TS.load_bpe_model(spark, root, as_of=t_after_v0) == m8
    # sequential BPE: the longer training extends the shorter one
    assert m16[:8] == m8


def test_bpe_model_cdf_audits_retrain(spark, tmp_path):
    """The v1 change relation shows exactly the merges ADDED by the
    longer retrain (ranks 8..15 as inserts, ranks 0..7 unchanged —
    absent from the diff)."""
    root = str(tmp_path / "bpe_model")
    m8, _ = bpe.train_bpe(spark, SF, 8)
    m16, _ = bpe.train_bpe(spark, SF, 16)
    TS.save_bpe_model(spark, root, m8)
    TS.save_bpe_model(spark, root, m16)
    ch = {
        (r.rank, r._change_type)
        for r in TS.model_changes(spark, root, 1).collect()
    }
    assert ch == {(i, "insert") for i in range(8, 16)}
    # v0 was the initial commit: everything an insert
    ch0 = {
        (r.rank, r._change_type)
        for r in TS.model_changes(spark, root, 0).collect()
    }
    assert ch0 == {(i, "insert") for i in range(8)}


def test_bpe_save_epoch_replay_idempotent(spark, tmp_path):
    root = str(tmp_path / "bpe_model")
    m8, _ = bpe.train_bpe(spark, SF, 8)
    v1 = TS.save_bpe_model(spark, root, m8, writer="trainer", epoch=1)
    v2 = TS.save_bpe_model(spark, root, m8, writer="trainer", epoch=1)
    assert v1 == v2  # replayed epoch: no new version


def test_unigram_round_trip_bit_exact_and_viterbi(spark, tmp_path):
    probs, _ = unigram.train_unigram(spark, SF)
    root = str(tmp_path / "uni_model")
    TS.save_unigram_model(spark, root, probs)
    logp = TS.load_unigram_model(spark, root)
    import math

    want = {p: math.log(v) for p, v in probs.items()}
    assert logp == want  # IEEE doubles round-trip losslessly via parquet
    # Viterbi under the loaded model ≡ under the trained model
    for w in ("data", "pipeline", "analytics"):
        assert unigram.viterbi_segment(w, logp) == unigram.viterbi_segment(
            w, want
        )


def test_byte_level_models_round_trip(spark, tmp_path):
    """The registry is alphabet-agnostic: byte-level BPE merge rules
    (hex-pair symbols) and byte-level unigram vocabularies round-trip
    bit-exactly, and the loaded byte model segments identically to the
    trained one (open-vocab apply on unseen text)."""
    import math

    from sales_etl_pipeline_spark.operators import tokenizer_store as ts
    from sales_etl_pipeline_spark.plans import bpe, unigram

    merges, _ = bpe.train_bpe_bytes(spark, SF, n_merges=12)
    root = str(tmp_path / "byte_bpe")
    ts.save_bpe_model(spark, root, merges)
    loaded = ts.load_bpe_model(spark, root)
    assert loaded == merges
    df = spark.createDataFrame(
        [(0, "Unseen TEXT 42 — π!")], "doc_id long, text string"
    )
    a = bpe.bpe_apply_bytes(df, "text", merges).first().byte_tokens
    b = bpe.bpe_apply_bytes(df, "text", loaded).first().byte_tokens
    assert list(a) == list(b)

    probs, _ = unigram.train_unigram_bytes(spark, SF)
    uroot = str(tmp_path / "byte_uni")
    ts.save_unigram_model(spark, uroot, probs)
    got = ts.load_unigram_model(spark, uroot)
    logp_want = {p: math.log(v) for p, v in probs.items()}
    assert set(got) == set(logp_want)
    assert all(got[p] == logp_want[p] for p in got)  # bit-exact doubles
    bpe.clear_bpe_cache()
    unigram.clear_unigram_cache()
