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


def test_sequence_packing_two_phase_bit_identical(spark):
    """The two-phase prefix sum must reproduce the single-window twin
    exactly (long addition is associative — any divergence is a bug).
    PACK_BLOCK is shrunk to force ~16 real blocks: the test corpus has
    500 docs, so the production block size would degenerate to a single
    block and never exercise the cross-block offset path."""
    saved = curation.PACK_BLOCK
    curation.PACK_BLOCK = 32
    try:
        two = {
            tuple(r)
            for r in curation.sequence_packing(spark, SF).collect()
        }
    finally:
        curation.PACK_BLOCK = saved
    one = {
        tuple(r)
        for r in curation.sequence_packing_single_window(spark, SF).collect()
    }
    assert two == one


def test_sequence_packing_no_source_grain_window(spark):
    """Fact-grain window partitions must include the block key; only the
    block-grain offset relation may window on source alone."""
    df = curation.sequence_packing(spark, SF)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    import re

    windows = [l for l in plan.splitlines() if "windowspecdefinition" in l.lower()]
    assert windows, "expected window operators in the plan"
    fact_grain = [
        l for l in windows if "blk" in l and "lcum" in l
    ]
    assert fact_grain, f"no blocked fact-grain window found in: {windows}"


def test_dedup_spans_reassembly_and_identity(spark):
    """Span removal invariants: clean_text token count ≡ n_tokens −
    n_removed (reassembly loses nothing else), and an unreachable
    threshold makes the pass the identity."""
    from pyspark.sql import functions as F

    from sales_etl_pipeline_spark.plans.curation import dedup_spans

    sf = "/root/testdata/sf0.001"
    out = dedup_spans(spark, sf)
    bad = out.filter(
        F.when(F.col("clean_text") == "", F.lit(0)).otherwise(
            F.size(F.split("clean_text", " "))
        )
        != F.col("n_tokens") - F.col("n_removed")
    )
    assert bad.count() == 0
    ident = dedup_spans(spark, sf, min_docs=10**9)
    assert ident.filter(F.col("n_removed") != 0).count() == 0
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    joined = ident.join(docs, "doc_id")
    assert joined.filter(F.col("clean_text") != F.col("text")).count() == 0


def test_hashed_linear_score_margin_bound_and_decision(spark):
    """Cauchy–Schwarz bound: |margin| = |w·x|/|x| ≤ |w| ≤ √(dim·1.0²) = 16;
    the stand-in model's symmetric weights must also split the corpus
    into BOTH decision classes (a one-sided split would mean the score
    degenerated to a length artifact)."""
    from sales_etl_pipeline_spark.plans import llmdata

    rows = llmdata.hashed_linear_score(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 500
    assert all(abs(r.margin) <= 16.0 for r in rows)
    assert any(r.quality_pass for r in rows)
    assert any(not r.quality_pass for r in rows)
    for r in rows:
        assert r.quality_pass == (r.margin > 0)


def test_doc_surprisal_bits_bounds(spark):
    """Mean bits-per-token lies in [0, floor(log2(N))]: the most common
    token's dyadic surprisal is ≥ 0 and no token can exceed the
    whole-corpus bit width; n_tokens must reconcile with the raw token
    explode."""
    from pyspark.sql import functions as F

    from sales_etl_pipeline_spark.plans import llmdata
    from sales_etl_pipeline_spark.functions.core import tokens
    from sales_etl_pipeline_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.01"
    rows = llmdata.doc_surprisal(spark, sf).collect()
    docs = load_table(spark, sf, "documents")
    n_total = docs.select(
        F.sum(F.size(tokens(F.col("text")))).alias("n")
    ).collect()[0].n
    max_bits = n_total.bit_length() - 1
    assert len(rows) == 500
    assert sum(r.n_tokens for r in rows) == n_total
    assert all(0.0 <= r.mean_bits_per_token <= max_bits for r in rows)

def test_doc_bigram_surprisal_hand_computed(spark, tmp_path):
    """Exact dyadic bigram surprisal on a hand-checkable corpus:
    docs 'a b a b' and 'a b b' — N=7, C(a)=3, C(b)=4, C(ab)=3,
    C(ba)=C(bb)=1. First tokens take unigram bits (7//3=2 → 1 bit);
    (a,b) costs 3//3=1 → 0 bits; (b,a)/(b,b) cost 4//1=4 → 2 bits.
    Also: n_tokens reconciles exactly with the unigram twin (identical
    tokenization), and both scores stay within the corpus bit-width
    bound. (No bigram ≤ unigram inequality is asserted: the synthetic
    corpus is order-free word soup, so true conditional ≈ marginal
    entropy and the dyadic floors' differing bias — large N//c vs small
    C(prev)//c2 ratios — decides the comparison, not the model.)"""
    from pyspark.sql import functions as F

    from sales_etl_pipeline_spark.plans import llmdata

    tiny = spark.createDataFrame(
        [(1, "a b a b", "s", 7), (2, "a b b", "s", 5)],
        "doc_id long, text string, source string, n_chars long",
    )
    tiny.write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.doc_id: (r.n_tokens, r.mean_bits_per_token)
        for r in llmdata.doc_bigram_surprisal(spark, str(tmp_path)).collect()
    }
    assert got == {1: (4, 0.75), 2: (3, 1.0)}

    sf = "/root/testdata/sf0.01"
    uni = llmdata.doc_surprisal(spark, sf).collect()
    bi = llmdata.doc_bigram_surprisal(spark, sf).collect()
    assert {r.doc_id: r.n_tokens for r in uni} == {
        r.doc_id: r.n_tokens for r in bi
    }
    n_total = sum(r.n_tokens for r in uni)
    max_bits = n_total.bit_length() - 1
    assert all(0.0 <= r.mean_bits_per_token <= max_bits for r in bi)

def test_linear_probe_training_converges(spark):
    """In-engine model TRAINING (plans/llmdata.linear_probe_*): the
    squared loss must decrease MONOTONICALLY over the GD steps and end
    well below the w=0 baseline — evidence the relational gradient
    descent actually learns, on top of the bit-exact oracle parity the
    library harness checks. (η is deliberately dyadic and was chosen by
    a stability sweep — 1/8 diverges on these count features, 1/256
    converges; this test is the guard against a future knob change
    silently breaking convergence.)"""
    from sales_etl_pipeline_spark.plans import llmdata

    def loss(steps):
        rows = llmdata.linear_probe_scores(spark, SF, steps=steps).collect()
        return sum((r.score - r.y) ** 2 for r in rows)

    losses = [loss(s) for s in range(4)]  # steps = 0 (baseline w=0) .. 3
    assert all(a > b for a, b in zip(losses, losses[1:])), losses
    assert losses[3] < 0.5 * losses[0]
    # the trained weight relation: one weight per bucket + the bias row
    w = llmdata.linear_probe_train(spark, SF).collect()
    assert len(w) == llmdata.FEATURE_DIM + 1
    assert any(r.bucket == llmdata.PROBE_BIAS_BUCKET for r in w)

def test_linear_probe_heldout_eval_discipline(spark):
    """linear_probe_eval trains on the md5 TRAIN split only and scores
    the disjoint EVAL split: metrics row sane (counts match the split
    rule, accuracy in [0,1], mse ≥ 0), and the train-split weights
    differ from the full-corpus weights (the eval docs really were
    withheld from training)."""
    from pyspark.sql import functions as F

    from sales_etl_pipeline_spark.plans import llmdata
    from sales_etl_pipeline_spark.plans.assembly import train_test_split

    row = llmdata.linear_probe_eval(spark, SF).first()
    n_eval_expected = (
        train_test_split(spark, SF).filter(F.col("split") == "eval").count()
    )
    assert row.n_eval == n_eval_expected > 0
    assert 0.0 <= row.accuracy <= 1.0 and row.mse >= 0.0
    w_full = {
        r.bucket: r.w for r in llmdata.linear_probe_train(spark, SF).collect()
    }
    w_train = llmdata._train_probe(
        spark, SF, llmdata.FEATURE_DIM, llmdata.PROBE_STEPS, train_only=True
    )
    assert w_full != w_train  # withholding the eval docs changed the fit

def test_linear_probe_plan_size_is_dim_independent(spark):
    """VERDICT r9 item 8: the trainer's weight vector rides a broadcast
    (dim+1)-row RELATION, not a literal create_map — so the scoring
    plan's size must NOT scale with the feature dimension. Proven by
    comparing the optimized-plan text at dim=64 vs dim=4096 (64× the
    buckets): a literal map would grow the plan ~64×; the relation keeps
    it flat. Also smoke-runs one high-dim step so the 4096-bucket path
    is executed, not just planned."""
    from sales_etl_pipeline_spark.plans import llmdata

    def plan_chars(dim):
        sdf = llmdata.linear_probe_scores(spark, SF, dim=dim, steps=1)
        return len(
            sdf._jdf.queryExecution().optimizedPlan().toString()
        )

    small, big = plan_chars(64), plan_chars(4096)
    assert big < 2 * small, (small, big)
    rows = llmdata.linear_probe_scores(spark, SF, dim=4096, steps=1).collect()
    assert len(rows) > 0 and all(r.score == r.score for r in rows)  # no NaN

def test_lm_heldout_backoff_ladder(spark, tmp_path):
    """lm_heldout_perplexity on a constructed corpus exercising every
    backoff branch: doc_id=40 lands in the md5 EVAL split (verified via
    the same rule) and contains a train bigram ('a b' — cheap), a
    train-unigram-only transition ('b z' where z is seen but never
    after b), and an OOV token ('qq'). Bits must follow the ladder and
    oov_tokens counts exactly the unseen tokens."""
    from sales_etl_pipeline_spark.functions.core import md5_long
    from sales_etl_pipeline_spark.plans import llmdata
    from sales_etl_pipeline_spark.plans.assembly import (
        EVAL_PCT,
        SPLIT_BUCKETS,
    )
    from pyspark.sql import functions as F

    # find a small doc_id in the eval split deterministically
    ids = spark.range(200).select(
        "id",
        (md5_long(F.col("id").cast("string")) % SPLIT_BUCKETS < EVAL_PCT).alias(
            "ev"
        ),
    )
    eval_id = ids.filter("ev").first().id
    train_id = ids.filter("NOT ev").first().id
    docs = spark.createDataFrame(
        [
            (int(train_id), "a b a b z a"),   # train LM corpus
            (int(eval_id), "z a z qq"),        # eval: uni, bigram, backoff, OOV
        ],
        "doc_id long, text string",
    ).withColumn("source", F.lit("s"))
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    row = llmdata.lm_heldout_perplexity(spark, str(tmp_path)).first()
    assert row.doc_id == eval_id
    assert row.n_tokens == 4
    assert row.oov_tokens == 1  # only 'qq' unseen in train
    # ladder bits over train counts N=6, C(a)=3, C(z)=1, C(za)=1:
    # 'z' first token -> unigram len(bin(6//1))-1 = 2;
    # 'a' after 'z': train bigram -> len(bin(1//1))-1 = 0;
    # 'z' after 'a': (a,z) unseen -> unigram backoff len(bin(6//1))-1 = 2;
    # 'qq': OOV -> len(bin(6))-1 = 2.  mean = 6/4
    assert row.mean_bits_per_token == 6 / 4


def test_bottomk_fold_invariance(spark):
    """bottomk(A ∪ B) ≡ bottomk(bottomk(A) ∪ bottomk(B)) for 1/3/5-way
    corpus splits — the mergeable-sketch property that makes the sample
    maintainable under append-only ingest without rescans."""
    from sales_etl_pipeline_spark.plans import curation
    from sales_etl_pipeline_spark.sources.readers import load_table

    docs = load_table(spark, SF, "documents")
    want = sorted(
        (r.doc_id, r.h) for r in curation.bottomk_state(docs).collect()
    )
    for nb in (3, 5):
        states = [
            curation.bottomk_state(docs.filter(F.col("doc_id") % nb == i))
            for i in range(nb)
        ]
        got = sorted(
            (r.doc_id, r.h)
            for r in curation.merge_bottomk(*states).collect()
        )
        assert got == want, f"fold mismatch at {nb} batches"


def test_bottomk_plan_is_take_ordered(spark):
    """Fixed-size sampling must be TakeOrderedAndProject (per-partition
    top-k), never a global sort of the corpus."""
    from sales_etl_pipeline_spark.plans import curation

    plan = (
        curation.bottomk_sample(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    # below the top-k: scan + hash projection only — the corpus is never
    # globally sorted (the only Sort sits above, over the k sampled rows)
    assert "Sort [" not in plan.split("TakeOrderedAndProject")[1]


def test_token_budget_selection_two_phase_equals_single_window(spark):
    """The score-bucket blocked prefix sum must be BIT-IDENTICAL to the
    naive single-window twin (long addition is associative), and the
    greedy-prefix property must hold: every selected document's quality
    score is >= every excluded document's (ties resolved by doc_id)."""
    from sales_etl_pipeline_spark.plans import assembly

    two = assembly.token_budget_selection(spark, SF)
    one = assembly.token_budget_selection_single_window(spark, SF)
    ra = sorted(tuple(r) for r in two.collect())
    rb = sorted(tuple(r) for r in one.collect())
    assert ra == rb and ra, "two-phase != single-window (or empty)"
    # selection is a true prefix of the quality order
    sel = {r[0] for r in ra}
    scored = assembly._scored_docs(spark, SF).collect()
    order = sorted(scored, key=lambda r: (-r.quality_score, r.doc_id))
    seen_excluded = False
    for r in order:
        if r.doc_id in sel:
            assert not seen_excluded, "selection is not a prefix"
        else:
            seen_excluded = True
    # budget respected; if anything was excluded, adding the first
    # excluded doc would exceed it (at sf0.001 the whole corpus can fit)
    total = sum(r[1] for r in ra)
    assert total <= assembly.TOKEN_BUDGET
    excluded = [r for r in order if r.doc_id not in sel]
    if excluded:
        assert total + excluded[0].n_tokens > assembly.TOKEN_BUDGET
    else:
        assert len(ra) == len(order)  # everything fit: selection = corpus
    # exercise the boundary regime regardless of sf: a budget that can
    # only hold part of the corpus
    small = assembly.token_budget_selection(spark, SF, budget=total // 2)
    small_rows = sorted(tuple(r) for r in small.collect())
    small_one = assembly.token_budget_selection_single_window(
        spark, SF, budget=total // 2
    )
    assert small_rows == sorted(tuple(r) for r in small_one.collect())
    assert 0 < len(small_rows) < len(ra)
    assert sum(r[1] for r in small_rows) <= total // 2


def test_paragraph_dedup_first_occurrence_and_reassembly(spark, tmp_path):
    """Cross-engine parity on a REAL multi-paragraph corpus (the sf
    tables are single-line, so the library-parity run only exercises
    the window fallback): blank-line splits, duplicate paragraphs
    across documents, a doc that is entirely duplicates, ragged
    whitespace separators. Pins first-occurrence semantics and ordered
    reassembly against the DuckDB oracle, plus hand-checked rows."""
    import duckdb

    from tests.oracle_harness import compare

    P = "alpha beta gamma delta"          # the shared boilerplate para
    docs = [
        (0, P + "\n\nunique zero text"),
        (1, "unique one text\n\n" + P),   # P already seen in doc 0
        (2, P + "\n \t\n" + P),           # whitespace-ragged sep; all dup
        (3, "unique three text"),
        (4, ""),                          # empty doc keeps a row
    ]
    d = str(tmp_path / "documents.parquet")
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(d)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/*.parquet')"
    )
    got = curation.paragraph_dedup(spark, str(tmp_path))
    assert not compare(
        got, con, curation.LIBRARY_ORACLE["paragraph_dedup"], "paragraph_dedup"
    )
    rows = {r.doc_id: r for r in got.collect()}
    assert rows[0].clean_text == P + " unique zero text"
    assert rows[0].n_dropped == 0
    assert rows[1].clean_text == "unique one text"       # P deduped away
    assert rows[1].n_dropped == 1
    assert rows[2].clean_text == "" and rows[2].n_dropped == 2
    assert rows[3].clean_text == "unique three text"
    assert rows[4].clean_text == "" and rows[4].n_paras == 0


def test_paragraph_dedup_skew_gate(spark):
    """Skew gate (VERDICT r11 item 3): the boilerplate-family corpus —
    thousands of documents sharing verbatim blocks — must (a) still
    match the batch-free oracle exactly and (b) actually strip the
    repeated blocks (every duplicated window survives exactly once
    corpus-wide). The hot paragraph hash is one window partition of
    skinny rows, so this also exercises the worst-case partition."""
    import duckdb

    from scripts.make_skewdata import ensure_skew_corpus
    from tests.oracle_harness import compare

    sd = ensure_skew_corpus(os.environ.get("SPARK_GRAFT_SKEW_DIR", "/tmp/sfskew"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(sd, 'documents.parquet')}')"
    )
    got = curation.paragraph_dedup(spark, sd)
    assert not compare(
        got, con, curation.LIBRARY_ORACLE["paragraph_dedup"], "paragraph_dedup_skew"
    )
    agg = got.agg(
        F.sum("n_dropped").alias("dropped"), F.sum("n_paras").alias("paras")
    ).first()
    assert agg.dropped > 0, "boilerplate families must lose paragraphs"
    # global invariant: kept windows == distinct normalized windows
    kept = agg.paras - agg.dropped
    distinct_paras = (
        curation.load_table(spark, sd, "documents")
        .select(
            "doc_id",
            F.posexplode(
                F.split("text", curation.PARA_SEP)
            ).alias("piece_idx", "piece"),
        )
        .filter(F.trim(F.col("piece")) != "")
        .select(
            "doc_id",
            "piece_idx",
            F.posexplode(
                curation.tokens(F.col("piece"))
            ).alias("pos", "tok"),
        )
        .withColumn("win", (F.col("pos") / curation.PARA_TOKENS).cast("int"))
        .groupBy("doc_id", "piece_idx", "win")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda x: x["tok"],
                ),
            ).alias("ptext")
        )
        .select(F.md5(F.lower("ptext")).alias("h"))
        .distinct()
        .count()
    )
    assert kept == distinct_paras


def test_incremental_paragraph_dedup_fold_equals_recompute(spark):
    """Folding id-ordered batches through incremental_paragraph_dedup
    must reproduce paragraph_dedup over the whole corpus EXACTLY (per-doc
    clean_text, n_paras, n_dropped), and the folded state's n_seen must
    conserve the total paragraph count — the same fold ≡ recompute
    contract as the exact-dedup/minhash/IVF folds, at paragraph grain."""
    docs = load_table(spark, SF, "documents")
    hi = docs.agg(F.max("doc_id")).first()[0]
    cuts = [hi // 3, 2 * hi // 3]
    batches = [
        docs.filter(F.col("doc_id") <= cuts[0]),
        docs.filter(
            (F.col("doc_id") > cuts[0]) & (F.col("doc_id") <= cuts[1])
        ),
        docs.filter(F.col("doc_id") > cuts[1]),
    ]
    state = spark.createDataFrame([], "para_hash string, n_seen long")
    cleaned = []
    for b in batches:
        state, c = curation.incremental_paragraph_dedup(state, b)
        cleaned.append(c)
        state = state.localCheckpoint(eager=True)
    got = {}
    for c in cleaned:
        for r in c.collect():
            got[r.doc_id] = (r.clean_text, r.n_paras, r.n_dropped)
    want = {
        r.doc_id: (r.clean_text, r.n_paras, r.n_dropped)
        for r in curation.paragraph_dedup(spark, SF).collect()
    }
    assert got == want
    total_paras = sum(n for _, n, _ in want.values())
    assert (
        state.agg(F.sum("n_seen")).first()[0] == total_paras
    )


def test_weighted_sample_is_pps_and_mergeable(spark):
    """Sequential Poisson sampling properties: (a) across independent
    seeded draws, long documents are sampled measurably more often than
    short ones (inclusion ∝ token weight); (b) the sample folds like
    bottom-k — the k smallest priorities of a union are recoverable
    from per-part top-k states, exactly."""
    docs = load_table(spark, SF, "documents")
    n = docs.count()
    tok_of = {
        r.doc_id: r.nt
        for r in docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("nt")
        ).collect()
    }
    median_tok = sorted(tok_of.values())[len(tok_of) // 2]
    heavy_hits = light_hits = 0
    for s in range(8):
        rows = curation.weighted_sample(spark, SF, seed=f"t{s}").collect()
        assert len(rows) == curation.WEIGHTED_K
        assert [r.sample_rank for r in rows] == list(
            range(1, curation.WEIGHTED_K + 1)
        )
        for r in rows:
            if tok_of[r.doc_id] > median_tok:
                heavy_hits += 1
            else:
                light_hits += 1
    # heavier-than-median docs hold >half the tokens → should dominate
    assert heavy_hits > light_hits * 1.3, (heavy_hits, light_hits)
    # mergeability: per-half top-k states fold to the global sample
    full = [
        (r.doc_id, r.priority)
        for r in curation.weighted_sample(spark, SF).collect()
    ]
    halves = []
    for pred in ("doc_id % 2 = 0", "doc_id % 2 = 1"):
        part = (
            curation.load_table(spark, SF, "documents")
            .filter(pred)
            .select(
                "doc_id",
                (
                    (
                        curation.md5_long(
                            F.concat(
                                F.lit("ws0#"),
                                F.col("doc_id").cast("string"),
                            )
                        )
                        + 1
                    ).cast("double")
                    / F.size(F.split("text", " ")).cast("double")
                ).alias("priority"),
            )
            .orderBy("priority", "doc_id")
            .limit(curation.WEIGHTED_K)
            .collect()
        )
        halves.extend((r.doc_id, r.priority) for r in part)
    folded = sorted(halves, key=lambda t: (t[1], t[0]))[: curation.WEIGHTED_K]
    assert folded == full


def test_doc_chunks_overlap_coverage_and_overlap(spark):
    """Sliding-window invariants: every token position is covered by at
    least one window; consecutive windows overlap by exactly
    size − stride tokens (except the tail); reassembling each window
    from the flat token list reproduces chunk_text."""
    rows = curation.doc_chunks_overlap(spark, SF).collect()
    docs = {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, SF, "documents").collect()
    }
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    s, c = curation.CHUNK_STRIDE, curation.CHUNK_TOKENS
    for doc_id, chunks in by_doc.items():
        toks = docs[doc_id]
        chunks.sort(key=lambda r: r.chunk_idx)
        covered = set()
        for r in chunks:
            assert r.start_token == r.chunk_idx * s
            want = toks[r.start_token : r.start_token + c]
            assert r.chunk_text == " ".join(want)
            assert r.n_tokens == len(want)
            covered.update(range(r.start_token, r.start_token + r.n_tokens))
        assert covered == set(range(len(toks)))
        for a, b in zip(chunks, chunks[1:]):
            if a.n_tokens == c:  # full window: fixed overlap with next
                assert a.start_token + c - b.start_token == c - s


def test_r12_plans_edge_corpus_parity(spark, tmp_path):
    """Adversarial-edge cross-engine parity for the r12 oracle plans:
    doubled/tripled spaces (empty tokens), empty text, trailing-space
    tail tokens, and byte-exact duplicate docs — the token-split edge
    cases where Spark and DuckDB conventions could silently diverge.
    Every plan must stay value-hash EXACT on this corpus too."""
    import duckdb

    from sales_etl_pipeline_spark.plans import llmdata
    from tests.oracle_harness import compare

    docs = [
        (0, "a  b   c"),
        (1, ""),
        (2, "x " * 30),
        (3, "a  b   c"),
    ]
    d = str(tmp_path)
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    plans = {
        "paragraph_dedup": (curation.paragraph_dedup, curation.LIBRARY_ORACLE),
        "incremental_paragraph_fold": (
            curation.incremental_paragraph_fold,
            curation.LIBRARY_ORACLE,
        ),
        "weighted_sample": (curation.weighted_sample, curation.LIBRARY_ORACLE),
        "doc_chunks_overlap": (
            curation.doc_chunks_overlap,
            curation.LIBRARY_ORACLE,
        ),
        "countmin_sketch": (llmdata.countmin_sketch, llmdata.LIBRARY_ORACLE),
        "countmin_estimates": (
            llmdata.countmin_estimates,
            llmdata.LIBRARY_ORACLE,
        ),
    }
    for name, (fn, oracles) in plans.items():
        probs = compare(fn(spark, d), con, oracles[name], name)
        assert not probs, (name, probs)


def test_dedup_long_spans_semantics(spark, tmp_path):
    """Hand-checked RefinedWeb criterion on a constructed corpus: a
    60-token block shared verbatim by two docs is cut from BOTH; the
    unique tails survive; a doc with no ≥50-token duplicate span is
    untouched; a sub-threshold (30-token) shared block is NOT cut."""
    import duckdb

    from tests.oracle_harness import compare

    block = " ".join(f"b{i}" for i in range(60))       # 60-token dup block
    small = " ".join(f"s{i}" for i in range(30))       # sub-threshold
    docs = [
        (0, block + " " + " ".join(f"t0x{i}" for i in range(10))),
        (1, " ".join(f"t1x{i}" for i in range(10)) + " " + block),
        (2, " ".join(f"u{i}" for i in range(80))),
        (3, small + " " + " ".join(f"t3x{i}" for i in range(40))),
        (4, small + " " + " ".join(f"t4x{i}" for i in range(40))),
    ]
    d = str(tmp_path)
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = {r.doc_id: r for r in curation.dedup_long_spans(spark, d).collect()}
    assert got[0].clean_text == " ".join(f"t0x{i}" for i in range(10))
    assert got[0].n_removed == 60
    assert got[1].clean_text == " ".join(f"t1x{i}" for i in range(10))
    assert got[1].n_removed == 60
    assert got[2].n_removed == 0 and got[2].clean_text == docs[2][1]
    # 30-token shared block is below the 50-token threshold: untouched
    assert got[3].n_removed == 0 and got[3].clean_text == docs[3][1]
    assert got[4].n_removed == 0
    # and the oracle agrees on this corpus too
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    assert not compare(
        curation.dedup_long_spans(spark, d),
        con,
        curation.LIBRARY_ORACLE["dedup_long_spans"],
        "dedup_long_spans",
    )


# ---------------------------------------------------------------------------
# line-grain quality rules (r13): the synthetic corpus is single-line, so
# discrimination is pinned on an in-memory multi-line fixture (hand-
# computed expectations) and a DuckDB cross-check of the exact same rows.


def _line_fixture(spark):
    rows = [
        # doc 1: 4 lines, one exact duplicate pair ("same line.") →
        # dup_line_frac = 2/4; 3 of 4 lines end in terminal punctuation
        (1, "same line.\nunique one!\nsame line.\nno punct here"),
        # doc 2: bullet-heavy list — every line bullet-started, none
        # punct-terminated, one ellipsis line
        (2, "- alpha beta\n- gamma delta\n- trailing thought..."),
        # doc 3: single line, no newline at all (the synthetic-corpus
        # degenerate case)
        (3, "just one plain line with no terminal punctuation"),
        # doc 4: blank/whitespace lines are dropped before any ratio
        (4, "kept.\n   \n\nkept.\n"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_metrics_fixture_exact(spark):
    got = {
        r["doc_id"]: r
        for r in curation._line_metrics(_line_fixture(spark)).collect()
    }
    d1 = got[1]
    assert d1.n_lines == 4
    assert d1.dup_line_frac == 2 / 4
    assert d1.punct_line_frac == 3 / 4
    assert d1.bullet_line_frac == 0.0
    d2 = got[2]
    assert d2.n_lines == 3
    assert d2.dup_line_frac == 0.0
    assert d2.bullet_line_frac == 1.0
    assert d2.ellipsis_line_frac == 1 / 3
    assert d2.punct_line_frac == 1 / 3  # '...' ends with '.'
    d3 = got[3]
    assert d3.n_lines == 1 and d3.dup_line_frac == 0.0
    d4 = got[4]
    # whitespace-only lines dropped; the two 'kept.' lines duplicate
    assert d4.n_lines == 2
    assert d4.dup_line_frac == 1.0
    assert d4.punct_line_frac == 1.0


def test_line_metrics_fixture_matches_duckdb(spark):
    """The oracle fragment is exercised on multi-line text too (the
    registry oracle only ever sees the single-line corpus)."""
    import duckdb

    fix = _line_fixture(spark)
    pdf = fix.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    sql = "WITH " + curation._LINE_METRICS_SQL + " SELECT * FROM linem ORDER BY doc_id"
    want = con.execute(sql).fetchall()
    got = [
        tuple(r)
        for r in curation._line_metrics(fix).orderBy("doc_id").collect()
    ]
    assert [tuple(w) for w in want] == got


def test_quality_filter_v2_line_rules_fire(spark):
    """Gopher line rules reject what v1 cannot see: a long, lexically
    diverse doc whose lines are one block repeated (dup_line_frac=2/3 >
    0.30) fails v2 with the dup_lines reason; a doc of the same token
    stream as ONE line passes both (the rules are line-grain, not
    token-grain)."""
    words = " ".join(f"w{i}" for i in range(40))
    dup_doc = f"{words}.\n{words}.\nsingle extra line"
    one_line = f"{words}. {words}. single extra line"
    docs = _line_fixture(spark).sparkSession.createDataFrame(
        [(10, dup_doc), (11, one_line)], "doc_id long, text string"
    )
    # route through the public plan by staging the fixture as a corpus
    import tempfile, os as _os

    d = tempfile.mkdtemp(prefix="lineq_")
    docs.select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("fix").alias("source"), F.length("text").alias("n_chars")
    ).write.mode("overwrite").parquet(_os.path.join(d, "documents.parquet"))
    v2 = {r["doc_id"]: r for r in curation.quality_filter_v2(
        docs.sparkSession, d).collect()}
    assert not v2[10].kept and v2[10].reject_reason == "dup_lines"
    assert v2[11].kept and v2[11].reject_reason is None
    v1 = {r["doc_id"]: r for r in curation.quality_filter(
        docs.sparkSession, d).collect()}
    assert v1[10].kept  # v1 is blind to the line-grain duplication


# ---------------------------------------------------------------------------
# DSIR importance resampling (r13): oracle parity is covered by
# tests/test_library_parity.py; these pin the semantics — target-like
# documents must outscore off-target ones, and selection is the top-k.


def _dsir_fixture(spark):
    target_text = "alpha beta gamma delta alpha beta gamma delta"
    rows = [(i, target_text, "en", "src0", len(target_text)) for i in range(5)]
    rows += [
        # raw doc 10: pure target vocabulary → cheap under the target model
        (10, "alpha beta gamma delta alpha beta", "en", "raw", 30),
        # raw doc 11: disjoint junk vocabulary → expensive under target
        (11, "zork quux blarg wibble zork quux", "en", "raw", 30),
        # raw doc 12: half and half
        (12, "alpha beta zork quux alpha wibble", "en", "raw", 30),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_dsir_orders_by_target_likeness(spark, tmp_path):
    import os as _os

    d = str(tmp_path / "dsir")
    _dsir_fixture(spark).write.mode("overwrite").parquet(
        _os.path.join(d, "documents.parquet")
    )
    w = {r.doc_id: r.weight_bits
         for r in curation.dsir_importance_weights(spark, d).collect()}
    assert set(w) == {10, 11, 12}  # target docs never score themselves
    assert w[10] > w[12] > w[11]
    sel = curation.dsir_selected(spark, d).collect()
    assert [r.doc_id for r in sel][:2] == [10, 12]  # rank follows weight
    assert [r.sel_rank for r in sel] == list(range(1, len(sel) + 1))


def test_dsir_selected_compiles_to_topk(spark):
    """The rank-≤-k filter must push a k-row limit below the global
    window (LimitPushDownThroughWindow → TakeOrderedAndProject): the
    single-partition WindowExec then ranks ≤ DSIR_K rows, never the
    corpus — the weighted_sample invariant, pinned here for DSIR too."""
    plan = (
        curation.dsir_selected(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert f"TakeOrderedAndProject(limit={curation.DSIR_K}" in plan


def test_incremental_corpus_report_equals_batch(spark):
    """fold ≡ recompute, bit-exact: the 2-batch incremental report must
    reproduce corpus_report row for row (same metric names, same double
    values — all integer/integer divisions of identical counts)."""
    batch = {(r.metric, r.value)
             for r in curation.corpus_report(spark, SF).collect()}
    fold = {(r.metric, r.value)
            for r in curation.incremental_corpus_report(spark, SF).collect()}
    assert fold == batch


def test_quality_score_calibrated_percentiles(spark, sf_dir):
    """Within-source calibration (plans/curation.quality_score_calibrated):
    rank 1 per source is the best doc (percentile 0), percentiles live
    in [0, 1], are strictly monotone in rank within a source, and every
    scored doc appears exactly once."""
    from collections import defaultdict

    from sales_etl_pipeline_spark.plans.curation import (
        quality_score_calibrated,
    )

    rows = quality_score_calibrated(spark, sf_dir).collect()
    spark.catalog.clearCache()
    assert rows and len({r.doc_id for r in rows}) == len(rows)
    by_src = defaultdict(list)
    for r in rows:
        assert 0.0 <= r.source_percentile <= 1.0
        by_src[r.source].append(r)
    for rs in by_src.values():
        rs.sort(key=lambda r: r.source_rank)
        assert rs[0].source_rank == 1 and rs[0].source_percentile == 0.0
        for a, b in zip(rs, rs[1:]):
            assert b.source_rank == a.source_rank + 1
            assert b.source_percentile > a.source_percentile
            assert b.quality_score < a.quality_score or (
                b.quality_score == a.quality_score and b.doc_id > a.doc_id
            )
