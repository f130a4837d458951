"""Training-example construction (plans/assembly, r13 late): semantic
gates the DuckDB oracle cannot express. Oracle parity for all three
plans is covered by tests/test_library_parity.py; these pin:

- span_corruption's DENOISING INVARIANT: input + target reconstruct the
  original document exactly (the property that makes the pair a valid
  T5 training example), plus the mask-rate band.
- sft_examples' loss-mask contract: the [loss_start, loss_end) char
  range of ``rendered`` IS the response span, for every document.
- length_bucketed_batches' partition property (every doc in exactly one
  batch), the power-of-two bucket bound, and the op's PURPOSE: bucketed
  packing wastes strictly less padding than packing the same shuffle
  order without length buckets.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sales_etl_pipeline_spark.plans import assembly  # noqa: E402
from sales_etl_pipeline_spark.sources.readers import load_table  # noqa: E402

SF = "/root/testdata/sf0.001"
_SENT = re.compile(r"^<extra_id_(\d+)>$")


def _reconstruct(input_text: str, target_text: str, n_spans: int) -> str:
    """Invert span corruption: substitute each input sentinel with the
    tokens its target span hides."""
    spans: dict[int, list[str]] = {}
    cur: list[str] | None = None
    for tok in target_text.split(" ") if target_text else []:
        m = _SENT.match(tok)
        if m:
            k = int(m.group(1))
            if k == n_spans:  # closing sentinel
                cur = None
                continue
            cur = spans.setdefault(k, [])
        elif cur is not None:
            cur.append(tok)
    out: list[str] = []
    for tok in input_text.split(" "):
        m = _SENT.match(tok)
        if m:
            out.extend(spans.get(int(m.group(1)), []))
        else:
            out.append(tok)
    return " ".join(out)


def test_span_corruption_reconstructs_every_document(spark):
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, SF, "documents").collect()
    }
    rows = assembly.span_corruption(spark, SF).collect()
    assert len(rows) == len(docs)
    for r in rows:
        assert _reconstruct(r.input_text, r.target_text, r.n_spans) == docs[
            r.doc_id
        ], r.doc_id


def test_span_corruption_mask_rate_and_sentinel_density(spark):
    rows = assembly.span_corruption(spark, SF).collect()
    docs = load_table(spark, SF, "documents")
    total_toks = docs.select(
        F.sum(F.size(F.split("text", " ")))
    ).collect()[0][0]
    masked = sum(r.n_masked for r in rows)
    # expectation ≈ SC_PCT/100 · SC_LEN/SC_GRID of tokens (slot tails
    # clip below SC_LEN, so the realized rate sits slightly under)
    expect = assembly.SC_PCT / 100 * assembly.SC_LEN / assembly.SC_GRID
    assert 0.5 * expect <= masked / total_toks <= 1.2 * expect
    for r in rows:
        # dense sentinels: input carries exactly n_spans of them, ids 0..n-1
        ids = [
            int(m.group(1))
            for tok in r.input_text.split(" ")
            if (m := _SENT.match(tok))
        ]
        assert ids == list(range(r.n_spans)), r.doc_id


def test_sft_loss_mask_is_exactly_the_response_span(spark):
    rows = assembly.sft_examples(spark, SF).collect()
    assert rows
    for r in rows:
        resp = r.rendered[r.loss_start - 1 : r.loss_end - 1]
        # the masked span IS the assistant text: bounded by the template
        # markers, never bleeding into them
        assert r.rendered.startswith(assembly.SFT_PRE)
        assert r.rendered.endswith(assembly.SFT_POST)
        before = r.rendered[: r.loss_start - 1]
        assert before.endswith(assembly.SFT_MID)
        assert r.rendered[r.loss_end - 1 :] == assembly.SFT_POST
        assert len(resp.split(" ")) == r.n_resp_toks or (
            resp == "" and r.n_resp_toks == 0
        )


def test_length_buckets_partition_and_bound_padding(spark):
    docs = load_table(spark, SF, "documents")
    n_docs = docs.count()
    batches = assembly.length_bucketed_batches(spark, SF).collect()
    assert sum(b.n_docs for b in batches) == n_docs
    for b in batches:
        assert 1 <= b.n_docs <= assembly.LB_BATCH
        # power-of-two bucket: every member (hence max) in [2^b, 2^{b+1})
        assert 2**b.bucket <= b.max_len < 2 ** (b.bucket + 1)
        assert b.pad_waste == b.n_docs * b.max_len - b.sum_tokens
        assert b.pad_waste >= 0
    # purpose gate: the same shuffle order packed WITHOUT buckets wastes
    # more padding (mixing lengths inflates each batch's max_len)
    bucketed_waste = sum(b.pad_waste for b in batches)
    # recompute unbucketed waste driver-side from the doc-grain inputs
    from sales_etl_pipeline_spark.functions.core import md5_long

    placed = (
        docs.select(
            "doc_id",
            F.size(F.split("text", " ")).alias("n_tokens"),
            md5_long(
                F.concat(
                    F.lit(assembly.LB_SEED + "#"),
                    F.col("doc_id").cast("string"),
                )
            ).alias("h"),
        )
        .withColumn(
            "shard", (F.col("h") % assembly.LB_SHARDS).cast("int")
        )
        .collect()
    )
    waste = 0
    by_shard: dict[int, list] = {}
    for r in placed:
        by_shard.setdefault(r.shard, []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: (r.h, r.doc_id))
        for i in range(0, len(shard_rows), assembly.LB_BATCH):
            chunk = shard_rows[i : i + assembly.LB_BATCH]
            waste += len(chunk) * max(c.n_tokens for c in chunk) - sum(
                c.n_tokens for c in chunk
            )
    assert bucketed_waste < waste


def test_examples_deterministic_across_runs(spark):
    one = {
        (r.doc_id, r.input_text, r.target_text)
        for r in assembly.span_corruption(spark, SF).collect()
    }
    two = {
        (r.doc_id, r.input_text, r.target_text)
        for r in assembly.span_corruption(spark, SF).collect()
    }
    assert one == two


def test_temperature_mixing_boosts_the_tail(spark):
    """On the power-law skew corpus the α=1/2 dyadic temperature mix
    must (a) apportion exactly TEMP_SAMPLE_N docs, (b) give every
    tail source a sampled share ≥ its raw share and the head source a
    share ≤ its raw share (the XLM-R rebalance property), (c) draw each
    source's target from its md5-rank prefix deterministically."""
    from scripts.make_skewdata import ensure_skew_corpus

    sf = ensure_skew_corpus("/tmp/sfskew")
    wts = assembly.temperature_mix_weights(spark, sf).collect()
    total_docs = sum(r.n_docs for r in wts)
    assert sum(r.target_n for r in wts) == assembly.TEMP_SAMPLE_N
    head = max(wts, key=lambda r: r.n_docs)
    tail = min(wts, key=lambda r: r.n_docs)
    assert head.n_docs > 4 * tail.n_docs, "corpus not skewed enough"
    head_raw = head.n_docs / total_docs
    head_mix = head.target_n / assembly.TEMP_SAMPLE_N
    tail_raw = tail.n_docs / total_docs
    tail_mix = tail.target_n / assembly.TEMP_SAMPLE_N
    assert head_mix < head_raw
    assert tail_mix > tail_raw
    # the realized sample honors the targets exactly
    sample = assembly.temperature_mix_sample(spark, sf).collect()
    by_src: dict[str, int] = {}
    for r in sample:
        by_src[r.source] = by_src.get(r.source, 0) + 1
    assert by_src == {r.source: r.target_n for r in wts if r.target_n}
    two = assembly.temperature_mix_sample(spark, sf).collect()
    assert {(r.doc_id, r.source) for r in sample} == {
        (r.doc_id, r.source) for r in two
    }


def test_curriculum_order_is_a_phased_permutation(spark):
    """pos is a bijection onto 1..N; phases are non-decreasing along
    pos (the curriculum property); deterministic across runs."""
    rows = assembly.curriculum_order(spark, SF).collect()
    n = load_table(spark, SF, "documents").count()
    assert sorted(r.pos for r in rows) == list(range(1, n + 1))
    assert len({r.doc_id for r in rows}) == n
    by_pos = sorted(rows, key=lambda r: r.pos)
    phases = [r.phase for r in by_pos]
    assert phases == sorted(phases)
    two = {(r.doc_id, r.pos) for r in assembly.curriculum_order(spark, SF).collect()}
    assert {(r.doc_id, r.pos) for r in rows} == two


def test_sft_packed_loss_spans_cover_exactly_the_response_tokens(spark):
    """Reconstruct the packed token stream driver-side: the union of
    emitted (window, span) fragments must be EXACTLY the set of global
    positions occupied by response tokens, with fragments in-bounds
    and non-overlapping per window."""
    W = assembly.SFT_PACK_WINDOW
    ex = (
        assembly.sft_examples(spark, SF)
        .join(
            load_table(spark, SF, "documents").select(
                "doc_id", "source"
            ),
            "doc_id",
        )
        .collect()
    )
    # rebuild per-source packing in doc_id order
    want: set = set()
    by_src: dict = {}
    for r in sorted(ex, key=lambda r: r.doc_id):
        by_src.setdefault(r.source, []).append(r)
    for srcname, rows in by_src.items():
        off = 0
        for r in rows:
            n_tok = r.n_prompt_toks + r.n_resp_toks + 3
            s0 = off + r.n_prompt_toks + 2
            for g in range(s0, s0 + r.n_resp_toks):
                want.add((srcname, g))
            off += n_tok
    got: set = set()
    frags = assembly.sft_packed_loss_spans(spark, SF).collect()
    per_window: dict = {}
    for f in frags:
        assert 0 <= f.start_tok < f.end_tok <= W, f
        seen = per_window.setdefault((f.source, f.window_id), set())
        rng = set(range(f.start_tok, f.end_tok))
        assert not (seen & rng), "overlapping fragments"
        seen |= rng
        for t in rng:
            got.add((f.source, f.window_id * W + t))
    assert got == want and got


def test_preference_pairs_mirrored_ranks_and_positive_margins(spark):
    """DPO pair construction (plans/assembly.preference_pairs): within
    every (lang, source) bucket the pairing is the exact mirrored-rank
    matching — n//2 pairs, each scored doc in at most one pair, chosen
    outranks rejected (margin ≥ 0 with the tie broken by doc_id), and
    pair_rank runs 1..n//2."""
    from collections import defaultdict

    from sales_etl_pipeline_spark.plans.assembly import preference_pairs

    rows = preference_pairs(spark, SF).collect()
    spark.catalog.clearCache()
    assert rows
    by_bucket = defaultdict(list)
    for r in rows:
        assert r.margin >= 0
        assert (r.chosen_score, -r.chosen_doc_id) > (
            r.rejected_score,
            -r.rejected_doc_id,
        )
        by_bucket[(r.lang, r.source)].append(r)
    for pairs in by_bucket.values():
        ranks = sorted(p.pair_rank for p in pairs)
        assert ranks == list(range(1, len(pairs) + 1))
        members = [p.chosen_doc_id for p in pairs] + [
            p.rejected_doc_id for p in pairs
        ]
        assert len(members) == len(set(members))


def test_multiturn_spans_land_on_assistant_turns_and_reconstruct(spark):
    """Multi-turn SFT invariants: every loss span's substring IS that
    assistant turn's token text; roles alternate user-first; stripping
    role headers and the end token reconstructs the original document
    exactly."""
    from sales_etl_pipeline_spark.plans.assembly import (
        MT_ASST,
        MT_END,
        MT_TURN,
        MT_USER,
        sft_multiturn_loss_spans,
        sft_multiturn_rendered,
    )
    from sales_etl_pipeline_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    rendered = {
        r.doc_id: r
        for r in sft_multiturn_rendered(spark, SF).collect()
    }
    spans = sft_multiturn_loss_spans(spark, SF).collect()
    spark.catalog.clearCache()
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, SF, "documents")
        .filter(F.col("text").isNotNull())
        .collect()
    }
    assert set(rendered) == set(docs)
    seen_docs_with_spans = set()
    for s in spans:
        r = rendered[s.doc_id]
        frag = r.rendered[s.loss_start - 1 : s.loss_end - 1]
        toks = docs[s.doc_id].split(" ")
        want = " ".join(
            toks[s.turn_idx * MT_TURN : (s.turn_idx + 1) * MT_TURN]
        )
        assert frag == want and s.turn_idx % 2 == 1
        seen_docs_with_spans.add(s.doc_id)
    assert seen_docs_with_spans
    for doc_id, r in rendered.items():
        body = r.rendered
        assert body.endswith(MT_END)
        body = body[: -len(MT_END)]
        # strip alternating headers: split on the user header first
        body = body.replace(" " + MT_ASST + " ", " ").replace(
            " " + MT_USER + " ", " "
        )
        assert body.startswith(MT_USER + " ")
        assert body[len(MT_USER) + 1 :] == docs[doc_id]
        n = len(docs[doc_id].split(" "))
        assert r.n_turns == (n + MT_TURN - 1) // MT_TURN


def test_preference_agreement_kappa_invariants(spark, sf_dir):
    """κ gates: counts consistent (agree ≤ pairs, marginals ≤ pairs),
    p_o/p_e/κ recompute exactly from the integer counts, κ is NULL
    exactly on chance-saturated buckets (p_e = 1), and the relation is
    non-vacuous in both directions (some disagreement, some non-null
    κ, and at least one bucket where κ < 1)."""
    from sales_etl_pipeline_spark.plans import assembly

    rows = assembly.preference_agreement_stats(spark, sf_dir).collect()
    pairs = assembly.preference_pairs(spark, sf_dir).collect()
    n_by_bucket = {}
    for p in pairs:
        n_by_bucket[(p.lang, p.source)] = (
            n_by_bucket.get((p.lang, p.source), 0) + 1
        )
    assert {(r.lang, r.source) for r in rows} == set(n_by_bucket)
    saw_nonnull = saw_disagree = saw_imperfect = False
    for r in rows:
        assert r.n_pairs == n_by_bucket[(r.lang, r.source)]
        assert 0 <= r.n_agree <= r.n_pairs
        assert r.p_observed == r.n_agree / r.n_pairs
        if r.kappa is None:
            assert r.p_expected == 1.0
        else:
            saw_nonnull = True
            assert abs(
                r.kappa
                - (r.p_observed - r.p_expected) / (1.0 - r.p_expected)
            ) == 0.0
            if r.kappa < 1.0:
                saw_imperfect = True
        if r.n_agree < r.n_pairs:
            saw_disagree = True
    assert saw_nonnull and saw_disagree and saw_imperfect
    spark.catalog.clearCache()
