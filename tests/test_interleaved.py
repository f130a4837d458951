"""Reconstruction-invariant gates for the multimodal interleaved
packing family (plans/interleaved.py). Oracle parity itself runs in
tests/test_oracle_parity.py (driver tier: mm_interleaved_packed_spans,
mm_packing_stats) and tests/test_library_parity.py
(mm_interleaved_spans); these tests pin the STRUCTURAL invariants a
green hash alone wouldn't localize: per-document segment tiling, the
constant per-image media budget, window tiling, and split-segment
reconstruction across window boundaries."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from sales_etl_pipeline_spark.plans import interleaved as I

from conftest import executed_plan

W = I.MM_PACK_WINDOW
MT = I.MEDIA_TOKENS


def test_segments_tile_each_document(spark, sf_dir):
    """Per doc: segments sorted by seg_idx are contiguous, start at 0,
    end at n + m*MEDIA_TOKENS, never overlap; image segments are
    exactly MEDIA_TOKENS long and alternate with text (odd seg_idx)."""
    rows = I.mm_interleaved_spans(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.size(F.split("text", " ")).alias("n")
    ).collect()
    expected_total = {r.doc_id: r.n + (r.doc_id % 3) * MT for r in docs}
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r.doc_id].append(r)
    assert set(by_doc) == set(expected_total)
    for doc_id, segs in by_doc.items():
        segs.sort(key=lambda r: r.seg_idx)
        pos = 0
        for s in segs:
            assert s.start_tok == pos, (doc_id, s)
            assert s.end_tok > s.start_tok
            if s.seg_idx % 2 == 1:
                assert s.modality == "image"
                assert s.end_tok - s.start_tok == MT
            else:
                assert s.modality == "text"
            pos = s.end_tok
        assert pos == expected_total[doc_id], doc_id
    # the corpus convention yields m = doc_id % 3 image slots
    n_img = {
        d: sum(1 for s in segs if s.modality == "image")
        for d, segs in by_doc.items()
    }
    assert all(n_img[d] == d % 3 for d in n_img)
    assert any(v == 2 for v in n_img.values()), "no 2-image docs — vacuous"


def test_packed_windows_tile_and_reconstruct(spark, sf_dir):
    """Per (source, window): spans are disjoint and contiguous from 0;
    every window but each source's last is exactly full. Split segments
    reassemble: per (doc, seg), packed lengths sum to the segment
    length and the pieces are boundary-contiguous."""
    packed = I.mm_interleaved_packed_spans(spark, sf_dir).collect()
    segs = {
        (r.doc_id, r.seg_idx): r.end_tok - r.start_tok
        for r in I.mm_interleaved_spans(spark, sf_dir).collect()
    }
    by_win = defaultdict(list)
    for r in packed:
        assert r.loss_mask == (r.modality == "text")
        by_win[(r.source, r.window_id)].append(r)
    last_win = {}
    for (src, w) in by_win:
        last_win[src] = max(last_win.get(src, -1), w)
    for (src, w), spans in by_win.items():
        spans.sort(key=lambda r: r.start_tok)
        pos = 0
        for s in spans:
            assert s.start_tok == pos, (src, w, s)
            pos = s.end_tok
        if w < last_win[src]:
            assert pos == W, (src, w, pos)
        else:
            assert 0 < pos <= W
    # windows are dense 0..last per source
    for src, last in last_win.items():
        assert {w for (s, w) in by_win if s == src} == set(range(last + 1))
    # reconstruction: packed pieces of one segment sum to its length,
    # and a straddling segment's pieces end at W / resume at 0
    pieces = defaultdict(list)
    for r in packed:
        pieces[(r.doc_id, r.seg_idx)].append(r)
    assert set(pieces) == set(segs)
    split_seen = False
    for key, ps in pieces.items():
        ps.sort(key=lambda r: r.window_id)
        assert sum(p.end_tok - p.start_tok for p in ps) == segs[key]
        for a, b in zip(ps, ps[1:]):
            split_seen = True
            assert b.window_id == a.window_id + 1
            assert a.end_tok == W and b.start_tok == 0
    assert split_seen, "no segment straddles a window — vacuous"


def test_packing_stats_consistent_with_spans(spark, sf_dir):
    """mm_packing_stats rows recompute exactly from the packed spans,
    and image_tokens spend matches the corpus's media budget
    (sum over docs of (doc_id % 3) * MEDIA_TOKENS)."""
    packed = I.mm_interleaved_packed_spans(spark, sf_dir).collect()
    stats = {
        (r.source, r.window_id): r
        for r in I.mm_packing_stats(spark, sf_dir).collect()
    }
    agg = defaultdict(lambda: [set(), 0, 0, 0])
    for r in packed:
        a = agg[(r.source, r.window_id)]
        a[0].add(r.doc_id)
        a[1] += 1
        ln = r.end_tok - r.start_tok
        if r.modality == "text":
            a[2] += ln
        else:
            a[3] += ln
    assert set(stats) == set(agg)
    for k, (d, n, t, i) in agg.items():
        s = stats[k]
        assert (s.n_docs, s.n_spans, s.text_tokens, s.image_tokens) == (
            len(d), n, t, i,
        )
        assert s.total_tokens == t + i
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    budget = sum((r.doc_id % 3) * MT for r in docs)
    assert sum(s.image_tokens for s in stats.values()) == budget


def test_render_reconstructs_budget_and_counts(spark, sf_dir):
    """mm_interleaved_render invariants: each window's content re-splits
    to exactly n_tokens tokens, n_tokens matches mm_packing_stats'
    total_tokens, and the corpus-wide IMG_SENTINEL count equals the
    media budget (sum of (doc_id % 3) * MEDIA_TOKENS)."""
    rendered = I.mm_interleaved_render(spark, sf_dir).collect()
    stats = {
        (r.source, r.window_id): r.total_tokens
        for r in I.mm_packing_stats(spark, sf_dir).collect()
    }
    assert {(r.source, r.window_id) for r in rendered} == set(stats)
    sentinels = 0
    for r in rendered:
        toks = r.content.split(" ")
        assert len(toks) == r.n_tokens == stats[(r.source, r.window_id)]
        sentinels += sum(1 for t in toks if t == I.IMG_SENTINEL)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    assert sentinels == sum((d.doc_id % 3) * MT for d in docs)


def test_incremental_fold_equals_recompute(spark, sf_dir):
    """fold ≡ recompute in-engine too (the oracle proves it vs DuckDB;
    this pins the two Spark plans against each other row-for-row)."""
    fold = I.incremental_interleaved_fold(spark, sf_dir).collect()
    full = I.mm_interleaved_packed_spans(spark, sf_dir).collect()
    key = lambda r: (r.source, r.window_id, r.doc_id, r.seg_idx)
    assert sorted(map(tuple, fold), key=str) == sorted(
        map(tuple, full), key=str
    )
    assert fold


def test_interleaved_plans_are_pure_expressions(spark, sf_dir):
    """No Python eval node anywhere — segment layout, prefix sum and
    window clip are all Catalyst expressions (the plans/video.py
    no-EvalPython pin)."""
    for fn in (
        I.mm_interleaved_spans,
        I.mm_interleaved_packed_spans,
        I.mm_packing_stats,
    ):
        plan = executed_plan(fn(spark, sf_dir))
        assert "EvalPython" not in plan, fn.__name__


def test_window_decontamination_consistency(spark, sf_dir):
    """Window-grain decon gates: clean bit ≡ zero contaminated docs,
    counts bounded by membership, the contaminated-doc set agrees with
    contamination_check, and both outcomes occur (non-vacuous)."""
    from sales_etl_pipeline_spark.plans.curation import contamination_check

    rows = I.mm_window_decontamination(spark, sf_dir).collect()
    bad = {r.doc_id for r in contamination_check(spark, sf_dir).collect()}
    members = defaultdict(set)
    for r in I.mm_interleaved_packed_spans(spark, sf_dir).collect():
        members[(r.source, r.window_id)].add(r.doc_id)
    assert {(r.source, r.window_id) for r in rows} == set(members)
    for r in rows:
        docs = members[(r.source, r.window_id)]
        assert r.n_docs == len(docs)
        assert r.n_contaminated_docs == len(docs & bad)
        assert r.window_clean == (r.n_contaminated_docs == 0)
    assert any(r.window_clean for r in rows), "no clean windows"
    assert any(not r.window_clean for r in rows), "no dirty windows"
    spark.catalog.clearCache()


def test_interleaved_windows_are_block_partitioned(spark, sf_dir):
    """The prefix-sum windows partition by (source, blk) — never a
    one-partition global running sum (the curriculum/preference pin);
    and no plan in the family degenerates to a CartesianProduct."""
    import re

    for fn in (
        I.mm_interleaved_packed_spans,
        I.incremental_interleaved_fold,
        I.mm_interleaved_render,
    ):
        plan = executed_plan(fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, fn.__name__
        for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
            spec = m.group(0)
            assert ("blk" in spec) or ("source" in spec and "window" in spec), (
                fn.__name__,
                spec,
            )


def test_segment_layout_tiny_docs_edge_cases(spark):
    """Edge hardening the corpus never exercises (its docs have n ≥ 10):
    documents with fewer text tokens than image slots (n < m+1) produce
    empty text segments at some cut points — those are dropped, indices
    stay stable, and the tiling invariant still holds with total
    n + m*MEDIA_TOKENS."""
    rows = [
        (0, "src0", "a b c"),      # m=0: single text segment
        (1, "src0", "x"),          # m=1, n=1: c_0 = 0 → leading text empty
        (2, "src0", "p q"),        # m=2, n=2: c = (0,1) → first text empty
        (5, "src0", "only"),       # m=2, n=1: c = (0,0) → two empty texts,
                                   #   adjacent images
        (3, "src0", "t u v w"),    # m=0
        (4, "src0", "h i"),        # m=1, n=2: c_0 = 1 → both texts length 1
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    segs = I._segments_of(docs).collect()
    by_doc = defaultdict(list)
    for r in segs:
        by_doc[r.doc_id].append(r)
    for doc_id, _, text in rows:
        n, m = len(text.split(" ")), doc_id % 3
        ss = sorted(by_doc[doc_id], key=lambda r: r.seg_idx)
        pos = 0
        for s in ss:
            assert s.start_tok == pos, (doc_id, s)
            assert s.end_tok > s.start_tok
            pos = s.end_tok
        assert pos == n + m * MT, doc_id
        assert sum(1 for s in ss if s.modality == "image") == m
    # doc 5 (n=1, m=2): both cuts land at 0 → text segments k=2 and k=4
    # are empty; the sole text lands at k=0 ... no: c=(0,0) means k=0 is
    # ALSO empty and the text rides the trailing segment k=4
    d5 = {s.seg_idx: s for s in by_doc[5]}
    assert set(d5) == {1, 3, 4}, d5  # two images + the trailing text
    assert d5[1].modality == "image" and d5[3].modality == "image"
    assert d5[4].modality == "text"
    assert d5[4].end_tok - d5[4].start_tok == 1
