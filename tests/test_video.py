"""Gates for the video-grain operators (plans/video.py). Oracle parity
runs in tests/test_library_parity.py; these pin the frame-vote
semantics and the zero-Python plan shape."""

from __future__ import annotations

from collections import defaultdict

from sales_etl_pipeline_spark.plans import video
from sales_etl_pipeline_spark.plans.images import VARIANT_OFFSET
from tests.conftest import executed_plan


def test_plan_is_pure_expressions(spark, sf_dir):
    """The fingerprint pass must stay JVM-side: no Python evaluation
    node anywhere in the executed plan (the module's zero-Python
    claim)."""
    df = video.video_frame_fingerprints(spark, sf_dir)
    plan = executed_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "mapInPandas" not in plan.lower()


def test_every_clip_has_eight_frames(spark, sf_dir):
    rows = video.video_frame_fingerprints(spark, sf_dir).collect()
    spark.catalog.clearCache()
    per_clip = defaultdict(set)
    for r in rows:
        assert len(r.fhash_hex) == 4
        per_clip[r.clip_id].add(r.frame_idx)
    assert per_clip
    assert all(v == set(range(8)) for v in per_clip.values())


def test_variant_pairs_win_the_frame_vote(spark, sf_dir):
    """A perturbed variant touches ≤ 2 of 8 frames, so every
    (original, variant) pair whose fingerprints differ at all must
    appear with n_matching_frames ≥ 6 — unless the pair is signature-
    identical, in which case the pre-collapse removed it (checked)."""
    fp = video.video_frame_fingerprints(spark, sf_dir).collect()
    spark.catalog.clearCache()
    sig = defaultdict(dict)
    for r in fp:
        sig[r.clip_id][r.frame_idx] = r.fhash_hex
    pairs = {
        (r.clip_a, r.clip_b): r.n_matching_frames
        for r in video.video_near_dup_frames(spark, sf_dir).collect()
    }
    spark.catalog.clearCache()
    assert pairs, "no frame-vote pairs at this SF — gate vacuous"
    # signature → canonical (min clip id), mirroring the pre-collapse
    canon: dict[tuple, int] = {}
    for cid, frames in sig.items():
        key = tuple(frames[i] for i in range(8))
        canon[key] = min(canon.get(key, cid), cid)
    checked = 0
    for cid, frames in sig.items():
        if cid < VARIANT_OFFSET or (cid - VARIANT_OFFSET) not in sig:
            continue
        orig = sig[cid - VARIANT_OFFSET]
        matches = sum(frames[i] == orig[i] for i in range(8))
        a = canon[tuple(orig[i] for i in range(8))]
        b = canon[tuple(frames[i] for i in range(8))]
        if a == b:
            continue  # signature-identical family — collapsed away
        lo, hi = min(a, b), max(a, b)
        if matches >= video.FRAME_VOTE_K:
            # the canonical pair must carry AT LEAST this many matches
            # (canonicals share signatures with the originals)
            assert pairs.get((lo, hi), 0) >= matches
            checked += 1
    assert checked, "no differing variant pairs at this SF — gate vacuous"


def test_vote_counts_match_brute_force(spark, sf_dir):
    """Every reported pair's n_matching_frames equals the brute-force
    per-index fingerprint comparison, and no qualifying canonical pair
    is missing (the join is declarative — this is a belt-and-braces
    replay, not a completeness proof)."""
    fp = video.video_frame_fingerprints(spark, sf_dir).collect()
    spark.catalog.clearCache()
    sig = defaultdict(dict)
    for r in fp:
        sig[r.clip_id][r.frame_idx] = r.fhash_hex
    canon: dict[tuple, int] = {}
    for cid, frames in sig.items():
        key = tuple(frames[i] for i in range(8))
        canon[key] = min(canon.get(key, cid), cid)
    canon_ids = sorted(canon.values())
    expected = {}
    for i, a in enumerate(canon_ids):
        fa = sig[a]
        for b in canon_ids[i + 1 :]:
            fb = sig[b]
            m = sum(fa[k] == fb[k] for k in range(8))
            if m >= video.FRAME_VOTE_K:
                expected[(a, b)] = m
    got = {
        (r.clip_a, r.clip_b): r.n_matching_frames
        for r in video.video_near_dup_frames(spark, sf_dir).collect()
    }
    spark.catalog.clearCache()
    assert got == expected and expected


def test_decontamination_cross_split_nonvacuous_and_correct(spark, sf_dir):
    """The r15 decon twin: pairs cross the split, 8/8 exact leaks exist
    (eval re-uploads land on the training side), and ≥1 near-miss
    (6..7 matching frames, an eval variant vs its original's
    training-side re-upload) appears — never vacuous or exact-only."""
    from sales_etl_pipeline_spark.plans.images import EVAL_MOD
    from sales_etl_pipeline_spark.plans.video import FRAME_VOTE_K

    rows = video.video_decontamination_frames(spark, sf_dir).collect()
    spark.catalog.clearCache()
    assert rows
    for r in rows:
        assert (r.clip_id % VARIANT_OFFSET) % EVAL_MOD != 0, "train side"
        assert (r.eval_clip_id % VARIANT_OFFSET) % EVAL_MOD == 0, "eval side"
        assert FRAME_VOTE_K <= r.n_matching_frames <= 8
    assert any(r.n_matching_frames == 8 for r in rows), "no exact leaks"
    assert any(r.n_matching_frames < 8 for r in rows), "no near leaks"


def test_incremental_fold_equals_recompute_and_has_dups(spark, sf_dir):
    """Fold ≡ batch-free recompute at frame-signature grain, with real
    dup families from the re-upload twins."""
    from pyspark.sql import functions as F
    from sales_etl_pipeline_spark.plans.images import _image_corpus_full

    folded = {
        r.sig: (r.clip_id, r.dup_count)
        for r in video.incremental_video_dedup_fold(spark, sf_dir).collect()
    }
    recomputed = {
        r.sig: (r.clip_id, r.dup_count)
        for r in video._clip_sigs(
            video._frame_fingerprints(_image_corpus_full(spark, sf_dir))
        )
        .groupBy("sig")
        .agg(
            F.min("clip_id").alias("clip_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .collect()
    }
    spark.catalog.clearCache()
    assert folded == recomputed
    assert any(c > 1 for _, c in folded.values()), "no dup families"


def test_decon_and_fold_plans_are_pure_expressions(spark, sf_dir):
    """The r15 video plans inherit the zero-Python claim: no Python
    evaluation node anywhere in either executed plan — the whole
    cross-split frame-vote and the signature fold stay JVM-side."""
    for df in (
        video.video_decontamination_frames(spark, sf_dir),
        video.incremental_video_dedup_fold(spark, sf_dir),
    ):
        plan = executed_plan(df)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "mapInPandas" not in plan.lower()
    spark.catalog.clearCache()
