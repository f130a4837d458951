"""Invariant gates for the cross-modal joint dedup resolution
(plans/crossmodal.py). Oracle parity (recursive-CTE closure over the
unioned edge relation) runs in tests/test_library_parity.py; these pin
the retention policy and the cluster-union semantics the oracle hash
can't express as named claims."""

from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sales_etl_pipeline_spark.plans import crossmodal, images, llmdata

SF = os.environ.get("TEST_SF", "/root/testdata/sf0.001")


def test_one_survivor_per_joint_cluster_and_quality_argmax(spark):
    """Exactly ONE kept pair per joint cluster, and it is the
    (quality_score DESC, doc_id ASC) argmax; singletons are all kept."""
    rows = crossmodal.crossmodal_dedup_resolution(spark, SF).collect()
    spark.catalog.clearCache()
    assert rows
    by_cluster = defaultdict(list)
    singles = []
    for r in rows:
        (by_cluster[r.joint_cluster] if r.joint_cluster is not None
         else singles).append(r)
    assert by_cluster, "no joint clusters — vacuous"
    for members in by_cluster.values():
        kept = [m for m in members if m.kept]
        assert len(kept) == 1
        best = min(members, key=lambda m: (-m.quality_score, m.doc_id))
        assert kept[0].doc_id == best.doc_id
    assert all(s.kept for s in singles)


def test_joint_clusters_coarsen_both_modalities(spark):
    """Two docs near-dup in EITHER modality share a joint cluster: the
    union closure can only merge, never split, each single-modality
    clustering — the consistency property this operator exists for."""
    res = {
        r.doc_id: r.joint_cluster
        for r in crossmodal.crossmodal_dedup_resolution(spark, SF).collect()
    }
    text_edges = [
        (r.doc_a, r.doc_b)
        for r in llmdata.minhash_near_dup(spark, SF)
        .select("doc_a", "doc_b")
        .collect()
    ]
    img_pairs = [
        (r.doc_a % images.VARIANT_OFFSET, r.doc_b % images.VARIANT_OFFSET)
        for r in images.image_near_dup_ahash(spark, SF).collect()
    ]
    spark.catalog.clearCache()
    assert text_edges, "no text edges — vacuous"
    for a, b in text_edges + [(x, y) for x, y in img_pairs if x != y]:
        assert res[a] is not None and res[a] == res[b], (a, b)


def test_crossmodal_uses_both_edge_sources(spark):
    """The joint graph is a strict refinement test: at least one joint
    cluster contains docs that only an IMAGE edge (exact-hash link or
    banded pair) could have joined, i.e. the union adds information
    over the text graph alone — guards against the image side silently
    going vacuous."""
    joint = crossmodal._joint_edges(spark, SF)
    text_only = {
        (r.doc_a, r.doc_b)
        for r in llmdata.minhash_near_dup(spark, SF)
        .select("doc_a", "doc_b")
        .collect()
    }
    joint_set = {(r.doc_a, r.doc_b) for r in joint.collect()}
    spark.catalog.clearCache()
    normalized_text = {tuple(sorted(p)) for p in text_only}
    assert joint_set - normalized_text, "image edges added nothing — vacuous"


def test_consistency_check_invariants(spark):
    """joint_kept ⇒ text_kept ∧ image_kept (a joint cluster is a
    superset union of the doc's text and image clusters under the SAME
    total order, so the joint winner must also win both subsets);
    `consistent` is exactly text_kept == image_kept; and disagreements
    exist on this corpus (the diagnostic is non-vacuous)."""
    rows = crossmodal.crossmodal_consistency_check(spark, SF).collect()
    spark.catalog.clearCache()
    assert rows
    for r in rows:
        if r.joint_kept:
            assert r.text_kept and r.image_kept, r
        assert r.consistent == (r.text_kept == r.image_kept)
    assert any(not r.consistent for r in rows), "no disagreements — vacuous"
    # and joint resolution agrees with the standalone plan
    joint = {
        r.doc_id: r.kept
        for r in crossmodal.crossmodal_dedup_resolution(spark, SF).collect()
    }
    spark.catalog.clearCache()
    assert all(joint[r.doc_id] == r.joint_kept for r in rows)
