"""Cross-modal joint dedup resolution (r15): the LAION-style curation
step where the KEEP decision for an image-text PAIR must be consistent
across modalities. A document's text can be a near-dup of one neighbor
while its image is a near-dup of another; deduping each modality
independently can keep the text of one pair and the image of a
different pair. The joint policy clusters over the UNION of the two
edge relations — text MinHash near-dup edges (llmdata.minhash_near_dup,
doc grain) and perceptual image edges (exact-aHash groups + banded
near-dup pairs, images.py, projected to doc grain via the
img_id % VARIANT_OFFSET id arithmetic) — closes them transitively
(llmdata.components_from_edges, the shared min-label + pointer-jumping
loop), and keeps exactly ONE pair per joint cluster: the highest
text-quality copy (ties → min doc_id), the quality_aware_dedup
retention policy at joint-cluster grain.

ORACLE-EXACT by composition (the quality_aware_dedup precedent): the
DuckDB twin recomputes the image fingerprints relationally
(images._bytes_cte_sql chain), takes the NAIVE all-pairs image edge
relation, unions it with the replayed minhash edge relation
(llmdata.ORACLE['minhash_near_dup']), closes the union with one
recursive CTE, and MIN(label) per node is the converged labeling; the
quality argmax replays text_quality's exact arithmetic. A green row
therefore proves (a) the banded image candidate generation complete,
(b) the min-label fixpoint correct over the UNIONED graph, and (c) the
retention window exact — in one hash.

Scale: both edge relations are produced at banded/canonical grain
(never all-pairs); the closure loop runs at cluster grain with
localCheckpoint lineage truncation; the quality join is doc-grain
map-side; the final argmax is one window over cluster grain. Nothing
here is corpus-quadratic.

Reference scope note: the reference pipeline
(``/root/reference/data/etl.py``) has no multimodal surface; this is
SURVEY.md §2.11 north-star scope composing plans/llmdata.py and
plans/images.py building blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .images import (
    HAM_MAX,
    VARIANT_OFFSET,
    _band_int_sql,
    _banded_near_dup,
    _bytes_cte_sql,
    _fingerprints,
    _image_corpus,
)
from .llmdata import ORACLE as _LLM_ORACLE
from .llmdata import (
    _pin,
    components_from_edges,
    minhash_near_dup,
    text_quality,
)


def _normalize_edges(edges: DataFrame) -> DataFrame:
    """Drop self-links, orient a < b, dedup."""
    return (
        edges.where(F.col("doc_a") != F.col("doc_b"))
        .select(
            F.least("doc_a", "doc_b").alias("doc_a"),
            F.greatest("doc_a", "doc_b").alias("doc_b"),
        )
        .distinct()
    )


def _image_doc_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image edges at DOCUMENT grain: exact-aHash links
    (every image to its hash-group canonical) + banded near-dup pairs,
    both projected img→doc via % VARIANT_OFFSET (self-links from a
    doc's own perturbed variant drop out), normalized."""
    fp = _pin(
        _fingerprints(_image_corpus(spark, sf_dir)).select(
            "img_id", "ahash_hex"
        )
    )
    canon = fp.groupBy("ahash_hex").agg(F.min("img_id").alias("canon"))
    exact_links = fp.join(canon, "ahash_hex").select(
        (F.col("img_id") % VARIANT_OFFSET).alias("doc_a"),
        (F.col("canon") % VARIANT_OFFSET).alias("doc_b"),
    )
    near_links = _banded_near_dup(fp).select(
        (F.col("doc_a") % VARIANT_OFFSET).alias("doc_a"),
        (F.col("doc_b") % VARIANT_OFFSET).alias("doc_b"),
    )
    return _normalize_edges(exact_links.unionByName(near_links))


def _joint_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unioned (doc_a, doc_b) edge relation at document grain:
    text MinHash pairs + the image doc-grain edges."""
    text_edges = minhash_near_dup(spark, sf_dir).select("doc_a", "doc_b")
    return _normalize_edges(
        text_edges.unionByName(_image_doc_edges(spark, sf_dir))
    )


def _keep_flag(comp: DataFrame, q: DataFrame, name: str) -> DataFrame:
    """(doc_id, <name>) — the quality-argmax retention policy over a
    (doc_id, component) clustering: TRUE for the (quality DESC, doc_id
    ASC) best of each cluster and for every unclustered doc (the
    quality_aware_dedup policy, shared by all three clusterings in
    crossmodal_consistency_check)."""
    w = Window.partitionBy("component").orderBy(
        F.col("quality_score").desc(), "doc_id"
    )
    ranked = comp.join(q, "doc_id").withColumn(
        "rn", F.row_number().over(w)
    )
    return q.join(ranked.select("doc_id", "rn"), "doc_id", "left").select(
        "doc_id",
        (F.col("rn").isNull() | (F.col("rn") == 1)).alias(name),
    )


def crossmodal_dedup_resolution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One KEEP decision per image-text pair, consistent across
    modalities: joint clusters from the unioned text+image edge graph,
    one survivor per cluster by (text quality DESC, doc_id ASC);
    pairs outside any cluster survive untouched. Returns
    (doc_id, joint_cluster, quality_score, kept) — joint_cluster NULL
    for singleton pairs."""
    comp = components_from_edges(_joint_edges(spark, sf_dir)).select(
        "doc_id", F.col("component").alias("joint_cluster")
    )
    q = text_quality(spark, sf_dir).select("doc_id", "quality_score")
    w = Window.partitionBy("joint_cluster").orderBy(
        F.col("quality_score").desc(), "doc_id"
    )
    ranked = comp.join(q, "doc_id").withColumn(
        "rn", F.row_number().over(w)
    )
    return (
        q.join(
            ranked.select("doc_id", "joint_cluster", "rn"), "doc_id", "left"
        )
        .select(
            "doc_id",
            "joint_cluster",
            "quality_score",
            (F.col("rn").isNull() | (F.col("rn") == 1)).alias("kept"),
        )
        .orderBy("doc_id")
    )


def crossmodal_consistency_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The DIAGNOSTIC that motivates the joint policy: per document,
    the keep decision each single-modality dedup would make (text
    MinHash clusters / perceptual image clusters, both resolved by the
    shared quality-argmax policy), the JOINT decision, and whether the
    two modalities AGREE. On the synthetic corpus ~64% of documents
    disagree (text keeps what image drops or vice versa) — exactly the
    inconsistency a pair-grain pipeline must not ship, and the number
    this plan lets an operator monitor. Oracle-EXACT by composition:
    three recursive-CTE closures (text, image, joint) + three argmax
    windows over the same replayed quality relation, in one hash.
    Returns (doc_id, text_kept, image_kept, joint_kept, consistent)."""
    q = text_quality(spark, sf_dir).select("doc_id", "quality_score")
    text_edges = _normalize_edges(
        minhash_near_dup(spark, sf_dir).select("doc_a", "doc_b")
    )
    img_edges = _image_doc_edges(spark, sf_dir)
    joint_edges = _normalize_edges(text_edges.unionByName(img_edges))
    kept_t = _keep_flag(components_from_edges(text_edges), q, "text_kept")
    kept_i = _keep_flag(components_from_edges(img_edges), q, "image_kept")
    kept_j = _keep_flag(
        components_from_edges(joint_edges), q, "joint_kept"
    )
    return (
        kept_t.join(kept_i, "doc_id")
        .join(kept_j, "doc_id")
        .select(
            "doc_id",
            "text_kept",
            "image_kept",
            "joint_kept",
            (F.col("text_kept") == F.col("image_kept")).alias("consistent"),
        )
        .orderBy("doc_id")
    )


LIBRARY_QUERIES = {
    "crossmodal_dedup_resolution": crossmodal_dedup_resolution,
    "crossmodal_consistency_check": crossmodal_consistency_check,
}

# recursive-CTE closure over the UNIONED edge relation: replayed
# minhash edges + naive all-pairs image edges + exact-hash links,
# then the text_quality argmax — the quality_aware_dedup oracle
# composition extended across modalities.
#
# ORACLE SCALE NOTE (r15 ADVICE): the `reach`/`reach_t`/`reach_i`/
# `reach_j` closures materialize every (node, label) pair reachable
# within a component — O(n²) rows PER COMPONENT — and on this
# synthetic corpus the exact-hash links couple nearly all docs into
# ONE joint cluster, so oracle memory/runtime grows quadratically
# with corpus size. Fine at the registry parity SFs (sf0.001 /
# sf0.01, both green); do NOT raise the oracle SF for these two
# queries without first switching the closure to an iterative
# min-label CTE (recompute per-node MIN(lbl) each round instead of
# accumulating all reachable labels). The PRODUCTION plan is immune:
# components_from_edges carries one label per node per round.
LIBRARY_ORACLE = {
    "crossmodal_dedup_resolution": f"""
        WITH RECURSIVE {_bytes_cte_sql()},
        hb AS (
            SELECT ahash_hex, CAST(MIN(img_id) AS BIGINT) AS canon,
                   CAST({_band_int_sql(0)} AS INTEGER) AS b0,
                   CAST({_band_int_sql(1)} AS INTEGER) AS b1,
                   CAST({_band_int_sql(2)} AS INTEGER) AS b2,
                   CAST({_band_int_sql(3)} AS INTEGER) AS b3
            FROM ahex GROUP BY ahash_hex
        ),
        iexact AS (
            SELECT m.img_id % {VARIANT_OFFSET} AS doc_a,
                   h.canon % {VARIANT_OFFSET} AS doc_b
            FROM ahex m JOIN hb h USING (ahash_hex)
        ),
        inear AS (
            SELECT doc_a, doc_b FROM (
                SELECT a.canon % {VARIANT_OFFSET} AS doc_a,
                       b.canon % {VARIANT_OFFSET} AS doc_b,
                       bit_count(xor(a.b0, b.b0))
                     + bit_count(xor(a.b1, b.b1))
                     + bit_count(xor(a.b2, b.b2))
                     + bit_count(xor(a.b3, b.b3)) AS hamming
                FROM hb a JOIN hb b ON a.canon < b.canon
            ) WHERE hamming BETWEEN 1 AND {HAM_MAX}
        ),
        tnd AS (
            SELECT doc_a, doc_b
            FROM ({_LLM_ORACLE["minhash_near_dup"]})
        ),
        raw_edges AS (
            SELECT doc_a, doc_b FROM iexact
            UNION SELECT doc_a, doc_b FROM inear
            UNION SELECT doc_a, doc_b FROM tnd
        ),
        edges AS (
            SELECT doc_a AS a, doc_b AS b FROM raw_edges WHERE doc_a <> doc_b
            UNION
            SELECT doc_b, doc_a FROM raw_edges WHERE doc_a <> doc_b
        ),
        reach(node, lbl) AS (
            SELECT a, a FROM (SELECT DISTINCT a FROM edges)
            UNION
            SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.node
        ),
        comp AS (
            SELECT node AS doc_id, MIN(lbl) AS joint_cluster
            FROM reach GROUP BY node
        ),
        q AS (
            SELECT doc_id, quality_score
            FROM ({_LLM_ORACLE["text_quality"]})
        ),
        ranked AS (
            SELECT c.doc_id, c.joint_cluster,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.joint_cluster
                       ORDER BY q.quality_score DESC, c.doc_id
                   ) AS rn
            FROM comp c JOIN q ON c.doc_id = q.doc_id
        )
        SELECT q.doc_id, r.joint_cluster, q.quality_score,
               (r.rn IS NULL OR r.rn = 1) AS kept
        FROM q LEFT JOIN ranked r ON q.doc_id = r.doc_id
        ORDER BY q.doc_id
    """,
    # THREE recursive closures (text / image / joint) + three argmax
    # windows over the one replayed quality relation — one hash proves
    # all three retention decisions and the consistency bit
    "crossmodal_consistency_check": f"""
        WITH RECURSIVE {_bytes_cte_sql()},
        hb AS (
            SELECT ahash_hex, CAST(MIN(img_id) AS BIGINT) AS canon,
                   CAST({_band_int_sql(0)} AS INTEGER) AS b0,
                   CAST({_band_int_sql(1)} AS INTEGER) AS b1,
                   CAST({_band_int_sql(2)} AS INTEGER) AS b2,
                   CAST({_band_int_sql(3)} AS INTEGER) AS b3
            FROM ahex GROUP BY ahash_hex
        ),
        iraw AS (
            SELECT m.img_id % {VARIANT_OFFSET} AS doc_a,
                   h.canon % {VARIANT_OFFSET} AS doc_b
            FROM ahex m JOIN hb h USING (ahash_hex)
            UNION
            SELECT doc_a, doc_b FROM (
                SELECT a.canon % {VARIANT_OFFSET} AS doc_a,
                       b.canon % {VARIANT_OFFSET} AS doc_b,
                       bit_count(xor(a.b0, b.b0))
                     + bit_count(xor(a.b1, b.b1))
                     + bit_count(xor(a.b2, b.b2))
                     + bit_count(xor(a.b3, b.b3)) AS hamming
                FROM hb a JOIN hb b ON a.canon < b.canon
            ) WHERE hamming BETWEEN 1 AND {HAM_MAX}
        ),
        tnd AS (
            SELECT doc_a, doc_b
            FROM ({_LLM_ORACLE["minhash_near_dup"]})
        ),
        q AS (
            SELECT doc_id, quality_score
            FROM ({_LLM_ORACLE["text_quality"]})
        ),
        tedges AS (
            SELECT doc_a AS a, doc_b AS b FROM tnd WHERE doc_a <> doc_b
            UNION
            SELECT doc_b, doc_a FROM tnd WHERE doc_a <> doc_b
        ),
        reach_t(node, lbl) AS (
            SELECT a, a FROM (SELECT DISTINCT a FROM tedges)
            UNION
            SELECT e.b, r.lbl FROM reach_t r JOIN tedges e ON e.a = r.node
        ),
        rank_t AS (
            SELECT c.doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.c
                       ORDER BY q.quality_score DESC, c.doc_id
                   ) AS rn
            FROM (SELECT node AS doc_id, MIN(lbl) AS c
                  FROM reach_t GROUP BY node) c
            JOIN q ON c.doc_id = q.doc_id
        ),
        iedges AS (
            SELECT doc_a AS a, doc_b AS b FROM iraw WHERE doc_a <> doc_b
            UNION
            SELECT doc_b, doc_a FROM iraw WHERE doc_a <> doc_b
        ),
        reach_i(node, lbl) AS (
            SELECT a, a FROM (SELECT DISTINCT a FROM iedges)
            UNION
            SELECT e.b, r.lbl FROM reach_i r JOIN iedges e ON e.a = r.node
        ),
        rank_i AS (
            SELECT c.doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.c
                       ORDER BY q.quality_score DESC, c.doc_id
                   ) AS rn
            FROM (SELECT node AS doc_id, MIN(lbl) AS c
                  FROM reach_i GROUP BY node) c
            JOIN q ON c.doc_id = q.doc_id
        ),
        jedges AS (
            SELECT a, b FROM tedges UNION SELECT a, b FROM iedges
        ),
        reach_j(node, lbl) AS (
            SELECT a, a FROM (SELECT DISTINCT a FROM jedges)
            UNION
            SELECT e.b, r.lbl FROM reach_j r JOIN jedges e ON e.a = r.node
        ),
        rank_j AS (
            SELECT c.doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.c
                       ORDER BY q.quality_score DESC, c.doc_id
                   ) AS rn
            FROM (SELECT node AS doc_id, MIN(lbl) AS c
                  FROM reach_j GROUP BY node) c
            JOIN q ON c.doc_id = q.doc_id
        )
        SELECT q.doc_id,
               (rt.rn IS NULL OR rt.rn = 1) AS text_kept,
               (ri.rn IS NULL OR ri.rn = 1) AS image_kept,
               (rj.rn IS NULL OR rj.rn = 1) AS joint_kept,
               ((rt.rn IS NULL OR rt.rn = 1)
                  = (ri.rn IS NULL OR ri.rn = 1)) AS consistent
        FROM q
        LEFT JOIN rank_t rt ON q.doc_id = rt.doc_id
        LEFT JOIN rank_i ri ON q.doc_id = ri.doc_id
        LEFT JOIN rank_j rj ON q.doc_id = rj.doc_id
        ORDER BY q.doc_id
    """,
}
