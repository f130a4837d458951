"""Video-grain curation operators (r14): the last of the three media
modalities — per-FRAME integer-exact fingerprints and the shot-aligned
near-dup join (clips sharing ≥ FRAME_VOTE_K identical frame
fingerprints at the same frame index — the frame-voting heuristic of
video dedup pipelines).

The shared synthetic payload (plans/images._image_corpus) is read as a
FRAME CONTAINER exactly like operators/multimodal.frame_sample: 8
frames × 32 bytes. Per frame: 16 chunks × 2 bytes, chunk sum (integer),
fingerprint bit = chunk_sum × 16 > frame_total — the aHash comparison
at frame grain, 16 bits → 4 hex chars. The perturbed variants (one 2×2
image block → 255) touch at most 2 of the 8 frames, so a variant
shares ≥ 6 exact frame fingerprints with its original — real near-dup
pairs at every SF.

Unlike the image/audio BANDED joins (approximate candidate generation
proven complete by a naive all-pairs oracle), the frame-vote join is
DECLARATIVE end to end — an equi-join on (frame_idx, fhash) plus a
pair-grain count — so the oracle replays the production plan shape
directly; no completeness argument is needed.

Exactness + purity: the whole fingerprint is column expressions
(ascii/substr byte reads, higher-order transform/aggregate integer
sums) — zero Python, whole-stage-codegen'd; the variant perturbation is
the same positional CASE the byte-grain oracles replay.

Scale: one projection pass to 8 skinny rows per clip; exact-dup clip
families collapse to a canonical per full 8-frame SIGNATURE before the
pair join (the image-family pre-collapse), so replicated corpora don't
produce m² pairs per family; the join key (frame_idx, 16-bit fhash)
spreads the rest.

Reference scope note: the reference pipeline has no multimodal surface;
this completes SURVEY.md §2.11's north-star scope with plans/images.py
and plans/audio.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .images import (
    _BYTES_CTE,
    _HEXD,
    EVAL_MOD,
    VARIANT_OFFSET,
    _bytes_cte_sql,
    _even_odd_fold,
    _image_corpus,
    _image_corpus_full,
    _split_side,
)

#: bytes per frame (same stride as operators/multimodal.frame_sample's
#: FRAME_BYTES; 256-byte payloads → 8 frames)
FRAME_BYTES = 32
#: minimum identical (frame_idx, fingerprint) matches for a near-dup
#: pair (of 8 frames; the ≤2-frame variant perturbation stays inside)
FRAME_VOTE_K = 6


def video_frame_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(clip_id, frame_idx, fhash_hex) — 16-bit per-frame fingerprints
    as pure column expressions over the variant-augmented corpus."""
    return _frame_fingerprints(_image_corpus(spark, sf_dir))


def _frame_fingerprints(corpus_df: DataFrame) -> DataFrame:
    """The fingerprint expression pipeline over any (img_id, payload,
    perturb_block) corpus — shared by the base plan, the cross-split
    decontamination twin and the incremental fold."""
    corpus = corpus_df.select(
        F.col("img_id").alias("clip_id"),
        F.col("payload").cast("string").alias("s"),
        F.col("perturb_block").alias("pb"),
    )
    # Input-skew note (r16 → r17): the 8-frame explode below fans every
    # clip into 16 interpreted chunk expressions per frame — the
    # heaviest per-row work in the module — so an under-split source
    # would run it near single-core. The spread now lives in the corpus
    # builders (images._spread_corpus, applied post-union in
    # _image_corpus/_image_corpus_full), which every BATCH caller of
    # this kernel goes through; the r16 in-kernel guard was removed
    # because its .rdd partition probe cost a physical-plan build per
    # query on top of the builders' own (measured ~0.2 s per video row)
    # and it broke the STREAMING twin (.rdd raises on a streaming
    # DataFrame — micro-batches are small and need no spread).
    pb = F.col("pb")
    p0 = (32 * F.floor(pb / 8) + 2 * (pb % 8)).cast("int")

    def byte_at(i):
        """Byte value at 0-based position ``i`` (Column), with the
        variant CASE (positions p0, p0+1, p0+16, p0+17 read 255)."""
        raw = F.ascii(F.col("s").substr(i + F.lit(1), F.lit(1)))
        hit = pb.isNotNull() & (
            (i == p0) | (i == p0 + 1) | (i == p0 + 16) | (i == p0 + 17)
        )
        return F.when(hit, F.lit(255)).otherwise(raw)

    fidx = F.col("frame_idx")
    chunks = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda c: byte_at(32 * fidx + 2 * c) + byte_at(32 * fidx + 2 * c + 1),
    )
    per_frame = corpus.select(
        "clip_id",
        "s",
        "pb",
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("frame_idx"),
    ).withColumn("chunks", chunks)
    ftot = F.aggregate(F.col("chunks"), F.lit(0), lambda a, x: a + x)
    bits = F.transform(
        F.col("chunks"), lambda x: (x * 16 > F.col("ftot")).cast("int")
    )
    with_bits = per_frame.withColumn("ftot", ftot).withColumn("bits", bits)

    def nib(n: int):
        return (
            8 * F.element_at("bits", 4 * n + 1)
            + 4 * F.element_at("bits", 4 * n + 2)
            + 2 * F.element_at("bits", 4 * n + 3)
            + F.element_at("bits", 4 * n + 4)
        )

    fhash = F.concat(
        *[
            F.lit(_HEXD).substr(nib(n) + F.lit(1), F.lit(1))
            for n in range(4)
        ]
    )
    return with_bits.select(
        "clip_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        fhash.alias("fhash_hex"),
    )


def video_near_dup_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-aligned near-dup pairs: canonical clips (one per full
    8-frame signature — the exact-dup pre-collapse) sharing ≥
    FRAME_VOTE_K identical frame fingerprints at the same index.
    Returns (clip_a, clip_b, n_matching_frames), 1 ≤ matches < 8 rows
    excluded only by the vote threshold (identical signatures collapsed
    away, so 8/8 pairs don't exist at canonical grain)."""
    from .llmdata import _pin

    fp = _pin(video_frame_fingerprints(spark, sf_dir))
    canon = _clip_sigs(fp).groupBy("sig").agg(
        F.min("clip_id").alias("clip_id")
    )
    cf = _pin(fp.join(canon.select("clip_id"), "clip_id"))
    a, b = cf.alias("a"), cf.alias("b")
    matched = a.join(
        b,
        (F.col("a.frame_idx") == F.col("b.frame_idx"))
        & (F.col("a.fhash_hex") == F.col("b.fhash_hex"))
        & (F.col("a.clip_id") < F.col("b.clip_id")),
    ).select(
        F.col("a.clip_id").alias("clip_a"),
        F.col("b.clip_id").alias("clip_b"),
    )
    return (
        matched.groupBy("clip_a", "clip_b")
        .agg(F.count(F.lit(1)).cast("int").alias("n_matching_frames"))
        .where(F.col("n_matching_frames") >= FRAME_VOTE_K)
    )


def _clip_sigs(fp: DataFrame) -> DataFrame:
    """(clip_id, sig) — the frame-order-sorted concatenation of a clip's
    8 frame fingerprints (32 hex chars): the clip's EXACT-dup key."""
    return fp.groupBy("clip_id").agg(
        F.concat_ws(
            "",
            F.array_sort(
                F.collect_list(F.struct("frame_idx", "fhash_hex"))
            ).getField("fhash_hex"),
        ).alias("sig")
    )


def video_decontamination_frames(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-split video decontamination (r15 — closes the modality
    asymmetry named in VERDICT r14): training clips sharing ≥
    FRAME_VOTE_K identical frame fingerprints AT THE SAME FRAME INDEX
    with an eval clip — the shot-aligned frame-vote test applied across
    the id-based eval/train split, over the FULL corpus (variants +
    re-uploads). Leak flavors by construction: a re-upload of an eval
    clip lands on the training side (DUP_OFFSET ≡ 1 mod EVAL_MOD) with
    8/8 matching frames, and an eval clip's perturbed variant (same
    side as its original) matches that training-side re-upload in ≥ 6
    of 8 frames — the re-encoded leak this operator exists to catch.
    Canonical grain per (side, full signature) so replicated leaks
    report once; DECLARATIVE end to end (equi-join + pair count — the
    video_near_dup_frames shape), so the oracle replays the plan
    directly. Returns (clip_id, eval_clip_id, n_matching_frames)."""
    from .llmdata import _pin

    fp = _pin(_frame_fingerprints(_image_corpus_full(spark, sf_dir)))
    sided = _clip_sigs(fp).withColumn("side", _split_side("clip_id"))
    canon = sided.groupBy("side", "sig").agg(
        F.min("clip_id").alias("clip_id")
    )
    cf = _pin(fp.join(canon.select("clip_id", "side"), "clip_id"))
    t = cf.where(F.col("side") == "train").alias("t")
    e = cf.where(F.col("side") == "eval").alias("e")
    matched = t.join(
        e,
        (F.col("t.frame_idx") == F.col("e.frame_idx"))
        & (F.col("t.fhash_hex") == F.col("e.fhash_hex")),
    ).select(
        F.col("t.clip_id").alias("clip_id"),
        F.col("e.clip_id").alias("eval_clip_id"),
    )
    return (
        matched.groupBy("clip_id", "eval_clip_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_matching_frames"))
        .where(F.col("n_matching_frames") >= FRAME_VOTE_K)
    )


def incremental_video_dedup_fold(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Append-only video-dedup fold (r15): even/odd clip_id batches
    folded through the full-outer delta merge at FRAME-SIGNATURE grain
    (`images._even_odd_fold`; re-uploads guarantee real dup families).
    Oracle = batch-free recompute, so a green row proves
    fold ≡ recompute. Returns (clip_id, sig, dup_count) at
    distinct-signature grain."""
    sigs = _clip_sigs(
        _frame_fingerprints(_image_corpus_full(spark, sf_dir))
    )
    return _even_odd_fold(sigs, "clip_id", "sig")


#: frame-grain fingerprint CTE chain over the shared byte chain
_FHEX_CTE = f"""
fchunks AS (
    SELECT img_id, pos//32 AS frame_idx, (pos%32)//2 AS chunk,
           SUM(b) AS csum
    FROM bytes GROUP BY 1, 2, 3
),
fft AS (
    SELECT img_id, frame_idx, SUM(csum) AS ft
    FROM fchunks GROUP BY 1, 2
),
fbits AS (
    SELECT c.img_id, c.frame_idx, c.chunk,
           CASE WHEN c.csum*16 > t.ft THEN 1 ELSE 0 END AS bit
    FROM fchunks c JOIN fft t USING (img_id, frame_idx)
),
fhex AS (
    SELECT img_id, frame_idx,
           string_agg(substring('{_HEXD}', CAST(v + 1 AS INTEGER), 1), ''
                      ORDER BY n) AS fhash_hex
    FROM (
        SELECT img_id, frame_idx, chunk // 4 AS n,
               SUM(bit * CASE chunk % 4 WHEN 0 THEN 8 WHEN 1 THEN 4
                                        WHEN 2 THEN 2 ELSE 1 END) AS v
        FROM fbits GROUP BY img_id, frame_idx, chunk // 4
    ) GROUP BY img_id, frame_idx
)
"""

LIBRARY_QUERIES = {
    "video_frame_fingerprints": video_frame_fingerprints,
    "video_near_dup_frames": video_near_dup_frames,
    "video_decontamination_frames": video_decontamination_frames,
    "incremental_video_dedup_fold": incremental_video_dedup_fold,
}

LIBRARY_ORACLE = {
    "video_frame_fingerprints": f"""
        WITH {_BYTES_CTE}, {_FHEX_CTE}
        SELECT img_id AS clip_id, CAST(frame_idx AS INTEGER) AS frame_idx,
               fhash_hex
        FROM fhex
    """,
    "video_near_dup_frames": f"""
        WITH {_BYTES_CTE}, {_FHEX_CTE},
        sigs AS (
            SELECT img_id,
                   string_agg(fhash_hex, '' ORDER BY frame_idx) AS sig
            FROM fhex GROUP BY img_id
        ),
        canon AS (SELECT MIN(img_id) AS img_id FROM sigs GROUP BY sig),
        cf AS (SELECT f.* FROM fhex f JOIN canon USING (img_id))
        SELECT a.img_id AS clip_a, b.img_id AS clip_b,
               CAST(COUNT(*) AS INTEGER) AS n_matching_frames
        FROM cf a JOIN cf b
          ON a.frame_idx = b.frame_idx AND a.fhash_hex = b.fhash_hex
         AND a.img_id < b.img_id
        GROUP BY 1, 2
        HAVING COUNT(*) >= {FRAME_VOTE_K}
    """,
    # declarative cross-split replay over the FULL corpus — side from
    # the same id arithmetic, canonical per (side, signature)
    "video_decontamination_frames": f"""
        WITH {_bytes_cte_sql(reups=True)}, {_FHEX_CTE},
        sided_sigs AS (
            SELECT img_id,
                   string_agg(fhash_hex, '' ORDER BY frame_idx) AS sig,
                   CASE WHEN (img_id % {VARIANT_OFFSET}) % {EVAL_MOD} = 0
                        THEN 'eval' ELSE 'train' END AS side
            FROM fhex GROUP BY img_id
        ),
        canon AS (
            SELECT side, MIN(img_id) AS img_id
            FROM sided_sigs GROUP BY side, sig
        ),
        cf AS (
            SELECT f.*, c.side FROM fhex f JOIN canon c USING (img_id)
        )
        SELECT t.img_id AS clip_id, e.img_id AS eval_clip_id,
               CAST(COUNT(*) AS INTEGER) AS n_matching_frames
        FROM cf t JOIN cf e
          ON t.frame_idx = e.frame_idx AND t.fhash_hex = e.fhash_hex
         AND t.side = 'train' AND e.side = 'eval'
        GROUP BY 1, 2
        HAVING COUNT(*) >= {FRAME_VOTE_K}
    """,
    # batch-free recompute: a green row proves fold ≡ recompute
    "incremental_video_dedup_fold": f"""
        WITH {_bytes_cte_sql(reups=True)}, {_FHEX_CTE},
        sigs AS (
            SELECT img_id,
                   string_agg(fhash_hex, '' ORDER BY frame_idx) AS sig
            FROM fhex GROUP BY img_id
        )
        SELECT MIN(img_id) AS clip_id, sig,
               CAST(COUNT(*) AS BIGINT) AS dup_count
        FROM sigs GROUP BY sig
    """,
}
