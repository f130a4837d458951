"""Audio-grain curation operators (r14): the third modality gets the
same treatment as text and images — an INTEGER-EXACT energy-contour
fingerprint (the Haitsma–Kalker acoustic-fingerprint shape reduced to
its exactly-checkable core) and the banded near-dup join over it.

The corpus is the shared deterministic synthetic payload
(plans/images._image_corpus — 256 opaque bytes per clip, here read as
256 unsigned 8-bit PCM samples: 16 frames × 4 sub-windows × 4 samples),
with the same perturbed variants standing in for transient clicks /
re-encodes. Real sample DECODE stays env-gated behind
operators/multimodal.decode_media exactly as for images; every operator
here consumes raw decoded samples — the post-decode contract.

Exactness: cell energy = Σ (s − 128)² over a 4-sample sub-window — an
integer; fingerprint bit = cell_energy × 64 > clip_total (the aHash
comparison applied to the energy grid instead of the byte grid), so the
Arrow kernel and the relational DuckDB replay agree bit-for-bit and the
near-dup oracle is again the NAIVE all-pairs hamming join that proves
the 4×16-bit banding complete for radius ≤ HAM_MAX (pigeonhole; see
plans/images.py).

Scale: identical to the image family — one Arrow scan to a ~30-byte row
per clip, pair work at DISTINCT-fingerprint grain after the exact-dup
pre-collapse, band skew AQE-splittable.

Reference scope note: the reference pipeline
(``/root/reference/data/etl.py``) has no multimodal surface; this
extends SURVEY.md §2.11's north-star scope alongside plans/images.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from .images import (
    _BYTES_CTE,
    _HEXD,
    EVAL_MOD,
    HAM_MAX,
    VARIANT_OFFSET,
    _band_int_sql,
    _banded_cross_split_decon,
    _banded_near_dup,
    _bytes_cte_sql,
    _even_odd_fold,
    _image_corpus,
    _image_corpus_full,
)

EFP_SCHEMA = StructType(
    [
        StructField("clip_id", LongType()),
        StructField("ehash_hex", StringType()),
    ]
)


def energy_fingerprint_kernel(payloads: list, perturb_blocks: list) -> list:
    """64-bit energy-contour fingerprints for a batch of 256-sample u8
    PCM clips: cell (frame f, sub-window w) energy = Σ (s−128)² over its
    4 samples; bit = energy×64 > clip total (strict, integer). Returns
    16-char hex strings. Plain function so tests drive it directly."""
    import numpy as np

    grids = np.stack(
        [np.frombuffer(p, dtype=np.uint8) for p in payloads]
    ).astype(np.int64)
    for i, pb in enumerate(perturb_blocks):
        if pb is not None and not pd.isna(pb):
            pb = int(pb)
            p0 = 32 * (pb // 8) + 2 * (pb % 8)
            grids[i, [p0, p0 + 1, p0 + 16, p0 + 17]] = 255
    n = grids.shape[0]
    sq = (grids - 128) ** 2
    cells = sq.reshape(n, 64, 4).sum(axis=2)  # cell = (pos//16)*4+(pos%16)//4
    totals = cells.sum(axis=1)
    bits = (cells * 64) > totals[:, None]
    packed = np.packbits(bits, axis=1)
    return [row.tobytes().hex() for row in packed]


def _efingerprints(corpus: DataFrame) -> DataFrame:
    """One Arrow pass: samples → energy-contour hex. Zero shuffle."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    "clip_id": pdf["img_id"].values,
                    "ehash_hex": energy_fingerprint_kernel(
                        list(pdf["payload"]), list(pdf["perturb_block"])
                    ),
                }
            )

    return corpus.mapInPandas(_extract, EFP_SCHEMA)


def audio_energy_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact energy-contour fingerprints over the
    variant-augmented clip corpus — the audio twin of
    image_fingerprints."""
    return _efingerprints(_image_corpus(spark, sf_dir))


def audio_near_dup_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded acoustic near-dup join (distinct-fingerprint grain, 4×16-bit
    bands, exact hamming verify, complete for radius ≤ HAM_MAX); the
    naive all-pairs oracle proves blocking completeness every run."""
    fp = _efingerprints(_image_corpus(spark, sf_dir)).select(
        F.col("clip_id").alias("img_id"),
        F.col("ehash_hex").alias("ahash_hex"),
    )
    return _banded_near_dup(fp).select(
        F.col("doc_a").alias("clip_a"),
        F.col("doc_b").alias("clip_b"),
        "hamming",
    )


def audio_decontamination_energy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-split acoustic decontamination (r15 — closes the modality
    asymmetry named in VERDICT r14): training clips whose energy-contour
    fingerprint sits within hamming ≤ HAM_MAX of an EVAL clip's — the
    re-encoded/transient-clicked eval leakage exact payload hashes miss.
    Same id-based split and banded cross-split join as
    image_decontamination_perceptual (the shared
    `_banded_cross_split_decon` core at energy-hash grain), over the
    FULL corpus (variants + re-uploads): DUP_OFFSET ≡ 1 mod EVAL_MOD
    flips every re-upload across the split, so exact (hamming 0)
    cross-split leaks exist by construction at every SF, and perturbed
    variants supply the near-miss radii. Oracle: the naive cross-split
    all-pairs hamming join — proves the banding complete and the verify
    exact. Returns (clip_id, eval_clip_id, hamming) at canonical
    grain."""
    fp = _efingerprints(_image_corpus_full(spark, sf_dir)).select(
        F.col("clip_id").alias("img_id"),
        F.col("ehash_hex").alias("ahash_hex"),
    )
    return _banded_cross_split_decon(fp).select(
        F.col("img_id").alias("clip_id"),
        F.col("eval_img_id").alias("eval_clip_id"),
        "hamming",
    )


def incremental_audio_dedup_fold(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Append-only acoustic-dedup fold (r15): split the full corpus into
    two deterministic batches (even/odd clip_id), build the
    ENERGY-HASH-grain dedup state from batch 1, fold batch 2 through the
    full-outer delta merge (`images._even_odd_fold` — the
    incremental_exact_dedup shape at fingerprint grain; re-uploads
    guarantee real dup families). The oracle is the batch-free recompute
    (one GROUP BY over the whole corpus), so a green row proves
    fold ≡ recompute. Returns (clip_id, ehash_hex, dup_count) at
    distinct-fingerprint grain — the state an ingest pipeline would
    persist bucketed on ehash_hex."""
    fp = _efingerprints(_image_corpus_full(spark, sf_dir))
    return _even_odd_fold(fp, "clip_id", "ehash_hex")


#: energy-grid CTE chain appended to the shared byte chain — cell
#: (pos//16)*4 + (pos%16)//4, energy Σ(b−128)², aHash-style strict bits
_EHEX_CTE = f"""
ecells AS (
    SELECT img_id, (pos//16)*4 + (pos%16)//4 AS cell,
           SUM((b-128)*(b-128)) AS e
    FROM bytes GROUP BY 1, 2
),
etot AS (SELECT img_id, SUM(e) AS te FROM ecells GROUP BY 1),
ebits AS (
    SELECT c.img_id, c.cell,
           CASE WHEN c.e*64 > t.te THEN 1 ELSE 0 END AS bit
    FROM ecells c JOIN etot t USING (img_id)
),
ehex AS (
    SELECT img_id,
           string_agg(substring('{_HEXD}', CAST(v + 1 AS INTEGER), 1), ''
                      ORDER BY n) AS ehash_hex
    FROM (
        SELECT img_id, cell // 4 AS n,
               SUM(bit * CASE cell % 4 WHEN 0 THEN 8 WHEN 1 THEN 4
                                       WHEN 2 THEN 2 ELSE 1 END) AS v
        FROM ebits GROUP BY img_id, cell // 4
    ) GROUP BY img_id
)
"""

LIBRARY_QUERIES = {
    "audio_energy_fingerprints": audio_energy_fingerprints,
    "audio_near_dup_energy": audio_near_dup_energy,
    "audio_decontamination_energy": audio_decontamination_energy,
    "incremental_audio_dedup_fold": incremental_audio_dedup_fold,
}

LIBRARY_ORACLE = {
    "audio_energy_fingerprints": f"""
        WITH {_BYTES_CTE}, {_EHEX_CTE}
        SELECT img_id AS clip_id, ehash_hex FROM ehex
    """,
    "audio_near_dup_energy": f"""
        WITH {_BYTES_CTE}, {_EHEX_CTE},
        hb AS (
            SELECT CAST(MIN(img_id) AS BIGINT) AS canon,
                   CAST({_band_int_sql(0, "ehash_hex")} AS INTEGER) AS b0,
                   CAST({_band_int_sql(1, "ehash_hex")} AS INTEGER) AS b1,
                   CAST({_band_int_sql(2, "ehash_hex")} AS INTEGER) AS b2,
                   CAST({_band_int_sql(3, "ehash_hex")} AS INTEGER) AS b3
            FROM ehex GROUP BY ehash_hex
        ),
        pairs AS (
            SELECT a.canon AS clip_a, b.canon AS clip_b,
                   CAST(bit_count(xor(a.b0, b.b0))
                      + bit_count(xor(a.b1, b.b1))
                      + bit_count(xor(a.b2, b.b2))
                      + bit_count(xor(a.b3, b.b3)) AS INTEGER) AS hamming
            FROM hb a JOIN hb b ON a.canon < b.canon
        )
        SELECT clip_a, clip_b, hamming FROM pairs
        WHERE hamming BETWEEN 1 AND {HAM_MAX}
    """,
    # naive cross-split all-pairs hamming join over the FULL corpus —
    # proves the banded candidate generation complete + verify exact
    "audio_decontamination_energy": f"""
        WITH {_bytes_cte_sql(reups=True)}, {_EHEX_CTE},
        sided AS (
            SELECT img_id, ehash_hex,
                   CASE WHEN (img_id % {VARIANT_OFFSET}) % {EVAL_MOD} = 0
                        THEN 'eval' ELSE 'train' END AS side
            FROM ehex
        ),
        hb AS (
            SELECT side, CAST(MIN(img_id) AS BIGINT) AS canon,
                   CAST({_band_int_sql(0, "ehash_hex")} AS INTEGER) AS b0,
                   CAST({_band_int_sql(1, "ehash_hex")} AS INTEGER) AS b1,
                   CAST({_band_int_sql(2, "ehash_hex")} AS INTEGER) AS b2,
                   CAST({_band_int_sql(3, "ehash_hex")} AS INTEGER) AS b3
            FROM sided GROUP BY side, ehash_hex
        ),
        pairs AS (
            SELECT a.canon AS clip_id, b.canon AS eval_clip_id,
                   CAST(bit_count(xor(a.b0, b.b0))
                      + bit_count(xor(a.b1, b.b1))
                      + bit_count(xor(a.b2, b.b2))
                      + bit_count(xor(a.b3, b.b3)) AS INTEGER) AS hamming
            FROM hb a JOIN hb b
              ON a.side = 'train' AND b.side = 'eval'
        )
        SELECT clip_id, eval_clip_id, hamming FROM pairs
        WHERE hamming <= {HAM_MAX}
    """,
    # batch-free recompute: a green row proves fold ≡ recompute
    "incremental_audio_dedup_fold": f"""
        WITH {_bytes_cte_sql(reups=True)}, {_EHEX_CTE}
        SELECT MIN(img_id) AS clip_id, ehash_hex,
               CAST(COUNT(*) AS BIGINT) AS dup_count
        FROM ehex GROUP BY ehash_hex
    """,
}
