"""Gates for the audio-grain operators (plans/audio.py). Oracle parity
runs in tests/test_library_parity.py; these pin the kernel invariants
and the banding completeness the oracle proves only at registry SFs."""

from __future__ import annotations

import numpy as np

from sales_etl_pipeline_spark.plans import audio
from sales_etl_pipeline_spark.plans.audio import energy_fingerprint_kernel
from sales_etl_pipeline_spark.plans.images import HAM_MAX


def _clip(vals) -> bytes:
    return bytes(np.asarray(vals, dtype=np.uint8).reshape(256))


def _hex_to_bits(h: str) -> np.ndarray:
    return np.unpackbits(np.frombuffer(bytes.fromhex(h), dtype=np.uint8))


def _ham(a: str, b: str) -> int:
    return int((_hex_to_bits(a) != _hex_to_bits(b)).sum())


def test_silence_and_constant_clips_are_all_zero():
    """Digital silence (128 = u8 zero-crossing) has zero energy
    everywhere; ANY constant clip has equal cell energies, and the
    strict comparison admits no winner — all-zero fingerprint."""
    for v in (128, 0, 200):
        (h,) = energy_fingerprint_kernel([_clip(np.full(256, v))], [None])
        assert h == "0" * 16


def test_single_click_sets_exactly_its_cell():
    """One loud transient inside one 4-sample sub-window flips exactly
    that cell's bit on an otherwise-silent clip."""
    base = np.full(256, 128)
    base[100:104] = 255  # pos 100..103 → cell (100//16)*4 + (100%16)//4 = 25
    (h,) = energy_fingerprint_kernel([_clip(base)], [None])
    bits = _hex_to_bits(h)
    assert bits[25] == 1 and bits.sum() == 1


def test_polarity_invariance():
    """Energy is (s−128)² — sign-symmetric around the zero-crossing, so
    a polarity-inverted clip (reflect around 128) fingerprints
    identically (the u8 reflection of x is 256−x, clipped at 255 for
    x=0 — avoid 0 in the fixture)."""
    rng = np.random.RandomState(3)
    base = rng.randint(1, 256, size=256)
    (h0,) = energy_fingerprint_kernel([_clip(base)], [None])
    (h1,) = energy_fingerprint_kernel([_clip(256 - base)], [None])
    assert h0 == h1


def test_banded_near_dup_complete_vs_brute_force(spark, sf_dir):
    """audio_near_dup_energy ≡ the brute-force all-pairs sweep at
    distinct-fingerprint canonical grain (pigeonhole completeness,
    checked empirically on the sf0.001 corpus)."""
    fp = audio.audio_energy_fingerprints(spark, sf_dir).collect()
    spark.catalog.clearCache()
    canon: dict[str, int] = {}
    for r in fp:
        canon[r.ehash_hex] = min(canon.get(r.ehash_hex, r.clip_id), r.clip_id)
    items = list(canon.items())
    expected = set()
    for i in range(len(items)):
        for j in range(i + 1, len(items)):
            h = _ham(items[i][0], items[j][0])
            if 1 <= h <= HAM_MAX:
                a, b = sorted((items[i][1], items[j][1]))
                expected.add((a, b, h))
    got = {
        (r.clip_a, r.clip_b, r.hamming)
        for r in audio.audio_near_dup_energy(spark, sf_dir).collect()
    }
    spark.catalog.clearCache()
    assert got == expected and expected


def test_decontamination_cross_split_nonvacuous_and_correct(spark, sf_dir):
    """The r15 decon twin: every reported pair genuinely crosses the
    split, hamming-0 leaks exist by construction (re-uploads flip
    across: DUP_OFFSET ≡ 1 mod EVAL_MOD), and near-miss radii 1..3
    appear too (perturbed variants) — the result is never vacuously
    empty or exact-only."""
    from sales_etl_pipeline_spark.plans.images import EVAL_MOD, VARIANT_OFFSET

    rows = audio.audio_decontamination_energy(spark, sf_dir).collect()
    spark.catalog.clearCache()
    assert rows
    for r in rows:
        assert (r.clip_id % VARIANT_OFFSET) % EVAL_MOD != 0, "train side"
        assert (r.eval_clip_id % VARIANT_OFFSET) % EVAL_MOD == 0, "eval side"
        assert 0 <= r.hamming <= HAM_MAX
    assert any(r.hamming == 0 for r in rows), "no exact leaks — vacuous"


def test_incremental_fold_equals_recompute_and_has_dups(spark, sf_dir):
    """Fold ≡ batch-free recompute at energy-hash grain (the oracle
    proves this at registry SFs; this pins it in-suite) and the
    re-uploads guarantee real dup families (dup_count > 1)."""
    from pyspark.sql import functions as F
    from sales_etl_pipeline_spark.plans.images import _image_corpus_full

    folded = {
        (r.ehash_hex): (r.clip_id, r.dup_count)
        for r in audio.incremental_audio_dedup_fold(spark, sf_dir).collect()
    }
    recomputed = {
        r.ehash_hex: (r.clip_id, r.dup_count)
        for r in audio._efingerprints(_image_corpus_full(spark, sf_dir))
        .groupBy("ehash_hex")
        .agg(
            F.min("clip_id").alias("clip_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .collect()
    }
    spark.catalog.clearCache()
    assert folded == recomputed
    assert any(c > 1 for _, c in folded.values()), "no dup families"
