"""Synthesize a deterministic RICH-VOCABULARY documents corpus for
large-merge-count BPE training measurement.

The driver's synthetic documents tables are vocabulary-poor (~31 distinct
lowercase words at sf0.1), which caps learnable BPE merges at ~90 — far
below a realistic tokenizer vocabulary. This script builds a corpus with
a multi-thousand-word vocabulary (syllable-composed words under a Zipf
frequency law, seeded LCG — bit-reproducible across hosts) so the batched
training path (`train_bpe(batch_size=m)`) can be measured at 1k+ merges.

Usage: python scripts/make_richvocab.py [n_docs] [out_dir]
Defaults: 4000 docs x ~120 words -> /tmp/sfrich/documents.parquet
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sales_etl_pipeline_spark.session import get_spark

ONSETS = ["b", "d", "f", "g", "k", "l", "m", "n", "p", "r", "s", "t", "v", "z",
          "br", "dr", "st", "tr", "pl", "kr"]
VOWELS = ["a", "e", "i", "o", "u", "ai", "ea", "ou"]
CODAS = ["", "", "n", "r", "s", "t", "l", "nd", "st"]


class _LCG:
    """Deterministic 64-bit LCG (Knuth MMIX constants) — host-independent."""

    def __init__(self, seed: int) -> None:
        self.state = seed & 0xFFFFFFFFFFFFFFFF

    def next(self, bound: int) -> int:
        self.state = (self.state * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        return (self.state >> 17) % bound


def build_vocab(n_words: int, rng: _LCG) -> list[str]:
    seen: set[str] = set()
    vocab: list[str] = []
    while len(vocab) < n_words:
        n_syll = 1 + rng.next(4)
        w = "".join(
            ONSETS[rng.next(len(ONSETS))]
            + VOWELS[rng.next(len(VOWELS))]
            + CODAS[rng.next(len(CODAS))]
            for _ in range(n_syll)
        )
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    return vocab


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfrich"
    rng = _LCG(0x5EED_B0E5)
    vocab = build_vocab(8000, rng)
    # Zipf-ish sampling: word rank r chosen via inverse-square-law table
    # (precomputed cumulative bucket ids keep the LCG the only entropy).
    buckets: list[int] = []
    for rank in range(len(vocab)):
        reps = max(1, int(2000 / (rank + 1)))
        buckets.extend([rank] * reps)

    rows = []
    for doc_id in range(1, n_docs + 1):
        n_words = 80 + rng.next(80)
        words = [vocab[buckets[rng.next(len(buckets))]] for _ in range(n_words)]
        rows.append((doc_id, " ".join(words)))

    spark = get_spark(app_name="make-richvocab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.createDataFrame(rows, "doc_id long, text string").repartition(
        8
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    n_distinct = len({w for _, t in rows for w in t.split()})
    print(f"wrote {n_docs} docs, {n_distinct} distinct words -> {out}")


if __name__ == "__main__":
    main()
