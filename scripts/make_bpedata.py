"""Synthesize a HIGH-ENTROPY corpus for the 1k-merge BPE bench row.

The driver's synthetic documents tables draw from a small fixed word pool:
training exhausts mergeable pairs after ~89 merges at every sf (measured
r11), so the batched trainer's scalable-vocab claim (plans/bpe.py
``batch_size``) could never carry a measured 1000-merge number on them.
This corpus has a Zipf-weighted vocabulary of random ``[a-z]+`` words over
the full alphabet — tens of thousands of distinct words, flat-ish adjacent
pair distribution (good disjoint-prefix admission for the batched
trainer), total merge capacity = Σ(len(word)-1) over the distinct vocab
(~150k), far past any merge count we bench.

Deterministic (fixed numpy seed) + version marker, importable
(``ensure_bpe_corpus``) so pytest and bench share one corpus — the same
recipe as scripts/make_skewdata.py.

Usage: python scripts/make_bpedata.py [out_dir]
"""

from __future__ import annotations

import os
import string
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

#: bump when the recipe changes — stale corpora regenerate automatically
VERSION = "bpe-v2-multifile"

#: part-file count for the documents table. One 2.8 MB single-row-group
#: file caps the trainers' corpus scan at ONE task (parquet splits are
#: byte ranges, and files under the 4 MB open-cost floor never split),
#: so the init word-count pass ran single-core at any cluster size
#: (guide §2.5 input skew / §6 small-file splits). 16 part files give
#: the scan 16 tasks with no per-plan repartition. ROW CONTENT is
#: unchanged (same seed, same generation order, sliced contiguously) —
#: word counts, the training fingerprint (count, max id, total chars)
#: and therefore every merge list are identical to the single-file
#: corpus.
N_FILES = 16

SEED = 20260815
VOCAB = 24000
DOCS = 4000
WORDS_PER_DOC = (60, 180)
WORD_LEN = (3, 12)
N_SOURCES = 4


def _make_vocab(rng: np.random.Generator) -> list[str]:
    letters = np.array(list(string.ascii_lowercase))
    # mildly non-uniform letter distribution: frequent letters create the
    # high-count pair head a real corpus has, while the full alphabet
    # keeps the distinct-pair space large
    w = np.array([1.0 / (1 + 0.15 * i) for i in range(26)])
    w /= w.sum()
    seen: set[str] = set()
    out: list[str] = []
    while len(out) < VOCAB:
        n = int(rng.integers(WORD_LEN[0], WORD_LEN[1] + 1))
        word = "".join(rng.choice(letters, size=n, p=w))
        if word not in seen:
            seen.add(word)
            out.append(word)
    return out


def _make_documents(rng: np.random.Generator):
    vocab = _make_vocab(rng)
    # Zipf word frequencies: a head the merge ranking can act on
    freq = np.array([1.0 / (r + 1) ** 0.9 for r in range(VOCAB)])
    freq /= freq.sum()
    doc_ids, texts, langs, sources = [], [], [], []
    for did in range(DOCS):
        n = int(rng.integers(WORDS_PER_DOC[0], WORDS_PER_DOC[1] + 1))
        idx = rng.choice(VOCAB, size=n, p=freq)
        texts.append(" ".join(vocab[i] for i in idx))
        doc_ids.append(did)
        langs.append("en")
        sources.append(f"src{int(rng.integers(0, N_SOURCES))}")
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def ensure_bpe_corpus(out_dir: str) -> str:
    """Write the corpus to ``out_dir`` if absent or stale; idempotent and
    cheap on the hit path (one marker read)."""
    marker = os.path.join(out_dir, "_BPE_VERSION")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == VERSION:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)
    table = _make_documents(rng)
    # documents.parquet is a DIRECTORY of N_FILES parts (Spark reads it
    # identically); a stale single-FILE corpus is replaced
    dest = os.path.join(out_dir, "documents.parquet")
    if os.path.isfile(dest):
        os.remove(dest)
    os.makedirs(dest, exist_ok=True)
    step = (table.num_rows + N_FILES - 1) // N_FILES
    for i in range(N_FILES):
        part = table.slice(i * step, step)
        if part.num_rows:
            pq.write_table(
                part, os.path.join(dest, f"part-{i:05d}.parquet")
            )
    with open(marker, "w") as f:
        f.write(VERSION)
    return out_dir


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfbpe"
    ensure_bpe_corpus(out)
    d = pq.read_table(os.path.join(out, "documents.parquet"))
    print(f"{out}: documents={d.num_rows}")


if __name__ == "__main__":
    main()
