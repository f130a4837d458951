"""Synthesize an ADVERSARIALLY SKEWED corpus for the near-dup / ANN scale
paths — the data shape a uniform TPC-H-ish corpus never produces but a real
crawl always does:

- ``documents``: boilerplate-heavy near-dup FAMILIES with power-law sizes
  (Zipfian: family f has ~top/f members). Members are small token
  mutations of a shared base text — NOT byte-identical, so the exact-dup
  collapse cannot absorb them and the LSH band buckets genuinely blow past
  the hot-bucket cap. Source labels are power-law too (one dominant
  source), matching web-crawl source skew.
- ``embeddings``: genuinely CLUSTERED vectors (Zipf-sized Gaussian blobs
  around well-separated centers) plus a slice of exact duplicate vectors —
  the shape that makes untrained/modulo centroids fail and duplicate-heavy
  cluster joins quadratic.

Everything is deterministic (fixed numpy Generator seed); a version marker
makes regeneration automatic when the recipe changes. Importable
(``ensure_skew_corpus``) so pytest and bench share one corpus.

Usage: python scripts/make_skewdata.py [out_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

#: bump when the recipe changes — stale corpora regenerate automatically
VERSION = "skew-v4"

SEED = 20260814
N_FAMILIES = 30
TOP_FAMILY = 500  # family f (1-based) gets ~TOP_FAMILY / f members
N_SINGLETONS = 1500
#: long boilerplate + single-token edits keep ~85% of a family on the SAME
#: minhash band keys (an edit moves a band's min-hash only if one of its
#: ~3 touched shingles held the current min) — that is what makes band
#: buckets genuinely exceed the hot-bucket cap, like real boilerplate does
FAMILY_TOKENS = 80  # tokens per boilerplate base text
VOCAB = 2000
N_SOURCES = 8

N_EMB = 8000
EMB_DIMS = 64
N_CENTERS = 20
EMB_DUP_FRAC = 0.10  # fraction of vectors that are exact copies
EMB_NOISE = 0.05  # within-cluster noise scale (centers are unit-ish)


def _zipf_sizes(total_top: int, n: int, floor: int = 2) -> list[int]:
    return [max(floor, total_top // rank) for rank in range(1, n + 1)]


def _make_documents(rng: np.random.Generator):
    vocab = [f"tok{i}" for i in range(VOCAB)]
    src_weights = np.array([1.0 / (j + 1) for j in range(N_SOURCES)])
    src_weights /= src_weights.sum()

    doc_ids, texts, langs, sources = [], [], [], []
    did = 0

    def emit(tokens: list[str]):
        nonlocal did
        doc_ids.append(did)
        texts.append(" ".join(tokens))
        langs.append("en")
        sources.append(f"src{rng.choice(N_SOURCES, p=src_weights)}")
        did += 1

    for fam, size in enumerate(_zipf_sizes(TOP_FAMILY, N_FAMILIES)):
        base = list(rng.choice(VOCAB, size=FAMILY_TOKENS))
        base_toks = [vocab[i] for i in base]
        for m in range(size):
            toks = list(base_toks)
            if m == 0 or rng.random() < 0.1:
                pass  # exact duplicate of the family boilerplate
            else:
                # 1 (rarely 2) token substitutions: high-Jaccard near-dups
                # that the exact collapse cannot merge — the hot-bucket
                # source
                for _ in range(1 if rng.random() < 0.8 else 2):
                    pos = int(rng.integers(0, FAMILY_TOKENS))
                    toks[pos] = f"fam{fam}_var{int(rng.integers(0, 50))}"
            emit(toks)

    for _ in range(N_SINGLETONS):
        n_tok = int(rng.integers(20, 60))
        emit([vocab[i] for i in rng.choice(VOCAB, size=n_tok)])

    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def _make_embeddings(rng: np.random.Generator):
    centers = rng.normal(0.0, 1.0, size=(N_CENTERS, EMB_DIMS))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    weights = np.array([1.0 / (c + 1) for c in range(N_CENTERS)])
    weights /= weights.sum()

    n_fresh = int(N_EMB * (1 - EMB_DUP_FRAC))
    labels = rng.choice(N_CENTERS, size=n_fresh, p=weights)
    vecs = centers[labels] + rng.normal(0.0, EMB_NOISE, size=(n_fresh, EMB_DIMS))

    n_dup = N_EMB - n_fresh
    dup_of = rng.integers(0, n_fresh, size=n_dup)
    vecs = np.vstack([vecs, vecs[dup_of]])
    labels = np.concatenate([labels, labels[dup_of]])

    return pa.table(
        {
            "vec_id": pa.array(np.arange(N_EMB), pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )


#: events skew: one mega-user generates this fraction of the stream —
#: the per-user window/session/state partitioning hot spot
N_EVENTS = 20000
N_USERS = 300
HOT_USER_FRAC = 0.30
EVENT_TYPES = ("view", "click", "purchase", "signup", "error")


def _make_events(rng: np.random.Generator):
    """Hot-user event stream: user 0 emits HOT_USER_FRAC of all events —
    the shape that concentrates per-user windows/sessions/state on one
    reducer. Timestamps are ns-precision (same physical type as the
    driver's events.parquet) over a month, increasing with jitter so
    sessions exist."""
    n_hot = int(N_EVENTS * HOT_USER_FRAC)
    users = np.concatenate([
        np.zeros(n_hot, dtype=np.int64),
        rng.integers(1, N_USERS, size=N_EVENTS - n_hot),
    ])
    rng.shuffle(users)
    base = np.datetime64("2024-01-01T00:00:00", "ns").astype(np.int64)
    # ~2.2 min mean gap over the month; exponential gaps → real sessions
    gaps = rng.exponential(130.0, size=N_EVENTS) * 1e9
    ts = base + np.cumsum(gaps).astype(np.int64)
    etype = [EVENT_TYPES[i] for i in rng.integers(0, len(EVENT_TYPES), size=N_EVENTS)]
    value = np.round(rng.random(N_EVENTS) * 300.0, 2)
    props = [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, size=N_EVENTS)]
    return pa.table(
        {
            "event_id": pa.array(np.arange(N_EVENTS), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("ns")),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(etype, pa.string()),
            "value": pa.array(value, pa.float64()),
            "props": pa.array(props, pa.string()),
        }
    )


def ensure_skew_corpus(out_dir: str) -> str:
    """Write the skewed corpus to ``out_dir`` if absent or stale; returns
    ``out_dir``. Idempotent and cheap on the hit path (one marker read)."""
    marker = os.path.join(out_dir, "_SKEW_VERSION")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == VERSION:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)
    pq.write_table(_make_documents(rng), os.path.join(out_dir, "documents.parquet"))
    pq.write_table(_make_embeddings(rng), os.path.join(out_dir, "embeddings.parquet"))
    # separate generator: documents/embeddings stay byte-identical to v3
    pq.write_table(
        _make_events(np.random.default_rng(SEED + 1)),
        os.path.join(out_dir, "events.parquet"),
    )
    with open(marker, "w") as f:
        f.write(VERSION)
    return out_dir


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfskew"
    ensure_skew_corpus(out)
    d = pq.read_metadata(os.path.join(out, "documents.parquet"))
    e = pq.read_metadata(os.path.join(out, "embeddings.parquet"))
    print(f"{out}: documents={d.num_rows} embeddings={e.num_rows}")


if __name__ == "__main__":
    main()
