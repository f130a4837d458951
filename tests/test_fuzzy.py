"""SymSpell fuzzy matching (plans/fuzzy.py): deletion-neighborhood
completeness on an adversarial crafted corpus (brute-force levenshtein
ground truth), the canonical-map semantics, and determinism. Oracle
parity on the registry corpora is covered by
tests/test_library_parity.py."""

from __future__ import annotations

import itertools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from sales_etl_pipeline_spark.plans import fuzzy  # noqa: E402

SF = "/root/testdata/sf0.001"

#: adversarial vocabulary: substitutions, insertions, deletions,
#: transpositions (= two substitutions for plain levenshtein), prefix
#: overlaps, same-variant collisions via short words, and far words
_WORDS = [
    "spark", "spork", "sparks", "park", "stark", "sprak",
    "table", "cable", "tale", "tables", "stable",
    "abc", "abd", "bcd", "acd", "xyz",
    "window", "widow", "winnow", "wind",
    "quality", "equality", "qualify",
]


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(
                    prev[j] + 1,
                    cur[-1] + 1,
                    prev[j - 1] + (ca != cb),
                )
            )
        prev = cur
    return prev[-1]


def _crafted_dir(tmp_path) -> str:
    d = tmp_path / "fuzzycorpus"
    d.mkdir()
    # one word per document; freq = 1 + (index % 3) via repetition
    rows = []
    for i, w in enumerate(_WORDS):
        rows.append((i, " ".join([w] * (1 + i % 3))))
    pq.write_table(
        pa.table(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "lang": ["en"] * len(rows),
                "source": ["src0"] * len(rows),
                "n_chars": [len(r[1]) for r in rows],
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def test_blocking_is_complete_and_exact_on_crafted_corpus(spark, tmp_path):
    """The deletion-neighborhood candidates, after exact verification,
    equal brute-force all-pairs levenshtein <= k — the SymSpell
    completeness theorem exercised on substitution / insertion /
    deletion / transposition / prefix shapes the registry corpus
    doesn't contain."""
    sf = _crafted_dir(tmp_path)
    got = {
        (r.word_a, r.word_b, r.dist)
        for r in fuzzy.fuzzy_word_pairs(spark, sf).collect()
    }
    want = {
        (a, b, _lev(a, b))
        for a, b in itertools.combinations(sorted(_WORDS), 2)
        if len(a) >= fuzzy.FUZZY_MIN_LEN
        and len(b) >= fuzzy.FUZZY_MIN_LEN
        and _lev(a, b) <= fuzzy.FUZZY_K
    }
    assert got == want
    # sanity: the crafted corpus exercises every distance
    assert {d for _, _, d in want} == {1, 2}


def test_canonical_map_semantics(spark, tmp_path):
    sf = _crafted_dir(tmp_path)
    freqs = {w: 1 + i % 3 for i, w in enumerate(_WORDS)}
    canon = {
        r.word: (r.canonical, r.canonical_freq)
        for r in fuzzy.typo_canonical_map(spark, sf).collect()
    }
    assert set(canon) == {
        w for w in _WORDS if len(w) >= fuzzy.FUZZY_MIN_LEN
    }
    for w, (c, cf) in canon.items():
        nbrs = [
            x
            for x in freqs
            if len(x) >= fuzzy.FUZZY_MIN_LEN and _lev(w, x) <= fuzzy.FUZZY_K
        ]
        best = min(nbrs, key=lambda x: (-freqs[x], x))
        assert (c, cf) == (best, freqs[best]), w
        # canonical never decreases frequency
        assert cf >= freqs[w]


def test_fuzzy_pairs_deterministic(spark):
    one = {tuple(r) for r in fuzzy.fuzzy_word_pairs(spark, SF).collect()}
    two = {tuple(r) for r in fuzzy.fuzzy_word_pairs(spark, SF).collect()}
    assert one == two and one


def test_text_typo_normalize_applies_the_map(spark, tmp_path):
    """Doc-grain normalization = token-wise application of the
    canonical map with order preserved; counts add up."""
    sf = _crafted_dir(tmp_path)
    cmap = {
        r.word: r.canonical
        for r in fuzzy.typo_canonical_map(spark, sf).collect()
    }
    import pyarrow.parquet as pq2

    docs = {
        r["doc_id"]: r["text"]
        for r in pq2.read_table(sf + "/documents.parquet").to_pylist()
    }
    rows = fuzzy.text_typo_normalize(spark, sf).collect()
    assert {r.doc_id for r in rows} == set(docs)
    for r in rows:
        toks = docs[r.doc_id].split(" ")
        want = [cmap.get(t, t) for t in toks]
        assert r.normalized_text == " ".join(want), r.doc_id
        assert r.n_tokens == len(toks)
        assert r.n_changed == sum(
            1 for t in toks if cmap.get(t, t) != t
        )
