"""WordPiece tokenizer (plans/wordpiece.py): pure-Python training
replay (the independent second check next to the DuckDB CTE oracle run
by tests/test_library_parity.py), the greedy longest-match kernel's
BERT-convention behavior, and corpus-level consistency."""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sales_etl_pipeline_spark.plans import wordpiece as wp  # noqa: E402
from sales_etl_pipeline_spark.sources.readers import load_table  # noqa: E402

SF = "/root/testdata/sf0.001"


def _corpus_word_freq(spark) -> Counter:
    docs = load_table(spark, SF, "documents").collect()
    freq: Counter = Counter()
    for r in docs:
        freq.update(re.findall("[a-z]+", r.text.lower()))
    return freq


def _replay_train(freq: Counter, n_merges: int):
    """Sequential WordPiece training in plain Python — same quantized
    integer score, same tie-break."""
    seqs = {
        w: [w[0]] + ["##" + c for c in w[1:]] for w in freq
    }
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        tc: Counter = Counter()
        for w, toks in seqs.items():
            f = freq[w]
            for t in toks:
                tc[t] += f
            for a, b in zip(toks, toks[1:]):
                pc[(a, b)] += f
        assert pc, "exhausted"
        best = min(
            pc,
            key=lambda p: (
                -((pc[p] * wp.WP_SCALE) // (tc[p[0]] * tc[p[1]])),
                p[0],
                p[1],
            ),
        )
        score = (pc[best] * wp.WP_SCALE) // (tc[best[0]] * tc[best[1]])
        merged = wp._merge_token(*best)
        for w, toks in seqs.items():
            out, i = [], 0
            while i < len(toks):
                if (
                    i + 1 < len(toks)
                    and toks[i] == best[0]
                    and toks[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            seqs[w] = out
        merges.append((best[0], best[1], score))
    return merges, seqs


def test_training_replay_bit_match(spark):
    merges, _ = wp.train_wordpiece(spark, SF)
    expect, _ = _replay_train(_corpus_word_freq(spark), wp.WP_MERGES)
    assert merges == expect


def test_segmented_matches_replay_segmentation(spark):
    """The engine's longest-match segmentation agrees with a plain
    longest-match walk over the replayed vocabulary."""
    freq = _corpus_word_freq(spark)
    merges, _ = _replay_train(freq, wp.WP_MERGES)
    vocab = {w[0] for w in freq} | {
        "##" + c for w in freq for c in w[1:]
    } | {wp._merge_token(a, b) for a, b, _s in merges}
    got = {
        r.word: r.seg
        for r in wp.wordpiece_segmented(spark, SF).collect()
    }
    assert set(got) == set(freq)
    for w in freq:
        assert got[w] == " ".join(wp.segment_word(w, vocab)), w


def test_kernel_bert_conventions():
    vocab = {"un", "##aff", "##able", "##a", "u", "a"}
    # greedy longest-match with ## continuations (the BERT paper
    # example; max_chars raised past the corpus-sized default)
    assert wp.segment_word("unaffable", vocab, max_chars=100) == [
        "un",
        "##aff",
        "##able",
    ]
    # no-match inside the word → whole word [UNK]
    assert wp.segment_word("unz", vocab) == [wp.UNK]
    # overlength word → [UNK] without scanning
    assert wp.segment_word("a" * (wp.WP_MAX_WORD_CHARS + 1), vocab) == [
        wp.UNK
    ]
    # longest-match preference: 'un' over 'u'
    assert wp.segment_word("una", vocab) == ["un", "##a"]


def test_merge_scores_are_likelihood_not_frequency(spark):
    """WordPiece ranks by c/(ca·cb), not raw count: the trained merge
    list must differ from pure-frequency BPE on this corpus (else the
    score did nothing)."""
    from sales_etl_pipeline_spark.plans import bpe

    wp_merges = [(l, r) for l, r, _s in wp.train_wordpiece(spark, SF)[0]]
    bpe_pairs = bpe.train_bpe(spark, SF, n_merges=wp.WP_MERGES)[0]
    # alphabets differ (## continuations), so compare the merged surface
    # forms each trainer would produce first
    wp_first = wp._merge_token(*wp_merges[0])
    bpe_first = "".join(bpe_pairs[0])
    assert wp_first != bpe_first or wp_merges != [
        (l.replace("##", ""), r.replace("##", "")) for l, r in wp_merges
    ]


def test_token_stats_consistency(spark):
    rows = wp.wordpiece_token_stats(spark, SF).collect()
    seg = {
        r.word: r for r in wp.wordpiece_segmented(spark, SF).collect()
    }
    docs = load_table(spark, SF, "documents").collect()
    by_doc = {}
    for d in docs:
        ws = re.findall("[a-z]+", d.text.lower())
        by_doc[d.doc_id] = (
            len(ws),
            sum(seg[w].n_tok for w in ws),
            sum(seg[w].is_unk for w in ws),
        )
    for r in rows:
        assert (r.n_words, r.n_wp_tokens, r.n_unk_words) == by_doc[
            r.doc_id
        ], r.doc_id


def test_wordpiece_model_registry_round_trip(spark, tmp_path):
    """Trained WordPiece merges round-trip through the versioned model
    registry (the BPE/unigram store gains its third family); a retrain
    commit time-travels back to the first model."""
    from sales_etl_pipeline_spark.operators import tokenizer_store as ts

    root = str(tmp_path / "wp_models")
    merges, _ = wp.train_wordpiece(spark, SF)
    v1 = ts.save_wordpiece_model(spark, root, merges, writer="t", epoch=1)
    assert ts.load_wordpiece_model(spark, root) == merges
    # replay idempotence: same (writer, epoch) returns the same version
    assert ts.save_wordpiece_model(spark, root, merges, writer="t", epoch=1) == v1
    # a "retrain" with fewer merges commits a new version; v1 readable
    v2 = ts.save_wordpiece_model(
        spark, root, merges[:3], writer="t", epoch=2
    )
    assert v2 > v1
    assert ts.load_wordpiece_model(spark, root) == merges[:3]
    assert ts.load_wordpiece_model(spark, root, version=v1) == merges
    # a loaded model drives segmentation identically to the trained one
    vocab = set(wp.wp_vocab(spark, SF))
    loaded = ts.load_wordpiece_model(spark, root, version=v1)
    lvocab = wp._alphabet(spark, SF) | {
        wp._merge_token(l, r) for l, r, _s in loaded
    }
    assert lvocab == vocab


def test_tokenizer_compare_consistency(spark):
    """The 3-row decision relation agrees with each family's own
    word-grain relation summed driver-side."""
    rows = {r.family: r for r in wp.tokenizer_compare(spark, SF).collect()}
    assert set(rows) == {"bpe", "bpe_bytes", "wordpiece"}
    seg = wp.wordpiece_segmented(spark, SF).collect()
    n_tok = sum(r.freq * r.n_tok for r in seg)
    n_units = sum(r.freq for r in seg)
    total_len = sum(r.freq * len(r.word) for r in seg)
    r = rows["wordpiece"]
    assert (r.n_units, r.n_tokens, r.total_len) == (
        n_units,
        n_tok,
        total_len,
    )
    # all three tokenize the same word stream (byte pretokens differ)
    assert rows["bpe"].n_units == rows["wordpiece"].n_units
    assert rows["bpe"].total_len == rows["wordpiece"].total_len


def _replay_train_batched(
    freq: Counter, n_merges: int, batch: int, admission: str
):
    """Pure-Python replay of the BATCHED trainer: score-sorted top-m,
    non-interacting admission with the ##-stripping created-token rule,
    one chained application per round."""
    seqs = {w: [w[0]] + ["##" + c for c in w[1:]] for w in freq}
    merges = []
    while len(merges) < n_merges:
        want = min(batch, n_merges - len(merges))
        pc: Counter = Counter()
        tc: Counter = Counter()
        for w, toks in seqs.items():
            f = freq[w]
            for t in toks:
                tc[t] += f
            for a, b in zip(toks, toks[1:]):
                pc[(a, b)] += f
        assert pc, "exhausted"
        scored = sorted(
            pc,
            key=lambda p: (
                -((pc[p] * wp.WP_SCALE) // (tc[p[0]] * tc[p[1]])),
                p[0],
                p[1],
            ),
        )[:want]
        admitted, used = [], set()
        for l, r in scored:
            if admitted and (
                l in used or r in used or wp._merge_token(l, r) in used
            ):
                if admission == "prefix":
                    break
                continue
            admitted.append((l, r))
            used.update((l, r, wp._merge_token(l, r)))
        for l, r in admitted:
            merged = wp._merge_token(l, r)
            for w, toks in seqs.items():
                out, i = [], 0
                while i < len(toks):
                    if (
                        i + 1 < len(toks)
                        and toks[i] == l
                        and toks[i + 1] == r
                    ):
                        out.append(merged)
                        i += 2
                    else:
                        out.append(toks[i])
                        i += 1
                seqs[w] = out
        merges.extend(
            (l, r, (pc[(l, r)] * wp.WP_SCALE) // (tc[l] * tc[r]))
            for l, r in admitted
        )
    return merges, seqs


def test_batched_training_replay_bit_match(spark):
    """The scalable-vocab batched mode (subset admission) replays
    bit-for-bit in pure Python — its own oracle, the plans/bpe.py
    batched-mode convention."""
    freq = _corpus_word_freq(spark)
    for admission in ("prefix", "subset"):
        got, _ = wp.train_wordpiece(
            spark, SF, batch_size=4, admission=admission
        )
        expect, _ = _replay_train_batched(
            freq, wp.WP_MERGES, 4, admission
        )
        assert got == expect, admission


def test_encoded_docs_decode_back_to_the_word_stream(spark):
    """ids → vocab tokens → ## de-continuation reconstructs every
    document's word stream exactly (the losslessness contract of the
    serving surface; non-word characters are pretokenizer-dropped by
    definition)."""
    vocab = {
        r.token_id: r.token
        for r in wp.wordpiece_vocab_table(spark, SF).collect()
    }
    docs = {
        r.doc_id: re.findall("[a-z]+", r.text.lower())
        for r in load_table(spark, SF, "documents").collect()
    }
    enc = wp.wordpiece_encoded_docs_str(spark, SF).collect()
    assert {r.doc_id for r in enc} == {
        d for d, ws in docs.items() if ws
    }
    for r in enc:
        toks = [vocab[int(i)] for i in r.token_ids_str.split("_")]
        assert len(toks) == r.n_tokens
        words: list[str] = []
        for t in toks:
            if t.startswith("##"):
                words[-1] += t[2:]
            else:
                words.append(t)
        assert words == docs[r.doc_id], r.doc_id
