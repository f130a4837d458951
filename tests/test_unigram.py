"""Unigram-LM tokenizer (plans/unigram.py): pure-Python EM replay
(allclose on probabilities), EM likelihood monotonicity, probability
normalization, coverage totality, Viterbi optimality + deterministic
tie-break, and exact segmentation agreement with the replay."""

from __future__ import annotations

import math
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sales_etl_pipeline_spark.plans import unigram as U  # noqa: E402

SF = "/root/testdata/sf0.001"


def _word_freqs(spark):
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    freqs: dict[str, int] = {}
    for r in docs.select("text").collect():
        for w in re.findall("[a-z]+", r.text.lower()):
            freqs[w] = freqs.get(w, 0) + 1
    return freqs


def _py_train(freqs, vocab_size=U.VOCAB_SIZE, em_rounds=U.EM_ROUNDS):
    """Pure-Python replay of train_unigram: same seed rule, same
    lattice function, same M-step/prune — no Spark anywhere."""
    counts: dict[str, float] = {}
    for w, f in freqs.items():
        for i in range(len(w)):
            for l in range(1, min(U.MAX_PIECE_LEN, len(w) - i) + 1):
                p = w[i : i + l]
                counts[p] = counts.get(p, 0.0) + f
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[: U.SEED_SIZE]
    probs = dict(top)
    for p, c in counts.items():
        if len(p) == 1:
            probs.setdefault(p, c)
    z = sum(probs.values())
    probs = {p: c / z for p, c in probs.items()}

    def em(probs):
        logp = {p: math.log(v) for p, v in probs.items()}
        acc: dict[str, float] = {}
        ll = 0.0
        for w, f in freqs.items():
            exp, zw = U._lattice_expected(w, float(f), logp)
            if zw != float("-inf"):
                ll += f * zw
            for p, c in exp.items():
                acc[p] = acc.get(p, 0.0) + c
        total = sum(acc.values())
        new = {
            p: max(acc.get(p, 0.0) / total, U.PROB_FLOOR) for p in probs
        }
        z = sum(new.values())
        return {p: v / z for p, v in new.items()}, ll

    lls = []
    for _ in range(em_rounds):
        probs, ll = em(probs)
        lls.append(ll)
    probs = U._prune(probs, vocab_size)
    probs, ll = em(probs)
    lls.append(ll)
    return probs, lls


def test_train_matches_python_replay(spark):
    """Distributed EM ≡ the pure-Python replay: same support, allclose
    probabilities (float summation order is the only divergence), and
    allclose per-round log-likelihoods."""
    U.clear_unigram_cache()
    probs, lls = U.train_unigram(spark, SF)
    want, want_lls = _py_train(_word_freqs(spark))
    assert set(probs) == set(want)
    np.testing.assert_allclose(
        [probs[p] for p in sorted(probs)],
        [want[p] for p in sorted(want)],
        rtol=1e-8,
    )
    np.testing.assert_allclose(lls, want_lls, rtol=1e-8)


def test_em_likelihood_is_monotone(spark):
    """The EM certificate: corpus log-likelihood under the entering
    probs must not decrease across the pre-prune rounds (pruning may
    drop likelihood by design; the post-prune round is excluded)."""
    probs, lls = U.train_unigram(spark, SF)
    pre = lls[: U.EM_ROUNDS]
    assert all(b >= a - 1e-9 * abs(a) for a, b in zip(pre, pre[1:])), lls


def test_probabilities_normalized_and_chars_covered(spark):
    probs, _ = U.train_unigram(spark, SF)
    assert abs(sum(probs.values()) - 1.0) < 1e-9
    chars = {c for w in _word_freqs(spark) for c in w}
    assert chars <= {p for p in probs if len(p) == 1}


def test_viterbi_optimal_and_total(spark):
    """Viterbi returns a max-score segmentation: its score must match a
    brute-force enumeration over all segmentations for a sample of
    words, and every corpus word must segment (coverage)."""
    probs, _ = U.train_unigram(spark, SF)
    logp = {p: math.log(v) for p, v in probs.items()}
    words = sorted(_word_freqs(spark))[:80]

    def brute(word):
        best = None
        stack = [(0, 0.0, ())]
        while stack:
            pos, sc, seg = stack.pop()
            if pos == len(word):
                cand = (sc, -len(seg), seg)
                if best is None or (
                    (cand[0], cand[1]) > (best[0], best[1])
                    or ((cand[0], cand[1]) == (best[0], best[1]) and seg < best[2])
                ):
                    best = cand
                continue
            for l in range(1, min(U.MAX_PIECE_LEN, len(word) - pos) + 1):
                piece = word[pos : pos + l]
                if piece in logp:
                    stack.append((pos + l, sc + logp[piece], seg + (piece,)))
        return best

    for w in words:
        got = U.viterbi_segment(w, logp)
        b = brute(w)
        assert b is not None, w
        got_score = sum(logp[p] for p in got)
        assert abs(got_score - b[0]) < 1e-9, (w, got, b)
        assert "".join(got) == w


def test_viterbi_deterministic_tie_break():
    """Constructed exact tie: 'aaa' under {a: p, aa: p} — segmentations
    (a,aa) and (aa,a) share score and piece count; the rule picks the
    lexicographically smaller (a, aa)."""
    logp = {"a": math.log(0.5), "aa": math.log(0.5)}
    assert U.viterbi_segment("aaa", logp) == ["a", "aa"]
    # fewer pieces beats more at equal score: 'aa' alone vs (a, a)
    logp2 = {"a": math.log(0.25), "aa": math.log(0.0625)}
    assert U.viterbi_segment("aa", logp2) == ["aa"]


def test_token_stats_matches_replay_segmentation(spark):
    """The distributed doc sizing agrees with a driver-side recount
    using the replay's Viterbi segmentation of every word."""
    probs, _ = U.train_unigram(spark, SF)
    logp = {p: math.log(v) for p, v in probs.items()}
    seg_len = {
        w: len(U.viterbi_segment(w, logp)) for w in _word_freqs(spark)
    }
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    want = {}
    for r in docs.select("doc_id", "text").collect():
        ws = re.findall("[a-z]+", r.text.lower())
        if ws:
            want[r.doc_id] = (len(ws), sum(seg_len[w] for w in ws))
    got = {
        r.doc_id: (r.n_words, r.n_pieces)
        for r in U.unigram_token_stats(spark, SF).collect()
    }
    assert got == want


def test_vocab_plan_flat_and_sized(spark):
    rows = U.unigram_vocab(spark, SF).collect()
    assert rows and all(len(r) == 3 for r in rows)
    pieces = [r.piece for r in rows]
    assert pieces == sorted(pieces)
    # the PRUNED bound (multi pieces capped at VOCAB_SIZE − singles, so
    # the total is ≤ VOCAB_SIZE) — a no-op _prune returning the
    # ~SEED_SIZE seed must fail here
    n_singles = sum(1 for p in pieces if len(p) == 1)
    assert len(rows) <= max(U.VOCAB_SIZE, n_singles)
    assert n_singles <= 26


def test_unigram_apply_matches_word_segments(spark):
    """unigram_apply (the bpe_apply counterpart, consuming a loaded
    log-prob dict) reproduces the per-word Viterbi on real documents,
    including words order and concatenation identity."""
    probs, _ = U.train_unigram(spark, SF)
    logp = {p: math.log(v) for p, v in probs.items()}
    # deterministic subset: limit() without orderBy may pick different
    # rows across the two jobs below
    docs = spark.read.parquet(
        os.path.join(SF, "documents.parquet")
    ).filter("doc_id < 25")
    got = {
        r.doc_id: list(r.unigram_pieces)
        for r in U.unigram_apply(docs, "text", logp).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        want = []
        for w in re.findall("[a-z]+", r.text.lower()):
            want.extend(U.viterbi_segment(w, logp))
        assert got[r.doc_id] == want
        assert "".join(got[r.doc_id]) == "".join(
            re.findall("[a-z]+", r.text.lower())
        )


def test_unigram_apply_null_and_oov_total(spark):
    """Totality on arbitrary input (review r11): NULL text → NULL
    pieces (bpe_apply's null-propagation twin), and a word with an
    out-of-vocabulary character segments via the singleton fallback
    instead of crashing the job."""
    logp = {"a": math.log(0.5), "b": math.log(0.5)}
    df = spark.createDataFrame(
        [(1, "ab ba"), (2, None), (3, "az")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (None if r.unigram_pieces is None else list(r.unigram_pieces))
        for r in U.unigram_apply(df, "text", logp).collect()
    }
    assert got[1] == ["a", "b", "b", "a"]
    assert got[2] is None
    assert got[3] == ["a", "z"]  # 'z' unseen: kept as its own piece


# ---------------------------------------------------------------------------
# byte-level (open-vocabulary) unigram — stride-2 twin (r12)


def _byte_pretoken_freqs(spark):
    from sales_etl_pipeline_spark.plans.bpe import BYTE_PRETOK_SQL

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    freqs: dict[str, int] = {}
    for r in docs.select("text").collect():
        for w in re.findall(BYTE_PRETOK_SQL, r.text):
            h = w.encode("utf-8").hex()
            freqs[h] = freqs.get(h, 0) + 1
    return freqs


def _py_train_bytes(freqs, vocab_size=U.VOCAB_SIZE, em_rounds=U.EM_ROUNDS):
    """Pure-Python replay of train_unigram_bytes: same seed rule over
    byte-aligned hex substrings, same stride-2 lattice, same M-step and
    prune (sym_len=2) — no Spark anywhere."""
    counts: dict[str, float] = {}
    for h, f in freqs.items():
        m = len(h) // 2
        for i in range(m):
            for l in range(1, min(U.MAX_PIECE_LEN, m - i) + 1):
                p = h[i * 2 : (i + l) * 2]
                counts[p] = counts.get(p, 0.0) + f
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[: U.SEED_SIZE]
    probs = dict(top)
    for p, c in counts.items():
        if len(p) == 2:
            probs.setdefault(p, c)
    z = sum(probs.values())
    probs = {p: c / z for p, c in probs.items()}

    def em(probs):
        logp = {p: math.log(v) for p, v in probs.items()}
        acc: dict[str, float] = {}
        ll = 0.0
        for h, f in freqs.items():
            exp, zw = U._lattice_expected(h, float(f), logp, stride=2)
            if zw != float("-inf"):
                ll += f * zw
            for p, c in exp.items():
                acc[p] = acc.get(p, 0.0) + c
        total = sum(acc.values())
        new = {
            p: max(acc.get(p, 0.0) / total, U.PROB_FLOOR) for p in probs
        }
        z = sum(new.values())
        return {p: v / z for p, v in new.items()}, ll

    lls = []
    for _ in range(em_rounds):
        probs, ll = em(probs)
        lls.append(ll)
    probs = U._prune(probs, vocab_size, sym_len=2)
    probs, ll = em(probs)
    lls.append(ll)
    return probs, lls


def test_byte_train_matches_python_replay(spark):
    """Distributed byte-level EM ≡ the pure-Python stride-2 replay."""
    U.clear_unigram_cache()
    probs, lls = U.train_unigram_bytes(spark, SF)
    want, want_lls = _py_train_bytes(_byte_pretoken_freqs(spark))
    assert set(probs) == set(want)
    np.testing.assert_allclose(
        [probs[p] for p in sorted(probs)],
        [want[p] for p in sorted(want)],
        rtol=1e-8,
    )
    np.testing.assert_allclose(lls, want_lls, rtol=1e-8)
    # the EM certificate holds at byte grain too
    pre = lls[: U.EM_ROUNDS]
    assert all(b >= a - 1e-9 * abs(a) for a, b in zip(pre, pre[1:])), lls
    # every piece is a byte-aligned hex string; all single bytes seen in
    # the corpus are covered (the open-vocab coverage rule)
    assert all(len(p) % 2 == 0 and len(p) >= 2 for p in probs)


def test_byte_apply_open_vocab_lossless(spark):
    """unigram_apply_bytes is TOTAL and byte-lossless on text the
    char-grain model cannot even represent: uppercase, digits,
    punctuation, non-ASCII, and bytes never seen in training (OOV
    singleton fallback)."""
    probs, _ = U.train_unigram_bytes(spark, SF)
    logp = {p: math.log(v) for p, v in probs.items()}
    weird = [
        (0, "Hello WORLD, it's 2026!"),
        (1, "café ± π 🚀"),
        (2, None),
    ]
    df = spark.createDataFrame(weird, "doc_id long, text string")
    out = {
        r.doc_id: r.unigram_byte_pieces
        for r in U.unigram_apply_bytes(df, "text", logp).collect()
    }
    for doc_id, text in weird:
        if text is None:
            assert out[doc_id] is None
            continue
        decoded = bytes.fromhex("".join(out[doc_id])).decode("utf-8")
        assert decoded == text
    U.clear_unigram_cache()


def test_unigram_doc_perplexity_matches_replay(spark):
    """The LM quality score replays exactly: per doc, sum of the
    Viterbi path log-probs of its words under the trained model;
    perplexity = exp(−total/pieces). Monotone sanity: perplexity ≥ 1
    whenever every piece prob ≤ 1 (it is — probs are normalized)."""
    probs, _ = U.train_unigram(spark, SF)
    logp = {p: math.log(v) for p, v in probs.items()}
    got = {
        r.doc_id: r for r in U.unigram_doc_perplexity(spark, SF).collect()
    }
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    cache: dict = {}
    for r in docs.select("doc_id", "text").collect():
        words = re.findall("[a-z]+", r.text.lower())
        tot, pieces = 0.0, 0
        for w in words:
            if w not in cache:
                seg = U.viterbi_segment(w, logp)
                cache[w] = (sum(logp[p] for p in seg), len(seg))
            s, n = cache[w]
            tot += s
            pieces += n
        if not words:
            assert r.doc_id not in got
            continue
        g = got[r.doc_id]
        assert g.n_words == len(words) and g.n_pieces == pieces
        np.testing.assert_allclose(g.total_logprob, tot, rtol=1e-9)
        np.testing.assert_allclose(
            g.perplexity, math.exp(-tot / pieces), rtol=1e-9
        )
        assert g.perplexity >= 1.0
