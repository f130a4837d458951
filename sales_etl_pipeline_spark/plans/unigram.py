"""Unigram-LM subword tokenizer (SentencePiece-style; Kudo 2018,
public) — the second trained tokenizer family next to BPE
(``plans/bpe.py``). Where BPE greedily composes merges bottom-up, the
unigram model starts from an over-complete piece vocabulary and fits
piece probabilities by EM over all segmentations, then segments by
Viterbi — the algorithm behind most production sentencepiece vocabs.

The reference pipeline (a pandas ETL; plans/parity.py) has no tokenizer;
this is engine extension surface in the spirit of SURVEY.md §2.11.

Training (all at WORD-DISTINCT grain — the same trick as BPE training:
one corpus-grain shuffle builds the word-frequency relation, every EM
round after that is independent of corpus size):

1. SEED vocabulary: every substring of length 1..MAX_PIECE_LEN of every
   distinct word, weighted by word frequency (relational: one
   posexplode over generated (start, len) pairs — no UDF), topped by
   count to SEED_SIZE with ALL single characters force-kept (coverage:
   any word must be segmentable).
2. EM rounds: the E-step runs the forward–backward lattice per distinct
   word inside ``mapInPandas`` (the vocab is a broadcast python dict —
   bounded at SEED_SIZE entries, the same bounded-model-relation
   contract as the IVF centroids), emitting per-batch partial expected
   counts at piece grain; one vocab-grain shuffle sums them; the M-step
   renormalizes and the (≤ SEED_SIZE)-row vocab is collected back for
   the next round — bounded driver traffic per round, like the k-means
   centroid and GD-gradient collects.
3. PRUNE to VOCAB_SIZE by expected count (single chars force-kept),
   then one final EM round re-normalizes the survivors.

Application: Viterbi segmentation per word under the trained log-probs
(ties broken deterministically: higher log-prob path, then FEWER
pieces, then lexicographically smaller segmentation), replayed on the
distinct-word relation and joined back to documents — apply cost is a
join, not a re-segmentation per occurrence.

Exactness: training is floating-point EM, so the pytest oracle is a
pure-Python replay (numpy, same summation ORDER within a word, partials
summed associatively) checked with ``allclose`` on probabilities and
EXACT equality on Viterbi segmentations away from float ties; the EM
likelihood-monotonicity property (each round's corpus log-likelihood
must not decrease) is pinned as the algebraic certificate the
implementation is really EM. No SQL oracle: lattice DP is not
SQL-expressible (same class as the k-means/GD iterative plans, which
carry replay oracles instead).

Scale shape: seed counting is one shuffle at (piece) grain over the
distinct-word substring explosion (bounded by Σ len(word)·MAX_PIECE_LEN
per distinct word); each EM round is one Arrow pass over distinct words
+ one piece-grain shuffle; the vocab relation stays ≤ SEED_SIZE rows
end to end. No driver loop touches corpus-sized data.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.readers import load_table
from .bpe import WORD_REGEX_SPARK, WORD_REGEX_SQL, _word_freq

#: longest candidate piece in the seed vocabulary
MAX_PIECE_LEN = 6
#: seed vocabulary size (before pruning; single chars force-kept)
SEED_SIZE = 2000
#: trained vocabulary size (after pruning; single chars force-kept)
VOCAB_SIZE = 512
#: EM rounds before pruning / after pruning
EM_ROUNDS = 3
#: floor probability mass for numerical safety (a piece the E-step
#: assigned zero mass keeps a tiny score so Viterbi stays total)
PROB_FLOOR = 1e-12


def seed_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The over-complete candidate relation: (piece, count) for every
    substring of length 1..MAX_PIECE_LEN of every distinct word,
    count = Σ word_freq over occurrences (with multiplicity within a
    word). Pure relational — positions come from ``sequence()``."""
    wf = _word_freq(spark, sf_dir)
    pieces = wf.select(
        "freq",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda i: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(
                                F.lit(MAX_PIECE_LEN),
                                F.length("word") - i + 1,
                            ),
                        ),
                        lambda n: F.substring(F.col("word"), i, n),
                    ),
                )
            )
        ).alias("piece"),
    )
    return pieces.groupBy("piece").agg(F.sum("freq").alias("count"))


def _top_seed(spark: SparkSession, sf_dir: str) -> dict[str, float]:
    """Driver-side seed scores: top SEED_SIZE pieces by count plus all
    single chars; initial prob ∝ count. Bounded collect (≤ SEED_SIZE +
    alphabet rows). The seed relation feeds BOTH collects, so it is
    pinned (llmdata._pin — released at the next registry plan) rather
    than paying the substring-explosion shuffle twice."""
    from .llmdata import _pin

    sv = _pin(seed_vocab(spark, sf_dir))
    top = (
        sv.orderBy(F.desc("count"), "piece").limit(SEED_SIZE).collect()
    )
    chars = (
        sv.filter(F.length("piece") == 1)
        .select("piece", "count")
        .collect()
    )
    counts: dict[str, float] = {}
    for r in top:
        counts[r.piece] = float(r["count"])
    for r in chars:
        counts.setdefault(r.piece, float(r["count"]))
    total = sum(counts.values())
    return {p: c / total for p, c in counts.items()}


def _lattice_expected(word: str, freq: float, logp: dict[str, float]):
    """Forward–backward over the segmentation lattice of one word:
    returns (expected piece counts weighted by freq, marginal
    log-likelihood of the word). Log-domain DP, python floats — the
    pure-Python replay oracle runs this same function."""
    n = len(word)
    NEG = float("-inf")
    # in-edges per end position: (start, piece, lp)
    edges: list[list[tuple[int, str, float]]] = [[] for _ in range(n + 1)]
    for i in range(n):
        for l in range(1, min(MAX_PIECE_LEN, n - i) + 1):
            piece = word[i : i + l]
            lp = logp.get(piece)
            if lp is not None:
                edges[i + l].append((i, piece, lp))
    def _lse(a: float, b: float) -> float:
        if a == NEG:
            return b
        if b == NEG:
            return a
        hi, lo = (a, b) if a >= b else (b, a)
        return hi + math.log1p(math.exp(lo - hi))

    alpha = [NEG] * (n + 1)
    alpha[0] = 0.0
    for e in range(1, n + 1):
        acc = NEG
        for s, _, lp in edges[e]:
            if alpha[s] != NEG:
                acc = _lse(acc, alpha[s] + lp)
        alpha[e] = acc
    beta = [NEG] * (n + 1)
    beta[n] = 0.0
    for s in range(n - 1, -1, -1):
        acc = NEG
        for l in range(1, min(MAX_PIECE_LEN, n - s) + 1):
            piece = word[s : s + l]
            lp = logp.get(piece)
            if lp is None or beta[s + l] == NEG:
                continue
            acc = _lse(acc, lp + beta[s + l])
        beta[s] = acc
    z = alpha[n]
    out: dict[str, float] = {}
    if z == NEG:
        return out, NEG  # unsegmentable (cannot happen with char coverage)
    for e in range(1, n + 1):
        for s, piece, lp in edges[e]:
            if alpha[s] == NEG or beta[e] == NEG:
                continue
            post = math.exp(alpha[s] + lp + beta[e] - z)
            out[piece] = out.get(piece, 0.0) + freq * post
    return out, z


def _em_round(
    wf: DataFrame, probs: dict[str, float]
) -> tuple[dict[str, float], float]:
    """One EM round over the distinct-word relation. Returns (new
    probs, corpus log-likelihood under the CURRENT probs). E-step
    partials per Arrow batch; piece-grain shuffle sums them; M-step
    renormalizes driver-side on the bounded vocab."""
    spark = wf.sparkSession
    logp = {p: math.log(v) for p, v in probs.items()}
    b_logp = spark.sparkContext.broadcast(logp)

    def _estep(batches):
        lp = b_logp.value
        for pdf in batches:
            acc: dict[str, float] = {}
            ll = 0.0
            for word, freq in zip(pdf["word"], pdf["freq"]):
                exp, z = _lattice_expected(str(word), float(freq), lp)
                if z != float("-inf"):
                    ll += float(freq) * z
                for piece, c in exp.items():
                    acc[piece] = acc.get(piece, 0.0) + c
            if acc:
                out = pd.DataFrame(
                    {"piece": list(acc), "c": list(acc.values())}
                )
                out["ll"] = 0.0
                out.loc[0, "ll"] = ll
                yield out
            elif ll:
                yield pd.DataFrame({"piece": [""], "c": [0.0], "ll": [ll]})

    partials = wf.mapInPandas(_estep, "piece string, c double, ll double")
    rows = (
        partials.groupBy("piece")
        .agg(F.sum("c").alias("c"), F.sum("ll").alias("ll"))
        .collect()
    )
    ll_total = sum(r.ll for r in rows)
    counts = {r.piece: r.c for r in rows if r.piece}
    total = sum(counts.values())
    new = {
        p: max(counts.get(p, 0.0) / total, PROB_FLOOR) for p in probs
    }
    z = sum(new.values())
    return {p: v / z for p, v in new.items()}, ll_total


def _prune(probs: dict[str, float], size: int) -> dict[str, float]:
    """Keep the ``size`` highest-probability pieces + all single chars,
    renormalized. (The full SentencePiece prune scores each piece by
    likelihood loss on removal; probability mass is its first-order
    proxy and keeps the implementation honest about being 'lite'.)"""
    singles = {p: v for p, v in probs.items() if len(p) == 1}
    multi = sorted(
        ((p, v) for p, v in probs.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[: max(0, size - len(singles))]
    kept = dict(multi)
    kept.update(singles)
    z = sum(kept.values())
    return {p: v / z for p, v in kept.items()}


#: training memo, keyed by corpus fingerprint (same recipe as _BPE_CACHE)
_UNIGRAM_CACHE: dict = {}


def clear_unigram_cache() -> None:
    _UNIGRAM_CACHE.clear()


def train_unigram(
    spark: SparkSession,
    sf_dir: str,
    vocab_size: int = VOCAB_SIZE,
    em_rounds: int = EM_ROUNDS,
) -> tuple[dict[str, float], list[float]]:
    """Fit the unigram LM: seed → ``em_rounds`` EM rounds → prune to
    ``vocab_size`` → one re-normalizing EM round. Returns (piece→prob,
    per-round corpus log-likelihoods under the entering probs — the
    monotonicity certificate pinned in tests)."""
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.max("doc_id").alias("hi"),
        F.sum(F.length("text")).alias("chars"),
    ).first()
    key = ((fp.n, fp.hi, fp.chars), vocab_size, em_rounds)
    hit = _UNIGRAM_CACHE.get(key)
    if hit is not None:
        return hit
    wf = _word_freq(spark, sf_dir).localCheckpoint(eager=True)
    probs = _top_seed(spark, sf_dir)
    lls: list[float] = []
    for _ in range(em_rounds):
        probs, ll = _em_round(wf, probs)
        lls.append(ll)
    probs = _prune(probs, vocab_size)
    probs, ll = _em_round(wf, probs)
    lls.append(ll)
    _UNIGRAM_CACHE[key] = (probs, lls)
    return probs, lls


def viterbi_segment(word: str, logp: dict[str, float]) -> list[str]:
    """Best segmentation under the trained log-probs. Deterministic
    tie-break: higher score, then fewer pieces, then lexicographically
    smaller piece list. Total for any word whose chars are in-vocab."""
    n = len(word)
    # best[e] = (score, n_pieces_neg? use (score, -pieces, seg) maximized
    best: list[tuple[float, int, tuple[str, ...]] | None] = [
        None
    ] * (n + 1)
    best[0] = (0.0, 0, ())
    for e in range(1, n + 1):
        cand = None
        for l in range(1, min(MAX_PIECE_LEN, e) + 1):
            s = e - l
            if best[s] is None:
                continue
            piece = word[s:e]
            lp = logp.get(piece)
            if lp is None:
                continue
            sc, np_, seg = best[s]
            # maximize score; fewer pieces; then lexicographically
            # SMALLER segmentation
            if cand is None:
                cand = (sc + lp, np_ + 1, seg + (piece,))
            else:
                csc, cnp, cseg = cand
                nsc, nnp, nseg = sc + lp, np_ + 1, seg + (piece,)
                if (nsc, -nnp) > (csc, -cnp) or (
                    (nsc, -nnp) == (csc, -cnp) and nseg < cseg
                ):
                    cand = (nsc, nnp, nseg)
        best[e] = cand
    if best[n] is None:
        raise ValueError(f"unsegmentable word {word!r}")
    return list(best[n][2])


def _word_segments(
    spark: SparkSession, sf_dir: str, probs: dict[str, float]
) -> DataFrame:
    """word → (pieces as '•'-joined string, n_pieces) on the distinct-
    word relation via one Arrow pass (Viterbi per word)."""
    logp = {p: math.log(v) for p, v in probs.items()}
    b = spark.sparkContext.broadcast(logp)
    wf = _word_freq(spark, sf_dir)

    def _seg(batches):
        lp = b.value
        for pdf in batches:
            segs = [viterbi_segment(str(w), lp) for w in pdf["word"]]
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "seg": ["•".join(s) for s in segs],
                    "n_pieces": [len(s) for s in segs],
                }
            )

    return wf.select("word").mapInPandas(
        _seg, "word string, seg string, n_pieces int"
    )


def unigram_apply(
    df: DataFrame, text_col: str, logp: dict[str, float]
) -> DataFrame:
    """Segment ``text_col`` with a trained unigram model (the
    ``bpe_apply`` counterpart; ``logp`` is piece→log-prob, the shape
    ``tokenizer_store.load_unigram_model`` returns): per word of the
    SHARED pre-tokenizer (``bpe.WORD_REGEX_SQL`` — the same word grain
    the model was trained on), Viterbi under the model. TOTAL on
    arbitrary input: NULL text maps to NULL pieces (matching
    ``bpe_apply``'s SQL null propagation), and a word containing
    characters the vocabulary never saw falls back to character
    pieces with the OOV characters kept as singleton pieces (the
    byte-fallback convention) instead of crashing the job. Returns
    ``df`` with a ``unigram_pieces`` array<string> column. One Arrow
    pass; the text stays doc-grain through the kernel."""
    import re

    spark = df.sparkSession
    b = spark.sparkContext.broadcast(logp)
    cols = df.columns
    word_re = re.compile(WORD_REGEX_SQL)

    def _seg(batches):
        lp = b.value
        cache: dict[str, list[str]] = {}

        def seg_word(w: str) -> list[str]:
            seg = cache.get(w)
            if seg is None:
                try:
                    seg = viterbi_segment(w, lp)
                except ValueError:  # OOV character: singleton fallback
                    seg = list(w)
                cache[w] = seg
            return seg

        for pdf in batches:
            out = []
            for text in pdf[text_col]:
                if text is None or (
                    isinstance(text, float) and math.isnan(text)
                ):
                    out.append(None)
                    continue
                pieces: list[str] = []
                for w in word_re.findall(str(text).lower()):
                    pieces.extend(seg_word(w))
                out.append(pieces)
            pdf = pdf.copy()
            pdf["unigram_pieces"] = out
            yield pdf

    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", unigram_pieces array<string>"
    return df.mapInPandas(_seg, out_schema).select(
        *cols, "unigram_pieces"
    )


def unigram_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry plan: the trained vocabulary — (piece, logprob,
    n_chars), deterministic order. Flat schema; rows-only (float EM has
    no SQL twin) with the pure-Python replay + EM-monotonicity gates in
    tests/test_unigram.py."""
    probs, _ = train_unigram(spark, sf_dir)
    rows = sorted(probs.items())
    return spark.createDataFrame(
        [(p, math.log(v), len(p)) for p, v in rows],
        "piece string, logprob double, n_chars int",
    )


def unigram_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry plan: per-document sizing under the trained unigram
    tokenizer — (doc_id, n_words, n_pieces, chars_per_piece). Same
    join-against-the-segmented-vocabulary shape as bpe_token_stats:
    apply is a broadcastable word-grain join, never a per-occurrence
    re-segmentation."""
    probs, _ = train_unigram(spark, sf_dir)
    seg = _word_segments(spark, sf_dir, probs)
    docs = load_table(spark, sf_dir, "documents")
    doc_words = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(WORD_REGEX_SPARK))
        ).alias("word"),
    )
    return (
        doc_words.join(seg, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_pieces").alias("n_pieces"),
            (
                F.sum(F.length("word")).cast("double")
                / F.sum("n_pieces")
            ).alias("chars_per_piece"),
        )
        .select("doc_id", "n_words", "n_pieces", "chars_per_piece")
    )


LIBRARY_QUERIES = {
    "unigram_vocab": unigram_vocab,
    "unigram_token_stats": unigram_token_stats,
}

#: no SQL oracles (float EM / lattice DP); the replay + monotonicity
#: gates live in tests/test_unigram.py
LIBRARY_ORACLE: dict[str, str] = {}
