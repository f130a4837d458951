"""WordPiece tokenizer (r13): the third trained-subword family, joining
BPE (plans/bpe.py) and unigram-LM (plans/unigram.py) — the BERT-style
likelihood-scored merge trainer plus the greedy longest-match-first
applier (Schuster & Nakajima 2012; Devlin et al. 2019 — public papers;
the HuggingFace `tokenizers` WordPiece trainer is the behavioral
reference for the ``##`` continuation-alphabet convention).

How it differs from BPE, and how that lands relationally:

- **Alphabet**: word-INITIAL characters vs ``##``-prefixed CONTINUATION
  characters are distinct symbols ("h", "##e", …) — a merge of
  ("h", "##e") produces "he"; of ("##l", "##l") produces "##ll". The
  wrapped-separator machinery from plans/bpe.py carries over unchanged
  (tokens never contain ``_``; ``#`` is not a corpus character under the
  ``[a-z]+`` pretokenizer), so ``_pair_counts`` is reused verbatim.
- **Selection score**: BPE merges the most FREQUENT adjacent pair;
  WordPiece merges the pair maximizing the unigram-LM likelihood gain
  ∝ count(ab) / (count(a)·count(b)). Floats would make the argmax
  engine-divergent, so the score is the QUANTIZED exact integer
  ``score_key = (c·2^WP_SCALE_BITS) div (c_lhs·c_rhs)`` — BIGINT
  arithmetic both engines compute bit-identically (the dyadic-bits
  convention used by doc_surprisal/DSIR, applied to a ratio). Ties (and
  ratios closer than 2^-20 relative, which quantize equal) break by
  (lhs, rhs) — deterministic, documented semantics. The key is computed
  in DECIMAL(38,0) on the Spark side (exact floor division via
  (a − a%b)/b — see train_wordpiece) and HUGEINT on the DuckDB side, so
  the envelope is ~10^38 on c·2^40 and c_a·c_b — no 2^63 ceiling; the
  quotient itself is ≤ 2^40 (c ≤ min(c_a, c_b)) and always fits BIGINT.
- **Apply**: NOT merge replay — BERT tokenization is greedy
  LONGEST-MATCH-FIRST against the trained vocabulary (alphabet + every
  merged token), with words longer than ``WP_MAX_WORD_CHARS`` mapping to
  ``[UNK]`` wholesale (BERT's ``max_input_chars_per_word``, here sized
  to the corpus). The Spark side segments at DISTINCT-WORD grain with an
  Arrow-batched kernel over the broadcast vocabulary (alphabet +
  n_merges entries — contract-bounded, like the unigram Viterbi); the
  DuckDB oracle replays the same walk as an unrolled CTE chain of
  ``WP_MAX_WORD_CHARS`` steps (each step consumes ≥1 character, so every
  admitted word finishes), longest match selected by a ROW_NUMBER over
  candidate piece lengths. No-match ``[UNK]`` cannot occur when applying
  to the training corpus (the alphabet is closed over it — every
  initial/continuation character comes from these very words); the
  kernel's no-match branch is pinned by a synthetic-vocab pytest gate
  instead.

Scale notes (100 TB): training cost = n_merges driver rounds × (one
pair-count + one token-count aggregation at DISTINCT-WORD grain — the
corpus-size-independent regime after the single word-count shuffle, the
plans/bpe.py story); driver traffic is ONE row per round. Apply is
distinct-word-grain with a broadcast vocab; the doc-stats join back to
the corpus is the same shuffle bpe_token_stats pays.

Reference scope note: the reference pipeline
(``/root/reference/data/etl.py``) has no tokenizer surface; this extends
the engine's LLM-data family (SURVEY.md §2.11 north-star scope).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.readers import load_table
from .bpe import WORD_REGEX_SQL, _pair_counts, _word_freq

#: merge rounds (the tiny synthetic vocabulary — 31 distinct words —
#: exhausts non-interacting pairs quickly; real corpora raise this the
#: same way bpe_train_1k does via the rich-vocab bench corpus)
WP_MERGES = 12
#: BERT's max_input_chars_per_word, sized to the corpus (max word length
#: in the synthetic tables is 8); ALSO the oracle's unroll depth — each
#: apply step consumes >= 1 char, so WP_MAX_WORD_CHARS steps finish
#: every admitted word
WP_MAX_WORD_CHARS = 8
#: score quantization (module docstring): score_key =
#: (c << WP_SCALE_BITS) div (c_lhs * c_rhs). 40 bits keeps the
#: likelihood ranking meaningful on corpora where denominators reach
#: 10^10+ (at 20 bits the keys saturated to single digits on the
#: high-entropy bench corpus, degenerating the argmax toward its
#: lexicographic tie-break)
WP_SCALE_BITS = 40
WP_SCALE = 1 << WP_SCALE_BITS
UNK = "[UNK]"

_WP_CACHE: dict = {}


def clear_wordpiece_cache() -> None:
    """Drop memoized trainings (bench cold-path measurement hook)."""
    _WP_CACHE.clear()


def _init_wp_seqs(word_freq: DataFrame) -> DataFrame:
    """word → wrapped-separator sequence over the WordPiece alphabet:
    first char bare, continuations ``##``-prefixed ("hello" →
    ``_h__##e__##l__##l__##o_``)."""
    return word_freq.select(
        "word",
        "freq",
        F.concat(
            F.lit("_"),
            F.substring("word", 1, 1),
            F.lit("_"),
            F.regexp_replace(
                F.expr("substring(word, 2)"), "(.)", "_##$1_"
            ),
        ).alias("seq"),
    )


def _tok_counts(seqs: DataFrame) -> DataFrame:
    """Token (unigram) occurrence counts over the current sequences,
    weighted by word frequency — the denominators of the WordPiece
    score."""
    return (
        seqs.select(
            "freq",
            F.explode(
                F.split(F.expr("trim(BOTH '_' FROM seq)"), "__")
            ).alias("tok"),
        )
        .groupBy("tok")
        .agg(F.sum("freq").alias("n"))
    )


def _merge_token(lhs: str, rhs: str) -> str:
    """The HuggingFace continuation-merge rule: 'h'+'##e' → 'he',
    '##l'+'##l' → '##ll'."""
    return lhs + (rhs[2:] if rhs.startswith("##") else rhs)


def train_wordpiece(
    spark: SparkSession,
    sf_dir: str,
    n_merges: int = WP_MERGES,
    batch_size: int = 1,
    admission: str = "prefix",
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Train ``n_merges`` WordPiece merges on the documents corpus.

    Returns ``(merges, seqs)`` where merges are (lhs, rhs, score_key)
    in training order. ``batch_size=1`` (default) is the classic
    sequential trainer — one driver round-trip per merge, bit-matched
    by the unrolled-CTE DuckDB oracle. ``batch_size=m`` is BATCHED
    selection, the scalable-vocab device from plans/bpe.py: per round
    admit the non-interacting prefix/subset of the score-sorted top-m
    (``bpe._admit_batch`` with the ##-stripping merge rule) and apply
    them as one chained-replace projection. Disjointness buys WordPiece
    MORE than it buys BPE: a merge only changes the counts of its own
    lhs/rhs/merged tokens, so every admitted pair's numerator AND both
    score denominators are provably unchanged by its batch predecessors
    — the admitted scores are the true scores at admission time. The
    only divergence from sequential training is ranking-order (a
    mid-batch-created or skipped pair outranking a later batch member),
    the same documented semantics as BPE's batched mode, with its own
    pure-Python replay oracle in tests/test_wordpiece.py.

    Memoized per (data fingerprint, n_merges, batch_size, admission)
    like plans/bpe.py's ``_BPE_CACHE``. Raises when the corpus exhausts
    adjacent pairs before ``n_merges`` rounds (the loud-failure
    convention of ``train_bpe``)."""
    from .bpe import _admit_batch

    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    docs = load_table(spark, sf_dir, "documents")
    fp_row = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.max("doc_id").alias("hi"),
        F.sum(F.length("text")).alias("chars"),
    ).first()
    key = ((fp_row.n, fp_row.hi, fp_row.chars), n_merges, batch_size, admission)
    hit = _WP_CACHE.get(key)
    if hit is not None:
        return hit
    from .bpe import _loop_confs, _loop_layout

    seqs = _loop_layout(
        _init_wp_seqs(_word_freq(spark, sf_dir)).localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str, int]] = []
    # Loop mechanics shared with bpe._train_rounds (r16): size-pinned
    # layout, AQE scoped off, LAZY per-round checkpoint (materializes
    # inside the next round's score job) — merge lists asserted
    # identical in the A/B. The token-count side of the score is
    # BROADCAST on purpose (guide §3.1): it is vocab-grain — bounded by
    # |alphabet| + 2·n_merges at ANY corpus scale — so the hint is
    # scale-safe and removes two shuffle exchanges per round.
    with _loop_confs(seqs):
        while len(merges) < n_merges:
            want = min(batch_size, n_merges - len(merges))
            pairs = _pair_counts(seqs)
            tc = _tok_counts(seqs)
            top = (
                pairs.join(
                    F.broadcast(
                        tc.select(
                            F.col("tok").alias("lhs"), F.col("n").alias("nl")
                        )
                    ),
                    "lhs",
                )
                .join(
                    F.broadcast(
                        tc.select(
                            F.col("tok").alias("rhs"), F.col("n").alias("nr")
                        )
                    ),
                    "rhs",
                )
                .select(
                    "lhs",
                    "rhs",
                    # exact floor division in DECIMAL(38,0): (a - a%b)/b is
                    # an exactly-divisible quotient (decimal %/- are exact;
                    # the final /b rounds an exact integer, i.e. not at
                    # all), so the BIGINT key matches Python's // and
                    # DuckDB's HUGEINT // bit-for-bit with no 2^63 ceiling
                    # on the numerator. Envelope: c·2^40 and c_l·c_r must
                    # fit 38 digits (~10^38) — any real corpus; the
                    # quotient itself is ≤ 2^40 (c ≤ min(c_l, c_r)).
                    F.expr(
                        f"CAST(((CAST(c AS DECIMAL(38,0)) * {WP_SCALE})"
                        f" - (CAST(c AS DECIMAL(38,0)) * {WP_SCALE})"
                        f" % (CAST(nl AS DECIMAL(38,0)) * nr))"
                        f" / (CAST(nl AS DECIMAL(38,0)) * nr) AS BIGINT)"
                    ).alias("score_key"),
                )
                .orderBy(F.desc("score_key"), F.asc("lhs"), F.asc("rhs"))
                .limit(want)
                .collect()
            )
            if not top:
                raise ValueError(
                    f"corpus exhausted adjacent pairs after {len(merges)} "
                    f"merges (requested {n_merges}); lower n_merges"
                )
            score_of = {(r.lhs, r.rhs): r.score_key for r in top}
            batch = _admit_batch(top, admission, merge=_merge_token)
            col = F.col("seq")
            for lhs, rhs in batch:
                col = F.replace(
                    col,
                    F.lit(f"_{lhs}__{rhs}_"),
                    F.lit(f"_{_merge_token(lhs, rhs)}_"),
                )
            seqs = seqs.withColumn("seq", col).localCheckpoint(
                eager=False
            )
            merges.extend(
                (lhs, rhs, score_of[(lhs, rhs)]) for lhs, rhs in batch
            )
    out = (merges, seqs)
    _WP_CACHE[key] = out
    return out


def _alphabet(spark: SparkSession, sf_dir: str) -> set[str]:
    """The initial symbol set (bare first chars + ## continuations) —
    derived driver-side from the distinct-word relation (bounded: ≤ 2×
    charset size rows collected)."""
    wf = _init_wp_seqs(_word_freq(spark, sf_dir))
    rows = (
        wf.select(
            F.explode(
                F.split(F.expr("trim(BOTH '_' FROM seq)"), "__")
            ).alias("tok")
        )
        .distinct()
        .collect()
    )
    return {r.tok for r in rows}


def wp_vocab(spark: SparkSession, sf_dir: str, n_merges: int = WP_MERGES) -> list[str]:
    """Trained vocabulary: alphabet + every merged token (nothing is
    ever removed — the HuggingFace convention)."""
    merges, _ = train_wordpiece(spark, sf_dir, n_merges)
    vocab = _alphabet(spark, sf_dir)
    for lhs, rhs, _score in merges:
        vocab.add(_merge_token(lhs, rhs))
    return sorted(vocab)


def segment_word(word: str, vocab: set[str], max_chars: int = WP_MAX_WORD_CHARS) -> list[str]:
    """Greedy longest-match-first WordPiece segmentation of one word —
    the BERT WordpieceTokenizer walk (public reference implementation in
    the BERT repo/HF tokenizers): longest vocab piece at each cursor,
    ``##`` lookups past position 0, whole-word [UNK] on overlength or
    no-match."""
    if len(word) > max_chars:
        return [UNK]
    out: list[str] = []
    pos = 0
    while pos < len(word):
        match = None
        for ln in range(len(word) - pos, 0, -1):
            cand = word[pos : pos + ln]
            tok = cand if pos == 0 else "##" + cand
            if tok in vocab:
                match = tok
                break
        if match is None:
            return [UNK]
        out.append(match)
        pos += len(match) - 2 if match.startswith("##") else len(match)
    return out


def _segmented(
    spark: SparkSession, sf_dir: str, n_merges: int = WP_MERGES
) -> DataFrame:
    """Distinct-word segmentation relation (word, freq, seg, n_tok,
    is_unk) — the Arrow-batched longest-match kernel over the broadcast
    vocabulary (alphabet + n_merges entries, contract-bounded)."""
    vocab = set(wp_vocab(spark, sf_dir, n_merges))

    @F.pandas_udf("string")
    def seg_udf(words: pd.Series) -> pd.Series:
        return words.map(
            lambda w: " ".join(segment_word(w, vocab))
        )

    wf = _word_freq(spark, sf_dir)
    return wf.select(
        "word",
        "freq",
        seg_udf("word").alias("seg"),
    ).select(
        "word",
        "freq",
        "seg",
        F.size(F.split("seg", " ")).cast("int").alias("n_tok"),
        (F.col("seg") == UNK).cast("int").alias("is_unk"),
    )


def wordpiece_merges(
    spark: SparkSession, sf_dir: str, n_merges: int = WP_MERGES
) -> DataFrame:
    """Registry plan: the trained merge table — (rank, lhs, rhs, merged,
    score_key). The DuckDB oracle REPLAYS training: an unrolled
    MATERIALIZED-CTE chain recomputing pair counts, token counts, and
    the quantized-likelihood argmax per round (the plans/bpe.py oracle
    pattern with the score join added), so the value hash proves the
    whole training trajectory, scores included."""
    merges, _ = train_wordpiece(spark, sf_dir, n_merges)
    rows = [
        (r, lhs, rhs, _merge_token(lhs, rhs), score)
        for r, (lhs, rhs, score) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "rank int, lhs string, rhs string, merged string, score_key long"
    ).orderBy("rank")


def wordpiece_segmented(
    spark: SparkSession, sf_dir: str, n_merges: int = WP_MERGES
) -> DataFrame:
    """Registry plan: every distinct corpus word with its WordPiece
    segmentation (space-joined vocab tokens), token count, and [UNK]
    flag — the trained tokenizer's full behavior surface at word grain.
    Oracle: training replay + an unrolled longest-match walk (module
    docstring)."""
    return _segmented(spark, sf_dir, n_merges).orderBy("word")


def wordpiece_token_stats(
    spark: SparkSession, sf_dir: str, n_merges: int = WP_MERGES
) -> DataFrame:
    """Registry plan: doc-grain WordPiece sizing — word count, wordpiece
    token count, [UNK]-word count, chars per token (the fertility number
    tokenizer choices are judged by). The bpe_token_stats shape with the
    longest-match segmentation substituted."""
    seg = _segmented(spark, sf_dir, n_merges)
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(
                F.lower("text"), F.lit(f"({WORD_REGEX_SQL})")
            )
        ).alias("word"),
    )
    return (
        words.join(seg, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_tok").cast("long").alias("n_wp_tokens"),
            F.sum("is_unk").cast("long").alias("n_unk_words"),
            (
                F.sum(F.length("word")).cast("double")
                / F.sum(F.when(F.col("is_unk") == 0, F.col("n_tok")).otherwise(F.lit(0)))
            ).alias("chars_per_token"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# DuckDB oracles: unrolled training replay + unrolled longest-match walk


def _wp_cte_chain(n_merges: int) -> str:
    """WITH-body replaying ``n_merges`` WordPiece rounds (the
    plans/bpe.py MATERIALIZED-chain pattern; see _bpe_cte_chain for why
    every s{r}/b{r} materializes)."""
    parts = [
        f"""w AS MATERIALIZED (
        SELECT word, COUNT(*) AS freq FROM (
            SELECT unnest(regexp_extract_all(lower(text), '{WORD_REGEX_SQL}')) AS word
            FROM documents
        ) GROUP BY 1
    ),
    s0 AS MATERIALIZED (
        SELECT word, freq,
               '_' || word[1] || '_' ||
                   regexp_replace(word[2:], '(.)', '_##\\1_', 'g') AS seq
        FROM w
    )"""
    ]
    for r in range(n_merges):
        parts.append(
            f"""p{r} AS (
        SELECT lhs, rhs, SUM(freq) AS c FROM (
            SELECT freq,
                   unnest(t[1:len(t)-1]) AS lhs,
                   unnest(t[2:len(t)]) AS rhs
            FROM (SELECT freq, string_split(trim(seq, '_'), '__') AS t FROM s{r})
        ) GROUP BY 1, 2
    ),
    u{r} AS (
        SELECT tok, SUM(freq) AS n FROM (
            SELECT freq, unnest(string_split(trim(seq, '_'), '__')) AS tok
            FROM s{r}
        ) GROUP BY 1
    ),
    b{r} AS MATERIALIZED (
        SELECT p.lhs, p.rhs,
               p.lhs || regexp_replace(p.rhs, '^##', '') AS merged,
               CAST((p.c::HUGEINT * {WP_SCALE})
                    // (ua.n::HUGEINT * ub.n) AS BIGINT) AS score_key
        FROM p{r} p
        JOIN u{r} ua ON ua.tok = p.lhs
        JOIN u{r} ub ON ub.tok = p.rhs
        ORDER BY score_key DESC, p.lhs, p.rhs LIMIT 1
    ),
    s{r + 1} AS MATERIALIZED (
        SELECT word, freq,
               replace(seq, '_' || lhs || '__' || rhs || '_',
                       '_' || merged || '_') AS seq
        FROM s{r} CROSS JOIN b{r}
    )"""
        )
    return ",\n    ".join(parts)


def _wp_merges_sql(n_merges: int) -> str:
    union = "\n        UNION ALL ".join(
        f"SELECT {r} AS rank, lhs, rhs, merged, score_key FROM b{r}"
        for r in range(n_merges)
    )
    return f"""
    WITH {_wp_cte_chain(n_merges)},
    merges AS (
        {union}
    )
    SELECT CAST(rank AS INT) AS rank, lhs, rhs, merged,
           CAST(score_key AS BIGINT) AS score_key
    FROM merges ORDER BY rank
    """


def _wp_apply_chain(n_merges: int, cap: int) -> str:
    """WITH-body fragments for the unrolled greedy longest-match walk
    over the trained vocabulary: a{j} holds every admitted word's cursor
    after j steps; each step consumes >= 1 char so a{cap} is final."""
    vocab_union = "\n            UNION ALL ".join(
        f"SELECT merged AS tok FROM b{r}" for r in range(n_merges)
    )
    parts = [
        f"""vocab AS MATERIALIZED (
        SELECT DISTINCT tok FROM (
            SELECT unnest(string_split(trim(seq, '_'), '__')) AS tok FROM s0
            UNION ALL
            {vocab_union}
        )
    ),
    vpieces AS MATERIALIZED (
        SELECT tok,
               CASE WHEN tok LIKE '##%' THEN tok[3:] ELSE tok END AS sub,
               (tok LIKE '##%') AS cont,
               length(CASE WHEN tok LIKE '##%' THEN tok[3:] ELSE tok END)
                   AS slen
        FROM vocab
    ),
    a0 AS MATERIALIZED (
        SELECT word, freq, length(word) AS wl,
               1 AS pos, '' AS seg, 0 AS n_tok
        FROM w WHERE length(word) <= {cap}
    )"""
    ]
    for j in range(1, cap + 1):
        parts.append(
            f"""a{j} AS MATERIALIZED (
        SELECT word, freq, wl, pos, seg, n_tok
        FROM a{j - 1} WHERE pos > wl
        UNION ALL
        SELECT f.word, f.freq, f.wl,
               f.pos + m.slen AS pos,
               f.seg || CASE WHEN f.seg = '' THEN '' ELSE ' ' END
                     || m.tok AS seg,
               f.n_tok + 1 AS n_tok
        FROM a{j - 1} f
        JOIN (
            SELECT c.word, c.pos, v.tok, v.slen,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.word, c.pos
                       ORDER BY v.slen DESC) AS rn
            FROM (SELECT word, pos, wl FROM a{j - 1} WHERE pos <= wl) c
            JOIN vpieces v
              ON v.cont = (c.pos > 1)
             AND substr(c.word, c.pos, v.slen) = v.sub
        ) m ON m.word = f.word AND m.pos = f.pos AND m.rn = 1
        WHERE f.pos <= f.wl
    )"""
        )
    parts.append(
        f"""seg_rel AS (
        SELECT word, freq, seg,
               CAST(n_tok AS INT) AS n_tok, 0 AS is_unk
        FROM a{cap}
        UNION ALL
        SELECT word, freq, '{UNK}', 1, 1
        FROM w WHERE length(word) > {cap}
    )"""
    )
    return ",\n    ".join(parts)


def _wp_segmented_sql(n_merges: int, cap: int) -> str:
    return f"""
    WITH {_wp_cte_chain(n_merges)},
    {_wp_apply_chain(n_merges, cap)}
    SELECT word, freq, seg, n_tok, CAST(is_unk AS INT) AS is_unk
    FROM seg_rel ORDER BY word
    """


def _wp_token_stats_sql(n_merges: int, cap: int) -> str:
    return f"""
    WITH {_wp_cte_chain(n_merges)},
    {_wp_apply_chain(n_merges, cap)},
    doc_words AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '{WORD_REGEX_SQL}')) AS word
        FROM documents
    )
    SELECT doc_id,
           COUNT(*) AS n_words,
           CAST(SUM(n_tok) AS BIGINT) AS n_wp_tokens,
           CAST(SUM(is_unk) AS BIGINT) AS n_unk_words,
           CAST(SUM(length(word)) AS DOUBLE)
               / SUM(CASE WHEN is_unk = 0 THEN n_tok ELSE 0 END)
               AS chars_per_token
    FROM doc_words JOIN seg_rel USING (word)
    GROUP BY 1 ORDER BY doc_id
    """


LIBRARY_QUERIES = {
    "wordpiece_merges": wordpiece_merges,
    "wordpiece_segmented": wordpiece_segmented,
    "wordpiece_token_stats": wordpiece_token_stats,
}

LIBRARY_ORACLE = {
    "wordpiece_merges": _wp_merges_sql(WP_MERGES),
    "wordpiece_segmented": _wp_segmented_sql(WP_MERGES, WP_MAX_WORD_CHARS),
    "wordpiece_token_stats": _wp_token_stats_sql(
        WP_MERGES, WP_MAX_WORD_CHARS
    ),
}


# ---------------------------------------------------------------------------
# cross-family tokenizer evaluation


def tokenizer_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry plan: the tokenizer DECISION relation — all three
    oracle-replayable trained families (char BPE, byte BPE, WordPiece)
    sized against the same corpus in one result: units consumed
    (words / GPT-2 pretokens), tokens emitted, total unit length
    (chars / bytes), and length-per-token — the fertility number a
    pipeline compares before committing to a tokenizer. (The unigram-LM
    family is float-EM and therefore not SQL-replayable; its fertility
    lives in the rows-only unigram_token_stats plan.)

    All three relations are weighted aggregations at DISTINCT-WORD /
    DISTINCT-PRETOKEN grain over memoized trainings — three tiny scans,
    one 3-row output. Oracle: the three unrolled training replays
    (plus the WordPiece longest-match walk) composed as parenthesized
    WITH-queries under one UNION ALL — the value hash proves all three
    trajectories at once."""
    from .bpe import train_bpe, train_bpe_bytes

    _, char_seqs = train_bpe(spark, sf_dir)
    _, byte_seqs = train_bpe_bytes(spark, sf_dir)
    wp_seg = _segmented(spark, sf_dir)

    ntok = F.size(
        F.split(F.expr("trim(BOTH '_' FROM seq)"), "__")
    )
    fams = (
        char_seqs.select(
            F.lit("bpe").alias("family"),
            "freq",
            F.length("word").alias("ulen"),
            ntok.alias("ntok"),
        )
        .unionAll(
            byte_seqs.select(
                F.lit("bpe_bytes").alias("family"),
                "freq",
                F.octet_length("word").alias("ulen"),
                ntok.alias("ntok"),
            )
        )
        .unionAll(
            wp_seg.select(
                F.lit("wordpiece").alias("family"),
                "freq",
                F.length("word").alias("ulen"),
                F.col("n_tok").alias("ntok"),
            )
        )
    )
    return (
        fams.groupBy("family")
        .agg(
            F.sum("freq").cast("long").alias("n_units"),
            F.sum(F.col("freq") * F.col("ntok"))
            .cast("long")
            .alias("n_tokens"),
            F.sum(F.col("freq") * F.col("ulen"))
            .cast("long")
            .alias("total_len"),
            (
                F.sum(F.col("freq") * F.col("ulen")).cast("double")
                / F.sum(F.col("freq") * F.col("ntok"))
            ).alias("len_per_token"),
        )
        .orderBy("family")
    )


def _tokenizer_compare_sql() -> str:
    from .bpe import (
        BYTE_N_MERGES,
        N_MERGES,
        _bpe_cte_chain,
        _byte_cte_chain,
    )

    agg = """
        SELECT '{fam}' AS family,
               CAST(SUM(freq) AS BIGINT) AS n_units,
               CAST(SUM(freq * ntok) AS BIGINT) AS n_tokens,
               CAST(SUM(freq * ulen) AS BIGINT) AS total_len,
               CAST(SUM(freq * ulen) AS DOUBLE) / SUM(freq * ntok)
                   AS len_per_token
        FROM {rel}
    """
    bpe_rel = f"""(
        SELECT freq, length(word) AS ulen,
               len(string_split(trim(seq, '_'), '__')) AS ntok
        FROM s{N_MERGES})"""
    byte_rel = f"""(
        SELECT freq, octet_length(encode(word)) AS ulen,
               len(string_split(trim(seq, '_'), '__')) AS ntok
        FROM s{BYTE_N_MERGES})"""
    wp_rel = """(
        SELECT freq, length(word) AS ulen, n_tok AS ntok
        FROM seg_rel)"""
    # the outer SELECT wrapper is load-bearing: DuckDB 1.0 rejects a
    # trailing ORDER BY directly on parenthesized WITH-query set
    # operands (internal binder error), but binds the same union fine
    # as a derived table
    return f"""
    SELECT family, n_units, n_tokens, total_len, len_per_token FROM (
    (WITH {_bpe_cte_chain(N_MERGES)}
     {agg.format(fam="bpe", rel=bpe_rel)})
    UNION ALL
    (WITH {_byte_cte_chain(BYTE_N_MERGES)}
     {agg.format(fam="bpe_bytes", rel=byte_rel)})
    UNION ALL
    (WITH {_wp_cte_chain(WP_MERGES)},
     {_wp_apply_chain(WP_MERGES, WP_MAX_WORD_CHARS)}
     {agg.format(fam="wordpiece", rel=wp_rel)})
    ) ORDER BY family
    """


LIBRARY_QUERIES["tokenizer_compare"] = tokenizer_compare
LIBRARY_ORACLE["tokenizer_compare"] = _tokenizer_compare_sql()


# ---------------------------------------------------------------------------
# serving surface: vocab ids + id-encoded documents (the bpe_vocab /
# bpe_encoded_docs pair under the WordPiece tokenizer)


def wordpiece_vocab_table(
    spark: SparkSession, sf_dir: str, n_merges: int = WP_MERGES
) -> DataFrame:
    """Registry plan: the WordPiece vocabulary as a serving artifact —
    every token the longest-match segmentation emits on the corpus,
    with a deterministic integer id (dense rank by token text), its
    frequency-weighted occurrence count, and its length (## prefix
    excluded from n_chars: the continuation marker is notation, not
    content). The bpe_vocab shape under the third tokenizer family.
    One pass over the distinct-word segmentation + a rank window on the
    vocab-bounded relation."""
    seg = _segmented(spark, sf_dir, n_merges)
    from pyspark.sql import Window

    tok = seg.select(
        "freq", F.explode(F.split("seg", " ")).alias("token")
    )
    counts = tok.groupBy("token").agg(
        F.sum("freq").alias("n_occurrences")
    )
    return counts.select(
        F.row_number()
        .over(Window.orderBy("token"))
        .cast("int")
        .alias("token_id"),
        "token",
        F.length(F.regexp_replace("token", "^##", ""))
        .cast("int")
        .alias("n_chars"),
        "n_occurrences",
    )


def wordpiece_encoded_docs_str(
    spark: SparkSession, sf_dir: str, n_merges: int = WP_MERGES
) -> DataFrame:
    """Registry plan: every document as its WordPiece id sequence
    (serialized ``_``-joined, the harness-flat convention of
    bpe_encoded_docs_str) + token count — the tensor-ready corpus under
    the trained tokenizer.

    Scale shape: ids are resolved at WORD grain (each distinct word's
    seg tokens join the vocab-bounded id table ONCE, reassembled into a
    per-word id string), then documents concatenate their words' id
    strings in position order — the token-grain join never touches the
    corpus, only the vocabulary."""
    seg = _segmented(spark, sf_dir, n_merges)
    vocab = wordpiece_vocab_table(spark, sf_dir, n_merges).select(
        "token", "token_id"
    )
    wtok = seg.select(
        "word",
        "n_tok",
        F.posexplode(F.split("seg", " ")).alias("tpos", "token"),
    )
    word_ids = (
        wtok.join(vocab, "token")
        .groupBy("word", "n_tok")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("tpos", "token_id"))
                    ),
                    lambda s: s.token_id.cast("string"),
                ),
                "_",
            ).alias("idseq")
        )
    )
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(
                F.lower("text"), F.lit(f"({WORD_REGEX_SQL})")
            )
        ).alias("wpos", "word"),
    )
    return (
        words.join(word_ids, "word")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("wpos", "idseq"))
                    ),
                    lambda s: s.idseq,
                ),
                "_",
            ).alias("token_ids_str"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
        .orderBy("doc_id")
    )


LIBRARY_QUERIES["wordpiece_vocab_table"] = wordpiece_vocab_table
LIBRARY_QUERIES["wordpiece_encoded_docs_str"] = wordpiece_encoded_docs_str


def _wp_vocab_sql(n_merges: int, cap: int) -> str:
    return f"""
    WITH {_wp_cte_chain(n_merges)},
    {_wp_apply_chain(n_merges, cap)},
    tok AS (
        SELECT freq, unnest(string_split(seg, ' ')) AS token
        FROM seg_rel
    ),
    counts AS (
        SELECT token, CAST(SUM(freq) AS BIGINT) AS n_occurrences
        FROM tok GROUP BY 1
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY token) AS INT) AS token_id,
           token,
           CAST(length(regexp_replace(token, '^##', '')) AS INT)
               AS n_chars,
           n_occurrences
    FROM counts
    """


def _wp_encoded_docs_sql(n_merges: int, cap: int) -> str:
    return f"""
    WITH {_wp_cte_chain(n_merges)},
    {_wp_apply_chain(n_merges, cap)},
    tok AS (
        SELECT freq, unnest(string_split(seg, ' ')) AS token
        FROM seg_rel
    ),
    idvocab AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY token) AS INT)
                   AS token_id, token
        FROM (SELECT token FROM tok GROUP BY 1)
    ),
    wtok AS (
        SELECT s.word, s.n_tok, g.i AS tpos,
               string_split(s.seg, ' ')[g.i] AS token
        FROM seg_rel s,
             LATERAL unnest(generate_series(
                 1, len(string_split(s.seg, ' ')))) AS g(i)
    ),
    word_ids AS (
        SELECT word, n_tok,
               string_agg(CAST(v.token_id AS VARCHAR), '_'
                          ORDER BY tpos) AS idseq
        FROM wtok JOIN idvocab v USING (token)
        GROUP BY word, n_tok
    ),
    doc_words AS (
        SELECT doc_id, g.i AS wpos,
               regexp_extract_all(lower(text), '{WORD_REGEX_SQL}')[g.i]
                   AS word
        FROM documents,
             LATERAL unnest(generate_series(
                 1, len(regexp_extract_all(lower(text),
                                           '{WORD_REGEX_SQL}'))))
                 AS g(i)
    )
    SELECT doc_id,
           string_agg(idseq, '_' ORDER BY wpos) AS token_ids_str,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM doc_words JOIN word_ids USING (word)
    GROUP BY doc_id ORDER BY doc_id
    """


LIBRARY_ORACLE["wordpiece_vocab_table"] = _wp_vocab_sql(
    WP_MERGES, WP_MAX_WORD_CHARS
)
LIBRARY_ORACLE["wordpiece_encoded_docs_str"] = _wp_encoded_docs_sql(
    WP_MERGES, WP_MAX_WORD_CHARS
)
