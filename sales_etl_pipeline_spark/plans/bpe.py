"""Trained subword (BPE-style) tokenizer as relational operators — the
LLM-pipeline text stage that upgrades whitespace/regex token counting
(``plans/llmdata.py:token_stats``) to a tokenizer TRAINED on the corpus
itself, the way production pipelines size documents in model tokens
rather than words.

The reference pipeline (a pandas ETL; see ``plans/parity.py`` for the
file:line parity map) has no tokenizer at all; this is an engine
extension in the spirit of SURVEY.md §2.11.

Algorithm (classic byte-pair encoding, Sennrich et al. 2016, trained at
WORD-DISTINCT grain):

1. Pre-tokenize: words = ``[a-z]+`` runs of the lowercased text. One
   corpus pass aggregates to the distinct-word frequency relation — the
   standard BPE trick that makes every later round independent of corpus
   size (pair counts are weighted by word frequency, so training cost is
   O(rounds × |vocab|), not O(rounds × corpus)).
2. Each word starts as its character sequence. Per merge round: count
   adjacent token pairs (weighted by word freq), pick the most frequent
   pair (ties broken lexicographically — deterministic across engines),
   and merge every left-to-right non-overlapping occurrence.
3. After R rounds the per-word token sequence IS the trained tokenizer's
   segmentation for in-corpus words; ``bpe_apply`` replays the merge list
   on unseen text.

Cross-engine exactness (what makes this oracle-checkable, unlike most
tokenizer implementations): a token sequence is carried as a STRING with
every token wrapped in ``_`` separators (``[h,e,ll]`` ⇄ ``"_h__e__ll_"``).
Applying merge (a,b) is then ``replace(seq, '_a__b_', '_ab_')`` — and
Spark, DuckDB, and Python all implement ``replace`` as left-to-right
non-overlapping scan that resumes AFTER the replacement, which is exactly
BPE's merge-application semantics. The doubled separator makes token
boundaries unambiguous: a pattern can never match mid-token (``_a__b_``
cannot match inside ``_xa__b_``) and adjacent matches never share a
separator (``_a__b__a__b_`` → ``_ab__ab_`` in one pass). Words are
``[a-z]+`` by construction, so ``_`` never collides with token text.
The DuckDB oracle replays training as an UNROLLED CTE chain (one
pair-count + argmax + replace round per merge), the same technique as
the k-means oracle in ``plans/llmdata.py``.

Scale shape: one corpus-grain shuffle (word counts), then R rounds over
the distinct-word relation — aggregate-grain shuffles only, no UDFs,
driver traffic = 1 row per round (the argmax pair, like the k-grain
centroid collects). The per-round re-tokenization is a single codegen'd
``replace`` projection; lineage is truncated per round with a LAZY
localCheckpoint (r16) that materializes inside the NEXT round's
pair-count job — one job per round — so round N's pair count never
replays rounds 0..N-1.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.readers import load_table
from .llmdata import _pin, release_plan_caches


@contextmanager
def _loop_confs(seqs: DataFrame):
    """Pinned-layout execution confs for a vocab-grain trainer round
    loop: AQE off AND ``spark.sql.shuffle.partitions`` = the loop
    relation's own (size-derived) partition count, both restored on
    exit.

    The loop's relations are BOUNDED (distinct words / vocab pieces —
    size known and small at any corpus scale, see ``_loop_layout``), and
    their partitioning is pinned explicitly, so adaptive re-planning has
    nothing to adapt; what it does add is one driver re-optimization
    barrier per shuffle stage per round, which at ~2 stages × R rounds
    is pure latency. AQE off alone is NOT enough: the loop's per-round
    aggregates then reduce into the session-wide shuffle partition
    count with no coalescing (measured 41 s vs 18 s on the 1k-merge A/B
    when the width stayed at the session default), hence the paired
    shuffle-partitions pin. Measured on the 1k-merge bench corpus
    (same-JVM interleaved A/B, r16): pinned-layout loop 18.4 s with AQE
    off vs 20.7 s with AQE on (and 22.2 s for the unpinned AQE
    baseline). Scoped: confs are restored on exit, so corpus-grain
    plans outside the loop keep AQE's coalescing/skew handling.

    NON-REENTRANT by design: the pin mutates session-global confs for
    the loop's duration, so any query planned CONCURRENTLY on the same
    SparkSession would silently run with AQE off and a narrow shuffle
    width. The bench and the verification driver are single-threaded —
    if concurrent drivers are ever supported, scope the pin to a cloned
    session instead."""
    spark = seqs.sparkSession
    nparts = seqs.rdd.getNumPartitions()
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(nparts))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)


def _loop_layout(seqs: DataFrame) -> DataFrame:
    """Pin the round-loop relation's partitioning to its SIZE (≈8k rows
    per partition, never wider than the cluster) instead of inheriting
    whatever the init aggregate produced.

    Why not leave it to AQE: the word relation is tiny relative to the
    advisory partition size, so AQE coalesces the init shuffle to ~1
    partition — and every per-round job (pair explode+count, the
    chained-replace re-tokenization) then runs single-task. Guide §2.2's
    rule cuts both ways: partitions sized to the data, which for a
    bounded vocab-grain relation means a HANDFUL of partitions on any
    cluster — this is a size-derived rule, not a local[32] constant.
    One extra round-robin shuffle of the checkpointed relation at init,
    amortized over every round."""
    spark = seqs.sparkSession
    par = spark.sparkContext.defaultParallelism
    nparts = max(2, min(par, seqs.count() // 8192 + 1))
    return seqs.repartition(nparts).localCheckpoint(eager=True)


#: default merge-rule count for the registry plans. The synthetic corpus
#: vocabulary supports far more (merges exhaust only when every word is a
#: single token); raise for real corpora.
N_MERGES = 24

#: pre-tokenizer: [a-z]+ runs of the lowercased text. Spark's
#: regexp_extract_all requires an explicit capture group; DuckDB's
#: extracts the whole match — same result.
WORD_REGEX_SPARK = "([a-z]+)"
WORD_REGEX_SQL = "[a-z]+"


def _word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-word frequency relation over the documents table."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(WORD_REGEX_SPARK))
        ).alias("word")
    )
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def _init_seqs(word_freq: DataFrame) -> DataFrame:
    """word → its character sequence in wrapped-separator encoding."""
    return word_freq.select(
        "word",
        "freq",
        F.regexp_replace("word", "(.)", "_$1_").alias("seq"),
    )


def _pair_counts(seqs: DataFrame) -> DataFrame:
    """Adjacent-token pair counts, weighted by word frequency."""
    t = seqs.select(
        "freq", F.split(F.expr("trim(BOTH '_' FROM seq)"), "__").alias("t")
    )
    pairs = t.select(
        "freq",
        F.explode(
            F.arrays_zip(
                F.expr("slice(t, 1, size(t)-1)").alias("lhs"),
                F.expr("slice(t, 2, size(t)-1)").alias("rhs"),
            )
        ).alias("p"),
    ).select("freq", F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
    return pairs.groupBy("lhs", "rhs").agg(F.sum("freq").alias("c"))


#: training memo: {(fingerprint, n_merges): (merges, seqs)} — the same
#: recipe as llmdata's _CENTROID_CACHE: keyed on a cheap DATA fingerprint
#: (count, max doc_id, total chars — one agg job), not just the path, so
#: a rewritten corpus at the same location retrains. The five registry/
#: library BPE plans all start with train_bpe; without the memo each one
#: re-pays the 2·n_merges sequential round-trip jobs.
_BPE_CACHE: dict = {}


def clear_bpe_cache() -> None:
    """Drop memoized trainings (bench cold-path measurement hook)."""
    _BPE_CACHE.clear()


def _admit_batch(
    top, admission: str = "prefix", merge=None
) -> list[tuple[str, str]]:
    """NON-INTERACTING selection from the count-sorted pair rows — the
    admission rule of batched merge selection, in two documented modes.

    A candidate interacts with the already-admitted set when it shares a
    token with an admitted pair, or touches a token an admitted merge
    CREATES (its concatenation) — either would let an earlier merge in
    the batch change the candidate's occurrence set between selection
    and application.

    ``admission="prefix"`` (default): stop at the FIRST interacting
    candidate. Closest to sequential ranking — skipping an interacting
    candidate and admitting later pairs could admit a pair that
    sequential training would never have ranked next.

    ``admission="subset"``: SKIP interacting candidates and keep
    scanning — the maximal greedy non-interacting subset of the top-m.
    Admitted pairs' pre-batch counts are still exact (disjointness), but
    a skipped higher-ranked pair is deferred to the next round while
    lower-ranked disjoint pairs land first, a further ranking divergence
    the prefix mode refuses. This is the scalable-vocab mode: measured
    on the high-entropy bench corpus it admits ~4.4× more merges per
    driver round (309 → 70 rounds for 1k merges), which is the
    difference between a tokenizer trainer bounded by driver round-trips
    and one bounded by corpus passes. Both modes carry their own
    pure-Python replay oracle in tests/test_bpe.py.

    Disjointness also makes the batch's ``replace`` applications commute
    (patterns ``_a__b_`` over pairwise-distinct tokens can neither
    overlap nor create each other's occurrences), so applying the batch
    as one chained projection is order-safe in either mode."""
    if admission not in ("prefix", "subset"):
        raise ValueError(f"unknown admission mode {admission!r}")
    # ``merge`` = how a pair concatenates (the created-token check);
    # plain concatenation for BPE, the ##-stripping rule for WordPiece
    # (plans/wordpiece.py reuses this admission with its own merge fn —
    # disjointness there ALSO freezes the score denominators, since a
    # merge only changes the counts of its own lhs/rhs/merged tokens)
    if merge is None:
        merge = lambda l, r: l + r  # noqa: E731
    admitted: list[tuple[str, str]] = []
    used: set[str] = set()
    for row in top:
        if admitted and (
            row.lhs in used or row.rhs in used or merge(row.lhs, row.rhs) in used
        ):
            if admission == "prefix":
                break
            continue
        admitted.append((row.lhs, row.rhs))
        used.update((row.lhs, row.rhs, merge(row.lhs, row.rhs)))
    return admitted


def train_bpe(
    spark: SparkSession,
    sf_dir: str,
    n_merges: int = N_MERGES,
    batch_size: int = 1,
    admission: str = "prefix",
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Train ``n_merges`` BPE merge rules on the documents corpus.

    Returns ``(merges, seqs)``: the ordered merge list and the
    distinct-word relation with each word's final token sequence (the
    trained tokenizer's segmentation of the training vocabulary).
    Memoized per (data fingerprint, n_merges, batch_size) — see
    ``_BPE_CACHE``; ``clear_bpe_cache()`` forces a cold retrain.

    ``batch_size=1`` (default) is classic sequential BPE — one driver
    round-trip per merge, bit-matched by the unrolled-CTE DuckDB oracle.
    ``batch_size=m`` is BATCHED merge selection, the standard scalable-
    BPE device that lifts the sequential path's merge-count ceiling
    (~10⁵ driver round-trips for a real 32k-vocab): per round, admit the
    maximal non-interacting PREFIX of the count-sorted pairs (see
    ``_admit_batch``) and apply them as ONE chained-replace projection +
    checkpoint, cutting driver rounds to ~``n_merges / m``. Admitted
    pairs' counts are provably unchanged by their batch predecessors
    (disjointness), so the only divergence from sequential training is
    when a pair CREATED mid-batch would have outranked a later batch
    member — rare on natural corpora (pinned batched ≡ sequential on the
    test corpora in tests/test_bpe.py) but real on degenerate ones
    (``abab…`` — the deviation-regime test constructs one); the batched
    path is therefore its own documented semantics with a pure-Python
    replay oracle, not a claim of sequential equivalence.

    ``admission`` selects the batched mode's conflict rule ("prefix" |
    "subset" — see ``_admit_batch``; ignored at batch_size=1 where no
    conflicts exist).

    Raises if the corpus exhausts mergeable pairs before ``n_merges``
    rounds — silently returning fewer rules would diverge from the
    fixed-depth SQL oracle, and a caller asking for more merges than the
    corpus supports should find out loudly.
    """
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    if admission not in ("prefix", "subset"):
        raise ValueError(f"unknown admission mode {admission!r}")
    docs = load_table(spark, sf_dir, "documents")
    fp_row = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.max("doc_id").alias("hi"),
        F.sum(F.length("text")).alias("chars"),
    ).first()
    key = ((fp_row.n, fp_row.hi, fp_row.chars), n_merges, batch_size, admission)
    hit = _BPE_CACHE.get(key)
    if hit is not None:
        return hit
    seqs = _loop_layout(
        _init_seqs(_word_freq(spark, sf_dir)).localCheckpoint(eager=True)
    )
    out = _train_rounds(seqs, n_merges, batch_size, admission)
    _BPE_CACHE[key] = out
    return out


def _train_rounds(
    seqs: DataFrame, n_merges: int, batch_size: int, admission: str
) -> tuple[list[tuple[str, str]], DataFrame]:
    """The init-agnostic training loop shared by the character-grain and
    byte-grain trainers: count pairs, admit a batch, apply as one
    chained-replace projection, checkpoint — see ``train_bpe`` for the
    full semantics. ``seqs`` must already be checkpointed (callers run
    it through ``_loop_layout``).

    r16 loop mechanics (semantics untouched — merge lists asserted
    identical across every variant in the A/B): execution confs are
    pinned for the loop (``_loop_confs``) and the per-round checkpoint
    is LAZY, so the
    re-tokenization materializes inside the NEXT round's pair-count job
    instead of as its own job — one job per round instead of two (the
    final round's checkpoint materializes at the caller's first
    action). Lazy won or tied every same-JVM A/B alternation."""
    merges: list[tuple[str, str]] = []
    with _loop_confs(seqs):
        while len(merges) < n_merges:
            want = min(batch_size, n_merges - len(merges))
            top = (
                _pair_counts(seqs)
                .orderBy(F.desc("c"), F.asc("lhs"), F.asc("rhs"))
                .limit(want)
                .collect()
            )
            if not top:
                raise ValueError(
                    f"corpus exhausted mergeable pairs after {len(merges)} "
                    f"merges (requested {n_merges}); lower n_merges"
                )
            batch = _admit_batch(top, admission)
            col = F.col("seq")
            for lhs, rhs in batch:
                col = F.replace(
                    col, F.lit(f"_{lhs}__{rhs}_"), F.lit(f"_{lhs}{rhs}_")
                )
            seqs = seqs.withColumn("seq", col).localCheckpoint(eager=False)
            merges.extend(batch)
    return merges, seqs


# ---------------------------------------------------------------------------
# byte-level pretokenization (VERDICT r11 item 4): open-vocabulary BPE

#: GPT-2-style pretokenizer (Radford et al. 2019 — public), LOOKAHEAD-FREE
#: so one pattern runs identically in java.util.regex (Spark), RE2
#: (DuckDB) and Python re (the replay oracle) — all three probed equal on
#: contractions, mixed case, digits, punctuation runs, multi-space runs
#: and non-ASCII. Divergence from GPT-2 proper (documented): RE2 has no
#: lookahead, so the `\s+(?!\S)` trailing-space rule is dropped — a
#: whitespace run before a word is ONE `\s+` pretoken instead of
#: splitting its last space onto the word. ASCII classes on purpose:
#: `\p{L}` case-folding differs across engines; non-ASCII letters land in
#: the punctuation-class alternative, which is lossless (bytes carry
#: them) just less linguistically grouped.
BYTE_PRETOK_SQL = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+|\s+"
#: Spark's regexp_extract_all needs one explicit capture group
BYTE_PRETOK_SPARK = "(" + BYTE_PRETOK_SQL + ")"

#: default merge budget for the byte-level registry plans (same as the
#: char-grain N_MERGES: each oracle CTE round costs the same)
BYTE_N_MERGES = 24


def _byte_pretoken_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-PRETOKEN frequency relation — the byte-level analogue of
    ``_word_freq``. No lowercasing (open vocabulary keeps case; the
    bytes are the alphabet, so nothing needs normalizing away)."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(BYTE_PRETOK_SPARK))
        ).alias("word")
    )
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def _byte_seq_expr(col):
    """UTF-8 bytes of ``col`` as a wrapped-separator sequence of 2-hex
    symbols: 'He' → '_48__65_'. The byte-FALLBACK alphabet: every
    possible pretoken — any case, digits, punctuation, emoji — encodes
    to [0-9a-f] symbols, so the wrapped-separator machinery (which needs
    token text free of '_') carries an OPEN vocabulary; the char-grain
    trainer's [a-z]+ assumption disappears."""
    return F.regexp_replace(
        F.lower(F.hex(F.encode(col, "UTF-8"))), "(..)", "_$1_"
    )


def _init_byte_seqs(word_freq: DataFrame) -> DataFrame:
    return word_freq.select(
        "word", "freq", _byte_seq_expr(F.col("word")).alias("seq")
    )


def train_bpe_bytes(
    spark: SparkSession,
    sf_dir: str,
    n_merges: int = BYTE_N_MERGES,
    batch_size: int = 1,
    admission: str = "prefix",
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Byte-level BPE: GPT-2-style pretokens, UTF-8 bytes (as 2-hex
    symbols) as the initial alphabet, then exactly the ``train_bpe``
    loop — same pair counts, same admission modes, same chained-replace
    application, same memo/exhaustion contract. Merge rules are hex
    strings ('68','65')→'6865'; ``bpe_apply_bytes`` replays them on
    unseen text and decodes surviving symbols back to bytes. Sequential
    mode is bit-matched by the unrolled-CTE DuckDB oracle
    (``_byte_token_stats_sql``) and by the pure-Python replayer in
    tests/test_bpe.py."""
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    if admission not in ("prefix", "subset"):
        raise ValueError(f"unknown admission mode {admission!r}")
    docs = load_table(spark, sf_dir, "documents")
    fp_row = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.max("doc_id").alias("hi"),
        F.sum(F.length("text")).alias("chars"),
    ).first()
    key = (
        "bytes",
        (fp_row.n, fp_row.hi, fp_row.chars),
        n_merges,
        batch_size,
        admission,
    )
    hit = _BPE_CACHE.get(key)
    if hit is not None:
        return hit
    seqs = _loop_layout(
        _init_byte_seqs(
            _byte_pretoken_freq(spark, sf_dir)
        ).localCheckpoint(eager=True)
    )
    out = _train_rounds(seqs, n_merges, batch_size, admission)
    _BPE_CACHE[key] = out
    return out


def bpe_apply_bytes(df: DataFrame, text_col: str, merges) -> DataFrame:
    """Segment ``text_col`` under a trained byte-level merge list —
    works on ANY text, seen or unseen (the open-vocabulary property:
    unseen bytes fall back to single-byte tokens). Returns ``df`` with
    ``byte_tokens`` (array<string> of hex-symbol tokens, reading order).
    Same JVM-only chained-replace replay as ``bpe_apply``."""
    words = F.regexp_extract_all(F.col(text_col), F.lit(BYTE_PRETOK_SPARK))
    per_word = F.transform(
        words,
        lambda w: F.split(
            F.btrim(_replay_merges(_byte_seq_expr(w), merges), F.lit("_")),
            "__",
        ),
    )
    return df.withColumn("byte_tokens", F.flatten(per_word))


def bpe_byte_token_stats(
    spark: SparkSession, sf_dir: str, n_merges: int = BYTE_N_MERGES
) -> DataFrame:
    """Registry plan: document sizing under the trained BYTE-LEVEL
    tokenizer — per doc: pretoken count, byte-BPE token count, and mean
    BYTES per token (the byte-level compression ratio, the open-vocab
    counterpart of ``bpe_token_stats``'s chars_per_token). Same
    join-against-the-trained-segmentation shape: no re-replay, one
    broadcast-sized trained relation, doc-grain aggregate."""
    _, seqs = train_bpe_bytes(spark, sf_dir, n_merges)
    wtok = seqs.select(
        "word",
        F.size(
            F.split(F.expr("trim(BOTH '_' FROM seq)"), "__")
        ).alias("n_tok"),
        F.octet_length("word").cast("int").alias("n_bytes"),
    )
    docs = load_table(spark, sf_dir, "documents")
    doc_words = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(BYTE_PRETOK_SPARK))
        ).alias("word"),
    )
    return (
        doc_words.join(wtok, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_pretokens"),
            F.sum("n_tok").alias("n_byte_tokens"),
            (
                F.sum("n_bytes").cast("double") / F.sum("n_tok")
            ).alias("bytes_per_token"),
        )
        .select(
            "doc_id", "n_pretokens", "n_byte_tokens", "bytes_per_token"
        )
    )


def bpe_byte_merges(
    spark: SparkSession, sf_dir: str, n_merges: int = BYTE_N_MERGES
) -> DataFrame:
    """The trained byte-level merge table (hex-symbol rules) — same
    artifact shape as ``bpe_merges``."""
    merges, _ = train_bpe_bytes(spark, sf_dir, n_merges)
    return spark.createDataFrame(merge_table_rows(merges), MERGE_TABLE_SCHEMA)


def _replay_merges(seq, merges: list[tuple[str, str]]):
    """Apply a trained merge list to a wrapped-separator sequence column."""
    for lhs, rhs in merges:
        seq = F.replace(seq, F.lit(f"_{lhs}__{rhs}_"), F.lit(f"_{lhs}{rhs}_"))
    return seq


def bpe_apply(df: DataFrame, text_col: str, merges: list[tuple[str, str]]):
    """Segment ``text_col`` with a trained merge list: per ``[a-z]+`` word,
    replay the merges in training order. Returns ``df`` with a
    ``bpe_tokens`` array<string> column (tokens in reading order; merges
    are word-internal, so tokens never cross word boundaries).

    The replay is ``len(merges)`` chained ``replace`` expressions inside
    a per-word ``transform`` lambda — all JVM-side, no UDFs — and applies
    to UNSEEN words too (they segment under the same greedy-by-merge-rank
    semantics as at training time)."""
    words = F.regexp_extract_all(F.lower(text_col), F.lit(WORD_REGEX_SPARK))
    per_word = F.transform(
        words,
        lambda w: F.split(
            F.btrim(
                _replay_merges(F.regexp_replace(w, "(.)", "_$1_"), merges),
                F.lit("_"),
            ),
            "__",
        ),
    )
    return df.withColumn("bpe_tokens", F.flatten(per_word))


#: the merge-table artifact shape — shared by the bpe_merges plan and
#: the tokenizer model registry (operators/tokenizer_store.py) so the
#: stored model can never drift from the registry plan of the same name
MERGE_TABLE_SCHEMA = "rank int, lhs string, rhs string, merged string"


def merge_table_rows(merges: list[tuple[str, str]]) -> list[tuple]:
    return [(i, l, r, l + r) for i, (l, r) in enumerate(merges)]


def bpe_merges(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> DataFrame:
    """Registry plan: the trained merge table — ``(rank, lhs, rhs,
    merged)``, one row per merge rule in training order. The model
    artifact a downstream tokenizer ships."""
    merges, _ = train_bpe(spark, sf_dir, n_merges)
    return spark.createDataFrame(merge_table_rows(merges), MERGE_TABLE_SCHEMA)


def bpe_token_stats(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> DataFrame:
    """Registry plan: document sizing under the TRAINED tokenizer —
    per doc: word count, BPE token count, and mean chars per BPE token
    (the compression the tokenizer achieves; the number a training
    pipeline budgets context windows with).

    Application to the training corpus is a JOIN against the trained
    word→segmentation relation (no re-replay): explode the doc's words,
    look up each word's token count, aggregate at doc grain."""
    _, seqs = train_bpe(spark, sf_dir, n_merges)
    wtok = seqs.select(
        "word",
        F.size(F.split(F.expr("trim(BOTH '_' FROM seq)"), "__")).alias("n_tok"),
        F.length("word").alias("n_chars"),
    )
    docs = load_table(spark, sf_dir, "documents")
    doc_words = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(WORD_REGEX_SPARK))
        ).alias("word"),
    )
    return (
        doc_words.join(wtok, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_tok").alias("n_bpe_tokens"),
            (
                F.sum("n_chars").cast("double") / F.sum("n_tok")
            ).alias("chars_per_token"),
        )
        .select("doc_id", "n_words", "n_bpe_tokens", "chars_per_token")
    )


# ---------------------------------------------------------------------------
# DuckDB oracles: training replayed as an unrolled CTE chain


def _bpe_cte_chain(n_merges: int) -> str:
    """The WITH-body replaying ``n_merges`` training rounds: s{r} is the
    word→sequence relation entering round r, b{r} the round's best pair.

    Every s{r}/b{r} is ``AS MATERIALIZED``: each round references s{r}
    twice (the pair count and the next round's replace), so letting the
    planner INLINE the chain duplicates the subtree per reference —
     2^n_merges copies of the base scan (measured: "too many open files"
    at n=24). Materializing pins each round to one evaluation, which is
    also exactly how the Spark side executes (localCheckpoint per round).
    """
    return _cte_chain_from(
        n_merges,
        f"""w AS MATERIALIZED (
        SELECT word, COUNT(*) AS freq FROM (
            SELECT unnest(regexp_extract_all(lower(text), '{WORD_REGEX_SQL}')) AS word
            FROM documents
        ) GROUP BY 1
    ),
    s0 AS MATERIALIZED (
        SELECT word, freq, regexp_replace(word, '(.)', '_\\1_', 'g') AS seq
        FROM w
    )""",
    )


def _byte_cte_chain(n_merges: int) -> str:
    """Byte-level twin of ``_bpe_cte_chain``: GPT-2-style pretokens (the
    SQL literal escapes the pattern's apostrophe), UTF-8-bytes-as-hex
    initial sequences. The merge rounds are identical — hex symbols are
    [0-9a-f]+, so the wrapped-separator replace semantics carry over
    unchanged."""
    pat = BYTE_PRETOK_SQL.replace("'", "''")
    return _cte_chain_from(
        n_merges,
        f"""w AS MATERIALIZED (
        SELECT word, COUNT(*) AS freq FROM (
            SELECT unnest(regexp_extract_all(text, '{pat}')) AS word
            FROM documents
        ) GROUP BY 1
    ),
    s0 AS MATERIALIZED (
        SELECT word, freq,
               regexp_replace(lower(hex(encode(word))), '(..)', '_\\1_', 'g')
                   AS seq
        FROM w
    )""",
    )


def _cte_chain_from(n_merges: int, base: str) -> str:
    parts = [base]
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
    b{r} AS MATERIALIZED (
        SELECT lhs, rhs FROM p{r} ORDER BY c DESC, lhs, rhs LIMIT 1
    ),
    s{r + 1} AS MATERIALIZED (
        SELECT word, freq,
               replace(seq, '_' || lhs || '__' || rhs || '_',
                       '_' || lhs || rhs || '_') AS seq
        FROM s{r} CROSS JOIN b{r}
    )"""
        )
    return ",\n    ".join(parts)


def _merges_sql(n_merges: int) -> str:
    union = "\n        UNION ALL ".join(
        f"SELECT {r} AS rank, lhs, rhs FROM b{r}" for r in range(n_merges)
    )
    return f"""
    WITH {_bpe_cte_chain(n_merges)},
    merges AS (
        {union}
    )
    SELECT rank, lhs, rhs, lhs || rhs AS merged FROM merges
    """


def _token_stats_sql(n_merges: int) -> str:
    return f"""
    WITH {_bpe_cte_chain(n_merges)},
    wtok AS (
        SELECT word,
               CAST(len(string_split(trim(seq, '_'), '__')) AS INTEGER) AS n_tok,
               CAST(length(word) AS INTEGER) AS n_chars
        FROM s{n_merges}
    ),
    doc_words AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '{WORD_REGEX_SQL}')) AS word
        FROM documents
    )
    SELECT doc_id,
           COUNT(*) AS n_words,
           CAST(SUM(n_tok) AS BIGINT) AS n_bpe_tokens,
           CAST(SUM(n_chars) AS DOUBLE) / SUM(n_tok) AS chars_per_token
    FROM doc_words JOIN wtok USING (word)
    GROUP BY 1
    """


def _byte_token_stats_sql(n_merges: int) -> str:
    pat = BYTE_PRETOK_SQL.replace("'", "''")
    return f"""
    WITH {_byte_cte_chain(n_merges)},
    wtok AS (
        SELECT word,
               CAST(len(string_split(trim(seq, '_'), '__')) AS INTEGER) AS n_tok,
               CAST(octet_length(encode(word)) AS INTEGER) AS n_bytes
        FROM s{n_merges}
    ),
    doc_words AS (
        SELECT doc_id,
               unnest(regexp_extract_all(text, '{pat}')) AS word
        FROM documents
    )
    SELECT doc_id,
           COUNT(*) AS n_pretokens,
           CAST(SUM(n_tok) AS BIGINT) AS n_byte_tokens,
           CAST(SUM(n_bytes) AS DOUBLE) / SUM(n_tok) AS bytes_per_token
    FROM doc_words JOIN wtok USING (word)
    GROUP BY 1
    """


def _byte_merges_sql(n_merges: int) -> str:
    union = "\n        UNION ALL ".join(
        f"SELECT {r} AS rank, lhs, rhs FROM b{r}" for r in range(n_merges)
    )
    return f"""
    WITH {_byte_cte_chain(n_merges)},
    merges AS (
        {union}
    )
    SELECT rank, lhs, rhs, lhs || rhs AS merged FROM merges
    """


def bpe_vocab(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> DataFrame:
    """The trained vocabulary: every token the tokenizer can emit on the
    training corpus — with a deterministic integer id (dense rank by
    token text), the corpus frequency under the final segmentation
    (word-frequency-weighted), and the token length. This is the second
    model artifact a tokenizer ships (the merge table is the first);
    ids are what `bpe_encoded_docs` encodes with.

    Scale shape: one pass over the distinct-word seq relation (explode
    to token grain, weight by freq), then a vocab-grain rank window —
    vocabulary size is bounded by |alphabet| + n_merges, so the window
    is on a tiny relation."""
    _, seqs = train_bpe(spark, sf_dir, n_merges)
    from pyspark.sql import Window

    tok = seqs.select(
        "freq",
        F.explode(
            F.split(F.expr("trim(BOTH '_' FROM seq)"), "__")
        ).alias("token"),
    )
    counts = tok.groupBy("token").agg(F.sum("freq").alias("n_occurrences"))
    return counts.select(
        F.row_number()
        .over(Window.orderBy("token"))
        .cast("int")
        .alias("token_id"),
        "token",
        F.length("token").cast("int").alias("n_chars"),
        "n_occurrences",
    )


def bpe_encoded_docs(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> DataFrame:
    """Documents ENCODED to token-id sequences — the artifact an LLM
    training pipeline actually consumes (feed `sequence_packing` with
    these ids instead of word counts and you have the tokenized corpus).
    Returns (doc_id, token_ids array<int>, n_tokens).

    Shape: the per-word token-id array is built ONCE on the distinct-word
    relation — token→id lookup is a BROADCAST JOIN against the bounded
    vocab relation (|alphabet| + n_merges rows; a literal create_map
    would embed the whole vocabulary in the plan tree and grow analyzer
    time with merge count, the plan-bloat class VERDICT r9 item 8 names
    — and the batched trainer now makes 1k+ vocabularies real), with a
    word-grain positional reassembly; documents then posexplode their
    words in order, join the word→ids relation, and reassemble with
    array_sort(collect_list(struct(pos, ids))) + flatten — the same
    positional-reassembly pattern as dedup_spans, shuffle at doc grain.
    No driver round-trip anywhere: the vocab stays a relation end to
    end. Encoding is invertible: ids → vocab tokens → concat reproduces
    the pre-tokenized text (pinned in tests/test_bpe.py)."""
    _, seqs = train_bpe(spark, sf_dir, n_merges)
    vocab_rel = F.broadcast(
        bpe_vocab(spark, sf_dir, n_merges).select("token", "token_id")
    )
    word_tok = seqs.select(
        "word",
        F.posexplode(
            F.split(F.expr("trim(BOTH '_' FROM seq)"), "__")
        ).alias("tpos", "token"),
    )
    word_ids = (
        word_tok.join(vocab_rel, "token")
        .groupBy("word")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("tpos", "token_id"))),
                lambda s: s.token_id,
            ).alias("ids")
        )
    )
    docs = load_table(spark, sf_dir, "documents")
    doc_words = docs.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(F.lower("text"), F.lit(WORD_REGEX_SPARK))
        ).alias("pos", "word"),
    )
    return (
        doc_words.join(word_ids, "word")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "ids"))
                    ),
                    lambda s: s.ids,
                )
            ).alias("token_ids")
        )
        .select(
            "doc_id",
            "token_ids",
            F.size("token_ids").alias("n_tokens"),
        )
    )


def _ids_as_str(col):
    """array<int> → '_'-joined string — the DRIVER-HARNESS serialization.

    The driver's CORRECTNESS canonicalizer goes through pandas
    ``sort_values``, which cannot hash a numpy array cell
    (CORRECTNESS_r10: ``bpe_encoded_docs``/``bpe_packed_windows`` ERR
    ``unhashable type: 'numpy.ndarray'``). Driver-facing plans therefore
    serialize array columns to a deterministic scalar; the array-typed
    originals stay at the library tier where tests/oracle_harness.py
    canonicalizes lists to tuples. tests/test_plans.py pins that the
    driver registry carries no array/map/struct top-level columns."""
    return F.array_join(F.transform(col, lambda x: x.cast("string")), "_")


def bpe_encoded_docs_str(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> DataFrame:
    """Driver-registry twin of ``bpe_encoded_docs``: identical plan, with
    the token-id array serialized via ``_ids_as_str`` (oracle:
    ``array_to_string``). Everything upstream — training, vocab join,
    positional reassembly — is the shared ``bpe_encoded_docs`` plan."""
    enc = bpe_encoded_docs(spark, sf_dir, n_merges)
    return enc.select(
        "doc_id",
        _ids_as_str(F.col("token_ids")).alias("token_ids_str"),
        "n_tokens",
    )


def _encoded_docs_str_sql(n_merges: int) -> str:
    return f"""
    SELECT doc_id,
           array_to_string(token_ids, '_') AS token_ids_str,
           n_tokens
    FROM ({_encoded_docs_sql(n_merges)})
    """


#: context-window width for the id-level packer
PACK_WINDOW = 64

#: block width for the two-phase prefix sum (same trick as
#: plans/curation.sequence_packing — a per-source running sum is a
#: single-hot-partition scale killer; blocks bound every window
#: partition)
PACK_BLOCK = 256


def bpe_packed_windows(
    spark: SparkSession,
    sf_dir: str,
    n_merges: int = N_MERGES,
    window: int = PACK_WINDOW,
) -> DataFrame:
    """The END of the tokenizer pipeline: documents → BPE ids → packed
    fixed-size context windows, materialized as the actual id arrays a
    pretraining loop consumes (concat-and-chunk per source, GPT-style).
    `sequence_packing` (plans/curation.py) maps SPANS to window ids from
    token counts; this emits the window CONTENTS under the trained
    tokenizer. Returns (source, window_id, token_ids, n_tokens) — every
    window full at ``window`` ids except each source's tail.

    Scale shape: per-doc start offsets via the same two-phase blocked
    prefix sum as sequence_packing (no per-source single-partition
    window); then ONE token-grain posexplode with global position =
    offset + pos, window = gpos div window, and a (source, window)-grain
    positional reassembly (array_sort(collect_list(struct))) — shuffle
    at window grain, ~window× smaller than the token relation."""
    from pyspark.sql import Window

    enc = bpe_encoded_docs(spark, sf_dir, n_merges)
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    sized = enc.join(src, "doc_id").withColumn(
        "blk", F.expr(f"doc_id div {PACK_BLOCK}")
    )
    w_local = (
        Window.partitionBy("source", "blk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    release_plan_caches()
    local = _pin(
        sized.withColumn("lcum", F.sum("n_tokens").over(w_local))
    )
    w_blocks = (
        Window.partitionBy("source")
        .orderBy("blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        local.groupBy("source", "blk")
        .agg(F.sum("n_tokens").alias("blk_total"))
        .withColumn(
            "blk_offset",
            F.coalesce(
                F.sum("blk_total").over(w_blocks), F.lit(0).cast("long")
            ),
        )
        .select("source", "blk", "blk_offset")
    )
    with_off = local.join(offsets, ["source", "blk"]).withColumn(
        "start", F.col("blk_offset") + F.col("lcum") - F.col("n_tokens")
    )
    tok = with_off.select(
        "source",
        "start",
        F.posexplode("token_ids").alias("pos", "token_id"),
    ).select(
        "source",
        (F.col("start") + F.col("pos")).alias("gpos"),
        "token_id",
    )
    return (
        tok.withColumn("window_id", F.expr(f"gpos div {window}").cast("int"))
        .groupBy("source", "window_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("gpos", "token_id"))
                ),
                lambda s: s.token_id,
            ).alias("token_ids")
        )
        .select(
            "source",
            "window_id",
            "token_ids",
            F.size("token_ids").alias("n_tokens"),
        )
    )


def _packed_windows_sql(n_merges: int, window: int) -> str:
    return f"""
    WITH {_bpe_cte_chain(n_merges)},
    tok0 AS (
        SELECT freq, unnest(string_split(trim(seq, '_'), '__')) AS token
        FROM s{n_merges}
    ),
    vocab AS (
        SELECT CAST(row_number() OVER (ORDER BY token) AS INTEGER) AS token_id,
               token
        FROM (SELECT DISTINCT token FROM tok0)
    ),
    word_toks AS (
        SELECT word, string_split(trim(seq, '_'), '__') AS toks
        FROM s{n_merges}
    ),
    doc_words AS (
        SELECT doc_id, i AS pos, words[i] AS word
        FROM (
            SELECT doc_id,
                   regexp_extract_all(lower(text), '{WORD_REGEX_SQL}') AS words
            FROM documents
        ), LATERAL unnest(generate_series(1, len(words))) AS g(i)
    ),
    doc_toks AS (
        SELECT dw.doc_id, dw.pos, j AS tok_pos, wt.toks[j] AS token
        FROM doc_words dw
        JOIN word_toks wt USING (word),
        LATERAL unnest(generate_series(1, len(wt.toks))) AS h(j)
    ),
    doc_ids AS (
        SELECT dt.doc_id, dt.pos, dt.tok_pos, v.token_id
        FROM doc_toks dt JOIN vocab v ON v.token = dt.token
    ),
    enc AS (
        SELECT doc_id,
               list(token_id ORDER BY pos, tok_pos) AS token_ids,
               COUNT(*) AS n_tokens
        FROM doc_ids GROUP BY 1
    ),
    sized AS (
        SELECT d.source, e.doc_id, e.token_ids,
               SUM(e.n_tokens) OVER (
                   PARTITION BY d.source ORDER BY e.doc_id
                   ROWS UNBOUNDED PRECEDING
               ) - e.n_tokens AS start
        FROM enc e JOIN documents d USING (doc_id)
    ),
    gtok AS (
        SELECT source,
               start + j - 1 AS gpos,
               token_ids[j] AS token_id
        FROM sized, LATERAL unnest(generate_series(1, len(token_ids))) AS g(j)
    )
    SELECT source,
           CAST(gpos // {window} AS INTEGER) AS window_id,
           list(token_id ORDER BY gpos) AS token_ids,
           CAST(COUNT(*) AS INTEGER) AS n_tokens
    FROM gtok
    GROUP BY 1, 2
    """


def _vocab_sql(n_merges: int) -> str:
    return f"""
    WITH {_bpe_cte_chain(n_merges)},
    tok AS (
        SELECT freq, unnest(string_split(trim(seq, '_'), '__')) AS token
        FROM s{n_merges}
    ),
    counts AS (
        SELECT token, CAST(SUM(freq) AS BIGINT) AS n_occurrences
        FROM tok GROUP BY 1
    )
    SELECT CAST(row_number() OVER (ORDER BY token) AS INTEGER) AS token_id,
           token,
           CAST(length(token) AS INTEGER) AS n_chars,
           n_occurrences
    FROM counts
    """


def _encoded_docs_sql(n_merges: int) -> str:
    return f"""
    WITH {_bpe_cte_chain(n_merges)},
    tok AS (
        SELECT freq, unnest(string_split(trim(seq, '_'), '__')) AS token
        FROM s{n_merges}
    ),
    vocab AS (
        SELECT CAST(row_number() OVER (ORDER BY token) AS INTEGER) AS token_id,
               token
        FROM (SELECT DISTINCT token FROM tok)
    ),
    word_toks AS (
        SELECT word, string_split(trim(seq, '_'), '__') AS toks
        FROM s{n_merges}
    ),
    doc_words AS (
        SELECT doc_id, i AS pos, words[i] AS word
        FROM (
            SELECT doc_id,
                   regexp_extract_all(lower(text), '{WORD_REGEX_SQL}') AS words
            FROM documents
        ), LATERAL unnest(generate_series(1, len(words))) AS g(i)
    ),
    doc_toks AS (
        SELECT dw.doc_id, dw.pos, j AS tok_pos, wt.toks[j] AS token
        FROM doc_words dw
        JOIN word_toks wt USING (word),
        LATERAL unnest(generate_series(1, len(wt.toks))) AS h(j)
    ),
    doc_ids AS (
        SELECT dt.doc_id, dt.pos, dt.tok_pos, v.token_id
        FROM doc_toks dt JOIN vocab v ON v.token = dt.token
    )
    SELECT doc_id,
           list(token_id ORDER BY pos, tok_pos) AS token_ids,
           CAST(COUNT(*) AS INTEGER) AS n_tokens
    FROM doc_ids
    GROUP BY 1
    """


def bpe_packed_windows_str(
    spark: SparkSession,
    sf_dir: str,
    n_merges: int = N_MERGES,
    window: int = PACK_WINDOW,
) -> DataFrame:
    """Driver-registry twin of ``bpe_packed_windows`` — window contents
    serialized via ``_ids_as_str`` (see the r10 driver-harness note)."""
    packed = bpe_packed_windows(spark, sf_dir, n_merges, window)
    return packed.select(
        "source",
        "window_id",
        _ids_as_str(F.col("token_ids")).alias("token_ids_str"),
        "n_tokens",
    )


def _packed_windows_str_sql(n_merges: int, window: int) -> str:
    return f"""
    SELECT source, window_id,
           array_to_string(token_ids, '_') AS token_ids_str,
           n_tokens
    FROM ({_packed_windows_sql(n_merges, window)})
    """


QUERIES = {
    "bpe_merges": bpe_merges,
    "bpe_token_stats": bpe_token_stats,
    # r12: byte-level (open-vocabulary) tokenizer stats — GPT-2-style
    # pretokens, byte-fallback alphabet, oracle replays training in SQL
    "bpe_byte_token_stats": bpe_byte_token_stats,
    # driver-harness twins of the array-typed library plans (r11): same
    # plan, ids serialized to a scalar the driver canonicalizer can hash
    "bpe_encoded_docs_str": bpe_encoded_docs_str,
    "bpe_packed_windows_str": bpe_packed_windows_str,
}

ORACLE = {
    "bpe_merges": _merges_sql(N_MERGES),
    "bpe_token_stats": _token_stats_sql(N_MERGES),
    "bpe_byte_token_stats": _byte_token_stats_sql(BYTE_N_MERGES),
    "bpe_encoded_docs_str": _encoded_docs_str_sql(N_MERGES),
    "bpe_packed_windows_str": _packed_windows_str_sql(N_MERGES, PACK_WINDOW),
}

#: vocab + the ARRAY-TYPED id encodings live at the library tier: the
#: driver's canonicalizer can't hash array cells (r10 ERR), so the exact
#: array results are pytest-oracle-checked (tests/test_library_parity.py)
#: and the *_str twins above carry the driver rows
LIBRARY_QUERIES = {
    "bpe_byte_merges": bpe_byte_merges,
    "bpe_vocab": bpe_vocab,
    "bpe_encoded_docs": bpe_encoded_docs,
    "bpe_packed_windows": bpe_packed_windows,
}

LIBRARY_ORACLE = {
    "bpe_byte_merges": _byte_merges_sql(BYTE_N_MERGES),
    "bpe_vocab": _vocab_sql(N_MERGES),
    "bpe_encoded_docs": _encoded_docs_sql(N_MERGES),
    "bpe_packed_windows": _packed_windows_sql(N_MERGES, PACK_WINDOW),
}
