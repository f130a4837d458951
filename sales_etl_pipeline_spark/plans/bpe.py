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
``replace`` projection; lineage is truncated per round with an eager
localCheckpoint (same recipe as ``near_dup_components``) so round N's
pair count never replays rounds 0..N-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.readers import load_table

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


def train_bpe(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Train ``n_merges`` BPE merge rules on the documents corpus.

    Returns ``(merges, seqs)``: the ordered merge list and the
    distinct-word relation with each word's final token sequence (the
    trained tokenizer's segmentation of the training vocabulary).

    Raises if the corpus exhausts mergeable pairs before ``n_merges``
    rounds — silently returning fewer rules would diverge from the
    fixed-depth SQL oracle, and a caller asking for more merges than the
    corpus supports should find out loudly.
    """
    seqs = _init_seqs(_word_freq(spark, sf_dir)).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for r in range(n_merges):
        best = (
            _pair_counts(seqs)
            .orderBy(F.desc("c"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        if not best:
            raise ValueError(
                f"corpus exhausted mergeable pairs after {r} merges "
                f"(requested {n_merges}); lower n_merges"
            )
        lhs, rhs = best[0].lhs, best[0].rhs
        merges.append((lhs, rhs))
        seqs = seqs.withColumn(
            "seq",
            F.replace(
                "seq",
                F.lit(f"_{lhs}__{rhs}_"),
                F.lit(f"_{lhs}{rhs}_"),
            ),
        ).localCheckpoint(eager=True)
    return merges, seqs


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


def bpe_merges(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> DataFrame:
    """Registry plan: the trained merge table — ``(rank, lhs, rhs,
    merged)``, one row per merge rule in training order. The model
    artifact a downstream tokenizer ships."""
    merges, _ = train_bpe(spark, sf_dir, n_merges)
    return spark.createDataFrame(
        [(i, l, r, l + r) for i, (l, r) in enumerate(merges)],
        "rank int, lhs string, rhs string, merged string",
    )


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
    parts = [
        f"""w AS MATERIALIZED (
        SELECT word, COUNT(*) AS freq FROM (
            SELECT unnest(regexp_extract_all(lower(text), '{WORD_REGEX_SQL}')) AS word
            FROM documents
        ) GROUP BY 1
    ),
    s0 AS MATERIALIZED (
        SELECT word, freq, regexp_replace(word, '(.)', '_\\1_', 'g') AS seq
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


QUERIES = {
    "bpe_merges": bpe_merges,
    "bpe_token_stats": bpe_token_stats,
}

ORACLE = {
    "bpe_merges": _merges_sql(N_MERGES),
    "bpe_token_stats": _token_stats_sql(N_MERGES),
}
