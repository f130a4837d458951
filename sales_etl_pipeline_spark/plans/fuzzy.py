"""Fuzzy string matching (r13): SymSpell-style deletion-neighborhood
blocking for edit-distance joins — the entity-resolution / typo-cluster
operator class (Garbe's SymSpell is the public reference algorithm; the
deletion-neighborhood completeness property is its core theorem:
levenshtein(a, b) ≤ k ⟹ the ≤k-deletion variant sets of a and b
intersect, so blocking on deletion variants has EXACT recall).

Why this matters at 100 TB: a naive fuzzy join is |vocab|² levenshtein
calls — dead at any real vocabulary. Deletion blocking generates
O(len²) variant keys per DISTINCT word (≤ 37 for 8-char words at k=2),
hash-joins on the variant, and verifies only the candidates, so the
exact-recall candidate set replaces the quadratic sweep. Bucket sizes
are structurally bounded: a word lands in variant v's bucket only if
len(word) ≤ len(v)+k, so each bucket draws from a k-length window of
the vocabulary (the degenerate 1-char variants gather only ≤(k+1)-char
words), and the verify join is AQE-skew-splittable. All work is at
DISTINCT-WORD grain — one corpus tokenize shuffle, then vocab-sized
relations (the plans/bpe.py scale story).

The DuckDB oracles are the NAIVE all-pairs semantics (a < b,
levenshtein ≤ k, both engines' levenshtein probed identical) — so the
value hash simultaneously proves the candidate generation COMPLETE
(missing pair ⇒ row-count mismatch) and the verify filter exact (extra
pair ⇒ hash mismatch). Same documented-naive-oracle convention as
ngram_jaccard_pairs.

Reference scope note: the reference pipeline
(``/root/reference/data/etl.py``) has no fuzzy-matching surface; this
extends the engine's LLM-data curation family (SURVEY.md §2.11
north-star scope — typo normalization is a standard crawl-text cleanup
pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .bpe import _word_freq

#: edit-distance radius (deletion depth); the synthetic corpus has no
#: distance-1 neighbors, so k=2 is what exercises the operator
FUZZY_K = 2
#: minimum word length admitted to the join (shorter words make every
#: other short word a neighbor — noise, and the classic SymSpell floor)
FUZZY_MIN_LEN = 3


def _variants_expr() -> F.Column:
    """All ≤2-deletion variants of ``word`` as an array (word itself,
    every 1-deletion, every 2-deletion), deduplicated — pure
    higher-order expressions, identical in both engines' dialects.
    Valid for length ≥ 2 (callers filter to FUZZY_MIN_LEN ≥ 3)."""
    return F.expr(
        """
        array_distinct(concat(
            array(word),
            transform(sequence(1, length(word)), i ->
                concat(substring(word, 1, i - 1),
                       substring(word, i + 1, length(word)))),
            flatten(transform(sequence(1, length(word) - 1), i ->
                transform(sequence(i + 1, length(word)), j ->
                    concat(substring(word, 1, i - 1),
                           substring(word, i + 1, j - i - 1),
                           substring(word, j + 1, length(word))))))
        ))
        """
    )


def _neighbor_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-blocked, exactly-verified neighbor pairs (word_a <
    word_b, levenshtein ≤ FUZZY_K) with frequencies."""
    wf = _word_freq(spark, sf_dir).filter(
        F.length("word") >= FUZZY_MIN_LEN
    )
    variants = wf.select(
        "word", "freq", F.explode(_variants_expr()).alias("v")
    )
    a = variants.alias("a")
    b = variants.alias("b")
    return (
        a.join(b, "v")
        .filter(F.col("a.word") < F.col("b.word"))
        .select(
            F.col("a.word").alias("word_a"),
            F.col("b.word").alias("word_b"),
            F.col("a.freq").alias("freq_a"),
            F.col("b.freq").alias("freq_b"),
        )
        .distinct()
        .withColumn(
            "dist", F.levenshtein("word_a", "word_b").cast("int")
        )
        .filter(F.col("dist") <= FUZZY_K)
    )


def fuzzy_word_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry plan: every distinct-word pair within edit distance
    FUZZY_K (length ≥ FUZZY_MIN_LEN both sides) with frequencies — the
    typo/variant edge relation entity resolution builds on. Blocked via
    deletion neighborhoods (module docstring), verified exactly.
    Oracle: naive all-pairs levenshtein — value-hash equality proves
    blocking completeness AND verify exactness at once."""
    return _neighbor_pairs(spark, sf_dir).select(
        "word_a", "word_b", "dist", "freq_a", "freq_b"
    ).orderBy("word_a", "word_b")


def typo_canonical_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry plan: the spell-normalization table — each word mapped
    to the highest-frequency member of its ≤FUZZY_K neighborhood
    (itself included; ties by lexicographically smallest word). The
    canonical-form join a cleanup pass applies before counting,
    deduplicating, or training. Neighborhood = the symmetric closure of
    fuzzy_word_pairs + self; one word-partitioned argmax window over
    neighbor rows (groups bounded by neighborhood size, never corpus
    size)."""
    from .llmdata import _pin

    wf = _word_freq(spark, sf_dir).filter(
        F.length("word") >= FUZZY_MIN_LEN
    )
    # the symmetric closure consumes the pairs relation TWICE (one leg
    # per direction); without a pin the whole blocked join re-executes
    # per leg (plan-audit finding: 9 exchanges → 6 with the pin)
    pairs = _pin(_neighbor_pairs(spark, sf_dir))
    edges = (
        pairs.select(
            F.col("word_a").alias("word"),
            F.col("word_b").alias("cand"),
            F.col("freq_b").alias("cand_freq"),
        )
        .unionAll(
            pairs.select(
                F.col("word_b").alias("word"),
                F.col("word_a").alias("cand"),
                F.col("freq_a").alias("cand_freq"),
            )
        )
        .unionAll(
            wf.select(
                F.col("word"),
                F.col("word").alias("cand"),
                F.col("freq").alias("cand_freq"),
            )
        )
    )
    w = Window.partitionBy("word").orderBy(
        F.desc("cand_freq"), F.asc("cand")
    )
    return (
        edges.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "word",
            F.col("cand").alias("canonical"),
            F.col("cand_freq").alias("canonical_freq"),
        )
        .orderBy("word")
    )


_WF_SQL = """
    SELECT word, COUNT(*) AS freq FROM (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
        FROM documents
    ) GROUP BY 1
"""

QUERIES: dict = {}
ORACLE: dict = {}

LIBRARY_QUERIES = {
    "fuzzy_word_pairs": fuzzy_word_pairs,
    "typo_canonical_map": typo_canonical_map,
}

LIBRARY_ORACLE = {
    "fuzzy_word_pairs": f"""
    WITH wf AS ({_WF_SQL})
    SELECT a.word AS word_a, b.word AS word_b,
           CAST(levenshtein(a.word, b.word) AS INT) AS dist,
           a.freq AS freq_a, b.freq AS freq_b
    FROM wf a JOIN wf b
      ON a.word < b.word
     AND levenshtein(a.word, b.word) <= {FUZZY_K}
    WHERE length(a.word) >= {FUZZY_MIN_LEN}
      AND length(b.word) >= {FUZZY_MIN_LEN}
    ORDER BY word_a, word_b
    """,
    "typo_canonical_map": f"""
    WITH wf AS ({_WF_SQL}),
    elig AS (SELECT * FROM wf WHERE length(word) >= {FUZZY_MIN_LEN}),
    edges AS (
        SELECT a.word, b.word AS cand, b.freq AS cand_freq
        FROM elig a JOIN elig b
          ON levenshtein(a.word, b.word) <= {FUZZY_K}
    )
    SELECT word, cand AS canonical, cand_freq AS canonical_freq
    FROM (
        SELECT word, cand, cand_freq,
               ROW_NUMBER() OVER (
                   PARTITION BY word
                   ORDER BY cand_freq DESC, cand) AS rn
        FROM edges
    ) WHERE rn = 1 ORDER BY word
    """,
}


def text_typo_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry plan: the doc-grain CONSUMER of the canonical map —
    every token of every document replaced by its typo-canonical form
    (tokens outside the map — shorter than FUZZY_MIN_LEN or absent —
    pass through), with a per-doc changed-token count. The cleanup pass
    a pipeline runs before counting/dedup/training so near-variants
    collapse onto one surface form.

    Shape: ONE token-grain posexplode + a vocab-grain left join (the
    map is vocabulary-sized — broadcastable on most corpora, shuffle
    join otherwise) + positional reassembly at doc grain (array_sort
    over (pos, tok) structs — the dedup_spans reassembly idiom). One
    corpus shuffle end to end. Returns (doc_id, normalized_text,
    n_tokens, n_changed) — flat, oracle-EXACT."""
    from ..functions.core import tokens

    docs = load_table_docs(spark, sf_dir)
    cmap = typo_canonical_map(spark, sf_dir).select(
        F.col("word").alias("tok"), "canonical"
    )
    tok = docs.select(
        "doc_id",
        F.posexplode(tokens(F.col("text"))).alias("pos", "tok"),
    )
    joined = tok.join(cmap, "tok", "left").select(
        "doc_id",
        "pos",
        F.coalesce("canonical", "tok").alias("out_tok"),
        (F.col("canonical").isNotNull() & (F.col("canonical") != F.col("tok")))
        .cast("int")
        .alias("changed"),
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "out_tok"))
                    ),
                    lambda s: s["out_tok"],
                ),
                " ",
            ).alias("normalized_text"),
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.sum("changed").cast("int").alias("n_changed"),
        )
        .orderBy("doc_id")
    )


def load_table_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.readers import load_table

    return load_table(spark, sf_dir, "documents")


LIBRARY_QUERIES["text_typo_normalize"] = text_typo_normalize

LIBRARY_ORACLE["text_typo_normalize"] = f"""
    WITH wf AS ({_WF_SQL}),
    elig AS (SELECT * FROM wf WHERE length(word) >= {FUZZY_MIN_LEN}),
    edges AS (
        SELECT a.word, b.word AS cand, b.freq AS cand_freq
        FROM elig a JOIN elig b
          ON levenshtein(a.word, b.word) <= {FUZZY_K}
    ),
    cmap AS (
        SELECT word AS tok, cand AS canonical
        FROM (
            SELECT word, cand,
                   ROW_NUMBER() OVER (
                       PARTITION BY word
                       ORDER BY cand_freq DESC, cand) AS rn
            FROM edges
        ) WHERE rn = 1
    ),
    toks AS (
        SELECT doc_id, t, len(t) AS n FROM (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents)
    ),
    tok AS (
        SELECT doc_id, g.i - 1 AS pos, t[g.i] AS tok
        FROM toks, LATERAL unnest(generate_series(1, n)) AS g(i)
    ),
    joined AS (
        SELECT doc_id, pos,
               COALESCE(c.canonical, tok) AS out_tok,
               CASE WHEN c.canonical IS NOT NULL
                     AND c.canonical <> tok THEN 1 ELSE 0 END AS changed
        FROM tok LEFT JOIN cmap c USING (tok)
    )
    SELECT doc_id,
           string_agg(out_tok, ' ' ORDER BY pos) AS normalized_text,
           CAST(COUNT(*) AS INT) AS n_tokens,
           CAST(SUM(changed) AS INT) AS n_changed
    FROM joined GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# incremental fold (the family's ingest shape) + frozen-map stream twin


def _words_of(docs: DataFrame) -> DataFrame:
    """(word, freq) at length ≥ FUZZY_MIN_LEN over one batch relation —
    the per-batch leg of the mergeable word-count state."""
    words = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("([a-z]+)"))
        ).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.length("word") >= FUZZY_MIN_LEN)
    )


def incremental_fuzzy_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry exposure of the fuzzy-index FOLD (the
    incremental_exact_dedup_fold convention): split documents into two
    deterministic batches (even/odd doc_id), build the word-count state
    and variant index from batch 1, fold batch 2 through the delta
    merge, and return the final neighbor-pair relation. The oracle is
    the BATCH-FREE recompute (fuzzy_word_pairs' own naive SQL) — fold ≡
    recompute, driver-checkable.

    Delta economics (why the fold is cheap): word counts are a
    mergeable counter (freq = f1 + f2 per word), and variant keys only
    need GENERATING for words NEW to the delta — pair discovery is then
    base×base (the persisted index, freqs refreshed) ∪ new×all, which
    are disjoint by construction (base pairs have both words in the
    base vocabulary) and together exactly the full pair set."""
    from .llmdata import _pin

    docs = load_table_docs(spark, sf_dir).select("doc_id", "text")
    wf1 = _words_of(docs.filter(F.col("doc_id") % 2 == 0))
    wf2 = _words_of(docs.filter(F.col("doc_id") % 2 != 0))
    merged = _pin(
        wf1.selectExpr("word", "freq AS f1")
        .join(wf2.selectExpr("word", "freq AS f2"), "word", "full")
        .select(
            "word",
            (
                F.coalesce("f1", F.lit(0)) + F.coalesce("f2", F.lit(0))
            ).alias("freq"),
        )
    )
    new_words = wf2.join(wf1, "word", "left_anti").select("word")
    var_all = _pin(
        merged.select(
            "word", "freq", F.explode(_variants_expr()).alias("v")
        )
    )
    var_base = var_all.join(new_words, "word", "left_anti")
    var_new = var_all.join(new_words, "word", "semi")

    def pairs(left: DataFrame, right: DataFrame) -> DataFrame:
        a, b = left.alias("a"), right.alias("b")
        return (
            a.join(b, "v")
            .filter(F.col("a.word") != F.col("b.word"))
            .select(
                F.least("a.word", "b.word").alias("word_a"),
                F.greatest("a.word", "b.word").alias("word_b"),
            )
            .distinct()
        )

    cand = pairs(var_base, var_base).unionAll(
        pairs(var_new, var_all)
    ).distinct()
    fa = merged.selectExpr("word AS word_a", "freq AS freq_a")
    fb = merged.selectExpr("word AS word_b", "freq AS freq_b")
    return (
        cand.withColumn(
            "dist", F.levenshtein("word_a", "word_b").cast("int")
        )
        .filter(F.col("dist") <= FUZZY_K)
        .join(fa, "word_a")
        .join(fb, "word_b")
        .select("word_a", "word_b", "dist", "freq_a", "freq_b")
        .orderBy("word_a", "word_b")
    )


LIBRARY_QUERIES["incremental_fuzzy_fold"] = incremental_fuzzy_fold
# fold ≡ recompute: the oracle IS the batch-free naive pair SQL
LIBRARY_ORACLE["incremental_fuzzy_fold"] = LIBRARY_ORACLE[
    "fuzzy_word_pairs"
]


def typo_map_expr(pairs: list) -> F.Column:
    """The canonical map as a frozen per-row EXPRESSION: a map literal
    over the trained (word, canonical) pairs, applied token-wise with
    pass-through — the stream-side shape (streaming/jobs.
    stream_typo_normalize). Bounded by the vocabulary contract (the
    same bound as the broadcast WordPiece vocab); corpora whose map
    outgrows an in-plan literal use the batch join path instead."""
    entries: list = []
    for w, c in pairs:
        entries.append(F.lit(w))
        entries.append(F.lit(c))
    m = F.create_map(*entries) if entries else F.create_map()
    toks = F.split(F.col("text"), " ")
    out = F.transform(
        toks, lambda t: F.coalesce(m.getItem(t), t)
    )
    return F.struct(
        F.array_join(out, " ").alias("normalized_text"),
        F.size(toks).cast("int").alias("n_tokens"),
        F.size(
            F.filter(
                F.zip_with(toks, out, lambda a, b: a != b),
                lambda x: x,
            )
        )
        .cast("int")
        .alias("n_changed"),
    )
