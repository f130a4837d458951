"""Training-data pipeline plans over ``documents`` and ``embeddings``
(north-star scope, SURVEY.md §2.11 — absent from the reference, which has
no text/array operators at all; this is the engine's LLM-data surface).

Families:
- Deduplication: exact (hash-groupBy), n-gram Jaccard (exact near-dup),
  MinHash+banding (the 100-TB scale path — candidates via band-key
  equi-join instead of the quadratic shared-shingle join), SimHash.
- Similarity search: brute-force cosine top-k (oracle-checked baseline)
  and LSH-bucketed ANN (rows-only; the scale path).
- Text analysis: quality scoring, language-ID heuristic, token statistics,
  document fingerprinting.

Everything is pure Catalyst expressions — higher-order array functions,
no Python UDFs in any hot path. Cross-engine hash parity comes from
``md5``-derived 60-bit integers (functions.core.md5_long), the one hash
both Spark and DuckDB compute identically; float parity from the shared
exact-decimal sum and identical left-fold association (cosine).

Scale notes (100 TB):
- The shared-shingle join (ngram_jaccard_pairs) is quadratic in the
  document-frequency of a shingle — correct as the exact baseline but the
  scale path is minhash_near_dup, whose band-key join only collides truly
  similar documents (16 sigs, 4 bands × 4 rows ⇒ P(candidate) ≈ 1-(1-j⁴)⁴).
- SimHash aggregates per (doc, bit) partial counts map-side; one shuffle
  at doc_id grain.
- Brute-force kNN broadcasts the query set (tiny) against the corpus —
  no shuffle at all; the LSH variant turns it into a bucket equi-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.core import (
    DEC,
    md5_long,
    oracle_md5_long,
    oracle_xsum,
    tokens,
    xsum,
)
from ..sources.readers import load_table

# ---------------------------------------------------------------------------
# shared pieces

SHINGLE_N = 3
MINHASH_SIGS = 16
MINHASH_BANDS = 4  # 4 bands x 4 rows
#: Hot-bucket cap for the LSH band join (skew hardening): a band bucket
#: larger than this is split into ceil(size/cap) sub-buckets by a
#: secondary doc-id hash, bounding the per-key self-join at O(size·cap)
#: instead of O(size²). Small enough to stop boilerplate-family blowup,
#: large enough that no benign bucket ever splits (uniform buckets hold
#: ~corpus/band-key-space docs).
MINHASH_BUCKET_CAP = 256

#: Universal-hash family over a single 32-bit md5 base hash:
#: h_j(s) = (A[j] * h32(s) + B[j]) mod P. One md5 per shingle instead of
#: sixteen — the rest is int64 arithmetic (A < 2^30, h32 < 2^32 ⇒ product
#: < 2^62, no overflow), identical in both engines. Constants derived
#: deterministically from md5 (no RNG state).
MINHASH_P = 2147483647  # 2^31 - 1


def _uh_constants() -> list[tuple[int, int]]:
    import hashlib

    out = []
    for j in range(MINHASH_SIGS):
        a = int(hashlib.md5(f"mh_a{j}".encode()).hexdigest()[:8], 16) % (2**30 - 1) + 1
        b = int(hashlib.md5(f"mh_b{j}".encode()).hexdigest()[:8], 16) % MINHASH_P
        out.append((a, b))
    return out


UH = _uh_constants()
SIMHASH_BITS = 60  # md5_long yields 60 usable bits
JACCARD_THRESHOLD = 0.8
#: threshold as an exact rational for prefix-length integer arithmetic —
#: (1 - 0.8) * n in doubles is 1.999…96 for n=10 and floors one short,
#: silently dropping exact-boundary pairs (found the hard way).
JACCARD_NUM, JACCARD_DEN = 4, 5
COSINE_THRESHOLD = 0.4

STOPWORDS = {
    "en": ("the", "a", "of", "and", "to"),
    "fr": ("le", "la", "de", "et", "les"),
    "de": ("der", "die", "und", "das", "ein"),
    "es": ("el", "una", "y", "los", "que"),
}
#: deterministic tie-break priority for argmax over language scores
LANG_PRIORITY = ("en", "fr", "de", "es")

TOKEN_REGEX = r"\w+|[^\w\s]"  # BPE-ish: words + individual punctuation


def _shingle_table(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Exploded distinct word-3-gram relation: (doc_id, s).

    Deliberately NOT an array column: a higher-order ``transform`` building
    per-doc shingle arrays runs interpreted (outside codegen) and Catalyst
    duplicates the expression into pushed-down filters — measured ~8 s per
    evaluation over 5 k docs, evaluated 4-5× in the join plans. posexplode +
    ``lead`` windows stay in whole-stage codegen, and the relational form is
    what joins/aggregations want at 100 TB anyway (no giant array cells).
    """
    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    t1, t2 = F.lead("tok", 1).over(w), F.lead("tok", 2).over(w)
    return (
        tok.select(
            "doc_id",
            F.concat_ws(" ", F.col("tok"), t1, t2).alias("s"),
            t2.isNotNull().alias("full"),
        )
        .filter("full")
        .select("doc_id", "s")
        .distinct()
    )


def _shingles_sql(src: str = "documents") -> str:
    return f"""
    SELECT doc_id,
           list_distinct(list_transform(
               range(0, len(string_split(text, ' ')) - {SHINGLE_N - 1}),
               i -> array_to_string(
                   string_split(text, ' ')[i + 1 : i + {SHINGLE_N}], ' ')
           )) AS shingles
    FROM {src}
    WHERE len(string_split(text, ' ')) >= {SHINGLE_N}
"""


_SHINGLES_SQL = _shingles_sql()


def _pair_jaccard(sh: DataFrame, cand: DataFrame) -> DataFrame:
    """Exact Jaccard for candidate (doc_a, doc_b) pairs, relationally:
    |A∩B| via a three-way equi-join on the shingle relation, |A| and |B|
    from a per-doc count — semi-joined down to candidate docs first so the
    shuffles carry only candidate data."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sha = sh.select(F.col("doc_id").alias("doc_a"), "s")
    shb = sh.select(F.col("doc_id").alias("doc_b"), "s")
    shared = (
        cand.join(sha, "doc_a")
        .join(shb, ["doc_b", "s"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        shared.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("shared")
                / (F.col("n_a") + F.col("n_b") - F.col("shared")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


# ---------------------------------------------------------------------------
# deduplication

def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: one canonical doc per distinct text (hash
    groupBy — one shuffle on the text hash; at scale group on
    ``md5(text)`` to shrink shuffle keys)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("content_md5"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select("doc_id", "content_md5", "dup_count")
    )


def incremental_exact_dedup(
    corpus_state: DataFrame, new_docs: DataFrame
) -> DataFrame:
    """Merge a NEW document batch into an already-deduped corpus state
    without touching the old corpus' text — the only shape exact dedup can
    take operationally at 100 TB (you never re-shuffle the full corpus per
    ingest; you join the delta against the existing fingerprint state).

    ``corpus_state`` is the running (doc_id, content_md5, dup_count)
    relation (``exact_dedup`` output, or a previous call's result);
    ``new_docs`` is a raw (doc_id, text, ...) delta. The delta is hashed
    and collapsed batch-locally (one shuffle over the DELTA only), then
    full-outer-merged with the state on content_md5: existing groups keep
    their canonical id (min-id rule can only be won by an older, smaller
    id — new ids are monotonically larger in append-only ingest) and add
    the delta's dup_count; new groups enter with the delta's canonical.
    The state relation shuffles on its key too, but it is fingerprint
    grain (one skinny row per DISTINCT text), not corpus grain — and with
    the state bucketed on content_md5 (sources/writers.py:write_bucketed)
    even that exchange disappears.

    Equivalence contract (pinned in tests/test_operators.py): for any
    split of the corpus into batches, folding the batches through this
    merge equals ``exact_dedup`` over the whole corpus.
    """
    delta = (
        new_docs.groupBy(F.md5("text").alias("content_md5"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )
    s = corpus_state.select(
        "content_md5",
        F.col("doc_id").alias("s_doc_id"),
        F.col("dup_count").alias("s_cnt"),
    )
    d = delta.select(
        "content_md5",
        F.col("doc_id").alias("d_doc_id"),
        F.col("dup_count").alias("d_cnt"),
    )
    return (
        s.join(d, "content_md5", "full_outer")
        .select(
            F.least(
                F.coalesce("s_doc_id", "d_doc_id"),
                F.coalesce("d_doc_id", "s_doc_id"),
            ).alias("doc_id"),
            "content_md5",
            (
                F.coalesce("s_cnt", F.lit(0)) + F.coalesce("d_cnt", F.lit(0))
            ).alias("dup_count"),
        )
    )


def minhash_index(docs: DataFrame) -> DataFrame:
    """Build the persistable LSH band index for a document set: the
    (doc_id, band, key) relation — 4 skinny rows per document. This is
    the state an append-only near-dup pipeline maintains across ingest
    batches (write it bucketed on (band, key),
    sources/writers.write_bucketed, and the per-batch candidate join
    needs no exchange on the index side)."""
    spark = docs.sparkSession
    return _minhash_bands(_shingle_table(spark, "", docs))


#: persisted subplans of the most recent incremental_minhash_near_dup
#: call — see its "Cache lifecycle" docstring note
_INCR_CACHES: list = []


def release_incremental_caches() -> None:
    """Unpersist the previous incremental_minhash_near_dup call's cached
    subplans (no-op if none). Safe even if a caller still holds the
    returned DataFrame — Spark just recomputes on next use."""
    while _INCR_CACHES:
        try:
            _INCR_CACHES.pop().unpersist()
        except Exception:
            pass


#: relations pinned for the MOST RECENT cache-backed plan whose returned
#: DataFrame consumes them (the pin must outlive plan construction, so
#: it cannot be released inside the plan function itself) — released
#: when the next such plan is built, or via release_plan_caches()
_PLAN_CACHES: list = []


def release_plan_caches() -> None:
    """Unpersist relations pinned by the most recent cache-backed plan
    (no-op if none). Safe even if a caller still holds the returned
    DataFrame — Spark just recomputes on next use. Long driver sessions
    that interleave many plan invocations get this automatically: each
    new cache-backed plan releases its predecessor's pins, so pinned
    relations never accumulate (ADVICE r9)."""
    while _PLAN_CACHES:
        try:
            _PLAN_CACHES.pop().unpersist()
        except Exception:
            pass


def _pin(df: DataFrame) -> DataFrame:
    """Persist ``df`` for multi-consumer reuse inside ONE returned plan
    and register it for release when the NEXT plan begins. Release is
    automatic for registry consumers: plans.all_queries() /
    library_queries() wrap every plan so entry releases the previous
    plan's pins (plans/__init__._scoped) — this is THE pin mechanism;
    plan code must never call bare .persist() for per-plan reuse
    (exceptions: _INCR_CACHES cross-batch state, pins the same function
    explicitly unpersists)."""
    df = df.persist()
    _PLAN_CACHES.append(df)
    return df


def incremental_minhash_near_dup(
    base_docs: DataFrame,
    delta_docs: DataFrame,
    base_index: DataFrame | None = None,
) -> DataFrame:
    """Delta-only near-dup for append-only ingest — the MinHash analogue
    of ``incremental_exact_dedup``: find every near-dup pair that TOUCHES
    the new batch (delta×base and delta×delta) without re-running the
    corpus-wide band self-join.

    Per-batch work is delta-grain end to end:
    - signatures/bands are computed for the DELTA only; the base side
      comes from ``base_index`` (the persisted relation from
      ``minhash_index`` — recomputed here from ``base_docs`` only if not
      supplied, for the self-contained/backfill case);
    - candidates come from the delta-bands × index equi-join,
      O(|delta| × collision rate);
    - exact-Jaccard verification shingles ONLY the candidate documents
      (a skinny-id semi-join pulls their text from the corpus), so the
      expensive token work is candidate-grain, not corpus-grain.

    Semantics: same 16 md5-seeded min-hashes, 4×4 banding, and exact
    Jaccard ≥ threshold verification as ``minhash_near_dup``, WITHOUT the
    exact-dup collapse or the hot-bucket cap — per-batch deltas are
    small, so the quadratic hazards those guard against live in the
    initial backfill (run the full plan there), not the steady-state
    ingest. Called with an empty base, this IS the uncapped full
    recompute, which gives the fold-equivalence contract its clean form:
    pairs(base ∪ delta) = pairs(base) ∪ incremental(base, delta)
    (pinned for a doc_id split, with and without a precomputed index, in
    tests/test_operators.py).

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b and at least one
    side from the delta.

    Cache lifecycle: the three persisted subplans (delta bands,
    candidate pairs, candidate shingles) are registered in a module
    slot; each call releases the PREVIOUS call's entries, and
    ``release_incremental_caches()`` drops the current ones — so a
    long-running ingest loop pins at most one batch's caches instead of
    accumulating three per batch until executor storage is exhausted
    (TrainingDataPipeline.ingest_batch calls it after the commit)."""
    spark = delta_docs.sparkSession
    release_incremental_caches()
    if base_index is None:
        base_index = minhash_index(base_docs)
    delta_sh = _shingle_table(spark, "", delta_docs)
    bands_delta = _minhash_bands(delta_sh).persist()
    bands_all = base_index.unionByName(bands_delta)
    cand = (
        bands_delta.alias("d")
        .join(
            bands_all.alias("a"),
            (F.col("d.band") == F.col("a.band"))
            & (F.col("d.key") == F.col("a.key"))
            & (F.col("d.doc_id") != F.col("a.doc_id")),
        )
        .select(
            F.least("d.doc_id", "a.doc_id").alias("doc_a"),
            F.greatest("d.doc_id", "a.doc_id").alias("doc_b"),
        )
        .distinct()
        .persist()
    )
    cand_ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    all_docs = base_docs.unionByName(delta_docs)
    cand_docs = all_docs.join(F.broadcast(cand_ids), "doc_id", "left_semi")
    sh_cand = _shingle_table(spark, "", cand_docs).persist()
    _INCR_CACHES.extend((bands_delta, cand, sh_cand))
    return _pair_jaccard(sh_cand, cand)


def incremental_exact_dedup_fold(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Registry exposure of the ``incremental_exact_dedup`` fold (VERDICT
    r11 item 6): split the documents table into two deterministic
    batches (even/odd doc_id), build the fingerprint state from batch 1
    (the ``exact_dedup`` shape), fold batch 2 through the delta merge,
    and return the final state. The oracle is the BATCH-FREE recompute
    (exact_dedup's own SQL) — a green row is an independent driver check
    of the fold ≡ recompute contract that until now only pytest pinned
    (tests/test_operators.py::test_incremental_exact_dedup_equals_full_recompute).
    Returns (doc_id, content_md5, dup_count)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 != 0)
    state = (
        b1.groupBy(F.md5("text").alias("content_md5"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select("doc_id", "content_md5", "dup_count")
    )
    return incremental_exact_dedup(state, b2).select(
        "doc_id", "content_md5", "dup_count"
    )


def incremental_minhash_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry exposure of the ``incremental_minhash_near_dup`` fold:
    pairs(batch1) ∪ incremental(batch1, batch2) over a deterministic
    even/odd doc_id split — the two calls are disjoint by construction
    (within-base pairs vs pairs touching the delta), so their union is
    exactly the UNCAPPED, non-collapsed near-dup pair set of the whole
    corpus, which the oracle recomputes batch-free (same md5 min-hash
    family, 4×4 banding and exact-Jaccard verify as the minhash_near_dup
    oracle, minus its exact-dup collapse and hot-bucket cap — the
    incremental path deliberately lacks both, see its docstring).
    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.

    Cost note: this registry plan pays the BACKFILL shape — both calls
    recompute their base signatures from raw text (measured ≈ the full
    batch plan's cost at sf0.1, 2-3× at toy scale from the doubled
    plan tree). The production ingest loop does NOT: it persists the
    band index once (``minhash_index`` → write_bucketed) and each batch
    pays delta-grain work only. The plan exists to earn the fold an
    independent driver-oracle row, not to replace the batch plan on a
    static corpus."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 != 0)
    empty = spark.createDataFrame([], b1.schema)
    base_pairs = incremental_minhash_near_dup(empty, b1)
    # NOTE: this second call releases the first call's _INCR_CACHES —
    # harmless here because the union re-computes released subplans at
    # most once; the ingest loop (the real consumer) folds sequentially
    delta_pairs = incremental_minhash_near_dup(b1, b2)
    return base_pairs.unionByName(delta_pairs).select(
        "doc_a", "doc_b", "jaccard"
    )


def ngram_jaccard_pairs(
    spark: SparkSession, sf_dir: str, *, collapse: str = "auto"
) -> DataFrame:
    """Exact near-dup pairs by 3-gram Jaccard ≥ 0.8. Candidates via the
    shared-shingle equi-join (exact but quadratic in shingle document
    frequency — the MinHash plan below is the scale path).

    Exact-duplicate pre-collapse, REGIME-DISPATCHED: crawl corpora are
    duplicate-heavy, and identical texts have identical shingle sets, so
    the expensive candidate/verify machinery runs on one canonical doc
    per distinct text; member pairs are expanded afterwards (cross-group
    pairs inherit the canonical pair's Jaccard; within-group pairs are
    exactly 1.0 — n/n, bit-exact in both engines). On a 10×-replicated
    corpus this shrinks the candidate join 100× (measured 49.8 s → see
    BASELINE.md). On a fully-DISTINCT corpus the collapse is pure
    overhead (an md5 window + two expansion joins that are the
    identity), so ``collapse="auto"`` runs the ``_all_distinct`` probe
    (one 1-row agg) and skips the machinery when the corpus is provably
    duplicate-free — where skip ≡ collapse bit-for-bit (and for Jaccard
    the two branches are semantically the same pair relation at ANY dup
    ratio; both pins in tests/test_operators.py). ``"always"``/``"skip"``
    force a branch (tests; known-shape corpora).
    """
    docs = load_table(spark, sf_dir, "documents")
    eligible = docs.filter(F.size(tokens(F.col("text"))) >= SHINGLE_N)
    if collapse == "auto":
        collapse = "skip" if _all_distinct(eligible, F.md5("text")) else "always"
    if collapse == "skip":
        gmap, canon_docs = None, eligible
    else:
        gmap, canon_docs = _dup_groups(spark, sf_dir)
    # The shingle relation feeds five subplans (df counts, sizes, prefix,
    # and both sides of the intersection join); persist it once instead of
    # recomputing the tokenize+explode+distinct pipeline per use. Default
    # storage level is MEMORY_AND_DISK — spills, never OOMs, and at cluster
    # scale this is exactly the relation you'd persist (or checkpoint)
    # before a self-join. Measured 12.4 s → 6.4 s at sf0.1.
    sh = _pin(_shingle_table(spark, sf_dir, canon_docs))
    # Prefix filtering (AllPairs/SSJoin family): for Jaccard ≥ t, two sets
    # must share at least one of their first ⌊(1−t)·|d|⌋+1 shingles under a
    # global rarity order (document frequency asc, shingle asc). Exact — no
    # false negatives — and it removes the df² blowup on frequent shingles
    # that makes the naive shared-shingle join quadratic (measured 140 s →
    # ~15 s at sf0.1; the surviving join keys are the rare shingles).
    df_counts = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    w = Window.partitionBy("doc_id").orderBy("df", "s")
    prefix = (
        sh.join(df_counts, "s")
        .join(sizes, "doc_id")
        .withColumn("r", F.row_number().over(w))
        # prefix length p = n − ⌈t·n⌉ + 1, in exact integer arithmetic:
        # ⌈num·n/den⌉ = (num·n + den − 1) div den
        .filter(
            F.col("r")
            <= F.expr(
                f"n_sh - (({JACCARD_NUM} * n_sh + {JACCARD_DEN - 1}) div {JACCARD_DEN}) + 1"
            )
        )
        .select("doc_id", "s", "n_sh")
    )
    # Length filter (also exact): Jaccard ≥ t ⇒ |A∩B| ≥ t·|A∪B|, and since
    # |A∩B| ≤ min(|A|,|B|) while |A∪B| ≥ max(|A|,|B|), any qualifying pair
    # satisfies t·max ≤ min. In integer arithmetic: num·|other| ≤ den·|own|
    # both ways. Prunes size-mismatched candidates before the expensive
    # intersection join.
    cand = (
        prefix.alias("x")
        .join(
            prefix.alias("y"),
            (F.col("x.s") == F.col("y.s"))
            & (F.col("x.doc_id") < F.col("y.doc_id"))
            & (F.col("x.n_sh") * JACCARD_NUM <= F.col("y.n_sh") * JACCARD_DEN)
            & (F.col("y.n_sh") * JACCARD_NUM <= F.col("x.n_sh") * JACCARD_DEN),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    canon_pairs = _pair_jaccard(sh, cand)
    if gmap is None:
        return canon_pairs  # duplicate-free: nothing to expand
    return _expand_dup_pairs(canon_pairs, gmap)


def _all_distinct(df: DataFrame, col) -> bool:
    """Regime probe for the exact-dup pre-collapse (same pattern as the
    hashed_cosine_pairs occupancy dispatch): ONE aggregate comparing
    total vs distinct counts over a hash of the content column — driver
    traffic is 1 row. Collisions can only UNDER-count distinct, i.e.
    only ever keep the collapse engaged — the safe direction; the skip
    branch fires solely when the corpus is provably duplicate-free,
    where the collapse is the identity and both branches are
    bit-identical by construction (pinned in tests/test_operators.py).
    """
    row = df.agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct(col).alias("d")
    ).collect()[0]
    return row.n == row.d


def _dup_groups(spark: SparkSession, sf_dir: str, require_shingles: bool = True):
    """Exact-duplicate groups: (gmap: doc_id → canon_id, canon_docs: one
    representative per distinct text). With ``require_shingles`` (the
    Jaccard paths), docs with < SHINGLE_N tokens are excluded — they have
    no shingles, so the naive near-dup semantics never pair them; the
    SimHash path takes every document (its signature is defined for any
    token count)."""
    docs = load_table(spark, sf_dir, "documents")
    eligible = (
        docs.filter(F.size(tokens(F.col("text"))) >= SHINGLE_N)
        if require_shingles
        else docs
    )
    gmap = _pin(eligible.select(
        "doc_id",
        F.min("doc_id")
        .over(Window.partitionBy(F.md5("text")))
        .alias("canon_id"),
    ))
    canon_docs = eligible.join(
        gmap.filter(F.col("doc_id") == F.col("canon_id")).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    return gmap, canon_docs


def _expand_dup_pairs(
    canon_pairs: DataFrame,
    gmap: DataFrame,
    value_col: str = "jaccard",
    within_value=None,
) -> DataFrame:
    """Expand canonical near-dup pairs back to member pairs. Cross-group:
    every (member of A) × (member of B) pair shares A×B's text verbatim,
    hence its similarity value (Jaccard or Hamming) verbatim;
    least/greatest restores the doc_a < doc_b convention. Within-group:
    identical texts — Jaccard ≡ 1.0 (= n/n in the naive oracle) or
    Hamming ≡ 0 (identical signatures), exact in both engines."""
    if within_value is None:
        within_value = F.lit(1.0)
    cross = (
        canon_pairs.join(
            gmap.select(F.col("canon_id").alias("doc_a"), F.col("doc_id").alias("mem_a")),
            "doc_a",
        )
        .join(
            gmap.select(F.col("canon_id").alias("doc_b"), F.col("doc_id").alias("mem_b")),
            "doc_b",
        )
        .select(
            F.least("mem_a", "mem_b").alias("doc_a"),
            F.greatest("mem_a", "mem_b").alias("doc_b"),
            value_col,
        )
    )
    within = (
        gmap.alias("x")
        .join(
            gmap.alias("y"),
            (F.col("x.canon_id") == F.col("y.canon_id"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            within_value.alias(value_col),
        )
    )
    return cross.unionByName(within)


def _minhash_bands(sh: DataFrame) -> DataFrame:
    """(doc_id, band, key) LSH band relation over a shingle table: k seeded
    min-hashes as k MIN aggregates over the (doc, shingle) relation —
    whole-stage codegen, partial-aggregated map-side; at 100 TB the shuffle
    carries one 16-column row per document — then MINHASH_BANDS band keys
    per doc."""
    ex = sh.withColumn(
        "h32", F.conv(F.substring(F.md5("s"), 1, 8), 16, 10).cast("long")
    )
    sigs = ex.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("h32") + F.lit(b)) % F.lit(MINHASH_P)).alias(f"m{j}")
            for j, (a, b) in enumerate(UH)
        ]
    )
    rows_per_band = MINHASH_SIGS // MINHASH_BANDS
    return sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "-",
                            *[
                                F.col(f"m{b * rows_per_band + r}").cast("string")
                                for r in range(rows_per_band)
                            ],
                        ).alias("key"),
                    )
                    for b in range(MINHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def _band_sub_hash():
    """Secondary hash for the hot-bucket split: md5 of ``band:doc_id``, so
    each band partitions its hot bucket independently (the cross-band
    recall recovery depends on the splits being different per band)."""
    return F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.col("band").cast("string"), F.col("doc_id").cast("string")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")


def minhash_band_stats(
    spark: SparkSession, sf_dir: str, *, bucket_cap: int = MINHASH_BUCKET_CAP
) -> DataFrame:
    """Skew diagnostic for the LSH band join: one row per (band, key)
    bucket with its size, sub-bucket split factor, and the candidate-pair
    counts the join would generate with and without the hot-bucket cap
    (uncapped = C(size, 2); capped = Σ C(sub-size, 2) over the secondary
    hash split — exact, computed from the same sub assignment the join
    uses). Run this before a big dedup job to see whether the corpus is
    boilerplate-skewed and how much the cap saves; the capped total is the
    join's actual per-band candidate volume."""
    _gmap, canon_docs = _dup_groups(spark, sf_dir)
    sh = _shingle_table(spark, sf_dir, canon_docs)
    bands = _minhash_bands(sh)
    sizes = bands.groupBy("band", "key").agg(F.count(F.lit(1)).alias("bsz"))
    sub_hash = _band_sub_hash()
    per_sub = (
        bands.join(sizes, ["band", "key"])
        .select(
            "band",
            "key",
            (sub_hash % F.expr(f"(bsz + {bucket_cap - 1}) div {bucket_cap}")).alias(
                "sub"
            ),
        )
        .groupBy("band", "key", "sub")
        .agg(F.count(F.lit(1)).alias("ssz"))
        .groupBy("band", "key")
        .agg(F.sum(F.expr("ssz * (ssz - 1) div 2")).alias("capped_pairs"))
    )
    return (
        sizes.join(per_sub, ["band", "key"])
        .select(
            "band",
            "key",
            "bsz",
            F.expr(f"(bsz + {bucket_cap - 1}) div {bucket_cap}").alias("nsub"),
            F.expr("bsz * (bsz - 1) div 2").alias("uncapped_pairs"),
            "capped_pairs",
        )
        .orderBy(F.desc("bsz"), "band", "key")
    )


def minhash_near_dup(
    spark: SparkSession, sf_dir: str, *, bucket_cap: int = MINHASH_BUCKET_CAP
) -> DataFrame:
    """MinHash + LSH banding near-dup (the 100-TB dedup path): 16 md5-seeded
    min-hashes, banded 4×4; only band-key collisions become candidates, then
    exact Jaccard ≥ 0.8 verifies. Identical md5 hashing on the oracle side
    makes even this plan exactly checkable (SURVEY §2.11 upgraded: not
    rows-only).

    Same exact-duplicate pre-collapse as ngram_jaccard_pairs: identical
    texts yield identical signatures and band keys, so signatures are
    computed once per distinct text and member pairs expand afterwards —
    semantics unchanged, signature/candidate work divided by the
    duplication factor.

    Hot-bucket cap (skew hardening): a boilerplate-heavy corpus can put
    thousands of near-identical — but not byte-identical, so the exact
    collapse misses them — documents into ONE band bucket, and the band
    self-join goes quadratic inside that key. Any bucket larger than
    ``bucket_cap`` is split into ceil(size/cap) sub-buckets by a
    secondary doc-id hash (integer arithmetic only), turning the worst
    case into O(size·cap) while normal buckets (nsub = 1) are untouched.
    The secondary hash keys on (band, doc_id) — each band splits its hot
    bucket DIFFERENTLY, so a family pair separated in one band's split
    still collides in another band's with probability 1-(1-1/nsub)^bands
    (a doc-only hash would partition identically in every band and lose
    the pair outright). The split is deterministic and mirrored verbatim
    in the DuckDB oracle — which must therefore also mirror the exact-dup
    collapse, since bucket sizes (and hence split factors) are defined at
    CANONICAL grain — so the plan stays exactly value-hash checkable even
    where the cap bites; the exact-Jaccard verify keeps precision at 1
    regardless."""
    gmap, canon_docs = _dup_groups(spark, sf_dir)
    # Persisted: feeds the signature aggregation AND the exact-Jaccard
    # verification of candidates (three uses; same rationale as
    # ngram_jaccard_pairs).
    sh = _pin(_shingle_table(spark, sf_dir, canon_docs))
    # the band relation feeds the bucket-size aggregate AND (via capped)
    # both sides of the candidate self-join — persist both skinny
    # relations (4 rows/doc), else the 16-min signature aggregate under
    # them executes three times (measured 2× on the composed curation
    # funnel)
    bands = _pin(_minhash_bands(sh))
    # hot-bucket split (see docstring): bucket sizes shuffle on the same
    # (band, key) the candidate join uses, so the size join adds no new
    # partitioning; sub = (band:doc)-hash mod ceil(size/cap), pure int
    # arithmetic reproduced verbatim oracle-side.
    sizes = bands.groupBy("band", "key").agg(F.count(F.lit(1)).alias("bsz"))
    sub_hash = _band_sub_hash()
    capped = (
        bands.join(sizes, ["band", "key"])
        .select(
            "doc_id",
            "band",
            "key",
            (sub_hash % F.expr(f"(bsz + {bucket_cap - 1}) div {bucket_cap}")).alias(
                "sub"
            ),
        )
    )
    capped = _pin(capped)
    cand = (
        capped.alias("x")
        .join(
            capped.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.sub") == F.col("y.sub"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    return _expand_dup_pairs(_pair_jaccard(sh, cand), gmap)


def simhash_signatures(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """60-bit SimHash per document: per-token md5-hash, per-bit ±1 vote,
    sign of the vote sum sets the bit. Shaped as explode → hash-agg so the
    votes combine map-side (one shuffle at doc grain regardless of corpus
    size)."""
    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    ).withColumn("h", md5_long("tok"))
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(SIMHASH_BITS)
        ]
    )
    simhash = None
    for i in range(SIMHASH_BITS):
        term = F.when(F.col(f"b{i}") > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        simhash = term if simhash is None else simhash + term
    return votes.select("doc_id", simhash.alias("simhash"))


SIMHASH_BANDS = 6  # 6 bands × 10 bits over the 60-bit signature
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS
SIMHASH_MAX_HAMMING = 5  # banding is EXACT for hamming < SIMHASH_BANDS


def simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: documents whose 60-bit signatures differ in
    at most ``SIMHASH_MAX_HAMMING`` bits. Candidates come from LSH banding
    over the signature (6 bands × 10 bits, band-key equi-join): a pair
    within Hamming distance d < #bands must agree on at least one whole
    band (pigeonhole), so for this threshold the banded join is EXACT, not
    approximate — the brute-force all-pairs DuckDB oracle provably yields
    the identical pair set, which is what makes this fully value-hash
    checkable (same pattern as minhash_near_dup's banding).

    Scale shape: each doc emits 6 skinny (band, key, sig) rows; candidate
    volume is bounded by band-bucket sizes (corpus/2^10 per key under a
    uniform signature), never all-pairs, and verification is one
    xor+popcount per candidate. At web scale widen the band key (16 bits)
    and AND-compose band tables to keep buckets bounded; the plan shape is
    unchanged.

    Skew hardening: exact duplicates — the unbounded hot-bucket source on
    crawl corpora, since identical texts share every band of an identical
    signature — are collapsed FIRST (same ``_dup_groups`` pre-pass as
    minhash_near_dup, minus the shingle-eligibility filter: SimHash is
    defined for any token count). Signatures are computed once per
    distinct text, the band join runs at canonical grain, and member
    pairs expand afterwards (cross-group pairs inherit the canonical
    Hamming verbatim, within-group pairs are Hamming 0) — bit-identical
    to the uncollapsed plan, so the brute-force all-pairs oracle is
    unchanged. Residual hot buckets (near-identical families with small
    nonzero Hamming) are inherently pair-quadratic in the RESULT, so
    candidate capping cannot help there without breaking exactness —
    the band-width widening note above is the scale lever for those."""
    gmap, canon_docs = _dup_groups(spark, sf_dir, require_shingles=False)
    # signature relation feeds both join sides — persist so the token
    # explode + 60-column vote agg runs once (CacheManager dedups by
    # sameResult across repeated calls)
    sig = _pin(simhash_signatures(spark, sf_dir, docs=canon_docs))
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftright(F.col("simhash"), bi * SIMHASH_BAND_BITS)
                        .bitwiseAND((1 << SIMHASH_BAND_BITS) - 1)
                        .alias("key"),
                    )
                    for bi in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select(
        "doc_id",
        "simhash",
        F.col("bk.band").alias("band"),
        F.col("bk.key").alias("key"),
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"), "band", "key"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"), "band", "key"
    )
    canon_pairs = (
        a.join(b, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
            .cast("int")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        # a pair can share several bands — hamming is functionally
        # determined by the pair, so row-level distinct dedups candidates
        .distinct()
    )
    return _expand_dup_pairs(
        canon_pairs, gmap, value_col="hamming", within_value=F.lit(0).cast("int")
    )


# ---------------------------------------------------------------------------
# text analysis

def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality metrics + composite score (length, lexical
    diversity, stopword density, punctuation density) — all single-pass
    narrow projections, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    distinct_ratio = F.size(F.array_distinct(toks)) / n_tokens.cast("double")
    stop_ratio = n_stop / n_tokens.cast("double")
    punct_ratio = (
        F.length(F.regexp_replace(F.col("text"), r"[^.,!?;:]", ""))
        / F.length("text").cast("double")
    )
    avg_token_len = (
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        / n_tokens.cast("double")
    )
    score = (
        0.4 * distinct_ratio
        + 0.3 * (1 - stop_ratio)
        + 0.3 * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    )
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        avg_token_len.alias("avg_token_len"),
        distinct_ratio.alias("distinct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        score.alias("quality_score"),
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: CJK codepoint presence ⇒ zh, else stopword-hit
    argmax over {en, fr, de, es} with deterministic priority tie-break.
    Pure expression — at scale this is a free map-side projection."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.lower(F.col("text")))

    def _stop_count(words):
        arr = F.array(*[F.lit(w) for w in words])

        def _pred(t):  # single-arg: a 2-arg lambda means (element, index)
            return F.array_contains(arr, t)

        return F.size(F.filter(toks, _pred))

    score = {lang: _stop_count(words) for lang, words in STOPWORDS.items()}
    is_cjk = F.col("text").rlike(r"[一-鿿]")
    pred = F.when(is_cjk, "zh")
    for lang in LANG_PRIORITY:
        cond = None
        for other in LANG_PRIORITY:
            if other == lang:
                continue
            c = score[lang] >= score[other]
            cond = c if cond is None else cond & c
        pred = pred.when(cond, lang)
    return docs.select(
        "doc_id",
        F.col("lang").alias("label_lang"),
        *[score[lang].alias(f"score_{lang}") for lang in LANG_PRIORITY],
        pred.alias("predicted_lang"),
    )


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token statistics: whitespace tokens and BPE-ish regex
    tokens (words + punctuation marks) — partial-aggregated per source."""
    docs = load_table(spark, sf_dir, "documents")
    ws_tokens = F.size(tokens(F.col("text")))
    re_tokens = F.regexp_count(F.col("text"), F.lit(TOKEN_REGEX))
    per_doc = docs.select("source", ws_tokens.alias("ws"), re_tokens.alias("re"))
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.sum("ws").alias("ws_tokens"),
            F.sum("re").alias("regex_tokens"),
            (F.sum("ws") / F.count(F.lit(1))).alias("avg_ws_tokens"),
            F.min("ws").alias("min_ws_tokens"),
            F.max("ws").alias("max_ws_tokens"),
        )
        .orderBy("source")
    )


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: whole-content md5 plus the minimum token-hash
    (a 1-sig MinHash — the winnowing primitive)."""
    docs = load_table(spark, sf_dir, "documents")
    # explode → MIN agg (codegen) rather than an interpreted higher-order
    # transform; content_md5 rides along in the group key (1:1 with doc_id).
    tok = docs.select(
        "doc_id",
        F.md5(F.lower(F.trim("text"))).alias("content_md5"),
        F.explode(tokens(F.col("text"))).alias("tok"),
    )
    return (
        tok.groupBy("doc_id", "content_md5")
        .agg(F.min(md5_long("tok")).alias("min_token_hash"))
        .select("doc_id", "content_md5", "min_token_hash")
    )


RARE_DF_MAX = 2  # a token is "rare" if it appears in ≤ 2 documents


def rare_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level quality signal per document: mean inverse document
    frequency of its tokens (rational 1/df — log-free, same reason as
    tfidf's rational idf) and the fraction of tokens that are corpus-rare
    (df ≤ RARE_DF_MAX). High mean-IDF / rare_frac = gibberish or unique
    boilerplate; low = stopword soup. Complements ``text_quality``, whose
    signals are all doc-LOCAL — this one needs the corpus-wide df
    relation, which is exactly what makes it a distributed-engine op:
    token-grain tf, term-grain df, one join back, doc-grain aggregate,
    every shuffle at aggregate grain. Sums go through xsum (each 1/df is
    one exact double division, identical in both engines; the sum must be
    accumulation-order independent to survive any partitioning)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = _pin(
        tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return (
        tf.join(dfreq, "term")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            (
                xsum(F.col("tf").cast("double") / F.col("df"))
                / F.sum("tf").cast("double")
            ).alias("mean_inv_df"),
            (
                F.sum(
                    F.when(F.col("df") <= RARE_DF_MAX, F.col("tf")).otherwise(
                        F.lit(0)
                    )
                ).cast("double")
                / F.sum("tf")
            ).alias("rare_frac"),
        )
        .select("doc_id", "n_tokens", "mean_inv_df", "rare_frac")
    )


HH_K = 64  # Misra-Gries counters per partition (error ≤ n_tokens/(K+1))


def misra_gries(
    df: DataFrame, col: str, k: int = HH_K, split: str | None = None
) -> DataFrame:
    """Generic per-partition Misra–Gries sketch with mergeable summaries
    (Agarwal et al.) over any string-typed column: each partition streams
    its values through ``k`` counters in one pass (decrement-all when
    full), emits its k-row summary, and the summaries merge by termwise
    addition. The deterministic guarantee — NOT a probabilistic sketch:
    every value with true frequency > n/(k+1) is present, and each
    estimate lies in [true − n/(k+1), true] (per-partition
    under-estimation ≤ n_p/(k+1) sums to ≤ n/(k+1) under merge).

    Why it exists next to the exact ``groupBy(col).count()``: the exact
    plan's shuffle is key-cardinality-grain — fine for small domains,
    fatal when the key space is huge (URLs, n-grams, join keys). The
    sketch's shuffle carries ``partitions × k`` rows regardless of
    cardinality, and the per-partition pass is one dict in one Python
    loop over Arrow batches — bounded memory by construction. Also the
    skew-diagnosis primitive: run it on a join key before a big join to
    find the hot keys that need salting (functions/core.salted_agg) or
    AQE skew handling.

    ``split``: when the values are delimited token STREAMS (a text
    column), pass the delimiter instead of pre-exploding — the kernel
    tokenizes inside pandas (``str.split().explode().value_counts()``,
    all C-speed) and Arrow then carries document-grain rows, not
    token-grain (~100× less serialization on the corpus; measured
    10.9 s → 4.0 s on the 100× replica). The counter fold sees the same
    per-partition token stream, so the n/(k+1) guarantee is unchanged —
    only the partition layout differs (doc-grain vs token-grain), which
    the guarantee is invariant to.

    Returns (term, est_count) sorted by estimate. Partition-order
    dependent by construction (which low-count stragglers survive varies
    with layout) — the guarantee above is what is stable, and what
    tests/test_operators.py pins."""
    vals = df.select(F.col(col).alias("term"))

    def _mg(batches):
        # Vectorized mergeable-summaries form (Agarwal et al. §3): each
        # Arrow batch's exact value_counts IS a zero-error MG summary of
        # itself; fold it in by termwise addition (distinct-value-grain
        # Python, never row-grain), then reduce back to k counters by
        # subtracting the (k+1)-th largest count from every survivor —
        # the reduction that preserves the n/(k+1) error bound under
        # merge. Equivalent guarantees to the textbook per-item loop at
        # a fraction of the Python cost.
        counters: dict[str, int] = {}
        for pdf in batches:
            vc = (
                pdf["term"].str.split(split).explode().value_counts()
                if split is not None
                else pdf["term"].value_counts()
            )
            for term, c in vc.items():
                counters[term] = counters.get(term, 0) + int(c)
            if len(counters) > k:
                thresh = sorted(counters.values(), reverse=True)[k]
                counters = {
                    t: c - thresh for t, c in counters.items() if c > thresh
                }
        if counters:
            yield pd.DataFrame(
                {"term": list(counters), "cnt": list(counters.values())}
            )

    summaries = vals.mapInPandas(_mg, "term string, cnt long")
    return (
        summaries.groupBy("term")
        .agg(F.sum("cnt").alias("est_count"))
        .orderBy(F.desc("est_count"), "term")
    )


def approx_heavy_hitters(
    spark: SparkSession, sf_dir: str, *, k: int = HH_K
) -> DataFrame:
    """Frequent corpus terms via the generic ``misra_gries`` sketch —
    the registry-facing instantiation; guarantee + tiering notes on the
    generic function. Uses the fused ``split`` path (tokenize inside the
    pandas kernel) so Arrow carries the document relation, not the
    ~100×-larger exploded token relation; same whitespace token
    convention as ``tokens()``."""
    docs = load_table(spark, sf_dir, "documents")
    return misra_gries(docs, "text", k, split=" ")


def dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-n-gram signal per document: the fraction of a doc's
    distinct word-3-gram shingles that occur in at least one OTHER
    document (corpus document frequency ≥ 2) — the relational form of the
    cross-document duplicate-substring statistic used to flag
    boilerplate-contaminated training documents (exact-substring dedup
    literature; a doc can be unique as a whole yet mostly assembled from
    corpus-duplicated spans, which per-doc signals like repetition_stats
    cannot see). Docs with fewer than SHINGLE_N tokens have no shingles
    and are absent, matching the shingle relation on both engines.

    Scale shape: word-count on the shingle key (map-side partial agg),
    then a join back on the same key — co-partitioned with the aggregate's
    exchange, so one extra shuffle of the shingle relation at most — and a
    doc-grain aggregate. No UDFs, no driver traffic; the shingle relation
    is persisted once because both the df aggregate and the join consume
    it."""
    sh = _pin(_shingle_table(spark, sf_dir))
    dfreq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    return (
        sh.join(dfreq, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("df") >= 2).cast("long")).alias("n_dup_shingles"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_dup_shingles",
            (
                F.col("n_dup_shingles").cast("double")
                / F.col("n_shingles").cast("double")
            ).alias("dup_fraction"),
        )
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005 — public): the
# point-query member of the mergeable-sketch family (heavy hitters =
# Misra–Gries, distinct = HLL, quantiles = t-digest, membership = Bloom;
# CM answers "how often did THIS key occur" with one-sided error)

CM_W = 256  # sketch width: overcount ≤ N/w per row in expectation
CM_D = 4  # depth: min over d independent rows → P(err > 2N/w) ≤ 2^-d
CM_QUERY_K = 20  # estimates plan: top-k + bottom-k true terms queried


def _cm_cells(tok_col, w: int, d: int):
    """The d (row, cell) pairs of one token under the seeded md5 family
    — identical bits in Spark and DuckDB (functions.core.md5_long), so
    the sketch is DETERMINISTIC and exactly oracle-checkable, unlike
    RNG-seeded sketch implementations."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("r"),
                F.pmod(
                    md5_long(F.concat(F.lit(f"cm{i}#"), tok_col)),
                    F.lit(w),
                )
                .cast("int")
                .alias("cell"),
            )
            for i in range(d)
        ]
    )


def countmin_sketch(
    spark: SparkSession, sf_dir: str, *, w: int = CM_W, d: int = CM_D
) -> DataFrame:
    """The Count-Min sketch of corpus token frequencies as a RELATION:
    (r, cell, cnt) — at most d×w rows at ANY corpus size, the bounded
    mergeable state a streaming/incremental counter ships instead of a
    full term dictionary. Counts are LINEAR, so the merge is a cell-wise
    sum and fold ≡ recompute holds BIT-exactly (pinned in
    tests/test_operators.py — the cleanest fold contract in the sketch
    family; digests only give a band).

    Scale shape: one token explode, a d-way cell fanout (skinny ints),
    and ONE groupBy at (r, cell) grain — partial aggregation collapses
    map-side, the shuffle carries ≤ d×w rows per map task regardless of
    corpus size. No UDFs; md5-seeded hashing keeps it engine-exact."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    return (
        tok.select(F.explode(_cm_cells(F.col("tok"), w, d)).alias("rc"))
        .select(F.col("rc.r").alias("r"), F.col("rc.cell").alias("cell"))
        .groupBy("r", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_estimates(
    spark: SparkSession,
    sf_dir: str,
    *,
    w: int = CM_W,
    d: int = CM_D,
    k: int = CM_QUERY_K,
) -> DataFrame:
    """Point-query demonstration with its own ground truth: the k most
    frequent and k least frequent corpus terms (deterministic ties on
    term text), each with its TRUE count and its CM estimate
    (min over the d sketch rows). One-sided error by construction
    (estimate ≥ truth, overcounts only — hash collisions add, never
    subtract); the ε-δ band is pinned in tests. Returns
    (term, true_count, cm_estimate), fully oracle-exact."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    counts = _pin(
        tok.groupBy("tok").agg(F.count(F.lit(1)).alias("true_count"))
    )
    top = F.row_number().over(
        Window.orderBy(F.desc("true_count"), "tok")
    )
    bot = F.row_number().over(
        Window.orderBy(F.asc("true_count"), "tok")
    )
    queried = (
        counts.withColumn("rk_top", top)
        .withColumn("rk_bot", bot)
        .filter((F.col("rk_top") <= k) | (F.col("rk_bot") <= k))
        .select("tok", "true_count")
    )
    sketch = countmin_sketch(spark, sf_dir, w=w, d=d)
    probes = queried.select(
        "tok",
        "true_count",
        F.explode(_cm_cells(F.col("tok"), w, d)).alias("rc"),
    ).select(
        "tok", "true_count", F.col("rc.r").alias("r"), F.col("rc.cell").alias("cell")
    )
    return (
        probes.join(F.broadcast(sketch), ["r", "cell"])
        .groupBy(F.col("tok").alias("term"), "true_count")
        .agg(F.min("cnt").alias("cm_estimate"))
        .select("term", "true_count", "cm_estimate")
    )


def merge_countmin(*sketches: DataFrame) -> DataFrame:
    """Fold Count-Min states (the incremental-maintenance entry point):
    union + cell-wise sum. Counts are linear, so this is EXACT —
    fold(b1, b2) is bit-identical to the batch-free sketch."""
    unioned = sketches[0]
    for s in sketches[1:]:
        unioned = unioned.unionByName(s)
    return unioned.groupBy("r", "cell").agg(F.sum("cnt").alias("cnt"))


# ---------------------------------------------------------------------------
# similarity search over embeddings

#: the embeddings table's fixed vector width (TESTDATA.md).
EMB_DIMS = 64


def _dot_expr(a, b):
    """Bit-parity dot product: left fold of a[i]*b[i] in index order,
    seeded with ``lit(0.0)`` — the identical association as the oracle's
    DuckDB ``list_reduce``, so the doubles agree bit-for-bit.

    Form note (measured, sf0.1 local[32]): an UNROLLED 64-term literal
    ``+`` chain was tried and is strictly worse on every axis — ~256 py4j
    round-trips to build (~0.3 s/expression at plan time), janino refuses
    the generated method (a single expression cannot be split across
    generated methods) so the operator falls back to interpreted anyway,
    and the interpreted unrolled tree evaluates ~3× SLOWER than this
    higher-order fold (per-element GetArrayItem is branchier than the
    fold's sequential array walk). The fold is one py4j call, a tiny
    Catalyst tree, and ~1 µs per 64-dim dot interpreted — dot volume is
    never the bottleneck in these plans; pair-stage PARTITIONING is (see
    semantic_dedup_bucketed). For true vectorized scoring the production
    shape is an Arrow-batched numpy kernel (see ann_lsh_topk's bucket
    UDF), not a bigger expression tree."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm_expr(a):
    """L2 norm, same fold association as the oracle side. Compute at
    VECTOR grain (``_embeddings_normed``), never per pair: O(n) norm work
    instead of O(pairs), bit-identical to an inline norm (same expression
    over the same value)."""
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def _cos_expr(a, b):
    """Inline cosine = dot/(na·nb). Convenience for one-pass plans; join
    plans should precompute norms at vector grain (``_embeddings_normed``)
    and evaluate only the dot per pair — same bits, 3× less fold work."""
    return _dot_expr(a, b) / (_norm_expr(a) * _norm_expr(b))


def _embeddings_double(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


def _embeddings_normed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings with the L2 norm precomputed at vector grain — the one
    projection pass every cosine join reuses (see _cos_expr docstring)."""
    return _embeddings_double(spark, sf_dir).withColumn(
        "nrm", _norm_expr(F.col("v"))
    )


def knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for each query vector (vec_id <
    10) — the exact ANN baseline. The tiny query set is broadcast against
    the corpus: zero shuffle for the scoring pass; only the per-query top-k
    window shuffles (10 × k rows)."""
    emb = _embeddings_normed(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    scored = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                _dot_expr(F.col("qv"), F.col("v"))
                / (F.col("qn") * F.col("nrm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised hard-negative mining for contrastive/triplet training
    (the FaceNet semi-hard mining step, run as a batch job over the
    embedding table): for each anchor (the ``knn_cosine_topk`` query
    convention, vec_id < 10), the top-5 most-similar vectors with a
    DIFFERENT label — the negatives a contrastive loss learns most
    from — each annotated with the anchor's hardest POSITIVE cosine
    (max over same-label vectors), the triplet margin
    ``pos_cosine − cosine``, and the semi-hard bit
    (negative closer than nothing but farther than the hardest
    positive: ``cosine < pos_cosine``).

    Scale shape: identical to the exact-kNN baseline — the bounded
    anchor set broadcasts against the corpus, the scoring pass is
    shuffle-free, and only per-anchor top-k/max windows shuffle
    (anchors × k rows). At full corpus-as-anchors scale the candidate
    generation swaps to the IVF path (``ann_ivf_topk``) with this same
    label-filter + margin tail — the exactly-checkable core is the
    dispatch-free version. Float parity: cosine is the proven knn
    arithmetic class; pos_cosine is a MAX of identically-computed
    doubles and margin their difference (the preference_pairs margin
    precedent), so the row is oracle-EXACT."""
    emb = _embeddings_normed(spark, sf_dir).join(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "label"),
        "vec_id",
    )
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.col("label").alias("qlabel"),
    )
    scored = emb.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "qlabel",
        F.col("vec_id").alias("neighbor_id"),
        "label",
        (
            _dot_expr(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
        ).alias("cosine"),
    )
    pos = (
        scored.filter(F.col("label") == F.col("qlabel"))
        .groupBy("query_id")
        .agg(F.max("cosine").alias("pos_cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.filter(F.col("label") != F.col("qlabel"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .join(pos, "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            "cosine",
            "pos_cosine",
            (F.col("pos_cosine") - F.col("cosine")).alias("margin"),
            (F.col("cosine") < F.col("pos_cosine")).alias("semi_hard"),
        )
        .orderBy("query_id", "rank")
    )


def hard_negative_mining_ann(
    spark: SparkSession, sf_dir: str, *, top_k: int = 5
) -> DataFrame:
    """The IVF scale path of ``hard_negative_mining`` (the swap its
    docstring names): negative CANDIDATES come from the trained-IVF
    probe join (``ann_ivf_topk`` machinery — nearest-cluster
    assignment, √k-probe rule, cluster equi-join) instead of the
    brute-force broadcast scan, then the same label filter, top-k
    window, exact same-label positive max, margin and semi-hard tail.
    Rows-only BY CONSTRUCTION (approximate candidates); the exact twin
    is the oracle-checked baseline, and the pytest gate pins negative
    recall ≥ 0.9 against it (the ANN family convention,
    tests/test_plans.py). Same schema as the exact plan."""
    emb = _pin(
        _embeddings_normed(spark, sf_dir).join(
            load_table(spark, sf_dir, "embeddings").select(
                "vec_id", "label"
            ),
            "vec_id",
        )
    )
    cent_ids, cmat, cn = _train_centroids(
        emb, cache_key=sf_dir, foldexact=False
    )
    # NEGATIVE mining probes 3× deeper than neighbor search: the
    # nearest different-label vectors are systematically farther than
    # same-label neighbors, scattering across more cells — ⌈√k⌉ probes
    # measured 0.62/0.72 negative recall (sf0.001/sf0.01), 3⌈√k⌉
    # restores 1.00 at both; probe cost stays O(√k) clusters
    k = cmat.shape[0]
    nprobe = min(k, max(IVF_NPROBE, int(3 * np.ceil(np.sqrt(k)))))
    assign1 = _assign_clusters_udf(cent_ids, cmat, cn, 1, foldexact=False)
    assign_probe = _assign_clusters_udf(
        cent_ids, cmat, cn, nprobe, foldexact=False
    )
    assigned = emb.select(
        "vec_id",
        "v",
        "nrm",
        "label",
        F.explode(assign1(F.col("v"), F.col("nrm"))).alias("cluster"),
    )
    q = emb.filter(F.col("vec_id") < 10)
    probes = q.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("label").alias("qlabel"),
        F.col("nrm").alias("qn"),
        F.explode(assign_probe(F.col("v"), F.col("nrm"))).alias("cluster"),
    )
    pair_dot = _pair_dot_udf(foldexact=False)
    neg = (
        probes.join(assigned, "cluster")
        .filter(
            (F.col("vec_id") != F.col("query_id"))
            & (F.col("label") != F.col("qlabel"))
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                pair_dot(F.col("qv"), F.col("v"))
                / (F.col("qn") * F.col("nrm"))
            ).alias("cosine"),
        )
        # a query probing p clusters can meet the same candidate once
        # per (its own explode row); dedup at pair grain before ranking
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cosine").alias("cosine"))
    )
    # the hardest positive stays EXACT (same-label max, the exact twin's
    # arithmetic) — only negative candidate generation is approximate
    anchors = q.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.col("label").alias("qlabel"),
    )
    pos = (
        emb.join(F.broadcast(anchors), F.col("vec_id") != F.col("query_id"))
        .filter(F.col("label") == F.col("qlabel"))
        .select(
            "query_id",
            (
                pair_dot(F.col("qv"), F.col("v"))
                / (F.col("qn") * F.col("nrm"))
            ).alias("cosine"),
        )
        .groupBy("query_id")
        .agg(F.max("cosine").alias("pos_cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        neg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .join(pos, "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            "cosine",
            "pos_cosine",
            (F.col("pos_cosine") - F.col("cosine")).alias("margin"),
            (F.col("cosine") < F.col("pos_cosine")).alias("semi_hard"),
        )
        .orderBy("query_id", "rank")
    )


def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: all pairs with cosine ≥ 0.4. Quadratic
    (exact baseline) — the LSH-bucketed plan is the scale path."""
    emb = _embeddings_normed(spark, sf_dir)
    # the streamed side of the nested-loop pair join inherits the scan's
    # partitioning (often ONE small file) — spread it so the quadratic
    # pass uses every core instead of one
    a = emb.repartition(spark.sparkContext.defaultParallelism).select(
        F.col("vec_id").alias("vec_a"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            (
                _dot_expr(F.col("va"), F.col("vb"))
                / (F.col("na") * F.col("nb"))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= COSINE_THRESHOLD)
    )


def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style leader dedup (Abbas et al. 2023, public): a vector
    survives iff no lower-id vector is cosine-similar above threshold —
    the greedy-by-id approximation of clustering-based semantic dedup
    (no transitive closure: b is removed if ANY a < b is similar, even if
    a was itself removed — the standard corpus-dedup convention, one
    anti-join instead of an iterative connected-components pass).
    Composes the exact near-dup pair relation with a left anti join."""
    emb = _embeddings_double(spark, sf_dir)
    removed = embedding_near_dup(spark, sf_dir).select(
        F.col("vec_b").alias("vec_id")
    )
    return (
        emb.join(removed, "vec_id", "left_anti")
        .select("vec_id")
        .orderBy("vec_id")
    )


KMEANS_ROWS_PER_CENT = 50  # corpus rows per centroid: k = ceil(n / 50)...
KMEANS_MAX_K = 4096  # ...capped: k must stay broadcast/driver-holdable
# (4096 × 64 doubles ≈ 2 MB). Uncapped, k = n/50 grows linearly with the
# corpus and the "k-grain collect" claim silently becomes corpus-grain at
# 100 TB; with the cap, clusters get bigger instead — the correct trade,
# since cluster size only bounds the candidate equi-join fan-in.
KMEANS_ITERS = 2  # Lloyd iterations (unrolled in the DuckDB oracle too)
IVF_NPROBE = 3  # query-side probes (ann_ivf_topk and the postings path)
IVF_TOP_K = 5  # neighbors returned per query
IVF_N_QUERIES = 50  # registry query set: vec_id < 50
SEMDEDUP_NPROBE = 3  # multi-probe: each vector joins its 3 nearest clusters


def _foldexact_row_dots(mat: "np.ndarray", vec: "np.ndarray") -> "np.ndarray":
    """Row dots of ``mat`` (n, d) against one vector ``vec`` (d,) with the
    SAME summation order as the Catalyst/DuckDB left fold: elementwise
    products, then a cumulative sum — numpy's cumsum accumulates strictly
    left-to-right (unlike np.sum/np.dot/np.matmul, which reassociate via
    pairwise/SIMD/BLAS summation), so the result is bit-identical to
    ``_dot_expr``. The trailing ``+ 0.0`` mirrors the fold's 0.0 seed
    (normalizes a -0.0 total). This is the vectorized escape hatch for
    bulk dot volume: the interpreted fold costs ~12-16 µs per 64-dim dot
    (measured — 94 s CPU for the 8M assignment dots at 10× sf0.1), the
    cumsum kernel runs at C speed with identical bits."""
    return (mat * vec).cumsum(axis=1)[:, -1] + 0.0


def _pair_dot_udf(foldexact: bool = True):
    """Arrow-batched pair dot at ~100× the interpreted-fold throughput.
    With ``foldexact`` (default) the cumsum kernel is bit-identical to
    ``_dot_expr(a, b)`` — required on oracle-replayed paths; with it off,
    a plain vectorized multiply-sum (reassociated, low-bit differences
    only) for rows-only consumers. Use for pair-grain scoring volume; the
    expression form stays fine for vector-grain norms."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _dot(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        ma = np.vstack(a.to_numpy())
        mb = np.vstack(b.to_numpy())
        if foldexact:
            return pd.Series((ma * mb).cumsum(axis=1)[:, -1] + 0.0)
        return pd.Series((ma * mb).sum(axis=1))

    return _dot


def _row_norms(cmat: "np.ndarray") -> "np.ndarray":
    """Per-row L2 norms with the fold's summation order (cumsum of
    squares, +0.0 seed) — bit-identical to ``_norm_expr`` / the oracle's
    seedless ``list_reduce`` (squares are non-negative, so the 0.0 seed
    is a bitwise no-op)."""
    return np.sqrt((cmat * cmat).cumsum(axis=1)[:, -1] + 0.0)


#: One entry per (corpus key, knob tuple):
#: {(cache_key, rows_per_centroid, max_k, iters): (fingerprint, result)}.
#: The fingerprint (row count + max vec_id) invalidates the entry if the
#: corpus at that path is regenerated in-place; same-path same-shape edits
#: that preserve both are not detected — call clear_centroid_cache() after
#: rewriting a corpus without changing its cardinality.
_CENTROID_CACHE: dict[str, tuple] = {}


def clear_centroid_cache() -> None:
    """Drop all memoized trained index metadata — IVF centroids AND PQ
    codebooks (e.g. after mutating a corpus in a way the
    count+max-vec_id fingerprint cannot see)."""
    _CENTROID_CACHE.clear()
    _PQ_CACHE.clear()


def _train_centroids(
    emb: DataFrame,
    cache_key: str | None = None,
    *,
    rows_per_centroid: int = KMEANS_ROWS_PER_CENT,
    max_k: int = KMEANS_MAX_K,
    iters: int = KMEANS_ITERS,
    foldexact: bool = True,
):
    """Deterministic seeded k-means over the corpus: Forgy init on the k
    vectors with the smallest ``md5(vec_id)`` (a hash-ordered uniform
    sample — reproducible across engines, unlike RNG state), then
    ``KMEANS_ITERS`` Lloyd iterations. Replaces the untrained
    every-50th-vector rule (round-4 verdict item 3): on clustered real
    data modulo sampling gives arbitrary centroids and unbounded cluster
    skew in the downstream equi-join; k-means centroids track the actual
    density.

    Driver traffic is k-grain ONLY: the init top-k collect (k rows), and
    one (k × dims)-row collect per iteration — the aggregate-scale
    relation every IVF system holds driver/broadcast-side. Assignment is
    the zero-shuffle Arrow kernel (_assign_clusters_udf); the update is
    the embedding_centroids exact-mean pattern (posexplode → per-dim
    xsum partial aggregation — the shuffle carries (k × dims) partial
    sums, never raw vectors), so every step is bit-reproducible by the
    DuckDB oracle (_kmeans_cents_sql): xsum is order-independent
    fixed-point, the cosine is the shared left fold, ties break on the
    centroid ordinal. Empty clusters keep their previous centroid (same
    COALESCE rule oracle-side).

    Returns (ords (k,) 1-based centroid ordinals in md5 order,
    cmat (k, d), cn (k,)).

    The sizing/iteration knobs (``rows_per_centroid``, ``max_k``,
    ``iters``) default to the module constants the registry plans and
    their DuckDB oracles are built from — override them to tune an index
    without editing the package (the memo key includes them).

    Results are memoized per corpus key: training is a pure function of
    the data (hash-seeded init, order-independent fixed-point means), so
    the same corpus always yields the same centroids — repeat invocations
    (both IVF consumers, warm-up + timed bench runs) skip the training
    jobs. A cheap fingerprint (row count + max vec_id) guards the hit so
    a corpus regenerated at the same path retrains instead of silently
    reusing stale centroids; see clear_centroid_cache() for edits the
    fingerprint cannot see.
    """
    import math

    n = emb.count()
    fp = None
    memo_key = (cache_key, rows_per_centroid, max_k, iters, foldexact)
    if cache_key is not None:
        fp = (n, emb.agg(F.max("vec_id")).first()[0])
        hit = _CENTROID_CACHE.get(memo_key)
        if hit is not None and hit[0] == fp:
            return hit[1]
    k = min(max(1, int(math.ceil(n / rows_per_centroid))), max_k)
    init_rows = (
        emb.select(
            "vec_id", "v", F.md5(F.col("vec_id").cast("string")).alias("h")
        )
        .orderBy("h", "vec_id")
        .limit(k)
        .collect()
    )
    cmat = np.array([list(r.v) for r in init_rows], dtype=np.float64)
    ords = np.arange(1, k + 1, dtype=np.int64)
    cn = _row_norms(cmat)
    for _ in range(iters):
        assign1 = _assign_clusters_udf(ords, cmat, cn, 1, foldexact=foldexact)
        ex = emb.select(
            F.element_at(assign1(F.col("v"), F.col("nrm")), 1).alias("cluster"),
            "v",
        ).select("cluster", F.posexplode("v").alias("dim", "val"))
        rows = (
            ex.groupBy("cluster", "dim")
            .agg((xsum("val") / F.count("val")).alias("mean"))
            .collect()
        )
        new_cmat = cmat.copy()  # empty clusters keep their old centroid
        for r in rows:
            new_cmat[int(r.cluster) - 1, int(r.dim)] = r.mean
        cmat = new_cmat
        cn = _row_norms(cmat)
    if cache_key is not None:
        _CENTROID_CACHE[memo_key] = (fp, (ords, cmat, cn))
    return ords, cmat, cn


def _assign_clusters_udf(cent_ids, cmat, cn, nprobe: int, foldexact: bool = True):
    """Map-side top-``nprobe`` centroid assignment as an Arrow-batched
    kernel: per record batch, one dot pass per centroid and a
    stable argsort — ZERO shuffle, and no giant interpreted expression.

    ``foldexact`` picks the summation kernel: the left-fold cumsum
    (bit-identical to the Catalyst/DuckDB fold — REQUIRED wherever a
    DuckDB oracle replays the assignment, i.e. semantic_dedup_bucketed)
    or a BLAS matmul (``mat @ cmat.T`` — reassociated summation, low-bit
    differences only, but an order of magnitude faster; the right choice
    for rows-only consumers like ann_ivf_topk, whose gate is a recall
    bound, not a value hash). Same stable tie-break either way.

    Two rejected shapes, both measured at 10× sf0.1:
    - broadcast fanout join + row_number window: shuffles k×N rows (8M
      here; a hundred-billion-row shuffle at the 100-TB design point) for
      what is a per-row arg-top-k. Assignment is embarrassingly row-local
      and must never shuffle.
    - per-row transform/array_sort expression over a one-row centroid
      array: zero shuffle but interpreted — 94 s CPU for 20k vectors ×
      400 centroids.

    Selection matches the oracle's ``ROW_NUMBER() OVER (ORDER BY cent_cos
    DESC, cent_id)`` exactly: dots and cosines are bit-identical to the
    fold (_foldexact_row_dots), negation is exact, and the stable argsort
    over centroids pre-sorted by cent_id reproduces the tie-break."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<bigint>")
    def _top(v: pd.Series, nrm: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="object")
        mat = np.vstack(v.to_numpy())
        k = cmat.shape[0]
        if foldexact:
            cos = np.empty((mat.shape[0], k))
            for j in range(k):
                cos[:, j] = _foldexact_row_dots(mat, cmat[j]) / (
                    nrm.to_numpy() * cn[j]
                )
        else:
            cos = (mat @ cmat.T) / np.outer(nrm.to_numpy(), cn)
        order = np.argsort(-cos, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(cent_ids[order]))

    return _top


def ivf_cluster_stats(
    spark: SparkSession,
    sf_dir: str,
    *,
    rows_per_centroid: int = KMEANS_ROWS_PER_CENT,
    max_k: int = KMEANS_MAX_K,
) -> DataFrame:
    """Index-balance diagnostic for the trained IVF — the counterpart of
    ``minhash_band_stats`` for the embedding side: one row per cluster
    with its size and the candidate-pair volume the cluster equi-join
    generates for it (C(size, 2)). Run before a big semantic-dedup/ANN
    job: the max cluster size bounds the join's per-key fan-in, and a
    degenerate mega-cluster here is the signal to raise k
    (``rows_per_centroid`` down) or retrain. The same statistic
    tests/test_skew.py bounds on the adversarial corpus, exposed as a
    user-callable relation (rows-only: cluster ids are index-internal)."""
    emb = _embeddings_normed(spark, sf_dir)
    cent_ids, cmat, cn = _train_centroids(
        emb,
        cache_key=sf_dir,
        rows_per_centroid=rows_per_centroid,
        max_k=max_k,
        foldexact=False,
    )
    assign1 = _assign_clusters_udf(cent_ids, cmat, cn, 1, foldexact=False)
    return (
        emb.select(
            F.element_at(assign1(F.col("v"), F.col("nrm")), 1).alias("cluster")
        )
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("size"))
        .select(
            "cluster",
            "size",
            F.expr("size * (size - 1) div 2").alias("pair_volume"),
        )
        .orderBy(F.desc("size"), "cluster")
    )


# ---------------------------------------------------------------------------
# incremental IVF maintenance (VERDICT r11 item 5): the embedding twin of
# incremental_minhash_near_dup — fold new vectors into a TRAINED index


def _assign_cos_udf(cent_ids, cmat, cn, foldexact: bool = False):
    """Top-1 assignment WITH its cosine — the quality signal the drift
    statistic reads (an append batch the trained centroids no longer fit
    assigns with visibly lower cosines). Same Arrow-batched zero-shuffle
    kernel and stable tie-break as ``_assign_clusters_udf``, with the
    same ``foldexact`` switch: the cumsum kernel is bit-identical to the
    oracle's left-fold cosine (required on the oracle-replayed
    ivf_drift_stats path); BLAS otherwise."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<cluster: bigint, cos: double>")
    def _top1(v: pd.Series, nrm: pd.Series) -> pd.DataFrame:
        if len(v) == 0:
            return pd.DataFrame({"cluster": [], "cos": []})
        mat = np.vstack(v.to_numpy())
        if foldexact:
            k = cmat.shape[0]
            cos = np.empty((mat.shape[0], k))
            for j in range(k):
                cos[:, j] = _foldexact_row_dots(mat, cmat[j]) / (
                    nrm.to_numpy() * cn[j]
                )
        else:
            cos = (mat @ cmat.T) / np.outer(nrm.to_numpy(), cn)
        best = np.argsort(-cos, axis=1, kind="stable")[:, 0]
        return pd.DataFrame(
            {
                "cluster": cent_ids[best],
                "cos": cos[np.arange(len(best)), best],
            }
        )

    return _top1


def ivf_index_postings(emb: DataFrame, cent_ids, cmat, cn) -> DataFrame:
    """The persistable IVF postings relation for a FROZEN centroid set:
    (vec_id, v, nrm, cluster) — the state an append-only embedding
    pipeline maintains across ingest batches (write it bucketed on
    ``cluster``, sources/writers.write_bucketed, and the probe-side
    candidate equi-join needs no exchange on the index side). Assignment
    is the zero-shuffle Arrow kernel; per-row results depend only on the
    row and the frozen centroids, never on batch boundaries — which is
    what makes the fold below exact, not approximate."""
    assign1 = _assign_clusters_udf(cent_ids, cmat, cn, 1, foldexact=False)
    return emb.select(
        "vec_id",
        "v",
        "nrm",
        F.element_at(assign1(F.col("v"), F.col("nrm")), 1).alias("cluster"),
    )


def fold_ivf_postings(
    postings: DataFrame, new_emb: DataFrame, cent_ids, cmat, cn
) -> DataFrame:
    """Fold a NEW embedding batch into an existing IVF index WITHOUT
    retraining: assign the DELTA ONLY against the frozen centroids and
    append its postings. Per-batch work is delta-grain end to end (the
    base side is the already-materialized postings relation).

    Fold ≡ rebuild contract (pinned in tests/test_operators.py): because
    assignment is row-local against frozen centroids,
    ``fold(postings(base), delta)`` equals ``ivf_index_postings(base ∪
    delta)`` EXACTLY — the same fold ≡ recompute shape as
    incremental_exact_dedup, and bit-equality rather than a band.
    What folding does NOT do is move the centroids: append batches the
    training distribution no longer represents degrade recall, which is
    the statistic ``ivf_drift_stats`` watches (retrain trigger)."""
    return postings.unionByName(
        ivf_index_postings(new_emb, cent_ids, cmat, cn)
    )


def ann_topk_over_postings(
    postings: DataFrame,
    queries: DataFrame,
    cent_ids,
    cmat,
    cn,
    *,
    nprobe: int | None = None,
    top_k: int = IVF_TOP_K,
) -> DataFrame:
    """ANN top-k served from a GIVEN postings relation (built by
    ``ivf_index_postings`` / grown by ``fold_ivf_postings``) — the query
    path of the incrementally-maintained index. Same probe + cluster
    equi-join + per-query window as ``ann_ivf_topk``; queries is a
    (vec_id, v, nrm) relation."""
    if nprobe is None:
        nprobe = max(IVF_NPROBE, int(np.ceil(np.sqrt(cmat.shape[0]))))
    assign_probe = _assign_clusters_udf(
        cent_ids, cmat, cn, nprobe, foldexact=False
    )
    probes = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.explode(assign_probe(F.col("v"), F.col("nrm"))).alias("cluster"),
    )
    pair_dot = _pair_dot_udf(foldexact=False)
    scored = (
        probes.join(postings, "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                pair_dot(F.col("qv"), F.col("v"))
                / (F.col("qn") * F.col("nrm"))
            ).alias("cosine"),
        )
    )
    w_top = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), "neighbor_id"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_top))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def ivf_drift_stats(
    spark: SparkSession, sf_dir: str, *, foldexact: bool = True
) -> DataFrame:
    """Registry plan: the RETRAIN TRIGGER for an incrementally-maintained
    IVF — per-cluster drift between the index's training data and an
    append stream, over a deterministic 80/20 vec_id split of the
    embeddings table (train on the first 80%, fold the rest).

    Per cluster: base/delta posting counts, each side's share of its
    total (the two distributions whose total-variation distance
    ``0.5·Σ|base_share−delta_share|`` is the standard shift statistic),
    and each side's mean top-1 assignment cosine (fit quality — an
    append batch the centroids no longer represent assigns with visibly
    lower cosine before it ever hurts recall). Retrain when the TV
    distance or the cosine drop crosses the pipeline's threshold;
    responsiveness (shifted appends score strictly worse than iid
    appends) is pinned in tests/test_operators.py.

    ORACLE-EXACT (upgraded from rows-only, r12): the whole statistic is
    deterministic given the fold-exact kernels — the DuckDB oracle
    replays the k-means training on the same base split (the
    ``_kmeans_cents_sql`` chain semantic_dedup_bucketed pins), the
    top-1 assignment with the same left-fold cosine and ordinal
    tie-break, and xsum fixed-point cosine means — so even the index's
    internal cluster ids value-hash-match across engines.

    ``foldexact`` (default True — the oracle-replayed registry mode)
    selects the bit-exact cumsum kernels; pass False at production
    scale, where k reaches thousands and the per-centroid exact loop is
    an order of magnitude slower than BLAS — a retrain trigger needs
    the drift signal, not bit-reproducibility (same dual-mode policy as
    _assign_clusters_udf; measured BLAS scale row in BASELINE.md)."""
    emb = _pin(_embeddings_normed(spark, sf_dir))
    hi = emb.agg(F.max("vec_id")).first()[0]
    if hi is None:
        raise ValueError("no embeddings")  # clear, like the PCA guard
    cut = int(hi * 4) // 5
    base = emb.filter(F.col("vec_id") <= cut)
    delta = emb.filter(F.col("vec_id") > cut)
    cent_ids, cmat, cn = _train_centroids(
        base,
        cache_key=f"{sf_dir}#drift{cut}",
        foldexact=foldexact,
    )
    a = _assign_cos_udf(cent_ids, cmat, cn, foldexact=foldexact)
    tagged = base.withColumn("tag", F.lit("base")).unionByName(
        delta.withColumn("tag", F.lit("delta"))
    )
    per = tagged.select(
        "tag", a(F.col("v"), F.col("nrm")).alias("ac")
    ).select("tag", F.col("ac.cluster").alias("cluster"), F.col("ac.cos").alias("cos"))
    is_b = F.col("tag") == "base"
    base_n = F.count(F.when(is_b, 1))
    delta_n = F.count(F.when(~is_b, 1))
    agg = per.groupBy("cluster").agg(
        base_n.alias("base_size"),
        delta_n.alias("delta_size"),
        # xsum (order-independent fixed point), NOT avg: a float mean's
        # summation order would diverge from the oracle's scan order
        F.when(
            base_n > 0, xsum(F.when(is_b, F.col("cos"))) / base_n
        ).alias("base_mean_cos"),
        F.when(
            delta_n > 0, xsum(F.when(~is_b, F.col("cos"))) / delta_n
        ).alias("delta_mean_cos"),
    )
    w_all = Window.partitionBy()
    shares = agg.select(
        "cluster",
        "base_size",
        "delta_size",
        (F.col("base_size") / F.sum("base_size").over(w_all)).alias(
            "base_share"
        ),
        (F.col("delta_size") / F.sum("delta_size").over(w_all)).alias(
            "delta_share"
        ),
        "base_mean_cos",
        "delta_mean_cos",
    )
    return shares.select(
        "cluster",
        "base_size",
        "delta_size",
        "base_share",
        "delta_share",
        F.abs(F.col("base_share") - F.col("delta_share")).alias(
            "share_drift"
        ),
        "base_mean_cos",
        "delta_mean_cos",
    ).orderBy(F.desc("share_drift"), "cluster")


def semantic_dedup_bucketed(
    spark: SparkSession,
    sf_dir: str,
    *,
    nprobe: int = SEMDEDUP_NPROBE,
    rows_per_centroid: int = KMEANS_ROWS_PER_CENT,
    max_k: int = KMEANS_MAX_K,
    collapse: str = "auto",
) -> DataFrame:
    """Scale-safe SemDeDup: IVF-bucketed candidate pairs instead of the
    exact twin's O(n²) cross join (``semantic_dedup`` above — correct but
    a 100-TB non-starter, round-1 verdict item 3). The index knobs
    (``nprobe``, ``rows_per_centroid``, ``max_k``) default to the module
    constants the registry plan and oracle use; override to trade recall
    against candidate volume without editing the package.

    Shape: deterministic seeded k-means centroids (_train_centroids —
    hash-ordered Forgy init + Lloyd iterations, k-grain driver traffic
    only) are broadcast; each vector is assigned to
    its ``SEMDEDUP_NPROBE`` nearest centroids (multi-probe assignment
    recovers pairs that straddle a cluster boundary); candidate pairs come
    from a **cluster equi-join** (shuffle keyed on cluster id — bounded by
    cluster size, never all-pairs); then the same threshold + leader
    anti-join as the exact twin. No CartesianProduct anywhere: the
    centroid fan-out is a broadcast nested-loop over a k-row relation
    (plan-asserted in tests/test_plans.py).

    Exactly oracle-checked — same pattern as minhash_near_dup: the DuckDB
    oracle reproduces the *bucketing algorithm itself* (identical centroid
    rule, identical left-fold cosine bits, identical rn tie-break), so the
    gate compares deterministic algorithm output, not a recall-dependent
    approximation. Recall vs the exact twin is asserted separately at
    sf0.01 (tests/test_operators.py::test_semantic_dedup_bucketed_recall;
    plan shape in tests/test_plans.py).

    Skew hardening — exact-vector pre-collapse: duplicate-heavy corpora
    (the 100-TB norm; every crawl replica carries the same embeddings)
    otherwise make the cluster equi-join quadratic in the duplication
    factor AND let duplicates weight the k-means means. Identical vectors
    are collapsed to their min vec_id first (groupBy the vector value —
    bitwise equality, partial-aggregated map-side), the index trains and
    pairs generate at canonical grain, and the survivor set needs no
    expansion at all: a non-canonical member always has cosine 1.0 ≥
    threshold with its lower-id canonical twin, so it can never survive —
    survivors are exactly the surviving canonical ids. Mirrored verbatim
    in the DuckDB oracle (GROUP BY the list value), so the plan stays
    exactly value-hash checkable; on a duplicate-free corpus the collapse
    is the identity and the algorithm is bit-unchanged — which is what
    makes the ``collapse="auto"`` regime dispatch safe: the
    ``_all_distinct`` probe (one 1-row agg over xxhash of the vector;
    collisions only ever KEEP the collapse) skips the group-by machinery
    exactly when it is provably the identity, so both branches are
    bit-identical where the skip can fire (pinned in
    tests/test_operators.py). Unlike the Jaccard plan, skipping on a
    corpus WITH duplicates would change k-means training weights and
    break oracle parity — hence the exact-distinct condition, not a
    ratio threshold.
    """
    # emb feeds five consumers (centroid set, assignment, the two
    # pair-side vector fetches, final anti-join) — persist once; Spark
    # re-executes unpersisted subplans per consumer, and CacheManager
    # dedups by sameResult so repeated query calls reuse one cache entry.
    # nrm rides in the group key: it is derived bitwise from v, so
    # (v, nrm) grouping == v grouping and the norm needs no recompute.
    raw = _embeddings_normed(spark, sf_dir)
    if collapse == "auto":
        collapse = "skip" if _all_distinct(raw, F.hash("v")) else "always"
    if collapse == "skip":
        emb = _pin(raw.select("vec_id", "v", "nrm"))
    else:
        emb = _pin(
            raw.groupBy("v", "nrm")
            .agg(F.min("vec_id").alias("vec_id"))
            .select("vec_id", "v", "nrm")
        )
    # Candidate generation stays SKINNY (ids only): assignment is the
    # zero-shuffle Arrow-batched map-side top-nprobe and the 64-dim
    # vectors are dropped BEFORE the pair expansion — otherwise every
    # shuffle in this plan carries two copies of the vector payload
    # (measured ~0.5 GB of duplicated arrays at sf0.1; a non-starter at
    # corpus scale). Vectors are re-fetched by id only for surviving
    # candidate pairs (late materialization).
    # distinct memo key from ann_ivf_topk's full-corpus training: the
    # canonical set has its own (count, max vec_id) fingerprint
    top_clusters = _assign_clusters_udf(
        *_train_centroids(
            emb,
            cache_key=f"{sf_dir}#canon",
            rows_per_centroid=rows_per_centroid,
            max_k=max_k,
        ),
        nprobe,
    )
    assigned = emb.select(
        "vec_id",
        F.explode(top_clusters(F.col("v"), F.col("nrm"))).alias("cluster"),
    )
    # The cluster equi-join EXPANDS rows ~cluster-size× downstream of its
    # exchange, but AQE sizes exchanges on their *input* bytes — at bench
    # scale it coalesced the skinny 6000-row assignment shuffle to ONE
    # partition and the whole quadratic pair expansion ran single-task
    # (measured 2.8 s on one core). Explicit key-repartitions pin the
    # expansion and the pair-dedup to full parallelism; AQE never
    # coalesces a user-specified repartition. At corpus scale the same
    # repartitions are what you'd write anyway (the pair relation is big).
    par = spark.sparkContext.defaultParallelism
    a = assigned.select("cluster", F.col("vec_id").alias("vec_a")).repartition(
        par, "cluster"
    )
    b = assigned.select("cluster", F.col("vec_id").alias("vec_b")).repartition(
        par, "cluster"
    )
    # A pair sharing >1 probed cluster appears once per shared cluster
    # (≤ NPROBE times). Deliberately NOT deduped here: a pair-grain
    # dropDuplicates would shuffle the whole pair relation, while scoring
    # a duplicate pair costs one extra ~µs fold-dot and the final
    # ``.distinct()`` on the (tiny) removed-id set absorbs duplicates
    # anyway. Compute beats shuffle IO at every scale for this trade.
    cand = a.join(b, "cluster").filter(F.col("vec_a") < F.col("vec_b"))
    va = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    vb = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    # pair scoring rides the Arrow kernel (bit-identical to the fold, see
    # _pair_dot_udf) — candidate volume is the hot dot count in this plan
    pair_dot = _pair_dot_udf()
    removed = (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .filter(
            pair_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
            >= COSINE_THRESHOLD
        )
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
    )
    return (
        emb.join(removed, "vec_id", "left_anti")
        .select("vec_id")
        .orderBy("vec_id")
    )


CC_MAX_ITERS = 20


class ComponentsNotConverged(RuntimeError):
    """near_dup_components hit its round cap before fixpoint. Carries the
    state a caller needs to act: ``rounds`` run, ``still_changing`` label
    count, and ``partial_labels`` (the checkpointed label relation as of
    the last round — monotonically improved, NOT final; inspect it or
    re-run with a higher ``max_iters``)."""

    def __init__(self, rounds: int, still_changing: int, partial_labels):
        self.rounds = rounds
        self.still_changing = still_changing
        self.partial_labels = partial_labels
        super().__init__(
            f"near_dup_components did not converge within {rounds} "
            f"pointer-jumping rounds ({still_changing} labels still "
            "changing) — component labels would be wrong. Retry with "
            "near_dup_components(..., max_iters=<higher>) or inspect "
            "exc.partial_labels (doc_id, label as of the last round)."
        )


def near_dup_components(
    spark: SparkSession, sf_dir: str, *, max_iters: int | None = None
) -> DataFrame:
    """Connected components over the MinHash near-dup pair graph — the
    clustering step that turns pairwise matches into dedup groups (the
    other standard policy besides ``semantic_dedup``'s greedy leader rule:
    one canonical document per TRANSITIVE chain, not per direct pair).

    Iterative min-label propagation with pointer jumping: label(v) starts
    at v, each round becomes min(label(v), min neighbor label) and is then
    shortcut through its own label (label(v) ← label(label(v)) — the
    doubling step), so reach grows exponentially and ``CC_MAX_ITERS`` = 20
    rounds covers chain diameters up to ~2^20, not 20. The loop stops at
    fixpoint and RAISES if the cap is ever hit unconverged — a silent
    wrong-labels return is the one failure mode this operator must not
    have. Each round is a symmetric-edge equi-join + vertex-grain groupBy
    min + one self-join — hash-partitioned shuffles only, nothing at the
    driver beyond the convergence counter. ``localCheckpoint`` truncates
    lineage so the plan tree stays flat across iterations (unbounded
    lineage is the classic iterative-Spark failure). ORACLE-EXACT since
    r13 (upgraded from rows-only): the fixpoint a label-propagation loop
    converges to is declaratively expressible — a recursive CTE closes
    the symmetric edge relation (every (node, label-in-component) pair)
    and MIN(label) per node IS the converged labeling, so DuckDB checks
    the result without replaying the iteration schedule (the
    nation_trade_hops recursive-CTE precedent, applied to components).
    The union-find replay gate in pytest remains as the independent
    second check
    (tests/test_operators.py::test_near_dup_components_match_union_find).

    Returns (doc_id, component) for every document with ≥1 near-dup
    neighbor; component = min doc_id of its transitive cluster.
    ``max_iters`` overrides ``CC_MAX_ITERS``; on non-convergence the
    raised ``ComponentsNotConverged`` carries the partial label relation
    and the rounds/still-changing counts for retry-with-higher-cap.
    """
    rounds_cap = CC_MAX_ITERS if max_iters is None else max_iters
    pairs = minhash_near_dup(spark, sf_dir).select("doc_a", "doc_b")
    return components_from_edges(pairs, rounds_cap=rounds_cap)


def components_from_edges(
    pairs: DataFrame, *, rounds_cap: int = CC_MAX_ITERS
) -> DataFrame:
    """Connected components over any (doc_a, doc_b) pair relation — the
    min-label propagation + pointer-jumping loop shared by
    ``near_dup_components`` (minhash doc graph) and
    ``images.image_dedup_resolution`` (perceptual-hash image graph).
    Returns (doc_id, component) for every node with ≥1 edge; raises
    ``ComponentsNotConverged`` at the round cap (see
    near_dup_components)."""
    # r17 edge materialization (guide §3.3 "materialising an intermediate
    # truncates the plan", §1.2 job shape): the caller's pair DAG is
    # CHECKPOINTED once, and the symmetric union is a plain projection
    # over that LogicalRDD leaf. Two effects, measured same-JVM
    # interleaved on the sf0.1 crossmodal joint-edge relation (outputs
    # asserted identical): (a) the pair DAG — minhash + banded image
    # joins in the crossmodal case — is evaluated ONCE instead of once
    # per union branch; (b) every round's join/aggregate re-plans over a
    # 2-leaf checkpoint scan instead of re-analyzing the full edge DAG —
    # at ~10 pointer-jumping rounds that Catalyst time dominated the
    # loop (A: cached symmetric union 74.6–119.0 s; B: this shape
    # 19.7–21.8 s; C: checkpointing the union itself 22.1–26.1 s).
    # This replaces BOTH the r16-rejected pairs-pin (a cache stacked on
    # the edges cache — pure overhead) and the old edges cache whose
    # logical plan each round dragged through the analyzer.
    pairs_m = pairs.localCheckpoint()
    edges = pairs_m.unionByName(
        pairs_m.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    )
    labels = (
        edges.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint()
    )
    changed = 1
    for _ in range(rounds_cap):
        nbr = (
            edges.join(
                labels.select(F.col("doc_id").alias("doc_b"), "label"),
                "doc_b",
            )
            .groupBy("doc_a")
            .agg(F.min("label").alias("nbr_min"))
            .withColumnRenamed("doc_a", "doc_id")
        )
        propagated = (
            labels.select("doc_id", F.col("label").alias("old_label"))
            .join(nbr, "doc_id", "left")
            .select(
                "doc_id",
                "old_label",
                F.least(
                    F.col("old_label"), F.coalesce("nbr_min", "old_label")
                ).alias("label"),
            )
        )
        # pointer jump: label(v) <- label(label(v)); labels only decrease,
        # so this shortcuts chains and doubles reach per round. old_label
        # rides along through the checkpoint so the convergence check is
        # a join-free filter over the just-materialized relation (r16:
        # measured ~18% off the loop wall vs the old join+count round
        # trip; a 2-propagations-per-cycle variant and a double pointer
        # jump both measured SLOWER — the DAG depth costs more than the
        # cycles saved — so the per-cycle shape stays minimal).
        jumped = (
            propagated.join(
                propagated.select(
                    F.col("doc_id").alias("label"),
                    F.col("label").alias("l2"),
                ),
                "label",
                "left",
            )
            .select(
                "doc_id",
                "old_label",
                F.coalesce("l2", "label").alias("label"),
            )
            # LAZY on purpose (r16): the convergence count right below is
            # the round's first action, so it materializes the checkpoint
            # inside its own job — one job per round instead of an eager
            # checkpoint job plus a count job. Labels asserted identical;
            # lazy won every same-JVM A/B alternation (best 4.6 s vs
            # 11.3 s eager on the sf0.1 joint-edge relation).
            .localCheckpoint(eager=False)
        )
        changed = jumped.filter(F.col("label") != F.col("old_label")).count()
        labels = jumped.select("doc_id", "label")
        if changed == 0:
            break
    if changed != 0:
        raise ComponentsNotConverged(rounds_cap, changed, labels)
    return labels.select(
        "doc_id", F.col("label").alias("component")
    ).orderBy("doc_id")


def _hyperplanes(n_planes: int, dims: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 (no RNG state —
    reproducible across engines and sessions)."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dims):
            h = int(hashlib.md5(f"hp{p}_{d}".encode()).hexdigest()[:15], 16)
            row.append((h % 2000001 - 1000000) / 1e6)
        planes.append(row)
    return planes


LSH_BITS = 12  # sign bits per table → 4096 buckets; bucket size n/4096
LSH_TABLES = 6  # independent hyperplane tables (recall stacks per table)


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table multi-probe hyperplane LSH ANN (random-hyperplane
    signatures per Charikar 2002; 1-bit-flip multi-probe per Lv et al.
    2007 — both public): each of ``LSH_TABLES`` tables hashes a vector to
    a ``LSH_BITS``-bit sign bucket; the corpus emits one (table, bucket)
    row per table, a query additionally probes every 1-bit flip of its
    bucket (the nearest-miss buckets), and candidates come from the
    (table, bucket) equi-join. Rows-only check (approximate by
    construction; knn_cosine_topk is the oracle-checked exact baseline).

    Why not one table: a single 12-bit signature needs all 12 sign bits
    to agree, and per-bit agreement for a true top-5 neighbor is ~0.9 on
    clustered data (~0.68 on structureless uniform vectors) — measured
    recall was 0.26 / ~0.0. With 6 tables × (1 + 12) probes the clustered
    recall is ≥ 0.9 (pinned in tests/test_skew.py) at ~tables·probes·
    n/2^bits candidates per query — two orders below brute force, and the
    knob story scales: bits ~ log2(n) keeps buckets bounded, tables ×
    probes buys recall. On uniform structureless data sign-LSH degrades
    (no free lunch in 64-dim); IVF (ann_ivf_topk) is the default scale
    path, this is the index-free alternative for clustered real-world
    embeddings.

    Scale shape: bucketing is a map-only Arrow kernel (one BLAS matmul
    per record batch — a giant sign-bit Catalyst expression exceeds the
    64 KB janino method limit and falls back to interpreted); candidate
    generation is ids-only (vectors re-fetched for surviving pairs —
    late materialization, same rationale as semantic_dedup_bucketed);
    the only shuffles are the (table, bucket) join and the final
    per-query top-k window."""
    from pyspark.sql.functions import pandas_udf

    emb = _pin(_embeddings_normed(spark, sf_dir))
    # (tables·bits, dims) hyperplanes; table t owns rows [t·bits, (t+1)·bits)
    planes = np.array(_hyperplanes(LSH_TABLES * LSH_BITS, EMB_DIMS))
    weights = 1 << np.arange(LSH_BITS - 1, -1, -1, dtype=np.int64)

    @pandas_udf("array<long>")
    def _buckets(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="object")
        mat = np.vstack(vs.to_numpy())  # (batch, dims)
        bits = (mat @ planes.T) > 0.0  # (batch, tables·bits)
        out = [
            bits[:, t * LSH_BITS : (t + 1) * LSH_BITS] @ weights
            for t in range(LSH_TABLES)
        ]
        return pd.Series(list(np.stack(out, axis=1)))

    corpus = emb.select(
        "vec_id",
        F.posexplode(_buckets(F.col("v"))).alias("table", "bucket"),
    )
    # query side: per table, the exact bucket plus its LSH_BITS 1-bit
    # flips (multi-probe) — bucket arithmetic, no extra hashing
    probes = (
        emb.filter(F.col("vec_id") < 50)
        .select(
            F.col("vec_id").alias("query_id"),
            F.posexplode(_buckets(F.col("v"))).alias("table", "b0"),
        )
        .select(
            "query_id",
            "table",
            F.explode(
                F.array(
                    F.col("b0"),
                    *[
                        F.col("b0").bitwiseXOR(F.lit(1 << i))
                        for i in range(LSH_BITS)
                    ],
                )
            ).alias("bucket"),
        )
    )
    # ids-only candidates; a pair colliding in several tables/probes is
    # deduped BEFORE the dot — scoring is the hot cost here
    cand = (
        probes.join(corpus, ["table", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    qv = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    scored = (
        cand.join(qv, "query_id")
        .join(
            emb.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("v").alias("cv"),
                F.col("nrm").alias("cn"),
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot_expr(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


# ---------------------------------------------------------------------------
# oracle SQL

def _minhash_sig_sql() -> str:
    mins = ",\n               ".join(
        f"MIN(({a} * h32 + {b}) % {MINHASH_P}) AS m{j}"
        for j, (a, b) in enumerate(UH)
    )
    return f"""
        SELECT doc_id,
               {mins}
        FROM (
            SELECT doc_id,
                   CAST('0x' || substring(md5(unnest(shingles)), 1, 8) AS BIGINT) AS h32
            FROM sh
        )
        GROUP BY doc_id
    """


def _simhash_sql() -> str:
    h = oracle_md5_long("tok")
    votes = ",\n               ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(SIMHASH_BITS)
    )
    combine = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(SIMHASH_BITS)
    )
    return f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ), hashed AS (
            SELECT doc_id, {h} AS h FROM tok
        ), votes AS (
            SELECT doc_id,
               {votes}
            FROM hashed GROUP BY doc_id
        )
        SELECT doc_id, {combine} AS simhash FROM votes
    """


_PAIR_JACCARD_SQL = f"""
    SELECT c.doc_a, c.doc_b,
           len(list_intersect(x.shingles, y.shingles)) * 1.0
             / (len(x.shingles) + len(y.shingles)
                - len(list_intersect(x.shingles, y.shingles))) AS jaccard
    FROM cand c
    JOIN sh x ON c.doc_a = x.doc_id
    JOIN sh y ON c.doc_b = y.doc_id
    WHERE len(list_intersect(x.shingles, y.shingles)) * 1.0
          / (len(x.shingles) + len(y.shingles)
             - len(list_intersect(x.shingles, y.shingles))) >= {JACCARD_THRESHOLD}
"""

_COS_SQL = (
    "list_reduce(list_transform(list_zip({a}, {b}), x -> x[1] * x[2]), (acc, v) -> acc + v)"
    " / (sqrt(list_reduce(list_transform({a}, x -> x * x), (acc, v) -> acc + v))"
    " * sqrt(list_reduce(list_transform({b}, x -> x * x), (acc, v) -> acc + v)))"
)


def _kmeans_cents_sql() -> str:
    """CTE chain reproducing ``_train_centroids`` bit-for-bit in DuckDB:
    the same md5-ordered Forgy init, the same unrolled Lloyd iterations
    (KMEANS_ITERS is a compile-time constant on both sides), the shared
    left-fold cosine, xsum fixed-point means (order-independent, so
    Spark's shuffle order cannot diverge from DuckDB's scan order),
    centroid-ordinal tie-breaks, and the empty-cluster COALESCE.

    Expects a CTE ``e(vec_id, v)`` in scope; emits CTE fragments
    ``c0 .. c{KMEANS_ITERS}`` where ``c{KMEANS_ITERS}(ord, cv)`` is the
    trained centroid set."""
    parts = [
        f"""
        c0 AS (
            SELECT rn AS ord, v AS cv FROM (
                SELECT v, row_number() OVER (
                    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
                FROM e
            )
            WHERE rn <= (
                SELECT LEAST(
                    CAST(ceil(COUNT(*) / {KMEANS_ROWS_PER_CENT}.0) AS BIGINT),
                    {KMEANS_MAX_K})
                FROM e
            )
        )"""
    ]
    for i in range(1, KMEANS_ITERS + 1):
        prev = f"c{i - 1}"
        parts.append(
            f"""
        a{i} AS (
            SELECT vec_id, v, ord AS cluster FROM (
                SELECT e.vec_id, e.v, c.ord,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {_COS_SQL.format(a='e.v', b='c.cv')} DESC,
                                    c.ord
                       ) AS rn
                FROM e CROSS JOIN {prev} c
            ) WHERE rn = 1
        ),
        u{i} AS (
            SELECT cluster, dim, {oracle_xsum('val')} / COUNT(val) AS mean
            FROM (
                SELECT cluster,
                       unnest(range(len(v))) AS dim,
                       unnest(v) AS val
                FROM a{i}
            )
            GROUP BY cluster, dim
        ),
        c{i} AS (
            SELECT p.ord, COALESCE(u.cv, p.cv) AS cv
            FROM {prev} p LEFT JOIN (
                SELECT cluster AS ord, list(mean ORDER BY dim) AS cv
                FROM u{i} GROUP BY cluster
            ) u ON u.ord = p.ord
        )"""
        )
    return ",".join(parts)


def _lang_sql() -> str:
    scores = []
    for lang in LANG_PRIORITY:
        arr = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        scores.append(
            f"len(list_filter(string_split(lower(text), ' '), "
            f"t -> list_contains([{arr}], t))) AS score_{lang}"
        )
    case = "CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'"
    for lang in LANG_PRIORITY:
        conds = " AND ".join(
            f"score_{lang} >= score_{o}" for o in LANG_PRIORITY if o != lang
        )
        case += f" WHEN {conds} THEN '{lang}'"
    case += " END"
    score_cols = ", ".join(f"score_{lang}" for lang in LANG_PRIORITY)
    return f"""
        WITH scored AS (
            SELECT doc_id, lang AS label_lang, text,
                   {', '.join(scores)}
            FROM documents
        )
        SELECT doc_id, label_lang, {score_cols}, {case} AS predicted_lang
        FROM scored
    """


ORACLE: dict[str, str] = {
    "exact_dedup": """
        SELECT MIN(doc_id) AS doc_id, md5(text) AS content_md5,
               COUNT(*) AS dup_count
        FROM documents
        GROUP BY md5(text)
    """,
    # fold ≡ recompute: the oracle for the 2-batch fold plan IS the
    # batch-free computation — a value-hash match proves the fold
    "incremental_exact_dedup_fold": """
        SELECT MIN(doc_id) AS doc_id, md5(text) AS content_md5,
               COUNT(*) AS dup_count
        FROM documents
        GROUP BY md5(text)
    """,
    "ngram_jaccard_pairs": f"""
        WITH sh AS ({_SHINGLES_SQL}),
        ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        cand AS (
            SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
            FROM ex x JOIN ex y ON x.s = y.s AND x.doc_id < y.doc_id
        )
        {_PAIR_JACCARD_SQL}
    """,
    # Mirrors the Spark plan's exact-dup collapse EXPLICITLY (pre-cap, an
    # all-docs banding was provably equivalent; the hot-bucket split
    # factor is defined by CANONICAL bucket sizes, so the oracle must
    # band at canonical grain too), then the capped band join, then the
    # member-pair expansion.
    "minhash_near_dup": f"""
        WITH gmap AS (
            SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS canon_id
            FROM documents
            WHERE len(string_split(text, ' ')) >= {SHINGLE_N}
        ),
        cdocs AS (
            SELECT d.doc_id, d.text
            FROM documents d JOIN gmap g
              ON g.doc_id = d.doc_id AND g.doc_id = g.canon_id
        ),
        sh AS ({_shingles_sql('cdocs')}),
        sig AS ({_minhash_sig_sql()}),
        bands AS (
            {" UNION ALL ".join(
                "SELECT doc_id, " + str(b) + " AS band, "
                + " || '-' || ".join(
                    f"CAST(m{b * (MINHASH_SIGS // MINHASH_BANDS) + r} AS VARCHAR)"
                    for r in range(MINHASH_SIGS // MINHASH_BANDS)
                )
                + " AS key FROM sig"
                for b in range(MINHASH_BANDS)
            )}
        ),
        bsz AS (
            SELECT band, key, COUNT(*) AS bsz FROM bands GROUP BY band, key
        ),
        capped AS (
            SELECT b.doc_id, b.band, b.key,
                   CAST('0x' || substring(md5(
                       CAST(b.band AS VARCHAR) || ':' || CAST(b.doc_id AS VARCHAR)
                   ), 1, 8) AS BIGINT)
                     % ((s.bsz + {MINHASH_BUCKET_CAP - 1}) // {MINHASH_BUCKET_CAP})
                     AS sub
            FROM bands b JOIN bsz s ON b.band = s.band AND b.key = s.key
        ),
        cand AS (
            SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
            FROM capped x JOIN capped y
              ON x.band = y.band AND x.key = y.key AND x.sub = y.sub
                 AND x.doc_id < y.doc_id
        ),
        canon_pairs AS ({_PAIR_JACCARD_SQL}),
        cross_pairs AS (
            SELECT LEAST(ga.doc_id, gb.doc_id) AS doc_a,
                   GREATEST(ga.doc_id, gb.doc_id) AS doc_b,
                   p.jaccard
            FROM canon_pairs p
            JOIN gmap ga ON ga.canon_id = p.doc_a
            JOIN gmap gb ON gb.canon_id = p.doc_b
        ),
        within_pairs AS (
            SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
                   CAST(1.0 AS DOUBLE) AS jaccard
            FROM gmap x JOIN gmap y
              ON x.canon_id = y.canon_id AND x.doc_id < y.doc_id
        )
        SELECT doc_a, doc_b, jaccard FROM cross_pairs
        UNION ALL
        SELECT doc_a, doc_b, jaccard FROM within_pairs
    """,
    # Batch-free recompute of the 2-batch incremental fold: UNCAPPED,
    # non-collapsed banding over ALL documents (the incremental path has
    # neither the exact-dup collapse nor the hot-bucket cap — see
    # incremental_minhash_near_dup's docstring), same md5 signature
    # family and exact-Jaccard verify as the minhash_near_dup oracle.
    "incremental_minhash_fold": f"""
        WITH sh AS ({_SHINGLES_SQL}),
        sig AS ({_minhash_sig_sql()}),
        bands AS (
            {" UNION ALL ".join(
                "SELECT doc_id, " + str(b) + " AS band, "
                + " || '-' || ".join(
                    f"CAST(m{b * (MINHASH_SIGS // MINHASH_BANDS) + r} AS VARCHAR)"
                    for r in range(MINHASH_SIGS // MINHASH_BANDS)
                )
                + " AS key FROM sig"
                for b in range(MINHASH_BANDS)
            )}
        ),
        cand AS (
            SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
            FROM bands x JOIN bands y
              ON x.band = y.band AND x.key = y.key
                 AND x.doc_id < y.doc_id
        )
        {_PAIR_JACCARD_SQL}
    """,
    # Brute-force all-pairs twin of the banded plan — identical result set
    # by the pigeonhole argument (see simhash_near_dup docstring), so the
    # value hash must match exactly.
    "simhash_near_dup": f"""
        WITH sig AS ({_simhash_sql()})
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
    """,
    "text_quality": """
        SELECT doc_id,
               CAST(length(text) AS INTEGER) AS n_chars,
               CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
               length(replace(text, ' ', ''))
                 / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_token_len,
               len(list_distinct(string_split(text, ' ')))
                 / CAST(len(string_split(text, ' ')) AS DOUBLE) AS distinct_ratio,
               len(list_filter(string_split(text, ' '),
                   t -> list_contains(['the','a','of','and','to'], t)))
                 / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
               length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
                 / CAST(length(text) AS DOUBLE) AS punct_ratio,
               0.4 * (len(list_distinct(string_split(text, ' ')))
                      / CAST(len(string_split(text, ' ')) AS DOUBLE))
               + 0.3 * (1 - len(list_filter(string_split(text, ' '),
                     t -> list_contains(['the','a','of','and','to'], t)))
                     / CAST(len(string_split(text, ' ')) AS DOUBLE))
               + 0.3 * least(len(string_split(text, ' ')) / 100.0, 1.0)
                 AS quality_score
        FROM documents
    """,
    "lang_id": _lang_sql(),
    "token_stats": f"""
        WITH per_doc AS (
            SELECT source,
                   len(string_split(text, ' ')) AS ws,
                   len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS re
            FROM documents
        )
        SELECT source,
               COUNT(*) AS doc_count,
               CAST(SUM(ws) AS BIGINT) AS ws_tokens,
               CAST(SUM(re) AS BIGINT) AS regex_tokens,
               CAST(SUM(ws) AS DOUBLE) / COUNT(*) AS avg_ws_tokens,
               MIN(ws) AS min_ws_tokens,
               MAX(ws) AS max_ws_tokens
        FROM per_doc
        GROUP BY source
        ORDER BY source
    """,
    "doc_fingerprint": f"""
        SELECT doc_id,
               md5(lower(trim(text))) AS content_md5,
               list_min(list_transform(string_split(text, ' '),
                   t -> CAST('0x' || substring(md5(t), 1, 15) AS BIGINT)))
                 AS min_token_hash
        FROM documents
    """,
    "tfidf_top_terms": """
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ), tf AS (
            SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
        ), dfreq AS (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
        ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term,
                   tf.tf * n.n_docs / CAST(dfreq.df AS DOUBLE) AS tfidf
            FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n
        )
        SELECT doc_id, term, tfidf,
               CAST(row_number() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, term)
                 AS INTEGER) AS rk
        FROM scored
        QUALIFY rk <= 3
    """,
    "embedding_centroids": f"""
        WITH ex AS (
            SELECT label,
                   unnest(range(len(embedding))) AS dim,
                   unnest(embedding::DOUBLE[]) AS val
            FROM embeddings
        )
        SELECT label,
               CAST(dim AS INTEGER) AS dim,
               {oracle_xsum("val")} / COUNT(val) AS mean,
               COUNT(val) AS n_vectors
        FROM ex GROUP BY label, dim
        ORDER BY label, dim
    """,
    "knn_cosine_topk": f"""
        WITH e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   {_COS_SQL.format(a='q.v', b='c.v')} AS cosine
            FROM e q JOIN e c ON q.vec_id < 10 AND c.vec_id != q.vec_id
        )
        SELECT query_id, neighbor_id,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)
                 AS INTEGER) AS rank,
               cosine
        FROM scored
        QUALIFY rank <= 5
    """,
    # Mirrors the IVF bucketing algorithm itself (centroid rule, cosine
    # fold association, rn tie-break) — exact check, not a recall bound.
    # k-means replay (the semantic_dedup chain) + left-fold top-1
    # assignment + xsum fixed-point cosine means — the drift trigger is
    # deterministic end to end, so even cluster ids value-hash-match
    "ivf_drift_stats": f"""
        WITH eall AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        cut AS (SELECT (MAX(vec_id) * 4) // 5 AS c FROM eall),
        e AS (
            SELECT vec_id, v FROM eall
            WHERE vec_id <= (SELECT c FROM cut)
        ),
        {_kmeans_cents_sql()},
        cents AS (SELECT ord AS cent_id, cv FROM c{KMEANS_ITERS}),
        tagged AS (
            SELECT vec_id, v,
                   CASE WHEN vec_id <= (SELECT c FROM cut)
                        THEN 'base' ELSE 'delta' END AS tag
            FROM eall
        ),
        assign AS (
            SELECT tag, cent_id AS cluster, cent_cos AS cos FROM (
                SELECT t.tag, c.cent_id,
                       {_COS_SQL.format(a='t.v', b='c.cv')} AS cent_cos,
                       row_number() OVER (
                           PARTITION BY t.vec_id
                           ORDER BY {_COS_SQL.format(a='t.v', b='c.cv')} DESC,
                                    c.cent_id
                       ) AS rn
                FROM tagged t CROSS JOIN cents c
            ) WHERE rn = 1
        ),
        base_agg AS (
            SELECT cluster, COUNT(*) AS base_size,
                   {oracle_xsum('cos')} AS base_cos_sum
            FROM assign WHERE tag = 'base' GROUP BY cluster
        ),
        delta_agg AS (
            SELECT cluster, COUNT(*) AS delta_size,
                   {oracle_xsum('cos')} AS delta_cos_sum
            FROM assign WHERE tag = 'delta' GROUP BY cluster
        ),
        agg AS (
            SELECT COALESCE(b.cluster, d.cluster) AS cluster,
                   COALESCE(base_size, 0) AS base_size,
                   COALESCE(delta_size, 0) AS delta_size,
                   CASE WHEN COALESCE(base_size, 0) > 0
                        THEN base_cos_sum / base_size
                   END AS base_mean_cos,
                   CASE WHEN COALESCE(delta_size, 0) > 0
                        THEN delta_cos_sum / delta_size
                   END AS delta_mean_cos
            FROM base_agg b FULL OUTER JOIN delta_agg d
              ON b.cluster = d.cluster
        )
        SELECT cluster, base_size, delta_size,
               base_size / (SUM(base_size) OVER ()) AS base_share,
               delta_size / (SUM(delta_size) OVER ()) AS delta_share,
               ABS(base_size / (SUM(base_size) OVER ())
                   - delta_size / (SUM(delta_size) OVER ()))
                   AS share_drift,
               base_mean_cos, delta_mean_cos
        FROM agg
        ORDER BY share_drift DESC, cluster
    """,
    "semantic_dedup_bucketed": f"""
        WITH e0 AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        e AS (
            SELECT MIN(vec_id) AS vec_id, v FROM e0 GROUP BY v
        ),
        {_kmeans_cents_sql()},
        cents AS (
            SELECT ord AS cent_id, cv FROM c{KMEANS_ITERS}
        ),
        assigned AS (
            SELECT vec_id, v, cent_id AS cluster
            FROM (
                SELECT e.vec_id, e.v, c.cent_id,
                       {_COS_SQL.format(a='e.v', b='c.cv')} AS cent_cos,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {_COS_SQL.format(a='e.v', b='c.cv')} DESC,
                                    c.cent_id
                       ) AS rn
                FROM e CROSS JOIN cents c
            )
            WHERE rn <= {SEMDEDUP_NPROBE}
        ),
        cand AS (
            SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM assigned a JOIN assigned b
              ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        ),
        removed AS (
            SELECT DISTINCT c.vec_b AS vec_id
            FROM cand c
            JOIN e ea ON ea.vec_id = c.vec_a
            JOIN e eb ON eb.vec_id = c.vec_b
            WHERE {_COS_SQL.format(a='ea.v', b='eb.v')} >= {COSINE_THRESHOLD}
        )
        SELECT vec_id FROM e
        WHERE vec_id NOT IN (SELECT vec_id FROM removed)
        ORDER BY vec_id
    """,
}

#: Library-tier oracles: plans retired from the driver registry (50-entry
#: driver cap) but still oracle-verified every round by
#: tests/test_library_parity.py. Each is transitively exercised by a
#: driver-checked entry: simhash_near_dup consumes simhash_signatures;
#: semantic_dedup composes embedding_near_dup; semantic_dedup_bucketed's
#: recall test compares against semantic_dedup (COVERAGE.md).
LIBRARY_ORACLE: dict[str, str] = {
    "simhash_signatures": _simhash_sql(),
    "embedding_near_dup": f"""
        WITH e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        )
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               {_COS_SQL.format(a='a.v', b='b.v')} AS cosine
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE {_COS_SQL.format(a='a.v', b='b.v')} >= {COSINE_THRESHOLD}
    """,
    "semantic_dedup": f"""
        WITH e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        removed AS (
            SELECT DISTINCT b.vec_id
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE {_COS_SQL.format(a='a.v', b='b.v')} >= {COSINE_THRESHOLD}
        )
        SELECT vec_id FROM e
        WHERE vec_id NOT IN (SELECT vec_id FROM removed)
        ORDER BY vec_id
    """,
    # semi-hard negative mining: the knn cosine class + a same-label MAX
    # + a different-label top-k window; margin is a difference of two
    # identically-computed doubles (the preference_pairs parity class)
    "hard_negative_mining": f"""
        WITH e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v, label
            FROM embeddings
        ),
        scored AS (
            SELECT q.vec_id AS query_id, q.label AS qlabel,
                   c.vec_id AS neighbor_id, c.label,
                   {_COS_SQL.format(a='q.v', b='c.v')} AS cosine
            FROM e q JOIN e c ON q.vec_id < 10 AND c.vec_id != q.vec_id
        ),
        pos AS (
            SELECT query_id, MAX(cosine) AS pos_cosine
            FROM scored WHERE label = qlabel GROUP BY query_id
        ),
        neg AS (
            SELECT query_id, neighbor_id, cosine,
                   CAST(row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id)
                     AS INTEGER) AS rank
            FROM scored WHERE label != qlabel
            QUALIFY rank <= 5
        )
        SELECT n.query_id, n.neighbor_id, n.rank, n.cosine,
               p.pos_cosine,
               p.pos_cosine - n.cosine AS margin,
               n.cosine < p.pos_cosine AS semi_hard
        FROM neg n JOIN pos p USING (query_id)
        ORDER BY query_id, rank
    """,
    "rare_token_stats": f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ), tf AS (
            SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
        ), dfreq AS (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
        )
        SELECT tf.doc_id,
               CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
               {oracle_xsum("CAST(tf.tf AS DOUBLE) / dfreq.df")}
                 / CAST(SUM(tf.tf) AS DOUBLE) AS mean_inv_df,
               CAST(SUM(CASE WHEN dfreq.df <= {RARE_DF_MAX}
                             THEN tf.tf ELSE 0 END) AS DOUBLE)
                 / SUM(tf.tf) AS rare_frac
        FROM tf JOIN dfreq USING (term)
        GROUP BY tf.doc_id
    """,
    "dup_ngram_fraction": f"""
        WITH sh AS (
            SELECT doc_id, unnest(shingles) AS s FROM ({_SHINGLES_SQL})
        ), dfreq AS (
            SELECT s, COUNT(*) AS df FROM sh GROUP BY s
        )
        SELECT sh.doc_id,
               COUNT(*) AS n_shingles,
               CAST(SUM(CASE WHEN dfreq.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dup_shingles,
               CAST(SUM(CASE WHEN dfreq.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS dup_fraction
        FROM sh JOIN dfreq USING (s)
        GROUP BY sh.doc_id
    """,
}

def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding vectors — the k-means /
    IVF-training primitive — computed relationally: posexplode to
    (label, dim, value), exact-parity mean per dimension (rounding-free
    fixed-point xsum — decimal quantization tie-breaks differ across
    engines for full-precision doubles). Output is one row per
    (label, dim): array-typed columns crash the driver's pandas
    canonicalizer (round-1 finding), and the long shape is what the
    k-means update step consumes anyway (join on (label, dim), no array
    (dis)assembly). At 100 TB the per-dim partial aggregation is the
    point: the shuffle carries (label × dim) partial sums, never raw
    vectors; callers wanting array centroids re-assemble at label grain
    (label-count rows — trivially small).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "val"
        ),
    )
    # xsum, not dsum: embedding components are full-precision doubles —
    # decimal quantization rounds differently across engines (observed);
    # the fixed-point hi/lo sum is rounding-free (functions/core.py:xsum).
    return (
        ex.groupBy("label", "dim")
        .agg(
            (xsum("val") / F.count("val")).alias("mean"),
            F.count("val").alias("n_vectors"),
        )
        .select(
            "label",
            F.col("dim").cast("int").alias("dim"),
            "mean",
            "n_vectors",
        )
        .orderBy("label", "dim")
    )


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 distinguishing terms per document by tf·idf with a rational
    idf (N/df — log-free: ln() rounding differs across engines and would
    break exact parity; the ranking is monotone-equivalent). Shape: explode
    → (doc, term) tf agg → term df agg (broadcast back) → ranked window.
    All shuffles are at token-aggregate grain, never raw-token grain twice.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    # tf feeds both the df aggregation and the final join — persist so the
    # token explode+shuffle runs once.
    tf = _pin(tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        # no broadcast hint on dfreq: one row per distinct term is
        # unbounded cardinality (web corpora: 10^8-10^9 terms) — let AQE
        # pick broadcast vs shuffle from the measured size at runtime.
        # n_docs stays hinted: always exactly one row.
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.col("n_docs") / F.col("df").cast("double")).alias("tfidf"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tfidf", F.col("rk").cast("int").alias("rk"))
    )


PROBE_COVERAGE = 16  # filtered ANN: probe cells until 16*k matches covered


def ann_ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    *,
    nprobe: int | None = None,
    top_k: int = IVF_TOP_K,
    n_queries: int = IVF_N_QUERIES,
    rows_per_centroid: int = KMEANS_ROWS_PER_CENT,
    max_k: int = KMEANS_MAX_K,
) -> DataFrame:
    """IVF-style ANN (the other scale path besides LSH): a trained
    centroid set (seeded k-means, _train_centroids),
    each vector assigned to its nearest centroid (broadcast, no shuffle),
    queries probe their ``nprobe`` nearest clusters, candidates come from
    a cluster equi-join. Rows-only: approximate by construction; the
    exact brute-force twin (knn_cosine_topk) is the oracle-checked
    baseline. Index/query knobs default to the module constants the
    registry entry uses; override to tune recall vs probe cost.

    ``nprobe`` defaults to the standard IVF rule max(IVF_NPROBE, ⌈√k⌉):
    a fixed probe count collapses on clustered data once k subdivides
    each natural cluster into many cells — the true neighbors of a query
    scatter across adjacent cells, and probing a constant 3 of ~√n cells
    lost 38% recall on the clustered skew corpus (measured; ⌈√k⌉ = 13
    probes restores ≥ 0.92, pinned in tests/test_skew.py). Probe cost
    stays sublinear: candidates ≈ nprobe · n/k ≈ √k · rows_per_centroid
    per query.
    """
    # assignment and probing are both the zero-shuffle map-side top-k
    # Arrow kernel (_assign_clusters_udf, shared with
    # semantic_dedup_bucketed) — the fanout-join + window alternative
    # shuffles k×N rows (see the kernel docstring). Assignment happens
    # in-line on the corpus relation, so vectors never take an extra
    # join hop.
    # rows-only plan (recall-gated, no DuckDB value-hash replay), so every
    # kernel runs the BLAS/vectorized path: training + assignment are
    # matmuls, pair scoring is an Arrow multiply-sum — the fold-exact
    # kernels stay reserved for the oracle-replayed semantic_dedup path
    emb = _pin(_embeddings_normed(spark, sf_dir))
    cent_ids, cmat, cn = _train_centroids(
        emb,
        cache_key=sf_dir,
        rows_per_centroid=rows_per_centroid,
        max_k=max_k,
        foldexact=False,
    )
    if nprobe is None:
        nprobe = max(IVF_NPROBE, int(np.ceil(np.sqrt(cmat.shape[0]))))
    assign1 = _assign_clusters_udf(cent_ids, cmat, cn, 1, foldexact=False)
    assign_probe = _assign_clusters_udf(cent_ids, cmat, cn, nprobe, foldexact=False)
    assigned = emb.select(
        "vec_id",
        "v",
        "nrm",
        F.explode(assign1(F.col("v"), F.col("nrm"))).alias("cluster"),
    )
    q = emb.filter(F.col("vec_id") < n_queries)
    probes = q.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.explode(assign_probe(F.col("v"), F.col("nrm"))).alias("cluster"),
    )
    pair_dot = _pair_dot_udf(foldexact=False)
    scored = (
        probes.join(assigned, "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                pair_dot(F.col("qv"), F.col("v"))
                / (F.col("qn") * F.col("nrm"))
            ).alias("cosine"),
        )
    )
    w_top = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w_top))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


# ---------------------------------------------------------------------------
# IVF-PQ: product-quantized ANN (the memory-bound scale path)

PQ_M = 32  # subspaces (EMB_DIMS must divide evenly) → m bytes per code
PQ_K = 256  # codewords per subspace → one uint8 code per subspace
PQ_SAMPLE = 16_384  # training-sample bound (codebooks train on a sample)
PQ_ITERS = 3  # Lloyd iterations per subspace codebook
PQ_REFINE = 10  # ADC shortlist = top_k × PQ_REFINE before exact re-rank
# Sizing, measured on the adversarial clustered corpus (ADC shortlist
# recall of the true top-5 at depth 50): m=8 → 0.46, m=16 → 0.83,
# m=32 → 1.00. Tight clusters leave tiny cosine gaps between true and
# near neighbors, so the residual codebook needs enough subspaces to
# rank within a cluster; m=32 over 64 dims = 2-dim cells, 32 B/code =
# 16× under the 512 B raw vector. Higher-dim real embeddings keep
# ds=2–8 (e.g. 1024 dims at m=128 → 128 B, 64× compression). refine=10
# then recovers the IVF candidate ceiling exactly (zero PQ-layer loss).

#: Same memo discipline as _CENTROID_CACHE (cleared together).
_PQ_CACHE: dict[tuple, tuple] = {}


def _train_pq(
    emb: DataFrame,
    cmat: "np.ndarray",
    cn: "np.ndarray",
    cache_key: str | None = None,
    *,
    m: int = PQ_M,
    k: int = PQ_K,
    sample: int = PQ_SAMPLE,
    iters: int = PQ_ITERS,
) -> "np.ndarray":
    """Train product-quantization codebooks over IVF RESIDUALS: each
    sample vector is assigned to its nearest trained centroid, the
    residual x − c(x) is split into ``m`` subspaces, and each subspace is
    k-means'd independently (Jégou et al.'s PQ, FAISS IndexIVFPQ shape).
    Residual coding is load-bearing on clustered data: the centroid
    carries the coarse position, so the codebook's bits all go to the
    within-cluster detail that actually ranks neighbors — plain-vector PQ
    measured 0.32 recall on the clustered skew corpus vs ≥0.9 residual
    (the codewords all landed on cluster centers and within-cluster
    ordering was noise). Returns books of shape (m, k_eff, d/m).

    Training runs driver-side in numpy over a deterministic md5-ordered
    sample of ≤ ``sample`` vectors — bounded driver traffic by
    construction (16384 × 64 doubles = 8 MiB), the standard way PQ
    codebooks are fit (they are index METADATA, like the IVF centroid
    matrix; the per-row work — encoding and scoring — stays
    distributed). Init is Forgy on the md5-ordered prefix, empty cells
    keep their previous codeword, distances use the ‖x‖²−2x·c+‖c‖²
    expansion — one (S × k) matrix per subspace.
    """
    n = emb.count()
    memo_key = (cache_key, m, k, sample, iters)
    fp = None
    if cache_key is not None:
        fp = (n, emb.agg(F.max("vec_id")).first()[0])
        hit = _PQ_CACHE.get(memo_key)
        if hit is not None and hit[0] == fp:
            return hit[1]
    rows = (
        emb.select(
            "v",
            "nrm",
            F.md5(F.col("vec_id").cast("string")).alias("h"),
            "vec_id",
        )
        .orderBy("h", "vec_id")
        .limit(min(n, sample))
        .collect()
    )
    X = np.array([list(r.v) for r in rows], dtype=np.float64)
    xn = np.array([r.nrm for r in rows], dtype=np.float64)
    d = X.shape[1]
    if d % m:
        raise ValueError(f"PQ_M={m} must divide dims={d}")
    ds = d // m
    # same assignment rule as the distributed kernel: top-1 cosine, ties
    # on the lower ordinal (stable argmax via argsort not needed — argmax
    # returns the first max)
    assign = ((X @ cmat.T) / np.outer(xn, cn)).argmax(1)
    R = X - cmat[assign]
    k_eff = min(k, R.shape[0])
    books = np.empty((m, k_eff, ds), dtype=np.float64)
    for mi in range(m):
        sub = R[:, mi * ds : (mi + 1) * ds]
        cb = sub[:k_eff].copy()
        for _ in range(iters):
            d2 = (
                (sub * sub).sum(1)[:, None]
                - 2.0 * (sub @ cb.T)
                + (cb * cb).sum(1)[None, :]
            )
            a = d2.argmin(1)
            sums = np.zeros_like(cb)
            np.add.at(sums, a, sub)
            counts = np.bincount(a, minlength=k_eff).astype(np.float64)
            nonempty = counts > 0
            cb[nonempty] = sums[nonempty] / counts[nonempty, None]
        books[mi] = cb
    if cache_key is not None:
        _PQ_CACHE[memo_key] = (fp, books)
    return books


def _pq_encode_udf(books: "np.ndarray", cmat: "np.ndarray"):
    """Arrow-batched residual-PQ encoder: (vector, assigned cluster) →
    m small codes (nearest codeword per subspace of x − c(x)). Map-side,
    zero shuffle — the corpus's raw vectors are read once at index build
    and never join again until re-rank."""
    from pyspark.sql.functions import pandas_udf

    m, k_eff, ds = books.shape
    cb_sq = [(books[mi] * books[mi]).sum(1) for mi in range(m)]

    @pandas_udf("array<int>")
    def _enc(v: pd.Series, cluster: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="object")
        mat = np.vstack(v.to_numpy())
        resid = mat - cmat[cluster.to_numpy(dtype=np.int64) - 1]
        codes = np.empty((mat.shape[0], m), dtype=np.int64)
        for mi in range(m):
            sub = resid[:, mi * ds : (mi + 1) * ds]
            d2 = -2.0 * (sub @ books[mi].T) + cb_sq[mi][None, :]
            codes[:, mi] = d2.argmin(1)
        return pd.Series(list(codes))

    return _enc


def _pq_adc_udf(
    books: "np.ndarray", cmat: "np.ndarray", q_ids, q_mat: "np.ndarray"
):
    """Asymmetric-distance scoring for residual PQ:
    dot(q, x) ≈ dot(q, c(x)) + dot(q, r̂) — the first term is an exact
    (n_queries × k) centroid-dot table, the second a Σ_m LUT[m, code_m]
    gather over per-query (m × k) subspace tables. m table reads per
    candidate instead of a d-dim dot against a raw vector; the LUTs
    (n_queries × m × k doubles) are closure-captured like the centroid
    matrix, and scoring is one vectorized gather per batch."""
    from pyspark.sql.functions import pandas_udf

    m, k_eff, ds = books.shape
    qc = q_mat @ cmat.T  # (nq, k_ivf): exact dot(q, centroid)
    # LUT[qi, mi, c] = dot(q_sub(mi), books[mi, c])
    lut = np.stack(
        [
            np.stack(
                [books[mi] @ q_mat[qi, mi * ds : (mi + 1) * ds] for mi in range(m)]
            )
            for qi in range(q_mat.shape[0])
        ]
    )
    idx_of = {int(q): i for i, q in enumerate(q_ids)}
    mi_range = np.arange(m)

    @pandas_udf("double")
    def _adc(
        query_id: pd.Series, cluster: pd.Series, codes: pd.Series
    ) -> pd.Series:
        if len(codes) == 0:
            return pd.Series([], dtype="float64")
        c = np.vstack(codes.to_numpy()).astype(np.int64)
        qi = query_id.map(idx_of).to_numpy(dtype=np.int64)
        cl = cluster.to_numpy(dtype=np.int64) - 1
        resid_dot = lut[qi[:, None], mi_range[None, :], c].sum(1)
        return pd.Series(qc[qi, cl] + resid_dot)

    return _adc


def ann_ivfpq_topk(
    spark: SparkSession,
    sf_dir: str,
    *,
    nprobe: int | None = None,
    top_k: int = IVF_TOP_K,
    n_queries: int = IVF_N_QUERIES,
    refine: int = PQ_REFINE,
    pq_m: int = PQ_M,
    pq_k: int = PQ_K,
    rows_per_centroid: int = KMEANS_ROWS_PER_CENT,
    max_k: int = KMEANS_MAX_K,
) -> DataFrame:
    """IVF-PQ with exact re-ranking — the memory-bound ANN scale path.
    ``ann_ivf_topk`` prunes WHICH vectors a query scores but still reads
    raw vectors (d × 8 bytes each) for every candidate; at 10^11 vectors
    the raw matrix is the bottleneck (64 dims × 8 B = 512 B/vec = 50 TB).
    PQ stores an m-byte RESIDUAL code instead (32 B/vec here, 16×
    smaller — see the PQ_M sizing note), scores candidates against
    per-query lookup tables (ADC), and only the ADC shortlist
    (top_k × refine) touches raw vectors again for exact cosines — the
    standard IVF-PQ + re-rank pipeline (Jégou et al.;
    FAISS IndexIVFPQR shape), expressed as: trained-centroid cluster
    equi-join (shared with ann_ivf_topk) over the CODES relation, ADC
    gather kernel, shortlist window, skinny re-rank join back to raw
    vectors, final top-k window.

    Rows-only (approximate by construction): recall vs the exact brute
    force is pinned in tests/test_skew.py on the clustered corpus, and
    tests/test_operators.py pins the code-size invariant plus recall at
    sf0.001. Returned cosines are EXACT (computed at re-rank), so a hit
    list agrees with knn_cosine_topk wherever candidates overlap.
    """
    emb = _pin(_embeddings_normed(spark, sf_dir))
    cent_ids, cmat, cn = _train_centroids(
        emb,
        cache_key=sf_dir,
        rows_per_centroid=rows_per_centroid,
        max_k=max_k,
        foldexact=False,
    )
    books = _train_pq(emb, cmat, cn, cache_key=sf_dir, m=pq_m, k=pq_k)
    if nprobe is None:
        nprobe = max(IVF_NPROBE, int(np.ceil(np.sqrt(cmat.shape[0]))))
    assign1 = _assign_clusters_udf(cent_ids, cmat, cn, 1, foldexact=False)
    assign_probe = _assign_clusters_udf(
        cent_ids, cmat, cn, nprobe, foldexact=False
    )
    encode = _pq_encode_udf(books, cmat)
    # The PQ index relation: (vec_id, cluster, codes, nrm) — no raw
    # vectors. nrm is stored exact (8 B) so ADC cosines use true norms.
    index = emb.select(
        "vec_id",
        "v",
        "nrm",
        F.explode(assign1(F.col("v"), F.col("nrm"))).alias("cluster"),
    ).select(
        "vec_id",
        "cluster",
        encode(F.col("v"), F.col("cluster")).alias("codes"),
        "nrm",
    )
    q_rows = (
        emb.filter(F.col("vec_id") < n_queries)
        .select("vec_id", "v", "nrm")
        .collect()
    )  # query-grain driver traffic (n_queries rows), builds the ADC LUTs
    q_ids = [r.vec_id for r in q_rows]
    q_mat = np.array([list(r.v) for r in q_rows], dtype=np.float64)
    adc = _pq_adc_udf(books, cmat, q_ids, q_mat)
    probes = (
        emb.filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("nrm").alias("qn"),
            F.explode(assign_probe(F.col("v"), F.col("nrm"))).alias("cluster"),
        )
    )
    shortlist_w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_cos"), "neighbor_id"
    )
    shortlist = (
        probes.join(index, "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "qn",
            F.col("vec_id").alias("neighbor_id"),
            (
                adc(F.col("query_id"), F.col("cluster"), F.col("codes"))
                / (F.col("qn") * F.col("nrm"))
            ).alias("adc_cos"),
        )
        .withColumn("rk", F.row_number().over(shortlist_w))
        .filter(F.col("rk") <= top_k * refine)
        .select("query_id", "qn", "neighbor_id")
    )
    # Exact re-rank: only the shortlist touches raw vectors again.
    pair_dot = _pair_dot_udf(foldexact=False)
    qv = spark.createDataFrame(
        [(int(r.vec_id), list(r.v)) for r in q_rows],
        "query_id long, qv array<double>",
    )
    rescored = (
        shortlist.join(F.broadcast(qv), "query_id")
        .join(
            emb.select(
                F.col("vec_id").alias("neighbor_id"), "v", "nrm"
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            (
                pair_dot(F.col("qv"), F.col("v"))
                / (F.col("qn") * F.col("nrm"))
            ).alias("cosine"),
        )
    )
    w_top = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        rescored.withColumn("rank", F.row_number().over(w_top))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


QUERIES = {
    "exact_dedup": exact_dedup,
    # r12: the incremental dedup APIs' fold paths, driver-exposed over a
    # deterministic 2-batch split (VERDICT r11 item 6)
    "incremental_exact_dedup_fold": incremental_exact_dedup_fold,
    "incremental_minhash_fold": incremental_minhash_fold,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "minhash_near_dup": minhash_near_dup,
    "simhash_near_dup": simhash_near_dup,
    "text_quality": text_quality,
    "lang_id": lang_id,
    "token_stats": token_stats,
    "doc_fingerprint": doc_fingerprint,
    "tfidf_top_terms": tfidf_top_terms,
    "embedding_centroids": embedding_centroids,
    "knn_cosine_topk": knn_cosine_topk,
    "semantic_dedup_bucketed": semantic_dedup_bucketed,
    # r12: incremental-IVF retrain trigger — ORACLE-EXACT (k-means
    # replay + fold-exact assignment + xsum means); fold≡rebuild and
    # recall-after-appends gates in pytest
    "ivf_drift_stats": ivf_drift_stats,
    "ann_lsh_topk": ann_lsh_topk,  # rows-only: approximate by construction
    "ann_ivf_topk": ann_ivf_topk,  # rows-only: approximate by construction
}

#: Library-tier plans (see LIBRARY_ORACLE): callable + oracle-checked via
#: pytest, not registered with the driver.

#: feature-hashing dimensionality (power of two so pmod distributes well
#: over md5's uniform low bits)
FEATURE_DIM = 256


def hashed_token_features(
    spark: SparkSession, sf_dir: str, *, dim: int = FEATURE_DIM
) -> DataFrame:
    """Signed feature hashing ("hashing trick", Weinberger et al. 2009 —
    public paper): tokens hash into a fixed ``dim``-bucket space with a
    ±1 sign from a second hash, giving every document a sparse
    fixed-width feature vector with NO vocabulary pass — the
    text→vector featurizer that needs zero fitted state, which is what
    makes it the 100-TB default (fastText / Vowpal Wabbit input shape).

    Emitted LONG-FORM (doc_id, bucket, weight) rather than as an array
    column: the long form is what joins/aggregations consume (dot
    products become bucket equi-joins), avoids array-ordering parity
    concerns, and keeps the relation sparse (zero buckets absent; a
    signed collision CAN cancel to weight 0 and such rows are kept —
    they are real hash events, and dropping them would make the
    relation depend on cancellation order).

    Scale shape: one token explode (linear), one (doc, bucket) groupBy —
    partial aggregation collapses map-side, the shuffle carries at most
    docs × dim rows. Hashes are the md5 family (functions.core.md5_long),
    so the whole featurizer is oracle-exact in DuckDB."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    bucket = F.pmod(md5_long(F.col("tok")), F.lit(dim)).cast("int")
    sign = F.when(
        F.pmod(md5_long(F.concat(F.col("tok"), F.lit("#s"))), F.lit(2)) == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    return (
        tok.select("doc_id", bucket.alias("bucket"), sign.alias("sign"))
        .groupBy("doc_id", "bucket")
        .agg(F.sum("sign").alias("weight"))
    )


#: minimum cosine for hashed-feature pair emission
HASHED_COS_THRESHOLD = 0.9


def hashed_cosine_pairs(
    spark: SparkSession,
    sf_dir: str,
    *,
    threshold: float = HASHED_COS_THRESHOLD,
    dim: int = FEATURE_DIM,
    method: str = "auto",
) -> DataFrame:
    """Exact cosine similarity JOIN over the hashed-feature vectors — the
    third lexical-similarity family next to shingle-Jaccard (set
    overlap) and MinHash (sketch): cosine over signed token-count
    vectors. Two physical plans, picked by the measured bucket-occupancy
    regime (``method="auto"``), identical output:

    - ``"inverted"`` — the textbook inverted-index self-join: documents
      sharing a bucket join on it, per-bucket weight products sum to the
      exact integer dot. Candidate volume is Σ_b n_b², which is only
      subquadratic when the bucket space is SPARSE (dim ≫ per-doc
      nonzeros AND low per-bucket df). On the driver corpus it is
      degenerate — a 31-word vocabulary occupies ~30 buckets with ~78%
      of all docs each, so Σ_b n_b² ≈ 448 M rows at sf0.1 ≈ 36× the n²/2
      pair count (measured: 101 s). The same degeneracy hits ANY corpus
      whose vocabulary is large relative to ``dim`` (10⁶ words into 256
      buckets makes every bucket hot), so this path is only right for
      large ``dim``.
    - ``"pairloop"`` — doc-grain pair join: each doc's features collapse
      to one map<bucket,weight> row; the n²/2 pair loop probes the
      smaller relation's map entries (``F.aggregate`` over
      ``map_entries``, JVM codegen, zero Python). Work is n²/2 × nnz̄
      map-probes with NO 448 M-row shuffle — the join is a
      Spark-managed broadcast nested loop, and only the output pairs
      move. Measured at sf0.1: 19 s vs the inverted form's 101 s.

    ``"auto"`` runs one tiny occupancy agg (driver traffic: 1 row) and
    takes the inverted path only when Σ_b n_b² < n²/4 — i.e. when the
    index actually prunes. Both paths are integer arithmetic until the
    final division and both engines' sqrt/divide are IEEE
    correctly-rounded, so the pair relation is oracle-exact
    (bit-parity between the two paths is pinned in
    tests/test_operators.py). ``threshold`` must be > 0: the inverted
    form cannot emit bucket-disjoint (dot = 0) pairs.

    100-TB shape: exact all-pairs cosine is inherently O(n²) — this is
    the declared exact baseline of the family; the scale path is a
    MinHash/SimHash prefilter (or a larger ``dim`` with the inverted
    plan, where df-pruning applies) feeding pairs into exact
    verification.

    Emits (doc_a < doc_b, cosine) for pairs at or above ``threshold``
    (default 0.9 — on the synthetic corpus the all-pairs cosine
    distribution has median ~0.63 and p99.9 ~0.88 from hash-collision
    baseline mass at dim 256, so 0.9 selects the genuine near-dup tail).
    """
    if not threshold > 0:
        raise ValueError("hashed_cosine_pairs requires threshold > 0")
    if method not in ("auto", "inverted", "pairloop"):
        raise ValueError(f"unknown method {method!r}")
    feats = hashed_token_features(spark, sf_dir, dim=dim).filter(
        F.col("weight") != 0
    )
    if method == "auto":
        method = _hashed_cosine_method(feats)
    if method == "pairloop":
        vecs = feats.groupBy("doc_id").agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("bucket", "weight")))
            ).alias("fm"),
            F.sum(F.col("weight") * F.col("weight")).alias("norm_sq"),
        )
        # spread the streamed side of the nested-loop join across every
        # core (the scan is often one small file), as embedding_near_dup
        a = vecs.repartition(spark.sparkContext.defaultParallelism).select(
            F.col("doc_id").alias("doc_a"),
            F.col("fm").alias("fa"),
            F.col("norm_sq").alias("na"),
        )
        b = vecs.select(
            F.col("doc_id").alias("doc_b"),
            F.col("fm").alias("fb"),
            F.col("norm_sq").alias("nb"),
        )
        dot = F.aggregate(
            F.map_entries(F.col("fa")),
            F.lit(0).cast("long"),
            lambda acc, e: acc
            + e["value"]
            * F.coalesce(
                F.element_at(F.col("fb"), e["key"]), F.lit(0).cast("long")
            ),
        )
        return (
            a.join(b, F.col("doc_a") < F.col("doc_b"))
            .select(
                "doc_a",
                "doc_b",
                (
                    dot.cast("double")
                    / (
                        F.sqrt(F.col("na").cast("double"))
                        * F.sqrt(F.col("nb").cast("double"))
                    )
                ).alias("cosine"),
            )
            .filter(F.col("cosine") >= threshold)
        )
    norms = feats.groupBy("doc_id").agg(
        F.sum(F.col("weight") * F.col("weight")).alias("norm_sq")
    )
    a = feats.select(
        F.col("doc_id").alias("doc_a"),
        "bucket",
        F.col("weight").alias("wa"),
    )
    b = feats.select(
        F.col("doc_id").alias("doc_b"),
        "bucket",
        F.col("weight").alias("wb"),
    )
    dots = (
        a.join(b, "bucket")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("norm_sq").alias("na"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("norm_sq").alias("nb"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn(
            "cosine",
            F.col("dot")
            / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))),
        )
        .filter(F.col("cosine") >= threshold)
        .select("doc_a", "doc_b", "cosine")
    )

def _hashed_cosine_method(feats: DataFrame) -> str:
    """The auto regime choice for hashed_cosine_pairs: one tiny occupancy
    aggregate (driver traffic: 1 row) comparing the inverted index's
    candidate volume Σ_b n_b² against the n²/4 line — below it the index
    genuinely prunes (sparse bucket space: dim ≫ per-doc nonzeros and low
    per-bucket df), at or above it the map-probe pair loop is strictly
    better (the index would shuffle MORE rows than the raw pair count).
    Both regimes are real, and the verdict tracks CONTENT, not just dim
    (pinned in tests/test_skew.py): the driver corpus (31-word vocab)
    and even the 2000-word boilerplate skew corpus land pairloop at ANY
    dim — occupied buckets are capped by vocabulary, and a 500-member
    boilerplate family keeps its ~80 buckets hot regardless — while a
    distinct-content corpus over a real-text vocabulary (the prune
    condition is roughly vocab > 4·tokens_per_doc²) lands inverted."""
    occ = feats.groupBy("bucket").agg(F.count("*").alias("n"))
    row = (
        occ.agg(F.sum(F.col("n") * F.col("n")).alias("cand"))
        .crossJoin(feats.agg(F.countDistinct("doc_id").alias("ndocs")))
        .collect()[0]
    )
    cand = row.cand or 0
    ndocs = row.ndocs or 0
    return "inverted" if cand * 4 < ndocs * ndocs else "pairloop"


#: deterministic seed tag for the demo linear-model weights
LINEAR_SEED = "qw0"


def hashed_linear_score(
    spark: SparkSession,
    sf_dir: str,
    *,
    dim: int = FEATURE_DIM,
    seed: str = LINEAR_SEED,
) -> DataFrame:
    """Linear quality-classifier SCORING over the hashed features — the
    fastText-style shape used by the GPT-3/LLaMA data pipelines (score
    every crawl document against a trained linear model, keep the
    high-margin tail). The model here is a deterministic stand-in — a
    ``dim``-row weight table derived from md5 (a real pipeline would
    load trained weights from parquet; the scoring plan is identical) —
    because training a classifier is out of scope but SCORING at corpus
    scale is the engine's job.

    Scale shape: the model is a ``dim``-row relation, broadcast onto the
    token-hashed features (model-dim-grain broadcast — the exact join a
    trained-weights parquet would take), one doc-grain aggregate for the
    margin. No shuffle beyond the feature groupBy; margins are
    L2-normalized so document length cancels. Float parity: each
    ``weight·w`` product is one IEEE multiply, the sum goes through xsum
    (order-independent), the final divide is one IEEE op — oracle-exact.

    Returns (doc_id, margin, quality_pass): margin = wᵀx/‖x‖,
    quality_pass = margin > 0 (the decision boundary of the stand-in
    model; a trained model would ship its own threshold)."""
    feats = hashed_token_features(spark, sf_dir, dim=dim).filter(
        F.col("weight") != 0
    )
    model = spark.range(dim).select(
        F.col("id").cast("int").alias("bucket"),
        (
            (
                F.pmod(
                    md5_long(F.concat(F.lit(seed), F.col("id").cast("string"))),
                    F.lit(2001),
                )
                - 1000
            ).cast("double")
            / F.lit(1000.0)
        ).alias("w"),
    )
    return (
        feats.join(F.broadcast(model), "bucket")
        .groupBy("doc_id")
        .agg(
            (
                xsum(F.col("weight").cast("double") * F.col("w"))
                / F.sqrt(
                    F.sum(F.col("weight") * F.col("weight")).cast("double")
                )
            ).alias("margin")
        )
        .select(
            "doc_id",
            "margin",
            (F.col("margin") > 0).alias("quality_pass"),
        )
    )


def doc_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM bits-per-token quality score — the CCNet-perplexity
    shape (score each document by how surprising its tokens are under a
    corpus-level language model; filter the high-perplexity tail as
    gibberish and the low tail as boilerplate), with the unigram LM
    trained ON the corpus itself in the same plan. A real CCNet run
    scores with an external KenLM model — unavailable here, and the
    engine-side shape (token join against a model relation + doc-grain
    aggregate) is identical.

    Log-free parity trick: true surprisal −log2(cnt/N) rounds
    differently across engines' libm, so the score uses INTEGER dyadic
    surprisal ``floor(log2(N div cnt))`` computed as
    ``length(bin(N div cnt)) − 1`` — pure integer/string ops, identical
    everywhere, and within 1 bit of the real value (plenty for a
    filtering signal; the ranking it induces is the same as binned
    perplexity). Per-doc score = Σ tf·bits / n_tokens: exact integer
    sums, one IEEE division.

    Scale shape: token-grain explode, term-grain count (map-side partial
    agg), the 1-row corpus total broadcast, one join back at term grain,
    doc-grain aggregate — every shuffle at aggregate grain, no UDFs.
    Complements rare_token_stats (df-based, linear-scale): this is the
    occurrence-count LM view on a log scale."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    cnt = tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
    total = cnt.agg(F.sum("cnt").alias("n_total"))
    # integer division via `div` (not double-divide + cast: a rounded
    # double can cross an integer boundary at 100-TB token counts)
    bits = (
        F.length(F.bin(F.expr("n_total div cnt"))) - 1
    ).alias("bits")
    lm = cnt.crossJoin(F.broadcast(total)).select("term", bits)
    return (
        tf.join(lm, "term")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            (
                F.sum(F.col("tf") * F.col("bits")).cast("double")
                / F.sum("tf")
            ).alias("mean_bits_per_token"),
        )
        .select("doc_id", "n_tokens", "mean_bits_per_token")
    )


#: linear-probe training hyperparameters: full-batch GD steps and the
#: DYADIC learning rate denominator (η = 1/2⁸ — a power of two, so the
#: per-step scale is exact in binary and the whole training replays
#: bit-for-bit in the SQL oracle). η was chosen by a measured sweep:
#: GD on these un-normalized count features needs η < 2/λmax(XᵀX/n) —
#: 1/8 visibly DIVERGES (loss 500 → 4.6e9 in 3 steps), 1/256 converges
#: (500 → 94.5); the convergence itself is pinned in tests.
PROBE_STEPS = 3
PROBE_ETA_DEN = 256
#: bias term rides the feature relation as bucket −1 with weight 1
PROBE_BIAS_BUCKET = -1


def _probe_features(spark: SparkSession, sf_dir: str, dim: int) -> DataFrame:
    """Hashed features + a constant bias feature per document."""
    feats = hashed_token_features(spark, sf_dir, dim=dim).select(
        "doc_id", "bucket", "weight"
    )
    bias = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.lit(PROBE_BIAS_BUCKET).cast("int").alias("bucket"),
        F.lit(1).cast("long").alias("weight"),
    )
    return feats.unionByName(bias)


def _probe_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training target: 1.0 iff text_quality's composite
    score clears the default keep threshold — the label a human-rated
    quality set would supply; here it is derivable so training is
    oracle-replayable end-to-end."""
    return text_quality(spark, sf_dir).select(
        "doc_id",
        F.when(F.col("quality_score") >= 0.5, F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("y"),
    )


def _probe_is_eval():
    """The md5 train/eval split as a pure doc_id predicate (the same
    backfill-stable rule as assembly.train_test_split — no join needed,
    the split is a per-row function)."""
    from .assembly import EVAL_PCT, SPLIT_BUCKETS

    return (
        md5_long(F.col("doc_id").cast("string")) % SPLIT_BUCKETS < EVAL_PCT
    )


def _train_probe(
    spark: SparkSession,
    sf_dir: str,
    dim: int,
    steps: int,
    train_only: bool = False,
) -> dict[int, float]:
    """DISTRIBUTED MODEL TRAINING as relational ops: least-squares linear
    probe fit by full-batch gradient descent, each step two
    aggregate-grain Spark jobs — per-doc predictions (feature⋈weight
    join + xsum dot) and per-bucket gradients (feature⋈residual join +
    xsum) — with only the (dim+1)-row gradient collected per step (the
    k-grain driver-traffic pattern of _train_centroids).

    Exactness engineering (what makes TRAINING oracle-checkable, which
    gradient descent normally is not): every sum is ``xsum`` (the
    rounding-free fixed-point accumulator — order-invariant AND
    engine-invariant), the learning rate is dyadic (η = 1/2³, an exact
    binary scale), and the update w − g/(η_den·n) is a single IEEE
    division + subtraction with identical operand values on both
    engines — so the DuckDB oracle's unrolled step chain reproduces the
    weights bit-for-bit, the same way the k-means oracle replays Lloyd
    iterations. Squared loss (not logistic) is deliberate: a sigmoid
    would pull in libm exp(), whose rounding differs across engines."""
    feats = _probe_features(spark, sf_dir, dim)
    labels = _probe_labels(spark, sf_dir)
    if train_only:
        feats = feats.filter(~_probe_is_eval())
        labels = labels.filter(~_probe_is_eval())
    # r17: persist BOTH loop relations pre-partitioned by doc_id with
    # one shared cluster-derived width (the _loop_layout discipline —
    # guide §2.2/§2.4). Two effects: (a) the cached layout is SPREAD —
    # without it the init aggregates' AQE-coalesced output leaves the
    # cached loop relations narrow and every step's scan under-parallel
    # (the same trap the tokenizer loops fixed in r16); (b) at scales
    # where the per-step joins stop broadcasting, both sides of every
    # doc-grain join/groupBy already share hash(doc_id) partitioning,
    # so the only structural per-step exchange is the bucket-grain
    # gradient aggregate (bounded by dim+1 rows at any corpus scale).
    # Weights are bit-identical by construction (xsum is
    # order-invariant) and were asserted so in the same-JVM A/B (copart
    # won all 3 alternations: 5.9<15.0, 4.2<4.8, 4.1<4.7 s).
    npart = spark.sparkContext.defaultParallelism
    feats = feats.repartition(npart, "doc_id").persist()
    labels = labels.repartition(npart, "doc_id").persist()
    n = labels.count()
    w = {b: 0.0 for b in [PROBE_BIAS_BUCKET, *range(dim)]}
    for _ in range(steps):
        dots = (
            feats.join(_weights_rel(spark, w), "bucket")
            .groupBy("doc_id")
            .agg(xsum(F.col("weight").cast("double") * F.col("wb")).alias("dot"))
        )
        resid = dots.join(labels, "doc_id").select(
            "doc_id", (F.col("dot") - F.col("y")).alias("r")
        )
        grad = (
            feats.join(resid, "doc_id")
            .groupBy("bucket")
            .agg(xsum(F.col("weight").cast("double") * F.col("r")).alias("g"))
            .collect()
        )
        gmap = {row.bucket: row.g for row in grad}
        w = {
            b: w[b] - gmap.get(b, 0.0) / (PROBE_ETA_DEN * n) for b in w
        }
    # feats/labels are consumed entirely inside this loop (the return
    # value is the plain weight dict) — release the pins here rather
    # than letting them accumulate across train/scores/eval calls
    feats.unpersist()
    labels.unpersist()
    return w


def _weights_rel(spark: SparkSession, w: dict[int, float]):
    """The current weight vector as a broadcast (dim+1)-row RELATION —
    the same model-dim-grain broadcast-join shape hashed_linear_score
    uses for its weight table. A literal ``create_map`` would embed all
    dim+1 entries in the plan tree, growing plan size and analyzer time
    linearly with the feature dimension (VERDICT r9 item 8); the
    relation keeps the plan constant-size at any dim. Bit-exactness is
    unchanged: the join delivers the identical double per bucket that
    ``element_at`` did, and the downstream xsum is order-invariant."""
    return F.broadcast(
        spark.createDataFrame(sorted(w.items()), "bucket int, wb double")
    )


def linear_probe_train(
    spark: SparkSession,
    sf_dir: str,
    *,
    dim: int = FEATURE_DIM,
    steps: int = PROBE_STEPS,
) -> DataFrame:
    """The trained probe weights — ``(bucket, w)``, bucket −1 = bias.
    See ``_train_probe`` for the training mechanics and the exactness
    contract; the companion scoring plan is ``linear_probe_scores``
    (and ``hashed_linear_score`` is the fixed-weight scoring twin this
    upgrades with weights actually FIT to the corpus)."""
    w = _train_probe(spark, sf_dir, dim, steps)
    return spark.createDataFrame(
        sorted(w.items()), "bucket int, w double"
    )


def linear_probe_scores(
    spark: SparkSession,
    sf_dir: str,
    *,
    dim: int = FEATURE_DIM,
    steps: int = PROBE_STEPS,
) -> DataFrame:
    """Per-document predictions under the trained probe: ``(doc_id, y,
    score)`` — the regression target and the fitted linear output. The
    evidence training WORKED (loss strictly below the w=0 baseline) is
    pinned in tests/test_curation.py; this plan is the scoring pass a
    quality-filter deployment runs."""
    w = _train_probe(spark, sf_dir, dim, steps)
    feats = _probe_features(spark, sf_dir, dim)
    dots = (
        feats.join(_weights_rel(spark, w), "bucket")
        .groupBy("doc_id")
        .agg(xsum(F.col("weight").cast("double") * F.col("wb")).alias("score"))
    )
    return (
        _probe_labels(spark, sf_dir)
        .join(dots, "doc_id")
        .select("doc_id", "y", "score")
    )


def linear_probe_eval(
    spark: SparkSession,
    sf_dir: str,
    *,
    dim: int = FEATURE_DIM,
    steps: int = PROBE_STEPS,
) -> DataFrame:
    """Held-out evaluation with proper train/test discipline: the probe
    trains on the TRAIN split only (the md5 bucket rule of
    assembly.train_test_split — a pure doc_id predicate, so no leakage
    and no join), then scores the disjoint EVAL split and emits one
    metrics row ``(n_eval, mse, accuracy)`` (accuracy at the 0.5
    decision threshold). Exactness carries through the metrics: xsum
    squared error, integer correct-counts, one IEEE division each — the
    whole train→evaluate workflow stays bit-checkable against the SQL
    replay."""
    w = _train_probe(spark, sf_dir, dim, steps, train_only=True)
    feats = _probe_features(spark, sf_dir, dim).filter(_probe_is_eval())
    labels = _probe_labels(spark, sf_dir).filter(_probe_is_eval())
    dots = (
        feats.join(_weights_rel(spark, w), "bucket")
        .groupBy("doc_id")
        .agg(xsum(F.col("weight").cast("double") * F.col("wb")).alias("score"))
    )
    scored = labels.join(dots, "doc_id")
    return scored.agg(
        F.count(F.lit(1)).alias("n_eval"),
        (
            xsum((F.col("score") - F.col("y")) * (F.col("score") - F.col("y")))
            / F.count(F.lit(1))
        ).alias("mse"),
        (
            F.sum(
                F.when(
                    (F.col("score") >= 0.5) == (F.col("y") == 1.0),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).cast("double")
            / F.count(F.lit(1))
        ).alias("accuracy"),
    ).select("n_eval", "mse", "accuracy")


def doc_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM bits-per-token surprisal — the conditional upgrade of
    ``doc_surprisal``'s unigram LM (the CCNet recipe actually uses an
    n-gram model: a token is scored given its CONTEXT, so formulaic
    boilerplate — predictable continuations — scores low even when its
    tokens are individually rare). Trained on-corpus in the same plan:
    every bigram scored was seen at training (count ≥ 1), so no backoff
    is needed and the estimate C(w₁)/C(w₁w₂) is always defined.

    Same log-free dyadic-bits trick as doc_surprisal for cross-engine
    exactness: conditional surprisal −log2(C(w₁w₂)/C(w₁)) is computed as
    ``length(bin(C(w₁) div C(w₁w₂))) − 1`` (pure integer/string ops);
    each document's FIRST token has no context and takes its unigram
    bits ``length(bin(N div C(w))) − 1``.

    Scale shape: position matters for bigrams, so the LAG runs at token
    grain (posexplode + a doc-partitioned window — doc-grain partitions,
    never corpus-wide); everything downstream then collapses to
    (doc, bigram)-tf grain BEFORE the LM joins — a document repeating a
    bigram k times contributes one join row with weight k, the same
    volume collapse ``doc_surprisal`` gets from tf grain — followed by
    term-/bigram-grain count aggregates (map-side partial) and a
    doc-grain weighted mean."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "term")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    # (doc, prev, term) tf grain: the lag output collapsed per document
    # (prev IS NULL marks each doc's single first token, tf = 1 there)
    release_plan_caches()
    seq = _pin(
        tok.withColumn("prev", F.lag("term").over(w))
        .groupBy("doc_id", "prev", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    uni = seq.groupBy("term").agg(F.sum("tf").alias("c1"))
    total = uni.agg(F.sum("c1").alias("n"))
    big = (
        seq.filter(F.col("prev").isNotNull())
        .groupBy("prev", "term")
        .agg(F.sum("tf").alias("c2"))
    )
    uni_prev = uni.select(
        F.col("term").alias("prev"), F.col("c1").alias("c1_prev")
    )
    scored = (
        seq.join(uni, "term")
        .crossJoin(F.broadcast(total))
        .join(uni_prev, "prev", "left")
        .join(big, ["prev", "term"], "left")
        .withColumn(
            "bits",
            F.when(
                F.col("prev").isNull(),
                F.length(F.bin(F.expr("n div c1"))) - 1,
            ).otherwise(F.length(F.bin(F.expr("c1_prev div c2"))) - 1),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            (
                F.sum(F.col("tf") * F.col("bits")).cast("double")
                / F.sum("tf")
            ).alias("mean_bits_per_token"),
        )
        .select("doc_id", "n_tokens", "mean_bits_per_token")
    )


def ann_ivf_topk_filtered(
    spark: SparkSession,
    sf_dir: str,
    *,
    label: int = 0,
    top_k: int = IVF_TOP_K,
    n_queries: int = IVF_N_QUERIES,
    rows_per_centroid: int = KMEANS_ROWS_PER_CENT,
    max_k: int = KMEANS_MAX_K,
    nprobe: int | None = None,
    exhaustive: bool = False,
) -> DataFrame:
    """FILTERED vector search — top-k nearest neighbors AMONG the
    vectors satisfying a metadata predicate (here ``label = L``; the
    shape every retrieval deployment needs: "nearest docs in THIS
    language / THIS date range / THIS license"). Two standard failure
    modes, both handled:

    - **Post-filtering starves**: running plain ANN and filtering the
      top-k afterwards returns < k (often 0) results for selective
      predicates. Here the predicate is applied to the CANDIDATE
      relation BEFORE scoring (pre-filtering) — the filter rides the
      cluster equi-join's build side, so non-matching vectors are never
      scored.
    - **Pre-filtering under-probes**: with a fixed nprobe, the probed
      cells may hold few or NO matching vectors (matches concentrate
      in the cells of "their" region — widening by 1/selectivity, the
      uniform-spread heuristic, measured only 0.60 recall on the
      clustered corpus). The robust rule is COVERAGE-based probing:
      rank ALL cells per query by centroid distance, drop cells with
      zero matches outright, and keep the nearest cells until the
      cumulative MATCHING-vector count reaches ``PROBE_COVERAGE·k``.
      Per-query candidate volume is ≈ the coverage target regardless
      of selectivity; for a predicate matching fewer vectors than the
      target this degrades exactly to brute force over the filtered
      subset — the right asymptote. The per-cell matching counts are a
      cell-grain (≤ k rows) broadcast, and the cumulative cut is one
      tiny per-query window over ≤ k rows — no extra corpus pass.

    Recall regimes (measured on the adversarial clustered corpus,
    gated per-regime in tests/test_skew.py): a RARE label (subset
    below the coverage target) gets the brute-force asymptote — the
    coverage rule scans all its cells, recall ≥ 0.9 for every query.
    For a DENSE label the filter makes ground truth strictly harder
    than plain ANN: restricting to one natural cluster's members turns
    top-k into a ranking among near-equidistant vectors whose order is
    noise-determined, so the true neighbors scatter across most of the
    region's cells (measured: matching-cell ranks up to 29 of 44 — a
    fact of the geometry, not of this index; bounded-candidate filtered
    search is a known-hard regime). The contract is therefore an
    explicit recall-vs-probe-cost KNOB: the default √k probe floor
    gives bounded candidates at moderate recall (measured 0.75
    in-partition), ``nprobe`` buys recall monotonically (0.9+ at
    nprobe≈⅔ of the matching cells), and ``exhaustive=True`` skips the
    probe cut and scores EVERY matching vector — exact by construction
    over the subset, candidate volume bounded by the subset size,
    never the corpus.

    Rows-only (approximate by construction, like ann_ivf_topk); the
    recall gates vs the brute-force FILTERED twin are pinned in
    tests/test_skew.py."""
    emb = _pin(_embeddings_normed(spark, sf_dir))
    labels = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    cent_ids, cmat, cn = _train_centroids(
        emb,
        cache_key=sf_dir,
        rows_per_centroid=rows_per_centroid,
        max_k=max_k,
        foldexact=False,
    )
    k_cells = cmat.shape[0]
    assign1 = _assign_clusters_udf(cent_ids, cmat, cn, 1, foldexact=False)
    assign_all = _assign_clusters_udf(
        cent_ids, cmat, cn, k_cells, foldexact=False
    )
    # pre-filter: only matching vectors enter the candidate index side
    assigned = (
        emb.join(labels.filter(F.col("label") == label), "vec_id")
        .select(
            "vec_id",
            "v",
            "nrm",
            F.explode(assign1(F.col("v"), F.col("nrm"))).alias("cluster"),
        )
    )
    cell_counts = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("m_c")
    )
    coverage = PROBE_COVERAGE * top_k
    q = emb.filter(F.col("vec_id") < n_queries)
    ranked = q.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.posexplode(assign_all(F.col("v"), F.col("nrm"))).alias(
            "probe_rank", "cluster"
        ),
    )
    w_cum = (
        Window.partitionBy("query_id")
        .orderBy("probe_rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Keep a cell if it is within the BASE probe depth over matching
    # cells (the ⌈√k⌉ rule — neighbors scatter across several adjacent
    # cells even when matches are dense, so coverage alone would stop
    # after one big cell) OR still needed to reach the coverage target
    # (the rare-label extension). rank_m = rank among MATCHING cells.
    nprobe_base = (
        nprobe
        if nprobe is not None
        else max(IVF_NPROBE, int(np.ceil(np.sqrt(k_cells))))
    )
    w_rank = Window.partitionBy("query_id").orderBy("probe_rank")
    probed = ranked.join(F.broadcast(cell_counts), "cluster")  # empty out
    if not exhaustive:
        probed = (
            probed.withColumn("cum", F.sum("m_c").over(w_cum))
            .withColumn("rank_m", F.row_number().over(w_rank))
            .filter(
                (F.col("rank_m") <= F.lit(nprobe_base))
                | (F.col("cum") - F.col("m_c") < F.lit(coverage))
            )
        )
    probes = probed.select("query_id", "qv", "qn", "cluster")
    pair_dot = _pair_dot_udf(foldexact=False)
    scored = (
        probes.join(assigned, "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                pair_dot(F.col("qv"), F.col("v"))
                / (F.col("qn") * F.col("nrm"))
            ).alias("cosine"),
        )
    )
    w_top = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w_top))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


LIBRARY_QUERIES = {
    # Count-Min sketch family (r12): deterministic md5 hashing makes
    # both relations oracle-EXACT — rare for a sketch
    "countmin_sketch": countmin_sketch,
    "countmin_estimates": countmin_estimates,
    # rows-only (approximate by construction): recall-vs-filtered-twin
    # gate in tests/test_skew.py
    "ann_ivf_topk_filtered": ann_ivf_topk_filtered,
    "doc_bigram_surprisal": doc_bigram_surprisal,
    "linear_probe_train": linear_probe_train,
    "linear_probe_scores": linear_probe_scores,
    "linear_probe_eval": linear_probe_eval,
    "hashed_token_features": hashed_token_features,
    "hashed_cosine_pairs": hashed_cosine_pairs,
    "hashed_linear_score": hashed_linear_score,
    "doc_surprisal": doc_surprisal,
    "simhash_signatures": simhash_signatures,
    "embedding_near_dup": embedding_near_dup,
    "hard_negative_mining": hard_negative_mining,
    # rows-only BY CONSTRUCTION (IVF candidates); recall ≥ 0.9 vs the
    # exact twin pinned in tests/test_plans.py
    "hard_negative_mining_ann": hard_negative_mining_ann,
    "semantic_dedup": semantic_dedup,
    # iterative (no SQL twin): rows-only in the library harness; exactly
    # checked against a union-find replay in tests/test_operators.py
    "near_dup_components": near_dup_components,
    "rare_token_stats": rare_token_stats,
    "dup_ngram_fraction": dup_ngram_fraction,
    # rows-only in the library harness (approximate by construction);
    # recall + code-size invariants pinned in tests/test_operators.py
    # and tests/test_skew.py
    "ann_ivfpq_topk": ann_ivfpq_topk,
    # rows-only by design (partition-order-dependent counters); the MG
    # containment + error-band guarantee is pinned in tests/test_operators.py
    "approx_heavy_hitters": approx_heavy_hitters,
    # rows-only (cluster ids are index-internal); sizes bounded on the
    # adversarial corpus in tests/test_skew.py
    "ivf_cluster_stats": ivf_cluster_stats,
}

def _cm_cells_sql(w: int, d: int, src: str = "tok") -> str:
    """The d-way cell fanout as a UNION ALL — same seeded md5 family as
    _cm_cells, bit-for-bit."""
    parts = []
    for i in range(d):
        h = oracle_md5_long(f"'cm{i}#' || tok")
        parts.append(
            f"SELECT {i} AS r, CAST({h} % {w} AS INTEGER) AS cell, tok"
            f" FROM {src}"
        )
    return "\n    UNION ALL ".join(parts)


LIBRARY_ORACLE["countmin_sketch"] = f"""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    cells AS (
        {_cm_cells_sql(CM_W, CM_D)}
    )
    SELECT r, cell, COUNT(*) AS cnt FROM cells GROUP BY r, cell
"""

LIBRARY_ORACLE["countmin_estimates"] = f"""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    counts AS (
        SELECT tok, COUNT(*) AS true_count FROM tok GROUP BY tok
    ),
    ranked AS (
        SELECT tok, true_count,
               ROW_NUMBER() OVER (ORDER BY true_count DESC, tok) AS rk_top,
               ROW_NUMBER() OVER (ORDER BY true_count ASC, tok) AS rk_bot
        FROM counts
    ),
    queried AS (
        SELECT tok, true_count FROM ranked
        WHERE rk_top <= {CM_QUERY_K} OR rk_bot <= {CM_QUERY_K}
    ),
    cells AS (
        {_cm_cells_sql(CM_W, CM_D)}
    ),
    sketch AS (
        SELECT r, cell, COUNT(*) AS cnt FROM cells GROUP BY r, cell
    ),
    probes AS (
        {_cm_cells_sql(CM_W, CM_D, src="queried")}
    )
    SELECT q.tok AS term, q.true_count, MIN(s.cnt) AS cm_estimate
    FROM probes p
    JOIN queried q ON q.tok = p.tok
    JOIN sketch s ON s.r = p.r AND s.cell = p.cell
    GROUP BY q.tok, q.true_count
"""

LIBRARY_ORACLE["hashed_token_features"] = f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents
    )
    SELECT doc_id,
           CAST({oracle_md5_long('tok')} % {FEATURE_DIM} AS INTEGER) AS bucket,
           CAST(SUM(CASE WHEN {oracle_md5_long("tok || '#s'")} % 2 = 0
                         THEN 1 ELSE -1 END) AS BIGINT) AS weight
    FROM tok
    GROUP BY 1, 2
"""

LIBRARY_ORACLE["hashed_cosine_pairs"] = f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ), feats AS (
        SELECT doc_id,
               CAST({oracle_md5_long('tok')} % {FEATURE_DIM} AS INTEGER) AS bucket,
               CAST(SUM(CASE WHEN {oracle_md5_long("tok || '#s'")} % 2 = 0
                             THEN 1 ELSE -1 END) AS BIGINT) AS weight
        FROM tok GROUP BY 1, 2
        HAVING SUM(CASE WHEN {oracle_md5_long("tok || '#s'")} % 2 = 0
                        THEN 1 ELSE -1 END) <> 0
    ), norms AS (
        SELECT doc_id, SUM(weight * weight) AS norm_sq FROM feats GROUP BY 1
    ), dots AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               SUM(a.weight * b.weight) AS dot
        FROM feats a JOIN feats b
          ON a.bucket = b.bucket AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           dot / (sqrt(CAST(na.norm_sq AS DOUBLE)) * sqrt(CAST(nb.norm_sq AS DOUBLE)))
               AS cosine
    FROM dots
    JOIN norms na ON na.doc_id = doc_a
    JOIN norms nb ON nb.doc_id = doc_b
    WHERE dot / (sqrt(CAST(na.norm_sq AS DOUBLE)) * sqrt(CAST(nb.norm_sq AS DOUBLE)))
          >= {HASHED_COS_THRESHOLD}
"""

LIBRARY_ORACLE["hashed_linear_score"] = f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ), feats AS (
        SELECT doc_id,
               CAST({oracle_md5_long('tok')} % {FEATURE_DIM} AS INTEGER) AS bucket,
               CAST(SUM(CASE WHEN {oracle_md5_long("tok || '#s'")} % 2 = 0
                             THEN 1 ELSE -1 END) AS BIGINT) AS weight
        FROM tok GROUP BY 1, 2
        HAVING SUM(CASE WHEN {oracle_md5_long("tok || '#s'")} % 2 = 0
                        THEN 1 ELSE -1 END) <> 0
    ), model AS (
        SELECT CAST(range AS INTEGER) AS bucket,
               CAST({oracle_md5_long(f"'{LINEAR_SEED}' || CAST(range AS VARCHAR)")}
                    % 2001 - 1000 AS DOUBLE) / 1000.0 AS w
        FROM range({FEATURE_DIM})
    ), margins AS (
        SELECT doc_id,
               {oracle_xsum('CAST(weight AS DOUBLE) * w')}
                   / sqrt(CAST(SUM(weight * weight) AS DOUBLE)) AS margin
        FROM feats JOIN model USING (bucket)
        GROUP BY 1
    )
    SELECT doc_id, margin, margin > 0 AS quality_pass FROM margins
"""

def _probe_split_sql(which: str) -> str:
    """The md5 split predicate in SQL: ``which`` ∈ ('train', 'eval')."""
    from .assembly import EVAL_PCT, SPLIT_BUCKETS

    op = "<" if which == "eval" else ">="
    return (
        f"{oracle_md5_long('CAST(doc_id AS VARCHAR)')} "
        f"% {SPLIT_BUCKETS} {op} {EVAL_PCT}"
    )


def _probe_chain_sql(dim: int, steps: int, train_only: bool = False) -> str:
    """Unrolled GD training chain (the k-means-oracle technique applied
    to gradient descent): w{t} → dots{t} → resid{t} → grad{t} → w{t+1},
    every aggregate through oracle_xsum, MATERIALIZED throughout (each
    w{t} is referenced twice per step — inlining would grow the plan
    exponentially, same hazard as the BPE chain). ``train_only``
    restricts features and labels to the md5 train split (the held-out
    evaluation oracle)."""
    where = f"WHERE {_probe_split_sql('train')}" if train_only else ""
    feats = f"""
        SELECT doc_id,
               CAST({oracle_md5_long('tok')} % {dim} AS INTEGER) AS bucket,
               CAST(SUM(CASE WHEN {oracle_md5_long("tok || '#s'")} % 2 = 0
                             THEN 1 ELSE -1 END) AS BIGINT) AS weight
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents {where})
        GROUP BY 1, 2
        UNION ALL
        SELECT doc_id, {PROBE_BIAS_BUCKET} AS bucket, CAST(1 AS BIGINT)
        FROM documents {where}
    """
    parts = [
        f"feats AS MATERIALIZED ({feats})",
        f"""labels AS MATERIALIZED (
        SELECT doc_id,
               CASE WHEN quality_score >= 0.5 THEN 1.0 ELSE 0.0 END AS y
        FROM ({ORACLE['text_quality']}) {where}
    )""",
        "nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM labels)",
        f"""w0 AS MATERIALIZED (
        SELECT CAST(x AS INTEGER) AS bucket, 0.0 AS wt
        FROM (SELECT range AS x FROM range({dim})
              UNION ALL SELECT {PROBE_BIAS_BUCKET})
    )""",
    ]
    for t in range(steps):
        parts.append(
            f"""dots{t} AS MATERIALIZED (
        SELECT f.doc_id,
               {oracle_xsum('CAST(f.weight AS DOUBLE) * w.wt')} AS dot
        FROM feats f JOIN w{t} w USING (bucket)
        GROUP BY 1
    ),
    resid{t} AS MATERIALIZED (
        SELECT l.doc_id, d.dot - l.y AS r
        FROM labels l JOIN dots{t} d USING (doc_id)
    ),
    grad{t} AS MATERIALIZED (
        SELECT f.bucket,
               {oracle_xsum('CAST(f.weight AS DOUBLE) * r.r')} AS g
        FROM feats f JOIN resid{t} r USING (doc_id)
        GROUP BY 1
    ),
    w{t + 1} AS MATERIALIZED (
        SELECT w.bucket,
               w.wt - COALESCE(g.g, 0.0) / ({PROBE_ETA_DEN} * n.n) AS wt
        FROM w{t} w LEFT JOIN grad{t} g USING (bucket) CROSS JOIN nc n
    )"""
        )
    return ",\n    ".join(parts)


LIBRARY_ORACLE["linear_probe_train"] = f"""
    WITH {_probe_chain_sql(FEATURE_DIM, PROBE_STEPS)}
    SELECT bucket, wt AS w FROM w{PROBE_STEPS}
"""

LIBRARY_ORACLE["linear_probe_scores"] = f"""
    WITH {_probe_chain_sql(FEATURE_DIM, PROBE_STEPS)},
    final_dots AS (
        SELECT f.doc_id,
               {oracle_xsum('CAST(f.weight AS DOUBLE) * w.wt')} AS score
        FROM feats f JOIN w{PROBE_STEPS} w USING (bucket)
        GROUP BY 1
    )
    SELECT l.doc_id, l.y, d.score
    FROM labels l JOIN final_dots d USING (doc_id)
"""

LIBRARY_ORACLE["linear_probe_eval"] = f"""
    WITH {_probe_chain_sql(FEATURE_DIM, PROBE_STEPS, train_only=True)},
    feats_eval AS MATERIALIZED (
        SELECT doc_id,
               CAST({oracle_md5_long('tok')} % {FEATURE_DIM} AS INTEGER) AS bucket,
               CAST(SUM(CASE WHEN {oracle_md5_long("tok || '#s'")} % 2 = 0
                             THEN 1 ELSE -1 END) AS BIGINT) AS weight
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents WHERE {_probe_split_sql('eval')})
        GROUP BY 1, 2
        UNION ALL
        SELECT doc_id, {PROBE_BIAS_BUCKET} AS bucket, CAST(1 AS BIGINT)
        FROM documents WHERE {_probe_split_sql('eval')}
    ),
    labels_eval AS (
        SELECT doc_id,
               CASE WHEN quality_score >= 0.5 THEN 1.0 ELSE 0.0 END AS y
        FROM ({ORACLE['text_quality']})
        WHERE {_probe_split_sql('eval')}
    ),
    dots_eval AS (
        SELECT f.doc_id,
               {oracle_xsum('CAST(f.weight AS DOUBLE) * w.wt')} AS score
        FROM feats_eval f JOIN w{PROBE_STEPS} w USING (bucket)
        GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_eval,
           {oracle_xsum('(d.score - l.y) * (d.score - l.y)')}
               / COUNT(*) AS mse,
           CAST(SUM(CASE WHEN (d.score >= 0.5) = (l.y = 1.0)
                         THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS accuracy
    FROM labels_eval l JOIN dots_eval d USING (doc_id)
"""

def lm_heldout_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HELD-OUT language-model evaluation — the discipline
    ``doc_bigram_surprisal`` lacks (there, train = test, so memorized
    boilerplate scores artificially low): a bigram LM is trained on the
    md5 TRAIN split only (the backfill-stable doc_id rule of
    assembly.train_test_split — a pure predicate, no leakage) and
    scores the DISJOINT eval split, per eval doc: token count, OOV
    count, mean bits/token. This is the quality-signal shape a real
    CCNet-style pipeline ships: score NEW crawl batches under a model
    fit on curated history.

    Backoff ladder (stupid-backoff shape, penalty-free — documented
    simplification, every branch integer-exact): bigram seen in train →
    conditional bits ``len(bin(C(w₁) div C(w₁w₂)))−1``; else unigram
    seen → ``len(bin(N div C(w)))−1``; else OOV → the max-surprisal
    floor ``len(bin(N))−1``. First tokens have null context and take
    the unigram/OOV branches. Same log-free dyadic-bits device as
    doc_surprisal — cross-engine bit-exact, no libm.

    Scale shape: train and eval streams both collapse to
    (doc, prev, term)-tf grain before any join (the
    doc_bigram_surprisal volume trick); LM counts are term-/bigram-
    grain aggregates with map-side partials; scoring is two/three
    LEFT joins at tf grain + a doc-grain weighted mean. Doc-grain
    LAG windows only — never corpus-wide."""
    from .assembly import EVAL_PCT, SPLIT_BUCKETS

    docs = load_table(spark, sf_dir, "documents")
    is_eval = (
        md5_long(F.col("doc_id").cast("string")) % SPLIT_BUCKETS < EVAL_PCT
    )

    def seq_rel(d: DataFrame) -> DataFrame:
        tok = d.select(
            "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "term")
        )
        w = Window.partitionBy("doc_id").orderBy("pos")
        return (
            tok.withColumn("prev", F.lag("term").over(w))
            .groupBy("doc_id", "prev", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )

    seq_t = seq_rel(docs.filter(~is_eval))
    uni = seq_t.groupBy("term").agg(F.sum("tf").alias("c1"))
    total = uni.agg(F.sum("c1").alias("n"))
    big = (
        seq_t.filter(F.col("prev").isNotNull())
        .groupBy("prev", "term")
        .agg(F.sum("tf").alias("c2"))
    )
    uni_prev = uni.select(
        F.col("term").alias("prev"), F.col("c1").alias("c1_prev")
    )
    seq_e = seq_rel(docs.filter(is_eval))
    scored = (
        seq_e.join(uni, "term", "left")
        .crossJoin(F.broadcast(total))
        .join(uni_prev, "prev", "left")
        .join(big, ["prev", "term"], "left")
        .withColumn(
            "bits",
            F.when(
                F.col("c2").isNotNull(),
                F.length(F.bin(F.expr("c1_prev div c2"))) - 1,
            )
            .when(
                F.col("c1").isNotNull(),
                F.length(F.bin(F.expr("n div c1"))) - 1,
            )
            .otherwise(F.length(F.bin(F.col("n"))) - 1),
        )
        .withColumn("oov", F.col("c1").isNull())
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(
                F.when(F.col("oov"), F.col("tf")).otherwise(F.lit(0))
            ).alias("oov_tokens"),
            (
                F.sum(F.col("tf") * F.col("bits")).cast("double")
                / F.sum("tf")
            ).alias("mean_bits_per_token"),
        )
        .select("doc_id", "n_tokens", "oov_tokens", "mean_bits_per_token")
    )


LIBRARY_QUERIES["lm_heldout_perplexity"] = lm_heldout_perplexity

LIBRARY_ORACLE["doc_bigram_surprisal"] = """
    WITH tok AS MATERIALIZED (
        SELECT doc_id, i AS pos, t[i] AS term
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             LATERAL unnest(generate_series(1, len(t))) AS g(i)
    ),
    seq AS MATERIALIZED (
        SELECT doc_id, pos, term,
               lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM tok
    ),
    uni AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c1 FROM tok GROUP BY 1),
    tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n FROM uni),
    big AS (
        SELECT prev, term, CAST(COUNT(*) AS BIGINT) AS c2
        FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
    ),
    scored AS (
        SELECT s.doc_id,
               CASE WHEN s.prev IS NULL
                    THEN length(bin(t.n // u.c1)) - 1
                    ELSE length(bin(u2.c1 // b.c2)) - 1 END AS bits
        FROM seq s
        JOIN uni u ON u.term = s.term
        CROSS JOIN tot t
        LEFT JOIN uni u2 ON u2.term = s.prev
        LEFT JOIN big b ON b.prev = s.prev AND b.term = s.term
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(bits) AS DOUBLE) / COUNT(*) AS mean_bits_per_token
    FROM scored
    GROUP BY 1
"""


LIBRARY_ORACLE["lm_heldout_perplexity"] = """
    WITH tr AS MATERIALIZED (
        SELECT doc_id, text FROM documents WHERE NOT (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 5)
    ),
    ev AS MATERIALIZED (
        SELECT doc_id, text FROM documents WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 5
    ),
    tok_t AS MATERIALIZED (
        SELECT doc_id, i AS pos, t[i] AS term
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM tr),
             LATERAL unnest(generate_series(1, len(t))) AS g(i)
    ),
    seq_t AS MATERIALIZED (
        SELECT doc_id, pos, term,
               lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM tok_t
    ),
    uni AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c1 FROM tok_t GROUP BY 1),
    tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n FROM uni),
    big AS (
        SELECT prev, term, CAST(COUNT(*) AS BIGINT) AS c2
        FROM seq_t WHERE prev IS NOT NULL GROUP BY 1, 2
    ),
    tok_e AS MATERIALIZED (
        SELECT doc_id, i AS pos, t[i] AS term
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM ev),
             LATERAL unnest(generate_series(1, len(t))) AS g(i)
    ),
    seq_e AS MATERIALIZED (
        SELECT doc_id, pos, term,
               lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM tok_e
    ),
    scored AS (
        SELECT s.doc_id,
               u.c1 IS NULL AS oov,
               CASE WHEN b.c2 IS NOT NULL
                    THEN length(bin(u2.c1 // b.c2)) - 1
                    WHEN u.c1 IS NOT NULL
                    THEN length(bin(t.n // u.c1)) - 1
                    ELSE length(bin(t.n)) - 1 END AS bits
        FROM seq_e s
        LEFT JOIN uni u ON u.term = s.term
        CROSS JOIN tot t
        LEFT JOIN uni u2 ON u2.term = s.prev
        LEFT JOIN big b ON b.prev = s.prev AND b.term = s.term
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN oov THEN 1 ELSE 0 END) AS BIGINT) AS oov_tokens,
           CAST(SUM(bits) AS DOUBLE) / COUNT(*) AS mean_bits_per_token
    FROM scored
    GROUP BY 1
"""

LIBRARY_ORACLE["doc_surprisal"] = """
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ), tf AS (
        SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
    ), cnt AS (
        SELECT term, CAST(SUM(tf) AS BIGINT) AS cnt FROM tf GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM cnt
    ), lm AS (
        SELECT term, length(bin(n_total // cnt)) - 1 AS bits
        FROM cnt, tot
    )
    SELECT doc_id,
           CAST(SUM(tf) AS BIGINT) AS n_tokens,
           CAST(SUM(tf * bits) AS DOUBLE) / SUM(tf) AS mean_bits_per_token
    FROM tf JOIN lm USING (term)
    GROUP BY 1
"""


# ---------------------------------------------------------------------------
# end-to-end curated-corpus funnel (registry exposure, round 13)


def training_pipeline_curated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry exposure of ``operators/pipeline.TrainingDataPipeline
    .curated()`` — the composed lang → quality → exact-dedup → near-dup
    funnel that has carried a bench row since r7 but never a driver
    CORRECTNESS row (VERDICT r12 rotation list). The composition is one
    lazy DAG over four independently oracle-checked stage plans
    (lang_id, text_quality, exact_dedup, minhash_near_dup), so its
    oracle is the literal SQL composition of the four stage oracles —
    a value-hash match proves the STAGES *and* the semi/anti-join
    plumbing between them. Output = the surviving documents rows
    (flat schema), ordered by doc_id. ``output_dir`` is unused by
    ``curated()`` (only ``run()`` writes) — a fixed placeholder path.
    """
    import os as _os
    import tempfile as _tempfile

    from ..operators.pipeline import TrainingDataPipeline

    out = TrainingDataPipeline(
        spark,
        sf_dir,
        _os.path.join(_tempfile.gettempdir(), "plan_curated_unused"),
    ).curated()
    return out.orderBy("doc_id")


LIBRARY_QUERIES["training_pipeline_curated"] = training_pipeline_curated

# the funnel oracle composes the four stage oracles verbatim (nested
# CTEs); filters mirror TrainingDataPipeline defaults (lang='en',
# min_quality=0.5) and the survivor set = lang ∩ quality ∩ canonical
# minus near-dup doc_b tombstones — exactly curated()'s join plumbing
LIBRARY_ORACLE["training_pipeline_curated"] = f"""
    WITH lang_scores AS ({ORACLE['lang_id']}),
    qual AS ({ORACLE['text_quality']}),
    canon AS ({ORACLE['exact_dedup']}),
    nd AS ({ORACLE['minhash_near_dup']})
    SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
    FROM documents d
    WHERE d.doc_id IN (SELECT doc_id FROM lang_scores
                       WHERE predicted_lang = 'en')
      AND d.doc_id IN (SELECT doc_id FROM qual WHERE quality_score >= 0.5)
      AND d.doc_id IN (SELECT doc_id FROM canon)
      AND d.doc_id NOT IN (SELECT doc_b FROM nd)
    ORDER BY d.doc_id
"""


# near_dup_components oracle (r13 upgrade, rows-only → EXACT): the
# recursive CTE computes the transitive closure of the symmetric
# near-dup edge relation — (node, lbl) for every lbl in node's
# component — and MIN(lbl) per node is exactly the fixpoint the Spark
# min-label-propagation loop converges to. The pair relation is the
# (already oracle-exact) minhash_near_dup SQL, wrapped in a subselect
# because a bare top-level UNION ALL inside a WITH RECURSIVE clause
# would be parsed as a self-recursive definition.
LIBRARY_ORACLE["near_dup_components"] = f"""
    WITH RECURSIVE nd AS (SELECT * FROM ({ORACLE['minhash_near_dup']})),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM nd
        UNION
        SELECT doc_b, doc_a FROM nd
    ),
    reach(node, lbl) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM edges)
        UNION
        SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.node
    )
    SELECT node AS doc_id, MIN(lbl) AS component
    FROM reach GROUP BY node ORDER BY doc_id
"""


def quality_aware_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup resolution that keeps the BEST copy — the retention
    policy production pipelines actually want: within every transitive
    near-dup cluster (``near_dup_components``), survive the document
    with the highest ``text_quality`` composite score (ties broken by
    doc_id), instead of the arbitrary smallest-id canonical the plain
    dedup plans keep. Documents outside any cluster survive untouched.

    ORACLE-EXACT by composition: the components relation earned its
    recursive-CTE exact oracle this round, text_quality has always been
    exact (the score is the engine-identical arithmetic class), and the
    per-cluster argmax is one window over cluster grain — so the DuckDB
    twin replays all three. Scale shape: the pair graph + one
    component-grain window (cluster sizes are near-dup family sizes —
    bounded by the banding caps upstream); the quality join is doc-grain.

    Returns (doc_id, component, quality_score, kept) for every document
    — component NULL for docs with no near-dup neighbor (always kept)."""
    comp = near_dup_components(spark, sf_dir)
    q = text_quality(spark, sf_dir).select("doc_id", "quality_score")
    w = Window.partitionBy("component").orderBy(
        F.col("quality_score").desc(), "doc_id"
    )
    ranked = (
        comp.join(q, "doc_id")
        .withColumn("rn", F.row_number().over(w))
    )
    return (
        q.join(ranked.select("doc_id", "component", "rn"), "doc_id", "left")
        .select(
            "doc_id",
            "component",
            "quality_score",
            (F.col("rn").isNull() | (F.col("rn") == 1)).alias("kept"),
        )
        .orderBy("doc_id")
    )


LIBRARY_QUERIES["quality_aware_dedup"] = quality_aware_dedup

# composition of the (r13-exact) recursive components oracle, the
# text_quality score, and one cluster-grain argmax window
LIBRARY_ORACLE["quality_aware_dedup"] = f"""
    WITH RECURSIVE nd AS (SELECT * FROM ({ORACLE['minhash_near_dup']})),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM nd
        UNION
        SELECT doc_b, doc_a FROM nd
    ),
    reach(node, lbl) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM edges)
        UNION
        SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.node
    ),
    comp AS (
        SELECT node AS doc_id, MIN(lbl) AS component
        FROM reach GROUP BY node
    ),
    q AS (SELECT doc_id, quality_score FROM ({ORACLE['text_quality']})),
    ranked AS (
        SELECT c.doc_id, c.component,
               ROW_NUMBER() OVER (
                   PARTITION BY c.component
                   ORDER BY q.quality_score DESC, c.doc_id
               ) AS rn
        FROM comp c JOIN q ON c.doc_id = q.doc_id
    )
    SELECT q.doc_id, r.component, q.quality_score,
           (r.rn IS NULL OR r.rn = 1) AS kept
    FROM q LEFT JOIN ranked r ON q.doc_id = r.doc_id
    ORDER BY q.doc_id
"""
