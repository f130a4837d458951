"""Dataset-assembly plans: PII redaction, hash-based train/eval split
assignment, and weighted per-source mixing — the last-mile operators a
large-scale training-data pipeline runs between curation and tokenization.

The reference pipeline (``/root/reference/data/etl.py``) has no
document-corpus surface at all; these extend the engine's LLM-data family
(SURVEY.md §2.11 north-star scope) the same way plans/llmdata and
plans/curation do. All three are pure Catalyst expression plans — no UDFs,
no driver collection — with exact DuckDB oracles, registered at the
library tier (the driver registry is capped at 50 entries; see
COVERAGE.md's verification-tier map) and checked every pytest run by
tests/test_library_parity.py.

Scale notes (100 TB):
- ``pii_redact`` is a straight-line projection (regexp extract/replace per
  row) — embarrassingly parallel, whole-stage codegen, no shuffle at all.
- ``train_test_split`` is likewise shuffle-free: the split is a pure
  function of ``md5(doc_id)``, so any executor can route any document
  without coordination — the property that matters when assigning splits
  across 10^11 documents (a random() split is neither reproducible nor
  consistent across retries/backfills).
- ``source_mix_sample`` shuffles once on ``source`` for the per-stratum
  rank window; source cardinality is high (10^3–10^5 domains at corpus
  scale) so strata parallelize, and a pathologically hot source is
  AQE-splittable. The md5-rank keeps the sample deterministic under
  re-execution, unlike TABLESAMPLE.

PII note: the synthetic corpus contains no organic PII, so the plan
deterministically injects synthetic contact strings into a known subset of
documents on BOTH engines (same convention as the multimodal fake
payloads, operators/multimodal.py:attach_media) — the redaction machinery
then does real work and the oracle compares real redactions. On a real
corpus, drop the injection projection and point the same regexes at the
raw text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.core import md5_long, oracle_md5_long
from ..sources.readers import load_table

# Shared regexes — restricted to syntax Java regex (Spark) and RE2 (DuckDB)
# treat identically: character classes, bounded repetition, literals. No
# backreferences, no lookaround (RE2 has neither).
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\d{3}-\d{3}-\d{4}"
IP_RE = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"

# train_test_split: eval gets EVAL_PCT of the md5 bucket space
SPLIT_BUCKETS = 100
EVAL_PCT = 5

# source_mix_sample: per-source mixing weights (the config is the API;
# constants tuned so the synthetic corpus exercises every branch).
# weight < 1 downsamples (md5-rank keep fraction); weight > 1 upsamples
# (floor(w) full epochs + an md5-rank fractional epoch) — the standard
# epoch-replication way corpus mixing ratios are realized. Deterministic,
# not random().
DEFAULT_MIX_WEIGHT = 0.6
MIX_WEIGHTS = {"src0": 2.5, "src1": 0.3, "src2": 0.8, "src3": 1.0}


def _injected_text() -> F.Column:
    """Deterministic synthetic-PII injection (see module docstring):
    doc_id % 5 == 0 gains an email, % 7 == 0 a phone, % 11 == 0 an IP.
    Fragments are built with concat of CASE'd literals so the expression
    is identical on both engines (NULL-free by construction)."""
    did = F.col("doc_id")
    email = F.when(
        did % 5 == 0,
        F.concat(
            F.lit(" contact user"),
            did.cast("string"),
            F.lit("@example.com now"),
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        did % 7 == 0,
        F.concat(
            F.lit(" call 555-"),
            F.lpad((did % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad(((did * 7) % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        did % 11 == 0,
        F.concat(
            F.lit(" from 10."),
            (did % 256).cast("string"),
            F.lit(".0."),
            ((did * 3) % 256).cast("string"),
        ),
    ).otherwise(F.lit(""))
    return F.concat(F.col("text"), email, phone, ip)


_INJECT_SQL = """
    SELECT doc_id,
           text
           || CASE WHEN doc_id % 5 = 0
                   THEN ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com now'
                   ELSE '' END
           || CASE WHEN doc_id % 7 = 0
                   THEN ' call 555-'
                        || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                        || '-'
                        || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
                   ELSE '' END
           || CASE WHEN doc_id % 11 = 0
                   THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                        || '.0.' || CAST((doc_id * 3) % 256 AS VARCHAR)
                   ELSE '' END AS itext
    FROM documents
"""


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect and redact PII (emails → ``[EMAIL]``, NANP-style phone
    numbers → ``[PHONE]``, dotted-quad IPs → ``[IP]``) with per-document
    match counts. Replacement order is fixed (email, phone, IP) so the
    passes cannot interact — the replacement tokens contain no digits or
    ``@``. Pure regexp projection: codegen'd, shuffle-free, linear."""
    docs = load_table(spark, sf_dir, "documents")
    injected = docs.select("doc_id", _injected_text().alias("itext"))
    return (
        injected.select(
            "doc_id",
            F.size(F.regexp_extract_all("itext", F.lit(EMAIL_RE), 0))
            .cast("long")
            .alias("n_emails"),
            F.size(F.regexp_extract_all("itext", F.lit(PHONE_RE), 0))
            .cast("long")
            .alias("n_phones"),
            F.size(F.regexp_extract_all("itext", F.lit(IP_RE), 0))
            .cast("long")
            .alias("n_ips"),
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace("itext", EMAIL_RE, "[EMAIL]"),
                    PHONE_RE,
                    "[PHONE]",
                ),
                IP_RE,
                "[IP]",
            ).alias("redacted_text"),
        )
        .orderBy("doc_id")
    )


def train_test_split(
    spark: SparkSession,
    sf_dir: str,
    *,
    buckets: int = SPLIT_BUCKETS,
    eval_pct: int = EVAL_PCT,
) -> DataFrame:
    """Reproducible train/eval split assignment: bucket = md5(doc_id) mod
    ``buckets``; buckets below ``eval_pct`` are eval. A pure
    per-row function — no shuffle, no state, stable under retries,
    backfills, and corpus growth (a document's split never changes when
    other documents arrive, unlike rank- or random-based splits). The
    knobs default to the module constants the registry/oracle use."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (md5_long(F.col("doc_id").cast("string")) % buckets).cast("int")
    return docs.select(
        "doc_id",
        "lang",
        "source",
        bucket.alias("bucket"),
        F.when(bucket < eval_pct, F.lit("eval"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def _mix_weight_col(
    mix_weights: dict[str, float] | None = None,
    default_weight: float | None = None,
) -> F.Column:
    weights = MIX_WEIGHTS if mix_weights is None else mix_weights
    default = DEFAULT_MIX_WEIGHT if default_weight is None else default_weight
    expr = F.lit(float(default))
    for src, w in sorted(weights.items()):
        expr = F.when(F.col("source") == src, F.lit(float(w))).otherwise(expr)
    return expr


def _mix_weight_sql(
    mix_weights: dict[str, float] | None = None,
    default_weight: float | None = None,
) -> str:
    # CAST to DOUBLE so DuckDB computes the fractional-epoch boundary in
    # IEEE doubles like Spark does — a bare literal would be typed
    # DECIMAL(p,s) (exact arithmetic), and a weight like 0.3333 could then
    # make ceil((w - floor(w)) * stratum_size) disagree between engines.
    weights = MIX_WEIGHTS if mix_weights is None else mix_weights
    default = DEFAULT_MIX_WEIGHT if default_weight is None else default_weight
    whens = " ".join(
        f"WHEN source = '{src}' THEN CAST({w} AS DOUBLE)"
        for src, w in sorted(weights.items())
    )
    return f"CASE {whens} ELSE CAST({default} AS DOUBLE) END"


def source_mix_sample(
    spark: SparkSession,
    sf_dir: str,
    *,
    mix_weights: dict[str, float] | None = None,
    default_weight: float | None = None,
) -> DataFrame:
    """Full data-mixing semantics, reproducibly: each source's documents
    are replicated ``floor(weight)`` times (whole epochs), plus one more
    copy for the documents whose md5 rank falls inside the fractional
    remainder — so weight 2.5 yields 2 copies of every document and a
    third copy for the md5-first half, weight 0.3 keeps the md5-first
    30%, weight 1.0 is the identity. This is how corpus mixing ratios
    (up-weight curated sources, down-weight crawl) are realized in
    training pipelines; the md5 rank makes the selection independent of
    partitioning and stable across runs, and ``copy_idx`` gives
    downstream shuffling a deterministic replica key. The weight
    arithmetic is one IEEE double multiply + ceil on both engines, so
    the fractional boundary cannot disagree.

    ``mix_weights`` (source → weight) and ``default_weight`` default to
    the module constants the registry/oracle use; pass your own to tune
    a mix without editing the package (tests/test_operators.py pins a
    custom-weights run against the parameterized oracle)."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    weight = _mix_weight_col(mix_weights, default_weight)
    ranked = (
        docs.select(
            "doc_id",
            "source",
            md5_long(F.col("doc_id").cast("string")).alias("h"),
        )
        .withColumn("sample_rank", F.row_number().over(w))
        .withColumn(
            "stratum_size",
            F.count(F.lit(1)).over(Window.partitionBy("source")),
        )
        .withColumn(
            "n_copies",
            (
                F.floor(weight).cast("long")
                + F.when(
                    F.col("sample_rank")
                    <= F.ceil(
                        (weight - F.floor(weight)) * F.col("stratum_size")
                    ),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ),
        )
    )
    return (
        ranked.filter(F.col("n_copies") > 0)
        .select(
            "doc_id",
            "source",
            F.col("sample_rank").cast("int").alias("sample_rank"),
            F.col("stratum_size").cast("int").alias("stratum_size"),
            F.explode(
                F.sequence(F.lit(0), (F.col("n_copies") - 1).cast("int"))
            ).alias("copy_idx"),
        )
    )


#: token budget of the registry-facing selection plan (fixed so the
#: oracle diff is meaningful at every sf; see token_budget_selection)
TOKEN_BUDGET = 50_000

#: score-bucket count for the blocked prefix sum (block id =
#: floor(score × BUDGET_BLOCKS) — blocks follow the selection order
#: because the order's leading key IS the score)
BUDGET_BLOCKS = 256


def _scored_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared input of BOTH budget-selection plans. NULL/NaN scores are
    filtered HERE (and mirrored in the oracle SQL) so the blocked plan,
    the single-window twin, and the oracle agree on nullable corpora:
    a NULL score would give a NULL ``blk`` whose equi-join back to the
    block offsets silently drops the row, while an ordered window keeps
    it — and Spark/DuckDB additionally disagree on NaN placement under
    DESC. An unscorable document has no defined budget rank; excluding
    it is the one semantics all three paths can share exactly."""
    from .llmdata import text_quality

    score = F.col("quality_score")
    return (
        text_quality(spark, sf_dir)
        .select("doc_id", "n_tokens", "quality_score")
        .filter(score.isNotNull() & ~F.isnan(score))
    )


def token_budget_selection_single_window(
    spark: SparkSession, sf_dir: str, budget: int = TOKEN_BUDGET
) -> DataFrame:
    """Naive single-window twin (the oracle's shape and the baseline the
    two-phase plan is pinned bit-identical against): one global
    cumulative token sum in quality order."""
    w = Window.orderBy(
        F.desc("quality_score"), "doc_id"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored = _scored_docs(spark, sf_dir)
    return (
        scored.withColumn(
            "cum_tokens", F.sum("n_tokens").over(w).cast("long")
        )
        .filter(F.col("cum_tokens") <= budget)
        .orderBy(F.desc("quality_score"), "doc_id")
    )


def token_budget_selection(
    spark: SparkSession, sf_dir: str, budget: int = TOKEN_BUDGET
) -> DataFrame:
    """Quality-ranked GREEDY PREFIX under a token budget — the corpus-
    selection step of dataset assembly ("take the best documents until
    N tokens"): order by (quality_score desc, doc_id), keep every doc
    whose inclusive cumulative token count stays ≤ ``budget``. The
    cumulative sum is monotone, so the selection is a true prefix and
    the greedy-optimality property holds (min selected score ≥ max
    excluded score, ties broken by doc_id — pinned in tests).

    Scale shape — the sequence_packing recipe, re-keyed: a single
    global ordered window is the one-hot-partition scale killer, so the
    prefix sum runs two-phase with SCORE-BUCKET blocks
    (``floor(score × BUDGET_BLOCKS)``): blocks are totally ordered
    consistently with the selection order because the order's leading
    key IS the score, local sums run per block, and the block-total
    prefix runs on the ≤ BUDGET_BLOCKS+1-row block relation. Long
    addition is associative → bit-identical to the single-window twin
    (tested). Caveat (documented, same class as any value-bucketing):
    a degenerate corpus where every document has the SAME score
    collapses to one block — add a finer score signal before selecting
    at that point.

    Returns (doc_id, n_tokens, quality_score, cum_tokens) for the
    selected prefix in selection order."""
    scored = _scored_docs(spark, sf_dir).withColumn(
        "blk",
        F.floor(F.col("quality_score") * BUDGET_BLOCKS).cast("int"),
    )
    w_local = (
        Window.partitionBy("blk")
        .orderBy(F.desc("quality_score"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = scored.withColumn("lcum", F.sum("n_tokens").over(w_local))
    # block-grain relation: ≤ BUDGET_BLOCKS+1 rows at any corpus size
    w_blocks = Window.orderBy(F.desc("blk")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        local.groupBy("blk")
        .agg(F.sum("n_tokens").alias("blk_total"))
        .withColumn(
            "blk_offset",
            F.coalesce(
                F.sum("blk_total").over(w_blocks), F.lit(0).cast("long")
            ),
        )
        .select("blk", "blk_offset")
    )
    return (
        local.join(F.broadcast(offsets), "blk")
        .withColumn(
            "cum_tokens",
            (F.col("blk_offset") + F.col("lcum")).cast("long"),
        )
        .filter(F.col("cum_tokens") <= budget)
        .select("doc_id", "n_tokens", "quality_score", "cum_tokens")
        .orderBy(F.desc("quality_score"), "doc_id")
    )


def _budget_selection_sql(budget: int) -> str:
    from .llmdata import ORACLE as _LLM_ORACLE

    return f"""
    WITH tq AS ({_LLM_ORACLE["text_quality"]}),
    ranked AS (
        SELECT doc_id, n_tokens, quality_score,
               CAST(SUM(n_tokens) OVER (
                   ORDER BY quality_score DESC, doc_id
                   ROWS UNBOUNDED PRECEDING
               ) AS BIGINT) AS cum_tokens
        FROM tq
        -- mirrors _scored_docs: unscorable docs have no budget rank
        WHERE quality_score IS NOT NULL AND NOT isnan(quality_score)
    )
    SELECT doc_id, n_tokens, quality_score, cum_tokens
    FROM ranked WHERE cum_tokens <= {budget}
    ORDER BY quality_score DESC, doc_id
    """


#: No driver-registry entries (50-cap, COVERAGE.md) — all plans are
#: library tier, oracle-checked by tests/test_library_parity.py.
QUERIES: dict = {}
ORACLE: dict = {}

LIBRARY_QUERIES = {
    "pii_redact": pii_redact,
    "train_test_split": train_test_split,
    "source_mix_sample": source_mix_sample,
    "token_budget_selection": token_budget_selection,
}

LIBRARY_ORACLE: dict[str, str] = {
    "pii_redact": f"""
        WITH injected AS ({_INJECT_SQL})
        SELECT doc_id,
               CAST(len(regexp_extract_all(itext, '{EMAIL_RE}')) AS BIGINT)
                   AS n_emails,
               CAST(len(regexp_extract_all(itext, '{PHONE_RE}')) AS BIGINT)
                   AS n_phones,
               CAST(len(regexp_extract_all(itext, '{IP_RE}')) AS BIGINT)
                   AS n_ips,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(itext, '{EMAIL_RE}', '[EMAIL]', 'g'),
                       '{PHONE_RE}', '[PHONE]', 'g'),
                   '{IP_RE}', '[IP]', 'g') AS redacted_text
        FROM injected
        ORDER BY doc_id
    """,
    "train_test_split": f"""
        SELECT doc_id, lang, source,
               CAST({oracle_md5_long("CAST(doc_id AS VARCHAR)")}
                    % {SPLIT_BUCKETS} AS INT) AS bucket,
               CASE WHEN {oracle_md5_long("CAST(doc_id AS VARCHAR)")}
                         % {SPLIT_BUCKETS} < {EVAL_PCT}
                    THEN 'eval' ELSE 'train' END AS split
        FROM documents
    """,
    "source_mix_sample": None,  # filled below via _source_mix_oracle_sql
}


def _source_mix_oracle_sql(
    mix_weights: dict[str, float] | None = None,
    default_weight: float | None = None,
) -> str:
    """DuckDB oracle for ``source_mix_sample``, parameterized on the same
    knobs so a custom-weights run can be oracle-checked too
    (tests/test_operators.py::test_source_mix_sample_custom_weights)."""
    return f"""
        WITH ranked AS (
            SELECT doc_id, source,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY {oracle_md5_long("CAST(doc_id AS VARCHAR)")},
                                doc_id
                   ) AS sample_rank,
                   COUNT(*) OVER (PARTITION BY source) AS stratum_size,
                   {_mix_weight_sql(mix_weights, default_weight)} AS wt
            FROM documents
        ),
        copies AS (
            SELECT doc_id, source, sample_rank, stratum_size,
                   CAST(floor(wt) AS BIGINT)
                   + CASE WHEN sample_rank
                               <= ceil((wt - floor(wt)) * stratum_size)
                          THEN 1 ELSE 0 END AS n_copies
            FROM ranked
        )
        SELECT doc_id, source,
               CAST(sample_rank AS INT) AS sample_rank,
               CAST(stratum_size AS INT) AS stratum_size,
               CAST(unnest(range(n_copies)) AS INT) AS copy_idx
        FROM copies
        WHERE n_copies > 0
    """


LIBRARY_ORACLE["source_mix_sample"] = _source_mix_oracle_sql()
LIBRARY_ORACLE["token_budget_selection"] = _budget_selection_sql(TOKEN_BUDGET)


# ---------------------------------------------------------------------------
# epoch shuffle + sharding (r13): the delivery step after packing/mixing

#: default shard count for the registry plan (production passes the real
#: shard count — e.g. data-parallel world size × files per worker)
EPOCH_SHARDS = 16
#: epoch seed: a new seed per epoch re-permutes the corpus without
#: rewriting anything upstream
EPOCH_SEED = "ep0"


def epoch_shuffle_assignment(
    spark: SparkSession,
    sf_dir: str,
    *,
    n_shards: int = EPOCH_SHARDS,
    seed: str = EPOCH_SEED,
) -> DataFrame:
    """Deterministic EPOCH SHUFFLE + sharding — the step that turns a
    curated corpus into training shards: every document gets a
    reproducible pseudo-random (shard, pos), so a trainer reading shard
    files in position order consumes a seeded global permutation (new
    seed ⇒ new epoch order, nothing upstream rewritten; same seed ⇒
    bit-identical order across reruns/backfills — what random() or
    DataFrame.sample can never give).

    shard = md5(seed#doc_id) % n_shards (coordination-free routing —
    any executor can place any document), pos = row_number within the
    shard ordered by (hash, doc_id). The window is SHARD-partitioned:
    one hash exchange + a per-shard sort over 1/n_shards of the corpus,
    which is the exact, irreducible cost of materializing a global
    permutation — and the same shuffle ``write_epoch_shards`` rides to
    lay the files out. Hash routing balances shards to within the
    binomial bound (pinned in tests/test_operators.py); the n_tokens
    column rides along so the trainer's sampler can weigh shards.

    Returns (doc_id, n_tokens, shard, pos) — flat, oracle-EXACT."""
    from ..functions.core import tokens

    docs = load_table(spark, sf_dir, "documents")
    h = md5_long(
        F.concat(F.lit(seed + "#"), F.col("doc_id").cast("string"))
    )
    base = docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("int").alias("n_tokens"),
        h.alias("h"),
    ).withColumn("shard", (F.col("h") % n_shards).cast("int"))
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return base.select(
        "doc_id",
        "n_tokens",
        "shard",
        F.row_number().over(w).cast("int").alias("pos"),
    ).orderBy("shard", "pos")


def epoch_shard_stats(
    spark: SparkSession,
    sf_dir: str,
    *,
    n_shards: int = EPOCH_SHARDS,
    seed: str = EPOCH_SEED,
) -> DataFrame:
    """Shard-grain balance report over the epoch assignment — the
    relation an operator checks before launching a training run (docs
    and tokens per shard; a skewed shard starves its data-parallel
    rank). Exact integer counts, shard-grain output."""
    a = epoch_shuffle_assignment(
        spark, sf_dir, n_shards=n_shards, seed=seed
    )
    return (
        a.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .orderBy("shard")
    )


LIBRARY_QUERIES["epoch_shuffle_assignment"] = epoch_shuffle_assignment
LIBRARY_QUERIES["epoch_shard_stats"] = epoch_shard_stats

_EPOCH_BASE_SQL = f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           {oracle_md5_long("'" + EPOCH_SEED + "#' || CAST(doc_id AS VARCHAR)")} AS h
    FROM documents
"""

LIBRARY_ORACLE["epoch_shuffle_assignment"] = f"""
    WITH base AS ({_EPOCH_BASE_SQL})
    SELECT doc_id, n_tokens,
           CAST(h % {EPOCH_SHARDS} AS INTEGER) AS shard,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY h % {EPOCH_SHARDS} ORDER BY h, doc_id
           ) AS INTEGER) AS pos
    FROM base ORDER BY shard, pos
"""

LIBRARY_ORACLE["epoch_shard_stats"] = f"""
    WITH base AS ({_EPOCH_BASE_SQL})
    SELECT CAST(h % {EPOCH_SHARDS} AS INTEGER) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM base GROUP BY 1 ORDER BY shard
"""


# ---------------------------------------------------------------------------
# training-example construction (r13, late): the step AFTER epoch
# sharding — turning curated documents into the exact examples a trainer
# consumes. Three objectives, all deterministic and oracle-EXACT:
#
# - ``span_corruption``: T5-style denoising pairs (corrupted input with
#   sentinel tokens + the masked-spans target). Mask placement is
#   GRID-ALIGNED (a span may start only at positions ≡ 0 mod SC_GRID and
#   runs SC_LEN tokens), which makes the classical sequential sampling
#   relational: spans can never overlap by construction, so selection is
#   a pure per-span hash decision — any executor can corrupt any document
#   with zero coordination, and DuckDB can replay it bit-for-bit.
# - ``sft_examples``: chat-template rendering with LOSS-MASK offsets
#   (the assistant-span [loss_start, loss_end) char range a trainer
#   masks the loss to). Pure string expressions.
# - ``length_bucketed_batches``: padding-efficient batch packing —
#   power-of-two length buckets (bucket = ⌊log2 n_tokens⌋, exact integer
#   arithmetic via length(bin(n))−1, no float log), a seeded md5 shuffle
#   within the bucket, fixed-size batches of LB_BATCH docs. Batches are
#   formed WITHIN (bucket, shard): each data-parallel worker packs its
#   own shard — so the only exchange is one hash partition and the sort
#   runs over 1/(buckets×shards) of the corpus, never a global sort.
#
# Scale notes (100 TB): span_corruption and sft_examples are straight
# projections — higher-order array expressions per row, whole-stage
# codegen, ZERO shuffles (document grain in, document grain out).
# length_bucketed_batches shuffles once on (bucket, shard) — the same
# irreducible exchange epoch_shuffle_assignment rides — and its output
# is batch-grain (|corpus| / LB_BATCH rows).

#: span-corruption grid: spans may start at positions ≡ 0 (mod SC_GRID)
SC_GRID = 6
#: span-corruption span length (< SC_GRID, so spans never overlap)
SC_LEN = 3
#: percent of grid slots selected for masking (≈ SC_PCT·SC_LEN/SC_GRID
#: of tokens masked: 20% of slots × 3/6 grid fill ≈ 10% of tokens)
SC_PCT = 20
#: sentinel rendering, T5 convention: <extra_id_0>, <extra_id_1>, ...
_SENT_PRE = "<extra_id_"
_SENT_POST = ">"


def span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption pairs over ``documents`` — the denoising
    objective's data prep (Raffel et al., public T5 paper): ~10% of
    tokens are replaced by numbered sentinels in the input; the target
    lists each sentinel followed by the tokens it hid, closed by a final
    sentinel.

    Grid-aligned determinism (module comment): slot s of a document is
    selected iff md5(doc_id#sc#s) % 100 < SC_PCT; a selected slot masks
    tokens [s·G, s·G+L). Sentinel numbering is dense per document
    (0-based, in position order) via an O(S) prefix-sum over the slot
    array — all higher-order expressions, no explode, no shuffle.

    Returns (doc_id, input_text, target_text, n_spans, n_masked) —
    flat, oracle-EXACT (the oracle replays the same md5 grid with
    UNNEST + windows)."""
    return span_corruption_project(
        load_table(spark, sf_dir, "documents")
    ).orderBy("doc_id")


def span_corruption_project(docs: DataFrame) -> DataFrame:
    """The span-corruption PROJECTION over any (doc_id, text) relation —
    shared verbatim by the batch plan above and the stateless streaming
    twin (streaming/jobs.stream_span_corruption): a pure per-row
    higher-order-expression pipeline, so it composes with readStream
    unchanged (no shuffle, no state)."""
    from ..functions.core import tokens

    G, L = SC_GRID, SC_LEN
    toks = tokens(F.col("text"))
    base = docs.select(
        "doc_id", toks.alias("t"), F.size(toks).alias("n")
    )
    # slot selection flags (n >= 1 always: split('', ' ') = [''])
    n_slots = (F.floor((F.col("n") - 1) / G) + 1).cast("int")
    sel = F.transform(
        F.sequence(F.lit(0), n_slots - 1),
        lambda s: (
            md5_long(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit("#sc#"),
                    s.cast("string"),
                )
            )
            % 100
            < SC_PCT
        ),
    )
    # ranks[s+1] = selected slots among 0..s-1 (dense sentinel ids)
    ranks = F.aggregate(
        F.col("sel"),
        F.array(F.lit(0)),
        lambda acc, x: F.concat(
            acc, F.array(F.element_at(acc, -1) + x.cast("int"))
        ),
    )
    staged = base.withColumn("sel", sel).withColumn("ranks", ranks)

    def slot_of(i):
        return F.floor(i / G).cast("int")

    def sel_at(s):
        return F.element_at(F.col("sel"), s + 1)

    def sent(s):
        # sentinel for slot s: dense rank among selected slots before it
        return F.concat(
            F.lit(_SENT_PRE),
            F.element_at(F.col("ranks"), s + 1).cast("string"),
            F.lit(_SENT_POST),
        )

    # input: keep unmasked tokens; a selected slot's first position
    # renders its sentinel; the rest of the span drops (concat_ws skips
    # NULLs on the Spark side; the oracle pre-filters)
    inp_tok = F.transform(
        F.col("t"),
        lambda tok, i: F.when(~sel_at(slot_of(i)), tok)
        .when(i % G == 0, sent(slot_of(i)))
        .when(i % G >= L, tok)
        .otherwise(F.lit(None)),
    )
    # target: '<extra_id_k> tok tok tok' per selected slot, position
    # order, closed by the final sentinel when anything was masked
    sel_slots = F.filter(
        F.sequence(F.lit(0), n_slots - 1), lambda s: sel_at(s)
    )
    tgt_parts = F.transform(
        sel_slots,
        lambda s: F.concat(
            sent(s),
            F.lit(" "),
            F.array_join(F.slice(F.col("t"), s * G + 1, L), " "),
        ),
    )
    n_sel = F.element_at(F.col("ranks"), -1)
    n_masked = F.aggregate(
        sel_slots,
        F.lit(0),
        lambda acc, s: acc + F.least(F.lit(L), F.col("n") - s * G),
    )
    closing = F.concat(
        F.lit(" " + _SENT_PRE), n_sel.cast("string"), F.lit(_SENT_POST)
    )
    return staged.select(
        "doc_id",
        F.concat_ws(" ", inp_tok).alias("input_text"),
        F.when(n_sel > 0, F.concat(F.concat_ws(" ", tgt_parts), closing))
        .otherwise(F.lit(""))
        .alias("target_text"),
        n_sel.cast("int").alias("n_spans"),
        n_masked.cast("int").alias("n_masked"),
    )


# SFT chat template (single-line: newline literals render differently
# across engine SQL dialects; the offsets are the API, not the cosmetic
# separator). Prompt = first min(16, max(1, n//4)) tokens.
SFT_PRE = "<|user|> "
SFT_MID = " <|assistant|> "
SFT_POST = " <|end|>"
SFT_PROMPT_CAP = 16


def sft_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-template rendering with LOSS-MASK offsets — SFT data prep:
    each document becomes a rendered conversation string plus the
    [loss_start, loss_end) 1-based char range of the assistant span (the
    range the trainer unmasks the loss over). The prompt/response split
    is deterministic (first min(16, max(1, n//4)) tokens prompt, rest
    response) so the oracle replays it exactly; on a real SFT corpus the
    (prompt, response) columns arrive upstream and only the rendering +
    offset arithmetic below remains. Pure string expressions — zero
    shuffles. Returns (doc_id, rendered, loss_start, loss_end,
    n_prompt_toks, n_resp_toks)."""
    return sft_examples_project(
        load_table(spark, sf_dir, "documents")
    ).orderBy("doc_id")


def sft_examples_project(docs: DataFrame) -> DataFrame:
    """The SFT-rendering PROJECTION over any (doc_id, text) relation —
    shared by the batch plan and the stateless streaming twin
    (streaming/jobs.stream_sft_examples); stateless per-row string
    expressions, readStream-composable."""
    from ..functions.core import tokens

    toks = tokens(F.col("text"))
    base = docs.select(
        "doc_id", toks.alias("t"), F.size(toks).alias("n")
    )
    p = F.greatest(
        F.lit(1), F.least(F.lit(SFT_PROMPT_CAP), F.floor(F.col("n") / 4))
    ).cast("int")
    staged = base.withColumn("p", p).select(
        "doc_id",
        "n",
        "p",
        F.array_join(F.slice(F.col("t"), 1, F.col("p")), " ").alias(
            "prompt"
        ),
        F.array_join(
            F.slice(F.col("t"), F.col("p") + 1, F.col("n") - F.col("p")),
            " ",
        ).alias("response"),
    )
    loss_start = (
        F.lit(len(SFT_PRE))
        + F.length("prompt")
        + F.lit(len(SFT_MID))
        + F.lit(1)
    ).cast("int")
    return staged.select(
        "doc_id",
        F.concat(
            F.lit(SFT_PRE),
            F.col("prompt"),
            F.lit(SFT_MID),
            F.col("response"),
            F.lit(SFT_POST),
        ).alias("rendered"),
        loss_start.alias("loss_start"),
        (loss_start + F.length("response")).cast("int").alias("loss_end"),
        F.col("p").alias("n_prompt_toks"),
        (F.col("n") - F.col("p")).cast("int").alias("n_resp_toks"),
    )


#: length-bucketed batching: docs per batch / shards (a worker packs its
#: own shard; production passes the data-parallel world size)
LB_BATCH = 32
LB_SHARDS = 8
LB_SEED = "lb0"


def length_bucketed_batches(
    spark: SparkSession,
    sf_dir: str,
    *,
    batch: int = LB_BATCH,
    n_shards: int = LB_SHARDS,
    seed: str = LB_SEED,
) -> DataFrame:
    """Padding-efficient batch packing: bucket documents by
    ⌊log2(n_tokens)⌋ (exact integer arithmetic: length(bin(n))−1 — no
    float log at a bucket boundary), shuffle within the bucket by a
    seeded md5, and cut fixed-size batches of ``batch`` docs WITHIN
    (bucket, shard). Grouping similar lengths bounds each batch's
    padding waste to < 2× the shortest member (power-of-two buckets);
    the (bucket, shard) batch key is what keeps the sort distributed —
    see the family comment. Returns batch-grain rows (bucket, shard,
    batch_idx, n_docs, max_len, sum_tokens, pad_waste) where pad_waste
    = n_docs·max_len − sum_tokens, the padding tokens a trainer would
    burn on that batch. Oracle-EXACT."""
    from ..functions.core import tokens

    docs = load_table(spark, sf_dir, "documents")
    h = md5_long(
        F.concat(F.lit(seed + "#"), F.col("doc_id").cast("string"))
    )
    base = docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
        h.alias("h"),
    ).select(
        "doc_id",
        "n_tokens",
        "h",
        (F.length(F.bin(F.col("n_tokens"))) - 1).cast("int").alias(
            "bucket"
        ),
        (F.col("h") % n_shards).cast("int").alias("shard"),
    )
    w = Window.partitionBy("bucket", "shard").orderBy("h", "doc_id")
    placed = base.withColumn(
        "batch_idx",
        F.floor((F.row_number().over(w) - 1) / batch).cast("int"),
    )
    return (
        placed.groupBy("bucket", "shard", "batch_idx")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_docs"),
            F.max("n_tokens").cast("int").alias("max_len"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
            (
                F.count(F.lit(1)) * F.max("n_tokens") - F.sum("n_tokens")
            )
            .cast("long")
            .alias("pad_waste"),
        )
        .orderBy("bucket", "shard", "batch_idx")
    )


LIBRARY_QUERIES["span_corruption"] = span_corruption
LIBRARY_QUERIES["sft_examples"] = sft_examples
LIBRARY_QUERIES["length_bucketed_batches"] = length_bucketed_batches

_SC_SEL = (
    oracle_md5_long(
        "CAST(doc_id AS VARCHAR) || '#sc#' || CAST(pos // "
        f"{SC_GRID} AS VARCHAR)"
    )
    + f" % 100 < {SC_PCT}"
)

LIBRARY_ORACLE["span_corruption"] = f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t,
               len(string_split(text, ' ')) AS n
        FROM documents
    ),
    tok AS (
        SELECT doc_id, n, g.i - 1 AS pos, t[g.i] AS tok
        FROM toks, LATERAL unnest(generate_series(1, n)) AS g(i)
    ),
    span_sel AS (
        SELECT DISTINCT doc_id, pos // {SC_GRID} AS span
        FROM tok WHERE {_SC_SEL}
    ),
    span_k AS (
        SELECT doc_id, span,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY span) - 1 AS INT) AS k
        FROM span_sel
    ),
    inp AS (
        SELECT t.doc_id, t.pos,
               CASE WHEN sk.span IS NULL THEN t.tok
                    WHEN t.pos % {SC_GRID} = 0
                        THEN '{_SENT_PRE}' || sk.k || '{_SENT_POST}'
                    WHEN t.pos % {SC_GRID} >= {SC_LEN} THEN t.tok
                    ELSE NULL END AS out_tok
        FROM tok t LEFT JOIN span_k sk
          ON sk.doc_id = t.doc_id AND sk.span = t.pos // {SC_GRID}
    ),
    inp_agg AS (
        SELECT doc_id, string_agg(out_tok, ' ' ORDER BY pos) AS input_text
        FROM inp WHERE out_tok IS NOT NULL GROUP BY doc_id
    ),
    tgt_span AS (
        SELECT t.doc_id, sk.span, sk.k,
               '{_SENT_PRE}' || sk.k || '{_SENT_POST}' || ' '
                   || string_agg(t.tok, ' ' ORDER BY t.pos) AS part,
               COUNT(*) AS cnt
        FROM tok t JOIN span_k sk
          ON sk.doc_id = t.doc_id AND sk.span = t.pos // {SC_GRID}
        WHERE t.pos % {SC_GRID} < {SC_LEN}
        GROUP BY t.doc_id, sk.span, sk.k
    ),
    tgt_agg AS (
        SELECT doc_id,
               string_agg(part, ' ' ORDER BY span) AS body,
               COUNT(*) AS n_sel, SUM(cnt) AS n_masked
        FROM tgt_span GROUP BY doc_id
    )
    SELECT d.doc_id,
           i.input_text,
           COALESCE(g.body || ' {_SENT_PRE}' || g.n_sel || '{_SENT_POST}',
                    '') AS target_text,
           CAST(COALESCE(g.n_sel, 0) AS INT) AS n_spans,
           CAST(COALESCE(g.n_masked, 0) AS INT) AS n_masked
    FROM toks d
    JOIN inp_agg i USING (doc_id)
    LEFT JOIN tgt_agg g USING (doc_id)
    ORDER BY doc_id
"""

LIBRARY_ORACLE["sft_examples"] = f"""
    WITH base AS (
        SELECT doc_id, string_split(text, ' ') AS t,
               len(string_split(text, ' ')) AS n
        FROM documents
    ),
    sized AS (
        SELECT doc_id, t, n,
               GREATEST(1, LEAST({SFT_PROMPT_CAP}, n // 4)) AS p
        FROM base
    ),
    parts AS (
        SELECT doc_id, n, p,
               array_to_string(t[1:p], ' ') AS prompt,
               array_to_string(t[p+1:n], ' ') AS response
        FROM sized
    )
    SELECT doc_id,
           '{SFT_PRE}' || prompt || '{SFT_MID}' || response
               || '{SFT_POST}' AS rendered,
           CAST({len(SFT_PRE)} + length(prompt) + {len(SFT_MID)} + 1
               AS INT) AS loss_start,
           CAST({len(SFT_PRE)} + length(prompt) + {len(SFT_MID)} + 1
               + length(response) AS INT) AS loss_end,
           CAST(p AS INT) AS n_prompt_toks,
           CAST(n - p AS INT) AS n_resp_toks
    FROM parts ORDER BY doc_id
"""

LIBRARY_ORACLE["length_bucketed_batches"] = f"""
    WITH base AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
               {oracle_md5_long("'" + LB_SEED + "#' || CAST(doc_id AS VARCHAR)")} AS h
        FROM documents
    ),
    placed AS (
        SELECT doc_id, n_tokens, h,
               CAST(length(bin(n_tokens)) - 1 AS INT) AS bucket,
               CAST(h % {LB_SHARDS} AS INT) AS shard
        FROM base
    ),
    pos AS (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY bucket, shard ORDER BY h, doc_id
               ) - 1 AS pos
        FROM placed
    )
    SELECT bucket, shard, CAST(pos // {LB_BATCH} AS INT) AS batch_idx,
           CAST(COUNT(*) AS INT) AS n_docs,
           CAST(MAX(n_tokens) AS INT) AS max_len,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS BIGINT)
               AS pad_waste
    FROM pos GROUP BY 1, 2, 3 ORDER BY bucket, shard, batch_idx
"""


# ---------------------------------------------------------------------------
# temperature-based source mixing (r13 late): the multilingual-sampling
# rebalance (Conneau & Lample XLM / XLM-R, public papers): sample source
# i with probability ∝ n_i^α, α < 1 — boosting low-resource sources
# relative to their raw share. Made engine-exact with the repo's dyadic
# convention: α = 1/2 realized IN LOG SPACE as weight_bits =
# ⌊log2 n_tokens⌋ div 2 (exact integer halving of the floor-log — the
# doc_surprisal bits trick applied to the mixing exponent), weight =
# 2^weight_bits. Quantized-α documented semantics: weights move in
# ×√2-sized steps (consecutive bit values double every TWO bits), which
# preserves the monotone boost-the-tail shape while every number stays
# BIGINT-exact on both engines.

#: docs drawn by temperature_mix_sample (the mix realized, not just
#: stated); per-source targets are the largest-remainder apportionment
#: of this total over the dyadic weights
TEMP_SAMPLE_N = 400


def temperature_mix_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Registry plan: the mixing TABLE — per source: raw docs/tokens,
    the dyadic α=1/2 weight, and the integer sample target out of
    TEMP_SAMPLE_N (floor apportionment + largest-remainder top-up, all
    integer arithmetic — exact on both engines, and the targets sum to
    exactly TEMP_SAMPLE_N). Source grain: one corpus aggregation, a
    ≤|sources|-row relation after it."""
    from ..functions.core import tokens

    docs = load_table(spark, sf_dir, "documents")
    per_src = (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(tokens(F.col("text")))).alias("n_tokens"),
        )
        .withColumn(
            "weight_bits",
            F.expr("(length(bin(n_tokens)) - 1) div 2").cast("int"),
        )
        .withColumn(
            "weight",
            F.expr("shiftleft(CAST(1 AS BIGINT), weight_bits)"),
        )
    )
    tot = Window.partitionBy()
    # floor apportionment + largest-remainder: ranks the fractional
    # remainders (weight*N mod total) and tops up the largest ones so
    # the targets sum exactly to TEMP_SAMPLE_N. The window runs over
    # the ≤|sources|-row relation — bounded, never corpus grain.
    appo = per_src.withColumn(
        "total_w", F.sum("weight").over(tot)
    ).withColumn(
        "base",
        F.expr(f"(weight * {TEMP_SAMPLE_N}) div total_w").cast("long"),
    ).withColumn(
        "rem", F.expr(f"(weight * {TEMP_SAMPLE_N}) % total_w")
    ).withColumn(
        "leftover",
        F.lit(TEMP_SAMPLE_N) - F.sum("base").over(tot),
    ).withColumn(
        "rr",
        F.row_number().over(
            Window.partitionBy().orderBy(
                F.desc("rem"), F.asc("source")
            )
        ),
    )
    return appo.select(
        "source",
        "n_docs",
        "n_tokens",
        "weight_bits",
        "weight",
        (
            F.col("base")
            + (F.col("rr") <= F.col("leftover")).cast("long")
        ).cast("int").alias("target_n"),
    ).orderBy("source")


def temperature_mix_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Registry plan: the mix REALIZED — for each source, its target_n
    highest-md5-rank documents (seeded deterministic rank, the
    source_mix_sample convention; target_n ≤ n_docs by construction
    since Σ targets = TEMP_SAMPLE_N ≤ corpus and weights are
    sub-linear... clipped by the rank filter regardless). One shuffle
    on source for the rank window; the targets relation is
    ≤|sources| rows, broadcast onto it."""
    docs = load_table(spark, sf_dir, "documents")
    targets = temperature_mix_weights(spark, sf_dir).select(
        "source", "target_n"
    )
    h = md5_long(
        F.concat(F.lit("tmix#"), F.col("doc_id").cast("string"))
    )
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    ranked = docs.select("doc_id", "source", h.alias("h")).withColumn(
        "rk", F.row_number().over(w)
    )
    return (
        ranked.join(F.broadcast(targets), "source")
        .filter(F.col("rk") <= F.col("target_n"))
        .select("doc_id", "source", F.col("rk").cast("int").alias("rk"))
        .orderBy("source", "rk")
    )


LIBRARY_QUERIES["temperature_mix_weights"] = temperature_mix_weights
LIBRARY_QUERIES["temperature_mix_sample"] = temperature_mix_sample

_TEMP_WEIGHTS_SQL = f"""
    WITH per_src AS (
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                   AS n_tokens
        FROM documents GROUP BY 1
    ),
    weighted AS (
        SELECT *,
               CAST((length(bin(n_tokens)) - 1) // 2 AS INT)
                   AS weight_bits,
               CAST(1 AS BIGINT)
                   << CAST((length(bin(n_tokens)) - 1) // 2 AS INT)
                   AS weight
        FROM per_src
    ),
    appo AS (
        SELECT *,
               SUM(weight) OVER () AS total_w,
               (weight * {TEMP_SAMPLE_N}) // SUM(weight) OVER () AS base,
               (weight * {TEMP_SAMPLE_N}) % SUM(weight) OVER () AS rem
        FROM weighted
    ),
    ranked AS (
        SELECT *,
               {TEMP_SAMPLE_N} - SUM(base) OVER () AS leftover,
               ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rr
        FROM appo
    )
    SELECT source, n_docs, n_tokens, weight_bits, weight,
           CAST(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END
                AS INT) AS target_n
    FROM ranked
"""

LIBRARY_ORACLE["temperature_mix_weights"] = (
    _TEMP_WEIGHTS_SQL + " ORDER BY source"
)

LIBRARY_ORACLE["temperature_mix_sample"] = f"""
    WITH targets AS ({_TEMP_WEIGHTS_SQL}),
    ranked AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY {oracle_md5_long("'tmix#' || CAST(doc_id AS VARCHAR)")},
                            doc_id
               ) AS rk
        FROM documents
    )
    SELECT r.doc_id, r.source, CAST(r.rk AS INT) AS rk
    FROM ranked r JOIN targets t USING (source)
    WHERE r.rk <= t.target_n
    ORDER BY source, rk
"""


# ---------------------------------------------------------------------------
# curriculum ordering (r13 late): the global training schedule

#: curriculum shuffle seed (new seed ⇒ new within-phase order)
CURR_SEED = "curr0"


def curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry plan: a CURRICULUM schedule — every document's global
    training position, phased easy→hard by length (phase =
    ⌊log2 n_tokens⌋, the standard short-first curriculum; swap in any
    per-doc difficulty signal) with a seeded shuffle within each phase.

    The scale pattern is the point: a global position WITHOUT a global
    sort. The rank runs two-phase on (phase, hash-block) grain: hblk =
    h >> 52 (256 uniform blocks, MONOTONIC in h, so ordering by
    (phase, hblk, h, doc_id) ≡ (phase, h, doc_id)), row_number within
    each (phase, hblk), and a ≤ |phases|×256-row cumulative-offset
    relation broadcast back. Partitioning by phase ALONE is the
    one-hot-partition killer this plan originally shipped with — ~10
    skewed phases put 5M rows through ~10 window tasks; the r15 1000×
    probe measured it at 219× and the hash-block refinement landed
    (BASELINE.md §r15). The oracle computes the same schedule as ONE
    global ROW_NUMBER() OVER (ORDER BY phase, hash, doc_id), so the
    value hash PROVES the blocked plan reproduces the single-sort
    semantics exactly. Returns (doc_id, phase, pos) — flat,
    oracle-EXACT."""
    from ..functions.core import tokens

    docs = load_table(spark, sf_dir, "documents")
    h = md5_long(
        F.concat(F.lit(CURR_SEED + "#"), F.col("doc_id").cast("string"))
    )
    base = docs.select(
        "doc_id",
        (
            F.length(F.bin(F.size(tokens(F.col("text"))))) - 1
        ).cast("int").alias("phase"),
        h.alias("h"),
        F.shiftright(h, 52).cast("int").alias("hblk"),
    )
    w = Window.partitionBy("phase", "hblk").orderBy("h", "doc_id")
    ranked = base.withColumn("rk", F.row_number().over(w))
    # cumulative offsets at (phase, hblk) grain — a ≤ |phases|×256-row
    # BOUNDED relation (the single-partition window below runs over
    # block grain, never corpus grain), broadcast back
    offsets = (
        base.groupBy("phase", "hblk")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("cnt").over(
                    Window.partitionBy()
                    .orderBy("phase", "hblk")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("phase", "hblk", "offset")
    )
    return (
        ranked.join(F.broadcast(offsets), ["phase", "hblk"])
        .select(
            "doc_id",
            "phase",
            (F.col("offset") + F.col("rk")).cast("long").alias("pos"),
        )
        .orderBy("pos")
    )


LIBRARY_QUERIES["curriculum_order"] = curriculum_order

LIBRARY_ORACLE["curriculum_order"] = f"""
    WITH base AS (
        SELECT doc_id,
               CAST(length(bin(len(string_split(text, ' ')))) - 1
                    AS INT) AS phase,
               {oracle_md5_long("'" + CURR_SEED + "#' || CAST(doc_id AS VARCHAR)")} AS h
        FROM documents
    )
    SELECT doc_id, phase,
           ROW_NUMBER() OVER (ORDER BY phase, h, doc_id) AS pos
    FROM base ORDER BY pos
"""


# ---------------------------------------------------------------------------
# packed SFT with loss-mask spans (r13 late): the packed-training twin
# of sft_examples — examples concatenated per source and cut into
# fixed token windows (the bpe_packed_windows layout), with the
# assistant-response token ranges mapped into each window: exactly the
# (window, mask-spans) pairs a packed-SFT trainer feeds its loss mask.

#: window width in whitespace tokens for the packed-SFT layout
SFT_PACK_WINDOW = 64


def sft_packed_loss_spans(
    spark: SparkSession, sf_dir: str, *, window: int = SFT_PACK_WINDOW
) -> DataFrame:
    """Registry plan: per (source, window), every loss-mask span —
    (doc_id, start_tok, end_tok), within-window 0-based token offsets,
    end exclusive. Rendered examples (``sft_examples`` template: 1
    user marker + p prompt tokens + 1 assistant marker + r response
    tokens + 1 end marker = p+r+3 tokens) are concatenated in doc_id
    order per source and cut at ``window``-token boundaries; each
    example's response run [start+p+2, start+p+2+r) is intersected
    with the windows it touches.

    Scale shape: example start offsets via the two-phase blocked prefix
    sum (the bpe_packed_windows/sequence_packing device — no
    single-partition running sum); then everything stays at SPAN grain:
    a response run touching w windows emits w rows via a ≤w-element
    sequence explode — no token-grain relation is ever materialized,
    which is the entire trick (the bpe packer must explode tokens
    because it emits window CONTENTS; a loss mask is pure arithmetic).
    Oracle-EXACT (same arithmetic under UNNEST)."""
    from ..functions.core import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    base = docs.select(
        "doc_id", "source", F.size(toks).alias("n")
    ).withColumn(
        "p",
        F.greatest(
            F.lit(1),
            F.least(F.lit(SFT_PROMPT_CAP), F.floor(F.col("n") / 4)),
        ).cast("int"),
    ).select(
        "doc_id",
        "source",
        "p",
        (F.col("n") - F.col("p")).cast("int").alias("r"),
        (F.col("n") + 3).cast("long").alias("n_tok"),
    )
    blk = base.withColumn("blk", F.expr("doc_id div 256"))
    w_local = (
        Window.partitionBy("source", "blk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = blk.withColumn("lcum", F.sum("n_tok").over(w_local))
    w_blocks = (
        Window.partitionBy("source")
        .orderBy("blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        local.groupBy("source", "blk")
        .agg(F.sum("n_tok").alias("blk_total"))
        .withColumn(
            "blk_offset",
            F.coalesce(
                F.sum("blk_total").over(w_blocks),
                F.lit(0).cast("long"),
            ),
        )
        .select("source", "blk", "blk_offset")
    )
    spans = (
        local.join(offsets, ["source", "blk"])
        .withColumn(
            "start",
            F.col("blk_offset") + F.col("lcum") - F.col("n_tok"),
        )
        .filter(F.col("r") > 0)
        .withColumn("span_start", F.col("start") + F.col("p") + 2)
        .withColumn("span_end", F.col("span_start") + F.col("r"))
    )
    win = F.explode(
        F.sequence(
            F.expr(f"span_start div {window}"),
            F.expr(f"(span_end - 1) div {window}"),
        )
    )
    return (
        spans.select("doc_id", "source", "span_start", "span_end", win.alias("w"))
        .select(
            "source",
            F.col("w").cast("int").alias("window_id"),
            "doc_id",
            (
                F.greatest(F.col("span_start"), F.col("w") * window)
                - F.col("w") * window
            ).cast("int").alias("start_tok"),
            (
                F.least(F.col("span_end"), (F.col("w") + 1) * window)
                - F.col("w") * window
            ).cast("int").alias("end_tok"),
        )
        .orderBy("source", "window_id", "start_tok")
    )


LIBRARY_QUERIES["sft_packed_loss_spans"] = sft_packed_loss_spans

LIBRARY_ORACLE["sft_packed_loss_spans"] = f"""
    WITH base AS (
        SELECT doc_id, source,
               len(string_split(text, ' ')) AS n,
               GREATEST(1, LEAST({SFT_PROMPT_CAP},
                                 len(string_split(text, ' ')) // 4)) AS p
        FROM documents
    ),
    sized AS (
        SELECT doc_id, source, p,
               CAST(n - p AS INT) AS r,
               CAST(n + 3 AS BIGINT) AS n_tok
        FROM base
    ),
    placed AS (
        SELECT *,
               SUM(n_tok) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING
               ) - n_tok AS start
        FROM sized
    ),
    spans AS (
        SELECT doc_id, source,
               start + p + 2 AS span_start,
               start + p + 2 + r AS span_end
        FROM placed WHERE r > 0
    )
    SELECT s.source,
           CAST(g.w AS INT) AS window_id,
           s.doc_id,
           CAST(GREATEST(s.span_start, g.w * {SFT_PACK_WINDOW})
                - g.w * {SFT_PACK_WINDOW} AS INT) AS start_tok,
           CAST(LEAST(s.span_end, (g.w + 1) * {SFT_PACK_WINDOW})
                - g.w * {SFT_PACK_WINDOW} AS INT) AS end_tok
    FROM spans s,
         LATERAL unnest(generate_series(
             CAST(s.span_start // {SFT_PACK_WINDOW} AS BIGINT),
             CAST((s.span_end - 1) // {SFT_PACK_WINDOW} AS BIGINT)))
             AS g(w)
    ORDER BY source, window_id, start_tok
"""


# ---------------------------------------------------------------------------
# RLHF/DPO preference-pair construction (r14): the post-training data
# artifact after SFT — (chosen, rejected) document pairs built by a
# deterministic quality contrast WITHIN each (lang, source) bucket:
# rank documents by quality_score (ties by doc_id), pair rank r with
# rank n+1−r for 2r ≤ n (best-vs-worst, second-vs-second-worst, …; an
# odd bucket's median document is unpaired — the standard mirrored
# pairing that maximizes per-pair margin sum for a fixed pairing count).
#
# Scale: both windows are BUCKET-partitioned (lang × source) — never a
# global sort; the pairing join is an equi-join on (bucket, mirrored
# rank), exchange-free on the already-ranked relation. margin is a
# difference of two identically-computed doubles, so the whole row is
# oracle-exact (the text_quality parity class).


def preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO/RLHF preference pairs: per (lang, source) bucket, mirrored
    quality-rank pairing with exact margins. NULL/NaN scores are
    excluded exactly like _scored_docs (an unscorable document has no
    defined rank — and Spark/DuckDB disagree on NaN placement under
    DESC, so exclusion is the one shareable semantics).

    Scale shape: a (lang, source) bucket is few-in-number but UNBOUNDED
    in size, so ranking with one window per bucket would put each
    bucket in a single task — the one-hot-partition killer. The rank
    therefore runs two-phase with SCORE-BUCKET blocks (the
    token_budget_selection recipe, per bucket): row_number within
    (bucket, blk), block-count offsets on the ≤ buckets×BUDGET_BLOCKS
    block-grain relation, global-in-bucket rank = offset + local rank —
    exact integers, bit-identical to the single-window rank. The ORACLE
    is that single global-per-bucket ROW_NUMBER, so the green hash
    PROVES the decomposition (the curriculum_order story). Same
    documented caveat as every value-bucketing: an all-equal-score
    bucket collapses to one block."""
    from .llmdata import text_quality

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source"
    )
    q = text_quality(spark, sf_dir).select("doc_id", "quality_score")
    base = docs.join(q, "doc_id").filter(
        F.col("quality_score").isNotNull() & ~F.isnan("quality_score")
    )
    scored = base.withColumn(
        "blk", F.floor(F.col("quality_score") * BUDGET_BLOCKS).cast("int")
    )
    w_local = Window.partitionBy("lang", "source", "blk").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    local = scored.withColumn("lr", F.row_number().over(w_local))
    w_blocks = (
        Window.partitionBy("lang", "source")
        .orderBy(F.desc("blk"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        local.groupBy("lang", "source", "blk")
        .agg(F.count(F.lit(1)).alias("bn"))
        .withColumn(
            "off",
            F.coalesce(F.sum("bn").over(w_blocks), F.lit(0).cast("long")),
        )
        .select("lang", "source", "blk", "off")
    )
    sizes = local.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n")
    )
    ranked = (
        local.join(F.broadcast(offsets), ["lang", "source", "blk"])
        .join(F.broadcast(sizes), ["lang", "source"])
        .select(
            "lang",
            "source",
            "doc_id",
            "quality_score",
            (F.col("off") + F.col("lr")).alias("r"),
            "n",
        )
    )
    c, x = ranked.alias("c"), ranked.alias("x")
    return (
        c.join(
            x,
            (F.col("c.lang") == F.col("x.lang"))
            & (F.col("c.source") == F.col("x.source"))
            & (F.col("x.r") == F.col("c.n") + 1 - F.col("c.r")),
        )
        .where(2 * F.col("c.r") <= F.col("c.n"))
        .select(
            F.col("c.lang").alias("lang"),
            F.col("c.source").alias("source"),
            F.col("c.r").cast("int").alias("pair_rank"),
            F.col("c.doc_id").alias("chosen_doc_id"),
            F.col("x.doc_id").alias("rejected_doc_id"),
            F.col("c.quality_score").alias("chosen_score"),
            F.col("x.quality_score").alias("rejected_score"),
            (F.col("c.quality_score") - F.col("x.quality_score")).alias(
                "margin"
            ),
        )
    )


def _preference_pairs_sql() -> str:
    from .llmdata import ORACLE as _LLM_ORACLE

    return f"""
    WITH tq AS ({_LLM_ORACLE["text_quality"]}),
    base AS (
        SELECT d.lang, d.source, t.doc_id, t.quality_score
        FROM documents d JOIN tq t ON d.doc_id = t.doc_id
        WHERE t.quality_score IS NOT NULL AND NOT isnan(t.quality_score)
    ),
    ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (
                   PARTITION BY lang, source
                   ORDER BY quality_score DESC, doc_id
               ) AS r,
               COUNT(*) OVER (PARTITION BY lang, source) AS n
        FROM base
    )
    SELECT c.lang, c.source, CAST(c.r AS INTEGER) AS pair_rank,
           c.doc_id AS chosen_doc_id, x.doc_id AS rejected_doc_id,
           c.quality_score AS chosen_score,
           x.quality_score AS rejected_score,
           c.quality_score - x.quality_score AS margin
    FROM ranked c JOIN ranked x
      ON c.lang = x.lang AND c.source = x.source
     AND x.r = c.n + 1 - c.r
    WHERE 2 * c.r <= c.n
    """


LIBRARY_QUERIES["preference_pairs"] = preference_pairs
LIBRARY_ORACLE["preference_pairs"] = _preference_pairs_sql()


def preference_agreement_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Inter-rater agreement over the preference pairs — the QA number
    a preference-data pipeline monitors before training a reward
    model: when two independent raters judge the same pairs, how far
    above chance is their agreement (Cohen's κ)? Rater A is the
    quality composite (higher ``quality_score``, ties to the smaller
    doc_id — the pairing's own rule); rater B is a deliberately
    independent cheap signal (longer document, same tie rule). Each
    pair is presented in CANONICAL order (lo/hi by doc_id) so both
    raters genuinely vary — judging in A's chosen-first order would
    make A constant and κ degenerate.

    Per (lang, source): pair count, agreements, observed rate p_o,
    chance rate p_e = pA·pB + (1−pA)·(1−pB) from the raters'
    marginal lo-preference rates, and κ = (p_o − p_e)/(1 − p_e) —
    NULL when a bucket is chance-saturated (p_e = 1: both raters
    constant and identical, κ undefined). All counts are exact
    integers; the ratios/products/differences are the identical
    IEEE-754 op tree on both engines (the pagerank damping-update
    parity class), so the row is oracle-EXACT.

    Scale: rides the pairs relation (already two-phase blocked) plus
    one doc-grain length join and a (lang, source) partial-agg
    groupBy — nothing new at corpus grain."""
    from ..functions.core import tokens

    pairs = preference_pairs(spark, sf_dir)
    lens = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens(F.col("text"))).alias("n_tok")
    )
    lo = F.least("chosen_doc_id", "rejected_doc_id")
    hi = F.greatest("chosen_doc_id", "rejected_doc_id")
    canon = pairs.select(
        "lang",
        "source",
        lo.alias("lo_id"),
        hi.alias("hi_id"),
        # rater A prefers the pair's chosen doc; in canonical order
        # that is "prefers lo" iff chosen == lo
        (F.col("chosen_doc_id") == lo).alias("a_lo"),
    )
    judged = (
        canon.join(
            lens.select(
                F.col("doc_id").alias("lo_id"),
                F.col("n_tok").alias("lo_tok"),
            ),
            "lo_id",
        )
        .join(
            lens.select(
                F.col("doc_id").alias("hi_id"),
                F.col("n_tok").alias("hi_tok"),
            ),
            "hi_id",
        )
        .withColumn(
            "b_lo",
            (F.col("lo_tok") > F.col("hi_tok"))
            | (F.col("lo_tok") == F.col("hi_tok")),  # tie → smaller id = lo
        )
    )
    agg = judged.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(
            (F.col("a_lo") == F.col("b_lo")).cast("long")
        ).alias("n_agree"),
        F.sum(F.col("a_lo").cast("long")).alias("a_lo_n"),
        F.sum(F.col("b_lo").cast("long")).alias("b_lo_n"),
    )
    p_o = F.col("n_agree") / F.col("n_pairs")
    p_a = F.col("a_lo_n") / F.col("n_pairs")
    p_b = F.col("b_lo_n") / F.col("n_pairs")
    p_e = p_a * p_b + (F.lit(1.0) - p_a) * (F.lit(1.0) - p_b)
    return (
        agg.select(
            "lang",
            "source",
            F.col("n_pairs").cast("int").alias("n_pairs"),
            F.col("n_agree").cast("int").alias("n_agree"),
            p_o.alias("p_observed"),
            p_e.alias("p_expected"),
            F.when(
                p_e != 1.0, (p_o - p_e) / (F.lit(1.0) - p_e)
            ).alias("kappa"),
        )
        .orderBy("lang", "source")
    )


def _preference_agreement_sql() -> str:
    return f"""
    WITH pairs AS ({_preference_pairs_sql()}),
    lens AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tok
        FROM documents
    ),
    canon AS (
        SELECT lang, source,
               LEAST(chosen_doc_id, rejected_doc_id) AS lo_id,
               GREATEST(chosen_doc_id, rejected_doc_id) AS hi_id,
               chosen_doc_id = LEAST(chosen_doc_id, rejected_doc_id)
                   AS a_lo
        FROM pairs
    ),
    judged AS (
        SELECT c.lang, c.source, c.a_lo,
               (l.n_tok > h.n_tok) OR (l.n_tok = h.n_tok) AS b_lo
        FROM canon c
        JOIN lens l ON l.doc_id = c.lo_id
        JOIN lens h ON h.doc_id = c.hi_id
    ),
    agg AS (
        SELECT lang, source,
               COUNT(*) AS n_pairs,
               SUM(CASE WHEN a_lo = b_lo THEN 1 ELSE 0 END) AS n_agree,
               SUM(CASE WHEN a_lo THEN 1 ELSE 0 END) AS a_lo_n,
               SUM(CASE WHEN b_lo THEN 1 ELSE 0 END) AS b_lo_n
        FROM judged GROUP BY lang, source
    )
    SELECT lang, source,
           CAST(n_pairs AS INT) AS n_pairs,
           CAST(n_agree AS INT) AS n_agree,
           n_agree / n_pairs AS p_observed,
           (a_lo_n / n_pairs) * (b_lo_n / n_pairs)
               + (1.0 - a_lo_n / n_pairs) * (1.0 - b_lo_n / n_pairs)
               AS p_expected,
           CASE WHEN (a_lo_n / n_pairs) * (b_lo_n / n_pairs)
                     + (1.0 - a_lo_n / n_pairs)
                       * (1.0 - b_lo_n / n_pairs) != 1.0
                THEN (n_agree / n_pairs
                      - ((a_lo_n / n_pairs) * (b_lo_n / n_pairs)
                         + (1.0 - a_lo_n / n_pairs)
                           * (1.0 - b_lo_n / n_pairs)))
                     / (1.0 - ((a_lo_n / n_pairs) * (b_lo_n / n_pairs)
                               + (1.0 - a_lo_n / n_pairs)
                                 * (1.0 - b_lo_n / n_pairs)))
                END AS kappa
    FROM agg
    ORDER BY lang, source
    """


LIBRARY_QUERIES["preference_agreement_stats"] = preference_agreement_stats
LIBRARY_ORACLE["preference_agreement_stats"] = _preference_agreement_sql()


# ---------------------------------------------------------------------------
# Multi-turn SFT rendering (r14): most real SFT data is MULTI-turn chat;
# sft_examples covers the single-turn shape, this pair renders a
# deterministic alternating user/assistant conversation (turns of
# MT_TURN tokens, user first, last partial turn kept) and emits the
# exact 1-based char span of EVERY assistant turn — the per-turn loss
# masks a chat trainer unmasks. On a real corpus the turn boundaries
# arrive upstream; only the rendering + offset arithmetic is the
# operator.
#
# Shape: one explode to turn grain (≤ ⌈n/MT_TURN⌉ rows per doc), one
# DOC-partitioned window over those bounded rows for the char prefix
# sum, and the deterministic collect_list(struct) reassembly for the
# rendered string (the video-signature pattern — never a bare
# groupBy collect_list). All integer/string arithmetic → oracle-exact.

MT_TURN = 12
MT_USER = "<|user|>"
MT_ASST = "<|assistant|>"
MT_END = " <|end|>"


def _multiturn_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turn-grain relation shared by both plans: (doc_id, k, role,
    text_k, part, loss_start, loss_end, n, n_turns)."""
    from ..functions.core import tokens

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    toks = tokens(F.col("text"))
    base = docs.select(
        "doc_id", toks.alias("t"), F.size(toks).alias("n")
    ).withColumn(
        "n_turns",
        F.floor((F.col("n") + MT_TURN - 1) / MT_TURN).cast("int"),
    )
    turns = base.select(
        "doc_id",
        "t",
        "n",
        "n_turns",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("k"),
    )
    role = F.when(F.col("k") % 2 == 0, F.lit(MT_USER)).otherwise(
        F.lit(MT_ASST)
    )
    text_k = F.array_join(
        F.slice(F.col("t"), F.col("k") * MT_TURN + 1, MT_TURN), " "
    )
    staged = turns.select(
        "doc_id",
        "n",
        "n_turns",
        "k",
        role.alias("role"),
        text_k.alias("text_k"),
    ).withColumn("part", F.concat("role", F.lit(" "), "text_k"))
    w = (
        Window.partitionBy("doc_id")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start_part = (
        F.coalesce(F.sum(F.length("part") + 1).over(w), F.lit(0)) + 1
    )
    loss_start = (start_part + F.length("role") + 1).cast("int")
    return staged.select(
        "doc_id",
        "n",
        "n_turns",
        "k",
        "role",
        "text_k",
        "part",
        loss_start.alias("loss_start"),
        (loss_start + F.length("text_k")).cast("int").alias("loss_end"),
    )


def sft_multiturn_rendered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, rendered, n_turns, n_tokens) — the rendered multi-turn
    conversation (parts space-joined in turn order + the end token)."""
    parts = _multiturn_parts(spark, sf_dir)
    return (
        parts.groupBy("doc_id")
        .agg(
            F.concat(
                F.concat_ws(
                    " ",
                    F.array_sort(
                        F.collect_list(F.struct("k", "part"))
                    ).getField("part"),
                ),
                F.lit(MT_END),
            ).alias("rendered"),
            F.min("n_turns").alias("n_turns"),
            F.min("n").cast("int").alias("n_tokens"),
        )
    )


def sft_multiturn_loss_spans(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(doc_id, turn_idx, loss_start, loss_end) — one row per ASSISTANT
    turn: the exact 1-based char range of that turn's text inside
    sft_multiturn_rendered's string (the chat trainer's per-turn loss
    mask)."""
    return (
        _multiturn_parts(spark, sf_dir)
        .where(F.col("k") % 2 == 1)
        .select(
            "doc_id",
            F.col("k").alias("turn_idx"),
            "loss_start",
            "loss_end",
        )
    )


LIBRARY_QUERIES["sft_multiturn_rendered"] = sft_multiturn_rendered
LIBRARY_QUERIES["sft_multiturn_loss_spans"] = sft_multiturn_loss_spans

_MT_PARTS_SQL = f"""
    base AS (
        SELECT doc_id, string_split(text, ' ') AS t,
               len(string_split(text, ' ')) AS n,
               CAST((len(string_split(text, ' ')) + {MT_TURN} - 1)
                    // {MT_TURN} AS INTEGER) AS n_turns
        FROM documents WHERE text IS NOT NULL
    ),
    turns AS (
        SELECT doc_id, n, n_turns, CAST(g.k AS INTEGER) AS k,
               CASE WHEN g.k % 2 = 0 THEN '{MT_USER}'
                    ELSE '{MT_ASST}' END AS role,
               array_to_string(
                   t[CAST(g.k * {MT_TURN} + 1 AS INTEGER)
                     : CAST(LEAST((g.k + 1) * {MT_TURN}, n) AS INTEGER)],
                   ' ') AS text_k
        FROM base, LATERAL unnest(range(n_turns)) AS g(k)
    ),
    parts AS (
        SELECT *, role || ' ' || text_k AS part FROM turns
    ),
    placed AS (
        SELECT *,
               CAST(COALESCE(SUM(length(part) + 1) OVER (
                   PARTITION BY doc_id ORDER BY k
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) + 1 + length(role) + 1 AS INTEGER) AS loss_start
        FROM parts
    )
"""

LIBRARY_ORACLE["sft_multiturn_rendered"] = f"""
    WITH {_MT_PARTS_SQL}
    SELECT doc_id,
           string_agg(part, ' ' ORDER BY k) || '{MT_END}' AS rendered,
           CAST(MIN(n_turns) AS INTEGER) AS n_turns,
           CAST(MIN(n) AS INTEGER) AS n_tokens
    FROM placed GROUP BY doc_id
"""

LIBRARY_ORACLE["sft_multiturn_loss_spans"] = f"""
    WITH {_MT_PARTS_SQL}
    SELECT doc_id, k AS turn_idx, loss_start,
           CAST(loss_start + length(text_k) AS INTEGER) AS loss_end
    FROM placed WHERE k % 2 = 1
"""
