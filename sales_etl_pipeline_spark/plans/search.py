"""Full-text retrieval as relational plans: BM25 ranked search and
positional phrase search over the documents corpus.

A training-data pipeline needs in-engine retrieval for corpus QA
(inspecting what a query surfaces), contamination auditing (does an
eval question retrieve near-verbatim training docs), and
retrieval-based curation (dense + lexical hybrid selection). The
reference's query surface (reference README.md:131-154) is
aggregate-analytics only; this module extends it the same way
``plans/llmdata.py`` extends dedup — Spark-first, oracle-checked.

Architecture: the classic inverted index IS a relational plan. The
postings list is the (term, doc_id, tf) relation produced by one
tokenize + groupBy shuffle; a query is a broadcast join against it —
postings lookup, per-document score, top-k. No per-row Python
anywhere; the tokenizer is ``explode(split())`` (whole-stage codegen),
scoring is column arithmetic.

Scale design (SURVEY §4.3): the only fact-grain shuffle builds the
(doc, term) tf relation — the same shape every llmdata plan pays.
Queries live at literal/broadcast grain; candidate generation is a
broadcast hash join (never a scan of non-matching docs — Catalyst
prunes the tf relation by the joined term set); the final top-k is a
window over candidates partitioned by query, and AQE handles a skewed
high-df term. At 100 TB the tf relation is the search index: persist
it once (bucketed by term) and every query after that is
index-lookup-shaped, which is exactly how a distributed search engine
lays out postings shards.

Exactness (the cross-engine oracle contract): textbook BM25 uses
ln-based idf, but ``ln()`` is not correctly rounded and differs
across engines (the doc_surprisal finding, plans/llmdata.py:3145).
The oracle-checked plan therefore uses the ODDS-RATIO idf
``(N - df + 0.5) / (df + 0.5)`` — the exact argument of Robertson's
``ln(1 + x)`` idf, monotone in df, so per-term discrimination
ordering is preserved — and dyadic constants k1 = 1.5, b = 0.75
(exact in binary). Every remaining op is a correctly-rounded IEEE
double op with an identical tree in both engines, and the per-term
score sum goes through the fixed-point xsum (functions/core.py:68).
``bm25_score(..., log_idf=True)`` gives the textbook Lucene scoring
for production ranking; it is rank-tested in pytest, not
oracle-compared (ln parity is unattainable by construction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from ..functions.core import oracle_xsum, xsum
from ..sources.readers import load_table

#: BM25 constants — dyadic rationals, exact in IEEE binary in both engines
K1 = 1.5
B = 0.75
TOP_K = 10

#: the retrieval benchmark query set: literal and deterministic so the
#: DuckDB oracle sees the identical queries. q4 probes the rare
#: discriminator term; q5 carries an out-of-vocabulary term (zero
#: postings — must not null out the rest of the query).
SEARCH_QUERIES: tuple[tuple[int, str], ...] = (
    (1, "spark stream window"),
    (2, "hash join dup"),
    (3, "fast scan filter table"),
    (4, "dup"),
    (5, "spark warehouse"),
)

#: phrase queries for positional search: adjacent-bigram phrases.
PHRASE_QUERIES: tuple[tuple[int, str, str], ...] = (
    (1, "batch", "batch"),
    (2, "spark", "window"),
    (3, "hash", "join"),
)


def _tf(docs: DataFrame) -> DataFrame:
    """(doc_id, term, tf) postings relation — one tokenize shuffle."""
    return (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


def _odds_idf(n_docs: Column, df_: Column) -> Column:
    """Robertson odds-ratio idf: (N - df + 0.5) / (df + 0.5)."""
    half = F.lit(0.5)
    return (n_docs.cast("double") - df_.cast("double") + half) / (
        df_.cast("double") + half
    )


def bm25_index(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Corpus statistics for frozen-index scoring: the (term, df)
    relation and the 1-row (n_docs, avgdl) constants. Persist these two
    tiny relations once and ``bm25_score_with_index`` scores any later
    document batch/stream against them — how a production ranker scores
    NEW documents without re-reading the reference corpus."""
    tf = _tf(docs)
    doclen = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    consts = doclen.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    return dfreq, consts


def bm25_score_with_index(
    docs: DataFrame,
    queries: DataFrame,
    dfreq: DataFrame,
    consts: DataFrame,
    *,
    k1: float = K1,
    b: float = B,
    log_idf: bool = False,
) -> DataFrame:
    """Score documents against FROZEN index statistics: tf and document
    length come from ``docs`` (each doc is self-contained), idf and
    avgdl from the index relations — identical op tree to
    ``bm25_score``, so self-indexed scoring is the special case
    ``bm25_score_with_index(docs, q, *bm25_index(docs))``. Terms absent
    from the index drop out (no df → no idf), the standard frozen-
    vocabulary behavior. Streaming: every input is per-doc-local or a
    broadcast static relation, so the same expression runs unchanged in
    a foreachBatch microbatch (streaming/jobs.run_stream_bm25_score)."""
    tf = _tf(docs)
    doclen = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    idf = _odds_idf(F.col("n_docs"), F.col("df"))
    if log_idf:
        idf = F.log(F.lit(1.0) + idf)
    cand = (
        tf.join(F.broadcast(queries), "term")
        .join(F.broadcast(dfreq), "term")
        .join(F.broadcast(consts))
        .join(doclen, "doc_id")
    )
    tfd = F.col("tf").cast("double")
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / F.col("avgdl"))
    )
    term_score = idf * (tfd * F.lit(k1 + 1.0) / (tfd + norm))
    return (
        cand.select("query_id", "doc_id", term_score.alias("ts"))
        .groupBy("query_id", "doc_id")
        .agg(xsum(F.col("ts")).alias("score"))
    )


def bm25_score(
    docs: DataFrame,
    queries: DataFrame,
    *,
    k1: float = K1,
    b: float = B,
    log_idf: bool = False,
) -> DataFrame:
    """Score every (query, document) pair sharing ≥1 term — the reusable
    retrieval API ``bm25_topk`` instantiates on the benchmark queries.

    ``docs``: (doc_id, text). ``queries``: (query_id, term) — one row
    per query term, pre-tokenized (duplicate query terms score twice,
    the standard bag-of-words semantics). Returns
    (query_id, doc_id, score). ``log_idf=True`` switches to the Lucene
    idf ``ln(1 + (N-df+0.5)/(df+0.5))`` — production ranking, not
    cross-engine exact (module docstring).

    One scoring implementation exists (``bm25_score_with_index`` — the
    oracle-pinned op tree lives there alone); this is the self-indexed
    special case. Catalyst's ReuseExchange dedups the doubled tf
    shuffle.
    """
    dfreq, consts = bm25_index(docs)
    return bm25_score_with_index(
        docs, queries, dfreq, consts, k1=k1, b=b, log_idf=log_idf
    )


def bm25_topk(spark: SparkSession, sf_dir: str, k: int = TOP_K) -> DataFrame:
    """Top-k BM25 retrieval for the benchmark query set: the inverted
    index as a relational plan (module docstring). Returns
    (query_id, rank, doc_id, score) — k best documents per query,
    ties broken by doc_id for determinism.
    """
    docs = load_table(spark, sf_dir, "documents")
    queries = spark.createDataFrame(
        [
            (qid, term)
            for qid, q in SEARCH_QUERIES
            for term in q.split(" ")
        ],
        "query_id int, term string",
    )
    scored = bm25_score(docs, queries)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
        .orderBy("query_id", "rank")
    )


def _bm25_oracle(k: int = TOP_K) -> str:
    """Identical plan in DuckDB: same literal queries, same odds-ratio
    idf, same DOUBLE-literal op tree (bare decimal literals parse as
    DECIMAL in DuckDB — the pagerank-oracle finding, graph.py:157),
    same fixed-point score sum."""
    qrows = ", ".join(
        f"({qid}, '{t}')"
        for qid, q in SEARCH_QUERIES
        for t in q.split(" ")
    )
    k1 = "CAST(1.5 AS DOUBLE)"
    b = "CAST(0.75 AS DOUBLE)"
    one_minus_b = "CAST(0.25 AS DOUBLE)"
    k1_plus_1 = "CAST(2.5 AS DOUBLE)"
    half = "CAST(0.5 AS DOUBLE)"
    term_score = (
        "("
        f"(CAST(consts.n_docs AS DOUBLE) - CAST(dfreq.df AS DOUBLE) + {half})"
        f" / (CAST(dfreq.df AS DOUBLE) + {half})"
        ") * ("
        f"CAST(tf.tf AS DOUBLE) * {k1_plus_1}"
        f" / (CAST(tf.tf AS DOUBLE) + {k1} * ({one_minus_b}"
        f" + {b} * (CAST(doclen.dl AS DOUBLE) / consts.avgdl)))"
        ")"
    )
    return f"""
        WITH q(query_id, term) AS (VALUES {qrows}),
        tf AS MATERIALIZED (
            SELECT doc_id, term, COUNT(*) AS tf
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                  FROM documents)
            GROUP BY 1, 2
        ),
        doclen AS MATERIALIZED (
            SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1
        ),
        consts AS MATERIALIZED (
            SELECT COUNT(*) AS n_docs,
                   CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
            FROM doclen
        ),
        dfreq AS MATERIALIZED (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
        ),
        scored AS MATERIALIZED (
            SELECT q.query_id, tf.doc_id,
                   {oracle_xsum(term_score)} AS score
            FROM tf
            JOIN q USING (term)
            JOIN dfreq USING (term)
            JOIN doclen USING (doc_id)
            CROSS JOIN consts
            GROUP BY 1, 2
        )
        SELECT query_id, rank, doc_id, score
        FROM (
            SELECT query_id, doc_id, score,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY score DESC, doc_id) AS INTEGER) AS rank
            FROM scored
        )
        WHERE rank <= {k}
        ORDER BY query_id, rank
    """


def phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search: which documents contain each 2-word
    phrase, and how often. The positional inverted index is the
    (doc_id, pos, term) relation from one posexplode; a phrase match is
    a self-join ``p2.pos = p1.pos + 1`` — integer-exact, the standard
    positional-postings intersection every search engine runs, here as
    a co-partitioned join on doc_id.

    Returns (phrase_id, doc_id, n_occurrences) for every document with
    ≥1 occurrence. Scale: positions shuffle once on doc_id; the
    self-join is co-partitioned (same key) so no second shuffle; the
    phrase table is a broadcast literal.
    """
    docs = load_table(spark, sf_dir, "documents")
    phrases = spark.createDataFrame(
        list(PHRASE_QUERIES), "phrase_id int, w1 string, w2 string"
    )
    pos = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "term"),
    )
    p1 = pos.alias("p1").join(
        F.broadcast(phrases), F.col("p1.term") == F.col("w1")
    )
    p2 = pos.alias("p2")
    return (
        p1.join(
            p2,
            (F.col("p1.doc_id") == F.col("p2.doc_id"))
            & (F.col("p2.pos") == F.col("p1.pos") + F.lit(1))
            & (F.col("p2.term") == F.col("w2")),
        )
        .groupBy("phrase_id", F.col("p1.doc_id").alias("doc_id"))
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy("phrase_id", "doc_id")
    )


def _phrase_oracle() -> str:
    prows = ", ".join(
        f"({pid}, '{w1}', '{w2}')" for pid, w1, w2 in PHRASE_QUERIES
    )
    return f"""
        WITH ph(phrase_id, w1, w2) AS (VALUES {prows}),
        pos AS MATERIALIZED (
            SELECT doc_id, u.pos, u.term FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           range(0, len(string_split(text, ' '))),
                           i -> {{'pos': CAST(i AS INTEGER),
                                  'term': string_split(text, ' ')[i + 1]}}
                       )) AS u
                FROM documents
            )
        )
        SELECT ph.phrase_id, p1.doc_id, COUNT(*) AS n_occurrences
        FROM pos p1
        JOIN ph ON p1.term = ph.w1
        JOIN pos p2 ON p2.doc_id = p1.doc_id
                   AND p2.pos = p1.pos + 1
                   AND p2.term = ph.w2
        GROUP BY 1, 2
        ORDER BY 1, 2
    """


LIBRARY_QUERIES = {
    "bm25_topk": bm25_topk,
    "phrase_search": phrase_search,
}

LIBRARY_ORACLE = {
    "bm25_topk": _bm25_oracle(),
    "phrase_search": _phrase_oracle(),
}


# ---------------------------------------------------------------------------
# Hybrid retrieval: Reciprocal Rank Fusion of two rankings.

#: standard RRF constant (Cormack/Clarke/Buettcher 2009)
RRF_K = 60
#: quality list depth for the fusion plan
QUALITY_TOP = 10


def rrf_fuse(a: DataFrame, b: DataFrame, k: int = RRF_K) -> DataFrame:
    """Reciprocal Rank Fusion of two rankings: score(d) =
    Σ_lists 1/(k + rank_d). ``a``: (query_id, rank, doc_id);
    ``b``: (rank, doc_id) — a query-independent prior list (quality,
    recency, authority) fused into every query. Returns
    (query_id, rank, doc_id, rrf_score) re-ranked per query.

    Exactness: ranks are integers, 1/(k+rank) is one correctly-rounded
    IEEE division, and the fusion is ONE addition of two coalesced
    terms — no ordering-dependent aggregation anywhere, so the oracle
    matches bit-for-bit with no xsum machinery. Scale: both inputs are
    top-k lists (k·queries rows); the fusion join and re-rank window
    run at candidate grain, never corpus grain."""
    half_a = a.select(
        "query_id",
        "doc_id",
        (F.lit(1.0) / (F.lit(float(k)) + F.col("rank").cast("double"))).alias(
            "sa"
        ),
    )
    half_b = b.select(
        "doc_id",
        (F.lit(1.0) / (F.lit(float(k)) + F.col("rank").cast("double"))).alias(
            "sb"
        ),
    )
    # per query: full outer over the query's list and the prior list —
    # realized as outer join on doc_id after keying the prior by query
    queries = a.select("query_id").distinct()
    prior = queries.join(F.broadcast(half_b))
    fused = (
        half_a.join(prior, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            (
                F.coalesce("sa", F.lit(0.0)) + F.coalesce("sb", F.lit(0.0))
            ).alias("rrf_score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), "doc_id"
    )
    return fused.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).select("query_id", "rank", "doc_id", "rrf_score")


def bm25_quality_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry plan: fuse the BM25 top-k with a query-independent
    quality prior (longest documents first — the deterministic
    stand-in for a model quality score) via RRF. The hybrid-retrieval
    shape: lexical relevance × corpus-level prior, re-ranked."""
    docs = load_table(spark, sf_dir, "documents")
    # top-N FIRST (TakeOrderedAndProject — per-partition top-k, never a
    # single-partition global sort of the corpus), THEN rank the N
    # survivors with a window that only ever sees N rows
    wq = Window.orderBy(F.desc("n_chars"), "doc_id")
    quality = (
        docs.select("doc_id", "n_chars")
        .orderBy(F.desc("n_chars"), "doc_id")
        .limit(QUALITY_TOP)
        .withColumn("rank", F.row_number().over(wq).cast("int"))
        .select("rank", "doc_id")
    )
    return rrf_fuse(bm25_topk(spark, sf_dir), quality).orderBy(
        "query_id", "rank"
    )


def _fusion_oracle() -> str:
    k = f"CAST({RRF_K}.0 AS DOUBLE)"
    one = "CAST(1.0 AS DOUBLE)"
    zero = "CAST(0.0 AS DOUBLE)"
    return f"""
        WITH bm25 AS MATERIALIZED ({_bm25_oracle()}),
        quality AS MATERIALIZED (
            SELECT CAST(ROW_NUMBER() OVER (
                       ORDER BY n_chars DESC, doc_id) AS INTEGER) AS rank,
                   doc_id
            FROM documents
            QUALIFY rank <= {QUALITY_TOP}
        ),
        half_a AS (
            SELECT query_id, doc_id,
                   {one} / ({k} + CAST(rank AS DOUBLE)) AS sa
            FROM bm25
        ),
        prior AS (
            SELECT q.query_id, quality.doc_id,
                   {one} / ({k} + CAST(quality.rank AS DOUBLE)) AS sb
            FROM (SELECT DISTINCT query_id FROM bm25) q, quality
        ),
        fused AS (
            SELECT COALESCE(half_a.query_id, prior.query_id) AS query_id,
                   COALESCE(half_a.doc_id, prior.doc_id) AS doc_id,
                   COALESCE(sa, {zero}) + COALESCE(sb, {zero}) AS rrf_score
            FROM half_a
            FULL OUTER JOIN prior
              ON half_a.query_id = prior.query_id
             AND half_a.doc_id = prior.doc_id
        )
        SELECT query_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY rrf_score DESC, doc_id) AS INTEGER) AS rank,
               doc_id, rrf_score
        FROM fused
        ORDER BY query_id, rank
    """


LIBRARY_QUERIES["bm25_quality_fusion"] = bm25_quality_fusion
LIBRARY_ORACLE["bm25_quality_fusion"] = _fusion_oracle()
