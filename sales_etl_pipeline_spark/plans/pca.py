"""PCA over the embedding column — the dimensionality-reduction stage a
training-data pipeline runs before ANN indexing / clustering / semantic
dedup (project 64-dim vectors to the top-k principal components, keep
most of the variance, cut every downstream distance computation and
shuffle payload by d/k).

Scale shape (the classic two-phase moment aggregation):

1. ONE ``mapInPandas`` pass emits per-partition second-moment partials
   (count, sum vector, flattened Gram matrix X·Xᵀ — numpy matmul per
   Arrow batch, no Python row loop). The partial relation is bounded:
   one row per partition, (1 + d + d²) doubles each.
2. The partials fold on the DRIVER (≤ partitions rows collected — the
   same bounded-relation collect contract as the k-means centroid and
   GD-gradient plans in plans/llmdata.py): covariance =
   (ΣXXᵀ − n·μμᵀ)/(n−1), then ``numpy.linalg.eigh`` on the d×d matrix —
   d is the EMBEDDING dimension (64), driver cost O(d³) independent of
   corpus size.
3. PROJECTION is a shuffle-free map-side expression: the k×d component
   matrix enters the plan as array literals (k·d = 1024 doubles — a
   bounded model constant, unlike the vocabulary-sized ``create_map``
   the r9 plan-bloat finding banned) and each component score is one
   ``aggregate(zip_with(...))`` fold — whole-stage-codegen'd JVM
   arithmetic, no UDF, no shuffle.

Exactness: the Gram fold is exact up to float summation order (pinned
``allclose`` vs a single-machine numpy computation in
tests/test_pca.py); eigenvectors are sign-normalized (largest-|coord|
positive) so results are deterministic across runs and BLAS builds.

Registry: spectrum (flat schema) + projection (array schema → library
tier per the driver-harness compat rule in plans/__init__.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.readers import load_table

#: components kept by the projection plan (eigenvalue spectrum of the
#: synthetic corpus is flat-ish; k=16 keeps the demo honest while the
#: API takes any k ≤ d)
N_COMPONENTS = 16


def _moment_partials(emb: DataFrame) -> DataFrame:
    """Per-partition (n, Σx, flat ΣxxT) — the mergeable second-moment
    state. Bounded: one row per partition."""

    def _part(batches):
        import numpy as np

        n = 0
        s = None
        g = None
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.vstack(pdf["v"].to_numpy()).astype("float64")
            n += X.shape[0]
            s = X.sum(axis=0) if s is None else s + X.sum(axis=0)
            gg = X.T @ X
            g = gg if g is None else g + gg
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    return emb.mapInPandas(
        _part, "n long, s array<double>, g array<double>"
    )


#: fit memo keyed on a cheap data fingerprint (count, max vec_id) per
#: normalize flag — the same recipe as _BPE_CACHE/_UNIGRAM_CACHE, so the
#: four registry plans sharing one corpus pay ONE moment pass, not four
_PCA_CACHE: dict = {}


def clear_pca_cache() -> None:
    _PCA_CACHE.clear()


def _fit_pca(spark: SparkSession, sf_dir: str, normalize: bool = False):
    """Driver-side fold of the moment partials + eigh. Returns
    (eigenvalues desc, components — all d rows, mean, n).
    ``normalize=True`` fits on L2-normalized vectors (the ANN path:
    cosine ranking ≡ euclidean ranking on the unit sphere, and
    euclidean distance is preserved under the centering PCA applies).
    Memoized per (corpus fingerprint, normalize) — see ``_PCA_CACHE``."""
    import numpy as np

    table = load_table(spark, sf_dir, "embeddings")
    fp = table.agg(
        F.count(F.lit(1)).alias("n"),
        F.max("vec_id").alias("hi"),
        # a DATA term so a rewritten corpus at the same path refits
        F.sum(F.element_at("embedding", 1)).alias("s0"),
    ).first()
    key = ((fp.n, fp.hi, float(fp.s0 or 0.0)), normalize)
    hit = _PCA_CACHE.get(key)
    if hit is not None:
        return hit
    emb = table.select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    if normalize:
        nrm = F.sqrt(
            F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x)
        )
        emb = emb.select(
            F.transform("v", lambda x: x / nrm).alias("v")
        )
    rows = _moment_partials(emb).collect()  # ≤ partitions rows
    if not rows:
        raise ValueError("no embeddings")
    n = sum(r.n for r in rows)
    if n < 2:
        # the (n - 1) covariance denominator below needs n ≥ 2; fail as
        # clearly as the 'no embeddings' case instead of emitting inf/nan
        raise ValueError("need >= 2 embeddings for PCA")
    d = len(rows[0].s)
    s = np.zeros(d)
    g = np.zeros((d, d))
    for r in rows:
        s += np.asarray(r.s)
        g += np.asarray(r.g).reshape(d, d)
    mean = s / n
    cov = (g - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1]
    evals = evals[order]
    comps = evecs[:, order].T  # row c = component c
    # deterministic sign: largest-|coordinate| entry is positive
    for c in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[c])))
        if comps[c, j] < 0:
            comps[c] = -comps[c]
    out = (evals, comps, mean, n)
    _PCA_CACHE[key] = out
    return out


def embedding_pca_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The eigenvalue spectrum with explained-variance ratios — the
    relation a pipeline reads to CHOOSE k (component, eigenvalue,
    explained, cumulative). Flat schema; rows-only by design
    (eigendecomposition is not SQL-expressible) with the exact numpy
    twin pinned in tests/test_pca.py."""
    evals, _, _, _ = _fit_pca(spark, sf_dir)
    total = float(evals.sum())
    rows, cum = [], 0.0
    for i, ev in enumerate(evals):
        share = float(ev) / total if total else 0.0
        cum += share
        rows.append((i, float(ev), share, cum))
    return spark.createDataFrame(
        rows,
        "component int, eigenvalue double, explained double, "
        "cumulative double",
    )


def _proj_exprs(comps, mean, k: int):
    """k shuffle-free component-score expressions over a centered
    embedding column: score_c = Σ_j (v[j] − μ[j])·w_c[j], evaluated as
    one zip_with/aggregate fold per component (JVM, codegen)."""
    mean_lit = F.array(*[F.lit(float(x)) for x in mean])
    centered = F.zip_with("v", mean_lit, lambda a, b: a - b)
    out = []
    for c in range(k):
        w = F.array(*[F.lit(float(x)) for x in comps[c]])
        out.append(
            F.aggregate(
                F.zip_with(centered, w, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias(f"pc{c}")
        )
    return out


def embedding_pca_projected(
    spark: SparkSession, sf_dir: str, k: int = N_COMPONENTS
) -> DataFrame:
    """Top-k PCA scores per vector: (vec_id, pc array<double>) — the
    reduced representation ANN/semantic-dedup consume. Array schema →
    library tier (driver-harness compat rule). Projection is map-side
    only: fit is the bounded two-phase moment fold, apply is k
    codegen'd array folds — zero shuffles end to end."""
    evals, comps, mean, _ = _fit_pca(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    scored = emb.select("vec_id", *_proj_exprs(comps, mean, k))
    return scored.select(
        "vec_id",
        F.array(*[F.col(f"pc{c}") for c in range(k)]).alias("pc"),
    )


def embedding_pca_scores(
    spark: SparkSession, sf_dir: str, k: int = 4
) -> DataFrame:
    """Driver-harness-flat variant: the first ``k`` component scores as
    scalar columns (vec_id, pc0..pc{k-1}) — the registry-facing row a
    CORRECTNESS run can canonicalize. Same fit, same expressions."""
    evals, comps, mean, _ = _fit_pca(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return emb.select("vec_id", *_proj_exprs(comps, mean, k))


def ann_pca_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = 5,
    n_components: int = 32,
    overfetch: int = 20,
) -> DataFrame:
    """ANN with a PCA COARSE STAGE + exact re-rank — the dimensionality-
    reduction counterpart of ``ann_ivfpq_topk``'s product quantization:

    1. L2-normalize (cosine ranking ≡ euclidean ranking on the unit
       sphere), fit PCA on the normalized vectors, project to
       ``n_components`` dims (euclidean distance is centering-invariant,
       and the top-m projection is the m-dim linear map that preserves
       it best in the Frobenius sense).
    2. Candidate generation: squared-euclidean on the PROJECTED vectors
       (d/n_components× less fold work and broadcast payload per pair),
       top ``k·overfetch`` per query.
    3. Exact cosine re-rank on the ORIGINAL vectors for the final
       top-k — reported scores are exact, approximation only ever costs
       recall, never score fidelity (same contract as the PQ re-rank).

    Same query set and output schema as ``knn_cosine_topk``. Recall
    gates live in tests/test_pca.py, including the LOSSLESSNESS
    property: at n_components = d the projection is a pure rotation, so
    the result equals the brute-force plan exactly.

    Defaults are set from a measured sweep on the clustered skew corpus
    (tight Gaussian blobs + exact duplicates — the adversarial regime
    where WITHIN-cluster neighbor order is decided by isotropic noise
    PCA cannot compress): recall@5 vs brute force was 0.54 at
    (16 comps, 6× overfetch), 0.76 at (16, 40×), 0.62 at (32, 6×),
    **0.96 at (32, 20×)** — keep half the dimensions and overfetch
    wide, or the coarse stage finds the right cluster but shuffles its
    interior. Continuous/anisotropic corpora need far less of both."""
    from .llmdata import _dot_expr, _embeddings_normed
    from pyspark.sql import Window

    evals, comps, mean, _ = _fit_pca(spark, sf_dir, normalize=True)
    emb = _embeddings_normed(spark, sf_dir)
    unit = emb.select(
        "vec_id",
        F.transform("v", lambda x: x / F.col("nrm")).alias("v"),
    )
    from .llmdata import _pin

    # proj feeds both sides of the candidate join — pin it so the
    # normalize+project pass runs once (released at the next registry
    # plan, the standard _pin lifecycle)
    proj = _pin(unit.select(
        "vec_id",
        F.array(
            *[e.alias(f"p{c}") for c, e in
              enumerate(_proj_exprs(comps, mean, n_components))]
        ).alias("p"),
    ))
    qp = proj.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("p").alias("qp")
    )
    dist = F.aggregate(
        F.zip_with("p", "qp", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cand_w = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
    cands = (
        proj.join(F.broadcast(qp), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            dist.alias("d2"),
        )
        .withColumn("crank", F.row_number().over(cand_w))
        .filter(F.col("crank") <= k * overfetch)
        .select("query_id", "neighbor_id")
    )
    # exact re-rank: fetch full vectors by id for the shortlist only
    n = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("nv"),
        F.col("nrm").alias("nn"),
    )
    q = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        cands.join(n, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot_expr(F.col("qv"), F.col("nv"))
                / (F.col("qn") * F.col("nn"))
            ).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def embedding_int8_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension INT8 scalar quantization of the embedding column
    with exact reconstruction-error accounting — the memory-bound
    compression step next to residual PQ (``llmdata.ann_ivfpq_topk``):
    8× smaller vectors (64 B vs 512 B of doubles) for ANN shortlists and
    broadcast payloads, with the quality cost MEASURED, not assumed.

    code = clamp(floor((x − lo_d)/scale_d + 0.5), 0, 255) with
    scale_d = (hi_d − lo_d)/255 per dimension (min/max from one
    dim-grain aggregate — a d-row broadcast relation); floor(x+0.5)
    instead of round() because the engines' round() tie rules differ
    while floor is identically defined. Per-vector output: n_dims,
    mean |x − recon| (via the order-independent ``xsum``) and
    max |x − recon| — all bit-exact vs the DuckDB oracle.

    Scale shape: one posexplode to (vec, dim) grain, one d-row
    aggregate, a broadcast join back, one vec-grain aggregate — the
    same two-shuffle shape as any per-dim normalization; everything
    else is codegen'd arithmetic."""
    from ..functions.core import xsum

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    dims = emb.select("vec_id", F.posexplode("v").alias("dim", "x"))
    rng = dims.groupBy("dim").agg(
        F.min("x").alias("lo"), F.max("x").alias("hi")
    )
    j = dims.join(F.broadcast(rng), "dim")
    scale = (F.col("hi") - F.col("lo")) / F.lit(255.0)
    code = F.when(F.col("hi") == F.col("lo"), F.lit(0.0)).otherwise(
        F.least(
            F.greatest(
                F.floor((F.col("x") - F.col("lo")) / scale + F.lit(0.5))
                .cast("double"),
                F.lit(0.0),
            ),
            F.lit(255.0),
        )
    )
    err = F.abs(F.col("x") - (F.col("lo") + code * scale))
    return (
        j.select("vec_id", err.alias("err"))
        .groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_dims"),
            (xsum(F.col("err")) / F.count(F.lit(1))).alias("mean_abs_err"),
            F.max("err").alias("max_abs_err"),
        )
        .orderBy("vec_id")
    )


def _int8_stats_sql() -> str:
    from ..functions.core import oracle_xsum

    return f"""
    WITH dims AS (
        SELECT vec_id, g.i - 1 AS dim,
               CAST(embedding[g.i] AS DOUBLE) AS x
        FROM embeddings,
        LATERAL unnest(generate_series(1, len(embedding))) AS g(i)
    ),
    rng AS (SELECT dim, MIN(x) AS lo, MAX(x) AS hi FROM dims GROUP BY 1),
    q AS (
        SELECT vec_id, x, lo, hi,
               CASE WHEN hi = lo THEN 0.0
                    ELSE least(greatest(floor(
                        (x - lo) / ((hi - lo) / 255.0) + 0.5), 0.0), 255.0)
               END AS code
        FROM dims JOIN rng USING (dim)
    ),
    e AS (
        SELECT vec_id,
               abs(x - (lo + code * ((hi - lo) / 255.0))) AS err
        FROM q
    )
    SELECT vec_id,
           CAST(COUNT(*) AS INTEGER) AS n_dims,
           {oracle_xsum("err")} / COUNT(*) AS mean_abs_err,
           MAX(err) AS max_abs_err
    FROM e GROUP BY vec_id
    ORDER BY vec_id
    """


# ---------------------------------------------------------------------------
# Frequent Directions matrix sketch (Liberty 2013; Ghashami et al. 2016
# — public): the BOUNDED-MEMORY, MERGEABLE covariance sketch next to the
# exact moment fold above. The exact fold ships (1+d+d²) doubles per
# partition — fine at d=64, quadratic in d; FD ships ≤ 2ℓ×d per
# partition with the one-sided spectral guarantee
# 0 ⪯ AᵀA − BᵀB ⪯ (‖A‖_F²/ℓ)·I, and sketches MERGE (concat + shrink)
# with the same bound — the matrix member of the mergeable-summary
# family (counts/HLL/MG/bottom-k/digest/CM ✓, now covariance ✓).

FD_L = 16  # sketch rows kept; buffer 2ℓ, shrink on overflow


def _fd_shrink(B: "np.ndarray", l: int) -> "np.ndarray":
    """One FD shrink: SVD, subtract the ℓ-th singular value's square
    from every spectrum entry (floor 0), keep the non-zero rows (≤ ℓ−1)
    of sqrt(Σ²−σ_ℓ²)·Vᵀ. Deterministic for a fixed row order."""
    U, s, Vt = np.linalg.svd(B, full_matrices=False)
    if len(s) < l:
        return B.copy()
    s2 = np.maximum(s * s - s[l - 1] * s[l - 1], 0.0)
    keep = s2 > 0
    return (np.sqrt(s2[keep])[:, None] * Vt[keep])


def _fd_fold(rows_iter, l: int, d: int) -> "np.ndarray":
    """Fold vectors (or sketch rows) into an FD sketch: buffer to 2ℓ,
    shrink on overflow, final state ≤ 2ℓ rows."""
    B = np.zeros((0, d))
    for chunk in rows_iter:
        if not len(chunk):
            continue
        B = np.vstack([B, chunk])
        while B.shape[0] >= 2 * l:
            B = _fd_shrink(B, l)
    return B


def embedding_fd_sketch(
    spark: SparkSession, sf_dir: str, *, l: int = FD_L
) -> DataFrame:
    """The Frequent Directions sketch of the embedding matrix as a flat
    relation (i, dim, val) — ≤ 2ℓ×d rows at ANY corpus size. Two-phase
    like the quantile digest: per-partition FD fold via ``mapInPandas``
    (numpy SVD per shrink, never more than 2ℓ rows of state), then ONE
    bounded global merge (≤ partitions×2ℓ rows) via ``applyInPandas``,
    concatenating partials in deterministic (pid, i) order and
    re-shrinking. Rows-only; the Liberty spectral bound — for the
    distributed AND the merged sketch — plus mergeability are pinned in
    tests/test_pca.py.

    WHY NO SQL ORACLE CAN EXIST (r14 oracle-upgrade hunt, VERDICT r13
    Next #5): every FD shrink step is a full SVD of the 2ℓ×d buffer.
    (a) SQL cannot express an SVD: it is an iterative eigendecomposition
    with a data-dependent iteration count, outside relational algebra +
    DuckDB's scalar surface. (b) Even an unrolled fixed-iteration Jacobi
    replay could not match bit-for-bit: the Spark-side kernel uses
    LAPACK dgesdd (divide-and-conquer), and two different float
    algorithms for the same decomposition agree only to rounding error,
    not bitwise — while this engine's oracle contract is EXACT hashes,
    no tolerance. (c) Forcing one partition removes the fold-order
    nondeterminism (the pytest mergeability gate does exactly that) but
    does not make the SVD SQL-expressible, so determinism alone buys no
    oracle. The strongest available cross-checks are therefore the
    pytest gates: the numpy twin replay (bit-exact), the spectral error
    bound, and merge-order invariance.

    100-TB shape: state per executor is 2ℓ×d doubles (16 KB here),
    shuffle is partitions×2ℓ skinny rows, and the guarantee degrades
    with ‖A‖_F²/ℓ — the knob is ℓ, not data size."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("v"),
        F.spark_partition_id().alias("pid"),
    )
    probe = emb.select(F.size("v").alias("d")).first()
    if probe is None:
        raise ValueError("no embeddings")
    d = probe.d

    def _partial(batches):
        B = np.zeros((0, d))
        pid = 0
        for pdf in batches:
            if not len(pdf):
                continue
            pid = int(pdf["pid"].iloc[0])
            B = _fd_fold([B, np.vstack(pdf["v"].to_numpy())], l, d)
        if B.shape[0]:
            i, dim = np.divmod(np.arange(B.size), d)
            yield pd.DataFrame(
                {
                    "pid": pid,
                    "i": i.astype("int32"),
                    "dim": dim.astype("int32"),
                    "val": B.ravel(),
                }
            )

    partials = emb.mapInPandas(
        _partial, "pid int, i int, dim int, val double"
    )

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["pid", "i", "dim"])
        mats = []
        for (pid, _), g in pdf.groupby(["pid", "i"], sort=True):
            mats.append(g["val"].to_numpy())
        B = _fd_fold([np.vstack(mats)] if mats else [], l, d)
        i, dim = np.divmod(np.arange(B.size), d)
        return pd.DataFrame(
            {
                "i": i.astype("int32"),
                "dim": dim.astype("int32"),
                "val": B.ravel(),
            }
        )

    return (
        partials.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(
            lambda pdf: _merge(pdf.drop(columns=["_g"])),
            "i int, dim int, val double",
        )
    )


def merge_fd_sketches(
    *sketches: DataFrame, l: int = FD_L
) -> DataFrame:
    """Fold FD sketch relations (the incremental-maintenance entry
    point): union the (i, dim, val) rows — tagged by input position so
    the fold order is deterministic — and re-shrink once. Same
    ‖A‖_F²/ℓ guarantee on the merged result (Ghashami et al.'s
    mergeability theorem)."""
    tagged = []
    for j, s in enumerate(sketches):
        tagged.append(s.withColumn("pid", F.lit(j)))
    unioned = tagged[0]
    for s in tagged[1:]:
        unioned = unioned.unionByName(s)
    probe = unioned.agg(F.max("dim").alias("m")).first()
    d = int(probe.m) + 1 if probe.m is not None else 0

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["pid", "i", "dim"])
        mats = [
            g["val"].to_numpy()
            for _, g in pdf.groupby(["pid", "i"], sort=True)
        ]
        B = _fd_fold([np.vstack(mats)] if mats else [], l, d)
        i, dim = np.divmod(np.arange(B.size), d)
        return pd.DataFrame(
            {
                "i": i.astype("int32"),
                "dim": dim.astype("int32"),
                "val": B.ravel(),
            }
        )

    return (
        unioned.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(
            lambda pdf: _merge(pdf.drop(columns=["_g"])),
            "i int, dim int, val double",
        )
    )


LIBRARY_QUERIES = {
    "embedding_fd_sketch": embedding_fd_sketch,
    "embedding_pca_spectrum": embedding_pca_spectrum,
    "embedding_pca_projected": embedding_pca_projected,
    "embedding_pca_scores": embedding_pca_scores,
    "ann_pca_topk": ann_pca_topk,
    "embedding_int8_stats": embedding_int8_stats,
}

#: PCA plans carry no SQL oracles (eigendecomposition is not
#: SQL-expressible — the exact numpy twins live in tests/test_pca.py);
#: the int8 quantization IS oracle-exact (pure floor/clamp arithmetic +
#: xsum error accounting)
LIBRARY_ORACLE: dict[str, str] = {
    "embedding_int8_stats": _int8_stats_sql(),
}
