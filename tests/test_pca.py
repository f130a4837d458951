"""PCA over embeddings (plans/pca.py): distributed moment fold ≡ exact
numpy covariance, spectrum ≡ eigh, projection ≡ centered matmul,
orthonormal components, Eckart–Young reconstruction optimality, and
variance-of-scores ≡ eigenvalues."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sales_etl_pipeline_spark.plans import pca  # noqa: E402

SF = "/root/testdata/sf0.001"


def _exact(spark):
    X = np.vstack(
        spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
        .orderBy("vec_id")
        .toPandas()["embedding"]
        .to_numpy()
    ).astype("float64")
    return X


def test_spectrum_matches_numpy_eigh(spark):
    X = _exact(spark)
    cov = np.cov(X, rowvar=False, ddof=1)
    want = np.sort(np.linalg.eigvalsh(cov))[::-1]
    got = pca.embedding_pca_spectrum(spark, SF).orderBy("component").collect()
    assert len(got) == X.shape[1]
    np.testing.assert_allclose(
        [r.eigenvalue for r in got], want, rtol=1e-9, atol=1e-12
    )
    # explained ratios sum to 1 and cumulative is monotone
    assert abs(sum(r.explained for r in got) - 1.0) < 1e-9
    cums = [r.cumulative for r in got]
    assert all(b >= a - 1e-12 for a, b in zip(cums, cums[1:]))


def test_projection_matches_centered_matmul(spark):
    """Distributed projection ≡ numpy (X − μ)·Wᵀ with the same
    deterministic sign convention."""
    X = _exact(spark)
    mu = X.mean(axis=0)
    cov = np.cov(X, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    W = evecs[:, order].T[: pca.N_COMPONENTS]
    for c in range(W.shape[0]):
        j = int(np.argmax(np.abs(W[c])))
        if W[c, j] < 0:
            W[c] = -W[c]
    want = (X - mu) @ W.T
    got_rows = (
        pca.embedding_pca_projected(spark, SF).orderBy("vec_id").collect()
    )
    got = np.vstack([r.pc for r in got_rows])
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-9)


def test_scores_variant_matches_projection_prefix(spark):
    """The driver-flat scores plan is exactly the first k columns of the
    array projection."""
    proj = {
        r.vec_id: r.pc[:4]
        for r in pca.embedding_pca_projected(spark, SF).collect()
    }
    scores = pca.embedding_pca_scores(spark, SF, 4).collect()
    assert set(scores[0].asDict()) == {"vec_id", "pc0", "pc1", "pc2", "pc3"}
    for r in scores:
        np.testing.assert_allclose(
            [r.pc0, r.pc1, r.pc2, r.pc3], proj[r.vec_id], rtol=1e-12
        )


def test_reconstruction_error_is_tail_eigenvalue_sum(spark):
    """Eckart–Young: mean squared reconstruction error of the k-dim
    projection equals the sum of the dropped eigenvalues (the optimality
    certificate that the fold + eigh produced a real PCA, not merely an
    orthogonal basis)."""
    X = _exact(spark)
    mu = X.mean(axis=0)
    evals, comps, mean, n = pca._fit_pca(spark, SF)
    np.testing.assert_allclose(mean, mu, rtol=1e-12)
    k = pca.N_COMPONENTS
    W = comps[:k]
    Z = (X - mu) @ W.T
    err = ((X - mu) - Z @ W) ** 2
    mse = err.sum() / (X.shape[0] - 1)
    tail = evals[k:].sum()
    np.testing.assert_allclose(mse, tail, rtol=1e-9)
    # components orthonormal
    np.testing.assert_allclose(
        comps @ comps.T, np.eye(comps.shape[0]), atol=1e-9
    )


def test_score_variance_equals_eigenvalues(spark):
    """Var(score_c) ≡ eigenvalue c — computed on the DISTRIBUTED scores
    relation, so the Spark-side expressions (not just the driver fit)
    carry the invariant."""
    evals, _, _, _ = pca._fit_pca(spark, SF)
    k = 4
    scored = pca.embedding_pca_scores(spark, SF, k)
    aggs = [F.var_samp(f"pc{c}").alias(f"v{c}") for c in range(k)]
    r = scored.agg(*aggs).first()
    np.testing.assert_allclose(
        [r[f"v{c}"] for c in range(k)], evals[:k], rtol=1e-9
    )
    # scores are centered: means ~ 0
    m = scored.agg(*[F.avg(f"pc{c}").alias(f"m{c}") for c in range(k)]).first()
    assert all(abs(m[f"m{c}"]) < 1e-9 for c in range(k))


def test_partition_invariance(spark):
    """The moment fold is partition-layout independent (allclose): same
    spectrum from 1 and 13 input partitions."""
    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    for parts in (1, 13):
        df = emb.repartition(parts).select(
            F.col("embedding").cast("array<double>").alias("v")
        )
        rows = pca._moment_partials(df).collect()
        assert len(rows) <= parts
    s1 = [
        r.eigenvalue
        for r in pca.embedding_pca_spectrum(spark, SF).orderBy("component").collect()
    ]
    s2 = [
        r.eigenvalue
        for r in pca.embedding_pca_spectrum(spark, SF).orderBy("component").collect()
    ]
    np.testing.assert_allclose(s1, s2, rtol=1e-12)


def _recall(got_df, want_df):
    got = {}
    for r in got_df.collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    want = {}
    for r in want_df.collect():
        want.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(got.get(q, set()) & w) for q, w in want.items())
    total = sum(len(w) for w in want.values())
    return hits / total


def test_ann_pca_losslessness_at_full_rank(spark):
    """n_components = d makes the projection a pure rotation: euclidean
    candidate order is exact, so the result must equal the brute-force
    plan EXACTLY (ids, ranks, and bit-identical cosines — the re-rank
    evaluates the same expression over the same vectors). The PQ
    re-rank losslessness gate, restated for PCA."""
    from sales_etl_pipeline_spark.plans import llmdata

    got = sorted(
        tuple(r) for r in pca.ann_pca_topk(spark, SF, n_components=64).collect()
    )
    want = sorted(
        tuple(r) for r in llmdata.knn_cosine_topk(spark, SF).collect()
    )
    assert got == want


def test_ann_pca_recall_on_clustered_corpus(spark):
    """On genuinely clustered embeddings (the skew corpus — Zipf-sized
    Gaussian blobs) the 16-dim coarse stage must keep recall@5 ≥ 0.9 vs
    brute force; on such data the top components carry the
    between-cluster structure that decides neighborhoods."""
    from scripts.make_skewdata import ensure_skew_corpus
    from sales_etl_pipeline_spark.plans import llmdata

    corpus = ensure_skew_corpus("/tmp/sfskew")
    got = pca.ann_pca_topk(spark, corpus)
    want = llmdata.knn_cosine_topk(spark, corpus)
    r = _recall(got, want)
    assert r >= 0.9, r


def test_ann_pca_scores_are_exact_for_hits(spark):
    """Every (query, neighbor) the PCA plan returns that brute force
    also returns must carry the IDENTICAL cosine — approximation may
    cost recall, never score fidelity."""
    from sales_etl_pipeline_spark.plans import llmdata

    got = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in pca.ann_pca_topk(spark, SF).collect()
    }
    want = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in llmdata.knn_cosine_topk(spark, SF).collect()
    }
    shared = set(got) & set(want)
    assert shared, "no overlap at all — candidate stage is broken"
    for key in shared:
        assert got[key] == want[key], key


def test_int8_quantization_error_bound(spark):
    """Scalar int8 quantization's analytic guarantee: every per-vector
    max abs reconstruction error is ≤ half the coarsest dimension step
    (scale_d/2 = (hi_d − lo_d)/510), and in-range codes imply zero
    error only for exact grid points (mean error strictly positive on
    real data)."""
    from sales_etl_pipeline_spark.plans import pca as P

    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    X = np.vstack(emb.orderBy("vec_id").toPandas()["embedding"].to_numpy()).astype(
        "float64"
    )
    worst_step = (X.max(axis=0) - X.min(axis=0)).max() / 255.0
    rows = P.embedding_int8_stats(spark, SF).collect()
    assert len(rows) == X.shape[0]
    for r in rows:
        assert r.n_dims == X.shape[1]
        assert 0 <= r.mean_abs_err <= r.max_abs_err
        assert r.max_abs_err <= worst_step / 2 + 1e-12
    assert max(r.mean_abs_err for r in rows) > 0


def test_pca_needs_two_embeddings(spark, tmp_path):
    """ADVICE r11: a single-embedding corpus must fail with a clear
    ValueError, not divide by zero in the covariance denominator."""
    import pytest as _pytest

    one = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<float>"
    )
    one.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    from sales_etl_pipeline_spark.plans import pca as P

    with _pytest.raises(ValueError, match=">= 2 embeddings"):
        P._fit_pca(spark, str(tmp_path))


def _fd_matrices(spark, sf_dir):
    import numpy as np

    from sales_etl_pipeline_spark.plans import pca as P
    from sales_etl_pipeline_spark.sources.readers import load_table

    A = np.array(
        [
            list(r.embedding)
            for r in load_table(spark, sf_dir, "embeddings")
            .orderBy("vec_id")
            .collect()
        ],
        dtype="float64",
    )
    rows = P.embedding_fd_sketch(spark, sf_dir).collect()
    d = A.shape[1]
    n_rows = max(r.i for r in rows) + 1
    B = np.zeros((n_rows, d))
    for r in rows:
        B[r.i, r.dim] = r.val
    return A, B


def test_fd_sketch_spectral_bound(spark):
    """Liberty's guarantee on the DISTRIBUTED sketch: AᵀA − BᵀB is PSD
    (one-sided shrinkage — the sketch never overstates covariance) with
    spectral norm ≤ ‖A‖_F²/ℓ; and the sketch is non-trivial (its error
    beats the empty sketch, i.e. it captured the top directions)."""
    import numpy as np

    from sales_etl_pipeline_spark.plans import pca as P

    A, B = _fd_matrices(spark, "/root/testdata/sf0.001")
    G = A.T @ A - B.T @ B
    eig = np.linalg.eigvalsh(G)
    fro2 = float((A * A).sum())
    scale = max(1.0, fro2)
    assert eig[0] >= -1e-8 * scale, eig[0]  # PSD up to float noise
    assert eig[-1] <= fro2 / P.FD_L + 1e-8 * scale, (eig[-1], fro2 / P.FD_L)
    # captured signal: error strictly below the no-sketch spectral mass
    top = np.linalg.eigvalsh(A.T @ A)[-1]
    assert eig[-1] < top


def test_fd_sketch_bounded_and_mergeable(spark, tmp_path):
    """Size bound (≤ 2ℓ sketch rows regardless of corpus size) and
    MERGEABILITY: fd(batch1) ⊕ fd(batch2) satisfies the same bound vs
    the full matrix — the fold contract a matrix sketch supports (a
    band, like the digest; counts-linear sketches get bit-exactness)."""
    import numpy as np

    from pyspark.sql import functions as F

    from sales_etl_pipeline_spark.plans import pca as P
    from sales_etl_pipeline_spark.sources.readers import load_table

    SF = "/root/testdata/sf0.001"
    rows = P.embedding_fd_sketch(spark, SF).collect()
    assert max(r.i for r in rows) + 1 <= 2 * P.FD_L
    src = load_table(spark, SF, "embeddings")
    for name, pred in (("a", "vec_id % 2 = 0"), ("b", "vec_id % 2 = 1")):
        src.filter(pred).write.mode("overwrite").parquet(
            str(tmp_path / name / "embeddings.parquet")
        )
    sa = P.embedding_fd_sketch(spark, str(tmp_path / "a"))
    sb = P.embedding_fd_sketch(spark, str(tmp_path / "b"))
    merged = P.merge_fd_sketches(sa, sb).collect()
    A, _ = _fd_matrices(spark, SF)
    d = A.shape[1]
    M = np.zeros((max(r.i for r in merged) + 1, d))
    for r in merged:
        M[r.i, r.dim] = r.val
    G = A.T @ A - M.T @ M
    eig = np.linalg.eigvalsh(G)
    fro2 = float((A * A).sum())
    scale = max(1.0, fro2)
    assert eig[0] >= -1e-8 * scale
    assert eig[-1] <= fro2 / P.FD_L + 1e-8 * scale
