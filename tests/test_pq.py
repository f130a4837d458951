"""IVF-PQ invariants: the PQ layer (residual codebooks + ADC shortlist +
exact re-rank) must be recall-lossless relative to the shared IVF
candidate generation, codes must honor the m/k contract, and returned
cosines must be exact (bit-comparable to the raw-vector path). The
clustered-corpus absolute-recall gate lives in tests/test_skew.py."""

from __future__ import annotations

import os
import sys

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sales_etl_pipeline_spark.plans import llmdata  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_pq_layer_is_recall_lossless_vs_ivf(spark):
    """ann_ivfpq_topk shares candidate generation with ann_ivf_topk
    (same trained centroids, same ⌈√k⌉ probes) — any hit-set difference
    is PQ-layer loss (ADC misranking truncated by the shortlist). At the
    sized defaults the loss must be ≤ 5%."""
    llmdata.clear_centroid_cache()
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in llmdata.ann_ivf_topk(spark, SF).collect()
    }
    pq = {
        (r.query_id, r.neighbor_id)
        for r in llmdata.ann_ivfpq_topk(spark, SF).collect()
    }
    assert len(pq & ivf) / len(ivf) >= 0.95, (len(pq & ivf), len(ivf))


def test_pq_codes_contract(spark):
    """Every encoded vector carries exactly PQ_M codes, each in
    [0, PQ_K) — the m-byte storage contract the 16× compression claim
    rests on."""
    emb = llmdata._embeddings_normed(spark, SF)
    cent_ids, cmat, cn = llmdata._train_centroids(emb, cache_key=None)
    books = llmdata._train_pq(emb, cmat, cn, cache_key=None)
    assert books.shape[0] == llmdata.PQ_M
    assert books.shape[1] <= llmdata.PQ_K
    assign1 = llmdata._assign_clusters_udf(cent_ids, cmat, cn, 1, foldexact=False)
    encode = llmdata._pq_encode_udf(books, cmat)
    rows = (
        emb.select(
            "vec_id",
            F.explode(assign1(F.col("v"), F.col("nrm"))).alias("cluster"),
            "v",
        )
        .select(encode(F.col("v"), F.col("cluster")).alias("codes"))
        .collect()
    )
    codes = np.array([r.codes for r in rows])
    assert codes.shape[1] == llmdata.PQ_M
    assert codes.min() >= 0 and codes.max() < llmdata.PQ_K


def test_pq_returned_cosines_are_exact(spark):
    """Re-ranked cosines come from raw vectors, not codes: for every
    returned (query, neighbor) pair the cosine must equal the float64
    recomputation from the parquet vectors (BLAS kernel, low-bit
    tolerance only)."""
    import pyarrow.parquet as pq_

    rows = llmdata.ann_ivfpq_topk(spark, SF).collect()
    tbl = pq_.read_table(f"{SF}/embeddings.parquet")
    vecs = np.vstack(tbl["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(vecs, axis=1)
    for r in rows:
        want = float(
            vecs[r.query_id] @ vecs[r.neighbor_id]
            / (norms[r.query_id] * norms[r.neighbor_id])
        )
        assert abs(r.cosine - want) < 1e-9, (r.query_id, r.neighbor_id)
