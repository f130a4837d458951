"""Mergeable quantile digest (plans/quantiles.py): rank-error band vs
exact quantiles, fold ≡ recompute (band property), merge determinism,
library-plan agreement, and adversarial distributions (heavy skew,
duplicates, constant columns)."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sales_etl_pipeline_spark.plans import quantiles as Q  # noqa: E402

SF = "/root/testdata/sf0.001"

#: the documented contract: rank error ≤ 2/delta
RANK_EPS = 2.0 / Q.DELTA


def _rank_of(sorted_vals: np.ndarray, v: float) -> float:
    """Fractional rank of v in the exact data (midpoint of its
    insertion window, so duplicates don't bias the check)."""
    lo = np.searchsorted(sorted_vals, v, side="left")
    hi = np.searchsorted(sorted_vals, v, side="right")
    return ((lo + hi) / 2) / len(sorted_vals)


def _assert_band(est_rows, exact: dict[object, np.ndarray], eps=RANK_EPS):
    """est_rows: (key, q, value); exact: key -> sorted values.

    Primary check: the fractional rank of the estimate is within eps of
    q. On ATOMIC distributions rank-of-value is discontinuous (any
    value inside an atom gap has the same rank no matter how close to
    the atom it is), so an estimate 1e-4 below the true atom would
    'jump' a whole atom mass — the fallback accepts estimates inside
    the [quantile(q-eps), quantile(q+eps)] order-statistic window with
    a small relative value tolerance (the same window formulation
    t-digest's own test-suite uses for discrete data)."""
    assert est_rows, "no estimates produced"
    for key, q, v in est_rows:
        vals = exact[key]
        r = _rank_of(vals, v)
        if abs(r - q) <= eps:
            continue
        lo = float(np.quantile(vals, max(0.0, q - eps)))
        hi = float(np.quantile(vals, min(1.0, q + eps)))
        tol = 1e-9 + 1e-3 * max(abs(lo), abs(hi))
        assert lo - tol <= v <= hi + tol, (key, q, v, r, lo, hi, eps)


def _collect_est(df, keyed=True):
    if keyed:
        return [(r[0], r.q, r.value) for r in df.collect()]
    return [(None, r.q, r.value) for r in df.collect()]


def test_digest_band_on_orders(spark):
    """The registry plan's estimates sit inside the rank band for every
    (priority, q) against the exact sorted data."""
    got = _collect_est(Q.approx_order_value_quantiles(spark, SF))
    orders = spark.read.parquet(os.path.join(SF, "orders.parquet"))
    exact = {
        r.o_orderpriority: None
        for r in orders.select("o_orderpriority").distinct().collect()
    }
    for k in exact:
        exact[k] = np.sort(
            np.array(
                orders.filter(F.col("o_orderpriority") == k)
                .select("o_totalprice")
                .toPandas()["o_totalprice"],
                dtype="float64",
            )
        )
    assert {k for k, _, _ in got} == set(exact)
    _assert_band(got, exact)


@pytest.mark.parametrize(
    "name,gen",
    [
        ("uniform", lambda rng: rng.random(20_000) * 100),
        ("lognormal_skew", lambda rng: rng.lognormal(0, 2.5, 20_000)),
        ("heavy_dups", lambda rng: rng.integers(0, 10, 20_000).astype(float)),
        ("constant", lambda rng: np.full(5_000, 42.0)),
        ("two_point", lambda rng: np.where(rng.random(20_000) < 0.99, 1.0, 1e9)),
    ],
)
def test_digest_band_adversarial(spark, name, gen):
    """The 2/delta band holds on skewed, duplicate-heavy, constant and
    two-point distributions — the shapes that break naive histogram
    sketches."""
    rng = np.random.default_rng(7)
    vals = gen(rng)
    df = spark.createDataFrame(
        [(float(v),) for v in vals], "v double"
    ).repartition(8)
    d = Q.quantile_digest(df, "v", (), Q.DELTA)
    est = _collect_est(Q.digest_quantiles(d, Q.QS, ()), keyed=False)
    _assert_band(est, {None: np.sort(vals)})


def test_digest_bounded_size_and_weight_conservation(spark):
    """Compression invariants: ≤ ~2·delta centroids per key and the
    centroid weights sum exactly to the (non-null) row count."""
    orders = spark.read.parquet(os.path.join(SF, "orders.parquet"))
    d = Q.quantile_digest(orders, "o_totalprice", ("o_orderpriority",))
    rows = d.collect()
    from collections import defaultdict

    per_key = defaultdict(list)
    for r in rows:
        per_key[r.o_orderpriority].append(r.c_weight)
    counts = {
        r.o_orderpriority: r.n
        for r in orders.groupBy("o_orderpriority")
        .agg(F.count("o_totalprice").alias("n"))
        .collect()
    }
    for k, ws in per_key.items():
        assert len(ws) <= 2 * Q.DELTA + 1, (k, len(ws))
        assert abs(sum(ws) - counts[k]) < 1e-6, (k, sum(ws), counts[k])


def test_fold_equals_recompute_within_band(spark):
    """Incremental maintenance: digest(batch1) ⊕ digest(batch2) and
    digest(batch1 ∪ batch2) both satisfy the band vs the exact union —
    the same fold ≡ recompute contract as incremental.py, stated as the
    band property a lossy summary supports."""
    rng = np.random.default_rng(11)
    a = rng.lognormal(1, 1.5, 12_000)
    b = rng.lognormal(2, 1.0, 8_000)  # shifted: the fold must adapt
    df_a = spark.createDataFrame([(float(v),) for v in a], "v double")
    df_b = spark.createDataFrame([(float(v),) for v in b], "v double")
    d_a = Q.quantile_digest(df_a, "v")
    d_b = Q.quantile_digest(df_b, "v")
    folded = Q.merge_digest_states(d_a, d_b)
    both = Q.quantile_digest(df_a.unionByName(df_b), "v")
    exact = {None: np.sort(np.concatenate([a, b]))}
    _assert_band(
        _collect_est(Q.digest_quantiles(folded, Q.QS, ()), keyed=False), exact
    )
    _assert_band(
        _collect_est(Q.digest_quantiles(both, Q.QS, ()), keyed=False), exact
    )
    # weight conservation through the fold
    tot = folded.agg(F.sum("c_weight")).first()[0]
    assert abs(tot - (len(a) + len(b))) < 1e-6


def test_merge_is_deterministic(spark):
    """Same inputs → bit-identical merged digest (the merge sorts by
    centroid mean and re-chunks greedily; no partition-order leak)."""
    rng = np.random.default_rng(3)
    vals = rng.random(10_000) * 50
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    d1 = sorted(
        (r.c_mean, r.c_weight)
        for r in Q.quantile_digest(df.repartition(4), "v").collect()
    )
    d2 = sorted(
        (r.c_mean, r.c_weight)
        for r in Q.quantile_digest(df.repartition(4), "v").collect()
    )
    assert d1 == d2


def test_exact_plan_matches_percentile(spark):
    """The exact baseline plan agrees with numpy's linear interpolation
    (the same definition DuckDB quantile_cont uses — its library oracle
    pins the cross-engine equality)."""
    got = {
        r.o_orderpriority: (r.q25, r.q50, r.q75, r.q95)
        for r in Q.exact_order_value_quantiles(spark, SF).collect()
    }
    orders = spark.read.parquet(os.path.join(SF, "orders.parquet"))
    pdf = orders.select("o_orderpriority", "o_totalprice").toPandas()
    for k, g in pdf.groupby("o_orderpriority"):
        want = np.quantile(g["o_totalprice"].to_numpy(), Q.QS)
        assert np.allclose(got[k], want), (k, got[k], want)


def test_chunk_digest_kernel_properties():
    """Hypothesis property gate on the shared chunk kernel (used by the
    batch, incremental AND streaming digests): for arbitrary finite
    value lists and any delta — exact mass conservation, per-centroid
    weight ≤ cap(+fp), ≤ 2·delta+1 centroids, means inside the data
    range and NON-DECREASING (sorted input ⇒ sorted centroids — the
    invariant the relational extraction's cum-weight window relies on).
    Pure Python, no Spark."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from sales_etl_pipeline_spark.plans.quantiles import _chunk_digest

    @settings(max_examples=200, deadline=None)
    @given(
        vals=st.lists(
            st.floats(
                min_value=-1e12,
                max_value=1e12,
                allow_nan=False,
                allow_infinity=False,
            ),
            min_size=1,
            max_size=400,
        ),
        delta=st.integers(min_value=1, max_value=64),
    )
    def check(vals, delta):
        v = np.sort(np.asarray(vals, dtype="float64"))
        m, w = _chunk_digest(v, np.ones(len(v)), delta)
        assert len(m) == len(w)
        assert abs(w.sum() - len(v)) < 1e-6 * max(1, len(v))
        cap = max(len(v) / delta, 1e-12)
        assert (w <= cap + 1e-6).all()
        assert len(m) <= 2 * delta + 1
        tol = 1e-9 * max(1.0, abs(float(v[0])), abs(float(v[-1])))
        assert (m >= v[0] - tol).all() and (m <= v[-1] + tol).all()
        assert (np.diff(m) >= -tol).all()

    check()


def test_null_keyed_rows_form_a_group(spark):
    """ADVICE r11 (quantiles.py dropna): rows whose KEY is NULL must
    form their own digest group — exactly like Spark groupBy and the
    quantile_cont oracle — not be silently discarded by the pandas
    groupby default. Checks both a string key (NULL→None) and a double
    key (NULL→NaN in pandas), that the emitted key is a real Spark
    NULL, and that the NULL group's estimates sit inside the band."""
    rng = np.random.default_rng(19)
    vals = rng.random(6_000) * 100
    rows = [
        (None if i % 3 == 0 else ("a" if i % 2 == 0 else "b"), float(v))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "k string, v double").repartition(4)
    d = Q.quantile_digest(df, "v", ("k",))
    keys = {r.k for r in d.select("k").distinct().collect()}
    assert keys == {None, "a", "b"}
    # weight conservation per group incl. the NULL group
    got_w = {
        r.k: r.w
        for r in d.groupBy("k").agg(F.sum("c_weight").alias("w")).collect()
    }
    want_n = {
        r.k: r.n
        for r in df.groupBy("k").agg(F.count("v").alias("n")).collect()
    }
    assert set(got_w) == set(want_n)
    for k in want_n:
        assert abs(got_w[k] - want_n[k]) < 1e-6, (k, got_w[k], want_n[k])
    exact = {}
    for k in (None, "a", "b"):
        exact[k] = np.sort(
            np.array([v for kk, v in rows if kk == k], dtype="float64")
        )
    _assert_band(_collect_est(Q.digest_quantiles(d, Q.QS, ("k",))), exact)
    # double key: NULL arrives in pandas as NaN; emitted key must be NULL
    dfd = spark.createDataFrame(
        [(None if i % 4 == 0 else 1.0, float(v)) for i, v in enumerate(vals)],
        "k double, v double",
    ).repartition(4)
    dd = Q.quantile_digest(dfd, "v", ("k",))
    dkeys = {r.k for r in dd.select("k").distinct().collect()}
    assert dkeys == {None, 1.0}, dkeys


def test_many_arrow_batches_keep_band(spark):
    """ADVICE r11 (fold depth): a partition spanning MANY Arrow batches
    must still satisfy the documented band — the binomial stack keeps
    the re-chunk depth at log2(batches), not batches. Forces ~40
    batches per partition via arrow.maxRecordsPerBatch and checks the
    band on a skewed distribution in a single partition (worst case:
    every batch folds into one stack)."""
    conf_key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(conf_key, None)
    try:
        spark.conf.set(conf_key, "256")
        rng = np.random.default_rng(23)
        vals = rng.lognormal(0, 2.0, 10_000)
        df = spark.createDataFrame(
            [(float(v),) for v in vals], "v double"
        ).coalesce(1)
        d = Q.quantile_digest(df, "v", (), Q.DELTA)
        # size bound survives the deep fold
        assert d.count() <= 2 * Q.DELTA + 1
        est = _collect_est(Q.digest_quantiles(d, Q.QS, ()), keyed=False)
        _assert_band(est, {None: np.sort(vals)})
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
