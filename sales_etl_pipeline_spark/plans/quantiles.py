"""Mergeable quantile digests — the missing member of the engine's
mergeable-summary family (exact sums/counts: plans/incremental.py; HLL
distinct: incremental_product_summary_hll; Misra–Gries heavy hitters and
bottom-k sampling: plans/llmdata.py / curation.py). The reference
pipeline (a pandas ETL, see plans/parity.py) computes exact interpolated
quartiles on collected data (reference data/etl.py:139-143) — exact
percentiles need a full sort, which at 100 TB means a corpus-grain
shuffle per quantile query. A digest is the standard scale answer: each
partition compresses its values into ≤ ``delta`` weighted centroids, the
centroids merge associatively, and any quantile reads off the merged
centroid relation with bounded rank error.

Variant implemented: the UNIFORM-SCALE t-digest (Dunning & Ertl's k0
scale function) — sorted values are greedily chunked into centroids
capped at ``ceil(n/delta)`` weight, so no centroid holds more than a
1/delta fraction of the mass and the midpoint-rule quantile estimate has
quantile-rank error ≤ 1/delta (the k0 bound; the k1 variant sharpens
tail error, not the worst case). Chosen over GK/KLL because its merge is
a 10-line deterministic re-chunk of the sorted centroid union — easy to
verify, engine-neutral, and the bound survives merging (each merge level
re-caps centroid weight at 1/delta of the merged mass).

Scale shape (the whole point): one ``mapInPandas`` pass produces
partition-local digests (Arrow-batched, numpy sort — no Python row
loop), the shuffle carries ≤ partitions × delta centroid rows regardless
of data size, and the per-key final merge (``applyInPandas``) touches
≤ partitions × delta rows per key. Quantile EXTRACTION is relational:
a cumulative-weight window over the centroid relation + a broadcast
quantile spine + midpoint-rule interpolation via conditional min/max
structs — aggregate-grain, never touching facts.

Error contract (pinned in tests/test_quantiles.py): for every estimate
v̂ at quantile q, the true rank of v̂ lies within q ± RANK_EPS where
RANK_EPS = 2/delta (1/delta from centroid width + 1/delta from the
midpoint interpolation, conservative) — at fold depth 1, i.e. one
chunking pass plus the final per-key merge. Each additional re-chunk
LEVEL can widen the band by up to 1/delta, so the k0 guarantee is
depth-linear, not flat; ``_partial`` therefore folds its per-Arrow-batch
digests through a BINOMIAL STACK (same-size digests merge pairwise), so
a partition spanning B batches costs ≤ ⌈log2 B⌉ extra levels — worst
case (2 + ⌈log2 B⌉ + 1)/delta, not the (B + 2)/delta a sequential fold
would allow. The streaming twins state their own (deeper) fold-depth
bounds in streaming/jobs.py. The fold ≡ recompute property is a BAND
property, not bit-equality — digests are compression, and the test pins
both sides inside the same band plus merge determinism.

NULL semantics: NULL *values* are dropped (SQL aggregate semantics);
NULL *keys* form their own group exactly like Spark groupBy / the
quantile_cont oracle (``dropna=False`` + key normalization below — a
pandas groupby would otherwise silently discard NULL-keyed rows). One
documented narrowing: pandas cannot distinguish NULL from NaN in a
double key column, so NaN keys are normalized to NULL here while Spark
groupBy would keep them distinct — key on non-float columns (or
pre-coalesce NaN) if that distinction matters.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.readers import load_table

#: default centroid budget: rank error ≤ 2/DELTA = 1.56% — tighten by
#: raising delta; the shuffle grows linearly with it
DELTA = 128

#: the quantile spine the registry plans expose (the reference's quartile
#: cuts plus the tail percentile capacity planning asks for)
QS = (0.25, 0.5, 0.75, 0.95)


def _chunk_digest(values, weights, delta: int):
    """Greedy equal-weight chunking of (already sorted) values into
    ≤ ``2*delta`` centroids with per-centroid weight ≤ ceil(total/delta).
    Returns (means, weights) numpy arrays. Deterministic."""
    import numpy as np

    total = float(weights.sum())
    if total <= 0:
        return np.array([]), np.array([])
    cap = max(total / delta, 1e-12)
    means, outw = [], []
    acc_w = 0.0
    acc_vw = 0.0
    for v, w in zip(values, weights):
        w = float(w)
        while w > 0:
            take = min(w, cap - acc_w)
            acc_w += take
            acc_vw += take * float(v)
            w -= take
            if acc_w >= cap - 1e-12:
                means.append(acc_vw / acc_w)
                outw.append(acc_w)
                acc_w = acc_vw = 0.0
    if acc_w > 0:
        means.append(acc_vw / acc_w)
        outw.append(acc_w)
    return np.asarray(means), np.asarray(outw)


def _merge_centroid_arrays(m_list, w_list, delta: int):
    """THE digest merge: concatenate centroid arrays, stable-sort by
    mean, re-chunk under the weight cap. Single definition shared by the
    batch merge, the incremental fold, and both streaming jobs — the
    'one semantics' contract (a tie-rule or cap change lands
    everywhere at once)."""
    import numpy as np

    allm = np.concatenate(m_list)
    allw = np.concatenate(w_list)
    order = np.argsort(allm, kind="stable")
    return _chunk_digest(allm[order], allw[order], delta)


def _norm_key(kv):
    """Map every pandas missing-value representation (None, NaN, NaT)
    back to None so (a) NULL keys from different Arrow batches land in
    ONE dict group (py3.10+ hashes each NaN object by id — two NaNs
    would silently fork the group), and (b) the emitted key round-trips
    through Arrow as a Spark NULL rather than a NaN double (Spark
    groupBy treats NaN as a value, not NULL)."""
    return None if kv is None or pd.isna(kv) else kv


def _spine_estimates(means, weights, qs) -> list[float]:
    """Midpoint-rule quantile estimates from one centroid array — the
    numpy twin of ``digest_quantiles``'s relational extraction, used by
    the streaming emitters."""
    import numpy as np

    total = weights.sum()
    mids = np.cumsum(weights) - weights / 2
    return [float(np.interp(q * total, mids, means)) for q in qs]


def quantile_digest(
    df: DataFrame,
    value_col: str,
    key_cols: tuple[str, ...] = (),
    delta: int = DELTA,
) -> DataFrame:
    """The mergeable digest relation for ``value_col`` per key group:
    (keys..., c_mean double, c_weight double), ≤ ~2·delta centroids per
    key. NULL values are dropped (SQL aggregate semantics). Two passes:
    partition-local digests via ``mapInPandas`` (numpy sort per Arrow
    batch group), then a per-key ``applyInPandas`` merge that re-chunks
    the sorted centroid union under the same weight cap."""
    import numpy as np

    keys = list(key_cols)
    vals = df.select(*keys, F.col(value_col).alias("v")).filter(
        F.col("v").isNotNull()
    )
    out_schema = ", ".join(
        [f"`{k}` {vals.schema[k].dataType.simpleString()}" for k in keys]
        + ["c_mean double", "c_weight double"]
    )

    def _partial(batches):
        # Fold ACROSS Arrow batches (state: per-key BINOMIAL STACK of
        # digests, ≤ ~2·delta rows per stack entry, ≤ log2(batches)+1
        # entries) and emit ONCE per partition — the partition-count
        # shuffle bound the module contract states. Emitting per batch
        # would grow the shuffle with data size; a SEQUENTIAL per-batch
        # fold would keep the shuffle bound but degrade the rank band
        # linearly with batch count (re-chunk depth = batches). The
        # stack merges same-level digests pairwise, so fold depth — and
        # the band — grows with log2(batches) instead (module header).
        state: dict = {}  # normalized key tuple -> [(level, m, w), ...]

        def _push(stack, m, w):
            level = 0
            while stack and stack[-1][0] == level:
                _, pm, pw = stack.pop()
                m, w = _merge_centroid_arrays([pm, m], [pw, w], delta)
                level += 1
            stack.append((level, m, w))

        for pdf in batches:
            if not len(pdf):
                continue
            if keys:
                # dropna=False: NULL-keyed rows are a real group (Spark
                # groupBy / quantile_cont semantics) — the pandas
                # default would silently discard them
                groups = pdf.groupby(keys, sort=False, dropna=False)
            else:
                groups = [((), pdf)]
            for gk, g in groups:
                if keys and not isinstance(gk, tuple):
                    gk = (gk,)
                v = np.sort(g["v"].to_numpy(dtype="float64"))
                bm, bw = _chunk_digest(v, np.ones(len(v)), delta)
                if not len(bm):
                    continue
                gk = tuple(_norm_key(kv) for kv in gk)
                _push(state.setdefault(gk, []), bm, bw)
        frames = []
        for gk, stack in state.items():
            m, w = _merge_centroid_arrays(
                [e[1] for e in stack], [e[2] for e in stack], delta
            )
            f = pd.DataFrame({"c_mean": m, "c_weight": w})
            for k, kv in zip(keys, gk):
                f[k] = kv
            frames.append(f[keys + ["c_mean", "c_weight"]])
        if frames:
            yield pd.concat(frames, ignore_index=True)

    partials = vals.mapInPandas(_partial, out_schema)

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        m, w = _merge_centroid_arrays(
            [pdf["c_mean"].to_numpy()], [pdf["c_weight"].to_numpy()], delta
        )
        out = pd.DataFrame({"c_mean": m, "c_weight": w})
        for k in keys:
            # NULL key arrives as NaN/NaT in pandas; emit a real NULL
            out[k] = _norm_key(pdf[k].iloc[0])
        return out[keys + ["c_mean", "c_weight"]]

    if keys:
        return partials.groupBy(*keys).applyInPandas(_merge, out_schema)
    # global digest: single bounded group (≤ partitions × delta rows)
    return (
        partials.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(
            lambda pdf: _merge(pdf.drop(columns=["_g"])), out_schema
        )
    )


def merge_digest_states(
    *states: DataFrame, key_cols: tuple[str, ...] = (), delta: int = DELTA
) -> DataFrame:
    """Fold any number of digest relations (the incremental-maintenance
    entry point, same contract as incremental.merge_customer_state):
    union the centroid rows and re-chunk per key. Associative up to the
    documented rank-error band."""
    import numpy as np  # noqa: F401  (re-chunk kernel below)

    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    keys = list(key_cols)
    out_schema = ", ".join(
        [
            f"`{k}` {unioned.schema[k].dataType.simpleString()}"
            for k in keys
        ]
        + ["c_mean double", "c_weight double"]
    )

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        m, w = _merge_centroid_arrays(
            [pdf["c_mean"].to_numpy()], [pdf["c_weight"].to_numpy()], delta
        )
        out = pd.DataFrame({"c_mean": m, "c_weight": w})
        for k in keys:
            # NULL key arrives as NaN/NaT in pandas; emit a real NULL
            out[k] = _norm_key(pdf[k].iloc[0])
        return out[keys + ["c_mean", "c_weight"]]

    if keys:
        return unioned.groupBy(*keys).applyInPandas(_merge, out_schema)
    return (
        unioned.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(
            lambda pdf: _merge(pdf.drop(columns=["_g"])), out_schema
        )
    )


def digest_quantiles(
    digest: DataFrame,
    qs: tuple[float, ...] = QS,
    key_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Quantile estimates from a digest relation — fully relational
    midpoint-rule interpolation (no UDF): cumulative-weight window per
    key (centroid-grain, ≤ ~2·delta rows per partition), broadcast
    quantile spine, then per (key, q) the bracketing centroids via
    conditional min/max over (midpoint, mean) structs and linear
    interpolation between their means. Returns (keys..., q, value)."""
    keys = list(key_cols)
    base = Window.partitionBy(*keys) if keys else Window.partitionBy()
    # ROWS frame on purpose: atom-valued data produces runs of centroids
    # TIED on (mean, weight), and the default RANGE frame would give
    # every peer the whole tie-group's cumulative weight — midpoints
    # collapse and the interpolation bracket lands a full atom off.
    # Ordering among exact ties is arbitrary but harmless: tied
    # centroids have equal means, so any bracket drawn from the tie
    # interpolates to the same value.
    w = base.orderBy("c_mean", "c_weight").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = digest.select(
        *keys,
        "c_mean",
        "c_weight",
        (F.sum("c_weight").over(w) - F.col("c_weight") / 2).alias("mid"),
        F.sum("c_weight").over(
            base.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    spark = digest.sparkSession
    spine = F.broadcast(
        spark.createDataFrame([(float(q),) for q in qs], "q double")
    )
    joined = cum.crossJoin(spine).withColumn(
        "target", F.col("q") * F.col("total")
    )
    lo = F.max(
        F.when(
            F.col("mid") <= F.col("target"),
            F.struct(F.col("mid"), F.col("c_mean").alias("m")),
        )
    ).alias("lo")
    hi = F.min(
        F.when(
            F.col("mid") >= F.col("target"),
            F.struct(F.col("mid"), F.col("c_mean").alias("m")),
        )
    ).alias("hi")
    agg = joined.groupBy(*keys, "q").agg(
        lo, hi, F.min("target").alias("target")
    )
    frac = (F.col("target") - F.col("lo.mid")) / (
        F.col("hi.mid") - F.col("lo.mid")
    )
    value = (
        F.when(F.col("lo").isNull(), F.col("hi.m"))
        .when(F.col("hi").isNull(), F.col("lo.m"))
        .when(F.col("hi.mid") == F.col("lo.mid"), F.col("lo.m"))
        .otherwise(F.col("lo.m") + frac * (F.col("hi.m") - F.col("lo.m")))
    )
    return agg.select(*keys, "q", value.alias("value")).orderBy(*keys, "q")


# ---------------------------------------------------------------------------
# registry plans


def approx_order_value_quantiles(
    spark: SparkSession, sf_dir: str, delta: int = DELTA
) -> DataFrame:
    """Per-priority order-value quantiles via the mergeable digest —
    the sketch twin of ``exact_order_value_quantiles``. Rows-only by
    design (a digest is compression, not SQL-expressible); the rank-
    error band and fold ≡ recompute gates live in
    tests/test_quantiles.py. Returns (o_orderpriority, q, value)."""
    orders = load_table(spark, sf_dir, "orders")
    d = quantile_digest(
        orders, "o_totalprice", ("o_orderpriority",), delta
    )
    return digest_quantiles(d, QS, ("o_orderpriority",))


def exact_order_value_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The exact interpolated-percentile baseline the digest is judged
    against — same spine, same grouping, Spark ``percentile`` ≡ DuckDB
    ``quantile_cont`` (both linear interpolation over the sorted set;
    the same cross-engine contract plans/parity.py's D3 quartile
    segmentation relies on). The full-sort-per-group cost this pays is
    exactly what the digest plan avoids at scale."""
    orders = load_table(spark, sf_dir, "orders")
    aggs = [
        F.percentile("o_totalprice", float(q)).alias(f"q{int(q * 100)}")
        for q in QS
    ]
    return (
        orders.groupBy("o_orderpriority")
        .agg(*aggs)
        .orderBy("o_orderpriority")
    )


EXACT_QUANTILES_SQL = """
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.25) AS q25,
           quantile_cont(o_totalprice, 0.50) AS q50,
           quantile_cont(o_totalprice, 0.75) AS q75,
           quantile_cont(o_totalprice, 0.95) AS q95
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""

#: library tier this round (the driver registry is at its 50-slot cap;
#: candidates for the r12 rotation cohort)
LIBRARY_QUERIES = {
    "approx_order_value_quantiles": approx_order_value_quantiles,
    "exact_order_value_quantiles": exact_order_value_quantiles,
}

LIBRARY_ORACLE = {
    "exact_order_value_quantiles": EXACT_QUANTILES_SQL,
}
