"""Incremental aggregate maintenance: keep the reference's customer
summary (SURVEY.md §2.3 A1 + §2.4 D1–D3, reference data/etl.py:109-148)
up to date under append-only ingest WITHOUT re-reading history — the
materialized-view-maintenance pattern a daily 100-TB warehouse load runs,
where the reference's answer is a full recompute of every summary on
every run (data/etl.py:238-260).

Design — split the summary into a MERGEABLE STATE and a FINALIZE pass:

- ``customer_state(batch)`` reduces one ingest batch (order-grain rows)
  to per-customer partials where every field has an exact merge function:
  counts sum, DECIMAL(38,10) revenue/quantity sums add associatively
  (the same exactness contract as functions.core.dsum — kept as decimal
  in the state so re-quantization never happens), first/last purchase
  min/max, country min. State is customer-grain: orders of magnitude
  smaller than the fact tables it summarizes.
- ``merge_customer_state(*states)`` folds any number of batch states (or
  a persisted state with a new delta) by key — one shuffle at state
  grain, never touching history.
- ``finalize_customer_summary(state)`` derives the non-mergeable outputs
  at customer grain: avg order value, tenure days, and the pandas-qcut
  quartile segmentation (exact interpolated percentiles over the merged
  grain, same as plans/parity.customer_summary). Cheap at any scale —
  the grain is #customers.

Correctness invariant (documented, required): ingest batches PARTITION
the order log at order grain — each order, with all its lineitems,
arrives in exactly one batch, and arrives exactly once (the reference's
source is an immutable transaction log, so this holds by construction;
for at-least-once transports, run plans/llmdata.incremental_exact_dedup
on order keys first). Under it, per-batch ``count(DISTINCT o_orderkey)``
partials sum to the global distinct count — the one aggregate in the
summary that is NOT mergeable in general becomes mergeable exactly.
Updates/deletes are out of scope here by design: that is the CDC surface
(plans/cdc.merge_snapshot) — this module is the append-only fast path.

The registry plan is self-verifying the same way cdc_incremental_merge
is: it splits the corpus at ``ORDER_CUTOFF``, folds base + delta states,
finalizes, and must equal plans/parity.customer_summary's full recompute
bit-for-bit — its oracle IS the full-recompute SQL.
tests/test_operators.py additionally pins the fold across 3 batches ≡
the one-shot plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.core import DEC, oracle_dsum
from ..sources.readers import load_table
from .llmdata import _pin
from .parity import ORACLE as _PARITY_ORACLE, _non_cancelled_orders

#: order-date boundary splitting the base state from the delta batch in
#: the self-verifying library plan (orders span 1995-01-01..2001-08-01 at
#: every sf, so both sides are non-empty)
ORDER_CUTOFF = "1998-01-01 00:00:00"

#: the mergeable per-customer state schema (all exact-merge fields)
STATE_COLS = (
    "customer_id",
    "total_orders",  # long — sums across batches (order-partition invariant)
    "rev_dec",  # decimal(38,10) — associative exact revenue sum
    "items_dec",  # decimal(38,10), nullable — exact quantity sum
    "first_purchase",  # min-merge
    "last_purchase",  # max-merge
    "country",  # min-merge (functionally dependent on customer anyway)
)


def order_grain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ingest-batch input relation at order grain: non-cancelled
    orders with their per-order lineitem quantity (decimal), customer's
    nation joined in. One row per order — the unit an append-only ingest
    delivers, and the grain whose partitioning the state fold requires."""
    orders = _non_cancelled_orders(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    items = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("order_qty"))
    )
    return (
        orders.join(items, orders.o_orderkey == items.l_orderkey, "left")
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            "o_custkey", "o_orderkey", "o_totalprice", "o_orderdate",
            "n_name", "order_qty",
        )
    )


def customer_state(batch: DataFrame) -> DataFrame:
    """Reduce one order-grain ingest batch to mergeable per-customer
    partials. Distinct-order counting relies on the order-partition
    invariant (module docstring); revenue/items stay DECIMAL so merging
    never re-quantizes."""
    return batch.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.countDistinct("o_orderkey").alias("total_orders"),
        F.sum(F.col("o_totalprice").cast(DEC)).alias("rev_dec"),
        F.sum("order_qty").alias("items_dec"),
        F.min("o_orderdate").alias("first_purchase"),
        F.max("o_orderdate").alias("last_purchase"),
        F.min("n_name").alias("country"),
    )


def merge_customer_state(*states: DataFrame) -> DataFrame:
    """Fold batch states (or persisted state + delta state) by key. Every
    merge is exact: long sums, decimal sums (associative), min/max. One
    shuffle at customer grain."""
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    return unioned.groupBy("customer_id").agg(
        F.sum("total_orders").alias("total_orders"),
        F.sum("rev_dec").alias("rev_dec"),
        F.sum("items_dec").alias("items_dec"),
        F.min("first_purchase").alias("first_purchase"),
        F.max("last_purchase").alias("last_purchase"),
        F.min("country").alias("country"),
    )


def finalize_customer_summary(state: DataFrame) -> DataFrame:
    """Derive the full customer summary from merged state: the decimal
    sums surface as doubles exactly once (same cast point as
    functions.core.dsum), derived metrics and the exact-qcut quartile
    segmentation run at customer grain. Output schema/values identical to
    plans/parity.customer_summary."""
    agg = state.select(
        "customer_id",
        "total_orders",
        F.col("rev_dec").cast("double").alias("total_revenue"),
        F.col("items_dec").cast("double").alias("total_items"),
        "first_purchase",
        "last_purchase",
        "country",
        (F.col("rev_dec").cast("double") / F.col("total_orders")).alias(
            "avg_order_value"
        ),
    )
    agg = _pin(agg)
    quartiles = agg.agg(
        F.percentile("total_revenue", 0.25).alias("q1"),
        F.percentile("total_revenue", 0.50).alias("q2"),
        F.percentile("total_revenue", 0.75).alias("q3"),
    )
    return (
        agg.crossJoin(F.broadcast(quartiles))
        .withColumn(
            "days_since_first", F.datediff("last_purchase", "first_purchase")
        )
        .withColumn(
            "segment",
            F.when(F.col("total_revenue") <= F.col("q1"), "Bronze")
            .when(F.col("total_revenue") <= F.col("q2"), "Silver")
            .when(F.col("total_revenue") <= F.col("q3"), "Gold")
            .otherwise("Platinum"),
        )
        .drop("q1", "q2", "q3")
        .select(
            "customer_id", "total_orders", "total_revenue", "total_items",
            "first_purchase", "last_purchase", "country", "avg_order_value",
            "days_since_first", "segment",
        )
    )


def incremental_customer_summary(
    spark: SparkSession, sf_dir: str, *, cutoff: str = ORDER_CUTOFF
) -> DataFrame:
    """Self-verifying incremental maintenance: state(orders before
    ``cutoff``) merged with state(orders at/after ``cutoff``), finalized —
    must equal the full customer_summary recompute bit-for-bit (the
    oracle is the full-recompute SQL). Work per ingest is delta-grain +
    a state-grain merge; history is never re-read."""
    grain = order_grain(spark, sf_dir)
    cutoff_ts = F.to_timestamp(F.lit(cutoff))
    base = customer_state(grain.filter(F.col("o_orderdate") < cutoff_ts))
    delta = customer_state(grain.filter(F.col("o_orderdate") >= cutoff_ts))
    return finalize_customer_summary(merge_customer_state(base, delta))


# ---------------------------------------------------------------------------
# Product summary: the NON-mergeable-distinct case.
#
# customer_summary's one distinct count becomes mergeable through the
# order-partition invariant (each order in exactly one batch). The product
# summary's ``unique_customers`` = count(DISTINCT o_custkey) per part does
# NOT: the same customer can buy the same part in many batches, so batch
# counts over-count. The standard maintenance answer is an AUXILIARY STATE
# at the distinct grain itself — the (partkey, custkey) pair set — merged
# by set-union; the count is derived at finalize. Pair-set state is
# bounded by #distinct pairs (≪ lineitem rows; it is exactly the relation
# the full recompute's distinct-aggregate shuffle materializes anyway) and
# the union dedups on the pair key — a delta-grain shuffle per ingest.
# ``order_count`` per part IS mergeable (distinct orders partition across
# batches), as are the decimal sums and the avg's (sum, count) pair.
# ---------------------------------------------------------------------------


def _line_grain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-batch input at lineitem grain joined to its (non-cancelled)
    order — the rows one order-partitioned batch delivers."""
    orders = _non_cancelled_orders(spark, sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)


def product_state(batch: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Reduce one lineitem-grain batch to the two product-state relations:
    per-part mergeable partials, and the distinct (part, customer) pair
    set that makes unique_customers maintainable."""
    sums = batch.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast(DEC)).alias("qty_dec"),
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
        ).alias("rev_dec"),
        F.sum(F.col("l_extendedprice").cast(DEC)).alias("price_dec"),
        F.count("l_extendedprice").alias("n_price"),
        F.countDistinct("l_orderkey").alias("order_count"),
    )
    # countDistinct ignores NULLs — keep the pair-set semantics identical
    pairs = (
        batch.filter(F.col("o_custkey").isNotNull())
        .select("l_partkey", "o_custkey")
        .distinct()
    )
    return sums, pairs


def merge_product_state(
    *states: tuple[DataFrame, DataFrame],
) -> tuple[DataFrame, DataFrame]:
    """Fold product states: per-part partials merge by sums; the pair sets
    merge by union + distinct (dedup on the pair key — the same shuffle
    key as the state, so successive merges co-locate under bucketing)."""
    sums = states[0][0]
    pairs = states[0][1]
    for s, p in states[1:]:
        sums = sums.unionByName(s)
        pairs = pairs.unionByName(p)
    merged_sums = sums.groupBy("l_partkey").agg(
        F.sum("qty_dec").alias("qty_dec"),
        F.sum("rev_dec").alias("rev_dec"),
        F.sum("price_dec").alias("price_dec"),
        F.sum("n_price").alias("n_price"),
        F.sum("order_count").alias("order_count"),
    )
    return merged_sums, pairs.distinct()


def finalize_product_summary(
    state: tuple[DataFrame, DataFrame], part: DataFrame
) -> DataFrame:
    """Derive the full product summary: distinct-pair state collapses to
    unique_customers, decimal state surfaces as doubles once (dsum/davg
    cast points), part dimension broadcast in. Output schema/values
    identical to plans/parity.product_summary."""
    sums, pairs = state
    uniq = pairs.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("unique_customers")
    )
    return (
        sums.join(uniq, "l_partkey")
        .join(
            F.broadcast(part.select("p_partkey", "p_name")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            "p_partkey",
            "p_name",
            F.col("qty_dec").cast("double").alias("total_quantity"),
            F.col("rev_dec").cast("double").alias("total_revenue"),
            "order_count",
            "unique_customers",
            (F.col("price_dec").cast("double") / F.col("n_price")).alias(
                "avg_unit_price"
            ),
        )
    )


def incremental_product_summary(
    spark: SparkSession, sf_dir: str, *, cutoff: str = ORDER_CUTOFF
) -> DataFrame:
    """Self-verifying incremental product-summary maintenance: fold the
    two-relation state over the base/delta order split and finalize —
    must equal plans/parity.product_summary's full recompute bit-for-bit
    (the oracle is the full-recompute SQL)."""
    grain = _line_grain(spark, sf_dir)
    cutoff_ts = F.to_timestamp(F.lit(cutoff))
    base = product_state(grain.filter(F.col("o_orderdate") < cutoff_ts))
    delta = product_state(grain.filter(F.col("o_orderdate") >= cutoff_ts))
    part = load_table(spark, sf_dir, "part")
    return finalize_product_summary(merge_product_state(base, delta), part)


# ---------------------------------------------------------------------------
# Bounded-state distinct maintenance (VERDICT r9 item 7)
#
# The exact pair-set state above is ~fact-grain: every distinct
# (part, customer) pair lives in the state forever, so at 100 TB the
# distinct-maintenance state becomes a second fact table (measured
# honestly in BASELINE.md: 28.6 s / 14× at the 100× corpus). Exactness
# is required for oracle parity — but the regime where exact distinct
# maintenance is the scale-killer needs the BOUNDED-STATE alternative:
# a DataSketches HLL sketch per part (Spark's hll_sketch_agg — a
# fixed-size register array regardless of cardinality) whose merge
# (hll_union_agg = register-wise max) is associative, commutative and
# batching-invariant, the same mergeable-state contract as the decimal
# partials. State size: parts × 2^lg_k bytes, CONSTANT in fact count.
# Approximate by construction → library tier rows-only, with the
# error-band + batching-invariance gates pinned in
# tests/test_operators.py (the approx_heavy_hitters pattern).

#: HLL precision: 2^12 registers ≈ 1.6 % relative standard error —
#: and DataSketches keeps an exact coupon list below ~0.75·2^lg_k
#: distinct items, so small per-key cardinalities estimate EXACTLY
HLL_LG_K = 12


def product_state_hll(
    batch: DataFrame, lg_k: int = HLL_LG_K
) -> tuple[DataFrame, DataFrame]:
    """Reduce one lineitem-grain batch to (exact per-part partials,
    per-part HLL customer sketches) — the bounded-state twin of
    ``product_state``: identical sums relation, but the unbounded
    distinct-pair set is replaced by a fixed-size sketch per part."""
    sums, _ = product_state(batch)
    hll = (
        batch.filter(F.col("o_custkey").isNotNull())
        .groupBy("l_partkey")
        .agg(F.hll_sketch_agg("o_custkey", F.lit(lg_k)).alias("cust_hll"))
    )
    return sums, hll


def merge_product_state_hll(
    *states: tuple[DataFrame, DataFrame],
) -> tuple[DataFrame, DataFrame]:
    """Fold bounded product states: sums merge exactly as before; the
    sketches merge by ``hll_union_agg`` at part grain — register-wise
    max, so the merged sketch is IDENTICAL whatever the batching (the
    batching-invariance the exact path gets from set union, kept)."""
    sums = states[0][0]
    hll = states[0][1]
    for s, h in states[1:]:
        sums = sums.unionByName(s)
        hll = hll.unionByName(h)
    merged_sums = sums.groupBy("l_partkey").agg(
        F.sum("qty_dec").alias("qty_dec"),
        F.sum("rev_dec").alias("rev_dec"),
        F.sum("price_dec").alias("price_dec"),
        F.sum("n_price").alias("n_price"),
        F.sum("order_count").alias("order_count"),
    )
    merged_hll = hll.groupBy("l_partkey").agg(
        F.hll_union_agg("cust_hll").alias("cust_hll")
    )
    return merged_sums, merged_hll


def finalize_product_summary_hll(
    state: tuple[DataFrame, DataFrame], part: DataFrame
) -> DataFrame:
    """Finalize the bounded state: ``hll_sketch_estimate`` surfaces the
    sketch as ``unique_customers`` (approximate; exact below the coupon
    threshold); every other column is the exact twin's value."""
    sums, hll = state
    uniq = hll.select(
        "l_partkey",
        F.hll_sketch_estimate("cust_hll").alias("unique_customers"),
    )
    return (
        sums.join(uniq, "l_partkey")
        .join(
            F.broadcast(part.select("p_partkey", "p_name")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            "p_partkey",
            "p_name",
            F.col("qty_dec").cast("double").alias("total_quantity"),
            F.col("rev_dec").cast("double").alias("total_revenue"),
            "order_count",
            "unique_customers",
            (F.col("price_dec").cast("double") / F.col("n_price")).alias(
                "avg_unit_price"
            ),
        )
    )


def incremental_product_summary_hll(
    spark: SparkSession, sf_dir: str, *, cutoff: str = ORDER_CUTOFF
) -> DataFrame:
    """Bounded-state incremental product summary: the base/delta fold of
    ``incremental_product_summary`` with HLL distinct state. Opt-in —
    the exact path stays the default and the oracle-parity surface;
    this is the variant a 100-TB deployment runs when the exact pair
    state itself is the bottleneck."""
    grain = _line_grain(spark, sf_dir)
    cutoff_ts = F.to_timestamp(F.lit(cutoff))
    base = product_state_hll(grain.filter(F.col("o_orderdate") < cutoff_ts))
    delta = product_state_hll(grain.filter(F.col("o_orderdate") >= cutoff_ts))
    part = load_table(spark, sf_dir, "part")
    return finalize_product_summary_hll(
        merge_product_state_hll(base, delta), part
    )


#: No driver-registry entries (50-cap, COVERAGE.md) — library tier,
#: oracle-checked every pytest run by tests/test_library_parity.py.
QUERIES: dict = {}
ORACLE: dict = {}

# ---------------------------------------------------------------------------
# Two-sided incremental JOIN-view maintenance: V = facts ⋈ dim, grouped.
#
# The summaries above fold APPEND-ONLY fact deltas. A joined view has a
# second delta stream — DIMENSION UPDATES — and the naive approach
# (incrementally adjust the view's OUTPUT by the delta rows) silently
# corrupts it: when a customer moves nation, every dollar of their
# HISTORICAL revenue must move with them, and the view output alone no
# longer contains enough information to do that. The classic IVM fix is
# auxiliary state at the JOIN-KEY grain:
#
# - ``fact_rev_state``: per-customer order/revenue partials (mergeable,
#   exactly like customer_state) — the fact side collapsed to key grain;
# - ``dim_assignment_state``: the customer→nation assignment as a
#   latest-wins CDC fold (seq-versioned, merge = max-seq per key);
# - ``finalize_nation_revenue``: re-joins the two states at KEY grain
#   (#customers rows, never fact-grain) and re-aggregates per nation.
#
# Any interleaving of fact batches and dim updates folds to the same
# state, and finalize ≡ the full recompute over (all orders) ⋈ (latest
# dim) — dim updates retroactively re-home historical revenue, which is
# the semantics a JOIN view actually has. State size: 2 × key grain,
# bounded regardless of fact history (the incremental_product_summary
# distinct-pair caveat does not apply — no distinct maintenance here).


def fact_rev_state(batch: DataFrame) -> DataFrame:
    """Collapse one order-grain fact batch to per-customer mergeable
    partials: (customer_id, n_orders, rev_dec). Requires the same
    order-partition invariant as customer_state (module docstring)."""
    return batch.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.countDistinct("o_orderkey").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(DEC)).alias("rev_dec"),
    )


def merge_fact_rev_state(*states: DataFrame) -> DataFrame:
    """Fold fact-side states by key — long/decimal sums, exact."""
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    return unioned.groupBy("customer_id").agg(
        F.sum("n_orders").alias("n_orders"),
        F.sum("rev_dec").alias("rev_dec"),
    )


def merge_dim_assignment(*states: DataFrame) -> DataFrame:
    """Latest-wins fold of dimension-assignment deltas
    (customer_id, nationkey, seq): the newest seq per key wins — the
    same upsert semantics as plans/cdc.merge_snapshot, kept here in
    mergeable-state shape so dim updates fold exactly like fact
    batches. ``seq`` must be strictly increasing per key across deltas
    (the CDC source's change ordinal)."""
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    return (
        unioned.groupBy("customer_id")
        .agg(
            F.max(F.struct("seq", "nationkey")).alias("__w")
        )
        .select(
            "customer_id",
            F.col("__w.nationkey").alias("nationkey"),
            F.col("__w.seq").alias("seq"),
        )
    )


def finalize_nation_revenue(
    rev_state: DataFrame, dim_state: DataFrame, nation: DataFrame
) -> DataFrame:
    """Re-derive the joined view from the two key-grain states: one
    key-grain join + one nation-grain aggregate — never a fact scan.
    Output: (nation, total_orders, total_revenue) sorted by nation."""
    per_nation = (
        rev_state.join(dim_state, "customer_id")
        .groupBy("nationkey")
        .agg(
            F.sum("n_orders").alias("total_orders"),
            F.sum("rev_dec").alias("rev_dec"),
        )
    )
    named = nation.select(
        F.col("n_nationkey").cast("int").alias("nationkey"), "n_name"
    )
    return (
        per_nation.join(F.broadcast(named), "nationkey")
        .select(
            F.col("n_name").alias("nation"),
            "total_orders",
            F.col("rev_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("nation")
    )


def incremental_nation_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Self-verifying two-sided IVM plan: fold the order log as two fact
    batches split at ORDER_CUTOFF, apply a deterministic dimension
    update BETWEEN them (every customer with c_custkey % 10 == 0 moves
    to nation (c_nationkey + 1) % 25, seq=1), and finalize. The oracle
    is the full recompute over all orders joined to the UPDATED
    dimension — including the moved customers' pre-update revenue,
    which is exactly what output-delta maintenance gets wrong."""
    orders = _non_cancelled_orders(spark, sf_dir).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    b1 = orders.filter(F.col("o_orderdate") < F.lit(ORDER_CUTOFF))
    b2 = orders.filter(F.col("o_orderdate") >= F.lit(ORDER_CUTOFF))
    rev = merge_fact_rev_state(fact_rev_state(b1), fact_rev_state(b2))

    customer = load_table(spark, sf_dir, "customer")
    dim0 = customer.select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_nationkey").cast("int").alias("nationkey"),
        F.lit(0).alias("seq"),
    )
    delta = customer.filter(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("customer_id"),
        ((F.col("c_nationkey") + 1) % 25).cast("int").alias("nationkey"),
        F.lit(1).alias("seq"),
    )
    dim = merge_dim_assignment(dim0, delta)
    nation = load_table(spark, sf_dir, "nation")
    return finalize_nation_revenue(rev, dim, nation)


_NATION_REVENUE_ORACLE = f"""
    WITH cust AS (
        SELECT c_custkey,
               CAST(CASE WHEN c_custkey % 10 = 0
                         THEN (c_nationkey + 1) % 25
                         ELSE c_nationkey END AS INTEGER) AS nk
        FROM customer
    )
    SELECT n_name AS nation,
           COUNT(DISTINCT o_orderkey) AS total_orders,
           {oracle_dsum('o_totalprice')} AS total_revenue
    FROM orders
    JOIN cust ON o_custkey = c_custkey
    JOIN nation ON nk = CAST(n_nationkey AS INTEGER)
    WHERE NOT starts_with(o_orderstatus, 'F')
    GROUP BY n_name
    ORDER BY n_name
"""


LIBRARY_QUERIES = {
    "incremental_customer_summary": incremental_customer_summary,
    "incremental_product_summary": incremental_product_summary,
    # rows-only (approximate by construction): error-band + fold-
    # invariance gates in tests/test_operators.py
    "incremental_product_summary_hll": incremental_product_summary_hll,
    "incremental_nation_revenue": incremental_nation_revenue,
}

#: the oracle for each incremental path is deliberately the SAME
#: full-recompute SQL as the plans/parity plan it maintains
LIBRARY_ORACLE = {
    "incremental_customer_summary": _PARITY_ORACLE["customer_summary"],
    "incremental_product_summary": _PARITY_ORACLE["product_summary"],
    "incremental_nation_revenue": _NATION_REVENUE_ORACLE,
}
