"""TPC-H-shaped join/subquery breadth beyond the Q1/Q3/Q4/Q5/Q10/Q13/Q22
shapes already in plans/analytics.py (reference README.md:131-154 frames
these ad-hoc analytics as the pipeline's downstream query surface).

Each plan is the standard TPC-H query pattern adapted to the driver's
star schema (TESTDATA.md — no partsupp table, so Q9's supply cost is a
retail-price proxy and the partsupp queries Q2/Q11/Q16/Q20 read their
supply facts from lineitem instead). With this module every one of the
22 TPC-H query SHAPES has an implementation in the engine (Q1/Q3/Q4/Q5/
Q10/Q13 + the correlated-Q22 form live in plans/analytics.py &
plans/parity.py). The point of the family is optimizer/physical
breadth, each shape exercising a distinct Catalyst path at
100-TB-relevant grain:

- Q2  min_cost_supplier        correlated MIN over a 4-dim join,
                               decorrelated to a per-part min joined
                               back on cost equality; top-100
- Q6  forecast_revenue         pure pushdown: one filtered scan, one
                               global exact sum
- Q7  nation_trade_volume      self-joined dimension (nation ×2 aliases)
- Q8  nation_market_share      conditional-aggregate ratio over a region
- Q9  product_type_profit      5-table join + per-row profit expression
- Q11 important_part_value     part-grain agg HAVING > fraction × a
                               1-row global scalar (broadcast, no
                               second fact scan)
- Q12 ship_lag_priority        CASE bucketing + conditional counts
- Q14 promo_revenue_share      global conditional-revenue ratio
- Q16 supplier_part_variety    negated predicates + NOT-IN broadcast
                               anti join + per-group distinct count
- Q17 small_quantity_revenue   correlated scalar subquery, decorrelated
                               to a broadcast per-part aggregate
- Q15 top_supplier_revenue     argmax-with-ties via window max over an
                               aggregate (the view + subquery in the
                               original), all ties returned
- Q18 large_volume_customers   HAVING on a fact-grain agg, joined back
- Q19 disjunctive_part_revenue OR-of-conjunctions predicate pushdown
- Q20 excess_share_suppliers   nested two-level agg over one fact scan
                               + share filter + semi join
- Q21 waiting_suppliers        multi-level agg + unique-max qualify
- Q22 dormant_customer_balance 1-row scalar broadcast + anti join +
                               group agg (global variant; correlated
                               variant = analytics.above_avg_balance)

Scale notes: every join's small side (part at 1/30 of lineitem, nation,
supplier) is broadcast; the only fact-grain shuffles are the group-bys
on lineitem keys, which AQE coalesces. Q17's decorrelation is the
canonical rewrite — the per-part average is aggregate-grain (one row
per part), broadcast back instead of re-scanning lineitem per row.
Q21 keeps everything at (orderkey, suppkey) grain: two hash aggregates
and one window, no self-join of raw lineitem.

Exactness: money sums via dsum (DECIMAL(38,10) exact sum, cast back to
double — functions/core.py:34); ratios are double divisions of two
exact sums, the identical op tree on both engines; thresholds compare
exact-sum-derived doubles, so no boundary row can flip between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.core import dsum, davg, oracle_dsum, oracle_davg
from ..sources.readers import load_table
from .llmdata import _pin, release_plan_caches

_REVENUE = "l_extendedprice * (1 - l_discount)"


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: yearly shipped revenue between two nations, in both
    directions — supplier nation × customer nation via two broadcast
    aliases of the same dimension."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    rpair = (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair | rpair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(dsum(_rev()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_1 suppliers' share of all revenue delivered
    to ASIA customers, per order year — conditional-aggregate ratio of two
    exact sums (identical double division on both engines)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    n_cust = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(region), F.col("c_rkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
    )
    target = F.when(F.col("supp_nation") == "NATION_1", _rev()).otherwise(F.lit(0.0))
    return (
        joined.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (dsum(target) / dsum(_rev())).alias("mkt_share"),
            dsum(_rev()).alias("total_revenue"),
        )
        .orderBy("o_year")
    )


def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation × year for parts whose
    name contains 'widget'. No partsupp in this schema, so unit cost is
    the 60%-of-retail proxy: amount = l_extendedprice·(1−l_discount) −
    0.6·p_retailprice·l_quantity — a fixed per-row double expression,
    identical op tree on both engines, then exact-summed."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    amount = _rev() - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(dsum(amount).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def ship_lag_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: order-priority mix per ship-lag bucket. The
    schema has no shipmode/commitdate, so the bucketing key is the
    integer day lag datediff(l_shipdate, o_orderdate): ≥90 'late',
    0–89 'normal', <0 'preship' (synthetic data ships before the order
    date — kept as its own bucket rather than hidden)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(lag >= 90, F.lit("late"))
        .when(lag >= 0, F.lit("normal"))
        .otherwise(F.lit("preship"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(bucket.alias("lag_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("lag_bucket")
    )


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: PROMO parts' percentage of shipped revenue per
    ship year — 100·Σ(case)/Σ, both sums exact, one broadcast join."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0.0))
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy(F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(
            (F.lit(100.0) * dsum(promo) / dsum(_rev())).alias("promo_share"),
            dsum(promo).alias("promo_revenue"),
        )
        .orderBy("l_year")
    )


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: yearly-averaged revenue from Brand#2/SMALL line
    items whose quantity is under 20% of that part's average quantity.

    The correlated scalar subquery (avg(l_quantity) per part over the
    same fact table) is decorrelated by hand into an aggregate-grain
    per-part relation joined back broadcast — the exact rewrite Catalyst
    would have to produce, stated explicitly so the plan is one fact scan
    + one aggregate + one broadcast join. The per-part average is davg
    (exact sum / count) so the 0.2·avg threshold is bit-identical on
    both engines and no boundary row can flip."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#2") & (F.col("p_type") == "SMALL")
    )
    part_avg = (
        lineitem.groupBy("l_partkey").agg(davg("l_quantity").alias("avg_qty"))
    )
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .join(F.broadcast(part_avg), "l_partkey")
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg((dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum shipped revenue in
    the first quarter of 1995 — the original's revenue view + scalar
    max subquery collapsed to one window max over the supplier-grain
    aggregate (one fact scan, one agg shuffle, one 1-row broadcast scalar
    max joined back — NOT an unpartitioned window, which would collapse
    the supplier-grain relation to a single partition). Revenue stays
    DECIMAL through the comparison so the max test is exact on both
    engines and every tie survives identically."""
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1995-01-01", "1995-03-31")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    per_supp = lineitem.groupBy("l_suppkey").agg(
        F.sum(_rev().cast("decimal(38,10)")).alias("rev_dec")
    )
    max_rev = per_supp.agg(F.max("rev_dec").alias("max_rev"))
    best = per_supp.join(F.broadcast(max_rev)).filter(
        F.col("rev_dec") == F.col("max_rev")
    )
    return (
        best.join(F.broadcast(supplier), best.l_suppkey == supplier.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("rev_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds 150, with the
    customer — HAVING on a fact-grain aggregate, joined back to orders and
    customer; top 100 with a deterministic (totalprice, orderdate,
    orderkey) tiebreak so LIMIT is engine-stable."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


def disjunctive_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of three brand/size/quantity
    conjunctions — the disjunctive-predicate pushdown test (Catalyst
    extracts p_size ≤ 50 ∧ l_quantity ≤ 50 style common bounds below the
    join)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q, sz = F.col("l_quantity"), F.col("p_size")
    c1 = (F.col("p_brand") == "Brand#2") & sz.between(1, 15) & q.between(1, 20)
    c2 = (F.col("p_brand") == "Brand#19") & sz.between(10, 30) & q.between(10, 30)
    c3 = (F.col("p_type") == "PROMO") & sz.between(20, 50) & q.between(20, 50)
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .filter(c1 | c2 | c3)
        .agg(
            dsum(_rev()).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the UNIQUE last shipper on a
    finished multi-supplier order (no commit/receipt dates in this
    schema, so 'kept the order waiting' = strictly latest max shipdate
    among the order's suppliers).

    Grain discipline for 100 TB: the raw fact collapses to (orderkey,
    suppkey) in one hash aggregate; the per-order max / supplier count /
    unique-max qualify are windows over that aggregate — never a
    self-join of raw lineitem (the naive EXISTS/NOT-EXISTS form is two
    correlated fact self-joins)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supplier = load_table(spark, sf_dir, "supplier")
    per_os = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("last_ship"))
    )
    w = Window.partitionBy("l_orderkey")
    qualified = (
        per_os.withColumn("max_ship", F.max("last_ship").over(w))
        .withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn(
            "n_at_max",
            F.sum(
                F.when(F.col("last_ship") == F.col("max_ship"), 1).otherwise(0)
            ).over(w),
        )
        .filter(
            (F.col("n_supp") >= 2)
            & (F.col("last_ship") == F.col("max_ship"))
            & (F.col("n_at_max") == 1)
        )
    )
    return (
        qualified.join(
            F.broadcast(supplier), qualified.l_suppkey == supplier.s_suppkey
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each small STANDARD part, the AMERICA
    supplier(s) offering the minimum unit price (no partsupp table in
    this schema, so supply cost = the supplier's lowest observed
    l_extendedprice / l_quantity for the part — reference README.md's
    ad-hoc supplier-sourcing analytics). The original's correlated MIN
    subquery is decorrelated the canonical way: a (part)-grain minimum
    aggregate joined back on cost equality — never a per-row re-scan.
    Ties all survive; the unique (acctbal desc, partkey, suppkey) sort +
    LIMIT 100 pins TakeOrderedAndProject.

    Exactness: unit price is the identical double division on both
    engines; MIN over doubles is exact; the equality join-back compares
    the same bits. The offers relation feeds BOTH the per-part minimum
    and the join-back, so it is pinned — one fact scan, not two."""
    release_plan_caches()
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    )
    region_supp = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    offers = _pin(
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .join(
            F.broadcast(region_supp.select("s_suppkey", "s_name", "s_acctbal", "n_name")),
            lineitem.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(
            F.min(
                F.col("l_extendedprice") / F.col("l_quantity")
            ).alias("unit_cost")
        )
    )
    per_part_min = offers.groupBy(F.col("p_partkey").alias("mk")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    return (
        offers.join(
            F.broadcast(per_part_min),
            (offers.p_partkey == F.col("mk"))
            & (offers.unit_cost == F.col("min_cost")),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost"
        )
        .orderBy(F.desc("s_acctbal"), "p_partkey", "s_suppkey")
        .limit(100)
    )


def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the what-if discount-revenue scalar — one filtered
    scan, one global exact sum, every predicate (date range, discount
    band, quantity bound) pushable into the parquet scan. The simplest
    query in the family and the purest pushdown test: at 100 TB this
    must read only row groups whose min/max stats survive the filters."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.04, 0.06))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "forecast_revenue"
            )
        )
    )


def important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose shipped value through EUROPE
    suppliers exceeds a fixed fraction of that region's total — a
    part-grain aggregate filtered against a 1-row global scalar
    (broadcast cross join). The part-grain relation feeds BOTH the
    output rows and the global-total re-aggregate, so it is pinned
    (persist + release_plan_caches discipline, plans/llmdata.py:286) —
    one fact scan total, not one per consumer; the total itself is a
    tree-aggregate over the (small) pinned relation, never an
    unpartitioned window over it. The threshold compares doubles
    derived from exact DECIMAL sums via the identical
    ``value > 0.0005 * total`` op tree on both engines."""
    release_plan_caches()
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    scoped_supp = (
        supplier.join(
            F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey")
    )
    scoped = lineitem.join(
        F.broadcast(scoped_supp), lineitem.l_suppkey == F.col("s_suppkey")
    )
    per_part = _pin(
        scoped.groupBy("l_partkey").agg(
            F.sum(F.col("l_extendedprice").cast("decimal(38,10)")).alias(
                "val_dec"
            )
        )
    )
    total = per_part.agg(F.sum("val_dec").alias("total_dec"))
    return (
        per_part.join(F.broadcast(total))
        .filter(
            F.col("val_dec").cast("double")
            > F.lit(0.0005) * F.col("total_dec").cast("double")
        )
        .select(
            "l_partkey", F.col("val_dec").cast("double").alias("part_value")
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


def supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can source each
    (brand, type, size) bucket — negated predicates on the part side,
    an anti-join exclusion list on the supplier side (no comment column,
    so 'customer complaints' = s_acctbal < 1000), and a distinct count
    per group. The exclusion list is supplier-grain → broadcast anti
    join; the distinct count shuffles once on the 3-part group key."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 7, 14, 23, 36, 45, 49, 50))
    )
    excluded = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 1000
    )
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .join(
            F.broadcast(excluded),
            lineitem.l_suppkey == excluded.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: NATION_3 suppliers who dominated supply of some
    'large *' part in 1996 (no partsupp availqty, so 'excess stock' =
    shipped more than 40% of the part's total 1996 volume). Two nested
    aggregations over ONE fact scan — the (part, supplier)-grain
    relation is pinned because it feeds both the share filter and the
    part-grain re-aggregate — a share filter between them, and a semi
    join up to supplier names. The naive form is a correlated subquery
    per (supplier, part); this is its decorrelation."""
    release_plan_caches()
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("large")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    per_ps = _pin(
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(38,10)")).alias("qty_dec")
        )
    )
    per_part = per_ps.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("qty_dec").alias("total_dec")
    )
    dominant = per_ps.join(
        per_part, per_ps.l_partkey == F.col("pk")
    ).filter(
        F.col("qty_dec").cast("double")
        > F.lit(0.4) * F.col("total_dec").cast("double")
    )
    return (
        supplier.join(
            F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
        )
        .join(
            dominant.select("l_suppkey").distinct(),
            supplier.s_suppkey == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )


def dormant_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global variant — plans/analytics.py's
    ``above_avg_balance`` covers the per-group correlated form): market
    segments' count + total balance of customers richer than the global
    positive-balance average with no order since 1999 (the pure
    never-ordered form is empty beyond toy scale — every rich customer
    has SOME order). Three Catalyst paths in one plan: a 1-row scalar
    aggregate broadcast back, an anti join against the date-filtered
    fact table (filter pushed below the anti join), and a group
    aggregate. The threshold is davg-exact so no boundary customer
    flips engines."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "1999-01-01"
    )
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        davg("c_acctbal").alias("avg_bal")
    )
    return (
        customer.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


_DSUM_REV = oracle_dsum(_REVENUE)

LIBRARY_QUERIES = {
    "nation_trade_volume": nation_trade_volume,
    "nation_market_share": nation_market_share,
    "product_type_profit": product_type_profit,
    "ship_lag_priority": ship_lag_priority,
    "promo_revenue_share": promo_revenue_share,
    "small_quantity_revenue": small_quantity_revenue,
    "top_supplier_revenue": top_supplier_revenue,
    "large_volume_customers": large_volume_customers,
    "disjunctive_part_revenue": disjunctive_part_revenue,
    "waiting_suppliers": waiting_suppliers,
    "min_cost_supplier": min_cost_supplier,
    "forecast_revenue": forecast_revenue,
    "important_part_value": important_part_value,
    "supplier_part_variety": supplier_part_variety,
    "excess_share_suppliers": excess_share_suppliers,
    "dormant_customer_balance": dormant_customer_balance,
}

LIBRARY_ORACLE = {
    "nation_trade_volume": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               {_DSUM_REV} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
    """,
    "nation_market_share": f"""
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               {oracle_dsum(f"CASE WHEN n2.n_name = 'NATION_1' THEN {_REVENUE} ELSE 0.0 END")}
                 / {_DSUM_REV} AS mkt_share,
               {_DSUM_REV} AS total_revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY 1
        ORDER BY 1
    """,
    "product_type_profit": f"""
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INT) AS o_year,
               {oracle_dsum(f"{_REVENUE} - 0.6 * p_retailprice * l_quantity")} AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY 1, 2
        ORDER BY 1, 2 DESC
    """,
    "ship_lag_priority": """
        SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) >= 90 THEN 'late'
                    WHEN date_diff('day', o_orderdate, l_shipdate) >= 0 THEN 'normal'
                    ELSE 'preship' END AS lag_bucket,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1
        ORDER BY 1
    """,
    "promo_revenue_share": f"""
        SELECT CAST(year(l_shipdate) AS INT) AS l_year,
               100.0 * {oracle_dsum(f"CASE WHEN p_type = 'PROMO' THEN {_REVENUE} ELSE 0.0 END")}
                 / {_DSUM_REV} AS promo_share,
               {oracle_dsum(f"CASE WHEN p_type = 'PROMO' THEN {_REVENUE} ELSE 0.0 END")} AS promo_revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        GROUP BY 1
        ORDER BY 1
    """,
    "small_quantity_revenue": f"""
        WITH part_avg AS (
            SELECT l_partkey, {oracle_davg('l_quantity')} AS avg_qty
            FROM lineitem GROUP BY l_partkey
        )
        SELECT {oracle_dsum('l_extendedprice')} / 7.0 AS avg_yearly
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN part_avg USING (l_partkey)
        WHERE p_brand = 'Brand#2' AND p_type = 'SMALL'
          AND l_quantity < 0.2 * avg_qty
    """,
    "top_supplier_revenue": f"""
        WITH per_supp AS (
            SELECT l_suppkey,
                   SUM(CAST({_REVENUE} AS DECIMAL(38,10))) AS rev_dec
            FROM lineitem
            WHERE l_shipdate BETWEEN '1995-01-01' AND '1995-03-31'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name,
               CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) AS total_revenue
        FROM per_supp
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE rev_dec = (SELECT MAX(rev_dec) FROM per_supp)
        ORDER BY s_suppkey
    """,
    "large_volume_customers": f"""
        WITH big AS (
            SELECT l_orderkey, {oracle_dsum('l_quantity')} AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING {oracle_dsum('l_quantity')} > 150
        )
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
        FROM big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        LIMIT 100
    """,
    "disjunctive_part_revenue": f"""
        SELECT {_DSUM_REV} AS revenue, COUNT(*) AS line_count
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
           OR (p_type = 'PROMO' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
    """,
    "waiting_suppliers": """
        WITH per_os AS (
            SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS last_ship
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
            GROUP BY 1, 2
        ),
        winned AS (
            SELECT l_orderkey, l_suppkey, last_ship,
                   MAX(last_ship) OVER (PARTITION BY l_orderkey) AS max_ship,
                   COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp
            FROM per_os
        ),
        marked AS (
            SELECT *,
                   SUM(CASE WHEN last_ship = max_ship THEN 1 ELSE 0 END)
                       OVER (PARTITION BY l_orderkey) AS n_at_max
            FROM winned
        )
        SELECT s_name, COUNT(*) AS numwait
        FROM marked
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE n_supp >= 2 AND last_ship = max_ship AND n_at_max = 1
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
    "min_cost_supplier": """
        WITH offers AS MATERIALIZED (
            SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
                   MIN(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE p_type = 'STANDARD' AND p_size <= 10 AND r_name = 'AMERICA'
            GROUP BY 1, 2, 3, 4, 5, 6
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
        FROM offers o
        WHERE unit_cost = (
            SELECT MIN(unit_cost) FROM offers i
            WHERE i.p_partkey = o.p_partkey
        )
        ORDER BY s_acctbal DESC, p_partkey, s_suppkey
        LIMIT 100
    """,
    "forecast_revenue": f"""
        SELECT {oracle_dsum('l_extendedprice * l_discount')}
                   AS forecast_revenue
        FROM lineitem
        WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
          AND l_discount BETWEEN 0.04 AND 0.06
          AND l_quantity < 24
    """,
    "important_part_value": """
        WITH per_part AS MATERIALIZED (
            SELECT l_partkey,
                   SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS val_dec
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
            GROUP BY 1
        )
        SELECT l_partkey,
               CAST(CAST(val_dec AS VARCHAR) AS DOUBLE) AS part_value
        FROM per_part
        WHERE CAST(CAST(val_dec AS VARCHAR) AS DOUBLE) >
              0.0005 * (SELECT CAST(CAST(SUM(val_dec) AS VARCHAR) AS DOUBLE)
                        FROM per_part)
        ORDER BY part_value DESC, l_partkey
    """,
    "supplier_part_variety": """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
          AND p_size IN (1, 7, 14, 23, 36, 45, 49, 50)
          AND l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000
          )
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "excess_share_suppliers": """
        WITH per_ps AS MATERIALIZED (
            SELECT l_partkey, l_suppkey,
                   SUM(CAST(l_quantity AS DECIMAL(38,10))) AS qty_dec
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE 'large%'
              AND l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
            GROUP BY 1, 2
        ),
        per_part AS (
            SELECT l_partkey AS pk, SUM(qty_dec) AS total_dec
            FROM per_ps GROUP BY 1
        ),
        dominant AS (
            SELECT DISTINCT l_suppkey
            FROM per_ps JOIN per_part ON l_partkey = pk
            WHERE CAST(CAST(qty_dec AS VARCHAR) AS DOUBLE) >
                  0.4 * CAST(CAST(total_dec AS VARCHAR) AS DOUBLE)
        )
        SELECT s_suppkey, s_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
          AND s_suppkey IN (SELECT l_suppkey FROM dominant)
        ORDER BY s_name
    """,
    "dormant_customer_balance": f"""
        SELECT c_mktsegment,
               COUNT(*) AS numcust,
               {oracle_dsum('c_acctbal')} AS totacctbal
        FROM customer
        WHERE c_acctbal > (
            SELECT {oracle_davg('c_acctbal')}
            FROM customer WHERE c_acctbal > 0
        )
          AND NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderdate >= '1999-01-01'
          )
        GROUP BY 1
        ORDER BY 1
    """,
}
