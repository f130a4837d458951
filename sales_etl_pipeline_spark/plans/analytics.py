"""Warehouse analytics plans — the join/semi-join/rollup query surface the
reference documents for downstream consumers (reference README.md:131-154),
expressed TPC-H-style over the star schema (SURVEY.md §2.7: the reference
itself has no joins; these exercise the engine's join strategies).

Scale notes: nation/region/part are broadcast dimensions; lineitem⋈orders
and orders⋈customer are co-keyed shuffle joins that AQE can convert or
skew-split at runtime. The semi-join uses Spark's left_semi (no row
duplication, no post-dedup shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.core import DEC, dsum, davg, oracle_dsum, oracle_davg
from ..sources.readers import load_table

def _cancel_pred():
    return F.col("o_orderstatus").startswith("F")


def regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (TPC-H Q5 shape): revenue by nation within one region where
    the supplier and customer share the nation — 6-table join: lineitem ⋈
    orders ⋈ customer ⋈ supplier ⋈ nation ⋈ region. Exercises scan,
    broadcast + shuffle joins, filter pushdown, hash agg, sort."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(~_cancel_pred())
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(supplier),
            (lineitem.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.countDistinct("o_orderkey").alias("order_count"),
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the wide aggregate over lineitem — the engine's
    throughput headline (pure scan + partial/final hash agg, no joins)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders with at least one late-shipped line, counted
    by priority — a left_semi join (exists) that never duplicates rows."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            lineitem,
            (orders.o_orderkey == lineitem.l_orderkey)
            & (lineitem.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of order counts per customer —
    left outer join (customers with zero orders kept) + two-level agg."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(~_cancel_pred())
    per_customer = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_count"))
    )
    return (
        per_customer.groupBy("order_count")
        .agg(F.count(F.lit(1)).alias("customer_count"))
        .orderBy(F.desc("customer_count"), "order_count")
    )


def region_nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(region, nation) revenue — hierarchical totals with grouping
    sets, free from Catalyst (SURVEY §2.3: cube/rollup as extensions)."""
    orders = load_table(spark, sf_dir, "orders").filter(~_cancel_pred())
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            dsum("o_totalprice").alias("total_revenue"),
            F.countDistinct("o_orderkey").alias("order_count"),
        )
    )


def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: top-3 customers by revenue within each nation via a
    dense_rank window partitioned on the group key — the partitioned-window
    pattern that keeps top-k 100-TB-safe (no global sort; one shuffle on
    n_name)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").filter(~_cancel_pred())
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per_cust = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "c_custkey")
        .agg(dsum("o_totalprice").alias("revenue"))
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("revenue"), "c_custkey")
    return (
        per_cust.withColumn("rk", F.dense_rank().over(w))
        .filter(F.col("rk") <= 3)
        .select("n_name", "c_custkey", "revenue", F.col("rk").cast("int").alias("rk"))
    )


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no non-cancelled order.
    Anti joins never duplicate and carry only the left side through the
    shuffle."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(~_cancel_pred())
    return (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left_anti"
        )
        .select("c_custkey", "c_name", "c_nationkey")
        .orderBy("c_custkey")
    )


def repeat_buyer_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations over customer key sets: buyers active in BOTH 1995
    and 1996 (INTERSECT), minus those who ever cancelled (EXCEPT). Spark
    plans both as null-safe aggregating semi/anti joins."""
    orders = load_table(spark, sf_dir, "orders")
    y95 = orders.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    cancelled = orders.filter(_cancel_pred()).select("o_custkey")
    return (
        y95.intersect(y96)
        .exceptAll(cancelled.distinct())
        .select(F.col("o_custkey").alias("custkey"))
        .orderBy("custkey")
    )


def approx_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate variants of the engine's two expensive exact operators
    (SURVEY §2.11): HyperLogLog++ count-distinct and quantile sketches per
    order priority. Rows-only check: sketch internals differ across engines
    by design — the exact twins (countDistinct / percentile) are the
    oracle-checked ones. At 100 TB these are the default for interactive
    use (no expand, mergeable partials, bounded error).

    The quantile sketch is emitted as three scalar columns (p50/p95/p99)
    rather than one array column: array-typed outputs crash the driver's
    pandas-based canonicalizer (round-1 finding), and scalars are the
    checkable shape anyway. One sketch per percentile is still a single
    pass — Spark merges the three percentile_approx buffers in the same
    partial aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.approx_count_distinct("o_custkey", 0.02).alias("approx_customers"),
            F.percentile_approx("o_totalprice", 0.5, 10000).alias("p50"),
            F.percentile_approx("o_totalprice", 0.95, 10000).alias("p95"),
            F.percentile_approx("o_totalprice", 0.99, 10000).alias("p99"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderpriority")
    )


_CANCEL_SQL = "starts_with(o_orderstatus, 'F')"

def stats_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per nation — variance, stddev, covariance,
    correlation, OLS trend slope — composed from exact decimal sums
    instead of the engines' native ``var_pop``/``corr``/``regr_slope``
    accumulators (which are double-accumulation-order-dependent and
    diverge across engines/partitionings). Each per-row product is one
    double multiply (identical rounding everywhere); sums are exact
    decimal; the final formula is the same fixed op tree on both sides ⇒
    bit-identical results that are ALSO partition-count-invariant — the
    parity technique doubling as the 1000-executor determinism story.

    x = o_totalprice, y = days since 1992-01-01 (order date).
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    x = F.col("o_totalprice")
    y = F.datediff("o_orderdate", F.lit("1992-01-01").cast("date")).cast(
        "double"
    )
    base = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(F.col("n_name").alias("nation_name"), x.alias("x"), y.alias("y"))
    )

    def dsum_of(expr):
        return F.sum(expr.cast(DEC)).cast("double")

    n = F.count(F.lit(1)).cast("double")
    sx, sy = dsum_of(F.col("x")), dsum_of(F.col("y"))
    sxx = dsum_of(F.col("x") * F.col("x"))
    syy = dsum_of(F.col("y") * F.col("y"))
    sxy = dsum_of(F.col("x") * F.col("y"))
    mean_x, mean_y = sx / n, sy / n
    var_x = sxx / n - mean_x * mean_x
    var_y = syy / n - mean_y * mean_y
    covar = sxy / n - mean_x * mean_y
    return (
        base.groupBy("nation_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            mean_x.alias("mean_price"),
            var_x.alias("var_pop_price"),
            F.sqrt(var_x).alias("stddev_price"),
            covar.alias("covar_price_day"),
            (covar / (F.sqrt(var_x) * F.sqrt(var_y))).alias("corr_price_day"),
            (covar / var_x).alias("slope_day_per_price"),
        )
        .orderBy("nation_name")
    )


ORACLE: dict[str, str] = {
    "regional_supplier_volume": f"""
        SELECT n_name,
               CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS revenue,
               COUNT(DISTINCT o_orderkey) AS order_count
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA' AND NOT {_CANCEL_SQL}
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS sum_qty,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
               CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
               CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS sum_charge,
               (CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) / COUNT(l_quantity)) AS avg_qty,
               (CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) / COUNT(l_extendedprice)) AS avg_price,
               (CAST(CAST(SUM(CAST(l_discount AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) / COUNT(l_discount)) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "order_priority_count": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
        )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "customer_order_distribution": f"""
        WITH per_customer AS (
            SELECT c_custkey, COUNT(o_orderkey) AS order_count
            FROM customer
            LEFT JOIN (SELECT * FROM orders WHERE NOT {_CANCEL_SQL}) o
              ON c_custkey = o_custkey
            GROUP BY c_custkey
        )
        SELECT order_count, COUNT(*) AS customer_count
        FROM per_customer
        GROUP BY order_count
        ORDER BY customer_count DESC, order_count
    """,
    "region_nation_rollup": f"""
        SELECT r_name, n_name,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS total_revenue,
               COUNT(DISTINCT o_orderkey) AS order_count
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE NOT {_CANCEL_SQL}
        GROUP BY ROLLUP (r_name, n_name)
    """,
    "top_customers_per_nation": f"""
        WITH per_cust AS (
            SELECT n_name, c_custkey,
                   {oracle_dsum('o_totalprice')} AS revenue
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE NOT {_CANCEL_SQL}
            GROUP BY 1, 2
        )
        SELECT n_name, c_custkey, revenue,
               CAST(dense_rank() OVER (
                   PARTITION BY n_name ORDER BY revenue DESC, c_custkey)
                 AS INTEGER) AS rk
        FROM per_cust
        QUALIFY rk <= 3
    """,
    "customers_without_orders": f"""
        SELECT c_custkey, c_name, c_nationkey
        FROM customer
        WHERE NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND NOT {_CANCEL_SQL}
        )
        ORDER BY c_custkey
    """,
    "repeat_buyer_set_ops": f"""
        SELECT o_custkey AS custkey FROM (
            SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
            INTERSECT
            SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        )
        EXCEPT ALL
        SELECT DISTINCT o_custkey FROM orders WHERE {_CANCEL_SQL}
        ORDER BY custkey
    """,
}

ORACLE["stats_showcase"] = f"""
    WITH base AS (
        SELECT n_name AS nation_name,
               o_totalprice AS x,
               CAST(date_diff('day', DATE '1992-01-01',
                              CAST(o_orderdate AS DATE)) AS DOUBLE) AS y
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
    ),
    s AS (
        SELECT nation_name,
               COUNT(*) AS cnt,
               CAST(COUNT(*) AS DOUBLE) AS n,
               {oracle_dsum("x")} AS sx,
               {oracle_dsum("y")} AS sy,
               {oracle_dsum("x * x")} AS sxx,
               {oracle_dsum("y * y")} AS syy,
               {oracle_dsum("x * y")} AS sxy
        FROM base GROUP BY nation_name
    )
    SELECT nation_name,
           cnt AS n_orders,
           sx / n AS mean_price,
           sxx / n - (sx / n) * (sx / n) AS var_pop_price,
           sqrt(sxx / n - (sx / n) * (sx / n)) AS stddev_price,
           sxy / n - (sx / n) * (sy / n) AS covar_price_day,
           (sxy / n - (sx / n) * (sy / n))
               / (sqrt(sxx / n - (sx / n) * (sx / n))
                  * sqrt(syy / n - (sy / n) * (sy / n))) AS corr_price_day,
           (sxy / n - (sx / n) * (sy / n))
               / (sxx / n - (sx / n) * (sx / n)) AS slope_day_per_price
    FROM s
    ORDER BY nation_name
"""

QUERIES = {
    "stats_showcase": stats_showcase,
    "regional_supplier_volume": regional_supplier_volume,
    "pricing_summary": pricing_summary,
    "order_priority_count": order_priority_count,
    "customer_order_distribution": customer_order_distribution,
    "region_nation_rollup": region_nation_rollup,
    "top_customers_per_nation": top_customers_per_nation,
    "customers_without_orders": customers_without_orders,
    "repeat_buyer_set_ops": repeat_buyer_set_ops,
    "approx_distinct_stats": approx_distinct_stats,  # rows-only: sketches
}


def revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(region, market segment) revenue — all four grouping-set
    combinations in ONE pass (Catalyst's Expand: each input row fans out
    to its grouping sets before one hash aggregate — no re-scan per
    set), with ``grouping()`` flags disambiguating NULL-as-total from a
    genuine NULL key. Completes the grouping-sets family next to
    region_nation_rollup's ROLLUP (SURVEY §2.3 extension).

    Scale: Expand multiplies shuffle rows by #sets (4 here) BEFORE the
    partial aggregate, but partial aggregation collapses them to group
    grain map-side — the shuffle carries group rows, not fact rows."""
    orders = load_table(spark, sf_dir, "orders").filter(~_cancel_pred())
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .cube("r_name", "c_mktsegment")
        .agg(
            dsum("o_totalprice").alias("total_revenue"),
            F.countDistinct("o_orderkey").alias("order_count"),
            F.grouping("r_name").cast("int").alias("is_region_total"),
            F.grouping("c_mktsegment").cast("int").alias("is_segment_total"),
        )
    )


def revenue_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((region), (segment)) — two independent
    one-dimensional summaries in a single pass over the join, skipping
    the cross combinations a CUBE would also compute. Expressed through
    the engine's SQL surface (temp views + spark.sql) — the same Catalyst
    plan the DataFrame API builds, exercising the SQL entry point."""
    orders = load_table(spark, sf_dir, "orders").filter(~_cancel_pred())
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    orders.createOrReplaceTempView("gs_orders")
    customer.createOrReplaceTempView("gs_customer")
    nation.createOrReplaceTempView("gs_nation")
    region.createOrReplaceTempView("gs_region")
    return spark.sql(
        """
        SELECT r_name, c_mktsegment,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE)
                   AS total_revenue,
               COUNT(DISTINCT o_orderkey) AS order_count
        FROM gs_orders
        JOIN gs_customer ON o_custkey = c_custkey
        JOIN gs_nation ON c_nationkey = n_nationkey
        JOIN gs_region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name), (c_mktsegment))
        """
    )



def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): unshipped orders for one
    market segment, revenue-ranked top 10 — scan-filter both fact sides
    BEFORE the join (the date predicates push into both parquet scans),
    broadcast nothing (customer⋈orders⋈lineitem are all key joins AQE
    plans), deterministic top-k via (revenue, orderkey) ordering →
    TakeOrderedAndProject. o_orderpriority stands in for the schema's
    missing o_shippriority column."""
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): customers ranked by
    revenue lost to returns in one quarter — returnflag + date predicates
    prune both fact scans, nation broadcasts, top 20 deterministic via
    (revenue, custkey)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def order_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order values: 10 × 50k-wide buckets via a
    pure floor-division projection — the single-scan aggregation shape
    histograms keep at any scale (no sort, no window; bucket id is
    computed map-side and the shuffle carries ≤ #buckets rows). Empty
    buckets are absent by construction (GROUP BY), documented."""
    orders = load_table(spark, sf_dir, "orders").filter(~_cancel_pred())
    bucket = F.floor(F.col("o_totalprice") / F.lit(50_000.0)).cast("int")
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("bucket_revenue"),
        )
        .withColumn("lo", (F.col("bucket") * 50_000.0))
        .withColumn("hi", ((F.col("bucket") + 1) * 50_000.0))
        .select("bucket", "lo", "hi", "n_orders", "bucket_revenue")
        .orderBy("bucket")
    )


def above_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery surface: customers whose account balance
    exceeds their nation's average — written as literal correlated SQL
    (``WHERE c_acctbal > (SELECT AVG ... WHERE same nation)``) through
    the engine's SQL entry point. Catalyst DECORRELATES this into an
    aggregate + join (no per-row subquery execution — the rewrite that
    makes correlated SQL viable at scale); the oracle runs the same
    correlated form on DuckDB, which decorrelates likewise. davg-exact
    threshold so the comparison is bit-identical."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "sq_customer"
    )
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_nationkey, c_acctbal
        FROM sq_customer outer_c
        WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,10))) AS DOUBLE)
                       / COUNT(c_acctbal)
            FROM sq_customer inner_c
            WHERE inner_c.c_nationkey = outer_c.c_nationkey
        )
        """
    )

def lateral_topk_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery surface (the other half of the
    correlated-SQL story next to ``above_avg_balance``'s scalar
    subquery): each nation's 3 highest-value orders via a per-row
    LATERAL derived table with ORDER BY … LIMIT. Catalyst rewrites the
    correlated LATERAL into a DomainJoin → ranked-window plan (no
    per-nation re-execution of the subquery — the same decorrelation
    that makes ``top_customers_per_nation``'s explicit window form; this
    plan exercises the SQL-surface route to it). DuckDB runs the
    identical SQL; projection-only output, so parity is bit-exact."""
    for t in ("nation", "customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"lat_{t}")
    return spark.sql(
        """
        SELECT n.n_name, o.o_orderkey, o.o_totalprice
        FROM lat_nation n,
        LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM lat_orders JOIN lat_customer ON o_custkey = c_custkey
            WHERE c_nationkey = n.n_nationkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 3
        ) o
        """
    )


LIBRARY_QUERIES = {
    "order_value_histogram": order_value_histogram,
    "above_avg_balance": above_avg_balance,
    "lateral_topk_per_nation": lateral_topk_per_nation,
    "shipping_priority": shipping_priority,
    "returned_item_report": returned_item_report,
    "revenue_cube": revenue_cube,
    "revenue_grouping_sets": revenue_grouping_sets,
}

LIBRARY_ORACLE = {
    "lateral_topk_per_nation": """
        SELECT n.n_name, o.o_orderkey, o.o_totalprice
        FROM nation n,
        LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE c_nationkey = n.n_nationkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 3
        ) o
    """,
    "revenue_cube": f"""
        SELECT r_name, c_mktsegment,
               {oracle_dsum('o_totalprice')} AS total_revenue,
               COUNT(DISTINCT o_orderkey) AS order_count,
               CAST(GROUPING(r_name) AS INTEGER) AS is_region_total,
               CAST(GROUPING(c_mktsegment) AS INTEGER) AS is_segment_total
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE NOT {_CANCEL_SQL}
        GROUP BY CUBE (r_name, c_mktsegment)
    """,
    "revenue_grouping_sets": f"""
        SELECT r_name, c_mktsegment,
               {oracle_dsum('o_totalprice')} AS total_revenue,
               COUNT(DISTINCT o_orderkey) AS order_count
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE NOT {_CANCEL_SQL}
        GROUP BY GROUPING SETS ((r_name), (c_mktsegment))
    """,
}

LIBRARY_ORACLE["shipping_priority"] = f"""
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           {oracle_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
"""

LIBRARY_ORACLE["returned_item_report"] = f"""
    SELECT c_custkey, c_name, c_acctbal, n_name,
           {oracle_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
    GROUP BY 1, 2, 3, 4
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
"""

LIBRARY_ORACLE["order_value_histogram"] = f"""
    SELECT CAST(floor(o_totalprice / 50000.0) AS INTEGER) AS bucket,
           floor(o_totalprice / 50000.0) * 50000.0 AS lo,
           (floor(o_totalprice / 50000.0) + 1) * 50000.0 AS hi,
           COUNT(*) AS n_orders,
           {oracle_dsum('o_totalprice')} AS bucket_revenue
    FROM orders
    WHERE NOT {_CANCEL_SQL}
    GROUP BY 1, 2, 3
    ORDER BY bucket
"""

LIBRARY_ORACLE["above_avg_balance"] = """
    SELECT c_custkey, c_name, c_nationkey, c_acctbal
    FROM customer outer_c
    WHERE c_acctbal > (
        SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,10))) AS VARCHAR)
                   AS DOUBLE) / COUNT(c_acctbal)
        FROM customer inner_c
        WHERE inner_c.c_nationkey = outer_c.c_nationkey
    )
"""
