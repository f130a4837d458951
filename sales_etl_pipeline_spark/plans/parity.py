"""Reference-parity plans (SURVEY.md §2): the sales-ETL pipeline's cleaning,
summary, derived-metric, window and top-k operators re-expressed over the
driver's star schema.

Role mapping (FIXTURES.md §C): the reference's single denormalized fact
table becomes ``lineitem ⋈ orders``; CustomerID/Country become
``o_custkey → customer → nation``; the ``'C'``-prefix cancellation flag
(reference etl.py:76) becomes ``o_orderstatus`` starting with ``'F'`` —
fixed across every query and oracle.

Float-parity contract (SURVEY.md §7 "what's hard" #2): double sums are
non-associative, so every aggregate over doubles goes through an exact
DECIMAL(38,10) sum (functions.core.dsum/davg) on BOTH the Spark and the
DuckDB side — the results are then bit-identical regardless of partition
count or engine. Per-row arithmetic stays raw double (same IEEE ops →
identical bits). No tolerance anywhere.

Other parity decisions:
- ``min()`` instead of non-deterministic ``first()`` (etl.py:121);
- pandas ``qcut`` segmentation via exact interpolated percentiles
  (etl.py:139-143), not ``ntile`` — boundary-safe because interpolated
  quantiles never coincide with data values unless exact (SURVEY §2.4);
- pandas ``rolling(min_periods=n)`` NaN semantics via count-guarded frames
  (etl.py:198-199);
- pandas ``astype(int)`` truncates → oracle uses ``trunc()`` before CAST
  (DuckDB CAST rounds, Spark cast truncates).

Scale notes: dimension joins (nation, region, part) are explicit
``broadcast``; lineitem⋈orders is a co-keyed shuffle join AQE can re-plan;
unpartitioned windows run only on aggregated relations (daily grain,
per-customer grain) — never on the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.core import DEC, dsum, davg, oracle_dsum, oracle_davg, title_case, weekday_mon0
from ..sources.readers import load_table
from .llmdata import _pin

CANCELLED = "F"  # o_orderstatus class standing in for the 'C' invoice prefix


def _non_cancelled_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # P4 + P11 (etl.py:76,114): flag by string prefix, then anti-filter.
    return orders.withColumn(
        "is_cancelled", F.col("o_orderstatus").startswith(CANCELLED)
    ).filter(~F.col("is_cancelled"))


def clean_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1–P10 (etl.py:58-107): the cleaning pass over the joined fact table.

    Null-drop filters, prefix flag, compound value filter, arithmetic
    projection, timestamp casts, date-part extraction, string normalization
    — one declarative select so Catalyst pushes filters into the parquet
    scans and prunes columns.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    df = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        # P1/P2 (etl.py:66,70): drop-null filters on key/description analogs.
        .filter(F.col("o_custkey").isNotNull() & F.col("o_orderpriority").isNotNull())
        # P4 (etl.py:76): cancellation flag by string prefix.
        .withColumn("is_cancelled", F.col("o_orderstatus").startswith(CANCELLED))
        # P5 (etl.py:79-84): keep cancellations OR valid qty/price rows.
        .filter(
            F.col("is_cancelled")
            | ((F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0))
        )
    )
    return df.select(
        "l_orderkey",
        "l_linenumber",
        # P3 (etl.py:73): float→int truncating cast.
        F.col("l_quantity").cast("long").alias("quantity_int"),
        # P6 (etl.py:88): arithmetic projection (discounted revenue).
        # Raw double product — identical IEEE ops on both engines.
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_amount"),
        # P7/P8 (etl.py:91-96): timestamp cast + date parts (Monday=0 weekday).
        F.year("l_shipdate").alias("ship_year"),
        F.month("l_shipdate").alias("ship_month"),
        weekday_mon0("l_shipdate").alias("ship_weekday"),
        F.hour("o_orderdate").alias("order_hour"),
        F.to_date("l_shipdate").alias("ship_date"),
        # P9 (etl.py:99): strip + UPPER normalization.
        F.upper(F.trim("o_orderpriority")).alias("priority_norm"),
        # P10 (etl.py:102): strip + title-case normalization.
        title_case(F.col("o_orderpriority")).alias("priority_title"),
        "is_cancelled",
    )


def customer_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 + D1–D3 (etl.py:109-148): per-customer summary with revenue
    quartile segmentation.

    ``total_items`` needs lineitem quantities → pre-aggregate lineitem to
    order grain (map-side-combinable partial agg) before the customer
    rollup, so the wide fact table is reduced before the join.
    Segmentation reproduces pandas ``qcut`` exactly: one-pass exact
    interpolated percentiles, broadcast back as a 1-row relation (no
    driver collect), then a CASE projection with right-closed bins.

    Degenerate-distribution divergence (documented, pinned by test): on a
    corpus where quartile edges tie (e.g. every revenue equal), pandas
    ``qcut(..., labels=[4])`` with its default ``duplicates='raise'``
    *crashes* (reference etl.py:139-143), and ``duplicates='drop'`` would
    change the label arity. The CASE form instead degrades totally and
    deterministically: tied edges collapse toward the lowest right-closed
    bin (all-equal ⇒ everyone "Bronze"). Graceful degradation is the
    correct engine behavior; exact parity holds whenever the reference
    itself doesn't raise.
    """
    orders = _non_cancelled_orders(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    items = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        # decimal intermediate — summed again at customer grain without a
        # lossy double→decimal re-quantization
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("order_qty"))
    )
    base = (
        orders.join(items, orders.o_orderkey == items.l_orderkey, "left")
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    )
    agg = base.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.countDistinct("o_orderkey").alias("total_orders"),
        dsum("o_totalprice").alias("total_revenue"),
        F.sum("order_qty").cast("double").alias("total_items"),
        F.min("o_orderdate").alias("first_purchase"),
        F.max("o_orderdate").alias("last_purchase"),
        # deterministic stand-in for pandas input-order first() (etl.py:121)
        F.min("n_name").alias("country"),
        (dsum("o_totalprice") / F.countDistinct("o_orderkey")).alias("avg_order_value"),
    )
    # The customer-grain aggregate feeds two consumers (the quartile scan
    # and the final projection); persist it so the 4-table join + wide agg
    # runs once, not twice. Customer grain is orders of magnitude smaller
    # than the fact tables, so this persists cheaply at any scale.
    agg = _pin(agg)
    # D3 (etl.py:139-143): exact qcut quartiles, broadcast-joined.
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
    )


def product_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 (etl.py:150-175): per-product summary over the lineitem grain,
    composite key (partkey, name) ≙ (StockCode, Description).

    The two countDistincts are split from the decimal sums on purpose:
    mixing them makes Spark route the DECIMAL(38,10) agg buffers through
    the multi-distinct expand (×3 rows), and BigDecimal buffer churn at
    fact grain is ~12× slower than three lean shuffles (measured 167 s →
    13.7 s at 6M lineitem rows). Results are bit-identical either way.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = _non_cancelled_orders(spark, sf_dir).select("o_orderkey", "o_custkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    joined = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
    sums = joined.groupBy("l_partkey").agg(
        dsum("l_quantity").alias("total_quantity"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        ),
        davg("l_extendedprice").alias("avg_unit_price"),
    )
    d_orders = (
        joined.select("l_partkey", "l_orderkey")
        .distinct()
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )
    d_custs = (
        joined.select("l_partkey", "o_custkey")
        .distinct()
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("unique_customers"))
    )
    return (
        sums.join(d_orders, "l_partkey")
        .join(d_custs, "l_partkey")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .select(
            "p_partkey",
            "p_name",
            "total_quantity",
            "total_revenue",
            "order_count",
            "unique_customers",
            "avg_unit_price",
        )
    )


def daily_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 (etl.py:177-196): daily grain revenue/orders/customers."""
    orders = _non_cancelled_orders(spark, sf_dir)
    return (
        orders.groupBy(F.to_date("o_orderdate").alias("order_date"))
        .agg(
            dsum("o_totalprice").alias("revenue"),
            F.countDistinct("o_orderkey").alias("orders"),
            F.countDistinct("o_custkey").alias("unique_customers"),
        )
    )


def daily_sales_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/W2 (etl.py:198-199): 7/30-row moving averages over the daily
    grain, with pandas ``min_periods`` semantics (NULL until the frame is
    full) via a count guard. Frame averages use the exact-decimal sum so
    both engines divide identical doubles.

    The window is unpartitioned but runs on the *aggregated* daily relation
    (thousands of rows) — the §4.3 invariant that keeps this 100-TB-safe.
    """
    orders = _non_cancelled_orders(spark, sf_dir)
    # Keep the daily sum in DECIMAL through the window level: a
    # double→decimal re-cast of an aggregated double differs between
    # engines at the 1e-10 place (Spark re-quantizes the shortest decimal
    # repr, DuckDB the binary expansion) — decimal end-to-end is exact.
    daily = orders.groupBy(F.to_date("o_orderdate").alias("order_date")).agg(
        F.sum(F.col("o_totalprice").cast(DEC)).alias("revenue_dec"),
        F.countDistinct("o_orderkey").alias("orders"),
        F.countDistinct("o_custkey").alias("unique_customers"),
    )
    w7 = Window.orderBy("order_date").rowsBetween(-6, 0)
    w30 = Window.orderBy("order_date").rowsBetween(-29, 0)

    def guarded_ma(w, n):
        frame_avg = F.sum("revenue_dec").over(w).cast("double") / F.count(
            "revenue_dec"
        ).over(w)
        return F.when(F.count("revenue_dec").over(w) == n, frame_avg)

    return daily.select(
        "order_date",
        F.col("revenue_dec").cast("double").alias("revenue"),
        "orders",
        "unique_customers",
        guarded_ma(w7, 7).alias("revenue_7dma"),
        guarded_ma(w30, 30).alias("revenue_30dma"),
    )


def country_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 + D4/D5 (etl.py:206-236): per-country rollup with revenue share.

    The share denominator (A5, etl.py:227-229) is a global window over the
    25-row aggregated relation — not the fact table — summed in decimal
    for order-independence.
    """
    orders = _non_cancelled_orders(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    agg = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("country"))
        .agg(
            # decimal intermediate: reused exactly by the share window below
            F.sum(F.col("o_totalprice").cast(DEC)).alias("revenue_dec"),
            F.countDistinct("o_orderkey").alias("total_orders"),
            F.countDistinct("o_custkey").alias("unique_customers"),
        )
    )
    total = Window.partitionBy()
    return agg.select(
        "country",
        F.col("revenue_dec").cast("double").alias("total_revenue"),
        "total_orders",
        "unique_customers",
        (F.col("revenue_dec").cast("double") / F.col("total_orders")).alias(
            "avg_order_value"
        ),
        (
            100
            * F.col("revenue_dec").cast("double")
            / F.sum("revenue_dec").over(total).cast("double")
        ).alias("revenue_share"),
    )


def top_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O4 (etl.py:170; reference README.md:131-154): top-k by revenue.
    Spark plans this as TakeOrderedAndProject (no global sort). Tie-break
    on the key for determinism vs the oracle."""
    return (
        product_summary(spark, sf_dir)
        .orderBy(F.desc("total_revenue"), "p_partkey")
        .limit(10)
    )


_CANCEL_PRED = "starts_with(o_orderstatus, 'F')"

# DuckDB has no initcap — whitespace-title-case emulation matching Spark.
_INITCAP = (
    "array_to_string(list_transform(string_split(lower(trim({col})), ' '), "
    "w -> upper(w[1]) || w[2:]), ' ')"
)

ORACLE: dict[str, str] = {
    "clean_transactions": f"""
        SELECT l_orderkey,
               l_linenumber,
               CAST(trunc(l_quantity) AS BIGINT) AS quantity_int,
               l_extendedprice * (1 - l_discount) AS total_amount,
               CAST(year(l_shipdate) AS INTEGER) AS ship_year,
               CAST(month(l_shipdate) AS INTEGER) AS ship_month,
               CAST(isodow(l_shipdate) - 1 AS INTEGER) AS ship_weekday,
               CAST(hour(o_orderdate) AS INTEGER) AS order_hour,
               CAST(l_shipdate AS DATE) AS ship_date,
               upper(trim(o_orderpriority)) AS priority_norm,
               {_INITCAP.format(col='o_orderpriority')} AS priority_title,
               {_CANCEL_PRED} AS is_cancelled
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_custkey IS NOT NULL AND o_orderpriority IS NOT NULL
          AND ({_CANCEL_PRED} OR (l_quantity > 0 AND l_extendedprice > 0))
    """,
    "customer_summary": f"""
        WITH items AS (
            SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(38,10))) AS order_qty
            FROM lineitem GROUP BY 1
        ), base AS (
            SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate, n_name, order_qty
            FROM orders
            LEFT JOIN items ON o_orderkey = l_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE NOT {_CANCEL_PRED}
        ), agg AS (
            SELECT o_custkey AS customer_id,
                   COUNT(DISTINCT o_orderkey) AS total_orders,
                   {oracle_dsum('o_totalprice')} AS total_revenue,
                   CAST(CAST(SUM(order_qty) AS VARCHAR) AS DOUBLE) AS total_items,
                   MIN(o_orderdate) AS first_purchase,
                   MAX(o_orderdate) AS last_purchase,
                   MIN(n_name) AS country,
                   {oracle_dsum('o_totalprice')} / COUNT(DISTINCT o_orderkey)
                       AS avg_order_value
            FROM base GROUP BY 1
        ), q AS (
            SELECT quantile_cont(total_revenue, 0.25) AS q1,
                   quantile_cont(total_revenue, 0.50) AS q2,
                   quantile_cont(total_revenue, 0.75) AS q3
            FROM agg
        )
        SELECT customer_id, total_orders, total_revenue, total_items,
               first_purchase, last_purchase, country, avg_order_value,
               CAST(date_diff('day', first_purchase, last_purchase) AS INTEGER)
                   AS days_since_first,
               CASE WHEN total_revenue <= q1 THEN 'Bronze'
                    WHEN total_revenue <= q2 THEN 'Silver'
                    WHEN total_revenue <= q3 THEN 'Gold'
                    ELSE 'Platinum' END AS segment
        FROM agg, q
    """,
    "product_summary": f"""
        SELECT p_partkey, p_name,
               {oracle_dsum('l_quantity')} AS total_quantity,
               {oracle_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue,
               COUNT(DISTINCT l_orderkey) AS order_count,
               COUNT(DISTINCT o_custkey) AS unique_customers,
               {oracle_davg('l_extendedprice')} AS avg_unit_price
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        WHERE NOT {_CANCEL_PRED}
        GROUP BY 1, 2
    """,
    "daily_sales": f"""
        SELECT CAST(o_orderdate AS DATE) AS order_date,
               {oracle_dsum('o_totalprice')} AS revenue,
               COUNT(DISTINCT o_orderkey) AS orders,
               COUNT(DISTINCT o_custkey) AS unique_customers
        FROM orders WHERE NOT {_CANCEL_PRED}
        GROUP BY 1
    """,
    "daily_sales_moving_avg": f"""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS order_date,
                   SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS revenue_dec,
                   COUNT(DISTINCT o_orderkey) AS orders,
                   COUNT(DISTINCT o_custkey) AS unique_customers
            FROM orders WHERE NOT {_CANCEL_PRED}
            GROUP BY 1
        )
        SELECT order_date,
               CAST(CAST(revenue_dec AS VARCHAR) AS DOUBLE) AS revenue,
               orders, unique_customers,
               CASE WHEN COUNT(*) OVER w7 = 7
                    THEN CAST(CAST(SUM(revenue_dec) OVER w7 AS VARCHAR) AS DOUBLE)
                         / COUNT(revenue_dec) OVER w7 END AS revenue_7dma,
               CASE WHEN COUNT(*) OVER w30 = 30
                    THEN CAST(CAST(SUM(revenue_dec) OVER w30 AS VARCHAR) AS DOUBLE)
                         / COUNT(revenue_dec) OVER w30 END AS revenue_30dma
        FROM daily
        WINDOW w7 AS (ORDER BY order_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
               w30 AS (ORDER BY order_date ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
    """,
    "country_summary": f"""
        WITH agg AS (
            SELECT n_name AS country,
                   SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS revenue_dec,
                   COUNT(DISTINCT o_orderkey) AS total_orders,
                   COUNT(DISTINCT o_custkey) AS unique_customers
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE NOT {_CANCEL_PRED}
            GROUP BY 1
        )
        SELECT country,
               CAST(CAST(revenue_dec AS VARCHAR) AS DOUBLE) AS total_revenue,
               total_orders, unique_customers,
               CAST(CAST(revenue_dec AS VARCHAR) AS DOUBLE) / total_orders
                   AS avg_order_value,
               100 * CAST(CAST(revenue_dec AS VARCHAR) AS DOUBLE) /
                 CAST(CAST(SUM(revenue_dec) OVER () AS VARCHAR) AS DOUBLE)
                 AS revenue_share
        FROM agg
    """,
    "top_products": f"""
        SELECT p_partkey, p_name,
               {oracle_dsum('l_quantity')} AS total_quantity,
               {oracle_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue,
               COUNT(DISTINCT l_orderkey) AS order_count,
               COUNT(DISTINCT o_custkey) AS unique_customers,
               {oracle_davg('l_extendedprice')} AS avg_unit_price
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        WHERE NOT {_CANCEL_PRED}
        GROUP BY 1, 2
        ORDER BY total_revenue DESC, p_partkey
        LIMIT 10
    """,
}

QUERIES = {
    "clean_transactions": clean_transactions,
    "customer_summary": customer_summary,
    "product_summary": product_summary,
    "daily_sales": daily_sales,
    "daily_sales_moving_avg": daily_sales_moving_avg,
    "country_summary": country_summary,
    "top_products": top_products,
}
