"""Temporal operators: as-of join and a scalar-function showcase.

The as-of join (point-in-time join) is the workhorse temporal operator of
training-data pipelines — "attach the latest state known at event time"
(feature lookups, label joins). Spark has no native as-of join; the
composition here is the scalable one: union both sides, one shuffle+sort
per key, and carry the last order forward with an IGNORE NULLS window —
O(n log n) per key instead of the quadratic range join, and it streams
under watermark semantics too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.core import DEC, oracle_dsum
from ..sources.readers import load_events, load_table


def asof_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every event, the most recent order (by o_orderdate ≤ event ts)
    of the same customer — NULL if none precedes.

    Union-carry-forward formulation: tag order rows (is_order=1) and event
    rows (is_order=0), sort each customer's timeline by (ts, orders-first,
    orderkey), then ``last(orderkey) IGNORE NULLS`` over the unbounded-
    preceding frame carries the newest order into each event row. One
    shuffle on the key; ties at the same timestamp resolve to the highest
    orderkey (deterministic).
    """
    events = load_events(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        F.col("o_custkey").alias("uid"),
        F.col("o_orderdate").alias("ts"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey").alias("okey"),
        F.lit(1).alias("is_order"),
    )
    e = events.select(
        F.col("user_id").alias("uid"),
        "ts",
        "event_id",
        F.lit(None).cast("long").alias("okey"),
        F.lit(0).alias("is_order"),
    )
    w = (
        Window.partitionBy("uid")
        .orderBy("ts", F.desc("is_order"), "okey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        o.unionByName(e)
        .withColumn("last_orderkey", F.last("okey", ignorenulls=True).over(w))
        .filter(F.col("is_order") == 0)
        .select(
            "event_id",
            F.col("uid").alias("user_id"),
            "ts",
            "last_orderkey",
        )
    )


def scalar_function_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 scalar surface in one oracle-checked projection: string
    (substring/lpad/reverse/replace/regexp_extract), date (date_trunc/
    last_day/quarter/datediff), numeric (abs/ceil/floor/sqrt/mod/greatest),
    and null handling (nullif/coalesce). Transcendentals other than sqrt
    are excluded by policy — libm rounding differs across engines.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.substring("o_orderpriority", 3, 20).alias("prio_name"),
        F.regexp_extract("o_orderpriority", r"^(\d+)", 1).alias("prio_num"),
        F.lpad(F.col("o_orderkey").cast("string"), 10, "0").alias("key_padded"),
        F.reverse(F.col("o_orderstatus")).alias("status_rev"),
        F.replace(F.col("o_orderpriority"), F.lit("-"), F.lit(":")).alias("prio_colon"),
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.last_day("o_orderdate").alias("month_end"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.datediff(F.last_day("o_orderdate"), F.to_date("o_orderdate")).alias(
            "days_to_month_end"
        ),
        F.abs(F.col("o_totalprice") - F.round("o_totalprice")).alias("frac_dist"),
        F.ceil("o_totalprice").alias("price_ceil"),
        F.floor("o_totalprice").alias("price_floor"),
        F.sqrt("o_totalprice").alias("price_sqrt"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
        F.greatest(F.least(F.col("o_orderkey") % 5, F.lit(3)), F.lit(1)).alias(
            "key_clamped"
        ),
        F.nullif(F.col("o_orderstatus"), F.lit("F")).alias("status_or_null"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("F")), F.lit("CANCELLED")
        ).alias("status_label"),
    )


def window_function_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ordered-window function surface in one oracle-checked
    projection over per-customer order timelines: offsets (lag/lead),
    frame endpoints (first/last value over the whole partition),
    rank family (rank, dense_rank, percent_rank, cume_dist, ntile), and a
    running exact-decimal revenue sum. Ordering keys include o_orderkey so
    every ordering is total — deterministic across engines and partition
    layouts. Rank-family ratios are single exact int/int double divisions
    (bit-identical both engines).

    Scale note: windows partition by customer — millions of independent
    partitions, no global sort. The only data movement is the hash
    exchange on o_custkey shared by every window here (one shuffle,
    Catalyst plans a single Window node chain).
    """
    orders = load_table(spark, sf_dir, "orders")
    wd = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wv = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    wfull = wd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        F.col("o_custkey").alias("customer_id"),
        F.row_number().over(wd).cast("long").alias("order_seq"),
        F.lag("o_totalprice", 1).over(wd).alias("prev_price"),
        F.lead("o_totalprice", 1).over(wd).alias("next_price"),
        F.first_value(F.col("o_totalprice")).over(wfull).alias("first_price"),
        F.last_value(F.col("o_totalprice")).over(wfull).alias("last_price"),
        F.rank().over(wv).cast("long").alias("price_rank"),
        F.dense_rank().over(wv).cast("long").alias("price_dense_rank"),
        F.percent_rank().over(wv).alias("price_percent_rank"),
        F.cume_dist().over(wv).alias("price_cume_dist"),
        F.ntile(4).over(wd).cast("long").alias("date_quartile"),
        F.sum(F.col("o_totalprice").cast(DEC))
        .over(wd)
        .cast("double")
        .alias("running_revenue"),
    )


ORACLE: dict[str, str] = {
    "asof_join_events_orders": """
        WITH timeline AS (
            SELECT o_custkey AS uid, o_orderdate AS ts,
                   CAST(NULL AS BIGINT) AS event_id,
                   o_orderkey AS okey, 1 AS is_order
            FROM orders
            UNION ALL
            SELECT user_id, ts, event_id, CAST(NULL AS BIGINT), 0
            FROM events
        ), carried AS (
            SELECT *,
                   last_value(okey IGNORE NULLS) OVER (
                       PARTITION BY uid
                       ORDER BY ts, is_order DESC, okey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS last_orderkey
            FROM timeline
        )
        SELECT event_id, uid AS user_id, ts, last_orderkey
        FROM carried WHERE is_order = 0
    """,
    "scalar_function_showcase": r"""
        SELECT o_orderkey,
               substring(o_orderpriority, 3, 20) AS prio_name,
               regexp_extract(o_orderpriority, '^(\d+)', 1) AS prio_num,
               lpad(CAST(o_orderkey AS VARCHAR), 10, '0') AS key_padded,
               reverse(o_orderstatus) AS status_rev,
               replace(o_orderpriority, '-', ':') AS prio_colon,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
               last_day(o_orderdate) AS month_end,
               CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
               CAST(date_diff('day', CAST(o_orderdate AS DATE),
                              last_day(o_orderdate)) AS INTEGER)
                   AS days_to_month_end,
               abs(o_totalprice - round(o_totalprice)) AS frac_dist,
               CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
               CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
               sqrt(o_totalprice) AS price_sqrt,
               o_orderkey % 7 AS key_mod7,
               greatest(least(o_orderkey % 5, 3), 1) AS key_clamped,
               nullif(o_orderstatus, 'F') AS status_or_null,
               coalesce(nullif(o_orderstatus, 'F'), 'CANCELLED') AS status_label
        FROM orders
    """,
}

ORACLE["window_function_showcase"] = f"""
    SELECT o_orderkey,
           o_custkey AS customer_id,
           ROW_NUMBER() OVER wd AS order_seq,
           lag(o_totalprice, 1) OVER wd AS prev_price,
           lead(o_totalprice, 1) OVER wd AS next_price,
           first_value(o_totalprice) OVER wfull AS first_price,
           last_value(o_totalprice) OVER wfull AS last_price,
           rank() OVER wv AS price_rank,
           dense_rank() OVER wv AS price_dense_rank,
           percent_rank() OVER wv AS price_percent_rank,
           cume_dist() OVER wv AS price_cume_dist,
           ntile(4) OVER wd AS date_quartile,
           {oracle_dsum("o_totalprice", "wd")} AS running_revenue
    FROM orders
    WINDOW
        wd AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        wv AS (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC),
        wfull AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING
                       AND UNBOUNDED FOLLOWING)
"""

QUERIES = {
    "asof_join_events_orders": asof_join_events_orders,
    "scalar_function_showcase": scalar_function_showcase,
    "window_function_showcase": window_function_showcase,
}
