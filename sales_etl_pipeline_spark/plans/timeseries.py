"""Time-series regularization: calendar-spine gap-fill, forward-fill,
linear interpolation, and OHLC downsampling (reference README.md:131-154
frames daily-revenue trend analysis as a downstream consumer; a real
revenue/metrics feed needs a dense, regular time axis before charting or
model input, which the raw event/order tables don't have — at sf0.001
over half the calendar days have no orders at all).

Scale design (§4.3 grain discipline): every window in this family runs on
an *aggregated* relation (daily or hourly grain — thousands of rows at
any data scale), never on raw facts. The spine is generated from a 1-row
min/max aggregate via ``sequence()`` + ``explode`` — date/hour grain, so
its size is bounded by the time span, not the data volume. The only
fact-grain operations are the initial groupBy aggregations, which shuffle
once on the bucket key and partial-aggregate map-side.

Exactness: bucket sums stay DECIMAL(38,10) through fills and window
carries (cast to double only at the output edge — the
daily_sales_moving_avg discipline, plans/parity.py:231); interpolation
weights are ratios of integer second-diffs cast to double, the identical
op tree on both engines, so the interpolated doubles are bit-equal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.core import DEC, oracle_davg, davg
from ..sources.readers import load_events, load_table


def daily_sales_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily revenue series: a calendar spine over [min, max]
    order date, left-joined to the daily aggregate; missing days carry
    revenue 0.0 / orders 0 plus a forward-filled last-known revenue and
    an ``is_gap`` flag. The ffill window is unpartitioned but runs on
    the date-grain relation (≤ a few thousand rows per decade)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("order_date")
    ).agg(
        F.sum(F.col("o_totalprice").cast(DEC)).alias("rev_dec"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    spine = (
        daily.agg(
            F.min("order_date").alias("mn"), F.max("order_date").alias("mx")
        )
        .select(
            F.explode(
                F.sequence("mn", "mx", F.expr("interval 1 day"))
            ).alias("order_date")
        )
    )
    joined = spine.join(daily, "order_date", "left")
    w = Window.orderBy("order_date").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        "order_date",
        F.coalesce(F.col("rev_dec").cast("double"), F.lit(0.0)).alias("revenue"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.col("rev_dec").isNull().alias("is_gap"),
        F.last("rev_dec", ignorenulls=True).over(w).cast("double").alias(
            "revenue_ffill"
        ),
    ).orderBy("order_date")


def hourly_value_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly mean event value per type on a dense hour spine, with
    linear interpolation across empty buckets (ffill/bfill at the series
    edges). The spine is (distinct types) × (hour sequence from a 1-row
    bounds aggregate) — agg-grain on both sides, broadcast cross join.

    Interpolation: for a gap bucket at time t between the nearest
    observed buckets (t0,v0) and (t1,v1), value = v0 + (v1−v0)·(t−t0)/
    (t1−t0) with the weight a ratio of integer second-diffs — identical
    double arithmetic on both engines."""
    ev = load_events(spark, sf_dir)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(davg("value").alias("v_avg"))
    bounds = hourly.agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
    hours = bounds.select(
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 hour"))).alias(
            "bucket"
        )
    )
    types = hourly.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(hours))
    joined = spine.join(hourly, ["event_type", "bucket"], "left")

    back = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_t = F.when(F.col("v_avg").isNotNull(), F.col("bucket"))
    prev_v = F.last("v_avg", ignorenulls=True).over(back)
    prev_t = F.last(obs_t, ignorenulls=True).over(back)
    next_v = F.first("v_avg", ignorenulls=True).over(fwd)
    next_t = F.first(obs_t, ignorenulls=True).over(fwd)
    sec = F.unix_timestamp
    weight = (sec(F.col("bucket")) - sec(prev_t)).cast("double") / (
        sec(next_t) - sec(prev_t)
    ).cast("double")
    interp = (
        F.when(F.col("v_avg").isNotNull(), F.col("v_avg"))
        .when(prev_v.isNotNull() & next_v.isNotNull(), prev_v + (next_v - prev_v) * weight)
        .when(prev_v.isNotNull(), prev_v)
        .otherwise(next_v)
    )
    return joined.select(
        "event_type",
        "bucket",
        F.col("v_avg").isNull().alias("is_gap"),
        interp.alias("value_interp"),
    ).orderBy("event_type", "bucket")


def weekly_revenue_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsample of the daily revenue series to Monday-anchored
    weeks: open/close are the first/last day's revenue (``min_by``/
    ``max_by`` on the unique date key — deterministic), high/low the
    extremes. Two aggregations, both agg-grain after the first."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("order_date")
    ).agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("rev_dec"))
    return (
        daily.groupBy(
            F.date_trunc("week", "order_date").cast("date").alias("week_start")
        )
        .agg(
            F.min_by("rev_dec", "order_date").cast("double").alias("open"),
            F.max("rev_dec").cast("double").alias("high"),
            F.min("rev_dec").cast("double").alias("low"),
            F.max_by("rev_dec", "order_date").cast("double").alias("close"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .orderBy("week_start")
    )


def daily_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection on the daily revenue series:
    each day scored against the TRAILING 30 days (frame excludes the
    current row — the day under test must not contaminate its own
    baseline), flagged when |z| > 2 with at least 10 days of history.

    Exactness via INTEGER CENTS: money is 2-dp, so every Σx and Σx²
    the variance needs is computed on exact integer decimals (cents and
    cents², DECIMAL(19,0)/(38,0)) — unlike the dsum path, nothing is
    ever quantized to a decimal scale (squaring a double then rounding
    it to 10 dp is where engines disagree by one quantum; squaring an
    exact integer cannot). The only double arithmetic is the final
    mean/var/sqrt/z tree over correctly-rounded conversions of those
    exact integers — identical on both engines ⇒ bit-identical flags,
    no boundary day can flip. The window is unpartitioned but runs on
    the date-grain aggregate (calendar-bounded, never facts)."""
    orders = load_table(spark, sf_dir, "orders")
    cents_row = (F.col("o_totalprice") * 100).cast("decimal(19,0)")
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("order_date"))
        .agg(F.sum(cents_row).alias("cents_wide"))
        .select(
            "order_date",
            F.col("cents_wide").cast("decimal(19,0)").alias("cents"),
        )
    )
    series = daily.select(
        "order_date",
        "cents",
        (F.col("cents") * F.col("cents")).alias("cents_sq"),
    )
    frame = Window.orderBy("order_date").rowsBetween(-30, -1)
    n = F.count(F.lit(1)).over(frame).cast("double")
    sc = F.sum("cents").over(frame).cast("double")
    scc = F.sum("cents_sq").over(frame).cast("double")
    c = F.col("cents").cast("double")
    mean_c = sc / n
    var_c = F.greatest(scc / n - mean_c * mean_c, F.lit(0.0))
    std_c = F.sqrt(var_c)
    z = (c - mean_c) / std_c
    return series.select(
        "order_date",
        (c / 100.0).alias("revenue"),
        F.when(n >= 10, mean_c / 100.0).alias("roll_mean"),
        F.when(n >= 10, std_c / 100.0).alias("roll_std"),
        F.when((n >= 10) & (std_c > 0), z).alias("z_score"),
        F.coalesce(
            (n >= 10) & (std_c > 0) & (F.abs(z) > 2.0), F.lit(False)
        ).alias("is_anomaly"),
    ).orderBy("order_date")


LIBRARY_QUERIES = {
    "daily_sales_gapfill": daily_sales_gapfill,
    "hourly_value_interp": hourly_value_interp,
    "weekly_revenue_ohlc": weekly_revenue_ohlc,
    "daily_anomaly_flags": daily_anomaly_flags,
}

LIBRARY_ORACLE = {
    "daily_sales_gapfill": """
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS order_date,
                   SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS rev_dec,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY 1
        ),
        spine AS (
            SELECT CAST(unnest(generate_series(
                       (SELECT CAST(MIN(order_date) AS TIMESTAMP) FROM daily),
                       (SELECT CAST(MAX(order_date) AS TIMESTAMP) FROM daily),
                       INTERVAL 1 DAY)) AS DATE) AS order_date
        )
        SELECT s.order_date,
               COALESCE(CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE), 0.0) AS revenue,
               COALESCE(n_orders, 0) AS n_orders,
               rev_dec IS NULL AS is_gap,
               CAST(CAST(LAST_VALUE(rev_dec IGNORE NULLS) OVER (
                   ORDER BY s.order_date
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS VARCHAR) AS DOUBLE) AS revenue_ffill
        FROM spine s LEFT JOIN daily d USING (order_date)
        ORDER BY s.order_date
    """,
    "hourly_value_interp": f"""
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS bucket,
                   {oracle_davg('value')} AS v_avg
            FROM events GROUP BY 1, 2
        ),
        spine AS (
            SELECT t.event_type, u.bucket
            FROM (SELECT DISTINCT event_type FROM hourly) t
            CROSS JOIN (
                SELECT unnest(generate_series(
                    (SELECT MIN(bucket) FROM hourly),
                    (SELECT MAX(bucket) FROM hourly),
                    INTERVAL 1 HOUR)) AS bucket
            ) u
        ),
        j AS (
            SELECT s.event_type, s.bucket, h.v_avg,
                   LAST_VALUE(h.v_avg IGNORE NULLS) OVER w_back AS prev_v,
                   LAST_VALUE(CASE WHEN h.v_avg IS NOT NULL THEN s.bucket END
                              IGNORE NULLS) OVER w_back AS prev_t,
                   FIRST_VALUE(h.v_avg IGNORE NULLS) OVER w_fwd AS next_v,
                   FIRST_VALUE(CASE WHEN h.v_avg IS NOT NULL THEN s.bucket END
                               IGNORE NULLS) OVER w_fwd AS next_t
            FROM spine s LEFT JOIN hourly h USING (event_type, bucket)
            WINDOW
              w_back AS (PARTITION BY s.event_type ORDER BY s.bucket
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              w_fwd AS (PARTITION BY s.event_type ORDER BY s.bucket
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT event_type, bucket,
               v_avg IS NULL AS is_gap,
               CASE WHEN v_avg IS NOT NULL THEN v_avg
                    WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
                        prev_v + (next_v - prev_v) *
                        (CAST(date_diff('second', prev_t, bucket) AS DOUBLE)
                         / CAST(date_diff('second', prev_t, next_t) AS DOUBLE))
                    WHEN prev_v IS NOT NULL THEN prev_v
                    ELSE next_v END AS value_interp
        FROM j
        ORDER BY event_type, bucket
    """,
    "daily_anomaly_flags": """
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS order_date,
                   CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(19,0)))
                        AS DECIMAL(19,0)) AS cents
            FROM orders GROUP BY 1
        ),
        series AS (
            SELECT order_date, cents, cents * cents AS cents_sq
            FROM daily
        ),
        stats AS (
            SELECT order_date,
                   CAST(CAST(cents AS VARCHAR) AS DOUBLE) AS c,
                   CAST(COUNT(*) OVER f AS DOUBLE) AS n,
                   CAST(CAST(SUM(cents) OVER f AS VARCHAR) AS DOUBLE) AS sc,
                   CAST(CAST(SUM(cents_sq) OVER f AS VARCHAR) AS DOUBLE)
                       AS scc
            FROM series
            WINDOW f AS (ORDER BY order_date
                         ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING)
        )
        SELECT order_date, c / 100.0 AS revenue,
               CASE WHEN n >= 10 THEN (sc / n) / 100.0 END AS roll_mean,
               CASE WHEN n >= 10 THEN
                   sqrt(GREATEST(scc / n - (sc / n) * (sc / n), 0.0)) / 100.0
               END AS roll_std,
               CASE WHEN n >= 10
                     AND sqrt(GREATEST(scc / n - (sc / n) * (sc / n), 0.0)) > 0
                    THEN (c - sc / n)
                         / sqrt(GREATEST(scc / n - (sc / n) * (sc / n), 0.0))
               END AS z_score,
               COALESCE(
                   n >= 10
                   AND sqrt(GREATEST(scc / n - (sc / n) * (sc / n), 0.0)) > 0
                   AND abs((c - sc / n)
                           / sqrt(GREATEST(scc / n - (sc / n) * (sc / n), 0.0)))
                       > 2.0,
                   FALSE) AS is_anomaly
        FROM stats
        ORDER BY order_date
    """,
    "weekly_revenue_ohlc": """
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS order_date,
                   SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS rev_dec
            FROM orders GROUP BY 1
        )
        SELECT CAST(date_trunc('week', order_date) AS DATE) AS week_start,
               CAST(CAST(arg_min(rev_dec, order_date) AS VARCHAR) AS DOUBLE) AS open,
               CAST(CAST(MAX(rev_dec) AS VARCHAR) AS DOUBLE) AS high,
               CAST(CAST(MIN(rev_dec) AS VARCHAR) AS DOUBLE) AS low,
               CAST(CAST(arg_max(rev_dec, order_date) AS VARCHAR) AS DOUBLE) AS close,
               COUNT(*) AS n_days
        FROM daily
        GROUP BY 1
        ORDER BY 1
    """,
}
