"""Change-data-capture plans over the ``events`` table: latest-wins upsert
snapshots, incremental snapshot+delta MERGE, and SCD type-2 dimension
building — the mutation-handling operators an ETL engine needs once its
inputs are changelogs instead of immutable files.

The reference pipeline (``/root/reference/data/etl.py``) is a
full-recompute batch script with no notion of updates or deletes; these
plans define the engine's CDC surface the same way plans/eventplans
defines its event-time surface (north-star scope, SURVEY.md §2.10-2.11).
The ``events`` table plays the changelog: key = ``user_id``, each event
upserts (``last_event_type``, ``last_value``), and ``'error'`` events are
interpreted as tombstones (DELETE ops) — a deterministic convention over
the synthetic data, same pattern as the injected PII in plans/assembly.

Scale notes (100 TB):
- ``cdc_latest_snapshot`` is one shuffle on the key + a ranked window —
  the max-timestamp-per-key pattern; partial aggregation does not apply
  to row_number but the shuffle carries only the 5 projected columns.
- ``cdc_incremental_merge`` is the production shape: the full changelog
  is never re-read — a persisted base snapshot (key-grain, small) unions
  with the new delta partition and the latest-wins window runs at
  (base + delta) grain. Repeated merges should bucket the snapshot by
  key so successive merges co-locate without re-shuffling (see
  sources/writers.write_parquet_bucketed). Tombstone compaction is safe
  at merge boundaries because absence ≡ deleted (documented invariant:
  delta event-time never precedes base event-time — an event-time-
  partitioned changelog guarantees this by construction).
- ``scd2_intervals`` is one shuffle on the key + lead(): each mutation
  becomes a validity interval [valid_from, valid_to) with an
  ``is_current`` flag — the standard type-2 slowly-changing-dimension
  build, linear in changelog size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.readers import load_events, load_table

#: event_type interpreted as a DELETE op in the changelog reading
TOMBSTONE_TYPE = "error"

#: event-time boundary splitting base snapshot from delta in the
#: incremental-merge registry plan (mid-corpus: events span 2024-01-01 to
#: 2024-01-30 at every sf, so both sides are non-empty)
CDC_CUTOFF = "2024-01-16 00:00:00"

_SNAPSHOT_COLS = (
    "user_id",
    "last_event_id",
    "last_ts",
    "last_event_type",
    "last_value",
)


def _latest_wins(changelog: DataFrame) -> DataFrame:
    """Latest-wins reduction of a changelog to a keyed snapshot: rank rows
    per key by (ts, event_id) descending, keep rank 1, drop keys whose
    final state is a tombstone. The ranked-window form (not groupBy+max
    +self-join) reads the changelog once and shuffles once."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        changelog.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .filter(F.col("event_type") != TOMBSTONE_TYPE)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
        )
    )


def cdc_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the current state of the changelog: one row per live
    key with its most recent upsert, tombstoned keys absent."""
    return _latest_wins(load_events(spark, sf_dir))


def merge_snapshot(base: DataFrame, delta: DataFrame) -> DataFrame:
    """MERGE a delta changelog partition into an existing snapshot:
    re-expand the snapshot rows into changelog form, union with the delta,
    and reduce latest-wins. Handles inserts (new key in delta), updates
    (delta outranks base state), and deletes (delta tombstone evicts the
    key) in one pass — the relational equivalent of
    ``MERGE INTO base USING delta WHEN MATCHED ... WHEN NOT MATCHED ...``.

    Invariant: delta event-time must not precede base event-time (an
    event-time-partitioned changelog guarantees this); under it, snapshot
    rows carry enough state for latest-wins to be exact, and compacted
    tombstones (keys already absent from ``base``) stay deleted unless
    the delta re-inserts them.
    """
    base_as_log = base.select(
        "user_id",
        F.col("last_event_id").alias("event_id"),
        F.col("last_ts").alias("ts"),
        F.col("last_event_type").alias("event_type"),
        F.col("last_value").alias("value"),
    )
    delta_as_log = delta.select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    return _latest_wins(base_as_log.unionByName(delta_as_log))


def cdc_incremental_merge(
    spark: SparkSession, sf_dir: str, *, cutoff: str = CDC_CUTOFF
) -> DataFrame:
    """Incremental snapshot maintenance, self-verifying: build the base
    snapshot from events before ``cutoff``, MERGE the delta (events at or
    after ``cutoff``), and return the merged snapshot — which must equal
    the full recompute bit-for-bit (the oracle IS the full-recompute SQL;
    tests/test_operators.py additionally pins merge ≡ recompute across
    several cutoffs). This is the path a daily 100-TB ingest runs: delta
    grain work, never a full-history rescan."""
    events = load_events(spark, sf_dir)
    cutoff_ts = F.to_timestamp(F.lit(cutoff))
    base = _latest_wins(events.filter(F.col("ts") < cutoff_ts))
    delta = events.filter(F.col("ts") >= cutoff_ts)
    return merge_snapshot(base, delta)


def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build: every changelog row becomes
    a version with a validity interval — ``valid_from`` = its event time,
    ``valid_to`` = the next mutation's event time (NULL while current),
    ``version`` = 1-based mutation ordinal, ``is_current`` on the open
    interval. Tombstones participate as versions (they close the previous
    interval and their own interval represents the deleted state), so the
    dimension records deletion history — the reason SCD2 exists."""
    events = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        F.row_number().over(w).cast("int").alias("version"),
        F.col("event_type").alias("attr_event_type"),
        F.col("value").alias("attr_value"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


def scd2_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 with change compaction: a new version opens only when the
    tracked attributes actually CHANGE — consecutive changelog rows with
    identical (event_type, value) extend the open interval instead of
    fragmenting it. This is the dimension most warehouses mean by
    "type 2": ``scd2_intervals`` records every mutation (an audit log in
    interval form); this plan records state history. Two window passes
    over the same partitioning (lag to flag changes, lead to close the
    kept rows' intervals) — Catalyst plans a single shuffle on the key,
    both windows reuse the sort.

    The change test is NULL-SAFE (``eqNullSafe`` / ``IS DISTINCT FROM``):
    a plain ``<>`` evaluates to NULL when either side is NULL, so a
    genuine transition to or from a NULL attribute value would be
    silently compacted away and the dimension would keep showing the
    stale value as current. The first row of a key is detected by
    ``lag(event_id) IS NULL`` (event_id is never null), not by a NULL
    prev attribute."""
    events = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        "value",
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag("value").over(w).alias("prev_value"),
    )
    kept = flagged.filter(
        F.col("prev_event_id").isNull()
        | ~F.col("event_type").eqNullSafe(F.col("prev_type"))
        | ~F.col("value").eqNullSafe(F.col("prev_value"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return kept.select(
        "user_id",
        F.row_number().over(w2).cast("int").alias("version"),
        F.col("event_type").alias("attr_event_type"),
        F.col("value").alias("attr_value"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )


def _order_lookup_ts() -> F.Column:
    """Deterministic remap of each order into the changelog's epoch:
    TPC-H order dates live in the 1990s while the events changelog spans
    2024-01 — an unmapped lookup would return NULL for every order
    (vacuous). The remap (2024-01-01 + orderkey%30 days + orderkey%86400
    seconds, pure integer arithmetic, identical in both engines) spreads
    orders across the changelog span so all three lookup outcomes occur
    (no-version-yet, live version, tombstoned version) — the same
    synthetic-corpus convention as the injected PII
    (plans/assembly.py)."""
    return F.expr(
        "timestamp'2024-01-01 00:00:00' + make_interval("
        "0, 0, 0, o_orderkey % 30, 0, 0, o_orderkey % 86400)"
    )


def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup — the everyday consumer of an SCD2
    dimension: every ORDER is enriched with the dimension version that
    was valid AT its order date (``valid_from ≤ t < valid_to``), NULL
    attributes when the customer had no version yet. Tombstone versions
    participate (an order placed while the customer was deleted sees
    ``attr_event_type = 'error'`` — surfaced as ``dim_deleted``), which
    is exactly why SCD2 keeps deletion history.

    Scale shape: NOT a range join (a non-equi interval join shuffles
    nothing co-located and degenerates at scale) — the union-carry-
    forward formulation of ``asof_join_events_orders``: dimension rows
    (tagged, carrying a STRUCT of the version attributes) union with
    order rows, ONE shuffle on the key, one sorted window pass,
    ``last(struct) IGNORE NULLS`` carries the valid version into each
    order row. The attributes ride a single struct so an attr_value
    that is genuinely NULL in a version cannot leak the previous
    version's value (per-column carry would skip the NULL — the
    scd2_compacted NULL-safety lesson at lookup time). Equal-timestamp
    versions: the higher version sorts later and wins, matching the
    zero-width-interval semantics of the relational definition — the
    oracle replays the interval definition only implicitly via the
    same carry, and the equivalence is interval-checked in
    tests/test_cdc.py."""
    dim = scd2_intervals(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    d = dim.select(
        F.col("user_id").alias("uid"),
        F.col("valid_from").alias("ts"),
        F.col("version").alias("ord_version"),
        F.struct("version", "attr_event_type", "attr_value").alias("dim"),
        F.lit(None).cast("long").alias("okey"),
        F.lit(1).alias("is_dim"),
    )
    o = orders.select(
        F.col("o_custkey").alias("uid"),
        _order_lookup_ts().alias("ts"),
        F.lit(None).cast("int").alias("ord_version"),
        F.lit(None)
        .cast("struct<version:int,attr_event_type:string,attr_value:double>")
        .alias("dim"),
        F.col("o_orderkey").alias("okey"),
        F.lit(0).alias("is_dim"),
    )
    w = (
        Window.partitionBy("uid")
        .orderBy("ts", F.desc("is_dim"), "ord_version", "okey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        d.unionByName(o)
        .withColumn("cd", F.last("dim", ignorenulls=True).over(w))
        .filter(F.col("is_dim") == 0)
        .select(
            F.col("okey").alias("o_orderkey"),
            F.col("uid").alias("user_id"),
            F.col("ts").alias("order_ts"),
            F.col("cd.version").alias("version"),
            F.col("cd.attr_event_type").alias("attr_event_type"),
            F.col("cd.attr_value").alias("attr_value"),
            (F.col("cd.attr_event_type") == TOMBSTONE_TYPE).alias(
                "dim_deleted"
            ),
        )
        .orderBy("o_orderkey")
    )


#: columns the diff compares (everything but the key)
_DIFF_COLS = ("c_name", "c_nationkey", "c_acctbal", "c_mktsegment")


def diff_snapshots(
    old: DataFrame, new: DataFrame, key: str, compare_cols: tuple[str, ...]
) -> DataFrame:
    """Generic keyed data diff between two table snapshots — the
    reusable API (the batch twin of the versioned table's row-level
    change feed, sources/table_feed.py, for ANY pair of snapshots):
    each key is classified insert / delete / update with the exact set
    of changed columns (NULL-SAFE comparison, the scd2_compacted
    discipline — a plain ``<>`` would silently drop transitions to/from
    NULL). Unchanged rows are excluded.

    Scale shape: ONE full-outer sort-merge join on the key — both
    sides shuffle once on the diff key (exchange-free when the
    snapshots are bucket-stored on it); the change mask is a per-row
    projection. This is how you diff two 100-TB snapshots."""
    o = old.select([F.col(c).alias(f"o_{c}") for c in old.columns])
    nw = new.select([F.col(c).alias(f"n_{c}") for c in new.columns])
    j = o.join(nw, F.col(f"o_{key}") == F.col(f"n_{key}"), "full_outer")
    changed = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"o_{c}").eqNullSafe(F.col(f"n_{c}")), F.lit(c)
                )
                for c in compare_cols
            ]
        )
    )
    both = (
        F.col(f"o_{key}").isNotNull() & F.col(f"n_{key}").isNotNull()
    )
    change_type = (
        F.when(F.col(f"o_{key}").isNull(), F.lit("insert"))
        .when(F.col(f"n_{key}").isNull(), F.lit("delete"))
        .when(F.size(changed) > 0, F.lit("update"))
    )
    return (
        j.select(
            F.coalesce(f"o_{key}", f"n_{key}").alias(key),
            change_type.alias("change_type"),
            F.when(both, changed).otherwise(F.array().cast("array<string>"))
            .alias("changed_cols"),
        )
        .filter(F.col("change_type").isNotNull())
        .orderBy(key)
    )


def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``diff_snapshots`` API instantiated on two deterministic
    customer-table snapshots (old = keys not divisible by 7; new = keys
    not divisible by 5, every third key's balance shifted) so the diff
    provably contains all three change types at any SF."""
    customer = load_table(spark, sf_dir, "customer")
    old = customer.filter(F.col("c_custkey") % 7 != 0)
    new = customer.filter(F.col("c_custkey") % 5 != 0).withColumn(
        "c_acctbal",
        F.when(
            F.col("c_custkey") % 3 == 0, F.col("c_acctbal") + 10.0
        ).otherwise(F.col("c_acctbal")),
    )
    return diff_snapshots(old, new, "c_custkey", _DIFF_COLS)


def snapshot_diff_str(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-registry twin of ``snapshot_diff``: identical plan with
    ``changed_cols`` serialized to a '_'-joined string — the driver's
    CORRECTNESS canonicalizer cannot hash array cells (the r10 BPE ERR
    class; flat-schema rule in plans/__init__.py). Caught pre-round by
    tests/test_oracle_parity.py::_assert_flat_schema when the array
    original was first promoted."""
    d = snapshot_diff(spark, sf_dir)
    return d.select(
        "c_custkey",
        "change_type",
        F.array_join("changed_cols", "_").alias("changed_cols_str"),
    )


def _diff_neq(col: str) -> str:
    return f"NOT (o.{col} IS NOT DISTINCT FROM n.{col})"


_DIFF_SQL = f"""
    WITH old AS (
        SELECT * FROM customer WHERE c_custkey % 7 <> 0
    ),
    new AS (
        SELECT c_custkey, c_name, c_nationkey,
               CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 10.0
                    ELSE c_acctbal END AS c_acctbal,
               c_mktsegment
        FROM customer WHERE c_custkey % 5 <> 0
    ),
    j AS (
        SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
               CASE WHEN o.c_custkey IS NULL THEN 'insert'
                    WHEN n.c_custkey IS NULL THEN 'delete'
                    WHEN {' OR '.join(_diff_neq(c) for c in _DIFF_COLS)}
                        THEN 'update'
               END AS change_type,
               CASE WHEN o.c_custkey IS NOT NULL
                         AND n.c_custkey IS NOT NULL THEN
                   list_filter(ARRAY[{', '.join(
                       f"CASE WHEN {_diff_neq(c)} THEN '{c}' END"
                       for c in _DIFF_COLS)}],
                       x -> x IS NOT NULL)
               ELSE [] END AS changed_cols
        FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
    )
    SELECT c_custkey, change_type, changed_cols
    FROM j WHERE change_type IS NOT NULL
    ORDER BY c_custkey
"""


_SNAPSHOT_SQL = f"""
    SELECT user_id,
           event_id AS last_event_id,
           ts AS last_ts,
           event_type AS last_event_type,
           value AS last_value
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    AND event_type <> '{TOMBSTONE_TYPE}'
"""

#: Module-level placement is library tier; the round-9 registry rotation
#: (plans/__init__.py ROTATED_IN) promotes all four into the driver
#: registry so they earn driver CORRECTNESS rows. Both tiers run the
#: same DuckDB compare harness.
QUERIES: dict = {}
ORACLE: dict = {}

LIBRARY_QUERIES = {
    "snapshot_diff": snapshot_diff,
    "snapshot_diff_str": snapshot_diff_str,
    "cdc_latest_snapshot": cdc_latest_snapshot,
    "cdc_incremental_merge": cdc_incremental_merge,
    "scd2_intervals": scd2_intervals,
    "scd2_compacted": scd2_compacted,
    "scd2_point_in_time_join": scd2_point_in_time_join,
}

_DIFF_STR_SQL = f"""
    SELECT c_custkey, change_type,
           -- DuckDB's array_to_string of an empty list is NULL; Spark's
           -- array_join is '' — align on ''
           coalesce(array_to_string(changed_cols, '_'), '')
               AS changed_cols_str
    FROM ({_DIFF_SQL})
"""

LIBRARY_ORACLE: dict[str, str] = {
    "snapshot_diff": _DIFF_SQL,
    "snapshot_diff_str": _DIFF_STR_SQL,
    "cdc_latest_snapshot": _SNAPSHOT_SQL,
    # The merged snapshot must equal the full recompute — the oracle for
    # the incremental path is deliberately the SAME full-recompute SQL.
    "cdc_incremental_merge": _SNAPSHOT_SQL,
    "scd2_intervals": """
        SELECT user_id,
               CAST(row_number() OVER w AS INT) AS version,
               event_type AS attr_event_type,
               value AS attr_value,
               ts AS valid_from,
               lead(ts) OVER w AS valid_to,
               lead(ts) OVER w IS NULL AS is_current
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "scd2_compacted": """
        WITH flagged AS (
            SELECT user_id, event_id, ts, event_type, value,
                   lag(event_id) OVER w AS prev_event_id,
                   lag(event_type) OVER w AS prev_type,
                   lag(value) OVER w AS prev_value
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        kept AS (
            SELECT * FROM flagged
            WHERE prev_event_id IS NULL
               OR event_type IS DISTINCT FROM prev_type
               OR value IS DISTINCT FROM prev_value
        )
        SELECT user_id,
               CAST(row_number() OVER w2 AS INT) AS version,
               event_type AS attr_event_type,
               value AS attr_value,
               ts AS valid_from,
               lead(ts) OVER w2 AS valid_to,
               lead(ts) OVER w2 IS NULL AS is_current
        FROM kept
        WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    # union-carry-forward replay of the point-in-time lookup: the struct
    # carries (version, attrs) as ONE nullable value; struct field order
    # inside last_value matches the Spark struct exactly
    "scd2_point_in_time_join": """
        WITH scd AS (
            SELECT user_id,
                   CAST(row_number() OVER w AS INT) AS version,
                   event_type AS attr_event_type,
                   value AS attr_value,
                   ts AS valid_from
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        timeline AS (
            SELECT user_id AS uid, valid_from AS ts,
                   version AS ord_version,
                   struct_pack(version := version,
                               attr_event_type := attr_event_type,
                               attr_value := attr_value) AS dim,
                   CAST(NULL AS BIGINT) AS okey, 1 AS is_dim
            FROM scd
            UNION ALL
            SELECT o_custkey,
                   TIMESTAMP '2024-01-01 00:00:00'
                       + to_days(CAST(o_orderkey % 30 AS INT))
                       + to_seconds(CAST(o_orderkey % 86400 AS INT)),
                   CAST(NULL AS INT), NULL, o_orderkey, 0
            FROM orders
        ),
        carried AS (
            SELECT *,
                   last_value(dim IGNORE NULLS) OVER (
                       PARTITION BY uid
                       ORDER BY ts, is_dim DESC, ord_version, okey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cd
            FROM timeline
        )
        SELECT okey AS o_orderkey, uid AS user_id, ts AS order_ts,
               cd.version AS version,
               cd.attr_event_type AS attr_event_type,
               cd.attr_value AS attr_value,
               cd.attr_event_type = 'error' AS dim_deleted
        FROM carried WHERE is_dim = 0
        ORDER BY o_orderkey
    """,
}
