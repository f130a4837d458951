"""Data-quality constraint suite (Deequ/dbt-test-shaped): declarative
rules evaluated over the warehouse tables, one report row per rule with
its violation count and pass/fail verdict.

The reference pipeline validates by *dropping* bad rows and logging counts
(reference data/etl.py:62-104 — null drops at :66,70, value filter at
:79-84, retention logged at :104); it never reports rule-level results.
This module is that logging surface promoted to a first-class relational
operator: the report itself is a DataFrame, so it can be sinked, diffed
across runs, and asserted on — what a 100-TB ingest gate actually does
with constraint checks (block the publish when ``passed`` is false).

Scale shape (100 TB):
- All ROW-LEVEL rules against one table are fused into a SINGLE scan:
  each rule becomes a ``sum(violation_predicate)`` conditional aggregate
  and the 1-row result is unpivoted to rule-grain rows with ``stack`` —
  rule count never multiplies scans. The scan itself is column-pruned to
  exactly the rule inputs.
- UNIQUENESS rules ride the same single aggregate via
  ``count(*) − count_distinct(key…)`` — one extra shuffle-free expand in
  the same pass, no self-join.
- REFERENTIAL rules are the only ones that need a second relation: each
  is a left-anti-join count. Dimension parents broadcast; fact-to-fact
  FKs shuffle on the join key and AQE handles skew. Violation rows (not
  just counts) are available from the same plan by dropping the count —
  ``fk_violations`` returns them for quarantine sinks.
- The report is rule-grain (a handful of rows) — collect/sink is free.

No counterpart in the reference (it has no joins at all, so referential
integrity is unstated); rule semantics follow the common contract of
Deequ ``Check``/dbt ``tests`` (public docs), re-expressed as Catalyst
expressions.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..sources.readers import load_table

#: report schema, fixed across all rule kinds
REPORT_COLS = ("rule_name", "table_name", "violation_count", "checked_rows", "passed")


def row_rule_report(
    df: DataFrame,
    table_name: str,
    rules: Mapping[str, Column],
    unique_keys: Mapping[str, Sequence[str]] | None = None,
) -> DataFrame:
    """Evaluate row-level violation predicates (and optional key-uniqueness
    rules) against ``df`` in ONE aggregation pass over one scan.

    ``rules`` maps rule_name → Boolean violation predicate (true = the row
    VIOLATES the rule). ``unique_keys`` maps rule_name → key column list;
    its violation count is ``count(*) − count(DISTINCT key…)`` (the number
    of surplus rows sharing a key). Returns one report row per rule.
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, pred in rules.items():
        # coalesce: sum() over zero rows is NULL — an EMPTY input has zero
        # violations (vacuous pass), not an unknown verdict
        aggs.append(
            F.coalesce(
                F.sum(F.when(pred, F.lit(1)).otherwise(F.lit(0))), F.lit(0)
            ).alias(f"v_{name}")
        )
    for name, keys in (unique_keys or {}).items():
        aggs.append(
            (F.count(F.lit(1)) - F.countDistinct(*[F.col(k) for k in keys])).alias(
                f"v_{name}"
            )
        )
    one = df.agg(*aggs)
    all_names = list(rules) + list(unique_keys or {})
    # unpivot the 1-row aggregate to rule grain: stack('r1', v1, 'r2', v2…)
    stack_args = ", ".join(f"'{n}', v_{n}" for n in all_names)
    return one.selectExpr(
        f"stack({len(all_names)}, {stack_args}) AS (rule_name, violation_count)",
        "_n AS checked_rows",
    ).select(
        "rule_name",
        F.lit(table_name).alias("table_name"),
        "violation_count",
        "checked_rows",
        (F.col("violation_count") == 0).alias("passed"),
    )


def fk_violations(
    child: DataFrame, parent: DataFrame, on: Mapping[str, str]
) -> DataFrame:
    """Child rows whose foreign key has no parent — left-anti join on the
    FK columns (``on`` maps child column → parent column). NULL FKs are
    not violations (SQL FK semantics: NULL matches vacuously)."""
    cond = None
    for c, p in on.items():
        clause = child[c] == parent[p]
        cond = clause if cond is None else (cond & clause)
    not_null = None
    for c in on:
        clause = child[c].isNotNull()
        not_null = clause if not_null is None else (not_null & clause)
    return child.filter(not_null).join(parent, cond, "left_anti")


def _fk_rule_report(
    rule_name: str,
    table_name: str,
    child: DataFrame,
    parent: DataFrame,
    on: Mapping[str, str],
) -> DataFrame:
    viol = fk_violations(child, parent, on)
    return (
        viol.agg(F.count(F.lit(1)).alias("violation_count"))
        .crossJoin(child.agg(F.count(F.lit(1)).alias("checked_rows")))
        .select(
            F.lit(rule_name).alias("rule_name"),
            F.lit(table_name).alias("table_name"),
            "violation_count",
            "checked_rows",
            (F.col("violation_count") == 0).alias("passed"),
        )
    )


#: accepted o_orderstatus codes (matches the synthetic corpus' full domain,
#: so the rule passes; tightening it to exclude 'F' would count cancels)
ORDER_STATUSES = ("O", "P", "F")


def dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's warehouse constraint suite over the star schema:

    - orders, one scan: not_null(o_custkey), accepted_values
      (o_orderstatus), positive o_totalprice, unique o_orderkey;
    - lineitem, one scan: positive l_quantity, l_discount ∈ [0, 0.5],
      unique (l_orderkey, l_linenumber) — FAILS on the synthetic corpus
      (duplicate line numbers within an order), on purpose: a report
      where every rule passes can't be told from a report that checks
      nothing;
    - referential: lineitem.l_orderkey ⊆ orders.o_orderkey,
      orders.o_custkey ⊆ customer.c_custkey (anti-join counts);
    - cross-column join rule: l_shipdate ≥ o_orderdate — also FAILS on
      the synthetic corpus (ship dates drawn independently of order
      dates), counted over the joined relation.

    Output is rule-grain; ``passed`` gates a publish step.
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")

    orders_report = row_rule_report(
        orders,
        "orders",
        {
            "orders_custkey_not_null": F.col("o_custkey").isNull(),
            "orders_status_accepted": ~F.col("o_orderstatus").isin(*ORDER_STATUSES),
            "orders_totalprice_positive": ~(F.col("o_totalprice") > 0),
        },
        unique_keys={"orders_orderkey_unique": ["o_orderkey"]},
    )
    lineitem_report = row_rule_report(
        lineitem,
        "lineitem",
        {
            "lineitem_quantity_positive": ~(F.col("l_quantity") > 0),
            "lineitem_discount_range": (F.col("l_discount") < 0)
            | (F.col("l_discount") > 0.5),
        },
        unique_keys={"lineitem_pk_unique": ["l_orderkey", "l_linenumber"]},
    )
    fk_line_orders = _fk_rule_report(
        "lineitem_orderkey_fk",
        "lineitem",
        lineitem.select("l_orderkey"),
        orders.select("o_orderkey"),
        {"l_orderkey": "o_orderkey"},
    )
    fk_orders_cust = _fk_rule_report(
        "orders_custkey_fk",
        "orders",
        orders.select("o_custkey"),
        customer.select("c_custkey"),
        {"o_custkey": "c_custkey"},
    )
    shipped = lineitem.select("l_orderkey", "l_shipdate").join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    ship_after = row_rule_report(
        shipped,
        "lineitem",
        {"lineitem_ship_after_order": F.col("l_shipdate") < F.col("o_orderdate")},
    )
    return (
        orders_report.unionByName(lineitem_report)
        .unionByName(fk_line_orders)
        .unionByName(fk_orders_cust)
        .unionByName(ship_after)
    )


_DQ_SQL = f"""
    WITH o AS (
        SELECT count(*) AS n,
               CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null,
               CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','P','F') THEN 1 ELSE 0 END) AS BIGINT) AS v_status,
               CAST(sum(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
               count(*) - count(DISTINCT o_orderkey) AS v_unique
        FROM orders
    ), l AS (
        SELECT count(*) AS n,
               CAST(sum(CASE WHEN NOT (l_quantity > 0) THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
               CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
               count(*) - (SELECT count(*) FROM (
                   SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)) AS v_pk
        FROM lineitem
    ), j AS (
        SELECT count(*) AS n,
               CAST(sum(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END) AS BIGINT) AS v_ship
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ), fk1 AS (
        SELECT (SELECT count(*) FROM lineitem li
                WHERE li.l_orderkey IS NOT NULL AND NOT EXISTS (
                    SELECT 1 FROM orders oo WHERE oo.o_orderkey = li.l_orderkey))
                   AS v,
               (SELECT count(*) FROM lineitem) AS n
    ), fk2 AS (
        SELECT (SELECT count(*) FROM orders oo
                WHERE oo.o_custkey IS NOT NULL AND NOT EXISTS (
                    SELECT 1 FROM customer c WHERE c.c_custkey = oo.o_custkey))
                   AS v,
               (SELECT count(*) FROM orders) AS n
    )
    SELECT * FROM (
        SELECT 'orders_custkey_not_null' AS rule_name, 'orders' AS table_name,
               v_null AS violation_count, n AS checked_rows, v_null = 0 AS passed
        FROM o
        UNION ALL SELECT 'orders_status_accepted', 'orders', v_status, n, v_status = 0 FROM o
        UNION ALL SELECT 'orders_totalprice_positive', 'orders', v_price, n, v_price = 0 FROM o
        UNION ALL SELECT 'orders_orderkey_unique', 'orders', v_unique, n, v_unique = 0 FROM o
        UNION ALL SELECT 'lineitem_quantity_positive', 'lineitem', v_qty, n, v_qty = 0 FROM l
        UNION ALL SELECT 'lineitem_discount_range', 'lineitem', v_disc, n, v_disc = 0 FROM l
        UNION ALL SELECT 'lineitem_pk_unique', 'lineitem', v_pk, n, v_pk = 0 FROM l
        UNION ALL SELECT 'lineitem_orderkey_fk', 'lineitem', v, n, v = 0 FROM fk1
        UNION ALL SELECT 'orders_custkey_fk', 'orders', v, n, v = 0 FROM fk2
        UNION ALL SELECT 'lineitem_ship_after_order', 'lineitem', v_ship, n, v_ship = 0 FROM j
    )
"""

#: No driver-registry entries (50-cap, COVERAGE.md) — library tier,
#: oracle-checked every pytest run by tests/test_library_parity.py.
QUERIES: dict = {}
ORACLE: dict = {}

LIBRARY_QUERIES = {"dq_report": dq_report}
LIBRARY_ORACLE = {"dq_report": _DQ_SQL}


# ---------------------------------------------------------------------------
# Table profiling: the "what's in this table" pass every new dataset gets.

#: columns the documents_profile plan summarizes — exact-string-repr
#: types only (bigint/string): double/date formatting differs across
#: engines, so the generic API profiles them too but the oracle-checked
#: plan stays in the cross-engine-exact subset.
_PROFILE_COLS = ("doc_id", "lang", "n_chars", "source", "text")


def table_profile(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """Per-column profile in ONE scan (the dq_report fused-scan
    discipline): row count, null count, exact distinct count, and
    lexicographic min/max of the string form. Output long shape —
    (column, n_rows, n_nulls, n_distinct, min_str, max_str) — one row
    per profiled column.

    Scale: a single aggregate over the table; the multi-distinct
    expands to one pass per Spark's distinct-aggregate rewrite, still
    map-side-partial everywhere and never a per-column job. min/max on
    the STRING form keeps the output schema uniform across column
    types (lexicographic, documented — '10' < '9')."""
    cols = list(columns) if columns is not None else list(df.columns)
    if not cols:
        raise ValueError("table_profile: no columns to profile")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(
                F.when(F.col(c).isNull(), 1).otherwise(0)
            ).alias(f"__nn_{c}"),
            F.countDistinct(c).alias(f"__nd_{c}"),
            F.min(F.col(c).cast("string")).alias(f"__mn_{c}"),
            F.max(F.col(c).cast("string")).alias(f"__mx_{c}"),
        ]
    # anchor the 1-row aggregate BEFORE the per-column union: Spark does
    # not share subplans across Union branches, so without this every
    # branch would re-run the whole scan (measured: 5 scans for 5 cols)
    row = df.agg(*aggs).localCheckpoint(eager=True)
    out = None
    for c in cols:
        part = row.select(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nn_{c}").alias("n_nulls"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__mn_{c}").alias("min_str"),
            F.col(f"__mx_{c}").alias("max_str"),
        )
        out = part if out is None else out.unionByName(part)
    return out.orderBy("column")


def documents_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry plan: profile the documents corpus (exact-repr columns
    only — module note on _PROFILE_COLS)."""
    return table_profile(
        load_table(spark, sf_dir, "documents"), _PROFILE_COLS
    )


def _profile_oracle() -> str:
    parts = []
    for c in _PROFILE_COLS:
        parts.append(f"""
        SELECT '{c}' AS "column",
               COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               MIN(CAST({c} AS VARCHAR)) AS min_str,
               MAX(CAST({c} AS VARCHAR)) AS max_str
        FROM documents""")
    return " UNION ALL ".join(parts) + ' ORDER BY "column"'


LIBRARY_QUERIES["documents_profile"] = documents_profile
LIBRARY_ORACLE["documents_profile"] = _profile_oracle()
