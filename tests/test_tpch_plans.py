"""Physical-plan pins for the TPC-H-shaped family (plans/tpch.py) — same
discipline as tests/test_plans.py: the properties the 100-TB story depends
on must be visible in the executed plan, not just implied by the code.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sales_etl_pipeline_spark.plans import tpch  # noqa: E402

SF = "/root/testdata/sf0.001"


from tests.conftest import executed_plan as _plan  # noqa: E402


def test_q7_broadcasts_both_nation_aliases(spark):
    plan = _plan(tpch.nation_trade_volume(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3  # supplier + nation x2
    assert "CartesianProduct" not in plan


def test_q9_pushes_part_name_filter(spark):
    # the p_name contains-'widget' predicate must reach the part scan
    plan = _plan(tpch.product_type_profit(spark, SF))
    assert "StringContains(p_name,widget)" in plan
    assert "CartesianProduct" not in plan


def test_q17_decorrelated_to_broadcast_aggregate(spark):
    # the per-part average joins back broadcast (aggregate-grain small
    # side), never re-scanning lineitem per row
    plan = _plan(tpch.small_quantity_revenue(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2  # part + part_avg
    assert "CartesianProduct" not in plan


def test_q18_limit_is_take_ordered(spark):
    plan = _plan(tpch.large_volume_customers(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_q19_quantity_bound_reaches_lineitem_scan(spark):
    # the OR-of-conjunctions keeps l_quantity-only disjuncts, so the
    # whole disjunction is pushable into the lineitem parquet scan
    plan = _plan(tpch.disjunctive_part_revenue(spark, SF))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("l_quantity" in l for l in pushed)


def test_q21_single_fact_scan(spark):
    # the unique-max qualify runs on the (orderkey, suppkey) aggregate —
    # exactly one scan of raw lineitem, no EXISTS-style self-joins
    plan = _plan(tpch.waiting_suppliers(spark, SF))
    assert plan.count("lineitem.parquet") == 1
    assert "CartesianProduct" not in plan


def test_q2_min_cost_joinback_broadcast_topk(spark):
    # decorrelated per-part min joins back broadcast; the unique-keyed
    # sort + LIMIT compiles to TakeOrderedAndProject, not a global sort;
    # the offers relation feeds two consumers and must be pinned (one
    # fact scan at execution, not one per consumer)
    plan = _plan(tpch.min_cost_supplier(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "TakeOrderedAndProject" in plan
    assert plan.count("InMemoryTableScan") >= 2
    assert "CartesianProduct" not in plan


def test_q6_all_predicates_reach_scan(spark):
    # date range, discount band and quantity bound must ALL be pushed
    # into the parquet scan — at 100 TB this is the whole query
    plan = _plan(tpch.forecast_revenue(spark, SF))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any(
        "l_shipdate" in l and "l_discount" in l and "l_quantity" in l
        for l in pushed
    )


def test_q11_global_scalar_is_broadcast_no_second_scan(spark):
    # the part-grain relation is pinned and feeds BOTH consumers as
    # InMemoryTableScan (one fact scan at execution, not one per
    # consumer); the global total joins back as a 1-row broadcast
    plan = _plan(tpch.important_part_value(spark, SF))
    assert plan.count("InMemoryTableScan") >= 2
    assert "BroadcastNestedLoopJoin" in plan


def test_q16_exclusion_is_broadcast_anti_join(spark):
    # the supplier exclusion list must anti-join BROADCAST — a sort-merge
    # LeftAnti here means the supplier-grain side shuffled the fact table
    import re

    plan = _plan(tpch.supplier_part_variety(spark, SF))
    assert re.search(r"BroadcastHashJoin \[l_suppkey[^\n]*LeftAnti", plan)
    assert "CartesianProduct" not in plan


def test_q20_single_fact_scan_semi_join(spark):
    # (part,supplier) grain is pinned — both its consumers (share filter
    # + part-grain re-agg) read the cache, ONE lineitem scan at
    # execution; the supplier qualification is a semi join
    plan = _plan(tpch.excess_share_suppliers(spark, SF))
    assert plan.count("InMemoryTableScan") >= 2
    assert "LeftSemi" in plan


def test_q22_anti_join_with_pushed_date_filter(spark):
    # the 1999 dormancy cutoff must sit below the anti join, pushed into
    # the orders scan — anti-joining the full fact then filtering is wrong
    plan = _plan(tpch.dormant_customer_balance(spark, SF))
    assert "LeftAnti" in plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("o_orderdate" in l for l in pushed)


def test_q15_scalar_max_is_broadcast_not_window(spark):
    # argmax-with-ties via a 1-row broadcast aggregate; an unpartitioned
    # window here would collapse the supplier grain to one partition
    plan = _plan(tpch.top_supplier_revenue(spark, SF))
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
