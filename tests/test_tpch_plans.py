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


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


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


def test_q15_scalar_max_is_broadcast_not_window(spark):
    # argmax-with-ties via a 1-row broadcast aggregate; an unpartitioned
    # window here would collapse the supplier grain to one partition
    plan = _plan(tpch.top_supplier_revenue(spark, SF))
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
