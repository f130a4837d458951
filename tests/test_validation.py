"""Data-quality constraint suite (plans/validation.py) and incremental
summary maintenance (plans/incremental.py) behavior tests.

The oracle parity of the shipped `dq_report` / `incremental_customer_summary`
plans is covered by tests/test_library_parity.py; these tests pin the
GENERIC APIs on constructed inputs with known violations, and the
batch-count-invariance of the incremental fold.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sales_etl_pipeline_spark.plans import incremental, parity, validation  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_row_rule_report_counts_known_violations(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, -5.0, "b"), (2, 3.0, None), (4, 0.0, "a")],
        "id long, amount double, tag string",
    )
    report = validation.row_rule_report(
        df,
        "t",
        {
            "amount_positive": ~(F.col("amount") > 0),
            "tag_not_null": F.col("tag").isNull(),
        },
        unique_keys={"id_unique": ["id"]},
    )
    rows = {r.rule_name: r for r in report.collect()}
    assert set(rows) == {"amount_positive", "tag_not_null", "id_unique"}
    assert rows["amount_positive"].violation_count == 2  # -5.0 and 0.0
    assert rows["tag_not_null"].violation_count == 1
    assert rows["id_unique"].violation_count == 1  # id=2 twice
    assert all(r.checked_rows == 4 for r in rows.values())
    assert not any(r.passed for r in rows.values())
    assert list(report.columns) == list(validation.REPORT_COLS)


def test_row_rule_report_single_scan(spark):
    """All row-level rules + uniqueness fuse into ONE scan of the input:
    the physical plan contains exactly one parquet scan node."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    report = validation.row_rule_report(
        orders,
        "orders",
        {"null_cust": F.col("o_custkey").isNull()},
        unique_keys={"uniq": ["o_orderkey"]},
    )
    plan = report._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan


def test_fk_violations_returns_orphan_rows(spark):
    child = spark.createDataFrame(
        [(1, "x"), (2, "y"), (None, "z"), (9, "w")], "fk long, payload string"
    )
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    orphans = validation.fk_violations(child, parent, {"fk": "pk"})
    got = [(r.fk, r.payload) for r in orphans.collect()]
    # NULL FK matches vacuously (SQL semantics); only the dangling 9 violates
    assert got == [(9, "w")]


def test_dq_report_verdicts_smoke(spark):
    rows = {r.rule_name: r for r in validation.dq_report(spark, SF).collect()}
    assert rows["orders_orderkey_unique"].passed
    assert rows["lineitem_orderkey_fk"].passed
    assert rows["orders_custkey_fk"].passed
    # the two deliberately failing rules fail at every sf
    assert not rows["lineitem_pk_unique"].passed
    assert not rows["lineitem_ship_after_order"].passed
    assert rows["lineitem_pk_unique"].violation_count > 0


def _summaries_equal(a, b) -> bool:
    ar = sorted(map(tuple, a.collect()))
    br = sorted(map(tuple, b.collect()))
    return ar == br


def test_incremental_fold_equals_full_recompute_any_batching(spark):
    """State fold ≡ one-shot summary, bit-for-bit, for 1/2/5-way batch
    splits of the order log (batches partition at order grain — the
    documented invariant). Exercises long/decimal/min/max/min merges and
    the finalize pass including segmentation percentiles."""
    full = parity.customer_summary(spark, SF)
    grain = incremental.order_grain(spark, SF).persist()
    for nb in (1, 2, 5):
        states = [
            incremental.customer_state(
                grain.filter(F.pmod(F.col("o_orderkey"), F.lit(nb)) == i)
            )
            for i in range(nb)
        ]
        folded = incremental.finalize_customer_summary(
            incremental.merge_customer_state(*states)
        )
        assert folded.columns == full.columns
        assert _summaries_equal(folded, full), f"fold mismatch at {nb} batches"
    grain.unpersist()


def test_incremental_product_fold_equals_full_recompute(spark):
    """The auxiliary distinct-pair state makes unique_customers (a
    non-mergeable distinct) exactly maintainable: 3-way order-partitioned
    fold ≡ the one-shot product summary, bit-for-bit."""
    full = parity.product_summary(spark, SF)
    grain = incremental._line_grain(spark, SF).persist()
    states = [
        incremental.product_state(
            grain.filter(F.pmod(F.col("o_orderkey"), F.lit(3)) == i)
        )
        for i in range(3)
    ]
    part = spark.read.parquet(f"{SF}/part.parquet")
    folded = incremental.finalize_product_summary(
        incremental.merge_product_state(*states), part
    )
    assert folded.columns == full.columns
    assert _summaries_equal(folded, full)
    grain.unpersist()


def test_incremental_empty_delta_is_identity(spark):
    """Merging an empty batch state changes nothing — the no-new-data
    ingest run is a no-op on the summary."""
    grain = incremental.order_grain(spark, SF)
    base = incremental.customer_state(grain)
    empty = incremental.customer_state(grain.filter(F.lit(False)))
    merged = incremental.finalize_customer_summary(
        incremental.merge_customer_state(base, empty)
    )
    one_shot = incremental.finalize_customer_summary(base)
    assert _summaries_equal(merged, one_shot)


def test_pipeline_validate_gate(spark, tmp_path):
    """AnalyticsPipeline.validate(): the default gate (referential rules)
    passes on the corpus; gating on a rule the corpus genuinely breaks
    raises with the rule named."""
    import pytest

    from sales_etl_pipeline_spark.operators.pipeline import AnalyticsPipeline

    pipe = AnalyticsPipeline(spark, SF, str(tmp_path / "out"))
    report = pipe.validate()
    assert report.count() == 10  # the full rule suite ran
    with pytest.raises(ValueError, match="lineitem_pk_unique"):
        pipe.validate(fail_on=("lineitem_pk_unique",))


def test_row_rule_report_empty_input_vacuous_pass(spark):
    """A DQ report over zero rows must report 0 violations and pass
    vacuously — not NULL verdicts (sum() over no rows is NULL without
    the coalesce)."""
    empty = spark.createDataFrame([], "id long, amount double")
    rows = validation.row_rule_report(
        empty,
        "t",
        {"pos": ~(F.col("amount") > 0)},
        unique_keys={"u": ["id"]},
    ).collect()
    assert all(r.violation_count == 0 and r.passed for r in rows)
    assert all(r.checked_rows == 0 for r in rows)


def test_incremental_state_survives_parquet_round_trip(spark, tmp_path):
    """The production ingest shape: batch state written to parquet,
    read back next run, merged with the new delta's state — must
    finalize identically to the one-shot summary (state schema is
    parquet-stable, incl. the DECIMAL(38,10) sums)."""
    grain = incremental.order_grain(spark, SF)
    cutoff = F.to_timestamp(F.lit(incremental.ORDER_CUTOFF))
    base_state = incremental.customer_state(
        grain.filter(F.col("o_orderdate") < cutoff)
    )
    state_path = str(tmp_path / "customer_state")
    base_state.write.parquet(state_path)
    restored = spark.read.parquet(state_path)
    assert dict(restored.dtypes)["rev_dec"] == "decimal(38,10)"
    delta_state = incremental.customer_state(
        grain.filter(F.col("o_orderdate") >= cutoff)
    )
    folded = incremental.finalize_customer_summary(
        incremental.merge_customer_state(restored, delta_state)
    )
    assert _summaries_equal(folded, parity.customer_summary(spark, SF))


def test_incremental_hll_fold_is_batching_invariant(spark):
    """Bounded-state variant (VERDICT r9 item 7): the HLL sketch merge
    (hll_union_agg = register-wise max) must be BATCHING-INVARIANT —
    1-way vs 3-way order-partitioned folds produce the identical summary
    row set, estimates included. This is the fold ≡ sketch-merge gate:
    whatever the ingest batching, the maintained state converges to the
    same registers."""
    grain = incremental._line_grain(spark, SF).persist()
    part = spark.read.parquet(f"{SF}/part.parquet")

    def folded(nb):
        states = [
            incremental.product_state_hll(
                grain.filter(F.pmod(F.col("l_orderkey"), F.lit(nb)) == i)
            )
            for i in range(nb)
        ]
        return incremental.finalize_product_summary_hll(
            incremental.merge_product_state_hll(*states), part
        )

    assert _summaries_equal(folded(1), folded(3))
    grain.unpersist()


def test_incremental_hll_error_band_vs_exact_twin(spark):
    """Error-band gate (the approx_heavy_hitters pattern): every column
    except unique_customers is bit-identical to the exact twin, and the
    sketched unique_customers is within 5 % relative error per part —
    in fact EXACT here, because per-part customer cardinalities sit
    below the DataSketches coupon threshold (~0.75·2^lg_k), where the
    sketch stores raw hashes. The genuine estimation regime is pinned
    by the high-cardinality test below."""
    exact = {
        r.p_partkey: r
        for r in incremental.incremental_product_summary(spark, SF).collect()
    }
    approx = incremental.incremental_product_summary_hll(spark, SF).collect()
    assert len(approx) == len(exact)
    for r in approx:
        e = exact[r.p_partkey]
        assert (
            r.p_name,
            r.total_quantity,
            r.total_revenue,
            r.order_count,
            r.avg_unit_price,
        ) == (
            e.p_name,
            e.total_quantity,
            e.total_revenue,
            e.order_count,
            e.avg_unit_price,
        )
        assert (
            abs(r.unique_customers - e.unique_customers)
            <= 0.05 * e.unique_customers
        )


def test_hll_state_bounded_at_high_cardinality(spark):
    """The regime the bounded state exists for: 50k distinct customers
    on one part. The exact pair state would hold 50k rows; the sketch
    is one fixed-size row whose estimate lands within the published
    ~1.6 % standard error band (gated at 3σ ≈ 5 %), and a 2-way fold
    still matches the single-batch sketch exactly."""
    batch = spark.range(50_000).select(
        F.lit(1).cast("long").alias("l_partkey"),
        F.col("id").alias("o_custkey"),
        F.lit(1).cast("long").alias("l_orderkey"),
        F.lit(1.0).cast("double").alias("l_quantity"),
        F.lit(1.0).cast("double").alias("l_extendedprice"),
        F.lit(0.0).cast("double").alias("l_discount"),
    )
    _, hll = incremental.product_state_hll(batch)
    est = hll.select(
        F.hll_sketch_estimate("cust_hll").alias("est")
    ).first().est
    assert abs(est - 50_000) <= 0.05 * 50_000, est
    # state is ONE row per part regardless of cardinality
    assert hll.count() == 1
    # 2-way fold reproduces the single-batch registers exactly
    halves = [
        incremental.product_state_hll(
            batch.filter(F.pmod(F.col("o_custkey"), F.lit(2)) == i)
        )
        for i in range(2)
    ]
    _, merged = incremental.merge_product_state_hll(*halves)
    est2 = merged.select(
        F.hll_sketch_estimate("cust_hll").alias("est")
    ).first().est
    assert est2 == est


def _orders_grain(spark):
    from sales_etl_pipeline_spark.plans.parity import _non_cancelled_orders

    return _non_cancelled_orders(spark, SF).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def test_ivm_join_view_fold_any_interleaving(spark):
    """Two-sided join-view maintenance: ANY interleaving of fact batches
    and dim-update deltas folds to the same final view, bit-for-bit ≡
    the full recompute over (all orders) ⋈ (latest dim). Covers 1/3-way
    fact splits × dim update applied before/between/after them."""
    orders = _orders_grain(spark).persist()
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    nation = spark.read.parquet(f"{SF}/nation.parquet")
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
    final_dim = incremental.merge_dim_assignment(dim0, delta)

    # reference: one-shot fact state against the final dim
    full = incremental.finalize_nation_revenue(
        incremental.fact_rev_state(orders), final_dim, nation
    )

    for nb in (1, 3):
        fact_states = [
            incremental.fact_rev_state(
                orders.filter(F.pmod(F.col("o_orderkey"), F.lit(nb)) == i)
            )
            for i in range(nb)
        ]
        rev = incremental.merge_fact_rev_state(*fact_states)
        # dim folded in three different orders: the states are
        # independent, so interleaving cannot matter
        for dim in (
            incremental.merge_dim_assignment(dim0, delta),
            incremental.merge_dim_assignment(
                incremental.merge_dim_assignment(dim0, delta)
            ),
            incremental.merge_dim_assignment(delta, dim0),
        ):
            folded = incremental.finalize_nation_revenue(rev, dim, nation)
            assert folded.columns == full.columns
            assert _summaries_equal(folded, full)
    orders.unpersist()


def test_ivm_dim_update_moves_historical_revenue(spark):
    """The semantic point of key-grain IVM state: a dim update re-homes
    the key's ENTIRE historical revenue, not just post-update facts —
    checked on a hand-built 2-customer case."""
    orders = spark.createDataFrame(
        [(1, 10, 100.0), (2, 10, 50.0), (3, 20, 7.0)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    nation = spark.createDataFrame(
        [(0, "A"), (1, "B")], "n_nationkey int, n_name string"
    )
    dim0 = spark.createDataFrame(
        [(10, 0, 0), (20, 1, 0)], "customer_id long, nationkey int, seq int"
    )
    # customer 10 moves A -> B AFTER both of its orders arrived
    delta = spark.createDataFrame(
        [(10, 1, 1)], "customer_id long, nationkey int, seq int"
    )
    rev = incremental.fact_rev_state(orders)
    dim = incremental.merge_dim_assignment(dim0, delta)
    got = {
        r.nation: (r.total_orders, r.total_revenue)
        for r in incremental.finalize_nation_revenue(
            rev, dim, nation
        ).collect()
    }
    assert got == {"B": (3, 157.0)}  # all of 10's history moved to B


def test_ivm_seq_latest_wins_per_key(spark):
    """Out-of-order delta MERGE: the max-seq assignment wins per key
    regardless of fold order."""
    a = spark.createDataFrame(
        [(1, 5, 2)], "customer_id long, nationkey int, seq int"
    )
    b = spark.createDataFrame(
        [(1, 9, 1), (2, 3, 0)], "customer_id long, nationkey int, seq int"
    )
    for fold in (
        incremental.merge_dim_assignment(a, b),
        incremental.merge_dim_assignment(b, a),
    ):
        got = {(r.customer_id, r.nationkey, r.seq) for r in fold.collect()}
        assert got == {(1, 5, 2), (2, 3, 0)}


def test_table_profile_generic_api(spark):
    """Generic profiler on a hand-built frame: null/distinct/min/max per
    column, doubles profiled too (string-form min/max, lexicographic)."""
    df = spark.createDataFrame(
        [(1, "b", 2.5), (2, None, 1.5), (2, "a", None)],
        "k long, s string, x double",
    )
    from sales_etl_pipeline_spark.plans import validation

    rows = {
        r["column"]: r for r in validation.table_profile(df).collect()
    }
    assert set(rows) == {"k", "s", "x"}
    k, s, x = rows["k"], rows["s"], rows["x"]
    assert (k.n_rows, k.n_nulls, k.n_distinct) == (3, 0, 2)
    assert (k.min_str, k.max_str) == ("1", "2")
    assert (s.n_nulls, s.n_distinct) == (1, 2)
    assert (s.min_str, s.max_str) == ("a", "b")
    assert (x.n_nulls, x.n_distinct) == (1, 2)


def test_table_profile_single_scan(spark):
    """The fused profile is ONE scan of the table (dq_report
    discipline): the 1-row aggregate is checkpoint-anchored before the
    per-column union, so the RETURNED plan contains no table scan at
    all (Spark does not share subplans across Union branches — without
    the anchor every branch re-runs the scan)."""
    from sales_etl_pipeline_spark.plans import validation

    df = validation.documents_profile(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 0
    assert "ExistingRDD" in plan  # the anchored aggregate
