"""Physical-plan quality gates (SURVEY.md §4.2): the optimizations the
engine's 100-TB story depends on must be visible in ``explain`` output —
filter pushdown into the parquet scan, column pruning, broadcast joins for
dimensions, no cartesian products. A correctness-green plan that full-scans
every column would silently regress at scale; these tests pin the plan
shape, not just the results."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sales_etl_pipeline_spark.plans import analytics, llmdata, parity  # noqa: E402

SF = "/root/testdata/sf0.001"


from tests.conftest import executed_plan as _plan  # noqa: E402


def _full_plan(df) -> str:
    return df._jdf.queryExecution().toString()


def test_flagship_broadcasts_dimensions(spark):
    plan = _plan(analytics.regional_supplier_volume(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_flagship_pushes_region_filter(spark):
    plan = _plan(analytics.regional_supplier_volume(spark, SF))
    # the r_name = 'ASIA' predicate must reach the region parquet scan
    assert "EqualTo(r_name,ASIA)" in plan


def test_pricing_summary_pushdown_and_pruning(spark):
    plan = _plan(analytics.pricing_summary(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection needs 7 of 16 lineitem columns; the scan must not read more
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    for unused in ("l_comment", "l_orderkey", "l_partkey", "l_suppkey"):
        assert unused not in read_schema


def test_clean_transactions_prunes_columns(spark):
    plan = _plan(parity.clean_transactions(spark, SF))
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schemas, "no parquet scan found"
    assert all("l_comment" not in line for line in read_schemas)
    assert all("o_comment" not in line for line in read_schemas)


def test_semi_join_planned_for_exists(spark):
    plan = _plan(analytics.order_priority_count(spark, SF))
    assert "LeftSemi" in plan


def test_anti_join_planned_for_not_exists(spark):
    plan = _plan(analytics.customers_without_orders(spark, SF))
    assert "LeftAnti" in plan


def test_topk_uses_take_ordered(spark):
    plan = _plan(parity.top_products(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_minhash_aggregates_partially(spark):
    # the 16 min-hash aggregates must partial-aggregate map-side
    plan = _plan(llmdata.minhash_near_dup(spark, SF))
    assert "partial_min" in plan


def test_semantic_dedup_bucketed_no_cartesian(spark):
    # the scale-safe variant must never plan an all-pairs join: candidates
    # come from a cluster equi-join; centroid assignment happens inside an
    # Arrow-batched pandas UDF (no centroid join of any kind)
    plan = _plan(llmdata.semantic_dedup_bucketed(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "ArrowEvalPython" in plan  # the zero-shuffle centroid-assignment kernel
    # the exact twin IS quadratic (documented baseline) — pin the contrast
    exact_plan = _plan(llmdata.semantic_dedup(spark, SF))
    assert "CartesianProduct" in exact_plan or "BroadcastNestedLoopJoin" in exact_plan


def test_simhash_near_dup_banded_join(spark):
    # candidates must come from the (band, key) equi-join — no all-pairs
    # join anywhere in the plan
    plan = _plan(llmdata.simhash_near_dup(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_whole_stage_codegen_active(spark):
    # under AQE the codegen wrapping appears in the final executed plan only,
    # as "*(n)" stage markers on codegen'd operators
    import re

    df = analytics.pricing_summary(spark, SF)
    df.collect()
    plan = _plan(df)
    assert "isFinalPlan=true" in plan
    assert re.search(r"\*\(\d+\) HashAggregate", plan), "agg not codegen'd"


def test_pii_redact_shuffle_free(spark):
    """The redaction projection must stay a straight-line scan→project —
    a shuffle here would mean the 100-TB linear pass gained a barrier."""
    from sales_etl_pipeline_spark.plans import assembly

    plan = _plan(assembly.pii_redact(spark, SF))
    body = plan.split("AdaptiveSparkPlan")[-1]
    # the only allowed exchange is the final presentation orderBy's range
    # partitioning; no hash-partition (aggregation/join) exchange anywhere
    assert "hashpartitioning" not in body
    assert "CartesianProduct" not in plan


def test_train_test_split_shuffle_free(spark):
    from sales_etl_pipeline_spark.plans import assembly

    plan = _plan(assembly.train_test_split(spark, SF))
    assert "Exchange" not in plan  # pure per-row projection, zero shuffle


def test_cdc_snapshot_single_exchange(spark):
    """Latest-wins reduction must be ONE shuffle on the key (ranked
    window), not a groupBy+max+self-join (two exchanges + a join)."""
    from sales_etl_pipeline_spark.plans import cdc

    plan = _plan(cdc.cdc_latest_snapshot(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_scd2_single_exchange_shared_sort(spark):
    """Both window passes (lag flagging is absent here, but version +
    lead share one spec) must reuse a single key shuffle."""
    from sales_etl_pipeline_spark.plans import cdc

    plan = _plan(cdc.scd2_intervals(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1


def test_event_attribution_equi_join_not_cartesian(spark):
    """The interval join must plan as an equi-join on user_id with the
    time range as a residual condition — never a cartesian or
    nested-loop product."""
    from sales_etl_pipeline_spark.plans import eventplans

    plan = _plan(eventplans.event_attribution(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_event_transitions_windows_are_user_partitioned(spark):
    """The lag window must be partitioned by user_id (the fact-grain
    shuffle), and the per-from normalising total must be a window over
    the TYPE²-grain aggregate — no unpartitioned window may ever touch
    the raw event stream."""
    from sales_etl_pipeline_spark.plans import eventplans

    plan = _plan(eventplans.event_transitions(spark, SF))
    # exactly one fact-grain exchange: the user_id hash partitioning for
    # the lag window (the from_type window runs on the 25-row aggregate)
    assert "hashpartitioning(user_id" in plan
    assert "SinglePartition" not in plan.split("HashAggregate")[0]


def test_session_paths_topk_is_take_ordered(spark):
    from sales_etl_pipeline_spark.plans import eventplans

    plan = _plan(eventplans.session_paths_topk(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_pagerank_edges_pinned_mass_conserved(spark):
    """The weighted edge relation must be materialized ONCE feeding all
    8 iterations (r17: a localCheckpoint leaf — Scan ExistingRDD — not
    a cache, so per-round plans never re-analyze the fact-scan DAG),
    and total rank mass must be conserved: with dangling redistribution
    the ranks sum to 1 up to float accumulation."""
    from sales_etl_pipeline_spark.plans import graph

    df = graph.nation_trade_pagerank(spark, SF)
    rows = df.collect()
    assert abs(sum(r.rank for r in rows) - 1.0) < 1e-9
    assert rows == sorted(rows, key=lambda r: (-r.rank, r.nation))
    plan = _plan(df)
    assert "Scan ExistingRDD" in plan
    # the fact tables must NOT appear in the returned plan: the edge
    # build ran exactly once, upstream of the checkpoint leaf
    assert "lineitem" not in plan


def test_shortest_hops_api_on_custom_graph(spark):
    """BFS hop counts on a hand-built graph with an unreachable node, a
    cycle, and a diamond (two paths of different lengths — MIN wins)."""
    from sales_etl_pipeline_spark.plans.graph import shortest_hops

    # 0→1, 0→2, 1→3, 2→3 (diamond), 3→0 (cycle), 4 unreachable, 3→5, 5→5
    nodes = spark.createDataFrame([(i,) for i in range(6)], "node int")
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3), (3, 0), (3, 5), (5, 5)],
        "src int, dst int",
    )
    got = {r.node: r.hops for r in shortest_hops(nodes, edges, 0).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 2, 5: 3}  # 4 absent: unreachable


def test_shortest_hops_beyond_25_and_depth_cap(spark):
    """The loop runs to frontier exhaustion — a 30-node path graph gets
    full distances (no silent 25-hop truncation); max_hops is an
    explicit bounded-depth audit knob."""
    from sales_etl_pipeline_spark.plans.graph import shortest_hops

    n = 30
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node int")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src int, dst int"
    )
    got = {r.node: r.hops for r in shortest_hops(nodes, edges, 0).collect()}
    assert got == {i: i for i in range(n)}
    capped = {
        r.node: r.hops
        for r in shortest_hops(nodes, edges, 0, max_hops=5).collect()
    }
    assert capped == {i: i for i in range(6)}


def test_shortest_hops_source_without_edges(spark):
    """Early-stop path: a source with no out-edges returns just itself."""
    from sales_etl_pipeline_spark.plans.graph import shortest_hops

    nodes = spark.createDataFrame([(0,), (1,)], "node int")
    edges = spark.createDataFrame([(1, 0)], "src int, dst int")
    got = {r.node: r.hops for r in shortest_hops(nodes, edges, 0).collect()}
    assert got == {0: 0}


def test_nation_trade_hops_plan_anchored(spark):
    """BFS rounds are re-anchored with eager localCheckpoints, so the
    RETURNED plan must sit on checkpoint anchors (Scan ExistingRDD) —
    O(1) depth regardless of round count — and never re-derive the
    fact-grain edge build (no lineitem scan in the final plan)."""
    from sales_etl_pipeline_spark.plans import graph

    df = graph.nation_trade_hops(spark, SF)
    rows = df.collect()
    assert rows and rows[0].hops == 0  # the source itself
    assert rows == sorted(rows, key=lambda r: (r.hops, r.nation))
    plan = _plan(df)
    assert "ExistingRDD" in plan
    assert "lineitem" not in plan


def test_incremental_minhash_candidate_join_is_equi(spark):
    """Delta×index candidate generation must be a (band, key) equi-join;
    a nested-loop fallback would defeat the whole incremental design."""
    from sales_etl_pipeline_spark.plans import llmdata as ld
    from sales_etl_pipeline_spark.sources.readers import load_table

    docs = load_table(spark, SF, "documents")
    base = docs.filter("doc_id % 10 < 7")
    delta = docs.filter("doc_id % 10 >= 7")
    plan = _plan(ld.incremental_minhash_near_dup(base, delta))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_correlated_subquery_decorrelates(spark, sf_dir):
    """above_avg_balance is written as a literal correlated scalar
    subquery; Catalyst must decorrelate it — the physical plan contains
    an aggregate + join and NO subquery execution node."""
    from sales_etl_pipeline_spark.plans.analytics import above_avg_balance

    plan = (
        above_avg_balance(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Subquery" not in plan, plan
    assert "HashAggregate" in plan and "Join" in plan, plan


def test_lateral_topk_decorrelates_to_window(spark, sf_dir):
    """lateral_topk_per_nation is a correlated LATERAL with ORDER BY …
    LIMIT; Catalyst must rewrite it into a ranked-window plan (no
    per-nation subquery re-execution), and the result must equal the
    explicit window formulation row for row."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sales_etl_pipeline_spark.plans.analytics import lateral_topk_per_nation
    from sales_etl_pipeline_spark.sources.readers import load_table

    df = lateral_topk_per_nation(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Subquery" not in plan, plan
    assert "Window" in plan, plan

    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("n_nationkey").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    want = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("n_name", "o_orderkey", "o_totalprice")
    )
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, want.collect()))


def test_dedup_spans_no_cartesian(spark, sf_dir):
    """The span-removal pipeline must stay equi-join shaped end to end —
    no cartesian/nested-loop anywhere despite the multi-stage
    shingle/coverage/anti-join composition."""
    from sales_etl_pipeline_spark.plans.curation import dedup_spans

    plan = (
        dedup_spans(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dq_report_fk_rules_plan_left_anti(spark, sf_dir):
    """Referential rules compile to LeftAnti joins (violation = orphan),
    and the whole report is cartesian-free."""
    from sales_etl_pipeline_spark.plans.validation import dq_report

    plan = (
        dq_report(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_bpe_plans_broadcast_vocab_and_stay_cartesian_free(spark):
    """The BPE application joins look up a word-distinct relation that is
    bounded by the corpus vocabulary — Catalyst must broadcast it
    (BuildRight on the word key), and none of the three plans may
    contain a cartesian product. The training loop itself is
    driver-sequenced (one argmax collect per merge round) and never
    appears in these plans: application consumes the memoized result."""
    from sales_etl_pipeline_spark.plans import bpe

    for fn in (bpe.bpe_token_stats, bpe.bpe_encoded_docs, bpe.bpe_packed_windows):
        plan = _plan(fn(spark, SF))
        assert "CartesianProduct" not in plan, fn.__name__
        assert "BroadcastHashJoin" in plan, fn.__name__


def test_snapshot_diff_single_full_outer_join(spark):
    """The data diff must be ONE full-outer join on the key (both sides
    shuffle once) with the change mask as a projection — no second join,
    no cartesian."""
    from sales_etl_pipeline_spark.plans import cdc

    plan = _plan(cdc.snapshot_diff(spark, SF))
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan
    rows = cdc.snapshot_diff(spark, SF).collect()
    kinds = {r.change_type for r in rows}
    assert kinds == {"insert", "delete", "update"}
    for r in rows:
        assert (r.change_type == "update") == (len(r.changed_cols) > 0)


def test_pagerank_api_on_custom_graph(spark):
    """The reusable pagerank(nodes, edges) API on a hand-built 4-node
    graph with a dangling node — ranks verified against the closed-form
    fixed point computed in plain Python with the identical op order."""
    from sales_etl_pipeline_spark.plans.graph import pagerank

    # 0→1 (1.0), 1→2 (1.0), 2→0 (0.5), 2→1 (0.5); 3 dangling
    nodes = spark.createDataFrame([(i,) for i in range(4)], "node int")
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 0.5), (2, 1, 0.5)],
        "src int, dst int, w double",
    )
    got = {r.node: r.rank for r in pagerank(nodes, edges, n_iters=8).collect()}

    # replicate the exact iteration in python (same double op order)
    d, n = 0.85, 4
    base = (1.0 - d) / float(n)
    r = {i: 1.0 / float(n) for i in range(4)}
    w = {(0, 1): 1.0, (1, 2): 1.0, (2, 0): 0.5, (2, 1): 0.5}
    for _ in range(8):
        m = r[3]  # node 3 is dangling
        inflow = {}
        for (s, t), wt in w.items():
            inflow[t] = inflow.get(t, 0.0) + r[s] * wt
        r = {
            i: base + d * (inflow.get(i, 0.0) + m / float(n))
            for i in range(4)
        }
    for i in range(4):
        assert abs(got[i] - r[i]) < 1e-12, (i, got[i], r[i])


def test_diff_snapshots_api_on_custom_frames(spark):
    """The reusable diff_snapshots API on hand-built frames, including a
    NULL transition (the case a plain <> comparison would drop)."""
    from sales_etl_pipeline_spark.plans.cdc import diff_snapshots

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0)],
        "k int, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (4, "d", 40.0)],
        "k int, s string, v double",
    )
    rows = {
        r.k: (r.change_type, tuple(r.changed_cols))
        for r in diff_snapshots(old, new, "k", ("s", "v")).collect()
    }
    assert rows == {
        2: ("update", ("v",)),  # NULL → 20.0 must be detected
        3: ("delete", ()),
        4: ("insert", ()),
    }


def test_triangle_counts_on_custom_graph(spark):
    """Exact triangle participation via the PRODUCTION API on a
    hand-built graph: K4 minus one edge has 2 triangles — hubs 0 and 1
    sit in both, 2 and 3 in one each."""
    from sales_etl_pipeline_spark.plans.graph import triangle_counts

    # K4 on {0,1,2,3} minus edge (2,3): triangles {0,1,2} and {0,1,3}
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3)], "a int, b int"
    )
    got = {r.node: r.n_triangles for r in triangle_counts(edges).collect()}
    assert got == {0: 2, 1: 2, 2: 1, 3: 1}


def test_plan_scope_releases_previous_pins(spark):
    """The one-mechanism pin lifecycle (VERDICT r10 item 4): registry
    plans register every persist via _pin; entering the NEXT registry
    plan releases the previous plan's pins, so a long driver session
    holds at most one plan's pins at any time."""
    from sales_etl_pipeline_spark import plans
    from sales_etl_pipeline_spark.plans import llmdata

    # both tiers share the _scoped pin lifecycle; the union keeps this
    # test independent of which tier the rotation puts each plan in
    qs = {**plans.library_queries(), **plans.all_queries()}
    llmdata.release_plan_caches()
    assert llmdata._PLAN_CACHES == []

    df1 = qs["minhash_near_dup"](spark, SF)
    df1.count()
    first_pins = list(llmdata._PLAN_CACHES)
    assert first_pins, "minhash_near_dup is a pinning plan"
    assert all(p.storageLevel.useMemory for p in first_pins)

    # long-session simulation: several pinning plans back to back —
    # the registry never accumulates more than one plan's pins
    ids_seen = set()
    for name in ("ngram_jaccard_pairs", "sequence_packing", "exact_dedup",
                 "curation_pipeline"):
        qs[name](spark, SF).count()
        assert len(llmdata._PLAN_CACHES) <= 6, name
        ids_seen.update(id(p) for p in llmdata._PLAN_CACHES)
    # the first plan's pins were released (storage dropped)...
    assert all(not p.storageLevel.useMemory for p in first_pins)
    # ...and never re-entered the registry
    assert ids_seen.isdisjoint({id(p) for p in first_pins})
    llmdata.release_plan_caches()


def test_no_bare_persist_in_plan_modules():
    """Source gate for the pin mechanism: plans/ may not call bare
    .persist() outside the documented exemptions (_pin itself, the
    _INCR_CACHES cross-batch trio, _train_probe's explicitly-released
    locals)."""
    import re

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "sales_etl_pipeline_spark",
        "plans",
    )
    allowed = {
        # llmdata.py: _pin's own persist (+1 docstring mention), the
        # _INCR_CACHES trio (released per ingest batch), and
        # _train_probe's two locals (explicitly unpersisted in the
        # same function)
        "llmdata.py": 7,
    }
    offenders = []
    for fname in sorted(os.listdir(plans_dir)):
        if not fname.endswith(".py"):
            continue
        src = open(os.path.join(plans_dir, fname)).read()
        n = len(re.findall(r"\.persist\(", src))
        if n > allowed.get(fname, 0):
            offenders.append((fname, n))
    assert not offenders, (
        f"bare .persist() outside _pin in {offenders}; use llmdata._pin"
    )


def test_pca_projection_is_shuffle_free(spark):
    """plans/pca.py's core claim pinned in the physical plan: the k-fold
    projection is map-side only — ZERO Exchange nodes (fit happens in a
    separate bounded job; the projection job itself never shuffles)."""
    from sales_etl_pipeline_spark.plans import pca

    df = pca.embedding_pca_scores(spark, SF, 4)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "CartesianProduct" not in plan


def test_quantile_digest_extraction_plan_shape(spark):
    """The digest plan's shuffles are all CENTROID-grain: the quantile
    spine joins by broadcast (BroadcastNestedLoopJoin over 4 rows),
    never a cartesian; the value-grain work is a single mapInPandas
    pass (FlatMapGroupsInPandas only on the bounded centroid relation)."""
    from sales_etl_pipeline_spark.plans import quantiles as Q

    df = Q.approx_order_value_quantiles(spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" in plan  # the 4-row q-spine join


# ---------------------------------------------------------------------------
# r14 multimodal / assembly plan pins: the scale properties the new
# families claim must be visible in the physical plan, not just implied
# by green results.


def test_image_near_dup_no_cartesian_and_banded(spark):
    """The banded perceptual join must stay an equi-join on
    (band_idx, band_val) — never a cartesian/nested-loop pair sweep."""
    from sales_etl_pipeline_spark.plans import images

    plan = _plan(images.image_near_dup_ahash(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_image_decontamination_broadcasts_manifest(spark):
    """The exact decontamination manifest (eval hash counts) is tiny by
    construction — it must ride a broadcast join, not shuffle the
    training side."""
    from sales_etl_pipeline_spark.plans import images

    plan = _plan(images.image_text_decontamination(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_video_near_dup_equi_join_only(spark):
    """The frame-vote join is an equi-join on (frame_idx, fhash) at
    canonical grain — no cartesian anywhere, and the fingerprint pass
    contributes no Python evaluation node."""
    from sales_etl_pipeline_spark.plans import video

    plan = _plan(video.video_near_dup_frames(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_preference_pairs_windows_are_block_partitioned(spark):
    """The DPO rank must never plan a whole-bucket (let alone global)
    ordered window: every Window node's partition spec includes the
    score-block key, and the mirrored pairing stays equi-join-shaped."""
    import re

    from sales_etl_pipeline_spark.plans import assembly

    plan = _plan(assembly.preference_pairs(spark, SF))
    assert "CartesianProduct" not in plan
    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
        spec = m.group(0)
        # row_number windows carry blk in the partition list; the
        # block-offset window runs on the block-grain relation and
        # partitions by (lang, source)
        assert ("blk" in spec) or ("lang" in spec and "source" in spec)


def test_quality_calibration_windows_are_block_partitioned(spark):
    """Same pin for the per-source percentile calibration."""
    import re

    from sales_etl_pipeline_spark.plans import curation

    plan = _plan(curation.quality_score_calibrated(spark, SF))
    assert "CartesianProduct" not in plan
    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
        spec = m.group(0)
        assert ("blk" in spec) or ("source" in spec)


def test_hard_negative_mining_invariants(spark):
    """Semi-hard mining gates: negatives never share the anchor's
    label, ranks are dense 1..5 per anchor, margin ≡ pos − neg, and
    the semi_hard bit matches its definition; non-vacuous both ways
    (some semi-hard and some harder-than-positive negatives exist)."""
    from pyspark.sql import functions as F

    from sales_etl_pipeline_spark.plans import llmdata

    rows = llmdata.hard_negative_mining(spark, SF).collect()
    labels = {
        r.vec_id: r.label
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    by_q = {}
    for r in rows:
        assert labels[r.neighbor_id] != labels[r.query_id]
        assert abs(r.margin - (r.pos_cosine - r.cosine)) == 0.0
        assert r.semi_hard == (r.cosine < r.pos_cosine)
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert set(by_q) == {q for q in labels if q < 10}
    for q, ranks in by_q.items():
        assert sorted(ranks) == [1, 2, 3, 4, 5], q
    assert any(r.semi_hard for r in rows), "no semi-hard negatives"
    assert any(not r.semi_hard for r in rows), (
        "no harder-than-positive negatives"
    )
    spark.catalog.clearCache()


def test_hard_negative_mining_ann_recall(spark):
    """The IVF scale path's negative recall vs the exact twin ≥ 0.9
    (the ANN family gate), same schema, label-disjointness preserved,
    and pos_cosine identical to the exact plan's (the positive side is
    exact in both)."""
    from sales_etl_pipeline_spark.plans import llmdata

    exact = llmdata.hard_negative_mining(spark, SF).collect()
    approx = llmdata.hard_negative_mining_ann(spark, SF).collect()
    assert [f.name for f in llmdata.hard_negative_mining(spark, SF).schema] == [
        f.name for f in llmdata.hard_negative_mining_ann(spark, SF).schema
    ]
    want = {(r.query_id, r.neighbor_id) for r in exact}
    got = {(r.query_id, r.neighbor_id) for r in approx}
    assert len(got & want) / len(want) >= 0.9, (len(got & want), len(want))
    labels = {
        r.vec_id: r.label
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    assert all(labels[r.neighbor_id] != labels[r.query_id] for r in approx)
    pos_e = {r.query_id: r.pos_cosine for r in exact}
    pos_a = {r.query_id: r.pos_cosine for r in approx}
    assert set(pos_a) == set(pos_e)
    for qid in pos_a:
        assert abs(pos_a[qid] - pos_e[qid]) < 1e-9, qid
    spark.catalog.clearCache()
