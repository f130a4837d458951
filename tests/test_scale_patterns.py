"""Scale-pattern operators: stateful streaming custom operator, skew-salted
aggregation, partitioned fact writes — each checked against its exact
(unsalted / batch) twin."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sales_etl_pipeline_spark.functions.core import salted_agg  # noqa: E402
from sales_etl_pipeline_spark.sources.readers import load_events, load_table  # noqa: E402
from sales_etl_pipeline_spark.sources.writers import write_parquet  # noqa: E402
from sales_etl_pipeline_spark.streaming import jobs  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_stream_user_totals_stateful(spark):
    events = jobs.read_events_stream(spark, SF)
    out = jobs.run_to_memory(jobs.stream_user_totals(events), "t_totals", "update")
    got = {r.user_id: (r.event_count, r.total_value) for r in out.collect()}
    batch = {
        r.user_id: (r.n, r.tv)
        for r in load_events(spark, SF)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert set(got) == set(batch)
    for uid, (n, tv) in batch.items():
        assert got[uid][0] == n
        assert abs(got[uid][1] - tv) < 1e-6


def test_salted_agg_matches_plain(spark):
    orders = load_table(spark, SF, "orders")
    salted = salted_agg(
        orders,
        ["o_orderpriority"],
        {
            "revenue": (lambda: F.sum("o_totalprice"), lambda c: F.sum(c)),
            "n": (lambda: F.count(F.lit(1)), lambda c: F.sum(c)),
            "max_price": (lambda: F.max("o_totalprice"), lambda c: F.max(c)),
        },
    )
    plain = orders.groupBy("o_orderpriority").agg(
        F.sum("o_totalprice").alias("revenue"),
        F.count(F.lit(1)).alias("n"),
        F.max("o_totalprice").alias("max_price"),
    )
    s = {r.o_orderpriority: r for r in salted.collect()}
    p = {r.o_orderpriority: r for r in plain.collect()}
    assert set(s) == set(p)
    for k in p:
        assert s[k].n == p[k].n
        assert s[k].max_price == p[k].max_price
        assert abs(s[k].revenue - p[k].revenue) < 1e-6  # double sum order differs


def test_partitioned_fact_write_prunes(spark, tmp_path):
    """Date-partitioned fact write → scans with a date predicate read only
    matching partitions (the §4.3 physical-design decision)."""
    orders = load_table(spark, SF, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_partitioned")
    write_parquet(orders, path, partition_by=["order_year"])
    years = [d for d in os.listdir(path) if d.startswith("order_year=")]
    assert len(years) > 1
    back = spark.read.parquet(path).filter(F.col("order_year") == 1996)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(order_year" in plan
    assert back.count() == orders.filter(F.col("order_year") == 1996).count()


def _executed_plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_avoids_shuffle(spark):
    """Tables bucketed on the join key must sort-merge-join with zero
    Exchange operators (the write-time shuffle is amortized across every
    subsequent join — the fact⋈fact co-location pattern)."""
    from sales_etl_pipeline_spark.sources.writers import write_bucketed

    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = load_table(spark, SF, "customer").select("c_custkey", "c_name")
    write_bucketed(orders, "b_orders", "o_custkey", buckets=4)
    write_bucketed(customer, "b_customer", "c_custkey", buckets=4)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = _executed_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # same result as the plain path
        plain = orders.join(
            customer, orders.o_custkey == customer.c_custkey
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_xsum_partition_invariant(spark):
    """The cross-engine parity AND 1000-executor determinism claims both
    rest on xsum being accumulation-order independent: the same values must
    produce bit-identical sums under any partitioning (plain double sum()
    would not — float addition does not associate)."""
    from pyspark.sql import functions as F

    from sales_etl_pipeline_spark.functions.core import xsum
    from sales_etl_pipeline_spark.sources.readers import load_table

    emb = load_table(spark, SF, "embeddings").select(
        F.explode(F.col("embedding").cast("array<double>")).alias("val")
    )
    sums = {
        emb.repartition(n).agg(xsum("val").alias("s")).first().s
        for n in (1, 7, 32)
    }
    assert len(sums) == 1  # bit-identical across partitionings


def test_arrow_dot_kernels_bit_match_catalyst_fold(spark):
    """The oracle-checked IVF path rests on the numpy kernels producing the
    SAME BITS as the Catalyst left fold (_dot_expr). Pin it: expression dot
    vs Arrow pair-dot kernel vs the row-dots kernel, exact float equality
    over real embedding pairs."""
    import numpy as np
    from pyspark.sql import functions as F

    from sales_etl_pipeline_spark.plans.llmdata import (
        _dot_expr,
        _embeddings_double,
        _foldexact_row_dots,
        _pair_dot_udf,
    )

    emb = _embeddings_double(spark, SF)
    a = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("ia"), F.col("v").alias("va")
    )
    b = emb.filter((F.col("vec_id") >= 20) & (F.col("vec_id") < 40)).select(
        F.col("vec_id").alias("ib"), F.col("v").alias("vb")
    )
    pair_dot = _pair_dot_udf()
    rows = (
        a.crossJoin(b)
        .select(
            "ia",
            "ib",
            "va",
            "vb",
            _dot_expr(F.col("va"), F.col("vb")).alias("expr_dot"),
            pair_dot(F.col("va"), F.col("vb")).alias("udf_dot"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert r.expr_dot == r.udf_dot  # exact bit agreement, no tolerance
        np_dot = _foldexact_row_dots(
            np.array([r.va], dtype=np.float64), np.array(r.vb, dtype=np.float64)
        )[0]
        assert r.expr_dot == np_dot


def test_zorder_write_multi_column_skipping(spark, tmp_path):
    """Z-order layout vs single-column sort, measured on real parquet
    footer stats (the min/max each file advertises to scan pruning):
    the date-sorted layout prunes nothing for part-key predicates; the
    z-ordered layout must prune on BOTH clustered columns at once, at
    the cost of some date-pruning sharpness. Data is preserved exactly
    (same rows, any order). Thresholds sit well under the measured
    values (z: 0.69 partkey / 0.52 shipdate; sorted: 0.0 / 0.92)."""
    import datetime
    import glob

    import pyarrow.parquet as pq

    from sales_etl_pipeline_spark.sources.writers import write_zordered

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem").select(
        "l_shipdate", "l_partkey", "l_quantity"
    )
    sorted_dir = str(tmp_path / "datesorted")
    z_dir = str(tmp_path / "zordered")
    (
        li.repartitionByRange(16, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(sorted_dir)
    )
    write_zordered(li, z_dir, ["l_shipdate", "l_partkey"], files=16)

    def file_stats(path, col):
        out = []
        for f in sorted(glob.glob(path + "/*.parquet")):
            md = pq.ParquetFile(f).metadata
            names = [md.schema.column(i).name for i in range(len(md.schema))]
            ci = names.index(col)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                mins.append(st.min)
                maxs.append(st.max)
            out.append((min(mins), max(maxs)))
        return out

    def avg_prune(stats, lo, hi, width, n=20):
        tot = 0.0
        for i in range(n):
            a = lo + (hi - lo - width) * (i / (n - 1))
            b = a + width
            tot += sum(1 for mn, mx in stats if mx < a or mn > b) / len(stats)
        return tot / n

    pk_lo, pk_hi = [
        (r[0], r[1])
        for r in li.agg(F.min("l_partkey"), F.max("l_partkey")).collect()
    ][0]
    pk_width = (pk_hi - pk_lo) * 0.05
    assert avg_prune(file_stats(sorted_dir, "l_partkey"), pk_lo, pk_hi, pk_width) <= 0.05
    assert avg_prune(file_stats(z_dir, "l_partkey"), pk_lo, pk_hi, pk_width) >= 0.5

    d_lo, d_hi = [
        (r[0], r[1])
        for r in li.agg(F.min("l_shipdate"), F.max("l_shipdate")).collect()
    ][0]
    d_width = datetime.timedelta(seconds=(d_hi - d_lo).total_seconds() * 0.05)
    assert avg_prune(file_stats(sorted_dir, "l_shipdate"), d_lo, d_hi, d_width) >= 0.8
    assert avg_prune(file_stats(z_dir, "l_shipdate"), d_lo, d_hi, d_width) >= 0.3

    # layout change only: the relation itself is untouched
    got = spark.read.parquet(z_dir)
    assert got.count() == li.count()
    assert got.agg(F.sum("l_partkey")).first()[0] == li.agg(F.sum("l_partkey")).first()[0]


def test_write_shuffled_deterministic_permutation(spark, tmp_path):
    """The corpus-shuffle writer must be a reproducible permutation:
    two runs with the same seed produce byte-identical per-file row
    sequences; a different seed produces a different global order;
    every row survives exactly once; and the order is actually mixed
    (not id-sorted)."""
    import glob

    from sales_etl_pipeline_spark.sources.writers import write_shuffled

    docs = load_table(spark, SF, "documents").select("doc_id", "source")

    def read_order(path):
        order = []
        for f in sorted(glob.glob(path + "/part-*.parquet")):
            order.extend(
                r.doc_id for r in spark.read.parquet(f).collect()
            )
        return order

    a1, a2, b = (str(tmp_path / n) for n in ("a1", "a2", "b"))
    write_shuffled(docs, a1, "doc_id", files=8, seed="epoch0")
    write_shuffled(docs, a2, "doc_id", files=8, seed="epoch0")
    write_shuffled(docs, b, "doc_id", files=8, seed="epoch1")
    o1, o2, ob = read_order(a1), read_order(a2), read_order(b)
    assert o1 == o2  # retry-stable
    assert sorted(o1) == sorted(ob) == sorted(
        r.doc_id for r in docs.collect()
    )  # complete, exactly once
    assert o1 != ob  # seeds decorrelate epochs
    assert o1 != sorted(o1)  # genuinely permuted


def test_compact_parquet_small_files(spark, tmp_path):
    """Small-files compaction: a 64-file write of a small relation must
    compact to the size-derived file count (1 here — total bytes are far
    under one target), preserving every row; a tiny target must yield
    multiple files."""
    from sales_etl_pipeline_spark.sources.writers import compact_parquet

    docs = load_table(spark, SF, "documents")
    src = str(tmp_path / "fragmented")
    docs.repartition(64).write.parquet(src)
    dest = str(tmp_path / "compacted")
    stats = compact_parquet(src, dest, spark=spark)
    assert stats["files_in"] == 64
    assert stats["files_out"] == 1
    back = spark.read.parquet(dest)
    assert back.count() == docs.count()
    assert {r.doc_id for r in back.select("doc_id").collect()} == {
        r.doc_id for r in docs.select("doc_id").collect()
    }
    dest2 = str(tmp_path / "recompacted")
    stats2 = compact_parquet(dest, dest2, target_bytes=16 * 1024, spark=spark)
    assert stats2["files_out"] > 1


def test_zorder_quantile_beats_linear_on_skew(spark, tmp_path):
    """On a power-law column, min/max (equi-width) quantization parks
    the dense region in a handful of levels and predicates there stop
    pruning; quantile (equi-populated) boundaries restore it. Measured
    on real footer stats: quantile ~0.78 dense-region prune vs linear
    ~0.48, while the uniform column keeps pruning on both layouts.
    Thresholds sit under the measured values."""
    import glob

    from pyspark.sql import functions as F

    from sales_etl_pipeline_spark.sources.writers import write_zordered

    df = spark.range(200000).select(
        F.floor(F.lit(1_000_000) / (1 + F.col("id") % 1000)).alias("skew_val"),
        (F.col("id") % 500).alias("uni"),
        F.col("id"),
    )
    lin, qtl = str(tmp_path / "lin"), str(tmp_path / "qtl")
    write_zordered(df, lin, ["skew_val", "uni"], files=16)
    write_zordered(df, qtl, ["skew_val", "uni"], files=16, quantile=True)

    import pyarrow.parquet as pq

    def stats(path, col):
        out = []
        for f in sorted(glob.glob(path + "/*.parquet")):
            md = pq.ParquetFile(f).metadata
            names = [md.schema.column(i).name for i in range(len(md.schema))]
            ci = names.index(col)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                s = md.row_group(rg).column(ci).statistics
                mins.append(s.min)
                maxs.append(s.max)
            out.append((min(mins), max(maxs)))
        return out

    def avg_prune(st, windows):
        return sum(
            sum(1 for mn, mx in st if mx < a or mn > b) / len(st)
            for a, b in windows
        ) / len(windows)

    dense = [(1000 + i * 900, 1400 + i * 900) for i in range(10)]
    uni_w = [(i * 48, i * 48 + 24) for i in range(10)]
    assert avg_prune(stats(lin, "skew_val"), dense) <= 0.55
    assert avg_prune(stats(qtl, "skew_val"), dense) >= 0.65
    assert avg_prune(stats(qtl, "uni"), uni_w) >= 0.6
    back = spark.read.parquet(qtl)
    assert back.count() == df.count()
    assert back.agg(F.sum("id")).first()[0] == df.agg(F.sum("id")).first()[0]


def test_dynamic_partition_pruning_on_dim_filter(spark, tmp_path):
    """Dynamic partition pruning — the 100-TB star-join mechanism the
    static PartitionFilters test can't show: the fact's partition filter
    comes from the FILTERED DIMENSION at runtime (a dynamicpruning
    subquery reusing the dim broadcast), so a selective dim predicate
    prunes fact partitions even though no literal year appears in the
    query. Scan-level evidence + count vs the literal-predicate twin."""
    orders = load_table(spark, SF, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_dpp")
    write_parquet(orders, path, partition_by=["order_year"])
    fact = spark.read.parquet(path)
    # year dimension with an OPAQUE attribute (constructed data, not an
    # expression of the key — else Catalyst constant-folds it into a
    # static partition filter and DPP never fires); the query filters
    # ONLY on the attribute, so the year can reach the fact scan through
    # the dynamicpruning subquery alone
    years = sorted(
        r.order_year for r in orders.select("order_year").distinct().collect()
    )
    dim = spark.createDataFrame(
        [(y, "focus" if y == 1996 else "other") for y in years],
        "order_year int, label string",
    )
    joined = fact.join(dim, "order_year").filter(F.col("label") == "focus")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    assert (
        joined.count()
        == orders.filter(F.col("order_year") == 1996).count()
    )


def test_skew_split_join_equals_plain_join(spark):
    """Hot/cold hybrid join ≡ the plain inner join exactly on a corpus
    with one extreme hot key, and the physical plan really has BOTH
    branches: a broadcast hash join for the hot slice and a shuffle join
    for the cold remainder."""
    from sales_etl_pipeline_spark.functions.core import skew_split_join

    # 1 hot key (5000 rows) + 500 cold keys (~4 rows each)
    fact = spark.range(0, 7000).select(
        F.when(F.col("id") < 5000, F.lit(7)).otherwise(
            (F.col("id") % 500) + 100
        ).alias("k"),
        (F.col("id") * 3).alias("payload"),
    )
    dim = spark.range(0, 700).select(
        F.col("id").alias("dk"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )
    # disable auto-broadcast so the toy-sized dim doesn't broadcast BOTH
    # branches: only the explicit hint on the hot slice may broadcast
    # (at production scale the dim exceeds the threshold on its own)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hybrid = skew_split_join(fact, dim, "k", "dk", hot_threshold=1000)
        plain = fact.join(dim, fact["k"] == dim["dk"], "inner")
        cols = ["k", "payload", "dk", "name"]
        assert sorted(map(tuple, hybrid.select(cols).collect())) == sorted(
            map(tuple, plain.select(cols).collect())
        )
        plan = hybrid._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        # the cold branch must NOT be broadcast: a shuffle join survives
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_skew_split_join_accepts_precomputed_hot_keys(spark):
    """Supplying the hot set (e.g. from the Misra–Gries sketch) skips the
    counting pass; a false-positive 'hot' key must not change results."""
    from sales_etl_pipeline_spark.functions.core import skew_split_join

    fact = spark.range(0, 400).select(
        (F.col("id") % 20).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.range(0, 20).select(
        F.col("id").alias("dk"), (F.col("id") * 10).alias("attr")
    )
    # claim keys 3 and 19 are hot, plus 999 which never occurs (FP)
    hot = spark.createDataFrame([(3,), (19,), (999,)], "k long")
    hybrid = skew_split_join(fact, dim, "k", "dk", hot_keys=hot)
    plain = fact.join(dim, fact["k"] == dim["dk"], "inner")
    cols = ["k", "payload", "dk", "attr"]
    assert sorted(map(tuple, hybrid.select(cols).collect())) == sorted(
        map(tuple, plain.select(cols).collect())
    )


def test_new_families_partition_invariant(spark):
    """The round-10 plan families' exactness claims (integer-cents
    variance, xsum PageRank in-flows, count-ratio transition
    probabilities, decimal-share thresholds, interpolation weights) must
    hold under ANY parallelism: the same plan must produce bit-identical
    rows at shuffle_partitions=3 and =32 — the local stand-in for the
    1000-executor determinism story."""
    from sales_etl_pipeline_spark.plans import (
        eventplans,
        graph,
        timeseries,
        tpch,
    )

    plans_under_test = [
        timeseries.daily_anomaly_flags,
        timeseries.hourly_value_interp,
        eventplans.event_transitions,
        tpch.important_part_value,
        graph.nation_trade_pagerank,
    ]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for fn in plans_under_test:
            results = []
            for n in ("3", "32"):
                spark.conf.set("spark.sql.shuffle.partitions", n)
                spark.catalog.clearCache()
                results.append(
                    sorted(tuple(r) for r in fn(spark, SF).collect())
                )
            assert results[0] == results[1], fn.__name__
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.catalog.clearCache()
