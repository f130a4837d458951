"""Graph analytics as relational plans: weighted PageRank over the
trade-flow graph (reference README.md:131-154 frames cross-country
analytics as the pipeline's downstream surface; a crawl-curation
pipeline runs the identical computation over the domain link graph to
score source authority — same plan, different edge table).

Sibling of the iterative family: ``near_dup_components`` (label
propagation / union-find, plans/llmdata.py:1646) and
``linear_probe_train`` (gradient descent, plans/llmdata.py:3258). Like
those, the iteration is EXACT and driver-bounded:

Scale design (SURVEY §4.3): nodes and edges live at dimension grain —
the only fact-grain work is the one edge-aggregation shuffle that
builds the weighted graph. Each PageRank step is a node×edge equi-join
+ a node-grain aggregate; ranks are re-anchored per step with an eager
``localCheckpoint`` so plan depth stays O(1) across iterations (the
bpe_merges discipline, plans/bpe.py). Driver traffic per step: one
1-row dangling-mass scalar. At a 10⁸-node domain graph the same plan
shuffles on node ids and never collects node-grain data.

Exactness (the cross-engine contract): edge weights are double
divisions of exact DECIMAL revenue sums; every per-step summation —
in-flow per node, dangling mass — goes through the fixed-point xsum
(functions/core.py:68; ranks are unit-scale, its design regime), so
both engines add EXACT binary fixed-point numbers with no
rounding-mode dependence; the damping update is the identical double
op tree. The DuckDB oracle replays all iterations as an unrolled
MATERIALIZED-CTE chain and the final ranks match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.core import oracle_xsum, xsum
from ..sources.readers import load_table
from .llmdata import _pin, release_plan_caches

#: standard damping factor; iterations fixed so the oracle can unroll
DAMPING = 0.85
N_ITERS = 8

_REVENUE = "l_extendedprice * (1 - l_discount)"


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    n_iters: int = N_ITERS,
    damping: float = DAMPING,
) -> DataFrame:
    """Weighted PageRank over an arbitrary graph — the reusable API the
    plan below instantiates (point it at a domain link graph for crawl
    source-authority scoring; the plan surface stays identical).

        r'(v) = (1-d)/N + d · ( Σ_{u→v} r(u)·w(u,v) + m/N )

    ``nodes``: one column ``node``. ``edges``: ``src``, ``dst``, ``w``
    with Σ_dst w(src, dst) = 1 per src (out-normalized). Dangling mass
    (nodes with no out-edges) is redistributed uniformly each step.
    Returns (node, rank). The caller owns edge materialization — pass a
    checkpointed/persisted edges relation when it feeds all iterations
    (every plan here does; the plans checkpoint, see
    nation_trade_pagerank)."""
    # source-node relation rides every round's dangling anti-join; a
    # checkpoint keeps its per-round plan a leaf scan (r17, the
    # components-loop evidence: per-round Catalyst re-analysis of a
    # cached relation's full logical plan dominates short rounds)
    sources = edges.select("src").distinct().localCheckpoint(eager=False)
    n = nodes.count()  # node-grain scalar, bounded driver traffic
    base = (1.0 - damping) / float(n)
    ranks = nodes.select("node", F.lit(1.0 / float(n)).alias("rank"))

    for _ in range(n_iters):
        # O(1) plan depth; LAZY (r16): each step's checkpoint
        # materializes inside the next consumer job (the dangling-mass
        # broadcast build) instead of as its own per-step job — ranks
        # asserted bit-identical, lazy won every same-JVM A/B
        # alternation (best 2.55 s vs 2.86 s, worst-case gap 6.8→3.7 s)
        ranks = ranks.localCheckpoint(eager=False)
        dangling = (
            ranks.join(sources, ranks.node == sources.src, "left_anti")
            .agg(F.coalesce(xsum("rank"), F.lit(0.0)).alias("m"))
        )
        inflow = (
            edges.join(ranks, edges.src == ranks.node)
            .select("dst", (F.col("rank") * F.col("w")).alias("c"))
            .groupBy("dst")
            .agg(xsum(F.col("c")).alias("inflow"))
        )
        ranks = (
            nodes.join(inflow, nodes.node == inflow.dst, "left")
            .join(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce("inflow", F.lit(0.0))
                        + F.col("m") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
        )
    return ranks


def nation_trade_pagerank(
    spark: SparkSession, sf_dir: str, n_iters: int = N_ITERS
) -> DataFrame:
    """Weighted PageRank over the supplier-nation → customer-nation
    trade graph: edge weight = that pair's share of the source nation's
    outbound revenue — the ``pagerank()`` API instantiated on the trade
    edge table. Returns (nation, rank) sorted by rank descending."""
    release_plan_caches()
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    flows = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .select(
            F.col("s_nationkey").cast("int").alias("src"),
            F.col("c_nationkey").cast("int").alias("dst"),
            F.expr(_REVENUE).alias("rev"),
        )
    )
    pair_dec = flows.groupBy("src", "dst").agg(
        F.sum(F.col("rev").cast("decimal(38,10)")).alias("rev_dec")
    )
    out_dec = pair_dec.groupBy(F.col("src").alias("osrc")).agg(
        F.sum("rev_dec").alias("out_dec")
    )
    # r17: localCheckpoint instead of the r15 cache pin — the weighted
    # edge relation feeds all 8 iterations, and with a cache each
    # round's join still re-analyzed the full fact-scan DAG behind the
    # InMemoryRelation; the checkpoint truncates it to a leaf scan.
    # Same-JVM interleaved A/B (ranks bit-identical): ckpt won 4 of 6
    # alternations (10.8<38.1, 6.8<8.3, 5.3<7.7, 6.2<15.0; warm-JVM
    # steady state is a wash — the win concentrates where analyzer JIT
    # is cold, and the per-round leaf plan is the scale-correct shape
    # either way). LAZY (eager=False) so materialization fuses into
    # round 1's first job instead of two upfront checkpoint jobs —
    # lazy won or tied every alternation (12.3<41.6, 5.9<10.2,
    # 4.66≈4.71 steal-clean).
    edges = (
        pair_dec.join(out_dec, pair_dec.src == F.col("osrc")).select(
            "src",
            "dst",
            (
                F.col("rev_dec").cast("double")
                / F.col("out_dec").cast("double")
            ).alias("w"),
        )
    ).localCheckpoint(eager=False)
    nodes = nation.select(F.col("n_nationkey").cast("int").alias("node"))
    ranks = pagerank(nodes, edges, n_iters=n_iters)

    named = nation.select(
        F.col("n_nationkey").cast("int").alias("nk"), "n_name"
    )
    return (
        ranks.join(F.broadcast(named), ranks.node == F.col("nk"))
        .select(F.col("n_name").alias("nation"), "rank")
        .orderBy(F.desc("rank"), "nation")
    )


def _pagerank_oracle(n_iters: int = N_ITERS) -> str:
    """Unrolled MATERIALIZED-CTE replay of the full iteration (the
    bpe_merges oracle discipline): same edge weights, same xsum
    fixed-point group sums, same damping op tree, same literals."""
    # DuckDB parses bare decimal-point literals as DECIMAL, so a naive
    # (1.0 - 0.85) is EXACT decimal 0.15 while Python/Spark compute the
    # IEEE subtraction (0.15000000000000002) — 1-ulp rank divergence.
    # Forcing DOUBLE literals reproduces the identical op tree.
    d = "CAST(0.85 AS DOUBLE)"
    one = "CAST(1.0 AS DOUBLE)"
    parts = [
        f"""
        WITH consts AS MATERIALIZED (
            SELECT CAST(COUNT(*) AS DOUBLE) AS nn FROM nation
        ),
        pair_dec AS MATERIALIZED (
            SELECT CAST(s_nationkey AS INTEGER) AS src,
                   CAST(c_nationkey AS INTEGER) AS dst,
                   SUM(CAST({_REVENUE} AS DECIMAL(38,10))) AS rev_dec
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY 1, 2
        ),
        edges AS MATERIALIZED (
            SELECT src, dst,
                   CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE)
                     / CAST(CAST(out_dec AS VARCHAR) AS DOUBLE) AS w
            FROM pair_dec
            JOIN (SELECT src AS osrc, SUM(rev_dec) AS out_dec
                  FROM pair_dec GROUP BY 1) o ON src = osrc
        ),
        nodes AS MATERIALIZED (
            SELECT CAST(n_nationkey AS INTEGER) AS node FROM nation
        ),
        r0 AS MATERIALIZED (
            SELECT node, 1.0 / nn AS rank FROM nodes, consts
        )"""
    ]
    for k in range(1, n_iters + 1):
        p, c = f"r{k - 1}", f"r{k}"
        parts.append(
            f""",
        dang{k} AS MATERIALIZED (
            SELECT COALESCE({oracle_xsum('rank')}, 0.0) AS m
            FROM {p}
            WHERE node NOT IN (SELECT DISTINCT src FROM edges)
        ),
        inf{k} AS MATERIALIZED (
            SELECT dst, {oracle_xsum('r.rank * e.w')} AS inflow
            FROM edges e JOIN {p} r ON e.src = r.node
            GROUP BY dst
        ),
        {c} AS MATERIALIZED (
            SELECT n.node,
                   ({one} - {d}) / consts.nn
                   + {d} * (COALESCE(i.inflow, 0.0) + dang{k}.m / consts.nn)
                       AS rank
            FROM nodes n
            LEFT JOIN inf{k} i ON n.node = i.dst
            CROSS JOIN dang{k}
            CROSS JOIN consts
        )"""
        )
    parts.append(
        f"""
        SELECT n_name AS nation, rank
        FROM r{n_iters}
        JOIN nation ON node = CAST(n_nationkey AS INTEGER)
        ORDER BY rank DESC, nation
        """
    )
    return "".join(parts)


#: BFS source for the hops plan and its oracle — nation key 0.
BFS_SOURCE = 0
#: recursion bound for the ORACLE's recursive CTE only: with UNION
#: (set) semantics the walk terminates at the diameter anyway, and any
#: bound ≥ |V|-1 (24 for the 25-nation graph) cannot truncate a true
#: distance. The Spark loop needs no cap — the visited-set anti-join
#: empties the frontier after at most |V| rounds.
MAX_HOPS = 25


def shortest_hops(
    nodes: DataFrame,
    edges: DataFrame,
    source,
    max_hops: int | None = None,
) -> DataFrame:
    """Single-source shortest hop counts (unweighted BFS) over an
    arbitrary directed graph — frontier-expansion as relational ops,
    the reachability twin of ``pagerank()`` (a crawl pipeline runs this
    on the domain link graph for crawl-depth / orphan-page audits).

    ``nodes``: one column ``node``; ``edges``: ``src``, ``dst``.
    Returns (node, hops) for REACHABLE nodes only — integer-exact, so
    the oracle needs no float contract at all.

    Scale design: each round shuffles only the CURRENT frontier against
    the edge table (equi-join on src) and anti-joins the visited set —
    never all-pairs, never whole-graph state per round beyond the
    visited relation (node grain). Rounds = graph diameter — the loop
    runs until the frontier empties, which BFS guarantees after at most
    |V| rounds (each node enters the frontier once); ``max_hops`` is an
    OPTIONAL early-stop for bounded-depth audits ("everything within k
    clicks"), not a termination requirement. Each round is re-anchored
    with an eager localCheckpoint (O(1) plan depth, the
    pagerank/bpe_merges discipline). Driver traffic per round: one
    1-row emptiness probe.
    """
    import itertools

    e = edges.select("src", "dst").distinct()
    dist = nodes.select("node").where(
        F.col("node") == F.lit(source)
    ).select("node", F.lit(0).alias("hops"))
    frontier = dist
    hops_iter = (
        range(1, max_hops + 1) if max_hops is not None else itertools.count(1)
    )
    for hop in hops_iter:
        dist = dist.localCheckpoint(eager=True)
        nxt = (
            frontier.join(e, frontier.node == e.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .select("node", F.lit(hop).alias("hops"))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():  # 1-row driver probe, bounded by the diameter
            break
        dist = dist.unionByName(nxt)
        frontier = nxt
    return dist


def nation_trade_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trade-reachability BFS: fewest trade hops from nation
    ``BFS_SOURCE`` to every reachable nation, where an edge is any
    supplier-nation → customer-nation pair with at least one shipped
    line. Returns (nation, hops) ordered by hops then name."""
    release_plan_caches()
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    # r17: checkpoint (not cache) — the BFS loop joins this relation
    # every round; a leaf scan keeps per-round plans O(1) (see the
    # pagerank edge note above)
    edges = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .select(
            F.col("s_nationkey").cast("int").alias("src"),
            F.col("c_nationkey").cast("int").alias("dst"),
        )
        .distinct()
    ).localCheckpoint(eager=False)
    nodes = nation.select(F.col("n_nationkey").cast("int").alias("node"))
    dist = shortest_hops(nodes, edges, BFS_SOURCE)
    named = nation.select(
        F.col("n_nationkey").cast("int").alias("nk"), "n_name"
    )
    return (
        dist.join(F.broadcast(named), dist.node == F.col("nk"))
        .select(
            F.col("n_name").alias("nation"),
            F.col("hops").cast("int").alias("hops"),
        )
        .orderBy("hops", "nation")
    )


def _hops_oracle() -> str:
    """DuckDB twin via WITH RECURSIVE: UNION (set semantics) keeps the
    walk table at (node × hop-count) grain — no path explosion — and
    MIN(hops) per node is exactly BFS distance. Integer-exact."""
    return f"""
        WITH RECURSIVE edges AS (
            SELECT DISTINCT CAST(s_nationkey AS INTEGER) AS src,
                            CAST(c_nationkey AS INTEGER) AS dst
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
        ),
        walk(node, hops) AS (
            SELECT CAST(n_nationkey AS INTEGER), 0
            FROM nation WHERE n_nationkey = {BFS_SOURCE}
            UNION
            SELECT e.dst, w.hops + 1
            FROM walk w JOIN edges e ON e.src = w.node
            WHERE w.hops < {MAX_HOPS}
        )
        SELECT n_name AS nation, CAST(MIN(hops) AS INTEGER) AS hops
        FROM walk JOIN nation ON node = CAST(n_nationkey AS INTEGER)
        GROUP BY n_name
        ORDER BY hops, nation
    """


def _undirected_trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical undirected trade edges (a < b): one fact-grain shuffle,
    then distinct at pair grain."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    pairs = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .select(
            F.least("s_nationkey", "c_nationkey").cast("int").alias("a"),
            F.greatest("s_nationkey", "c_nationkey").cast("int").alias("b"),
        )
    )
    return pairs.where(F.col("a") < F.col("b")).distinct()


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation over CANONICAL undirected edges
    (columns ``a``, ``b`` with a < b, deduplicated) — the reusable API
    the plan below instantiates (pagerank/shortest_hops house pattern).
    Each triangle a<b<c is enumerated exactly once by the double
    self-join; returns (node, n_triangles) for nodes in ≥1 triangle."""
    e1 = edges.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = edges.select(F.col("a").alias("y2"), F.col("b").alias("z"))
    e3 = edges.select(F.col("a").alias("x3"), F.col("b").alias("z3"))
    tris = (
        e1.join(e2, F.col("y") == F.col("y2"))
        .join(
            e3,
            (F.col("x") == F.col("x3")) & (F.col("z") == F.col("z3")),
        )
        .select("x", "y", "z")
    )
    return (
        tris.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def nation_trade_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle participation per nation over the undirected trade
    graph — the clustering/cohesion primitive (a crawl pipeline runs it
    on the domain graph to find link farms). Classic relational
    triangle enumeration: canonical a<b edges self-joined twice, each
    triangle (a<b<c) counted exactly once; integer-exact, so the oracle
    needs no float contract. Output (nation, n_triangles) for nations
    in ≥1 triangle.

    Scale: the join grain is edge×edge restricted by the canonical
    ordering (the standard worst-case-optimal-ish enumeration on a
    dimension-grain graph here; on a 10⁸-edge graph the same plan
    shuffles edges on their endpoints — add degree-ordering to bound
    skew, which the a<b canonicalization already approximates)."""
    release_plan_caches()
    e = _pin(_undirected_trade_edges(spark, sf_dir))
    per_node = triangle_counts(e)
    nation = load_table(spark, sf_dir, "nation")
    named = nation.select(
        F.col("n_nationkey").cast("int").alias("node"), "n_name"
    )
    return (
        per_node.join(F.broadcast(named), "node")
        .select(F.col("n_name").alias("nation"), "n_triangles")
        .orderBy("nation")
    )


_TRIANGLES_ORACLE = """
    WITH e AS (
        SELECT DISTINCT
               LEAST(CAST(s_nationkey AS INTEGER),
                     CAST(c_nationkey AS INTEGER)) AS a,
               GREATEST(CAST(s_nationkey AS INTEGER),
                        CAST(c_nationkey AS INTEGER)) AS b
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE s_nationkey <> c_nationkey
    ),
    tris AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1
        JOIN e e2 ON e2.a = e1.b
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    nodes AS (
        SELECT x AS node FROM tris
        UNION ALL SELECT y FROM tris
        UNION ALL SELECT z FROM tris
    )
    SELECT n_name AS nation, COUNT(*) AS n_triangles
    FROM nodes JOIN nation ON node = CAST(n_nationkey AS INTEGER)
    GROUP BY n_name
    ORDER BY nation
"""


LIBRARY_QUERIES = {
    "nation_trade_pagerank": nation_trade_pagerank,
    "nation_trade_hops": nation_trade_hops,
    "nation_trade_triangles": nation_trade_triangles,
}

LIBRARY_ORACLE = {
    "nation_trade_pagerank": _pagerank_oracle(),
    "nation_trade_hops": _hops_oracle(),
    "nation_trade_triangles": _TRIANGLES_ORACLE,
}
