"""Scalar/array column expressions shared across plans (SURVEY.md §2.8).

Everything here is a pure Catalyst expression (JVM-side, codegen-able) —
no Python UDFs. Each helper documents the oracle-parity contract it keeps
with DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def weekday_mon0(col) -> Column:
    """Day-of-week with Monday=0..Sunday=6 — pandas ``dt.dayofweek``
    semantics (reference etl.py:94). Spark ``weekday()`` is already
    Monday=0; the DuckDB oracle uses ``isodow(x) - 1``."""
    return F.weekday(col)


def title_case(col) -> Column:
    """Whitespace-split title case: ``initcap(trim(x))``. pandas
    ``str.title()`` (etl.py:102) also capitalizes after non-alpha chars —
    outputs coincide on the reference's country list (SURVEY §2.2 note);
    DuckDB oracle uses the identical-semantics ``initcap``."""
    return F.initcap(F.trim(col))


#: Exact-sum intermediate type. Inputs are doubles ≤ ~1e8 with ≤6 decimal
#: digits of true precision; scale 10 captures them exactly and precision 38
#: leaves 1e18 headroom for 100-TB row counts.
DEC = "decimal(38,10)"


def dsum(col) -> Column:
    """Order-independent exact sum of a double column.

    Double addition is non-associative, so a plain ``sum(double)`` differs
    between partitionings/engines by ~1 ulp — enough to break value-hash
    parity. Casting to decimal first makes the sum exact and associative:
    Spark and DuckDB produce bit-identical doubles no matter the partition
    count (SURVEY §7 'what's hard' #2). Oracle macro: ORACLE_DSUM.
    """
    c = col if isinstance(col, Column) else F.col(col)
    return F.sum(c.cast(DEC)).cast("double")


def davg(col) -> Column:
    """Exact-sum-based average: CAST(SUM(decimal) AS DOUBLE)/COUNT(x).
    Both engines then perform the identical double division → identical
    bits. Oracle macro: ORACLE_DAVG."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def oracle_dsum(expr: str, over: str = "") -> str:
    """DuckDB equivalent of dsum(). The VARCHAR hop matters: DuckDB's direct
    DECIMAL→DOUBLE cast (int128/1e10 in double arithmetic) can be 1 ulp off
    the correctly-rounded value; strtod on the decimal string is correctly
    rounded — matching Spark's BigDecimal.doubleValue exactly."""
    win = f" OVER {over}" if over else ""
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(38,10))){win} AS VARCHAR) AS DOUBLE)"


def oracle_davg(expr: str) -> str:
    return f"({oracle_dsum(expr)} / COUNT({expr}))"


def xsum(col, scale_bits: int = 60) -> Column:
    """Order-independent fixed-point sum for FULL-PRECISION doubles
    (embedding components, computed means) where dsum's DECIMAL(38,10)
    breaks parity: decimal quantization rounds a double's binary tail and
    the engines disagree at quantization boundaries (observed 1-quantum
    mismatches on float32-origin data).

    Semantics: Σ floor(x·2^scale_bits) / 2^scale_bits — fixed-point at
    2^-60 resolution. Every step is EXACT binary arithmetic with no
    rounding-mode dependence anywhere:
    - x·2^60 is a pure exponent shift (exact); for float32-origin values
      it is an exact integer, so floor() changes nothing and the sum is
      the true sum;
    - floor() (not a cast) splits the scaled value into hi/lo 30-bit
      integer halves summed as plain longs — identically defined in both
      engines, no ties to break;
    - the halves are recombined in DECIMAL(38,0) and cast to double,
      which IS correctly rounded in both engines (Spark
      BigDecimal.doubleValue; DuckDB via the VARCHAR hop).

    Why not sum(CAST(x·2^60 AS DECIMAL(38,0))) directly: Spark's
    double→decimal cast goes through Java's shortest round-trip string
    (Double.toString), which preserves the double but NOT its exact
    integer value — a 17-digit exact integer double can cast to a decimal
    off by several units. DuckDB converts exactly; the sums then diverge.
    Found the hard way; the hi/lo split never converts a >15-digit double
    to decimal.

    Overflow headroom: the long hi-sum needs rows · |x| · 2^(scale_bits-30)
    < 2^63 per group — for unit-scale values (embeddings) that is ~4·10^9
    rows; for money-scale values (~10^5) only ~10^5 rows, so dsum remains
    the right tool there (decimal quantization is benign for short-decimal
    money values — xsum exists for full-precision doubles, which are
    unit-scale in practice). Above the bound: cast hi/lo to DECIMAL(38,0)
    before summing, or salt-and-resum. Exactness cap: |x| ≤
    2^(83-scale_bits) keeps the hi half under 2^53. Oracle: ORACLE_XSUM.
    """
    c = col if isinstance(col, Column) else F.col(col)
    s = float(2**scale_bits)
    half = float(2**30)
    sv = c * F.lit(s)
    hi = F.floor(sv / F.lit(half))
    lo = F.floor(sv - hi.cast("double") * F.lit(half))
    return (
        (
            F.sum(hi).cast("decimal(38,0)") * F.lit(2**30)
            + F.sum(lo).cast("decimal(38,0)")
        ).cast("double")
        / F.lit(s)
    )


def oracle_xsum(expr: str, scale_bits: int = 60) -> str:
    """DuckDB equivalent of xsum(): identical floor-based hi/lo split;
    VARCHAR hop for the correctly-rounded decimal→double (oracle_dsum)."""
    s = 2**scale_bits
    sv = f"(({expr}) * {s})"
    hi = f"floor({sv} / 1073741824)"
    lo = f"floor({sv} - {hi} * 1073741824)"
    return (
        f"CAST(CAST((CAST(SUM(CAST({hi} AS BIGINT)) AS DECIMAL(38,0))"
        f" * 1073741824"
        f" + CAST(SUM(CAST({lo} AS BIGINT)) AS DECIMAL(38,0)))"
        f" AS VARCHAR) AS DOUBLE) / {s}"
    )


def md5_long(col) -> Column:
    """Deterministic 60-bit hash shared bit-for-bit with the DuckDB oracle:
    first 15 hex chars of md5, parsed base-16. Both engines use the same
    md5; DuckDB parses via ``CAST('0x' || substring(md5(x),1,15) AS BIGINT)``
    (oracle_md5_long). Used to build k seeded hash functions
    (``md5(concat(x, '#', seed))``) for MinHash/SimHash — unlike
    ``xxhash64``/``hash``, identical across engines.
    """
    c = col if isinstance(col, Column) else F.col(col)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def oracle_md5_long(expr: str) -> str:
    return f"CAST('0x' || substring(md5({expr}), 1, 15) AS BIGINT)"


def money(col, scale: int = 2) -> Column:
    """DEPRECATED for parity paths — kept for sink-side display rounding
    (reference etl.py:356-357). Use dsum/davg in oracle-checked plans."""
    return F.round(col, scale)


def salted_agg(df, keys, aggs, salt_buckets: int = 16):
    """Two-phase skew-safe aggregation: pre-aggregate on (keys + random
    salt) so one hot key spreads over ``salt_buckets`` reducers, then merge
    the partials on the true keys.

    Use when one group key dominates (the reference workload's UK-heavy
    country key, survey §4.2) and the aggregate is algebraic (sum/count/
    min/max — anything with a merge function). AQE's skew-join handling
    covers joins; this covers aggregations. ``aggs`` maps output column →
    (phase1_agg_fn, phase2_merge_fn), each Column-returning.

    Example::

        salted_agg(df, ["country"], {
            "revenue": (lambda: F.sum("amount"), lambda c: F.sum(c)),
            "n":       (lambda: F.count(F.lit(1)), lambda c: F.sum(c)),
        })
    """
    from pyspark.sql import functions as F  # local to avoid shadowing

    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("_salt")
    phase1 = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(
        *[fn1().alias(name) for name, (fn1, _) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[fn2(F.col(name)).alias(name) for name, (_, fn2) in aggs.items()]
    )


def skew_split_join(
    fact,
    dim,
    fact_key: str,
    dim_key: str,
    hot_threshold: int = 100_000,
    hot_keys=None,
):
    """Hot/cold hybrid equi-join for extreme key skew: rows whose join key
    is HOT (appears more than ``hot_threshold`` times in ``fact``) join
    against a broadcast of the matching dim slice — no shuffle, no sort,
    a hot key's rows stay spread across their map partitions — while the
    cold majority goes through the ordinary shuffle join. The union of
    the two branches is exactly the inner join.

    When to use vs the built-ins: AQE's OptimizeSkewedJoin already splits
    oversized sort-merge partitions at runtime and covers most skew; this
    explicit form is for when the skew is known ahead of time and you
    want a deterministic plan (no dependence on runtime stats), when the
    join runs where AQE can't re-plan (inside foreachBatch microbatches),
    or when a handful of keys are SO hot that even a split sort-merge
    partition still pays the sort — the broadcast branch does per-row
    hash lookups instead. Salting (``salted_agg``) is the aggregation
    analog.

    ``hot_keys``: optional pre-known hot-key DataFrame (single column
    named ``fact_key``) — supply it to skip the counting pass, e.g. from
    ``plans.llmdata.misra_gries`` (the mergeable heavy-hitter sketch:
    cardinality-independent shuffle, candidate-superset guarantee makes
    it safe here — a false-positive hot key merely rides the broadcast
    branch). Without it, one exact count pass over ``fact``'s key column
    finds the hot set (column-pruned scan; acceptable when the fact is
    re-read anyway, e.g. from cached parquet).

    The hot-key relation must be SMALL (it is ≤ #rows/hot_threshold keys
    by construction — a few thousand at most in any real corpus); it is
    broadcast into both semi/anti splits, and the dim slice it selects is
    at most that many rows, so the broadcast join is always holdable.

    Measured regime (BASELINE.md): at toy scale the hybrid LOSES — on a
    6M-row persisted fact with 30% of rows on one key (local[32],
    auto-broadcast off), plain shuffle join 1.2–1.3 s vs hybrid 1.6 s:
    local shuffle is memcpy and one 1.8M-row reducer partition is
    nothing, while the hybrid pays two extra broadcast-hash passes over
    the fact for the semi/anti split. The crossover is where a hot
    reducer partition stops fitting its executor (spill/OOM) or
    serializes a wave — a cluster-scale condition by definition. Use
    plain join + AQE first; reach for this when the hot keys are known
    and the skew is pathological.
    """
    from pyspark.sql import functions as F  # local to avoid shadowing

    if hot_keys is None:
        hot_keys = (
            fact.groupBy(fact_key)
            .agg(F.count(F.lit(1)).alias("_kn"))
            .filter(F.col("_kn") > hot_threshold)
            .select(fact_key)
        )
    hot_keys = F.broadcast(hot_keys)
    fact_hot = fact.join(hot_keys, fact_key, "left_semi")
    fact_cold = fact.join(hot_keys, fact_key, "left_anti")
    dim_hot = dim.join(
        hot_keys.withColumnRenamed(fact_key, dim_key), dim_key, "left_semi"
    )
    hot_joined = fact_hot.join(
        F.broadcast(dim_hot), fact_hot[fact_key] == dim_hot[dim_key], "inner"
    )
    cold_joined = fact_cold.join(
        dim, fact_cold[fact_key] == dim[dim_key], "inner"
    )
    return hot_joined.unionByName(cold_joined)


def tokens(col) -> Column:
    """Whitespace tokenization → array<string>. Oracle: string_split(x,' ')."""
    return F.split(col, " ")


def shingles(tokens_col, n: int = 3) -> Column:
    """n-token shingles of a token array (for Jaccard/MinHash dedup).

    transform(sequence(0, size-n), i -> concat_ws(' ', slice(toks, i+1, n)))
    Pure higher-order expression — evaluated JVM-side per row. Empty array
    when the document has < n tokens.

    NOTE: fine for ad-hoc array building, but do NOT use on a hot path —
    higher-order lambdas run interpreted and Catalyst may duplicate them
    into pushed-down filters. The dedup plans use the relational form
    instead (plans/llmdata.py:_shingle_table: posexplode + lead windows,
    fully codegen'd) — measured ~10× faster at corpus scale.
    """
    t = tokens_col if isinstance(tokens_col, Column) else F.col(tokens_col)
    return F.when(F.size(t) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(t) - n),
            lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)),
        )
    )


def cosine_similarity(a, b) -> Column:
    """Cosine similarity of two array<double> columns, as a pure
    higher-order expression: zip_with for the elementwise product,
    aggregate for the sums. Stays inside Catalyst (no UDF), so it is
    usable under whole-stage codegen in joins/windows.

    Oracle parity: DuckDB ``list_cosine_similarity(a::DOUBLE[], b)``.
    """
    a = a if isinstance(a, Column) else F.col(a)
    b = b if isinstance(b, Column) else F.col(b)
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)
