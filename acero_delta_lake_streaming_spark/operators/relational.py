"""Relational operator catalog — the reference's query workload, Spark-first.

Every operator from SURVEY.md §2.2-2.7 (the pandas dashboard queries of
``visualizer.py`` and the Acero projection of ``collector.py:140-151``),
re-expressed as lazy DataFrame plans over the driver fixture tables. Each
query has a DuckDB oracle with identical column names and value semantics.

Scale notes (100 TB):
* filters/projections here all reach the parquet scan (PushedFilters /
  pruned ReadSchema) — the reference materializes everything first
  (visualizer.py:40-45);
* semi/anti joins against a filtered dimension broadcast automatically
  under AQE when the build side is small;
* group-by counts run as partial (map-side) + final hash aggregates, so
  shuffle volume is |groups|, not |rows|;
* top-k is `TakeOrderedAndProject` — no global sort.

Determinism notes (oracle hash parity):
* never emit raw timestamps (ns vs µs truncation differs) — cast to DATE
  or epoch ms;
* alias every computed column identically in Spark and SQL;
* deterministic tie-breaks on every LIMIT;
* windowed SUM of BIGINT is HUGEINT in DuckDB — cast back to BIGINT.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from acero_delta_lake_streaming_spark.catalog import load_table
from acero_delta_lake_streaming_spark.functions.timeutil import day_between
from acero_delta_lake_streaming_spark.plans.cache import scoped_persist
from acero_delta_lake_streaming_spark.schemas import EVENT_PROPS_SCHEMA

# --------------------------------------------------------------------------
# Projection / computed columns (P1-P3 — collector.py:140-151,110,182)
# --------------------------------------------------------------------------


def p1_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column projection by name — the reference's only Acero plan shape
    (``table_source -> project``, collector.py:140-151). Catalyst prunes the
    parquet scan to exactly these columns."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


def p2_computed_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal column attach (collector.py:110) + separator concat
    (collector.py:182) in one projection."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.lit("news").alias("feed"),
        F.concat_ws("\n", "lang", "source").alias("tag"),
    )


def p3_concat_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The extraction-text concat (collector.py:182:
    f"{title}\\n{description}") as a dedicated projection."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws("\n", "source", "text").alias("extract_text"),
    )


def p8_null_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-defaulting access (collector.py:98's missing-thumbnail →
    None): nullify a sentinel, then coalesce to a default."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.coalesce(
            F.nullif(F.col("source"), F.lit("src0")), F.lit("(default)")
        ).alias("source_or_default"),
    )


# --------------------------------------------------------------------------
# Filters / predicates (P4-P9 — visualizer.py:87-99,112)
# --------------------------------------------------------------------------


def p4_membership_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`isin` membership filter (visualizer.py:88). Pushed to the scan as
    an IN predicate."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_custkey", "o_orderpriority")
    )


def p5_date_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-range predicate on a timestamp (visualizer.py:89-90)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        day_between("o_orderdate", "1996-01-01", "1997-12-31")
    ).select("o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"))


def p6_anti_contains_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negated case-insensitive substring filter (visualizer.py:96-99).
    pandas `na=False` semantics (null text = no match = row kept under
    negation) are reproduced with coalesce-to-false."""
    docs = load_table(spark, sf_dir, "documents")
    no_spark = ~F.coalesce(F.contains(F.lower("text"), F.lit("spark")), F.lit(False))
    no_src1 = ~F.coalesce(F.contains(F.lower("source"), F.lit("src1")), F.lit(False))
    return docs.filter(no_spark & no_src1).select("doc_id", "lang", "source")


def p7_conjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND-composed predicate (visualizer.py:87-91): membership ∧ date
    range ∧ numeric threshold, all pushed down together."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        F.col("o_orderstatus").isin("F", "O")
        & day_between("o_orderdate", "1995-06-01", "1999-06-01")
        & (F.col("o_totalprice") > 1000.0)
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


def p9_boolean_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean-column filter (visualizer.py:112): compute a flag column,
    filter on it directly."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "is_discounted", F.col("l_discount") > 0.05
    )
    return li.filter("is_discounted").select(
        "l_orderkey", "l_linenumber", "l_discount"
    )


# --------------------------------------------------------------------------
# Joins (J1-J3 — visualizer.py:93,175-180,96-99)
# --------------------------------------------------------------------------


def j1_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (visualizer.py:93 — `isin` against another frame's
    column). Build side is filtered first so AQE broadcasts it."""
    li = load_table(spark, sf_dir, "lineitem")
    orders_f = load_table(spark, sf_dir, "orders").filter("o_orderstatus = 'F'")
    return li.join(
        orders_f, li.l_orderkey == orders_f.o_orderkey, "left_semi"
    ).select("l_orderkey", "l_linenumber")


def j2_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer equi join (visualizer.py:175-180). Unmatched keys are
    coalesced to -1 so the null row survives hashing identically in both
    engines."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left").select(
        "c_custkey",
        "c_name",
        F.coalesce("o_orderkey", F.lit(-1)).alias("o_orderkey_f"),
    )


def j3_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — the general form of the reference's NOT-EXISTS-style
    exclusion filters (visualizer.py:96-99). The build side is filtered to
    urgent orders so the anti set is non-empty at every SF (every customer
    has *some* order, not every customer has an urgent one) — keeps the
    oracle check exercising values instead of comparing two empty sets."""
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        "o_orderpriority = '1-URGENT'"
    )
    return cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# Bloom prefilter (j4): m bits / k hashes. 2^13 bits comfortably holds the
# fixture key set; at scale size m ≈ 10 bits per build key for ~1% false
# positives — still ~10× smaller than broadcasting the keys themselves.
_BLOOM_BITS = 8192
_BLOOM_K = 3


def _bloom_pos(h_col: str, k: int) -> str:
    """k-th 13-bit bloom position from an md5 HEX COLUMN — disjoint
    4-hex-digit slices of one hash (md5's 128 bits cover k=3 × 16 bits
    with room to spare; slicing one hash instead of salting three
    halves the probe's per-row cost). Pure Spark-side (the oracle
    never sees the bloom; false positives die in the exact join, so
    the final result is bloom-invariant)."""
    digits = " + ".join(
        f"(instr('0123456789abcdef', substr({h_col}, {4 * k + p + 1}, 1)) - 1)"
        f" * {16 ** (3 - p)}"
        for p in range(4)
    )
    return f"CAST(({digits}) % {_BLOOM_BITS} AS INT)"


def _bloom_build(keys: DataFrame, key_expr: str) -> DataFrame:
    """One-row bloom BITMAP over ``keys``: map<word index, 64-bit mask>
    (m/64 entries), built by bit_or-folding each key's k positions.
    A real bitmap, not a position array — each probe is then an O(1)
    map lookup + AND instead of an O(m) array scan (the array_contains
    form measured 7 s at sf0.1: 3 probes × 8192-element linear scans
    per fact row; this form is ~0.4 s)."""
    positions = [_bloom_pos("h", s) for s in range(_BLOOM_K)]
    return (
        keys.selectExpr(f"md5(cast({key_expr} as string)) AS h")
        .selectExpr(f"explode(array({', '.join(positions)})) AS pos")
        .selectExpr(
            "CAST(pos DIV 64 AS INT) AS w",
            "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)) AS bit",
        )
        .groupBy("w")
        .agg(F.expr("bit_or(bit)").alias("bits"))
        .groupBy()
        .agg(
            F.expr("map_from_entries(collect_list(struct(w, bits)))").alias(
                "bloom"
            )
        )
    )


def _bloom_passed(df: DataFrame, key_expr: str, bloom: DataFrame) -> DataFrame:
    """Rows of ``df`` whose ``key_expr`` passes all k bloom probes (the
    map-side prefilter; false positives possible, false negatives not)."""
    passed = df.withColumn(
        "_bloom_h", F.expr(f"md5(cast({key_expr} as string))")
    ).crossJoin(F.broadcast(bloom))
    for s in range(_BLOOM_K):
        p = _bloom_pos("_bloom_h", s)
        passed = passed.filter(
            F.expr(
                f"(coalesce(element_at(bloom, CAST(({p}) DIV 64 AS INT)), "
                "CAST(0 AS BIGINT)) & shiftleft(CAST(1 AS BIGINT), "
                f"CAST(({p}) % 64 AS INT))) != 0"
            )
        )
    return passed.drop("_bloom_h")


def j4_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join with a bloom-filter prefilter — the shuffle-avoidance
    pattern for a build side too large to broadcast as an exact hash
    set. The urgent-order keys are folded into an m-bit bloom (k md5
    hashes per key, one ~KB-scale array in a one-row broadcast); the
    lineitem scan drops rows failing any of the k membership probes
    BEFORE the exact semi join, so at 100 TB the shuffle carries only
    |matches| + |false positives| ≈ |matches| × (1 + fp_rate) rows
    instead of the whole fact table. No false negatives by
    construction (every true key set all k of its bits), so the exact
    join makes the result identical to a plain semi join — which is
    exactly what the oracle runs. Spark's own runtime row-level
    bloom (spark.sql.optimizer.runtimeFilter) automates this shape;
    here it is explicit, deterministic, and plan-pinned
    (pruning + no-false-negative contract measured in
    tests/test_properties.py)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    keys = orders.filter("o_orderpriority = '1-URGENT'").select("o_orderkey")
    passed = _bloom_passed(li, "l_orderkey", _bloom_build(keys, "o_orderkey"))
    return (
        passed.join(keys, passed.l_orderkey == keys.o_orderkey, "left_semi")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            # decimal-first: CAST(double AS BIGINT) truncates in Spark
            # but ROUNDS in DuckDB (CLAUDE.md gotcha) — integral today,
            # a silent hash flip the day quantities gain a fraction
            F.expr(
                "CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS BIGINT)"
            ).alias("qty"),
            F.expr(
                "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) * 100 "
                "AS BIGINT)"
            ).alias("cents"),
        )
    )


# --------------------------------------------------------------------------
# Aggregations (A1-A8 — visualizer.py:108-161,77-78)
# --------------------------------------------------------------------------


def a1_count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(*) metric (visualizer.py:108). Parquet aggregate pushdown can
    answer this from footer metadata without scanning rows."""
    return load_table(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("n_rows")
    )


def a2_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count distinct (visualizer.py:110). At 100 TB prefer
    approx_count_distinct (HLL, no shuffle explosion); exact here to match
    the oracle."""
    return load_table(spark, sf_dir, "lineitem").agg(
        F.countDistinct("l_partkey").alias("n_parts")
    )


def a3_filtered_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional count (visualizer.py:112) via count_if — no separate
    filter stage."""
    return load_table(spark, sf_dir, "lineitem").agg(
        F.expr("count_if(l_returnflag = 'R')").alias("n_returned")
    )


def a4_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed counts — the dashboard timeline (visualizer.py:115).
    Batch form of a 1-day tumbling window."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def a5_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-key frequency count (visualizer.py:136,160-161)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def a6_two_key_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-key group count (visualizer.py:139-140)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def a7_min_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max bounds (visualizer.py:77-78); answered from parquet column
    stats under aggregate pushdown."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("d_min"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("d_max"),
    )


def a8_grouped_total_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group counts plus per-partition total via window sum — the 'order
    stacked bars by per-group total' pattern (visualizer.py:152-155)."""
    g = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("o_orderpriority")
    return g.withColumn("total", F.sum("n").over(w).cast("bigint"))


# --------------------------------------------------------------------------
# Top-k (T1-T2 — visualizer.py:136,139)
# --------------------------------------------------------------------------


def t1_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 keys by frequency (visualizer.py:136). Deterministic
    tie-break (n desc, key asc); Spark plans TakeOrderedAndProject —
    per-partition heaps, no global sort."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("o_custkey"))
        .limit(10)
    )


def t3_sort_display(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-for-display (the pandas .head() previews, README.md:78-89):
    top-15 orders by price with a deterministic tie-break — planned as
    TakeOrderedAndProject like every bounded sort here."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(15)
    )


def t2_topk_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restrict to the top-10 key set, then break down by a second key
    (visualizer.py:139-140).

    One fact scan: aggregate to (custkey, status) counts first, persist
    that (|custkeys|×|statuses| rows — tiny next to the fact), derive the
    top-10 key set from it by re-aggregation, and semi-join back onto the
    cached counts. Round 2 recomputed t1's full fact aggregation inside
    this plan — at 100 TB that was a second full scan+shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    counts2 = scoped_persist(
        orders.groupBy("o_custkey", "o_orderstatus").agg(
            F.count(F.lit(1)).alias("n")
        )
    )
    top = (
        counts2.groupBy("o_custkey")
        .agg(F.sum("n").alias("tot"))
        .orderBy(F.desc("tot"), F.asc("o_custkey"))
        .limit(10)
        .select("o_custkey")
    )
    return counts2.join(F.broadcast(top), "o_custkey", "left_semi")


# --------------------------------------------------------------------------
# Set operations (U1-U2 — collector.py:190-201,231-240)
# --------------------------------------------------------------------------


def u1_union_discriminator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two slices unioned with a boolean discriminator — the main/other
    actor-list flatten shape (collector.py:190-201)."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter("o_orderstatus = 'F'").select(
        "o_orderkey", F.lit(True).alias("is_main")
    )
    b = orders.filter("o_orderstatus = 'O'").select(
        "o_orderkey", F.lit(False).alias("is_main")
    )
    return a.unionByName(b)


def u2_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-feed batch union (collector.py:231-240): append = union over
    slices."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter("o_orderpriority = '1-URGENT'")
    b = orders.filter("o_orderpriority = '3-MEDIUM'")
    return a.unionByName(b).select("o_orderkey", "o_orderpriority")


def a10_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile`` ≡
    DuckDB ``quantile_cont``, verified bit-equal). At 100 TB use
    ``approx_percentile`` (t-digest sketch, mergeable, no per-group
    sort) — the tolerance contract is pinned in tests/test_properties.py."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99"),
    )


def a14_sampled_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10's scale twin (the dq1→dq1b pattern): exact percentiles over a
    DETERMINISTIC 1/8 hash sample instead of the full table. The sample
    predicate is the first hex digit of md5(orderkey-linenumber) ∈
    {0,1} — a map-side filter both engines evaluate identically, so the
    'sample' is a pure function of the data, reproducible across runs,
    engines, and partitionings (what rand()-sampling can never give a
    hash gate). Per-group sort cost drops 8×; at 100 TB you tune the
    digit set (1/16 … 15/16) to bound per-group sample size and get
    ±O(1/√n_sample) quantile error with full reproducibility, while
    a10 stays the exact gate twin. n_sample is reported so consumers
    can compute the error bar."""
    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit("-"),
        F.col("l_linenumber").cast("string"),
    )
    samp = li.filter(F.substring(F.md5(key), 1, 1).isin("0", "1"))
    return samp.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sample"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50_s"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90_s"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias(
            "p99_s"
        ),
    )


def u3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — customers with both finished and open orders. Spark
    plans it as a left-semi over distinct sides; one shuffle per side."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter("o_orderstatus = 'F'").select("o_custkey")
    o = orders.filter("o_orderstatus = 'O'").select("o_custkey")
    return f.intersect(o)


def u4_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference of two priority slices' customer
    keys (keeps surplus multiplicity, unlike anti join)."""
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter("o_orderpriority = '1-URGENT'").select("o_custkey")
    high = orders.filter("o_orderpriority = '2-HIGH'").select("o_custkey")
    return urgent.exceptAll(high)


def a9_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (priority → status → grand total) — the
    grouping-sets family in one partial+final aggregation pass."""
    return (
        load_table(spark, sf_dir, "orders")
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def a12_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) with the grouping id — every
    subtotal combination in one pass, completing the grouping-sets
    family (ROLLUP = a9, PIVOT = a11). Spark expands the cube as one
    Expand + hash aggregate (4 grouping sets here); both engines put
    the leftmost cube column in the grouping id's high bit."""
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.grouping_id().cast("bigint").alias("gid"),
        )
    )


def a15_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the heterogeneous-subtotal member that
    completes the grouping family (ROLLUP = a9 is the prefix chain,
    CUBE = a12 is every combination; GROUPING SETS picks exactly the
    report's levels): (status, priority) detail + per-status subtotal
    + grand total in ONE pass. Spark expands the three sets as one
    Expand + hash aggregate — the input is scanned once however many
    sets the report wants, which is the whole point at 100 TB. The
    grouping id disambiguates a real NULL from an aggregated-away
    dimension; both engines put the leftmost column in the high bit
    (the a12 convention). Revenue folds as exact decimal cents."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupingSets(
            [
                ["o_orderstatus", "o_orderpriority"],
                ["o_orderstatus"],
                [],
            ],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.expr(
                "CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) * 100 "
                "AS BIGINT)"
            ).alias("cents"),
            F.grouping_id().cast("bigint").alias("gid"),
        )
    )


_A15_SQL = (
    "SELECT o_orderstatus, o_orderpriority, "
    "CAST(count(*) AS BIGINT) AS n, "
    "CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) * 100 AS BIGINT) "
    "AS cents, "
    "CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS gid "
    "FROM orders GROUP BY GROUPING SETS "
    "((o_orderstatus, o_orderpriority), (o_orderstatus), ())"
)


def a16_conditional_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/boolean aggregate suite — ``count_if``, ``every``,
    ``any`` (bool_and/bool_or in DuckDB's spelling), plus the
    filtered-aggregate form — the predicate-folding vocabulary that
    turns three scans of a monitoring query into one. All fold
    map-side like any other aggregate; shuffle volume is |types|."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.expr("count_if(value > 10.0)").cast("bigint").alias("n_big"),
        F.expr("every(value > 0.0)").alias("all_positive"),
        F.expr("any(value > 99.0)").alias("some_huge"),
        F.expr("count_if(user_id % 2 = 0)")
        .cast("bigint")
        .alias("n_even_users"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )


_A16_SQL = (
    "SELECT event_type, "
    "CAST(count(*) FILTER (WHERE value > 10.0) AS BIGINT) AS n_big, "
    "bool_and(value > 0.0) AS all_positive, "
    "bool_or(value > 99.0) AS some_huge, "
    "CAST(count(*) FILTER (WHERE user_id % 2 = 0) AS BIGINT) "
    "AS n_even_users, "
    "CAST(count(*) AS BIGINT) AS n "
    "FROM events GROUP BY 1"
)


def a13_salted_hot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-resistant aggregation plan driven end to end: per-type
    event totals through ``plans.skew.salted_agg`` — event_type has ~5
    values over the whole corpus, the textbook hot-key shape where a
    plain GROUP BY funnels every row of a key through ONE reduce task.
    Salting shards each key over 16 partial groups (first shuffle
    spreads the hot keys), then merges the shards; results are
    value-identical to the direct aggregate for any
    commutative+associative merge, which is exactly what the oracle's
    plain GROUP BY checks. Value totals accumulate as decimal partials
    (exact merge, CLAUDE.md) and emit as BIGINT micros."""
    from acero_delta_lake_streaming_spark.plans.skew import salted_agg

    events = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("decimal(18,6)").alias("v")
    )
    merged = salted_agg(
        events,
        ["event_type"],
        {
            "n": ("sum", F.count(F.lit(1))),
            "total": ("sum", F.sum("v")),
        },
    )
    return merged.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.expr("CAST(total * 1000000 AS BIGINT)").alias("total_micros"),
    )


def a11_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT — order counts per priority spread across status columns.
    Values are enumerated explicitly (``pivot(col, values)``) so Spark
    skips the extra distinct-values job and plans ONE hash aggregation;
    an open-ended pivot at 100 TB would first scan for distincts and
    then aggregate. Empty cells surface as NULL from pivot and are
    coalesced to 0 to match the oracle's FILTER counts."""
    piv = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(s), F.lit(0)).cast("bigint").alias(f"n_{s.lower()}")
            for s in ("F", "O", "P")
        ],
    )


# --------------------------------------------------------------------------
# Scalar functions (F1-F6 — collector.py:65-72,182; visualizer.py:89-98)
# --------------------------------------------------------------------------


def f_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function battery: to_date (F1/F2), lower+contains (F3),
    concat_ws (F4) in one projection."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
        F.concat_ws("|", "o_orderstatus", "o_orderpriority").alias("tag"),
        F.lower("o_orderpriority").alias("lp"),
        F.contains(F.lower("o_orderpriority"), F.lit("high")).alias("is_high"),
    )


def f7_regexp_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar battery: extract, replace, and match-test in one
    projection (all JVM regex, codegen-friendly)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("source", "([0-9]+)", 1).alias("src_num"),
        F.regexp_replace("lang", "^(en|fr)$", "eu").alias("lang_zone"),
        F.col("text").rlike("^[a-z]").alias("starts_lower"),
    )


def f8_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar battery over tokenized text: size, bounded slice,
    membership, distinct count, sorted head — the list-manipulation
    vocabulary the dedup/text operators build on."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.expr(_WORDS_FILTER)
    return docs.select(
        "doc_id",
        F.size(w).alias("n_words"),
        F.concat_ws("_", F.slice(w, 1, 3)).alias("head3"),
        F.array_contains(w, "spark").alias("has_spark"),
        F.size(F.array_distinct(w)).alias("n_distinct"),
        F.element_at(F.array_sort(w), 1).alias("first_sorted"),
    )


_WORDS_FILTER = "filter(split(text, ' '), x -> x != '')"


def f9_datetime_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime scalar battery over the event stream — the calendar
    vocabulary (ISO day-of-week, hour-of-day, ISO week, calendar day)
    a scheduling/traffic dashboard is built from, aligned across
    engines where their conventions differ: Spark's ``dayofweek`` is
    1=Sunday while DuckDB's ``isodow`` is 1=Monday, so the Spark side
    derives the ISO form with ``pmod(dayofweek+5, 7)+1``; ISO week
    (Spark ``weekofyear`` = DuckDB ``week``) agrees natively; calendar
    days count via the TZ-proof integer epoch-day (CLAUDE.md rule).
    One |types|×7 aggregate — shuffle volume is the group count."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(
            "event_type",
            F.expr("pmod(dayofweek(ts) + 5, 7) + 1")
            .cast("bigint")
            .alias("dow"),
            F.expr("hour(ts)").alias("hh"),
            F.expr("ts_ns DIV 86400000000000").alias("day"),
            F.expr("weekofyear(ts)").alias("wk"),
        )
        .groupBy("event_type", "dow")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("hh") < 6, 1).otherwise(0))
            .cast("bigint")
            .alias("n_night"),
            F.countDistinct("day").cast("bigint").alias("n_days"),
            F.countDistinct("wk").cast("bigint").alias("n_weeks"),
        )
    )


_F9_SQL = (
    "SELECT event_type, CAST(isodow(ts) AS BIGINT) AS dow, "
    "CAST(count(*) AS BIGINT) AS n, "
    "CAST(sum(CASE WHEN hour(ts) < 6 THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_night, "
    "CAST(count(DISTINCT epoch_ns(ts) // 86400000000000) AS BIGINT) "
    "AS n_days, "
    "CAST(count(DISTINCT week(ts)) AS BIGINT) AS n_weeks "
    "FROM events GROUP BY 1, 2"
)


def f6_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON decode (F6 — processor.py:115's tool-call parse): from_json
    with an explicit schema, then aggregate on the extracted field."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("k", F.from_json("props", EVENT_PROPS_SCHEMA).getField("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# Flatten / UDTF analog (UD2 — collector.py:168-206)
# --------------------------------------------------------------------------


def ud2_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row→N-rows flatten (the actor-list explode, collector.py:190-201)
    as split + explode + count. Row-count conservation = Σ array lengths."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# Flagship: the dashboard's full operator chain in one plan
# --------------------------------------------------------------------------


def flagship_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference dashboard's core chain (visualizer.py:87-140) on the
    star schema: filter (P4+P5) → semi join (J1) → anti-contains (P6) →
    top-10 (T1) → semi back (T2) → two-key counts (A6).

    news≈orders, actors≈lineitem, actor_name≈l_partkey, role≈l_returnflag.
    One Catalyst plan: both semi joins broadcast, aggregates partial+final.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    qualifying = orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM")
        & day_between("o_orderdate", "1995-01-01", "1999-12-31")
    ).select("o_orderkey")

    items = li.join(
        qualifying, li.l_orderkey == qualifying.o_orderkey, "left_semi"
    ).filter(~F.contains(F.lower("l_returnflag"), F.lit("a")))

    # DELIBERATE recompute of `items` in both branches. Measured at
    # sf0.1/local[32]: this shape runs 0.6 s warm vs 0.9 s for the
    # persist-the-(part,flag)-counts variant — the cache materialization
    # barrier costs more than the second scan, because the breakdown
    # branch aggregates only AFTER the broadcast top-10 semi join has
    # discarded ~99.9% of rows. On a disk-bound 100 TB cluster the
    # second scan is real IO; there, cache the (l_partkey,
    # l_returnflag) counts as t2_topk_breakdown does (same pattern,
    # measured win) — the flip is a two-line change, documented in
    # SCALING.md.
    top_parts = (
        items.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("l_partkey"))
        .limit(10)
        .select("l_partkey")
    )

    return (
        items.join(F.broadcast(top_parts), "l_partkey", "left_semi")
        .groupBy("l_partkey", "l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# Registry + oracles
# --------------------------------------------------------------------------

QUERIES = {
    "p1_project": p1_project,
    "p2_computed_columns": p2_computed_columns,
    "p3_concat_text": p3_concat_text,
    "p8_null_default": p8_null_default,
    "t3_sort_display": t3_sort_display,
    "p4_membership_filter": p4_membership_filter,
    "p5_date_range_filter": p5_date_range_filter,
    "p6_anti_contains_filter": p6_anti_contains_filter,
    "p7_conjunctive_filter": p7_conjunctive_filter,
    "p9_boolean_filter": p9_boolean_filter,
    "j1_semi_join": j1_semi_join,
    "j2_left_outer_join": j2_left_outer_join,
    "j3_anti_join": j3_anti_join,
    "j4_bloom_prefilter_join": j4_bloom_prefilter_join,
    "a1_count_star": a1_count_star,
    "a2_count_distinct": a2_count_distinct,
    "a3_filtered_count": a3_filtered_count,
    "a4_daily_counts": a4_daily_counts,
    "a5_value_counts": a5_value_counts,
    "a6_two_key_counts": a6_two_key_counts,
    "a7_min_max": a7_min_max,
    "a8_grouped_total_order": a8_grouped_total_order,
    "t1_topk": t1_topk,
    "t2_topk_breakdown": t2_topk_breakdown,
    "u1_union_discriminator": u1_union_discriminator,
    "u2_union_all": u2_union_all,
    "u3_intersect": u3_intersect,
    "u4_except_all": u4_except_all,
    "a9_rollup": a9_rollup,
    "a10_percentiles": a10_percentiles,
    "a14_sampled_percentiles": a14_sampled_percentiles,
    "a12_cube": a12_cube,
    "a15_grouping_sets": a15_grouping_sets,
    "a16_conditional_aggregates": a16_conditional_aggregates,
    "a13_salted_hot_agg": a13_salted_hot_agg,
    "a11_pivot": a11_pivot,
    "f_scalar_suite": f_scalar_suite,
    "f6_json_extract": f6_json_extract,
    "f7_regexp_suite": f7_regexp_suite,
    "f8_array_suite": f8_array_suite,
    "f9_datetime_suite": f9_datetime_suite,
    "ud2_explode_tokens": ud2_explode_tokens,
    "flagship_breakdown": flagship_breakdown,
}

ORACLES = {
    "p1_project": "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
    "p2_computed_columns": (
        "SELECT doc_id, 'news' AS feed, concat_ws(chr(10), lang, source) AS tag "
        "FROM documents"
    ),
    "p3_concat_text": (
        "SELECT doc_id, concat_ws(chr(10), source, text) AS extract_text "
        "FROM documents"
    ),
    "p8_null_default": (
        "SELECT doc_id, coalesce(nullif(source, 'src0'), '(default)') "
        "AS source_or_default FROM documents"
    ),
    "t3_sort_display": (
        "SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 15"
    ),
    "p4_membership_filter": (
        "SELECT o_orderkey, o_custkey, o_orderpriority FROM orders "
        "WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')"
    ),
    "p5_date_range_filter": (
        "SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date FROM orders "
        "WHERE CAST(o_orderdate AS DATE) "
        "BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'"
    ),
    "p6_anti_contains_filter": (
        "SELECT doc_id, lang, source FROM documents "
        "WHERE NOT COALESCE(contains(lower(text), 'spark'), FALSE) "
        "AND NOT COALESCE(contains(lower(source), 'src1'), FALSE)"
    ),
    "p7_conjunctive_filter": (
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders "
        "WHERE o_orderstatus IN ('F', 'O') "
        "AND CAST(o_orderdate AS DATE) "
        "BETWEEN DATE '1995-06-01' AND DATE '1999-06-01' "
        "AND o_totalprice > 1000.0"
    ),
    "p9_boolean_filter": (
        "SELECT l_orderkey, l_linenumber, l_discount FROM lineitem "
        "WHERE l_discount > 0.05"
    ),
    "j1_semi_join": (
        "SELECT l_orderkey, l_linenumber FROM lineitem "
        "WHERE l_orderkey IN "
        "(SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')"
    ),
    "j2_left_outer_join": (
        "SELECT c_custkey, c_name, COALESCE(o_orderkey, -1) AS o_orderkey_f "
        "FROM customer LEFT JOIN orders ON c_custkey = o_custkey"
    ),
    # NOT EXISTS (not NOT IN): matches left_anti's null semantics — a NULL
    # key on the build side must not empty the whole result.
    "j3_anti_join": (
        "SELECT c_custkey, c_name FROM customer "
        "WHERE NOT EXISTS (SELECT 1 FROM orders "
        "WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')"
    ),
    # The bloom prefilter is transparent (no false negatives; false
    # positives die in the exact join), so the oracle is the PLAIN semi
    # join — the equivalence is the contract.
    "j4_bloom_prefilter_join": (
        "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS BIGINT) AS qty, "
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) * 100 AS BIGINT) "
        "AS cents FROM lineitem WHERE l_orderkey IN "
        "(SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT') "
        "GROUP BY 1"
    ),
    "a1_count_star": "SELECT count(*) AS n_rows FROM lineitem",
    "a2_count_distinct": (
        "SELECT count(DISTINCT l_partkey) AS n_parts FROM lineitem"
    ),
    "a3_filtered_count": (
        "SELECT count(*) FILTER (WHERE l_returnflag = 'R') AS n_returned "
        "FROM lineitem"
    ),
    "a4_daily_counts": (
        "SELECT strftime(o_orderdate, '%Y-%m-%d') AS d, count(*) AS n "
        "FROM orders GROUP BY 1"
    ),
    "a5_value_counts": (
        "SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1"
    ),
    "a6_two_key_counts": (
        "SELECT l_returnflag, l_linestatus, count(*) AS n "
        "FROM lineitem GROUP BY 1, 2"
    ),
    "a7_min_max": (
        "SELECT strftime(min(o_orderdate), '%Y-%m-%d') AS d_min, "
        "strftime(max(o_orderdate), '%Y-%m-%d') AS d_max FROM orders"
    ),
    "a8_grouped_total_order": (
        "WITH g AS (SELECT o_orderpriority, o_orderstatus, count(*) AS n "
        "FROM orders GROUP BY 1, 2) "
        "SELECT o_orderpriority, o_orderstatus, n, "
        "CAST(SUM(n) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS total "
        "FROM g"
    ),
    "t1_topk": (
        "SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1 "
        "ORDER BY n DESC, o_custkey ASC LIMIT 10"
    ),
    "t2_topk_breakdown": (
        "WITH top AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1 "
        "ORDER BY n DESC, o_custkey ASC LIMIT 10) "
        "SELECT o.o_custkey, o.o_orderstatus, count(*) AS n FROM orders o "
        "WHERE o.o_custkey IN (SELECT o_custkey FROM top) GROUP BY 1, 2"
    ),
    "u1_union_discriminator": (
        "SELECT o_orderkey, TRUE AS is_main FROM orders "
        "WHERE o_orderstatus = 'F' "
        "UNION ALL "
        "SELECT o_orderkey, FALSE AS is_main FROM orders "
        "WHERE o_orderstatus = 'O'"
    ),
    "u2_union_all": (
        "SELECT o_orderkey, o_orderpriority FROM orders "
        "WHERE o_orderpriority = '1-URGENT' "
        "UNION ALL "
        "SELECT o_orderkey, o_orderpriority FROM orders "
        "WHERE o_orderpriority = '3-MEDIUM'"
    ),
    "u3_intersect": (
        "SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' "
        "INTERSECT "
        "SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'"
    ),
    "u4_except_all": (
        "SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT' "
        "EXCEPT ALL "
        "SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'"
    ),
    "a9_rollup": (
        "SELECT o_orderpriority, o_orderstatus, count(*) AS n "
        "FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)"
    ),
    "a15_grouping_sets": _A15_SQL,
    "a16_conditional_aggregates": _A16_SQL,
    "a12_cube": (
        "SELECT o_orderstatus, o_orderpriority, "
        "CAST(count(*) AS BIGINT) AS n, "
        "CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid "
        "FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)"
    ),
    "a13_salted_hot_agg": (
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) "
        "AS total_micros FROM events GROUP BY 1"
    ),
    "a10_percentiles": (
        "SELECT l_returnflag, "
        "round(quantile_cont(l_extendedprice, 0.5), 4) AS p50, "
        "round(quantile_cont(l_extendedprice, 0.9), 4) AS p90, "
        "round(quantile_cont(l_extendedprice, 0.99), 4) AS p99 "
        "FROM lineitem GROUP BY 1"
    ),
    "a14_sampled_percentiles": (
        "WITH s AS (SELECT l_returnflag, l_extendedprice FROM lineitem "
        "WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '-' || "
        "CAST(l_linenumber AS VARCHAR)), 1, 1) IN ('0', '1')) "
        "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_sample, "
        "round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_s, "
        "round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_s, "
        "round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_s "
        "FROM s GROUP BY 1"
    ),
    "a11_pivot": (
        "SELECT o_orderpriority, "
        "CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f, "
        "CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o, "
        "CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p "
        "FROM orders GROUP BY 1"
    ),
    "f_scalar_suite": (
        "SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date, "
        "concat_ws('|', o_orderstatus, o_orderpriority) AS tag, "
        "lower(o_orderpriority) AS lp, "
        "contains(lower(o_orderpriority), 'high') AS is_high "
        "FROM orders"
    ),
    "f6_json_extract": (
        "SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, "
        "count(*) AS n FROM events GROUP BY 1"
    ),
    "f7_regexp_suite": (
        "SELECT doc_id, "
        "coalesce(regexp_extract(source, '([0-9]+)', 1), '') AS src_num, "
        "regexp_replace(lang, '^(en|fr)$', 'eu') AS lang_zone, "
        "regexp_matches(text, '^[a-z]') AS starts_lower "
        "FROM documents"
    ),
    "f9_datetime_suite": _F9_SQL,
    "f8_array_suite": (
        "WITH d AS (SELECT doc_id, "
        "list_filter(string_split(text, ' '), x -> x <> '') AS w "
        "FROM documents) "
        "SELECT doc_id, len(w) AS n_words, "
        "array_to_string(w[1:3], '_') AS head3, "
        "list_contains(w, 'spark') AS has_spark, "
        "len(list_distinct(w)) AS n_distinct, "
        "list_sort(w)[1] AS first_sorted "
        "FROM d"
    ),
    "ud2_explode_tokens": (
        "SELECT tok AS token, count(*) AS n FROM "
        "(SELECT unnest(string_split(text, ' ')) AS tok FROM documents) "
        "WHERE tok <> '' GROUP BY 1"
    ),
    "flagship_breakdown": (
        "WITH qualifying AS ("
        "  SELECT o_orderkey FROM orders "
        "  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM') "
        "  AND CAST(o_orderdate AS DATE) "
        "      BETWEEN DATE '1995-01-01' AND DATE '1999-12-31'), "
        "items AS ("
        "  SELECT l_partkey, l_returnflag FROM lineitem "
        "  WHERE l_orderkey IN (SELECT o_orderkey FROM qualifying) "
        "  AND NOT contains(lower(l_returnflag), 'a')), "
        "top_parts AS ("
        "  SELECT l_partkey, count(*) AS n FROM items GROUP BY 1 "
        "  ORDER BY n DESC, l_partkey ASC LIMIT 10) "
        "SELECT i.l_partkey, i.l_returnflag, count(*) AS n FROM items i "
        "WHERE i.l_partkey IN (SELECT l_partkey FROM top_parts) GROUP BY 1, 2"
    ),
}
