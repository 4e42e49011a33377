"""Sketch + data-quality operators: oracle-checkable approximate
distinct counting (KMV) and a one-scan column profiler.

The reference has no sketch layer (its aggregations are exact pandas
value_counts, visualizer.py:60-155); at 100 TB a pipeline needs
approximate distincts and cheap whole-table profiling before anything
else runs. Spark's production sketch is ``approx_count_distinct``
(HyperLogLog++), but its register layout is implementation-defined, so
it can never hash-match a DuckDB oracle. This module instead implements
a K-Minimum-Values sketch from first principles (Bar-Yossef et al. 2002)
with an md5-derived hash both engines compute bit-identically — the
sketch *semantics* (uniform hash, k-th order statistic, (k-1)/U_k
estimator) become testable, while the docstrings point the production
path at the built-in HLL.

Scale shape:

* x13: the hash-space projection runs map-side; the per-group distinct
  is a partial-aggregated shuffle on (event_type, h) — cardinality
  |distinct hashes|, never |events|. The k-th order statistic is then a
  salted two-stage aggregation (the sketch is mergeable by
  construction: k-min of a union = k-min of the per-cell k-mins), so
  no reducer ever holds a group's full distinct-hash set — the old
  full-distinct ``row_number`` window is gone.
* dq1: ONE scan of orders computes every per-column metric in a single
  multi-aggregate (null counts and min/max fold partially map-side;
  the exact count-distincts expand the shuffle 4x, which is the
  documented trade against ``approx_count_distinct`` at 100 TB). The
  wide 1-row result is unpivoted driver-free with ``stack``.

Parity notes: the 6-hex-digit hash integer uses the CLAUDE.md
``instr``/``strpos`` digit map (md5 is the only cross-engine hash);
all arithmetic is integer (``DIV`` / ``//``), no float anywhere;
``nullif`` guards the h_k=0 division edge on both sides.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from acero_delta_lake_streaming_spark.catalog import load_table

_K = 64  # order statistic kept by the KMV sketch
_SPACE = 16**6  # 6 hex digits -> hash space [0, 16^6)


def _hex6_int(md5_expr: str, instr_fn: str) -> str:
    """Integer in [0, 16^6) from the first 6 hex chars of an md5, as a
    portable SQL expression (``instr_fn``: Spark ``instr`` / DuckDB
    ``strpos``)."""
    terms = [
        f"({instr_fn}('0123456789abcdef', substr({md5_expr}, {p + 1}, 1)) - 1)"
        f" * {16 ** (5 - p)}"
        for p in range(6)
    ]
    return "(" + " + ".join(terms) + ")"


_HASH_SPARK = _hex6_int("md5(cast(user_id as string))", "instr")
_HASH_DUCK = _hex6_int("md5(cast(user_id as varchar))", "strpos")


_PREMERGE_CELLS = 32  # salt width of the k-min pre-merge


def kmv_distinct(events: DataFrame, key: str, hash_expr: str, k: int = _K) -> DataFrame:
    """Library form: KMV distinct estimate of ``hash_expr``'s source
    column per ``key``. Returns (key, est bigint, n_hashes bigint).

    The k-th order statistic is computed with a salted two-stage
    aggregation, exploiting that the sketch is mergeable (k-min of a
    union = k-min of the per-cell k-mins): distinct hashes fan out to
    ``(key, h % CELLS)`` cells that each keep only their k smallest,
    then the per-key merge sorts ≤ k·CELLS values. No window anywhere —
    the old ``row_number`` ranking put every distinct hash of a group
    on one reducer (O(distinct) state on a handful of hot partitions);
    here reducer state is bounded by O(distinct/CELLS) transiently and
    O(k·CELLS) at the merge, at any corpus size."""
    h = events.selectExpr(key, f"{hash_expr} AS h").distinct()
    cells = (
        h.groupBy(key, F.pmod(F.col("h"), F.lit(_PREMERGE_CELLS)).alias("cell"))
        .agg(
            F.expr(f"slice(sort_array(collect_list(h)), 1, {k})").alias("mins"),
            F.count(F.lit(1)).alias("c"),
        )
    )
    merged = cells.groupBy(key).agg(
        F.expr(
            # try_element_at: NULL (not an ANSI error) when < k hashes exist;
            # that branch only feeds the n_hashes < k fallback anyway.
            f"try_element_at(slice(array_sort(flatten(collect_list(mins))), 1, {k}), {k})"
        ).alias("h_k"),
        F.sum("c").alias("n_hashes"),
    )
    return merged.select(
        key,
        F.when(
            F.col("n_hashes") >= k,
            F.expr(f"({k - 1} * {_SPACE}) DIV nullif(h_k, 0)"),
        )
        .otherwise(F.col("n_hashes"))
        .cast("bigint")
        .alias("est"),
        F.col("n_hashes").cast("bigint").alias("n_hashes"),
    )


def x13_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event type via a 64-minimum-values
    sketch, alongside the exact count so the estimator's error is
    visible in the result itself."""
    events = load_table(spark, sf_dir, "events")
    est = kmv_distinct(events, "event_type", _HASH_SPARK).select(
        "event_type", F.col("est").alias("est_users")
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_users")
    )
    return est.join(exact, "event_type")


_X13_SQL = (
    f"WITH h AS (SELECT DISTINCT event_type, {_HASH_DUCK} AS h FROM events), "
    "r AS (SELECT event_type, h, row_number() OVER "
    "(PARTITION BY event_type ORDER BY h) AS rn FROM h), "
    f"g AS (SELECT event_type, max(CASE WHEN rn = {_K} THEN h END) AS h_k, "
    "count(*) AS n_hashes FROM r GROUP BY 1), "
    "e AS (SELECT event_type, count(DISTINCT user_id) AS exact_users "
    "FROM events GROUP BY 1) "
    f"SELECT g.event_type, CAST(CASE WHEN n_hashes >= {_K} THEN "
    f"({_K - 1} * {_SPACE}) // nullif(h_k, 0) ELSE n_hashes END AS BIGINT) "
    "AS est_users, CAST(exact_users AS BIGINT) AS exact_users "
    "FROM g JOIN e USING (event_type)"
)

# (column spark-name, null-check expr is shared, min/max projection pair)
_PROFILE_COLS = [
    ("o_orderstatus", "o_orderstatus", "o_orderstatus"),
    ("o_orderpriority", "o_orderpriority", "o_orderpriority"),
    ("o_custkey", "cast(o_custkey as string)", "cast(o_custkey as varchar)"),
]


def dq1_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan profile of ``orders``: per column, row count, null
    count, exact distinct count, and min/max (string-typed so the
    schema is uniform across column types). The date column is
    formatted to ISO to keep timestamps out of the result."""
    orders = load_table(spark, sf_dir, "orders")
    # The fixture parquet is one row group, so the 7-column
    # countDistinct Expand (x8 the row stream) otherwise grinds through
    # ONE partial-agg task (measured 1.35 s single-task CPU at sf0.1,
    # r13). Spread conditionally: a many-split production scan never
    # repartitions, and the target follows defaultParallelism
    # (guide §2.5 input-parallelism fix). The .rdd partition probe is
    # build-time-only driver work (plans the scan splits, runs no job)
    # — file count would under-read a single huge multi-split file.
    par = spark.sparkContext.defaultParallelism
    if orders.rdd.getNumPartitions() < par:
        orders = orders.repartition(par)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, sp, _ in _PROFILE_COLS:
        aggs += [
            F.sum(F.when(F.col(name).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"nn_{name}"),
            F.countDistinct(name).cast("bigint").alias(f"nd_{name}"),
            F.expr(f"min({sp})").alias(f"mn_{name}"),
            F.expr(f"max({sp})").alias(f"mx_{name}"),
        ]
    aggs += [
        F.sum(F.when(F.col("o_orderdate").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("nn_o_orderdate"),
        F.countDistinct("o_orderdate").cast("bigint").alias("nd_o_orderdate"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("mn_o_orderdate"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("mx_o_orderdate"),
    ]
    wide = orders.agg(*aggs)
    names = [c for c, _, _ in _PROFILE_COLS] + ["o_orderdate"]
    stack = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in names
    )
    return wide.selectExpr(
        "n_rows",
        f"stack({len(names)}, {stack}) AS "
        "(col_name, n_null, n_distinct, min_val, max_val)",
    ).select("col_name", "n_rows", "n_null", "n_distinct", "min_val", "max_val")


def _profile_union_sql() -> str:
    parts = []
    for name, _, du in _PROFILE_COLS:
        parts.append(
            f"SELECT '{name}' AS col_name, count(*) AS n_rows, "
            f"CAST(sum(CASE WHEN {name} IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_null, "
            f"CAST(count(DISTINCT {name}) AS BIGINT) AS n_distinct, "
            f"min({du}) AS min_val, max({du}) AS max_val FROM orders"
        )
    parts.append(
        "SELECT 'o_orderdate' AS col_name, count(*) AS n_rows, "
        "CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_null, "
        "CAST(count(DISTINCT o_orderdate) AS BIGINT) AS n_distinct, "
        "strftime(min(o_orderdate), '%Y-%m-%d') AS min_val, "
        "strftime(max(o_orderdate), '%Y-%m-%d') AS max_val FROM orders"
    )
    return " UNION ALL ".join(parts)


_DQ1_SQL = _profile_union_sql()


# dq1b: (name, minmax expr spark/duck, distinct-encoding expr spark/duck).
# The encoding turns every column into the string md5 hashes, preserving
# distinctness (o_orderdate is date-granular in the fixture, so ISO dates
# are injective on it).
_DQ1B_COLS = [
    ("o_orderstatus", "o_orderstatus", "o_orderstatus",
     "o_orderstatus", "o_orderstatus"),
    ("o_orderpriority", "o_orderpriority", "o_orderpriority",
     "o_orderpriority", "o_orderpriority"),
    ("o_custkey", "cast(o_custkey as string)", "cast(o_custkey as varchar)",
     "cast(o_custkey as string)", "cast(o_custkey as varchar)"),
    ("o_orderdate",
     "date_format(o_orderdate, 'yyyy-MM-dd')",
     "strftime(o_orderdate, '%Y-%m-%d')",
     "date_format(o_orderdate, 'yyyy-MM-dd')",
     "strftime(o_orderdate, '%Y-%m-%d')"),
]


def dq1b_approx_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale twin of dq1: distinct counts via the KMV sketch instead of
    exact ``countDistinct``. dq1's single multi-aggregate pays a 4×
    Expand of orders to dedupe per column — a non-starter at 100 TB.
    Here the base metrics (count/nulls/min/max) stay a pure map-side
    fold with no Expand, and distincts go through an unpivoted
    ``(col_name, hash)`` projection whose shuffle is O(Σ distinct)
    after map-side partial dedup, never O(4N) rows. Cardinalities
    below k=64 come back exact (the sketch degenerates to the count);
    larger ones carry the (k-1)/U_k estimate. Unlike
    ``approx_count_distinct`` (HLL register layout is
    implementation-defined) every value here is oracle-checkable."""
    orders = load_table(spark, sf_dir, "orders")
    # Same single-row-group fixture as dq1: the x4 stack unpivot + md5
    # + KMV partial agg otherwise runs as one task (guide §2.5).
    par = spark.sparkContext.defaultParallelism
    if orders.rdd.getNumPartitions() < par:
        orders = orders.repartition(par)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for name, sp, _, _, _ in _DQ1B_COLS:
        aggs += [
            F.sum(F.when(F.col(name).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"nn_{name}"),
            F.expr(f"min({sp})").alias(f"mn_{name}"),
            F.expr(f"max({sp})").alias(f"mx_{name}"),
        ]
    wide = orders.agg(*aggs)
    stack = ", ".join(
        f"'{name}', nn_{name}, mn_{name}, mx_{name}"
        for name, *_ in _DQ1B_COLS
    )
    base = wide.selectExpr(
        "n_rows",
        f"stack({len(_DQ1B_COLS)}, {stack}) AS "
        "(col_name, n_null, min_val, max_val)",
    )
    unpivot = ", ".join(
        f"'{name}', CASE WHEN {name} IS NOT NULL THEN {enc} END"
        for name, _, _, enc, _ in _DQ1B_COLS
    )
    pairs = (
        orders.selectExpr(
            f"stack({len(_DQ1B_COLS)}, {unpivot}) AS (col_name, v)"
        )
        .filter(F.col("v").isNotNull())
    )
    est = kmv_distinct(pairs, "col_name", _hex6_int("md5(v)", "instr")).select(
        "col_name", F.col("est").alias("est_distinct")
    )
    return base.join(F.broadcast(est), "col_name").select(
        "col_name", "n_rows", "n_null", "est_distinct", "min_val", "max_val"
    )


def _dq1b_sql() -> str:
    unpivot = " UNION ALL ".join(
        f"SELECT '{name}' AS col_name, {enc} AS v FROM orders "
        f"WHERE {name} IS NOT NULL"
        for name, _, _, _, enc in _DQ1B_COLS
    )
    hash_expr = _hex6_int("md5(v)", "strpos")
    base = " UNION ALL ".join(
        f"SELECT '{name}' AS col_name, CAST(count(*) AS BIGINT) AS n_rows, "
        f"CAST(sum(CASE WHEN {name} IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS n_null, min({mm}) AS min_val, max({mm}) AS max_val FROM orders"
        for name, _, mm, _, _ in _DQ1B_COLS
    )
    return (
        f"WITH pairs AS ({unpivot}), "
        f"h AS (SELECT DISTINCT col_name, {hash_expr} AS h FROM pairs), "
        "r AS (SELECT col_name, h, row_number() OVER "
        "(PARTITION BY col_name ORDER BY h) AS rn FROM h), "
        f"g AS (SELECT col_name, max(CASE WHEN rn = {_K} THEN h END) AS h_k, "
        "count(*) AS n_hashes FROM r GROUP BY 1), "
        f"est AS (SELECT col_name, CAST(CASE WHEN n_hashes >= {_K} THEN "
        f"({_K - 1} * {_SPACE}) // nullif(h_k, 0) ELSE n_hashes END AS BIGINT) "
        "AS est_distinct FROM g), "
        f"base AS ({base}) "
        "SELECT col_name, n_rows, n_null, est_distinct, min_val, max_val "
        "FROM base JOIN est USING (col_name)"
    )


_DQ1B_SQL = _dq1b_sql()


# Expectation rules over orders: (rule name, violation predicate —
# identical text in Spark SQL and DuckDB).
_DQ2_RULES = [
    ("positive_price", "o_totalprice <= 0"),
    ("status_domain", "o_orderstatus NOT IN ('F', 'O', 'P')"),
    ("orderdate_not_null", "o_orderdate IS NULL"),
    ("priority_format", "o_orderpriority NOT LIKE '%-%'"),
]


def dq2_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation checks (Delta constraints / Great-Expectations
    shape): every rule's violation count plus an FK referential check
    (orders.o_custkey ⊆ customer.c_custkey). ONE scan: the dimension
    broadcast-left-joins in, every rule — including the FK orphan
    check — becomes a conditional sum in a single multi-aggregate, and
    ``stack`` unpivots to one row per rule. Emitting counts (not
    booleans) keeps the check actionable: the violation volume IS the
    triage signal at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    joined = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left"
    )
    all_rules = _DQ2_RULES + [("fk_customer", "c_custkey IS NULL")]
    wide = joined.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        *[
            F.sum(F.when(F.expr(pred), 1).otherwise(0))
            .cast("bigint")
            .alias(f"v_{name}")
            for name, pred in all_rules
        ],
    )
    stack = ", ".join(f"'{name}', v_{name}" for name, _ in all_rules)
    return wide.selectExpr(
        "n_rows",
        f"stack({len(all_rules)}, {stack}) AS (rule, n_violations)",
    ).select("rule", "n_rows", "n_violations")


def _dq2_sql() -> str:
    rules = _DQ2_RULES + [("fk_customer", "ck IS NULL")]
    parts = [
        f"SELECT '{name}' AS rule, CAST(count(*) AS BIGINT) AS n_rows, "
        f"CAST(sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_violations FROM j"
        for name, pred in rules
    ]
    return (
        "WITH j AS (SELECT o.*, c.c_custkey AS ck FROM orders o "
        "LEFT JOIN customer c ON o.o_custkey = c.c_custkey) "
        + " UNION ALL ".join(parts)
    )


_DQ2_SQL = _dq2_sql()


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005): d independent hash
# rows x w counters; est(key) = min over rows of counter[h_j(key)].
# Spark's native frequent-items path (``approx_count_distinct`` has no
# frequency twin; ``stat.freqItems`` is RDD-ish and non-deterministic
# across partitionings) cannot hash-match an oracle, so — like the KMV
# above — the sketch is built from first principles on the md5 digit
# map both engines share.

_CMS_D = 4  # hash rows
_CMS_W = 256  # counters per row (2 hex digits)


def _hex2_int(md5_expr: str, instr_fn: str) -> str:
    """Integer in [0, 256) from the first 2 hex chars of an md5."""
    return (
        f"(({instr_fn}('0123456789abcdef', substr({md5_expr}, 1, 1)) - 1) * 16"
        f" + ({instr_fn}('0123456789abcdef', substr({md5_expr}, 2, 1)) - 1))"
    )


_CMS_MD5_SPARK = "md5(concat(cast(j as string), ':', cast(user_id as string)))"
_CMS_MD5_DUCK = "md5(CAST(j AS VARCHAR) || ':' || CAST(user_id AS VARCHAR))"


def cms_sketch(df: DataFrame, key: str, d: int = _CMS_D) -> DataFrame:
    """Build the (j, bucket, cnt) sketch table for ``key``. The
    per-row fan-out (x``d``) partial-aggregates map-side, so the
    shuffled state is at most d*w = 1024 cells regardless of input
    size — the whole point of a sketch at 100 TB."""
    rows = df.select(key).withColumn(
        "j", F.explode(F.array(*[F.lit(j) for j in range(d)]))
    )
    bucket = _hex2_int(_CMS_MD5_SPARK.replace("user_id", key), "instr")
    return (
        rows.withColumn("bucket", F.expr(bucket))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def x17_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 users by count-min estimated event frequency, with the
    exact count alongside so the one-sided error (est >= exact) is
    visible in the result. The probe side joins the 1024-cell sketch
    (broadcast) against the distinct keys; at 100 TB the sketch is
    built once and probed by any later stage without rescanning."""
    events = load_table(spark, sf_dir, "events")
    sketch = cms_sketch(events, "user_id")
    probe = (
        events.select("user_id")
        .distinct()
        .withColumn("j", F.explode(F.array(*[F.lit(j) for j in range(_CMS_D)])))
        .withColumn("bucket", F.expr(_hex2_int(_CMS_MD5_SPARK, "instr")))
    )
    est = (
        probe.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("user_id")
        .agg(F.min("cnt").cast("bigint").alias("est"))
    )
    exact = events.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact")
    )
    return (
        est.join(exact, "user_id")
        .orderBy(F.desc("est"), "user_id")
        .limit(20)
    )


_X17_SQL = (
    "WITH js AS (SELECT unnest([0, 1, 2, 3]) AS j), "
    "rows AS (SELECT user_id, j, "
    f"{_hex2_int(_CMS_MD5_DUCK, 'strpos')} AS bucket FROM events, js), "
    "sketch AS (SELECT j, bucket, count(*) AS cnt FROM rows "
    "GROUP BY 1, 2), "
    "probe AS (SELECT DISTINCT user_id FROM events), "
    "pb AS (SELECT user_id, j, "
    f"{_hex2_int(_CMS_MD5_DUCK, 'strpos')} AS bucket FROM probe, js), "
    "est AS (SELECT user_id, CAST(min(cnt) AS BIGINT) AS est "
    "FROM pb JOIN sketch USING (j, bucket) GROUP BY 1), "
    "exact AS (SELECT user_id, CAST(count(*) AS BIGINT) AS exact "
    "FROM events GROUP BY 1) "
    "SELECT user_id, est, exact FROM est JOIN exact USING (user_id) "
    "ORDER BY est DESC, user_id LIMIT 20"
)


# --------------------------------------------------------------------------
# x27 — HyperLogLog distinct sketch
# --------------------------------------------------------------------------

_HLL_M = 256  # registers (b = 8 bucket bits); std error ≈ 1.04/√m ≈ 6.5%


def _hll_exprs(md5_expr: str, pos_fn: str) -> tuple[str, str]:
    """(bucket, rank) SQL for one HLL observation from an md5 hex
    string: bucket = first 2 hex digits (8 bits → 256 registers), rank
    = leading-zero count of the NEXT 8 hex digits as a 32-bit word,
    plus one. Pure digit arithmetic on the cross-engine hash — the
    only float in the whole sketch is the final one-row estimate."""
    d = "0123456789abcdef"
    bucket = (
        f"(({pos_fn}('{d}', substr({md5_expr}, 1, 1)) - 1) * 16 "
        f"+ ({pos_fn}('{d}', substr({md5_expr}, 2, 1)) - 1))"
    )
    v = "(" + " + ".join(
        f"({pos_fn}('{d}', substr({md5_expr}, {p + 3}, 1)) - 1)"
        f" * CAST({16 ** (7 - p)} AS BIGINT)"
        for p in range(8)
    ) + ")"
    # bitlength via length(bin(v)) — identical minimal-bits semantics in
    # Spark and DuckDB (bin(0) = '0' needs the CASE)
    rank = f"(CASE WHEN {v} = 0 THEN 33 ELSE 33 - length(bin({v})) END)"
    return bucket, rank


def x27_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog estimate of distinct ``l_orderkey`` over lineitem —
    the register-based approximate-distinct that completes the sketch
    family (KMV = x13 keeps order statistics; HLL keeps 256 one-byte
    registers and merges by element-wise max, which is exactly what the
    ``groupBy(bucket).max(rank)`` does: the shuffle IS the merge, 256
    rows total regardless of corpus size — the O(1)-state shape
    ``approx_count_distinct`` uses internally, rebuilt here openly so
    the oracle can replay it bit-for-bit).

    Estimate = α·m²/Σ2^(−M_j); the harmonic sum is kept EXACT by
    scaling to Σ2^(33−M_j) in BIGINT (every term a power of two —
    order-independent integer addition), so both engines divide the
    same two exact numbers in one identical final float expression.
    No small-range correction branch: l_orderkey's cardinality is
    ≫ 2.5·m at every fixture SF, and the raw components (register
    count, scaled sum, zero registers) are emitted alongside so a
    consumer can apply any correction policy. Accuracy vs exact
    distinct is pinned in tests/test_sketch.py."""
    # md5 projected ONCE. Spark side decodes the hex digits with conv()
    # — one builtin per field instead of the oracle's 10 instr/substr
    # digit terms (r13, guide §1.2 per-task work): conv(hex, 16, 10) is
    # the exact unsigned value of the digits, so bucket/rank are
    # bit-identical to the _hll_exprs construction DuckDB replays.
    bucket = "CAST(conv(substr(h, 1, 2), 16, 10) AS INT)"
    v = "CAST(conv(substr(h, 3, 8), 16, 10) AS BIGINT)"
    rank = f"(CASE WHEN {v} = 0 THEN 33 ELSE 33 - length(bin({v})) END)"
    regs = (
        load_table(spark, sf_dir, "lineitem")
        .selectExpr("md5(cast(l_orderkey as string)) AS h")
        .selectExpr(f"{bucket} AS bucket", f"{rank} AS r")
        .groupBy("bucket")
        .agg(F.max("r").alias("m"))
    )
    agg = regs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.sum(F.expr("CAST(pow(2.0, 33 - m) AS BIGINT)"))
        .cast("bigint")
        .alias("s_obs"),
    )
    return agg.selectExpr(
        "n_obs AS n_registers",
        f"CAST({_HLL_M} - n_obs AS BIGINT) AS zero_registers",
        f"CAST(s_obs + ({_HLL_M} - n_obs) * CAST(pow(2.0, 33) AS BIGINT) "
        "AS BIGINT) AS s_scaled",
        # literals CAST to DOUBLE explicitly: Spark parses bare decimal
        # literals as DECIMAL and its decimal division truncates
        # differently from DuckDB's double promotion (measured: 5e-4
        # drift at sf0.1)
        "round(CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) "
        "+ CAST(1.079 AS DOUBLE) / CAST(256.0 AS DOUBLE)) "
        "* CAST(65536.0 AS DOUBLE) * CAST(8589934592.0 AS DOUBLE) "
        f"/ CAST(s_obs + ({_HLL_M} - n_obs) * CAST(pow(2.0, 33) AS BIGINT) "
        "AS DOUBLE), 4) AS est_distinct",
    )


def _x27_sql() -> str:
    bucket, rank = _hll_exprs("h", "strpos")
    return (
        f"WITH obs AS (SELECT {bucket} AS bucket, {rank} AS r "
        "FROM (SELECT md5(cast(l_orderkey as varchar)) AS h FROM lineitem)), "
        "regs AS (SELECT bucket, max(r) AS m FROM obs GROUP BY 1), "
        "a AS (SELECT CAST(count(*) AS BIGINT) AS n_obs, "
        "CAST(sum(CAST(pow(2.0, 33 - m) AS BIGINT)) AS BIGINT) AS s_obs "
        "FROM regs) "
        "SELECT n_obs AS n_registers, "
        f"CAST({_HLL_M} - n_obs AS BIGINT) AS zero_registers, "
        f"CAST(s_obs + ({_HLL_M} - n_obs) * CAST(pow(2.0, 33) AS BIGINT) "
        "AS BIGINT) AS s_scaled, "
        "round(CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) "
        "+ CAST(1.079 AS DOUBLE) / CAST(256.0 AS DOUBLE)) "
        "* CAST(65536.0 AS DOUBLE) * CAST(8589934592.0 AS DOUBLE) "
        f"/ CAST(s_obs + ({_HLL_M} - n_obs) * CAST(pow(2.0, 33) AS BIGINT) "
        "AS DOUBLE), 4) AS est_distinct FROM a"
    )


_X27_SQL = _x27_sql()




def dq4_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table referential-integrity audit — the data-quality
    check a warehouse runs after every load: for each declared
    foreign-key relationship, how many child rows point at a missing
    parent (orphans). Each relationship is ONE left-anti join on the
    key; Spark picks broadcast or shuffled hash by parent size, and
    the audit never materializes the orphan rows themselves — counts
    only. The fixtures are referentially clean, so the certificate
    pins zeros plus the exact child cardinalities (a loader that
    dropped parents, or a key-type drift that NULLs the join, flips
    either side)."""
    import pyspark.sql.functions as F

    from acero_delta_lake_streaming_spark.catalog import load_table

    rels = [
        ("lineitem.l_orderkey -> orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("orders.o_custkey -> customer", "orders", "o_custkey",
         "customer", "c_custkey"),
        ("customer.c_nationkey -> nation", "customer", "c_nationkey",
         "nation", "n_nationkey"),
        ("supplier.s_nationkey -> nation", "supplier", "s_nationkey",
         "nation", "n_nationkey"),
        ("nation.n_regionkey -> region", "nation", "n_regionkey",
         "region", "r_regionkey"),
    ]
    out = None
    for name, child, ck, parent, pk in rels:
        c = load_table(spark, sf_dir, child).select(
            F.col(ck).alias("fk")
        )
        p = load_table(spark, sf_dir, parent).select(
            F.col(pk).alias("fk")
        ).distinct()
        orphans = c.join(p, "fk", "left_anti")
        part = (
            c.agg(F.count(F.lit(1)).cast("bigint").alias("n_child"))
            .crossJoin(
                F.broadcast(
                    orphans.agg(
                        F.count(F.lit(1)).cast("bigint").alias("n_orphans")
                    )
                )  # one-row constant frame
            )
            .select(
                F.lit(name).alias("relationship"), "n_child", "n_orphans"
            )
        )
        out = part if out is None else out.unionByName(part)
    return out.withColumn(
        "orphan_bp",
        F.expr("10000 * n_orphans DIV n_child").cast("bigint"),
    )


def dq5_timeseries_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity time-series completeness audit — the freshness /
    continuity check a pipeline runs on every ingested event stream:
    for each user, the distinct active days, the span they cover, how
    many in-span days are MISSING, the longest consecutive gap, and
    staleness against the global high-water day. Day indexes derive
    from the raw int64 nanosecond epoch (``ts_ns DIV 86.4e12``) — the
    TZ-proof integer construction (DuckDB ``epoch_ns(ts)``), never a
    calendar function whose session-zone semantics could split the
    engines.

    Scale shape: one distinct on (user, day) — bounded by users × span
    days, FAR below event volume — then a per-user lag window and a
    per-user rollup on the already-user-keyed frame; the global
    high-water day is a 1-row broadcast. Integer-only certificate."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.expr("ts_ns DIV 86400000000000").cast("bigint").alias("day"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    gaps = days.withColumn("prev", F.lag("day").over(w)).withColumn(
        "gap", F.expr("coalesce(day - prev - 1, 0)")
    )
    per_user = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.min("day").cast("bigint").alias("first_day"),
        F.max("day").cast("bigint").alias("last_day"),
        F.max("gap").cast("bigint").alias("max_gap_days"),
    )
    gmax = days.agg(F.max("day").alias("gday"))
    return per_user.crossJoin(F.broadcast(gmax)).select(
        "user_id",
        "n_days",
        "first_day",
        "last_day",
        F.expr("last_day - first_day + 1 - n_days")
        .cast("bigint")
        .alias("missing_days"),
        "max_gap_days",
        F.expr("gday - last_day").cast("bigint").alias("stale_days"),
    )


_DQ5_SQL = (
    "WITH days AS (SELECT DISTINCT user_id, "
    "epoch_ns(ts) // 86400000000000 AS day FROM events), "
    "g AS (SELECT user_id, day, coalesce(day - lag(day) OVER ("
    "PARTITION BY user_id ORDER BY day) - 1, 0) AS gap FROM days), "
    "pu AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_days, "
    "CAST(min(day) AS BIGINT) AS first_day, "
    "CAST(max(day) AS BIGINT) AS last_day, "
    "CAST(max(gap) AS BIGINT) AS max_gap_days FROM g GROUP BY 1) "
    "SELECT user_id, n_days, first_day, last_day, "
    "CAST(last_day - first_day + 1 - n_days AS BIGINT) AS missing_days, "
    "max_gap_days, "
    "CAST((SELECT max(day) FROM days) - last_day AS BIGINT) AS stale_days "
    "FROM pu"
)


def dq6_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) outlier profile per event type — the
    heavy-tail-safe twin of w11's mean/σ z-score: one wild value
    shifts a mean but not a median, so production data-quality gates
    flag on ``|x - median| > 3 · 1.4826 · MAD``. Cross-engine the
    whole computation is INTEGER-EXACT: values quantize to cents,
    the interpolated median of integers lands on halves (exactly
    representable — ×2 recovers a BIGINT), deviations are BIGINTs,
    the MAD doubles the same way, and the 3·1.4826 = 4.4478 constant
    clears as the rational comparison ``10000·dev > 22239·mad4`` —
    no float crosses an engine boundary (the portable-ln lesson
    applied to quantiles).

    Scale shape: two grouped aggregates over |event_types| keys with
    the tiny stats frames broadcast back between passes. Exact
    percentile holds a group's values; at 100 TB swap in
    approx_percentile (dq1b's exact/approx twin precedent) — the
    audit semantics and thresholds stay identical."""
    cents = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    s1 = cents.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr("CAST(2 * percentile(cents, 0.5D) AS BIGINT)").alias(
            "med2"
        ),
    )
    dev = cents.join(F.broadcast(s1), "event_type").select(
        "event_type",
        "n",
        "med2",
        F.expr("abs(2 * cents - med2)").alias("dev"),
    )
    s2 = dev.groupBy("event_type").agg(
        F.expr("CAST(2 * percentile(dev, 0.5D) AS BIGINT)").alias("mad4")
    )
    return (
        dev.join(F.broadcast(s2), "event_type")
        .groupBy("event_type", "n", "med2", "mad4")
        .agg(
            F.sum(
                F.when(
                    F.expr("10000 * dev > 22239 * mad4"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers")
        )
        .select(
            "event_type",
            "n",
            "med2",
            "mad4",
            "n_outliers",
            F.expr("(10000 * n_outliers) DIV n")
            .cast("bigint")
            .alias("outlier_bp"),
        )
    )


_DQ6_SQL = (
    "WITH c AS (SELECT event_type, "
    "CAST(round(value * 100) AS BIGINT) AS cents FROM events), "
    "s1 AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
    "CAST(2 * quantile_cont(cents, 0.5) AS BIGINT) AS med2 "
    "FROM c GROUP BY 1), "
    "d AS (SELECT c.event_type, s1.n, s1.med2, "
    "abs(2 * c.cents - s1.med2) AS dev "
    "FROM c JOIN s1 USING (event_type)), "
    "s2 AS (SELECT event_type, "
    "CAST(2 * quantile_cont(dev, 0.5) AS BIGINT) AS mad4 "
    "FROM d GROUP BY 1) "
    "SELECT d.event_type, d.n, d.med2, s2.mad4, "
    "CAST(sum(CASE WHEN 10000 * d.dev > 22239 * s2.mad4 "
    "THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers, "
    "CAST((10000 * sum(CASE WHEN 10000 * d.dev > 22239 * s2.mad4 "
    "THEN 1 ELSE 0 END)) // d.n AS BIGINT) AS outlier_bp "
    "FROM d JOIN s2 USING (event_type) GROUP BY 1, 2, 3, 4"
)


def dq7_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution DRIFT between two corpus snapshots (the even-
    vs odd-doc halves as stand-ins for last week's crawl vs this
    week's) — the text-side drift monitor that catches an upstream
    extraction change or a source going dark before it trains into a
    model (dq3 is the numeric twin over orders). Per token the drift
    statistic is the CROSS-MULTIPLIED count difference
    ``|fa·NB − fb·NA|`` — exactly proportional to the frequency-rate
    difference |fa/NA − fb/NB| but computed entirely in BIGINTs, so no
    float ratio ever crosses engines; top-20 drifted tokens emit with
    both raw counts (ties break on token). At 100 TB the per-token
    counts are vocabulary-sized (Heaps-sublinear) and the cross
    products need decimal widening (fa·NB can exceed int64 when both
    sides pass ~3·10⁹ tokens) — the shape is one vocab-keyed full
    outer join either way."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        (F.col("doc_id") % 2 == 0).alias("is_a"),
        F.explode(
            F.expr("filter(split(text, ' '), x -> x != '')")
        ).alias("t"),
    )
    counts = tok.groupBy("t").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0))
        .cast("bigint")
        .alias("fa"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0))
        .cast("bigint")
        .alias("fb"),
    )
    totals = counts.agg(
        F.sum("fa").cast("bigint").alias("na"),
        F.sum("fb").cast("bigint").alias("nb"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "t",
            "fa",
            "fb",
            F.expr("abs(fa * nb - fb * na)").cast("bigint").alias("drift"),
        )
        .orderBy(F.desc("drift"), F.asc("t"))
        .limit(20)
    )


_DQ7_SQL = (
    "WITH tok AS (SELECT doc_id % 2 = 0 AS is_a, "
    "unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t "
    "FROM documents), "
    "c AS (SELECT t, "
    "CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS fa, "
    "CAST(sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT) AS fb "
    "FROM tok GROUP BY 1), "
    "tot AS (SELECT CAST(sum(fa) AS BIGINT) AS na, "
    "CAST(sum(fb) AS BIGINT) AS nb FROM c) "
    "SELECT t, fa, fb, "
    "CAST(abs(fa * nb - fb * na) AS BIGINT) AS drift "
    "FROM c CROSS JOIN tot "
    "ORDER BY drift DESC, t ASC LIMIT 20"
)


_DQ4_SQL = " UNION ALL ".join(
    (
        f"SELECT '{name}' AS relationship, "
        f"CAST((SELECT count(*) FROM {child}) AS BIGINT) AS n_child, "
        f"CAST((SELECT count(*) FROM {child} WHERE {ck} NOT IN "
        f"(SELECT {pk} FROM {parent})) AS BIGINT) AS n_orphans, "
        f"CAST(10000 * (SELECT count(*) FROM {child} WHERE {ck} NOT IN "
        f"(SELECT {pk} FROM {parent})) // "
        f"(SELECT count(*) FROM {child}) AS BIGINT) AS orphan_bp"
    )
    for name, child, ck, parent, pk in [
        ("lineitem.l_orderkey -> orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("orders.o_custkey -> customer", "orders", "o_custkey",
         "customer", "c_custkey"),
        ("customer.c_nationkey -> nation", "customer", "c_nationkey",
         "nation", "n_nationkey"),
        ("supplier.s_nationkey -> nation", "supplier", "s_nationkey",
         "nation", "n_nationkey"),
        ("nation.n_regionkey -> region", "nation", "n_regionkey",
         "region", "r_regionkey"),
    ]
)


# --------------------------------------------------------------------------
# DQ9 — cross-table reconciliation drift (orders vs derived lineitem sums)
# --------------------------------------------------------------------------


def dq9_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ9 — VALUE-level reconciliation between a rollup table and its
    detail: ``o_totalprice`` vs the per-order Σ extendedprice·(1−disc)·
    (1+tax) — the header-vs-detail conservation check every warehouse
    runs after a load (dq4 checks KEY integrity; this checks the
    MONEY). The fixture deliberately does NOT conserve (max drift
    ~7e5, 257 headerless orders at sf0.01), so the certificate is the
    full drift DISTRIBUTION: relative drift in basis points banded
    into 1000-bp buckets (capped at band 10), plus a band −1 row for
    orders with no detail rows at all.

    Numeric discipline: each detail term is a per-row double product
    cast to DECIMAL(18,6) BEFORE the sum (order-independent exact
    accumulation, the q1/CLAUDE rule — a double Σ over shuffled detail
    rows would ULP-drift the banding), the derived side scales to e6
    BIGINTs exactly in decimal, and the header side floors through the
    identical IEEE double product in both engines. One detail
    hash-agg + one header join — the same two-shuffle shape at any
    scale."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    derived = li.groupBy("l_orderkey").agg(
        F.sum(
            F.expr(
                "CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) "
                "AS DECIMAL(18,6))"
            )
        ).alias("s")
    )
    j = orders.select("o_orderkey", "o_totalprice").join(
        derived, F.col("o_orderkey") == F.col("l_orderkey"), "left"
    )
    banded = j.select(
        F.expr(
            "CASE WHEN s IS NULL THEN CAST(-1 AS BIGINT) ELSE least("
            "((10000 * abs(CAST(floor(o_totalprice * "
            "CAST(1000000 AS DOUBLE)) AS BIGINT) "
            "- CAST(s * 1000000 AS BIGINT))) "
            "DIV CAST(floor(o_totalprice * CAST(1000000 AS DOUBLE)) "
            "AS BIGINT)) DIV 1000, CAST(10 AS BIGINT)) END"
        ).alias("band")
    )
    return (
        banded.groupBy("band")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    )


_DQ9_SQL = (
    "WITH derived AS (SELECT l_orderkey, "
    "sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) "
    "AS DECIMAL(18,6))) AS s "
    "FROM lineitem GROUP BY 1), "
    "j AS (SELECT o_orderkey, o_totalprice, s FROM orders "
    "LEFT JOIN derived ON o_orderkey = l_orderkey), "
    "banded AS (SELECT CASE WHEN s IS NULL THEN CAST(-1 AS BIGINT) "
    "ELSE least(((10000 * abs(CAST(floor(o_totalprice * "
    "CAST(1000000 AS DOUBLE)) AS BIGINT) "
    "- CAST(s * 1000000 AS BIGINT))) "
    "// CAST(floor(o_totalprice * CAST(1000000 AS DOUBLE)) "
    "AS BIGINT)) // 1000, CAST(10 AS BIGINT)) END AS band FROM j) "
    "SELECT band, CAST(count(*) AS BIGINT) AS n_orders "
    "FROM banded GROUP BY 1"
)


# --------------------------------------------------------------------------
# X63 — θ-sketch audience overlap (KMV set INTERSECTION estimation)
# --------------------------------------------------------------------------


def x63_sketch_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X63 — audience OVERLAP between event types estimated from KMV
    θ-sketches: x13 answers "how many distinct users" per set; this
    answers "how many users do two sets SHARE" without ever touching
    the exact sets — the Theta-sketch set-operation capability
    (Datasketches' core pitch) that lets a 100 TB platform answer
    audience-intersection questions from kilobyte sketches. Estimator:
    θ = min(θ_A, θ_B), c = |{h ∈ sk_A ∩ sk_B : h < θ}|, est = c·H/θ
    (H = the md5-derived 24-bit hash space) — all BIGINT, no float.
    A set smaller than k has θ = H (its sketch IS the set), so the
    estimator degrades to exact — both engines share the COALESCE.

    The per-type sketches build with x13's salted two-stage k-min
    (mergeable sketch: k-min of a union = k-min of per-cell k-mins; no
    window over distinct hashes, reducer state O(k·cells) at any
    corpus size). Sketch rows then pair on the HASH equi-join (k rows
    per type — metadata-sized), thetas ride in via broadcast, and the
    exact intersection computes alongside so the estimator's error is
    IN the certificate (err_bp) — the x13 audit discipline applied to
    set algebra."""
    events = load_table(spark, sf_dir, "events")
    h = events.selectExpr(
        "event_type", f"{_HASH_SPARK} AS h"
    ).distinct()
    cells = h.groupBy(
        "event_type",
        F.pmod(F.col("h"), F.lit(_PREMERGE_CELLS)).alias("cell"),
    ).agg(
        F.expr(f"slice(sort_array(collect_list(h)), 1, {_K})").alias(
            "mins"
        )
    )
    sk = cells.groupBy("event_type").agg(
        F.expr(
            f"slice(array_sort(flatten(collect_list(mins))), 1, {_K})"
        ).alias("mins")
    ).select(
        "event_type",
        "mins",
        F.expr(
            f"coalesce(try_element_at(mins, {_K}), {_SPACE})"
        ).alias("theta"),
    )
    skrows = sk.select(
        "event_type", F.explode("mins").alias("h")
    )
    common = (
        skrows.select(F.col("event_type").alias("ta"), "h")
        .join(
            skrows.select(F.col("event_type").alias("tb"), "h"), "h"
        )
        .filter(F.col("ta") < F.col("tb"))
        .join(
            F.broadcast(
                sk.select(
                    F.col("event_type").alias("ta"),
                    F.col("theta").alias("theta_a"),
                )
            ),
            "ta",
        )
        .join(
            F.broadcast(
                sk.select(
                    F.col("event_type").alias("tb"),
                    F.col("theta").alias("theta_b"),
                )
            ),
            "tb",
        )
        .filter(F.expr("h < least(theta_a, theta_b)"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    du = events.select("event_type", "user_id").distinct()
    exact = (
        du.select(F.col("event_type").alias("ta"), "user_id")
        .join(
            du.select(F.col("event_type").alias("tb"), "user_id"),
            "user_id",
        )
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_common"))
    )
    return (
        exact.join(common, ["ta", "tb"], "left")
        .join(
            F.broadcast(
                sk.select(
                    F.col("event_type").alias("ta"),
                    F.col("theta").alias("theta_a"),
                )
            ),
            "ta",
        )
        .join(
            F.broadcast(
                sk.select(
                    F.col("event_type").alias("tb"),
                    F.col("theta").alias("theta_b"),
                )
            ),
            "tb",
        )
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            "exact_common",
            F.coalesce("c", F.lit(0)).cast("bigint").alias(
                "n_common_sk"
            ),
            F.expr("least(theta_a, theta_b)").cast("bigint").alias(
                "theta"
            ),
            F.expr(
                f"(coalesce(c, 0) * {_SPACE}) "
                "DIV least(theta_a, theta_b)"
            ).cast("bigint").alias("est_common"),
        )
        .withColumn(
            "err_bp",
            F.expr(
                "(10000 * abs(est_common - exact_common)) "
                "DIV exact_common"
            ).cast("bigint"),
        )
    )


_X63_SQL = (
    f"WITH h AS (SELECT DISTINCT event_type, {_HASH_DUCK} AS h "
    "FROM events), "
    "r AS (SELECT event_type, h, row_number() OVER "
    "(PARTITION BY event_type ORDER BY h) AS rn FROM h), "
    f"sk AS (SELECT event_type, h FROM r WHERE rn <= {_K}), "
    f"th AS (SELECT event_type, COALESCE(max(CASE WHEN rn = {_K} "
    f"THEN h END), {_SPACE}) AS theta FROM r GROUP BY 1), "
    "common AS (SELECT a.event_type AS ta, b.event_type AS tb, "
    "CAST(count(*) AS BIGINT) AS c "
    "FROM sk a JOIN sk b ON a.h = b.h AND a.event_type < b.event_type "
    "JOIN th x ON x.event_type = a.event_type "
    "JOIN th y ON y.event_type = b.event_type "
    "WHERE a.h < least(x.theta, y.theta) GROUP BY 1, 2), "
    "du AS (SELECT DISTINCT event_type, user_id FROM events), "
    "ex AS (SELECT a.event_type AS ta, b.event_type AS tb, "
    "CAST(count(*) AS BIGINT) AS exact_common "
    "FROM du a JOIN du b ON a.user_id = b.user_id "
    "AND a.event_type < b.event_type GROUP BY 1, 2), "
    "o AS (SELECT ex.ta AS type_a, ex.tb AS type_b, ex.exact_common, "
    "CAST(COALESCE(c.c, 0) AS BIGINT) AS n_common_sk, "
    "CAST(least(x.theta, y.theta) AS BIGINT) AS theta, "
    f"CAST((COALESCE(c.c, 0) * {_SPACE}) "
    "// least(x.theta, y.theta) AS BIGINT) AS est_common "
    "FROM ex LEFT JOIN common c ON c.ta = ex.ta AND c.tb = ex.tb "
    "JOIN th x ON x.event_type = ex.ta "
    "JOIN th y ON y.event_type = ex.tb) "
    "SELECT *, CAST((10000 * abs(est_common - exact_common)) "
    "// exact_common AS BIGINT) AS err_bp FROM o"
)


# --------------------------------------------------------------------------
# DQ8 — Benford first-digit audit
# --------------------------------------------------------------------------

# log10(1 + 1/d) to e5, the canonical Benford mass per leading digit.
# A shared integer CONSTANT table (identical literal on both sides), so
# no cross-engine logarithm is ever evaluated.
_DQ8_EXPECTED_E5 = {
    1: 30103, 2: 17609, 3: 12494, 4: 9691, 5: 7918,
    6: 6695, 7: 5799, 8: 5115, 9: 4576,
}

_DQ8_CASE = (
    "CASE digit "
    + " ".join(f"WHEN {d} THEN {e}" for d, e in _DQ8_EXPECTED_E5.items())
    + " END"
)


def dq8_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ8 — Benford's-law FIRST-DIGIT audit of ``o_totalprice``: the
    classic anomaly screen for price/amount columns (organically grown
    magnitudes follow log10(1+1/d); synthetic, capped, or tampered
    columns don't — a large deviation is a data-quality alarm worth a
    drill-down, which is exactly what the fixture's uniform-ish price
    generator triggers). Per digit: count, observed share (e5),
    expected Benford share (a shared integer constant table — no
    logarithm is evaluated in either engine), absolute deviation, and
    the total-variation distance rides out as half the deviation sum
    on the cid = 0 total row's dev column.

    The leading digit comes from ``floor`` + BIGINT + string head —
    float→string formatting is engine-specific but floor and integer
    rendering are exact, and ``o_totalprice ≥ 857`` so no sub-1 values
    exist (guarded by the WHERE). Plan: one pruned-column scan, one
    9-row hash agg, the 1-row total broadcast back — O(1) output at
    any scale."""
    orders = load_table(spark, sf_dir, "orders").filter(
        "o_totalprice >= 1.0"
    )
    digits = (
        orders.select(
            F.expr(
                "CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) "
                "AS STRING), 1, 1) AS INT)"
            ).alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    total = digits.agg(F.sum("n").cast("bigint").alias("total"))
    per = (
        digits.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            F.expr("(100000 * n) DIV total").cast("bigint").alias(
                "share_e5"
            ),
            F.expr(_DQ8_CASE).cast("bigint").alias("expected_e5"),
        )
        .withColumn(
            "dev_e5",
            F.expr("abs(share_e5 - expected_e5)").cast("bigint"),
        )
    )
    totrow = per.agg(
        F.lit(0).cast("int").alias("digit"),
        F.sum("n").cast("bigint").alias("n"),
        F.sum("share_e5").cast("bigint").alias("share_e5"),
        F.sum("expected_e5").cast("bigint").alias("expected_e5"),
        F.sum("dev_e5").cast("bigint").alias("dev_e5"),
    )
    return per.unionByName(totrow)


_DQ8_SQL = (
    "WITH digits AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) "
    "AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit "
    "FROM orders WHERE o_totalprice >= 1.0), "
    "g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n "
    "FROM digits GROUP BY 1), "
    "t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM g), "
    "per AS (SELECT digit, n, "
    "CAST((100000 * n) // total AS BIGINT) AS share_e5, "
    f"CAST({_DQ8_CASE} AS BIGINT) AS expected_e5 "
    "FROM g CROSS JOIN t) "
    "SELECT digit, n, share_e5, expected_e5, "
    "CAST(abs(share_e5 - expected_e5) AS BIGINT) AS dev_e5 FROM per "
    "UNION ALL "
    "SELECT CAST(0 AS INT), CAST(sum(n) AS BIGINT), "
    "CAST(sum(share_e5) AS BIGINT), CAST(sum(expected_e5) AS BIGINT), "
    "CAST(sum(abs(share_e5 - expected_e5)) AS BIGINT) FROM per"
)




# --------------------------------------------------------------------------
# X67 — mergeable binned-histogram quantiles + error audit
# --------------------------------------------------------------------------

_X67_BIN_W = 16384  # bin width in price cents (~672 bins over the fixture)
_X67_QS = (50, 90, 99)


def x67_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X67 — quantiles WITHOUT a per-group sort: a fixed-width integer
    histogram over price cents (one partial+final hash-agg, mergeable
    by construction — histograms add), then the q-quantile is the
    first bin whose cumulative count reaches ``ceil(q·n/100)``; the
    answer is the bin's lower bound, exact to one bin width. This is
    the 100 TB percentile plan — a10's exact ``percentile`` and a14's
    sampled twin both still sort inside each group, while the
    histogram never moves more than |bins| rows per group after the
    scan; the window that cumulates runs over ≤672 rows. The audit arm
    joins the EXACT interpolated percentile (a10's bit-equal
    ``percentile`` ≡ ``quantile_cont``) and reports the realized error
    in basis points — at production scale you drop the audit arm and
    keep the histogram; here it MEASURES the bin-width trade the way
    x47 measures ANN recall. All certificate values are integers or
    the bit-equal interpolated double."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = "CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * 100 AS BIGINT)"
    binned = li.select(
        "l_returnflag", F.expr(f"({cents}) DIV {_X67_BIN_W}").alias("bin")
    )
    hist = binned.groupBy("l_returnflag", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    from pyspark.sql import Window

    wflag = Window.partitionBy("l_returnflag")
    worder = wflag.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "l_returnflag",
        "bin",
        F.sum("cnt").over(worder).cast("bigint").alias("cum"),
        F.sum("cnt").over(wflag).cast("bigint").alias("n"),
    )
    qs = spark.range(1).select(
        F.explode(F.array(*[F.lit(q) for q in _X67_QS])).alias("q0")
    ).select(F.col("q0").cast("bigint").alias("q"))
    est = (
        cum.join(F.broadcast(qs))
        .filter(F.expr("cum >= (q * n + 99) DIV 100"))
        .groupBy("l_returnflag", "q", "n")
        .agg(F.min("bin").alias("qbin"))
        .select(
            "l_returnflag",
            "q",
            "n",
            (F.col("qbin") * F.lit(_X67_BIN_W))
            .cast("bigint")
            .alias("est_lo_cents"),
        )
    )
    # ONE percentile buffer, probed at all three quantiles: separate
    # percentile(c, q) calls each materialize + sort the full per-group
    # value buffer (3x the shuffle bytes and 3x the final-merge sort);
    # the array form computes the identical interpolated values from a
    # single buffer (guide §2.3 — shuffle fewer bytes; measured 3.87 ->
    # 1.66 s at sf0.1, r13).
    probes = ", ".join(str(q / 100) for q in _X67_QS)
    exact = li.groupBy("l_returnflag").agg(
        F.expr(f"percentile({cents}, array({probes}))").alias("ps")
    )
    exact_long = exact.select(
        "l_returnflag",
        F.explode(
            F.expr(
                "map("
                + ", ".join(
                    f"CAST({q} AS BIGINT), ps[{i}]"
                    for i, q in enumerate(_X67_QS)
                )
                + ")"
            )
        ).alias("q", "exact_cents"),
    )
    return (
        est.join(F.broadcast(exact_long), ["l_returnflag", "q"])
        .select(
            "l_returnflag",
            "q",
            "n",
            "est_lo_cents",
            F.round("exact_cents", 4).alias("exact_cents"),
            F.expr(
                "CAST(floor((10000.0 * (exact_cents - est_lo_cents)) "
                "/ nullif(exact_cents, 0)) AS BIGINT)"
            ).alias("err_bp"),
        )
    )


_X67_SQL = (
    "WITH cents AS (SELECT l_returnflag, "
    "CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * 100 AS BIGINT) AS c "
    "FROM lineitem), "
    f"hist AS (SELECT l_returnflag, c // {_X67_BIN_W} AS bin, "
    "CAST(count(*) AS BIGINT) AS cnt FROM cents GROUP BY 1, 2), "
    "cum AS (SELECT l_returnflag, bin, "
    "CAST(sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin "
    "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum, "
    "CAST(sum(cnt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n "
    "FROM hist), "
    "qs AS (SELECT CAST(unnest([" +
    ", ".join(str(q) for q in _X67_QS) +
    "]) AS BIGINT) AS q), "
    "est AS (SELECT l_returnflag, q, n, "
    f"CAST(min(bin) * {_X67_BIN_W} AS BIGINT) AS est_lo_cents "
    "FROM cum CROSS JOIN qs WHERE cum >= (q * n + 99) // 100 "
    "GROUP BY 1, 2, 3), "
    "exact AS (SELECT l_returnflag, q, "
    "CASE " +
    " ".join(
        f"WHEN q = {q} THEN quantile_cont(c, {q / 100})" for q in _X67_QS
    ) +
    " END AS exact_cents "
    "FROM cents CROSS JOIN qs GROUP BY 1, 2) "
    "SELECT e.l_returnflag, e.q, e.n, e.est_lo_cents, "
    "round(x.exact_cents, 4) AS exact_cents, "
    "CAST(floor((10000.0 * (x.exact_cents - e.est_lo_cents)) "
    "/ nullif(x.exact_cents, 0)) AS BIGINT) AS err_bp "
    "FROM est e JOIN exact x "
    "ON x.l_returnflag = e.l_returnflag AND x.q = e.q"
)




# --------------------------------------------------------------------------
# DQ10 — primary-key uniqueness audit across the warehouse
# --------------------------------------------------------------------------

#: (table, key column) pairs under the uniqueness contract. lineitem's
#: key is composite — audited as the (orderkey, linenumber) pair.
_DQ10_KEYS = (
    ("orders", "o_orderkey"),
    ("customer", "c_custkey"),
    ("part", "p_partkey"),
    ("supplier", "s_suppkey"),
    ("documents", "doc_id"),
    ("embeddings", "vec_id"),
    ("events", "event_id"),
)


def dq10_key_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ10 — the PRIMARY-KEY uniqueness audit, one row per claimed
    key: row count, distinct-key count, surplus rows riding a
    duplicated key, and uniqueness in basis points. dq4 audits the
    FK direction (orphans); this is the PK direction — the first
    thing a warehouse health check asserts, because a silently
    duplicated key turns every downstream join into a row multiplier
    (a 2× key dup doubles join output and every SUM over it). The
    composite lineitem key is audited as its (orderkey, linenumber)
    pair via the same count-distinct shape.

    Scale: one pruned single-column scan per table feeding count +
    exact count-distinct (shuffle = the key hash pairs, the x1
    discipline); the union is |tables| rows. At 100 TB swap the exact
    distinct for dq1b's KMV twin per column and keep the same
    certificate columns."""
    parts = []
    for tname, key in _DQ10_KEYS:
        t = load_table(spark, sf_dir, tname)
        parts.append(
            t.select(F.col(key).cast("string").alias("k")).agg(
                F.lit(f"{tname}.{key}").alias("key_name"),
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.countDistinct("k").cast("bigint").alias("n_keys"),
            )
        )
    li = load_table(spark, sf_dir, "lineitem")
    parts.append(
        li.select(
            F.concat_ws(
                "-",
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
            ).alias("k")
        ).agg(
            F.lit("lineitem.l_orderkey-l_linenumber").alias("key_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("k").cast("bigint").alias("n_keys"),
        )
    )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "key_name",
        "n_rows",
        "n_keys",
        (F.col("n_rows") - F.col("n_keys")).cast("bigint").alias(
            "dup_rows"
        ),
        F.expr("(10000 * n_keys) DIV nullif(n_rows, 0)")
        .cast("bigint")
        .alias("uniq_bp"),
    )


_DQ10_SQL = (
    "WITH u AS ("
    + " UNION ALL ".join(
        f"SELECT '{t}.{k}' AS key_name, "
        "CAST(count(*) AS BIGINT) AS n_rows, "
        f"CAST(count(DISTINCT CAST({k} AS VARCHAR)) AS BIGINT) "
        f"AS n_keys FROM {t}"
        for t, k in _DQ10_KEYS
    )
    + " UNION ALL "
    "SELECT 'lineitem.l_orderkey-l_linenumber', "
    "CAST(count(*) AS BIGINT), "
    "CAST(count(DISTINCT concat_ws('-', CAST(l_orderkey AS VARCHAR), "
    "CAST(l_linenumber AS VARCHAR))) AS BIGINT) FROM lineitem) "
    "SELECT key_name, n_rows, n_keys, "
    "CAST(n_rows - n_keys AS BIGINT) AS dup_rows, "
    "CAST((10000 * n_keys) // nullif(n_rows, 0) AS BIGINT) AS uniq_bp "
    "FROM u"
)


# --------------------------------------------------------------------------
# DQ11 — classifier calibration audit (reliability bins + ECE)
# --------------------------------------------------------------------------

# Pseudo quality classifier over documents, the ud1 mocked-model
# pattern: ground truth y = (n_chars >= 300), model confidence in
# integer percent = 20 + 4*d1 + 20*y where d1 is the first md5(text)
# hex digit (0..15) — correlated with the label but deliberately
# miscalibrated, with a real overlap region (40..80) where both
# classes coexist so bin accuracies are non-degenerate. Everything is
# integer arithmetic until the final basis-point divisions, so the
# hash gate is exact.
_DQ11_Y = "CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END"
_DQ11_D1_SPARK = "instr('0123456789abcdef', substr(md5(text), 1, 1)) - 1"
_DQ11_D1_DUCK = "strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1"


def dq11_calibration_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ11 — CALIBRATION AUDIT for a quality classifier (reliability
    diagram + expected calibration error), the acceptance gate before
    model-scored quality filtering drives corpus selection (the
    fastText-classifier recipe): if the model says 0.8, is it right
    80% of the time? Confidence buckets into 10 standard bins
    ([0,0.1) .. [0.9,1.0]); per bin: count, mean confidence (bp),
    empirical accuracy (bp), the |gap| (bp), and the count-weighted
    gap — whose sum over bins, divided by N, IS the ECE. The fixture
    classifier is the deterministic mocked model (ud1's pattern), so
    the oracle replays it exactly; the operator itself consumes any
    (confidence, outcome) pair stream.

    Scale shape: one hash-agg on a 10-value key — partial aggregation
    map-side, a 10-row shuffle; the audit runs over 100 TB of scores
    in one pass with no other exchange."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.selectExpr(
        f"{_DQ11_Y} AS y",
        f"20 + 4 * ({_DQ11_D1_SPARK}) + 20 * ({_DQ11_Y}) AS conf_pct",
    )
    return (
        scored.selectExpr(
            "y", "conf_pct", "LEAST(conf_pct DIV 10, 9) AS bin"
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("n_pos"),
            F.sum("conf_pct").cast("bigint").alias("conf_sum"),
        )
        .selectExpr(
            "CAST(bin AS BIGINT) AS bin",
            "n",
            "100 * conf_sum DIV n AS conf_bp",
            "10000 * n_pos DIV n AS acc_bp",
            "abs(100 * conf_sum DIV n - 10000 * n_pos DIV n) AS gap_bp",
            "n * abs(100 * conf_sum DIV n - 10000 * n_pos DIV n) "
            "AS weighted_gap",
        )
    )


_DQ11_SQL = (
    "WITH scored AS (SELECT "
    f"{_DQ11_Y} AS y, "
    f"20 + 4 * ({_DQ11_D1_DUCK}) + 20 * ({_DQ11_Y}) AS conf_pct "
    "FROM documents), "
    "b AS (SELECT y, conf_pct, LEAST(conf_pct // 10, 9) AS bin "
    "FROM scored), "
    "agg AS (SELECT bin, CAST(count(*) AS BIGINT) AS n, "
    "CAST(sum(y) AS BIGINT) AS n_pos, "
    "CAST(sum(conf_pct) AS BIGINT) AS conf_sum FROM b GROUP BY 1) "
    "SELECT CAST(bin AS BIGINT) AS bin, n, "
    "100 * conf_sum // n AS conf_bp, "
    "10000 * n_pos // n AS acc_bp, "
    "abs(100 * conf_sum // n - 10000 * n_pos // n) AS gap_bp, "
    "n * abs(100 * conf_sum // n - 10000 * n_pos // n) AS weighted_gap "
    "FROM agg"
)


# --------------------------------------------------------------------------
# DQ12 — inter-rater agreement (Cohen's kappa) between two labelers
# --------------------------------------------------------------------------

_DQ12_D2_SPARK = "instr('0123456789abcdef', substr(md5(text), 2, 1)) - 1"
_DQ12_D2_DUCK = "strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1"
# two deterministic mocked labelers (ud1's pattern) sharing a real
# signal (document length) but reading different md5 digits and
# thresholds — correlated, with genuine off-diagonal disagreement
_DQ12_LA = (
    "CASE WHEN n_chars >= 300 THEN 2 WHEN ({d1}) >= 8 THEN 1 "
    "ELSE 0 END"
)
_DQ12_LB = (
    "CASE WHEN n_chars >= 280 THEN 2 WHEN ({d2}) >= 6 THEN 1 "
    "ELSE 0 END"
)


def dq12_agreement_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ12 — INTER-RATER AGREEMENT audit (Cohen's kappa), the
    validation gate before model-scored labels drive corpus decisions
    with more than one scorer in play (two classifier versions, a
    classifier vs a heuristic, model vs human sample): raw agreement
    po overstates consensus when the label marginals are skewed, so
    kappa = (po − pe)/(1 − pe) discounts chance agreement from the
    marginals. Certificate: the full contingency table (each cell with
    its share in bp) plus po/pe/kappa summary rows — all EXACT
    integers (po_bp = 10000·Σdiag DIV N; pe_bp = 10000·Σ row_k·col_k
    DIV N²; kappa_bp = 10000·(po_bp − pe_bp) DIV (10000 − pe_bp)), so
    any drift in either labeler or the algebra flips a row. The two
    fixture labelers are deterministic mocked models (dq11/ud1's
    pattern); the operator consumes any (label_a, label_b) pair
    stream.

    Scale shape: ONE hash-agg on the ≤|classes|² key (map-side
    partials; a 9-row shuffle here) — everything after the first
    aggregate is constant-size. N² in pe's numerator overflows BIGINT
    past ~3·10⁹ rows: at that scale accumulate the marginal products
    in decimal(38,0) (the CLAUDE.md large-sum rule) — the fixture
    stays in exact BIGINT."""
    d1 = "instr('0123456789abcdef', substr(md5(text), 1, 1)) - 1"
    docs = load_table(spark, sf_dir, "documents")
    lab = docs.selectExpr(
        _DQ12_LA.format(d1=d1) + " AS la",
        _DQ12_LB.format(d2=_DQ12_D2_SPARK) + " AS lb",
    )
    cells = (
        lab.groupBy("la", "lb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = cells.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum(F.expr("CASE WHEN la = lb THEN n ELSE 0 END"))
        .cast("bigint")
        .alias("diag"),
    )
    rows_m = cells.groupBy("la").agg(
        F.sum("n").cast("bigint").alias("row_n")
    )
    cols_m = cells.groupBy(F.col("lb").alias("la")).agg(
        F.sum("n").cast("bigint").alias("col_n")
    )
    pe_prod = (
        rows_m.join(cols_m, "la", "full_outer")
        .selectExpr(
            "coalesce(row_n, CAST(0 AS BIGINT)) * "
            "coalesce(col_n, CAST(0 AS BIGINT)) AS p"
        )
        .agg(F.sum("p").cast("bigint").alias("pe_num"))
    )
    stats = (
        tot.crossJoin(F.broadcast(pe_prod))
        .selectExpr(
            "nn",
            "10000 * diag DIV nn AS po_bp",
            "10000 * pe_num DIV (nn * nn) AS pe_bp",
        )
        .selectExpr(
            "nn", "po_bp", "pe_bp",
            "10000 * (po_bp - pe_bp) DIV (10000 - pe_bp) AS kappa_bp",
        )
    )
    cell_rows = cells.crossJoin(F.broadcast(tot.select("nn"))).selectExpr(
        "'cell' AS part",
        "CAST(la AS BIGINT) AS la",
        "CAST(lb AS BIGINT) AS lb",
        "n",
        "10000 * n DIV nn AS value_bp",
    )
    summary = stats.selectExpr(
        "stack(3, 'po', po_bp, 'pe', pe_bp, 'kappa', kappa_bp) "
        "AS (part, value_bp)",
        "nn",
    ).selectExpr(
        "part",
        "CAST(-1 AS BIGINT) AS la",
        "CAST(-1 AS BIGINT) AS lb",
        "nn AS n",
        "value_bp",
    )
    return cell_rows.unionByName(summary)


_DQ12_SQL = (
    "WITH lab AS (SELECT "
    + _DQ12_LA.format(
        d1="strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1"
    )
    + " AS la, "
    + _DQ12_LB.format(d2=_DQ12_D2_DUCK)
    + " AS lb FROM documents), "
    "cells AS (SELECT la, lb, CAST(count(*) AS BIGINT) AS n "
    "FROM lab GROUP BY 1, 2), "
    "tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn, "
    "CAST(sum(CASE WHEN la = lb THEN n ELSE 0 END) AS BIGINT) AS diag "
    "FROM cells), "
    "rm AS (SELECT la, CAST(sum(n) AS BIGINT) AS row_n "
    "FROM cells GROUP BY 1), "
    "cm AS (SELECT lb AS la, CAST(sum(n) AS BIGINT) AS col_n "
    "FROM cells GROUP BY 1), "
    "pe AS (SELECT CAST(sum(coalesce(row_n, 0) * coalesce(col_n, 0)) "
    "AS BIGINT) AS pe_num "
    "FROM rm FULL OUTER JOIN cm USING (la)), "
    "stats AS (SELECT nn, 10000 * diag // nn AS po_bp, "
    "10000 * pe_num // (nn * nn) AS pe_bp "
    "FROM tot CROSS JOIN pe), "
    "stats2 AS (SELECT nn, po_bp, pe_bp, "
    "10000 * (po_bp - pe_bp) // (10000 - pe_bp) AS kappa_bp "
    "FROM stats) "
    "SELECT 'cell' AS part, CAST(la AS BIGINT) AS la, "
    "CAST(lb AS BIGINT) AS lb, n, "
    "10000 * n // (SELECT nn FROM tot) AS value_bp FROM cells "
    "UNION ALL SELECT 'po', -1, -1, nn, po_bp FROM stats2 "
    "UNION ALL SELECT 'pe', -1, -1, nn, pe_bp FROM stats2 "
    "UNION ALL SELECT 'kappa', -1, -1, nn, kappa_bp FROM stats2"
)


QUERIES = {
    "x13_kmv_distinct": x13_kmv_distinct,
    "dq1_column_profile": dq1_column_profile,
    "dq1b_approx_profile": dq1b_approx_profile,
    "dq2_expectations": dq2_expectations,
    "x17_cms_heavy_hitters": x17_cms_heavy_hitters,
    "x27_hll_distinct": x27_hll_distinct,
    "dq4_referential_integrity": dq4_referential_integrity,
    "dq5_timeseries_gaps": dq5_timeseries_gaps,
    "dq6_robust_outliers": dq6_robust_outliers,
    "dq7_token_drift": dq7_token_drift,
    "dq8_benford_audit": dq8_benford_audit,
    "x63_sketch_overlap": x63_sketch_overlap,
    "dq9_reconciliation": dq9_reconciliation,
    "x67_histogram_quantiles": x67_histogram_quantiles,
    "dq10_key_uniqueness": dq10_key_uniqueness,
    "dq11_calibration_audit": dq11_calibration_audit,
    "dq12_agreement_audit": dq12_agreement_audit,
}

ORACLES = {
    "x13_kmv_distinct": _X13_SQL,
    "dq1_column_profile": _DQ1_SQL,
    "dq1b_approx_profile": _DQ1B_SQL,
    "dq2_expectations": _DQ2_SQL,
    "x17_cms_heavy_hitters": _X17_SQL,
    "x27_hll_distinct": _X27_SQL,
    "dq4_referential_integrity": _DQ4_SQL,
    "dq5_timeseries_gaps": _DQ5_SQL,
    "dq6_robust_outliers": _DQ6_SQL,
    "dq7_token_drift": _DQ7_SQL,
    "dq8_benford_audit": _DQ8_SQL,
    "x63_sketch_overlap": _X63_SQL,
    "dq9_reconciliation": _DQ9_SQL,
    "x67_histogram_quantiles": _X67_SQL,
    "dq10_key_uniqueness": _DQ10_SQL,
    "dq11_calibration_audit": _DQ11_SQL,
    "dq12_agreement_audit": _DQ12_SQL,
}
