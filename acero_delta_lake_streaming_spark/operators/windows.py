"""Window-function analytics — the time-series layer over the engine.

The reference's only windowed computation is the per-day article
timeline (visualizer.py:115) and the total-ordered stacked bar
(visualizer.py:152-155, covered by A8). This module adds the standard
analytic-window family a dashboard on 100 TB of events needs: lag
deltas, frame-bounded moving averages, and in-group rankings.

Scale shape: every query here is one hash aggregation (shuffle =
|groups|) followed by a window over the *aggregated* rows — the window
sort runs on group-count rows, never on raw events. Partitioned windows
(`w3`) sort within partitions only; the one global-ordered window (`w1`,
`w2`) operates on ~date-count rows, which is fine at any fact scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from acero_delta_lake_streaming_spark.catalog import load_table
from acero_delta_lake_streaming_spark.plans.cache import scoped_persist


def w1_daily_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day change of daily order counts (lag window)."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # Unpartitioned BY DESIGN, and scale-safe: the input is the
    # post-aggregation DAILY series, so the single window task holds
    # |calendar days| rows (thousands at any corpus size), never the
    # corpus. Spark's 'No Partition Defined' warning is expected here
    # and is not a scale bug.
    w = Window.orderBy("d")
    return daily.select(
        "d",
        "n",
        (F.col("n") - F.lag("n", 1).over(w)).alias("delta"),
    )


_W1_SQL = (
    "WITH daily AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS d, "
    "count(*) AS n FROM orders GROUP BY 1) "
    "SELECT d, n, n - lag(n, 1) OVER (ORDER BY d) AS delta FROM daily"
)


def w2_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row trailing moving average of daily revenue (frame-bounded
    window over the aggregated timeline)."""
    daily = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.date_format("l_shipdate", "yyyy-MM-dd").alias("d"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            ).alias("rev")
        )
    )
    # Unpartitioned BY DESIGN, and scale-safe: the input is the
    # post-aggregation DAILY series, so the single window task holds
    # |calendar days| rows (thousands at any corpus size), never the
    # corpus. Spark's 'No Partition Defined' warning is expected here
    # and is not a scale bug.
    w = Window.orderBy("d").rowsBetween(-6, 0)
    return daily.select(
        "d",
        F.round(F.col("rev"), 2).cast("double").alias("rev"),
        F.round(F.avg("rev").over(w), 2).cast("double").alias("rev_ma7"),
    )


_W2_SQL = (
    "WITH daily AS (SELECT strftime(l_shipdate, '%Y-%m-%d') AS d, "
    "SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS rev "
    "FROM lineitem GROUP BY 1) "
    "SELECT d, CAST(ROUND(rev, 2) AS DOUBLE) AS rev, "
    "CAST(ROUND(AVG(rev) OVER (ORDER BY d "
    "ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS rev_ma7 "
    "FROM daily"
)


def w3_rank_in_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by revenue within each market segment: rank()
    over a partitioned window on aggregated rows."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "c_custkey")
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("spend")
        )
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("spend"), F.asc("c_custkey")
    )
    return (
        per_cust.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("c_mktsegment", "c_custkey", "spend", "rk")
    )


_W3_SQL = (
    "WITH per_cust AS (SELECT c_mktsegment, c_custkey, "
    "CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) "
    "AS spend "
    "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2) "
    "SELECT c_mktsegment, c_custkey, spend, rk FROM ("
    "SELECT *, row_number() OVER (PARTITION BY c_mktsegment "
    "ORDER BY spend DESC, c_custkey ASC) AS rk FROM per_cust) "
    "WHERE rk <= 3"
)


def w4_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-day windows sliding by 1 day over events — each event lands in
    two overlapping buckets (``F.window`` with a slide; identical
    semantics in a stream with a watermark). Output = window start
    epoch-ms + count + distinct users."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "2 days", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("win_start_ms"),
            "n",
            "n_users",
        )
    )


_W4_SQL = (
    # each event contributes to the window starting at its own day and
    # the one starting a day earlier (2-day span, 1-day slide)
    "WITH hits AS ("
    "  SELECT epoch_ms(date_trunc('day', ts)) AS win_start_ms, user_id "
    "  FROM events "
    "  UNION ALL "
    "  SELECT epoch_ms(date_trunc('day', ts) - INTERVAL 1 DAY), user_id "
    "  FROM events) "
    "SELECT win_start_ms, count(*) AS n, "
    "count(DISTINCT user_id) AS n_users FROM hits GROUP BY 1"
)


def w5_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series OHLC downsample: per (event_type, day), the value of
    the first event (open), max (high), min (low), and last event
    (close). First/last are picked by row_number over the exact
    (ts_ns, event_id) order — value-deterministic even with same-ns
    events. One shuffle on the (type, day) key; window and final agg
    share the partitioning, so the window sort is the only extra cost."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("ts_ns DIV 86400000000000").alias("day_idx"),
        "ts_ns",
        "event_id",
        "value",
    )
    w_asc = Window.partitionBy("event_type", "day_idx").orderBy(
        "ts_ns", "event_id"
    )
    w_desc = Window.partitionBy("event_type", "day_idx").orderBy(
        F.desc("ts_ns"), F.desc("event_id")
    )
    return (
        events.withColumn("rn_a", F.row_number().over(w_asc))
        .withColumn("rn_d", F.row_number().over(w_desc))
        .groupBy("event_type", "day_idx")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
    )


_W5_SQL = (
    "WITH e AS (SELECT event_type, "
    "epoch_ns(ts) // 86400000000000 AS day_idx, "
    "epoch_ns(ts) AS tns, event_id, value FROM events), "
    "r AS (SELECT *, "
    "row_number() OVER (PARTITION BY event_type, day_idx "
    "ORDER BY tns, event_id) AS rn_a, "
    "row_number() OVER (PARTITION BY event_type, day_idx "
    "ORDER BY tns DESC, event_id DESC) AS rn_d FROM e) "
    "SELECT event_type, day_idx, "
    "max(CASE WHEN rn_a = 1 THEN value END) AS open, "
    "max(value) AS high, min(value) AS low, "
    "max(CASE WHEN rn_d = 1 THEN value END) AS close, "
    "count(*) AS n "
    "FROM r GROUP BY 1, 2"
)


def w6_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative audience growth: new users per day + running total.

    A running COUNT(DISTINCT) is not incrementally computable, so this
    uses the scale rewrite: per-user min(first day) — one shuffle on
    user_id — then a per-day count and a running sum over ~|days| rows.
    The global window never sees raw events."""
    events = load_table(spark, sf_dir, "events")
    day_ms = F.expr("unix_millis(date_trunc('DAY', ts))")
    first_seen = events.groupBy("user_id").agg(
        F.min(day_ms).alias("day_ms")
    )
    per_day = first_seen.groupBy("day_ms").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    # Unpartitioned BY DESIGN, and scale-safe: the input is the
    # post-aggregation DAILY series, so the single window task holds
    # |calendar days| rows (thousands at any corpus size), never the
    # corpus. Spark's 'No Partition Defined' warning is expected here
    # and is not a scale bug.
    w = Window.orderBy("day_ms")
    return per_day.select(
        "day_ms",
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )


_W6_SQL = (
    "WITH fs AS (SELECT user_id, min(epoch_ms(date_trunc('day', ts))) "
    "AS day_ms FROM events GROUP BY 1), "
    "pd AS (SELECT day_ms, count(*) AS new_users FROM fs GROUP BY 1) "
    "SELECT day_ms, new_users, "
    "CAST(SUM(new_users) OVER (ORDER BY day_ms) AS BIGINT) AS cum_users "
    "FROM pd"
)


def w7_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 build: collapse each user's event stream into
    validity intervals of their current event_type (runs of equal type
    become one row with valid_from/valid_to, open-ended for the
    current state). The standard dimension-history merge a warehouse
    runs on every load.

    Scale shape: one shuffle on user_id; both windows and the island
    group-by reuse that partitioning, so history build is a single
    exchange regardless of fact size. The user_id % 97 slice bounds
    the *output* (and is pushed to the scan); the plan is unchanged
    for the full population."""
    events = (
        load_table(spark, sf_dir, "events")
        .where((F.col("user_id") % 97) == 0)
        # order on raw ts_ns: the us-floored ts can tie where the
        # oracle's nanosecond timestamps don't (same trap as w5)
        .select("user_id", "ts_ns", "event_id", "event_type")
    )
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    flagged = events.withColumn(
        "new_run",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        ).otherwise(0),
    ).withColumn(
        "run_id",
        F.sum("new_run").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    runs = flagged.groupBy("user_id", "run_id", "event_type").agg(
        F.min("ts_ns").alias("from_ns"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w_next = Window.partitionBy("user_id").orderBy("run_id")
    return runs.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.expr("from_ns DIV 1000000").alias("from_ms"),
        F.expr(
            "lead(from_ns) OVER (PARTITION BY user_id ORDER BY run_id) "
            "DIV 1000000"
        ).alias("to_ms"),
        F.when(F.lead("from_ns").over(w_next).isNull(), 1)
        .otherwise(0)
        .alias("is_current"),
        "n_events",
    )


_W7_SQL = (
    "WITH e AS (SELECT user_id, epoch_ns(ts) AS tns, event_id, event_type "
    "FROM events WHERE user_id % 97 = 0), "
    "f AS (SELECT *, CASE WHEN lag(event_type) OVER "
    "(PARTITION BY user_id ORDER BY tns, event_id) IS NULL OR "
    "lag(event_type) OVER (PARTITION BY user_id ORDER BY tns, event_id) "
    "<> event_type THEN 1 ELSE 0 END AS new_run FROM e), "
    "n AS (SELECT *, sum(new_run) OVER (PARTITION BY user_id "
    "ORDER BY tns, event_id ROWS UNBOUNDED PRECEDING) AS run_id FROM f), "
    "runs AS (SELECT user_id, run_id, event_type, min(tns) AS from_ns, "
    "count(*) AS n_events FROM n GROUP BY 1, 2, 3) "
    "SELECT user_id, event_type AS state, "
    "from_ns // 1000000 AS from_ms, "
    "lead(from_ns) OVER (PARTITION BY user_id ORDER BY run_id) "
    "// 1000000 AS to_ms, "
    "CASE WHEN lead(from_ns) OVER "
    "(PARTITION BY user_id ORDER BY run_id) IS NULL THEN 1 ELSE 0 END "
    "AS is_current, CAST(n_events AS BIGINT) AS n_events FROM runs"
)


_FUNNEL = ["view", "click", "purchase"]
_FUNNEL_WINDOW_NS = 12 * 3600 * 1_000_000_000  # 12 h conversion window


def w8_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users reaching view → click within
    12 h of the first view → purchase within 12 h of that click.
    Stage N's anchor is the min event time strictly AFTER (and within
    the window of) the user's stage-N-1 anchor — sequential-conversion
    semantics, not set membership (the fixture drops 150 → 37 → 7
    across the stages, so ordering bugs change the answer).

    Scale shape: one aggregation per stage, each a shuffle on user_id
    only (state = |users|, never |events|); stage joins are
    user_id-partitioned equi-joins that AQE co-locates with the aggs.
    Raw ns timestamps order the stages; the output is stage counts, so
    no timestamp leaves the query."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts_ns", "event_type"
    )
    anchors = (
        events.filter(F.col("event_type") == _FUNNEL[0])
        .groupBy("user_id")
        .agg(F.min("ts_ns").alias("t"))
    )
    stages = [anchors]
    for ev in _FUNNEL[1:]:
        prev = stages[-1].select("user_id", F.col("t").alias("t_prev"))
        nxt = (
            events.filter(F.col("event_type") == ev)
            .join(prev, "user_id")
            .filter(
                (F.col("ts_ns") > F.col("t_prev"))
                & (F.col("ts_ns") <= F.col("t_prev") + _FUNNEL_WINDOW_NS)
            )
            .groupBy("user_id")
            .agg(F.min("ts_ns").alias("t"))
        )
        stages.append(nxt)
    out = None
    for i, (name, df) in enumerate(zip(_FUNNEL, stages)):
        row = df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users")
        ).select(
            F.lit(i + 1).alias("stage_no"),
            F.lit(name).alias("stage"),
            "n_users",
        )
        out = row if out is None else out.unionByName(row)
    return out


_W8_SQL = (
    "WITH e AS (SELECT user_id, epoch_ns(ts) AS tns, event_type "
    "FROM events), "
    "s1 AS (SELECT user_id, min(tns) AS t FROM e "
    "WHERE event_type = 'view' GROUP BY 1), "
    "s2 AS (SELECT e.user_id, min(tns) AS t FROM e "
    "JOIN s1 ON e.user_id = s1.user_id AND e.tns > s1.t "
    f"AND e.tns <= s1.t + {_FUNNEL_WINDOW_NS} "
    "WHERE event_type = 'click' GROUP BY 1), "
    "s3 AS (SELECT e.user_id, min(tns) AS t FROM e "
    "JOIN s2 ON e.user_id = s2.user_id AND e.tns > s2.t "
    f"AND e.tns <= s2.t + {_FUNNEL_WINDOW_NS} "
    "WHERE event_type = 'purchase' GROUP BY 1) "
    "SELECT 1 AS stage_no, 'view' AS stage, "
    "CAST(count(*) AS BIGINT) AS n_users FROM s1 "
    "UNION ALL SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM s2 "
    "UNION ALL SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM s3"
)


# --------------------------------------------------------------------------
# w9 — calendar gap fill + forward fill (sparse time series densification)
# --------------------------------------------------------------------------

# Sparse slice: ~1/19 of users above a value threshold leaves real
# calendar gaps at small SF, so the fill path is actually exercised.
_W9_USER_MOD, _W9_USER_RESIDUE, _W9_MIN_VALUE = 19, 7, 100


def w9_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densify a sparse daily revenue series: build the full calendar
    between the slice's first and last day, left-join the daily
    aggregate onto it per event type, and forward-fill missing days
    with the last observed value (``last(..., ignorenulls)`` /
    ``last_value(... IGNORE NULLS)``).

    Scale shape: the raw scan aggregates to |types|×|days| rows before
    anything else happens; the calendar explode is driven by a one-row
    min/max aggregate and the grid is a broadcast of two tiny dims. The
    forward-fill window sorts |days| rows per type — never raw events.
    Revenue aggregates as micros-of-value BIGINT (value cast to
    decimal(18,6), scaled by 1e6): integer forward-fill, zero float
    drift between engines."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(
            (F.col("user_id") % _W9_USER_MOD == _W9_USER_RESIDUE)
            & (F.col("value") > _W9_MIN_VALUE)
        )
        .select("event_type", F.to_date("ts").alias("d"), "value")
    )
    # Calendar bounds and the type list both derive from the |types| ×
    # |days| aggregate, NOT from the raw slice — events is scanned
    # exactly once, and everything after the agg is dimension-sized.
    daily = scoped_persist(
        ev.groupBy("event_type", "d").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.expr(
                "CAST(sum(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT)"
            ).alias("rev_micros"),
        )
    )
    cal = (
        daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
        .select(
            F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d")
        )
        .withColumn("k", F.lit(1))
    )
    types = daily.select("event_type").distinct().withColumn("k", F.lit(1))
    grid = cal.join(F.broadcast(types), "k").select("event_type", "d")
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(daily, ["event_type", "d"], "left")
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.coalesce("n_events", F.lit(0)).cast("bigint").alias(
                "n_events"
            ),
            "rev_micros",
            F.last("rev_micros", ignorenulls=True).over(w).alias(
                "ff_rev_micros"
            ),
        )
    )


_W9_SQL = (
    "WITH s AS (SELECT event_type, CAST(ts AS DATE) AS d, value "
    f"FROM events WHERE user_id % {_W9_USER_MOD} = {_W9_USER_RESIDUE} "
    f"AND value > {_W9_MIN_VALUE}), "
    "daily AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS n, "
    "CAST(sum(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS rev "
    "FROM s GROUP BY 1, 2), "
    "b AS (SELECT min(d) AS lo, max(d) AS hi FROM s), "
    "cal AS (SELECT CAST(unnest(generate_series(lo, hi, "
    "INTERVAL 1 DAY)) AS DATE) AS d FROM b), "
    "ty AS (SELECT DISTINCT event_type FROM s), "
    "grid AS (SELECT ty.event_type, cal.d FROM ty CROSS JOIN cal) "
    "SELECT g.event_type, strftime(g.d, '%Y-%m-%d') AS day, "
    "coalesce(daily.n, 0) AS n_events, daily.rev AS rev_micros, "
    "last_value(daily.rev IGNORE NULLS) OVER "
    "(PARTITION BY g.event_type ORDER BY g.d "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff_rev_micros "
    "FROM grid g LEFT JOIN daily "
    "ON g.event_type = daily.event_type AND g.d = daily.d"
)


# --------------------------------------------------------------------------
# w10 — exponential moving average (integer-exact recursive smoothing)
# --------------------------------------------------------------------------


def w10_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily order-count EMA with α = 1/5: ``ema_d = (x_d + 4·ema_{d-1})
    DIV 5`` in micro-units — the one windowed statistic SQL windows
    can't express (each row depends on the previous OUTPUT, not the
    previous input), done as a per-prefix fold over the packed daily
    series.

    Parity: the recurrence stays in BIGINT micros end to end — float
    EMA would compound ULP drift across 2400 fold steps; integer DIV
    is bit-stable in both engines. Spark's ``transform`` lambda index
    is 0-based, DuckDB's 1-based: the prefix slices are written so both
    fold exactly the first i elements with the first element as seed.

    Scale shape: the fold runs on the |days|-row aggregate (2.4 k rows
    for 6.5 y of orders), packed into one row — O(days²) lambda steps,
    ~3 M here, independent of fact-table scale. The 100 TB shape for
    *unbounded* series is the streaming variant: st2's
    applyInPandasWithState carries exactly this ema_micros as its
    running state; this batch form exists for backfills, where the
    series length is the calendar, not the corpus."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    packed = daily.agg(
        F.expr("sort_array(collect_list(struct(d, n)))").alias("s")
    ).selectExpr(
        "transform(s, e -> e.d) AS ds",
        "transform(s, e -> CAST(e.n AS BIGINT)) AS ns",
    ).selectExpr(
        "ds",
        "ns",
        "transform(ns, v -> v * 1000000) AS sc",
    )
    return packed.selectExpr(
        # Spark lambda index i is 0-based: fold elements 2..i+1 seeded
        # with sc[0] == fold of the first i+1 elements.
        "explode(arrays_zip(ds, ns, transform(ns, (x, i) -> "
        "aggregate(slice(sc, 2, i), sc[0], "
        "(acc, v) -> (v + 4 * acc) DIV 5)))) AS r"
    ).selectExpr(
        "r.ds AS d", "r.ns AS n", "r.`2` AS ema_micros"
    )


_W10_SQL = (
    "WITH daily AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS d, "
    "CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY 1), "
    "p AS (SELECT list(d ORDER BY d) AS ds, list(n ORDER BY d) AS ns "
    "FROM daily), "
    "e AS (SELECT ds, ns, list_transform(ns, v -> v * 1000000) AS sc "
    "FROM p) "
    # DuckDB lambda index i is 1-based: reduce of the first i elements
    # (seeded by the first) == Spark's fold at 0-based index i-1.
    "SELECT unnest(ds) AS d, unnest(ns) AS n, "
    "unnest(list_transform(ns, (x, i) -> "
    "list_reduce(list_slice(sc, 1, i), "
    "(acc, v) -> (v + 4 * acc) // 5))) AS ema_micros FROM e"
)


# --------------------------------------------------------------------------
# w11 — rolling z-score anomaly detection
# --------------------------------------------------------------------------

_W11_TRAIL = 7  # trailing window (days), current day excluded
_W11_SIGMA = 2.0


def w11_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-volume anomaly detection: each day's order count scored
    against the mean/std of the trailing 7 days (current day excluded —
    the anomaly must not contaminate its own baseline). Days with
    |z| > 2 flag as anomalies.

    Parity: the window sums are EXACT BIGINTs (counts and squared
    counts), so mean and variance derive from identical integers in
    both engines; the only float work is one identical-order
    (s2 - s1²/n)/(n-1) expression and a sqrt, with z rounded at the
    final projection (the cosine-score pattern). Scale: one hash
    aggregate to |days| rows, then a frame-bounded window over the
    aggregated series — same shape as w2."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    # Unpartitioned BY DESIGN, and scale-safe: the input is the
    # post-aggregation DAILY series, so the single window task holds
    # |calendar days| rows (thousands at any corpus size), never the
    # corpus. Spark's 'No Partition Defined' warning is expected here
    # and is not a scale bug.
    w = Window.orderBy("d").rowsBetween(-_W11_TRAIL, -1)
    scored = (
        daily.withColumn("s1", F.sum("n").over(w).cast("bigint"))
        .withColumn("s2", F.sum(F.expr("n * n")).over(w).cast("bigint"))
        .withColumn("cnt", F.count("n").over(w).cast("bigint"))
        .filter(F.col("cnt") == _W11_TRAIL)
    )
    # nullif guards the flat-baseline case (7 identical trailing days →
    # std 0): Spark under ANSI throws on /0 and DuckDB yields ±Inf —
    # both sides agree on NULL instead (CLAUDE.md denominators rule).
    z = F.expr(
        "(CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(cnt AS DOUBLE)) / "
        "nullif(sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * "
        "CAST(s1 AS DOUBLE) / CAST(cnt AS DOUBLE)) / "
        "(CAST(cnt AS DOUBLE) - 1.0)), CAST(0.0 AS DOUBLE))"
    )
    return scored.select(
        "d",
        "n",
        F.round(z, 6).alias("z"),
        (F.abs(z) > _W11_SIGMA).alias("is_anomaly"),
    )


_W11_SQL = (
    "WITH daily AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS d, "
    "CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY 1), "
    "scored AS (SELECT d, n, "
    f"CAST(sum(n) OVER tw AS BIGINT) AS s1, "
    f"CAST(sum(n * n) OVER tw AS BIGINT) AS s2, "
    f"CAST(count(n) OVER tw AS BIGINT) AS cnt FROM daily "
    f"WINDOW tw AS (ORDER BY d ROWS BETWEEN {_W11_TRAIL} PRECEDING "
    "AND 1 PRECEDING)) "
    "SELECT d, n, "
    "round((CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(cnt AS DOUBLE)) / "
    "nullif(sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * "
    "CAST(s1 AS DOUBLE) / CAST(cnt AS DOUBLE)) / "
    "(CAST(cnt AS DOUBLE) - 1.0)), 0), 6) AS z, "
    "abs((CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(cnt AS DOUBLE)) / "
    "nullif(sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * "
    "CAST(s1 AS DOUBLE) / CAST(cnt AS DOUBLE)) / "
    f"(CAST(cnt AS DOUBLE) - 1.0)), 0)) > {_W11_SIGMA} AS is_anomaly "
    f"FROM scored WHERE cnt = {_W11_TRAIL}"
)


# --------------------------------------------------------------------------
# w12 — retention cohort matrix
# --------------------------------------------------------------------------

_WEEK_MS = 7 * 24 * 3600 * 1000


def w12_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts — the product-analytics staple: users
    bucketed by first-active week (their cohort), then counted per
    (cohort, week-offset) cell; cell (c, k) answers "of the users who
    arrived in week c, how many were active k weeks later?".

    Scale shape: ONE shuffle on user_id collects each user's distinct
    active weeks into a per-user array (bounded by |calendar weeks|,
    never the event count — collect_set dedups map-side), the cohort is
    the array's min, and the explode + final aggregate lands on
    |weeks|² cells. No per-event window, no self-join of the events
    table. Parity: week starts are epoch-ms BIGINTs (both engines
    truncate to ISO Monday), so offsets are exact integer divisions —
    no date arithmetic floats."""
    events = load_table(spark, sf_dir, "events")
    week_ms = F.expr("unix_millis(date_trunc('WEEK', ts))")
    per_user = (
        events.select("user_id", week_ms.alias("week_ms"))
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_set("week_ms")).alias("weeks"))
    )
    return (
        per_user.select(
            F.element_at("weeks", 1).alias("cohort_ms"),
            F.explode("weeks").alias("week_ms"),
        )
        .select(
            F.col("cohort_ms").cast("bigint").alias("cohort_ms"),
            F.expr(f"(week_ms - cohort_ms) DIV {_WEEK_MS}")
            .cast("bigint")
            .alias("week_offset"),
        )
        .groupBy("cohort_ms", "week_offset")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


_W12_SQL = (
    "WITH a AS (SELECT DISTINCT user_id, "
    "epoch_ms(date_trunc('week', ts)) AS week_ms FROM events), "
    "c AS (SELECT user_id, min(week_ms) AS cohort_ms FROM a GROUP BY 1) "
    "SELECT CAST(c.cohort_ms AS BIGINT) AS cohort_ms, "
    f"CAST((a.week_ms - c.cohort_ms) // {_WEEK_MS} AS BIGINT) "
    "AS week_offset, CAST(count(*) AS BIGINT) AS n_users "
    "FROM a JOIN c ON a.user_id = c.user_id GROUP BY 1, 2"
)


# --------------------------------------------------------------------------
# w13 — engagement stickiness (DAU/WAU/MAU)
# --------------------------------------------------------------------------


def w13_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day engagement stickiness: DAU, trailing-7-day WAU,
    trailing-30-day MAU, and DAU/MAU in integer basis points — the
    product-health ratio every growth dashboard tracks. The scale
    rewrite mirrors w6: per-user FIRST/ALL active days collapse through
    one user_id shuffle into (user, day) distinct rows, and the rolling
    distinct-user windows are computed per DAY over that deduped set —
    a trailing COUNT DISTINCT over raw events would re-scan the corpus
    per day. Here the per-day frame re-counts distinct users over
    day-grained rows (|users|·|active days| worst case, corpus-bounded
    calendar slices); basis points use DIV so both engines agree
    exactly."""
    events = load_table(spark, sf_dir, "events")
    ud = (
        events.select(
            "user_id",
            F.expr("unix_millis(date_trunc('DAY', ts))").alias("day_ms"),
        )
        .distinct()
    )
    days = ud.select("day_ms").distinct()
    day_ms = 86400000
    wnd = 30 * day_ms
    # per (day, lookback) distinct users: join the day grid to the
    # (user, day) rows in the trailing window, then count distinct —
    # over day-grained rows, never raw events. The join carries a
    # 30-day-bucket EQUI-prekey: a day's trailing window spans at most
    # bucket(d) and bucket(d)-1, so the small grid side explodes into
    # those two bucket rows and the range predicate becomes a
    # post-filter on a hash join. Without the prekey Spark plans a
    # BroadcastNestedLoopJoin where every user-day row scans the whole
    # broadcast day grid (~2,400 rows at a decade of days) to keep
    # ≤30 — the prekey cuts the comparison constant ~100× and is
    # plan-pinned (tests/test_plans.py: no BNLJ in w13).
    d = days.select(
        "day_ms",
        F.explode(
            F.array(
                F.expr(f"day_ms DIV {wnd}"),
                F.expr(f"day_ms DIV {wnd} - 1"),
            )
        ).alias("bucket"),
    ).alias("d")
    u = ud.withColumn("bucket", F.expr(f"day_ms DIV {wnd}")).alias("u")
    joined = d.join(
        u,
        (F.col("u.bucket") == F.col("d.bucket"))
        & (F.col("u.day_ms") <= F.col("d.day_ms"))
        & (F.col("u.day_ms") > F.col("d.day_ms") - wnd),
    )
    agg = joined.groupBy(F.col("d.day_ms").alias("day_ms")).agg(
        F.countDistinct(
            F.when(F.col("u.day_ms") == F.col("d.day_ms"), F.col("u.user_id"))
        )
        .cast("bigint")
        .alias("dau"),
        F.countDistinct(
            F.when(
                F.col("u.day_ms") > F.col("d.day_ms") - 7 * day_ms,
                F.col("u.user_id"),
            )
        )
        .cast("bigint")
        .alias("wau"),
        F.countDistinct("u.user_id").cast("bigint").alias("mau"),
    )
    return agg.select(
        "day_ms",
        "dau",
        "wau",
        "mau",
        F.expr("(10000 * dau) DIV mau").cast("bigint").alias("stickiness_bp"),
    )


_W13_SQL = (
    "WITH ud AS (SELECT DISTINCT user_id, "
    "epoch_ms(date_trunc('day', ts)) AS day_ms FROM events), "
    "days AS (SELECT DISTINCT day_ms FROM ud), "
    "j AS (SELECT d.day_ms AS day_ms, u.user_id, u.day_ms AS u_day "
    "FROM days d JOIN ud u ON u.day_ms <= d.day_ms "
    "AND u.day_ms > d.day_ms - 2592000000) "
    "SELECT day_ms, "
    "CAST(count(DISTINCT CASE WHEN u_day = day_ms THEN user_id END) "
    "AS BIGINT) AS dau, "
    "CAST(count(DISTINCT CASE WHEN u_day > day_ms - 604800000 "
    "THEN user_id END) AS BIGINT) AS wau, "
    "CAST(count(DISTINCT user_id) AS BIGINT) AS mau, "
    "CAST((10000 * count(DISTINCT CASE WHEN u_day = day_ms THEN user_id "
    "END)) // count(DISTINCT user_id) AS BIGINT) AS stickiness_bp "
    "FROM j GROUP BY 1"
)


def w14_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM user segmentation — the classic growth/CRM rollup: per user,
    Recency (days since last purchase, vs the corpus's latest purchase
    day), Frequency (purchase count) and Monetary (lifetime cents),
    each banded into business-threshold scores 1–3, then one row per
    (r, f, m) segment with user count and revenue. Fixed integer
    thresholds instead of ntile quantiles ON PURPOSE: global ntile is a
    global sort (the one window shape that cannot survive 100 TB), and
    production RFM bands are business-defined constants anyway. Shape:
    one user_id shuffle (the per-user rollup) + one 27-ary segment
    aggregate; the corpus reference day is a broadcast scalar. Money
    accumulates in DECIMAL cents (order-independent; the CLAUDE.md
    double-sum rule)."""
    events = load_table(spark, sf_dir, "events")
    day_ms = 86400000
    p = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.expr("unix_millis(date_trunc('DAY', ts))").alias("d"),
        F.expr(
            "CAST(CAST(value AS DECIMAL(18,6)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    per_user = p.groupBy("user_id").agg(
        F.max("d").alias("last_d"),
        F.count(F.lit(1)).alias("n_purch"),
        F.sum("cents").alias("cents"),
    )
    ref = per_user.agg(F.max("last_d").alias("ref_d"))
    scored = (
        per_user.crossJoin(F.broadcast(ref))
        .withColumn(
            "recency_days", F.expr(f"(ref_d - last_d) DIV {day_ms}")
        )
        .withColumn(
            "r",
            F.expr(
                "CASE WHEN recency_days <= 2 THEN 3 "
                "WHEN recency_days <= 7 THEN 2 ELSE 1 END"
            ),
        )
        .withColumn(
            "f",
            F.expr(
                "CASE WHEN n_purch >= 15 THEN 3 "
                "WHEN n_purch >= 8 THEN 2 ELSE 1 END"
            ),
        )
        .withColumn(
            "m",
            F.expr(
                "CASE WHEN cents >= 80000 THEN 3 "
                "WHEN cents >= 40000 THEN 2 ELSE 1 END"
            ),
        )
    )
    return scored.groupBy("r", "f", "m").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("cents").cast("bigint").alias("segment_cents"),
    )


_W14_SQL = (
    "WITH p AS (SELECT user_id, epoch_ms(date_trunc('day', ts)) AS d, "
    "CAST(CAST(value AS DECIMAL(18,6)) * 100 AS BIGINT) AS cents "
    "FROM events WHERE event_type = 'purchase'), "
    "pu AS (SELECT user_id, max(d) AS last_d, count(*) AS n_purch, "
    "sum(cents) AS cents FROM p GROUP BY 1), "
    "ref AS (SELECT max(last_d) AS ref_d FROM pu), "
    "s AS (SELECT pu.*, (ref_d - last_d) // 86400000 AS recency_days "
    "FROM pu CROSS JOIN ref) "
    "SELECT CASE WHEN recency_days <= 2 THEN 3 "
    "WHEN recency_days <= 7 THEN 2 ELSE 1 END AS r, "
    "CASE WHEN n_purch >= 15 THEN 3 "
    "WHEN n_purch >= 8 THEN 2 ELSE 1 END AS f, "
    "CASE WHEN cents >= 80000 THEN 3 "
    "WHEN cents >= 40000 THEN 2 ELSE 1 END AS m, "
    "CAST(count(*) AS BIGINT) AS n_users, "
    "CAST(sum(cents) AS BIGINT) AS segment_cents "
    "FROM s GROUP BY 1, 2, 3"
)


# --------------------------------------------------------------------------
# w15 — multi-touch attribution (first-touch vs last-touch)
# --------------------------------------------------------------------------

_W15_LOOKBACK_NS = 7 * 24 * 3600 * 1_000_000_000  # 7-day lookback


def w15_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution over the event stream: every purchase is
    credited to the user's FIRST and LAST touch (view/click/signup)
    inside a 7-day lookback strictly before the purchase, and revenue
    rolls up per (model, touch_type) — the two bookend models every
    attribution report starts with (extends the reference's per-feed
    counting, visualizer.py:116-188, to revenue-weighted credit).

    Scale shape: touches join purchases on user_id only (one user-keyed
    shuffle; pair volume is bounded by per-user activity in the 7-day
    window, the same contract as w8/xj2 — never a cross of the event
    corpus), the per-purchase bookends are one row_number window over
    those pairs keyed by purchase id, and the final rollup is a
    |models|x|touch_types| aggregate. Revenue accumulates as
    decimal(18,6) cents — order-independent, no float drift. Ties on
    touch timestamp break by event_type then event_id, identically in
    the oracle."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts_ns", "event_type", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts_ns").alias("p_ts"),
        F.col("value").alias("revenue"),
    )
    touches = ev.filter(
        F.col("event_type").isin("view", "click", "signup")
    ).select(
        "user_id",
        F.col("ts_ns").alias("t_ts"),
        F.col("event_type").alias("touch_type"),
        F.col("event_id").alias("t_id"),
    )
    pairs = purchases.join(touches, "user_id").filter(
        (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.lit(_W15_LOOKBACK_NS))
    )
    w_first = Window.partitionBy("p_id").orderBy(
        F.asc("t_ts"), F.asc("touch_type"), F.asc("t_id")
    )
    w_last = Window.partitionBy("p_id").orderBy(
        F.desc("t_ts"), F.asc("touch_type"), F.asc("t_id")
    )
    ranked = pairs.select(
        "p_id",
        "revenue",
        "touch_type",
        F.row_number().over(w_first).alias("rk_first"),
        F.row_number().over(w_last).alias("rk_last"),
    )
    first = ranked.filter("rk_first = 1").select(
        F.lit("first_touch").alias("model"), "touch_type", "revenue"
    )
    last = ranked.filter("rk_last = 1").select(
        F.lit("last_touch").alias("model"), "touch_type", "revenue"
    )
    return (
        first.unionByName(last)
        .groupBy("model", "touch_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("conversions"),
            F.expr(
                "CAST(sum(CAST(revenue AS DECIMAL(18,6))) * 100 "
                "AS BIGINT)"
            ).alias("revenue_cents"),
        )
    )


_W15_SQL = (
    "WITH e AS (SELECT event_id, user_id, epoch_ns(ts) AS tns, "
    "event_type, value FROM events), "
    "p AS (SELECT event_id AS p_id, user_id, tns AS p_ts, "
    "value AS revenue FROM e WHERE event_type = 'purchase'), "
    "t AS (SELECT user_id, tns AS t_ts, event_type AS touch_type, "
    "event_id AS t_id FROM e "
    "WHERE event_type IN ('view', 'click', 'signup')), "
    "pairs AS (SELECT p.p_id, p.revenue, t.touch_type, t.t_ts, t.t_id "
    "FROM p JOIN t ON p.user_id = t.user_id "
    "AND t.t_ts < p.p_ts "
    f"AND t.t_ts >= p.p_ts - {_W15_LOOKBACK_NS}), "
    "ranked AS (SELECT p_id, revenue, touch_type, "
    "row_number() OVER (PARTITION BY p_id "
    "ORDER BY t_ts ASC, touch_type ASC, t_id ASC) AS rk_first, "
    "row_number() OVER (PARTITION BY p_id "
    "ORDER BY t_ts DESC, touch_type ASC, t_id ASC) AS rk_last "
    "FROM pairs), "
    "u AS (SELECT 'first_touch' AS model, touch_type, revenue "
    "FROM ranked WHERE rk_first = 1 "
    "UNION ALL SELECT 'last_touch', touch_type, revenue "
    "FROM ranked WHERE rk_last = 1) "
    "SELECT model, touch_type, CAST(count(*) AS BIGINT) AS conversions, "
    "CAST(sum(CAST(revenue AS DECIMAL(18,6))) * 100 AS BIGINT) "
    "AS revenue_cents FROM u GROUP BY 1, 2"
)




def w16_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average over an IRREGULAR series — TimescaleDB's
    ``time_weight('LOCF')`` for event streams where plain AVG is wrong
    because samples are unevenly spaced (a value that held for an hour
    must weigh 3600x one that held a second): per event_type, each
    value is weighted by how long it remained current (gap to the next
    sample in the deterministic (ts_ns, event_id) order; the last
    sample holds no interval), divided by the observed span.

    Parity/scale notes: values convert to exact DECIMAL-derived cents
    BEFORE weighting (never a raw-double product), gaps are integer
    microseconds (each gap ns-floored independently — the certificate
    defines TWA over mus-floored LOCF segments), so weighted sums are
    pure BIGINT in any engine. One event_type shuffle shared by the
    lead() window and the final aggregate; products bounded by
    cents x span, ~1e15 at any corpus density (denser events shrink
    each gap as they add rows)."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts_ns",
        "event_id",
        F.expr(
            "CAST(CAST(value AS DECIMAL(18,6)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    w = Window.partitionBy("event_type").orderBy("ts_ns", "event_id")
    seg = events.withColumn("nxt", F.lead("ts_ns").over(w)).withColumn(
        "dt_us", F.expr("(nxt - ts_ns) DIV 1000")
    )
    return (
        seg.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.expr("CAST(sum(cents * dt_us) AS BIGINT)").alias("w_sum"),
            F.expr(
                "CAST((max(ts_ns) - min(ts_ns)) DIV 1000 AS BIGINT)"
            ).alias("span_us"),
        )
        .withColumn(
            "twa_cents",
            F.expr("w_sum DIV nullif(span_us, 0)").cast("bigint"),
        )
    )


_W16_SQL = (
    "WITH e AS (SELECT event_type, epoch_ns(ts) AS tns, event_id, "
    "CAST(CAST(value AS DECIMAL(18,6)) * 100 AS BIGINT) AS cents "
    "FROM events), "
    "s AS (SELECT *, lead(tns) OVER (PARTITION BY event_type "
    "ORDER BY tns, event_id) AS nxt FROM e), "
    "g AS (SELECT event_type, tns, cents, (nxt - tns) // 1000 AS dt_us "
    "FROM s) "
    "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
    "CAST(sum(cents * dt_us) AS BIGINT) AS w_sum, "
    "CAST((max(tns) - min(tns)) // 1000 AS BIGINT) AS span_us, "
    "CAST(CAST(sum(cents * dt_us) AS BIGINT) // "
    "nullif(CAST((max(tns) - min(tns)) // 1000 AS BIGINT), 0) "
    "AS BIGINT) AS twa_cents "
    "FROM g GROUP BY 1"
)


def w17_pareto_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W17 — Pareto concentration of corpus mass by source: rank
    sources by their character mass, accumulate shares, and flag the
    head set that carries 80% of the corpus — the concentration
    profile a curation team reads before deciding which providers to
    renegotiate, cap (x43 does the greedy selection; this is the
    diagnosis), or dedup first. ``in_head`` uses the strict
    "started before the 80% line" rule (cum_before < 0.8·total ⟺
    10·cum_before < 8·total — pure BIGINT, no float share crosses
    engines); the emitted share is integer basis points.

    Scale shape: one |sources|-keyed aggregate, then an unpartitioned
    window over the AGGREGATED frame — |sources| rows at any corpus
    size (hundreds, not billions), the same post-aggregation single-
    task shape as w11's daily series. Deterministic (mass DESC,
    source ASC) ordering."""
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.sum("n_chars").cast("bigint").alias("mass")
    )
    w = Window.orderBy(F.desc("mass"), F.asc("source"))
    cum = Window.orderBy(F.desc("mass"), F.asc("source")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    total = per_src.agg(F.sum("mass").cast("bigint").alias("total"))
    return (
        per_src.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .withColumn("cum_mass", F.sum("mass").over(cum).cast("bigint"))
        .select(
            "source",
            "mass",
            "rank",
            "cum_mass",
            F.expr("(10000 * cum_mass) DIV total")
            .cast("bigint")
            .alias("cum_share_bp"),
            F.expr("10 * (cum_mass - mass) < 8 * total").alias("in_head"),
        )
    )


_W17_SQL = (
    "WITH per_src AS (SELECT source, CAST(sum(n_chars) AS BIGINT) "
    "AS mass FROM documents GROUP BY 1), "
    "t AS (SELECT CAST(sum(mass) AS BIGINT) AS total FROM per_src), "
    "r AS (SELECT source, mass, "
    "CAST(row_number() OVER (ORDER BY mass DESC, source ASC) AS BIGINT) "
    "AS rank, "
    "CAST(sum(mass) OVER (ORDER BY mass DESC, source ASC "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
    "AS cum_mass FROM per_src) "
    "SELECT source, mass, rank, cum_mass, "
    "CAST((10000 * cum_mass) // total AS BIGINT) AS cum_share_bp, "
    "10 * (cum_mass - mass) < 8 * total AS in_head "
    "FROM r CROSS JOIN t"
)


QUERIES = {
    "w1_daily_delta": w1_daily_delta,
    "w2_moving_avg": w2_moving_avg,
    "w3_rank_in_group": w3_rank_in_group,
    "w4_sliding_windows": w4_sliding_windows,
    "w5_ohlc_downsample": w5_ohlc_downsample,
    "w6_new_users": w6_new_users,
    "w7_scd2_user_state": w7_scd2_user_state,
    "w8_funnel": w8_funnel,
    "w9_gap_fill": w9_gap_fill,
    "w10_ema": w10_ema,
    "w11_anomaly_zscore": w11_anomaly_zscore,
    "w12_retention_cohorts": w12_retention_cohorts,
    "w13_stickiness": w13_stickiness,
    "w14_rfm_segments": w14_rfm_segments,
    "w15_attribution": w15_attribution,
    "w16_time_weighted_avg": w16_time_weighted_avg,
    "w17_pareto_sources": w17_pareto_sources,
}

ORACLES = {
    "w6_new_users": _W6_SQL,
    "w1_daily_delta": _W1_SQL,
    "w2_moving_avg": _W2_SQL,
    "w3_rank_in_group": _W3_SQL,
    "w4_sliding_windows": _W4_SQL,
    "w5_ohlc_downsample": _W5_SQL,
    "w7_scd2_user_state": _W7_SQL,
    "w8_funnel": _W8_SQL,
    "w9_gap_fill": _W9_SQL,
    "w10_ema": _W10_SQL,
    "w11_anomaly_zscore": _W11_SQL,
    "w12_retention_cohorts": _W12_SQL,
    "w13_stickiness": _W13_SQL,
    "w14_rfm_segments": _W14_SQL,
    "w15_attribution": _W15_SQL,
    "w16_time_weighted_avg": _W16_SQL,
    "w17_pareto_sources": _W17_SQL,
}
