"""Temporal joins Spark lacks a native/scalable plan for: as-of
(point-in-time) lookup and the bounded range join.

The training-data staple: "for each example at time t, the latest
feature/event at-or-before t per key" (point-in-time correctness in
feature stores, prior-action lookups in event streams). The reference
has no temporal join at all; pandas offers ``merge_asof`` single-node.
Here it is the scalable **union + sorted-window merge** formulation:

1. project both sides onto a common shape (key, time, priority, payload),
2. union them — no join node at all,
3. per key, sort by (time, priority, tiebreak) and take
   ``last(right_payload, ignorenulls=True)`` over the preceding-rows
   window,
4. keep the left rows, now carrying their matched right payload.

Cost: ONE shuffle+sort of |left|+|right| rows on the key — identical to
a sort-merge join's shuffle, with none of the range-condition blowup a
nested-loop/theta join would cost. At 100 TB both inputs shuffle once;
a hot key concentrates its rows in one window partition, so salt the key
(coarse time bucket appended to the key, as-of resolved per bucket with
a boundary carry) if one entity dominates.

The DuckDB oracle is the *native* ``ASOF LEFT JOIN`` — the strongest
cross-check available: an independent engine's dedicated implementation
against this composition.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from acero_delta_lake_streaming_spark.catalog import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str | list[str],
    left_time: str,
    right_time: str,
    carry: dict[str, str],
    *,
    allow_exact: bool = False,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join: every ``left`` row picks the latest ``right``
    row with the same ``by`` key and ``right_time`` < ``left_time``
    (``<=`` when ``allow_exact``). Unmatched left rows keep NULLs (left
    semantics).

    ``carry`` maps output column name -> right column; all left columns
    pass through unchanged. When several right rows share (key, time),
    the one with the greatest ``right_tiebreak`` wins — pass a unique
    column there (or pre-dedup) to keep results deterministic.
    """
    keys = [by] if isinstance(by, str) else list(by)
    r_pay = F.struct(*[F.col(src).alias(out) for out, src in carry.items()])
    l_pay = F.struct(*[F.col(c) for c in left.columns])
    r_pay_t = right.select(r_pay.alias("p")).schema["p"].dataType
    l_pay_t = left.select(l_pay.alias("p")).schema["p"].dataType

    # Priorities order rows WITHIN an equal timestamp: with exact matches
    # allowed the right row must precede the left row it matches (0 < 1);
    # strict mode sorts it after (2 > 1) so the window can't see it.
    r_pri = 0 if allow_exact else 2
    tie = (
        F.col(right_tiebreak).cast("long")
        if right_tiebreak
        else F.lit(0).cast("long")
    )
    r_rows = right.select(
        *keys,
        F.col(right_time).cast("long").alias("__t"),
        F.lit(r_pri).alias("__pri"),
        tie.alias("__tie"),
        r_pay.alias("__p"),
        F.lit(None).cast(l_pay_t).alias("__l"),
    )
    l_rows = left.select(
        *keys,
        F.col(left_time).cast("long").alias("__t"),
        F.lit(1).alias("__pri"),
        F.lit(0).cast("long").alias("__tie"),
        F.lit(None).cast(r_pay_t).alias("__p"),
        l_pay.alias("__l"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("__t", "__pri", "__tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l_rows.unionByName(r_rows)
        .withColumn("__m", F.last("__p", ignorenulls=True).over(w))
        .filter(F.col("__l").isNotNull())
    )
    return matched.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__m.{out}").alias(out) for out in carry],
    )


# --------------------------------------------------------------------------
# XJ1 — prior-click lookup over the event stream
# --------------------------------------------------------------------------


def xj1_asof_prior_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every event, the user's most recent strictly-earlier 'click'
    (the classic prior-action feature). Nanosecond ordering comes from
    the raw int64 ``ts_ns``; same-(user, ts) click collisions are
    pre-deduped to the max event_id so both engines pick one winner."""
    ev = load_table(spark, sf_dir, "events")
    left = ev.select("event_id", "user_id", "event_type", "ts_ns")
    dedup_w = Window.partitionBy("user_id", "ts_ns").orderBy(
        F.desc("event_id")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .withColumn("__rk", F.row_number().over(dedup_w))
        .filter(F.col("__rk") == 1)
        .select("user_id", "ts_ns", "event_id", "value")
    )
    out = asof_join(
        left,
        clicks,
        by="user_id",
        left_time="ts_ns",
        right_time="ts_ns",
        carry={
            "prior_click_id": "event_id",
            "prior_click_tns": "ts_ns",
            "prior_click_value": "value",
        },
        allow_exact=False,
        right_tiebreak="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("ts_ns DIV 1000000").alias("ts_ms"),
        "prior_click_id",
        F.expr("prior_click_tns DIV 1000000").alias("prior_click_ts_ms"),
        "prior_click_value",
    )


_XJ1_SQL = (
    "WITH l AS (SELECT event_id, user_id, event_type, epoch_ns(ts) AS tns "
    "FROM events), "
    "c0 AS (SELECT user_id, epoch_ns(ts) AS tns, event_id, value "
    "FROM events WHERE event_type = 'click'), "
    "c AS (SELECT user_id, tns, event_id, value FROM ("
    "  SELECT *, row_number() OVER (PARTITION BY user_id, tns "
    "  ORDER BY event_id DESC) AS rk FROM c0) WHERE rk = 1) "
    "SELECT l.event_id, l.user_id, l.event_type, "
    "l.tns // 1000000 AS ts_ms, "
    "c.event_id AS prior_click_id, "
    "c.tns // 1000000 AS prior_click_ts_ms, "
    "c.value AS prior_click_value "
    "FROM l ASOF LEFT JOIN c "
    "ON l.user_id = c.user_id AND c.tns < l.tns"
)


# --------------------------------------------------------------------------
# XJ2 — bucketed range join (bounded time-window lookback)
# --------------------------------------------------------------------------

_LOOKBACK_NS = 3_600 * 1_000_000_000  # 1 hour


def xj2_range_clicks_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase event: how many clicks the same user made in the
    preceding hour (the bounded-window feature join).

    A naive `c.t BETWEEN p.t - 1h AND p.t` join condition gives Spark a
    nested-loop plan — the classic range-join trap. Bucketing time into
    lookback-sized cells turns it into an **equi-join**: a click lives in
    exactly one cell, a purchase probes its own cell and the previous
    one (2 rows after a small explode), and the exact range predicate
    rides on top as a post-join filter. Candidates per purchase = the
    user's clicks in ≤2 cells, shuffle keys are (user, cell) — the plan
    is guarded nested-loop-free in tests/test_asof.py."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"),
        "user_id",
        F.col("ts_ns").alias("p_tns"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts_ns").alias("c_tns"),
        F.expr(f"ts_ns DIV {_LOOKBACK_NS}").alias("cell"),
    )
    probes = purchases.select(
        "p_event_id",
        "user_id",
        "p_tns",
        F.explode(
            F.expr(
                f"array(p_tns DIV {_LOOKBACK_NS}, "
                f"p_tns DIV {_LOOKBACK_NS} - 1)"
            )
        ).alias("cell"),
    )
    matched = probes.join(clicks, ["user_id", "cell"]).filter(
        (F.col("c_tns") >= F.col("p_tns") - _LOOKBACK_NS)
        & (F.col("c_tns") < F.col("p_tns"))
    )
    counts = matched.groupBy("p_event_id").agg(
        F.count(F.lit(1)).alias("n_clicks_1h")
    )
    return (
        purchases.join(counts, "p_event_id", "left")
        .select(
            F.col("p_event_id").alias("event_id"),
            "user_id",
            F.expr("p_tns DIV 1000000").alias("ts_ms"),
            F.coalesce("n_clicks_1h", F.lit(0)).cast("bigint").alias(
                "n_clicks_1h"
            ),
        )
    )


_XJ2_SQL = (
    "WITH p AS (SELECT event_id, user_id, epoch_ns(ts) AS tns "
    "FROM events WHERE event_type = 'purchase'), "
    "c AS (SELECT user_id, epoch_ns(ts) AS tns "
    "FROM events WHERE event_type = 'click') "
    "SELECT p.event_id, p.user_id, p.tns // 1000000 AS ts_ms, "
    "CAST(count(c.tns) AS BIGINT) AS n_clicks_1h "
    "FROM p LEFT JOIN c ON c.user_id = p.user_id "
    f"AND c.tns >= p.tns - {_LOOKBACK_NS} AND c.tns < p.tns "
    "GROUP BY 1, 2, 3"
)


_XJ3_TOL_NS = 3_600_000_000_000  # 1 hour staleness bound


def xj3_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XJ3 — as-of join with a TOLERANCE bound (pandas
    ``merge_asof(tolerance=...)``, the feature-store staleness rule):
    the prior click only counts if it happened within the last hour —
    a feature older than its freshness SLA must read as MISSING, not
    as a stale value silently poisoning the model. Same one-shuffle
    union+window merge as xj1; the tolerance is a post-match NULL-out
    (``ts_ns - match_tns > bound → NULL``), integer nanosecond
    arithmetic both engines share. Emits the match fields plus
    ``staleness_ms`` for the in-bound rows."""
    ev = load_table(spark, sf_dir, "events")
    left = ev.select("event_id", "user_id", "event_type", "ts_ns")
    dedup_w = Window.partitionBy("user_id", "ts_ns").orderBy(
        F.desc("event_id")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .withColumn("__rk", F.row_number().over(dedup_w))
        .filter(F.col("__rk") == 1)
        .select("user_id", "ts_ns", "event_id", "value")
    )
    out = asof_join(
        left,
        clicks,
        by="user_id",
        left_time="ts_ns",
        right_time="ts_ns",
        carry={"prior_id": "event_id", "prior_tns": "ts_ns",
               "prior_value": "value"},
        allow_exact=False,
        right_tiebreak="event_id",
    )
    fresh = F.expr(f"ts_ns - prior_tns <= {_XJ3_TOL_NS}")
    return out.select(
        "event_id",
        "user_id",
        F.expr("ts_ns DIV 1000000").alias("ts_ms"),
        F.when(fresh, F.col("prior_id")).alias("fresh_click_id"),
        F.when(fresh, F.col("prior_value")).alias("fresh_click_value"),
        F.when(fresh, F.expr("(ts_ns - prior_tns) DIV 1000000"))
        .cast("bigint")
        .alias("staleness_ms"),
    )


_XJ3_SQL = (
    "WITH l AS (SELECT event_id, user_id, epoch_ns(ts) AS tns "
    "FROM events), "
    "c0 AS (SELECT user_id, epoch_ns(ts) AS tns, event_id, value "
    "FROM events WHERE event_type = 'click'), "
    "c AS (SELECT user_id, tns, event_id, value FROM ("
    "  SELECT *, row_number() OVER (PARTITION BY user_id, tns "
    "  ORDER BY event_id DESC) AS rk FROM c0) WHERE rk = 1), "
    "m AS (SELECT l.event_id, l.user_id, l.tns, "
    "c.event_id AS prior_id, c.tns AS prior_tns, c.value AS prior_value "
    "FROM l ASOF LEFT JOIN c ON l.user_id = c.user_id AND c.tns < l.tns) "
    "SELECT event_id, user_id, tns // 1000000 AS ts_ms, "
    f"CASE WHEN tns - prior_tns <= {_XJ3_TOL_NS} THEN prior_id END "
    "AS fresh_click_id, "
    f"CASE WHEN tns - prior_tns <= {_XJ3_TOL_NS} THEN prior_value END "
    "AS fresh_click_value, "
    f"CAST(CASE WHEN tns - prior_tns <= {_XJ3_TOL_NS} "
    "THEN (tns - prior_tns) // 1000000 END AS BIGINT) AS staleness_ms "
    "FROM m"
)


QUERIES = {
    "xj3_asof_tolerance": xj3_asof_tolerance,
    "xj1_asof_prior_click": xj1_asof_prior_click,
    "xj2_range_clicks_before_purchase": xj2_range_clicks_before_purchase,
}

ORACLES = {
    "xj3_asof_tolerance": _XJ3_SQL,
    "xj1_asof_prior_click": _XJ1_SQL,
    "xj2_range_clicks_before_purchase": _XJ2_SQL,
}
