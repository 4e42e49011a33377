"""Sessionization (SURVEY.md §2.10 X6) over the ``events`` stream table.

``F.session_window`` is Spark's native gap-based session operator — the
same aggregation works unchanged in a Structured Streaming query with a
watermark (streaming/README in SURVEY §2.8 ST4). Batch shape: one shuffle
on ``user_id`` (the session-window agg partitions by the grouping keys),
per-partition timeline merge — no windows-over-everything sort.

The DuckDB oracle is the classic gaps-and-islands rewrite: lag → gap
flag → running sum → group, which pins the exact semantics (a new
session starts when the inter-event gap is >= the threshold; Spark
sessions are [start, last+gap), so an event exactly at last+gap opens a
new session).

Reference anchor: the reference has no session concept; its latent
event-time grouping is the per-day article timeline
(visualizer.py:115). Sessionization is the general form.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from acero_delta_lake_streaming_spark.catalog import load_table

_GAP = "4 hours"
_GAP_SQL = "INTERVAL 4 HOUR"


def x6_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions with a 4-hour inactivity gap: session start/end
    (epoch ms), event count, and summed value."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id", F.session_window("ts", _GAP).alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .select(
            "user_id",
            F.unix_millis("first_ts").alias("start_ms"),
            F.unix_millis("last_ts").alias("end_ms"),
            "n_events",
            "sum_value",
        )
    )


_X6_SQL = (
    "WITH flagged AS (SELECT user_id, ts, value, "
    "CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) "
    f">= {_GAP_SQL} OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) "
    "IS NULL THEN 1 ELSE 0 END AS new_s "
    "FROM events), "
    "numbered AS (SELECT user_id, ts, value, "
    "sum(new_s) OVER (PARTITION BY user_id ORDER BY ts "
    "ROWS UNBOUNDED PRECEDING) AS sid "
    "FROM flagged) "
    "SELECT user_id, epoch_ms(min(ts)) AS start_ms, epoch_ms(max(ts)) AS end_ms, "
    "count(*) AS n_events, round(sum(value), 2) AS sum_value "
    "FROM numbered GROUP BY user_id, sid"
)


def x6b_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level session distribution: sessions per user bucketed by
    size — the downstream rollup a funnel dashboard runs over x6."""
    sessions = x6_sessionize(spark, sf_dir)
    return (
        sessions.groupBy("n_events")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.avg((F.col("end_ms") - F.col("start_ms")) / 1000.0), 2).alias(
                "avg_duration_s"
            ),
        )
    )


_X6B_SQL = (
    f"WITH sess AS ({_X6_SQL}) "
    "SELECT n_events, count(*) AS n_sessions, "
    "count(DISTINCT user_id) AS n_users, "
    "round(avg((end_ms - start_ms) / 1000.0), 2) AS avg_duration_s "
    "FROM sess GROUP BY 1"
)


# --------------------------------------------------------------------------
# x29 — behavioral sequence-pattern mining
# --------------------------------------------------------------------------

#: ordered event-type subsequences to count (adjacent, left-to-right)
_PATTERNS = ["click>purchase", "view>click>purchase", "purchase>purchase"]


def x29_sequence_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent event-sequence patterns per user — the
    MATCH_RECOGNIZE-style question ("how many users go
    view→click→purchase back-to-back?") answered without a pattern
    engine: each user's chronologically-ordered event types collapse to
    one delimited path string (ONE user_id shuffle; array_sort on a
    (ts, id, type) struct makes the order total and deterministic), and
    each pattern's occurrence count is pure string arithmetic —
    (len(path) − len(replace(path, pat, ''))) / len(pat) — identical in
    both engines. Emits per pattern: users matching at least once and
    total occurrences.

    Scale: the path is O(per-user activity) — bounded for normal users;
    for power-user/bot tails, run it per SESSION (x6's output) instead
    of per user, same code shape. Counting is non-overlapping
    left-to-right, the `replace` semantics both engines share."""
    events = load_table(spark, sf_dir, "events")
    paths = events.groupBy("user_id").agg(
        F.expr(
            "concat_ws('>', transform(array_sort(collect_list("
            "struct(ts_ns, event_id, event_type))), s -> s.event_type))"
        ).alias("path")
    )
    occ_cols = [
        F.expr(
            f"CAST((length(path) - length(replace(path, '{p}', ''))) "
            f"DIV {len(p)} AS BIGINT)"
        ).alias(f"occ_{i}")
        for i, p in enumerate(_PATTERNS)
    ]
    wide = paths.select(*occ_cols)
    stack = ", ".join(
        f"'{p}', occ_{i}" for i, p in enumerate(_PATTERNS)
    )
    return (
        wide.selectExpr(
            f"stack({len(_PATTERNS)}, {stack}) AS (pattern, occ)"
        )
        .groupBy("pattern")
        .agg(
            F.sum(F.when(F.col("occ") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_users"),
            F.sum("occ").cast("bigint").alias("n_occurrences"),
        )
    )


_X29_SQL = (
    "WITH s AS (SELECT user_id, "
    "string_agg(event_type, '>' ORDER BY ts, event_id) AS path "
    "FROM events GROUP BY 1), "
    "p(pattern) AS (VALUES "
    + ", ".join(f"('{p}')" for p in _PATTERNS)
    + "), "
    "occ AS (SELECT s.user_id, p.pattern, "
    "(length(path) - length(replace(path, p.pattern, ''))) "
    "// length(p.pattern) AS n FROM s CROSS JOIN p) "
    "SELECT pattern, "
    "CAST(count(*) FILTER (WHERE n > 0) AS BIGINT) AS n_users, "
    "CAST(sum(n) AS BIGINT) AS n_occurrences FROM occ GROUP BY 1"
)


QUERIES = {
    "x6_sessionize": x6_sessionize,
    "x6b_session_stats": x6b_session_stats,
    "x29_sequence_patterns": x29_sequence_patterns,
}

ORACLES = {
    "x6_sessionize": _X6_SQL,
    "x6b_session_stats": _X6B_SQL,
    "x29_sequence_patterns": _X29_SQL,
}
