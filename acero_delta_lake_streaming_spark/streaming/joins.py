"""ST7 — stream-stream interval join: the streaming form of the bounded
range join (operators/asof.py xj2).

Spark buffers both sides of a stream-stream join as state; the interval
condition plus a watermark on BOTH event-time columns is what lets it
evict: a buffered click can only ever match purchases within
``lookback``, so once the watermark passes ``click.ts + lookback`` the
row is dropped from state. Without the time bound the state grows
forever — this module exists to pin the bounded formulation.

The reference has no streaming joins at all (its loop is fetch → append);
this is engine capability beyond it, needed the moment two event feeds
must be correlated at ingest time (click attribution, feature joins).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def interval_click_join(events: DataFrame, lookback_s: int = 3600) -> DataFrame:
    """purchases ⋈ clicks of the same user with click time in
    ``[purchase_ts - lookback, purchase_ts)`` — works on a streaming OR
    batch DataFrame of EVENT_BATCH_SCHEMA rows (watermarks no-op on
    batch, which is how tests cross-check it)."""
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_event_id"),
            "user_id",
            F.expr("timestamp_micros(ts_ns DIV 1000)").alias("p_ts"),
        )
        .withWatermark("p_ts", f"{lookback_s} seconds")
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("c_event_id"),
            F.col("user_id").alias("c_user_id"),
            F.expr("timestamp_micros(ts_ns DIV 1000)").alias("c_ts"),
        )
        .withWatermark("c_ts", f"{lookback_s} seconds")
    )
    return purchases.join(
        clicks,
        F.expr(
            "user_id = c_user_id "
            f"AND c_ts >= p_ts - INTERVAL {lookback_s} SECOND "
            "AND c_ts < p_ts"
        ),
        "inner",
    ).select("p_event_id", "user_id", "p_ts", "c_event_id", "c_ts")


def interval_click_left_join(
    events: DataFrame, lookback_s: int = 3600
) -> DataFrame:
    """ST13 — the LEFT OUTER form: every purchase emits, with nulls for
    the click columns when no click preceded it within ``lookback``.

    Outer stream-stream joins are strictly harder than inner ones: the
    engine cannot know a purchase is unmatched until the watermark has
    passed the end of its match window, so the null-augmented row is
    emitted (exactly once, append mode) only at watermark + lookback —
    state eviction and result emission are the same event. That delayed
    certainty is the whole semantic difference from the inner join, and
    why the streaming drive needs a sentinel to flush the tail (the
    same emit-once contract st11's session stream pins)."""
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_event_id"),
            "user_id",
            F.expr("timestamp_micros(ts_ns DIV 1000)").alias("p_ts"),
        )
        .withWatermark("p_ts", f"{lookback_s} seconds")
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("c_event_id"),
            F.col("user_id").alias("c_user_id"),
            F.expr("timestamp_micros(ts_ns DIV 1000)").alias("c_ts"),
        )
        .withWatermark("c_ts", f"{lookback_s} seconds")
    )
    return purchases.join(
        clicks,
        F.expr(
            "user_id = c_user_id "
            f"AND c_ts >= p_ts - INTERVAL {lookback_s} SECOND "
            "AND c_ts < p_ts"
        ),
        "left_outer",
    ).select("p_event_id", "user_id", "p_ts", "c_event_id", "c_ts")


def interval_click_full_join(
    events: DataFrame, lookback_s: int = 3600
) -> DataFrame:
    """ST16 — the FULL OUTER form, completing the stream-stream join
    family (inner st7, left-outer st13): every purchase emits (nulls
    for the click columns when none preceded it within ``lookback``)
    AND every click emits (nulls for the purchase columns when no
    purchase followed it within ``lookback``).

    Symmetric deferred certainty: a purchase's null-augmented row can
    emit only once the watermark passes the START of its match window
    (no qualifying click can still arrive), and a click's only once it
    passes the END of the click's forward window ``c_ts + lookback``
    (no qualifying purchase can still arrive). Emission and state
    eviction remain the same event on BOTH sides — state is still
    bounded by the lookback; full-outer adds no state over the inner
    join, only deferred output on each side."""
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_event_id"),
            "user_id",
            F.expr("timestamp_micros(ts_ns DIV 1000)").alias("p_ts"),
        )
        .withWatermark("p_ts", f"{lookback_s} seconds")
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("c_event_id"),
            F.col("user_id").alias("c_user_id"),
            F.expr("timestamp_micros(ts_ns DIV 1000)").alias("c_ts"),
        )
        .withWatermark("c_ts", f"{lookback_s} seconds")
    )
    return purchases.join(
        clicks,
        F.expr(
            "user_id = c_user_id "
            f"AND c_ts >= p_ts - INTERVAL {lookback_s} SECOND "
            "AND c_ts < p_ts"
        ),
        "full_outer",
    ).select(
        "p_event_id", "user_id", "p_ts", "c_event_id", "c_user_id", "c_ts"
    )
