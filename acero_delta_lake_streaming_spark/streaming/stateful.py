"""Custom stateful streaming operator via ``applyInPandasWithState``.

The engine's general-purpose stateful primitive (SURVEY.md §2.8): where
``dropDuplicates``/``session_window`` cover the reference's needs, a
training-data pipeline also wants arbitrary keyed state (running
aggregates, per-source rate trackers, incremental counters). This module
implements running per-user totals as the canonical example: Arrow
batches per key group, explicit state struct, update-mode emissions.

State lives in the checkpointed state store — a restart resumes exactly
where it left off; at scale state is partitioned by the grouping key like
any shuffle. The emitted stream is eventually-consistent per key: the
LAST emission for a key carries the cumulative totals, which is what the
registry query materializes (and what makes it oracle-checkable: the
final state equals the batch groupBy, regardless of how the stream was
micro-batched).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total double"
STATE_SCHEMA = "n bigint, total double"


def _update_user_totals(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "total": [total]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming DataFrame of per-user cumulative (count, value-total)
    emissions — one updated row per user per micro-batch that touched
    that user."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Keyed streaming EMA — w10's recurrence as running state
# --------------------------------------------------------------------------

EMA_OUTPUT_SCHEMA = "event_type string, n_days bigint, ema_micros bigint"
EMA_STATE_SCHEMA = "ema bigint, n_days bigint"


def _update_ema(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this batch's per-day counts into the keyed EMA state.

    Same integer recurrence as the batch operator (w10_ema):
    ``ema = (1e6·x_d + 4·ema_prev) DIV 5`` — Python ints, so the state
    is bit-identical to the batch fold. Days are integer epoch-day
    indexes (ts_ns DIV 86400e9): timezone-free, so a vanilla driver
    session needs no session-TZ agreement. Requires micro-batch splits
    on day boundaries (a day straddling two batches would fold twice);
    the registry query splits the drop files at midnight."""
    (event_type,) = key
    ema, n_days = state.get if state.exists else (-1, 0)
    counts: dict[int, int] = {}
    for pdf in pdfs:
        for d, n in pdf.groupby("d_idx").size().items():
            counts[int(d)] = counts.get(int(d), 0) + int(n)
    for d in sorted(counts):
        x = counts[d] * 1_000_000
        ema = x if ema < 0 else (x + 4 * ema) // 5
        n_days += 1
    state.update((ema, n_days))
    yield pd.DataFrame(
        {
            "event_type": [event_type],
            "n_days": [n_days],
            "ema_micros": [ema],
        }
    )


def running_daily_ema(events_with_day: DataFrame) -> DataFrame:
    """Streaming per-event-type daily-count EMA; input must carry an
    integer ``d_idx`` day column."""
    return events_with_day.groupBy("event_type").applyInPandasWithState(
        _update_ema,
        outputStructType=EMA_OUTPUT_SCHEMA,
        stateStructType=EMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
