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
