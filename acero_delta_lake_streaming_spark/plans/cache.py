"""Query-scoped persist: cache shared subplans without leaking them.

Several operators materialize a subplan that feeds multiple consumers in
one action (x2's shingle set, t2's two-key counts, flagship's filtered
items). A bare ``df.persist()`` computes the subplan once — Spark's
BlockManager caches partitions on first computation even within a single
job — but nothing ever unpersists it, so a long-lived session (the
external driver looping 78 queries, a notebook) accumulates cached RDDs
indefinitely (VERDICT r2).

The contract here: operators call :func:`scoped_persist` instead of
``persist``; the entrypoint wrapper (``__spark_entry__._wrap``) calls
:func:`release_scoped` before each query, so at most one query's caches
are ever live. Callers that drive operators directly (tests, ad-hoc
sessions) can release explicitly.

StorageLevel is MEMORY_AND_DISK: these are shuffle-sized intermediates,
and silently recomputing (MEMORY_ONLY eviction) would defeat the point,
while spilling keeps large-SF runs safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_SCOPED: list[DataFrame] = []


def scoped_persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK) and register it for release."""
    df.persist(StorageLevel.MEMORY_AND_DISK)
    _SCOPED.append(df)
    return df


def release_scoped(blocking: bool = False) -> int:
    """Unpersist every registered DataFrame; returns how many."""
    n = 0
    while _SCOPED:
        df = _SCOPED.pop()
        try:
            df.unpersist(blocking=blocking)
            n += 1
        except Exception:
            # Session already stopped — nothing left to release.
            pass
    return n
