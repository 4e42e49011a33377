"""Unified query registry: every implemented operator + its DuckDB oracle.

The driver contract (``__spark_entry__.py``) exposes ``queries()`` and
``oracle_sql()``; this module is their single source of truth, merged from
the per-domain operator modules. Names present in QUERIES but absent from
ORACLES are non-SQL-expressible (custom stateful/approximate operators) and
receive the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = []

from acero_delta_lake_streaming_spark.operators import relational, tpch  # noqa: E402

_MODULES.extend([relational, tpch])

try:  # extension operators land incrementally; keep the registry importable
    from acero_delta_lake_streaming_spark.operators import dedup

    _MODULES.append(dedup)
except ImportError:  # pragma: no cover
    pass
try:
    from acero_delta_lake_streaming_spark.operators import similarity

    _MODULES.append(similarity)
except ImportError:  # pragma: no cover
    pass
try:
    from acero_delta_lake_streaming_spark.operators import text

    _MODULES.append(text)
except ImportError:  # pragma: no cover
    pass
try:
    from acero_delta_lake_streaming_spark.operators import sessionize

    _MODULES.append(sessionize)
except ImportError:  # pragma: no cover
    pass
try:
    from acero_delta_lake_streaming_spark.operators import multimodal

    _MODULES.append(multimodal)
except ImportError:  # pragma: no cover
    pass
try:
    from acero_delta_lake_streaming_spark.streaming import extract

    _MODULES.append(extract)
except ImportError:  # pragma: no cover
    pass


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for mod in _MODULES:
        dup = set(out) & set(mod.QUERIES)
        if dup:
            raise ValueError(f"duplicate query names {dup} in {mod.__name__}")
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(getattr(mod, "ORACLES", {}))
    return out
