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

import importlib
import importlib.util

from acero_delta_lake_streaming_spark.operators import (  # noqa: E402
    relational,
    tpch,
    windows,
)

_MODULES = [relational, tpch, windows]

# Extension operator modules land incrementally. Gate on find_spec so only
# truly-absent modules are skipped — a genuine import error inside an
# existing module must propagate, not silently drop an operator family.
_OPTIONAL = (
    "acero_delta_lake_streaming_spark.operators.dedup",
    "acero_delta_lake_streaming_spark.operators.similarity",
    "acero_delta_lake_streaming_spark.operators.text",
    "acero_delta_lake_streaming_spark.operators.sessionize",
    "acero_delta_lake_streaming_spark.operators.multimodal",
    "acero_delta_lake_streaming_spark.functions.extract",
    "acero_delta_lake_streaming_spark.storage.queries",
    "acero_delta_lake_streaming_spark.streaming.queries",
)
def _spec_exists(name: str) -> bool:
    try:
        return importlib.util.find_spec(name) is not None
    except ModuleNotFoundError:
        # Parent package itself absent; find_spec never executes module
        # bodies, so this cannot mask a real import-time failure.
        return False


for _name in _OPTIONAL:
    if _spec_exists(_name):
        _MODULES.append(importlib.import_module(_name))


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
