"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Engine lives in ``acero_delta_lake_streaming_spark/``; the registry is
``acero_delta_lake_streaming_spark.queries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from acero_delta_lake_streaming_spark import queries as _registry

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship composes the reference dashboard's whole operator chain
    (filter -> semi join -> anti filter -> top-k -> semi join -> group) in
    one Catalyst plan — SURVEY.md §7 step 1.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from acero_delta_lake_streaming_spark.operators.relational import (
        flagship_breakdown,
    )

    return flagship_breakdown(spark, _SMOKE_SF_DIR)


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Release the previous query's scoped caches (x2 shingles, t2
        # counts, flagship items, ...) so a session looping the registry
        # holds at most one query's persisted subplans at a time.
        from acero_delta_lake_streaming_spark.plans.cache import (
            release_scoped,
        )

        release_scoped()
        # Timezone pinned so date/epoch derivations match the oracle.
        # (events timestamps need no conf: catalog.load_table reads the
        # µs int64 with an explicit schema.)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # The external driver uses a vanilla session (shuffle.partitions
        # 200); at bench scale that is pure scheduling overhead. AQE
        # coalesces most of it, but a right-sized initial count is free.
        try:
            if spark.conf.get("spark.sql.shuffle.partitions") == "200":
                spark.conf.set("spark.sql.shuffle.partitions", "32")
        except Exception:
            pass
        return fn(spark, sf_dir)

    run.__name__ = getattr(fn, "__name__", "query")
    run.__doc__ = fn.__doc__
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(fn) for name, fn in _registry.all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omissions = rows-only check."""
    return _registry.all_oracles()
