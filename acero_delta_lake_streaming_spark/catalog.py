"""Fixture-table catalog: lazy DataFrames over the driver parquet.

Replaces the reference's scan layer: where it materializes whole Delta
tables to pandas before any predicate runs (``visualizer.py:40-45`` — no
pushdown, full scan per dashboard render), every loader here returns a lazy
DataFrame whose filters and projections Catalyst pushes into the parquet
scan. At 100 TB that difference is the whole ballgame: a scan with
``PushedFilters`` + pruned ``ReadSchema`` reads a fraction of the bytes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy DataFrame for one fixture table.

    ``events.ts`` is parquet TIMESTAMP(MICROS) (int64 physical). It is
    read with an explicit LongType schema — the raw epoch-microsecond
    int64, no session conf required — then converted JVM-side:
    ``timestamp_micros(ts)`` for the timestamp view and ``ts * 1000``
    for ``ts_ns``, the epoch-nanosecond BIGINT every downstream
    operator orders/derives on. DuckDB's ``epoch_ns(ts)`` on the same
    µs data yields exactly ``µs * 1000``, so ns-scale arithmetic
    hash-matches the oracles bit-for-bit. Reading the int64 directly
    keeps the scan vectorized and independent of reader-version
    timestamp handling (earlier fixtures were TIMESTAMP(NANOS) and
    needed the now-removed ``nanosAsLong`` legacy conf).
    """
    if name == "events":
        from acero_delta_lake_streaming_spark.schemas import FIXTURE_SCHEMAS

        df = spark.read.schema(FIXTURE_SCHEMAS["events"]).parquet(
            f"{sf_dir}/{name}.parquet"
        )
        df = df.withColumn(
            "ts_ns", (F.col("ts") * F.lit(1000)).cast("bigint")
        ).withColumn("ts", F.expr("timestamp_micros(ts)"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> None:
    """Register every fixture table as a temp view for ``spark.sql`` use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(f"{name}{suffix}")
