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

    ``events.ts`` arrives as parquet TIMESTAMP(NANOS) which Spark's
    vectorized reader cannot decode; with ``nanosAsLong`` it lands as int64
    nanoseconds and is converted JVM-side. ``ts DIV 1000`` floors toward
    zero (epoch-positive data), matching DuckDB's ns→µs truncation, so
    derived values hash-match the oracle. The raw column is retained as
    ``ts_ns`` for ordering ties below microsecond resolution.
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.expr("timestamp_micros(ts DIV 1000)")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> None:
    """Register every fixture table as a temp view for ``spark.sql`` use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(f"{name}{suffix}")
