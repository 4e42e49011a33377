"""Registry queries that drive the real streaming machinery (ST1/ST2/ST4).

Each query replays fixture data as file-drop batches through an
``availableNow`` Structured Streaming run — checkpoint, dedup state,
foreachBatch, idempotent sink commits — then returns a batch DataFrame
over the resulting deltalite table. The oracle recomputes the expected
end state straight from the fixtures, so what's verified is the whole
streaming path: ingestion → dedup → epoch commits → transactional read.
"""

from __future__ import annotations

import glob
import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from acero_delta_lake_streaming_spark.catalog import load_table
from acero_delta_lake_streaming_spark.functions.extract import _CAT_CASE, _OK_PRED
from acero_delta_lake_streaming_spark.storage import deltalite
from acero_delta_lake_streaming_spark.storage.queries import _scratch
from acero_delta_lake_streaming_spark.streaming.ingest import (
    run_ingest,
    run_windowed_stream,
)


def write_single_parquet(df: DataFrame, dest_file: str) -> None:
    """Materialize ``df`` as exactly one parquet file (a 'dropped batch')."""
    staging = dest_file + ".staging"
    shutil.rmtree(staging, ignore_errors=True)
    df.coalesce(1).write.parquet(staging)
    part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
    os.replace(part, dest_file)
    shutil.rmtree(staging, ignore_errors=True)


# --------------------------------------------------------------------------
# ST1+ST2 — incremental file-drop ingest with cross-batch duplicates
# --------------------------------------------------------------------------


def st1_medallion_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three dropped batches with planted cross-batch replays (doc_id%9
    slices re-sent — the 'feed returns old guids again' case,
    collector.py:87-89). The checkpointed dropDuplicates state must
    collapse them; result = curated category counts, exactly once per
    doc."""
    base = _scratch(sf_dir, "st1")
    drop, tables, cp = (
        os.path.join(base, "drop"),
        os.path.join(base, "tables"),
        os.path.join(base, "cp"),
    )
    os.makedirs(drop, exist_ok=True)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    batches = [
        docs.filter(F.col("doc_id") % 3 == 0),
        docs.filter((F.col("doc_id") % 3 == 1) | (F.col("doc_id") % 9 == 0)),
        docs.filter((F.col("doc_id") % 3 == 2) | (F.col("doc_id") % 9 == 3)),
    ]
    for i, b in enumerate(batches):
        write_single_parquet(b, os.path.join(drop, f"batch{i}.parquet"))
    run_ingest(spark, drop, tables, cp, with_actors=False)
    return (
        deltalite.read(spark, os.path.join(tables, "curated"))
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_ST1_SQL = (
    f"SELECT CASE {_CAT_CASE} END AS category, count(*) AS n "
    f"FROM documents WHERE {_OK_PRED} GROUP BY 1"
)


# --------------------------------------------------------------------------
# ST4 — event-time tumbling windows with watermark
# --------------------------------------------------------------------------


def st4_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily tumbling windows per event_type over the events fixture
    replayed as a stream (watermark 1h; all fixture data is on time, so
    the streaming result equals the batch aggregate — the late-data drop
    policy itself is pinned in tests/test_streaming.py)."""
    base = _scratch(sf_dir, "st4")
    drop, out, cp = (
        os.path.join(base, "drop"),
        os.path.join(base, "out"),
        os.path.join(base, "cp"),
    )
    os.makedirs(drop, exist_ok=True)
    events = load_table(spark, sf_dir, "events").select(
        "event_id", F.col("ts_ns"), "user_id", "event_type", "value"
    )
    write_single_parquet(events, os.path.join(drop, "batch0.parquet"))
    run_windowed_stream(spark, drop, out, cp)
    return deltalite.read(spark, out)


_ST4_SQL = (
    "SELECT epoch_ms(date_trunc('day', ts)) AS day_start_ms, event_type, "
    "count(*) AS n, round(sum(value), 2) AS sum_value "
    "FROM events GROUP BY 1, 2"
)


QUERIES = {
    "st1_medallion_ingest": st1_medallion_ingest,
    "st4_windowed_counts": st4_windowed_counts,
}

ORACLES = {
    "st1_medallion_ingest": _ST1_SQL,
    "st4_windowed_counts": _ST4_SQL,
}
