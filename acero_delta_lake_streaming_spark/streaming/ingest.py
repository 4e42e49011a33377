"""Streaming medallion ingest (ST1-ST3/ST6) and event-time windows (ST4/ST5).

The reference's ingest loop polls RSS feeds, filters seen guids against a
JSON ledger, and appends to Delta — saving the ledger BEFORE the sink
write (/root/reference/news_insights/collector.py:87-89,113-115 vs the
store at :233-240), so a crash between the two silently loses articles,
and its README admits the loop needs an external orchestrator
(README.md:110-111). The Structured Streaming replacement:

* **ST1 incremental ingestion** — a file-drop ``readStream`` stands in
  for the RSS poll (the fetcher is decoupled: it drops fetched batches
  as files; SURVEY §7 step 5). The checkpoint tracks consumed files, so
  a re-run processes only unseen batches.
* **ST2 exactly-once dedup** — ``dropDuplicates("doc_id")`` holds the
  seen-id state inside the checkpointed query (watermark-bounded in
  production), and the sink write is an **idempotent deltalite commit
  keyed (app_id, epoch)**: state and data publish atomically together,
  which is precisely the fix for the ledger-before-write bug.
* **ST3 empty batches** — a no-op micro-batch commits nothing and
  crashes nothing (the reference raises EOFError, collector.py:91-93).
* **ST6 per-epoch semantics** — one ``foreachBatch`` epoch writes the
  raw/curated/actors fan-out (collector.py:228-245) from the same batch
  DataFrame; Acero's per-stage ``to_table()`` barriers disappear.
* **ST4/ST5** — event-time tumbling windows with a watermark; late rows
  beyond the watermark are dropped (tests pin the policy).

Scale: the only stateful operators are dedup state (bounded by the
watermark) and window state; everything else is per-epoch batch work
that scales exactly like the batch engine. Checkpoint + commit-log
recovery means a 1000-executor job resumes mid-stream with no replayed
rows in the tables.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from acero_delta_lake_streaming_spark.functions.extract import (
    ExtractionProvider,
    extract_events,
    flatten_actors,
)
from acero_delta_lake_streaming_spark.storage import deltalite

#: file-drop batch schema for document-shaped ingest (fixture-driven
#: stand-in for NEWS_SCHEMA feeds; readStream requires an explicit schema).
DOC_BATCH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def medallion_writer(
    base_dir: str,
    app_id: str = "medallion-ingest",
    provider: ExtractionProvider | None = None,
    with_actors: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """foreachBatch function: one epoch → raw + curated (+ actors) commits.

    Each table commit is idempotent on (app_id-table, epoch): if the epoch
    is replayed after a crash, already-committed tables no-op and missing
    ones complete — per-table exactly-once without cross-table 2PC (the
    'hard part' called out in SURVEY §7)."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():  # ST3: empty micro-batch is a clean no-op
            return
        batch_df.persist()
        try:
            deltalite.write(
                batch_df,
                os.path.join(base_dir, "raw"),
                app_id=f"{app_id}-raw",
                epoch=epoch_id,
            )
            extracted = extract_events(
                batch_df, id_col=id_col, text_col=text_col, provider=provider
            )
            extracted.persist()
            try:
                curated = extracted.filter(F.col("event").isNotNull()).select(
                    id_col, F.col("event.category").alias("category")
                )
                deltalite.write(
                    curated,
                    os.path.join(base_dir, "curated"),
                    app_id=f"{app_id}-curated",
                    epoch=epoch_id,
                )
                # UD3: failed extractions are routed, not dropped — the
                # quarantine table keeps (id, raw payload) for replay or
                # audit once the provider/schema issue is fixed.
                quarantined = extracted.filter(F.col("event").isNull()).select(
                    id_col, "raw_response"
                )
                deltalite.write(
                    quarantined,
                    os.path.join(base_dir, "quarantine"),
                    app_id=f"{app_id}-quarantine",
                    epoch=epoch_id,
                )
                if with_actors:
                    deltalite.write(
                        flatten_actors(extracted, id_col=id_col),
                        os.path.join(base_dir, "actors"),
                        app_id=f"{app_id}-actors",
                        epoch=epoch_id,
                    )
            finally:
                extracted.unpersist()
        finally:
            batch_df.unpersist()

    return write_batch


def run_ingest(
    spark: SparkSession,
    drop_dir: str,
    base_dir: str,
    checkpoint_dir: str,
    provider: ExtractionProvider | None = None,
    with_actors: bool = True,
    app_id: str = "medallion-ingest",
    schema: T.StructType = DOC_BATCH_SCHEMA,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """One availableNow ingest pass: new files in ``drop_dir`` → dedup →
    medallion tables. Returns after the stream drains (ST1 incremental:
    call again after more files drop; the checkpoint skips consumed
    ones)."""
    stream = (
        spark.readStream.schema(schema)
        .parquet(os.path.join(drop_dir, "*.parquet"))
        .dropDuplicates([id_col])  # ST2 state, checkpoint-backed
    )
    q = (
        stream.writeStream.foreachBatch(
            medallion_writer(base_dir, app_id=app_id, provider=provider,
                             with_actors=with_actors, id_col=id_col,
                             text_col=text_col)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def cdc_upsert_writer(table: str, key_cols: list[str], app_id: str = "cdc"):
    """foreachBatch sink that MERGEs each micro-batch into a deltalite
    table (latest row per key wins) — the streaming CDC pattern: an
    update arriving in a later epoch replaces the stored row instead of
    appending a duplicate. Epoch idempotence rides on the same
    (app_id, epoch) commit key as the append sink, so a replayed epoch
    re-merges into a no-op commit check."""
    from acero_delta_lake_streaming_spark.storage.deltalite import upsert

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert(
            batch_df.sparkSession,
            batch_df,
            table,
            key_cols,
            app_id=app_id,
            epoch=epoch_id,
        )

    return write_batch


def run_news_ingest(
    spark: SparkSession,
    drop_dir: str,
    base_dir: str,
    checkpoint_dir: str,
    provider: ExtractionProvider | None = None,
) -> None:
    """The reference-shaped pipeline: NEWS_SCHEMA feed batches, dedup on
    the RSS guid, extraction text = title + '\\n' + description
    (collector.py:182's P3 concat)."""
    from acero_delta_lake_streaming_spark.schemas import NEWS_SCHEMA

    stream = (
        spark.readStream.schema(NEWS_SCHEMA)
        .parquet(os.path.join(drop_dir, "*.parquet"))
        .dropDuplicates(["id"])
        .withColumn("text", F.concat_ws("\n", "title", "description"))
    )
    q = (
        stream.writeStream.foreachBatch(
            medallion_writer(base_dir, app_id="news-ingest",
                             provider=provider, id_col="id")
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# --------------------------------------------------------------------------
# ST4/ST5 — event-time windows with watermark
# --------------------------------------------------------------------------

EVENT_BATCH_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts_ns", T.LongType(), False),  # epoch nanoseconds
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)


def windowed_event_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Daily tumbling-window counts with a watermark — the streaming form
    of the dashboard timeline (A4, visualizer.py:115). Works unchanged on
    a batch DataFrame (watermark is a no-op there), which is how the
    oracle compares it."""
    with_ts = events.withColumn("ts", F.expr("timestamp_micros(ts_ns DIV 1000)"))
    return (
        with_ts.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("day_start_ms"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def run_windowed_stream(
    spark: SparkSession,
    drop_dir: str,
    out_table: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    app_id: str = "windowed-events",
) -> None:
    """Drain ``drop_dir`` through the windowed aggregation into a
    deltalite table. Update-mode foreachBatch: each epoch overwrites the
    changed windows' table (complete snapshot at fixture scale; at 100 TB
    switch to append mode so only watermark-finalized windows emit)."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        deltalite.write(batch_df, out_table, mode="overwrite",
                        app_id=app_id, epoch=epoch_id)

    events = spark.readStream.schema(EVENT_BATCH_SCHEMA).parquet(
        os.path.join(drop_dir, "*.parquet")
    )
    q = (
        windowed_event_counts(events, watermark)
        .writeStream.foreachBatch(write_batch)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def sessionized_events(
    events: DataFrame, gap: str = "4 hours", watermark: str = "1 hour"
) -> DataFrame:
    """Per-user session aggregation for a stream — `F.session_window`
    with a watermark, the streaming form of x6's batch sessionization
    (operators/sessionize.py; same 4h inactivity gap, same output
    columns, so the same gaps-and-islands oracle pins both). Session
    state merges as events arrive and is evicted once the watermark
    passes session end + gap; works unchanged on a batch DataFrame
    (watermark is a no-op there)."""
    with_ts = events.withColumn(
        "ts", F.expr("timestamp_micros(ts_ns DIV 1000)")
    )
    return (
        with_ts.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .select(
            "user_id",
            F.unix_millis(F.col("first_ts")).alias("start_ms"),
            F.unix_millis(F.col("last_ts")).alias("end_ms"),
            "n_events",
            "sum_value",
        )
    )


def run_session_stream(
    spark: SparkSession,
    drop_dir: str,
    out_table: str,
    checkpoint_dir: str,
    gap: str = "4 hours",
    watermark: str = "1 hour",
    app_id: str = "session-events",
) -> None:
    """Drain ``drop_dir`` through the streaming session aggregation into
    a deltalite table, APPEND mode — Spark's only supported sink mode
    for session-window streaming aggregations, and the honest one: a
    session row emits exactly ONCE, after the watermark passes its end
    + gap and the state store evicts it (st5's emit-once contract).
    Sessions still open when the stream idles stay in state and emit
    nothing — a caller that needs everything flushed advances the
    watermark past the data (e.g. a far-future sentinel event, as
    st11 does). Each epoch's emitted sessions land as one idempotent
    deltalite append commit; at 100 TB state holds only open sessions
    inside the watermark horizon."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        deltalite.write(batch_df, out_table, mode="append",
                        app_id=app_id, epoch=epoch_id)

    events = spark.readStream.schema(EVENT_BATCH_SCHEMA).parquet(
        os.path.join(drop_dir, "*.parquet")
    )
    q = (
        sessionized_events(events, gap, watermark)
        .writeStream.foreachBatch(write_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
