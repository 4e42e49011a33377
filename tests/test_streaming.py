"""Streaming semantics tests (SURVEY.md §2.8, §5.5): incremental ingest,
exactly-once across crash/replay, empty batches, and the late-data
watermark policy — the behaviors no SQL oracle can check.
"""

from __future__ import annotations

import datetime as dt
import os

import pyspark.sql.functions as F

from acero_delta_lake_streaming_spark.catalog import load_table
from acero_delta_lake_streaming_spark.storage import deltalite
from acero_delta_lake_streaming_spark.streaming.ingest import (
    EVENT_BATCH_SCHEMA,
    medallion_writer,
    run_ingest,
    windowed_event_counts,
)
from acero_delta_lake_streaming_spark.streaming.queries import (
    write_single_parquet,
)


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )


def test_incremental_ingest_dedup_and_empty_runs(spark, sf_dir, tmp_path):
    drop, tables, cp = (
        str(tmp_path / "drop"),
        str(tmp_path / "tables"),
        str(tmp_path / "cp"),
    )
    os.makedirs(drop)
    docs = _docs(spark, sf_dir)
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    write_single_parquet(b0, os.path.join(drop, "b0.parquet"))
    run_ingest(spark, drop, tables, cp, with_actors=False)
    curated = os.path.join(tables, "curated")
    n0 = deltalite.read(spark, curated).count()
    assert n0 > 0

    # ST3: re-run with nothing new — a clean no-op, tables unchanged
    run_ingest(spark, drop, tables, cp, with_actors=False)
    assert deltalite.read(spark, curated).count() == n0

    # ST1+ST2: second drop replays half of b0's ids plus new ones; the
    # checkpointed dedup state must keep exactly one row per doc_id
    b1 = docs.filter((F.col("doc_id") % 2 == 1) | (F.col("doc_id") % 4 == 0))
    write_single_parquet(b1, os.path.join(drop, "b1.parquet"))
    run_ingest(spark, drop, tables, cp, with_actors=False)
    raw = deltalite.read(spark, os.path.join(tables, "raw"))
    assert raw.count() == raw.select("doc_id").distinct().count()
    ok_docs = deltalite.read(spark, curated)
    assert ok_docs.count() == ok_docs.select("doc_id").distinct().count()
    # UD3: every ingested doc is either curated or quarantined — no drops
    quarantined = deltalite.read(spark, os.path.join(tables, "quarantine"))
    assert ok_docs.count() + quarantined.count() == raw.count()


def test_epoch_replay_is_exactly_once(spark, sf_dir, tmp_path):
    """A foreachBatch retry (same epoch) after a crash must not duplicate
    rows — the fix for the reference's ledger-before-write loss."""
    base = str(tmp_path / "tables")
    batch = _docs(spark, sf_dir).limit(50)
    writer = medallion_writer(base, app_id="m1")
    writer(batch, 0)
    counts = {
        t: deltalite.read(spark, os.path.join(base, t)).count()
        for t in ("raw", "curated", "actors")
    }
    writer(batch, 0)  # replayed epoch
    for t, n in counts.items():
        assert deltalite.read(spark, os.path.join(base, t)).count() == n, t
    writer(batch.limit(10), 1)  # a genuinely new epoch still lands
    assert deltalite.read(spark, os.path.join(base, "raw")).count() == counts["raw"] + 10


def test_partial_epoch_completes_without_duplicates(spark, sf_dir, tmp_path):
    """Crash mid-fan-out (raw committed, curated/actors not): the retry
    must skip raw and complete the rest — per-table exactly-once."""
    base = str(tmp_path / "tables")
    batch = _docs(spark, sf_dir).limit(40)
    # simulate the partial epoch: only the raw commit landed
    deltalite.write(batch, os.path.join(base, "raw"), app_id="m2-raw", epoch=0)
    n_raw = deltalite.read(spark, os.path.join(base, "raw")).count()
    medallion_writer(base, app_id="m2")(batch, 0)  # the retry
    assert deltalite.read(spark, os.path.join(base, "raw")).count() == n_raw
    assert deltalite.table_exists(os.path.join(base, "curated"))
    assert deltalite.table_exists(os.path.join(base, "actors"))


def test_stateful_totals_accumulate_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps keyed state across micro-batches: a
    user seen in two batches emits cumulative totals the second time."""
    from acero_delta_lake_streaming_spark.streaming.stateful import (
        running_user_totals,
    )

    drop = str(tmp_path / "drop")
    cp = str(tmp_path / "cp")
    os.makedirs(drop)
    b0 = spark.createDataFrame(
        [(1, 10**18, 7, "click", 1.5), (2, 10**18, 8, "view", 2.0)],
        EVENT_BATCH_SCHEMA,
    )
    b1 = spark.createDataFrame(
        [(3, 10**18, 7, "click", 4.0)], EVENT_BATCH_SCHEMA
    )
    f0, f1 = os.path.join(drop, "b0.parquet"), os.path.join(drop, "b1.parquet")
    write_single_parquet(b0, f0)
    write_single_parquet(b1, f1)
    os.utime(f0, (1_000_000,) * 2)
    os.utime(f1, (2_000_000,) * 2)

    emitted = []

    def collect(batch_df, epoch_id):
        emitted.append((epoch_id, {r.user_id: (r.n_events, r.total) for r in batch_df.collect()}))

    stream = (
        spark.readStream.schema(EVENT_BATCH_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(drop, "*.parquet"))
    )
    q = (
        running_user_totals(stream)
        .writeStream.foreachBatch(collect)
        .outputMode("update")
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    nonempty = [(e, d) for e, d in emitted if d]
    assert nonempty[0][1] == {7: (1, 1.5), 8: (1, 2.0)}
    # second batch touches only user 7, whose totals are cumulative
    assert nonempty[1][1] == {7: (2, 5.5)}


def _ts_ns(*args) -> int:
    return int(
        dt.datetime(*args, tzinfo=dt.timezone.utc).timestamp() * 1_000_000_000
    )


def test_late_data_beyond_watermark_dropped(spark, tmp_path):
    """ST5, append mode: once the watermark finalizes (evicts) a window,
    a late event for it is dropped — the window is emitted exactly once
    and never revised. (Empirically pinned Spark contract: late rows
    merge into *still-live* state; the hard drop applies to finalized
    windows, which is what append mode's emit-once guarantee rests on.)"""
    drop = str(tmp_path / "drop")
    cp = str(tmp_path / "cp")
    os.makedirs(drop)

    def ev(i, ts_ns):
        return (i, ts_ns, 1, "click", 1.0)

    batches = [
        # b0: opens the Jan-5 and Jan-10 windows
        [ev(1, _ts_ns(2024, 1, 5, 10)), ev(2, _ts_ns(2024, 1, 10, 12))],
        # b1: watermark (Jan-10 11:00) finalizes the Jan-5 window → emit n=1
        [ev(3, _ts_ns(2024, 1, 10, 13))],
        # b2: a late Jan-5 event — must be dropped, not re-emitted
        [ev(4, _ts_ns(2024, 1, 5, 9)), ev(5, _ts_ns(2024, 1, 10, 14))],
    ]
    for i, rows in enumerate(batches):
        f = os.path.join(drop, f"b{i}.parquet")
        write_single_parquet(
            spark.createDataFrame(rows, EVENT_BATCH_SCHEMA), f
        )
        os.utime(f, ((i + 1) * 1_000_000,) * 2)  # pin processing order

    emitted: list[tuple[int, list]] = []

    def collect(batch_df, epoch_id):
        emitted.append((epoch_id, batch_df.collect()))

    stream = (
        spark.readStream.schema(EVENT_BATCH_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(drop, "*.parquet"))
    )
    q = (
        windowed_event_counts(stream, watermark="1 hour")
        .writeStream.foreachBatch(collect)
        .outputMode("append")
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    jan5 = _ts_ns(2024, 1, 5) // 1_000_000
    all_rows = [(r.day_start_ms, r.n) for _, rows in emitted for r in rows]
    # Jan-5 emitted exactly once, with only the on-time event counted;
    # Jan-10 still open (watermark never passes its end) → not emitted.
    assert all_rows == [(jan5, 1)]
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    assert dropped == 1  # the late Jan-5 event


def test_polling_orchestrator_two_cycles_no_duplicates(spark, tmp_path):
    """S1 orchestrator: two poll cycles where cycle 2 re-serves every
    cycle-1 item (RSS feeds always re-serve recent items) plus new ones.
    The checkpointed guid dedup must commit each article exactly once,
    and the loop must sleep between cycles, not after the last."""
    from xml.sax.saxutils import escape

    from acero_delta_lake_streaming_spark.streaming.feeds import (
        run_polling_ingest,
    )

    def rss(items):
        body = "".join(
            "<item>"
            f"<title>{escape(t)}</title>"
            f"<description>{escape(d)}</description>"
            f"<link>http://x/{g}</link><guid>{g}</guid>"
            "<pubDate>Mon, 04 Mar 2024 10:00:00 GMT</pubDate>"
            "</item>"
            for g, t, d in items
        )
        return (
            '<rss version="2.0"><channel><title>t</title>'
            f"{body}</channel></rss>"
        )

    cycle1 = [("g1", "alpha one", "d1"), ("g2", "beta two", "d2")]
    cycle2 = cycle1 + [("g3", "gamma three", "d3")]
    batches = iter([cycle1, cycle2])
    sleeps: list[float] = []

    drop, tables, cp = (
        str(tmp_path / "drop"),
        str(tmp_path / "tables"),
        str(tmp_path / "cp"),
    )
    cycles = run_polling_ingest(
        spark,
        drop,
        tables,
        cp,
        fetcher=lambda: [("news", rss(next(batches)))],
        interval_s=7.0,
        max_cycles=2,
        sleep_fn=sleeps.append,
    )
    assert cycles == 2
    assert sleeps == [7.0]  # between the two cycles only

    raw = deltalite.read(spark, os.path.join(tables, "raw"))
    ids = sorted(r.id for r in raw.select("id").collect())
    assert ids == ["g1", "g2", "g3"]  # re-served g1/g2 not re-committed
    # two drop files landed and neither overwrote the other
    assert len([f for f in os.listdir(drop) if f.endswith(".parquet")]) == 2


def test_stream_stream_interval_join(spark, tmp_path):
    """ST7: purchases joined to same-user clicks in the preceding hour,
    across micro-batches — a click buffered in epoch 0 must match a
    purchase arriving in epoch 1, and out-of-range/cross-user clicks
    must not. The join carries watermarks on both sides so click state
    is evictable (the unbounded-state trap)."""
    from acero_delta_lake_streaming_spark.streaming.joins import (
        interval_click_join,
    )

    t0 = _ts_ns(2024, 1, 1)
    m = 60 * 1_000_000_000  # one minute in ns
    rows0 = [
        (1, t0 + 10 * m, 7, "click", 0.0),
        (2, t0 + 50 * m, 7, "click", 0.0),
        (3, t0 + 20 * m, 8, "click", 0.0),  # other user — never matches
    ]
    rows1 = [
        (4, t0 + 60 * m, 7, "purchase", 9.9),  # matches clicks 1, 2
        (5, t0 + 90 * m, 7, "click", 0.0),
        (6, t0 + 95 * m, 7, "purchase", 9.9),  # matches clicks 2, 5
    ]
    drop, cp = str(tmp_path / "drop"), str(tmp_path / "cp")
    os.makedirs(drop)
    f0, f1 = os.path.join(drop, "b0.parquet"), os.path.join(drop, "b1.parquet")
    write_single_parquet(spark.createDataFrame(rows0, EVENT_BATCH_SCHEMA), f0)
    write_single_parquet(spark.createDataFrame(rows1, EVENT_BATCH_SCHEMA), f1)
    os.utime(f0, (1_000_000,) * 2)
    os.utime(f1, (2_000_000,) * 2)

    matched = []

    def collect(batch_df, epoch_id):
        matched.extend(
            (r.p_event_id, r.c_event_id) for r in batch_df.collect()
        )

    stream = (
        spark.readStream.schema(EVENT_BATCH_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(drop, "*.parquet"))
    )
    q = (
        interval_click_join(stream)
        .writeStream.foreachBatch(collect)
        .outputMode("append")
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert sorted(matched) == [(4, 1), (4, 2), (6, 2), (6, 5)]

    # Batch equivalence: the same plan over the union of both batches.
    batch = spark.createDataFrame(rows0 + rows1, EVENT_BATCH_SCHEMA)
    batch_pairs = sorted(
        (r.p_event_id, r.c_event_id)
        for r in interval_click_join(batch).collect()
    )
    assert batch_pairs == sorted(matched)


def test_streaming_sessionization_merges_across_batches(spark, tmp_path):
    """ST8: session_window as a STREAMING aggregation — a session left
    open by epoch 0 must absorb an in-gap event from epoch 1 (state
    merge), and emit exactly once when the watermark closes it. This is
    the streaming form of x6_sessionize (same operator, same gap)."""
    drop, cp = str(tmp_path / "drop"), str(tmp_path / "cp")
    os.makedirs(drop)
    t0 = _ts_ns(2024, 1, 1)
    m = 60 * 1_000_000_000
    # user 7: events at 0 and 10min (epoch 0), then 20min (epoch 1,
    # within the 30min gap -> same session), then a far event at 10h
    # that pushes the watermark past the session's close.
    b0 = [(1, t0, 7, "click", 1.0), (2, t0 + 10 * m, 7, "view", 1.0)]
    b1 = [(3, t0 + 20 * m, 7, "click", 1.0), (4, t0 + 600 * m, 8, "view", 1.0)]
    f0, f1 = os.path.join(drop, "b0.parquet"), os.path.join(drop, "b1.parquet")
    write_single_parquet(spark.createDataFrame(b0, EVENT_BATCH_SCHEMA), f0)
    write_single_parquet(spark.createDataFrame(b1, EVENT_BATCH_SCHEMA), f1)
    os.utime(f0, (1_000_000,) * 2)
    os.utime(f1, (2_000_000,) * 2)

    emitted = []

    def collect(batch_df, epoch_id):
        emitted.extend(
            (r.user_id, r.n) for r in batch_df.collect()
        )

    stream = (
        spark.readStream.schema(EVENT_BATCH_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(drop, "*.parquet"))
        .withColumn("ts", F.expr("timestamp_micros(ts_ns DIV 1000)"))
    )
    q = (
        stream.withWatermark("ts", "1 hour")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", "n")
        .writeStream.foreachBatch(collect)
        .outputMode("append")
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # exactly one emission for user 7's merged 3-event session; user 8's
    # session is still open (watermark never passes it) -> not emitted
    assert emitted == [(7, 3)]


def test_streaming_cdc_upsert(spark, tmp_path):
    """CDC MERGE sink: an epoch-1 update for a key seen in epoch 0 must
    REPLACE the stored row (not append), while new keys insert."""
    from acero_delta_lake_streaming_spark.streaming.ingest import (
        cdc_upsert_writer,
    )

    drop, out, cp = (
        str(tmp_path / "drop"),
        str(tmp_path / "out"),
        str(tmp_path / "cp"),
    )
    os.makedirs(drop)
    t0 = _ts_ns(2024, 1, 1)
    b0 = [(1, t0, 7, "click", 1.0), (2, t0, 8, "view", 2.0)]
    b1 = [(1, t0, 7, "click", 99.0), (3, t0, 9, "view", 3.0)]  # 1 updated
    f0, f1 = os.path.join(drop, "b0.parquet"), os.path.join(drop, "b1.parquet")
    write_single_parquet(spark.createDataFrame(b0, EVENT_BATCH_SCHEMA), f0)
    write_single_parquet(spark.createDataFrame(b1, EVENT_BATCH_SCHEMA), f1)
    os.utime(f0, (1_000_000,) * 2)
    os.utime(f1, (2_000_000,) * 2)

    stream = (
        spark.readStream.schema(EVENT_BATCH_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(drop, "*.parquet"))
    )
    q = (
        stream.writeStream.foreachBatch(cdc_upsert_writer(out, ["event_id"]))
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {r.event_id: r.value for r in deltalite.read(spark, out).collect()}
    assert got == {1: 99.0, 2: 2.0, 3: 3.0}


def test_dedup_within_watermark_bounds_state(spark, tmp_path):
    """The bounded-state dedup variant: dropDuplicatesWithinWatermark
    keeps a key only while it can still collide (event time within the
    watermark delay) — a duplicate inside the window is dropped, and
    per-batch state rows shrink once the watermark passes old keys
    (the unbounded dropDuplicates ledger is the 100 TB trap)."""
    drop, cp = str(tmp_path / "drop"), str(tmp_path / "cp")
    os.makedirs(drop)
    t0 = _ts_ns(2024, 1, 1)
    h = 3600 * 1_000_000_000
    b0 = [(1, t0, 7, "click", 1.0), (1, t0, 7, "click", 1.0)]  # in-batch dup
    b1 = [(1, t0 + h // 2, 7, "click", 1.0),  # dup of key 1 within window
          (2, t0 + 24 * h, 8, "view", 2.0)]   # far future: evicts key 1
    b2 = [(3, t0 + 25 * h, 9, "view", 3.0)]
    for i, rows in enumerate([b0, b1, b2]):
        f = os.path.join(drop, f"b{i}.parquet")
        write_single_parquet(spark.createDataFrame(rows, EVENT_BATCH_SCHEMA), f)
        os.utime(f, ((i + 1) * 1_000_000,) * 2)

    emitted = []

    def collect(batch_df, epoch_id):
        emitted.extend(r.event_id for r in batch_df.collect())

    stream = (
        spark.readStream.schema(EVENT_BATCH_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(drop, "*.parquet"))
        .withColumn("ts", F.expr("timestamp_micros(ts_ns DIV 1000)"))
        .withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        stream.writeStream.foreachBatch(collect)
        .outputMode("append")
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert sorted(emitted) == [1, 2, 3]  # duplicates of key 1 all dropped
    # state is bounded: the final batch holds fewer keys than total seen
    state_rows = [
        op["numRowsTotal"]
        for p in q.recentProgress
        for op in p["stateOperators"]
    ]
    assert state_rows and state_rows[-1] <= 2


def test_streaming_ema_state_carries_across_epochs(spark, sf_dir):
    """st9: two chronological micro-batches; epoch 1's emission must
    CONTINUE epoch 0's fold (n_days grows, value changes), and the
    final state must equal the batch prefix-fold (w10's recurrence)
    computed independently in Python."""
    from acero_delta_lake_streaming_spark.storage.queries import (
        _SCRATCH_ROOT,
    )
    from acero_delta_lake_streaming_spark.streaming.queries import (
        st9_streaming_ema,
    )

    final = {r.event_type: r for r in st9_streaming_ema(spark, sf_dir).collect()}
    assert final

    # the emissions table is still on disk (scratch is wiped on the
    # NEXT call); epoch continuity is visible in its per-epoch rows
    key = sf_dir.strip("/").replace("/", "_")
    out = os.path.join(_SCRATCH_ROOT, key, "st9", "out")
    emissions = deltalite.read(spark, out).collect()
    epochs = {r.epoch for r in emissions}
    assert epochs == {0, 1}, epochs
    for r in emissions:
        if r.epoch == 0 and r.event_type in final:
            f = final[r.event_type]
            assert f.n_days > r.n_days  # state grew across the epoch
            assert f.ema_micros != r.ema_micros

    # independent fold over the daily counts
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.groupBy(
            "event_type", F.expr("ts_ns DIV 86400000000000").alias("d")
        )
        .count()
        .collect()
    )
    series: dict[str, list] = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.d, r["count"]))
    for etype, pairs in series.items():
        ema = None
        for _, n in sorted(pairs):
            x = n * 1_000_000
            ema = x if ema is None else (x + 4 * ema) // 5
        assert final[etype].ema_micros == ema
        assert final[etype].n_days == len(pairs)


def test_run_session_stream_incremental_emit_once(spark, tmp_path):
    """run_session_stream (st11's engine): append mode emits a session
    only after the watermark finalizes it — the first drain holds every
    in-horizon session in state, a sentinel drop flushes them exactly
    once into the deltalite sink, and a third drain with no new files
    is a clean no-op (checkpoint + idempotent epoch commits)."""
    from acero_delta_lake_streaming_spark.streaming.ingest import (
        run_session_stream,
    )

    drop, out, cp = (
        str(tmp_path / "drop"),
        str(tmp_path / "out"),
        str(tmp_path / "cp"),
    )
    os.makedirs(drop)
    t0 = _ts_ns(2024, 1, 1)
    h = 3600 * 1_000_000_000
    rows = [
        (1, t0, 7, "click", 1.0),
        (2, t0 + h, 7, "view", 2.0),   # same session (gap 4h)
        (3, t0 + 9 * h, 7, "click", 3.0),  # new session
        (4, t0 + 9 * h, 8, "view", 4.0),
    ]
    write_single_parquet(
        spark.createDataFrame(rows, EVENT_BATCH_SCHEMA),
        os.path.join(drop, "b0.parquet"),
    )
    run_session_stream(spark, drop, out, cp)
    # the watermark after the drain is t0+8h (max event - 1h): user 7's
    # first session (ends t0+1h, +4h gap = t0+5h) is finalized and
    # emitted; both t0+9h sessions are still open in state
    assert {
        (r.user_id, r.n_events, r.sum_value)
        for r in deltalite.read(spark, out).collect()
    } == {(7, 2, 3.0)}
    sentinel = [(5, t0 + 1000 * h, -1, "sentinel", 0.0)]
    write_single_parquet(
        spark.createDataFrame(sentinel, EVENT_BATCH_SCHEMA),
        os.path.join(drop, "b1.parquet"),
    )
    run_session_stream(spark, drop, out, cp)
    got = {
        (r.user_id, r.n_events, r.sum_value)
        for r in deltalite.read(spark, out).filter("user_id >= 0").collect()
    }
    assert got == {(7, 2, 3.0), (7, 1, 3.0), (8, 1, 4.0)}  # noqa: E501 — first session from drain 1, open ones flushed by the sentinel
    # no new files -> no new rows (emit exactly once)
    run_session_stream(spark, drop, out, cp)
    assert deltalite.read(spark, out).filter("user_id >= 0").count() == 3


def test_stream_stream_full_outer_join(spark, tmp_path):
    """ST16: both sides emit null-augmented rows at watermark eviction —
    a purchase with no prior click AND a click that attributed nothing
    both surface exactly once; matched pairs emit like the inner join.
    A far-future sentinel pair flushes both watermarks so the tail's
    unmatched state drains; batch equivalence cross-checks the full
    semantics."""
    from acero_delta_lake_streaming_spark.streaming.joins import (
        interval_click_full_join,
    )

    t0 = _ts_ns(2024, 1, 1)
    m = 60 * 1_000_000_000
    rows0 = [
        (1, t0 + 10 * m, 7, "click", 0.0),   # matched by purchase 4
        (3, t0 + 20 * m, 8, "click", 0.0),   # no purchase for user 8
    ]
    rows1 = [
        (4, t0 + 60 * m, 7, "purchase", 9.9),
        (6, t0 + 95 * m, 9, "purchase", 9.9),  # no clicks for user 9
    ]
    sentinels = [
        (-1, t0 + 10_000 * m, -1, "purchase", 0.0),
        (-2, t0 + 10_000 * m, -1, "click", 0.0),
    ]
    drop, cp = str(tmp_path / "drop"), str(tmp_path / "cp")
    os.makedirs(drop)
    for i, rows in enumerate([rows0, rows1, sentinels]):
        f = os.path.join(drop, f"b{i}.parquet")
        write_single_parquet(spark.createDataFrame(rows, EVENT_BATCH_SCHEMA), f)
        os.utime(f, ((i + 1) * 1_000_000,) * 2)

    got = []

    def collect(batch_df, epoch_id):
        got.extend(
            (r.p_event_id, r.c_event_id)
            for r in batch_df.collect()
            if (r.p_event_id is None or r.p_event_id >= 0)
            and (r.c_event_id is None or r.c_event_id >= 0)
        )

    stream = (
        spark.readStream.schema(EVENT_BATCH_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(drop, "*.parquet"))
    )
    q = (
        interval_click_full_join(stream)
        .writeStream.foreachBatch(collect)
        .outputMode("append")
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    key = lambda t: (t[0] if t[0] is not None else -1,
                     t[1] if t[1] is not None else -1)
    assert sorted(got, key=key) == sorted(
        [(4, 1), (6, None), (None, 3)], key=key
    )

    batch = spark.createDataFrame(rows0 + rows1, EVENT_BATCH_SCHEMA)
    batch_pairs = [
        (r.p_event_id, r.c_event_id)
        for r in interval_click_full_join(batch).collect()
    ]
    assert sorted(batch_pairs, key=key) == sorted(got, key=key)


def test_st27_graph_state_maintained_exactly_once(spark, sf_dir):
    """st27's maintained graph state: every bucket-mate pair of the
    final corpus is stored EXACTLY once (no cross-epoch duplicates —
    the x30 probe never re-inserts old x old pairs), the read-side
    graph honors the out-degree cap, hub refreshes exist for every
    epoch (seed + one per batch) with the LAST refresh sized to the
    hub pool, and replaying a committed epoch is refused by the
    ledger."""
    from acero_delta_lake_streaming_spark.operators.similarity import (
        _X3I_DEG,
        _X3I_HUBS,
    )
    from acero_delta_lake_streaming_spark.plans.cache import release_scoped
    from acero_delta_lake_streaming_spark.storage.queries import _scratch
    from acero_delta_lake_streaming_spark.streaming.queries import (
        st27_streaming_graph_ann,
    )

    out = st27_streaming_graph_ann(spark, sf_dir)
    assert out.count() > 0
    release_scoped()

    base = os.path.join(
        os.path.dirname(_scratch(sf_dir, "st27_probe")), "st27"
    )
    edge_tbl = os.path.join(base, "edges")
    hub_tbl = os.path.join(base, "hubs")

    und = deltalite.read(spark, edge_tbl)
    n_edges = und.count()
    assert und.select("src", "dst").distinct().count() == n_edges
    assert und.filter("src >= dst").count() == 0  # normalized pairs

    wdeg = und.unionByName(
        und.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "cos"
        )
    ).groupBy("src").count()
    # stored state holds ALL candidate edges; the read-side top-DEG
    # window caps the graph — at least one node must exceed the cap
    # for the cap to be doing work at this scale
    assert wdeg.filter(F.col("count") > _X3I_DEG).count() > 0

    hubs = deltalite.read(spark, hub_tbl)
    epochs = sorted(
        r.hub_epoch for r in hubs.select("hub_epoch").distinct().collect()
    )
    assert epochs == [0, 1, 2]  # seed refresh + one per micro-batch
    assert (
        hubs.filter(F.col("hub_epoch") == 2).count() == _X3I_HUBS
    )

    # a replayed epoch is refused by the ledger (exactly-once)
    assert deltalite.has_committed(edge_tbl, "st27", 1)
    v_before = deltalite.latest_version(edge_tbl)
    deltalite.write(
        und.limit(1), edge_tbl, app_id="st27", epoch=1
    )
    assert deltalite.latest_version(edge_tbl) == v_before
