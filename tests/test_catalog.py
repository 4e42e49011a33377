"""Catalog loader: events timestamp handling across fixture vintages.

The driver has shipped events.ts as both TIMESTAMP(NANOS) (rounds 1-3)
and TIMESTAMP(MICROS) (round 4+), and Spark's session-conf behavior for
nanos parquet changed underneath us once. The loader sniffs the footer
and must produce the SAME (ts, ts_ns) semantics for either encoding.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq

from acero_delta_lake_streaming_spark.catalog import load_table


def _write_events(path: str, unit: str) -> None:
    base = dt.datetime(2024, 1, 1, 0, 0, 0, 123456)
    rows = [base + dt.timedelta(seconds=i) for i in range(3)]
    tbl = pa.table(
        {
            "event_id": pa.array([0, 1, 2], pa.int64()),
            "ts": pa.array(rows, pa.timestamp(unit)),
            "user_id": pa.array([1, 1, 2], pa.int64()),
            "event_type": pa.array(["a", "b", "a"]),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(tbl, path)


def test_events_loader_handles_us_and_ns(spark, tmp_path):
    results = {}
    for unit in ("us", "ns"):
        d = str(tmp_path / unit)
        os.makedirs(d)
        _write_events(os.path.join(d, "events.parquet"), unit)
        df = load_table(spark, d, "events").select(
            "event_id", "ts_ns", "ts"
        )
        results[unit] = sorted(
            (r.event_id, r.ts_ns, str(r.ts)) for r in df.collect()
        )
    # identical instants → identical ts_ns (ns value has exact µs*1000)
    # and identical µs timestamps, regardless of the parquet unit
    assert results["us"] == results["ns"]
    assert results["us"][0][1] == 1704067200123456000


def test_events_fixture_schema_shape(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    assert dict((f.name, f.dataType.simpleString()) for f in df.schema)[
        "ts_ns"
    ] == "bigint"
    assert dict((f.name, f.dataType.simpleString()) for f in df.schema)[
        "ts"
    ] == "timestamp"
