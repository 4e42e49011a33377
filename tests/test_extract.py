"""Hermetic pipeline tests for the UD1/UD2/UD3 extraction operator.

The oracle gate pins value parity of the mock pipeline; these tests pin
the operator *contract*: provider pluggability, determinism, quarantine
routing, and flatten conservation (SURVEY.md §5.4/§5.6).
"""

from __future__ import annotations

import hashlib
import json

import pandas as pd
import pyspark.sql.functions as F
import pytest

from acero_delta_lake_streaming_spark.catalog import load_table
from acero_delta_lake_streaming_spark.functions.extract import (
    HttpExtractionProvider,
    MockExtractionProvider,
    extract_events,
    flatten_actors,
)


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").limit(100)


def test_mock_is_deterministic(spark, sf_dir):
    a = extract_events(_docs(spark, sf_dir)).select("doc_id", "raw_response")
    b = extract_events(_docs(spark, sf_dir)).select("doc_id", "raw_response")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_quarantine_routing(spark, sf_dir):
    """Exactly the md5-gated rows are quarantined — no silent drops, no
    crashes on refused output."""
    docs = load_table(spark, sf_dir, "documents")
    rows = extract_events(docs).join(docs.select("doc_id", "text"), "doc_id")
    for r in rows.collect():
        should_fail = hashlib.md5(r.text.encode()).hexdigest()[0] == "f"
        assert (r.event is None) == should_fail, r.doc_id


def test_flatten_conservation(spark, sf_dir):
    """Row-count conservation: actor rows == Σ array lengths of the
    non-quarantined extraction output (SURVEY §5.6)."""
    docs = load_table(spark, sf_dir, "documents")
    extracted = extract_events(docs).cache()
    expected = (
        extracted.filter(F.col("event").isNotNull())
        .select(
            (
                F.size("event.main_actors") + F.size("event.other_actors")
            ).alias("n")
        )
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert flatten_actors(extracted).count() == expected
    extracted.unpersist()


def test_provider_pluggable(spark, sf_dir):
    # Defined locally so cloudpickle ships it by value (a module-level
    # test class would be pickled by reference, which executors can't
    # import).
    class UpperProvider:
        def extract_batch(self, texts: pd.Series) -> list[str]:
            return [
                json.dumps(
                    {
                        "main_actors": [
                            {"name": t.split(" ")[0].upper(), "role": "x"}
                        ],
                        "other_actors": [],
                        "category": "Others",
                    }
                )
                for t in texts
            ]

    out = flatten_actors(
        extract_events(_docs(spark, sf_dir), provider=UpperProvider())
    ).collect()
    assert out and all(r.actor_name.isupper() for r in out)
    assert all(r.category == "Others" for r in out)


def test_http_provider_requires_base_url():
    with pytest.raises(ValueError):
        HttpExtractionProvider(base_url="")


def test_http_provider_round_trip_against_local_server():
    """The production seam actually speaks HTTP: a local one-shot server
    returns canned extraction results; the provider must post the batch
    and map the response list positionally."""
    import http.server
    import threading

    class Handler(http.server.BaseHTTPRequestHandler):
        received = None

        def do_POST(self):
            n = int(self.headers["Content-Length"])
            Handler.received = json.loads(self.rfile.read(n))
            body = json.dumps(
                {
                    "results": [
                        {
                            "main_actors": [{"name": "A", "role": "r"}],
                            "other_actors": [],
                            "category": "Others",
                        },
                        None,
                    ]
                }
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # keep test output quiet
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        provider = HttpExtractionProvider(
            base_url=f"http://127.0.0.1:{srv.server_port}"
        )
        out = provider.extract_batch(pd.Series(["text one", "text two"]))
    finally:
        srv.shutdown()
    assert Handler.received["inputs"] == ["text one", "text two"]
    assert json.loads(out[0])["category"] == "Others"
    assert out[1] == "null"


def test_mock_handles_empty_text():
    out = MockExtractionProvider().extract_batch(pd.Series(["", "one"]))
    parsed = json.loads(out[0]) if not out[0].startswith("ERROR") else None
    if parsed is not None:
        assert parsed["main_actors"] == [] and parsed["other_actors"] == []
