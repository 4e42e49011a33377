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


class _ChatCompletionsStub:
    """Minimal OpenAI-wire chat/completions stub for wire-shape tests."""

    def __init__(self, with_tool_call: bool = True):
        import http.server
        import threading

        stub = self
        stub.requests: list[tuple[str, dict, dict]] = []
        lock = threading.Lock()

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                n = int(self.headers["Content-Length"])
                req = json.loads(self.rfile.read(n))
                with lock:
                    stub.requests.append(
                        (self.path, dict(self.headers), req)
                    )
                if with_tool_call:
                    # Echo the article's first word back as the actor so
                    # the test can pin positional mapping.
                    first = req["messages"][1]["content"].split(" ")[0]
                    message = {
                        "role": "assistant",
                        "tool_calls": [
                            {
                                "type": "function",
                                "function": {
                                    "name": "extract_event",
                                    "arguments": json.dumps(
                                        {
                                            "main_actors": [
                                                {
                                                    "name": first,
                                                    "role": "subject",
                                                }
                                            ],
                                            "other_actors": [],
                                            "category": "Others",
                                        }
                                    ),
                                },
                            }
                        ],
                    }
                else:
                    message = {"role": "assistant", "content": "cannot"}
                body = json.dumps({"choices": [{"message": message}]}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # keep test output quiet
                pass

        self._srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
        self.base_url = f"http://127.0.0.1:{self._srv.server_port}/v1"
        threading.Thread(target=self._srv.serve_forever, daemon=True).start()

    def shutdown(self):
        self._srv.shutdown()


def test_http_provider_openai_wire_shape():
    """The production seam speaks the reference's exact wire contract
    (processor.py:99-117): POST /v1/chat/completions, forced
    extract_event function call, arguments JSON read off the tool call —
    pinned against a local stub server."""
    stub = _ChatCompletionsStub()
    try:
        provider = HttpExtractionProvider(
            base_url=stub.base_url, api_key="sk-test", max_concurrency=2
        )
        out = provider.extract_batch(
            pd.Series(["alpha article text", "beta article text"])
        )
    finally:
        stub.shutdown()

    assert len(stub.requests) == 2
    for path, headers, req in stub.requests:
        assert path == "/v1/chat/completions"
        assert headers.get("Authorization") == "Bearer sk-test"
        assert req["model"] == "gpt-4-turbo"
        assert req["messages"][0]["role"] == "system"
        assert req["messages"][1]["role"] == "user"
        fn = req["tools"][0]["function"]
        assert req["tools"][0]["type"] == "function"
        assert fn["name"] == "extract_event"
        assert set(fn["parameters"]["properties"]) == {
            "main_actors",
            "other_actors",
            "category",
        }
        assert req["tool_choice"] == {
            "type": "function",
            "function": {"name": "extract_event"},
        }
        assert req["temperature"] == 0.3
    # Positional mapping: reply for text i maps to out[i].
    assert [json.loads(o)["main_actors"][0]["name"] for o in out] == [
        "alpha",
        "beta",
    ]


def test_http_provider_quarantines_instead_of_raising():
    """No tool call in the reply and transport failure both degrade to a
    non-JSON marker (→ quarantine downstream), never an exception."""
    stub = _ChatCompletionsStub(with_tool_call=False)
    try:
        provider = HttpExtractionProvider(base_url=stub.base_url)
        out = provider.extract_batch(pd.Series(["some text"]))
    finally:
        stub.shutdown()
    assert out[0].startswith("ERROR:")

    dead = HttpExtractionProvider(
        base_url="http://127.0.0.1:9", timeout=1  # discard port, refused
    )
    out = dead.extract_batch(pd.Series(["a", "b"]))
    assert all(o.startswith("ERROR:") for o in out)


def test_mock_handles_empty_text():
    out = MockExtractionProvider().extract_batch(pd.Series(["", "one"]))
    parsed = json.loads(out[0]) if not out[0].startswith("ERROR") else None
    if parsed is not None:
        assert parsed["main_actors"] == [] and parsed["other_actors"] == []


class _ScriptedHttpStub:
    """Threaded chat/completions stub whose behavior is scripted by the
    article's FIRST WORD, with per-text attempt counters — the live
    transport twin of the chaos doubles (VERDICT r8 item 6): 'ok' →
    200; 'flaky' → 429 once then 200; 'down' → 500 always; 'badauth' →
    401 always; 'slow' → first attempt sleeps past the client timeout,
    then 200."""

    def __init__(self):
        import http.server
        import threading
        import time as _time

        stub = self
        stub.hits: dict[str, int] = {}
        lock = threading.Lock()

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                n = int(self.headers["Content-Length"])
                req = json.loads(self.rfile.read(n))
                text = req["messages"][1]["content"]
                kind = text.split(" ")[0]
                with lock:
                    attempt = stub.hits.get(text, 0)
                    stub.hits[text] = attempt + 1
                if kind == "down" or (kind == "flaky" and attempt == 0):
                    code = 500 if kind == "down" else 429
                    self.send_response(code)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                if kind == "badauth":
                    self.send_response(401)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                if kind == "slow" and attempt == 0:
                    _time.sleep(3)  # client timeout is 1 s
                message = {
                    "role": "assistant",
                    "tool_calls": [
                        {
                            "type": "function",
                            "function": {
                                "name": "extract_event",
                                "arguments": json.dumps(
                                    {
                                        "main_actors": [
                                            {
                                                "name": text.split(" ")[1],
                                                "role": "subject",
                                            }
                                        ],
                                        "other_actors": [],
                                        "category": "Others",
                                    }
                                ),
                            },
                        }
                    ],
                }
                body = json.dumps(
                    {"choices": [{"message": message}]}
                ).encode()
                try:
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                except (BrokenPipeError, ConnectionResetError):
                    pass  # client timed out and hung up ('slow' path)

            def log_message(self, *a):
                pass

        self._srv = http.server.ThreadingHTTPServer(
            ("127.0.0.1", 0), Handler
        )
        self.base_url = f"http://127.0.0.1:{self._srv.server_port}/v1"
        threading.Thread(
            target=self._srv.serve_forever, daemon=True
        ).start()

    def shutdown(self):
        self._srv.shutdown()


def test_http_provider_retry_taxonomy_end_to_end(spark):
    """The UD4 retry/quarantine taxonomy against the REAL transport,
    end-to-end through mapInPandas: executor worker processes hit a
    live local server over actual sockets. 429/500/timeout are
    transient (retried, bounded); 401 is final (quarantined on attempt
    1, never retried); exhausted retries quarantine. Server-side hit
    counts pin that the retry loop re-sends exactly the transient
    rows."""
    from acero_delta_lake_streaming_spark.functions.extract import (
        RetryingProvider,
        extract_events_with_retry,
    )

    stub = _ScriptedHttpStub()
    try:
        provider = RetryingProvider(
            HttpExtractionProvider(
                base_url=stub.base_url, timeout=1, max_concurrency=4
            ),
            max_retries=2,
            backoff_s=0.0,
        )
        docs = spark.createDataFrame(
            [
                (1, "ok alpha story"),
                (2, "flaky beta story"),
                (3, "down gamma story"),
                (4, "badauth delta story"),
                (5, "slow epsilon story"),
            ],
            "doc_id long, text string",
        ).coalesce(1)
        rows = {
            r["doc_id"]: r
            for r in extract_events_with_retry(
                docs, provider=provider
            ).collect()
        }
    finally:
        stub.shutdown()

    # per-row attempt accounting (client view)
    assert rows[1]["attempts"] == 1
    assert rows[2]["attempts"] == 2   # one 429, then success
    assert rows[3]["attempts"] == 3   # 500s exhaust max_retries=2
    assert rows[4]["attempts"] == 1   # 401 is final, never re-sent
    assert rows[5]["attempts"] == 2   # timeout, then success
    # taxonomy: transient-exhausted and final errors quarantine
    assert rows[3]["event"] is None
    assert rows[3]["raw_response"].startswith("ERROR: transient")
    assert rows[4]["event"] is None
    assert rows[4]["raw_response"] == "ERROR: HTTP 401"
    # successes parse, with the echoed actor proving positional mapping
    for k, actor in ((1, "alpha"), (2, "beta"), (5, "epsilon")):
        assert rows[k]["event"] is not None
        assert rows[k]["event"]["main_actors"][0]["name"] == actor
    # server view: the retry loop re-sent exactly the transient rows
    hits = {t.split(" ")[0]: n for t, n in stub.hits.items()}
    assert hits == {"ok": 1, "flaky": 2, "down": 3, "badauth": 1,
                    "slow": 2}


class _RerankStub:
    """Minimal rerank-wire stub: scores document i as (n - i) / 10 so
    the index→row mapping is pinned; scriptable status code for the
    failure-taxonomy test."""

    def __init__(self, status: int = 200):
        import http.server
        import threading

        stub = self
        stub.requests: list[tuple[str, dict, dict]] = []

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                n = int(self.headers["Content-Length"])
                req = json.loads(self.rfile.read(n))
                stub.requests.append((self.path, dict(self.headers), req))
                if status != 200:
                    self.send_response(status)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                docs = req["documents"]
                body = json.dumps(
                    {
                        "results": [
                            {
                                "index": i,
                                "relevance_score": (len(docs) - i) / 10,
                            }
                            for i in range(len(docs))
                        ]
                    }
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):
                pass

        self._srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
        self.base_url = f"http://127.0.0.1:{self._srv.server_port}/v1"
        threading.Thread(
            target=self._srv.serve_forever, daemon=True
        ).start()

    def shutdown(self):
        self._srv.shutdown()


def test_http_cross_encoder_wire_shape():
    """The rerank seam posts ONE batched request ({model, query,
    documents}) and maps results[i].relevance_score back positionally
    as {"score_ppm": floor(1e6*score)} strings."""
    from acero_delta_lake_streaming_spark.functions.extract import (
        HttpCrossEncoderProvider,
    )

    stub = _RerankStub()
    try:
        provider = HttpCrossEncoderProvider(
            base_url=stub.base_url, api_key="sk-test"
        )
        out = provider.score_batch("q terms", pd.Series(["a", "b", "c"]))
    finally:
        stub.shutdown()
    assert len(stub.requests) == 1  # natively batched: one POST
    path, headers, req = stub.requests[0]
    assert path == "/v1/rerank"
    assert headers.get("Authorization") == "Bearer sk-test"
    assert req["query"] == "q terms"
    assert req["documents"] == ["a", "b", "c"]
    assert [json.loads(o)["score_ppm"] for o in out] == [
        300000, 200000, 100000,
    ]


def test_http_cross_encoder_failure_taxonomy():
    """5xx and transport errors mark TRANSIENT (retryable); 4xx is a
    final ERROR (quarantine); nothing raises."""
    from acero_delta_lake_streaming_spark.functions.extract import (
        TRANSIENT_MARKER,
        HttpCrossEncoderProvider,
        MockCrossEncoderProvider,
    )

    stub = _RerankStub(status=503)
    try:
        out = HttpCrossEncoderProvider(base_url=stub.base_url).score_batch(
            "q", pd.Series(["a", "b"])
        )
    finally:
        stub.shutdown()
    assert all(o.startswith(TRANSIENT_MARKER) for o in out)

    stub = _RerankStub(status=400)
    try:
        out = HttpCrossEncoderProvider(base_url=stub.base_url).score_batch(
            "q", pd.Series(["a"])
        )
    finally:
        stub.shutdown()
    assert out[0].startswith("ERROR:") and not out[0].startswith(
        TRANSIENT_MARKER
    )

    dead = HttpCrossEncoderProvider(base_url="http://127.0.0.1:9", timeout=1)
    assert all(
        o.startswith(TRANSIENT_MARKER)
        for o in dead.score_batch("q", pd.Series(["a", "b"]))
    )

    with pytest.raises(ValueError, match="base_url"):
        HttpCrossEncoderProvider(base_url="")

    # the mock never raises either: empty batch, empty text
    assert MockCrossEncoderProvider().score_batch("q", pd.Series([], dtype=object)) == []
