"""Webhook push sink (sources/webhook.py) against a LIVE local HTTP server.

The reference posts one JSON body per finished job (app/main.py:349-357,
424-452); our sink posts batched arrays from the executors and returns a
delivery-log DataFrame. Pins: every url delivered exactly once per run,
bodies carry the reference's field set, 5xx → retry → success with
attempts recorded, unreachable endpoint → delivered=false rows and NO
exception (per-doc failures never kill the job, SURVEY §2.11).
"""

from __future__ import annotations

import json
import threading
from datetime import datetime
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from document_converter_api_spark.sources.webhook import (
    deliver_webhooks,
    undelivered,
    webhook_payload_expr,
)


class _Receiver:
    """Records bodies; optionally fails the first N requests with 500."""

    def __init__(self, fail_first: int = 0):
        self.bodies: list = []
        self.requests = 0
        self.fail_first = fail_first
        self.lock = threading.Lock()

        receiver = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802
                n = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(n)
                with receiver.lock:
                    receiver.requests += 1
                    fail = receiver.requests <= receiver.fail_first
                    if not fail:
                        receiver.bodies.append(raw)
                self.send_response(500 if fail else 200)
                self.end_headers()
                self.wfile.write(b"{}")

            def log_message(self, *a):  # silence
                pass

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.thread = threading.Thread(target=self.server.serve_forever,
                                       daemon=True)
        self.thread.start()
        self.url = f"http://127.0.0.1:{self.server.server_address[1]}/hook"

    def docs(self) -> list:
        out = []
        for raw in self.bodies:
            out.extend(json.loads(raw))
        return out

    def close(self):
        self.server.shutdown()
        self.server.server_close()


@pytest.fixture()
def results_df(spark):
    ts = datetime(2025, 6, 1, 12, 0, 0)
    rows = [Row(url=f"https://h.example/d{i:03d}.html",
                error=None if i % 5 else "encrypted",
                completed_at=ts) for i in range(40)]
    return spark.createDataFrame(rows).repartition(4)


def test_every_doc_delivered_once_with_reference_fields(spark, results_df):
    rx = _Receiver()
    try:
        log = deliver_webhooks(results_df, rx.url, batch_size=8)
        rows = log.collect()
    finally:
        rx.close()
    assert len(rows) == 40
    assert all(r.delivered and r.http_status == 200 and r.attempts == 1
               for r in rows)
    docs = rx.docs()
    assert len(docs) == 40
    by_id = {}
    for d in docs:
        by_id[d["job_id"]] = d
        if d["status"] == "completed":
            assert d["download_url"] == f"/download/{d['job_id']}"
            assert d["output_format"] == "markdown"
            assert "error" not in d
        else:
            assert d["status"] == "failed" and d["error"] == "encrypted"
            assert "download_url" not in d
        assert d["filename"].endswith("_converted.md")
        assert d["completed_at"] == "2025-06-01T12:00:00.000000"
    assert len(by_id) == 40  # exactly once per doc


def test_5xx_retries_then_succeeds(spark, results_df):
    one = results_df.limit(3).coalesce(1)
    rx = _Receiver(fail_first=2)
    try:
        rows = deliver_webhooks(one, rx.url, batch_size=100).collect()
    finally:
        rx.close()
    assert len(rows) == 3
    assert all(r.delivered and r.attempts == 3 for r in rows)
    assert len(rx.docs()) == 3


def test_unreachable_endpoint_degrades_not_raises(spark, results_df):
    few = results_df.limit(5).coalesce(1)
    log = deliver_webhooks(few, "http://127.0.0.1:9/hook",
                           batch_size=100, max_attempts=2, timeout=1.0)
    rows = log.collect()  # must NOT raise
    assert len(rows) == 5
    assert all(not r.delivered and r.error is not None and r.attempts == 2
               for r in rows)
    assert undelivered(log).count() == 5


def test_pipeline_pushes_per_commit_group(spark, smoke_paths, tmp_path):
    """run_extraction_job(webhook_url=...) delivers one notification per
    gate-passing doc, persists the delivery log under _webhooks/ with the
    same per-group replace as the data, and counts failures in stats."""
    import os

    from document_converter_api_spark.plans.pipeline import run_extraction_job
    from tests.conftest import TEST_MAX_BYTES

    pages_path, _ = smoke_paths
    rx = _Receiver()
    try:
        stats = run_extraction_job(spark, pages_path, str(tmp_path / "out"),
                                   num_partitions=8, partitions_per_commit=4,
                                   max_bytes=TEST_MAX_BYTES,
                                   webhook_url=rx.url)
    finally:
        rx.close()
    docs = rx.docs()
    assert len(docs) == stats["docs"]
    assert len({d["job_id"] for d in docs}) == stats["docs"]
    assert stats.get("webhooks_failed", 0) == 0
    assert {"completed", "failed"} >= {d["status"] for d in docs}
    assert os.path.isdir(str(tmp_path / "out" / "_webhooks" / "data"))


def test_payload_expr_is_pure_catalyst(spark, results_df):
    plan = (results_df.select(webhook_payload_expr(
        F.col("url"), F.col("error"), F.col("completed_at")).alias("p"))
        ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
