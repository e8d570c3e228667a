"""Webhook push sink — the reference's completion notification as a
distributed delivery stage.

The reference POSTs one JSON object per finished job to ``WEBHOOK_URL``
(``send_webhook``, /root/reference/app/main.py:349-357; payload assembled
at :424-452 with ``job_id/status/download_url/output_format/filename/
completed_at`` and a ``status='failed' + error`` variant). SURVEY §2.1 S8
substitutes a lineage append for the push; this module adds the real HTTP
push as an optional stage, Spark-first:

* payload assembly is pure Catalyst (``to_json`` over a struct, reusing
  the F7/F10 expressions) — no Python in that part of the plan;
* delivery is a ``mapInPandas`` stage that POSTs batched JSON arrays from
  the executors (per-partition connection reuse, bounded retries, nothing
  ever raised) and yields a DELIVERY LOG row per document:
  ``(url, delivered, http_status, attempts, error)``. The log is a
  DataFrame — write it next to the lineage table and the sink becomes
  observable and retryable at partition granularity, the same properties
  the lineage substitute has. Failed rows are re-driven by filtering the
  log for ``delivered = false`` and re-running the stage on those urls:
  delivery idempotence is the receiver's contract, keyed by ``job_id``
  exactly as with the reference's n8n consumer.

Scale: N docs / ``batch_size`` POSTs issued cluster-wide with zero driver
involvement and no collect; each executor drains its own partitions. A
10^12-doc corpus is ~4×10^9 POSTs at the default batch size — the receiver,
not Spark, is the bottleneck, which is why ``batch_size`` is the knob and
the payloads stay an array (one request amortizes TLS/TCP per batch).
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.expressions import download_name_expr, iso_timestamp_expr

LOG_SCHEMA = ("url string, delivered boolean, http_status int, "
              "attempts int, error string")


def webhook_payload_expr(url: Column, error: Column,
                         completed_at: Column) -> Column:
    """The reference's webhook JSON (app/main.py:426-434 success,
    :445-452 failure) as one Catalyst ``to_json`` struct per document.
    ``job_id`` is the deterministic doc id (md5 of url — engine-
    independent hex, so the whole payload is DuckDB-oracle-checkable:
    Q:`webhook_payloads`), and ``filename``/``download_url`` derive from
    the url exactly as the jobs-store fields do in the point-lookup
    queries."""
    job_id = F.md5(url)
    fname = F.regexp_extract(url, r"([^/]+)$", 1)
    ok = error.isNull()
    return F.to_json(F.struct(
        job_id.alias("job_id"),
        F.when(ok, F.lit("completed")).otherwise(F.lit("failed"))
         .alias("status"),
        F.when(ok, F.concat(F.lit("/download/"), job_id)).alias("download_url"),
        F.when(ok, F.lit("markdown")).alias("output_format"),
        download_name_expr(fname, F.lit("markdown")).alias("filename"),
        error.alias("error"),
        iso_timestamp_expr(completed_at).alias("completed_at"),
    ), {"ignoreNullFields": "true"})


def deliver_webhooks(results: DataFrame, endpoint: str, *,
                     batch_size: int = 256, timeout: float = 10.0,
                     max_attempts: int = 3) -> DataFrame:
    """POST one JSON array per ``batch_size`` docs to ``endpoint`` from the
    executors; return the delivery log DataFrame.

    Lazy like any DataFrame — delivery happens when the log is consumed,
    so the caller's "send webhooks" action IS "write the delivery log".
    Expects ``url``, ``error`` and ``completed_at`` columns (the results
    table contract, FIXTURES.md §4). Retries are per-batch with capped
    exponential backoff; a batch that exhausts its attempts yields
    ``delivered=false`` rows, never an exception — per-doc failures must
    not kill the job (SURVEY §2.11), and the HTTP client is stdlib-only."""
    payloads = results.select(
        F.col("url"),
        webhook_payload_expr(F.col("url"), F.col("error"),
                             F.col("completed_at")).alias("payload"))

    def _post(urls: list, bodies: list) -> Iterator[dict]:
        import time
        import urllib.error
        import urllib.request

        data = ("[" + ",".join(bodies) + "]").encode("utf-8")
        req = urllib.request.Request(
            endpoint, data=data,
            headers={"Content-Type": "application/json"}, method="POST")
        status, err = None, None
        for attempt in range(1, max_attempts + 1):
            try:
                with urllib.request.urlopen(req, timeout=timeout) as resp:
                    status = resp.status
            except urllib.error.HTTPError as e:
                status, err = e.code, f"http_{e.code}"
            except Exception as e:  # DNS/conn refused/timeout
                status, err = None, type(e).__name__
            if status is not None and 200 <= status < 300:
                err = None
                break
            if attempt < max_attempts:
                time.sleep(min(0.1 * (2 ** (attempt - 1)), 2.0))
        ok = status is not None and 200 <= status < 300
        for u in urls:
            yield {"url": u, "delivered": ok, "http_status": status,
                   "attempts": attempt, "error": err}

    def _deliver(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pend_urls: list = []
        pend_bodies: list = []
        for pdf in batches:
            for u, body in zip(pdf["url"], pdf["payload"]):
                pend_urls.append(u)
                pend_bodies.append(body)
                if len(pend_urls) >= batch_size:
                    yield pd.DataFrame(list(_post(pend_urls, pend_bodies)))
                    pend_urls, pend_bodies = [], []
        if pend_urls:
            yield pd.DataFrame(list(_post(pend_urls, pend_bodies)))

    return payloads.mapInPandas(_deliver, schema=LOG_SCHEMA)


def undelivered(log: DataFrame) -> DataFrame:
    """The retry frontier: urls whose batches exhausted their attempts.
    Join back to results and re-run :func:`deliver_webhooks` on it —
    at-least-once delivery with receiver-side ``job_id`` dedup."""
    return log.filter(~F.col("delivered")).select("url")


__all__ = ["webhook_payload_expr", "deliver_webhooks", "undelivered",
           "LOG_SCHEMA"]
