"""WARC source connector: read Common-Crawl-style WARC files into the
pages schema (url, warc_ts, html).

Reference parity note: the reference service (``/root/reference/app/
main.py``) ingests documents one HTTP upload at a time; the batch
equivalent over a web corpus is reading the crawl's native WARC archives
(ISO 28500 — a public format) directly, so a user can point the pipeline
at raw Common Crawl segments instead of pre-converted parquet.

Format subset handled (the subset CC actually emits):

* ``WARC/1.0`` / ``WARC/1.1`` records: header block (CRLF-terminated
  ``Name: value`` lines) + blank line + exactly ``Content-Length`` bytes
  of payload + CRLF CRLF separator.
* ``WARC-Type: response`` (payload = HTTP response; the HTTP header
  block is stripped so ``html`` is the body alone) and
  ``WARC-Type: resource`` / ``conversion`` (payload used verbatim).
  Other types (request, metadata, warcinfo) are skipped.
* gzip members: CC gzips each record as its own member and concatenates;
  Python's gzip handles multi-member streams transparently, so ``.gz``
  files decompress in one pass.

Scale notes:

* Parallelism is PER FILE (``binaryFile`` source → one task per file):
  a real crawl is ~10^5-10^6 segment files of ~1 GiB, far wider than any
  cluster, so per-file tasks saturate it. Within a file, records are
  parsed sequentially — WARC's length-prefixed framing has no record
  index, so intra-file splitting would need the per-record-gzip-member
  trick (seek to a member boundary, resync); per-file is the standard
  and sufficient grain.
* Memory is bounded by ONE decompressed file per task (the
  ``binaryFile`` source materializes the file bytes; the parser then
  walks offsets without copying payloads until the final slice). For
  segments beyond executor memory, drop to a custom streaming
  DataSource; the fixture-scale reader documents the bound instead of
  hiding it.
* Malformed records (bad Content-Length, truncated payload, missing
  mandatory headers) terminate that FILE's parse at the failure offset
  and are counted in the ``n_parse_errors`` column of the last emitted
  row rather than raised — one corrupt segment must not kill a
  100 TB ingest (the reference's per-doc error-capture semantics,
  ``app/main.py:438-441``, applied at the file grain).
"""

from __future__ import annotations

import gzip
import io
import zlib
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

PAGES_WARC_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                     "warc_type string, source_file string, "
                     "warc_offset long, warc_len long, "
                     "n_parse_errors long")

_CRLF2 = b"\r\n\r\n"


_DEFAULT_TYPES = ("response", "resource", "conversion")


def parse_warc_bytes(data: bytes, source_file: str = "",
                     types: tuple[str, ...] = _DEFAULT_TYPES) -> list[dict]:
    """Parse one WARC file's bytes into page dicts. Pure function (no
    Spark) so the same code runs in tests, fixtures, and the executor.
    ``types`` widens the kept record set (e.g. add ``metadata`` to read
    back WAT products); request/warcinfo stay skipped by default."""
    out: list[dict] = []
    errors = 0
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        rec_start = pos
        head_end = data.find(_CRLF2, pos)
        if head_end < 0:
            errors += 1
            break
        header_blob = data[pos:head_end]
        if not header_blob.startswith(b"WARC/"):
            errors += 1
            break
        headers: dict[str, str] = {}
        for line in header_blob.split(b"\r\n")[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.decode("ascii", "replace").strip().lower()] = (
                    v.decode("utf-8", "replace").strip())
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            errors += 1
            break
        if length < 0:
            # a negative length would move the cursor BACKWARD (body_end
            # before the header end) — without this guard a crafted record
            # whose header embeds 'WARC/' re-parses itself forever
            errors += 1
            break
        body_start = head_end + len(_CRLF2)
        body_end = body_start + length
        if body_end > n:
            errors += 1
            break
        payload = data[body_start:body_end]
        pos = body_end
        wtype = headers.get("warc-type", "")
        if wtype in types:
            if wtype == "response" and payload[:5] == b"HTTP/":
                http_end = payload.find(_CRLF2)
                payload = payload[http_end + 4:] if http_end >= 0 else b""
            ts = None
            raw_ts = headers.get("warc-date", "")
            # WARC/1.0 dates are second-granular; WARC/1.1 allows a
            # fractional part — accept both
            for fmt in ("%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S.%fZ"):
                try:
                    ts = datetime.strptime(raw_ts, fmt).replace(
                        tzinfo=timezone.utc).replace(tzinfo=None)
                    break
                except ValueError:
                    continue
            if ts is None:
                errors += 1
            out.append({
                "url": headers.get("warc-target-uri", ""),
                "warc_ts": ts,
                "html": payload,
                "warc_type": wtype,
                "source_file": source_file,
                # record location within the UNCOMPRESSED member stream
                # (headers + body, incl. the record's own header block) —
                # data[warc_offset : warc_offset+warc_len] re-parses to
                # exactly this record, the CDX lookup contract. Real
                # cc-index points at gzip-member offsets; per-record gzip
                # members are a storage choice, the uncompressed offset is
                # the format-level truth this parser can always serve.
                "warc_offset": rec_start,
                "warc_len": body_end - rec_start,
                "n_parse_errors": 0,
            })
    if out:
        out[-1]["n_parse_errors"] = errors
    elif errors:
        out.append({"url": "", "warc_ts": None, "html": b"",
                    "warc_type": "error", "source_file": source_file,
                    "warc_offset": -1, "warc_len": -1,
                    "n_parse_errors": errors})
    return out


def read_warc(spark: SparkSession, path_glob: str,
              types: tuple[str, ...] = _DEFAULT_TYPES) -> DataFrame:
    """WARC files (optionally .gz, multi-member) → pages DataFrame.
    One task per file via the binaryFile source; Arrow-batched parse."""
    import pandas as pd

    files = (spark.read.format("binaryFile").load(path_glob)
             .select("path", "content"))

    def parse(batches):
        for pdf in batches:
            rows: list[dict] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if path.endswith(".gz"):
                    try:
                        data = gzip.decompress(data)
                    # gzip.decompress raises BadGzipFile/OSError on bad
                    # magic, EOFError on truncation (the canonical
                    # interrupted-upload corruption), and zlib.error on
                    # corrupt deflate bytes — ALL must become error rows,
                    # not task failures
                    except (OSError, EOFError, zlib.error):
                        rows.append({"url": "", "warc_ts": None,
                                     "html": b"", "warc_type": "error",
                                     "source_file": path,
                                     "warc_offset": -1, "warc_len": -1,
                                     "n_parse_errors": 1})
                        continue
                rows.extend(parse_warc_bytes(data, source_file=path,
                                             types=types))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "warc_type",
                               "source_file", "warc_offset", "warc_len",
                               "n_parse_errors"])

    return files.mapInPandas(parse, PAGES_WARC_SCHEMA)


def _header_safe(value: str) -> bytes:
    """WARC header values are single CRLF-terminated lines (ISO 28500
    §4): a crawled url carrying a raw CR/LF/NUL would inject header
    lines and desynchronize every record after it in the member file.
    Percent-encode exactly those bytes (the RFC 3986 escape a WARC
    reader already understands for URIs) instead of rejecting — a
    writer fed untrusted crawl data must not die mid-shard."""
    if "\r" not in value and "\n" not in value and "\x00" not in value:
        return value.encode()
    cleaned = (value.replace("%", "%25").replace("\r", "%0D")
               .replace("\n", "%0A").replace("\x00", "%00"))
    return cleaned.encode()


def warc_record_bytes(url: str, ts, payload: bytes,
                      record_type: str = "resource",
                      content_type: str | None = None) -> bytes:
    """One serialized WARC record. ``record_type`` picks the product:
    ``resource`` (fixture corpora), ``conversion`` (WET extracted text),
    ``metadata`` (WAT JSON). ``url``/``content_type`` are sanitized
    against header-line injection (see :func:`_header_safe`)."""
    extra = (b"Content-Type: " + _header_safe(content_type) + b"\r\n"
             if content_type else b"")
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + record_type.encode() + b"\r\n"
        b"WARC-Target-URI: " + _header_safe(url)
        + b"\r\n"
        b"WARC-Date: " + ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode()
        + b"\r\n" + extra
        + b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
        b"\r\n" + payload + b"\r\n\r\n")


def write_warc(rows, path: str, compress: bool = False,
               record_type: str = "resource",
               content_type: str | None = None) -> None:
    """Serialize (url, warc_ts, payload) tuples as a WARC file — the
    fixture generator's inverse of :func:`parse_warc_bytes`
    (deterministic output for byte-stable fixtures). WARC-Date carries
    second granularity, so sub-second timestamp precision is dropped on
    the round trip — a property of the format, not the parser."""
    buf = io.BytesIO()
    for url, ts, html in rows:
        buf.write(warc_record_bytes(url, ts, html, record_type,
                                    content_type))
    data = buf.getvalue()
    if compress:
        # mtime=0 for byte-stable output (zlib stamps current time otherwise)
        data = gzip.compress(data, mtime=0)
    with open(path, "wb") as f:
        f.write(data)


def write_partition_files(df: DataFrame, out_dir: str, prefix: str,
                          ext: str, serialize,
                          stats_schema: str) -> DataFrame:
    """Generic one-file-per-partition sink shared by the WARC and CDX
    shard writers: handles partition-id naming, directory creation,
    empty-partition skip, the file write, and the per-shard stats row.

    ``serialize(batches) -> (file_bytes, stats_dict)`` folds one
    partition's pandas batches into the serialized file plus its stats
    columns (falsy stats ⇒ empty partition, nothing written).
    ``stats_schema`` must list ``shard`` first, then the stats_dict
    keys in order, then ``n_bytes`` (appended by this helper). Forcing
    the returned DataFrame runs the write; executors write to a SHARED
    mounted filesystem path (FUSE object store/NFS/HDFS mount) — a raw
    ``s3://`` URL would become a literal local directory."""
    import os

    import pandas as pd

    from pyspark import TaskContext

    os.makedirs(out_dir, exist_ok=True)

    def write_part(batches):
        pid = TaskContext.get().partitionId()
        data, stats = serialize(batches)
        if not stats:
            return
        shard = os.path.join(out_dir, f"{prefix}{pid:05d}{ext}")
        with open(shard, "wb") as f:
            f.write(data)
        yield pd.DataFrame({"shard": [shard],
                            **{k: [v] for k, v in stats.items()},
                            "n_bytes": [len(data)]})

    return df.mapInPandas(write_part, stats_schema)


def write_warc_shards(df: DataFrame, out_dir: str,
                      record_type: str = "conversion",
                      content_type: str | None = None,
                      compress: bool = True) -> DataFrame:
    """Distributed WARC sink: each partition of ``df`` (columns
    ``url, warc_ts, payload``) writes one ``part-NNNNN.warc[.gz]``
    member file — the shape CC itself publishes (a WET/WAT "file" is
    really a fleet of per-segment members). Rows are written in
    partition order; callers wanting deterministic shard contents
    ``repartitionByRange`` on url first.

    Returns a (shard, n_records, n_bytes) DataFrame — forcing it is
    what runs the write (lazy like every sink wrapper here). Executors
    write to a shared filesystem path; on a real cluster this is the
    mounted object store (s3a/HDFS), locally it is a directory."""
    ext = ".warc.gz" if compress else ".warc"

    def serialize(batches):
        buf = io.BytesIO()
        n = 0
        for pdf in batches:
            for url, ts, payload in zip(pdf["url"], pdf["warc_ts"],
                                        pdf["payload"]):
                buf.write(warc_record_bytes(url, ts.to_pydatetime(),
                                            bytes(payload), record_type,
                                            content_type))
                n += 1
        data = buf.getvalue()
        if compress and n:
            data = gzip.compress(data, mtime=0)
        return data, ({"n_records": n} if n else None)

    return write_partition_files(
        df.select("url", "warc_ts", "payload"), out_dir, "part-", ext,
        serialize, "shard string, n_records long, n_bytes long")
