"""WARC source connector: byte-exact round-trip against the pages
fixture, HTTP-header stripping for response records, record-type
filtering, and file-grain error capture (a corrupt segment yields an
error row, never an exception)."""

from __future__ import annotations

import datetime
import gzip
import os

import pyarrow.parquet as pq

from document_converter_api_spark.sources.warc import (
    parse_warc_bytes, read_warc, write_warc,
)

PAGES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "fixtures", "data", "pages_smoke.parquet")


def _fixture_rows():
    t = pq.read_table(PAGES)
    return list(zip(t.column("url").to_pylist(),
                    t.column("warc_ts").to_pylist(),
                    t.column("html").to_pylist()))


class TestWarcRoundTrip:
    def test_plain_and_gzip_segments_round_trip(self, spark, tmp_path):
        """Write the smoke corpus as one plain + one gzipped segment;
        read_warc must return every url with byte-identical html and the
        second-granularity timestamp (WARC-Date carries no sub-second
        precision — a format property, not a parser loss)."""
        rows = _fixture_rows()
        d = str(tmp_path)
        write_warc(rows[:250], os.path.join(d, "seg-00000.warc"))
        write_warc(rows[250:], os.path.join(d, "seg-00001.warc.gz"),
                   compress=True)
        got = {r.url: (r.warc_ts, bytes(r.html), r.n_parse_errors)
               for r in read_warc(spark, d + "/*").collect()}
        assert len(got) == len(rows)
        for url, ts, html in rows:
            w_ts, w_html, errs = got[url]
            assert w_html == bytes(html)
            assert w_ts == ts.replace(microsecond=0)
            assert errs == 0

    def test_gzip_fixture_is_byte_stable(self, tmp_path):
        """Two writes of the same rows must be byte-identical (mtime=0 in
        the gzip header) — fixtures must not churn per run."""
        rows = _fixture_rows()[:10]
        a, b = str(tmp_path / "a.warc.gz"), str(tmp_path / "b.warc.gz")
        write_warc(rows, a, compress=True)
        write_warc(rows, b, compress=True)
        assert open(a, "rb").read() == open(b, "rb").read()


class TestWarcRecordHandling:
    TS = datetime.datetime(2025, 1, 2, 3, 4, 5)

    def _record(self, wtype: str, uri: str, payload: bytes) -> bytes:
        return (b"WARC/1.0\r\n"
                b"WARC-Type: " + wtype.encode() + b"\r\n"
                b"WARC-Target-URI: " + uri.encode() + b"\r\n"
                b"WARC-Date: 2025-01-02T03:04:05Z\r\n"
                b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
                b"\r\n" + payload + b"\r\n\r\n")

    def test_response_strips_http_headers(self):
        payload = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                   b"<p>body</p>")
        recs = parse_warc_bytes(
            self._record("response", "https://x/", payload))
        assert len(recs) == 1
        assert recs[0]["html"] == b"<p>body</p>"
        assert recs[0]["warc_ts"] == self.TS

    def test_non_page_types_skipped(self):
        data = (self._record("warcinfo", "", b"software: test")
                + self._record("request", "https://x/", b"GET / HTTP/1.1")
                + self._record("resource", "https://x/", b"<p>keep</p>")
                + self._record("metadata", "https://x/", b"k: v"))
        recs = parse_warc_bytes(data)
        assert [r["url"] for r in recs] == ["https://x/"]
        assert recs[0]["html"] == b"<p>keep</p>"

    def test_truncated_record_is_error_row_not_exception(self, spark,
                                                         tmp_path):
        bad = (b"WARC/1.0\r\nWARC-Type: resource\r\n"
               b"Content-Length: 99999\r\n\r\nshort")
        p = str(tmp_path / "bad.warc")
        open(p, "wb").write(bad)
        rows = read_warc(spark, p).collect()
        assert len(rows) == 1
        assert rows[0].warc_type == "error"
        assert rows[0].n_parse_errors == 1

    def test_corrupt_gzip_is_error_row(self, spark, tmp_path):
        p = str(tmp_path / "bad.warc.gz")
        open(p, "wb").write(b"\x1f\x8bnot really gzip")
        rows = read_warc(spark, p).collect()
        assert len(rows) == 1
        assert rows[0].warc_type == "error"

    def test_parse_error_after_good_records_is_counted(self):
        data = (self._record("resource", "https://a/", b"ok")
                + b"garbage that is not a WARC header")
        recs = parse_warc_bytes(data)
        assert [r["url"] for r in recs] == ["https://a/"]
        assert recs[-1]["n_parse_errors"] == 1


class TestWarcPipeline:
    def test_extraction_job_over_warc_matches_goldens(self, spark,
                                                      tmp_path):
        """End-to-end: raw WARC segments through the FULL extraction job
        (gates, salting, lineage) must produce the identical markdown per
        url as the parquet path — the goldens are the shared oracle."""
        from document_converter_api_spark.plans.pipeline import (
            run_extraction_job,
        )
        from document_converter_api_spark.sources.tableio import (
            ManifestTable,
        )
        rows = _fixture_rows()
        indir = tmp_path / "warc"
        indir.mkdir()
        write_warc(rows[:250], str(indir / "seg-00000.warc"))
        write_warc(rows[250:], str(indir / "seg-00001.warc.gz"),
                   compress=True)
        outdir = str(tmp_path / "out")
        stats = run_extraction_job(
            spark, str(indir) + "/*", outdir,
            num_partitions=8, partitions_per_commit=8,
            input_format="warc")
        assert stats["docs"] > 0

        gold = pq.read_table(PAGES.replace("pages_smoke", "goldens_smoke"))
        golden = dict(zip(gold.column("url").to_pylist(),
                          gold.column("markdown").to_pylist()))
        got = {r.url: r.markdown
               for r in ManifestTable(os.path.join(outdir, "results"))
               .read(spark).select("url", "markdown").collect()}
        assert got, "warc job produced no results"
        assert all(golden[u] == md for u, md in got.items())


class TestWarcFuzz:
    def test_parser_never_raises_on_arbitrary_bytes(self):
        """parse_warc_bytes is total: ANY byte string yields a row list
        (possibly one error row), never an exception — a corrupt segment
        must not kill a 100 TB ingest."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=300, deadline=None)
        @given(st.binary(max_size=4096))
        def run(data):
            recs = parse_warc_bytes(data)
            assert isinstance(recs, list)
            for r in recs:
                assert set(r) == {"url", "warc_ts", "html", "warc_type",
                                  "source_file", "warc_offset", "warc_len",
                                  "n_parse_errors"}
                if r["warc_type"] != "error":
                    assert r["warc_offset"] >= 0
                    assert r["warc_len"] > len(r["html"])

        run()

    def test_random_round_trip(self):
        """Random (url, ts, payload) sets survive write_warc →
        parse_warc_bytes byte-exactly, including payloads containing the
        record separator and WARC magic — Content-Length framing, not
        delimiters, drives the parse."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        payloads = st.binary(max_size=512)  # may contain \r\n\r\n, WARC/1.0
        ts = st.datetimes(
            min_value=datetime.datetime(1990, 1, 1),
            max_value=datetime.datetime(2100, 1, 1),
        ).map(lambda d: d.replace(microsecond=0))
        urls = st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=126,
                                   exclude_characters="\r\n"),
            min_size=1, max_size=60)
        rows = st.lists(st.tuples(urls, ts, payloads), min_size=1,
                        max_size=8)

        @settings(max_examples=150, deadline=None)
        @given(rows)
        def run(rs):
            import io
            buf = io.BytesIO()
            for url, t, html in rs:
                rec = (b"WARC/1.0\r\n"
                       b"WARC-Type: resource\r\n"
                       b"WARC-Target-URI: " + url.encode() + b"\r\n"
                       b"WARC-Date: "
                       + t.strftime("%Y-%m-%dT%H:%M:%SZ").encode() + b"\r\n"
                       b"Content-Length: " + str(len(html)).encode()
                       + b"\r\n\r\n" + html + b"\r\n\r\n")
                buf.write(rec)
            recs = parse_warc_bytes(buf.getvalue())
            assert len(recs) == len(rs)
            for (url, t, html), r in zip(rs, recs):
                assert r["url"] == url
                assert r["html"] == html
                assert r["warc_ts"] == t
                assert r["n_parse_errors"] == 0

        run()


class TestWarcAdversarial:
    def test_negative_content_length_terminates(self):
        """Regression: a record whose header both embeds 'WARC/' and
        declares a NEGATIVE Content-Length used to move the cursor
        backward onto the embedded magic and loop forever; it must
        terminate as a parse error."""
        data = b"WARC/1.0\r\nA: WARC/1.0\r\nContent-Length: -33\r\n\r\n"
        recs = parse_warc_bytes(data)
        assert recs[-1]["n_parse_errors"] >= 1

    def test_truncated_gzip_member_is_error_row(self, spark, tmp_path):
        """Regression: gzip.decompress raises EOFError (not OSError) on a
        stream truncated mid-member — the canonical interrupted-upload
        corruption — and zlib.error on corrupt deflate bytes; both must
        become error rows, not task failures."""
        rows = _fixture_rows()[:20]
        full = str(tmp_path / "full.warc.gz")
        write_warc(rows, full, compress=True)
        blob = open(full, "rb").read()
        open(str(tmp_path / "trunc.warc.gz"), "wb").write(blob[:len(blob) // 2])
        os.remove(full)
        out = read_warc(spark, str(tmp_path) + "/*").collect()
        assert len(out) == 1
        assert out[0].warc_type == "error"

    def test_warc11_fractional_date_parses(self):
        data = (b"WARC/1.1\r\n"
                b"WARC-Type: resource\r\n"
                b"WARC-Target-URI: https://x/\r\n"
                b"WARC-Date: 2025-01-02T03:04:05.123456Z\r\n"
                b"Content-Length: 2\r\n\r\nhi\r\n\r\n")
        recs = parse_warc_bytes(data)
        assert recs[0]["n_parse_errors"] == 0
        assert recs[0]["warc_ts"] == datetime.datetime(
            2025, 1, 2, 3, 4, 5, 123456)


def test_header_injection_is_neutralized(tmp_path):
    """A crawled url carrying CR/LF (or NUL, or a literal % that must
    survive the escaping round) cannot inject header lines: the writer
    percent-encodes those bytes, the member file stays parseable, and
    every record after the hostile one survives."""
    import datetime as dt
    import os

    from document_converter_api_spark.sources.warc import (
        parse_warc_bytes,
        warc_record_bytes,
        write_warc,
    )

    ts = dt.datetime(2025, 1, 1, 12, 0, 0)
    hostile = "https://h.example/a\r\nWARC-Type: injected\r\nX: b"
    rec = warc_record_bytes(hostile, ts, b"body", content_type="text/x\r\nY: z")
    # structure intact: the header block is exactly the 5 intended
    # lines — the hostile text survives INLINE in its value, never as
    # its own header line
    head = rec.split(b"\r\n\r\n", 1)[0]
    names = [ln.split(b":")[0] for ln in head.split(b"\r\n")[1:]]
    assert names == [b"WARC-Type", b"WARC-Target-URI", b"WARC-Date",
                     b"Content-Type", b"Content-Length"]
    assert b"%0D%0AWARC-Type" in head

    path = os.path.join(str(tmp_path), "inj.warc")
    write_warc([
        (hostile, ts, b"first"),
        ("https://h.example/clean.html", ts, b"second"),
    ], path)
    rows = parse_warc_bytes(open(path, "rb").read(), source_file=path)
    assert [r["html"] for r in rows] == [b"first", b"second"]
    assert rows[0]["url"] == ("https://h.example/a%0D%0A"
                              "WARC-Type: injected%0D%0AX: b")
    assert rows[1]["url"] == "https://h.example/clean.html"
    assert all(r["n_parse_errors"] == 0 for r in rows)
