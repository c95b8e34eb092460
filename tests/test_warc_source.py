"""WARC source: parse a synthetic WARC (spec-built) and, when available, the
reference's fixture WARC file (used as DATA only)."""

import gzip
import os

import pytest

from off_topic_memento_toolkit_spark.sources.warc import (
    extract_pages_from_warc_bytes,
    read_warc_pages,
)

REFERENCE_WARC = "/root/reference/tests/testdata/testwarc.warc.gz"


def _record(warc_type, uri, date, http_body, content_type="text/html"):
    http = (
        b"HTTP/1.1 200 OK\r\n"
        + f"Content-Type: {content_type}\r\n".encode()
        + b"\r\n" + http_body
    )
    head = (
        b"WARC/1.0\r\n"
        + f"WARC-Type: {warc_type}\r\n".encode()
        + f"WARC-Target-URI: {uri}\r\n".encode()
        + f"WARC-Date: {date}\r\n".encode()
        + f"Content-Length: {len(http)}\r\n".encode()
        + b"\r\n"
    )
    return head + http + b"\r\n\r\n"


def _synthetic_warc():
    return (
        _record("response", "http://a.example/", "2016-01-21T15:45:06Z",
                b"<html><body>hello warc</body></html>")
        + _record("request", "http://a.example/", "2016-01-21T15:45:06Z",
                  b"")
        + _record("response", "dns:a.example", "2016-01-21T15:45:06Z",
                  b"1.2.3.4", content_type="text/dns")
        + _record("response", "http://a.example/style.css",
                  "2016-01-21T15:45:07Z", b"body{}", content_type="text/css")
        + _record("response", "http://b.example/x", "2017-03-01T00:00:00Z",
                  b"<html><body>second page</body></html>")
    )


def test_synthetic_warc_plain_and_gzip():
    raw = _synthetic_warc()
    for payload in (raw, gzip.compress(raw)):
        rows = extract_pages_from_warc_bytes(payload, "test.warc")
        assert [r[0] for r in rows] == ["http://a.example/", "http://b.example/x"]
        assert rows[0][2] == b"<html><body>hello warc</body></html>"
        assert rows[0][3] == "200"


def test_warc_spark_reader(spark, tmp_path):
    warc_path = tmp_path / "t.warc.gz"
    warc_path.write_bytes(gzip.compress(_synthetic_warc()))
    df = read_warc_pages(spark, str(tmp_path / "*.warc.gz"))
    rows = df.collect()
    assert {r.url for r in rows} == {"http://a.example/", "http://b.example/x"}
    assert all(r.warc_ts is not None for r in rows)


@pytest.mark.skipif(not os.path.exists(REFERENCE_WARC),
                    reason="reference fixture not present")
def test_reference_fixture_warc():
    with open(REFERENCE_WARC, "rb") as fh:
        raw = fh.read()
    rows = extract_pages_from_warc_bytes(raw, "testwarc.warc.gz")
    # the reference's own test ingests this file and finds html responses
    assert len(rows) > 0
    assert all("text/html" in r[4] for r in rows)
    assert all(not r[0].startswith("dns:") for r in rows)
