"""WARC ingest (reference S1/S2, otmt/input_types.py:48-185) — Spark-first:

    spark.read.format("binaryFile").load("*.warc.gz")
      → mapInPandas(parse_warc_batch)      (one WARC file per row, streamed)
      → pages rows (url, warc_ts, html, headers…)

The record parser is written from the WARC/1.0 spec (ISO 28500): records are
"WARC/x.y" header blocks + Content-Length-delimited payloads separated by
CRLFCRLF; response records carry an inner HTTP response whose body is the
entity.  Selection mirrors the reference: ``WARC-Type: response``, target URI
not ``dns:``, HTTP Content-Type contains ``text/html``
(otmt/input_types.py:58-75).

Pure stdlib (gzip multi-member streams handled by ``gzip.decompress``'s
``GzipFile`` loop); no warcio.
"""

import gzip
import io
from datetime import datetime

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WARC_PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("status", T.StringType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("warc_file", T.StringType()),
])


def _iter_warc_records(stream):
    """Yield (warc_headers: dict, payload: bytes) from a raw WARC byte stream."""
    while True:
        # skip inter-record blank lines
        line = stream.readline()
        while line in (b"\r\n", b"\n"):
            line = stream.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            return  # malformed tail
        headers = {}
        while True:
            header_line = stream.readline()
            if header_line in (b"\r\n", b"\n", b""):
                break
            if b":" in header_line:
                key, _, value = header_line.partition(b":")
                headers[key.strip().lower().decode("latin-1")] = (
                    value.strip().decode("latin-1")
                )
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            return  # mangled Content-Length: record boundaries unrecoverable
        if length < 0:
            return
        payload = stream.read(length)
        yield headers, payload


def _dechunk(body: bytes) -> bytes:
    """RFC 7230 §4.1 chunked transfer-coding → entity bytes.

    Deliberate deviation from the reference, documented: the reference reads
    warcio's ``raw_stream`` (otmt/input_types.py:90), which returns chunked
    bodies WITH their framing bytes — a latent bug its own fixture never
    exercises.  A malformed chunk stream returns the input unchanged
    (defensive: archived HTTP is frequently sloppy)."""
    out, pos = [], 0
    try:
        while True:
            eol = body.index(b"\r\n", pos)
            size = int(body[pos:eol].split(b";")[0], 16)  # ignore extensions
            if size < 0:  # int(..., 16) accepts '-N': hostile framing, bail
                return body
            if size == 0:
                return b"".join(out)
            start = eol + 2
            out.append(body[start:start + size])
            pos = start + size + 2  # skip chunk-data CRLF
    except (ValueError, IndexError):
        return body


def _split_http_response(payload: bytes):
    """HTTP response bytes → (status_line, headers dict, body bytes)."""
    sep = payload.find(b"\r\n\r\n")
    if sep >= 0:
        head, body = payload[:sep], payload[sep + 4:]
    else:
        sep = payload.find(b"\n\n")
        if sep >= 0:
            head, body = payload[:sep], payload[sep + 2:]
        else:
            # headers-only record (truncated response, no blank line):
            # everything is head, the body is empty — slicing with the
            # failed find()'s -1 would emit the HTTP headers themselves
            # as page content
            head, body = payload, b""
    lines = head.split(b"\n")
    status_line = lines[0].strip().decode("latin-1") if lines else ""
    headers = {}
    for raw in lines[1:]:
        if b":" in raw:
            key, _, value = raw.partition(b":")
            headers[key.strip().lower().decode("latin-1")] = (
                value.strip().decode("latin-1")
            )
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    return status_line, headers, body


def extract_pages_from_warc_bytes(raw: bytes, warc_file: str = ""):
    """All qualifying (html response) records of one WARC file as tuples.

    Conformance shapes handled (ISO 28500 + RFC 7230):
    - gzip-per-record members (the Common-Crawl layout) and whole-file gzip
      — ``GzipFile`` iterates members transparently;
    - chunked transfer-encoding bodies (dechunked — see :func:`_dechunk`);
    - segmented records: a ``WARC-Segment-Number: 1`` response plus its
      ``WARC-Type: continuation`` records are reassembled by segment number
      before HTTP parsing (the reference ignores continuations entirely and
      would emit the first segment's truncated payload; segments are
      file-local here — cross-file continuation is out of scope);
    - non-2xx responses are KEPT with their status recorded, mirroring the
      reference (otmt/input_types.py:86-88 records http-status, no filter).
    """
    if raw[:2] == b"\x1f\x8b":
        # multi-member gzip: GzipFile iterates members transparently
        stream = gzip.GzipFile(fileobj=io.BytesIO(raw))
    else:
        stream = io.BytesIO(raw)
    buffered = io.BufferedReader(stream)
    rows = []

    def emit(headers, payload):
        uri = headers.get("warc-target-uri", "")
        if uri.split(":")[0] == "dns":  # otmt/input_types.py:63
            return
        status_line, http_headers, body = _split_http_response(payload)
        content_type = http_headers.get("content-type", "")
        if "text/html" not in content_type:  # otmt/input_types.py:73-75
            return
        warc_date = headers.get("warc-date", "")
        try:
            mdt = datetime.strptime(warc_date, "%Y-%m-%dT%H:%M:%SZ")
        except ValueError:
            return
        status = status_line.split(" ")[1] if " " in status_line else ""
        rows.append((uri, mdt, body, status, content_type, warc_file))

    def _segnum(headers):
        # malformed numbers skip the RECORD, never abort the file (same
        # posture as the malformed-WARC-Date skip below)
        try:
            return int(headers.get("warc-segment-number", "0"))
        except ValueError:
            return None

    def _records_tolerant(stream_reader):
        """Corrupt gzip members / truncated streams end iteration with the
        rows parsed so far instead of failing the whole ingest task."""
        import zlib

        gen = _iter_warc_records(stream_reader)
        while True:
            try:
                yield next(gen)
            except StopIteration:
                return
            except (OSError, EOFError, zlib.error):  # BadGzipFile is OSError
                return

    segmented = {}  # origin record id -> {"headers": ..., "parts": {n: bytes}}
    for headers, payload in _records_tolerant(buffered):
        wtype = headers.get("warc-type")
        if wtype == "response" and "warc-segment-number" in headers:
            num = _segnum(headers)
            if num is None:
                continue
            rid = headers.get("warc-record-id", f"_anon{len(segmented)}")
            segmented[rid] = {"headers": headers, "parts": {num: payload}}
            continue
        if wtype == "continuation":
            origin = headers.get("warc-segment-origin-id", "")
            entry = segmented.get(origin)
            num = _segnum(headers)
            if entry is not None and num is not None:
                entry["parts"][num] = payload
            continue
        if wtype != "response":
            continue
        emit(headers, payload)
    for entry in segmented.values():
        assembled = b"".join(
            part for _, part in sorted(entry["parts"].items()))
        emit(entry["headers"], assembled)
    return rows


def read_warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """binaryFile scan over .warc/.warc.gz → pages-shaped DataFrame.

    One input file per task; at crawl scale the parallel unit is the WARC
    file (the standard 1 GB CC granularity), which is exactly Spark's
    binaryFile partitioning."""
    binary = spark.read.format("binaryFile").load(path)

    def parse(batches):
        for pdf in batches:
            rows = []
            for file_path, content in zip(pdf["path"], pdf["content"]):
                rows.extend(extract_pages_from_warc_bytes(content, file_path))
            yield pd.DataFrame(rows, columns=[
                "url", "warc_ts", "html", "status", "content_type",
                "warc_file"])

    return binary.select("path", "content").mapInPandas(
        parse, schema=WARC_PAGES_SCHEMA)
