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
        length = int(headers.get("content-length", "0"))
        payload = stream.read(length)
        yield headers, payload


def _split_http_response(payload: bytes):
    """HTTP response bytes → (status_line, headers dict, body bytes)."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        sep = payload.find(b"\n\n")
        head, body = payload[:sep], payload[sep + 2:]
    else:
        head, body = payload[:sep], payload[sep + 4:]
    lines = head.split(b"\n")
    status_line = lines[0].strip().decode("latin-1") if lines else ""
    headers = {}
    for raw in lines[1:]:
        if b":" in raw:
            key, _, value = raw.partition(b":")
            headers[key.strip().lower().decode("latin-1")] = (
                value.strip().decode("latin-1")
            )
    return status_line, headers, body


def extract_pages_from_warc_bytes(raw: bytes, warc_file: str = ""):
    """All qualifying (html response) records of one WARC file as tuples."""
    if raw[:2] == b"\x1f\x8b":
        # multi-member gzip: GzipFile iterates members transparently
        stream = gzip.GzipFile(fileobj=io.BytesIO(raw))
    else:
        stream = io.BytesIO(raw)
    buffered = io.BufferedReader(stream)
    rows = []
    for headers, payload in _iter_warc_records(buffered):
        if headers.get("warc-type") != "response":
            continue
        uri = headers.get("warc-target-uri", "")
        if uri.split(":")[0] == "dns":  # otmt/input_types.py:63
            continue
        status_line, http_headers, body = _split_http_response(payload)
        content_type = http_headers.get("content-type", "")
        if "text/html" not in content_type:  # otmt/input_types.py:73-75
            continue
        warc_date = headers.get("warc-date", "")
        try:
            mdt = datetime.strptime(warc_date, "%Y-%m-%dT%H:%M:%SZ")
        except ValueError:
            continue
        status = status_line.split(" ")[1] if " " in status_line else ""
        rows.append((uri, mdt, body, status, content_type, warc_file))
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
