"""Interop source: load a reference CollectionModel working directory.

A user of the reference tool has collections on disk in the layout
``otmt/collectionmodel.py:143-234`` writes:

    working_dir/
      timemaps/metadata.csv            rows (urit, digest)
      timemaps/{digest}.json           timemap dict (original_uri, mementos)
      timemaps/{digest}_headers.json
      mementos/metadata.csv            rows (urim, digest)
      mementos/{digest}.orig           raw content bytes
      mementos/{digest}_headers.json
      memento_errors/metadata.csv      rows (urim, digest)
      memento_errors/{digest}.orig / _error_info.txt / _headers.json

This source turns that store into the engine's tables so existing downloads
run unchanged:

- ``mementos``  (urim, html, headers)         — binaryFile scan, DISTRIBUTED
  (content dominates a real collection; the manifest join is a broadcast);
- ``timemaps``  (urit, original_uri, memento_uri, memento_datetime) — one row
  per listed memento; manifests/JSONs are tiny and read driver-side;
- ``errors``    (urim, error_msg, headers)    — feeds
  :func:`..operators.measures.with_error_kinds` as memento access errors
  (the reference records exactly these in memento_errors/);
- ``pages``     input_hint shape (url, warc_ts, html, text, lang) by joining
  mementos to the timemap listings.
"""

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_HEADERS_TYPE = T.MapType(T.StringType(), T.StringType())
_DIGEST_RX = r"([0-9a-f]{64})[_.]"


def _manifest(spark: SparkSession, subdir: str) -> DataFrame:
    return (
        spark.read.csv(os.path.join(subdir, "metadata.csv"))
        .toDF("uri", "digest")
    )


def _blobs(spark: SparkSession, directory: str, glob: str,
           out_col: str) -> DataFrame:
    # pathGlobFilter (not a glob-in-path) so Hadoop's literal-path probe
    # doesn't log spurious FileNotFound stacks
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob).load(directory)
        .select(
            F.regexp_extract("path", _DIGEST_RX, 1).alias("digest"),
            F.col("content").alias(out_col),
        )
    )


def read_mementos(spark: SparkSession, working_dir: str) -> DataFrame:
    mdir = os.path.join(working_dir, "mementos")
    manifest = _manifest(spark, mdir)
    content = _blobs(spark, mdir, "*.orig", "html")
    headers = _blobs(spark, mdir, "*_headers.json", "_hraw") \
        .withColumn("headers",
                    F.from_json(F.decode("_hraw", "utf-8"), _HEADERS_TYPE)) \
        .drop("_hraw")
    return (
        content.join(headers, "digest", "left")
        .join(F.broadcast(manifest), "digest")
        .select(F.col("uri").alias("urim"), "html", "headers")
    )


def read_memento_errors(spark: SparkSession, working_dir: str) -> DataFrame:
    edir = os.path.join(working_dir, "memento_errors")
    manifest = _manifest(spark, edir)
    info = _blobs(spark, edir, "*_error_info.txt", "_eraw") \
        .withColumn("error_msg", F.decode("_eraw", "utf-8")).drop("_eraw")
    return (
        info.join(F.broadcast(manifest), "digest")
        .select(F.col("uri").alias("urim"), "error_msg")
    )


def read_timemaps(spark: SparkSession, working_dir: str) -> DataFrame:
    """One row per (urit, memento listing).  Timemap JSONs are one small file
    per original URL — read driver-side like the reference loader does."""
    import csv

    tdir = os.path.join(working_dir, "timemaps")
    rows = []
    with open(os.path.join(tdir, "metadata.csv"), newline="") as fh:
        # the reference writes this manifest with csv.writer, which quotes
        # URI-Ts containing commas/quotes — parse with csv.reader, not split
        for record in csv.reader(fh):
            if not record:
                continue
            urit, digest = record[0], record[1]
            with open(os.path.join(tdir, f"{digest}.json")) as jf:
                tm = json.load(jf)
            original = tm.get("original_uri")
            for entry in tm.get("mementos", {}).get("list", []):
                rows.append((urit, original, entry["uri"], entry["datetime"]))
    schema = ("urit string, original_uri string, memento_uri string, "
              "memento_datetime_iso string")
    df = spark.createDataFrame(rows, schema)
    return df.withColumn(
        "memento_datetime",
        F.to_timestamp("memento_datetime_iso", "yyyy-MM-dd'T'HH:mm:ss"),
    ).drop("memento_datetime_iso")


def read_reference_collection(spark: SparkSession, working_dir: str) -> dict:
    """The full store → {mementos, timemaps, errors, pages}; ``pages`` is the
    input_hint shape ready for prepare_pages / detect_off_topic.

    The errors table carries the memento's ``urit`` when its urim appears in
    a loaded timemap listing (derived with the same identity convention
    prepare_pages uses, so error rows nest under the same URI-T as the
    scored rows) — the reference resolves this via its
    ``mementos_to_timemaps`` map; unlisted failures keep a NULL urit."""
    mementos = read_mementos(spark, working_dir)
    timemaps = read_timemaps(spark, working_dir)
    errors = read_memento_errors(spark, working_dir)
    urit_map = timemaps.select(
        F.col("memento_uri").alias("urim"),
        F.concat(F.lit("from-warc::timemap::"), F.col("original_uri"))
         .alias("urit"),
    ).distinct()
    errors = errors.join(F.broadcast(urit_map), "urim", "left")
    # orphan mementos (stored but not listed in any loaded timemap) become
    # their own singleton timeline: url falls back to the urim, datetime to
    # the epoch — scoreable, and visibly synthetic
    pages = (
        mementos.join(
            timemaps.select(F.col("memento_uri").alias("urim"),
                            F.col("original_uri").alias("url"),
                            F.col("memento_datetime").alias("warc_ts")),
            "urim", "left")
        .select(
            F.coalesce("url", "urim").alias("url"),
            F.coalesce("warc_ts", F.timestamp_seconds(F.lit(0))).alias("warc_ts"),
            "html",
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("string").alias("lang"),
        )
    )
    return {"mementos": mementos, "timemaps": timemaps, "errors": errors,
            "pages": pages}
