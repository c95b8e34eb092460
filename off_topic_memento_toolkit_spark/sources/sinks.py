"""Result sinks matching the reference's output surfaces (S9-S12).

- :func:`scores_to_nested_dict` / :func:`save_as_json` — the 4-level nested
  JSON shape ``{urit: {urim: {measuretype: {measure: {...}}}}}``
  (otmt/measuremodel.py:532-604).  The label table is small (one row per
  memento-measure), so nesting happens driver-side after ``collect()``; the
  heavy lifting stayed distributed.
- :func:`save_as_csv` — the flat 14-column CSV (otmt/measuremodel.py:674-742),
  same header order.
- :func:`save_as_goldstandard` — AlNoamany-style TSV (id, date, URI, label)
  with label 1/0/ERROR (otmt/measuremodel.py:606-672).
- :func:`save_uri_list` — plain-text URI-M lists (bin/detect_off_topic:275-293).
"""

import csv
import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scores_to_nested_dict(scores: DataFrame, overall: DataFrame,
                          meta: DataFrame | None = None) -> dict:
    joined = scores.join(overall, ["urit", "urim"], "left")
    if meta is not None:
        joined = joined.join(meta, ["urit", "urim"], "left")
    out: dict = {}
    for row in joined.collect():
        mdict = (
            out.setdefault(row.urit, {})
            .setdefault(row.urim, {})
            .setdefault(row.measuretype, {})
            .setdefault(row.measure, {})
        )
        if row.error_msg is not None:
            mdict["measurement error message"] = row.error_msg
        else:
            mdict["comparison score"] = row.comparison_score
            mdict["stemmed"] = row.stemmed
            mdict["tokenized"] = row.tokenized
            mdict["removed boilerplate"] = row.removed_boilerplate
            mdict["topic status"] = row.topic_status
        entry = out[row.urit][row.urim]
        entry["overall topic status"] = row.overall_topic_status
        if meta is not None:
            entry["raw memento simhash value"] = row.simhash
            entry["content length"] = row.content_length
            entry["language"] = row.language
            if row.memento_datetime is not None:
                entry["memento-datetime"] = row.memento_datetime.strftime(
                    "%Y/%m/%d %H:%M:%S GMT")  # otmt/measuremodel.py:571-573
    return out


def save_as_json(scores: DataFrame, overall: DataFrame, filename: str,
                 meta: DataFrame | None = None) -> None:
    with open(filename, "w") as fh:
        json.dump(scores_to_nested_dict(scores, overall, meta), fh, indent=4)


CSV_FIELDNAMES = [
    "URI-T", "URI-M", "Error", "Error Message", "Content Length", "Simhash",
    "Measurement Type", "Measurement Name", "Comparison Score",
    "Stemmed", "Tokenized", "Removed Boilerplate", "Topic Status",
    "Overall Topic Status",
]


def save_as_csv(scores: DataFrame, overall: DataFrame, filename: str,
                meta: DataFrame | None = None) -> None:
    joined = scores.join(overall, ["urit", "urim"], "left")
    if meta is not None:
        joined = joined.join(meta, ["urit", "urim"], "left")
    with open(filename, "w", newline="") as fh:
        writer = csv.DictWriter(fh, fieldnames=CSV_FIELDNAMES)
        writer.writeheader()
        for row in joined.orderBy("urit", "urim", "measure").collect():
            record = {"URI-T": row.urit, "URI-M": row.urim}
            if row.error_msg is not None:
                record["Error"] = "Memento Measurement Error"
                record["Error Message"] = row.error_msg
            else:
                record["Measurement Type"] = row.measuretype
                record["Measurement Name"] = row.measure
                record["Comparison Score"] = row.comparison_score
                record["Stemmed"] = row.stemmed
                record["Tokenized"] = row.tokenized
                record["Removed Boilerplate"] = row.removed_boilerplate
                record["Topic Status"] = row.topic_status
                record["Overall Topic Status"] = row.overall_topic_status
                if meta is not None:
                    record["Simhash"] = row.simhash
                    record["Content Length"] = row.content_length
            writer.writerow(record)


def save_as_goldstandard(overall: DataFrame, filename: str) -> None:
    """TSV (id, date, URI, label); date sliced out of the URI-M
    (otmt/measuremodel.py:632-637 slices the 14-digit archive timestamp)."""
    rows = overall.orderBy("urit", "urim").collect()
    urit_ids: dict = {}
    with open(filename, "w", newline="") as fh:
        writer = csv.DictWriter(fh, fieldnames=["id", "date", "URI", "label"],
                                delimiter="\t")
        writer.writeheader()
        for row in rows:
            urit_ids.setdefault(row.urit, len(urit_ids) + 1)
            urim = row.urim
            # from-warc::{ts}::{url} → ts (ingest synthesis, timeline.py)
            parts = urim.split("::")
            date = parts[1] if len(parts) >= 3 else ""
            if row.overall_topic_status == "on-topic":
                label = "1"
            elif row.overall_topic_status == "off-topic":
                label = "0"
            else:
                label = "ERROR"
            writer.writerow({"id": urit_ids[row.urit], "date": date,
                             "URI": urim, "label": label})


def save_uri_list(overall: DataFrame, status: str, path: str) -> None:
    """S12 — one URI-M per line for the given overall status; distributed
    write (driver never materializes the list)."""
    (
        overall.filter(F.col("overall_topic_status") == status)
        .select("urim")
        .write.mode("overwrite").text(path)
    )
