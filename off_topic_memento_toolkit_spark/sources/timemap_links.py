"""RFC-7089 link-format TimeMap parsing (reference S3).

The reference walks the link-format text with a char-by-char state machine
(otmt/timemap.py:22-193).  Functionally it extracts ``<uri>; key="value"; ...``
entries and interprets rel original/self/timegate/"first memento"/
"last memento"/memento plus datetime/from/until attributes into a nested
dict.  This is an ingest-time helper; at scale it runs inside
``spark.read.text`` + a mapInPandas batch parser (see :func:`parse_timemaps_df`).
"""

import re
from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_RFC1123 = "%a, %d %b %Y %H:%M:%S GMT"

_ENTRY_RE = re.compile(r"<([^>]*)>\s*((?:;\s*\w+\s*=\s*\"[^\"]*\"\s*)*)")
_ATTR_RE = re.compile(r";\s*(\w+)\s*=\s*\"([^\"]*)\"")


def convert_link_timemap_to_dict(text: str, skip_errors: bool = False) -> dict:
    """Same output shape as the reference parser: original_uri, timegate_uri,
    timemap_uri{link_format}, mementos{list, first, last}."""
    out: dict = {"mementos": {"list": []}}
    for match in _ENTRY_RE.finditer(text):
        uri = match.group(1)
        attrs = dict(_ATTR_RE.findall(match.group(2)))
        rel = attrs.get("rel", "")
        rels = rel.split()
        try:
            if "original" in rels:
                out["original_uri"] = uri
            if "timegate" in rels:
                out["timegate_uri"] = uri
            if "self" in rels:
                out["timemap_uri"] = {"link_format": uri}
            if "memento" in rels:
                entry = {"uri": uri}
                if "datetime" in attrs:
                    entry["datetime"] = datetime.strptime(
                        attrs["datetime"], _RFC1123)
                out["mementos"]["list"].append(entry)
                if "first" in rels:
                    out["mementos"]["first"] = dict(entry)
                if "last" in rels:
                    out["mementos"]["last"] = dict(entry)
        except ValueError:
            if not skip_errors:
                raise
    # derive first/last by (datetime, uri) sort when rels didn't mark them
    entries = [e for e in out["mementos"]["list"] if "datetime" in e]
    if entries:
        ordered = sorted(entries, key=lambda e: (e["datetime"], e["uri"]))
        out["mementos"].setdefault("first", ordered[0])
        out["mementos"].setdefault("last", ordered[-1])
    return out


MEMENTO_LINK_SCHEMA = T.StructType([
    T.StructField("urit", T.StringType()),
    T.StructField("urim", T.StringType()),
    T.StructField("memento_datetime", T.TimestampType()),
    T.StructField("original_uri", T.StringType()),
])


def parse_timemaps_df(timemaps: DataFrame, urit_col: str = "urit",
                      body_col: str = "body") -> DataFrame:
    """(urit, body) → exploded memento rows, batch-parsed via mapInPandas."""
    import pandas as pd

    def _parse(batches):
        for pdf in batches:
            rows = []
            for urit, body in zip(pdf[urit_col], pdf[body_col]):
                if body is None:
                    continue
                parsed = convert_link_timemap_to_dict(body, skip_errors=True)
                original = parsed.get("original_uri")
                for entry in parsed["mementos"]["list"]:
                    rows.append((urit, entry["uri"],
                                 entry.get("datetime"), original))
            yield pd.DataFrame(rows, columns=["urit", "urim",
                                              "memento_datetime",
                                              "original_uri"])

    return timemaps.mapInPandas(_parse, schema=MEMENTO_LINK_SCHEMA)
