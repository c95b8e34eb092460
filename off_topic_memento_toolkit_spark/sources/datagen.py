"""Deterministic synthetic ``pages`` table (FIXTURES.md §1).

Seeded, wallclock-free generator of Common-Crawl-style rows
``(url, warc_ts, html, text, lang)`` with controlled populations:

1. identical-content timelines (identity scores, one dup cluster per url)
2. pangram-drift timelines — EXACTLY the reference's golden fixture
   (tests/timemap_measures_test.py:340-373) so golden scores hold end-to-end
3. the two-doc overlap pair (cosine/simhash/tfintersection goldens)
4. off-topic flips (later mementos switch to disjoint vocabulary)
5. near-duplicates (small token edits; expected simhash hamming ≤ 12)
6. error rows (empty html, empty body, null html)
7. one skew host with ~100x the median mementos
8. singleton timelines
"""

import random
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..functions.textprep import EmptyDocumentError, extract_text

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), False),
    T.StructField("html", T.BinaryType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
])

PANGRAM_WORDS = [
    'The', 'quick', 'brown', 'fox', 'jumps', 'over',
    'the', 'lazy', 'dog', 'etaoin', 'shrdlu', 'Now', 'is', 'the',
    'time', 'for', 'all', 'good', 'men', 'to', 'come', 'to', 'the',
    'aid', 'of', 'their', 'country',
    'Jived', 'fox', 'nymph', 'grabs', 'quick', 'waltz',
    'Glib', 'jocks', 'quiz', 'nymph', 'to', 'vex', 'dwarf',
    'Sphinx', 'of', 'black', 'quartz,', 'judge', 'my', 'vow',
    'How', 'vexingly', 'quick', 'daft', 'zebras', 'jump',
    'The', 'five', 'boxing', 'wizards', 'jump', 'quickly',
    'Pack', 'my', 'box', 'with', 'five', 'dozen', 'liquor', 'jugs',
]

_TOPIC_VOCAB = [
    "archive", "memento", "timemap", "crawler", "snapshot", "heritage",
    "collection", "curator", "webpage", "capture", "wayback", "preserve",
    "digital", "history", "record", "librarian", "index", "replay",
]
_OFFTOPIC_VOCAB = [
    "casino", "poker", "jackpot", "lottery", "betting", "roulette",
    "bonus", "slots", "wager", "payout", "gamble", "dealer",
]

_EPOCH = datetime(2016, 1, 1, 0, 0, 0)


def _html(body: str) -> bytes:
    return bytes(f"<html><body>{body}</body></html>", "utf8")


def _safe_text(html_bytes):
    if html_bytes is None:
        return None
    try:
        return extract_text(html_bytes)
    except EmptyDocumentError:
        return None


def _row(url, ts, html_bytes, lang="en", materialize_text=True):
    return (
        url, ts, html_bytes,
        _safe_text(html_bytes) if materialize_text else None,
        lang,
    )


def pangram_drift_rows(url_prefix="http://fixture.example/drift"):
    """Reference golden fixture, recast into pages rows: two timelines of
    three mementos with cumulative pangram suffixes."""
    mdts = [
        datetime(2016, 1, 21, 15, 45, 6),
        datetime(2017, 1, 21, 15, 45, 6),
        datetime(2018, 1, 21, 15, 45, 12),
    ]
    mdts2 = [
        datetime(2016, 3, 21, 15, 45, 6),
        datetime(2017, 3, 21, 15, 45, 6),
        datetime(2018, 3, 21, 15, 45, 12),
    ]
    rows = []
    for i, (tm, dates) in enumerate([("timemap1", mdts), ("timemap2", mdts2)]):
        url = f"{url_prefix}/{tm}"
        index = i + 1
        for m, mdt in enumerate(dates, start=1):
            index += 1
            urim = f"memento{i + 1}{m}"
            inner = urim
            for j in range(0, index):
                inner += "\n" + " ".join(PANGRAM_WORDS[(i + j + index):]) + " "
            inner += "\n" + str(mdt)
            rows.append(_row(url, mdt, _html(inner)))
    return rows


def overlap_pair_rows(url="http://fixture.example/overlap"):
    """Two-doc fixture: pangram slices [0:20] vs [20:-1]
    (cosine 0.12882843..., raw_simhash 36, tf_simhash 24)."""
    return [
        _row(url, datetime(2016, 1, 21, 15, 45, 6),
             _html(" ".join(PANGRAM_WORDS[0:20]))),
        _row(url, datetime(2018, 1, 21, 15, 45, 12),
             _html(" ".join(PANGRAM_WORDS[20:-1]))),
    ]


def tfintersection_pair_rows(url="http://fixture.example/tfpair"):
    """[0:30] vs [10:40] fixture (tfintersection golden 11)."""
    return [
        _row(url, datetime(2016, 1, 21, 15, 45, 6),
             _html(" ".join(PANGRAM_WORDS[0:30]))),
        _row(url, datetime(2018, 1, 21, 15, 45, 12),
             _html(" ".join(PANGRAM_WORDS[10:40]))),
    ]


def _sentence(rng, vocab, n):
    return " ".join(rng.choice(vocab) for _ in range(n))


def generate_rows(
    n_urls: int = 50,
    mementos_per_url: int = 5,
    dup_rate: float = 0.3,
    offtopic_rate: float = 0.2,
    skew: bool = True,
    skew_factor: int = 100,
    error_rows: bool = True,
    seed: int = 42,
):
    rng = random.Random(seed)
    rows = []

    rows += pangram_drift_rows()
    rows += overlap_pair_rows()
    rows += tfintersection_pair_rows()

    for u in range(n_urls):
        url = f"http://site{u % 10}.example/page/{u}"
        base = _sentence(rng, _TOPIC_VOCAB, 80)
        is_offtopic_flip = rng.random() < offtopic_rate
        n_mem = mementos_per_url
        if skew and u == 0:
            n_mem = mementos_per_url * skew_factor
        for m in range(n_mem):
            ts = _EPOCH + timedelta(hours=u * 1000 + m * 7, minutes=m)
            r = rng.random()
            if m == 0:
                body = base
            elif r < dup_rate:
                body = base  # exact duplicate of first
            elif r < dup_rate + 0.2:
                # near-duplicate: flip a handful of tokens
                words = base.split()
                for _ in range(3):
                    words[rng.randrange(len(words))] = rng.choice(_TOPIC_VOCAB)
                body = " ".join(words)
            elif is_offtopic_flip and m >= n_mem // 2:
                body = _sentence(rng, _OFFTOPIC_VOCAB, 15)
            else:
                body = base + " " + _sentence(rng, _TOPIC_VOCAB, 20)
            rows.append(_row(url, ts, _html(body)))

    # singleton timelines
    for s in range(5):
        rows.append(_row(
            f"http://single{s}.example/only",
            _EPOCH + timedelta(days=400 + s),
            _html(_sentence(rng, _TOPIC_VOCAB, 40)),
        ))

    if error_rows:
        err_ts = _EPOCH + timedelta(days=500)
        # empty html → extraction failure (ParserError path)
        rows.append(_row("http://errors.example/empty-html", err_ts, b""))
        # empty body → empty text → "first memento empty" poison
        rows.append(_row("http://errors.example/empty-body", err_ts,
                         b"<html><body></body></html>"))
        rows.append(_row("http://errors.example/empty-body",
                         err_ts + timedelta(days=1),
                         _html(_sentence(rng, _TOPIC_VOCAB, 10))))
        # null html
        rows.append(("http://errors.example/null-html", err_ts, None, None, "en"))

    return rows


def generate_pages(spark: SparkSession, **kwargs) -> DataFrame:
    return spark.createDataFrame(generate_rows(**kwargs), schema=PAGES_SCHEMA)
