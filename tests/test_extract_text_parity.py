"""Byte-parity for ``extract_text`` (P1, the driver invariant) against the
vendored justext-pipeline oracle (tests/justext_oracle.py).

The production path streams HTMLParser events straight into paragraph state;
the oracle builds a lenient DOM, applies the Cleaner-equivalent subtree
kills, and SAX-walks the tree — the same published jusText pipeline
evaluated two structurally different ways.  Every document must extract to
IDENTICAL bytes through both.

Inputs: the hand-derived adversarial corpus (test_extract_text_corpus.CASES)
plus a seeded generator of messy real-world-ish HTML: unclosed tags, deep
block/inline mixes, <br> runs in every position, entities, comments with
markup inside, scripts containing fake tags, head-less documents, implicit
head exits, embedded objects with fallback text, tables, forms, charset
declarations.
"""

import random

import pytest

from off_topic_memento_toolkit_spark.functions.textprep import (
    EmptyDocumentError,
    extract_text,
)

from justext_oracle import OracleEmptyDocument, justext_extract
from test_extract_text_corpus import CASES

WORDS = [
    "news", "report", "archive", "memento", "topic", "crawl", "page",
    "data", "web", "story", "link", "time", "värld", "café", "東京",
    "update", "x1", "α", "quote\"d", "amp&ersand", "less<than",
]

INLINE_TAGS = ["b", "i", "em", "strong", "span", "a", "u", "small", "code",
               "sup", "font", "unknowninline"]
BLOCK_TAGS = ["p", "div", "blockquote", "li", "ul", "ol", "h1", "h2", "h3",
              "pre", "center", "fieldset", "form", "dl", "dd", "dt",
              "legend", "option", "textarea"]
KILLED = ["script", "style", "object", "applet", "embed"]


def _text(rng):
    n = rng.randint(1, 6)
    sep = rng.choice([" ", "  ", "\n", " \t ", "\r\n", "&nbsp;", " &amp; "])
    return sep.join(rng.choice(WORDS) for _ in range(n))


def _fragment(rng, depth):
    roll = rng.random()
    if depth > 4 or roll < 0.30:
        return _text(rng)
    if roll < 0.42:
        tag = rng.choice(INLINE_TAGS)
        inner = "".join(_fragment(rng, depth + 1)
                        for _ in range(rng.randint(1, 3)))
        close = "" if rng.random() < 0.15 else f"</{tag}>"
        return f"<{tag}>{inner}{close}"
    if roll < 0.62:
        tag = rng.choice(BLOCK_TAGS)
        inner = "".join(_fragment(rng, depth + 1)
                        for _ in range(rng.randint(1, 3)))
        close = "" if rng.random() < 0.20 else f"</{tag}>"
        return f"<{tag}>{inner}{close}"
    if roll < 0.72:
        return "<br>" * rng.randint(1, 3)
    if roll < 0.78:
        return f"<!-- hidden <p>{_text(rng)}</p> -->"
    if roll < 0.84:
        tag = rng.choice(KILLED)
        return f"<{tag}>ignored <div>fake</div> {_text(rng)}</{tag}>"
    if roll < 0.90:
        rows = "".join(
            f"<tr><td>{_text(rng)}</td><th>{_text(rng)}"
            for _ in range(rng.randint(1, 2)))
        close = "" if rng.random() < 0.25 else "</table>"
        return f"<table><caption>{_text(rng)}</caption>{rows}{close}"
    if roll < 0.95:
        return (f"<ul><li>{_text(rng)}<li>{_text(rng)}</li>"
                f"{'' if rng.random() < 0.3 else '</ul>'}")
    return f"<hr><img src=x>{_text(rng)}<wbr>"


def _document(rng):
    body = "".join(_fragment(rng, 0) for _ in range(rng.randint(2, 8)))
    shape = rng.random()
    if shape < 0.25:  # bare fragment
        return body
    if shape < 0.50:  # full document, explicit head
        return (f"<html><head><title>{_text(rng)}</title>"
                f"<meta charset=\"utf-8\"><style>p {{x}}</style></head>"
                f"<body>{body}</body></html>")
    if shape < 0.70:  # unclosed head (implicit exit)
        return (f"<html><head><title>{_text(rng)}</title>"
                f"<link rel=x href=y>{body}</html>")
    if shape < 0.85:  # no head at all, stray tail text
        return f"<html><body>{body}</body>{_text(rng)}</html>"
    # uppercase tags + self-closing + attributes with '>' inside
    return (f"<HTML><BODY data-x=\"a>b\"><P>{_text(rng)}</P>"
            f"<div/>{body}</BODY></HTML>")


GENERATED = []
_rng = random.Random(20260816)
for _i in range(220):
    GENERATED.append(_document(_rng))


@pytest.mark.parametrize("html,_expected", CASES,
                         ids=[f"corpus{i:02d}" for i in range(len(CASES))])
def test_corpus_parity_with_oracle(html, _expected):
    assert extract_text(html) == justext_extract(html)


@pytest.mark.parametrize("idx", range(len(GENERATED)))
def test_generated_parity_with_oracle(idx):
    html = GENERATED[idx]
    assert extract_text(html) == justext_extract(html), html


def test_generated_parity_bytes_input():
    for html in GENERATED[:40]:
        raw = html.encode("utf-8")
        assert extract_text(raw) == justext_extract(raw)


def test_meta_charset_decode_parity():
    # declared charset wins over utf-8 (jusText decode_html order)
    latin = ("<html><head><meta http-equiv=\"Content-Type\" "
             "content=\"text/html; charset=ISO-8859-1\"></head>"
             "<body><p>caf\xe9 au lait</p></body></html>").encode("latin-1")
    assert extract_text(latin) == justext_extract(latin) == "café au lait\n"
    # bogus declared charset falls through to utf-8
    bogus = (b"<meta charset='no-such-enc'><p>caf\xc3\xa9</p>")
    assert extract_text(bogus) == justext_extract(bogus) == "caf\xe9\n"


def test_empty_documents_raise_in_both():
    for bad in (None, "", "   \n  ", b"", b"  "):
        with pytest.raises(EmptyDocumentError):
            extract_text(bad)
        with pytest.raises(OracleEmptyDocument):
            justext_extract(bad)


# ------------------------- hypothesis tag-soup fuzz (beyond the generator)

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _TAGS = (list(dict.fromkeys(
        INLINE_TAGS + BLOCK_TAGS + KILLED
        + ["br", "hr", "img", "head", "title", "body", "html", "table",
           "tr", "td", "th", "option", "optgroup", "colgroup", "col",
           "tbody", "thead", "tfoot", "meta", "link", "weirdtag"])))

    _texts = st.text(
        alphabet=st.sampled_from(
            list("ab <>&;/\"'\n\r\t=-!") + ["é", "東", "\xa0"]),
        min_size=1, max_size=12)

    _pieces = st.one_of(
        _texts,
        st.sampled_from(_TAGS).map(lambda t: f"<{t}>"),
        st.sampled_from(_TAGS).map(lambda t: f"</{t}>"),
        st.sampled_from(_TAGS).map(lambda t: f"<{t}/>"),
        st.sampled_from(_TAGS).map(lambda t: f"<{t} a=\"x>y\" b>"),
        st.just("<!-- c <p>x</p> -->"),
        st.just("&amp;"), st.just("&nbsp;"), st.just("&#66;"),
        st.just("<br><br>"),
    )

    # derandomize: the gate must be reproducible run-to-run (exploratory
    # fuzzing happens offline — 40k-soup sweeps during development)
    @settings(max_examples=400, deadline=None, derandomize=True)
    @given(st.lists(_pieces, min_size=1, max_size=40))
    def test_tag_soup_parity(pieces):
        """Arbitrary event soup — stream parser and tree oracle must emit
        identical bytes (or both reject the document as empty)."""
        html = "".join(pieces)
        try:
            a = extract_text(html)
        except EmptyDocumentError:
            a = "<EMPTY>"
        try:
            b = justext_extract(html)
        except OracleEmptyDocument:
            b = "<EMPTY>"
        assert a == b, repr(html)

except ImportError:  # pragma: no cover - hypothesis is baked into the image
    pass
