"""HTML→text extraction and the shared tokenize/stem/stopword pipeline.

``extract_text`` reproduces what the reference actually does with justext
(otmt/collectionmodel.py:456-463): it writes EVERY paragraph's text with a
trailing newline — paragraph segmentation + whitespace normalization used as
an HTML→text extractor, not actual boilerplate classification.  Semantics
implemented here (justext's documented behavior):

- comments and <head>/<script>/<style>/<title> content are dropped;
- a new paragraph starts/ends at every block-level tag and at <br><br>;
- whitespace runs containing a newline collapse to "\\n", other runs to " ";
- whitespace-only text nodes are ignored; empty paragraphs are dropped;
- output = "".join(paragraph_text + "\\n") over all paragraphs.

An empty/whitespace-only document raises ``EmptyDocumentError``, mirroring the
lxml ``ParserError('Document is empty')`` path the reference converts into
``CollectionModelBoilerPlateRemovalFailureException``
(otmt/collectionmodel.py:465-466).

``full_tokenize`` mirrors otmt/timemap_measures.py:45-62: Treebank tokenize →
Porter stem → drop stemmed tokens that appear in the (unstemmed) stopword
list + punctuation.
"""

import re
from html.parser import HTMLParser

from .porter import porter_stem
from .stopwords import STOPSET
from .treebank import word_tokenize

_WS_RUN = re.compile(r"\s+", re.UNICODE)


def _normalize_whitespace(text: str) -> str:
    """justext rule: runs containing CR/LF become one newline, others one space."""
    return _WS_RUN.sub(
        lambda m: "\n" if ("\n" in m.group() or "\r" in m.group()) else " ",
        text,
    )


class EmptyDocumentError(ValueError):
    """Raised for empty/unparseable HTML; callers turn it into an error row."""


# justext paragraph_maker block-level tags
_PARAGRAPH_TAGS = frozenset((
    "body", "blockquote", "caption", "center", "col", "colgroup", "dd",
    "div", "dl", "dt", "fieldset", "form", "legend", "optgroup", "option",
    "p", "pre", "table", "td", "textarea", "tfoot", "th", "thead", "tr",
    "ul", "ol", "li", "h1", "h2", "h3", "h4", "h5", "h6",
))

_KILL_TAGS = frozenset(("head", "script", "style", "title"))


class _ParagraphParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.paragraphs = []
        self._nodes = []
        self._kill_depth = 0
        self._br = False

    def _flush(self):
        if self._nodes:
            text = _normalize_whitespace("".join(self._nodes)).strip()
            if text:
                self.paragraphs.append(text)
        self._nodes = []

    def handle_starttag(self, tag, attrs):
        if tag in _KILL_TAGS:
            self._kill_depth += 1
            return
        if self._kill_depth:
            return
        if tag in _PARAGRAPH_TAGS or (tag == "br" and self._br):
            self._flush()
            self._br = tag == "br"
        elif tag == "br":
            self._br = True
            self._nodes.append(" ")
        else:
            self._br = False

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag):
        if tag in _KILL_TAGS:
            self._kill_depth = max(0, self._kill_depth - 1)
            return
        if self._kill_depth:
            return
        if tag in _PARAGRAPH_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._kill_depth:
            return
        if data.strip() == "":
            return
        self._nodes.append(data)
        self._br = False


def extract_text(html) -> str:
    """Extract paragraph text from HTML bytes/str; every paragraph suffixed
    with a newline (reference write format, otmt/collectionmodel.py:462-463)."""
    if html is None:
        raise EmptyDocumentError("Document is empty")
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    if html.strip() == "":
        raise EmptyDocumentError("Document is empty")
    parser = _ParagraphParser()
    parser.feed(html)
    parser.close()
    parser._flush()
    return "".join(p + "\n" for p in parser.paragraphs)


def full_tokenize(text, stemming: bool = True) -> list:
    """otmt/timemap_measures.py:45-62 — tokenize, stem, drop stopwords/punct.

    Stopword filtering runs on *stemmed* tokens against the unstemmed list,
    so e.g. 'having'→'have' survives while 'is' is dropped.
    """
    if isinstance(text, (bytes, bytearray)):
        text = bytes(text).decode("utf8")
    tokens = word_tokenize(text)
    if stemming:
        tokens = [porter_stem(token) for token in tokens]
    return [token for token in tokens if token not in STOPSET]
