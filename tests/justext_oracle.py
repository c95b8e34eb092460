"""Test-only vendored oracle for ``extract_text`` byte-parity (P1).

The reference's extraction is ``justext(html_bytes, get_stoplist('English'))``
followed by writing EVERY paragraph's ``.text`` + ``"\\n"``
(/root/reference/otmt/collectionmodel.py:456-466) — justext used purely as an
HTML→paragraph-text extractor.  This module is an independent transcription
of the PUBLISHED jusText 2.x pipeline (Pomikálek 2011, BSD;
github.com/miso-belica/jusText), written against a different evaluation
strategy than the production code: production streams HTMLParser events
directly into paragraph state; this oracle builds a lenient DOM tree, applies
the Cleaner-equivalent subtree removals, then SAX-walks the tree into a
transcribed ParagraphMaker — structurally the same decode → DOM → clean →
saxify → ParagraphMaker path justext itself runs.

Transcribed justext semantics:
- ``decode_html``: declared <meta charset> first, then strict utf-8, then
  utf-8 with errors="replace" (DEFAULT_ENCODING/DEFAULT_ENC_ERRORS).
- Cleaner(scripts=True, style=True, comments=True, embedded=True,
  kill_tags=("head",)): script/style/comment/embed/object/applet subtrees
  and the head subtree are removed; everything else (forms, iframes,
  unknown tags) is kept.
- ParagraphMaker: paragraph boundary at every PARAGRAPH_TAGS start AND end
  and at the second of consecutive <br>s (``self.br`` is reset only by
  character data and non-paragraph tags — NOT by paragraph-tag starts or any
  end tag); a lone <br> appends a " " text node; whitespace-only character
  data is skipped; a paragraph is EMITTED whenever ``text_nodes`` is
  non-empty, even if its normalized text is "" (so a paragraph holding only
  a <br> space prints a bare newline).
- ``normalize_whitespace``: every whitespace run containing CR/LF → "\\n",
  any other run → " " (re UNICODE, so NBSP is whitespace); applied per
  appended node AND to the stripped join.

Documented deviation from literal justext (shared with production):
<title> is killed wherever it appears.  justext kills it only via the head
subtree; any pre-body <title> lands in the (implicit) head under libxml2
recovery, which this rule reproduces — it differs only for a <title>
physically inside <body>, whose libxml2 placement is parser-version
dependent and which the corpus generator therefore avoids.

Table foster-parenting (stray text directly inside <table>/<tr>) is NOT
reproduced; the generator avoids it (libxml2 hoists such text, HTMLParser
cannot see table scope).
"""

import re
from html.parser import HTMLParser

MULTIPLE_WHITESPACE = re.compile(r"\s+", re.UNICODE)

CHARSET_META = re.compile(rb"""<meta[^>]+charset=["']?([^'"/>\s]+)""",
                          re.IGNORECASE)


def normalize_whitespace(text: str) -> str:
    """jusText utils.normalize_whitespace: runs with CR/LF → LF, else SP."""
    def _repl(match):
        run = match.group()
        if "\n" in run or "\r" in run:
            return "\n"
        return " "

    return MULTIPLE_WHITESPACE.sub(_repl, text)


def decode_html(html: bytes, default_encoding="utf8", errors="replace") -> str:
    """jusText core.decode_html order: meta charset, utf-8 strict, default."""
    match = CHARSET_META.search(html)
    if match:
        try:
            declared = match.group(1).decode("ascii")
            return html.decode(declared, errors)
        except (LookupError, UnicodeDecodeError):
            pass
    try:
        return html.decode("utf8")
    except UnicodeDecodeError:
        return html.decode(default_encoding, errors)


# ---------------------------------------------------------------- DOM build

class Element:
    __slots__ = ("tag", "children")

    def __init__(self, tag):
        self.tag = tag
        self.children = []  # str (text) | Element


VOID_TAGS = frozenset((
    "area", "base", "basefont", "bgsound", "br", "col", "embed", "frame",
    "hr", "img", "input", "keygen", "link", "meta", "param", "source",
    "track", "wbr",
))

# libxml2's HTML4-era "start tag closes an open <p>" behavior
# (htmlStartClose table); HTML5-only names (article/section/...) do NOT
# close p in libxml2
_P_CLOSERS = frozenset((
    "address", "blockquote", "center", "dir", "div", "dl", "fieldset",
    "form", "h1", "h2", "h3", "h4", "h5", "h6", "hr", "menu", "ol", "p",
    "pre", "table", "ul", "li", "dd", "dt",
))

_ROW_GROUP = frozenset(("tbody", "tfoot", "thead"))

# CLOSED_BY[open_tag] = start tags that implicitly close it
CLOSED_BY = {
    "p": _P_CLOSERS,
    "li": frozenset(("li",)),
    "dd": frozenset(("dd", "dt")),
    "dt": frozenset(("dd", "dt")),
    "tr": frozenset(("tr",)) | _ROW_GROUP,
    "td": frozenset(("td", "th", "tr")) | _ROW_GROUP,
    "th": frozenset(("td", "th", "tr")) | _ROW_GROUP,
    "option": frozenset(("option", "optgroup")),
    "optgroup": frozenset(("optgroup",)),
    "thead": frozenset(("tbody", "tfoot")),
    "tbody": frozenset(("tbody", "tfoot")),
    "tfoot": frozenset(("tbody",)),
    "colgroup": frozenset(("thead", "tbody", "tfoot", "tr")),
}

# Elements whose place is the (implicit) head; a pre-body run of these stays
# head content.  noscript/template text is body-visible in justext, so they
# are intentionally NOT here.
HEAD_ONLY_TAGS = frozenset((
    "title", "meta", "link", "base", "basefont", "bgsound", "style",
    "script", "noframes",
))


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Element("#root")
        self.stack = [self.root]
        self._head_open = False  # inside an explicit <head> element
        self._head_seen = False  # head is a document singleton

    def _autoclose(self, tag):
        while len(self.stack) > 1:
            top = self.stack[-1].tag
            closers = CLOSED_BY.get(top)
            if closers is not None and tag in closers:
                self.stack.pop()
                continue
            break

    def _implicit_head_exit(self, tag):
        # libxml2 recovery: a body-content start tag ends an unclosed <head>
        if self._head_open and tag not in HEAD_ONLY_TAGS and tag != "head":
            while len(self.stack) > 1:
                popped = self.stack.pop()
                if popped.tag == "head":
                    break
            self._head_open = False

    def handle_starttag(self, tag, attrs):
        if tag == "head" and (self._head_seen or self._head_open):
            return  # head is a document singleton; later <head> tokens are
                    # ignored (HTML5 in-body rule / libxml2 head merge)
        self._implicit_head_exit(tag)
        self._autoclose(tag)
        element = Element(tag)
        self.stack[-1].children.append(element)
        if tag not in VOID_TAGS:
            self.stack.append(element)
            if tag == "head":
                self._head_open = True
                self._head_seen = True

    def handle_startendtag(self, tag, attrs):
        # HTML parsers ignore the self-closing slash on non-void elements:
        # '<div/>' opens a div (libxml2 behavior)
        self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag):
        if tag in VOID_TAGS:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                if any(el.tag == "head" for el in self.stack[i:]):
                    self._head_open = False
                del self.stack[i:]
                return
        # stray end tag: ignored

    def handle_data(self, data):
        # non-whitespace text DIRECTLY inside <head> ends the head (libxml2
        # moves it to body); text inside a head child (title/script/style)
        # stays that element's content
        if (self._head_open and data.strip() != ""
                and self.stack[-1].tag == "head"):
            self._implicit_head_exit("#text")
        self.stack[-1].children.append(data)

    # comments / declarations / PIs are dropped (Cleaner comments=True)


# Cleaner(scripts, style, comments, embedded, kill_tags=head) + the title
# deviation documented above
KILL_SUBTREES = frozenset((
    "head", "script", "style", "title", "embed", "object", "applet", "param",
))


def _clean(element: Element):
    kept = []
    for child in element.children:
        if isinstance(child, Element):
            if child.tag in KILL_SUBTREES:
                continue
            _clean(child)
        kept.append(child)
    element.children = kept


# -------------------------------------------------------- ParagraphMaker

PARAGRAPH_TAGS = frozenset((
    "body", "blockquote", "caption", "center", "col", "colgroup", "dd",
    "div", "dl", "dt", "fieldset", "form", "legend", "optgroup", "option",
    "p", "pre", "table", "td", "textarea", "tfoot", "th", "thead", "tr",
    "ul", "ol", "li", "h1", "h2", "h3", "h4", "h5", "h6",
))


class Paragraph:
    def __init__(self):
        self.text_nodes = []

    def append_text(self, text: str) -> str:
        text = normalize_whitespace(text)
        self.text_nodes.append(text)
        return text

    def contains_text(self) -> bool:
        return bool(self.text_nodes)

    @property
    def text(self) -> str:
        return normalize_whitespace("".join(self.text_nodes).strip())


class ParagraphMaker:
    def __init__(self):
        self.paragraphs = []
        self.paragraph = None
        self.link = False
        self.br = False
        self._start_new_paragraph()

    def _start_new_paragraph(self):
        if self.paragraph is not None and self.paragraph.contains_text():
            self.paragraphs.append(self.paragraph)
        self.paragraph = Paragraph()

    def start_element(self, name):
        if name in PARAGRAPH_TAGS or (name == "br" and self.br):
            self._start_new_paragraph()
        else:
            self.br = name == "br"
            if self.br:
                self.paragraph.append_text(" ")
            elif name == "a":
                self.link = True

    def end_element(self, name):
        if name in PARAGRAPH_TAGS:
            self._start_new_paragraph()
        if name == "a":
            self.link = False

    def characters(self, content):
        if content.strip() == "":
            return
        self.paragraph.append_text(content)
        self.br = False

    def end_document(self):
        self._start_new_paragraph()


def _saxify(element: Element, maker: ParagraphMaker):
    for child in element.children:
        if isinstance(child, str):
            maker.characters(child)
        else:
            maker.start_element(child.tag)
            _saxify(child, maker)
            maker.end_element(child.tag)


class OracleEmptyDocument(ValueError):
    """lxml ParserError('Document is empty') analogue."""


def justext_extract(html) -> str:
    """html (bytes|str) → the exact byte stream the reference writes:
    ``"".join(paragraph.text + "\\n")`` over ALL paragraphs."""
    if html is None:
        raise OracleEmptyDocument("Document is empty")
    if isinstance(html, (bytes, bytearray)):
        html = decode_html(bytes(html))
    if html.strip() == "":
        raise OracleEmptyDocument("Document is empty")
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    root = builder.root
    _clean(root)
    maker = ParagraphMaker()
    _saxify(root, maker)
    maker.end_document()
    return "".join(p.text + "\n" for p in maker.paragraphs)
