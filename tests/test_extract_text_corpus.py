"""Adversarial HTML corpus for extract_text (P1 byte-identity invariant).

Every expected value is hand-derived from the documented justext paragraph
semantics the reference relies on (otmt/collectionmodel.py:456-466):

- <head>/<script>/<style>/<title> content and comments are dropped;
- a paragraph boundary at every block-level tag (open AND close) and at
  <br><br>;
- whitespace runs containing CR/LF collapse to "\\n", other runs (incl.
  NBSP) to " "; paragraphs are stripped; a paragraph is emitted whenever it
  holds text nodes, even if its normalized text is "" (bare newline);
- output = "".join(paragraph + "\\n");
- empty/whitespace-only/None documents raise (the reference converts lxml's
  ParserError('Document is empty') into its boilerplate exception).

Byte-level golden lengths vs the reference's own fixtures are covered in
test_golden_kernels.py; this file pins the tag/entity/whitespace edge cases.
"""

import pytest

from off_topic_memento_toolkit_spark.functions.textprep import (
    EmptyDocumentError,
    extract_text,
)

CASES = [
    # --- basics ---
    ("<html><body><p>Hello world</p></body></html>", "Hello world\n"),
    ("<p>One</p><p>Two</p>", "One\nTwo\n"),
    ("text with no tags", "text with no tags\n"),
    ("<p></p><p>x</p>", "x\n"),                      # empty paragraph dropped
    ("<div>   </div><p>y</p>", "y\n"),               # whitespace-only node
    # --- kill tags ---
    ("<p>keep</p><script>var x = '<p>no</p>';</script>", "keep\n"),
    ("<style>p { color: red }</style><p>text</p>", "text\n"),
    ("<html><head><title>T</title></head><body><p>B</p></body></html>",
     "B\n"),
    ("<head><style>s{}</style><script>j()</script></head><p>v</p>", "v\n"),
    # --- comments ---
    ("<p>a<!-- hidden -->b</p>", "ab\n"),
    ("<p>x</p><!--<p>ghost</p>-->", "x\n"),
    # --- block nesting / implicit closes ---
    ("<div>first<div>second</div>third</div>", "first\nsecond\nthird\n"),
    ("<p>a<p>b", "a\nb\n"),                          # implicit close
    ("<p>unclosed <div>next", "unclosed\nnext\n"),   # malformed tail
    # --- tables ---
    ("<table><tr><td>A</td><td>B</td></tr></table>", "A\nB\n"),
    ("<td>cell</td>", "cell\n"),
    ("<table><caption>Cap</caption><tr><th>H</th></tr></table>", "Cap\nH\n"),
    ("<colgroup><col>x</colgroup>", "x\n"),
    # --- entities ---
    ("<p>Tom &amp; Jerry &lt;3</p>", "Tom & Jerry <3\n"),
    ("<p>A&#66;C</p>", "ABC\n"),
    ("<p>&quot;q&quot;</p>", '"q"\n'),
    ("&amp; outside", "& outside\n"),
    ("<p>a&nbsp;b</p>", "a b\n"),                    # NBSP is whitespace
    # --- br semantics ---
    ("<p>line one<br>line two</p>", "line one line two\n"),
    ("<p>para one<br><br>para two</p>", "para one\npara two\n"),
    ("<p>para one<br> \n <br>para two</p>", "para one\npara two\n"),
    ("<p>end<br></p>", "end\n"),
    # a paragraph holding only the <br> space node IS emitted (justext's
    # contains_text() checks nodes, not normalized text) → bare newline,
    # exactly what the reference's "{}\n".format(p.text) loop writes
    ("<br><br>", "\n"),
    # --- whitespace normalization ---
    ("<p>a\r\nb</p>", "a\nb\n"),                     # CRLF run → newline
    ("<p>multi\n\nline</p>", "multi\nline\n"),
    ("<p>a    b\t\tc</p>", "a b c\n"),
    ("<p>  leading and trailing  </p>", "leading and trailing\n"),
    ("<p>tab\there</p>", "tab here\n"),
    ("<pre>  spaced   text  </pre>", "spaced text\n"),
    # --- inline tags don't break paragraphs ---
    ("<p><b>bold</b> and <i>italic</i></p>", "bold and italic\n"),
    ("<p>one<span> two </span>three</p>", "one two three\n"),
    ("<h3><em>emph</em> rest</h3>", "emph rest\n"),
    # --- headings / lists / forms ---
    ("<h1>Title</h1><p>body</p>", "Title\nbody\n"),
    ("<ul><li>one</li><li>two</li></ul>", "one\ntwo\n"),
    ("<li>item</li>", "item\n"),
    ("<ol><li>1</li><li>2</li></ol>", "1\n2\n"),
    ("<form><option>opt</option></form>", "opt\n"),
    ("<option>a</option><option>b</option>", "a\nb\n"),
    ("<fieldset><legend>L</legend>f</fieldset>", "L\nf\n"),
    ("<textarea>area text</textarea>", "area text\n"),
    ("<blockquote>quoted</blockquote>", "quoted\n"),
    # --- case / self-closing / attributes ---
    ("<P>UPPER</P>", "UPPER\n"),
    ("<div/>x", "x\n"),
    ('<p data-x="a>b">attr</p>', "attr\n"),
    # --- document edges ---
    ("<body><p>a</p></body>tail", "a\ntail\n"),
    ("<p>你好 世界</p>", "你好 世界\n"),
    # --- bytes input ---
    (b"<p>caf\xc3\xa9</p>", "café\n"),
    (b"<p>caf\xe9</p>", "caf�\n"),              # invalid utf-8 → U+FFFD
]


@pytest.mark.parametrize("html,expected", CASES,
                         ids=[f"case{i:02d}" for i in range(len(CASES))])
def test_extract_text_corpus(html, expected):
    assert extract_text(html) == expected


@pytest.mark.parametrize("bad", [None, "", "   \n  ", b"", b"  "])
def test_empty_documents_raise(bad):
    with pytest.raises(EmptyDocumentError):
        extract_text(bad)
