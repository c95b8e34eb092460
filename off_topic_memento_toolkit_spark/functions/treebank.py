"""Penn-Treebank word tokenization compatible with ``nltk.word_tokenize``.

The reference tokenizes with ``nltk.word_tokenize`` (punkt sentence split +
Treebank word tokenizer, otmt/timemap_measures.py:52-57).  The Treebank rules
are a published sed-script-derived regex list; they are reimplemented here
verbatim-in-spirit.  Sentence splitting uses a deterministic rule-based
splitter instead of the statistical punkt model: split after ``.``/``!``/``?``
followed by whitespace and an upper-case/quote/digit opener, with a small
abbreviation guard.  For texts without sentence-final punctuation (all of the
reference's golden fixtures, and this repo's synthetic corpora) the two are
identical.
"""

import re

_STARTING_QUOTES = [
    (re.compile(r"^\""), r"`` "),
    (re.compile(r"(``)"), r" \1 "),
    (re.compile(r"([ \(\[{<])(\"|\'{2})"), r"\1 `` "),
]

_PUNCTUATION = [
    (re.compile(r"([:,])([^\d])"), r" \1 \2"),
    (re.compile(r"([:,])$"), r" \1 "),
    (re.compile(r"\.\.\."), r" ... "),
    (re.compile(r"[;@#$%&]"), r" \g<0> "),
    # final period of the sentence (possibly followed by closing brackets/quotes)
    (re.compile(r'([^\.])(\.)([\]\)}>"\']*)\s*$'), r"\1 \2\3 "),
    (re.compile(r"[?!]"), r" \g<0> "),
    (re.compile(r"([^'])' "), r"\1 ' "),
]

_PARENS_BRACKETS = (re.compile(r"[\]\[\(\)\{\}<>]"), r" \g<0> ")

_DOUBLE_DASHES = (re.compile(r"--"), r" -- ")

_ENDING_QUOTES = [
    (re.compile(r'"'), " '' "),
    (re.compile(r"(\S)(\'\')"), r"\1 \2 "),
    (re.compile(r"([^' ])('[sS]|'[mM]|'[dD]|') "), r"\1 \2 "),
    (re.compile(r"([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) "), r"\1 \2 "),
]

# MacIntyre contraction list (nltk.tokenize.util.MacIntyreContractions)
_CONTRACTIONS2 = [
    re.compile(p) for p in (
        r"(?i)\b(can)(?#X)(not)\b",
        r"(?i)\b(d)(?#X)('ye)\b",
        r"(?i)\b(gim)(?#X)(me)\b",
        r"(?i)\b(gon)(?#X)(na)\b",
        r"(?i)\b(got)(?#X)(ta)\b",
        r"(?i)\b(lem)(?#X)(me)\b",
        r"(?i)\b(more)(?#X)('n)\b",
        r"(?i)\b(wan)(?#X)(na)(?=\s)",
    )
]
_CONTRACTIONS3 = [
    re.compile(p) for p in (r"(?i) ('t)(?#X)(is)\b", r"(?i) ('t)(?#X)(was)\b")
]


def treebank_tokenize(text: str) -> list:
    """Tokenize one sentence with the Treebank rules."""
    for regexp, substitution in _STARTING_QUOTES:
        text = regexp.sub(substitution, text)
    for regexp, substitution in _PUNCTUATION:
        text = regexp.sub(substitution, text)

    regexp, substitution = _PARENS_BRACKETS
    text = regexp.sub(substitution, text)

    regexp, substitution = _DOUBLE_DASHES
    text = regexp.sub(substitution, text)

    text = " " + text + " "

    for regexp, substitution in _ENDING_QUOTES:
        text = regexp.sub(substitution, text)

    for regexp in _CONTRACTIONS2:
        text = regexp.sub(r" \1 \2 ", text)
    for regexp in _CONTRACTIONS3:
        text = regexp.sub(r" \1 \2 ", text)

    return text.split()


# deterministic punkt-lite: sentence boundary = .!? + whitespace + an opener,
# unless the previous token looks like a common abbreviation or initial
_ABBREV = frozenset((
    "mr", "mrs", "ms", "dr", "prof", "sr", "jr", "st", "vs", "etc", "e.g",
    "i.e", "inc", "ltd", "co", "corp", "no", "dept", "univ", "est", "fig",
    "jan", "feb", "mar", "apr", "jun", "jul", "aug", "sep", "sept", "oct",
    "nov", "dec", "u.s", "u.k",
))

_SENT_BOUNDARY = re.compile(r"(?<=[.!?])(\s+)(?=[\"'(\[{<]?[A-Z0-9])")


def sent_tokenize(text: str) -> list:
    sentences = []
    start = 0
    for match in _SENT_BOUNDARY.finditer(text):
        candidate = text[start:match.start()]
        prev_word = candidate.rsplit(None, 1)[-1] if candidate.split() else ""
        prev_word = prev_word.rstrip(".").lower()
        if prev_word in _ABBREV or (len(prev_word) == 1 and prev_word.isalpha()):
            continue  # abbreviation / initial, not a boundary
        sentences.append(candidate)
        start = match.end()
    tail = text[start:]
    if tail.strip():
        sentences.append(tail)
    elif not sentences:
        sentences.append(text)
    return sentences


def word_tokenize(text: str) -> list:
    """``nltk.word_tokenize`` equivalent: sentence-split then Treebank."""
    return [
        token
        for sentence in sent_tokenize(text)
        for token in treebank_tokenize(sentence)
    ]
