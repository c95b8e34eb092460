"""Porter stemmer, NLTK-extensions rule set, implemented from the published
algorithm (M.F. Porter, "An algorithm for suffix stripping", 1980) plus the
documented NLTK deviations (irregular-forms pool, <=2-char passthrough,
``ies``/``ied`` special cases, ``alli``/``fulli``/``logi`` rules, consonant-y
handling).

The reference stems every token with ``nltk.stem.porter.PorterStemmer`` in its
default NLTK_EXTENSIONS mode (otmt/timemap_measures.py:31-43); all its golden
regression scores (tests/timemap_measures_test.py:424-472) depend on this
exact rule set, so parity here is load-bearing.
"""

from functools import lru_cache

_VOWELS = frozenset("aeiou")

_IRREGULAR = {
    "sky": "sky", "skies": "sky",
    "dying": "die", "lying": "lie", "tying": "tie",
    "news": "news",
    "innings": "inning", "inning": "inning",
    "outings": "outing", "outing": "outing",
    "cannings": "canning", "canning": "canning",
    "howe": "howe",
    "proceed": "proceed", "exceed": "exceed", "succeed": "succeed",
}


def _is_consonant(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return True if i == 0 else not _is_consonant(word, i - 1)
    return True


def _measure(stem: str) -> int:
    cv = "".join("c" if _is_consonant(stem, i) else "v" for i in range(len(stem)))
    return cv.count("vc")


def _positive_measure(stem: str) -> bool:
    return _measure(stem) > 0


def _contains_vowel(stem: str) -> bool:
    return any(not _is_consonant(stem, i) for i in range(len(stem)))


def _ends_double_consonant(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_consonant(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    return (
        len(word) >= 3
        and _is_consonant(word, len(word) - 3)
        and not _is_consonant(word, len(word) - 2)
        and _is_consonant(word, len(word) - 1)
        and word[-1] not in ("w", "x", "y")
    ) or (
        # NLTK extension: 2-letter vowel+consonant words end CVC
        len(word) == 2
        and not _is_consonant(word, 0)
        and _is_consonant(word, 1)
    )


def _apply_rules(word, rules):
    """First rule whose suffix matches wins; a failed condition on a matching
    suffix stops the whole rule list (classic Porter control flow)."""
    for suffix, replacement, condition in rules:
        if suffix == "*d":
            if _ends_double_consonant(word):
                stem = word[:-2]
                if condition is None or condition(stem):
                    return stem + replacement
                return word
            continue
        if word.endswith(suffix):
            stem = word[: len(word) - len(suffix)] if suffix else word
            if condition is None or condition(stem):
                return stem + replacement
            return word
    return word


def _step1a(word):
    if word.endswith("ies") and len(word) == 4:  # NLTK ext: dies->die
        return word[:-3] + "ie"
    return _apply_rules(word, [
        ("sses", "ss", None),
        ("ies", "i", None),
        ("ss", "ss", None),
        ("s", "", None),
    ])


def _step1b(word):
    # NLTK ext: spied->spi but died->die
    if word.endswith("ied"):
        return word[:-3] + ("ie" if len(word) == 4 else "i")

    if word.endswith("eed"):
        stem = word[:-3]
        return stem + "ee" if _measure(stem) > 0 else word

    intermediate = None
    for suffix in ("ed", "ing"):
        if word.endswith(suffix):
            cand = word[: len(word) - len(suffix)]
            if _contains_vowel(cand):
                intermediate = cand
            break
    if intermediate is None:
        return word

    return _apply_rules(intermediate, [
        ("at", "ate", None),
        ("bl", "ble", None),
        ("iz", "ize", None),
        ("*d", intermediate[-1],
         lambda stem: intermediate[-1] not in ("l", "s", "z")),
        ("", "e",
         lambda stem: _measure(stem) == 1 and _ends_cvc(stem)),
    ])


def _step1c(word):
    return _apply_rules(word, [
        ("y", "i",
         lambda stem: len(stem) > 1 and _is_consonant(stem, len(stem) - 1)),
    ])


def _step2(word):
    # NLTK ext: apply ALLI->AL first and re-run step2 on success
    if word.endswith("alli") and _positive_measure(word[:-4]):
        return _step2(word[:-4] + "al")

    if word.endswith("logi") and _positive_measure(word[:-3]):
        # the 'l' stays with the stem so geo/theo are unchanged (NLTK ext)
        return word[:-3] + "og"

    return _apply_rules(word, [
        ("ational", "ate", _positive_measure),
        ("tional", "tion", _positive_measure),
        ("enci", "ence", _positive_measure),
        ("anci", "ance", _positive_measure),
        ("izer", "ize", _positive_measure),
        ("bli", "ble", _positive_measure),
        ("alli", "al", _positive_measure),
        ("entli", "ent", _positive_measure),
        ("eli", "e", _positive_measure),
        ("ousli", "ous", _positive_measure),
        ("ization", "ize", _positive_measure),
        ("ation", "ate", _positive_measure),
        ("ator", "ate", _positive_measure),
        ("alism", "al", _positive_measure),
        ("iveness", "ive", _positive_measure),
        ("fulness", "ful", _positive_measure),
        ("ousness", "ous", _positive_measure),
        ("aliti", "al", _positive_measure),
        ("iviti", "ive", _positive_measure),
        ("biliti", "ble", _positive_measure),
        ("fulli", "ful", _positive_measure),  # NLTK ext
    ])


def _step3(word):
    return _apply_rules(word, [
        ("icate", "ic", _positive_measure),
        ("ative", "", _positive_measure),
        ("alize", "al", _positive_measure),
        ("iciti", "ic", _positive_measure),
        ("ical", "ic", _positive_measure),
        ("ful", "", _positive_measure),
        ("ness", "", _positive_measure),
    ])


def _step4(word):
    def gt1(stem):
        return _measure(stem) > 1

    return _apply_rules(word, [
        ("al", "", gt1),
        ("ance", "", gt1),
        ("ence", "", gt1),
        ("er", "", gt1),
        ("ic", "", gt1),
        ("able", "", gt1),
        ("ible", "", gt1),
        ("ant", "", gt1),
        ("ement", "", gt1),
        ("ment", "", gt1),
        ("ent", "", gt1),
        ("ion", "",
         lambda stem: _measure(stem) > 1 and stem[-1] in ("s", "t")),
        ("ou", "", gt1),
        ("ism", "", gt1),
        ("ate", "", gt1),
        ("iti", "", gt1),
        ("ous", "", gt1),
        ("ive", "", gt1),
        ("ize", "", gt1),
    ])


def _step5a(word):
    if word.endswith("e"):
        stem = word[:-1]
        if _measure(stem) > 1:
            return stem
        if _measure(stem) == 1 and not _ends_cvc(stem):
            return stem
    return word


def _step5b(word):
    if _measure(word) > 1 and _ends_double_consonant(word) and word.endswith("l"):
        return word[:-1]
    return word


@lru_cache(maxsize=65536)
def porter_stem(word: str) -> str:
    """Stem one word, lowercasing it as part of stemming — EXCEPT the two
    deliberate NLTK quirks below, both transcribed verbatim from
    ``nltk.stem.porter.PorterStemmer.stem`` (NLTK_EXTENSIONS mode, the
    reference's stemmer):

    - the irregular-forms pool is probed with the ORIGINAL-cased word
      (``word in pool``) but returns the lowercased pool entry — so
      'Sky' misses the pool and goes through the rules;
    - words of length <= 2 return the ORIGINAL-cased word, NOT the
      lowercase stem (``return word``, before any lowercasing applies) —
      so 'Is'/'It'/'We' survive as-is and, because stopword removal runs
      AFTER stemming on lowercase stopwords, sentence-initial short
      stopwords are KEPT in the token stream.  That is the reference's
      behavior too (nltk runs the same early return); do not "fix" either
      side alone — tests/test_golden_kernels.py pins it.
    """
    stem = word.lower()
    if word in _IRREGULAR:
        return _IRREGULAR[stem]
    if len(word) <= 2:
        # strings of length 1-2 skip stemming entirely (NLTK behavior,
        # case preserved — see docstring)
        return word
    stem = _step1a(stem)
    stem = _step1b(stem)
    stem = _step1c(stem)
    stem = _step2(stem)
    stem = _step3(stem)
    stem = _step4(stem)
    stem = _step5a(stem)
    stem = _step5b(stem)
    return stem
