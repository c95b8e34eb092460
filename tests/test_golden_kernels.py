"""Golden-value parity of the pure-Python kernels with the reference's own
test constants (tests/timemap_measures_test.py in /root/reference) — these are
environment-independent regression anchors."""

from datetime import datetime

import pytest

from off_topic_memento_toolkit_spark.functions.seqdist import (
    jaccard, levenshtein, nlevenshtein, sorensen,
)
from off_topic_memento_toolkit_spark.functions.simhash64 import (
    hamming64, simhash_raw_bytes, simhash_tokens,
)
from off_topic_memento_toolkit_spark.functions.textprep import (
    EmptyDocumentError, extract_text, full_tokenize,
)
from off_topic_memento_toolkit_spark.sources.datagen import PANGRAM_WORDS


def _drift_contents():
    """Reconstruct the reference's test_all_mementos_different fixture
    (timemap1): three mementos of cumulative pangram suffixes."""
    mdts = {
        "memento11": datetime(2016, 1, 21, 15, 45, 6),
        "memento12": datetime(2017, 1, 21, 15, 45, 6),
        "memento13": datetime(2018, 1, 21, 15, 45, 12),
    }
    contents = {}
    index = 1
    for urim in ("memento11", "memento12", "memento13"):
        index += 1
        inner = urim
        for j in range(0, index):
            inner += "\n" + " ".join(PANGRAM_WORDS[(j + index):]) + " "
        inner += "\n" + str(mdts[urim])
        contents[urim] = bytes(f"<html><body>{inner}</body></html>", "utf8")
    return contents


CONTENTS = _drift_contents()
TOKENS = {u: full_tokenize(extract_text(c)) for u, c in CONTENTS.items()}


def test_raw_byte_lengths():
    # golden 'individual score' for bytecount: 723 / 1034 / 1331
    assert [len(CONTENTS[u]) for u in ("memento11", "memento12", "memento13")] \
        == [723, 1034, 1331]


def test_wordcounts():
    assert [len(TOKENS[u]) for u in ("memento11", "memento12", "memento13")] \
        == [94, 135, 176]


@pytest.mark.parametrize("urim,expected", [
    ("memento12", {"jaccard": 0.11363636363636365, "levenshtein": 45,
                   "nlevenshtein": 0.3333333333333333,
                   "sorensen": 0.06024096385542166,
                   "bytecount": 0.43015214384508993,
                   "wordcount": 0.43617021276595747}),
    ("memento13", {"jaccard": 0.15555555555555556, "levenshtein": 86,
                   "nlevenshtein": 0.48863636363636365,
                   "sorensen": 0.08433734939759041,
                   "bytecount": 0.8409405255878284,
                   "wordcount": 0.8723404255319149}),
])
def test_drift_golden_scores(urim, expected):
    first_tokens = TOKENS["memento11"]
    tokens = TOKENS[urim]
    assert jaccard(first_tokens, tokens) == pytest.approx(expected["jaccard"])
    assert levenshtein(first_tokens, tokens) == expected["levenshtein"]
    assert nlevenshtein(first_tokens, tokens) == pytest.approx(expected["nlevenshtein"])
    assert sorensen(first_tokens, tokens) == pytest.approx(expected["sorensen"])
    assert len(CONTENTS[urim]) / len(CONTENTS["memento11"]) - 1 \
        == pytest.approx(expected["bytecount"])
    assert len(tokens) / len(first_tokens) - 1 == pytest.approx(expected["wordcount"])


def test_identity_scores():
    tokens = TOKENS["memento11"]
    assert jaccard(tokens, tokens) == 0.0
    assert sorensen(tokens, tokens) == 0.0
    assert levenshtein(tokens, tokens) == 0
    assert nlevenshtein(tokens, tokens) == 0.0
    assert hamming64(simhash_tokens(tokens), simhash_tokens(tokens)) == 0


def test_simhash_goldens():
    mc1 = bytes(f"<html><body>{' '.join(PANGRAM_WORDS[0:20])}</body></html>", "utf8")
    mc2 = bytes(f"<html><body>{' '.join(PANGRAM_WORDS[20:-1])}</body></html>", "utf8")
    assert hamming64(simhash_raw_bytes(mc1), simhash_raw_bytes(mc2)) == 36
    t1 = full_tokenize(extract_text(mc1))
    t2 = full_tokenize(extract_text(mc2))
    assert hamming64(simhash_tokens(t1), simhash_tokens(t2)) == 24


def test_empty_document_raises():
    with pytest.raises(EmptyDocumentError):
        extract_text(b"")
    with pytest.raises(EmptyDocumentError):
        extract_text(None)


def test_empty_body_empty_text():
    assert extract_text(b"<html><body></body></html>") == ""


def test_levenshtein_np_matches_reference_dp():
    """The vectorized scan must equal the classic DP on random token seqs
    (hypothesis-style sweep incl. empty/equal/disjoint edges)."""
    import random

    from off_topic_memento_toolkit_spark.functions.seqdist import (
        levenshtein,
        levenshtein_np,
    )

    rng = random.Random(1234)
    vocab = [f"tok{i}" for i in range(30)]
    for _ in range(500):
        a = [rng.choice(vocab) for _ in range(rng.randint(0, 15))]
        b = [rng.choice(vocab) for _ in range(rng.randint(0, 15))]
        assert levenshtein_np(a, b) == levenshtein(a, b), (a, b)
    assert levenshtein_np([], []) == 0
    assert levenshtein_np(["a"], []) == 1
    assert levenshtein_np([], ["a", "b"]) == 2
    assert levenshtein_np(["a", "b"], ["a", "b"]) == 0


def test_lsi_kernel_analytic_goldens():
    """K11 beyond the identity-1.0 case: hand-derived fixtures with NO SVD
    call in the expectation.

    (1) Full rank (k = rank): projecting onto the complete right-singular
    basis is an isometry of the row space, so LSI cosine == raw count-vector
    cosine — computable with plain arithmetic.  docs over vocab {a, b}:
    d0=(2,1), d1=(1,2), d2=(3,0) →
        sim(d1,d0) = (2+2)/(√5·√5)  = 0.8
        sim(d2,d0) = 6/(√5·3)       = 2/√5
    (2) Rank-1 truncation of an all-positive matrix: every projection is a
    positive scalar multiple of the Perron singular vector → all sims 1.0.
    """
    import math

    from off_topic_memento_toolkit_spark.operators.groupkernels import (
        _lsi_similarity,
    )

    docs = [["a", "a", "b"], ["a", "b", "b"], ["a", "a", "a"]]

    sims = _lsi_similarity(docs, num_topics=2)
    assert abs(sims[0] - 1.0) < 1e-9
    assert abs(sims[1] - 0.8) < 1e-9
    assert abs(sims[2] - 2.0 / math.sqrt(5.0)) < 1e-9

    sims1 = _lsi_similarity(docs, num_topics=1)
    assert all(abs(s - 1.0) < 1e-9 for s in sims1)


def test_porter_short_word_case_preserved():
    """NLTK's PorterStemmer.stem early-returns the ORIGINAL-cased word for
    length<=2 tokens (`return word` runs before any lowercasing applies),
    so capitalized short stopwords like 'Is'/'It'/'We' keep their case and
    — because stopword removal runs AFTER stemming against the lowercase
    stopset (reference quirk P4) — survive into the token stream.  The
    reference inherits exactly this via nltk; pinned here so nobody
    "fixes" one side alone (see porter.porter_stem docstring)."""
    from off_topic_memento_toolkit_spark.functions.porter import porter_stem
    from off_topic_memento_toolkit_spark.functions.textprep import (
        full_tokenize,
    )

    assert porter_stem("Is") == "Is"
    assert porter_stem("It") == "It"
    assert porter_stem("is") == "is"
    # length>2 words lowercase as part of stemming
    assert porter_stem("Stemming") == "stem"

    toks = full_tokenize("Is this on topic? It is. We think so.")
    # capitalized short stopwords kept; lowercase 'is'/'so' and 'this'/'on'
    # dropped by the stopset
    assert "Is" in toks and "It" in toks and "We" in toks
    assert "is" not in toks and "this" not in toks
