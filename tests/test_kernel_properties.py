"""Hypothesis property tests for the pure-Python/numpy kernels (no Spark).

These pin algebraic invariants rather than golden values: metric axioms for
the sequence distances, equivalence of the vectorized Levenshtein with the
classic DP, determinism + banding structure for MinHash, and bit-width
contracts for SimHash."""

from hypothesis import given, settings
from hypothesis import strategies as st

from off_topic_memento_toolkit_spark.functions.minhash import (
    DEFAULT_NUM_PERM,
    band_hashes,
    estimated_jaccard,
    minhash_signature,
    shingle_hashes,
)
from off_topic_memento_toolkit_spark.functions.seqdist import (
    jaccard,
    levenshtein,
    levenshtein_np,
    nlevenshtein,
    sorensen,
)
from off_topic_memento_toolkit_spark.functions.simhash64 import (
    simhash_tokens,
    to_signed64,
)

token = st.text(alphabet="abcdefg", min_size=1, max_size=4)
tokens = st.lists(token, max_size=14)


@settings(max_examples=300, deadline=None)
@given(tokens, tokens)
def test_levenshtein_np_equals_dp(a, b):
    assert levenshtein_np(a, b) == levenshtein(a, b)


@settings(max_examples=200, deadline=None)
@given(tokens, tokens)
def test_levenshtein_metric_axioms(a, b):
    d = levenshtein_np(a, b)
    assert d == levenshtein_np(b, a)                       # symmetry
    assert (d == 0) == (a == b)                            # identity
    assert d <= max(len(a), len(b))                        # upper bound
    assert d >= abs(len(a) - len(b))                       # lower bound
    assert 0.0 <= nlevenshtein(a, b) <= 1.0


@settings(max_examples=200, deadline=None)
@given(tokens, tokens)
def test_set_distances_bounded_and_symmetric(a, b):
    for fn in (jaccard, sorensen):
        d = fn(a, b)
        assert 0.0 <= d <= 1.0
        assert d == fn(b, a)
    if set(a) == set(b):
        assert jaccard(a, b) == 0.0 and sorensen(a, b) == 0.0


@settings(max_examples=100, deadline=None)
@given(st.lists(token, min_size=1, max_size=20))
def test_minhash_deterministic_and_banded(toks):
    sig1 = minhash_signature(toks)
    sig2 = minhash_signature(toks)
    assert (sig1 == sig2).all()
    assert len(sig1) == DEFAULT_NUM_PERM
    assert estimated_jaccard(sig1, sig2) == 1.0
    bands = band_hashes(sig1)
    assert bands == band_hashes(sig2)
    assert len(bands) == 32
    # permuting the token order changes shingles but stays deterministic
    rev = minhash_signature(list(reversed(toks)))
    assert (rev == minhash_signature(list(reversed(toks)))).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(token, min_size=1, max_size=20))
def test_shingles_distinct_and_reproducible(toks):
    h = shingle_hashes(toks)
    assert len(set(h.tolist())) == len(h)      # np.unique contract
    assert (h == shingle_hashes(toks)).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(token, min_size=1, max_size=15))
def test_simhash_signed64_range(toks):
    value = to_signed64(simhash_tokens(toks))
    assert -(1 << 63) <= value < (1 << 63)
    assert value == to_signed64(simhash_tokens(toks))      # deterministic
