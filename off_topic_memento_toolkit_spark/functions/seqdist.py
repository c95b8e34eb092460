"""Token-sequence edit distances with the semantics of the ``distance``
library the reference uses (otmt/timemap_measures.py:10,428-472):

- ``levenshtein(a, b)``   — classic edit distance over sequence *elements*
  (tokens, not characters; Spark's builtin ``levenshtein()`` is char-level and
  NOT equivalent);
- ``nlevenshtein(a, b)``  — method 1: distance / max(len(a), len(b)),
  0.0 when both empty;
- ``jaccard(a, b)`` / ``sorensen(a, b)`` — set-based distances.
"""

def levenshtein(a, b) -> int:
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    previous = list(range(lb + 1))
    for i in range(1, la + 1):
        current = [i] + [0] * lb
        ai = a[i - 1]
        for j in range(1, lb + 1):
            current[j] = min(
                previous[j] + 1,                      # deletion
                current[j - 1] + 1,                   # insertion
                previous[j - 1] + (ai != b[j - 1]),   # substitution
            )
        previous = current
    return previous[lb]


def levenshtein_np(a, b) -> int:
    """Exact Levenshtein with each DP row vectorized in numpy.

    The insertion recurrence cur[j] = min(tmp[j], cur[j-1]+1) is a prefix
    scan: cur[j] = j + min_{k<=j}(arr[k] - k) with arr = [row_start, tmp...],
    computed by ``np.minimum.accumulate`` — O(n·m) cells but ~m-wide numpy
    ops per row instead of a Python inner loop (~50x on 200-token docs).
    Equality with :func:`levenshtein` is property-tested."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    import numpy as np

    if la > lb:  # iterate the shorter side: fewer Python rows, wider vectors
        a, b, la, lb = b, a, lb, la
    codes: dict = {}
    enc = lambda seq: np.fromiter(  # noqa: E731
        (codes.setdefault(t, len(codes)) for t in seq),
        dtype=np.int32, count=len(seq))
    A, B = enc(a), enc(b)
    idx = np.arange(lb + 1, dtype=np.int32)
    prev = idx.copy()
    arr = np.empty(lb + 1, dtype=np.int32)
    for i in range(1, la + 1):
        np.minimum(prev[:-1] + (B != A[i - 1]), prev[1:] + 1, out=arr[1:])
        arr[0] = i
        np.subtract(arr, idx, out=arr)
        np.minimum.accumulate(arr, out=arr)
        np.add(arr, idx, out=arr)
        prev, arr = arr, prev
    return int(prev[lb])


def nlevenshtein(a, b) -> float:
    """distance.nlevenshtein method 1: d / max(len)."""
    longest = max(len(a), len(b))
    if longest == 0:
        return 0.0
    return levenshtein(a, b) / longest


def jaccard(a, b) -> float:
    sa, sb = set(a), set(b)
    union = sa | sb
    if not union:
        return 0.0
    return 1.0 - len(sa & sb) / len(union)


def sorensen(a, b) -> float:
    sa, sb = set(a), set(b)
    total = len(sa) + len(sb)
    if total == 0:
        return 0.0
    return 1.0 - (2.0 * len(sa & sb)) / total
