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
