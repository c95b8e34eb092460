"""Candidate-pair verification kernels (the 'verify' stage between LSH and
connected components).

- :func:`verified_pairs_jaccard` — exact token-set Jaccard on candidate pairs
  (the classic MinHash confirm step).
- :func:`verified_pairs_lcs` — longest-common-substring ratio via rolling-hash
  + binary search (O((n+m)·log n) per pair), the suffix-array-equivalent
  check the north_rule names; a pair passes when the LCS covers at least
  ``min_ratio`` of the shorter document.

Both run as Arrow-batched pandas UDFs over the joined pair table; the join
that materializes (text_a, text_b) is an equi-join on id and is the dominant
shuffle — candidates are a tiny fraction of the corpus, so this is cheap
relative to the scan.
"""

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MOD = (1 << 61) - 1
_BASE = 1_000_003


def _common_substring_of_length(a: str, b: str, length: int) -> bool:
    if length == 0:
        return True
    if length > len(a) or length > len(b):
        return False
    power = pow(_BASE, length - 1, _MOD)

    def rolling(s):
        seen = {}
        h = 0
        for i, ch in enumerate(s):
            h = (h * _BASE + ord(ch)) % _MOD
            if i >= length:
                h = (h - ord(s[i - length]) * power * _BASE) % _MOD
            if i >= length - 1:
                seen.setdefault(h, []).append(i - length + 1)
        return seen

    ha = rolling(a)
    hb = rolling(b)
    for h, positions_a in ha.items():
        positions_b = hb.get(h)
        if not positions_b:
            continue
        # verify to rule out hash collisions
        subs_b = {b[j:j + length] for j in positions_b}
        for i in positions_a:
            if a[i:i + length] in subs_b:
                return True
    return False


def longest_common_substring_length(a: str, b: str) -> int:
    """Binary search over rolling-hash matches — O((n+m) log min(n, m))."""
    low, high = 0, min(len(a), len(b))
    while low < high:
        mid = (low + high + 1) // 2
        if _common_substring_of_length(a, b, mid):
            low = mid
        else:
            high = mid - 1
    return low


@F.pandas_udf(T.DoubleType())
def lcs_ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    def _ratio(pair):
        left, right = pair
        if left is None or right is None:
            return None
        shorter = min(len(left), len(right))
        if shorter == 0:
            return 0.0
        return longest_common_substring_length(left, right) / shorter

    return pd.Series(map(_ratio, zip(a, b)))


def _attach_pair_payload(pairs: DataFrame, docs: DataFrame,
                         id_col: str, payload_col: str) -> DataFrame:
    left = docs.select(F.col(id_col).alias("id_a"),
                       F.col(payload_col).alias("_payload_a"))
    right = docs.select(F.col(id_col).alias("id_b"),
                        F.col(payload_col).alias("_payload_b"))
    return pairs.join(left, "id_a").join(right, "id_b")


def verified_pairs_jaccard(
    pairs: DataFrame, docs: DataFrame,
    id_col: str = "urim", tokens_col: str = "tokens",
    min_jaccard: float = 0.8,
) -> DataFrame:
    """Token-set (or shingle-set, via ``tokens_col``) Jaccard verification —
    pure JVM array algebra, no Python in the verify hot path; stays inside
    whole-stage codegen between the two payload joins."""
    joined = _attach_pair_payload(pairs, docs, id_col, tokens_col)
    a, b = F.col("_payload_a"), F.col("_payload_b")
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    jaccard = (
        F.when(a.isNull() | b.isNull(), F.lit(None).cast("double"))
        .when(union == 0, F.lit(1.0))
        .otherwise(inter.cast("double") / union)
    )
    return (
        joined.withColumn("jaccard_sim", jaccard)
        .filter(F.col("jaccard_sim") >= min_jaccard)
        .select("id_a", "id_b", "jaccard_sim")
    )


def verified_pairs_lcs(
    pairs: DataFrame, docs: DataFrame,
    id_col: str = "urim", text_col: str = "text",
    min_ratio: float = 0.6,
) -> DataFrame:
    joined = _attach_pair_payload(pairs, docs, id_col, text_col)
    return (
        joined.withColumn("lcs_ratio", lcs_ratio_udf("_payload_a", "_payload_b"))
        .filter(F.col("lcs_ratio") >= min_ratio)
        .select("id_a", "id_b", "lcs_ratio")
    )
