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
        # verify to rule out hash collisions — LAZILY, comparing one
        # window pair at a time with early exit.  Never materialize the
        # window set: on repetitive text (a = "ab"*500k) every same-parity
        # window shares one hash, and building {b[j:j+L] ...} would hash
        # O(n) windows of O(L) chars (O(n·L) work) before any compare; the
        # lazy loop returns on the FIRST compare there (periodic windows
        # with equal hashes are equal strings).  The quadratic corner now
        # needs engineered 61-bit rolling-hash collisions, not mere
        # repetition — across-string hash equality without string equality
        # has probability ~ n·m / 2^61 per probe.
        for i in positions_a:
            sub_a = a[i:i + length]
            for j in positions_b:
                if sub_a == b[j:j + length]:
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


def prune_docs_to_pair_endpoints(pairs: DataFrame, docs: DataFrame,
                                 id_col: str) -> DataFrame:
    """Restrict ``docs`` to the pair ENDPOINTS with a broadcast semi-join:
    endpoints are candidate-sized (≤ 2·|pairs|, tiny vs the corpus), so the
    corpus payload scan stays map-only instead of shuffling every token
    array / text blob through the verify joins.

    Call it at the PIPELINE layer, where ``pairs`` is a materialized stage
    (dedup_pipeline and the incremental path both do) — the prune traverses
    ``pairs`` a second time, which is a cheap re-read of a checkpointed
    stage but would re-run the whole banding-UDF lineage on a raw
    composition, which is why verified_pairs_* don't apply it themselves."""
    endpoints = F.broadcast(
        pairs.select(F.col("id_a").alias(id_col))
        .unionByName(pairs.select(F.col("id_b").alias(id_col)))
        .distinct())
    return docs.join(endpoints, id_col, "left_semi")


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
    # empty ∪ empty = NOT verifiable, score 0.0 (reject) — matching the LCS
    # verifier's shorter==0 → 0.0.  Scoring it 1.0 would auto-confirm pairs
    # of unparseable/token-less pages arriving from the raw-byte simhash
    # channel (which, unlike minhash banding, can emit empty-token docs)
    # without any content evidence.
    jaccard = (
        F.when(a.isNull() | b.isNull(), F.lit(None).cast("double"))
        .when(union == 0, F.lit(0.0))
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
