"""64-bit SimHash with the exact semantics of the ``simhash`` PyPI library the
reference uses (otmt/timemap_measures.py:21,235-272,
otmt/metadata_calcluations.py:20-67):

- feature extraction from text: lowercase, concatenate all matches of
  ``[\\w\\u4e00-\\u9fcc]+``, slide width-4 character shingles
  (``max(len-3, 1)`` windows), weight = occurrence count;
- feature hash: low 64 bits of ``int(md5(feature).hexdigest(), 16)``;
- bit i of the result is 1 iff the weighted vote ``v[i] >= 0``
  (an empty feature set therefore yields ``0xFFFF_FFFF_FFFF_FFFF``);
- distance = Hamming weight of XOR.

The reference's raw mode hashes ``str(raw_bytes)`` — the ``"b'...'"`` repr
string (otmt/timemap_measures.py:240-243); ``simhash_raw_bytes`` preserves
that quirk.  Values are returned as Python ints in [0, 2^64); store into Spark
``LongType`` via :func:`to_signed64` (two's-complement reinterpretation).
"""

import hashlib
import re
from collections import Counter
from functools import lru_cache

import numpy as np

_FEATURE_RE = re.compile(r"[\w一-鿌]+", re.UNICODE)
_MASK64 = (1 << 64) - 1
_BIT_INDEX = np.arange(64, dtype=np.uint64)


@lru_cache(maxsize=1 << 17)
def _md5_low64(feature: str) -> int:
    return int(hashlib.md5(feature.encode("utf-8")).hexdigest(), 16) & _MASK64


def simhash_features(weighted_features) -> int:
    """``(feature, weight)`` pairs → 64-bit simhash value.

    Numerically identical to the scalar algorithm (bit i set iff the weighted
    vote v[i] >= 0); the per-bit vote is vectorized — the scalar loop is
    64 Python ops per feature, which dominates document hashing time.
    """
    items = list(weighted_features)
    if not items:
        return _MASK64  # empty feature set: all v[i] == 0 → all bits set
    hashes = np.fromiter(
        (_md5_low64(f) for f, _ in items), dtype=np.uint64, count=len(items))
    weights = np.fromiter(
        (w for _, w in items), dtype=np.int64, count=len(items))
    bits = ((hashes[:, None] >> _BIT_INDEX[None, :]) & np.uint64(1)).astype(np.int64)
    votes = ((2 * bits - 1) * weights[:, None]).sum(axis=0)
    value_bits = (votes >= 0).astype(np.uint64)
    return int((value_bits << _BIT_INDEX).sum(dtype=np.uint64))


def simhash_text(content: str) -> int:
    """Text mode: lowercase → regex-join → width-4 shingles → counts."""
    content = content.lower()
    content = "".join(_FEATURE_RE.findall(content))
    shingles = [content[i:i + 4] for i in range(max(len(content) - 3, 1))]
    return simhash_features(Counter(shingles).items())


def simhash_raw_bytes(raw) -> int:
    """Raw mode incl. the reference's str(bytes) repr quirk."""
    if isinstance(raw, (bytes, bytearray)):
        raw = str(bytes(raw))
    return simhash_text(raw)


def simhash_tokens(tokens) -> int:
    """Token-list mode (tf_simhash): each token a feature, weight=count."""
    return simhash_features(Counter(tokens).items())


def hamming64(a: int, b: int) -> int:
    return ((a ^ b) & _MASK64).bit_count()


def to_signed64(value: int) -> int:
    """Reinterpret an unsigned 64-bit int as signed (Spark LongType)."""
    value &= _MASK64
    return value - (1 << 64) if value >= (1 << 63) else value


def from_signed64(value: int) -> int:
    return value & _MASK64
