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

_FEATURE_RE = re.compile(r"[\w一-鿌]+", re.UNICODE)
_MASK64 = (1 << 64) - 1


@lru_cache(maxsize=1 << 17)
def _md5_low64(feature: str) -> int:
    return int(hashlib.md5(feature.encode("utf-8")).hexdigest(), 16) & _MASK64


def simhash_features(weighted_features) -> int:
    """``(feature, weight)`` pairs → 64-bit simhash value."""
    v = [0] * 64
    for feature, weight in weighted_features:
        h = _md5_low64(feature)
        for i in range(64):
            if h & (1 << i):
                v[i] += weight
            else:
                v[i] -= weight
    value = 0
    for i in range(64):
        if v[i] >= 0:
            value |= 1 << i
    return value


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
