"""MinHash signatures over word shingles + LSH banding parameters.

North-rule addition (no reference counterpart; the dedup parity target is the
reference's D1-D3 cluster assignments, bin/exclude_duplicates +
bin/cluster_by_simhash).  Standard construction (Broder 1997):

- shingles: ``k``-word windows over the stemmed token stream, joined by a
  single space (distinct set per document);
- ``num_perm`` universal-hash permutations ``(a*x + b) mod (2^61-1)``, with
  (a, b) derived deterministically from sha256(seed, i) — no wallclock or RNG
  at call time, so signatures are reproducible across runs/executors;
- signature[i] = min over shingles of permutation i;
- LSH: split the signature into ``bands`` bands of ``rows`` rows; documents
  sharing any (band_index, band_hash) bucket are candidate pairs.

All per-batch work is vectorized numpy (invoked from Arrow-batched pandas
UDFs).  The a*x multiply wraps mod 2^64 before the Mersenne reduction — the
map stays deterministic and well-distributed, which is what LSH needs.
"""

import hashlib
import struct

import numpy as np

MERSENNE61 = np.uint64((1 << 61) - 1)
DEFAULT_NUM_PERM = 128
DEFAULT_SHINGLE_WORDS = 5
DEFAULT_BANDS = 32
EMPTY_SLOT = np.uint64((1 << 61) - 1)  # sentinel signature for empty docs


def _seeded_coefficients(num_perm: int, seed: int):
    a = np.empty(num_perm, dtype=np.uint64)
    b = np.empty(num_perm, dtype=np.uint64)
    for i in range(num_perm):
        digest = hashlib.sha256(f"minhash-{seed}-{i}".encode()).digest()
        ai, bi = struct.unpack("<QQ", digest[:16])
        a[i] = (ai % ((1 << 61) - 2)) + 1  # a != 0
        b[i] = bi % ((1 << 61) - 1)
    return a, b


_COEFF_CACHE = {}


def permutation_coefficients(num_perm: int = DEFAULT_NUM_PERM, seed: int = 1234567):
    key = (num_perm, seed)
    if key not in _COEFF_CACHE:
        _COEFF_CACHE[key] = _seeded_coefficients(num_perm, seed)
    return _COEFF_CACHE[key]


_TOKEN_HASH_CACHE: dict = {}
_TOKEN_CACHE_CAP = 1 << 20  # web vocab is unbounded; a worker's cache isn't
_POLY = np.uint64(0x9E3779B97F4A7C15)  # odd multiplier (golden-ratio mix)


def _token_hash(token: str) -> np.uint64:
    """md5-derived 64-bit token hash, memoized per worker — vocabulary is
    Zipfian, so the hit rate stays near 1; the cache is CAPPED (clear-on-full)
    because the long tail (urls, hex ids) is unbounded at corpus scale and a
    long-lived Python worker must not grow without limit."""
    h = _TOKEN_HASH_CACHE.get(token)
    if h is None:
        if len(_TOKEN_HASH_CACHE) >= _TOKEN_CACHE_CAP:
            _TOKEN_HASH_CACHE.clear()  # Zipf head refills within one batch
        h = struct.unpack(
            "<Q", hashlib.md5(token.encode("utf-8")).digest()[:8])[0]
        _TOKEN_HASH_CACHE[token] = h
    return h


def shingle_hashes(tokens, shingle_words: int = DEFAULT_SHINGLE_WORDS) -> np.ndarray:
    """64-bit hashes of the distinct ``shingle_words``-token windows.

    One md5 per DISTINCT TOKEN (memoized), then the window hash is a
    vectorized polynomial over the token hashes (wrap-mod-2^64) — the
    previous shape (one md5 per shingle string) spent the whole kernel in
    hashlib.  Collision-merging two distinct shingles happens at 2^-64 and
    only costs one candidate pair, never a missed one... per band."""
    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    t = np.fromiter((_token_hash(tok) for tok in tokens),
                    dtype=np.uint64, count=n)
    w = min(shingle_words, n)
    with np.errstate(over="ignore"):
        out = np.zeros(n - w + 1, dtype=np.uint64)
        for k in range(w):
            out = out * _POLY + t[k:n - w + 1 + k]
    return np.unique(out)


def minhash_signature(
    tokens,
    num_perm: int = DEFAULT_NUM_PERM,
    shingle_words: int = DEFAULT_SHINGLE_WORDS,
    seed: int = 1234567,
) -> np.ndarray:
    """uint64[num_perm] signature; EMPTY_SLOT-filled for empty documents."""
    hashes = shingle_hashes(tokens, shingle_words)
    if hashes.size == 0:
        return np.full(num_perm, EMPTY_SLOT, dtype=np.uint64)
    a, b = permutation_coefficients(num_perm, seed)
    with np.errstate(over="ignore"):
        # (num_shingles, num_perm): wrap-mod-2^64 multiply, then Mersenne mod
        products = (hashes[:, None] * a[None, :] + b[None, :]) % MERSENNE61
    return products.min(axis=0)


def band_hashes(signature: np.ndarray, bands: int = DEFAULT_BANDS) -> list:
    """Hash each of ``bands`` equal-width bands of the signature (int64 list,
    signed for Spark LongType)."""
    rows = len(signature) // bands
    out = []
    for band in range(bands):
        chunk = np.ascontiguousarray(signature[band * rows:(band + 1) * rows])
        digest = hashlib.md5(chunk.tobytes()).digest()
        out.append(struct.unpack("<q", digest[:8])[0])
    return out


def estimated_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))
