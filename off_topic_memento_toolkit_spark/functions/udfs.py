"""Arrow-batched pandas UDFs wrapping the pure-Python kernels.

These are the ONLY places Python touches row data; everything else in the
engine is JVM-side column algebra.  Each UDF is vectorized at the transfer
layer (Arrow batches) and the kernels are memoized (md5/stem caches), which is
the practical optimum for inherently per-document algorithms like simhash.

Null/empty contracts (mirroring the reference's error semantics,
otmt/timemap_measures.py:157-176, otmt/collectionmodel.py:465-466):
- ``extract_text_udf`` maps null/empty html → null (callers emit error rows);
- ``tokenize_udf`` maps null text → null, "" → empty array;
- simhash UDFs map null → null.
"""

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .minhash import (
    DEFAULT_BANDS,
    DEFAULT_NUM_PERM,
    DEFAULT_SHINGLE_WORDS,
    band_hashes,
    minhash_signature,
)
from .seqdist import levenshtein_np as _levenshtein
from .simhash64 import (
    simhash_raw_bytes,
    simhash_tokens,
    to_signed64,
)
from .textprep import EmptyDocumentError, extract_text, full_tokenize


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    def _extract(value):
        if value is None:
            return None
        try:
            return extract_text(value)
        except EmptyDocumentError:
            return None

    return html.map(_extract)


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda value: None if value is None else full_tokenize(value))


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_lower_udf(text: pd.Series) -> pd.Series:
    """Cosine-path tokens: sklearn's TfidfVectorizer lowercases before the
    tokenizer (otmt/timemap_measures.py:680-681)."""
    return text.map(
        lambda value: None if value is None else full_tokenize(value.lower())
    )


@F.pandas_udf(T.LongType())
def simhash_raw_udf(html: pd.Series) -> pd.Series:
    """Raw-mode simhash incl. the reference's str(bytes) repr quirk
    (otmt/timemap_measures.py:240-245, otmt/metadata_calcluations.py:56-58)."""
    return html.map(
        lambda value: None if value is None else to_signed64(simhash_raw_bytes(value))
    )


@F.pandas_udf(T.LongType())
def simhash_tokens_udf(tokens: pd.Series) -> pd.Series:
    return tokens.map(
        lambda value: None if value is None else to_signed64(simhash_tokens(list(value)))
    )


@F.pandas_udf(T.IntegerType())
def token_levenshtein_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    def _lev(pair):
        left, right = pair
        if left is None or right is None:
            return None
        return _levenshtein(list(left), list(right))

    return pd.Series(map(_lev, zip(a, b)))


def make_minhash_bands_udf(
    num_perm: int = DEFAULT_NUM_PERM,
    shingle_words: int = DEFAULT_SHINGLE_WORDS,
    bands: int = DEFAULT_BANDS,
    seed: int = 1234567,
):
    """array<long> of ``bands`` band-hashes per document (LSH keys).

    Empty token lists yield NULL (not the EMPTY_SLOT sentinel bands): a
    downstream ``posexplode`` then drops those rows by itself, so band-table
    builders need no post-UDF null/size filter — a filter on a UDF output is
    exactly what the optimizer pushes below the enrichment exchange,
    re-evaluating the whole extract→tokenize→minhash chain a second time on
    the narrow pre-shuffle side (guide §4.4 duplication; measured 2.9 s of
    single-task Python per bench run before this change)."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def minhash_bands_udf(tokens: pd.Series) -> pd.Series:
        def _bands(value):
            if value is None or len(value) == 0:
                return None
            signature = minhash_signature(
                list(value), num_perm=num_perm,
                shingle_words=shingle_words, seed=seed,
            )
            return band_hashes(signature, bands)

        return tokens.map(_bands)

    return minhash_bands_udf
