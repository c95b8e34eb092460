"""Per-timeline group kernels: TF-IDF cosine and LSI similarity-to-first.

These are the two measures whose fit spans the WHOLE timeline (vocabulary /
IDF / SVD over all documents of a url), so they run as grouped-map pandas
kernels over ``groupBy(urit)`` (``applyInPandas``) — the one place the
reference's buffering design (otmt/timemap_measures.py:628,647,792,814) is
semantically required.

Numerics:
- cosine reproduces sklearn ``TfidfVectorizer(tokenizer=full_tokenize)`` +
  ``cosine_similarity`` exactly (smooth idf ``ln((1+n)/(1+df))+1``, raw tf,
  l2 norm, preprocessor lowercasing) — otmt/timemap_measures.py:680-711;
- gensim_lsi projects the bag-of-words count matrix onto its top-k singular
  subspace (exact SVD) and takes cosine to the first document — cosine in the
  top-k subspace is basis-invariant, so this matches gensim's LsiModel +
  MatrixSimilarity semantics deterministically;
- gensim_lda is EXPERIMENTAL and non-deterministic in the reference's own
  tests (tests/timemap_measures_test.py:35-41) — implemented as a seeded,
  deterministic collapsed-variational approximation, parity excluded.

Memory: a group holds one timeline. For pathological hosts, cap with
``max_docs_per_timeline`` (scores beyond the cap get an error row rather than
a silently-wrong fit).
"""

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.textprep import full_tokenize
from .measures_constants import (
    FIRST_BP_ERROR_MSG,
    FIRST_EMPTY_MSG,
    GROUP_SCORES_SCHEMA,
)

_SCHEMA = GROUP_SCORES_SCHEMA


def _rows(urit, urims, measure, scores=None, error=None):
    n = len(urims)
    return pd.DataFrame({
        "urit": [urit] * n,
        "urim": list(urims),
        "measuretype": ["timemap measures"] * n,
        "measure": [measure] * n,
        "comparison_score": list(scores) if scores is not None else [None] * n,
        "tokenized": [True] * n,
        "stemmed": [True] * n,
        "removed_boilerplate": [True] * n,
        "error_msg": [error] * n,
    })


def _tfidf_cosine(token_lists):
    """sklearn-formula TF-IDF + cosine of row 0 vs all rows."""
    vocab = sorted({t for tokens in token_lists for t in tokens})
    if not vocab:
        raise ValueError("empty vocabulary")
    index = {t: i for i, t in enumerate(vocab)}
    n = len(token_lists)
    X = np.zeros((n, len(vocab)), dtype=np.float64)
    for row, tokens in enumerate(token_lists):
        for t in tokens:
            X[row, index[t]] += 1.0
    df = (X > 0).sum(axis=0)
    idf = np.log((1.0 + n) / (1.0 + df)) + 1.0
    X *= idf
    norms = np.linalg.norm(X, axis=1)
    norms[norms == 0] = 1.0
    X /= norms[:, None]
    return X @ X[0]


def _lsi_similarity(token_lists, num_topics):
    """Exact truncated-SVD projection; cosine of each doc to doc 0."""
    vocab = sorted({t for tokens in token_lists for t in tokens})
    if not vocab:
        raise ValueError("empty vocabulary")
    index = {t: i for i, t in enumerate(vocab)}
    n = len(token_lists)
    X = np.zeros((n, len(vocab)), dtype=np.float64)
    for row, tokens in enumerate(token_lists):
        for t in tokens:
            X[row, index[t]] += 1.0
    k = min(num_topics, min(X.shape))
    # exact SVD; projection onto top-k right-singular basis
    _, _, vt = np.linalg.svd(X, full_matrices=False)
    proj = X @ vt[:k].T
    norms = np.linalg.norm(proj, axis=1)
    norms[norms == 0] = 1.0
    unit = proj / norms[:, None]
    return unit @ unit[0]


def _lda_similarity(token_lists, num_topics, seed=42, iterations=50):
    """Deterministic seeded LDA-ish topic mixture + cosine to doc 0.
    Parity with gensim is explicitly out of scope (non-deterministic there)."""
    vocab = sorted({t for tokens in token_lists for t in tokens})
    if not vocab:
        raise ValueError("empty vocabulary")
    index = {t: i for i, t in enumerate(vocab)}
    n, v = len(token_lists), len(vocab)
    X = np.zeros((n, v), dtype=np.float64)
    for row, tokens in enumerate(token_lists):
        for t in tokens:
            X[row, index[t]] += 1.0
    rng = np.random.RandomState(seed)
    phi = rng.dirichlet(np.ones(v), size=num_topics)          # topic-word
    theta = np.full((n, num_topics), 1.0 / num_topics)        # doc-topic
    for _ in range(iterations):
        # E-step: responsibilities; M-step: multinomial updates (EM for
        # a mixture-of-unigrams — a deterministic stand-in for LDA)
        resp = theta[:, :, None] * phi[None, :, :]            # n x k x v
        resp_sum = resp.sum(axis=1, keepdims=True)
        resp_sum[resp_sum == 0] = 1.0
        resp /= resp_sum
        weighted = resp * X[:, None, :]
        theta = weighted.sum(axis=2) + 1e-9
        theta /= theta.sum(axis=1, keepdims=True)
        phi = weighted.sum(axis=0) + 1e-9
        phi /= phi.sum(axis=1, keepdims=True)
    norms = np.linalg.norm(theta, axis=1)
    norms[norms == 0] = 1.0
    unit = theta / norms[:, None]
    return unit @ unit[0]


def make_group_kernel(measures, num_topics_overrides=None, max_docs_per_timeline=None):
    measures = list(measures)
    overrides = num_topics_overrides or {}

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["warc_ts", "urim"], kind="mergesort")
        urit = pdf["urit"].iloc[0]
        out = []
        for measure in measures:
            texts = pdf["text"]
            urims = pdf["urim"].tolist()
            first_text = texts.iloc[0]
            if first_text is None:
                out.append(_rows(urit, urims, measure, error=FIRST_BP_ERROR_MSG))
                continue
            if len(first_text) == 0:
                out.append(_rows(urit, urims, measure, error=FIRST_EMPTY_MSG))
                continue

            ok_mask = texts.notna()
            if max_docs_per_timeline and ok_mask.sum() > max_docs_per_timeline:
                keep = texts.notna().cumsum() <= max_docs_per_timeline
                ok_mask &= keep
            ok_urims = pdf.loc[ok_mask, "urim"].tolist()
            bad_urims = pdf.loc[~ok_mask, "urim"].tolist()

            if measure == "cosine":
                # TfidfVectorizer lowercases before tokenizing
                docs = [full_tokenize(t.lower()) for t in texts[ok_mask]]
            else:
                docs = [full_tokenize(t) for t in texts[ok_mask]]

            try:
                if measure == "cosine":
                    sims = _tfidf_cosine(docs)
                elif measure == "gensim_lsi":
                    sims = _lsi_similarity(docs, overrides.get(measure, 10))
                elif measure == "gensim_lda":
                    sims = _lda_similarity(docs, overrides.get(measure, 2))
                else:
                    raise ValueError(measure)
            except ValueError as exc:
                out.append(_rows(urit, urims, measure, error=repr(exc)))
                continue

            out.append(_rows(urit, ok_urims, measure, scores=[float(s) for s in sims]))
            if bad_urims:
                out.append(_rows(
                    urit, bad_urims, measure,
                    error="Boilerplate could not be removed from memento",
                ))
        return pd.concat(out, ignore_index=True) if out else _rows(urit, [], "cosine")

    return kernel


def score_group_measures(
    enriched: DataFrame,
    measures,
    num_topics_overrides=None,
    max_docs_per_timeline=None,
) -> DataFrame:
    """Run the grouped kernels; input must carry urit, urim, warc_ts, text."""
    kernel = make_group_kernel(measures, num_topics_overrides, max_docs_per_timeline)
    return (
        enriched.select("urit", "urim", "warc_ts", "text")
        .groupBy("urit")
        .applyInPandas(kernel, schema=_SCHEMA)
    )
