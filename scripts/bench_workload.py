"""The ONE benchmark workload both scaling harnesses time.

scripts/scaling_run.py (in-process local[N] + heap-isolation probe) and
scripts/submit_scaling_run.py (spark-submit --py-files at N vs 4N
executors) import these builders, so BENCH.md's in-process-vs-submitted
delta compares the identical corpus and stages by construction — a drift
in one harness's copy can no longer masquerade as an engine effect.

Driver-side only: these functions build DataFrames; the package UDFs they
reference reach executors however the harness ships them (PYTHONPATH
in-process, the --py-files zip under spark-submit).
"""

from pyspark.sql import functions as F

MEASURES_10 = ("bytecount", "wordcount", "jaccard", "sorensen",
               "tfintersection", "levenshtein", "nlevenshtein",
               "raw_simhash", "tf_simhash", "cosine")
MEASURES_WARM = ("wordcount", "cosine")


def build_pages(spark, sf_dir: str, replicate: int, rep_start: int = 0,
                dup_fraction: float = 1.0):
    """``replicate`` perturbed copies of the sf documents table as pages —
    distinct urls AND distinct content (exact replicas would make every
    page a clique member and the dedup stage quadratic in the factor);
    64 input partitions, persisted.  ``rep_start`` offsets the replica ids
    (disjoint url/content space for a separate delta batch).

    NOTE on dup structure: a tail marker keeps replicas non-IDENTICAL but
    they remain LSH near-duplicates of each other (5-word shingle jaccard
    ≈ 0.9), so the default corpus puts EVERY page in a ``replicate``-member
    near-dup clique — pair volume ∝ replicate²/2, an adversarial worst
    case ~30x a realistic crawl's.  ``dup_fraction`` < 1 salts some
    replicas with a per-replica token every few words (breaking every
    shingle window → jaccard ≈ 0 across them) — the realistic-dup-rate
    corpus.

    PRECISE ``dup_fraction`` semantics (the published dup-rate probe and
    BENCH.md numbers are keyed to this, so it is documented rather than
    "fixed"): replica ids with ``r % 100 < int(dup_fraction * 100)`` stay
    unsalted, i.e. the knob selects the first ``int(dup_fraction * 100)``
    of every 100 replica ids as clique members — an ABSOLUTE count per
    100 ids, not a fraction of ``replicate``.  With ``replicate`` < 100
    and ``rep_start=0`` the clique size is ``min(int(dup_fraction*100),
    replicate)``: e.g. the dup-rate probe's 0.06 × replicate=32 →
    6-member cliques (6/32 ≈ 19% of pages duplicated, matching its help
    text).  Delta batches whose ``rep_start`` pushes ids past the cutoff
    are fully salted."""
    def one(r):
        docs = spark.read.parquet(sf_dir + "/documents.parquet")
        if r > 0:
            docs = docs.withColumn(
                "text",
                F.concat(F.col("text"), F.lit(f" replica marker {r} "),
                         (F.col("doc_id") % 97).cast("string")))
        if r % 100 >= int(dup_fraction * 100):
            # per-replica salt token inside every 4-word window: no
            # 5-shingle survives unsalted, so this replica near-dups
            # with nothing
            docs = docs.withColumn(
                "text",
                F.regexp_replace(
                    F.col("text"), r"((\S+\s+){4})", f"$1uniq{r}salt "))
        return docs.select(
            F.concat(F.lit(f"http://rep{r}.docs.example/site"),
                     (F.col("doc_id") % 50).cast("string")).alias("url"),
            F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id") * 3600)
             .alias("warc_ts"),
            F.encode(F.concat(F.lit("<html><body><p>"), F.col("text"),
                              F.lit("</p></body></html>")),
                     "utf-8").alias("html"),
            F.lit(None).cast("string").alias("text"),
            F.col("lang"),
        )

    pages = one(rep_start)
    for r in range(rep_start + 1, rep_start + replicate):
        pages = pages.unionByName(one(r))
    return pages.repartition(64).persist()


def dedup_candidates(pages):
    """The timed LSH dedup stage: enrichment → MinHash bands → candidate
    pairs (the minhash_candidate_pairs one-shuffle collect+expand plan)."""
    from off_topic_memento_toolkit_spark.operators.lsh import (
        minhash_candidate_pairs,
    )
    from off_topic_memento_toolkit_spark.operators.timeline import (
        prepare_pages,
    )

    docs = prepare_pages(pages, need_tf_simhash=False).select(
        F.xxhash64("urim").alias("nid"), "tokens")
    return minhash_candidate_pairs(docs, id_col="nid", tokens_col="tokens")


def measures_suite(pages, measures=MEASURES_10):
    from off_topic_memento_toolkit_spark.operators.measures import (
        score_timemap_measures,
    )

    return score_timemap_measures(pages, measures=measures)


def noop_write(df):
    df.write.format("noop").mode("overwrite").save()
