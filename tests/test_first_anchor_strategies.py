"""The skew-path 'join' first-anchor strategy must agree exactly with the
default 'window' strategy (same scores, same labels)."""

from off_topic_memento_toolkit_spark.operators.measures import (
    score_timemap_measures,
)
from off_topic_memento_toolkit_spark.sources.datagen import (
    PAGES_SCHEMA,
    pangram_drift_rows,
    overlap_pair_rows,
)

MEASURES = ("bytecount", "wordcount", "jaccard", "sorensen",
            "tfintersection", "levenshtein", "nlevenshtein",
            "raw_simhash", "tf_simhash")


def test_join_strategy_matches_window(spark):
    rows = pangram_drift_rows() + overlap_pair_rows()
    pages = spark.createDataFrame(rows, schema=PAGES_SCHEMA)

    def snapshot(strategy):
        scores = score_timemap_measures(
            pages, measures=MEASURES, first_anchor_strategy=strategy)
        return sorted(
            (r.urit, r.urim, r.measure, r.comparison_score,
             r.topic_status, r.error_msg)
            for r in scores.collect()
        )

    assert snapshot("window") == snapshot("join")


def test_strategies_agree_under_viral_host_skew(spark):
    """End-to-end skew exercise: one host with ~100x the median mementos
    (datagen's skew fixture). Both first-anchor strategies must produce
    identical scores/labels, and the dedup pipeline must resolve the viral
    host's near-identical pages into a dominant cluster."""
    from pyspark.sql import functions as F

    from off_topic_memento_toolkit_spark.plans.pipeline import dedup_pipeline
    from off_topic_memento_toolkit_spark.sources.datagen import generate_pages

    pages = generate_pages(spark, n_urls=6, mementos_per_url=4, skew=True,
                           error_rows=False, dup_rate=0.5)
    counts = {r.url: r["count"] for r in pages.groupBy("url").count().collect()}
    assert max(counts.values()) >= 50 * sorted(counts.values())[len(counts) // 2]

    def snapshot(strategy):
        scores = score_timemap_measures(
            pages, measures=("wordcount", "jaccard", "raw_simhash"),
            first_anchor_strategy=strategy)
        return sorted(
            (r.urit, r.urim, r.measure, r.comparison_score, r.topic_status)
            for r in scores.collect())

    assert snapshot("window") == snapshot("join")

    clusters = dedup_pipeline(pages, min_jaccard=0.9)
    viral_url = max(counts, key=counts.get)
    viral = (clusters.filter(F.col("urim").contains(viral_url))
             .groupBy("component").count().orderBy(F.desc("count")).collect())
    # the viral host's repeated pages collapse into few components, with a
    # dominant one holding many mementos (duplicates clustered, not dropped)
    assert viral[0]["count"] >= 10
