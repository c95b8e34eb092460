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
