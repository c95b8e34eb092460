"""Bucketed-table co-located joins: the shuffle is paid once at write time,
then joins/aggs on the bucket key compile with NO Exchange."""

import pytest
from pyspark.sql import functions as F

from off_topic_memento_toolkit_spark.plans.bucketing import (
    colocated_join,
    read_bucketed,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 37).alias("grp"),
        F.md5(F.col("id").cast("string")).alias("fingerprint"),
    )
    sigs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.xxhash64(F.col("id").cast("string")).alias("simhash"),
    )
    write_bucketed(docs, "b_docs", "doc_id", num_buckets=8)
    write_bucketed(sigs, "b_sigs", "doc_id", num_buckets=8)
    yield "b_docs", "b_sigs"
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_sigs")


def test_colocated_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = colocated_join(spark, left, right, on="doc_id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert joined.count() == 2000
    # correctness of the join itself
    row = joined.filter(F.col("doc_id") == 7).collect()[0]
    assert row.grp == 7 % 37


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_tables):
    left, _ = bucketed_tables
    agg = read_bucketed(spark, left).groupBy("doc_id").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert agg.count() == 2000
