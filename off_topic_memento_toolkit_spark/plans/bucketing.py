"""Bucketed tables: co-located joins with NO exchange on either side.

At 100 TB the dominant recurring cost of the dedup/measure pipelines is
re-shuffling the corpus on its join key for every downstream job.  Writing
the signatures/pages tables BUCKETED by that key once (`bucketBy` — Spark's
hash-bucketed table layout) lets every later equi-join or aggregation on the
key run map-side: the plan shows SortMergeJoin with ZERO Exchange operators
(verified by tests/test_bucketing.py).

On a real cluster this is the parquet/Iceberg table layout decision; in this
sandbox the tables land in a local Spark warehouse — same planner behavior.
"""

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table —
    one shuffle now, zero shuffles for every future join/agg on the key."""
    writer = df.write.mode("overwrite").format("parquet") \
               .bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-key bucketed tables — compiles with no Exchange.

    The ``merge`` hint pins the sort-merge strategy: it is what the planner
    picks for two 100 TB sides anyway, and without it a small test table
    would take a BroadcastExchange and never exercise the bucketed layout."""
    return read_bucketed(spark, left_table).hint("merge").join(
        read_bucketed(spark, right_table).hint("merge"), on, how)
