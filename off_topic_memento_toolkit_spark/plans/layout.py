"""Physical layout of the pages table (SURVEY §4.3): time-partitioned so
scans prune, optionally bucketed so recurring url-keyed joins co-locate.

The design target is the Iceberg spec ``days(warc_ts) + bucket(N, url)``;
without the runtime jar the same pruning/co-location is realized with
parquet partition directories (``crawl_date=...``) and the saveAsTable
bucketing layer (plans/bucketing.py).  Readers get partition pruning for
free from Catalyst for predicates on the PARTITION column ``crawl_date``:
they reach the file listing, so a day-slice query of a 100 TB table touches
one day's files, not the table.  (Plain parquet has no transform metadata
tying ``crawl_date`` to ``warc_ts`` — a raw ``warc_ts`` range does NOT
prune here; that linkage is exactly what Iceberg's ``days(warc_ts)``
partition transform adds on a cluster with the runtime jar.)
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_pages_partitioned(pages: DataFrame, path: str,
                            mode: str = "overwrite") -> None:
    """Write the pages table partitioned by crawl day (days(warc_ts))."""
    (
        pages.withColumn("crawl_date", F.to_date("warc_ts"))
        .write.mode(mode)
        .partitionBy("crawl_date")
        .parquet(path)
    )


def read_pages_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read back the partitioned table — the pages columns plus the
    ``crawl_date`` partition column (keep it: predicates on it prune before
    any file I/O; drop it explicitly when unioning with unpartitioned
    frames)."""
    return spark.read.parquet(path)


def day_slice(pages: DataFrame, day: str) -> DataFrame:
    """One crawl day; on a partitioned table this is partition pruning, not
    a scan+filter."""
    return pages.filter(F.col("crawl_date") == day)
