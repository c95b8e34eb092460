"""Gold-standard datafile source (reference S7, otmt/input_types.py:580-636):
TSV ``(id, date, URI, label)`` with dates in yyyyMMddHHmmss; timelines are
keyed ``datafile-{id}``."""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_gold_datafile(spark: SparkSession, path: str) -> DataFrame:
    df = (
        spark.read.option("sep", "\t").option("header", True).csv(path)
    )
    return df.select(
        F.concat(F.lit("datafile-"), F.col("id")).alias("urit"),
        F.col("URI").alias("urim"),
        F.to_timestamp(F.col("date"), "yyyyMMddHHmmss").alias("memento_datetime"),
        F.col("label"),
    )
