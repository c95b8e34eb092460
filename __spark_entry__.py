"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: full off-topic detection (the reference's
detect_off_topic, SURVEY §3.1) over a pages table synthesized from the
sf0.001 ``documents`` parquet: per-memento scores vs the first memento of
each timeline, per-measure labels, overall OR.

``queries()`` — one entry per implemented operator family (SURVEY §2):
relational queries are single logical SQL texts rendered for Spark SQL, with
``oracle_sql()`` returning the same text rendered for DuckDB; UDF-kernel
operators (simhash, minhash-LSH, connected components, the measure suite)
are oracle-checked via materialized intermediates (queries_mat.py).  Every
entry carries an oracle — including the full 11-measure suite (composed
per-measure domains) and gensim_lda (coverage + contract invariants; its
values have no parity target since the reference declares LDA
non-deterministic).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from off_topic_memento_toolkit_spark.queries import (
    ORACLE_QUERIES,
    make_sql_query,
    oracle_sql_strings,
    pages_from_documents,
    rows_only_queries,
)
from off_topic_memento_toolkit_spark.queries_mat import (
    mat_oracle_sql,
    mat_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from off_topic_memento_toolkit_spark.plans.pipeline import detect_off_topic

    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    result = detect_off_topic(
        pages,
        measures=("bytecount", "wordcount", "jaccard", "sorensen",
                  "tf_simhash", "cosine"),
    )
    scores = result["scores"]
    overall = result["overall"]
    return scores.join(overall, ["urit", "urim"], "left").select(
        "urit", "urim", "measure", "comparison_score", "topic_status",
        "overall_topic_status",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in ORACLE_QUERIES:
        out[name] = make_sql_query(name)
    out.update(mat_queries())
    out.update(rows_only_queries())
    return out


def oracle_sql() -> dict[str, str]:
    """Dual-dialect SQL queries + materialized-intermediate oracles: the UDF
    operators' relational remainders are verified in DuckDB over the parquet
    intermediates the Spark queries write (see queries_mat.py)."""
    return {**oracle_sql_strings(), **mat_oracle_sql()}
