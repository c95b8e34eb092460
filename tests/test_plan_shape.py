"""Physical-plan regression tests — the scale story is enforced, not hoped:

- on an already-wide input (the 100 TB cluster-scan regime) the whole
  pairwise measure suite compiles to exactly ONE exchange (hash on urit) and
  one sort (the window's), with all text UDFs fused into a single
  ArrowEvalPython node;
- on a narrow input (one small local file) prepare_pages widens the scan
  round-robin BEFORE the Python UDFs, so enrichment parallelizes — that adds
  exactly one round-robin exchange and nothing else;
- the parquet scan prunes to the columns the query needs;
- LSH candidate generation contains no join (collect+expand shape).
"""

import re

from off_topic_memento_toolkit_spark.operators.lsh import (
    candidate_pairs_from_buckets,
    minhash_band_table,
)
from off_topic_memento_toolkit_spark.operators.measures import (
    score_timemap_measures,
)
from off_topic_memento_toolkit_spark.queries import (
    make_sql_query,
    pages_from_documents,
)

SF_DIR = "/root/testdata/sf0.001"


def _executed_plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _wide(spark, pages):
    """Pre-widen the input so prepare_pages sees the cluster-scan regime."""
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return pages.repartition(n)


MEASURES = ("bytecount", "wordcount", "jaccard", "sorensen",
            "raw_simhash", "tf_simhash")


def test_measure_suite_single_exchange_wide_input(spark):
    pages = _wide(spark, pages_from_documents(spark, SF_DIR))
    plan = _executed_plan(score_timemap_measures(pages, measures=MEASURES))
    # wide regime: the window's hash shuffle is the ONLY keyed exchange
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert len(re.findall(r"ArrowEvalPython", plan)) == 1
    assert len(re.findall(r"\+- Sort ", plan)) == 1


def test_measure_suite_narrow_input_parallelizes_udfs(spark):
    pages = pages_from_documents(spark, SF_DIR)  # 1-partition parquet scan
    plan = _executed_plan(score_timemap_measures(pages, measures=MEASURES))
    # narrow regime: one extra ROUND-ROBIN widen below the UDFs, still one
    # keyed exchange; the UDF node must sit ABOVE the round-robin exchange
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert len(re.findall(r"Exchange RoundRobinPartitioning", plan)) == 1
    assert len(re.findall(r"ArrowEvalPython", plan)) == 1
    udf_pos = plan.index("ArrowEvalPython")
    rr_pos = plan.index("Exchange RoundRobinPartitioning")
    assert udf_pos < rr_pos  # executed-plan strings print consumers first


def test_scan_prunes_columns(spark):
    query = make_sql_query("bytecount_vs_first")
    plan = _executed_plan(query(spark, SF_DIR))
    scans = [line for line in plan.splitlines() if "FileScan parquet" in line]
    assert scans, plan
    # only doc_id and text are needed; lang/source/n_chars must be pruned
    for scan in scans:
        assert "lang" not in scan and "source" not in scan


def test_lsh_candidates_no_join(spark):
    pages = _wide(spark, pages_from_documents(spark, SF_DIR))
    from off_topic_memento_toolkit_spark.operators.timeline import prepare_pages
    docs = prepare_pages(pages, need_raw_simhash=False, need_tf_simhash=False)
    bands = minhash_band_table(docs, id_col="urim", tokens_col="tokens")
    pairs = candidate_pairs_from_buckets(bands)
    plan = _executed_plan(pairs)
    assert "Join" not in plan, plan
    # the size-gate window and the collect_list groupBy share one hash
    # exchange; the expand-late member-set dedup adds a second (short-array
    # rows, one per bucket — strictly smaller than the band table) and the
    # pair distinct the third — nothing else shuffles
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 3
    # the spill-safe gate sits BEFORE the collect: Window below HashAggregate
    assert plan.index("HashAggregate") < plan.index("Window")  # printed top-down


def test_slice_by_datetime_no_single_partition_sort(spark):
    """W3's global rank must come from the distributed two-phase ranking:
    no Exchange SinglePartition (the old all-to-one Window) anywhere, and
    the slice ids must equal a brute-force single-window rendition."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from off_topic_memento_toolkit_spark.operators.curation import (
        slice_by_datetime,
    )

    meta = spark.range(1200).select(
        F.concat(F.lit("u"), F.format_string("%05d", F.col("id"))).alias("urim"),
        F.lit("t").alias("urit"),
        (F.col("id") % 37).alias("simhash"),
        F.timestamp_seconds(F.lit(1700000000) + (F.col("id") * 7919) % 100000)
        .alias("memento_datetime"),
    ).repartition(13)  # adversarial input layout

    out = slice_by_datetime(meta)
    plan = _executed_plan(out)
    assert "Exchange SinglePartition" not in plan, plan

    got = {r.urim: (r.global_position, r.slice_id) for r in out.collect()}

    # brute-force oracle: literal single-window arithmetic (test-only)
    import math
    n = meta.count()
    slice_count = n if n <= 28 else math.floor(28 + math.log10(n))
    ips = n // slice_count
    w = Window.orderBy("memento_datetime", "urim")
    brute = meta.withColumn("_i", F.row_number().over(w) - 1)
    expect = {}
    for r in brute.collect():
        sid = 0 if r._i == 0 else math.ceil(r._i / ips)
        if r._i == 0 or sid * ips <= n - 1:
            expect[r.urim] = (r._i, sid)
    assert got == expect
