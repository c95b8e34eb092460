"""Physical-plan regression tests — the scale story is enforced, not hoped:

- the whole pairwise measure suite compiles to exactly ONE exchange (hash on
  urit) and one sort (the window's), with all text UDFs fused into a single
  ArrowEvalPython node;
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


def test_measure_suite_single_exchange(spark):
    pages = pages_from_documents(spark, SF_DIR)
    scores = score_timemap_measures(
        pages,
        measures=("bytecount", "wordcount", "jaccard", "sorensen",
                  "raw_simhash", "tf_simhash"),
    )
    plan = _executed_plan(scores)
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert len(re.findall(r"ArrowEvalPython", plan)) == 1
    assert len(re.findall(r"\+- Sort ", plan)) == 1


def test_scan_prunes_columns(spark):
    query = make_sql_query("bytecount_vs_first")
    plan = _executed_plan(query(spark, SF_DIR))
    scans = [line for line in plan.splitlines() if "FileScan parquet" in line]
    assert scans, plan
    # only doc_id and text are needed; lang/source/n_chars must be pruned
    for scan in scans:
        assert "lang" not in scan and "source" not in scan


def test_lsh_candidates_no_join(spark):
    pages = pages_from_documents(spark, SF_DIR)
    from off_topic_memento_toolkit_spark.operators.timeline import prepare_pages
    docs = prepare_pages(pages, need_raw_simhash=False, need_tf_simhash=False)
    bands = minhash_band_table(docs, id_col="urim", tokens_col="tokens")
    pairs = candidate_pairs_from_buckets(bands)
    plan = _executed_plan(pairs)
    assert "Join" not in plan, plan
    # exactly the groupBy shuffle + the distinct's shuffle
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2
