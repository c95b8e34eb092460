"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ...}

Headline set = the engine's real workload: the full off-topic measure suite,
the scale dedup pipeline (LSH + simhash + CC), the faithful curation chain,
and two relational anchors (TPC-H Q1-style, ANN top-k).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# bench measures engine throughput, not the oracle harness: skip the parquet
# side-writes the correctness gate uses (results identical — queries_mat.py).
# Hard assignment — an inherited OTMT_MATERIALIZE=1 from a debug shell must
# not silently add oracle I/O to the timed runs.
os.environ["OTMT_MATERIALIZE"] = "0"

from off_topic_memento_toolkit_spark.queries import (  # noqa: E402
    full_suite_query,
    make_sql_query,
    pages_from_documents,
)
from off_topic_memento_toolkit_spark.queries_mat import mat_queries  # noqa: E402
from off_topic_memento_toolkit_spark.session import get_spark  # noqa: E402


def run(sf_dir: str, cpus: str):
    spark = get_spark(
        "otmt-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus), 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    mat = mat_queries()
    headline = {
        # the COMPLETE 12-measure suite in one plan — byte-identical workload
        # to every prior round's reading (the battery's hash-checked
        # offtopic_measures_full entry is a domain-joined 11-measure variant)
        "offtopic_measures_full": full_suite_query,
        "dedup_clusters_cc": mat["dedup_clusters_cc"],
        "curation_story": mat["curation_story"],
        "minhash_lsh_pairs": mat["minhash_lsh_pairs"],
        "ann_lsh_topk": mat["ann_lsh_topk"],
        "tpch_pricing_summary": make_sql_query("tpch_pricing_summary"),
        "jaccard_vs_first": make_sql_query("jaccard_vs_first"),
        "events_hourly": make_sql_query("events_hourly"),
    }

    n_docs = pages_from_documents(spark, sf_dir).count()

    # best-of-N per query: this sandbox VM's virtio/host contention is
    # bimodal with 2-4x swings (measured in BENCH.md); the minimum is the
    # reproducible engine cost, the max is the machine.  3 runs halves the
    # odds a query never sees the fast mode vs 2.
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    timings = {}
    total_start = time.time()
    for name, fn in headline.items():
        best = None
        for _ in range(runs):
            # plan-matching would let run 2 reuse run 1's persisted
            # intermediates — that would measure the cache, not the engine
            spark.catalog.clearCache()
            start = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            elapsed = time.time() - start
            best = elapsed if best is None else min(best, elapsed)
        timings[name] = round(best, 3)
    total = round(sum(timings.values()), 3)
    wall = round(time.time() - total_start, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # docs/sec over the document-processing queries (the driver's north metric)
    doc_queries = ("offtopic_measures_full", "dedup_clusters_cc",
                   "minhash_lsh_pairs", "curation_story")
    doc_time = sum(timings[q] for q in doc_queries)
    result = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs * len(doc_queries) / doc_time, 2),
        "cpus": int(cpus),
        "runs_per_query": runs,
        "wall_seconds": wall,
    }
    print(json.dumps(result))
    spark.stop()
    return result


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    run(sf_dir, cpus)
