"""Physical-plan audit: capture each headline query's executed plan and
summarize the scale-relevant facts (exchanges, Python nodes, joins, scans)
into PLANS.md — the '.explain and iterate' artifact."""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("OTMT_MATERIALIZE", "0")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.01"


def summarize(plan: str) -> dict:
    return {
        "hash_exchanges": len(re.findall(r"Exchange hashpartitioning", plan)),
        "roundrobin_exchanges": len(
            re.findall(r"Exchange RoundRobinPartitioning", plan)),
        "broadcast_exchanges": len(re.findall(r"BroadcastExchange", plan)),
        "python_nodes": len(re.findall(
            r"ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas", plan)),
        "sortmerge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "cartesian": len(re.findall(r"CartesianProduct", plan)),
        "nested_loop": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "sorts": len(re.findall(r"\+- Sort ", plan)),
        "windows": len(re.findall(r"\bWindow\b", plan)),
        "scans": len(re.findall(r"FileScan", plan)),
    }


def main():
    from off_topic_memento_toolkit_spark.queries import (
        full_suite_query,
        make_sql_query,
    )
    from off_topic_memento_toolkit_spark.queries_mat import mat_queries
    from off_topic_memento_toolkit_spark.session import get_spark

    spark = get_spark("plan-audit", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    mat = mat_queries()
    targets = {
        "offtopic_measures_full": full_suite_query,
        "offtopic_measures_core": mat["offtopic_measures_core"],
        "minhash_lsh_pairs": mat["minhash_lsh_pairs"],
        "incremental_lsh_pairs": mat["incremental_lsh_pairs"],
        "incremental_dedup_merge": mat["incremental_dedup_merge"],
        "simhash_hamming_pairs": mat["simhash_hamming_pairs"],
        "curation_story": mat["curation_story"],
        "ann_lsh_topk": mat["ann_lsh_topk"],
        "ann_ivf_topk": mat["ann_ivf_topk"],
        "streaming_dedup_batch": mat["streaming_dedup_batch"],
        "verified_dup_pairs": mat["verified_dup_pairs"],
        "embedding_near_dups": mat["embedding_near_dups"],
        "multimodal_bmp_topk": mat["multimodal_bmp_topk"],
        "tpch_pricing_summary": make_sql_query("tpch_pricing_summary"),
    }
    notes = {
        "offtopic_measures_full": (
            "12 measures, one keyed shuffle (the timeline window); narrow "
            "local scan adds the round-robin widen below the UDFs; the union "
            "branch for the grouped kernels reads the persisted enrichment."),
        "offtopic_measures_core": "8 relational measures, same shape.",
        "minhash_lsh_pairs": (
            "signature UDF map-side; spill-safe window size gate and the "
            "collect_list share ONE hash exchange; expand-late member-set "
            "dedup adds one over short-array rows (strictly smaller than "
            "the band table); pair distinct is the third; no joins "
            "anywhere."),
        "incremental_lsh_pairs": (
            "delta-batch candidates: base band table pruned to delta-touched "
            "buckets by a broadcast SEMI-join before any shuffle; then the "
            "same one-exchange gate+collect+expand as the batch path."),
        "incremental_dedup_merge": (
            "contraction CC: prior assignments pruned to edge endpoints "
            "(broadcast semi-join), contracted edges resolved by the hybrid "
            "CC, corpus relabeled by ONE broadcast join — no corpus-sized "
            "shuffle anywhere in the merge."),
        "simhash_hamming_pairs": "same shape over 4x16-bit chunk buckets.",
        "curation_story": (
            "W3 global order via the lazy two-phase ranking: range "
            "repartition + per-partition mono-id, offsets from the "
            "coalesce(1) agg side broadcast back — no Exchange "
            "SinglePartition anywhere (enforced by test_plan_shape)."),
        "ann_lsh_topk": "SRP bucket equi-join, queries broadcast.",
        "ann_ivf_topk": "nprobe bucket equi-join, queries broadcast.",
        "streaming_dedup_batch": "url+simhash first-occurrence window.",
        "verified_dup_pairs": (
            "LSH candidates -> Arrow Jaccard verify on pair payload joins."),
        "embedding_near_dups": (
            "SRP buckets, spill-safe size gate, collect+expand, no self-join."),
        "multimodal_bmp_topk": (
            "BMP synth+decode+feature in partition-preserving mapInPandas "
            "(no exchange until the ANN join); brute top-k = deliberate "
            "broadcast(queries) NLJ baseline — scale path is the bucketed "
            "ANN variants."),
        "tpch_pricing_summary": "scan→partial agg→exchange→final agg.",
    }

    lines = ["# PLANS — physical-plan audit of the headline queries",
             "",
             f"Captured from `executedPlan` at sf0.01, local[8], 8 shuffle "
             f"partitions, materialization off (scripts/plan_audit.py). "
             f"Counts are plan-node occurrences.",
             "",
             "| query | hash exch | RR exch | bcast exch | python nodes | "
             "SMJ | BHJ | cartesian | NLJ | sorts | windows | scans |",
             "|---|---|---|---|---|---|---|---|---|---|---|---|"]
    details = []
    for name, fn in targets.items():
        df = fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        s = summarize(plan)
        assert s["cartesian"] == 0, f"{name} has a cartesian product!"
        # BroadcastNestedLoopJoin is what an accidental cross join compiles
        # to at test scale — the audited queries must be equi-join-only.
        # Exception: brute-force cosine top-k (the ANN BASELINE) is a
        # deliberate broadcast(queries) x scan(corpus) — linear in the
        # corpus with queries << corpus, and the scale path is the
        # bucketed ann_lsh/ann_ivf variants audited above.
        if name not in ("multimodal_bmp_topk",):
            assert s["nested_loop"] == 0, f"{name} has a nested-loop join!"
        lines.append(
            f"| {name} | {s['hash_exchanges']} | {s['roundrobin_exchanges']} "
            f"| {s['broadcast_exchanges']} | {s['python_nodes']} "
            f"| {s['sortmerge_joins']} | {s['broadcast_joins']} "
            f"| {s['cartesian']} | {s['nested_loop']} | {s['sorts']} "
            f"| {s['windows']} | {s['scans']} |")
        details.append(f"- **{name}** — {notes[name]}")
    lines += ["", "## Shape notes", ""] + details + [
        "",
        "Invariants enforced by tests/test_plan_shape.py: the pairwise "
        "measure suite = exactly one keyed exchange / one fused "
        "ArrowEvalPython / one sort on wide input; LSH candidate generation "
        "is join-free with the size gate below the collect; scans prune "
        "columns; bucketed-table joins are Exchange-free "
        "(tests/test_bucketing.py).",
    ]
    with open(os.path.join(REPO, "PLANS.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
