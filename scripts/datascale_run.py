"""Data-scale throughput evidence: the SAME workload at a ladder of corpus
sizes on FIXED cores — the other axis of the 100 TB question.

scaling_run.py proves the engine uses added cores (N → 4N efficiency);
this harness proves cost grows LINEARLY with data: docs/sec at fixed
local[32] should stay ~flat as the corpus doubles twice (superlinear
per-doc cost — an accidental O(n²) pair blowup, a collect, a
single-partition sort — shows up immediately as collapsing docs/sec at
the larger sizes).

Same shared workload (scripts/bench_workload.py), same 64-input /
128-shuffle layout at every size, fresh process per (stage, size), warmup
excluded, best-of-N.  Writes its own marker block into BENCH.md.

Usage:
    python scripts/datascale_run.py [--sf-dir DIR] [--cpus 32]
                                    [--replicates 8,16,32] [--best-of N]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from scaling_run import run_stage  # noqa: E402 — same subprocess worker

from bench_md import make_updater  # noqa: E402

BEGIN, END, update_bench_md = make_updater("data-scaling")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    parser.add_argument("--cpus", type=int, default=32)
    parser.add_argument("--replicates", default="8,16,32",
                        help="comma-separated corpus multipliers (perturbed "
                             "copies of the sf documents table)")
    parser.add_argument("--best-of", type=int, default=3)
    args = parser.parse_args()
    sizes = [int(x) for x in args.replicates.split(",")]

    results = {}   # (stage, replicate) -> best seconds
    docs = {}      # replicate -> n_docs
    for stage in ("measures", "dedup"):
        for rep in sizes:
            best = None
            for _ in range(args.best_of):
                r = run_stage(stage, args.cpus, args.sf_dir, rep)
                docs[rep] = r["n_docs"]
                best = r["seconds"] if best is None else min(best,
                                                             r["seconds"])
                print(f"  {stage}@x{rep} ({r['n_docs']} docs): "
                      f"{r['seconds']}s")
            results[(stage, rep)] = best

    per_size = {}
    for rep in sizes:
        total = results[("measures", rep)] + results[("dedup", rep)]
        per_size[rep] = {
            "n_docs": docs[rep],
            "measures_s": results[("measures", rep)],
            "dedup_s": results[("dedup", rep)],
            "total_s": round(total, 2),
            # each doc passes both stages → n_docs per stage, 2*n_docs total
            "docs_per_sec": round(docs[rep] * 2 / total, 1),
        }
    lo, hi = sizes[0], sizes[-1]
    ratio = round(per_size[hi]["docs_per_sec"] / per_size[lo]["docs_per_sec"],
                  3)
    report = {"cpus": args.cpus, "sizes": per_size,
              "throughput_ratio_largest_vs_smallest": ratio}
    print(json.dumps(report, indent=2))

    rows = "\n".join(
        f"| {docs[rep]} | {results[('measures', rep)]} | "
        f"{results[('dedup', rep)]} | {per_size[rep]['total_s']} | "
        f"**{per_size[rep]['docs_per_sec']}** |"
        for rep in sizes)
    verdict = (
        "flat-to-rising docs/sec with growing data = per-doc cost is "
        "constant (fixed overheads amortize); there is no superlinear "
        "stage hiding in the pipeline"
        if ratio >= 0.9 else
        "docs/sec falls at the larger sizes — per-doc cost grows with the "
        "corpus; investigate before scaling out")
    block = f"""
## Data-scale sweep: fixed local[{args.cpus}], corpus doubled twice

Same workload and 64-input/128-shuffle layout as the core-scaling table,
fresh process per cell, best of {args.best_of}. Cores fixed; only the data
grows ({', '.join(str(docs[r]) for r in sizes)} pages).

| pages | measures (s) | dedup (s) | total (s) | docs/sec |
|---|---|---|---|---|
{rows}

Throughput at {docs[hi]} pages is **{ratio}x** the {docs[lo]}-page reading
— {verdict}. Linear-in-data cost at fixed resources is the second half of
the 100 TB argument: core-scaling (above) says added executors are used at
≥0.8 efficiency, this sweep says the work itself does not grow faster than
the corpus.
"""
    update_bench_md(block.strip("\n"))
    print("updated BENCH.md (data-scaling block)")


if __name__ == "__main__":
    main()
