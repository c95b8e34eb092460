"""Mechanism probe: is the dedup pairs-stage 8->32 anti-scaling a
single-JVM artifact or algorithmic?

The in-process ladder runs 8 and 32 threads inside ONE executor JVM
(local[N]); the profiler shows the pairs phase's executor CPU time
inflating ~10x at 32 threads with zero spill and identical shuffle
volume — the signature of intra-JVM contention (shared heap, allocator,
GC) rather than added work.  A real 4N-executor cluster never runs 32
threads in one JVM; it runs 4N JVMs of ~8.  This probe holds the
per-JVM thread count FIXED at 8 and scales the number of executor JVMs
1 -> 4 (8 -> 32 total cores) via `spark-submit --py-files` against
`local-cluster` — the same deployment shape as the submit-scaling block.
If efficiency recovers here while local[8]->local[32] reads ~0.15, the
mechanism is pinned: the anti-scaling lives in the single shared JVM,
not in the algorithm, and the deployment target (many moderate-width
executors) does not pay it.

Interleaved reps (1x8 then 4x8 back-to-back per round) with an md5 chip
control per round for mode-tagging, same guards as submit_scaling_run.

Usage: python scripts/jvm_split_probe.py [--best-of 3] [--replicate 32]
"""

import argparse
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from bench_md import make_updater  # noqa: E402
from scaling_run import run_chip_control  # noqa: E402
from submit_scaling_run import _JOB, run_submit  # noqa: E402

BEGIN, END, update_bench_md = make_updater("jvm-split")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    parser.add_argument("--replicate", type=int, default=32)
    parser.add_argument("--cores", type=int, default=8)
    parser.add_argument("--mem-mb", type=int, default=8192)
    parser.add_argument("--best-of", type=int, default=3)
    args = parser.parse_args()

    from package_pyfiles import build

    workdir = tempfile.mkdtemp(prefix="otmt_jvm_split_")
    zip_path = build(os.path.join(workdir, "otmt_spark.zip"))
    job_path = os.path.join(workdir, "dedup_job.py")
    with open(job_path, "w") as fh:
        fh.write(_JOB)

    execs = [1, 4]
    rounds, n_docs = [], None
    for rep in range(args.best_of):
        cell = {"chip": {}}
        for w in (8, 32):
            cell["chip"][w] = run_chip_control(w)["per_task"]
        cell["chip_ratio"] = round(
            (cell["chip"][8] * 8) / (cell["chip"][32] * 32), 3)
        for n in execs:
            r = run_submit(zip_path, job_path, n, args.cores, args.mem_mb,
                           args.sf_dir, args.replicate)
            n_docs = r["n_docs"]
            cell[n] = r["seconds"]
            print(f"  rep{rep} {n}x{args.cores} JVMs: {r['seconds']}s "
                  f"(chip {cell['chip_ratio']})", flush=True)
        cell["raw_eff"] = round((cell[1] / cell[4]) / 4, 3)
        cell["normalized"] = round(cell["raw_eff"] / cell["chip_ratio"], 3)
        rounds.append(cell)
        print(f"rep{rep}: " + json.dumps(
            {k: v for k, v in cell.items() if k != "chip"}), flush=True)

    best = max(rounds, key=lambda c: c["raw_eff"])
    print("JVMSPLIT " + json.dumps(rounds), flush=True)

    block = "\n".join([
        "## JVM-split mechanism probe: 8 vs 32 cores with per-JVM width "
        "FIXED at 8",
        "",
        f"The same LSH dedup stage and adversarial {n_docs}-page corpus as "
        "the core-scaling table, but scaled 8→32 cores by adding "
        f"executor JVMs (1×{args.cores} → 4×{args.cores} via "
        f"`spark-submit --py-files` on `local-cluster[k,{args.cores},"
        f"{args.mem_mb}]`) instead of widening one JVM (local[8]→"
        "local[32]). Interleaved reps, md5 chip control per rep, best of "
        f"{args.best_of}.",
        "",
        "| rep | chip 8→32 | 1×8 (s) | 4×8 (s) | raw eff | "
        "normalized |",
        "|---|---|---|---|---|---|",
    ] + [
        f"| {i} | {c['chip_ratio']} | {c[1]} | {c[4]} | {c['raw_eff']} | "
        f"{c['normalized']} |"
        for i, c in enumerate(rounds)
    ] + [
        "",
        f"Best rep: raw efficiency **{best['raw_eff']}** (normalized "
        f"**{best['normalized']}** against its own rep's chip control).",
    ])
    print(block)
    update_bench_md(block)
    print("updated BENCH.md", flush=True)


if __name__ == "__main__":
    main()
