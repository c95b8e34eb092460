"""Does the dedup stage's 8->32 anti-scaling track candidate-pair volume?

The ladder corpus (bench_workload.build_pages, dup_fraction=1.0) is an
adversarial worst case: EVERY page sits in a ``replicate``-member near-dup
clique, so pair expansion is quadratic in the replica count (C(32,2)=496
pairs per document group).  A realistic crawl has ~20-30% duplicated docs
in small cliques.  This probe times the identical dedup stage over both
corpus structures at widths 8 and 32 — fractions and widths interleaved
within each repetition (same-mode pairing), fresh JVM per cell, chip
control per repetition — and counts the candidate pairs each corpus
actually produces.

If the realistic corpus scales near the chip control while the adversarial
one does not, the anti-scaling is pair-volume-bound (the expand+distinct
exchange), not a property of the dedup design at realistic dup rates.

Usage: python scripts/dup_rate_probe.py [--reps 2] [--realistic 0.06]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CELL = r"""
import json, sys, time, os
os.environ.setdefault("SPARK_DRIVER_MEM", "16g")
sys.path.insert(0, {repo!r})
sys.path.insert(0, {repo!r} + "/scripts")
from off_topic_memento_toolkit_spark.session import get_spark
from bench_workload import build_pages, dedup_candidates, noop_write

spark = get_spark("dup-rate-{cpus}", master="local[{cpus}]",
                  shuffle_partitions=128)
spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
spark.sparkContext.setLogLevel("ERROR")
pages = build_pages(spark, {sf_dir!r}, {replicate},
                    dup_fraction={fraction})
n_docs = pages.count()
noop_write(dedup_candidates(pages.limit(64)))  # warm JVM + python pool
start = time.time()
noop_write(dedup_candidates(pages))
elapsed = round(time.time() - start, 2)
out = {{"cpus": {cpus}, "fraction": {fraction}, "n_docs": n_docs,
        "seconds": elapsed}}
if {count_pairs}:
    out["n_pairs"] = dedup_candidates(pages).count()
print("RESULT " + json.dumps(out))
spark.stop()
"""


def run_cell(cpus, fraction, sf_dir, replicate, count_pairs=False):
    code = _CELL.format(repo=REPO, cpus=cpus, fraction=fraction,
                        sf_dir=sf_dir, replicate=replicate,
                        count_pairs=count_pairs)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3000)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT ({cpus}, {fraction}):\n"
                       f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--reps", type=int, default=2)
    parser.add_argument("--realistic", type=float, default=0.06,
                        help="dup_fraction for the realistic corpus "
                             "(0.06 x replicate 32 = 6-member cliques, "
                             "~19%% of docs duplicated)")
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    parser.add_argument("--replicate", type=int, default=32)
    args = parser.parse_args()
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from scaling_run import run_chip_control

    fractions = (1.0, args.realistic)
    reps = []
    for rep in range(args.reps):
        cell = {"times": {}}
        for frac in fractions:
            for cpus in (8, 32):
                r = run_cell(cpus, frac, args.sf_dir, args.replicate,
                             count_pairs=(rep == 0 and cpus == 32))
                cell["times"][f"f{frac}@{cpus}"] = r["seconds"]
                if "n_pairs" in r:
                    cell[f"pairs_f{frac}"] = r["n_pairs"]
                    cell["n_docs"] = r["n_docs"]
                print(f"  rep{rep} f{frac}@{cpus}: {r['seconds']}s"
                      + (f" ({r['n_pairs']} pairs)" if "n_pairs" in r
                         else ""), flush=True)
        cell["chip_8_32"] = round(
            (run_chip_control(8)["per_task"] * 8)
            / (run_chip_control(32)["per_task"] * 32), 3)
        for frac in fractions:
            t8 = cell["times"][f"f{frac}@8"]
            t32 = cell["times"][f"f{frac}@32"]
            cell[f"eff_f{frac}"] = round((t8 / t32) / 4, 3)
        print(f"rep{rep}: " + json.dumps(
            {k: v for k, v in cell.items() if k != "times"}), flush=True)
        reps.append(cell)
    print("DUPRATE " + json.dumps(reps))


if __name__ == "__main__":
    main()
