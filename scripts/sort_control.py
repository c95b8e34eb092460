"""Third silicon control: SORT-shaped (random-access, allocation-heavy)
scaling at 8 vs 32 workers, with zero Spark.

The control ladder so far: md5 (cache-resident compute) scales ~0.9 at
8->32 on this VM; sequential-DRAM streaming scales 0.4-0.9
(membw_control.py); the engine's LSH pairs phase — sort + array expand +
shuffle write — reads 0.08-0.17 in EVERY layout (1x32 threads, 4x8-JVM
local-cluster, spark-submit).  This control asks whether a plain
multiprocessing workload with the same memory-access SHAPE as a shuffle
sort (comparison sort over random keys: cache-hostile random access +
buffer allocation, no Spark, no JVM, no Python object churn) also
collapses at 32 workers.  If it does, the pairs-phase anti-scaling is
pinned to the host memory subsystem under concurrent random-access load
— a property of THIS VM's 8->32 window, not of the engine.

Per task: np.sort over a fresh random int64 array (default 16M elements
= 128 MB; introsort over random keys defeats the prefetcher the same way
a shuffle sort does), repeated --sweeps times on fresh allocations.

Usage: python scripts/sort_control.py [--best-of 3] [--mb 128]
"""

import argparse
import json
import subprocess
import sys

_WORKER = r"""
import json, sys, time
import numpy as np
from multiprocessing import Pool

MB = int(sys.argv[2])
SWEEPS = 3

def unit(seed):
    n = MB * 1024 * 1024 // 8
    start = time.time()
    for s in range(SWEEPS):
        rng = np.random.default_rng(seed * 7 + s)
        arr = rng.integers(0, 1 << 62, size=n, dtype=np.int64)
        arr.sort()
    return time.time() - start

if __name__ == "__main__":
    workers = int(sys.argv[1])
    with Pool(workers) as pool:
        pool.map(unit, range(workers))  # warm the pool + allocator
        start = time.time()
        outs = pool.map(unit, range(workers, 2 * workers))
        wall = time.time() - start
    print("RESULT " + json.dumps({
        "workers": workers, "wall": wall,
        "per_task_inner": sum(outs) / len(outs)}))
"""


def run_width(workers, mb):
    out = subprocess.run(
        [sys.executable, "-c", _WORKER, str(workers), str(mb)],
        capture_output=True, text=True, timeout=900)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT:\n{out.stderr[-1000:]}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--best-of", type=int, default=3)
    parser.add_argument("--mb", type=int, default=128)
    args = parser.parse_args()
    import os
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__))))
    from scaling_run import run_chip_control

    reps = []
    for rep in range(args.best_of):
        cell = {}
        for w in (8, 32):
            cell[w] = run_width(w, args.mb)["per_task_inner"]
            cell[f"md5_{w}"] = run_chip_control(w)["per_task"]
        # one concurrent task per worker -> per-core ratio is direct
        cell["sort_ratio"] = round(cell[8] / cell[32], 3)
        cell["md5_ratio"] = round(
            (cell[f"md5_8"] * 8) / (cell[f"md5_32"] * 32), 3)
        reps.append(cell)
        print(f"rep{rep}: sort 8->32 per-core ratio {cell['sort_ratio']} "
              f"(per-task {cell[8]:.2f}s@8 {cell[32]:.2f}s@32) "
              f"md5 {cell['md5_ratio']}", flush=True)
    print("SORTCTL " + json.dumps(reps), flush=True)


if __name__ == "__main__":
    main()
