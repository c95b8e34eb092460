"""Second silicon control: DRAM-bandwidth-bound scaling at 8 vs 32 workers.

The md5 chip control (scaling_run.py) is cache-resident — it measures
all-core CLOCK derating but cannot see a memory-bandwidth ceiling.  The
engine's heavy phases (Arrow UDF batches, shuffle write/read, array
expand) stream through DRAM, so their achievable 8->32 scaling is bounded
by THIS control, not the md5 one.  Per task: repeated strided sums over a
per-process 256 MB buffer (no inter-process sharing, first-touch inside
the worker).  Prints per-width per-task seconds and the 8->32 per-core
ratio, best of --best-of interleaved (8, 32, 8, 32, ...) with an md5
control per repetition for mode-tagging.

Usage: python scripts/membw_control.py [--best-of 3]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, sys, time
import numpy as np
from multiprocessing import Pool

BUF_MB = 256
SWEEPS = 6

def unit(_):
    buf = np.ones(BUF_MB * 1024 * 1024 // 8, dtype=np.float64)
    start = time.time()
    acc = 0.0
    for _ in range(SWEEPS):
        acc += float(buf.sum())
    return time.time() - start, acc

if __name__ == "__main__":
    workers = int(sys.argv[1])
    with Pool(workers) as pool:
        pool.map(unit, range(workers))  # warm: page in each buffer
        start = time.time()
        outs = pool.map(unit, range(workers))
        wall = time.time() - start
    print("RESULT " + json.dumps({
        "workers": workers,
        "per_task_wall": wall / 1,  # one task per worker, fully concurrent
        "per_task_inner": sum(o[0] for o in outs) / len(outs)}))
"""


def run_width(workers):
    out = subprocess.run([sys.executable, "-c", _WORKER, str(workers)],
                         capture_output=True, text=True, timeout=600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT:\n{out.stderr[-1000:]}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--best-of", type=int, default=3)
    args = parser.parse_args()
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from scaling_run import run_chip_control

    reps = []
    for rep in range(args.best_of):
        cell = {}
        for w in (8, 32):
            cell[w] = run_width(w)["per_task_inner"]
            cell[f"md5_{w}"] = run_chip_control(w)["per_task"]
        # per-core throughput ratio going 8 -> 32 (1.0 = perfect).
        # per_task_inner is the ACTUAL per-task wall time with exactly one
        # concurrent task per worker, so the ratio is a direct division —
        # no x(workers) factor (unlike scaling_run's md5 control, whose
        # per_task is elapsed/(4*workers) over 4 serial waves)
        cell["membw_ratio"] = round(cell[8] / cell[32], 3)
        cell["md5_ratio"] = round(
            (cell["md5_8"] * 8) / (cell["md5_32"] * 32), 3)
        print(f"rep{rep}: membw {cell['membw_ratio']} "
              f"md5 {cell['md5_ratio']} "
              f"(membw per-task {round(cell[8], 3)}s@8 "
              f"{round(cell[32], 3)}s@32)", flush=True)
        reps.append(cell)
    best = max(reps, key=lambda c: c["md5_ratio"])  # fastest-mode rep
    print("MEMBW " + json.dumps({"reps": reps, "fastest_mode_rep": best}))


if __name__ == "__main__":
    main()
