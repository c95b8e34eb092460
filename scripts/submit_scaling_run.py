"""North-rule deployment evidence, run LITERALLY as the rule states it:
``spark-submit --py-files otmt_spark.zip`` against a MULTI-EXECUTOR master
(`local-cluster[k,c,mem]` — real executor JVMs, the package reaching them
only through the zip) at N and 4N executors, timing the LSH dedup stage.

Default widths: 1 executor × 2 cores vs 4 executors × 2 cores (2 → 8 total
cores) — inside this VM's clean silicon window (BENCH.md chip control 0.888
for 2→8; the 8→32 window is host-throttled, which would measure the
machine, not the engine).

Updates the marked block in BENCH.md (scaling_run.py preserves it).

Usage:
    python scripts/submit_scaling_run.py [--sf-dir DIR] [--replicate K]
        [--execs 1,4] [--cores 2] [--mem-mb 8192] [--best-of 2]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from bench_md import make_updater  # noqa: E402 — scripts/ already on path

BEGIN, END, update_bench_md = make_updater("submit-scaling")

# the package itself reaches driver AND executors only through --py-files;
# the harness-side workload module is imported from the repo's scripts dir
# so both scaling harnesses provably time the identical job
_JOB = f'''\
import json, sys, time
from pyspark.sql import SparkSession

sys.path.insert(0, {REPO + "/scripts"!r})
from bench_workload import build_pages, dedup_candidates, noop_write

sf_dir, replicate = sys.argv[1], int(sys.argv[2])
spark = SparkSession.builder.getOrCreate()  # all conf from spark-submit
spark.sparkContext.setLogLevel("ERROR")

pages = build_pages(spark, sf_dir, replicate)
n_docs = pages.count()
noop_write(dedup_candidates(pages.limit(64)))  # warmup excluded

start = time.time()
noop_write(dedup_candidates(pages))
elapsed = time.time() - start
print("RESULT " + json.dumps(
    {{"n_docs": n_docs, "seconds": round(elapsed, 2),
      "executors": spark.conf.get("spark.master")}}))
spark.stop()
'''


def run_submit(zip_path, job_path, n_execs, cores, mem_mb, sf_dir, replicate):
    master = f"local-cluster[{n_execs},{cores},{mem_mb}]"
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    # tmpfs shuffle/spill scratch, SAME as the in-process comparator
    # (session.py) — without it the submit numbers would confound the
    # executor boundary with tmpfs-vs-virtio-disk shuffle I/O
    shm = "/dev/shm/spark-local"
    os.makedirs(shm, exist_ok=True)
    proc = subprocess.run(
        ["spark-submit", "--master", master,
         "--driver-memory", "8g",  # the actual knob; env vars don't apply
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=128",
         "--conf", "spark.sql.adaptive.coalescePartitions.enabled=false",
         "--conf", f"spark.executor.memory={mem_mb}m",
         "--conf", f"spark.local.dir={shm}",
         "--conf", "spark.sql.session.timeZone=UTC",
         "--py-files", zip_path, job_path, sf_dir, str(replicate)],
        capture_output=True, text=True, timeout=3000, env=env,
        cwd=tempfile.gettempdir(),  # empty cwd: the zip is the ONLY source
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT ({master}):\n{proc.stdout[-1500:]}\n"
                       f"{proc.stderr[-1500:]}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    parser.add_argument("--replicate", type=int, default=32)
    parser.add_argument("--execs", default="1,4",
                        help="comma-separated executor counts (N,4N)")
    parser.add_argument("--cores", type=int, default=2)
    parser.add_argument("--mem-mb", type=int, default=8192)
    parser.add_argument("--best-of", type=int, default=2)
    args = parser.parse_args()
    execs = [int(x) for x in args.execs.split(",")]

    from package_pyfiles import build

    workdir = tempfile.mkdtemp(prefix="otmt_submit_scaling_")
    zip_path = build(os.path.join(workdir, "otmt_spark.zip"))
    job_path = os.path.join(workdir, "dedup_job.py")
    with open(job_path, "w") as fh:
        fh.write(_JOB)

    # INTERLEAVED rounds: the VM's 2-4x bimodal swings (BENCH.md) last
    # minutes — running all of width A then all of width B lets a mode flip
    # land entirely on one side and fabricate the efficiency.  Each round
    # times every width back-to-back, and efficiency is reported from the
    # best SAME-ROUND pair.
    rounds, n_docs = [], None
    for _ in range(args.best_of):
        this_round = {}
        for n in execs:
            r = run_submit(zip_path, job_path, n, args.cores, args.mem_mb,
                           args.sf_dir, args.replicate)
            n_docs = r["n_docs"]
            this_round[n] = r["seconds"]
            print(f"  submit dedup @ {n} executors x {args.cores} cores: "
                  f"{r['seconds']}s")
        rounds.append(this_round)
    results = {n: min(rd[n] for rd in rounds) for n in execs}

    lines = [
        "## N vs 4N EXECUTORS via spark-submit --py-files "
        "(the north rule's literal deployment shape)",
        "",
        f"The LSH dedup stage over {n_docs} pages, submitted with "
        f"`spark-submit --py-files otmt_spark.zip` from an empty cwd (the "
        f"zip is the only package source reaching the executor JVMs) "
        f"against `local-cluster[k,{args.cores},{args.mem_mb}]` — real "
        f"multi-executor JVMs with a network shuffle boundary. Best of "
        f"{args.best_of}.",
        "",
        "| executors | total cores | dedup stage (s) |",
        "|---|---|---|",
    ]
    for n in execs:
        lines.append(f"| {n} | {n * args.cores} | {results[n]} |")
    pairs_txt = []
    for lo, hi in zip(execs, execs[1:]):
        # SAME-ROUND pairs: both widths measured back-to-back in one machine
        # mode (a cross-round ratio can mix modes).  Headline = the BEST
        # round (minimum = reproducible engine cost, the bench.py
        # philosophy), guarded against the one way best-of can lie here: a
        # mid-round mode flip in the favorable direction (slow low-width +
        # fast high-width).  If the chosen round's low-width time is
        # anomalously slow vs its own cross-round best, fall back to the
        # median round.  Every round is printed so nothing hides.
        effs = sorted((((rd[lo] / rd[hi]) / (hi / lo), rd) for rd in rounds),
                      key=lambda t: t[0])  # dicts not comparable on ties
        # clean round = its low-width time is within 15% of the cross-round
        # fastest, i.e. NOT a favorable slow-lo/fast-hi mid-round flip;
        # headline = best clean round, else the lower-median of the flips
        # ((len-1)//2: a plain len//2 selects the BEST of a 2-round list —
        # the exact flipped round the guard exists to reject)
        fastest_lo = min(rd[lo] for rd in rounds)
        clean = [t for t in effs if t[1][lo] <= fastest_lo * 1.15]
        if clean:
            head_eff, head_rd = clean[-1]
            label = "best same-round pair"
        else:
            head_eff, head_rd = effs[(len(effs) - 1) // 2]
            label = ("median same-round pair "
                     "(every round straddled a mode flip)")
        pairs_txt.append(
            f"- **{lo} → {hi} executors** ({label}: "
            f"{head_rd[lo]}s → {head_rd[hi]}s): speedup "
            f"{head_rd[lo] / head_rd[hi]:.3f}x, efficiency "
            f"**{head_eff:.3f}** (target ≥ 0.8); all same-round "
            f"efficiencies {[round(e, 3) for e, _ in effs]}")
    pairs_txt.append(
        "\nRead this against the chip control for the same total-core "
        "window (table above): the VM itself sheds per-core throughput "
        "going wider, so the silicon-normalized efficiency is "
        "eff / chip-ratio. The executor boundary adds a real inter-JVM "
        "shuffle, which is the honest cost a 4N-executor cluster pays.")
    block = "\n".join(lines) + "\n\n" + "\n".join(pairs_txt)
    print(block)
    update_bench_md(block)
    print("updated BENCH.md")


if __name__ == "__main__":
    main()
