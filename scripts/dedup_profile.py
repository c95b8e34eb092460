"""Where does the LSH dedup stage stop scaling from 8 to 32 cores?

Decomposes the stage into its three physical phases, each timed separately
inside ONE fresh JVM per (width, repetition):

  enrich — prepare_pages UDF chain (extract/tokenize/simhash; Arrow batches)
  bands  — minhash band UDF + posexplode (pure map-side CPU)
  pairs  — the one-shuffle window-gate + collect_list + pair expand

Widths are INTERLEAVED per repetition (8, 32, 8, 32, ...) and a raw
multiprocessing chip control runs inside every repetition, so each 8→32
ratio is a same-machine-mode pairing (the VM is bimodal; see BENCH.md).
Prints per-phase normalized efficiencies: (T8/T32)/4 divided by the chip
control's same-rep per-core ratio.

Usage: python scripts/dedup_profile.py [--sf-dir DIR] [--replicate K]
                                       [--reps N]
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
from pyspark.sql import functions as F
from off_topic_memento_toolkit_spark.session import get_spark
from off_topic_memento_toolkit_spark.operators.lsh import (
    candidate_pairs_from_buckets, minhash_band_table)
from off_topic_memento_toolkit_spark.operators.timeline import prepare_pages
from bench_workload import build_pages, noop_write

cpus = {cpus}
spark = get_spark(f"dedup-profile-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=128,
                  extra_conf={{"spark.ui.enabled": "true"}})
spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
spark.sparkContext.setLogLevel("ERROR")

pages = build_pages(spark, {sf_dir!r}, {replicate})
pages.count()

# warmup: both UDF pipelines + a shuffle, on 64 rows
warm_docs = prepare_pages(pages.limit(64), need_tf_simhash=False) \
    .select(F.xxhash64("urim").alias("nid"), "tokens")
noop_write(candidate_pairs_from_buckets(
    minhash_band_table(warm_docs, id_col="nid", tokens_col="tokens")))

timings = {{}}
start = time.time()
docs = prepare_pages(pages, need_tf_simhash=False) \
    .select(F.xxhash64("urim").alias("nid"), "tokens").persist()
docs.count()
timings["enrich"] = round(time.time() - start, 2)

start = time.time()
bands = minhash_band_table(docs, id_col="nid", tokens_col="tokens").persist()
bands.count()
timings["bands"] = round(time.time() - start, 2)

import urllib.request

def stage_ids():
    base = spark.sparkContext.uiWebUrl
    if base is None:  # UI unavailable: timings still valid, metrics empty
        return {{}}
    url = (base + "/api/v1/applications/"
           + spark.sparkContext.applicationId + "/stages")
    return {{s["stageId"]: s for s in json.load(urllib.request.urlopen(url))}}

before = set(stage_ids())
start = time.time()
noop_write(candidate_pairs_from_buckets(bands))
timings["pairs"] = round(time.time() - start, 2)

# per-stage runtime metrics for the pairs phase only: is the 32-thread
# anti-scaling CPU inflation accompanied by GC-pause inflation?
phase_stages = {{sid: s for sid, s in stage_ids().items()
                if sid not in before and s["status"] == "COMPLETE"}}
metrics = {{
    "run_s": round(sum(s["executorRunTime"] for s in
                       phase_stages.values()) / 1e3, 1),
    "cpu_s": round(sum(s["executorCpuTime"] for s in
                       phase_stages.values()) / 1e9, 1),
    "gc_s": round(sum(s.get("jvmGcTime", 0) for s in
                      phase_stages.values()) / 1e3, 1),
    "shuffle_write_mb": round(sum(s["shuffleWriteBytes"] for s in
                                  phase_stages.values()) / 1e6, 1),
    "spill_mb": round(sum(s.get("memoryBytesSpilled", 0) for s in
                          phase_stages.values()) / 1e6, 1),
}}

print("RESULT " + json.dumps({{"cpus": cpus, "timings": timings,
                               "pairs_metrics": metrics}}))
spark.stop()
"""


def run_width(cpus, sf_dir, replicate):
    code = _WORKER.format(repo=REPO, cpus=cpus, sf_dir=sf_dir,
                          replicate=replicate)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3000)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT at {cpus}:\n{out.stdout[-2000:]}"
                       f"\n{out.stderr[-2000:]}")


def run_chip(workers):
    from scaling_run import run_chip_control
    return run_chip_control(workers)["per_task"]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    parser.add_argument("--replicate", type=int, default=32)
    parser.add_argument("--reps", type=int, default=2)
    args = parser.parse_args()
    sys.path.insert(0, os.path.join(REPO, "scripts"))

    reps = []
    for rep in range(args.reps):
        cell = {"chip": {}}
        for cpus in (8, 32):
            cell[cpus] = run_width(cpus, args.sf_dir, args.replicate)
            print(f"  rep{rep} width {cpus}: "
                  f"{cell[cpus]['timings']}", flush=True)
            cell["chip"][cpus] = run_chip(cpus)
        chip_ratio = (cell["chip"][8] * 8) / (cell["chip"][32] * 32)
        cell["chip_ratio_8_32"] = round(chip_ratio, 3)
        per_phase = {}
        for phase in ("enrich", "bands", "pairs"):
            t8 = cell[8]["timings"][phase]
            t32 = cell[32]["timings"][phase]
            raw = (t8 / t32) / 4
            per_phase[phase] = {
                "t8": t8, "t32": t32, "raw_eff": round(raw, 3),
                "normalized": round(raw / chip_ratio, 3),
            }
        total8 = sum(cell[8]["timings"].values())
        total32 = sum(cell[32]["timings"].values())
        raw = (total8 / total32) / 4
        per_phase["TOTAL"] = {
            "t8": round(total8, 2), "t32": round(total32, 2),
            "raw_eff": round(raw, 3),
            "normalized": round(raw / chip_ratio, 3),
        }
        cell["per_phase"] = per_phase
        print(f"rep{rep}: chip {cell['chip_ratio_8_32']} "
              + json.dumps(per_phase), flush=True)
        reps.append(cell)
    print("PROFILE " + json.dumps(reps))


if __name__ == "__main__":
    main()
