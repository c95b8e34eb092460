"""Why does the LSH pairs phase (window gate -> collect_list -> expand ->
distinct) anti-scale from 8 to 32 threads in one JVM?  (dedup_profile.py
isolated it: ~13s@8 vs ~46s@32, both reps, while the UDF phases scale.)

One fresh JVM per variant, all over identical persisted band tables
(160k docs x 32 bands = 5.1M rows, 32-member near-dup cliques -> ~79M
pre-distinct pair rows).  Chip controls before/after tag the machine mode.

Variants:
  base32        the repro (local[32], 128 shuffle partitions, 16g)
  base8         8-thread reference
  nodistinct32  skip the .distinct() exchange -> is the dedup shuffle or
                the expand itself the anti-scaler?
  parts512      4x smaller reduce tasks (sorter/hash-map memory per task)
  heap32g       2x driver heap -> GC-pressure hypothesis
  cluster4x8    local-cluster[4,8,12288] -> heap-isolation hypothesis

Usage: python scripts/pairs_probe.py [--sf-dir DIR] [--replicate 32]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, sys, time, os
os.environ["SPARK_DRIVER_MEM"] = {mem!r}
sys.path.insert(0, {repo!r})
sys.path.insert(0, {repo!r} + "/scripts")
from pyspark.sql import functions as F
from off_topic_memento_toolkit_spark.session import get_spark
from off_topic_memento_toolkit_spark.operators.lsh import (
    candidate_pairs_from_buckets, minhash_band_table)
from off_topic_memento_toolkit_spark.operators.timeline import prepare_pages
from bench_workload import build_pages, noop_write

spark = get_spark("pairs-probe", master={master!r},
                  shuffle_partitions={parts}, extra_conf={extra!r})
spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
spark.sparkContext.setLogLevel("ERROR")

pages = build_pages(spark, {sf_dir!r}, {replicate})
docs = prepare_pages(pages, need_tf_simhash=False) \
    .select(F.xxhash64("urim").alias("nid"), "tokens")
bands = minhash_band_table(docs, id_col="nid", tokens_col="tokens").persist()
bands.count()

pairs = candidate_pairs_from_buckets(bands)
if {nodistinct}:
    # peel the final exchange: stop at the expanded (unnormalized) pairs
    from pyspark.sql import Window
    counted = bands.withColumn(
        "_n", F.count("*").over(Window.partitionBy("band", "band_hash")))
    bounded = counted.filter((F.col("_n") >= 2) & (F.col("_n") <= 64)) \
        .drop("_n")
    buckets = bounded.groupBy("band", "band_hash").agg(
        F.collect_list("id").alias("ids"))
    expand = ("flatten(transform(ids, (x, i) -> "
              "transform(slice(ids, i + 2, size(ids) - i - 1), "
              "y -> struct(x AS u, y AS v))))")
    pairs = buckets.select(F.explode(F.expr(expand)).alias("p")) \
        .select(F.col("p.u").alias("id_a"), F.col("p.v").alias("id_b"))

noop_write(pairs.limit(64))  # tiny warmup of the plan shape
start = time.time()
noop_write(pairs)
elapsed = time.time() - start
print("RESULT " + json.dumps({{"seconds": round(elapsed, 2)}}))
spark.stop()
"""


def run(name, sf_dir, replicate, master="local[32]", parts=128,
        mem="16g", nodistinct=False, extra=None):
    code = _WORKER.format(repo=REPO, sf_dir=sf_dir, replicate=replicate,
                          master=master, parts=parts, mem=mem,
                          nodistinct=nodistinct, extra=extra or {})
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3000)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            sec = json.loads(line[len("RESULT "):])["seconds"]
            print(f"  {name}: {sec}s", flush=True)
            return sec
    raise RuntimeError(f"no RESULT ({name}):\n{out.stdout[-1500:]}"
                       f"\n{out.stderr[-1500:]}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    parser.add_argument("--replicate", type=int, default=32)
    args = parser.parse_args()
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from scaling_run import run_chip_control

    chip_before = {c: run_chip_control(c)["per_task"] for c in (8, 32)}
    results = {}
    results["base8"] = run("base8", args.sf_dir, args.replicate,
                           master="local[8]")
    results["base32"] = run("base32", args.sf_dir, args.replicate)
    results["nodistinct32"] = run("nodistinct32", args.sf_dir,
                                  args.replicate, nodistinct=True)
    results["parts512"] = run("parts512", args.sf_dir, args.replicate,
                              parts=512)
    results["heap32g"] = run("heap32g", args.sf_dir, args.replicate,
                             mem="32g")
    results["cluster4x8"] = run(
        "cluster4x8", args.sf_dir, args.replicate,
        master="local-cluster[4,8,12288]",
        extra={"spark.executor.memory": "12g",
               "spark.executorEnv.PYTHONPATH": REPO})
    chip_after = {c: run_chip_control(c)["per_task"] for c in (8, 32)}
    print("PROBE " + json.dumps({
        "results": results,
        "chip_before": chip_before, "chip_after": chip_after}))


if __name__ == "__main__":
    main()
