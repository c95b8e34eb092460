"""Decompose the FUSED dedup stage (the ladder's 42s@32 vs ~16s isolated
phase sum): time the map side alone (html -> extract -> tokenize -> minhash
bands, the chained-UDF pipeline, noop before any shuffle) vs the full stage
(+ bucket shuffle + window gate + expand + distinct), at 8 and 32 threads,
widths interleaved per rep with an md5 chip control.

Usage: python scripts/fused_probe.py [--reps 2]
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
from pyspark.sql import functions as F
from off_topic_memento_toolkit_spark.session import get_spark
from off_topic_memento_toolkit_spark.operators.lsh import (
    candidate_pairs_from_buckets, minhash_band_table)
from off_topic_memento_toolkit_spark.operators.timeline import prepare_pages
from bench_workload import build_pages, noop_write

cpus = {cpus}
spark = get_spark("fused-probe", master=f"local[{{cpus}}]",
                  shuffle_partitions=128)
spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
spark.sparkContext.setLogLevel("ERROR")
pages = build_pages(spark, "/root/testdata/sf0.1", 32)
pages.count()

def bands_of(df):
    docs = prepare_pages(df, need_tf_simhash=False) \
        .select(F.xxhash64("urim").alias("nid"), "tokens")
    return minhash_band_table(docs, id_col="nid", tokens_col="tokens")

# warm both plan shapes on 64 rows
noop_write(candidate_pairs_from_buckets(bands_of(pages.limit(64))))

start = time.time()
noop_write(bands_of(pages))           # map side only: fused UDF chain
map_side = round(time.time() - start, 2)
start = time.time()
noop_write(candidate_pairs_from_buckets(bands_of(pages)))  # full stage
total = round(time.time() - start, 2)
print("RESULT " + json.dumps({{"cpus": cpus, "map_side": map_side,
                               "total": total}}))
spark.stop()
"""


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--reps", type=int, default=2)
    args = parser.parse_args()
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from scaling_run import run_chip_control

    reps = []
    for rep in range(args.reps):
        cell = {}
        for cpus in (8, 32):
            out = subprocess.run(
                [sys.executable, "-c", _CELL.format(repo=REPO, cpus=cpus)],
                capture_output=True, text=True, timeout=3000)
            for line in out.stdout.splitlines():
                if line.startswith("RESULT "):
                    cell[cpus] = json.loads(line[len("RESULT "):])
                    break
            else:
                raise RuntimeError(out.stdout[-1500:] + out.stderr[-1500:])
            print(f"  rep{rep} fused@{cpus}: {cell[cpus]}", flush=True)
        cell["md5_ratio_8_32"] = round(
            (run_chip_control(8)["per_task"] * 8)
            / (run_chip_control(32)["per_task"] * 32), 3)
        for part in ("map_side", "total"):
            t8, t32 = cell[8][part], cell[32][part]
            cell[f"{part}_eff"] = round((t8 / t32) / 4, 3)
        cell["reduce_8"] = round(cell[8]["total"] - cell[8]["map_side"], 2)
        cell["reduce_32"] = round(cell[32]["total"] - cell[32]["map_side"],
                                  2)
        print(f"rep{rep}: " + json.dumps(
            {k: v for k, v in cell.items() if not isinstance(v, dict)}),
            flush=True)
        reps.append(cell)
    print("FUSED " + json.dumps(reps))


if __name__ == "__main__":
    main()
