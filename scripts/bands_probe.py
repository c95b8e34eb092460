"""Is the minhash-bands UDF phase's poor 8->32 scaling Spark transport or
the kernel itself?

Cells (fresh JVM each, widths interleaved per rep, md5 chip control per
rep):
  spark8/spark32     bands UDF over pre-tokenized parquet, 64 partitions
  spark32_p256       same at 256 input partitions (straggler hypothesis)
  mp8/mp32           NO Spark: multiprocessing.Pool over the same token
                     arrays, same minhash_signature/band_hashes kernel —
                     the kernel's own scaling ceiling on this box

If mp scales ~like the chip control but spark32 doesn't, the gap is the
single-JVM Arrow/UDF transport at width 32, not the kernel.

Usage: python scripts/bands_probe.py [--reps 2]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOKENS = "/tmp/bands_probe_tokens"

_PREP = r"""
import sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, {repo!r} + "/scripts")
from pyspark.sql import functions as F
from off_topic_memento_toolkit_spark.session import get_spark
from off_topic_memento_toolkit_spark.operators.timeline import prepare_pages
from bench_workload import build_pages

spark = get_spark("bands-prep", master="local[32]", shuffle_partitions=128)
spark.sparkContext.setLogLevel("ERROR")
pages = build_pages(spark, "/root/testdata/sf0.1", 32)
prepare_pages(pages, need_tf_simhash=False) \
    .select(F.xxhash64("urim").alias("nid"), "tokens") \
    .write.mode("overwrite").parquet({tokens!r})
print("PREPARED")
spark.stop()
"""

_SPARK_CELL = r"""
import json, sys, time, os
os.environ.setdefault("SPARK_DRIVER_MEM", "16g")
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from off_topic_memento_toolkit_spark.session import get_spark
from off_topic_memento_toolkit_spark.operators.lsh import minhash_band_table

spark = get_spark("bands-cell", master=f"local[{cpus}]",
                  shuffle_partitions=128)
spark.conf.set("spark.sql.adaptive.enabled", "false")
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet({tokens!r})
if {parts} != 64:
    docs = docs.repartition({parts})
docs = docs.persist()
docs.count()
bands = minhash_band_table(docs, id_col="nid", tokens_col="tokens")
bands.limit(64).count()  # warm the python pool
start = time.time()
bands.write.format("noop").mode("overwrite").save()
print("RESULT " + json.dumps({{"seconds": round(time.time() - start, 2)}}))
spark.stop()
"""

_MP_CELL = r"""
import glob, json, sys, time
sys.path.insert(0, {repo!r})
import pyarrow.parquet as pq
from multiprocessing import Pool

FILES = sorted(glob.glob({tokens!r} + "/*.parquet"))
WORKERS = {cpus}

def work(chunk_id):
    # each worker decodes ONLY its file slice (decode work scales with
    # width, mirroring Spark's per-task column reads)
    from off_topic_memento_toolkit_spark.functions.minhash import (
        band_hashes, minhash_signature)
    out = 0
    for path in FILES[chunk_id::WORKERS]:
        toks = pq.read_table(path, columns=["tokens"]) \
            .column("tokens").to_pylist()
        for t in toks:
            out ^= band_hashes(minhash_signature(t))[0]
    return out

if __name__ == "__main__":
    with Pool(WORKERS) as pool:
        pool.map(work, range(WORKERS))  # warm: page cache + imports
        start = time.time()
        pool.map(work, range(WORKERS))
        print("RESULT " + json.dumps(
            {{"seconds": round(time.time() - start, 2)}}))
"""


def run_code(code, timeout=3000):
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=timeout)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])["seconds"]
    raise RuntimeError(f"no RESULT:\n{out.stdout[-1500:]}\n"
                       f"{out.stderr[-1500:]}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--reps", type=int, default=2)
    args = parser.parse_args()
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from scaling_run import run_chip_control

    if not os.path.exists(TOKENS):
        prep = subprocess.run(
            [sys.executable, "-c", _PREP.format(repo=REPO, tokens=TOKENS)],
            capture_output=True, text=True, timeout=3000)
        if "PREPARED" not in prep.stdout:
            raise RuntimeError(prep.stderr[-2000:])

    reps = []
    for rep in range(args.reps):
        cell = {}
        for name, code in [
            ("spark8", _SPARK_CELL.replace("{cpus}", "8")
             .replace("{parts}", "64")),
            ("mp8", _MP_CELL.replace("{cpus}", "8")),
            ("spark32", _SPARK_CELL.replace("{cpus}", "32")
             .replace("{parts}", "64")),
            ("mp32", _MP_CELL.replace("{cpus}", "32")),
            ("spark32_p256", _SPARK_CELL.replace("{cpus}", "32")
             .replace("{parts}", "256")),
        ]:
            cell[name] = run_code(code.format(repo=REPO, tokens=TOKENS))
            print(f"  rep{rep} {name}: {cell[name]}s", flush=True)
        cell["md5_ratio_8_32"] = round(
            (run_chip_control(8)["per_task"] * 8)
            / (run_chip_control(32)["per_task"] * 32), 3)
        cell["spark_eff"] = round((cell["spark8"] / cell["spark32"]) / 4, 3)
        cell["mp_eff"] = round((cell["mp8"] / cell["mp32"]) / 4, 3)
        print(f"rep{rep}: {json.dumps(cell)}", flush=True)
        reps.append(cell)
    print("BANDS " + json.dumps(reps))


if __name__ == "__main__":
    main()
