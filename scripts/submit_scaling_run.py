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

BEGIN = "<!-- submit-scaling:begin -->"
END = "<!-- submit-scaling:end -->"

_JOB = '''\
import json, sys, time
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sf_dir, replicate = sys.argv[1], int(sys.argv[2])
spark = SparkSession.builder.getOrCreate()  # all conf from spark-submit
spark.sparkContext.setLogLevel("ERROR")

from off_topic_memento_toolkit_spark.operators.lsh import (
    minhash_candidate_pairs,
)
from off_topic_memento_toolkit_spark.operators.timeline import prepare_pages


def replicated_pages(r):
    docs = spark.read.parquet(sf_dir + "/documents.parquet")
    if r > 0:
        docs = docs.withColumn(
            "text", F.concat(F.col("text"), F.lit(f" replica marker {r} "),
                             (F.col("doc_id") % 97).cast("string")))
    return docs.select(
        F.concat(F.lit(f"http://rep{r}.docs.example/site"),
                 (F.col("doc_id") % 50).cast("string")).alias("url"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id") * 3600)
         .alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body><p>"), F.col("text"),
                          F.lit("</p></body></html>")), "utf-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.col("lang"),
    )


pages = replicated_pages(0)
for r in range(1, replicate):
    pages = pages.unionByName(replicated_pages(r))
pages = pages.repartition(64).persist()
n_docs = pages.count()

warm = prepare_pages(pages.limit(64), need_tf_simhash=False).select(
    F.xxhash64("urim").alias("nid"), "tokens")
minhash_candidate_pairs(warm, id_col="nid", tokens_col="tokens") \\
    .write.format("noop").mode("overwrite").save()

start = time.time()
docs = prepare_pages(pages, need_tf_simhash=False).select(
    F.xxhash64("urim").alias("nid"), "tokens")
minhash_candidate_pairs(docs, id_col="nid", tokens_col="tokens") \\
    .write.format("noop").mode("overwrite").save()
elapsed = time.time() - start
print("RESULT " + json.dumps(
    {"n_docs": n_docs, "seconds": round(elapsed, 2),
     "executors": spark.conf.get("spark.master")}))
spark.stop()
'''


def run_submit(zip_path, job_path, n_execs, cores, mem_mb, sf_dir, replicate):
    master = f"local-cluster[{n_execs},{cores},{mem_mb}]"
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_MASTER"] = "from-submit"
    env["SPARK_DRIVER_MEM"] = "8g"
    proc = subprocess.run(
        ["spark-submit", "--master", master,
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=128",
         "--conf", "spark.sql.adaptive.coalescePartitions.enabled=false",
         "--conf", f"spark.executor.memory={mem_mb}m",
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


def update_bench_md(block: str):
    path = os.path.join(REPO, "BENCH.md")
    with open(path) as fh:
        text = fh.read()
    section = f"{BEGIN}\n{block}\n{END}"
    if BEGIN in text:
        pre = text[: text.index(BEGIN)]
        post = text[text.index(END) + len(END):]
        text = pre + section + post
    else:
        anchor = "Reference baseline:"
        idx = text.index(anchor) if anchor in text else len(text)
        text = text[:idx] + section + "\n\n" + text[idx:]
    with open(path, "w") as fh:
        fh.write(text)


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

    results, n_docs = {}, None
    for n in execs:
        best = None
        for _ in range(args.best_of):
            r = run_submit(zip_path, job_path, n, args.cores, args.mem_mb,
                           args.sf_dir, args.replicate)
            n_docs = r["n_docs"]
            best = r["seconds"] if best is None else min(best, r["seconds"])
            print(f"  submit dedup @ {n} executors x {args.cores} cores: "
                  f"{r['seconds']}s")
        results[n] = best

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
        speedup = results[lo] / results[hi]
        eff = speedup / (hi / lo)
        pairs_txt.append(
            f"- **{lo} → {hi} executors**: speedup {speedup:.3f}x, "
            f"efficiency **{eff:.3f}** (target ≥ 0.8)")
    block = "\n".join(lines) + "\n\n" + "\n".join(pairs_txt)
    print(block)
    update_bench_md(block)
    print("updated BENCH.md")


if __name__ == "__main__":
    main()
