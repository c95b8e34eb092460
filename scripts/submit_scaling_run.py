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
        head_eff, head_rd = effs[-1]
        label = "best same-round pair"
        if head_rd[lo] > min(rd[lo] for rd in rounds) * 1.15:
            head_eff, head_rd = effs[len(effs) // 2]
            label = "median same-round pair (best round was a mode flip)"
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
