"""curation_story A/B at sf0.1: two-phase distributed ranking vs the
size-gated single-partition fast path (spark.otmt.ranking.mode).

The round-4 driver bench read curation_story at 4.10s against a 2.3s local
best — this harness settles whether the residual is the two-phase ranking's
constant small-data overhead (the fast path reclaims it) or machine mode
(both modes read the same).  Fresh JVM per cell, modes INTERLEAVED within
each repetition (same-mode pairing; the VM is bimodal), best-of-N
published for both.  Writes the `curation-ab` BENCH.md block.

Usage: python scripts/curation_ab.py [--sf-dir DIR] [--reps 3]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, sys, time, os
os.environ["OTMT_MATERIALIZE"] = "0"
sys.path.insert(0, {repo!r})
from off_topic_memento_toolkit_spark.session import get_spark
from off_topic_memento_toolkit_spark.queries_mat import q_curation_story

mode = {mode!r}
spark = get_spark(f"curation-ab-{{mode}}", master="local[32]",
                  shuffle_partitions=32)
spark.conf.set("spark.otmt.ranking.mode", mode)
spark.sparkContext.setLogLevel("ERROR")

# warmup: JVM + python pool on a few rows via the same code path
q_curation_story(spark, {sf_dir!r}).limit(1).collect()

start = time.time()
rows = q_curation_story(spark, {sf_dir!r}).count()
elapsed = time.time() - start
print("RESULT " + json.dumps({{"mode": mode, "rows": rows,
                               "seconds": round(elapsed, 2)}}))
spark.stop()
"""


def run_cell(mode, sf_dir):
    code = _WORKER.format(repo=REPO, mode=mode, sf_dir=sf_dir)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=1200)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT ({mode}):\n{out.stdout[-2000:]}"
                       f"\n{out.stderr[-2000:]}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    parser.add_argument("--reps", type=int, default=3)
    args = parser.parse_args()

    cells = {"distributed": [], "single": []}
    rows = {}
    for rep in range(args.reps):
        for mode in ("distributed", "single"):
            r = run_cell(mode, args.sf_dir)
            cells[mode].append(r["seconds"])
            rows[mode] = r["rows"]
            print(f"  rep{rep} {mode}: {r['seconds']}s "
                  f"({r['rows']} rows)", flush=True)
    assert rows["distributed"] == rows["single"], \
        f"mode results diverge: {rows}"

    best = {m: min(v) for m, v in cells.items()}
    report = {"sf_dir": args.sf_dir, "reps": args.reps,
              "all_seconds": cells, "best": best,
              "single_over_distributed": round(
                  best["distributed"] / best["single"], 2)}
    print(json.dumps(report, indent=2))

    from bench_md import make_updater
    _, _, update = make_updater("curation-ab")
    lines = [
        "## curation_story A/B: two-phase distributed ranking vs "
        "single-partition fast path",
        "",
        f"`q_curation_story` at `{args.sf_dir}` (materialization off), "
        f"fresh JVM per cell, modes interleaved per repetition "
        f"(same-mode pairing), best of {args.reps}.  The fast path "
        "(`spark.otmt.ranking.mode=single`) replaces the two-phase "
        "ranking with one `row_number()` window — an Exchange "
        "SinglePartition of the data, viable only at small scale.",
        "",
        "| mode | per-rep (s) | best (s) |",
        "|---|---|---|",
        f"| distributed (default) | "
        f"{', '.join(str(s) for s in cells['distributed'])} | "
        f"{best['distributed']} |",
        f"| single-partition gate | "
        f"{', '.join(str(s) for s in cells['single'])} | "
        f"{best['single']} |",
        "",
        ("Reading: the DISTRIBUTED path wins even at this tiny scale "
         f"(single-partition runs {report['single_over_distributed']}x "
         "the distributed best) — the two-phase ranking's constant "
         "overhead is already amortized at 5k rows, so the round-4 "
         "driver reading of 4.10s was machine mode, not plan cost.  "
         "The default stays `distributed`; the gate remains only as an "
         "explicit interactive escape hatch."
         if report["single_over_distributed"] <= 1.0 else
         f"Reading: the single-partition path is "
         f"{report['single_over_distributed']}x faster at this (tiny) "
         "scale — the delta is the two-phase ranking's constant "
         "overhead, available to interactive small-collection users "
         "via the config gate.  The DEFAULT stays `distributed`: the "
         "gate's plan funnels the data through one task, which is "
         "precisely the shape the plan-shape test forbids at corpus "
         "scale, and the overhead amortizes to noise beyond ~10^5 "
         "rows."),
    ]
    update("\n".join(lines))
    print("BENCH.md curation-ab block updated")


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    main()
