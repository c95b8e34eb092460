"""One-command sf1 oracle sweep: the full battery at 10x the largest driver
SF, plus the supplemental wide-site LSI run.

Reproduces the round-5 scale evidence end-to-end:

1. synthesizes ``testdata/sf1`` via scripts/make_sf1.py if absent
   (deterministic 10x expansion of /root/testdata/sf0.1 — no external data);
2. runs the FULL battery (scripts/check_oracle.py, all 46 entries) with the
   documented large-SF knobs:
   - ``OTMT_ORACLE_LCS_SAMPLE=00`` — deterministic md5-prefix pair sample for
     the LCS oracle's SQL twin (O(pairs*grid) is infeasible at 250k pairs);
     applied identically in both dialects, hash check exact over the sample;
   - ``OTMT_ORACLE_SRP_PLANES=12`` — 4096 SRP buckets so the embedding
     near-dup entry is non-vacuous at 20k vectors (at the default 64 buckets
     every bucket overflows the hot-bucket cap and the check is 0=0);
3. runs the supplemental ``OTMT_PAGES_SITES=12500`` pass for the LSI entry:
   at the default 50 sites, sf1 timelines are 1000 deep (a depth stress the
   main sweep keeps) but the LSI isometry domain (timelines <= 10 docs) is
   empty; 12500 sites give 4-deep timelines and a corpus-wide value check
   (50,000 rows).

Exit code 0 = every pass green.  Usage:
    python scripts/sf1_sweep.py [--sf1-dir DIR] [--cpus 16] [--skip-full]
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_gate(sf1_dir: str, cpus: int, extra_env: dict, only=()) -> int:
    env = dict(os.environ)
    env.update({"OTMT_ORACLE_SF_DIR": sf1_dir,
                "SPARK_GRAFT_CPUS": str(cpus)})
    env.update(extra_env)
    cmd = [sys.executable, os.path.join(REPO, "scripts", "check_oracle.py"),
           *only]
    label = " ".join(f"{k}={v}" for k, v in extra_env.items()) or "(defaults)"
    print(f"=== check_oracle {' '.join(only) or 'ALL'} with {label}",
          flush=True)
    return subprocess.run(cmd, env=env).returncode


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf1-dir",
                        default=os.path.join(REPO, "testdata", "sf1"))
    parser.add_argument("--cpus", type=int, default=16)
    parser.add_argument("--skip-full", action="store_true",
                        help="only the supplemental wide-site LSI pass")
    args = parser.parse_args()

    if not os.path.exists(os.path.join(args.sf1_dir, "documents.parquet")):
        print("=== synthesizing sf1", flush=True)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "make_sf1.py"),
             "--out", args.sf1_dir],
            check=True)

    rc = 0
    if not args.skip_full:
        rc |= run_gate(args.sf1_dir, args.cpus,
                       {"OTMT_ORACLE_LCS_SAMPLE": "00",
                        "OTMT_ORACLE_SRP_PLANES": "12"})
    rc |= run_gate(args.sf1_dir, args.cpus,
                   {"OTMT_PAGES_SITES": "12500"}, only=("lsi_vs_first",))
    print("SF1 SWEEP " + ("GREEN" if rc == 0 else "RED"), flush=True)
    return rc


if __name__ == "__main__":
    sys.exit(main())
