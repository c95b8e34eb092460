"""Build a degenerate-document SF directory for robustness sweeps.

Real web crawls are full of empty and unparseable pages; the oracle battery
must stay green when `documents.text` contains empty strings and NULLs, not
just on the clean driver testdata.  This clones an SF directory and poisons
the documents table (every 17th doc → '' text, every 23rd → NULL), then the
standard gate runs against it:

    python scripts/make_degenerate_sf.py [src_sf_dir] [dst_dir]
    OTMT_ORACLE_SF_DIR=<dst> OTMT_MAT_ROOT=/tmp/otmt_mat_degen \\
        python scripts/check_oracle.py

Invariants this sweep protects (all fixed after the first run of it):
- ANSI divide-by-zero on empty first mementos (ratio denominators are
  nullif-guarded, with an explicit NaN sentinel in BOTH dialects because
  the comparator stringifies Spark NULL and DuckDB NaN differently);
- NULL text normalized to '' in every dual-dialect query (degenerate rows
  keep integer column dtypes and set semantics aligned across dialects);
- UDF-oracle domains exclude kernel error rows symmetrically
  (lev/LSI/measures-core clean-timeline filters);
- the streaming stateful kernel filters null-simhash error rows (they carry
  no dedup signal) with the same WHERE in its SQL twin.
"""

import os
import shutil
import sys

import duckdb

def build(src: str, dst: str) -> None:
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    con = duckdb.connect()
    for table in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "embeddings"):
        path = f"{src}/{table}.parquet"
        if os.path.exists(path):
            con.execute(f"COPY (SELECT * FROM read_parquet('{path}')) "
                        f"TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
    con.execute(f"""COPY (
      SELECT doc_id,
             CASE WHEN doc_id % 17 = 0 THEN ''
                  WHEN doc_id % 23 = 0 THEN NULL
                  ELSE text END AS text,
             lang
      FROM read_parquet('{src}/documents.parquet')
    ) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
    empties, nulls = con.sql(
        f"SELECT count(*) FILTER (text = ''), count(*) FILTER (text IS NULL) "
        f"FROM read_parquet('{dst}/documents.parquet')").fetchone()
    print(f"wrote {dst}: {empties} empty-text docs, {nulls} null-text docs")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_degenerate"
    build(src, dst)
