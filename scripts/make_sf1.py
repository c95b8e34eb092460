"""Synthesize the sf1 (10x sf0.1) oracle dataset — deterministic expansion,
no external data (driver brief: testdata is read-only; larger SFs are
synthesized locally for scale sweeps).

Each table is 10 perturbed replicas of its sf0.1 counterpart with key
offsets chosen so every PK stays unique and every FK keeps referencing the
same replica's rows (joins behave exactly as at sf0.1, 10x denser):

- region/nation: fixed-size dimensions, copied once;
- customer/supplier/part/orders/lineitem/events: keys offset by
  replica * (max_key + 1), FKs offset with their parent's scheme;
- documents: doc_id offset; replica>0 texts get a short deterministic tail
  marker — replicas of one base doc are genuine NEAR-duplicates (shingle
  jaccard ≈ 0.9), so the dedup battery sees 10-member clique clusters at
  sf1 (adversarial for the cap/CC paths, bounded well under the 64 cap);
- embeddings: vec_id offset; a deterministic per-(replica, dim) direction
  perturbation (NOT a pure scale — cosine is scale-invariant and exact
  copies would make every replica set an exact-duplicate clique).

Usage: python scripts/make_sf1.py [--out DIR] [--replicas 10]
"""

import argparse
import os

import duckdb

SRC = "/root/testdata/sf0.1"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata", "sf1"))
    parser.add_argument("--replicas", type=int, default=10)
    args = parser.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE reps AS SELECT unnest(range({args.replicas}))"
                f"::BIGINT AS rep")

    def src(t):
        return f"read_parquet('{SRC}/{t}.parquet')"

    def emit(table, sql):
        out = f"{args.out}/{table}.parquet"
        con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')"
                        ).fetchone()[0]
        print(f"{table}: {n} rows")

    # fixed dims: copy once
    for t in ("region", "nation"):
        emit(t, f"SELECT * FROM {src(t)}")

    def offset(t, key):
        return con.execute(
            f"SELECT max({key}) + 1 FROM {src(t)}").fetchone()[0]

    k_cust = offset("customer", "c_custkey")
    k_supp = offset("supplier", "s_suppkey")
    k_part = offset("part", "p_partkey")
    k_ord = offset("orders", "o_orderkey")
    k_doc = offset("documents", "doc_id")
    k_vec = offset("embeddings", "vec_id")
    k_evt = offset("events", "event_id")
    k_usr = offset("events", "user_id")

    emit("customer", f"""
        SELECT c_custkey + rep * {k_cust} AS c_custkey, c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM {src('customer')}, reps""")
    emit("supplier", f"""
        SELECT s_suppkey + rep * {k_supp} AS s_suppkey, s_name,
               s_nationkey, s_acctbal
        FROM {src('supplier')}, reps""")
    emit("part", f"""
        SELECT p_partkey + rep * {k_part} AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice
        FROM {src('part')}, reps""")
    emit("orders", f"""
        SELECT o_orderkey + rep * {k_ord} AS o_orderkey,
               o_custkey + rep * {k_cust} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src('orders')}, reps""")
    emit("lineitem", f"""
        SELECT l_orderkey + rep * {k_ord} AS l_orderkey,
               l_partkey + rep * {k_part} AS l_partkey,
               l_suppkey + rep * {k_supp} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {src('lineitem')}, reps""")
    emit("events", f"""
        SELECT event_id + rep * {k_evt} AS event_id, ts,
               user_id + rep * {k_usr} AS user_id,
               event_type, value, props
        FROM {src('events')}, reps""")
    emit("documents", f"""
        SELECT doc_id + rep * {k_doc} AS doc_id,
               CASE WHEN rep = 0 THEN text
                    ELSE text || ' replica marker ' || rep::VARCHAR || ' '
                         || (doc_id % 97)::VARCHAR END AS text,
               lang, source,
               length(CASE WHEN rep = 0 THEN text
                           ELSE text || ' replica marker ' || rep::VARCHAR
                                || ' ' || (doc_id % 97)::VARCHAR END)
                   AS n_chars
        FROM {src('documents')}, reps""")
    emit("embeddings", f"""
        SELECT vec_id + rep * {k_vec} AS vec_id,
               list_transform(
                   embedding,
                   (x, i) -> (x + ((hash(vec_id * 131 + i * 17 + rep)
                                    % 200)::DOUBLE - 100.0)
                              * 0.00002 * rep)::FLOAT) AS embedding,
               label
        FROM {src('embeddings')}, reps""")


if __name__ == "__main__":
    main()
