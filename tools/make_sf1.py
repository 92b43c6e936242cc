#!/usr/bin/env python3
"""Synthesize target/sf1 (10x sf0.1) deterministically for the round-5
scale-robustness drive: every fact table replicated 10x with
referential-integrity-preserving key shifts (replica k shifts each table's
own keys by k * stride(table)); fixed dimensions (region, nation) copied
verbatim. No external data; pure function of the sf0.1 inputs. Dev tool
(driver-side python), not part of the shipped library."""
import duckdb, os, sys

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "target/sf1"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

def stride(table, key):
    return con.execute(
        f"SELECT max({key}) + 1 FROM read_parquet('{SRC}/{table}.parquet')").fetchone()[0]

D = stride("documents", "doc_id")
V = stride("embeddings", "vec_id")
E = stride("events", "event_id")
U = stride("events", "user_id")
C = stride("customer", "c_custkey")
O = stride("orders", "o_orderkey")
P = stride("part", "p_partkey")
S = stride("supplier", "s_suppkey")

def rep(table, shifts):
    # preserve the source column ORDER exactly; swap in the shifted
    # expression where the column is a replicated key
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{table}.parquet')").fetchall()]
    sel = ", ".join(
        f"t.{c} + k.k * {shifts[c]} AS {c}" if c in shifts else f"t.{c}"
        for c in cols)
    q = (f"COPY (SELECT {sel} FROM read_parquet('{SRC}/{table}.parquet') t "
         f"CROSS JOIN (SELECT unnest(range({K})) AS k) k) "
         f"TO '{DST}/{table}.parquet' (FORMAT parquet)")
    con.execute(q)
    n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{table}.parquet')").fetchone()[0]
    print(f"{table}: {n} rows")

def copy(table):
    con.execute(f"COPY (SELECT * FROM read_parquet('{SRC}/{table}.parquet')) "
                f"TO '{DST}/{table}.parquet' (FORMAT parquet)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{table}.parquet')").fetchone()[0]
    print(f"{table}: {n} rows (copied)")

rep("documents", {"doc_id": D})
rep("embeddings", {"vec_id": V})
rep("events", {"event_id": E, "user_id": U})
rep("customer", {"c_custkey": C})
rep("orders", {"o_orderkey": O, "o_custkey": C})
rep("lineitem", {"l_orderkey": O, "l_partkey": P, "l_suppkey": S})
rep("part", {"p_partkey": P})
rep("supplier", {"s_suppkey": S})
copy("nation")
copy("region")
print("done ->", DST)
