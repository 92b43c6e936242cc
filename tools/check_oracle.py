#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL from
oracle_sql.json in DuckDB against the sf parquet tables and compare with the
Spark result parquet written by graft.Verify. Dev tool only (driver-side
python libs), not part of the shipped library."""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical dtypes: ints -> int64, floats -> float64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main(sf_dir: str, out_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"MISSING spark result: {name}")
            n_bad += 1
            continue
        got = norm(pd.concat([pd.read_parquet(f) for f in spark_files]))
        try:
            want = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"SCHEMA-MISMATCH {name}: spark={list(got.columns)} oracle={list(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"ROWCOUNT {name}: spark={len(got)} oracle={len(want)}")
            n_bad += 1
            continue
        if got.equals(want):
            n_ok += 1
            print(f"OK {name} ({len(got)} rows)")
        else:
            diff = (got != want) & ~(got.isna() & want.isna())
            nbad = int(diff.any(axis=1).sum())
            print(f"VALUE-MISMATCH {name}: {nbad}/{len(got)} rows differ")
            mask = diff.any(axis=1)
            print("  spark:", got[mask].head(3).to_dict("records"))
            print("  oracle:", want[mask].head(3).to_dict("records"))
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
         sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out")
