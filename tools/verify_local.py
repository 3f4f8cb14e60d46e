#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs DuckDB on the oracle SQL dumped by graft.Verify and compares each
query's parquet output with the oracle result: schema (sorted column
names), row count, and a hash over all values with columns sorted by
name and rows sorted canonically — mirroring the documented driver
behavior. Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify"
    python3 tools/verify_local.py /root/testdata/sf0.01 /tmp/verify
"""
import sys, os, json, glob
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: everything to string with float rounding
    out = pd.DataFrame()
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            s = s.round(6)
        out[c] = s.astype(str)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_path = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_path}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1; continue
        if not got.equals(want):
            diff = (got != want).any(axis=1)
            print(f"FAIL {name}: {int(diff.sum())} mismatched rows; first:")
            idx = diff[diff].index[0]
            print("  spark :", got.loc[idx].to_dict())
            print("  oracle:", want.loc[idx].to_dict())
            n_fail += 1; continue
        print(f"PASS {name}: {len(got)} rows")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
